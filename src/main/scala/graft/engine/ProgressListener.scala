package graft.engine

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Byte/row progress for a load run (ref A3, `progress_bar.go`): the
  * reference counts bytes through a wrapping reader on one thread;
  * the Spark-native equivalent aggregates task input metrics via a
  * `SparkListener`, which works unchanged on a real cluster (metrics
  * flow back with task completion events).
  */
final class ProgressListener extends SparkListener {
  val bytesRead = new AtomicLong(0)
  val recordsRead = new AtomicLong(0)

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val in = te.taskMetrics
    if (in != null) {
      bytesRead.addAndGet(in.inputMetrics.bytesRead)
      recordsRead.addAndGet(in.inputMetrics.recordsRead)
    }
  }
}

object ProgressListener {
  /** Run `body` with task-metric collection attached. */
  def tracking[A](spark: SparkSession)(body: => A): (A, ProgressListener) = {
    val l = new ProgressListener
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // listener events are delivered async; drain before reading
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      (r, l)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
