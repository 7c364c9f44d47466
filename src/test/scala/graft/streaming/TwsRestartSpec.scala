package graft.streaming

import graft.SparkSessionFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-restart recovery for the transformWithState twins: the
  * RocksDB ValueState written by run 1 must govern run 2 (a restarted
  * stream on the same checkpoint), or the "EVER" semantics of the
  * quota/session operators silently reset on every executor loss or
  * deploy. e16/e17 prove restart for engine-owned windowed-agg state;
  * this proves it for the custom StatefulProcessor state the e04/e18
  * production paths now ride. */
class TwsRestartSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private lazy val ss: org.apache.spark.sql.SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    s2.conf.set("spark.sql.shuffle.partitions", "2")
    s2
  }

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Write `rows` as one parquet file into `srcDir` with an mtime
    * AFTER everything already there (ordered pickup on restart). */
  private def addFile(srcDir: String, df: DataFrame, idx: Int): Unit = {
    val stage = tmp(s"graft_twsr_stage$idx")
    df.repartition(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    val dst = new java.io.File(srcDir, s"f$idx.parquet")
    require(part.renameTo(dst) &&
      dst.setLastModified(System.currentTimeMillis() - 60000L + idx * 1000L))
  }

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }

  test("admitTws: the RocksDB quota counter survives a checkpoint " +
      "restart — a key exhausted before the crash admits nothing after " +
      "it, even for smaller ids") {
    import ss.implicits._
    val src = tmp("graft_twsr_q_src")
    val out = tmp("graft_twsr_q_out")
    val ckpt = tmp("graft_twsr_q_ckpt")
    val schema = Seq(QuotaAdmission.Doc(0L, "x")).toDF.schema
    def run(): Unit = {
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .as[QuotaAdmission.Doc]
      val q = QuotaAdmission.admitTws(stream, quota = 2L)(ss)
        .toDF.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          IdempotentSink.writeBatch(b, id, out)
        }.start()
      drain(q)
    }
    // run 1: source a over quota (admits 10, 11), source b under it
    addFile(src, Seq(QuotaAdmission.Doc(10L, "a"), QuotaAdmission.Doc(11L, "a"),
      QuotaAdmission.Doc(12L, "a"), QuotaAdmission.Doc(5L, "b")).toDF, 0)
    run()
    // crash window over; run 2 starts from the checkpoint with NEW data:
    // smaller a-ids must be rejected (counter persisted), b tops up by 1
    addFile(src, Seq(QuotaAdmission.Doc(1L, "a"), QuotaAdmission.Doc(2L, "a"),
      QuotaAdmission.Doc(6L, "b"), QuotaAdmission.Doc(7L, "b")).toDF, 1)
    run()
    val got = spark.read.parquet(out).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((10L, "a"), (11L, "a"), (5L, "b"), (6L, "b")),
      s"restart lost or reset quota state: $got")
  }

  test("sessionsTws: the open session's RocksDB state survives a " +
      "checkpoint restart — post-restart events extend and close the " +
      "pre-restart session") {
    import ss.implicits._
    val src = tmp("graft_twsr_s_src")
    val out = tmp("graft_twsr_s_out")
    val ckpt = tmp("graft_twsr_s_ckpt")
    def ev(sec: Long, id: Long) = StatefulSessionize.Event(
      1L, new java.sql.Timestamp(sec * 1000), id)
    val schema = Seq(ev(0, 0)).toDF.schema
    def run(): Unit = {
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .as[StatefulSessionize.Event]
      val q = StatefulSessionize.sessionsTws(stream, gapSec = 60)(ss)
        .toDF.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          IdempotentSink.writeBatch(b, id, out)
        }.start()
      drain(q)
    }
    addFile(src, Seq(ev(0, 1), ev(30, 2)).toDF, 0) // open session [0,30]
    run()
    // restart: an in-gap event extends the RECOVERED session; a far
    // event then closes it — one session of 3 events, not a fresh
    // 1-event session (which is what state loss would produce)
    addFile(src, Seq(ev(55, 3)).toDF, 1)
    addFile(src, Seq(ev(500, 4)).toDF, 2)
    run()
    val sessions = spark.read.parquet(out)
      .select("user_id", "n_events", "first_event", "last_event")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(sessions == Set((1L, 3L, 1L, 3L)),
      s"restart lost session state: $sessions")
  }
}
