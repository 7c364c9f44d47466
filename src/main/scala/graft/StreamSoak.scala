package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** State-store soak for the stateful streaming pipelines — publishes
  * the metrics the e18/e20 roster queries assert into existence but
  * never report: per-run `numRowsUpdated` / `numRowsTotal`, state
  * memory, and the RocksDB provider's own counters (SST file size,
  * snapshot/changelog upload bytes) from
  * `StreamingQueryProgress.stateOperators`.
  *
  * `runMain graft.StreamSoak [baseSfDir] [workDir]`
  *  - env SPARK_GRAFT_STREAM_SCALES: comma ints, default `10,30` —
  *    corpora come from [[Soak.synthesize]] (decorrelated replicas,
  *    users/events stride per replica so the keyed state table really
  *    grows m×).
  *  - env SPARK_GRAFT_CPUS: session parallelism, default 4.
  *
  * Matrix: e20 first-seen (transformWithState, RocksDB — the pipeline
  * whose state is one entry per (user, event_type) key and therefore
  * GROWS with the corpus), e18 quota (transformWithState twin, RocksDB
  * — state is one counter per source, constant by design; throughput
  * is the soak signal), and e18's legacy flatMapGroupsWithState
  * wrapper on BOTH providers (RocksDB vs HDFS-backed) — the
  * same-kernel provider comparison transformWithState can't give
  * (it requires RocksDB).
  *
  * One JSON line per (pipeline, provider, scale); SOAK.md interprets. */
object StreamSoak {

  private val HdfsProvider = "org.apache.spark.sql.execution.streaming." +
    "state.HDFSBackedStateStoreProvider"

  private def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  /** Run one staged replay to its bounded end and return
    * (seconds, progress-derived metrics JSON fragment). */
  private def timeQuery(out: DataFrame, name: String): (Double, String) = {
    val outDir = tempDir(s"graft_ssoak_${name}_out_")
    val ckpt = tempDir(s"graft_ssoak_${name}_ck_")
    val t0 = System.nanoTime()
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val dt = (System.nanoTime() - t0) / 1e9
    val ps = q.recentProgress.toSeq
    val stateful = ps.filter(_.stateOperators.nonEmpty)
    val nIn = ps.map(_.numInputRows).sum
    val updated = stateful.flatMap(_.stateOperators).map(_.numRowsUpdated).sum
    val last = stateful.lastOption.map(_.stateOperators.head)
    val totalRows = last.map(_.numRowsTotal).getOrElse(-1L)
    val memBytes = last.map(_.memoryUsedBytes).getOrElse(-1L)
    // the RocksDB provider's own accounting, if present: SST bytes on
    // disk, snapshot/changelog checkpoint traffic — the numbers that
    // prove state costs executor disk + checkpoint bandwidth, not heap
    val interesting = ("(?i)(sstfilesize|snapshot|changelog|bytescopied|" +
      "pinnedblocks|totalmemory)").r
    val custom = last.map(_.customMetrics).map { m =>
      import scala.jdk.CollectionConverters._
      m.asScala.toSeq
        .filter { case (k, _) => interesting.findFirstIn(k).isDefined }
        .sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString(",")
    }.filter(_.nonEmpty).getOrElse("")
    val frag = s""""n_in":$nIn,"rows_updated":$updated,""" +
      s""""rows_total":$totalRows,"state_mem_bytes":$memBytes""" +
      (if (custom.nonEmpty) s""","rocksdb":{$custom}""" else "")
    (dt, frag)
  }

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_soak")
    val scales = sys.env.getOrElse("SPARK_GRAFT_STREAM_SCALES", "10,30")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      // timeQuery sums metrics from q.recentProgress AFTER the run; the
      // buffer defaults to 100 entries, and maxFilesPerTrigger=1 at a
      // large scale produces more micro-batches than that — a silent
      // undercount of n_in/rows_updated. Builder-level so the
      // newSession() clones in streamSession inherit it.
      .config("spark.sql.streaming.numRecentProgressUpdates", "100000")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scales.foreach { m =>
      Soak.synthesize(spark, base, s"$work/x$m", m)
      println(s"""{"stream_soak":"synthesized","scale":$m}""")
    }

    // staged ONCE per scale and shared by all three e18 legs: the
    // replay source is read-only, each leg keeps its own checkpoint /
    // output dirs, and re-staging would re-run the max(doc_id) agg and
    // the full parquet re-write three times over (the dominant staging
    // I/O at scale 30)
    def e18Src(d: String): String = {
      val docs = Tables.documents(spark, d).select(col("doc_id"), col("source"))
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val cut1 = maxId / 3; val cut2 = 2 * maxId / 3
      graft.queries.EventQueries.stageReplay("ssoak_e18", Seq(
        docs.filter(col("doc_id") <= cut1),
        docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
        docs.filter(col("doc_id") > cut2)))
    }

    def withProvider(provider: String)(body: => Unit): Unit = {
      val key = "spark.graft.stream.stateStoreProvider"
      val saved = spark.conf.getOption(key)
      provider match {
        case "rocksdb" => spark.conf.unset(key) // streamSession default
        case "hdfs" => spark.conf.set(key, HdfsProvider)
      }
      try body
      finally saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

    scales.foreach { m =>
      val d = s"$work/x$m"

      // e20 first-seen: state grows with the corpus (users stride per
      // replica) — the scale signal for RocksDB state volume
      locally {
        val ss = graft.queries.EventQueries.streamSession(spark)
        import ss.implicits._
        val ev = Tables.events(spark, d)
          .select(col("user_id"), col("event_type"), col("event_id"),
            col("ts_ns"))
        val src = graft.queries.EventQueries.stageReplay("ssoak_e20",
          (0 until 3).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i)))
        val schema = spark.read.parquet(src).schema
        val stream = ss.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .as[graft.streaming.FirstSeenRegistry.Ev]
        val (dt, frag) = timeQuery(
          graft.streaming.FirstSeenRegistry.firstSeen(stream)(ss).toDF,
          "e20")
        println(f"""{"stream_soak":"e20_tws","provider":"rocksdb","scale":$m,"sec":$dt%.3f,$frag%s}""")
      }

      val e18Staged = e18Src(d)

      // e18 quota, modern API (RocksDB required)
      locally {
        val src = e18Staged
        val ss = graft.queries.EventQueries.streamSession(spark)
        import ss.implicits._
        val schema = spark.read.parquet(src).schema
        val stream = ss.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .as[graft.streaming.QuotaAdmission.Doc]
        val (dt, frag) = timeQuery(
          graft.streaming.QuotaAdmission.admitTws(stream, 10L)(ss).toDF,
          "e18tws")
        println(f"""{"stream_soak":"e18_tws","provider":"rocksdb","scale":$m,"sec":$dt%.3f,$frag%s}""")
      }

      // e18 legacy wrapper on BOTH providers: the same-kernel
      // provider comparison
      Seq("rocksdb", "hdfs").foreach { provider =>
        withProvider(provider) {
          val src = e18Staged
          val ss = graft.queries.EventQueries.streamSession(spark)
          import ss.implicits._
          val schema = spark.read.parquet(src).schema
          val stream = ss.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
            .as[graft.streaming.QuotaAdmission.Doc]
          val (dt, frag) = timeQuery(
            graft.streaming.QuotaAdmission.admit(stream, 10L)(ss).toDF,
            s"e18leg_$provider")
          println(f"""{"stream_soak":"e18_legacy","provider":"$provider","scale":$m,"sec":$dt%.3f,$frag%s}""")
        }
      }
      Console.flush()
    }
    spark.stop()
  }
}
