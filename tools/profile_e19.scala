// Phase breakdown of e19-style streaming cost: staging vs stream vs readback.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft._
val sfDir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
def forks(): Long = {
  val s = scala.io.Source.fromFile("/proc/stat").getLines().find(_.startsWith("processes")).get
  s.split("\\s+")(1).toLong
}
def time[T](name: String)(f: => T): T = {
  val t0 = System.nanoTime(); val f0 = forks(); val r = f
  println(f"TIMING $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  forks=${forks()-f0}")
  r
}
Tables.events(spark, sfDir).count()
// warm streaming machinery (join shape)
time("warm_e10") { SparkEntry.queries("e10_stream_stream_join")(spark, sfDir).count() }

// now an e19 replica, phase by phase
import spark.implicits._
val ev = Tables.events(spark, sfDir)
  .filter(col("event_type").isin("click", "purchase"))
  .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ns").as("ts"))
val maxNs = time("maxNs_agg") { ev.agg(max("ts")).head().getLong(0) }
val dayNs = 86400L * 1000000000L
def sentinels(ids: (Long, Long), at: Long): DataFrame =
  Seq((ids._1, -1L, "click", at), (ids._2, -1L, "purchase", at + 2*3600L*1000000000L))
    .toDF("event_id", "user_id", "event_type", "ts")
val src = java.nio.file.Files.createTempDirectory("prof_src_").toString
val tmp = java.nio.file.Files.createTempDirectory("prof_stage_").toString
time("staging_one_job") {
  val stages = Seq(ev, sentinels((-1L,-2L), maxNs+30*dayNs), sentinels((-3L,-4L), maxNs+60*dayNs))
  val tagged = stages.zipWithIndex.map { case (df,i) => df.withColumn("_stage", lit(i)) }.reduce(_ unionByName _)
  tagged.repartition(stages.size, col("_stage")).write.partitionBy("_stage").mode("overwrite").parquet(tmp)
  val base = System.currentTimeMillis() - 10*60000L
  (0 until 3).foreach { i =>
    val dir = new java.io.File(tmp, s"_stage=$i")
    val part = dir.listFiles.find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(src, s"f$i.parquet")
    require(part.renameTo(dst) && dst.setLastModified(base + i*60000L))
  }
}
val ss = spark.newSession()
ss.conf.set("spark.sql.shuffle.partitions", sys.env.getOrElse("PROF_PARTS","4"))
ss.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
// newSession() starts from builder/SparkConf, NOT the parent's runtime
// mutations — without re-setting this the profiled stream schedules
// no-data micro-batches the real e19 never pays (each re-commits every
// state store), skewing the stream-phase attribution
ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
val schema = spark.read.parquet(src).schema
def stream = ss.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
  .withColumn("tss", timestamp_micros(expr("ts div 1000")))
val clicks = stream.filter(col("event_type") === "click")
  .select(col("user_id"), col("tss").as("c_ts"), col("event_id").as("click_id"))
  .withWatermark("c_ts", "1 day")
val purchases = stream.filter(col("event_type") === "purchase")
  .select(col("user_id").as("p_user"), col("tss").as("p_ts"), col("event_id").as("purchase_id"))
  .withWatermark("p_ts", "1 day")
val joined = clicks.join(purchases,
  col("user_id") === col("p_user") && col("p_ts") >= col("c_ts") &&
    col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"), "left_outer")
val outDir = java.nio.file.Files.createTempDirectory("prof_out_").toString
val ckpt = java.nio.file.Files.createTempDirectory("prof_ckpt_").toString
val q = time("stream_build_start") {
  joined.select(col("click_id"), col("purchase_id"),
      (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("delay_us"))
    .writeStream.outputMode("append").option("checkpointLocation", ckpt)
    .foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId") }
    .start()
}
time("processAllAvailable") { q.processAllAvailable() }
time("stop") { q.stop() }
q.recentProgress.foreach { p =>
  println(f"BATCH ${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
  p.stateOperators.foreach(so => println(s"  STATE commitMs=${so.commitTimeMs} memory=${so.memoryUsedBytes} rowsUpdated=${so.numRowsUpdated}"))
}
time("readback") {
  val out = spark.read.parquet(outDir).filter(col("click_id") >= 0)
  out.agg(count(lit(1))).head()
}
System.exit(0)
