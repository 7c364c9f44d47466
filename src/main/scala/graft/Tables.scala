package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access to the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Every roster query reads through here so that scan options stay uniform.
  * Parquet scans are columnar + whole-stage-codegen'd; Catalyst prunes
  * columns and pushes predicates into the scan, so each query should
  * `select` only what it needs and filter as early as possible.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) cannot hold; Spark 4 refuses the file outright. Read `ts` as a
    * raw nanosecond long (requires `spark.sql.legacy.parquet.nanosAsLong`
    * set at session build — see [[Sessions.tune]]), keep it as `ts_ns`
    * for exact ordering, and expose `ts` as a µs-truncated TimestampType
    * for date/window arithmetic. Oracle queries must never emit raw `ts`
    * (DuckDB keeps full ns precision). ns→µs uses integral `div` — a
    * double division of an ~1.8e18 long loses 10 bits of mantissa and
    * can land 1µs off, flipping session-gap/day-window boundaries. */
  def events(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** Session-level confs every graft entrypoint needs, applied once at
  * build time. Never `conf.set` these inside a query function: a
  * read-side mutation of the shared session would silently change
  * behavior for whatever else runs on it concurrently. */
object Sessions {
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Bounded replays emit all output on the data batch itself; the
      // extra no-data micro-batch Spark schedules to advance the
      // watermark only re-commits every state store (32 partitions × 4
      // stores for a stream-stream join) for zero additional output.
      // Disabling it halves streaming machinery cost here; a real
      // deployment with timeout-driven emission would re-enable it.
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
}
