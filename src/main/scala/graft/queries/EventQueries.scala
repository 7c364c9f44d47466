package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table: sessionization,
  * as-of (point-in-time) join, and a Structured Streaming windowed
  * aggregation.
  *
  * Scale notes: sessionization and the as-of join both shuffle once on
  * the entity key and then run linear per-partition window passes —
  * the sort-merge formulation that holds at any event volume (no
  * per-key driver state, no cross join). The as-of join is the
  * union-sentinel pattern: tag both sides, sort by (key, time, tag),
  * propagate the last order attributes forward — one shuffle, one sort,
  * no range explosion.
  */
object EventQueries {

  /** Epoch seconds with fractional µs — matches DuckDB `epoch(ts)` to
    * within the ns→µs truncation of the Spark-side read. */
  private def epochSec = col("ts").cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "e01_sessionize" -> ((s, d) => {
      // ns-exact ordering (see q18) — epoch values stay µs-derived,
      // which only shifts gap boundaries by <2µs
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val gapped = Tables.events(s, d)
        .withColumn("prev_sec", lag(epochSec, 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_sec").isNull || epochSec - col("prev_sec") > 3600.0, 1)
            .otherwise(0))
      val sessions = gapped
        .withColumn("session_idx",
          sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      sessions.groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min("event_id").as("first_event"),
          max("event_id").as("last_event"),
          floor(max(epochSec) - min(epochSec)).cast("long").as("dur_sec"))
        .orderBy("user_id", "session_idx")
    }),

    "e02_asof_join" -> ((s, d) => {
      // latest order (by o_orderdate <= event ts) per user, via the
      // union-sentinel + forward-fill window — ties on (custkey, date)
      // pre-resolved to the max orderkey so both engines agree.
      val dedupW = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val orders = Tables.orders(s, d)
        .withColumn("rn", row_number().over(dedupW)).filter(col("rn") === 1)
        .select(col("o_custkey").as("uid"), col("o_orderdate").cast("timestamp").as("t"),
          col("o_orderkey"), col("o_totalprice"), lit(0).as("kind"),
          lit(null).cast("long").as("event_id"))
      val events = Tables.events(s, d)
        .select(col("user_id").as("uid"), col("ts").as("t"),
          lit(null).cast("long").as("o_orderkey"),
          lit(null).cast("double").as("o_totalprice"), lit(1).as("kind"),
          col("event_id"))
      val merged = orders.unionByName(events)
      val w = Window.partitionBy(col("uid"))
        .orderBy(col("t"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      merged
        .withColumn("ok", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("op", last(col("o_totalprice"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("uid").as("user_id"),
          col("ok").as("o_orderkey"), col("op").as("o_totalprice"))
        .orderBy("event_id")
    }),

    // Structured Streaming: tumbling 1-day windows per event_type, fed
    // by the same parquet as a file stream. Watermark + update mode +
    // foreachBatch into a distributed parquet sink: state-store entries
    // are evicted once the watermark passes them and nothing is ever
    // materialized on the driver (the round-1 complete-mode memory sink
    // kept the whole result table in driver memory and re-emitted it
    // every batch — unbounded at 100 TB). Update mode re-emits a window
    // only when it changes, so last-update-wins compaction over
    // (key, batch_id) reconstructs the final table — the same merge a
    // key-value sink (MERGE/upsert) would do natively. Append mode is
    // NOT usable here: it holds back any window whose end exceeds the
    // final watermark, so a bounded stream would drop its last day.
    "e03_stream_window" -> ((s, d) => {
      // file-on-disk schema (ts as raw nanosecond long under the legacy
      // flag set at session build), reused as the stream's declared schema
      val fileSchema = s.read.parquet(s"$d/events.parquet").schema
      // the file-stream source wants a directory: stream the sf dir with
      // a glob filter selecting just the events table
      val raw = s.readStream
        .schema(fileSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val agg = raw
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          RelationalQueries.rnd(sum("value"), 2).as("sum_value"))
        .select(col("win.start").cast("date").as("day"), col("event_type"),
          col("n"), col("sum_value"))
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_e03_out_").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_e03_ckpt_").toString
      val q = agg.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val latest = Window.partitionBy(col("day"), col("event_type"))
        .orderBy(col("batch_id").desc)
      s.read.parquet(outDir)
        .withColumn("rn", row_number().over(latest)).filter(col("rn") === 1)
        .select("day", "event_type", "n", "sum_value")
        .orderBy("day", "event_type")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "e01_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch(ts) AS sec,
        |    lag(epoch(ts)) OVER w AS prev_sec
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | m AS (
        |  SELECT user_id, event_id, sec,
        |    CASE WHEN prev_sec IS NULL OR sec - prev_sec > 3600.0 THEN 1 ELSE 0 END AS is_new
        |  FROM g),
        | sess AS (
        |  SELECT user_id, event_id, sec,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        | count(*) AS n_events,
        | min(event_id) AS first_event, max(event_id) AS last_event,
        | CAST(floor(max(sec) - min(sec)) AS BIGINT) AS dur_sec
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "e02_asof_join" ->
      """WITH o AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                         ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) t WHERE rn = 1)
        |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
        |FROM events e
        |ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "e03_stream_window" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        | count(*) AS n,
        | floor((sum(value))*100+0.5)/100 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
  )
}
