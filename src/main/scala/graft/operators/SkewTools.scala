package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping/join keys (100 TB stance: AQE's
  * skew-join handles sort-merge joins, but a pathologically hot GROUP
  * BY key still funnels one reducer; salting splits it).
  *
  * WHEN to reach for these vs letting the engine cope — measured in
  * `graft.Soak`'s skew mode (hot-key variants; numbers in
  * tools/BENCH_NOTES.md "AQE skew-join vs manual salting"):
  *  - hot GROUP BY with decomposable aggregates: usually NEITHER —
  *    hash aggregation's map-side partial step already emits one row
  *    per (task, key), so the hot key's volume never shuffles;
  *    [[saltedSumCount]] pays an extra shuffle stage and earns it only
  *    when partial aggregation is defeated (`collect_list`, exact
  *    `percentile`, very wide agg buffers).
  *  - hot JOIN key, dim side broadcastable: broadcast. Skew is a
  *    shuffle pathology; a broadcast join has no shuffle to skew.
  *  - hot JOIN key, both sides big (sort-merge): AQE's skew-join
  *    splits the hot partition at runtime — IF the hot partition
  *    clears `spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes`
  *    (256 MB default; a hot key below it just runs long) and the
  *    plan is an SMJ under AQE. [[saltedJoin]] is the static rescue
  *    for what AQE can't see: non-SMJ plans, aggregation-after-join
  *    pipelines where the funnel is downstream of the split, or
  *    engines/first-runs without runtime stats.
  */
object SkewTools {

  /** Two-stage salted aggregation: groupBy (keys + random salt) with
    * partial aggregates, then re-aggregate without the salt. Correct
    * for decomposable aggregates (sum/count/min/max). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum("__psum").as(s"sum_$valueCol"), sum("__pcnt").as("cnt"))
  }

  /** Broadcast-salted join for a skewed left key: replicate each right
    * row `saltBuckets` times, salt the left side randomly, join on
    * (key, salt) — the hot key's rows spread across `saltBuckets`
    * reducers instead of one. Use when the right side is small enough
    * to replicate but too big (or too dynamic) to broadcast whole. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val explodedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(explodedRight, Seq(key, "__salt")).drop("__salt")
  }
}
