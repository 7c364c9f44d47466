package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping/join keys (100 TB stance: AQE's
  * skew-join handles sort-merge joins, but a pathologically hot GROUP
  * BY key still funnels one reducer; salting splits it).
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
