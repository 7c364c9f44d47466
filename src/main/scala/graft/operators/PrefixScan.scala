package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Materialize.MaterializeOps

/** Distributed ordered prefix sum (cumulative scan) — the scale-safe
  * replacement for `sum(...).over(Window.partitionBy(lowCardKey)
  * .orderBy(...))`, whose total order funnels each group's entire
  * volume through ONE task's sort (the q36 disease: 5 groups = 5 tasks
  * at any data size).
  *
  * Classic two-pass scan instead:
  *   1. range-partition by (group, order) so each partition holds a
  *      contiguous slice of the global order, pinned with an eager
  *      `localCheckpoint` (on a cluster: `checkpoint`) so both passes
  *      see identical partition boundaries;
  *   2. aggregate per-(partition, group) subtotals — a tiny frame,
  *      partitions × groups rows — and turn them into per-partition
  *      starting offsets with a cheap cross-partition running sum;
  *   3. broadcast-join the offsets back and add a WITHIN-partition
  *      running sum, whose window key (partition id, group) caps every
  *      sort at one partition's local slice.
  *
  * Parallelism is the partition count end-to-end; no task ever sees
  * more than its own slice. The result values are independent of where
  * the range boundaries land: a prefix over a sorted order is unique.
  */
object PrefixScan {

  /** Adds `out` = running sum of `value` within `group`, ordered by
    * `order` (ties must not exist across rows — give a unique
    * tie-breaker as the last order column). `value` must be integral
    * (LongType math keeps cross-engine sums exact).
    */
  def runningSum(df: DataFrame, group: Seq[String], order: Seq[String],
      value: String, out: String, numPartitions: Int = 0): DataFrame = {
    val keyCols = (group ++ order).map(col)
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint pins both the partition boundaries AND the row
    // placement, so pass 2 joins offsets computed by pass 1 against
    // the exact same layout (a recompute could resample boundaries)
    val sorted = df.repartitionByRange(parts, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .withColumn("__pid", spark_partition_id())
      .materialize
    // per-(partition, group) subtotals: partitions × groups rows — a
    // metadata-sized frame, the scan's only cross-partition traffic
    val subtotals = sorted
      .groupBy((col("__pid") +: group.map(col)): _*)
      .agg(sum(col(value)).as("__ptotal"))
    // offset = everything in earlier partitions for the same group; the
    // window runs over the TINY subtotal frame, not the data
    val offW = Window.partitionBy(group.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subtotals
      .withColumn("__offset",
        coalesce(sum("__ptotal").over(offW), lit(0L)))
      .drop("__ptotal")
    // within-partition running sum: window key (pid, group) bounds every
    // sort at one partition's slice — parallelism stays = partitions
    val localW = Window
      .partitionBy((col("__pid") +: group.map(col)): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    sorted
      .join(broadcast(offsets), "__pid" +: group)
      .withColumn(out, col("__offset") + sum(col(value)).over(localW))
      .drop("__pid", "__offset")
  }
}
