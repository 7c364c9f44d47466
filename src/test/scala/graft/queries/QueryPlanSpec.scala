package graft.queries

import graft.{SparkEntry, SparkSessionFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the roster's scale claims (pushdown,
  * pruning, broadcast, top-k) hold in the executed plans, not just in
  * comments. */
class QueryPlanSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect()
    // formatted mode prints full scan metadata (PushedFilters,
    // ReadSchema) even under the AQE wrapper
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q02: filters are pushed into the parquet scan; columns pruned") {
    // AQE wraps the tree, so assert on the full plan text (scan metadata
    // is printed inline)
    val plan = planOf("q02_filter_project")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThan(l_quantity"), plan.take(3000))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("l_extendedprice"),
      s"unpruned column: $readSchema")
  }

  test("q01: aggregate runs partial (map-side) + final") {
    val plan = planOf("q01_agg_battery")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_sum") || plan.contains("Partial"), plan)
  }

  test("q04: dimension join is a broadcast hash join") {
    assert(planOf("q04_broadcast_join").contains("BroadcastHashJoin"))
  }

  test("q05: ALL four joins broadcast; lineitem never shuffles pre-aggregate") {
    // Verified at sf0.1 too (2026-08-12): the filtered orders (~2 MiB)
    // and customer (~1.1 MiB) sit under the 10 MB broadcast threshold,
    // so even the initial plan broadcasts all four build sides and the
    // fact table's only exchange is the final aggregate's. This pins
    // that shape: a dropped hint or a split plan shows up as a
    // SortMergeJoin / missing broadcast here.
    val plan = planOf("q05_multi_join_revenue")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4, plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("q19: top-k plans as TakeOrderedAndProject (no global sort materialization)") {
    assert(planOf("q19_topk").contains("TakeOrderedAndProject"))
  }

  test("q08/q09: semi/anti joins plan as semi/anti, not materialized subqueries") {
    assert(planOf("q08_semi_join").contains("LeftSemi"))
    assert(planOf("q09_anti_join").contains("LeftAnti"))
  }

  test("d02: minhash signature computes scan-side (no explode before the band join)") {
    val plan = planOf("d02_minhash_lsh")
    assert(plan.contains("minhash_sig"), plan.take(2000))
  }

  test("s04: centroid table broadcasts; corpus never cartesian-products") {
    // the crossJoin against the K-row centroid frame must plan as a
    // broadcast nested-loop, not a CartesianProduct shuffle
    val plan = planOf("s04_ivf_topk")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("t08: exploded token counts combine map-side before the shuffle") {
    val plan = planOf("t08_top_tokens")
    assert(plan.contains("Generate"), plan.take(3000))
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      plan.take(3000))
  }

  test("q41: salted agg runs two aggregate stages, salt never reaches output") {
    val plan = planOf("q41_salted_agg")
    // partial+final for each of the two groupBys
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan.take(3000))
    val df = SparkEntry.queries("q41_salted_agg")(spark, sf0001)
    assert(!df.columns.contains("__salt"))
  }

  test("q42: salted join spreads the hot key; salt never reaches output") {
    val plan = planOf("q42_salted_join")
    // the join key must be (k, __salt), not the bare 3-value hot key
    assert(plan.contains("__salt"), plan.take(3000))
    val df = SparkEntry.queries("q42_salted_join")(spark, sf0001)
    assert(!df.columns.contains("__salt"))
  }

  test("t11: contamination detector plans as a semi join (eval payload never shuffles wide)") {
    val plan = planOf("t11_contamination")
    assert(plan.contains("LeftSemi"), plan.take(3000))
  }

  test("t10: tf and df aggregates both combine map-side before their shuffles") {
    val plan = planOf("t10_tfidf")
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      plan.take(3000))
    // the corpus-size scalar joins in as a broadcast, not a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("e09: the interval join plans as an equi-join on (user, bin) — no range explosion") {
    val plan = planOf("e09_range_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // residual range predicate rides the equi-join as its condition
    assert(plan.contains("Join"), plan.take(3000))
  }

  test("q47: might_contain prunes the fact scan BELOW the join") {
    // positional check needs the TREE string (children print below
    // parents), not the formatted details section
    val df = SparkEntry.queries("q47_bloom_prune")(spark, sf0001)
    df.collect()
    val tree = df.queryExecution.executedPlan.toString
    val filterIdx = tree.indexOf("might_contain")
    val joinIdx = "HashJoin|SortMergeJoin".r
      .findFirstMatchIn(tree).map(_.start).getOrElse(-1)
    assert(filterIdx >= 0, tree.take(3000))
    assert(joinIdx >= 0, tree.take(3000))
    assert(filterIdx > joinIdx,
      s"might_contain filter does not sit below the join:\n${tree.take(3000)}")
  }

  test("q46: the min/max scalar joins back as a broadcast, not a shuffle") {
    val plan = planOf("q46_histogram")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("s06: quantization is per-row until the final per-label aggregate") {
    // scope to the AQE final plan (the formatted string also prints the
    // initial plan, which would double every operator count)
    val plan = planOf("s06_vec_quantize").split("== Initial Plan ==")(0)
    // one aggregation pair (partial+final) — no other shuffle-producing
    // operator: quantize/reconstruct/error are all projections
    assert("HashAggregate".r.findAllIn(plan).size <= 2, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }
}
