package graft.operators

import graft.{SparkEntry, SparkSessionFixture}
import org.scalatest.funsuite.AnyFunSuite

/** `spark.graft.checkpoint.mode`: the lineage barrier is a deployment
  * decision, so flipping it must never change a result. Proven on the
  * two heaviest iterative consumers — d09 (labelPropagate fixpoint)
  * and s24 (two-level lloyd/lloydGrouped hierarchy) — plus direct
  * Materialize semantics. */
class CheckpointModeSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def withMode[A](mode: String, dir: Option[String] = None)(body: => A): A = {
    spark.conf.set(Materialize.ModeConf, mode)
    dir.foreach(spark.conf.set(Materialize.DirConf, _))
    try body finally {
      spark.conf.unset(Materialize.ModeConf)
      spark.conf.unset(Materialize.DirConf)
    }
  }

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf0001).collect().map(_.toString).toSeq

  test("d09 and s24 return identical results under local and reliable " +
      "checkpoint modes, and reliable mode actually writes checkpoint " +
      "files (the path is exercised, not skipped)") {
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_mode_").toString
    val local = Seq("d09_dup_clusters", "s24_hier_kmeans").map(run)
    val reliable = withMode("reliable", Some(ckptDir)) {
      Seq("d09_dup_clusters", "s24_hier_kmeans").map(run)
    }
    assert(local == reliable)
    // the reliable run must have materialized through the dir: the
    // context's checkpoint dir now points inside ckptDir and holds rdds
    def rdds(f: java.io.File): Int =
      Option(f.listFiles).map(_.map(c =>
        (if (c.getName.startsWith("rdd-")) 1 else 0) + rdds(c)).sum)
        .getOrElse(0)
    assert(rdds(new java.io.File(ckptDir)) > 0,
      s"reliable mode wrote no checkpoints under $ckptDir")
  }

  test("reliable mode without a dir fails fast naming both confs") {
    // a FRESH context would have no checkpoint dir; the shared fixture
    // session may already carry one from the test above, so assert the
    // guard's message only if the precondition holds
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      withMode("reliable") {
        val e = intercept[IllegalArgumentException] {
          Materialize(graft.Tables.region(spark, sf0001))
        }
        assert(e.getMessage.contains(Materialize.DirConf))
      }
    }
  }

  test("an unknown mode fails fast with the conf name") {
    withMode("durable") {
      val e = intercept[IllegalArgumentException] {
        Materialize(graft.Tables.region(spark, sf0001))
      }
      assert(e.getMessage.contains(Materialize.ModeConf))
    }
  }

  test("local mode (the default) truncates lineage: the materialized " +
      "frame scans an RDD, not the parquet source") {
    val m = Materialize(graft.Tables.region(spark, sf0001))
    val plan = m.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD") && !plan.contains("Scan parquet"),
      plan.take(2000))
  }

  test("materializeLazy is value-identical to materialize, defers the " +
      "RESULT stage past construction (AQE still materializes upstream " +
      "shuffle stages — the documented caveat), and computes the " +
      "deferred stage exactly once for multiple consumers") {
    import Materialize.MaterializeOps
    import org.apache.spark.sql.functions._
    // two accumulators: mapEvals counts a pre-shuffle (map-stage) udf,
    // resEvals counts a post-shuffle (result-stage) udf
    val mapEvals = spark.sparkContext.longAccumulator("lazyMapEvals")
    val resEvals = spark.sparkContext.longAccumulator("lazyResEvals")
    val markMap = udf { (x: Long) => mapEvals.add(1L); x }
    val markRes = udf { (x: Long) => resEvals.add(1L); x }
    val base = spark.range(0, 500)
      .select(col("id"), markMap(col("id")).as("m"))
      .groupBy(expr("id % 7").as("g")).agg(sum("m").as("s0"))
      .select(col("g"), markRes(col("s0")).as("s"))
    val lz = base.materializeLazy
    // AQE materialized the upstream shuffle stage at construction (the
    // caveat the scaladoc documents)...
    assert(mapEvals.value == 500L,
      s"expected the AQE map stage at construction, saw ${mapEvals.value}")
    // ...but the RESULT stage is deferred: the post-shuffle udf has not
    // evaluated a single group yet
    assert(resEvals.value == 0L, "lazy barrier ran the result stage at construction")
    // two consumers (an agg and a self-join) share ONE evaluation of
    // the deferred stage: 7 groups evaluated once, not once per consumer
    val expected = lz.agg(sum("s")).collect()(0).getLong(0)
    assert(resEvals.value == 7L,
      s"result stage evaluated ${resEvals.value} times for 7 groups")
    val again = lz.join(lz.withColumnRenamed("s", "s2"), "g")
      .agg(sum("s")).collect()(0).getLong(0)
    assert(again == expected)
    assert(resEvals.value == 7L,
      s"lazy subtree re-evaluated for a second consumer: ${resEvals.value}")
    // value parity with the eager barrier
    mapEvals.reset(); resEvals.reset()
    assert(lz.collect().map(_.toString).sorted.toSeq ==
      base.materialize.collect().map(_.toString).sorted.toSeq)
  }
}
