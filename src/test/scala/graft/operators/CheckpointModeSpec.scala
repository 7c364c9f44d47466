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
}
