package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Soak-corpus synthesis invariants: the scaled tables must be
  * workload-isomorphic replicas (same schema, m× rows, disjoint id
  * spaces, decorrelated content), or the soak measures a synthesis
  * artifact instead of the operator. */
class SoakSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private lazy val dir: String = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_soak_spec_").toString + "/x3"
    Soak.synthesize(spark, sf0001, out, 3)
    out
  }

  test("scaled tables have exactly m x the base rows with the base schema") {
    Seq("documents", "embeddings", "events", "orders",
      "lineitem").foreach { t =>
      val base = spark.read.parquet(s"$sf0001/$t.parquet")
      val scaled = spark.read.parquet(s"$dir/$t.parquet")
      assert(scaled.count() == 3 * base.count(), t)
      assert(scaled.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        base.schema.fields.map(f => (f.name, f.dataType)).toSeq, t)
    }
  }

  test("replica id spaces are disjoint (distinct ids also scale m x)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count())
    val evs = spark.read.parquet(s"$dir/events.parquet")
    assert(evs.select("event_id").distinct().count() == evs.count())
    val ords = spark.read.parquet(s"$dir/orders.parquet")
    assert(ords.select("o_orderkey").distinct().count() == ords.count())
  }

  test("lineitem replicas grow the VALUE domain m x — replicated " +
      "prices would collapse in ExactQuantile's distinct-value census " +
      "and understate quantile scaling") {
    val base = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val scaled = spark.read.parquet(s"$dir/lineitem.parquet")
    val nBase = base.select("l_extendedprice").distinct().count()
    val nScaled = scaled.select("l_extendedprice").distinct().count()
    // the r-cent shift makes replica domains disjoint unless two base
    // prices happen to differ by exactly a multiple of 0.01 in double
    // arithmetic — allow a small overlap margin
    assert(nScaled > 2.5 * nBase, s"$nScaled vs base $nBase")
    // the weight column is untouched: quantity census per flag stable
    val qBase = base.groupBy("l_returnflag").sum("l_quantity")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val qScaled = scaled.groupBy("l_returnflag").sum("l_quantity")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    qBase.foreach { case (k, v) =>
      // double-sum accumulation order differs between the two scans;
      // 1e-3 absolute still catches any real weight perturbation
      assert(math.abs(qScaled(k) - 3 * v) < 1e-3, k)
    }
  }

  test("document replicas share ZERO tokens with the base — naive " +
      "replication would plant m-1 exact twins per doc and quadratic " +
      "candidate volume") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tok = (d: org.apache.spark.sql.DataFrame) => d
      .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("t"))
      .distinct()
    val base = tok(docs.filter(col("doc_id") < Soak.docStrideForTest))
    val rep2 = tok(docs.filter(col("doc_id") >= 2 * Soak.docStrideForTest))
    assert(base.join(rep2, "t").count() == 0)
  }

  test("embedding replicas preserve within-replica cosine structure " +
      "exactly (rotation is an isometry) and keep norms") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val stride = Soak.vecStrideForTest
    val pick = embs.filter(col("vec_id").isin(0L, 1L,
      2 * stride, 2 * stride + 1))
    val rows = pick.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map(p => p._1 * p._2).sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val cBase = cos(rows(0L), rows(1L))
    val cRep = cos(rows(2 * stride), rows(2 * stride + 1))
    assert(math.abs(cBase - cRep) < 1e-9,
      s"rotation changed within-replica cosine: $cBase vs $cRep")
  }

  test("synthesis is idempotent: a second call is a no-op (done marker)") {
    val t0 = System.nanoTime()
    Soak.synthesize(spark, sf0001, dir, 3)
    assert((System.nanoTime() - t0) / 1e9 < 1.0)
  }
}
