package graft.operators

import graft.SparkSessionFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ExactQuantile must be BIT-compatible with the built-in `percentile`
  * (it mirrors Percentile.getPercentile's interpolation arithmetic),
  * not merely close — q45's DuckDB hash oracle rides on that. */
class ExactQuantileSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  private val fracs = Seq("p00" -> 0.0, "p25" -> 0.25, "p50" -> 0.5,
    "p90" -> 0.9, "p99" -> 0.99, "p100" -> 1.0)

  /** Built-in reference with the same output shape. */
  private def builtin(df: DataFrame, g: String, v: String): Map[Any, Seq[Double]] =
    df.filter(col(v).isNotNull)
      .groupBy(g)
      .agg(expr(s"percentile(cast($v as double), ${fracs.head._2})").as(fracs.head._1),
        fracs.tail.map { case (n, f) =>
          expr(s"percentile(cast($v as double), $f)").as(n)
        }: _*)
      .collect().map(r => r.get(0) -> fracs.indices.map(i => r.getDouble(i + 1)))
      .toMap

  private def ours(df: DataFrame, g: String, v: String): Map[Any, Seq[Double]] =
    ExactQuantile.quantiles(df, g, v, fracs)
      .collect().map { r =>
        val gi = r.fieldIndex(g)
        r.get(gi) -> fracs.map { case (n, _) => r.getDouble(r.fieldIndex(n)) }
      }.toMap

  test("matches the built-in bit-for-bit on mixed random data") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      val g = s"g${i % 7}"
      // duplicate-heavy: quantize half the draws so census fold matters
      val x = rng.nextDouble() * 1000
      (g, if (i % 2 == 0) math.floor(x) else x)
    }
    val df = rows.toDF("g", "v")
    assert(ours(df, "g", "v") === builtin(df, "g", "v"))
  }

  test("degenerate groups: single value, all-equal, two values") {
    val df = Seq(
      ("one", 5.0),
      ("same", 3.0), ("same", 3.0), ("same", 3.0),
      ("two", 1.0), ("two", 2.0)).toDF("g", "v")
    assert(ours(df, "g", "v") === builtin(df, "g", "v"))
  }

  test("nulls are ignored and n counts non-null values only") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Some(2.0))).toDF("g", "v")
    assert(ours(df, "g", "v") === builtin(df, "g", "v"))
    val n = ExactQuantile.quantiles(df, "g", "v", Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getLong(r.fieldIndex("n"))).toMap
    assert(n === Map("a" -> 2L, "b" -> 1L))
  }

  test("matches the built-in on sf0.001 lineitem (decimal input)") {
    val li = spark.read.parquet(
      s"${SparkSessionFixture.sf0001}/lineitem.parquet")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    assert(ours(li, "g", "v") === builtin(li, "g", "v"))
  }

  test("non-finite values: NaN sorts greatest, infinities at the edges") {
    // -∞ < finite < +∞ < NaN is Spark's double ordering and the order
    // the built-in's sorted multiset uses; interpolation touching ∞
    // produces ∞/NaN by the same double arithmetic, so results must
    // stay bit-equal (compared via doubleToLongBits — NaN != NaN
    // under ==). Also pins the histogram: the finite values must not
    // all collapse into bucket 0 just because a NaN poisoned hi−lo.
    def bits(m: Map[Any, Seq[Double]]): Map[Any, Seq[Long]] =
      m.map { case (k, vs) =>
        k -> vs.map(java.lang.Double.doubleToLongBits)
      }
    val df = Seq(
      ("mix", 1.0), ("mix", Double.NaN), ("mix", 2.0),
      ("mix", Double.PositiveInfinity),
      ("mix", Double.NegativeInfinity), ("mix", 3.0),
      ("allnan", Double.NaN), ("allnan", Double.NaN),
      ("inf", Double.PositiveInfinity), ("inf", Double.NegativeInfinity))
      .toDF("g", "v")
    assert(bits(ours(df, "g", "v")) === bits(builtin(df, "g", "v")))
  }

  test("-0.0 is canonicalized to 0.0 by the census groupBy (the one " +
      "documented bit-compat deviation)") {
    // Spark's NormalizeFloatingNumbers rewrites -0.0 grouping keys to
    // 0.0, so an order statistic that IS a negative zero surfaces as
    // +0.0; the built-in's Java-keyed value map preserves the sign
    // bit. Same SQL value — pinned here so the deviation is a
    // decision, not a surprise.
    val df = Seq(("z", -0.0), ("z", -0.0), ("z", 1.0)).toDF("g", "v")
    val got = ExactQuantile.quantiles(df, "g", "v", Seq("p00" -> 0.0))
      .head().getDouble(1)
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(0.0))
  }

  test("hinted = false (the ultra-high-group-cardinality plan) " +
      "matches the default exactly") {
    val rng = new scala.util.Random(7)
    val df = (1 to 800).map(i => (s"g${i % 5}", rng.nextDouble() * 100))
      .toDF("g", "v")
    val a = ExactQuantile.quantiles(df, "g", "v", fracs)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = ExactQuantile.quantiles(df, "g", "v", fracs, hinted = false)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq === b.toSeq)
  }

  /** Brute-force type-1 weighted quantile: sort by value, accumulate
    * weight, return the first value whose cumulative weight reaches
    * f·W — the definition weightedQuantiles distributes. */
  private def bruteWeighted(rows: Seq[(String, Double, Long)],
      fs: Seq[Double]): Map[String, Seq[Double]] =
    rows.filter(_._3 > 0).groupBy(_._1).map { case (g, rs) =>
      val byV = rs.groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val total = byV.map(_._2).sum
      g -> fs.map { f =>
        val t = f * total
        var cum = 0L
        byV.find { case (_, wv) => cum += wv; cum >= t }.get._1
      }
    }

  test("weightedQuantiles matches the brute-force CDF crossing on " +
      "random integer-weighted data") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 3000).map { i =>
      (s"g${i % 6}",
        math.floor(rng.nextDouble() * 500), // duplicate-heavy values
        (rng.nextInt(50) + 1).toLong)
    }
    val fs = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = ExactQuantile.weightedQuantiles(
      rows.toDF("g", "v", "w"), "g", "v", "w",
      fs.zipWithIndex.map { case (f, i) => s"q$i" -> f })
      .collect().map { r =>
        r.getString(r.fieldIndex("g")) ->
          fs.indices.map(i => r.getDouble(r.fieldIndex(s"q$i")))
      }.toMap
    assert(got === bruteWeighted(rows, fs))
  }

  test("weightedQuantiles with unit weights equals the type-1 " +
      "unweighted quantile; wsum sums admitted weight only") {
    val rows = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 1L),
      ("a", 4.0, 1L),
      // ignored: null value, null weight, zero and negative weight
      ("a", 5.0, 0L), ("a", 6.0, -3L))
    val df = rows.toDF("g", "v", "w")
      .union(Seq(("a", Option.empty[Double], Option(1L)),
        ("a", Option(7.0), Option.empty[Long])).toDF("g", "v", "w"))
    val r = ExactQuantile.weightedQuantiles(df, "g", "v", "w",
      Seq("p50" -> 0.5, "p100" -> 1.0)).head()
    // type-1 over {1,2,3,4}: p50 = first v with cum >= 2 = 2.0
    assert(r.getDouble(r.fieldIndex("p50")) === 2.0)
    assert(r.getDouble(r.fieldIndex("p100")) === 4.0)
    assert(r.getLong(r.fieldIndex("wsum")) === 4L)
  }

  test("weightedQuantiles: empty input and bad arguments") {
    val df = Seq.empty[(String, Double, Long)].toDF("g", "v", "w")
    assert(ExactQuantile.weightedQuantiles(df, "g", "v", "w",
      Seq("p50" -> 0.5)).count() === 0)
    intercept[IllegalArgumentException] {
      ExactQuantile.weightedQuantiles(df, "g", "v", "w", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      ExactQuantile.weightedQuantiles(df, "g", "v", "w",
        Seq("p" -> -0.1))
    }
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(String, Double)].toDF("g", "v")
    assert(ExactQuantile.quantiles(df, "g", "v", Seq("p50" -> 0.5)).count() === 0)
  }

  test("rejects bad arguments") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      ExactQuantile.quantiles(df, "g", "v", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      ExactQuantile.quantiles(df, "g", "v", Seq("p" -> 1.5))
    }
    intercept[IllegalArgumentException] {
      ExactQuantile.quantiles(df, "g", "v", Seq("p" -> 0.5), buckets = 1)
    }
  }

  // ---- adaptive second bucketing level (the one-level-bound closure) ----

  /** One outlier stretches [lo, hi] 10^9× past the data's real spread,
    * so every real value lands in level-1 bucket 0 — the exact
    * distinct-value pathology the r15 verdict flagged. With buckets=8
    * and maxBucketSort=100, the 500-distinct bucket MUST take the
    * second level (500 > 100) and the sub-buckets over the bucket's
    * own [0,1) spread hold ~63 each — bounded, and bit-equal to the
    * built-in. */
  private def outlierStretched(n: Int): DataFrame = {
    val rng = new scala.util.Random(99)
    ((1 to n).map(i => ("hot", rng.nextDouble())) :+ ("hot", 1e9))
      .toDF("g", "v")
  }

  test("adaptive second level: outlier-stretched bucket matches the " +
      "built-in bit-for-bit with a bounded in-bucket sort") {
    val df = outlierStretched(500)
    val got = ExactQuantile.quantiles(df, "g", "v", fracs,
      buckets = 8, maxBucketSort = 100)
      .collect().map { r =>
        r.getString(r.fieldIndex("g")) ->
          fracs.map { case (nm, _) => r.getDouble(r.fieldIndex(nm)) }
      }.toMap
    assert(got === builtin(df, "g", "v"))
  }

  test("adaptive second level: weightedQuantiles on the stretched " +
      "bucket matches brute force") {
    val rng = new scala.util.Random(13)
    val rows = ((1 to 400).map(i =>
      ("hot", rng.nextDouble(), (rng.nextInt(9) + 1).toLong)) :+
      ("hot", 1e9, 2L))
    val fs = Seq(0.0, 0.5, 0.9, 1.0)
    val got = ExactQuantile.weightedQuantiles(
      rows.toDF("g", "v", "w"), "g", "v", "w",
      fs.zipWithIndex.map { case (f, i) => s"q$i" -> f },
      buckets = 8, maxBucketSort = 80)
      .collect().map { r =>
        r.getString(r.fieldIndex("g")) ->
          fs.indices.map(i => r.getDouble(r.fieldIndex(s"q$i")))
      }.toMap
    assert(got === bruteWeighted(rows, fs))
  }

  test("adaptive second level fails LOUDLY when distinct values " +
      "concentrate in under 1/buckets² of their own spread") {
    // 400 distinct values within [0, 1e-12] plus one at 1.0 share a
    // level-1 bucket (outlier at 1e9 stretches the range); the second
    // level re-buckets over [0, 1.0] and the cluster still fits one
    // sub-bucket — the operator must refuse the one-task sort, not
    // run it silently.
    val df = ((1 to 400).map(i => ("hot", i * 1e-15)) ++
      Seq(("hot", 1.0), ("hot", 1e9))).toDF("g", "v")
    val e = intercept[IllegalStateException] {
      ExactQuantile.quantiles(df, "g", "v", Seq("p50" -> 0.5),
        buckets = 8, maxBucketSort = 100).collect()
    }
    assert(e.getMessage.contains("maxBucketSort") ||
      e.getMessage.contains("distinct"))
  }

  test("the probe leaves ordinary data on the single-level plan " +
      "(same results, default bound untouched)") {
    // sanity companion: with the default maxBucketSort nothing in a
    // small frame can trigger level 2, and results equal the built-in
    val df = outlierStretched(300)
    assert(ours(df, "g", "v") === builtin(df, "g", "v"))
  }
}
