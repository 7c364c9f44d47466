package graft.operators

import graft.SparkSessionFixture
import org.scalatest.funsuite.AnyFunSuite

/** KsDrift must be EXACT — the max CDF deviation is integer
  * arithmetic, so the result is comparable bit-for-bit against a
  * brute-force reference (and q55's DuckDB hash oracle rides on
  * that). */
class KsDriftSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  /** Brute-force two-sample KS over Spark's double ordering
    * (-0.0 < 0.0, NaN greatest, NaN == NaN for grouping). */
  private def brute(rows: Seq[(String, Double, Int)])
      : Map[String, (Long, Long, Option[Double], Option[Double])] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val na = rs.count(_._3 == 0).toLong
      val nb = rs.count(_._3 == 1).toLong
      if (na == 0L || nb == 0L) g -> ((na, nb, None, None))
      else {
        val sorted = rs.map(_._2)
          .sortWith(java.lang.Double.compare(_, _) < 0)
        val distinct = sorted.foldLeft(List.empty[Double]) { (acc, v) =>
          if (acc.nonEmpty && java.lang.Double.compare(acc.head, v) == 0) acc
          else v :: acc
        }.reverse
        var cuma = 0L; var cumb = 0L
        var best = BigInt(-1); var bestV = Double.NaN
        distinct.foreach { v =>
          cuma += rs.count(r =>
            java.lang.Double.compare(r._2, v) == 0 && r._3 == 0)
          cumb += rs.count(r =>
            java.lang.Double.compare(r._2, v) == 0 && r._3 == 1)
          val d = (BigInt(cuma) * nb - BigInt(cumb) * na).abs
          if (d > best) { best = d; bestV = v }
        }
        val ks = best.toDouble / (na.toDouble * nb.toDouble)
        g -> ((na, nb, Some(ks), Some(bestV)))
      }
    }

  private def ours(rows: Seq[(String, Double, Int)], buckets: Int = 64,
      hinted: Boolean = true)
      : Map[String, (Long, Long, Option[Double], Option[Double])] =
    KsDrift.ks2(rows.toDF("g", "v", "s"), "g", "v", "s",
        buckets = buckets, hinted = hinted)
      .collect().map { r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      }.toMap

  private def assertSame(rows: Seq[(String, Double, Int)],
      buckets: Int = 64): Unit = {
    val b = brute(rows)
    val o = ours(rows, buckets)
    assert(o.keySet == b.keySet)
    b.foreach { case (g, (na, nb, ks, kv)) =>
      val (ona, onb, oks, okv) = o(g)
      assert(ona == na && onb == nb, s"$g counts")
      assert(oks == ks, s"$g ks: $oks vs $ks")
      (okv, kv) match {
        case (Some(a), Some(e)) =>
          assert(java.lang.Double.compare(a, e) == 0, s"$g witness")
        case (a, e) => assert(a == e, s"$g witness")
      }
    }
  }

  test("matches brute force exactly on mixed random data") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 4000).map { i =>
      val g = s"g${i % 5}"
      // side B drawn from a shifted distribution for g0/g1 so the
      // detector has real drift to find; duplicate-heavy draws so the
      // census fold matters
      val s = rng.nextInt(2)
      val base = if (s == 1 && i % 5 <= 1) 3.0 else 0.0
      val v = if (rng.nextBoolean()) base + rng.nextInt(20).toDouble
              else base + rng.nextDouble() * 20
      (g, v, s)
    }
    assertSame(rows)
    assertSame(rows, buckets = 2) // degenerate histogram still exact
  }

  test("identical sides give ks = 0; disjoint sides give ks = 1") {
    val same = (1 to 200).flatMap(i =>
      Seq(("g", i.toDouble % 17, 0), ("g", i.toDouble % 17, 1)))
    val (_, _, ks0, _) = ours(same)("g")
    assert(ks0.contains(0.0))
    val disjoint = (1 to 100).map(i => ("g", i.toDouble, 0)) ++
      (1 to 100).map(i => ("g", 1000.0 + i, 1))
    val (_, _, ks1, kv1) = ours(disjoint)("g")
    assert(ks1.contains(1.0))
    // witness = the point where F_A = 1 and F_B = 0 first happens
    assert(kv1.contains(100.0))
  }

  test("an empty side yields null ks, not a division blowup") {
    val rows = (1 to 50).map(i => ("g", i.toDouble, 0)) ++
      Seq(("h", 1.0, 0), ("h", 2.0, 1))
    val o = ours(rows)
    assert(o("g") == ((50L, 0L, None, None)))
    assert(o("h")._3.isDefined)
  }

  test("NaN and infinities ride the sentinel buckets exactly") {
    val rng = new scala.util.Random(11)
    val specials = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity)
    val rows = (1 to 600).map { i =>
      val v = if (i % 13 == 0) specials(i % 3)
              else rng.nextDouble() * 10
      (s"g${i % 2}", v, rng.nextInt(2))
    }
    assertSame(rows)
  }

  /** Dense brute force for one-vs-rest: evaluate the deviation at
    * EVERY global census point (the thing the operator's two-candidate
    * trick avoids) — independent of the implementation's shortcut. */
  private def bruteOvr(rows: Seq[(String, Double)])
      : Map[String, (Long, Long, Option[Double])] = {
    val n = rows.size.toLong
    val globalSorted = rows.map(_._2)
      .sortWith(java.lang.Double.compare(_, _) < 0)
      .foldLeft(List.empty[Double]) { (acc, v) =>
        if (acc.nonEmpty && java.lang.Double.compare(acc.head, v) == 0) acc
        else v :: acc
      }.reverse
    rows.groupBy(_._1).map { case (s, rs) =>
      val ns = rs.size.toLong
      val nr = n - ns
      if (nr == 0L) s -> ((ns, 0L, None))
      else {
        var cums = 0L; var cumg = 0L; var best = BigInt(-1)
        globalSorted.foreach { v =>
          cums += rs.count(r => java.lang.Double.compare(r._2, v) == 0)
          cumg += rows.count(r => java.lang.Double.compare(r._2, v) == 0)
          val d = (BigInt(cums) * n - BigInt(cumg) * ns).abs
          if (d > best) best = d
        }
        s -> ((ns, nr, Some(best.toDouble / (ns.toDouble * nr.toDouble))))
      }
    }
  }

  test("one-vs-rest matches a dense per-global-point brute force") {
    val rng = new scala.util.Random(31)
    val rows = (1 to 3000).map { i =>
      val s = s"src${i % 9}"
      // src0 drawn shifted so one stratum is genuinely anomalous;
      // duplicate-heavy so censuses fold
      val base = if (i % 9 == 0) 5.0 else 0.0
      (s, base + rng.nextInt(25).toDouble)
    } ++ (1 to 40).map(i => ("srcNaN", if (i % 4 == 0) Double.NaN
      else rng.nextInt(25).toDouble))
    val b = bruteOvr(rows)
    val got = KsDrift.ksOneVsRest(rows.toDF("s", "v"), "s", "v",
        buckets = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got.keySet == b.keySet)
    b.foreach { case (s, e) => assert(got(s) == e, s) }
    // the two planted anomalies top the leaderboard (the NaN-heavy
    // stratum is the more extreme of the two)
    val top2 = got.toSeq.sortBy(-_._2._3.getOrElse(0.0)).take(2)
      .map(_._1).toSet
    assert(top2 == Set("srcNaN", "src0"), top2)
  }

  test("one-vs-rest: a stratum that IS the whole corpus gets null ks") {
    val rows = (1 to 30).map(i => ("only", i.toDouble))
    val got = KsDrift.ksOneVsRest(rows.toDF("s", "v"), "s", "v")
      .collect()
    assert(got.length == 1 && got(0).isNullAt(3) && got(0).isNullAt(4))
  }

  test("weighted one-vs-rest equals the unweighted statistic on the " +
      "weight-exploded rows") {
    val rng = new scala.util.Random(47)
    val weighted = (1 to 600).map(i =>
      (s"src${i % 5}", rng.nextInt(20).toDouble, rng.nextInt(4).toLong))
    val exploded = weighted.filter(_._3 > 0).flatMap { case (s, v, w) =>
      Seq.fill(w.toInt)((s, v))
    }
    def run(df: org.apache.spark.sql.DataFrame, wc: String) =
      KsDrift.ksOneVsRest(df, "s", "v", buckets = 64, weightCol = wc)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val gotW = run(weighted.toDF("s", "v", "w"), "w")
    val gotU = run(exploded.map(t => (t._1, t._2, 1L)).toDF("s", "v", "w"),
      null)
    assert(gotW == gotU)
  }

  test("weighted ks2 equals the unweighted statistic on the " +
      "weight-exploded rows; non-positive weights are dropped") {
    val rng = new scala.util.Random(43)
    val weighted = (1 to 800).map { i =>
      (s"g${i % 3}", rng.nextInt(30).toDouble, rng.nextInt(2),
        rng.nextInt(5).toLong - 1L) // weights in -1..3: some dropped
    }
    val exploded = weighted.filter(_._4 > 0).flatMap { case (g, v, s, w) =>
      Seq.fill(w.toInt)((g, v, s))
    }
    val gotW = KsDrift.ks2(
        weighted.toDF("g", "v", "s", "w"), "g", "v", "s",
        buckets = 64, weightCol = "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val gotU = ours(exploded, buckets = 64).map { case (g, (na, nb, ks, kv)) =>
      g -> ((na, nb, ks.get, kv.get))
    }
    assert(gotW == gotU)
  }

  test("hinted = false (shuffled joins) is result-identical") {
    val rng = new scala.util.Random(23)
    val rows = (1 to 1000).map(i =>
      (s"g${i % 3}", rng.nextInt(40).toDouble, rng.nextInt(2)))
    assert(ours(rows) == ours(rows, hinted = false))
  }
}
