package graft.operators

import graft.SparkSessionFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  import SparkSessionFixture.spark

  private lazy val df = spark.range(0, 20000).toDF("id")

  test("byKeyHash: deterministic across runs and partitionings, ~fraction") {
    val a = Sampling.byKeyHash(df, "id", 0.1).collect().map(_.getLong(0)).toSet
    val b = Sampling.byKeyHash(df.repartition(13), "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(a == b) // partitioning-independent — plain sample() is not
    assert(math.abs(a.size / 20000.0 - 0.1) < 0.02)
  }

  test("split: disjoint, exhaustive, deterministic") {
    val (train, eval) = Sampling.split(df, "id", 0.2)
    val t = train.collect().map(_.getLong(0)).toSet
    val e = eval.collect().map(_.getLong(0)).toSet
    assert((t & e).isEmpty)
    assert(t.size + e.size == 20000)
    assert(math.abs(e.size / 20000.0 - 0.2) < 0.02)
  }

  test("portableGate: uniform under power-of-two moduli (the ascii-code " +
      "gate hit only 10 of 16 residues; the nibble-value gate hits all)") {
    // % 16 occupancy: every shard occupied, skew bounded — this is the
    // t15 nShards=16 contract
    val shards = df.select(pmod(Sampling.portableGate(col("id")), lit(16))
        .as("s"))
      .groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    assert(shards.keySet == (0 until 16).toSet,
      s"only ${shards.size} of 16 shards occupied: ${shards.keySet.toSeq.sorted}")
    val exp = 20000.0 / 16
    shards.values.foreach { n =>
      assert(math.abs(n - exp) / exp < 0.10,
        s"shard skew: $n vs expected $exp (>10%)")
    }
    // % 4096 achieved rate tracks nominal — the t16/t18 rate contract
    // (the ascii-code gate kept ~0.56 at nominal 0.3 and 100% at >=0.54)
    for (rate <- Seq(0.3, 0.5, 0.7)) {
      val kept = df.filter(pmod(Sampling.portableGate(col("id")), lit(4096))
        < (rate * 4096)).count()
      assert(math.abs(kept / 20000.0 - rate) < 0.02,
        s"nominal $rate achieved ${kept / 20000.0}")
    }
  }

  test("portableGateSql mirrors portableGate bit-identically (spot check " +
      "via Spark SQL parsing of the DuckDB expression)") {
    // the generated SQL uses only ascii/substring/md5/CASE — all valid
    // Spark SQL too, so Spark itself can attest the mirror
    val sql = Sampling.portableGateSql("CAST(id AS STRING)")
    val diff = df.select(
        Sampling.portableGate(col("id")).as("scala_gate"),
        expr(sql).as("sql_gate"))
      .filter(col("scala_gate") =!= col("sql_gate")).count()
    assert(diff == 0, s"$diff rows diverge between Scala and SQL gate")
  }

  test("stratifiedByHash: per-stratum fractions hold") {
    val strat = df.withColumn("lang",
      when(col("id") % 2 === 0, "en").otherwise("de"))
    val out = Sampling.stratifiedByHash(strat, "lang", "id",
      Map("en" -> 0.5, "de" -> 0.1))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("en") / 10000.0 - 0.5) < 0.05)
    assert(math.abs(out("de") / 10000.0 - 0.1) < 0.05)
  }

  import SparkSessionFixture.spark.implicits._

  /** Random integer-weighted corpus for the PPS tests: two strata,
    * one planted mega-doc in "a" whose weight exceeds W/k (must be
    * selected with certainty and absorb several thresholds). */
  private lazy val ppsRows: Seq[(String, Long, Long)] = {
    val rng = new scala.util.Random(7)
    (1L to 4000L).map { id =>
      (if (id % 3 == 0) "b" else "a", id, (rng.nextInt(99) + 1).toLong)
    } :+ (("a", 4001L, 40000L))
  }

  /** Flat replay of systematic PPS: sort by (skey, id), accumulate
    * weight, count the thresholds (j+0.5)·W/k inside each row's
    * interval — the definition systematicPps distributes. */
  private def brutePps(rows: Seq[(String, Long, Long, Long)],
      k: Int): Map[(String, Long), Long] =
    rows.groupBy(_._1).flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val total = sorted.map(_._4).sum
      val ts = (0 until k).map(j => (j + 0.5) * total.toDouble / k)
      var cum = 0L
      sorted.flatMap { case (g, _, id, w) =>
        val prev = cum; cum += w
        val hits = ts.count(t => prev < t && cum >= t)
        if (hits > 0) Some((g, id) -> hits.toLong) else None
      }
    }

  test("systematicPps matches the flat cumsum replay; Σhits per " +
      "stratum is exactly k; the over-budget doc absorbs >1 threshold") {
    val k = 25
    val df = ppsRows.toDF("g", "id", "w")
    val withKey = df.select(col("g"), col("id"), col("w"),
        Sampling.portableGate(concat(col("id").cast("string"),
          lit(":t"))).cast("long").as("skey"))
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(1),
        r.getLong(2))).toSeq
    val got = Sampling.systematicPps(df, "g", "id", "w", k, salt = "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got === brutePps(withKey, k))
    val perStratum = got.groupBy(_._1._1).view.mapValues(_.values.sum)
    assert(perStratum("a") === k && perStratum("b") === k)
    // mega-doc weight 40000 > W/k ≈ (135k+40k)/25 → certain, multi-hit
    assert(got(("a", 4001L)) > 1L)
  }

  test("systematicPps: partitioning-independent, salt re-draws, " +
      "non-positive/null weights dropped") {
    val df = ppsRows.toDF("g", "id", "w")
    val a = Sampling.systematicPps(df, "g", "id", "w", 25)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .toSet
    val b = Sampling.systematicPps(df.repartition(17), "g", "id", "w", 25)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .toSet
    assert(a === b) // pure function of (key, salt, corpus)
    val c = Sampling.systematicPps(df, "g", "id", "w", 25, salt = "v2")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .toSet
    assert(a !== c) // new salt = a fresh draw
    // rows with w <= 0 or null never participate (CDF stays monotone)
    val dirty = df.union(Seq(("a", 9001L, 0L), ("a", 9002L, -5L))
        .toDF("g", "id", "w"))
      .union(Seq(("a", Option(9003L), Option.empty[Long]))
        .toDF("g", "id", "w"))
    val d = Sampling.systematicPps(dirty, "g", "id", "w", 25)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .toSet
    assert(d === a)
  }

  test("systematicPps: empty input and bad arguments") {
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "id", "w")
    assert(Sampling.systematicPps(empty, "g", "id", "w", 5).count() === 0)
    val df = ppsRows.take(10).toDF("g", "id", "w")
    intercept[IllegalArgumentException] {
      Sampling.systematicPps(df, "g", "id", "w", 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.systematicPps(df, "g", "id", "w", 5, bucketBits = 24)
    }
  }
}
