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
}
