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
