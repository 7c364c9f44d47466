package graft.functions

import graft.SparkSessionFixture
import graft.functions.VectorExpressions.{array_cosine, array_dot}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  private val df = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(1.0, 0.0), Seq(0.0, 1.0)),
    (Seq(2.0, 0.0), Seq(4.0, 0.0))).toDF("a", "b")

  test("array_dot matches the HOF composition bit-for-bit") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(array_dot(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 32.0)
  }

  test("array_cosine: orthogonal→0, parallel→1") {
    val out = df.select(array_cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(out(1)) < 1e-15)
    assert(math.abs(out(2) - 1.0) < 1e-15)
  }

  test("null ELEMENT yields null result, not garbage") {
    val r = Seq((Seq(Some(1.0), None), Seq(Some(2.0), Some(3.0))))
      .toDF("a", "b")
      .select(array_dot(col("a"), col("b")), array_cosine(col("a"), col("b")))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("null inputs propagate null") {
    val r = Seq((Option.empty[Seq[Double]], Option(Seq(1.0))))
      .toDF("a", "b")
      .select(array_cosine(col("a"), col("b")))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("codegen path: expression works inside a multi-row pipeline with filter") {
    val n = spark.range(1000)
      .select(transform(sequence(lit(0), lit(9)),
        i => (col("id") + i).cast("double")).as("v"))
      .select(array_cosine(col("v"), col("v")).as("c"))
      .filter(col("c") > 0.999999)
      .count()
    assert(n == 1000)
  }

  test("jaccard_sorted == intersect/union on random sorted distinct sets") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val a = Seq.fill(rng.nextInt(50) + 1)(rng.nextInt(60).toLong)
        .distinct.sorted
      val b = Seq.fill(rng.nextInt(50) + 1)(rng.nextInt(60).toLong)
        .distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
      .withColumn("fast", VectorExpressions.jaccard_sorted(col("a"), col("b")))
      .withColumn("ref",
        size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b"))).cast("double"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0,
      df.filter(col("fast") =!= col("ref")).collect().take(3).mkString("; "))
  }

  test("jaccard_sorted: identical sets give exactly 1.0, disjoint " +
      "sets 0.0, both-empty null, unsorted input fails loudly") {
    val one = Seq((Seq(1L, 5L, 9L), Seq(1L, 5L, 9L))).toDF("a", "b")
      .select(VectorExpressions.jaccard_sorted(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(one == 1.0)
    val zero = Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
      .select(VectorExpressions.jaccard_sorted(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(zero == 0.0)
    val empty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
      .select(VectorExpressions.jaccard_sorted(col("a"), col("b")))
      .collect()(0)
    assert(empty.isNullAt(0))
    val ex = intercept[Exception] {
      Seq((Seq(5L, 1L, 9L), Seq(1L, 2L, 9L))).toDF("a", "b")
        .select(VectorExpressions.jaccard_sorted(col("a"), col("b")))
        .collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")) ++ Iterator(""))
        .mkString(" | ")
    assert(rootMsg(ex).contains("strictly ascending"), rootMsg(ex))
    // Duplicate elements violate the DISTINCT half of the contract
    // (would silently inflate the union count): must also fail loudly.
    val dup = intercept[Exception] {
      Seq((Seq(1L, 1L, 2L), Seq(1L, 2L))).toDF("a", "b")
        .select(VectorExpressions.jaccard_sorted(col("a"), col("b")))
        .collect()
    }
    assert(rootMsg(dup).contains("strictly ascending"), rootMsg(dup))
    // Violations in the tail AFTER the shorter array exhausts are also
    // caught (a=[1], b=[1,3,3] would otherwise report 1/3 for true 1/2).
    val tail = intercept[Exception] {
      Seq((Seq(1L), Seq(1L, 3L, 3L))).toDF("a", "b")
        .select(VectorExpressions.jaccard_sorted(col("a"), col("b")))
        .collect()
    }
    assert(rootMsg(tail).contains("strictly ascending"), rootMsg(tail))
    // And a well-formed pair whose tail is fine still computes exactly.
    val half = Seq((Seq(1L), Seq(1L, 3L))).toDF("a", "b")
      .select(VectorExpressions.jaccard_sorted(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(half == 0.5)
  }
}
