package graft.functions

import graft.SparkSessionFixture
import graft.functions.SketchExpressions.{char_gram_set, minhash_sig, simhash64}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchExpressionsSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  test("minhash: identical sets → identical signatures; sig length = k") {
    val df = Seq(
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(30L, 10L, 20L)),   // same set, different order
      (3L, Seq(10L, 20L, 99L)))   // 2/4 jaccard vs set 1
    .toDF("id", "sh")
    val sigs = df.select(col("id"), minhash_sig(col("sh"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length == 16)
    assert(sigs(1L) == sigs(2L))          // order-insensitive
    assert(sigs(1L) != sigs(3L))
    // overlapping sets agree on some hash slots (jaccard estimate > 0)
    assert(sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } > 0)
  }

  test("minhash estimate tracks true jaccard on random sets") {
    val rng = new scala.util.Random(1)
    val base = Seq.fill(200)(rng.nextLong())
    val overlap = base.take(100) ++ Seq.fill(100)(rng.nextLong()) // J ≈ 1/3
    val df = Seq((1L, base), (2L, overlap)).toDF("id", "sh")
    val sigs = df.select(col("id"), minhash_sig(col("sh"), 256).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val est = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b } / 256.0
    assert(math.abs(est - 1.0 / 3.0) < 0.1, s"estimate $est far from 1/3")
  }

  test("simhash: identical multisets equal; near sets land within small hamming") {
    val base = (1L to 60L).toSeq
    val near = base.updated(0, 999L)      // one token differs
    val far = (1000L to 1060L).toSeq
    val df = Seq((1L, base), (2L, base.reverse), (3L, near), (4L, far))
      .toDF("id", "hs")
    val sh = df.select(col("id"), simhash64(col("hs")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(2L))              // order-insensitive (vote sums)
    assert(hamming(sh(1L), sh(3L)) <= 12)
    assert(hamming(sh(1L), sh(4L)) > 12)
  }

  test("codegen path: kernels run inside a filtered multi-row pipeline") {
    val n = spark.range(500)
      .select(col("id"), transform(sequence(lit(1), lit(20)),
        i => (col("id") * 31 + i).cast("long")).as("sh"))
      .select(minhash_sig(col("sh"), 8).as("sig"), simhash64(col("sh")).as("sim"))
      .filter(size(col("sig")) === 8 && col("sim") =!= 0L)
      .count()
    assert(n == 500)
  }

  /** The composed-SQL gram recipe char_gram_set must replicate
    * BIT-identically — d04's full hash oracle rides on the swap being
    * value-invisible. */
  private def composedGrams(w: Int) = array_sort(array_distinct(expr(
    s"""CASE WHEN length(text) >= $w
       | THEN transform(sequence(1, length(text)-${w - 1}),
       |                i -> xxhash64(substring(text, i, $w)))
       | ELSE array(xxhash64(text)) END""".stripMargin)))

  test("char_gram_set is bit-identical to the composed xxhash64 " +
      "substring SQL, multibyte and edge strings included") {
    val rng = new scala.util.Random(5)
    val alphabets = Seq("abcde ", "αβγδε", "日本語中文한국", "a€𝄞z")
    val random = (1 to 300).map { i =>
      val al = alphabets(i % alphabets.size)
      (1 to (rng.nextInt(40) + 1))
        .map(_ => al(rng.nextInt(al.length))).mkString
    }
    val edges = Seq("", "a", "abcd", "abcde", "aaaaaaaaaa", "€€€€€€",
      "𝄞𝄞𝄞𝄞𝄞𝄞𝄞", "tab\tand\nnewline")
    val df = (random ++ edges).toDF("text")
    Seq(3, 5).foreach { w =>
      val mismatch = df
        .select(char_gram_set(col("text"), w).as("native"),
          composedGrams(w).as("sql"))
        .filter(col("native") =!= col("sql"))
        .count()
      assert(mismatch === 0, s"w=$w native kernel diverged from SQL")
    }
  }

  test("char_gram_set null edge: NULL text yields array(42) like the " +
      "composed SQL (hash of null = unchanged seed)") {
    val df = Seq(Option.empty[String], Some("x")).toDF("text")
    val got = df.select(char_gram_set(col("text"), 5).as("g"))
      .collect().map(_.getSeq[Long](0)).toSeq
    val sql = df.select(composedGrams(5).as("g"))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(got === sql)
    assert(got.head === Seq(42L))
  }
}
