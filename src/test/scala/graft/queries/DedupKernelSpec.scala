package graft.queries

import graft.SparkSessionFixture
import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalatest.funsuite.AnyFunSuite

/** `spark.graft.dedup.kernel` dispatch: the conf swaps ONLY the
  * signature family (portable md5/h60 vs native splitmix64/xxhash64)
  * while every downstream stage — banding layout, candidate dedup,
  * exact verify — is shared, so both kernels must find the same
  * planted ground truth even though their candidate sets differ. */
class DedupKernelSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def withKernel[A](k: String)(body: => A): A = {
    spark.conf.set(DedupQueries.KernelConf, k)
    try body finally spark.conf.unset(DedupQueries.KernelConf)
  }

  // a 60-doc corpus with one planted EXACT copy (doc 9000 of doc 3)
  // and one planted near-copy (doc 9001 = doc 5 + one appended token):
  // ground truth both signature families must recover via banding
  private def corpus = {
    val base = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 60).select("doc_id", "text")
    base.unionByName(
        base.filter(col("doc_id") === 3)
          .select(lit(9000L).as("doc_id"), col("text")))
      .unionByName(
        base.filter(col("doc_id") === 5)
          .select(lit(9001L).as("doc_id"),
            concat(col("text"), lit(" zzextra")).as("text")))
  }

  test("default kernel is portable, and the dispatcher returns the " +
      "portable pipeline bit-for-bit") {
    assert(DedupQueries.dedupKernel(spark) == "portable")
    val dispatched = DedupQueries.minhashPairsKernel(spark, corpus)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val direct = DedupQueries.portableMinhashPairs(corpus)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(dispatched == direct)
  }

  test("kernel=native dispatches to the splitmix64 family bit-for-bit") {
    withKernel("native") {
      val dispatched = DedupQueries.minhashPairsKernel(spark, corpus)
        .orderBy("doc_a", "doc_b").collect().toSeq
      val direct = DedupQueries.minhashPairs(corpus)
        .orderBy("doc_a", "doc_b").collect().toSeq
      assert(dispatched == direct)
      val sk = DedupQueries.simhashSketchKernel(spark, corpus)
        .orderBy("doc_id").collect().toSeq
      val skDirect = DedupQueries.simhashSketch(corpus)
        .orderBy("doc_id").collect().toSeq
      assert(sk == skDirect)
    }
  }

  test("BOTH kernels recover the planted exact copy at jaccard 1.0 " +
      "and the near-copy above 0.8 — family quality costs recall on " +
      "organic text, never on identical shingle sets") {
    Seq("portable", "native").foreach { k =>
      withKernel(k) {
        val pairs = DedupQueries.minhashPairsKernel(spark, corpus)
          .filter(col("doc_b") >= 9000L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSeq.sortBy(_._2)
        assert(pairs.exists { case (a, b, j) => a == 3L && b == 9000L && j == 1.0 },
          s"$k kernel missed the planted exact copy: $pairs")
        assert(pairs.exists { case (a, b, j) => a == 5L && b == 9001L && j > 0.8 },
          s"$k kernel missed the planted near-copy: $pairs")
      }
    }
  }

  test("both kernels produce a valid d03 simhash sketch: exact copies " +
      "share a fingerprint, every doc is sketched") {
    val n = corpus.count()
    Seq("portable", "native").foreach { k =>
      withKernel(k) {
        val sk = DedupQueries.simhashSketchKernel(spark, corpus)
        assert(sk.count() == n, s"$k kernel dropped docs from the sketch")
        val planted = sk.filter(col("doc_id").isin(3L, 9000L))
          .collect().map(_.getLong(1)).toSet
        assert(planted.size == 1,
          s"$k kernel: identical text got distinct simhashes")
      }
    }
  }

  test("an unknown kernel value fails fast with the conf name") {
    withKernel("simd") {
      val e = intercept[IllegalArgumentException] {
        DedupQueries.dedupKernel(spark)
      }
      assert(e.getMessage.contains(DedupQueries.KernelConf))
    }
  }
}
