package graft.operators

import graft.SparkSessionFixture
import org.scalatest.funsuite.AnyFunSuite

/** BpeMerge must be GREEDY BPE exactly (Sennrich 2016 merge
  * semantics): within a word, a learned pair merges left-to-right
  * without overlap. The boundary-string replace trick is the whole
  * load-bearing idea (t42's DuckDB oracle replays it verbatim), so the
  * overlap edge case gets its own leg. */
class BpeMergeSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  private def learn(words: Seq[(String, Long)], rounds: Int) =
    BpeMerge.learn(words.toDF("w", "freq"), rounds)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq

  test("textbook corpus: merges follow pair frequency with the " +
      "deterministic (count desc, pair asc) tie-break") {
    // Sennrich's running example shape: 'er' dominates
    val words = Seq(("lower", 2L), ("newer", 6L), ("wider", 3L))
    val out = learn(words, 2)
    // round 1: 'e r' appears once per word occurrence = 11, the max
    assert(out(0)._2 == "e" && out(0)._3 == "r" && out(0)._4 == 11L)
    // round 2: 'w er' from lower(2) + newer(6) = 8 beats everything
    // ('n e' = 6, 'e w' = 6, ... all <= 6)
    assert(out(1)._2 == "w" && out(1)._3 == "er" && out(1)._4 == 8L)
    // tokens_after trajectory: 5+5+5 chars weighted = 2*5+6*5+3*5 = 55,
    // minus one symbol per merged occurrence: 55-11=44, then 44-8=36
    assert(out.map(_._5) == Seq(44L, 36L))
  }

  test("greedy non-overlap: merging (a,a) in 'aaaa' yields [aa,aa], " +
      "never [aa,a,a] — the boundary-string edge case") {
    val out = learn(Seq(("aaaa", 1L)), 2)
    assert(out(0)._2 == "a" && out(0)._3 == "a" && out(0)._4 == 3L,
      s"round-1 census must count 3 overlapping (a,a) pairs: $out")
    // after greedy merge: [aa, aa] → tokens_after 2, vocab {aa}
    assert(out(0)._5 == 2L && out(0)._6 == 1L,
      s"greedy replace must leave [aa, aa]: $out")
    // round 2 merges (aa,aa) → one symbol 'aaaa'
    assert(out(1)._2 == "aa" && out(1)._3 == "aa" && out(1)._4 == 1L &&
      out(1)._5 == 1L && out(1)._6 == 1L)
  }

  test("odd-run greedy: 'aaa'×2 merges to [aa,a] per word; the " +
      "leftover single 'a' stays a symbol") {
    val out = learn(Seq(("aaa", 2L)), 1)
    // census: 2 pairs per word × freq 2 = 4
    assert(out(0)._2 == "a" && out(0)._3 == "a" && out(0)._4 == 4L)
    // [aa, a] weighted by 2 = 4 tokens; vocab {aa, a}
    assert(out(0)._5 == 4L && out(0)._6 == 2L)
  }

  test("single-char and empty-pair words survive: no pairs, no rows " +
      "lost, stats still count them") {
    val out = learn(Seq(("a", 5L), ("bc", 1L)), 1)
    // only (b,c) exists as a pair
    assert(out(0)._2 == "b" && out(0)._3 == "c" && out(0)._4 == 1L)
    // tokens: 'a'×5 (1 sym) + merged 'bc' (1 sym) = 6; vocab {a, bc}
    assert(out(0)._5 == 6L && out(0)._6 == 2L)
  }

  test("encode(carry): the apply step uses exactly the learned merge " +
      "sequence — carry-split vocabularies produce identical encodings " +
      "and the same global token total as learn reports") {
    val words = Seq(("lower", 2L), ("newer", 6L), ("wider", 3L))
    val learned = BpeMerge.learn(words.toDF("w", "freq"), 2).collect()
    val tokensAfter = learned.last.getLong(4)
    // the same mass split across two carry groups (lower's freq 2 = 1+1)
    val carried = Seq(
      ("a", "lower", 1L), ("b", "lower", 1L),
      ("a", "newer", 6L), ("b", "wider", 3L))
    val enc = BpeMerge.encode(carried.toDF("g", "w", "freq"), 2,
      Seq("g", "w"))
    val rows = enc.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // identical word → identical encoding, regardless of carry group
    val lowers = rows.filter(_._2 == "lower").map(_._3).distinct
    assert(lowers.length == 1, s"carry split changed the encoding: $rows")
    // global token mass matches the learner's own trajectory
    val total = enc
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("freq") *
          org.apache.spark.sql.functions.size(
            BpeMerge.symbolsOf(org.apache.spark.sql.functions.col("sy")))
            .cast("long")))
      .collect()(0).getLong(0)
    assert(total == tokensAfter,
      s"encode total $total != learn tokens_after $tokensAfter")
  }

  test("encode ≡ collectMerges + applyMerges static chain — the r20 " +
      "t43 substitution is result-identical word for word") {
    val words = Seq(("lower", 2L), ("newer", 6L), ("wider", 3L),
      ("aaaa", 4L), ("a", 1L))
    val df = words.toDF("w", "freq")
    val enc = BpeMerge.encode(df, 3, Seq("w")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val merges = BpeMerge.collectMerges(df, 3)
    val chain = df.select(org.apache.spark.sql.functions.col("w"),
        BpeMerge.applyMerges(
          org.apache.spark.sql.functions.col("w"), merges).as("sy"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach { case (w, _) =>
      assert(enc(w) == chain(w),
        s"'$w': encode='${enc(w)}' chain='${chain(w)}'")
    }
  }

  test("merged symbols compose across rounds (multi-char symbols " +
      "merge further, the m+er shape)") {
    val words = Seq(("mer", 4L), ("er", 1L))
    val out = learn(words, 2)
    assert(out(0)._2 == "e" && out(0)._3 == "r" && out(0)._4 == 5L)
    assert(out(1)._2 == "m" && out(1)._3 == "er" && out(1)._4 == 4L)
    // final: 'mer'×4 → 1 sym, 'er' → 1 sym ⇒ tokens 5, vocab {mer, er}
    assert(out(1)._5 == 5L && out(1)._6 == 2L)
  }
}
