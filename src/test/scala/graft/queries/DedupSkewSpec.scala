package graft.queries

import graft.SparkSessionFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale proofs for the dedup blocking strategies on SKEWED corpora:
  * the roster queries only show the operators run; these show the
  * block/bucket sizes that drive the self-join cost stay bounded when
  * the corpus piles into one block — the failure mode that quadratics
  * at web scale.
  */
class DedupSkewSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private def randWords(n: Int): String =
    Seq.fill(n)("w" + rng.nextInt(100000)).mkString(" ")

  test("d04Blocked splits an oversized block and caps sub-block size") {
    // 1000 DISTINCT texts forced into ONE (lang, lbucket) block — the
    // unsalted self-join would do 1000*999/2 ≈ 500k comparisons.
    val docs = (0 until 1000).map { i =>
      (i.toLong, s"document number $i " + randWords(20), "en", 100L)
    }.toDF("doc_id", "text", "lang", "n_chars")

    val sizes = DedupQueries.d04Blocked(docs)
      .groupBy("lang", "lbucket", "sub").count()
      .select("count").as[Long].collect()

    val expectedSubs = (1000 + DedupQueries.BlockCap - 1) / DedupQueries.BlockCap
    // <= not ==: hash assignment may leave a residue class empty; the
    // real cap property is sizes.max + pairCost below, not the count
    assert(sizes.length <= expectedSubs,
      s"expected at most $expectedSubs sub-blocks, got ${sizes.length}")
    assert(sizes.sum == 1000, "salting must not drop or duplicate docs")
    // md5-prefix assignment is near-uniform: each sub-block stays within
    // a small factor of BlockCap instead of holding the whole corpus
    assert(sizes.max <= 2L * DedupQueries.BlockCap,
      s"sub-block of ${sizes.max} exceeds 2*BlockCap")
    val pairCost = sizes.map(c => c * (c - 1) / 2).sum
    assert(pairCost < 1000L * 999 / 2 / 3,
      s"salted pair cost $pairCost is not a meaningful cut of the 499500 unsalted pairs")
  }

  test("d04Blocked keeps exact duplicates in the same sub-block") {
    val dupText = "identical text that appears many times " + randWords(10)
    val fillers = (0 until 600).map { i =>
      (i.toLong, s"filler $i " + randWords(20), "en", 100L)
    }
    val docs = (fillers :+ (9001L, dupText, "en", 100L) :+ (9002L, dupText, "en", 100L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val subs = DedupQueries.d04Blocked(docs)
      .filter(col("doc_id") >= 9000L)
      .select("sub").as[Int].collect()
    assert(subs.length == 2 && subs(0) == subs(1),
      "identical texts (identical prefixes) must land in the same sub-block")
  }

  test("d10Blocked caps a skewed linkage block at ~BlockCap") {
    // 1000 names in ONE segment, all sharing the same 12-char
    // fingerprint prefix (the worst case for standard blocking): only
    // the prefix-hash salt stands between this and a 500k-pair
    // levenshtein self-join.
    // "GraftKeyBloc" is exactly 12 fingerprint chars, so every record
    // shares the block key and the digits land in the salt prefix
    val recs = (0 until 1000).map { i =>
      (i.toLong, "AUTOMOBILE", f"GraftKeyBloc$i%04d-Entity")
    }.toDF("id", "seg", "name")

    val sizes = DedupQueries.d10Blocked(recs)
      .groupBy("seg", "fp", "sub").count()
      .select("count").as[Long].collect()

    val expectedSubs = (1000 + DedupQueries.BlockCap - 1) / DedupQueries.BlockCap
    // <= not ==: hash assignment may leave a residue class empty; the
    // real cap property is sizes.max + pairCost below, not the count
    assert(sizes.length <= expectedSubs,
      s"expected at most $expectedSubs sub-blocks, got ${sizes.length}")
    assert(sizes.sum == 1000, "salting must not drop or duplicate records")
    assert(sizes.max <= 2L * DedupQueries.BlockCap,
      s"sub-block of ${sizes.max} exceeds 2*BlockCap")
    val pairCost = sizes.map(c => c * (c - 1) / 2).sum
    assert(pairCost < 1000L * 999 / 2 / 3,
      s"salted pair cost $pairCost is not a meaningful cut of the 499500 unsalted pairs")
  }

  test("d10Blocked cap survives names sharing a LONG common prefix") {
    // The round-5 advice counterexample: every name shares far more
    // than 14 fingerprint chars ('Customer#0000…'-style corpora), so a
    // fixed-prefix salt would collapse to ONE value and the cap would
    // silently vanish. The full-fingerprint salt must still spread them.
    val recs = (0 until 1000).map { i =>
      (i.toLong, "MACHINERY", f"SharedVeryLongCommonPrefixEntity#00000$i%04d")
    }.toDF("id", "seg", "name")

    val sizes = DedupQueries.d10Blocked(recs)
      .groupBy("seg", "fp", "sub").count()
      .select("count").as[Long].collect()

    assert(sizes.sum == 1000, "salting must not drop or duplicate records")
    assert(sizes.max <= 2L * DedupQueries.BlockCap,
      s"sub-block of ${sizes.max} exceeds 2*BlockCap — shared-prefix corpus defeated the salt")
    val pairCost = sizes.map(c => c * (c - 1) / 2).sum
    assert(pairCost < 1000L * 999 / 2 / 3,
      s"salted pair cost $pairCost is not a meaningful cut of the 499500 unsalted pairs")
  }

  test("d10Blocked recall inside an overflowing block is ~1/nsub — the " +
      "documented price of the full-fingerprint salt, pinned not narrated") {
    // 400 near-dup pairs (edit distance 1, fingerprints differ in the
    // last char) all inside ONE overflowing (seg, fp) block: the two
    // sides of each pair salt independently, so a pair survives in the
    // same sub-block only with probability 1/nsub. This is the
    // round-6-advice contract: the cap buys a hard O(BlockCap²) bound
    // at the cost of in-overflow-block near-dup recall; corpora where
    // that matters should run the d04 n-gram path (content-blocked)
    // or a second salt rotation instead.
    val recs = (0 until 400).flatMap { i =>
      Seq((i.toLong, "FURNITURE", f"GraftKeyBloc$i%04dEntityAlpha"),
        ((i + 10000).toLong, "FURNITURE", f"GraftKeyBloc$i%04dEntityAlphb"))
    }.toDF("id", "seg", "name")
    val blocked = DedupQueries.d10Blocked(recs)
    val nsub = (800 + DedupQueries.BlockCap - 1) / DedupQueries.BlockCap
    assert(nsub >= 2, "fixture no longer overflows the block — grow it")
    val together = blocked.as("a").join(blocked.as("b"),
        col("a.id") + 10000 === col("b.id") &&
          col("a.sub") === col("b.sub")).count()
    val recall = together / 400.0
    val expected = 1.0 / nsub
    // binomial(400, 1/nsub): ±3σ ≈ ±0.065 at nsub=4
    assert(math.abs(recall - expected) < 0.10,
      f"overflow-block recall $recall%.3f is not ~1/nsub=$expected%.3f " +
        "— the salt is either collapsing (recall ~1) or broken (recall ~0)")
  }

  test("d10Blocked keeps identical names in the same sub-block") {
    val recs = ((0 until 600).map { i =>
      (i.toLong, "BUILDING", f"GraftKeyBloc$i%04d-Entity")
    } :+ (9001L, "BUILDING", "GraftKeyBloc9999-Dup")
      :+ (9002L, "BUILDING", "GraftKeyBloc9999-Dup"))
      .toDF("id", "seg", "name")
    val subs = DedupQueries.d10Blocked(recs)
      .filter(col("id") >= 9000L)
      .select("sub").as[Int].collect()
    assert(subs.length == 2 && subs(0) == subs(1),
      "identical names (identical fingerprints) must land in the same sub-block")
  }

  test("simhashBands: band buckets stay near-uniform on a skewed corpus") {
    // 2000 distinct docs, all same lang/length-profile: the only thing
    // bounding the candidate join is the band-bucket distribution.
    val docs = (0 until 2000).map { i =>
      (i.toLong, s"doc $i " + randWords(30))
    }.toDF("doc_id", "text")
      .withColumn("hs", transform(
        filter(split(col("text"), " "), t => t =!= ""), t => xxhash64(t)))
      .withColumn("simhash", graft.functions.SketchExpressions.simhash64(col("hs")))

    val bucketSizes = docs
      .select(DedupQueries.simhashBands(bands = 4, bits = 16).as("bb"))
      .groupBy(col("bb.band"), col("bb.bits")).count()
      .select("count").as[Long].collect()

    assert(bucketSizes.sum == 4L * 2000, "every doc must hit every band once")
    // 2000 docs over 65536 buckets/band: occupancy stays tiny, so the
    // in-bucket self-join cost is Σ c² ≪ n² (the whole point of banding)
    assert(bucketSizes.max <= 16,
      s"a 16-bit band bucket holds ${bucketSizes.max} docs — distribution is broken")
    val pairCost = bucketSizes.map(c => c * (c - 1) / 2).sum
    assert(pairCost < 2000L * 1999 / 2 / 100,
      s"band-join pair cost $pairCost is not ≪ the 1999000 all-pairs cost")
  }

  test("simhashBands rejects configurations that overflow 64 bits") {
    intercept[IllegalArgumentException] {
      DedupQueries.simhashBands(bands = 5, bits = 16)
    }
  }

  test("minhashPairStatsCollapsed == the raw kernel aggregate: the " +
      "weighted fold reproduces pair counts exactly on a mega-group " +
      "corpus (C(g,2) within, g_a*g_b across)") {
    // 40 exact copies (C(40,2) = 780 within-group pairs at jaccard 1),
    // one near-dup of the same text (joins each copy at j ≈ 0.97 —
    // 40 cross pairs through ONE rep pair), 30 organic distinct docs
    val megaText = "pairs " + randWords(29)
    val rows =
      (0 until 40).map(i => ((700 + i).toLong, megaText)) ++
        Seq((900L, megaText + " graftnear")) ++
        (0 until 30).map(i => (i.toLong, s"org $i " + randWords(30)))
    val corpus = rows.toDF("doc_id", "text")

    val raw = DedupQueries.minhashPairsKernel(spark, corpus).agg(
      count(lit(1)).as("n_candidate_pairs"),
      sum(when(col("jaccard") >= 0.5, 1L).otherwise(0L)).as("n_dups_05"),
      RelationalQueries.rnd(coalesce(max("jaccard"), lit(0.0)), 4)
        .as("max_jaccard")).collect().head
    val folded = DedupQueries.minhashPairStatsCollapsed(spark, corpus)
      .collect().head
    assert(folded.getLong(0) == raw.getLong(0),
      s"candidate count diverged: folded ${folded.getLong(0)} vs " +
        s"raw ${raw.getLong(0)}")
    assert(folded.getLong(1) == raw.getLong(1),
      s"dup count diverged: folded ${folded.getLong(1)} vs " +
        s"raw ${raw.getLong(1)}")
    assert(folded.getDouble(2) == raw.getDouble(2),
      s"max jaccard diverged: folded ${folded.getDouble(2)} vs " +
        s"raw ${raw.getDouble(2)}")
    // and the fixture is not vacuous: the mega group dominates both
    // counts (C(40,2) = 780 within + 40 near-dup cross pairs)
    assert(folded.getLong(0) >= 820 && folded.getDouble(2) == 1.0,
      s"fixture drift: ${folded.toSeq}")
  }

  test("simhashStatsCollapsed == the raw sketch aggregate on a " +
      "mega-group corpus (hamming-0 within, weighted across)") {
    val megaText = "simstats " + randWords(29)
    val rows =
      (0 until 40).map(i => ((700 + i).toLong, megaText)) ++
        Seq((900L, megaText + " graftnear")) ++
        (0 until 30).map(i => (i.toLong, s"org $i " + randWords(30)))
    val corpus = rows.toDF("doc_id", "text")

    val sk = DedupQueries.simhashSketchKernel(spark, corpus)
    val raw = sk.agg(count(lit(1)).as("n_docs"),
        countDistinct("simhash").as("n_distinct_simhash"))
      .crossJoin(DedupQueries.simhashPairs(sk).agg(
        count(lit(1)).as("n_band_collisions"),
        sum(when(col("hamming") <= 8, 1L).otherwise(0L))
          .as("n_pairs_hamming_le8"),
        coalesce(min("hamming"), lit(64)).as("min_hamming")))
      .collect().head
    val folded = DedupQueries.simhashStatsCollapsed(spark, corpus)
      .collect().head
    assert(folded.toSeq == raw.toSeq,
      s"folded ${folded.toSeq} vs raw ${raw.toSeq}")
    // non-vacuous: the mega group dominates (C(40,2) = 780 hamming-0
    // collisions) and min_hamming is 0
    assert(folded.getLong(2) >= 780 && folded.getInt(4) == 0,
      s"fixture drift: ${folded.toSeq}")
  }

  test("ngramJaccardStatsCollapsed == the raw blocked aggregate when " +
      "the census is cap-stable (weighted fold incl. the avg)") {
    // 71 docs in one (lang, lbucket) block — under BlockCap both ways,
    // so nsub = 1 in both pipelines and the gating is identical; the
    // fixture's 40-copy group makes every weighted term (C(g,2)
    // within at jaccard 1, g_a·g_b cross, the weighted mean) live.
    // (Above the cap the collapsed census deliberately differs — it
    // counts DISTINCT contents, the d13 argument — so equality is
    // only claimed, and tested, on the cap-stable regime.)
    val megaText = "ngram " + randWords(29)
    val rows =
      (0 until 40).map(i => ((700 + i).toLong, megaText)) ++
        Seq((900L, megaText + " graftnear")) ++
        (0 until 30).map(i => (i.toLong, s"org $i " + randWords(30)))
    val corpus = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))

    val salted = DedupQueries.d04Blocked(corpus)
    val a = salted.select(col("lang"), col("lbucket"), col("sub"),
      col("doc_id").as("doc_a"), col("g").as("g_a"))
    val b = salted.select(col("lang"), col("lbucket"), col("sub"),
      col("doc_id").as("doc_b"), col("g").as("g_b"))
    val raw = a.join(b, Seq("lang", "lbucket", "sub"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double"))
      .agg(count(lit(1)).as("n_pairs_compared"),
        sum(when(col("jaccard") >= 0.3, 1L).otherwise(0L)).as("n_sim_03"),
        RelationalQueries.rnd(coalesce(max("jaccard"), lit(0.0)), 4)
          .as("max_jaccard"),
        RelationalQueries.rnd(coalesce(avg("jaccard"), lit(0.0)), 4)
          .as("avg_jaccard")).collect().head
    val folded = DedupQueries.ngramJaccardStatsCollapsed(corpus)
      .collect().head
    assert(folded.toSeq == raw.toSeq,
      s"folded ${folded.toSeq} vs raw ${raw.toSeq}")
    assert(folded.getLong(0) >= 780 && folded.getDouble(2) == 1.0,
      s"fixture drift: ${folded.toSeq}")
  }

  test("labelPropagateCollapsed == uncollapsed build: mega-group, " +
      "cross-group near-dup, short-text twins, organic singletons") {
    // The exact-content collapse must be invisible in the label table.
    // Corpus exercises every equivalence case from the scaladoc:
    //  - 60 EXACT copies of one 30-token text (the hot bucket the
    //    collapse exists for; uncollapsed this is C(61,2) in-bucket
    //    pairs, collapsed it is 60 star rows)
    //  - a near-dup of that text (one appended token) — the component
    //    must extend PAST the exact group through a rep-level edge
    //  - an unrelated exact pair plus its near-dup (a small organic
    //    component fully outside the mega group)
    //  - two copies of a 2-token doc (the short-text CASE branch:
    //    shingle = hash of the whole text)
    //  - 40 distinct organic docs that must stay out of the node set
    val megaText = "mega " + randWords(29)
    val pairText = "pair " + randWords(29)
    val rows =
      (0 until 60).map(i => ((1000 + i).toLong, megaText)) ++
        Seq((2000L, megaText + " graftnear")) ++
        Seq((3000L, pairText), (3001L, pairText),
          (3002L, pairText + " graftnear")) ++
        Seq((4000L, "tiny doc"), (4001L, "tiny doc")) ++
        (0 until 40).map(i => ((5000 + i).toLong, s"organic $i " + randWords(30)))
    val corpus = rows.toDF("doc_id", "text")

    val un = DedupQueries.labelPropagate(DedupQueries.d09Edges(corpus))
      .as[(Long, Long)].collect().toSet
    val co = DedupQueries.labelPropagateCollapsed(corpus)
      .as[(Long, Long)].collect().toSet
    assert(co == un,
      s"collapsed label table diverges: only-collapsed=${(co -- un).take(5)} " +
        s"only-uncollapsed=${(un -- co).take(5)}")
    // sanity on the fixture itself: the mega component spans the 60
    // copies + the near-dup, labeled by the smallest doc_id
    assert(un.count(_._2 == 1000L) == 61,
      "fixture drift: mega component is not 61 nodes")
    assert(un.contains((2000L, 1000L)),
      "fixture drift: near-dup did not join the mega component")
    assert(un.count(_._2 == 3000L) == 3 && un.contains((4001L, 4000L)))
  }
}
