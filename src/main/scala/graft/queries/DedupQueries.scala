package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Materialize.MaterializeOps

/** Deduplication operators for an LLM training-data pipeline, over
  * `documents`: exact (hash groupBy), MinHash+LSH banding, SimHash, and
  * blocked n-gram Jaccard.
  *
  * Scale design: every method is shuffle-bounded —
  *  - exact dedup is one hash aggregate;
  *  - MinHash signatures/bands are per-row Column math (codegen), the
  *    only shuffles are the band-bucket join and the candidate-verify
  *    join; candidates are a tiny fraction of n² by construction;
  *  - SimHash is per-row bit math + one groupBy over 16-bit bands;
  *  - n-gram Jaccard is blocked (lang × length bucket) so the self-join
  *    never goes quadratic in the corpus, only in the block.
  * No driver-side state anywhere; all of it survives a 1000× corpus.
  *
  * The synthetic corpus has no planted duplicates, so these emit
  * single-row summaries (counts of candidates/verified pairs) rather
  * than pair lists — keeps the driver's rows>0 check meaningful.
  * Every query carries a full DuckDB hash oracle: the shipped d02/d03
  * path is the portable md5-derived signature family (see
  * [[KernelConf]]); the engine-native splitmix64/xxhash64 kernels
  * remain the throughput option, selected per-session by conf and
  * ground-truth-verified by their planted companions.
  */
object DedupQueries {

  /** Max docs per d04 (lang, length-bucket) block before prefix-hash
    * salting splits it into ceil(n/BlockCap) sub-blocks. Caps the
    * in-block self-join at ~BlockCap²/2 comparisons per sub-block
    * regardless of corpus size. 256 exercises the salting path at
    * sf0.1 (largest natural block there is ~304 docs) while leaving
    * small unit-test corpora unsalted. */
  val BlockCap = 256

  /** Signature-kernel selector for the d02/d03 production queries:
    * `spark.graft.dedup.kernel = portable | native`.
    *
    *  - `portable` (default): the md5-derived [[h60]] families
    *    ([[portableMinhashPairs]], [[portableSimhashSketch]]) — every
    *    stage replicates bit-for-bit in DuckDB, so d02/d03 carry FULL
    *    hash oracles. Cost: md5 is ~2× the native kernels' CPU at
    *    sf0.1 and the most machine-phase-sensitive queries on the
    *    bench (see tools/BENCH_NOTES.md kernel cost table).
    *  - `native`: the splitmix64/xxhash64 codegen kernels
    *    ([[minhashPairs]] via SketchExpressions.minhash_sig,
    *    [[simhashSketch]] via SimHash64) — the throughput option for
    *    production corpora. DuckDB cannot replicate wrap-around 64-bit
    *    multiplies, so under this kernel d02/d03's summaries diverge
    *    from the shipped portable oracles BY DESIGN; the family's
    *    correctness is ground-truth-verified by the planted companions
    *    (d06 minhash, d08/d11 simhash) and the brute-force-equality
    *    consumers (d09/d16/d17/d20/d21), which pin the native path
    *    regardless of this conf.
    *
    * Both families share every downstream stage (banding layout,
    * candidate dedup, exact verify), so the conf swaps ONLY the
    * signature math — scale shape is identical. */
  val KernelConf = "spark.graft.dedup.kernel"
  def dedupKernel(s: SparkSession): String = {
    val k = s.conf.get(KernelConf, "portable")
    require(k == "portable" || k == "native",
      s"$KernelConf must be 'portable' or 'native', got '$k'")
    k
  }
  /** Conf-dispatched minhash near-dup pairs (doc_a, doc_b, jaccard). */
  def minhashPairsKernel(s: SparkSession, docs: DataFrame): DataFrame =
    if (dedupKernel(s) == "native") minhashPairs(docs)
    else portableMinhashPairs(docs)
  /** Conf-dispatched simhash sketch (doc_id, simhash). */
  def simhashSketchKernel(s: SparkSession, docs: DataFrame): DataFrame =
    if (dedupKernel(s) == "native") simhashSketch(docs)
    else portableSimhashSketch(docs)

  private def toks: Column = filter(split(col("text"), " "), t => t =!= "")

  /** Verbatim-span window width (Lee et al. 2022's repeated-substring
    * granularity at word level) — one constant so d14's audit and
    * d28's excision can never disagree on span width. */
  private[graft] val VerbatimW = 8

  /** The d14/d28 planted corpus: the boilerplate banner prepended to
    * every doc_id % 5 == 0 doc at arbitrary alignment. */
  private def verbatimPlanted(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).withColumn("text",
      when(col("doc_id") % 5 === 0,
        concat(lit(TextQueries.BoilerHeader + " "), col("text")))
        .otherwise(col("text")))

  /** Verbatim-span detection — the repeated-start table (doc_id, lang,
    * i): every position i whose [i, i+W) word 8-gram occurs in ≥ 2
    * docs. This IS the duplicate-span artifact an ExactSubstr dedup
    * pipeline materializes once and then consumes from both its audit
    * (d14) and its excision pass (d28); exposed unmemoized for the
    * memo-hit ≡ memo-miss spec. Gram census is map-side combinable;
    * the repeated-set join is the one allowed shuffle. */
  private[graft] def verbatimRepStartsDirect(s: SparkSession, d: String)
      : DataFrame = {
    val W = VerbatimW
    val toked = verbatimPlanted(s, d)
      .select(col("doc_id"), col("lang"), toks.as("tk"))
      .withColumn("n", size(col("tk")))
    val grams = toked.filter(col("n") >= W)
      .withColumn("i", explode(expr(s"sequence(0, n - $W)")))
      .select(col("doc_id"), col("lang"), col("i"),
        md5(concat_ws(" ", expr(s"slice(tk, i + 1, $W)"))).as("gm"))
    val rep = grams.groupBy("gm")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= 2).select("gm")
    grams.join(rep, "gm").select(col("doc_id"), col("lang"), col("i"))
  }

  /** Memoized [[verbatimRepStartsDirect]] (r21): one positioned-gram
    * census + df filter per (session, corpus) serves both d14 and d28
    * — parquet handoff, so consumer plans are scans on hit and miss
    * and the columns (long, string, int) round-trip exactly. */
  private[graft] def verbatimRepStarts(s: SparkSession, d: String)
      : DataFrame = {
    val dir = graft.operators.BuildMemo.memoParquet(
      s, s"verbspans:$d") { out =>
      verbatimRepStartsDirect(s, d).write.parquet(s"$out/starts")
    }
    s.read.parquet(s"$dir/starts")
  }

  /** Explode a 64-bit `simhash` column into `bands` bands of `bits`
    * bits each (`bands * bits <= 64`); near-dup candidates are docs
    * agreeing exactly on at least one band.
    *
    * Bucket-occupancy math — parameterize per corpus: a band of b bits
    * yields 2^b buckets, so a corpus of n docs averages n/2^b docs per
    * bucket and each band's in-bucket self-join does ~n²/2^(b+1)
    * comparisons. The 4×16 default is sized for ≤10^8 docs (≤~1.5k
    * docs/bucket); at 10^10 docs, 16-bit bands hold ~150k docs each and
    * the self-join quadratics — choose bits ≈ log2(n) − log2(target
    * bucket size), e.g. 2 bands × 32 bits at 10^10 (recall drops with
    * fewer/wider bands; compensate with a second pass on rotated
    * simhashes if needed).
    */
  def simhashBands(bands: Int, bits: Int): Column = {
    require(bands > 0 && bits > 0 && bands * bits <= 64,
      s"bands*bits must fit in 64 bits, got $bands x $bits")
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    explode(expr(
      s"""transform(sequence(0, ${bands - 1}),
         | b -> named_struct('band', b,
         |                   'bits', shiftright(simhash, b * $bits) & $mask))"""
        .stripMargin))
  }

  /** d04's blocking stage, exposed for the skew spec: docs →
    * (doc_id, lang, lbucket, sub, g) where `sub` splits any
    * (lang, lbucket) block larger than [[BlockCap]] into
    * ceil(n/BlockCap) prefix-hash sub-blocks. Input needs
    * (doc_id, lang, n_chars, text). */
  def d04Blocked(docs: DataFrame): DataFrame = {
    // grams hashed to long, the [[shingles]] rule: jaccard only needs
    // SET identity, and long-array intersects are ~10x cheaper than
    // 5-char-string intersects — at sf0.1 the honest (post-count()-fix)
    // pair stage dropped 31 s -> ~3 s on this change alone. The oracle
    // keeps STRING grams: jaccard over hashed sets equals jaccard over
    // the strings absent 64-bit collisions (the d02/d06/DupGraphCteSql
    // precedent).
    // sorted: the downstream pair jaccard is the merge-count kernel
    // (functions.SetOps.jaccardSorted), which needs ascending inputs.
    // The kernel is the NATIVE form of array_sort(array_distinct(
    // transform(..., i -> xxhash64(substring(text, i, 5))))) —
    // bit-identical values (SketchOps.charGramHashes pins the edges),
    // so the full hash oracle survives; what it drops is the
    // interpreted-lambda + per-gram-UTF8String-allocation tax of the
    // higher-order function (2.4 s -> ~0.3 s at sf0.1).
    val grams = graft.functions.SketchExpressions
      .char_gram_set(col("text"), 5)
    // the one engine-portable hash recipe, shared with the verified
    // split (keep in sync with its DuckDB replica below)
    val pint = graft.operators.Sampling.portableGate(substring(col("text"), 1, 32))
    val blocked = docs
      .select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 64).as("lbucket"), grams.as("g"),
        pint.as("pint"))
    // block census is a tiny aggregate (one row per block) — broadcast
    // it back so salting adds no extra shuffle of the payload
    val sizes = blocked.groupBy("lang", "lbucket")
      .agg(count(lit(1)).as("bn"))
      .withColumn("nsub",
        expr(s"cast((bn + ${BlockCap - 1}) div $BlockCap as int)"))
    blocked.join(broadcast(sizes), Seq("lang", "lbucket"))
      .withColumn("sub", pmod(col("pint"), col("nsub")))
      .select("doc_id", "lang", "lbucket", "sub", "g")
  }

  /** d10's blocking stage, exposed for the skew spec: records
    * (id, seg, name) → (id, seg, fp, sub, name) where the block key is
    * (seg, 12-char name fingerprint) — fingerprint = lowercased
    * alphanumerics, the standard-blocking key of the record-linkage
    * literature — and `sub` splits any block larger than [[BlockCap]]
    * into ceil(n/BlockCap) sub-blocks keyed by the portable hash of the
    * FULL fingerprint. Salting on the full fingerprint (not a prefix)
    * makes the cap genuine: distinct fingerprints spread ~uniformly over
    * the sub-blocks even when every name shares a long common prefix
    * (e.g. 'Customer#0000…' corpora, where any fixed-prefix salt
    * collapses to one value and the cap silently vanishes). Recall
    * contract: exact-fingerprint duplicates always share a sub-block;
    * a near-dup pair whose fingerprints differ ANYWHERE survives an
    * overflowing block's salt only with probability 1/nsub — the price
    * of a hard O(BlockCap²) bound. The one residual way to overflow a
    * sub-block is >BlockCap records with the IDENTICAL fingerprint;
    * those are exact dups at the fingerprint level and belong to the
    * exact-dedup pass (d01) that a linkage pipeline runs first. Every
    * piece (lower, regexp_replace, substring, md5-nibble gate) computes
    * bit-identically in DuckDB, so the capped pipeline stays
    * exact-oracle-verifiable. */
  def d10Blocked(recs: DataFrame): DataFrame = {
    val fingerprint = regexp_replace(lower(col("name")), "[^a-z0-9]", "")
    val keyed = recs.select(col("id"), col("seg"),
      substring(fingerprint, 1, 12).as("fp"),
      graft.operators.Sampling.portableGate(fingerprint).as("pint"),
      col("name"))
    // block census is one row per (seg, fp) — broadcast it back so the
    // salting adds no extra shuffle of the payload
    val sizes = keyed.groupBy("seg", "fp")
      .agg(count(lit(1)).as("bn"))
      .withColumn("nsub",
        expr(s"cast((bn + ${BlockCap - 1}) div $BlockCap as int)"))
    keyed.join(broadcast(sizes), Seq("seg", "fp"))
      .withColumn("sub", pmod(col("pint"), col("nsub")))
      .select("id", "seg", "fp", "sub", "name")
  }

  /** Word 3-gram shingles, distinct, already hashed to long — building
    * shingle strings (concat_ws) costs an allocation per shingle in the
    * interpreted HOF path; hashing the three tokens directly is ~3×
    * cheaper and everything downstream (minhash, jaccard) only needs
    * set identity, not the text. */
  private def shingles: Column = array_distinct(expr(
    """CASE WHEN size(toks) >= 3
      | THEN transform(sequence(0, size(toks)-3),
      |                i -> xxhash64(toks[i], toks[i+1], toks[i+2]))
      | ELSE array(xxhash64(concat_ws(' ', toks))) END""".stripMargin))

  /** The d02 MinHash+LSH pipeline over an arbitrary (doc_id, text)
    * corpus, returning one row per LSH candidate pair with its exact
    * verified jaccard: (doc_a, doc_b, jaccard). Factored out so the
    * planted-duplicate oracle (d06) proves the very same code path
    * count-correct against a DuckDB brute force.
    *
    * K=32 minhash functions (8 bands × 4 rows). The signature is ONE
    * native codegen'd kernel per row (graft.functions.MinHashSig) —
    * the explode + K-min-aggregate formulation spends its wall-clock
    * in generator/aggregate machinery for what is a tight loop over
    * ~50 longs, and the per-row form needs no shuffle at all until
    * the (tiny) band join.
    */
  private val MinHashK = 32; private val MinHashB = 8; private val MinHashR = 4

  /** (doc_id, sh): hashed distinct word-3-gram shingle sets. */
  private def shingled(docsIn: DataFrame): DataFrame =
    docsIn.withColumn("toks", toks).withColumn("sh", shingles)
      .select("doc_id", "sh")

  /** (doc_id, band, bucket): the 8×4 LSH banding of the per-row
    * codegen minhash signature. */
  private def bandsOf(sh: DataFrame): DataFrame = {
    val (b0, r) = (MinHashB, MinHashR)
    sh.withColumn("sig",
        graft.functions.SketchExpressions.minhash_sig(col("sh"), MinHashK))
      .select(col("doc_id"),
        explode(array((0 until b0).map(b =>
          struct(lit(b).as("band"),
            hash((b * r until (b + 1) * r).map(k =>
              element_at(col("sig"), k + 1)): _*).as("bucket"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  /** Exact jaccard of a candidate id-pair frame against two shingle
    * frames — candidates only; signatures never carry the payload
    * through the band shuffle. */
  private def verifyJaccard(cand: DataFrame, shA: DataFrame,
      shB: DataFrame): DataFrame =
    cand
      .join(shA.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shB.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select("doc_a", "doc_b", "jaccard")

  /** Portable 60-bit content hash: the first 15 hex chars of md5 read
    * as a big-endian integer — `conv(substring(md5(x),1,15),16,10)` in
    * Spark ≡ `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` in DuckDB
    * (parity probed over ascii+unicode keys; both engines hash UTF-8
    * bytes). The wide sibling of the 24-bit
    * [[graft.operators.Sampling.portableGate]]: same frozen md5 family,
    * 60 bits for uses where min-collisions or per-bit votes need more
    * resolution (minhash values, simhash bit sources). 15 hex digits —
    * not 16 — keeps the value inside a signed 64-bit long on both
    * engines. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  private def h60Sql(x: String): String =
    s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  /** STRING word-3-gram shingles (the d22/d16-oracle form): same set
    * identity as [[shingles]]' hashed form absent 64-bit collisions,
    * kept as strings so portable hash families can consume them and
    * DuckDB can rebuild them verbatim. */
  private def strShingles: Column = array_distinct(expr(
    """CASE WHEN size(toks) >= 3
      | THEN transform(sequence(0, size(toks)-3),
      |                i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
      | ELSE array(concat_ws(' ', toks)) END""".stripMargin))

  /** Mersenne prime 2^61−1: the modulus of the derived-minhash affine
    * family below. With 30-bit multipliers and 30-bit value halves,
    * every intermediate stays under 2^62 — DuckDB raises an ERROR on
    * BIGINT overflow (it does not wrap like the JVM), so the family is
    * designed to never overflow rather than to wrap identically. */
  private val MhP = 2305843009213693951L
  private val MhMask = (1L << 30) - 1
  private def mhConst(tag: String, j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft:mh:$tag:$j".getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d).getLong & MhMask
  }
  /** Frozen per-salt (a, b, c) constants, j = 1..K: md5-derived at
    * class init (deterministic, engine-independent — the LITERAL values
    * are interpolated into both the Spark plan and the DuckDB oracle),
    * a and b forced odd. */
  private val MhConsts: IndexedSeq[(Long, Long, Long)] =
    (1 to MinHashK).map(j =>
      (mhConst("a", j) | 1L, mhConst("b", j) | 1L, mhConst("c", j)))

  /** [[minhashPairs]] with the PORTABLE signature family — the d02
    * production path since r12: ONE [[h60]] digest per shingle, then
    * K=32 minhash values as per-salt minima of the affine map
    * `(a_j·hi + b_j·lo + c_j) mod (2^61−1)` over the digest's 30-bit
    * halves (hi = x≫30, lo = x∧(2^30−1)) — a pairwise-independent
    * family whose K derivations are integer ops, not K fresh digests
    * (the first shipped form ran K md5s per shingle and was 14× the
    * native kernel's wall time at sf0.1; this form is one digest pass
    * plus integer folds). Bands are the same 8×4 layout with the
    * 4-value slice serialized as the bucket key, and candidates verify
    * with exact string-shingle jaccard — any family-quality deficit
    * costs recall only, never precision, and recall is certified by
    * the planted companions. Every stage is cross-engine replicable
    * ([[MhConsts]] literals interpolate into the SQL), so d02 carries
    * a full DuckDB hash oracle instead of a rows-only check (the r11
    * verdict's allowlist retirement). The engine-native splitmix64
    * kernel pipeline ([[minhashPairs]] via
    * [[graft.functions.SketchExpressions.minhash_sig]]) remains the
    * throughput option and stays ground-truth-verified by its planted
    * companion d06 and the brute-force-equality consumers
    * (d09/d16/d17/d20/d21).
    *
    * Scale shape is unchanged from [[minhashPairs]]: signatures are one
    * linear digest pass, the band join shuffles only (id, band, bucket)
    * rows, candidates dedup before the shingle payload rejoins by id. */
  def portableMinhashPairs(docsIn: DataFrame): DataFrame = {
    import graft.operators.Materialize.MaterializeOps
    val (k0, b0, r) = (MinHashK, MinHashB, MinHashR)
    require(MhConsts.length == k0)
    // materialize the shingle frame ONCE: it feeds the signature path
    // AND both sides of the candidate verify join — without the
    // barrier each consumer re-runs tokenize+shingle from the scan
    // (measured ~25% of d02's wall time at sf0.1)
    val docs = docsIn.withColumn("toks", toks).withColumn("ssh", strShingles)
      .select("doc_id", "ssh").materialize
    val hashed = docs.select(col("doc_id"),
      transform(col("ssh"), x => h60(x)).as("hs"))
    val sig = hashed.select(col("doc_id"),
      array(MhConsts.map { case (a, b, cc) =>
        array_min(transform(col("hs"), h =>
          (lit(a) * shiftright(h, 30) +
            lit(b) * h.bitwiseAND(lit(MhMask)) + lit(cc)) % lit(MhP)))
      }: _*).as("sig"))
    val bands = sig.select(col("doc_id"),
      explode(array((0 until b0).map(b =>
        struct(lit(b).as("band"),
          concat_ws(":", (b * r until (b + 1) * r).map(i =>
            element_at(col("sig"), i + 1).cast("string")): _*).as("bucket"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    bandCandidates(bands)
      .join(docs.select(col("doc_id").as("doc_a"), col("ssh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("ssh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** The portable SimHash sketch — d03's production path since r12:
    * per-token [[h60]] hashes vote ±1 on each of 60 bits (bits 60–63
    * of the fingerprint are structurally 0), exactly the
    * [[graft.functions.SketchOps.simhash]] vote rule minus the
    * splitmix64 remix DuckDB
    * cannot express (BIGINT multiply overflow is an error there, not a
    * wraparound). One explode + one 60-column map-side-combinable
    * aggregate; `explode_outer` keeps token-less docs in the census
    * with the kernel's empty-input fingerprint (0). The native kernel
    * ([[simhashSketch]]) remains the linear-pass throughput option,
    * ground-truth-verified by d08/d11. */
  def portableSimhashSketch(docsIn: DataFrame): DataFrame = {
    val tok = docsIn.withColumn("toks", toks)
      .select(col("doc_id"), explode_outer(col("toks")).as("t"))
      .withColumn("h", h60(col("t")))
    val voteCols = (0 until 60).map(b =>
      sum(when(col("h").isNull, 0)
        .when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"v$b"))
    tok.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L): Column)
          .reduce(_ + _).as("simhash"))
  }

  /** Distinct (doc_a, doc_b) candidate pairs from a (doc_id, band,
    * bucket) frame's in-bucket self-collisions — the ONE candidate
    * predicate shared by every self-join banding consumer, so a future
    * change (e.g. a multi-band agreement threshold) cannot diverge
    * between the pair and collapsed paths. */
  private def bandCandidates(bands: DataFrame): DataFrame =
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  def minhashPairs(docsIn: DataFrame): DataFrame = {
    val docs = shingled(docsIn)
    verifyJaccard(bandCandidates(bandsOf(docs)), docs, docs)
  }

  /** d02's corpus-wide pair statistics with an EXACT-TEXT collapse in
    * front of the kernel — the hot-bucket guard for the pair-COUNT
    * query, where the output numbers legitimately grow with C(h,2) on
    * a mega-duplicate corpus but the WORK must not: group docs by
    * md5(text), run the banded kernel over representatives only, and
    * fold multiplicities back with exact combinatorics. Identical
    * text ⇒ identical shingle set ⇒ identical signature, buckets, and
    * jaccard, so the fold is equality, not approximation:
    *  - a cross-group pair (a, b) is a candidate iff its reps are,
    *    with the same jaccard ⇒ every rep pair contributes
    *    g_a·g_b pairs to each count it qualifies for;
    *  - all C(g, 2) within-group pairs are candidates with jaccard
    *    EXACTLY 1.0 (identical sets: |∩|/|∪| = n/n — the same 1.0 the
    *    uncollapsed verify computes), so they add to both counts and
    *    cap the max;
    * g·(g−1) is always even, so the within-group combinatorics stay
    * in exact integer arithmetic on both engines. DedupSkewSpec
    * asserts equality against the uncollapsed aggregate on a planted
    * mega-group corpus; the d02 oracle replicates the collapse and
    * the fold verbatim (sf0.1's documents table carries 8 genuine
    * exact-dup texts, so the weighted path is oracle-exercised, not
    * dormant). Work becomes quadratic in DISTINCT texts per bucket —
    * the same bound [[labelPropagateCollapsed]] gives the clustering
    * family. */
  /** The exact-text collapse census shared by [[minhashPairStats
    * Collapsed]] and [[simhashStatsCollapsed]]: one rep (min doc_id)
    * per distinct text with its group size, MATERIALIZED because it
    * feeds both the sketch/signature branch and the weight joins (an
    * unbarriered dual consumption recomputes the corpus scan + md5
    * groupBy per branch). One definition so the collapse key of the
    * two fold queries cannot diverge (the [[bandCandidates]] rule). */
  private def exactTextGroups(docsIn: DataFrame): DataFrame = {
    import graft.operators.Materialize.MaterializeOps
    docsIn.select(col("doc_id"), col("text"))
      .groupBy(md5(col("text")).as("ckey"))
      .agg(min("doc_id").as("doc_id"), min("text").as("text"),
        count(lit(1)).as("gsize"))
      .select("doc_id", "text", "gsize").materialize
  }

  /** Attach each pair endpoint's group size as (ga, gb) — the other
    * half of the fold both collapse queries share. */
  private def weightByGroup(pairs: DataFrame, g: DataFrame): DataFrame = {
    val w = g.select(col("doc_id"), col("gsize"))
    pairs
      .join(w.select(col("doc_id").as("doc_a"), col("gsize").as("ga")),
        "doc_a")
      .join(w.select(col("doc_id").as("doc_b"), col("gsize").as("gb")),
        "doc_b")
  }

  def minhashPairStatsCollapsed(s: SparkSession,
      docsIn: DataFrame): DataFrame = {
    val g = exactTextGroups(docsIn)
    val pairs = minhashPairsKernel(s, g.select("doc_id", "text"))
    val cross = weightByGroup(pairs, g).agg(
      coalesce(sum(col("ga") * col("gb")), lit(0L)).as("cand_cross"),
      coalesce(sum(when(col("jaccard") >= 0.5, col("ga") * col("gb"))
        .otherwise(0L)), lit(0L)).as("dups_cross"),
      max("jaccard").as("max_cross"))
    val within = g.agg(
      coalesce(sum(expr("gsize * (gsize - 1) div 2")), lit(0L))
        .as("cand_within"),
      max(when(col("gsize") >= 2, lit(1.0))).as("max_within"))
    cross.crossJoin(within).select(
      (col("cand_cross") + col("cand_within")).as("n_candidate_pairs"),
      (col("dups_cross") + col("cand_within")).as("n_dups_05"),
      RelationalQueries.rnd(greatest(coalesce(col("max_cross"), lit(0.0)),
        coalesce(col("max_within"), lit(0.0))), 4).as("max_jaccard"))
  }

  /** Cross-corpus variant of [[minhashPairs]]: candidates are band
    * collisions BETWEEN a standing corpus and a new batch (never
    * corpus×corpus — the standing corpus is already deduped, so its
    * internal pairs are dead weight the self-join form would pay for
    * every delivery). At scale the batch band table is delivery-sized
    * and the join shuffles only band buckets; the corpus bands are the
    * reusable artifact a real pipeline PERSISTS between deliveries
    * (computing them is one linear codegen pass, and nothing else in
    * the corpus is touched). Returns (doc_a = corpus, doc_b = batch,
    * jaccard). */
  def minhashCrossPairs(corpusIn: DataFrame, batchIn: DataFrame): DataFrame = {
    val corpus = shingled(corpusIn)
    val batch = shingled(batchIn)
    val cand = bandsOf(corpus).as("a").join(bandsOf(batch).as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, corpus, batch)
  }

  /** d09's edge build over a (doc_id, text) corpus: undirected
    * near-dup edges (u, v) with verified jaccard ≥ 0.3, generated by
    * the banded [[minhashPairs]] candidate path — the scale-safe edge
    * source for connected-components clustering (exposed so the plan
    * spec can certify no cartesian ever enters the shipped query). */
  def d09Edges(corpus: DataFrame): DataFrame =
    minhashPairs(corpus).filter(col("jaccard") >= 0.3)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))

  /** Connected components over the near-dup graph with an
    * EXACT-CONTENT COLLAPSE in front of the banding — the hot-bucket
    * guard for the clustering consumers (d09 census / d17 keeper /
    * d25 soft-dedup via [[d09Labels]]).
    *
    * The failure mode: [[minhashPairs]] generates ALL in-bucket pairs,
    * so a mega-duplicate cluster of h identical docs (the error-page /
    * boilerplate case every web crawl has) puts h rows in ONE bucket
    * of EVERY band and pays h²/2 candidate pairs — produced by a
    * single join task, since one bucket is one shuffle key. The soak's
    * replica corpora never exercise this (they plant dup PAIRS, so
    * buckets hold 2); SOAK.md's skew section measures the cliff and
    * this fix.
    *
    * The collapse: group docs by their exact hashed-shingle SET
    * (md5 of the sorted array — 128 bits, birthday-safe past 10^18
    * docs), elect rep = min(doc_id) per group, band and verify
    * REPRESENTATIVES only, and hand [[labelPropagate]] the rep-level
    * verified edges plus one (rep, member) star edge per non-rep
    * member. Work becomes quadratic in DISTINCT contents per bucket —
    * and distinct contents spread over buckets by construction (their
    * signatures differ), so the h-duplicate bucket costs h linear star
    * rows instead of h²/2 pairs.
    *
    * Equivalence to `labelPropagate(d09Edges(corpus))` is EXACT, not
    * approximate — per component and per label:
    *  - signatures, buckets, and jaccard are functions of the shingle
    *    SET alone, so every member has exactly its rep's candidates
    *    and verified neighbors: an uncollapsed edge (a, b) across
    *    groups implies the rep edge (rep_a, rep_b) here, and
    *    conversely; a within-group edge (jaccard 1 ≥ any threshold)
    *    is replaced by the star path a–rep–b;
    *  - the node set is preserved: a multi-doc group's members enter
    *    via star edges (they have a real jaccard-1 edge), a singleton
    *    doc enters iff its rep-level edges exist (it IS its rep);
    *  - labels agree: rep = min(doc_id) of its group, so the min over
    *    collapsed nodes of a component is the min over all members.
    * DedupSkewSpec asserts label-table equality against the
    * uncollapsed build on a planted mega-group corpus. */
  def labelPropagateCollapsed(corpusIn: DataFrame,
      minJaccard: Double = 0.3): DataFrame =
    labelPropagate(collapsedEdges(corpusIn, minJaccard))

  /** The collapsed build's edge frame — rep-level verified near-dup
    * edges plus the per-group star — exposed so the plan spec can pin
    * its executed shape (group on the 128-bit content key, equi joins
    * only, no cartesian). See [[labelPropagateCollapsed]]. */
  def collapsedEdges(corpusIn: DataFrame,
      minJaccard: Double = 0.3): DataFrame = {
    import graft.operators.Materialize.MaterializeOps
    // one tokenize+shingle pass feeds the content key, the rep
    // signatures, and both verify-join sides (the d02/d03 shared-frame
    // rule)
    val sh = shingled(corpusIn).materialize
    val keyed = sh.select(col("doc_id"),
      md5(concat_ws(",",
        transform(array_sort(col("sh")), x => x.cast("string")))).as("ckey"))
    val groups = keyed.groupBy("ckey")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("gsize"))
    val members = keyed.join(groups, "ckey")
    val star = members
      .filter(col("gsize") >= 2 && col("doc_id") =!= col("rep"))
      .select(col("rep").as("u"), col("doc_id").as("v"))
    // reps are distinct min doc_ids, so the rep shingle table comes
    // straight off the census — no second pass through the content-key
    // projection
    val repSh = sh.join(groups.select(col("rep").as("doc_id")), "doc_id")
    val repEdges = verifyJaccard(bandCandidates(bandsOf(repSh)),
        repSh, repSh)
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    repEdges.unionByName(star)
  }

  /** The shared d20/d21 hub-graph corpus: doc_id < 200 plus an
    * 11-clique of planted variants of one source doc (each appending a
    * distinct token) — a known high-degree structure against an
    * organic background. One construction behind both the degree
    * census and the rank query, so they always describe one graph. */
  private def hubCorpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select("doc_id", "text")
    val hubSrc = base.filter(size(toks) >= 20).orderBy("doc_id").limit(1)
    val copies = hubSrc
      .select(explode(expr("sequence(1, 10)")).as("k"), col("text"))
      .select((col("k") + 300000).cast("long").as("doc_id"),
        concat(col("text"), lit(" graftvar"), col("k")).as("text"))
    base.unionByName(copies)
  }

  /** The shared d09/d17 clustering corpus: doc_id < 200 plus two
    * planted near-dup generations (suffix-appended copies at +100000
    * and +200000) forming known multi-node components. */
  def d09Corpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select("doc_id", "text")
    val planted1 = base.filter(col("doc_id") < 40 && size(toks) >= 20)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"))
    val planted2 = base.filter(col("doc_id") < 20 && size(toks) >= 20)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" graftdup graftdup2")).as("text"))
    base.unionByName(planted1).unionByName(planted2)
  }

  /** One fixpoint component build per (session, corpus dir), shared by
    * d09 (cluster census) and d17 (keeper prune): a real pipeline
    * computes connected components ONCE and feeds every downstream
    * consumer, so the roster composes the same way instead of paying
    * the edge build + fixpoint barriers twice.
    *
    * The handoff between the build and its consumers is STRUCTURAL:
    * the propagated (node, lbl) table is written to parquet under a
    * per-build temp dir and every consumer reads it back — the
    * artifact a production pipeline persists to storage between
    * stages, so the label table never has to fit on the driver no
    * matter how duplicate-heavy the corpus is. Builds at or below
    * [[LabelMemoMaxRows]] rows (conf `spark.graft.labels.memoMaxRows`)
    * keep a collected-rows fast path instead: the rows live in the JVM
    * and rebuild a local frame per consumer, skipping the parquet
    * round-trip for the bloom-binary-sized tables the roster actually
    * produces. Memoizing the checkpoint-backed FRAME itself is a trap
    * either way: localCheckpoint lineage is truncated, so any caller
    * that unpersists RDDs between queries (a bench harness's hygiene
    * pass, a long-lived service's memory manager) leaves the cached
    * frame pointing at evicted CHECKPOINT_RDD blocks and the second
    * consumer throws.
    *
    * Keys hold an (appId, identity-hash) string, not the session, so
    * no SparkSession or RDD is pinned; a `SparkListenerApplicationEnd`
    * hook (installed on first use, the ProgressListener pattern —
    * extension-built sessions also install it via
    * [[graft.GraftExtensions]]) calls [[evictSession]] when the
    * session's context stops, so a JVM that cycles SparkSessions
    * (test suites, long-lived services) provably cannot accumulate
    * dead-session entries or leak handoff dirs. [[invalidateLabels]]
    * drops an entry if a corpus under the same path changes within one
    * session (the test-data dirs are immutable, so the roster never
    * needs it). Results are identical to independent builds (the
    * propagation is deterministic), so both oracles are unaffected. */
  private val labelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), LabelHandle]()

  private sealed trait LabelHandle
  private final case class MemoRows(rows: Array[(Long, Long)]) extends LabelHandle
  private final case class ParquetDir(path: String) extends LabelHandle

  /** Label tables above this many rows skip the driver-memory memo and
    * persist to a parquet handoff dir (override per session with conf
    * `spark.graft.labels.memoMaxRows`). 1M (node, lbl) pairs ≈ 16 MB —
    * the same budget class as a broadcast side. */
  val LabelMemoMaxRows = 1000000L

  private def labelMemoMaxRows(s: SparkSession): Long =
    s.conf.getOption("spark.graft.labels.memoMaxRows")
      .map(_.toLong).getOrElse(LabelMemoMaxRows)

  /** appIds whose application-end eviction hook is already registered. */
  private val evictionHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def deleteDir(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      // Files.walk holds directory handles until closed — materialize
      // the listing, then close, before deleting (r20 advice)
      val walk = java.nio.file.Files.walk(p)
      val entries =
        try walk.iterator().asScala.toSeq finally walk.close()
      entries.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def dropEntry(key: (String, String)): Unit =
    Option(labelCache.remove(key)).foreach {
      case ParquetDir(path) => deleteDir(path)
      case _ => ()
    }

  /** Drop memoized label builds for `dir` (any session), deleting any
    * persisted parquet handoff — for callers that mutate a corpus in
    * place within one session. */
  def invalidateLabels(dir: String): Unit = {
    val it = labelCache.keySet().iterator()
    while (it.hasNext) { val k = it.next(); if (k._2 == dir) dropEntry(k) }
  }

  /** Drop every cache entry (and handoff dir) owned by `appId` — the
    * application-end listener's action, exposed so the eviction spec
    * can assert it and so services can evict eagerly. */
  def evictSession(appId: String): Unit = {
    // deliberately leaves evictionHooked alone: an eager eviction must
    // not make the next call re-register a duplicate application-end
    // listener (r20 advice — Soak evicts per timed run); the hook entry
    // is cleared only from inside the listener itself
    val it = labelCache.keySet().iterator()
    while (it.hasNext) {
      val k = it.next(); if (k._1.startsWith(appId + "#")) dropEntry(k)
    }
  }

  /** Register the application-end eviction hook, once per appId. */
  private[graft] def installEviction(s: SparkSession): Unit = {
    val appId = s.sparkContext.applicationId
    if (evictionHooked.add(appId))
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            evictionHooked.remove(appId)
            evictSession(appId)
          }
        })
  }

  /** Test/diagnostic view of the cached handle for (session, dir):
    * Some("memo") for the collected fast path, Some(path) for a
    * parquet handoff, None when uncached. */
  private[graft] def labelHandleInfo(s: SparkSession, d: String): Option[String] = {
    val sessionKey =
      s.sparkContext.applicationId + "#" + System.identityHashCode(s)
    Option(labelCache.get((sessionKey, d))).map {
      case MemoRows(_) => "memo"
      case ParquetDir(p) => p
    }
  }

  def d09Labels(s: SparkSession, d: String): DataFrame = {
    installEviction(s)
    val sessionKey =
      s.sparkContext.applicationId + "#" + System.identityHashCode(s)
    val handle = labelCache.computeIfAbsent((sessionKey, d), _ => {
      // the collapsed build: label-identical to
      // labelPropagate(d09Edges(...)) — see labelPropagateCollapsed's
      // equivalence argument — with the hot-bucket h² bounded away
      val labels = labelPropagateCollapsed(d09Corpus(s, d))
      // labelPropagate returns a checkpoint-materialized frame, so the
      // row count is an aggregate over local blocks, not a recompute
      if (labels.count() <= labelMemoMaxRows(s))
        MemoRows(labels.collect().map(r => (r.getLong(0), r.getLong(1))))
      else {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-labels-").toString
        labels.write.mode("overwrite").parquet(dir)
        ParquetDir(dir)
      }
    })
    import s.implicits._
    handle match {
      case MemoRows(rows) => rows.toSeq.toDF("node", "lbl")
      case ParquetDir(p) => s.read.parquet(p).select("node", "lbl")
    }
  }

  /** Connected components by min-label propagation to FIXPOINT over an
    * undirected (u, v) pair list: returns (node, lbl) where lbl is the
    * smallest doc_id of the node's component. Shared by d09 (cluster
    * census) and d17 (keeper resolution).
    *
    * Iterative algorithms MUST truncate lineage each round: labels
    * feeds both branches of the next round, so an unmaterialized loop
    * doubles the plan per iteration (2^8 copies of the edge build —
    * measured 100s at sf0.1; materialized: ~2s). Eager localCheckpoint
    * materializes and cuts the DAG; a fault-tolerant cluster run would
    * use checkpoint() to reliable storage instead.
    *
    * Rounds use the pointer-doubling (shortcutting) form: each round
    * takes the min over edge-neighbors' labels AND over the label of
    * the node's own label, so reach grows ~2× per round instead of +1
    * — O(log d) rounds to any diameter d, capped at 16 doublings =
    * diameter 2¹⁶ (a loud bound rather than silent mislabeling).
    * Convergence is probed by the O(1)-row sum(lbl) aggregate: labels
    * are monotone non-increasing under min-propagation, so an
    * unchanged sum ⟺ no label moved; the driver reads one Long per
    * probe — bounded, not a data collect — and probing only starts at
    * round 2 (nothing can converge before one propagate + one
    * shortcut). */
  def labelPropagate(pairs: DataFrame): DataFrame = {
    val edges = pairs.unionByName(
      pairs.select(col("v").as("u"), col("u").as("v"))).materialize
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("lbl", col("node")).materialize
    var prevSum = Long.MinValue
    var converged = false
    var rounds = 0
    while (!converged && rounds < 16) {
      val fromNeighbors = labels
        .join(edges, labels("node") === edges("u"))
        .select(col("v").as("node"), col("lbl"))
      // shortcut: node → lbl → (that label-node's own, possibly
      // smaller, label); every lbl is itself a node in the same
      // component, so the mapping join always resolves
      val lblMap = labels.select(col("node").as("l_node"), col("lbl").as("l_lbl"))
      val viaLabel = labels.as("x")
        .join(lblMap, col("x.lbl") === col("l_node"))
        .select(col("x.node").as("node"), col("l_lbl").as("lbl"))
      labels = labels.unionByName(fromNeighbors).unionByName(viaLabel)
        .groupBy("node").agg(min("lbl").as("lbl")).materialize
      rounds += 1
      if (rounds >= 2) {
        val s = Option(labels.agg(sum("lbl")).head().getAs[java.lang.Long](0))
          .fold(0L)(_.longValue)
        converged = s == prevSum
        prevSum = s
      }
    }
    labels
  }

  /** 64-bit SimHash sketch of a (doc_id, text) corpus: per-token hash
    * votes on each bit, sign of the vote sum sets the bit. The vote
    * loop is one native codegen'd kernel per row
    * (graft.functions.SimHash64) — no explode, no 64-column aggregate,
    * no shuffle at all. */
  def simhashSketch(docsIn: DataFrame): DataFrame =
    docsIn
      .withColumn("hs", transform(toks, t => xxhash64(t)))
      .withColumn("simhash", graft.functions.SketchExpressions.simhash64(col("hs")))
      .select("doc_id", "simhash")

  /** Band-collision candidate pairs of a (doc_id, simhash) sketch frame
    * with their hamming distance: (doc_a, doc_b, hamming). Near-dups
    * collide on at least one 16-bit band (banding parameterized via
    * [[simhashBands]]). Factored out so d03 and the planted oracle
    * (d08) share one code path. */
  def simhashPairs(sketch: DataFrame, nBands: Int = 4, nBits: Int = 16): DataFrame = {
    val bands = sketch.select(col("doc_id"), col("simhash"),
        simhashBands(bands = nBands, bits = nBits).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bits"))
    val a = bands.select(col("band"), col("bits"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = bands.select(col("band"), col("bits"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "bits"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
  }

  /** d03's corpus-wide simhash census with the same EXACT-TEXT
    * collapse + combinatoric fold as [[minhashPairStatsCollapsed]]:
    * identical text ⇒ identical token stream ⇒ identical fingerprint
    * ⇒ identical bands and hamming-0 to every co-member, so the
    * sketch runs over representatives and the counts fold back
    * exactly — C(g,2) within-group collisions at hamming 0, g_a·g_b
    * per colliding rep pair, distinct-fingerprint census unchanged
    * (members share their rep's fingerprint). Equality pinned by
    * DedupSkewSpec; the oracle replicates collapse + fold. */
  def simhashStatsCollapsed(s: SparkSession, docsIn: DataFrame): DataFrame = {
    import graft.operators.Materialize.MaterializeOps
    // the shared collapse census (materialized there), then ONE more
    // materialized frame carrying sketch + weight: it feeds the
    // census, both band sides, the hamming verify, and the weight
    // joins (the d02/d03 shared-frame rule)
    val g = exactTextGroups(docsIn)
    val sk = simhashSketchKernel(s, g.select("doc_id", "text"))
      .join(g.select("doc_id", "gsize"), "doc_id").materialize
    val pairs = simhashPairs(sk.select("doc_id", "simhash"))
    val cross = weightByGroup(pairs, sk).agg(
      coalesce(sum(col("ga") * col("gb")), lit(0L)).as("coll_cross"),
      coalesce(sum(when(col("hamming") <= 8, col("ga") * col("gb"))
        .otherwise(0L)), lit(0L)).as("le8_cross"),
      min("hamming").as("min_cross"))
    val within = sk.agg(
      coalesce(sum(expr("gsize * (gsize - 1) div 2")), lit(0L))
        .as("coll_within"),
      max(when(col("gsize") >= 2, lit(1)).otherwise(lit(0))).as("has_dup"))
    sk.agg(coalesce(sum("gsize"), lit(0L)).as("n_docs"),
        countDistinct("simhash").as("n_distinct_simhash"))
      .crossJoin(cross).crossJoin(within)
      .select(col("n_docs"), col("n_distinct_simhash"),
        (col("coll_cross") + col("coll_within")).as("n_band_collisions"),
        (col("le8_cross") + col("coll_within")).as("n_pairs_hamming_le8"),
        least(coalesce(col("min_cross"), lit(64)),
          when(col("has_dup") === 1, lit(0)).otherwise(lit(64)))
          .as("min_hamming"))
  }

  /** d04's blocked n-gram Jaccard statistics with the collapse: the
    * prefix salt is text-derived (identical texts share it by
    * design), so h identical docs in one (lang, lbucket) block defeat
    * [[BlockCap]] with C(h,2) pairs in one sub-block — the same
    * escape hatch as the band family, closed the same way. The
    * collapse key is (lang, lbucket, md5(text)) — ALL the blocking
    * inputs, so members are interchangeable for every downstream
    * stage — and the blocking recipe is [[d04Blocked]] VERBATIM over
    * representatives (n_chars reconstructed as lbucket·64, whose
    * floor(n/64) is exactly lbucket). Counts fold back like
    * [[minhashPairStatsCollapsed]]; avg folds as a weighted mean
    * (within-group pairs contribute jaccard exactly 1.0 each). Like
    * d13, the census now counts DISTINCT contents, so a duplicate-
    * heavy block no longer inflates nsub and prefix-sharing near-dups
    * of the duplicated text keep their sub-block — collapse improves
    * recall here too, and the oracle mirrors the whole fold. */
  def ngramJaccardStatsCollapsed(docsIn: DataFrame): DataFrame = {
    import graft.operators.Materialize.MaterializeOps
    val g0 = docsIn.select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 64).as("lbucket"), col("text"))
      .groupBy(col("lang"), col("lbucket"), md5(col("text")).as("ckey"))
      .agg(min("doc_id").as("doc_id"), min("text").as("text"),
        count(lit(1)).as("gsize"))
      .select("doc_id", "lang", "lbucket", "text", "gsize").materialize
    // materialized: BOTH self-join sides read salted, and without the
    // barrier each side re-runs the whole gram build (the d02 shingle
    // precedent; measured 6.0 s -> 2.0 s on the sf0.1 pair stage)
    val salted = d04Blocked(g0.select(col("doc_id"), col("lang"),
      (col("lbucket") * 64).as("n_chars"), col("text"))).materialize
    val a = salted.select(col("lang"), col("lbucket"), col("sub"),
      col("doc_id").as("doc_a"), col("g").as("g_a"))
    val b = salted.select(col("lang"), col("lbucket"), col("sub"),
      col("doc_id").as("doc_b"), col("g").as("g_b"))
    val pairs = a.join(b, Seq("lang", "lbucket", "sub"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", graft.functions.VectorExpressions
        .jaccard_sorted(col("g_a"), col("g_b")))
      .select("doc_a", "doc_b", "jaccard")
    val cross = weightByGroup(pairs, g0).agg(
      coalesce(sum(col("ga") * col("gb")), lit(0L)).as("n_cross"),
      coalesce(sum(when(col("jaccard") >= 0.3, col("ga") * col("gb"))
        .otherwise(0L)), lit(0L)).as("sim_cross"),
      coalesce(sum(col("jaccard") * col("ga") * col("gb")), lit(0.0))
        .as("jsum_cross"),
      max("jaccard").as("max_cross"))
    val within = g0.agg(
      coalesce(sum(expr("gsize * (gsize - 1) div 2")), lit(0L))
        .as("coll_within"),
      max(when(col("gsize") >= 2, lit(1.0))).as("max_within"))
    cross.crossJoin(within).select(
      (col("n_cross") + col("coll_within")).as("n_pairs_compared"),
      (col("sim_cross") + col("coll_within")).as("n_sim_03"),
      RelationalQueries.rnd(greatest(coalesce(col("max_cross"), lit(0.0)),
        coalesce(col("max_within"), lit(0.0))), 4).as("max_jaccard"),
      RelationalQueries.rnd(
        when(col("n_cross") + col("coll_within") === 0, lit(0.0))
          .otherwise((col("jsum_cross") +
              col("coll_within").cast("double")) /
            (col("n_cross") + col("coll_within")).cast("double")), 4)
        .as("avg_jaccard"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "d01_exact_dedup" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
        .agg(count(lit(1)).as("n_unique_texts"),
          sum("n").as("n_docs"),
          (sum("n") - count(lit(1))).as("n_exact_dups"),
          max("n").as("largest_group"))
    }),

    /** MinHash+LSH near-dup census over the full corpus, on the
      * conf-selected signature family ([[KernelConf]]; default the
      * PORTABLE [[portableMinhashPairs]]) — every portable stage
      * (shingling, K=32 h60 minima, 8×4 banding, candidate dedup,
      * exact-jaccard verify) replicates in DuckDB, so the default
      * carries a full hash oracle. The engine-native splitmix64 kernel
      * variant of the same pipeline (`kernel=native`) stays
      * ground-truth-verified by its planted companion (d06). */
    "d02_minhash_lsh" -> ((s, d) =>
      // the exact-text collapse + weighted fold — count-identical to
      // the raw kernel aggregate (see minhashPairStatsCollapsed), with
      // the mega-duplicate hot bucket bounded away
      minhashPairStatsCollapsed(s, Tables.documents(s, d))),

    /** d02's pipeline, count-verified against ground truth: augment a
      * fixed 200-doc subset with doctored near-duplicates (one appended
      * token ⇒ jaccard = (n−2)/(n−1) ≥ 0.947 at ≥20 tokens). The oracle
      * brute-forces ALL pairs of the same augmented corpus in DuckDB
      * with string shingles — jaccard over hashed shingle sets equals
      * jaccard over the strings absent 64-bit collisions — so the
      * counts compare against pipeline-independent ground truth, not
      * against the LSH itself.
      *
      * The count threshold is 0.9, NOT the 0.5 the corpus-wide d02
      * reports at: oracle equality needs the LSH to recall every
      * ground-truth pair, and the per-pair miss probability at 8 bands
      * × 4 rows is (1−0.9⁴)⁸ ≈ 2e−4 at j=0.9 but ~40% at j≈0.5 — a
      * mid-similarity ORGANIC pair would go permanently red. The
      * equality is therefore deterministic-empirical, not structural:
      * the fixed hash family recalls every ground-truth pair of the
      * fixed corpora (verified at all three SFs; ground-truth minima
      * are ~0.909 organic / 0.947 planted). A corpus regeneration or
      * band-parameter change re-rolls those ~2e−4-per-pair dice and may
      * require re-tuning the threshold.
      *
      * `n_planted_09` (high-jaccard pairs whose doc_b is a plant,
      * i.e. doc_b >= 100000) is emitted separately: it is the
      * structural recall claim — every planted near-dup found — so if
      * this row ever goes red, comparing n_planted_09 against
      * n_dups_09 immediately attributes the miss to a planted pair
      * (code bug) vs an organic mid-similarity pair (LSH dice).
      */
    "d06_minhash_planted" -> ((s, d) => {
      val base = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select("doc_id", "text")
      val planted = base
        .filter(col("doc_id") < 40 && size(toks) >= 20)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" graftdup")).as("text"))
      val corpus = base.unionByName(planted)
      corpus.agg(count(lit(1)).as("n_docs"))
        .crossJoin(planted.agg(count(lit(1)).as("n_planted")))
        .crossJoin(minhashPairs(corpus).agg(
          sum(when(col("jaccard") >= 0.9, 1).otherwise(0)).as("n_dups_09"),
          sum(when(col("jaccard") >= 0.9 && col("doc_b") >= 100000, 1)
            .otherwise(0)).as("n_planted_09"),
          RelationalQueries.rnd(
            max(when(col("jaccard") >= 0.9, col("jaccard"))), 4)
            .as("max_jaccard_09")))
    }),

    /** SimHash near-dup census over the full corpus, on the PORTABLE
      * conf-selected sketch ([[KernelConf]]; default the PORTABLE
      * [[portableSimhashSketch]]: per-token h60 votes, 60 fingerprint
      * bits) — banding and hamming run the same [[simhashPairs]]
      * machinery, and every portable stage replicates in DuckDB, so
      * the default carries a full hash oracle. The engine-native
      * splitmix64 kernel sketch (`kernel=native`) stays
      * ground-truth-verified by its planted companions (d08 exact,
      * d11 near-dup). */
    "d03_simhash" -> ((s, d) =>
      // exact-text collapse + combinatoric fold — count-identical to
      // the raw sketch aggregate (see simhashStatsCollapsed), with
      // the mega-duplicate hot bucket bounded away
      simhashStatsCollapsed(s, Tables.documents(s, d))),

    /** d03's pipeline, count-verified against ground truth: augment a
      * fixed 200-doc subset with EXACT copies. Identical text ⇒
      * identical simhash ⇒ identical bits in every band ⇒ the pair is a
      * band candidate with hamming 0 — recall on planted pairs is
      * structural, no probability involved (unlike near-dup hamming,
      * which DuckDB cannot compute since the sketch is xxhash-based).
      * The output counts candidate pairs that are hamming-0 AND
      * text-identical, which DuckDB brute-forces as the number of
      * identical-text pairs in the same augmented corpus.
      */
    "d08_simhash_planted" -> ((s, d) => {
      val base = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select("doc_id", "text")
      val planted = base.filter(col("doc_id") < 40)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val corpus = base.unionByName(planted)
      val exactPairs = simhashPairs(simhashSketch(corpus))
        .filter(col("hamming") === 0)
        .join(corpus.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
        .join(corpus.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
        .filter(col("text_a") === col("text_b"))
      corpus.agg(count(lit(1)).as("n_docs"))
        .crossJoin(planted.agg(count(lit(1)).as("n_planted")))
        .crossJoin(exactPairs.agg(count(lit(1)).as("n_exact_pairs")))
    }),

    /** d03's sketch, NEAR-dup-verified against planted ground truth —
      * closes the gap d08 leaves (exact copies only): plant one-token
      * edits (append " graftdup" to ≥20-token docs, the d06 recipe) and
      * demand the band join recalls every planted pair. One appended
      * token shifts each of the 64 per-bit vote sums by ±1, so only
      * bits whose vote margin was 0/±1 can flip — measured across all
      * three SFs the planted pairs stay at hamming ≤ 6. Banding here is
      * 8 bands × 8 bits (the [[simhashBands]] parameterization d03
      * defaults to 4×16): with 8 bands, any pair at hamming ≤ 7 dirties
      * at most 7 bands, so ≥ 1 stays clean and recall is PIGEONHOLE-
      * guaranteed, not banding luck — the 4×16 default only guarantees
      * hamming ≤ 3 and measurably drops one h=5 pair. DuckDB cannot
      * recompute the xxhash-based sketch, so — exactly as d06 — the
      * oracle is deterministic-empirical, pipeline-independent ground
      * truth: the planted census with recall and the hamming-≤ 8 gate
      * asserted at 100% (verified at all three SFs; a corpus
      * regeneration re-rolls the vote margins and a pair past hamming 7
      * would need the threshold revisited). */
    "d11_simhash_neardup" -> ((s, d) => {
      val base = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select("doc_id", "text")
      val planted = base
        .filter(col("doc_id") < 40 && size(toks) >= 20)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" graftdup")).as("text"))
      val corpus = base.unionByName(planted)
      val plantedPairs = simhashPairs(simhashSketch(corpus), nBands = 8, nBits = 8)
        .filter(col("doc_b") === col("doc_a") + 100000)
      corpus.agg(count(lit(1)).as("n_docs"))
        .crossJoin(planted.agg(count(lit(1)).as("n_planted")))
        .crossJoin(plantedPairs.agg(
          count(lit(1)).as("n_planted_recalled"),
          sum(when(col("hamming") <= 8, 1).otherwise(0))
            .as("n_hamming_le8")))
    }),

    /** Incremental (cross-corpus) exact dedup — ingestion-time dedup of
      * a new delivery against the standing corpus, the daily shape of a
      * training-data pipeline (the corpus is never re-deduped whole;
      * each batch is checked against it). Deterministic 60/40
      * corpus/batch split on doc_id mod 5. Membership is probed in two
      * phases: a distributed `bloom_filter_agg` over the corpus
      * text-hashes collapses to ONE bounded binary (the q47 broadcast
      * pattern — `.head()` reads a sketch, not data), the batch side is
      * first grouped per-hash (map-side combinable, so the probe volume
      * is distinct-hash-bounded) and filtered on `might_contain` —
      * bloom-NEGATIVE hashes are DEFINITELY new and never reach a join
      * — and only the bloom-positive sliver semi-joins the corpus to
      * kill the ~1% false positives. At 100 TB the corpus hash set
      * dwarfs executor memory but the bloom stays broadcastable, and
      * join traffic is (true dups + fp) only. The bloom is physically
      * load-bearing but semantically invisible: the oracle is the plain
      * hash join in DuckDB. */
    "d12_incremental_dedup" -> ((s, d) => {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.graft.ColumnBridge
      val all = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("h"))
      val corpus = all.filter(col("doc_id") % 5 < 3).select("h").distinct()
      val bh = all.filter(col("doc_id") % 5 >= 3)
        .groupBy("h").agg(count(lit(1)).as("n"))
      // sized from the actual corpus cardinality (see e11): fp rate
      // stays ~0.04% at any corpus size, not just below a fixed literal
      val nCorpus = math.max(corpus.count(), 4096L)
      val bloomBin = corpus.agg(ColumnBridge.column(
        new BloomFilterAggregate(ColumnBridge.expression(xxhash64(col("h"))),
          Literal(nCorpus), Literal(nCorpus * 16L)).toAggregateExpression())
        .as("bf")).head().getAs[Array[Byte]]("bf")
      // INNER join against the distinct corpus hash set, which is ≡ a
      // semi join here — deliberately not "left_semi": Catalyst's
      // PushDownLeftSemiAntiJoin rule rewrites Filter(SemiJoin) order
      // and would hoist the bloom ABOVE the join, defeating the
      // prefilter (QueryPlanSpec pins the filter-below-join shape)
      // broadcast the bloom-SURVIVING batch side explicitly: it is
      // small by construction (only probable dups pass the prefilter),
      // while the standing corpus is the side that grows with the
      // archive — at 100 TB the corpus must never shuffle for this
      // probe. Also pins the AQE build-side choice, which otherwise
      // coin-flips between these two similarly-sized test frames and
      // flaps the plan digest (PLAN_DIGESTS.md, r15).
      val dupHashes = broadcast(
        bh.filter(ColumnBridge.column(new BloomFilterMightContain(
          Literal(bloomBin), ColumnBridge.expression(xxhash64(col("h")))))))
        .join(corpus, Seq("h"))
      bh.agg(sum("n").as("n_batch"), count(lit(1)).as("n_batch_hashes"))
        .crossJoin(dupHashes.agg(
          coalesce(sum("n"), lit(0L)).as("n_dup_vs_corpus"),
          count(lit(1)).as("n_dup_hashes")))
        .select(col("n_batch"), col("n_dup_vs_corpus"),
          (col("n_batch") - col("n_dup_vs_corpus")
            - (col("n_batch_hashes") - col("n_dup_hashes"))).as("n_batch_dups"),
          (col("n_batch_hashes") - col("n_dup_hashes")).as("n_unique_new"))
    }),

    /** Cross-corpus NEAR-dup ingestion check — d12's daily shape for
      * content that was edited between deliveries, not just re-sent:
      * the new batch's minhash bands join the STANDING corpus's bands
      * ([[minhashCrossPairs]] — never corpus×corpus; the corpus band
      * table is the persisted artifact), band collisions verify with
      * exact jaccard, and a batch doc matching any corpus doc at
      * ≥ 0.9 is flagged as a near-replay. The batch mixes genuinely
      * fresh docs (ids 200–260) with doctored replays of corpus docs
      * (one appended token ⇒ j ≥ 0.947). DuckDB brute-forces ALL
      * corpus×batch string-shingle jaccards as pipeline-independent
      * ground truth — the compare certifies LSH recall of every ≥ 0.9
      * cross pair (deterministic-empirical, the d06 argument: per-pair
      * miss probability ~2e-4 at j = 0.9 under 8×4 banding, verified
      * at all three SFs). */
    "d16_crosscorpus_neardup" -> ((s, d) => {
      val doc = Tables.documents(s, d).select("doc_id", "text")
      val base = doc.filter(col("doc_id") < 200)
      val fresh = doc.filter(col("doc_id") >= 200 && col("doc_id") < 260)
      val replays = base.filter(col("doc_id") < 40 && size(toks) >= 20)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" graftdup")).as("text"))
      val batch = fresh.unionByName(replays)
      val matches = minhashCrossPairs(base, batch)
        .filter(col("jaccard") >= 0.9)
      batch.agg(count(lit(1)).as("n_batch"))
        .crossJoin(replays.agg(count(lit(1)).as("n_replayed")))
        .crossJoin(matches.agg(
          countDistinct("doc_b").as("n_batch_matched"),
          count(lit(1)).as("n_pairs_09"),
          RelationalQueries.rnd(coalesce(max("jaccard"), lit(0.0)), 4)
            .as("max_jaccard")))
        .withColumn("n_batch_new", col("n_batch") - col("n_batch_matched"))
    }),

    /** Incremental band-table maintenance — the operator that CLOSES the
      * d16 loop: d16 documents the standing corpus band table as "the
      * persisted delivery artifact", and this maintains it when a batch
      * is admitted and takedowns land, WITHOUT re-shingling the corpus.
      * Maintenance is exactly two band-table-shaped steps: (1) tombstone
      * — anti-join the persisted band rows against the broadcast
      * takedown id list (the t21 cascade's output shape), deleting the
      * removed docs' 8 rows each; (2) append-merge — union the admitted
      * batch's freshly computed bands. The query then rebuilds the band
      * table FROM SCRATCH over the post-takedown live corpus ∪ batch and
      * takes the full symmetric difference (exceptAll both ways) against
      * the maintained table: n_diff = 0 CERTIFIES that incremental
      * maintenance lands byte-identically where a from-scratch rebuild
      * would — the property that lets a real pipeline never re-shingle
      * its corpus. The oracle states the invariant independently:
      * portable doc counts from the same filters, n_band_rows = 8 ×
      * n_live (each doc emits exactly one row per band — explode over a
      * fixed 8-array), and the certified n_diff = 0.
      *
      * Scale shape: the maintained side touches ONLY the persisted band
      * rows (24 bytes/doc·band — localCheckpointed here to stand in for
      * the parquet artifact a deployment reads) plus the delivery-sized
      * batch text; the takedown list broadcasts for the anti-join; the
      * union is partition-local. Nothing corpus-sized shuffles and no
      * corpus text is re-read — the from-scratch rebuild exists in this
      * query only as the verification arm. */
    "d26_band_maintenance" -> ((s, d) => {
      val doc = Tables.documents(s, d).select("doc_id", "text")
      val base = doc.filter(col("doc_id") < 200)
      val fresh = doc.filter(col("doc_id") >= 200 && col("doc_id") < 260)
      val replays = base.filter(col("doc_id") < 40 && size(toks) >= 20)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" graftdup")).as("text"))
      val batch = fresh.unionByName(replays)
      val tdIds = base.filter(col("doc_id") % 13 === 0).select("doc_id")
      // the persisted artifact: standing bands, materialized once
      val standing = bandsOf(shingled(base)).materialize
      // maintained feeds THREE consumers (the n_band_rows census and
      // both exceptAll directions) and scratch feeds two — checkpoint
      // both so the batch re-shingle runs once, not three times, and
      // the from-scratch rebuild once, not twice (24-byte band rows;
      // the verification arm now costs ~1× a rebuild instead of ~2×)
      val maintained = standing
        .join(broadcast(tdIds), Seq("doc_id"), "left_anti")
        .unionByName(bandsOf(shingled(batch)))
        .materialize
      val live = base.join(broadcast(tdIds), Seq("doc_id"), "left_anti")
        .unionByName(batch)
      val scratch = bandsOf(shingled(live)).materialize
      val diff = maintained.exceptAll(scratch)
        .unionByName(scratch.exceptAll(maintained))
      base.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(batch.agg(count(lit(1)).as("n_batch")))
        .crossJoin(tdIds.agg(count(lit(1)).as("n_tombstoned")))
        .crossJoin(live.agg(count(lit(1)).as("n_live")))
        .crossJoin(maintained.agg(count(lit(1)).as("n_band_rows")))
        .crossJoin(diff.agg(count(lit(1)).as("n_diff")))
    }),

    /** Duplicate-cluster resolution: near-dup PAIRS are only half a
      * dedup pipeline — transitive groups must be clustered so one
      * keeper survives per group. Edges are word-3-gram jaccard ≥ 0.3
      * pairs generated by the BANDED [[minhashPairs]] candidate path
      * (the d02 pipeline: per-row codegen minhash signature, 8×4 band
      * join, exact-jaccard verify of candidates only) — no all-pairs
      * join at any stage, so the edge build carries to corpus scale
      * exactly as d02 does ([[d09Edges]]; QueryPlanSpec pins the plan
      * free of CartesianProduct/BroadcastNestedLoopJoin). The oracle
      * builds its edge set INDEPENDENTLY by brute-forcing every pair's
      * string-shingle jaccard and resolves components with a recursive
      * CTE — so the compare also certifies the LSH recalled every
      * ≥ 0.3 edge. That equality is deterministic-empirical (the d06
      * argument): the minimum edge similarity in these corpora is
      * ~0.87, where the 8-band × 4-row miss probability is ~1e-3 per
      * pair, and the fixed hash family recalls all of them (verified
      * at all three SFs); components come from min-label propagation
      * run to FIXPOINT — each round one join + one min-aggregate, all
      * shuffle-bounded, convergence probed by the O(1)-row sum(lbl)
      * aggregate (labels are monotone non-increasing, so an unchanged
      * sum ⟺ no label moved).
      *
      * Rounds use the pointer-doubling (shortcutting) form: each round
      * takes the min over edge-neighbors' labels AND over the label of
      * the node's own label, so reach grows ~2× per round instead of
      * +1 — O(log d) rounds to any diameter d, and the fixpoint exit
      * means the planted cliques stop after ~3 rounds while a deep
      * web-graph would keep going (capped at 16 doublings = diameter
      * 2¹⁶, a loud bound rather than silent mislabeling). Each
      * materialization barrier is the dominant cost at interactive
      * scale — exactly the variant a web-scale corpus needs. The
      * build itself is [[d09Labels]], computed ONCE per run and shared
      * with d17's keeper prune — the pipeline-level composition where
      * components feed every downstream consumer.
      */
    "d09_dup_clusters" -> ((s, d) => {
      val labels = d09Labels(s, d)
      val clusters = labels.groupBy("lbl").agg(count(lit(1)).as("sz"))
      clusters.agg(
        count(lit(1)).as("n_clusters"),
        sum("sz").as("n_clustered_docs"),
        max("sz").as("largest_cluster"),
        sum(col("sz") - 1).as("n_dups_to_drop"))
    }),

    /** Keeper resolution — the step that turns d09's clusters into a
      * PRUNED CORPUS: min-label propagation converges every node's
      * label to the smallest doc_id of its component, so the keeper of
      * each duplicate group is exactly the node whose label equals
      * itself; everything else in a cluster is dropped, and the
      * survivors are the corpus anti-joined against the dropped set.
      * Emits the accounting a pipeline reports after a dedup pass
      * (docs and tokens dropped vs kept). Consumes the SAME memoized
      * component build as d09 ([[d09Labels]] — one edge build + one
      * fixpoint per run, not one per consumer);
      * the oracle extends the recursive-CTE replica with the identical
      * keeper rule and token sums — pipeline-independent ground truth
      * for the END-TO-END prune, not just the cluster census. */
    "d17_keeper_resolution" -> ((s, d) => {
      val corpus = d09Corpus(s, d)
      val labels = d09Labels(s, d)
      val dropped = labels.filter(col("node") =!= col("lbl"))
        .select(col("node").as("doc_id"))
      val stats = corpus.withColumn("ntok", size(toks))
      val droppedStats = stats.join(dropped, Seq("doc_id"), "left_semi")
      val survivors = stats.join(dropped, Seq("doc_id"), "left_anti")
      corpus.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(labels.agg(count(lit(1)).as("n_clustered"),
          countDistinct("lbl").as("n_keepers")))
        .crossJoin(droppedStats.agg(count(lit(1)).as("n_dropped"),
          coalesce(sum("ntok"), lit(0L)).as("tokens_dropped")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors"),
          sum("ntok").as("tokens_kept")))
    }),

    /** Soft dedup — duplicate DOWNWEIGHTING instead of removal (the
      * SoftDeDup reweighting of Xue et al., ACL 2024: hard removal
      * throws away the signal that popular content is popular; keeping
      * every copy at sampling weight 1/cluster_size preserves the
      * corpus while flattening the duplication bias). Third consumer
      * of the shared [[d09Labels]] component build beside d09 (census)
      * and d17 (hard prune): cluster sizes come from one aggregate
      * over the label table, each doc's weight is 1/size (singletons
      * 1), and the published accounting is the EFFECTIVE dataset size
      * — Σ weights over docs and Σ weight·tokens — the number a
      * sampling-based trainer actually draws from. Weights are frozen
      * to ⌊1e6/size⌋ micro-units before any sum, so every aggregate
      * is exact int64 (order-independent, < 2^53 headroom up to 10¹²
      * docs) — no double summation anywhere. Scale shape: one
      * aggregate over labels + one doc_id-keyed equi join of the
      * (clustered-subset-sized) weight table against the corpus; the
      * corpus never self-joins. The oracle extends the shared
      * [[DupGraphCteSql]] ground-truth graph with the same integer
      * weight rule — effective sizes certified against an
      * independently-built component structure. */
    "d25_soft_dedup" -> ((s, d) => {
      val corpus = d09Corpus(s, d).withColumn("ntok", size(toks))
      val labels = d09Labels(s, d)
      val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("sz"))
      val docSz = labels.join(sizes, "lbl")
        .select(col("node").as("doc_id"), col("sz"))
      val weighted = corpus.join(docSz, Seq("doc_id"), "left")
        .withColumn("sz", coalesce(col("sz"), lit(1L)))
        .withColumn("w_e6",
          floor(lit(1000000.0) / col("sz")).cast("long"))
      weighted.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("sz") > 1, 1L).otherwise(0L)).as("n_in_clusters"),
        sum("ntok").as("raw_tokens"),
        sum("w_e6").as("effective_docs_e6"),
        sum(col("ntok") * col("w_e6")).as("effective_tokens_e6"),
        max("sz").as("largest_cluster"))
    }),

    /** Leakage-safe train/eval split — the reason a pipeline builds
      * components at all: a doc-keyed split (t07's gate applied per
      * doc_id) puts near-duplicates of training docs in the eval set,
      * and eval contamination via near-dup closure is invisible to
      * exact-match decontamination (t29 catches verbatim overlap, not
      * a paraphrased twin already in the dup graph). The unit of
      * assignment must be the CLUSTER: gate each doc by the portable
      * gate of its component label (its own id if unclustered), so a
      * cluster lands whole on one side by construction. Fourth
      * consumer of the shared [[d09Labels]] build (after d09 census,
      * d17 prune, d25 soft weights): the split itself is one
      * doc_id-keyed left join against the persisted label table plus
      * scan-side gate arithmetic — no new shuffle class at 100 TB.
      * The audit emits BOTH policies: unit-gated straddle count
      * (structurally 0 — the invariant, proved cross-engine) and the
      * naive doc-gated straddle count plus the docs inside straddling
      * clusters (the leak the operator exists to prevent). Oracle =
      * the shared [[DupGraphCteSql]] ground-truth graph extended with
      * the identical gate arithmetic. */
    "d27_leakage_safe_split" -> ((s, d) => {
      val corpus = d09Corpus(s, d)
      val labels = d09Labels(s, d)
      def evalGate(c: Column): Column =
        when(pmod(graft.operators.Sampling.portableGate(
          concat(c.cast("string"), lit(":split"))), lit(10)) < 2, 1L)
          .otherwise(0L)
      val g = corpus.select(col("doc_id"))
        .join(labels.withColumnRenamed("node", "doc_id"),
          Seq("doc_id"), "left")
        .withColumn("unit", coalesce(col("lbl"), col("doc_id")))
        .withColumn("ev_u", evalGate(col("unit")))
        .withColumn("ev_n", evalGate(col("doc_id")))
      val su = g.filter(col("lbl").isNotNull).groupBy("lbl")
        .agg(countDistinct("ev_u").as("du"),
          countDistinct("ev_n").as("dn"), count(lit(1)).as("sz"))
      g.agg(count(lit(1)).as("n_docs"),
          sum(when(col("lbl").isNotNull, 1L).otherwise(0L))
            .as("n_clustered"),
          sum("ev_u").as("n_eval_unit"),
          sum("ev_n").as("n_eval_naive"))
        .crossJoin(su.agg(count(lit(1)).as("n_clusters"),
          coalesce(sum(when(col("du") > 1, 1L).otherwise(0L)), lit(0L))
            .as("n_straddle_unit"),
          coalesce(sum(when(col("dn") > 1, 1L).otherwise(0L)), lit(0L))
            .as("n_straddle_naive"),
          coalesce(sum(when(col("dn") > 1, col("sz"))), lit(0L))
            .as("n_docs_leaky_naive")))
    }),

    "d04_ngram_jaccard" -> ((s, d) => {
      // char 5-gram Jaccard inside (lang, length-bucket) blocks, with
      // SIZE-CAPPED blocks: a web-scale corpus puts millions of docs in
      // one (en, bucket) block and the in-block self-join goes quadratic.
      // Oversized blocks (> CAP docs) are split into ceil(n/CAP)
      // sub-blocks keyed by a 32-char text-PREFIX hash — prefix blocking
      // from the entity-resolution literature: near-dups overwhelmingly
      // share their opening, so recall loss is confined to docs that
      // diverge in the first 32 chars (and exact dups always share a
      // sub-block). The sub-bucket hash is md5-prefix → nibble arithmetic,
      // chosen because Spark and DuckDB compute it bit-identically, so
      // the whole salted pipeline is oracle-verifiable end-to-end.
      // exact-content collapse + weighted fold (collapse key = ALL
      // blocking inputs; see ngramJaccardStatsCollapsed)
      ngramJaccardStatsCollapsed(Tables.documents(s, d))
    }),

    /** Edit-distance record linkage: the fuzzy-identity dedup used for
      * entity resolution (names, titles, addresses) where token
      * sketches are too coarse. levenshtein is O(len²) per pair, so the
      * self-join must be block-bounded BEFORE the kernel runs: blocks
      * are (segment, 12-char name-fingerprint prefix) and any block
      * larger than [[BlockCap]] is salted into full-fingerprint-hash
      * sub-blocks by [[d10Blocked]] — at corpus scale no sub-block
      * exceeds ~BlockCap however the names skew (DedupSkewSpec proves
      * it), with one documented exception: >BlockCap records sharing an
      * IDENTICAL fingerprint, i.e. exact dups, which the d01 pass
      * upstream collapses first. Unlike a bare low-cardinality segment
      * key, blocks do not grow with the corpus. The distance is integer, both engines implement
      * the same DP metric, and the blocking replicates bit-identically
      * in DuckDB, so the whole capped pipeline is exact-oracle-verified. */
    /** Cross-document verbatim-span masking — the ExactSubstr dedup of
      * Lee et al. 2022 ("Deduplicating Training Data Makes Language
      * Models Better"): a word 8-gram appearing verbatim in ≥ 2
      * DISTINCT documents marks all its token positions as repeated
      * content, and the per-doc masked-token fraction is what a
      * training pipeline strips. Differs from d04 (fuzzy whole-doc
      * similarity) and t17 (chunk-ALIGNED boilerplate): spans are
      * detected at ARBITRARY alignment — the planted banner is
      * prepended, shifting every underlying gram, exactly the case
      * aligned chunking misses.
      *
      * Shape at 100 TB: positioned 8-gram explode → gram doc-frequency
      * aggregate (map-side combinable) → repeated-gram set joins back
      * on the gram hash (a plain equi-join: unlike t17's tiny boiler
      * set, the repeated-gram set of a duplicate-heavy crawl is
      * corpus-scaled, so the join must be allowed to shuffle — AQE
      * broadcasts it when it happens to be small) → per-doc interval
      * merge (one window over repeated-gram starts; each span adds
      * min(W, gap-to-previous-start) — the 8-offset position explode
      * this replaces shuffled ~8× the token volume on a
      * duplicate-heavy crawl) → per-doc counts. Suffix automata do this with
      * less duplication server-side; the gram-hash formulation is the
      * shuffle-native equivalent with the same output. Every stage is
      * portable (md5 grams, integer positions), so DuckDB replicates
      * the pipeline end-to-end including the planted-banner ground
      * truth. */
    "d14_verbatim_spans" -> ((s, d) =>
      d14Report(s, d, verbatimRepStarts(s, d))),
        .withColumn("gap", col("i") - lag("i", 1).over(wDoc))
        .withColumn("add",
          when(col("gap").isNull || col("gap") >= W, lit(W.toLong))
            .otherwise(col("gap").cast("long")))
        .groupBy("doc_id", "lang").agg(sum("add").as("masked"))
      val per = toked.select(col("doc_id"), col("lang"), col("n"))
        .join(masked, Seq("doc_id", "lang"), "left")
        .withColumn("masked", coalesce(col("masked"), lit(0L)))
      per.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("masked") > 0, 1L).otherwise(0L)).as("n_docs_with_repeats"),
          sum("n").as("sum_tokens"),
          sum("masked").as("sum_masked_tokens"),
          RelationalQueries.rnd(
            sum("masked").cast("double") / sum("n"), 4).as("masked_frac"))
        .orderBy("lang")
    }),

    /** Near-dup HUB detection — degree analysis over the similarity
      * graph: a document with many near-duplicates is template noise
      * (mirror pages, boilerplate-stuffed listings), and dedup
      * pipelines route high-degree nodes to removal rather than
      * keeper-selection. Ten planted variants of one source doc (each
      * appending a distinct token) form an 11-clique — degree 10 hubs
      * against an organic background of degree ≤ ~1 — and the census
      * (max degree, hubs ≥ 5, docs with any dup) reads off the
      * [[d09Edges]] banded edge stream with one symmetric-union
      * degree aggregate; no clustering pass needed. The oracle
      * brute-forces every pair's string-shingle jaccard on the same
      * corpus (the d09 equality argument: all edges here sit at
      * j ≥ ~0.87 where 8×4 banding recall is ~1−1e-3 per pair,
      * verified at all three SFs). */
    "d20_neardup_hubs" -> ((s, d) => {
      val corpus = hubCorpus(s, d)
      val pairs = d09Edges(corpus)
      val degrees = pairs.select(col("u").as("node"))
        .unionByName(pairs.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      corpus.agg(count(lit(1)).as("n_docs"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
        .crossJoin(degrees.agg(
          count(lit(1)).as("n_docs_with_dups"),
          max("deg").as("max_degree"),
          sum(when(col("deg") >= 5, 1L).otherwise(0L)).as("n_hubs_deg5")))
    }),

    /** Graph centrality over the near-dup graph — PageRank, the
      * iterative message-passing shape beyond d09's connected
      * components (components answer "which docs are the same";
      * rank answers "which doc is the CENTER of a duplication
      * neighborhood" — the template-hub / boilerplate-source signal a
      * cleaning pipeline uses to pick removal targets, and the same
      * loop shape as any link-authority score). Three unrolled power
      * iterations, damping 0.85, over the [[hubCorpus]] graph's
      * [[d09Edges]] banded edge stream (never all-pairs); the planted
      * 11-clique surfaces as the top-ranked block. All arithmetic is
      * INTEGER (scores frozen at e9: init = 1e9 div N, contribution =
      * pr div deg, update = (15·base + 85·Σcontrib) div 100), so three
      * rounds of integer floor-division are bit-identical cross-engine
      * and the whole iterative computation keeps a strict hash oracle
      * — the fixed-round discipline of s07/d13 applied to a graph
      * loop. Scale shape: each iteration is ONE shuffle keyed by node
      * id (messages groupBy dst) plus an edge⋈rank equi-join on src —
      * both distribute over nodes; the degree table rides the edge
      * frame (joined once, before the loop); per-round
      * localCheckpoint is the lloyd/labelPropagate lineage
      * discipline (a cluster run would checkpoint() to reliable
      * storage); the final top-10 is a TakeOrdered limit, never a
      * global-window sort (row_number runs on the 10-row frame). A
      * production run iterates to convergence instead of 3 fixed
      * rounds — fixed rounds are what make the oracle unrollable. */
    "d21_graph_rank" -> ((s, d) => {
      // checkpoint the banded pair list ONCE: every loop iteration
      // joins edgesD, and without this the whole shingle→minhash→band
      // candidate pipeline would re-run per round (the d13 Lloyd
      // lineage discipline, applied to the edge frame instead of the
      // iterate)
      val pairs = d09Edges(hubCorpus(s, d)).materialize
      val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(pairs.select(col("v").as("src"), col("u").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val edgesD = edges.join(deg, "src")
      val nodes = deg.select(col("src").as("node"), col("deg"))
      val n = nodes.agg(count(lit(1)).as("nn"))
      val base = expr("cast(1000000000 as bigint) div nn")
      var pr = nodes.crossJoin(n)
        .select(col("node"), col("deg"), col("nn"), base.as("pr"))
        .materialize
      for (_ <- 1 to 3) {
        val msgs = edgesD
          .join(pr.select(col("node").as("src"), col("pr").as("src_pr")), "src")
          .select(col("dst"), expr("src_pr div deg").as("c"))
          .groupBy("dst").agg(sum("c").as("contrib"))
        pr = pr.join(msgs.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"), col("deg"), col("nn"),
            expr("(15 * (cast(1000000000 as bigint) div nn)" +
              " + 85 * coalesce(contrib, cast(0 as bigint))) div 100")
              .as("pr"))
          .materialize
      }
      val top = pr.orderBy(col("pr").desc, col("node")).limit(10)
      // global (unpartitioned) window — benign: it ranks the
      // post-limit(10) frame, never the corpus, so the single-partition
      // funnel Spark warns about is a 10-row sort
      val w = Window.orderBy(col("pr").desc, col("node"))
      top.withColumn("rank", row_number().over(w))
        .select(col("rank"), col("node"), col("pr").as("pr_e9"), col("deg"))
        .orderBy("rank")
    }),

    /** MinHash estimator fidelity audit — the s10/t25 audit pattern
      * applied to the dedup family's own estimator: per-pair MinHash
      * signature agreement (est ≈ jaccard, the Broder invariant)
      * versus exact shingle jaccard, with the two-sided error
      * published per pair. The production signature
      * ([[graft.functions.SketchExpressions.minhash_sig]]) hashes with
      * engine-native murmur3 — fast but not replicable in DuckDB,
      * which is exactly why d02 is a rows-only query; this audit
      * builds a k=16 PORTABLE signature instead (per-hash salt j,
      * min over string shingles of the frozen
      * [[graft.operators.Sampling.portableGate]]), so the estimator's
      * accuracy itself hash-matches the DuckDB replica: E[agree/k] =
      * jaccard, stderr √(j(1−j)/16) ≈ 0.12 — the published abs_err
      * column shows that spread honestly. Audited pairs are the
      * banded candidates at jaccard ≥ 0.3 (where 8×4 banding recall
      * ≈ 1, the d09/d20 brute-force-equality argument). Scale shape:
      * signatures are ONE linear codegen pass per doc (k·|shingles|
      * gate evaluations, no shuffle); pair work only on banded
      * candidates; the audit is what a pipeline runs on a SAMPLE to
      * pick k before committing to a signature width. */
    "d22_minhash_fidelity" -> ((s, d) => {
      val K = 16
      val corpus = d09Corpus(s, d)
      val pairs = minhashPairs(corpus).filter(col("jaccard") >= 0.3)
      val strSh = corpus.withColumn("toks", toks)
        .withColumn("ssh", array_distinct(expr(
          """CASE WHEN size(toks) >= 3
            | THEN transform(sequence(0, size(toks)-3),
            |                i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
            | ELSE array(concat_ws(' ', toks)) END""".stripMargin)))
        .select(col("doc_id"),
          array((1 to K).map(j =>
            array_min(transform(col("ssh"), x =>
              graft.operators.Sampling.portableGate(
                concat(lit(s"mh$j:"), x))))): _*).as("pmin"))
      val joined = pairs
        .join(strSh.select(col("doc_id").as("doc_a"), col("pmin").as("pa")),
          "doc_a")
        .join(strSh.select(col("doc_id").as("doc_b"), col("pmin").as("pb")),
          "doc_b")
      val agree = (1 to K).map(j =>
        when(element_at(col("pa"), j) === element_at(col("pb"), j), 1)
          .otherwise(0)).reduce(_ + _)
      val est = col("n_agree").cast("double") / K
      joined.withColumn("n_agree", agree.cast("int"))
        .select(col("doc_a"), col("doc_b"), col("n_agree"),
          RelationalQueries.rnd(est, 4).as("est_j"),
          RelationalQueries.rnd(col("jaccard"), 4).as("jaccard"),
          RelationalQueries.rnd(abs(est - col("jaccard")), 4).as("abs_err"))
        .orderBy("doc_a", "doc_b")
    }),

    /** Cross-catalog entity linkage — d10's machinery pointed ACROSS
      * two relations (the merge-two-vendor-feeds problem): match
      * customer and supplier records that denote the same entity under
      * typos. Blocking is by the EXTRACTED numeric key (digits-only
      * fingerprint — the "match key" move of record-linkage practice:
      * near-unique, typo-robust in the word part, so blocks stay O(1)
      * without salting; a corpus whose extracted keys skew would route
      * through the d10Blocked salting recipe instead). 50 planted
      * cross-catalog matches (supplier names rewritten to a 1-char
      * edit of the same-key customer name) give ground truth; the
      * block join is digit-key equi (never name×name), levenshtein
      * runs on candidates only, and the whole pipeline — planting,
      * extraction, blocking, the integer metric — replicates in
      * DuckDB. max_block_pairs is emitted so the no-salting-needed
      * claim is itself verified, not asserted. */
    "d19_crosscatalog_linkage" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_custkey") <= 500)
        .select(col("c_custkey").as("id_a"), col("c_name").as("name_a"))
      val suppRaw = Tables.supplier(s, d)
        .select(col("s_suppkey").as("id_b"), col("s_name"))
      val plantedNames = cust.filter(col("id_a") <= 50)
        .select(col("id_a").as("id_b"),
          concat(lit("K"), expr("substring(name_a, 2, 1000)")).as("pname"))
      val supp = suppRaw.join(plantedNames, Seq("id_b"), "left")
        .select(col("id_b"), coalesce(col("pname"), col("s_name")).as("name_b"))
      def digits(c: Column): Column = regexp_replace(c, "[^0-9]", "")
      val a = cust.select(col("id_a"), col("name_a"), digits(col("name_a")).as("k"))
      val b = supp.select(col("id_b"), col("name_b"), digits(col("name_b")).as("k"))
      val cand = a.join(b, "k")
      val matches = cand
        // same prune-only length gate + thresholded DP as d10
        .filter(abs(length(col("name_a")) - length(col("name_b"))) <= 2)
        .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
        .filter(col("dist") >= 0)
      val blockCensus = cand.groupBy("k").agg(count(lit(1)).as("np"))
      matches.agg(count(lit(1)).as("n_matches"),
          sum(when(col("id_a") === col("id_b"), 1L).otherwise(0L))
            .as("n_planted_found"),
          RelationalQueries.rnd(coalesce(avg("dist"), lit(-1.0)), 4)
            .as("avg_dist"))
        .crossJoin(blockCensus.agg(count(lit(1)).as("n_blocks"),
          max("np").as("max_block_pairs")))
    }),

    "d10_edit_distance" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_custkey") <= 500)
        .select(col("c_custkey").as("id"), col("c_mktsegment").as("seg"),
          col("c_name").as("name"))
      val blocked = d10Blocked(c)
      val a = blocked.select(col("seg"), col("fp"), col("sub"),
        col("id").as("id_a"), col("name").as("name_a"))
      val b = blocked.select(col("seg"), col("fp"), col("sub"),
        col("id").as("id_b"), col("name").as("name_b"))
      a.join(b, Seq("seg", "fp", "sub")).filter(col("id_a") < col("id_b"))
        // |len(a) − len(b)| > t ⇒ edit distance > t: the O(1) length
        // gate runs BEFORE the DP kernel, and the THRESHOLDED
        // levenshtein abandons a pair once its banded DP exceeds t
        // (O(len·t) vs O(len²)). Both are prune-only — the surviving
        // pair set is provably unchanged — so the naive full-kernel
        // DuckDB replica still hash-matches.
        .filter(abs(length(col("name_a")) - length(col("name_b"))) <= 2)
        .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
        .filter(col("dist") >= 0)
        .groupBy("seg")
        .agg(count(lit(1)).as("n_near_pairs"),
          countDistinct("id_a").as("n_docs_with_dup"),
          RelationalQueries.rnd(avg("dist"), 4).as("avg_dist"))
        .orderBy("seg")
    }),

    /** Containment (asymmetric-overlap) dedup — the doc-in-doc case
      * symmetric Jaccard structurally misses: a document that is a
      * truncated copy of another shares nearly ALL of its own shingles
      * (containment |A∩B|/min(|A|,|B|) ≈ 1) while the union-normalized
      * jaccard sits at ~|A|/|B| and slides under any fixed threshold
      * as the copy gets shorter (Broder 1997 separates the two
      * resemblance measures for exactly this reason; crawl pipelines
      * meet it as pagination fragments, abstracts, and feed
      * summaries). Ground truth is planted: every base doc ≥ 200
      * chars gets a 1/5-length truncated copy, which at jaccard
      * ≈ 0.2 < 0.3 is invisible to the d04/d09 threshold — the
      * audit's `n_missed_by_jaccard` publishes exactly how many
      * containment dups the symmetric pass loses. Blocking is by the
      * 32-char text-prefix gate (prefix blocking IS the right key for
      * truncation-style duplication — head-sharing is what defines
      * it; a boilerplate-heavy corpus whose openings collide runs the
      * t17 boilerplate prune first, and gram-banded d02 catches
      * tail-anchored overlap prefix blocks can't), so pair work is
      * Σ b_i² over exact-prefix groups, never corpus². Every stage —
      * truncation arithmetic (`div`), the md5-nibble gate, 5-gram
      * sets, the two overlap ratios — computes bit-identically in
      * DuckDB: full hash oracle. */
    "d23_containment" -> ((s, d) => {
      val grams = array_distinct(expr(
        """CASE WHEN length(text) >= 5
          | THEN transform(sequence(1, length(text)-4), i -> substring(text, i, 5))
          | ELSE array(text) END""".stripMargin))
      val base = Tables.documents(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val plants = base.filter(length(col("text")) >= 200)
        .select((col("doc_id") + 200000L).as("doc_id"),
          expr("substring(text, 1, length(text) div 5)").as("text"))
      val corpus = base.unionByName(plants)
      val blocked = corpus.select(col("doc_id"),
        graft.operators.Sampling.portableGate(
          substring(col("text"), 1, 32)).as("pfx"),
        grams.as("g"))
      val a = blocked.select(col("pfx"), col("doc_id").as("doc_a"),
        col("g").as("g_a"))
      val b = blocked.select(col("pfx"), col("doc_id").as("doc_b"),
        col("g").as("g_b"))
      val pairs = a.join(b, Seq("pfx"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("inter",
          size(array_intersect(col("g_a"), col("g_b"))).cast("double"))
        .withColumn("cmax",
          col("inter") / least(size(col("g_a")), size(col("g_b"))))
        .withColumn("jac",
          col("inter") / size(array_union(col("g_a"), col("g_b"))))
      val nDocs = corpus.agg(count(lit(1)).as("n_docs"))
      val nPlanted = plants.agg(count(lit(1)).as("n_planted"))
      pairs.agg(count(lit(1)).as("n_pairs"),
          sum(when(col("cmax") >= 0.6, 1L).otherwise(0L)).as("n_cont_06"),
          sum(when(col("cmax") >= 0.6 && col("jac") < 0.3, 1L)
            .otherwise(0L)).as("n_missed_by_jaccard"),
          RelationalQueries.rnd(coalesce(max("cmax"), lit(0.0)), 4)
            .as("max_containment"))
        .crossJoin(nDocs).crossJoin(nPlanted)
        .select(col("n_docs"), col("n_planted"), col("n_pairs"),
          col("n_cont_06"), col("n_missed_by_jaccard"),
          col("max_containment"))
    }),

    /** LSH banding s-curve audit — the measurement behind the (r, b)
      * design choice every MinHash deployment makes before committing
      * a 100 TB pass: for band widths r ∈ {2, 4, 8} over the SAME
      * frozen k=16 `mh<j>:`-salted portable signature d22 certifies
      * (b = 16/r bands), the measured candidate-capture rate per exact-
      * jaccard decile, beside the theoretical capture 1−(1−s^r)^b at
      * the decile midpoint. The audit corpus is a portable-gate DOC
      * SAMPLE (`scurve:` family, mod 16 — an audit-budget parameter
      * sized to the corpus, like s10's 3-query probe set) plus one
      * planted variant per sampled doc keeping 20/40/60/80/100% of its
      * head tokens (doc_id mod 5) with unique `z<id>x<i>` fillers —
      * seeding every jaccard decile the natural corpus leaves empty,
      * so the curve has support at the thresholds that matter. Theory
      * values compute s^r and (1−s^r)^b by explicit correctly-rounded
      * MULTIPLICATION CHAINS (never `pow`, whose libm rounding is not
      * contractual across engines), so even the theoretical curve
      * hash-matches DuckDB. sf0.1 measures the textbook shapes: r=2
      * catches 0.45 of decile-2 pairs (theory 0.40) but floods decile
      * 0 with false positives at rate 1e-4 × 158k pairs; r=8 zeroes
      * everything below decile 6 and still captures 100% of exact
      * dups (theory 0.89). Scale shape: the all-pairs stage is
      * SAMPLE²-bounded by construction (a broadcast non-equi self-
      * join of ~n/16 docs — the audit economics, not a corpus
      * pattern); signatures are one linear codegen pass per sampled
      * doc; everything after the pair frame is a ≤30-row aggregate. */
    "d24_lsh_scurve" -> ((s, d) => {
      val sampled = Tables.documents(s, d)
        .filter(pmod(graft.operators.Sampling.portableGate(
          concat(lit("scurve:"), col("doc_id").cast("string"))),
          lit(16)) === 0)
        .withColumn("toks", toks)
        .filter(size(col("toks")) >= 20)
        .select(col("doc_id"), col("toks"))
      val withK = sampled.withColumn("k",
        expr("cast((size(toks) * (20 + 20 * (doc_id % 5))) div 100 as int)"))
      // fillers are built BEFORE the id offset: Spark's lateral column
      // alias resolution would otherwise bind the lambda's doc_id to
      // the just-aliased doc_id+500000 (z500003x5, not the oracle's
      // z3x5)
      val planted = withK.select(col("doc_id"),
          concat(slice(col("toks"), lit(1), col("k")),
            when(col("k") < size(col("toks")),
              transform(sequence(lit(1), size(col("toks")) - col("k")),
                i => concat(lit("z"), col("doc_id").cast("string"),
                  lit("x"), i.cast("string"))))
              .otherwise(expr("array()").cast("array<string>"))).as("toks"))
        .select((col("doc_id") + 500000L).as("doc_id"), col("toks"))
      val corpus = sampled.unionByName(planted)
      val sh = corpus.withColumn("s", array_distinct(expr(
        "transform(sequence(0, size(toks)-3), " +
          "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))")))
      val pm = sh.select(col("doc_id"), col("s"),
        array((1 to 16).map(j =>
          array_min(transform(col("s"), x =>
            graft.operators.Sampling.portableGate(
              concat(lit(s"mh$j:"), x))))): _*).as("pmin"))
      val a = pm.select(col("doc_id").as("doc_a"), col("s").as("sa"),
        col("pmin").as("pa"))
      val b = pm.select(col("doc_id").as("doc_b"), col("s").as("sb"),
        col("pmin").as("pb"))
      def captured(r: Int): Column =
        when((0 until 16 / r).map(bi =>
          (0 until r).map(i =>
            element_at(col("pa"), bi * r + i + 1) ===
              element_at(col("pb"), bi * r + i + 1)).reduce(_ && _))
          .reduce(_ || _), 1L).otherwise(0L)
      // |a∪b| = |a|+|b|−|a∩b| (shingle sets are array_distinct), so the
      // pair kernel never materializes the union array — one set
      // intersection per pair is the whole O(|s|) cost
      val pairs = a.join(broadcast(b), col("doc_a") < col("doc_b"))
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("sa")) + size(col("sb")) - col("inter")).cast("double"))
        .select(least(floor(col("jaccard") * 10).cast("int"), lit(9))
            .as("j_decile"),
          captured(2).as("c2"), captured(4).as("c4"), captured(8).as("c8"))
      // consumed three times (one seg per band width) but NOT
      // checkpointed: the three union branches share a bit-identical
      // aggregate subtree, so ReusedExchange already runs the
      // sample²-pair kernel once — measured 5.9 s as-is vs 10.6 s with
      // an eager localCheckpoint here (the checkpoint job bypasses the
      // reuse and pays the kernel again)
      val agg = pairs.groupBy("j_decile")
        .agg(count(lit(1)).as("n_pairs"), sum("c2").as("cap2"),
          sum("c4").as("cap4"), sum("c8").as("cap8"))
      def pc(x: Column, e: Int): Column = e match {
        case 2 => x * x
        case 4 => (x * x) * (x * x)
        case 8 => ((x * x) * (x * x)) * ((x * x) * (x * x))
      }
      def seg(r: Int): DataFrame = {
        val mid = (col("j_decile") * 2 + 1) / lit(20.0)
        val theory = lit(1.0) - pc(lit(1.0) - pc(mid, r), 16 / r)
        agg.select(lit(r).as("r"), col("j_decile"), col("n_pairs"),
          col(s"cap$r").as("n_captured"),
          RelationalQueries.rnd(
            col(s"cap$r").cast("double") / col("n_pairs"), 4)
            .as("capture_e4"),
          RelationalQueries.rnd(theory, 4).as("theory_e4"))
      }
      seg(2).unionByName(seg(4)).unionByName(seg(8))
        .orderBy("r", "j_decile")
    }),

    /** Verbatim-span REMOVAL — d14 detects repeated spans; this is the
      * production excision Lee et al. 2022 actually ship (ExactSubstr
      * dedup removes the duplicated substrings from the corpus, it
      * does not just count them). Same detection pipeline as d14
      * (positioned md5 8-grams, cross-doc df ≥ 2, the planted banner
      * prepended to every doc_id % 5 == 0 doc at arbitrary alignment),
      * then the REWRITE: per doc, the union of repeated [i, i+8) spans
      * becomes a covered-position set and the kept tokens reassemble
      * in order into the cleaned text. Published census per lang:
      * docs rewritten / emptied, token mass before / removed / after,
      * the planted-banner ground truth (n_banner_before counts docs
      * whose planted text contains the banner; n_banner_after is its
      * post-removal frequency — RosterSpec pins it to ZERO while
      * sum_tokens_after stays positive, i.e. the banner vanishes
      * everywhere and unique text survives), and min/max md5 of the
      * cleaned text so reassembly ORDER is oracle-verified.
      *
      * Shape at 100 TB: detection is d14's (gram census map-side
      * combinable; the repeated-set join allowed to shuffle). The
      * rewrite adds ONE repeated-start-sized groupBy (collect the
      * per-doc start list — bounded by n_tokens per doc) and one
      * corpus-sized equi-join back to the token arrays; the excision
      * itself is row-local array math (covered set ∩ positions), so
      * unlike a position-explode rewrite nothing token-level ever
      * shuffles. The cleaned corpus in production writes straight out
      * partitioned by lang; here it folds to the census + md5 pins. */
    "d28_verbatim_removal" -> ((s, d) => {
      val W = VerbatimW
      val banner = TextQueries.BoilerHeader
      val planted = verbatimPlanted(s, d)
      val toked = planted.select(col("doc_id"), col("lang"), col("text"),
          toks.as("tk"))
        .withColumn("n", size(col("tk")))
      // repeated-start detection: the memoized build shared with d14
      // (r21) — the per-doc start collection is order-insensitive
      // downstream (covered is consumed as a SET via array_contains /
      // size after array_distinct)
      val starts = verbatimRepStarts(s, d)
        .groupBy("doc_id").agg(collect_list("i").as("starts"))
      val cleaned = toked.join(starts, Seq("doc_id"), "left")
        .withColumn("covered", array_distinct(flatten(transform(
          coalesce(col("starts"), expr("CAST(array() AS array<int>)")),
          st => sequence(st, st + (W - 1))))))
        // the m11 empty/short-doc guard: sequence(0, n-1) DESCENDS for
        // n = 0 in Spark while the oracle's range(0, n) is empty
        .withColumn("kept", expr(
          """CASE WHEN n >= 1
            | THEN transform(filter(sequence(0, n - 1),
            |        i -> NOT array_contains(covered, i)), i -> tk[i])
            | ELSE CAST(array() AS array<string>) END""".stripMargin))
        .withColumn("cleaned_text", concat_ws(" ", col("kept")))
      def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
      cleaned.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          cnt(size(col("covered")) > 0).as("n_docs_rewritten"),
          cnt(size(col("covered")) > 0 && size(col("kept")) === 0)
            .as("n_docs_emptied"),
          sum(col("n").cast("long")).as("sum_tokens_before"),
          sum(size(col("covered")).cast("long")).as("sum_tokens_removed"),
          sum(size(col("kept")).cast("long")).as("sum_tokens_after"),
          cnt(col("text").contains(banner)).as("n_banner_before"),
          cnt(col("cleaned_text").contains(banner)).as("n_banner_after"),
          min(md5(col("cleaned_text"))).as("min_cleaned_md5"),
          max(md5(col("cleaned_text"))).as("max_cleaned_md5"))
        .orderBy("lang")
    }),

    /** Quality-aware keeper election — SemDeDup/NeMo-Curator's
      * keep-BEST policy (Abbas et al. 2023 §3; production curators
      * keep the highest-quality member of each duplicate cluster, not
      * the lowest id): the r20 composition of the shared [[d09Labels]]
      * component build with t44's FROZEN learned quality model
      * ([[TextQueries.qcModel]] — the same memoized weights t44/t45
      * publish, a bounded 1-row read folded into a row-local literal
      * margin expression). Per component the keeper is
      * argmax(margin, doc_id tie-break); published beside it is the
      * KEEPER-POLICY DELTA vs d17's keep-min-id rule — how many
      * clusters change keeper, the exact id sums of both elections,
      * the total margin the quality policy gains (≥ 0 by argmax,
      * > 0 ⟺ any flip), and the token mass dropped under each policy
      * — the migration review sheet a heuristic→learned keeper
      * switch reads.
      *
      * Scale: one label-table join against row-local scored features
      * (no new shuffle class — the d17 shape plus a high-cardinality
      * per-cluster window over cluster-sized frames), one aggregate.
      * The d09Corpus plants make the flip PROVABLE: each " graftdup"
      * copy differs from its base doc in x1/x2/x3/x4 deterministically,
      * so the election outcome is pinned by the oracle (and
      * PipelineSpec re-derives one cluster's argmax independently).
      * All published numbers are exact integers. */
    "d29_quality_keeper" -> ((s, d) => {
      import graft.queries.{TextQueries => TQ}
      val corpus = d09Corpus(s, d)
      val labels = d09Labels(s, d)
      val scored = TQ.qcRawFeatureCols(corpus)
        .withColumn("margin", TQ.qcMarginCol(TQ.qcFrozenWeights(s, d)))
        .select(col("doc_id").as("node"), col("margin"), col("ntok"))
      val cl = labels.join(scored, "node")
      val wK = Window.partitionBy("lbl")
        .orderBy(col("margin").desc, col("node"))
      val ranked = cl.withColumn("krn", row_number().over(wK)).materialize
      val qK = ranked.filter(col("krn") === 1)
        .select(col("lbl"), col("node").as("keeper_q"),
          col("margin").as("kq_margin"))
      val mK = cl.filter(col("node") === col("lbl"))
        .select(col("lbl"), col("margin").as("km_margin"))
      val per = qK.join(mK, "lbl")
      per.agg(count(lit(1)).as("n_clusters"),
          sum(when(col("keeper_q") =!= col("lbl"), 1L).otherwise(0L))
            .as("n_changed_keepers"),
          sum("lbl").as("keeper_min_id_sum"),
          sum("keeper_q").as("keeper_q_id_sum"),
          sum(col("kq_margin") - col("km_margin")).as("margin_gain_total"))
        .crossJoin(ranked.agg(count(lit(1)).as("n_clustered_docs"),
          sum(when(col("node") =!= col("lbl"), col("ntok")).otherwise(0L))
            .as("tokens_dropped_min"),
          sum(when(col("krn") =!= 1, col("ntok")).otherwise(0L))
            .as("tokens_dropped_q")))
        .select("n_clusters", "n_clustered_docs", "n_changed_keepers",
          "keeper_min_id_sum", "keeper_q_id_sum", "margin_gain_total",
          "tokens_dropped_min", "tokens_dropped_q")
    }),
  )

  /** Shared DuckDB ground-truth prefix for the d09 component family:
    * the planted corpus (`c`, `t`), the brute-force jaccard edge set
    * (`sh`, `p`, `e`, `n`), and recursive-CTE connected components
    * (`reach`, `lab`). Interpolated (already margin-free) into the
    * d09/d17/d25 oracles so the three consumers certify against the
    * SAME independently-built graph by construction — the oracle-side
    * mirror of the shared [[d09Labels]] build. */
  private val DupGraphCteSql =
    """ base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
      | pl1 AS (
      |  SELECT doc_id + 100000 AS doc_id, text || ' graftdup' AS text
      |  FROM base WHERE doc_id < 40
      |    AND len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20),
      | pl2 AS (
      |  SELECT doc_id + 200000 AS doc_id, text || ' graftdup graftdup2' AS text
      |  FROM base WHERE doc_id < 20
      |    AND len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20),
      | c AS (SELECT * FROM base UNION ALL SELECT * FROM pl1
      |       UNION ALL SELECT * FROM pl2),
      | t AS (SELECT doc_id,
      |         list_filter(string_split(text, ' '), x -> x <> '') AS tk
      |       FROM c),
      | sh AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(tk) >= 3
      |    THEN list_transform(range(1, len(tk) - 1),
      |                        i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))
      |    ELSE [array_to_string(tk, ' ')] END) AS s
      |  FROM t),
      | p AS (
      |  SELECT a.doc_id AS u, b.doc_id AS v
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |          / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)
      |        >= 0.3),
      | e AS (SELECT u, v FROM p UNION ALL SELECT v AS u, u AS v FROM p),
      | n AS (SELECT DISTINCT u AS node FROM e),
      | reach AS (
      |  SELECT node, node AS lbl FROM n
      |  UNION
      |  SELECT e.v AS node, r.lbl FROM reach r JOIN e ON e.u = r.node),
      | lab AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // d02: the ENTIRE portable MinHash+LSH pipeline replicates — string
    // 3-gram shingles, ONE h60 digest per shingle, K=32 per-salt minima
    // of the (a_j·hi + b_j·lo + c_j) mod 2^61−1 affine family (constants
    // interpolated from MhConsts — the same literals the Spark plan
    // carries), 8×4 banding with the serialized 4-value bucket key,
    // candidate dedup, exact-jaccard verify — so the LSH census itself
    // is hash-verified (the r11 allowlist retirement; the
    // splitmix64-kernel variant keeps its planted companion d06).
    "d02_minhash_lsh" ->
      s"""WITH gr AS (SELECT min(doc_id) AS doc_id, min(text) AS text,
        |               count(*) AS gsize
        |        FROM documents GROUP BY md5(text)),
        | tk AS (SELECT doc_id,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |        FROM gr),
        | sh AS (SELECT doc_id,
        |   list_distinct(CASE WHEN len(tk) >= 3
        |     THEN list_transform(range(1, len(tk) - 1),
        |            i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |     ELSE [array_to_string(tk, ' ')] END) AS g
        |   FROM tk),
        | ex AS (SELECT doc_id, unnest(g) AS s FROM sh),
        | hx AS (SELECT doc_id, ${h60Sql("s")} AS x FROM ex),
        | co AS (SELECT * FROM (VALUES
        |   ${MhConsts.zipWithIndex.map { case ((a, b, c), i) =>
               s"(${i + 1}, ${a}, ${b}, ${c})" }.mkString(",\n        |   ")})
        |   AS t(j, a, b, c)),
        | hv AS (SELECT doc_id, j,
        |          min((a * (x >> 30) + b * (x & $MhMask) + c) % $MhP) AS mn
        |        FROM hx CROSS JOIN co
        |        GROUP BY doc_id, j),
        | sg AS (SELECT doc_id, list(mn ORDER BY j) AS sig FROM hv
        |        GROUP BY doc_id),
        | bd AS (SELECT doc_id, b,
        |          sig[b*4+1] || ':' || sig[b*4+2] || ':' ||
        |          sig[b*4+3] || ':' || sig[b*4+4] AS bucket
        |        FROM sg CROSS JOIN (SELECT unnest(range(0, 8)) AS b)),
        | cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
        |          FROM bd a JOIN bd c
        |            ON a.b = c.b AND a.bucket = c.bucket
        |               AND a.doc_id < c.doc_id),
        | jc AS (SELECT doc_a, doc_b,
        |          len(list_intersect(x.g, y.g)) * 1.0
        |            / len(list_distinct(list_concat(x.g, y.g))) AS jac
        |        FROM cand
        |        JOIN sh x ON x.doc_id = cand.doc_a
        |        JOIN sh y ON y.doc_id = cand.doc_b),
        | wjc AS (SELECT jc.*, ga.gsize AS ga, gb.gsize AS gb
        |         FROM jc JOIN gr ga ON ga.doc_id = jc.doc_a
        |                 JOIN gr gb ON gb.doc_id = jc.doc_b),
        | wi AS (SELECT CAST(coalesce(sum(gsize * (gsize - 1) // 2), 0)
        |            AS BIGINT) AS cand_within,
        |          max(CASE WHEN gsize >= 2 THEN 1.0 END) AS max_within
        |        FROM gr)
        |SELECT
        | CAST(coalesce((SELECT sum(ga * gb) FROM wjc), 0)
        |   + wi.cand_within AS BIGINT) AS n_candidate_pairs,
        | CAST(coalesce((SELECT sum(CASE WHEN jac >= 0.5 THEN ga * gb
        |                           ELSE 0 END) FROM wjc), 0)
        |   + wi.cand_within AS BIGINT) AS n_dups_05,
        | floor(greatest(coalesce((SELECT max(jac) FROM wjc), 0.0),
        |   coalesce(wi.max_within, 0.0))*10000+0.5)/10000 AS max_jaccard
        |FROM wi""".stripMargin,

    // d03: the portable sketch replicates bit-for-bit — per-token h60,
    // 60 ±1 vote sums, vote>0 fingerprint bits, then the same 4×16
    // banding and xor/bit_count hamming the engine runs. Token-less
    // docs keep fingerprint 0 via the [NULL] unnest (Spark's
    // explode_outer mirror).
    "d03_simhash" -> {
      val votes = (0 until 60).map(b =>
        s"sum(CASE WHEN h IS NULL THEN 0 WHEN (h >> $b) & 1 = 1 " +
          s"THEN 1 ELSE -1 END) AS v$b").mkString(",\n|   ")
      val sig = (0 until 60).map(b =>
        s"(CASE WHEN v$b > 0 THEN CAST(${1L << b} AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END)").mkString(" + ")
      s"""WITH gr AS (SELECT min(doc_id) AS doc_id, min(text) AS text,
        |               count(*) AS gsize
        |        FROM documents GROUP BY md5(text)),
        | tk AS (SELECT doc_id,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |        FROM gr),
        | tok AS (SELECT doc_id,
        |           unnest(CASE WHEN len(tk) = 0 THEN [NULL::VARCHAR]
        |                  ELSE tk END) AS t
        |         FROM tk),
        | hh AS (SELECT doc_id, ${h60Sql("t")} AS h FROM tok),
        | vt AS (SELECT doc_id,
        |   $votes
        |   FROM hh GROUP BY doc_id),
        | sg AS (SELECT doc_id, $sig AS sh FROM vt),
        | bd AS (SELECT doc_id, sh, b, (sh >> (b*16)) & 65535 AS bits
        |        FROM sg CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
        | pr AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |          bit_count(xor(a.sh, c.sh)) AS hamming
        |        FROM bd a JOIN bd c
        |          ON a.b = c.b AND a.bits = c.bits
        |             AND a.doc_id < c.doc_id),
        | wpr AS (SELECT pr.*, ga.gsize AS ga, gb.gsize AS gb
        |         FROM pr JOIN gr ga ON ga.doc_id = pr.doc_a
        |                 JOIN gr gb ON gb.doc_id = pr.doc_b),
        | wi AS (SELECT CAST(coalesce(sum(gsize * (gsize - 1) // 2), 0)
        |            AS BIGINT) AS coll_within,
        |          max(CASE WHEN gsize >= 2 THEN 1 ELSE 0 END) AS has_dup
        |        FROM gr)
        |SELECT (SELECT CAST(coalesce(sum(gsize), 0) AS BIGINT) FROM gr)
        |   AS n_docs,
        | (SELECT count(DISTINCT sh) FROM sg) AS n_distinct_simhash,
        | CAST(coalesce((SELECT sum(ga * gb) FROM wpr), 0)
        |   + wi.coll_within AS BIGINT) AS n_band_collisions,
        | CAST(coalesce((SELECT sum(CASE WHEN hamming <= 8 THEN ga * gb
        |                           ELSE 0 END) FROM wpr), 0)
        |   + wi.coll_within AS BIGINT) AS n_pairs_hamming_le8,
        | CAST(least(coalesce((SELECT min(hamming) FROM wpr), 64),
        |   CASE WHEN wi.has_dup = 1 THEN 0 ELSE 64 END) AS INTEGER)
        |   AS min_hamming
        |FROM wi""".stripMargin
    },
    // d10 replicates the whole capped blocking in DuckDB (fingerprint,
    // 12-char block key, portable md5 gate on the FULL fingerprint,
    // BlockCap interpolated) so tuning the Scala side can never
    // desynchronize the replica — same recipe as d04.
    "d10_edit_distance" ->
      s"""WITH c AS (
        |  SELECT c_custkey AS id, c_mktsegment AS seg, c_name AS name,
        |    substring(regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g'),
        |              1, 12) AS fp,
        |    ${graft.operators.Sampling.portableGateSql(
             "regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g')")} AS pint
        |  FROM customer WHERE c_custkey <= 500),
        | sz AS (SELECT seg, fp, count(*) AS bn FROM c GROUP BY seg, fp),
        | s AS (
        |  SELECT c.*, pint % CAST((bn + ${BlockCap - 1}) // $BlockCap AS INTEGER)
        |    AS sub
        |  FROM c JOIN sz USING (seg, fp)),
        | p AS (
        |  SELECT a.seg, a.id AS id_a, levenshtein(a.name, b.name) AS dist
        |  FROM s a JOIN s b
        |    ON a.seg = b.seg AND a.fp = b.fp AND a.sub = b.sub AND a.id < b.id)
        |SELECT seg, count(*) AS n_near_pairs,
        | count(DISTINCT id_a) AS n_docs_with_dup,
        | floor(avg(dist)*10000+0.5)/10000 AS avg_dist
        |FROM p WHERE dist <= 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // d20: brute-force pair graph + degree census — the d09 oracle
    // shape without the recursive clustering.
    "d20_neardup_hubs" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        | hub AS (SELECT doc_id, text FROM base
        |         WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20
        |         ORDER BY doc_id LIMIT 1),
        | cp AS (SELECT CAST(k + 300000 AS BIGINT) AS doc_id,
        |          text || ' graftvar' || CAST(k AS VARCHAR) AS text
        |        FROM hub, (SELECT unnest(range(1, 11)) AS k)),
        | c AS (SELECT * FROM base UNION ALL SELECT * FROM cp),
        | t AS (SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |       FROM c),
        | sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(tk) >= 3
        |    THEN list_transform(range(1, len(tk) - 1),
        |                        i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))
        |    ELSE [array_to_string(tk, ' ')] END) AS s
        |  FROM t),
        | p AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |          / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)
        |        >= 0.3),
        | dg AS (SELECT node, count(*) AS deg FROM (
        |          SELECT u AS node FROM p UNION ALL SELECT v AS node FROM p)
        |        GROUP BY node)
        |SELECT (SELECT count(*) FROM c) AS n_docs,
        | (SELECT count(*) FROM p) AS n_pairs,
        | (SELECT count(*) FROM dg) AS n_docs_with_dups,
        | (SELECT CAST(max(deg) AS BIGINT) FROM dg) AS max_degree,
        | (SELECT CAST(sum(CASE WHEN deg >= 5 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM dg) AS n_hubs_deg5""".stripMargin,

    // d21: the d20 edge replica + three unrolled integer PageRank
    // iterations (all BIGINT floor-division — exact cross-engine).
    "d21_graph_rank" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        | hub AS (SELECT doc_id, text FROM base
        |         WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20
        |         ORDER BY doc_id LIMIT 1),
        | cp AS (SELECT CAST(k + 300000 AS BIGINT) AS doc_id,
        |          text || ' graftvar' || CAST(k AS VARCHAR) AS text
        |        FROM hub, (SELECT unnest(range(1, 11)) AS k)),
        | c AS (SELECT * FROM base UNION ALL SELECT * FROM cp),
        | t AS (SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |       FROM c),
        | sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(tk) >= 3
        |    THEN list_transform(range(1, len(tk) - 1),
        |                        i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))
        |    ELSE [array_to_string(tk, ' ')] END) AS s
        |  FROM t),
        | p AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |          / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)
        |        >= 0.3),
        | e2 AS (SELECT u AS src, v AS dst FROM p
        |        UNION ALL SELECT v AS src, u AS dst FROM p),
        | dg AS (SELECT src AS node, count(*) AS deg FROM e2 GROUP BY 1),
        | nn AS (SELECT count(*) AS n FROM dg),
        | p0 AS (SELECT node, deg,
        |          CAST(1000000000 AS BIGINT) // (SELECT n FROM nn) AS pr
        |        FROM dg),
        | m1 AS (SELECT e2.dst AS node, CAST(sum(sp.pr // sp.deg) AS BIGINT) AS c
        |        FROM e2 JOIN p0 sp ON sp.node = e2.src GROUP BY 1),
        | p1 AS (SELECT d.node, d.deg,
        |          (15 * (CAST(1000000000 AS BIGINT) // (SELECT n FROM nn))
        |           + 85 * coalesce(m1.c, 0)) // 100 AS pr
        |        FROM p0 d LEFT JOIN m1 USING (node)),
        | m2 AS (SELECT e2.dst AS node, CAST(sum(sp.pr // sp.deg) AS BIGINT) AS c
        |        FROM e2 JOIN p1 sp ON sp.node = e2.src GROUP BY 1),
        | p2 AS (SELECT d.node, d.deg,
        |          (15 * (CAST(1000000000 AS BIGINT) // (SELECT n FROM nn))
        |           + 85 * coalesce(m2.c, 0)) // 100 AS pr
        |        FROM p1 d LEFT JOIN m2 USING (node)),
        | m3 AS (SELECT e2.dst AS node, CAST(sum(sp.pr // sp.deg) AS BIGINT) AS c
        |        FROM e2 JOIN p2 sp ON sp.node = e2.src GROUP BY 1),
        | p3 AS (SELECT d.node, d.deg,
        |          (15 * (CAST(1000000000 AS BIGINT) // (SELECT n FROM nn))
        |           + 85 * coalesce(m3.c, 0)) // 100 AS pr
        |        FROM p2 d LEFT JOIN m3 USING (node)),
        | ranked AS (SELECT node, deg, pr,
        |              row_number() OVER (ORDER BY pr DESC, node) AS rank
        |            FROM p3)
        |SELECT CAST(rank AS INTEGER) AS rank, node, pr AS pr_e9,
        | CAST(deg AS BIGINT) AS deg
        |FROM ranked WHERE rank <= 10 ORDER BY rank""".stripMargin,

    // d22: brute-force pair set (the d09-oracle corpus + string
    // shingles) + the identical k=16 salted portable-gate minhash on
    // both engines — the estimator audit replicates end to end.
    "d22_minhash_fidelity" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        | pl1 AS (
        |  SELECT doc_id + 100000 AS doc_id, text || ' graftdup' AS text
        |  FROM base WHERE doc_id < 40
        |    AND len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20),
        | pl2 AS (
        |  SELECT doc_id + 200000 AS doc_id, text || ' graftdup graftdup2' AS text
        |  FROM base WHERE doc_id < 20
        |    AND len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20),
        | c AS (SELECT * FROM base UNION ALL SELECT * FROM pl1
        |       UNION ALL SELECT * FROM pl2),
        | t AS (SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |       FROM c),
        | sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(tk) >= 3
        |    THEN list_transform(range(1, len(tk) - 1),
        |                        i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))
        |    ELSE [array_to_string(tk, ' ')] END) AS s
        |  FROM t),
        | pm AS (
        |  SELECT doc_id, s,
        |    [${(1 to 16).map(j =>
               "list_min(list_transform(s, x -> " +
                 graft.operators.Sampling.portableGateSql(s"'mh$j:' || x") +
                 "))").mkString(",\n     ")}] AS pmin
        |  FROM sh),
        | p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)
        |      AS jaccard,
        |    a.pmin AS pa, b.pmin AS pb
        |  FROM pm a JOIN pm b ON a.doc_id < b.doc_id),
        | ag AS (
        |  SELECT doc_a, doc_b, jaccard,
        |    CAST(list_sum(list_transform(range(1, 17),
        |      j -> CASE WHEN pa[j] = pb[j] THEN 1 ELSE 0 END)) AS INTEGER)
        |      AS n_agree
        |  FROM p WHERE jaccard >= 0.3)
        |SELECT doc_a, doc_b, n_agree,
        | floor((CAST(n_agree AS DOUBLE) / 16)*10000+0.5)/10000 AS est_j,
        | floor((jaccard)*10000+0.5)/10000 AS jaccard,
        | floor((abs(CAST(n_agree AS DOUBLE) / 16 - jaccard))*10000+0.5)/10000
        |   AS abs_err
        |FROM ag ORDER BY doc_a, doc_b""".stripMargin,

    // d23: full replica — truncation planting, prefix-gate blocking,
    // 5-gram sets, both overlap ratios.
    "d23_containment" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        | pl AS (
        |  SELECT doc_id + 200000 AS doc_id,
        |    substring(text, 1, length(text) // 5) AS text
        |  FROM base WHERE length(text) >= 200),
        | c AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
        | g AS (
        |  SELECT doc_id,
        |    ${graft.operators.Sampling.portableGateSql(
             "substring(text, 1, 32)")} AS pfx,
        |    list_distinct(CASE WHEN length(text) >= 5
        |      THEN list_transform(range(1, length(text) - 3),
        |                          i -> substring(text, i, 5))
        |      ELSE [text] END) AS g
        |  FROM c),
        | p AS (
        |  SELECT CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) AS inter,
        |         least(len(a.g), len(b.g)) AS mn,
        |         len(list_distinct(list_concat(a.g, b.g))) AS un
        |  FROM g a JOIN g b ON a.pfx = b.pfx AND a.doc_id < b.doc_id),
        | m AS (SELECT inter / mn AS cmax, inter / un AS jac FROM p)
        |SELECT (SELECT count(*) FROM c) AS n_docs,
        | (SELECT count(*) FROM pl) AS n_planted,
        | count(*) AS n_pairs,
        | CAST(sum(CASE WHEN cmax >= 0.6 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_cont_06,
        | CAST(sum(CASE WHEN cmax >= 0.6 AND jac < 0.3 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_missed_by_jaccard,
        | floor((coalesce(max(cmax), 0.0))*10000+0.5)/10000 AS max_containment
        |FROM m""".stripMargin,

    // d19: full replica — planting, digit-key extraction, block join,
    // integer levenshtein — all portable.
    "d19_crosscatalog_linkage" ->
      """WITH cust AS (
        |  SELECT c_custkey AS id_a, c_name AS name_a FROM customer
        |  WHERE c_custkey <= 500),
        | supp AS (
        |  SELECT s.s_suppkey AS id_b,
        |    CASE WHEN s.s_suppkey <= 50 AND c.name_a IS NOT NULL
        |         THEN 'K' || substring(c.name_a, 2, 1000)
        |         ELSE s.s_name END AS name_b
        |  FROM supplier s
        |  LEFT JOIN (SELECT id_a, name_a FROM cust WHERE id_a <= 50) c
        |    ON s.s_suppkey = c.id_a),
        | a AS (SELECT id_a, name_a,
        |         regexp_replace(name_a, '[^0-9]', '', 'g') AS k FROM cust),
        | b AS (SELECT id_b, name_b,
        |         regexp_replace(name_b, '[^0-9]', '', 'g') AS k FROM supp),
        | cand AS (SELECT a.id_a, a.name_a, b.id_b, b.name_b, a.k
        |          FROM a JOIN b USING (k)),
        | m AS (SELECT *, levenshtein(name_a, name_b) AS dist FROM cand
        |       WHERE levenshtein(name_a, name_b) <= 2),
        | bc AS (SELECT k, count(*) AS np FROM cand GROUP BY k)
        |SELECT (SELECT count(*) FROM m) AS n_matches,
        | (SELECT CAST(coalesce(sum(CASE WHEN id_a = id_b THEN 1 ELSE 0 END), 0)
        |         AS BIGINT) FROM m) AS n_planted_found,
        | (SELECT floor((coalesce(avg(dist), -1.0))*10000+0.5)/10000 FROM m)
        |   AS avg_dist,
        | (SELECT count(*) FROM bc) AS n_blocks,
        | (SELECT CAST(max(np) AS BIGINT) FROM bc) AS max_block_pairs""".stripMargin,

    // d16: brute-force corpus×batch ground truth (string shingles, no
    // LSH) — the cross-corpus mirror of the d06 oracle.
    "d16_crosscorpus_neardup" ->
      """WITH doc AS (SELECT doc_id, text FROM documents),
        | base AS (SELECT * FROM doc WHERE doc_id < 200),
        | fresh AS (SELECT * FROM doc WHERE doc_id >= 200 AND doc_id < 260),
        | rp AS (SELECT doc_id + 100000 AS doc_id, text || ' graftdup' AS text
        |        FROM base WHERE doc_id < 40
        |          AND len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20),
        | batch AS (SELECT * FROM fresh UNION ALL SELECT * FROM rp),
        | shc AS (SELECT doc_id,
        |   list_distinct(CASE WHEN len(tk) >= 3
        |     THEN list_transform(range(1, len(tk) - 1),
        |            i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |     ELSE [array_to_string(tk, ' ')] END) AS g
        |   FROM (SELECT doc_id,
        |           list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |         FROM base)),
        | shb AS (SELECT doc_id,
        |   list_distinct(CASE WHEN len(tk) >= 3
        |     THEN list_transform(range(1, len(tk) - 1),
        |            i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |     ELSE [array_to_string(tk, ' ')] END) AS g
        |   FROM (SELECT doc_id,
        |           list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |         FROM batch)),
        | p AS (SELECT b.doc_id AS doc_b,
        |         len(list_intersect(a.g, b.g)) * 1.0
        |           / len(list_distinct(list_concat(a.g, b.g))) AS j
        |       FROM shc a CROSS JOIN shb b),
        | f AS (SELECT * FROM p WHERE j >= 0.9)
        |SELECT (SELECT count(*) FROM batch) AS n_batch,
        | (SELECT count(*) FROM rp) AS n_replayed,
        | (SELECT count(DISTINCT doc_b) FROM f) AS n_batch_matched,
        | (SELECT count(*) FROM f) AS n_pairs_09,
        | (SELECT coalesce(floor(max(j)*10000+0.5)/10000, 0.0) FROM f)
        |   AS max_jaccard,
        | (SELECT count(*) FROM batch) - (SELECT count(DISTINCT doc_b) FROM f)
        |   AS n_batch_new""".stripMargin,

    // d26: the invariant stated independently — portable doc counts from
    // the same filters, n_band_rows = 8 × n_live (one row per band per
    // doc, a fixed 8-array explode), and the certified n_diff = 0 (the
    // Spark side computes the REAL symmetric difference between the
    // incrementally maintained band table and the from-scratch rebuild;
    // the oracle asserts it must be empty — the planted-oracle pattern).
    "d26_band_maintenance" ->
      """WITH doc AS (SELECT doc_id, text FROM documents),
        | base AS (SELECT * FROM doc WHERE doc_id < 200),
        | fresh AS (SELECT * FROM doc WHERE doc_id >= 200 AND doc_id < 260),
        | rp AS (SELECT doc_id + 100000 AS doc_id, text || ' graftdup' AS text
        |        FROM base WHERE doc_id < 40
        |          AND len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20),
        | batch AS (SELECT * FROM fresh UNION ALL SELECT * FROM rp),
        | td AS (SELECT doc_id FROM base WHERE doc_id % 13 = 0),
        | live AS (SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM td)
        |          UNION ALL SELECT * FROM batch)
        |SELECT (SELECT count(*) FROM base) AS n_corpus,
        | (SELECT count(*) FROM batch) AS n_batch,
        | (SELECT count(*) FROM td) AS n_tombstoned,
        | (SELECT count(*) FROM live) AS n_live,
        | (SELECT 8 * count(*) FROM live) AS n_band_rows,
        | CAST(0 AS BIGINT) AS n_diff""".stripMargin,

    // d14: full replica — banner planting, positioned md5 8-grams,
    // cross-doc df >= 2 cut, per-doc interval merge (each repeated
    // span adds min(8, gap to the previous repeated start) — same
    // union length as the position explode it replaced), per-doc left
    // join so fully-unrepeated docs stay in the denominator.
    "d14_verbatim_spans" ->
      s"""WITH pl AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 5 = 0
        |      THEN '${TextQueries.BoilerHeader} ' || text ELSE text END AS text
        |  FROM documents),
        | tk AS (SELECT doc_id, lang,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |        FROM pl),
        | m AS (SELECT doc_id, lang, tk, len(tk) AS n FROM tk),
        | g AS (SELECT doc_id, lang, tk,
        |         unnest(range(0, n - 7)) AS i
        |       FROM m WHERE n >= 8),
        | g2 AS (SELECT doc_id, lang, i,
        |          md5(array_to_string(list_slice(tk, i + 1, i + 8), ' ')) AS gm
        |        FROM g),
        | rep AS (SELECT gm FROM (
        |           SELECT gm, count(DISTINCT doc_id) AS df
        |           FROM g2 GROUP BY gm) WHERE df >= 2),
        | hit AS (SELECT doc_id, lang, i FROM g2
        |         WHERE gm IN (SELECT gm FROM rep)),
        | iv AS (SELECT doc_id, lang,
        |          i - lag(i) OVER (PARTITION BY doc_id, lang ORDER BY i)
        |            AS gap
        |        FROM hit),
        | mk AS (SELECT doc_id, lang,
        |          CAST(sum(CASE WHEN gap IS NULL OR gap >= 8
        |                        THEN 8 ELSE gap END) AS BIGINT) AS masked
        |        FROM iv GROUP BY doc_id, lang),
        | per AS (SELECT m.lang, m.n, coalesce(mk.masked, 0) AS masked
        |         FROM m LEFT JOIN mk USING (doc_id, lang))
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(CASE WHEN masked > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_docs_with_repeats,
        | CAST(sum(n) AS BIGINT) AS sum_tokens,
        | CAST(sum(masked) AS BIGINT) AS sum_masked_tokens,
        | floor((CAST(sum(masked) AS DOUBLE) / CAST(sum(n) AS DOUBLE))
        |       * 10000 + 0.5) / 10000 AS masked_frac
        |FROM per GROUP BY lang ORDER BY lang""".stripMargin,

    // d28: d14's detection CTEs + the excision — per-doc repeated-start
    // list, covered-position set (range(st, st+8) half-open = Spark's
    // inclusive sequence(st, st+7)), kept tokens re-indexed 1-based
    // (tk[i+1] here, 0-based tk[i] in Spark), reassembly pinned by
    // min/max md5 and the banner's post-removal frequency.
    "d28_verbatim_removal" ->
      s"""WITH pl AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 5 = 0
        |      THEN '${TextQueries.BoilerHeader} ' || text ELSE text END AS text
        |  FROM documents),
        | m AS (SELECT doc_id, lang, text,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS tk,
        |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
        |       FROM pl),
        | g2 AS (SELECT doc_id, i,
        |          md5(array_to_string(list_slice(tk, i + 1, i + 8), ' ')) AS gm
        |        FROM (SELECT doc_id, tk, unnest(range(0, n - 7)) AS i
        |              FROM m WHERE n >= 8)),
        | rep AS (SELECT gm FROM (
        |           SELECT gm, count(DISTINCT doc_id) AS df
        |           FROM g2 GROUP BY gm) WHERE df >= 2),
        | st AS (SELECT doc_id, list(i) AS starts FROM g2
        |        WHERE gm IN (SELECT gm FROM rep) GROUP BY doc_id),
        | cl AS (SELECT m.lang, m.text, m.n,
        |          list_distinct(flatten(list_transform(
        |            coalesce(st.starts, []), s -> range(s, s + 8))))
        |            AS covered
        |        FROM m LEFT JOIN st USING (doc_id)),
        | cl2 AS (SELECT lang, text, n, covered,
        |           list_transform(list_filter(range(0, n),
        |             i -> NOT list_contains(covered, i)), i -> tk2[i + 1])
        |             AS kept
        |         FROM (SELECT *, list_filter(string_split(text, ' '),
        |                 x -> x <> '') AS tk2 FROM cl)),
        | fin AS (SELECT lang, text, n,
        |           len(covered) AS n_cov, len(kept) AS n_kept,
        |           array_to_string(kept, ' ') AS cleaned_text
        |         FROM cl2)
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(CASE WHEN n_cov > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_docs_rewritten,
        | CAST(sum(CASE WHEN n_cov > 0 AND n_kept = 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_docs_emptied,
        | CAST(sum(n) AS BIGINT) AS sum_tokens_before,
        | CAST(sum(n_cov) AS BIGINT) AS sum_tokens_removed,
        | CAST(sum(n_kept) AS BIGINT) AS sum_tokens_after,
        | CAST(sum(CASE WHEN contains(text, '${TextQueries.BoilerHeader}')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_banner_before,
        | CAST(sum(CASE WHEN contains(cleaned_text,
        |   '${TextQueries.BoilerHeader}') THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_banner_after,
        | min(md5(cleaned_text)) AS min_cleaned_md5,
        | max(md5(cleaned_text)) AS max_cleaned_md5
        |FROM fin GROUP BY lang ORDER BY lang""".stripMargin,

    "d01_exact_dedup" ->
      """WITH g AS (SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keeper
        |           FROM documents GROUP BY md5(text))
        |SELECT count(*) AS n_unique_texts,
        | CAST(sum(n) AS BIGINT) AS n_docs,
        | CAST(sum(n) - count(*) AS BIGINT) AS n_exact_dups,
        | CAST(max(n) AS BIGINT) AS largest_group
        |FROM g""".stripMargin,

    // d04 is pure string/list SQL (no engine-private hash), so the whole
    // salted pipeline — including the prefix-hash sub-bucketing — is
    // replicated verbatim in DuckDB (BlockCap interpolated so tuning
    // the Scala constant can't desynchronize the replica).
    "d04_ngram_jaccard" ->
      s"""WITH gr AS (
        |  SELECT min(doc_id) AS doc_id, lang,
        |    CAST(floor(n_chars / 64) AS BIGINT) AS lbucket,
        |    min(text) AS text, count(*) AS gsize
        |  FROM documents
        |  GROUP BY lang, CAST(floor(n_chars / 64) AS BIGINT), md5(text)),
        | g AS (
        |  SELECT doc_id, lang, lbucket,
        |    list_distinct(CASE WHEN length(text) >= 5
        |      THEN list_transform(range(1, length(text) - 3),
        |                          i -> substring(text, i, 5))
        |      ELSE [text] END) AS g,
        |    ${graft.operators.Sampling.portableGateSql(
             "substring(text, 1, 32)")} AS pint
        |  FROM gr),
        | sz AS (
        |  SELECT lang, lbucket, count(*) AS bn FROM g GROUP BY lang, lbucket),
        | s AS (
        |  SELECT g.*, pint % CAST((bn + ${BlockCap - 1}) // $BlockCap AS INTEGER) AS sub
        |  FROM g JOIN sz USING (lang, lbucket)),
        | p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_intersect(a.g, b.g)) * 1.0
        |           / len(list_distinct(list_concat(a.g, b.g))) AS jaccard
        |  FROM s a JOIN s b
        |    ON a.lang = b.lang AND a.lbucket = b.lbucket AND a.sub = b.sub
        |   AND a.doc_id < b.doc_id),
        | wp AS (SELECT p.*, ga.gsize AS ga, gb.gsize AS gb
        |        FROM p JOIN gr ga ON ga.doc_id = p.doc_a
        |               JOIN gr gb ON gb.doc_id = p.doc_b),
        | cx AS (SELECT
        |    CAST(coalesce(sum(ga * gb), 0) AS BIGINT) AS n_cross,
        |    CAST(coalesce(sum(CASE WHEN jaccard >= 0.3 THEN ga * gb
        |                      ELSE 0 END), 0) AS BIGINT) AS sim_cross,
        |    coalesce(sum(jaccard * ga * gb), 0.0) AS jsum_cross,
        |    max(jaccard) AS max_cross
        |  FROM wp),
        | wi AS (SELECT CAST(coalesce(sum(gsize * (gsize - 1) // 2), 0)
        |            AS BIGINT) AS coll_within,
        |          max(CASE WHEN gsize >= 2 THEN 1.0 END) AS max_within
        |        FROM gr)
        |SELECT CAST(cx.n_cross + wi.coll_within AS BIGINT)
        |   AS n_pairs_compared,
        | CAST(cx.sim_cross + wi.coll_within AS BIGINT) AS n_sim_03,
        | floor(greatest(coalesce(cx.max_cross, 0.0),
        |   coalesce(wi.max_within, 0.0))*10000+0.5)/10000 AS max_jaccard,
        | CASE WHEN cx.n_cross + wi.coll_within = 0 THEN 0.0
        |   ELSE floor(((cx.jsum_cross + wi.coll_within)
        |     / (cx.n_cross + wi.coll_within))*10000+0.5)/10000 END
        |   AS avg_jaccard
        |FROM cx, wi""".stripMargin,
    // d02/d03: LSH banding and bit sketches are not reproducible in
    // DuckDB SQL (xxhash64/murmur internals) → rows-only checks. d06
    // closes the gap for d02: the same Spark pipeline runs on a
    // planted-duplicate corpus whose ground-truth pair counts DuckDB
    // brute-forces below (all pairs, string shingles — no LSH).
    // d09: DuckDB rebuilds the identical jaccard edge set (portable
    // string shingles, double division on both engines) and resolves
    // components with a recursive CTE instead of label propagation —
    // same graph, independent algorithm. The corpus + edge + component
    // CTE prefix is [[DupGraphCteSql]], shared with d17/d25 so the
    // three consumers can never drift onto different ground-truth
    // graphs.
    "d09_dup_clusters" ->
      s"""WITH RECURSIVE
        |$DupGraphCteSql,
        | cl AS (SELECT lbl, count(*) AS sz FROM lab GROUP BY lbl)
        |SELECT count(*) AS n_clusters,
        | CAST(sum(sz) AS BIGINT) AS n_clustered_docs,
        | CAST(max(sz) AS BIGINT) AS largest_cluster,
        | CAST(sum(sz - 1) AS BIGINT) AS n_dups_to_drop
        |FROM cl""".stripMargin,

    // d25: the shared ground-truth graph extended with the 1/size
    // micro-unit weight rule — exact int64 effective-size accounting.
    "d25_soft_dedup" ->
      s"""WITH RECURSIVE
        |$DupGraphCteSql,
        | sz AS (SELECT lbl, count(*) AS sz FROM lab GROUP BY lbl),
        | dsz AS (SELECT lab.node AS doc_id, sz.sz FROM lab
        |         JOIN sz USING (lbl)),
        | wt AS (
        |  SELECT c.doc_id,
        |    len(list_filter(string_split(c.text, ' '), x -> x <> ''))
        |      AS ntok,
        |    coalesce(dsz.sz, 1) AS sz,
        |    CAST(floor(1000000.0 / coalesce(dsz.sz, 1)) AS BIGINT) AS w_e6
        |  FROM c LEFT JOIN dsz USING (doc_id))
        |SELECT count(*) AS n_docs,
        | CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_in_clusters,
        | CAST(sum(ntok) AS BIGINT) AS raw_tokens,
        | CAST(sum(w_e6) AS BIGINT) AS effective_docs_e6,
        | CAST(sum(ntok * w_e6) AS BIGINT) AS effective_tokens_e6,
        | CAST(max(sz) AS BIGINT) AS largest_cluster
        |FROM wt""".stripMargin,

    // d27: the shared ground-truth graph extended with the portable
    // gate applied per-unit (component label, own id if unclustered)
    // vs per-doc — the unit policy's straddle count must be 0 and the
    // naive policy's leak is counted, both engines computing the
    // identical gate arithmetic.
    "d27_leakage_safe_split" ->
      s"""WITH RECURSIVE
        |$DupGraphCteSql,
        | u AS (
        |  SELECT c.doc_id, lab.lbl,
        |    coalesce(lab.lbl, c.doc_id) AS unit
        |  FROM c LEFT JOIN lab ON lab.node = c.doc_id),
        | g AS (
        |  SELECT doc_id, lbl, unit,
        |    CASE WHEN (${graft.operators.Sampling.portableGateSql(
               "CAST(unit AS VARCHAR) || ':split'")}) % 10 < 2
        |      THEN 1 ELSE 0 END AS ev_u,
        |    CASE WHEN (${graft.operators.Sampling.portableGateSql(
               "CAST(doc_id AS VARCHAR) || ':split'")}) % 10 < 2
        |      THEN 1 ELSE 0 END AS ev_n
        |  FROM u),
        | su AS (
        |  SELECT lbl, count(DISTINCT ev_u) AS du,
        |    count(DISTINCT ev_n) AS dn, count(*) AS sz
        |  FROM g WHERE lbl IS NOT NULL GROUP BY lbl)
        |SELECT (SELECT count(*) FROM g) AS n_docs,
        | (SELECT count(*) FROM g WHERE lbl IS NOT NULL) AS n_clustered,
        | (SELECT CAST(sum(ev_u) AS BIGINT) FROM g) AS n_eval_unit,
        | (SELECT CAST(sum(ev_n) AS BIGINT) FROM g) AS n_eval_naive,
        | (SELECT count(*) FROM su) AS n_clusters,
        | (SELECT CAST(coalesce(sum(CASE WHEN du > 1 THEN 1 ELSE 0 END),
        |    0) AS BIGINT) FROM su) AS n_straddle_unit,
        | (SELECT CAST(coalesce(sum(CASE WHEN dn > 1 THEN 1 ELSE 0 END),
        |    0) AS BIGINT) FROM su) AS n_straddle_naive,
        | (SELECT CAST(coalesce(sum(CASE WHEN dn > 1 THEN sz END), 0)
        |    AS BIGINT) FROM su) AS n_docs_leaky_naive""".stripMargin,

    // d17: the d09 recursive-CTE replica ([[DupGraphCteSql]]) extended
    // with the keeper rule (node = lbl) and token accounting — ground
    // truth for the end-to-end prune, independent of the
    // label-propagation code.
    "d17_keeper_resolution" ->
      s"""WITH RECURSIVE
        |$DupGraphCteSql,
        | st AS (SELECT doc_id, len(tk) AS ntok FROM t),
        | drp AS (SELECT node AS doc_id FROM lab WHERE node <> lbl),
        | ds AS (SELECT st.ntok FROM st JOIN drp USING (doc_id)),
        | sv AS (SELECT st.ntok FROM st
        |        WHERE doc_id NOT IN (SELECT doc_id FROM drp))
        |SELECT (SELECT count(*) FROM c) AS n_corpus,
        | (SELECT count(*) FROM lab) AS n_clustered,
        | (SELECT count(DISTINCT lbl) FROM lab) AS n_keepers,
        | (SELECT count(*) FROM ds) AS n_dropped,
        | (SELECT CAST(coalesce(sum(ntok), 0) AS BIGINT) FROM ds)
        |   AS tokens_dropped,
        | (SELECT count(*) FROM sv) AS n_survivors,
        | (SELECT CAST(sum(ntok) AS BIGINT) FROM sv) AS tokens_kept""".stripMargin,

    // d08: recall on exact-copy plants is structural (identical text ⇒
    // identical simhash ⇒ band collision), so ground truth is simply
    // the identical-text pair count of the augmented corpus — no
    // sketch math needed on the DuckDB side.
    "d08_simhash_planted" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        | pl AS (SELECT doc_id + 100000 AS doc_id, text FROM base WHERE doc_id < 40),
        | c AS (SELECT * FROM base UNION ALL SELECT * FROM pl)
        |SELECT (SELECT count(*) FROM c) AS n_docs,
        | (SELECT count(*) FROM pl) AS n_planted,
        | (SELECT count(*) FROM c a JOIN c b
        |    ON a.doc_id < b.doc_id AND a.text = b.text) AS n_exact_pairs""".stripMargin,

    "d06_minhash_planted" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        | pl AS (
        |  SELECT doc_id + 100000 AS doc_id, text || ' graftdup' AS text
        |  FROM base
        |  WHERE doc_id < 40
        |    AND len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20),
        | c AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
        | t AS (SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |       FROM c),
        | sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(tk) >= 3
        |    THEN list_transform(range(1, len(tk) - 1),
        |                        i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))
        |    ELSE [array_to_string(tk, ' ')] END) AS s
        |  FROM t),
        | p AS (
        |  SELECT b.doc_id AS doc_b,
        |         len(list_intersect(a.s, b.s)) * 1.0
        |           / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT (SELECT count(*) FROM c) AS n_docs,
        | (SELECT count(*) FROM pl) AS n_planted,
        | CAST(sum(CASE WHEN jaccard >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups_09,
        | CAST(sum(CASE WHEN jaccard >= 0.9 AND doc_b >= 100000 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_planted_09,
        | floor((max(CASE WHEN jaccard >= 0.9 THEN jaccard END))*10000+0.5)/10000
        |   AS max_jaccard_09
        |FROM p""".stripMargin,

    // d11: DuckDB cannot rebuild the xxhash simhash sketch, so the
    // oracle states the pipeline-independent ground truth directly —
    // the planted census, with recall and the hamming-≤8 gate asserted
    // at 100% of it (deterministic-empirical, same stance as d06; the
    // Spark side goes red the moment the band join misses ONE pair).
    "d11_simhash_neardup" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        | pl AS (
        |  SELECT doc_id + 100000 AS doc_id, text || ' graftdup' AS text
        |  FROM base
        |  WHERE doc_id < 40
        |    AND len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20)
        |SELECT (SELECT count(*) FROM base) + (SELECT count(*) FROM pl) AS n_docs,
        | (SELECT count(*) FROM pl) AS n_planted,
        | (SELECT count(*) FROM pl) AS n_planted_recalled,
        | (SELECT count(*) FROM pl) AS n_hamming_le8""".stripMargin,

    // d12: the bloom is a physical optimization (no false negatives,
    // fp killed by the confirm join) — the oracle is the plain hash
    // join it accelerates.
    "d12_incremental_dedup" ->
      """WITH a AS (SELECT doc_id, md5(text) AS h FROM documents),
        | corpus AS (SELECT DISTINCT h FROM a WHERE doc_id % 5 < 3),
        | bh AS (SELECT h, count(*) AS n FROM a WHERE doc_id % 5 >= 3 GROUP BY h),
        | dup AS (SELECT bh.h, bh.n FROM bh JOIN corpus USING (h))
        |SELECT (SELECT CAST(sum(n) AS BIGINT) FROM bh) AS n_batch,
        | CAST(coalesce((SELECT sum(n) FROM dup), 0) AS BIGINT) AS n_dup_vs_corpus,
        | CAST((SELECT sum(n) FROM bh) - coalesce((SELECT sum(n) FROM dup), 0)
        |   - ((SELECT count(*) FROM bh) - (SELECT count(*) FROM dup)) AS BIGINT)
        |   AS n_batch_dups,
        | CAST((SELECT count(*) FROM bh) - (SELECT count(*) FROM dup) AS BIGINT)
        |   AS n_unique_new""".stripMargin,

    // d24: full replica — same scurve: doc sample, head-keep planting
    // with unique fillers, mh<j>: signature family, band-match CASEs,
    // and multiplication-chain theory values (never pow()).
    "d24_lsh_scurve" -> {
      def capSql(r: Int): String = {
        val bands = (0 until 16 / r).map(bi =>
          "(" + (0 until r).map(i =>
            s"pa[${bi * r + i + 1}] = pb[${bi * r + i + 1}]")
            .mkString(" AND ") + ")").mkString(" OR ")
        s"CASE WHEN $bands THEN 1 ELSE 0 END"
      }
      def powChain(x: String, e: Int): String = e match {
        case 2 => s"($x*$x)"
        case 4 => s"(${powChain(x, 2)}*${powChain(x, 2)})"
        case 8 => s"(${powChain(x, 4)}*${powChain(x, 4)})"
      }
      def segSql(r: Int): String = {
        val mid = "((2*j_decile + 1) / 20.0)"
        val th = s"(1.0 - ${powChain(s"(1.0 - ${powChain(mid, r)})", 16 / r)})"
        s"""SELECT $r AS r, CAST(j_decile AS INTEGER) AS j_decile,
          |  n_pairs, cap$r AS n_captured,
          |  floor((CAST(cap$r AS DOUBLE)/n_pairs)*10000+0.5)/10000
          |    AS capture_e4,
          |  floor(($th)*10000+0.5)/10000 AS theory_e4
          |FROM agg""".stripMargin
      }
      val sig = (1 to 16).map(j =>
        "list_min(list_transform(s, x -> " +
          graft.operators.Sampling.portableGateSql(s"'mh$j:' || x") +
          "))").mkString(",\n    ")
      s"""WITH t0 AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |  WHERE ${graft.operators.Sampling.portableGateSql(
             "'scurve:' || doc_id")} % 16 = 0),
        | t1 AS (SELECT doc_id, toks FROM t0 WHERE len(toks) >= 20),
        | plk AS (SELECT doc_id, toks,
        |    CAST((len(toks) * (20 + 20*(doc_id % 5))) // 100 AS INT) AS k
        |  FROM t1),
        | pl AS (SELECT doc_id + 500000 AS nid,
        |    list_concat(toks[1:k],
        |      list_transform(range(1, len(toks) - k + 1),
        |                     i -> 'z' || doc_id || 'x' || i)) AS toks
        |  FROM plk),
        | c AS (SELECT doc_id, toks FROM t1
        |       UNION ALL SELECT nid AS doc_id, toks FROM pl),
        | sh AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) AS s
        |  FROM c),
        | pm AS (SELECT doc_id, s, [$sig] AS pmin FROM sh),
        | p AS (SELECT
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)
        |      AS jaccard,
        |    a.pmin AS pa, b.pmin AS pb
        |  FROM pm a JOIN pm b ON a.doc_id < b.doc_id),
        | pd AS (SELECT least(CAST(floor(jaccard*10) AS INT), 9) AS j_decile,
        |    ${capSql(2)} AS c2, ${capSql(4)} AS c4, ${capSql(8)} AS c8
        |  FROM p),
        | agg AS (SELECT j_decile, count(*) AS n_pairs,
        |    CAST(sum(c2) AS BIGINT) AS cap2,
        |    CAST(sum(c4) AS BIGINT) AS cap4,
        |    CAST(sum(c8) AS BIGINT) AS cap8
        |  FROM pd GROUP BY 1)
        |${segSql(2)}
        |UNION ALL
        |${segSql(4)}
        |UNION ALL
        |${segSql(8)}
        |ORDER BY r, j_decile""".stripMargin
    },

    // d29: the shared DupGraphCteSql ground-truth components, the
    // shared qcCteSql perceptron replica (ww{QcRounds} = the FROZEN
    // t44 weights — the oracle retrains them exactly as t44's oracle
    // does, so the election is certified against independently-derived
    // weights, not the Spark model), and the raw-feature CTE over the
    // planted dup corpus. Keeper = argmax(margin, id); delta vs the
    // min-id rule; exact integer sums throughout.
    "d29_quality_keeper" -> {
      import graft.queries.{TextQueries => TQ}
      s"""WITH RECURSIVE ${TQ.qcCteSql},
        |${DupGraphCteSql},
        | ${TQ.qcRawFeatureCteSql("c", "d29")},
        | d29m AS (SELECT doc_id,
        |     (w1*x1 + w2*x2 + w3*x3 + w4*x4 + w5*x5) AS margin, ntok
        |   FROM d29qx, ww${TQ.QcRounds}),
        | d29cl AS (SELECT lab.node, lab.lbl, m.margin, m.ntok
        |   FROM lab JOIN d29m m ON m.doc_id = lab.node),
        | d29rk AS (SELECT *, row_number()
        |     OVER (PARTITION BY lbl ORDER BY margin DESC, node) AS krn
        |   FROM d29cl),
        | d29per AS (SELECT k.lbl, k.node AS keeper_q,
        |     k.margin AS kq_margin, m.margin AS km_margin
        |   FROM (SELECT * FROM d29rk WHERE krn = 1) k
        |   JOIN d29cl m ON m.lbl = k.lbl AND m.node = m.lbl)
        |SELECT
        | CAST((SELECT count(*) FROM d29per) AS BIGINT) AS n_clusters,
        | CAST((SELECT count(*) FROM d29cl) AS BIGINT) AS n_clustered_docs,
        | CAST((SELECT sum(CASE WHEN keeper_q <> lbl THEN 1 ELSE 0 END)
        |   FROM d29per) AS BIGINT) AS n_changed_keepers,
        | CAST((SELECT sum(lbl) FROM d29per) AS BIGINT)
        |   AS keeper_min_id_sum,
        | CAST((SELECT sum(keeper_q) FROM d29per) AS BIGINT)
        |   AS keeper_q_id_sum,
        | CAST((SELECT sum(kq_margin - km_margin) FROM d29per) AS BIGINT)
        |   AS margin_gain_total,
        | CAST((SELECT sum(CASE WHEN node <> lbl THEN ntok ELSE 0 END)
        |   FROM d29cl) AS BIGINT) AS tokens_dropped_min,
        | CAST((SELECT sum(CASE WHEN krn <> 1 THEN ntok ELSE 0 END)
        |   FROM d29rk) AS BIGINT) AS tokens_dropped_q""".stripMargin
    },
  )
}
