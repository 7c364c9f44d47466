package graft.queries

import graft.Tables
import graft.operators.Materialize.MaterializeOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline, over the
  * `documents` table: token counting, quality scoring, heuristic
  * language ID, and document fingerprinting. Every step is pure Column
  * arithmetic (whole-stage codegen, no UDFs) and aggregates map-side
  * before the shuffle, so each scales linearly with the corpus.
  *
  * All four have exact DuckDB oracles: the per-document metrics are
  * deterministic string ops mirrored verbatim in SQL.
  */
object TextQueries {

  private def rnd(c: Column, n: Int): Column = RelationalQueries.rnd(c, n)

  /** t09 chunking window/stride (tokens). 64-token windows at stride 48
    * = 16 tokens of overlap between consecutive chunks. */
  val ChunkW = 64
  val ChunkS = 48

  /** t17 boilerplate chunking width (tokens) and corpus doc-frequency
    * threshold: a chunk appearing verbatim in >= [[BoilerK]] distinct
    * docs is template noise, not content. The planted header is exactly
    * [[BoilerW]] tokens so it aligns at chunk 0 of every planted doc
    * (a real corpus aligns on newlines instead). */
  val BoilerW = 8
  val BoilerK = 8
  val BoilerHeader = "graft corpus license banner terms of use notice"

  /** t18 α=0.5 temperature normalizer — a fixed config constant, not a
    * data-dependent Σ (see the t18 scaladoc for the IEEE argument). */
  val TempMixC = 50.0

  /** t28 dedup chunk width (tokens, non-overlapping). */
  val ChunkDedupW = 16

  /** t34 sample budget: exactly this many PPS hits per language. */
  val PpsK = 40

  /** t40 permutation count: R = 19 random relabelings beside the
    * observed one, so the achievable p floor is exactly
    * 1/(R+1) = 0.05 — the smallest R whose floor meets the
    * conventional gate (raise for finer p resolution; cost is one
    * extra census-mass multiple per permutation). */
  val PermR = 19

  /** t33 content-defined chunking: target average chunk length — a
    * token closes a chunk when the 24-bit portable gate of its trailing
    * 3-token window ≡ 0 (mod this), so boundaries fire at rate 1/A. */
  val CdcAvgChunk = 8

  /** t42 merge-learning rounds: fixed N (the d21/s07 unrolled-round
    * discipline) so the whole iterative build keeps a strict hash
    * oracle. A production build iterates to a vocab-size target. */
  val BpeRounds = 8

  /** t46 token-denominated temperature normalizer — the [[TempMixC]]
    * analog for token masses (token mass ≈ 0.74 × char mass on this
    * corpus, so 40 yields keep rates comparable to the char path's 50;
    * a fixed config constant for the same IEEE reason as TempMixC). */
  val TokMixC = 40.0

  /** t44/t45 learned-quality-classifier config: perceptron rounds
    * (training error hits zero by round 6 on the planted corpus at all
    * three SFs — measured, see the t44 scaladoc) and the planted
    * negative: every doc_id % 5 == 0 doc's text is replaced by the
    * [[BoilerHeader]] banner repeated [[QcBannerReps]] times — the
    * template-noise document a quality model must learn to reject
    * (type-token ratio 8/48 ≈ 0.17, below the corpus minimum 0.28). */
  val QcRounds = 8
  val QcBannerReps = 6

  /** Whitespace tokens, Go-/DuckDB-compatible splitting (consecutive
    * separators produce empty tokens in both engines; filtered out). */
  private def tokens: Column =
    filter(split(col("text"), " "), t => t =!= "")

  private val StopWords = Seq("the", "a", "of", "and", "to", "in")

  /** Marker words per language for the n-gram/stopword-style heuristic
    * classifier (the synthetic corpus shares one vocabulary, so this
    * demonstrates the operator shape; accuracy is data-bound). */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "das"),
    "es" -> Seq("el", "los", "que"),
    "fr" -> Seq("le", "les", "une"),
    "zh" -> Seq("de5", "shi4", "le5"))

  /** t44/t45 shared feature pass: plant the negatives, then one corpus
    * scan producing the e4 fixed-point feature vector per doc (see
    * [[graft.operators.QualityPerceptron]] for the arithmetic
    * portability argument) plus the carry columns the audit reads
    * (source, y, pass_t13 — the t13 heuristic verdict on the SAME
    * planted corpus, for the disagreement census). Caller materializes:
    * the learner re-reads this frame once per round. */
  private def qcFeatures(s: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(s, d)
      .withColumn("text",
        when(col("doc_id") % 5 === 0,
          concat_ws(" ", (1 to QcBannerReps).map(_ => lit(BoilerHeader)): _*))
          .otherwise(col("text")))
    val base = planted
      .withColumn("toks", tokens)
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("ns",
        length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("nstop", size(array_intersect(array_distinct(col("toks")),
        array(StopWords.map(lit): _*))))
      .withColumn("digit_frac",
        size(filter(col("toks"), t => t.rlike("[0-9]"))).cast("double") /
          col("n"))
    def ratio(num: Column): Column =
      when(col("n") > 0, floor(num)).otherwise(0L).cast("long")
    base.select(col("doc_id"), col("source"),
      when(col("doc_id") % 5 === 0, -1L).otherwise(1L).as("y"),
      (least(col("n"), lit(100L)) * 100L).as("x1"),
      ratio(lit(10000.0) * size(array_distinct(col("toks"))) / col("n"))
        .as("x2"),
      ratio(lit(10000.0) *
        size(filter(col("toks"), t => t.isin(StopWords: _*))) / col("n"))
        .as("x3"),
      ratio(least(col("ns").cast("double") / col("n"), lit(10.0)) * 1000.0)
        .as("x4"),
      lit(10000L).as("x5"),
      (col("n").between(20, 1000) &&
        (col("ns").cast("double") / col("n")).between(3.0, 10.0) &&
        col("nstop") >= 2 && col("digit_frac") <= 0.2).as("pass_t13"))
  }

  /** Memoized t42 merge-table build — the r19 verdict's cross-query
    * shared-build ask: within one sweep the SAME 8-row merge table was
    * independently re-learned from the IDENTICAL corpus fold by t42,
    * t43, t46, and e25 (~4× the roster's single most expensive
    * iterative build). This routes all four through one
    * [[graft.operators.BuildMemo]] entry keyed on (corpus dir,
    * [[BpeRounds]]): the learn loop executes once per session and its
    * COLLECTED table (BpeRounds rows × 6 cols — the bounded
    * scalar-read discipline) serves every consumer, so the published
    * plans carry the merge VALUES as literals/local rows and are
    * identical on memo hit and miss (PLAN_DIGESTS stays
    * order-independent). The canonical corpus fold lives HERE, inside
    * the build closure — consumers structurally cannot learn from a
    * different fold. Row: (merge_round, l_sym, r_sym, pair_n,
    * tokens_after, vocab_after). */
  private[graft] def bpeLearnTable(s: SparkSession, d: String)
      : Seq[(Int, String, String, Long, Long, Long)] =
    graft.operators.BuildMemo.memo(s, s"bpe:$d:$BpeRounds") {
      val words = Tables.documents(s, d)
        .select(explode(tokens).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      graft.operators.BpeMerge.learn(words, BpeRounds)
        .orderBy("merge_round")
        .collect().toSeq
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
    }

  /** The frozen (l_sym, r_sym) merge list of [[bpeLearnTable]] — what
    * [[graft.operators.BpeMerge.applyMerges]] consumers fold into
    * their static replace chains (t43/t46/e25). */
  private[graft] def bpeMerges(s: SparkSession, d: String)
      : Seq[(String, String)] =
    bpeLearnTable(s, d).map(t => (t._2, t._3))

  /** Memoized t44/t45 feature frame (doc-count-sized, so a parquet
    * handoff rather than a driver collect): one corpus scan shared by
    * the learn build, the t45 scoring pass, and any future consumer.
    * Returns the parquet path of [[qcFeatures]]' output. */
  private[graft] def qcFeaturesDir(s: SparkSession, d: String): String =
    graft.operators.BuildMemo.memoParquet(s, s"qcfeats:$d") { out =>
      qcFeatures(s, d).write.parquet(s"$out/feats")
    }

  private[graft] def qcFeaturesMemo(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${qcFeaturesDir(s, d)}/feats")

  /** Memoized t44 perceptron training trajectory — the [[bpeLearnTable]]
    * discipline for the quality classifier: one
    * [[graft.operators.QualityPerceptron.learn]] run per (corpus,
    * [[QcRounds]]) serves t44 (the curve), t45 (the final weights),
    * and e26 (the streaming drift monitor's frozen model). Bounded:
    * QcRounds rows × 7 longs. Row: (learn_round, w1..w5, n_mistakes);
    * the FINAL weights are the last row's w1..w5 by the learn
    * contract. */
  private[graft] def qcModel(s: SparkSession, d: String)
      : Seq[(Int, Long, Long, Long, Long, Long, Long)] =
    graft.operators.BuildMemo.memo(s, s"qperc:$d:$QcRounds") {
      val (_, traj) = graft.operators.QualityPerceptron.learn(
        qcFeaturesMemo(s, d), QcRounds)
      traj.orderBy("learn_round")
        .collect().toSeq
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
    }

  /** Final t44 weights as a 1-row (w1..w5) frame for
    * [[graft.operators.QualityPerceptron.score]] — literal longs, so
    * the scoring plan is identical however the model was obtained. */
  private[graft] def qcWeights(s: SparkSession, d: String): DataFrame = {
    val last = qcModel(s, d).last
    import s.implicits._
    Seq((last._2, last._3, last._4, last._5, last._6))
      .toDF("w1", "w2", "w3", "w4", "w5")
  }

  /** Row-local e4 fixed-point quality features x1..x5 over a frame's
    * `text` column AS-IS — the t44 feature recipe WITHOUT the label
    * plant, for scoring real corpora with the frozen model (d29's
    * keeper election, e26's in-stream monitor). The formulas are
    * spec-pinned equal to [[qcFeatures]]' (BuildMemoSpec /
    * PipelineSpec), so every scorer uses the training-time features by
    * construction. Adds x1..x5 (long) and ntok (long); row-local,
    * codegen-friendly, stream-safe (no join, no state). */
  private[graft] def qcRawFeatureCols(df: DataFrame): DataFrame = {
    val base = df
      .withColumn("toks", tokens)
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("ns",
        length(regexp_replace(col("text"), " ", "")).cast("long"))
    def ratio(num: Column): Column =
      when(col("n") > 0, floor(num)).otherwise(0L).cast("long")
    base.withColumn("x1", least(col("n"), lit(100L)) * 100L)
      .withColumn("x2",
        ratio(lit(10000.0) * size(array_distinct(col("toks"))) / col("n")))
      .withColumn("x3", ratio(lit(10000.0) *
        size(filter(col("toks"), t => t.isin(StopWords: _*))) / col("n")))
      .withColumn("x4",
        ratio(least(col("ns").cast("double") / col("n"), lit(10.0))
          * 1000.0))
      .withColumn("x5", lit(10000L))
      .withColumn("ntok", col("n"))
      .drop("toks", "n", "ns")
  }

  /** `w·x` margin as a literal-weight expression over x1..x5 columns —
    * the frozen-model scoring rule (flag ⟺ margin ≤ 0). */
  private[graft] def qcMarginCol(w: (Long, Long, Long, Long, Long))
      : Column =
    col("x1") * lit(w._1) + col("x2") * lit(w._2) +
      col("x3") * lit(w._3) + col("x4") * lit(w._4) +
      col("x5") * lit(w._5)

  /** The frozen final weights as a Scala tuple (bounded driver read —
    * the last [[qcModel]] trajectory row). */
  private[graft] def qcFrozenWeights(s: SparkSession, d: String)
      : (Long, Long, Long, Long, Long) = {
    val last = qcModel(s, d).last
    (last._2, last._3, last._4, last._5, last._6)
  }

  /** DuckDB CTE computing the same raw features over an in-scope
    * (doc_id, text, ...) corpus CTE named `corpus` — yields
    * `${p}qx(doc_id, x1..x5, ntok)`; interpolated beside [[qcCteSql]]
    * (which supplies the trained ww{QcRounds} weights) by the d29 and
    * e26 oracles. The stop-word list interpolates from [[StopWords]]
    * (the m11 discipline). */
  private[graft] def qcRawFeatureCteSql(corpus: String, p: String = "")
      : String =
    s"""${p}qf AS (SELECT *,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS toks,
      |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS ns
      |  FROM $corpus),
      | ${p}qx AS (SELECT * EXCLUDE (toks, ns),
      |    CAST(least(len(toks), 100) * 100 AS BIGINT) AS x1,
      |    CAST(CASE WHEN len(toks) > 0 THEN
      |      floor(10000.0 * len(list_distinct(toks)) / len(toks))
      |      ELSE 0 END AS BIGINT) AS x2,
      |    CAST(CASE WHEN len(toks) > 0 THEN
      |      floor(10000.0 * len(list_filter(toks,
      |        t -> t IN ($stopWordsSql))) / len(toks))
      |      ELSE 0 END AS BIGINT) AS x3,
      |    CAST(CASE WHEN len(toks) > 0 THEN
      |      floor(least(CAST(ns AS DOUBLE) / len(toks), 10.0) * 1000)
      |      ELSE 0 END AS BIGINT) AS x4,
      |    CAST(10000 AS BIGINT) AS x5,
      |    CAST(len(toks) AS BIGINT) AS ntok
      |  FROM ${p}qf)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "t01_token_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), size(tokens).cast("long").as("n_tokens"),
          col("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("sum_tokens"),
          rnd(avg("n_tokens"), 4).as("avg_tokens"),
          rnd(avg("n_chars"), 4).as("avg_chars"),
          max("n_tokens").as("max_tokens"))
        .orderBy("lang")
    }),

    "t02_quality_score" -> ((s, d) => {
      val toks = tokens
      val nTok = size(toks).cast("double")
      val nonSpaceLen = length(regexp_replace(col("text"), " ", "")).cast("double")
      val stopHits = size(filter(toks, t => t.isin(StopWords: _*))).cast("double")
      // quality: penalize very short docs, reward plausible word length
      // and stopword presence — deterministic, mirrored in the oracle.
      val avgTokLen = nonSpaceLen / nTok
      val stopRatio = stopHits / nTok
      val quality = least(nTok / 100.0, lit(1.0)) * 0.4 +
        when(avgTokLen.between(3.0, 8.0), 0.3).otherwise(0.0) +
        least(stopRatio * 3.0, lit(0.3))
      Tables.documents(s, d)
        .select(col("source"), nTok.as("n_tokens"), avgTokLen.as("avg_tok_len"),
          stopRatio.as("stop_ratio"), quality.as("quality"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          rnd(avg("n_tokens"), 4).as("avg_tokens"),
          rnd(avg("avg_tok_len"), 4).as("avg_tok_len"),
          rnd(avg("stop_ratio"), 4).as("avg_stop_ratio"),
          rnd(avg("quality"), 4).as("avg_quality"),
          rnd(min("quality"), 4).as("min_quality"),
          rnd(max("quality"), 4).as("max_quality"))
        .orderBy("source")
    }),

    "t03_langid" -> ((s, d) => {
      val toks = tokens
      def hits(words: Seq[String]): Column =
        size(filter(toks, t => t.isin(words: _*)))
      // argmax over marker-hit counts, ties → 'en' default
      val scored = LangMarkers.foldLeft(lit("en")) { case (acc, (lang, words)) =>
        when(hits(words) > 0, lang).otherwise(acc)
      }
      Tables.documents(s, d)
        .select(col("lang"), scored.as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),

    "t05_bpe_tokens" -> ((s, d) => {
      // BPE-ish pre-tokenization: alnum runs vs punctuation runs (the
      // split GPT-style tokenizers apply before merges); regexp kept in
      // the RE2∩Java-compatible subset so the oracle matches.
      val pieces = regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+|[^a-z0-9 ]+"), lit(0))
      Tables.documents(s, d)
        .select(col("lang"), size(pieces).cast("long").as("n_pieces"),
          size(array_distinct(pieces)).cast("long").as("n_distinct"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_pieces").as("sum_pieces"),
          rnd(avg("n_pieces"), 4).as("avg_pieces"),
          rnd(avg(col("n_distinct").cast("double") / col("n_pieces")), 4)
            .as("avg_distinct_ratio"))
        .orderBy("lang")
    }),

    "t04_fingerprint" -> ((s, d) => {
      // normalization fingerprint: lowercase, strip non-alnum, collapse
      // runs of spaces, md5 — the canonical near-exact-dup key
      val normalized = regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")
      Tables.documents(s, d)
        .select(md5(normalized).as("fp"))
        .groupBy("fp").agg(count(lit(1)).as("n_docs"))
        .agg(count(lit(1)).as("n_fingerprints"),
          sum("n_docs").as("n_docs"),
          sum(when(col("n_docs") > 1, col("n_docs")).otherwise(0)).as("docs_in_dup_groups"),
          max("n_docs").as("largest_group"))
    }),

    /** Vocabulary building: top-5 most frequent tokens per language —
      * explode → count → windowed top-k, the shape of stopword /
      * vocab-table construction over a corpus. The groupBy absorbs the
      * exploded volume map-side before any shuffle; the final window
      * only ranks the (lang, token) aggregate, which is corpus-
      * vocabulary-sized, not corpus-sized. Ties break on the token
      * string so both engines rank identically. */
    "t08_top_tokens" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(col("lang"), explode(tokens).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n").desc, col("token"))
      counts.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("lang"), col("rank"), col("token"), col("n"))
        .orderBy("lang", "rank")
    }),

    /** PII-style redaction: mask every digit run in an identifying
      * column and prove the anonymization both happened (redaction
      * counts, shrunken lengths) and collapsed identity (distinct
      * redacted names per segment drops to the template count). The
      * regex stays in the RE2∩Java-compatible subset so DuckDB applies
      * the identical mask. */
    "t06_redact" -> ((s, d) => {
      val redacted = regexp_replace(col("c_name"), "[0-9]+", "[ID]")
      Tables.customer(s, d)
        .select(col("c_mktsegment"), redacted.as("red"),
          regexp_count(col("c_name"), lit("[0-9]+")).as("n_red"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          sum("n_red").as("n_redactions"),
          countDistinct("red").as("n_distinct_redacted"),
          sum(length(col("red"))).as("sum_red_len"))
        .orderBy("c_mktsegment")
    }),

    /** Document chunking into overlapping token windows — the step that
      * turns raw documents into training-sized sequences (context-window
      * packing). Windows of [[ChunkW]] tokens at stride [[ChunkS]]
      * (ChunkW − ChunkS tokens of overlap); a doc shorter than one
      * window is its own single chunk. The explode fans each doc out to
      * its chunk starts and the per-lang aggregate absorbs the volume
      * map-side — no driver state, no shuffle of chunk text beyond the
      * (tiny) distinct-fingerprint count. Chunk boundaries and the md5
      * content fingerprints are deterministic string math, so the whole
      * chunker is oracle-verified (chunk counts AND content hashes). */
    "t09_chunk_stats" -> ((s, d) => {
      val (w, st) = (ChunkW, ChunkS)
      val docs = Tables.documents(s, d)
        .withColumn("tk", tokens)
        .withColumn("n", size(col("tk")))
      val chunks = docs
        .withColumn("j", explode(sequence(lit(0),
          greatest(ceil((col("n") - w).cast("double") / st).cast("int"), lit(0)))))
        .withColumn("chunk_toks", expr(s"slice(tk, j * $st + 1, $w)"))
        .select(col("lang"), col("doc_id"),
          least(lit(w), col("n") - col("j") * st).as("chunk_len"),
          md5(concat_ws(" ", col("chunk_toks"))).as("chunk_md5"))
      chunks.groupBy("lang")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum("chunk_len").as("sum_chunk_tokens"),
          countDistinct("chunk_md5").as("n_distinct_chunks"),
          rnd(avg("chunk_len"), 4).as("avg_chunk_len"))
        .orderBy("lang")
    }),

    /** TF-IDF scoring: the classic corpus-statistics ranking used for
      * keyword extraction / quality features. df is corpus-global,
      * tf per (lang, token); the idf uses the BM25 rational form
      * (N − df + 0.5)/(df + 0.5) rather than a logarithm because +,×,/
      * on integer-valued doubles are correctly rounded IEEE ops — bit
      * identical across engines — while ln() is libm-dependent and
      * could flip the rank of near-tied scores. Two shuffles (tf agg,
      * df agg), both absorbing the exploded token volume map-side;
      * the final ranking windows over the vocabulary-sized aggregate,
      * never the corpus. */
    "t10_tfidf" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(tokens).as("token"))
      val nDocs = Tables.documents(s, d)
        .agg(count(lit(1)).as("nd"))
      val tf = tok.groupBy("lang", "token").agg(count(lit(1)).as("tf"))
      val df_ = tok.select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      val scored = tf.join(df_, "token").crossJoin(broadcast(nDocs))
        .withColumn("score",
          col("tf") * ((col("nd") - col("df") + 0.5) / (col("df") + 0.5)))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("score").desc, col("token"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("lang"), col("rank"), col("token"), col("tf"), col("df"),
          rnd(col("score"), 4).as("score"))
        .orderBy("lang", "rank")
    }),

    /** Train/eval contamination check: eval documents sharing any word
      * 8-gram with a training document leak test signal — the standard
      * decontamination pass before an eval split ships. The split is
      * the same portable hash gate as t07; 20 eval docs are planted
      * verbatim into the train side (ids +500000) so the detector's
      * recall is measurable against ground truth, not just zero.
      * 8-grams are md5'd before the shuffle (16-byte keys instead of
      * arbitrary-length text) and deduped per side; the detector is one
      * semi join on the gram hash — at corpus scale this is the
      * bloom-join shape, and the semi join keeps eval payloads out of
      * the shuffle. Everything (gate, grams, md5) is portable string
      * math, so contamination counts are oracle-verified end-to-end. */
    "t11_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (train, eval_) = graft.operators.Sampling.splitPortable(docs, "doc_id")
      val plants = eval_.filter(col("doc_id") < 300)
        .select((col("doc_id") + 500000).as("doc_id"), col("lang"), col("text"))
      val trainAll = train.select("doc_id", "lang", "text").unionByName(plants)
      def grams(df: DataFrame): DataFrame = df
        .withColumn("tk", tokens)
        .select(col("doc_id"), col("lang"), explode(expr(
          """CASE WHEN size(tk) >= 8
            | THEN transform(sequence(1, size(tk) - 7),
            |                i -> md5(concat_ws(' ', slice(tk, i, 8))))
            | ELSE array(md5(concat_ws(' ', tk))) END""".stripMargin)).as("g"))
      val trainGrams = grams(trainAll).select("g").distinct()
      val contaminated = grams(eval_)
        .select("doc_id", "lang", "g").distinct()
        .join(trainGrams, Seq("g"), "left_semi")
        .select("doc_id", "lang").distinct()
      val evalByLang = eval_.groupBy("lang").agg(count(lit(1)).as("n_eval_docs"))
      val contamByLang = contaminated.groupBy("lang").agg(count(lit(1)).as("n_contaminated"))
      evalByLang.join(contamByLang, Seq("lang"), "left")
        .select(col("lang"), col("n_eval_docs"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
          rnd(coalesce(col("n_contaminated"), lit(0L)).cast("double") /
            col("n_eval_docs"), 4).as("contamination_rate"))
        .orderBy("lang")
    }),

    /** Reproducible train/eval split via the engine-portable hash gate
      * ([[graft.operators.Sampling.splitPortable]]): the same row lands
      * on the same side on any engine and any partitioning, which is
      * what makes a split a versionable artifact. The oracle recomputes
      * the gate in DuckDB and must agree on every per-(split, lang)
      * count — not just the fractions. */
    "t07_split_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (train, eval_) = graft.operators.Sampling.splitPortable(docs, "doc_id")
      train.withColumn("split", lit("train"))
        .unionByName(eval_.withColumn("split", lit("eval")))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"))
        .orderBy("split", "lang")
    }),

    /** Gopher-style repetition filters: per-doc duplicate-2-gram
      * fraction (how much of the doc is repeated word pairs) and
      * top-token fraction (how much is one repeated token). The 2-gram
      * path is pure array math inside the row — no explode, no
      * shuffle; the top-token path explodes but aggregates map-side to
      * (doc, token) then (doc), so shuffled volume is vocabulary-
      * bounded per doc. The doc_id join of the two per-doc metrics is
      * an equi-join both sides already partition on. Flag thresholds
      * (dup2 > 0.05, top > 0.1) mark docs a training pipeline would
      * drop. */
    "t12_repetition" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), tokens.as("toks"))
      // sequence(0, n-2) would run DESCENDING for n<2 (Spark generates
      // backwards when start>stop) — guard short docs to an empty array
      val perDoc = base.withColumn("n", size(col("toks")))
        .withColumn("grams", when(col("n") >= 2,
          transform(sequence(lit(0), col("n") - 2),
            i => concat_ws(" ",
              element_at(col("toks"), i + 1), element_at(col("toks"), i + 2))))
          .otherwise(array().cast("array<string>")))
        .withColumn("dup2", when(size(col("grams")) > 0,
          lit(1.0) - size(array_distinct(col("grams"))).cast("double") /
            size(col("grams"))).otherwise(lit(0.0)))
        .select("doc_id", "lang", "n", "dup2")
      val top = base.select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_cnt"))
      val topFrac = col("top_cnt").cast("double") / col("n")
      perDoc.join(top, "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          rnd(avg("dup2"), 4).as("avg_dup2"),
          rnd(avg(topFrac), 4).as("avg_topfrac"),
          sum(when(col("dup2") > 0.05, 1).otherwise(0)).cast("long")
            .as("n_flag_dup"),
          sum(when(topFrac > 0.1, 1).otherwise(0)).cast("long")
            .as("n_flag_top"))
        .orderBy("lang")
    }),

    /** Training-shard packing: lay documents end-to-end in a canonical
      * (lang, doc_id) order and cut 4096-token shards at token offsets
      * — the step that turns a cleaned corpus into fixed-budget
      * training files. The token offsets come from
      * [[graft.operators.PrefixScan.runningSum]], the two-pass
      * distributed scan — NOT from a `Window.partitionBy(lang)` running
      * sum, whose ≤5-partition total order would funnel each language
      * through one task at any scale. A document lands in the shard its
      * first token falls in (documents can straddle shard boundaries —
      * offset packing, the deterministic variant of greedy packing).
      * Integer token counts keep the scan cross-engine exact; the
      * oracle recomputes the same offsets with a plain SQL window. */
    "t14_shard_pack" -> ((s, d) => {
      val B = 4096L // shard token budget
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          size(tokens).cast("long").as("n_tok"))
      val scanned = graft.operators.PrefixScan.runningSum(
        docs, group = Seq("lang"), order = Seq("doc_id"),
        value = "n_tok", out = "cum_tok")
      scanned
        .withColumn("shard", expr(s"(cum_tok - n_tok) div $B"))
        .groupBy("lang", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("sum_tokens"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"))
        .orderBy("lang", "shard")
    }),

    /** C4/Gopher-style quality gate battery: per-doc boolean gates
      * (token count in range, mean word length in range, ≥2 distinct
      * stopwords, digit-token fraction below cap) aggregated to pass
      * counts per source. Everything is row-local Column math until the
      * final small aggregate, so the filter costs one corpus scan at
      * any scale — the shape of a pretraining-corpus cleaning pass. */
    "t13_quality_gates" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("source"), col("text"), tokens.as("toks"))
        .withColumn("n", size(col("toks")))
        .withColumn("awl",
          length(regexp_replace(col("text"), " ", "")).cast("double") / col("n"))
        .withColumn("nstop", size(array_intersect(array_distinct(col("toks")),
          array(StopWords.map(lit): _*))))
        .withColumn("digit_frac",
          size(filter(col("toks"), t => t.rlike("[0-9]"))).cast("double") / col("n"))
      val gLen = col("n").between(20, 1000)
      val gAwl = col("awl").between(3.0, 10.0)
      val gStop = col("nstop") >= 2
      val gDigit = col("digit_frac") <= 0.2
      def cnt(c: Column): Column = sum(when(c, 1).otherwise(0)).cast("long")
      base.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          cnt(gLen).as("pass_len"),
          cnt(gAwl).as("pass_wordlen"),
          cnt(gStop).as("pass_stopwords"),
          cnt(gDigit).as("pass_digits"),
          cnt(gLen && gAwl && gStop && gDigit).as("pass_all"))
        .orderBy("source")
    }),

    /** Deterministic global corpus shuffle + shard assignment — the
      * step in front of every pre-training run: examples must arrive in
      * a reproducible pseudo-random order, decorrelated from crawl/
      * source order, and land in fixed shards. Order key and shard are
      * BOTH the portable md5 gate of (doc_id, seed) — never `rand()`,
      * whose per-task re-evaluation reshuffles on every retry and
      * breaks resumable training. At scale nothing here global-sorts:
      * shard assignment is a projection, shard-balance stats one
      * aggregate, and the order-head sample a TakeOrderedAndProject
      * top-k; the full sharded write would be
      * `.repartition(col("shard")).write.partitionBy("shard")` — one
      * shuffle, balanced by hash uniformity, no sort at all. The md5
      * arithmetic replicates verbatim in DuckDB, so order AND
      * assignment are oracle-verified, not just row counts. */
    "t15_corpus_shuffle" -> ((s, d) => {
      val nShards = 16
      val docs = Tables.documents(s, d)
        .withColumn("skey", graft.operators.Sampling.portableGate(
          concat(col("doc_id").cast("string"), lit(":graftshuffle42"))))
        .withColumn("shard", pmod(col("skey"), lit(nShards)))
      val balance = docs.groupBy("shard").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_shards"),
          min("n").as("min_shard_docs"), max("n").as("max_shard_docs"))
      val head = docs.orderBy(col("skey"), col("doc_id")).limit(5)
        .agg(concat_ws(",", transform(
          array_sort(collect_list(struct(col("skey"), col("doc_id")))),
          r => r.getField("doc_id").cast("string"))).as("head_ids"))
      balance.crossJoin(head)
    }),

    /** Stratified (language-rebalancing) sampler: per-stratum keep
      * rates applied through the deterministic portable hash gate —
      * downsample the dominant language, keep the tail whole, the
      * standard domain-mixing move before training. One scan, zero
      * shuffle until the per-lang stats aggregate, no `rand()` (same
      * reproducibility argument as t15), and membership is a pure
      * function of doc_id — a re-run, a retry, or an incremental
      * extension of the corpus keeps every prior decision. The gate is
      * uniform over 0..4095: [[graft.operators.Sampling.portableGate]]
      * builds a 24-bit value from md5 hex-NIBBLE values, so a
      * power-of-two modulus is unbiased and achieved rates track
      * nominal (production would use xxhash64's full 64 bits;
      * md5-nibble is the engine-portable choice, so the achieved rates
      * themselves are oracle-checked; SamplingSpec pins achieved ≈
      * nominal). */
    "t16_stratified_sample" -> ((s, d) => {
      val rates = Seq("en" -> 0.3, "de" -> 0.5, "es" -> 1.0,
        "fr" -> 1.0, "zh" -> 1.0)
      val gate = pmod(graft.operators.Sampling.portableGate(
        concat(col("doc_id").cast("string"), lit(":strat"))), lit(4096))
      val cut = rates.foldLeft(lit(0.0)) { case (acc, (l, f)) =>
        when(col("lang") === l, lit(f * 4096)).otherwise(acc)
      }
      Tables.documents(s, d)
        .withColumn("kept", (gate < cut).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("kept").as("n_kept"),
          rnd(sum("kept").cast("double") / count(lit(1)), 4).as("kept_rate"))
        .orderBy("lang")
    }),

    /** Corpus-level duplicated-chunk (boilerplate) removal — the
      * line-dedup step of a web-scale pipeline (CCNet / RefinedWeb
      * style: a passage repeated verbatim across many documents is
      * template noise, not content, and is stripped before training).
      * "Lines" here are non-overlapping [[BoilerW]]-token chunks (the
      * synthetic corpus has no newlines); a planted 8-token header on
      * every doc_id % 5 == 0 gives the operator real work — the header
      * aligns at chunk 0 in every planted doc, exactly like a shared
      * license banner.
      *
      * Shape: explode → chunk-hash doc-frequency aggregate (map-side
      * combinable) → the tiny high-frequency hash set anti-joins back
      * as a BROADCAST (the boilerplate set is at most n_chunks/K
      * distinct values and in practice a handful, so the corpus-sized
      * side never shuffles) → order-preserving reassembly groups each
      * doc's surviving chunks once. The rebuilt text itself is pinned
      * by min/max md5 per language, so reassembly ORDER is
      * oracle-verified, not just the token counts. At 100 TB: two
      * shuffles of the chunk stream (doc-freq agg, per-doc regroup),
      * no self-joins, no driver state. */
    "t17_boilerplate_prune" -> ((s, d) => {
      val w = BoilerW
      val planted = Tables.documents(s, d)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(lit(BoilerHeader + " "), col("text")))
            .otherwise(col("text")))
      val chunks = planted
        .withColumn("tk", tokens)
        .withColumn("n", size(col("tk")))
        .withColumn("j", explode(sequence(lit(0),
          greatest(ceil(col("n").cast("double") / w).cast("int") - 1, lit(0)))))
        .select(col("lang"), col("doc_id"),
          col("j"), expr(s"slice(tk, j * $w + 1, $w)").as("chunk_toks"))
        .withColumn("chunk_txt", concat_ws(" ", col("chunk_toks")))
        .withColumn("chunk_md5", md5(col("chunk_txt")))
      val boiler = chunks.groupBy("chunk_md5")
        .agg(countDistinct("doc_id").as("df"))
        .filter(col("df") >= BoilerK)
        .select("chunk_md5")
      val kept = chunks.join(broadcast(boiler), Seq("chunk_md5"), "left_anti")
      val rebuilt = kept.groupBy("lang", "doc_id")
        .agg(concat_ws(" ", flatten(transform(
            array_sort(collect_list(struct(col("j"), col("chunk_toks")))),
            r => r.getField("chunk_toks")))).as("new_text"),
          sum(size(col("chunk_toks"))).as("tok_after"))
      // Anchor accounting on `before` (every planted doc), not on the
      // rebuilt side: a doc whose EVERY chunk is boilerplate vanishes
      // from `rebuilt` entirely, and an inner join would silently drop
      // the most-aggressively-pruned docs from n_docs/n_docs_pruned and
      // the token sums. Left join from `before` + coalesce counts them
      // as fully pruned (tok_after 0, empty rebuilt text) instead.
      val before = planted.select(col("doc_id"), col("lang"),
        size(tokens).as("tok_before"))
      before.join(rebuilt.drop("lang"), Seq("doc_id"), "left")
        .withColumn("tok_after", coalesce(col("tok_after"), lit(0L)))
        .withColumn("new_text", coalesce(col("new_text"), lit("")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("tok_after") < col("tok_before"), 1L).otherwise(0L))
            .as("n_docs_pruned"),
          sum("tok_before").as("sum_tok_before"),
          sum("tok_after").as("sum_tok_after"),
          min(md5(col("new_text"))).as("min_rebuilt_md5"),
          max(md5(col("new_text"))).as("max_rebuilt_md5"))
        .orderBy("lang")
    }),

    /** Temperature-weighted mixture resampling over `source` — the
      * multilingual-LM data-mixing move (sample source s with
      * p ∝ tokens_s^α, α = 0.5, so dominant sources downsample and the
      * tail keeps its mass). Keep rate r_s = min(1, C/√chars_s): the
      * α-temperature rate up to the global normalizer, which is a fixed
      * config constant here rather than a data-dependent Σ — summing 20
      * doubles is ORDER-DEPENDENT in IEEE arithmetic and would make the
      * gate engine-ambiguous, while /,×,√,floor are each correctly
      * rounded and therefore bit-identical in Spark and DuckDB (a real
      * pipeline computes the normalizer driver-side from the 20-row
      * stats and bakes it into the job config the same way). Membership
      * is the portable md5 gate of doc_id — deterministic under retry,
      * re-run, and corpus extension, never `rand()` (t15's argument).
      * Shape at 100 TB: one stats aggregate (20 rows), broadcast back,
      * one gated scan — no second shuffle; the per-source integer char
      * sums keep every cross-source total exact until the final
      * rounded divisions. */
    "t18_temp_mixture" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val stats = docs.groupBy("source")
        .agg(sum("n_chars").as("chars_s"))
        .withColumn("rate", least(lit(1.0), lit(TempMixC) / sqrt(col("chars_s"))))
        .withColumn("cut", floor(col("rate") * 4096))
      val gate = pmod(graft.operators.Sampling.portableGate(
        concat(col("doc_id").cast("string"), lit(":tmix"))), lit(4096))
      val kept = docs.join(broadcast(stats), "source")
        .withColumn("keep", (gate < col("cut")).cast("long"))
      val per = kept.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("keep").as("n_kept"),
          max(rnd(col("rate"), 6)).as("rate_nominal"),
          sum("n_chars").as("chars_before"),
          sum(when(col("keep") === 1, col("n_chars")).otherwise(0L))
            .as("chars_kept"))
      per
        .withColumn("total_kept",
          sum("chars_kept").over(org.apache.spark.sql.expressions.Window
            .partitionBy()))
        .select(col("source"), col("n_docs"), col("n_kept"),
          col("rate_nominal"),
          rnd(col("n_kept").cast("double") / col("n_docs"), 4)
            .as("rate_achieved"),
          col("chars_before"), col("chars_kept"),
          rnd(col("chars_kept").cast("double") / col("total_kept"), 6)
            .as("share_after"))
        .orderBy("source")
    }),

    /** Corpus-derived length winsorization — outlier gating where the
      * thresholds come from the DATA (p01/p99), not a config constant:
      * the cleanup pass that drops truncated fragments and
      * concatenation blowups before training. Exact percentiles need a
      * global sort and approx sketches aren't cross-engine-stable, so
      * the quantiles come from a fixed-width HISTOGRAM (the q46
      * machinery), RECURSED ONCE for heavy tails: a single extreme
      * outlier stretches [lo, hi] so the entire bulk lands in one
      * first-pass bucket and p01/p99 collapse to full-bucket
      * granularity — so a second 64-bin pass re-histograms ONLY the
      * first-pass cut range [b_lo, b_hi], carrying the below-range
      * mass as a cumulative offset. Effective resolution is
      * (hi−lo)/4096 in the worst case and snaps to the bulk's actual
      * support under an outlier (PipelineSpec plants one and proves
      * the cut keeps sub-bucket resolution). All histogram aggregates
      * are map-side combinable, cumulative windows run over the
      * 64-row aggregates (never data), the per-doc gate re-derives
      * both bucket levels with the same IEEE formulas against the
      * broadcast cut scalars — no sort, no shuffle of raw values
      * anywhere. Every step is portable arithmetic, so thresholds AND
      * per-lang clip counts hash-match the DuckDB replica. */
    "t19_length_winsorize" -> ((s, d) => {
      val B = 64
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("n_chars").cast("double").as("v"))
      // mm / hist / bounds / hist2 are MATERIALIZED (r22): every one of
      // them sits under at least two downstream broadcast subtrees
      // (bounds under the hist2 chain AND the final gate scan; mm under
      // hist AND bounds; …), and each broadcast build re-ran the whole
      // upstream corpus-scan chain — the published plan carried 108
      // Exchange nodes for a 64-bucket report (plans/r22/
      // t19_length_winsorize_before.txt). The barriers are 1-to-66-row
      // frames; after them the gate scan is the only corpus pass in the
      // force plan (guide §2.4/§5 — the ExactQuantile histogram lesson).
      val mm = docs.agg(min("v").as("lo"), max("v").as("hi")).materializeLazy
      def bucketOf(v: Column, lo: Column, hi: Column): Column =
        when(hi === lo, lit(0L))
          .otherwise(least(floor((v - lo) / (hi - lo) * B),
            lit((B - 1).toDouble)).cast("long"))
      val hist = docs.crossJoin(broadcast(mm))
        .withColumn("bucket", bucketOf(col("v"), col("lo"), col("hi")))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .materializeLazy
      val wcum = org.apache.spark.sql.expressions.Window.orderBy("bucket")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val cum = hist.withColumn("cum", sum("n").over(wcum))
        .crossJoin(broadcast(hist.agg(sum("n").as("ntot"))))
      val cuts = cum.agg(
        min(when(col("cum") >= ceil(col("ntot") * 0.01), col("bucket"))).as("b_lo"),
        min(when(col("cum") >= ceil(col("ntot") * 0.99), col("bucket"))).as("b_hi"),
        max("ntot").as("ntot"))
      // refined range = the first-pass cut buckets; both bounds are
      // broadcast scalars derived with the identical expression shape
      // in the DuckDB replica (lo + b*(hi-lo)/B, left-to-right)
      val bounds = cuts.crossJoin(broadcast(mm))
        .select(col("b_lo"), col("b_hi"), col("ntot"), col("lo"), col("hi"),
          (col("lo") + col("b_lo") * (col("hi") - col("lo")) / B).as("lo2"),
          (col("lo") + (col("b_hi") + 1) * (col("hi") - col("lo")) / B)
            .as("hi2"))
        .materializeLazy
      val staged = docs.crossJoin(broadcast(bounds))
        .withColumn("b1", bucketOf(col("v"), col("lo"), col("hi")))
      // second-level histogram over the in-range mass only; the
      // below-range count rides the same aggregate as zone -1 so the
      // refinement costs ONE extra scan, not two
      val hist2 = staged
        .withColumn("zone", when(col("b1") < col("b_lo"), -1)
          .when(col("b1") > col("b_hi"), 1).otherwise(0))
        .withColumn("b2", when(col("zone") === 0,
          bucketOf(col("v"), col("lo2"), col("hi2"))).otherwise(lit(-1L)))
        .groupBy("zone", "b2").agg(count(lit(1)).as("n2"))
        .materializeLazy
      val nb = hist2.agg(
        sum(when(col("zone") === -1, col("n2")).otherwise(0L)).as("n_below"))
      val cum2 = hist2.filter(col("zone") === 0)
        .withColumn("cum2", sum("n2").over(
          org.apache.spark.sql.expressions.Window.orderBy("b2")
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
        .crossJoin(broadcast(nb))
        .crossJoin(broadcast(cuts.select(col("ntot").as("nt"))))
      val cuts2 = cum2.agg(
        min(when(col("n_below") + col("cum2") >= ceil(col("nt") * 0.01),
          col("b2"))).as("b2_lo"),
        min(when(col("n_below") + col("cum2") >= ceil(col("nt") * 0.99),
          col("b2"))).as("b2_hi"))
      docs.crossJoin(broadcast(bounds)).crossJoin(broadcast(cuts2))
        .withColumn("b1", bucketOf(col("v"), col("lo"), col("hi")))
        .withColumn("b2", bucketOf(col("v"), col("lo2"), col("hi2")))
        .withColumn("cl", col("b1") < col("b_lo") ||
          (col("b1") <= col("b_hi") && col("b2") < col("b2_lo")))
        .withColumn("ch", col("b1") > col("b_hi") ||
          (col("b1") >= col("b_lo") && col("b2") > col("b2_hi")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("cl"), 1L).otherwise(0L)).as("n_clip_low"),
          sum(when(col("ch"), 1L).otherwise(0L)).as("n_clip_high"),
          sum(when(!col("cl") && !col("ch"), 1L).otherwise(0L)).as("n_kept"),
          rnd(max(col("lo2") + col("b2_lo") * (col("hi2") - col("lo2")) / B), 2)
            .as("t_lo"),
          rnd(max(col("lo2") + (col("b2_hi") + 1) *
            (col("hi2") - col("lo2")) / B), 2).as("t_hi"))
        .orderBy("lang")
    }),

    /** Corpus-preparation FUNNEL — the operators composed the way a
      * real pretraining-prep job chains them, with stage-by-stage
      * survival accounting (the "where did my tokens go" report every
      * data team maintains): quality gates (the t13 battery) → exact
      * dedup keeping the lowest doc_id per content hash (the d01 rule)
      * → deterministic stratified downsample (the t16 gates). Each
      * stage is a per-doc FLAG, not a materialized sub-corpus: the
      * funnel computes in one conditional aggregate over the flagged
      * frame (stage membership is monotone, so stage k's sums are
      * sum(when(flag_1 ∧ … ∧ flag_k))), and the 4-row long form
      * explodes off the single wide row — a union of per-stage
      * aggregates would re-scan the corpus once per stage (Catalyst
      * does not CSE across Union children; QueryPlanSpec counts the
      * scans). Total cost: two scans (the keeper-hash aggregate
      * branch and the flagged aggregate) + the keeper join's
      * (doc_id, hash) shuffle. Every stage's formula replicates in
      * DuckDB, making the WHOLE composed pipeline hash-verified, not
      * just its parts. */
    "t22_prep_funnel" -> ((s, d) => {
      val rates = Seq("en" -> 0.3, "de" -> 0.5, "es" -> 1.0,
        "fr" -> 1.0, "zh" -> 1.0)
      val gateCol = pmod(graft.operators.Sampling.portableGate(
        concat(col("doc_id").cast("string"), lit(":strat"))), lit(4096))
      val cut = rates.foldLeft(lit(0.0)) { case (acc, (l, f)) =>
        when(col("lang") === l, lit(f * 4096)).otherwise(acc)
      }
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
        .withColumn("toks", tokens)
        .withColumn("n", size(col("toks")))
        .withColumn("awl",
          length(regexp_replace(col("text"), " ", "")).cast("double") / col("n"))
        .withColumn("nstop", size(array_intersect(array_distinct(col("toks")),
          array(StopWords.map(lit): _*))))
        .withColumn("digit_frac",
          size(filter(col("toks"), t => t.rlike("[0-9]"))).cast("double") / col("n"))
        .withColumn("q", col("n").between(20, 1000) &&
          col("awl").between(3.0, 10.0) && col("nstop") >= 2 &&
          col("digit_frac") <= 0.2)
        .withColumn("g", gateCol < cut)
        .withColumn("h", md5(col("text")))
        .select("doc_id", "n", "q", "g", "h")
      val keepers = docs.filter(col("q")).groupBy("h")
        .agg(min("doc_id").as("kid"))
      val flagged = docs.join(keepers, Seq("h"), "left")
        .withColumn("k", col("q") && col("doc_id") === col("kid"))
      val wide = flagged.agg(
        count(lit(1)).as("d0"), sum("n").as("t0"),
        sum(when(col("q"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("q"), col("n")).otherwise(0L)).as("t1"),
        sum(when(col("k"), 1L).otherwise(0L)).as("d2"),
        sum(when(col("k"), col("n")).otherwise(0L)).as("t2"),
        sum(when(col("k") && col("g"), 1L).otherwise(0L)).as("d3"),
        sum(when(col("k") && col("g"), col("n")).otherwise(0L)).as("t3"))
      def entry(id: Int, name: String, dc: String, tc: String): Column =
        struct(lit(id).as("stage"), lit(name).as("stage_name"),
          col(dc).as("n_docs"), col(tc).as("sum_tokens"))
      wide.select(explode(array(
          entry(0, "raw", "d0", "t0"),
          entry(1, "quality_gates", "d1", "t1"),
          entry(2, "exact_dedup", "d2", "t2"),
          entry(3, "stratified_sample", "d3", "t3"))).as("r"))
        .select("r.stage", "r.stage_name", "r.n_docs", "r.sum_tokens")
        .orderBy("stage")
    }),

    /** Dataset snapshot diff — the versioning primitive behind "what
      * changed between corpus v1 and v2": one full outer join on
      * doc_id comparing content hashes, classifying every doc as
      * added / removed / changed / unchanged. Snapshots are simulated
      * deterministically (v2 drops doc_id % 7 == 0, adds the % 5 == 3
      * slice, and edits the text of % 11 == 0). At scale this is ONE
      * shuffle on doc_id of (id, 32-byte hash) pairs — never the
      * payloads — and the downstream count aggregate is map-side
      * combinable; a real pipeline runs it per release to gate
      * training-set drift. Pure hash math ⇒ DuckDB replica. */
    "t20_dataset_diff" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val v1 = base.filter(col("doc_id") % 5 < 3)
        .select(col("doc_id"), md5(col("text")).as("h1"))
      val v2kept = base.filter(col("doc_id") % 5 < 3 && col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, md5(concat(col("text"), lit("!"))))
            .otherwise(md5(col("text"))).as("h2"))
      val v2added = base.filter(col("doc_id") % 5 === 3)
        .select(col("doc_id"), md5(col("text")).as("h2"))
      val v2 = v2kept.unionByName(v2added)
      v1.join(v2, Seq("doc_id"), "full_outer")
        .agg(
          sum(when(col("h1").isNull, 1L).otherwise(0L)).as("n_added"),
          sum(when(col("h2").isNull, 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("h1").isNotNull && col("h2").isNotNull &&
            col("h1") =!= col("h2"), 1L).otherwise(0L)).as("n_changed"),
          sum(when(col("h1") === col("h2"), 1L).otherwise(0L)).as("n_unchanged"),
          count(lit(1)).as("n_union"))
    }),

    /** Takedown cascade (right-to-be-forgotten / copyright-claim
      * propagation): a takedown list of doc_ids must remove not only
      * those documents but every EXACT COPY of their content under
      * other ids, and cascade to the derived embedding table — the
      * embedding sweep removes vectors for the WHOLE removed set (id
      * matches ∪ content matches), not just the claimed ids. The
      * takedown id set and its content-hash set are both tiny and
      * BROADCAST; the corpus sides only anti/semi-join against them —
      * no corpus-sized shuffle anywhere, which is what makes the
      * compliance sweep runnable daily at 100 TB. Counts are split by
      * removal cause (id match vs content match) because the content
      * sweep is the part naive implementations miss; exact copies are
      * PLANTED (takedown_id + 1 carries the takedown doc's content)
      * so both the content split and the embedding cascade are
      * exercised, not vacuous. Pure hash/id math ⇒ DuckDB replica. */
    "t21_takedown_cascade" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // Simulated copy-laundering (the t20 snapshot-simulation style —
      // the raw testdata has no exact copies, which would leave the
      // content sweep vacuously green): every doc at takedown_id + 1
      // carries an exact copy of the takedown doc's content under its
      // own id, so both the content sweep and the embedding cascade
      // have real rows to remove. The plant is a broadcast left join
      // on doc_id — no corpus shuffle.
      val srcTexts = base.filter(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 1).as("doc_id"), col("text").as("copy_text"))
      // MATERIALIZED (r22): the (doc_id, md5) frame feeds the five
      // split-count aggregates and the broadcast id/hash sets — without
      // the barrier each of the ~8 consumers re-scanned the corpus and
      // re-hashed every text (76 Exchange nodes in the r21 published
      // plan). One narrow row per doc; the §8 lightweight-proxy shape.
      val docs = base.join(broadcast(srcTexts), Seq("doc_id"), "left")
        .select(col("doc_id"),
          md5(coalesce(col("copy_text"), col("text"))).as("h"))
        .materializeLazy
      val tdIds = docs.filter(col("doc_id") % 97 === 0).select("doc_id")
        .materializeLazy
      val tdHashes = docs.join(broadcast(tdIds), "doc_id")
        .select("h").distinct()
        .materializeLazy
      val byId = docs.join(broadcast(tdIds), Seq("doc_id"), "left_semi")
      val byContent = docs
        .join(broadcast(tdIds), Seq("doc_id"), "left_anti")
        .join(broadcast(tdHashes), Seq("h"), "left_semi")
      val cleanDocs = docs
        .join(broadcast(tdIds), Seq("doc_id"), "left_anti")
        .join(broadcast(tdHashes), Seq("h"), "left_anti")
      // the FULL removed id set — id matches plus every exact content
      // copy (h ∈ tdHashes covers both: a takedown doc's own hash is in
      // the set by construction). The embedding sweep must cascade off
      // THIS set, not just the claimed ids: an embedding of a doc
      // removed as a content copy is the same forgotten content.
      val removedIds = docs
        .join(broadcast(tdHashes), Seq("h"), "left_semi")
        .select("doc_id")
      val emb = Tables.embeddings(s, d).select(col("vec_id"))
      val cleanEmb = emb.join(broadcast(removedIds.select(
        col("doc_id").as("vec_id"))), Seq("vec_id"), "left_anti")
      tdIds.agg(count(lit(1)).as("n_takedown_ids"))
        .crossJoin(byId.agg(count(lit(1)).as("n_removed_by_id")))
        .crossJoin(byContent.agg(count(lit(1)).as("n_removed_by_content")))
        .crossJoin(cleanDocs.agg(count(lit(1)).as("n_docs_left")))
        .crossJoin(cleanEmb.agg(count(lit(1)).as("n_vecs_left")))
    }),

    /** Per-source frequency capping — the C4/CCNet-style guard against
      * any one domain dominating the training mix: keep at most N docs
      * per source, chosen by the deterministic portable-gate priority
      * (retry-stable, plan-independent — never `rand()`). The naive
      * form is one row_number window partitioned by source, which at
      * corpus scale funnels EVERYTHING into #sources partitions — the
      * low-cardinality window trap t14 avoids. The shipped form is the
      * classic two-phase distributed top-N: a first window over
      * (source, gate-salt) keeps N candidates per sub-partition
      * (bounding any partition at ~n/(sources·SALT)), and the final
      * per-source window ranks only SALT·N candidate rows. The
      * selection is IDENTICAL to the naive form because (gate, doc_id)
      * is a total order — and the DuckDB oracle uses the naive
      * single-window form, so that equivalence is hash-verified, not
      * asserted. kept_id_sum/min/max fingerprint the SELECTION (exact
      * integers), not just its size. */
    "t23_source_cap" -> ((s, d) => {
      val N = 10; val SALT = 8
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          graft.operators.Sampling.portableGate(
            concat(col("doc_id").cast("string"), lit(":cap"))).as("g"))
      val w1 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"), pmod(col("g"), lit(SALT)))
        .orderBy(col("g"), col("doc_id"))
      val cand = docs.withColumn("rn1", row_number().over(w1))
        .filter(col("rn1") <= N)
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("g"), col("doc_id"))
      val kept = cand.withColumn("rn2", row_number().over(w2))
        .filter(col("rn2") <= N)
      docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .join(kept.groupBy("source").agg(
          count(lit(1)).as("n_kept"),
          sum("doc_id").as("kept_id_sum"),
          min("doc_id").as("min_kept_id"),
          max("doc_id").as("max_kept_id")), Seq("source"))
        .withColumn("n_dropped", col("n_docs") - col("n_kept"))
        .select("source", "n_docs", "n_kept", "n_dropped",
          "kept_id_sum", "min_kept_id", "max_kept_id")
        .orderBy("source")
    }),

    /** Dataset release manifest — the per-shard accounting a versioned
      * corpus release publishes (the artifact consumers diff before
      * retraining; t20's companion at shard granularity): doc counts,
      * char totals, id ranges, and an ORDER-INDEPENDENT content
      * checksum per deterministic shard. The checksum is the SUM of
      * per-doc portable gates (24-bit md5-nibble values) — exact in
      * int64 up to ~2^29 docs per shard, immune to aggregation order,
      * and computable bit-identically by any engine, where a
      * concatenate-then-hash fingerprint would need a per-shard sort
      * and a gigabyte string at corpus scale. One map-side-combinable
      * aggregate; the 16-row shuffle carries only combined partials
      * (the q41 discipline without even needing salt — a
      * low-cardinality KEY is safe when only combined partials move).
      * The shard count is a parameter: a production release sizes it
      * as ~corpus_bytes/shard_target so it GROWS with the corpus; the
      * checksum stays exact to ~2^29 docs/shard regardless. */
    "t24_release_manifest" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("n_chars"),
          pmod(graft.operators.Sampling.portableGate(
            concat(col("doc_id").cast("string"), lit(":shard"))), lit(16))
            .as("shard"))
      docs.groupBy("shard").agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc_id"),
          max("doc_id").as("max_doc_id"),
          sum(graft.operators.Sampling.portableGate(col("text")))
            .as("content_chk"))
        .orderBy("shard")
    }),

    /** Count-Min-Sketch heavy hitters with measured error — the
      * mergeable frequency sketch (Cormode & Muthukrishnan 2005) a
      * streaming/sharded pipeline uses when the token vocabulary
      * can't be counted exactly per shard. The sketch is a FIXED
      * d=4 × w=64 integer table built by one map-side-combinable
      * (hash-row, bucket) count aggregate — mergeable across shards,
      * partitions, or stream micro-batches by elementwise addition,
      * which is the whole point of the structure; hashes are the
      * frozen [[graft.operators.Sampling.portableGate]] family (one
      * salt per row) so both engines place every token identically.
      * The corpus is tokenized ONCE into a (token, n_exact)
      * vocabulary census — the only corpus-scale pass — and both the
      * sketch (per-bucket SUM of census counts ≡ per-bucket count of
      * occurrences, so the table is bit-identical and just as
      * mergeable) and the exact top-10 read that census, which is
      * vocabulary-sized, not corpus-sized; the hash explode therefore
      * costs 4×|vocab| rows instead of 4×|tokens|. Estimates (min
      * over the 4 rows' buckets) are then audited against the exact
      * counts of the top-10 tokens — publishing sketch error on a
      * probe set is the frequency-sketch analogue of s10's ANN
      * recall, and the CMS one-sided guarantee (estimate ≥ truth,
      * never below) lands in the `overcount` column, provably ≥ 0 in
      * the oracle-matched output. The probe join broadcasts the
      * 256-row sketch; the exact top-10 is a TakeOrdered limit over
      * the census; w is deliberately small (64) so collisions are
      * REAL and the published error is a demonstration, not a zero —
      * production sizes w ≈ e/ε for error ε·Σcounts. */
    "t25_cms_heavy_hitters" -> ((s, d) => {
      val W = 64
      val hrows = 1 to 4
      val vocab = Tables.documents(s, d)
        .select(explode(tokens).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n_exact"))
      def buckets(tok: Column): Column = array(hrows.map(i =>
        struct(lit(i).as("hrow"),
          pmod(graft.operators.Sampling.portableGate(
            concat(lit(s"cms$i:"), tok)), lit(W)).as("bucket"))): _*)
      val sketch = vocab
        .select(col("n_exact"), explode(buckets(col("token"))).as("hb"))
        .groupBy(col("hb.hrow").as("hrow"), col("hb.bucket").as("bucket"))
        .agg(sum("n_exact").as("cnt"))
      val top = vocab
        .orderBy(col("n_exact").desc, col("token")).limit(10)
      val probes = top
        .select(col("token"), col("n_exact"),
          explode(buckets(col("token"))).as("hb"))
        .select(col("token"), col("n_exact"),
          col("hb.hrow").as("hrow"), col("hb.bucket").as("bucket"))
      val est = probes.join(broadcast(sketch), Seq("hrow", "bucket"))
        .groupBy("token", "n_exact").agg(min("cnt").as("n_est"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n_exact").desc, col("token"))
      est.withColumn("rank", row_number().over(w))
        .withColumn("overcount", col("n_est") - col("n_exact"))
        .select(col("rank"), col("token"), col("n_exact"), col("n_est"),
          col("overcount"))
        .orderBy("rank")
    }),

    /** DSIR-style importance selection (Xie et al., NeurIPS 2023 —
      * "Data Selection for Language Models via Importance Resampling"):
      * score every raw-pool document by how target-like its hashed
      * n-gram features are, then keep the top-N. Here the target
      * distribution is the `en` slice (the stand-in for "looks like
      * the domain we train on") and the pool is everything else;
      * features are whitespace unigrams hashed into 64 buckets by the
      * frozen salted [[graft.operators.Sampling.portableGate]] (its own
      * `dsir:` salt — a distinct hash family from t25's `cms<i>:`).
      * Per-bucket target/pool occurrence censuses reduce map-side to a
      * 64-row table whose log-likelihood ratio is the INTEGER bitlen
      * surrogate `⌊log2(T+1)⌋ − ⌊log2(S+1)⌋` (`length(bin(x))` on both
      * engines), so a document's weight — Σ c_doc[b]·lr[b] — is exact
      * integer arithmetic end-to-end and the whole selection
      * hash-matches DuckDB; production DSIR uses smoothed real-valued
      * log-ratios and Gumbel-noise resampling where this surrogate
      * ranks deterministically, but the pipeline SHAPE is the
      * production one: one feature-hash pass, a broadcast bucket
      * table, one per-doc aggregate, top-N by weight. At 100 TB: the
      * censuses map-combine (64 and ≤64·n_docs rows), the lr table
      * broadcasts, and the final selection is a TakeOrdered top-20 —
      * no corpus-wide window, no global sort. */
    "t26_dsir_select" -> ((s, d) => {
      val B = 64
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(tokens).as("token"))
        .withColumn("bucket", pmod(graft.operators.Sampling.portableGate(
          concat(lit("dsir:"), col("token"))), lit(B)))
      val isTarget = col("lang") === "en"
      // two corpus passes by design: lr combines map-side straight to
      // 64 rows (no shuffle worth sharing), and the weights branch
      // reduces to its per-(doc, bucket) census before the broadcast
      // join — a shared census subtree was measured SLOWER here
      // because lang-filter pushdown specializes the branches and
      // defeats exchange reuse, leaving the extra census shuffle
      // uncompensated
      val lr = tok.groupBy("bucket")
        .agg(sum(when(isTarget, 1L).otherwise(0L)).as("t_cnt"),
          sum(when(isTarget, 0L).otherwise(1L)).as("s_cnt"))
        .select(col("bucket"),
          (length(bin(col("t_cnt") + 1)) - length(bin(col("s_cnt") + 1)))
            .cast("long").as("lr"))
      val weights = tok.filter(!isTarget)
        .groupBy("doc_id", "lang", "bucket").agg(count(lit(1)).as("c"))
        .join(broadcast(lr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(sum(col("c") * col("lr")).as("weight"),
          sum("c").as("n_tok"))
      val top = weights.orderBy(col("weight").desc, col("doc_id")).limit(20)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("weight").desc, col("doc_id"))
      top.withColumn("rank", row_number().over(w))
        .select(col("rank"), col("doc_id"), col("lang"), col("n_tok"),
          col("weight"))
        .orderBy("rank")
    }),

    /** CCNet-style LM-perplexity quality bucketing (Wenzek et al.,
      * LREC 2020): score every document under a bigram language model
      * trained on the target slice (`en` — the Wikipedia stand-in),
      * then split the corpus into head/middle/tail fluency terciles —
      * the bucketing CCNet feeds downstream sampling. The "model" is
      * two hashed censuses over the en bigram stream (4096 buckets
      * each, frozen `lm1:`/`lm2:`-salted
      * [[graft.operators.Sampling.portableGate]] families — distinct
      * from t25's `cms<i>:` and t26's `dsir:`): context counts
      * C1[h(w1)] and bigram counts C2[h(w1·w2)]. A document's
      * negative-log-likelihood surrogate is the integer bitlen form
      * Σ_bigrams (64 + ⌊log2(C1+1)⌋ − ⌊log2(C2+1)⌋) — per-term
      * `length(bin(x))` on both engines; the +64 offset keeps every
      * term strictly positive so the per-doc e3 mean's integer
      * division truncates identically cross-engine — normalized per
      * bigram (×1000 div n_pairs). Tercile cutoffs come from the
      * integer score HISTOGRAM (cumulative window over a
      * value-bounded frame), not a corpus-wide ntile sort, and
      * value-based cutoffs make ties unambiguous: equal scores always
      * share a bucket. Production CCNet scores with a smoothed KenLM
      * 5-gram where this uses the hashed-bigram bitlen surrogate (its
      * exactness is what buys the cross-engine hash), but the
      * pipeline SHAPE is CCNet's: one n-gram pass, a broadcast model,
      * one per-doc score, fixed-threshold bucketing. At 100 TB: the
      * censuses map-combine to ≤4096 rows each and broadcast, so the
      * corpus-sized pair stream is scored by two broadcast left joins
      * and never shuffles until the doc-keyed aggregate; the
      * histogram window runs over ≤64k rows of value space regardless
      * of corpus size; the output is n_langs×3 rows. */
    "t27_lm_perplexity" -> ((s, d) => {
      val B = 4096
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), tokens.as("toks"))
        .filter(size(col("toks")) >= 2)
      val pairs = docs.select(col("doc_id"), col("lang"),
          explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b))).as("bg"))
        .withColumn("b1", pmod(graft.operators.Sampling.portableGate(
          concat(lit("lm1:"), substring_index(col("bg"), " ", 1))), lit(B)))
        .withColumn("b2", pmod(graft.operators.Sampling.portableGate(
          concat(lit("lm2:"), col("bg"))), lit(B)))
      // the per-(doc, b1, b2) census: c1 and c2 re-aggregate from the
      // SAME en-filtered census exchange (ReusedExchange — plan shows
      // one reuse), so the bigram explode and its two hash gates run
      // twice total (en slice + full corpus) instead of three times;
      // weighting every downstream count/sum by `c` is exactly
      // equivalent to counting raw bigram occurrences
      val census = pairs.groupBy("doc_id", "lang", "b1", "b2")
        .agg(count(lit(1)).as("c"))
      val en = census.filter(col("lang") === "en")
      val c1 = en.groupBy("b1").agg(sum("c").as("c1"))
      val c2 = en.groupBy("b2").agg(sum("c").as("c2"))
      val term = (lit(64) + length(bin(coalesce(col("c1"), lit(0L)) + 1))
        - length(bin(coalesce(col("c2"), lit(0L)) + 1))).cast("long")
      // sc is MATERIALIZED (r22): it has three consumers — the score
      // histogram, the doc-count broadcast under `cum`, and the final
      // bucket scan — and each one otherwise re-ran the corpus bigram
      // explode + census shuffle + c1/c2 broadcast builds from scratch
      // (62 Exchange nodes in the r21 published plan). One narrow row
      // per doc; at 100 TB this is the §8 "decide on small rows" shape.
      val sc = census
        .join(broadcast(c1), Seq("b1"), "left")
        .join(broadcast(c2), Seq("b2"), "left")
        .groupBy("doc_id", "lang")
        .agg(sum(term * col("c")).as("nll"), sum("c").as("n_pairs"))
        .select(col("doc_id"), col("lang"),
          expr("nll * 1000 div n_pairs").as("s"))
        .materializeLazy
      val hist = sc.groupBy("s").agg(count(lit(1)).as("c"))
      val cum = hist.withColumn("cum", sum("c").over(
          org.apache.spark.sql.expressions.Window.orderBy("s")))
        .crossJoin(broadcast(sc.agg(count(lit(1)).as("n"))))
      val cuts = cum.agg(
        min(when(col("cum") * 3 >= col("n"), col("s"))).as("c1v"),
        min(when(col("cum") * 3 >= col("n") * 2, col("s"))).as("c2v"))
      sc.crossJoin(broadcast(cuts))
        .withColumn("bucket", when(col("s") <= col("c1v"), "head")
          .when(col("s") <= col("c2v"), "middle").otherwise("tail"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(s) div count(1)").as("avg_nll_e3"))
        .orderBy("lang", "bucket")
    }),

    /** Benchmark decontamination at corpus scale — the ASYMMETRIC
      * sibling of t11's symmetric train/eval rate audit, in the shape
      * a 100 TB pass actually runs: the benchmark suite is TINY and
      * the corpus is not, so the benchmark's 8-gram set rides to every
      * corpus partition as a driver-built Bloom literal (the q47/e11
      * operator form of Spark's InjectRuntimeFilter, sized from the
      * measured gram cardinality) and the corpus is SCANNED, never
      * shuffled, to be prefiltered — only the bloom survivors
      * (true matches + the ~0.04% fp) shuffle into the exact semi
      * join that removes false positives, so the result is provably
      * equal to the plain semi join the DuckDB oracle computes (the
      * q47 discipline: a prefilter must be indistinguishable from no
      * prefilter). Contamination is REAL by construction: half the
      * benchmark docs are planted verbatim into the pool under new
      * ids (`source` 'planted'), so the flagged set is non-empty and
      * its per-source accounting (plus a t24-style order-independent
      * gate-sum checksum of the flagged ids — the SELECTION is
      * hash-verified, not just its counts) shows natural template
      * overlap beside the planted copies. At 100 TB: the benchmark
      * gram set is KBs, the bloom build is one tiny aggregate, the
      * corpus-side cost is one linear gram pass, and downstream
      * shuffle volume is bounded by actual contamination, not corpus
      * size. */
    "t29_benchmark_decontam" -> ((s, d) => {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.graft.ColumnBridge
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") < 50).select("doc_id", "text")
      val plants = bench.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 700000L).as("doc_id"),
          lit("planted").as("source"), col("text"))
      val pool = docs.filter(col("doc_id") >= 50)
        .select(col("doc_id"), col("source"), col("text"))
        .unionByName(plants)
      def grams(df: DataFrame): DataFrame = df
        .withColumn("tk", tokens)
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(tk) >= 8
            | THEN transform(sequence(1, size(tk) - 7),
            |                i -> md5(concat_ws(' ', slice(tk, i, 8))))
            | ELSE array(md5(concat_ws(' ', tk))) END""".stripMargin)).as("g"))
      val bg = grams(bench).select("g").distinct()
      val nBg = math.max(bg.count(), 4096L)
      // the bloom's domain is LONG: grams enter as xxhash64 on both
      // sides (engine-local is fine — every bloom survivor, hash
      // collisions included, still faces the exact semi join)
      val bloomBin = bg.agg(ColumnBridge.column(
        new BloomFilterAggregate(
          ColumnBridge.expression(xxhash64(col("g"))),
          Literal(nBg), Literal(nBg * 16L)).toAggregateExpression())
        .as("bf")).head().getAs[Array[Byte]]("bf")
      val flaggedIds = grams(pool)
        .filter(ColumnBridge.column(new BloomFilterMightContain(
          Literal(bloomBin), ColumnBridge.expression(xxhash64(col("g"))))))
        .join(bg, Seq("g"), "left_semi") // exact: fp rows die here
        .select("doc_id").distinct()
      pool.join(flaggedIds.withColumn("hit", lit(1L)), Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_flagged"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("hit").isNotNull,
            graft.operators.Sampling.portableGate(
              concat(col("doc_id").cast("string"), lit(":decon"))))
            .otherwise(0L)).as("flagged_chk"))
        .orderBy("source")
    }),

    /** Global chunk-level dedup with the KEEP-ONE policy of Lee et al.
      * 2022 (ExactSubstr removes every duplicated span but leaves one
      * occurrence in the corpus) at fixed [[ChunkDedupW]]-token
      * granularity — the third chunk-dedup policy in the roster, and a
      * different operator from both: t17 drops EVERY copy of
      * high-doc-frequency chunks (boilerplate has no keeper), d14
      * MASKS every occurrence of cross-doc grams (span accounting, no
      * keeper either). Here each distinct chunk keeps exactly its
      * first occurrence in canonical (doc_id, position) order and
      * sheds the rest, which preserves one copy of rare duplicated
      * content instead of deleting it from the dataset.
      *
      * Scale shape: one explode → a keep-first row_number window
      * PARTITIONED BY THE CHUNK HASH — cardinality ≈ corpus chunks,
      * uniformly distributed, partitions the size of each chunk's
      * multiplicity, so there is no low-cardinality window funnel to
      * salt (contrast t23, where the window key was 20 sources) —
      * then one source-keyed aggregate that map-side-combines the
      * exploded volume. The keep rule is a pure function of
      * (hash, doc_id, position): no driver state, stable under
      * re-partitioning, and a corpus APPEND can only demote new
      * chunks (earlier occurrences keep winning) — the incremental
      * property a standing-corpus dedup needs. Retained fraction is
      * int/int division; the kept-set checksum is the t24
      * order-independent gate-sum, so the SELECTION (not just its
      * counts) is hash-verified. */
    "t28_chunk_dedup" -> ((s, d) => {
      val W = ChunkDedupW
      val docs = Tables.documents(s, d)
        .withColumn("tk", tokens)
        .withColumn("n", size(col("tk")))
        .filter(col("n") > 0)
      val chunks = docs
        .withColumn("j", explode(sequence(lit(0),
          ceil(col("n").cast("double") / W).cast("int") - 1)))
        .select(col("source"), col("doc_id"), col("j"),
          least(lit(W), col("n") - col("j") * W).as("chunk_len"),
          md5(concat_ws(" ", expr(s"slice(tk, j * $W + 1, $W)"))).as("h"))
      val wKeep = org.apache.spark.sql.expressions.Window
        .partitionBy("h").orderBy("doc_id", "j")
      val flagged = chunks.withColumn("rn", row_number().over(wKeep))
      val keptTok = sum(when(col("rn") === 1, col("chunk_len")).otherwise(0L))
      flagged.groupBy("source").agg(
          count(lit(1)).as("n_chunks"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
          sum("chunk_len").as("tokens_total"),
          keptTok.as("tokens_kept"),
          rnd(keptTok.cast("double") / sum("chunk_len"), 4)
            .as("retained_frac"),
          sum(when(col("rn") === 1,
            graft.operators.Sampling.portableGate(col("h"))).otherwise(0L))
            .as("kept_chk"))
        .orderBy("source")
    }),

    /** Sliding-window duplicate detection — the offset-robust sibling
      * of t28's fixed grid. A fixed W-token grid only matches repeats
      * that land on the same chunk boundaries; a copy shifted by a few
      * tokens (the common case: quoted passages, templated intros at
      * varying offsets) hashes into different grid cells and escapes.
      * Lee et al. 2022's suffix-array ExactSubstr catches ANY offset;
      * this operator is the distributed middle ground: windows of
      * [[ChunkDedupW]] tokens at stride 8, so a shifted repeat of
      * length ≥ W+stride-1 is guaranteed to produce at least one
      * aligned window pair regardless of offset. Cost is the honest
      * trade: W/stride = 2× the hashed windows of the grid, same
      * shuffle shape (window-hash-partitioned keep-first ranking, the
      * t28 no-coarse-key rule). Detection stats only — overlapping
      * windows cannot sum token retention without double counting, so
      * excision stays t28's job; this is the AUDIT that prices what
      * the grid misses. Full windows only (docs shorter than W have
      * nothing a shifted copy could share at this granularity). */
    "t32_sliding_dedup" -> ((s, d) => {
      val W = ChunkDedupW; val S = 8
      val docs = Tables.documents(s, d)
        .withColumn("tk", tokens)
        .withColumn("n", size(col("tk")))
        .filter(col("n") >= W)
      val wins = docs
        .withColumn("j", explode(sequence(lit(0), expr(s"(n - $W) div $S"))))
        .select(col("source"), col("doc_id"), col("j"),
          md5(concat_ws(" ", expr(s"slice(tk, j * $S + 1, $W)"))).as("h"))
      val wKeep = org.apache.spark.sql.expressions.Window
        .partitionBy("h").orderBy("doc_id", "j")
      val flagged = wins.withColumn("rn", row_number().over(wKeep))
      val isDup = col("rn") > 1
      flagged.groupBy("source").agg(
          count(lit(1)).as("n_windows"),
          sum(when(isDup, 1L).otherwise(0L)).as("n_dup_windows"),
          countDistinct(when(isDup, col("doc_id"))).as("n_docs_hit"),
          rnd(sum(when(isDup, 1L).otherwise(0L)).cast("double") /
            count(lit(1)), 4).as("dup_frac"),
          sum(when(isDup,
            graft.operators.Sampling.portableGate(col("h"))).otherwise(0L))
            .as("dup_chk"))
        .orderBy("source")
    }),

    /** Domain reweighting, DoReMi-flavored (Xie et al. 2023, "DoReMi:
      * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
      * upweight domains where a proxy model underperforms, publish the
      * resampled mixture. The proxy "excess loss" here is the excess
      * RARE-TOKEN RATE — the fraction of a domain's tokens outside the
      * corpus top-16 head vocabulary (the synthetic corpus holds only
      * 31 distinct tokens, so a 16-token head leaves a real tail;
      * production uses the tokenizer's actual head), minus the
      * corpus-wide rate, floored at 0 — a deterministic stand-in with the right monotonicity
      * (rare tokens are where a small reference model loses); swapping
      * in measured per-domain eval losses changes one column, not the
      * operator. Weights are integer to the end: rates freeze to e6 by
      * integral division, w_raw = tokens·(1e6 + 10·excess_e6), and the
      * only doubles are the final normalized shares (single IEEE
      * divisions, identical on both engines). Scale: the token census
      * is one explode with map-side combine, the vocabulary is a
      * 16-row broadcast, the per-source grid is |sources| rows, and
      * the two corpus totals ride as 1-row broadcasts — no collect, no
      * second corpus pass. (At 100 TB the e6 products stay inside
      * int64 up to ~9·10¹² tokens per domain; past that the freeze
      * moves to decimal(38) with the same semantics.) The output reads
      * as a mixture card: sampling share vs token share, and effective
      * epochs (>1 = domain oversampled). */
    "t31_domain_reweight" -> ((s, d) => {
      val tk = Tables.documents(s, d)
        .select(col("source"), explode(tokens).as("tok"))
      val vocab = tk.groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(16)
        .select(col("tok"), lit(1).as("in_vocab"))
      val perSrc = tk.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("rare"))
      val tot = perSrc.agg(sum("tokens").as("t_tok"), sum("rare").as("t_rare"))
      val w = perSrc.crossJoin(broadcast(tot))
        .withColumn("rate_e6", expr("rare * 1000000L div tokens"))
        .withColumn("excess_e6", greatest(lit(0L),
          col("rate_e6") - expr("t_rare * 1000000L div t_tok")))
        .withColumn("w_raw",
          col("tokens") * (lit(1000000L) + lit(10L) * col("excess_e6")))
      val wTot = w.agg(sum("w_raw").as("w_tot"))
      w.crossJoin(broadcast(wTot))
        .withColumn("p_sample", rnd(
          col("w_raw").cast("double") / col("w_tot"), 4))
        .withColumn("eff_epochs", rnd(
          (col("w_raw").cast("double") / col("w_tot")) *
            (col("t_tok").cast("double") / col("tokens")), 4))
        .select("source", "tokens", "rare", "rate_e6", "excess_e6",
          "w_raw", "p_sample", "eff_epochs")
        .orderBy("source")
    }),

    /** Tokenizer fertility report — tokens-per-word and bytes-per-token
      * per (lang, source) cell, the table a tokenizer owner publishes
      * to find languages the vocabulary underserves (fertility ≫ 1
      * means each word fragments into many pieces, so the same text
      * costs proportionally more sequence length — and at 100 TB,
      * proportionally more training FLOPs). Tokens are t05's BPE-ish
      * pre-tokenization, words are the whitespace tokens, bytes are
      * octet_length of the raw text (UTF-8), so all three denominators
      * are scan-side column math — ONE pass, one partial+final
      * aggregate on the (lang, source) grid, nothing shuffles but the
      * ≤|langs×sources| partial rows. The over_fertile flag applies the
      * published threshold (1.8 pieces/word) to the CELL average, the
      * integer-exact ratio of two sums — not an average of per-doc
      * ratios, which would weight a 3-word doc like a 3000-word one. */
    "t30_tokenizer_fertility" -> ((s, d) => {
      val pieces = regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+|[^a-z0-9 ]+"), lit(0))
      val perDoc = Tables.documents(s, d)
        .select(col("lang"), col("source"),
          size(pieces).cast("long").as("n_pieces"),
          size(tokens).cast("long").as("n_words"),
          octet_length(col("text")).cast("long").as("n_bytes"))
        .filter(col("n_words") > 0 && col("n_pieces") > 0)
      val fertility = sum("n_pieces").cast("double") / sum("n_words")
      perDoc.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_pieces").as("sum_pieces"),
          sum("n_words").as("sum_words"),
          rnd(fertility, 4).as("fertility"),
          rnd(sum("n_bytes").cast("double") / sum("n_pieces"), 4)
            .as("bytes_per_token"),
          (fertility > 1.8).as("over_fertile"))
        .orderBy("lang", "source")
    }),

    /** Content-defined chunking — the third dedup granularity next to
      * t28's fixed grid and t32's sliding audit, and the one that
      * SURVIVES EDITS: chunk boundaries are a pure function of local
      * content (a token closes a chunk when the portable gate of its
      * trailing 3-token window ≡ 0 mod [[CdcAvgChunk]], the gear/
      * FastCDC rule of Xia et al. 2016 at token granularity), so an
      * insertion re-synchronizes the chunking after one boundary and
      * every later chunk hashes identically — where every grid chunk
      * after the edit shifts and dies. The query PROVES that property
      * on itself: each doc gets a prefix-shifted twin (one injected
      * token), both are chunked under both schemes, and the output
      * reports per (scheme, source) how many of a doc's distinct chunk
      * hashes re-appear in its twin — cdc re-syncs the corpus at
      * ~85–90% while grid collapses to ~0, which is exactly the case
      * for CDC-keyed dedup/storage of a 100 TB recrawled corpus
      * (near-identical page revisions share all but O(1) chunks).
      * Scale shapes: boundary detection is two per-doc lag()s (windows
      * partitioned by doc — doc-sized, never corpus-sized); both
      * schemes fan out from ONE pass via explode; chunk assembly and
      * the orig∩shift presence test are hash-partitioned aggregates on
      * (doc, chunk) / (doc, h) keys — high-cardinality, map-side
      * combined, NO self-join (presence via max-flags in one groupBy).
      * All counts integral ⇒ bit-exact DuckDB oracle. */
    "t33_cdc_chunking" -> ((s, d) => {
      val A = CdcAvgChunk
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id", "variant").orderBy("pos")
      val toks = Tables.documents(s, d)
        .withColumn("tk0", tokens)
        .filter(size(col("tk0")) > 0)
        .select(col("source"), col("doc_id"), explode(array(
          struct(lit("orig").as("variant"), col("tk0").as("tk")),
          struct(lit("shift").as("variant"),
            concat(array(lit("xshift")), col("tk0")).as("tk")))).as("v"))
        .select(col("source"), col("doc_id"),
          col("v.variant").as("variant"),
          posexplode(col("v.tk")).as(Seq("pos", "tok")))
      val withChunkIds = toks
        .withColumn("l1", lag("tok", 1).over(wDoc))
        .withColumn("l2", lag("tok", 2).over(wDoc))
        .withColumn("b", when(col("l2").isNotNull &&
          pmod(graft.operators.Sampling.portableGate(
            concat_ws(" ", col("l2"), col("l1"), col("tok"))),
            lit(A)) === 0, 1L).otherwise(0L))
        .withColumn("cno_cdc", coalesce(sum("b").over(wDoc.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("cno_grid", expr(s"pos div $A").cast("long"))
      val chunks = withChunkIds
        .select(col("source"), col("doc_id"), col("variant"), col("pos"),
          col("tok"), explode(array(
            struct(lit("cdc").as("scheme"), col("cno_cdc").as("cno")),
            struct(lit("grid").as("scheme"), col("cno_grid").as("cno"))))
            .as("sch"))
        .groupBy(col("sch.scheme").as("scheme"), col("source"),
          col("doc_id"), col("variant"), col("sch.cno").as("cno"))
        .agg(md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ")).as("h"))
      chunks
        .groupBy("scheme", "source", "doc_id", "h")
        .agg(max(when(col("variant") === "orig", 1L).otherwise(0L))
            .as("in_o"),
          max(when(col("variant") === "shift", 1L).otherwise(0L))
            .as("in_s"))
        .groupBy("scheme", "source")
        .agg(countDistinct(when(col("in_o") === 1, col("doc_id")))
            .as("n_docs"),
          sum("in_o").as("n_uniq_chunks"),
          sum(col("in_o") * col("in_s")).as("n_resynced"))
        .withColumn("resync_bp",
          expr("(n_resynced * 10000) div n_uniq_chunks"))
        .orderBy("scheme", "source")
    }),

    /** Exact-budget weighted sampling — "exactly [[PpsK]] sample hits
      * per language, probability ∝ document size": systematic PPS over
      * the portable-gate shuffle order via
      * [[graft.operators.Sampling.systematicPps]]. The rate gates (t16)
      * and temperature mixture (t18) give nominal fractions with
      * binomial jitter; a training-mix BUDGET ("this domain contributes
      * exactly k documents/epochs") needs an exact-k draw, and the
      * usual weighted-reservoir algorithms (A-Res/A-ExpJ) rank by
      * `u^(1/w)` — `pow`/`ln` are not correctly rounded, so their
      * selections are engine-ambiguous at the ulp. Systematic
      * thresholds keep every op INTEGER (cumsums plus the exact
      * `2k·cw ≥ (2j+1)·W` crossing test), so each per-document hit
      * count is hash-checked against DuckDB's flat window-cumsum
      * replay — which also witnesses that the operator's distributed
      * bucket decomposition reproduces the flat global order. Output is
      * every selected doc with its hit count (a doc with
      * n_chars ≥ W/k absorbs several thresholds — selected with
      * certainty, budget-accounted per hit; Σhits = k per lang). */
    "t34_pps_sample" -> ((s, d) => {
      graft.operators.Sampling.systematicPps(
        Tables.documents(s, d), "lang", "doc_id", "n_chars",
        k = PpsK, salt = "pps42")
        .orderBy("lang", "doc_id")
    }),

    /** Per-language length-distribution drift between two ingestion
      * pipelines (even- vs odd-numbered sources) — the corpus-side
      * consumer of [[graft.operators.KsDrift]] beside q55's
      * snapshot framing: a pipeline that truncates, over-segments, or
      * boilerplate-strips differently shows up as a shifted n_chars
      * CDF long before any per-doc quality gate fires, and the KS
      * statistic is the standard scale-free detector for it. The
      * operator computes exact CDFs through bounded census →
      * bucket-histogram stages (never a per-language sort window —
      * lang is exactly the low-cardinality key that funnels at
      * 100 TB); the integer max-deviation makes `ks` and its witness
      * value hash-portable. Oracle = the naive flat window replica. */
    /** Source anomaly leaderboard — one-vs-rest KS per source: which
      * ingestion source's length distribution diverges from the rest
      * of the corpus? The t35 pairwise framing needs a hypothesis
      * (which two snapshots to compare); this is the unsupervised
      * sweep that FINDS the suspect. Rides
      * [[graft.operators.KsDrift.ksOneVsRest]]: the rest-CDF jumps at
      * values the source never takes, and the operator covers those
      * interior extremes with the two per-row candidates (at / just
      * before each source census point) instead of an |S|·|V|
      * evaluation grid — per-source cost stays census-sized, the only
      * extra shuffle vs t35 is the stratum↔global census equi-join on
      * the value. Exact integer deviations ⇒ hash-portable ks and
      * witness. t37's `drifted` flag is the classical count-based
      * critical value (honest here — unweighted ECDFs are its exact
      * regime); when a calibration-grade gate is needed, t41's
      * Bernoulli(cnt_s/N) randomization applies to this unweighted
      * leaderboard verbatim (drop the weightCol). */
    "t37_source_anomaly" -> ((s, d) => {
      val ks = graft.operators.KsDrift.ksOneVsRest(
        Tables.documents(s, d), "source", "n_chars")
      val na = col("n_s").cast("double")
      val nb = col("n_rest").cast("double")
      ks.select(col("source"), col("n_s"), col("n_rest"),
          rnd(col("ks"), 6).as("ks"),
          col("ks_value").cast("long").as("ks_value"),
          (col("ks") > lit(1.358) * sqrt((na + nb) / (na * nb)))
            .as("drifted"))
        .orderBy("source")
    }),

    /** Mass-weighted drift — t35's companion asking a different
      * question: t35's unweighted KS sees WHERE THE DOCS sit on the
      * length axis; this weights each doc by its character mass, so it
      * sees WHERE THE BYTES sit — the distribution a token budget
      * actually samples from. A pipeline that adds a few huge docs
      * barely moves the doc-count CDF but shifts the mass CDF hard
      * (and vice versa for many tiny docs). Same
      * [[graft.operators.KsDrift.ks2]] bounded stages with integer
      * weight mass in the census (the q54 exactness rule), so the
      * statistic still hashes cross-engine. */
    "t38_mass_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("side_b",
          substring(col("source"), 4, 10).cast("int") % 2 === 1)
      val ks = graft.operators.KsDrift.ks2(
        docs, "lang", "n_chars", "side_b", weightCol = "n_chars")
      // the classical critical value is a count-based asymptotic; with
      // unequal weights the honest sample size is Kish's
      // n_eff = (Σw)²/Σw² — both sums exact integers (decimal ≡
      // HUGEINT), n_eff one fixed-arity double expression. The naive
      // flag (mass totals as if they were counts) is kept beside it:
      // the gap between the two IS the lesson this audit teaches.
      val dec = "decimal(18,0)"
      val w2 = col("n_chars").cast(dec) * col("n_chars").cast(dec)
      val kish = docs
        .filter(col("n_chars").isNotNull && col("n_chars") > 0)
        .groupBy("lang")
        .agg(sum(when(!col("side_b"), w2)).as("sa2"),
          sum(when(col("side_b"), w2)).as("sb2"))
      val wa = col("n_a").cast("double")
      val wb = col("n_b").cast("double")
      val neffA = wa * wa / col("sa2").cast("double")
      val neffB = wb * wb / col("sb2").cast("double")
      def crit(x: Column, y: Column): Column =
        lit(1.358) * sqrt((x + y) / (x * y))
      ks.join(broadcast(kish), "lang")
        .select(col("lang"),
          col("n_a").as("w_a"), col("n_b").as("w_b"),
          rnd(col("ks"), 6).as("ks"),
          col("ks_value").cast("long").as("ks_value"),
          rnd(neffA, 2).as("neff_a"), rnd(neffB, 2).as("neff_b"),
          (col("ks") > crit(wa, wb)).as("drifted_naive"),
          (col("ks") > crit(neffA, neffB)).as("drifted_kish"))
        .orderBy("lang")
    }),

    /** Mass-weighted source-anomaly leaderboard — t37 asked "which
      * source's DOCS are distributionally odd"; this asks "which
      * source's BYTES are" (the distribution a token budget samples),
      * via [[graft.operators.KsDrift.ksOneVsRest]] with char-mass
      * weights in the census. The significance flag uses Kish
      * effective sample sizes on BOTH sides ((Σw)²/Σw², rest side by
      * exact subtraction of integer sums) — the classical critical
      * value with mass totals as counts would declare everything
      * significant. */
    "t39_source_mass_anomaly" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val ks = graft.operators.KsDrift.ksOneVsRest(
        docs, "source", "n_chars", weightCol = "n_chars")
      val dec = "decimal(18,0)"
      val w2 = col("n_chars").cast(dec) * col("n_chars").cast(dec)
      val perSrc = docs
        .filter(col("n_chars").isNotNull && col("n_chars") > 0)
        .groupBy("source")
        .agg(sum(w2).as("sw2"))
      val tot = perSrc.agg(sum("sw2").as("gw2"))
      val ws = col("n_s").cast("double")
      val wr = col("n_rest").cast("double")
      val neffS = ws * ws / col("sw2").cast("double")
      val neffR = wr * wr / (col("gw2") - col("sw2")).cast("double")
      ks.join(broadcast(perSrc), "source").crossJoin(broadcast(tot))
        .select(col("source"),
          col("n_s").as("w_s"), col("n_rest").as("w_rest"),
          rnd(col("ks"), 6).as("ks"),
          col("ks_value").cast("long").as("ks_value"),
          rnd(neffS, 2).as("neff_s"), rnd(neffR, 2).as("neff_rest"),
          (col("ks") > lit(1.358) *
            sqrt((neffS + neffR) / (neffS * neffR))).as("drifted_kish"))
        .orderBy("source")
    }),

    /** Permutation calibration of the Kish significance gate —
      * t38's weighted-KS critical value runs the classical asymptotic
      * on Kish effective sample sizes, which is a HEURISTIC (the
      * asymptotic is derived for unweighted ECDFs); the honest
      * reference is a randomization test that needs no distribution
      * theory: under H0 the side label is exchangeable, so re-drawing
      * labels [[PermR]] times and ranking the observed weighted KS
      * among the replicas gives an exact-level p-value,
      * p = (1 + #{KS_perm ≥ KS_obs}) / (R+1). Labels are re-drawn by
      * the PORTABLE GATE (parity of md5-gate(doc_id:permN)) — a
      * deterministic Bernoulli(1/2) relabeling (the random-split form
      * of the randomization test), so every replica reproduces
      * bit-for-bit in DuckDB and the whole audit hash-oracles,
      * including exactly where `drifted_kish` and `drifted_perm`
      * disagree — that disagreement set IS the calibration lesson.
      *
      * Scale shape: ONE pass — the doc stream explodes ×(R+1) into the
      * same [[graft.operators.KsDrift.ks2]] bounded census stages with
      * (lang, perm) as the group, so the only full-data shuffle is the
      * R+1-fold census (map-side combinable; R is a fixed audit knob,
      * not data-scaled), and every window stays per-(group, bucket).
      * No per-permutation job, no driver loop. A replica whose drawn
      * side is empty yields null KS and never counts as ≥ (a
      * conservative tick toward smaller n_ge — impossible at corpus
      * group sizes). */
    "t40_perm_drift_test" -> ((s, d) => {
      val R = PermR
      val docs = Tables.documents(s, d)
        .filter(col("n_chars").isNotNull && col("n_chars") > 0)
        .select(col("lang"), col("doc_id"), col("n_chars"),
          (substring(col("source"), 4, 10).cast("int") % 2 === 1)
            .as("side_real"))
      val perms = docs
        .withColumn("perm", explode(sequence(lit(0), lit(R))))
        .withColumn("side",
          when(col("perm") === 0, col("side_real"))
            .otherwise(pmod(graft.operators.Sampling.portableGate(
              concat(col("doc_id").cast("string"), lit(":perm"),
                col("perm").cast("string"))), lit(2)) === 1))
        .withColumn("gp", concat_ws("|", col("lang"), col("perm")))
      val ks = graft.operators.KsDrift.ks2(
          perms, "gp", "n_chars", "side", weightCol = "n_chars")
        .withColumn("lang", substring_index(col("gp"), "|", 1))
        .withColumn("perm",
          substring_index(col("gp"), "|", -1).cast("int"))
      val obs = ks.filter(col("perm") === 0)
        .select(col("lang"), col("n_a"), col("n_b"),
          col("ks").as("ks_obs"))
      val nGe = ks.filter(col("perm") >= 1)
        .join(broadcast(obs.select("lang", "ks_obs")), "lang")
        .groupBy("lang")
        .agg(sum(when(col("ks") >= col("ks_obs"), 1L).otherwise(0L))
          .as("n_ge"))
      // the Kish flag on the REAL labels, t38's exact-integer recipe
      val dec = "decimal(19,0)"
      val w2 = col("n_chars").cast(dec) * col("n_chars").cast(dec)
      val kish = docs.groupBy("lang")
        .agg(sum(when(!col("side_real"), w2)).as("sa2"),
          sum(when(col("side_real"), w2)).as("sb2"))
      val wa = col("n_a").cast("double")
      val wb = col("n_b").cast("double")
      val neffA = wa * wa / col("sa2").cast("double")
      val neffB = wb * wb / col("sb2").cast("double")
      val p = (col("n_ge") + lit(1L)).cast("double") / lit((R + 1).toDouble)
      obs.join(broadcast(nGe), "lang").join(broadcast(kish), "lang")
        .select(col("lang"),
          col("n_a").as("w_a"), col("n_b").as("w_b"),
          rnd(col("ks_obs"), 6).as("ks"),
          col("n_ge"), rnd(p, 6).as("p_perm"),
          (col("ks_obs") > lit(1.358) *
            sqrt((neffA + neffB) / (neffA * neffB))).as("drifted_kish"),
          (col("n_ge") === 0).as("drifted_perm"))
        .orderBy("lang")
    }),

    /** Permutation calibration of the ONE-VS-REST Kish gate — t40
      * calibrates t38's two-sample gate; this calibrates t39's
      * leaderboard gate, the shape a production anomaly sweep actually
      * runs (for every source: is THIS source's byte mass
      * distributionally anomalous against the rest?). Under H0 the
      * source partition is exchangeable across docs, so each source's
      * membership indicator re-draws as a portable Bernoulli(cnt_s/N):
      * `gate(doc:src:perm) mod L · N < cnt_s · L` with L = 2^20 — an
      * all-integer comparison (the r16 PPS rule: no 2^53 ceiling, no
      * float rounding), doc-count-based because DOCS are the
      * exchangeable units even though the statistic weighs their char
      * MASS. The observed leaderboard rides
      * [[graft.operators.KsDrift.ksOneVsRest]] UNCHANGED (t39's exact
      * shape); each replica's stratum-vs-rest KS is definitionally the
      * two-sample KS between the drawn stratum and its complement, so
      * the R replicas ride [[graft.operators.KsDrift.ks2]] with
      * (source, perm) as the group — same bounded census stages, no
      * per-permutation job, no driver loop. p = (1 + #{KS_perm ≥
      * KS_obs}) / (R+1) at exact level 1/(R+1) = 0.05; the
      * `drifted_kish` / `drifted_perm` disagreement set is the
      * calibration lesson and is itself hash-verified.
      *
      * Scale shape: the replica pass explodes the doc census ×S·R
      * (S = #sources, R = [[PermR]] — both fixed audit knobs, not
      * data-scaled); the census stays the only full-data shuffle and
      * is map-side combinable, every window per-(group, bucket). A
      * replica whose drawn stratum is empty (or full) yields null KS
      * and conservatively never counts toward n_ge. */
    "t41_perm_source_anomaly" -> ((s, d) => {
      val R = PermR
      val L = 1048576L // 2^20 gate modulus — see scaladoc
      val docs = Tables.documents(s, d)
        .filter(col("n_chars").isNotNull && col("n_chars") > 0)
        .select(col("source"), col("doc_id"), col("n_chars"))
      // observed leaderboard: t39's mass-weighted one-vs-rest, unchanged
      val obs = graft.operators.KsDrift.ksOneVsRest(
          docs, "source", "n_chars", weightCol = "n_chars")
        .select(col("source"), col("n_s").as("w_s"),
          col("n_rest").as("w_rest"), col("ks").as("ks_obs"),
          col("ks_value"))
      // per-source doc counts drive the Bernoulli numerators
      val cnts = docs.groupBy(col("source").as("s2"))
        .agg(count(lit(1)).as("cs"))
      val totCnt = cnts.agg(sum("cs").as("cn")) // N stays in-plan
      val perms = docs
        .crossJoin(broadcast(cnts))
        .crossJoin(broadcast(totCnt))
        .withColumn("perm", explode(sequence(lit(1), lit(R))))
        .withColumn("side",
          pmod(graft.operators.Sampling.portableGate(
            concat(col("doc_id").cast("string"), lit(":"), col("s2"),
              lit(":perm"), col("perm").cast("string"))), lit(L)) *
            col("cn") < col("cs") * lit(L))
        .withColumn("gp", concat_ws("|", col("s2"), col("perm")))
      val ksPerm = graft.operators.KsDrift.ks2(
          perms, "gp", "n_chars", "side", weightCol = "n_chars")
        .withColumn("source", substring_index(col("gp"), "|", 1))
      val nGe = ksPerm
        .join(broadcast(obs.select("source", "ks_obs")), "source")
        .groupBy("source")
        .agg(sum(when(col("ks") >= col("ks_obs"), 1L).otherwise(0L))
          .as("n_ge"))
      // t39's Kish flag on the REAL labels (rest Σw² by exact
      // subtraction of integer sums)
      val dec = "decimal(18,0)"
      val w2 = col("n_chars").cast(dec) * col("n_chars").cast(dec)
      val perSrc = docs.groupBy("source").agg(sum(w2).as("sw2"))
      val tot = perSrc.agg(sum("sw2").as("gw2"))
      val ws = col("w_s").cast("double")
      val wr = col("w_rest").cast("double")
      val neffS = ws * ws / col("sw2").cast("double")
      val neffR = wr * wr / (col("gw2") - col("sw2")).cast("double")
      val p = (col("n_ge") + lit(1L)).cast("double") / lit((R + 1).toDouble)
      obs.join(broadcast(nGe), "source")
        .join(broadcast(perSrc), "source").crossJoin(broadcast(tot))
        .select(col("source"), col("w_s"), col("w_rest"),
          rnd(col("ks_obs"), 6).as("ks"),
          col("ks_value").cast("long").as("ks_value"),
          col("n_ge"), rnd(p, 6).as("p_perm"),
          (col("ks_obs") > lit(1.358) *
            sqrt((neffS + neffR) / (neffS * neffR))).as("drifted_kish"),
          (col("n_ge") === 0).as("drifted_perm"))
        .orderBy("source")
    }),

    /** Robust (MAD) length-outlier gate — the median-based cousin of
      * t19's percentile winsorize: mean/stddev z-scores are themselves
      * dragged by the outliers they hunt, so corpus pruning uses the
      * median absolute deviation (consistency constant 1.4826, the
      * σ-equivalent under normality; gate at the conventional 3σ →
      * |x − median| > 3·1.4826·MAD). Two chained
      * [[graft.operators.ExactQuantile]] passes (median of n_chars,
      * then median of the absolute deviations) — each bounded-stage,
      * never a per-lang sort window — plus one broadcast-joined gate
      * scan. On integer-valued n_chars every quantity is EXACTLY
      * representable (medians end in .0/.5, deviations exact, one
      * multiply for the threshold), so the gate decisions and counts
      * hash cross-engine with no rounding games. */
    "t36_robust_outliers" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("n_chars").cast("double").as("v"))
      // med / mad are MATERIALIZED (r22): both are ≤|lang|-row frames
      // broadcast into corpus-grain scans (`dev` appears under the mad
      // census AND the final gate aggregate), and without the barrier
      // each broadcast build re-ran the ENTIRE ExactQuantile pipeline
      // that produced them — the published plan carried 88 Exchange
      // nodes (plans/r22/t36_robust_outliers_before.txt). Guide
      // §2.4/§5; values unchanged (a checkpoint only cuts lineage).
      val med = graft.operators.ExactQuantile.quantiles(
        docs, "lang", "v", Seq("med" -> 0.5))
        .select(col("lang"), col("med"))
        .materialize
      val dev = docs.join(broadcast(med), "lang")
        .withColumn("adev", abs(col("v") - col("med")))
      val mad = graft.operators.ExactQuantile.quantiles(
        dev.select(col("lang"), col("adev")), "lang", "adev",
        Seq("mad" -> 0.5))
        .select(col("lang"), col("mad"))
        .materialize
      dev.join(broadcast(mad), "lang")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          max(col("med")).as("med"),
          max(col("mad")).as("mad"),
          sum(when(col("adev") > lit(3) * lit(1.4826) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"),
          max(when(col("adev") > lit(3) * lit(1.4826) * col("mad"),
            col("v"))).as("worst_len"))
        .select(col("lang"), col("n"), col("med"), col("mad"),
          col("n_outliers"), col("worst_len").cast("long").as("worst_len"))
        .orderBy("lang")
    }),

    "t35_length_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("side_b",
          substring(col("source"), 4, 10).cast("int") % 2 === 1)
      val ks = graft.operators.KsDrift.ks2(
        docs, "lang", "n_chars", "side_b")
      val na = col("n_a").cast("double")
      val nb = col("n_b").cast("double")
      ks.select(col("lang"), col("n_a"), col("n_b"),
          rnd(col("ks"), 6).as("ks"),
          col("ks_value").cast("long").as("ks_value"),
          (col("ks") > lit(1.358) * sqrt((na + nb) / (na * nb)))
            .as("drifted"))
        .orderBy("lang")
    }),

    /** Learned-tokenizer build — BPE merge learning (Sennrich et al.
      * 2016, arXiv:1508.07909), the corpus→tokenizer stage every
      * training-data pipeline runs and the one the roster only
      * AUDITED until now (t05 splits with a fixed regex, t30 measures
      * fertility of a GIVEN tokenizer; nothing learned a vocabulary).
      * [[BpeRounds]] unrolled top-1 merge rounds, each: ONE
      * map-side-combinable adjacent-pair census over the word
      * VOCABULARY — (word, freq) built once from the corpus, so every
      * iteration is vocabulary-sized, never corpus-sized — a 1-row
      * winner broadcast back, and a scan-side literal re-pair.
      *
      * Symbol sequences ride a double-delimited string ("##a##b##"):
      * the merge rewrite replace('#l##r#' → '#lr#') takes only ONE
      * '#' from each outer boundary, so adjacent matches never share
      * characters and a left-to-right non-overlapping replace IS
      * greedy BPE ("a a a a" + merge (a,a) → [aa, aa], not
      * [aa, a, a]) — the same replace() semantics in Spark and DuckDB,
      * which is what lets the iterative build hash end-to-end. All
      * counts integer; the winner total order (pair_n desc, pair asc)
      * is engine-independent; tokens_after/vocab_after publish the
      * compression trajectory per round, each an exact census.
      *
      * Scale shape: the corpus is touched ONCE (combinable
      * groupBy(word)); each round is one exploded pair census
      * (explode factor = word length, vocab-sized input), a 1-row
      * TakeOrdered winner, and a broadcast crossJoin rewrite — no
      * self-join, no per-round corpus scan, no driver loop over data.
      * The loop itself is [[graft.operators.BpeMerge.learn]] (unit-
      * tested on synthetic words, incl. the overlap edge case); the
      * corpus fold + learn run through the session-memoized
      * [[bpeLearnTable]] build (r20 — the learn executes ONCE per
      * sweep and t43/t46/e25 read the same frozen table), and this
      * query publishes the collected BpeRounds×6 table. The bench
      * cell therefore prices the build only when t42 is the sweep's
      * first tokenizer consumer; the build cost itself lands on
      * whichever consumer touches the memo first (e25 in roster
      * order). */
    "t42_bpe_learn" -> ((s, d) => {
      import s.implicits._
      bpeLearnTable(s, d).toDF("merge_round", "l_sym", "r_sym",
        "pair_n", "tokens_after", "vocab_after")
    }),

    /** Learned-tokenizer APPLICATION — the other half of the t42
      * lifecycle (learn → apply → audit): encode the corpus with the
      * merges t42 learns and publish the per-language fertility table
      * a tokenizer owner reads before shipping the vocabulary (t30's
      * audit, but of the LEARNED tokenizer instead of a given one —
      * fragmenting languages show fertility ≫ 1 and low
      * chars_per_token). The tokenizer is the memoized [[bpeMerges]]
      * table (r20 — the same frozen learn t42 publishes, by the memo's
      * one-build construction; before that, `encode()`'s carry-column
      * argument gave the same cannot-desynchronize guarantee), folded
      * into a static [[graft.operators.BpeMerge.applyMerges]] replace
      * chain — ONE narrow codegen pass over the (lang, word)
      * vocabulary instead of BpeRounds materialized rewrite rounds;
      * result-identical because applyMerges performs the identical
      * greedy replaces in the identical order. Audit = integer sums
      * (words, chars, post-encode tokens, distinct symbol types) per
      * language with two final divisions; everything vocabulary-sized
      * after the one corpus fold. */
    "t43_bpe_apply" -> ((s, d) => {
      val merges = bpeMerges(s, d)
      val wordsL = Tables.documents(s, d)
        .select(col("lang"), explode(tokens).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("freq"))
      val enc = wordsL
        .withColumn("sy",
          graft.operators.BpeMerge.applyMerges(col("w"), merges))
        .materialize // consumed by the audit aggregate AND the vocab census
      val agg = enc
        .withColumn("nt",
          size(graft.operators.BpeMerge.symbolsOf(col("sy"))).cast("long"))
        .groupBy("lang")
        .agg(sum("freq").as("n_words"),
          sum(col("freq") * length(col("w")).cast("long")).as("n_chars"),
          sum(col("freq") * col("nt")).as("n_tokens"))
      val vocabPerLang = enc
        .select(col("lang"),
          explode(graft.operators.BpeMerge.symbolsOf(col("sy"))).as("sym"))
        .groupBy("lang").agg(countDistinct("sym").as("n_vocab"))
      agg.join(broadcast(vocabPerLang), "lang")
        .select(col("lang"), col("n_words"), col("n_chars"),
          col("n_tokens"), col("n_vocab"),
          rnd(col("n_tokens").cast("double") / col("n_words"), 4)
            .as("fertility"),
          rnd(col("n_chars").cast("double") / col("n_tokens"), 4)
            .as("chars_per_token"))
        .orderBy("lang")
    }),

    /** Learned quality classifier, TRAINING stage — the model-based
      * filtering pass (CCNet / fastText-style) every modern pipeline
      * runs between t13's hand-written gates and t26's DSIR: a linear
      * model trained to reject template noise, here a fixed-round batch
      * perceptron in e4 fixed-point integers
      * ([[graft.operators.QualityPerceptron]] — the t42/BpeMerge
      * iterative-learner discipline with a gradient instead of a
      * merge). Planted labels: doc_id % 5 == 0 docs become the t17
      * license banner repeated [[QcBannerReps]] times (negatives);
      * everything else is a positive. Published: the weight vector
      * after every round plus the pre-update mistake count — the
      * training curve a filtering owner reads to see the learner
      * actually converged (zero training errors by round 6 at all
      * three SFs) rather than trusting an opaque final model. Scale:
      * one corpus scan builds the feature frame (materialized);
      * each round is one combinable gradient aggregate against
      * broadcast 1-row weights. */
    "t44_quality_learn" -> ((s, d) => {
      // r20: the learn runs through the memoized [[qcModel]] build
      // (one training run per sweep, shared with t45's weights and
      // e26's frozen monitor); this publishes the collected
      // QcRounds×7 trajectory.
      import s.implicits._
      qcModel(s, d).toDF("learn_round", "w1", "w2", "w3", "w4", "w5",
        "n_mistakes")
    }),

    /** Learned quality classifier, SCORING stage — the corpus census a
      * data owner reads before turning the model on: per source, how
      * many docs the final t44 weights flag (margin <= 0), the
      * planted-label confusion (tp = planted docs correctly flagged,
      * fp = clean docs flagged — the collateral damage column), the
      * t13 heuristic verdict on the same corpus, and the DISAGREEMENT
      * count (model-keep != t13-keep) — the review queue where the
      * learned model and the hand rules differ, which is exactly the
      * set a migration from heuristic to learned filtering audits by
      * hand. The weights come from the memoized [[qcModel]] build
      * (r20) — the SAME collected trajectory t44 publishes, so the
      * scorer structurally cannot use different weights than t44
      * published (previously guaranteed by re-running the identical
      * learn loop; now by reading the identical frozen table). One
      * broadcast-join corpus pass over the memoized feature frame. */
    "t45_quality_audit" -> ((s, d) => {
      val feats = qcFeaturesMemo(s, d)
      def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
      graft.operators.QualityPerceptron.score(feats, qcWeights(s, d))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          cnt(col("y") === -1L).as("n_planted"),
          cnt(col("margin") <= 0).as("n_flagged"),
          cnt(col("y") === -1L && col("margin") <= 0).as("tp"),
          cnt(col("y") === 1L && col("margin") <= 0).as("fp"),
          cnt(col("pass_t13")).as("n_pass_t13"),
          cnt((col("margin") > 0) =!= col("pass_t13")).as("n_disagree"))
        .orderBy("source")
    }),

    /** TOKEN-denominated mixture reweighting — closing the
      * tokenizer→mixture loop: t18's temperature resampling weights
      * sources by CHAR mass, but training budgets are spent in TOKENS
      * of the shipped tokenizer, and a language that fragments under
      * it (high fertility) carries more token mass per char — so the
      * char-denominated mixture systematically over-serves fragmenting
      * languages relative to the token budget. This publishes BOTH
      * weightings side by side per language: the t18 α=0.5 gate on
      * char mass and the same gate on the EXACT token mass under t42's
      * learned tokenizer (per-doc token counts via the memoized
      * [[bpeMerges]] table — the same learner on the same canonical
      * corpus fold, its 8-row table folded into a static
      * [[graft.operators.BpeMerge.applyMerges]] replace chain, so the
      * mass is the shipped tokenizer's by construction and the apply
      * is ONE narrow pass), plus the share gap — the
      * number a data-mixing owner compares before retraining weights.
      * Kept masses are integer sums of integer per-doc masses (the
      * t18 IEEE argument: no data-dependent double Σ anywhere; the
      * one Σ per share is a window sum of BIGINTs). On THIS corpus
      * fertility is nearly uniform across languages (3.72–3.75), so
      * the published gap is small by construction — the operator
      * shape, not the magnitude, is the witness (the t03 accuracy
      * caveat). Scale: one corpus fold to (doc, word) counts, the
      * 8-round vocabulary-style rewrite, one census aggregate. */
    "t46_token_mixture" -> ((s, d) => {
      import graft.operators.BpeMerge
      val docs = Tables.documents(s, d)
      // frozen merge table from the session-memoized bpeLearnTable
      // (r20: one learn per sweep), folded into a static replace
      // chain — one narrow pass over the (doc, word) fold instead of
      // 8 materialized corpus-grain rewrite rounds (same learner,
      // same canonical fold, same greedy semantics as encode())
      val merges = bpeMerges(s, d)
      val perDoc = docs
        .select(col("doc_id"), col("lang"), explode(tokens).as("w"))
        .groupBy("doc_id", "lang", "w").agg(count(lit(1)).as("freq"))
        .withColumn("nt", size(graft.operators.BpeMerge.symbolsOf(
          BpeMerge.applyMerges(col("w"), merges))).cast("long"))
        .groupBy("doc_id", "lang")
        .agg(sum(col("freq") * col("nt")).as("d_tokens"))
      val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
        .join(perDoc, Seq("doc_id", "lang"), "left")
        .withColumn("d_tokens", coalesce(col("d_tokens"), lit(0L)))
      val stats = base.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars_mass"),
          sum("d_tokens").as("tokens_mass"))
        .withColumn("rate_c",
          least(lit(1.0), lit(TempMixC) / sqrt(col("chars_mass"))))
        .withColumn("rate_t",
          least(lit(1.0), lit(TokMixC) / sqrt(col("tokens_mass"))))
        .withColumn("cut_c", floor(col("rate_c") * 4096))
        .withColumn("cut_t", floor(col("rate_t") * 4096))
      def gate(salt: String): Column =
        pmod(graft.operators.Sampling.portableGate(
          concat(col("doc_id").cast("string"), lit(salt))), lit(4096))
      val kept = base.join(broadcast(stats), "lang")
        .withColumn("keep_c", (gate(":tmixc") < col("cut_c")).cast("long"))
        .withColumn("keep_t", (gate(":tmixt") < col("cut_t")).cast("long"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      kept.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars_mass"),
          sum("d_tokens").as("tokens_mass"),
          max(rnd(col("rate_c"), 6)).as("rate_char"),
          max(rnd(col("rate_t"), 6)).as("rate_tok"),
          sum("keep_c").as("n_kept_char"),
          sum("keep_t").as("n_kept_tok"),
          sum(when(col("keep_c") === 1, col("n_chars")).otherwise(0L))
            .as("chars_kept"),
          sum(when(col("keep_t") === 1, col("d_tokens")).otherwise(0L))
            .as("tokens_kept"))
        .withColumn("share_char", rnd(
          col("chars_kept").cast("double") / sum("chars_kept").over(w), 6))
        .withColumn("share_tok", rnd(
          col("tokens_kept").cast("double") / sum("tokens_kept").over(w), 6))
        .withColumn("share_gap",
          rnd(col("share_tok") - col("share_char"), 6))
        .orderBy("lang")
    }),

    /** Length-banded best-fit-decreasing shard packing — the OTHER
      * production packer beside t14's concat-and-split: t14 lays docs
      * end-to-end (zero padding, but documents straddle shard
      * boundaries — a training example can start mid-document); the
      * no-split policy packs whole docs and pays PADDING instead. True
      * best-fit-decreasing is inherently sequential, so the
      * distributed form is the published length-grouped variant:
      * bucket docs into 64-token length bands (pure integer rounding,
      * exact in both engines), order each band decreasing (the FFD
      * shape), and cut fixed-capacity shards of
      * cap = ⌊B / band_hi⌋ docs — every shard provably fits its
      * B=4096 budget because cap·band_hi ≤ B, and padding per shard
      * is bounded by cap·63 + (B mod band_hi) because band members
      * are within 64 tokens of the band ceiling. Docs longer than B
      * get singleton shards (cap clamped to 1, overflow padding
      * clamped to 0).
      *
      * Published per language, BOTH policies side by side: shard
      * count, straddled-doc count (the offset policy's split cost —
      * structurally 0 under banded BFD), and padding waste (the BFD
      * policy's cost — structurally 0 for every non-final offset
      * shard), plus the banded fill rate in e4 — the sheet a
      * packing-policy migration reads. All integers ⇒ strict hash
      * oracle.
      *
      * Scale: both rank and offset come from
      * [[graft.operators.PrefixScan.runningSum]] (the t14 discipline
      * — no low-cardinality total-order window, no global sort; every
      * window is bounded by one range partition), then one (lang,
      * band, shard) aggregate and one per-lang census. The 1e4·Σtok
      * fill numerator stays exact in int64 to ~10^14 tokens per
      * language. */
    "t47_bestfit_pack" -> ((s, d) => {
      val B = 4096L
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          size(tokens).cast("long").as("n_tok"))
      val banded = docs
        .withColumn("band", expr("greatest(64, ((n_tok + 63) div 64) * 64)"))
        .withColumn("cap", expr(s"greatest(1, $B div band)"))
        .withColumn("nord", -col("n_tok"))
        .withColumn("one", lit(1L))
      val ranked = graft.operators.PrefixScan.runningSum(
        banded, group = Seq("lang", "band"), order = Seq("nord", "doc_id"),
        value = "one", out = "pos")
      val perShard = ranked
        .withColumn("shard", expr("(pos - 1) div cap"))
        .groupBy("lang", "band", "shard")
        .agg(sum("n_tok").as("fill"))
      val bfd = perShard.groupBy("lang")
        .agg(count(lit(1)).as("bfd_shards"),
          sum(greatest(lit(0L), lit(B) - col("fill"))).as("bfd_padding"))
      val scanned = graft.operators.PrefixScan.runningSum(
        docs, group = Seq("lang"), order = Seq("doc_id"),
        value = "n_tok", out = "cum_tok")
      val off = scanned.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("sum_tokens"),
          sum(when(col("n_tok") > 0 &&
            expr(s"(cum_tok - 1) div $B") =!=
              expr(s"(cum_tok - n_tok) div $B"), 1L).otherwise(0L))
            .as("off_straddled"))
        .withColumn("off_shards", expr(s"(sum_tokens + ${B - 1}) div $B"))
        .withColumn("off_padding",
          col("off_shards") * B - col("sum_tokens"))
      off.join(bfd, "lang")
        .withColumn("bfd_fill_e4", when(col("bfd_shards") > 0,
          expr(s"(10000 * sum_tokens) div (bfd_shards * $B)"))
          .otherwise(0L))
        .select("lang", "n_docs", "sum_tokens", "off_shards",
          "off_straddled", "off_padding", "bfd_shards", "bfd_padding",
          "bfd_fill_e4")
        .orderBy("lang")
    }),
  )

  /** Shared DuckDB replica of the BPE merge learner (t42/t43): the
    * corpus-wide (word, freq) fold, the boundary-string encoding, and
    * [[BpeRounds]] unrolled census→winner→re-pair rounds — generated
    * by ONE loop with the Spark side's constants so learner and apply
    * oracles can never desynchronize on N. Sums cast to BIGINT
    * (DuckDB sums to HUGEINT); DuckDB prunes unreferenced CTEs, so a
    * consumer pays only the chain it reads. */
  private[queries] def bpeCteSql: String = {
    val rounds = (1 to BpeRounds).map { r =>
      val p = r - 1
      s"""c$r AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_n FROM (
         |   SELECT freq, unnest(list_transform(range(1, len(a)),
         |            i -> a[i] || ' ' || a[i+1])) AS pair
         |   FROM (SELECT list_filter(string_split(sy, '##'), x -> x <> '') AS a,
         |                freq FROM v$p)) GROUP BY 1),
         | m$r AS (SELECT string_split(pair, ' ')[1] AS l_sym,
         |          string_split(pair, ' ')[2] AS r_sym, pair_n
         |        FROM c$r ORDER BY pair_n DESC, pair LIMIT 1),
         | v$r AS (SELECT replace(v$p.sy,
         |                 '#' || m$r.l_sym || '##' || m$r.r_sym || '#',
         |                 '#' || m$r.l_sym || m$r.r_sym || '#') AS sy, freq
         |        FROM v$p, m$r),
         | s$r AS (SELECT CAST(sum(freq) AS BIGINT) AS tokens_after,
         |               count(DISTINCT sym) AS vocab_after FROM (
         |          SELECT freq, unnest(list_filter(string_split(sy, '##'),
         |                   x -> x <> '')) AS sym FROM v$r)),
         | o$r AS (SELECT $r AS merge_round, l_sym, r_sym, pair_n,
         |               tokens_after, vocab_after FROM m$r, s$r)""".stripMargin
    }
    s"""words AS (
      |  SELECT w, count(*) AS freq FROM (
      |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |    FROM documents) GROUP BY 1),
      | v0 AS (SELECT '##' || regexp_replace(w, '(.)', '\\1##', 'g') AS sy,
      |               freq FROM words),
      | ${rounds.mkString(",\n ")}""".stripMargin
  }

  /** Shared DuckDB replica of the t44/t45 perceptron: the planted
    * corpus, the e4 fixed-point feature pass, and [[QcRounds]]
    * unrolled gradient→update rounds — ONE generator loop with the
    * Spark side's constants (the bpeCteSql discipline) so the learn
    * and audit oracles can never desynchronize on rounds, features,
    * or the plant. All gradient sums are exact integer arithmetic;
    * the one double op per weight (floor(g/denominator)) is
    * correctly-rounded IEEE in both engines. */
  /** Escape a Scala string into a single-quoted SQL literal (doubles
    * embedded quotes) — so a future [[BoilerHeader]] containing an
    * apostrophe cannot break the generated oracle. */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** [[StopWords]] as a SQL literal list — the ONE source both engines
    * read. Hand-duplicating the list as SQL literals is exactly the
    * desync class the M11Rounds generated-columns fix closed for m11. */
  private[graft] def stopWordsSql: String = StopWords.map(sqlLit).mkString(",")

  private[graft] def qcCteSql: String = {
    val plantedText = Seq.fill(QcBannerReps)(BoilerHeader).mkString(" ")
    val xs = (1 to 5).map(i => s"x$i")
    val marginSql = xs.zipWithIndex
      .map { case (x, i) => s"w${i + 1}*$x" }.mkString(" + ")
    val rounds = (1 to QcRounds).map { r =>
      val p = r - 1
      val step = 1L << (r - 1)
      val gsums = (1 to 5).map(i =>
        s"CAST(coalesce(sum(y*x$i), 0) AS BIGINT) AS gx$i").mkString(",\n   ")
      val wups = (1 to 5).map(i =>
        s"w$i + CAST(floor(CAST(gx$i AS DOUBLE) / (greatest(nm, 1) * $step))" +
          s" AS BIGINT) AS w$i").mkString(",\n   ")
      s"""gg$r AS (SELECT count(*) AS nm,
         |   $gsums
         | FROM f, ww$p WHERE y * ($marginSql) <= 0),
         | ww$r AS (SELECT
         |   $wups
         | FROM ww$p, gg$r),
         | oo$r AS (SELECT $r AS learn_round, w1, w2, w3, w4, w5,
         |   nm AS n_mistakes FROM ww$r, gg$r)""".stripMargin
    }
    s"""qdocs AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 5 = 0 THEN ${sqlLit(plantedText)} ELSE text END AS text
      |  FROM documents),
      | f0 AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 5 = 0 THEN CAST(-1 AS BIGINT)
      |         ELSE CAST(1 AS BIGINT) END AS y,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS toks,
      |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS ns
      |  FROM qdocs),
      | f AS (
      |  SELECT doc_id, source, y,
      |    CAST(least(len(toks), 100) * 100 AS BIGINT) AS x1,
      |    CAST(CASE WHEN len(toks) > 0 THEN
      |      floor(10000.0 * len(list_distinct(toks)) / len(toks))
      |      ELSE 0 END AS BIGINT) AS x2,
      |    CAST(CASE WHEN len(toks) > 0 THEN
      |      floor(10000.0 * len(list_filter(toks,
      |        t -> t IN ($stopWordsSql))) / len(toks))
      |      ELSE 0 END AS BIGINT) AS x3,
      |    CAST(CASE WHEN len(toks) > 0 THEN
      |      floor(least(CAST(ns AS DOUBLE) / len(toks), 10.0) * 1000)
      |      ELSE 0 END AS BIGINT) AS x4,
      |    CAST(10000 AS BIGINT) AS x5,
      |    (len(toks) BETWEEN 20 AND 1000
      |      AND CAST(ns AS DOUBLE) / len(toks) BETWEEN 3.0 AND 10.0
      |      AND len(list_intersect(list_distinct(toks),
      |            [$stopWordsSql])) >= 2
      |      AND CAST(len(list_filter(toks, x -> regexp_matches(x, '[0-9]')))
      |            AS DOUBLE) / len(toks) <= 0.2) AS pass_t13
      |  FROM f0),
      | ww0 AS (SELECT ${(1 to 5)
        .map(i => s"CAST(0 AS BIGINT) AS w$i").mkString(", ")}),
      | ${rounds.mkString(",\n ")}""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // t44/t45: the shared unrolled perceptron replica — see qcCteSql.
    "t44_quality_learn" -> {
      val selects = (1 to QcRounds)
        .map(r => s"SELECT * FROM oo$r").mkString("\nUNION ALL ")
      s"""WITH $qcCteSql
        |$selects
        |ORDER BY learn_round""".stripMargin
    },

    "t45_quality_audit" -> {
      val marginSql = (1 to 5).map(i => s"w$i*x$i").mkString(" + ")
      s"""WITH $qcCteSql,
        | sc AS (SELECT f.*, ($marginSql) AS margin FROM f, ww$QcRounds)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_planted,
        | CAST(sum(CASE WHEN margin <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_flagged,
        | CAST(sum(CASE WHEN y = -1 AND margin <= 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS tp,
        | CAST(sum(CASE WHEN y = 1 AND margin <= 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS fp,
        | CAST(sum(CASE WHEN pass_t13 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_pass_t13,
        | CAST(sum(CASE WHEN (margin > 0) <> pass_t13 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_disagree
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // t46: the shared merge CTEs applied at (doc_id, lang) granularity
    // (the t43 carry discipline), then t18's gate machinery duplicated
    // for the char and token denominations with the integer kept-mass
    // shares and the gap.
    "t46_token_mixture" -> {
      val applies = (1 to BpeRounds).map { r =>
        val p = r - 1
        s"""te$r AS (SELECT doc_id, lang, freq,
           |          replace(te$p.sy, '#' || m$r.l_sym || '##' || m$r.r_sym || '#',
           |                  '#' || m$r.l_sym || m$r.r_sym || '#') AS sy
           |        FROM te$p, m$r)""".stripMargin
      }
      s"""WITH $bpeCteSql,
        | wd AS (SELECT doc_id, lang, w, count(*) AS freq FROM (
        |    SELECT doc_id, lang,
        |      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |    FROM documents) GROUP BY 1, 2, 3),
        | te0 AS (SELECT doc_id, lang, freq,
        |           '##' || regexp_replace(w, '(.)', '\\1##', 'g') AS sy
        |         FROM wd),
        | ${applies.mkString(",\n ")},
        | pd AS (SELECT doc_id, lang,
        |          CAST(sum(freq * len(list_filter(string_split(sy, '##'),
        |            x -> x <> ''))) AS BIGINT) AS d_tokens
        |        FROM te$BpeRounds GROUP BY 1, 2),
        | tbase AS (SELECT d.doc_id, d.lang, d.n_chars,
        |             coalesce(pd.d_tokens, 0) AS d_tokens
        |           FROM documents d LEFT JOIN pd
        |             ON pd.doc_id = d.doc_id AND pd.lang = d.lang),
        | tstats AS (SELECT lang,
        |              CAST(sum(n_chars) AS BIGINT) AS chars_mass,
        |              CAST(sum(d_tokens) AS BIGINT) AS tokens_mass
        |            FROM tbase GROUP BY 1),
        | tst2 AS (SELECT lang, chars_mass, tokens_mass,
        |            least(1.0, $TempMixC / sqrt(chars_mass)) AS rate_c,
        |            least(1.0, $TokMixC / sqrt(tokens_mass)) AS rate_t,
        |            floor(least(1.0, $TempMixC / sqrt(chars_mass)) * 4096)
        |              AS cut_c,
        |            floor(least(1.0, $TokMixC / sqrt(tokens_mass)) * 4096)
        |              AS cut_t
        |          FROM tstats),
        | tk AS (SELECT b.lang, b.n_chars, b.d_tokens, s.rate_c, s.rate_t,
        |          CASE WHEN ${graft.operators.Sampling.portableGateSql(
             "CAST(b.doc_id AS VARCHAR) || ':tmixc'")} % 4096 < s.cut_c
        |               THEN 1 ELSE 0 END AS keep_c,
        |          CASE WHEN ${graft.operators.Sampling.portableGateSql(
             "CAST(b.doc_id AS VARCHAR) || ':tmixt'")} % 4096 < s.cut_t
        |               THEN 1 ELSE 0 END AS keep_t
        |        FROM tbase b JOIN tst2 s USING (lang)),
        | tper AS (SELECT lang, count(*) AS n_docs,
        |            CAST(sum(n_chars) AS BIGINT) AS chars_mass,
        |            CAST(sum(d_tokens) AS BIGINT) AS tokens_mass,
        |            max(floor(rate_c * 1000000 + 0.5) / 1000000) AS rate_char,
        |            max(floor(rate_t * 1000000 + 0.5) / 1000000) AS rate_tok,
        |            CAST(sum(keep_c) AS BIGINT) AS n_kept_char,
        |            CAST(sum(keep_t) AS BIGINT) AS n_kept_tok,
        |            CAST(sum(CASE WHEN keep_c = 1 THEN n_chars ELSE 0 END)
        |              AS BIGINT) AS chars_kept,
        |            CAST(sum(CASE WHEN keep_t = 1 THEN d_tokens ELSE 0 END)
        |              AS BIGINT) AS tokens_kept
        |          FROM tk GROUP BY lang),
        | tfin AS (SELECT *,
        |            floor((CAST(chars_kept AS DOUBLE)
        |              / CAST(sum(chars_kept) OVER () AS DOUBLE))
        |              * 1000000 + 0.5) / 1000000 AS share_char,
        |            floor((CAST(tokens_kept AS DOUBLE)
        |              / CAST(sum(tokens_kept) OVER () AS DOUBLE))
        |              * 1000000 + 0.5) / 1000000 AS share_tok
        |          FROM tper)
        |SELECT lang, n_docs, chars_mass, tokens_mass, rate_char, rate_tok,
        | n_kept_char, n_kept_tok, chars_kept, tokens_kept,
        | share_char, share_tok,
        | floor((share_tok - share_char) * 1000000 + 0.5) / 1000000
        |   AS share_gap
        |FROM tfin ORDER BY lang""".stripMargin
    },

    // t47: both packers replicate — the 64-token banding, the
    // FFD-shape (n_tok DESC, doc_id) rank, fixed cap = B div band,
    // and the t14 offset scan — integer arithmetic end to end. The
    // oracle ranks with a plain window (ground truth); the Spark side
    // uses the PrefixScan two-pass rank, and their equality certifies
    // the distributed rank (the t23 equivalence discipline).
    "t47_bestfit_pack" ->
      """WITH d AS (SELECT lang, doc_id,
        |    len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      AS n_tok
        |  FROM documents),
        | b AS (SELECT lang, doc_id, n_tok,
        |    greatest(64, ((n_tok + 63) // 64) * 64) AS band FROM d),
        | r AS (SELECT *, greatest(1, 4096 // band) AS cap,
        |    row_number() OVER (PARTITION BY lang, band
        |                       ORDER BY n_tok DESC, doc_id) AS pos
        |  FROM b),
        | sh AS (SELECT lang, band, (pos - 1) // cap AS shard,
        |    sum(n_tok) AS fill
        |  FROM r GROUP BY 1, 2, 3),
        | bfd AS (SELECT lang, count(*) AS bfd_shards,
        |    CAST(sum(greatest(0, 4096 - fill)) AS BIGINT) AS bfd_padding
        |  FROM sh GROUP BY 1),
        | c AS (SELECT lang, doc_id, n_tok,
        |    sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
        |  FROM d),
        | off AS (SELECT lang, count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        |    CAST(sum(CASE WHEN n_tok > 0
        |        AND (cum_tok - 1) // 4096 <> (cum_tok - n_tok) // 4096
        |      THEN 1 ELSE 0 END) AS BIGINT) AS off_straddled
        |  FROM c GROUP BY 1)
        |SELECT off.lang, n_docs, sum_tokens,
        | CAST((sum_tokens + 4095) // 4096 AS BIGINT) AS off_shards,
        | off_straddled,
        | CAST(((sum_tokens + 4095) // 4096) * 4096 - sum_tokens
        |   AS BIGINT) AS off_padding,
        | CAST(bfd_shards AS BIGINT) AS bfd_shards, bfd_padding,
        | CAST(CASE WHEN bfd_shards > 0
        |   THEN (10000 * sum_tokens) // (bfd_shards * 4096)
        |   ELSE 0 END AS BIGINT) AS bfd_fill_e4
        |FROM off JOIN bfd ON bfd.lang = off.lang
        |ORDER BY off.lang""".stripMargin,

    // t42: the shared unrolled merge-round replica; greedy re-pair
    // replicates via the '#'-boundary replace trick — see the query
    // scaladoc.
    "t42_bpe_learn" -> {
      val selects = (1 to BpeRounds)
        .map(r => s"SELECT * FROM o$r").mkString("\nUNION ALL ")
      s"""WITH $bpeCteSql
        |$selects
        |ORDER BY merge_round""".stripMargin
    },

    // t43: the same merge CTEs (m1..mN), applied in learned order to
    // the per-(lang, word) vocabulary; the audit is integer sums with
    // two final divisions.
    "t43_bpe_apply" -> {
      val applies = (1 to BpeRounds).map { r =>
        val p = r - 1
        s"""e$r AS (SELECT lang, w, freq,
           |          replace(e$p.sy, '#' || m$r.l_sym || '##' || m$r.r_sym || '#',
           |                  '#' || m$r.l_sym || m$r.r_sym || '#') AS sy
           |        FROM e$p, m$r)""".stripMargin
      }
      s"""WITH $bpeCteSql,
        | wl AS (SELECT lang, w, count(*) AS freq FROM (
        |    SELECT lang,
        |      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |    FROM documents) GROUP BY 1, 2),
        | e0 AS (SELECT lang, w, freq,
        |          '##' || regexp_replace(w, '(.)', '\\1##', 'g') AS sy
        |        FROM wl),
        | ${applies.mkString(",\n ")},
        | enc AS (SELECT lang, w, freq,
        |           list_filter(string_split(sy, '##'), x -> x <> '') AS a
        |         FROM e$BpeRounds),
        | agg AS (SELECT lang, CAST(sum(freq) AS BIGINT) AS n_words,
        |           CAST(sum(freq * length(w)) AS BIGINT) AS n_chars,
        |           CAST(sum(freq * len(a)) AS BIGINT) AS n_tokens
        |         FROM enc GROUP BY 1),
        | vv AS (SELECT lang, count(DISTINCT sym) AS n_vocab FROM (
        |          SELECT lang, unnest(a) AS sym FROM enc) GROUP BY 1)
        |SELECT agg.lang, n_words, n_chars, n_tokens, vv.n_vocab,
        | floor(CAST(n_tokens AS DOUBLE)/n_words*10000+0.5)/10000 AS fertility,
        | floor(CAST(n_chars AS DOUBLE)/n_tokens*10000+0.5)/10000
        |   AS chars_per_token
        |FROM agg JOIN vv ON vv.lang = agg.lang
        |ORDER BY agg.lang""".stripMargin
    },

    // t22: the composed funnel replicates stage by stage — t13 gate
    // formulas, d01 keeper rule, t16 uniform-gate downsample — so the
    // chained pipeline is verified end-to-end.
    "t22_prep_funnel" ->
      s"""WITH m AS (
        |  SELECT doc_id, lang, text, len(toks) AS n,
        |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS awl,
        |    len(list_intersect(list_distinct(toks),
        |        ['the','a','of','and','to','in'])) AS nstop,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[0-9]'))) AS DOUBLE)
        |      / len(toks) AS digit_frac
        |  FROM (SELECT doc_id, lang, text,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |        FROM documents)),
        | s1 AS (SELECT * FROM m
        |        WHERE n BETWEEN 20 AND 1000 AND awl BETWEEN 3 AND 10
        |          AND nstop >= 2 AND digit_frac <= 0.2),
        | kp AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
        | s2 AS (SELECT * FROM s1 WHERE doc_id IN (SELECT doc_id FROM kp)),
        | s3 AS (SELECT * FROM s2
        |        WHERE ${graft.operators.Sampling.portableGateSql(
                   "CAST(doc_id AS VARCHAR) || ':strat'")} % 4096
        |          < CASE lang WHEN 'en' THEN 0.3 * 4096
        |            WHEN 'de' THEN 0.5 * 4096 WHEN 'es' THEN 1.0 * 4096
        |            WHEN 'fr' THEN 1.0 * 4096 WHEN 'zh' THEN 1.0 * 4096
        |            ELSE 0 END)
        |SELECT 0 AS stage, 'raw' AS stage_name, count(*) AS n_docs,
        |       CAST(sum(n) AS BIGINT) AS sum_tokens FROM m
        |UNION ALL
        |SELECT 1, 'quality_gates', count(*), CAST(sum(n) AS BIGINT) FROM s1
        |UNION ALL
        |SELECT 2, 'exact_dedup', count(*), CAST(sum(n) AS BIGINT) FROM s2
        |UNION ALL
        |SELECT 3, 'stratified_sample', count(*), CAST(sum(n) AS BIGINT) FROM s3
        |ORDER BY stage""".stripMargin,

    // t20: plain hash-diff replica.
    "t20_dataset_diff" ->
      """WITH b AS (SELECT doc_id, text FROM documents),
        | v1 AS (SELECT doc_id, md5(text) AS h1 FROM b WHERE doc_id % 5 < 3),
        | v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN md5(text || '!')
        |         ELSE md5(text) END AS h2
        |  FROM b WHERE doc_id % 5 < 3 AND doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id, md5(text) AS h2 FROM b WHERE doc_id % 5 = 3),
        | j AS (SELECT v1.h1, v2.h2
        |       FROM v1 FULL OUTER JOIN v2 USING (doc_id))
        |SELECT
        | CAST(sum(CASE WHEN h1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        | CAST(sum(CASE WHEN h2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        | CAST(sum(CASE WHEN h1 IS NOT NULL AND h2 IS NOT NULL AND h1 <> h2
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        | CAST(sum(CASE WHEN h1 = h2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
        | count(*) AS n_union
        |FROM j""".stripMargin,

    // t21: id + content-hash cascade replica, with the same simulated
    // copy plant (doc at takedown_id + 1 carries the takedown doc's
    // content).
    "t21_takedown_cascade" ->
      """WITH docs AS (
        |  SELECT b.doc_id, md5(coalesce(a.text, b.text)) AS h
        |  FROM documents b LEFT JOIN documents a
        |    ON b.doc_id % 97 = 1 AND a.doc_id = b.doc_id - 1),
        | td AS (SELECT doc_id FROM docs WHERE doc_id % 97 = 0),
        | th AS (SELECT DISTINCT h FROM docs WHERE doc_id IN (SELECT doc_id FROM td)),
        | byid AS (SELECT * FROM docs WHERE doc_id IN (SELECT doc_id FROM td)),
        | bycontent AS (
        |  SELECT * FROM docs
        |  WHERE doc_id NOT IN (SELECT doc_id FROM td)
        |    AND h IN (SELECT h FROM th)),
        | clean AS (
        |  SELECT * FROM docs
        |  WHERE doc_id NOT IN (SELECT doc_id FROM td)
        |    AND h NOT IN (SELECT h FROM th)),
        | cleanemb AS (
        |  SELECT vec_id FROM embeddings
        |  WHERE vec_id NOT IN (SELECT doc_id FROM docs
        |                       WHERE h IN (SELECT h FROM th)))
        |SELECT (SELECT count(*) FROM td) AS n_takedown_ids,
        | (SELECT count(*) FROM byid) AS n_removed_by_id,
        | (SELECT count(*) FROM bycontent) AS n_removed_by_content,
        | (SELECT count(*) FROM clean) AS n_docs_left,
        | (SELECT count(*) FROM cleanemb) AS n_vecs_left""".stripMargin,

    // t23: the oracle deliberately uses the NAIVE single-window top-N —
    // hash equality proves the shipped two-phase salted form selects
    // the identical rows.
    "t23_source_cap" ->
      s"""WITH g AS (
        |  SELECT doc_id, source,
        |    ${graft.operators.Sampling.portableGateSql(
               "CAST(doc_id AS VARCHAR) || ':cap'")} AS g
        |  FROM documents),
        | kept AS (SELECT doc_id, source FROM (
        |    SELECT doc_id, source,
        |      row_number() OVER (PARTITION BY source ORDER BY g, doc_id) AS rn
        |    FROM g) WHERE rn <= 10),
        | tot AS (SELECT source, count(*) AS n_docs FROM g GROUP BY 1),
        | ks AS (SELECT source, count(*) AS n_kept,
        |          CAST(sum(doc_id) AS BIGINT) AS kept_id_sum,
        |          min(doc_id) AS min_kept_id,
        |          max(doc_id) AS max_kept_id
        |        FROM kept GROUP BY 1)
        |SELECT tot.source, n_docs, n_kept,
        |       n_docs - n_kept AS n_dropped,
        |       kept_id_sum, min_kept_id, max_kept_id
        |FROM tot JOIN ks USING (source) ORDER BY tot.source""".stripMargin,

    // t24: shard assignment and the order-independent gate-sum checksum
    // replicate exactly.
    "t24_release_manifest" ->
      s"""WITH d AS (
        |  SELECT doc_id, text, n_chars,
        |    ${graft.operators.Sampling.portableGateSql(
               "CAST(doc_id AS VARCHAR) || ':shard'")} % 16 AS shard
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       min(doc_id) AS min_doc_id,
        |       max(doc_id) AS max_doc_id,
        |       CAST(sum(${graft.operators.Sampling.portableGateSql("text")})
        |            AS BIGINT) AS content_chk
        |FROM d GROUP BY shard ORDER BY shard""".stripMargin,

    // t19: min/max, 64-bin histogram, cumulative cut buckets, the
    // heavy-tail refinement pass (second 64-bin histogram over the cut
    // range with the below-range mass as a cumulative offset), and the
    // two-level per-doc re-bucketing gate all replicate in portable
    // arithmetic.
    "t19_length_winsorize" ->
      """WITH v AS (SELECT lang, CAST(n_chars AS DOUBLE) AS v FROM documents),
        | mm AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
        | bk AS (SELECT lang, v,
        |          CASE WHEN hi = lo THEN 0
        |               ELSE CAST(least(floor((v - lo) / (hi - lo) * 64), 63)
        |                         AS BIGINT) END AS b1
        |        FROM v CROSS JOIN mm),
        | h AS (SELECT b1 AS bucket, count(*) AS n FROM bk GROUP BY 1),
        | c AS (SELECT bucket, sum(n) OVER (ORDER BY bucket
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         (SELECT sum(n) FROM h) AS ntot
        |       FROM h),
        | cuts AS (SELECT
        |   min(CASE WHEN cum >= CAST(ceil(ntot * 0.01) AS BIGINT)
        |       THEN bucket END) AS b_lo,
        |   min(CASE WHEN cum >= CAST(ceil(ntot * 0.99) AS BIGINT)
        |       THEN bucket END) AS b_hi,
        |   CAST(max(ntot) AS BIGINT) AS ntot
        |  FROM c),
        | bounds AS (SELECT b_lo, b_hi, ntot, lo, hi,
        |   lo + b_lo * (hi - lo) / 64 AS lo2,
        |   lo + (b_hi + 1) * (hi - lo) / 64 AS hi2
        |  FROM cuts CROSS JOIN mm),
        | bk2 AS (SELECT lang, v, b1, b_lo, b_hi, ntot, lo2, hi2,
        |          CASE WHEN hi2 = lo2 THEN 0
        |               ELSE CAST(least(floor((v - lo2) / (hi2 - lo2) * 64), 63)
        |                         AS BIGINT) END AS b2
        |         FROM bk CROSS JOIN bounds),
        | nb AS (SELECT count(*) AS n_below FROM bk2 WHERE b1 < b_lo),
        | h2 AS (SELECT b2, count(*) AS n2 FROM bk2
        |        WHERE b1 BETWEEN b_lo AND b_hi GROUP BY 1),
        | c2 AS (SELECT b2, sum(n2) OVER (ORDER BY b2
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
        |        FROM h2),
        | cuts2 AS (SELECT
        |   min(CASE WHEN n_below + cum2 >= CAST(ceil(ntot * 0.01) AS BIGINT)
        |       THEN b2 END) AS b2_lo,
        |   min(CASE WHEN n_below + cum2 >= CAST(ceil(ntot * 0.99) AS BIGINT)
        |       THEN b2 END) AS b2_hi
        |  FROM c2 CROSS JOIN nb CROSS JOIN cuts)
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(CASE WHEN b1 < b_lo OR (b1 <= b_hi AND b2 < b2_lo)
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
        | CAST(sum(CASE WHEN b1 > b_hi OR (b1 >= b_lo AND b2 > b2_hi)
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
        | CAST(sum(CASE WHEN b1 BETWEEN b_lo AND b_hi
        |               AND b2 BETWEEN b2_lo AND b2_hi
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | floor((max(lo2 + b2_lo * (hi2 - lo2) / 64))*100+0.5)/100 AS t_lo,
        | floor((max(lo2 + (b2_hi + 1) * (hi2 - lo2) / 64))*100+0.5)/100 AS t_hi
        |FROM bk2 CROSS JOIN cuts2
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // t15: the md5-nibble order key and shard assignment replicate
    // verbatim, so the ORDER itself (head_ids) is oracle-verified —
    // determinism is the contract, not just balance.
    "t15_corpus_shuffle" ->
      s"""WITH g AS (
        |  SELECT doc_id,
        |    ${graft.operators.Sampling.portableGateSql(
             "CAST(doc_id AS VARCHAR) || ':graftshuffle42'")} AS skey
        |  FROM documents),
        | s AS (SELECT doc_id, skey, skey % 16 AS shard FROM g),
        | b AS (SELECT shard, count(*) AS n FROM s GROUP BY shard),
        | h AS (SELECT array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY skey, doc_id), ',')
        |         AS head_ids
        |       FROM (SELECT doc_id, skey FROM s ORDER BY skey, doc_id LIMIT 5))
        |SELECT (SELECT count(*) FROM b) AS n_shards,
        | (SELECT CAST(min(n) AS BIGINT) FROM b) AS min_shard_docs,
        | (SELECT CAST(max(n) AS BIGINT) FROM b) AS max_shard_docs,
        | (SELECT head_ids FROM h) AS head_ids""".stripMargin,

    // t16: gate arithmetic and per-stratum cuts replicate verbatim —
    // the achieved per-lang keep counts are the check, not nominal rates.
    "t16_stratified_sample" ->
      s"""WITH g AS (
        |  SELECT lang,
        |    ${graft.operators.Sampling.portableGateSql(
             "CAST(doc_id AS VARCHAR) || ':strat'")} % 4096 AS gate
        |  FROM documents),
        | k AS (SELECT lang,
        |   CASE WHEN gate < CASE lang WHEN 'en' THEN 0.3 * 4096
        |     WHEN 'de' THEN 0.5 * 4096 WHEN 'es' THEN 1.0 * 4096
        |     WHEN 'fr' THEN 1.0 * 4096 WHEN 'zh' THEN 1.0 * 4096
        |     ELSE 0 END THEN 1 ELSE 0 END AS kept
        |  FROM g)
        |SELECT lang, count(*) AS n_docs, CAST(sum(kept) AS BIGINT) AS n_kept,
        | floor((CAST(sum(kept) AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000
        |   AS kept_rate
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    // t17: the whole pipeline replicates — planting, chunking, the
    // doc-frequency cut, and the ORDER BY j reassembly — so the rebuilt
    // text md5s pin chunk order, not just counts.
    "t17_boilerplate_prune" ->
      s"""WITH pl AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 5 = 0 THEN '$BoilerHeader ' || text
        |         ELSE text END AS text
        |  FROM documents),
        | t AS (SELECT doc_id, lang,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |       FROM pl),
        | m AS (SELECT doc_id, lang, tk, len(tk) AS n FROM t),
        | st AS (
        |  SELECT doc_id, lang, tk,
        |    unnest(range(0, greatest(CAST(ceil(n / ${BoilerW.toDouble})
        |                                  AS BIGINT) - 1, 0) + 1)) AS j
        |  FROM m),
        | ch AS (
        |  SELECT lang, doc_id, j,
        |    list_slice(tk, j * $BoilerW + 1, j * $BoilerW + $BoilerW)
        |      AS chunk_toks
        |  FROM st),
        | ch2 AS (SELECT lang, doc_id, j, chunk_toks,
        |           md5(array_to_string(chunk_toks, ' ')) AS chunk_md5
        |         FROM ch),
        | boiler AS (
        |  SELECT chunk_md5 FROM (
        |    SELECT chunk_md5, count(DISTINCT doc_id) AS df
        |    FROM ch2 GROUP BY 1) WHERE df >= $BoilerK),
        | kept AS (SELECT * FROM ch2
        |          WHERE chunk_md5 NOT IN (SELECT chunk_md5 FROM boiler)),
        | reb AS (
        |  SELECT lang, doc_id,
        |    array_to_string(flatten(list(chunk_toks ORDER BY j)), ' ')
        |      AS new_text,
        |    sum(len(chunk_toks)) AS tok_after
        |  FROM kept GROUP BY lang, doc_id),
        | bef AS (SELECT doc_id, lang,
        |           len(list_filter(string_split(text, ' '), x -> x <> ''))
        |             AS tok_before
        |         FROM pl),
        | acc AS (
        |  SELECT b.lang, b.tok_before,
        |    coalesce(r.tok_after, 0) AS tok_after,
        |    coalesce(r.new_text, '') AS new_text
        |  FROM bef b LEFT JOIN reb r USING (doc_id))
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(CASE WHEN tok_after < tok_before THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_docs_pruned,
        | CAST(sum(tok_before) AS BIGINT) AS sum_tok_before,
        | CAST(sum(tok_after) AS BIGINT) AS sum_tok_after,
        | min(md5(new_text)) AS min_rebuilt_md5,
        | max(md5(new_text)) AS max_rebuilt_md5
        |FROM acc GROUP BY lang ORDER BY lang""".stripMargin,

    // t18: per-source √-temperature rate, integer char sums, and the
    // md5 gate replicate verbatim; every double op in the gate chain
    // (÷, ×, √, floor) is correctly rounded, so keep decisions are
    // bit-identical (the scaladoc explains why the normalizer is a
    // constant, not a Σ over doubles).
    "t18_temp_mixture" ->
      s"""WITH stats AS (
        |  SELECT source,
        |    least(1.0, $TempMixC / sqrt(CAST(sum(n_chars) AS BIGINT)))
        |      AS rate
        |  FROM documents GROUP BY source),
        | st2 AS (SELECT source, rate, floor(rate * 4096) AS cut FROM stats),
        | g AS (
        |  SELECT d.source, d.n_chars, s.rate, s.cut,
        |    ${graft.operators.Sampling.portableGateSql(
             "CAST(doc_id AS VARCHAR) || ':tmix'")} % 4096
        |      AS gate
        |  FROM documents d JOIN st2 s USING (source)),
        | k AS (SELECT source, n_chars, rate,
        |         CASE WHEN gate < cut THEN 1 ELSE 0 END AS keep
        |       FROM g),
        | per AS (
        |  SELECT source, count(*) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_kept,
        |    max(floor(rate * 1000000 + 0.5) / 1000000) AS rate_nominal,
        |    CAST(sum(n_chars) AS BIGINT) AS chars_before,
        |    CAST(sum(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT)
        |      AS chars_kept
        |  FROM k GROUP BY source)
        |SELECT source, n_docs, n_kept, rate_nominal,
        | floor((CAST(n_kept AS DOUBLE) / n_docs) * 10000 + 0.5) / 10000
        |   AS rate_achieved,
        | chars_before, chars_kept,
        | floor((CAST(chars_kept AS DOUBLE)
        |        / CAST(sum(chars_kept) OVER () AS DOUBLE)) * 1000000 + 0.5)
        |   / 1000000 AS share_after
        |FROM per ORDER BY source""".stripMargin,

    "t14_shard_pack" ->
      """WITH d AS (
        |  SELECT lang, doc_id,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
        |  FROM documents),
        | c AS (
        |  SELECT lang, doc_id, n_tok,
        |    sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_tok
        |  FROM d)
        |SELECT lang, CAST((cum_tok - n_tok) // 4096 AS BIGINT) AS shard,
        | count(*) AS n_docs,
        | CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t12_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        | g AS (
        |  SELECT doc_id, lang, len(toks) AS n,
        |    CASE WHEN len(toks) >= 2
        |      THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |      ELSE [] END AS grams
        |  FROM base),
        | d AS (
        |  SELECT doc_id, lang, n,
        |    CASE WHEN len(grams) > 0
        |      THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
        |      ELSE 0.0 END AS dup2
        |  FROM g),
        | tc AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(toks) AS tok FROM base) GROUP BY 1, 2),
        | top AS (SELECT doc_id, max(c) AS top_cnt FROM tc GROUP BY 1)
        |SELECT d.lang, count(*) AS n_docs,
        | floor(avg(d.dup2)*10000+0.5)/10000 AS avg_dup2,
        | floor(avg(CAST(top.top_cnt AS DOUBLE)/d.n)*10000+0.5)/10000 AS avg_topfrac,
        | CAST(sum(CASE WHEN d.dup2 > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dup,
        | CAST(sum(CASE WHEN CAST(top.top_cnt AS DOUBLE)/d.n > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_top
        |FROM d JOIN top ON d.doc_id = top.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "t13_quality_gates" ->
      """WITH m AS (
        |  SELECT source, len(toks) AS n,
        |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS awl,
        |    len(list_intersect(list_distinct(toks),
        |        ['the','a','of','and','to','in'])) AS nstop,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[0-9]'))) AS DOUBLE)
        |      / len(toks) AS digit_frac
        |  FROM (SELECT source, text,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |        FROM documents))
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN n BETWEEN 20 AND 1000 THEN 1 ELSE 0 END) AS BIGINT) AS pass_len,
        | CAST(sum(CASE WHEN awl BETWEEN 3 AND 10 THEN 1 ELSE 0 END) AS BIGINT) AS pass_wordlen,
        | CAST(sum(CASE WHEN nstop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_stopwords,
        | CAST(sum(CASE WHEN digit_frac <= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_digits,
        | CAST(sum(CASE WHEN n BETWEEN 20 AND 1000 AND awl BETWEEN 3 AND 10
        |   AND nstop >= 2 AND digit_frac <= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "t01_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(list_filter(string_split(text,' '), t -> t <> ''))) AS BIGINT) AS sum_tokens,
        | floor((avg(len(list_filter(string_split(text,' '), t -> t <> ''))))*10000+0.5)/10000 AS avg_tokens,
        | floor((avg(n_chars))*10000+0.5)/10000 AS avg_chars,
        | CAST(max(len(list_filter(string_split(text,' '), t -> t <> ''))) AS BIGINT) AS max_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "t02_quality_score" ->
      """WITH m AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split(text,' '), t -> t <> '')) AS DOUBLE) AS n_tokens,
        |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) AS nonspace,
        |    CAST(len(list_filter(string_split(text,' '),
        |         t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE) AS stop_hits
        |  FROM documents),
        | q AS (
        |  SELECT source, n_tokens,
        |    nonspace / n_tokens AS avg_tok_len,
        |    stop_hits / n_tokens AS stop_ratio,
        |    least(n_tokens/100.0, 1.0)*0.4
        |      + (CASE WHEN nonspace/n_tokens BETWEEN 3.0 AND 8.0 THEN 0.3 ELSE 0.0 END)
        |      + least(stop_hits/n_tokens*3.0, 0.3) AS quality
        |  FROM m)
        |SELECT source, count(*) AS n_docs,
        | floor((avg(n_tokens))*10000+0.5)/10000 AS avg_tokens,
        | floor((avg(avg_tok_len))*10000+0.5)/10000 AS avg_tok_len,
        | floor((avg(stop_ratio))*10000+0.5)/10000 AS avg_stop_ratio,
        | floor((avg(quality))*10000+0.5)/10000 AS avg_quality,
        | floor((min(quality))*10000+0.5)/10000 AS min_quality,
        | floor((max(quality))*10000+0.5)/10000 AS max_quality
        |FROM q GROUP BY source ORDER BY source""".stripMargin,

    "t03_langid" ->
      """WITH t AS (
        |  SELECT lang, list_filter(string_split(text,' '), t -> t <> '') AS toks
        |  FROM documents),
        | p AS (
        |  SELECT lang,
        |    CASE
        |      WHEN len(list_filter(toks, t -> t IN ('de5','shi4','le5'))) > 0 THEN 'zh'
        |      WHEN len(list_filter(toks, t -> t IN ('le','les','une'))) > 0 THEN 'fr'
        |      WHEN len(list_filter(toks, t -> t IN ('el','los','que'))) > 0 THEN 'es'
        |      WHEN len(list_filter(toks, t -> t IN ('der','und','das'))) > 0 THEN 'de'
        |      ELSE 'en' END AS predicted
        |  FROM t)
        |SELECT lang, predicted, count(*) AS n FROM p
        |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,

    "t05_bpe_tokens" ->
      """WITH t AS (
        |  SELECT lang,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]+')) AS n_pieces,
        |    len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]+'))) AS n_distinct
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_pieces) AS BIGINT) AS sum_pieces,
        | floor((avg(n_pieces))*10000+0.5)/10000 AS avg_pieces,
        | floor((avg(CAST(n_distinct AS DOUBLE)/n_pieces))*10000+0.5)/10000 AS avg_distinct_ratio
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    // t32: t28's hashing with stride-8 full windows; detection stats
    // plus the gate-sum checksum of the flagged (non-first) windows.
    "t32_sliding_dedup" ->
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |  FROM documents),
        | m AS (SELECT doc_id, source, tk, len(tk) AS n FROM t
        |       WHERE len(tk) >= $ChunkDedupW),
        | st AS (
        |  SELECT doc_id, source, tk, n,
        |    unnest(range(0, (n - $ChunkDedupW) // 8 + 1)) AS j
        |  FROM m),
        | ch AS (
        |  SELECT source, doc_id, j,
        |    md5(array_to_string(list_slice(tk, j * 8 + 1,
        |                                   j * 8 + $ChunkDedupW),
        |                        ' ')) AS h
        |  FROM st),
        | k AS (
        |  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, j)
        |    AS rn
        |  FROM ch)
        |SELECT source, count(*) AS n_windows,
        | CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_dup_windows,
        | CAST(count(DISTINCT CASE WHEN rn > 1 THEN doc_id END) AS BIGINT)
        |   AS n_docs_hit,
        | floor((CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*))*10000+0.5)/10000 AS dup_frac,
        | CAST(sum(CASE WHEN rn > 1
        |   THEN ${graft.operators.Sampling.portableGateSql("h")}
        |   ELSE 0 END) AS BIGINT) AS dup_chk
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    // t31: same census/vocab/freeze chain — top-16 vocab by
    // (count DESC, token), rates by integral e6 division, integer
    // weights, one final IEEE division per double column.
    "t31_domain_reweight" ->
      """WITH tk AS (
        |  SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents),
        | vocab AS (SELECT tok FROM (
        |    SELECT tok, count(*) AS c FROM tk GROUP BY tok
        |    ORDER BY c DESC, tok LIMIT 16)),
        | ps AS (
        |  SELECT source, count(*) AS tokens,
        |    CAST(sum(CASE WHEN tok NOT IN (SELECT tok FROM vocab)
        |             THEN 1 ELSE 0 END) AS BIGINT) AS rare
        |  FROM tk GROUP BY source),
        | tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS t_tok,
        |                CAST(sum(rare) AS BIGINT) AS t_rare FROM ps),
        | w AS (
        |  SELECT source, CAST(tokens AS BIGINT) AS tokens, rare,
        |    CAST((rare * 1000000) // tokens AS BIGINT) AS rate_e6,
        |    CAST(greatest(0, (rare * 1000000) // tokens
        |                     - (t_rare * 1000000) // t_tok) AS BIGINT) AS excess_e6,
        |    CAST(tokens * (1000000 + 10 * greatest(0,
        |      (rare * 1000000) // tokens - (t_rare * 1000000) // t_tok))
        |      AS BIGINT) AS w_raw,
        |    t_tok
        |  FROM ps CROSS JOIN tot),
        | wt AS (SELECT CAST(sum(w_raw) AS BIGINT) AS w_tot FROM w)
        |SELECT source, tokens, rare, rate_e6, excess_e6, w_raw,
        | floor((CAST(w_raw AS DOUBLE) / w_tot)*10000+0.5)/10000 AS p_sample,
        | floor(((CAST(w_raw AS DOUBLE) / w_tot) *
        |        (CAST(t_tok AS DOUBLE) / tokens))*10000+0.5)/10000 AS eff_epochs
        |FROM w CROSS JOIN wt ORDER BY source""".stripMargin,

    // t30: same t05 pre-tokenization; fertility is the ratio of SUMS
    // (integer-exact before the one double divide), strlen = UTF-8
    // bytes = Spark octet_length.
    "t30_tokenizer_fertility" ->
      """WITH t AS (
        |  SELECT lang, source,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]+')) AS n_pieces,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
        |    strlen(text) AS n_bytes
        |  FROM documents)
        |SELECT lang, source, count(*) AS n_docs,
        | CAST(sum(n_pieces) AS BIGINT) AS sum_pieces,
        | CAST(sum(n_words) AS BIGINT) AS sum_words,
        | floor((CAST(sum(n_pieces) AS DOUBLE)/sum(n_words))*10000+0.5)/10000 AS fertility,
        | floor((CAST(sum(n_bytes) AS DOUBLE)/sum(n_pieces))*10000+0.5)/10000 AS bytes_per_token,
        | (CAST(sum(n_pieces) AS DOUBLE)/sum(n_words)) > 1.8 AS over_fertile
        |FROM t WHERE n_words > 0 AND n_pieces > 0
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "t04_fingerprint" ->
      """WITH fp AS (
        |  SELECT md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                            ' +', ' ', 'g')) AS fp
        |  FROM documents),
        | g AS (SELECT fp, count(*) AS n_docs FROM fp GROUP BY fp)
        |SELECT count(*) AS n_fingerprints,
        | CAST(sum(n_docs) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN n_docs > 1 THEN n_docs ELSE 0 END) AS BIGINT) AS docs_in_dup_groups,
        | CAST(max(n_docs) AS BIGINT) AS largest_group
        |FROM g""".stripMargin,

    "t08_top_tokens" ->
      """WITH t AS (
        |  SELECT lang,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents),
        | c AS (SELECT lang, token, count(*) AS n FROM t GROUP BY lang, token),
        | r AS (
        |  SELECT lang, token, n, row_number()
        |    OVER (PARTITION BY lang ORDER BY n DESC, token) AS rank
        |  FROM c)
        |SELECT lang, CAST(rank AS INTEGER) AS rank, token, n
        |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    "t06_redact" ->
      """WITH r AS (
        |  SELECT c_mktsegment,
        |    regexp_replace(c_name, '[0-9]+', '[ID]', 'g') AS red,
        |    len(regexp_extract_all(c_name, '[0-9]+')) AS n_red
        |  FROM customer)
        |SELECT c_mktsegment, count(*) AS n_rows,
        | CAST(sum(n_red) AS BIGINT) AS n_redactions,
        | count(DISTINCT red) AS n_distinct_redacted,
        | CAST(sum(length(red)) AS BIGINT) AS sum_red_len
        |FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // t09: same window/stride arithmetic and md5 chunk fingerprints;
    // list_slice is 1-based inclusive like Spark's slice(arr, start, n).
    "t09_chunk_stats" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |  FROM documents),
        | m AS (SELECT doc_id, lang, tk, len(tk) AS n FROM t),
        | st AS (
        |  SELECT doc_id, lang, tk, n,
        |    unnest(range(0, greatest(CAST(ceil((n - $ChunkW) / ${ChunkS.toDouble})
        |                                  AS BIGINT), 0) + 1)) AS j
        |  FROM m),
        | ch AS (
        |  SELECT lang, doc_id,
        |    least($ChunkW, n - j * $ChunkS) AS chunk_len,
        |    md5(array_to_string(list_slice(tk, j * $ChunkS + 1,
        |                                   j * $ChunkS + $ChunkW), ' ')) AS chunk_md5
        |  FROM st)
        |SELECT lang, count(DISTINCT doc_id) AS n_docs,
        | count(*) AS n_chunks,
        | CAST(sum(chunk_len) AS BIGINT) AS sum_chunk_tokens,
        | count(DISTINCT chunk_md5) AS n_distinct_chunks,
        | floor((avg(chunk_len))*10000+0.5)/10000 AS avg_chunk_len
        |FROM ch GROUP BY lang ORDER BY lang""".stripMargin,

    // t29: the PLAIN exact semi join — the bloom prefilter is a
    // physical optimization that must be indistinguishable from no
    // prefilter (the q47 discipline); same 8-gram md5 construction as
    // t11, same planted verbatim copies, gate-sum checksum over the
    // flagged ids.
    "t29_benchmark_decontam" ->
      s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
        | pool AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id >= 50
        |  UNION ALL
        |  SELECT doc_id + 700000 AS doc_id, 'planted' AS source, text
        |  FROM bench WHERE doc_id % 2 = 0),
        | btk AS (SELECT doc_id,
        |           list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |         FROM bench),
        | ptk AS (SELECT doc_id,
        |           list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |         FROM pool),
        | bg AS (
        |  SELECT DISTINCT gr FROM (
        |    SELECT unnest(CASE WHEN len(tk) >= 8
        |      THEN list_transform(range(1, len(tk) - 6),
        |             i -> md5(array_to_string(list_slice(tk, i, i + 7), ' ')))
        |      ELSE [md5(array_to_string(tk, ' '))] END) AS gr
        |    FROM btk)),
        | pg AS (
        |  SELECT DISTINCT doc_id, gr FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(tk) >= 8
        |      THEN list_transform(range(1, len(tk) - 6),
        |             i -> md5(array_to_string(list_slice(tk, i, i + 7), ' ')))
        |      ELSE [md5(array_to_string(tk, ' '))] END) AS gr
        |    FROM ptk)),
        | fl AS (SELECT DISTINCT doc_id FROM pg
        |        WHERE gr IN (SELECT gr FROM bg))
        |SELECT p.source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN fl.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_flagged,
        | CAST(sum(CASE WHEN fl.doc_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_kept,
        | CAST(sum(CASE WHEN fl.doc_id IS NOT NULL THEN
        |   ${graft.operators.Sampling.portableGateSql(
             "CAST(p.doc_id AS VARCHAR) || ':decon'")}
        |   ELSE 0 END) AS BIGINT) AS flagged_chk
        |FROM pool p LEFT JOIN fl ON fl.doc_id = p.doc_id
        |GROUP BY p.source ORDER BY p.source""".stripMargin,

    // t28: identical non-overlapping chunking, md5 fingerprints, and
    // keep-first (doc_id, j) window; checksum = portable gate sum over
    // the kept set (order-independent, like t24).
    "t28_chunk_dedup" ->
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |  FROM documents),
        | m AS (SELECT doc_id, source, tk, len(tk) AS n FROM t
        |       WHERE len(tk) > 0),
        | st AS (
        |  SELECT doc_id, source, tk, n,
        |    unnest(range(0, CAST(ceil(n / ${ChunkDedupW.toDouble}) AS BIGINT)))
        |      AS j
        |  FROM m),
        | ch AS (
        |  SELECT source, doc_id, j,
        |    least($ChunkDedupW, n - j * $ChunkDedupW) AS chunk_len,
        |    md5(array_to_string(list_slice(tk, j * $ChunkDedupW + 1,
        |                                   j * $ChunkDedupW + $ChunkDedupW),
        |                        ' ')) AS h
        |  FROM st),
        | k AS (
        |  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, j)
        |    AS rn
        |  FROM ch)
        |SELECT source, count(*) AS n_chunks,
        | CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_dup_chunks,
        | CAST(sum(chunk_len) AS BIGINT) AS tokens_total,
        | CAST(sum(CASE WHEN rn = 1 THEN chunk_len ELSE 0 END) AS BIGINT)
        |   AS tokens_kept,
        | floor((CAST(sum(CASE WHEN rn = 1 THEN chunk_len ELSE 0 END)
        |             AS DOUBLE) / sum(chunk_len))*10000+0.5)/10000
        |   AS retained_frac,
        | CAST(sum(CASE WHEN rn = 1
        |   THEN ${graft.operators.Sampling.portableGateSql("h")}
        |   ELSE 0 END) AS BIGINT) AS kept_chk
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    // t10: BM25-form idf — rational arithmetic only, so scores are
    // bit-identical across engines (ln() is libm-dependent and is
    // deliberately avoided; see the query scaladoc).
    "t10_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents),
        | tf AS (SELECT lang, token, count(*) AS tf FROM tok GROUP BY lang, token),
        | df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
        | n AS (SELECT count(*) AS nd FROM documents),
        | sc AS (
        |  SELECT lang, token, tf, df,
        |    tf * ((nd - df + 0.5) / (df + 0.5)) AS score
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        | r AS (
        |  SELECT lang, token, tf, df, score, row_number()
        |    OVER (PARTITION BY lang ORDER BY score DESC, token) AS rank
        |  FROM sc)
        |SELECT lang, CAST(rank AS INTEGER) AS rank, token,
        | CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        | floor((score)*10000+0.5)/10000 AS score
        |FROM r WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,

    // t11: same portable gate as t07, same planted train copies, same
    // md5'd word 8-grams — the contamination counts are ground truth
    // recomputed from scratch, not a replay of the Spark plan.
    "t11_contamination" ->
      s"""WITH g AS (
        |  SELECT doc_id, lang, text,
        |    ${graft.operators.Sampling.portableGateSql(
             "CAST(doc_id AS VARCHAR)")} % 10 AS gate
        |  FROM documents),
        | ev AS (SELECT doc_id, lang, text FROM g WHERE gate < 2),
        | tr AS (
        |  SELECT doc_id, lang, text FROM g WHERE gate >= 2
        |  UNION ALL
        |  SELECT doc_id + 500000 AS doc_id, lang, text FROM ev WHERE doc_id < 300),
        | evtk AS (SELECT doc_id, lang,
        |            list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM ev),
        | trtk AS (SELECT doc_id,
        |            list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM tr),
        | evg AS (
        |  SELECT DISTINCT doc_id, lang, gr FROM (
        |    SELECT doc_id, lang, unnest(CASE WHEN len(tk) >= 8
        |      THEN list_transform(range(1, len(tk) - 6),
        |             i -> md5(array_to_string(list_slice(tk, i, i + 7), ' ')))
        |      ELSE [md5(array_to_string(tk, ' '))] END) AS gr
        |    FROM evtk)),
        | trg AS (
        |  SELECT DISTINCT gr FROM (
        |    SELECT unnest(CASE WHEN len(tk) >= 8
        |      THEN list_transform(range(1, len(tk) - 6),
        |             i -> md5(array_to_string(list_slice(tk, i, i + 7), ' ')))
        |      ELSE [md5(array_to_string(tk, ' '))] END) AS gr
        |    FROM trtk)),
        | contam AS (
        |  SELECT DISTINCT doc_id, lang FROM evg WHERE gr IN (SELECT gr FROM trg)),
        | e AS (SELECT lang, count(*) AS n_eval_docs FROM ev GROUP BY lang),
        | c AS (SELECT lang, count(*) AS n_contaminated FROM contam GROUP BY lang)
        |SELECT e.lang, e.n_eval_docs,
        | CAST(coalesce(c.n_contaminated, 0) AS BIGINT) AS n_contaminated,
        | floor((CAST(coalesce(c.n_contaminated, 0) AS DOUBLE) / e.n_eval_docs)
        |   *10000+0.5)/10000 AS contamination_rate
        |FROM e LEFT JOIN c ON e.lang = c.lang ORDER BY e.lang""".stripMargin,

    // Recomputes Sampling.splitPortable's md5-nibble gate verbatim —
    // every per-(split, lang) count must agree, not just the fractions.
    "t07_split_stats" ->
      s"""WITH g AS (
        |  SELECT lang, n_chars,
        |    ${graft.operators.Sampling.portableGateSql(
             "CAST(doc_id AS VARCHAR)")} % 10 AS gate
        |  FROM documents),
        | s AS (
        |  SELECT CASE WHEN gate < 2 THEN 'eval' ELSE 'train' END AS split,
        |    lang, n_chars
        |  FROM g)
        |SELECT split, lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    // t25: full CMS replica — same salted portableGate hash family,
    // same 4×64 table, min-over-rows estimate, exact top-10 probe.
    "t25_cms_heavy_hitters" ->
      s"""WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS token
        |  FROM documents),
        | hx AS (
        |  SELECT token, i AS hrow,
        |    ${graft.operators.Sampling.portableGateSql(
             "'cms' || CAST(i AS VARCHAR) || ':' || token")} % 64 AS bucket
        |  FROM tok, (SELECT unnest(range(1, 5)) AS i)),
        | sk AS (SELECT hrow, bucket, count(*) AS cnt FROM hx
        |        GROUP BY hrow, bucket),
        | ex AS (SELECT token, count(*) AS n_exact FROM tok GROUP BY token),
        | top AS (SELECT token, n_exact FROM ex
        |         ORDER BY n_exact DESC, token LIMIT 10),
        | pb AS (
        |  SELECT t.token, t.n_exact, i AS hrow,
        |    ${graft.operators.Sampling.portableGateSql(
             "'cms' || CAST(i AS VARCHAR) || ':' || t.token")} % 64 AS bucket
        |  FROM top t, (SELECT unnest(range(1, 5)) AS i)),
        | est AS (
        |  SELECT p.token, p.n_exact, CAST(min(s.cnt) AS BIGINT) AS n_est
        |  FROM pb p JOIN sk s ON s.hrow = p.hrow AND s.bucket = p.bucket
        |  GROUP BY p.token, p.n_exact),
        | r AS (SELECT token, n_exact, n_est,
        |         row_number() OVER (ORDER BY n_exact DESC, token) AS rank
        |       FROM est)
        |SELECT CAST(rank AS INTEGER) AS rank, token, n_exact, n_est,
        | CAST(n_est - n_exact AS BIGINT) AS overcount
        |FROM r ORDER BY rank""".stripMargin,

    // t26: full DSIR replica — same dsir:-salted 64-bucket feature
    // hash, same integer bitlen log-ratio, same top-20 tie-break.
    "t26_dsir_select" ->
      s"""WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents),
        | tb AS (
        |  SELECT doc_id, lang,
        |    ${graft.operators.Sampling.portableGateSql(
             "'dsir:' || token")} % 64 AS bucket
        |  FROM tok),
        | g AS (
        |  SELECT bucket,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS s_cnt
        |  FROM tb GROUP BY bucket),
        | lr AS (
        |  SELECT bucket,
        |    CAST(length(bin(t_cnt + 1)) - length(bin(s_cnt + 1)) AS BIGINT) AS lr
        |  FROM g),
        | db AS (
        |  SELECT doc_id, lang, bucket, count(*) AS c FROM tb
        |  WHERE lang <> 'en' GROUP BY doc_id, lang, bucket),
        | wts AS (
        |  SELECT doc_id, lang, CAST(sum(c * lr) AS BIGINT) AS weight,
        |    CAST(sum(c) AS BIGINT) AS n_tok
        |  FROM db JOIN lr USING (bucket) GROUP BY doc_id, lang),
        | r AS (SELECT doc_id, lang, n_tok, weight,
        |         row_number() OVER (ORDER BY weight DESC, doc_id) AS rank
        |       FROM wts)
        |SELECT CAST(rank AS INTEGER) AS rank, doc_id, lang, n_tok, weight
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // t27: full CCNet replica — same lm1:/lm2:-salted 4096-bucket
    // censuses over the en bigram stream, same 64-offset bitlen
    // surrogate, same histogram-derived tercile cutoffs.
    "t27_lm_perplexity" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        | p AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT)+1])) AS bg
        |  FROM t WHERE len(toks) >= 2),
        | h AS (
        |  SELECT doc_id, lang,
        |    ${graft.operators.Sampling.portableGateSql(
             "'lm1:' || split_part(bg, ' ', 1)")} % 4096 AS b1,
        |    ${graft.operators.Sampling.portableGateSql(
             "'lm2:' || bg")} % 4096 AS b2,
        |    lang = 'en' AS is_t
        |  FROM p),
        | c1 AS (SELECT b1, count(*) AS c FROM h WHERE is_t GROUP BY 1),
        | c2 AS (SELECT b2, count(*) AS c FROM h WHERE is_t GROUP BY 1),
        | ds AS (
        |  SELECT h.doc_id, h.lang,
        |    CAST(sum(64 + length(bin(coalesce(c1.c, 0) + 1))
        |               - length(bin(coalesce(c2.c, 0) + 1))) AS BIGINT) AS nll,
        |    count(*) AS n_pairs
        |  FROM h LEFT JOIN c1 USING (b1) LEFT JOIN c2 USING (b2)
        |  GROUP BY 1, 2),
        | sc AS (SELECT doc_id, lang, (nll * 1000) // n_pairs AS s FROM ds),
        | hist AS (SELECT s, count(*) AS c FROM sc GROUP BY 1),
        | cum AS (SELECT s, sum(c) OVER (ORDER BY s) AS cum,
        |           (SELECT count(*) FROM sc) AS n FROM hist),
        | cuts AS (SELECT min(CASE WHEN cum*3 >= n THEN s END) AS c1v,
        |                 min(CASE WHEN cum*3 >= 2*n THEN s END) AS c2v FROM cum)
        |SELECT lang,
        |  CASE WHEN s <= c1v THEN 'head'
        |       WHEN s <= c2v THEN 'middle' ELSE 'tail' END AS bucket,
        |  count(*) AS n_docs,
        |  CAST(sum(s) AS BIGINT) // count(*) AS avg_nll_e3
        |FROM sc, cuts GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // t33: the boundary gate is the shared portable-gate mirror; the
    // prefix-shifted twin and both chunking schemes replicate step by
    // step, so the re-sync percentages are checked bit-for-bit.
    "t33_cdc_chunking" ->
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS tk0
        |  FROM documents),
        | m AS (SELECT * FROM t WHERE len(tk0) > 0),
        | vr AS (
        |  SELECT doc_id, source, 'orig' AS variant, tk0 AS tk FROM m
        |  UNION ALL
        |  SELECT doc_id, source, 'shift', ['xshift'] || tk0 FROM m),
        | tok AS (
        |  SELECT doc_id, source, variant,
        |    unnest(range(0, len(tk))) AS pos, unnest(tk) AS tok
        |  FROM vr),
        | lg AS (
        |  SELECT *, lag(tok, 1) OVER w AS l1, lag(tok, 2) OVER w AS l2
        |  FROM tok WINDOW w AS (PARTITION BY doc_id, variant ORDER BY pos)),
        | bf AS (
        |  SELECT *, CASE WHEN l2 IS NOT NULL AND
        |      (${graft.operators.Sampling.portableGateSql(
               "concat_ws(' ', l2, l1, tok)")}) % $CdcAvgChunk = 0
        |    THEN 1 ELSE 0 END AS b
        |  FROM lg),
        | cn AS (
        |  SELECT *,
        |    COALESCE(sum(b) OVER (PARTITION BY doc_id, variant ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cno_cdc,
        |    pos // $CdcAvgChunk AS cno_grid
        |  FROM bf),
        | sch AS (
        |  SELECT 'cdc' AS scheme, source, doc_id, variant, cno_cdc AS cno,
        |    pos, tok FROM cn
        |  UNION ALL
        |  SELECT 'grid', source, doc_id, variant, cno_grid, pos, tok FROM cn),
        | ch AS (
        |  SELECT scheme, source, doc_id, variant, cno,
        |    md5(string_agg(tok, ' ' ORDER BY pos)) AS h
        |  FROM sch GROUP BY 1, 2, 3, 4, 5),
        | pr AS (
        |  SELECT scheme, source, doc_id, h,
        |    max(CASE WHEN variant = 'orig' THEN 1 ELSE 0 END) AS in_o,
        |    max(CASE WHEN variant = 'shift' THEN 1 ELSE 0 END) AS in_s
        |  FROM ch GROUP BY 1, 2, 3, 4)
        |SELECT scheme, source,
        |  count(DISTINCT CASE WHEN in_o = 1 THEN doc_id END) AS n_docs,
        |  CAST(sum(in_o) AS BIGINT) AS n_uniq_chunks,
        |  CAST(sum(in_o * in_s) AS BIGINT) AS n_resynced,
        |  (CAST(sum(in_o * in_s) AS BIGINT) * 10000)
        |    // CAST(sum(in_o) AS BIGINT) AS resync_bp
        |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // t38: t35's replica with integer char-mass weights in the census;
    // Kish n_eff = (Σw)²/Σw² from exact integer sums, identical
    // association as the Spark expressions.
    "t38_mass_drift" ->
      """WITH r AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v,
        |    CAST(n_chars AS BIGINT) AS wt,
        |    CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 1 THEN 1
        |      ELSE 0 END AS s FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0),
        |cen AS (SELECT g, v, sum((1-s)*wt) AS ca, sum(s*wt) AS cb
        |  FROM r GROUP BY g, v),
        |st AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM cen GROUP BY g),
        |k AS (SELECT g,
        |    sum(CASE WHEN s = 0 THEN CAST(wt AS HUGEINT)*wt END) AS sa2,
        |    sum(CASE WHEN s = 1 THEN CAST(wt AS HUGEINT)*wt END) AS sb2
        |  FROM r GROUP BY g),
        |c AS (SELECT g, v,
        |    sum(ca) OVER (PARTITION BY g ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY g ORDER BY v) AS cumb FROM cen),
        |d AS (SELECT c.g, v,
        |    abs(CAST(cuma AS HUGEINT)*nb - CAST(cumb AS HUGEINT)*na)
        |      AS dev, na, nb
        |  FROM c JOIN st ON st.g = c.g),
        |m AS (SELECT g, min(na) AS na, min(nb) AS nb,
        |    max(dev) AS dmax FROM d GROUP BY g),
        |a AS (SELECT d.g, CAST(min(v) AS BIGINT) AS ks_value
        |  FROM d JOIN m ON m.g = d.g AND d.dev = m.dmax GROUP BY d.g),
        |f AS (SELECT m.g, na, nb, dmax, ks_value, sa2, sb2,
        |    CAST(dmax AS DOUBLE)/(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))
        |      AS ksr,
        |    CAST(na AS DOUBLE)*CAST(na AS DOUBLE)/CAST(sa2 AS DOUBLE)
        |      AS neffa,
        |    CAST(nb AS DOUBLE)*CAST(nb AS DOUBLE)/CAST(sb2 AS DOUBLE)
        |      AS neffb
        |  FROM m JOIN a ON a.g = m.g JOIN k ON k.g = m.g)
        |SELECT g AS lang, na AS w_a, nb AS w_b,
        |  floor(ksr*1e6+0.5)/1e6 AS ks, ks_value,
        |  floor(neffa*100+0.5)/100 AS neff_a,
        |  floor(neffb*100+0.5)/100 AS neff_b,
        |  ksr > 1.358*sqrt((CAST(na AS DOUBLE)+CAST(nb AS DOUBLE))
        |    /(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))) AS drifted_naive,
        |  ksr > 1.358*sqrt((neffa+neffb)/(neffa*neffb)) AS drifted_kish
        |FROM f ORDER BY g""".stripMargin,

    // t40: the permutation audit replicates end-to-end — gate-parity
    // relabelings, per-(lang, perm) weighted-KS flat windows, the
    // rank-derived p, and the Kish flag — so the disagreement set
    // between the two gates is itself hash-verified.
    "t40_perm_drift_test" ->
      s"""WITH r AS (SELECT lang AS g, doc_id,
        |    CAST(n_chars AS DOUBLE) AS v, CAST(n_chars AS BIGINT) AS wt,
        |    CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 1 THEN 1
        |      ELSE 0 END AS s0
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |pr AS (SELECT g, v, wt, perm,
        |    CASE WHEN perm = 0 THEN s0
        |      WHEN (${graft.operators.Sampling.portableGateSql(
             "CAST(doc_id AS VARCHAR) || ':perm' || CAST(perm AS VARCHAR)")})
        |        % 2 = 1 THEN 1 ELSE 0 END AS s
        |  FROM r, range(0, ${PermR + 1}) AS ps(perm)),
        |cen AS (SELECT g, perm, v, sum((1-s)*wt) AS ca, sum(s*wt) AS cb
        |  FROM pr GROUP BY 1, 2, 3),
        |st AS (SELECT g, perm, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM cen GROUP BY 1, 2),
        |c AS (SELECT g, perm, v,
        |    sum(ca) OVER (PARTITION BY g, perm ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY g, perm ORDER BY v) AS cumb
        |  FROM cen),
        |d AS (SELECT c.g, c.perm,
        |    abs(CAST(cuma AS HUGEINT)*nb - CAST(cumb AS HUGEINT)*na)
        |      AS dev, na, nb
        |  FROM c JOIN st ON st.g = c.g AND st.perm = c.perm),
        |m AS (SELECT g, perm, min(na) AS na, min(nb) AS nb,
        |    max(dev) AS dmax FROM d GROUP BY 1, 2),
        |kr AS (SELECT g, perm, na, nb,
        |    CASE WHEN na > 0 AND nb > 0 THEN CAST(dmax AS DOUBLE)
        |      /(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE)) END AS ksr
        |  FROM m),
        |o AS (SELECT g, na, nb, ksr AS ks0 FROM kr WHERE perm = 0),
        |ng AS (SELECT kr.g,
        |    CAST(sum(CASE WHEN kr.ksr >= o.ks0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_ge
        |  FROM kr JOIN o ON o.g = kr.g WHERE kr.perm >= 1 GROUP BY 1),
        |k AS (SELECT g,
        |    sum(CASE WHEN s0 = 0 THEN CAST(wt AS HUGEINT)*wt END) AS sa2,
        |    sum(CASE WHEN s0 = 1 THEN CAST(wt AS HUGEINT)*wt END) AS sb2
        |  FROM r GROUP BY 1),
        |f AS (SELECT o.g, o.na, o.nb, o.ks0, ng.n_ge,
        |    CAST(o.na AS DOUBLE)*CAST(o.na AS DOUBLE)
        |      /CAST(k.sa2 AS DOUBLE) AS neffa,
        |    CAST(o.nb AS DOUBLE)*CAST(o.nb AS DOUBLE)
        |      /CAST(k.sb2 AS DOUBLE) AS neffb
        |  FROM o JOIN ng ON ng.g = o.g JOIN k ON k.g = o.g)
        |SELECT g AS lang, na AS w_a, nb AS w_b,
        |  floor(ks0*1e6+0.5)/1e6 AS ks, n_ge,
        |  floor(CAST(n_ge + 1 AS DOUBLE)/${PermR + 1}.0*1e6+0.5)/1e6
        |    AS p_perm,
        |  ks0 > 1.358*sqrt((neffa+neffb)/(neffa*neffb)) AS drifted_kish,
        |  n_ge = 0 AS drifted_perm
        |FROM f ORDER BY g""".stripMargin,

    // t39: t37's replica with mass weights + Kish flags (rest side by
    // exact subtraction of the integer Σw² sums).
    "t39_source_mass_anomaly" ->
      """WITH r AS (SELECT source AS s, CAST(n_chars AS DOUBLE) AS v,
        |    CAST(n_chars AS BIGINT) AS wt FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0),
        |cen AS (SELECT s, v, sum(wt) AS c FROM r GROUP BY s, v),
        |g AS (SELECT v, sum(c) AS cg FROM cen GROUP BY v),
        |gs AS (SELECT CAST(sum(cg) AS BIGINT) AS n FROM g),
        |gc AS (SELECT v, cg, sum(cg) OVER (ORDER BY v) AS cumg FROM g),
        |sz AS (SELECT s, CAST(sum(c) AS BIGINT) AS ns
        |  FROM cen GROUP BY s),
        |k AS (SELECT s, sum(CAST(wt AS HUGEINT)*wt) AS sw2
        |  FROM r GROUP BY s),
        |kg AS (SELECT sum(sw2) AS gw2 FROM k),
        |sc AS (SELECT s, v, c,
        |    sum(c) OVER (PARTITION BY s ORDER BY v) AS cums FROM cen),
        |d AS (SELECT sc.s, sc.v,
        |    greatest(
        |      abs(CAST(cums AS HUGEINT)*n - CAST(cumg AS HUGEINT)*ns),
        |      abs(CAST(cums - c AS HUGEINT)*n
        |        - CAST(cumg - cg AS HUGEINT)*ns)) AS dev, ns, n
        |  FROM sc JOIN gc ON gc.v = sc.v JOIN sz ON sz.s = sc.s
        |  CROSS JOIN gs),
        |m AS (SELECT s, min(ns) AS ns, min(n) AS n, max(dev) AS dmax
        |  FROM d GROUP BY s),
        |a AS (SELECT d.s, CAST(min(v) AS BIGINT) AS ks_value
        |  FROM d JOIN m ON m.s = d.s AND d.dev = m.dmax GROUP BY d.s),
        |f AS (SELECT m.s, ns, n, dmax, ks_value, sw2, gw2,
        |    CAST(dmax AS DOUBLE)
        |      /(CAST(ns AS DOUBLE)*CAST(n - ns AS DOUBLE)) AS ksr,
        |    CAST(ns AS DOUBLE)*CAST(ns AS DOUBLE)/CAST(sw2 AS DOUBLE)
        |      AS neffs,
        |    CAST(n - ns AS DOUBLE)*CAST(n - ns AS DOUBLE)
        |      /CAST(gw2 - sw2 AS DOUBLE) AS neffr
        |  FROM m JOIN a ON a.s = m.s JOIN k ON k.s = m.s CROSS JOIN kg)
        |SELECT s AS source, ns AS w_s, n - ns AS w_rest,
        |  floor(ksr*1e6+0.5)/1e6 AS ks, ks_value,
        |  floor(neffs*100+0.5)/100 AS neff_s,
        |  floor(neffr*100+0.5)/100 AS neff_rest,
        |  ksr > 1.358*sqrt((neffs+neffr)/(neffs*neffr)) AS drifted_kish
        |FROM f ORDER BY s""".stripMargin,

    // t41: the one-vs-rest permutation audit replicates end-to-end —
    // the t39 observed leaderboard, the Bernoulli(cs/cn) all-integer
    // membership redraws, per-(source, perm) weighted-KS flat windows,
    // the rank-derived p, and the Kish flag — so the gate-vs-gate
    // disagreement set is itself hash-verified.
    "t41_perm_source_anomaly" ->
      s"""WITH r AS (SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS v,
        |    CAST(n_chars AS BIGINT) AS wt FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0),
        |cen AS (SELECT source AS s, v, sum(wt) AS c FROM r GROUP BY 1, 2),
        |g AS (SELECT v, sum(c) AS cg FROM cen GROUP BY v),
        |gs AS (SELECT CAST(sum(cg) AS BIGINT) AS n FROM g),
        |gc AS (SELECT v, cg, sum(cg) OVER (ORDER BY v) AS cumg FROM g),
        |sz AS (SELECT s, CAST(sum(c) AS BIGINT) AS ns
        |  FROM cen GROUP BY s),
        |sc AS (SELECT s, v, c,
        |    sum(c) OVER (PARTITION BY s ORDER BY v) AS cums FROM cen),
        |d AS (SELECT sc.s, sc.v,
        |    greatest(
        |      abs(CAST(cums AS HUGEINT)*n - CAST(cumg AS HUGEINT)*ns),
        |      abs(CAST(cums - c AS HUGEINT)*n
        |        - CAST(cumg - cg AS HUGEINT)*ns)) AS dev, ns, n
        |  FROM sc JOIN gc ON gc.v = sc.v JOIN sz ON sz.s = sc.s
        |  CROSS JOIN gs),
        |m AS (SELECT s, min(ns) AS ns, min(n) AS n, max(dev) AS dmax
        |  FROM d GROUP BY s),
        |a AS (SELECT d.s, CAST(min(v) AS BIGINT) AS ks_value
        |  FROM d JOIN m ON m.s = d.s AND d.dev = m.dmax GROUP BY d.s),
        |o AS (SELECT m.s, ns, n, dmax, ks_value,
        |    CAST(dmax AS DOUBLE)
        |      /(CAST(ns AS DOUBLE)*CAST(n - ns AS DOUBLE)) AS ks0
        |  FROM m JOIN a ON a.s = m.s),
        |cnt AS (SELECT source AS s2, CAST(count(*) AS BIGINT) AS cs
        |  FROM r GROUP BY 1),
        |cnn AS (SELECT CAST(count(*) AS BIGINT) AS cn FROM r),
        |pr AS (SELECT c.s2, ps.perm, r.v, r.wt,
        |    CASE WHEN (${graft.operators.Sampling.portableGateSql(
             "CAST(doc_id AS VARCHAR) || ':' || c.s2 || ':perm' || " +
               "CAST(perm AS VARCHAR)")})
        |        % 1048576 * cn < cs * 1048576 THEN 1 ELSE 0 END AS sd
        |  FROM r CROSS JOIN cnt c CROSS JOIN cnn,
        |    range(1, ${PermR + 1}) AS ps(perm)),
        |pc AS (SELECT s2, perm, v, sum((1-sd)*wt) AS ca,
        |    sum(sd*wt) AS cb FROM pr GROUP BY 1, 2, 3),
        |pst AS (SELECT s2, perm, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM pc GROUP BY 1, 2),
        |pcm AS (SELECT s2, perm, v,
        |    sum(ca) OVER (PARTITION BY s2, perm ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY s2, perm ORDER BY v) AS cumb
        |  FROM pc),
        |pd AS (SELECT pcm.s2, pcm.perm,
        |    abs(CAST(cuma AS HUGEINT)*nb - CAST(cumb AS HUGEINT)*na)
        |      AS dev, na, nb
        |  FROM pcm JOIN pst ON pst.s2 = pcm.s2 AND pst.perm = pcm.perm),
        |pm AS (SELECT s2, perm, min(na) AS na, min(nb) AS nb,
        |    max(dev) AS dmax FROM pd GROUP BY 1, 2),
        |kr AS (SELECT s2, perm,
        |    CASE WHEN na > 0 AND nb > 0 THEN CAST(dmax AS DOUBLE)
        |      /(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE)) END AS ksr
        |  FROM pm),
        |ng AS (SELECT o.s,
        |    CAST(sum(CASE WHEN kr.ksr >= o.ks0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_ge
        |  FROM kr JOIN o ON o.s = kr.s2 GROUP BY 1),
        |k AS (SELECT source AS s, sum(CAST(wt AS HUGEINT)*wt) AS sw2
        |  FROM r GROUP BY 1),
        |kg AS (SELECT sum(sw2) AS gw2 FROM k),
        |f AS (SELECT o.s, o.ns, o.n, o.ks0, o.ks_value, ng.n_ge,
        |    CAST(o.ns AS DOUBLE)*CAST(o.ns AS DOUBLE)
        |      /CAST(k.sw2 AS DOUBLE) AS neffs,
        |    CAST(o.n - o.ns AS DOUBLE)*CAST(o.n - o.ns AS DOUBLE)
        |      /CAST(kg.gw2 - k.sw2 AS DOUBLE) AS neffr
        |  FROM o JOIN ng ON ng.s = o.s JOIN k ON k.s = o.s CROSS JOIN kg)
        |SELECT s AS source, ns AS w_s, n - ns AS w_rest,
        |  floor(ks0*1e6+0.5)/1e6 AS ks, ks_value, n_ge,
        |  floor(CAST(n_ge + 1 AS DOUBLE)/${PermR + 1}.0*1e6+0.5)/1e6
        |    AS p_perm,
        |  ks0 > 1.358*sqrt((neffs+neffr)/(neffs*neffr)) AS drifted_kish,
        |  n_ge = 0 AS drifted_perm
        |FROM f ORDER BY s""".stripMargin,

    // t37: flat-window one-vs-rest replica. The two candidates per
    // source census point (at / just-before) are the same integer
    // formulas the operator computes; the dense interior is covered
    // by monotonicity (see KsDrift.ksOneVsRest).
    "t37_source_anomaly" ->
      """WITH r AS (SELECT source AS s, CAST(n_chars AS DOUBLE) AS v
        |  FROM documents),
        |cen AS (SELECT s, v, count(*) AS c FROM r GROUP BY s, v),
        |g AS (SELECT v, CAST(sum(c) AS BIGINT) AS cg
        |  FROM cen GROUP BY v),
        |gs AS (SELECT CAST(sum(cg) AS BIGINT) AS n FROM g),
        |gc AS (SELECT v, cg, sum(cg) OVER (ORDER BY v) AS cumg FROM g),
        |sz AS (SELECT s, CAST(sum(c) AS BIGINT) AS ns
        |  FROM cen GROUP BY s),
        |sc AS (SELECT s, v, c,
        |    sum(c) OVER (PARTITION BY s ORDER BY v) AS cums FROM cen),
        |d AS (SELECT sc.s, sc.v,
        |    greatest(
        |      abs(CAST(cums AS HUGEINT)*n - CAST(cumg AS HUGEINT)*ns),
        |      abs(CAST(cums - c AS HUGEINT)*n
        |        - CAST(cumg - cg AS HUGEINT)*ns)) AS dev, ns, n
        |  FROM sc JOIN gc ON gc.v = sc.v JOIN sz ON sz.s = sc.s
        |  CROSS JOIN gs),
        |m AS (SELECT s, min(ns) AS ns, min(n) AS n, max(dev) AS dmax
        |  FROM d GROUP BY s),
        |a AS (SELECT d.s, CAST(min(v) AS BIGINT) AS ks_value
        |  FROM d JOIN m ON m.s = d.s AND d.dev = m.dmax GROUP BY d.s)
        |SELECT m.s AS source, ns AS n_s, n - ns AS n_rest,
        |  floor(CAST(dmax AS DOUBLE)
        |    / (CAST(ns AS DOUBLE)*CAST(n - ns AS DOUBLE))*1e6+0.5)/1e6
        |    AS ks,
        |  ks_value,
        |  CAST(dmax AS DOUBLE)/(CAST(ns AS DOUBLE)*CAST(n - ns AS DOUBLE))
        |    > 1.358*sqrt((CAST(ns AS DOUBLE)+CAST(n - ns AS DOUBLE))
        |      /(CAST(ns AS DOUBLE)*CAST(n - ns AS DOUBLE))) AS drifted
        |FROM m JOIN a ON a.s = m.s ORDER BY m.s""".stripMargin,

    // t36: quantile_cont medians (type-7 ≡ ExactQuantile); on integer
    // n_chars every median/deviation is exactly representable, so the
    // 3·1.4826·MAD gate is bit-identical cross-engine.
    "t36_robust_outliers" ->
      """WITH d0 AS (SELECT lang, CAST(n_chars AS DOUBLE) AS v
        |  FROM documents),
        |m AS (SELECT lang, quantile_cont(v, 0.5) AS med
        |  FROM d0 GROUP BY lang),
        |dv AS (SELECT d0.lang, v, med, abs(v - med) AS adev
        |  FROM d0 JOIN m ON m.lang = d0.lang),
        |md AS (SELECT lang, quantile_cont(adev, 0.5) AS mad
        |  FROM dv GROUP BY lang)
        |SELECT dv.lang, count(*) AS n, min(med) AS med, min(mad) AS mad,
        |  CAST(sum(CASE WHEN adev > 3*1.4826*mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  CAST(max(CASE WHEN adev > 3*1.4826*mad THEN v END)
        |    AS BIGINT) AS worst_len
        |FROM dv JOIN md ON md.lang = dv.lang
        |GROUP BY dv.lang ORDER BY dv.lang""".stripMargin,

    // t35: naive flat-window KS replica of the bounded-stage operator
    // (same structure as q55's oracle, documents framing).
    "t35_length_drift" ->
      """WITH r AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v,
        |    CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 1 THEN 1
        |      ELSE 0 END AS s FROM documents),
        |cen AS (SELECT g, v, sum(1-s) AS ca, sum(s) AS cb
        |  FROM r GROUP BY g, v),
        |st AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM cen GROUP BY g),
        |c AS (SELECT g, v,
        |    sum(ca) OVER (PARTITION BY g ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY g ORDER BY v) AS cumb FROM cen),
        |d AS (SELECT c.g, v,
        |    abs(CAST(cuma AS HUGEINT)*nb - CAST(cumb AS HUGEINT)*na)
        |      AS dev, na, nb
        |  FROM c JOIN st ON st.g = c.g),
        |m AS (SELECT g, min(na) AS na, min(nb) AS nb,
        |    max(dev) AS dmax FROM d GROUP BY g),
        |a AS (SELECT d.g, CAST(min(v) AS BIGINT) AS ks_value
        |  FROM d JOIN m ON m.g = d.g AND d.dev = m.dmax GROUP BY d.g)
        |SELECT m.g AS lang, na AS n_a, nb AS n_b,
        |  floor(CAST(dmax AS DOUBLE)
        |    / (CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))*1e6+0.5)/1e6 AS ks,
        |  ks_value,
        |  CAST(dmax AS DOUBLE)/(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))
        |    > 1.358*sqrt((CAST(na AS DOUBLE)+CAST(nb AS DOUBLE))
        |      /(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))) AS drifted
        |FROM m JOIN a ON a.g = m.g ORDER BY m.g""".stripMargin,

    // t34: the oracle replays systematic PPS as ONE flat window cumsum
    // per language — also witnessing that the operator's bucketed
    // decomposition reproduces the flat global (skey, doc_id) order.
    // The crossing test cw ≥ (j+0.5)·W/k runs as the exact INTEGER
    // comparison 2k·cw ≥ (2j+1)·W in both engines (hugeint here,
    // decimal there) — no floating point, no 2^53 ceiling.
    "t34_pps_sample" ->
      s"""WITH d AS (
        |  SELECT lang, doc_id, n_chars AS w,
        |    (${graft.operators.Sampling.portableGateSql(
             "CAST(doc_id AS VARCHAR) || ':pps42'")}) AS skey
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        | r AS (
        |  SELECT lang, doc_id, w,
        |    sum(w) OVER (PARTITION BY lang ORDER BY skey, doc_id) AS cw,
        |    sum(w) OVER (PARTITION BY lang) AS tw
        |  FROM d),
        | t AS (
        |  SELECT lang, (2*j + 1) * CAST(tw AS HUGEINT) AS t2
        |  FROM (SELECT DISTINCT lang, tw FROM r), range($PpsK) AS js(j))
        |SELECT r.lang, r.doc_id, CAST(r.w AS BIGINT) AS n_chars,
        |  count(*) AS hits
        |FROM r JOIN t ON t.lang = r.lang
        |  AND 2*$PpsK*CAST(r.cw AS HUGEINT) >= t.t2
        |  AND 2*$PpsK*CAST(r.cw - r.w AS HUGEINT) < t.t2
        |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,
  )
}
