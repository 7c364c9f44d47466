package graft.queries

import graft.Tables
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
  )

  val oracleSql: Map[String, String] = Map(
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

    // Recomputes Sampling.splitPortable's md5-prefix gate verbatim —
    // every per-(split, lang) count must agree, not just the fractions.
    "t07_split_stats" ->
      """WITH g AS (
        |  SELECT lang, n_chars,
        |    (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 65536
        |     + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 256
        |     + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 3, 1))) % 10 AS gate
        |  FROM documents),
        | s AS (
        |  SELECT CASE WHEN gate < 2 THEN 'eval' ELSE 'train' END AS split,
        |    lang, n_chars
        |  FROM g)
        |SELECT split, lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin,
  )
}
