package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * Exact dedup has a DuckDB oracle; the LSH/bit-sketch ones are
  * rows-only by contract.
  */
object DedupQueries {

  private def toks: Column = filter(split(col("text"), " "), t => t =!= "")

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

    "d02_minhash_lsh" -> ((s, d) => {
      // K=32 minhash functions (8 bands × 4 rows). The signature is ONE
      // native codegen'd kernel per row (graft.functions.MinHashSig) —
      // the explode + K-min-aggregate formulation spends its wall-clock
      // in generator/aggregate machinery for what is a tight loop over
      // ~50 longs, and the per-row form needs no shuffle at all until
      // the (tiny) band join.
      val K = 32; val B = 8; val R = 4
      val docs = Tables.documents(s, d)
        .withColumn("toks", toks)
        .withColumn("sh", shingles)
        .select("doc_id", "sh")
      val sig = docs.withColumn("sig",
        graft.functions.SketchExpressions.minhash_sig(col("sh"), K))
      val bands = sig.select(col("doc_id"),
          explode(array((0 until B).map(b =>
            struct(lit(b).as("band"),
              hash((b * R until (b + 1) * R).map(k =>
                element_at(col("sig"), k + 1)): _*).as("bucket"))): _*)).as("bb"))
        .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      // verify candidates only: join the (tiny) pair set back to the
      // shingle arrays — signatures never carry the payload through the
      // band shuffle
      val verified = cand
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      verified.agg(
        count(lit(1)).as("n_candidate_pairs"),
        sum(when(col("jaccard") >= 0.5, 1).otherwise(0)).as("n_dups_05"),
        RelationalQueries.rnd(coalesce(max("jaccard"), lit(0.0)), 4).as("max_jaccard"))
    }),

    "d03_simhash" -> ((s, d) => {
      // 64-bit SimHash: per-token hash votes on each bit, sign of the
      // vote sum sets the bit; near-dups collide on 16-bit bands. The
      // vote loop is one native codegen'd kernel per row
      // (graft.functions.SimHash64) — no explode, no 64-column
      // aggregate, no shuffle until the band join.
      val docs = Tables.documents(s, d)
        .withColumn("hs", transform(toks, t => xxhash64(t)))
        .withColumn("simhash", graft.functions.SketchExpressions.simhash64(col("hs")))
        .select("doc_id", "simhash")
      val bands = docs.select(col("doc_id"), col("simhash"),
        expr("explode(transform(sequence(0, 3), b -> named_struct('band', b, 'bits', shiftright(simhash, b*16) & 65535)))").as("bb"))
        .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bits"))
      val a = bands.select(col("band"), col("bits"),
        col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
      val b = bands.select(col("band"), col("bits"),
        col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
      val cand = a.join(b, Seq("band", "bits"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
        .distinct()
      docs.agg(count(lit(1)).as("n_docs"),
          countDistinct("simhash").as("n_distinct_simhash"))
        .crossJoin(cand.agg(
          count(lit(1)).as("n_band_collisions"),
          sum(when(col("hamming") <= 8, 1).otherwise(0)).as("n_pairs_hamming_le8"),
          coalesce(min("hamming"), lit(64)).as("min_hamming")))
    }),

    "d04_ngram_jaccard" -> ((s, d) => {
      // char 5-gram Jaccard inside (lang, length-bucket) blocks: the
      // blocking keys bound the self-join; at corpus scale you'd salt
      // oversized blocks the same way.
      val grams = array_distinct(expr(
        """CASE WHEN length(text) >= 5
          | THEN transform(sequence(1, length(text)-4), i -> substring(text, i, 5))
          | ELSE array(text) END""".stripMargin))
      val blocked = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          floor(col("n_chars") / 64).as("lbucket"), grams.as("g"))
      val a = blocked.select(col("lang"), col("lbucket"),
        col("doc_id").as("doc_a"), col("g").as("g_a"))
      val b = blocked.select(col("lang"), col("lbucket"),
        col("doc_id").as("doc_b"), col("g").as("g_b"))
      val pairs = a.join(b, Seq("lang", "lbucket"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("jaccard",
          size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
            size(array_union(col("g_a"), col("g_b"))).cast("double"))
      pairs.agg(count(lit(1)).as("n_pairs_compared"),
        sum(when(col("jaccard") >= 0.3, 1).otherwise(0)).as("n_sim_03"),
        RelationalQueries.rnd(coalesce(max("jaccard"), lit(0.0)), 4).as("max_jaccard"),
        RelationalQueries.rnd(coalesce(avg("jaccard"), lit(0.0)), 4).as("avg_jaccard"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d01_exact_dedup" ->
      """WITH g AS (SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keeper
        |           FROM documents GROUP BY md5(text))
        |SELECT count(*) AS n_unique_texts,
        | CAST(sum(n) AS BIGINT) AS n_docs,
        | CAST(sum(n) - count(*) AS BIGINT) AS n_exact_dups,
        | CAST(max(n) AS BIGINT) AS largest_group
        |FROM g""".stripMargin,
    // d02/d03/d04: LSH banding and bit sketches are not reproducible in
    // DuckDB SQL (xxhash64/murmur internals) → rows-only checks.
  )
}
