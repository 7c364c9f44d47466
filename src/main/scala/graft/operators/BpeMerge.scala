package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge learning (Sennrich et al. 2016, arXiv:1508.07909) as a
  * fixed-round distributed loop over a (word, freq) vocabulary frame —
  * the corpus→tokenizer build stage of a training-data pipeline
  * (roster witness: t42).
  *
  * Representation: a word's symbol sequence rides a double-delimited
  * string `"##l##o##w##"`. The merge rewrite
  * `replace('#l##r#' → '#lr#')` takes only ONE `#` from each outer
  * boundary, so adjacent matches never share characters and a plain
  * left-to-right non-overlapping `replace` IS greedy BPE:
  * `"a a a a"` + merge (a,a) → `[aa, aa]`, not `[aa, a, a]`. Spark and
  * DuckDB `replace()` share these semantics, which is what lets an
  * ITERATIVE learner hash-oracle end to end (t42's oracle unrolls the
  * same rounds in SQL).
  *
  * Scale shape: every round is (1) one map-side-combinable
  * adjacent-pair census over the vocabulary (explode factor = symbols
  * per word), (2) a 1-row TakeOrdered winner with the engine-neutral
  * total order (pair_n desc, pair asc), (3) a broadcast crossJoin
  * rewrite. No self-joins, no corpus re-scan (the corpus is folded to
  * (word, freq) once, by the caller), no driver-side data loop;
  * per-round [[Materialize]] cuts the replayed lineage (the d13/d21
  * fixpoint discipline). Production learners iterate to a vocab-size
  * target; fixed rounds keep the strict oracle. */
object BpeMerge {
  import Materialize.MaterializeOps

  /** `"low"` → `"##l##o##w##"`: the boundary encoding above.
    *
    * Assumes words never contain `#` (true of whitespace-split roster
    * text; both engines run the identical string ops, so even a
    * violating corpus stays hash-consistent — it just merges wrong).
    * A production corpus remaps the delimiter or pre-filters. */
  def toSymbols(word: Column): Column =
    concat(lit("##"), regexp_replace(word, "(.)", "$1##"))

  private def symbols(sy: Column): Column =
    filter(split(sy, "##"), x => x =!= "")

  /** Learn `rounds` merges from a (word, freq) vocabulary.
    *
    * @param words columns `w` (string, no spaces) and `freq` (long)
    * @return one row per round: merge_round, l_sym, r_sym, pair_n,
    *         tokens_after (Σ freq·|symbols| after the merge),
    *         vocab_after (distinct symbol types after the merge) */
  def learn(words: DataFrame, rounds: Int): DataFrame =
    run(words, rounds, Nil)._2

  /** Learn AND apply: the same loop, with `carry` columns riding the
    * vocabulary rows untouched (e.g. lang, the word itself), returning
    * the final encoded frame (carry..., freq, sy). Library API: since
    * r20 the roster consumers read the session-memoized learn table
    * (TextQueries.bpeLearnTable) and fold it with [[applyMerges]]
    * instead — this form remains for callers that need the per-round
    * encoded frames or cannot afford a driver collect, and it carries
    * the same cannot-desynchronize argument via the carry-column
    * construction (BpeMergeSpec pins the paths equal). The pair census
    * ignores the carry columns, so the learned merge sequence is
    * identical to [[learn]] on the carry-collapsed vocabulary by
    * construction (winner totals are sums over the same (word, freq)
    * mass) — the apply step can never use a different tokenizer than
    * the learn step published (t42/t43). The per-round leaderboard
    * frames are built lazily and never execute when the caller only
    * consumes the encoded frame. */
  def encode(words: DataFrame, rounds: Int, carry: Seq[String]): DataFrame =
    run(words, rounds, carry)._1

  private def run(words: DataFrame, rounds: Int, carry: Seq[String])
      : (DataFrame, DataFrame) = {
    var vocab = words
      .select(carry.map(col) ++
        Seq(toSymbols(col("w")).as("sy"), col("freq")): _*)
      .materialize
    val perRound = (1 to rounds).map { r =>
      val census = vocab
        .withColumn("a", symbols(col("sy")))
        // size-1 words have no pairs; the guard matters because
        // sequence(0, -1) DESCENDS in Spark instead of being empty
        .select(col("freq"), explode(expr(
          """CASE WHEN size(a) >= 2
            | THEN transform(sequence(0, size(a)-2),
            |                i -> concat(a[i], ' ', a[i+1]))
            | ELSE CAST(array() AS array<string>) END""".stripMargin))
          .as("pair"))
        .groupBy("pair").agg(sum("freq").as("pair_n"))
      val winner = census
        .orderBy(col("pair_n").desc, col("pair"))
        .limit(1)
        .select(substring_index(col("pair"), " ", 1).as("l_sym"),
          substring_index(col("pair"), " ", -1).as("r_sym"),
          col("pair_n"))
        .materialize
      vocab = vocab.crossJoin(broadcast(winner.select("l_sym", "r_sym")))
        .select(carry.map(col) ++ Seq(
          expr("replace(sy, '#' || l_sym || '##' || r_sym || '#'," +
            " '#' || l_sym || r_sym || '#')").as("sy"), col("freq")): _*)
        .materialize
      val stats = vocab
        .select(col("freq"), explode(symbols(col("sy"))).as("sym"))
        .agg(sum("freq").as("tokens_after"),
          countDistinct("sym").as("vocab_after"))
      winner.crossJoin(stats)
        .select(lit(r).as("merge_round"), col("l_sym"), col("r_sym"),
          col("pair_n"), col("tokens_after"), col("vocab_after"))
    }
    (vocab, perRound.reduce(_ unionByName _).orderBy("merge_round"))
  }

  /** Post-encode symbol array of an encode() row, for audits. */
  def symbolsOf(syCol: Column): Column = symbols(syCol)

  /** Learn and COLLECT the merge table — [[learn]] + an ordered 8-row
    * driver read (the bounded scalar-read discipline of the
    * sign-derivation sites: BpeRounds rows, never corpus-sized). For
    * consumers that apply a FROZEN tokenizer without re-running the
    * vocabulary loop per row group: the merges fold into a static
    * [[applyMerges]] replace chain, one narrow pass instead of
    * `rounds` materialized rewrites. Same learner, same corpus fold —
    * the apply still cannot desynchronize from what [[learn]]
    * publishes. Roster consumers reach this through the session memo
    * (TextQueries.bpeLearnTable, r20) so one sweep learns once. */
  def collectMerges(words: DataFrame, rounds: Int): Seq[(String, String)] =
    learn(words, rounds)
      .orderBy("merge_round")
      .select("l_sym", "r_sym")
      .collect()
      .toSeq
      .map(r => (r.getString(0), r.getString(1)))

  /** Apply a collected merge list to a word column: the same
    * boundary-string greedy replace as [[encode]]'s rounds, folded
    * into one static expression chain (codegen-friendly, stream-safe —
    * no join, no state). Returns the encoded symbol string. */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(toSymbols(word)) { case (c, (l, r)) =>
      org.apache.spark.sql.functions.replace(
        c, org.apache.spark.sql.functions.lit(s"#$l##$r#"),
        org.apache.spark.sql.functions.lit(s"#$l$r#"))
    }
}
