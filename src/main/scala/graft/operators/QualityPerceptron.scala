package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned quality classifier — the model-based filtering stage
  * (CCNet, Wenzek et al. 2020; fastText quality filters à la GPT-3 /
  * Llama data work) that sits between heuristic gates (t13) and
  * importance resampling (t26) in a modern LLM data pipeline. Roster
  * witnesses: t44 (the training trajectory), t45 (the corpus score
  * census + the disagreement set vs the t13 heuristic gates).
  *
  * The learner is a FIXED-ROUND batch perceptron in e4 fixed-point
  * integer arithmetic — the t42/BpeMerge discipline applied to a
  * gradient instead of a merge: per-doc feature vectors are integers
  * (ratios floored at 1e4 scale), so every gradient is an exact
  * integer SUM (associative — no IEEE order-dependence across
  * partitions, the property that lets an iterative learner hash-oracle
  * end to end), and the per-round update divides the mean mistake
  * vector by 2^(r-1) (an annealed step — empirically a binary search
  * on the separating boundary: zero training errors by round 6 on the
  * planted corpus at all three SFs). The one non-integer op,
  * `floor(grad / (max(n_mistakes,1) * 2^(r-1)))`, is computed in
  * double: |grad| ≤ n_docs·1e4 stays exact below 2^53 up to ~10^11
  * docs, division is correctly rounded, floor is exact — bit-identical
  * in Spark and DuckDB.
  *
  * Scale shape: the feature frame is built ONCE (one corpus scan,
  * materialized by the caller); each round is (1) one
  * map-side-combinable gradient aggregate over features ⋈ broadcast
  * 1-row weights, (2) a 1-row weight update. No self-joins, no corpus
  * re-scan, no driver-side data loop; [[Materialize]] cuts the
  * replayed lineage per round (the BpeMerge fixpoint discipline).
  * Production learners iterate to tolerance with held-out early
  * stopping; fixed rounds keep the strict oracle. */
object QualityPerceptron {
  import Materialize.MaterializeOps

  /** Feature arity: x1..x5 (x5 is the constant-1e4 bias). */
  val NFeatures = 5

  /** Learn `rounds` perceptron updates from a feature frame.
    *
    * @param feats columns `y` (long, ±1) and `x1..x5` (long, e4
    *              fixed-point in [0, 1e4]); any other columns ride
    *              along untouched (they are ignored by the gradient)
    * @return (finalWeights, trajectory): finalWeights is 1 row
    *         `w1..w5` (long, e4 scale); trajectory is one row per
    *         round: round, w1..w5 (post-update), n_mistakes (count of
    *         `y·margin <= 0` docs BEFORE the round's update — round
    *         r+1's n_mistakes is round r's post-update training error) */
  def learn(feats: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    val xs = (1 to NFeatures).map(i => s"x$i")
    val ws = (1 to NFeatures).map(i => s"w$i")
    val margin = xs.zip(ws).map { case (x, w) => col(x) * col(w) }
      .reduce(_ + _)
    var w = feats.sparkSession.range(1)
      .select(ws.map(n => lit(0L).as(n)): _*).materialize
    val perRound = (1 to rounds).map { r =>
      val mistakes = feats.crossJoin(broadcast(w))
        .filter(col("y") * margin <= 0)
      val grad = mistakes
        .agg(count(lit(1)).as("nm"),
          xs.zipWithIndex.map { case (x, i) =>
            coalesce(sum(col("y") * col(x)), lit(0L)).as(s"g${i + 1}")
          }: _*)
        .materialize
      val step = lit((1L << (r - 1)).toDouble) * greatest(col("nm"), lit(1L))
      w = w.crossJoin(broadcast(grad))
        .select(ws.zipWithIndex.map { case (wn, i) =>
          (col(wn) + floor(col(s"g${i + 1}").cast("double") / step)
            .cast("long")).as(wn)
        }: _*)
        .materialize
      w.crossJoin(grad.select(col("nm").as("n_mistakes")))
        .select(lit(r).as("learn_round") +: ws.map(col) :+
          col("n_mistakes"): _*)
    }
    (w, perRound.reduce(_ unionByName _).orderBy("learn_round"))
  }

  /** `w·x` margin of `feats` rows against a broadcast 1-row weight
    * frame — the scoring pass (prediction = margin > 0 keeps the doc). */
  def score(feats: DataFrame, weights: DataFrame): DataFrame = {
    val margin = (1 to NFeatures)
      .map(i => col(s"x$i") * col(s"w$i")).reduce(_ + _)
    feats.crossJoin(broadcast(weights)).withColumn("margin", margin)
  }
}
