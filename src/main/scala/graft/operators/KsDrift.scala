package graft.operators

import graft.operators.Materialize.MaterializeOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact two-sample Kolmogorov–Smirnov distance per group
  * — the continuous-distribution drift monitor (did the price/length/
  * score distribution of snapshot B move away from snapshot A?) that
  * complements e13's categorical L1 drift.
  *
  * KS = max over v of |F_A(v) − F_B(v)|, attained at a data point, so
  * it is a function of the empirical CDFs at the distinct observed
  * values. The naive SQL shape is a running-sum window ordered by v
  * over EVERY row with only the group as partition key — exactly the
  * low-cardinality window funnel the roster bans (one task sorts a
  * whole group; at 100 TB a group is billions of rows). This operator
  * computes the identical statistic through ExactQuantile's bounded
  * stages, with one running sum per side:
  *
  *  1. per-(group, value) census with per-side counts `(g, v) →
  *     (ca, cb)` — the only full-data shuffle, map-side combinable;
  *     identical values collapse BEFORE any window.
  *  2. per-group `n_a/n_b/lo/hi` broadcast back; census rows get an
  *     equi-width bucket id over the finite range, NaN/±∞ in sentinel
  *     buckets at the sort-order edges (same layout as
  *     [[ExactQuantile]] — the CDF is taken over Spark's double
  *     ordering, -∞ < finite < +∞ < NaN, which DuckDB shares).
  *  3. per-(group, bucket) subtotals + exclusive running offsets per
  *     side — the only group-wide window runs over ≤ buckets+3 rows.
  *  4. in-bucket running sums partitioned by (group, bucket) turn the
  *     offsets into exact global CDF counts at every distinct value;
  *     the deviation `|cum_a·n_b − cum_b·n_a|` stays in integer
  *     arithmetic (decimal 38,0) so the max and its argmin value are
  *     exact — no accumulated floating error, and the final
  *     `ks = d_max / (n_a·n_b)` is ONE double division of exactly-
  *     converted integers, bit-identical cross-engine.
  *  5. the maximum and its witness value reduce in ONE map-side-
  *     combinable `max(struct(...))` aggregation (the struct's tail
  *     fields invert the value order, so ties at the max pick the
  *     smallest value deterministically) — no funnel anywhere, and
  *     no second pass over the deviation frame.
  *
  * Returns one row per group: `groupCol`, `n_a`, `n_b` (side row
  * counts), `ks` (double in [0,1], null when either side is empty),
  * and `ks_value` (the smallest value attaining the max deviation —
  * deterministic tie-break, null when ks is null). Rows with null
  * value or null side are ignored.
  *
  * `hinted` mirrors [[ExactQuantile.quantiles]]: the per-group stats
  * and max rows are broadcast by default (right up to millions of
  * groups); pass false to shuffle those joins instead when the group
  * column itself is huge. */
object KsDrift {

  /** One-vs-rest KS per stratum — the anomaly LEADERBOARD: for every
    * stratum s (source, domain, shard), the exact KS distance between
    * s's value distribution and the rest of the corpus, answering
    * "which source is distributionally anomalous?" in one pass over
    * two censuses.
    *
    * The subtlety vs [[ks2]]: F_rest jumps at values s never takes,
    * so the max deviation can sit at a rest-only point. Evaluating
    * the deviation at every (stratum, global value) pair is an
    * |S|·|V| blowup; instead note D(x) = cum_s(x)·N − cumG(x)·n_s is
    * monotone in cumG wherever cum_s is constant, so on each interval
    * between consecutive s-points the extreme sits at one of the two
    * ends — both computable AT the s-point from (cum_s, c_s, cumG,
    * c_g) alone: `up = |cum_s·N − cumG·n_s|` (at the point) and
    * `down = |(cum_s−c_s)·N − (cumG−c_g)·n_s|` (just before it, which
    * covers every rest-only interior point and the pre-first
    * interval). No lag window, no per-stratum sort — the candidates
    * are per-row arithmetic over the stratum census joined to the
    * global census on the value (the one extra shuffle vs [[ks2]]).
    *
    * Output per stratum: `strataCol`, `n_s`, `n_rest`, `ks` (null
    * when the stratum IS the whole corpus), `ks_value` (the stratum
    * census value at/just before which the max deviation is attained;
    * smallest such value on ties). Exactness contract as [[ks2]]:
    * integer deviations, one double division. */
  def ksOneVsRest(df: DataFrame, strataCol: String, valueCol: String,
      buckets: Int = 4096, hinted: Boolean = true,
      weightCol: String = null): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    def hintSmall(small: DataFrame): DataFrame =
      if (hinted) broadcast(small) else small

    val w = Option(weightCol).map(col).getOrElse(lit(1L))
    val rows = df
      .select(col(strataCol).as("s"), col(valueCol).cast("double").as("v"),
        w.cast("long").as("w"))
      .filter(col("v").isNotNull && col("s").isNotNull &&
        col("w").isNotNull && col("w") > 0)

    // stratum census — the full-data shuffle; three consumers (global
    // census fold, per-stratum sizes, the bucketed cum frame).
    // Weighted mass when a weight column is given (same contract as
    // ks2: integer weights, non-positive rows dropped, n_s/n_rest
    // report total admitted weight)
    val census = rows.groupBy("s", "v").agg(sum("w").as("c"))
      .materialize
    // global census folds FROM the stratum census (map-side combinable
    // on v) — the corpus is never re-scanned; two consumers
    val gcen = census.groupBy("v").agg(sum("c").as("cg")).materialize

    val finiteV = !isnan(col("v")) &&
      col("v") =!= Double.PositiveInfinity &&
      col("v") =!= Double.NegativeInfinity
    val gstats = gcen.agg(sum("cg").as("n"),
      min(when(finiteV, col("v"))).as("lo"),
      max(when(finiteV, col("v"))).as("hi"))
    val sizes = census.groupBy("s").agg(sum("c").as("ns"))

    def bucketed(cdf: DataFrame): DataFrame =
      cdf.crossJoin(hintSmall(gstats))
        .withColumn("b",
          when(isnan(col("v")), lit((buckets + 1).toLong))
            .when(col("v") === Double.PositiveInfinity, lit(buckets.toLong))
            .when(col("v") === Double.NegativeInfinity, lit(-1L))
            .when(col("hi").isNull || col("hi") === col("lo"), lit(0L))
            .otherwise(least(
              floor((col("v") - col("lo")) / (col("hi") - col("lo")) * buckets),
              lit((buckets - 1).toLong)).cast("long")))

    // global CDF counts: ≤ buckets+3 bucket rows, per-bucket windows
    val gWithB = bucketed(gcen)
    // one global running sum over ≤ buckets+3 rows — the constant
    // partition key only silences the unpartitioned-window warning,
    // the frame is bucket-bounded by construction
    val gBases = gWithB.groupBy("b").agg(sum("cg").as("bc"))
      .withColumn("base",
        sum("bc").over(Window.partitionBy(lit(0)).orderBy("b")) - col("bc"))
      .select("b", "base")
    val gCum = gWithB.join(hintSmall(gBases), "b")
      .withColumn("cumg", col("base") +
        sum("cg").over(Window.partitionBy("b").orderBy("v")))
      .select("v", "cg", "cumg")

    // per-stratum CDF counts at the stratum's own census points
    val sWithB = bucketed(census)
    val sBases = sWithB.groupBy("s", "b").agg(sum("c").as("bc"))
      .withColumn("base",
        sum("bc").over(Window.partitionBy("s").orderBy("b")) - col("bc"))
      .select("s", "b", "base")
    val sCum = sWithB.join(sBases, Seq("s", "b"))
      .withColumn("cums", col("base") +
        sum("c").over(Window.partitionBy("s", "b").orderBy("v")))
      .select(col("s"), col("v"), col("c"), col("cums"), col("n"))

    // candidates per stratum point; integer arithmetic throughout.
    // The stratum↔global census join is merge-PINNED: neither side is
    // broadcastable at scale (both grow with the value domain), and
    // leaving the choice to AQE coin-flips broadcast-vs-shuffle on
    // near-threshold roster data and flaps the plan digest (the d12
    // artifact class, PLAN_DIGESTS.md r15).
    // decimal(19,0) holds ANY long (no silent overflow-to-null on a
    // cumulative mass above 10^18); the 19×19 product still fits the
    // decimal(38,0) cross-product headroom.
    val dec = "decimal(19,0)"
    val scored = sCum.join(gCum.hint("merge"), Seq("v"))
      .join(hintSmall(sizes), "s")
      .withColumn("up",
        abs(col("cums").cast(dec) * col("n").cast(dec) -
          col("cumg").cast(dec) * col("ns").cast(dec)))
      .withColumn("down",
        abs((col("cums") - col("c")).cast(dec) * col("n").cast(dec) -
          (col("cumg") - col("cg")).cast(dec) * col("ns").cast(dec)))
      .withColumn("d", greatest(col("up"), col("down")))

    // ns and the global total n ride the SAME max-struct aggregation
    // (r22): both are constant within a stratum (ns broadcast-joined,
    // n from the gstats crossJoin the bucketing already carries), so
    // max() recovers the exact integers and the output needs no
    // sizes × gstats × best three-way join — which re-aggregated both
    // censuses once more per force. Every stratum reaches `scored`
    // (each stratum census value exists in the GLOBAL census by
    // construction — gcen folds FROM census — so the inner value join
    // drops nothing; pinned in KsDriftSpec), so groups(best) ≡
    // groups(sizes) and the old left join was vacuous.
    val best = scored
      .groupBy("s")
      .agg(max(struct(col("d").as("d"),
        when(isnan(col("v")), 0L).otherwise(1L).as("nr"),
        when(isnan(col("v")), lit(0.0)).otherwise(-col("v")).as("vn")))
        .as("m"),
        max("ns").as("ns"), max("n").as("n"))
      .select(col("s"), col("m.d").as("dmax"),
        when(col("m.nr") === 0, lit(Double.NaN)).otherwise(-col("m.vn"))
          .as("arg_v"),
        col("ns"), col("n"))

    val nRest = col("n") - col("ns")
    val hasRest = nRest > 0
    best
      .select(col("s").as(strataCol),
        col("ns").as("n_s"), nRest.as("n_rest"),
        when(hasRest, col("dmax").cast("double") /
          (col("ns").cast("double") * nRest.cast("double"))).as("ks"),
        when(hasRest, col("arg_v")).as("ks_value"))
  }

  /** `weightCol` (optional): WEIGHTED two-sample KS — the ECDFs carry
    * row weights (token/byte mass) instead of counts, detecting "the
    * mass moved" where the unweighted statistic sees identical doc
    * counts. Pass an integer-typed weight column so the census sums
    * stay order-independent exact (the q54 rule); rows with null or
    * non-positive weight are ignored (a weighted CDF must stay
    * monotone). `n_a`/`n_b` then report total admitted weight. */
  def ks2(df: DataFrame, groupCol: String, valueCol: String,
      sideBCol: String, buckets: Int = 4096,
      hinted: Boolean = true, weightCol: String = null): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    def hintSmall(small: DataFrame): DataFrame =
      if (hinted) broadcast(small) else small

    val w = Option(weightCol).map(col).getOrElse(lit(1L))
    // the side filter runs on the boolean CAST, not the raw column: a
    // marker whose boolean cast is null (e.g. a non-boolean string) is
    // dropped, never silently misattributed to side A
    val sideB = col(sideBCol).cast("boolean")
    val rows = df
      .filter(col(valueCol).cast("double").isNotNull && sideB.isNotNull &&
        w.cast("long").isNotNull && w.cast("long") > 0)
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"),
        when(sideB, 1L).otherwise(0L).as("s"),
        w.cast("long").as("w"))

    // 1. two-sided census — the one full-data shuffle; weighted mass
    //    when a weight column is given, plain counts otherwise
    val census = rows.groupBy("g", "v")
      .agg(sum((lit(1L) - col("s")) * col("w")).as("ca"),
        sum(col("s") * col("w")).as("cb"))
      .materialize

    // 2. per-group stats + sentinel-bucketed histogram ids (see
    //    ExactQuantile for the NaN/±∞ rationale: one stray NaN must
    //    not collapse the histogram into a single-bucket sort funnel)
    val finiteV = !isnan(col("v")) &&
      col("v") =!= Double.PositiveInfinity &&
      col("v") =!= Double.NegativeInfinity
    val stats = census.groupBy("g")
      .agg(sum("ca").as("na"), sum("cb").as("nb"),
        min(when(finiteV, col("v"))).as("lo"),
        max(when(finiteV, col("v"))).as("hi"))
    val withB = census.join(hintSmall(stats), "g")
      .withColumn("b",
        when(isnan(col("v")), lit((buckets + 1).toLong))
          .when(col("v") === Double.PositiveInfinity, lit(buckets.toLong))
          .when(col("v") === Double.NegativeInfinity, lit(-1L))
          .when(col("hi").isNull || col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col("v") - col("lo")) / (col("hi") - col("lo")) * buckets),
            lit((buckets - 1).toLong)).cast("long")))

    // 3. per-bucket subtotals + exclusive base offsets per side
    val wBucket = Window.partitionBy("g").orderBy("b")
    val bases = withB.groupBy("g", "b")
      .agg(sum("ca").as("bca"), sum("cb").as("bcb"))
      .withColumn("basea", sum("bca").over(wBucket) - col("bca"))
      .withColumn("baseb", sum("bcb").over(wBucket) - col("bcb"))
      .select("g", "b", "basea", "baseb")

    // 4. exact CDF counts at every distinct value; deviation in
    //    integer (decimal) arithmetic. decimal(19,0) holds ANY long
    //    cumulative mass (no overflow-to-null above 10^18) and the
    //    19×19 cross products stay inside decimal(38,0) headroom.
    val wValue = Window.partitionBy("g", "b").orderBy("v")
    val dec = "decimal(19,0)"
    val scored = withB
      .join(bases, Seq("g", "b"))
      .withColumn("cuma", col("basea") + sum("ca").over(wValue))
      .withColumn("cumb", col("baseb") + sum("cb").over(wValue))
      .withColumn("d",
        abs(col("cuma").cast(dec) * col("nb").cast(dec) -
          col("cumb").cast(dec) * col("na").cast(dec)))

    // 5. max + deterministic witness (min v at the max deviation) in
    //    ONE map-side-combinable aggregation: max(struct(d, nr, vn))
    //    where (nr, vn) inverts the value's total order — nr ranks
    //    every non-NaN above NaN (so a tie at the max deviation never
    //    prefers the NaN sentinel), and vn = −v inverts the finite/±∞
    //    order exactly (negation is exact; v is recovered as −vn).
    //    A second pass over the deviation frame (and the materialize
    //    barrier it would need) measured ~20% of q55's x30 soak time
    //    before this fold (17.8 → 13.9 s).
    //    na/nb ride the SAME aggregation (r22): they are constant
    //    within a group (broadcast-joined stats columns), so max()
    //    recovers the exact integers and the output needs no separate
    //    stats consumer — the old `stats LEFT JOIN best` re-aggregated
    //    the census once more per force and cost a broadcast join.
    //    Every census row reaches `scored` (the bases join is inner on
    //    keys bases was built from; the gCum-style value join does not
    //    exist here), so groups(best) ≡ groups(stats) and the left
    //    join was vacuous — pinned in KsDriftSpec.
    val best = scored
      .groupBy("g")
      .agg(max(struct(col("d").as("d"),
        when(isnan(col("v")), 0L).otherwise(1L).as("nr"),
        when(isnan(col("v")), lit(0.0)).otherwise(-col("v")).as("vn")))
        .as("m"),
        max("na").as("na"), max("nb").as("nb"))
      .select(col("g"), col("m.d").as("dmax"),
        when(col("m.nr") === 0, lit(Double.NaN)).otherwise(-col("m.vn"))
          .as("arg_v"),
        col("na"), col("nb"))

    val bothSides = col("na") > 0 && col("nb") > 0
    best
      .select(col("g").as(groupCol),
        col("na").as("n_a"), col("nb").as("n_b"),
        when(bothSides, col("dmax").cast("double") /
          (col("na").cast("double") * col("nb").cast("double"))).as("ks"),
        when(bothSides, col("arg_v")).as("ks_value"))
  }
}
