package graft.operators

import graft.operators.Materialize.MaterializeOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact interpolated percentiles (the `quantile_cont`
  * definition) without the single-buffer funnel.
  *
  * Spark's built-in `percentile` is a TypedImperativeAggregate: every
  * group's distinct (value → count) map is built inside ONE
  * aggregation buffer, serialized partial→final, and sorted on the
  * final reducer — per-group memory grows with the group's distinct
  * values, and each requested fraction builds its own map. At roster
  * scale that is a few hundred ms of overhead; at 100 TB a group with
  * billions of distinct values is a guaranteed executor OOM, the same
  * disease class as the dedup hot-bucket (SOAK.md) with memory in
  * place of time.
  *
  * This operator computes the identical result through bounded stages:
  *
  *  1. distinct-value census `(g, v) → c` — the only full-data
  *     shuffle, map-side combinable, shared by ALL requested
  *     fractions; materialized once (three consumers).
  *  2. per-group `n/lo/hi` (tiny) broadcast back; each census row gets
  *     an equi-width bucket id over [lo, hi] — bounds from finite
  *     values only, NaN/±∞ in sentinel buckets at the sort-order
  *     edges (-∞ < finite < +∞ < NaN, Spark's double ordering).
  *  3. per-(group, bucket) histogram + running base offsets — at most
  *     `buckets` rows per group, so the cumulative window is trivially
  *     small.
  *  4. rank targets: for each fraction f, position = f·(n−1)
  *     (0-indexed over the sorted multiset) needs the order statistics
  *     at floor(position) and ceil(position); the bucket histogram
  *     locates which bucket holds each, WITHOUT sorting anything yet.
  *  5. in-bucket rank select: only census rows of targeted buckets are
  *     scanned; a window sorted within (group, bucket) turns running
  *     counts into global rank spans, and the order statistic is the
  *     value whose span contains the target rank. The sort funnel is
  *     one bucket's distinct values — 1/buckets of the value RANGE —
  *     instead of the whole group. A value-mass pathology inside one
  *     bucket collapses first through the census — identical values
  *     are one row — and a DISTINCT-value pathology (billions of
  *     distinct values inside one equi-width bucket, e.g. one outlier
  *     stretching [lo, hi] to 10^6× the data's real spread) is closed
  *     by an ADAPTIVE second level: a scalar probe over the
  *     already-materialized bucket histogram (which carries each
  *     bucket's distinct-census-row count `nv` — r21) reads the
  *     widest bucket's distinct-value count, and only when it exceeds
  *     `maxBucketSort` do the targeted buckets re-bucket over their
  *     OWN [min, max] (which collapses the outlier-stretched range)
  *     before the rank-select window runs per (group, bucket,
  *     sub-bucket). The probe keeps the common-case plan byte-
  *     identical (no digest churn, no extra stages) at the cost of
  *     one tiny aggregation job; if a sub-bucket STILL exceeds the
  *     bound — distinct values concentrated in under 1/buckets² of
  *     the bucket's own spread — the operator fails loudly with both
  *     numbers instead of silently funneling one task.
  *  6. interpolation mirrors `Percentile.getPercentile` exactly —
  *     `(ceil(pos) − pos)·vLo + (pos − floor(pos))·vHi`, degenerate
  *     cases returning vLo — so results are bit-compatible with the
  *     built-in (ExactQuantileSpec asserts exact equality, and the
  *     q45 DuckDB oracle is unchanged).
  *
  * Returns one row per group: `groupCol`, one double column per named
  * fraction, and `n` (the non-null value count, which is what the
  * percentile is taken over). Null values are ignored, like the
  * built-in; groups whose every value is null vanish, like the
  * built-in's null result row would after the roster's join shapes.
  *
  * Two documented edges of the bit-compat contract:
  *
  *  - '''-0.0''': the census `groupBy` canonicalizes -0.0 to 0.0
  *    (Spark SQL's NormalizeFloatingNumbers grouping semantics), so an
  *    order statistic that IS a negative zero comes back +0.0 where
  *    the built-in's Java-keyed value map preserves the sign bit.
  *    Same SQL value, different `doubleToLongBits` — pinned in
  *    ExactQuantileSpec as the one deliberate deviation.
  *  - '''group cardinality''' (`hinted`): the default plan broadcasts
  *    the per-group stats and rank targets (one row per group, resp.
  *    groups × fractions × 2) — right for the usual
  *    few-to-millions-of-groups shape, but a groupCol with hundreds of
  *    millions of distinct groups would blow the broadcast, not the
  *    executors. Pass `hinted = false` to drop the hints and let the
  *    planner shuffle those joins on `g`; every stage is still
  *    bounded, it just pays shuffles where the broadcast was free.
  */
object ExactQuantile {

  /** Widest in-bucket sort the rank-select window may face before the
    * adaptive second bucketing level kicks in (distinct CENSUS rows
    * per bucket — duplicates already collapsed). 2^20 distinct doubles
    * sort in one task in well under a second and fit any sane executor;
    * override per call when an operator knows better. */
  val DefaultMaxBucketSort: Int = 1 << 20

  /** Scalar probe: the widest per-(g, b) distinct-value count in a
    * bucketed census frame (None on empty input). One tiny map-side-
    * combinable aggregation job over the already-materialized census. */
  private def widestBucket(withB: DataFrame, cols: String*): Option[Long] =
    Option(withB.groupBy(cols.map(col): _*).agg(count(lit(1)).as("nv"))
      .agg(max("nv")).head().get(0)).map(_.asInstanceOf[Long])

  /** Second-level bucket ids for targeted-bucket census rows: re-bucket
    * each (g, b) over its OWN finite [min, max] — the outlier that
    * stretched the level-1 range is in some other bucket by
    * construction, so the sub-buckets see the data's true local spread.
    * A single-valued (or NaN-sentinel, where min = max = NaN and Spark
    * SQL's NaN = NaN is true) bucket lands whole in sub-bucket 0. */
  private def subBucketed(sub: DataFrame, buckets: Int,
      hintSmall: DataFrame => DataFrame): DataFrame = {
    val stats2 = sub.groupBy("g", "b")
      .agg(min("v").as("lo2"), max("v").as("hi2"))
    sub.join(hintSmall(stats2), Seq("g", "b"))
      .withColumn("b2",
        when(col("hi2") === col("lo2"), lit(0L))
          .otherwise(least(
            floor((col("v") - col("lo2")) / (col("hi2") - col("lo2")) * buckets),
            lit((buckets - 1).toLong)).cast("long")))
      .drop("lo2", "hi2")
  }

  private def failOversized(what: String, widest: Long, bound: Int): Unit =
    throw new IllegalStateException(
      s"ExactQuantile: a targeted $what still holds $widest distinct " +
        s"values after the adaptive second bucketing level (bound " +
        s"$bound): the group's distinct values concentrate in under " +
        s"1/buckets² of their own spread. Raise maxBucketSort if one " +
        s"task may sort that many rows, or raise `buckets`.")

  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
      fractions: Seq[(String, Double)], buckets: Int = 4096,
      hinted: Boolean = true,
      maxBucketSort: Int = DefaultMaxBucketSort): DataFrame = {
    require(fractions.nonEmpty, "at least one fraction")
    require(fractions.forall { case (_, f) => f >= 0.0 && f <= 1.0 },
      s"fractions must be in [0,1]: $fractions")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(maxBucketSort >= 1, s"maxBucketSort must be >= 1")
    def hintSmall(small: DataFrame): DataFrame =
      if (hinted) broadcast(small) else small

    val rows = df
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)

    // 1. census — the one full-data shuffle, shared by all fractions
    val census = rows.groupBy("g", "v").agg(count(lit(1)).as("c"))
      .materialize

    // 2. per-group stats, broadcast back over the census. Bucket bounds
    //    come from FINITE values only, with NaN/±∞ routed to sentinel
    //    buckets in sort order (-∞ < finite < +∞ < NaN, matching both
    //    Spark's double ordering and the built-in's sorted multiset) —
    //    otherwise a single stray NaN makes hi−lo NaN, floor(NaN)
    //    casts to bucket 0 for every row, and the histogram silently
    //    collapses to the one-bucket full-group sort funnel this
    //    operator exists to avoid. n still counts ALL non-null values
    //    (NaN/∞ included), like the built-in.
    val finiteV = !isnan(col("v")) &&
      col("v") =!= Double.PositiveInfinity &&
      col("v") =!= Double.NegativeInfinity
    val stats = census.groupBy("g")
      .agg(sum("c").as("n"),
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

    // 3. bucket histogram + exclusive base offsets (≤ buckets rows/
    //    group) — MATERIALIZED (r21): the tiny frame feeds the probe,
    //    the rank targets (twice, via two broadcasts) and nothing
    //    recomputes the census→histogram→window chain per consumer;
    //    `nv` (distinct census rows per bucket) rides along so the
    //    oversized probe is an aggregation of this cached frame
    //    instead of its own census-wide groupBy job
    val wBucket = Window.partitionBy("g").orderBy("b")
    val bases = withB.groupBy("g", "b")
      .agg(sum("c").as("bc"), count(lit(1)).as("nv"))
      .withColumn("cum", sum("bc").over(wBucket))
      .withColumn("base", col("cum") - col("bc"))
      .materialize

    // 4. rank targets per (group, fraction): order statistics at
    //    floor(pos) and ceil(pos), located via the bucket histogram.
    //    n re-derives from the cached histogram (max cum ≡ Σ bc ≡ n,
    //    the same integer the census stats carry) so the broadcast
    //    jobs read ≤ buckets-sized cached rows, not the census
    val sp = df.sparkSession
    import sp.implicits._
    val fLit = fractions.zipWithIndex.map { case ((_, f), i) => (i, f) }
      .toDF("qi", "f")
    val nPerG = bases.groupBy("g").agg(max("cum").as("n"))
    val need = nPerG
      .crossJoin(broadcast(fLit))
      .withColumn("pos", col("f") * (col("n") - 1).cast("double"))
      .select(col("g"), col("qi"), col("pos"), explode(array(
        struct(lit("lo").as("which"), (floor(col("pos")) + 1).as("r")),
        struct(lit("hi").as("which"), (ceil(col("pos")) + 1).as("r"))))
        .as("x"))
      .select(col("g"), col("qi"), col("pos"),
        col("x.which").as("which"), col("x.r").as("r"))
    val targets = need.join(bases, Seq("g"))
      .filter(col("r") > col("base") && col("r") <= col("cum"))
      .select("g", "qi", "pos", "which", "r", "b", "base")

    // 5. in-bucket rank select over targeted buckets only. The scalar
    //    probe (one tiny agg over the materialized histogram) keeps
    //    this single-level — the common-case plan unchanged — unless
    //    some bucket's DISTINCT-value census would make the rank-select
    //    window a one-task sort funnel; then targeted buckets
    //    re-bucket over their own [min, max] first (see scaladoc §5).
    val oversized = Option(bases.agg(max("nv")).head().get(0))
      .exists(_.asInstanceOf[Long] > maxBucketSort)
    val stat = if (!oversized) {
      val wValue = Window.partitionBy("g", "b").orderBy("v")
      val spans = withB
        .join(hintSmall(targets.select("g", "b").distinct()),
          Seq("g", "b"), "left_semi")
        .withColumn("cumv", sum("c").over(wValue))
      spans.join(hintSmall(targets), Seq("g", "b"))
        .filter(col("r") > col("base") + col("cumv") - col("c") &&
          col("r") <= col("base") + col("cumv"))
    } else {
      val sub = subBucketed(
        withB.join(hintSmall(targets.select("g", "b").distinct()),
          Seq("g", "b"), "left_semi"),
        buckets, hintSmall).materialize
      widestBucket(sub, "g", "b", "b2")
        .filter(_ > maxBucketSort)
        .foreach(w => failOversized("sub-bucket", w, maxBucketSort))
      // sub-bucket histogram + exclusive offsets WITHIN the bucket
      // (≤ buckets rows per (g, b)), then locate each target's
      // sub-bucket by its in-bucket rank r − base
      val wB2 = Window.partitionBy("g", "b").orderBy("b2")
      val bases2 = sub.groupBy("g", "b", "b2").agg(sum("c").as("bc2"))
        .withColumn("cum2", sum("bc2").over(wB2))
        .withColumn("base2", col("cum2") - col("bc2"))
      val targets2 = hintSmall(targets).join(bases2, Seq("g", "b"))
        .filter(col("r") - col("base") > col("base2") &&
          col("r") - col("base") <= col("cum2"))
        .select("g", "qi", "pos", "which", "r", "b", "base", "b2", "base2")
      val wValue2 = Window.partitionBy("g", "b", "b2").orderBy("v")
      val spans2 = sub
        .join(hintSmall(targets2.select("g", "b", "b2").distinct()),
          Seq("g", "b", "b2"), "left_semi")
        .withColumn("cumv", sum("c").over(wValue2))
      spans2.join(hintSmall(targets2), Seq("g", "b", "b2"))
        .filter(col("r") > col("base") + col("base2") + col("cumv") - col("c") &&
          col("r") <= col("base") + col("base2") + col("cumv"))
    }

    // 6. Percentile-identical interpolation, then one column per name
    val interp = stat.groupBy("g", "qi", "pos").agg(
      max(when(col("which") === "lo", col("v"))).as("vLo"),
      max(when(col("which") === "hi", col("v"))).as("vHi"))
      .withColumn("q",
        when(col("vHi") === col("vLo"), col("vLo"))
          .otherwise((ceil(col("pos")) - col("pos")) * col("vLo") +
            (col("pos") - floor(col("pos"))) * col("vHi")))
    val named = fractions.zipWithIndex.map { case ((name, _), i) =>
      max(when(col("qi") === i, col("q"))).as(name)
    }
    interp.groupBy("g").agg(named.head, named.tail: _*)
      .join(nPerG, "g")
      .withColumnRenamed("g", groupCol)
  }

  /** Distributed type-1 (lower) WEIGHTED quantiles per group: the
    * smallest value whose cumulative weight reaches f·W. Spark has no
    * built-in weighted percentile at all, and the naive SQL shape is
    * a full per-group sort window over every row — the funnel
    * [[quantiles]] exists to avoid. This mirrors its bounded stages
    * with weight MASS in place of counts: weight census per (g, v)
    * (map-side combinable, the only full-data shuffle), per-group
    * bucket histogram of weight with running offsets, crossing-bucket
    * location per fraction, cumulative scan of only the targeted
    * buckets. Type-1 (no interpolation) is the definition with an
    * exact cross-engine SQL mirror — `min(v) where cum_weight ≥ f·W`
    * — and the natural semantics for sampling weights (the value
    * where a weighted sampler's CDF crosses f).
    *
    * Rows with null value, null weight, or weight ≤ 0 are ignored (a
    * non-positive sampling weight is a dropped row; admitting it
    * would make the CDF non-monotone). NaN/±∞ values ride
    * [[quantiles]]' sentinel buckets. Output: `groupCol`, one double
    * column per named fraction, and `wsum` — the group's total
    * admitted weight (the weight-domain counterpart of `n`), in the
    * weight column's own type. The crossing test compares the
    * cumulative weight against one double multiply `f·W`; pass an
    * integer-typed weight column when census sums must be
    * order-independent bit-exact (q54 casts its quantity weights to
    * long, and its DuckDB oracle computes the identical multiply). */
  def weightedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, fractions: Seq[(String, Double)],
      buckets: Int = 4096, hinted: Boolean = true,
      maxBucketSort: Int = DefaultMaxBucketSort): DataFrame = {
    require(fractions.nonEmpty, "at least one fraction")
    require(fractions.forall { case (_, f) => f >= 0.0 && f <= 1.0 },
      s"fractions must be in [0,1]: $fractions")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(maxBucketSort >= 1, s"maxBucketSort must be >= 1")
    def hintSmall(small: DataFrame): DataFrame =
      if (hinted) broadcast(small) else small

    val rows = df
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"),
        col(weightCol).as("w"))
      .filter(col("v").isNotNull && col("w").isNotNull && col("w") > 0)

    // 1. weight census — identical values collapse to one row carrying
    //    their total mass
    val census = rows.groupBy("g", "v").agg(sum("w").as("c"))
      .materialize

    // 2. per-group stats + sentinel-bucketed histogram (see quantiles)
    val finiteV = !isnan(col("v")) &&
      col("v") =!= Double.PositiveInfinity &&
      col("v") =!= Double.NegativeInfinity
    val stats = census.groupBy("g")
      .agg(sum("c").as("tw"),
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

    // 3. bucket histogram of weight + exclusive base offsets —
    //    MATERIALIZED with the distinct-row count `nv` riding along
    //    (same r21 move as [[quantiles]] §3: probe and targets read
    //    the tiny cached histogram instead of re-running the census
    //    chain per broadcast)
    val wBucket = Window.partitionBy("g").orderBy("b")
    val bases = withB.groupBy("g", "b")
      .agg(sum("c").as("bc"), count(lit(1)).as("nv"))
      .withColumn("cum", sum("bc").over(wBucket))
      .withColumn("base", col("cum") - col("bc"))
      .materialize

    // 4. crossing bucket per (group, fraction): min b with cum ≥ f·W
    //    (cum is strictly increasing over nonempty buckets, so this is
    //    the bucket holding the crossing value; f = 0 lands in the
    //    first nonempty bucket). tw re-derives from the cached
    //    histogram (max cum ≡ Σ bc ≡ tw, the same weight-sum value)
    val sp = df.sparkSession
    import sp.implicits._
    val fLit = fractions.zipWithIndex.map { case ((_, f), i) => (i, f) }
      .toDF("qi", "f")
    val twPerG = bases.groupBy("g").agg(max("cum").as("tw"))
    val need = twPerG
      .crossJoin(broadcast(fLit))
      .withColumn("t", col("f") * col("tw"))
    val tb = need.join(bases.select("g", "b", "cum"), Seq("g"))
      .filter(col("cum") >= col("t"))
      .groupBy("g", "qi", "t").agg(min("b").as("b"))
    val targets = tb.join(bases.select("g", "b", "base"), Seq("g", "b"))
      .select("g", "qi", "t", "b", "base")

    // 5. in-bucket crossing: the first v whose running mass reaches t.
    //    The t ≤ 0 disjunct admits the group's very first value for
    //    f = 0, where `previous < t` can never hold. Same adaptive
    //    second level as [[quantiles]] §5: the probe counts DISTINCT
    //    census rows per bucket (the sort size — mass concentration
    //    already collapsed through the census), and only a bucket
    //    with too many distinct values triggers the re-bucketing.
    val oversized = Option(bases.agg(max("nv")).head().get(0))
      .exists(_.asInstanceOf[Long] > maxBucketSort)
    val stat = if (!oversized) {
      val wValue = Window.partitionBy("g", "b").orderBy("v")
      val spans = withB
        .join(hintSmall(targets.select("g", "b").distinct()),
          Seq("g", "b"), "left_semi")
        .withColumn("cumv", sum("c").over(wValue))
      val prev = col("base") + col("cumv") - col("c")
      spans.join(hintSmall(targets), Seq("g", "b"))
        .filter(col("base") + col("cumv") >= col("t") &&
          (prev < col("t") || (col("t") <= 0 && prev <= 0)))
    } else {
      val sub = subBucketed(
        withB.join(hintSmall(targets.select("g", "b").distinct()),
          Seq("g", "b"), "left_semi"),
        buckets, hintSmall).materialize
      widestBucket(sub, "g", "b", "b2")
        .filter(_ > maxBucketSort)
        .foreach(w => failOversized("sub-bucket", w, maxBucketSort))
      // sub-bucket mass histogram + exclusive offsets within the
      // bucket, then the crossing SUB-bucket per target: min b2 with
      // base + cum2 ≥ t (mirrors the level-1 crossing-bucket location)
      val wB2 = Window.partitionBy("g", "b").orderBy("b2")
      val bases2 = sub.groupBy("g", "b", "b2").agg(sum("c").as("bc2"))
        .withColumn("cum2", sum("bc2").over(wB2))
        .withColumn("base2", col("cum2") - col("bc2"))
      val tb2 = hintSmall(targets).join(bases2, Seq("g", "b"))
        .filter(col("base") + col("cum2") >= col("t"))
        .groupBy("g", "qi", "t", "b", "base").agg(min("b2").as("b2"))
      val targets2 = hintSmall(tb2)
        .join(bases2.select("g", "b", "b2", "base2"), Seq("g", "b", "b2"))
      val wValue2 = Window.partitionBy("g", "b", "b2").orderBy("v")
      val spans2 = sub
        .join(hintSmall(targets2.select("g", "b", "b2").distinct()),
          Seq("g", "b", "b2"), "left_semi")
        .withColumn("cumv", sum("c").over(wValue2))
      val prev2 = col("base") + col("base2") + col("cumv") - col("c")
      spans2.join(hintSmall(targets2), Seq("g", "b", "b2"))
        .filter(col("base") + col("base2") + col("cumv") >= col("t") &&
          (prev2 < col("t") || (col("t") <= 0 && prev2 <= 0)))
    }

    // 6. one column per named fraction + the group's admitted weight
    val picked = stat.groupBy("g", "qi").agg(min("v").as("q"))
    val named = fractions.zipWithIndex.map { case ((name, _), i) =>
      max(when(col("qi") === i, col("q"))).as(name)
    }
    picked.groupBy("g").agg(named.head, named.tail: _*)
      .join(twPerG.select(col("g"), col("tw").as("wsum")), "g")
      .withColumnRenamed("g", groupCol)
  }
}
