package graft.operators

import graft.operators.Materialize.MaterializeOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling for training-data pipelines.
  *
  * At corpus scale, `df.sample()` is NOT reproducible across runs/plans
  * (partition-seeded RNG changes with partitioning), which breaks
  * dataset versioning. Hash-gating on a stable key is: the same row
  * always lands on the same side of the gate, on any cluster layout —
  * so a "10% eval split" is a pure function of the data.
  */
object Sampling {

  /** Deterministic fraction of rows by key hash: keeps rows whose
    * seeded hash falls under `fraction` of the hash space. */
  def byKeyHash(df: DataFrame, keyCol: String, fraction: Double,
      seed: Int = 42): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val buckets = 1000000L
    df.filter(pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets)) <
      (fraction * buckets).toLong)
  }

  /** Deterministic disjoint train/eval split by key hash. */
  def split(df: DataFrame, keyCol: String, evalFraction: Double,
      seed: Int = 42): (DataFrame, DataFrame) = {
    val buckets = 1000000L
    val gate = pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets))
    val cut = (evalFraction * buckets).toLong
    (df.filter(gate >= cut), df.filter(gate < cut))
  }

  /** Engine-portable deterministic gate: a UNIFORM 24-bit integer built
    * from the VALUES of the first 6 hex nibbles of md5(key), computable
    * bit-identically in any engine with md5 + ascii (the cross-engine-
    * verified split query t07 builds on this; [[portableGateSql]] emits
    * the matching DuckDB expression so the two can never drift).
    *
    * Why nibble values and not ascii codes: the ascii codes of hex
    * digits occupy {48..57, 97..102} — a lumpy subset of 0..255 — so
    * any gate built from raw `ascii(...)` bytes is structurally biased
    * under power-of-two moduli (e.g. `% 16` of an ascii-byte gate
    * depends only on the last char's code and hits just 10 of 16
    * residues). Mapping each hex char to its 0..15 value first gives a
    * gate uniform over 0..2^24-1, so `% 16`, `% 4096`, and (to within
    * 1 part in 1.7M) `% 10` are all uniform. The xxhash64 gates above
    * are faster (codegen'd, no hex string) — prefer them when
    * cross-engine replay of the exact split isn't required.
    *
    * GATE VERSION NOTE: the original gate (up to commit 6f75cea)
    * summed raw `ascii(...)` codes; commit 39723d4 cut over to the
    * hex-nibble-value form above. The two gates assign DIFFERENT
    * values to the same key, so any split/shard membership persisted
    * externally under the ascii gate does not survive the cutover —
    * the t15/t16 "every prior decision survives a corpus append"
    * property holds within a gate version, not across versions. A
    * deployment migrating persisted memberships either re-derives
    * them under the nibble gate (one linear pass) or keeps reading
    * old artifacts with the old formula; the cutover was made before
    * any artifact of this repo was persisted, and the gate is
    * FROZEN from 39723d4 on — any future change to the key→value
    * MAPPING must ship as a NEW function beside this one, never an
    * edit to it.
    *
    * KERNEL NOTE: the mapping is frozen; the kernel computing it is
    * not. This delegates to the native codegen expression
    * [[graft.functions.PortableGateExpr]] (one md5 digest per call —
    * the composed `ascii(substring(md5,…))` form evaluated SIX md5s
    * per call inside higher-order lambdas, where Catalyst CSE cannot
    * reach). Value-equivalence to the composed formula is pinned by
    * PortableGateSpec over random/unicode/null keys, and every oracle
    * interpolates [[portableGateSql]], so a kernel drift fails the
    * hash gate at sf0.001. */
  def portableGate(key: Column): Column =
    graft.functions.PortableGateExpr.portable_gate(key.cast("string"))

  /** The composed built-in-functions form of the frozen gate, kept as
    * the independent reference implementation for the kernel
    * equivalence pin (PortableGateSpec) — the Spark-side mirror of
    * what [[portableGateSql]] makes DuckDB compute. Not used by any
    * query. */
  private[graft] def portableGateComposed(key: Column): Column = {
    val h = md5(key.cast("string"))
    def nib(i: Int): Column = {
      val a = ascii(substring(h, i, 1))
      when(a >= 97, a - 87).otherwise(a - 48)
    }
    (1 to 6).map(i => nib(i) * lit(1 << (4 * (6 - i))): Column).reduce(_ + _)
  }

  /** The DuckDB-SQL mirror of [[portableGate]]: given a DuckDB string
    * expression for the key, returns the SQL expression computing the
    * identical uniform 24-bit gate. Oracle queries interpolate this so
    * the Spark and DuckDB arithmetic stay in sync by construction. */
  def portableGateSql(keySql: String): String = {
    def nib(i: Int): String = {
      val a = s"ascii(substring(md5($keySql), $i, 1))"
      s"($a - CASE WHEN $a >= 97 THEN 87 ELSE 48 END)"
    }
    (1 to 6).map(i => s"${nib(i)} * ${1 << (4 * (6 - i))}")
      .mkString("(", "\n       + ", ")")
  }

  /** Deterministic disjoint train/eval split on the portable gate:
    * eval = rows with gate mod `buckets` < `evalBuckets`. */
  def splitPortable(df: DataFrame, keyCol: String, buckets: Int = 10,
      evalBuckets: Int = 2): (DataFrame, DataFrame) = {
    val g = pmod(portableGate(col(keyCol)), lit(buckets))
    (df.filter(g >= evalBuckets), df.filter(g < evalBuckets))
  }

  /** Per-stratum fractions (e.g. balance languages): deterministic,
    * same hash-gating applied with a per-stratum cut. */
  def stratifiedByHash(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], seed: Int = 42): DataFrame = {
    val buckets = 1000000L
    val gate = pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets))
    val cut = fractions.foldLeft(lit(0L)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit((f * buckets).toLong)).otherwise(acc)
    }
    df.filter(gate < cut)
  }

  /** Deterministic EXACT-k weighted (PPS) sample per stratum via
    * systematic thresholds: order rows by the portable-gate shuffle key,
    * accumulate weight, and hit every row whose cumulative-weight
    * interval `(cw − w, cw]` contains a threshold `t_j = (j+0.5)·W/k`.
    * The k thresholds partition `(0, W]`, so per stratum the total hit
    * count is EXACTLY k and a row's inclusion probability under the
    * (hash-)random order is `min(1, k·w/W)` — the rate/Bernoulli gates
    * above ([[byKeyHash]], [[stratifiedByHash]]) give nominal fractions
    * with binomial jitter and no weighting; this is the "exactly 1000
    * docs per domain, probability ∝ token count" budgeting move, and a
    * row with `w ≥ W/k` is selected with certainty (hits ≥ 1, counted
    * once per threshold it absorbs). Everything is a pure function of
    * (key, salt, corpus), so the sample survives re-runs, retries, and
    * replanning; a new `salt` is the re-draw knob.
    *
    * Engine-portable by the same rules as
    * [[graft.operators.ExactQuantile.weightedQuantiles]]: integer
    * weight sums are order-independent exact, and every threshold
    * crossing is decided in INTEGER arithmetic — `cw ≥ (j+0.5)·W/k` is
    * tested as `2k·cw ≥ (2j+1)·W` in decimal, so there is no floating
    * point anywhere in the selection (t34's DuckDB oracle hash-matches
    * every per-row hit count via the same integer comparison). In
    * particular there is NO 2^53 bound: a stratum whose total weight
    * exceeds double's integer range (byte-mass weights at 100 TB) still
    * selects exactly. No `rand()`, no transcendentals — the
    * A-Res/A-ExpJ weighted-reservoir family needs `u^(1/w)` or
    * `ln(u)/w`, and `pow`/`ln` are NOT correctly rounded, so their
    * selections are engine-ambiguous at the ulp; systematic PPS is the
    * variant with an exact cross-engine witness.
    *
    * Scale shape (the ExactQuantile stages, keyed by shuffle order
    * instead of value): the gate is uniform over 24 bits, so bucket
    * `skey >> (24−bucketBits)` is monotone in the global order and
    * uniformly loaded — per-(stratum, bucket) mass aggregates map-side,
    * the ≤2^bucketBits-row base-offset window is per-stratum tiny, the
    * in-bucket running sum is a bounded-partition window, and
    * thresholds join back broadcast. No global sort, no single-reducer
    * window, no driver state: global cw = base + in-bucket cum is
    * identical to the flat cumsum because bucket order refines skey
    * order.
    *
    * Rows with null or non-positive weight are dropped (a non-positive
    * sampling weight is a dropped row — see weightedQuantiles). Output:
    * one row per SELECTED key — (strataCol, keyCol, weightCol,
    * `hits`) — where `hits` ≥ 1 is the number of thresholds absorbed;
    * `sum(hits)` per stratum is exactly k. */
  def systematicPps(df: DataFrame, strataCol: String, keyCol: String,
      weightCol: String, k: Int, salt: String = "pps",
      bucketBits: Int = 12, hinted: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(bucketBits >= 1 && bucketBits <= 23,
      s"bucketBits must be in [1,23], got $bucketBits")
    def hintSmall(small: DataFrame): DataFrame =
      if (hinted) broadcast(small) else small
    val shift = 24 - bucketBits

    val rows = df
      .select(col(strataCol).as("g"), col(keyCol).as("kk"),
        col(weightCol).as("w"))
      .filter(col("w").isNotNull && col("w") > 0)
      .withColumn("skey",
        portableGate(concat(col("kk").cast("string"), lit(":" + salt))))
      .withColumn("b", shiftright(col("skey"), shift).cast("long"))

    // per-(stratum, bucket) mass → exclusive base offsets; the window
    // ranges over ≤ 2^bucketBits rows per stratum. MATERIALIZED (r22,
    // the ExactQuantile histogram move): totals/thresholds, tb and
    // targets each sit under their own broadcast build, and without
    // the barrier every build re-ran the corpus scan + census + window
    // chain (52 Exchange nodes in t34's r21 published plan).
    val wB = Window.partitionBy("g").orderBy("b")
    val bases = rows.groupBy("g", "b").agg(sum("w").as("bw"))
      .withColumn("cum", sum("bw").over(wB))
      .withColumn("base", col("cum") - col("bw"))
      .materializeLazy
    val totals = bases.groupBy("g").agg(sum("bw").as("tw"))

    // k systematic thresholds per stratum: t_j = (j+0.5)·W/k ∈ (0, W),
    // carried as the INTEGER pair 2k·cw vs t2 = (2j+1)·W so every
    // crossing test is exact decimal arithmetic — no double conversion,
    // so no 2^53 total-weight ceiling (cw ≥ (2j+1)W/(2k) ⟺ 2k·cw ≥ t2)
    val dec = "decimal(19,0)"
    val twoK = lit(2L * k).cast(dec)
    val thresholds = totals
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("t2", (col("j").cast(dec) * lit(2L) + lit(1L))
        * col("tw").cast(dec))

    // crossing bucket per threshold: min b with 2k·cum ≥ t2. Both sides
    // are small (k·strata vs ≤2^bucketBits·strata rows) — hint the
    // build side explicitly so AQE's size race can't flip it
    // run-to-run (the d12 plan-digest artifact class).
    val tb = hintSmall(thresholds).join(bases.select("g", "b", "cum"),
        Seq("g"))
      .filter(col("cum").cast(dec) * twoK >= col("t2"))
      .groupBy("g", "j", "t2").agg(min("b").as("b"))
    val targets = hintSmall(tb).join(bases.select("g", "b", "base"),
        Seq("g", "b"))
      .select("g", "j", "t2", "b", "base")

    // in-bucket running mass over (skey, key); a row absorbs every
    // threshold inside its (prev, cw] interval
    val wV = Window.partitionBy("g", "b").orderBy("skey", "kk")
    val spans = rows
      .join(hintSmall(targets.select("g", "b").distinct()),
        Seq("g", "b"), "left_semi")
      .withColumn("cumv", sum("w").over(wV))
    val cw = (col("base") + col("cumv")).cast(dec) * twoK
    val hit = spans.join(hintSmall(targets), Seq("g", "b"))
      .filter(cw >= col("t2") && cw - col("w").cast(dec) * twoK < col("t2"))

    hit.groupBy("g", "kk", "w").agg(count(lit(1)).as("hits"))
      .select(col("g").as(strataCol), col("kk").as(keyCol),
        col("w").as(weightCol), col("hits"))
  }
}
