package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale soak — measures the SCALING EXPONENT of the
  * roster's most expensive operator pipelines instead of arguing it
  * from plan shape (the round-12 verdict's top ask: every 100 TB claim
  * in this repo was executed only at sf0.1).
  *
  * `runMain graft.Soak [baseSfDir] [workDir]`
  *  - env SPARK_GRAFT_SOAK_SCALES: comma ints, default `1,3,10`
  *  - env SPARK_GRAFT_SOAK_SAMPLES: per-point repeats, min kept
  *    (default 2 — host jitter is one-sided, see tools/BENCH_NOTES.md)
  *  - env SPARK_GRAFT_CPUS: session parallelism, default 4
  *
  * == Corpus synthesis ==
  * Scale m replicates the base tables m× with content-preserving but
  * DECORRELATING perturbations, so the workload's per-replica
  * difficulty is isomorphic to the base while cross-replica rows never
  * collide as near-duplicates (naive replication would plant m−1 exact
  * twins of every row and grow candidate volume quadratically —
  * measuring an artifact, not the operator):
  *  - documents: every token gets a replica suffix (`tok` → `tokz2`) —
  *    shingle/minhash/simhash structure is a relabeled isomorph per
  *    replica, zero shingles shared across replicas; doc_id strides by
  *    2^20/replica; n_chars recomputed from the perturbed text.
  *  - embeddings: the vector circular-shifts by r dimensions —
  *    within-replica pairwise cosines are EXACTLY the base's
  *    (rotation is an isometry of the dot product), cross-replica
  *    cosines decorrelate; vec_id strides by 2^20; label kept (IVF
  *    lists grow m×, the realistic shape).
  *  - events: ids/users stride (2^24 / 2^20), timestamps kept — the
  *    same window range gets m× denser and the user-key state table
  *    grows m×, which is how event volume actually scales.
  *
  * == Query set ==
  * The 12 most expensive roster pipelines. Ten run VERBATIM via
  * SparkEntry (their corpus is the full scaled table). d09/d13 cap
  * their roster corpus to a fixed subset (oracle economics), so the
  * soak runs uncapped twins of the same operator code — label
  * propagation over banded minhash edges, and the full hierarchical
  * SemDeDup pipeline — on the whole scaled corpus; planted near-dups
  * ride every 10th doc/vector so dedup finds work at every scale.
  *
  * Output: one JSON line per measurement, then one `soak_summary`
  * line per query with its per-scale seconds and the fitted log-log
  * slope (`exponent`); SOAK.md interprets them. */
object Soak {

  private val DocStride = 1L << 20
  private val VecStride = 1L << 20
  private val EvStride = 1L << 24
  private val UserStride = 1L << 20
  private val Dim = 64
  // exposed for SoakSpec's replica-boundary assertions only
  private[graft] def docStrideForTest: Long = DocStride
  private[graft] def vecStrideForTest: Long = VecStride

  private def toksOf(c: Column): Column = filter(split(c, " "), t => t =!= "")

  /** m-replica scaled copies of documents/embeddings/events under
    * `out` (idempotent: skipped if the done-marker exists). */
  def synthesize(s: SparkSession, base: String, out: String, m: Int): Unit = {
    val done = new java.io.File(out, "_SOAK_DONE")
    // the marker alone is not enough: a work dir synthesized before a
    // table joined the set (orders r13, lineitem r15) would
    // skip-and-miss it
    if (done.exists() && new java.io.File(out, "orders.parquet").exists()
        && new java.io.File(out, "lineitem.parquet").exists())
      return
    val docs = s.read.parquet(s"$base/documents.parquet")
    val embs = s.read.parquet(s"$base/embeddings.parquet")
    val evs = s.read.parquet(s"$base/events.parquet")
    val ords = s.read.parquet(s"$base/orders.parquet")
    def docRep(r: Int): DataFrame =
      if (r == 0) docs.select("doc_id", "text", "lang", "source", "n_chars")
      else {
        val text = concat_ws(" ",
          transform(toksOf(col("text")), t => concat(t, lit(s"z$r"))))
        docs.select((col("doc_id") + lit(r * DocStride)).as("doc_id"),
          text.as("text"), col("lang"), col("source"),
          length(text).cast("long").as("n_chars"))
      }
    def embRep(r: Int): DataFrame = {
      // rotate by r mod Dim: a raw r > Dim would hand slice() a negative
      // length and crash synthesis for SPARK_GRAFT_SOAK_SCALES > 64
      val sh = r % Dim
      if (sh == 0)
        embs.select((col("vec_id") + lit(r * VecStride)).as("vec_id"),
          col("embedding"), col("label"))
      else
        embs.select((col("vec_id") + lit(r * VecStride)).as("vec_id"),
          concat(slice(col("embedding"), sh + 1, Dim - sh),
            slice(col("embedding"), 1, sh)).as("embedding"),
          col("label"))
    }
    def evRep(r: Int): DataFrame =
      evs.select((col("event_id") + lit(r * EvStride)).as("event_id"),
        col("ts"), (col("user_id") + lit(r * UserStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    (0 until m).map(docRep).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    (0 until m).map(embRep).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    (0 until m).map(evRep).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    // orders: key/customer-strided replicas, dates kept — the z-order
    // planner (q52) sees an m× corpus over an m× customer domain with
    // the same temporal span, i.e. the same grid occupancy shape
    def ordRep(r: Int): DataFrame =
      ords.select((col("o_orderkey") + lit(r * EvStride)).as("o_orderkey"),
        (col("o_custkey") + lit(r * UserStride)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    (0 until m).map(ordRep).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    // lineitem: re-keyed replicas with l_extendedprice shifted by r
    // cents — the quantile queries' value domain must GROW with the
    // corpus (replicated values would collapse in ExactQuantile's
    // distinct-value census and understate scaling; real 100 TB
    // doubles are near-continuous)
    val lis = s.read.parquet(s"$base/lineitem.parquet")
    def liRep(r: Int): DataFrame =
      lis.select((col("l_orderkey") + lit(r * EvStride)).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"),
        (col("l_extendedprice") + lit(r * 0.01)).as("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    (0 until m).map(liRep).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    done.createNewFile(): Unit
  }

  /** Full-corpus documents + a planted near-copy of every 10th doc
    * (the d09Corpus recipe, uncapped) so edge/cluster volume grows
    * WITH the corpus instead of staying a 240-doc constant. */
  // exposed for ExecutorLoss's disturbed-vs-baseline runs
  private[graft] def plantedDocsForHarness(s: SparkSession,
      d: String): DataFrame = plantedDocs(s, d)

  private def plantedDocs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select("doc_id", "text")
    val planted = base
      .filter(col("doc_id") % 10 === 0 &&
        size(toksOf(col("text"))) >= 20)
      .select((col("doc_id") + lit(100L * DocStride)).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text"))
    base.unionByName(planted)
  }

  private def embD(c: Column): Column =
    transform(c, x => x.cast("double"))
  private def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.array_cosine(a, b)

  /** The d13 SemDeDup pipeline on the FULL embeddings table
    * (+ planted ×1.001 copies of every 10th vector): the SHIPPED
    * [[graft.queries.SimilarityQueries.semDedupBuild]] path —
    * exact-vector collapse, lloyd coarse, lloydGrouped refine, routed
    * assignment, sign-salt capSplit, capped rep-pair join — with
    * k = ⌈√n_distinct⌉ growing with the corpus, which is exactly the
    * scaling claim under test. */
  private def d13Full(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), embD(col("embedding")).as("vec"))
    val planted = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + lit(100L * VecStride)).as("vec_id"),
        transform(col("vec"), x => x * lit(1.001)).as("vec"))
    val corpus = base.unionByName(planted)
    val (reps, assign, dupPairs) =
      graft.queries.SimilarityQueries.semDedupBuild(corpus)
    corpus.agg(count(lit(1)).as("n_vecs"))
      .crossJoin(reps.agg(count(lit(1)).as("n_reps")))
      .crossJoin(assign.agg(countDistinct("cl_id").as("n_clusters")))
      .crossJoin(dupPairs.agg(
        countDistinct(col("b.vec_id")).as("n_rep_dropped")))
  }

  /** The PRE-collapse d13 pipeline, kept verbatim as the skew mode's
    * comparator: hierarchical build + capSplit over the RAW corpus,
    * where h identical vectors share (cl_id, salt) and defeat the cap
    * with C(h,2) pairs in one task. Never shipped — exists so
    * `d13_hot_uncollapsed` measures what the collapse removes. */
  private[graft] def d13Uncollapsed(corpus: DataFrame,
      dim: Int = Dim): DataFrame = {
    import graft.operators.CentroidBuild
    import graft.operators.Materialize.MaterializeOps
    val n = corpus.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    val kc = math.ceil(math.sqrt(k.toDouble)).toInt
    val kf = (k + kc - 1) / kc
    val coarse = CentroidBuild.lloyd(corpus, "vec_id", "vec", kc,
      rounds = 1, dim = dim)
    val cells = CentroidBuild.nearest(
        CentroidBuild.similarities(corpus, coarse, "vec_id", "vec"), "vec_id")
      .withColumnRenamed("cl_id", "cell").materialize
    val embCell = corpus.join(cells, "vec_id")
    val fine = CentroidBuild.lloydGrouped(
      embCell, "cell", "vec_id", "vec", kf, rounds = 1, dim = dim)
    val assign = CentroidBuild.nearestGrouped(
        embCell, fine, "cell", "vec_id", "vec")
      .select(col("vec_id"),
        (col("cell") * (kf + 1) + col("fid")).as("cl_id")).materialize
    val withCl = corpus.select(col("vec_id"), col("vec"),
        CentroidBuild.signSalt(col("vec")).as("salt"))
      .join(assign, "vec_id")
    val split = CentroidBuild.capSplit(withCl,
      graft.queries.SimilarityQueries.SemDedupCap)
    val dupPairs = split.as("a").join(split.as("b"),
        col("a.cl_id") === col("b.cl_id") && col("a.sub") === col("b.sub") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.vec"), col("b.vec")))
      .filter(col("cos") >= 0.999)
    corpus.agg(count(lit(1)).as("n_vecs"))
      .crossJoin(assign.agg(countDistinct("cl_id").as("n_clusters")))
      .crossJoin(dupPairs.agg(
        countDistinct(col("b.vec_id")).as("n_dropped")))
  }

  /** Uncapped d09 on the SHIPPED path (exact-content collapse +
    * banded rep edges + pointer-doubling label propagation) over the
    * planted full corpus. */
  private def d09Full(s: SparkSession, d: String): DataFrame = {
    import graft.queries.DedupQueries
    val labels = DedupQueries.labelPropagateCollapsed(plantedDocs(s, d))
    labels.groupBy("lbl").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_clusters"), sum("sz").as("n_docs"),
        max("sz").as("largest"))
  }

  /** Hot-bucket skew corpus: the base documents plus h EXACT copies of
    * one ≥20-token doc — the error-page/boilerplate shape every web
    * crawl has. All h+1 copies share one bucket in EVERY band, so the
    * uncollapsed band self-join pays C(h+1,2) candidate pairs out of a
    * single task; the collapsed build pays h star rows. */
  private def hotDocs(s: SparkSession, d: String, h: Int): DataFrame = {
    val base = Tables.documents(s, d).select("doc_id", "text")
    val src = base.filter(size(toksOf(col("text"))) >= 20)
      .orderBy("doc_id").limit(1)
    val copies = src
      .select(explode(expr(s"sequence(1, $h)")).as("k"), col("text"))
      .select((col("k") + lit(200L * DocStride)).as("doc_id"), col("text"))
    base.unionByName(copies)
  }

  private def clusterCensus(labels: DataFrame): DataFrame =
    labels.groupBy("lbl").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_clusters"), sum("sz").as("n_docs"),
        max("sz").as("largest"))

  /** Hot-cluster skew corpus for the vector pipelines: the base
    * embeddings plus h EXACT copies of one vector. Identical vectors
    * share cell, salt, and sub, so the uncollapsed capSplit pair join
    * pays C(h+1,2) cosines out of one task; the collapsed build pays
    * one representative. */
  private def hotVecs(s: SparkSession, d: String, h: Int): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), embD(col("embedding")).as("vec"))
    val src = base.orderBy("vec_id").limit(1)
    val copies = src
      .select(explode(expr(s"sequence(1, $h)")).as("k"), col("vec"))
      .select((col("k") + lit(200L * VecStride)).as("vec_id"), col("vec"))
    base.unionByName(copies)
  }

  /** Hot-KEY fact table for the q41/q42 comparators: the sf-base
    * lineitem re-keyed, plus h synthetic rows that all share ONE key —
    * the shape where a shuffle sends the whole hot key's volume to a
    * single reducer. Built with `range(h)` (parallel) rather than an
    * explode of one sequence row (which would itself be the single-task
    * pathology the variants exist to measure). */
  private def hotFact(s: SparkSession, d: String, h: Int): DataFrame = {
    val base = Tables.lineitem(s, d).select(col("l_returnflag").as("k"),
      col("l_quantity").cast("double").as("qty"),
      col("l_extendedprice").cast("double").as("price"))
    val hot = s.range(h.toLong).select(lit("HOT").as("k"),
      lit(1.0).as("qty"), lit(1.0).as("price"))
    base.unionByName(hot)
  }

  /** The q42 comparators' dim side: one row per key plus a multiplier
    * column — small enough to broadcast (the q42_hot_bcast anchor) or
    * replicate-salt, never the side that shuffles. */
  private def dimOf(f: DataFrame): DataFrame =
    f.select("k").distinct()
      .withColumn("mult", when(col("k") === "HOT", 0.5).otherwise(1.0))

  /** Hot-SOURCE documents for the t23 comparators: base docs plus h
    * synthetic ids under one source, so the naive per-source top-N
    * window sorts h rows in a single partition. t23 reads only
    * (doc_id, source) — the gate is id-derived — so the hot rows need
    * no text. */
  private def hotSourceDocs(s: SparkSession, d: String, h: Int): DataFrame = {
    val base = Tables.documents(s, d).select("doc_id", "source")
    val hot = s.range(h.toLong)
      .select((col("id") + lit(300L * DocStride)).as("doc_id"),
        lit("hotsrc").as("source"))
    base.unionByName(hot)
  }

  /** Per-source top-N selection census over `docs` — the t23 body with
    * the two-phase gate-salt either on (shipped shape) or off (naive
    * single window, the oracle's shape). Selection is identical by
    * construction; only the partition profile differs. */
  private def sourceCapCensus(docs: DataFrame, salted: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val N = 10; val SALT = 8
    val gated = docs.select(col("doc_id"), col("source"),
      graft.operators.Sampling.portableGate(
        concat(col("doc_id").cast("string"), lit(":cap"))).as("g"))
    val kept =
      if (!salted) {
        val w = Window.partitionBy("source").orderBy(col("g"), col("doc_id"))
        gated.withColumn("rn", row_number().over(w)).filter(col("rn") <= N)
      } else {
        val w1 = Window.partitionBy(col("source"), pmod(col("g"), lit(SALT)))
          .orderBy(col("g"), col("doc_id"))
        val cand = gated.withColumn("rn1", row_number().over(w1))
          .filter(col("rn1") <= N)
        val w2 = Window.partitionBy("source").orderBy(col("g"), col("doc_id"))
        cand.withColumn("rn2", row_number().over(w2)).filter(col("rn2") <= N)
      }
    kept.groupBy("source").agg(count(lit(1)).as("n_kept"),
      sum("doc_id").as("kept_id_sum"), min("doc_id").as("min_kept_id"),
      max("doc_id").as("max_kept_id"))
  }

  /** One skew-mode measurement target: `conf` is applied around the
    * run and restored after (so AQE-skew toggles can't leak across
    * variants); h rungs above `maxH` are SKIPPED WITH A PRINTED LINE —
    * a silent cap would read as "measured and flat" (the d04
    * uncollapsed comparator pays ~52 µs per C(h,2) pair in one task;
    * its h=16384 rung is ~2 h of single-thread work, extrapolated in
    * SOAK.md instead of burned). */
  private case class SkewVariant(name: String, fn: Int => DataFrame,
      conf: Map[String, String] = Map.empty, maxH: Int = Int.MaxValue)

  /** Skew mode (`SPARK_GRAFT_SOAK_SKEW_H=512,2048,8192`): wall time vs
    * planted skew size h for BOTH skew families —
    *  - mega-DUPLICATE clusters (h identical docs/vectors) through the
    *    five collapse-protected pipelines, uncollapsed vs collapsed:
    *    the uncollapsed curves are ~quadratic (the cliff the collapse
    *    removes); label equality of the two builds is DedupSkewSpec's
    *    job, this mode only times them;
    *  - hot-KEY volume (h rows under one grouping/join/window key)
    *    through the q41/q42/t23 comparators: plain vs AQE-skew vs
    *    manual salt, the "when does hand salting beat AQE" experiment
    *    (BENCH_NOTES). These only bite at h ≫ the dup-cluster rungs
    *    (work is linear per row, not per pair), so sweep them
    *    separately at h ~ 10⁶ via SPARK_GRAFT_SOAK_ONLY. */
  private def skewMain(spark: SparkSession, base: String,
      hs: Seq[Int], samples: Int): Unit = {
    import graft.queries.DedupQueries
    val variants: Seq[SkewVariant] = Seq(
      SkewVariant("d09_hot_uncollapsed", (h: Int) => clusterCensus(
        DedupQueries.labelPropagate(
          DedupQueries.d09Edges(hotDocs(spark, base, h))))),
      SkewVariant("d09_hot_collapsed", (h: Int) => clusterCensus(
        DedupQueries.labelPropagateCollapsed(hotDocs(spark, base, h)))),
      SkewVariant("d02_hot_uncollapsed", (h: Int) =>
        DedupQueries.minhashPairsKernel(spark, hotDocs(spark, base, h))
          .agg(count(lit(1)).as("n_candidate_pairs"),
            sum(when(col("jaccard") >= 0.5, 1L).otherwise(0L))
              .as("n_dups_05"))),
      SkewVariant("d02_hot_collapsed", (h: Int) =>
        DedupQueries.minhashPairStatsCollapsed(
          spark, hotDocs(spark, base, h))),
      SkewVariant("d04_hot_uncollapsed", maxH = 4096, fn = (h: Int) => {
        // the retired d04 body: blocked pairs over the raw corpus —
        // identical texts share the prefix salt, so the hot group
        // lands in ONE sub-block
        val docs = hotDocs(spark, base, h)
          .join(Tables.documents(spark, base).select("doc_id", "lang"),
            Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("lang"), lit("en")).as("lang"),
            length(col("text")).as("n_chars"), col("text"))
        val salted = DedupQueries.d04Blocked(docs)
        val a = salted.select(col("lang"), col("lbucket"), col("sub"),
          col("doc_id").as("doc_a"), col("g").as("g_a"))
        val b = salted.select(col("lang"), col("lbucket"), col("sub"),
          col("doc_id").as("doc_b"), col("g").as("g_b"))
        a.join(b, Seq("lang", "lbucket", "sub"))
          .filter(col("doc_a") < col("doc_b"))
          .withColumn("jaccard",
            size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
              size(array_union(col("g_a"), col("g_b"))).cast("double"))
          .agg(count(lit(1)).as("n_pairs_compared"),
            sum(when(col("jaccard") >= 0.3, 1L).otherwise(0L))
              .as("n_sim_03"))
      }),
      SkewVariant("d04_hot_collapsed", (h: Int) => {
        val docs = hotDocs(spark, base, h)
          .join(Tables.documents(spark, base).select("doc_id", "lang"),
            Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("lang"), lit("en")).as("lang"),
            length(col("text")).as("n_chars"), col("text"))
        DedupQueries.ngramJaccardStatsCollapsed(docs)
      }),
      SkewVariant("d03_hot_uncollapsed", (h: Int) => {
        import graft.queries.DedupQueries.{simhashSketchKernel, simhashPairs}
        import graft.operators.Materialize.MaterializeOps
        // the sketch materialize matches the retired shipped query
        // exactly — the comparator must measure the old plan, not the
        // old plan plus a recompute artifact
        val sk = simhashSketchKernel(spark, hotDocs(spark, base, h))
          .materialize
        sk.agg(count(lit(1)).as("n_docs"))
          .crossJoin(simhashPairs(sk).agg(
            count(lit(1)).as("n_band_collisions"),
            sum(when(col("hamming") <= 8, 1L).otherwise(0L))
              .as("n_pairs_hamming_le8")))
      }),
      SkewVariant("d03_hot_collapsed", (h: Int) =>
        DedupQueries.simhashStatsCollapsed(
          spark, hotDocs(spark, base, h))),
      SkewVariant("d13_hot_uncollapsed", (h: Int) =>
        d13Uncollapsed(hotVecs(spark, base, h))),
      SkewVariant("d13_hot_collapsed", (h: Int) => {
        val (reps, assign, dupPairs) =
          graft.queries.SimilarityQueries.semDedupBuild(
            hotVecs(spark, base, h))
        reps.agg(count(lit(1)).as("n_reps"))
          .crossJoin(assign.agg(countDistinct("cl_id").as("n_clusters")))
          .crossJoin(dupPairs.agg(
            countDistinct(col("b.vec_id")).as("n_rep_dropped")))
      }),
      // ---- hot-KEY family: plain vs AQE-skew vs manual salt ----
      // q41: hot GROUP BY key. Expectation worth measuring honestly:
      // Spark's hash aggregate does map-side partial aggregation, so a
      // decomposable sum/count over a hot key is ALREADY flat — the
      // plain curve should match the salted one, and q41's salt is
      // paying an extra shuffle stage for insurance it only needs when
      // partial aggregation is defeated. The numbers make that case.
      SkewVariant("q41_hot_plain", (h: Int) =>
        hotFact(spark, base, h).groupBy("k")
          .agg(sum("qty").as("sum_qty"), count(lit(1)).as("cnt"))),
      SkewVariant("q41_hot_salted", (h: Int) =>
        graft.operators.SkewTools.saltedSumCount(
          hotFact(spark, base, h), Seq("k"), "qty")),
      // q42: hot JOIN key, dim side 4 rows. Four physical answers to
      // the same logical join, worst to best:
      //  - merge-hinted shuffle join, AQE skew split OFF: the funnel
      //    (the hot key's h rows sort-merge in one task);
      //  - same join, AQE skewJoin ON with thresholds scaled to the
      //    toy corpus (defaults trigger at 256 MB partitions — nothing
      //    this size would ever split): AQE's runtime rescue;
      //  - SkewTools.saltedJoin (merge-hinted): the manual rescue that
      //    also works where AQE can't see (non-SMJ plans, first run);
      //  - plain broadcast: the right answer whenever the dim fits —
      //    no shuffle of the fact side at all, skew irrelevant.
      SkewVariant("q42_hot_shuffle", (h: Int) => {
        val f = hotFact(spark, base, h)
        f.join(dimOf(f).hint("merge"), Seq("k"))
          .groupBy("k").agg(count(lit(1)).as("n"),
            sum(col("price") * col("mult")).as("adj"))
      }, conf = Map("spark.sql.adaptive.skewJoin.enabled" -> "false")),
      SkewVariant("q42_hot_aqeskew", (h: Int) => {
        val f = hotFact(spark, base, h)
        f.join(dimOf(f).hint("merge"), Seq("k"))
          .groupBy("k").agg(count(lit(1)).as("n"),
            sum(col("price") * col("mult")).as("adj"))
      }, conf = Map(
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m")),
      SkewVariant("q42_hot_salted", (h: Int) => {
        val f = hotFact(spark, base, h)
        graft.operators.SkewTools.saltedJoin(f, dimOf(f).hint("merge"), "k")
          .groupBy("k").agg(count(lit(1)).as("n"),
            sum(col("price") * col("mult")).as("adj"))
      }, conf = Map("spark.sql.adaptive.skewJoin.enabled" -> "false")),
      SkewVariant("q42_hot_bcast", (h: Int) => {
        val f = hotFact(spark, base, h)
        f.join(broadcast(dimOf(f)), Seq("k"))
          .groupBy("k").agg(count(lit(1)).as("n"),
            sum(col("price") * col("mult")).as("adj"))
      }),
      // t23: hot WINDOW key — per-source top-N where one source holds
      // h of the rows. The naive single window sorts h rows in one
      // partition; the shipped two-phase gate-salt bounds any
      // partition at ~h/8 and ranks only 8·N finalists.
      SkewVariant("t23_hot_naive", (h: Int) =>
        sourceCapCensus(hotSourceDocs(spark, base, h), salted = false)),
      SkewVariant("t23_hot_salted", (h: Int) =>
        sourceCapCensus(hotSourceDocs(spark, base, h), salted = true)))
    val only = sys.env.get("SPARK_GRAFT_SOAK_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- variants.map(_.name).toSet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_SOAK_ONLY names unknown skew variants: " +
          unknown.mkString(","))
    }
    val vs = variants.filter(v => only.forall(_.contains(v.name)))
    require(vs.nonEmpty, "SPARK_GRAFT_SOAK_ONLY selects no skew variant")
    // apply a variant's session confs for exactly one measurement and
    // restore the previous values — an AQE toggle must not leak into
    // the next variant's timing
    def withVariantConf[A](conf: Map[String, String])(body: => A): A = {
      val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toSeq
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    // warmup: smallest h once through every variant; failures are
    // logged, not fatal — the run must survive the deliberately
    // near-death uncollapsed variants to print its summary
    vs.foreach { v =>
      if (hs.min <= v.maxH) {
        try withVariantConf(v.conf) { Bench.force(v.fn(hs.min)); () }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[skew] ${v.name} warmup FAILED: ${e.getMessage}") }
        Bench.scrub(spark)
      }
    }
    val results = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[Int, Double]]
    (1 to samples).foreach { sample =>
      hs.foreach { h =>
        vs.foreach { v =>
          val name = v.name
          if (h > v.maxH) {
            // loud, not silent: a skipped rung must never read as
            // "measured and flat" in the summary table
            println(s"""{"skew":"$name","h":$h,"skipped":"h > maxH=${v.maxH}"}""")
          } else {
            val t0 = System.nanoTime()
            val ok = try { withVariantConf(v.conf) { Bench.force(v.fn(h)) }; true }
              catch { case scala.util.control.NonFatal(e) =>
                System.err.println(s"[skew] $name h=$h FAILED: ${e.getMessage}")
                false }
            val dt = (System.nanoTime() - t0) / 1e9
            if (ok) {
              val qmap = results.getOrElseUpdate(name,
                scala.collection.mutable.Map.empty)
              qmap(h) = math.min(qmap.getOrElse(h, Double.MaxValue), dt)
              println(f"""{"skew":"$name","h":$h,"sample":$sample,"sec":$dt%.3f}""")
            }
          }
          Console.flush()
          Bench.scrub(spark)
        }
      }
    }
    results.toSeq.sortBy(_._1).foreach { case (name, qmap) =>
      val bySc = qmap.toSeq.sortBy(_._1)
      val per = bySc.map { case (h, t) => f""""h$h":$t%.3f""" }.mkString(",")
      bySc.takeRight(2) match {
        case Seq((h1, t1), (h2, t2)) =>
          val tail = math.log(t2 / t1) / math.log(h2.toDouble / h1)
          println(
            f"""{"skew_summary":"$name",$per%s,"tail_exponent":$tail%.3f}""")
        case _ =>
          println(f"""{"skew_summary":"$name",$per%s}""")
      }
    }
  }

  private val Verbatim = Seq("d02_minhash_lsh", "s11_ivfpq_adc",
    "s17_nprobe_sweep", "s18_pq_recall", "s19_adc_rerank",
    "s24_hier_kmeans", "t14_shard_pack", "t27_lm_perplexity",
    "e15_late_data_audit", "e19_stream_outer_join",
    "q52_zorder_skipping", "t33_cdc_chunking", "m10_scene_cuts",
    "q45_percentile_exact", "q54_weighted_quantile", "t34_pps_sample",
    "q55_ks_drift", "q56_weighted_moments", "t35_length_drift",
    "t37_source_anomaly", "t39_source_mass_anomaly",
    "e21_stream_ks_drift", "t40_perm_drift_test",
    "e22_stream_ks_closed", "s26_embed_drift",
    "t41_perm_source_anomaly", "e23_stream_embed_drift",
    "t42_bpe_learn", "s27_graph_beam", "t43_bpe_apply",
    "e24_proj_leaderboard",
    // r19: m11 (r18 advice — landed without a soak row) + the six new
    // operators (two iterative learners, the incremental graph index,
    // the streaming fertility drift, the span excision, the token
    // mixture)
    "m11_interleave_match", "t44_quality_learn", "t45_quality_audit",
    "t46_token_mixture", "s28_graph_incremental", "e25_fertility_drift",
    "d28_verbatim_removal",
    // r20: the quality-keeper election (d09 components × t44 margins),
    // the banded best-fit packer, and the streaming quality monitor
    "d29_quality_keeper", "t47_bestfit_pack", "e26_quality_drift")

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Verbatim.map(n => n -> SparkEntry.queries(n)) ++
      Seq("d09_full_labelprop" -> (d09Full(_, _)),
        "d13_full_semdedup" -> (d13Full(_, _)))

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_soak")
    // skew mode has its own variant roster — its ONLY filter is
    // validated inside skewMain, so the query-roster validation below
    // must not see skew variant names
    val skewMode = sys.env.contains("SPARK_GRAFT_SOAK_SKEW_H")
    // dev-loop filter, same convention as Verify's SPARK_GRAFT_ONLY:
    // soak only the named queries (new roster members join the corpus
    // without re-measuring the settled 12)
    val only = sys.env.get("SPARK_GRAFT_SOAK_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val qs = queries.filter(q => only.forall(_.contains(q._1)))
    if (!skewMode) {
      only.foreach { names =>
        val unknown = names -- queries.map(_._1).toSet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_SOAK_ONLY names unknown queries: ${unknown.mkString(",")}")
      }
      require(qs.nonEmpty, "SPARK_GRAFT_SOAK_ONLY selects no query")
    }
    val scales = sys.env.getOrElse("SPARK_GRAFT_SOAK_SCALES", "1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    val samples = sys.env.getOrElse("SPARK_GRAFT_SOAK_SAMPLES", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val skewHs = sys.env.get("SPARK_GRAFT_SOAK_SKEW_H")
      .map(_.split(",").map(_.trim.toInt).toSeq)
    if (skewHs.isDefined) {
      skewMain(spark, base, skewHs.get, samples)
      spark.stop()
      sys.exit(0)
    }
    scales.foreach { m =>
      synthesize(spark, base, s"$work/x$m", m)
      println(s"""{"soak":"synthesized","scale":$m}""")
    }
    // warmup (untimed): smallest scale once through every query
    qs.foreach { case (_, fn) =>
      try { Bench.force(fn(spark, s"$work/x${scales.min}")); () }
      catch { case scala.util.control.NonFatal(_) => () }
      Bench.scrub(spark)
      // the soak measures the OPERATOR (build + query), not the r20
      // session memo: evict shared-build entries so every timed run
      // pays its full build — without this, sample 2 of a memoized
      // query (t42-family, s27/s28, t44/t45) would time only the
      // post-build path and min-of-samples would report it. Same for
      // d29's shared d09Labels component build.
      graft.operators.BuildMemo.evictSession(
        spark.sparkContext.applicationId)
      graft.queries.DedupQueries.evictSession(
        spark.sparkContext.applicationId)
    }
    val results = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[Int, Double]]
    (1 to samples).foreach { sample =>
      scales.foreach { m =>
        qs.foreach { case (name, fn) =>
          val t0 = System.nanoTime()
          val ok = try { Bench.force(fn(spark, s"$work/x$m")); true }
            catch { case scala.util.control.NonFatal(e) =>
              System.err.println(s"[soak] $name x$m FAILED: ${e.getMessage}")
              false }
          val dt = (System.nanoTime() - t0) / 1e9
          if (ok) {
            val qmap = results.getOrElseUpdate(name,
              scala.collection.mutable.Map.empty)
            qmap(m) = math.min(qmap.getOrElse(m, Double.MaxValue), dt)
            println(f"""{"soak":"$name","scale":$m,"sample":$sample,"sec":$dt%.3f}""")
          }
          Console.flush()
          Bench.scrub(spark)
          // full-build timing per run (see the warmup-loop note)
          graft.operators.BuildMemo.evictSession(
            spark.sparkContext.applicationId)
          graft.queries.DedupQueries.evictSession(
            spark.sparkContext.applicationId)
        }
      }
    }
    // least-squares slope of log(t) on log(m) — the scaling exponent
    // (raw wall times include a fixed per-query floor, so exponents
    // UNDER-estimate asymptotic growth; superlinear readings are the
    // alarming ones, see SOAK.md)
    qs.foreach { case (name, _) =>
      results.get(name).filter(_.size >= 2).foreach { qmap =>
        val pts = qmap.toSeq.sortBy(_._1)
          .map { case (m, t) => (math.log(m.toDouble), math.log(t)) }
        val n = pts.size.toDouble
        val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
        val sxx = pts.map(p => p._1 * p._1).sum
        val sxy = pts.map(p => p._1 * p._2).sum
        val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        // tail segment (two largest scales): the informative reading —
        // the per-query fixed floor (session/planning/stream spin-up)
        // flattens the global fit at small scales
        val bySc = qmap.toSeq.sortBy(_._1)
        val Seq((m1, t1), (m2, t2)) = bySc.takeRight(2).toSeq
        val tail = math.log(t2 / t1) / math.log(m2.toDouble / m1)
        val per = bySc
          .map { case (m, t) => f""""x$m":$t%.3f""" }.mkString(",")
        println(f"""{"soak_summary":"$name",$per%s,"exponent":$slope%.3f,"tail_exponent":$tail%.3f}""")
      }
    }
    spark.stop()
  }
}
