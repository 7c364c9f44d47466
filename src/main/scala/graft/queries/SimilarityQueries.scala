package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Materialize.MaterializeOps

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale design: the query set is tiny and broadcast, so brute force is
  * one scan of the corpus with per-row vector math (no shuffle but the
  * final top-k); the LSH variant prunes the scan to one bucket per
  * query — the standard recall/latency trade. Vector math runs through
  * the native codegen'd kernels in [[graft.functions.VectorExpressions]]
  * in double precision; a real deployment would bucket once and store
  * bucket ids.
  */
object SimilarityQueries {

  /** embedding as double[] (float arithmetic differs across engines;
    * double is bit-stable for the oracle compare). */
  private def embD(c: Column): Column =
    transform(c, x => x.cast("double"))

  // Native codegen'd kernels (graft.functions.VectorExpressions) — the
  // HOF composition aggregate(zip_with(...)) is interpreted and ~10×
  // slower on the ANN scan path. Same accumulation order, so results
  // are bit-identical to the composed form and to the DuckDB oracle.
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.array_dot(a, b)

  private def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.array_cosine(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Deterministic random hyperplanes (fixed seed — the plan must be
    * reproducible across runs and engines). */
  private def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(42)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** One shared multi-table sign-LSH configuration: every pipeline that
    * buckets vectors (s02/s05 query-driven, d05/d07 all-pairs) MUST use
    * the same tables × bits and the same hyperplanes, or their planted
    * oracles would silently describe different hash families. */
  private val LshTables = 4
  private val LshBits = 8
  private lazy val lshPlanes = planes(LshTables * LshBits, 64)

  /** Max vectors per d13 cluster before [[graft.operators.CentroidBuild
    * .capSplit]] sub-splits it on the sign-pattern salt. 8 exercises
    * the split on the verify corpus (k = ⌈√220⌉ = 15 k-means clusters
    * average ~15 vecs, so typical nsub = 2 and the salted path is
    * oracle-covered, not dormant); production sizes this to the
    * pair-work budget — e.g. 4096 caps each sub-cluster at ≤ 8M
    * comparisons while keeping near-dup recall (the salt is
    * content-derived, see signSalt). (Was 16 against the retired
    * per-label quantizer's ~22-vec clusters; the k = ⌈√n⌉ build makes
    * the average cluster √n, so the cap moved below it.) */
  val SemDedupCap = 8

  /** s27 graph-ANN knobs: within-cluster kNN degree, beam width, fixed
    * beam rounds, answer/truth k, and seed fine-cluster count. Degree
    * and beam width trade edge storage / per-round join width for
    * recall exactly as HNSW's M/ef do; fixed rounds keep the strict
    * oracle (production walks until the beam stops improving). */
  val GraphM = 6
  val GraphB = 12
  val GraphRounds = 3
  val GraphK = 10
  val GraphSeedF = 6

  /** The shared SemDeDup pipeline: EXACT-VECTOR COLLAPSE, then the
    * hierarchical build (coarse lloyd + per-cell refine + routed
    * assignment), then the sign-salt cap-split pair join over
    * REPRESENTATIVES. Returns (reps, assign, repDupPairs):
    * reps = (vec_id = min id of its exact-duplicate group, vec,
    * gsize), assign = (vec_id, cl_id) over reps, repDupPairs = the
    * capped within-(cl_id, sub) pairs at cosine ≥ 0.999 with their
    * exact cos. Consumed by the d13 roster tail and the Soak twin.
    *
    * Why the collapse is load-bearing (the d09 hot-bucket argument,
    * vector edition): [[graft.operators.CentroidBuild.capSplit]]'s
    * salt is CONTENT-derived — deliberately, so a duplicate always
    * shares its original's sub-cluster (recall) — which means h
    * EXACT copies of one vector share (cl_id, salt), collapse into
    * ONE sub, and the pair join pays C(h,2) cosines in one task: the
    * cap's n·cap/2 bound silently assumes salt diversity that
    * identical content does not have. Grouping by the exact vector
    * first (this is also the published SemDeDup composition — exact
    * dedup precedes semantic dedup) restores the bound: a non-rep
    * member is a drop by definition (its rep is an identical vector
    * with a smaller id), and rep-level pairs decide everything else,
    * because cell routing, salt, and cosine are functions of the
    * vector alone. On a duplicate-free corpus the collapse is the
    * identity and the pipeline is unchanged. Consequence the
    * uncollapsed form gets WRONG, pinned by CentroidSplitSpec: a
    * mega-duplicate group inflates the uncollapsed cluster census, so
    * nsub grows and a genuine near-dup NEIGHBOR of the duplicated
    * vector can land in a different sub and silently escape the drop
    * set — collapsing fixes recall, not just cost. Every stage
    * (group-by-list, min, count) is portable, so the d13 oracle
    * replicates the collapse verbatim. */
  def semDedupBuild(corpusIn: DataFrame, dim: Int = 64)
      : (DataFrame, DataFrame, DataFrame) = {
    import graft.operators.{CentroidBuild => CB}
    val reps = corpusIn.groupBy("vec")
      .agg(min("vec_id").as("vec_id"), count(lit(1)).as("gsize"))
      .select("vec_id", "vec", "gsize").materialize
    // bounded scalar read — the s07/q47 discipline; k sizes from
    // DISTINCT content (what clustering structure actually exists)
    val n = reps.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    val kc = math.ceil(math.sqrt(k.toDouble)).toInt
    val kf = (k + kc - 1) / kc
    val repVecs = reps.select("vec_id", "vec")
    val coarse = CB.lloyd(repVecs, "vec_id", "vec", kc, rounds = 1,
      dim = dim)
    val cells = CB.nearest(
        CB.similarities(repVecs, coarse, "vec_id", "vec"), "vec_id")
      .withColumnRenamed("cl_id", "cell").materialize
    val embCell = repVecs.join(cells, "vec_id")
    val fine = CB.lloydGrouped(embCell, "cell", "vec_id", "vec", kf,
      rounds = 1, dim = dim)
    val assign = CB.nearestGrouped(embCell, fine, "cell", "vec_id", "vec")
      .select(col("vec_id"),
        (col("cell") * (kf + 1) + col("fid")).as("cl_id"))
      .materialize
    val withCl = repVecs.select(col("vec_id"), col("vec"),
        CB.signSalt(col("vec")).as("salt"))
      .join(assign, "vec_id")
    val split = CB.capSplit(withCl, SemDedupCap)
    val dupPairs = split.as("a").join(split.as("b"),
        col("a.cl_id") === col("b.cl_id") &&
          col("a.sub") === col("b.sub") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.vec"), col("b.vec")))
      .filter(col("cos") >= 0.999)
    (reps, assign, dupPairs)
  }

  /** Sign-pattern bucket id of `vec` in hash table `table` (Gaussian
    * random hyperplanes — the classic cosine-LSH family; constants are
    * driver-side Gaussians, so this family is verified by its planted
    * companions d07/s05, not by SQL replication). */
  private def lshSignature(vec: Column, table: Int): Column =
    aggregate(
      zip_with(typedLit(lshPlanes.slice(table * LshBits, (table + 1) * LshBits)),
        sequence(lit(0), lit(LshBits - 1)),
        (plane, idx) => when(dot(plane, vec) > 0,
          pow(lit(2.0), idx).cast("long")).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)

  /** PORTABLE axis-sign bucket id for table `table`: bit i is the sign
    * of stored dimension `table·8 + i + 1` — axis-aligned hyperplanes,
    * the [[graft.operators.CentroidBuild.signSalt]] family tiled across
    * disjoint dimension slices (4 tables × 8 bits covers dims 1–32).
    * Comparing a stored double to zero is exact on both engines, so the
    * whole bucketing replicates in SQL with NO floating-point edge (the
    * Gaussian family's near-zero-projection caveat disappears) — this
    * is the s02/d05 production path since r12, giving both full DuckDB
    * hash oracles. Dims here are balanced (~50% positive per dim,
    * measured: 256/256 buckets hit, max 16 of 2000 vecs at sf0.1), the
    * regime where axis-sign bucketing prunes exactly like a random
    * hyperplane table; a deployment with skewed dims mean-centers first
    * or falls back to [[lshSignature]]. */
  private def signPatternSignature(vec: Column, table: Int): Column =
    (0 until LshBits).map(i =>
      when(element_at(vec, table * LshBits + i + 1) > 0,
        lit(1L << i)).otherwise(0L): Column)
      .reduce(_ + _)

  /** DuckDB mirror of [[signPatternSignature]]. */
  private def signPatternSql(vecSql: String, table: Int): String =
    (0 until LshBits).map(i =>
      s"(CASE WHEN $vecSql[${table * LshBits + i + 1}] > 0 " +
        s"THEN ${1L << i} ELSE 0 END)").mkString("(", " + ", ")")

  /** The d05 all-pairs-within-buckets near-dup pipeline over an
    * arbitrary (vec_id, vec double[]) frame, returning one row per LSH
    * candidate pair with its exact cosine: (id_a, id_b, cos). Factored
    * out so the planted-duplicate oracle (d07) proves the same code
    * path count-correct against a DuckDB brute force. Candidate volume
    * is Σ bucket² rather than n²; the id-only dedup happens before the
    * vector rejoin so payload arrays never shuffle with signatures.
    */
  def neardupPairs(emb: DataFrame,
      sigFn: (Column, Int) => Column = lshSignature): DataFrame = {
    val tabled = emb.select(col("vec_id"),
      explode(array((0 until LshTables).map(t =>
        struct(lit(t).as("tbl"), sigFn(col("vec"), t).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl"), col("tb.bucket"))
    val candIds = tabled.as("a").join(tabled.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    candIds
      .join(emb.select(col("vec_id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(emb.select(col("vec_id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .select("id_a", "id_b", "cos")
  }

  /** Query-driven multi-table sign-LSH top-k over (vec_id, vec):
    * L=4 tables × 8 hyperplanes. One table of many bits strands
    * near-orthogonal queries alone in their bucket; multiple short
    * tables give each query E[corpus/256] candidates per table while
    * still pruning ~99.6% of the scan. Queries are the rows matching
    * `isQuery`; candidates are deduped on the id pair only (a pair can
    * collide in several tables) before the vectors join back, so
    * payload arrays never shuffle through the distinct. Factored out so
    * s02 and the planted ground-truth check (s05) share one code path. */
  def lshTopK(emb: DataFrame, isQuery: Column, k: Int,
      sigFn: (Column, Int) => Column = lshSignature): DataFrame = {
    // signatures only — the payload vector must not fan out through the
    // ×L explode (it rejoins by id after the candidate dedup)
    val tabled = emb.select(col("vec_id"),
      explode(array((0 until LshTables).map(t =>
        struct(lit(t).as("tbl"), sigFn(col("vec"), t).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl"), col("tb.bucket"))
    val queriesDf = tabled.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    val candIds = tabled
      .join(broadcast(queriesDf), Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id").distinct()
    val scored = candIds
      .join(broadcast(emb.filter(isQuery)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))), "q_id")
      .join(emb, "vec_id")
      .withColumn("cos", cosine(col("q_vec"), col("vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
        RelationalQueries.rnd(col("cos"), 4).as("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** Shared IVF-PQ ADC scoring pipeline — s11's index AND s18's recall
    * audit consume this one code path (the s10/s04 sharing discipline:
    * an evaluation that re-inlines its index can silently measure a
    * different index). Returns (q_id, vec_id, adc_e6): every candidate
    * whose home list is probed, scored by the integer 8-way ADC sum.
    * See s11's scaladoc for the full design + scale story (everything
    * small broadcasts; the corpus never shuffles to be assigned or
    * encoded). */
  /** The IVF-PQ index build — (cents, codebook, enc), the artifacts a
    * production deployment builds ONCE at ingest and serves many
    * queries from. Exposed unmemoized so the memo-hit ≡ memo-miss spec
    * can compare against a direct computation (the graphIndexDirect
    * discipline). */
  private[graft] def pqIndexDirect(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val S = 8; val Dsub = 8; val K = 16
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), embD(col("embedding")).as("vec"))
    val cents = graft.operators.CentroidBuild.centroids(
      Tables.embeddings(s, d)
        .select(col("label"), embD(col("embedding")).as("vec")),
      col("label"), col("vec"))
    val sims = graft.operators.CentroidBuild.similarities(
      emb, cents, "vec_id", "vec")
    val assign = graft.operators.CentroidBuild.nearest(sims, "vec_id")
    // residual = vec − home centroid (exact double subtraction of the
    // rnd6 centroid — portable); the corpus-side join key is the
    // broadcast assignment's cl_id
    val resid = emb.join(assign, "vec_id")
      .join(broadcast(cents.select("cl_id", "cvec")), "cl_id")
      .select(col("vec_id"), col("cl_id"),
        expr("zip_with(vec, cvec, (a, b) -> a - b)").as("rvec"))
    // residual codebook: md5-seeded sample of 16 residuals (the s08
    // no-refinement baseline; a production build runs s07's Lloyd
    // loop per subspace on the same machinery)
    val seeds = resid.withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h").limit(K)
    val wSeed = Window.orderBy("h")
    val seeded = seeds.select(row_number().over(wSeed).as("code"),
      col("rvec"))
    def subSlices(vecCol: String, outName: String) =
      explode(array((0 until S).map(sp => struct(lit(sp).as("sp"),
        expr(s"slice($vecCol, ${sp * Dsub} + 1, $Dsub)").as(outName))): _*))
    val codebook = seeded
      .select(col("code"), subSlices("rvec", "cvec").as("e"))
      .select(col("e.sp"), col("code"), col("e.cvec"))
    // encode every residual: argmin rnd6 subspace distance (ties →
    // smaller code), 8 code rows per vector
    val subs = resid
      .select(col("vec_id"), col("cl_id"), subSlices("rvec", "sub").as("e"))
      .select(col("vec_id"), col("cl_id"), col("e.sp"), col("e.sub"))
    val wMin = Window.partitionBy("vec_id", "sp")
      .orderBy(col("dist2").asc, col("code"))
    val enc = subs.join(broadcast(codebook), "sp")
      .withColumn("diff", expr("zip_with(sub, cvec, (a, b) -> a - b)"))
      .withColumn("dist2", RelationalQueries.rnd(dot(col("diff"), col("diff")), 6))
      .withColumn("rn", row_number().over(wMin))
      .filter(col("rn") === 1)
      .select("vec_id", "cl_id", "sp", "code")
    (cents, codebook, enc)
  }

  /** Memoized IVF-PQ index (the graphIndexMemo pattern, r21): s11,
    * s18 and s19 all serve from the SAME index artifacts, so a roster
    * sweep pays the centroid/assign/encode build once per (session,
    * corpus) instead of three times — exactly the build-once/serve-many
    * economics the scaladoc claims (an index is built at ingest, not
    * per query). The handoff is parquet, so the consumer plan is a
    * parquet scan on hit AND miss (digest order-independence); columns
    * are ints + doubles, and a parquet round-trip of both is
    * bit-exact, so memo-hit ≡ memo-miss ≡ direct (PqMemoSpec). */
  private[graft] def pqIndexMemo(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val dir = graft.operators.BuildMemo.memoParquet(s, s"pqidx:$d") { out =>
      val (cents, codebook, enc) = pqIndexDirect(s, d)
      cents.write.parquet(s"$out/cents")
      codebook.write.parquet(s"$out/codebook")
      enc.write.parquet(s"$out/enc")
    }
    (s.read.parquet(s"$dir/cents"), s.read.parquet(s"$dir/codebook"),
      s.read.parquet(s"$dir/enc"))
  }

  /** One-shot COLD-staged IVF-PQ index — the x01 bench cell's build
    * (r22): identical artifacts and parquet handoff as [[pqIndexMemo]],
    * but through [[graft.operators.BuildMemo.stageParquet]], so every
    * call re-runs the build and never touches the memo entry the
    * s11/s18/s19 cells share. Prices the build cold every round so the
    * memo's amortization cannot hide a build-cost regression. */
  private[graft] def pqIndexColdStaged(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val dir = graft.operators.BuildMemo.stageParquet(s, s"pqidx:$d") { out =>
      val (cents, codebook, enc) = pqIndexDirect(s, d)
      cents.write.parquet(s"$out/cents")
      codebook.write.parquet(s"$out/codebook")
      enc.write.parquet(s"$out/enc")
    }
    (s.read.parquet(s"$dir/cents"), s.read.parquet(s"$dir/codebook"),
      s.read.parquet(s"$dir/enc"))
  }

  private def pqAdcScored(s: SparkSession, d: String): DataFrame =
    pqAdcScoredFrom(s, d, pqIndexMemo(s, d))

  private[graft] def pqAdcScoredFrom(s: SparkSession, d: String,
      index: (DataFrame, DataFrame, DataFrame)): DataFrame = {
    val S = 8; val Dsub = 8; val nprobe = 3
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), embD(col("embedding")).as("vec"))
    val (cents, codebook, enc) = index
    def subSlices(vecCol: String, outName: String) =
      explode(array((0 until S).map(sp => struct(lit(sp).as("sp"),
        expr(s"slice($vecCol, ${sp * Dsub} + 1, $Dsub)").as(outName))): _*))
    // per-(query, probed list) ADC lookup table: the query's residual
    // AGAINST THE PROBED CENTROID (not its home one) sliced per
    // subspace vs every codebook entry — q·nprobe·S·K tiny rows.
    // Query-side probe similarities run on the 3 query rows only —
    // per-row arithmetic, identical to filtering the full corpus sims
    val qsims = graft.operators.CentroidBuild.similarities(
      emb.filter(col("vec_id") < 3), cents, "vec_id", "vec")
    val probes = graft.operators.CentroidBuild.nearestK(
        qsims, "vec_id", nprobe)
      .select(col("vec_id").as("q_id"), col("cl_id"))
    val qresid = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("vec"))
      .join(broadcast(probes), "q_id")
      .join(broadcast(cents.select("cl_id", "cvec")), "cl_id")
      .select(col("q_id"), col("cl_id"),
        expr("zip_with(vec, cvec, (a, b) -> a - b)").as("qrvec"))
    val lut = qresid
      .select(col("q_id"), col("cl_id"), subSlices("qrvec", "qsub").as("e"))
      .select(col("q_id"), col("cl_id"), col("e.sp"), col("e.qsub"))
      .join(broadcast(codebook), "sp")
      .withColumn("qdiff", expr("zip_with(qsub, cvec, (a, b) -> a - b)"))
      .withColumn("d_e6", floor(RelationalQueries.rnd(
        dot(col("qdiff"), col("qdiff")), 6) * 1e6 + 0.5).cast("long"))
      .select("q_id", "cl_id", "sp", "code", "d_e6")
    // ADC: candidates = code rows of vectors whose HOME list is
    // probed; score = integer sum of the 8 LUT entries their codes
    // select
    enc.join(broadcast(probes), "cl_id")
      .filter(col("q_id") =!= col("vec_id"))
      .join(broadcast(lut), Seq("q_id", "cl_id", "sp", "code"))
      .groupBy("q_id", "vec_id")
      .agg(sum("d_e6").as("adc_e6"))
  }

  /** s11's published frame from an EXPLICIT index triple — one tail
    * shared by the roster cell (memoized index) and the x01 cold-build
    * cell (fresh staged build), so both serve the identical ranking
    * and the identical DuckDB oracle. */
  private[graft] def pqAdcReport(s: SparkSession, d: String,
      index: (DataFrame, DataFrame, DataFrame)): DataFrame = {
    val wTop = Window.partitionBy("q_id")
      .orderBy(col("adc_e6").asc, col("vec_id"))
    pqAdcScoredFrom(s, d, index)
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
        col("adc_e6"))
      .orderBy("q_id", "rank")
  }

  /** Shared binary-quantization shortlist pipeline — s22's index AND
    * s23's sweep consume this one code path (the pqAdcScored sharing
    * discipline). Sign-quantizes every vector to a 64-bit signature as
    * 4×16-bit bands (bit 63 of one long would overflow identically on
    * both engines), ranks the corpus by integer hamming against the
    * broadcast query signatures (vec_id < 3), and returns the top-`c`
    * per query: (q_id, vec_id, ham[, hrn]). The hamming scan touches
    * signatures only — 8 bytes per candidate — and the float vectors
    * stay behind until a consumer fetches the shortlist. */
  private def bqShortlist(emb: DataFrame, c: Int,
      keepRank: Boolean = false): DataFrame = {
    def bandSig(j: Int) = expr(
      s"aggregate(zip_with(slice(vec, ${16 * j + 1}, 16), sequence(0, 15), " +
        "(x, i) -> IF(x > 0d, shiftleft(1L, i), 0L)), 0L, (a, b) -> a + b)")
    val sigs = emb.select(col("vec_id"), bandSig(0).as("g0"),
      bandSig(1).as("g1"), bandSig(2).as("g2"), bandSig(3).as("g3"))
    val qSigs = sigs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("g0").as("q0"),
        col("g1").as("q1"), col("g2").as("q2"), col("g3").as("q3"))
    def ham(b: Int) = bit_count(expr(s"int(g$b) ^ int(q$b)"))
    val hammed = sigs.join(broadcast(qSigs), col("q_id") =!= col("vec_id"))
      .withColumn("ham", ham(0) + ham(1) + ham(2) + ham(3))
    val wH = Window.partitionBy("q_id").orderBy(col("ham").asc, col("vec_id"))
    val ranked = hammed.withColumn("hrn", row_number().over(wH))
      .filter(col("hrn") <= c)
    if (keepRank) ranked.select("q_id", "vec_id", "ham", "hrn")
    else ranked.select("q_id", "vec_id", "ham")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "s01_knn_brute" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queriesDf = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), embD(col("embedding")).as("q_vec"))
      val corpus = emb
        .select(col("vec_id").as("n_id"), embD(col("embedding")).as("n_vec"))
      val scored = corpus.join(broadcast(queriesDf), col("q_id") =!= col("n_id"))
        .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("n_id"),
          RelationalQueries.rnd(col("cos"), 4).as("cos_sim"))
        .orderBy("q_id", "rank")
    }),

    /** Diversified top-k serving — the result-diversification
      * constraint a retrieval endpoint applies AFTER scoring (the
      * hard-cap cousin of MMR, Carbonell & Goldstein 1998, as shipped
      * by production vector stores as a per-attribute group limit):
      * from each query's rnd6-cosine top-20 shortlist, keep at most ONE
      * neighbor per `label` (the diversity attribute — the "one chunk
      * per source document" constraint a RAG retriever applies so a
      * context window is never five paraphrases of one source; the
      * unconstrained top-5 here repeats labels, so the cap provably
      * changes the served set), re-rank the
      * survivors by original score order, return the top-5. A
      * redundant result set is a real retrieval failure mode — RAG
      * context windows filled with five paraphrases of one source —
      * and the cap is the cheapest guarantee against it.
      *
      * Scale shape: scoring here is the s01 broadcast-queries scan,
      * but the diversification CONTRACT only touches the rank-ordered
      * shortlist (q_id, n_id, label, c6) — swap in s04's IVF or s02's
      * LSH shortlist unchanged. Everything after scoring is two
      * row_number windows over q×20 rows: metadata-sized at any corpus
      * scale, partitioned by q_id so a million-query batch spreads.
      * Determinism: ranking keys are rnd6 cosine with n_id tie-break
      * (the s09 argument), so both engines pick identical shortlists,
      * identical survivors, identical final ranks — full hash oracle. */
    "s25_diverse_topk" -> ((s, d) => {
      val (short, cap, k) = (20, 1, 5)
      val emb = Tables.embeddings(s, d)
      val queriesDf = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), embD(col("embedding")).as("q_vec"))
      val corpus = emb.select(col("vec_id").as("n_id"), col("label"),
        embD(col("embedding")).as("n_vec"))
      val scored = corpus.join(broadcast(queriesDf), col("q_id") =!= col("n_id"))
        .withColumn("c6",
          RelationalQueries.rnd(cosine(col("q_vec"), col("n_vec")), 6))
      val wAll = Window.partitionBy("q_id").orderBy(col("c6").desc, col("n_id"))
      val shortlist = scored.withColumn("rn", row_number().over(wAll))
        .filter(col("rn") <= short)
        .select("q_id", "n_id", "label", "c6", "rn")
      val wLab = Window.partitionBy("q_id", "label").orderBy("rn")
      val capped = shortlist.withColumn("lr", row_number().over(wLab))
        .filter(col("lr") <= cap)
      val wFin = Window.partitionBy("q_id").orderBy("rn")
      capped.withColumn("rank", row_number().over(wFin))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("rank"), col("n_id"), col("label"),
          RelationalQueries.rnd(col("c6"), 4).as("cos_sim"))
        .orderBy("q_id", "rank")
    }),

    /** EMBEDDING-distribution drift — the drift family's missing
      * modality (q55/t35/t37–t40/e21/e22 all watch scalars; the LLM
      * pipeline's other continuous distribution is the embedding
      * corpus, and an embedding-model version bump, a re-normalization
      * bug, or a contaminated shard moves it long before any scalar
      * gate fires). Multivariate two-sample testing reduces to exact
      * scalar KS over k FIXED portable PROJECTIONS (the classical
      * random-projection reduction; a mean shift in any direction with
      * a component along some projection moves that projection's CDF):
      * 4 raw coordinates + 4 sign-pattern window dots, every value
      * integerized (the s22 coordinate-sign/integer-dot discipline —
      * `floor(x·1e6 + 0.5)` per coordinate, then ±1·int sums, so
      * projections are order-independent exact integers in both
      * engines) and every statistic riding [[graft.operators.KsDrift
      * .ks2]] UNCHANGED with (projection) as the group.
      *
      * Ground truth is PLANTED: snapshot B re-embeds a portable-gated
      * 20% of the corpus with +0.25 (2 coordinate σ) added to dims
      * 0–15 — the partial-pipeline model-bump scenario. Projections
      * touching the shifted window (coords 0/5; dots over dims 0–15)
      * must flag drifted at sf0.01+ (KS ≈ 0.2·(Φ(1)−Φ(−1)) ≈ 0.13 >
      * crit 0.086 at n=500); disjoint projections (coords 32/47, dots
      * over 32–47) see IDENTICAL paired samples and read KS = 0
      * exactly. `expect_drift` publishes the plant so detection is
      * auditable per row; `is_max` marks the max-over-projections
      * witness (smallest projection id on ties).
      *
      * Scale shape: one corpus pass explodes each vector into 8×2
      * integer (projection, value, side) rows — map-side combinable
      * into ks2's census, the only full-data shuffle; k is a fixed
      * audit knob, the vectors themselves never shuffle. The dot
      * signs are derived ONCE from the portable gate (a driver-side
      * 4-row job; the literals land in the plan, the oracle re-derives
      * them from the same md5 arithmetic). */
    "s26_embed_drift" -> ((s, d) => {
      val coordIdx = Seq(0, 5, 32, 47)
      val expect = Seq(true, true, false, false, true, true, false, false)
      // ±1 signs per (dot projection, window position) from the gate
      val signs: Map[Long, Seq[Long]] = s.range(4).select(col("id"),
          transform(sequence(lit(0), lit(15)), i =>
            when(pmod(graft.operators.Sampling.portableGate(
              concat(lit("eproj:"), col("id").cast("string"), lit(":"),
                i.cast("string"))), lit(2)) === 1, 1L).otherwise(-1L))
            .as("sgn"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val emb = Tables.embeddings(s, d)
      val gated = pmod(graft.operators.Sampling.portableGate(
        concat(lit("edrift:"), col("vec_id").cast("string"))), lit(5)) === 0
      val vecA = transform(col("embedding"), x => x.cast("double"))
      val vecB = transform(col("embedding"), (x, i) =>
        when(gated && i < lit(16), x.cast("double") + lit(0.25))
          .otherwise(x.cast("double")))
      def xi6(c: Column): Column =
        floor(c * lit(1e6) + lit(0.5)).cast("long")
      // both sides' 8 projections ride ONE explode — a true single
      // corpus pass (the r16 version unioned two sideRows scans)
      def projs(vec: Column, sb: Boolean): Seq[Column] = {
        val coords = coordIdx.zipWithIndex.map { case (ci, p) =>
          struct(lit(p).as("proj"), xi6(element_at(vec, ci + 1)).as("pval"),
            lit(sb).as("side_b"))
        }
        val dots = (0 until 4).map { p =>
          val w = if (p < 2) 0 else 32
          val sgn = array(signs(p.toLong).map(lit): _*)
          struct(lit(p + 4).as("proj"),
            aggregate(zip_with(slice(vec, w + 1, 16), sgn,
              (x, sg) => sg * xi6(x)), lit(0L), (a, b) => a + b).as("pval"),
            lit(sb).as("side_b"))
        }
        coords ++ dots
      }
      val rows = emb.select(explode(array(
          projs(vecA, sb = false) ++ projs(vecB, sb = true): _*)).as("x"))
        .select(col("x.proj").as("proj"), col("x.pval").as("pval"),
          col("x.side_b").as("side_b"))
      val ks = graft.operators.KsDrift.ks2(rows, "proj", "pval", "side_b")
      val na = col("n_a").cast("double")
      val nb = col("n_b").cast("double")
      val flagged = ks.select(col("proj"), col("n_a"), col("n_b"),
        RelationalQueries.rnd(col("ks"), 6).as("ks"),
        col("ks_value").cast("long").as("ks_value"),
        (col("ks") > lit(1.358) * sqrt((na + nb) / (na * nb)))
          .as("drifted"))
      // max-over-projections witness on the rounded (portable) ks,
      // smallest projection id on ties
      val top = flagged
        .agg(min(struct((-col("ks")).as("nk"), col("proj").as("p"))).as("m"))
        .select(col("m.p").as("mproj"))
      flagged.crossJoin(broadcast(top))
        .select(col("proj").cast("long").as("proj"),
          col("n_a"), col("n_b"), col("ks"),
          col("ks_value"), col("drifted"),
          element_at(array(expect.map(lit): _*), col("proj") + 1)
            .as("expect_drift"),
          (col("proj") === col("mproj")).as("is_max"))
        .orderBy("proj")
    }),

    /** Query-driven LSH top-k on the PORTABLE axis-sign family
      * ([[signPatternSignature]]) — bucketing, candidate dedup, cosine
      * scoring, and the rank all replicate in DuckDB, so the ANN
      * operator itself is hash-verified end-to-end (the r11 allowlist
      * retirement). The Gaussian-hyperplane family stays available via
      * [[lshTopK]]'s default and keeps its planted ground-truth
      * companion (s05). */
    "s02_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      lshTopK(emb, col("vec_id") < 3, 5, signPatternSignature)
    }),

    /** s02's pipeline, ground-truth-verified: augment the corpus with a
      * scaled copy (×1.001) of each query vector. Scaling preserves
      * every hyperplane sign — structurally up to the floating-point
      * sign stability of near-zero projections: the hyperplane dot is
      * recomputed on the rounded scaled elements, so a projection
      * within ulps of 0 could in principle flip a bucket bit on a
      * regenerated corpus (none of the fixed corpora are near that
      * edge). The copy then shares its query's bucket in ALL L tables —
      * it is in the candidate set — and its cosine is 1 to within ulps
      * while the organic maximum is ~0.48, so the LSH's rank-1 neighbor
      * equals the TRUE rank-1 neighbor that DuckDB finds by brute force
      * over the same augmented corpus. This checks the recall property
      * users actually care about: the ANN returns the true nearest
      * neighbor whenever a genuine near-duplicate exists. */
    "s05_ann_planted" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val plantedCopies = emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("vec"), x => x * lit(1.001)).as("vec"))
      lshTopK(emb.unionByName(plantedCopies), col("vec_id") < 3, 1)
    }),

    /** Embedding-cosine near-duplicate detection (the dedup framing of
      * ANN): every vector pair sharing an LSH bucket is a candidate;
      * candidates are verified with exact cosine. Same multi-table
      * machinery as s02 but all-pairs within buckets instead of
      * query-driven, which is the shape that scales — candidate volume
      * is Σ bucket² rather than n². On the PORTABLE axis-sign family
      * since r12, so the whole census carries a full DuckDB hash
      * oracle; the Gaussian family keeps its planted companion (d07). */
    "d05_embed_neardup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      neardupPairs(emb, signPatternSignature).agg(
        count(lit(1)).as("n_candidate_pairs"),
        sum(when(col("cos") >= 0.95, 1).otherwise(0)).as("n_neardups_095"),
        sum(when(col("cos") >= 0.8, 1).otherwise(0)).as("n_neardups_08"),
        RelationalQueries.rnd(coalesce(max("cos"), lit(-1.0)), 4).as("max_cos"))
    }),

    /** d05's pipeline, count-verified against ground truth: augment a
      * fixed 100-vector subset with scaled copies (×1.001). Scaling by
      * a positive constant preserves every hyperplane sign, so each
      * planted copy lands in its original's bucket in ALL L tables —
      * candidate recall on the planted pairs is structural up to
      * floating-point sign stability of near-zero projections (the dot
      * is recomputed on the rounded scaled elements; a projection
      * within ulps of 0 could flip a bit on a regenerated corpus) —
      * and cosine(v, 1.001·v) = 1 to within ulps,
      * far above the 0.999 threshold (organic subset max is ~0.48).
      * DuckDB brute-forces all pairs of the same augmented corpus, so
      * the count compares against pipeline-independent ground truth.
      */
    "d07_embed_planted" -> ((s, d) => {
      val base = Tables.embeddings(s, d).filter(col("vec_id") < 100)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val planted = base.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("vec"), x => x * lit(1.001)).as("vec"))
      val corpus = base.unionByName(planted)
      corpus.agg(count(lit(1)).as("n_vecs"))
        .crossJoin(planted.agg(count(lit(1)).as("n_planted")))
        .crossJoin(neardupPairs(corpus).agg(
          sum(when(col("cos") >= 0.999, 1).otherwise(0)).as("n_neardups"),
          RelationalQueries.rnd(max("cos"), 4).as("max_cos")))
    }),

    /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
      * arXiv:2303.09540): cluster the embedding space with the coarse
      * quantizer, and inside each cluster drop all but one of any
      * near-identical group — the corpus-pruning step that catches
      * paraphrases and re-encodes which exact/n-gram dedup miss.
      * Clustering is the HIERARCHICAL two-level build (the s24
      * pipeline, now the production SemDeDup path, not just a demo):
      * target capacity k = ⌈√n⌉ from one bounded scalar n-read, then
      * lloyd(kc=⌈√k⌉) coarse outer cells, one routed (vec_id, cell)
      * pass that localCheckpoints (16 bytes/row), and a per-cell
      * [[graft.operators.CentroidBuild.lloydGrouped]] refine of
      * kf=⌈k/kc⌉ centroids — so per-row assignment work is O(√k), no
      * broadcast exceeds the fine table, and at 100 TB the one fine
      * equi-join flips to a shuffle-hash join on the cell key while
      * the coarse table stays a √k-row broadcast (the flat O(n·k)
      * build was the roster's last genuine scale cliff — closed HERE,
      * on the consumer, not only in s24). The cluster key downstream
      * is the composite cell·(kf+1)+fid, collision-free by
      * construction. The corpus never shuffles for assignment, and
      * the payload vector rejoins by id after the assignment window,
      * the d05 id-only discipline. Within a cluster, pairs at exact
      * cosine ≥ 0.999 mark the higher vec_id dropped (keep-lowest-id
      * is the deterministic representative rule).
      *
      * The pair join is COLLAPSED and capped, not just clustered:
      * since r13 the whole pipeline runs through [[semDedupBuild]] —
      * exact-vector collapse first (group by the vector, rep = min
      * id; the published SemDeDup composition), then clusters larger
      * than [[SemDedupCap]] sub-split via
      * [[graft.operators.CentroidBuild.capSplit]] on the sign-pattern
      * salt, so pair volume is ~n_distinct·cap/2 even when Lloyd
      * leaves clusters far above the √n average AND when the corpus
      * carries mega-duplicate groups (identical vectors share the
      * salt, so without the collapse a h-copy group defeats the cap
      * with C(h,2) pairs in one task — measured in SOAK.md's skew
      * section). The sign salt is invariant
      * under positive scaling, so every planted ×1.001 copy provably
      * shares its original's sub-cluster (a row-id hash would scatter
      * them); the join shuffles on (cl_id, sub), whose cardinality
      * also grows with n — no 10-value hot shuffle key. Planted
      * copies of every vec_id % 10 == 0 give the operator ground
      * truth to find (cos ≈ 1 vs organic ~0.5), and every stage is
      * portable math (rnd6 centroids/assignment, sign comparisons,
      * IEEE cosine), so DuckDB replicates the pipeline end-to-end —
      * a strict hash oracle, not rows-only. CentroidSplitSpec pins
      * the cap and the planted-pair co-location.
      */
    "d13_semantic_dedup" -> ((s, d) => {
      val base = Tables.embeddings(s, d).filter(col("vec_id") < 200)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val planted = base.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("vec"), x => x * lit(1.001)).as("vec"))
      val corpus = base.unionByName(planted)
      // exact-vector collapse + hierarchical build + capped rep pairs
      // (scale + recall rationale on [[semDedupBuild]])
      val (reps, assign, dupPairs) = semDedupBuild(corpus)
      // ONE aggregate per frame (the pair join is the query's most
      // expensive stage): countDistinct(dropped rep) and max(cos) ride
      // the same pass. A non-rep member is a drop by definition
      // (identical vector, smaller-id rep), so
      // n_dropped = (n_vecs − n_reps) + dropped reps, and any gsize ≥ 2
      // group contributes exact-duplicate pairs at cosine 1.0 to the
      // max — both folds mirrored verbatim in the oracle.
      corpus.agg(count(lit(1)).as("n_vecs"))
        .crossJoin(planted.agg(count(lit(1)).as("n_planted")))
        .crossJoin(reps.agg(count(lit(1)).as("n_reps"),
          max(when(col("gsize") >= 2, lit(1.0))).as("dup_flag")))
        .crossJoin(assign.agg(countDistinct("cl_id").as("n_clusters")))
        .crossJoin(dupPairs.agg(
          countDistinct(col("b.vec_id")).as("n_rep_dropped"),
          max("cos").as("max_rep_cos")))
        .withColumn("n_dropped",
          col("n_vecs") - col("n_reps") + col("n_rep_dropped"))
        .withColumn("n_survivors", col("n_vecs") - col("n_dropped"))
        .withColumn("max_dup_cos", RelationalQueries.rnd(
          greatest(coalesce(col("max_rep_cos"), lit(-1.0)),
            coalesce(col("dup_flag"), lit(-1.0))), 4))
        .select("n_vecs", "n_planted", "n_dropped", "n_survivors",
          "n_clusters", "max_dup_cos")
    }),

    /** IVF approximate nearest-neighbor search — the scale path beside
      * s02's sign-LSH: coarse-quantize to per-label centroids (the s03
      * build step), assign every corpus vector to its nearest centroid
      * (broadcast centroid table, no shuffle), then answer each query by
      * probing only the `nprobe` nearest centroid lists, shrinking the
      * scored candidate set from n to ~n·nprobe/K. Centroid elements and
      * assignment similarities are rounded (6 dp) on both engines so the
      * argmin/argtop are stable cross-engine; unlike s02 every stage is
      * portable math, so the whole approximate pipeline hash-matches the
      * DuckDB replica below rather than settling for a rows-only check.
      */
    "s04_ivf_topk" -> ((s, d) => {
      val nprobe = 3
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val centroids = graft.operators.CentroidBuild.centroids(
        Tables.embeddings(s, d)
          .select(col("label"), embD(col("embedding")).as("vec")),
        col("label"), col("vec"))
      val scored = graft.operators.CentroidBuild.ivfCandidates(
          emb, centroids, col("vec_id") < 3, nprobe)
        .withColumn("cos", cosine(col("q_vec"), col("vec")))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
          RelationalQueries.rnd(col("cos"), 4).as("cos_sim"))
        .orderBy("q_id", "rank")
    }),

    /** ANN index-quality evaluation — recall@k of the s04 IVF index
      * against brute-force ground truth, the measurement a vector
      * pipeline publishes before trusting an approximate index at
      * scale. Both sides rank on rnd6 cosine with the vec_id
      * tie-break (the s09 determinism discipline), truth is the s01
      * brute-force top-k (broadcast queries — one corpus scan), the
      * approximate side is the s04 probe pipeline — literally the same
      * code path ([[graft.operators.CentroidBuild.ivfCandidates]]), so
      * the recall certifies the index s04 serves, structurally unable
      * to drift from it — and the overlap is an id-only
      * semi join of two k-row-per-query sets — evaluation cost is the
      * brute-force pass, which a production run does on a SAMPLE of
      * queries (here: the 3 fixed probes). Every stage is portable
      * math, so the recall numbers themselves hash-match the DuckDB
      * replica of the full composed evaluation. */
    "s10_ann_recall" -> ((s, d) => {
      val K = 10; val nprobe = 3
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val queriesDf = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
      val truthScored = emb
        .join(broadcast(queriesDf), col("q_id") =!= col("vec_id"))
        .withColumn("c6",
          RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
      val wT = Window.partitionBy("q_id").orderBy(col("c6").desc, col("vec_id"))
      // q·K ids with multiple consumers (semi-join(s) + n_truth census):
      // checkpoint so the corpus-sized brute-force scan behind it runs
      // exactly once
      val truth = truthScored.withColumn("rn", row_number().over(wT))
        .filter(col("rn") <= K).select(col("q_id"), col("vec_id"))
        .materialize
      val centroids = graft.operators.CentroidBuild.centroids(
        Tables.embeddings(s, d)
          .select(col("label"), embD(col("embedding")).as("vec")),
        col("label"), col("vec"))
      val approxScored = graft.operators.CentroidBuild.ivfCandidates(
          emb, centroids, col("vec_id") < 3, nprobe)
        .withColumn("c6",
          RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
      val wA = Window.partitionBy("q_id").orderBy(col("c6").desc, col("vec_id"))
      val approx = approxScored.withColumn("rn", row_number().over(wA))
        .filter(col("rn") <= K).select(col("q_id"), col("vec_id"))
      val hits = truth.join(approx, Seq("q_id", "vec_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
      truth.groupBy("q_id").agg(count(lit(1)).as("n_truth"))
        .join(hits, Seq("q_id"), "left")
        .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
        .withColumn("recall_at_k", RelationalQueries.rnd(
          col("n_hit").cast("double") / col("n_truth"), 4))
        .select("q_id", "n_truth", "n_hit", "recall_at_k")
        .orderBy("q_id")
    }),

    /** Symmetric int8 quantization of the embedding column — the
      * compression step a vector store applies before indexing (4×
      * smaller than float32, 8× smaller than the double working form).
      * Per-vector absmax scale, q = floor(x/scale·127 + 0.5) ∈
      * [−127, 127], reconstruction error = ‖x − q·scale/127‖₂. Pure
      * per-row arithmetic (no shuffle until the per-label aggregate);
      * every op (+,×,/,floor,sqrt over IEEE doubles) is correctly
      * rounded and therefore bit-identical across engines, so the whole
      * quantize→reconstruct→error pipeline is oracle-verified. The
      * error dot-product runs through the native codegen'd ArrayDot
      * kernel, ascending-index accumulation like the cosine kernels. */
    "s06_vec_quantize" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("label"), col("vec_id"), embD(col("embedding")).as("vec"))
      val staged = emb
        .withColumn("scale", array_max(transform(col("vec"), x => abs(x))))
        .withColumn("qv", expr("transform(vec, x -> floor(x / scale * 127.0 + 0.5))"))
        .withColumn("diff", expr("zip_with(vec, qv, (a, q) -> a - (q * scale) / 127.0)"))
        .withColumn("err", sqrt(dot(col("diff"), col("diff"))))
        .withColumn("qmax", array_max(expr("transform(qv, q -> abs(q))")))
      staged.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          RelationalQueries.rnd(avg("scale"), 6).as("avg_scale"),
          RelationalQueries.rnd(avg("err"), 6).as("avg_err"),
          RelationalQueries.rnd(max("err"), 6).as("max_err"),
          max("qmax").as("max_q"))
        .orderBy("label")
    }),

    /** True k-means coarse-quantizer build — the piece the round-6
      * verdict asked for beside the label quantizer: k is DERIVED FROM
      * CORPUS SIZE (k = ⌈√n⌉, the classic IVF sizing that balances
      * centroid-scan and list-scan cost at √n each), seeded
      * deterministically (k smallest md5(vec_id) — a TakeOrdered top-k,
      * no global sort), then refined with two Lloyd rounds of the
      * shared [[graft.operators.CentroidBuild]] machinery: broadcast
      * nearest-centroid assignment (corpus never shuffles to be
      * assigned) and one map-side-combinable recenter aggregate per
      * round. Fixed rounds, not convergence-looped, so the whole build
      * unrolls into portable SQL and the DuckDB replica hash-matches
      * the ACTUAL pipeline: seeding order, both assignments, both rnd6
      * recenters, and the final cluster census. The n-read is a single
      * bounded scalar (the q47 bloom discipline).
      *
      * At 100 TB: per-round cost is n·k rounded-cosine evaluations
      * under whole-stage codegen with a k-row broadcast (k = √n keeps
      * the broadcast at megabytes up to ~10^8 vectors; beyond that the
      * standard move is this same operator run hierarchically — coarse
      * √k outer cells, then per-cell inner k-means — which composes
      * from these building blocks without new shuffle shapes). Empty
      * clusters drop out of the census naturally (both engines
      * group-by the surviving assignments). sum_csim_e6 is the
      * assignment objective as an EXACT integer (rnd6 similarities ×
      * 10^6), so the compare is bit-exact rather than
      * summation-order-dependent. */
    "s07_kmeans_build" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val n = emb.count()
      val k = math.ceil(math.sqrt(n.toDouble)).toInt
      val cents = graft.operators.CentroidBuild.lloyd(
        emb, "vec_id", "vec", k, rounds = 2)
      val finalSims = graft.operators.CentroidBuild.similarities(
        emb, cents, "vec_id", "vec")
      val wNearest = Window.partitionBy("vec_id")
        .orderBy(col("csim").desc, col("cl_id"))
      val finalAssign = finalSims
        .withColumn("rn", row_number().over(wNearest))
        .filter(col("rn") === 1)
      val census = finalAssign.groupBy("cl_id").agg(count(lit(1)).as("sz"))
      census.agg(
          count(lit(1)).as("n_clusters"),
          sum("sz").as("n_vecs"),
          min("sz").as("min_cluster_sz"),
          max("sz").as("max_cluster_sz"))
        .crossJoin(finalAssign.agg(
          sum(floor(col("csim") * 1e6 + 0.5).cast("long")).as("sum_csim_e6")))
        .withColumn("k", lit(k.toLong))
        .select("k", "n_vecs", "n_clusters", "min_cluster_sz",
          "max_cluster_sz", "sum_csim_e6")
    }),

    /** Hierarchical two-level k-means — the build that stays affordable
      * past the flat-Lloyd cliff (s07's scaladoc names it; this ships
      * it). The flat k=√n build does n·k cosine evaluations per round
      * with a k-row broadcast; at 100 TB (n≈10¹¹ → k≈3×10⁵) that
      * broadcast is ~150 MB and the per-row scan is 3×10⁵ kernels —
      * neither affordable. The hierarchy restores both: lloyd(kc=⌈√k⌉)
      * builds coarse outer cells (a kc-row broadcast, per-row work √k),
      * every vector routes to its nearest cell ONCE (the (vec_id, cell)
      * table is two longs per row and localCheckpoints, so the three
      * downstream consumers — fine seeding, fine refine, final routed
      * assignment — never recompute the coarse scan), then
      * [[graft.operators.CentroidBuild.lloydGrouped]] refines
      * kf=⌈k/kc⌉ centroids INSIDE each cell simultaneously in one
      * pipeline — assignment is an equi-join on the cell key, so each
      * row meets only its own cell's ~√k centroids. Total capacity
      * kc·kf ≥ k fine centroids; per-row assignment work is
      * O(kc + kf) = O(√k) instead of O(k); no broadcast exceeds the
      * fine table (k rows at test scale — and at 100 TB that one join
      * flips to a shuffle-hash join on the cell key, leaving the
      * kc-row coarse table as the largest broadcast, see
      * nearestGrouped's scaladoc). This is the standard IMI/two-level
      * IVF composition (Babenko & Lempitsky, "The Inverted Multi-Index",
      * CVPR 2012 — trained coarse cells + per-cell refinement).
      *
      * The ENTIRE build unrolls into portable SQL — coarse seed/round/
      * route, per-cell md5 seeding, the fine round's within-cell argmax
      * + rnd6 recenter, and the final coarse-then-fine routed assignment
      * — so the hierarchical quantizer itself is hash-verified at every
      * SF (the s07 replica discipline). sum_csim_e6 keeps the objective
      * integer-exact; census sizes make imbalance visible. */
    "s24_hier_kmeans" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val n = emb.count() // bounded scalar read — the s07/q47 discipline
      val k = math.ceil(math.sqrt(n.toDouble)).toInt
      val kc = math.ceil(math.sqrt(k.toDouble)).toInt
      val kf = (k + kc - 1) / kc
      val coarse = graft.operators.CentroidBuild.lloyd(
        emb, "vec_id", "vec", kc, rounds = 1)
      // route once: (vec_id, cell) is 16 bytes/row at any scale, so the
      // eager checkpoint bounds memory while sparing three consumers the
      // n·kc coarse re-scan (the d13 lineage discipline)
      val cells = graft.operators.CentroidBuild.nearest(
          graft.operators.CentroidBuild.similarities(
            emb, coarse, "vec_id", "vec"), "vec_id")
        .withColumnRenamed("cl_id", "cell")
        .materialize
      val embCell = emb.join(cells, "vec_id")
      val fine = graft.operators.CentroidBuild.lloydGrouped(
        embCell, "cell", "vec_id", "vec", kf, rounds = 1)
      val fin = graft.operators.CentroidBuild.nearestGrouped(
        embCell, fine, "cell", "vec_id", "vec")
      // ONE pass over the corpus-sized assignment: the objective sum
      // rides the census aggregate (Σ of per-(cell,fid) integer sums ≡
      // the global sum), so `fin` — an unmaterialized join+window over
      // the whole corpus — is never evaluated twice (the lineage
      // discipline the rest of this file applies via localCheckpoint;
      // here folding the aggregates is strictly cheaper than a
      // corpus-sized checkpoint)
      val census = fin.groupBy("cell", "fid").agg(
        count(lit(1)).as("sz"),
        sum(floor(col("csim") * 1e6 + 0.5).cast("long")).as("s6"))
      census.agg(
          countDistinct("cell").as("n_cells_used"),
          count(lit(1)).as("n_centroids"),
          sum("sz").as("n_vecs"),
          min("sz").as("min_centroid_sz"),
          max("sz").as("max_centroid_sz"),
          sum("s6").as("sum_csim_e6"))
        .withColumn("k_target", lit(k.toLong))
        .withColumn("n_cells", lit(kc.toLong))
        .withColumn("k_fine", lit(kf.toLong))
        .select("k_target", "n_cells", "k_fine", "n_cells_used",
          "n_centroids", "n_vecs", "min_centroid_sz", "max_centroid_sz",
          "sum_csim_e6")
    }),

    /** Graph-ANN beam search — the production index family
      * (HNSW/NSG-class: Malkov & Yashunin, TPAMI 2018) the s-roster
      * lacked beside IVF (s04), PQ (s11), SQ8 (s12) and LSH (s02): a
      * NEIGHBOR GRAPH answers queries by walking edges from an entry
      * point, touching only the frontier's neighborhoods — never a
      * list scan. The faithful distributed analog over the s24
      * hierarchy:
      *
      * INDEX BUILD (corpus-bounded, once): the s24 two-level build
      * routes every vector to a (cell, fid) cluster of ~√n members;
      * the graph is (a) each vector's top-[[GraphM]] within-cluster
      * neighbors by rnd6 cosine (pair work Σ sz² ≈ n^1.5 on BOUNDED
      * per-cluster frames — the SemDeDup join shape, never all-pairs)
      * plus (b) one CROSS-CLUSTER shortcut per vector to the entry
      * point of its SECOND-nearest fine cluster (the rank-2 row of
      * the same routing window — free), which is what lets a walk
      * escape a mis-routed seed, the role of HNSW's long edges. Entry
      * points are each cluster's best-routed member (max csim, id
      * tie). Edges are 2 longs/row; a production store
      * bucket-partitions them by src so a frontier join prunes to
      * matching buckets.
      *
      * QUERY (frontier-bounded): seed from the hierarchy — nprobe=2
      * coarse cells, top-[[GraphSeedF]] fine clusters among them,
      * their entry points — then [[GraphRounds]] unrolled beam
      * rounds: frontier ⋈ edges equi-join (frontier broadcasts; the
      * slim edge frame never shuffles), union with the current beam,
      * exact rnd6-cosine re-rank against the query, keep top-
      * [[GraphB]]. Per-round Materialize is the fixpoint lineage
      * discipline. The query itself stays IN the beam when found (it
      * is the best hub into its own neighborhood — its edges are
      * exactly the true top-M) and is excluded only from the final
      * answer, like the brute truth.
      *
      * PUBLISHED: recall@10 of the final beam vs the s10-style brute
      * truth on the same rnd6 ranking rule — the honest number a
      * pipeline reads before trusting the index (production audits a
      * query SAMPLE; here the 3 fixed probes). Every stage is rnd6 +
      * id tie-breaks, so seeding, build, walk, and recall hash-match
      * the DuckDB replica end to end — an ITERATIVE graph traversal
      * under a strict hash oracle (the d21 fixed-round discipline
      * applied to search instead of scoring). */
    "s27_graph_beam" -> ((s, d) => {
      // corpus = organic + planted ×1.001 twins (the s05/d07 pattern):
      // positive scaling preserves every cosine, so a twin routes to
      // its query's own fine cluster and is its rank-1 neighbor —
      // `found_planted` is the structural MUST-FIND beside the organic
      // recall, which on this near-random corpus is scatter-limited
      // (the s10/s18 numbers show the same)
      // build → graph → seed → walk, via the s27/s28 shared machinery
      // (hierRoute/graphEdges/hierSeeds/beamTopK — extracted r19;
      // r20: the build rides the session-memoized parquet handoff
      // graphIndexMemo, shared with s28's staleness-control rebuild —
      // build once, serve many, the production index lifecycle; the
      // report tail is shared with x03's cold-build cell, r22)
      graphBeamReport(s, d, graphIndexMemo(s, d, union = true))
    }),

    /** INCREMENTAL graph-index maintenance — the production property
      * s27 lacks: a deployed graph index absorbs inserts WITHOUT a
      * rebuild (HNSW's insert procedure; FreshDiskANN, Singh et al.
      * 2021). Base epoch: s27's hierarchy + edge set built over the
      * ORGANIC corpus only. Insert batch (the d12/d26 maintenance
      * shape): the 3 planted ×1.001 twins arrive later; each routes
      * through the FROZEN hierarchy (coarse then fine centroids — no
      * re-clustering), takes its top-[[GraphM]] edges against the
      * EXISTING members of its home cluster only, one cross-cluster
      * shortcut to its rank-2 cluster's (stale) entry point, and the
      * new edges symmetrize LOCALLY — per-insert work is bounded by
      * its home-cluster size (~√n), never corpus-sized, and the base
      * edge set is untouched.
      *
      * PUBLISHED, per query: the MUST-FIND (is the freshly-inserted
      * twin found by the SAME beam query on the maintained graph —
      * the reason incremental maintenance exists) and the STALENESS
      * AUDIT: recall@[[GraphK]] on the maintained graph vs on a full
      * s27-style rebuild over the union corpus, same brute truth,
      * same beam knobs — the number an index owner watches to decide
      * when accumulated inserts justify the next full rebuild. Plus
      * the maintenance census (n_inserts, distinct new directed
      * edges). Entry points and centroids stay deliberately STALE —
      * that is the trade being measured.
      *
      * Scale: the two builds are one-time index costs (the s27
      * argument, twice — witness machinery: production maintains ONE
      * graph and pays only the insert routing, which here is a
      * 3-row × cluster-size frame); beams stay frontier-sized;
      * nothing all-pairs. Every stage rnd6 + id tie-breaks, so the
      * maintained walk, the rebuilt walk, and both recalls hash-match
      * the DuckDB replica end to end. */
    "s28_graph_incremental" -> ((s, d) => {
      import graft.operators.{CentroidBuild => CB}
      val organic = graphCorpus(s, d, union = false)
      val inserts = organic.filter(col("vec_id") < 3)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("vec"), x => x * lit(1.001)).as("vec"))
      val embU = graphCorpus(s, d, union = true)
      // BASE EPOCH: hierarchy + graph over the organic corpus only
      // (r20: memoized parquet handoff — see graphIndexMemo)
      val (idxB, edgesB) = graphIndexMemo(s, d, union = false)
      // insert routing through the FROZEN hierarchy
      val insCells = CB.nearest(
          CB.similarities(inserts, idxB.coarse, "vec_id", "vec"), "vec_id")
        .withColumnRenamed("cl_id", "cell")
      val insCell = inserts.join(insCells.select("vec_id", "cell"), "vec_id")
      val insRouted = CB.nearestGroupedK(insCell, idxB.fine, "cell",
        "vec_id", "vec", 2).materialize
      val insHome = insRouted.filter(col("rn") === 1)
      val insSecond = insRouted.filter(col("rn") === 2)
      val homeB = idxB.routed.filter(col("rn") === 1)
      // top-M edges vs the EXISTING home-cluster members only —
      // per-insert work bounded by cluster size
      val newNb = insHome
        .select(col("vec_id").as("src"), col("cell"), col("fid"))
        .join(homeB.select(col("vec_id").as("dst"), col("cell"), col("fid")),
          Seq("cell", "fid"))
        .join(inserts.select(col("vec_id").as("src"), col("vec").as("sv")),
          "src")
        .join(organic.select(col("vec_id").as("dst"), col("vec").as("dv")),
          "dst")
        .withColumn("c6",
          RelationalQueries.rnd(cosine(col("sv"), col("dv")), 6))
      val wN = Window.partitionBy("src").orderBy(col("c6").desc, col("dst"))
      val newEdges = newNb.withColumn("nrn", row_number().over(wN))
        .filter(col("nrn") <= GraphM).select("src", "dst")
      val newCross = insSecond.join(idxB.entries, Seq("cell", "fid"))
        .filter(col("entry") =!= col("vec_id"))
        .select(col("vec_id").as("src"), col("entry").as("dst"))
      val newDirected = newEdges.unionByName(newCross).distinct().materialize
      val edgesM = edgesB
        .unionByName(newDirected)
        .unionByName(newDirected.select(col("dst").as("src"),
          col("src").as("dst")))
        .distinct().materialize
      val qs = organic.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
      // maintained-path query: frozen seeding (stale entry points)
      val apprM = beamTopK(qs, embU, edgesM, hierSeeds(qs, idxB))
      // staleness control: the full s27 rebuild over the union corpus
      // — input-identical to s27's own build, so it reads the SAME
      // memoized index (one union build per sweep instead of two)
      val (idxR, edgesR) = graphIndexMemo(s, d, union = true)
      val apprR = beamTopK(qs, embU, edgesR, hierSeeds(qs, idxR))
      val truth = bruteTruth(qs, embU)
      def hitsOf(appr: DataFrame, tag: String): DataFrame =
        truth.join(appr, Seq("q_id", "vec_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as(s"${tag}_hit"))
      def plantedOf(appr: DataFrame, tag: String): DataFrame =
        appr.filter(col("vec_id") === col("q_id") + 100000)
          .select(col("q_id"), lit(true).as(s"${tag}_found_planted"))
      val census = inserts.agg(count(lit(1)).as("n_inserts"))
        .crossJoin(newDirected.agg(count(lit(1)).as("n_new_edges")))
      truth.groupBy("q_id").agg(count(lit(1)).as("n_truth"))
        .join(hitsOf(apprM, "maint"), Seq("q_id"), "left")
        .join(broadcast(plantedOf(apprM, "maint")), Seq("q_id"), "left")
        .join(hitsOf(apprR, "rebuilt"), Seq("q_id"), "left")
        .join(broadcast(plantedOf(apprR, "rebuilt")), Seq("q_id"), "left")
        .crossJoin(broadcast(census))
        .withColumn("maint_hit", coalesce(col("maint_hit"), lit(0L)))
        .withColumn("rebuilt_hit", coalesce(col("rebuilt_hit"), lit(0L)))
        .withColumn("maint_found_planted",
          coalesce(col("maint_found_planted"), lit(false)))
        .withColumn("rebuilt_found_planted",
          coalesce(col("rebuilt_found_planted"), lit(false)))
        .withColumn("maint_recall", RelationalQueries.rnd(
          col("maint_hit").cast("double") / col("n_truth"), 4))
        .withColumn("rebuilt_recall", RelationalQueries.rnd(
          col("rebuilt_hit").cast("double") / col("n_truth"), 4))
        .select("q_id", "n_truth", "maint_hit", "maint_recall",
          "maint_found_planted", "rebuilt_hit", "rebuilt_recall",
          "rebuilt_found_planted", "n_inserts", "n_new_edges")
        .orderBy("q_id")
    }),

    /** Maximum-inner-product search (MIPS) — recommendation-retrieval
      * scoring, where the right metric is ⟨q, x⟩, not cosine — via the
      * classic norm-augmentation reduction (Bachrach et al. 2014 /
      * Shrivastava-Li): append sqrt(M² − ‖x‖²) to every corpus vector
      * (M = max corpus norm, one broadcast scalar) and 0 to queries;
      * every augmented corpus vector then has norm exactly M, so
      * cosine order on the augmented space IS inner-product order on
      * the original — any cosine-ANN index (s02's LSH, s04's IVF)
      * becomes a MIPS index with zero new machinery. The shipped query
      * runs the augmented-cosine path end to end and RANKS on rnd6 of
      * the inner product RECOVERED from it (cos(q̂, x̂)·‖q‖·M, which is
      * exactly ⟨q, x⟩ in real arithmetic); the ORACLE ranks by rnd6 of
      * the raw inner product with no augmentation anywhere. The rnd6
      * collapse makes the rank deterministic, not just empirically
      * stable: float noise between the two computations is ~1e-12
      * relative while the rank key is 1e-6-granular, so near-equal
      * scores land in the same cell and fall to the vec_id tie-break
      * identically on both engines (residual risk — a score within
      * ulps of a cell boundary — is the same class every rnd6 oracle
      * in this repo accepts, vs raw-float ordering where ANY near-tie
      * could flip). Reported scores are the raw inner products
      * (ascending-index kernel on both engines ⇒ bit-identical). */
    "s09_mips_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val m2 = emb.agg(max(dot(col("vec"), col("vec"))).as("m2"))
      val aug = emb.crossJoin(broadcast(m2))
        .select(col("vec_id"), col("vec"), col("m2"),
          concat(col("vec"),
            array(sqrt(col("m2") - dot(col("vec"), col("vec"))))).as("avec"))
      val queriesDf = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
          concat(col("vec"), array(lit(0.0))).as("q_avec"))
      val scored = aug.join(broadcast(queriesDf), col("q_id") =!= col("vec_id"))
        .withColumn("c", cosine(col("q_avec"), col("avec")))
        .withColumn("ip6", RelationalQueries.rnd(
          col("c") * sqrt(dot(col("q_vec"), col("q_vec"))) * sqrt(col("m2")), 6))
      val w = Window.partitionBy("q_id").orderBy(col("ip6").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
          RelationalQueries.rnd(dot(col("q_vec"), col("vec")), 4).as("ip"))
        .orderBy("q_id", "rank")
    }),

    /** Product quantization (PQ) — the vector-compression step an ANN
      * index applies beyond s06's scalar int8: the 64-dim space splits
      * into 8 subspaces of 8 dims, each with its own 16-entry codebook,
      * and every vector encodes as 8 code bytes (64× smaller than the
      * double working form). Codebooks here are SAMPLED (the 16
      * sub-vectors of the s07 md5-seeding rule — the standard
      * no-refinement PQ baseline; a production build runs s07's Lloyd
      * loop per subspace on the same machinery). Encoding is the
      * canonical n·k·d shape: sub-vectors explode (8 rows per vector),
      * the 128-row codebook BROADCASTS, argmin per (vector, subspace)
      * with rnd6 distances so the assignment is cross-engine stable.
      * Reconstruction error is accounted in exact integer micro-units
      * (floor(dist²·10⁶+0.5) summed as longs) — immune to summation
      * order, so the whole encode pipeline hash-matches DuckDB. */
    "s08_product_quantize" -> ((s, d) => {
      val S = 8; val Dsub = 8; val K = 16
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val seeds = emb.withColumn("h", md5(col("vec_id").cast("string")))
        .orderBy("h").limit(K)
      val wSeed = Window.orderBy("h")
      val seeded = seeds.select(row_number().over(wSeed).as("code"), col("vec"))
      def subSlices(vecCol: String, outName: String) =
        explode(array((0 until S).map(sp => struct(lit(sp).as("sp"),
          expr(s"slice($vecCol, ${sp * Dsub} + 1, $Dsub)").as(outName))): _*))
      val codebook = seeded
        .select(col("code"), subSlices("vec", "cvec").as("e"))
        .select(col("e.sp"), col("code"), col("e.cvec"))
      val subs = emb
        .select(col("vec_id"), subSlices("vec", "sub").as("e"))
        .select(col("vec_id"), col("e.sp"), col("e.sub"))
      val scored = subs.join(broadcast(codebook), "sp")
        .withColumn("diff", expr("zip_with(sub, cvec, (a, b) -> a - b)"))
        .withColumn("dist2", RelationalQueries.rnd(
          graft.functions.VectorExpressions.array_dot(col("diff"), col("diff")), 6))
      val wMin = Window.partitionBy("vec_id", "sp")
        .orderBy(col("dist2").asc, col("code"))
      val enc = scored.withColumn("rn", row_number().over(wMin))
        .filter(col("rn") === 1)
      enc.agg(
          countDistinct("vec_id").as("n_vecs"),
          sum(floor(col("dist2") * 1e6 + 0.5).cast("long")).as("sum_dist2_e6"),
          countDistinct(concat_ws(":", col("sp"), col("code")))
            .as("n_codes_used"),
          max("dist2").as("max_dist2"))
        .select(col("n_vecs"), lit(S).as("n_subspaces"),
          lit(K).as("codebook_k"), col("sum_dist2_e6"),
          col("n_codes_used"), col("max_dist2"))
    }),

    "s03_centroid_stats" -> ((s, d) => {
      // per-label centroid + dispersion: the IVF coarse-quantizer build
      // step (centroids of an existing partition) — the shared
      // CentroidBuild aggregate (one shuffle, n_vecs rides along).
      val emb = Tables.embeddings(s, d)
        .select(col("label"), embD(col("embedding")).as("vec"))
      val agged = graft.operators.CentroidBuild.centroids(
        emb, col("label"), col("vec"))
      agged.select(col("cl_id").as("label"), col("n_vecs"),
          RelationalQueries.rnd(norm(col("cvec")), 4).as("centroid_norm"),
          RelationalQueries.rnd(element_at(col("cvec"), 1), 6).as("c0"),
          RelationalQueries.rnd(element_at(col("cvec"), 2), 6).as("c1"))
        .orderBy("label")
    }),

    /** IVF-PQ with asymmetric distance computation (ADC) — the
      * composition a production-scale vector index actually ships
      * (Jégou et al., "Product Quantization for Nearest Neighbor
      * Search", TPAMI 2011; the Faiss `IVFPQ` layout): the s04 coarse
      * quantizer routes the search to `nprobe` inverted lists, vectors
      * are stored only as 8 PQ code bytes of their RESIDUAL (vec −
      * home centroid; residuals are what PQ compresses well, since the
      * coarse step has removed the between-cluster variance), and a
      * query scores candidates without ever reconstructing them: per
      * probed list it builds an 8×16 lookup table of subspace distances
      * between its own residual (query − probed centroid) and the
      * codebook, and a candidate's approximate distance is just the sum
      * of 8 table lookups selected by its stored code bytes.
      *
      * Scale shape: everything small broadcasts — the k-row centroid
      * table, the 128-row residual codebook, the q·nprobe·8·16-row LUT
      * (1 KB per probed list); the corpus never shuffles to be assigned
      * or encoded (broadcast joins + a (vec_id, sp) argmin window), the
      * scored candidate set is ~n·nprobe/k rows × 8 code rows joined to
      * the broadcast LUT, and the per-candidate score is 8 lookups
      * instead of a 64-dim kernel — the memory story (8 bytes/vector vs
      * 512) is what makes 100 TB of embeddings indexable at all.
      *
      * Oracle discipline: rnd6 subspace distances (argmin stable
      * cross-engine, the s08 rule), LUT entries frozen to e6 BIGINT
      * BEFORE the 8-way ADC sum (integer-exact, immune to summation
      * order), rank on (adc_e6 asc, vec_id) — the full composed
      * pipeline hash-matches the DuckDB replica. */
    "s11_ivfpq_adc" -> ((s, d) =>
      pqAdcReport(s, d, pqIndexMemo(s, d))),

    /** PQ index-quality evaluation — recall@k of the s11 IVF-PQ ADC
      * ranking against brute-force rnd6-cosine ground truth, closing
      * the quality-measurement triad: s10 certifies the coarse IVF
      * routing, s17 sweeps its nprobe knob, and this query measures
      * what the PQ CODE COMPRESSION itself costs in recall — the
      * number a deployment weighs against the 64× memory saving
      * before shipping 8-byte codes. The approximate side IS s11's
      * code path ([[pqAdcScored]], shared by construction — the s10
      * discipline: an evaluation that re-inlines its index can
      * silently measure a different index), so the published recall
      * certifies exactly the index s11 serves. `n_cand` rides along
      * (the probe-bounded candidate count, the cost axis): recall
      * here is bounded by BOTH the coarse routing (a true neighbor
      * outside every probed list is unreachable — s10's loss) and ADC
      * rank inversions inside the candidate set (PQ's own loss), and
      * the measurement shows the latter dominates: at sf0.01 ADC
      * recall is 0.0–0.2 where s10's exact scoring of the SAME probe
      * lists holds 0.4–0.6 — the md5-sampled 16-entry codebook with
      * no Lloyd refinement (s08's baseline rule) quantizes too
      * coarsely to preserve top-10 order, which is precisely the
      * go/no-go signal this audit exists to surface (a production
      * build would refine per-subspace codebooks and re-measure).
      * Truth is one brute pass over the 3-probe
      * sample (how production measures an index); the overlap is an
      * id-only semi join of two k-row sets. Fully portable ⇒ the
      * recall numbers hash-match the DuckDB replica (shared
      * [[PqAdcCteSql]] prefix + independent truth) at all three SFs. */
    "s18_pq_recall" -> ((s, d) => {
      val K = 10
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val queriesDf = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
      val truthScored = emb
        .join(broadcast(queriesDf), col("q_id") =!= col("vec_id"))
        .withColumn("c6",
          RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
      val wT = Window.partitionBy("q_id").orderBy(col("c6").desc, col("vec_id"))
      // truth (q·K ids) feeds the semi-join AND the n_truth census;
      // checkpoint so the corpus-sized brute-force scan behind it runs
      // once — and likewise rank the ADC candidates ONCE and checkpoint:
      // `ranked` feeds both the top-K cut and the per-query candidate
      // census, and un-materialized each would re-run the whole
      // centroid/residual/LUT ADC pipeline (it is probe-traffic-sized —
      // the frame a recall evaluation materializes anyway)
      val truth = truthScored.withColumn("rn", row_number().over(wT))
        .filter(col("rn") <= K).select(col("q_id"), col("vec_id"))
        .materialize
      val wA = Window.partitionBy("q_id")
        .orderBy(col("adc_e6").asc, col("vec_id"))
      val ranked = pqAdcScored(s, d)
        .withColumn("rn", row_number().over(wA))
        .select("q_id", "vec_id", "rn")
        .materialize
      val approx = ranked.filter(col("rn") <= K).select("q_id", "vec_id")
      val nCand = ranked.groupBy("q_id").agg(count(lit(1)).as("n_cand"))
      val hits = truth.join(approx, Seq("q_id", "vec_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
      truth.groupBy("q_id").agg(count(lit(1)).as("n_truth"))
        .join(nCand, Seq("q_id"), "left")
        .join(hits, Seq("q_id"), "left")
        .withColumn("n_cand", coalesce(col("n_cand"), lit(0L)))
        .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
        .withColumn("recall_at_k", RelationalQueries.rnd(
          col("n_hit").cast("double") / col("n_truth"), 4))
        .select("q_id", "n_truth", "n_cand", "n_hit", "recall_at_k")
        .orderBy("q_id")
    }),

    /** Two-stage quantized retrieval: ADC shortlist → exact re-rank —
      * the composition a PQ index actually SERVES with (the Faiss
      * `IndexRefineFlat` pattern, §VII of Jégou et al. 2011): stage 1
      * ranks the probe-bounded candidates by s11's 8-byte ADC codes
      * and keeps a top-C shortlist; stage 2 fetches ONLY those C
      * full vectors per query and re-ranks them by exact rnd6 cosine.
      * This is the answer to the go/no-go signal s18 publishes — ADC
      * recall collapses to 0.0–0.2 under the unrefined 16-entry
      * codebook while exact scoring of the same probe lists holds
      * 0.4–0.6 — and the refine stage buys that recall back for
      * C exact kernels per query instead of a corpus scan: rank
      * inversions INSIDE the shortlist are corrected by
      * construction, so the output order equals exact scoring
      * wherever the true neighbor survived the ADC cut. `adc_rank`
      * rides along so the published result shows the inversions the
      * refine stage repaired (sf0.01: the exact top-1 sits at ADC
      * rank 8 and 6 for two of three probes — i.e. OUTSIDE the ADC
      * top-5 that s11 serves unrefined). Scale shape: the
      * shortlist is q·C ids (broadcast); the vector fetch is a
      * broadcast join against the store — the corpus is read, never
      * shuffled, and the exact kernel runs q·C times total, which is
      * the entire point of shortlist-then-refine at 100 TB. Fully
      * portable (shared [[PqAdcCteSql]] prefix + the s18 cosine
      * rule) ⇒ hash-matches the DuckDB replica at all three SFs. */
    "s19_adc_rerank" -> ((s, d) => {
      val C = 20; val K = 5
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val queriesDf = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
      val wA = Window.partitionBy("q_id")
        .orderBy(col("adc_e6").asc, col("vec_id"))
      val shortlist = pqAdcScored(s, d)
        .withColumn("adc_rank", row_number().over(wA))
        .filter(col("adc_rank") <= C)
        .select("q_id", "vec_id", "adc_rank")
      // fetch = broadcast the q·C-id shortlist AGAINST the store; the
      // corpus-sized side is scanned, never shuffled
      val fetched = emb.join(broadcast(shortlist), "vec_id")
        .join(broadcast(queriesDf), "q_id")
        .withColumn("c6",
          RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
      val wE = Window.partitionBy("q_id")
        .orderBy(col("c6").desc, col("vec_id"))
      fetched.withColumn("rank", row_number().over(wE))
        .filter(col("rank") <= K)
        .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
          col("c6"), col("adc_rank"))
        .orderBy("q_id", "rank")
    }),

    /** Sharded scatter-gather top-k — the DISTRIBUTED serving shape of
      * every production vector index (each shard answers its local
      * top-K, a gather node merges P·K candidates — Faiss
      * `IndexShards`, Lucene/Elasticsearch query-then-fetch): the
      * corpus is sharded by id, each (query, shard) window keeps its
      * local top-K, and the merge re-ranks only the P·K·q pooled rows.
      * The scatter-gather theorem — with EXACT scoring, every global
      * top-K member is necessarily in its home shard's local top-K, so
      * the merged result equals the unsharded ranking — is certified,
      * not assumed: `global_rank` is computed from the FULL candidate
      * set (an audit-only pass at bench scale; the serving path is the
      * shard windows + the P·K merge) and published beside the merged
      * rank, equal row-by-row in the hash-verified output. The `shard`
      * column shows winners spread across shards (the merge is real
      * work, not a copy). Scale shape: shard windows partition by
      * (q_id, shard) — cardinality grows with shards — the gather
      * traffic is P·K rows per query regardless of corpus size, and
      * for approximate scoring the same merge serves s11's ADC or
      * s04's IVF lists per shard. */
    "s20_scatter_gather" -> ((s, d) => {
      val P = 4; val K = 5
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val queriesDf = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
      val scored = emb.withColumn("shard", pmod(col("vec_id"), lit(P)))
        .join(broadcast(queriesDf), col("q_id") =!= col("vec_id"))
        .withColumn("c6",
          RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
      val wShard = Window.partitionBy("q_id", "shard")
        .orderBy(col("c6").desc, col("vec_id"))
      val local = scored.withColumn("srn", row_number().over(wShard))
        .filter(col("srn") <= K)
      val wMerge = Window.partitionBy("q_id")
        .orderBy(col("c6").desc, col("vec_id"))
      val merged = local.withColumn("rank", row_number().over(wMerge))
        .filter(col("rank") <= K)
        .select("q_id", "rank", "vec_id", "shard", "c6")
      // audit-only: the unsharded ranking over the full candidate set,
      // joined back so the published rows certify rank == global_rank
      val globalTop = scored
        .withColumn("global_rank", row_number().over(wMerge))
        .filter(col("global_rank") <= K)
        .select("q_id", "vec_id", "global_rank")
      merged.join(globalTop, Seq("q_id", "vec_id"), "left")
        .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
          col("shard"), col("c6"), col("global_rank"))
        .orderBy("q_id", "rank")
    }),

    /** Symmetric int8 scalar-quantized (SQ8) brute top-k — the other
      * half of the quantized-search story beside s11's IVF-PQ: both
      * sides of the dot product are s06's absmax int8 codes, so the
      * scan reads 4× less memory than float32 (the bandwidth-bound
      * resource of a brute scan at 100 TB) and the accumulation is
      * EXACT — every product is an integer ≤ 127²·64 < 2^53, so the
      * int-valued double dot is bit-identical across engines with no
      * rounding discipline needed until the final de-scale. Approximate
      * inner product recovers as qdot·(q_scale·scale)/127²; ranking
      * uses rnd6 of that (tie → vec_id), the s09 determinism rule.
      * Every stage is portable, so the whole quantize→scan→rank
      * pipeline hash-matches the DuckDB replica. */
    "s12_sq8_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val qz = emb
        .withColumn("scale", array_max(transform(col("vec"), x => abs(x))))
        .withColumn("qv", // int8 codes as exact int-valued doubles (the
          // native dot kernel is ARRAY<DOUBLE>; every value ≤ 127)
          expr("transform(vec, x -> cast(floor(x / scale * 127.0 + 0.5)" +
            " as double))"))
        .select(col("vec_id"), col("scale"), col("qv"))
      val queriesDf = qz.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("scale").as("q_scale"),
          col("qv").as("q_qv"))
      val scored = qz.join(broadcast(queriesDf), col("q_id") =!= col("vec_id"))
        .withColumn("qdot", dot(col("q_qv"), col("qv")).cast("long"))
        .withColumn("ip8", col("qdot") * col("q_scale") * col("scale")
          / lit(127.0 * 127.0))
      val w = Window.partitionBy("q_id")
        .orderBy(RelationalQueries.rnd(col("ip8"), 6).desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
          col("qdot"), RelationalQueries.rnd(col("ip8"), 4).as("ip8"))
        .orderBy("q_id", "rank")
    }),

    /** Filtered (metadata-constrained) ANN search — the "similar items
      * in the same category" query every production vector store must
      * answer (Faiss IDSelector / Qdrant payload filter): top-5 among
      * corpus vectors sharing the QUERY'S OWN label, served from the
      * s04 IVF index by post-filtering the probed candidates. The
      * filter runs AFTER the probe (post-filter semantics: the index
      * is label-agnostic, so selective predicates thin the candidate
      * set and can short a query below k — the classic filtered-ANN
      * failure mode), and `n_cand` publishes each query's surviving
      * candidate count so that shortfall is measured, not silent; a
      * production config would raise nprobe when n_cand < ~4k. Probe
      * pipeline is the SHARED [[graft.operators.CentroidBuild
      * .ivfCandidates]] path (the s10 discipline: a variant query
      * cannot drift from the index it claims to serve); the label
      * rides the corpus frame through the probe join, the q-row query
      * label table broadcasts, and every stage is portable math ⇒ the
      * full filtered pipeline hash-matches the DuckDB replica. */
    "s13_filtered_ann" -> ((s, d) => {
      val nprobe = 3
      val embL = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), embD(col("embedding")).as("vec"))
      val centroids = graft.operators.CentroidBuild.centroids(
        embL.select(col("label"), col("vec")), col("label"), col("vec"))
      val qLabels = embL.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"))
      val scored = graft.operators.CentroidBuild.ivfCandidates(
          embL, centroids, col("vec_id") < 3, nprobe)
        .join(broadcast(qLabels), "q_id")
        .filter(col("label") === col("q_label"))
        .withColumn("cos", cosine(col("q_vec"), col("vec")))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
      scored
        .withColumn("n_cand", count(lit(1)).over(Window.partitionBy("q_id")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
          col("label"), RelationalQueries.rnd(col("cos"), 4).as("cos_sim"),
          col("n_cand"))
        .orderBy("q_id", "rank")
    }),

    /** IVF index-maintenance audit — the "does the index need a
      * rebuild?" check a vector store runs as data arrives: the coarse
      * quantizer is FROZEN on the indexed corpus (vec_id % 5 ≠ 0
      * stands in for "what the index was built on"), the held-out
      * slice plays the newly-ingested batch, both are assigned to the
      * frozen centroids (broadcast — neither side shuffles), and the
      * audit publishes per-list occupancy shares old-vs-new with a
      * rebalance flag where the share drifted > 0.02 absolute. A
      * drifted list means queries probing it scan a different fraction
      * of the corpus than the index was tuned for — the signal that
      * triggers re-training the quantizer (s07's build) or splitting
      * hot lists. Cost: one centroid aggregate over the indexed slice
      * + one broadcast-assignment scan + a k-row share join; the audit
      * is linear in the corpus at any scale. All portable math (rnd6
      * assignment, exact integer counts, one share division) ⇒ hash
      * oracle at all three SFs. */
    "s14_ivf_drift" -> ((s, d) => {
      val embL = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), embD(col("embedding")).as("vec"))
      val indexed = embL.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val cents = graft.operators.CentroidBuild.centroids(
        indexed.select(col("label"), col("vec")), col("label"), col("vec"))
      val assign = graft.operators.CentroidBuild.nearest(
        graft.operators.CentroidBuild.similarities(embL, cents,
          "vec_id", "vec"), "vec_id")
      // k rows consumed twice (the totals aggregate + the share join):
      // checkpoint so the corpus-sized broadcast-assignment scan behind
      // it runs once
      val byList = assign
        .withColumn("is_new", pmod(col("vec_id"), lit(5)) === 0)
        .groupBy("cl_id")
        .agg(sum(when(col("is_new"), 0L).otherwise(1L)).as("n_old"),
          sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
        .materialize
      val tot = byList.agg(sum("n_old").as("t_old"), sum("n_new").as("t_new"))
      val so = col("n_old").cast("double") / col("t_old")
      val sn = col("n_new").cast("double") / col("t_new")
      byList.crossJoin(tot)
        .select(col("cl_id"), col("n_old"), col("n_new"),
          RelationalQueries.rnd(so, 6).as("share_old"),
          RelationalQueries.rnd(sn, 6).as("share_new"),
          (abs(sn - so) > 0.02).as("rebalance"))
        .orderBy("cl_id")
    }),

    /** Radius (range) search — the second vector-store query shape
      * beside top-k (Faiss `range_search`): return EVERY neighbor with
      * cosine ≥ τ rather than a fixed k, the primitive behind "find
      * all near-duplicates of this document" and recall-oriented
      * retrieval where the caller bounds similarity, not cardinality.
      * Candidates come from the SAME shared IVF probe pipeline s04
      * serves and s10 certifies ([[graft.operators.CentroidBuild
      * .ivfCandidates]] — broadcast centroids, nprobe probe lists, no
      * corpus shuffle), so a range query costs exactly one probe-pruned
      * candidate scan; only the post-filter differs. The result size is
      * data-dependent — the operational hazard of range search at
      * scale — so each row publishes its query's match count
      * (`n_range`), the number a production caller uses to cap or
      * paginate. The threshold compares the rnd6 cosine on BOTH
      * engines, so the boundary set is identical cross-engine and the
      * whole approximate pipeline hash-matches the DuckDB replica. */
    "s15_range_search" -> ((s, d) => {
      val nprobe = 3
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val centroids = graft.operators.CentroidBuild.centroids(
        Tables.embeddings(s, d)
          .select(col("label"), embD(col("embedding")).as("vec")),
        col("label"), col("vec"))
      val scored = graft.operators.CentroidBuild.ivfCandidates(
          emb, centroids, col("vec_id") < 3, nprobe)
        .withColumn("c6",
          RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
        .filter(col("c6") >= 0.25)
      scored
        .withColumn("n_range", count(lit(1)).over(Window.partitionBy("q_id")))
        .select(col("q_id"), col("vec_id").as("n_id"),
          col("c6").as("cos_sim"), col("n_range"))
        .orderBy("q_id", "n_id")
    }),

    /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
      * SIGIR 2009 — the fusion rule production search stacks use to
      * combine a lexical and a vector arm without score calibration):
      * each arm retrieves its own top-K (lexical = distinct-token
      * overlap with the query document, vector = rnd6 cosine, both
      * tie-broken on doc_id), and a document's fused score is
      * Σ 1/(60 + rank_arm) over the arms that retrieved it — ranks,
      * not raw scores, so the arms need no common scale. Both
      * 1/(60+r) terms and their two-term sum are the same IEEE-double
      * ops on both engines, so even the fused ORDERING replicates and
      * the whole fusion hash-matches DuckDB. At scale each arm is the
      * retrieval it already is elsewhere in this file (a brute/IVF
      * top-K — TakeOrdered, never a global sort) and fusion touches
      * only the ≤ 2K retrieved rows: the corpus-sized work is the
      * arms, the fusion is constant-sized — which is exactly why RRF
      * is the production default. */
    "s16_hybrid_rrf" -> ((s, d) => {
      val K = 50
      val toksD = array_distinct(filter(split(col("text"), " "),
        t => t =!= ""))
      val corpus = Tables.documents(s, d)
        .select(col("doc_id"), toksD.as("tk"))
        .join(Tables.embeddings(s, d)
            .select(col("vec_id"), embD(col("embedding")).as("vec")),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("tk"), col("vec"))
      val qrow = corpus.filter(col("doc_id") === 0)
        .select(col("tk").as("q_tk"), col("vec").as("q_vec"))
      val cand = corpus.filter(col("doc_id") =!= 0)
        .crossJoin(broadcast(qrow))
        .withColumn("lex", size(array_intersect(col("tk"), col("q_tk"))))
        .withColumn("c6",
          RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
      // global (unpartitioned) windows — benign: each ranks its own
      // post-limit(K) finalist frame (K rows), not the candidate set;
      // the TopK cut above already ran distributed
      val wL = Window.orderBy(col("lex").desc, col("doc_id"))
      val lexTop = cand.select("doc_id", "lex")
        .orderBy(col("lex").desc, col("doc_id")).limit(K)
        .withColumn("r_lex", row_number().over(wL))
      val wV = Window.orderBy(col("c6").desc, col("doc_id"))
      val vecTop = cand.select("doc_id", "c6")
        .orderBy(col("c6").desc, col("doc_id")).limit(K)
        .withColumn("r_vec", row_number().over(wV))
      val fused = lexTop.join(vecTop, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0)))
      val wF = Window.orderBy(col("rrf").desc, col("doc_id"))
      fused.orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .withColumn("rank", row_number().over(wF))
        .select(col("rank"), col("doc_id"), col("r_lex"), col("r_vec"),
          RelationalQueries.rnd(col("rrf"), 6).as("rrf"))
        .orderBy("rank")
    }),

    /** The nprobe tuning sweep — the recall-vs-cost CURVE an operator
      * reads before fixing an IVF index's probe width, extending s10's
      * single-point recall@k to nprobe ∈ {1, 2, 4}. For each setting
      * the approximate side is the SAME shared
      * [[graft.operators.CentroidBuild.ivfCandidates]] pipeline s04
      * serves and s10 certifies (drift-proof by construction), and the
      * published row carries both axes of the trade: `n_cand` (corpus
      * vectors actually scored — the cost, growing ~linearly with
      * nprobe) and `recall_at_k` against the once-computed brute-force
      * truth (non-decreasing in nprobe: more probed lists only ever
      * ADD candidates). Truth costs one brute pass over the fixed
      * 3-query sample (the s10 evaluation economics); each sweep point
      * re-probes with broadcast centroids and scores only its
      * candidate lists. Every stage is portable rnd6 math, so the
      * whole 9-row curve hash-matches the DuckDB replica. At 100 TB:
      * sweep cost = Σ nprobe/K of one corpus scan — the evaluation
      * stays a sampled-query audit, never an all-pairs pass. */
    "s17_nprobe_sweep" -> ((s, d) => {
      val K = 10
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val queriesDf = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
      val truthScored = emb
        .join(broadcast(queriesDf), col("q_id") =!= col("vec_id"))
        .withColumn("c6",
          RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
      val wT = Window.partitionBy("q_id").orderBy(col("c6").desc, col("vec_id"))
      // q·K ids with multiple consumers (semi-join(s) + n_truth census):
      // checkpoint so the corpus-sized brute-force scan behind it runs
      // exactly once
      val truth = truthScored.withColumn("rn", row_number().over(wT))
        .filter(col("rn") <= K).select(col("q_id"), col("vec_id"))
        .materialize
      val centroids = graft.operators.CentroidBuild.centroids(
        Tables.embeddings(s, d)
          .select(col("label"), embD(col("embedding")).as("vec")),
        col("label"), col("vec"))
      // ONE ranked candidate build at the largest sweep point — probe
      // lists at smaller nprobe are nested prefixes of the same
      // deterministic ranking, so each arm is a prank filter on the
      // shared frame (the s23 prefix-sweep discipline; r21 — was one
      // full corpus assignment + materialize PER ARM, 3.4 → ~2 s at
      // sf0.1). Checkpointed once: the frame feeds every arm's census
      // AND scoring window.
      val cand4 = graft.operators.CentroidBuild.ivfCandidatesRanked(
          emb, centroids, col("vec_id") < 3, 4)
        .materialize
      val perProbe = Seq(1, 2, 4).map { np =>
        val cand = cand4.filter(col("prank") <= np)
        val nCand = cand.groupBy("q_id").agg(count(lit(1)).as("n_cand"))
        val scored = cand.withColumn("c6",
          RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
        val wA = Window.partitionBy("q_id")
          .orderBy(col("c6").desc, col("vec_id"))
        val approx = scored.withColumn("rn", row_number().over(wA))
          .filter(col("rn") <= K).select(col("q_id"), col("vec_id"))
        val hits = truth.join(approx, Seq("q_id", "vec_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
        truth.groupBy("q_id").agg(count(lit(1)).as("n_truth"))
          .join(broadcast(nCand), Seq("q_id"), "left")
          .join(broadcast(hits), Seq("q_id"), "left")
          .withColumn("nprobe", lit(np))
      }
      perProbe.reduce(_ unionByName _)
        .withColumn("n_cand", coalesce(col("n_cand"), lit(0L)))
        .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
        .withColumn("recall_at_k", RelationalQueries.rnd(
          col("n_hit").cast("double") / col("n_truth"), 4))
        .select("nprobe", "q_id", "n_cand", "n_truth", "n_hit",
          "recall_at_k")
        .orderBy("nprobe", "q_id")
    }),

    /** Binary-quantized retrieval — the 1-bit-per-dimension serving
      * scheme (sign quantization; the asymmetric-hamming family behind
      * BQ in production vector stores): each 64-dim vector compresses
      * to a 64-bit sign signature (8 bytes — 32× less memory bandwidth
      * per scanned candidate than the float vector, the most aggressive
      * point on the s12/s21 compression axis), queries rank the corpus
      * by signature hamming distance, keep a C=50 shortlist, and ONLY
      * the shortlist is fetched and re-ranked by exact cosine (the s19
      * refine step). Unlike s02's random-hyperplane LSH the hash here
      * is the coordinate sign itself — portable SQL — so this variant
      * carries a FULL DuckDB oracle including its recall@10 vs brute
      * truth (the `in_truth` column the operator publishes per row).
      * Signatures are 4×16-bit bands (one 64-bit word would need bit
      * 63 = sign-bit overflow on both engines, the m09 rule); the
      * hamming scan reads signatures only, the float vectors stay in
      * the store until the 150-row shortlist fetch, which broadcasts.
      * A production build precomputes signatures at ingest (one scan)
      * and stores them column-adjacent; here they compute scan-side in
      * the same stage as the hamming compare. */
    "s22_binary_quant" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val shortlist = bqShortlist(emb, 50)
      val qVecs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
      val reranked = emb.join(broadcast(shortlist), "vec_id")
        .join(broadcast(qVecs), "q_id")
        .withColumn("c6", RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
      val wR = Window.partitionBy("q_id").orderBy(col("c6").desc, col("vec_id"))
      val topk = reranked.withColumn("rank", row_number().over(wR))
        .filter(col("rank") <= 10)
      // brute truth for the in_truth audit column — same rnd6 rank key
      val wT = Window.partitionBy("q_id").orderBy(col("c6").desc, col("vec_id"))
      val truth = broadcast(emb.join(broadcast(qVecs), col("q_id") =!= col("vec_id"))
        .withColumn("c6", RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
        .withColumn("trn", row_number().over(wT))
        .filter(col("trn") <= 10).select(col("q_id"), col("vec_id"), lit(true).as("in_truth")))
      topk.join(truth, Seq("q_id", "vec_id"), "left")
        .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
          col("ham"), RelationalQueries.rnd(col("c6"), 4).as("cos_sim"),
          coalesce(col("in_truth"), lit(false)).as("in_truth"))
        .orderBy("q_id", "rank")
    }),

    /** Shortlist-size sweep for the binary-quantized index — the C
      * axis a BQ deployment tunes (s17's nprobe-sweep discipline
      * applied to s22): recall@10 of the exact-reranked top-10 vs
      * brute truth for C ∈ {5, 10, 25, 50}, each through the ONE
      * shared [[bqShortlist]] pipeline s22 serves (an evaluation that
      * re-inlines its index can silently measure a different index).
      * Each row publishes both axes — C is the cost (C exact kernels
      * + C-row fetch per query) and recall the quality, non-decreasing
      * in C by construction since shortlists are nested prefixes of
      * the same hamming ranking. Truth is computed ONCE (one brute
      * pass), the four sweep arms reuse one shortlist build at the
      * largest C and prefix-filter it — the sweep costs one pipeline
      * run, not four. */
    "s23_bq_sweep" -> ((s, d) => {
      val K = 10
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      // one shortlist at max C; each arm is a prefix (hrn <= C)
      val short50 = bqShortlist(emb, 50, keepRank = true)
      val qVecs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
      // lazy barrier (r22): the reranked shortlist is ≤ queries×C rows,
      // but each of the 4 sweep arms consumes it twice (top-k window +
      // n_ret census), and un-cached every consumer re-ran the corpus
      // scan + shortlist broadcast join — 8 scans for 150 rows (123
      // Exchange nodes in the r21 published plan)
      val reranked = emb.join(broadcast(short50), "vec_id")
        .join(broadcast(qVecs), "q_id")
        .withColumn("c6", RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
        .materializeLazy
      val wT = Window.partitionBy("q_id").orderBy(col("c6").desc, col("vec_id"))
      val truth = broadcast(emb.join(broadcast(qVecs), col("q_id") =!= col("vec_id"))
        .withColumn("c6", RelationalQueries.rnd(cosine(col("q_vec"), col("vec")), 6))
        .withColumn("trn", row_number().over(wT))
        .filter(col("trn") <= K).select(col("q_id"), col("vec_id")))
      val arms = Seq(5, 10, 25, 50).map { c =>
        val wR = Window.partitionBy("q_id").orderBy(col("c6").desc, col("vec_id"))
        val topk = reranked.filter(col("hrn") <= c)
          .withColumn("rank", row_number().over(wR))
          .filter(col("rank") <= K)
          .select("q_id", "vec_id")
        val hits = topk.join(truth, Seq("q_id", "vec_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
        topk.groupBy("q_id").agg(count(lit(1)).as("n_ret"))
          .join(broadcast(hits), Seq("q_id"), "left")
          .withColumn("c", lit(c))
      }
      arms.reduce(_ unionByName _)
        .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
        .withColumn("recall_at_k", RelationalQueries.rnd(
          col("n_hit").cast("double") / K, 4))
        .select("c", "q_id", "n_ret", "n_hit", "recall_at_k")
        .orderBy("c", "q_id")
    }),

    /** Matryoshka (prefix-dimension) retrieval recall curve — the MRL
      * serving trade (Kusupati et al. 2022, "Matryoshka Representation
      * Learning"): embeddings trained so every PREFIX of the vector is
      * itself a valid lower-dim embedding let a deployment rank with
      * the first 8/16/32 of 64 dims, cutting score FLOPs and — the part
      * that matters at 100 TB — memory bandwidth per candidate by 8/4/2×
      * (the same lever as s12's SQ8, on the dimension axis instead of
      * the precision axis). This op publishes recall@10 of each prefix
      * length against full-dim truth, per query — the curve a serving
      * team reads to pick its truncation. Scale: the query×prefix frame
      * is 12 rows and BROADCAST; the corpus is scanned once, each row
      * scored at 4 prefix lengths inside the same codegen stage (the
      * fan-out multiplies rows AFTER the scan, never re-reads), and the
      * only shuffle is the per-(prefix, query) top-k heaps. Prefix
      * slicing reuses the s11 subspace discipline: `slice` on the
      * scan-side array, the cosine kernel runs on whatever length it
      * gets. The p=64 row doubles as a self-check (recall 1 by
      * construction, and the oracle verifies that rather than assuming
      * it). */
    "s21_matryoshka_recall" -> ((s, d) => {
      val K = 10
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), embD(col("embedding")).as("vec"))
      val queriesDf = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
          explode(typedLit(Seq(8, 16, 32, 64))).as("p"))
      val scored = emb.join(broadcast(queriesDf), col("q_id") =!= col("vec_id"))
        .withColumn("c6", RelationalQueries.rnd(
          cosine(slice(col("vec"), lit(1), col("p")),
            slice(col("q_vec"), lit(1), col("p"))), 6))
      val w = Window.partitionBy("p", "q_id")
        .orderBy(col("c6").desc, col("vec_id"))
      val topk = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= K)
        .select(col("p"), col("q_id"), col("vec_id"))
      // truth is q×K rows — broadcast, or the semi join against the
      // (equally tiny) topk frame plans as a sort-merge exchange
      val truth = broadcast(topk.filter(col("p") === 64)
        .select(col("q_id"), col("vec_id")))
      val hits = topk.join(truth, Seq("q_id", "vec_id"), "left_semi")
        .groupBy("p", "q_id").agg(count(lit(1)).as("n_hit"))
      topk.groupBy("p", "q_id").agg(count(lit(1)).as("n_ret"))
        .join(broadcast(hits), Seq("p", "q_id"), "left")
        .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
        .withColumn("recall_at_k", RelationalQueries.rnd(
          col("n_hit").cast("double") / K, 4))
        .select("p", "q_id", "n_ret", "n_hit", "recall_at_k")
        .orderBy("p", "q_id")
    }),
  )

  /** s27/s28 shared graph-ANN machinery (extracted r19,
    * RESULT-identical to s27's original inline body — design rationale
    * in the s27 scaladoc). NOT plan-identical by construction:
    * [[graphEdges]] deliberately changed the edge-build join order in
    * r19 (vectors attached to the n-row home table BEFORE the
    * cluster-keyed self-join — the superlinear-soak fix, see its
    * inline comment and tools/BENCH_NOTES.md r19), so the physical
    * plan is pinned only by the digest manifest, not by this
    * extraction. The index: [[hierRoute]] builds the s24 two-level
    * hierarchy and routes every vector (rank-1 home + rank-2 cross
    * target + per-cluster entry points); [[graphEdges]] materializes
    * the symmetrized top-[[GraphM]]-within-cluster + cross-shortcut
    * edge set. The query: [[hierSeeds]] descends the hierarchy to
    * [[GraphSeedF]] entry points; [[beamTopK]] runs [[GraphRounds]]
    * unrolled frontier⋈edges expansions and the final
    * top-[[GraphK]] re-rank; [[bruteTruth]] is the s10-style exact
    * control on the identical rnd6 ranking rule. */
  private[graft] case class HierIndex(coarse: DataFrame, fine: DataFrame,
      routed: DataFrame, entries: DataFrame)

  /** The s27/s28 corpus in its two epochs: `union = false` is the
    * organic embedding table (s28's base epoch); `union = true` adds
    * the 3 planted ×1.001 twins at vec_id+100000 (s27's corpus ≡
    * s28's insert-absorbed union). Lives here so the memoized index
    * build and the query-side frames read the SAME construction. */
  private[graft] def graphCorpus(s: SparkSession, d: String,
      union: Boolean): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), embD(col("embedding")).as("vec"))
    if (!union) base
    else base.unionByName(base.filter(col("vec_id") < 3)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("vec"), x => x * lit(1.001)).as("vec")))
  }

  /** Memoized graph-ANN index — the r19 verdict's shared-build ask:
    * one sweep executed the hierarchy+edge build THREE times (s27 on
    * the union corpus, s28 on the organic base AND again on the union
    * for its staleness control; s27's union build ≡ s28's rebuild
    * build input-for-input). This persists each (corpus dir, epoch)
    * build ONCE per session via [[graft.operators.BuildMemo]]'s
    * parquet handoff — exactly a production index lifecycle: build
    * once, serve many. Consumers read parquet on memo hit AND miss
    * (the build writes eagerly), so published plans are
    * order-independent; the build itself is deterministic (md5 seeds,
    * rnd6 + id tie-breaks — the properties the hash oracle already
    * pins), so memo-hit ≡ memo-miss bit-for-bit
    * (spec: BuildMemoSpec). */
  private[graft] def graphIndexMemo(s: SparkSession, d: String,
      union: Boolean): (HierIndex, DataFrame) = {
    val variant = if (union) "union" else "organic"
    val dir = graft.operators.BuildMemo.memoParquet(
      s, s"graphidx:$d:$variant") { out =>
      val (idx, edges) = graphIndexDirect(s, d, union)
      idx.coarse.write.parquet(s"$out/coarse")
      idx.fine.write.parquet(s"$out/fine")
      idx.routed.write.parquet(s"$out/routed")
      idx.entries.write.parquet(s"$out/entries")
      edges.write.parquet(s"$out/edges")
    }
    (HierIndex(s.read.parquet(s"$dir/coarse"),
      s.read.parquet(s"$dir/fine"),
      s.read.parquet(s"$dir/routed"),
      s.read.parquet(s"$dir/entries")),
      s.read.parquet(s"$dir/edges"))
  }

  /** One-shot COLD-staged graph index — x03's build (r22): identical
    * artifacts and parquet handoff as [[graphIndexMemo]], but through
    * [[graft.operators.BuildMemo.stageParquet]] so every call re-runs
    * the hierarchy + edge build and never touches the memo entry
    * s27/s28 read. */
  private[graft] def graphIndexColdStaged(s: SparkSession, d: String,
      union: Boolean): (HierIndex, DataFrame) = {
    val variant = if (union) "union" else "organic"
    val dir = graft.operators.BuildMemo.stageParquet(
      s, s"graphidx:$d:$variant") { out =>
      val (idx, edges) = graphIndexDirect(s, d, union)
      idx.coarse.write.parquet(s"$out/coarse")
      idx.fine.write.parquet(s"$out/fine")
      idx.routed.write.parquet(s"$out/routed")
      idx.entries.write.parquet(s"$out/entries")
      edges.write.parquet(s"$out/edges")
    }
    (HierIndex(s.read.parquet(s"$dir/coarse"),
      s.read.parquet(s"$dir/fine"),
      s.read.parquet(s"$dir/routed"),
      s.read.parquet(s"$dir/entries")),
      s.read.parquet(s"$dir/edges"))
  }

  /** s27's published frame from an EXPLICIT (index, edges) pair — one
    * tail shared by the roster cell (memoized build) and the x03
    * cold-build cell (fresh staged build), so both serve the identical
    * beam evaluation and the identical DuckDB oracle. */
  private[graft] def graphBeamReport(s: SparkSession, d: String,
      idxEdges: (HierIndex, DataFrame)): DataFrame = {
    val emb = graphCorpus(s, d, union = true)
    val (idx, edges) = idxEdges
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    // seeds feed the beam AND the n_seed census — checkpoint once
    val seeds = hierSeeds(qs, idx)
    val approx = beamTopK(qs, emb, edges, seeds)
    // brute truth on the identical ranking rule (the s10 audit)
    val truth = bruteTruth(qs, emb)
    val hits = truth.join(approx, Seq("q_id", "vec_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    val planted = approx.filter(col("vec_id") === col("q_id") + 100000)
      .select(col("q_id"), lit(true).as("found_planted"))
    val nSeed = seeds.groupBy("q_id").agg(count(lit(1)).as("n_seed"))
    truth.groupBy("q_id").agg(count(lit(1)).as("n_truth"))
      .join(broadcast(nSeed), "q_id")
      .join(hits, Seq("q_id"), "left")
      .join(broadcast(planted), Seq("q_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("found_planted",
        coalesce(col("found_planted"), lit(false)))
      .withColumn("recall_at_k", RelationalQueries.rnd(
        col("n_hit").cast("double") / col("n_truth"), 4))
      .select("q_id", "n_seed", "n_truth", "n_hit", "recall_at_k",
        "found_planted")
      .orderBy("q_id")
  }

  /** The unmemoized build — the memo's closure, exposed so the
    * memo-hit ≡ memo-miss spec can compare against a direct
    * computation. */
  private[graft] def graphIndexDirect(s: SparkSession, d: String,
      union: Boolean): (HierIndex, DataFrame) = {
    val emb = graphCorpus(s, d, union)
    val idx = hierRoute(emb)
    (idx, graphEdges(emb, idx))
  }

  private def hierRoute(emb: DataFrame): HierIndex = {
    import graft.operators.{CentroidBuild => CB}
    val n = emb.count() // bounded scalar read — the s07/q47 discipline
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    val kc = math.ceil(math.sqrt(k.toDouble)).toInt
    val kf = (k + kc - 1) / kc
    val coarse = CB.lloyd(emb, "vec_id", "vec", kc, rounds = 1)
    val cells = CB.nearest(
        CB.similarities(emb, coarse, "vec_id", "vec"), "vec_id")
      .withColumnRenamed("cl_id", "cell")
      .materialize
    val embCell = emb.join(cells, "vec_id")
    val fine = CB.lloydGrouped(embCell, "cell", "vec_id", "vec", kf,
      rounds = 1)
    // route keeping rank 1 (home) and rank 2 (cross-edge target):
    // (vec_id, cell, fid, csim, rn) — 3 consumers, checkpointed
    val routed = CB.nearestGroupedK(embCell, fine, "cell", "vec_id",
      "vec", 2).materialize
    // entry point per cluster: best-routed member, id tie-break
    val wE = Window.partitionBy("cell", "fid")
      .orderBy(col("csim").desc, col("vec_id"))
    val entries = routed.filter(col("rn") === 1)
      .withColumn("ern", row_number().over(wE))
      .filter(col("ern") === 1)
      .select(col("cell"), col("fid"), col("vec_id").as("entry"))
    HierIndex(coarse, fine, routed, entries)
  }

  private def graphEdges(emb: DataFrame, idx: HierIndex): DataFrame = {
    val home = idx.routed.filter(col("rn") === 1)
    val second = idx.routed.filter(col("rn") === 2)
    // (a) within-cluster kNN edges over the bounded per-cluster frames.
    // Vectors attach to the n-row HOME table BEFORE the self-join, so
    // the one shuffle is cluster-keyed over n rows and the n^1.5 pair
    // stream is born with both vectors in place — the r19 soak caught
    // the original shape (pair first, then two equi-joins hauling the
    // 64-dim vectors onto the exploded stream) going superlinear at
    // x30, exactly the join-order mistake the 100 TB bar forbids.
    val homeV = home.select(col("vec_id"), col("cell"), col("fid"))
      .join(emb, "vec_id")
    val pairs = homeV.select(col("vec_id").as("src"), col("cell"),
        col("fid"), col("vec").as("sv"))
      .join(homeV.select(col("vec_id").as("dst"), col("cell"), col("fid"),
        col("vec").as("dv")), Seq("cell", "fid"))
      .filter(col("src") =!= col("dst"))
      .withColumn("c6", RelationalQueries.rnd(cosine(col("sv"), col("dv")), 6))
    val wN = Window.partitionBy("src").orderBy(col("c6").desc, col("dst"))
    val nbEdges = pairs.withColumn("nrn", row_number().over(wN))
      .filter(col("nrn") <= GraphM).select("src", "dst")
    // (b) cross-cluster shortcut: second-home cluster's entry point
    val crossEdges = second.join(idx.entries, Seq("cell", "fid"))
      .filter(col("entry") =!= col("vec_id"))
      .select(col("vec_id").as("src"), col("entry").as("dst"))
    // symmetrize (the NSG/HNSW discipline): a vector close to few
    // others can still be SOMEONE's top neighbor — without the
    // reverse edges such nodes are unreachable and the walk stalls
    // (measured: the planted twin of one sf0.001 query escaped a
    // directed-only graph)
    val directed = nbEdges.unionByName(crossEdges)
    directed
      .unionByName(directed.select(col("dst").as("src"),
        col("src").as("dst")))
      .distinct().materialize
  }

  private def hierSeeds(qs: DataFrame, idx: HierIndex): DataFrame = {
    val pc = qs.crossJoin(broadcast(idx.coarse.select(
        col("cl_id").as("cell"), col("cvec"))))
      .withColumn("c6", RelationalQueries.rnd(
        cosine(col("q_vec"), col("cvec")), 6))
    val wPc = Window.partitionBy("q_id").orderBy(col("c6").desc, col("cell"))
    val probedCells = pc.withColumn("prn", row_number().over(wPc))
      .filter(col("prn") <= 2).select("q_id", "q_vec", "cell")
    val pf = probedCells.join(idx.fine, "cell")
      .withColumn("f6", RelationalQueries.rnd(
        cosine(col("q_vec"), col("fvec")), 6))
    val wPf = Window.partitionBy("q_id")
      .orderBy(col("f6").desc, col("cell"), col("fid"))
    pf.withColumn("frn", row_number().over(wPf))
      .filter(col("frn") <= GraphSeedF)
      .join(idx.entries, Seq("cell", "fid"))
      .select(col("q_id"), col("entry").as("vec_id"))
      .distinct()
      .materialize
  }

  private def beamTopK(qs: DataFrame, emb: DataFrame, edges: DataFrame,
      seeds: DataFrame): DataFrame = {
    var beam = seeds
    for (_ <- 1 to GraphRounds) {
      val expanded = beam.join(edges, beam("vec_id") === edges("src"))
        .select(col("q_id"), col("dst").as("vec_id"))
      val cand = beam.unionByName(expanded).distinct()
      val scored = cand
        .join(emb, "vec_id")
        .join(broadcast(qs), "q_id")
        .withColumn("c6", RelationalQueries.rnd(
          cosine(col("q_vec"), col("vec")), 6))
      val wB = Window.partitionBy("q_id")
        .orderBy(col("c6").desc, col("vec_id"))
      beam = scored.withColumn("brn", row_number().over(wB))
        .filter(col("brn") <= GraphB).select("q_id", "vec_id")
        .materialize
    }
    // final answer: beam minus the query itself, top-K re-rank
    val finScored = beam.filter(col("vec_id") =!= col("q_id"))
      .join(emb, "vec_id")
      .join(broadcast(qs), "q_id")
      .withColumn("c6", RelationalQueries.rnd(
        cosine(col("q_vec"), col("vec")), 6))
    val wF = Window.partitionBy("q_id").orderBy(col("c6").desc, col("vec_id"))
    finScored.withColumn("arn", row_number().over(wF))
      .filter(col("arn") <= GraphK).select("q_id", "vec_id")
  }

  private def bruteTruth(qs: DataFrame, emb: DataFrame): DataFrame = {
    val truthScored = emb
      .join(broadcast(qs), col("q_id") =!= col("vec_id"))
      .withColumn("c6", RelationalQueries.rnd(
        cosine(col("q_vec"), col("vec")), 6))
    val wT = Window.partitionBy("q_id").orderBy(col("c6").desc, col("vec_id"))
    truthScored.withColumn("trn", row_number().over(wT))
      .filter(col("trn") <= GraphK).select(col("q_id"), col("vec_id"))
      .materialize
  }

  /** Shared DuckDB replica of the hierarchical two-level k-means build
    * — coarse md5-seeded Lloyd round, routed cells, per-cell md5-seeded
    * fine round, routed final assignment — parameterized by the name of
    * an in-scope (vec_id, vec) corpus CTE and interpolated
    * (margin-carrying) into BOTH the s24 demo oracle and the d13
    * SemDeDup oracle, so the certified build and its production
    * consumer replicate the SAME SQL by construction, mirroring the
    * Spark-side lloyd/lloydGrouped sharing. Yields the kk/kcq/kfq
    * scalars (k=⌈√n⌉, kc=⌈√k⌉, kf=⌈k/kc⌉) and
    * fin(vec_id, cell, fid, csim) — 1 coarse + 1 fine round, the
    * shipped configuration. */
  private def hierBuildCteSql(c: String, p: String = ""): String =
    s"""${p}kk AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS k FROM $c),
      | ${p}kcq AS (SELECT CAST(ceil(sqrt(k)) AS BIGINT) AS kc FROM ${p}kk),
      | ${p}kfq AS (SELECT CAST(ceil(CAST(k AS DOUBLE) / kc) AS BIGINT) AS kf
      |         FROM ${p}kk, ${p}kcq),
      | ${p}sd AS (SELECT vec,
      |          row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)))
      |            AS rn
      |        FROM $c),
      | ${p}c0 AS (SELECT rn AS cl_id, vec AS cvec FROM ${p}sd
      |        WHERE rn <= (SELECT kc FROM ${p}kcq)),
      | ${p}s1 AS (SELECT t.vec_id, q.cl_id, t.vec,
      |          floor(list_cosine_similarity(t.vec, q.cvec)*1000000+0.5)
      |            /1000000 AS csim
      |        FROM $c t CROSS JOIN ${p}c0 q),
      | ${p}a1 AS (SELECT vec_id, cl_id, vec FROM (
      |          SELECT vec_id, cl_id, vec, row_number()
      |            OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
      |          FROM ${p}s1) WHERE rn = 1),
      | ${p}x1 AS (SELECT cl_id, unnest(vec) AS v,
      |               generate_subscripts(vec, 1) AS i FROM ${p}a1),
      | ${p}m1 AS (SELECT cl_id, i, floor(avg(v)*1000000+0.5)/1000000 AS m
      |        FROM ${p}x1 GROUP BY cl_id, i),
      | ${p}c1 AS (SELECT cl_id, list(m ORDER BY i) AS cvec FROM ${p}m1
      |        GROUP BY cl_id),
      | ${p}s2 AS (SELECT t.vec_id, q.cl_id, t.vec,
      |          floor(list_cosine_similarity(t.vec, q.cvec)*1000000+0.5)
      |            /1000000 AS csim
      |        FROM $c t CROSS JOIN ${p}c1 q),
      | ${p}cel AS (SELECT vec_id, cl_id AS cell, vec FROM (
      |          SELECT vec_id, cl_id, vec, row_number()
      |            OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
      |          FROM ${p}s2) WHERE rn = 1),
      | ${p}fsd AS (SELECT cell, vec, row_number()
      |           OVER (PARTITION BY cell
      |                 ORDER BY md5(CAST(vec_id AS VARCHAR))) AS fid
      |         FROM ${p}cel),
      | ${p}f0 AS (SELECT cell, fid, vec AS fvec FROM ${p}fsd
      |        WHERE fid <= (SELECT kf FROM ${p}kfq)),
      | ${p}fs1 AS (SELECT g.vec_id, g.cell, f.fid, g.vec,
      |           floor(list_cosine_similarity(g.vec, f.fvec)*1000000+0.5)
      |             /1000000 AS csim
      |         FROM ${p}cel g JOIN ${p}f0 f ON g.cell = f.cell),
      | ${p}fa1 AS (SELECT vec_id, cell, fid, vec FROM (
      |           SELECT vec_id, cell, fid, vec, row_number()
      |             OVER (PARTITION BY vec_id ORDER BY csim DESC, fid) AS rn
      |           FROM ${p}fs1) WHERE rn = 1),
      | ${p}fx1 AS (SELECT cell, fid, unnest(vec) AS v,
      |                generate_subscripts(vec, 1) AS i FROM ${p}fa1),
      | ${p}fm1 AS (SELECT cell, fid, i, floor(avg(v)*1000000+0.5)/1000000 AS m
      |         FROM ${p}fx1 GROUP BY cell, fid, i),
      | ${p}f1 AS (SELECT cell, fid, list(m ORDER BY i) AS fvec FROM ${p}fm1
      |        GROUP BY cell, fid),
      | ${p}fs2 AS (SELECT g.vec_id, g.cell, f.fid,
      |           floor(list_cosine_similarity(g.vec, f.fvec)*1000000+0.5)
      |             /1000000 AS csim
      |         FROM ${p}cel g JOIN ${p}f1 f ON g.cell = f.cell),
      | ${p}fin AS (SELECT vec_id, cell, fid, csim FROM (
      |           SELECT vec_id, cell, fid, csim, row_number()
      |             OVER (PARTITION BY vec_id ORDER BY csim DESC, fid) AS rn
      |           FROM ${p}fs2) WHERE rn = 1)""".stripMargin

  private def c6Sql(x: String) = s"floor(($x)*1000000+0.5)/1000000"

  /** Graph-build replica over a prefix-`p` [[hierBuildCteSql]] chain:
    * rank-2 routing, per-cluster entry points, within-cluster
    * top-[[GraphM]] kNN edges, cross-cluster shortcuts, symmetrized
    * edge set — emits ${p}rt2 / ${p}ent / ${p}nb / ${p}xe / ${p}dr /
    * ${p}ed over corpus CTE `c`. ONE generator shared by the s27 and
    * s28 oracles (and s28 instantiates it twice), so the replicas can
    * never desynchronize on the graph rule. */
  private def graphCteSql(c: String, p: String): String =
    s"""${p}rt2 AS (SELECT vec_id, cell, fid FROM (
      |    SELECT vec_id, cell, fid, row_number()
      |      OVER (PARTITION BY vec_id ORDER BY csim DESC, fid) AS rn
      |    FROM ${p}fs2) WHERE rn = 2),
      | ${p}ent AS (SELECT cell, fid, vec_id AS entry FROM (
      |    SELECT cell, fid, vec_id, row_number()
      |      OVER (PARTITION BY cell, fid ORDER BY csim DESC, vec_id) AS rn
      |    FROM ${p}fin) WHERE rn = 1),
      | ${p}nb AS (SELECT src, dst FROM (
      |    SELECT a.vec_id AS src, b.vec_id AS dst, row_number()
      |      OVER (PARTITION BY a.vec_id
      |            ORDER BY ${c6Sql("list_cosine_similarity(ea.vec, eb.vec)")} DESC,
      |                     b.vec_id) AS rn
      |    FROM ${p}fin a JOIN ${p}fin b ON a.cell = b.cell AND a.fid = b.fid
      |         AND a.vec_id <> b.vec_id
      |    JOIN $c ea ON ea.vec_id = a.vec_id
      |    JOIN $c eb ON eb.vec_id = b.vec_id) WHERE rn <= $GraphM),
      | ${p}xe AS (SELECT r2.vec_id AS src, ent.entry AS dst
      |        FROM ${p}rt2 r2 JOIN ${p}ent ent
      |          ON ent.cell = r2.cell AND ent.fid = r2.fid
      |        WHERE ent.entry <> r2.vec_id),
      | ${p}dr AS (SELECT src, dst FROM ${p}nb
      |        UNION ALL SELECT src, dst FROM ${p}xe),
      | ${p}ed AS (SELECT src, dst FROM ${p}dr
      |        UNION SELECT dst AS src, src AS dst FROM ${p}dr)""".stripMargin

  /** Seeding + unrolled beam + final top-K replica: hierarchy descent
    * over the prefix-`hp` centroids (nprobe=2 coarse, [[GraphSeedF]]
    * fine) to entry CTE `entCte`, [[GraphRounds]] expansions against
    * edge CTE `edCte` scored on corpus `c` for query CTE `q` — emits
    * ${p}pc / ${p}pf / ${p}fr0 / ${p}ex{r} / ${p}fr{r} / ${p}appr.
    * Separate `entCte`/`edCte` params are what let s28's maintained
    * path seed from the FROZEN base hierarchy while walking the
    * maintained edge set. */
  private def seedBeamCteSql(c: String, hp: String, entCte: String,
      edCte: String, p: String): String = {
    val beamRounds = (1 to GraphRounds).map { r =>
      val pr = r - 1
      s"""${p}ex$r AS (
         |  SELECT f.q_id, ed.dst AS vec_id
         |  FROM ${p}fr$pr f JOIN $edCte ed ON ed.src = f.vec_id
         |  UNION
         |  SELECT q_id, vec_id FROM ${p}fr$pr),
         | ${p}fr$r AS (SELECT q_id, vec_id FROM (
         |    SELECT c.q_id, c.vec_id, row_number() OVER (PARTITION BY c.q_id
         |        ORDER BY ${c6Sql("list_cosine_similarity(q.q_vec, e2.vec)")} DESC,
         |                 c.vec_id) AS rn
         |    FROM ${p}ex$r c JOIN $c e2 ON e2.vec_id = c.vec_id
         |         JOIN q ON q.q_id = c.q_id) WHERE rn <= $GraphB)""".stripMargin
    }
    s"""${p}pc AS (SELECT q_id, cell FROM (
      |    SELECT q.q_id, c.cl_id AS cell, row_number()
      |      OVER (PARTITION BY q.q_id
      |            ORDER BY ${c6Sql("list_cosine_similarity(q.q_vec, c.cvec)")} DESC,
      |                     c.cl_id) AS rn
      |    FROM q CROSS JOIN ${hp}c1 c) WHERE rn <= 2),
      | ${p}pf AS (SELECT q_id, cell, fid FROM (
      |    SELECT pc.q_id, f.cell, f.fid, row_number()
      |      OVER (PARTITION BY pc.q_id
      |            ORDER BY ${c6Sql("list_cosine_similarity(q.q_vec, f.fvec)")} DESC,
      |                     f.cell, f.fid) AS rn
      |    FROM ${p}pc pc JOIN ${hp}f1 f ON f.cell = pc.cell
      |         JOIN q ON q.q_id = pc.q_id) WHERE rn <= $GraphSeedF),
      | ${p}fr0 AS (SELECT DISTINCT pf.q_id, ent.entry AS vec_id
      |         FROM ${p}pf pf JOIN $entCte ent
      |           ON ent.cell = pf.cell AND ent.fid = pf.fid),
      | ${beamRounds.mkString(",\n ")},
      | ${p}appr AS (SELECT q_id, vec_id FROM (
      |    SELECT c.q_id, c.vec_id, row_number() OVER (PARTITION BY c.q_id
      |        ORDER BY ${c6Sql("list_cosine_similarity(q.q_vec, e2.vec)")} DESC,
      |                 c.vec_id) AS rn
      |    FROM ${p}fr$GraphRounds c JOIN $c e2 ON e2.vec_id = c.vec_id
      |         JOIN q ON q.q_id = c.q_id
      |    WHERE c.vec_id <> c.q_id) WHERE rn <= $GraphK)""".stripMargin
  }

  /** Shared DuckDB replica of the IVF-PQ ADC pipeline (corpus,
    * rnd6 centroids, assignment, residuals, md5-seeded codebook,
    * subspace encode, probes, integer LUT, ADC `scored`) —
    * interpolated (already margin-free) into the s11 and s18 oracles
    * so the index replica and the recall audit's replica are the same
    * SQL by construction, mirroring the Spark-side [[pqAdcScored]]
    * sharing. */
  private val PqAdcCteSql =
    """e AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
      | cex AS (SELECT label AS cl_id, unnest(vec) AS v,
      |                generate_subscripts(vec, 1) AS i FROM e),
      | cel AS (SELECT cl_id, i, floor((avg(v))*1000000+0.5)/1000000 AS m
      |         FROM cex GROUP BY cl_id, i),
      | cen AS (SELECT cl_id, list(m ORDER BY i) AS cvec FROM cel GROUP BY cl_id),
      | sims AS (
      |  SELECT e.vec_id, cen.cl_id,
      |    floor((list_cosine_similarity(e.vec, cen.cvec))*1000000+0.5)/1000000
      |      AS csim
      |  FROM e CROSS JOIN cen),
      | assign AS (
      |  SELECT vec_id, cl_id FROM (
      |    SELECT vec_id, cl_id, row_number()
      |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
      |    FROM sims) WHERE rn = 1),
      | resid AS (
      |  SELECT e.vec_id, a.cl_id,
      |    list_transform(range(1, 65), i -> e.vec[i] - c.cvec[i]) AS rvec
      |  FROM e JOIN assign a ON a.vec_id = e.vec_id
      |         JOIN cen c ON c.cl_id = a.cl_id),
      | sd AS (SELECT rvec, row_number()
      |          OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS code
      |        FROM resid),
      | sp AS (SELECT unnest(range(0, 8)) AS sp),
      | cb AS (SELECT sp.sp, code,
      |          list_slice(rvec, sp.sp * 8 + 1, sp.sp * 8 + 8) AS cvec
      |        FROM sd CROSS JOIN sp WHERE code <= 16),
      | sb AS (SELECT vec_id, cl_id, sp.sp,
      |          list_slice(rvec, sp.sp * 8 + 1, sp.sp * 8 + 8) AS sub
      |        FROM resid CROSS JOIN sp),
      | sc AS (SELECT vec_id, cl_id, sb.sp, code,
      |          floor(list_inner_product(
      |            list_transform(range(1, 9), i -> sub[i] - cvec[i]),
      |            list_transform(range(1, 9), i -> sub[i] - cvec[i]))
      |            *1000000+0.5)/1000000 AS dist2
      |        FROM sb JOIN cb ON sb.sp = cb.sp),
      | enc AS (SELECT vec_id, cl_id, sp, code FROM (
      |          SELECT *, row_number()
      |            OVER (PARTITION BY vec_id, sp ORDER BY dist2, code) AS rn
      |          FROM sc) WHERE rn = 1),
      | probes AS (
      |  SELECT vec_id AS q_id, cl_id FROM (
      |    SELECT vec_id, cl_id, row_number()
      |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
      |    FROM sims WHERE vec_id < 3) WHERE rn <= 3),
      | qresid AS (
      |  SELECT p.q_id, p.cl_id,
      |    list_transform(range(1, 65), i -> e.vec[i] - c.cvec[i]) AS qrvec
      |  FROM probes p JOIN e ON e.vec_id = p.q_id
      |                JOIN cen c ON c.cl_id = p.cl_id),
      | lut AS (
      |  SELECT q.q_id, q.cl_id, sp.sp, cb.code,
      |    CAST(floor(floor(list_inner_product(
      |      list_transform(range(1, 9),
      |        i -> list_slice(qrvec, sp.sp * 8 + 1, sp.sp * 8 + 8)[i] - cvec[i]),
      |      list_transform(range(1, 9),
      |        i -> list_slice(qrvec, sp.sp * 8 + 1, sp.sp * 8 + 8)[i] - cvec[i]))
      |      *1000000+0.5)/1000000*1000000+0.5) AS BIGINT) AS d_e6
      |  FROM qresid q CROSS JOIN sp JOIN cb ON cb.sp = sp.sp),
      | scored AS (
      |  SELECT p.q_id, en.vec_id,
      |    CAST(sum(l.d_e6) AS BIGINT) AS adc_e6
      |  FROM enc en
      |  JOIN probes p ON p.cl_id = en.cl_id AND p.q_id <> en.vec_id
      |  JOIN lut l ON l.q_id = p.q_id AND l.cl_id = en.cl_id
      |            AND l.sp = en.sp AND l.code = en.code
      |  GROUP BY p.q_id, en.vec_id)""".stripMargin

  /** Shared DuckDB replica of the binary-quantization pipeline (sign
    * signatures, hamming ranking, C=50 hrn-ranked shortlist, rnd6
    * rerank `rr`, brute `truth`) — interpolated into the s22 and s23
    * oracles so the index replica and the sweep's replica are the same
    * SQL by construction, mirroring the Spark-side [[bqShortlist]]
    * sharing. */
  private val BqCteSql =
    """e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
      | sig AS (
      |  SELECT vec_id,
      |   CAST(list_sum(list_transform(range(1,17),
      |     i -> CASE WHEN vec[i] > 0 THEN (1::BIGINT << (i-1)) ELSE 0 END)) AS BIGINT) AS g0,
      |   CAST(list_sum(list_transform(range(1,17),
      |     i -> CASE WHEN vec[16+i] > 0 THEN (1::BIGINT << (i-1)) ELSE 0 END)) AS BIGINT) AS g1,
      |   CAST(list_sum(list_transform(range(1,17),
      |     i -> CASE WHEN vec[32+i] > 0 THEN (1::BIGINT << (i-1)) ELSE 0 END)) AS BIGINT) AS g2,
      |   CAST(list_sum(list_transform(range(1,17),
      |     i -> CASE WHEN vec[48+i] > 0 THEN (1::BIGINT << (i-1)) ELSE 0 END)) AS BIGINT) AS g3
      |  FROM e),
      | q AS (SELECT vec_id AS q_id, g0 AS q0, g1 AS q1, g2 AS q2, g3 AS q3
      |       FROM sig WHERE vec_id < 3),
      | hm AS (
      |  SELECT q.q_id, s.vec_id,
      |    bit_count(xor(s.g0, q.q0)) + bit_count(xor(s.g1, q.q1)) +
      |    bit_count(xor(s.g2, q.q2)) + bit_count(xor(s.g3, q.q3)) AS ham
      |  FROM sig s CROSS JOIN q WHERE s.vec_id <> q.q_id),
      | shortall AS (
      |  SELECT q_id, vec_id, ham,
      |    row_number() OVER (PARTITION BY q_id ORDER BY ham, vec_id) AS hrn
      |  FROM hm),
      | qv AS (SELECT vec_id AS q_id, vec AS q_vec FROM e WHERE vec_id < 3),
      | rr AS (
      |  SELECT sh.q_id, sh.vec_id, sh.ham, sh.hrn,
      |    floor((list_cosine_similarity(qv.q_vec, e.vec))*1000000+0.5)/1000000 AS c6
      |  FROM (SELECT * FROM shortall WHERE hrn <= 50) sh
      |  JOIN e ON e.vec_id = sh.vec_id
      |  JOIN qv ON qv.q_id = sh.q_id),
      | ts AS (
      |  SELECT qv.q_id, e.vec_id,
      |    floor((list_cosine_similarity(qv.q_vec, e.vec))*1000000+0.5)/1000000 AS c6
      |  FROM e CROSS JOIN qv WHERE e.vec_id <> qv.q_id),
      | truth AS (SELECT q_id, vec_id FROM (
      |    SELECT q_id, vec_id, row_number()
      |      OVER (PARTITION BY q_id ORDER BY c6 DESC, vec_id) AS trn
      |    FROM ts) WHERE trn <= 10)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // s26: full replica — gate-derived ±1 signs and the gated +0.25
    // shift, integerized coordinate/window-dot projections, the
    // t38-style flat-window KS per projection, crit flag, planted
    // expectation map, max-over-projections witness. Every projection
    // is an exact integer, so the whole multivariate audit hashes.
    "s26_embed_drift" ->
      s"""WITH sg AS (SELECT p, i,
        |    CASE WHEN (${graft.operators.Sampling.portableGateSql(
             "'eproj:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)")})
        |      % 2 = 1 THEN 1 ELSE -1 END AS sgn
        |  FROM range(4) ps(p), range(16) js(i)),
        |e AS (SELECT vec_id, embedding,
        |    (${graft.operators.Sampling.portableGateSql(
             "'edrift:' || CAST(vec_id AS VARCHAR)")}) % 5 = 0 AS gated
        |  FROM embeddings),
        |cx AS (SELECT vec_id, gated, CAST(ix.i AS INT) AS idx,
        |    CAST(embedding[CAST(ix.i + 1 AS INT)] AS DOUBLE) AS xd
        |  FROM e, range(64) ix(i)),
        |c6 AS (SELECT vec_id, idx,
        |    CAST(floor(xd*1e6+0.5) AS BIGINT) AS a6,
        |    CAST(floor((CASE WHEN gated AND idx < 16 THEN xd + 0.25
        |      ELSE xd END)*1e6+0.5) AS BIGINT) AS b6
        |  FROM cx),
        |cidx(proj, cix) AS (VALUES (0, 0), (1, 5), (2, 32), (3, 47)),
        |rc AS (
        |  SELECT proj, 0 AS s, a6 AS pval FROM c6
        |    JOIN cidx ON cidx.cix = c6.idx
        |  UNION ALL
        |  SELECT proj, 1 AS s, b6 AS pval FROM c6
        |    JOIN cidx ON cidx.cix = c6.idx),
        |rd AS (
        |  SELECT 4 + sg.p AS proj, 0 AS s, c6.vec_id,
        |      sum(sg.sgn * c6.a6) AS pval
        |  FROM c6 JOIN sg
        |    ON c6.idx = sg.i + CASE WHEN sg.p < 2 THEN 0 ELSE 32 END
        |  GROUP BY 1, 2, 3
        |  UNION ALL
        |  SELECT 4 + sg.p AS proj, 1 AS s, c6.vec_id,
        |      sum(sg.sgn * c6.b6) AS pval
        |  FROM c6 JOIN sg
        |    ON c6.idx = sg.i + CASE WHEN sg.p < 2 THEN 0 ELSE 32 END
        |  GROUP BY 1, 2, 3),
        |allr AS (SELECT proj, s, pval FROM rc
        |  UNION ALL SELECT proj, s, pval FROM rd),
        |cen AS (SELECT proj AS g, CAST(pval AS DOUBLE) AS v,
        |    sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
        |  FROM allr GROUP BY 1, 2),
        |st AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM cen GROUP BY g),
        |cc AS (SELECT g, v,
        |    sum(ca) OVER (PARTITION BY g ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY g ORDER BY v) AS cumb FROM cen),
        |dd AS (SELECT cc.g, v,
        |    abs(CAST(cuma AS HUGEINT)*nb - CAST(cumb AS HUGEINT)*na)
        |      AS dev, na, nb
        |  FROM cc JOIN st ON st.g = cc.g),
        |m AS (SELECT g, min(na) AS na, min(nb) AS nb, max(dev) AS dmax
        |  FROM dd GROUP BY g),
        |aw AS (SELECT dd.g, CAST(min(v) AS BIGINT) AS ks_value
        |  FROM dd JOIN m ON m.g = dd.g AND dd.dev = m.dmax GROUP BY dd.g),
        |f AS (SELECT m.g, na, nb, ks_value,
        |    floor(CAST(dmax AS DOUBLE)
        |      /(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))*1e6+0.5)/1e6 AS ks,
        |    CAST(dmax AS DOUBLE)/(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))
        |      > 1.358*sqrt((CAST(na AS DOUBLE)+CAST(nb AS DOUBLE))
        |        /(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))) AS drifted
        |  FROM m JOIN aw ON aw.g = m.g),
        |ex(proj, expect_drift) AS (VALUES (0, true), (1, true),
        |  (2, false), (3, false), (4, true), (5, true),
        |  (6, false), (7, false))
        |SELECT f.g AS proj, na AS n_a, nb AS n_b, ks, ks_value, drifted,
        |  ex.expect_drift,
        |  f.g = (SELECT min(g) FROM f f2
        |         WHERE f2.ks = (SELECT max(ks) FROM f)) AS is_max
        |FROM f JOIN ex ON ex.proj = f.g ORDER BY proj""".stripMargin,

    // d05/s02's hyperplane constants aren't portable to SQL → rows-only.
    // d07 closes the gap for d05: the same Spark pipeline runs on a
    // planted-duplicate corpus whose ground-truth pair counts DuckDB
    // brute-forces here (all pairs, exact cosine — no LSH involved).
    "d07_embed_planted" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec
        |              FROM embeddings WHERE vec_id < 100),
        | pl AS (SELECT vec_id + 100000 AS vec_id,
        |          list_transform(vec, x -> x * 1.001) AS vec
        |        FROM base),
        | c AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
        | p AS (
        |  SELECT list_cosine_similarity(a.vec, b.vec) AS cos
        |  FROM c a JOIN c b ON a.vec_id < b.vec_id)
        |SELECT (SELECT count(*) FROM c) AS n_vecs,
        | (SELECT count(*) FROM pl) AS n_planted,
        | CAST(sum(CASE WHEN cos >= 0.999 THEN 1 ELSE 0 END) AS BIGINT) AS n_neardups,
        | floor((max(cos))*10000+0.5)/10000 AS max_cos
        |FROM p""".stripMargin,

    // d13: full pipeline replica of the faithful SemDeDup composition —
    // planting, k = ⌈√n⌉ sizing, md5 seeding order, BOTH Lloyd rounds
    // (assign + rnd6 recenter, the s07 unroll), final nearest-centroid
    // assignment (same rounding + tie-break as s04's replica), the
    // sign-salt cap-split (census, nsub, sub — cap interpolated from
    // SemDedupCap so tuning can't desynchronize), within-(cluster, sub)
    // exact-cosine pairs, keep-lowest-id drop.
    "d13_semantic_dedup" ->
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec
        |              FROM embeddings WHERE vec_id < 200),
        | sel AS (SELECT * FROM base WHERE vec_id % 10 = 0),
        | pl AS (SELECT vec_id + 100000 AS vec_id,
        |          list_transform(vec, x -> x * 1.001) AS vec
        |        FROM sel),
        | c AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
        | cr AS (SELECT min(vec_id) AS vec_id, vec, count(*) AS gsize
        |        FROM c GROUP BY vec),
        | crv AS (SELECT vec_id, vec FROM cr),
        | ${hierBuildCteSql("crv")},
        | assign AS (
        |  SELECT vec_id,
        |         cell * ((SELECT kf FROM kfq) + 1) + fid AS cl_id
        |  FROM fin),
        | wc AS (SELECT crv.vec_id, a.cl_id, crv.vec,
        |          ${graft.operators.CentroidBuild.signSaltSql("crv.vec")} AS salt
        |        FROM crv JOIN assign a USING (vec_id)),
        | sz AS (SELECT cl_id, count(*) AS bn FROM wc GROUP BY cl_id),
        | wcs AS (
        |  SELECT wc.*, salt % CAST((bn + ${SemDedupCap - 1}) // $SemDedupCap
        |                           AS INTEGER) AS sub
        |  FROM wc JOIN sz USING (cl_id)),
        | dup AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_cosine_similarity(a.vec, b.vec) AS cos
        |  FROM wcs a JOIN wcs b
        |    ON a.cl_id = b.cl_id AND a.sub = b.sub AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.vec, b.vec) >= 0.999)
        |SELECT (SELECT count(*) FROM c) AS n_vecs,
        | (SELECT count(*) FROM pl) AS n_planted,
        | (SELECT count(*) FROM c) - (SELECT count(*) FROM cr)
        |   + (SELECT count(DISTINCT id_b) FROM dup) AS n_dropped,
        | (SELECT count(*) FROM cr) - (SELECT count(DISTINCT id_b) FROM dup)
        |   AS n_survivors,
        | (SELECT count(DISTINCT cl_id) FROM assign) AS n_clusters,
        | (SELECT floor(greatest(
        |     coalesce((SELECT max(cos) FROM dup), -1.0),
        |     coalesce((SELECT CASE WHEN max(gsize) >= 2 THEN 1.0 END
        |               FROM cr), -1.0))*10000+0.5)/10000)
        |   AS max_dup_cos""".stripMargin,

    // s05: DuckDB brute-forces the TRUE rank-1 neighbor over the same
    // augmented corpus — no LSH replica needed, because the planted
    // copy is both the true nearest neighbor (cos≈1 vs organic ~0.48)
    // and recalled by the Spark pipeline (positive scaling preserves
    // hyperplane signs up to float stability of near-zero projections
    // ⇒ same bucket in every table on these corpora).
    "s05_ann_planted" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        | pl AS (SELECT vec_id + 100000 AS vec_id,
        |          list_transform(vec, x -> x * 1.001) AS vec
        |        FROM base WHERE vec_id < 3),
        | c AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
        | q AS (SELECT vec_id AS q_id, vec AS q_vec FROM base WHERE vec_id < 3),
        | scored AS (
        |  SELECT q.q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.q_vec, c.vec) AS cos
        |  FROM c CROSS JOIN q WHERE c.vec_id <> q.q_id),
        | ranked AS (
        |  SELECT q_id, n_id, cos, row_number()
        |    OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id,
        | floor((cos)*10000+0.5)/10000 AS cos_sim
        |FROM ranked WHERE rank <= 1 ORDER BY q_id, rank""".stripMargin,

    // s02: the ENTIRE portable LSH pipeline replicates — 4 axis-sign
    // tables over disjoint dim slices, bucket-join candidates, dedup,
    // raw-cosine scoring (the s01 rank discipline: ascending-index
    // kernels are bit-identical cross-engine), top-5 per query.
    "s02_ann_lsh" -> {
      val buckets = (0 until LshTables).map(t =>
        s"SELECT vec_id, $t AS tbl, ${signPatternSql("vec", t)} AS bucket " +
          "FROM e").mkString("\n|   UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec
        |           FROM embeddings),
        | bk AS (
        |   $buckets),
        | qb AS (SELECT vec_id AS q_id, tbl, bucket FROM bk
        |        WHERE vec_id < 3),
        | cand AS (SELECT DISTINCT qb.q_id, bk.vec_id
        |          FROM bk JOIN qb
        |            ON bk.tbl = qb.tbl AND bk.bucket = qb.bucket
        |          WHERE bk.vec_id <> qb.q_id),
        | scored AS (
        |  SELECT c.q_id, c.vec_id,
        |    list_cosine_similarity(q.vec, e.vec) AS cos
        |  FROM cand c
        |  JOIN e q ON q.vec_id = c.q_id
        |  JOIN e ON e.vec_id = c.vec_id),
        | ranked AS (
        |  SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id)
        |      AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, vec_id AS n_id,
        | floor((cos)*10000+0.5)/10000 AS cos_sim
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
    },

    // d05: the all-pairs-within-buckets mirror of the s02 replica —
    // same 4 axis-sign tables, pair dedup, exact-cosine verify,
    // threshold census.
    "d05_embed_neardup" -> {
      val buckets = (0 until LshTables).map(t =>
        s"SELECT vec_id, $t AS tbl, ${signPatternSql("vec", t)} AS bucket " +
          "FROM e").mkString("\n|   UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec
        |           FROM embeddings),
        | bk AS (
        |   $buckets),
        | cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |          FROM bk a JOIN bk b
        |            ON a.tbl = b.tbl AND a.bucket = b.bucket
        |               AND a.vec_id < b.vec_id),
        | pr AS (SELECT id_a, id_b,
        |          list_cosine_similarity(x.vec, y.vec) AS cos
        |        FROM cand
        |        JOIN e x ON x.vec_id = cand.id_a
        |        JOIN e y ON y.vec_id = cand.id_b)
        |SELECT count(*) AS n_candidate_pairs,
        | CAST(sum(CASE WHEN cos >= 0.95 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_neardups_095,
        | CAST(sum(CASE WHEN cos >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_neardups_08,
        | floor(coalesce(max(cos), -1.0)*10000+0.5)/10000 AS max_cos
        |FROM pr""".stripMargin
    },

    // s25: the same rnd6 shortlist both engines agree on, then the
    // label-cap and final re-rank replicate as the identical two
    // row_number windows.
    "s25_diverse_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
        |           FROM embeddings WHERE vec_id < 3),
        | scored AS (
        |  SELECT q.q_id, e.vec_id AS n_id, e.label,
        |    floor(list_cosine_similarity(q.q_vec, e.embedding::DOUBLE[])
        |          *1000000+0.5)/1000000 AS c6
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        | sl AS (SELECT * FROM (
        |    SELECT q_id, n_id, label, c6, row_number()
        |      OVER (PARTITION BY q_id ORDER BY c6 DESC, n_id) AS rn
        |    FROM scored) WHERE rn <= 20),
        | capped AS (SELECT * FROM (
        |    SELECT q_id, n_id, label, c6, rn, row_number()
        |      OVER (PARTITION BY q_id, label ORDER BY rn) AS lr
        |    FROM sl) WHERE lr <= 1),
        | fin AS (SELECT q_id, n_id, label, c6, row_number()
        |           OVER (PARTITION BY q_id ORDER BY rn) AS rank
        |         FROM capped)
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id, label,
        | floor(c6*10000+0.5)/10000 AS cos_sim
        |FROM fin WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "s01_knn_brute" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
        |           FROM embeddings WHERE vec_id < 3),
        | scored AS (
        |  SELECT q.q_id, e.vec_id AS n_id,
        |    list_cosine_similarity(q.q_vec, e.embedding::DOUBLE[]) AS cos
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        | ranked AS (
        |  SELECT q_id, n_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id,
        | floor((cos)*10000+0.5)/10000 AS cos_sim
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // Full replica of the IVF pipeline: same centroid rounding (6 dp),
    // same rounded assignment similarity, same nprobe=3 probe set —
    // this checks the approximate operator itself, not brute force.
    "s04_ivf_topk" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
        | cex AS (SELECT label AS cl_id, unnest(vec) AS v,
        |                generate_subscripts(vec, 1) AS i FROM e),
        | cel AS (SELECT cl_id, i, floor((avg(v))*1000000+0.5)/1000000 AS m
        |         FROM cex GROUP BY cl_id, i),
        | cen AS (SELECT cl_id, list(m ORDER BY i) AS cvec FROM cel GROUP BY cl_id),
        | sims AS (
        |  SELECT e.vec_id, cen.cl_id,
        |    floor((list_cosine_similarity(e.vec, cen.cvec))*1000000+0.5)/1000000
        |      AS csim
        |  FROM e CROSS JOIN cen),
        | assign AS (
        |  SELECT vec_id, cl_id FROM (
        |    SELECT vec_id, cl_id, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |    FROM sims) WHERE rn = 1),
        | probes AS (
        |  SELECT vec_id AS q_id, cl_id FROM (
        |    SELECT vec_id, cl_id, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |    FROM sims WHERE vec_id < 3) WHERE rn <= 3),
        | cand AS (
        |  SELECT p.q_id, a.vec_id FROM assign a JOIN probes p USING (cl_id)
        |  WHERE a.vec_id <> p.q_id),
        | scored AS (
        |  SELECT c.q_id, c.vec_id AS n_id,
        |    list_cosine_similarity(q.vec, n.vec) AS cos
        |  FROM cand c
        |  JOIN e q ON q.vec_id = c.q_id
        |  JOIN e n ON n.vec_id = c.vec_id),
        | ranked AS (
        |  SELECT q_id, n_id, cos, row_number()
        |    OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id,
        | floor((cos)*10000+0.5)/10000 AS cos_sim
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // s10: the full composed evaluation replicates — brute-force truth
    // (rnd6 rank key) + the s04 IVF pipeline + the recall join.
    "s10_ann_recall" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
        | q AS (SELECT vec_id AS q_id, vec AS q_vec FROM e WHERE vec_id < 3),
        | tscored AS (
        |  SELECT q.q_id, e.vec_id AS n_id,
        |    floor((list_cosine_similarity(q.q_vec, e.vec))*1000000+0.5)/1000000
        |      AS c6
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        | truth AS (SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id, row_number()
        |      OVER (PARTITION BY q_id ORDER BY c6 DESC, n_id) AS rn
        |    FROM tscored) WHERE rn <= 10),
        | cex AS (SELECT label AS cl_id, unnest(vec) AS v,
        |                generate_subscripts(vec, 1) AS i FROM e),
        | cel AS (SELECT cl_id, i, floor((avg(v))*1000000+0.5)/1000000 AS m
        |         FROM cex GROUP BY cl_id, i),
        | cen AS (SELECT cl_id, list(m ORDER BY i) AS cvec FROM cel GROUP BY cl_id),
        | sims AS (
        |  SELECT e.vec_id, cen.cl_id,
        |    floor((list_cosine_similarity(e.vec, cen.cvec))*1000000+0.5)/1000000
        |      AS csim
        |  FROM e CROSS JOIN cen),
        | assign AS (
        |  SELECT vec_id, cl_id FROM (
        |    SELECT vec_id, cl_id, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |    FROM sims) WHERE rn = 1),
        | probes AS (
        |  SELECT vec_id AS q_id, cl_id FROM (
        |    SELECT vec_id, cl_id, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |    FROM sims WHERE vec_id < 3) WHERE rn <= 3),
        | cand AS (
        |  SELECT p.q_id, a.vec_id FROM assign a JOIN probes p USING (cl_id)
        |  WHERE a.vec_id <> p.q_id),
        | ascored AS (
        |  SELECT c.q_id, c.vec_id AS n_id,
        |    floor((list_cosine_similarity(qe.vec, ne.vec))*1000000+0.5)/1000000
        |      AS c6
        |  FROM cand c
        |  JOIN e qe ON qe.vec_id = c.q_id
        |  JOIN e ne ON ne.vec_id = c.vec_id),
        | approx AS (SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id, row_number()
        |      OVER (PARTITION BY q_id ORDER BY c6 DESC, n_id) AS rn
        |    FROM ascored) WHERE rn <= 10),
        | hits AS (SELECT t.q_id, count(*) AS n_hit FROM truth t
        |          JOIN approx a ON a.q_id = t.q_id AND a.n_id = t.n_id
        |          GROUP BY 1)
        |SELECT t.q_id, count(*) AS n_truth,
        |  CAST(coalesce(max(h.n_hit), 0) AS BIGINT) AS n_hit,
        |  floor((CAST(coalesce(max(h.n_hit), 0) AS DOUBLE) / count(*))
        |        *10000+0.5)/10000 AS recall_at_k
        |FROM truth t LEFT JOIN hits h ON h.q_id = t.q_id
        |GROUP BY t.q_id ORDER BY t.q_id""".stripMargin,

    // s17: the s10 replica swept over nprobe ∈ {1,2,4} — shared truth/
    // assignment CTEs, one candidate/approx/hits branch per setting,
    // UNION ALL of the three curve segments.
    "s17_nprobe_sweep" -> {
      def branch(np: Int): String =
        s"""cand$np AS (
          |  SELECT p.q_id, a.vec_id FROM assign a
          |  JOIN (SELECT q_id, cl_id FROM pr WHERE rn <= $np) p USING (cl_id)
          |  WHERE a.vec_id <> p.q_id),
          | ncand$np AS (SELECT q_id, count(*) AS n_cand FROM cand$np GROUP BY 1),
          | ascored$np AS (
          |  SELECT c.q_id, c.vec_id AS n_id,
          |    floor((list_cosine_similarity(qe.vec, ne.vec))*1000000+0.5)/1000000
          |      AS c6
          |  FROM cand$np c
          |  JOIN e qe ON qe.vec_id = c.q_id
          |  JOIN e ne ON ne.vec_id = c.vec_id),
          | approx$np AS (SELECT q_id, n_id FROM (
          |    SELECT q_id, n_id, row_number()
          |      OVER (PARTITION BY q_id ORDER BY c6 DESC, n_id) AS rn
          |    FROM ascored$np) WHERE rn <= 10),
          | hits$np AS (SELECT t.q_id, count(*) AS n_hit FROM truth t
          |          JOIN approx$np a ON a.q_id = t.q_id AND a.n_id = t.vec_id
          |          GROUP BY 1)""".stripMargin
      def seg(np: Int): String =
        s"""SELECT $np AS nprobe, t.q_id,
          |  CAST(coalesce(max(n.n_cand), 0) AS BIGINT) AS n_cand,
          |  count(*) AS n_truth,
          |  CAST(coalesce(max(h.n_hit), 0) AS BIGINT) AS n_hit,
          |  floor((CAST(coalesce(max(h.n_hit), 0) AS DOUBLE) / count(*))
          |        *10000+0.5)/10000 AS recall_at_k
          |FROM truth t
          |LEFT JOIN ncand$np n ON n.q_id = t.q_id
          |LEFT JOIN hits$np h ON h.q_id = t.q_id
          |GROUP BY t.q_id""".stripMargin
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
        | q AS (SELECT vec_id AS q_id, vec AS q_vec FROM e WHERE vec_id < 3),
        | tscored AS (
        |  SELECT q.q_id, e.vec_id AS n_id,
        |    floor((list_cosine_similarity(q.q_vec, e.vec))*1000000+0.5)/1000000
        |      AS c6
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        | truth AS (SELECT q_id, n_id AS vec_id FROM (
        |    SELECT q_id, n_id, row_number()
        |      OVER (PARTITION BY q_id ORDER BY c6 DESC, n_id) AS rn
        |    FROM tscored) WHERE rn <= 10),
        | cex AS (SELECT label AS cl_id, unnest(vec) AS v,
        |                generate_subscripts(vec, 1) AS i FROM e),
        | cel AS (SELECT cl_id, i, floor((avg(v))*1000000+0.5)/1000000 AS m
        |         FROM cex GROUP BY cl_id, i),
        | cen AS (SELECT cl_id, list(m ORDER BY i) AS cvec FROM cel GROUP BY cl_id),
        | sims AS (
        |  SELECT e.vec_id, cen.cl_id,
        |    floor((list_cosine_similarity(e.vec, cen.cvec))*1000000+0.5)/1000000
        |      AS csim
        |  FROM e CROSS JOIN cen),
        | assign AS (
        |  SELECT vec_id, cl_id FROM (
        |    SELECT vec_id, cl_id, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |    FROM sims) WHERE rn = 1),
        | pr AS (
        |  SELECT vec_id AS q_id, cl_id, row_number()
        |    OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |  FROM sims WHERE vec_id < 3),
        | ${branch(1)},
        | ${branch(2)},
        | ${branch(4)}
        |${seg(1)}
        |UNION ALL
        |${seg(2)}
        |UNION ALL
        |${seg(4)}
        |ORDER BY nprobe, q_id""".stripMargin
    },

    // s22: full replica via the shared BqCteSql block — sign signatures
    // per 16-dim band (1L << bit, the m09 no-bit-63 rule), integer
    // hamming rank with vec_id tiebreak, rnd6 rerank, brute rnd6 truth
    // for the audit column.
    "s22_binary_quant" ->
      s"""WITH $BqCteSql,
        | topk AS (SELECT q_id, vec_id, ham, c6, rank FROM (
        |    SELECT *, row_number()
        |      OVER (PARTITION BY q_id ORDER BY c6 DESC, vec_id) AS rank
        |    FROM rr) WHERE rank <= 10)
        |SELECT k.q_id, CAST(k.rank AS INTEGER) AS rank, k.vec_id AS n_id,
        |  CAST(k.ham AS INTEGER) AS ham,
        |  floor(k.c6*10000+0.5)/10000 AS cos_sim,
        |  (t.vec_id IS NOT NULL) AS in_truth
        |FROM topk k LEFT JOIN truth t ON t.q_id = k.q_id AND t.vec_id = k.vec_id
        |ORDER BY k.q_id, k.rank""".stripMargin,

    // s23: the C sweep through the SAME shared BqCteSql — each arm
    // prefix-filters the one hrn-ranked shortlist before the rerank
    // rank, exactly like the Spark side's hrn <= c filter.
    "s23_bq_sweep" -> {
      def armCte(c: Int): String =
        s"""topk$c AS (SELECT q_id, vec_id FROM (
          |    SELECT q_id, vec_id, row_number()
          |      OVER (PARTITION BY q_id ORDER BY c6 DESC, vec_id) AS rank
          |    FROM rr WHERE hrn <= $c) WHERE rank <= 10),
          | hits$c AS (SELECT k.q_id, count(*) AS n_hit FROM topk$c k
          |          JOIN truth t ON t.q_id = k.q_id AND t.vec_id = k.vec_id
          |          GROUP BY 1)""".stripMargin
      def armSel(c: Int): String =
        s"""SELECT $c AS c, k.q_id, count(*) AS n_ret,
          |  CAST(coalesce(max(h.n_hit), 0) AS BIGINT) AS n_hit,
          |  floor((CAST(coalesce(max(h.n_hit), 0) AS DOUBLE) / 10)
          |        *10000+0.5)/10000 AS recall_at_k
          |FROM topk$c k LEFT JOIN hits$c h ON h.q_id = k.q_id
          |GROUP BY k.q_id""".stripMargin
      s"""WITH $BqCteSql,
        | ${armCte(5)},
        | ${armCte(10)},
        | ${armCte(25)},
        | ${armCte(50)}
        |${armSel(5)}
        |UNION ALL
        |${armSel(10)}
        |UNION ALL
        |${armSel(25)}
        |UNION ALL
        |${armSel(50)}
        |ORDER BY c, q_id""".stripMargin
    },

    // s21: full replica of the prefix-slice scoring — list_slice +
    // list_cosine_similarity accumulate in the same ascending-index
    // order as the Spark-side slice + ArrayCosine kernel, and the rnd6
    // rank key freezes ties before the rank tiebreak on vec_id.
    "s21_matryoshka_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        | ps AS (SELECT unnest([8, 16, 32, 64]) AS p),
        | q AS (SELECT vec_id AS q_id, vec AS q_vec FROM e WHERE vec_id < 3),
        | scored AS (
        |  SELECT ps.p, q.q_id, e.vec_id,
        |    floor((list_cosine_similarity(list_slice(e.vec, 1, ps.p),
        |                                  list_slice(q.q_vec, 1, ps.p)))
        |          *1000000+0.5)/1000000 AS c6
        |  FROM e CROSS JOIN q CROSS JOIN ps WHERE e.vec_id <> q.q_id),
        | topk AS (
        |  SELECT p, q_id, vec_id FROM (
        |    SELECT p, q_id, vec_id, row_number()
        |      OVER (PARTITION BY p, q_id ORDER BY c6 DESC, vec_id) AS rn
        |    FROM scored) WHERE rn <= 10),
        | truth AS (SELECT q_id, vec_id FROM topk WHERE p = 64),
        | hits AS (
        |  SELECT t.p, t.q_id, count(*) AS n_hit
        |  FROM topk t JOIN truth u ON u.q_id = t.q_id AND u.vec_id = t.vec_id
        |  GROUP BY t.p, t.q_id)
        |SELECT k.p, k.q_id, count(*) AS n_ret,
        |  CAST(coalesce(max(h.n_hit), 0) AS BIGINT) AS n_hit,
        |  floor((CAST(coalesce(max(h.n_hit), 0) AS DOUBLE) / 10)
        |        *10000+0.5)/10000 AS recall_at_k
        |FROM topk k
        |LEFT JOIN hits h ON h.p = k.p AND h.q_id = k.q_id
        |GROUP BY k.p, k.q_id
        |ORDER BY k.p, k.q_id""".stripMargin,

    // s06: same absmax scale, floor-round quantizer, and ascending-index
    // error dot (list_inner_product matches ArrayDot's accumulation
    // order, like list_cosine_similarity does for the ANN kernels).
    "s06_vec_quantize" ->
      """WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        | s1 AS (
        |  SELECT label, vec_id, vec,
        |    list_max(list_transform(vec, x -> abs(x))) AS scale
        |  FROM e),
        | q AS (
        |  SELECT label, vec_id, vec, scale,
        |    list_transform(vec, x -> floor(x / scale * 127.0 + 0.5)) AS qv
        |  FROM s1),
        | r AS (
        |  SELECT label, scale,
        |    list_transform(range(1, len(vec) + 1),
        |                   i -> vec[i] - (qv[i] * scale) / 127.0) AS diff,
        |    list_max(list_transform(qv, x -> abs(x))) AS qmax
        |  FROM q),
        | m AS (
        |  SELECT label, scale, qmax,
        |    sqrt(list_inner_product(diff, diff)) AS err
        |  FROM r)
        |SELECT label, count(*) AS n_vecs,
        | floor((avg(scale))*1000000+0.5)/1000000 AS avg_scale,
        | floor((avg(err))*1000000+0.5)/1000000 AS avg_err,
        | floor((max(err))*1000000+0.5)/1000000 AS max_err,
        | CAST(max(qmax) AS BIGINT) AS max_q
        |FROM m GROUP BY label ORDER BY label""".stripMargin,

    // s09: NO augmentation on the oracle side — rank directly by raw
    // inner product; rank-for-rank equality with the augmented-cosine
    // pipeline is the proof of the MIPS reduction.
    "s09_mips_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        | q AS (SELECT vec_id AS q_id, vec AS q_vec FROM e WHERE vec_id < 3),
        | scored AS (
        |  SELECT q.q_id, e.vec_id AS n_id,
        |    list_inner_product(q.q_vec, e.vec) AS ip
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        | ranked AS (
        |  SELECT q_id, n_id, ip, row_number()
        |    OVER (PARTITION BY q_id
        |          ORDER BY floor(ip*1000000+0.5)/1000000 DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id,
        | floor((ip)*10000+0.5)/10000 AS ip
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // s08: full encode replica — md5-seeded sampled codebooks, rnd6
    // subspace distances, argmin with the same tie-break, and the
    // integer micro-unit error sum (order-immune by construction).
    "s08_product_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        | sd AS (SELECT vec, row_number()
        |          OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS code
        |        FROM e),
        | sp AS (SELECT unnest(range(0, 8)) AS sp),
        | cb AS (SELECT sp.sp, code,
        |          list_slice(vec, sp.sp * 8 + 1, sp.sp * 8 + 8) AS cvec
        |        FROM sd CROSS JOIN sp WHERE code <= 16),
        | sb AS (SELECT vec_id, sp.sp,
        |          list_slice(vec, sp.sp * 8 + 1, sp.sp * 8 + 8) AS sub
        |        FROM e CROSS JOIN sp),
        | sc AS (SELECT vec_id, sb.sp, code,
        |          floor(list_inner_product(
        |            list_transform(range(1, 9), i -> sub[i] - cvec[i]),
        |            list_transform(range(1, 9), i -> sub[i] - cvec[i]))
        |            *1000000+0.5)/1000000 AS dist2
        |        FROM sb JOIN cb ON sb.sp = cb.sp),
        | enc AS (SELECT vec_id, sp, code, dist2 FROM (
        |          SELECT *, row_number()
        |            OVER (PARTITION BY vec_id, sp ORDER BY dist2, code) AS rn
        |          FROM sc) WHERE rn = 1)
        |SELECT count(DISTINCT vec_id) AS n_vecs,
        | 8 AS n_subspaces, 16 AS codebook_k,
        | CAST(sum(CAST(floor(dist2*1000000+0.5) AS BIGINT)) AS BIGINT)
        |   AS sum_dist2_e6,
        | count(DISTINCT sp || ':' || code) AS n_codes_used,
        | floor(max(dist2)*1000000+0.5)/1000000 AS max_dist2
        |FROM enc""".stripMargin,

    // s07: the ENTIRE k-means build unrolls into SQL — √n sizing, md5
    // seeding order, two (assign, rnd6-recenter) rounds, final census —
    // so the approximate quantizer itself is hash-verified, not just
    // its output shape. sum_csim_e6 keeps the objective integer-exact.
    "s07_kmeans_build" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        | kk AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS k FROM e),
        | sd AS (SELECT vec,
        |          row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)))
        |            AS rn
        |        FROM e),
        | c0 AS (SELECT rn AS cl_id, vec AS cvec FROM sd
        |        WHERE rn <= (SELECT k FROM kk)),
        | s1 AS (SELECT e.vec_id, c.cl_id, e.vec,
        |          floor(list_cosine_similarity(e.vec, c.cvec)*1000000+0.5)
        |            /1000000 AS csim
        |        FROM e CROSS JOIN c0 c),
        | a1 AS (SELECT vec_id, cl_id, vec FROM (
        |          SELECT vec_id, cl_id, vec, row_number()
        |            OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |          FROM s1) WHERE rn = 1),
        | x1 AS (SELECT cl_id, unnest(vec) AS v,
        |               generate_subscripts(vec, 1) AS i FROM a1),
        | m1 AS (SELECT cl_id, i, floor(avg(v)*1000000+0.5)/1000000 AS m
        |        FROM x1 GROUP BY cl_id, i),
        | c1 AS (SELECT cl_id, list(m ORDER BY i) AS cvec FROM m1
        |        GROUP BY cl_id),
        | s2 AS (SELECT e.vec_id, c.cl_id, e.vec,
        |          floor(list_cosine_similarity(e.vec, c.cvec)*1000000+0.5)
        |            /1000000 AS csim
        |        FROM e CROSS JOIN c1 c),
        | a2 AS (SELECT vec_id, cl_id, vec FROM (
        |          SELECT vec_id, cl_id, vec, row_number()
        |            OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |          FROM s2) WHERE rn = 1),
        | x2 AS (SELECT cl_id, unnest(vec) AS v,
        |               generate_subscripts(vec, 1) AS i FROM a2),
        | m2 AS (SELECT cl_id, i, floor(avg(v)*1000000+0.5)/1000000 AS m
        |        FROM x2 GROUP BY cl_id, i),
        | c2 AS (SELECT cl_id, list(m ORDER BY i) AS cvec FROM m2
        |        GROUP BY cl_id),
        | s3 AS (SELECT e.vec_id, c.cl_id,
        |          floor(list_cosine_similarity(e.vec, c.cvec)*1000000+0.5)
        |            /1000000 AS csim
        |        FROM e CROSS JOIN c2 c),
        | a3 AS (SELECT vec_id, cl_id, csim FROM (
        |          SELECT vec_id, cl_id, csim, row_number()
        |            OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |          FROM s3) WHERE rn = 1),
        | cz AS (SELECT cl_id, count(*) AS sz FROM a3 GROUP BY cl_id)
        |SELECT (SELECT k FROM kk) AS k,
        | (SELECT CAST(sum(sz) AS BIGINT) FROM cz) AS n_vecs,
        | (SELECT count(*) FROM cz) AS n_clusters,
        | (SELECT CAST(min(sz) AS BIGINT) FROM cz) AS min_cluster_sz,
        | (SELECT CAST(max(sz) AS BIGINT) FROM cz) AS max_cluster_sz,
        | (SELECT CAST(sum(CAST(floor(csim*1000000+0.5) AS BIGINT)) AS BIGINT)
        |  FROM a3) AS sum_csim_e6""".stripMargin,

    // s24: the ENTIRE hierarchical build unrolls — ⌈√k⌉ coarse sizing,
    // one coarse (seed, assign, rnd6-recenter) round, the single routed
    // cell assignment, per-cell md5 fine seeding, one fine within-cell
    // (assign, rnd6-recenter) round, and the final coarse-then-fine
    // routed assignment + census — so the two-level quantizer is
    // hash-verified end to end, not just its output shape.
    // s24: the chain is the SHARED [[hierBuildCteSql]] replica — the
    // same SQL d13 consumes, so the certified build and the SemDeDup
    // production path can never drift apart.
    "s24_hier_kmeans" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        | ${hierBuildCteSql("e")},
        | cz AS (SELECT cell, fid, count(*) AS sz FROM fin GROUP BY cell, fid)
        |SELECT (SELECT k FROM kk) AS k_target,
        | (SELECT kc FROM kcq) AS n_cells,
        | (SELECT kf FROM kfq) AS k_fine,
        | (SELECT count(DISTINCT cell) FROM cz) AS n_cells_used,
        | (SELECT count(*) FROM cz) AS n_centroids,
        | (SELECT CAST(sum(sz) AS BIGINT) FROM cz) AS n_vecs,
        | (SELECT CAST(min(sz) AS BIGINT) FROM cz) AS min_centroid_sz,
        | (SELECT CAST(max(sz) AS BIGINT) FROM cz) AS max_centroid_sz,
        | (SELECT CAST(sum(CAST(floor(csim*1000000+0.5) AS BIGINT)) AS BIGINT)
        |  FROM fin) AS sum_csim_e6""".stripMargin,

    // s27: the SAME hier-build replica (shared CTEs), then the graph
    // build (within-cluster kNN + rank-2 cross shortcuts), the
    // hierarchy-descent seeding, GraphRounds unrolled beam expansions
    // (generated by one loop with the Spark side's constants), and the
    // s10-style brute-truth recall — the full iterative search under
    // one hash oracle.
    "s27_graph_beam" -> {
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec
        |              FROM embeddings),
        | tw AS (SELECT vec_id + 100000 AS vec_id,
        |          list_transform(vec, x -> x * 1.001) AS vec
        |        FROM base WHERE vec_id < 3),
        | e AS (SELECT * FROM base UNION ALL SELECT * FROM tw),
        | ${hierBuildCteSql("e")},
        | ${graphCteSql("e", "")},
        | q AS (SELECT vec_id AS q_id, vec AS q_vec FROM e WHERE vec_id < 3),
        | ${seedBeamCteSql("e", "", "ent", "ed", "")},
        | ts AS (SELECT q.q_id, e.vec_id,
        |          ${c6Sql("list_cosine_similarity(q.q_vec, e.vec)")} AS c6
        |        FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        | truth AS (SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id, row_number()
        |      OVER (PARTITION BY q_id ORDER BY c6 DESC, vec_id) AS rn
        |    FROM ts) WHERE rn <= $GraphK),
        | ns AS (SELECT q_id, count(*) AS n_seed FROM fr0 GROUP BY q_id),
        | h AS (SELECT t.q_id, count(*) AS n_hit FROM truth t
        |       JOIN appr a ON a.q_id = t.q_id AND a.vec_id = t.vec_id
        |       GROUP BY t.q_id),
        | pl AS (SELECT q_id, true AS found_planted FROM appr
        |        WHERE vec_id = q_id + 100000),
        | nt AS (SELECT q_id, count(*) AS n_truth FROM truth GROUP BY q_id)
        |SELECT nt.q_id, CAST(ns.n_seed AS BIGINT) AS n_seed,
        | CAST(nt.n_truth AS BIGINT) AS n_truth,
        | CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        | floor((CAST(coalesce(h.n_hit, 0) AS DOUBLE) / nt.n_truth)
        |       *10000+0.5)/10000 AS recall_at_k,
        | coalesce(pl.found_planted, false) AS found_planted
        |FROM nt JOIN ns ON ns.q_id = nt.q_id
        |        LEFT JOIN h ON h.q_id = nt.q_id
        |        LEFT JOIN pl ON pl.q_id = nt.q_id
        |ORDER BY nt.q_id""".stripMargin
    },

    // s28: base-epoch hier+graph replicas (prefix b) over the organic
    // corpus, the frozen-hierarchy insert routing + locally-symmetrized
    // maintenance edges (med), the maintained walk (prefix m, seeded
    // from the STALE base entries), the full-rebuild control (prefix
    // r over the union corpus), one shared brute truth — all from the
    // same generators as s27, so the two oracles cannot desynchronize
    // on the graph or beam rules.
    "s28_graph_incremental" -> {
      s"""WITH org AS (SELECT vec_id, embedding::DOUBLE[] AS vec
        |              FROM embeddings),
        | tw AS (SELECT vec_id + 100000 AS vec_id,
        |          list_transform(vec, x -> x * 1.001) AS vec
        |        FROM org WHERE vec_id < 3),
        | e AS (SELECT * FROM org UNION ALL SELECT * FROM tw),
        | ${hierBuildCteSql("org", "b")},
        | ${graphCteSql("org", "b")},
        | ivs AS (SELECT t.vec_id, q.cl_id, t.vec,
        |           ${c6Sql("list_cosine_similarity(t.vec, q.cvec)")} AS csim
        |         FROM tw t CROSS JOIN bc1 q),
        | ivc AS (SELECT vec_id, cl_id AS cell, vec FROM (
        |           SELECT vec_id, cl_id, vec, row_number()
        |             OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |           FROM ivs) WHERE rn = 1),
        | ifs AS (SELECT g.vec_id, g.cell, f.fid,
        |           ${c6Sql("list_cosine_similarity(g.vec, f.fvec)")} AS csim
        |         FROM ivc g JOIN bf1 f ON g.cell = f.cell),
        | ifr AS (SELECT vec_id, cell, fid, row_number()
        |           OVER (PARTITION BY vec_id ORDER BY csim DESC, fid) AS rn
        |         FROM ifs),
        | inb AS (SELECT src, dst FROM (
        |    SELECT i.vec_id AS src, m.vec_id AS dst, row_number()
        |      OVER (PARTITION BY i.vec_id
        |            ORDER BY ${c6Sql("list_cosine_similarity(ei.vec, em.vec)")} DESC,
        |                     m.vec_id) AS rn
        |    FROM ifr i JOIN bfin m ON m.cell = i.cell AND m.fid = i.fid
        |    JOIN tw ei ON ei.vec_id = i.vec_id
        |    JOIN org em ON em.vec_id = m.vec_id
        |    WHERE i.rn = 1) WHERE rn <= $GraphM),
        | ixe AS (SELECT i.vec_id AS src, ent.entry AS dst
        |         FROM ifr i JOIN bent ent
        |           ON ent.cell = i.cell AND ent.fid = i.fid
        |         WHERE i.rn = 2 AND ent.entry <> i.vec_id),
        | idr AS (SELECT DISTINCT src, dst FROM
        |           (SELECT src, dst FROM inb
        |            UNION ALL SELECT src, dst FROM ixe)),
        | med AS (SELECT src, dst FROM bed
        |         UNION SELECT src, dst FROM idr
        |         UNION SELECT dst AS src, src AS dst FROM idr),
        | q AS (SELECT vec_id AS q_id, vec AS q_vec FROM org
        |       WHERE vec_id < 3),
        | ${seedBeamCteSql("e", "b", "bent", "med", "m")},
        | ${hierBuildCteSql("e", "r")},
        | ${graphCteSql("e", "r")},
        | ${seedBeamCteSql("e", "r", "rent", "red", "r")},
        | ts AS (SELECT q.q_id, e.vec_id,
        |          ${c6Sql("list_cosine_similarity(q.q_vec, e.vec)")} AS c6
        |        FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        | truth AS (SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id, row_number()
        |      OVER (PARTITION BY q_id ORDER BY c6 DESC, vec_id) AS rn
        |    FROM ts) WHERE rn <= $GraphK),
        | nt AS (SELECT q_id, count(*) AS n_truth FROM truth GROUP BY q_id),
        | hm AS (SELECT t.q_id, count(*) AS n_hit FROM truth t
        |        JOIN mappr a ON a.q_id = t.q_id AND a.vec_id = t.vec_id
        |        GROUP BY t.q_id),
        | hr AS (SELECT t.q_id, count(*) AS n_hit FROM truth t
        |        JOIN rappr a ON a.q_id = t.q_id AND a.vec_id = t.vec_id
        |        GROUP BY t.q_id),
        | plm AS (SELECT q_id, true AS fp FROM mappr
        |         WHERE vec_id = q_id + 100000),
        | plr AS (SELECT q_id, true AS fp FROM rappr
        |         WHERE vec_id = q_id + 100000),
        | cen AS (SELECT (SELECT count(*) FROM tw) AS n_inserts,
        |                (SELECT count(*) FROM idr) AS n_new_edges)
        |SELECT nt.q_id, CAST(nt.n_truth AS BIGINT) AS n_truth,
        | CAST(coalesce(hm.n_hit, 0) AS BIGINT) AS maint_hit,
        | floor((CAST(coalesce(hm.n_hit, 0) AS DOUBLE) / nt.n_truth)
        |       *10000+0.5)/10000 AS maint_recall,
        | coalesce(plm.fp, false) AS maint_found_planted,
        | CAST(coalesce(hr.n_hit, 0) AS BIGINT) AS rebuilt_hit,
        | floor((CAST(coalesce(hr.n_hit, 0) AS DOUBLE) / nt.n_truth)
        |       *10000+0.5)/10000 AS rebuilt_recall,
        | coalesce(plr.fp, false) AS rebuilt_found_planted,
        | CAST(cen.n_inserts AS BIGINT) AS n_inserts,
        | CAST(cen.n_new_edges AS BIGINT) AS n_new_edges
        |FROM nt LEFT JOIN hm ON hm.q_id = nt.q_id
        |        LEFT JOIN hr ON hr.q_id = nt.q_id
        |        LEFT JOIN plm ON plm.q_id = nt.q_id
        |        LEFT JOIN plr ON plr.q_id = nt.q_id
        |        CROSS JOIN cen
        |ORDER BY nt.q_id""".stripMargin
    },

    "s03_centroid_stats" ->
      """WITH e AS (
        |  SELECT label, unnest(embedding::DOUBLE[]) AS v,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        | c AS (
        |  SELECT label, i, floor((avg(v))*1000000+0.5)/1000000 AS m
        |  FROM e GROUP BY label, i),
        | n AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
        |SELECT n.label, n.n_vecs,
        | floor((sqrt(sum(c.m*c.m)))*10000+0.5)/10000 AS centroid_norm,
        | floor((max(CASE WHEN c.i=1 THEN c.m END))*1000000+0.5)/1000000 AS c0,
        | floor((max(CASE WHEN c.i=2 THEN c.m END))*1000000+0.5)/1000000 AS c1
        |FROM n JOIN c ON n.label = c.label
        |GROUP BY n.label, n.n_vecs ORDER BY n.label""".stripMargin,

    // s11: the full IVF-PQ ADC pipeline replicates — s04's coarse CTEs,
    // residuals against the rnd6 home centroid, s08's md5-seeded
    // codebook rule on RESIDUALS, rnd6 argmin encode, per-(query,
    // probed-list) LUT with entries frozen to e6 BIGINT before the
    // 8-way integer ADC sum.
    "s11_ivfpq_adc" ->
      s"""WITH $PqAdcCteSql,
        | ranked AS (
        |  SELECT q_id, vec_id, adc_e6, row_number()
        |    OVER (PARTITION BY q_id ORDER BY adc_e6, vec_id) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, vec_id AS n_id, adc_e6
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // s18: the shared ADC replica ([[PqAdcCteSql]] — the same CTEs
    // s11 ranks from) joined against an independently-computed brute
    // rnd6-cosine truth; recall certified per query.
    "s18_pq_recall" ->
      s"""WITH $PqAdcCteSql,
        | q AS (SELECT vec_id AS q_id, vec AS q_vec FROM e WHERE vec_id < 3),
        | tscored AS (
        |  SELECT q.q_id, e.vec_id,
        |    floor((list_cosine_similarity(q.q_vec, e.vec))*1000000+0.5)/1000000
        |      AS c6
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        | truth AS (SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id, row_number()
        |      OVER (PARTITION BY q_id ORDER BY c6 DESC, vec_id) AS rn
        |    FROM tscored) WHERE rn <= 10),
        | approx AS (SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id, row_number()
        |      OVER (PARTITION BY q_id ORDER BY adc_e6, vec_id) AS rn
        |    FROM scored) WHERE rn <= 10),
        | nc AS (SELECT q_id, count(*) AS n_cand FROM scored GROUP BY q_id),
        | h AS (SELECT t.q_id, count(*) AS n_hit FROM truth t
        |       JOIN approx a ON a.q_id = t.q_id AND a.vec_id = t.vec_id
        |       GROUP BY t.q_id),
        | nt AS (SELECT q_id, count(*) AS n_truth FROM truth GROUP BY q_id)
        |SELECT nt.q_id, nt.n_truth,
        | CAST(coalesce(nc.n_cand, 0) AS BIGINT) AS n_cand,
        | CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        | floor((CAST(coalesce(h.n_hit, 0) AS DOUBLE) / nt.n_truth)
        |       *10000+0.5)/10000 AS recall_at_k
        |FROM nt LEFT JOIN nc ON nc.q_id = nt.q_id
        |        LEFT JOIN h ON h.q_id = nt.q_id
        |ORDER BY nt.q_id""".stripMargin,

    // s19: the shared ADC replica ranked to a top-20 shortlist, then
    // re-ranked by the exact rnd6 cosine of only those rows — the
    // refine stage's rank key and tie-break mirror s18's truth rule.
    "s19_adc_rerank" ->
      s"""WITH $PqAdcCteSql,
        | sl AS (SELECT q_id, vec_id, adc_rank FROM (
        |    SELECT q_id, vec_id, row_number()
        |      OVER (PARTITION BY q_id ORDER BY adc_e6, vec_id) AS adc_rank
        |    FROM scored) WHERE adc_rank <= 20),
        | rr AS (
        |  SELECT sl.q_id, sl.vec_id, sl.adc_rank,
        |    floor((list_cosine_similarity(eq.vec, ev.vec))*1000000+0.5)/1000000
        |      AS c6
        |  FROM sl JOIN e ev ON ev.vec_id = sl.vec_id
        |          JOIN e eq ON eq.vec_id = sl.q_id)
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, vec_id AS n_id, c6,
        | CAST(adc_rank AS INTEGER) AS adc_rank
        |FROM (
        |  SELECT *, row_number()
        |    OVER (PARTITION BY q_id ORDER BY c6 DESC, vec_id) AS rank
        |  FROM rr)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // s20: same shard rule (vec_id % 4), local top-K per (query,
    // shard), merge of the pooled rows, and the full-set global rank
    // joined back — the s18 cosine rule on every score.
    "s20_scatter_gather" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        | q AS (SELECT vec_id AS q_id, vec AS q_vec FROM e WHERE vec_id < 3),
        | sc AS (
        |  SELECT q.q_id, e.vec_id, e.vec_id % 4 AS shard,
        |    floor((list_cosine_similarity(q.q_vec, e.vec))*1000000+0.5)/1000000
        |      AS c6
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        | loc AS (SELECT q_id, vec_id, shard, c6 FROM (
        |    SELECT *, row_number()
        |      OVER (PARTITION BY q_id, shard ORDER BY c6 DESC, vec_id) AS srn
        |    FROM sc) WHERE srn <= 5),
        | mrg AS (SELECT q_id, vec_id, shard, c6, rank FROM (
        |    SELECT *, row_number()
        |      OVER (PARTITION BY q_id ORDER BY c6 DESC, vec_id) AS rank
        |    FROM loc) WHERE rank <= 5),
        | gtop AS (SELECT q_id, vec_id, global_rank FROM (
        |    SELECT q_id, vec_id, row_number()
        |      OVER (PARTITION BY q_id ORDER BY c6 DESC, vec_id) AS global_rank
        |    FROM sc) WHERE global_rank <= 5)
        |SELECT m.q_id, CAST(m.rank AS INTEGER) AS rank, m.vec_id AS n_id,
        | CAST(m.shard AS BIGINT) AS shard, m.c6,
        | CAST(g.global_rank AS INTEGER) AS global_rank
        |FROM mrg m LEFT JOIN gtop g
        |  ON g.q_id = m.q_id AND g.vec_id = m.vec_id
        |ORDER BY m.q_id, m.rank""".stripMargin,

    // s12: same absmax int8 quantizer as s06, integer-exact quantized
    // dot (list_inner_product over int-valued doubles — every term
    // < 2^53), rnd6 rank key on the de-scaled inner product.
    "s12_sq8_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        | qz AS (
        |  SELECT vec_id,
        |    list_max(list_transform(vec, x -> abs(x))) AS scale,
        |    list_transform(vec,
        |      x -> floor(x / list_max(list_transform(vec, y -> abs(y)))
        |           * 127.0 + 0.5)) AS qv
        |  FROM e),
        | q AS (SELECT vec_id AS q_id, scale AS q_scale, qv AS q_qv
        |       FROM qz WHERE vec_id < 3),
        | scored AS (
        |  SELECT q.q_id, z.vec_id AS n_id,
        |    CAST(list_inner_product(q.q_qv, z.qv) AS BIGINT) AS qdot,
        |    list_inner_product(q.q_qv, z.qv) * q.q_scale * z.scale
        |      / (127.0 * 127.0) AS ip8
        |  FROM qz z CROSS JOIN q WHERE z.vec_id <> q.q_id),
        | ranked AS (
        |  SELECT q_id, n_id, qdot, ip8, row_number()
        |    OVER (PARTITION BY q_id
        |          ORDER BY floor(ip8*1000000+0.5)/1000000 DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id, qdot,
        | floor((ip8)*10000+0.5)/10000 AS ip8
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // s13: the s04 IVF replica + same-label post-filter + per-query
    // surviving-candidate count (shortfall accounting).
    "s13_filtered_ann" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
        | cex AS (SELECT label AS cl_id, unnest(vec) AS v,
        |                generate_subscripts(vec, 1) AS i FROM e),
        | cel AS (SELECT cl_id, i, floor((avg(v))*1000000+0.5)/1000000 AS m
        |         FROM cex GROUP BY cl_id, i),
        | cen AS (SELECT cl_id, list(m ORDER BY i) AS cvec FROM cel GROUP BY cl_id),
        | sims AS (
        |  SELECT e.vec_id, cen.cl_id,
        |    floor((list_cosine_similarity(e.vec, cen.cvec))*1000000+0.5)/1000000
        |      AS csim
        |  FROM e CROSS JOIN cen),
        | assign AS (
        |  SELECT vec_id, cl_id FROM (
        |    SELECT vec_id, cl_id, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |    FROM sims) WHERE rn = 1),
        | probes AS (
        |  SELECT vec_id AS q_id, cl_id FROM (
        |    SELECT vec_id, cl_id, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |    FROM sims WHERE vec_id < 3) WHERE rn <= 3),
        | cand AS (
        |  SELECT p.q_id, a.vec_id FROM assign a JOIN probes p USING (cl_id)
        |  WHERE a.vec_id <> p.q_id),
        | ql AS (SELECT vec_id AS q_id, label AS q_label FROM e WHERE vec_id < 3),
        | scored AS (
        |  SELECT c.q_id, c.vec_id AS n_id, n.label,
        |    list_cosine_similarity(q.vec, n.vec) AS cos
        |  FROM cand c
        |  JOIN e q ON q.vec_id = c.q_id
        |  JOIN e n ON n.vec_id = c.vec_id
        |  JOIN ql ON ql.q_id = c.q_id
        |  WHERE n.label = ql.q_label),
        | ranked AS (
        |  SELECT q_id, n_id, label, cos,
        |    count(*) OVER (PARTITION BY q_id) AS n_cand,
        |    row_number()
        |      OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id, label,
        | floor((cos)*10000+0.5)/10000 AS cos_sim, CAST(n_cand AS BIGINT) AS n_cand
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // s14: centroid build restricted to the indexed slice, assignment
    // over everything, per-list old/new shares + drift flag.
    "s14_ivf_drift" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
        | old AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
        | cex AS (SELECT label AS cl_id, unnest(vec) AS v,
        |                generate_subscripts(vec, 1) AS i FROM old),
        | cel AS (SELECT cl_id, i, floor((avg(v))*1000000+0.5)/1000000 AS m
        |         FROM cex GROUP BY cl_id, i),
        | cen AS (SELECT cl_id, list(m ORDER BY i) AS cvec FROM cel GROUP BY cl_id),
        | sims AS (
        |  SELECT e.vec_id, cen.cl_id,
        |    floor((list_cosine_similarity(e.vec, cen.cvec))*1000000+0.5)/1000000
        |      AS csim
        |  FROM e CROSS JOIN cen),
        | assign AS (
        |  SELECT vec_id, cl_id FROM (
        |    SELECT vec_id, cl_id, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |    FROM sims) WHERE rn = 1),
        | bl AS (
        |  SELECT cl_id,
        |    CAST(sum(CASE WHEN vec_id % 5 = 0 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_old,
        |    CAST(sum(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new
        |  FROM assign GROUP BY cl_id),
        | tt AS (SELECT cl_id, n_old, n_new,
        |          CAST(sum(n_old) OVER () AS BIGINT) AS t_old,
        |          CAST(sum(n_new) OVER () AS BIGINT) AS t_new
        |        FROM bl)
        |SELECT cl_id, n_old, n_new,
        | floor((CAST(n_old AS DOUBLE) / t_old)*1000000+0.5)/1000000 AS share_old,
        | floor((CAST(n_new AS DOUBLE) / t_new)*1000000+0.5)/1000000 AS share_new,
        | abs(CAST(n_new AS DOUBLE) / t_new - CAST(n_old AS DOUBLE) / t_old)
        |   > 0.02 AS rebalance
        |FROM tt ORDER BY cl_id""".stripMargin,

    // s15: the s04 IVF replica with the top-k rank swapped for the
    // rnd6-threshold radius filter + per-query match count.
    "s15_range_search" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
        | cex AS (SELECT label AS cl_id, unnest(vec) AS v,
        |                generate_subscripts(vec, 1) AS i FROM e),
        | cel AS (SELECT cl_id, i, floor((avg(v))*1000000+0.5)/1000000 AS m
        |         FROM cex GROUP BY cl_id, i),
        | cen AS (SELECT cl_id, list(m ORDER BY i) AS cvec FROM cel GROUP BY cl_id),
        | sims AS (
        |  SELECT e.vec_id, cen.cl_id,
        |    floor((list_cosine_similarity(e.vec, cen.cvec))*1000000+0.5)/1000000
        |      AS csim
        |  FROM e CROSS JOIN cen),
        | assign AS (
        |  SELECT vec_id, cl_id FROM (
        |    SELECT vec_id, cl_id, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |    FROM sims) WHERE rn = 1),
        | probes AS (
        |  SELECT vec_id AS q_id, cl_id FROM (
        |    SELECT vec_id, cl_id, row_number()
        |      OVER (PARTITION BY vec_id ORDER BY csim DESC, cl_id) AS rn
        |    FROM sims WHERE vec_id < 3) WHERE rn <= 3),
        | cand AS (
        |  SELECT p.q_id, a.vec_id FROM assign a JOIN probes p USING (cl_id)
        |  WHERE a.vec_id <> p.q_id),
        | scored AS (
        |  SELECT c.q_id, c.vec_id AS n_id,
        |    floor((list_cosine_similarity(q.vec, n.vec))*1000000+0.5)/1000000
        |      AS c6
        |  FROM cand c
        |  JOIN e q ON q.vec_id = c.q_id
        |  JOIN e n ON n.vec_id = c.vec_id),
        | hits AS (SELECT * FROM scored WHERE c6 >= 0.25)
        |SELECT q_id, n_id, c6 AS cos_sim,
        | count(*) OVER (PARTITION BY q_id) AS n_range
        |FROM hits ORDER BY q_id, n_id""".stripMargin,

    // s16: full fusion replica — same per-arm top-50 tie-breaks, same
    // two-term IEEE 1/(60+rank) sum, same top-10 fused ordering.
    "s16_hybrid_rrf" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        | dd AS (SELECT doc_id,
        |          list_distinct(list_filter(string_split(text, ' '),
        |                                    x -> x <> '')) AS tk
        |        FROM documents),
        | c AS (SELECT dd.doc_id, dd.tk, e.vec FROM dd
        |       JOIN e ON dd.doc_id = e.vec_id),
        | q AS (SELECT tk AS q_tk, vec AS q_vec FROM c WHERE doc_id = 0),
        | cand AS (
        |  SELECT c.doc_id,
        |    len(list_intersect(c.tk, q.q_tk)) AS lex,
        |    floor((list_cosine_similarity(q.q_vec, c.vec))*1000000+0.5)/1000000
        |      AS c6
        |  FROM c CROSS JOIN q WHERE c.doc_id <> 0),
        | lt AS (SELECT doc_id, r_lex FROM (
        |   SELECT doc_id, row_number() OVER (ORDER BY lex DESC, doc_id)
        |     AS r_lex FROM cand) WHERE r_lex <= 50),
        | vt AS (SELECT doc_id, r_vec FROM (
        |   SELECT doc_id, row_number() OVER (ORDER BY c6 DESC, doc_id)
        |     AS r_vec FROM cand) WHERE r_vec <= 50),
        | f AS (
        |  SELECT coalesce(lt.doc_id, vt.doc_id) AS doc_id,
        |    lt.r_lex, vt.r_vec,
        |    coalesce(1.0/(60 + lt.r_lex), 0) + coalesce(1.0/(60 + vt.r_vec), 0)
        |      AS rrf
        |  FROM lt FULL OUTER JOIN vt ON lt.doc_id = vt.doc_id),
        | r AS (SELECT doc_id, r_lex, r_vec, rrf,
        |         row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
        |       FROM f)
        |SELECT CAST(rank AS INTEGER) AS rank, doc_id,
        | CAST(r_lex AS INTEGER) AS r_lex, CAST(r_vec AS INTEGER) AS r_vec,
        | floor((rrf)*1000000+0.5)/1000000 AS rrf
        |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,
  )
}
