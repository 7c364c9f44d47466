package graft.queries

import java.nio.file.Files

import graft.SparkSessionFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral tests for the LLM-pipeline operators on corpora with
  * PLANTED duplicates / neighbors — the synthetic testdata has none, so
  * the roster summaries alone can't show the finders find. */
class PipelineSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  /** Build a testdata-shaped dir with planted dup structure. */
  private lazy val plantedDir: String = {
    val dir = Files.createTempDirectory("graft-planted").toString
    // ~60 DISTINCT tokens (not a short phrase repeated): the near-dup
    // below differs by one appended token, so its shingle jaccard is
    // ~60/63 ≈ 0.95 — where 8×4 banding recall is structural to ~1e-6,
    // for ANY hash family. (The original 13-distinct-token ×5 base put
    // the near pair at j ≈ 0.67, where per-family miss probability is
    // ~17% — the murmur3 family happened to recall it and the portable
    // h60 family happened not to; a recall assertion at that similarity
    // tests banding dice, not the pipeline.)
    val base = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu one two three four " +
      "five six seven eight nine ten eleven twelve thirteen fourteen " +
      "fifteen sixteen seventeen eighteen nineteen twenty apple banana " +
      "cherry date elder fig grape honey iris jade kiwi lemon mango ") +
      "nectar olive peach quince raspberry "
    val nearDup = base + "graftextra" // one appended token ⇒ j ≈ 0.95
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src0", base.length.toLong),              // exact dup of 0
      (2L, nearDup, "en", "src1", nearDup.length.toLong),        // near dup of 0
      (3L, "totally different content about spark catalyst optimizer rules " * 6,
        "en", "src1", 60L),
      (4L, base.toUpperCase, "en", "src2", base.length.toLong))  // case variant
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")

    val rng = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rng.nextGaussian().toFloat)
    val v0 = vec()
    val nearV = v0.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val embs = Seq(
      (0L, v0, 0), (1L, nearV, 0), // planted near-neighbors
      (2L, vec(), 1), (3L, vec(), 2), (4L, vec(), 3),
      (5L, vec(), 4), (6L, vec(), 5), (7L, vec(), 6))
    embs.toDF("vec_id", "embedding", "label")
      .repartition(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("d01_exact_dedup finds the planted exact duplicate") {
    val r = DedupQueries.queries("d01_exact_dedup")(spark, plantedDir).collect()(0)
    assert(r.getAs[Long]("n_docs") == 5)
    assert(r.getAs[Long]("n_unique_texts") == 4)
    assert(r.getAs[Long]("n_exact_dups") == 1)
  }

  test("d02_minhash_lsh flags exact+near dup pairs with high jaccard") {
    val r = DedupQueries.queries("d02_minhash_lsh")(spark, plantedDir).collect()(0)
    assert(r.getAs[Long]("n_candidate_pairs") >= 2) // (0,1) exact, (0,2)/(1,2) near
    assert(r.getAs[Long]("n_dups_05") >= 2)
    assert(r.getAs[Double]("max_jaccard") == 1.0)
  }

  test("d03_simhash: exact dups share a simhash, near dups land close") {
    val r = DedupQueries.queries("d03_simhash")(spark, plantedDir).collect()(0)
    assert(r.getAs[Long]("n_docs") == 5)
    assert(r.getAs[Long]("n_distinct_simhash") <= 4) // 0 and 1 identical
    assert(r.getAs[Long]("n_pairs_hamming_le8") >= 1)
    assert(r.getAs[Number]("min_hamming").intValue == 0)
  }

  test("d04_ngram_jaccard scores the near-dup pair above 0.3") {
    val r = DedupQueries.queries("d04_ngram_jaccard")(spark, plantedDir).collect()(0)
    assert(r.getAs[Long]("n_pairs_compared") >= 1)
    assert(r.getAs[Double]("max_jaccard") >= 0.9) // exact pair in same block
  }

  test("t04_fingerprint collapses case/punctuation variants") {
    val r = TextQueries.queries("t04_fingerprint")(spark, plantedDir).collect()(0)
    // docs 0, 1 and the uppercase variant 4 share a normalized fingerprint
    assert(r.getAs[Long]("largest_group") == 3)
    assert(r.getAs[Long]("docs_in_dup_groups") == 3)
  }

  test("s01_knn_brute ranks the planted neighbor first") {
    val rows = SimilarityQueries.queries("s01_knn_brute")(spark, plantedDir)
      .filter(col("q_id") === 0 && col("rank") === 1).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n_id") == 1L)
    assert(rows(0).getAs[Double]("cos_sim") > 0.99)
  }

  test("s02_ann_lsh buckets the planted neighbor pair together") {
    val rows = SimilarityQueries.queries("s02_ann_lsh")(spark, plantedDir)
      .filter(col("q_id") === 0).collect()
    // near-identical vectors must share every axis sign in all 4 tables
    assert(rows.exists(r => r.getAs[Long]("n_id") == 1L))
  }

  test("d05_embed_neardup catches the planted near-identical vector pair") {
    val r = SimilarityQueries.queries("d05_embed_neardup")(spark, plantedDir).collect()(0)
    assert(r.getAs[Long]("n_candidate_pairs") >= 1)
    assert(r.getAs[Long]("n_neardups_095") >= 1) // vectors 0 and 1
    assert(r.getAs[Double]("max_cos") > 0.99)
  }

  test("m02_decode_features: stub decode is deterministic and partition-independent") {
    val a = MultimodalQueries.queries("m02_decode_features")(spark, plantedDir).collect()
    val b = MultimodalQueries.queries("m02_decode_features")(spark, plantedDir).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.getAs[Long]("n_media")).sum == 5)
  }

  test("t09_chunk_stats: window/stride arithmetic matches a direct reference") {
    // independent Scala reference for the chunk count of every doc:
    // 1 + max(ceil((n - W)/S), 0) chunks, each of min(W, n - j*S) tokens
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text")).collect()
    val expected = docs.map { r =>
      val n = r.getAs[String]("text").split(" ").count(_.nonEmpty)
      val extra = math.max(
        math.ceil((n - TextQueries.ChunkW).toDouble / TextQueries.ChunkS).toLong, 0L)
      (r.getAs[String]("lang"), 1L + extra,
        (0L to extra).map(j =>
          math.min(TextQueries.ChunkW.toLong, n - j * TextQueries.ChunkS)).sum)
    }
    val expByLang = expected.groupBy(_._1).map { case (l, xs) =>
      l -> (xs.map(_._2).sum, xs.map(_._3).sum)
    }
    val got = TextQueries.queries("t09_chunk_stats")(spark, sf0001).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("sum_chunk_tokens"))).toMap
    assert(got == expByLang)
  }

  test("t10_tfidf: three ranked terms per lang, scores non-increasing") {
    val rows = TextQueries.queries("t10_tfidf")(spark, sf0001).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      assert(rs.length == 3, s"$lang has ${rs.length} ranked terms")
      val scores = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"$lang scores not non-increasing: ${scores.toSeq}")
    }
  }

  test("t11_contamination detects every planted train copy of an eval doc") {
    // the plants are verbatim copies of eval docs with doc_id < 300, so
    // each such eval doc shares ALL its 8-grams with train — the
    // detector must flag at least those docs
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val gate = graft.operators.Sampling.portableGate(col("doc_id")) % 10
    val plantedEval = docs.filter(gate < 2 && col("doc_id") < 300)
      .select("doc_id", "lang").collect()
    assert(plantedEval.nonEmpty, "fixture has no eval docs under id 300")
    val plantedByLang = plantedEval.groupBy(_.getAs[String]("lang"))
      .map { case (l, xs) => l -> xs.length.toLong }
    val got = TextQueries.queries("t11_contamination")(spark, sf0001).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_contaminated")).toMap
    plantedByLang.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) >= n,
        s"$lang: ${got.getOrElse(lang, 0L)} contaminated < $n planted")
    }
  }

  test("s06_vec_quantize: error bounded by the quantizer's step size") {
    // per-dim error <= scale/254 (half a step of 2*scale/254... the
    // round-half-up quantizer's max per-dim error is scale/254), so
    // ||err||_2 <= sqrt(64) * scale/254; check against the per-label
    // max with the reported avg scale as a conservative proxy
    val rows = SimilarityQueries.queries("s06_vec_quantize")(spark, sf0001).collect()
    rows.foreach { r =>
      val maxErr = r.getAs[Double]("max_err")
      val avgScale = r.getAs[Double]("avg_scale")
      val maxQ = r.getAs[Long]("max_q")
      assert(maxQ <= 127, s"quantized magnitude $maxQ exceeds int8 range")
      // loose structural bound: max scale <= ~3x avg scale on this data
      assert(maxErr <= math.sqrt(64.0) * (3 * avgScale) / 254.0,
        s"reconstruction error $maxErr too large for avg scale $avgScale")
      assert(maxErr > 0.0, "quantization of gaussian data cannot be lossless")
    }
  }

  test("t19: heavy-tail refinement keeps p01/p99 resolution under a " +
      "single extreme outlier") {
    // One 10M-char doc stretches [lo, hi] so the single-pass histogram
    // puts ALL 200 bulk docs (0..999 chars) in first-pass bucket 0 and
    // the p99 threshold collapses to full-bucket granularity
    // ((hi-lo)/64 ≈ 156 k — meaningless for a 0..999 bulk). The second
    // pass re-histograms bucket [b_lo, b_hi] at 64× finer resolution,
    // so the cut tightens to ≲ (hi-lo)/4096 ≈ 2.4 k.
    val dir = Files.createTempDirectory("graft-t19-outlier").toString
    val docs = (0 until 200).map(i =>
      (i.toLong, "x", "en", "src0", (i % 1000).toLong)) :+
      (200L, "x", "en", "src0", 10000000L)
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    val r = TextQueries.queries("t19_length_winsorize")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_clip_high") == 1L, r.toString) // only the outlier
    assert(r.getAs[Long]("n_kept") == 200L, r.toString)
    val tHi = r.getAs[Double]("t_hi")
    assert(tHi < 3000.0, // single-pass granularity would put this at ~156 k
      s"refinement failed to tighten the cut: t_hi = $tHi")
  }

  test("t23: the cap keeps exactly N per oversized source and the " +
      "selection is deterministic across re-runs") {
    val dir = Files.createTempDirectory("graft-t23-cap").toString
    // one source over the cap (30 docs), one under it (4 docs)
    val docs = (0 until 30).map(i =>
      (i.toLong, "x", "en", "big", 10L)) ++
      (100 until 104).map(i => (i.toLong, "x", "en", "small", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4).write.parquet(s"$dir/documents.parquet")
    val run1 = TextQueries.queries("t23_source_cap")(spark, dir).collect()
    val run2 = TextQueries.queries("t23_source_cap")(spark, dir).collect()
    assert(run1.toSeq == run2.toSeq) // hash priority ⇒ plan/retry-stable
    val bySource = run1.map(r => r.getAs[String]("source") -> r).toMap
    assert(bySource("big").getAs[Long]("n_kept") == 10L)
    assert(bySource("big").getAs[Long]("n_dropped") == 20L)
    assert(bySource("small").getAs[Long]("n_kept") == 4L)
    assert(bySource("small").getAs[Long]("n_dropped") == 0L)
  }

  test("streamSession sizes state partitioning to state volume on a " +
      "clone and never mutates the shared session") {
    val parentParts = spark.conf.get("spark.sql.shuffle.partitions")
    val ss = EventQueries.streamSession(spark)
    assert(ss ne spark)
    assert(ss.sparkContext eq spark.sparkContext) // clone, not a new app
    assert(ss.conf.get("spark.sql.shuffle.partitions") == "4")
    // streaming-critical confs travel to the clone
    assert(ss.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(ss.conf.get(
      "spark.sql.streaming.noDataMicroBatches.enabled") == "false")
    // bounded replays re-derive state each run: the corruption-detection
    // checksums are pure per-file fixed cost here (see streamSession)
    assert(ss.conf.get(
      "spark.sql.streaming.checkpoint.fileChecksum.enabled") == "false")
    // the shared session's batch parallelism is untouched
    assert(spark.conf.get("spark.sql.shuffle.partitions") == parentParts)
    // deployments with larger state raise the knob before first start
    spark.conf.set("spark.graft.stream.statePartitions", "64")
    try assert(EventQueries.streamSession(spark)
      .conf.get("spark.sql.shuffle.partitions") == "64")
    finally spark.conf.unset("spark.graft.stream.statePartitions")
  }

  test("e12's bounded-replay guard rejects a multi-batch complete-mode " +
      "sink (the precondition that keeps the pattern off unbounded streams)") {
    val single = Seq((0L, 1L, 5L)).toDF("batch_id", "user_id", "n_events")
    assert(EventQueries.boundedReplayGuard(single).count() == 1)
    // two batch ids = the source fed the query incrementally; complete
    // mode then re-emitted a growing prefix per batch and the sink's
    // content is NOT a single final answer — must fail loudly
    val multi = Seq((0L, 1L, 5L), (1L, 1L, 6L))
      .toDF("batch_id", "user_id", "n_events")
    val ex = intercept[IllegalArgumentException] {
      EventQueries.boundedReplayGuard(multi)
    }
    assert(ex.getMessage.contains("one micro-batch"))
    intercept[IllegalArgumentException] {
      EventQueries.boundedReplayGuard(
        Seq.empty[(Long, Long, Long)].toDF("batch_id", "user_id", "n_events"))
    }
  }

  test("d09 label handoff: a build over the memo cap persists the label " +
      "table to parquet, consumers read it back, answers are unchanged") {
    val baseline = DedupQueries
      .queries("d17_keeper_resolution")(spark, plantedDir).collect().toSeq
    // re-build under a doctored 1-row cap: the corpus's label table
    // (well over one row) must take the parquet-handoff path
    DedupQueries.invalidateLabels(plantedDir)
    spark.conf.set("spark.graft.labels.memoMaxRows", "1")
    try {
      val guarded = DedupQueries
        .queries("d17_keeper_resolution")(spark, plantedDir).collect().toSeq
      assert(guarded == baseline)
      val info = DedupQueries.labelHandleInfo(spark, plantedDir)
      assert(info.exists(_ != "memo"), s"expected a parquet handoff, got $info")
      assert(new java.io.File(info.get).exists, s"handoff dir missing: $info")
      // a second consumer reads the SAME persisted artifact (no rebuild)
      val census = DedupQueries
        .queries("d09_dup_clusters")(spark, plantedDir).collect()
      assert(census.nonEmpty)
      assert(DedupQueries.labelHandleInfo(spark, plantedDir) == info)
      // the handoff also survives a bench-scrub unpersist-all: parquet
      // is storage, not block-manager state
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val again = DedupQueries
        .queries("d17_keeper_resolution")(spark, plantedDir).collect().toSeq
      assert(again == baseline)
      // invalidation deletes the handoff dir, not just the entry
      val dir = info.get
      DedupQueries.invalidateLabels(plantedDir)
      assert(!new java.io.File(dir).exists, s"handoff dir leaked: $dir")
    } finally {
      spark.conf.unset("spark.graft.labels.memoMaxRows")
      DedupQueries.invalidateLabels(plantedDir)
    }
  }

  test("d09 label cache drops its entries (and handoff dirs) when the " +
      "session's application ends") {
    DedupQueries.invalidateLabels(plantedDir)
    spark.conf.set("spark.graft.labels.memoMaxRows", "1")
    try {
      DedupQueries.queries("d17_keeper_resolution")(spark, plantedDir).collect()
      val info = DedupQueries.labelHandleInfo(spark, plantedDir)
      assert(info.exists(_ != "memo"))
      val dir = info.get
      // fire the exact event SparkContext.stop() emits, through the
      // real listener bus (stopping the shared fixture context would
      // kill every later suite) — the hook installed by d09Labels /
      // GraftExtensions must evict this session's entries
      org.apache.spark.graft.ListenerBridge
        .postApplicationEnd(spark.sparkContext)
      assert(DedupQueries.labelHandleInfo(spark, plantedDir).isEmpty,
        "application-end hook did not evict the label cache")
      assert(!new java.io.File(dir).exists, s"handoff dir leaked: $dir")
    } finally {
      spark.conf.unset("spark.graft.labels.memoMaxRows")
      DedupQueries.invalidateLabels(plantedDir)
    }
  }

  test("d09Labels survives an unpersist-all between consumers (bench scrub)") {
    // Bench.scrub() unpersists every persistent RDD between timed queries.
    // A memoized checkpoint-BACKED frame dies there (its truncated lineage
    // points at evicted CHECKPOINT_RDD blocks and the next consumer throws
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND); the collected-row memo must not.
    val first = DedupQueries
      .queries("d17_keeper_resolution")(spark, plantedDir).collect().toSeq
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val second = DedupQueries
      .queries("d17_keeper_resolution")(spark, plantedDir).collect().toSeq
    assert(first == second)
  }

  test("s25: the per-label cap BINDS — the diversified top-5 serves all-" +
      "distinct labels and differs from the unconstrained s01 top-5") {
    // the unconstrained top-5 repeats labels on this corpus (verified at
    // all three SFs when the query was designed); if a future testdata
    // epoch makes label repeats vanish from every query's top-5, the cap
    // goes dormant and this fails — re-tighten the cap, don't weaken it
    val div = SimilarityQueries
      .queries("s25_diverse_topk")(spark, SparkSessionFixture.sf0001)
      .select("q_id", "n_id", "label").collect()
      .groupBy(_.getLong(0))
    val plain = SimilarityQueries
      .queries("s01_knn_brute")(spark, SparkSessionFixture.sf0001)
      .select("q_id", "n_id").collect()
      .groupBy(_.getLong(0))
    assert(div.nonEmpty)
    div.foreach { case (q, rows) =>
      val labels = rows.map(_.getInt(2))
      assert(labels.distinct.length == labels.length,
        s"q$q served a repeated label: ${labels.mkString(",")}")
    }
    val changed = div.keys.count { q =>
      div(q).map(_.getLong(1)).toSet != plain(q).map(_.getLong(1)).toSet
    }
    assert(changed >= 1,
      "diversified top-5 equals plain top-5 for every query — cap dormant")
  }

  test("d28: the planted banner's post-removal frequency is ZERO in every " +
    "lang while unique text survives") {
    val rows = DedupQueries.queries("d28_verbatim_removal")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_banner_before")).sum > 0,
      "plant dormant: no doc contained the banner before removal")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_banner_after") == 0L,
        s"banner survived removal in lang ${r.getAs[String]("lang")}")
      assert(r.getAs[Long]("sum_tokens_after") > 0L,
        s"excision emptied lang ${r.getAs[String]("lang")} entirely")
      assert(r.getAs[Long]("sum_tokens_before") ==
        r.getAs[Long]("sum_tokens_removed") + r.getAs[Long]("sum_tokens_after"),
        "removed + kept must partition the token mass")
    }
  }

  test("s28: every freshly-inserted twin is found by the beam on the " +
    "MAINTAINED graph, and staleness costs at most a few hits vs rebuilt") {
    val rows = SimilarityQueries.queries("s28_graph_incremental")(
      spark, sf0001).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("maint_found_planted"),
        s"q${r.getAs[Long]("q_id")}: twin not found on the maintained graph")
      assert(r.getAs[Long]("maint_hit") > 0)
    }
    assert(rows.head.getAs[Long]("n_inserts") == 3L)
    assert(rows.head.getAs[Long]("n_new_edges") > 0L,
      "maintenance produced no edges — inserts unreachable")
  }

  test("e25: exactly the planted last-day windows flag fertility drift") {
    val rows = EventQueries.queries("e25_fertility_drift")(spark, sf0001)
      .collect()
    val lastDay = EventQueries.FertDays - 1
    val (planted, clean) =
      rows.partition(_.getAs[Int]("dayi") == lastDay)
    assert(planted.nonEmpty && clean.nonEmpty)
    planted.foreach(r => assert(r.getAs[Boolean]("drifted"),
      s"planted window day=$lastDay lang=${r.getAs[String]("lang")} " +
        "did not flag"))
    clean.foreach(r => assert(!r.getAs[Boolean]("drifted"),
      s"clean window day=${r.getAs[Int]("dayi")} " +
        s"lang=${r.getAs[String]("lang")} false-flagged"))
  }

  test("t44/t45: the perceptron converges on the planted corpus and the " +
    "audit's confusion matches — every planted doc flagged, zero clean " +
    "docs flagged") {
    val learn = TextQueries.queries("t44_quality_learn")(spark, sf0001)
      .collect().sortBy(_.getAs[Int]("learn_round"))
    assert(learn.length == TextQueries.QcRounds)
    // training error (the NEXT round's pre-update mistake count) must
    // hit zero before the final round — the measured convergence claim
    assert(learn.last.getAs[Long]("n_mistakes") == 0L,
      "perceptron did not converge to zero training errors")
    val audit = TextQueries.queries("t45_quality_audit")(spark, sf0001)
      .collect()
    val (tp, planted, fp) = (audit.map(_.getAs[Long]("tp")).sum,
      audit.map(_.getAs[Long]("n_planted")).sum,
      audit.map(_.getAs[Long]("fp")).sum)
    assert(planted > 0, "plant dormant")
    assert(tp == planted, s"missed planted docs: tp=$tp of $planted")
    assert(fp == 0L, s"clean docs flagged: fp=$fp")
  }

  test("qcRawFeatureCols matches qcFeatures' formulas on the planted " +
    "corpus — the d29/e26 scorers use the training-time features") {
    // re-plant exactly as qcFeatures does, then the raw helper must
    // produce identical x1..x5 per doc (the formula-desync guard)
    val plantedText = Seq.fill(TextQueries.QcBannerReps)(
      TextQueries.BoilerHeader).mkString(" ")
    val planted = graft.Tables.documents(spark, sf0001)
      .withColumn("text", when(col("doc_id") % 5 === 0, plantedText)
        .otherwise(col("text")))
    val raw = TextQueries.qcRawFeatureCols(planted)
      .select("doc_id", "x1", "x2", "x3", "x4", "x5").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val feats = TextQueries.qcFeaturesMemo(spark, sf0001)
      .select("doc_id", "x1", "x2", "x3", "x4", "x5").collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      assert(raw(r.getLong(0)) == ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))),
        s"feature mismatch for doc ${r.getLong(0)}")
    }
  }

  test("d29: the quality keeper is each cluster's argmax-margin member " +
    "(independent re-derivation) and the policy provably beats " +
    "keep-min-id on margin") {
    val row = DedupQueries.queries("d29_quality_keeper")(spark, sf0001)
      .collect()(0)
    // independent re-derivation: score the planted dup corpus with the
    // frozen weights, group by the label table, take argmax by hand
    val labels = DedupQueries.d09Labels(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = TextQueries.qcFrozenWeights(spark, sf0001)
    val margins = TextQueries.qcRawFeatureCols(
        DedupQueries.d09Corpus(spark, sf0001))
      .withColumn("margin", TextQueries.qcMarginCol(w))
      .select("doc_id", "margin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = labels.toSeq.groupBy(_._2).map { case (lbl, ms) =>
      val keeper = ms.map(_._1).minBy(n => (-margins(n), n))
      (lbl, keeper)
    }
    assert(row.getAs[Long]("n_clusters") == byCluster.size.toLong)
    assert(row.getAs[Long]("keeper_q_id_sum") ==
      byCluster.values.sum,
      "query's elected keepers differ from the hand argmax")
    assert(row.getAs[Long]("keeper_min_id_sum") ==
      byCluster.keys.sum)
    assert(row.getAs[Long]("margin_gain_total") >= 0L,
      "argmax policy cannot lose margin vs min-id")
    assert(row.getAs[Long]("n_changed_keepers") ==
      byCluster.count { case (lbl, k) => k != lbl }.toLong)
  }

  test("t47: every banded shard fits the 4096 budget (recomputed " +
    "per-shard fills) and the offset policy measurably straddles " +
    "where banded BFD structurally cannot") {
    val rows = TextQueries.queries("t47_bestfit_pack")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    // the witness numbers: offset packing splits docs, banded BFD pays
    // bounded padding instead
    assert(rows.map(_.getAs[Long]("off_straddled")).sum > 0L,
      "no straddles at sf0.001 — the comparison is vacuous")
    rows.foreach { r =>
      assert(r.getAs[Long]("bfd_padding") >= 0L)
      assert(r.getAs[Long]("bfd_fill_e4") <= 10000L)
    }
    // independent refill: naive window rank, same banding — every
    // shard's fill must respect cap*band_hi <= B
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("lang", "doc_id",
        "CAST(size(filter(split(text, ' '), t -> t != '')) AS LONG) AS n_tok")
      .selectExpr("lang", "doc_id", "n_tok",
        "greatest(64, ((n_tok + 63) div 64) * 64) AS band")
      .selectExpr("*", "greatest(1, 4096 div band) AS cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "band")
      .orderBy(col("n_tok").desc, col("doc_id"))
    val fills = docs.withColumn("pos", row_number().over(w))
      .selectExpr("lang", "band", "(pos - 1) div cap AS shard", "n_tok")
      .groupBy("lang", "band", "shard")
      .agg(sum("n_tok").as("fill"), max("band").as("hi"))
      .collect()
    fills.foreach { r =>
      val fill = r.getAs[Long]("fill")
      assert(fill <= 4096L || r.getAs[Long]("hi") > 4096L,
        s"shard overflows budget: $r")
    }
    val shardCounts = fills.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("bfd_shards") ==
        shardCounts(r.getAs[String]("lang")),
        "distributed PrefixScan rank disagrees with the naive window")
    }
  }

  test("e26: exactly the planted last-day template burst flags quality " +
    "drift") {
    val rows = EventQueries.queries("e26_quality_drift")(spark, sf0001)
      .collect()
    val lastDay = EventQueries.FertDays - 1
    val (planted, clean) =
      rows.partition(_.getAs[Int]("dayi") == lastDay)
    assert(planted.nonEmpty && clean.nonEmpty)
    planted.foreach(r => assert(r.getAs[Boolean]("drifted"),
      s"planted window day=$lastDay source=${r.getAs[String]("source")} " +
        "did not flag"))
    clean.foreach(r => assert(!r.getAs[Boolean]("drifted"),
      s"clean window day=${r.getAs[Int]("dayi")} " +
        s"source=${r.getAs[String]("source")} false-flagged"))
  }
}
