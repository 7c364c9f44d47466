package graft.queries

import graft.{SparkEntry, SparkSessionFixture}
import org.apache.spark.sql.functions.{col, count, expr, lit, sum, when}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the roster's scale claims (pushdown,
  * pruning, broadcast, top-k) hold in the executed plans, not just in
  * comments. */
class QueryPlanSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect()
    // formatted mode prints full scan metadata (PushedFilters,
    // ReadSchema) even under the AQE wrapper
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q02: filters are pushed into the parquet scan; columns pruned") {
    // AQE wraps the tree, so assert on the full plan text (scan metadata
    // is printed inline)
    val plan = planOf("q02_filter_project")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThan(l_quantity"), plan.take(3000))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("l_extendedprice"),
      s"unpruned column: $readSchema")
  }

  test("q01: aggregate runs partial (map-side) + final") {
    val plan = planOf("q01_agg_battery")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_sum") || plan.contains("Partial"), plan)
  }

  test("q04: dimension join is a broadcast hash join") {
    assert(planOf("q04_broadcast_join").contains("BroadcastHashJoin"))
  }

  test("q05: ALL four joins broadcast; lineitem never shuffles pre-aggregate") {
    // Verified at sf0.1 too (2026-08-12): the filtered orders (~2 MiB)
    // and customer (~1.1 MiB) sit under the 10 MB broadcast threshold,
    // so even the initial plan broadcasts all four build sides and the
    // fact table's only exchange is the final aggregate's. This pins
    // that shape: a dropped hint or a split plan shows up as a
    // SortMergeJoin / missing broadcast here.
    val plan = planOf("q05_multi_join_revenue")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4, plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("q19: top-k plans as TakeOrderedAndProject (no global sort materialization)") {
    assert(planOf("q19_topk").contains("TakeOrderedAndProject"))
  }

  test("q08/q09: semi/anti joins plan as semi/anti, not materialized subqueries") {
    assert(planOf("q08_semi_join").contains("LeftSemi"))
    assert(planOf("q09_anti_join").contains("LeftAnti"))
  }

  test("d02: minhash signature computes scan-side (no shingle explode " +
      "before the band join) — and the native-kernel pipeline keeps the " +
      "same shape via d06") {
    // the portable d02 signature is a per-row projection (K array_min
    // over the shingle array) — shingles must never explode; the only
    // Generate is the 8-element band array
    val plan = planOf("d02_minhash_lsh")
    assert(plan.contains("array_min"), plan.take(2000))
    // d06 runs the engine-native kernel variant of the same pipeline
    assert(planOf("d06_minhash_planted").contains("minhash_sig"))
  }

  test("s25: queries broadcast against the corpus scan; diversification " +
      "is windows over the shortlist — no shuffled join anywhere") {
    val plan = planOf("s25_diverse_topk").split("== Initial Plan ==")(0)
    // the 3-row query table broadcasts into the scoring scan
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan.take(3000))
    // shortlist rank, per-label cap, final re-rank: three window passes
    assert("Window".r.findAllIn(plan).size >= 3, plan.take(3000))
  }

  test("s04: centroid table broadcasts; corpus never cartesian-products") {
    // the crossJoin against the K-row centroid frame must plan as a
    // broadcast nested-loop, not a CartesianProduct shuffle
    val plan = planOf("s04_ivf_topk")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("s10: the recall evaluation keeps the shared probe pipeline's " +
      "shape — broadcast centroids/probes/queries, no cartesian") {
    // s10's approximate side IS s04's pipeline (CentroidBuild
    // .ivfCandidates); this pin keeps the shared helper's plan honest
    // from the second consumer's side too
    val plan = planOf("s10_ann_recall")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // probe-list and query-vector joins are broadcast equi-joins
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("s17: sweep points consume each candidate set from ONE checkpoint " +
      "scan, and the probe pipeline itself keeps the shared shape " +
      "(broadcast centroids/probes/queries, no cartesian)") {
    // since the single-pass rework each sweep point's ivfCandidates
    // output localCheckpoints, so the SHIPPED plan shows the checkpoint
    // scans (census + scoring read the materialized candidates, not a
    // re-run of the probe pipeline)...
    val plan = planOf("s17_nprobe_sweep")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert("Scan ExistingRDD".r.findAllIn(plan).size >= 3,
      s"expected the three sweep points' checkpoint scans\n${plan.take(3000)}")
    // ...and the probe pipeline's own shape is pinned directly on the
    // shared operator the checkpoint materializes (the same code path
    // s04/s10/s13 ship un-checkpointed)
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), expr("transform(embedding, x -> double(x))").as("vec"))
    val cents = graft.operators.CentroidBuild.centroids(
      graft.Tables.embeddings(spark, sf0001)
        .select(col("label"), expr("transform(embedding, x -> double(x))").as("vec")),
      col("label"), col("vec"))
    val cand = graft.operators.CentroidBuild.ivfCandidates(
      emb, cents, col("vec_id") < 3, 2)
    cand.collect()
    val cplan = cand.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(cplan.contains("BroadcastNestedLoopJoin"), cplan.take(3000))
    assert(!cplan.contains("CartesianProduct"), cplan.take(3000))
    // probe-list + query-vector broadcast equi-joins
    assert("BroadcastHashJoin".r.findAllIn(cplan).size >= 2, cplan.take(3000))
  }

  test("s11: IVF-PQ's small sides (centroids, codebook, probes, LUT) all " +
      "broadcast — no cartesian, no shuffled corpus join anywhere") {
    val plan = planOf("s11_ivfpq_adc")
    // centroid crosses plan as broadcast nested-loop, never cartesian
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the codebook/probe/LUT equi-joins broadcast; the corpus side is
    // never shuffled into a join (encode + ADC stay map-side up to the
    // argmin window and final per-query aggregate)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan.take(3000))
  }

  test("s12: the quantized scan joins only the broadcast query set — " +
      "one corpus pass, no cartesian, no shuffle join") {
    val plan = planOf("s12_sq8_topk")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan.take(3000))
  }

  test("s13: filtered search keeps the shared probe pipeline's shape — " +
      "broadcast centroids/probes/queries/labels, no cartesian") {
    val plan = planOf("s13_filtered_ann")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("s15: range search rides the same broadcast probe pipeline — " +
      "no cartesian, and no global top-k sort (the radius filter " +
      "replaces ranking)") {
    val plan = planOf("s15_range_search")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("s16: each retrieval arm is a TakeOrdered top-K and the query " +
      "row broadcasts — no cartesian, no global sort") {
    val plan = planOf("s16_hybrid_rrf")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("d21: the rank query's final top-10 is a TakeOrdered limit, " +
      "never a global sort; no cartesian") {
    // the iteration plans are materialized (localCheckpoint) inside the
    // closure — the edge build's no-cartesian shape is pinned by the
    // d09Edges test; this pin covers the consumer-visible plan
    val plan = planOf("d21_graph_rank")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("d21: one rank iteration shuffles messages on the destination " +
      "node id and joins rank⋈edges on src — no cartesian") {
    // rebuild one un-checkpointed iteration so the loop's plan (hidden
    // behind per-round checkpoints in the query) is itself certified
    val corpus = DedupQueries.d09Corpus(spark, sf0001)
    val pairs = DedupQueries.d09Edges(corpus)
    val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(pairs.select(col("v").as("src"), col("u").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val pr0 = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    val msgs = edges.join(deg, "src")
      .join(pr0.select(col("node").as("src"), col("pr").as("src_pr")), "src")
      .select(col("dst"), expr("src_pr div deg").as("c"))
      .groupBy("dst").agg(sum("c").as("contrib"))
    msgs.collect()
    val tree = msgs.queryExecution.executedPlan.toString
    assert(!tree.contains("CartesianProduct") &&
      !tree.contains("BroadcastNestedLoopJoin"), tree.take(3000))
    assert(tree.contains("hashpartitioning(dst"), tree.take(3000))
  }

  test("d22: the fidelity audit's pairs come from the banded candidate " +
      "path — no cartesian; signature joins are equi on doc id") {
    val plan = planOf("d22_minhash_fidelity")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("d23: containment pairs come from the prefix-gate equi join — " +
      "no cartesian (the only nested-loop joins are the two 1-row " +
      "count broadcasts)") {
    val plan = planOf("d23_containment")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the pair join itself must be an equi join on the gate
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("s14: the drift audit broadcast-assigns both slices — no " +
      "shuffle join of the corpus, no cartesian beyond the k-row " +
      "centroid broadcast") {
    val plan = planOf("s14_ivf_drift")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("t08: exploded token counts combine map-side before the shuffle") {
    val plan = planOf("t08_top_tokens")
    assert(plan.contains("Generate"), plan.take(3000))
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      plan.take(3000))
  }

  test("t25: the CMS build combines map-side (mergeable-sketch shape); " +
      "the probe joins the 256-row sketch by broadcast; exact top-10 " +
      "is a TakeOrdered limit") {
    val plan = planOf("t25_cms_heavy_hitters")
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("m08: the class-prototype table joins by broadcast — pairs " +
      "never shuffle to be scored; no cartesian") {
    val plan = planOf("m08_pair_filter")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("t26: the DSIR censuses combine map-side, the 64-row log-ratio " +
      "table joins by broadcast, and the selection is a TakeOrdered " +
      "top-20 — never a corpus-wide sort or window") {
    val plan = planOf("t26_dsir_select")
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("t27: the per-doc score frame is a shared lazy barrier (the " +
      "census/bigram machinery runs once behind a Scan ExistingRDD); " +
      "cutoffs ride 1-row broadcast frames — no cartesian, no " +
      "corpus-wide sort-merge join") {
    // r22: `sc` is materializeLazy'd, so the c1/c2 BroadcastHashJoins
    // and the bigram explode live BEHIND the barrier (they no longer
    // appear in the published plan — they run exactly once); the
    // published plan must scan the barrier RDD, fold map-side, and
    // attach the tercile cutoffs as 1-row broadcast nested loops
    val plan = planOf("t27_lm_perplexity")
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      plan.take(3000))
    assert(plan.contains("Scan ExistingRDD"), plan.take(3000))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("m06: the single-vs-doubled comparison joins two n_sources-row " +
      "aggregates — the build side is pinned by hint so AQE's " +
      "byte-size jitter cannot flip BuildLeft/BuildRight between runs") {
    val plan = planOf("m06_decode_stability")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("d24: the s-curve audit's all-pairs stage is a broadcast " +
      "non-equi self-join of the bounded doc SAMPLE — never a " +
      "cartesian shuffle, never a corpus-sized join") {
    val plan = planOf("d24_lsh_scurve")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("q41: salted agg runs two aggregate stages, salt never reaches output") {
    val plan = planOf("q41_salted_agg")
    // partial+final for each of the two groupBys
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan.take(3000))
    val df = SparkEntry.queries("q41_salted_agg")(spark, sf0001)
    assert(!df.columns.contains("__salt"))
  }

  test("q42: salted join spreads the hot key; salt never reaches output") {
    val plan = planOf("q42_salted_join")
    // the join key must be (k, __salt), not the bare 3-value hot key
    assert(plan.contains("__salt"), plan.take(3000))
    val df = SparkEntry.queries("q42_salted_join")(spark, sf0001)
    assert(!df.columns.contains("__salt"))
  }

  test("t11: contamination detector plans as a semi join (eval payload never shuffles wide)") {
    val plan = planOf("t11_contamination")
    assert(plan.contains("LeftSemi"), plan.take(3000))
  }

  test("t10: tf and df aggregates both combine map-side before their shuffles") {
    val plan = planOf("t10_tfidf")
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      plan.take(3000))
    // the corpus-size scalar joins in as a broadcast, not a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("e09: the interval join plans as an equi-join on (user, bin) — no range explosion") {
    val plan = planOf("e09_range_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // residual range predicate rides the equi-join as its condition
    assert(plan.contains("Join"), plan.take(3000))
  }

  test("q47: might_contain prunes the fact scan BELOW the join") {
    // positional check needs the TREE string (children print below
    // parents), not the formatted details section
    val df = SparkEntry.queries("q47_bloom_prune")(spark, sf0001)
    df.collect()
    val tree = df.queryExecution.executedPlan.toString
    val filterIdx = tree.indexOf("might_contain")
    val joinIdx = "HashJoin|SortMergeJoin".r
      .findFirstMatchIn(tree).map(_.start).getOrElse(-1)
    assert(filterIdx >= 0, tree.take(3000))
    assert(joinIdx >= 0, tree.take(3000))
    assert(filterIdx > joinIdx,
      s"might_contain filter does not sit below the join:\n${tree.take(3000)}")
  }

  test("d12: bloom prefilter sits below the corpus confirm-join") {
    // the whole point of the two-phase probe: bloom-negative batch
    // hashes must be filtered out BEFORE the semi join, not after
    val df = SparkEntry.queries("d12_incremental_dedup")(spark, sf0001)
    df.collect()
    val tree = df.queryExecution.executedPlan.toString
    val filterIdx = tree.indexOf("might_contain")
    val joinIdx = "HashJoin|SortMergeJoin".r
      .findFirstMatchIn(tree).map(_.start).getOrElse(-1)
    assert(filterIdx >= 0 && joinIdx >= 0, tree.take(3000))
    assert(filterIdx > joinIdx,
      s"might_contain does not sit below the join:\n${tree.take(3000)}")
  }

  test("t15: the shuffle-order head samples as top-k, never a global sort") {
    val plan = planOf("t15_corpus_shuffle")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("t47: both packing ranks ride PrefixScan — every window is " +
      "__pid-bounded, no corpus-wide range sort survives to the final " +
      "plan, no cartesian") {
    val plan = planOf("t47_bestfit_pack")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // every window spec is partitioned by the range-partition id —
    // the PrefixScan guarantee that no task ever sorts more than its
    // own slice (the t14 low-cardinality-window trap, avoided)
    val specs = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty, plan.take(3000))
    specs.foreach(l => assert(l.contains("__pid"),
      s"window not bounded by the scan partition id: $l"))
    // the only range exchange feeding a sort is the final ~5-row
    // per-language census orderBy — never a corpus-wide doc sort
    // (PrefixScan's internal range partitioning is cut at its
    // localCheckpoint boundary)
    plan.linesIterator.filter(_.contains("rangepartitioning")).foreach {
      l => assert(!l.contains("doc_id"),
        s"corpus-wide range sort leaked into the final plan: $l")
    }
  }

  test("q46: the min/max scalar joins back as a broadcast, not a shuffle") {
    val plan = planOf("q46_histogram")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("AQE skew-join conversion still fires (q41/q42's documented backstop)") {
    // SkewTools' comments lean on AQE handling skewed sort-merge joins;
    // this pins that a Spark upgrade (or a conf default change) cannot
    // silently drop the conversion. A hot key holding ~95% of the left
    // side, thresholds tuned down so the test corpus trips them, must
    // come back from AQE marked "skew=true" on the join node.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // coalescing can merge the split partitions straight back at this
      // tiny scale — keep the knobs from fighting each other
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 200000)
        .select((when(col("id") % 20 =!= 0, 1L).otherwise(col("id")))
          .as("k"), col("id").as("payload"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        (col("id") * 2).as("dim"))
      // no groupBy on k after the join: reusing the join's partitioning
      // downstream makes AQE (correctly) decline to split the skewed
      // partitions, since that would force an extra shuffle
      val joined = left.join(right, "k").select(col("payload"))
      joined.collect()
      val tree = joined.queryExecution.executedPlan.toString
      assert(tree.contains("skew=true"),
        s"AQE did not convert the skewed join:\n${tree.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("t17: the boilerplate set anti-joins as a BROADCAST (the 100 TB " +
      "argument rests on the corpus side never shuffling for the prune)") {
    val plan = planOf("t17_boilerplate_prune")
    val bcastAnti = plan.linesIterator
      .exists(l => l.contains("BroadcastHashJoin") && l.contains("LeftAnti"))
    assert(bcastAnti, s"boiler anti-join not broadcast:\n${plan.take(3000)}")
  }

  test("d09: the edge build is banded minhash — no cartesian at any scale") {
    // the clustering loop materializes eagerly inside the query
    // closure, so assert on the edge-build frame the query consumes
    val corpus = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 200).select("doc_id", "text")
    val edges = DedupQueries.d09Edges(corpus)
    edges.collect()
    val tree = edges.queryExecution.executedPlan.toString
    assert(!tree.contains("CartesianProduct") &&
      !tree.contains("BroadcastNestedLoopJoin"),
      s"edge build plans a cartesian:\n${tree.take(3000)}")
  }

  test("d09 shipped path: the exact-content collapse is equi-keyed " +
      "end to end — content-key group + membership join, rep-only band " +
      "join, star from the same census; no cartesian") {
    // labelPropagateCollapsed checkpoints per round, so pin the edge
    // frame it consumes (the d13/s24 rebuild pattern)
    val corpus = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 200).select("doc_id", "text")
    val edges = DedupQueries.collapsedEdges(corpus)
    edges.collect()
    val tree = edges.queryExecution.executedPlan.toString
    assert(!tree.contains("CartesianProduct") &&
      !tree.contains("BroadcastNestedLoopJoin"),
      s"collapsed edge build plans a cartesian:\n${tree.take(3000)}")
    // the collapse itself: a hash aggregate keyed on the content digest
    assert(tree.contains("ckey"), tree.take(3000))
  }

  test("d14: gram doc-frequency combines map-side; no cartesian anywhere; " +
      "coverage is interval-merged — no position-level explode remains") {
    val plan = planOf("d14_verbatim_spans")
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the only explode is the positioned gram explode over
    // sequence(0, n - 8). The 8-offset coverage explode
    // (explode(sequence(i, i + 7)) → one row per covered token
    // position, ~8× the token volume) must stay gone — coverage comes
    // from the per-doc lag window instead. (The gram subtree prints
    // more than once under AQE — it feeds both the df aggregate and
    // the hit join — so assert on the explode's argument shape, not a
    // Generate count.)
    assert(!"explode\\(sequence\\(i#".r.findFirstIn(plan).isDefined,
      "position-level coverage explode is back:\n" + plan.take(3000))
    assert(plan.contains("Window"), plan.take(3000))
  }

  test("s07: every centroid table broadcasts across both Lloyd rounds — " +
      "the corpus never cartesian-products or shuffles for assignment") {
    val plan = planOf("s07_kmeans_build")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("s24: both hierarchy levels broadcast — coarse assignment is a " +
      "broadcast nested-loop over the ⌈√k⌉-row cell table, fine " +
      "assignment is a broadcast hash join EQUI-KEYED on the cell " +
      "(each row probes only its own cell's bucket)") {
    // the committed query localCheckpoints the routed (vec_id, cell)
    // table, which truncates the coarse lineage out of the final plan —
    // so pin the two levels where each is visible. Fine level: the
    // end-to-end plan's only surviving join shape.
    val plan = planOf("s24_hier_kmeans")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    val fineJoinKeyed = plan.linesIterator.exists(l =>
      l.contains("Left keys") && l.contains("cell"))
    assert(fineJoinKeyed, plan.take(3000))
    // Coarse level: rebuild the pre-checkpoint routing frame and assert
    // the s07 shape (broadcast centroids, never a cartesian shuffle).
    import graft.operators.CentroidBuild
    import org.apache.spark.sql.functions.transform
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val coarse = CentroidBuild.lloyd(emb, "vec_id", "vec", k = 5, rounds = 1)
    val cells = CentroidBuild.nearest(
      CentroidBuild.similarities(emb, coarse, "vec_id", "vec"), "vec_id")
    cells.collect()
    val coarsePlan = cells.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(coarsePlan.contains("BroadcastNestedLoopJoin"), coarsePlan.take(3000))
    assert(!coarsePlan.contains("CartesianProduct"), coarsePlan.take(3000))
  }

  test("s27: the graph build's pair join is equi-keyed on (cell, fid) " +
      "— bounded per-cluster frames, never all-pairs; the beam " +
      "expansion broadcasts the frontier against the slim edge frame; " +
      "the final plan keeps the audit semi-join and never " +
      "cartesian-products") {
    val plan = planOf("s27_graph_beam")
    assert(plan.contains("LeftSemi"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the committed query localCheckpoints the routed table and every
    // beam round, truncating the build from the final plan (the
    // s24/d13 situation) — rebuild the pre-checkpoint frames and pin
    // each shape where it is visible
    import graft.operators.{CentroidBuild => CB}
    import org.apache.spark.sql.functions.transform
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val coarse = CB.lloyd(emb, "vec_id", "vec", k = 5, rounds = 1)
    val cells = CB.nearest(
        CB.similarities(emb, coarse, "vec_id", "vec"), "vec_id")
      .withColumnRenamed("cl_id", "cell")
    val embCell = emb.join(cells, "vec_id")
    val fine = CB.lloydGrouped(embCell, "cell", "vec_id", "vec", 5,
      rounds = 1)
    val home = CB.nearestGroupedK(embCell, fine, "cell", "vec_id", "vec", 1)
    val pairs = home.select(col("vec_id").as("src"), col("cell"), col("fid"))
      .join(home.select(col("vec_id").as("dst"), col("cell"), col("fid")),
        Seq("cell", "fid"))
      .filter(col("src") =!= col("dst"))
    pairs.collect()
    val pairPlan = pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!pairPlan.contains("CartesianProduct"), pairPlan.take(3000))
    assert(pairPlan.linesIterator.exists(l =>
      l.contains("Left keys") && l.contains("cell") && l.contains("fid")),
      pairPlan.take(3000))
    // one beam round: the q-row frontier meets the edge frame in a
    // broadcast hash join on src — the edge frame itself never shuffles
    val frontier = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("vec_id"))
    val expanded = frontier.join(pairs.select("src", "dst"),
      frontier("vec_id") === col("src"))
    expanded.collect()
    val beamPlan = expanded.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // (the rebuilt frame inlines the whole un-checkpointed build, so
    // only the top join shape is asserted — the committed query's
    // materialize calls truncate everything below it)
    assert(beamPlan.contains("BroadcastHashJoin"), beamPlan.take(3000))
  }

  test("m11: the matching stays doc-bounded — pair build and the " +
      "anti-join retirements are equi-keyed, no cartesian anywhere") {
    val plan = planOf("m11_interleave_match")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the per-round picks are checkpointed, so the surviving joins in
    // the final plan are the census joins + anti-joins — all keyed
    assert(plan.contains("LeftAnti") || plan.contains("BroadcastHashJoin"),
      plan.take(3000))
    // rebuild the pre-checkpoint pair frame: the image-chunk join must
    // be an equi-join on doc_id (images meet only their OWN doc's
    // chunks, never the corpus)
    import org.apache.spark.sql.functions.{col, pmod, lit, transform => tf}
    val images = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("img_id"),
        pmod(col("vec_id"), lit(200L)).as("doc_id"))
    val docs = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 200).select("doc_id", "source")
    val paired = docs.join(images, "doc_id")
    paired.collect()
    val pairPlan = paired.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!pairPlan.contains("CartesianProduct") &&
      !pairPlan.contains("BroadcastNestedLoopJoin"), pairPlan.take(3000))
  }

  test("d13: both hierarchy levels assign by broadcast (coarse BNLJ, " +
      "fine equi-keyed BHJ on cell), and the dup-pair join is " +
      "equi-keyed on (cl_id, sub) — the hierarchical-build shape " +
      "can't silently regress if the query is edited without touching " +
      "CentroidBuild itself") {
    // the committed query localCheckpoints both the routed (vec_id,
    // cell) table and the fine assignment, which truncates BOTH
    // hierarchy levels out of the final plan (the only surviving
    // BroadcastNestedLoopJoins there are the 1-row report-tail
    // crossJoins — asserting on them would pin nothing). So, like the
    // s24 test, rebuild each pre-checkpoint frame and pin its shape
    // where it is visible; the final plan keeps only the pair-join
    // key assertion, which sits downstream of the checkpoints.
    val plan = planOf("d13_semantic_dedup")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the within-cluster pair join must shuffle on (cl_id, sub) — a
    // key whose cardinality grows with n — never on anything coarser
    val pairJoinKeyed = plan.linesIterator.exists(l =>
      (l.contains("Left keys") || l.contains("SortMergeJoin") ||
        l.contains("ShuffledHashJoin")) &&
        l.contains("cl_id") && l.contains("sub"))
    assert(pairJoinKeyed,
      s"dup-pair join not keyed on (cl_id, sub):\n${plan.take(3000)}")
    // Coarse level: the routed (vec_id, cell) frame crossJoins a
    // BROADCAST ⌈√k⌉-row cell table — the corpus never shuffles or
    // cartesians to be routed.
    import graft.operators.CentroidBuild
    import org.apache.spark.sql.functions.transform
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val coarse = CentroidBuild.lloyd(emb, "vec_id", "vec", k = 4, rounds = 1)
    val cells = CentroidBuild.nearest(
        CentroidBuild.similarities(emb, coarse, "vec_id", "vec"), "vec_id")
      .withColumnRenamed("cl_id", "cell")
    cells.collect()
    val coarsePlan = cells.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(coarsePlan.contains("BroadcastNestedLoopJoin"),
      coarsePlan.take(3000))
    assert(!coarsePlan.contains("CartesianProduct"), coarsePlan.take(3000))
    // Fine level: nearestGrouped joins the corpus to the fine table
    // EQUI-KEYED on cell — each row probes only its own cell's bucket,
    // so at 100 TB Catalyst can flip this one join broadcast→shuffle
    // while the coarse table stays a √k-row broadcast.
    val embCell = emb.join(cells, "vec_id")
    val fine = CentroidBuild.lloydGrouped(
      embCell, "cell", "vec_id", "vec", kPerGroup = 2, rounds = 1)
    val assign = CentroidBuild.nearestGrouped(
      embCell, fine, "cell", "vec_id", "vec")
    assign.collect()
    val finePlan = assign.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(finePlan.contains("BroadcastHashJoin"), finePlan.take(3000))
    assert(!finePlan.contains("CartesianProduct"), finePlan.take(3000))
    val fineJoinKeyed = finePlan.linesIterator.exists(l =>
      l.contains("Left keys") && l.contains("cell"))
    assert(fineJoinKeyed,
      s"fine assignment join not keyed on cell:\n${finePlan.take(3000)}")
  }

  test("t23: the source cap is two-phase — the first window partitions " +
      "by (source, salt), never source alone over the full corpus") {
    val plan = planOf("t23_source_cap")
    // two Window operators: salted candidate phase + final per-source
    // rank over SALT*N candidate rows only
    assert("Window".r.findAllIn(plan).size >= 2, plan.take(3000))
    // the candidate phase's partition key carries the gate salt — the
    // guard against funneling the corpus into #sources partitions
    assert(plan.contains("pmod"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the scan must prune to (doc_id, source): the cap decision never
    // needs text, so the windows shuffle ids, not documents. Asserted
    // POSITIVELY (fields ⊆ {doc_id, source}) — a negative "no text"
    // substring check could pass spuriously if a regression pushed
    // `text` past Spark's ReadSchema line truncation
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty, plan.take(3000))
    readSchemas.foreach { line =>
      val fields = line.split("struct<").last.stripSuffix(">")
        .split(",").map(_.split(":")(0).trim).filter(_.nonEmpty).toSet
      assert(fields.nonEmpty && fields.subsetOf(Set("doc_id", "source")),
        s"t23 scan reads more than (doc_id, source): $line")
    }
  }

  test("t29: the corpus is PREFILTERED by the bloom literal before any " +
      "join — might_contain sits in a Filter, the exact verify is a " +
      "broadcast semi join, and the corpus never sort-merge shuffles") {
    val full = planOf("t29_benchmark_decontam")
    assert(full.contains("might_contain"), full.take(3000))
    assert(full.contains("BroadcastHashJoin"), full.take(3000))
    assert(!full.contains("SortMergeJoin"), full.take(3000))
    assert(!full.contains("CartesianProduct"), full.take(3000))
  }

  test("d16: the cross-corpus candidate join is banded — no cartesian") {
    val doc = graft.Tables.documents(spark, sf0001).select("doc_id", "text")
    val pairs = DedupQueries.minhashCrossPairs(
      doc.filter(col("doc_id") < 200),
      doc.filter(col("doc_id") >= 200 && col("doc_id") < 260))
    pairs.collect()
    val tree = pairs.queryExecution.executedPlan.toString
    assert(!tree.contains("CartesianProduct") &&
      !tree.contains("BroadcastNestedLoopJoin"),
      s"cross-corpus candidates plan a cartesian:\n${tree.take(3000)}")
  }

  test("t19: histogram-quantile winsorization never sorts the data " +
      "(the whole point vs exact percentiles)") {
    val plan = planOf("t19_length_winsorize").split("== Initial Plan ==")(0)
    // the only Sort allowed is the 64-row window over the histogram
    // aggregate and the final 5-row orderBy — no corpus-sized sort
    // means no Exchange feeding a Sort wider than the aggregate side;
    // cheap proxy: TakeOrdered/global Sort of the scan must not appear
    // before the first aggregate
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("s08: the PQ codebook broadcasts — the corpus explode never " +
      "shuffles to be encoded") {
    val plan = planOf("s08_product_quantize")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q51: the multi-distinct profile runs as ONE Expand-based scan, " +
      "not one scan per column") {
    val plan = planOf("q51_table_profile").split("== Initial Plan ==")(0)
    assert(plan.contains("Expand"), plan.take(3000))
    // long form comes from exploding the single wide row, so exactly
    // ONE scan feeds the whole profile
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"profile plans $scans scans:\n${plan.take(3000)}")
  }

  test("t22: the funnel is flag-based — two scans (keeper branch + " +
      "final aggregate), never one scan per stage") {
    val plan = planOf("t22_prep_funnel").split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"funnel plans $scans scans:\n${plan.take(3000)}")
  }

  test("s06: quantization is per-row until the final per-label aggregate") {
    // scope to the AQE final plan (the formatted string also prints the
    // initial plan, which would double every operator count)
    val plan = planOf("s06_vec_quantize").split("== Initial Plan ==")(0)
    // one aggregation pair (partial+final) — no other shuffle-producing
    // operator: quantize/reconstruct/error are all projections
    assert("HashAggregate".r.findAllIn(plan).size <= 2, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("e16: attribution is ONE user-keyed window pass — no self-join, " +
      "no range explosion") {
    val plan = planOf("e16_attribution").split("== Initial Plan ==")(0)
    // the as-of reformulation: a single Window (running max of click
    // ts) feeding the bucket aggregate; a regression back to the naive
    // purchase×click self-join would surface as a Join here
    assert("Window".r.findAllIn(plan).size == 1, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("e14: merged-sketch probe join BROADCASTS the 256-row sketch — " +
      "the top-k audit never shuffles on sketch buckets") {
    // planOf drives the full streaming replay, then explains the
    // batch-side audit it returns: the probe side (10 users × 4 rows)
    // joins the merged CMS table, which must ship as a broadcast —
    // a SortMergeJoin here would mean the ≤256-row sketch got
    // exchange-partitioned, the shape that breaks the "sketch is the
    // state" scale claim
    val plan = planOf("e14_stream_sketch").split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    // exactly one Window: the global rank over ten rows
    assert("Window".r.findAllIn(plan).size == 1, plan.take(3000))
  }

  test("e15: sink readback is scan+sort ONLY — the stream already " +
      "aggregated; admitted counts need no batch-side re-aggregation") {
    // the late-data audit's scale claim is that sink traffic is
    // closed-windows-only (append mode): the returned per-day frame
    // must therefore be a plain read of the sink, not a dedup or
    // re-aggregation pass over raw events
    val plan = planOf("e15_late_data_audit").split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("HashAggregate"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("e17: recovered sink sums partials with ONE aggregate pair — " +
      "no dedup-on-read, no join, after the restart") {
    // the restart contract: the idempotent batch-id sink converges
    // under re-delivery, so the readback needs zero distinct/window
    // machinery — a Window or distinct appearing here would mean the
    // sink stopped converging and the query papered over it downstream
    val plan = planOf("e17_restart_recovery").split("== Initial Plan ==")(0)
    assert("HashAggregate".r.findAllIn(plan).size <= 2, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("Distinct") && !plan.contains("distinct"),
      plan.take(3000))
  }

  test("s21: prefix-dim scoring broadcasts the query×prefix frame; " +
      "corpus never cartesian-products") {
    // 12 broadcast rows against one corpus scan — all four prefix
    // lengths score inside the same stage; a CartesianProduct or a
    // SortMergeJoin here would mean the corpus shuffled to be scored
    val plan = planOf("s21_matryoshka_recall")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("s22: hamming scan reads broadcast query signatures; shortlist " +
      "and query vectors broadcast into the rerank — no sort-merge") {
    // the BQ serving shape: the corpus is scanned (sig + hamming in
    // one stage) against 3 broadcast query signatures, and only the
    // 150-row shortlist drives the exact-cosine fetch — a
    // SortMergeJoin anywhere means either the scan shuffled or the
    // shortlist did
    val plan = planOf("s22_binary_quant")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("s23: the sweep reuses ONE shortlist build — four arms, no " +
      "extra hamming scans, everything broadcast") {
    // the shared-bqShortlist discipline made structural: one corpus
    // hamming pass feeds all four prefix-filtered arms, so exactly one
    // hrn Window ranks hamming; the rerank ranks appear once per arm
    val plan = planOf("s23_bq_sweep")
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("t30: fertility report is ONE scan + one aggregate pair — " +
      "no join, no window, nothing shuffles but the (lang,source) grid") {
    val plan = planOf("t30_tokenizer_fertility").split("== Initial Plan ==")(0)
    assert("HashAggregate".r.findAllIn(plan).size <= 2, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("t31: vocab and corpus totals ride as BROADCASTS — one census " +
      "pass, no sort-merge join, no second corpus scan") {
    // the 16-row vocabulary joins the token census as a broadcast hash
    // join; the two 1-row totals attach as broadcast nested loops —
    // nothing about the reweight math shuffles the corpus again
    val plan = planOf("t31_domain_reweight").split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("m09: candidate pairs dedup on ids BEFORE signatures rejoin; " +
      "band join never cartesian-products") {
    // the neardupPairs discipline: the ×4 band explode carries only
    // (doc_id, j, bv); payload-derived signature columns rejoin by id
    // after the distinct, and every DATA join is an equi join — the
    // single permitted nested-loop is the 1-row max(doc_id)+1 offset
    // broadcast that derives collision-free planted ids
    val plan = planOf("m09_phash_neardup").split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // r22: sigs is materializeLazy'd — the payload decode + phash
    // kernel (and the 1-row offset nested loop upstream of it) run
    // once behind a Scan ExistingRDD instead of re-expanding under
    // each consumer, so the published plan may have NO nested loop at
    // all; any that remains must still be the 1-row broadcast shape
    // (BuildRight Cross), never a data×data join
    assert(plan.contains("Scan ExistingRDD"), plan.take(3000))
    val bnlLines = plan.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlLines.forall(l =>
      l.contains("BuildRight") && l.contains("Cross")),
      s"unexpected nested-loop shape:\n${bnlLines.mkString("\n")}")
  }

  test("e18: quota readback joins per-source totals via BROADCAST — " +
      "the 20-row admitted table never drives a shuffle join") {
    val plan = planOf("e18_stream_quota").split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("e19: outer-join readback is ONE aggregate over the sink — " +
      "no re-join, no window; null accounting happened in-stream") {
    // the outer join's matched/unmatched split is decided by the
    // streaming engine's watermark machinery; the readback must only
    // count what the sink holds — a Join or Window here would mean the
    // query re-derived the semantics batch-side and proved nothing
    // <= 4: count(DISTINCT click_id) rewrites into a second partial+
    // final aggregate pair over the expanded keys — still one linear
    // pass over the sink rows, no extra scan
    val plan = planOf("e19_stream_outer_join").split("== Initial Plan ==")(0)
    assert("HashAggregate".r.findAllIn(plan).size <= 4, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("t32: the sliding-window ranking partitions by the WINDOW HASH " +
      "— t28's no-coarse-key rule holds at stride granularity too") {
    val full = planOf("t32_sliding_dedup")
    val tree = full.split("== Initial Plan ==")(0)
    assert(full.contains("windowspecdefinition(h"), full.take(4000))
    assert(!tree.contains("Join"), tree.take(3000))
  }

  test("t28: the keep-first window partitions by the CHUNK HASH — " +
      "cardinality grows with the corpus, never a coarse key") {
    // formatted mode prints operator DETAIL sections (where
    // windowspecdefinition lives) after BOTH plan trees, so the
    // window-key assert reads the full text; shape asserts read only
    // the final-plan tree
    val full = planOf("t28_chunk_dedup")
    val tree = full.split("== Initial Plan ==")(0)
    // the dedup decision must key on h (the md5 chunk fingerprint);
    // a window keyed on source/lang would funnel the corpus into a
    // handful of partitions (the t23 hazard this query avoids by
    // construction)
    assert(full.contains("windowspecdefinition(h#"), full.take(3000))
    assert(!tree.contains("Join"), tree.take(3000))
    // one scan feeds chunk explode, window, and accounting alike
    assert("Scan parquet".r.findAllIn(tree).size == 1, tree.take(3000))
  }

  test("d25: the weight join is doc_id-equi — the corpus never " +
      "self-joins or cartesians to be weighted") {
    val plan = planOf("d25_soft_dedup")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // cluster sizes arrive as an equi join against the label table;
    // the 1-row aggregate is the only other shuffle consumer
    assert(plan.contains("doc_id"), plan.take(3000))
  }

  test("s19: the refine stage fetches by BROADCASTING the q·C-id " +
      "shortlist against the store — the corpus is scanned, never " +
      "shuffled, to be re-ranked") {
    val plan = planOf("s19_adc_rerank")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // no SortMergeJoin anywhere: every join in shortlist+refine is
    // broadcast (centroids, codebook, LUT, probes, shortlist, queries)
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("s20: the shard windows partition by (q_id, shard) — " +
      "cardinality grows with shards — and queries broadcast; " +
      "no cartesian, no sort-merge join") {
    val full = planOf("s20_scatter_gather")
    val tree = full.split("== Initial Plan ==")(0)
    // detail sections print after both trees (the t28 lesson)
    assert(full.contains("windowspecdefinition(q_id#") &&
      full.contains(", shard#"), full.take(3000))
    assert(tree.contains("BroadcastNestedLoopJoin"), tree.take(3000))
    assert(!tree.contains("CartesianProduct"), tree.take(3000))
    assert(!tree.contains("SortMergeJoin"), tree.take(3000))
  }

  test("s18: the PQ recall audit keeps the shared ADC pipeline's " +
      "shape — broadcast small sides, no cartesian") {
    // s18's approximate side IS s11's pipeline (pqAdcScored); this pin
    // keeps the shared helper honest from the second consumer's side,
    // exactly as s10 does for s04's ivfCandidates
    val plan = planOf("s18_pq_recall")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q52: three layouts from ONE corpus pass (explode, no re-scan " +
      "per layout); z-key stays in codegen; joins are metadata-sized " +
      "broadcasts") {
    val full = planOf("q52_zorder_skipping")
    val plan = full.split("== Initial Plan ==")(0)
    // exactly two orders scans: the 1-row min/max bounds + the main pass
    assert("Scan parquet".r.findAllIn(plan).size == 2, plan.take(3000))
    // the three layouts fan out via Generate(explode), not three scans
    assert(plan.contains("Generate"), plan.take(3000))
    // bounds + probe attachments broadcast; nothing shuffles a join
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
    // no corpus-sized window sneaks in (the 9-row orderBy is a Sort)
    assert(!"\\bWindow\\b".r.findFirstIn(plan).isDefined, plan.take(3000))
    // the shift/mask Morton key compiles into whole-stage codegen (the
    // Generate's input projection carries a codegen id in formatted mode)
    assert(full.contains("codegen id"), full.take(3000))
  }

  test("t33: every window is DOC-keyed (never corpus-wide); variants + " +
      "positions + schemes all fan out of ONE scan; the orig∩shift " +
      "presence test is an aggregate, not a self-join") {
    val full = planOf("t33_cdc_chunking")
    val plan = full.split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan.take(3000))
    // no join anywhere: twin construction, chunking, and the presence
    // test are explode + aggregate shapes
    assert(!plan.contains("Join"), plan.take(3000))
    // three Generates: variant twin, posexplode, scheme fan-out
    assert("Generate".r.findAllIn(plan).size == 3, plan.take(3000))
    // lag + cumsum windows exist and EVERY window spec is doc-keyed
    val specs = full.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty, full.take(3000))
    specs.foreach(l => assert(l.contains("doc_id"),
      s"corpus-sized window spec: $l"))
  }

  test("q53: all row-local checks ride ONE aggregate chain over the " +
      "feed (uniqueness folded in as a distinct aggregate — no window, " +
      "no sort-merge); referential integrity is a broadcast LEFT ANTI " +
      "that Catalyst pushes through the union branches") {
    val plan = planOf("q53_constraint_audit").split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin LeftAnti"), plan.take(3000))
    // the wide agg plans as partial+final (with the distinct's extra
    // grouping phases), all HashAggregate — nothing sort-based
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("SortAggregate") &&
      !"\\bWindow\\b".r.findFirstIn(plan).isDefined, plan.take(3000))
  }

  test("m10: segmentation windows are DOC-keyed (frame count per video " +
      "bounds the partition); one scan, no joins") {
    val full = planOf("m10_scene_cuts")
    val plan = full.split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    val specs = full.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty, full.take(3000))
    specs.foreach(l => assert(l.contains("doc_id"),
      s"corpus-sized window spec: $l"))
  }
}
