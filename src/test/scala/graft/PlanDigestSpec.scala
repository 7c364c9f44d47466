package graft

import org.scalatest.funsuite.AnyFunSuite

/** The digest manifest (PLAN_DIGESTS.md) is only evidence if two runs
  * of the same build produce the same digests — these tests pin the
  * normalizer against every per-run artifact class found while
  * stabilizing the manifest (8/123 queries digested unstably before). */
class PlanDigestSpec extends AnyFunSuite {

  test("normalize strips per-run identifiers (expr ids, plan ids, lambda " +
      "addresses, identity hashes, codegen stage numbers, temp paths)") {
    val a = Seq(
      "Scan parquet [doc_id#123L] plan_id=45",
      "obj@1a2b3c4d graft.X$$Lambda$2614/0x00007fd8d4d8dca8@900ffc4",
      "(9) HashAggregate [codegen id : 6]",
      "Arguments: 5",
      "file:/tmp/graft-abc/part-0.parquet").mkString("\n")
    val b = Seq(
      "Scan parquet [doc_id#999L] plan_id=7",
      "obj@ffeeddcc graft.X$$Lambda$99/0x00007fb920d8c648@900aaaa",
      "(9) HashAggregate [codegen id : 5]",
      "Arguments: 4",
      "file:/tmp/graft-zzz/part-3.parquet").mkString("\n")
    assert(PlanDigest.normalize(a) == PlanDigest.normalize(b))
  }

  test("canonBrackets sorts list elements recursively and deterministically") {
    // flat permutation (aggregate Keys order)
    assert(PlanDigest.canonBrackets("[b#x, a#x, c#x]") ==
      PlanDigest.canonBrackets("[c#x, a#x, b#x]"))
    // nested permutation (Expand's projection-of-projections, the
    // RewriteDistinctAggregates run-to-run instability)
    assert(PlanDigest.canonBrackets("[[b#x, null], [null, a#x]]") ==
      PlanDigest.canonBrackets("[[null, a#x], [b#x, null]]"))
    // different CONTENT must stay different
    assert(PlanDigest.canonBrackets("[a#x, b#x]") !=
      PlanDigest.canonBrackets("[a#x, d#x]"))
    // commas inside parens do not split elements
    assert(PlanDigest.canonBrackets("[f(a, b), c]") ==
      PlanDigest.canonBrackets("[c, f(a, b)]"))
  }

  test("normalize canonicalizes only attribute-list lines; " +
      "everything else keeps its order") {
    assert(PlanDigest.normalize("Keys [2]: [b#1, a#2]") ==
      PlanDigest.normalize("Keys [2]: [a#5, b#9]"))
    // a join condition's operand order is semantics, not listing order
    assert(PlanDigest.normalize("Join condition: (a#1 < b#2)") ==
      "Join condition: (a#x < b#x)")
    assert(PlanDigest.normalize("Join condition: (b#1 < a#2)") !=
      PlanDigest.normalize("Join condition: (a#1 < b#2)"))
  }

  test("normalize canonicalizes RewriteDistinctAggregates' gid numbering " +
      "(Expand rows, FILTER clauses, hashpartitioning key order)") {
    // real fragments from the e10 drift: two runs of the same build
    // numbered the distinct groups (click_id, purchase_id) oppositely
    val runA = Seq(
      "Arguments: [[0, delay_us#3, null, null], [1, click_id#4, null, " +
        "null], [2, null, null, purchase_id#5]], [click_id#4, " +
        "delay_us#3, gid#9, purchase_id#5]",
      "Arguments: hashpartitioning(click_id#4, purchase_id#5, gid#9, 32), " +
        "ENSURE_REQUIREMENTS, [plan_id=7]",
      "Functions [2]: [partial_count(click_id#4) FILTER (WHERE (gid#9 = 1)), " +
        "partial_count(purchase_id#5) FILTER (WHERE (gid#9 = 2))]"
    ).mkString("\n")
    val runB = Seq(
      "Arguments: [[0, delay_us#13, null, null], [1, null, null, " +
        "purchase_id#15], [2, click_id#14, null, null]], [click_id#14, " +
        "delay_us#13, gid#19, purchase_id#15]",
      "Arguments: hashpartitioning(purchase_id#15, click_id#14, gid#19, 32), " +
        "ENSURE_REQUIREMENTS, [plan_id=8]",
      "Functions [2]: [partial_count(click_id#14) FILTER (WHERE (gid#19 = 2)), " +
        "partial_count(purchase_id#15) FILTER (WHERE (gid#19 = 1))]"
    ).mkString("\n")
    assert(PlanDigest.normalize(runA) == PlanDigest.normalize(runB))
    // the RAW explain puts the gid literal LAST in each projection row
    // (the leading-int form above only exists post-sort); both must
    // canonicalize identically
    assert(PlanDigest.normalize(
        "Arguments: [[delay_us#3, null, null, 0], [click_id#4, null, " +
          "null, 1], [null, purchase_id#5, null, 2]], [gid#9]") ==
      PlanDigest.normalize(
        "Arguments: [[delay_us#13, null, null, 0], [null, " +
          "purchase_id#15, null, 1], [click_id#14, null, null, 2]], [gid#19]"))
    // ints that are not whole list elements survive (count(1), the
    // partition count operand of hashpartitioning)
    assert(PlanDigest.normalize("Functions [1]: [count(1) FILTER (WHERE " +
        "(gid#9 = 2))]").contains("count(1)"))
    // a DIFFERENT key set must stay different
    assert(PlanDigest.normalize(
        "Arguments: hashpartitioning(other#1, gid#9, 32), [plan_id=7]") !=
      PlanDigest.normalize(
        "Arguments: hashpartitioning(click_id#4, gid#9, 32), [plan_id=7]"))
    // non-gid exchanges keep their written key order (repartition(a,b)
    // vs repartition(b,a) is a real plan property)
    assert(PlanDigest.normalize(
        "Arguments: hashpartitioning(a#1, b#2, 32), x") !=
      PlanDigest.normalize(
        "Arguments: hashpartitioning(b#2, a#1, 32), x"))
  }

  test("normalize blanks NamedLambdaVariable counters (global per-JVM, " +
      "so higher-order-function plans embed session history)") {
    assert(PlanDigest.normalize(
        "Output [2]: [transform(e#1, lambdafunction(cast(lambda x_1#7 as " +
          "double), lambda x_1#7, false)) AS vec#2, vec_id#3]") ==
      PlanDigest.normalize(
        "Output [2]: [transform(e#1, lambdafunction(cast(lambda x_125#9 as " +
          "double), lambda x_125#9, false)) AS vec#2, vec_id#3]"))
  }

  test("normalize blanks lambda counters for EVERY single-letter name — " +
      "zip_with's second variable is y_N, expr() lambdas use whatever " +
      "letter the source wrote (i, q, ...), all on the same global " +
      "counter (seen flipping s02/s05/m02 when d24 joined the roster)") {
    assert(PlanDigest.normalize(
        "Arguments: zip_with(a#1, b#2, lambdafunction((lambda x_41#7 * " +
          "lambda y_41#8), lambda x_41#7, lambda y_41#8, false))") ==
      PlanDigest.normalize(
        "Arguments: zip_with(a#1, b#2, lambdafunction((lambda x_9#3 * " +
          "lambda y_9#4), lambda x_9#3, lambda y_9#4, false))"))
    assert(PlanDigest.normalize("transform(t#1, lambda i_77#5)") ==
      PlanDigest.normalize("transform(t#1, lambda i_3#9)"))
    // real column names keep their identity: only single-letter
    // prefixes are lambda variables
    assert(PlanDigest.normalize("sum_w_single#3") ==
      "sum_w_single#x")
  }

  test("normalize blanks RDD ids in localCheckpoint scans (the id is a " +
      "JVM-global counter — any earlier query spawning one extra RDD " +
      "shifts it)") {
    assert(PlanDigest.normalize(
        "Arguments: [node#1, pr#2], MapPartitionsRDD[1455] at " +
          "localCheckpoint at DedupQueries.scala:968, ExistingRDD, " +
          "UnknownPartitioning(0)") ==
      PlanDigest.normalize(
        "Arguments: [node#1, pr#2], MapPartitionsRDD[1456] at " +
          "localCheckpoint at DedupQueries.scala:968, ExistingRDD, " +
          "UnknownPartitioning(0)"))
  }

  test("normalize blanks the checkpoint call-site method AND file (6th " +
      "artifact class: direct .localCheckpoint vs the Materialize " +
      "helper vs reliable .checkpoint is deployment plumbing — the " +
      "frame Spark's CallSite picks is not plan shape)") {
    val viaDirect = PlanDigest.normalize(
      "Arguments: [node#1, pr#2], MapPartitionsRDD[1455] at " +
        "localCheckpoint at DedupQueries.scala:968, ExistingRDD, " +
        "UnknownPartitioning(0)")
    val viaHelper = PlanDigest.normalize(
      "Arguments: [node#1, pr#2], MapPartitionsRDD[201] at " +
        "materialize at Materialize.scala:50, ExistingRDD, " +
        "UnknownPartitioning(0)")
    val viaReliable = PlanDigest.normalize(
      "Arguments: [node#1, pr#2], ReliableCheckpointRDD[7] at " +
        "checkpoint at Materialize.scala:58, ExistingRDD, " +
        "UnknownPartitioning(0)")
    assert(viaDirect == viaHelper)
    assert(viaDirect == viaReliable)
  }

  test("normalize blanks partition counts on partitioning lines (runtime-" +
      "derived: CPUS setting, and AQE-coalesced checkpoint partitioning " +
      "that depends on session history — d26's manifest flip)") {
    assert(PlanDigest.normalize(
        "Arguments: hashpartitioning(doc_id#1, band#2, bucket#3, 4), " +
          "ENSURE_REQUIREMENTS, [plan_id=55]") ==
      PlanDigest.normalize(
        "Arguments: hashpartitioning(doc_id#1, band#2, bucket#3, 32), " +
          "ENSURE_REQUIREMENTS, [plan_id=56]"))
    assert(PlanDigest.normalize(
        "+- Exchange rangepartitioning(ham#5 ASC NULLS FIRST, 7), " +
          "ENSURE_REQUIREMENTS, [plan_id=1]") ==
      PlanDigest.normalize(
        "+- Exchange rangepartitioning(ham#5 ASC NULLS FIRST, 32), " +
          "ENSURE_REQUIREMENTS, [plan_id=2]"))
    // the KEY SET stays pinned — different keys must still differ
    assert(PlanDigest.normalize(
        "Exchange hashpartitioning(a#1, 32), ENSURE_REQUIREMENTS") !=
      PlanDigest.normalize(
        "Exchange hashpartitioning(b#1, 32), ENSURE_REQUIREMENTS"))
    // a USER-written repartition(n, ...) count is a plan property
    assert(PlanDigest.normalize(
        "Exchange hashpartitioning(_stage#1, 3), REPARTITION_BY_NUM") !=
      PlanDigest.normalize(
        "Exchange hashpartitioning(_stage#1, 6), REPARTITION_BY_NUM"))
    // ...and so is an integer inside a key expression
    assert(PlanDigest.normalize(
        "Exchange hashpartitioning(pmod(h#1, 16), 32), ENSURE_REQUIREMENTS") !=
      PlanDigest.normalize(
        "Exchange hashpartitioning(pmod(h#1, 32), 32), ENSURE_REQUIREMENTS"))
  }

  test("normalize blanks query-stage Statistics payloads (runtime-" +
      "measured: d03 flapped sizeInBytes 8.5 vs 64.5 MiB across " +
      "identical same-code sweeps — 7th artifact class)") {
    assert(PlanDigest.normalize(
        "+- BroadcastQueryStage (23), Statistics(sizeInBytes=64.5 MiB, " +
          "rowCount=2.00E+4)") ==
      PlanDigest.normalize(
        "+- BroadcastQueryStage (23), Statistics(sizeInBytes=8.5 MiB, " +
          "rowCount=2.00E+4)"))
    // the stage NODE itself stays pinned
    assert(PlanDigest.normalize(
        "+- BroadcastQueryStage (23), Statistics(x)") !=
      PlanDigest.normalize(
        "+- ShuffleQueryStage (23), Statistics(x)"))
  }

  test("digest differs when plan structure differs") {
    assert(PlanDigest.digest("BroadcastHashJoin [k#1]") !=
      PlanDigest.digest("SortMergeJoin [k#1]"))
  }

  test("normalize folds duplicate operator-instance detail blocks and " +
      "blanks positional ordinals (8th artifact class: q54 printed 40 " +
      "vs 41 checkpoint-scan blocks across same-code runs)") {
    // same header tree; run B prints the shared census scan's detail
    // block under two instance ids, run A under one — q54's real shape
    val header = Seq(
      "Sort (9)",
      "+- HashAggregate (8)",
      "   +- Scan ExistingRDD (7)").mkString("\n")
    def scanBlock(n: Int) = Seq(
      s"($n) Scan ExistingRDD",
      "Output [3]: [c#1L, g#2, v#3]",
      "Arguments: [c#1L, g#2, v#3], RDD[x] at x at x.scala:x, " +
        "ExistingRDD, UnknownPartitioning(0)").mkString("\n")
    val runA = header + "\n\n" + scanBlock(7)
    val runB = header + "\n\n" + scanBlock(7) + "\n\n" + scanBlock(12)
    assert(PlanDigest.normalize(runA) == PlanDigest.normalize(runB))
    // subquery hosting references are instance ids too
    assert(PlanDigest.normalize("Hosting operator id = 215") ==
      PlanDigest.normalize("Hosting operator id = 217"))
    // a DIFFERENT detail block (other schema) must NOT fold away
    val other = scanBlock(12).replace("v#3", "w#3")
    assert(PlanDigest.normalize(runA + "\n\n" + other) !=
      PlanDigest.normalize(runA))
    // and an extra occurrence in the HEADER TREE still flips the digest
    val header2 = header + "\n      +- Scan ExistingRDD (6)"
    assert(PlanDigest.normalize(header2 + "\n\n" + scanBlock(7)) !=
      PlanDigest.normalize(runA))
    // the `[codegen id : N]` detail-header tag follows which consumer's
    // codegen region planned the shared instance — near-twin blocks
    // differing only in the tag must fold (t41's census scan flapped
    // exactly this way across same-code sweeps)
    val tagged = runA.replace("(7) Scan ExistingRDD",
      "(7) Scan ExistingRDD [codegen id : 3]")
    assert(PlanDigest.normalize(tagged) == PlanDigest.normalize(runA))
  }

  test("accepted-alternates manifest rows: any member renders the same " +
    "stable cell; a third value is a violation (9th artifact class)") {
    val (accepted, note) = PlanDigest.AcceptedAlternates("d13_semantic_dedup")
    assert(accepted.size == 2)
    // both adjudicated states produce the IDENTICAL cell — a close
    // sweep landing on either writes a diff-free manifest row
    val cells = accepted.toSeq.map(d =>
      PlanDigest.manifestCell("d13_semantic_dedup", d))
    assert(cells.distinct.size == 1)
    val cell = cells.head match {
      case Left(c) => c
      case Right(err) => fail(s"accepted member rejected: $err")
    }
    accepted.foreach(d => assert(cell.contains(d)))
    assert(cell.contains(note))
    // a never-adjudicated third value fails loudly
    val bad = PlanDigest.manifestCell("d13_semantic_dedup", "deadbeef")
    assert(bad.isLeft == false)
    assert(bad.toOption.get.contains("deadbeef"))
    // ordinary rows pass through verbatim
    assert(PlanDigest.manifestCell("q01_agg_battery", "abc") == Left("abc"))
  }
}
