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

  test("digest differs when plan structure differs") {
    assert(PlanDigest.digest("BroadcastHashJoin [k#1]") !=
      PlanDigest.digest("SortMergeJoin [k#1]"))
  }
}
