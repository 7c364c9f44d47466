package graft.operators

import graft.SparkSessionFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-equivalence pin for the frozen 24-bit portable gate: the
  * native [[graft.functions.PortableGateExpr]] must assign the SAME
  * value as the composed ascii/substring/md5 formula (the Spark-side
  * mirror of the DuckDB oracle expression) for every key shape the
  * roster feeds it — plain ascii, salted composites, unicode,
  * empty string, long strings, and NULL. The gate mapping is frozen
  * (Sampling.scala GATE VERSION NOTE); this spec is what lets the
  * kernel change without the mapping ever drifting.
  */
class PortableGateSpec extends AnyFunSuite {
  import SparkSessionFixture._

  test("native gate == composed formula on every key shape") {
    import spark.implicits._
    val keys: Seq[String] = Seq(
      "", "a", "abc", "hello world", "cms1:the", "cms4:zzz",
      "dsir:token", "mh16:alpha beta gamma", "scurve:12345",
      "42:shard", "élève", "中文分词",
      "emoji 😀 key", " leading", "trailing ",
      "a" * 1000, "0", "-1", "NULL", "null"
    ) ++ (1 to 500).map(i => s"k$i:${i * 2654435761L}")
    val df = (keys.map(Option(_)) :+ (None: Option[String])).toDF("k")
    val both = df.select(
      Sampling.portableGate(col("k")).as("native"),
      Sampling.portableGateComposed(col("k")).as("composed"))
    val bad = both.filter(
      !(col("native") <=> col("composed"))).count()
    assert(bad == 0L)
    // and the gate is 24-bit: never negative, never >= 2^24
    val range = both.agg(min("native"), max("native")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) < (1 << 24))
  }

  test("native gate stays inside whole-stage codegen (no fallback)") {
    // a real scan, not a local Seq — ConvertToLocalRelation would fold
    // a literal relation into LocalTableScan via INTERPRETED eval and
    // never exercise doGenCode
    val df = graft.Tables.documents(spark, sf0001)
      .select(Sampling.portableGate(col("doc_id").cast("string")).as("g"))
    df.collect() // forces codegen compile; a broken doGenCode throws here
    // '*(n) Project' is the whole-stage-codegen marker in the simple
    // plan string; an interpreted fallback prints a bare 'Project'
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
  }
}
