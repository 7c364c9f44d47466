package graft.operators

import graft.SparkSessionFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level proofs for the physical-layout claims: bucketing removes
  * the join shuffle; partitioning prunes the scan. */
class StorageLayoutSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan.toString
  }

  test("same-bucketed tables join WITHOUT a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    try {
      val a = spark.range(0, 10000).select(col("id").as("k"), (col("id") * 2).as("va"))
      val b = spark.range(0, 10000).select(col("id").as("k"), (col("id") * 3).as("vb"))
      StorageLayout.writeBucketed(a.toDF(), "bkt_a", "k", 8)
      StorageLayout.writeBucketed(b.toDF(), "bkt_b", "k", 8)
      // disable broadcast so the join would otherwise need a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = executedPlan(joined)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 10000)

      // control: the same join over plain parquet-less ranges DOES shuffle
      val plain = a.join(b, "k")
      assert(executedPlan(plain).contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("partition filter prunes directories out of the scan") {
    val base = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = spark.range(0, 1000)
      .select(col("id"), (col("id") % 10).as("bucket"))
    StorageLayout.writePartitioned(df.toDF(), base, Seq("bucket"))

    val pruned = spark.read.parquet(base).filter(col("bucket") === 3)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    // 1 of 10 partition directories survives planning
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.files.size).sum < 10)
    assert(pruned.count() == 100)
    assert(scan.metadata.get("PartitionFilters").exists(_.contains("bucket")))
  }
}
