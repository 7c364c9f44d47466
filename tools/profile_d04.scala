// scratch profiling script for spark-shell -i -- d04 stage breakdown
import org.apache.spark.sql.functions._
import graft._
import graft.queries.DedupQueries
val sfDir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
def time(name: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime(); f
  println(f"TIMING $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s")
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()
val docs = Tables.documents(spark, sfDir)
docs.count() // warm the scan
def saltedL = DedupQueries.d04Blocked(docs.select(col("doc_id"),
  col("lang"), col("n_chars"), col("text")))
def pairsOf(s: org.apache.spark.sql.DataFrame) = {
  val a = s.select(col("lang"), col("lbucket"), col("sub"),
    col("doc_id").as("doc_a"), col("g").as("g_a"))
  val b = s.select(col("lang"), col("lbucket"), col("sub"),
    col("doc_id").as("doc_b"), col("g").as("g_b"))
  a.join(b, Seq("lang", "lbucket", "sub"))
    .filter(col("doc_a") < col("doc_b"))
    .withColumn("jaccard", graft.functions.VectorExpressions
      .jaccard_sorted(col("g_a"), col("g_b")))
    .agg(sum("jaccard"), max("jaccard"))
}
// A: as shipped (salted rebuilt per join side)
time("pairs_lazy_2x_grams") { noop(pairsOf(saltedL)) }
time("pairs_lazy_again") { noop(pairsOf(saltedL)) }
// B: salted materialized once
val sm = saltedL.localCheckpoint(true)
time("pairs_materialized") { noop(pairsOf(sm)) }
time("pairs_materialized_again") { noop(pairsOf(sm)) }
// C: gram build alone, forced
time("grams_forced") {
  noop(saltedL.select(element_at(col("g"), -1).as("x"))
    .agg(count(lit(1)), sum(col("x").cast("double"))))
}
System.exit(0)
