// scratch profiling script for spark-shell -i
import org.apache.spark.sql.functions._
import graft._
val sfDir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
def time(name: String)(f: => Long): Unit = {
  val t0 = System.nanoTime(); val n = f
  println(f"TIMING $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
}
// warmup like bench
Tables.All.foreach { t => try { if (t=="events") Tables.events(spark, sfDir).count() else Tables.t(spark, sfDir, t).count() } catch { case _: Throwable => () } }
Seq("q01_agg_battery","q04_broadcast_join","s01_knn_brute").foreach(q => try SparkEntry.queries.get(q).foreach(_(spark,sfDir).count()) catch { case _: Throwable => () })
for (q <- Seq("q37_json_extract","q36_ntile_percentile","s01_knn_brute","q40_string_agg","q38_stats_agg","q39_bitwise","q41_salted_agg","d09_dup_clusters","s04_ivf_topk","q01_agg_battery","q02_filter_project","m03_frame_sample","s02_ann_lsh","m02_decode_features")) {
  time(q) { SparkEntry.queries(q)(spark, sfDir).count() }
}
// second run of q37 to check warm time
time("q37_again") { SparkEntry.queries("q37_json_extract")(spark, sfDir).count() }
System.exit(0)
