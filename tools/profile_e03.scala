import org.apache.spark.sql.functions._
import graft._
val sfDir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
def time(name: String)(f: => Long): Unit = {
  val t0 = System.nanoTime(); val n = f
  println(f"TIMING $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
}
Tables.events(spark, sfDir).count()
// warm streaming
time("e04_warmstream") { SparkEntry.queries("e04_stream_sessionize")(spark, sfDir).count() }
time("e03_run1") { SparkEntry.queries("e03_stream_window")(spark, sfDir).count() }
time("e03_run2") { SparkEntry.queries("e03_stream_window")(spark, sfDir).count() }
time("e05_run1") { SparkEntry.queries("e05_stream_dedup")(spark, sfDir).count() }
time("e05_run2") { SparkEntry.queries("e05_stream_dedup")(spark, sfDir).count() }
System.exit(0)
