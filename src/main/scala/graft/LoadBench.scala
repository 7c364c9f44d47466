package graft

import graft.engine.Loader
import graft.engine.sink.{JdbcTableSink, TableMode}
import graft.engine.source.{CsvOptions, Generator}
import org.apache.spark.sql.SparkSession

/** The reference's published benchmark recipe (README.md:20-34 of
  * and-hom/csv2db): generate 200,000 rows × 10 cols × 32 chars
  * (~64 MB CSV), load with `--table-mode create`. The reference times
  * only the load loop; this main reports generate and load phases
  * separately, in TWO legs over the same generated CSV:
  *
  *  - `sink:"derby"` — the reference-parity leg: full `Loader.perform`
  *    into embedded in-memory Derby through the JDBC batch inserter
  *    (1000/ncols rows per statement, numPartitions=1 for the
  *    reference's single-transaction semantics). Derby's single-JVM
  *    B-tree is the floor here (~35k rows/s, flat across rounds) —
  *    it measures the loader path, not the engine.
  *  - `sink:"managed"` — the engine-native leg: the SAME
  *    `Loader.perform` pipeline into a managed parquet table
  *    ([[graft.engine.sink.ManagedTableSink]], `saveAsTable`) at full
  *    partition parallelism — what a 1000-executor deployment
  *    actually does with 100 TB of CSV, where no single-connection
  *    JDBC sink could keep up.
  *
  * Run: `sbt "runMain graft.LoadBench [rows] [cols] [width]"`
  */
object LoadBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(200000L)
    val cols = args.lift(1).map(_.toInt).getOrElse(10)
    val width = args.lift(2).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val dir = java.nio.file.Files.createTempDirectory("graft-loadbench").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // job-scoped warehouse: the managed leg must not write tables
      // into the checkout's spark-warehouse
      .config("spark.sql.warehouse.dir", s"$dir/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    Generator.writeCsv(spark, s"$dir/csv", rows, cols, width,
      partitions = cpus.toInt)
    val tGen = (System.nanoTime() - t0) / 1e9

    def leg(sinkName: String, sink: graft.engine.sink.TableSink): Unit = {
      val t1 = System.nanoTime()
      val res = Loader.perform(spark,
        Loader.LoadConfig(s"$dir/csv", CsvOptions(), TableMode.Create), sink)
      val tLoad = (System.nanoTime() - t1) / 1e9
      println(s"""{"metric":"load","sink":"$sinkName","rows":${res.rowsLoaded},""" +
        s""""cols":$cols,"width":$width,"gen_sec":$tGen,""" +
        s""""load_sec":$tLoad,"rows_per_sec":${(res.rowsLoaded / tLoad).toLong}}""")
    }
    leg("derby", new JdbcTableSink(spark,
      "jdbc:derby:memory:loadbench;create=true", "bench_load"))
    leg("managed", new graft.engine.sink.ManagedTableSink(spark,
      "bench_load_managed"))
    spark.stop()
  }
}
