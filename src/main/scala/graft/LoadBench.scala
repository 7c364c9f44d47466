package graft

import graft.engine.Loader
import graft.engine.sink.{JdbcTableSink, TableMode}
import graft.engine.source.{CsvOptions, Generator}
import org.apache.spark.sql.SparkSession

/** The reference's published benchmark recipe (README.md:20-34 of
  * and-hom/csv2db): generate 200,000 rows × 10 cols × 32 chars
  * (~64 MB CSV), load with `--table-mode create`. The reference times
  * only the load loop; this main reports generate and load phases
  * separately, loading into embedded Derby (no PG/MySQL offline).
  *
  * Run: `sbt "runMain graft.LoadBench [rows] [cols] [width]"`
  */
object LoadBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(200000L)
    val cols = args.lift(1).map(_.toInt).getOrElse(10)
    val width = args.lift(2).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-loadbench").toString
    val t0 = System.nanoTime()
    Generator.writeCsv(spark, s"$dir/csv", rows, cols, width,
      partitions = cpus.toInt)
    val tGen = (System.nanoTime() - t0) / 1e9

    val url = "jdbc:derby:memory:loadbench;create=true"
    val t1 = System.nanoTime()
    val res = Loader.perform(spark,
      Loader.LoadConfig(s"$dir/csv", CsvOptions(), TableMode.Create),
      new JdbcTableSink(spark, url, "bench_load"))
    val tLoad = (System.nanoTime() - t1) / 1e9

    println(s"""{"metric":"load","rows":${res.rowsLoaded},"cols":$cols,"width":$width,""" +
      s""""gen_sec":$tGen,"load_sec":$tLoad,"rows_per_sec":${(res.rowsLoaded / tLoad).toLong}}""")
    spark.stop()
  }
}
