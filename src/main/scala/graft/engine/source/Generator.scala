package graft.engine.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic benchmark source (ref `sample/big_sample.go:12-63`):
  * rectangular random CSV data, rows × cols × cell width. The reference
  * generates on one thread and writes one file; here `spark.range`
  * partitions the keyspace so generation is cluster-parallel and
  * deterministic per row id (seeded hash, not a stateful RNG).
  */
object Generator {

  private val Alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  /** Deterministic random-looking table: `cols` string columns of
    * `width` chars derived from xxhash64(row id, col, position). */
  def randomTable(spark: SparkSession, rows: Long, cols: Int, width: Int): DataFrame = {
    val base = spark.range(rows)
    val colExprs = (0 until cols).map { c =>
      // per-cell: width chars picked by seeded hashes — pure Column
      // math, codegen'd, no driver-side data
      val chars = (0 until width).map { p =>
        element_at(lit(Alphabet.split("")),
          (pmod(xxhash64(col("id"), lit(c), lit(p)), lit(Alphabet.length)) + 1).cast("int"))
      }
      concat(chars: _*).as(s"col$c")
    }
    base.select(colExprs: _*)
  }

  /** Write as a single headerless CSV directory (the reference's
    * big-sample.csv analog). */
  def writeCsv(spark: SparkSession, path: String, rows: Long, cols: Int,
      width: Int, partitions: Int = 1): Unit =
    randomTable(spark, rows, cols, width)
      .repartition(partitions)
      .write.mode("overwrite").option("header", "false").csv(path)
}
