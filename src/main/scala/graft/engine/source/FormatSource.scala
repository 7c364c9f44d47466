package graft.engine.source

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-parametric table IO. The reference reads only CSV
  * (SURVEY.md §2.1); Spark's DataSource V2 gives the columnar formats
  * for free, and the engine exposes them uniformly — parquet/orc for
  * analytic storage (predicate pushdown + column pruning at the scan),
  * json for interchange, csv via [[CsvSource]] semantics.
  */
object FormatSource {

  val Supported: Set[String] = Set("csv", "parquet", "orc", "json")

  def read(spark: SparkSession, format: String, path: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(Supported.contains(format), s"unsupported format: $format")
    val r = spark.read.options(options)
    val withSchema = schema.fold(r)(r.schema)
    format match {
      case "csv"     => withSchema.option("mode", "FAILFAST").csv(path)
      case "parquet" => withSchema.parquet(path)
      case "orc"     => withSchema.orc(path)
      case "json"    => withSchema.json(path)
    }
  }

  def write(df: DataFrame, format: String, path: String,
      mode: SaveMode = SaveMode.Overwrite,
      options: Map[String, String] = Map.empty): Unit = {
    require(Supported.contains(format), s"unsupported format: $format")
    df.write.mode(mode).options(options).format(format).save(path)
  }
}
