package graft.streaming

import graft.engine.cast.ValMappers
import graft.engine.schema.Schemas
import graft.engine.sink.TableSink
import graft.engine.source.CsvOptions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous CSV ingestion — the streaming generalization of
  * [[graft.engine.Loader]] (SURVEY.md §2.11).
  *
  * The reference's "background inserter" (goroutine + bounded channel,
  * `common/inserter/background.go`) is intra-process pipelining of ONE
  * file; the Spark-native equivalent of the same idea — decouple parse
  * from insert, keep back-pressure — is a file-source stream: new CSV
  * files landing in a directory flow through the same align→cast
  * projection and into the same [[TableSink]] via `foreachBatch`, with
  * `maxFilesPerTrigger` as the bounded-queue analog. Sink modes
  * compose unchanged because each micro-batch is an ordinary DataFrame
  * append inside one task-parallel write.
  */
object StreamingLoader {

  final case class StreamConfig(
      dir: String,
      csv: CsvOptions = CsvOptions(),
      schema: StructType,                 // declared: streams cannot infer
      alignment: Option[graft.engine.Loader.AlignmentMode] = None,
      maxFilesPerTrigger: Int = 16) {
    /** Same default rule as batch [[graft.engine.Loader.LoadConfig]]:
      * header → ByName, else ByOrdinal, explicit override wins. */
    def resolvedAlignment: graft.engine.Loader.AlignmentMode =
      alignment.getOrElse(
        if (csv.header) graft.engine.Loader.ByName
        else graft.engine.Loader.ByOrdinal)
  }

  /** Start the ingest stream into `sink`. The target table must exist
    * (streaming load is `as-is` append by nature — DDL modes belong to
    * batch). Caller owns the returned query's lifecycle. */
  def start(spark: SparkSession, cfg: StreamConfig, sink: TableSink): StreamingQuery = {
    require(sink.exists(), "streaming load requires an existing target table")
    val target = sink.schema()
    val align = cfg.resolvedAlignment match {
      case graft.engine.Loader.ByName    => Schemas.alignByName(cfg.schema, target)
      case graft.engine.Loader.ByOrdinal => Schemas.alignByOrdinal(cfg.schema, target)
    }
    require(align.cols.nonEmpty, "no CSV columns align with the target table")

    val raw = spark.readStream
      .schema(StructType(cfg.schema.fields.map(_.copy(nullable = true))))
      .option("header", cfg.csv.header.toString)
      .option("sep", cfg.csv.delimiter.toString)
      .option("encoding", cfg.csv.encoding)
      .option("mode", "FAILFAST")
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger.toString)
      .csv(cfg.dir)
      .na.fill("")

    val projected = raw.select(
      align.cols.map(a => ValMappers.mapper(a.csvCol, a.target)): _*)

    projected.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        sink.append(batch)
      }
      .start()
  }
}
