package graft.engine

import graft.engine.cast.ValMappers
import graft.engine.schema.Schemas
import graft.engine.schema.Schemas.Alignment
import graft.engine.sink.{TableMode, TableSink}
import graft.engine.source.{CsvOptions, CsvSource}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end load pipeline — the Spark-native equivalent of the
  * reference's `CsvToDb.Perform` (ref `csv2db.go:33-119`, SURVEY.md §3 E1):
  *
  *   CSV scan (all-string, FAILFAST)
  *     → schema resolution (header / synthetic / introspected target)
  *     → alignment (by name or ordinal)
  *     → per-column strict cast + empty→NULL
  *     → table-mode DDL → append
  *
  * Where the reference streams row-by-row through a goroutine pipeline
  * (SURVEY.md §2.9 W4), this is a declarative Catalyst plan: the scan,
  * the cast `Project`, and the sink write pipeline within each task, and
  * partition parallelism replaces the single producer/consumer pair —
  * the design that scales past one node.
  */
object Loader {

  /** How CSV columns map onto target columns (ref `--by-name` flag). */
  sealed trait AlignmentMode
  case object ByName extends AlignmentMode
  case object ByOrdinal extends AlignmentMode

  final case class LoadConfig(
      path: String,
      csv: CsvOptions = CsvOptions(),
      mode: TableMode = TableMode.AsIs,
      alignment: Option[AlignmentMode] = None) {
    /** Effective alignment: explicit override, else derived from the
      * CSV shape exactly like the reference (ref csv2db.go:163-169) —
      * a header names the columns → ByName; a headerless CSV can only
      * pair by position → ByOrdinal. A header load against a reordered
      * target must NOT silently pair wrong columns. */
    def resolvedAlignment: AlignmentMode =
      alignment.getOrElse(if (csv.header) ByName else ByOrdinal)
  }

  final case class LoadResult(
      rowsLoaded: Long,
      alignment: Alignment,
      createdTable: Boolean,
      bytesRead: Long = 0L)

  def perform(spark: SparkSession, cfg: LoadConfig, sink: TableSink): LoadResult = {
    val raw = CsvSource.readInferringNames(spark, cfg.path, cfg.csv)

    val tableExists = sink.exists()
    // Mode DDL on an existing table (ref csv2db.go:219-241).
    if (tableExists) cfg.mode match {
      case TableMode.DropAndCreate => sink.drop()
      case TableMode.Truncate      => sink.truncate()
      case TableMode.DeleteAll     => sink.deleteAll()
      case _                       => ()
    }

    val mustCreate = !tableExists || cfg.mode == TableMode.DropAndCreate
    if (mustCreate) {
      // Missing-table path (ref csv2db.go:144-158): only create /
      // drop-and-create may create; the table gets the reference's
      // all-string shape, so the load is a string passthrough.
      if (cfg.mode != TableMode.Create && cfg.mode != TableMode.DropAndCreate)
        throw new IllegalStateException(
          s"table does not exist and mode ${cfg.mode} cannot create it")
      sink.createAllString(raw.schema.fieldNames.toSeq)
    }

    val target = sink.schema()
    val align = cfg.resolvedAlignment match {
      case ByName    => Schemas.alignByName(raw.schema, target)
      case ByOrdinal => Schemas.alignByOrdinal(raw.schema, target)
    }
    require(align.cols.nonEmpty, "no CSV columns align with the target table")

    // Cast Project: builds the select list from the alignment, so
    // Catalyst prunes dropped CSV columns out of the scan (SURVEY.md §4.1).
    val projected: DataFrame = raw.select(
      align.cols.map(a => ValMappers.mapper(a.csvCol, a.target)): _*)

    // byte/row progress (ref A3) via task input metrics — also the row
    // count, so the CSV is scanned exactly once (a projected.count()
    // would re-run the whole scan+cast pipeline a second time)
    val (_, progress) = ProgressListener.tracking(spark) {
      sink.append(projected)
    }
    LoadResult(progress.recordsRead.get(), align, mustCreate,
      progress.bytesRead.get())
  }
}
