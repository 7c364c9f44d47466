package graft.engine.source

import java.io.InputStream
import java.nio.file.{Files, Path, StandardCopyOption}

import graft.engine.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV scan with the reference's source semantics (SURVEY.md §2.1):
  * configurable single-char delimiter, optional header, charset
  * decoding, fail-fast on malformed/ragged rows (the Go csv reader
  * enforces rectangularity and aborts — `csv2db.go:84-86`), and stdin
  * staging (Spark cannot scan a pipe; `--input-file --` becomes a
  * temp-file copy, ref `csv2db.go:174-176`).
  *
  * The scan schema is always all-string (types come from the target —
  * ref `common/schema.go:144-169`); FAILFAST makes a malformed record
  * abort the job like the reference's `log.Fatalf`.
  */
final case class CsvOptions(
    delimiter: Char = ',',
    header: Boolean = false,
    encoding: String = "UTF-8")

object CsvSource {

  /** Parse a user-supplied delimiter string, enforcing the reference's
    * single-character rule (`config.go:67-72`). `CsvOptions.delimiter`
    * is a Char, so the type enforces it downstream; this is the boundary
    * where a CLI-style string input gets validated. */
  def parseDelimiter(s: String): Char = {
    require(s.length == 1, s"delimiter must be a single character, got '$s'")
    s.head
  }

  /** Read with a known all-string schema (header used only to skip).
    *
    * Spark's CSV scan yields null for an empty cell no matter how
    * `nullValue` is set (the univocity replacement round-trips back to
    * null); Go's csv reader yields `""` — restored by the trailing
    * `na.fill("")`. The reference's `""→NULL` decision happens later,
    * per target nullability (`common/val_mapper.go:33-42`), so the scan
    * must preserve empty strings as-is. */
  def read(spark: SparkSession, path: String, opts: CsvOptions,
      schema: StructType): DataFrame =
    spark.read
      // scan as nullable: with a non-nullable declared schema Catalyst
      // constant-folds the na.fill away while the parser still emits
      // nulls for empty cells
      .schema(StructType(schema.fields.map(_.copy(nullable = true))))
      .option("header", opts.header.toString)
      .option("sep", opts.delimiter.toString)
      .option("encoding", opts.encoding)
      .option("mode", "FAILFAST")
      .option("enforceSchema", "true")
      .csv(path)
      .na.fill("")

  /** Read deriving the schema from the file itself: header names if
    * `opts.header`, else synthetic col0..colN from the first record's
    * width (ref `csv2db.go:88-106`, lazy from first record). All
    * columns are StringType. */
  def readInferringNames(spark: SparkSession, path: String, opts: CsvOptions): DataFrame = {
    // Schema-only probe (no inferSchema: Spark reads just the header
    // line / first record to size the row) — the reference does the
    // same by peeking the first CSV record.
    val probe = spark.read
      .option("header", opts.header.toString)
      .option("sep", opts.delimiter.toString)
      .option("encoding", opts.encoding)
      .csv(path)
    val schema =
      if (opts.header) Schemas.headerSchema(probe.schema.fieldNames.toSeq)
      else Schemas.syntheticSchema(probe.schema.length)
    read(spark, path, opts, schema)
  }

  /** Stage a non-seekable stream (stdin) to a temp file so Spark can
    * scan it (ref stdin support, `csv2db.go:174-176`). */
  def stageStream(in: InputStream, suffix: String = ".csv"): Path = {
    val tmp = Files.createTempFile("graft-stdin-", suffix)
    tmp.toFile.deleteOnExit()
    Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
    tmp
  }
}
