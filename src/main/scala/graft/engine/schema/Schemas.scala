package graft.engine.schema

import org.apache.spark.sql.types._

/** Schema strategies and CSV→target alignment.
  *
  * Mirrors the reference's semantics (SURVEY.md §1.3, §2.2):
  *  - the CSV side is always all-string; types come only from the target
  *    (reference `common/schema.go:144-169` — no value-based inference);
  *  - by-name alignment keeps CSV columns whose name matches a target
  *    column and drops the rest with a warning
  *    (`common/schema.go:67-83`); target columns absent from the CSV are
  *    simply not loaded (DB default/NULL fills them);
  *  - by-ordinal alignment pairs position i of the CSV with position i
  *    of the target, truncating the longer side
  *    (`common/schema.go:85-105`).
  *
  * Unlike the reference (which iterates a Go map, making INSERT column
  * order nondeterministic — `schema.go:69`), alignment here always
  * follows target-schema order.
  */
object Schemas {

  /** All-string NOT NULL schema from a CSV header row
    * (ref `common/schema.go:144-155`). */
  def headerSchema(cols: Seq[String]): StructType =
    StructType(cols.map(c => StructField(c, StringType, nullable = false)))

  /** Synthetic col0..colN names from the first record's width
    * (ref `common/schema.go:157-169`). */
  def syntheticSchema(n: Int): StructType =
    headerSchema((0 until n).map(i => s"col$i"))

  /** One aligned column: CSV source column feeding a typed target field. */
  final case class AlignedCol(csvCol: String, target: StructField)

  /** Result of aligning a CSV schema onto a target table schema.
    * `cols` is in target-schema order; `droppedCsv` are CSV columns with
    * no destination (ref warns and drops, `schema.go:71-74`);
    * `unloadedTarget` are target columns the CSV does not provide. */
  final case class Alignment(
      cols: Seq[AlignedCol],
      droppedCsv: Seq[String],
      unloadedTarget: Seq[String])

  /** Name-based alignment (ref `CreateCsvToDbSchemaByName`). Matching is
    * case-sensitive exact, like the reference's Go map lookup. */
  def alignByName(csv: StructType, target: StructType): Alignment = {
    val csvNames = csv.fieldNames.toSet
    val cols = target.fields.toSeq.collect {
      case f if csvNames.contains(f.name) => AlignedCol(f.name, f)
    }
    val targetNames = target.fieldNames.toSet
    Alignment(
      cols,
      csv.fieldNames.toSeq.filterNot(targetNames.contains),
      target.fieldNames.toSeq.filterNot(csvNames.contains))
  }

  /** Ordinal alignment (ref `CreateCsvToDbSchemaByIdx`): position i → i,
    * longer side truncated. */
  def alignByOrdinal(csv: StructType, target: StructType): Alignment = {
    val n = math.min(csv.length, target.length)
    val cols = (0 until n).map(i => AlignedCol(csv.fields(i).name, target.fields(i)))
    Alignment(
      cols,
      csv.fields.drop(n).map(_.name).toSeq,
      target.fields.drop(n).map(_.name).toSeq)
  }
}
