package graft.engine.cast

import graft.functions.GoBoolParse
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** String→typed coercion with the reference's exact semantics
  * (SURVEY.md §2.3, §1.4; ref `common/val_mapper.go`):
  *
  *  - `"" → NULL` only for columns the target reports nullable
  *    (`val_mapper.go:33-42`); for non-nullable string columns the empty
  *    string loads as an empty string; for non-nullable numeric/bool
  *    columns an empty string is a parse error that aborts the load
  *    (`common/inserter.go:23-26`);
  *  - numeric parses are strict (`strconv.Parse*`): any malformed cell
  *    fails the run, never silently nulls (Spark's default permissive
  *    cast) — enforced here with a raise_error guard, keeping the whole
  *    transform codegen-friendly (no UDFs);
  *  - bool parsing is Go's exact `ParseBool` domain via [[GoBoolParse]],
  *    not Spark's wider boolean cast.
  */
object ValMappers {

  /** Strict cast: null stays null, but a non-null cell that fails to
    * parse raises (Go `log.Fatalf` parity) instead of nulling. */
  def strictCast(c: Column, dt: DataType): Column = dt match {
    case StringType => c
    case BooleanType =>
      when(c.isNull, lit(null).cast(BooleanType))
        .otherwise(GoBoolParse.go_bool(c))
    case _ =>
      when(c.isNull, lit(null).cast(dt))
        .otherwise(coalesce(
          c.try_cast(dt),
          raise_error(concat(
            lit(s"cannot parse value for type ${dt.sql}: '"), c, lit("'")))
            .cast(dt)))
  }

  /** Full per-column mapper: empty-string→NULL when nullable, then
    * strict cast to the target type. */
  def mapper(csvCol: String, target: StructField): Column = {
    val src = col(csvCol)
    val pre = if (target.nullable) when(src === "", lit(null)).otherwise(src) else src
    strictCast(pre, target.dataType).as(target.name)
  }

  /** Supported target types (the reference's 7-kind domain + ShortType,
    * fixing its MySQL Int16 gap — SURVEY.md §2.3 bug note). */
  val SupportedTypes: Seq[DataType] = Seq(
    LongType, IntegerType, ShortType, ByteType,
    DoubleType, FloatType, BooleanType, StringType)
}
