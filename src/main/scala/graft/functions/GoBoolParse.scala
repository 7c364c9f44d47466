package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact-parity port of Go's `strconv.ParseBool` value domain used by the
  * reference's bool val-mapper (`common/val_mapper.go:68-70`):
  * accepts exactly `1,t,T,TRUE,true,True` → true and
  * `0,f,F,FALSE,false,False` → false; anything else is an error (the
  * reference aborts the whole load, `common/inserter.go:23-26`).
  *
  * Spark's own `cast(BooleanType)` accepts a different domain (`y`,
  * `yes`, `no`, trimmed input, any-case `tRuE`), so a native expression
  * is needed. Implemented as a codegen'd `UnaryExpression` so it stays
  * inside whole-stage codegen in the load hot path — no UDF boxing.
  */
case class GoBoolParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"GoBoolParse requires STRING input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    GoBoolParse.parse(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GoBoolParse.parse($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): GoBoolParse =
    copy(child = newChild)

  override def prettyName: String = "go_bool"
}

object GoBoolParse {
  private val TrueLits = Set("1", "t", "T", "TRUE", "true", "True")
  private val FalseLits = Set("0", "f", "F", "FALSE", "false", "False")

  /** Called from both interpreted eval and generated code. */
  def parse(s: String): Boolean =
    if (TrueLits.contains(s)) true
    else if (FalseLits.contains(s)) false
    else throw new IllegalArgumentException(
      s"""invalid Go bool syntax: "$s" (accepts 1,t,T,TRUE,true,True,0,f,F,FALSE,false,False)""")

  /** Column API: `go_bool($"c")`. */
  def go_bool(c: Column): Column =
    ColumnBridge.column(GoBoolParse(ColumnBridge.expression(c)))
}
