package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector kernels for the similarity operators.
  *
  * The composable form (`aggregate(zip_with(a,b,*),0,+)`) is correct but
  * Spark evaluates higher-order-function lambdas interpreted, allocating
  * an array per step — measurably dominant in ANN scans. These
  * expressions run a tight primitive loop over the unsafe array data and
  * participate in whole-stage codegen via a static kernel call, so the
  * scan stays in one generated stage.
  *
  * Accumulation order is ascending index, identical to the sequential
  * `aggregate` fold and to DuckDB's `list_cosine_similarity`, keeping
  * the oracle hash-compare bit-stable.
  */
object VectorOps {
  /** Boxed results: a null ELEMENT in either input yields SQL NULL for
    * the whole row (arrays arrive with containsNull=true from casts and
    * SQL literals; reading a null slot as 0.0 would silently corrupt
    * similarity scores). */
  /** Mismatched dimensions are a data bug — fail loudly (DuckDB's list
    * functions also error), never truncate to the shorter vector: a
    * silent truncation corrupts every similarity score downstream. */
  @inline private def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"vector dimension mismatch: $n vs ${b.numElements()}")
    n
  }

  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = checkDims(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i); i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = checkDims(a, b)
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    java.lang.Double.valueOf(ab / (math.sqrt(aa) * math.sqrt(bb)))
  }
}

abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // a null ELEMENT nulls the result even when the array itself is non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"${getClass.getSimpleName} requires ARRAY<DOUBLE> inputs, got ${l.sql}, ${r.sql}")
    }
}

/** `array_dot(a, b)` — Σ aᵢ·bᵢ in index order. */
case class ArrayDot(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: a fixed local collides when two kernel calls land in
      // the same codegen'd function (non-nullable children emit unwrapped)
      val r = ctx.freshName("r")
      s"""
      java.lang.Double $r = graft.functions.VectorOps.dot($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }"""
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)

  override def prettyName: String = "array_dot"
}

/** `array_cosine(a, b)` — cosine similarity, single pass. */
case class ArrayCosine(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
      java.lang.Double $r = graft.functions.VectorOps.cosine($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }"""
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayCosine =
    copy(left = l, right = r)

  override def prettyName: String = "array_cosine"
}

object VectorExpressions {
  def array_dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def array_cosine(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayCosine(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
