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

object SetOps {
  /** Exact Jaccard |A∩B| / |A∪B| of two SORTED-ASCENDING distinct long
    * arrays by linear merge-count — no per-call hash structure, unlike
    * `array_intersect`+`array_union` which build one each per PAIR (the
    * honest post-count()-fix d04 profile: 317k pairs × ~52 µs; this
    * kernel runs the same pairs at ~2-4 µs). Callers own the
    * sorted-DISTINCT contract (d04Blocked emits
    * array_sort(array_distinct(...))); unsorted input would silently
    * undercount the intersection and duplicate elements would silently
    * inflate it ([1,1,2] vs [1,2] reading 2/3 instead of 1.0), so the
    * kernel fails loudly on any strict-ascent violation — including in
    * the tail of the unexhausted array after the merge ends (a=[1],
    * b=[1,3,3] would otherwise silently report 1/3 for a true 1/2).
    * Still one branch per element over a single linear pass, and it
    * makes the declared contract self-enforcing instead of resting on
    * every caller remembering array_distinct. Null elements are a data
    * bug for hashed-gram sets: null. */
  def jaccardSorted(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements(); val m = b.numElements()
    if (n + m == 0) return null
    var i = 0; var j = 0; var common = 0
    var prevA = Long.MinValue; var prevB = Long.MinValue
    while (i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i); val y = b.getLong(j)
      if (i > 0 && x <= prevA) throw notAscending("left")
      if (j > 0 && y <= prevB) throw notAscending("right")
      if (x == y) { common += 1; prevA = x; prevB = y; i += 1; j += 1 }
      else if (x < y) { prevA = x; i += 1 }
      else { prevB = y; j += 1 }
    }
    // Validate the tail of whichever array the merge didn't exhaust —
    // the union size (n + m - common) is only correct if those
    // elements are distinct too.
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getLong(i)
      if (i > 0 && x <= prevA) throw notAscending("left")
      prevA = x; i += 1
    }
    while (j < m) {
      if (b.isNullAt(j)) return null
      val y = b.getLong(j)
      if (j > 0 && y <= prevB) throw notAscending("right")
      prevB = y; j += 1
    }
    java.lang.Double.valueOf(common.toDouble / (n + m - common).toDouble)
  }

  private def notAscending(side: String): IllegalArgumentException =
    new IllegalArgumentException(
      s"jaccard_sorted: $side array is not strictly ascending " +
        "(sorted distinct sets required)")
}

/** `jaccard_sorted(a, b)` — exact set Jaccard of two sorted distinct
  * BIGINT arrays, single merge pass, codegen'd. */
case class ArraySetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted requires ARRAY<BIGINT> inputs, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOps.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
      java.lang.Double $r = graft.functions.SetOps.jaccardSorted($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }"""
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArraySetJaccard =
    copy(left = l, right = r)

  override def prettyName: String = "jaccard_sorted"
}

object VectorExpressions {
  def array_dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def array_cosine(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayCosine(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def jaccard_sorted(a: Column, b: Column): Column =
    ColumnBridge.column(ArraySetJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
