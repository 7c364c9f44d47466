package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the frozen 24-bit portable sampling gate
  * ([[graft.operators.Sampling.portableGate]]).
  *
  * VALUE-IDENTICAL to the composed formula it replaces — the first six
  * hex characters of `md5(key)` read as a big-endian base-16 integer
  * are exactly the digest's first three BYTES read big-endian, so this
  * computes the same 24-bit value from the raw digest without ever
  * rendering the hex string. The composed form costs six
  * `ascii(substring(md5(x), i, 1))` subtrees; common-subexpression
  * elimination does not reach inside higher-order-function lambdas
  * (the d22/d24 `transform(...)` shingle loops), where it degrades to
  * six full md5 evaluations per element. This expression is one digest
  * per call everywhere, stays inside whole-stage codegen, and
  * allocates nothing per row (thread-local MessageDigest).
  *
  * The GATE is frozen (Sampling.scala:52-65): this class must never
  * change the mapping key→value. Its equivalence to the composed
  * formula is spec-pinned over random/unicode/null keys
  * (PortableGateSpec), and every oracle still interpolates the SQL
  * mirror [[graft.operators.Sampling.portableGateSql]], so a kernel
  * regression breaks the hash gate loudly at sf0.001.
  */
case class PortableGateExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"portable_gate requires STRING input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    PortableGateExpr.gate(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableGateExpr.gate($c);")

  override protected def withNewChildInternal(
      newChild: Expression): PortableGateExpr = copy(child = newChild)

  override def prettyName: String = "portable_gate"
}

object PortableGateExpr {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 24 bits of md5(bytes), big-endian — called from both
    * interpreted eval and generated code. */
  def gate(s: UTF8String): Int = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
  }

  /** Column API: the gate over an already-string column. */
  def portable_gate(c: Column): Column =
    ColumnBridge.column(PortableGateExpr(ColumnBridge.expression(c)))
}
