package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch kernels for the dedup operators.
  *
  * The composable formulations (explode + K min-aggregates for MinHash,
  * explode + 64 vote-sums for SimHash) are correct but spend their time
  * in generator/aggregate machinery: the per-document sketch is really a
  * tight loop over a small long array. These expressions run that loop
  * once per row inside whole-stage codegen — no explode, no shuffle
  * until the (tiny) band join.
  *
  * Hash family: splitmix64 finalizer over (element ^ seed_k), the
  * standard public-domain mixer — one multiply-xor chain per element
  * per hash function, statistically independent across seeds.
  */
object SketchOps {
  /** splitmix64 finalizer. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** K minhashes of a long-hashed shingle set; null elements yield a
    * NULL signature (see VectorOps null policy). */
  def minhash(elems: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = elems.numElements()
    var i = 0
    while (i < n) {
      if (elems.isNullAt(i)) return null
      val e = elems.getLong(i)
      var j = 0
      while (j < k) {
        val h = mix(e ^ (j * 0xd6e8feb86659fd93L))
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted-distinct xxhash64 char w-gram set of a string — the native
    * form of d04's gram recipe, BIT-IDENTICAL to the composed SQL
    *
    * {{{ array_sort(array_distinct(CASE WHEN length(text) >= w
    *     THEN transform(sequence(1, length(text)-w+1),
    *                    i -> xxhash64(substring(text, i, w)))
    *     ELSE array(xxhash64(text)) END)) }}}
    *
    * including the two null/short edges (xxhash64 of a NULL string is
    * the unchanged seed 42; a string shorter than w hashes whole), so
    * swapping it in changes NOTHING downstream — the full d04 hash
    * oracle survives (jaccard over hashed sets equals jaccard over the
    * string grams the oracle uses, same argument as before). What it
    * removes is the interpreted higher-order-function tax: transform's
    * lambda runs outside codegen and allocates one UTF8String per gram
    * ((len−w+1) allocations per doc); this kernel walks the UTF8 bytes
    * once to index char boundaries and feeds XXH64 byte slices in
    * place — measured 2.4 s → ~0.3 s for the sf0.1 gram build. */
  def charGramHashes(t: UTF8String, w: Int): ArrayData = {
    if (t == null) return new GenericArrayData(Array(42L))
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val nb = t.numBytes
    val n = t.numChars
    if (n < w)
      return new GenericArrayData(
        Array(XXH64.hashUnsafeBytes(base, off, nb, 42L)))
    // char-start byte offsets in one pass (UTF-8 self-synchronizing)
    val offs = new Array[Int](n + 1)
    var i = 0
    var b = 0
    while (b < nb) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(t.getByte(b))
      i += 1
    }
    offs(n) = nb
    val k = n - w + 1
    val hs = new Array[Long](k)
    var g = 0
    while (g < k) {
      val s = offs(g)
      hs(g) = XXH64.hashUnsafeBytes(base, off + s, offs(g + w) - s, 42L)
      g += 1
    }
    java.util.Arrays.sort(hs)
    var m = 0
    var p = 1
    while (p < k) {
      if (hs(p) != hs(m)) { m += 1; hs(m) = hs(p) }
      p += 1
    }
    new GenericArrayData(
      if (m + 1 == k) hs else java.util.Arrays.copyOf(hs, m + 1))
  }

  /** 64-bit SimHash over token hashes: each hash votes ±1 per bit;
    * null elements yield SQL NULL. */
  def simhash(elems: ArrayData): java.lang.Long = {
    val votes = new Array[Int](64)
    val n = elems.numElements()
    var i = 0
    while (i < n) {
      if (elems.isNullAt(i)) return null
      val h = mix(elems.getLong(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

/** `minhash_sig(hashedShingles, k)` → array<long> of k minhashes. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 1024, "k must be in (0, 1024]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null element → null signature

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    SketchOps.minhash(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: a fixed local collides when two kernel calls land in
      // the same codegen'd function (non-nullable children emit unwrapped)
      val r = ctx.freshName("r")
      s"""
      org.apache.spark.sql.catalyst.util.ArrayData $r =
        graft.functions.SketchOps.minhash($c, $k);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }"""
    })

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** `simhash64(hashedTokens)` → 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null element → null signature

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<BIGINT>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    SketchOps.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
      java.lang.Long $r = graft.functions.SketchOps.simhash($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }"""
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** `char_gram_set(text, w)` → sorted-distinct array<long> of xxhash64
  * char w-grams; never null (see [[SketchOps.charGramHashes]] for the
  * exact SQL it replicates, null/short edges included). */
case class CharGramSet(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1 && width <= 64, s"width must be in [1,64], got $width")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // the composed SQL yields array(42) for a NULL string (hash of null
  // is the unchanged seed), so the kernel is total
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_gram_set requires STRING, got ${t.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    SketchOps.charGramHashes(
      if (v == null) null else v.asInstanceOf[UTF8String], width)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val in = ctx.freshName("in")
    val input =
      if (child.nullable) s"${c.isNull} ? null : ${c.value}" else s"${c.value}"
    ev.copy(
      code = c.code + code"""
        org.apache.spark.unsafe.types.UTF8String $in = ($input);
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.SketchOps.charGramHashes($in, $width);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): CharGramSet =
    copy(child = c)
  override def prettyName: String = "char_gram_set"
}

object SketchExpressions {
  def minhash_sig(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), k))
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def char_gram_set(c: Column, width: Int): Column =
    ColumnBridge.column(CharGramSet(ColumnBridge.expression(c), width))
}
