package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data-layout
  * lever missing from one-key bucketing/partitioning
  * ([[StorageLayout]]): interleave the bits of two normalized sort
  * dimensions so that rows close in EITHER dimension land close in the
  * one physical sort order. Files written in z-key ranges then carry
  * tight min/max footers on BOTH columns, so a scan with a predicate on
  * either (or both) dimensions prunes most files — where a layout
  * sorted by one column prunes only queries on that column and scans
  * everything for the other.
  *
  * This is the OPTIMIZE ZORDER BY shape (public Delta/Iceberg practice)
  * re-expressed on the open DataFrame surface: the z-key is pure
  * integer column algebra (shift/mask/add — whole-stage-codegen'd, no
  * UDF) and the write is Spark's own range-partitioned sort
  * (`repartitionByRange` = sample z-keys → range exchange →
  * per-partition sort → one file per range). At 100 TB the sort is the
  * only shuffle and it is embarrassingly range-parallel; everything
  * downstream is scan-time pruning for free.
  *
  * The reference (a row-streaming CSV loader, /root/reference/
  * common/loader.go:21-52) preserves input order and has no layout
  * optimizer at all; this operator exists for the scale the reference
  * never reaches.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of k non-negative long
    * columns round-robin: result bit `i·k + j` is bit `i` of column
    * `j`. Expands to shift/mask/add terms that stay inside whole-stage
    * codegen. `bits · k` ≤ 63 (result fits a signed long). */
  def interleaveN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1 && bits >= 1 && bits * k <= 63,
      s"need 1 ≤ bits·k ≤ 63, got bits=$bits k=$k")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ + _)
  }

  /** Two-dimension special case (bit `2i` from `x`, bit `2i+1` from
    * `y`) — the form the q52 oracle mirrors. */
  def interleave2(x: Column, y: Column, bits: Int): Column =
    interleaveN(Seq(x, y), bits)

  /** The identical arithmetic as ANSI/DuckDB SQL text, for oracle
    * parity: every term is `(((x >> i) & 1) << 2i)` — bit-exact in any
    * engine with 64-bit integer shifts. */
  def interleave2Sql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) + (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Min-max normalize a non-negative long column onto [0, 2^bits). The
    * bounds come in as columns (a 1-row broadcast aggregate upstream)
    * so the whole rescale stays row-local integer math:
    * `((v - lo) * (2^bits - 1)) div max(hi - lo, 1)` — Catalyst's
    * IntegralDivide, exact 64-bit, never a rounding-sensitive double
    * division.
    *
    * Range bound: the numerator is 64-bit, so the column range must
    * satisfy `hi − lo ≤ Long.MaxValue / (2^bits − 1)` (≈ 2^(63−bits));
    * a wider range would silently wrap under non-ANSI arithmetic and
    * produce garbage z-keys. The guard must also pin `lo ≤ v ≤ hi` —
    * the wrap operand is `v − lo`, which `hi − lo` only bounds when v
    * is inside the bounds, so swapped/stale bounds or an out-of-domain
    * v would wrap straight past a range-only check. Both are enforced
    * per row with `raise_error` — lo/hi are columns, so there is no
    * driver-side place to `require` them. NULL bounds (an
    * entirely-NULL column through a min/max aggregate) and NULL v
    * yield NULL, the pre-guard behavior — not a raise_error with a
    * NULL message. */
  def normalize(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.graft.ColumnBridge
    require(bits >= 1 && bits <= 62, s"bits must be in [1,62], got $bits")
    val top = (1L << bits) - 1
    val maxRange = Long.MaxValue / top
    val num = (v - lo) * lit(top)
    val den = greatest(hi - lo, lit(1L))
    // NOTE greatest() skips nulls, so den is never null — NULL bounds
    // must be caught on the inputs or they fall through to a
    // raise_error(NULL message)
    when(v.isNull || lo.isNull || hi.isNull, lit(null).cast("long"))
      .when(v.between(lo, hi) && den <= lit(maxRange),
        ColumnBridge.column(new IntegralDivide(
          ColumnBridge.expression(num), ColumnBridge.expression(den))))
      .otherwise(raise_error(
        when(v.between(lo, hi), concat(
          lit(s"zorder normalize: column range "), den.cast("string"),
          lit(s" exceeds $maxRange for bits=$bits — pre-scale the column " +
            "or reduce bits")))
          .otherwise(concat(
            lit("zorder normalize: value "), v.cast("string"),
            lit(" outside bounds ["), lo.cast("string"), lit(", "),
            hi.cast("string"),
            lit("] — swapped or stale bounds would silently wrap " +
              "the 64-bit numerator")))))
  }

  /** SQL mirror of [[normalize]] (DuckDB `//` is integer division; both
    * operands are non-negative so trunc-vs-floor cannot differ). The
    * Spark side's overflow guard is not mirrored: it never fires on
    * in-bound data, so results are identical wherever both run. Shares
    * normalize's bits bound so the two sides can never silently
    * diverge (bits=64 would compute (1L<<64)-1 == 0 here while the
    * Spark side rejects it). */
  def normalizeSql(v: String, lo: String, hi: String, bits: Int): String = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1,62], got $bits")
    val top = (1L << bits) - 1
    s"((($v) - ($lo)) * $top) // greatest(($hi) - ($lo), 1)"
  }

  /** Write `df` as parquet clustered by the z-order of long-typed
    * columns: compute the z-key, range-partition into `nFiles` z-runs
    * (sampled range exchange — the only shuffle), sort within each run,
    * drop the key, write. Each output file then spans a contiguous
    * z-range, i.e. a small hyper-rectangle of the clustered dimensions,
    * so its parquet min/max footers are tight on EVERY clustered
    * column. `bits` must cover the value range of each column
    * (pre-normalize if not). */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bits: Int, nFiles: Int, validateRange: Boolean = true): Unit = {
    require(!df.columns.contains("__z"),
      "input already has a __z column — rename it before z-ordering")
    val longs = zCols.map(c => col(c).cast("long"))
    if (validateRange) {
      // fail LOUDLY on out-of-range values: interleaveN reads only the
      // low `bits` bits, so silent truncation would alias distant keys
      // into the same z-runs and quietly destroy the clustering (every
      // file spanning the whole domain). Costs one extra scan; callers
      // that already normalized may pass validateRange = false.
      val aggs = longs.flatMap(c => Seq(min(c), max(c)))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      // all bounds null = empty input, nothing to check; a null bound
      // on SOME column means that column is entirely NULL — its own
      // loud failure, not an NPE and not a silent skip of the rest
      if (!(0 until 2 * zCols.size).forall(row.isNullAt)) {
        val bad = zCols.indices.flatMap { i =>
          if (row.isNullAt(2 * i))
            Some(s"${zCols(i)} is entirely NULL")
          else if (row.getLong(2 * i) < 0 ||
            row.getLong(2 * i + 1) >= (1L << bits))
            Some(s"${zCols(i)} in [${row.getLong(2 * i)}, " +
              s"${row.getLong(2 * i + 1)}]")
          else None
        }
        require(bad.isEmpty, s"z-order columns must lie in [0, 2^$bits): " +
          s"${bad.mkString("; ")} — normalize() them first")
      }
    }
    val z = interleaveN(longs, bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int, nFiles: Int): Unit =
    writeZOrdered(df, path, Seq(xCol, yCol), bits, nFiles)
}
