package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregation surface (SURVEY.md §2.12): user-defined aggregates
  * as `Aggregator[IN, BUF, OUT]` — merge-able buffers, so Spark runs
  * them partial (map-side) + final like any built-in aggregate.
  */
object TypedAggregators {

  /** Welford/Chan parallel variance: numerically stable under
    * partition-wise merge (naive Σx² cancels catastrophically at 100 TB
    * row counts; this is the merge-form used by Spark's own var_samp). */
  final case class VarBuf(n: Long, mean: Double, m2: Double)

  object SampleVariance extends Aggregator[Double, VarBuf, Double] {
    override def zero: VarBuf = VarBuf(0L, 0.0, 0.0)

    override def reduce(b: VarBuf, x: Double): VarBuf = {
      val n = b.n + 1
      val delta = x - b.mean
      val mean = b.mean + delta / n
      VarBuf(n, mean, b.m2 + delta * (x - mean))
    }

    override def merge(a: VarBuf, b: VarBuf): VarBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        VarBuf(n,
          a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }
    }

    override def finish(r: VarBuf): Double =
      if (r.n < 2) Double.NaN else r.m2 / (r.n - 1)

    override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Geometric mean via log-sum — exercises a non-algebraic finish. */
  final case class GeoBuf(n: Long, logSum: Double)

  object GeometricMean extends Aggregator[Double, GeoBuf, Double] {
    override def zero: GeoBuf = GeoBuf(0L, 0.0)
    override def reduce(b: GeoBuf, x: Double): GeoBuf =
      GeoBuf(b.n + 1, b.logSum + math.log(x))
    override def merge(a: GeoBuf, b: GeoBuf): GeoBuf =
      GeoBuf(a.n + b.n, a.logSum + b.logSum)
    override def finish(r: GeoBuf): Double =
      if (r.n == 0) Double.NaN else math.exp(r.logSum / r.n)
    override def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
