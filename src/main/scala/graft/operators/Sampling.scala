package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling for training-data pipelines.
  *
  * At corpus scale, `df.sample()` is NOT reproducible across runs/plans
  * (partition-seeded RNG changes with partitioning), which breaks
  * dataset versioning. Hash-gating on a stable key is: the same row
  * always lands on the same side of the gate, on any cluster layout —
  * so a "10% eval split" is a pure function of the data.
  */
object Sampling {

  /** Deterministic fraction of rows by key hash: keeps rows whose
    * seeded hash falls under `fraction` of the hash space. */
  def byKeyHash(df: DataFrame, keyCol: String, fraction: Double,
      seed: Int = 42): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val buckets = 1000000L
    df.filter(pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets)) <
      (fraction * buckets).toLong)
  }

  /** Deterministic disjoint train/eval split by key hash. */
  def split(df: DataFrame, keyCol: String, evalFraction: Double,
      seed: Int = 42): (DataFrame, DataFrame) = {
    val buckets = 1000000L
    val gate = pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets))
    val cut = (evalFraction * buckets).toLong
    (df.filter(gate >= cut), df.filter(gate < cut))
  }

  /** Per-stratum fractions (e.g. balance languages): deterministic,
    * same hash-gating applied with a per-stratum cut. */
  def stratifiedByHash(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], seed: Int = 42): DataFrame = {
    val buckets = 1000000L
    val gate = pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets))
    val cut = fractions.foldLeft(lit(0L)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit((f * buckets).toLong)).otherwise(acc)
    }
    df.filter(gate < cut)
  }
}
