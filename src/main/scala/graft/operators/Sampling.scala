package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Engine-portable deterministic gate: a 24-bit integer derived from
    * the md5 hex prefix of the key, computable bit-identically in any
    * engine with md5 + ascii (the cross-engine-verified split query t07
    * builds on this). The xxhash64 gates above are faster (codegen'd,
    * no hex string) — prefer them when cross-engine replay of the exact
    * split isn't required. */
  def portableGate(key: Column): Column = {
    val h = md5(key.cast("string"))
    ascii(substring(h, 1, 1)) * 65536 +
      ascii(substring(h, 2, 1)) * 256 +
      ascii(substring(h, 3, 1))
  }

  /** Deterministic disjoint train/eval split on the portable gate:
    * eval = rows with gate mod `buckets` < `evalBuckets`. */
  def splitPortable(df: DataFrame, keyCol: String, buckets: Int = 10,
      evalBuckets: Int = 2): (DataFrame, DataFrame) = {
    val g = pmod(portableGate(col(keyCol)), lit(buckets))
    (df.filter(g >= evalBuckets), df.filter(g < evalBuckets))
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
