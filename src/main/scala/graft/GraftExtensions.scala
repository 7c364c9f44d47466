package graft

import graft.functions.{ArrayCosine, ArrayDot, GoBoolParse, MinHashSig, SimHash64}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Exposes the engine's custom Catalyst expressions to SQL — both
  * through `SparkSessionExtensions` (for
  * `spark.sql.extensions=graft.GraftExtensions` at session build) and
  * imperatively on a live session via [[GraftFunctions.registerAll]].
  *
  * After registration: `SELECT go_bool(c)`, `array_dot(a,b)`,
  * `array_cosine(a,b)`, `minhash_sig(sh, k)`, `simhash64(hs)` work in
  * plain SQL text, so `spark.sql`-driven pipelines get the same native
  * kernels as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // Session-lifecycle hook: the check-rule builder is the one
    // extension point handed the live SparkSession, so it doubles as
    // per-session init — registering the application-end eviction
    // listener that drops the d09 label cache's entries (and deletes
    // their parquet handoff dirs) when the session's context stops.
    // The rule itself is a no-op; registration is idempotent per appId.
    e.injectCheckRule { session =>
      graft.queries.DedupQueries.installEviction(session)
      _ => ()
    }
  }
}

object GraftFunctions {

  // 2-arg ctor is (className, functionName); the 3-arg form is
  // (className, DB, functionName) — passing usage there corrupts the
  // DESCRIBE FUNCTION metadata
  private def info(name: String, usage: String): ExpressionInfo = {
    val _ = usage // usage requires the deprecated 5-arg ctor; name suffices
    new ExpressionInfo(classOf[GraftExtensions].getName, name)
  }

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("go_bool", info("go_bool", "parses Go strconv.ParseBool domain"),
      (es: Seq[Expression]) => GoBoolParse(es.head)),
    ("array_dot", info("array_dot", "dot product of two double arrays"),
      (es: Seq[Expression]) => ArrayDot(es(0), es(1))),
    ("array_cosine", info("array_cosine", "cosine similarity of two double arrays"),
      (es: Seq[Expression]) => ArrayCosine(es(0), es(1))),
    ("minhash_sig", info("minhash_sig", "k minhashes of a hashed shingle set"),
      (es: Seq[Expression]) => MinHashSig(es(0), intArg(es(1), "minhash_sig k"))),
    ("simhash64", info("simhash64", "64-bit simhash of hashed tokens"),
      (es: Seq[Expression]) => SimHash64(es(0))))

  /** Imperative registration on an existing session (temp functions). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graft.FunctionRegistryBridge
        .registerTemp(spark, name, builder)
    }
}
