package graft

import org.apache.spark.sql.SparkSession

/** Prints a stable digest of a roster query's executed plan: md5 of
  * the formatted plan with per-run identifiers (expression ids,
  * plan ids, temp paths) stripped. Two runs of the same build print
  * the same digest iff Catalyst picked the same physical plan — the
  * committable evidence that a bench timing drift is shared-JVM
  * jitter, not a plan change (see BENCH_HISTORY.md's notes; e09 was
  * the query that needed this three rounds running).
  *
  * Session settings mirror [[Bench]] (same SPARK_GRAFT_CPUS-driven
  * parallelism and AQE config) so the digested plan is the plan the
  * bench actually executes.
  *
  * Usage: runMain graft.PlanDigest <query_name> [sfDir]
  */
object PlanDigest {

  /** Strip the per-run identifiers (expression ids, plan ids, temp and
    * file paths) that differ between two executions of the SAME plan,
    * leaving only the plan's structural text. */
  def normalize(plan: String): String = plan
    .replaceAll("#\\d+L?", "#x")
    .replaceAll("plan_id=\\d+", "plan_id=x")
    .replaceAll("id=#x", "id=x")
    .replaceAll("/tmp/\\S+", "/tmp/x")
    .replaceAll("file:\\S+", "file:x")

  def digest(plan: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(normalize(plan).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // materialize so AQE's final (re-optimized) plan is digested
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    println(s"""{"query":"$name","plan_digest":"${digest(plan)}"}""")
    spark.stop()
  }
}
