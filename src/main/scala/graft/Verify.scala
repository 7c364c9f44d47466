package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Oracle comparison is only meaningful under the portable signature
    // kernel: spark.graft.dedup.kernel=native makes d02/d03 diverge from
    // their committed DuckDB oracles BY DESIGN, so a stray conf flip
    // (spark-defaults, env) would turn genuine mismatches into
    // expected-looking noise. Pin the kernel here and say so, so every
    // dump is attributable to the portable path.
    spark.conf.set(graft.queries.DedupQueries.KernelConf, "portable")
    println(s"[verify] ${graft.queries.DedupQueries.KernelConf}=portable " +
      "(pinned: oracle parity requires the portable md5 kernel)")
    // dev-loop filter: SPARK_GRAFT_ONLY=e07,e08 limits the dump to the
    // named prefixes (the driver never sets it, so its runs stay full).
    // Filtered dumps land in <outDir>_partial so a truncated dump can
    // never masquerade as a full one in a later full compare, and a
    // filter that selects nothing (e.g. SPARK_GRAFT_ONLY='') fails
    // loudly instead of silently dumping zero queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val names = SparkEntry.queries.keys.filter(selected)
    require(only.isEmpty || names.nonEmpty,
      s"[verify] SPARK_GRAFT_ONLY='${sys.env("SPARK_GRAFT_ONLY")}' selects no query")
    val effOut = only match {
      case Some(o) =>
        val p = s"${outDir}_partial"
        println(s"[verify] FILTER ACTIVE (${o.mkString(",")}): " +
          s"dumping ${names.size}/${SparkEntry.queries.size} queries to $p")
        p
      case None => outDir
    }
    new java.io.File(effOut).mkdirs()
    // Failures are an ARTIFACT, not just stderr noise: a systemic break
    // (e.g. a testdata schema drift failing 19 queries with one root
    // cause) must surface as one obvious committed file, not as an
    // absence of rows in the downstream compare. Empty object {} == green
    // (the artifact is a name->error JSON map, not an array).
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // The dump runs queries from a small thread pool (guide §2.6 —
    // actions are only sequential because the driver calls them
    // sequentially; independent jobs back-fill each other's stragglers).
    // The r19–r21 CORRECTNESS artifacts came back empty `{}` three
    // rounds running, most plausibly a driver-side time budget the
    // sequential 197-query dump outgrew when the roster jumped at r19
    // — so the dump must be fast AND per-query attributable: each
    // query prints its wall seconds as it lands, so a future timeout
    // names its culprit instead of zeroing the round. Queries never
    // conf.set on the shared session (streaming fixtures clone via
    // streamSession) and memo builds race-safely (BuildMemo), so
    // concurrent dumps return the same bytes the sequential dump did.
    // Results stay coalesce(1): every result is a report-sized frame,
    // and a single part file keeps empty results readable downstream.
    // 8 threads measured at sf0.01/32 cpus: 245 s sequential → 102 s
    // wall (4 threads: 133 s); all 197 results value-identical to the
    // sequential dump both ways (r22 open logs).
    val threads = sys.env.get("SPARK_GRAFT_VERIFY_THREADS")
      .map(_.trim.toInt).filter(_ >= 1).getOrElse(8)
    val t0All = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val tasks = SparkEntry.queries.filter(kv => selected(kv._1)).toSeq
      .map { case (name, fn) =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val t0 = System.nanoTime()
            try {
              spark.sparkContext.setJobDescription(s"verify: $name")
              fn(spark, sfDir).coalesce(1).write.mode("overwrite")
                .parquet(s"$effOut/$name")
              println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.2f s")
            } catch { case e: Throwable =>
              System.err.println(f"[verify] $name FAILED in " +
                f"${(System.nanoTime() - t0) / 1e9}%.2f s: ${e.getMessage}")
              failures.synchronized {
                failures(name) =
                  s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}"
              }
            }
          }
        })
      }
    tasks.foreach(_.get())
    pool.shutdown()
    println(f"[verify] dump of ${tasks.size} queries took " +
      f"${(System.nanoTime() - t0All) / 1e9}%.1f s ($threads threads)")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$effOut/oracle_sql.json"), json)
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$effOut/VERIFY_FAILURES.json"), failJson)
    // Loud but not fatal: exiting non-zero could make the driver treat a
    // 129/148 run as a 0/148 run. The artifact is the signal.
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries FAILED — see VERIFY_FAILURES.json")
    spark.stop()
  }
}
