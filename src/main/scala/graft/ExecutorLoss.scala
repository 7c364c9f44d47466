package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-loss injection for `spark.graft.checkpoint.mode=reliable`
  * — the last untested sentence in [[graft.operators.Materialize]]'s
  * contract ("survives executor loss"). Not a ScalaTest: it spawns
  * real executor JVMs (`local-cluster[2,2,2048]`) and SIGKILLs one
  * mid-fixpoint, which is too heavy and too host-dependent for the
  * unit suite. Run manually:
  *
  * {{{
  * SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   sbt -batch "runMain graft.ExecutorLoss [sfDir]"
  * }}}
  * (SPARK_SCALA_VERSION short-circuits the launcher's source-tree
  * build-dir probe, which fails against a binary distro when executors
  * are forked by the standalone worker.)
  *
  * r15 result (sf0.01, both pipelines): executor SIGKILLed
  * mid-fixpoint, run COMPLETED, fingerprints EQUAL — the reliable-mode
  * contract holds under a real loss, not just by scaladoc.
  *
  * Protocol, per target pipeline (d09 label propagation, s24
  * hierarchical k-means — the two iterative operators whose rounds
  * flow through Materialize):
  *  1. undisturbed baseline on plain `local[4]`, result fingerprinted;
  *  2. `local-cluster[2,2,2048]` run in reliable mode; a watcher
  *     thread waits for the FIRST checkpoint files to land (proof the
  *     fixpoint is mid-flight) then `kill -9`s one
  *     CoarseGrainedExecutorBackend JVM;
  *  3. assert the run COMPLETES (standalone master replaces the
  *     executor; lost shuffle blocks recompute from the reliable
  *     checkpoint, not from dead lineage) and the fingerprint equals
  *     the baseline's.
  *
  * Exit code 0 = both pipelines survived with equal results; 1
  * otherwise. Findings land in tools/BENCH_NOTES.md. */
object ExecutorLoss {

  /** Order-insensitive content fingerprint: per-row md5 over the
    * canonical string form, summed as unsigned big-ints per column
    * position. Collect-free on the cluster side (one agg row). */
  private def fingerprint(df: DataFrame): String = {
    // null sentinel: concat_ws SKIPS nulls even with its \u0001
    // separator, so ("a", null, "b") would collide with ("a", "b",
    // null) - a collision that could adjudicate a kill-corrupted
    // result as SURVIVED
    val cols = df.columns.sorted.map(c =>
      coalesce(col(c).cast("string"), lit("<null>")))
    val rowHash = unhex(substring(md5(concat_ws("", cols: _*)), 1, 14))
    df.agg(sum(conv(hex(rowHash), 16, 10).cast("decimal(38,0)"))
        .cast("string").as("fp"),
      count(lit(1)).cast("string").as("n"))
      .collect()(0).toSeq.mkString(":")
  }

  private def pipelines(sfDir: String): Seq[(String, SparkSession => DataFrame)] = Seq(
    "d09_labelprop" -> ((s: SparkSession) =>
      graft.queries.DedupQueries.labelPropagateCollapsed(
        Soak.plantedDocsForHarness(s, sfDir))),
    "s24_hier_kmeans" -> ((s: SparkSession) =>
      SparkEntry.queries("s24_hier_kmeans")(s, sfDir)),
    // r17: ExactQuantile's adaptive level-2 path adds a SECOND
    // checkpoint site (the targeted sub-bucket census) plus two
    // driver-side probe actions between checkpoints — q58 forces that
    // branch at every SF, so a kill after the first checkpoint write
    // exercises recovery across the probe/sub-bucket stages too
    "q58_subbucket_quantile" -> ((s: SparkSession) =>
      SparkEntry.queries("q58_outlier_quantiles")(s, sfDir)),
    // r18: s27's graph beam search — the checkpoint-densest pipeline
    // on the roster (routed table, symmetrized edge frame, seed set,
    // and one checkpoint per beam round) with broadcast-join stages
    // between the sites; a kill mid-walk proves an iterative GRAPH
    // TRAVERSAL recovers, not just aggregation fixpoints
    "s27_graph_beam" -> ((s: SparkSession) =>
      SparkEntry.queries("s27_graph_beam")(s, sfDir)),
    // r19: t44's fixed-round perceptron — the feature frame plus a
    // 1-row gradient and weight checkpoint per round with a full
    // feature-scan aggregate between them; a kill mid-training proves
    // an iterative LEARNER recovers (the BpeMerge-class loop shape
    // under loss, complementing s27's graph-walk leg)
    "t44_quality_learn" -> ((s: SparkSession) =>
      SparkEntry.queries("t44_quality_learn")(s, sfDir)),
    // r20: d29 composes TWO checkpointed iterative builds in one query
    // — the d09 label fixpoint AND the t44 perceptron (both via their
    // session memos, built fresh in the kill session) feeding a
    // per-cluster election window; a kill mid-composition proves the
    // multi-build consumer shape recovers, not just each build alone
    "d29_quality_keeper" -> ((s: SparkSession) =>
      SparkEntry.queries("d29_quality_keeper")(s, sfDir)))

  private def session(master: String, mode: String, ckDir: String,
      extraCp: String): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(s"graft-executor-loss-$mode")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.checkpoint.mode", mode)
      .config("spark.graft.checkpoint.dir", ckDir)
    val withCp =
      if (master.startsWith("local-cluster"))
        b.config("spark.executor.extraClassPath", extraCp)
          // a killed executor must be survivable, not fatal: keep the
          // defaults (maxFailures 4, standalone worker respawn) but
          // make the replacement fast
          .config("spark.worker.timeout", "15")
      else b
    withCp.getOrCreate()
  }

  /** PIDs of live executor JVMs (children of the standalone worker). */
  private def executorPids(): Seq[Long] = {
    import scala.sys.process._
    Seq("bash", "-c",
      "ps -eo pid,cmd | grep CoarseGrainedExecutorBackend | grep -v grep")
      .!!.linesIterator
      .flatMap(_.trim.split("\\s+").headOption.flatMap(_.toLongOption))
      .toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    require(sys.env.contains("SPARK_HOME"),
      "local-cluster mode needs SPARK_HOME (e.g. /opt/spark) so the " +
        "standalone worker can launch executor JVMs")
    val extraCp = sys.props("java.class.path")
    var failed = false

    pipelines(sfDir).foreach { case (name, build) =>
      // leg 1: undisturbed baseline, local threads, same reliable conf
      val ck1 = java.nio.file.Files.createTempDirectory("graft-ck-base")
      val s1 = session("local[4]", "reliable", ck1.toString, extraCp)
      s1.sparkContext.setLogLevel("WARN")
      val expected = fingerprint(build(s1))
      s1.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()

      // leg 2: real executors, one murdered mid-fixpoint
      val ck2 = java.nio.file.Files.createTempDirectory("graft-ck-kill")
      val s2 = session("local-cluster[2,2,2048]", "reliable",
        ck2.toString, extraCp)
      s2.sparkContext.setLogLevel("WARN")
      @volatile var killed: Option[Long] = None
      @volatile var cancelKiller = false
      val killer = new Thread(() => {
        // wait for the first checkpoint WRITE (rdd-* dir appears) —
        // the fixpoint is provably mid-flight — then shoot an executor.
        // Kill ONLY on that proof: a deadline/cancel exit must not
        // fire (a stale killer outliving its leg would murder the NEXT
        // pipeline's executor, and a pre-checkpoint kill would report
        // a lineage recompute as reliable-checkpoint recovery).
        val deadline = System.nanoTime() + 120L * 1000000000L
        def ckStarted: Boolean = {
          // layout is <dir>/<uuid>/rdd-<id>/part-*: scan one level down
          val top = ck2.toFile.listFiles()
          top != null && top.exists { d =>
            d.isDirectory && {
              val sub = d.listFiles()
              sub != null && sub.exists(_.getName.startsWith("rdd-"))
            }
          }
        }
        var proven = false
        while (!proven && !cancelKiller && System.nanoTime() < deadline) {
          proven = ckStarted
          if (!proven) Thread.sleep(100)
        }
        if (proven && !cancelKiller) {
          val pids = executorPids()
          pids.headOption.foreach { pid =>
            Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor()
            killed = Some(pid)
            System.err.println(s"[loss] $name: killed executor pid $pid " +
              s"(of ${pids.size})")
          }
        }
      }, s"executor-killer-$name")
      killer.setDaemon(true)
      killer.start()
      val outcome =
        try {
          val got = fingerprint(build(s2))
          killer.join(5000)
          if (killed.isEmpty)
            s"INCONCLUSIVE: run finished before an executor was killed"
          else if (got == expected) "SURVIVED: fingerprints equal"
          else s"WRONG RESULT: $got != $expected"
        } catch { case scala.util.control.NonFatal(e) =>
          s"DIED: ${e.getClass.getSimpleName}: ${e.getMessage}"
        } finally {
          cancelKiller = true
          s2.stop()
          org.apache.spark.sql.SparkSession.clearActiveSession()
          org.apache.spark.sql.SparkSession.clearDefaultSession()
        }
      if (!outcome.startsWith("SURVIVED")) failed = true
      println(s"""{"executor_loss":"$name","killed":${killed.nonEmpty},""" +
        s""""outcome":"${outcome.replace("\"", "'")}"}""")
    }
    sys.exit(if (failed) 1 else 0)
  }
}
