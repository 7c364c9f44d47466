package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Off-the-clock hygiene between timed queries.
    *
    * (1) Unpersist anything a query cached (d09's localCheckpoint rounds)
    * so it cannot inflate later queries' memory pressure.
    * (2) `StateStore.stop()`: a *stopped* streaming query leaves its
    * state-store providers loaded in the executor JVM, and the shared
    * maintenance thread re-snapshots every loaded provider on its 60 s
    * cycle — stealing cores from whichever batch query happens to be
    * running. That is the signature of round-4's q07–q13 / s02–s03
    * regression: a flat +0.7–0.9 s on two runs of consecutive queries
    * (two maintenance cycles), with plans unchanged. stop() unloads all
    * providers and parks the maintenance task; it is a cheap no-op when
    * nothing is loaded, and the next streaming query transparently
    * restarts it.
    */
  /** Force FULL evaluation of a result frame — the measured action for
    * every bench/soak timing. `.count()` is NOT that: Catalyst prunes
    * columns nothing downstream reads, and a global `count()` over a
    * report aggregate reads none of it, so the final aggregate's
    * expressions — exactly where queries like d02's jaccard verify
    * spend their scan-side CPU — were silently skipped (measured:
    * 0.7 s under count() vs 682 s fully evaluated on a planted d04
    * hot block; see tools/BENCH_NOTES.md r13 measurement-rule note).
    * The noop v2 sink consumes every row and every column, transfers
    * nothing to the driver, and writes nothing. */
  private[graft] def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private[graft] def scrub(spark: SparkSession): Unit = {
    // NonFatal only: an OOM or linkage error (e.g. StateStore.stop()
    // shifting on a Spark upgrade) must crash loudly, not be swallowed
    try spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] scrub unpersist failed: ${e.getMessage}") }
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] scrub StateStore.stop failed: ${e.getMessage}") }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // belt-and-suspenders with scrub(): even if a provider stays loaded,
      // the maintenance cycle never fires inside the measured window
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      // exchange reuse stays ON here (Spark default): it is the only
      // mechanism that makes self-joins one-shuffle (d13's cluster
      // pairwise scan reuses the embedding shuffle — measured +0.7 s
      // at sf0.1 without it, and at 100 TB a second full corpus
      // shuffle). The digest session differs on exactly this conf —
      // see PlanDigest.session for why that delta is sound.
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM + janino codegen spin-up, broadcast machinery,
    // and parquet page-cache priming land here, not on whichever query
    // happens to run first (a cold broadcast join costs ~6s, warm ~0.7s)
    Tables.All.foreach { t =>
      try {
        // force, not count: count() reads parquet footers only — the
        // page-cache warmup must actually read the column bytes
        if (t == "events") force(Tables.events(spark, sfDir))
        else force(Tables.t(spark, sfDir, t))
      } catch { case _: Throwable => () }
    }
    Seq("q01_agg_battery", "q04_broadcast_join", "s01_knn_brute").foreach { q =>
      try SparkEntry.queries.get(q).foreach(f => force(f(spark, sfDir)))
      catch { case _: Throwable => () }
    }
    // streaming machinery warmup: the first streaming query of a JVM
    // pays for state-store providers, WAL/offset-log classes, and the
    // stateful-operator codegen paths — fixed costs that would
    // otherwise land on e03 (~3s of its round-1 17.7s was this). A
    // two-row MemoryStream through the stateful shapes the roster
    // uses (windowed agg with watermark; transformWithState, the e04/
    // e18/e20 path since r13) warms them untimed — on a clone carrying
    // the SAME RocksDB provider streamSession defaults to, so the
    // provider's native-lib load and store-open paths are warmed too.
    try {
      val wss = spark.newSession()
      wss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      import wss.implicits._
      import org.apache.spark.sql.functions._
      implicit val sqlCtx = wss.sqlContext
      implicit val sp = wss
      val ckpt1 = java.nio.file.Files.createTempDirectory("graft_warm1_").toString
      val mem1 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, Long)]
      mem1.addData((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
        (java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 2L))
      val q1 = mem1.toDF().toDF("ts", "v")
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day")).agg(count(lit(1)))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt1)
        // the batch MUST be consumed: a no-op sink never runs the
        // stateful tasks, so batch 0 commits zero state stores and the
        // commit validation kills the stream (Expected N commits but
        // got 0) — which then skips the remaining warmups via the
        // enclosing catch, leaving the state-store machinery cold
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          b.count(); ()
        })
        .start()
      try q1.processAllAvailable() finally q1.stop()
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft_warm2_").toString
      val mem2 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.StatefulSessionize.Event]
      mem2.addData(
        graft.streaming.StatefulSessionize.Event(
          1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
        graft.streaming.StatefulSessionize.Event(
          1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 2L))
      val q2 = graft.streaming.StatefulSessionize.sessionsTws(mem2.toDS())
        .toDF().writeStream.outputMode("append")
        .option("checkpointLocation", ckpt2)
        // the batch MUST be consumed: a no-op sink never runs the
        // stateful tasks, so batch 0 commits zero state stores and the
        // commit validation kills the stream (Expected N commits but
        // got 0) — which then skips the remaining warmups via the
        // enclosing catch, leaving the state-store machinery cold
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          b.count(); ()
        })
        .start()
      try q2.processAllAvailable() finally q2.stop()
      // third stateful shape: the symmetric-hash stream-stream join
      // (e10) loads its own state-store/codegen classes
      val ckpt3 = java.nio.file.Files.createTempDirectory("graft_warm3_").toString
      val mem3 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, Long)]
      val mem4 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, Long)]
      mem3.addData((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
      mem4.addData((java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L))
      val lhs = mem3.toDF().toDF("l_ts", "k").withWatermark("l_ts", "1 day")
      val rhs = mem4.toDF().toDF("r_ts", "k2").withWatermark("r_ts", "1 day")
      val q3 = lhs.join(rhs, col("k") === col("k2") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr("INTERVAL 1 HOUR"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt3)
        // the batch MUST be consumed: a no-op sink never runs the
        // stateful tasks, so batch 0 commits zero state stores and the
        // commit validation kills the stream (Expected N commits but
        // got 0) — which then skips the remaining warmups via the
        // enclosing catch, leaving the state-store machinery cold
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          b.count(); ()
        })
        .start()
      try q3.processAllAvailable() finally q3.stop()
    } catch { case _: Throwable => () }
    scrub(spark) // drop the warmup streams' providers before the clock starts
    // triage subset: SPARK_GRAFT_ONLY=q01_agg_battery,t25_cms_heavy_hitters
    // times just those queries (same warmup/scrub discipline). Round
    // artifacts always run the full roster — this is for iterating on
    // one query's plan without paying for 144.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_BENCH_SAMPLES=N (default 1): run the timed roster N
    // full passes and record each query's MIN across passes — min, not
    // mean, because shared-host jitter is one-sided (residual load can
    // only ADD time; r12 burned a day adjudicating 103.9 vs 123.2 vs
    // 110.4 s single samples). Whole-roster passes, not per-query
    // back-to-back repeats, so pass 2 sees the same cache/JVM phase
    // mix as pass 1 rather than a warmed re-run of itself.
    val samples = sys.env.get("SPARK_GRAFT_BENCH_SAMPLES")
      .map(_.trim.toInt).filter(_ >= 1).getOrElse(1)
    def rosterPass(sample: Int): Seq[(String, Double, Boolean)] = {
      var family = ' '
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        if (name.head != family) {
          // family boundary (d→e→m→q→s→t): ask for a driver-side GC so the
          // ContextCleaner reclaims the previous family's shuffle files —
          // off the clock, so it costs the measurements nothing
          if (family != ' ') System.gc()
          family = name.head
        }
        val t0 = System.nanoTime()
        val ok =
          try { force(fn(spark, sfDir)); true }
          catch { case scala.util.control.NonFatal(e) =>
            // keep benching the rest, but make the failure attributable —
            // a swallowed exception must never read as a fast query
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // one line per query, flushed as it completes: the driver keeps only
        // the last ~2000 bytes of output, and a single 95-query JSON line is
        // ~3.5 KB — per-query lines survive truncation AND mid-bench crashes
        val tag = if (samples > 1) s""","sample":$sample""" else ""
        if (ok) println(f"""{"query":"$name","sec":$dt%.3f$tag%s}""")
        else println(f"""{"query":"$name","sec":$dt%.3f$tag%s,"failed":true}""")
        Console.flush()
        scrub(spark)
        (name, dt, ok)
      }
    }
    val passes = (1 to samples).map(rosterPass)
    // min across the passes where the query SUCCEEDED; failed only if
    // every pass failed (a query that failed once but passed once is a
    // pass with the passing time — the failure is still visible in the
    // per-query "failed":true sample lines above)
    val results = passes.head.map(_._1).map { name =>
      val runs = passes.map(_.find(_._1 == name).get)
      val okRuns = runs.filter(_._3)
      if (okRuns.nonEmpty) (name, okRuns.map(_._2).min, true)
      else (name, runs.map(_._2).min, false)
    }
    // failed queries are recorded with NEGATIVE seconds (and named in the
    // "failed" list) so no downstream total/compare can absorb a
    // time-to-exception as a legitimate measurement; the epsilon clamp
    // keeps a (theoretical) 0.0-second failure from serializing as -0.0,
    // which a "v < 0" reader would misread as a 0.00 s success
    val qs = results.map { case (k, v, ok) =>
      s"\"" + k + "\":" + (if (ok) v else -math.max(v, 0.001)) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val total = results.collect { case (_, v, true) => v }.sum
    // n_passed/n_failed travel WITH the total: "value" sums only passing
    // queries, so a headline like 127s-over-129 must be impossible to
    // misread as 127s-over-the-full-roster when queries failed
    // ONE summary prefix builds both output lines — the full line and
    // the compact tail-capture line below can never desynchronize
    // host-contamination evidence (r20 verdict ask 3): loadavg before
    // our own JVM exits says whether OTHER work shared the host, and
    // sbt_running counts concurrent sbt/compile JVMs — so a cold
    // reader of BENCH_r{N}.json can adjudicate a 1351-vs-262 gap
    // mechanically instead of via verdict archaeology. Both reads are
    // best-effort: a bench must never fail on procfs shape.
    val loadavg1 =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case scala.util.control.NonFatal(_) => -1.0 }
    val sbtRunning =
      try {
        import scala.jdk.CollectionConverters._
        ProcessHandle.allProcesses().iterator().asScala.count(p =>
          p.info().commandLine().map[Boolean](c =>
            c.contains("sbt-launch") || c.contains("xsbt.boot")).orElse(false))
      } catch { case scala.util.control.NonFatal(_) => -1 }
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec",""" +
        s""""samples":$samples,""" +
        s""""loadavg1":$loadavg1,"sbt_running":$sbtRunning,""" +
        s""""n_passed":${results.count(_._3)},"n_failed":${failed.size}"""
    val line = summary +
        s""","queries":$qs,""" +
        s""""failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    // the full line never fits in a 2000-byte tail capture; persist it
    // next to the build (env-overridable, cwd by default — NOT a
    // hardcoded checkout path) so no round's per-query numbers are lost
    val lastPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      new java.io.File("BENCH_LAST.json").getAbsolutePath)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(lastPath), (line + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $lastPath: ${e.getMessage}") }
    println(line)
    // the full line is ~5 KB at 150+ queries and does NOT fit in a
    // 2000-byte stdout tail capture — a tail parser would see a
    // front-truncated fragment and record "parsed": null. So the LAST
    // two stdout lines are (a) a greppable pointer to the on-disk
    // native JSON and (b) a compact summary line (<400 bytes) that a
    // tail capture always receives whole; per-query detail lives in
    // the file. spark.stop() runs FIRST so no late shutdown logging
    // can land after them, and the final line goes through
    // System.out directly (not Scala's Console, which sbt's non-forked
    // runner intercepts and [info]-prefixes) so the tail parser gets
    // bare JSON.
    spark.stop()
    println(s"BENCH_NATIVE_JSON=$lastPath")
    Console.flush()
    System.out.println(summary + s""","sf":"$sfDir","full":"$lastPath"}""")
    System.out.flush()
  }
}
