package graft.queries

import graft.Tables
import graft.operators.Materialize.MaterializeOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table: sessionization,
  * as-of (point-in-time) join, and a Structured Streaming windowed
  * aggregation.
  *
  * Scale notes: sessionization and the as-of join both shuffle once on
  * the entity key and then run linear per-partition window passes —
  * the sort-merge formulation that holds at any event volume (no
  * per-key driver state, no cross join). The as-of join is the
  * union-sentinel pattern: tag both sides, sort by (key, time, tag),
  * propagate the last order attributes forward — one shuffle, one sort,
  * no range explosion.
  */
object EventQueries {

  /** Epoch seconds with fractional µs — `ts` is the canonical µs
    * TimestampType from [[Tables.normalizeEventTs]], so this matches
    * DuckDB `epoch(ts)` of the same file exactly. */
  private def epochSec = col("ts").cast("double")

  /** e25 synthetic day axis: documents stream in as day = doc_id %
    * FertDays; the LAST day carries the planted word-reversal drift.
    * 6 days keeps ≥ ~80 docs per (day, lang) window at sf0.001, far
    * above the fertility-noise floor for the 1.08× drift gate (the
    * measured planted ratio is ~1.16×, clean days ~1.00×). */
  val FertDays = 6

  /** e12's complete-mode precondition, asserted loudly: a complete-mode
    * sink's final batch is only THE answer when the bounded replay
    * arrived as a single micro-batch. Multiple batch ids mean the
    * source fed the query incrementally — complete mode then re-emitted
    * a growing prefix of results per batch (O(total) per-batch cost,
    * the shape that does not scale on an unbounded stream; e04's
    * flatMapGroupsWithState operator is the scale path) and the sink
    * holds more than one emission. Failing fast here keeps the pattern
    * from being silently lifted onto a multi-batch source. */
  private[graft] def boundedReplayGuard(out: DataFrame): DataFrame = {
    require(!out.isEmpty, "e12: streaming sink produced zero rows") // see e04
    require(out.select("batch_id").distinct().count() == 1,
      "e12: bounded replay must arrive as one micro-batch (the single " +
        "complete-mode emission is then the final sessionization); a " +
        "multi-batch source must use the e04 operator instead")
    out
  }

  /** Session clone for a stateful stream, with shuffle/state
    * partitioning sized to the stream's STATE volume (conf
    * `spark.graft.stream.statePartitions`, default 8) instead of the
    * batch roster's width.
    *
    * Why a stream sizes this separately — two scale facts:
    * (1) Structured Streaming freezes the state partition count into
    * the checkpoint at first start, so it is a deliberate per-stream
    * choice, exactly like sizing `shuffle.partitions` to data volume.
    * The bounded replays here hold at most a few hundred thousand
    * state rows; 32 state partitions is pure per-store fixed overhead
    * for that volume, while everything upstream of the stateful
    * exchange keeps the session's full scan/shuffle parallelism. A
    * deployment with larger state raises the conf BEFORE first start.
    * (2) Every state store instance multiplies per-micro-batch
    * checkpoint I/O: delta file + CRC per store per batch, plus dirs.
    * On a local filesystem without Hadoop native IO, each create runs
    * RawLocalFileSystem.setPermission, which FORKS a chmod process —
    * thread dumps during e10's 32-partition micro-batch showed all 32
    * tasks at ~60 ms CPU but ~5 s wall, blocked in
    * ChecksumCheckpointFileManager/Shell.execCommand fork storms
    * (~500 forks per batch for the join's 4 stores × 32 partitions);
    * fork cost tracks the JVM's heap size, which is what made e10's
    * bench time flip between ~2 s and ~5-6 s across rounds
    * (tools/BENCH_NOTES.md). A cluster checkpointing to HDFS/object
    * storage with native IO doesn't pay the fork, but still pays
    * per-store open/commit — sizing state partitions to state volume
    * is the correct design in both worlds.
    *
    * The clone shares the SparkContext but owns its session conf, so
    * the shared session's batch queries are untouched (the Sessions
    * rule: never `conf.set` on a shared session inside a query). The
    * two streaming-critical confs are copied from the parent so the
    * clone behaves identically regardless of how the parent was
    * built. */
  private[graft] def streamSession(s: SparkSession): SparkSession = {
    val parts = s.conf.getOption("spark.graft.stream.statePartitions")
      .getOrElse("4")
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", parts)
    // Checkpoint-file checksums (on by default in Spark 4.1) double every
    // metadata/state create: each delta/commit/offset file gains a
    // sibling .checksum create+rename through the same
    // RawLocalFileSystem.setPermission chmod-fork path described above.
    // Corruption detection matters for long-lived production checkpoints
    // on remote storage; these bounded replays re-derive their state
    // from scratch each run, so the integrity machinery is pure fixed
    // cost here. A deployment keeping durable checkpoints re-enables it.
    ss.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong",
      s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "true"))
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
      s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "false"))
    // RocksDB state store by DEFAULT (override via
    // spark.graft.stream.stateStoreProvider on the parent session):
    // transformWithState REQUIRES it (typed column-family state), and
    // for every other stateful operator it is the 100 TB answer —
    // state lives off-heap/on-disk with incremental-checkpoint
    // changelogs, so state volume costs executor disk, not heap. The
    // legacy HDFS-backed provider remains selectable for deployments
    // pinned to it; stateless streams ignore the conf entirely.
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      s.conf.getOption("spark.graft.stream.stateStoreProvider").getOrElse(
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider"))
    // Changelog checkpointing: commit a per-batch CHANGELOG instead of
    // a full RocksDB snapshot upload — the production setting for
    // frequent small commits (snapshots still happen, asynchronously
    // every minDeltasForSnapshot batches, so recovery stays bounded).
    // Default-off upstream only for checkpoint-format compatibility
    // with pre-3.5 readers, which these replays never need. Measured
    // r21: e22 7.3 → 6.6 s at sf0.1 (commit path only — emitted rows
    // and state contents are unchanged). Overridable like the
    // provider, and a no-op for the HDFS-backed provider.
    ss.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      s.conf.getOption(
        "spark.graft.stream.rocksdbChangelogCheckpointing").getOrElse("true"))
    ss
  }

  /** Bounded streaming replay of the raw events table: declare the
    * file's own physical schema (so the source sees exactly what a
    * batch scan sees), glob-select events.parquet from the sf dir, and
    * derive the canonical (`ts` µs-Timestamp, `ts_ns` epoch-ns Long)
    * pair through [[Tables.normalizeEventTs]] — the ONE place the
    * physical ts representation is decided. Every raw-events stream in
    * the roster reads through here; a future testdata regen that
    * changes the ts encoding breaks one helper (and one named spec),
    * not nineteen queries. */
  private def eventsStream(s: SparkSession, ss: SparkSession, d: String): DataFrame =
    Tables.normalizeEventTs(
      ss.readStream
        .schema(Tables.eventsRawSchema(s, d))
        .option("pathGlobFilter", "events.parquet")
        .parquet(d))

  /** Scratch dir for a stream's sink/checkpoint, removed when the JVM
    * exits — repeated Bench/Verify runs must not accumulate state-store
    * and result files on the host. ONE static hook drains a queue of
    * registered paths (a hook Thread per call would accumulate for the
    * JVM's lifetime in a long-lived driver). */
  private val scratchDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val cleanupHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      scratchDirs.forEach(p => rm(p.toFile))
    }))
  private def tempDir(prefix: String): String = {
    cleanupHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p.toString
  }

  /** e23/e24 shared featurizer — ONE definition so the streaming
    * monitor (e23) and the batch leaderboard over its census (e24) can
    * never desynchronize on the projection family or the planted bump.
    *
    * ±1 signs per (dot projection, window position): s26's gate
    * derivation, verbatim (a 4-row driver job; literals in the plan). */
  private def e23Signs(s: SparkSession): Map[Long, Seq[Long]] =
    s.range(4).select(col("id"),
        transform(sequence(lit(0), lit(15)), i =>
          when(pmod(graft.operators.Sampling.portableGate(
            concat(lit("eproj:"), col("id").cast("string"), lit(":"),
              i.cast("string"))), lit(2)) === 1, 1L).otherwise(-1L))
          .as("sgn"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  /** Coordinate projections sampled by the s26/e23 census. */
  private val E23CoordIdx = Seq(0, 5, 32, 47)

  /** The synthesized ingest timeline over the embeddings corpus with
    * the PLANTED day-7 model bump applied to the data (day = vec_id
    * mod 10, ingest at 01:00; from day 7 the portable-gated 20% of
    * vectors arrive re-embedded, +0.25 on dims 0–15). Returns
    * (dayi, ts, v64). */
  private def e23Staged(s: SparkSession, d: String): DataFrame = {
    val gated = pmod(graft.operators.Sampling.portableGate(
      concat(lit("edrift:"), col("vec_id").cast("string"))), lit(5)) === 0
    val dayIdx = pmod(col("vec_id"), lit(10L))
    // 2024-03-01 00:00 UTC = epoch 1709251200; ingest at 01:00
    val ts = (lit(1709251200L + 3600L) + dayIdx * lit(86400L))
      .cast("timestamp").as("ts")
    val vec = transform(col("embedding"), (x, i) =>
      when(gated && dayIdx >= 7 && i < lit(16),
        x.cast("double") + lit(0.25)).otherwise(x.cast("double")))
    Tables.embeddings(s, d).select(dayIdx.as("dayi"), ts, vec.as("v64"))
  }

  /** The 8 exact-integer projections of a `v64` vector: 4 integerized
    * coordinates + 4 gate-signed 16-dim window dots. */
  private def e23Projs(signs: Map[Long, Seq[Long]]): Seq[Column] = {
    def xi6(c: Column): Column =
      floor(c * lit(1e6) + lit(0.5)).cast("long")
    E23CoordIdx.zipWithIndex.map { case (ci, p) =>
      struct(lit(p).as("proj"),
        xi6(element_at(col("v64"), ci + 1)).as("pval"))
    } ++ (0 until 4).map { p =>
      val w = if (p < 2) 0 else 32
      val sgn = array(signs(p.toLong).map(lit): _*)
      struct(lit(p + 4).as("proj"),
        aggregate(zip_with(slice(col("v64"), w + 1, 16), sgn,
          (x, sg) => sg * xi6(x)), lit(0L), (a, b) => a + b).as("pval"))
    }
  }

  /** Forced-arrival-order replay staging — ONE shared utility (e15/e18/
    * e19 each re-implemented this per query through r11, paying one
    * SEQUENTIAL scan-and-write Spark job per stage; the twins are now
    * this): each stage writes its lone part-file as its own
    * `coalesce(1)` job, all stages CONCURRENTLY from a small thread
    * pool (guide §2.6 — independent jobs back-fill each other), and
    * the part-files then rename into the source dir with ascending
    * mtimes so a `maxFilesPerTrigger=1` file stream replays the stages
    * as separate ordered micro-batches.
    *
    * Write-shape history: r11→r21 used one union + a
    * `repartition(stages.size, _stage)` + partitionBy write. That
    * shuffle routed every stage through a single reducer task anyway
    * (one task per stage index — the SAME single-writer bottleneck
    * coalesce(1) has), and paid a full shuffle of the staged rows to
    * get there. Measured r22 at sf0.1 (e22's five stages, warm,
    * min of 3): union+shuffle 0.52 s, concurrent per-stage
    * coalesce(1) 0.32 s — and at scale the removed shuffle is the
    * staged corpus crossing the wire once for nothing.
    * Harness scaffolding, not pipeline: production streams have real
    * arrival order; this manufactures one deterministically for the
    * bounded replays whose oracles depend on it. */
  private[graft] def stageReplay(prefix: String, stages: Seq[DataFrame],
      allowEmptyStages: Boolean = false): String = {
    val src = tempDir(s"graft_${prefix}_src_")
    val tmp = tempDir(s"graft_${prefix}_stage_")
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(math.max(stages.size, 1), 6))
    try stages.zipWithIndex.map { case (df, i) =>
      pool.submit(new Runnable {
        override def run(): Unit =
          df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_stage=$i")
      })
    }.foreach(_.get())
    finally pool.shutdown()
    val base = System.currentTimeMillis() - 10 * 60000L
    stages.indices.foreach { i =>
      val dir = new java.io.File(tmp, s"_stage=$i")
      val parts = Option(dir.listFiles).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
      require(parts.length == 1,
        s"$prefix: stage $i wrote ${parts.length} part files (want 1 — " +
          "a split write breaks the forced order)")
      val part = parts.head
      // coalesce(1) writes a schema-only part file even for an empty
      // stage, so the replay always gets its ordered micro-batch. A
      // CONTENT-GATED stage can legitimately select zero rows on a new
      // testdata epoch (e15's straggler gate) — but for everyone else
      // an empty stage means the input regressed, and silently staging
      // a zero-row file would surface (if at all) only as an opaque
      // oracle mismatch, so fail fast here instead. The emptiness check
      // reads the parquet footer's row count driver-side — no Spark job.
      if (!allowEmptyStages) {
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(part.getAbsolutePath),
            new org.apache.hadoop.conf.Configuration()))
        val rows = try reader.getRecordCount finally reader.close()
        require(rows > 0L,
          s"$prefix: stage $i selected ZERO rows but is not declared " +
            "content-gated (allowEmptyStages=false) — the stage frames " +
            "no longer match the testdata; fix the gate or opt in")
      }
      val dst = new java.io.File(src, s"f$i.parquet")
      require(part.renameTo(dst) &&
        dst.setLastModified(base + i * 60000L),
        s"$prefix: staging file $i failed")
    }
    src
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "e01_sessionize" -> ((s, d) => {
      // canonical integer event-time ordering (see q18) — ts_ns is
      // identical on both engines whatever precision the file carries
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val gapped = Tables.events(s, d)
        .withColumn("prev_sec", lag(epochSec, 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_sec").isNull || epochSec - col("prev_sec") > 3600.0, 1)
            .otherwise(0))
      val sessions = gapped
        .withColumn("session_idx",
          sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      sessions.groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min("event_id").as("first_event"),
          max("event_id").as("last_event"),
          floor(max(epochSec) - min(epochSec)).cast("long").as("dur_sec"))
        .orderBy("user_id", "session_idx")
    }),

    "e02_asof_join" -> ((s, d) => {
      // latest order (by o_orderdate <= event ts) per user, via the
      // union-sentinel + forward-fill window — ties on (custkey, date)
      // pre-resolved to the max orderkey so both engines agree.
      val dedupW = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val orders = Tables.orders(s, d)
        .withColumn("rn", row_number().over(dedupW)).filter(col("rn") === 1)
        .select(col("o_custkey").as("uid"), col("o_orderdate").cast("timestamp").as("t"),
          col("o_orderkey"), col("o_totalprice"), lit(0).as("kind"),
          lit(null).cast("long").as("event_id"))
      val events = Tables.events(s, d)
        .select(col("user_id").as("uid"), col("ts").as("t"),
          lit(null).cast("long").as("o_orderkey"),
          lit(null).cast("double").as("o_totalprice"), lit(1).as("kind"),
          col("event_id"))
      val merged = orders.unionByName(events)
      val w = Window.partitionBy(col("uid"))
        .orderBy(col("t"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      merged
        .withColumn("ok", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("op", last(col("o_totalprice"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("uid").as("user_id"),
          col("ok").as("o_orderkey"), col("op").as("o_totalprice"))
        .orderBy("event_id")
    }),

    // Structured Streaming: tumbling 1-day windows per event_type, fed
    // by the same parquet as a file stream. Watermark + update mode +
    // foreachBatch into a distributed parquet sink: state-store entries
    // are evicted once the watermark passes them and nothing is ever
    // materialized on the driver (the round-1 complete-mode memory sink
    // kept the whole result table in driver memory and re-emitted it
    // every batch — unbounded at 100 TB). Update mode re-emits a window
    // only when it changes, so last-update-wins compaction over
    // (key, batch_id) reconstructs the final table — the same merge a
    // key-value sink (MERGE/upsert) would do natively. Append mode is
    // NOT usable here: it holds back any window whose end exceeds the
    // final watermark, so a bounded stream would drop its last day.
    // Oracle parity additionally relies on the bounded replay arriving
    // as ONE micro-batch (a single parquet file, no maxFilesPerTrigger):
    // across batches, rows later than watermark + 1 day would be
    // dropped by design. A production deployment sizes the watermark to
    // the source's real disorder bound; the batch oracle then matches
    // up to that bound, which is the contract watermarks define.
    "e03_stream_window" -> ((s, d) => {
      val ss = streamSession(s) // state partitions sized to state volume
      val raw = eventsStream(s, ss, d)
      val agg = raw
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          RelationalQueries.rnd(sum("value"), 2).as("sum_value"))
        .select(col("win.start").cast("date").as("day"), col("event_type"),
          col("n"), col("sum_value"))
      val outDir = tempDir("graft_e03_out_")
      val ckpt = tempDir("graft_e03_ckpt_")
      val q = agg.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // do NOT coalesce here: coalesce is a narrow dependency, so
          // it would collapse the stateful-aggregate stage itself to
          // one task (all 32 state stores updated serially — measured
          // 2× slower), not just the file write
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val out = s.read.parquet(outDir)
      // Oracle parity depends on the bounded replay arriving as exactly
      // ONE micro-batch (single parquet file, no maxFilesPerTrigger):
      // across batches, rows later than watermark + 1 day in an earlier
      // batch are dropped by design and the result would come up
      // subtly short. Fail loudly if the data layout ever changes.
      // batch_id is now a PARTITION column (IdempotentSink layout), so
      // its read-back type follows partition inference — cast explicitly
      require(!out.isEmpty, "e03: streaming sink produced zero rows")
      val maxBatch = out.agg(max(col("batch_id").cast("long"))).head().getLong(0)
      require(maxBatch == 0,
        s"e03 oracle assumes a single micro-batch replay, saw batch_id up to $maxBatch — " +
          "events.parquet became multi-file or a trigger limit was set")
      val latest = Window.partitionBy(col("day"), col("event_type"))
        .orderBy(col("batch_id").desc)
      out
        .withColumn("rn", row_number().over(latest)).filter(col("rn") === 1)
        .select("day", "event_type", "n", "sum_value")
        .orderBy("day", "event_type")
    }),

    /** The stateful streaming sessionizer
      * ([[graft.streaming.StatefulSessionize]], transformWithState /
      * StatefulProcessor with a typed ValueState on RocksDB since r13;
      * the legacy flatMapGroupsWithState wrapper shares the same
      * foldBatch and stays the regression companion; O(1) state per
      * key) run over the bounded events replay as a roster query. The operator emits a session only when a LATER
      * event closes it, so on a bounded stream the emitted set is
      * exactly "every session except each user's last" — which is plain
      * SQL, giving the streaming operator a full DuckDB oracle (unlike
      * e03's windowed aggregate, this exercises custom state logic).
      * The oracle works in the millisecond domain because the operator
      * compares `Timestamp.getTime` (ms): session boundaries, ordering
      * and durations all use epoch_ms on both engines.
      */
    "e04_stream_sessionize" -> ((s, d) => {
      import s.implicits._
      val ss = streamSession(s) // state partitions sized to state volume
      val raw = eventsStream(s, ss, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .as[graft.streaming.StatefulSessionize.Event]
      // the MODERN-API twin (transformWithState + ValueState on
      // RocksDB) — the legacy flatMapGroupsWithState wrapper stays the
      // regression companion; both run the same foldBatch, and
      // OperatorsSpec runs the shared scenarios through both
      val sessions = graft.streaming.StatefulSessionize.sessionsTws(raw)(ss)
      val outDir = tempDir("graft_e04_out_")
      val ckpt = tempDir("graft_e04_ckpt_")
      val q = sessions.toDF.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // no coalesce: it would narrow the flatMapGroupsWithState
          // stage itself (see e03)
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val out = s.read.parquet(outDir)
      // cross-file invariant (Sessions.tune disables no-data
      // micro-batches): every append-mode roster query must emit on the
      // data batch itself — fail loudly, not hash-mismatch downstream
      require(!out.isEmpty, "e04: streaming sink produced zero rows")
      out
        .select("user_id", "n_events", "dur_sec", "first_event", "last_event")
        .orderBy("user_id", "first_event")
    }),

    /** Streaming ingest deduplication via `dropDuplicatesWithinWatermark`
      * — the operator a training-data pipeline puts in front of its
      * event firehose so replayed/at-least-once deliveries don't double
      * count. State per key is evicted once the watermark passes it
      * (bounded state at any volume, unlike a plain `dropDuplicates`
      * whose state grows forever on a stream). The replay is the events
      * table DOUBLED (every row delivered twice, staged as one file so
      * the bounded replay is one micro-batch); the dedup must collapse
      * it back to exactly the original table, so the oracle is the
      * plain per-type aggregate over the ORIGINAL events — duplicate
      * delivery must be invisible downstream. */
    "e05_stream_dedup" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"), col("ts"))
      // Harness scaffolding, not the measured operator: the doubled
      // replay is staged as ONE file so the bounded stream arrives as a
      // single micro-batch (the oracle's contract). repartition(1) —
      // not coalesce — keeps the upstream scan parallel and narrows
      // only the final write task; a production pipeline never stages
      // its own source like this.
      val src = tempDir("graft_e05_src_")
      ev.unionByName(ev).repartition(1).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      val ss = streamSession(s) // state partitions sized to state volume
      val deduped = ss.readStream.schema(schema).parquet(src)
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark("event_id")
      val outDir = tempDir("graft_e05_out_")
      val ckpt = tempDir("graft_e05_ckpt_")
      val q = deduped.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // no coalesce: it would narrow the dedup state stage (see e03)
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e05: streaming sink produced zero rows") // see e04
      out
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          RelationalQueries.rnd(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    }),

    /** Distribution-drift monitor — the pipeline-health check that
      * catches a broken instrumentation deploy or a source-mix shift:
      * per-day event-type distributions compared day-over-day by L1
      * distance, flagged above a threshold. The L1 numerator is
      * computed in CROSS-MULTIPLIED INTEGER space
      * (Σ |c_t·A_prev − p_t·A| over the fixed type set) so the only
      * floating-point op is one final division — no order-dependent
      * double summation, which is what makes a 5-term distance
      * hash-comparable cross-engine. One scan → 30-row daily aggregate
      * → lag window over the aggregate (never data); at 100 TB the
      * scan is the only corpus-sized stage. */
    "e13_drift_monitor" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val ev = Tables.events(s, d)
        .select(col("ts").cast("date").as("day"), col("event_type"))
      val typeCols = types.map(t =>
        sum(when(col("event_type") === t, 1L).otherwise(0L)).as("c_" + t))
      val daily = ev.groupBy("day")
        .agg(count(lit(1)).as("tot"), typeCols: _*)
      val w = Window.orderBy("day")
      val withPrev = types.foldLeft(
        daily.withColumn("prev_tot", lag("tot", 1).over(w))) { (df, t) =>
        df.withColumn("prev_c_" + t, lag("c_" + t, 1).over(w))
      }
      val l1num = types.map(t =>
        abs(col("c_" + t) * col("prev_tot") - col("prev_c_" + t) * col("tot")))
        .reduce(_ + _)
      withPrev.filter(col("prev_tot").isNotNull)
        .withColumn("l1", RelationalQueries.rnd(
          l1num.cast("double") / (col("tot") * col("prev_tot")), 6))
        .select(col("day"), col("tot").as("n_events"), col("l1"),
          (col("l1") > 0.1).as("drifted"))
        .orderBy("day")
    }),

    /** Streaming Count-Min heavy hitters — t25's mergeability claim
      * exercised in an actual multi-batch stream: the events table is
      * DELIBERATELY staged as 4 files replayed one-per-micro-batch
      * (`maxFilesPerTrigger`), each batch reduces to a 4×64 partial
      * sketch inside `foreachBatch`, partials append through the
      * idempotent batch-id sink, and the final sketch is the
      * elementwise SUM of partials — identical to the batch-built
      * sketch no matter how the replay is sliced, because counter
      * tables are associative+commutative (the contract that makes a
      * sketch a STREAMING structure; contrast e03/e12, which need the
      * bounded-replay single-batch precondition). The query asserts
      * multi-batch delivery loudly, then audits the merged estimates
      * against exact top-10 user event counts, t25's error discipline
      * (`overcount ≥ 0`). At scale: per-batch state is the constant
      * 256-row partial (no watermark, no state store — the sketch IS
      * the state), sink traffic is 256 rows per batch regardless of
      * event volume, and the probe join broadcasts the merged table.
      * Hash family is the frozen salted portableGate on the stringed
      * user id, so the streamed pipeline hash-matches the BATCH CMS
      * replica in DuckDB. */
    "e14_stream_sketch" -> ((s, d) => {
      val W = 64
      val hrows = 1 to 4
      def buckets(k: org.apache.spark.sql.Column) = array(hrows.map(i =>
        struct(lit(i).as("hrow"),
          pmod(graft.operators.Sampling.portableGate(
            concat(lit(s"cms$i:"), k)), lit(W)).as("bucket"))): _*)
      val ev = Tables.events(s, d).select(col("user_id"))
      // Harness scaffolding (see e05): stage the replay as FOUR files
      // so maxFilesPerTrigger=1 yields four genuine micro-batches.
      val src = tempDir("graft_e14_src_")
      ev.repartition(4).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      val ss = streamSession(s) // stateless; shrinks log churn only
      val outDir = tempDir("graft_e14_out_")
      val ckpt = tempDir("graft_e14_ckpt_")
      val q = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // census-first (the t25 discipline): reduce the batch to its
          // (user, count) census, then hash-explode only |users| rows —
          // the weighted per-bucket SUM is bit-identical to counting
          // raw occurrences, and the partial stays just as mergeable
          val partial = batch
            .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
            .select(col("c"),
              explode(buckets(col("user_id").cast("string"))).as("hb"))
            .groupBy(col("hb.hrow").as("hrow"), col("hb.bucket").as("bucket"))
            .agg(sum("c").as("cnt"))
            // ≤256 rows: one file per batch, not one per shuffle task
            .coalesce(1)
          graft.streaming.IdempotentSink.writeBatch(partial, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val partials = s.read.parquet(outDir)
      require(!partials.isEmpty, "e14: streaming sink produced zero rows")
      require(partials.agg(max(col("batch_id").cast("long"))).head()
          .getLong(0) >= 1,
        "e14 demonstrates MERGING across micro-batches — the replay " +
          "arrived as a single batch, so the merge path went unexercised")
      val sketch = partials.groupBy("hrow", "bucket").agg(sum("cnt").as("cnt"))
      val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
      val top = exact.orderBy(col("n_exact").desc, col("user_id")).limit(10)
      val probes = top
        .select(col("user_id"), col("n_exact"),
          explode(buckets(col("user_id").cast("string"))).as("hb"))
        .select(col("user_id"), col("n_exact"),
          col("hb.hrow").as("hrow"), col("hb.bucket").as("bucket"))
      val est = probes.join(broadcast(sketch), Seq("hrow", "bucket"))
        .groupBy("user_id", "n_exact").agg(min("cnt").as("n_est"))
      val w = Window.orderBy(col("n_exact").desc, col("user_id"))
      est.withColumn("rank", row_number().over(w))
        .withColumn("overcount", col("n_est") - col("n_exact"))
        .select(col("rank"), col("user_id"), col("n_exact"), col("n_est"),
          col("overcount"))
        .orderBy("rank")
    }),

    /** Watermark late-data audit — the drop CONTRACT of event-time
      * streaming, oracle-verified instead of assumed. Every stateful
      * query here bounds its state with a watermark (e03/e05/e10…),
      * which means rows arriving later than the allowed disorder are
      * DROPPED by design; this query measures that behavior against a
      * deterministic ground truth. The replay is staged as six files
      * whose arrival ORDER is forced (explicit mtimes; the file source
      * processes oldest-first, `maxFilesPerTrigger=1`): (1) the first
      * half of the month minus a gated "straggler" subset, (2) the
      * second half up to the 29th, (3) the last day on its own —
      * needed because the engine's late-data filter runs one batch
      * behind its eviction watermark, so the batch BEFORE the
      * stragglers must already have pushed the max event time to
      * month-end, (4) the stragglers — weeks older than even the
      * lagged watermark, every one must be dropped, (5+6) two
      * far-future sentinel rows whose only job is to advance the
      * watermark so append mode flushes all real windows (no-data
      * micro-batches are disabled on the stream session; the second
      * sentinel flushes the windows the first one closes — the
      * sentinels' own windows never close, so they never reach the
      * sink). The per-day admitted
      * counts therefore EXCLUDE exactly the stragglers, which is what
      * the DuckDB oracle computes independently from the gate formula —
      * and the query additionally requires (a) the engine's own
      * `numRowsDroppedByWatermark` metric to fire (it counts
      * post-partial-aggregation state rows, one per dropped window ×
      * upstream partition, so it proves the drop path ran but cannot
      * equal the event count) and (b) the sink's admitted total to be
      * row-exactly `total − stragglers`, so the audit cross-checks
      * Spark's metric, the sink contents, and the oracle. At scale this
      * is the nightly data-loss report a streaming ingest publishes:
      * state is watermark-bounded (~31 windows here), sink traffic is
      * closed-windows-only (append), and the audit costs one count per
      * micro-batch. */
    "e15_late_data_audit" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts_ns"), col("ts").cast("date").as("day"))
      val isEarly = col("day") <= lit("2024-01-15").cast("date")
      val lateGate = pmod(graft.operators.Sampling.portableGate(
        concat(lit("late:"), col("event_id").cast("string"))), lit(5)) === 0
      val body = ev.select(col("event_id"), col("ts_ns").as("ts"),
        col("day"), isEarly.as("early"), lateGate.as("lg"))
      val maxNs = ev.agg(max("ts_ns")).head().getLong(0)
      val dayNs = 86400L * 1000000000L
      // Harness scaffolding: force arrival order with explicit mtimes
      // (the determinism e14's order-independent sketch did not need) —
      // all six stages written by the ONE shared stageReplay job.
      // The engine's late-DATA filter runs one batch behind the
      // eviction/metrics watermark (batch N filters with the watermark
      // that governed batch N-1's eviction — observed empirically, see
      // the numRowsDroppedByWatermark note below), so the last day
      // ships as its OWN file between the bulk and the stragglers:
      // by the straggler batch even the lagged filter watermark is
      // weeks past every straggler window.
      val lastDay = col("day") > lit("2024-01-29").cast("date")
      val stragglers = body.filter(col("early") && col("lg"))
        .select("event_id", "ts")
      val nStragglers = stragglers.count()
      val src = stageReplay("e15", Seq(
        body.filter(col("early") && !col("lg")).select("event_id", "ts"),
        body.filter(!col("early") && !lastDay).select("event_id", "ts"),
        body.filter(!col("early") && lastDay).select("event_id", "ts"),
        stragglers,
        Seq((-1L, maxNs + 30 * dayNs)).toDF("event_id", "ts"),
        Seq((-2L, maxNs + 60 * dayNs)).toDF("event_id", "ts")),
        // the straggler stage is CONTENT-GATED (portableGate % 5 on a
        // testdata-epoch-dependent id set) and may legitimately select
        // zero rows on a regen — this query audits n_stragglers
        // explicitly, so an empty stage is data, not breakage
        allowEmptyStages = true)
      val ss = streamSession(s)
      val schema = s.read.parquet(src).schema
      val outDir = tempDir("graft_e15_out_")
      val ckpt = tempDir("graft_e15_ckpt_")
      val q = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("tss", timestamp_micros(expr("ts div 1000")))
        .withWatermark("tss", "1 hour")
        .groupBy(window(col("tss"), "1 day").as("win"))
        .agg(count(lit(1)).as("n_admitted"))
        .select(col("win.start").cast("date").as("day"), col("n_admitted"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val progress = q.recentProgress
      require(progress.count(_.numInputRows > 0) >= 6,
        "e15 needs the six staged files delivered as six micro-batches " +
          "— the forced arrival order collapsed")
      // numRowsDroppedByWatermark counts rows at the STATE operator,
      // i.e. after partial aggregation — one row per (window, upstream
      // partition), not per input event — so it proves the drop path
      // ran but cannot equal the straggler count. The row-exact check
      // is the sink total: every event is either admitted or a staged
      // straggler (the sentinels' windows never close, never emit).
      val dropped = progress
        .map(_.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum
      require(dropped > 0 && nStragglers > 0,
        "e15: the watermark drop path went unexercised — no late rows " +
          "were discarded (did the file order collapse?)")
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e15: streaming sink produced zero rows")
      val admitted = out.agg(sum("n_admitted")).head().getLong(0)
      val nTotal = ev.count()
      require(admitted == nTotal - nStragglers,
        s"e15: sink admitted $admitted rows, expected total $nTotal " +
          s"minus $nStragglers stragglers — the watermark dropped the " +
          "wrong set")
      out.select(col("day"), col("n_admitted")).orderBy("day")
    }),

    /** Last-touch attribution — the event-analytics join that credits
      * each conversion (`purchase`) to the user's most recent prior
      * `click`, bucketed by attribution latency. The classic
      * formulation is a per-conversion point-in-time lookup (an as-of
      * self-join); the scalable formulation used here is the e01/e02
      * shape: ONE shuffle on user_id, then a linear running
      * `max(click_ts)` window pass over each user's timeline with a
      * strictly-preceding ROWS frame — no self-join, no range
      * explosion, no per-key driver state, so the pass costs the same
      * as sessionization at any event volume. Determinism: the
      * timeline orders by (ts_ns, event_id) — ts_ns is the canonical
      * integer event-time and the frame is rows-based, so a click and
      * a purchase at the same instant resolve by event id identically
      * in both engines. Latencies are exact integer ns diffs floored to ms
      * before any double math; bucket edges are integer compares.
      * Unattributed purchases (no prior click, or the last click is
      * older than the 2 h window) surface as their own buckets rather
      * than silently vanishing — the accounting a marketing pipeline
      * publishes must sum to the conversion total. */
    "e16_attribution" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val withClick = Tables.events(s, d)
        .withColumn("click_ns",
          max(when(col("event_type") === "click", col("ts_ns"))).over(w))
      val minute = 60L * 1000000000L
      val purch = withClick.filter(col("event_type") === "purchase")
        .withColumn("lat_ns", col("ts_ns") - col("click_ns"))
        .withColumn("lat_ms", expr("(ts_ns - click_ns) div 1000000"))
        .withColumn("bucket",
          when(col("click_ns").isNull, "no_prior_click")
            .when(col("lat_ns") <= minute, "a_within_1m")
            .when(col("lat_ns") <= 60L * minute, "b_within_1h")
            .when(col("lat_ns") <= 120L * minute, "c_within_2h")
            .otherwise("expired"))
      purch.groupBy("bucket")
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct("user_id").as("n_users"),
          RelationalQueries.rnd(sum("value"), 4).as("revenue"),
          coalesce(RelationalQueries.rnd(avg("lat_ms") / 1000.0, 4),
            lit(-1.0)).as("avg_lat_sec"))
        .orderBy("bucket")
    }),

    /** Stream restart-recovery audit — the at-least-once → exactly-once
      * convergence contract of the checkpoint + idempotent-sink pair
      * ([[graft.streaming.IdempotentSink]]), EXERCISED rather than
      * assumed: every other streaming query here uses the batch-id
      * sink, but none restarts a stream, so the re-delivery path the
      * sink exists for would otherwise ship untested. The replay runs
      * once to completion; then the audit manufactures the exact crash
      * window foreachBatch's docs warn about — the sink write of the
      * final batch completed but the checkpoint commit never landed —
      * by deleting that batch's `commits/N` marker AND poisoning its
      * sink partition with a sentinel row (day 1970-01-01) that a
      * correct recovery MUST erase. A second start from the same
      * checkpoint re-delivers exactly that batch from the offset WAL;
      * dynamic partition overwrite replaces the poisoned partition
      * wholesale. The query then requires, loudly: the sentinel is
      * gone, no batch beyond the re-delivered one appeared, and the
      * summed per-day admitted counts equal the batch ground truth
      * row-exactly (the DuckDB oracle computes them independently).
      * At scale this is the ONLY restart semantics that works: replay
      * is bounded by one micro-batch regardless of corpus size, the
      * sink converges under any number of re-deliveries, and no
      * dedup-on-read is ever needed downstream. */
    "e17_restart_recovery" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts").cast("date").as("day"))
      val src = tempDir("graft_e17_src_")
      ev.repartition(3).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      val outDir = tempDir("graft_e17_out_")
      val ckpt = tempDir("graft_e17_ckpt_")
      val ss = streamSession(s) // one session: both starts share it, so
      // the restart registers against a fully-deregistered predecessor
      def runStream(): Unit = {
        val q = ss.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val partial = batch.groupBy("day")
              .agg(count(lit(1)).as("cnt"))
              .coalesce(1)
            graft.streaming.IdempotentSink.writeBatch(partial, batchId, outDir)
          }
          .start()
        try q.processAllAvailable() finally {
          q.stop()
          q.awaitTermination() // full deregistration before any restart
        }
      }
      runStream()
      val lastBatch = s.read.parquet(outDir)
        .agg(max(col("batch_id").cast("long"))).head().getLong(0)
      require(lastBatch >= 2,
        "e17 needs >=3 micro-batches so a non-trivial prefix survives " +
          "the simulated crash")
      // the at-least-once crash window: sink write landed, checkpoint
      // commit did not
      val commitFile = new java.io.File(s"$ckpt/commits/$lastBatch")
      require(commitFile.isFile, s"e17: no commit marker at $commitFile")
      require(commitFile.delete(), "e17: could not remove commit marker")
      // the local checksum filesystem writes a hidden .N.crc sibling
      // per log file; it must go too, or the re-commit's atomic rename
      // collides on the stale CRC (the same forked-chmod checksum
      // manager noted in tools/BENCH_NOTES.md)
      val crcFile = new java.io.File(s"$ckpt/commits/.$lastBatch.crc")
      if (crcFile.isFile) require(crcFile.delete(),
        "e17: could not remove commit CRC sibling")
      Seq((java.sql.Date.valueOf("1970-01-01"), -1L)).toDF("day", "cnt")
        .write.mode("overwrite").parquet(s"$outDir/batch_id=$lastBatch")
      runStream() // second start: re-delivers exactly batch `lastBatch`
      val partials = s.read.parquet(outDir)
      require(partials
          .filter(col("day") === lit("1970-01-01").cast("date")).isEmpty,
        "e17: the poisoned partition survived recovery — the batch-id " +
          "sink did not overwrite on re-delivery")
      val maxAfter = partials
        .agg(max(col("batch_id").cast("long"))).head().getLong(0)
      require(maxAfter == lastBatch,
        s"e17: recovery appended batch $maxAfter beyond the re-delivered " +
          s"$lastBatch — re-delivery must replace, never extend")
      partials.groupBy("day").agg(sum("cnt").as("n_events")).orderBy("day")
    }),

    /** Standing per-source ingest quota enforced across micro-batches —
      * [[graft.streaming.QuotaAdmission]] as a roster query: each of
      * the 20 document sources may contribute at most 10 docs to the
      * corpus EVER (a licensing cap / tenant budget), with the running
      * count held in a transformWithState ValueState on RocksDB (one
      * long per key, the smallest stateful footprint there is; the
      * legacy flatMapGroupsWithState wrapper shares the same
      * admitBatch kernel as the regression companion). The replay is staged as
      * three ascending doc_id ranges with forced arrival order (the
      * e15 mtime discipline), so "first 10 observed per source" has a
      * deterministic meaning the DuckDB oracle replicates as a plain
      * row_number() cap — and at this corpus's 20×25-doc layout the
      * quota boundary genuinely crosses a micro-batch boundary (batch
      * 1 delivers ~8 docs/source), so the state's cross-batch
      * persistence is what the id checksum verifies, not just the
      * counts. The readback joins the admitted sink against per-source
      * totals batch-side; rejection must actually occur (asserted),
      * and sink traffic per batch is remaining-quota-bounded — the
      * scale contract of a cap. */
    "e18_stream_quota" -> ((s, d) => {
      import s.implicits._
      val Quota = 10L
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val cut1 = maxId / 3
      val cut2 = 2 * maxId / 3
      // three ascending doc_id ranges, forced order (shared stageReplay)
      val src = stageReplay("e18", Seq(
        docs.filter(col("doc_id") <= cut1),
        docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
        docs.filter(col("doc_id") > cut2)))
      val ss = streamSession(s)
      val schema = s.read.parquet(src).schema
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .as[graft.streaming.QuotaAdmission.Doc]
      // modern-API twin (see e04) — same admitBatch kernel as the
      // legacy wrapper, counter in RocksDB ValueState
      val admitted = graft.streaming.QuotaAdmission.admitTws(stream, Quota)(ss)
      val outDir = tempDir("graft_e18_out_")
      val ckpt = tempDir("graft_e18_ckpt_")
      val q = admitted.toDF.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      require(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "e18 needs the three staged ranges as three micro-batches — " +
          "the forced arrival order collapsed")
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e18: streaming sink produced zero rows") // see e04
      val adm = out.groupBy("source")
        .agg(count(lit(1)).as("n_admitted"),
          sum("doc_id").as("sum_admitted_ids"))
      val res = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .join(broadcast(adm), Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
          (col("n_docs") - coalesce(col("n_admitted"), lit(0L))).as("n_rejected"),
          coalesce(col("sum_admitted_ids"), lit(0L)).as("sum_admitted_ids"))
        .orderBy("source")
      require(res.agg(sum("n_rejected")).head().getLong(0) > 0,
        "e18: the quota never rejected anything — the cap went unexercised")
      res
    }),

    /** First-seen registry on the MODERN arbitrary-state API —
      * `transformWithState` / `StatefulProcessor` with a typed
      * `ValueState` handle and the RocksDB state store it requires
      * ([[graft.streaming.FirstSeenRegistry]]; since r13 e04/e18 ride
      * the same modern API via their StatefulProcessor twins, with the
      * legacy `flatMapGroupsWithState` wrappers kept as regression
      * companions): emit each (user, event_type) key's FIRST
      * event exactly once across the stream's lifetime, suppress
      * every later arrival. The replay is staged as three
      * event_id % 3 slices with forced arrival order, so "first" is
      * deterministic ((stage, ts_ns, event_id)-minimum — most keys
      * exist in EVERY slice, so cross-batch suppression is what the
      * id checksum verifies, asserted below) and the DuckDB oracle
      * replicates it as a plain row_number over the same stage
      * derivation. Scale: one boolean of state per key in RocksDB
      * (off-heap, changelog-checkpointed — a billion-key registry
      * costs executor disk, not heap), one linear min-scan per batch
      * slice, at most one emitted row per key ever. */
    "e20_tws_first_seen" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts_ns"))
      val src = stageReplay("e20", (0 until 3).map(i =>
        ev.filter(pmod(col("event_id"), lit(3)) === i)))
      val ss = streamSession(s) // RocksDB provider is its default
      val schema = s.read.parquet(src).schema
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .as[graft.streaming.FirstSeenRegistry.Ev]
      val firsts = graft.streaming.FirstSeenRegistry.firstSeen(stream)(ss)
      val outDir = tempDir("graft_e20_out_")
      val ckpt = tempDir("graft_e20_ckpt_")
      val q = firsts.toDF.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      require(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "e20 needs the three staged slices as three micro-batches — " +
          "the forced arrival order collapsed")
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e20: streaming sink produced zero rows") // see e04
      // the registry must actually SUPPRESS: most keys recur in every
      // slice, so emitted rows must be far fewer than delivered rows
      val nOut = out.count()
      val nIn = ev.count()
      require(nOut < nIn,
        s"e20: registry suppressed nothing ($nOut emitted of $nIn)")
      out.groupBy("event_type")
        .agg(count(lit(1)).as("n_keys"),
          sum("event_id").as("first_id_chk"),
          min("ts_ns").as("min_first_ts_ns"))
        .orderBy("event_type")
    }),

    /** Streaming continuous-distribution drift monitor — e13's idea
      * (day-over-day mix drift) lifted from 5 categories to the full
      * VALUE distribution, with the census maintained BY THE STREAM:
      * a windowed (day, value)→count aggregate in update mode, merged
      * across micro-batches by the engine's state store (three staged
      * slices prove the merge — each micro-batch touches every day).
      * The drift tail then runs day-over-day exact KS off the final
      * census through [[graft.operators.KsDrift.ks2]] with the counts
      * as integer weights — KsDriftSpec's exploded-rows proof makes
      * the weighted statistic ≡ event-level KS, so the classical
      * critical value applies. Census rows explode into at most TWO
      * pair-groups (own day as current side, next day as previous
      * side), so the tail costs 2× census, never |days|×census.
      *
      * REPLAY HORIZON — the watermark is set wider than the bounded
      * replay on purpose: slices interleave in event-id order, so a
      * real 1-day watermark would drop day-w rows arriving in a later
      * slice and the counts would come up short vs the oracle. A
      * production monitor sets the real disorder bound and reads only
      * CLOSED windows; state here is bounded by the replay itself. */
    "e21_stream_ks_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("ts"), col("value"), col("event_id"))
      val src = stageReplay("e21", (0 until 3).map(i =>
        ev.filter(pmod(col("event_id"), lit(3)) === i)))
      val ss = streamSession(s)
      val schema = s.read.parquet(src).schema
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val cen = stream
        .withWatermark("ts", "3650 days") // no-drop replay horizon
        .groupBy(window(col("ts"), "1 day").as("win"), col("value"))
        .agg(count(lit(1)).as("c"))
        .select(col("win.start").cast("date").as("day"), col("value"),
          col("c"))
      val outDir = tempDir("graft_e21_out_")
      val ckpt = tempDir("graft_e21_ckpt_")
      val q = cen.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      require(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "e21 needs the three staged slices as three micro-batches — " +
          "the forced arrival order collapsed")
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e21: streaming sink produced zero rows")
      // update mode re-emits a census key whenever a batch touches it:
      // the latest batch_id per (day, value) carries the merged count
      val latest = Window.partitionBy(col("day"), col("value"))
        .orderBy(col("batch_id").cast("long").desc)
      val census = out
        .withColumn("rn", row_number().over(latest))
        .filter(col("rn") === 1)
        .select(col("day"), col("value"), col("c"))
      val pairs = census.select(explode(array(
          struct(col("day").as("pair_day"), lit(true).as("side_b")),
          struct(date_add(col("day"), 1).as("pair_day"),
            lit(false).as("side_b")))).as("p"),
          col("value"), col("c"))
        .select(col("p.pair_day").as("day"), col("p.side_b").as("side_b"),
          col("value"), col("c"))
      val ks = graft.operators.KsDrift.ks2(
        pairs, "day", "value", "side_b", weightCol = "c")
      val na = col("n_a").cast("double")
      val nb = col("n_b").cast("double")
      ks.filter(col("n_a") > 0 && col("n_b") > 0)
        .select(col("day"), col("n_a").as("n_prev"), col("n_b").as("n_cur"),
          RelationalQueries.rnd(col("ks"), 6).as("ks"), col("ks_value"),
          (col("ks") > lit(1.358) * sqrt((na + nb) / (na * nb)))
            .as("drifted"))
        .orderBy("day")
    }),

    /** e21's PRODUCTION shape — the closed-window append-mode leg its
      * scaladoc promises: a real monitor sets the watermark to the
      * true disorder bound and reads only CLOSED windows, instead of
      * e21's no-drop replay horizon + update-mode latest-batch dedup.
      * The replay is staged as three TIME-CONTIGUOUS slices (split at
      * day boundaries, so batch N's rows are all newer than batch
      * N−1's maximum and a 1-hour watermark drops nothing), then the
      * e15 flush discipline: two far-future sentinel rows advance the
      * watermark so append mode flushes every real window — the second
      * sentinel flushes what the first closes; the sentinels' own
      * windows never close and never reach the sink. Each (day, value)
      * census key is emitted EXACTLY ONCE at window close, so the sink
      * is the census with no per-key latest-batch window — and the
      * closed-window completeness contract is asserted row-exactly:
      * Σc == total event count. The drift tail is e21's day-over-day
      * weighted KS off the emitted census, unchanged. At scale this is
      * the monitor a streaming ingest actually runs: state is
      * watermark-bounded to open windows only, sink traffic is
      * closed-windows-only, and the KS tail costs 2× census per day
      * transition. */
    "e22_stream_ks_closed" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select(col("ts"), col("value"))
      val day = col("ts").cast("date")
      val d10 = lit("2024-01-10").cast("date")
      val d20 = lit("2024-01-20").cast("date")
      val src = stageReplay("e22", Seq(
        ev.filter(day <= d10),
        ev.filter(day > d10 && day <= d20),
        ev.filter(day > d20),
        Seq(("2024-12-01 00:00:00", 0.0)).toDF("ts", "value")
          .select(col("ts").cast("timestamp").as("ts"), col("value")),
        Seq(("2024-12-31 00:00:00", 0.0)).toDF("ts", "value")
          .select(col("ts").cast("timestamp").as("ts"), col("value"))))
      val ss = streamSession(s)
      val schema = s.read.parquet(src).schema
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val cen = stream
        .withWatermark("ts", "1 hour") // the REAL disorder bound
        .groupBy(window(col("ts"), "1 day").as("win"), col("value"))
        .agg(count(lit(1)).as("c"))
        .select(col("win.start").cast("date").as("day"), col("value"),
          col("c"))
      val outDir = tempDir("graft_e22_out_")
      val ckpt = tempDir("graft_e22_ckpt_")
      val q = cen.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      require(q.recentProgress.count(_.numInputRows > 0) >= 5,
        "e22 needs the five staged files as five micro-batches — " +
          "the forced arrival order collapsed")
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e22: streaming sink produced zero rows")
      // closed-window completeness: every real event is in exactly one
      // emitted window (time-contiguous slices → zero watermark drops;
      // sentinel windows never close → never emitted)
      val emitted = out.agg(sum("c")).head().getLong(0)
      // count what the windowed aggregation can admit: a null-ts row
      // never enters any window, so it must not inflate the expectation
      // (current testdata has none; future epochs might)
      val nTotal = ev.filter(col("ts").isNotNull).count()
      require(emitted == nTotal,
        s"e22: closed windows carry $emitted rows, expected $nTotal " +
          "non-null-ts events — the watermark dropped data or a window " +
          "never flushed")
      val census = out.select(col("day"), col("value"), col("c"))
      val pairs = census.select(explode(array(
          struct(col("day").as("pair_day"), lit(true).as("side_b")),
          struct(date_add(col("day"), 1).as("pair_day"),
            lit(false).as("side_b")))).as("p"),
          col("value"), col("c"))
        .select(col("p.pair_day").as("day"), col("p.side_b").as("side_b"),
          col("value"), col("c"))
      val ks = graft.operators.KsDrift.ks2(
        pairs, "day", "value", "side_b", weightCol = "c")
      val na = col("n_a").cast("double")
      val nb = col("n_b").cast("double")
      ks.filter(col("n_a") > 0 && col("n_b") > 0)
        .select(col("day"), col("n_a").as("n_prev"), col("n_b").as("n_cur"),
          RelationalQueries.rnd(col("ks"), 6).as("ks"), col("ks_value"),
          (col("ks") > lit(1.358) * sqrt((na + nb) / (na * nb)))
            .as("drifted"))
        .orderBy("day")
    }),

    /** STREAMING embedding-distribution drift — s26's multivariate
      * census maintained BY THE STREAM, the production question being
      * "did yesterday's ingest move the embedding distribution?"
      * (an embedding-model version bump mid-ingest is invisible to
      * every scalar monitor e03–e22 runs). The fixture synthesizes an
      * ingest timeline over the embeddings corpus — day = vec_id mod
      * 10, 01:00 into the day — and PLANTS the model bump: from day 7
      * onward the s26 portable-gated 20% of vectors arrive re-embedded
      * (+0.25 on dims 0–15), so the day 6→7 transition must flag on
      * the projections that touch the shifted window while 7→8/8→9
      * compare two equally-bumped days and stay quiet.
      *
      * The monitor itself is the e22 discipline verbatim, with s26's
      * 8-projection explode as the ingest featurizer: each arriving
      * vector explodes into 8 exact-integer (proj, pval) observations
      * INSIDE the stream (the integerized coordinates + gate-signed
      * window dots — the sign literals derive once, driver-side, from
      * the same 4-row portable-gate job as s26, and land in the
      * streaming plan), then a 1-day windowed (proj, pval) census in
      * APPEND mode behind a true 1-hour watermark over three
      * time-contiguous day slices; the e15 two-sentinel flush closes
      * every real window exactly once, completeness asserted
      * row-exactly (Σc = 8 × vectors). The drift tail is e21/e22's
      * day-pair weighted KS off the emitted census with (day, proj)
      * as the group. At scale: state is watermark-bounded to open
      * windows of an 8×-exploded integer census (map-side combinable,
      * vectors never shuffle), sink traffic is closed-windows-only,
      * and the KS tail costs 2× census per day transition per
      * projection. */
    "e23_stream_embed_drift" -> ((s, d) => {
      val signs = e23Signs(s)
      val staged = e23Staged(s, d).select(col("ts"), col("v64"))
      val day = col("ts").cast("date")
      val d3 = lit("2024-03-04").cast("date") // days 0-3
      val d6 = lit("2024-03-07").cast("date") // days 4-6
      val zeroVec = array_repeat(lit(0.0), 64)
      def sentinel(t: String): DataFrame =
        s.range(1).select(lit(t).cast("timestamp").as("ts"),
          zeroVec.as("v64"))
      val src = stageReplay("e23", Seq(
        staged.filter(day <= d3),
        staged.filter(day > d3 && day <= d6),
        staged.filter(day > d6),
        sentinel("2024-12-01 00:00:00"),
        sentinel("2024-12-31 00:00:00")))
      val ss = streamSession(s)
      val schema = s.read.parquet(src).schema
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val cen = stream
        .withWatermark("ts", "1 hour")
        .select(col("ts"), explode(array(e23Projs(signs): _*)).as("x"))
        .groupBy(window(col("ts"), "1 day").as("win"),
          col("x.proj").as("proj"), col("x.pval").as("pval"))
        .agg(count(lit(1)).as("c"))
        .select(col("win.start").cast("date").as("day"), col("proj"),
          col("pval"), col("c"))
      val outDir = tempDir("graft_e23_out_")
      val ckpt = tempDir("graft_e23_ckpt_")
      val q = cen.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      require(q.recentProgress.count(_.numInputRows > 0) >= 5,
        "e23 needs the five staged files as five micro-batches — " +
          "the forced arrival order collapsed")
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e23: streaming sink produced zero rows")
      // closed-window completeness: every vector contributes exactly 8
      // projection observations to exactly one emitted window
      val emitted = out.agg(sum("c")).head().getLong(0)
      val nVec = Tables.embeddings(s, d).count()
      require(emitted == 8 * nVec,
        s"e23: closed windows carry $emitted observations, expected " +
          s"${8 * nVec} (8 per vector) — the watermark dropped data or " +
          "a window never flushed")
      val census = out.select(col("day"), col("proj"), col("pval"),
        col("c"))
      val pairs = census.select(explode(array(
          struct(col("day").as("pair_day"), lit(true).as("side_b")),
          struct(date_add(col("day"), 1).as("pair_day"),
            lit(false).as("side_b")))).as("p"),
          col("proj"), col("pval"), col("c"))
        .select(concat_ws("|", col("p.pair_day"), col("proj")).as("gp"),
          col("p.side_b").as("side_b"), col("pval"), col("c"))
      val ks = graft.operators.KsDrift.ks2(
        pairs, "gp", "pval", "side_b", weightCol = "c")
      val na = col("n_a").cast("double")
      val nb = col("n_b").cast("double")
      ks.filter(col("n_a") > 0 && col("n_b") > 0)
        .select(substring_index(col("gp"), "|", 1).cast("date").as("day"),
          substring_index(col("gp"), "|", -1).cast("long").as("proj"),
          col("n_a").as("n_prev"), col("n_b").as("n_cur"),
          RelationalQueries.rnd(col("ks"), 6).as("ks"),
          col("ks_value").cast("long").as("ks_value"),
          (col("ks") > lit(1.358) * sqrt((na + nb) / (na * nb)))
            .as("drifted"))
        .orderBy("day", "proj")
    }),

    /** Projection drift LEADERBOARD over e23's census — the page a
      * fleet actually reads: e23 flags per (day-pair, projection);
      * the weekly on-call question is "which PROJECTION moved most
      * this week". One weighted KS per projection (early half, days
      * 0–4, vs late half, days 5–9, of the ingest window — the
      * planted day-7 bump sits in the late half), permutation-
      * calibrated at the DAY level: the exchangeable unit of an
      * ingest timeline is the day, not the observation (t40/t41
      * permute rows because docs are exchangeable; here a
      * row-level permutation would break within-day correlation and
      * overstate significance — the classic block-permutation rule),
      * so R=19 replicas redraw a BALANCED 5/5 day split by ranking
      * portable gates (no degenerate empty-side replicas, exact null
      * p floor 1/20), all replicas riding ONE ks2 pass with
      * (proj, perm) groups, the t41 shape.
      *
      * INPUT is the census e23's stream maintains: a deployment reads
      * the monitor's sink table; roster queries are self-contained, so
      * this one rebuilds the identical census batch-side (same shared
      * featurizer, so the equality e23 asserts row-exactly — Σc =
      * 8×vectors — holds by construction; no streaming fixture cost
      * repeated). Expect projections 0,1 (coords 0,5 < dim 16) and
      * 4,5 (window dots over dims 0–15) to lead the board — the bump
      * touches only dims 0–15. Scale: census-sized input throughout;
      * the permutation multiplier is ×R on the census, not the
      * corpus; the board rank is an 8-row global window. */
    "e24_proj_leaderboard" -> ((s, d) => {
      val R = 19
      val signs = e23Signs(s)
      val census = e23Staged(s, d)
        .select(col("dayi"), explode(array(e23Projs(signs): _*)).as("x"))
        .groupBy(col("dayi"), col("x.proj").as("proj"),
          col("x.pval").as("pval"))
        .agg(count(lit(1)).as("c"))
        .materialize // consumed by the observed KS, the perm KS, and days
      val obs = graft.operators.KsDrift.ks2(
          census.withColumn("side_b", col("dayi") >= 5),
          "proj", "pval", "side_b", weightCol = "c")
        .select(col("proj"), col("n_a").as("w_early"),
          col("n_b").as("w_late"), col("ks").as("ks_obs"), col("ks_value"))
      // balanced 5/5 day relabelings: rank each replica's gates
      val days = census.select("dayi").distinct()
      val perms = days
        .withColumn("perm", explode(sequence(lit(1), lit(R))))
        .withColumn("g", graft.operators.Sampling.portableGate(
          concat(lit("e24p:"), col("dayi").cast("string"), lit(":"),
            col("perm").cast("string"))))
      val wP = Window.partitionBy("perm").orderBy(col("g"), col("dayi"))
      val sides = perms.withColumn("rn", row_number().over(wP))
        .select(col("dayi"), col("perm"), (col("rn") <= 5).as("side_perm"))
      val ksPerm = graft.operators.KsDrift.ks2(
          census.join(broadcast(sides), "dayi")
            .withColumn("gp", concat_ws("|", col("proj"), col("perm"))),
          "gp", "pval", "side_perm", weightCol = "c")
        .withColumn("proj", substring_index(col("gp"), "|", 1).cast("long"))
      val nGe = ksPerm
        .join(broadcast(obs.select("proj", "ks_obs")), "proj")
        .groupBy("proj")
        .agg(sum(when(col("ks") >= col("ks_obs"), 1L).otherwise(0L))
          .as("n_ge"))
      val p = (col("n_ge") + lit(1L)).cast("double") / lit((R + 1).toDouble)
      // global window — benign: it ranks the 8-projection board
      val wB = Window.orderBy(col("ks_obs").desc, col("proj"))
      obs.join(broadcast(nGe), "proj")
        .withColumn("board_rank", row_number().over(wB))
        // proj as BIGINT on both sides — silences the last benign
        // check_oracle dtype WARN (spark INTEGER vs duck BIGINT, r19)
        .select(col("board_rank"), col("proj").cast("long").as("proj"),
          col("w_early"),
          col("w_late"), RelationalQueries.rnd(col("ks_obs"), 6).as("ks"),
          col("ks_value").cast("long").as("ks_value"), col("n_ge"),
          RelationalQueries.rnd(p, 6).as("p_perm"),
          (col("n_ge") === 0).as("drifted_perm"))
        .orderBy("board_rank")
    }),

    /** Native session-window streaming sessionization — the built-in
      * `session_window` aggregation beside e04's hand-rolled
      * flatMapGroupsWithState: same 1-hour-gap semantics, but state
      * merging, gap extension, and eviction are the engine's own
      * (dynamic-gap and merging micro-sessions come free, and state is
      * watermark-bounded like every stateful op here). Session-window
      * aggregations reject update mode (Spark constraint), so the sink
      * runs COMPLETE mode + the idempotent batch-id sink.
      *
      * SCALE CAVEAT — do not lift this pattern onto an unbounded
      * stream: complete mode re-emits the ENTIRE accumulated result on
      * every micro-batch, so over a growing source its per-batch write
      * is O(total sessions so far) — the one streaming shape in this
      * repo whose cost does NOT stay proportional to new data. It is
      * correct here only because the replay is bounded: the single
      * parquet file arrives as ONE micro-batch, loudly asserted by
      * [[boundedReplayGuard]], so the single complete emission IS the
      * final sessionization. For an unbounded stream use e04's
      * flatMapGroupsWithState operator (append semantics,
      * watermark-evicted state) — that is the scale path. The
      * oracle sessionizes independently in SQL with the window's
      * end-exclusive gap rule (an event exactly at last+gap opens a
      * NEW session — note the >= where e01's lag-based rule uses >).
      * Per-user rollup compares session counts, event totals, and the
      * integer sum of session start-seconds — boundary placement is
      * verified, not just counts. */
    "e12_stream_session_window" -> ((s, d) => {
      val ss = streamSession(s) // state partitions sized to state volume
      val raw = eventsStream(s, ss, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withWatermark("ts", "1 day")
      val sess = raw
        .groupBy(col("user_id"), session_window(col("ts"), "1 hour").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          min("event_id").as("first_event"),
          max("event_id").as("last_event"))
        .select(col("user_id"), col("sw.start").as("w_start"),
          col("n_events"), col("first_event"), col("last_event"))
      val outDir = tempDir("graft_e12_out_")
      val ckpt = tempDir("graft_e12_ckpt_")
      val q = sess.writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val out = boundedReplayGuard(s.read.parquet(outDir))
      out.groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_events").as("n_events"),
          sum(unix_timestamp(col("w_start"))).as("sum_start_sec"),
          min("first_event").as("min_first_event"),
          max("last_event").as("max_last_event"))
        .orderBy("user_id")
    }),

    /** Streaming ingestion dedup against a STANDING corpus — d12's
      * two-phase bloom probe moved to where it actually runs in
      * production: in front of the document firehose. The corpus hash
      * set collapses to ONE bounded bloom binary before the stream
      * starts (the q47/d12 `.head()` sketch discipline); each
      * micro-batch splits on `might_contain` — bloom-NEGATIVE rows are
      * DEFINITELY new and ship straight to the sink without touching
      * any join, and only the bloom-positive sliver (true dups + ~1%
      * fp) anti-joins the corpus to confirm. At 100 TB standing
      * corpus, per-batch join traffic is dup-rate-bounded, not
      * batch-sized, and the corpus set itself never re-shuffles per
      * batch. The sink is the idempotent batch-id-partitioned layout
      * (at-least-once replay converges). Oracle: kept rows ≡ stream
      * rows whose text hash is absent from the corpus — the plain
      * NOT IN in DuckDB; batch-internal duplicates are deliberately
      * both kept (ingestion dedups against the CORPUS; intra-delivery
      * dups are e05's watermarked job upstream). */
    "e11_stream_ingest_dedup" -> ((s, d) => {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.graft.ColumnBridge
      val all = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"), md5(col("text")).as("h"))
      val corpus = all.filter(col("doc_id") % 5 < 3).select("h").distinct()
      // bloom sized from the ACTUAL corpus cardinality (one more bounded
      // scalar read beside the bloom's own .head()): a fixed literal
      // holds the ~1% fp rate only up to that many distinct hashes, and
      // past it the "join traffic is dup-rate-bounded" claim erodes —
      // 16 bits/item keeps fp ≈ 0.5^(16·ln2) ≈ 0.04% at ANY corpus size
      val nCorpus = math.max(corpus.count(), 4096L)
      val bloomBin = corpus.agg(ColumnBridge.column(
        new BloomFilterAggregate(ColumnBridge.expression(xxhash64(col("h"))),
          Literal(nCorpus), Literal(nCorpus * 16L)).toAggregateExpression())
        .as("bf")).head().getAs[Array[Byte]]("bf")
      // staging scaffolding as in e05: one file ⇒ one micro-batch
      val src = tempDir("graft_e11_src_")
      all.filter(col("doc_id") % 5 >= 3).repartition(1)
        .write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      // stateless pass-through stream (the dedup split runs inside
      // foreachBatch), but the clone still shrinks per-batch
      // offset/commit-log churn to the stream's real needs
      val ss = streamSession(s)
      val stream = ss.readStream.schema(schema).parquet(src)
      val outDir = tempDir("graft_e11_out_")
      val ckpt = tempDir("graft_e11_ckpt_")
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val mc = ColumnBridge.column(new BloomFilterMightContain(
            Literal(bloomBin), ColumnBridge.expression(xxhash64(col("h")))))
          val definitelyNew = batch.filter(!mc)
          val confirmedNew = batch.filter(mc)
            .join(corpus, Seq("h"), "left_anti")
          graft.streaming.IdempotentSink.writeBatch(
            definitelyNew.unionByName(confirmedNew), batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e11: streaming sink produced zero rows") // see e04
      out.groupBy("lang")
        .agg(count(lit(1)).as("n_new_docs"),
          sum("n_chars").as("sum_chars"))
        .orderBy("lang")
    }),

    /** Ordered conversion funnel view → click → purchase. Each stage is
      * a per-user min-timestamp aggregate joined to the previous stage
      * and filtered to strictly-later events — every join and groupBy
      * shuffles on `user_id`, so at scale one partitioning is reused
      * across all three stages (co-partitioned by AQE / explicit
      * repartition on a cluster) and nothing is ever widened beyond
      * (user, ts). Stage times stay in the exact ns domain (`ts_ns`);
      * conversion delays are truncated to integer ms before averaging
      * so the cross-engine double math is exact (sum of <2^53 ints). */
    "e07_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts_ns"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_ns").as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts_ns") > col("t_view"))
        .groupBy("user_id")
        .agg(min("ts_ns").as("t_click"), min("t_view").as("t_view"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts_ns") > col("t_click"))
        .groupBy("user_id")
        .agg(min("ts_ns").as("t_purchase"), min("t_click").as("t_click"))
      val rnd = RelationalQueries.rnd _
      v.agg(count(lit(1)).as("n_view_users"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_users"),
          rnd(avg(expr("(t_click - t_view) div 1000000")) / 1000.0, 4)
            .as("avg_view_click_sec")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_users"),
          rnd(avg(expr("(t_purchase - t_click) div 1000000")) / 1000.0, 4)
            .as("avg_click_purchase_sec")))
    }),

    /** Cohort retention: users bucketed by first-seen day, activity
      * counted per (cohort day, day offset). Two shuffles on `user_id`
      * (cohort assignment, then the join back) and one on the cohort
      * cell for the distinct-count — the standard formulation that
      * scales as long as no single cohort cell dominates, which day
      * granularity guarantees here. */
    "e08_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("day"))
      val coh = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      ev.join(coh, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("offset_days"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_day", "offset_days")
    }),

    /** Interval (range) join without a range explosion: every `error`
      * event opens a 5-minute incident window; count the same user's
      * other events falling inside any window. A naive formulation is
      * an inequality join (quadratic per user); instead both sides are
      * bucketed to 5-minute bins — each window spans exactly two bins,
      * so intervals are replicated twice, the join becomes an equi-join
      * on (user, bin), and the range predicate only re-checks the
      * candidates. Work is Σ bin-pair sizes, not Σ user².
      * Replication factor generalizes to ⌈len/binWidth⌉+1 for longer
      * intervals. */
    "e09_range_join" -> ((s, d) => {
      val W = 300000000000L // 5 min in ns; also the bin width
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
      val winBins = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_ns").as("w_start"))
        .select(col("user_id"), col("w_start"),
          explode(array(expr(s"w_start div $W"),
            expr(s"(w_start + $W) div $W"))).as("bin"))
      ev.filter(col("event_type") =!= "error")
        .withColumn("bin", expr(s"ts_ns div $W"))
        .join(winBins, Seq("user_id", "bin"))
        .filter(col("ts_ns").between(col("w_start"), col("w_start") + W))
        .select("event_id", "event_type").distinct()
        .groupBy("event_type").agg(count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }),

    /** Stream-static enrichment join: the events stream joined to the
      * (static, broadcast) customer dimension — the stateless shape
      * that attaches account metadata to a firehose. No watermark and
      * no state store: an inner stream-static join re-evaluates the
      * static side per micro-batch and holds nothing between batches,
      * so it costs the same at any stream length. The aggregation
      * happens AFTER the sink (batch-side), keeping the streaming part
      * stateless end-to-end. */
    "e06_stream_enrich" -> ((s, d) => {
      val ss = streamSession(s) // stateless join; shrinks log churn only
      val raw = eventsStream(s, ss, d)
        .select(col("user_id"), col("value"))
      val dim = broadcast(Tables.customer(ss, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment")))
      val enriched = raw.join(dim, "user_id")
      val outDir = tempDir("graft_e06_out_")
      val ckpt = tempDir("graft_e06_ckpt_")
      val q = enriched.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e06: streaming sink produced zero rows") // see e04
      out
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          RelationalQueries.rnd(sum("value"), 2).as("sum_value"))
        .orderBy("c_mktsegment")
    }),

    /** Stream-stream inner join with watermarks on BOTH sides: every
      * click joined to the same user's purchases within the following
      * hour (attribution). The event-time range condition plus the two
      * watermarks bound the join state — each side's buffered rows are
      * evicted once the watermark passes the range they could still
      * match, so state is (watermark window × arrival rate), not the
      * stream's history. Timestamps compare in the µs domain on both
      * engines and the delay sum stays integer-µs, so the oracle (the
      * equivalent batch self-join) is exact. */
    "e10_stream_stream_join" -> ((s, d) => {
      // the join keeps 4 state stores per partition — the roster's
      // most store-dense stream, and the one the per-store fixed
      // costs in [[streamSession]]'s scaladoc were profiled on
      val ss = streamSession(s)
      // def, not val: each side of a self-join needs its own source
      def src = eventsStream(s, ss, d)
      val clicks = src.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
        .withWatermark("c_ts", "1 day")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"))
        .withWatermark("p_ts", "1 day")
      val joined = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      val outDir = tempDir("graft_e10_out_")
      val ckpt = tempDir("graft_e10_ckpt_")
      val q = joined
        .select(col("click_id"), col("purchase_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("delay_us"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // no coalesce: it would narrow the join state stage (see e03)
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e10: streaming sink produced zero rows") // see e04
      out
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct("click_id").as("n_clicks"),
          countDistinct("purchase_id").as("n_purchases"),
          sum("delay_us").as("sum_delay_us"))
    }),

    /** Stream-stream LEFT OUTER join — the null-emission semantics e10's
      * inner join never exercises: a click with no purchase in its
      * 1-hour window must STILL emit (purchase columns null), and the
      * engine may only do so once the watermark proves no future
      * purchase can match — the state-eviction deadline and the
      * null-emission trigger are the same event. That timing needs
      * later batches, so the replay is staged (the e15 discipline):
      * file 0 carries every real click/purchase as one batch (inner
      * matches emit immediately); files 1-2 carry far-future sentinel
      * pairs (2 h apart — outside the join window, so they never match
      * anything) whose only job is to push both sides' watermarks past
      * every real window in two steps, flushing all real unmatched
      * clicks (two steps because eviction runs one batch behind the
      * observed maximum, the e15 lag). Sentinels carry negative ids
      * and are filtered from the readback; the first sentinel click
      * itself emits unmatched once the second file's watermark passes
      * it — which is the null-emission machinery working, not noise.
      * Timestamps stage in the self-controlled ts_ns long domain, so
      * this query is vintage-independent by construction. At scale:
      * state is (watermark window × arrival rate) per side, identical
      * to e10 — the outer semantics add zero state, only the deferred
      * emission. Oracle: the plain batch LEFT JOIN with the same
      * µs-domain range condition. */
    "e19_stream_outer_join" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_ns").as("ts"))
      val maxNs = ev.agg(max("ts")).head().getLong(0)
      val dayNs = 86400L * 1000000000L
      def sentinels(ids: (Long, Long), at: Long): DataFrame =
        Seq((ids._1, -1L, "click", at),
          (ids._2, -1L, "purchase", at + 2 * 3600L * 1000000000L))
          .toDF("event_id", "user_id", "event_type", "ts")
      val src = stageReplay("e19", Seq(ev,
        sentinels((-1L, -2L), maxNs + 30 * dayNs),
        sentinels((-3L, -4L), maxNs + 60 * dayNs)))
      val ss = streamSession(s)
      val schema = s.read.parquet(src).schema
      // def, not val: each side of a self-join needs its own source
      def stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("tss", timestamp_micros(expr("ts div 1000")))
      val clicks = stream.filter(col("event_type") === "click")
        .select(col("user_id"), col("tss").as("c_ts"),
          col("event_id").as("click_id"))
        .withWatermark("c_ts", "1 day")
      val purchases = stream.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("tss").as("p_ts"),
          col("event_id").as("purchase_id"))
        .withWatermark("p_ts", "1 day")
      val joined = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      val outDir = tempDir("graft_e19_out_")
      val ckpt = tempDir("graft_e19_ckpt_")
      val q = joined
        .select(col("click_id"), col("purchase_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("delay_us"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // no coalesce: it would narrow the join state stage (see e03)
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      require(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "e19 needs the staged files as separate micro-batches — " +
          "the forced arrival order collapsed")
      val out = s.read.parquet(outDir).filter(col("click_id") >= 0)
      require(!out.isEmpty, "e19: streaming sink produced zero rows") // see e04
      val res = out.agg(count(lit(1)).as("n_rows"),
        count(col("purchase_id")).as("n_matched"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L)).as("n_unmatched"),
        countDistinct("click_id").as("n_clicks"),
        sum("delay_us").as("sum_delay_us"))
      require(res.head().getLong(2) > 0,
        "e19: no unmatched clicks emitted — the outer path (the point " +
          "of this query) went unexercised")
      res
    }),

    /** Streaming FERTILITY DRIFT under the learned tokenizer — the
      * operational question after shipping t42's vocabulary: is
      * incoming data drifting away from it (fertility creep means the
      * tokenizer fragments new text into more pieces, inflating
      * training cost and degrading the token budget)? The corpus
      * streams through the e22 append/watermark discipline as word
      * events on a synthetic day axis (day = doc_id % [[FertDays]]);
      * each micro-batch's words are encoded with t42's FROZEN merge
      * table — learned batch-side by the SAME
      * [[graft.operators.BpeMerge.learn]] loop on the SAME corpus
      * fold, then collected (BpeRounds = 8 rows, the bounded scalar
      * read the sign-derivation sites use) and folded into a static
      * replace chain, so no re-learning and no per-batch join happens
      * in-stream. The plant: day [[FertDays]]−1 docs arrive with every
      * word REVERSED — pair statistics invert, the frozen merges stop
      * firing, fertility jumps ~1.16× (measured at sf0.01; clean-day
      * ratios sit at ~1.00) — the canonical "new data, old tokenizer"
      * drift. Post-hoc, each closed (day, lang) window compares its
      * fertility to the lang's day-0 baseline by exact cross-
      * multiplication (tokens·base_words·100 > base_tokens·words·108),
      * flagging ratios above 1.08. The OPERANDS are per-(day, lang)
      * token/word MASSES, not census counts — at the 100 TB operating
      * point a single (day, lang) cell can carry ~10^11–10^12 tokens,
      * so the product is ~10^26 and int64 would silently wrap (Spark)
      * or error (DuckDB). Both sides therefore widen BEFORE the
      * multiply: Spark to DECIMAL(19,0) operands (product
      * DECIMAL(38,0), exact to 10^38), DuckDB to HUGEINT (int128,
      * exact to ~1.7·10^38) — both exact through ~10^26, so the
      * boolean agrees by construction.
      *
      * Scale: stream state is watermark-bounded day×lang counters
      * (two integer sums per window); the merge table is 8 rows
      * frozen into the plan; the post-hoc audit is census-sized. The
      * oracle replays the same plant + t43-style carry-column apply
      * over the (day, lang, word) fold — the streaming path and the
      * batch replica share the merge CTEs with t42/t43 by
      * construction. */
    "e25_fertility_drift" -> ((s, d) => {
      import graft.operators.BpeMerge
      val days = FertDays
      val toks = filter(split(col("text"), " "), t => t =!= "")
      // t42's exact learner on t42's exact corpus fold, via the
      // session-memoized bpeLearnTable (r20: one learn per sweep —
      // the canonical fold lives inside the memo build, so this
      // consumer structurally cannot desync from t42/t43/t46)
      val merges = graft.queries.TextQueries.bpeMerges(s, d)
      def encodedLen(w: Column): Column =
        size(BpeMerge.symbolsOf(BpeMerge.applyMerges(w, merges)))
          .cast("long")
      val dayi = (col("doc_id") % days).cast("int")
      val events = Tables.documents(s, d)
        .withColumn("dayi", dayi)
        // the plant: the last day's docs arrive word-reversed
        .withColumn("w0", explode(toks))
        .select(
          date_add(lit("2024-01-01").cast("date"), col("dayi"))
            .cast("timestamp").as("ts"),
          col("lang"),
          when(col("dayi") === days - 1, reverse(col("w0")))
            .otherwise(col("w0")).as("w"))
      import s.implicits._
      val sentinel = (ts: String) =>
        Seq((ts, "zz", "x")).toDF("ts", "lang", "w")
          .select(col("ts").cast("timestamp").as("ts"), col("lang"), col("w"))
      val src = stageReplay("e25", Seq(
        events.filter(col("ts") < lit("2024-01-03").cast("date")),
        events.filter(col("ts") >= lit("2024-01-03").cast("date") &&
          col("ts") < lit("2024-01-05").cast("date")),
        events.filter(col("ts") >= lit("2024-01-05").cast("date")),
        sentinel("2024-12-01 00:00:00"),
        sentinel("2024-12-31 00:00:00")))
      val ss = streamSession(s)
      val schema = s.read.parquet(src).schema
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val cen = stream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day").as("win"), col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(encodedLen(col("w"))).as("n_tokens"))
        .select(datediff(col("win.start").cast("date"),
          lit("2024-01-01").cast("date")).as("dayi"),
          col("lang"), col("n_words"), col("n_tokens"))
      val outDir = tempDir("graft_e25_out_")
      val ckpt = tempDir("graft_e25_ckpt_")
      val q = cen.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      require(q.recentProgress.count(_.numInputRows > 0) >= 5,
        "e25 needs the five staged files as five micro-batches — " +
          "the forced arrival order collapsed")
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e25: streaming sink produced zero rows")
      // closed-window completeness (the e22 proof): every word of every
      // real doc is counted in exactly one emitted window
      val emitted = out.agg(sum("n_words")).head().getLong(0)
      val nTotal = events.count()
      require(emitted == nTotal,
        s"e25: closed windows carry $emitted words, expected $nTotal — " +
          "the watermark dropped data or a window never flushed")
      val base = out.filter(col("dayi") === 0)
        .select(col("lang"), col("n_words").as("b_words"),
          col("n_tokens").as("b_tokens"))
      out.join(broadcast(base), "lang")
        .select(col("dayi"), col("lang"), col("n_words"), col("n_tokens"),
          RelationalQueries.rnd(
            col("n_tokens").cast("double") / col("n_words"), 4)
            .as("fertility"),
          (col("n_tokens").cast("decimal(19,0)") *
            col("b_words").cast("decimal(19,0)") * lit(100L) >
            col("b_tokens").cast("decimal(19,0)") *
              col("n_words").cast("decimal(19,0)") * lit(108L))
            .as("drifted"))
        .orderBy("dayi", "lang")
    }),

    /** Streaming quality-score drift — the post-ship monitor of the
      * t44 classifier (closing the quality lifecycle the way e25
      * closed t42's: train t44 → audit t45 → MONITOR e26): the corpus
      * streams through the e22 append/watermark discipline as
      * document events on the e25 day axis (day = doc_id %
      * [[FertDays]]); each micro-batch is scored IN-STREAM by the
      * FROZEN t44 model — [[TextQueries.qcFrozenWeights]] (a bounded
      * 1-row read of the memoized [[TextQueries.qcModel]] build)
      * folded with [[TextQueries.qcRawFeatureCols]] into row-local
      * literal expressions, so scoring costs no join, no state, no
      * re-training in-stream. The plant: on the LAST day, every third
      * doc PER SOURCE — gated on (doc_id div 60) % 3 so the burst
      * covers every (source = doc_id%20, day = doc_id%6) cell, not
      * just the residues a doc_id%k gate happens to hit — arrives as
      * the t44 template banner (the "new template noise source
      * appears post-ship" incident): the model flags them by its own
      * training construction, every source's day-5 flag rate jumps
      * ≳20pp, and the drift gate fires source-by-source.
      *
      * Post-hoc, each closed (day, source) window compares its flag
      * rate to the source's FIRST-OBSERVED-day baseline (min dayi per
      * source — not a global day 0: sources come and go, and on this
      * corpus `source` is parity-locked to doc_id, so a day-0-only
      * baseline would silently drop every odd day INCLUDING the
      * plant; the per-source-min rule is also what a production
      * monitor does when a source first appears) by an
      * ABSOLUTE-jump gate
      * (rate − base_rate > 10pp), cross-multiplied exactly:
      * n_flagged·b_docs·100 > b_flagged·n_docs·100 + 10·n_docs·b_docs.
      * The operands are per-(day, source) doc counts — the e25 lesson
      * applies, so both sides widen BEFORE the multiply (Spark
      * DECIMAL(19,0) operands → DECIMAL(38,0) products, DuckDB
      * HUGEINT; exact through ~10^26, far above any per-day-source
      * census at 100 TB). An absolute-rate gate has no divide-by-zero
      * corner when a source's baseline flags are 0.
      *
      * Scale: stream state is watermark-bounded day×source counters
      * (two integer sums per window); the audit is census-sized.
      * Closed-window completeness asserted doc-exactly (the e22
      * proof). */
    "e26_quality_drift" -> ((s, d) => {
      import graft.queries.{TextQueries => TQ}
      val days = FertDays
      val w = TQ.qcFrozenWeights(s, d)
      val plantedText =
        Seq.fill(TQ.QcBannerReps)(TQ.BoilerHeader).mkString(" ")
      val dayi = (col("doc_id") % days).cast("int")
      val events = Tables.documents(s, d)
        .withColumn("dayi", dayi)
        .select(
          date_add(lit("2024-01-01").cast("date"), col("dayi"))
            .cast("timestamp").as("ts"),
          col("source"),
          // the plant: last-day template burst, 1-in-3 per source
          when(col("dayi") === days - 1 &&
            expr("(doc_id div 60) % 3 = 0"),
            lit(plantedText)).otherwise(col("text")).as("text"))
      import s.implicits._
      val sentinel = (ts: String) =>
        Seq((ts, "zz", "x")).toDF("ts", "source", "text")
          .select(col("ts").cast("timestamp").as("ts"), col("source"),
            col("text"))
      val src = stageReplay("e26", Seq(
        events.filter(col("ts") < lit("2024-01-03").cast("date")),
        events.filter(col("ts") >= lit("2024-01-03").cast("date") &&
          col("ts") < lit("2024-01-05").cast("date")),
        events.filter(col("ts") >= lit("2024-01-05").cast("date")),
        sentinel("2024-12-01 00:00:00"),
        sentinel("2024-12-31 00:00:00")))
      val ss = streamSession(s)
      val schema = s.read.parquet(src).schema
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      // the frozen model, applied row-locally inside the stream
      val scored = TQ.qcRawFeatureCols(stream)
        .withColumn("flagged",
          when(TQ.qcMarginCol(w) <= 0, 1L).otherwise(0L))
      val cen = scored
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day").as("win"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum("flagged").as("n_flagged"))
        .select(datediff(col("win.start").cast("date"),
          lit("2024-01-01").cast("date")).as("dayi"),
          col("source"), col("n_docs"), col("n_flagged"))
      val outDir = tempDir("graft_e26_out_")
      val ckpt = tempDir("graft_e26_ckpt_")
      val q = cen.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.streaming.IdempotentSink.writeBatch(batch, batchId, outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      require(q.recentProgress.count(_.numInputRows > 0) >= 5,
        "e26 needs the five staged files as five micro-batches — " +
          "the forced arrival order collapsed")
      val out = s.read.parquet(outDir)
      require(!out.isEmpty, "e26: streaming sink produced zero rows")
      // closed-window completeness: every real doc is counted in
      // exactly one emitted window
      val emitted = out.agg(sum("n_docs")).head().getLong(0)
      val nTotal = events.count()
      require(emitted == nTotal,
        s"e26: closed windows carry $emitted docs, expected $nTotal — " +
          "the watermark dropped data or a window never flushed")
      val wB = Window.partitionBy("source").orderBy("dayi")
      val base = out.withColumn("brn", row_number().over(wB))
        .filter(col("brn") === 1)
        .select(col("source"), col("n_docs").as("b_docs"),
          col("n_flagged").as("b_flagged"))
      out.join(broadcast(base), "source")
        .select(col("dayi"), col("source"), col("n_docs"),
          col("n_flagged"),
          RelationalQueries.rnd(
            col("n_flagged").cast("double") / col("n_docs"), 4)
            .as("flag_rate"),
          (col("n_flagged").cast("decimal(19,0)") *
            col("b_docs").cast("decimal(19,0)") * lit(100L) >
            col("b_flagged").cast("decimal(19,0)") *
              col("n_docs").cast("decimal(19,0)") * lit(100L) +
              lit(10L) * col("n_docs").cast("decimal(19,0)") *
                col("b_docs").cast("decimal(19,0)")).as("drifted"))
        .orderBy("dayi", "source")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // e18: the staged ranges arrive in ascending doc_id order and the
    // operator admits in ascending doc_id within each batch, so "first
    // `quota` observed per source" collapses to a plain row_number cap
    // over the batch table — the id checksum pins WHICH docs were
    // admitted (i.e. the cross-batch counter state), not just counts.
    "e18_stream_quota" ->
      """WITH r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
        | CAST(sum(CASE WHEN rn > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
        | CAST(sum(CASE WHEN rn <= 10 THEN doc_id ELSE 0 END) AS BIGINT)
        |   AS sum_admitted_ids
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // e20: first per (user, event_type) under the staged delivery
    // order — the stage index derives from the SAME event_id % 3 rule
    // the query staged with, so "first batch containing the key, then
    // (ts_ns, event_id) minimum within it" is one row_number.
    "e20_tws_first_seen" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, epoch_ns(ts) AS ts_ns,
        |         event_id % 3 AS stg
        |  FROM events),
        | firsts AS (SELECT * FROM (
        |   SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                                ORDER BY stg, ts_ns, event_id) AS rn
        |   FROM ev) WHERE rn = 1)
        |SELECT event_type, count(*) AS n_keys,
        | CAST(sum(event_id) AS BIGINT) AS first_id_chk,
        | CAST(min(ts_ns) AS BIGINT) AS min_first_ts_ns
        |FROM firsts GROUP BY event_type ORDER BY event_type""".stripMargin,

    // e21: batch replica of the streamed daily value census, then the
    // same day-pair explode + flat-window weighted KS (t38's integer
    // formulas). The stream merges the census across micro-batches;
    // the oracle recomputes it in one pass — equality certifies the
    // state-store merge, not just the KS tail.
    "e21_stream_ks_drift" ->
      """WITH cen AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    value AS v, count(*) AS c FROM events
        |  WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (
        |  SELECT day, 1 AS s, v, c FROM cen
        |  UNION ALL
        |  SELECT day + 1 AS day, 0 AS s, v, c FROM cen),
        |c2 AS (SELECT day AS g, v,
        |    sum(CASE WHEN s = 0 THEN c ELSE 0 END) AS ca,
        |    sum(CASE WHEN s = 1 THEN c ELSE 0 END) AS cb
        |  FROM p GROUP BY 1, 2),
        |st AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM c2 GROUP BY g),
        |cc AS (SELECT g, v,
        |    sum(ca) OVER (PARTITION BY g ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY g ORDER BY v) AS cumb FROM c2),
        |d AS (SELECT cc.g, v,
        |    abs(CAST(cuma AS HUGEINT)*nb - CAST(cumb AS HUGEINT)*na)
        |      AS dev, na, nb
        |  FROM cc JOIN st ON st.g = cc.g),
        |m AS (SELECT g, min(na) AS na, min(nb) AS nb, max(dev) AS dmax
        |  FROM d GROUP BY g),
        |a AS (SELECT d.g, min(v) AS ks_value
        |  FROM d JOIN m ON m.g = d.g AND d.dev = m.dmax GROUP BY d.g)
        |SELECT m.g AS day, na AS n_prev, nb AS n_cur,
        |  floor(CAST(dmax AS DOUBLE)
        |    / (CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))*1e6+0.5)/1e6 AS ks,
        |  ks_value,
        |  CAST(dmax AS DOUBLE)/(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))
        |    > 1.358*sqrt((CAST(na AS DOUBLE)+CAST(nb AS DOUBLE))
        |      /(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))) AS drifted
        |FROM m JOIN a ON a.g = m.g
        |WHERE na > 0 AND nb > 0 ORDER BY day""".stripMargin,

    // e22: the SAME oracle recipe as e21 — a closed-window append
    // replay over time-contiguous slices admits every row (asserted
    // row-exactly in the query), so its census equals the batch
    // census; equality certifies the append-mode eviction/flush
    // discipline end-to-end, not just the KS tail.
    "e22_stream_ks_closed" ->
      """WITH cen AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    value AS v, count(*) AS c FROM events
        |  WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (
        |  SELECT day, 1 AS s, v, c FROM cen
        |  UNION ALL
        |  SELECT day + 1 AS day, 0 AS s, v, c FROM cen),
        |c2 AS (SELECT day AS g, v,
        |    sum(CASE WHEN s = 0 THEN c ELSE 0 END) AS ca,
        |    sum(CASE WHEN s = 1 THEN c ELSE 0 END) AS cb
        |  FROM p GROUP BY 1, 2),
        |st AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM c2 GROUP BY g),
        |cc AS (SELECT g, v,
        |    sum(ca) OVER (PARTITION BY g ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY g ORDER BY v) AS cumb FROM c2),
        |d AS (SELECT cc.g, v,
        |    abs(CAST(cuma AS HUGEINT)*nb - CAST(cumb AS HUGEINT)*na)
        |      AS dev, na, nb
        |  FROM cc JOIN st ON st.g = cc.g),
        |m AS (SELECT g, min(na) AS na, min(nb) AS nb, max(dev) AS dmax
        |  FROM d GROUP BY g),
        |a AS (SELECT d.g, min(v) AS ks_value
        |  FROM d JOIN m ON m.g = d.g AND d.dev = m.dmax GROUP BY d.g)
        |SELECT m.g AS day, na AS n_prev, nb AS n_cur,
        |  floor(CAST(dmax AS DOUBLE)
        |    / (CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))*1e6+0.5)/1e6 AS ks,
        |  ks_value,
        |  CAST(dmax AS DOUBLE)/(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))
        |    > 1.358*sqrt((CAST(na AS DOUBLE)+CAST(nb AS DOUBLE))
        |      /(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))) AS drifted
        |FROM m JOIN a ON a.g = m.g
        |WHERE na > 0 AND nb > 0 ORDER BY day""".stripMargin,

    // e23: the streaming embedding-drift monitor replicates as the
    // batch census it must equal — s26's gate-derived signs and
    // integerized projections with the day-7 model bump, a (day, proj,
    // pval) census, then e22's day-pair weighted-KS tail with
    // (day, proj) as the group.
    "e23_stream_embed_drift" ->
      s"""WITH sg AS (SELECT p, i,
        |    CASE WHEN (${graft.operators.Sampling.portableGateSql(
             "'eproj:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)")})
        |      % 2 = 1 THEN 1 ELSE -1 END AS sgn
        |  FROM range(4) ps(p), range(16) js(i)),
        |e AS (SELECT vec_id, embedding,
        |    (${graft.operators.Sampling.portableGateSql(
             "'edrift:' || CAST(vec_id AS VARCHAR)")}) % 5 = 0 AS gated,
        |    CAST(vec_id % 10 AS INT) AS dayi
        |  FROM embeddings),
        |cx AS (SELECT vec_id, dayi, CAST(ix.i AS INT) AS idx,
        |    CAST(embedding[CAST(ix.i + 1 AS INT)] AS DOUBLE) AS xd, gated
        |  FROM e, range(64) ix(i)),
        |c6 AS (SELECT vec_id, dayi, idx,
        |    CAST(floor((CASE WHEN gated AND dayi >= 7 AND idx < 16
        |      THEN xd + 0.25 ELSE xd END)*1e6+0.5) AS BIGINT) AS x6
        |  FROM cx),
        |cidx(proj, cix) AS (VALUES (0, 0), (1, 5), (2, 32), (3, 47)),
        |rc AS (SELECT dayi, proj, x6 AS pval FROM c6
        |  JOIN cidx ON cidx.cix = c6.idx),
        |rd AS (SELECT dayi, 4 + sg.p AS proj, c6.vec_id,
        |    sum(sg.sgn * c6.x6) AS pval
        |  FROM c6 JOIN sg
        |    ON c6.idx = sg.i + CASE WHEN sg.p < 2 THEN 0 ELSE 32 END
        |  GROUP BY 1, 2, 3),
        |allr AS (SELECT dayi, proj, pval FROM rc
        |  UNION ALL SELECT dayi, proj, pval FROM rd),
        |cen AS (SELECT DATE '2024-03-01' + dayi AS day, proj,
        |    CAST(pval AS DOUBLE) AS v, count(*) AS c
        |  FROM allr GROUP BY 1, 2, 3),
        |p AS (
        |  SELECT day, proj, 1 AS sdx, v, c FROM cen
        |  UNION ALL
        |  SELECT day + 1 AS day, proj, 0 AS sdx, v, c FROM cen),
        |c2 AS (SELECT day, proj, v,
        |    sum(CASE WHEN sdx = 0 THEN c ELSE 0 END) AS ca,
        |    sum(CASE WHEN sdx = 1 THEN c ELSE 0 END) AS cb
        |  FROM p GROUP BY 1, 2, 3),
        |st AS (SELECT day, proj, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM c2 GROUP BY 1, 2),
        |cc AS (SELECT day, proj, v,
        |    sum(ca) OVER (PARTITION BY day, proj ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY day, proj ORDER BY v) AS cumb
        |  FROM c2),
        |d AS (SELECT cc.day, cc.proj, v,
        |    abs(CAST(cuma AS HUGEINT)*nb - CAST(cumb AS HUGEINT)*na)
        |      AS dev, na, nb
        |  FROM cc JOIN st ON st.day = cc.day AND st.proj = cc.proj),
        |m AS (SELECT day, proj, min(na) AS na, min(nb) AS nb,
        |    max(dev) AS dmax FROM d GROUP BY 1, 2),
        |a AS (SELECT d.day, d.proj, CAST(min(v) AS BIGINT) AS ks_value
        |  FROM d JOIN m ON m.day = d.day AND m.proj = d.proj
        |    AND d.dev = m.dmax GROUP BY 1, 2)
        |SELECT m.day AS day, CAST(m.proj AS BIGINT) AS proj,
        |  na AS n_prev, nb AS n_cur,
        |  floor(CAST(dmax AS DOUBLE)
        |    / (CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))*1e6+0.5)/1e6 AS ks,
        |  ks_value,
        |  CAST(dmax AS DOUBLE)/(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))
        |    > 1.358*sqrt((CAST(na AS DOUBLE)+CAST(nb AS DOUBLE))
        |      /(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))) AS drifted
        |FROM m JOIN a ON a.day = m.day AND a.proj = m.proj
        |WHERE na > 0 AND nb > 0 ORDER BY day, proj""".stripMargin,

    // e24: the e23 census replica (same featurizer CTEs), then one
    // weighted KS per projection over the week halves, R=19 balanced
    // day relabelings via ranked portable gates, and the ranked board.
    "e24_proj_leaderboard" ->
      s"""WITH sg AS (SELECT p, i,
        |    CASE WHEN (${graft.operators.Sampling.portableGateSql(
             "'eproj:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)")})
        |      % 2 = 1 THEN 1 ELSE -1 END AS sgn
        |  FROM range(4) ps(p), range(16) js(i)),
        |e AS (SELECT vec_id, embedding,
        |    (${graft.operators.Sampling.portableGateSql(
             "'edrift:' || CAST(vec_id AS VARCHAR)")}) % 5 = 0 AS gated,
        |    CAST(vec_id % 10 AS INT) AS dayi
        |  FROM embeddings),
        |cx AS (SELECT vec_id, dayi, CAST(ix.i AS INT) AS idx,
        |    CAST(embedding[CAST(ix.i + 1 AS INT)] AS DOUBLE) AS xd, gated
        |  FROM e, range(64) ix(i)),
        |c6 AS (SELECT vec_id, dayi, idx,
        |    CAST(floor((CASE WHEN gated AND dayi >= 7 AND idx < 16
        |      THEN xd + 0.25 ELSE xd END)*1e6+0.5) AS BIGINT) AS x6
        |  FROM cx),
        |cidx(proj, cix) AS (VALUES (0, 0), (1, 5), (2, 32), (3, 47)),
        |rc AS (SELECT dayi, proj, x6 AS pval FROM c6
        |  JOIN cidx ON cidx.cix = c6.idx),
        |rd AS (SELECT dayi, 4 + sg.p AS proj, c6.vec_id,
        |    sum(sg.sgn * c6.x6) AS pval
        |  FROM c6 JOIN sg
        |    ON c6.idx = sg.i + CASE WHEN sg.p < 2 THEN 0 ELSE 32 END
        |  GROUP BY 1, 2, 3),
        |allr AS (SELECT dayi, proj, pval FROM rc
        |  UNION ALL SELECT dayi, proj, pval FROM rd),
        |cen AS (SELECT dayi, proj, CAST(pval AS DOUBLE) AS v, count(*) AS c
        |  FROM allr GROUP BY 1, 2, 3),
        |o2 AS (SELECT proj, v,
        |    sum(CASE WHEN dayi < 5 THEN c ELSE 0 END) AS ca,
        |    sum(CASE WHEN dayi >= 5 THEN c ELSE 0 END) AS cb
        |  FROM cen GROUP BY 1, 2),
        |ost AS (SELECT proj, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM o2 GROUP BY 1),
        |occ AS (SELECT proj, v,
        |    sum(ca) OVER (PARTITION BY proj ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY proj ORDER BY v) AS cumb
        |  FROM o2),
        |od AS (SELECT occ.proj, v,
        |    abs(CAST(cuma AS HUGEINT)*nb - CAST(cumb AS HUGEINT)*na) AS dev,
        |    na, nb
        |  FROM occ JOIN ost ON ost.proj = occ.proj),
        |om AS (SELECT proj, min(na) AS na, min(nb) AS nb, max(dev) AS dmax
        |  FROM od GROUP BY 1),
        |oa AS (SELECT od.proj, CAST(min(v) AS BIGINT) AS ks_value
        |  FROM od JOIN om ON om.proj = od.proj AND od.dev = om.dmax
        |  GROUP BY 1),
        |ob AS (SELECT om.proj, na, nb,
        |    CAST(dmax AS DOUBLE)/(CAST(na AS DOUBLE)*CAST(nb AS DOUBLE))
        |      AS ks_obs, ks_value
        |  FROM om JOIN oa ON oa.proj = om.proj),
        |dg AS (SELECT d.dayi, p.perm,
        |    (${graft.operators.Sampling.portableGateSql(
             "'e24p:' || CAST(dayi AS VARCHAR) || ':' || CAST(perm AS VARCHAR)")})
        |      AS g
        |  FROM (SELECT DISTINCT dayi FROM cen) d, range(1, 20) p(perm)),
        |dp AS (SELECT dayi, perm,
        |    row_number() OVER (PARTITION BY perm ORDER BY g, dayi) <= 5
        |      AS sideb
        |  FROM dg),
        |p2 AS (SELECT cen.proj, dp.perm, v,
        |    sum(CASE WHEN NOT sideb THEN c ELSE 0 END) AS ca,
        |    sum(CASE WHEN sideb THEN c ELSE 0 END) AS cb
        |  FROM cen JOIN dp ON dp.dayi = cen.dayi GROUP BY 1, 2, 3),
        |pst AS (SELECT proj, perm, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM p2 GROUP BY 1, 2),
        |pcc AS (SELECT proj, perm, v,
        |    sum(ca) OVER (PARTITION BY proj, perm ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY proj, perm ORDER BY v) AS cumb
        |  FROM p2),
        |pd AS (SELECT pcc.proj, pcc.perm,
        |    abs(CAST(cuma AS HUGEINT)*nb - CAST(cumb AS HUGEINT)*na) AS dev,
        |    na, nb
        |  FROM pcc JOIN pst ON pst.proj = pcc.proj AND pst.perm = pcc.perm),
        |pm AS (SELECT proj, perm,
        |    CAST(max(dev) AS DOUBLE)
        |      /(CAST(min(na) AS DOUBLE)*CAST(min(nb) AS DOUBLE)) AS ksp
        |  FROM pd GROUP BY 1, 2),
        |ng AS (SELECT ob.proj,
        |    CAST(sum(CASE WHEN pm.ksp >= ob.ks_obs THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_ge
        |  FROM pm JOIN ob ON ob.proj = pm.proj GROUP BY 1)
        |SELECT CAST(row_number() OVER (ORDER BY ob.ks_obs DESC, ob.proj)
        |    AS INTEGER) AS board_rank,
        | CAST(ob.proj AS BIGINT) AS proj, na AS w_early, nb AS w_late,
        | floor(ob.ks_obs*1e6+0.5)/1e6 AS ks, ks_value, ng.n_ge,
        | floor(((ng.n_ge + 1)/20.0)*1e6+0.5)/1e6 AS p_perm,
        | ng.n_ge = 0 AS drifted_perm
        |FROM ob JOIN ng ON ng.proj = ob.proj
        |ORDER BY board_rank""".stripMargin,

    // e19: the batch LEFT JOIN with e10's µs-domain range condition;
    // count(purchase_id)/sum(delay_us) skip nulls identically on both
    // engines, so matched and unmatched are counted by the same rows
    // the stream emitted (sentinels carry negative ids, filtered).
    "e19_stream_outer_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        | p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
        |       WHERE event_type = 'purchase'),
        | j AS (
        |  SELECT c.click_id, p.purchase_id,
        |    epoch_ns(p.ts)//1000 - epoch_ns(c.ts)//1000 AS delay_us
        |  FROM c LEFT JOIN p ON p.user_id = c.user_id
        |    AND epoch_ns(p.ts)//1000 >= epoch_ns(c.ts)//1000
        |    AND epoch_ns(p.ts)//1000 <= epoch_ns(c.ts)//1000 + 3600000000)
        |SELECT count(*) AS n_rows,
        | CAST(count(purchase_id) AS BIGINT) AS n_matched,
        | CAST(sum(CASE WHEN purchase_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_unmatched,
        | CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks,
        | CAST(sum(delay_us) AS BIGINT) AS sum_delay_us
        |FROM j""".stripMargin,

    // e13: same cross-multiplied integer L1 — the only double op is
    // the final division, so the distance compares exactly.
    "e13_drift_monitor" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
        | daily AS (
        |  SELECT day, count(*) AS tot,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c_click,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS c_error,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c_purchase,
        |    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS c_signup,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c_view
        |  FROM ev GROUP BY day),
        | lg AS (
        |  SELECT day, tot, c_click, c_error, c_purchase, c_signup, c_view,
        |    lag(tot) OVER w AS prev_tot,
        |    lag(c_click) OVER w AS p_click, lag(c_error) OVER w AS p_error,
        |    lag(c_purchase) OVER w AS p_purchase,
        |    lag(c_signup) OVER w AS p_signup, lag(c_view) OVER w AS p_view
        |  FROM daily WINDOW w AS (ORDER BY day)),
        | m AS (
        |  SELECT day, tot,
        |    (abs(c_click * prev_tot - p_click * tot)
        |     + abs(c_error * prev_tot - p_error * tot)
        |     + abs(c_purchase * prev_tot - p_purchase * tot)
        |     + abs(c_signup * prev_tot - p_signup * tot)
        |     + abs(c_view * prev_tot - p_view * tot)) AS l1num,
        |    tot * prev_tot AS denom
        |  FROM lg WHERE prev_tot IS NOT NULL)
        |SELECT day, tot AS n_events,
        | floor((CAST(l1num AS DOUBLE) / CAST(denom AS DOUBLE))*1000000+0.5)
        |   /1000000 AS l1,
        | (floor((CAST(l1num AS DOUBLE) / CAST(denom AS DOUBLE))*1000000+0.5)
        |   /1000000) > 0.1 AS drifted
        |FROM m ORDER BY day""".stripMargin,

    // e12: independent SQL sessionization with session_window's
    // END-EXCLUSIVE gap rule (diff >= 3600 opens a session, vs e01's
    // lag rule using >); start-seconds floor to integers so boundary
    // placement compares exactly.
    "e12_stream_session_window" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch(ts) AS sec,
        |    lag(epoch(ts)) OVER w AS prev_sec
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | m AS (
        |  SELECT user_id, event_id, sec,
        |    CASE WHEN prev_sec IS NULL OR sec - prev_sec >= 3600.0
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM g),
        | sess AS (
        |  SELECT user_id, event_id, sec,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_idx
        |  FROM m),
        | per AS (
        |  SELECT user_id, session_idx, count(*) AS n_events,
        |    CAST(floor(min(sec)) AS BIGINT) AS start_sec,
        |    min(event_id) AS first_event, max(event_id) AS last_event
        |  FROM sess GROUP BY user_id, session_idx)
        |SELECT user_id, count(*) AS n_sessions,
        | CAST(sum(n_events) AS BIGINT) AS n_events,
        | CAST(sum(start_sec) AS BIGINT) AS sum_start_sec,
        | min(first_event) AS min_first_event,
        | max(last_event) AS max_last_event
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,

    // e11: the bloom is physically load-bearing, semantically invisible
    // — the oracle is the plain NOT IN against the corpus hash set.
    "e11_stream_ingest_dedup" ->
      """WITH a AS (SELECT doc_id, lang, n_chars, md5(text) AS h FROM documents),
        | c AS (SELECT DISTINCT h FROM a WHERE doc_id % 5 < 3),
        | b AS (SELECT * FROM a WHERE doc_id % 5 >= 3),
        | k AS (SELECT lang, n_chars FROM b
        |       WHERE h NOT IN (SELECT h FROM c))
        |SELECT lang, count(*) AS n_new_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "e01_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch(ts) AS sec,
        |    lag(epoch(ts)) OVER w AS prev_sec
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | m AS (
        |  SELECT user_id, event_id, sec,
        |    CASE WHEN prev_sec IS NULL OR sec - prev_sec > 3600.0 THEN 1 ELSE 0 END AS is_new
        |  FROM g),
        | sess AS (
        |  SELECT user_id, event_id, sec,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        | count(*) AS n_events,
        | min(event_id) AS first_event, max(event_id) AS last_event,
        | CAST(floor(max(sec) - min(sec)) AS BIGINT) AS dur_sec
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "e02_asof_join" ->
      """WITH o AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                         ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) t WHERE rn = 1)
        |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
        |FROM events e
        |ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    // e07: stage delays are integer-ms truncated on both sides before
    // the avg, so the double math is exact (sum of <2^53 integers).
    "e07_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(epoch_ns(ts)) AS t_view
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        | c AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t_click, min(v.t_view) AS t_view
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t_view GROUP BY 1),
        | p AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t_purchase, min(c.t_click) AS t_click
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t_click GROUP BY 1)
        |SELECT * FROM
        | (SELECT count(*) AS n_view_users FROM v),
        | (SELECT count(*) AS n_click_users,
        |    floor(avg((t_click - t_view) // 1000000) / 1000.0 * 10000 + 0.5) / 10000
        |      AS avg_view_click_sec FROM c),
        | (SELECT count(*) AS n_purchase_users,
        |    floor(avg((t_purchase - t_click) // 1000000) / 1000.0 * 10000 + 0.5) / 10000
        |      AS avg_click_purchase_sec FROM p)""".stripMargin,

    "e08_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        | coh AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT coh.cohort_day,
        | CAST(date_diff('day', coh.cohort_day, ev.day) AS INT) AS offset_days,
        | count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN coh ON ev.user_id = coh.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // e10: the stream-stream join over a bounded replay is semantically
    // the batch self-join; comparisons and the delay sum stay in the
    // integer-µs domain (Spark's ts is µs-truncated from the ns file).
    "e10_stream_stream_join" ->
      """SELECT count(*) AS n_pairs,
        | count(DISTINCT c.event_id) AS n_clicks,
        | count(DISTINCT p.event_id) AS n_purchases,
        | CAST(sum(epoch_ns(p.ts)//1000 - epoch_ns(c.ts)//1000) AS BIGINT) AS sum_delay_us
        |FROM events c JOIN events p ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_ns(p.ts)//1000 >= epoch_ns(c.ts)//1000
        | AND epoch_ns(p.ts)//1000 <= epoch_ns(c.ts)//1000 + 3600000000""".stripMargin,

    // e09: the oracle states the SEMANTICS (plain inequality join); the
    // Spark side implements it as a bin-replicated equi-join.
    "e09_range_join" ->
      """SELECT e.event_type, count(DISTINCT e.event_id) AS n_events
        |FROM events e JOIN events w ON e.user_id = w.user_id
        | AND w.event_type = 'error'
        | AND epoch_ns(e.ts) BETWEEN epoch_ns(w.ts) AND epoch_ns(w.ts) + 300000000000
        |WHERE e.event_type <> 'error'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "e03_stream_window" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        | count(*) AS n,
        | floor((sum(value))*100+0.5)/100 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    // e14: the BATCH CMS replica — the streamed, multi-batch-merged
    // sketch must equal it exactly (associative counter merge).
    "e14_stream_sketch" ->
      s"""WITH k AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
        | hx AS (
        |  SELECT key, i AS hrow,
        |    ${graft.operators.Sampling.portableGateSql(
             "'cms' || CAST(i AS VARCHAR) || ':' || key")} % 64 AS bucket
        |  FROM k, (SELECT unnest(range(1, 5)) AS i)),
        | sk AS (SELECT hrow, bucket, count(*) AS cnt FROM hx
        |        GROUP BY hrow, bucket),
        | ex AS (SELECT CAST(key AS BIGINT) AS user_id, count(*) AS n_exact
        |        FROM k GROUP BY key),
        | top AS (SELECT user_id, n_exact FROM ex
        |         ORDER BY n_exact DESC, user_id LIMIT 10),
        | pb AS (
        |  SELECT t.user_id, t.n_exact, i AS hrow,
        |    ${graft.operators.Sampling.portableGateSql(
             "'cms' || CAST(i AS VARCHAR) || ':' || CAST(t.user_id AS VARCHAR)")}
        |      % 64 AS bucket
        |  FROM top t, (SELECT unnest(range(1, 5)) AS i)),
        | est AS (
        |  SELECT p.user_id, p.n_exact, CAST(min(s.cnt) AS BIGINT) AS n_est
        |  FROM pb p JOIN sk s ON s.hrow = p.hrow AND s.bucket = p.bucket
        |  GROUP BY p.user_id, p.n_exact),
        | r AS (SELECT user_id, n_exact, n_est,
        |         row_number() OVER (ORDER BY n_exact DESC, user_id) AS rank
        |       FROM est)
        |SELECT CAST(rank AS INTEGER) AS rank, user_id, n_exact, n_est,
        | CAST(n_est - n_exact AS BIGINT) AS overcount
        |FROM r ORDER BY rank""".stripMargin,

    // e15: per-day admitted counts = everything except the staged
    // straggler subset, recomputed here from the gate formula alone —
    // the oracle knows nothing about the stream, so equality proves
    // the watermark dropped exactly the late set and nothing else.
    "e15_late_data_audit" ->
      s"""WITH g AS (
        |  SELECT ts::date AS day,
        |    CASE WHEN ts::date <= DATE '2024-01-15'
        |      AND ${graft.operators.Sampling.portableGateSql(
               "'late:' || CAST(event_id AS VARCHAR)")} % 5 = 0
        |    THEN 1 ELSE 0 END AS is_late
        |  FROM events)
        |SELECT day, count(*) AS n_admitted FROM g
        |WHERE is_late = 0 GROUP BY day ORDER BY day""".stripMargin,

    // e17: the recovered sink's per-day totals must equal the plain
    // batch census — if the re-delivered batch double-counted (append
    // instead of overwrite) or lost rows (commit-less batch dropped),
    // the per-day counts diverge row-exactly.
    "e17_restart_recovery" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        |FROM events GROUP BY day ORDER BY day""".stripMargin,

    // e16: identical strictly-preceding ROWS frame and (ns, event_id)
    // ordering; latency is integer-ns, floored to ms before any double.
    "e16_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value, epoch_ns(ts) AS tns
        |  FROM events),
        | wc AS (
        |  SELECT *, max(CASE WHEN event_type = 'click' THEN tns END)
        |    OVER (PARTITION BY user_id ORDER BY tns, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ns
        |  FROM e),
        | p AS (
        |  SELECT user_id, value, (tns - click_ns) // 1000000 AS lat_ms,
        |    CASE WHEN click_ns IS NULL THEN 'no_prior_click'
        |         WHEN tns - click_ns <= 60000000000 THEN 'a_within_1m'
        |         WHEN tns - click_ns <= 3600000000000 THEN 'b_within_1h'
        |         WHEN tns - click_ns <= 7200000000000 THEN 'c_within_2h'
        |         ELSE 'expired' END AS bucket
        |  FROM wc WHERE event_type = 'purchase')
        |SELECT bucket, count(*) AS n_purchases,
        | count(DISTINCT user_id) AS n_users,
        | floor((sum(value))*10000+0.5)/10000 AS revenue,
        | coalesce(floor((avg(lat_ms) / 1000.0)*10000+0.5)/10000, -1.0)
        |   AS avg_lat_sec
        |FROM p GROUP BY bucket ORDER BY bucket""".stripMargin,

    // e05: the doubled replay must collapse back to the original table
    // — the oracle aggregates the ORIGINAL events, never the doubling.
    "e05_stream_dedup" ->
      """SELECT event_type, count(*) AS n,
        | floor((sum(value))*100+0.5)/100 AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // e06: the stream-static join is semantically the plain batch join.
    "e06_stream_enrich" ->
      """SELECT c_mktsegment, count(*) AS n,
        | floor((sum(value))*100+0.5)/100 AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // Millisecond-domain replica of the stateful sessionizer's contract:
    // sessions split on >1h gaps of epoch_ms, first/last event follow
    // (ms, event_id) processing order, dur = integer-ms delta / 1000.0
    // (bit-identical IEEE division on both engines), and each user's
    // LAST session is excluded — on a bounded stream it is never closed
    // by a later event, so the operator never emits it.
    "e04_stream_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER w AS prev_ms
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        | m AS (
        |  SELECT user_id, event_id, ms,
        |    CASE WHEN prev_ms IS NULL OR ms - prev_ms > 3600000 THEN 1 ELSE 0 END AS is_new
        |  FROM g),
        | sess AS (
        |  SELECT user_id, event_id, ms,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx
        |  FROM m),
        | ranked AS (
        |  SELECT user_id, event_id, ms, sidx,
        |    row_number() OVER (PARTITION BY user_id, sidx
        |                       ORDER BY ms, event_id) AS rn_asc,
        |    row_number() OVER (PARTITION BY user_id, sidx
        |                       ORDER BY ms DESC, event_id DESC) AS rn_desc
        |  FROM sess),
        | agg AS (
        |  SELECT user_id, sidx, count(*) AS n_events,
        |    (max(ms) - min(ms)) / 1000.0 AS dur_sec,
        |    max(CASE WHEN rn_asc = 1 THEN event_id END) AS first_event,
        |    max(CASE WHEN rn_desc = 1 THEN event_id END) AS last_event,
        |    max(sidx) OVER (PARTITION BY user_id) AS max_sidx
        |  FROM ranked GROUP BY user_id, sidx)
        |SELECT user_id, n_events, dur_sec, first_event, last_event
        |FROM agg WHERE sidx < max_sidx
        |ORDER BY user_id, first_event""".stripMargin,

    // e25: the streaming path reduces to a batch day-census (the e22
    // argument: contiguous staged slices + 1h watermark = zero drops,
    // sentinel windows never emit). Merge table = TextQueries.bpeCteSql
    // (t42's m1..mN verbatim — the oracle and the stream cannot learn
    // different tokenizers); the plant, the (day, lang, word) fold, a
    // t43-style carry-column apply, and the exact cross-multiplied
    // 1.08× drift gate (HUGEINT here, DECIMAL(38,0) Spark-side — both
    // exact at 100 TB operand magnitude) against each lang's day-0
    // baseline.
    "e25_fertility_drift" -> {
      val rounds = graft.queries.TextQueries.BpeRounds
      val days = FertDays
      val applies = (1 to rounds).map { r =>
        val p = r - 1
        s"""fe$r AS (SELECT dayi, lang, w, freq,
           |          replace(fe$p.sy, '#' || m$r.l_sym || '##' || m$r.r_sym || '#',
           |                  '#' || m$r.l_sym || m$r.r_sym || '#') AS sy
           |        FROM fe$p, m$r)""".stripMargin
      }
      s"""WITH ${graft.queries.TextQueries.bpeCteSql},
        | ev AS (SELECT CAST(doc_id % $days AS INTEGER) AS dayi, lang,
        |          CASE WHEN doc_id % $days = ${days - 1}
        |               THEN reverse(w0) ELSE w0 END AS w
        |        FROM (SELECT doc_id, lang,
        |                unnest(list_filter(string_split(text, ' '),
        |                  x -> x <> '')) AS w0
        |              FROM documents)),
        | wf AS (SELECT dayi, lang, w, count(*) AS freq
        |        FROM ev GROUP BY 1, 2, 3),
        | fe0 AS (SELECT dayi, lang, w, freq,
        |           '##' || regexp_replace(w, '(.)', '\\1##', 'g') AS sy
        |         FROM wf),
        | ${applies.mkString(",\n ")},
        | fenc AS (SELECT dayi, lang, freq,
        |            len(list_filter(string_split(sy, '##'), x -> x <> ''))
        |              AS nt
        |          FROM fe$rounds),
        | cen AS (SELECT dayi, lang, CAST(sum(freq) AS BIGINT) AS n_words,
        |           CAST(sum(freq * nt) AS BIGINT) AS n_tokens
        |         FROM fenc GROUP BY 1, 2),
        | b AS (SELECT lang, n_words AS b_words, n_tokens AS b_tokens
        |       FROM cen WHERE dayi = 0)
        |SELECT cen.dayi, cen.lang, n_words, n_tokens,
        | floor((CAST(n_tokens AS DOUBLE) / n_words)*10000+0.5)/10000
        |   AS fertility,
        | (CAST(n_tokens AS HUGEINT) * b_words * 100 >
        |  CAST(b_tokens AS HUGEINT) * n_words * 108) AS drifted
        |FROM cen JOIN b ON b.lang = cen.lang
        |ORDER BY cen.dayi, cen.lang""".stripMargin
    },

    // e26: the streaming path reduces to a batch (day, source) census
    // (the e22/e25 argument: contiguous staged slices + 1h watermark
    // = zero drops, sentinel windows never emit and carry source 'zz'
    // absent from the baseline join). Weights = the shared qcCteSql
    // perceptron replica (ww{QcRounds} — the oracle RETRAINS t44's
    // exact weights, so the monitor is certified against
    // independently-derived weights); the plant, the raw-feature CTE,
    // and the HUGEINT absolute-jump gate against each source's day-0
    // baseline.
    "e26_quality_drift" -> {
      import graft.queries.{TextQueries => TQ}
      val days = FertDays
      val plantedSql = ("'" +
        Seq.fill(TQ.QcBannerReps)(TQ.BoilerHeader).mkString(" ")
          .replace("'", "''") + "'")
      s"""WITH ${TQ.qcCteSql},
        | e26c AS (SELECT doc_id, source,
        |     CAST(doc_id % $days AS INTEGER) AS dayi,
        |     CASE WHEN doc_id % $days = ${days - 1}
        |            AND (doc_id // 60) % 3 = 0
        |          THEN $plantedSql ELSE text END AS text
        |   FROM documents),
        | ${TQ.qcRawFeatureCteSql("e26c", "e26")},
        | e26m AS (SELECT dayi, source,
        |     CASE WHEN (w1*x1 + w2*x2 + w3*x3 + w4*x4 + w5*x5) <= 0
        |          THEN 1 ELSE 0 END AS fl
        |   FROM e26qx, ww${TQ.QcRounds}),
        | e26cen AS (SELECT dayi, source, count(*) AS n_docs,
        |     CAST(sum(fl) AS BIGINT) AS n_flagged
        |   FROM e26m GROUP BY 1, 2),
        | e26b AS (SELECT source, n_docs AS b_docs,
        |     n_flagged AS b_flagged
        |   FROM (SELECT *, row_number()
        |       OVER (PARTITION BY source ORDER BY dayi) AS brn
        |     FROM e26cen) WHERE brn = 1)
        |SELECT c.dayi, c.source, CAST(n_docs AS BIGINT) AS n_docs,
        | n_flagged,
        | floor((CAST(n_flagged AS DOUBLE) / n_docs)*10000+0.5)/10000
        |   AS flag_rate,
        | (CAST(n_flagged AS HUGEINT) * b_docs * 100 >
        |  CAST(b_flagged AS HUGEINT) * n_docs * 100 +
        |  CAST(10 AS HUGEINT) * n_docs * b_docs) AS drifted
        |FROM e26cen c JOIN e26b b ON b.source = c.source
        |ORDER BY c.dayi, c.source""".stripMargin
    },
  )
}
