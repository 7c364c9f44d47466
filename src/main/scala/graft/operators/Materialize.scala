package graft.operators

import org.apache.spark.sql.DataFrame

/** Conf-selected lineage barrier for iterative operators:
  * `spark.graft.checkpoint.mode = local | reliable`.
  *
  * Every fixpoint/multi-round operator in this engine (labelPropagate,
  * lloyd / lloydGrouped, the routed ANN scans, PrefixScan) must cut
  * lineage each round — otherwise the plan doubles per iteration and
  * re-evaluates shared frames per consumer. HOW it cuts lineage is a
  * deployment decision, not an operator decision, so it is one conf:
  *
  *  - `local` (default): eager `localCheckpoint` — blocks land in the
  *    executors' block managers, zero distributed-FS I/O. The right
  *    call in local mode and on clusters where re-running the job
  *    after an executor loss is acceptable: local checkpoints DIE WITH
  *    ANY EXECUTOR (the Spark scaladoc's own warning), turning one
  *    lost container into a job failure.
  *  - `reliable`: eager `checkpoint` — one write+read round-trip
  *    through the SparkContext checkpoint dir (HDFS/S3 on a real
  *    cluster; set `spark.graft.checkpoint.dir`, or pre-set
  *    `sc.setCheckpointDir`). Survives executor loss, so a 1000-round
  *    label propagation on 1000 executors doesn't restart because one
  *    machine was preempted. PROVEN, not assumed: [[graft.ExecutorLoss]]
  *    SIGKILLs a live executor mid-fixpoint on local-cluster[2,2,2048]
  *    and both d09 label propagation and the s24 hierarchical build
  *    complete with fingerprints equal to the undisturbed run (r15).
  *
  * Cost model: the checkpointed frames here are deliberately tiny —
  * centroid tables (k rows), (id, label) pairs, (id, band, bucket)
  * triples — so reliable mode's FS round-trip is metadata-sized per
  * round; the dominant cost either way is the barrier itself (losing
  * pipelining), which both modes pay identically. Prefer `local`
  * whenever the cluster can afford a rare re-run; flip to `reliable`
  * when rounds × executors makes some loss near-certain.
  *
  * Checkpoint files are cleaned on context stop only if
  * `spark.cleaner.referenceTracking.cleanCheckpoints` is set; on a
  * shared dir, point `spark.graft.checkpoint.dir` at a job-scoped path
  * and reap it with the job. */
object Materialize {
  val ModeConf = "spark.graft.checkpoint.mode"
  val DirConf = "spark.graft.checkpoint.dir"

  def apply(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.get(ModeConf, "local") match {
      case "local" => df.localCheckpoint(eager = true)
      case "reliable" =>
        val sc = s.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = s.conf.get(DirConf, "")
          require(dir.nonEmpty,
            s"$ModeConf=reliable needs a checkpoint dir: set $DirConf " +
              "or call sc.setCheckpointDir before the first materialize")
          sc.setCheckpointDir(dir)
        }
        df.checkpoint(eager = true)
      case other => throw new IllegalArgumentException(
        s"$ModeConf must be 'local' or 'reliable', got '$other'")
    }
  }

  /** LAZY lineage barrier — the shared-subtree variant (r22). Same
    * conf-selected local/reliable checkpoint as [[apply]], but with
    * `eager = false`: the frame's RESULT stage is deferred to its
    * first consumer, and every other consumer (including
    * broadcast-exchange builds, which otherwise re-evaluate their
    * whole subtree per build) reads the persisted blocks — the
    * subtree computes at most once (CheckpointModeSpec counts UDF
    * evaluations to pin this). One AQE caveat, pinned in the same
    * spec: `toRdd` on an adaptive plan still materializes the
    * UPSTREAM SHUFFLE stages at construction (AQE needs them to fix
    * the final plan); only the result stage defers. Use it when the
    * goal is de-duplicating a multi-consumer subtree rather than
    * cutting an iterative plan: the eager form additionally runs the
    * result stage + block persistence as a SERIALIZED driver-blocking
    * job per call (measured r22: four eager barriers added ~0.5 s of
    * pure job latency to t19 at sf0.1 while the duplicate broadcast
    * builds they replaced ran concurrently for less). */
  def lazily(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.get(ModeConf, "local") match {
      case "local" => df.localCheckpoint(eager = false)
      case "reliable" =>
        val sc = s.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = s.conf.get(DirConf, "")
          require(dir.nonEmpty,
            s"$ModeConf=reliable needs a checkpoint dir: set $DirConf " +
              "or call sc.setCheckpointDir before the first materialize")
          sc.setCheckpointDir(dir)
        }
        df.checkpoint(eager = false)
      case other => throw new IllegalArgumentException(
        s"$ModeConf must be 'local' or 'reliable', got '$other'")
    }
  }

  /** `.materialize` postfix form, so call sites read like the
    * `.localCheckpoint(true)` chains they replace. */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialize: DataFrame = Materialize(df)
    def materializeLazy: DataFrame = Materialize.lazily(df)
  }
}
