package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for EXPENSIVE SHARED BUILDS — the d09Labels
  * cross-consumer discipline (DedupQueries.scala) factored out so other
  * build families can ride it without re-implementing the cache +
  * eviction plumbing. r20 consumers: the BPE merge table (one learn per
  * (corpus, rounds) instead of four across t42/t43/t46/e25 in a sweep)
  * and the s27/s28 graph-ANN index (one hierarchy+edge build per
  * (corpus, variant) instead of three).
  *
  * Semantics contract (what keeps the hash oracle and the digest
  * manifest sound):
  *  - The memo ONLY skips recomputation. The build closure must be
  *    deterministic for its key, so memo-hit and memo-miss return
  *    bit-identical values (spec: BuildMemoSpec). Consumers must route
  *    ALL inputs through the key — the builder closures here construct
  *    their corpus folds INTERNALLY from (dir, knobs), so two consumers
  *    structurally cannot desynchronize on the fold.
  *  - The published PLAN must not depend on hit vs miss: [[memo]]
  *    returns the collected VALUE both ways (consumers emit the same
  *    downstream expressions/local relations), and [[memoParquet]]
  *    returns a parquet directory both ways (the build writes eagerly
  *    on miss, then everyone reads) — so PLAN_DIGESTS.md digests are
  *    order-independent even though the sweep shares the cache.
  *  - Keys are scoped to (applicationId # session identity), mirroring
  *    d09's labelCache: a new session never sees another session's
  *    entries, and an application-end listener evicts + deletes any
  *    parquet handoff dirs (no leaked temp state across driver runs).
  *
  * Driver memory stays bounded: [[memo]] is for BOUNDED collected
  * values only (the bounded-scalar-read discipline — 8-row merge
  * tables, 1-row weight vectors, never corpus-sized data); anything
  * row-count-unbounded goes through [[memoParquet]], which keeps the
  * data on disk and in executors. */
object BuildMemo {

  private sealed trait Handle
  private final case class ValueHandle(v: AnyRef) extends Handle
  private final case class DirHandle(path: String) extends Handle

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Handle]()
  private val evictionHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def sessionKey(s: SparkSession): String =
    s.sparkContext.applicationId + "#" + System.identityHashCode(s)

  /** Lookup-or-build WITHOUT holding the map's bin lock during the
    * build: `ConcurrentHashMap.computeIfAbsent` forbids the mapping
    * function touching the same map, and memo builds legitimately
    * NEST (qcModel's build reads the qcFeatures handoff — both live
    * here), which threw `IllegalStateException("Recursive update")`
    * nondeterministically, only when the two keys landed in the same
    * bin (caught by the r20 soak's x10 corpus dirs). Computing
    * outside the map makes nesting safe; a concurrent race builds at
    * most twice and `putIfAbsent` keeps the first, with the loser's
    * handoff dir deleted (drivers here are single-threaded, so the
    * race arm is belt-and-suspenders). */
  private def getOrBuild(key: (String, String), build: () => Handle)
      : Handle = {
    val existing = cache.get(key)
    if (existing != null) existing
    else {
      val built = build()
      val prev = cache.putIfAbsent(key, built)
      if (prev == null) built
      else {
        built match {
          case DirHandle(p) => deleteDir(p)
          case _ => ()
        }
        prev
      }
    }
  }

  /** Memoize a bounded driver-side value (e.g. a collected 8-row merge
    * table) under `key`, scoped to `s`'s session. The build runs at
    * most once per (session, key); later callers get the SAME value.
    * Builds may nest (call [[memo]]/[[memoParquet]] inside a build). */
  def memo[T <: AnyRef](s: SparkSession, key: String)(build: => T): T = {
    installEviction(s)
    getOrBuild((sessionKey(s), key), () => ValueHandle(build)) match {
      case ValueHandle(v) => v.asInstanceOf[T]
      case DirHandle(p) => sys.error(
        s"BuildMemo: key '$key' already holds a parquet handoff at $p — " +
          "one key cannot be both a value and a directory")
    }
  }

  /** Memoize a PERSISTED build: on miss, creates a temp directory,
    * runs `build(dir)` (which must write its parquet outputs under
    * `dir`), and caches the path; on hit, returns the existing path.
    * The directory is deleted at application end (or [[evictSession]]).
    * Callers read with `spark.read.parquet(s"$dir/<part>")`, so the
    * consumer plan is a parquet scan on hit AND miss. Builds may
    * nest. */
  def memoParquet(s: SparkSession, key: String)(build: String => Unit)
      : String = {
    installEviction(s)
    getOrBuild((sessionKey(s), key), { () =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-memo-").toString
      build(dir)
      DirHandle(dir)
    }) match {
      case DirHandle(p) => p
      case ValueHandle(_) => sys.error(
        s"BuildMemo: key '$key' already holds a collected value — " +
          "one key cannot be both a value and a directory")
    }
  }

  private val stageSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** One-shot STAGED build — the cold-build bench cells' primitive
    * (r22): same parquet handoff + application-end cleanup as
    * [[memoParquet]], but keyed with a per-call sequence number so the
    * build ALWAYS runs (nothing is ever served from a previous call)
    * and never touches — or races with — the real memo entry another
    * query may be reading concurrently (the parallel Verify dump runs
    * x-cells beside the memo consumers). */
  def stageParquet(s: SparkSession, tag: String)(build: String => Unit)
      : String =
    memoParquet(s, s"stage:$tag:#${stageSeq.incrementAndGet}")(build)

  /** Test/diagnostic view: Some("memo") for a cached value,
    * Some(path) for a parquet handoff, None when uncached. */
  private[graft] def handleInfo(s: SparkSession, key: String)
      : Option[String] =
    Option(cache.get((sessionKey(s), key))).map {
      case ValueHandle(_) => "memo"
      case DirHandle(p) => p
    }

  private def deleteDir(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      // Files.walk holds directory handles until closed — materialize
      // the listing, then close, before deleting (r20 advice)
      val walk = java.nio.file.Files.walk(p)
      val entries =
        try walk.iterator().asScala.toSeq finally walk.close()
      entries.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def dropEntry(key: (String, String)): Unit =
    Option(cache.remove(key)).foreach {
      case DirHandle(path) => deleteDir(path)
      case _ => ()
    }

  /** Drop memoized builds whose key string equals `key` (any session)
    * — for callers that mutate an input corpus in place within one
    * session (the d09 invalidateLabels mirror). */
  def invalidate(key: String): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) { val k = it.next(); if (k._2 == key) dropEntry(k) }
  }

  /** Drop every entry (and handoff dir) owned by `appId` — the
    * application-end listener's action, exposed for specs and eager
    * eviction. */
  def evictSession(appId: String): Unit = {
    // NOTE: deliberately does NOT remove appId from evictionHooked —
    // an EAGER eviction (Soak's per-timed-run cache reset) must not
    // cause the next memo call to register a fresh application-end
    // listener, or a long soak accumulates duplicate listeners on the
    // shared bus (r20 advice). The hook entry is cleared only from
    // inside the application-end listener itself, where the appId is
    // genuinely done.
    val it = cache.keySet().iterator()
    while (it.hasNext) {
      val k = it.next(); if (k._1.startsWith(appId + "#")) dropEntry(k)
    }
  }

  private def installEviction(s: SparkSession): Unit = {
    val appId = s.sparkContext.applicationId
    if (evictionHooked.add(appId))
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
              : Unit = {
            evictionHooked.remove(appId)
            evictSession(appId)
          }
        })
  }
}
