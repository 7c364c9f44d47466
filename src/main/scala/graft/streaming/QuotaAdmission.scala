package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Cumulative per-key quota admission — rate limiting at the ingest
  * edge (SURVEY.md §2.11's custom-state surface, beside
  * [[StatefulSessionize]]): each key (source, tenant, feed) may ship at
  * most `quota` rows into the corpus EVER, enforced across micro-batches
  * by a single running counter per key. This is the standing-cap shape
  * (dataset licensing caps, per-tenant ingest budgets, abuse
  * throttles), distinct from e05's watermarked window dedup
  * (time-scoped) and e11's bloom gate (content-scoped).
  *
  * Two API wrappers around ONE admission kernel ([[admitBatch]]):
  * [[admit]] on legacy `flatMapGroupsWithState` (regression
  * companion), [[admitTws]] on `transformWithState` /
  * [[StatefulProcessor]] with a typed [[ValueState]] counter on
  * RocksDB — the production path (e18 rides it): the counter lives
  * off-heap with changelog checkpoints, so a million-tenant cap table
  * costs executor disk, not heap.
  *
  * Scale: state per key is ONE long — keys × 8 bytes, the smallest
  * possible stateful footprint; each batch shuffles only on the key and
  * emits at most the remaining quota per key, so sink traffic is
  * min(batch, quota-so-far)-bounded. Per-batch HEAP is bounded too: a
  * key whose quota is exhausted drains without buffering a single row,
  * and an open key buffers at most (quota − admitted) rows in a
  * size-capped heap — never the whole batch slice, so one hot key
  * cannot OOM an executor. Admission within a batch is
  * deterministic (ascending doc_id — the contractual tie order), so a
  * checkpoint replay of the same batch admits the same rows and the
  * idempotent sink converges; admission across batches follows arrival
  * order, which is what a quota MEANS on a stream.
  */
object QuotaAdmission {

  final case class Doc(doc_id: Long, source: String)

  /** ONE batch slice of ONE key through the admission kernel: keep the
    * `remaining` smallest doc_ids in a bounded max-heap (never
    * materialize the slice), emit them ascending. Shared verbatim by
    * both API wrappers. */
  private[streaming] def admitBatch(remaining: Long,
      it: Iterator[Doc]): Array[Doc] = {
    val cap = math.min(remaining, Int.MaxValue.toLong).toInt
    val heap = new java.util.PriorityQueue[Doc](
      math.min(cap, 1024).max(1),
      Ordering.by[Doc, Long](_.doc_id).reverse)
    it.foreach { d =>
      if (heap.size < cap) heap.add(d)
      else if (d.doc_id < heap.peek().doc_id) { heap.poll(); heap.add(d) }
    }
    val out = new Array[Doc](heap.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = heap.poll(); i -= 1 } // ascending emit
    out
  }

  /** Legacy `flatMapGroupsWithState` wrapper. */
  def admit(docs: Dataset[Doc], quota: Long)(
      implicit spark: SparkSession): Dataset[Doc] = {
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (src: String, it: Iterator[Doc], state: GroupState[Long]) => {
          val admitted = state.getOption.getOrElse(0L)
          val remaining = quota - admitted
          if (remaining <= 0L) {
            // quota exhausted: nothing can be admitted, so never buffer
            Iterator.empty
          } else {
            val out = admitBatch(remaining, it)
            state.update(admitted + out.length)
            out.iterator
          }
        })
  }

  private class QuotaProc(quota: Long)
      extends StatefulProcessor[String, Doc, Doc] {
    @transient private var admitted: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // TTLConfig.NONE: a standing cap never forgets (contrast a
      // time-windowed rate limit, which would set a TTL and get
      // background eviction for free)
      admitted = getHandle.getValueState[Long](
        "admitted", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(src: String, rows: Iterator[Doc],
        timers: TimerValues): Iterator[Doc] = {
      val a = if (admitted.exists()) admitted.get() else 0L
      val remaining = quota - a
      if (remaining <= 0L) {
        Iterator.empty
      } else {
        val out = admitBatch(remaining, rows)
        admitted.update(a + out.length)
        out.iterator
      }
    }
  }

  /** [[admit]] on the MODERN API — `transformWithState` with a typed
    * [[ValueState]] long counter on the RocksDB store (required by the
    * API). Identical semantics by construction: both wrappers run
    * [[admitBatch]]. */
  def admitTws(docs: Dataset[Doc], quota: Long)(
      implicit spark: SparkSession): Dataset[Doc] = {
    import spark.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new QuotaProc(quota),
        TimeMode.None(), OutputMode.Append())
  }
}
