package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cumulative per-key quota admission — rate limiting at the ingest
  * edge (SURVEY.md §2.11's custom-state surface, beside
  * [[StatefulSessionize]]): each key (source, tenant, feed) may ship at
  * most `quota` rows into the corpus EVER, enforced across micro-batches
  * by a single running counter per key in `flatMapGroupsWithState`.
  * This is the standing-cap shape (dataset licensing caps, per-tenant
  * ingest budgets, abuse throttles), distinct from e05's watermarked
  * window dedup (time-scoped) and e11's bloom gate (content-scoped).
  *
  * Scale: state per key is ONE long — keys × 8 bytes, the smallest
  * possible stateful footprint; each batch shuffles only on the key and
  * emits at most the remaining quota per key, so sink traffic is
  * min(batch, quota-so-far)-bounded. Admission within a batch is
  * deterministic (ascending doc_id — the contractual tie order), so a
  * checkpoint replay of the same batch admits the same rows and the
  * idempotent sink converges; admission across batches follows arrival
  * order, which is what a quota MEANS on a stream.
  */
object QuotaAdmission {

  final case class Doc(doc_id: Long, source: String)

  def admit(docs: Dataset[Doc], quota: Long)(
      implicit spark: SparkSession): Dataset[Doc] = {
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (src: String, it: Iterator[Doc], state: GroupState[Long]) => {
          var admitted = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[Doc]
          // sort the batch's rows for this key: admission must not
          // depend on task/file iteration order, or a checkpoint
          // replay could admit a different set than the original run
          it.toSeq.sortBy(_.doc_id).foreach { d =>
            if (admitted < quota) { out += d; admitted += 1 }
          }
          state.update(admitted)
          out.iterator
        })
  }
}
