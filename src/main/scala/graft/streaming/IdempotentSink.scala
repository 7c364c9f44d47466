package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** Idempotent parquet sink for `foreachBatch`.
  *
  * foreachBatch gives at-least-once delivery: if the job dies after the
  * sink write but before the checkpoint commit, the SAME micro-batch is
  * re-delivered on restart, and a blind `mode("append")` sink would
  * duplicate its rows. The standard fix (Structured Streaming docs) is
  * to key the write on `batchId`: each batch lands in its own
  * `batch_id=<id>` partition via dynamic partition overwrite, so a
  * retried batch REPLACES its previous (possibly partial) output and
  * the sink converges to exactly-once regardless of how many times a
  * batch is re-run.
  *
  * The overwrite mode is a per-write option, not a session conf —
  * mutating the shared session from inside a sink closure would change
  * behavior for concurrent queries (see [[graft.Sessions]]).
  *
  * At scale this is also the right layout: one directory per batch
  * means a compaction/retention job can age out whole batches by
  * partition pruning, never by rewriting files.
  */
object IdempotentSink {
  def writeBatch(batch: DataFrame, batchId: Long, outDir: String): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)
}
