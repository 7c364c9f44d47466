package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout helpers for the 100 TB path (SURVEY.md §4 Spark
  * counterparts): bucketing co-locates join/aggregation keys at write
  * time so repeated joins on the key run shuffle-free, and
  * date/column partitioning lets Catalyst prune whole directories out
  * of a scan before any IO happens.
  *
  * These wrap the public DataFrameWriter surface; the value is the
  * policy (bucket counts, sorted buckets, overwrite semantics) plus the
  * plan-level tests that prove the exchanges actually disappear.
  */
object StorageLayout {

  /** Write as a bucketed+sorted managed table. Joins between two tables
    * bucketed the same way on the same key skip both sort and shuffle
    * (sort-merge join reads co-located sorted buckets directly). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Write hive-style partitioned parquet; query-time filters on the
    * partition columns prune directories at planning time. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
