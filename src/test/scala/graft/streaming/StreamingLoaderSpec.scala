package graft.streaming

import java.nio.file.Files

import graft.SparkSessionFixture
import graft.engine.schema.Schemas
import graft.engine.sink.JdbcTableSink
import graft.engine.source.CsvOptions
import org.scalatest.funsuite.AnyFunSuite

class StreamingLoaderSpec extends AnyFunSuite {
  import SparkSessionFixture.spark

  test("file-stream CSVs land in Derby through the sink, batch-by-batch") {
    val dir = Files.createTempDirectory("graft-stream").toString
    Files.writeString(java.nio.file.Paths.get(dir, "a.csv"), "1,x\n2,y\n")
    Files.writeString(java.nio.file.Paths.get(dir, "b.csv"), "3,z\n")

    val url = "jdbc:derby:memory:stream1;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE st ("k" BIGINT, "v" VARCHAR(50))""")
    conn.close()

    val sink = new JdbcTableSink(spark, url, "st")
    val q = StreamingLoader.start(spark,
      StreamingLoader.StreamConfig(dir, CsvOptions(),
        Schemas.syntheticSchema(2)), sink)
    q.awaitTermination(60000)

    val conn2 = java.sql.DriverManager.getConnection(url)
    val rs = conn2.createStatement().executeQuery(
      """SELECT "k", "v" FROM st ORDER BY "k"""")
    val rows = Iterator.continually(rs).takeWhile(_.next())
      .map(r => (r.getLong(1), r.getString(2))).toList
    conn2.close()
    assert(rows == List((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("streaming dedup: dropDuplicatesWithinWatermark removes replayed events") {
    import SparkSessionFixture.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = mem.toDS().toDF("event_id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("graft_stream_dedup").start()
    def ev(id: Long, sec: Long) = (id, new java.sql.Timestamp(sec * 1000))
    mem.addData(ev(1, 0), ev(2, 10), ev(1, 20)) // in-batch replay
    q.processAllAvailable()
    mem.addData(ev(2, 30), ev(3, 40))           // cross-batch replay
    q.processAllAvailable()
    val n = spark.table("graft_stream_dedup").count()
    q.stop()
    assert(n == 3) // ids 1, 2, 3 exactly once
  }

  test("IdempotentSink: a retried micro-batch replaces its output, not appends") {
    import SparkSessionFixture.spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft-idem").toString
    IdempotentSink.writeBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L, out)
    IdempotentSink.writeBatch(Seq((3L, "c")).toDF("id", "v"), 1L, out)
    // at-least-once delivery: the job died after the sink write but
    // before the checkpoint commit, so batch 1 is delivered AGAIN
    IdempotentSink.writeBatch(Seq((3L, "c")).toDF("id", "v"), 1L, out)
    val got = spark.read.parquet(out)
    assert(got.count() == 3, "replayed batch must overwrite its partition")
    assert(got.filter(col("batch_id") === 1).count() == 1)
    // and the retry must not have touched other batches' partitions
    assert(got.filter(col("batch_id") === 0).count() == 2)
  }

  test("stream into a missing table is refused (as-is semantics)") {
    val url = "jdbc:derby:memory:stream2;create=true"
    intercept[IllegalArgumentException] {
      StreamingLoader.start(spark,
        StreamingLoader.StreamConfig("/tmp/nowhere", CsvOptions(),
          Schemas.syntheticSchema(2)),
        new JdbcTableSink(spark, url, "missing"))
    }
  }
}
