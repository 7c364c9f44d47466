package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkSessionFixture
import graft.engine.sink.{JdbcTableSink, ManagedTableSink, TableMode}
import graft.engine.source.CsvOptions
import org.scalatest.funsuite.AnyFunSuite

/** The reference's 9 manual end-to-end scenarios
  * (`sample/manual_test_cases.md`) automated against embedded Derby and
  * the session catalog — SURVEY.md §5. */
class LoaderSpec extends AnyFunSuite {
  import SparkSessionFixture.spark

  private var n = 0
  private def freshDb(): String = { n += 1; s"jdbc:derby:memory:loader$n;create=true" }

  private def csvFile(content: String): String = {
    val p: Path = Files.createTempFile("graft-test-", ".csv")
    p.toFile.deleteOnExit()
    Files.writeString(p, content)
    p.toString
  }

  // header.csv fixture shape (FIXTURES.md): ints, text, json-ish, date, empties
  private val headerCsv = csvFile(
    """id,name,payload,created,score
      |1,alpha,{},2020-01-01,10
      |2,beta,{"k":1},2020-01-02,
      |3,gamma,{},2020-01-03,30
      |""".stripMargin)
  private val noHeaderCsv = csvFile(
    """1,alpha,{},2020-01-01,10
      |2,beta,{"k":1},2020-01-02,20
      |""".stripMargin)
  // scenario-4 shape: headerless (the reference's "typed table, no
  // header" case pairs by native column order) with an empty cell
  private val noHeaderEmptyCsv = csvFile(
    """1,alpha,{},2020-01-01,10
      |2,beta,{"k":1},2020-01-02,
      |3,gamma,{},2020-01-03,30
      |""".stripMargin)

  private def derbyQuery(url: String, sql: String): Seq[Seq[Any]] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val ncols = rs.getMetaData.getColumnCount
      val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      while (rs.next()) buf += (1 to ncols).map(rs.getObject)
      buf.toSeq
    } finally conn.close()
  }

  // 1-2: no table, no header → fails as-is; ok with mode=create
  test("scenario 1: missing table + as-is mode fails (ref :1-20)") {
    val url = freshDb()
    intercept[IllegalStateException] {
      Loader.perform(spark,
        Loader.LoadConfig(noHeaderCsv, CsvOptions(), TableMode.AsIs),
        new JdbcTableSink(spark, url, "t1"))
    }
  }

  test("scenario 2: missing table + create → all-string table, synthetic names (ref :21-36)") {
    val url = freshDb()
    val res = Loader.perform(spark,
      Loader.LoadConfig(noHeaderCsv, CsvOptions(), TableMode.Create),
      new JdbcTableSink(spark, url, "t2"))
    assert(res.createdTable && res.rowsLoaded == 2)
    val rows = derbyQuery(url, """SELECT "col0","col4" FROM t2 ORDER BY "col0"""")
    assert(rows == Seq(Seq("1", "10"), Seq("2", "20"))) // strings, not ints
  }

  test("scenario 3: missing table + create + header → header names (ref :38-64)") {
    val url = freshDb()
    val res = Loader.perform(spark,
      Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.Create),
      new JdbcTableSink(spark, url, "t3"))
    assert(res.rowsLoaded == 3)
    val rows = derbyQuery(url, """SELECT "id","name" FROM t3 ORDER BY "id"""")
    assert(rows.map(_(1)) == Seq("alpha", "beta", "gamma"))
  }

  test("scenario 4: typed table by-ordinal with NULL + NOT-NULL failure (ref :66-106)") {
    val url = freshDb()
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE t4 ("a" BIGINT, "b" VARCHAR(100), "c" VARCHAR(100),
        | "d" VARCHAR(100), "e" INTEGER)""".stripMargin)
    conn.close()
    val res = Loader.perform(spark,
      Loader.LoadConfig(noHeaderEmptyCsv, CsvOptions(), TableMode.AsIs),
      new JdbcTableSink(spark, url, "t4"))
    assert(res.rowsLoaded == 3)
    val rows = derbyQuery(url, """SELECT "a","e" FROM t4 ORDER BY "a"""")
    assert(rows(0) == Seq(1L, 10))
    assert(rows(1)(1) == null) // empty score cell → NULL in nullable int col

    // NOT NULL numeric target + empty cell → the load aborts (ref "Fail on not null")
    val url2 = freshDb()
    val conn2 = java.sql.DriverManager.getConnection(url2)
    conn2.createStatement().executeUpdate(
      """CREATE TABLE t4b ("a" BIGINT, "b" VARCHAR(100), "c" VARCHAR(100),
        | "d" VARCHAR(100), "e" INTEGER NOT NULL)""".stripMargin)
    conn2.close()
    intercept[Exception] {
      Loader.perform(spark,
        Loader.LoadConfig(noHeaderEmptyCsv, CsvOptions(), TableMode.AsIs),
        new JdbcTableSink(spark, url2, "t4b"))
    }
  }

  test("scenario 5: drop-and-create replaces prior contents (ref :108-130)") {
    val url = freshDb()
    val sink = new JdbcTableSink(spark, url, "t5")
    Loader.perform(spark,
      Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.Create), sink)
    Loader.perform(spark,
      Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.DropAndCreate), sink)
    assert(derbyQuery(url, "SELECT count(*) FROM t5")(0)(0) == 3)
  }

  test("scenario 6: truncate and delete-all are idempotent reloads (ref :132-155)") {
    val url = freshDb()
    val sink = new JdbcTableSink(spark, url, "t6")
    Loader.perform(spark,
      Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.Create), sink)
    Loader.perform(spark,
      Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.Truncate), sink)
    assert(derbyQuery(url, "SELECT count(*) FROM t6")(0)(0) == 3)
    Loader.perform(spark,
      Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.DeleteAll), sink)
    assert(derbyQuery(url, "SELECT count(*) FROM t6")(0)(0) == 3)
    // as-is appends:
    Loader.perform(spark,
      Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.AsIs), sink)
    assert(derbyQuery(url, "SELECT count(*) FROM t6")(0)(0) == 6)
  }

  test("scenario 7: DB wider than CSV — trailing cols unloaded (ref :157-181)") {
    val url = freshDb()
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE t7 ("a" VARCHAR(20), "b" VARCHAR(20), "c" VARCHAR(20),
        | "d" VARCHAR(20), "e" VARCHAR(20), "extra" VARCHAR(20))""".stripMargin)
    conn.close()
    val res = Loader.perform(spark,
      Loader.LoadConfig(noHeaderCsv, CsvOptions(), TableMode.AsIs),
      new JdbcTableSink(spark, url, "t7"))
    assert(res.alignment.unloadedTarget == Seq("extra"))
    assert(derbyQuery(url, """SELECT "extra" FROM t7""").forall(_(0) == null))
  }

  test("scenario 8: CSV wider than DB — trailing CSV cols dropped (ref :183-205)") {
    val url = freshDb()
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE t8 ("a" VARCHAR(20), "b" VARCHAR(20))""")
    conn.close()
    val res = Loader.perform(spark,
      Loader.LoadConfig(noHeaderCsv, CsvOptions(), TableMode.AsIs),
      new JdbcTableSink(spark, url, "t8"))
    assert(res.alignment.droppedCsv == Seq("col2", "col3", "col4"))
    assert(derbyQuery(url, "SELECT count(*) FROM t8")(0)(0) == 2)
  }

  test("alignment default derives from the CSV shape; explicit override wins") {
    // header=true → ByName without saying so (ref csv2db.go:163-169)
    assert(Loader.LoadConfig("x", CsvOptions(header = true), TableMode.AsIs)
      .resolvedAlignment == Loader.ByName)
    assert(Loader.LoadConfig("x", CsvOptions(), TableMode.AsIs)
      .resolvedAlignment == Loader.ByOrdinal)
    assert(Loader.LoadConfig("x", CsvOptions(header = true), TableMode.AsIs,
      Some(Loader.ByOrdinal)).resolvedAlignment == Loader.ByOrdinal)
  }

  test("scenario 9: by-name alignment with header (ref :207-228)") {
    val url = freshDb()
    val conn = java.sql.DriverManager.getConnection(url)
    // target has different column order + an extra col + misses 'payload'
    conn.createStatement().executeUpdate(
      """CREATE TABLE t9 ("score" INTEGER, "id" BIGINT, "name" VARCHAR(50),
        | "missing" VARCHAR(20))""".stripMargin)
    conn.close()
    val res = Loader.perform(spark,
      Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.AsIs,
        Some(Loader.ByName)),
      new JdbcTableSink(spark, url, "t9"))
    assert(res.alignment.droppedCsv.toSet == Set("payload", "created"))
    assert(res.alignment.unloadedTarget == Seq("missing"))
    val rows = derbyQuery(url, """SELECT "id","score","name" FROM t9 ORDER BY "id"""")
    assert(rows(0) == Seq(1L, 10, "alpha"))
  }

  test("managed-catalog sink: create + truncate + append round-trip") {
    val sink = new ManagedTableSink(spark, "managed_t1")
    try {
      Loader.perform(spark,
        Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.Create), sink)
      assert(spark.table("managed_t1").count() == 3)
      Loader.perform(spark,
        Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.Truncate), sink)
      assert(spark.table("managed_t1").count() == 3)
      Loader.perform(spark,
        Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.AsIs), sink)
      assert(spark.table("managed_t1").count() == 6)
    } finally spark.sql("DROP TABLE IF EXISTS managed_t1")
  }

  test("stdin staging: stream → temp file → load") {
    val in = new java.io.ByteArrayInputStream(
      "1,x\n2,y\n".getBytes("UTF-8"))
    val staged = graft.engine.source.CsvSource.stageStream(in)
    val url = freshDb()
    val res = Loader.perform(spark,
      Loader.LoadConfig(staged.toString, CsvOptions(), TableMode.Create),
      new JdbcTableSink(spark, url, "tstdin"))
    assert(res.rowsLoaded == 2)
  }

  test("custom delimiter + validation (ref config.go:67-72)") {
    val p = csvFile("1;x\n2;y\n")
    val url = freshDb()
    val delim = graft.engine.source.CsvSource.parseDelimiter(";")
    val res = Loader.perform(spark,
      Loader.LoadConfig(p, CsvOptions(delimiter = delim), TableMode.Create),
      new JdbcTableSink(spark, url, "tsemi"))
    assert(res.rowsLoaded == 2)
    assert(derbyQuery(url, """SELECT "col1" FROM tsemi ORDER BY "col0"""")
      .map(_(0)) == Seq("x", "y"))
    intercept[IllegalArgumentException] {
      graft.engine.source.CsvSource.parseDelimiter(";;")
    }
  }

  test("managed create-path keeps empty cells as empty strings (ref parity)") {
    val sink = new ManagedTableSink(spark, "managed_t2")
    try {
      Loader.perform(spark,
        Loader.LoadConfig(headerCsv, CsvOptions(header = true), TableMode.Create), sink)
      // row 2 has an empty score cell; created-table semantics are
      // all-string NOT NULL, so it must load as "", not NULL
      val scores = spark.table("managed_t2").select("score")
        .collect().map(_.getString(0)).toSet
      assert(scores.contains(""))
      assert(!scores.contains(null))
    } finally spark.sql("DROP TABLE IF EXISTS managed_t2")
  }
}
