package graft.engine

import java.nio.file.Files

import graft.SparkSessionFixture
import graft.engine.config.{Auth, Presets}
import graft.engine.source.{FormatSource, Generator}
import org.scalatest.funsuite.AnyFunSuite

/** Auxiliary-surface parity (SURVEY.md §2.13): auth chain, preset
  * store, synthetic generator, multi-format IO. */
class AuxSpec extends AnyFunSuite {
  import SparkSessionFixture.spark

  // --- A1 auth chain ------------------------------------------------------
  test("auth: URL credentials win over env") {
    val got = Auth.resolveDefault("jdbc:postgresql://u:pw@host/db",
      env = Map("DB_USERNAME" -> "eu", "DB_PASSWORD" -> "ep"))
    assert(got.contains(Auth.Credentials("u", "pw")))
  }
  test("auth: env fills when URL has no userinfo; needs BOTH vars") {
    assert(Auth.resolveDefault("jdbc:postgresql://host/db",
      env = Map("DB_USERNAME" -> "eu", "DB_PASSWORD" -> "ep"))
      .contains(Auth.Credentials("eu", "ep")))
    assert(Auth.resolveDefault("jdbc:postgresql://host/db",
      env = Map("DB_USERNAME" -> "eu")).isEmpty)
  }
  test("auth: prompt is last resort and only used when supplied") {
    val got = Auth.resolveDefault("jdbc:postgresql://host/db", env = Map.empty,
      ask = Some(k => if (k == "username") "pu" else "pp"))
    assert(got.contains(Auth.Credentials("pu", "pp")))
  }

  // --- A2 presets ---------------------------------------------------------
  test("presets: save/load round-trip and cli-wins merge incl booleans") {
    val f = Files.createTempFile("graft-presets", ".properties")
    Presets.save(f, "default", Presets.Preset(
      url = Some("jdbc:derby:memory:x"), table = Some("t"),
      header = Some(true), delimiter = Some(";")))
    val loaded = Presets.load(f, "default").get
    assert(loaded.url.contains("jdbc:derby:memory:x") && loaded.header.contains(true))

    val cli = Presets.Preset(table = Some("cli_t"), header = Some(false))
    val merged = Presets.merge(cli, loaded)
    assert(merged.table.contains("cli_t"))     // cli wins
    assert(merged.header.contains(false))      // bool from cli wins
    assert(merged.delimiter.contains(";"))     // preset fills missing
    assert(Presets.load(f, "nope").isEmpty)
    assert(Presets.names(f) == Set("default"))

    // re-saving with a field unset must drop the stale value
    Presets.save(f, "default", Presets.Preset(url = Some("jdbc:derby:memory:y")))
    val resaved = Presets.load(f, "default").get
    assert(resaved.url.contains("jdbc:derby:memory:y"))
    assert(resaved.delimiter.isEmpty && resaved.header.isEmpty)
  }

  // --- S9 generator -------------------------------------------------------
  test("generator: deterministic, rectangular, requested shape") {
    val a = Generator.randomTable(spark, 100, 3, 8)
    assert(a.columns.toSeq == Seq("col0", "col1", "col2"))
    val rows = a.collect()
    assert(rows.length == 100)
    assert(rows.forall(r => (0 until 3).forall(i => r.getString(i).length == 8)))
    // determinism: same seed math → same table
    val b = Generator.randomTable(spark, 100, 3, 8).collect()
    assert(rows.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  // --- A3 progress + SQL function registration ----------------------------
  test("loader reports bytes read via task metrics (ref A3 progress)") {
    val f = Files.createTempFile("graft-prog", ".csv")
    Files.writeString(f, "1,aa\n2,bb\n3,cc\n")
    val res = graft.engine.Loader.perform(spark,
      graft.engine.Loader.LoadConfig(f.toString,
        graft.engine.source.CsvOptions(), graft.engine.sink.TableMode.Create),
      new graft.engine.sink.JdbcTableSink(spark,
        "jdbc:derby:memory:prog1;create=true", "progt"))
    assert(res.rowsLoaded == 3)
    assert(res.bytesRead > 0)
  }

  test("custom expressions register into SQL (extensions surface)") {
    graft.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT go_bool('True') AS b,
        |  array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  array_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |  size(minhash_sig(array(1L, 2L, 3L), 8)) AS m,
        |  simhash64(array(1L, 2L, 3L)) AS sh
        |""".stripMargin).collect()(0)
    assert(r.getBoolean(0))
    assert(r.getDouble(1) == 11.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-15)
    assert(r.getInt(3) == 8)
  }

  // --- multi-format IO ----------------------------------------------------
  test("format round-trip: parquet/orc/json/csv read back equal") {
    val df = Generator.randomTable(spark, 50, 2, 6)
    val base = Files.createTempDirectory("graft-fmt").toString
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      FormatSource.write(df, fmt, s"$base/$fmt",
        options = if (fmt == "csv") Map("header" -> "true") else Map.empty)
      val back = FormatSource.read(spark, fmt, s"$base/$fmt",
        schema = if (fmt == "csv" || fmt == "json") Some(df.schema) else None,
        options = if (fmt == "csv") Map("header" -> "true") else Map.empty)
      assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet,
        s"format $fmt mismatch")
    }
  }

  // --- plan digest --------------------------------------------------------
  test("PlanDigest.normalize strips per-run ids but keeps structure") {
    val runA = "HashAggregate [sum#123L] plan_id=45\n" +
      "  Scan parquet file:/tmp/graft_a1/part-0.parquet [doc_id#7]"
    val runB = "HashAggregate [sum#991L] plan_id=2\n" +
      "  Scan parquet file:/tmp/graft_b9/part-0.parquet [doc_id#55]"
    assert(graft.PlanDigest.digest(runA) == graft.PlanDigest.digest(runB))
    val different = runA.replace("HashAggregate", "SortAggregate")
    assert(graft.PlanDigest.digest(runA) != graft.PlanDigest.digest(different))
  }
}
