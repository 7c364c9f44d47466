package graft.engine

import java.nio.file.Files

import graft.SparkSessionFixture
import org.scalatest.funsuite.AnyFunSuite

/** The argv shell (ref `main.go:23-57`): flag surface, preset overlay
  * precedence, stdin staging, sink selection, and one end-to-end load
  * through Loader.perform — the E1 pipeline driven exactly the way the
  * reference binary drives it. */
class LoaderCliSpec extends AnyFunSuite {
  import SparkSessionFixture.spark

  test("parseArgs covers the reference flag surface, long and short") {
    val a = LoaderCli.parseArgs(Seq(
      "--url", "jdbc:derby:memory:cli", "-t", "people", "-m", "create",
      "-i", "/tmp/in.csv", "-hh", "-d", ";", "-e", "ISO-8859-1",
      "-p", "prod", "-s", "saved", "-l", "warn"))
    assert(a == LoaderCli.CliArgs(Some("jdbc:derby:memory:cli"),
      Some("people"), Some("create"), Some("/tmp/in.csv"), Some(true),
      Some(";"), Some("ISO-8859-1"), Some("prod"), Some("saved"),
      Some("warn")))
  }

  test("parseArgs rejects unknown flags and missing values") {
    intercept[IllegalArgumentException] {
      LoaderCli.parseArgs(Seq("--bogus", "x"))
    }
    intercept[IllegalArgumentException] {
      LoaderCli.parseArgs(Seq("--table"))
    }
  }

  test("resolveConfig: preset fills gaps, cli wins, store persists " +
      "the MERGED config; validation mirrors the reference (A4)") {
    val presets = Files.createTempFile("graft-cli-presets", ".properties")
    graft.engine.config.Presets.save(presets, "prod",
      graft.engine.config.Presets.Preset(table = Some("preset_table"),
        delimiter = Some(";"), header = Some(true)))
    // cli sets table (wins) but inherits delimiter+header from preset
    val r = LoaderCli.resolveConfig(
      LoaderCli.parseArgs(Seq("-t", "cli_table", "-i", "/tmp/x.csv",
        "-p", "prod", "-s", "combo")),
      presets)
    assert(r.table == "cli_table")
    assert(r.cfg.csv.delimiter == ';' && r.cfg.csv.header)
    // the stored preset is the merged view (ref setPreset semantics)
    val stored = graft.engine.config.Presets.load(presets, "combo").get
    assert(stored.table.contains("cli_table") &&
      stored.delimiter.contains(";"))
    // required-field + single-char-delimiter validation
    intercept[IllegalArgumentException] {
      LoaderCli.resolveConfig(
        LoaderCli.parseArgs(Seq("-i", "/tmp/x.csv")), presets)
    }
    intercept[IllegalArgumentException] {
      LoaderCli.resolveConfig(
        LoaderCli.parseArgs(Seq("-t", "t", "-i", "x", "-d", ";;")), presets)
    }
  }

  test("resolveConfig: '-i --' stages stdin to a scannable file (S2)") {
    val presets = Files.createTempFile("graft-cli-presets2", ".properties")
    val r = LoaderCli.resolveConfig(
      LoaderCli.parseArgs(Seq("-t", "t", "-i", "--")),
      presets,
      stdin = () => new java.io.ByteArrayInputStream(
        "a,b\n1,2\n".getBytes("UTF-8")))
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(r.cfg.path)), "UTF-8") == "a,b\n1,2\n")
  }

  test("sinkFor: jdbc url → JDBC sink, no url → managed catalog, " +
      "anything else refused") {
    val rJdbc = LoaderCli.Resolved(Some("jdbc:derby:memory:cliSink;create=true"),
      "t", Loader.LoadConfig("/tmp/x.csv"))
    assert(LoaderCli.sinkFor(spark, rJdbc)
      .isInstanceOf[graft.engine.sink.JdbcTableSink])
    val rManaged = rJdbc.copy(url = None)
    assert(LoaderCli.sinkFor(spark, rManaged)
      .isInstanceOf[graft.engine.sink.ManagedTableSink])
    intercept[IllegalArgumentException] {
      LoaderCli.sinkFor(spark, rJdbc.copy(url = Some("postgres://h/db")))
    }
  }

  test("end-to-end: argv → preset overlay → create-mode load into the " +
      "managed catalog, exactly like the reference binary run") {
    val csv = Files.createTempFile("graft-cli-in", ".csv")
    Files.write(csv, "name;age\nida;34\njo;\n".getBytes("UTF-8"))
    val presets = Files.createTempFile("graft-cli-presets3", ".properties")
    val res = LoaderCli.run(Seq(
      "-t", "cli_e2e_people", "-m", "create", "-i", csv.toString,
      "-hh", "-d", ";"), spark, presets)
    assert(res.rowsLoaded == 2 && res.createdTable)
    val rows = spark.table("cli_e2e_people")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    // created tables are all-string and keep empty cells as "" (F8:
    // the ""→NULL rule is nullability-keyed; see ManagedTableSink)
    assert(rows.toSeq == Seq(("ida", "34"), ("jo", "")))
    spark.sql("DROP TABLE IF EXISTS cli_e2e_people")
  }
}
