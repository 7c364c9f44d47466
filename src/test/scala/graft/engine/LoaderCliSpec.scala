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

  test("parseArgs: a '-'-prefixed value means the value is missing — " +
      "fail loudly, don't swallow the next flag") {
    val e = intercept[IllegalArgumentException] {
      LoaderCli.parseArgs(Seq("-t", "-hh", "file.csv"))
    }
    assert(e.getMessage.contains("needs a value"))
    // carve-out 1: the literal stdin sentinel for --input-file
    assert(LoaderCli.parseArgs(Seq("-t", "x", "-i", "--"))
      .input.contains("--"))
    // but '--' is NOT a value for any other flag
    intercept[IllegalArgumentException] {
      LoaderCli.parseArgs(Seq("-d", "--"))
    }
    // carve-out 2: a lone '-' is a real value (a legitimate single-char
    // delimiter; urfave/cli would accept it too since it consumes the
    // next argument unconditionally)
    assert(LoaderCli.parseArgs(Seq("-t", "x", "-i", "y", "-d", "-"))
      .delimiter.contains("-"))
  }

  test("--version raises VersionRequested; unknown flags get a " +
      "did-you-mean suggestion") {
    intercept[LoaderCli.VersionRequested] {
      LoaderCli.parseArgs(Seq("--version"))
    }
    intercept[LoaderCli.VersionRequested] {
      LoaderCli.parseArgs(Seq("-t", "x", "-v"))
    }
    assert(LoaderCli.versionText.contains("csv2db") &&
      LoaderCli.versionText.contains("0.1.0"))
    assert(LoaderCli.helpText.contains("--version"))
    val near = intercept[IllegalArgumentException] {
      LoaderCli.parseArgs(Seq("--tabel", "x"))
    }
    assert(near.getMessage.contains("did you mean --table?"),
      s"no suggestion in: ${near.getMessage}")
    // a far miss gets no bogus suggestion
    val far = intercept[IllegalArgumentException] {
      LoaderCli.parseArgs(Seq("--frobnicate-widget", "x"))
    }
    assert(!far.getMessage.contains("did you mean"),
      s"spurious suggestion in: ${far.getMessage}")
  }

  test("--help raises HelpRequested; helpText documents every flag") {
    intercept[LoaderCli.HelpRequested] { LoaderCli.parseArgs(Seq("--help")) }
    intercept[LoaderCli.HelpRequested] {
      LoaderCli.parseArgs(Seq("-t", "x", "-h"))
    }
    for (f <- Seq("--table", "--input-file", "--url", "--table-mode",
        "--has-header", "--delimiter", "--encoding", "--preset",
        "--store-preset", "--log-level", "--help"))
      assert(LoaderCli.helpText.contains(f), s"helpText missing $f")
  }

  test("classify: usage errors exit 2, load-time failures exit 1 with " +
      "the one-line root cause — never a stack trace (ref log.Fatalf)") {
    // usage error → 2
    val (c2, m2) = LoaderCli.classify(
      intercept[IllegalArgumentException] {
        LoaderCli.resolveConfig(LoaderCli.parseArgs(Seq("-i", "x")),
          Files.createTempFile("graft-cli-p4", ".properties"))
      })
    assert(c2 == 2 && m2.startsWith("csv2db:") && m2.contains("--table"))

    // malformed CSV under FAILFAST → 1, single line
    val bad = Files.createTempFile("graft-cli-bad", ".csv")
    Files.write(bad, "a,b\n\"unclosed,2\n".getBytes("UTF-8"))
    val presets = Files.createTempFile("graft-cli-p5", ".properties")
    val eCsv = intercept[Throwable] {
      LoaderCli.run(Seq("-t", "cli_failfast_t", "-m", "create",
        "-i", bad.toString, "-hh"), spark, presets)
    }
    val (c1, m1) = LoaderCli.classify(eCsv)
    assert(c1 == 1, s"expected exit 1, got $c1 for $eCsv")
    assert(m1.startsWith("csv2db:") && !m1.contains("\n") &&
      !m1.contains("\tat "), s"not a one-liner: $m1")
    spark.sql("DROP TABLE IF EXISTS cli_failfast_t")

    // bogus JDBC url → 1, single line
    val ok = Files.createTempFile("graft-cli-ok", ".csv")
    Files.write(ok, "a,b\n1,2\n".getBytes("UTF-8"))
    val eJdbc = intercept[Throwable] {
      LoaderCli.run(Seq("--url", "jdbc:nosuchdb://nowhere/db",
        "-t", "t", "-m", "create", "-i", ok.toString, "-hh"),
        spark, presets)
    }
    val (cj, mj) = LoaderCli.classify(eJdbc)
    assert(cj == 1 && mj.startsWith("csv2db:") && !mj.contains("\n"))

    // a cyclic cause chain must not hang the error path
    val a = new RuntimeException("outer")
    val b = new RuntimeException("inner", a)
    a.initCause(b)
    assert(LoaderCli.rootMessage(a).nonEmpty)

    // a bad --encoding surfaces DURING the read as a charset exception
    // that subclasses IllegalArgumentException — it is a LOAD failure
    // (exit 1, ref log.Fatalf), not a usage error: only UsageError from
    // parse/resolve takes the exit-2 path
    val okCsv = Files.createTempFile("graft-cli-enc", ".csv")
    Files.write(okCsv, "a,b\n1,2\n".getBytes("UTF-8"))
    val eEnc = intercept[Throwable] {
      LoaderCli.run(Seq("-t", "cli_enc_t", "-m", "create",
        "-i", okCsv.toString, "-hh", "-e", "NO-SUCH-CHARSET"),
        spark, presets)
    }
    val (ce, me) = LoaderCli.classify(eEnc)
    assert(ce == 1, s"bad charset must exit 1 (load failure), got $ce " +
      s"for $eEnc")
    assert(me.startsWith("csv2db:") && !me.contains("\n"))
    spark.sql("DROP TABLE IF EXISTS cli_enc_t")
  }

  test("dotted --table resolves schema-qualified (ref load_config.go:" +
      "22-27): JDBC metadata lookups filter by both parts") {
    val url = "jdbc:derby:memory:cliDotted;create=true"
    val sink = new graft.engine.sink.JdbcTableSink(spark, url, "APP.dotted_t")
    assert(!sink.exists())
    sink.createAllString(Seq("x", "y"))
    assert(sink.exists(), "dotted-name exists() must match via " +
      "(schema, table) metadata filters")
    assert(sink.schema().fieldNames.toSeq == Seq("x", "y"))
    // the same physical table is visible through the unqualified name
    // (APP is Derby's default schema) — proves the split didn't fork
    // the identity
    val plain = new graft.engine.sink.JdbcTableSink(spark, url, "dotted_t")
    assert(plain.exists())
    sink.drop()
    assert(!sink.exists() && !plain.exists())
  }

  test("exists()/schema() escape LIKE wildcards: my_t must not match " +
      "a table named myXt (JDBC metadata args are patterns)") {
    val url = "jdbc:derby:memory:cliLike;create=true"
    val other = new graft.engine.sink.JdbcTableSink(spark, url, "myXt")
    other.createAllString(Seq("a"))
    val underscored = new graft.engine.sink.JdbcTableSink(spark, url, "my_t")
    assert(!underscored.exists(),
      "unescaped '_' in the name pattern matched a different table")
    // schema() must not leak the other table's columns either — for a
    // missing table it throws (same as any not-found table)
    intercept[IllegalArgumentException] { underscored.schema() }
    underscored.createAllString(Seq("b", "c"))
    assert(underscored.exists() &&
      underscored.schema().fieldNames.toSeq == Seq("b", "c"))
    underscored.drop(); other.drop()
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
