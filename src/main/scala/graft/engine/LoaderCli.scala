package graft.engine

import java.nio.file.{Path, Paths}

import graft.engine.config.{Auth, Presets}
import graft.engine.sink.{JdbcTableSink, ManagedTableSink, TableMode, TableSink}
import graft.engine.source.{CsvOptions, CsvSource}
import org.apache.spark.sql.SparkSession

/** The `csv2db`-shaped argv entry point (ref `main.go:23-57`,
  * SURVEY.md §7.5 gap 4) — a thin shell over the API-first engine:
  * argv → [[Presets]] overlay (A2) → [[Loader.LoadConfig]] +
  * [[graft.engine.sink.TableSink]] (A4/A5) → [[Loader.perform]] (E1),
  * with credentials resolved through the [[Auth]] chain (A1/E2).
  *
  * Flag surface mirrors the reference flag-for-flag (long and short
  * aliases from `main.go:10-19`); two documented deltas:
  *
  *  - `--url` takes a JDBC url (`jdbc:...`) — the reference's dburl
  *    forms (`postgres://...`) need drivers this sandbox cannot hold
  *    (SURVEY §7.5 gap 2). OMITTING `--url` targets the Spark session
  *    catalog as a managed table instead — the Spark-native deployment
  *    the reference has no equivalent of.
  *  - `--log-level` maps to `SparkContext.setLogLevel` levels rather
  *    than logrus levels.
  *
  * A dotted `--table` value resolves schema-qualified exactly like the
  * reference (`load_config.go:22-27`: first part = schema, last part =
  * table): [[graft.engine.sink.JdbcTableSink]] filters its JDBC metadata
  * lookups by both parts; the managed sink maps schema → catalog
  * database.
  *
  * Parsing is hand-rolled (zero new dependencies) and PURE —
  * [[LoaderCli.parseArgs]] / [[LoaderCli.resolveConfig]] return data,
  * so AuxSpec exercises the full surface without a process boundary;
  * `main` only adds the session, the sink, and exit codes. */
object LoaderCli {

  /** argv image: every field optional so the preset overlay can fill
    * it (the reference's `FillMissingFromPreset`). */
  final case class CliArgs(
      url: Option[String] = None,
      table: Option[String] = None,
      mode: Option[String] = None,
      input: Option[String] = None,
      header: Option[Boolean] = None,
      delimiter: Option[String] = None,
      encoding: Option[String] = None,
      preset: Option[String] = None,
      storePreset: Option[String] = None,
      logLevel: Option[String] = None)

  /** The effective run after the preset overlay: what to load, how,
    * and into which table. */
  final case class Resolved(
      url: Option[String],
      table: String,
      cfg: Loader.LoadConfig)

  /** `--help` text (ref: urfave/cli auto-generates one from the flag
    * table, `main.go:10-19`). Kept in one place so the spec can assert
    * every flag is documented. */
  val helpText: String =
    """usage: csv2db [flags]
      |
      |Load a CSV file into a database table.
      |
      |  -t,  --table NAME        target table (schema.table resolves schema-qualified); required
      |  -i,  --input-file PATH   CSV file to load, or -- for stdin; required
      |       --url JDBC_URL      jdbc: url; omit to target the session catalog
      |  -m,  --table-mode MODE   create | drop-and-create | truncate | delete-all | as-is
      |  -hh, --has-header        first row is a header
      |  -d,  --delimiter CHAR    field delimiter (single char; default ,)
      |  -e,  --encoding CHARSET  input charset (default UTF-8)
      |  -p,  --preset NAME       load missing flags from a stored preset
      |  -s,  --store-preset NAME store the merged config under NAME
      |  -l,  --log-level LEVEL   spark log level (ERROR|WARN|INFO|DEBUG)
      |  -h,  --help              show this help
      |""".stripMargin

  /** Raised by `--help`; `main` prints [[helpText]] and exits 0. */
  final class HelpRequested extends RuntimeException("help")

  def parseArgs(args: Seq[String]): CliArgs = {
    def bad(msg: String) = throw new IllegalArgumentException(msg)
    @annotation.tailrec
    def go(rest: List[String], acc: CliArgs): CliArgs = rest match {
      case Nil => acc
      // boolean flag, no value (ref `cli.BoolFlag`)
      case ("--has-header" | "-hh") :: t => go(t, acc.copy(header = Some(true)))
      case ("--help" | "-h") :: _ => throw new HelpRequested
      case flag :: value :: t =>
        // A '-'-prefixed "value" is a following flag, i.e. the value is
        // missing — fail loudly instead of swallowing the next flag
        // (urfave/cli does the same). One carve-out: the literal `--`
        // stdin sentinel for --input-file (S2).
        if (value.startsWith("-") &&
            !(value == "--" && (flag == "--input-file" || flag == "-i")))
          bad(s"flag $flag needs a value")
        flag match {
          case "--url"                  => go(t, acc.copy(url = Some(value)))
          case "--table" | "-t"         => go(t, acc.copy(table = Some(value)))
          case "--table-mode" | "-m"    => go(t, acc.copy(mode = Some(value)))
          case "--input-file" | "-i"    => go(t, acc.copy(input = Some(value)))
          case "--delimiter" | "-d"     => go(t, acc.copy(delimiter = Some(value)))
          case "--encoding" | "-e"      => go(t, acc.copy(encoding = Some(value)))
          case "--preset" | "-p"        => go(t, acc.copy(preset = Some(value)))
          case "--store-preset" | "-s"  => go(t, acc.copy(storePreset = Some(value)))
          case "--log-level" | "-l"     => go(t, acc.copy(logLevel = Some(value)))
          case other                    => bad(s"unknown flag: $other")
        }
      case lone :: _ => bad(s"flag $lone needs a value")
    }
    go(args.toList, CliArgs())
  }

  /** Default preset store — the reference keeps a dotfile under $HOME
    * (`config.go:119-133`); overridable for tests and CI. */
  def defaultPresetPath: Path = Paths.get(
    sys.env.getOrElse("GRAFT_PRESETS",
      sys.props("user.home") + "/.graft-presets.properties"))

  /** Preset overlay + validation: CLI args win field-wise, the named
    * preset fills gaps (ref `load_config.go:9-19`), `--store-preset`
    * persists the MERGED config (ref `setPreset` stores the filled
    * config, not the raw argv). Input `--` stages stdin (S2). */
  def resolveConfig(cli: CliArgs, presetPath: Path,
      stdin: () => java.io.InputStream = () => System.in): Resolved = {
    val asPreset = Presets.Preset(cli.url, cli.table, cli.mode,
      cli.delimiter, cli.header, cli.encoding)
    val loaded = Presets.load(presetPath, cli.preset.getOrElse("default"))
      .getOrElse(Presets.Preset())
    val merged = Presets.merge(asPreset, loaded)
    cli.storePreset.foreach(name => Presets.save(presetPath, name, merged))

    val table = merged.table.getOrElse(
      throw new IllegalArgumentException("--table is required"))
    val input = cli.input.getOrElse(
      throw new IllegalArgumentException("--input-file is required"))
    val path =
      if (input == "--") CsvSource.stageStream(stdin()).toString else input
    val csv = CsvOptions(
      delimiter = CsvSource.parseDelimiter(merged.delimiter.getOrElse(",")),
      header = merged.header.getOrElse(false),
      encoding = merged.encoding.getOrElse("UTF-8"))
    Resolved(merged.url, table,
      Loader.LoadConfig(path, csv, TableMode.parse(merged.mode.getOrElse(""))))
  }

  /** Sink selection (A5): a `jdbc:` url runs the JDBC sink with the
    * A1 credential chain; no url targets the session catalog. */
  def sinkFor(spark: SparkSession, r: Resolved): TableSink = r.url match {
    case Some(u) if u.startsWith("jdbc:") =>
      val creds = Auth.resolveDefault(u)
      new JdbcTableSink(spark, u, r.table,
        user = creds.map(_.user), password = creds.map(_.password))
    case Some(u) => throw new IllegalArgumentException(
      s"--url must be a jdbc: url (got '$u'); omit it for a managed table")
    case None => new ManagedTableSink(spark, r.table)
  }

  /** Everything but the exit code — testable end-to-end. */
  def run(args: Seq[String], spark: SparkSession,
      presetPath: Path = defaultPresetPath): Loader.LoadResult = {
    val cli = parseArgs(args)
    cli.logLevel.foreach(l => spark.sparkContext.setLogLevel(l.toUpperCase))
    val resolved = resolveConfig(cli, presetPath)
    Loader.perform(spark, resolved.cfg, sinkFor(spark, resolved))
  }

  /** One-line message for a load-time failure: the root cause of a
    * SparkException chain (a FAILFAST parse error or a JDBC refusal
    * surfaces as 3–5 nested wrappers), first line only — the reference
    * `log.Fatalf`s the error and exits 1 (`csv2db.go:84-86`), it never
    * prints a stack trace. */
  def rootMessage(e: Throwable): String = {
    var cur = e
    var depth = 0
    // depth cap: a cyclic cause chain (a→b→a) must not hang the CLI's
    // error path; 32 levels is far past any real Spark wrapper stack
    while (cur.getCause != null && (cur.getCause ne cur) && depth < 32) {
      cur = cur.getCause; depth += 1
    }
    val msg = Option(cur.getMessage).getOrElse(cur.getClass.getSimpleName)
    msg.linesIterator.nextOption().getOrElse(msg)
  }

  /** `main`'s failure policy as data, so the spec can assert exit codes
    * without a process boundary: usage errors → 2, load-time failures
    * → 1 with the one-line root cause (ref `log.Fatalf` = exit 1,
    * `csv2db.go:84-86` — never a stack trace). */
  def classify(e: Throwable): (Int, String) = e match {
    case iae: IllegalArgumentException => (2, s"csv2db: ${iae.getMessage}")
    case other                         => (1, s"csv2db: ${rootMessage(other)}")
  }

  def main(args: Array[String]): Unit = {
    // --help short-circuits before a session is built (parse is pure)
    try parseArgs(args.toSeq)
    catch {
      case _: HelpRequested => println(helpText); return
      case e: IllegalArgumentException =>
        System.err.println(s"csv2db: ${e.getMessage}"); sys.exit(2)
    }
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val res = run(args.toSeq, spark)
      println(s"""{"rows_loaded":${res.rowsLoaded},""" +
        s""""created_table":${res.createdTable}}""")
    } catch {
      case scala.util.control.NonFatal(e) =>
        val (code, msg) = classify(e)
        System.err.println(msg)
        sys.exit(code)
    } finally spark.stop()
  }
}
