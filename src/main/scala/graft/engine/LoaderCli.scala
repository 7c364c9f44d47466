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
      |  -v,  --version           print the version
      |""".stripMargin

  /** Version line (ref: urfave/cli auto-registers `--version, -v` and
    * prints `NAME version VERSION`). */
  val versionText: String = "csv2db (graft) version 0.1.0"

  /** Raised by `--help`; `main` prints [[helpText]] and exits 0. */
  final class HelpRequested extends RuntimeException("help")

  /** Raised by `--version`; `main` prints [[versionText]] and exits 0. */
  final class VersionRequested extends RuntimeException("version")

  /** A pre-session usage error (bad argv, unresolvable config, wrong
    * url scheme) — `main` exits 2 with the message. Distinct from the
    * plain IllegalArgumentExceptions the JVM throws DURING a load
    * (UnsupportedCharsetException from a bad `--encoding` surfaces at
    * read time and subclasses IAE): those take the exit-1 load-failure
    * path, matching the reference's log.Fatalf (`csv2db.go:84-86`). */
  final class UsageError(msg: String) extends IllegalArgumentException(msg)

  /** Every flag the parser knows, for unknown-flag suggestions. */
  private val knownFlags: Seq[String] = Seq(
    "--url", "--table", "-t", "--table-mode", "-m", "--input-file", "-i",
    "--has-header", "-hh", "--delimiter", "-d", "--encoding", "-e",
    "--preset", "-p", "--store-preset", "-s", "--log-level", "-l",
    "--help", "-h", "--version", "-v")

  /** Plain Levenshtein over flag strings — inputs are <20 chars. */
  private def editDistance(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  /** "did you mean --x?" for a near-miss flag (urfave/cli prints the
    * usage text; a targeted suggestion is strictly more helpful and
    * the spec pins it). */
  private def suggest(flag: String): String = {
    val best = knownFlags.minBy(editDistance(flag, _))
    if (editDistance(flag, best) <= 2) s" (did you mean $best?)" else ""
  }

  def parseArgs(args: Seq[String]): CliArgs = {
    def bad(msg: String) = throw new UsageError(msg)
    @annotation.tailrec
    def go(rest: List[String], acc: CliArgs): CliArgs = rest match {
      case Nil => acc
      // boolean flag, no value (ref `cli.BoolFlag`)
      case ("--has-header" | "-hh") :: t => go(t, acc.copy(header = Some(true)))
      case ("--help" | "-h") :: _ => throw new HelpRequested
      case ("--version" | "-v") :: _ => throw new VersionRequested
      case flag :: value :: t =>
        // A '-'-prefixed "value" is almost always a following flag,
        // i.e. the value is missing — fail loudly instead of silently
        // swallowing the next flag. DELIBERATE SAFETY DIVERGENCE from
        // the reference: urfave/cli v1 (Go stdlib flag) consumes the
        // next argument unconditionally as a non-boolean flag's value.
        // Two carve-outs keep the legitimate cases: a lone `-` is a
        // real value (e.g. `--delimiter -`), and the literal `--`
        // stdin sentinel for --input-file (S2).
        if (value.startsWith("-") && value != "-" &&
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
          case other                    => bad(s"unknown flag: $other${suggest(other)}")
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
      stdin: () => java.io.InputStream = () => System.in): Resolved = try {
    val asPreset = Presets.Preset(cli.url, cli.table, cli.mode,
      cli.delimiter, cli.header, cli.encoding)
    val loaded = Presets.load(presetPath, cli.preset.getOrElse("default"))
      .getOrElse(Presets.Preset())
    val merged = Presets.merge(asPreset, loaded)
    cli.storePreset.foreach(name => Presets.save(presetPath, name, merged))

    val table = merged.table.getOrElse(
      throw new UsageError("--table is required"))
    val input = cli.input.getOrElse(
      throw new UsageError("--input-file is required"))
    val path =
      if (input == "--") CsvSource.stageStream(stdin()).toString else input
    val csv = CsvOptions(
      delimiter = CsvSource.parseDelimiter(merged.delimiter.getOrElse(",")),
      header = merged.header.getOrElse(false),
      encoding = merged.encoding.getOrElse("UTF-8"))
    Resolved(merged.url, table,
      Loader.LoadConfig(path, csv, TableMode.parse(merged.mode.getOrElse(""))))
  } catch {
    // everything thrown during RESOLUTION is a usage error (bad
    // delimiter / table-mode validation throws plain IAE from its own
    // module); load-time IAEs never pass through here
    case e: IllegalArgumentException if !e.isInstanceOf[UsageError] =>
      throw new UsageError(e.getMessage)
  }

  /** Sink selection (A5): a `jdbc:` url runs the JDBC sink with the
    * A1 credential chain; no url targets the session catalog. */
  def sinkFor(spark: SparkSession, r: Resolved): TableSink = r.url match {
    case Some(u) if u.startsWith("jdbc:") =>
      val creds = Auth.resolveDefault(u)
      new JdbcTableSink(spark, u, r.table,
        user = creds.map(_.user), password = creds.map(_.password))
    case Some(u) => throw new UsageError(
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
    * `csv2db.go:84-86` — never a stack trace). Only [[UsageError]]
    * (thrown by parse/resolve, pre-session) exits 2 — a plain
    * IllegalArgumentException can be a LOAD failure (the JVM's charset
    * exceptions subclass it) and must take the exit-1 path. */
  def classify(e: Throwable): (Int, String) = e match {
    case ue: UsageError => (2, s"csv2db: ${ue.getMessage}")
    case other          => (1, s"csv2db: ${rootMessage(other)}")
  }

  def main(args: Array[String]): Unit = {
    // --help/--version short-circuit before a session is built (parse
    // is pure)
    try parseArgs(args.toSeq)
    catch {
      case _: HelpRequested => println(helpText); return
      case _: VersionRequested => println(versionText); return
      case e: UsageError =>
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
