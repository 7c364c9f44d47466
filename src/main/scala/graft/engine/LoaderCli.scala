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

  def parseArgs(args: Seq[String]): CliArgs = {
    def bad(msg: String) = throw new IllegalArgumentException(msg)
    @annotation.tailrec
    def go(rest: List[String], acc: CliArgs): CliArgs = rest match {
      case Nil => acc
      // boolean flag, no value (ref `cli.BoolFlag`)
      case ("--has-header" | "-hh") :: t => go(t, acc.copy(header = Some(true)))
      case flag :: value :: t =>
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

  def main(args: Array[String]): Unit = {
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
      case e: IllegalArgumentException =>
        System.err.println(s"csv2db: ${e.getMessage}")
        sys.exit(2)
    } finally spark.stop()
  }
}
