package graft.engine.config

import java.nio.file.{Files, Path}
import java.util.Properties
import scala.jdk.CollectionConverters._

/** Preset store (ref `config.go:100-165`, `load_config.go`, SURVEY.md
  * §2.13 A2): named configuration overlays persisted to a dotfile.
  * CLI-provided values always win; preset values only fill fields the
  * caller left unset.
  *
  * The reference merges only string fields (a `reflect.Kind == String`
  * guard at `config.go:92` means booleans are never inherited from a
  * preset — documented bug). Here every field is an `Option`, so the
  * overlay is uniform across types — the quirk is fixed, not ported.
  *
  * Storage is `java.util.Properties` with `<preset>.<key>` entries (no
  * YAML dependency offline); round-trip is lossless for our key set.
  */
object Presets {

  /** The overlay-able subset of a load run. */
  final case class Preset(
      url: Option[String] = None,
      table: Option[String] = None,
      mode: Option[String] = None,
      delimiter: Option[String] = None,
      header: Option[Boolean] = None,
      encoding: Option[String] = None)

  /** preset-fills-missing merge: `cli` wins field-wise. */
  def merge(cli: Preset, preset: Preset): Preset = Preset(
    cli.url.orElse(preset.url),
    cli.table.orElse(preset.table),
    cli.mode.orElse(preset.mode),
    cli.delimiter.orElse(preset.delimiter),
    cli.header.orElse(preset.header),     // bools inherit too (ref bug fixed)
    cli.encoding.orElse(preset.encoding))

  def save(path: Path, name: String, p: Preset): Unit = {
    val props = loadProps(path)
    // clear the preset's previous keys first: an unset (None) field must
    // not resurrect a stale value on the next load
    props.keySet.asScala.map(_.toString).filter(_.startsWith(s"$name."))
      .foreach(props.remove)
    def put(k: String, v: Option[String]): Unit =
      v.foreach(value => props.setProperty(s"$name.$k", value))
    put("url", p.url); put("table", p.table); put("mode", p.mode)
    put("delimiter", p.delimiter); put("header", p.header.map(_.toString))
    put("encoding", p.encoding)
    val out = Files.newOutputStream(path)
    try props.store(out, "graft presets") finally out.close()
  }

  def load(path: Path, name: String): Option[Preset] = {
    val props = loadProps(path)
    def get(k: String): Option[String] = Option(props.getProperty(s"$name.$k"))
    val p = Preset(get("url"), get("table"), get("mode"), get("delimiter"),
      get("header").map(_.toBoolean), get("encoding"))
    if (p == Preset()) None else Some(p)
  }

  def names(path: Path): Set[String] =
    loadProps(path).keySet.asScala.map(_.toString.split('.').head).toSet

  private def loadProps(path: Path): Properties = {
    val props = new Properties()
    if (Files.exists(path)) {
      val in = Files.newInputStream(path)
      try props.load(in) finally in.close()
    }
    props
  }
}
