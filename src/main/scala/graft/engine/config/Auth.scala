package graft.engine.config

import java.net.URI

/** Credential resolution chain (ref `auth.go:15-19`, SURVEY.md §3 E2):
  * URL userinfo → `DB_USERNAME`/`DB_PASSWORD` environment → interactive
  * prompt. First provider that yields BOTH user and password wins; on
  * total failure the connection proceeds credential-less (the reference
  * only warns — `auth.go:24`).
  *
  * The prompt is injected so the chain is testable and usable from
  * drivers where stdin does not exist (Spark executors never prompt).
  */
object Auth {

  final case class Credentials(user: String, password: String)

  type Provider = () => Option[Credentials]

  /** URL userinfo provider (ref `auth.go:38-44`): succeeds iff the URL
    * carries both user and password. */
  def fromUrl(url: String): Provider = () =>
    for {
      info <- Option(
        try new URI(url.stripPrefix("jdbc:")).getUserInfo catch { case _: Exception => null })
      parts = info.split(":", 2)
      if parts.length == 2 && parts(0).nonEmpty
    } yield Credentials(parts(0), parts(1))

  /** Environment provider (ref `auth.go:78-105`): succeeds iff both
    * variables resolve. */
  def fromEnv(env: Map[String, String] = sys.env): Provider = () =>
    for {
      u <- env.get("DB_USERNAME")
      p <- env.get("DB_PASSWORD")
    } yield Credentials(u, p)

  /** Interactive provider (ref `auth.go:46-76`) — last resort. */
  def fromPrompt(ask: String => String): Provider = () => {
    val u = ask("username")
    val p = ask("password")
    if (u.nonEmpty) Some(Credentials(u, p)) else None
  }

  /** Ordered chain, first success wins (ref `auth.go:111-118`). */
  def resolve(providers: Seq[Provider]): Option[Credentials] =
    providers.view.flatMap(p => p()).headOption

  def resolveDefault(url: String, env: Map[String, String] = sys.env,
      ask: Option[String => String] = None): Option[Credentials] =
    resolve(Seq(fromUrl(url), fromEnv(env)) ++ ask.map(fromPrompt))
}
