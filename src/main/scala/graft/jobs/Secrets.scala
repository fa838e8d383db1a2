package graft.jobs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.Base64

import scala.jdk.CollectionConverters._

/** The three secrets the securing pipeline runs on — the engine twin of the
  * reference's module-level key loading
  * (`/root/reference/ingestion/crypto_utils.py:34-49`).
  *
  * `toString` is redacted so accidental logging (Spark event log, exception
  * messages, `println` of a config case class) never leaks key material —
  * the keys are only ever consumed by [[graft.expr.Crypto]] column builders.
  */
final case class SecretKeys(
    pepper: String, fernetKey: String, blindIndexKey: String) {
  override def toString: String =
    "SecretKeys(pepper=<redacted>, fernetKey=<redacted>, blindIndexKey=<redacted>)"
}

/** Environment-based secret loading with fail-fast — the reference loads
  * `PEPPER` / `FERNET_KEY` / `BLIND_INDEX_KEY` from a `.env` file one
  * directory above the module and raises `KeyError` at import when one is
  * missing (`crypto_utils.py:25-49`, fail-fast at `:34,38,44`). Same
  * contract here, driver-side:
  *
  *   - a `.env` file (if present) is read first, the real process
  *     environment WINS over it — python-dotenv's no-override default;
  *   - a missing variable fails fast with an error naming the variable,
  *     before any Spark work starts;
  *   - malformed key material fails at load, not first use: `FERNET_KEY`
  *     must be urlsafe-base64 of 32 bytes (the reference's
  *     `Fernet(FERNET_KEY)` constructor enforces the same,
  *     `crypto_utils.py:84`), `BLIND_INDEX_KEY` must be valid base64
  *     (the reference's `base64.b64decode` at `:44`).
  *
  * Key values never appear in messages — errors name the VARIABLE only.
  * Production mints keys per README "Security measures" (same recipes as
  * reference `README.md:19-23`); test fixtures pass [[SecretKeys]]
  * literals and never read the environment.
  */
object Secrets {

  val PepperVar = "PEPPER"
  val FernetKeyVar = "FERNET_KEY"
  val BlindIndexKeyVar = "BLIND_INDEX_KEY"

  /** Parse `.env` lines: `KEY=VALUE`, blank lines and `#` comments
    * skipped, optional `export ` prefix. Value semantics mirror
    * python-dotenv (the loader the reference stack uses — divergence
    * silently changes every hash computed from the keys), empirically
    * verified against the library:
    *  - a value STARTING with `'`/`"` is the quoted span up to the
    *    matching close quote — `#` inside is kept verbatim, anything
    *    after the close quote (inline comment) is dropped;
    *  - an unquoted value is cut at the first `#` PRECEDED by
    *    whitespace (`abc # c` → "abc", `a#b #c` → "a#b",
    *    `no#space` → unchanged), then trimmed;
    *  - a `#` at value start is NOT a comment (`KEY= # x` loads
    *    "# x", python-dotenv's behavior — whitespace after `=` is
    *    consumed by its key-value split, not the comment rule).
    */
  private[jobs] def parseDotenv(lines: Seq[String]): Map[String, String] =
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map { l =>
        val stripped = if (l.startsWith("export ")) l.drop(7).trim else l
        val (k, v) = stripped.span(_ != '=')
        val lead = v.drop(1).dropWhile(_.isWhitespace)
        val value =
          if (lead.length >= 2 &&
              (lead.head == '"' || lead.head == '\'') &&
              lead.indexOf(lead.head, 1) > 0)
            lead.substring(1, lead.indexOf(lead.head, 1))
          else {
            val cut = lead.indices.find(i =>
              lead(i) == '#' && i > 0 && lead(i - 1).isWhitespace)
            cut.map(lead.substring(0, _)).getOrElse(lead).trim
          }
        k.trim -> value
      }
      .toMap

  /** Read a `.env` file; a missing file is an empty map (python-dotenv's
    * `load_dotenv` is a silent no-op on a missing file). */
  private[jobs] def loadDotenv(path: Path): Map[String, String] =
    if (Files.isRegularFile(path))
      parseDotenv(Files.readAllLines(path, StandardCharsets.UTF_8).asScala.toSeq)
    else Map.empty

  private def required(merged: Map[String, String], name: String): String =
    merged.getOrElse(name, throw new IllegalStateException(
      s"missing required secret: $name is not set in the environment or .env " +
        "(see README 'Security measures' for how to generate it)"))

  /** Load and validate the three secrets. `env` defaults to the real
    * process environment; `dotenv`, when given, is read first and
    * overridden by `env` entries.
    */
  def fromEnv(env: Map[String, String] = sys.env,
      dotenv: Option[Path] = None): SecretKeys = {
    val merged = dotenv.map(loadDotenv).getOrElse(Map.empty) ++ env
    val pepper = required(merged, PepperVar)
    val fernetKey = required(merged, FernetKeyVar)
    val bidxKey = required(merged, BlindIndexKeyVar)

    val fernetRaw =
      try Base64.getUrlDecoder.decode(fernetKey)
      catch {
        case _: IllegalArgumentException => throw new IllegalStateException(
          s"$FernetKeyVar is not valid urlsafe base64")
      }
    if (fernetRaw.length != 32) throw new IllegalStateException(
      s"$FernetKeyVar must decode to 32 bytes (got ${fernetRaw.length})")

    try Base64.getDecoder.decode(bidxKey)
    catch {
      case _: IllegalArgumentException => throw new IllegalStateException(
        s"$BlindIndexKeyVar is not valid base64")
    }

    SecretKeys(pepper, fernetKey, bidxKey)
  }
}
