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
    *  - a value STARTING with `'`/`"` is the quoted span up to the first
    *    UNESCAPED close quote (`"a\"b"` loads `a"b`, not `a\`) — `#`
    *    inside is kept verbatim, anything after the close quote (inline
    *    comment) is dropped; the span may continue across LINES
    *    (multiline values, joined with `\n`);
    *  - backslash escapes decode per quote style: `\\` and `\'` in both,
    *    plus `\"` `\a` `\b` `\f` `\n` `\r` `\t` `\v` in DOUBLE quotes
    *    only; unknown sequences (`\x`…) stay literal — python-dotenv's
    *    `_double_quote_escapes`/`_single_quote_escapes` exactly;
    *  - a quoted value with NO close quote is DROPPED, python-dotenv's
    *    "could not parse statement" path — a required secret lost this
    *    way still fails fast, by name, in [[fromEnv]];
    *  - an unquoted value is cut at the first `#` PRECEDED by
    *    whitespace (`abc # c` → "abc", `a#b #c` → "a#b",
    *    `no#space` → unchanged), then trimmed;
    *  - a `#` at value start is NOT a comment (`KEY= # x` loads
    *    "# x", python-dotenv's behavior — whitespace after `=` is
    *    consumed by its key-value split, not the comment rule).
    */
  private[jobs] def parseDotenv(lines: Seq[String]): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    while (i < lines.length) {
      val l = lines(i).trim
      if (l.nonEmpty && !l.startsWith("#") && l.contains('=')) {
        val stripped = if (l.startsWith("export ")) l.drop(7).trim else l
        val (k, v) = stripped.span(_ != '=')
        var lead = v.drop(1).dropWhile(_.isWhitespace)
        if (lead.nonEmpty && (lead.head == '"' || lead.head == '\'')) {
          val q = lead.head
          var close = findUnescaped(lead, q)
          // multiline quoted value: keep consuming RAW lines (python-dotenv
          // matches the span with DOTALL — inner lines are not trimmed)
          var consumed = i
          while (close < 0 && consumed + 1 < lines.length) {
            consumed += 1
            lead = lead + "\n" + lines(consumed)
            close = findUnescaped(lead, q)
          }
          if (close >= 0) {
            out(k.trim) = decodeEscapes(lead.substring(1, close), q)
            i = consumed
          }
          // else: unterminated — binding dropped (parity), scan resumes
          // at the next line
        } else {
          val cut = lead.indices.find(j =>
            lead(j) == '#' && j > 0 && lead(j - 1).isWhitespace)
          out(k.trim) = cut.map(lead.substring(0, _)).getOrElse(lead).trim
        }
      }
      i += 1
    }
    out.toMap
  }

  // python-dotenv's quoted-value spans verbatim: `'((?:\\'|[^'])*)'` /
  // `"((?:\\"|[^"])*)"`. Only backslash-QUOTE is a pair inside the span
  // (`[^q]` matches a lone backslash), and greedy-with-backtracking
  // semantics matter for backslash runs before the close quote — a hand
  // scan that skips backslash-anything parses `"a\\"` differently. A
  // negated class matches `\n` too, so the multiline accumulation needs
  // no DOTALL.
  private val SingleQuotedSpan =
    java.util.regex.Pattern.compile("'((?:\\\\'|[^'])*)'")
  private val DoubleQuotedSpan =
    java.util.regex.Pattern.compile("\"((?:\\\\\"|[^\"])*)\"")

  /** Index of the quote closing the span that starts at index 0, or -1 if
    * the span doesn't close within `s` (caller accumulates more lines). */
  private def findUnescaped(s: String, q: Char): Int = {
    val m = (if (q == '\'') SingleQuotedSpan else DoubleQuotedSpan).matcher(s)
    if (m.lookingAt()) m.end(1) else -1
  }

  /** python-dotenv's escape decoding: `\\` and `\'` in both quote styles,
    * the full C-style set only in double quotes, unknown pairs literal. */
  private def decodeEscapes(s: String, q: Char): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\\' && i + 1 < s.length) {
        val n = s(i + 1)
        val decoded: Option[Char] = n match {
          case '\\' => Some('\\')
          case '\'' => Some('\'')
          case '"' if q == '"' => Some('"')
          case 'a' if q == '"' => Some('\u0007')
          case 'b' if q == '"' => Some('\b')
          case 'f' if q == '"' => Some('\f')
          case 'n' if q == '"' => Some('\n')
          case 'r' if q == '"' => Some('\r')
          case 't' if q == '"' => Some('\t')
          case 'v' if q == '"' => Some('\u000B')
          case _ => None
        }
        decoded match {
          case Some(d) => sb.append(d); i += 2
          case None    => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

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
