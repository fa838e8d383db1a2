package graft.expr

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization (q153) as a native codegen'd expression:
  *
  *   1. Unicode NFC (composes e + U+0301 → é, so byte-identical content
  *      hashes identically downstream — exact dedup (q31) and MinHash
  *      shingles (q34) both key on bytes, and uncomposed crawl text
  *      otherwise defeats them);
  *   2. strip C0 control characters (except \t and \n, which carry
  *      layout) and DEL — the classic crawl-extraction residue;
  *   3. collapse runs of spaces/tabs to a single space;
  *   4. trim leading/trailing spaces (spaces ONLY — matching SQL `trim`
  *      semantics, not Java's `String.trim` which also eats newlines).
  *
  * Why an expression and not a UDF: same hot-path argument as
  * [[ArrayDotProduct]] — this runs once per document on a 100 TB corpus,
  * entirely map-side. As a native expression it stays inside whole-stage
  * codegen with no SerDe boundary and no nondeterminism conservatism; a
  * Scala UDF pays UTF8String→String→UTF8String plus closure dispatch per
  * row and is flagged non-codegen in the plan. (The NFC step itself needs
  * java.text.Normalizer and a JVM String, so the codegen body is a single
  * static call rather than an inlined loop — the win here is the removed
  * UDF plumbing, not ALU.)
  *
  * The DuckDB oracle re-expresses the identical chain as
  * `trim(regexp_replace(regexp_replace(nfc_normalize(s), ctrl, '', 'g'),
  * '[ \t]+', ' ', 'g'))` — two independent NFC + RE2/Java-regex
  * implementations agreeing byte-for-byte on deliberately dirtied input is
  * the differential check.
  */
case class TextNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_text_normalize"

  override def nullSafeEval(input: Any): Any =
    TextNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextNormalize$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TextNormalize = copy(child = newChild)
}

object TextNormalize {
  // C0 controls minus \t (09) and \n (0A), plus DEL (7F). \r is stripped:
  // CRLF normalizes to bare LF, so line hashes agree across platforms.
  private val Ctrl =
    Pattern.compile("[\\x00-\\x08\\x0B-\\x1F\\x7F]")
  private val Runs = Pattern.compile("[ \\t]+")
  private val Edge = Pattern.compile("^ +| +$")

  def normalize(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer
      .normalize(s.toString, java.text.Normalizer.Form.NFC)
    val cleaned = Edge.matcher(
      Runs.matcher(Ctrl.matcher(nfc).replaceAll("")).replaceAll(" "))
      .replaceAll("")
    UTF8String.fromString(cleaned)
  }

  def textNormalize(c: Column): Column =
    ColumnShim.column(TextNormalize(ColumnShim.expression(c)))
}
