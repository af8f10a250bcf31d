package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization — the standard pre-dedup normalize pass: two
  * documents that differ only in composed-vs-decomposed accents
  * (U+00E9 vs e + U+0301), letter case, or whitespace runs are the SAME
  * training document, and every fingerprint/MinHash/suffix operator
  * downstream inherits that equality only if the text is canonicalized
  * first (the C4/CCNet pipelines normalize before dedup for exactly this
  * reason).
  *
  * The chain, applied in this order in BOTH engines:
  *
  *   1. NFC — canonical composition (`java.text.Normalizer`; oracle:
  *      DuckDB `nfc_normalize`).
  *   2. Lowercase, per-codepoint SIMPLE mapping (`Character.toLowerCase`)
  *      — deliberately NOT `String.toLowerCase`, whose full mappings are
  *      context-sensitive (final sigma) and one-to-many (U+0130 → "i̇"),
  *      while DuckDB's utf8proc `lower` applies the simple map (U+0130 →
  *      "i", Σ → σ in every position). Cross-engine probed on
  *      é/Å(U+212B)/ß/Σ/İ/Cyrillic/ligatures; TextNormSpec carries the
  *      gate.
  *   3. ASCII whitespace collapse + trim — runs of space/tab/CR/LF
  *      become one space, leading/trailing runs drop (oracle:
  *      `trim(regexp_replace(..., '[ \t\n\r]+', ' ', 'g'), ' ')`).
  *      Restricted to the explicit 4-char class: Java's `\s` and RE2's
  *      `\s` disagree on U+000B, and Unicode space classes disagree more.
  *
  * Scale shape: stateless narrow per-row kernel — no shuffle, stays in
  * WholeStageCodegen via a single static call (the PolyHash pattern).
  */
object TextNorm {

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r'

  def normalize(s: UTF8String): UTF8String = {
    val nfc =
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var started      = false
    var i            = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      if (isWs(cp)) pendingSpace = true
      else {
        if (pendingSpace && started) sb.append(' ')
        pendingSpace = false
        started = true
        sb.appendCodePoint(Character.toLowerCase(cp))
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** The DuckDB mirror of [[normalize]] over a SQL expression. */
  def normalizeSql(e: String): String =
    s"trim(regexp_replace(lower(nfc_normalize($e)), '[ \t\n\r]+', ' ', 'g'), ' ')"
}

/** normalize_text(string) → string. Codegen: one static call (WSCG-safe). */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object TextNormExprs {
  def normalize_text(s: Column): Column =
    GraftSqlBridge.column(NormalizeText(GraftSqlBridge.expression(s)))
}
