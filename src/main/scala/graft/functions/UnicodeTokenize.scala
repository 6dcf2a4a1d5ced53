package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval for [[UniTokens]] — also the body the generated code
  * calls.
  *
  * The ASCII tokenizer every oracle-gated text row uses
  * (TextOps.words = `split(text, " ")` after `lower`) is deliberately
  * minimal: single-0x20 splitting renders identically in Spark and
  * DuckDB, which is what makes the gate hashes engine-exact. Real
  * multilingual corpora need more, and this is that variant:
  *
  *  1. NFC normalization (java.text.Normalizer) — NFD "é" (e +
  *     combining acute) and NFC "é" must be the same token;
  *  2. Unicode-aware lowercasing (String.toLowerCase(Locale.ROOT) —
  *     locale-invariant, so no Turkish-I surprises, but full case
  *     mappings: İ→i̇, Σ→σ/ς);
  *  3. splitting on runs of Unicode whitespace — the union of
  *     Character.isWhitespace (tab/newline/U+2028…) and
  *     Character.isSpaceChar (category Zs: NBSP U+00A0, U+2007,
  *     U+202F, ideographic space U+3000 — all invisible to
  *     isWhitespace alone), with empty tokens dropped;
  *  4. optional \p{P} punctuation stripping at token EDGES ("word,"
  *     "«quote»" → word, quote) — interior punctuation (don't,
  *     state-of-the-art) survives; a token that is all punctuation
  *     drops.
  *
  * Everything is one fused JVM pass per row (the WinnowFps pattern).
  * Gate rows keep the ASCII tokenizer — their DuckDB oracles depend on
  * its engine-exact rendering — and SURVEY §2 documents the split;
  * this variant serves the CLI surface (`Main vocab --unicode`) and is
  * pinned by a driver brute-force parity spec instead of a SQL oracle.
  */
object UnicodeTokenizeUtil {
  private def isUniWhitespace(cp: Int): Boolean =
    Character.isWhitespace(cp) || Character.isSpaceChar(cp)

  private def isPunct(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
    t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
    t == Character.INITIAL_QUOTE_PUNCTUATION ||
    t == Character.FINAL_QUOTE_PUNCTUATION || t == Character.OTHER_PUNCTUATION
  }

  def tokens(s: UTF8String, stripPunct: Boolean): ArrayData = {
    val lower = java.text.Normalizer
      .normalize(s.toString, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val out = new java.util.ArrayList[Any]()
    val n = lower.length
    var i = 0
    while (i < n) {
      // skip whitespace run
      while (i < n && isUniWhitespace(lower.codePointAt(i)))
        i += Character.charCount(lower.codePointAt(i))
      var start = i
      while (i < n && !isUniWhitespace(lower.codePointAt(i)))
        i += Character.charCount(lower.codePointAt(i))
      var end = i
      if (stripPunct) {
        while (start < end && isPunct(lower.codePointAt(start)))
          start += Character.charCount(lower.codePointAt(start))
        while (end > start && isPunct(lower.codePointBefore(end)))
          end -= Character.charCount(lower.codePointBefore(end))
      }
      if (end > start)
        out.add(UTF8String.fromString(lower.substring(start, end)))
    }
    new GenericArrayData(out.toArray)
  }
}

/** Codegen'd Unicode-aware tokenizer (SURVEY §2 tokenizer-variant note;
  * see [[UnicodeTokenizeUtil]] for the exact contract). */
case class UniTokens(child: Expression, stripPunct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_uni_tokens"

  override def nullSafeEval(input: Any): Any =
    UnicodeTokenizeUtil.tokens(input.asInstanceOf[UTF8String], stripPunct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeTokenizeUtil.tokens($c, $stripPunct)")

  override protected def withNewChildInternal(newChild: Expression): UniTokens =
    copy(child = newChild)
}

/** Column-API entry point. */
object UnicodeTokenize {
  /** NFC + Unicode-lowercase + Unicode-whitespace tokens of a raw text
    * column; `stripPunct` trims \p{P} at token edges. */
  def uniTokens(c: Column, stripPunct: Boolean = false): Column =
    ColumnBridge.column(UniTokens(ColumnBridge.expression(c), stripPunct))
}
