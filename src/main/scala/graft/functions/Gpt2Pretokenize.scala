package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The EXACT published GPT-2 pre-tokenizer (Radford et al. 2019,
  * encoder.py; the pattern tiktoken's `gpt2` encoding carries verbatim):
  *
  * {{{ 's|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+ }}}
  *
  * c70's gate path deliberately uses the parity-safe ` ?[^ ]+` core
  * because the full pattern's `\s+(?!\S)` needs LOOKAHEAD, which RE2
  * (DuckDB's regex engine, hence the oracle's) does not support — the
  * documented divergence. Java regex DOES support lookahead, so the JVM
  * side can carry the exact pattern as this native expression: lowercase
  * contraction suffixes split off ('s 't 're 've 'm 'll 'd), letter /
  * digit / other-class runs each take at most ONE leading space (the
  * 'Ġword' shape), and whitespace runs split so that the LAST whitespace
  * char attaches to the next pretoken while the rest form their own
  * pretoken (`\s+(?!\S)` = all-but-last of an inner run, or the whole
  * trailing run). Compiled with UNICODE_CHARACTER_CLASS so `\s` matches
  * Unicode White_Space (NBSP, U+2028, …) exactly as Python's `regex`
  * module does in the reference implementation. The tiling is lossless:
  * pretokens concatenate back to the input byte-for-byte
  * (spec-asserted), so the staged-BPE round-trip contract survives the
  * pretokenizer swap.
  *
  * Gate rows stay on the parity-safe pattern (oracle exactness rule);
  * this expression serves `Main bpe-train/tokenize --bytes --gpt2-pre`
  * and SQL via `graft_gpt2_pretokens`, pinned by independently
  * transcribed fixtures in Gpt2PretokensSpec (contractions, double
  * spaces, digit runs, case sensitivity, NBSP, emoji) plus the
  * single-spaced-ASCII agreement with the gate pattern.
  */
object Gpt2PretokenUtil {
  val PatternString: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  private val P = java.util.regex.Pattern.compile(
    PatternString, java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  def pretokens(s: UTF8String): ArrayData = {
    val m = P.matcher(s.toString)
    val out = new java.util.ArrayList[Any]()
    while (m.find()) out.add(UTF8String.fromString(m.group()))
    new GenericArrayData(out.toArray)
  }
}

/** Codegen'd exact-GPT-2 pre-tokenizer (see [[Gpt2PretokenUtil]]). */
case class Gpt2Pretokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_gpt2_pretokens"

  override def nullSafeEval(input: Any): Any =
    Gpt2PretokenUtil.pretokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Gpt2PretokenUtil.pretokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Gpt2Pretokens =
    copy(child = newChild)
}

/** Column-API entry point. */
object Gpt2Pretokenize {
  /** Exact GPT-2 pretoken array of a raw text column (case-preserving —
    * byte-level tokenization never lowercases). */
  def gpt2Pretokens(c: Column): Column =
    ColumnBridge.column(Gpt2Pretokens(ColumnBridge.expression(c)))
}
