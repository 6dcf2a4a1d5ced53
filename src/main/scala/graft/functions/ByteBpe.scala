package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The byte ↔ unicode staging alphabet of byte-level BPE (SURVEY §2
  * c70/d31): the public GPT-2 `bytes_to_unicode` table (Radford et al.
  * 2019, gpt-2/src/encoder.py — public domain knowledge; also the
  * tiktoken/HuggingFace `ByteLevel` pre-tokenizer contract). Every one
  * of the 256 byte values maps to a distinct printable unicode code
  * point, so ANY input — spaces, control bytes, emoji, invalid UTF-8
  * fragments — becomes a space-free, fence-safe symbol string the BPE
  * engine ([[BpeApplier]]) can merge over, and the mapping inverts
  * losslessly byte-for-byte.
  *
  * Table shape: the 188 "printable" bytes (0x21–0x7E, 0xA1–0xAC,
  * 0xAE–0xFF) map to THEMSELVES as code points; the other 68 bytes
  * (0x00–0x20, 0x7F–0xA0, 0xAD) map to 256+n in ascending byte order —
  * so space (0x20) → U+0120 'Ġ', newline (0x0A) → U+010A 'Ċ', tab
  * (0x09) → U+0109 'ĉ'. All staged code points are < U+0144, i.e. one
  * Java char and one-or-two UTF-8 bytes — the staged string is at most
  * 2× the raw byte length.
  *
  * Why native expressions: staging is per-BYTE of the UTF-8 encoding,
  * which no `functions._` string op exposes (they are all
  * code-point-level); a decode/encode round-trip through `binary` would
  * mangle invalid sequences. [[ByteStage]]/[[ByteUnstage]] read the
  * UTF8String's bytes directly — one allocation-light pass inside
  * whole-stage codegen, total over every input. */
object ByteBpeAlphabet {
  /** byte value (0–255) → staged code point (as a Java char; all < U+0144). */
  val byteToChar: Array[Char] = {
    val out = new Array[Char](256)
    val printable = new Array[Boolean](256)
    ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff))
      .foreach(printable(_) = true)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** staged code point → byte value, or -1 for a char outside the staged
    * alphabet (indexed to the max staged char; higher chars are caught
    * by the bounds check in [[unstage]]). */
  val charToByte: Array[Int] = {
    val max = byteToChar.max.toInt
    val out = Array.fill(max + 1)(-1)
    var b = 0
    while (b < 256) { out(byteToChar(b)) = b; b += 1 }
    out
  }

  /** UTF-8 bytes of `s`, each mapped to its staged unicode char. Total:
    * every byte value has a staged char, so this never fails. */
  def stage(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(byteToChar(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Inverse of [[stage]]: staged chars back to the raw bytes they
    * encode. A char outside the staged alphabet means the input was
    * NOT produced by stage (or a merge artifact from a different
    * alphabet) — fails loudly rather than guessing (the ApplyBpe
    * domain-guard rule). */
  def unstage(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i).toInt
      val b = if (c < charToByte.length) charToByte(c) else -1
      if (b < 0)
        throw new IllegalArgumentException(
          "ByteUnstage input contains char U+" + Integer.toHexString(c) +
            " outside the byte-BPE staging alphabet: " + str)
      out(i) = b.toByte
      i += 1
    }
    UTF8String.fromBytes(out, 0, str.length)
  }
}

/** Codegen'd byte-level BPE staging (see [[ByteBpeAlphabet]]): string →
  * staged symbol string, one char per UTF-8 byte. */
case class ByteStage(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_byte_stage"

  override def nullSafeEval(input: Any): Any =
    ByteBpeAlphabet.stage(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteBpeAlphabet.stage($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteStage =
    copy(child = newChild)
}

/** Codegen'd inverse staging (see [[ByteBpeAlphabet.unstage]]): staged
  * symbol string → the raw byte string it encodes. Throws on input not
  * in the staged alphabet. */
case class ByteUnstage(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_byte_unstage"

  override def nullSafeEval(input: Any): Any =
    ByteBpeAlphabet.unstage(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteBpeAlphabet.unstage($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteUnstage =
    copy(child = newChild)
}

/** Column-API entry points for the byte-level staging pair. */
object ByteBpeFunctions {
  /** Stage a string column's UTF-8 bytes into the byte-BPE symbol
    * alphabet (GPT-2 `bytes_to_unicode`). */
  def byteStage(c: Column): Column =
    ColumnBridge.column(ByteStage(ColumnBridge.expression(c)))

  /** Invert [[byteStage]] — staged symbols (or concatenated byte-BPE
    * tokens) back to the raw string. */
  def byteUnstage(c: Column): Column =
    ColumnBridge.column(ByteUnstage(ColumnBridge.expression(c)))
}
