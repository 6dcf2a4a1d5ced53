package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval for [[WinnowFps]] — also the body the generated code calls.
  *
  * Reproduces the `functions._` reference formulation (TextOps.winnowGrams
  * ∘ winnowSelect) bit-for-bit: tokens = `split(lower(text), " ")`
  * (UTF8String.toLowerCase + split limit −1, interior empties survive),
  * gram i = tokens i..i+k−1 joined by a single space, hashed to lowercase
  * md5 hex; each length-w hash window contributes its LEXICOGRAPHIC
  * minimum; the result is the sorted distinct selected set. md5 hex is
  * ASCII, so Java string order ≡ UTF8 byte order ≡ DuckDB's collation —
  * the oracle stays exact.
  */
object WinnowUtil {
  private val Space = UTF8String.fromString(" ")
  private val HexDigits = "0123456789abcdef".toCharArray

  // one digest per thread: getInstance per row would dominate the loop
  private val Digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def md5hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexDigits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val md = Digest.get()
    val utoks = s.toLowerCase.split(Space, -1)
    val nG = utoks.length - (k - 1)
    val nW = nG - (w - 1)
    if (nW < 1) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val toks = new Array[String](utoks.length)
    var i = 0
    while (i < utoks.length) { toks(i) = utoks(i).toString; i += 1 }
    val gs = new Array[String](nG)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i < nG) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      gs(i) = md5hex(md, sb.toString)
      i += 1
    }
    // per-window lexicographic minima; TreeSet = distinct + sorted
    val sel = new java.util.TreeSet[String]()
    i = 0
    while (i < nW) {
      var m = gs(i)
      var j = 1
      while (j < w) {
        if (gs(i + j).compareTo(m) < 0) m = gs(i + j)
        j += 1
      }
      sel.add(m)
      i += 1
    }
    val out = new Array[UTF8String](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.asInstanceOf[Array[Any]])
  }
}

/** Codegen'd winnowing fingerprint selector (SURVEY §2 c57/d23).
  *
  * Why native: the `functions._` reference builds k-gram md5s and window
  * minima through nested higher-order TRANSFORMs — every lambda element
  * routes through interpreted eval, measured as the whole cost of c57
  * (1.4 s of a 38 s suite at sf0.1 for a purely row-local operator). This
  * expression fuses tokenize → hash → window-min → distinct → sort into
  * one JVM loop inside whole-stage codegen. The HOF formulation stays in
  * TextOps as the independent reference the parity spec pins against.
  * (Reference capability: document fingerprinting — Schleimer, Wilkerson
  * & Aiken 2003; bolson has no analogue, extension row c57.) */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  // plan-time validation: the Column API is public, and w <= 0 would
  // otherwise fail only at eval time as an executor-side
  // ArrayIndexOutOfBoundsException inside generated code
  require(k >= 1, s"winnow k-gram width must be >= 1, got $k")
  require(w >= 1, s"winnow window width must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowUtil.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowUtil.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** Column-API entry point. */
object WinnowFunctions {
  /** Sorted distinct winnowing fingerprints of a raw text column
    * (lowercasing happens inside — pass the text as stored). */
  def winnowFps(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFps(ColumnBridge.expression(c), k, w))
}
