package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval engine for [[ApplyBpe]] — also the body the generated
  * code calls. One instance per expression; carries the merge list
  * pre-flattened for the row loop and ships to executors as a plan
  * reference object (the lshPlanes pattern, VectorExpressions.scala).
  *
  * Reproduces TextOps.applyBpeMerges bit-for-bit at the SYMBOL level:
  * the reference formulation stages the word as a double-space-fenced
  * symbol sequence and runs one literal `replace(" a  b ", " ab ")` per
  * merge — a literal replace scans left-to-right over non-overlapping
  * occurrences and resumes AFTER each replacement, which on the fenced
  * encoding is exactly one greedy BPE merge pass over the symbol array
  * (match syms(i)=a, syms(i+1)=b ⇒ emit ab, advance 2). This engine
  * runs that pass directly on a symbol array, so the per-merge cost is
  * one O(|word|) sweep instead of a Catalyst expression node — the
  * replace-chain's plan depth is LINEAR in merge count and stops
  * analyzing/codegenning around a thousand merges, while a real
  * tokenizer ships ~30k; here 30k merges are one array walk each, and
  * a presence pre-check (hash multiset of live symbols) skips the sweep
  * entirely for every merge whose sides aren't both in the word — for
  * natural words almost all of them.
  *
  * Domain guard: the fenced encoding is only well-defined for
  * space-free inputs (words, by construction of TextOps.words); a ' '
  * inside the input would BE the fence delimiter and the reference
  * replace-chain itself degenerates. Such inputs fail loudly here
  * rather than diverge silently.
  *
  * Initial symbols are Unicode code points — Java 8+ `split("")` (what
  * the reference's `split(w, "")` compiles to) does not split surrogate
  * pairs, and neither does this.
  */
final class BpeApplier(merges: Seq[(String, String)]) extends Serializable {
  require(merges.forall { case (a, b) => a.nonEmpty && b.nonEmpty },
    "BPE merge sides must be non-empty")
  require(merges.forall { case (a, b) =>
    a.indexOf(' ') < 0 && b.indexOf(' ') < 0 },
    "BPE merge symbols must not contain spaces (the fence delimiter)")

  private val as: Array[String] = merges.map(_._1).toArray
  private val bs: Array[String] = merges.map(_._2).toArray
  private val abs: Array[String] = merges.map { case (a, b) => a + b }.toArray

  def nMerges: Int = as.length

  def apply(s: UTF8String): ArrayData = {
    val str = s.toString
    if (str.indexOf(' ') >= 0)
      throw new IllegalArgumentException(
        "ApplyBpe input must be a single space-free word, got: " + str)
    // parity with the replace-chain on the degenerate empty word:
    // split("", "") = [""], the fence collapses to spaces, trim+split
    // yields [""] — one empty token
    if (str.isEmpty)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString("")))
    // split into code-point symbols
    var cpn = 0
    var i = 0
    while (i < str.length) { cpn += 1; i += str.offsetByCodePoints(i, 1) - i }
    val syms = new Array[String](cpn)
    i = 0
    var j = 0
    while (i < str.length) {
      val next = str.offsetByCodePoints(i, 1)
      syms(j) = str.substring(i, next)
      j += 1
      i = next
    }
    var n = cpn
    // live-symbol multiset: O(1) skip for merges whose sides are absent
    val cnt = new java.util.HashMap[String, Integer](Math.max(8, 2 * n))
    i = 0
    while (i < n) { cnt.merge(syms(i), BpeApplier.I1, BpeApplier.Sum); i += 1 }
    var m = 0
    while (m < as.length && n >= 2) {
      val a = as(m)
      val b = bs(m)
      val ca = cnt.get(a)
      if (ca != null && ca.intValue > 0) {
        val cb = cnt.get(b)
        if (cb != null && cb.intValue > 0) {
          // one greedy left-to-right non-overlapping pass
          val ab = abs(m)
          var r = 0
          var o = 0
          while (r < n) {
            if (r + 1 < n && syms(r).equals(a) && syms(r + 1).equals(b)) {
              syms(o) = ab
              cnt.merge(a, BpeApplier.IM1, BpeApplier.Sum)
              cnt.merge(b, BpeApplier.IM1, BpeApplier.Sum)
              cnt.merge(ab, BpeApplier.I1, BpeApplier.Sum)
              r += 2
            } else {
              syms(o) = syms(r)
              r += 1
            }
            o += 1
          }
          n = o
        }
      }
      m += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }
}

private object BpeApplier {
  val I1: Integer = Integer.valueOf(1)
  val IM1: Integer = Integer.valueOf(-1)

  /** Int-sum remapper for HashMap.merge (allocation-free vs boxing a
    * lambda per call site). */
  val Sum: java.util.function.BiFunction[Integer, Integer, Integer] =
    (x: Integer, y: Integer) => Integer.valueOf(x.intValue + y.intValue)
}

/** Codegen'd greedy BPE merge application (SURVEY §2 c52/d21).
  *
  * Why native: the `functions._` reference (TextOps.applyBpeMerges)
  * chains one literal `replace` per merge, so the Catalyst plan is
  * merge-count deep — fine at the gate's 8 learned merges, impossible at
  * a production tokenizer's ~30k (analysis blow-up, then codegen falls
  * back past the 64KB method limit). This expression carries the merge
  * list as ONE reference object and fuses the whole greedy loop into a
  * single JVM pass inside whole-stage codegen; plan depth is 1 at any
  * vocabulary size. The replace-chain stays in TextOps as the
  * independent reference the parity spec pins against.
  * (Reference capability: subword tokenization — Sennrich et al. 2016;
  * bolson has no analogue, extension rows c52/d21.) */
case class ApplyBpe(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  // constructed EAGERLY: merge-list validation (non-empty, space-free
  // sides) must fail at plan time with a clear message, not inside
  // generated code on an executor (the WinnowFps rule)
  private val applier = new BpeApplier(merges)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_apply_bpe"

  override def nullSafeEval(input: Any): Any =
    applier.apply(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApplier", applier,
      classOf[BpeApplier].getName)
    defineCodeGen(ctx, ev, c => s"$ref.apply($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ApplyBpe =
    copy(child = newChild)
}

/** Column-API entry point. */
object BpeFunctions {
  /** Token array of a space-free word column under an ordered BPE merge
    * list — the fused equivalent of TextOps.applyBpeMerges. */
  def applyBpe(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(ApplyBpe(ColumnBridge.expression(word), merges))
}
