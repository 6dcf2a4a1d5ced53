package graft

import org.apache.spark.sql.functions._

import graft.functions.UnicodeTokenize
import graft.operators.TextOps

/** Native UniTokens expression specs: driver brute-force parity (this
  * variant has no SQL oracle by design — engines disagree on Unicode
  * case/whitespace tables, which is exactly why the GATE rows keep the
  * ASCII tokenizer) plus the multilingual traps the ASCII split cannot
  * handle. */
class UnicodeTokenizeSpec extends SparkSpec {

  /** Independent reference: same documented contract (NFC → Locale.ROOT
    * lowercase → split on isWhitespace ∪ isSpaceChar → optional \p{P}
    * edge strip), different mechanics (precomputed code-point sets +
    * functional splitting, vs the expression's fused imperative loop). */
  private val wsSet: Set[Int] = (0 to 0xFFFF).filter(cp =>
    Character.isWhitespace(cp) || Character.isSpaceChar(cp)).toSet
  private val punctTypes = Set(
    Character.CONNECTOR_PUNCTUATION, Character.DASH_PUNCTUATION,
    Character.START_PUNCTUATION, Character.END_PUNCTUATION,
    Character.INITIAL_QUOTE_PUNCTUATION, Character.FINAL_QUOTE_PUNCTUATION,
    Character.OTHER_PUNCTUATION).map(_.toInt)

  private def refTokens(s: String, stripPunct: Boolean): Vector[String] = {
    val lower = java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val cps = lower.codePoints().toArray.toVector
    val split = cps.foldLeft(Vector(Vector.empty[Int])) { (acc, cp) =>
      if (wsSet(cp)) if (acc.last.isEmpty) acc else acc :+ Vector.empty
      else acc.init :+ (acc.last :+ cp)
    }.filter(_.nonEmpty)
    val stripped = if (!stripPunct) split else split.map { tok =>
      tok.dropWhile(cp => punctTypes(Character.getType(cp)))
        .reverse.dropWhile(cp => punctTypes(Character.getType(cp))).reverse
    }.filter(_.nonEmpty)
    stripped.map(tok =>
      new String(tok.flatMap(Character.toChars(_).toSeq).toArray))
  }

  private def run(texts: Seq[String], stripPunct: Boolean): Map[String, Vector[String]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(col("text"),
        UnicodeTokenize.uniTokens(col("text"), stripPunct).as("ts"))
      .collect()
      .map(r => r.getAs[String]("text") -> r.getSeq[String](1).toVector).toMap
  }

  test("uniTokens handles the multilingual traps the ASCII split cannot") {
    val nbsp = "a\u00a0b"
    val ideo = "\u4eca\u65e5\u3000\u306f" // CJK + ideographic space U+3000
    val nfd = "cafe\u0301"              // cafe + combining acute
    val sigma = "\u03a3\u039f\u03a6\u039f\u03a3" // uppercase Greek, final-sigma trap
    val multi = "one\ttwo\nthree\u2028four\u202ffive"
    val got = run(Seq(nbsp, ideo, nfd, sigma, multi, "", "   "), stripPunct = false)
    assert(got(nbsp) == Vector("a", "b"), "NBSP must split")
    assert(got(ideo) == Vector("\u4eca\u65e5", "\u306f"),
      "ideographic space must split")
    assert(got(nfd) == Vector("caf\u00e9"),
      "NFD input must normalize to the NFC token")
    assert(got(sigma) == Vector(sigma.toLowerCase(java.util.Locale.ROOT)),
      "Greek lowercasing (final sigma) follows java.lang.String")
    assert(got(multi) == Vector("one", "two", "three", "four", "five"),
      "tab/newline/U+2028/U+202F all split")
    assert(got("") == Vector() && got("   ") == Vector(),
      "empty and all-whitespace yield no tokens")
    // the ASCII gate tokenizer, for contrast, sees ONE token here — the
    // documented reason gate rows keep it is oracle exactness, not reach
    val ascii = run(Seq(nbsp), stripPunct = false) // native, splits
    assert(ascii(nbsp).length == 2)
    import spark.implicits._
    val gateToks = Seq(nbsp).toDF("text")
      .select(split(lower(col("text")), " ").as("ts")).head.getSeq[String](0)
    assert(gateToks == Seq(nbsp), "ASCII split leaves the NBSP token fused")
  }

  test("uniTokens --strip-punct trims edges, keeps interior, drops all-punct") {
    val s = "\u00abHello,\u00bb (world)! don't -- state-of-the-art\u2026"
    val got = run(Seq(s), stripPunct = true)(s)
    assert(got == Vector("hello", "world", "don't", "state-of-the-art"),
      s"got $got")
  }

  test("uniTokens equals the independent reference on randomized strings") {
    val pool: Seq[String] = Seq("a", "B", "\u00e9", "e\u0301", "\u4eca",
      "\u03a3", "\u00df", "1", ".", ",", "\u00ab", ")", "'", "-",
      " ", "\t", "\n", "\u00a0", "\u3000", "\u2028",
      new String(Character.toChars(0x1F600)))
    for (seed <- 1 to 20; stripPunct <- Seq(false, true)) {
      val rnd = new scala.util.Random(seed)
      val texts = (0 until 30).map(_ =>
        (0 until rnd.nextInt(25)).map(_ => pool(rnd.nextInt(pool.length)))
          .mkString)
      val got = run(texts.distinct, stripPunct)
      texts.distinct.foreach { t =>
        assert(got(t) == refTokens(t, stripPunct),
          s"seed=$seed strip=$stripPunct text=${t.getBytes("UTF-8").toSeq}")
      }
    }
  }

  test("uniTokens agrees with the gate tokenizer on single-spaced ASCII text") {
    // on the clean subset both tokenizers must see the same stream —
    // the variant extends reach, it must not REINTERPRET simple text
    val texts = Seq("the quick brown fox", "a b c", "one 2 three")
    val got = run(texts, stripPunct = false)
    texts.foreach { t =>
      assert(got(t) == t.toLowerCase.split(" ", -1).toVector, t)
    }
  }

  test("vocabTopkOn with uniTokens: the Main vocab --unicode path") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Caf\u00e9\u00a0menu"), (2L, "cafe\u0301 menu,"),
      (3L, "\u4eca\u65e5\u3000\u4eca\u65e5")).toDF("doc_id", "text")
    val v = TextOps.vocabTopkOn(docs, 10,
      t => UnicodeTokenize.uniTokens(t, stripPunct = true))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // café: NFC+NFD unify across NBSP/space splits; 今日 twice in doc 3
    assert(v.toSet == Set(("caf\u00e9", 2L, 2L), ("menu", 2L, 2L),
      ("\u4eca\u65e5", 2L, 1L)), s"got ${v.toSeq}")
  }
}
