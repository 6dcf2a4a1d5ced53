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

  test("freqScoreOn with uniTokens: the Main score --unicode path (driver brute force)") {
    import spark.implicits._
    val texts = Seq(
      (1L, "Café menu café"),       // NBSP-joined
      (2L, "café menu menu"),                  // NFD café
      (3L, "今日　今日 rare"),   // ideographic space
      (4L, "plain ascii words here"))
    val docs = texts.toDF("doc_id", "text")
    val got = graft.operators.TextOps.freqScoreOn(docs,
        t => UnicodeTokenize.uniTokens(t, stripPunct = false), 0.1)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("sum_ctf"), r.getAs[Long]("total_tokens"),
        r.getAs[Double]("mean_prob_r"), r.getAs[Boolean]("keep"))).toSeq
    // independent derivation through refTokens (this suite's reference)
    val toks = texts.map { case (id, t) => id -> refTokens(t, stripPunct = false) }
    val ctf = toks.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = ctf.values.sum
    val want = toks.filter(_._2.nonEmpty).map { case (id, ts) =>
      val sumCtf = ts.map(ctf).sum
      val mp = BigDecimal(sumCtf.toDouble / ts.size / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, ts.size.toLong, sumCtf, total, mp, mp >= 0.1)
    }.sortBy(_._1)
    assert(got == want, s"got $got\nwant $want")
    // and the unicode variant genuinely sees what the ASCII split cannot:
    // doc 1's NBSP-joined café must count as two tokens + a repeat
    assert(got.find(_._1 == 1L).get._2 == 3L)
  }

  test("qualityFilterOn with uniTokens: the Main score --quality --unicode path") {
    import spark.implicits._
    val texts = Seq(
      // 12 distinct unicode-split tokens → passes len+ttr+top_share
      (1L, (1 to 12).map(i => s"w$i").mkString(" ")),
      // 15 copies of one token → top_share = 1 → drop
      (2L, Seq.fill(15)("dup").mkString("　")),
      // 3 tokens → too short → drop
      (3L, "a b c"))
    val docs = texts.toDF("doc_id", "text")
    val got = graft.operators.TextOps.qualityFilterOn(docs,
        t => UnicodeTokenize.uniTokens(t, stripPunct = false))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_types"), r.getAs[Boolean]("keep"))).toSeq
    val want = texts.map { case (id, t) =>
      val ts = refTokens(t, stripPunct = false)
      val byTok = ts.groupBy(identity).map(_._2.size)
      val ttr = BigDecimal(byTok.size.toDouble / ts.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val top = BigDecimal(byTok.max.toDouble / ts.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, ts.size.toLong, byTok.size.toLong,
        ts.size >= 10 && ts.size <= 1000 && ttr >= 0.2 && top <= 0.2)
    }.sortBy(_._1)
    assert(got == want, s"got $got\nwant $want")
    assert(got.map(_._4) == Seq(true, false, false),
      "the battery must keep 1 and drop 2 (top_share) and 3 (length)")
    // the ASCII split sees ONE token per doc here — every verdict flips
    // to drop; the unicode variant is what makes the battery meaningful
    val ascii = graft.operators.TextOps.qualityFilterOn(docs,
        t => split(lower(t), " "))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep")))
    assert(ascii.forall(!_._2), "ASCII split must fail all three (1 token each)")
  }

  test("dupSpans with uniTokens: the Main spans --unicode path (driver brute force)") {
    import spark.implicits._
    val n = 5
    val run = (0 until 12).map(i => s"run$i")
    // doc 1 carries the run NBSP-joined (invisible to the ASCII split);
    // doc 2 carries it space-joined
    val aToks = (0 until 8).map(i => s"xa$i") ++ run ++ (0 until 6).map(i => s"ya$i")
    val aText = aToks.take(8).mkString(" ") + " " +
      run.mkString(" ") + " " + aToks.takeRight(6).mkString(" ")
    val bText = ((0 until 3).map(i => s"xb$i") ++ run ++
      (0 until 4).map(i => s"yb$i")).mkString(" ")
    val docs = Seq((1L, aText), (2L, bText)).toDF("doc_id", "text")
    val uni = graft.operators.Dedup.dupSpans(docs, n,
        t => UnicodeTokenize.uniTokens(t, stripPunct = false))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("span_start"), r.getAs[Long]("span_tokens"))).toSet
    // brute: refTokens both docs, duplicated n-shingles across the corpus,
    // spans = maximal start islands + n − 1
    val tokd = Seq(1L -> refTokens(aText, stripPunct = false),
      2L -> refTokens(bText, stripPunct = false))
    val shingles = tokd.flatMap { case (id, ts) =>
      (0 to ts.length - n).map(i => (id, i, ts.slice(i, i + n).mkString(" ")))
    }
    val dup = shingles.groupBy(_._3).filter(_._2.size > 1).keySet
    val want = tokd.flatMap { case (id, _) =>
      val starts = shingles.filter(s => s._1 == id && dup(s._3)).map(_._2).sorted
      // islands of consecutive starts
      starts.foldLeft(Vector.empty[(Int, Int)]) { (acc, s) =>
        acc.lastOption match {
          case Some((b, e)) if s == e + 1 => acc.init :+ (b, s)
          case _ => acc :+ (s, s)
        }
      }.map { case (b, e) => (id, b.toLong, (e - b + n).toLong) }
    }.toSet
    assert(uni == want, s"got $uni\nwant $want")
    assert(uni.map(_._1) == Set(1L, 2L) && uni.forall(_._3 == 12L),
      s"both docs must span the 12-token run: $uni")
    // the ASCII split cannot see doc 1's NBSP-fused run — no spans at all
    val ascii = graft.operators.Dedup.dupSpans(docs, n).collect()
    assert(ascii.isEmpty, "ASCII split must find nothing here")
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
