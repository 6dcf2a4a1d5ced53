package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeFunctions
import graft.operators.TextOps

/** Native ApplyBpe expression specs: parity with the replace-chain
  * reference formulation (TextOps.applyBpeMerges), driver brute-force
  * parity at a merge count the replace-chain cannot plan, and the
  * plan-time guards. */
class BpeExprSpec extends SparkSpec {

  /** The independent greedy merge pass (Sennrich 2016) — duplicated from
    * OperatorsSpec deliberately: this suite must not share code with the
    * implementation under test. */
  private def brutePass(syms: Vector[String],
                        m: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def bruteApply(w: String, merges: Seq[(String, String)]): Vector[String] = {
    // code-point split, like Java 8+ split("")
    val syms = w.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp)))
    merges.foldLeft(if (syms.isEmpty) Vector("") else syms)(brutePass)
  }

  test("applyBpe equals the replace-chain on the gate corpus vocabulary") {
    val merges = TextOps.trainBpe(spark, sfDir)
    assert(merges.nonEmpty)
    val words = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 1).distinct()
    val both = words.select(col("w"),
      BpeFunctions.applyBpe(col("w"), merges).as("native"),
      TextOps.applyBpeMerges(col("w"), merges).as("chain"))
    val bad = both.filter(not(col("native") === col("chain")))
    assert(bad.isEmpty, s"native vs replace-chain drift: ${bad.head(3).toSeq}")
    // and both equal the driver brute force
    both.collect().foreach { r =>
      assert(r.getSeq[String](1).toVector ==
        bruteApply(r.getAs[String]("w"), merges),
        s"word ${r.getAs[String]("w")}")
    }
  }

  test("applyBpe parity on boundary traps, unicode, and control chars") {
    import spark.implicits._
    val emoji = new String(Character.toChars(0x1F600))
    val eAcute = "\u00e9"                // precomposed e-acute, ONE code point
    val nfc = eAcute + "st"
    val nfd = "e\u0301st"                // e + combining acute, TWO
    val merges = Seq("a" -> "b", "ab" -> "ab", "a" -> "a",
      eAcute -> "s", (eAcute + "s") -> "t", "x" -> "\n", emoji -> "z")
    // traps: fence safety ("xab"/"abc"), back-to-back ("ababab"),
    // overlap ("aaa"), chained multi-char re-merges, NFC vs NFD e-acute
    // (distinct code points must stay distinct), an interior newline
    // (Spark trim strips only ' ', so the symbol must survive), a
    // surrogate-pair emoji (split("") is code-point aware), empty word
    val words = Seq("xab", "abc", "ababab", "aaab", "aaa", "ab", "q",
      nfc, nfd, "x\nx\n", emoji + "z" + emoji, "")
    val both = words.toDF("w").select(col("w"),
      BpeFunctions.applyBpe(col("w"), merges).as("native"),
      TextOps.applyBpeMerges(col("w"), merges).as("chain"))
      .collect()
      .map(r => (r.getAs[String]("w"), r.getSeq[String](1).toVector,
        r.getSeq[String](2).toVector))
    both.foreach { case (w, native, chain) =>
      assert(native == chain, s"native vs chain on ${w.getBytes("UTF-8").toSeq}")
      assert(native == bruteApply(w, merges),
        s"native vs brute on ${w.getBytes("UTF-8").toSeq}")
    }
    val byWord = both.map(t => t._1 -> t._2).toMap
    assert(byWord(nfc) == Vector(eAcute + "st"),
      "precomposed e-acute chains two merges to one token")
    assert(byWord(nfd) == Vector("e", "\u0301", "s", "t"),
      "decomposed e-acute is two code points - no merge may fire")
    assert(byWord("x\nx\n") == Vector("x\n", "x\n"))
    assert(byWord(emoji + "z" + emoji) == Vector(emoji + "z", emoji),
      "surrogate-pair emoji is ONE symbol; the second has no 'z' to merge")
    assert(byWord("") == Vector(""),
      "empty word degenerates to one empty token (replace-chain parity)")
  }

  test("applyBpe at 1,000 chained merges (the replace-chain cannot plan this)") {
    import spark.implicits._
    // 1,001 DISTINCT code points (CJK block), merges (prefix_i, char_i):
    // every pass fires exactly once on the long word, so all 1,000
    // merges execute and chain — the depth the replace-chain formulation
    // cannot analyze or codegen as a plan
    val longWord = (0 to 1000).map(i => (0x4E00 + i).toChar).mkString
    val merges = (1 to 1000).map(i =>
      longWord.substring(0, i) -> longWord.substring(i, i + 1))
    // plus noise words exercising the presence-check fast path
    val words = Seq(longWord, "abcab", "jihg", "a", longWord.take(500))
    val got = words.toDF("w")
      .select(col("w"), BpeFunctions.applyBpe(col("w"), merges).as("ts"))
      .collect()
      .map(r => r.getAs[String]("w") -> r.getSeq[String](1).toVector).toMap
    words.foreach { w =>
      assert(got(w) == bruteApply(w, merges), s"word ${w.take(5)}…")
    }
    assert(got(longWord) == Vector(longWord),
      "1,000 chained merges fuse the 1,001-char word to a single token")
    // the 500-char prefix chains passes 1..499 then stalls (char 500
    // absent), still fusing to one token
    assert(got(longWord.take(500)) == Vector(longWord.take(500)))
  }

  test("applyBpe guards: plan-time merge validation, eval-time space rejection") {
    import spark.implicits._
    // invalid merge lists must fail when the Column is BUILT, not on an
    // executor inside generated code
    val e1 = intercept[IllegalArgumentException] {
      BpeFunctions.applyBpe(col("w"), Seq("" -> "b"))
    }
    assert(e1.getMessage.contains("non-empty"))
    val e2 = intercept[IllegalArgumentException] {
      BpeFunctions.applyBpe(col("w"), Seq("a b" -> "c"))
    }
    assert(e2.getMessage.contains("space"))
    // a space inside the INPUT breaks the fenced encoding's domain —
    // loud failure, not silent divergence from the replace-chain
    val ex = intercept[Exception] {
      Seq("two words").toDF("w")
        .select(BpeFunctions.applyBpe(col("w"), Seq("a" -> "b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("space-free")))
  }

  test("applyBpe randomized adversarial merge lists equal the brute sequential passes") {
    import spark.implicits._
    // tiny alphabet + random (often repeated) merge pairs maximize the
    // hard cases for the indexed fireable-set engine: sides consumed to
    // zero then RECREATED by later merges, duplicate (a,b) ranks, merges
    // whose sides only ever exist transiently, a==b overlap passes
    val alpha = Vector("a", "b", "c")
    for (seed <- 301 to 330) {
      val rnd = new scala.util.Random(seed)
      def sym(): String =
        (0 until 1 + rnd.nextInt(2)).map(_ => alpha(rnd.nextInt(3))).mkString
      val merges = (0 until 12 + rnd.nextInt(20)).map(_ => (sym(), sym()))
      val words = (0 until 25).map(_ =>
        (0 until rnd.nextInt(14)).map(_ => alpha(rnd.nextInt(3))).mkString)
        .distinct
      val got = words.toDF("w")
        .select(col("w"), BpeFunctions.applyBpe(col("w"), merges).as("ts"))
        .collect()
        .map(r => r.getAs[String]("w") -> r.getSeq[String](1).toVector).toMap
      words.foreach { w =>
        assert(got(w) == bruteApply(w, merges),
          s"seed=$seed word=$w merges=$merges")
      }
    }
  }

  test("trainBpeOn staged through the native expression is unchanged (memo parity)") {
    // the r11 switch of the training loop's staging from the replace
    // chain to ApplyBpe must not move the learned artifact: re-derive
    // the gate merges from scratch on a fresh frame and compare with the
    // memoized list the oracle renders against
    val fresh = TextOps.trainBpeOn(
      Tables.documents(spark, sfDir)
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(length(col("w")) >= 1)
        .groupBy("w").agg(count(lit(1)).as("wcnt")),
      TextOps.C52Rounds)
    assert(fresh == TextOps.trainBpe(spark, sfDir))
  }
}
