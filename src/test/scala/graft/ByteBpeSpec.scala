package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.functions.{ByteBpeAlphabet, ByteBpeFunctions, BpeFunctions}
import graft.operators.TextOps

/** Byte-level BPE specs (c70): the GPT-2 staging alphabet against an
  * independently-built table, ByteStage/ByteUnstage expression parity
  * with a driver-side byte loop on adversarial inputs, lossless
  * round-trips, and end-to-end byte-level tokenization parity with a
  * brute-force greedy merge reference. */
class ByteBpeSpec extends SparkSpec {

  /** Independent rebuild of the public GPT-2 bytes_to_unicode table —
    * transcribed directly from the published algorithm, sharing no code
    * with ByteBpeAlphabet. */
  private val refTable: Map[Int, Int] = {
    val bs = (('!'.toInt to '~'.toInt) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toBuffer
    val cs = bs.clone()
    var n = 0
    for (b <- 0 until 256) {
      if (!bs.contains(b)) { bs += b; cs += (256 + n); n += 1 }
    }
    bs.zip(cs).map { case (b, c) => (b, c) }.toMap
  }

  private def refStage(s: String): String =
    s.getBytes(StandardCharsets.UTF_8)
      .map(b => refTable(b & 0xff).toChar).mkString

  test("staging alphabet is the GPT-2 table: total, injective, printable-identity") {
    assert(ByteBpeAlphabet.byteToChar.length == 256)
    assert(ByteBpeAlphabet.byteToChar.distinct.length == 256,
      "every byte must stage to a DISTINCT char")
    for (b <- 0 until 256)
      assert(ByteBpeAlphabet.byteToChar(b).toInt == refTable(b),
        s"byte $b stages to ${ByteBpeAlphabet.byteToChar(b).toInt}, " +
          s"reference says ${refTable(b)}")
    // the landmarks every byte-level tokenizer doc quotes
    assert(ByteBpeAlphabet.byteToChar(' '.toInt) == 'Ġ') // Ġ
    assert(ByteBpeAlphabet.byteToChar('\n'.toInt) == 'Ċ') // Ċ
    assert(ByteBpeAlphabet.byteToChar('\t'.toInt) == 'ĉ') // ĉ
    assert(ByteBpeAlphabet.byteToChar('a'.toInt) == 'a')
    assert(ByteBpeAlphabet.byteToChar('~'.toInt) == '~')
    // no staged char is a space: the fence stays safe for ANY input
    assert(!ByteBpeAlphabet.byteToChar.contains(' '))
  }

  private val adversarial = Seq(
    "hello world",
    " leading and trailing ",
    "tab\there\nnewline\r\n",
    "café résumé",           // 2-byte UTF-8
    "你好世界",             // CJK, 3-byte UTF-8
    "emoji 🙂 pair 🍕", // surrogate pairs, 4-byte UTF-8
    "nul\u0000ctl\u0007\u007f",                    // control bytes
    "",
    "­",                                // soft hyphen: the lone 0xAD case
    "mixed é😀x\tY z")

  test("ByteStage equals the driver-side byte loop on adversarial inputs") {
    import spark.implicits._
    val got = adversarial.toDF("s")
      .select(ByteBpeFunctions.byteStage(col("s")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(got == adversarial.map(refStage),
      "staged strings must match the reference table byte-for-byte")
  }

  test("ByteUnstage inverts ByteStage losslessly through the plan") {
    import spark.implicits._
    val got = adversarial.toDF("s")
      .select(col("s"), ByteBpeFunctions.byteUnstage(
        ByteBpeFunctions.byteStage(col("s"))).as("t"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0),
      s"round trip broke for ${r.getString(0)}"))
  }

  test("ByteUnstage fails loudly on a char outside the staged alphabet") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq("ok世ok").toDF("s")
        .select(ByteBpeFunctions.byteUnstage(col("s"))).collect()
    }
    assert(e.getMessage != null)
    // null passes through (nullSafeEval), never throws
    val n = Seq[String](null).toDF("s")
      .select(ByteBpeFunctions.byteUnstage(col("s"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("bytePretokens: concat reconstructs single-spaced text; Ġ-shape after staging") {
    import spark.implicits._
    val texts = Seq("the cat sat", "a", "x y-z 9", " lead", "double  space")
    val rows = texts.toDF("text")
      .select(col("text"),
        concat_ws("", TextOps.bytePretokens(col("text"))).as("rejoined"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      if (!t.contains("  ")) assert(r.getString(1) == t,
        s"pretokens of single-spaced '$t' must concat back exactly")
      else assert(r.getString(1) == t.replaceAll(" +", " "),
        "documented divergence: only the space attached to the next " +
          "pretoken survives a multi-space run")
    }
  }

  /** Brute-force byte-level tokenize: stage via the independent table,
    * then sequential greedy merge passes (the Sennrich reference,
    * duplicated from BpeExprSpec's rule: no shared code with the
    * implementation). */
  private def bruteTokens(pretoken: String,
                          merges: Seq[(String, String)]): Vector[String] = {
    val staged = refStage(pretoken)
    var syms = staged.map(_.toString).toVector
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("c70 token table equals the driver brute force on the gate corpus") {
    val merges = TextOps.trainBpeBytes(spark, sfDir)
    assert(merges.nonEmpty)
    assert(merges.forall { case (a, b) =>
      !a.contains(' ') && !b.contains(' ') },
      "byte-staged merges must be space-free (fence safety)")
    // brute-force token frequency table from the raw pretokens
    val pretokens = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(explode(TextOps.bytePretokens(col("text"))).as("p"))
      .collect().map(_.getString(0))
    val want = pretokens.iterator
      .flatMap(p => bruteTokens(p, merges))
      .foldLeft(Map.empty[String, Long]) { case (m, t) =>
        m.updated(t, m.getOrElse(t, 0L) + 1L)
      }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(100)
    val got = TextOps.c70BpeBytes(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, "c70 must equal the brute-force byte-level tokenizer")
    assert(got.exists(_._1.length > 1), "merges must actually fuse symbols")
  }

  test("c73 byte fertility equals the driver brute force per document") {
    val merges = TextOps.trainBpeBytes(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val pretokenRe = java.util.regex.Pattern.compile(" ?[^ ]+")
    val want = docs.flatMap { case (id, t) =>
      val m = pretokenRe.matcher(t)
      val ps = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toVector
      if (ps.isEmpty) None
      else {
        val nt = ps.map(p => bruteTokens(p, merges).size.toLong).sum
        val fert = BigDecimal(nt.toDouble / ps.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((id, ps.size.toLong, nt, fert))
      }
    }.sortBy(_._1).toSeq
    val got = TextOps.c73ByteFertility(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == want, "c73 must equal the brute-force byte-level fertility")
    // the trained merges genuinely compress: corpus-wide token count is
    // strictly below the unmerged ceiling (one token per staged byte —
    // single-spaced corpus, so byte length == summed pretoken length)
    val totalTokens = got.map(_._3).sum
    val totalBytes = docs.map { case (_, t) =>
      t.getBytes(StandardCharsets.UTF_8).length.toLong }.sum
    assert(totalTokens < totalBytes,
      s"merges fused nothing: $totalTokens tokens over $totalBytes bytes")
  }

  test("property: arbitrary strings round-trip stage∘unstage; tokens re-concat losslessly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    // strings over the FULL unicode range incl. control chars, the
    // printable-latin supplement (the identity rows), and astral planes
    val genStr: Gen[String] = Gen.listOf(Gen.frequency(
      (4, Gen.chooseNum(0x20, 0x7e)),
      (2, Gen.chooseNum(0, 0x1f)),
      (2, Gen.chooseNum(0xa0, 0x2ff)),
      (1, Gen.chooseNum(0x4e00, 0x9fff)),
      (1, Gen.chooseNum(0x1f300, 0x1f64f)))).map(cps =>
      cps.flatMap(Character.toChars(_).toSeq).mkString)
    val u8 = org.apache.spark.unsafe.types.UTF8String.fromString _
    for (trial <- 0 until 200) {
      val s = sample(genStr, 31L * trial + 7)
      val staged = ByteBpeAlphabet.stage(u8(s)).toString
      // staged length = UTF-8 byte length; every staged char maps back
      assert(staged.length == s.getBytes(StandardCharsets.UTF_8).length,
        s"trial $trial: staged length")
      assert(ByteBpeAlphabet.unstage(u8(staged)).toString == s,
        s"trial $trial: stage∘unstage broke for ${s.getBytes("UTF-8").toSeq}")
      // tokenizing the staged form under ANY merge list re-concats to the
      // staged string (BPE merges only fuse, never alter content), so
      // unstage(concat(tokens)) always recovers the input
      if (!staged.contains(' ')) {
        val merges = {
          val syms = staged.toSeq.map(_.toString).distinct
          if (syms.length >= 2)
            Seq((syms(0), syms(1)), (syms(0) + syms(1), syms(0)))
          else Seq(("ß", "ß"))
        }
        val toks = new graft.functions.BpeApplier(merges).apply(u8(staged))
        val cat = (0 until toks.numElements())
          .map(i => toks.getUTF8String(i).toString).mkString
        assert(cat == staged || (staged.isEmpty && cat == ""),
          s"trial $trial: token concat diverged")
      }
    }
  }

  test("byte-level BPE handles inputs char-level BPE cannot: spaces and emoji") {
    import spark.implicits._
    // a space INSIDE the input breaks the char-level fence (ApplyBpe
    // throws); staged first, the same engine tokenizes it fine
    val merges = Seq(("Ġ", "t"), ("h", "e"), ("Ġt", "he"))
    val got = Seq(" the end 🙂").toDF("s")
      .select(BpeFunctions.applyBpe(
        ByteBpeFunctions.byteStage(col("s")), merges).as("ts"))
      .collect()(0).getSeq[String](0).toVector
    assert(got.head == "Ġthe", "Ġ+t+he must fuse into one token")
    // the emoji staged to its 4 mapped bytes, untouched by these merges
    assert(got.takeRight(4).mkString ==
      refStage("🙂"))
    // and the whole token stream unstages back to the input
    assert(ByteBpeAlphabet.unstage(
      org.apache.spark.unsafe.types.UTF8String.fromString(got.mkString))
      .toString == " the end 🙂")
  }
}
