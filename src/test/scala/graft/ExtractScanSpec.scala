package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Extract

/** Differential verification of the r21 hand-rolled extract/encoding
  * scanners (ExtractScan) against the retired r20 regex chain, kept
  * verbatim as Extract.htmlExtractOnRegex / encodingFlagOnRegex — the
  * verification round the r20 checklist required before any fused
  * scanner could ship. Two layers:
  *
  *  1. an ADVERSARIAL corpus of hand-built markup hitting every
  *     pass-interaction hazard (comment-split tags, unterminated
  *     blocks, close-tag near-misses, block-name prefixes, nested '<',
  *     entity overlaps, exotic whitespace, markers at end-of-input);
  *  2. a SEEDED fuzz sweep: thousands of random concatenations over a
  *     token pool biased toward marker fragments, at minWords 1 and 4.
  *
  * Both layers demand EXACT output equality (well_formed, n_lines,
  * extracted / all four c118 columns) row for row. */
class ExtractScanSpec extends SparkSpec {

  private def diffExtract(minWords: Int, htmls: Seq[String]): Unit = {
    import spark.implicits._
    val df = htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "html")
    def rows(out: DataFrame): Seq[(Long, Boolean, Long, String)] =
      out.orderBy("doc_id")
        .select("doc_id", "well_formed", "n_lines", "extracted")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getString(3)))
    val got = rows(Extract.htmlExtractOn(df, minWords = minWords))
    val want = rows(Extract.htmlExtractOnRegex(df, minWords = minWords))
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w,
        s"scanner diverged from regex chain on doc ${g._1} " +
          s"(minWords=$minWords):\n input: ${htmls(g._1.toInt)}\n" +
          s" scanner: $g\n regex:   $w")
    }
  }

  private def diffEnc(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def rows(out: DataFrame): Seq[(Long, Long, Long, Long, Boolean, String)] =
      out.orderBy("doc_id")
        .select("doc_id", "n_fffd", "n_ctrl", "n_moji", "ok", "repaired")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getString(5)))
    val got = rows(Extract.encodingFlagOn(df))
    val want = rows(Extract.encodingFlagOnRegex(df))
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w,
        s"enc scanner diverged on doc ${g._1}:\n input: " +
          s"${texts(g._1.toInt).map(c => f"\\u${c.toInt}%04x").mkString}\n" +
          s" scanner: $g\n regex:   $w")
    }
  }

  // ------------------------------------------------- adversarial corpus

  private val adversarial: Seq[String] = Seq(
    // every ExtractSpec-pinned case rides here too (belt and braces)
    "<html><head><title>doc 1</title></head><body>" +
      "<nav><a href=\"/\">home</a></nav><p>one two three four five</p>" +
      "<footer>copyright 2026</footer></body></html>",
    "<p>keep these four words</p><script type=\"text/javascript\">var s" +
      " = 'leak leak';</script><style media=\"all\">body{}</style>" +
      "<p>and these four too</p>",
    "<p>early line with four words</p><script>var secret = 'leak';",
    "<p>kept kept kept kept</p><style>p { display: none }",
    "<p>kept kept kept kept</p><!-- unterminated trailing comment",
    "<P>ALPHA beta &amp; gamma &lt;delta&gt;</P><!-- a comment " +
      "<p>ghost ghost</p> -->first  half<BR/>second half &nbsp; here" +
      "<DIV>tail line kept &quot;quoted&quot;</DIV>",
    "<p>alpha beta <link rel=\"x\"/> gamma <track kind=\"c\"> delta</p>" +
      "<p>one <progress value=\"1\"> two three <param name=\"p\"> four</p>",
    // pass-interaction hazards: a comment splitting a script tag, a
    // script swallowing a comment open, comment scrub creating text
    "<scr<!--x-->ipt>not a script one two three four",
    "<script><!--</script>x--> tail words one two three four",
    "<script>a<script>b</script> trailing one two three four",
    "<!--<script>--><p>alpha beta gamma delta</p><!--</script>-->",
    "a<!---->b one two three four",
    "<!--->not closed actually one two three four",
    "<!-- -- > still open one two three four",
    // close-tag near-misses
    "<script>x</scriptx></script> one two three four",
    "<script>x</script foo></script> one two three four",
    "<script>x</script\t\n  > one two three four",
    "<SCRIPT LANG=x>x</ScRiPt  ><p>one two three four</p>",
    "<scripts>not a script one two three four</scripts>",
    "<script_x>boundary means word chars block one two three four",
    "<script2>also word char one two three four",
    "<script x=\"a>b\">broken by attr gt</script> one two three four",
    "<style>s1</style><style>s2</style>mid one two three four",
    // open with no '>' at all
    "<script no gt ever one two three four",
    "<style",
    "<script",
    "text ends with marker <script",
    "text ends with style <style",
    "text ends with comment open <!--",
    "<st<style>yle> one two three four</style>",
    // block-name mechanics
    "<pre>alpha beta gamma delta</pre>",
    "<predator>alpha beta gamma delta</predator>",
    "<p-foo>alpha beta gamma delta</p-foo>",
    "<h1>one two three four</h1><h6>five six seven eight</h6>" +
      "<h7>not a block</h7><h16>h one six</h16>",
    "<table><thead><tr><th>a b c d</th></tr></thead><tbody><td>e f g h" +
      "</td></tbody></table>",
    "<//p>double slash one two three four",
    "<3>numeric name one two three four</3>",
    "<p/>self closing<p />spaced self close one two three four",
    "<p\nattr=\"x\">newline in tag one two three four</p>",
    "<p attr=\">\">gt inside attr leaks one two three four</p>",
    // nested '<' inside generic tags vs block tags
    "<a<p>block inside generic one two three four",
    "<a<b>generic swallows generic one two three four",
    "<a ...no gt one two three four",
    "a < b and c > d one two three four",
    "<>empty tag one two three four",
    "< p>space before name one two three four</ p>",
    // entity overlaps and partials
    "&amp;lt; stays entity-coded one two three four",
    "&amp;nbsp; also stays one two three four",
    "&quo&#39;t; partial overlap one two three four",
    "&lt;script&gt;alpha beta gamma delta&lt;/script&gt;",
    "&copy; &nbsp; &apos; &#39; &quot; one two three four",
    "&&amp;&& tangled amps one two three four",
    // whitespace forms and line mechanics
    "one\ttwo\u000Bthree\ffour\rfive",
    "  leading and trailing   \t ",
    "a b c\nd e f g\nh i j k l\n\n\n",
    "word\r\nword word word word\r\n",
    "exactly three words x\nexactly four words here x",
    "\n\n\nonly newlines\n\n\n",
    "", // empty markup
    "plain text with no markup at all five words",
    // unicode: supplementary chars, exotic spaces (NOT java \s), case
    // folding traps
    "emoji \ud83d\ude00 rides through one two three four",
    "nbsp\u00a0is not java whitespace one two three",
    "<P\u0130>turkish dotted I is not ascii-case p one two three four",
    "<SCRIPT\u0130>x</SCRIPT> dotted-I after name is a word char? no — " +
      "\u0130 is not [a-zA-Z0-9_] so boundary holds one two",
    // markers inside already-scrubbed regions vs surviving ones
    "<style>x</style><!-- then a comment --> <p>one two three four</p>",
    "<script>hide <style>nested style</style> inside</script> a b c d",
    "<style>hide <script>nested script</script> inside</style> a b c d")

  test("scanner == regex chain on the adversarial corpus (minWords 1 and 4)") {
    diffExtract(4, adversarial)
    diffExtract(1, adversarial)
  }

  // --------------------------------------------------------- fuzz sweep

  private val fuzzTokens: Array[String] = Array(
    "<script", "</script", "<script>", "</script>", "</script >",
    "<scripts>", "<style", "</style", "<style>", "</style>", "<STYLE",
    "<ScRiPt", "</SCRIPT\t>", "<!--", "-->", "<!-- x -->", "<p", "<p>",
    "</p>", "<P>", "<pre>", "<predator>", "<div>", "</div>", "<br/>",
    "<li>", "<link>", "<tr>", "<track>", "<th>", "<thead>", "<table>",
    "<h1>", "<h3>", "<h7>", "<h16>", "<hr>", "<html>", "<head>",
    "<header>", "<form>", "<3>", "<//p>", "<", ">", "/", "=", "\"",
    "&amp;", "&lt;", "&gt;", "&nbsp;", "&quot;", "&#39;", "&apos;",
    "&copy;", "&amp;lt;", "&quo", ";", " ", "  ", "\t", "\n", "\r",
    "\u000B", "\f", "w", "word", "alpha beta", "x y z w v",
    "a>b", "a<b", "attr=\"val\"", "attr=\">\"", "_", "2")

  test("scanner == regex chain on 3000 seeded fuzz markups") {
    val rnd = new scala.util.Random(0x5eed2101)
    val docs = (0 until 3000).map { _ =>
      val n = 1 + rnd.nextInt(30)
      (0 until n).map(_ => fuzzTokens(rnd.nextInt(fuzzTokens.length)))
        .mkString
    }
    diffExtract(4, docs.take(1500))
    diffExtract(1, docs.drop(1500))
  }

  private val encAdversarial: Seq[String] = Seq(
    "clean text\twith\nlegal\rcontrols",
    "a\uFFFDb\uFFFDc \u0001mid\u009Fend \u007Fdel",
    "caf\u00C3\u00A9 isn\u00C3\u00A2t plain",
    "it\u00E2\u20AC\u2122s a caf\u00C3\u2030 here",
    // lead chars at end-of-input and before non-continuation chars
    "\u00C2", "\u00C3", "\u00E2", "x\u00C2", "x\u00C3y", "x\u00E2\u0080",
    "\u00E2\u0080\u0099", "\u00E2\u0080x", "\u00E2x\u0080",
    // continuation chars standing alone are C1 controls (counted+scrubbed)
    "\u0080\u0099\u009F", "a\u0080b",
    // moji immediately followed by more moji / controls / fffd
    "\u00C2\u0080\u00C2\u0080", "\u00C3\u00BF\uFFFD\u0007",
    "\u00C2\u20AC\u00E2\u2122\u2122", "\u00E2\u00C2\u0080",
    // fffd adjacent to everything
    "\uFFFD", "\uFFFD\uFFFD", "a\uFFFD\u0000b", "\u00C2\uFFFD",
    // boundary chars of the classes
    "\u0008\u0009\u000A\u000B\u000C\u000D\u000E\u001F\u0020\u007E" +
      "\u007F\u0080\u009F\u00A0\u00BF\u00C0",
    "", "plain ascii")

  test("enc scanner == regex pass on the adversarial corpus") {
    diffEnc(encAdversarial)
  }

  test("enc scanner == regex pass on 4000 seeded fuzz strings") {
    val pool: Array[Char] = Array(
      '\u00C2', '\u00C3', '\u00E2', '\uFFFD', '\u0000', '\u0007',
      '\u0009', '\u000B', '\u001F', '\u007F', '\u0080', '\u0099',
      '\u009F', '\u00A0', '\u00BF', '\u00C0', '\u20AC', '\u2122',
      '\u2019', '\u0178', '\u0153', 'a', 'b', ' ', '\n', 'Z')
    val rnd = new scala.util.Random(0x5eed2102)
    val docs = (0 until 4000).map { _ =>
      val n = rnd.nextInt(24)
      val sb = new StringBuilder
      (0 until n).foreach(_ => sb.append(pool(rnd.nextInt(pool.length))))
      sb.toString
    }
    diffEnc(docs)
  }
}
