package graft

import org.apache.spark.sql.functions._

import graft.functions.Gpt2Pretokenize.gpt2Pretokens
import graft.operators.TextOps

/** Exact-GPT-2 pretokenizer fixtures: the expected arrays below are
  * independently transcribed by hand-applying the published pattern
  * (`'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+`,
  * Radford et al. 2019 encoder.py — the `gpt2` pattern tiktoken
  * carries), NOT by running the expression and pasting its output. */
class Gpt2PretokensSpec extends SparkSpec {

  private def pre(inputs: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    inputs.toDF("text").select(gpt2Pretokens(col("text")).as("p"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
  }

  test("contractions split on the published suffix alternatives") {
    assert(pre(Seq(
      "don't stop",
      "I'll we've you're he's she'd I'm",
      "won't I'd've",
      // uppercase suffixes do NOT match the lowercase alternatives —
      // GPT-2's documented case-sensitivity: the apostrophe becomes its
      // own other-class pretoken and S continues as letters
      "IT'S")) == Seq(
      Seq("don", "'t", " stop"),
      Seq("I", "'ll", " we", "'ve", " you", "'re", " he", "'s", " she",
        "'d", " I", "'m"),
      Seq("won", "'t", " I", "'d", "'ve"),
      Seq("IT", "'", "S")))
  }

  test("letter/digit/other class splits with one optional leading space") {
    assert(pre(Seq(
      "Hello world",
      "abc123 def",
      "a 12",
      "Hello, world!",
      "...!!",
      "1234")) == Seq(
      Seq("Hello", " world"),
      Seq("abc", "123", " def"),
      Seq("a", " 12"),
      Seq("Hello", ",", " world", "!"),
      Seq("...!!"),
      Seq("1234")))
  }

  test("whitespace runs: all-but-last separates, trailing run survives") {
    assert(pre(Seq(
      "x  y", // inner double space: first space is its own pretoken
      "x \n y", // mixed run: " \n" separates, " y" keeps its space
      "a ", // trailing single space
      "a  ", // trailing run stays one pretoken
      "  lead")) == Seq(
      Seq("x", " ", " y"),
      Seq("x", " \n", " y"),
      Seq("a", " "),
      Seq("a", "  "),
      Seq(" ", " lead")))
  }

  test("unicode: \\s is White_Space, letters/emoji classes are unicode") {
    assert(pre(Seq(
      "café", // é is \p{L}
      "日本語 abc", // CJK letters
      "a b", // NBSP is unicode whitespace, not a letter-run space
      "hi 👍")) == Seq( // emoji = other-class, supplementary
      Seq("café"),
      Seq("日本語", " abc"),
      Seq("a", " ", "b"),
      Seq("hi", " 👍")))
  }

  test("tiling is lossless and empty input yields no pretokens") {
    import spark.implicits._
    val edge = Seq("", "   ", "don't  stop\n\nnow", "a b  c\t")
    val corpus = Tables.documents(spark, sfDir).select(col("text"))
      .as[String].collect().toSeq
    val bad = (edge ++ corpus).toDF("text")
      .select(col("text"), array_join(gpt2Pretokens(col("text")), "").as("j"))
      .filter(col("j") =!= col("text"))
    assert(bad.count() == 0, "pretokens must concatenate back to the input")
    assert(pre(Seq("")) == Seq(Seq.empty))
  }

  test("single-spaced ASCII agrees with the gate's parity-safe pattern") {
    import spark.implicits._
    // on the (single-0x20-spaced, no contraction/class-mix) shape the
    // gate corpus guarantees, both pretokenizers tile identically ONLY
    // for pure letter/digit words — assert agreement there, and show a
    // documented divergence case for the class-mixing pattern
    val df = Tables.documents(spark, sfDir).select(col("text"))
      .filter(col("text").rlike("^[A-Za-z0-9 ]*$") &&
        !col("text").rlike("  |^ | $") &&
        !col("text").rlike("[A-Za-z][0-9]|[0-9][A-Za-z]"))
    val n = df.count()
    assert(n > 0, "sanity: the gate corpus has single-spaced ASCII docs")
    val diverged = df.select(
        gpt2Pretokens(col("text")).as("g"),
        TextOps.bytePretokensOf(col("text"), gpt2Pre = false).as("b"))
      .filter(col("g") =!= col("b"))
    assert(diverged.count() == 0,
      "exact and parity-safe pretokenizers must agree on gate-shaped text")
    assert(pre(Seq("x2")) == Seq(Seq("x", "2")),
      "class mixing is exactly where the two patterns diverge")
  }

  test("SQL registration: graft_gpt2_pretokens matches the Column API") {
    import spark.implicits._
    val got = Seq("don't  stop").toDF("text")
      .selectExpr("graft_gpt2_pretokens(text) AS p")
      .collect()(0).getSeq[String](0).toSeq
    assert(got == Seq("don", "'t", " ", " stop"))
  }
}
