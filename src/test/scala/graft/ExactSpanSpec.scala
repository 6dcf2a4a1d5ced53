package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Exact suffix-automaton span specs (r12): randomized brute-force
  * parity of longestCommonRun, exact bounds on planted runs vs the
  * fixed-n shingle approximation's envelope, the periodic-text
  * adversary where stitching overstates and the exact pass corrects,
  * and the c69 cross-validation (every cluster pair must share an
  * exact >= 20-token run — membership is defined by one). */
class ExactSpanSpec extends SparkSpec {

  /** O(|a|·|b|) DP longest common substring — the independent reference
    * (shares nothing with the automaton). */
  private def bruteLcs(a: IndexedSeq[String],
                       b: IndexedSeq[String]): (Int, Int, Int) = {
    var best = (0, -1, -1)
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length) {
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        val l = dp(i)(j)
        // same tie order as the automaton: longest, then smallest startB,
        // then smallest startA
        val cand = (l, i - l, j - l)
        if (l > best._1 ||
            (l == best._1 && (cand._3 < best._3 ||
              (cand._3 == best._3 && cand._2 < best._2)))) best = cand
      }
    }
    best
  }

  test("longestCommonRun equals the DP brute force on 300 random pairs") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 300) {
      val alpha = Vector("a", "b", "c")
      def arr(n: Int) = IndexedSeq.fill(n)(alpha(rnd.nextInt(alpha.size)))
      val a = arr(1 + rnd.nextInt(40))
      val b = arr(1 + rnd.nextInt(40))
      val got = Dedup.longestCommonRun(a, b)
      val want = bruteLcs(a, b)
      // length must ALWAYS agree; the automaton's startB tie-break is
      // first-longest-wins which matches the DP's ordering above
      assert(got._1 == want._1, s"trial $trial: len ${got._1} != ${want._1}")
      if (got._1 > 0) {
        assert(a.slice(got._2, got._2 + got._1) == b.slice(got._3, got._3 + got._1),
          s"trial $trial: reported slices differ")
        assert(got._3 == want._3, s"trial $trial: startB tie-break diverged")
        // maximality: the run extends in neither direction
        assert(got._2 + got._1 >= a.length || got._3 + got._1 >= b.length ||
          a(got._2 + got._1) != b(got._3 + got._1), s"trial $trial: extendable right")
        assert(got._2 == 0 || got._3 == 0 ||
          a(got._2 - 1) != b(got._3 - 1), s"trial $trial: extendable left")
      } else assert(got == ((0, -1, -1)))
    }
  }

  test("planted run: exact pass reports the run to the token; shingle span within its envelope") {
    import spark.implicits._
    val n = 5
    val run = (0 until 25).map(i => s"run$i")
    val aToks = (0 until 30).map(i => s"xa$i") ++ run ++ (0 until 10).map(i => s"ya$i")
    val bToks = (0 until 7).map(i => s"xb$i") ++ run ++ (0 until 20).map(i => s"yb$i")
    val got = Dedup.longestCommonRun(aToks.toIndexedSeq, bToks.toIndexedSeq)
    assert(got == ((25, 30, 7)), s"planted run mis-measured: $got")
    // the fixed-n approximation on the same pair: an ISOLATED planted run
    // yields a span of exactly the run (both boundaries land within the
    // ±(n−1) envelope, and here exactly)
    val docs = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
    val spans = Dedup.dupSpans(docs, n)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("span_start"), r.getAs[Long]("span_tokens")))
    assert(spans.toSet == Set((1L, 30L, 25L), (2L, 7L, 25L)),
      s"isolated planted run must span exactly in the shingle view: ${spans.toSeq}")
  }

  test("periodic-text adversary: stitching overstates, the exact pass corrects") {
    import spark.implicits._
    val n = 5
    val period = (0 until n).map(i => s"p$i")
    // A repeats the period 6× (30 tokens); B holds only 2 periods (10).
    // every n-shingle of A's region is one of the 5 rotations, all present
    // in B — so the shingle view marks A's WHOLE region duplicated, while
    // the longest true common run is |B| = 10
    val aToks = (0 until 4).map(i => s"ha$i") ++
      Seq.fill(6)(period).flatten ++ (0 until 4).map(i => s"ta$i")
    val bToks = (0 until 4).map(i => s"hb$i") ++
      Seq.fill(2)(period).flatten ++ (0 until 4).map(i => s"tb$i")
    val exact = Dedup.longestCommonRun(aToks.toIndexedSeq, bToks.toIndexedSeq)
    assert(exact._1 == 10, s"true longest run must be |B region| = 10: $exact")
    val docs = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
    val spanA = Dedup.dupSpans(docs, n)
      .filter(col("doc_id") === 1L)
      .collect().map(r => r.getAs[Long]("span_tokens")).max
    assert(spanA == 30,
      s"the shingle view must stitch A's whole periodic region: $spanA")
    assert(spanA > exact._1,
      "the adversary must actually demonstrate the overstatement")
  }

  test("Main spans --exact: CLI output equals exactClusterSpans") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-cli-exact-").toString + "/spans"
    Main.main(Array("spans", "--exact", "--in", sfDir, "--out", out))
    val got = spark.read.parquet(out)
      .orderBy("cluster_id", "doc_a", "doc_b").collect().map(_.toSeq)
    val want = Dedup.exactClusterSpans(spark, sfDir).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq, "CLI --exact diverges from the operator")
    assert(got.nonEmpty)
  }

  test("c69 cross-validation: every cluster pair shares an exact run >= strongN") {
    val strongN = 20
    val rows = Dedup.exactClusterSpans(spark, sfDir, strongN).collect()
    assert(rows.nonEmpty, "gate corpus has non-singleton clusters (c69 spec)")
    rows.foreach { r =>
      val len = r.getAs[Long]("len_exact")
      assert(len >= strongN,
        s"cluster pair (${r.getAs[Long]("doc_a")}, ${r.getAs[Long]("doc_b")}) " +
          s"shares only a $len-token run — but a c69 edge IS a shared " +
          s"$strongN-shingle")
    }
    // and the reported positions are honest: re-read both texts and check
    val docs = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toIndexedSeq).toMap
    rows.foreach { r =>
      val (a, b) = (docs(r.getAs[Long]("doc_a")), docs(r.getAs[Long]("doc_b")))
      val (len, sa, sb) = (r.getAs[Long]("len_exact").toInt,
        r.getAs[Long]("start_a").toInt, r.getAs[Long]("start_b").toInt)
      assert(a.slice(sa, sa + len) == b.slice(sb, sb + len),
        s"pair (${r.getAs[Long]("doc_a")}, ${r.getAs[Long]("doc_b")}): " +
          "reported run does not match")
    }
  }
}
