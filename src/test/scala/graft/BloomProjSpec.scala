package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomFunctions, VectorFunctions}
import graft.operators.{Dedup, Relational, Similarity, TextOps}

/** Specs for the bloom-prefilter expression (c27/d8), the random
  * projection (c28), and the correlated-subquery query (b19). */
class BloomProjSpec extends SparkSpec {

  test("bloom filter has no false negatives and a bounded false-positive rate") {
    import spark.implicits._
    val items = (0 until 2000).map(i => s"item-$i")
    val bytes = BloomFunctions.buildFilter(items.toDF("s"), "s",
      expectedItems = 4096, fpp = 0.01)
    val hits = items.toDF("s")
      .filter(BloomFunctions.mightContain(col("s"), bytes)).count()
    assert(hits == 2000, "every inserted item must test positive (no false negatives)")
    val fp = (0 until 20000).map(i => s"other-$i").toDF("s")
      .filter(BloomFunctions.mightContain(col("s"), bytes)).count()
    assert(fp < 1000, s"false-positive count out of bounds: $fp / 20000")
  }

  test("c27 output is identical to c24 — the bloom prefilter is lossless") {
    val exact = TextOps.c24Decontam(spark, sfDir).collect().toSeq
    val bloom = TextOps.c27BloomDecontam(spark, sfDir).collect().toSeq
    assert(bloom == exact)
  }

  test("c27's bloom pass prunes most candidate shingles before the verify join") {
    val sh8 = spark.read.parquet(Dedup.shingleTablePath(spark, sfDir, n = 8))
    val evalShingles = sh8.filter(col("doc_id") % 50 === 0)
      .select(col("shingle")).distinct()
    val bytes = BloomFunctions.buildFilter(evalShingles, "shingle", 1L << 16, 0.01)
    val candidates = sh8.filter(col("doc_id") % 50 =!= 0)
    val total = candidates.count()
    val passed = candidates
      .filter(BloomFunctions.mightContain(col("shingle"), bytes)).count()
    val trueHits = candidates.join(evalShingles, "shingle").count()
    assert(passed >= trueHits, "prefilter may never drop a true match")
    assert(passed < total / 2,
      s"prefilter should prune most shingles: passed $passed of $total")
  }

  test("c28 projection matches a direct fixed-point computation bit-for-bit") {
    val planes = VectorFunctions.lshPlanes(16, 64, seed = "graft:rp")
    val emb = Tables.embeddings(spark, sfDir).limit(20).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def fixed(x: Double): Long = {
      val ax = math.abs(x * 10000.0)
      val fl = math.floor(ax)
      val r = fl.toLong + (if (ax - fl >= 0.5) 1L else 0L)
      if (x < 0) -r else r
    }
    val got = Similarity.c28RandomProjection(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    emb.foreach { case (vecId, v) =>
      planes.zipWithIndex.foreach { case (p, j) =>
        val expect = v.indices.map(d => fixed(v(d)) * p(d)).sum
        assert(got((vecId, j.toLong)) == expect,
          s"vec $vecId plane $j: got ${got((vecId, j.toLong))}, want $expect")
      }
    }
  }

  test("c28 is a JL embedding: cosine distortion is bounded and shrinks as O(1/sqrt(planes))") {
    // The JL guarantee is DISTORTION, not top-k recall — on this corpus
    // the true neighbors are ~2.5 sigma outliers of an isotropic cloud
    // (max cosine ~0.33), so any low-dim projection's recall is noise;
    // what must hold is |projected cosine − full cosine| ~ 1/sqrt(planes):
    // RMS error at 16 planes is theory ~sqrt((1−cos²)/16) ≈ 0.25, and
    // quadrupling the planes must halve it.
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def projections(nPlanes: Int): Map[Long, Array[Double]] =
      Similarity.c28RandomProjection(spark, sfDir, nPlanes = nPlanes).collect()
        .groupBy(_.getLong(0))
        .map { case (v, rs) => v -> rs.sortBy(_.getLong(1)).map(_.getLong(2).toDouble).toArray }
    val emb = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val pairs = for (q <- 0L until 5L; c <- 5L until 105L) yield (q, c)
    def rms(proj: Map[Long, Array[Double]]): Double = {
      val errs = pairs.map { case (q, c) =>
        val e = cos(proj(q), proj(c)) - cos(emb(q), emb(c))
        e * e
      }
      math.sqrt(errs.sum / errs.size)
    }
    val rms16 = rms(projections(16))
    val rms64 = rms(projections(64))
    info(f"c28 cosine RMS distortion: 16 planes $rms16%.3f, 64 planes $rms64%.3f")
    assert(rms16 < 0.4, s"16-plane distortion out of JL range: $rms16")
    assert(rms64 < rms16 * 0.75,
      s"quadrupling planes must shrink distortion ~2x: $rms16 -> $rms64")
  }

  test("c29 hard negatives: labels always differ and scores are the true top-k among mismatches") {
    val e = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val byId = e.map(t => t._1 -> t).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = Similarity.c29HardNegatives(spark, sfDir).collect()
    assert(got.length == 25, "5 queries x top-5")
    got.foreach { r =>
      val (_, qv, qLabel) = byId(r.getAs[Long]("query_id"))
      val (_, cv, cLabel) = byId(r.getAs[Long]("neighbor_id"))
      assert(cLabel != qLabel, "a hard negative must have a different label")
      assert(r.getAs[Long]("neg_label") == cLabel.toLong)
      assert(math.abs(r.getAs[Double]("cosine_r") - cos(qv, cv)) < 1e-6)
    }
    // ground-truth top-5 among label-mismatched candidates, per query
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val (_, qv, qLabel) = byId(q)
      val expect = e.filter(t => t._1 >= 5 && t._3 != qLabel)
        .map(t => (t._1, cos(qv, t._2)))
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
      val gotIds = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("neighbor_id")).toSeq
      assert(gotIds == expect, s"query $q: $gotIds != $expect")
    }
  }

  test("c30 cluster split: near-dups co-travel, singletons match c14") {
    val split = Dedup.c30ClusterSplit(spark, sfDir)
    // one split per cluster, by construction of the canonical join
    val multi = split.groupBy("cluster_id")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(multi == 0, "every cluster must land in exactly one split")
    // verified near-dup pairs (c19's edge set) never straddle splits
    val pairs = Dedup.c2DedupMinhash(spark, sfDir).filter(col("jaccard") >= 0.5)
    val a = split.select(col("doc_id").as("doc_a"), col("split").as("split_a"))
    val b = split.select(col("doc_id").as("doc_b"), col("split").as("split_b"))
    val straddle = pairs.join(a, "doc_a").join(b, "doc_b")
      .filter(col("split_a") =!= col("split_b")).count()
    assert(straddle == 0, "near-dup pairs must share a split (no leakage)")
    assert(pairs.count() > 0, "corpus must contain verified near-dup pairs")
    // singleton clusters (own canonical) inherit exactly c14's split
    val singletons = split.filter(col("doc_id") === col("cluster_id"))
      .select("doc_id", "split")
    val c14 = TextOps.c14TrainSplit(spark, sfDir)
    val diff = singletons.join(c14.withColumnRenamed("split", "c14_split"), "doc_id")
      .filter(col("split") =!= col("c14_split")).count()
    assert(diff == 0, "singleton docs must split exactly like c14")
    // all three splits are populated on this corpus
    assert(split.select("split").distinct().count() == 3)
  }

  test("c31 kmeans step: exact parity with a direct Lloyd-iteration re-derivation") {
    val e = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def fx(x: Double): Long = math.round(x * 10000.0)
    // label-initialized centroids: mean of fixed-point coords per label
    val centroids = e.groupBy(_._3).map { case (label, vs) =>
      val dim = vs.head._2.length
      label -> Array.tabulate(dim)(d => vs.map(v => fx(v._2(d))).sum.toDouble / 10000.0 / vs.length)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // assignment: argmax of the 6-dp-rounded cosine, ties break on cell
    val assigned = e.map { case (id, v, _) =>
      val best = centroids.toSeq.map { case (c, cv) => (c, r6(cos(v, cv))) }
        .sortBy { case (c, s) => (-s, c) }.head._1
      (id, v, best)
    }
    val expect = assigned.groupBy(_._3).flatMap { case (cell, vs) =>
      val dim = vs.head._2.length
      (0 until dim).map(p =>
        (cell.toLong, p.toLong) -> (vs.size.toLong, vs.map(v => fx(v._2(p))).sum))
    }
    val got = Similarity.c31KmeansStep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.size == expect.size)
    expect.foreach { case (k, v) =>
      assert(got(k) == v, s"cell/pos $k: got ${got(k)}, want $v")
    }
    // the step must do real work: membership after one iteration differs
    // from the label partition for at least one cell on this corpus
    val labelCounts = e.groupBy(_._3).map { case (l, vs) => l.toLong -> vs.size.toLong }
    val memberCounts = got.collect { case ((cell, 0L), (n, _)) => cell -> n }
    assert(memberCounts != labelCounts,
      "Lloyd assignment should move at least one vector off its label cell")
  }

  test("trainCodebook round 1 equals c31's sums; more rounds keep a valid shrinking-or-stable codebook") {
    val step = Similarity.c31KmeansStep(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    // expected round-1 centroids from c31's exact numerators/denominators
    val expect = step.map { case (cell, rows) =>
      cell -> rows.sortBy(_.getLong(1))
        .map(r => r.getLong(3).toDouble / 10000.0 / r.getLong(2)).toArray
    }
    val cb1 = Similarity.trainCodebook(spark, sfDir, rounds = 1).collect()
      .map(r => r.getInt(0).toLong -> r.getSeq[Double](1).toArray).toMap
    assert(cb1.keySet == expect.keySet)
    cb1.foreach { case (cell, cv) =>
      assert(cv.toSeq == expect(cell).toSeq, s"cell $cell centroid mismatch")
    }
    val cb3 = Similarity.trainCodebook(spark, sfDir, rounds = 3).collect()
    assert(cb3.nonEmpty && cb3.length <= cb1.size,
      "cells may only die, never appear")
    assert(cb3.forall(_.getSeq[Double](1).forall(v => !v.isNaN && !v.isInfinite)))
  }

  test("generic-k IVF: deterministic init, exact scores, recall grows with nprobe") {
    val brute5 = Similarity.c5AnnBrute(spark, sfDir, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val bruteAll = Similarity.c5AnnBrute(spark, sfDir, k = 1000).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine_r"))
      .toMap
    val init = Similarity.initCodebook(spark, sfDir, cells = 16)
    assert(init.count() == 16 &&
      init.select("cell").distinct().count() == 16,
      "init must emit 16 distinct cells")
    def run(nprobe: Int) = Similarity.annIvfGeneric(
      spark, sfDir, cells = 16, k = 5, nprobe = nprobe, rounds = 2).collect()
    val r1 = run(1)
    assert(r1.nonEmpty)
    // deterministic end-to-end: init is content-hash seeded, Lloyd is
    // exact — a re-run (fresh scratch) must reproduce every row
    assert(r1.map(_.toString).toSeq == run(1).map(_.toString).toSeq,
      "generic-k IVF must be deterministic across runs")
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      rows.foreach { r =>
        val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        assert(bruteAll.contains(key), s"$key not in brute-force universe")
        assert(math.abs(bruteAll(key) - r.getAs[Double]("cosine_r")) < 1e-9,
          "cell restriction must not change the score")
      }
      val got = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      brute5.count(got.contains).toDouble / brute5.length
    }
    val rec1 = recallOf(r1)
    val rec4 = recallOf(run(4))
    info(f"generic-k (16 cells, 2 rounds) recall@5: nprobe=1 $rec1%.2f, nprobe=4 $rec4%.2f")
    assert(rec4 >= rec1, "probing more cells must not lose neighbors")
    assert(r1.map(_.getAs[Int]("cell")).distinct.length <= 16)
  }

  test("two-level assignment: shuffle-free plan, high agreement with flat argmax") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val fine = Similarity.trainCodebook(spark, sfDir, rounds = 1,
      Similarity.initCodebook(spark, sfDir, cells = 16))
    // a TRAINED coarse quantizer (standard IVF practice): Lloyd adapts the
    // super-cells to the data geometry so fine cells nest under them
    val coarse = Similarity.trainCodebook(spark, sfDir, rounds = 2,
      Similarity.initCodebook(spark, sfDir, cells = 4))
    val twoLevel = Similarity.assignCellsTwoLevel(e, fine, coarse)
    val tl0 = twoLevel.collect()
    // stateless end-to-end FOR THE ROW PATH: both argmax passes + the
    // sub-codebook join ride broadcasts. The only exchanges allowed are
    // k-row codebook preparation INSIDE broadcast subtrees.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    def rowSideShuffles(p: SparkPlan): Int = p match {
      case _: BroadcastExchangeExec => 0
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        rowSideShuffles(a.executedPlan)
      case s: ShuffleExchangeExec => 1 + s.children.map(rowSideShuffles).sum
      case other => other.children.map(rowSideShuffles).sum
    }
    val nShuffles = rowSideShuffles(twoLevel.queryExecution.executedPlan)
    assert(nShuffles == 0,
      s"two-level assignment must not shuffle vector rows, found $nShuffles exchanges")
    val tl = tl0
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    val flat = Similarity.assignCells(e, fine, maxProbe = 1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    assert(tl.size == flat.size, "every vector must land in exactly one cell")
    val agree = tl.count { case (id, c) => flat(id) == c }.toDouble / tl.size
    info(f"two-level vs flat assignment agreement: $agree%.2f (16 fine / 4 coarse cells)")
    // hierarchical quantization is approximate, but on a trained codebook
    // most rows' nearest fine cell lives under their coarse cell
    assert(agree >= 0.5, f"agreement $agree%.2f collapsed — routing is broken")
  }

  test("trainCodebook results stay consumable after a later call (scratch isolation)") {
    // regression: scratch paths carry a per-call run id — without it the
    // second call clears and rewrites the parquet backing the FIRST
    // call's lazy DataFrame, so consuming it afterwards read the other
    // run's data (or threw mid-clear)
    val first = Similarity.trainCodebook(spark, sfDir, rounds = 1)
    val before = first.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val second = Similarity.trainCodebook(spark, sfDir, rounds = 2)
    assert(second.count() > 0)
    val after = first.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(after == before, "earlier result must be unaffected by the later call")
  }

  test("c32 corpus stats equal a direct recomputation") {
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "source", "n_chars", "text").collect()
    val expect = docs.groupBy(r => (r.getString(0), r.getString(1))).map { case (k, rs) =>
      // split(" ", -1): Spark's split keeps trailing empties (limit -1)
      val toks = rs.map(_.getString(3).split(" ", -1).length.toLong)
      k -> ((rs.length.toLong, toks.sum, rs.map(_.getLong(2)).sum, toks.min, toks.max))
    }
    val got = TextOps.c32CorpusStats(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum == docs.length.toLong)
  }

  test("b19 equals its window-function reformulation and plans no cartesian") {
    val got = Relational.b19Correlated(spark, sfDir)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "correlated subqueries must decorrelate to aggregate + equi-join")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("p_brand")
    val ref = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"),
        round(col("p_retailprice") * 100).cast("bigint").as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum("cents").over(w))
      .filter(col("cents") * 10 * col("n") > col("s") * 12)
      .select("p_partkey", "p_brand", "cents")
      .orderBy("p_partkey").collect().toSeq
    assert(got.collect().toSeq == ref)
  }
}
