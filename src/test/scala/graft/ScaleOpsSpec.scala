package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

/** Scale-utility specs: salted aggregation equivalence and shuffle-free
  * bucketed joins (SURVEY §4). */
class ScaleOpsSpec extends SparkSpec {

  test("saltedAgg equals the direct aggregation on a skewed key") {
    // events.user_id is naturally repeated; treat it as the hot key
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy("user_id")
      .agg(sum("value").as("sum_value"), count(lit(1)).as("count"),
        count(col("event_type")).as("count_event_type"),
        max("value").as("max_value"))
    val salted = ScaleOps.saltedAgg(ev, Seq("user_id"), salts = 7,
      ("sum", "value"), ("count", "*"), ("count", "event_type"), ("max", "value"))
    val joined = direct.as("d").join(salted.as("s"), "user_id")
      .filter(abs(col("d.sum_value") - col("s.sum_value")) > 1e-9 ||
        col("d.count") =!= col("s.count") ||
        col("d.count_event_type") =!= col("s.count_event_type") ||
        col("d.max_value") =!= col("s.max_value"))
    assert(joined.count() == 0)
    assert(direct.count() == salted.count())
  }

  test("keylessRangeJoin matches the nested-loop result and plans no nested loop") {
    import graft.operators.Relational
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts_us").as("click_ts"))
      .limit(200)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts_us").as("purchase_ts"))
    val windowUs = 60L * 1000 * 1000 // 1 minute: keeps the pair count sane
    val bucketed = Relational.keylessRangeJoin(clicks, buys,
      "click_ts", "purchase_ts", windowUs)
    // no equality key anywhere: the reference result is the nested loop
    val naive = clicks.join(buys,
      col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + windowUs)
    assert(bucketed.exceptAll(naive).count() == 0 &&
      naive.exceptAll(bucketed).count() == 0,
      "bucketed keyless range join must equal the nested-loop result")
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"keyless range join must be an equi-join on the time bucket:\n$plan")
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "sanity: the naive predicate really does plan a nested loop")
  }

  test("eval-confined quadratic truth sides refuse over-cap corpora at runtime (r15)") {
    import spark.implicits._
    import graft.operators.{Dedup, Similarity}
    // c83's truth guard: one shingle shared by 6 docs, cap 5 → refusal
    val hot = (1L to 6L).map(d => (d, "the-same-shingle")).toDF("doc_id", "shingle")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.requireTruthDfCap(hot, cap = 5L)
    }
    assert(e1.getMessage.contains("eval corpus/sample"), e1.getMessage)
    Dedup.requireTruthDfCap(hot, cap = 6L) // at the cap: allowed
    // c72's truth guard: a frame over the row cap refuses BEFORE the
    // cross join is planned (the count() fires first)
    val big = spark.range(0, Similarity.ExactPairsRowCap + 1)
      .select(col("id").as("vec_id"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.exactPairsOn(big, 0.3)
    }
    assert(e2.getMessage.contains("eval sample"), e2.getMessage)
    // the production gates stay under their caps on the test corpus
    assert(Dedup.c83MinhashRecall(spark, sfDir).count() == 1)
  }

  test("new c-series operators keep scale-safe plan shapes") {
    import graft.operators.{Dedup, TextOps}
    // c19: candidate generation + clustering must never plan a cross join
    val c19 = Dedup.c19DedupCluster(spark, sfDir)
    val p19 = c19.queryExecution.executedPlan.toString
    assert(!p19.contains("CartesianProduct") && !p19.contains("BroadcastNestedLoopJoin"),
      s"c19 must stay equi-join only:\n$p19")
    // c20/c21: single-scan shapes, whole-stage codegen'd projections
    // (run first: AQE only materializes codegen spans in the final plan)
    val c20 = TextOps.c20PiiScrub(spark, sfDir)
    c20.collect()
    val p20 = sansFanOut(c20.queryExecution.executedPlan.toString)
    // whole-stage codegen renders as a "*(n) " stage prefix in plan strings
    assert("""\*\(\d+\) Project""".r.findFirstIn(p20).nonEmpty,
      s"c20's projection must be inside whole-stage codegen:\n$p20")
    assert(!p20.contains("Exchange hashpartitioning"),
      s"c20 is per-row — no shuffle before the gate sort:\n$p20")
    val p21 = TextOps.c21RepetitionRatio(spark, sfDir).queryExecution.executedPlan.toString
    assert(!p21.contains("CartesianProduct") && !p21.contains("BroadcastNestedLoopJoin"),
      s"c21 joins on doc_id only:\n$p21")
    // native simhash: one codegen'd projection, no explode/aggregate
    val pSim = Dedup.simhashOf(Tables.documents(spark, sfDir).select("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!pSim.contains("Generate explode") && !pSim.contains("HashAggregate"),
      s"native simhash must not explode or aggregate:\n$pSim")
  }

  test("r14 rows keep scale-safe plan shapes: broadcast stage-2, row-local scoring, equi-join-only containment") {
    import graft.operators.{Dedup, Dsir, Similarity}
    // c79: the stage-2 exact re-rank joins must BROADCAST the
    // (queries·shortlist)-row shortlist and query sides — the corpus is
    // probed, never shuffled on vec_id; and no cross join anywhere (the
    // only ADC cross-join partner is the 5-row broadcast query side)
    val p79 = sansFanOut(Similarity.c79ExactRerank(spark, sfDir)
      .queryExecution.executedPlan.toString)
    assert(p79.contains("BroadcastHashJoin"),
      s"c79 stage 2 must broadcast the shortlist:\n$p79")
    assert(!p79.contains("CartesianProduct"),
      s"c79 must not plan a cartesian:\n$p79")
    assert(!p79.contains("Exchange hashpartitioning(neighbor_id"),
      s"c79 must not shuffle the corpus on vec_id:\n$p79")
    // c80: scoring is ONE row-local fold — no shuffle at all before the
    // gate sort (the artifact rides as plan literals)
    val art = Dsir.trainDsir(spark, sfDir)
    val p80 = sansFanOut(Dsir.weightsOf(Dsir.scoreDocs(
        Tables.documents(spark, sfDir), art))
      .queryExecution.executedPlan.toString)
    assert(!p80.contains("Exchange hashpartitioning"),
      s"c80 scoring is row-local — no shuffle:\n$p80")
    assert(!p80.contains("Generate explode"),
      s"c80 scores via an array fold, never a token explode:\n$p80")
    // c81: candidates + verify are equi-joins only — the containment
    // relation must never fall back to cartesian or nested-loop
    val p81 = Dedup.c81ContainmentDedup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p81.contains("CartesianProduct") &&
      !p81.contains("BroadcastNestedLoopJoin"),
      s"c81 must stay equi-join only:\n$p81")
    // c82: the per-cluster argmax must be a PARTITIONED window (a global
    // one would single-partition the corpus) and no cartesian anywhere.
    // (A BroadcastNestedLoopJoin IS present and fine: c41's 1-row
    // corpus-total broadcast — the c45 1-row-aggregate shape.)
    val p82 = Dedup.c82BestOfCluster(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p82.contains("CartesianProduct"),
      s"c82 must not plan a cartesian:\n$p82")
    // walk the LOGICAL plan (the physical string truncates on wide
    // plans): the argmax window must carry a partition spec — a global
    // window would single-partition the corpus
    val windows = Dedup.c82BestOfCluster(spark, sfDir)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.nonEmpty, "c82 must rank via a window")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"c82 window must partition by cluster_id, never globally: $w"))
  }

  test("c85 no-window global rank equals the window formulation and plans no window") {
    import graft.operators.{Curriculum, TextOps}
    import org.apache.spark.sql.expressions.Window
    val got = Curriculum.c85GlobalRank(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("global_rank")).toMap
    // the single-partition reference formulation (fine at spec scale,
    // fatal at corpus scale — which is the point of c85)
    val w = Window.orderBy(desc("mean_prob_r"), asc("doc_id"))
    val want = TextOps.c41FreqScore(spark, sfDir)
      .select(col("doc_id"), col("mean_prob_r"))
      .withColumn("global_rank", row_number().over(w).cast("bigint"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("global_rank")).toMap
    assert(got == want, "zipWithIndex ranks must equal the window reference")
    assert(got.values.toSeq.sorted == (1L to got.size).toSeq,
      "global_rank must be a permutation of 1..n")
    val plan = Curriculum.c85GlobalRank(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"c85 must not plan the single-partition window:\n$plan")
  }

  test("c86 curriculum: exact deciles over rank order, train_pos permutes, intra-phase md5 shuffle") {
    import graft.operators.Curriculum
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ranks = Curriculum.c85GlobalRank(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("global_rank")).toMap
    val n = ranks.size
    val phaseOf = ranks.map { case (id, rk) => id -> (rk - 1) * 10 / n }
    val skeyOf = ranks.keys.map(id => id -> md5hex(s"curriculum:$id")).toMap
    val expectedPos = ranks.keys.toSeq
      .sortBy(id => (phaseOf(id), skeyOf(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val got = Curriculum.c86Curriculum(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("phase"), r.getAs[String]("skey"),
          r.getAs[Long]("train_pos")))).toMap
    assert(got.size == n)
    got.foreach { case (id, (ph, sk, pos)) =>
      assert(ph == phaseOf(id), s"doc $id phase")
      assert(sk == skeyOf(id), s"doc $id shuffle key")
      assert(pos == expectedPos(id), s"doc $id train_pos")
    }
    // exact-decile sizes: every phase holds floor(n/10) or floor(n/10)+1
    val sizes = got.values.groupBy(_._1).view.mapValues(_.size).toMap
    sizes.values.foreach(s =>
      assert(s == n / 10 || s == n / 10 + 1, s"phase sizes $sizes"))
    // the shuffle must do something: within some phase, train_pos order
    // differs from quality-rank order
    val reordered = got.keys.groupBy(got(_)._1).exists { case (_, ids) =>
      val byPos = ids.toSeq.sortBy(got(_)._3)
      val byRank = ids.toSeq.sortBy(ranks)
      byPos != byRank
    }
    assert(reordered, "intra-phase order must be shuffled, not quality-sorted")
  }

  test("co-bucketed tables join without any shuffle exchange") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ScaleOps.writeBucketed(
        Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice"),
        "li_bucketed", "l_orderkey", buckets = 8)
      ScaleOps.writeBucketed(
        Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
        "o_bucketed", "o_orderkey", buckets = 8)
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expect = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("c96/c97 domain curation: extraction round-trips, caps bind, blocklist exact") {
    import graft.operators.Curation
    // the derived provenance extraction recovers exactly the source-based
    // registrable domain for every doc — the regex ran over a messy URL
    val prov = Curation.provenance(spark, sfDir)
      .select("doc_id", "url", "domain").collect()
    assert(prov.nonEmpty)
    prov.foreach { r =>
      val url = r.getAs[String]("url")
      assert(url.startsWith("https://www.") && url.contains("?ref="),
        s"derived url lost its messy parts: $url")
      val host = url.stripPrefix("https://").takeWhile(_ != '/')
      assert(r.getAs[String]("domain") == host.stripPrefix("www."),
        s"extraction diverged for $url")
    }
    // c96: salting is invisible (salts=1 degenerates to the plain window)
    val salted = Curation.c96DomainCap(spark, sfDir, k = 10, salts = 8)
    val plain = Curation.c96DomainCap(spark, sfDir, k = 10, salts = 1)
    assert(salted.collect().toSeq == plain.collect().toSeq,
      "salting changed the selected per-domain top-k")
    val rows = salted.collect()
    rows.groupBy(_.getAs[String]("domain")).foreach { case (dom, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq ==
        (1L to sorted.length).toSeq, s"ranks not dense for $dom")
      assert(sorted.length <= 10, s"cap exceeded for $dom")
    }
    // every kept doc outscores (or tie-breaks below) every dropped doc of
    // its domain — the cap keeps the BEST k, not an arbitrary k
    val kept = rows.map(r => (r.getAs[String]("domain"),
      r.getAs[Long]("doc_id"))).toSet
    val worstKept = rows.groupBy(_.getAs[String]("domain")).map { case (d, rs) =>
      d -> rs.map(r => (r.getAs[Double]("mean_prob_r"),
        -r.getAs[Long]("doc_id"))).min
    }
    Curation.provenance(spark, sfDir).select("doc_id", "domain")
      .join(graft.operators.TextOps.c41FreqScore(spark, sfDir)
        .select("doc_id", "mean_prob_r"), "doc_id")
      .collect()
      .filterNot(r => kept((r.getAs[String]("domain"), r.getAs[Long]("doc_id"))))
      .foreach { r =>
        val d = r.getAs[String]("domain")
        val dropped = (r.getAs[Double]("mean_prob_r"), -r.getAs[Long]("doc_id"))
        assert(Ordering[(Double, Long)].lteq(dropped, worstKept(d)),
          s"dropped doc ${r.getAs[Long]("doc_id")} outranks a kept doc in $d")
      }
    // c97: blocklist flags exactly the policy list; shares sum to ~1
    val stats = Curation.c97DomainStats(spark, sfDir).collect()
    assert(stats.filter(_.getAs[Boolean]("is_blocked"))
      .map(_.getAs[String]("domain")).toSet ==
      Curation.DefaultBlocklist.toSet)
    val shareSum = stats.map(_.getAs[Double]("share_r")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"domain shares sum to $shareSum")
  }

  test("c50 salted grouped top-k equals the plain single-window reference") {
    import graft.operators.TextOps
    val salted = TextOps.c50GroupBudget(spark, sfDir, k = 50, salts = 8)
    // salts = 1 degenerates the local pass to the plain per-lang window:
    // the un-salted reference computed by the same code path
    val plain = TextOps.c50GroupBudget(spark, sfDir, k = 50, salts = 1)
    assert(salted.collect().toSeq == plain.collect().toSeq,
      "salting changed the selected per-group top-k")
    val rows = salted.collect()
    assert(rows.nonEmpty)
    // per-lang: ranks are 1..n(lang) with n <= k, scores non-increasing,
    // doc_id tie-break ascending within equal scores
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to sorted.length).toSeq,
        s"ranks not dense for $lang")
      assert(sorted.length <= 50, s"budget exceeded for $lang")
      val scores = sorted.map(_.getAs[Double]("mean_prob_r")).toSeq
      assert(scores == scores.sorted(Ordering[Double].reverse),
        s"scores not non-increasing for $lang")
      sorted.sliding(2).foreach {
        case Array(a, b) if a.getAs[Double]("mean_prob_r") == b.getAs[Double]("mean_prob_r") =>
          assert(a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id"),
            s"tie not broken by doc_id for $lang")
        case _ =>
      }
    }
  }

  test("diverse-media payloads (r19): deterministic, container-valid, " +
    "pair density collapses to the planted structure") {
    import graft.operators.Multimodal
    // deterministic per (doc_id, position) — rehearsals must reproduce
    assert(Multimodal.pgmPayload(7L, diverse = true).toSeq ==
      Multimodal.pgmPayload(7L, diverse = true).toSeq)
    assert(Multimodal.wavPayload(8L, diverse = true).toSeq ==
      Multimodal.wavPayload(8L, diverse = true).toSeq)
    assert(Multimodal.y4mPayload(9L, diverse = true).toSeq ==
      Multimodal.y4mPayload(9L, diverse = true).toSeq)
    // and actually different from the default closed form
    assert(Multimodal.pgmPayload(7L, diverse = true).toSeq !=
      Multimodal.pgmPayload(7L, diverse = false).toSeq)
    def pairsAtH3(hs: Seq[Long]): Int =
      (for {
        i <- hs.indices; j <- (i + 1) until hs.size
        if java.lang.Long.bitCount(hs(i) ^ hs(j)) <= 3
      } yield 1).size
    // image: the REAL PGM parse + gradient hash accepts diverse payloads
    // (container validity), and the ≤3-hamming pair graph collapses from
    // the default mode's near-complete density to ~the planted dups (none
    // here — distinct ids) — the §8p pair-surface realism knob
    val imgIds = (0L until 900L by 3).take(300)
    val defImg = imgIds.map(id =>
      Multimodal.phashOf(id, "image", Multimodal.pgmPayload(id, diverse = false)))
    val divImg = imgIds.map(id =>
      Multimodal.phashOf(id, "image", Multimodal.pgmPayload(id, diverse = true)))
    assert(pairsAtH3(defImg) > 1000,
      s"default image payloads should be near-complete, got ${pairsAtH3(defImg)}")
    assert(pairsAtH3(divImg) < pairsAtH3(defImg) / 20,
      s"diverse image pair density must collapse: " +
        s"${pairsAtH3(divImg)} vs ${pairsAtH3(defImg)}")
    // audio: same through the RIFF/PCM parse + envelope hash
    val audIds = (1L until 901L by 3).take(300)
    val defAud = audIds.map(id =>
      Multimodal.phashOf(id, "audio", Multimodal.wavPayload(id, diverse = false)))
    val divAud = audIds.map(id =>
      Multimodal.phashOf(id, "audio", Multimodal.wavPayload(id, diverse = true)))
    assert(pairsAtH3(divAud) < math.max(1, pairsAtH3(defAud)) / 2,
      s"diverse audio pair density must drop: " +
        s"${pairsAtH3(divAud)} vs ${pairsAtH3(defAud)}")
  }
}
