package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** c76 first-fit-decreasing packing specs: driver brute-force parity
  * (corpus + randomized frames), pack validity, the classical FFD
  * approximation bound, waste vs the greedy arrival-order baseline, and
  * partition invariance. */
class PackFfdSpec extends SparkSpec {

  private val Budget = 256L

  /** Driver-side FFD over (doc_id, n_tokens) pairs of one shard, in the
    * (n_tokens desc, doc_id) total order. */
  private def bruteFfd(docs: Seq[(Long, Long)]): Map[Long, Long] = {
    val rem = scala.collection.mutable.ArrayBuffer[Long]()
    docs.sortBy { case (id, nt) => (-nt, id) }.map { case (id, nt) =>
      rem.indexWhere(_ >= nt) match {
        case -1 => rem += Budget - nt; id -> (rem.size - 1).toLong
        case i => rem(i) -= nt; id -> i.toLong
      }
    }.toMap
  }

  private def corpusSizes: Map[Long, Seq[(Long, Long)]] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1 / 100).map { case (s, ds) => s -> ds.toSeq }

  test("c76 equals the driver brute force on the corpus") {
    val got = TextOps.c76PackFfd(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val want = corpusSizes.flatMap { case (shard, ds) =>
      val packs = bruteFfd(ds)
      ds.map { case (id, nt) => id -> (shard, nt, packs(id)) }
    }
    assert(got == want, "Spark FFD must equal the driver FFD per shard")
  }

  test("c76 equals the brute force on randomized frames incl. oversize") {
    import spark.implicits._
    val rng = new scala.util.Random(76)
    // token counts up to 300 > budget: oversized docs must open their own
    // pack; several shards exercised at once
    val docs = (0L until 400L).map(id => (id, 1L + rng.nextInt(300)))
    val df = docs.map { case (id, nt) =>
      (id, ("tok " * nt.toInt).trim) // nt whitespace tokens
    }.toDF("doc_id", "text")
    val got = TextOps.packFfdOn(df).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = docs.groupBy(_._1 / 100).flatMap { case (_, ds) => bruteFfd(ds) }
    assert(got == want)
  }

  test("c76 packs are valid and within the FFD approximation bound") {
    val rows = TextOps.c76PackFfd(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(2))) // shard, pack, nt
    val byPack = rows.groupBy(r => (r._1, r._2))
    byPack.foreach { case ((s, p), ds) =>
      val fill = ds.map(_._3).sum
      assert(fill <= Budget || ds.length == 1,
        s"pack ($s,$p) overflows at $fill without being a single oversize doc")
    }
    // FFD ≤ (11·OPT + 6)/9 with OPT ≥ ⌈total/budget⌉, per shard
    rows.groupBy(_._1).foreach { case (s, ds) =>
      val packs = ds.map(_._2).distinct.length
      val optLb = (ds.map(_._3).sum + Budget - 1) / Budget
      assert(packs <= (11 * optLb + 6) / 9,
        s"shard $s: $packs packs breaks the FFD bound (OPT >= $optLb)")
    }
  }

  test("c76 wastes no more than the greedy arrival-order baseline") {
    def waste(fills: Iterable[Long]): Long =
      fills.map(f => math.max(0L, Budget - f)).sum
    val ffd = TextOps.c76PackFfd(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).map(_._2.map(_._3).sum)
    // next-fit in arrival order, non-overflowing — the natural greedy a
    // pipeline without the decreasing sort would run
    val nextFit = corpusSizes.values.flatMap { ds =>
      val fills = scala.collection.mutable.ArrayBuffer[Long]()
      ds.sortBy(_._1).foreach { case (_, nt) =>
        if (fills.nonEmpty && fills.last + nt <= Budget) fills(fills.size - 1) += nt
        else fills += nt
      }
      fills
    }
    assert(waste(ffd) <= waste(nextFit),
      s"FFD waste ${waste(ffd)} must not exceed next-fit's ${waste(nextFit)}")
    assert(waste(ffd) < waste(nextFit),
      "on this corpus FFD should strictly cut pad waste")
  }

  test("c77 report equals a driver fold of the assignment frames") {
    def foldOf(rows: Array[(Long, Long, Long)]): (Long, Long) = {
      val fills = rows.groupBy(x => (x._1, x._2)).map(_._2.map(_._3).sum)
      (fills.size.toLong, fills.map(f => math.max(0L, Budget - f)).sum)
    }
    val ffd = TextOps.c76PackFfd(spark, sfDir).collect()
      .map(x => (x.getLong(1), x.getLong(3), x.getLong(2))) // shard, pack, nt
    val greedy = TextOps.c23SeqPack(spark, sfDir).collect()
      .map(x => (x.getAs[Long]("shard"), x.getAs[Long]("pack_id"),
        x.getAs[Long]("n_tokens")))
    val (fp, fw) = foldOf(ffd)
    val (gp, gw) = foldOf(greedy)
    val rep = TextOps.c77PackReport(spark, sfDir).collect()
    assert(rep.length == 1, "the report is one row by construction")
    val r = rep(0)
    assert(r.getAs[Long]("ffd_packs") == fp && r.getAs[Long]("ffd_waste") == fw,
      s"ffd fold mismatch: report (${r.getAs[Long]("ffd_packs")}, " +
        s"${r.getAs[Long]("ffd_waste")}) vs frames ($fp, $fw)")
    assert(r.getAs[Long]("greedy_packs") == gp &&
      r.getAs[Long]("greedy_waste") == gw,
      s"greedy fold mismatch: report (${r.getAs[Long]("greedy_packs")}, " +
        s"${r.getAs[Long]("greedy_waste")}) vs frames ($gp, $gw)")
    assert(r.getAs[Long]("waste_saved") == gw - fw)
    // the measurement c76 exists for: on this corpus FFD must strictly
    // cut pad waste vs c23's arrival-order packer
    assert(fw < gw, s"FFD waste $fw should be under greedy's $gw")
  }

  test("c76 is partition-invariant") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val a = TextOps.packFfdOn(docs.repartition(1)).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val b = TextOps.packFfdOn(docs.repartition(32)).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(a == b, "the FFD fold must not depend on physical partitioning")
  }
}
