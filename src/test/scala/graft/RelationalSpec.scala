package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("b1 pushes filter and projection to the parquet scan") {
    val df = Relational.b1ScanFilterProject(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters"), "filters must reach the scan")
    assert(df.columns.toSeq == Seq("l_orderkey", "l_linenumber", "l_extendedprice"))
    assert(df.count() > 0)
  }

  test("b2 aggregates match a direct recomputation") {
    val rows = Relational.b2AggPricing(spark, sfDir).collect()
    assert(rows.length >= 4) // R/A/N × F/O combinations present
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == Tables.lineitem(spark, sfDir).count())
  }

  test("b3 revenue per nation covers all customer nations and sorts by revenue") {
    val rows = Relational.b3JoinMultiway(spark, sfDir).collect()
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("b4 top-k returns exactly k in descending order") {
    val rows = Relational.b4TopK(spark, sfDir).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("b6 window emits at most 3 rows per segment, ranked") {
    val rows = Relational.b6Window(spark, sfDir).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    assert(bySeg.values.forall(g => g.length <= 3 && g.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to g.length)))
  }

  test("b7 semi+anti partition the customer table exactly") {
    val df = Relational.b7SemiAnti(spark, sfDir)
    assert(df.count() == Tables.customer(spark, sfDir).count())
    assert(df.select("c_custkey").distinct().count() == df.count())
  }

  test("b8 'both' and 'purchase_only' tags are disjoint user sets") {
    val rows = Relational.b8SetOps(spark, sfDir).collect()
    val both = rows.filter(_.getString(0) == "both").map(_.getLong(1)).toSet
    val only = rows.filter(_.getString(0) == "purchase_only").map(_.getLong(1)).toSet
    assert(both.intersect(only).isEmpty)
  }

  test("b11 rollup grand total equals customer count") {
    val rows = Relational.b11GroupingSets(spark, sfDir).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_cust") == Tables.customer(spark, sfDir).count())
  }

  test("b12 median lies within the quantity domain") {
    val rows = Relational.b12Quantiles(spark, sfDir).collect()
    assert(rows.forall { r =>
      val m = r.getAs[Double]("median_qty"); m >= 1.0 && m <= 50.0
    })
  }

  test("b14 as-of join equals the naive greatest-purchase-at-or-before join") {
    import spark.implicits._
    val got = Relational.b14AsofJoin(spark, sfDir)
      .select("click_id", "purchase_id").as[(Long, Option[Long])].collect().toMap
    // naive reference: per click, max-ts (then max-id) purchase with ts <= click ts
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
    val purchases = ev.filter(_.getString(3) == "purchase")
      .groupBy(_.getLong(1)).view.mapValues(_.sortBy(r => (r.getLong(2), r.getLong(0)))).toMap
    val clicks = ev.filter(_.getString(3) == "click")
    assert(clicks.length == got.size)
    clicks.foreach { c =>
      val expect = purchases.getOrElse(c.getLong(1), Array.empty[org.apache.spark.sql.Row])
        .filter(_.getLong(2) <= c.getLong(2)).lastOption.map(_.getLong(0))
      assert(got(c.getLong(0)) == expect, s"click ${c.getLong(0)}")
    }
  }

  test("b14 as-of join plans exactly one shuffle (no range-join blow-up)") {
    val plan = sansFanOut(Relational.b14AsofJoin(spark, sfDir)
      .queryExecution.executedPlan.toString())
    assert(!plan.contains("NestedLoop"), s"as-of must not nested-loop:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1, s"expected a single key shuffle, got $shuffles:\n$plan")
  }

  test("b22 forward as-of equals the naive earliest-purchase-within-tolerance join") {
    import spark.implicits._
    val tol = 30L * 60 * 1000 * 1000
    val got = Relational.b22AsofForward(spark, sfDir)
      .select("click_id", "purchase_id").as[(Long, Option[Long])].collect().toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
    val purchases = ev.filter(_.getString(3) == "purchase")
      .groupBy(_.getLong(1)).view
      .mapValues(_.sortBy(r => (r.getLong(2), r.getLong(0)))).toMap
    val clicks = ev.filter(_.getString(3) == "click")
    assert(clicks.length == got.size)
    var some = 0; var none = 0
    clicks.foreach { c =>
      val expect = purchases.getOrElse(c.getLong(1), Array.empty[org.apache.spark.sql.Row])
        .find(r => r.getLong(2) >= c.getLong(2) && r.getLong(2) <= c.getLong(2) + tol)
        .map(_.getLong(0))
      assert(got(c.getLong(0)) == expect, s"click ${c.getLong(0)}")
      if (expect.isDefined) some += 1 else none += 1
    }
    // both outcomes must occur or the tolerance/direction test nothing
    assert(some > 0 && none > 0, s"degenerate corpus: some=$some none=$none")
  }

  test("asofJoin direction and tolerance semantics on a constructed frame") {
    import spark.implicits._
    // key 1: rights at t=5 (v=50,51), t=10 (v=60), t=20 (v=70); left at t=10
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, 50L), (1L, 5L, 51L), (1L, 10L, 60L), (1L, 20L, 70L))
      .toDF("k", "t", "v")
    def run(dir: String, tol: Option[Long]) =
      Relational.asofJoin(l, r, "k", "t", "v", "av", "at",
        direction = dir, toleranceUs = tol)
        .select("av", "at").collect().head
    // equal-time rights are visible in BOTH directions (<= / >=)
    assert(run("backward", None).toSeq == Seq(60L, 10L))
    assert(run("forward", None).toSeq == Seq(60L, 10L))
    // strict cases: drop the equal-time right
    val r2 = Seq((1L, 5L, 50L), (1L, 5L, 51L), (1L, 20L, 70L)).toDF("k", "t", "v")
    def run2(dir: String, tol: Option[Long]) =
      Relational.asofJoin(l, r2, "k", "t", "v", "av", "at",
        direction = dir, toleranceUs = tol)
        .select("av", "at").collect().head
    // backward equal-time tie at t=5 resolves to the LARGEST v (b14 rule)
    assert(run2("backward", None).toSeq == Seq(51L, 5L))
    assert(run2("forward", None).toSeq == Seq(70L, 20L))
    // tolerance nulls matches farther than the bound
    assert(run2("backward", Some(4L)).toSeq == Seq(null, null))
    assert(run2("forward", Some(9L)).toSeq == Seq(null, null))
    assert(run2("forward", Some(10L)).toSeq == Seq(70L, 20L))
    // forward equal-time tie resolves to the SMALLEST v
    val l3 = Seq((1L, 5L)).toDF("k", "t")
    assert(Relational.asofJoin(l3, r2, "k", "t", "v", "av", "at",
      direction = "forward").select("av").collect().head.getLong(0) == 50L)
  }

  test("asofJoin carries non-integral values exactly (r15: the integral require is gone)") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    // double payload survives untruncated, native type preserved
    val r = Seq((1L, 5L, 1.75), (1L, 5L, 2.25), (1L, 20L, 9.5))
      .toDF("k", "t", "price")
    val b = Relational.asofJoin(l, r, "k", "t", "price", "asof_price", "asof_t")
      .select("asof_price", "asof_t").collect().head
    assert(b.getDouble(0) == 2.25 && b.getLong(1) == 5L,
      "backward equal-time tie resolves to the LARGEST value, exactly")
    val f = Relational.asofJoin(l, r, "k", "t", "price", "asof_price", "asof_t",
      direction = "forward").select("asof_price").collect().head
    assert(f.getDouble(0) == 9.5)
    // string payload: label lookup, ties by binary order
    val rs = Seq((1L, 5L, "alpha"), (1L, 5L, "beta")).toDF("k", "t", "label")
    val s = Relational.asofJoin(l, rs, "k", "t", "label", "asof_label", "asof_t")
      .select("asof_label").collect().head.getString(0)
    assert(s == "beta", "backward tie picks the largest label")
  }

  test("asofJoinRow returns the whole matched right row, null past tolerance") {
    import spark.implicits._
    val l = Seq((1L, 10L, "left-a"), (2L, 10L, "left-b")).toDF("k", "t", "tag")
    val r = Seq((1L, 4L, 100L, "view", 1.5), (1L, 8L, 101L, "buy", 2.5),
        (1L, 8L, 102L, "view", 3.5))
      .toDF("k", "t", "id", "kind", "value")
    val got = Relational.asofJoinRow(l, r, "k", "t", tieCol = "id",
        matchedName = "m")
      .select(col("k"), col("tag"), col("m.id"), col("m.kind"),
        col("m.value"), col("m.t").as("mt"))
      .collect().map(x => x.getLong(0) -> x).toMap
    // key 1: latest right at t=8; equal-time tie → largest id (102)
    val m1 = got(1L)
    assert(m1.getString(1) == "left-a" && m1.getLong(2) == 102L &&
      m1.getString(3) == "view" && m1.getDouble(4) == 3.5 &&
      m1.getLong(5) == 8L)
    // key 2: no right rows at all → whole struct null
    val m2 = got(2L)
    assert(m2.isNullAt(2) && m2.isNullAt(3) && m2.isNullAt(4))
    // tolerance: key 1's nearest right is 2 units away — a 1-unit bound nulls it
    val tol = Relational.asofJoinRow(l, r, "k", "t", "id", "m",
        toleranceUs = Some(1L))
      .select(col("k"), col("m")).collect().map(x => x.getLong(0) -> x).toMap
    assert(tol(1L).isNullAt(1), "match past tolerance must null the row")
    // full-replay parity with the value flavor: same pick on the b14 corpus
    val ev = Tables.events(spark, sfDir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val viaRow = Relational.asofJoinRow(clicks, buys, "user_id", "ts_us",
        "event_id", "m")
      .select(col("click_id"), col("m.event_id").as("purchase_id"))
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    val viaVal = Relational.b14AsofJoin(spark, sfDir)
      .select("click_id", "purchase_id")
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(viaRow == viaVal, "row flavor must pick exactly b14's rows")
  }

  test("b15 range join pairs all satisfy the interval predicate, and none are missed") {
    val within = 30L * 60 * 1000 * 1000
    val rows = Relational.b15RangeJoin(spark, sfDir).collect()
    assert(rows.forall { r =>
      val d = r.getAs[Long]("purchase_ts_us") - r.getAs[Long]("click_ts_us")
      d >= 0 && d <= within
    })
    val naive = {
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_type")).collect()
      val byUser = ev.groupBy(_.getLong(1))
      byUser.values.map { g =>
        val c = g.filter(_.getString(3) == "click")
        val p = g.filter(_.getString(3) == "purchase")
        c.map(ci => p.count(pi =>
          pi.getLong(2) >= ci.getLong(2) && pi.getLong(2) <= ci.getLong(2) + within)).sum
      }.sum
    }
    assert(rows.length == naive)
  }

  test("b16 HLL++ estimate lands within the audited 5% bound for every group") {
    val rows = Relational.b16ApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_ok")))
  }

  test("b20 unpivot profiles every measure exactly; plan is Expand, not a union of scans") {
    val df = Relational.b20Unpivot(spark, sfDir)
    val rows = df.collect()
    val li = Tables.lineitem(spark, sfDir)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax").collect()
    def cents(x: Double): Long =
      java.math.BigDecimal.valueOf(x * 100).setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val got = rows.map(r => r.getAs[String]("measure") -> r).toMap
    assert(got.keySet == Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    Seq(("l_quantity", 0), ("l_extendedprice", 1), ("l_discount", 2), ("l_tax", 3))
      .foreach { case (m, i) =>
        val vals = li.map(_.getDouble(i))
        val r = got(m)
        assert(r.getAs[Long]("n") == vals.length, s"$m n")
        assert(r.getAs[Long]("sum_c2") == vals.map(cents).sum, s"$m sum")
        def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        assert(r.getAs[Double]("min_v") == r6(vals.min), s"$m min")
        assert(r.getAs[Double]("max_v") == r6(vals.max), s"$m max")
      }
    // melt must plan as one Expand over one scan — not four unioned scans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"unpivot should plan as Expand:\n$plan")
    assert(!plan.contains("Union"), s"unpivot must not union scans:\n$plan")
  }

  test("b21 windowed event dedup re-derives from raw events; chained semantics hold") {
    val window = 30L * 60 * 1000 * 1000
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ts_us")))
    // per identity key: sort by (ts, id); dup iff gap to the IMMEDIATE
    // predecessor <= window (chained — a retry storm extends suppression)
    val expected = ev.groupBy(e => (e._2, e._3)).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._1)).toSeq
      sorted.zipWithIndex.map { case (e, i) =>
        e._1 -> (i > 0 && e._4 - sorted(i - 1)._4 <= window)
      }
    }
    val rows = Relational.b21WindowDedup(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("is_dup")).toMap
    assert(rows.size == ev.length)
    expected.foreach { case (id, e) => assert(rows(id) == e, s"event $id") }
    // the window must discriminate on this corpus
    assert(rows.values.exists(identity) && rows.values.exists(!_))
  }
}
