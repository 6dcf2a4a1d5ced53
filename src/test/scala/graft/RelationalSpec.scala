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
    val revs = rows.map(_.getDecimal(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a.compareTo(b) >= 0 })
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
}
