package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities for the 100 TB contract (SURVEY §4): skew-safe
  * aggregation and bucketed co-located joins. AQE handles most runtime
  * skew; these are the explicit tools for the cases it can't — a priori
  * hot keys in aggregations, and repeated fact-fact joins where paying one
  * bucketed write amortizes every later shuffle away. */
object ScaleOps {

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt) so
    * a hot key's rows spread over `salts` reducers, then merge partials by
    * key. The salt never reaches the result — only the shuffle layout
    * changes. Supported merges: sum/count/min/max (algebraic aggregates).
    * `("count", c)` counts non-null values of `c` (SQL count(c)) into a
    * column named `count_c`; use `("count", "*")` for count(*) → `count`.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                aggs: (String, String)*): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(firstAggMap(aggs).head, firstAggMap(aggs).tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(mergeAggMap(aggs).head, mergeAggMap(aggs).tail: _*)
  }

  // "*" can't appear inside an attribute name (col() would star-expand it)
  private def pname(fn: String, c: String): String =
    s"__p_${fn}_" + (if (c == "*") "all" else c)

  private def firstAggMap(aggs: Seq[(String, String)]): Seq[Column] =
    aggs.map { case (fn, c) =>
      val name = pname(fn, c)
      fn match {
        case "sum" => sum(col(c)).as(name)
        case "count" if c == "*" => count(lit(1)).as(name)
        case "count" => count(col(c)).as(name)
        case "min" => min(col(c)).as(name)
        case "max" => max(col(c)).as(name)
        case other => throw new IllegalArgumentException(s"non-algebraic agg: $other")
      }
    }

  private def mergeAggMap(aggs: Seq[(String, String)]): Seq[Column] =
    aggs.map { case (fn, c) =>
      val p = col(pname(fn, c))
      fn match {
        case "sum" => sum(p).as(s"sum_$c")
        case "count" if c == "*" => sum(p).as("count")
        case "count" => sum(p).as(s"count_$c")
        case "min" => min(p).as(s"min_$c")
        case "max" => max(p).as(s"max_$c")
        case other => throw new IllegalArgumentException(s"non-algebraic agg: $other")
      }
    }

  /** Write a DataFrame as a bucketed (+ optionally sorted) table: every
    * later equi-join or aggregation on `key` against a co-bucketed table
    * plans with ZERO shuffle exchanges — the 100 TB answer for join keys
    * that recur across a workload (one shuffle at write time, amortized
    * over every read). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }
}
