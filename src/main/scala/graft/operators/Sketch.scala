package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c100: Count-Min-Sketch heavy hitters — the SKETCH answer to "what
  * are the corpus's most frequent tokens" (Cormode & Muthukrishnan
  * 2005), joining the approximate family b16 (HyperLogLog distincts)
  * and b17 (KLL quantiles) opened: where c34's exact top-k shuffles the
  * full token-type domain, the CMS folds the corpus into a FIXED d×w
  * counter grid (here 4×256 = 1024 longs — bytes, independent of corpus
  * size) and reads each candidate's estimate as the min of its d
  * bucket counters. The row surfaces est next to the true count, so the
  * gate verifies the sketch's one-sided error law (est ≥ truth, equal
  * in the absence of collisions) on real data rather than trusting it.
  *
  * Determinism and the oracle: bucket_i(token) is the FIRST TWO HEX
  * CHARS of md5(i || ':' || token) — no arithmetic, no seeds, engine-
  * identical (c80's md5-prefix bucketing rule) — so the whole sketch is
  * a pure function of the corpus and DuckDB re-derives counters,
  * estimates, and the top-k cut from scratch; a drifting hash or fold
  * hash-fails the gate.
  *
  * 100 TB shape: pass 1 is ONE corpus scan exploding each token
  * occurrence into its d (i, bucket) cells, map-side-combined into at
  * most d·w partial rows per task before a shuffle whose ENTIRE key
  * domain is d·w = 1024 — the sketch is the aggregation state, which is
  * the whole point (exact top-k's shuffle key domain is the unbounded
  * token-type vocabulary). The counter grid collects as a bounded model
  * artifact (trainCodebook's rule) and ships back as a plan-literal map;
  * pass 2 estimates each word TYPE row-locally (c44's bounded-vocabulary
  * trick) and cuts top-k via TakeOrderedAndProject. At a true 100 TB
  * vocabulary the candidate set itself would come from a per-partition
  * heap, not the full type table — documented, not needed at gate
  * scale. */
object Sketch {

  /** Sketch depth: number of independent hash rows. */
  val CmsDepth = 4

  /** Sketch width: 16² buckets per row — two md5 hex chars. */
  val CmsWidth = 256

  /** Heavy-hitter cut. */
  val CmsTopK = 50

  /** Bucket of one token under hash row i: the first two hex chars of
    * md5(i || ':' || token) — a 256-way split both engines compute
    * byte-identically. */
  private[graft] def bucketOf(i: Int, token: Column): Column =
    substring(md5(concat(lit(s"$i:"), token)), 1, 2)

  /** The corpus token stream as (w, wcnt) word types — c34's exact
    * counting convention (lowercased, space-split, length ≥ 1), shared
    * so est and truth count the SAME stream. */
  private def tokenTypes(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(explode(TextOps.words(lower(col("text")))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("wcnt"))

  /** The d×w counter grid of a (w, wcnt) type frame, as a Map from
    * "i:bucket" to counter. At most [[CmsDepth]]·[[CmsWidth]] entries —
    * a bounded model artifact regardless of corpus size. */
  def counterGrid(types: DataFrame): Map[String, Long] = {
    val cells = (0 until CmsDepth).map(i =>
      struct(lit(i).as("i"), bucketOf(i, col("w")).as("b")))
    types
      .select(col("wcnt"), explode(array(cells: _*)).as("cell"))
      .groupBy(col("cell.i").as("i"), col("cell.b").as("b"))
      .agg(sum(col("wcnt")).as("c"))
      .collect()
      .map(r => s"${r.getInt(0)}:${r.getString(1)}" -> r.getLong(2))
      .toMap
  }

  /** CMS estimate of one token column under a collected counter grid:
    * min over the d rows of the token's bucket counter, via d
    * plan-literal map lookups — row-local, zero exchanges (d13's
    * bounded-artifact rule). An untouched counter READS ZERO (the
    * textbook CMS: the min ranges over all d counters including empty
    * ones), so a token the folded corpus never saw — possible when a
    * stored grid is applied to a DIFFERENT corpus (`sketch --estimate`,
    * d48) — estimates 0-or-collision, never null and never a partial
    * min over only its non-empty buckets. */
  def estimateOf(token: Column, grid: Map[String, Long]): Column = {
    val m = map(grid.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val reads = (0 until CmsDepth).map(i =>
      coalesce(element_at(m, concat(lit(s"$i:"), bucketOf(i, token))),
        lit(0L)))
    least(reads: _*)
  }

  /** The corpus dir's counter grid — the at-rest sketch artifact d48's
    * ingest twin probes. */
  def cmsGrid(spark: SparkSession, dir: String): Map[String, Long] =
    counterGrid(tokenTypes(spark, dir))

  /** c100 gate row: fold the corpus into the counter grid, estimate
    * every word type, and emit the top-[[CmsTopK]] heavy hitters by
    * (est desc, token asc) with the sketch estimate NEXT TO the exact
    * count — the overestimate the one-sided error law allows is thereby
    * engine-checked, not asserted. */
  def c100CmsTopk(spark: SparkSession, dir: String,
                  topK: Int = CmsTopK): DataFrame = {
    val types = tokenTypes(spark, dir)
    val grid = counterGrid(types)
    types
      .select(col("w").as("token"),
        estimateOf(col("w"), grid).as("est_cnt"),
        col("wcnt").as("true_cnt"))
      .withColumn("exact", col("est_cnt") === col("true_cnt"))
      .orderBy(desc("est_cnt"), asc("token"))
      .limit(topK)
  }
}
