package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c85/c86: exact global ordering and curriculum construction — the two
  * operators a training-data pipeline runs LAST, after filtering and
  * dedup: rank every surviving document on a quality key, then emit the
  * order the trainer will actually read samples in (curriculum
  * learning, Bengio et al. 2009: easy-to-hard phases; intra-phase order
  * re-shuffled so a phase is not accidentally sorted by quality too).
  *
  * The scale story IS the operator here: `row_number() OVER (ORDER BY
  * ...)` — the obvious formulation — collapses to a single partition
  * and dies at 100 TB. Both rows instead ride [[SeqColumn.withSeq]],
  * the a4 bolson-seq machinery (range repartition → sort within
  * partitions → zipWithIndex's count job + offset zip in ONE RDD
  * lineage, so the sampled range bounds are computed once): exact
  * contiguous global positions with no single-partition stage anywhere.
  * The DuckDB oracle is the window formulation — the two produce
  * identical ranks BECAUSE the sort key is total (ties broken by
  * doc_id), which is what the gate verifies.
  */
object Curriculum {

  /** c85's core over any (doc_id, text) frame — the CLI seam. */
  def rankOn(docs: DataFrame): DataFrame = {
    val scored = TextOps
      .freqScoreOn(docs, t => TextOps.words(lower(t)))
      .select(col("doc_id"), col("mean_prob_r"))
      // withSeq sorts ascending; rank-by-desc-score = ascend the negation
      // (mean_prob_r > 0 on any non-empty doc, so no -0.0 edge)
      .withColumn("neg_score", -col("mean_prob_r"))
    SeqColumn.withSeq(scored, Seq("neg_score", "doc_id"), "rank0")
      .select(col("doc_id"), col("mean_prob_r"),
        (col("rank0") + 1L).as("global_rank"))
      .orderBy("doc_id")
  }

  /** c85: exact global quality rank — rank 1 = highest c41 score
    * (mean_prob_r desc, doc_id asc ties; the ROUNDED score, c37's
    * threshold rule). One range shuffle + zipWithIndex; no window. */
  def c85GlobalRank(spark: SparkSession, dir: String): DataFrame =
    rankOn(graft.Tables.documents(spark, dir).select("doc_id", "text"))

  /** c86: curriculum order — easy-to-hard phase buckets with a
    * deterministic intra-phase shuffle. `phase` = the doc's global-rank
    * decile (exact integer division over the 1-row broadcast count —
    * c45's rule); `skey` = md5 of a doc_id tag (the engine-portable
    * shuffle both engines reproduce); `train_pos` = the exact global
    * position under (phase, skey, doc_id) — assigned by the SAME
    * no-window machinery as c85. The trainer reads rows in train_pos
    * order: quality-descending phases, shuffled within each phase. */
  def c86Curriculum(spark: SparkSession, dir: String,
                    phases: Int = 10): DataFrame =
    curriculumOn(graft.Tables.documents(spark, dir).select("doc_id", "text"),
      phases)

  /** c86's core over any (doc_id, text) frame — the CLI seam. */
  def curriculumOn(docs: DataFrame, phases: Int = 10): DataFrame = {
    require(phases >= 1, s"phases must be >= 1, got $phases")
    val ranked = rankOn(docs)
    val n = broadcast(ranked.agg(count(lit(1)).as("n_docs")))
    val phased = ranked.crossJoin(n)
      .withColumn("phase",
        expr(s"((global_rank - 1) * $phases) div n_docs"))
      .withColumn("skey",
        md5(concat(lit("curriculum:"), col("doc_id").cast("string"))))
      .select("doc_id", "phase", "skey")
    SeqColumn.withSeq(phased, Seq("phase", "skey", "doc_id"), "pos0")
      .select(col("doc_id"), col("phase"), col("skey"),
        (col("pos0") + 1L).as("train_pos"))
      .orderBy("doc_id")
  }
}
