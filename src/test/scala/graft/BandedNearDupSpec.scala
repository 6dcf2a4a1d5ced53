package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** c71 multi-band hyperplane LSH specs: measured recall against the
  * brute-force all-pairs truth (the production bar the single-band c11
  * cannot clear), exact precision (banding must never ADMIT a wrong
  * pair — the cosine verify guarantees it), band-monotonicity, and the
  * candidate-join plan shape. */
class BandedNearDupSpec extends SparkSpec {

  private val threshold = 0.3

  /** Brute-force ≥ threshold pair set — the ground truth, derived with
    * plain SQL HOFs (no Similarity code). */
  private lazy val exactPairs: Set[(Long, Long)] = {
    val v = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    v.as("a").crossJoin(v.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .withColumn("c", round(
        expr("aggregate(zip_with(a.v, b.v, (x,y) -> x*y), 0D, (s,x) -> s+x)") /
          (sqrt(expr("aggregate(a.v, 0D, (s,x) -> s+x*x)")) *
            sqrt(expr("aggregate(b.v, 0D, (s,x) -> s+x*x)"))), 6))
      .filter(col("c") >= threshold)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("c71 recall >= 0.9 of the exact pair set where single-band c11 cannot reach it") {
    val banded = Similarity.c71NearDupBanded(spark, sfDir, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty, "gate corpus must have near-dup pairs to measure")
    val recall = (banded & exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.9,
      f"banded recall $recall%.4f < 0.9 over ${exactPairs.size} exact pairs")
    // precision is EXACT by construction: candidates are verified by the
    // true cosine, so banding can only lose pairs, never invent them
    assert(banded.subsetOf(exactPairs),
      "a banded pair outside the exact set means the verify is broken")
    // and the single-band c11 bucketing genuinely cannot reach the bar
    // at this threshold (the gap c71 exists to close)
    val single = Similarity.c11EmbedNearDup(spark, sfDir, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.size.toDouble / exactPairs.size < 0.9,
      "single-band recall cleared 0.9 — c71's premise needs re-checking")
  }

  test("c71 recall is monotone in bands (the OR can only add candidates)") {
    val e = Tables.embeddings(spark, sfDir)
    val few = Similarity.bandedNearDupOn(e, threshold, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val more = Similarity.bandedNearDupOn(e, threshold, bands = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(few.subsetOf(more),
      "a pair found at 4 bands vanished at 12 — bands are not independent ORs")
  }

  test("c71 plan: candidate generation is a (band, bucket) equi-join — no cartesian") {
    // audit the LIVE build subtree, not the memoized table read that
    // c71NearDupBanded serves from (r12 memo seam)
    val df = Similarity.bandedNearDupOn(
      Tables.embeddings(spark, sfDir), threshold)
    df.collect()
    val s = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(!s.contains("CartesianProduct"), s"cartesian in banded near-dup:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin"),
      s"nested loop in banded near-dup:\n$s")
  }
}
