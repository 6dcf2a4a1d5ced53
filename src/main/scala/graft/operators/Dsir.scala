package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c80: DSIR-style importance weighting (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling") — rank raw
  * documents by how TARGET-like their hashed-n-gram distribution is.
  * Each document's weight is the log likelihood-ratio of its token
  * stream under two smoothed bag-of-buckets models:
  *
  *   w(doc) = Σ_tokens [ ln p̂_target(b(t)) − ln p̂_raw(b(t)) ]
  *
  * with `b(t)` a 3-hex-char md5 prefix (4096 hash buckets — DSIR's
  * hashed-feature trick, which bounds the model by the bucket count
  * rather than the open vocabulary) and both distributions add-1
  * smoothed over the OBSERVED bucket support (see [[trainDsirOn]] for
  * why not the full hash space). The target distribution here is the
  * corpus' own `lang = 'en'` slice — the standard "select raw data that
  * looks like the high-resource slice" setup; the raw distribution is
  * the whole corpus.
  *
  * Determinism and the oracle (c52's drift-pinning rule): bucket
  * log-ratios are FIXED-POINT integers — floor(lr·10⁶) computed once
  * driver-side with StrictMath.log over exact integer counts — so
  * per-doc scores are exact BIGINT sums in both engines; the oracle
  * inlines the trained (bucket → lr_fx) map as a SQL MAP literal
  * (map_extract lookup) and re-derives every doc's sum — trainer drift
  * hash-fails the gate. `keep` is the exact integer comparison
  * sum_lr > 0 (doc leans target), never a float threshold.
  *
  * 100 TB shape: training is ONE corpus scan into a map-side-combinable
  * groupBy on the 4096-bounded bucket key (the collect is
  * artifact-sized by construction — ≤ NBuckets rows regardless of
  * corpus size); scoring is a stateless ROW-LOCAL fold per document —
  * the artifact ships as plan literals (d13's bounded-artifact rule),
  * the md5-bucket lookup runs inside one projection, zero exchanges
  * beyond the gate sort. Buckets unseen at train time score a neutral
  * 0 (the add-1-smoothed ratio of two absent counts), which is what
  * lets the SAME artifact score NEW documents at ingest (d37's twin)
  * without retraining. Ref: bolson has no selection surface
  * (src/bolson/bench.cpp:40-291 measures, never filters); this row
  * extends the LLM-pipeline family.
  */
object Dsir {

  /** Hex chars of the md5 prefix used as the hash bucket — 16³ = 4096
    * buckets, DSIR's dimensionality knob. Bounds the artifact, the
    * smoothing denominator, and the oracle's MAP literal. */
  val BucketHexChars = 3
  val NBuckets = 4096

  /** The target slice: documents whose `lang` equals this value. */
  val TargetLang = "en"

  /** Token → bucket: 3-hex-char md5 prefix. Lowercase hex in both
    * engines, so the bucket KEY is engine-portable by construction. */
  private[graft] def bucketOf(t: Column): Column =
    substring(md5(t), 1, BucketHexChars)

  /** Train the (bucket, lr_fx) artifact from a (text, lang) frame: one
    * corpus scan → per-bucket raw/target counts (bounded by NBuckets) →
    * fixed-point smoothed log-ratios driver-side. StrictMath keeps the
    * double ln bit-identical across JVMs; the four-term form (rather
    * than one log of a quotient) pins the exact sequence of IEEE ops. */
  /** The gate's engine-exact ASCII tokenizer; CLI `--unicode` swaps in
    * the codegen'd NFC variant (SURVEY §2 tokenizer note — variants are
    * spec-pinned, the oracle stays on the ASCII default). */
  private[graft] val defaultTokens: Column => Column =
    t => TextOps.words(lower(t))

  def trainDsirOn(docs: DataFrame,
                  target: String = TargetLang,
                  tokens: Column => Column = defaultTokens)
      : Seq[(String, Long)] = {
    val toks = docs.filter(col("text").isNotNull)
      .select(col("lang"),
        explode(filter(tokens(col("text")),
          w => length(w) >= 1)).as("w"))
      .select(col("lang"), bucketOf(col("w")).as("b"))
    val counts = toks.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === target, 1L).otherwise(0L)).as("ct"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("cr"), r.getAs[Long]("ct")))
    require(counts.nonEmpty, "DSIR training needs a non-empty corpus")
    val nr = counts.map(_._2).sum
    val nt = counts.map(_._3).sum
    // Laplace smoothing over the OBSERVED bucket support, not the 4096-
    // bucket hash space: the target is a subset of the raw corpus, so
    // ct <= cr per bucket, and a smoothing denominator that dwarfs the
    // counts (n + 4096 on a small corpus) collapses every ratio to
    // ln((ct+1)/(cr+1)) <= 0 — all-negative weights, no signal. Scaling
    // the smoothing mass to the support keeps the ratio centred: a
    // bucket at the corpus-average target share scores ~0, over-
    // represented buckets positive, at any corpus size.
    val v = counts.length
    counts.map { case (b, cr, ct) =>
      val lr = StrictMath.log((ct + 1).toDouble) -
        StrictMath.log((nt + v).toDouble) -
        StrictMath.log((cr + 1).toDouble) +
        StrictMath.log((nr + v).toDouble)
      b -> math.floor(lr * 1e6).toLong
    }.sortBy(_._1).toIndexedSeq
  }

  /** Per-dir memo: gate row and oracle renderer must see the identical
    * artifact (trainBpe's memo rule). */
  private val dsirMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Long)]]()

  def trainDsir(spark: SparkSession, dir: String): Seq[(String, Long)] =
    dsirMemo.computeIfAbsent(dir,
      _ => trainDsirOn(graft.Tables.documents(spark, dir)))

  /** (doc_id, n_tokens, sum_lr) scoring projection of a (doc_id, text)
    * frame under a trained artifact — THE scoring derivation, shared by
    * construction (d29's shared-subtree rule) between the c80 gate row
    * and d37's streaming twin. Row-local fold over the token array with
    * the artifact as a plan-literal map; buckets outside the artifact
    * contribute 0. Zero-token docs are absent (c66's row-set rule; also
    * what keeps the average's divisor nonzero). */
  def scoreDocs(docs: DataFrame, artifact: Seq[(String, Long)],
                tokens: Column => Column = defaultTokens): DataFrame = {
    require(artifact.nonEmpty, "DSIR artifact must contain buckets")
    val m = map(artifact.flatMap { case (b, s) => Seq(lit(b), lit(s)) }: _*)
    val ws = filter(tokens(col("text")), w => length(w) >= 1)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= 1)
      .select(col("doc_id"),
        size(col("ws")).cast("bigint").as("n_tokens"),
        aggregate(col("ws"), lit(0L),
          (acc, w) => acc + coalesce(element_at(m, bucketOf(w)), lit(0L)))
          .as("sum_lr"))
  }

  /** The weight/verdict projection over [[scoreDocs]]' output, shared
    * by c80 and d37 (d29's rule again — batch and ingest verdicts
    * cannot drift): `avg_lr_r` is the per-token mean log-ratio in nats,
    * 6-dp rounded; `keep` is the exact integer sign test sum_lr > 0,
    * never a float threshold.
    *
    * The 6-dp rounding is EXACT INTEGER half-away-from-zero division —
    * round6(sum_lr/(n·10⁶)) ≡ intRound(sum_lr/n)/10⁶, and sum_lr/n
    * lands on exact .5 ties whenever n divides 2·sum_lr, where Spark's
    * decimal HALF_UP and a double-rounding engine disagree by 1 ulp
    * (observed at sf0.01). The abs/negate form keeps the floor-vs-
    * truncate `div` divergence out too (the ADVICE packFfdOn lesson). */
  def weightsOf(scored: DataFrame): DataFrame =
    scored
      .withColumn("avg_fx", when(col("sum_lr") >= 0L,
          expr("(2*sum_lr + n_tokens) div (2*n_tokens)"))
        .otherwise(-expr("(2*(-sum_lr) + n_tokens) div (2*n_tokens)")))
      .withColumn("avg_lr_r", col("avg_fx").cast("double") / 1e6)
      .drop("avg_fx")
      .withColumn("keep", col("sum_lr") > 0L)

  /** c80 gate row: score every document under the memoized artifact. */
  def c80DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val art = trainDsir(spark, dir)
    weightsOf(scoreDocs(graft.Tables.documents(spark, dir), art))
      .orderBy("doc_id")
  }
}
