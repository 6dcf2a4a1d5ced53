package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Domain/URL-level curation (SURVEY §2 c96–c97) — the per-domain stage
  * every large web-corpus pipeline runs before anything touches text
  * (the C4 / RefinedWeb move: cap how much any one domain contributes,
  * drop blocklisted domains, report per-domain shares).
  *
  * Provenance derivation: TESTDATA's documents carry no URL column and
  * the corpus contract is frozen (driver-generated, read-only), so web
  * provenance is DERIVED deterministically from (source, lang, doc_id)
  * inside the operator AND the oracle — the mediaTable convention (c12:
  * media payloads synthesized from doc_id identically in both engines)
  * applied to URLs. The derived URL is a REALISTIC messy string
  * (scheme, www prefix, path, query param), and extraction then runs
  * over it for real — regex parsing, not a column read — so the
  * domain-extraction logic is engine-checked end-to-end and transfers
  * unchanged to a corpus that ships genuine URLs.
  *
  * Reference scope: bolson has no curation surface (this repo is a
  * capability superset); the operators follow the public per-domain
  * stages of C4 (Raffel et al. 2020) and RefinedWeb (Penedo et al.
  * 2023). */
object Curation {

  /** The derived URL — THE provenance derivation, shared by every
    * curation row and rendered identically in the oracles. */
  private[graft] def urlCol: Column =
    concat(lit("https://www."), col("source"), lit(".example.com/"),
      col("lang"), lit("/article-"), col("doc_id").cast("string"),
      lit("?ref="), pmod(col("doc_id"), lit(7)).cast("string"))

  /** Registrable domain from a messy URL: host capture + www strip —
    * the extraction a real pipeline runs (both engines evaluate the
    * same regexes over the same string). Case-insensitive scheme/www,
    * and the host ends at `/`, `?`, `#` OR end-of-string — a path-less
    * `https://src3.example.com` must still resolve to its (possibly
    * blocklisted) domain, not silently to ''. The domain lowercases
    * (DNS names are case-insensitive — `Src13.Example.Com` must not
    * escape a lowercase blocklist). Non-URL strings yield '' (an
    * "unknown provenance" pseudo-domain a policy can block on). */
  private[graft] def domainOf(url: Column): Column =
    lower(regexp_replace(regexp_extract(url, "(?i)^https?://([^/?#]+)", 1),
      "(?i)^www\\.", ""))

  /** (doc_id, url, domain) provenance frame — the scan-side projection
    * every curation operator starts from. */
  private[graft] def provenance(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), urlCol.as("url"))
      .withColumn("domain", domainOf(col("url")))

  /** c96: per-domain document caps — the C4/RefinedWeb anti-dominance
    * move: keep at most k docs per registrable domain, best-first by
    * quality score (c41's mean_prob_r), so no single domain floods the
    * training mix. Skew-safe two-phase top-k (c50's machinery keyed by
    * domain): a salted local window prunes each (domain, salt) slice to
    * k before the global per-domain window runs, so a hot domain never
    * funnels its full row set through one partition — at 100 TB the
    * pathological domain is exactly the one the cap exists for. The
    * oracle keeps the single-window formulation (equal because the sort
    * key is total — the SeqColumn rule). */
  /** Generic per-domain cap over any (doc_id, url, text) frame — the
    * production shape, where URLs are real. Quality is c41's score
    * computed over the given frame (words∘lower — the same tokens fn
    * the gate's corpus scorer uses), so the gate row and a real-URL
    * pipeline share the policy by construction. */
  def domainCapOn(docs: DataFrame, k: Int = 10, salts: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col("doc_id"), domainOf(col("url")).as("domain"))
      .join(TextOps.freqScoreOn(docs.select(col("doc_id"), col("text")),
          t => TextOps.words(lower(t)))
        .select("doc_id", "mean_prob_r"), "doc_id")
    val local = Window.partitionBy(col("domain"), pmod(col("doc_id"), lit(salts)))
      .orderBy(desc("mean_prob_r"), asc("doc_id"))
    val global = Window.partitionBy("domain")
      .orderBy(desc("mean_prob_r"), asc("doc_id"))
    scored
      .withColumn("lrnk", row_number().over(local))
      .filter(col("lrnk") <= k) // ≤ k·salts survivors per domain
      .withColumn("rnk", row_number().over(global).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col("domain"), col("rnk"), col("doc_id"), col("mean_prob_r"))
      .orderBy("domain", "rnk")
  }

  def c96DomainCap(spark: SparkSession, dir: String, k: Int = 10,
                   salts: Int = 8): DataFrame =
    domainCapOn(provenance(spark, dir), k, salts)

  /** Blocklisted domains — an at-rest policy artifact in production;
    * inlined as a literal here so the oracle pins the same list (the
    * c52 drift-pinning rule applied to policy). */
  private[graft] val DefaultBlocklist: Seq[String] =
    Seq("src3.example.com", "src7.example.com", "src13.example.com")

  /** c97: the per-domain curation REPORT — what a corpus owner reviews
    * before a training run: per registrable domain, its document count,
    * token mass (c32's whitespace convention), corpus share (exact-
    * integer half-away 6-dp — the r14 tie rule), and whether the
    * blocklist drops it. One groupBy(domain) + a 1-row total join —
    * O(domains) output, map-side combinable, nothing corpus-quadratic;
    * the filter stage a pipeline derives from this report is one
    * `isin`/anti-join on the domain column. */
  /** Generic per-domain report over any (doc_id, url, text) frame —
    * the production shape; see [[c97DomainStats]]. */
  def domainStatsOn(docs: DataFrame,
                    blocklist: Seq[String] = DefaultBlocklist): DataFrame = {
    val base = docs
      .select(domainOf(col("url")).as("domain"),
        size(TextOps.words(col("text"))).cast("bigint").as("n_tokens"))
    val perDomain = base.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val total = perDomain.agg(sum(col("n_docs")).as("total_docs"))
    perDomain.crossJoin(total)
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        (expr("(2*n_docs*1000000 + total_docs) div (2*total_docs)")
          .cast("double") / 1e6).as("share_r"),
        col("domain").isin(blocklist: _*).as("is_blocked"))
      .orderBy("domain")
  }

  def c97DomainStats(spark: SparkSession, dir: String,
                     blocklist: Seq[String] = DefaultBlocklist): DataFrame =
    domainStatsOn(provenance(spark, dir), blocklist)
}
