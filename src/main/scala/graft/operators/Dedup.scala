package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators (SURVEY §2 c1-c4).
  *
  * Exact dedup is a hash-shuffle groupBy on content; at 100 TB the group key
  * is `(md5(text), length)` so the shuffle carries 40-byte keys instead of
  * document bodies, and only colliding groups compare full text.
  */
object Dedup {

  /** c1: exact dedup — canonical (minimum) doc_id per distinct text, with
    * the duplicate count. */
  def c1DedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_key"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies", "content_key")
      .orderBy("doc_id")
}
