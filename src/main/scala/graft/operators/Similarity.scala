package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over embedding columns (SURVEY §2 c5, c6, c11).
  *
  * Brute-force top-k is the correctness baseline: broadcast the (small)
  * query set, score candidates in a single codegen'd pass (zip_with +
  * aggregate — no UDF), keep top-k per query with a window. At cluster
  * scale the candidate side streams from parquet splits; only k rows per
  * query per partition survive the partial top-k.
  */
object Similarity {

  /** Elementwise ops in double precision (embeddings are float32 on disk;
    * scoring in f64 keeps accumulation order-stable and engine-portable). */
  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** c5: brute-force cosine top-k. Query vectors: vec_id < 5 (broadcast);
    * candidates: the rest. */
  def c5AnnBrute(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = broadcast(
      e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("qv")))
    val candidates = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("neighbor_id"), toDouble(col("embedding")).as("cv"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    candidates.crossJoin(queries)
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine_r"))
      .orderBy("query_id", "rnk")
  }
}
