package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Multimodal

/** Dev-only corpus-shape printout (r21): per-modality doc/hash/clique
  * stats that price the [[graft.operators.Multimodal.spreadAttach]]
  * decision. Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.CliqueStats" */
object CliqueStats {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tables = Seq(
      "audio" -> Multimodal.audioHashTablePath(spark, dir),
      "image" -> Multimodal.phashIndexTablePath(spark, dir),
      "videofid" -> Multimodal.videoFidTablePath(spark, dir))
    tables.foreach { case (m, p) =>
      val h = spark.read.parquet(p).select("doc_id", "phash")
      val st = h.groupBy("phash").count()
        .agg(sum("count").as("docs"), count(lit(1)).as("hashes"),
          max("count").as("max_clique"))
        .collect()(0)
      println(f"[clique] $m%-9s docs=${st.getLong(0)}%8d " +
        f"hashes=${st.getLong(1)}%8d max_clique=${st.getLong(2)}%8d")
    }
    spark.stop()
  }
}
