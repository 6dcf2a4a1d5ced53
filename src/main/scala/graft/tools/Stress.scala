package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ipc.ArrowIpc
import graft.operators.{Dedup, Similarity, TextOps}
import graft.streaming.StreamPipeline

/** Scaling-cliff probe (dev aid): replicates the sf0.1 tables ×N with
  * shifted ids and times the shuffle-heavy operators — wall time should
  * grow ~linearly with N for the banded/bucketed operators (candidate
  * pairs grow ~N when near-dups are per-replica... replicated corpora
  * inflate exact-dup clusters, so c2's pair count is a worst case here,
  * not a bug). Uses replication only for timing, never for correctness. */
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.headOption.map(_.toInt).getOrElse(10)

    def rep(df: DataFrame, idCol: String): DataFrame = {
      val span = 10000000L
      df.withColumn("__r", explode(sequence(lit(0), lit(n - 1))))
        .withColumn(idCol, col(idCol) + col("__r") * span)
        .drop("__r")
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }

    // write replicated tables once so scans are realistic (not recomputed explodes)
    val base = "/tmp/graft_stress"
    rep(Tables.documents(spark, dir), "doc_id")
      // de-dup texts per replica so candidate pairs don't explode quadratically
      .withColumn("text", concat(col("text"), lit(" r"), (col("doc_id") / 10000000L).cast("long").cast("string")))
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    rep(Tables.embeddings(spark, dir), "vec_id")
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    rep(Tables.events(spark, dir), "event_id")
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    println(s"[stress] replicated x$n at $base")

    time("c2 minhash")(Dedup.c2DedupMinhash(spark, base).count())
    time("c3 simhash")(Dedup.c3DedupSimhash(spark, base).count())
    time("c19 cluster")(Dedup.c19DedupCluster(spark, base).count())
    time("c20 pii scrub")(TextOps.c20PiiScrub(spark, base).count())
    time("c21 repetition")(TextOps.c21RepetitionRatio(spark, base).count())
    time("c6 ann lsh")(Similarity.c6AnnLsh(spark, base).count())
    time("c11 near-dup")(Similarity.c11EmbedNearDup(spark, base).count())
    time("c27 bloom decontam")(TextOps.c27BloomDecontam(spark, base).count())
    time("c28 random projection")(Similarity.c28RandomProjection(spark, base).count())
    time("c30 cluster split")(Dedup.c30ClusterSplit(spark, base).count())
    time("c31 kmeans step")(Similarity.c31KmeansStep(spark, base).count())
    time("c34 vocab")(TextOps.c34VocabTopk(spark, base).count())
    time("c35 quality filter")(TextOps.c35QualityFilter(spark, base).count())
    time("c36 pq quantize")(Similarity.c36PqQuantize(spark, base).count())
    time("c37 incremental dedup")(Dedup.c37IncrementalDedup(spark, base).count())
    time("c38 pq search")(Similarity.c38PqSearch(spark, base).count())
    time("c39 chunk")(TextOps.c39Chunk(spark, base).count())
    time("c40 shuffle shard")(TextOps.c40ShuffleShard(spark, base).count())
    time("c41 freq score")(TextOps.c41FreqScore(spark, base).count())
    time("c42 banded sample")(TextOps.c42BandedSample(spark, base).count())
    time("c43 semantic dedup")(Similarity.c43SemanticDedup(spark, base).count())
    time("c44 bpe pairs")(TextOps.c44BpePairs(spark, base).count())
    time("c45 embed moments")(Similarity.c45EmbedMoments(spark, base).count())
    time("c46 power iter")(Similarity.c46PowerIter(spark, base).count())
    time("c47 whiten")(Similarity.c47Whiten(spark, base).count())
    time("c48 sample exact")(TextOps.c48SampleExact(spark, base).count())
    time("c49 snapshot diff")(TextOps.c49SnapshotDiff(spark, base).count())
    time("c50 group budget")(TextOps.c50GroupBudget(spark, base).count())
    time("c51 png codec")(
      graft.operators.Multimodal.c51ImageCodec(spark, base).count())
    time("b21 window dedup")(
      graft.operators.Relational.b21WindowDedup(spark, base).count())
    time("power iterate x3")(Similarity.powerIterate(spark, base, rounds = 3).count())
    time("ivfpq nprobe=2")(Similarity.ivfPqSearch(spark, base, nprobe = 2).count())
    val ev = Tables.events(spark, base).select(
      col("event_id"), unix_micros(col("ts")).as("ts_us"),
      col("user_id"), col("event_type"), col("value"))
    val lines = ev.select(to_json(struct(ev.columns.map(col): _*)).as("value"))
    time("convert json->ipc")(
      ArrowIpc.serialize(StreamPipeline.convert(lines, ev.schema), maxRows = 4096)
        .toDF().count())
    spark.stop()
  }
}
