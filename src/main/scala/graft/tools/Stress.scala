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

  /** `Stress skew [n]` — deliberate hot-key stress (SURVEY §4 evidence):
    * lineitem ×n with 60% of all rows redirected onto ONE orderkey and
    * events ×n with 50% of rows on one user, then the join-shaped
    * operators timed with AQE skew-join ON vs OFF on identical data.
    * Broadcast is disabled (threshold −1) so the joins actually
    * sort-merge — at local scale every dim would broadcast and skew
    * would never engage — and the AQE skew thresholds are scaled to the
    * local data size (8 MB hot-partition trigger / 4 MB advisory) the
    * way a cluster's defaults (256 MB) relate to real partitions.
    * Expected shape: the raw fact⋈orders probe collapses the hot
    * straggler when the toggle is ON; b3 stays ~flat BECAUSE its eager
    * per-orderkey aggregation shrinks the hot key to one row before the
    * join (the design claim under test); c13 stays skewed either way —
    * its per-user session window is not a join, which is exactly why
    * grouped-top-k paths salt (c50) and sessionization at 100 TB
    * partitions by time range first. */
  private def skewProbe(spark: SparkSession, dir: String, n: Int): Unit = {
    import graft.operators.Relational
    val base = "/tmp/graft_stress_skew"
    def rep(df: DataFrame, idCol: String): DataFrame =
      df.withColumn("__r", explode(sequence(lit(0), lit(n - 1))))
        .withColumn(idCol, col(idCol) + col("__r") * 10000000L)
        .drop("__r")

    val hotKey = Tables.orders(spark, dir)
      .agg(min(col("o_orderkey"))).head().getLong(0)
    // 60% of replicated lineitem rows on one orderkey (which exists in
    // orders, so the join is semantically honest). Payload columns are
    // hash-jittered FIRST (while the replicated orderkey is still
    // distinct): replica copies would dictionary-compress so well that
    // the hot partition's COMPRESSED shuffle bytes — what AQE's skew
    // detector measures — sat at barely 2× the median while holding 15×
    // the rows (measured r10); incompressible payload makes bytes track
    // rows the way distinct real-world fact rows do
    rep(Tables.lineitem(spark, dir), "l_orderkey")
      .withColumn("l_partkey",
        xxhash64(col("l_orderkey"), col("l_partkey"), col("l_linenumber")))
      .withColumn("l_suppkey", xxhash64(col("l_partkey"), lit(1)))
      .withColumn("l_extendedprice",
        pmod(xxhash64(col("l_partkey"), lit(2)), lit(100000L)).cast("double") / 100.0)
      .withColumn("l_discount",
        pmod(xxhash64(col("l_partkey"), lit(3)), lit(100L)).cast("double") / 1000.0)
      .withColumn("l_tax",
        pmod(xxhash64(col("l_partkey"), lit(4)), lit(80L)).cast("double") / 1000.0)
      .withColumn("l_orderkey",
        when(pmod(col("l_linenumber") + col("l_partkey"), lit(5)) < 3, lit(hotKey))
          .otherwise(col("l_orderkey")))
      .write.mode("overwrite").parquet(s"$base/lineitem.parquet")
    rep(Tables.orders(spark, dir), "o_orderkey")
      .write.mode("overwrite").parquet(s"$base/orders.parquet")
    Seq("customer", "nation", "region").foreach(t =>
      Tables.load(spark, dir, t).write.mode("overwrite").parquet(s"$base/$t.parquet"))
    rep(Tables.events(spark, dir), "event_id")
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(2)) === 0, lit(0L)).otherwise(col("user_id")))
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val nRows = Tables.lineitem(spark, base).count()
    println(s"[stress] skew corpus x$n at $base ($nRows lineitem rows, " +
      s"hot orderkey $hotKey)")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for (skew <- Seq(true, false); pass <- 1 to 3) {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew.toString)
        // raw fact⋈dim sort-merge join on the hot key: the shape AQE's
        // skew splitter exists for (no pre-aggregation to save it)
        // full payload rides the shuffle (a real fact join's shape) so
        // the hot partition is hot in BYTES, not only in row count
        val raw = Tables.lineitem(spark, base)
          .join(Tables.orders(spark, base), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            avg(col("l_quantity")).as("q"),
            avg(col("l_extendedprice")).as("ep"),
            avg(col("l_partkey").cast("double") + col("l_suppkey").cast("double")).as("pk"),
            max(col("l_shipdate")).as("sd"),
            avg(col("l_discount") + col("l_tax")).as("dt"))
        // collect (3 rows) so the introspected queryExecution below is the
        // SAME execution that was timed (count() would plan separately)
        timed(s"raw fact join skewJoin=$skew pass=$pass") { raw.collect().length.toLong }
        if (pass == 1) {
          val s = (raw.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.executedPlan
            case p => p
          }).toString
          println(s"[stress] raw join skewJoin=$skew plan has skewed read: " +
            s.contains("skewed"))
        }
        timed(s"b3 multiway skewJoin=$skew pass=$pass") {
          Relational.b3JoinMultiway(spark, base).count()
        }
        timed(s"c13 sessionize skewJoin=$skew pass=$pass") {
          Relational.c13Sessionize(spark, base).count()
        }
      }
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** `Stress bucketed [replicas] [batches]` — measured evidence for the
    * d25/d26/d27 at-scale claim (SURVEY §4): a stream-static join
    * re-executes its static side EVERY micro-batch, so an UNBUCKETED
    * fingerprint index pays a corpus-side exchange per batch, while the
    * same index written `bucketBy(fp)` plans the static side
    * shuffle-free — only the tiny arrival batch exchanges into the
    * bucketing. Runs a REAL MemoryStream through streamWinnowMatch (the
    * d25 operator) against both index forms with broadcast disabled (at
    * local scale the index would broadcast and the claim could not be
    * observed; at 100 TB it cannot broadcast), asserts the per-batch
    * plan shapes from the live query's lastExecution, and times the
    * drains. */
  private def bucketedProbe(spark: SparkSession, dir: String,
                            replicas: Int, nBatches: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "/tmp/graft_stress_bucketed"
    // corpus side: documents ×replicas (shifted ids, suffixed texts so
    // fingerprints spread), fingerprinted once — the `Main fingerprint
    // --index` artifact
    val docs = Tables.documents(spark, dir)
      .withColumn("__r", explode(sequence(lit(0), lit(replicas - 1))))
      .withColumn("doc_id", col("doc_id") + col("__r") * 10000000L)
      .withColumn("text", concat(col("text"), lit(" r"), col("__r").cast("string")))
      .drop("__r")
    val idx = TextOps.winnowIndex(docs.select("doc_id", "text"))
    idx.write.mode("overwrite").parquet(s"$base/fpidx_plain")
    spark.sql("DROP TABLE IF EXISTS graft_stress_fpidx_bucketed")
    idx.write.mode("overwrite")
      .bucketBy(32, "fp").sortBy("fp")
      .option("path", s"$base/fpidx_bucketed")
      .saveAsTable("graft_stress_fpidx_bucketed")
    val nIdx = spark.read.parquet(s"$base/fpidx_plain").count()
    // arrival batches: a rolling slice of the raw corpus (realistic probe
    // mix — most arrivals match something at rest)
    val arrivals = Tables.documents(spark, dir)
      .select(col("doc_id") + 900000000L, col("text"))
      .as[(Long, String)].take(nBatches * 50)
      .grouped(50).toSeq
    println(s"[stress] fp index: $nIdx rows x2 forms at $base; " +
      s"${arrivals.size} batches of 50 arrivals")
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (bucketed <- Seq(false, true)) {
        val index =
          if (bucketed) spark.table("graft_stress_fpidx_bucketed")
          else spark.read.parquet(s"$base/fpidx_plain")
        val stream =
          org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
        val q = graft.streaming.StreamOps.streamWinnowMatch(
            stream.toDS().toDF("doc_id", "text"), index)
          .writeStream.outputMode("append").format("noop").start()
        try {
          // warm batch (plan/codegen) outside the clock
          stream.addData(arrivals.head); q.processAllAvailable()
          val t0 = System.nanoTime()
          arrivals.tail.foreach { b =>
            stream.addData(b); q.processAllAvailable()
          }
          val sec = (System.nanoTime() - t0) / 1e9
          val plan = q match {
            case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
              w.streamingQuery.lastExecution.executedPlan.toString
            case _ => "<unavailable>"
          }
          // count the shuffle nodes in the EXECUTED plan only — the AQE
          // toString appends an "== Initial Plan ==" section that would
          // double-count every exchange (ReusedExchange deliberately not
          // counted: it re-reads, not re-shuffles)
          val finalPlan = plan.split("== Initial Plan ==").head
          val nExchanges = "Exchange hashpartitioning".r
            .findAllIn(finalPlan).length
          val bucketedScan = plan.contains("SelectedBucketsCount") ||
            plan.contains("Bucketed: true")
          if (sys.env.contains("GRAFT_STRESS_DUMP_PLANS"))
            java.nio.file.Files.write(java.nio.file.Paths.get(
              s"/tmp/graft_stress_plan_bucketed_$bucketed.txt"),
              plan.getBytes("UTF-8"))
          println(f"[stress] bucketed=$bucketed drain(${arrivals.size - 1} " +
            f"batches)=$sec%.2f s, per-batch plan exchanges=$nExchanges, " +
            s"bucketed scan=$bucketedScan")
          if (bucketed) {
            assert(bucketedScan,
              "bucketed run must actually read the bucketed table")
            assert(nExchanges == 1,
              s"bucketed static side must be shuffle-free (exactly the " +
                s"arrival-batch exchange remains), got $nExchanges:\n$plan")
          } else assert(nExchanges == 2,
            s"unbucketed run must show the per-batch corpus-side exchange " +
              s"(stream + static), got $nExchanges:\n$plan")
        } finally q.stop()
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      spark.sql("DROP TABLE IF EXISTS graft_stress_fpidx_bucketed")
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.headOption.contains("bucketed")) {
      bucketedProbe(spark, dir,
        args.drop(1).headOption.map(_.toInt).getOrElse(8),
        args.drop(2).headOption.map(_.toInt).getOrElse(10))
      spark.stop()
      return
    }
    if (args.headOption.contains("skew")) {
      skewProbe(spark, dir, args.drop(1).headOption.map(_.toInt).getOrElse(4))
      spark.stop()
      return
    }
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
    time("c52 bpe tokenize")(TextOps.c52BpeTokenize(spark, base).count())
    time("c55 bm25")(TextOps.c55Bm25(spark, base).count())
    time("c56 lm score")(TextOps.c56LmScore(spark, base).count())
    time("c57 winnow")(TextOps.c57Winnow(spark, base).count())
    time("c59 rrf fuse")(TextOps.c59RrfFuse(spark, base).count())
    // worst-case for the span family: every replica shares its whole
    // text (mod the replica tag), so ~all shingles are duplicated and
    // c63's coverage explode touches ~n_tokens × n positions
    time("c62 dup spans")(Dedup.c62DupSpans(spark, base).count())
    time("c63 span scrub")(Dedup.c63SpanScrub(spark, base).count())
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
