package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish star schema (TESTDATA.md).
  *
  * All graft operators take these DataFrames as input; at cluster scale the
  * same code reads partitioned/bucketed parquet from object storage — the
  * scan parallelism comes from `spark.sql.files.maxPartitionBytes` splits.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Total on-disk bytes under a path (file or directory), from filesystem
    * metadata only — the input to the scan-parallelism floor below. Cached
    * per path: immutable driver corpora, and the floor must not pay a
    * listing per plan build. */
  private val bytesCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def pathBytes(path: String): Long =
    bytesCache.computeIfAbsent(path, p => {
      try {
        val conf = new org.apache.hadoop.conf.Configuration()
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(conf)
        def walk(st: org.apache.hadoop.fs.FileStatus): Long =
          if (st.isDirectory) fs.listStatus(st.getPath).map(walk).sum
          else st.getLen
        java.lang.Long.valueOf(walk(fs.getFileStatus(hp)))
      } catch {
        case scala.util.control.NonFatal(e) =>
          // unknown size reads as "big": the floor becomes a no-op rather
          // than forcing a shuffle onto a corpus it cannot size
          System.err.println(s"[graft] pathBytes($p) failed — scan fan-out " +
            s"disabled for this path: $e")
          java.lang.Long.valueOf(Long.MaxValue)
      }
    }).longValue()

  /** Scan-parallelism floor (r20, optimization guide §2/§6): a fact table
    * whose parquet layout yields fewer scan splits than the session's
    * shuffle parallelism is fanned out by an explicit hash repartition on
    * its primary key — otherwise every row-local stage (regex extraction,
    * tokenization, media decode) runs on a handful of tasks no matter how
    * many cores the box has (the driver corpora are single-row-group
    * files: ONE scan task each). Deliberate choices:
    *  - conditional on file size vs `spark.sql.files.maxPartitionBytes`:
    *    at cluster scale the scan already yields >= parallelism splits and
    *    this is a NO-OP — the shuffle exists only where the alternative is
    *    idle cores, never on a corpus that already parallelizes;
    *  - explicit N (the session shuffle-partition count): per-row compute
    *    cost is invisible to AQE's byte-based heuristics, which would
    *    coalesce a few-MB exchange back to one partition (the r16 lesson
    *    phashCandidates documents);
    *  - hash on the primary key, not round-robin: deterministic under
    *    retry (guide §2.5), no sort-before-repartition pass, and
    *    downstream joins/groupBys on the same key reuse the partitioning
    *    (b-series doc_id/orderkey folds skip their own exchange). */
  private def fanOut(spark: SparkSession, df: DataFrame, path: String,
                     keys: Seq[String]): DataFrame = {
    val n = spark.sessionState.conf.numShufflePartitions
    val maxPB = spark.sessionState.conf.filesMaxPartitionBytes
    val scanParts = math.max(1L, (pathBytes(path) + maxPB - 1) / maxPB)
    if (scanParts < n) df.repartition(n, keys.map(col): _*) else df
  }
  /** Opt-in fanned variants (r20): the floor pays one exchange plus
    * ~30–100 ms of fixed task overhead × parallelism, so it is applied
    * ONLY where the scan-adjacent stage's per-row compute was measured
    * to dominate it (regex extraction, JSON parse, merge-apply
    * tokenization, exact-truth evals, fact-table partial aggregation) —
    * a blanket floor on every scan regressed 63 cheap queries ~1.3–2.5×
    * at sf0.1 (per-task partial-aggregate state and the doubled
    * range-sort sampling pass swamp trivial work; OPTIMIZATION_r20.md).
    * Memo/table builders also read these so their scratch parquet lands
    * as N part files and every later consumer scans in parallel without
    * paying any query-time exchange. */
  def lineitemFanned(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, lineitem(spark, dir), s"$dir/lineitem.parquet",
      Seq("l_orderkey", "l_linenumber"))
  def ordersFanned(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, orders(spark, dir), s"$dir/orders.parquet",
      Seq("o_orderkey"))
  def documentsFanned(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, documents(spark, dir), s"$dir/documents.parquet",
      Seq("doc_id"))
  def eventsFanned(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, events(spark, dir), s"$dir/events.parquet",
      Seq("event_id"))
  def embeddingsFanned(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, embeddings(spark, dir), s"$dir/embeddings.parquet",
      Seq("vec_id"))

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (Spark reads a bare
    * long under spark.sql.legacy.parquet.nanosAsLong — set in GraftSession /
    * Verify / Bench) and, since the r8 regeneration, as TIMESTAMP(MICROS)
    * without the UTC flag (Spark 4 reads TIMESTAMP_NTZ). Normalize every
    * variant to a microsecond TimestampType here so downstream operators
    * (`unix_micros`, window/range/as-of joins) see one column type. The
    * NTZ→TZ cast reinterprets the wall clock in the session time zone —
    * UTC everywhere in this project — so the micros value is unchanged,
    * matching DuckDB's naive-timestamp read of the same file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Exact row count from parquet footers only — no data pages are read, so
    * this is O(files), not O(rows). Used to size scale-adaptive plan
    * parameters (e.g. c11's LSH plane count) at plan-build time. Goes
    * through the Hadoop FileSystem API (not java.io.File) so any URI
    * Spark itself can read — local, HDFS, s3a — resolves, and recurses
    * into partitioned layouts. Returns 0 when the path is missing or
    * unreadable, WITH a loud stderr warning: callers fall back to their
    * minimum parameterization, and for the adaptive bucketing that
    * fallback is the quadratic shape the scheme exists to prevent —
    * a silent 0 here must never look like a small corpus. */
  def parquetRowCount(path: String): Long =
    try {
      val conf = new org.apache.hadoop.conf.Configuration()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      def footerRows(f: org.apache.hadoop.fs.Path): Long = {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try r.getRecordCount finally r.close()
      }
      def walk(st: org.apache.hadoop.fs.FileStatus): Long =
        if (st.isDirectory) fs.listStatus(st.getPath).map(walk).sum
        else if (st.getPath.getName.endsWith(".parquet")) footerRows(st.getPath)
        else 0L
      walk(fs.getFileStatus(p))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[graft] parquetRowCount($path) failed — scale-adaptive " +
            s"parameters fall back to their minimum: $e")
        0L
    }
}
