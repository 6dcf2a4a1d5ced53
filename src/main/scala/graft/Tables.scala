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
