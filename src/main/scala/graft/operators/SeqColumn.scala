package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Ordering-preserving sequence column (SURVEY §2 a4).
  *
  * Bolson optionally tags every record with a contiguous uint64 `seq` so
  * downstream consumers can restore arrival order (reference:
  * src/bolson/parse/arrow.cpp:148-170, `--arrow-seq-col`).
  *
  * The scalable Spark equivalent is NOT `row_number() OVER ()` — an empty
  * window frame collapses to a single partition and dies at 100 TB.
  * Instead: range-repartition + per-partition sort, then `zipWithIndex`,
  * which computes per-partition counts with one lightweight job and assigns
  * offsets without any further shuffle. O(rows) work, O(partitions) driver
  * state.
  */
object SeqColumn {

  def withSeq(df: DataFrame, sortCols: Seq[String], seqName: String = "seq"): DataFrame = {
    val spark = df.sparkSession
    val cols = sortCols.map(col)
    val sorted = df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*)
    val schema = sorted.schema.add(seqName, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  /** Seq in ARRIVAL order: contiguous ids following the existing partition
    * order with no repartition or sort — bolson's --arrow-seq-col contract
    * (records tagged in the order received). Use for streaming
    * micro-batches where the source preserves arrival order per partition
    * (e.g. the socket source's single partition). */
  def withSeqInArrivalOrder(df: DataFrame, seqName: String = "seq"): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(seqName, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  /** a4: seq column over documents in doc_id order. */
  def a4SeqColumn(spark: SparkSession, dir: String): DataFrame =
    withSeq(Tables.documents(spark, dir), Seq("doc_id"))
      .select("doc_id", "seq")
      .orderBy("doc_id")
}
