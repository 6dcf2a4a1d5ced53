package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
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
  * Instead: per-partition counts (zipWithIndex's one lightweight count
  * job) → cumulative offsets → per-partition index assignment, no extra
  * shuffle. The whole path stays on InternalRow (`queryExecution.toRdd` in,
  * `internalCreateDataFrame` out): no external-Row conversion, no encoder
  * round-trip, and the appended index rides in a reused JoinedRow exactly
  * like any streamed operator output.
  *
  * A single RDD lineage matters for more than speed: the range repartition
  * SAMPLES its child to pick bounds (seeded by RDD id), so two separate
  * executions — e.g. a count branch and an output branch as distinct
  * DataFrame subtrees — can disagree on partition membership and corrupt
  * the offsets. zipWithIndex's count job and final job share one lineage,
  * so the sampled bounds are computed once and reused.
  */
object SeqColumn {

  /** Adds contiguous ids in the CURRENT partition order of `df`. */
  private def addSeq(df: DataFrame, seqName: String): DataFrame = {
    val schema = df.schema.add(seqName, LongType, nullable = false)
    val rdd = df.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      val joined = new JoinedRow
      val idx = new GenericInternalRow(1)
      it.map { case (row, i) =>
        idx.setLong(0, i)
        joined(row, idx): InternalRow
      }
    }
    ColumnBridge.internalCreateDataFrame(df.sparkSession, rdd, schema)
  }

  def withSeq(df: DataFrame, sortCols: Seq[String], seqName: String = "seq"): DataFrame = {
    val cols: Seq[Column] = sortCols.map(col)
    addSeq(df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*), seqName)
  }

  /** Seq in ARRIVAL order: contiguous ids following the existing partition
    * order with no repartition or sort — bolson's --arrow-seq-col contract
    * (records tagged in the order received). Use for streaming
    * micro-batches where the source preserves arrival order per partition
    * (e.g. the socket source's single partition). */
  def withSeqInArrivalOrder(df: DataFrame, seqName: String = "seq"): DataFrame =
    addSeq(df, seqName)

  /** a4: seq column over documents in doc_id order. */
  def a4SeqColumn(spark: SparkSession, dir: String): DataFrame =
    withSeq(Tables.documents(spark, dir), Seq("doc_id"))
      .select("doc_id", "seq")
      .orderBy("doc_id")
}
