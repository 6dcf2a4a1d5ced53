package graft.ipc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Verify-gate entry points for the IPC path (SURVEY §2 a5, a6). */
object IpcQueries {

  /** a5: batch resize — documents stream through the IPC writer with
    * maxRows=128; output is (batch_id, n_rows) per emitted batch, proving
    * every batch respects the cap and nothing is lost (Σ n_rows = N).
    *
    * The single sorted partition here is a determinism harness for the
    * oracle (batch boundaries must be reproducible in SQL); production use
    * runs the same writer on every scan partition independently — the cap
    * is enforced per partition, so parallelism never changes batch sizes,
    * only batch count. */
  def a5BatchResize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text", "n_chars")
      .repartition(1).sortWithinPartitions("doc_id")
    ArrowIpc.serialize(docs, maxRows = 128)
      .select(col("batch_id"), col("n_rows"))
      .orderBy("batch_id")
  }

  /** a6: IPC serialization round-trip — events rows → Arrow IPC stream
    * messages (≤64 KiB each) → rows. The oracle is the identity query, so
    * any value lost or mangled in the Arrow wire format hash-mismatches.
    * Timestamps are compared in integer epoch-micros (the IPC unit). */
  def a6IpcSerialize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsFanned(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val schema = ev.schema
    val messages = ArrowIpc.serialize(ev, maxRows = 2048, maxIpcBytes = 64 * 1024)
    ArrowIpc.deserialize(spark, messages, schema)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .transform(graft.operators.Relational.gateOrder("event_id"))
  }
}
