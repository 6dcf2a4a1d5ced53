package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** A multimodal record: opaque media bytes + typed metadata. At scale the
  * payload column holds real image/audio/video bytes (parquet binary with
  * dictionary encoding off); here it is derived deterministically from the
  * documents table because the container ships no codecs (SURVEY §2 c12). */
case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

/** Output of the (stubbed) decoder — the schema a real image/audio decode
  * would produce: byte size, boundary bytes, and a frame count. */
case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                         first_byte: Int, last_byte: Int, n_frames: Long)

/** Multimodal-column plumbing (SURVEY §2 c12).
  *
  * The Spark-side shape is real: a typed `Dataset[MediaRecord]` with a
  * binary payload column, batch-iterated per partition exactly where a
  * Pandas-UDF / JNI decoder would sit, producing a typed features frame.
  * Only `decodeStub` is fake — it reads deterministic byte features so the
  * pipeline is testable and oracle-checkable without codecs. Swapping in a
  * real decoder changes one function, not the plan.
  */
object Multimodal {

  /** Media table derived from documents: payload = UTF-8 text bytes,
    * media_type assigned round-robin. Per-partition parallelism comes from
    * the parquet splits — payload bytes never move through a shuffle. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decoder — deterministic byte features standing in for a real
    * image/audio decode (no codec libraries in this container). A real
    * implementation decodes `r.payload` here, inside the partition
    * iterator, with no change to the surrounding plan. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val b = r.payload
    MediaFeatures(r.doc_id, r.media_type, b.length.toLong,
      b.head & 0xFF, b.last & 0xFF, b.length / 100 + 1)
  }

  /** c12: decode/feature-extract over the media table — mapPartitions so a
    * real decoder could amortize per-batch setup (codec contexts, GPU
    * handles) across the partition. */
  def c12Multimodal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy("doc_id")
  }
}
