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

/** Output of the (stubbed) resize — a real implementation holds the
  * re-encoded image; the stub carries a deterministic w×h byte crop. */
case class ResizedMedia(doc_id: Long, media_type: String,
                        width: Int, height: Int, payload: Array[Byte])

/** One sampled frame of a video payload. */
case class MediaFrame(doc_id: Long, frame_idx: Long, frame_bytes: Array[Byte])

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
    // empty payloads decode to sentinel boundary bytes instead of crashing
    MediaFeatures(r.doc_id, r.media_type, b.length.toLong,
      if (b.isEmpty) -1 else b.head & 0xFF,
      if (b.isEmpty) -1 else b.last & 0xFF,
      b.length / 100 + 1)
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

  /** STUB resize — a real image pipeline decodes, scales to w×h, and
    * re-encodes; the stub deterministically crops/cycles the payload to
    * exactly w·h bytes so downstream schema/partitioning is exercised
    * with realistic per-record output sizing. */
  def resize(records: Dataset[MediaRecord], width: Int, height: Int): Dataset[ResizedMedia] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map { r =>
      val n = width * height
      val out = new Array[Byte](n)
      if (r.payload.nonEmpty) {
        var i = 0
        while (i < n) { out(i) = r.payload(i % r.payload.length); i += 1 }
      }
      ResizedMedia(r.doc_id, r.media_type, width, height, out)
    })
  }

  /** STUB frame sampling — a real implementation demuxes the container and
    * keeps every `everyNth` frame; the stub treats the payload as
    * fixed-size frames of `frameBytes` and keeps every `everyNth` chunk.
    * Video records only; one output row per sampled frame (the explode
    * shape a 100 TB video pipeline shuffles by). */
  def frameSample(records: Dataset[MediaRecord], frameBytes: Int,
                  everyNth: Int): Dataset[MediaFrame] = {
    import records.sparkSession.implicits._
    records.filter(_.media_type == "video").mapPartitions(_.flatMap { r =>
      val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
      (0 until nFrames by everyNth).iterator.map { f =>
        val from = f * frameBytes
        val until = math.min(from + frameBytes, r.payload.length)
        MediaFrame(r.doc_id, f.toLong, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    })
  }
}
