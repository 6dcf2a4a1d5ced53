package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ipc.ArrowIpc
import graft.operators.SeqColumn
import graft.sources.JsonConvert
import graft.streaming.{FilePublisher, StreamPipeline}

/** CLI mirroring bolson's surface (reference: src/bolson/cli.cpp — the
  * `stream` and `bench` subcommands with --max-rows / --max-ipc /
  * --arrow-seq-col): a user of the reference points the same ND-JSON
  * socket feed at `graft stream` and gets the same bounded Arrow IPC
  * messages, published here to a directory (one standalone .arrow file
  * per message) instead of a Pulsar topic.
  *
  * Usage:
  *   graft.Main stream --host H --port P --out DIR
  *     [--schema battery|trip] [--schema-ddl "col TYPE, ..."]
  *     [--max-rows N] [--max-ipc BYTES] [--codec none|lz4|zstd]
  *     [--seq-col] [--idle-timeout-ms T]
  *     [--batch] [--batch-max-messages N] [--batch-max-bytes B]
  *     [--batch-max-delay MS]   (≙ bolson --pulsar-batch*)
  *   graft.Main bench     (delegates to graft.Bench)
  *   graft.Main verify SF_DIR OUT_DIR   (delegates to graft.Verify)
  */
object Main {

  private def opt(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(name)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("bench") => Bench.main(args.drop(1))
    case Some("verify") => Verify.main(args.drop(1))
    case Some("stream") => stream(args.drop(1))
    case _ =>
      System.err.println("usage: graft.Main stream|bench|verify ...")
      sys.exit(2)
  }

  private def stream(args: Array[String]): Unit = {
    val host = opt(args, "--host").getOrElse("127.0.0.1")
    val port = opt(args, "--port").getOrElse(sys.error("--port required")).toInt
    val out = opt(args, "--out").getOrElse(sys.error("--out required"))
    val maxRows = opt(args, "--max-rows").map(_.toInt).getOrElse(4096)
    val maxIpc = opt(args, "--max-ipc").map(_.toLong).getOrElse(5L * 1024 * 1024)
    val codec = opt(args, "--codec").getOrElse("none")
    ArrowIpc.validateCodec(codec) // fail at CLI parse, not first micro-batch
    val seqCol = args.contains("--seq-col")
    val idleMs = opt(args, "--idle-timeout-ms").map(_.toLong)
    // producer batching ≙ bolson --pulsar-batch / --pulsar-batch-max-*
    // (reference: src/bolson/publish/publisher.cpp:265-276): one envelope
    // file per flush instead of one file per message
    val batching = args.contains("--batch")
    val batchOpts = graft.streaming.BatchingOptions(
      maxMessages = opt(args, "--batch-max-messages").map(_.toInt).getOrElse(1000),
      maxBytes = opt(args, "--batch-max-bytes").map(_.toLong).getOrElse(128L * 1024),
      maxDelayMs = opt(args, "--batch-max-delay").map(_.toLong).getOrElse(10L))
    def mkPublisher(batchId: Long): graft.streaming.Publisher =
      if (batching) new graft.streaming.BatchingFilePublisher(out, batchOpts, epoch = batchId)
      else new FilePublisher(out, epoch = batchId)
    val schema: StructType = (opt(args, "--schema"), opt(args, "--schema-ddl")) match {
      case (Some("battery"), _) => JsonConvert.Schemas.battery
      case (Some("trip"), _) => JsonConvert.Schemas.trip
      case (_, Some(ddl)) => StructType.fromDDL(ddl)
      case _ => sys.error("--schema battery|trip or --schema-ddl required")
    }

    val spark = GraftSession.get()
    val lines = spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

    // bolson's --arrow-seq-col: contiguous u64 ordering across the whole
    // stream — per micro-batch the driver carries the running offset, and
    // SeqColumn assigns contiguous ids inside the batch without a global
    // sort (per-partition counts + offsets).
    var seqOffset = 0L
    @volatile var lastProgress = System.currentTimeMillis()
    val query = StreamPipeline.convert(lines, schema).writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val df = batch.toDF().persist()
        try {
          val withSeq =
            if (!seqCol) df
            else SeqColumn.withSeqInArrivalOrder(df)
              .withColumn("seq", col("seq") + seqOffset)
          // epoch = micro-batch id: batch ids restart per serialize() call,
          // so files would overwrite across micro-batches without it
          val stats = graft.streaming.Publish.run(
            ArrowIpc.serialize(withSeq, maxRows, maxIpc, codec),
            () => mkPublisher(batchId))
          // advance the offset by an EXACT job-result count, not the
          // publish accumulator: retried/speculative tasks re-add to
          // accumulators and would silently break seq contiguity (count()
          // on the cached batch is cheap and retry-safe)
          if (seqCol) seqOffset += df.count()
          if (stats.rows > 0) lastProgress = System.currentTimeMillis()
        } finally df.unpersist()
        ()
      }
      .start()

    idleMs match {
      case Some(t) =>
        while (System.currentTimeMillis() - lastProgress < t) {
          query.processAllAvailable()
          Thread.sleep(100)
        }
        query.stop()
      case None => query.awaitTermination()
    }
    // no spark.stop(): the session may be shared (getOrCreate); CLI exit
    // tears it down with the JVM
  }
}
