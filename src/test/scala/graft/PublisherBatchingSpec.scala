package graft

import scala.collection.mutable.ArrayBuffer

import graft.ipc.IpcMessage
import graft.streaming.{BatchEnvelope, BatchingFilePublisher, BatchingOptions, BatchingPublisher}

/** Producer batching spec (bolson --pulsar-batch-max-messages/-bytes/-delay,
  * reference: src/bolson/publish/publisher.h:49-59): batch boundaries must
  * respect all three limits, close must flush the remainder, and the file
  * envelope must round-trip messages byte-exactly. */
class PublisherBatchingSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def msg(id: Long, size: Int): IpcMessage =
    IpcMessage(id, 1L, size.toLong, Array.fill[Byte](size)((id % 127).toByte))

  private def collectBatches(opts: BatchingOptions, clock: () => Long = () => 0L) = {
    val batches = ArrayBuffer[Seq[IpcMessage]]()
    (new BatchingPublisher(batches += _, opts, clock), batches)
  }

  test("max-messages limit bounds every batch; close flushes the remainder") {
    val (p, batches) = collectBatches(BatchingOptions(
      maxMessages = 4, maxBytes = Long.MaxValue, maxDelayMs = Long.MaxValue))
    p.open(0)
    (1 to 10).foreach(i => p.publish(msg(i.toLong, 8)))
    p.close()
    assert(batches.map(_.size) === Seq(4, 4, 2))
    assert(batches.flatten.map(_.batch_id) === (1L to 10L))
  }

  test("max-bytes limit closes a batch before it would overflow") {
    val (p, batches) = collectBatches(BatchingOptions(
      maxMessages = Int.MaxValue, maxBytes = 100L, maxDelayMs = Long.MaxValue))
    p.open(0)
    (1 to 6).foreach(i => p.publish(msg(i.toLong, 40))) // 3 × 40 > 100 ⇒ pairs ship
    p.close()
    assert(batches.nonEmpty)
    assert(batches.forall(b => b.map(_.bytes.length).sum <= 100L || b.size == 1))
    assert(batches.flatten.map(_.batch_id) === (1L to 6L))
  }

  test("an oversized single message still ships, alone") {
    val (p, batches) = collectBatches(BatchingOptions(
      maxMessages = Int.MaxValue, maxBytes = 64L, maxDelayMs = Long.MaxValue))
    p.open(0)
    p.publish(msg(1L, 16))
    p.publish(msg(2L, 500)) // > maxBytes on its own
    p.publish(msg(3L, 16))
    p.close()
    assert(batches.map(_.map(_.batch_id)) === Seq(Seq(1L), Seq(2L), Seq(3L)))
  }

  test("max-delay flushes once the oldest buffered message ages out") {
    var now = 0L
    val (p, batches) = collectBatches(BatchingOptions(
      maxMessages = Int.MaxValue, maxBytes = Long.MaxValue, maxDelayMs = 10L),
      () => now)
    p.open(0)
    p.publish(msg(1L, 8))
    p.publish(msg(2L, 8))
    assert(batches.isEmpty) // young batch: nothing shipped yet
    now = 11L
    p.publish(msg(3L, 8)) // delay check trips on this publish
    assert(batches.map(_.map(_.batch_id)) === Seq(Seq(1L, 2L, 3L)))
    p.close()
    assert(batches.size === 1) // nothing left to flush
  }

  test("batch envelope round-trips messages byte-exactly") {
    val msgs = Seq(msg(1L, 3), msg(2L, 1000), msg(3L, 0))
    val decoded = BatchEnvelope.decode(BatchEnvelope.encode(msgs))
    assert(decoded.size === 3)
    decoded.zip(msgs).foreach { case (d, m) =>
      assert(d.bytes.toSeq === m.bytes.toSeq)
    }
  }

  test("BatchingFilePublisher writes one envelope file per flush and loses nothing") {
    val dir = GraftSession.scratchDir("spec-batchpub").toString
    val p = new BatchingFilePublisher(dir,
      BatchingOptions(maxMessages = 3, maxBytes = Long.MaxValue, maxDelayMs = Long.MaxValue))
    p.open(7)
    (1 to 8).foreach(i => p.publish(msg(i.toLong, 16)))
    p.close()
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrowbag"))
      .sortBy(_.getName)
    assert(files.length === 3) // 3+3+2
    val recovered = files.flatMap(f =>
      BatchEnvelope.decode(java.nio.file.Files.readAllBytes(f.toPath)))
    assert(recovered.length === 8)
    assert(recovered.map(_.bytes.head.toLong).sorted.toSeq === (1L to 8L))
  }
}
