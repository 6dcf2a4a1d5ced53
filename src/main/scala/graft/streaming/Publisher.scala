package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset

import graft.ipc.IpcMessage

/** Producer lifecycle for draining IPC messages to an external system —
  * the Spark-native shape of bolson's Pulsar publisher
  * (reference: src/bolson/publish/publisher.cpp): open ≙ create producer,
  * publish ≙ send, close ≙ flush + close. One instance lives per partition
  * task, so "N concurrent producers" is simply the partition count — no
  * thread pool to manage, and backpressure comes from task scheduling. */
trait Publisher extends Serializable {
  def open(partitionId: Int): Unit
  def publish(msg: IpcMessage): Unit
  def close(): Unit
}

/** Filesystem publisher: one file per IPC message, named by batch_id
  * (partition-unique within one serialize run) plus an optional caller
  * epoch — REQUIRED when publishing repeatedly into the same directory
  * (e.g. one epoch per micro-batch), because batch ids restart at
  * (pid<<32)|0 for every serialize() call and files would overwrite.
  * Stands in for any message broker; the files are standalone Arrow IPC
  * streams readable by any Arrow consumer. */
class FilePublisher(dir: String, epoch: Long = 0L) extends Publisher {
  override def open(partitionId: Int): Unit = {
    Files.createDirectories(Paths.get(dir)); ()
  }
  override def publish(m: IpcMessage): Unit = {
    Files.write(Paths.get(dir, f"msg-$epoch%08x-${m.batch_id}%016x.arrow"), m.bytes); ()
  }
  override def close(): Unit = ()
}

/** Test/local publisher collecting into a JVM-wide buffer. Local-mode only
  * (executors share the driver JVM); clusters use FilePublisher or a real
  * broker client. */
object CollectingPublisher {
  private val buf = new ConcurrentLinkedQueue[IpcMessage]()
  def clear(): Unit = buf.clear()
  def messages: Seq[IpcMessage] = buf.asScala.toSeq
}

class CollectingPublisher extends Publisher {
  override def open(partitionId: Int): Unit = ()
  override def publish(m: IpcMessage): Unit = { CollectingPublisher.buf.add(m); () }
  override def close(): Unit = ()
}

/** Counters published by a pipeline run — bolson's per-stage metrics
  * (reference: src/bolson/convert/metrics.cpp, publish counts in
  * publisher.cpp) as Spark accumulators: task-side adds, driver-side read,
  * zero coordination. (Accumulator semantics: retried tasks may re-add;
  * exact-once is guaranteed only for successful first attempts — fine for
  * throughput metrics.) */
case class PublishStats(messages: Long, rows: Long, bytes: Long)

object Publish {

  /** Drain a message stream to a publisher, one instance per partition.
    * An action (not a transformation): runs the upstream plan once and
    * returns the publish counters. */
  def run(messages: Dataset[IpcMessage], mkPublisher: () => Publisher): PublishStats = {
    val sc = messages.sparkSession.sparkContext
    val nMsgs = sc.longAccumulator("graft.messages_published")
    val nRows = sc.longAccumulator("graft.rows_published")
    val nBytes = sc.longAccumulator("graft.bytes_published")
    messages.foreachPartition { (it: Iterator[IpcMessage]) =>
      val p = mkPublisher()
      p.open(TaskContext.getPartitionId())
      try it.foreach { m =>
        p.publish(m)
        nMsgs.add(1); nRows.add(m.n_rows); nBytes.add(m.n_bytes)
      } finally p.close()
    }
    PublishStats(nMsgs.value, nRows.value, nBytes.value)
  }
}
