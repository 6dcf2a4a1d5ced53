package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.StructType

import graft.{GraftSession, Tables}
import graft.ipc.{ArrowIpc, IpcMessage}

/** Cross-implementation IPC interop harness (dev aid, driven by
  * `tools/ipc_interop.py`): bolson's deliverable is the Arrow IPC wire
  * format, so graft-written messages must parse with an INDEPENDENT
  * implementation and vice versa.
  *
  *   dump <sfDir> <outDir> — serialize documents(doc_id, lang, n_chars)
  *     through the production ArrowIpc writer, one `msg-<i>.arrows` file
  *     per bounded message (each a complete stream, like one bolson
  *     Pulsar payload); pyarrow then reads and value-compares them.
  *   read <file> <expectRows> — parse a pyarrow-written stream with the
  *     production ArrowIpc reader and print a row count + checksum line;
  *     the python driver asserts both.
  */
object IpcInterop {
  private val fixtureSchema =
    StructType.fromDDL("doc_id BIGINT, lang STRING, n_chars BIGINT")

  def main(args: Array[String]): Unit = args.toList match {
    case "dump" :: sfDir :: outDir :: Nil =>
      val spark = GraftSession.get()
      val docs = Tables.documents(spark, sfDir)
        .selectExpr("doc_id", "lang", "n_chars").orderBy("doc_id")
      val msgs = ArrowIpc.serialize(docs.coalesce(1), maxRows = 128).collect()
      Files.createDirectories(Paths.get(outDir))
      msgs.zipWithIndex.foreach { case (m, i) =>
        Files.write(Paths.get(outDir, f"msg-$i%04d.arrows"), m.bytes)
      }
      println(s"[interop] dumped ${msgs.length} messages")
      spark.stop()
    case "read" :: file :: expectRows :: Nil =>
      val spark = GraftSession.get()
      import spark.implicits._
      val bytes = Files.readAllBytes(Paths.get(file))
      val msgs = spark.createDataset(Seq(
        IpcMessage(0L, expectRows.toLong, bytes.length.toLong, bytes)))
      val df = ArrowIpc.deserialize(spark, msgs, fixtureSchema)
      val n = df.count()
      val sum = df.selectExpr("sum(doc_id * n_chars)").head.getLong(0)
      println(s"[interop] rows=$n checksum=$sum")
      spark.stop()
    case other =>
      sys.error(s"usage: IpcInterop dump <sfDir> <outDir> | read <file> <expectRows>; got $other")
  }
}
