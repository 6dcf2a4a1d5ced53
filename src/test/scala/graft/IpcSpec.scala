package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ipc.{ArrowIpc, IpcQueries}

/** Arrow IPC writer/reader specs (SURVEY §2 a5, a6). */
class IpcSpec extends SparkSpec {

  test("a6 round-trip preserves scalars, strings, timestamps, doubles exactly") {
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val back = ArrowIpc.deserialize(spark,
      ArrowIpc.serialize(ev, maxRows = 500), ev.schema)
    assert(back.exceptAll(ev).count() == 0 && ev.exceptAll(back).count() == 0)
  }

  test("a5 every batch respects maxRows and rows are conserved") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val msgs = ArrowIpc.serialize(docs.repartition(5), maxRows = 37).collect()
    assert(msgs.forall(_.n_rows <= 37))
    assert(msgs.map(_.n_rows).sum == docs.count())
    assert(msgs.map(_.batch_id).distinct.length == msgs.length, "batch ids unique")
  }

  test("a6 maxIpcBytes splits oversized batches instead of emitting them") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val cap = 8 * 1024L
    val msgs = ArrowIpc.serialize(docs.repartition(2), maxRows = 1000, maxIpcBytes = cap).collect()
    assert(msgs.forall(m => m.n_bytes <= cap || m.n_rows == 1),
      "only single-row batches may exceed the byte cap")
    assert(msgs.map(_.n_rows).sum == docs.count())
  }

  test("byte-capped (sliced) batches round-trip content exactly") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "n_chars")
    val msgs = ArrowIpc.serialize(docs.repartition(3), maxRows = 1000, maxIpcBytes = 4 * 1024)
    val back = ArrowIpc.deserialize(spark, msgs, docs.schema)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0,
      "zero-copy root slices must preserve every value")
  }

  test("zstd/lz4-compressed IPC round-trips and shrinks the payload") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val plain = ArrowIpc.serialize(docs.repartition(1), maxRows = 100000).collect()
    for (codec <- Seq("zstd", "lz4")) {
      val packed = ArrowIpc.serialize(docs.repartition(1), maxRows = 100000, codec = codec).collect()
      assert(packed.map(_.n_bytes).sum < plain.map(_.n_bytes).sum,
        s"$codec must shrink text payloads")
      val back = ArrowIpc.deserialize(spark,
        ArrowIpc.serialize(docs, maxRows = 128, codec = codec), docs.schema)
      assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
    }
  }

  test("list<long> columns (battery voltage shape) round-trip") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(100L, 200L, 300L)),
      (2L, Seq.empty[Long]),
      (3L, Seq(7L))).toDF("id", "voltage")
    val back = ArrowIpc.deserialize(spark, ArrowIpc.serialize(df, maxRows = 2), df.schema)
    val got = back.orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(got.toSeq == Seq((1L, Seq(100L, 200L, 300L)), (2L, Seq.empty[Long]), (3L, Seq(7L))))
  }

  test("null values survive the wire format") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType), StructField("d", DoubleType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, null, 2.5), Row(2L, "x", null), Row(null, "y", 1.0)),
      schema)
    val back = ArrowIpc.deserialize(spark, ArrowIpc.serialize(df, maxRows = 10), schema)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }

  test("a5/a6 driver-gate queries produce expected shapes") {
    val a5 = IpcQueries.a5BatchResize(spark, sfDir).collect()
    assert(a5.forall(_.getAs[Long]("n_rows") <= 128))
    val a6 = IpcQueries.a6IpcSerialize(spark, sfDir)
    assert(a6.count() == Tables.events(spark, sfDir).count())
  }
}
