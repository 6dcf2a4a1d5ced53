package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ipc.ArrowIpc

/** Property-based Arrow IPC round-trip: randomized values over the full
  * supported type closure, with randomized batch/byte caps (deterministic
  * seeds — failures reproduce). */
class IpcPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("l", LongType), StructField("i", IntegerType),
    StructField("d", DoubleType), StructField("f", FloatType),
    StructField("b", BooleanType), StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("al", ArrayType(LongType)),
    StructField("ad", ArrayType(DoubleType))))

  private val genRow: Gen[Row] = for {
    l <- Gen.option(Gen.long)
    i <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    d <- Gen.option(Gen.oneOf(Gen.chooseNum(-1e18, 1e18), Gen.oneOf(
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, -0.0, 0.0)))
    f <- Gen.option(Gen.chooseNum(-1e9f, 1e9f))
    b <- Gen.option(Gen.oneOf(true, false))
    s <- Gen.option(Gen.oneOf(Gen.alphaNumStr,
      Gen.const(""), Gen.const("uniçødé ☃")))
    bin <- Gen.option(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    al <- Gen.option(Gen.listOf(Gen.frequency(
      (1, Gen.const(null: Any)), (4, Gen.long.map(x => x: Any)))).map(_.toSeq))
    ad <- Gen.option(Gen.listOf(Gen.frequency(
      (1, Gen.const(null: Any)),
      (4, Gen.chooseNum(-1e9, 1e9).map(x => x: Any)))).map(_.toSeq))
  } yield Row(l.orNull, i.orNull, d.orNull, f.orNull, b.orNull,
    s.orNull, bin.orNull, al.orNull, ad.orNull)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("random rows round-trip through IPC for any batch/byte caps") {
    for (trial <- 0 until 8) {
      val rows = (0 until 40).map(i => sample(genRow, trial * 1000L + i))
      val maxRows = sample(Gen.chooseNum(1, 17), trial + 77L)
      val maxBytes = sample(Gen.oneOf(256L, 4096L, Long.MaxValue), trial + 99L)
      val df = spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
      val back = ArrowIpc.deserialize(spark,
        ArrowIpc.serialize(df.repartition(2), maxRows, maxBytes), schema)
      assert(back.count() == rows.length, s"trial $trial: row count")
      assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0,
        s"trial $trial (maxRows=$maxRows, maxBytes=$maxBytes): values differ")
    }
  }
}
