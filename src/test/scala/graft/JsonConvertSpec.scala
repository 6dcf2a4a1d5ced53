package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.JsonConvert

class JsonConvertSpec extends SparkSpec {
  import spark.implicits._

  test("a1 extracts the JSON payload for every event") {
    val df = JsonConvert.a1JsonParse(spark, sfDir)
    assert(df.filter(col("k").isNull).count() == 0)
    assert(df.count() == Tables.events(spark, sfDir).count())
  }

  test("a2 battery round-trip preserves per-order quantity sums") {
    val got = JsonConvert.a2JsonBattery(spark, sfDir)
    val want = Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("bigint")).as("direct_sum"))
    val joined = got.join(want, "l_orderkey")
      .filter(col("sum_voltage") =!= col("direct_sum"))
    assert(joined.count() == 0)
  }

  test("a3 trip round-trip keeps bools, strings and nested list sums intact") {
    val df = JsonConvert.a3JsonTrip(spark, sfDir)
    assert(df.count() == Tables.orders(spark, sfDir).count())
    assert(df.schema("hypermiling").dataType == BooleanType)
    assert(df.filter(col("trip_date").rlike("^\\d{4}-\\d{2}-\\d{2}$")).count() == df.count())
  }

  test("FAILFAST mode rejects malformed JSON like bolson's error behavior") {
    val bad = Seq("""{"voltage": [1, 2]}""", """{"voltage": "not-a-list"""").toDF("json")
    val parsed = bad.select(
      JsonConvert.parseJson(col("json"), JsonConvert.Schemas.battery).as("rec"))
    assertThrows[SparkException](parsed.collect())
  }

  test("strict mode errors on unexpected fields (UnexpectedFieldBehavior::Error)") {
    val ok = Seq("""{"voltage": [1, 2]}""").toDF("json")
      .select(JsonConvert.parseJsonStrict(col("json"), JsonConvert.Schemas.battery).as("rec"))
    assert(ok.select(size(col("rec.voltage"))).head.getInt(0) == 2)
    val extra = Seq("""{"voltage": [1], "rogue": 7}""").toDF("json")
      .select(JsonConvert.parseJsonStrict(col("json"), JsonConvert.Schemas.battery).as("rec"))
    val e = intercept[Exception](extra.collect())
    assert(e.getMessage.contains("rogue") ||
      Option(e.getCause).exists(_.getMessage.contains("rogue")))
  }
}
