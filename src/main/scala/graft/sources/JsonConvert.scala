package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Schema-driven JSON → columnar conversion (SURVEY §2 a1-a3).
  *
  * Bolson parses newline-delimited JSON against an explicit Arrow schema
  * with unexpected-field-behavior = Error (reference:
  * src/bolson/parse/arrow.cpp:90-92, doc/src/schemas.md). The Spark-native
  * equivalent is `from_json` with an explicit StructType in FAILFAST mode —
  * fully codegen'd, parallel per input split, no UDFs.
  */
object JsonConvert {

  /** Preset schemas mirroring bolson's fixed-schema parsers. */
  object Schemas {
    /** battery_status: {"voltage": [u64, ...]} — reference:
      * doc/src/schemas.md "Battery status", parse/opae/battery.cpp. Spark
      * has no unsigned types; values are bounded (illex_MAX=2047) so i64 is
      * lossless. */
    val battery: StructType = StructType(Seq(
      StructField("voltage", ArrayType(LongType, containsNull = false), nullable = false)))

    /** trip_report (representative subset of the 19-field schema):
      * utf8 timestamp, u64 scalars, bool flags, u64 lists — reference:
      * doc/src/schemas.md "Trip report", parse/opae/trip.cpp. */
    val trip: StructType = StructType(Seq(
      StructField("timestamp", StringType, nullable = false),
      StructField("vin", LongType, nullable = false),
      StructField("odometer", LongType, nullable = false),
      StructField("hypermiling", BooleanType, nullable = false),
      StructField("sec_in_band", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("accel_decel", LongType, nullable = false),
      StructField("speed_changes", LongType, nullable = false)))
  }

  /** Parse a JSON string column against an explicit schema, erroring on
    * malformed records (FAILFAST). Extra fields are silently ignored —
    * for bolson's full UnexpectedFieldBehavior::Error semantics use
    * [[parseJsonStrict]]. */
  def parseJson(c: Column, schema: StructType): Column =
    from_json(c, schema, Map("mode" -> "FAILFAST"))

  /** Strict parse: additionally errors when the JSON object carries any
    * field outside the schema — bolson's UnexpectedFieldBehavior::Error
    * (reference: src/bolson/parse/arrow.cpp:90-92). Key extraction uses
    * from_json to map<string,string> (Spark stringifies non-string values
    * in that position), so the check is codegen-adjacent and needs no UDF;
    * assert_true raises task-side exactly like a malformed record does. */
  def parseJsonStrict(c: Column, schema: StructType): Column = {
    val keys = map_keys(from_json(c, MapType(StringType, StringType)))
    val unexpected = filter(keys, k => !k.isin(schema.fieldNames.toSeq: _*))
    val check = assert_true(size(unexpected) <= 0,
      concat(lit("unexpected JSON field(s): "), concat_ws(",", unexpected)))
    when(check.isNull, parseJson(c, schema))
  }

  /** a1: schema-driven parse of the events.props JSON payload column, in
    * full strict mode (malformed AND unexpected-field errors). */
  def a1JsonParse(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.events(spark, dir)
      .select(col("event_id"),
        parseJsonStrict(col("props"), schema).getField("k").as("k"))
      .orderBy("event_id")
  }

  /** a2: battery_status conversion round-trip. JSON lines in the reference
    * wire format are built from lineitem (voltage readings = per-order
    * quantities in linenumber order), parsed back with the preset schema,
    * then reduced — exercising construct, parse, and list aggregation. The
    * oracle computes the same reduction relationally, so any parse
    * infidelity hash-mismatches. */
  def a2JsonBattery(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(transform(
        array_sort(collect_list(struct(col("l_linenumber").as("ln"),
          col("l_quantity").cast("bigint").as("q")))),
        x => x.getField("q")).as("voltage"))
    val jsonLines = perOrder.select(col("l_orderkey"),
      to_json(struct(col("voltage"))).as("json"))
    jsonLines
      .select(col("l_orderkey"),
        parseJson(col("json"), Schemas.battery).as("rec"))
      .select(col("l_orderkey"),
        size(col("rec.voltage")).cast("bigint").as("n_readings"),
        aggregate(col("rec.voltage"), lit(0L), (acc, x) => acc + x).as("sum_voltage"),
        array_max(col("rec.voltage")).as("max_voltage"))
      .orderBy("l_orderkey")
  }

  /** a3: trip_report conversion round-trip over orders — nested lists,
    * bools, and utf8 fields through the same from_json path. */
  def a3JsonTrip(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val odo = floor(col("o_totalprice")).cast("bigint")
    val jsonLines = o.select(col("o_orderkey"), to_json(struct(
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("timestamp"),
      col("o_orderkey").as("vin"),
      odo.as("odometer"),
      (col("o_totalprice") > 1000.0).as("hypermiling"),
      array(col("o_orderkey") % 60, col("o_custkey") % 60, odo % 60).as("sec_in_band"),
      (col("o_custkey") % 10).as("accel_decel"),
      (odo % 100).as("speed_changes"))).as("json"))
    jsonLines
      .select(col("o_orderkey"), parseJson(col("json"), Schemas.trip).as("rec"))
      .select(
        col("rec.vin").as("vin"),
        col("rec.timestamp").as("trip_date"),
        col("rec.hypermiling").as("hypermiling"),
        col("rec.odometer").as("odometer"),
        aggregate(col("rec.sec_in_band"), lit(0L), (acc, x) => acc + x).as("sum_sec_in_band"),
        (col("rec.accel_decel") + col("rec.speed_changes")).as("events_total"))
      .orderBy("vin")
  }
}
