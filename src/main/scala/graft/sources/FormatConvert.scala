package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Additional source/sink formats beyond ND-JSON (SURVEY §2 extension):
  * the same schema-driven conversion contract over CSV lines and the ORC
  * columnar format — a reference user's "switch" covers whatever wire
  * format feeds the pipeline, not just JSON. */
object FormatConvert {

  /** a11: schema-driven CSV-line conversion — the CSV twin of a1/a6:
    * events → CSV text (the wire form) → from_csv in FAILFAST mode →
    * rows. Identity oracle: any quoting/typing/precision infidelity in
    * either direction hash-mismatches (doubles survive because Java's
    * toString/parseDouble round-trip is exact). */
  def a11CsvConvert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsFanned(spark, dir).select(
      col("event_id"), unix_micros(col("ts")).as("ts_us"),
      col("user_id"), col("event_type"), col("value"))
    val schema = ev.schema
    val lines = ev.select(to_csv(struct(ev.columns.map(col): _*)).as("line"))
    lines.select(from_csv(col("line"),
        schema, Map("mode" -> "FAILFAST")).as("rec"))
      .select("rec.*")
      .transform(graft.operators.Relational.gateOrder("event_id"))
  }

  /** a12: ORC round-trip — documents through Spark's native ORC
    * writer/reader (columnar sink breadth next to parquet + Arrow IPC).
    * Identity oracle. */
  def a12OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // per-JVM scratch path: repeated runs overwrite one copy instead of
    // leaking a dataset per invocation; PID suffix avoids cross-JVM races
    val tmp = graft.GraftSession.scratchDir("orc-roundtrip").toString
    docs.write.mode("overwrite").orc(tmp)
    spark.read.orc(tmp)
      .transform(graft.operators.Relational.gateOrder("doc_id"))
  }
}
