package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-rehearsal corpus generator (r18, SURVEY §8p).
  *
  * The driver ships sf ≤ 0.1 (TESTDATA.md, read-only); every 100 TB
  * claim in this repo rests on plan audits verified at that scale. This
  * tool generates a SCHEMA-IDENTICAL star corpus at any scale factor so
  * the suite can be rehearsed one order of magnitude up (sf1.0 ≈ 6M
  * lineitem / 50k docs on the 128 GiB box) and per-query scaling
  * exponents measured rather than argued — the falsifier the r17
  * verdict asked for.
  *
  * Generation is itself scale-shaped: every table is `spark.range` +
  * hash-derived columns (xxhash64 with literal salts — no RNG state, no
  * driver loops), so generation distributes like any other job and the
  * same tool would write a 100 TB corpus on a real cluster. Value
  * distributions mirror the driver corpus where operators care:
  * documents carry ~5% near-dups (an earlier doc's text + " dup") and
  * ~0.16% exact dups over the same 30-word vocabulary; embeddings are
  * L2-normalized 64-dim vectors in 10 hash-seeded clusters; the
  * dimension tables keep the driver's exact domains. NOT byte-identical
  * to the driver's corpora and carries no DuckDB oracle — the rehearsal
  * measures performance scaling, CORRECTNESS_r* stays the driver's gate.
  *
  * Usage: `runMain graft.tools.GenData <sf> <outDir>`
  */
object GenData {

  private def h(salt: String, cols: Column*): Column =
    xxhash64((lit(salt) +: cols): _*)
  /** Uniform [0, 1) from a salted hash — deterministic per (salt, cols). */
  private def u(salt: String, cols: Column*): Column =
    pmod(h(salt, cols: _*), lit(1000000007L)).cast("double") / 1000000007d
  private def pick(arr: Seq[String], salt: String, cols: Column*): Column =
    element_at(array(arr.map(lit): _*),
      (pmod(h(salt, cols: _*), lit(arr.size.toLong)) + 1).cast("int"))

  /** The 30-word document vocabulary (the driver corpus's, minus the
    * "dup" marker token which only near-dup variants carry). */
  private val Vocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  /** Open-vocabulary word count (r19 realism knob): ~50k hash-derived
    * words — a real corpus's shingle space is effectively unbounded, so
    * minhash band collisions track TRUE similarity; the 30-word mode's
    * ~27k possible 3-shingles made unrelated docs share band values at
    * a density no real corpus has (the §8p c2 candidate-surface
    * artifact, 3.83× candidates on 2× docs). Prime, so pmod spreads. */
  private val OpenVocabSize = 50021L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenData <sf> <outDir> [--open-vocab|--closed-vocab]")
    val sf = args(0).toDouble
    val out = args(1)
    require(sf > 0, s"sf must be positive, got $sf")
    // default: open vocabulary at rehearsal scale (sf ≥ 1), the driver's
    // 30-word mode below it (where generated corpora serve as the
    // oracle-exact second-gate corpus); both overridable
    val openVocab =
      if (args.contains("--open-vocab")) true
      else if (args.contains("--closed-vocab")) false
      else sf >= 1.0
    val spark = graft.GraftSession.get()
    generate(spark, sf, out, openVocab)
    spark.stop()
  }

  def generate(spark: SparkSession, sf: Double, out: String,
               openVocab: Boolean = false): Unit = {
    // Scoped session conf (r19 ADVICE): TIMESTAMP_MICROS for driver
    // parity (the reference tables ship timestamp[us]) and UTC so the
    // instant→NTZ casts below store the same wall-clock values on any
    // box — both saved and restored so an in-process caller
    // (GenDataSpec, future tools) doesn't inherit the settings.
    val prevTs = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    val prevTz = spark.conf.getOption("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try generateInner(spark, sf, out, openVocab)
    finally {
      def restore(key: String, prev: Option[String]): Unit = prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      restore("spark.sql.parquet.outputTimestampType", prevTs)
      restore("spark.sql.session.timeZone", prevTz)
    }
  }

  private def generateInner(spark: SparkSession, sf: Double, out: String,
                            openVocab: Boolean): Unit = {
    def n(base: Long): Long = math.max(1L, math.round(base * sf))
    val nCust = n(150000); val nSupp = n(10000); val nPart = n(200000)
    val nOrders = n(1500000); val nLine = nOrders * 4
    val nEvents = n(1000000); val nUsers = n(15000)
    val nDocs = n(50000); val nVecs = n(20000)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gendata] $name: ${graft.Tables.parquetRowCount(s"$out/$name.parquet")} rows")
    }

    import spark.implicits._
    write("region", Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"),
        (3, "EUROPE"), (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name"))

    write("nation", spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      pmod(col("id"), lit(5)).cast("int").as("n_regionkey")))

    write("customer", spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      pmod(h("cn", col("id")), lit(25L)).cast("int").as("c_nationkey"),
      round(u("cb", col("id")) * 10000, 2).as("c_acctbal"),
      pick(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY"), "cm", col("id")).as("c_mktsegment")))

    write("supplier", spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      pmod(h("sn", col("id")), lit(25L)).cast("int").as("s_nationkey"),
      round(u("sb", col("id")) * 10000, 2).as("s_acctbal")))

    write("part", spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(
        pick(Seq("large", "hot", "blue", "old", "cold", "small", "new",
          "red", "green", "dark"), "pa", col("id")), lit(" "),
        pick(Seq("ring", "bolt", "plate", "screw", "nut", "cap", "disk",
          "rod"), "pn", col("id"))).as("p_name"),
      concat(lit("Brand#"),
        pmod(h("pb", col("id")), lit(25L)) + 1).as("p_brand"),
      pick(Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"),
        "pt", col("id")).as("p_type"),
      (pmod(h("ps", col("id")), lit(50L)) + 1).cast("int").as("p_size"),
      round(lit(900.0) +
        pmod(h("pr", col("id")), lit(10000L)).cast("double") / 10.0, 2)
        .as("p_retailprice")))

    val orderDate = date_add(to_date(lit("1995-01-01")),
      pmod(h("od", col("id")), lit(2404L)).cast("int"))
    write("orders", spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      pmod(h("oc", col("id")), lit(nCust)).as("o_custkey"),
      pick(Seq("O", "P", "F"), "os", col("id")).as("o_orderstatus"),
      round(lit(1000.0) + u("op", col("id")) * 499000, 2).as("o_totalprice"),
      orderDate.cast("timestamp_ntz").as("o_orderdate"),
      pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        "opr", col("id")).as("o_orderpriority")))

    write("lineitem", spark.range(nLine).select(
      (col("id") / 4).cast("bigint").as("l_orderkey"),
      pmod(h("lp", col("id")), lit(nPart)).as("l_partkey"),
      pmod(h("ls", col("id")), lit(nSupp)).as("l_suppkey"),
      (pmod(col("id"), lit(4L)) + 1).cast("int").as("l_linenumber"),
      (pmod(h("lq", col("id")), lit(50L)) + 1).cast("double").as("l_quantity"),
      round(lit(900.0) + u("le", col("id")) * 99100, 2).as("l_extendedprice"),
      round(pmod(h("ld", col("id")), lit(9L)).cast("double") / 100.0, 2)
        .as("l_discount"),
      round(pmod(h("lt", col("id")), lit(9L)).cast("double") / 100.0, 2)
        .as("l_tax"),
      pick(Seq("A", "N", "R"), "lr", col("id")).as("l_returnflag"),
      pick(Seq("O", "F"), "ll", col("id")).as("l_linestatus"),
      date_add(to_date(lit("1995-01-02")),
        pmod(h("lsd", col("id")), lit(2498L)).cast("int"))
        .cast("timestamp_ntz").as("l_shipdate")))

    val day30us = 30L * 86400L * 1000000L
    write("events", spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros(lit(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
          .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L) +
        pmod(h("et", col("id")), lit(day30us))).cast("timestamp_ntz").as("ts"),
      pmod(h("eu", col("id")), lit(nUsers)).as("user_id"),
      pick(Seq("click", "error", "purchase", "signup", "view"), "ee",
        col("id")).as("event_type"),
      round(u("ev", col("id")) * 560, 2).as("value"),
      concat(lit("{\"k\": "), pmod(h("ek", col("id")), lit(100L)), lit("}"))
        .as("props")))

    // documents — the operator-sensitive table: ~5% near-dups (an
    // earlier doc's full text + " dup"), ~0.16% exact dups, everything
    // else unique word salad of 10..100 vocabulary words. The text of a
    // doc is a pure function of its SEED; dup docs borrow another doc's
    // seed, so the duplicate structure survives any partitioning.
    val vocabArr = array(Vocab.map(lit): _*)
    val isNear = col("id") >= 20 && pmod(h("nd", col("id")), lit(100L)) < 5
    val isExact = !isNear && col("id") >= 20 &&
      pmod(h("xd", col("id")), lit(625L)) === 0
    val seed = when(isNear || isExact,
      pmod(h("sd", col("id")), lit(nDocs))).otherwise(col("id"))
    val nWords = (lit(10L) + pmod(h("n", col("seed")), lit(91L))).cast("int")
    // open mode: hash-derived words over a ~50k space ("w%05d") —
    // the dup/near-dup seed structure is IDENTICAL in both modes
    def wordAt(i: Column): Column =
      if (openVocab)
        format_string("w%05d", pmod(h("w", col("seed"), i), lit(OpenVocabSize)))
      else
        element_at(vocabArr,
          (pmod(h("w", col("seed"), i), lit(Vocab.size.toLong)) + 1)
            .cast("int"))
    val baseText = array_join(
      transform(sequence(lit(0), nWords - 1), wordAt(_)), " ")
    val langCut = pmod(h("lg", col("id")), lit(100L))
    write("documents", spark.range(nDocs)
      .select(col("id"), isNear.as("near"), seed.as("seed"))
      .select(col("id"), col("near"), col("seed"), baseText.as("bt"))
      .select(
        col("id").as("doc_id"),
        when(col("near"), concat(col("bt"), lit(" dup")))
          .otherwise(col("bt")).as("text"),
        when(langCut < 44, "en").when(langCut < 58, "zh")
          .when(langCut < 72, "es").when(langCut < 86, "de")
          .otherwise("fr").as("lang"),
        concat(lit("src"), pmod(h("s", col("id")), lit(20L))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("bigint")))

    // raw_web — the at-rest raw-markup corpus (r20): every document's
    // text behind the c119 pipeline markup with the c118 corruption
    // plants (%13 malformed, %11 U+FFFD, %7 mojibake), so the composed
    // crawl flow (`Main pipeline`) rehearses from REAL at-rest HTML at
    // any scale instead of query-time synthesis. Not part of the
    // driver's frozen table set — an additional table, schema untouched.
    write("raw_web", spark.read.parquet(s"$out/documents.parquet")
      .select(col("doc_id"), graft.operators.Extract.gateCorruption.as("text"))
      .select(col("doc_id"), graft.operators.Extract.pipelineMarkup.as("html")))

    // embeddings — 64-dim L2-normalized vectors in 10 hash-seeded
    // clusters (centers U(-1,1) per (label, dim), noise 0.35×)
    val label = pmod(h("l", col("id")), lit(10L))
    val dims = sequence(lit(0), lit(63))
    def unit(c: Column): Column =
      (pmod(c, lit(2001L)).cast("double") - 1000.0) / 1000.0
    val raw = transform(dims, d =>
      unit(h("c", col("lbl"), d)) + lit(0.35) * unit(h("e", col("id"), d)))
    write("embeddings", spark.range(nVecs)
      .select(col("id"), label.as("lbl"))
      .select(col("id"), col("lbl"), raw.as("raw"))
      .select(col("id"), col("lbl"), col("raw"),
        sqrt(aggregate(col("raw"), lit(0.0), (a, x) => a + x * x)).as("nrm"))
      .select(
        col("id").as("vec_id"),
        transform(col("raw"), x => (x / col("nrm")).cast("float"))
          .as("embedding"),
        col("lbl").cast("int").as("label")))

    println(s"""{"sf":$sf,"out":"$out","lineitem":$nLine,"docs":$nDocs}""")
  }
}
