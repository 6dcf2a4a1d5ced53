package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Relational operator suite (SURVEY §2 B-series).
  *
  * Every query is declarative DataFrame API — Catalyst handles pushdown,
  * join selection, and partial aggregation. Numeric aggregates are computed
  * in decimal so results are bit-exact across engines (the DuckDB oracle
  * compares value hashes); raw doubles are only passed through, never
  * accumulated. The FINAL value of a decimal aggregate is cast to double on
  * both sides: emitting a decimal-typed column hash-fails the driver gate
  * whenever a value has a trailing zero digit (Spark parquet keeps the
  * decimal scale — `101951.00` — while DuckDB's result surfaces as float64
  * `101951.0`), and the exact-decimal→double conversion is the identical
  * nearest double in both engines. Timestamps are emitted as integer
  * epoch-micros for the same reason (Spark writes timestamp[ns] parquet,
  * DuckDB yields [us]). Every query ends in a deterministic ORDER BY.
  */
object Relational {

  /** Deterministic total order for the oracle gate WITHOUT a range sort.
    * `orderBy` plans RangePartitioning, which SAMPLES its child to pick
    * bounds — executing the whole subtree twice. For conversion queries
    * whose subtree (JSON gen/parse, IPC round-trip) is the expensive part,
    * that doubles the query: a3 measured 10.6s with orderBy vs ~4s with a
    * single-partition sort. The gate compares ≤600k narrow rows, where a
    * one-task sort is trivial; production pipelines omit the gate sort
    * entirely (order is the oracle's concern, not the operator's). */
  def gateOrder(cols: String*)(df: DataFrame): DataFrame =
    df.repartition(1).sortWithinPartitions(cols.map(col): _*)

  private val dec12_2 = DecimalType(12, 2)
  private val dec4_2 = DecimalType(4, 2)

  /** Discounted price in exact decimal arithmetic: price * (1 - disc). */
  private def discPrice: Column =
    col("l_extendedprice").cast(dec12_2) *
      (lit(1).cast(dec4_2) - col("l_discount").cast(dec4_2))

  /** b1: scan + filter + project — predicates and the 3-column projection
    * must reach the parquet scan (PushedFilters / ReadSchema). */
  def b1ScanFilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_discount") > lit(0.07))
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** b2: multi-aggregate groupBy (TPC-H Q1 style pricing summary).
    * Low-cardinality keys → map-side partial agg does nearly all the work;
    * the shuffle moves O(groups) rows regardless of input scale. */
  def b2AggPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitemFanned(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("bigint")).as("sum_qty"),
        sum(col("l_extendedprice").cast(dec12_2)).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        max(col("l_quantity").cast("bigint")).as("max_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** b3: multiway join — revenue per nation. Eager aggregation: lineitem
    * revenue pre-aggregates per orderkey BELOW the fact-fact join (exact —
    * decimal addition reorders losslessly, so the final per-nation sums
    * are bit-identical), shrinking the join's shuffle from one row per
    * lineitem to one per order (~4× fewer, and narrow). Catalyst doesn't
    * push aggregates through joins itself; at 100 TB this is the
    * difference between shuffling the fact table and shuffling its
    * per-key summary. Dimensions broadcast; AQE handles skew. */
  def b3JoinMultiway(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitemFanned(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(discPrice).as("o_rev"), count(lit(1)).as("o_items"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = broadcast(Tables.nation(spark, dir))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("o_rev")).cast("double").as("revenue"),
        sum(col("o_items")).as("n_items"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** b4: global top-k — planned as TakeOrderedAndProject, never a full sort. */
  def b4TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** b5: distinct aggregation — exact count-distinct per group (expand +
    * two-phase agg under the hood). */
  def b5Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  /** b6: window function — top-3 customers per market segment by balance.
    * Single shuffle on the partition key. */
  def b6Window(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= 3)
      .select("c_mktsegment", "rnk", "c_custkey", "c_acctbal")
      .orderBy("c_mktsegment", "rnk")
  }

  /** b7: semi + anti join — per-customer order existence, tagged. Both
    * sides plan as LeftSemi/LeftAnti with the orders side broadcast when
    * small enough. */
  def b7SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select("o_custkey")
    val cond = col("c_custkey") === col("o_custkey")
    val has = c.join(o, cond, "left_semi")
      .select(col("c_custkey"), col("c_name"), lit(true).as("has_orders"))
    val not = c.join(o, cond, "left_anti")
      .select(col("c_custkey"), col("c_name"), lit(false).as("has_orders"))
    has.unionByName(not).orderBy("c_custkey")
  }

  /** b8: set operations — users who both purchased and signed up
    * (INTERSECT), and purchasers who never signed up (EXCEPT). */
  def b8SetOps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchase = e.filter(col("event_type") === "purchase").select("user_id")
    val signup = e.filter(col("event_type") === "signup").select("user_id")
    val both = purchase.intersect(signup).select(lit("both").as("tag"), col("user_id"))
    val only = purchase.except(signup).select(lit("purchase_only").as("tag"), col("user_id"))
    both.unionByName(only).orderBy("tag", "user_id")
  }

  /** b9: conditional aggregation + HAVING. */
  def b9ConditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("value") > 100, 1L).otherwise(0L)).as("n_large"),
        sum(col("value").cast(dec12_2)).cast("double").as("sum_value"))
      .filter(col("n_events") > 10)
      .orderBy("event_type")

  /** b10: tumbling time-window aggregation over the event stream table —
    * the batch shape of Structured Streaming's window(ts, '1 hour'). */
  def b10TimeWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec12_2)).cast("double").as("sum_value"))
      .orderBy("hour_us", "event_type")

  /** b11: hierarchical aggregates via ROLLUP (region → nation → total). */
  def b11GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(dec12_2)).cast("double").as("sum_acctbal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_cust"), col("sum_acctbal"))
      .orderBy("region", "nation")
  }

  /** b12: exact interpolated percentiles per group (sort-based; same linear
    * interpolation as DuckDB's quantile_cont). */
  def b12Quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** b13: pivot — event counts and value sums per user-segment × event
    * type, the wide-table reporting shape (Spark plans it as a single
    * aggregate with pivot expressions; the oracle spells the same thing as
    * CASE-gated aggregates, which is also the portable SQL form). */
  def b13Pivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .withColumn("seg", (col("user_id") % 10).cast("bigint"))
      .groupBy("seg")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .select(col("seg") +: types.map(t => col(t).as(s"n_$t")): _*)
      .orderBy("seg")
  }

  /** Generic as-of join: for every left row, the latest right row with the
    * same key and time ≤ the left row's time (`direction = "backward"`,
    * the default) or the EARLIEST right row with time ≥ it
    * (`direction = "forward"` — attribution-style "next event" pairing).
    * Spark has no native as-of join; the scalable shape is NOT a range
    * join or a per-row subquery but a tagged UNION + ONE window pass over
    * (key, time) — a single shuffle on the key, O(n log n) per partition,
    * no candidate blow-up at any scale (the shape kdb-style and Flink
    * temporal joins use internally). Right rows at EQUAL time are visible
    * to the left row in both directions (≤ / ≥, not strict — `__tag`
    * ordering); equal-time ties among right rows resolve to the largest
    * tie-break value backward and the SMALLEST forward (each direction's
    * frame-edge pick, matched by the oracles). `toleranceUs` (in
    * `timeCol`'s own unit) nulls a match farther than the tolerance —
    * production as-of joins are almost always tolerance-bounded, and the
    * post-filter keeps the plan single-pass.
    *
    * R15: the payload rides the window as a STRUCT (matched time + value),
    * so the value may be ANY type — double prices, string labels, or the
    * whole matched row ([[asofJoinRow]], what kdb `aj` returns). The r14
    * integral-only require existed because the old implementation carried
    * the value through a bigint cast; nothing casts now. */
  private[graft] def asofCore(left: DataFrame, right: DataFrame, key: String,
      timeCol: String, tie: Column,
      tieType: org.apache.spark.sql.types.DataType, value: Column,
      valueType: org.apache.spark.sql.types.DataType, direction: String,
      toleranceUs: Option[Long]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    require(direction == "backward" || direction == "forward",
      s"asofJoin direction must be backward|forward, got '$direction'")
    require(toleranceUs.forall(_ >= 0), s"tolerance must be >= 0")
    val payType = StructType(Seq(
      StructField("vt", right.schema(timeCol).dataType),
      StructField("v", valueType)))
    val l = left.select(col(key), col(timeCol), lit(1).as("__tag"),
      lit(null).cast(tieType).as("__ord"),
      lit(null).cast(payType).as("__pay"),
      struct(left.columns.map(col): _*).as("__row"))
    val r = right.select(col(key), col(timeCol), lit(0).as("__tag"),
      tie.as("__ord"),
      struct(col(timeCol).as("vt"), value.as("v")).as("__pay"),
      lit(null).cast(l.schema("__row").dataType).as("__row"))
    val merged = l.unionByName(r)
    val asofd =
      if (direction == "backward") {
        val w = Window.partitionBy(key)
          .orderBy(col(timeCol), col("__tag"), col("__ord"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        merged.withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      } else {
        // forward: rights at equal time must sort AFTER the left row so
        // the current→following frame sees them; first non-null = the
        // earliest right ≥ the left time, smallest tie on equal-time ties
        val w = Window.partitionBy(key)
          .orderBy(col(timeCol), col("__tag").desc, col("__ord"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        merged.withColumn("__m", first(col("__pay"), ignoreNulls = true).over(w))
      }
    val bounded = toleranceUs match {
      case None => asofd
      case Some(tol) => asofd.withColumn("__m",
        when(abs(col("__m.vt") - col(timeCol)) <= tol, col("__m")))
    }
    bounded
      .filter(col("__tag") === 1)
      .select(col("__row.*"), col("__m"))
  }

  /** Value-projecting as-of join (the b14/b22 shape): appends the matched
    * right row's `valueCol` as `asofName` and its time as `asofTime`.
    * `valueCol` doubles as the equal-time tie-break and may be any
    * orderable type — string, double, decimal, timestamp all work (r15;
    * integral-only was an implementation artifact, see [[asofCore]]). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, timeCol: String,
               valueCol: String, asofName: String, asofTime: String,
               direction: String = "backward",
               toleranceUs: Option[Long] = None): DataFrame = {
    val vt = right.schema(valueCol).dataType
    asofCore(left, right, key, timeCol, col(valueCol), vt, col(valueCol), vt,
        direction, toleranceUs)
      .withColumn(asofName, col("__m.v"))
      .withColumn(asofTime, col("__m.vt"))
      .drop("__m")
  }

  /** Whole-row as-of join — what kdb `aj` returns: appends the ENTIRE
    * matched right row as one struct column `matchedName` (null when no
    * match, or none within tolerance). Equal-time ties among right rows
    * resolve by `tieCol` (largest backward / smallest forward — the same
    * frame-edge rule as [[asofJoin]]); pass a unique column (an event id)
    * for a deterministic pick. Same single-shuffle tagged-union window
    * plan: the struct rides the partial window frame, bodies shuffle
    * once, no candidate expansion. */
  def asofJoinRow(left: DataFrame, right: DataFrame, key: String,
                  timeCol: String, tieCol: String, matchedName: String,
                  direction: String = "backward",
                  toleranceUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val rowType = StructType(right.schema.fields.map(f =>
      StructField(f.name, f.dataType, nullable = true)))
    asofCore(left, right, key, timeCol, col(tieCol),
        right.schema(tieCol).dataType,
        struct(right.columns.map(col): _*), rowType, direction, toleranceUs)
      .withColumnRenamed("__m", "__m0")
      .withColumn(matchedName, col("__m0.v"))
      .drop("__m0")
  }

  /** b14: as-of join — each click event paired with the same user's most
    * recent purchase at or before it (NULL when none). */
  def b14AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    asofJoin(clicks, purchases, key = "user_id", timeCol = "ts_us",
      valueCol = "event_id", asofName = "purchase_id", asofTime = "purchase_ts_us")
      .select(col("click_id"), col("user_id"), col("ts_us").as("click_ts_us"),
        col("purchase_id"), col("purchase_ts_us"))
      .orderBy("click_id")
  }

  /** b22: forward as-of with tolerance — each click paired with the same
    * user's EARLIEST purchase at-or-after it, NULL unless it lands within
    * 30 minutes: the attribution-window pairing (click → next conversion),
    * b14's mirror direction plus the tolerance bound every production
    * as-of carries. Same single-shuffle tagged-union window plan. */
  def b22AsofForward(spark: SparkSession, dir: String): DataFrame = {
    val withinUs = 30L * 60 * 1000 * 1000
    val ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    asofJoin(clicks, purchases, key = "user_id", timeCol = "ts_us",
      valueCol = "event_id", asofName = "purchase_id",
      asofTime = "purchase_ts_us",
      direction = "forward", toleranceUs = Some(withinUs))
      .select(col("click_id"), col("user_id"), col("ts_us").as("click_ts_us"),
        col("purchase_id"), col("purchase_ts_us"))
      .orderBy("click_id")
  }

  /** b23: whole-row as-of join with a non-integral payload — the first
    * thing a real user does with an as-of join (r14 verdict's gap): each
    * click paired with the same user's most recent PRIOR event of any
    * other type, carrying the matched row whole — its type (string), its
    * value (double), its id and time — not an integral surrogate. The
    * doubles pass through untouched (no arithmetic ⇒ exact parity with
    * the oracle reading the same parquet); equal-time ties resolve by
    * event_id, b14's rule. Same single-shuffle tagged-union window plan
    * as b14/b22 — the payload struct rides the frame, rows shuffle once. */
  def b23AsofRow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
    val others = ev.filter(col("event_type") =!= "click")
    asofJoinRow(clicks, others, key = "user_id", timeCol = "ts_us",
        tieCol = "event_id", matchedName = "m")
      .select(col("click_id"), col("user_id"), col("ts_us").as("click_ts_us"),
        col("m.event_id").as("prev_id"), col("m.event_type").as("prev_type"),
        col("m.value").as("prev_value"), col("m.ts_us").as("prev_ts_us"))
      .orderBy("click_id")
  }

  /** b15: interval (range) join — the batch twin of streaming d4: every
    * (click, purchase) pair of the same user with the purchase inside
    * [click, click + 30 min]. The equality key carries the shuffle (a hash
    * join with the range as a post-filter); AQE splits skewed users. A
    * pure range predicate with no equi-key would plan a nested-loop — the
    * 100 TB answer there is bucketing time into interval-length buckets
    * and equi-joining on (key, bucket). */
  def b15RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    // fixed 30-minute window, matching the constant baked into the DuckDB
    // oracle — a parameter here could drift from the oracle and masquerade
    // as an engine bug
    val withinUs = 30L * 60 * 1000 * 1000
    val ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("click_ts_us"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts_us").as("purchase_ts_us"))
    clicks.join(buys,
        col("user_id") === col("p_user") &&
          col("purchase_ts_us") >= col("click_ts_us") &&
          col("purchase_ts_us") <= col("click_ts_us") + withinUs)
      .select(col("click_id"), col("user_id"), col("click_ts_us"),
        col("purchase_id"), col("purchase_ts_us"))
      .orderBy("click_id", "purchase_id")
  }

  /** Keyless interval join at scale (the b15 note made real): joins every
    * left row to the right rows with `rightTime` in
    * [`leftTime`, `leftTime` + windowUs], with NO equality key — the case
    * where a naive range predicate plans a BroadcastNestedLoopJoin
    * (O(n·m) compares, one broadcast side: dead at 100 TB). Bucketing time
    * into window-length buckets turns it into a hash equi-join: a right
    * row at time s lives in bucket ⌊s/W⌋; a left row at time t can only
    * match buckets ⌊t/W⌋ and ⌊t/W⌋+1, so the left side explodes to those
    * two bucket keys (2× one side, vs n× the other in a nested loop) and
    * the exact range predicate post-filters the bucket collisions. The
    * shuffle is hash(bucket) — time-local rows co-locate, and skew in one
    * time bucket is AQE-splittable like any hot hash key.
    * Column names must be disjoint (pre-alias as for any join). */
  def keylessRangeJoin(left: DataFrame, right: DataFrame,
                       leftTime: String, rightTime: String,
                       windowUs: Long): DataFrame = {
    require(windowUs > 0, s"window must be positive, got $windowUs")
    val b = floor(col(leftTime) / windowUs)
    val lb = left.withColumn("__bucket", explode(array(b, b + 1)))
    val rb = right.withColumn("__bucket", floor(col(rightTime) / windowUs))
    lb.join(rb, "__bucket")
      .filter(col(rightTime) >= col(leftTime) &&
        col(rightTime) <= col(leftTime) + windowUs)
      .drop("__bucket")
  }

  /** b16: approximate distinct counting — HLL++ next to the exact count.
    * At 100 TB approx_count_distinct is the only affordable per-group
    * cardinality (fixed-size sketch, map-side mergeable, no second shuffle
    * for distinct); the exact count here exists to *audit* it. The output
    * pins the audit: `approx_ok` asserts the sketch landed within 5% (the
    * oracle expects literal true); the sketch value itself stays out of
    * the output because no other engine reproduces HLL++ bit-for-bit. */
  def b16ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      // rsd 0.02 (not tighter): Spark's distinct-agg rewrite keys the
      // partial HLL by (group, user_id), so the buffer is allocated per
      // distinct PAIR — rsd 0.01's 4×-larger registers measurably slowed
      // the whole query while 0.02 still leaves 2.5σ inside the 5% audit
      .agg(count_distinct(col("user_id")).as("exact_nd"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_nd"))
      .select(col("event_type"), col("exact_nd"),
        (abs(col("approx_nd") - col("exact_nd")).cast("double") <=
          col("exact_nd").cast("double") * 0.05).as("approx_ok"))
      .orderBy("event_type")

  /** b18: full outer join — the reconciliation shape (which entities exist
    * on which side) that left/semi/anti (b7) don't cover. Planned as a
    * SortMergeJoin/ShuffledHashJoin on the key; neither side can broadcast
    * a full outer, so the shuffle IS the plan at any scale. The filtered
    * customer range makes all three row classes non-empty: matched,
    * customer-only, and events-only. */
  def b18OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_custkey") >= 100)
      .select(col("c_custkey"), col("c_name"))
    val u = Tables.events(spark, dir).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    c.join(u, col("c_custkey") === col("user_id"), "full_outer")
      .select(coalesce(col("c_custkey"), col("user_id")).as("entity_id"),
        col("c_custkey").isNotNull.as("has_customer"),
        col("user_id").isNotNull.as("has_events"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("entity_id")
  }

  /** b17: approximate quantiles with an exact audit — b16's pattern
    * applied to percentiles. At 100 TB the sort-based exact `percentile`
    * (b12) shuffles whole groups; `approx_percentile`'s KLL-style sketch
    * is single-pass, fixed-size, and map-side mergeable — the only
    * affordable shape. The sketch value itself is engine-specific, so the
    * output pins the AUDIT (sketch within 5% of exact, oracle expects
    * literal true) next to the exact values the oracle reproduces. */
  def b17ApproxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("am"),
        expr("approx_percentile(l_quantity, 0.9, 1000)").as("a9"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("median_qty"), col("p90_qty"), col("n"),
        (abs(col("am") - col("median_qty")) <= col("median_qty") * 0.05 &&
          abs(col("a9") - col("p90_qty")) <= col("p90_qty") * 0.05).as("approx_ok"))
      .orderBy("l_returnflag")

  /** b19: correlated scalar subqueries — "parts priced >20% above their
    * brand's average" written as the user writes it (two correlated
    * aggregating subqueries), relying on Catalyst's decorrelation
    * (RewriteCorrelatedScalarSubquery) to plan ONE aggregate per subquery
    * plus equi-joins on p_brand — never a per-row re-scan, which is what
    * a naive engine (or a LATERAL rendering) would do at 100 TB. The
    * avg comparison is rewritten to integer cross-multiplication
    * (cents·10·n > 12·sum_cents) so both engines compare exact BIGINTs —
    * a double `avg` threshold is partial-aggregation-order dependent. */
  def b19Correlated(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir).createOrReplaceTempView("graft_b19_part")
    spark.sql(
      """WITH parts AS (
        |  SELECT p_partkey, p_brand,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents
        |  FROM graft_b19_part)
        |SELECT p_partkey, p_brand, cents
        |FROM parts p
        |WHERE cents * 10 * (SELECT count(*) FROM parts p2
        |                    WHERE p2.p_brand = p.p_brand)
        |    > 12 * (SELECT sum(cents) FROM parts p3
        |            WHERE p3.p_brand = p.p_brand)
        |ORDER BY p_partkey""".stripMargin)
  }

  /** b20: unpivot (melt) — the wide→long reshape (b13's pivot inverted),
    * here folding lineitem's four measure columns into (measure, value)
    * rows and profiling each measure in one pass. Unpivot plans as an
    * Expand node (each input row emits one row per measure INSIDE the
    * scan stage — no join, no union of four scans), then a partial-
    * aggregated groupBy on the 4-value measure key: map-side combine
    * collapses everything before the one tiny exchange, the same cost
    * profile at any scale. Sums run in fixed-point cents (round(v·100) as
    * BIGINT — double sums are partial-agg-order dependent, integer sums
    * are exact in any engine); min/max are order-independent and emit as
    * 6-dp doubles. */
  def b20Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val measures = Array("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    Tables.lineitem(spark, dir)
      .unpivot(Array(col("l_orderkey")), measures.map(col), "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("bigint")).as("sum_c2"),
        round(min(col("value")), 6).as("min_v"),
        round(max(col("value")), 6).as("max_v"))
      .orderBy("measure")
  }

  /** b21: windowed event dedup — suppress REPEATED identical events
    * (retries, double-fires, at-least-once replays) that land within a
    * suppression window of the previous identical one: the batch
    * counterpart of d5's dropDuplicatesWithinWatermark, and the
    * telemetry-log cleaning pass every training-data event pipeline
    * runs. An event is a duplicate iff a same-identity (user_id,
    * event_type) event precedes it by ≤ `windowMicros` (30 min
    * default — the corpus's double-valued payloads are unique, so
    * identity is the action, not the payload; both dup and non-dup
    * classes are non-empty at every rehearsal SF). ONE shuffle on the
    * identity key serves the single lag window; gap arithmetic in
    * integer epoch-micros (both engines agree exactly — events.ts is
    * NANOS on disk and never emitted raw).
    * Semantics: each event compares to its IMMEDIATE predecessor, so a
    * retry storm keeps suppressing as long as gaps stay small. That is
    * deliberately NOT d5's rule — Spark's watermark dedup anchors its
    * state at the FIRST arrival and never extends it on duplicates, so
    * d5 re-admits an identical event once the first one's watermark
    * expires even mid-storm. Predecessor-chaining is the single-lag-
    * window shape (one pass, no running anchor); when first-arrival
    * anchoring is wanted in batch, c13's session machinery (running
    * break-sums) provides the anchor. */
  def b21WindowDedup(spark: SparkSession, dir: String,
                     windowMicros: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        (col("prev_us").isNotNull &&
          unix_micros(col("ts")) - col("prev_us") <= windowMicros).as("is_dup"))
      .orderBy("event_id")
  }

  /** c13: batch sessionization — a new session starts after a >30 min gap
    * per user. One shuffle on user_id serves both window passes and the
    * final groupBy (same partitioning, Catalyst reuses the exchange). Gap
    * arithmetic is in integer epoch-micros so both engines agree exactly;
    * the streaming shape of this operator is d3 (flatMapGroupsWithState). */
  def c13Sessionize(spark: SparkSession, dir: String,
                    gapMicros: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_no", sum("brk").over(wc))
      .groupBy("user_id", "session_no")
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .orderBy("user_id", "session_no")
  }
}
