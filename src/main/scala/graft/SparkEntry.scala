package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Relational, SeqColumn, Similarity, TextOps}
import graft.sources.JsonConvert

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query has a matching `oracleSql` entry (DuckDB dialect, same
  * column names and ORDER BY) unless the operator is not SQL-expressible.
  * Numeric discipline: exact types (bigint/decimal/string) everywhere;
  * doubles only passed through or produced by a single division, never
  * accumulated — see SURVEY §5.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.b3JoinMultiway(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-series: bolson core surface
    "a1_json_parse" -> (JsonConvert.a1JsonParse _),
    "a2_json_battery" -> (JsonConvert.a2JsonBattery _),
    "a3_json_trip" -> (JsonConvert.a3JsonTrip _),
    "a4_seq_column" -> (SeqColumn.a4SeqColumn _),
    // B-series: relational core
    "b1_scan_filter_project" -> (Relational.b1ScanFilterProject _),
    "b2_agg_pricing" -> (Relational.b2AggPricing _),
    "b3_join_multiway" -> (Relational.b3JoinMultiway _),
    "b4_topk" -> (Relational.b4TopK _),
    "b5_distinct" -> (Relational.b5Distinct _),
    "b6_window" -> (Relational.b6Window _),
    "b7_semi_anti" -> (Relational.b7SemiAnti _),
    "b8_setops" -> (Relational.b8SetOps _),
    "b9_conditional_agg" -> (Relational.b9ConditionalAgg _),
    "b10_time_window" -> (Relational.b10TimeWindow _),
    "b11_grouping_sets" -> (Relational.b11GroupingSets _),
    "b12_quantiles" -> (Relational.b12Quantiles _),
    // C-series: training-data pipeline
    "c1_dedup_exact" -> (Dedup.c1DedupExact _),
    "c5_ann_brute" -> ((s: SparkSession, d: String) => Similarity.c5AnnBrute(s, d)),
    "c7_text_quality" -> (TextOps.c7TextQuality _),
    "c8_lang_id" -> (TextOps.c8LangId _),
    "c9_token_count" -> (TextOps.c9TokenCount _),
    "c10_fingerprint" -> (TextOps.c10Fingerprint _),
  )

  /** DuckDB oracle SQL, same column names + ORDER BY as the Spark result. */
  def oracleSql: Map[String, String] = Map(
    "a1_json_parse" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "a2_json_battery" ->
      """SELECT l_orderkey, count(*) AS n_readings,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_voltage,
        |  CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_voltage
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a3_json_trip" ->
      """SELECT o_orderkey AS vin,
        |  strftime(o_orderdate, '%Y-%m-%d') AS trip_date,
        |  o_totalprice > 1000.0 AS hypermiling,
        |  CAST(floor(o_totalprice) AS BIGINT) AS odometer,
        |  CAST(o_orderkey % 60 + o_custkey % 60 + CAST(floor(o_totalprice) AS BIGINT) % 60 AS BIGINT) AS sum_sec_in_band,
        |  CAST(o_custkey % 10 + CAST(floor(o_totalprice) AS BIGINT) % 100 AS BIGINT) AS events_total
        |FROM orders ORDER BY vin""".stripMargin,
    "a4_seq_column" ->
      """SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq
        |FROM documents ORDER BY doc_id""".stripMargin,
    "b1_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_discount > 0.07
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "b2_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
        |  CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "b3_join_multiway" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "b4_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "b5_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "b6_window" ->
      """SELECT c_mktsegment, rnk, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rnk
        |  FROM customer) t
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,
    "b7_semi_anti" ->
      """SELECT c_custkey, c_name, TRUE AS has_orders FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, c_name, FALSE AS has_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "b8_setops" ->
      """SELECT 'both' AS tag, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'signup')
        |UNION ALL
        |SELECT 'purchase_only' AS tag, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'signup')
        |ORDER BY tag, user_id""".stripMargin,
    "b9_conditional_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_value
        |FROM events GROUP BY event_type HAVING count(*) > 10
        |ORDER BY event_type""".stripMargin,
    "b10_time_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "b11_grouping_sets" ->
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        |  count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation""".stripMargin,
    "b12_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "c1_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies, md5(text) AS content_key
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "c5_ann_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |     c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |           FROM embeddings WHERE vec_id >= 5),
        |     s AS (SELECT query_id, neighbor_id,
        |             list_cosine_similarity(qv, cv) AS cosine
        |           FROM q CROSS JOIN c),
        |     r AS (SELECT query_id, neighbor_id, cosine,
        |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rnk
        |           FROM s)
        |SELECT query_id, rnk, neighbor_id, round(cosine, 6) AS cosine_r
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "c7_text_quality" ->
      """SELECT doc_id, n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stopwords,
        |  CAST(n_chars - (CAST(len(string_split(text, ' ')) AS BIGINT) - 1) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_word_len,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS BIGINT) AS stopword_ratio,
        |  (len(string_split(text, ' ')) >= 5
        |   AND CAST(n_chars - (CAST(len(string_split(text, ' ')) AS BIGINT) - 1) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS BIGINT) >= 2.0
        |   AND CAST(n_chars - (CAST(len(string_split(text, ' ')) AS BIGINT) - 1) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS BIGINT) <= 12.0) AS keep
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c8_lang_id" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) AS BIGINT) AS en_hits,
        |  CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) >= 2 THEN 'en'
        |       WHEN len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in'))) = 1 THEN 'en_maybe'
        |       ELSE 'other' END AS lang_guess
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c9_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS alpha_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c10_fingerprint" ->
      """SELECT doc_id, md5(text) AS fingerprint,
        |  substr(md5(text), 1, 8) AS fp_bucket, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
