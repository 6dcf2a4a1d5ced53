package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ipc.IpcQueries
import graft.operators.{Dedup, Distill, Multimodal, Relational, SeqColumn, Similarity, TextOps}
import graft.sources.{FormatConvert, JsonConvert}
import graft.streaming.{PipelineQueries, StreamPipeline}

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
    "a5_batch_resize" -> (IpcQueries.a5BatchResize _),
    "a6_ipc_serialize" -> (IpcQueries.a6IpcSerialize _),
    "a7_publisher" -> (PipelineQueries.a7Publisher _),
    "a8_stream_pipeline" -> (StreamPipeline.a8StreamPipeline _),
    "a9_metrics" -> (PipelineQueries.a9Metrics _),
    "a10_convert_bench" -> (PipelineQueries.a10ConvertBench _),
    "a11_csv_convert" -> (FormatConvert.a11CsvConvert _),
    "a12_orc_roundtrip" -> (FormatConvert.a12OrcRoundtrip _),
    "a13_permissive_parse" -> (JsonConvert.a13PermissiveParse _),
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
    "b13_pivot" -> (Relational.b13Pivot _),
    "b14_asof_join" -> (Relational.b14AsofJoin _),
    "b15_range_join" -> ((s: SparkSession, d: String) => Relational.b15RangeJoin(s, d)),
    "b16_approx_distinct" -> (Relational.b16ApproxDistinct _),
    "b17_approx_quantiles" -> (Relational.b17ApproxQuantiles _),
    "b18_outer_join" -> (Relational.b18OuterJoin _),
    "b19_correlated" -> (Relational.b19Correlated _),
    "b20_unpivot" -> (Relational.b20Unpivot _),
    "b21_window_dedup" -> ((s: SparkSession, d: String) => Relational.b21WindowDedup(s, d)),
    "b22_asof_forward" -> ((s: SparkSession, d: String) => Relational.b22AsofForward(s, d)),
    "b23_asof_row" -> (Relational.b23AsofRow _),
    // C-series: training-data pipeline
    "c1_dedup_exact" -> (Dedup.c1DedupExact _),
    "c2_dedup_minhash" -> ((s: SparkSession, d: String) => Dedup.c2DedupMinhash(s, d)),
    "c3_dedup_simhash" -> (Dedup.c3DedupSimhash _),
    "c4_ngram_jaccard" -> (Dedup.c4NgramJaccard _),
    "c5_ann_brute" -> ((s: SparkSession, d: String) => Similarity.c5AnnBrute(s, d)),
    "c6_ann_lsh" -> ((s: SparkSession, d: String) => Similarity.c6AnnLsh(s, d)),
    "c7_text_quality" -> (TextOps.c7TextQuality _),
    "c8_lang_id" -> (TextOps.c8LangId _),
    "c9_token_count" -> (TextOps.c9TokenCount _),
    "c10_fingerprint" -> (TextOps.c10Fingerprint _),
    "c11_embed_neardup" -> ((s: SparkSession, d: String) => Similarity.c11EmbedNearDup(s, d)),
    "c12_multimodal" -> (Multimodal.c12Multimodal _),
    "c13_sessionize" -> ((s: SparkSession, d: String) => Relational.c13Sessionize(s, d)),
    "c14_train_split" -> (TextOps.c14TrainSplit _),
    "c15_embed_centroid" -> (Similarity.c15EmbedCentroid _),
    "c16_tfidf" -> (TextOps.c16Tfidf _),
    "c17_stratified_sample" -> (TextOps.c17StratifiedSample _),
    "c18_ann_ivf" -> ((s: SparkSession, d: String) => Similarity.c18AnnIvf(s, d)),
    "c19_dedup_cluster" -> (Dedup.c19DedupCluster _),
    "c20_pii_scrub" -> (TextOps.c20PiiScrub _),
    "c21_repetition_ratio" -> (TextOps.c21RepetitionRatio _),
    "c22_embed_quantize" -> (Similarity.c22EmbedQuantize _),
    "c23_seq_pack" -> ((s: SparkSession, d: String) => TextOps.c23SeqPack(s, d)),
    "c25_mixture_resample" -> (TextOps.c25MixtureResample _),
    "c24_decontam" -> (TextOps.c24Decontam _),
    "c26_passage_dedup" -> ((s: SparkSession, d: String) => Dedup.c26PassageDedup(s, d)),
    "c27_bloom_decontam" -> ((s: SparkSession, d: String) => TextOps.c27BloomDecontam(s, d)),
    "c28_random_projection" -> ((s: SparkSession, d: String) => Similarity.c28RandomProjection(s, d)),
    "c29_hard_negatives" -> ((s: SparkSession, d: String) => Similarity.c29HardNegatives(s, d)),
    "c30_cluster_split" -> ((s: SparkSession, d: String) => Dedup.c30ClusterSplit(s, d)),
    "c31_kmeans_step" -> (Similarity.c31KmeansStep _),
    "c32_corpus_stats" -> (TextOps.c32CorpusStats _),
    "c33_hard_negatives_lsh" -> ((s: SparkSession, d: String) => Similarity.c33HardNegativesLsh(s, d)),
    "c34_vocab_topk" -> ((s: SparkSession, d: String) => TextOps.c34VocabTopk(s, d)),
    "c35_quality_filter" -> (TextOps.c35QualityFilter _),
    "c36_pq_quantize" -> ((s: SparkSession, d: String) => Similarity.c36PqQuantize(s, d)),
    "c37_incremental_dedup" -> ((s: SparkSession, d: String) => Dedup.c37IncrementalDedup(s, d)),
    "c38_pq_search" -> ((s: SparkSession, d: String) => Similarity.c38PqSearch(s, d)),
    "c79_exact_rerank" -> ((s: SparkSession, d: String) => Similarity.c79ExactRerank(s, d)),
    "c80_dsir_weights" -> ((s: SparkSession, d: String) => graft.operators.Dsir.c80DsirWeights(s, d)),
    "c81_containment" -> ((s: SparkSession, d: String) => Dedup.c81ContainmentDedup(s, d)),
    "c82_best_of_cluster" -> ((s: SparkSession, d: String) => Dedup.c82BestOfCluster(s, d)),
    "c83_minhash_recall" -> ((s: SparkSession, d: String) => Dedup.c83MinhashRecall(s, d)),
    "c84_tokenizer_report" -> ((s: SparkSession, d: String) => TextOps.c84TokenizerReport(s, d)),
    "c85_global_rank" -> ((s: SparkSession, d: String) => graft.operators.Curriculum.c85GlobalRank(s, d)),
    "c87_media_card" -> (Multimodal.c87MediaCard _),
    "c88_image_phash" -> (Multimodal.c88ImagePhash _),
    "c89_phash_pairs" -> (Multimodal.c89PhashPairs _),
    "c90_audio_phash" -> (Multimodal.c90AudioPhash _),
    "c91_video_phash" -> (Multimodal.c91VideoPhash _),
    "c92_soft_dedup" -> ((s: SparkSession, d: String) => Dedup.c92SoftDedup(s, d)),
    "c93_audio_pairs" -> (Multimodal.c93AudioPairs _),
    "c94_video_pairs" -> (Multimodal.c94VideoPairs _),
    "c95_incr_clusters" -> ((s: SparkSession, d: String) => Dedup.c95IncrClusters(s, d)),
    "c96_domain_cap" -> ((s: SparkSession, d: String) => graft.operators.Curation.c96DomainCap(s, d)),
    "c97_domain_stats" -> ((s: SparkSession, d: String) => graft.operators.Curation.c97DomainStats(s, d)),
    "c86_curriculum" -> ((s: SparkSession, d: String) => graft.operators.Curriculum.c86Curriculum(s, d)),
    "c39_chunk" -> ((s: SparkSession, d: String) => TextOps.c39Chunk(s, d)),
    "c40_shuffle_shard" -> ((s: SparkSession, d: String) => TextOps.c40ShuffleShard(s, d)),
    "c41_freq_score" -> ((s: SparkSession, d: String) => TextOps.c41FreqScore(s, d)),
    "c42_banded_sample" -> ((s: SparkSession, d: String) => TextOps.c42BandedSample(s, d)),
    "c43_semantic_dedup" -> ((s: SparkSession, d: String) => Similarity.c43SemanticDedup(s, d)),
    "c44_bpe_pairs" -> ((s: SparkSession, d: String) => TextOps.c44BpePairs(s, d)),
    "c45_embed_moments" -> ((s: SparkSession, d: String) => Similarity.c45EmbedMoments(s, d)),
    "c46_power_iter" -> ((s: SparkSession, d: String) => Similarity.c46PowerIter(s, d)),
    "c47_whiten" -> ((s: SparkSession, d: String) => Similarity.c47Whiten(s, d)),
    "c48_sample_exact" -> ((s: SparkSession, d: String) => TextOps.c48SampleExact(s, d)),
    "c49_snapshot_diff" -> ((s: SparkSession, d: String) => TextOps.c49SnapshotDiff(s, d)),
    "c50_group_budget" -> ((s: SparkSession, d: String) => TextOps.c50GroupBudget(s, d)),
    "c51_image_codec" -> (Multimodal.c51ImageCodec _),
    "c52_bpe_tokenize" -> ((s: SparkSession, d: String) => TextOps.c52BpeTokenize(s, d)),
    "c53_jpeg_codec" -> ((s: SparkSession, d: String) => Multimodal.c53ImageCodec(s, d)),
    "c54_pca_project" -> ((s: SparkSession, d: String) => Similarity.c54PcaProject(s, d)),
    "c55_bm25" -> ((s: SparkSession, d: String) => TextOps.c55Bm25(s, d)),
    "c56_lm_score" -> ((s: SparkSession, d: String) => TextOps.c56LmScore(s, d)),
    "c57_winnow" -> ((s: SparkSession, d: String) => TextOps.c57Winnow(s, d)),
    "c58_ann_recall" -> ((s: SparkSession, d: String) => Similarity.c58AnnRecall(s, d)),
    "c59_rrf_fuse" -> ((s: SparkSession, d: String) => TextOps.c59RrfFuse(s, d)),
    "c60_cluster_label" -> ((s: SparkSession, d: String) => TextOps.c60ClusterLabel(s, d)),
    "c61_dataset_card" -> ((s: SparkSession, d: String) => TextOps.c61DatasetCard(s, d)),
    "c62_dup_spans" -> ((s: SparkSession, d: String) => Dedup.c62DupSpans(s, d)),
    "c63_span_scrub" -> ((s: SparkSession, d: String) => Dedup.c63SpanScrub(s, d)),
    "c64_dup_stats" -> ((s: SparkSession, d: String) => Dedup.c64DupStats(s, d)),
    "c65_span_minlen" -> ((s: SparkSession, d: String) => Dedup.c65SpanMinlen(s, d)),
    "c66_bpe_fertility" -> ((s: SparkSession, d: String) => TextOps.c66BpeFertility(s, d)),
    "c67_scrub_minlen" -> ((s: SparkSession, d: String) => Dedup.c67ScrubMinlen(s, d)),
    "c68_contam_report" -> ((s: SparkSession, d: String) => TextOps.c68ContamReport(s, d)),
    "c69_span_clusters" -> ((s: SparkSession, d: String) => Dedup.c69SpanClusters(s, d)),
    "c70_bpe_bytes" -> ((s: SparkSession, d: String) => TextOps.c70BpeBytes(s, d)),
    "c71_neardup_banded" -> ((s: SparkSession, d: String) => Similarity.c71NearDupBanded(s, d)),
    "c72_neardup_recall" -> ((s: SparkSession, d: String) => Similarity.c72NearDupRecall(s, d)),
    "c73_byte_fertility" -> ((s: SparkSession, d: String) => TextOps.c73ByteFertility(s, d)),
    "c74_quality_classifier" -> ((s: SparkSession, d: String) => Distill.c74QualityClassifier(s, d)),
    "c75_unigram_tokenize" -> ((s: SparkSession, d: String) => graft.operators.Unigram.c75UnigramTokenize(s, d)),
    "c76_pack_ffd" -> ((s: SparkSession, d: String) => TextOps.c76PackFfd(s, d)),
    "c77_pack_report" -> ((s: SparkSession, d: String) => TextOps.c77PackReport(s, d)),
    "c78_unigram_fertility" -> ((s: SparkSession, d: String) => graft.operators.Unigram.c78UnigramFertility(s, d)),
    "c98_wordpiece_tokenize" -> ((s: SparkSession, d: String) => graft.operators.Wordpiece.c98WordpieceTokenize(s, d)),
    "c99_wordpiece_fertility" -> ((s: SparkSession, d: String) => graft.operators.Wordpiece.c99WordpieceFertility(s, d)),
    "c100_cms_topk" -> ((s: SparkSession, d: String) => graft.operators.Sketch.c100CmsTopk(s, d)),
    "c101_tokenizer_matrix" -> ((s: SparkSession, d: String) => TextOps.c101TokenizerMatrix(s, d)),
    "c102_media_clusters" -> (Multimodal.c102MediaClusters _),
    "c103_media_clusters_incr" -> (Multimodal.c103MediaClustersIncr _),
    "c104_audio_clusters" -> (Multimodal.c104AudioClusters _),
    "c105_video_pairs" -> (Multimodal.c105VideoPairs _),
    "c106_video_clusters" -> (Multimodal.c106VideoClusters _),
    "c107_joint_dedup" -> (Multimodal.c107JointDedup _),
    "c108_phash_recall" -> (Multimodal.c108PhashRecall _),
    "c109_video_clusters_incr" -> (Multimodal.c109VideoClustersIncr _),
    "c113_audio_clusters_incr" -> (Multimodal.c113AudioClustersIncr _),
    "c114_recall_split" -> (Multimodal.c114PhashRecallSplit _),
    "c115_video_sig_index" -> (Multimodal.c115VideoSigIndex _),
    "c120_recall_sampled" -> (Multimodal.c120RecallSampled _),
    "c110_data_recipe" -> (TextOps.c110DataRecipe _),
    "c111_recipe_sample" -> (TextOps.c111RecipeSample _),
    "c112_shard_manifest" -> ((s: SparkSession, d: String) => TextOps.c112ShardManifest(s, d)),
    "c116_recipe_audit" -> ((s: SparkSession, d: String) => TextOps.c116RecipeAudit(s, d)),
    "c117_html_extract" -> ((s: SparkSession, d: String) => graft.operators.Extract.c117HtmlExtract(s, d)),
    "c118_encoding_flag" -> ((s: SparkSession, d: String) => graft.operators.Extract.c118EncodingFlag(s, d)),
    "c119_crawl_pipeline" -> ((s: SparkSession, d: String) => graft.operators.Extract.c119CrawlPipeline(s, d)),
  )

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Session for oracle renderers that inline a TRAINED artifact (c52's
    * merges, c54's components): Verify renders right after running the
    * queries, so the artifact memos are warm and the active session is
    * reused; a cold standalone render (spec JVMs) creates one. */
  private def renderSession: SparkSession =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(GraftSession.get())

  /** DuckDB rendering of c54's projection: the SAME memoized component
    * vectors the Spark query broadcasts, inlined as integer-entry
    * DOUBLE[] literals (the rpPlanesValues rule: every dot product
    * against the fixed-point embedding is integer-valued ≪ 2^53, exact
    * in both engines in any summation order). */
  private def c54OracleSql(dir: String): String = {
    val comps = graft.operators.Similarity.pcaComponents(renderSession, dir)
    val projs = comps.zipWithIndex.map { case (u, i) =>
      s"CAST(list_dot_product(x4, ${u.mkString("[", ",", "]")}::DOUBLE[]) AS BIGINT) AS p$i"
    }.mkString(",\n  ")
    s"""WITH x AS (SELECT vec_id,
       |  list_transform(CAST(embedding AS DOUBLE[]), v -> round(v * 10000)) AS x4
       |  FROM embeddings)
       |SELECT vec_id,
       |  $projs
       |FROM x ORDER BY vec_id""".stripMargin
  }

  /** DuckDB rendering of c52's APPLY phase: the merge list learned by the
    * SAME memoized Spark training run the query uses, inlined as nested
    * literal replace() calls over the double-space-fenced symbol sequence
    * (TextOps.bpeSeqOf's scheme — literal replace is one greedy BPE merge
    * pass in both engines). Training itself is not re-run in SQL; the
    * inlined literals pin it: a nondeterministic trainer would render SQL
    * that mismatches the Spark re-train and hash-fail the gate. */
  /** The fenced-sequence merge-application expression over a column `w`
    * (TextOps.bpeSeqOf's scheme rendered in SQL — one literal replace
    * per learned merge), shared by the c52 and c66 renderers. */
  private def bpeAppliedExpr(dir: String): String =
    mergesAppliedExpr(graft.operators.TextOps.trainBpe(renderSession, dir))

  /** The fenced replace-chain for an ARBITRARY merge list (shared by the
    * char-level c52/c66 renderers and the byte-level c70 renderer — the
    * fence scheme is alphabet-agnostic, like the engine it verifies). */
  private def mergesAppliedExpr(merges: Seq[(String, String)]): String = {
    val seqExpr = "'  ' || array_to_string(list_transform(" +
      "range(1, len(w) + 1), i -> substr(w, CAST(i AS INT), 1)), '  ') || '  '"
    merges.foldLeft(seqExpr) { case (e, (a, b)) =>
      s"replace($e,\n           ${sqlLit(s" $a  $b ")}, ${sqlLit(s" $a$b ")})"
    }
  }

  private def c52OracleSql(dir: String): String =
    s"""WITH wc AS (SELECT w, count(*) AS wcnt
       |      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
       |      WHERE len(w) >= 1 GROUP BY w),
       |s AS (SELECT wcnt, ${bpeAppliedExpr(dir)} AS seq FROM wc),
       |t AS (SELECT wcnt, unnest(string_split(trim(seq), '  ')) AS token FROM s)
       |SELECT token, CAST(sum(wcnt) AS BIGINT) AS cnt
       |FROM t GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin

  /** DuckDB rendering of c70: byte-level staging + merge application,
    * both re-expressed in SQL. The pre-tokenizer is the SAME parity-safe
    * pattern the Spark query uses (TextOps.BytePretokenPattern — no
    * lookahead, identical in Java regex and RE2); staging renders as one
    * literal replace per NON-IDENTITY byte the gate corpus can contain
    * (space→Ġ, \n→Ċ, \t→ĉ, \r→č — all other printable-ASCII bytes map
    * to themselves in the GPT-2 table, so the oracle is exact on any
    * ASCII corpus; a non-ASCII byte would stage differently in Spark
    * and hash-FAIL loudly, never silently pass). Merges are the memoized
    * Spark-trained byte-level artifact inlined at render time (c52's
    * drift-pinning rule). */
  private def c70OracleSql(dir: String): String = {
    val merges = graft.operators.TextOps.trainBpeBytes(renderSession, dir)
    val stage = "replace(replace(replace(replace(p, ' ', 'Ġ'), " +
      "chr(10), 'Ċ'), chr(9), 'ĉ'), chr(13), 'č')"
    s"""WITH pt AS (SELECT unnest(regexp_extract_all(text,
       |        '${graft.operators.TextOps.BytePretokenPattern}')) AS p
       |      FROM documents WHERE text IS NOT NULL),
       |wc AS (SELECT $stage AS w, count(*) AS wcnt FROM pt GROUP BY 1),
       |s AS (SELECT wcnt, ${mergesAppliedExpr(merges)} AS seq FROM wc),
       |t AS (SELECT wcnt, unnest(string_split(trim(seq), '  ')) AS token FROM s)
       |SELECT token, CAST(sum(wcnt) AS BIGINT) AS cnt
       |FROM t GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin
  }

  /** DuckDB rendering of c73: c66's fold shape over BYTE-level units —
    * the same inlined staging replaces and learned merges as c70 (its
    * drift-pinning rule), applied per (doc, pretoken) and folded per
    * doc. */
  private def c73OracleSql(dir: String): String = {
    val merges = graft.operators.TextOps.trainBpeBytes(renderSession, dir)
    val stage = "replace(replace(replace(replace(p, ' ', 'Ġ'), " +
      "chr(10), 'Ċ'), chr(9), 'ĉ'), chr(13), 'č')"
    s"""WITH pt AS (SELECT doc_id, unnest(regexp_extract_all(text,
       |        '${graft.operators.TextOps.BytePretokenPattern}')) AS p
       |      FROM documents WHERE text IS NOT NULL),
       |wf AS (SELECT doc_id, $stage AS w FROM pt),
       |t AS (SELECT doc_id,
       |        CAST(len(string_split(trim(${mergesAppliedExpr(merges)}), '  ')) AS BIGINT) AS nt
       |      FROM wf)
       |SELECT doc_id, count(*) AS n_pretokens, CAST(sum(nt) AS BIGINT) AS n_tokens,
       |  CAST((2000000*sum(nt) + count(*)) // (2*count(*)) AS DOUBLE) / 1e6
       |    AS fertility_r
       |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** DuckDB rendering of c74: recompute the integer features and the
    * teacher label in SQL (the c35 + c41 oracle shapes composed), and
    * apply the tree trained by the SAME memoized Spark run the query
    * uses, inlined as CASE WHEN literals (c52's drift-pinning rule — a
    * partition-dependent trainer would render thresholds that mismatch
    * the Spark re-train and hash-fail the gate). */
  private def c74OracleSql(dir: String): String = {
    val t = graft.operators.Distill.trainTree(renderSession, dir)
    def childSql(c: graft.operators.Distill.Child): String = c.split match {
      case Some(s) =>
        s"CASE WHEN ${s.feature} <= ${s.thr} THEN ${c.predLe} ELSE ${c.predGt} END"
      case None => c.predLe.toString
    }
    val pred = s"CASE WHEN ${t.root.feature} <= ${t.root.thr} " +
      s"THEN ${childSql(t.le)} ELSE ${childSql(t.gt)} END"
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
       |             FROM documents),
       |tc AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
       |q AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
       |        CAST(count(*) AS BIGINT) AS n_types, CAST(max(c) AS BIGINT) AS max_tc
       |      FROM tc GROUP BY doc_id),
       |vocab AS (SELECT term, count(*) AS ctf FROM tok GROUP BY term),
       |tt AS (SELECT CAST(sum(ctf) AS BIGINT) AS total FROM vocab),
       |fr AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(ctf) AS BIGINT) AS sum_ctf
       |       FROM tok JOIN vocab USING (term) GROUP BY doc_id),
       |f AS (SELECT q.doc_id AS doc_id, n_words AS len,
       |        CAST(n_types * 1000 // n_words AS BIGINT) AS ttr_ppt,
       |        CAST(max_tc * 1000 // n_words AS BIGINT) AS top_ppt,
       |        CAST(sum_ctf * 1000000000 // (fr.n_tokens * tt.total) AS BIGINT)
       |          AS freq_ppb,
       |        ((n_words BETWEEN 10 AND 1000)
       |          AND CAST((2000000*n_types + n_words) // (2*n_words)
       |              AS DOUBLE) / 1e6 >= 0.2
       |          AND CAST((2000000*max_tc + n_words) // (2*n_words)
       |              AS DOUBLE) / 1e6 <= 0.2
       |          AND CAST((2000000*sum_ctf + fr.n_tokens*tt.total)
       |              // (2*fr.n_tokens*tt.total) AS DOUBLE) / 1e6
       |            >= 0.033) AS label
       |      FROM q JOIN fr ON q.doc_id = fr.doc_id, tt)
       |SELECT doc_id, len, ttr_ppt, top_ppt, freq_ppb, label,
       |  $pred AS pred
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** DuckDB rendering of c75: re-derive the word-type table and the
    * maximum-likelihood segmentation in SQL — a recursive CTE carries
    * each word's per-position Viterbi best array (integer score sum,
    * piece count, piece list) and advances one position per iteration;
    * candidates sort under (negscore, np, i), exactly the Spark fold's
    * (score desc, fewer-pieces, earliest-split) rule. The (piece →
    * score) map is the artifact trained by the SAME memoized Spark run,
    * inlined as a MAP literal (c52's drift-pinning rule — trainer drift
    * hash-fails the gate). */
  /** Shared DuckDB Viterbi DP (word-type CTE `wt` + recursive per-type
    * best-segmentation CTE `rec`) under the dir's MEMOIZED artifact
    * inlined as a MAP literal (c52's drift-pinning rule) — composed by
    * BOTH the c75 and c78 oracles, so the two gate rows re-derive
    * segmentation from one SQL text exactly as the Spark side shares
    * [[graft.operators.Unigram.segment]]. */
  private def unigramViterbiCtes(dir: String): String = {
    val art = graft.operators.Unigram.trainUnigram(renderSession, dir)
    val m = art.map { case (p, s) => s"${sqlLit(p)}: CAST($s AS BIGINT)" }
      .mkString("MAP {", ", ", "}")
    val L = graft.operators.Unigram.MaxPieceLen
    val unk = graft.operators.Unigram.UnkScore
    s"""wt AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS wcnt FROM
       |    (SELECT unnest(string_split(lower(text), ' ')) AS w
       |     FROM documents WHERE text IS NOT NULL)
       |  WHERE len(w) >= 1 GROUP BY w),
       |rec AS (
       |  SELECT w, wcnt, CAST(0 AS BIGINT) AS j,
       |    [struct_pack(score := CAST(0 AS BIGINT), np := CAST(0 AS BIGINT),
       |                 pieces := CAST([] AS VARCHAR[]))] AS bests
       |  FROM wt
       |  UNION ALL
       |  SELECT w, wcnt, j, list_append(bests,
       |    struct_pack(score := -best_j.negscore, np := best_j.np,
       |                pieces := best_j.pieces)) AS bests
       |  FROM (
       |    SELECT w, wcnt, r.j + 1 AS j, r.bests AS bests,
       |      list_sort(list_filter(
       |        list_transform(range(greatest(0, r.j + 1 - $L), r.j + 1),
       |          i -> struct_pack(
       |            negscore := -(r.bests[CAST(i AS INT) + 1].score +
       |              coalesce(map_extract($m,
       |                  substr(r.w, CAST(i AS INT) + 1, CAST(r.j + 1 - i AS INT)))[1],
       |                CASE WHEN r.j + 1 - i = 1 THEN CAST($unk AS BIGINT) END)),
       |            np := r.bests[CAST(i AS INT) + 1].np + 1,
       |            i := i,
       |            pieces := list_append(r.bests[CAST(i AS INT) + 1].pieces,
       |              substr(r.w, CAST(i AS INT) + 1, CAST(r.j + 1 - i AS INT))))),
       |        c -> c.negscore IS NOT NULL))[1] AS best_j
       |    FROM rec r WHERE r.j < len(r.w))),
       |wseg AS (
       |  SELECT w, wcnt, bests[len(w) + 1].np AS np,
       |    CAST(len(list_filter(bests[len(w) + 1].pieces,
       |      p -> map_extract($m, p)[1] IS NULL)) AS BIGINT) AS nunk
       |  FROM rec WHERE j = len(w))""".stripMargin
  }

  /** Shared DuckDB greedy longest-match segmentation (word-type CTE
    * `wt` + recursive per-type matcher CTE `rec` + terminal-state CTE
    * `wpseg`) under the dir's MEMOIZED WordPiece vocabulary inlined as
    * a VARCHAR[] literal (c52's drift-pinning rule) — composed by BOTH
    * the c98 and c99 oracles, exactly as the Spark side shares
    * [[graft.operators.Wordpiece.segment]]. One position advance per
    * iteration: the longest in-vocab (marked) prefix wins; no match →
    * the word's terminal row is the single [UNK] (BERT's whole-word
    * unknown, np = 1 in both engines by construction). */
  private def wordpieceGreedyCtes(dir: String): String = {
    val vocab = graft.operators.Wordpiece.trainWordpiece(renderSession, dir)
    val v = vocab.map(sqlLit).mkString("[", ", ", "]")
    val L = graft.operators.Wordpiece.MaxPieceLen
    s"""wt AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS wcnt FROM
       |    (SELECT unnest(string_split(lower(text), ' ')) AS w
       |     FROM documents WHERE text IS NOT NULL)
       |  WHERE len(w) >= 1 GROUP BY w),
       |rec AS (
       |  SELECT w, wcnt, CAST(1 AS BIGINT) AS pos,
       |    CAST([] AS VARCHAR[]) AS toks, false AS failed
       |  FROM wt
       |  UNION ALL
       |  SELECT w, wcnt,
       |    CAST(CASE WHEN bestl IS NULL THEN len(w) + 1
       |              ELSE pos + bestl END AS BIGINT) AS pos,
       |    CASE WHEN bestl IS NULL THEN toks
       |         ELSE list_append(toks, pref || substr(w, CAST(pos AS INT),
       |                CAST(bestl AS INT))) END AS toks,
       |    bestl IS NULL AS failed
       |  FROM (
       |    SELECT w, wcnt, pos, toks,
       |      CASE WHEN pos = 1 THEN '' ELSE '##' END AS pref,
       |      list_max(list_filter(
       |        list_transform(range(1, least($L, len(w) - pos + 1) + 1),
       |          l -> CAST(l AS INT)),
       |        l -> list_contains($v,
       |          (CASE WHEN pos = 1 THEN '' ELSE '##' END) ||
       |            substr(w, CAST(pos AS INT), l)))) AS bestl
       |    FROM rec WHERE NOT failed AND pos <= len(w))),
       |wpseg AS (
       |  SELECT w, wcnt,
       |    CASE WHEN failed THEN ['${graft.operators.Wordpiece.Unk}']
       |         ELSE toks END AS toks,
       |    CAST(CASE WHEN failed THEN 1 ELSE len(toks) END AS BIGINT) AS np,
       |    CAST(CASE WHEN failed THEN 1 ELSE 0 END AS BIGINT) AS nunk
       |  FROM rec WHERE failed OR pos > len(w))""".stripMargin
  }

  /** DuckDB rendering of c98: the shared greedy CTEs' terminal token
    * lists, exploded and folded to the corpus token-frequency table —
    * c75's gate shape on the fourth trainer. */
  private def c98OracleSql(dir: String): String =
    s"""WITH RECURSIVE ${wordpieceGreedyCtes(dir)}
       |SELECT token, CAST(sum(wcnt) AS BIGINT) AS cnt FROM
       |  (SELECT unnest(toks) AS token, wcnt FROM wpseg)
       |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin

  /** DuckDB rendering of c99: the shared greedy CTEs give each word
    * TYPE its piece count, then the corpus word stream joins that
    * type-level table and folds per doc — c78's word-type-join shape
    * verbatim. */
  private def c99OracleSql(dir: String): String =
    s"""WITH RECURSIVE ${wordpieceGreedyCtes(dir)},
       |wnp AS (SELECT w, np FROM wpseg),
       |dw AS (SELECT doc_id, w FROM
       |    (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |     FROM documents WHERE text IS NOT NULL)
       |  WHERE len(w) >= 1)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(np) AS BIGINT) AS n_tokens,
       |  CAST((2000000*sum(np) + count(*)) // (2*count(*)) AS DOUBLE) / 1e6
       |    AS fertility_r
       |FROM dw JOIN wnp USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB rendering of c82: c19's transitive-closure cluster CTEs +
    * c41's score SQL embedded as a subquery + the per-cluster argmax
    * (score desc, doc_id asc) — the same composition the Spark side
    * runs. */
  private def c82OracleSql(c41Sql: String): String =
    s"""$clusterCte,
       |cl AS (SELECT d.doc_id,
       |         CAST(least(COALESCE(l.mn, d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
       |       FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id),
       |sc AS (SELECT doc_id, mean_prob_r FROM ($c41Sql)),
       |j AS (SELECT cl.doc_id, cl.cluster_id, sc.mean_prob_r
       |      FROM cl JOIN sc USING (doc_id)),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
       |         ORDER BY mean_prob_r DESC, doc_id ASC) AS rn FROM j),
       |cn AS (SELECT cluster_id, doc_id AS canonical_id FROM rk WHERE rn = 1)
       |SELECT j.doc_id, j.cluster_id, j.mean_prob_r, cn.canonical_id,
       |  j.doc_id = cn.canonical_id AS is_canonical
       |FROM j JOIN cn USING (cluster_id) ORDER BY doc_id""".stripMargin

  /** DuckDB rendering of c92: c19's cluster CTEs + per-cluster size +
    * the exact-integer half-up 6-dp inverse — the same composition the
    * Spark side runs off the memoized cluster table. */
  private def c92OracleSql: String =
    s"""$clusterCte,
       |cl AS (SELECT d.doc_id,
       |         CAST(least(COALESCE(l.mn, d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
       |       FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |       FROM cl GROUP BY cluster_id)
       |SELECT cl.doc_id, cl.cluster_id, sz.cluster_size,
       |  CAST((2*1000000 + sz.cluster_size) // (2*sz.cluster_size) AS DOUBLE)
       |    / 1000000 AS weight_r
       |FROM cl JOIN sz USING (cluster_id) ORDER BY doc_id""".stripMargin

  /** DuckDB rendering of c85: the global window formulation over the
    * c41 score subquery. */
  private def c85OracleSql(c41Sql: String): String =
    s"""WITH sc AS (SELECT doc_id, mean_prob_r FROM ($c41Sql))
       |SELECT doc_id, mean_prob_r,
       |  CAST(row_number() OVER (ORDER BY mean_prob_r DESC, doc_id)
       |    AS BIGINT) AS global_rank
       |FROM sc ORDER BY doc_id""".stripMargin

  /** DuckDB rendering of c86: c85's rank window + exact-integer decile
    * + the md5 shuffle key + the (phase, skey, doc_id) position
    * window. */
  private def c86OracleSql(c41Sql: String): String =
    s"""WITH sc AS (SELECT doc_id, mean_prob_r FROM ($c41Sql)),
       |r AS (SELECT doc_id,
       |        CAST(row_number() OVER (ORDER BY mean_prob_r DESC, doc_id)
       |          AS BIGINT) AS global_rank
       |      FROM sc),
       |n AS (SELECT count(*) AS n_docs FROM r),
       |p AS (SELECT doc_id,
       |        CAST((global_rank - 1) * 10 // n_docs AS BIGINT) AS phase,
       |        md5('curriculum:' || CAST(doc_id AS VARCHAR)) AS skey
       |      FROM r, n)
       |SELECT doc_id, phase, skey,
       |  CAST(row_number() OVER (ORDER BY phase, skey, doc_id)
       |    AS BIGINT) AS train_pos
       |FROM p ORDER BY doc_id""".stripMargin

  /** DuckDB rendering of c83: exact-jaccard truth over shared-shingle
    * pairs + c2's SQL embedded as the banded side (c58's rule), folded
    * to c72's one-row recall shape. */
  private def c83OracleSql(c2Sql: String): String =
    s"""WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |             FROM documents WHERE text IS NOT NULL),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
       |       FROM tok, UNNEST(range(1, len(tk)-1)) AS u(i)),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |tr AS (SELECT it.doc_a, it.doc_b FROM
       |         (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle
       |                            AND a.doc_id < b.doc_id
       |          GROUP BY a.doc_id, b.doc_id) it
       |       JOIN sz za ON za.doc_id = it.doc_a
       |       JOIN sz zb ON zb.doc_id = it.doc_b
       |       WHERE CAST((2000000*it.ni + (za.n + zb.n - it.ni))
       |             // (2*(za.n + zb.n - it.ni)) AS DOUBLE) / 1e6
       |             >= 0.5),
       |bd AS (SELECT doc_a, doc_b FROM ($c2Sql) WHERE jaccard >= 0.5),
       |u AS (SELECT doc_a, doc_b, 1 AS e, 0 AS b FROM tr
       |      UNION ALL SELECT doc_a, doc_b, 0, 1 FROM bd),
       |g AS (SELECT doc_a, doc_b, max(e) AS e, max(b) AS b
       |      FROM u GROUP BY doc_a, doc_b)
       |SELECT CAST(sum(e) AS BIGINT) AS n_exact,
       |  CAST(sum(b) AS BIGINT) AS n_banded,
       |  CAST(sum(e * b) AS BIGINT) AS n_hit,
       |  CAST((2000000*sum(e * b) + sum(e)) // (2*sum(e)) AS DOUBLE) / 1e6
       |    AS recall_r
       |FROM g""".stripMargin

  /** DuckDB rendering of c89: the c88 hash SQL feeds the 14-bit band
    * self-join (candidates = pairs sharing any segment), hamming is
    * bit_count(xor) on the two BIGINT hashes, and pix_l1 re-derives
    * from the closed-form 8×8 thumbnails — the full banding + exact
    * verify surface, engine-checked. */
  private def c89OracleSql(c88Sql: String): String =
    s"""WITH hs AS (SELECT doc_id, phash FROM (${c88Sql.replace("\n", "\n  ")})),
       |sg AS (SELECT doc_id, phash, j,
       |         (phash >> CAST(j*14 AS INT)) & 16383 AS seg
       |       FROM hs, range(0, 4) jj(j)),
       |-- hamming pushed INTO the candidate set (r16): the exact-verify
       |-- stage must only ever see the ≤-radius survivors, not the full
       |-- band-collision set (8× bigger on the clustered corpora)
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                a.phash AS ha, b.phash AS hb
       |         FROM sg a JOIN sg b ON a.j = b.j AND a.seg = b.seg
       |                            AND a.doc_id < b.doc_id
       |         WHERE bit_count(xor(a.phash, b.phash)) <= 3),
       |img AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
       |        FROM documents WHERE doc_id % 3 = 0),
       |px AS (SELECT doc_id, r*8 + x AS pt,
       |         (doc_id*31 + ((r*h//8)*w + (x*w//8))*7) % 256 AS p
       |       FROM img, range(0, 8) rr(r), range(0, 8) xx(x)),
       |tl AS (SELECT doc_id, list(p ORDER BY pt) AS lv FROM px GROUP BY doc_id)
       |SELECT c.doc_a AS doc_a, c.doc_b AS doc_b,
       |  CAST(bit_count(xor(c.ha, c.hb)) AS BIGINT) AS hamming,
       |  CAST(list_sum(list_transform(range(1, 65),
       |    i -> abs(la.lv[CAST(i AS INT)] - lb.lv[CAST(i AS INT)])))
       |    AS BIGINT) AS pix_l1
       |FROM cand c
       |JOIN tl la ON la.doc_id = c.doc_a
       |JOIN tl lb ON lb.doc_id = c.doc_b
       |ORDER BY c.doc_a, c.doc_b""".stripMargin

  /** DuckDB rendering of c102 (r16): the c88 hash SQL → the SAME
    * banded-candidate set c89 verifies (hamming ≤ 3 pushed into cand) →
    * transitive closure (c19's reach CTE pattern) → labels as component
    * minima → every image doc with its cluster, size, and the min-id
    * canonical flag. Clustering drift on either side hash-fails. */
  private def c102OracleSql(c88Sql: String): String =
    s"""WITH RECURSIVE hs AS (SELECT doc_id, phash FROM (${c88Sql.replace("\n", "\n  ")})),
       |${mediaClusterCtes("img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0)")}""".stripMargin

  /** DuckDB rendering of c103 (r16): the FULL re-cluster of the merged
    * hash set — corpus image hashes ∪ the re-keyed recrawl's (hash
    * unchanged: the payload is byte-identical, only the id moved). The
    * Spark side runs the INCREMENTAL maintenance (frozen labels + new-
    * touching edges + confined CC), so this row engine-checks
    * add-then-maintain ≡ full-re-cluster — c95's equivalence at media
    * grain. */
  private def c103OracleSql(c88Sql: String): String =
    s"""WITH RECURSIVE hs0 AS (SELECT doc_id, phash FROM (${c88Sql.replace("\n", "\n  ")})),
       |hs AS (SELECT doc_id, phash FROM hs0
       |       UNION ALL
       |       SELECT doc_id + 1000000000000, phash FROM hs0
       |       WHERE doc_id % 5 = 0),
       |${mediaClusterCtes(
      """img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0
        |        UNION ALL
        |        SELECT doc_id + 1000000000000 FROM documents
        |        WHERE doc_id % 3 = 0 AND doc_id % 5 = 0)""".stripMargin)}""".stripMargin

  /** DuckDB rendering of c113 (r18): c103's full-re-cluster shape for
    * the 1-D modality — the merged AUDIO hash set (c90's hashes ∪ the
    * every-5th re-keyed recrawl's, hash unchanged) clustered from
    * scratch through the shared banded-candidate + closure CTE chain,
    * over the merged audio universe (doc_id % 3 = 1). The Spark side
    * runs INCREMENTAL maintenance against the frozen c104 labels, so
    * this row engine-checks add-then-maintain ≡ full-re-cluster at
    * audio grain. */
  private def c113OracleSql(c90Sql: String): String =
    s"""WITH RECURSIVE hs0 AS (SELECT doc_id, phash FROM (${c90Sql.replace("\n", "\n  ")})),
       |hs AS (SELECT doc_id, phash FROM hs0
       |       UNION ALL
       |       SELECT doc_id + 1000000000000, phash FROM hs0
       |       WHERE doc_id % 5 = 0),
       |${mediaClusterCtes(
      """img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1
        |        UNION ALL
        |        SELECT doc_id + 1000000000000 FROM documents
        |        WHERE doc_id % 3 = 1 AND doc_id % 5 = 0)""".stripMargin)}""".stripMargin

  /** The shared media-cluster CTE chain over a prepended `hs` (doc_id,
    * phash) relation and a caller-supplied image-universe CTE: banded
    * candidates at hamming ≤ 3 → transitive closure (c19's reach
    * pattern) → labels as component minima → the c102 decision-surface
    * shape. */
  /** r20: the closure runs at DISTINCT-HASH grain — the gate corpora's
    * correlated payloads collapse thousands of docs onto a handful of
    * hash values (sf0.1 audio: 1667 docs, 33 distinct hashes), so the
    * doc-grain candidate join was a quasi-clique (1.39M edges) and the
    * closure ground through it. Identical hashes are hamming-0 — one
    * component by definition — so clustering the distinct VALUES
    * (keyed by each value's min doc_id as representative) and fanning
    * labels back out through the (doc → hash → rep) join yields the
    * identical surface: component min over reps = min doc_id of the
    * component. Verified output-identical against the doc-grain form
    * on the sf0.1 corpus (267 s → 1.4 s on c104). */
  private def mediaClusterCtes(imgCte: String): String =
    s"""hd AS (SELECT phash, min(doc_id) AS rep FROM hs GROUP BY phash),
       |sg AS (SELECT rep, phash, j,
       |         (phash >> CAST(j*14 AS INT)) & 16383 AS seg
       |       FROM hd, range(0, 4) jj(j)),
       |cand AS (SELECT DISTINCT a.rep AS doc_a, b.rep AS doc_b
       |         FROM sg a JOIN sg b ON a.j = b.j AND a.seg = b.seg
       |                            AND a.rep < b.rep
       |         WHERE bit_count(xor(a.phash, b.phash)) <= 3),
       |ed AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM cand
       |       UNION ALL SELECT doc_b, doc_a FROM cand),
       |lp AS (SELECT u AS node, v AS lbl FROM ed WHERE v < u
       |       UNION
       |       SELECT e.u, l.lbl FROM lp l JOIN ed e ON l.node = e.v
       |       WHERE l.lbl < e.u),
       |lbl AS (SELECT node AS doc_id, min(lbl) AS mn FROM lp GROUP BY node),
       |$imgCte,
       |dr AS (SELECT h.doc_id, d.rep FROM hs h JOIN hd d USING (phash)),
       |cl AS (SELECT i.doc_id,
       |         CAST(least(COALESCE(l.mn, r.rep), r.rep) AS BIGINT)
       |           AS cluster_id
       |       FROM img i JOIN dr r ON r.doc_id = i.doc_id
       |       LEFT JOIN lbl l ON l.doc_id = r.rep),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |       FROM cl GROUP BY cluster_id)
       |SELECT cl.doc_id, cl.cluster_id, sz.cluster_size,
       |  cl.doc_id = cl.cluster_id AS is_canonical
       |FROM cl JOIN sz USING (cluster_id) ORDER BY cl.doc_id""".stripMargin

  /** The closure half of the cluster-surface CTE chain over a prepended
    * `cand` (doc_a, doc_b) edge relation and a caller-supplied node
    * universe CTE named `img`: MIN-LABEL PROPAGATION (r20 — replaced
    * the all-pairs `reach` closure, whose O(k²) reachability rows ×
    * per-iteration joins went O(k⁴) on the dense same-hash media
    * cliques and dominated the sf0.1 gate at ~75 min; labels only ever
    * shrink, so lp holds O(edges·diameter) rows and a clique converges
    * in its base case) → labels as component minima → the c102
    * decision-surface shape. The component min m reaches every node
    * because m < any intermediate node on a path out of m; non-min
    * nodes' min(lbl) = m, the min node is absent and coalesces to
    * itself downstream — the exact surface the old closure produced.
    * Shared by [[mediaClusterCtes]] (banded hash edges) and the c106
    * renderer (thresholded video-containment edges) — r17. */
  private def componentSurfaceCtes(imgCte: String): String =
    s"""ed AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM cand
       |       UNION ALL SELECT doc_b, doc_a FROM cand),
       |lp AS (SELECT u AS node, v AS lbl FROM ed WHERE v < u
       |       UNION
       |       SELECT e.u, l.lbl FROM lp l JOIN ed e ON l.node = e.v
       |       WHERE l.lbl < e.u),
       |lbl AS (SELECT node AS doc_id, min(lbl) AS mn FROM lp GROUP BY node),
       |$imgCte,
       |cl AS (SELECT i.doc_id,
       |         CAST(least(COALESCE(l.mn, i.doc_id), i.doc_id) AS BIGINT)
       |           AS cluster_id
       |       FROM img i LEFT JOIN lbl l ON l.doc_id = i.doc_id),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |       FROM cl GROUP BY cluster_id)
       |SELECT cl.doc_id, cl.cluster_id, sz.cluster_size,
       |  cl.doc_id = cl.cluster_id AS is_canonical
       |FROM cl JOIN sz USING (cluster_id) ORDER BY cl.doc_id""".stripMargin

  /** The shared c105 fold CTE chain over a prepended `vp` (doc_a,
    * frame_a, doc_b, frame_b) relation: cross-video pairs only →
    * conservative matched-frame count min(|distinct frame_a|,
    * |distinct frame_b|) → closed-form per-video frame counts
    * (3 + doc_id % 6 — the generator formula the Spark side's real
    * demux must reproduce). Shared by the c105 and c106 renderers. */
  private def videoFoldCtes: String = videoFoldCtes(
    """vidn AS (SELECT doc_id, 3 + doc_id % 6 AS n
      |         FROM documents WHERE doc_id % 3 = 2)""".stripMargin)

  /** The fold with a caller-supplied `vidn` (doc_id, n) frame-count CTE
    * — c109 passes the MERGED universe (corpus ∪ re-keyed recrawls,
    * whose counts derive from the SOURCE id: the payload is
    * byte-identical, only the key moved). */
  private def videoFoldCtes(vidnCte: String): String =
    s"""fold AS (SELECT doc_a, doc_b,
       |           least(count(DISTINCT frame_a), count(DISTINCT frame_b)) AS m
       |         FROM vp WHERE doc_a <> doc_b GROUP BY doc_a, doc_b),
       |$vidnCte""".stripMargin

  /** DuckDB rendering of c105 (r17): c94's banded+verified frame-pair
    * SQL as a subquery → the video-level fold → frame-containment
    * score m / min(n_a, n_b) with the 0.5 duplicate verdict. Both
    * engines compute the score as one IEEE division of exact integers,
    * so the doubles are bit-identical. */
  private def c105OracleSql(c94Sql: String): String =
    s"""WITH vp AS (SELECT doc_a, frame_a, doc_b, frame_b
       |            FROM (${c94Sql.replace("\n", "\n  ")})),
       |$videoFoldCtes
       |SELECT f.doc_a, f.doc_b, CAST(f.m AS BIGINT) AS matched,
       |  CAST(va.n AS BIGINT) AS n_a, CAST(vb.n AS BIGINT) AS n_b,
       |  f.m / least(va.n, vb.n) AS score,
       |  f.m / least(va.n, vb.n) >= 0.5 AS is_dup
       |FROM fold f JOIN vidn va ON va.doc_id = f.doc_a
       |            JOIN vidn vb ON vb.doc_id = f.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB rendering of c106 (r17): the c105 fold's thresholded edges
    * feed the SAME transitive-closure → decision-surface chain c102
    * uses, over the video universe — the whole three-stage pipeline
    * (banding+verify → fold → clustering) is re-derived end-to-end. */
  private def c106OracleSql(c94Sql: String): String =
    s"""WITH RECURSIVE vp AS (SELECT doc_a, frame_a, doc_b, frame_b
       |            FROM (${c94Sql.replace("\n", "\n  ")})),
       |$videoFoldCtes,
       |cand AS (SELECT f.doc_a, f.doc_b
       |         FROM fold f JOIN vidn va ON va.doc_id = f.doc_a
       |                     JOIN vidn vb ON vb.doc_id = f.doc_b
       |         WHERE f.m / least(va.n, vb.n) >= 0.5),
       |${componentSurfaceCtes(
      "img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2)")}""".stripMargin

  /** DuckDB rendering of c93 (r16): c89's composition for the audio
    * modality — the c90 hash SQL feeds the 14-bit band self-join,
    * hamming is bit_count(xor), and env_l1 re-derives from the
    * closed-form 57-point resampled envelope (sample i of the WAV is
    * ((doc_id·131 + i·17) mod 65536) − 32768, resampled at (j·n)//57 —
    * the SAME points the hash's delta signs were built from). */
  private def c93OracleSql(c90Sql: String): String =
    s"""WITH hs AS (SELECT doc_id, phash FROM (${c90Sql.replace("\n", "\n  ")})),
       |sg AS (SELECT doc_id, phash, j,
       |         (phash >> CAST(j*14 AS INT)) & 16383 AS seg
       |       FROM hs, range(0, 4) jj(j)),
       |-- hamming pushed INTO cand (r16): see c89OracleSql
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                a.phash AS ha, b.phash AS hb
       |         FROM sg a JOIN sg b ON a.j = b.j AND a.seg = b.seg
       |                            AND a.doc_id < b.doc_id
       |         WHERE bit_count(xor(a.phash, b.phash)) <= 3),
       |aud AS (SELECT doc_id, 64 + doc_id % 129 AS n
       |        FROM documents WHERE doc_id % 3 = 1),
       |ev AS (SELECT doc_id, j,
       |         ((doc_id*131 + ((j*n)//57)*17) % 65536) - 32768 AS p
       |       FROM aud, range(0, 57) jj(j)),
       |tl AS (SELECT doc_id, list(p ORDER BY j) AS lv FROM ev GROUP BY doc_id)
       |SELECT c.doc_a AS doc_a, c.doc_b AS doc_b,
       |  CAST(bit_count(xor(c.ha, c.hb)) AS BIGINT) AS hamming,
       |  CAST(list_sum(list_transform(range(1, 58),
       |    i -> abs(la.lv[CAST(i AS INT)] - lb.lv[CAST(i AS INT)])))
       |    AS BIGINT) AS env_l1
       |FROM cand c
       |JOIN tl la ON la.doc_id = c.doc_a
       |JOIN tl lb ON lb.doc_id = c.doc_b
       |ORDER BY c.doc_a, c.doc_b""".stripMargin

  /** DuckDB rendering of c94 (r16): c89's composition at FRAME grain —
    * the c91 per-frame hash SQL packs into composite fid = doc·8 +
    * frame keys for the band self-join, and luma_l1 re-derives from
    * the closed-form 8×8 frame thumbnails (luma byte i of frame f is
    * (doc_id·7 + f·101 + i·13) mod 256, thumbnailed by the shared
    * floor sampler). */
  private def c94OracleSql(c91Sql: String): String =
    s"""WITH hs AS (SELECT doc_id, frame_idx, phash
       |            FROM (${c91Sql.replace("\n", "\n  ")})),
       |fid AS (SELECT doc_id*8 + frame_idx AS fid, phash FROM hs),
       |sg AS (SELECT fid, phash, j,
       |         (phash >> CAST(j*14 AS INT)) & 16383 AS seg
       |       FROM fid, range(0, 4) jj(j)),
       |-- hamming pushed INTO cand (r16): the band-collision set here is
       |-- 12.8M pairs at sf0.1 but only 1.6M survive the radius — the
       |-- exact verify must never run on the other 11M (516 s → 4 s)
       |cand AS (SELECT DISTINCT a.fid AS fa, b.fid AS fb,
       |                a.phash AS ha, b.phash AS hb
       |         FROM sg a JOIN sg b ON a.j = b.j AND a.seg = b.seg
       |                            AND a.fid < b.fid
       |         WHERE bit_count(xor(a.phash, b.phash)) <= 3),
       |vid AS (SELECT doc_id, 8 + 2*(doc_id % 5) AS w,
       |               8 + 2*(doc_id % 4) AS h, 3 + doc_id % 6 AS frames
       |        FROM documents WHERE doc_id % 3 = 2),
       |fr AS (SELECT doc_id, w, h, f
       |       FROM vid, range(0, 8) ff(f) WHERE f < frames),
       |th AS (SELECT doc_id*8 + f AS fid, r*8 + x AS pt,
       |         (doc_id*7 + f*101 + ((r*h//8)*w + (x*w//8))*13) % 256 AS p
       |       FROM fr, range(0, 8) rr(r), range(0, 8) xx(x)),
       |tl AS (SELECT fid, list(p ORDER BY pt) AS lv FROM th GROUP BY fid)
       |SELECT CAST(c.fa // 8 AS BIGINT) AS doc_a,
       |  CAST(c.fa % 8 AS BIGINT) AS frame_a,
       |  CAST(c.fb // 8 AS BIGINT) AS doc_b,
       |  CAST(c.fb % 8 AS BIGINT) AS frame_b,
       |  CAST(bit_count(xor(c.ha, c.hb)) AS BIGINT) AS hamming,
       |  CAST(list_sum(list_transform(range(1, 65),
       |    i -> abs(la.lv[CAST(i AS INT)] - lb.lv[CAST(i AS INT)])))
       |    AS BIGINT) AS luma_l1
       |FROM cand c
       |JOIN tl la ON la.fid = c.fa
       |JOIN tl lb ON lb.fid = c.fb
       |ORDER BY doc_a, frame_a, doc_b, frame_b""".stripMargin

  /** DuckDB rendering of c110 (r17): the recipe re-derived in HUGEINT —
    * c35's keep SQL composed as the quality subtree, per-source
    * aggregates, then the SAME capped-allocation and half-away-6dp
    * integer formulas the Spark side computes in BigInt. */
  private def c110OracleSql(c35Sql: String): String =
    s"""WITH q AS (SELECT doc_id, keep FROM (${c35Sql.replace("\n", "\n  ")})),
       |d AS (SELECT doc_id, source,
       |        CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
       |      FROM documents),
       |per AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |          CAST(sum(d.nt) AS BIGINT) AS tokens,
       |          CAST(sum(CASE WHEN q.keep THEN 1 ELSE 0 END) AS BIGINT)
       |            AS keep_docs
       |        FROM d JOIN q USING (doc_id) GROUP BY d.source),
       |tot AS (SELECT CAST(sum(tokens) AS HUGEINT) AS t,
       |               CAST(sum(keep_docs) AS HUGEINT) AS k FROM per),
       |pl AS (SELECT source, n_docs, tokens, keep_docs,
       |         CAST(least(4 * CAST(tokens AS HUGEINT),
       |           (2 * t * keep_docs) // k) AS BIGINT) AS planned_tokens
       |       FROM per, tot),
       |pt AS (SELECT CAST(sum(planned_tokens) AS HUGEINT) AS p FROM pl)
       |SELECT source, n_docs, tokens, keep_docs,
       |  CAST((2 * CAST(keep_docs AS HUGEINT) * 1000000 + k) // (2 * k)
       |    AS DOUBLE) / 1e6 AS weight_r,
       |  planned_tokens,
       |  CAST((2 * CAST(planned_tokens AS HUGEINT) * 1000000 + tokens)
       |    // (2 * CAST(tokens AS HUGEINT)) AS DOUBLE) / 1e6 AS epochs_r,
       |  CAST((2 * CAST(planned_tokens AS HUGEINT) * 1000000 + p) // (2 * p)
       |    AS DOUBLE) / 1e6 AS budget_share_r
       |FROM pl, tot, pt
       |ORDER BY source""".stripMargin

  /** DuckDB rendering of c111 (r17): c110's plan SQL composed as a
    * subquery (c50's rule — the execution must sample exactly the plan
    * the gate verifies), per-source full-epoch counts + HUGEINT 16-bit
    * fractional cutoffs, then the c25 deterministic md5-prefix
    * membership per doc. */
  private def c111OracleSql(c110Sql: String): String =
    s"""WITH rp AS (SELECT source, tokens, planned_tokens
       |            FROM (${c110Sql.replace("\n", "\n  ")})),
       |cut AS (SELECT source,
       |          CAST(planned_tokens // tokens AS BIGINT) AS fe,
       |          lpad(lower(hex(
       |            ((CAST(planned_tokens AS HUGEINT) % tokens) * 65536)
       |              // tokens)), 4, '0') AS ch
       |        FROM rp)
       |SELECT d.doc_id, d.source,
       |  CAST(c.fe + CASE WHEN substr(md5(d.text), 1, 4) < c.ch
       |    THEN 1 ELSE 0 END AS BIGINT) AS n_copies
       |FROM documents d JOIN cut c USING (source)
       |ORDER BY d.doc_id""".stripMargin

  /** DuckDB rendering of c116 (r18): the composed c110 plan joined to
    * the realized token mass of the composed c111 multiset —
    * Σ n_copies · len(split(text)) per source, drift as a signed
    * BIGINT (all-integer output; no rounding seam). */
  private def c116OracleSql(c110Sql: String, c111Sql: String): String =
    s"""WITH plan AS (SELECT source, planned_tokens
       |             FROM (${c110Sql.replace("\n", "\n  ")})),
       |cp AS (SELECT doc_id, source, n_copies
       |       FROM (${c111Sql.replace("\n", "\n  ")})),
       |rl AS (SELECT cp.source,
       |         CAST(sum(cp.n_copies *
       |           len(string_split(d.text, ' '))) AS BIGINT)
       |           AS realized_tokens
       |       FROM cp JOIN documents d USING (doc_id)
       |       GROUP BY cp.source)
       |SELECT p.source, p.planned_tokens, rl.realized_tokens,
       |  rl.realized_tokens - p.planned_tokens AS drift_tokens
       |FROM plan p JOIN rl USING (source)
       |ORDER BY p.source""".stripMargin

  /** DuckDB rendering of c112 (r17): c40's hash/shard derivation, the
    * hex→int halves re-derived DIGIT-WISE with shift arithmetic in
    * HUGEINT (the repo's oracles never parse hex numerically any other
    * way — strpos over the hex alphabet, shifted by nibble position),
    * exact sums, mod 2⁶¹−1. */
  private def c112OracleSql: String =
    """WITH h AS (SELECT doc_id,
      |        md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h,
      |        CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      |      FROM documents),
      |s AS (SELECT substr(h, 1, 1) AS shard, nt,
      |        list_sum(list_transform(range(1, 16), i ->
      |          CAST(strpos('0123456789abcdef',
      |            substr(h, CAST(i AS INT), 1)) - 1 AS HUGEINT)
      |            << CAST(4 * (15 - i) AS INT))) AS h1,
      |        list_sum(list_transform(range(1, 16), i ->
      |          CAST(strpos('0123456789abcdef',
      |            substr(h, CAST(i + 16 AS INT), 1)) - 1 AS HUGEINT)
      |            << CAST(4 * (15 - i) AS INT))) AS h2
      |      FROM h)
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(nt) AS BIGINT) AS n_tokens,
      |  CAST(sum(h1) % 2305843009213693951 AS BIGINT) AS digest1,
      |  CAST(sum(h2) % 2305843009213693951 AS BIGINT) AS digest2
      |FROM s GROUP BY shard ORDER BY shard""".stripMargin

  /** DuckDB rendering of c109 (r17): the FULL re-cluster of the merged
    * frame-hash set — corpus frame hashes ∪ the re-keyed recrawls'
    * (hashes unchanged: payloads are byte-identical, only the video id
    * moved, fid = (doc + 10¹²)·8 + frame) — through the WHOLE two-stage
    * pipeline: frame banding → c105's fold (recrawl frame counts
    * derive from the SOURCE id) → threshold → closure. The Spark side
    * runs the INCREMENTAL maintenance, so this row engine-checks
    * add-then-maintain ≡ full-re-cluster at the composed surface. */
  private def c109OracleSql(c91Sql: String): String =
    s"""WITH RECURSIVE hv0 AS (SELECT doc_id, frame_idx, phash
       |            FROM (${c91Sql.replace("\n", "\n  ")})),
       |hv AS (SELECT doc_id*8 + frame_idx AS fid, phash FROM hv0
       |       UNION ALL
       |       SELECT (doc_id + 1000000000000)*8 + frame_idx, phash
       |       FROM hv0 WHERE doc_id % 5 = 0),
       |sg AS (SELECT fid, phash, j,
       |         (phash >> CAST(j*14 AS INT)) & 16383 AS seg
       |       FROM hv, range(0, 4) jj(j)),
       |fcand AS (SELECT DISTINCT a.fid AS fa, b.fid AS fb
       |          FROM sg a JOIN sg b ON a.j = b.j AND a.seg = b.seg
       |                             AND a.fid < b.fid
       |          WHERE bit_count(xor(a.phash, b.phash)) <= 3),
       |vp AS (SELECT fa // 8 AS doc_a, fa % 8 AS frame_a,
       |              fb // 8 AS doc_b, fb % 8 AS frame_b
       |       FROM fcand),
       |${videoFoldCtes(
      """vidn AS (SELECT doc_id, 3 + doc_id % 6 AS n
        |         FROM documents WHERE doc_id % 3 = 2
        |         UNION ALL
        |         SELECT doc_id + 1000000000000, 3 + doc_id % 6
        |         FROM documents WHERE doc_id % 3 = 2 AND doc_id % 5 = 0)"""
        .stripMargin)},
       |cand AS (SELECT f.doc_a, f.doc_b
       |         FROM fold f JOIN vidn va ON va.doc_id = f.doc_a
       |                     JOIN vidn vb ON vb.doc_id = f.doc_b
       |         WHERE f.m / least(va.n, vb.n) >= 0.5),
       |${componentSurfaceCtes(
      """img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2
        |        UNION ALL
        |        SELECT doc_id + 1000000000000 FROM documents
        |        WHERE doc_id % 3 = 2 AND doc_id % 5 = 0)""".stripMargin)}"""
      .stripMargin

  /** DuckDB rendering of c107 (r17): BOTH closures re-derived from
    * scratch — c19's shingle-band text clustering (clusterCteBody) and
    * c102's hash-band media clustering (media CTEs renamed m* to
    * coexist) — then the per-doc joint verdict over the image slice.
    * The Spark side reads the two MEMOIZED label tables, so this row
    * engine-checks the composed decision end-to-end. */
  private def c107OracleSql(c88Sql: String): String =
    s"""WITH RECURSIVE hs AS (SELECT doc_id, phash FROM (${c88Sql.replace("\n", "\n  ")})),
       |${clusterCteBody("documents")},
       |mhd AS (SELECT phash, min(doc_id) AS rep FROM hs GROUP BY phash),
       |sg AS (SELECT rep, phash, j,
       |         (phash >> CAST(j*14 AS INT)) & 16383 AS seg
       |       FROM mhd, range(0, 4) jj(j)),
       |mcand AS (SELECT DISTINCT a.rep AS doc_a, b.rep AS doc_b
       |          FROM sg a JOIN sg b ON a.j = b.j AND a.seg = b.seg
       |                             AND a.rep < b.rep
       |          WHERE bit_count(xor(a.phash, b.phash)) <= 3),
       |med AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM mcand
       |        UNION ALL SELECT doc_b, doc_a FROM mcand),
       |mlp AS (SELECT u AS node, v AS lbl FROM med WHERE v < u
       |        UNION
       |        SELECT e.u, l.lbl FROM mlp l JOIN med e ON l.node = e.v
       |        WHERE l.lbl < e.u),
       |mlbl AS (SELECT node AS doc_id, min(lbl) AS mn FROM mlp GROUP BY node),
       |mdr AS (SELECT h.doc_id, d.rep FROM hs h JOIN mhd d USING (phash)),
       |img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0)
       |SELECT i.doc_id,
       |  CAST(least(COALESCE(tl.mn, i.doc_id), i.doc_id) AS BIGINT) AS text_cluster_id,
       |  CAST(least(COALESCE(ml.mn, r.rep), r.rep) AS BIGINT) AS media_cluster_id,
       |  least(COALESCE(tl.mn, i.doc_id), i.doc_id) <> i.doc_id AS dup_by_text,
       |  least(COALESCE(ml.mn, r.rep), r.rep) <> i.doc_id AS dup_by_media,
       |  (least(COALESCE(tl.mn, i.doc_id), i.doc_id) <> i.doc_id
       |   OR least(COALESCE(ml.mn, r.rep), r.rep) <> i.doc_id) AS dup_any
       |FROM img i JOIN mdr r ON r.doc_id = i.doc_id
       |           LEFT JOIN lbl tl ON tl.doc_id = i.doc_id
       |           LEFT JOIN mlbl ml ON ml.doc_id = r.rep
       |ORDER BY i.doc_id""".stripMargin

  /** DuckDB rendering of c108 (r17): the EXACT all-pairs truth count
    * per modality (hashes only, a.doc_id < b.doc_id, bit_count ≤ 3) —
    * and the THEOREM's answer for the banded side: the 4×14-bit
    * pigeonhole is complete at radius 3, so n_banded = n_hit = n_exact
    * and recall is exactly 1.0. The oracle asserts that answer from
    * the brute alone; the Spark side must REACH it through the real
    * banded pipeline, so any banding defect hash-fails the row. */
  private def c108OracleSql(c88Sql: String, c90Sql: String,
                            c91Sql: String): String =
    s"""WITH hi AS (SELECT doc_id, phash FROM (${c88Sql.replace("\n", "\n  ")})),
       |hau AS (SELECT doc_id, phash FROM (${c90Sql.replace("\n", "\n  ")})),
       |hv AS (SELECT doc_id*8 + frame_idx AS doc_id, phash
       |       FROM (${c91Sql.replace("\n", "\n  ")})),
       |xi AS (SELECT count(*) AS n FROM hi a JOIN hi b
       |       ON a.doc_id < b.doc_id
       |       AND bit_count(xor(a.phash, b.phash)) <= 3),
       |xa AS (SELECT count(*) AS n FROM hau a JOIN hau b
       |       ON a.doc_id < b.doc_id
       |       AND bit_count(xor(a.phash, b.phash)) <= 3),
       |xv AS (SELECT count(*) AS n FROM hv a JOIN hv b
       |       ON a.doc_id < b.doc_id
       |       AND bit_count(xor(a.phash, b.phash)) <= 3)
       |SELECT 'audio' AS modality, CAST(n AS BIGINT) AS n_exact,
       |  CAST(n AS BIGINT) AS n_banded, CAST(n AS BIGINT) AS n_hit,
       |  round(CAST(n AS DOUBLE) / n, 6) AS recall_r FROM xa
       |UNION ALL SELECT 'image', n, n, n, round(CAST(n AS DOUBLE) / n, 6) FROM xi
       |UNION ALL SELECT 'video', n, n, n, round(CAST(n AS DOUBLE) / n, 6) FROM xv
       |ORDER BY modality""".stripMargin

  /** DuckDB rendering of c120 (r20): per modality, the doc/sample
    * counts and the exact count of SAMPLED-TOUCHING hamming ≤ 3 pairs
    * (either endpoint in the md5('c120:'||id)-prefix < 0x20 sample) —
    * the banded/hit columns assert the pigeonhole theorem's answer on
    * the sampled surface, recall 1.0, and the rule-of-three bound is
    * the exact-rational max(0, t−3)/t. */
  private def c120OracleSql(c88Sql: String, c90Sql: String,
                            c91Sql: String): String = {
    def one(name: String, hcte: String): String =
      s"""SELECT '$name' AS modality,
         |  (SELECT count(*) FROM $hcte) AS n_docs,
         |  (SELECT count(*) FROM $hcte
         |   WHERE substr(md5('c120:' || CAST(doc_id AS VARCHAR)), 1, 2) < '20')
         |    AS n_sampled,
         |  t AS n_truth, t AS n_banded, t AS n_hit,
         |  CAST(1.0 AS DOUBLE) AS recall_r,
         |  CASE WHEN t = 0 THEN CAST(0.0 AS DOUBLE)
         |       ELSE CAST((2000000*greatest(t - 3, 0) + t) // (2*t)
         |            AS DOUBLE) / 1e6 END AS ci_low_r
         |FROM (SELECT count(*) AS t FROM (
         |  SELECT DISTINCT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id)
         |  FROM (SELECT * FROM $hcte
         |        WHERE substr(md5('c120:' || CAST(doc_id AS VARCHAR)), 1, 2) < '20') a
         |  JOIN $hcte b ON a.doc_id <> b.doc_id
         |   AND bit_count(xor(a.phash, b.phash)) <= 3))""".stripMargin
    s"""WITH hi AS (SELECT doc_id, phash FROM (${c88Sql.replace("\n", "\n  ")})),
       |hau AS (SELECT doc_id, phash FROM (${c90Sql.replace("\n", "\n  ")})),
       |hv AS (SELECT doc_id*8 + frame_idx AS doc_id, phash
       |       FROM (${c91Sql.replace("\n", "\n  ")}))
       |${one("audio", "hau")}
       |UNION ALL ${one("image", "hi")}
       |UNION ALL ${one("video", "hv")}
       |ORDER BY modality""".stripMargin
  }

  /** DuckDB rendering of c114 (r18): per modality, the exact count of
    * NEW-TOUCHING hamming ≤ 3 pairs in the merged hash set (corpus ∪
    * each maintenance row's every-5th re-keyed crawl, hash unchanged)
    * — and the banded/hit columns assert the pigeonhole theorem's
    * answer (n_banded = n_hit = n_exact, recall 1.0), which the Spark
    * side must reach through the REAL split candidate path. */
  private def c114OracleSql(c88Sql: String, c90Sql: String,
                            c91Sql: String): String =
    s"""WITH hi0 AS (SELECT doc_id, phash FROM (${c88Sql.replace("\n", "\n  ")})),
       |hau0 AS (SELECT doc_id, phash FROM (${c90Sql.replace("\n", "\n  ")})),
       |hv0 AS (SELECT doc_id*8 + frame_idx AS doc_id, phash
       |        FROM (${c91Sql.replace("\n", "\n  ")})),
       |hi AS (SELECT doc_id, phash, 0 AS nw FROM hi0
       |       UNION ALL SELECT doc_id + 1000000000000, phash, 1 FROM hi0
       |       WHERE doc_id % 5 = 0),
       |hau AS (SELECT doc_id, phash, 0 AS nw FROM hau0
       |        UNION ALL SELECT doc_id + 1000000000000, phash, 1 FROM hau0
       |        WHERE doc_id % 5 = 0),
       |hv AS (SELECT doc_id, phash, 0 AS nw FROM hv0
       |       UNION ALL SELECT doc_id + 8000000000000, phash, 1 FROM hv0
       |       WHERE (doc_id // 8) % 5 = 0),
       |xi AS (SELECT count(*) AS n FROM hi a JOIN hi b
       |       ON a.doc_id < b.doc_id AND a.nw + b.nw >= 1
       |       AND bit_count(xor(a.phash, b.phash)) <= 3),
       |xa AS (SELECT count(*) AS n FROM hau a JOIN hau b
       |       ON a.doc_id < b.doc_id AND a.nw + b.nw >= 1
       |       AND bit_count(xor(a.phash, b.phash)) <= 3),
       |xv AS (SELECT count(*) AS n FROM hv a JOIN hv b
       |       ON a.doc_id < b.doc_id AND a.nw + b.nw >= 1
       |       AND bit_count(xor(a.phash, b.phash)) <= 3)
       |SELECT 'audio' AS modality, CAST(n AS BIGINT) AS n_exact,
       |  CAST(n AS BIGINT) AS n_banded, CAST(n AS BIGINT) AS n_hit,
       |  round(CAST(n AS DOUBLE) / n, 6) AS recall_r FROM xa
       |UNION ALL SELECT 'image', n, n, n, round(CAST(n AS DOUBLE) / n, 6) FROM xi
       |UNION ALL SELECT 'video', n, n, n, round(CAST(n AS DOUBLE) / n, 6) FROM xv
       |ORDER BY modality""".stripMargin

  /** DuckDB rendering of c115 (r18): per video, the frame-order
    * signature — string_agg of frame_idx:phash ordered by frame_idx,
    * '|'-joined, md5'd (the exact string videoSigExpr's
    * concat_ws/array_join renders: BIGINTs print decimally in both
    * engines) — joined to the composed c106 closure's cluster, folded
    * per signature with min() (same-signature videos are frame-for-
    * frame hamming-0 dups in ONE cluster; min is the determinism
    * guard on both sides). */
  private def c115OracleSql(c91Sql: String, c106Sql: String): String =
    s"""WITH hv AS (SELECT doc_id, frame_idx, phash
       |      FROM (${c91Sql.replace("\n", "\n  ")})),
       |sigs AS (SELECT doc_id,
       |           md5(string_agg(frame_idx || ':' || phash, '|'
       |             ORDER BY frame_idx)) AS sig
       |         FROM hv GROUP BY doc_id),
       |cl AS (SELECT doc_id, cluster_id
       |       FROM (${c106Sql.replace("\n", "\n  ")}))
       |SELECT s.sig AS sig, CAST(min(c.cluster_id) AS BIGINT) AS cluster_id
       |FROM sigs s JOIN cl c ON c.doc_id = s.doc_id
       |GROUP BY s.sig ORDER BY sig""".stripMargin

  /** The derived-URL CTE chain shared by the curation oracles (r16,
    * c96/c97): the SAME (source, lang, doc_id) → messy-URL derivation
    * Curation.urlCol builds, then the SAME host-capture + www-strip
    * regex extraction — engine-checked end-to-end. */
  private def urlCtes: String =
    """u AS (SELECT doc_id, text,
      |        'https://www.' || source || '.example.com/' || lang ||
      |        '/article-' || CAST(doc_id AS VARCHAR) ||
      |        '?ref=' || CAST(doc_id % 7 AS VARCHAR) AS url
      |      FROM documents),
      |dom AS (SELECT doc_id, text,
      |          lower(regexp_replace(
      |            regexp_extract(url, '(?i)^https?://([^/?#]+)', 1),
      |            '(?i)^www\.', '')) AS domain
      |        FROM u)""".stripMargin

  /** DuckDB rendering of c96: the derived-URL extraction + c41's score
    * subquery + the single per-domain rank window (equal to the Spark
    * side's salted two-phase top-k because the sort key is total). */
  private def c96OracleSql(c41Sql: String): String =
    s"""WITH $urlCtes,
       |sc AS (SELECT doc_id, mean_prob_r FROM (${c41Sql.replace("\n", "\n  ")})),
       |r AS (SELECT dom.domain, dom.doc_id, sc.mean_prob_r,
       |        CAST(row_number() OVER (PARTITION BY dom.domain
       |          ORDER BY sc.mean_prob_r DESC, dom.doc_id ASC) AS BIGINT) AS rnk
       |      FROM dom JOIN sc ON sc.doc_id = dom.doc_id)
       |SELECT domain, rnk, doc_id, mean_prob_r
       |FROM r WHERE rnk <= 10 ORDER BY domain, rnk""".stripMargin

  /** DuckDB rendering of c97: the derived-URL extraction + per-domain
    * doc/token mass, exact-integer half-away 6-dp share, and the
    * inlined blocklist literal (the c52 drift-pinning rule applied to
    * policy). */
  private def c97OracleSql: String = {
    val block = graft.operators.Curation.DefaultBlocklist
      .map(d => s"'$d'").mkString(", ")
    s"""WITH $urlCtes,
       |g AS (SELECT domain, count(*) AS n_docs,
       |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |      FROM dom GROUP BY domain),
       |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM g)
       |SELECT domain, n_docs, n_tokens,
       |  CAST((2*n_docs*1000000 + total_docs) // (2*total_docs) AS DOUBLE)
       |    / 1000000 AS share_r,
       |  domain IN ($block) AS is_blocked
       |FROM g, t ORDER BY domain""".stripMargin
  }

  /** DuckDB rendering of c84: the three fertility oracles as
    * subqueries, each folded to its corpus-level row, plus the r15
    * OOV/coverage column — char-BPE re-derives the alphabet-miss count
    * against the SAME memoized alphabet the Spark row inlines (c52's
    * drift-pinning rule), unigram counts UnkScore-fallback pieces from
    * the shared Viterbi CTEs' wseg leg, byte-BPE emits the 0.0 the
    * staging alphabet guarantees by construction. */
  private def c84OracleSql(dir: String): String = {
    val alpha = graft.operators.TextOps.bpeAlphabet(renderSession, dir)
      .map(sqlLit).mkString("[", ", ", "]")
    def fold(sql: String, units: String, name: String): String =
      s"""SELECT '$name' AS tokenizer, count(*) AS n_docs,
         |  CAST(sum($units) AS BIGINT) AS n_units,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST((2000000*sum(n_tokens) + sum($units)) // (2*sum($units))
         |       AS DOUBLE) / 1e6 AS fertility_r
         |FROM (${sql.replace("\n", "\n  ")})""".stripMargin
    def withOov(foldSql: String, oovSql: String): String =
      s"""SELECT f.tokenizer, f.n_docs, f.n_units, f.n_tokens, f.fertility_r,
         |  CAST((2000000*o.n_oov + f.n_tokens) // (2*f.n_tokens)
         |       AS DOUBLE) / 1e6 AS oov_share_r
         |FROM ($foldSql) f CROSS JOIN ($oovSql) o""".stripMargin
    val charOov =
      s"""SELECT CAST(coalesce(sum(wcnt * len(list_filter(range(1, len(w) + 1),
         |    i -> NOT list_contains($alpha, substr(w, CAST(i AS INT), 1))))), 0)
         |  AS BIGINT) AS n_oov
         |FROM (SELECT w, count(*) AS wcnt
         |      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
         |      WHERE len(w) >= 1 GROUP BY w)""".stripMargin
    val unkOov =
      s"""WITH RECURSIVE ${unigramViterbiCtes(dir)}
         |SELECT CAST(coalesce(sum(wcnt * nunk), 0) AS BIGINT) AS n_oov FROM wseg""".stripMargin
    val wpOov =
      s"""WITH RECURSIVE ${wordpieceGreedyCtes(dir)}
         |SELECT CAST(coalesce(sum(wcnt * nunk), 0) AS BIGINT) AS n_oov FROM wpseg""".stripMargin
    s"""SELECT * FROM (
       |${withOov(fold(c66OracleSql(dir), "n_words", "bpe_char"), charOov)}
       |UNION ALL
       |SELECT *, CAST(0 AS DOUBLE) AS oov_share_r FROM (
       |${fold(c73OracleSql(dir), "n_pretokens", "bpe_byte")})
       |UNION ALL
       |${withOov(fold(c78OracleSql(dir), "n_words", "unigram"), unkOov)}
       |UNION ALL
       |${withOov(fold(c99OracleSql(dir), "n_words", "wordpiece"), wpOov)}
       |) ORDER BY tokenizer""".stripMargin
  }

  /** DuckDB rendering of c80: the trained (bucket → lr_fx) map inlined
    * as a MAP literal (c75's drift-pinning rule — the renderer and the
    * gate row share the memoized artifact), per-doc exact BIGINT sums
    * via map_extract with the same neutral-0 fallback the Spark fold
    * applies, the 6-dp average as the same exact-integer half-away-
    * from-zero division, and the integer sign test. */
  private def c80OracleSql(dir: String): String = {
    val art = graft.operators.Dsir.trainDsir(renderSession, dir)
    val m = art.map { case (b, s) => s"${sqlLit(b)}: CAST($s AS BIGINT)" }
      .mkString("MAP {", ", ", "}")
    val hc = graft.operators.Dsir.BucketHexChars
    s"""WITH t AS (SELECT doc_id, unnest(ws) AS w FROM
       |    (SELECT doc_id,
       |       list_filter(string_split(lower(text), ' '), w -> len(w) >= 1) AS ws
       |     FROM documents WHERE text IS NOT NULL)
       |  WHERE len(ws) >= 1),
       |s AS (SELECT doc_id, count(*) AS n,
       |        CAST(sum(coalesce(map_extract($m,
       |              substring(md5(w), 1, $hc))[1], 0)) AS BIGINT) AS slr
       |      FROM t GROUP BY doc_id)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, slr AS sum_lr,
       |  CAST(CASE WHEN slr >= 0 THEN (2*slr + n) // (2*n)
       |            ELSE -((2*(-slr) + n) // (2*n)) END AS DOUBLE)
       |    / 1000000 AS avg_lr_r,
       |  slr > 0 AS keep
       |FROM s ORDER BY doc_id""".stripMargin
  }

  private def c75OracleSql(dir: String): String =
    s"""WITH RECURSIVE ${unigramViterbiCtes(dir)}
       |SELECT token, CAST(sum(wcnt) AS BIGINT) AS cnt FROM
       |  (SELECT unnest(bests[len(w) + 1].pieces) AS token, wcnt
       |   FROM rec WHERE j = len(w))
       |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin

  /** DuckDB rendering of c78: the shared Viterbi CTEs give each word
    * TYPE its piece count (the final DP state's np field — the oracle
    * never re-walks pieces), then the corpus word stream joins that
    * type-level table and folds per doc; zero-word docs absent in both
    * engines (c66's row-set rule). */
  private def c78OracleSql(dir: String): String =
    s"""WITH RECURSIVE ${unigramViterbiCtes(dir)},
       |wnp AS (SELECT w, np FROM wseg),
       |dw AS (SELECT doc_id, w FROM
       |    (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |     FROM documents WHERE text IS NOT NULL)
       |  WHERE len(w) >= 1)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(np) AS BIGINT) AS n_tokens,
       |  CAST((2000000*sum(np) + count(*)) // (2*count(*)) AS DOUBLE) / 1e6
       |    AS fertility_r
       |FROM dw JOIN wnp USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB rendering of c66: the SAME inlined learned merges as c52,
    * applied per (doc, word) and folded per doc — trainer drift
    * hash-fails; the row set derives from the surviving word stream in
    * both engines (zero-word docs absent by construction). */
  private def c66OracleSql(dir: String): String =
    s"""WITH wf AS (SELECT doc_id, w FROM
       |      (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |       FROM documents WHERE text IS NOT NULL)
       |      WHERE len(w) >= 1),
       |t AS (SELECT doc_id,
       |        CAST(len(string_split(trim(${bpeAppliedExpr(dir)}), '  ')) AS BIGINT) AS nt
       |      FROM wf)
       |SELECT doc_id, count(*) AS n_words, CAST(sum(nt) AS BIGINT) AS n_tokens,
       |  CAST((2000000*sum(nt) + count(*)) // (2*count(*)) AS DOUBLE) / 1e6
       |    AS fertility_r
       |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB rendering of c28's projection planes: the SAME seeded matrix
    * the Spark expression uses (seed "graft:rp"), inlined as a VALUES
    * relation of integer-entry DOUBLE lists — every dot product against
    * the fixed-point embedding is integer-valued ≤ 2^53, hence exact in
    * both engines regardless of summation order. */
  private def rpPlanesValues: String = {
    val planes = graft.functions.VectorFunctions.lshPlanes(16, 64, seed = "graft:rp")
    planes.zipWithIndex.map { case (p, j) =>
      s"($j, ${p.mkString("[", ",", "]")}::DOUBLE[])"
    }.mkString(",\n       ")
  }

  /** DuckDB rendering of the c2→connected-components pipeline shared by
    * the c19 and c30 oracles: word-3-shingles → 8 md5 minhashes → 4×2
    * band buckets → candidate pairs → exact-Jaccard verify (≥0.5) →
    * transitive closure via a recursive CTE → per-node min label `lbl`.
    * Callers append their own final SELECT (and further CTEs after a
    * comma). */
  /** Shared WITH-chain for the PQ/ADC oracles (c38, c79): the c36
    * code-assignment CTEs + per-candidate reconstruction + the ADC
    * scoring/ranking of every candidate against every query, ending at
    * `r(query_id, neighbor_id, adc, rnk)` with `q(query_id, qv)` still
    * in scope. Callers append further CTEs after a comma or a final
    * SELECT. */
  private def pqAdcCte: String =
    """WITH x AS (SELECT label, i - 1 AS pos,
      |        CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v4
      |      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
      |cb AS (SELECT label AS cell, pos // 16 AS sub,
      |         list(CAST(sum_v4 AS DOUBLE) / 10000 / n ORDER BY pos) AS centroid
      |       FROM (SELECT label, pos, sum(v4) AS sum_v4, count(*) AS n FROM x GROUP BY label, pos)
      |       GROUP BY label, pos // 16),
      |ev AS (SELECT vec_id, pos // 16 AS sub, list(val ORDER BY pos) AS sv
      |       FROM (SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
      |             FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i))
      |       WHERE vec_id >= 5
      |       GROUP BY vec_id, pos // 16),
      |a AS (SELECT vec_id, ev.sub AS sub, cell,
      |        row_number() OVER (PARTITION BY vec_id, ev.sub
      |          ORDER BY round(list_cosine_similarity(sv, centroid), 6) DESC, cell ASC) AS rn
      |      FROM ev JOIN cb ON cb.sub = ev.sub),
      |recon AS (SELECT a.vec_id, flatten(list(cb.centroid ORDER BY a.sub)) AS rv
      |          FROM a JOIN cb ON cb.sub = a.sub AND cb.cell = a.cell
      |          WHERE a.rn = 1 GROUP BY a.vec_id),
      |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |      FROM embeddings WHERE vec_id < 5),
      |s AS (SELECT query_id, vec_id AS neighbor_id,
      |        list_cosine_similarity(qv, rv) AS adc
      |      FROM recon CROSS JOIN q),
      |r AS (SELECT query_id, neighbor_id, adc,
      |        CAST(row_number() OVER (PARTITION BY query_id
      |          ORDER BY adc DESC, neighbor_id ASC) AS BIGINT) AS rnk
      |      FROM s)""".stripMargin

  private def clusterCte: String = "WITH RECURSIVE " + clusterCteBody("documents")

  /** c19's cluster CTE chain over an arbitrary (doc_id, text) relation
    * (r16: c95 runs it over the MERGED corpus — documents ∪ re-keyed
    * recrawls). No `WITH RECURSIVE` prefix so a caller can prepend its
    * own CTEs. */
  private def clusterCteBody(rel: String): String =
    s"""tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM $rel),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
      |       FROM tok, UNNEST(range(1, len(tk)-1)) AS u(i)),
      |shl AS (SELECT doc_id, count(*) AS ns, list(shingle) AS sl FROM sh GROUP BY doc_id),
      |mh AS (SELECT doc_id,
      |    min(md5('0:' || shingle)) AS mh0, min(md5('1:' || shingle)) AS mh1,
      |    min(md5('2:' || shingle)) AS mh2, min(md5('3:' || shingle)) AS mh3,
      |    min(md5('4:' || shingle)) AS mh4, min(md5('5:' || shingle)) AS mh5,
      |    min(md5('6:' || shingle)) AS mh6, min(md5('7:' || shingle)) AS mh7
      |  FROM sh GROUP BY doc_id),
      |bd AS (
      |  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS key FROM mh
      |  UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM mh
      |  UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM mh
      |  UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM mh),
      |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |       FROM bd a JOIN bd b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |jp AS (SELECT p.doc_a, p.doc_b FROM pr p
      |       JOIN shl za ON za.doc_id = p.doc_a
      |       JOIN shl zb ON zb.doc_id = p.doc_b
      |       WHERE CAST((2000000*len(list_filter(za.sl, x -> list_contains(zb.sl, x)))
      |               + (za.ns + zb.ns - len(list_filter(za.sl, x -> list_contains(zb.sl, x)))))
      |             // (2*(za.ns + zb.ns - len(list_filter(za.sl, x -> list_contains(zb.sl, x)))))
      |             AS DOUBLE) / 1e6 >= 0.5),
      |ed AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM jp
      |       UNION ALL SELECT doc_b, doc_a FROM jp),
      |lp AS (SELECT u AS node, v AS lbl FROM ed WHERE v < u
      |       UNION
      |       SELECT e.u, l.lbl FROM lp l JOIN ed e ON l.node = e.v
      |       WHERE l.lbl < e.u),
      |lbl AS (SELECT node AS doc_id, min(lbl) AS mn FROM lp GROUP BY node)""".stripMargin

  /** DuckDB rendering of c95 (r16): the FULL re-cluster of the merged
    * corpus (documents ∪ re-keyed recrawls) in c19's surface shape. The
    * Spark side runs the INCREMENTAL maintenance (frozen labels + new
    * edges + confined CC), so this gate row engine-checks the
    * add-then-maintain ≡ full-re-cluster equivalence every round. */
  private def c95OracleSql: String =
    s"""WITH RECURSIVE dm AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000000000, text FROM documents
       |  WHERE doc_id % 11 = 5 AND doc_id % 7 != 3),
       |${clusterCteBody("dm")}
       |SELECT d.doc_id,
       |  CAST(least(COALESCE(l.mn, d.doc_id), d.doc_id) AS BIGINT) AS cluster_id,
       |  least(COALESCE(l.mn, d.doc_id), d.doc_id) = d.doc_id AS is_canonical
       |FROM dm d LEFT JOIN lbl l ON l.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** DuckDB rendering of the c6/c11 LSH bucket: the SAME seeded plane
    * matrix the Spark expression uses (VectorFunctions.lshPlanes),
    * inlined as integer literals at SQL-build time, dotted against the
    * fixed-point (1e-4, half-away-from-zero) embedding — all products and
    * sums are integer-valued doubles ≤ 2^53, so the bucket is exact in
    * both engines regardless of summation order. */
  private def lshBucketSql: String = lshBucketSql(6)

  private def lshBucketSql(nPlanes: Int): String =
    lshBucketSql(nPlanes, "graft")

  private def lshBucketSql(nPlanes: Int, seed: String): String = {
    val planes = graft.functions.VectorFunctions.lshPlanes(nPlanes, 64, seed)
    planes.map { p =>
      val lit = p.mkString("[", ",", "]") + "::DOUBLE[]"
      s"CAST(CAST(list_dot_product(f, $lit) >= 0 AS INT) AS VARCHAR)"
    }.mkString("concat(", ",\n           ", ")")
  }

  /** DuckDB rendering of c71: every band's bucket from the SAME seeded
    * integer plane matrices the Spark expression uses (seed
    * "graft:band$b" — lshBucketSql's exactness argument applies per
    * band), candidates = DISTINCT pairs colliding in ANY band, then the
    * exact-cosine verify at the gate threshold. */
  /** The c71 CTE chain (f0 fixed-point embeddings → 24 seeded band
    * buckets → candidate pairs), shared by the c71 and c72 renderers. */
  private def c71Ctes: String = {
    val bands = (0 until graft.operators.Similarity.C71Bands).map { b =>
      val bucket = lshBucketSql(
        graft.operators.Similarity.C71PlanesPerBand, s"graft:band$b")
      if (b == 0) s"  SELECT vec_id, 0 AS band, $bucket AS bucket FROM f0"
      else s"  UNION ALL SELECT vec_id, $b, $bucket FROM f0"
    }.mkString("\n")
    s"""WITH f0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x*10000)) AS f
       |  FROM embeddings),
       |bk AS (
       |$bands),
       |pr AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |       FROM bk a JOIN bk b
       |       ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)""".stripMargin
  }

  private def c71OracleSql: String =
    s"""$c71Ctes
       |SELECT p.vec_a, p.vec_b,
       |  round(list_cosine_similarity(ea.v, eb.v), 6) AS cosine_r
       |FROM pr p JOIN f0 ea ON ea.vec_id = p.vec_a
       |          JOIN f0 eb ON eb.vec_id = p.vec_b
       |WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.3
       |ORDER BY vec_a, vec_b""".stripMargin

  /** DuckDB rendering of c72: BOTH measurement sides re-derived in SQL —
    * the c71 band-union candidates with their exact-cosine verify, and
    * the cross-join exact pair truth — folded to the one-row recall
    * report. */
  private def c72OracleSql: String =
    s"""$c71Ctes,
       |bandv AS (SELECT p.vec_a, p.vec_b
       |  FROM pr p JOIN f0 ea ON ea.vec_id = p.vec_a
       |            JOIN f0 eb ON eb.vec_id = p.vec_b
       |  WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.3),
       |ex AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM f0 a JOIN f0 b ON a.vec_id < b.vec_id
       |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3),
       |u AS (SELECT vec_a, vec_b, 1 AS e, 0 AS b FROM ex
       |      UNION ALL SELECT vec_a, vec_b, 0, 1 FROM bandv),
       |g AS (SELECT vec_a, vec_b, max(e) AS e, max(b) AS b
       |      FROM u GROUP BY vec_a, vec_b)
       |SELECT CAST(sum(e) AS BIGINT) AS n_exact,
       |  CAST(sum(b) AS BIGINT) AS n_banded,
       |  CAST(sum(e * b) AS BIGINT) AS n_hit,
       |  CAST((2000000*sum(e * b) + sum(e)) // (2*sum(e)) AS DOUBLE) / 1e6
       |    AS recall_r
       |FROM g""".stripMargin

  /** The SAME plane-count derivation c11EmbedNearDup uses, from the SAME
    * parquet footer, so both engines bucket identically at any scale. */
  private def c11OraclePlanes(dir: String): Int =
    graft.operators.Similarity.adaptivePlanes(
      Tables.parquetRowCount(s"$dir/embeddings.parquet"))

  /** DuckDB oracle SQL (driver contract). Scale-adaptive oracle text
    * (c11's plane count, c52's learned merges) renders against the
    * env-exported data dir; every caller that knows its dir — Verify
    * dumps against the sfDir its queries just ran on — must use
    * [[oracleSqlFor]] so the SQL and the Spark plans adapt to the SAME
    * data. Kept only as the driver-contract name; deprecated because a
    * renderer without SPARK_GRAFT_SF_DIR set silently gets sf0.001's
    * adaptive parameters, which mismatch any other corpus. */
  @deprecated("pass the data dir the queries actually ran on via oracleSqlFor", "r10")
  def oracleSql: Map[String, String] =
    oracleSqlFor(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))

  /** DuckDB oracle SQL, same column names + ORDER BY as the Spark result,
    * rendered for the given data directory. c58's oracle COMPOSES the
    * c5/c6/c18 entries as subqueries (the eval must measure exactly the
    * searches the gate verifies — re-written SQL could drift), so the
    * base map is built first and extended below. */
  def oracleSqlFor(dir: String): Map[String, String] = {
    val base = oracleSqlBase(dir)
    new LazyOracleMap(
      base + ("c58_ann_recall" -> c58OracleSql(
        base("c5_ann_brute"), base("c6_ann_lsh"), base("c18_ann_ivf")))
        // c82 composes c19's cluster CTEs with c41's score SQL as a
        // subquery (c58's rule: the survivorship must judge exactly the
        // score the gate verifies — re-written SQL could drift)
        + ("c82_best_of_cluster" -> c82OracleSql(base("c41_freq_score")))
        + ("c83_minhash_recall" -> c83OracleSql(base("c2_dedup_minhash")))
        // c89 composes the c88 hash SQL for the banding (c58's rule) and
        // re-derives the exact pixel L1 from the closed-form thumbnails
        + ("c89_phash_pairs" -> c89OracleSql(base("c88_image_phash")))
        + ("c102_media_clusters" -> c102OracleSql(base("c88_image_phash")))
        + ("c103_media_clusters_incr" -> c103OracleSql(base("c88_image_phash")))
        // c104: the SAME cluster CTE chain over the c90 AUDIO hash SQL
        // and the audio universe (doc_id % 3 = 1)
        + ("c104_audio_clusters" -> (s"""WITH RECURSIVE hs AS (SELECT doc_id, phash FROM (${
          base("c90_audio_phash").replace("\n", "\n  ")})),
           |${mediaClusterCtes(
          "img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1)")}""".stripMargin))
        // c93/c94 (r16): the same banding+verify composition on the
        // audio hash SQL (exact verify = envelope L1 over the same 57
        // resampled points) and the per-frame video hash SQL (composite
        // fid = doc·8 + frame keys; exact verify = luma thumbnail L1)
        + ("c93_audio_pairs" -> c93OracleSql(base("c90_audio_phash")))
        + ("c94_video_pairs" -> c94OracleSql(base("c91_video_phash")))
        // c105/c106 (r17): the video-LEVEL decision — c94's banded SQL
        // composed with the containment fold (c105) and the closure
        // chain at video grain (c106)
        + ("c105_video_pairs" -> c105OracleSql(c94OracleSql(base("c91_video_phash"))))
        + ("c106_video_clusters" -> c106OracleSql(c94OracleSql(base("c91_video_phash"))))
        // c107 (r17): both closures re-derived — c19's text CTEs +
        // c102's media CTEs — composed into the joint per-doc verdict
        + ("c107_joint_dedup" -> c107OracleSql(base("c88_image_phash")))
        // c108 (r17): the per-modality brute truth; the banded columns
        // carry the pigeonhole theorem's answer the Spark side must
        // reach through the real banding
        + ("c108_phash_recall" -> c108OracleSql(base("c88_image_phash"),
          base("c90_audio_phash"), base("c91_video_phash")))
        // c109 (r17): the FULL two-stage re-cluster of the merged
        // frame-hash set — the Spark side maintains incrementally
        + ("c109_video_clusters_incr" -> c109OracleSql(base("c91_video_phash")))
        // c113 (r18): c103's full-re-cluster oracle shape at AUDIO
        // grain — the merged hash set (corpus ∪ every-5th re-keyed
        // recrawl, hash unchanged) re-clustered from scratch while the
        // Spark side maintains the frozen c104 labels incrementally
        + ("c113_audio_clusters_incr" -> c113OracleSql(base("c90_audio_phash")))
        // c114 (r18): the split-path banding completeness — the exact
        // NEW-TOUCHING truth per modality; the banded columns carry
        // the pigeonhole theorem's answer the Spark side must reach
        // through the real split candidates
        + ("c114_recall_split" -> c114OracleSql(base("c88_image_phash"),
          base("c90_audio_phash"), base("c91_video_phash")))
        // c120 (r20): the SAMPLED recall estimator — truth restricted
        // to pairs touching the md5-prefix doc sample; the banded/hit
        // columns still carry the pigeonhole answer, plus the exact-
        // rational rule-of-three lower bound
        + ("c120_recall_sampled" -> c120OracleSql(base("c88_image_phash"),
          base("c90_audio_phash"), base("c91_video_phash")))
        // c115 (r18): the d52 serving index — signatures re-derived
        // from the c91 hash SQL, clusters from the composed c106
        // closure (c58's composed-eval rule)
        + ("c115_video_sig_index" -> c115OracleSql(base("c91_video_phash"),
          c106OracleSql(c94OracleSql(base("c91_video_phash")))))
        // c110 (r17): the recipe composes c35's keep SQL (c50's rule —
        // the weighting must judge exactly the verdict the gate checks)
        + ("c110_data_recipe" -> c110OracleSql(base("c35_quality_filter")))
        // c111 (r17): the execution samples exactly the verified plan
        + ("c111_recipe_sample" ->
          c111OracleSql(c110OracleSql(base("c35_quality_filter"))))
        // c112 (r17): c40's hash/shard derivation + digit-wise hex
        // halves + exact mod-2⁶¹−1 digests
        + ("c112_shard_manifest" -> c112OracleSql)
        // c116 (r18): the planned-vs-realized fold over the composed
        // c110 + c111 renderings — exact integers end to end
        + ("c116_recipe_audit" ->
          c116OracleSql(c110OracleSql(base("c35_quality_filter")),
            c111OracleSql(c110OracleSql(base("c35_quality_filter")))))
        // c95 (r16): the oracle is the FULL re-cluster of the merged
        // corpus (c19's CTEs over documents ∪ recrawls) while the Spark
        // side maintains the frozen labels incrementally — the gate row
        // IS the add-then-maintain ≡ full-re-cluster equivalence check
        + ("c95_incr_clusters" -> c95OracleSql)
        // c96 composes c41's score SQL (c50's rule); the oracle keeps
        // the single-window formulation the Spark side salts around
        + ("c96_domain_cap" -> c96OracleSql(base("c41_freq_score")))
        + ("c97_domain_stats" -> c97OracleSql)
        // c92 composes c19's cluster CTEs (c82's rule: the weights must
        // discount exactly the clusters the gate verifies)
        + ("c92_soft_dedup" -> c92OracleSql)
        // c85/c86's oracle IS the single-window formulation the Spark
        // side deliberately avoids — identical ranks because the sort
        // key is total (that equivalence is what the gate verifies)
        + ("c85_global_rank" -> c85OracleSql(base("c41_freq_score")))
        + ("c86_curriculum" -> c86OracleSql(base("c41_freq_score")))
        // c87 folds the c12 SQL as a subquery (c58's rule: the card must
        // summarize exactly the decoded frame the gate verifies).
        // Substitute AFTER stripMargin: the c12 text has SQL `||` concat
        // at line starts, which an outer stripMargin would eat one pipe of
        + ("c87_media_card" ->
          """SELECT media_type, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
             |  CAST(sum(n_units) AS BIGINT) AS total_units,
             |  CAST(min(v_min) AS BIGINT) AS v_min,
             |  CAST(max(v_max) AS BIGINT) AS v_max,
             |  CAST(sum(v_sum) AS BIGINT) AS v_sum,
             |  CAST((2*CAST(sum(n_bytes) AS HUGEINT)*1000000 + count(*))
             |    // (2*count(*)) AS DOUBLE) / 1000000 AS avg_bytes_r
             |FROM (%%C12%%)
             |GROUP BY media_type ORDER BY media_type""".stripMargin
            .replace("%%C12%%", base("c12_multimodal"))),
      Map("c52_bpe_tokenize" -> (() => c52OracleSql(dir)),
        "c54_pca_project" -> (() => c54OracleSql(dir)),
        "c66_bpe_fertility" -> (() => c66OracleSql(dir)),
        "c70_bpe_bytes" -> (() => c70OracleSql(dir)),
        // no trained artifact, but ~6k inlined plane literals: render
        // on demand like the artifact entries
        "c71_neardup_banded" -> (() => c71OracleSql),
        "c72_neardup_recall" -> (() => c72OracleSql),
        "c73_byte_fertility" -> (() => c73OracleSql(dir)),
        "c74_quality_classifier" -> (() => c74OracleSql(dir)),
        "c75_unigram_tokenize" -> (() => c75OracleSql(dir)),
        "c78_unigram_fertility" -> (() => c78OracleSql(dir)),
        "c98_wordpiece_tokenize" -> (() => c98OracleSql(dir)),
        "c99_wordpiece_fertility" -> (() => c99OracleSql(dir)),
        // c101 joins the four already-verified fertility oracles on
        // doc_id (c84's composition rule: the matrix cannot disagree
        // with the per-family gates)
        "c101_tokenizer_matrix" -> (() =>
          s"""SELECT a.doc_id,
             |  a.n_tokens AS nt_bpe_char, b.n_tokens AS nt_bpe_byte,
             |  u.n_tokens AS nt_unigram, w.n_tokens AS nt_wordpiece,
             |  CAST((2000000*greatest(a.n_tokens, b.n_tokens, u.n_tokens,
             |          w.n_tokens)
             |        + least(a.n_tokens, b.n_tokens, u.n_tokens, w.n_tokens))
             |       // (2*least(a.n_tokens, b.n_tokens, u.n_tokens, w.n_tokens))
             |       AS DOUBLE) / 1e6 AS spread_r
             |FROM (${c66OracleSql(dir).replace("\n", "\n  ")}) a
             |JOIN (${c73OracleSql(dir).replace("\n", "\n  ")}) b USING (doc_id)
             |JOIN (${c78OracleSql(dir).replace("\n", "\n  ")}) u USING (doc_id)
             |JOIN (${c99OracleSql(dir).replace("\n", "\n  ")}) w USING (doc_id)
             |ORDER BY a.doc_id""".stripMargin),
        "c80_dsir_weights" -> (() => c80OracleSql(dir)),
        // c84 composes the three fertility oracles (two of them
        // artifact-trained) as subqueries — render on demand
        "c84_tokenizer_report" -> (() => c84OracleSql(dir))))
  }

  /** Oracle map whose artifact-TRAINED entries (c52's learned merges,
    * c54's PCA components) render ON DEMAND: listing keys or fetching any
    * pure-string oracle must not run training jobs or create a
    * SparkSession (they cost a corpus pass each; the old eager map paid
    * both for a `keySet` call). Forced values memoize per instance;
    * iterating the whole map (what Verify does) still renders everything
    * exactly once. */
  private final class LazyOracleMap(
      eager: Map[String, String], lazies: Map[String, () => String])
    extends scala.collection.immutable.Map[String, String] {
    private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()
    private def force(k: String): String = memo.computeIfAbsent(k, _ => lazies(k)())
    override def get(key: String): Option[String] =
      eager.get(key).orElse(lazies.get(key).map(_ => force(key)))
    override def contains(key: String): Boolean =
      eager.contains(key) || lazies.contains(key)
    override def keySet: Set[String] = eager.keySet ++ lazies.keySet
    override def keysIterator: Iterator[String] = keySet.iterator
    override def iterator: Iterator[(String, String)] =
      eager.iterator ++ lazies.keysIterator.map(k => k -> force(k))
    override def size: Int = eager.size + lazies.size
    override def removed(key: String): Map[String, String] =
      if (lazies.contains(key)) new LazyOracleMap(eager, lazies - key)
      else new LazyOracleMap(eager - key, lazies)
    override def updated[V1 >: String](key: String, value: V1): Map[String, V1] =
      iterator.toMap.updated(key, value) // forces; not on any hot path
  }

  /** Recall@k of each approximate index against the exact c5 baseline,
    * with the three searches inlined verbatim from their gate entries. */
  private def c58OracleSql(c5: String, c6: String, c18: String): String =
    s"""WITH truth AS (SELECT query_id, neighbor_id FROM ($c5) t5),
       |lshc AS (SELECT query_id, neighbor_id FROM ($c6) t6),
       |ivfc AS (SELECT query_id, neighbor_id FROM ($c18) t18),
       |bs AS (SELECT query_id, count(*) AS n_truth FROM truth GROUP BY query_id),
       |lh AS (SELECT t.query_id, count(*) AS lsh_hits
       |       FROM truth t JOIN lshc l
       |         ON l.query_id = t.query_id AND l.neighbor_id = t.neighbor_id
       |       GROUP BY t.query_id),
       |ih AS (SELECT t.query_id, count(*) AS ivf_hits
       |       FROM truth t JOIN ivfc i
       |         ON i.query_id = t.query_id AND i.neighbor_id = t.neighbor_id
       |       GROUP BY t.query_id)
       |SELECT b.query_id, b.n_truth,
       |  coalesce(lh.lsh_hits, 0) AS lsh_hits,
       |  coalesce(ih.ivf_hits, 0) AS ivf_hits,
       |  CAST((2000000*coalesce(lh.lsh_hits, 0) + b.n_truth)
       |       // (2*b.n_truth) AS DOUBLE) / 1e6 AS lsh_recall_r,
       |  CAST((2000000*coalesce(ih.ivf_hits, 0) + b.n_truth)
       |       // (2*b.n_truth) AS DOUBLE) / 1e6 AS ivf_recall_r
       |FROM bs b LEFT JOIN lh USING (query_id) LEFT JOIN ih USING (query_id)
       |ORDER BY query_id""".stripMargin

  private def oracleSqlBase(dir: String): Map[String, String] = Map(
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
        |  CAST(o_custkey % 24 AS BIGINT) AS timezone,
        |  o_totalprice > 1000.0 AS hypermiling,
        |  CAST(floor(o_totalprice) AS BIGINT) AS odometer,
        |  CAST(CAST(floor(o_totalprice) AS BIGINT) % 120 AS BIGINT) AS avgspeed,
        |  o_orderkey % 2 = 0 AS orientation,
        |  CAST(list_sum(list_transform(range(0,12), i -> (o_orderkey + i) % 60)) AS BIGINT) AS sum_sec_in_band,
        |  CAST(list_sum(list_transform(range(0,24), i -> (o_custkey + i) % 100)) AS BIGINT) AS sum_miles_in_time_range,
        |  CAST(list_sum(list_transform(range(0,13), i -> (CAST(floor(o_totalprice) AS BIGINT) + i) % 30)) AS BIGINT) AS sum_small_speed_var,
        |  CAST(o_custkey % 10 + CAST(floor(o_totalprice) AS BIGINT) % 100 AS BIGINT) AS events_total
        |FROM orders ORDER BY vin""".stripMargin,
    "a4_seq_column" ->
      """SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a5_batch_resize" ->
      """SELECT CAST((rn - 1) // 128 AS BIGINT) AS batch_id, count(*) AS n_rows
        |FROM (SELECT row_number() OVER (ORDER BY doc_id) AS rn FROM documents)
        |GROUP BY 1 ORDER BY batch_id""".stripMargin,
    "a6_ipc_serialize" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "a7_publisher" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a8_stream_pipeline" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "a10_convert_bench" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "a11_csv_convert" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "a12_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a13_permissive_parse" ->
      """SELECT CAST(event_id % 10 AS BIGINT) AS bucket,
        |  count(*) AS n_lines,
        |  CAST(sum(CASE WHEN event_id % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
        |  CAST(sum(CASE WHEN event_id % 100 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_good
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "a9_metrics" ->
      """SELECT 'batches_serialized' AS metric, CAST(ceil(count(*) / 128.0) AS BIGINT) AS value FROM documents
        |UNION ALL SELECT 'messages_published', CAST(ceil(count(*) / 128.0) AS BIGINT) FROM documents
        |UNION ALL SELECT 'rows_converted', count(*) FROM documents
        |UNION ALL SELECT 'rows_published', count(*) FROM documents
        |ORDER BY metric""".stripMargin,
    "b1_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_discount > 0.07
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "b2_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "b3_join_multiway" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
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
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type HAVING count(*) > 10
        |ORDER BY event_type""".stripMargin,
    "b10_time_window" ->
      """SELECT epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS hour_us, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin,
    "b11_grouping_sets" ->
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        |  count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
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
    "c29_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS q_label
        |           FROM embeddings WHERE vec_id < 5),
        |     c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv, label AS c_label
        |           FROM embeddings WHERE vec_id >= 5),
        |     s AS (SELECT query_id, neighbor_id, CAST(c_label AS BIGINT) AS neg_label,
        |             list_cosine_similarity(qv, cv) AS cosine
        |           FROM q CROSS JOIN c WHERE c_label <> q_label),
        |     r AS (SELECT query_id, neighbor_id, neg_label, cosine,
        |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rnk
        |           FROM s)
        |SELECT query_id, rnk, neighbor_id, neg_label, round(cosine, 6) AS cosine_r
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
    "c32_corpus_stats" ->
      """WITH t AS (SELECT lang, source, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
        |FROM t GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    "c10_fingerprint" ->
      """SELECT doc_id, md5(text) AS fingerprint,
        |  substr(md5(text), 1, 8) AS fp_bucket, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c3_dedup_simhash" -> {
      // 32-bit md5-hex simhash: bit i of a token = high bit of md5 hex
      // digit i ('>= 8' is lexicographically exact on hex), so every bit
      // is engine-portable
      val votes = (0 until 32).map(i =>
        s"sum(CASE WHEN substr(h, ${i + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v$i")
        .mkString(",\n    ")
      val hash = (0 until 32).map(i =>
        s"(CASE WHEN v$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
      val segs = (0 until 4).map(j =>
        s"CAST((simhash // ${1L << (8 * j)}) % 256 AS BIGINT) AS seg$j").mkString(",\n  ")
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, md5(t) AS h FROM (
         |    SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS t FROM documents)),
         |v AS (SELECT doc_id,
         |    $votes
         |  FROM tok GROUP BY doc_id),
         |s AS (SELECT doc_id, CAST($hash AS BIGINT) AS simhash FROM v)
         |SELECT doc_id, simhash,
         |  $segs
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "c2_dedup_minhash" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
        |       FROM tok, UNNEST(range(1, len(tk)-1)) AS u(i)),
        |shl AS (SELECT doc_id, count(*) AS ns, list(shingle) AS sl FROM sh GROUP BY doc_id),
        |mh AS (SELECT doc_id,
        |    min(md5('0:' || shingle)) AS mh0, min(md5('1:' || shingle)) AS mh1,
        |    min(md5('2:' || shingle)) AS mh2, min(md5('3:' || shingle)) AS mh3,
        |    min(md5('4:' || shingle)) AS mh4, min(md5('5:' || shingle)) AS mh5,
        |    min(md5('6:' || shingle)) AS mh6, min(md5('7:' || shingle)) AS mh7
        |  FROM sh GROUP BY doc_id),
        |bd AS (
        |  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS key FROM mh
        |  UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM mh
        |  UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM mh
        |  UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM mh),
        |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |       FROM bd a JOIN bd b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        |SELECT p.doc_a, p.doc_b,
        |  CAST((2000000*len(list_filter(za.sl, x -> list_contains(zb.sl, x)))
        |        + (za.ns + zb.ns - len(list_filter(za.sl, x -> list_contains(zb.sl, x)))))
        |       // (2*(za.ns + zb.ns - len(list_filter(za.sl, x -> list_contains(zb.sl, x)))))
        |       AS DOUBLE) / 1e6 AS jaccard
        |FROM pr p
        |JOIN shl za ON za.doc_id = p.doc_a
        |JOIN shl zb ON zb.doc_id = p.doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,
    // c37 = c2's minhash/band CTEs with the two sides split: incoming
    // (%7==3 plus a +1e12-rekeyed recrawl slice) vs existing (%7!=3);
    // exact via md5 equality, near via band collision + verified jaccard.
    "c37_incremental_dedup" ->
      """WITH inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 3
        |            UNION ALL
        |            SELECT doc_id + 1000000000000, text FROM documents
        |            WHERE doc_id % 11 = 5 AND doc_id % 7 <> 3),
        |ex AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3),
        |exact AS (SELECT i.doc_id, min(e.doc_id) AS exact_of
        |          FROM inc i JOIN ex e ON md5(i.text) = md5(e.text)
        |          GROUP BY i.doc_id),
        |shi AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
        |        FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM inc),
        |             UNNEST(range(1, len(tk)-1)) AS u(i)),
        |she AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
        |        FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM ex),
        |             UNNEST(range(1, len(tk)-1)) AS u(i)),
        |mhi AS (SELECT doc_id, count(*) AS ns,
        |    min(md5('0:' || shingle)) AS mh0, min(md5('1:' || shingle)) AS mh1,
        |    min(md5('2:' || shingle)) AS mh2, min(md5('3:' || shingle)) AS mh3,
        |    min(md5('4:' || shingle)) AS mh4, min(md5('5:' || shingle)) AS mh5,
        |    min(md5('6:' || shingle)) AS mh6, min(md5('7:' || shingle)) AS mh7
        |  FROM shi GROUP BY doc_id),
        |mhe AS (SELECT doc_id, count(*) AS ns,
        |    min(md5('0:' || shingle)) AS mh0, min(md5('1:' || shingle)) AS mh1,
        |    min(md5('2:' || shingle)) AS mh2, min(md5('3:' || shingle)) AS mh3,
        |    min(md5('4:' || shingle)) AS mh4, min(md5('5:' || shingle)) AS mh5,
        |    min(md5('6:' || shingle)) AS mh6, min(md5('7:' || shingle)) AS mh7
        |  FROM she GROUP BY doc_id),
        |bdi AS (
        |  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS key FROM mhi
        |  UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM mhi
        |  UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM mhi
        |  UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM mhi),
        |bde AS (
        |  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS key FROM mhe
        |  UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM mhe
        |  UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM mhe
        |  UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM mhe),
        |pr AS (SELECT DISTINCT a.doc_id AS in_id, b.doc_id AS ex_id
        |       FROM bdi a JOIN bde b ON a.band = b.band AND a.key = b.key),
        |iv AS (SELECT p.in_id, p.ex_id, count(*) AS ni
        |       FROM pr p
        |       JOIN shi ON shi.doc_id = p.in_id
        |       JOIN she ON she.doc_id = p.ex_id AND she.shingle = shi.shingle
        |       GROUP BY p.in_id, p.ex_id),
        |near AS (SELECT iv.in_id AS doc_id, min(iv.ex_id) AS near_of
        |         FROM iv
        |         JOIN mhi ON mhi.doc_id = iv.in_id
        |         JOIN mhe ON mhe.doc_id = iv.ex_id
        |         WHERE CAST((2000000*iv.ni + (mhi.ns + mhe.ns - iv.ni))
        |               // (2*(mhi.ns + mhe.ns - iv.ni)) AS DOUBLE) / 1e6 >= 0.7
        |         GROUP BY iv.in_id)
        |SELECT i.doc_id,
        |  CASE WHEN x.exact_of IS NOT NULL THEN 'exact_dup'
        |       WHEN n.near_of IS NOT NULL THEN 'near_dup'
        |       ELSE 'new' END AS status,
        |  COALESCE(x.exact_of, n.near_of) AS dup_of
        |FROM inc i
        |LEFT JOIN exact x ON x.doc_id = i.doc_id
        |LEFT JOIN near n ON n.doc_id = i.doc_id
        |ORDER BY i.doc_id""".stripMargin,
    "c26_passage_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |p AS (SELECT doc_id, i AS pidx,
        |        array_to_string(tk[(i*10+1):(i*10+10)], ' ') AS passage
        |      FROM tok, UNNEST(range(0, CAST(ceil(len(tk)/10.0) AS BIGINT))) AS u(i)),
        |own AS (SELECT md5(passage) AS h, min(doc_id) AS owner FROM p GROUP BY 1),
        |j AS (SELECT p.doc_id, p.pidx, p.passage, o.owner
        |      FROM p JOIN own o ON md5(p.passage) = o.h)
        |SELECT doc_id, count(*) AS n_passages,
        |  CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN owner <> doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  md5(string_agg(CASE WHEN owner = doc_id THEN passage END, ' ' ORDER BY pidx)) AS kept_md5
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "c4_ngram_jaccard" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        |gx AS (SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS gram
        |       FROM tok, UNNEST(range(1, len(tk)-1)) AS u(i)),
        |gr AS (SELECT doc_id, list(DISTINCT gram) AS gl, count(DISTINCT gram) AS ng
        |       FROM gx GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_filter(a.gl, x -> list_contains(b.gl, x))) AS BIGINT) AS n_common,
        |  CAST((2000000*len(list_filter(a.gl, x -> list_contains(b.gl, x)))
        |        + (a.ng + b.ng - len(list_filter(a.gl, x -> list_contains(b.gl, x)))))
        |       // (2*(a.ng + b.ng - len(list_filter(a.gl, x -> list_contains(b.gl, x)))))
        |       AS DOUBLE) / 1e6 AS jaccard
        |FROM gr a JOIN gr b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_a""".stripMargin,
    "c6_ann_lsh" ->
      (s"""WITH f0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x*10000)) AS f
        |  FROM embeddings),
        |e AS (SELECT vec_id, v, $lshBucketSql AS bucket FROM f0),""".stripMargin +
      """
        |
        |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM e WHERE vec_id >= 5),
        |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cosine
        |      FROM q JOIN c USING (bucket)),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rnk
        |      FROM s)
        |SELECT query_id, rnk, neighbor_id, round(cosine, 6) AS cosine_r
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin),
    // c33 = c6's bucket equi-join with c29's label-mismatch filter: the
    // keyed (non-broadcast) hard-negative form
    "c33_hard_negatives_lsh" ->
      (s"""WITH f0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x*10000)) AS f
        |  FROM embeddings),
        |e AS (SELECT vec_id, label, v, $lshBucketSql AS bucket FROM f0),""".stripMargin +
      """
        |
        |q AS (SELECT vec_id AS query_id, v AS qv, label AS q_label, bucket FROM e WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, v AS cv, label AS c_label, bucket FROM e WHERE vec_id >= 5),
        |s AS (SELECT query_id, neighbor_id, c_label, list_cosine_similarity(qv, cv) AS cosine
        |      FROM q JOIN c USING (bucket) WHERE c_label <> q_label),
        |r AS (SELECT query_id, neighbor_id, c_label, cosine,
        |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rnk
        |      FROM s)
        |SELECT query_id, rnk, neighbor_id, CAST(c_label AS BIGINT) AS neg_label, round(cosine, 6) AS cosine_r
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin),
    "c11_embed_neardup" ->
      (s"""WITH f0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x*10000)) AS f
        |  FROM embeddings),
        |e AS (SELECT vec_id, v, ${lshBucketSql(c11OraclePlanes(dir))} AS bucket FROM f0)""".stripMargin +
      """
        |
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cosine_r
        |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
        |ORDER BY vec_a, vec_b""".stripMargin),
    // every feature is recomputed from the closed-form payload-generation
    // formulas (Multimodal.pgmPayload/wavPayload/y4mPayload): the Spark
    // side decodes REAL PGM/WAV/Y4M binary, so one mis-parsed header byte,
    // sample, or frame boundary hash-fails here
    "c12_multimodal" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 AS m FROM documents),
        |img AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
        |    list_transform(range(0, (8 + doc_id % 9) * (8 + doc_id % 7)),
        |                   i -> (doc_id * 31 + i * 7) % 256) AS l
        |  FROM d WHERE m = 0),
        |aud AS (
        |  SELECT doc_id, 64 + doc_id % 129 AS n,
        |    list_transform(range(0, 64 + doc_id % 129),
        |                   i -> ((doc_id * 131 + i * 17) % 65536) - 32768) AS l
        |  FROM d WHERE m = 1),
        |-- Y4M: w x h 4:2:0 luma+chroma planes (w*h*3/2 bytes/frame), ASCII
        |-- stream header + 6-byte FRAME marker per frame
        |vid AS (
        |  SELECT doc_id, 8 + 2 * (doc_id % 5) AS w, 8 + 2 * (doc_id % 4) AS h,
        |    3 + doc_id % 6 AS frames,
        |    (8 + 2 * (doc_id % 5)) * (8 + 2 * (doc_id % 4)) * 3 // 2 AS fs,
        |    flatten(list_transform(range(0, 3 + doc_id % 6), f ->
        |      list_transform(range(0, (8 + 2 * (doc_id % 5)) * (8 + 2 * (doc_id % 4)) * 3 // 2),
        |                     i -> (doc_id * 7 + f * 101 + i * 13) % 256))) AS l
        |  FROM d WHERE m = 2)
        |SELECT doc_id, 'image' AS media_type,
        |  CAST(9 + strlen(CAST(w AS VARCHAR)) + strlen(CAST(h AS VARCHAR)) + w * h AS BIGINT) AS n_bytes,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(w * h AS BIGINT) AS n_units,
        |  CAST(list_min(l) AS BIGINT) AS v_min, CAST(list_max(l) AS BIGINT) AS v_max,
        |  CAST(list_sum(l) AS BIGINT) AS v_sum
        |FROM img
        |UNION ALL
        |SELECT doc_id, 'audio', CAST(44 + 2 * n AS BIGINT),
        |  CAST(8000 AS BIGINT), CAST(16 AS BIGINT), CAST(n AS BIGINT),
        |  CAST(list_min(l) AS BIGINT), CAST(list_max(l) AS BIGINT),
        |  CAST(list_sum(l) AS BIGINT)
        |FROM aud
        |UNION ALL
        |SELECT doc_id, 'video',
        |  CAST(strlen('YUV4MPEG2 W' || CAST(w AS VARCHAR) || ' H' || CAST(h AS VARCHAR)
        |         || ' F25:1 Ip A1:1 C420jpeg') + 1 + frames * (6 + fs) AS BIGINT),
        |  CAST(w AS BIGINT), CAST(h AS BIGINT), CAST(frames AS BIGINT),
        |  CAST(list_min(l) AS BIGINT), CAST(list_max(l) AS BIGINT),
        |  CAST(list_sum(l) AS BIGINT)
        |FROM vid
        |ORDER BY doc_id""".stripMargin,
    // c88 (r15): the dHash is recomputed CLOSED-FORM — pixel (r,c) of
    // the 8x8 nearest-neighbor thumbnail is the generation formula at
    // sampled index (r*h//8)*w + (c*w//8), bit r*7+c set iff the pixel
    // is darker than its right neighbor; the Spark side runs the REAL
    // PGM parse + the shared nnIdx sampler, so a header off-by-one or a
    // sampler drift hash-fails here. 56 bits keep the hash positive in
    // BIGINT on both engines; segments are 14-bit shifts.
    "c88_image_phash" ->
      """WITH img AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |             FROM documents WHERE doc_id % 3 = 0),
        |b AS (SELECT doc_id,
        |        CASE WHEN (doc_id*31 + ((r*h//8)*w + (c*w//8))*7) % 256 <
        |                  (doc_id*31 + ((r*h//8)*w + ((c+1)*w//8))*7) % 256
        |             THEN (CAST(1 AS BIGINT) << CAST(r*7 + c AS INT))
        |             ELSE CAST(0 AS BIGINT) END AS bit
        |      FROM img, range(0, 8) rr(r), range(0, 7) cc(c)),
        |ph AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS phash
        |       FROM b GROUP BY doc_id)
        |SELECT doc_id, phash,
        |  CAST((phash >> 0) & 16383 AS BIGINT) AS seg0,
        |  CAST((phash >> 14) & 16383 AS BIGINT) AS seg1,
        |  CAST((phash >> 28) & 16383 AS BIGINT) AS seg2,
        |  CAST((phash >> 42) & 16383 AS BIGINT) AS seg3
        |FROM ph ORDER BY doc_id""".stripMargin,
    // c90 (r15): the audio delta-sign hash recomputed closed-form —
    // sample i of the WAV data is ((doc_id*131 + i*17) % 65536) - 32768,
    // resampled at (j*n)//57 by the shared nnIdx floor rule; the Spark
    // side runs the REAL RIFF/PCM chunk walk, so a desynced chunk parse
    // or a resampler drift hash-fails here
    "c90_audio_phash" ->
      """WITH aud AS (SELECT doc_id, 64 + doc_id % 129 AS n
        |             FROM documents WHERE doc_id % 3 = 1),
        |b AS (SELECT doc_id,
        |        CASE WHEN ((doc_id*131 + ((j*n)//57)*17) % 65536) - 32768 <
        |                  ((doc_id*131 + (((j+1)*n)//57)*17) % 65536) - 32768
        |             THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
        |             ELSE CAST(0 AS BIGINT) END AS bit
        |      FROM aud, range(0, 56) jj(j)),
        |ph AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS phash
        |       FROM b GROUP BY doc_id)
        |SELECT doc_id, phash,
        |  CAST((phash >> 0) & 16383 AS BIGINT) AS seg0,
        |  CAST((phash >> 14) & 16383 AS BIGINT) AS seg1,
        |  CAST((phash >> 28) & 16383 AS BIGINT) AS seg2,
        |  CAST((phash >> 42) & 16383 AS BIGINT) AS seg3
        |FROM ph ORDER BY doc_id""".stripMargin,
    // c91 (r15): per-frame luma dHash recomputed closed-form — frame f's
    // luma byte i is (doc_id*7 + f*101 + i*13) % 256, thumbnailed by the
    // shared (r*h//8)*w + (x*w//8) floor rule; the Spark side runs the
    // REAL Y4M demux, so a marker desync or plane-offset slip hash-fails
    "c91_video_phash" ->
      """WITH vid AS (SELECT doc_id, 8 + 2*(doc_id % 5) AS w,
        |               8 + 2*(doc_id % 4) AS h, 3 + doc_id % 6 AS frames
        |             FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT doc_id, w, h, f
        |       FROM vid, range(0, 8) ff(f) WHERE f < frames),
        |b AS (SELECT doc_id, f,
        |        CASE WHEN (doc_id*7 + f*101 + ((r*h//8)*w + (x*w//8))*13) % 256 <
        |                  (doc_id*7 + f*101 + ((r*h//8)*w + ((x+1)*w//8))*13) % 256
        |             THEN (CAST(1 AS BIGINT) << CAST(r*7 + x AS INT))
        |             ELSE CAST(0 AS BIGINT) END AS bit
        |      FROM fr, range(0, 8) rr(r), range(0, 7) xx(x))
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(sum(bit) AS BIGINT) AS phash
        |FROM b GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin,
    // decoded-raster stats only: the PNG byte length is DEFLATE-
    // implementation-defined and deliberately outside the contract
    "c51_image_codec" ->
      """WITH img AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
        |    list_transform(range(0, (8 + doc_id % 9) * (8 + doc_id % 7)),
        |                   i -> (doc_id * 31 + i * 7) % 256) AS l
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(w * h AS BIGINT) AS n_units,
        |  CAST(list_min(l) AS BIGINT) AS v_min, CAST(list_max(l) AS BIGINT) AS v_max,
        |  CAST(list_sum(l) AS BIGINT) AS v_sum
        |FROM img ORDER BY doc_id""".stripMargin,
    // c53 (lossy JPEG): STRUCTURAL facts only — dims/pixel count/band
    // count are closed-form in doc_id; decoded pixel values are lossy-
    // codec-defined, so the contract is the inlined bounded-error TRUE
    // (the Spark side computes max |decoded-original| and compares ≤ tol)
    "c53_jpeg_codec" ->
      """SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS width,
        |  CAST(8 + doc_id % 7 AS BIGINT) AS height,
        |  CAST((8 + doc_id % 9) * (8 + doc_id % 7) AS BIGINT) AS n_units,
        |  CAST(1 AS BIGINT) AS n_bands, TRUE AS lossy_ok
        |FROM documents WHERE doc_id % 3 = 1 ORDER BY doc_id""".stripMargin,
    // c55: the log-free exact-rational BM25 (k1=6/5, b=3/4 cleared of
    // fractions — see TextOps.c55Bm25) — operands HUGEINT-staged (the
    // Spark side is DECIMAL(38,0)), 6-dp render by exact half-away `//`
    // division, fixed left-associated sum
    "c55_bm25" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents),
        |pd AS (SELECT doc_id, count(*) AS dl,
        |         CAST(sum(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS tf_spark,
        |         CAST(sum(CASE WHEN term = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf_window,
        |         CAST(sum(CASE WHEN term = 'query' THEN 1 ELSE 0 END) AS BIGINT) AS tf_query
        |       FROM tok GROUP BY doc_id),
        |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS HUGEINT) AS n_tokens,
        |         CAST(sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_spark,
        |         CAST(sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_window,
        |         CAST(sum(CASE WHEN tf_query > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_query
        |       FROM pd),
        |nd AS (SELECT doc_id, dl, tf_spark, tf_window, tf_query,
        |         (2*n_docs - 2*df_spark + 1) * 22 * n_tokens * tf_spark AS n_sp,
        |         (2*df_spark + 1) * (10*n_tokens*tf_spark + 3*n_tokens + 9*dl*n_docs) AS d_sp,
        |         (2*n_docs - 2*df_window + 1) * 22 * n_tokens * tf_window AS n_wi,
        |         (2*df_window + 1) * (10*n_tokens*tf_window + 3*n_tokens + 9*dl*n_docs) AS d_wi,
        |         (2*n_docs - 2*df_query + 1) * 22 * n_tokens * tf_query AS n_qu,
        |         (2*df_query + 1) * (10*n_tokens*tf_query + 3*n_tokens + 9*dl*n_docs) AS d_qu
        |       FROM pd CROSS JOIN st),
        |sc AS (SELECT doc_id, dl, tf_spark, tf_window, tf_query,
        |         CAST((2000000*n_sp + d_sp) // (2*d_sp) AS DOUBLE) / 1e6 AS s_spark,
        |         CAST((2000000*n_wi + d_wi) // (2*d_wi) AS DOUBLE) / 1e6 AS s_window,
        |         CAST((2000000*n_qu + d_qu) // (2*d_qu) AS DOUBLE) / 1e6 AS s_query
        |       FROM nd)
        |SELECT doc_id, dl, tf_spark, tf_window, tf_query, s_spark, s_window, s_query,
        |  s_spark + s_window + s_query AS score
        |FROM sc ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // c56: transition probabilities held exact as parts-per-billion via
    // integer floor division (`//` ≡ Spark's `div` for positive longs)
    "c56_lm_score" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |             FROM documents WHERE text IS NOT NULL),
        |dp AS (SELECT doc_id, tk[i] AS a, tk[i+1] AS b
        |       FROM tok, UNNEST(range(1, len(tk))) AS u(i)),
        |pc AS (SELECT a, b, count(*) AS c_pair FROM dp GROUP BY a, b),
        |pfx AS (SELECT a, CAST(sum(c_pair) AS BIGINT) AS c_prefix FROM pc GROUP BY a),
        |sc AS (SELECT doc_id, (c_pair * 1000000000) // c_prefix AS ppb
        |       FROM dp JOIN pc USING (a, b) JOIN pfx USING (a))
        |SELECT doc_id, count(*) AS n_pairs, CAST(sum(ppb) AS BIGINT) AS sum_ppb,
        |  CAST((2*sum(ppb)*1000000 + count(*)) // (2*count(*)) AS DOUBLE) / 1e6
        |    AS avg_ppb,
        |  CAST((2*sum(ppb)*1000000 + count(*)) // (2*count(*)) AS DOUBLE) / 1e6
        |    >= 34500000.0 AS keep
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // c62: duplicated-substring spans — positional 5-shingles under md5,
    // repeated-start islands merged per doc by the gap>n break rule;
    // value an exact integer, so the rows are engine-identical
    "c62_dup_spans" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |             FROM documents WHERE text IS NOT NULL),
        |pos AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS i,
        |          md5(array_to_string(tk[i:i+4], ' ')) AS sh
        |        FROM tok, UNNEST(range(1, len(tk) - 3)) AS u(i)),
        |dup AS (SELECT sh FROM pos GROUP BY sh HAVING count(*) > 1),
        |h AS (SELECT doc_id, i FROM pos JOIN dup USING (sh)),
        |g AS (SELECT doc_id, i,
        |        CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 5
        |             THEN 1 ELSE 0 END AS brk
        |      FROM h),
        |isl AS (SELECT doc_id, i,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY i
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |        FROM g)
        |SELECT doc_id, min(i) AS span_start,
        |  max(i) + 4 AS span_end,
        |  max(i) - min(i) + 5 AS span_tokens,
        |  count(*) AS n_dup_shingles
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
    // c64: duplication profile — c62's span CTEs verbatim, folded to
    // per-doc dup-token sums then per-lang exact counts + one rounded
    // share; span-free docs ride the left join as zero
    "c64_dup_stats" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |             FROM documents WHERE text IS NOT NULL),
        |pos AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS i,
        |          md5(array_to_string(tk[i:i+4], ' ')) AS sh
        |        FROM tok, UNNEST(range(1, len(tk) - 3)) AS u(i)),
        |dup AS (SELECT sh FROM pos GROUP BY sh HAVING count(*) > 1),
        |h AS (SELECT doc_id, i FROM pos JOIN dup USING (sh)),
        |g AS (SELECT doc_id, i,
        |        CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 5
        |             THEN 1 ELSE 0 END AS brk
        |      FROM h),
        |isl AS (SELECT doc_id, i,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY i
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |        FROM g),
        |sp AS (SELECT doc_id, max(i) - min(i) + 5 AS span_tokens
        |       FROM isl GROUP BY doc_id, island),
        |pd AS (SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS dup_tokens
        |       FROM sp GROUP BY doc_id),
        |dt AS (SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |       FROM documents WHERE text IS NOT NULL)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(coalesce(pd.dup_tokens, 0)) AS BIGINT) AS dup_tokens,
        |  CAST((2000000*sum(coalesce(pd.dup_tokens, 0)) + sum(n_tokens))
        |       // (2*sum(n_tokens)) AS DOUBLE) / 1e6 AS dup_share_r
        |FROM dt LEFT JOIN pd USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // c65: thresholded variable-length spans — c62's n=5 span CTEs cut
    // at span_tokens >= 20, confirmed by >= 1 duplicated 20-shingle
    // wholly inside (the exact-match evidence); counts exact integers
    "c65_span_minlen" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |             FROM documents WHERE text IS NOT NULL),
        |pos AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS i,
        |          md5(array_to_string(tk[i:i+4], ' ')) AS sh
        |        FROM tok, UNNEST(range(1, len(tk) - 3)) AS u(i)),
        |dup AS (SELECT sh FROM pos GROUP BY sh HAVING count(*) > 1),
        |h AS (SELECT doc_id, i FROM pos JOIN dup USING (sh)),
        |g AS (SELECT doc_id, i,
        |        CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 5
        |             THEN 1 ELSE 0 END AS brk
        |      FROM h),
        |isl AS (SELECT doc_id, i,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY i
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |        FROM g),
        |sp AS (SELECT doc_id, min(i) AS span_start, max(i) + 4 AS span_end,
        |         max(i) - min(i) + 5 AS span_tokens, count(*) AS n_dup_shingles
        |       FROM isl GROUP BY doc_id, island),
        |spm AS (SELECT * FROM sp WHERE span_tokens >= 20),
        |pos20 AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS i,
        |            md5(array_to_string(tk[i:i+19], ' ')) AS sh
        |          FROM tok, UNNEST(range(1, len(tk) - 18)) AS u(i)),
        |dup20 AS (SELECT sh FROM pos20 GROUP BY sh HAVING count(*) > 1),
        |h20 AS (SELECT doc_id, i FROM pos20 JOIN dup20 USING (sh))
        |SELECT spm.doc_id, span_start, span_end, span_tokens,
        |  n_dup_shingles, count(*) AS n_exact
        |FROM spm JOIN h20 ON spm.doc_id = h20.doc_id
        |  AND h20.i >= spm.span_start AND h20.i + 19 <= spm.span_end
        |GROUP BY spm.doc_id, span_start, span_end, span_tokens, n_dup_shingles
        |ORDER BY spm.doc_id, span_start""".stripMargin,
    // c63: span scrub — c62's shingle machinery + ownership (the
    // corpus-first occurrence per shingle value, a row_number here ≡
    // Spark's min-struct) + covered-position fold + per-doc rebuild;
    // FILTER keeps only uncut tokens, coalesce maps the all-cut doc's
    // NULL list to the empty string (Spark's array_join of [])
    "c63_span_scrub" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tko,
        |               string_split(lower(text), ' ') AS tk
        |             FROM documents WHERE text IS NOT NULL),
        |pos AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS i,
        |          md5(array_to_string(tk[i:i+4], ' ')) AS sh
        |        FROM tok, UNNEST(range(1, len(tk) - 3)) AS u(i)),
        |occ AS (SELECT doc_id, i,
        |          count(*) OVER (PARTITION BY sh) AS cnt,
        |          row_number() OVER (PARTITION BY sh ORDER BY doc_id, i) AS rn
        |        FROM pos),
        |ds AS (SELECT doc_id, i, (rn = 1) AS owned FROM occ WHERE cnt > 1),
        |cov AS (SELECT doc_id, p, max(CASE WHEN owned THEN 1 ELSE 0 END) AS any_owned
        |        FROM ds, UNNEST(range(i, i + 5)) AS v(p) GROUP BY doc_id, p),
        |cut AS (SELECT doc_id, p FROM cov WHERE any_owned = 0),
        |tp AS (SELECT doc_id, CAST(j - 1 AS BIGINT) AS p, tko[j] AS tok,
        |         len(tko) AS n_tokens
        |       FROM tok, UNNEST(range(1, len(tko) + 1)) AS w(j))
        |SELECT tp.doc_id, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN cut.p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cut,
        |  coalesce(array_to_string(list(tok ORDER BY tp.p)
        |    FILTER (WHERE cut.p IS NULL), ' '), '') AS scrubbed_text
        |FROM tp LEFT JOIN cut ON tp.doc_id = cut.doc_id AND tp.p = cut.p
        |GROUP BY tp.doc_id ORDER BY tp.doc_id""".stripMargin,
    // c67: thresholded scrub — c63's cut set restricted to positions
    // inside c65's confirmed spans (ds doubles as c62's duplicated-start
    // stream, so both subtrees share the pos CTE)
    "c67_scrub_minlen" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tko,
        |               string_split(lower(text), ' ') AS tk
        |             FROM documents WHERE text IS NOT NULL),
        |pos AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS i,
        |          md5(array_to_string(tk[i:i+4], ' ')) AS sh
        |        FROM tok, UNNEST(range(1, len(tk) - 3)) AS u(i)),
        |occ AS (SELECT doc_id, i,
        |          count(*) OVER (PARTITION BY sh) AS cnt,
        |          row_number() OVER (PARTITION BY sh ORDER BY doc_id, i) AS rn
        |        FROM pos),
        |ds AS (SELECT doc_id, i, (rn = 1) AS owned FROM occ WHERE cnt > 1),
        |cov AS (SELECT doc_id, p, max(CASE WHEN owned THEN 1 ELSE 0 END) AS any_owned
        |        FROM ds, UNNEST(range(i, i + 5)) AS v(p) GROUP BY doc_id, p),
        |cut0 AS (SELECT doc_id, p FROM cov WHERE any_owned = 0),
        |g AS (SELECT doc_id, i,
        |        CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 5
        |             THEN 1 ELSE 0 END AS brk
        |      FROM ds),
        |isl AS (SELECT doc_id, i,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY i
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |        FROM g),
        |sp AS (SELECT doc_id, min(i) AS span_start, max(i) + 4 AS span_end,
        |         max(i) - min(i) + 5 AS span_tokens
        |       FROM isl GROUP BY doc_id, island),
        |spm AS (SELECT * FROM sp WHERE span_tokens >= 20),
        |pos20 AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS i,
        |            md5(array_to_string(tk[i:i+19], ' ')) AS sh
        |          FROM tok, UNNEST(range(1, len(tk) - 18)) AS u(i)),
        |dup20 AS (SELECT sh FROM pos20 GROUP BY sh HAVING count(*) > 1),
        |h20 AS (SELECT doc_id, i FROM pos20 JOIN dup20 USING (sh)),
        |spc AS (SELECT DISTINCT spm.doc_id, span_start, span_end
        |        FROM spm JOIN h20 ON spm.doc_id = h20.doc_id
        |          AND h20.i >= spm.span_start AND h20.i + 19 <= spm.span_end),
        |cut AS (SELECT DISTINCT c.doc_id, c.p FROM cut0 c JOIN spc
        |        ON c.doc_id = spc.doc_id
        |          AND c.p >= spc.span_start AND c.p <= spc.span_end),
        |tp AS (SELECT doc_id, CAST(j - 1 AS BIGINT) AS p, tko[j] AS tok,
        |         len(tko) AS n_tokens
        |       FROM tok, UNNEST(range(1, len(tko) + 1)) AS w(j))
        |SELECT tp.doc_id, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN cut.p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cut,
        |  coalesce(array_to_string(list(tok ORDER BY tp.p)
        |    FILTER (WHERE cut.p IS NULL), ' '), '') AS scrubbed_text
        |FROM tp LEFT JOIN cut ON tp.doc_id = cut.doc_id AND tp.p = cut.p
        |GROUP BY tp.doc_id ORDER BY tp.doc_id""".stripMargin,
    // c69: substring-dup clusters — star edges per shared duplicated
    // 20-shingle value, transitive closure, min label (c19's CTE shape)
    "c69_span_clusters" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |             FROM documents WHERE text IS NOT NULL),
        |pos AS (SELECT doc_id, md5(array_to_string(tk[i:i+19], ' ')) AS sh
        |        FROM tok, UNNEST(range(1, len(tk) - 18)) AS u(i)),
        |dsh AS (SELECT DISTINCT doc_id, sh FROM pos),
        |rt AS (SELECT sh, min(doc_id) AS root, count(*) AS nd
        |       FROM dsh GROUP BY sh),
        |e0 AS (SELECT r.root AS u, d.doc_id AS v
        |       FROM dsh d JOIN rt r ON d.sh = r.sh
        |       WHERE r.nd > 1 AND d.doc_id <> r.root),
        |ed AS MATERIALIZED (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
        |lp AS (SELECT u AS node, v AS lbl FROM ed WHERE v < u
        |       UNION
        |       SELECT e.u, l.lbl FROM lp l JOIN ed e ON l.node = e.v
        |       WHERE l.lbl < e.u),
        |lbl AS (SELECT node AS doc_id, min(lbl) AS mn FROM lp GROUP BY node)
        |SELECT d.doc_id,
        |  CAST(least(COALESCE(l.mn, d.doc_id), d.doc_id) AS BIGINT) AS cluster_id,
        |  least(COALESCE(l.mn, d.doc_id), d.doc_id) = d.doc_id AS is_canonical
        |FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // c61: dataset card — every value an exact count or ONE 6-dp-rounded
    // division of exact counts; quality rule = c7's, length from text
    "c61_dataset_card" ->
      """WITH d AS (SELECT text, lang FROM documents WHERE text IS NOT NULL),
        |pd AS (SELECT text, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |           / len(string_split(text, ' ')) AS awl
        |       FROM d),
        |t AS (SELECT count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS n_tokens,
        |        count(DISTINCT md5(text)) AS n_distinct,
        |        CAST(sum(CASE WHEN n_words >= 5 AND awl >= 2.0 AND awl <= 12.0
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
        |      FROM pd)
        |SELECT metric, value_r FROM (
        |  SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value_r FROM t
        |  UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM t
        |  UNION ALL SELECT 'n_distinct_texts', CAST(n_distinct AS DOUBLE) FROM t
        |  UNION ALL SELECT 'dup_rate',
        |    CAST((2000000*(n_docs - n_distinct) + n_docs) // (2*n_docs)
        |         AS DOUBLE) / 1e6 FROM t
        |  UNION ALL SELECT 'mean_doc_tokens',
        |    CAST((2000000*n_tokens + n_docs) // (2*n_docs) AS DOUBLE) / 1e6
        |    FROM t
        |  UNION ALL SELECT 'quality_keep_rate',
        |    CAST((2000000*n_keep + n_docs) // (2*n_docs) AS DOUBLE) / 1e6
        |    FROM t
        |  UNION ALL SELECT 'lang_share:' || lang,
        |    CAST((2000000*count(*) + (SELECT n_docs FROM t))
        |         // (2*(SELECT n_docs FROM t)) AS DOUBLE) / 1e6
        |  FROM pd GROUP BY lang
        |) ORDER BY metric""".stripMargin,
    // c60: cluster labeling — the c18/c36 label-codebook + argmax
    // assignment CTEs (repeated verbatim, the codebook-CTE precedent)
    // feeding c16's log-free tf·N/df scoring at CLUSTER granularity;
    // corpus convention: embeddings.vec_id ≡ documents.doc_id
    "c60_cluster_label" ->
      """WITH x AS (SELECT label, i - 1 AS pos,
        |        CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v4
        |      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
        |cb AS (SELECT label AS cell, list(CAST(sum_v4 AS DOUBLE) / 10000 / n ORDER BY pos) AS centroid
        |       FROM (SELECT label, pos, sum(v4) AS sum_v4, count(*) AS n FROM x GROUP BY label, pos)
        |       GROUP BY label),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |a AS (SELECT vec_id, cell,
        |        row_number() OVER (PARTITION BY vec_id
        |          ORDER BY round(list_cosine_similarity(v, centroid), 6) DESC, cell ASC) AS arn
        |      FROM e CROSS JOIN cb),
        |asg AS (SELECT vec_id, cell FROM a WHERE arn = 1),
        |tfx AS (SELECT asg.cell, unnest(string_split(lower(d.text), ' ')) AS term
        |        FROM asg JOIN documents d ON d.doc_id = asg.vec_id),
        |tf AS (SELECT cell, term, count(*) AS tf FROM tfx GROUP BY cell, term),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |nc AS (SELECT count(DISTINCT cell) AS n_cells FROM tf),
        |s AS (SELECT tf.cell, tf.term, tf.tf, dfx.df,
        |        CAST((2000000*tf.tf*nc.n_cells + dfx.df) // (2*dfx.df)
        |             AS DOUBLE) / 1e6 AS score_r
        |      FROM tf JOIN dfx USING (term) CROSS JOIN nc),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY cell
        |        ORDER BY score_r DESC, term ASC) AS BIGINT) AS rnk FROM s)
        |SELECT CAST(cell AS BIGINT) AS cell, rnk, term, tf, df, score_r
        |FROM r WHERE rnk <= 3 ORDER BY cell, rnk""".stripMargin,
    // c59: RRF k=60 fusion of the BM25 ranking with a query-likelihood
    // ranking; contributions rounded per ranker then summed in fixed
    // order; ql held exact as parts-per-million by integer floor division
    "c59_rrf_fuse" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents),
        |pd AS (SELECT doc_id, count(*) AS dl,
        |         CAST(sum(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS tf_spark,
        |         CAST(sum(CASE WHEN term = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf_window,
        |         CAST(sum(CASE WHEN term = 'query' THEN 1 ELSE 0 END) AS BIGINT) AS tf_query
        |       FROM tok GROUP BY doc_id),
        |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS HUGEINT) AS n_tokens,
        |         CAST(sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_spark,
        |         CAST(sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_window,
        |         CAST(sum(CASE WHEN tf_query > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_query
        |       FROM pd),
        |fx AS (SELECT doc_id,
        |         CAST((2000000*((2*n_docs - 2*df_spark + 1) * 22 * n_tokens * tf_spark)
        |               + ((2*df_spark + 1) * (10*n_tokens*tf_spark + 3*n_tokens + 9*dl*n_docs)))
        |            // (2*((2*df_spark + 1) * (10*n_tokens*tf_spark + 3*n_tokens + 9*dl*n_docs))) AS DOUBLE) / 1e6
        |         + CAST((2000000*((2*n_docs - 2*df_window + 1) * 22 * n_tokens * tf_window)
        |               + ((2*df_window + 1) * (10*n_tokens*tf_window + 3*n_tokens + 9*dl*n_docs)))
        |            // (2*((2*df_window + 1) * (10*n_tokens*tf_window + 3*n_tokens + 9*dl*n_docs))) AS DOUBLE) / 1e6
        |         + CAST((2000000*((2*n_docs - 2*df_query + 1) * 22 * n_tokens * tf_query)
        |               + ((2*df_query + 1) * (10*n_tokens*tf_query + 3*n_tokens + 9*dl*n_docs)))
        |            // (2*((2*df_query + 1) * (10*n_tokens*tf_query + 3*n_tokens + 9*dl*n_docs))) AS DOUBLE) / 1e6 AS score,
        |         ((tf_spark + tf_window + tf_query) * 1000000) // dl AS ql_ppm
        |       FROM pd CROSS JOIN st),
        |a AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_bm25
        |      FROM (SELECT doc_id, score FROM fx ORDER BY score DESC, doc_id LIMIT 50) ta),
        |b AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY ql_ppm DESC, doc_id) AS BIGINT) AS rank_ql
        |      FROM (SELECT doc_id, ql_ppm FROM fx ORDER BY ql_ppm DESC, doc_id LIMIT 50) tb),
        |f AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, a.rank_bm25, b.rank_ql
        |      FROM a FULL JOIN b ON a.doc_id = b.doc_id)
        |SELECT doc_id,
        |  coalesce(rank_bm25, 0) AS rank_bm25,
        |  coalesce(rank_ql, 0) AS rank_ql,
        |  (CASE WHEN rank_bm25 IS NULL THEN CAST(0 AS DOUBLE)
        |        ELSE round(CAST(1 AS DOUBLE) / (60 + rank_bm25), 6) END
        |   + CASE WHEN rank_ql IS NULL THEN CAST(0 AS DOUBLE)
        |          ELSE round(CAST(1 AS DOUBLE) / (60 + rank_ql), 6) END) AS rrf_r
        |FROM f ORDER BY rrf_r DESC, doc_id LIMIT 20""".stripMargin,
    // c57: winnowing (k=4-token shingles, w=5-hash windows); md5 hex
    // strings under lexicographic list min — identical ASCII order in
    // both engines; short docs CASE-guard to the empty fingerprint set
    "c57_winnow" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |             FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        |        CASE WHEN len(tk) >= 4
        |             THEN list_transform(range(1, len(tk) - 2),
        |                    i -> md5(array_to_string(tk[i:i+3], ' ')))
        |             ELSE CAST([] AS VARCHAR[]) END AS gs
        |      FROM tok),
        |f AS (SELECT doc_id, n_tokens, CAST(len(gs) AS BIGINT) AS n_grams,
        |        CASE WHEN len(gs) >= 5
        |             THEN list_sort(list_distinct(list_transform(range(1, len(gs) - 3),
        |                    j -> list_aggregate(gs[j:j+4], 'min'))))
        |             ELSE CAST([] AS VARCHAR[]) END AS fps
        |      FROM g)
        |SELECT doc_id, n_tokens, n_grams,
        |  CAST(greatest(n_grams - 4, 0) AS BIGINT) AS n_windows,
        |  CAST(len(fps) AS BIGINT) AS n_fp,
        |  md5(array_to_string(fps, '')) AS fp_md5
        |FROM f ORDER BY doc_id""".stripMargin,
    // c81 = c57's winnow CTEs (candidates: fingerprint collisions) +
    // clusterCte's shingle shape (exact verify) + exact-integer rounding.
    "c81_containment" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |             FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(tk) >= 4
        |             THEN list_transform(range(1, len(tk) - 2),
        |                    i -> md5(array_to_string(tk[i:i+3], ' ')))
        |             ELSE CAST([] AS VARCHAR[]) END AS gs
        |      FROM tok),
        |f AS (SELECT doc_id, unnest(
        |        CASE WHEN len(gs) >= 5
        |             THEN list_distinct(list_transform(range(1, len(gs) - 3),
        |                    j -> list_aggregate(gs[j:j+4], 'min')))
        |             ELSE CAST([] AS VARCHAR[]) END) AS fp
        |      FROM g),
        |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |       FROM f a JOIN f b ON a.fp = b.fp WHERE a.doc_id < b.doc_id),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
        |       FROM tok, UNNEST(range(1, len(tk)-1)) AS u(i)),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
        |it AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS n_common
        |       FROM pr p JOIN sh sa ON sa.doc_id = p.doc_a
        |                 JOIN sh sb ON sb.doc_id = p.doc_b
        |                          AND sb.shingle = sa.shingle
        |       GROUP BY p.doc_a, p.doc_b),
        |r AS (SELECT it.doc_a, it.doc_b, it.n_common,
        |        za.n AS na, zb.n AS nb,
        |        CAST((2*it.n_common*1000000 + za.n) // (2*za.n) AS DOUBLE)
        |          / 1000000 AS cont_a_in_b_r,
        |        CAST((2*it.n_common*1000000 + zb.n) // (2*zb.n) AS DOUBLE)
        |          / 1000000 AS cont_b_in_a_r
        |      FROM it JOIN sz za ON za.doc_id = it.doc_a
        |              JOIN sz zb ON zb.doc_id = it.doc_b)
        |SELECT doc_a, doc_b, n_common, na, nb, cont_a_in_b_r, cont_b_in_a_r,
        |  greatest(cont_a_in_b_r, cont_b_in_a_r) >= 0.5 AS contained
        |FROM r ORDER BY doc_a, doc_b""".stripMargin,
    "b13_pivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS seg,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events GROUP BY 1 ORDER BY seg""".stripMargin,
    "c15_embed_centroid" ->
      """WITH x AS (
        |  SELECT label, i - 1 AS pos,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v
        |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i))
        |SELECT label, CAST(pos AS INT) AS pos,
        |  CAST(sum(v) AS BIGINT) AS sum_v4, count(*) AS n
        |FROM x GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "c14_train_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(text), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "b14_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
        |j AS (SELECT c.event_id AS click_id, c.user_id, c.ts_us AS click_ts_us,
        |        p.event_id AS purchase_id, p.ts_us AS purchase_ts_us,
        |        row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts_us DESC, p.event_id DESC) AS rn
        |      FROM c LEFT JOIN p ON c.user_id = p.user_id AND p.ts_us <= c.ts_us)
        |SELECT click_id, user_id, click_ts_us, purchase_id, purchase_ts_us
        |FROM j WHERE rn = 1 ORDER BY click_id""".stripMargin,
    // b22 mirrors b14's oracle in the forward direction with the
    // tolerance folded into the join predicate (equivalent to the Spark
    // post-filter: the first right >= t is the minimum ts, so bounding
    // candidates and bounding the pick agree)
    "b22_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
        |j AS (SELECT c.event_id AS click_id, c.user_id, c.ts_us AS click_ts_us,
        |        p.event_id AS purchase_id, p.ts_us AS purchase_ts_us,
        |        row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts_us ASC, p.event_id ASC) AS rn
        |      FROM c LEFT JOIN p ON c.user_id = p.user_id AND p.ts_us >= c.ts_us
        |                        AND p.ts_us <= c.ts_us + 1800000000)
        |SELECT click_id, user_id, click_ts_us, purchase_id, purchase_ts_us
        |FROM j WHERE rn = 1 ORDER BY click_id""".stripMargin,
    // b23 carries the matched right ROW: the oracle projects the same
    // fields out of the row_number pick (b14's formulation), value/type
    // straight from parquet — no arithmetic, exact parity
    "b23_asof_row" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, value FROM events),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts_us, event_type, value FROM e WHERE event_type <> 'click'),
        |j AS (SELECT c.event_id AS click_id, c.user_id, c.ts_us AS click_ts_us,
        |        p.event_id AS prev_id, p.event_type AS prev_type,
        |        p.value AS prev_value, p.ts_us AS prev_ts_us,
        |        row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts_us DESC, p.event_id DESC) AS rn
        |      FROM c LEFT JOIN p ON c.user_id = p.user_id AND p.ts_us <= c.ts_us)
        |SELECT click_id, user_id, click_ts_us, prev_id, prev_type, prev_value, prev_ts_us
        |FROM j WHERE rn = 1 ORDER BY click_id""".stripMargin,
    "b15_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
        |c AS (SELECT event_id AS click_id, user_id, ts_us AS click_ts_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts_us AS purchase_ts_us FROM e WHERE event_type = 'purchase')
        |SELECT c.click_id, c.user_id, c.click_ts_us, p.purchase_id, p.purchase_ts_us
        |FROM c JOIN p ON c.user_id = p.user_id
        | AND p.purchase_ts_us >= c.click_ts_us
        | AND p.purchase_ts_us <= c.click_ts_us + 1800000000
        |ORDER BY click_id, purchase_id""".stripMargin,
    "b16_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_nd, true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "b18_outer_join" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey >= 100),
        |u AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
        |SELECT COALESCE(c.c_custkey, u.user_id) AS entity_id,
        |  c.c_custkey IS NOT NULL AS has_customer,
        |  u.user_id IS NOT NULL AS has_events,
        |  COALESCE(u.n_events, 0) AS n_events
        |FROM c FULL JOIN u ON c.c_custkey = u.user_id
        |ORDER BY entity_id""".stripMargin,
    "b20_unpivot" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c2,
        |  round(min(value), 6) AS min_v,
        |  round(max(value), 6) AS max_v
        |FROM u GROUP BY measure ORDER BY measure""".stripMargin,
    // b21: identical-event suppression — lag over the identity key in
    // integer epoch-micros (ts is NANOS on disk; the proven conversion
    // is epoch_us over the µs-truncated cast, ≡ Spark's unix_micros)
    "b21_window_dedup" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |        epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |      FROM events),
        |l AS (SELECT event_id, user_id, event_type, ts_us,
        |        lag(ts_us) OVER (PARTITION BY user_id, event_type
        |          ORDER BY ts_us, event_id) AS prev_us
        |      FROM e)
        |SELECT event_id, user_id, event_type, ts_us,
        |  (prev_us IS NOT NULL AND ts_us - prev_us <= 1800000000) AS is_dup
        |FROM l ORDER BY event_id""".stripMargin,
    "b19_correlated" ->
      """WITH parts AS (
        |  SELECT p_partkey, p_brand,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents
        |  FROM part)
        |SELECT p_partkey, p_brand, cents
        |FROM parts p
        |WHERE cents * 10 * (SELECT count(*) FROM parts p2
        |                    WHERE p2.p_brand = p.p_brand)
        |    > 12 * (SELECT sum(cents) FROM parts p3
        |            WHERE p3.p_brand = p.p_brand)
        |ORDER BY p_partkey""".stripMargin,
    "b17_approx_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  count(*) AS n, true AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "c16_tfidf" ->
      """WITH tok AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
        |        CAST((2000000*tf.tf*n.n_docs + dfx.df) // (2*dfx.df)
        |             AS DOUBLE) / 1e6 AS score_r
        |      FROM tf JOIN dfx USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_r DESC, term ASC) AS rn FROM s)
        |SELECT doc_id, term AS top_term, tf, df, score_r FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "c34_vocab_topk" ->
      """SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |      FROM documents)
        |GROUP BY term
        |ORDER BY tf DESC, term ASC
        |LIMIT 100""".stripMargin,
    // c100: the counter grid is a pure function of the corpus (md5-
    // prefix buckets, c80's rule), so the oracle re-derives the WHOLE
    // sketch — counters, min-estimates, the cut — from scratch; any
    // drift in Spark's fold/collect/lookup path hash-fails
    "c100_cms_topk" ->
      s"""WITH wt AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS wcnt FROM
         |    (SELECT unnest(string_split(lower(text), ' ')) AS w
         |     FROM documents WHERE text IS NOT NULL)
         |  WHERE len(w) >= 1 GROUP BY w),
         |ctr AS (
         |  SELECT i, substr(md5(CAST(i AS VARCHAR) || ':' || w), 1, 2) AS b,
         |         CAST(sum(wcnt) AS BIGINT) AS c
         |  FROM wt, range(0, ${graft.operators.Sketch.CmsDepth}) ii(i)
         |  GROUP BY i, b),
         |est AS (
         |  SELECT wt.w AS token, CAST(min(ctr.c) AS BIGINT) AS est_cnt,
         |         wt.wcnt AS true_cnt
         |  FROM wt JOIN ctr
         |    ON ctr.b = substr(md5(CAST(ctr.i AS VARCHAR) || ':' || wt.w), 1, 2)
         |  GROUP BY wt.w, wt.wcnt)
         |SELECT token, est_cnt, true_cnt, est_cnt = true_cnt AS exact
         |FROM est
         |ORDER BY est_cnt DESC, token LIMIT ${graft.operators.Sketch.CmsTopK}""".stripMargin,
    "c35_quality_filter" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents),
        |tc AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
        |st AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |         count(*) AS n_types, CAST(max(c) AS BIGINT) AS max_tc
        |       FROM tc GROUP BY doc_id),
        |r AS (SELECT doc_id, n_words, n_types, max_tc,
        |        CAST((2000000*n_types + n_words) // (2*n_words) AS DOUBLE)
        |          / 1e6 AS ttr,
        |        CAST((2000000*max_tc + n_words) // (2*n_words) AS DOUBLE)
        |          / 1e6 AS top_share,
        |        n_words >= 10 AND n_words <= 1000 AS rule_len
        |      FROM st)
        |SELECT doc_id, n_words, n_types, max_tc, ttr, top_share, rule_len,
        |  ttr >= 0.2 AS rule_ttr,
        |  top_share <= 0.2 AS rule_top_share,
        |  rule_len AND ttr >= 0.2 AND top_share <= 0.2 AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    "c17_stratified_sample" ->
      """SELECT doc_id, lang, substr(md5(text), 1, 2) AS bucket
        |FROM documents
        |WHERE substr(md5(text), 1, 2) < CASE WHEN lang = 'en' THEN '40' ELSE '80' END
        |ORDER BY doc_id""".stripMargin,
    "c18_ann_ivf" ->
      """WITH x AS (SELECT label, i - 1 AS pos,
        |        CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v4
        |      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
        |cb AS (SELECT label AS cell, list(CAST(sum_v4 AS DOUBLE) / 10000 / n ORDER BY pos) AS centroid
        |       FROM (SELECT label, pos, sum(v4) AS sum_v4, count(*) AS n FROM x GROUP BY label, pos)
        |       GROUP BY label),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |a AS (SELECT vec_id, v, cell,
        |        row_number() OVER (PARTITION BY vec_id
        |          ORDER BY round(list_cosine_similarity(v, centroid), 6) DESC, cell ASC) AS arn
        |      FROM e CROSS JOIN cb),
        |asg AS (SELECT vec_id, v, cell FROM a WHERE arn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv, cell FROM asg WHERE vec_id < 5),
        |cand AS (SELECT vec_id AS neighbor_id, v AS cv, cell FROM asg WHERE vec_id >= 5),
        |s AS (SELECT query_id, neighbor_id, cell, list_cosine_similarity(qv, cv) AS cosine
        |      FROM q JOIN cand USING (cell)),
        |r AS (SELECT query_id, neighbor_id, cell, cosine,
        |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rnk
        |      FROM s)
        |SELECT query_id, rnk, neighbor_id, cell, round(cosine, 6) AS cosine_r
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // c36 = c18's codebook CTE sliced into 4 16-dim subspaces; per
    // (vec_id, subspace) argmax over rounded subspace cosine, ties to the
    // lowest cell — the same contract NearestCells implements natively.
    "c36_pq_quantize" ->
      """WITH x AS (SELECT label, i - 1 AS pos,
        |        CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v4
        |      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
        |cb AS (SELECT label AS cell, pos // 16 AS sub,
        |         list(CAST(sum_v4 AS DOUBLE) / 10000 / n ORDER BY pos) AS centroid
        |       FROM (SELECT label, pos, sum(v4) AS sum_v4, count(*) AS n FROM x GROUP BY label, pos)
        |       GROUP BY label, pos // 16),
        |ev AS (SELECT vec_id, pos // 16 AS sub, list(val ORDER BY pos) AS sv
        |       FROM (SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
        |             FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i))
        |       GROUP BY vec_id, pos // 16),
        |a AS (SELECT vec_id, ev.sub AS sub, cell,
        |        round(list_cosine_similarity(sv, centroid), 6) AS score,
        |        row_number() OVER (PARTITION BY vec_id, ev.sub
        |          ORDER BY round(list_cosine_similarity(sv, centroid), 6) DESC, cell ASC) AS rn
        |      FROM ev JOIN cb ON cb.sub = ev.sub)
        |SELECT vec_id, CAST(sub AS BIGINT) AS subspace, CAST(cell AS BIGINT) AS code,
        |  score AS score_r
        |FROM a WHERE rn = 1 ORDER BY vec_id, subspace""".stripMargin,
    // c38 = c36's code-assignment CTEs + reconstruction (concatenated
    // sub-centroids per candidate) + c5's top-k shape against the
    // full-precision query.
    "c38_pq_search" ->
      s"""$pqAdcCte
        |SELECT query_id, rnk, neighbor_id, round(adc, 6) AS adc_r
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // c79 = c38's full ADC ranking kept to a 20-id shortlist, then exact
    // cosine against the full-precision vectors of the shortlist only.
    "c79_exact_rerank" ->
      s"""$pqAdcCte,
        |sl AS (SELECT query_id, neighbor_id, rnk AS adc_rnk
        |       FROM r WHERE rnk <= 20),
        |ex AS (SELECT sl.query_id, sl.neighbor_id, sl.adc_rnk,
        |         list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS ex
        |       FROM sl JOIN embeddings e ON e.vec_id = sl.neighbor_id
        |               JOIN q ON q.query_id = sl.query_id),
        |rr AS (SELECT query_id, neighbor_id, adc_rnk, ex,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |           ORDER BY ex DESC, neighbor_id ASC) AS BIGINT) AS rnk
        |       FROM ex)
        |SELECT query_id, rnk, neighbor_id, round(ex, 6) AS exact_r, adc_rnk
        |FROM rr WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // c31 = c18's codebook + assignment CTEs, then the Lloyd update as
    // exact integer numerator/denominator pairs per (cell, pos).
    "c31_kmeans_step" ->
      """WITH xv AS (SELECT vec_id, label, i - 1 AS pos,
        |        CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v4
        |      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
        |cb AS (SELECT label AS cell, list(CAST(sum_v4 AS DOUBLE) / 10000 / n ORDER BY pos) AS centroid
        |       FROM (SELECT label, pos, sum(v4) AS sum_v4, count(*) AS n FROM xv GROUP BY label, pos)
        |       GROUP BY label),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |a AS (SELECT vec_id, cell,
        |        row_number() OVER (PARTITION BY vec_id
        |          ORDER BY round(list_cosine_similarity(v, centroid), 6) DESC, cell ASC) AS arn
        |      FROM e CROSS JOIN cb),
        |asg AS (SELECT vec_id, cell FROM a WHERE arn = 1)
        |SELECT CAST(asg.cell AS BIGINT) AS cell, CAST(xv.pos AS BIGINT) AS pos,
        |  count(*) AS n_members, CAST(sum(xv.v4) AS BIGINT) AS sum_v4
        |FROM xv JOIN asg USING (vec_id)
        |GROUP BY asg.cell, xv.pos
        |ORDER BY cell, pos""".stripMargin,
    "c19_dedup_cluster" ->
      s"""$clusterCte
        |SELECT d.doc_id,
        |  CAST(least(COALESCE(l.mn, d.doc_id), d.doc_id) AS BIGINT) AS cluster_id,
        |  least(COALESCE(l.mn, d.doc_id), d.doc_id) = d.doc_id AS is_canonical
        |FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // c30 shares c19's connected-components CTE: split is a pure function
    // of the CLUSTER CANONICAL's text hash (c14's split formula), so
    // near-dups co-travel across train/val/test by construction.
    "c30_cluster_split" ->
      s"""$clusterCte,
        |cl AS (SELECT d.doc_id,
        |         CAST(least(COALESCE(l.mn, d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
        |       FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id)
        |SELECT cl.doc_id, cl.cluster_id,
        |  CASE WHEN substring(md5(cd.text), 1, 2) < 'cc' THEN 'train'
        |       WHEN substring(md5(cd.text), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM cl JOIN documents cd ON cd.doc_id = cl.cluster_id
        |ORDER BY cl.doc_id""".stripMargin,
    "c20_pii_scrub" ->
      """WITH f AS (SELECT doc_id,
        |    text || ' Contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example or +1-555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS full_text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(full_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(full_text, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(full_text, '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(full_text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
        |    '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g')) AS scrub_md5
        |FROM f ORDER BY doc_id""".stripMargin,
    "c21_repetition_ratio" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        |tot AS (SELECT doc_id, len(tk) - 2 AS n_grams FROM tok WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
        |       FROM tok, UNNEST(range(1, len(tk)-1)) AS u(i)),
        |dc AS (SELECT doc_id, count(*) AS n_distinct FROM sh GROUP BY doc_id)
        |SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
        |  CAST(dc.n_distinct AS BIGINT) AS n_distinct,
        |  CAST((2000000*(t.n_grams - dc.n_distinct) + t.n_grams)
        |       // (2*t.n_grams) AS DOUBLE) / 1e6 AS dup_ratio,
        |  CAST((2000000*(t.n_grams - dc.n_distinct) + t.n_grams)
        |       // (2*t.n_grams) AS DOUBLE) / 1e6 > 0.2 AS flagged
        |FROM tot t JOIN dc USING (doc_id) ORDER BY doc_id""".stripMargin,
    "c25_mixture_resample" ->
      """WITH counts AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
        |m AS (SELECT min(n_lang) AS n_min FROM counts),
        |rates AS (SELECT lang, n_lang,
        |    CASE WHEN floor(sqrt(CAST(m.n_min AS DOUBLE) / n_lang) * 65536) >= 65536 THEN 'g'
        |         ELSE lpad(lower(hex(CAST(floor(sqrt(CAST(m.n_min AS DOUBLE) / n_lang) * 65536) AS BIGINT))), 4, '0')
        |    END AS cutoff_hex
        |  FROM counts CROSS JOIN m)
        |SELECT d.doc_id, d.lang, r.n_lang, substr(md5(d.text), 1, 4) AS bucket
        |FROM documents d JOIN rates r USING (lang)
        |WHERE substr(md5(d.text), 1, 4) < r.cutoff_hex
        |ORDER BY d.doc_id""".stripMargin,
    "c23_seq_pack" ->
      """WITH t AS (SELECT doc_id, doc_id // 100 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
        |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
        |  CAST((cum_tokens - n_tokens) // 256 AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,
    // c76: first-fit-decreasing packing — a recursive CTE carries each
    // shard's open-pack remaining-capacity LIST and advances one doc per
    // iteration in the same (n_tokens desc, doc_id) order the Spark fold
    // uses; shards recurse in parallel rows. All-integer state.
    "c76_pack_ffd" ->
      """WITH RECURSIVE t AS (SELECT doc_id, doc_id // 100 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents),
        |ord AS (SELECT doc_id, shard, nt,
        |    row_number() OVER (PARTITION BY shard ORDER BY nt DESC, doc_id) AS rn
        |  FROM t),
        |rec AS (
        |  SELECT shard, CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS rem,
        |      CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS nt,
        |      CAST(NULL AS BIGINT) AS pack_id
        |    FROM (SELECT DISTINCT shard FROM ord)
        |  UNION ALL
        |  SELECT shard, rn,
        |      CASE WHEN fit IS NULL THEN list_append(rem, 256 - nt)
        |           ELSE list_transform(range(1, len(rem) + 1),
        |             i -> CASE WHEN i = fit THEN rem[i] - nt ELSE rem[i] END)
        |      END AS rem,
        |      doc_id, nt,
        |      CAST(CASE WHEN fit IS NULL THEN len(rem) ELSE fit - 1 END
        |        AS BIGINT) AS pack_id
        |    FROM (
        |      SELECT r.shard AS shard, o.rn AS rn, r.rem AS rem,
        |          o.doc_id AS doc_id, o.nt AS nt,
        |          list_filter(range(1, len(r.rem) + 1),
        |            i -> r.rem[i] >= o.nt)[1] AS fit
        |      FROM rec r JOIN ord o ON o.shard = r.shard AND o.rn = r.rn + 1))
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard, nt AS n_tokens, pack_id
        |FROM rec WHERE rn >= 1 ORDER BY doc_id""".stripMargin,
    // c77: packing-efficiency report — c76's recursive-CTE FFD assignment
    // and c23's cumulative greedy assignment, each folded to (packs,
    // waste); waste clamps straddling/oversize packs to 0 (it measures
    // PADDING). DuckDB sum(BIGINT) is HUGEINT, hence the casts.
    "c77_pack_report" ->
      """WITH RECURSIVE t AS (SELECT doc_id, doc_id // 100 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents),
        |ord AS (SELECT doc_id, shard, nt,
        |    row_number() OVER (PARTITION BY shard ORDER BY nt DESC, doc_id) AS rn
        |  FROM t),
        |rec AS (
        |  SELECT shard, CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS rem,
        |      CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS nt,
        |      CAST(NULL AS BIGINT) AS pack_id
        |    FROM (SELECT DISTINCT shard FROM ord)
        |  UNION ALL
        |  SELECT shard, rn,
        |      CASE WHEN fit IS NULL THEN list_append(rem, 256 - nt)
        |           ELSE list_transform(range(1, len(rem) + 1),
        |             i -> CASE WHEN i = fit THEN rem[i] - nt ELSE rem[i] END)
        |      END AS rem,
        |      doc_id, nt,
        |      CAST(CASE WHEN fit IS NULL THEN len(rem) ELSE fit - 1 END
        |        AS BIGINT) AS pack_id
        |    FROM (
        |      SELECT r.shard AS shard, o.rn AS rn, r.rem AS rem,
        |          o.doc_id AS doc_id, o.nt AS nt,
        |          list_filter(range(1, len(r.rem) + 1),
        |            i -> r.rem[i] >= o.nt)[1] AS fit
        |      FROM rec r JOIN ord o ON o.shard = r.shard AND o.rn = r.rn + 1)),
        |ffd_fill AS (SELECT shard, pack_id, sum(nt) AS fill
        |  FROM rec WHERE rn >= 1 GROUP BY shard, pack_id),
        |ffd_agg AS (SELECT count(*) AS ffd_packs,
        |    sum(greatest(0, 256 - fill)) AS ffd_waste FROM ffd_fill),
        |gr AS (SELECT shard, nt,
        |    (sum(nt) OVER (PARTITION BY shard ORDER BY doc_id
        |       ROWS UNBOUNDED PRECEDING) - nt) // 256 AS pack_id
        |  FROM t),
        |gr_fill AS (SELECT shard, pack_id, sum(nt) AS fill
        |  FROM gr GROUP BY shard, pack_id),
        |gr_agg AS (SELECT count(*) AS greedy_packs,
        |    sum(greatest(0, 256 - fill)) AS greedy_waste FROM gr_fill)
        |SELECT CAST(ffd_packs AS BIGINT) AS ffd_packs,
        |  CAST(ffd_waste AS BIGINT) AS ffd_waste,
        |  CAST(greedy_packs AS BIGINT) AS greedy_packs,
        |  CAST(greedy_waste AS BIGINT) AS greedy_waste,
        |  CAST(greedy_waste - ffd_waste AS BIGINT) AS waste_saved
        |FROM ffd_agg CROSS JOIN gr_agg""".stripMargin,
    "c24_decontam" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+7], ' ') AS shingle
        |       FROM tok, UNNEST(range(1, len(tk)-6)) AS u(i)),
        |bs AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
        |hits AS (SELECT s.doc_id, count(*) AS n_shared
        |         FROM sh s JOIN bs USING (shingle)
        |         WHERE s.doc_id % 50 <> 0 GROUP BY s.doc_id)
        |SELECT d.doc_id, COALESCE(h.n_shared, 0) AS n_shared,
        |  COALESCE(h.n_shared, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        |WHERE d.doc_id % 50 <> 0
        |ORDER BY d.doc_id""".stripMargin,
    // c68: eval-side contamination report — c24's shingle CTEs, folded
    // per BENCHMARK doc; sub-8-token eval docs absent in both engines
    "c68_contam_report" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+7], ' ') AS shingle
        |       FROM tok, UNNEST(range(1, len(tk)-6)) AS u(i)),
        |ev AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 = 0),
        |cs AS (SELECT doc_id AS c_doc, shingle FROM sh WHERE doc_id % 50 <> 0),
        |h AS (SELECT ev.doc_id,
        |        count(DISTINCT cs.c_doc) AS n_hit_docs,
        |        count(DISTINCT ev.shingle) AS n_hit_shingles
        |      FROM ev JOIN cs USING (shingle) GROUP BY ev.doc_id),
        |t AS (SELECT doc_id, count(*) AS n_shingles FROM ev GROUP BY doc_id)
        |SELECT t.doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
        |  CAST(COALESCE(n_hit_shingles, 0) AS BIGINT) AS n_hit_shingles,
        |  CAST(COALESCE(n_hit_docs, 0) AS BIGINT) AS n_hit_docs,
        |  CAST((2000000*COALESCE(n_hit_shingles, 0) + n_shingles)
        |       // (2*n_shingles) AS DOUBLE) / 1e6 AS leak_share_r
        |FROM t LEFT JOIN h ON t.doc_id = h.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // c27 = c24's bloom-prefiltered twin: the bloom pass only DISCARDS
    // rows the exact verify join would discard anyway (no false
    // negatives), so the correct output is identical — same oracle.
    "c27_bloom_decontam" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+7], ' ') AS shingle
        |       FROM tok, UNNEST(range(1, len(tk)-6)) AS u(i)),
        |bs AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
        |hits AS (SELECT s.doc_id, count(*) AS n_shared
        |         FROM sh s JOIN bs USING (shingle)
        |         WHERE s.doc_id % 50 <> 0 GROUP BY s.doc_id)
        |SELECT d.doc_id, COALESCE(h.n_shared, 0) AS n_shared,
        |  COALESCE(h.n_shared, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        |WHERE d.doc_id % 50 <> 0
        |ORDER BY d.doc_id""".stripMargin,
    "c28_random_projection" ->
      s"""WITH f AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x*10000)) AS f
        |  FROM embeddings)
        |SELECT vec_id, CAST(p.plane AS BIGINT) AS plane,
        |  CAST(list_dot_product(f, p.pv) AS BIGINT) AS proj
        |FROM f, (VALUES $rpPlanesValues) AS p(plane, pv)
        |ORDER BY vec_id, plane""".stripMargin,
    "c22_embed_quantize" ->
      """WITH x AS (SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
        |           FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
        |a AS (SELECT max(abs(v)) AS scale FROM x),
        |q AS (SELECT vec_id, v, least(greatest(round(v * 127 / a.scale), -127), 127) AS qv, a.scale AS scale
        |      FROM x CROSS JOIN a)
        |SELECT vec_id, count(*) AS n_dims,
        |  CAST(sum(CASE WHEN abs(qv) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_saturated,
        |  round(max(abs(v - qv * scale / 127)), 6) AS max_abs_err_r
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "c13_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |x AS (SELECT user_id, event_id, us,
        |        lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM e),
        |b AS (SELECT user_id, event_id, us,
        |        CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk FROM x),
        |s AS (SELECT user_id, us,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_no
        |      FROM b)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us
        |FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no""".stripMargin,
    // c39: DuckDB list slice [a:b] is 1-based inclusive-inclusive and
    // clamps at the list end — matching Spark's slice(arr, start, len)
    // with b = start + len - 1; `//` is DuckDB's integer division
    // (plain `/` yields DOUBLE)
    "c39_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks,
        |        unnest(generate_series(0, (len(toks) - 1) // 24)) AS chunk_id
        |      FROM t),
        |c AS (SELECT doc_id, chunk_id,
        |        toks[chunk_id * 24 + 1 : chunk_id * 24 + 32] AS chunk
        |      FROM s)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(len(chunk) AS BIGINT) AS chunk_tokens,
        |  array_to_string(chunk, ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "c40_shuffle_shard" ->
      """WITH h AS (SELECT doc_id,
        |        md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h
        |      FROM documents),
        |s AS (SELECT doc_id, h, substr(h, 1, 1) AS shard FROM h)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
        |    AS BIGINT) AS pos, h
        |FROM s ORDER BY shard, pos""".stripMargin,
    "c41_freq_score" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents),
        |vocab AS (SELECT term, count(*) AS ctf FROM tok GROUP BY term),
        |t AS (SELECT CAST(sum(ctf) AS BIGINT) AS total_tokens FROM vocab),
        |d AS (SELECT doc_id, count(*) AS n_tokens, sum(ctf) AS sum_ctf
        |      FROM tok JOIN vocab USING (term) GROUP BY doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(sum_ctf AS BIGINT) AS sum_ctf,
        |  CAST(total_tokens AS BIGINT) AS total_tokens,
        |  CAST((2000000*sum_ctf + n_tokens*total_tokens)
        |       // (2*n_tokens*total_tokens) AS DOUBLE) / 1e6 AS mean_prob_r,
        |  CAST((2000000*sum_ctf + n_tokens*total_tokens)
        |       // (2*n_tokens*total_tokens) AS DOUBLE) / 1e6 >= 0.033 AS keep
        |FROM d, t ORDER BY doc_id""".stripMargin,
    "c42_banded_sample" ->
      """WITH tok AS (SELECT doc_id, substr(md5(text), 1, 2) AS bucket,
        |        unnest(string_split(lower(text), ' ')) AS term
        |      FROM documents),
        |vocab AS (SELECT term, count(*) AS ctf FROM tok GROUP BY term),
        |t AS (SELECT CAST(sum(ctf) AS BIGINT) AS total_tokens FROM vocab),
        |d AS (SELECT doc_id, min(bucket) AS bucket, count(*) AS n_tokens,
        |        sum(ctf) AS sum_ctf
        |      FROM tok JOIN vocab USING (term) GROUP BY doc_id),
        |s AS (SELECT doc_id, bucket,
        |        CAST((2000000*sum_ctf + n_tokens*total_tokens)
        |          // (2*n_tokens*total_tokens) AS DOUBLE) / 1e6 AS mean_prob_r
        |      FROM d, t),
        |b AS (SELECT doc_id, bucket, mean_prob_r,
        |        CASE WHEN mean_prob_r >= 0.0335 THEN 'head'
        |             WHEN mean_prob_r >= 0.0330 THEN 'middle'
        |             ELSE 'tail' END AS band
        |      FROM s)
        |SELECT doc_id, band, bucket, mean_prob_r
        |FROM b
        |WHERE bucket < CASE band WHEN 'head' THEN 'g'
        |                         WHEN 'middle' THEN '80' ELSE '1a' END
        |ORDER BY doc_id""".stripMargin,
    // c43 = c18's codebook + assignment CTEs, then intra-cell pairwise
    // dominance: a vector drops iff some above-threshold cell-mate has
    // strictly lower rounded centroid-similarity (ties to the lower
    // vec_id) — SemDeDup's keep-the-far-member rule
    "c43_semantic_dedup" ->
      """WITH x AS (SELECT label, i - 1 AS pos,
        |        CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v4
        |      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
        |cb AS (SELECT label AS cell, list(CAST(sum_v4 AS DOUBLE) / 10000 / n ORDER BY pos) AS centroid
        |       FROM (SELECT label, pos, sum(v4) AS sum_v4, count(*) AS n FROM x GROUP BY label, pos)
        |       GROUP BY label),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |a AS (SELECT vec_id, v, cell,
        |        round(list_cosine_similarity(v, centroid), 6) AS ccos,
        |        row_number() OVER (PARTITION BY vec_id
        |          ORDER BY round(list_cosine_similarity(v, centroid), 6) DESC, cell ASC) AS arn
        |      FROM e CROSS JOIN cb),
        |asg AS (SELECT vec_id, v, cell, ccos FROM a WHERE arn = 1),
        |p AS (SELECT DISTINCT l.vec_id
        |      FROM asg l JOIN asg r ON l.cell = r.cell AND l.vec_id <> r.vec_id
        |      WHERE NOT isnan(round(list_cosine_similarity(l.v, r.v), 6))
        |        AND round(list_cosine_similarity(l.v, r.v), 6) >= 0.35
        |        AND (r.ccos < l.ccos OR (r.ccos = l.ccos AND r.vec_id < l.vec_id)))
        |SELECT g.vec_id, g.cell, g.ccos AS cent_r, p.vec_id IS NULL AS keep
        |FROM asg g LEFT JOIN p ON g.vec_id = p.vec_id
        |ORDER BY g.vec_id""".stripMargin,
    // c44: word counts over the corpus, then adjacent char pairs of each
    // DISTINCT word (1-based substr positions 1..len-1; range() is empty
    // for shorter words) weighted by the word's count
    "c44_bpe_pairs" ->
      """WITH wc AS (SELECT w, count(*) AS wcnt
        |      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
        |      GROUP BY w),
        |p AS (SELECT substr(w, CAST(i AS INT), 1) AS a,
        |        substr(w, CAST(i AS INT) + 1, 1) AS b, wcnt
        |      FROM wc, UNNEST(range(1, len(w))) AS u(i))
        |SELECT a, b, CAST(sum(wcnt) AS BIGINT) AS cnt
        |FROM p GROUP BY a, b
        |ORDER BY cnt DESC, a, b LIMIT 50""".stripMargin,
    // c45: fixed-point integer sums per dim (engine-exact); the 6-dp
    // renders are exact integer half-away division (the c80 rule) —
    // mean6 = intRound(200·sum_v4/(2n)), var6 from the HUGEINT
    // numerator n·Σx₄²−(Σx₄)² (≥ 0, so // ≡ half-away here)
    "c45_embed_moments" ->
      """WITH x AS (SELECT i - 1 AS pos,
        |        CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v4
        |      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
        |g AS (SELECT pos, count(*) AS n, CAST(sum(v4) AS BIGINT) AS sum_v4,
        |        sum(v4 * v4) AS sq, min(v4) AS min_v4, max(v4) AS max_v4
        |      FROM x GROUP BY pos)
        |SELECT CAST(pos AS INT) AS pos, n, sum_v4,
        |  CAST(sq AS VARCHAR) AS sum_sq4, min_v4, max_v4,
        |  CAST(CASE WHEN sum_v4 >= 0 THEN (200*sum_v4 + n) // (2*n)
        |       ELSE -((200*(-sum_v4) + n) // (2*n)) END AS DOUBLE) / 1e6
        |    AS mean_r,
        |  CAST((2*(n*sq - sum_v4*sum_v4) + 100*n*n) // (200*n*n) AS DOUBLE)
        |    / 1e6 AS var_r
        |FROM g ORDER BY pos""".stripMargin,
    // c117: the closed-form gate-markup expectation (c12's discipline —
    // Spark runs the REAL extractor over synthesized markup; the oracle
    // recomputes what extraction must produce: boilerplate lines all sit
    // under the 4-word density floor, malformed %13 docs refuse to "")
    "c117_html_extract" ->
      """SELECT doc_id,
        |  doc_id % 13 <> 0 AS well_formed,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE 1 END AS BIGINT)
        |    AS n_lines,
        |  CASE WHEN doc_id % 13 = 0 THEN ''
        |       ELSE 'intro ' || CAST(doc_id AS VARCHAR) || ' ' || text
        |            || ' & fin' END AS extracted
        |FROM documents ORDER BY doc_id""".stripMargin,
    // c118: the planted-corruption expectation — disjoint closed-form
    // plants (%11 → U+FFFD, %13 → BEL, %7 → mojibake digraph) on a
    // clean-ASCII corpus, so each count is exactly its plant
    "c118_encoding_flag" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_fffd,
        |  CAST(CASE WHEN doc_id % 11 <> 0 AND doc_id % 13 = 0
        |       THEN 1 ELSE 0 END AS BIGINT) AS n_ctrl,
        |  CAST(CASE WHEN doc_id % 11 <> 0 AND doc_id % 13 <> 0
        |       AND doc_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_moji,
        |  (doc_id % 11 <> 0 AND doc_id % 13 <> 0 AND doc_id % 7 <> 0) AS ok,
        |  CASE WHEN doc_id % 11 <> 0 AND doc_id % 13 <> 0 AND doc_id % 7 = 0
        |       THEN text || ' Ã©' ELSE text END AS repaired
        |FROM documents ORDER BY doc_id""".stripMargin,
    // c119: the composed crawl pipeline in closed form — the c117/c118
    // branch algebra (%13 refuses before its BEL can count; %11's U+FFFD
    // scrubs away in `repaired`, making cross-branch exact dups real;
    // %7's kept mojibake fails enc_ok), then c35's rule battery over the
    // composed repaired line and md5-canonical dedup among survivors
    "c119_crawl_pipeline" ->
      """WITH enc AS (SELECT doc_id,
        |    doc_id % 13 <> 0 AS well_formed,
        |    (doc_id % 13 = 0 OR (doc_id % 11 <> 0 AND doc_id % 7 <> 0)) AS enc_ok,
        |    CASE WHEN doc_id % 13 = 0 THEN ''
        |         WHEN doc_id % 11 <> 0 AND doc_id % 7 = 0
        |           THEN 'doc ' || text || ' Ã© & fin'
        |         ELSE 'doc ' || text || ' & fin' END AS repaired
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(string_split(lower(repaired), ' ')) AS term
        |        FROM enc),
        |tc AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
        |qq AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |         count(*) AS n_types, max(c) AS max_tc
        |       FROM tc GROUP BY doc_id),
        |qv AS (SELECT doc_id,
        |    n_words >= 10 AND n_words <= 1000
        |    AND CAST((2000000*n_types + n_words) // (2*n_words) AS DOUBLE)/1e6 >= 0.2
        |    AND CAST((2000000*max_tc + n_words) // (2*n_words) AS DOUBLE)/1e6 <= 0.2
        |      AS q_keep
        |  FROM qq),
        |sv AS (SELECT e.doc_id, e.repaired FROM enc e JOIN qv q USING (doc_id)
        |       WHERE e.well_formed AND e.enc_ok AND q.q_keep),
        |cn AS (SELECT md5(repaired) AS ck, min(doc_id) AS canon_id
        |       FROM sv GROUP BY md5(repaired))
        |SELECT e.doc_id, e.well_formed, e.enc_ok, q.q_keep,
        |  CASE WHEN s.doc_id IS NOT NULL THEN e.doc_id <> c.canon_id
        |       ELSE FALSE END AS is_dup,
        |  CASE WHEN s.doc_id IS NOT NULL THEN e.doc_id = c.canon_id
        |       ELSE FALSE END AS kept
        |FROM enc e JOIN qv q USING (doc_id)
        |LEFT JOIN sv s ON s.doc_id = e.doc_id
        |LEFT JOIN cn c ON c.ck = md5(s.repaired)
        |ORDER BY e.doc_id""".stripMargin,
    // c46: per-row ⟨x,v0⟩ with the ±1 dim-parity start vector, then the
    // per-dim contribution sum — every term an exact BIGINT; the
    // normalizer is the order-independent max |component|
    "c46_power_iter" ->
      """WITH x AS (SELECT vec_id, i - 1 AS pos,
        |        CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v4
        |      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
        |sv AS (SELECT vec_id,
        |         CAST(sum(CASE WHEN pos % 2 = 0 THEN v4 ELSE -v4 END) AS BIGINT) AS s
        |       FROM x GROUP BY vec_id),
        |nm AS (SELECT pos, sum(v4 * s) AS num
        |       FROM x JOIN sv USING (vec_id) GROUP BY pos),
        |mx AS (SELECT max(abs(num)) AS max_abs FROM nm)
        |SELECT CAST(pos AS INT) AS pos, CAST(num AS VARCHAR) AS num,
        |  CAST(CASE WHEN num >= 0
        |       THEN (2000000*num + max_abs) // (2*max_abs)
        |       ELSE -((2000000*(-num) + max_abs) // (2*max_abs)) END
        |       AS DOUBLE) / 1e6 AS r
        |FROM nm, mx ORDER BY pos""".stripMargin,
    // c47: the c45 moment CTEs, then a per-(vec_id, pos) join applying
    // (x - mean)/sd — Spark does the same math row-locally against a
    // broadcast struct array, no corpus shuffle
    "c47_whiten" ->
      """WITH x AS (SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS xv,
        |        CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v4
        |      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
        |g AS (SELECT pos, count(*) AS n, sum(v4) AS sum_v4, sum(v4 * v4) AS sq
        |      FROM x GROUP BY pos),
        |m AS (SELECT pos, CAST(sum_v4 AS DOUBLE) / 10000.0 / n AS mean,
        |        sqrt(CAST(sq AS DOUBLE) / 1e8 / n -
        |          (CAST(sum_v4 AS DOUBLE) / 10000.0 / n) *
        |          (CAST(sum_v4 AS DOUBLE) / 10000.0 / n)) AS sd
        |      FROM g)
        |SELECT vec_id, CAST(x.pos AS INT) AS pos,
        |  round((xv - mean) / sd, 6) AS z_r
        |FROM x JOIN m ON m.pos = x.pos
        |ORDER BY vec_id, pos""".stripMargin,
    // c48: c40's salted content hash ranks every doc; the N smallest
    // under the (rk, doc_id) total order are the sample
    "c48_sample_exact" ->
      """SELECT doc_id, lang,
        |  md5(CAST(doc_id AS VARCHAR) || ':' || text) AS rk
        |FROM documents
        |ORDER BY rk, doc_id LIMIT 100""".stripMargin,
    // c49: rebuild the derived old snapshot (every-13th absent,
    // every-11th mutated, negated-id ghost docs), full-outer join by
    // id, classify by content hash (null-safe: IS DISTINCT FROM ≡
    // Spark's <=> negation)
    "c49_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT -doc_id - 1, text FROM documents WHERE doc_id % 17 = 0),
        |o AS (SELECT doc_id, md5(text) AS old_h FROM old),
        |n AS (SELECT doc_id, md5(text) AS new_h FROM documents)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN old_h IS DISTINCT FROM new_h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    // c50: c41's score CTEs + ONE plain per-lang window — the oracle
    // needn't mirror the salted two-phase plan, only its answer
    "c50_group_budget" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents),
        |vocab AS (SELECT term, count(*) AS ctf FROM tok GROUP BY term),
        |t AS (SELECT CAST(sum(ctf) AS BIGINT) AS total_tokens FROM vocab),
        |d AS (SELECT doc_id, count(*) AS n_tokens, sum(ctf) AS sum_ctf
        |      FROM tok JOIN vocab USING (term) GROUP BY doc_id),
        |s AS (SELECT doc_id,
        |        CAST((2000000*sum_ctf + n_tokens*total_tokens)
        |          // (2*n_tokens*total_tokens) AS DOUBLE) / 1e6 AS mean_prob_r
        |      FROM d, t),
        |r AS (SELECT lang, doc_id, mean_prob_r,
        |        CAST(row_number() OVER (PARTITION BY lang
        |          ORDER BY mean_prob_r DESC, doc_id ASC) AS BIGINT) AS rnk
        |      FROM s JOIN documents USING (doc_id))
        |SELECT lang, rnk, doc_id, mean_prob_r
        |FROM r WHERE rnk <= 50 ORDER BY lang, rnk""".stripMargin,
  )
}
