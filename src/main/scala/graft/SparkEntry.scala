package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Curate, Llm, Multimodal, Relational, XxhOracle}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or the
  * extended LLM-pipeline surface) expressed Spark-first; `oracleSql`
  * holds the equivalent DuckDB SQL over the same parquet tables.
  * Column names and types are aligned on both sides (the driver's
  * compare sorts columns by name and hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q20_star_join(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"    -> (Relational.q01_pricing_summary _),
    "q02_filter_project"     -> (Relational.q02_filter_project _),
    "q03_enum_broadcast_join" -> (Relational.q03_enum_broadcast_join _),
    "q04_strict_lookup"      -> (Relational.q04_strict_lookup _),
    "q05_lookup_ref_join"    -> (Relational.q05_lookup_ref_join _),
    "q06_reverse_ref_assembly" -> (Relational.q06_reverse_ref_assembly _),
    "q07_upsert_merge"       -> (Relational.q07_upsert_merge _),
    "q08_ledger_anti_join"   -> (Relational.q08_ledger_anti_join _),
    "q09_semi_join"          -> (Relational.q09_semi_join _),
    "q10_batch_numbering"    -> (Relational.q10_batch_numbering _),
    "q11_distinct"           -> (Relational.q11_distinct _),
    "q12_regex_frequencies"  -> (Relational.q12_regex_frequencies _),
    "q13_tempid"             -> (Relational.q13_tempid _),
    "q14_topk"               -> (Relational.q14_topk _),
    "q15_validation"         -> (Relational.q15_validation _),
    "q16_metrics_fold"       -> (Relational.q16_metrics_fold _),
    "q17_minmax_by"          -> (Relational.q17_minmax_by _),
    "q18_window_rank"        -> (Relational.q18_window_rank _),
    "q19_time_window"        -> (Relational.q19_time_window _),
    "q20_star_join"          -> (Relational.q20_star_join _),
    "q21_session_window"     -> (Relational.q21_session_window _),
    "q22_eav_self_join"      -> (Relational.q22_eav_self_join _),
    "q23_eav_count_per_attr" -> (Relational.q23_eav_count_per_attr _),
    "q24_explode_unnest"     -> (Relational.q24_explode_unnest _),
    "q25_quarantine"         -> (Relational.q25_quarantine _),
    "q26_batch_numbering_scalable" -> (Relational.q26_batch_numbering_scalable _),
    "q27_set_ops"            -> (Relational.q27_set_ops _),
    "q28_approx_distinct"    -> (Relational.q28_approx_distinct _),
    "q29_datalog_engine"     -> (Relational.q29_datalog_engine _),
    "q30_time_travel"        -> (Relational.q30_time_travel _),
    "q31_datalog_recursion"  -> (Relational.q31_datalog_recursion _),
    "q32_datalog_predicates" -> (Relational.q32_datalog_predicates _),
    "q33_pull_api"           -> (Relational.q33_pull_api _),
    "q34_asof_join"          -> (Relational.q34_asof_join _),
    "q35_range_join"         -> (Relational.q35_range_join _),
    "q36_datalog_negation"   -> (Relational.q36_datalog_negation _),
    "q37_datalog_or"         -> (Relational.q37_datalog_or _),
    "q38_datalog_collection" -> (Relational.q38_datalog_collection _),
    "q39_retraction"         -> (Relational.q39_retraction _),
    "q40_pull_in_find"       -> (Relational.q40_pull_in_find _),
    // LLM-data-pipeline surface (dedup / similarity / text / multimodal)
    "d01_exact_dedup"        -> (Llm.d01_exact_dedup _),
    "d02_minhash_signatures" -> (Llm.d02_minhash_signatures _),
    "d03_minhash_lsh_pairs"  -> (Llm.d03_minhash_lsh_pairs _),
    "d04_ngram_jaccard"      -> (Llm.d04_ngram_jaccard _),
    "d05_simhash"            -> (Llm.d05_simhash _),
    "d06_simhash_pairs"      -> (Llm.d06_simhash_pairs _),
    "d07_cosine_topk"        -> (Llm.d07_cosine_topk _),
    "d08_ann_lsh"            -> (Llm.d08_ann_lsh _),
    "d09_lang_id"            -> (Llm.d09_lang_id _),
    "d10_quality_score"      -> (Llm.d10_quality_score _),
    "d11_token_count"        -> (Llm.d11_token_count _),
    "d12_fingerprint"        -> (Llm.d12_fingerprint _),
    "d13_dedup_corpus"       -> (Llm.d13_dedup_corpus _),
    "d14_rolling_fingerprint" -> (Llm.d14_rolling_fingerprint _),
    "d15_embedding_near_dup" -> (Llm.d15_embedding_near_dup _),
    "d16_ann_ivf"            -> (Llm.d16_ann_ivf _),
    "d17_repetition"         -> (Llm.d17_repetition _),
    "d18_dedup_clusters"     -> (Llm.d18_dedup_clusters _),
    // Corpus curation (scrub / boilerplate / decontaminate / sample)
    "d19_pii_scrub"          -> (Curate.d19_pii_scrub _),
    "d20_boilerplate"        -> ((s, d) => Curate.d20_boilerplate(s, d)),
    "d21_decontaminate"      -> ((s, d) => Curate.d21_decontaminate(s, d)),
    "d22_hash_sample"        -> (Curate.d22_hash_sample _),
    "d23_corpus_stats"       -> (Curate.d23_corpus_stats _),
    "d24_pii_fixture"        -> (Curate.d24_pii_fixture _),
    "q41_bucketed_join"      -> (graft.ops.Bucketed.q41_bucketed_join _),
    "q42_click_attribution"  -> (Relational.q42_click_attribution _),
    "q43_datalog_relation_binding" -> (Relational.q43_datalog_relation_binding _),
    "q44_rollup"             -> (Relational.q44_rollup _),
    "q45_pivot"              -> (Relational.q45_pivot _),
    "q46_fulltext"           -> (Relational.q46_fulltext _),
    "q47_index_range"        -> (Relational.q47_index_range _),
    "q48_cas"                -> (Relational.q48_cas _),
    "q49_retract_entity"     -> (Relational.q49_retract_entity _),
    "q50_datalog_multi_db"   -> (Relational.q50_datalog_multi_db _),
    "q51_entity_api"         -> (Relational.q51_entity_api _),
    "q52_datalog_tx"         -> (Relational.q52_datalog_tx _),
    "q53_speculative_with"   -> (Relational.q53_speculative_with _),
    "q54_tuple_attrs"        -> (Relational.q54_tuple_attrs _),
    "q55_ensure_specs"       -> (Relational.q55_ensure_specs _),
    "q56_vaet_scan"          -> (Relational.q56_vaet_scan _),
    "q57_pull_options"       -> (Relational.q57_pull_options _),
    "q58_excision"           -> (Relational.q58_excision _),
    "q59_datalog_agg_n"      -> (Relational.q59_datalog_agg_n _),
    "q60_pull_recursion"     -> (Relational.q60_pull_recursion _),
    "q61_asof_instant"       -> (Relational.q61_asof_instant _),
    "q62_datalog_mutual"     -> (Relational.q62_datalog_mutual _),
    "q63_index_pull"         -> (Relational.q63_index_pull _),
    "q64_typed_tuples"       -> (Relational.q64_typed_tuples _),
    "q65_datalog_sample"     -> (Relational.q65_datalog_sample _),
    "q66_since"              -> (Relational.q66_since _),
    "d27_kmeans"             -> (Llm.d27_kmeans _),
    "d30_unigram_logprob"    -> (Llm.d30_unigram_logprob _),
    "d28_tfidf"              -> (Llm.d28_tfidf _),
    "d29_sequence_pack"      -> ((s, d) => Curate.d29_sequence_pack(s, d)),
    "d26_source_mix"         -> ((s, d) => Curate.d26_source_mix(s, d)),
    "d25_segment_dedup"      -> (Llm.d25_segment_dedup _),
    "d31_cluster_representatives" -> (Llm.d31_cluster_representatives _),
    "d32_chunking"           -> ((s, d) => Curate.d32_chunking(s, d)),
    "d33_gopher_rules"       -> (Curate.d33_gopher_rules _),
    "d34_novelty"            -> (Curate.d34_novelty _),
    "d35_prefix_dedup"       -> (Llm.d35_prefix_dedup _),
    "d36_shard_plan"         -> (Curate.d36_shard_plan _),
    "d37_duplicate_spans"    -> (Llm.d37_duplicate_spans _),
    "d38_curation_pipeline"  -> ((s, d) => Curate.d38_curation_pipeline(s, d)),
    "d39_temperature_mix"    -> ((s, d) => Curate.d39_temperature_mix(s, d)),
    "d40_containment"        -> ((s, d) => Curate.d40_containment(s, d)),
    "d41_bm25_topk"          -> (Llm.d41_bm25_topk _),
    "q67_attr_preds"         -> (Relational.q67_attr_preds _),
    "q68_tx_fn"              -> (Relational.q68_tx_fn _),
    "q69_seek_datoms"        -> (Relational.q69_seek_datoms _),
    "q70_query_stats"        -> (Relational.q70_query_stats _),
    "q71_filtered_db"        -> (Relational.q71_filtered_db _),
    "q72_pull_xform"         -> (Relational.q72_pull_xform _),
    "q73_tuple_maintenance"  -> (Relational.q73_tuple_maintenance _),
    "q74_nohistory"          -> (Relational.q74_nohistory _),
    "q75_incremental_hybrid" -> (Relational.q75_incremental_hybrid _),
    "q76_query_page"         -> (Relational.q76_query_page _),
    "q77_typed_values"       -> (Relational.q77_typed_values _),
    "q78_log_tx_range"       -> (Relational.q78_log_tx_range _),
    "q79_partitions"         -> (Relational.q79_partitions _),
    "q80_history_audit"      -> (Relational.q80_history_audit _),
    "q81_restore_audit"      -> (Relational.q81_restore_audit _),
    "q82_schema_alter"       -> (Relational.q82_schema_alter _),
    "q83_avet_layout"        -> (Relational.q83_avet_layout _),
    "q84_inverted_fulltext"  -> (Relational.q84_inverted_fulltext _),
    "q85_zorder_events"      -> (Relational.q85_zorder_events _),
    "q86_resample_gapfill"   -> (Relational.q86_resample_gapfill _),
    "q87_pagerank"           -> (Relational.q87_pagerank _),
    "q88_index_compaction"   -> (Relational.q88_index_compaction _),
    "d42_rrf_hybrid"         -> (Llm.d42_rrf_hybrid _),
    "d43_semdedup"           -> (Llm.d43_semdedup _),
    "d44_quality_classifier" -> (Llm.d44_quality_classifier _),
    "d45_length_quantiles"   -> (Llm.d45_length_quantiles _),
    "d46_fuzzy_join"         -> (Llm.d46_fuzzy_join _),
    "d47_weighted_sample"    -> (Llm.d47_weighted_sample _),
    "d48_bloom_decontaminate" -> ((s, d) => Curate.d48_bloom_decontaminate(s, d)),
    "d49_leakage_split"      -> (Llm.d49_leakage_split _),
    "d50_bpe_mix"            -> ((s, d) =>
      Curate.d26_source_mix(s, d, budgetTokens = 4000L, tokenizer = "bpe")),
    "d51_dsir"               -> ((s, d) => Curate.d51_dsir(s, d)),
    "d52_fertility"          -> (Curate.d52_fertility _),
    "d53_bpe_train"          -> ((s, d) => Curate.d53_bpe_train(s, d)),
    "d54_url_dedup"          -> ((s, d) => Curate.d54_url_dedup(s, d)),
    "d55_ccnet_buckets"      -> (Curate.d55_ccnet_buckets _),
    "d56_char_entropy"       -> (Curate.d56_char_entropy _),
    "d57_ngram_topk"         -> ((s, d) => Llm.d57_ngram_topk(s, d)),
    "d58_source_overlap"     -> (Curate.d58_source_overlap _),
    "d59_pq_adc"             -> (Llm.d59_pq_adc _),
    "d60_bigram_logprob"     -> (Llm.d60_bigram_logprob _),
    "d61_source_drift"       -> (Llm.d61_source_drift _),
    "d62_heavy_hitters"      -> (Llm.d62_heavy_hitters _),
    "d63_blocklist"          -> (Curate.d63_blocklist _),
    "d64_cms_heavy_users"    -> (Llm.d64_cms_heavy_users _),
    "d65_classifier_train"   -> (Llm.d65_classifier_train _),
    "d66_substring_dedup_cut" -> (Llm.d66_substring_dedup_cut _),
    "mm7_keyframes"          -> (Multimodal.mm7_keyframes _),
    "mm8_shot_segments"      -> (Multimodal.mm8_shot_segments _),
    "mm1_binary_meta"        -> (Multimodal.mm1_binary_meta _),
    "mm2_decode_features"    -> (Multimodal.mm2_decode_features _),
    "mm3_frame_sample"       -> (Multimodal.mm3_frame_sample _),
    "mm4_resize"             -> (Multimodal.mm4_resize _),
    "mm5_perceptual_hash"    -> (Multimodal.mm5_perceptual_hash _),
    "mm6_silence_segments"   -> (Multimodal.mm6_silence_segments _),
    "mm9_phash_recall"       -> (Multimodal.mm9_phash_recall _),
    "mm10_audio_match"       -> (Multimodal.mm10_audio_match _),
  )

  def oracleSql: Map[String, String] = Map(
    // Money columns are BIGINT cents (×100; ×10000 for scale-4) on both
    // sides: exact under any agg order AND comparator-stable (decimal
    // stringifies as "5.0" via DuckDB fetchdf but "5.00" via parquet).
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price, o_orderpriority
        |FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 150000.0""".stripMargin,
    "q03_enum_broadcast_join" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "q04_strict_lookup" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_misses
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q05_lookup_ref_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q06_reverse_ref_assembly" ->
      """SELECT l_orderkey, COUNT(*) AS track_count,
        |  MIN(l_linenumber) AS first_line, MAX(l_linenumber) AS last_line,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q07_upsert_merge" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(DISTINCT l_suppkey)), ',') AS supp_keys,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q08_ledger_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 < 3)""".stripMargin,
    "q09_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "q10_batch_numbering" ->
      """WITH numbered AS (
        |  SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn FROM orders)
        |SELECT 'orders-' || CAST(((rn - 1) // 100) + 1 AS VARCHAR) AS batch_id,
        |  COUNT(*) AS batch_size, MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
        |FROM numbered GROUP BY 1""".stripMargin,
    "q11_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders",
    "q12_regex_frequencies" ->
      """SELECT regexp_replace(o_orderpriority, '^\d+-', '') AS prio_name, COUNT(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "q13_tempid" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(COUNT(DISTINCT concat_ws('-', 't', l_orderkey, l_linenumber)) AS BIGINT) AS n_ids
        |FROM lineitem""".stripMargin,
    "q14_topk" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q15_validation" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN l_quantity <= 0 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
        |  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
        |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_flag,
        |  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate
        |FROM lineitem""".stripMargin,
    "q16_metrics_fold" ->
      """SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS txes, COUNT(*) AS datoms
        |FROM lineitem""".stripMargin,
    "q17_minmax_by" ->
      """SELECT o_orderpriority,
        |  first(o_orderkey ORDER BY o_totalprice ASC, o_orderkey ASC) AS cheapest_order,
        |  first(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS priciest_order
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q18_window_rank" ->
      """SELECT o_custkey, rk, o_orderkey, price FROM (
        |  SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 2""".stripMargin,
    "q19_time_window" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600000 AS hour_ms, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q20_star_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q21_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events),
        |x AS (
        |  SELECT user_id, us, value,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |y AS (
        |  SELECT user_id, us, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM x)
        |SELECT user_id, MIN(us) AS start_us, MAX(us) + 1800000000 AS end_us,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value
        |FROM y GROUP BY user_id, sess""".stripMargin,
    "q22_eav_self_join" ->
      """WITH eav AS (
        |  SELECT n_nationkey AS e, 'n_name' AS a, n_name AS v FROM nation
        |  UNION ALL
        |  SELECT n_nationkey AS e, 'n_regionkey' AS a, CAST(n_regionkey AS VARCHAR) AS v FROM nation)
        |SELECT n.e, n.v AS nation_name, r.v AS region_key
        |FROM (SELECT e, v FROM eav WHERE a = 'n_name') n
        |JOIN (SELECT e, v FROM eav WHERE a = 'n_regionkey') r USING (e)""".stripMargin,
    "q23_eav_count_per_attr" ->
      """WITH eav AS (
        |  SELECT n_nationkey AS e, 'n_name' AS a, n_name AS v FROM nation
        |  UNION ALL
        |  SELECT n_nationkey AS e, 'n_regionkey' AS a, CAST(n_regionkey AS VARCHAR) AS v FROM nation)
        |SELECT a, CAST(COUNT(DISTINCT e) AS BIGINT) AS n_entities FROM eav GROUP BY a""".stripMargin,
    "q26_batch_numbering_scalable" ->
      """WITH numbered AS (
        |  SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn FROM orders)
        |SELECT 'orders-' || CAST(((rn - 1) // 100) + 1 AS VARCHAR) AS batch_id,
        |  COUNT(*) AS batch_size, MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
        |FROM numbered GROUP BY 1""".stripMargin,
    "q29_datalog_engine" ->
      """WITH eav AS (
        |  SELECT n_nationkey AS e, 'n_name' AS a, n_name AS v FROM nation
        |  UNION ALL
        |  SELECT n_nationkey AS e, 'n_regionkey' AS a, CAST(n_regionkey AS VARCHAR) AS v FROM nation)
        |SELECT n.e, n.v AS nation_name, r.v AS region_key
        |FROM (SELECT e, v FROM eav WHERE a = 'n_name') n
        |JOIN (SELECT e, v FROM eav WHERE a = 'n_regionkey') r USING (e)""".stripMargin,
    "q30_time_travel" ->
      """WITH log AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS e,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents, 1 AS tx
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(o_orderkey AS VARCHAR),
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 2, 2
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |horizons AS (SELECT CAST(1 AS BIGINT) AS asof_tx UNION ALL SELECT CAST(2 AS BIGINT)),
        |resolved AS (
        |  SELECT h.asof_tx, l.e, l.cents,
        |    ROW_NUMBER() OVER (PARTITION BY h.asof_tx, l.e ORDER BY l.tx DESC) AS rn
        |  FROM log l JOIN horizons h ON l.tx <= h.asof_tx)
        |SELECT asof_tx, CAST(COUNT(*) AS BIGINT) AS n_entities,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM resolved WHERE rn = 1 GROUP BY asof_tx""".stripMargin,
    // q66: since = the log SUFFIX (tx > horizon), latest assert wins
    "q66_since" ->
      """WITH log AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS e,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents, 1 AS tx
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(o_orderkey AS VARCHAR),
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 2, 2
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT CAST(o_orderkey AS VARCHAR),
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) + 1, 3
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |horizons AS (SELECT CAST(0 AS BIGINT) AS since_tx
        |  UNION ALL SELECT 1 UNION ALL SELECT 2),
        |resolved AS (
        |  SELECT h.since_tx, l.e, l.cents,
        |    ROW_NUMBER() OVER (PARTITION BY h.since_tx, l.e ORDER BY l.tx DESC) AS rn
        |  FROM log l JOIN horizons h ON l.tx > h.since_tx)
        |SELECT since_tx, CAST(COUNT(*) AS BIGINT) AS n_entities,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM resolved WHERE rn = 1 GROUP BY since_tx""".stripMargin,
    "q31_datalog_recursion" ->
      """WITH RECURSIVE edges AS (
        |  SELECT 's' || CAST(s_suppkey AS VARCHAR) AS src,
        |         'n' || CAST(s_nationkey AS VARCHAR) AS dst FROM supplier
        |  UNION ALL
        |  SELECT 'n' || CAST(n_nationkey AS VARCHAR),
        |         'r' || CAST(n_regionkey AS VARCHAR) FROM nation),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT e.src, r.dst FROM edges e JOIN reach r ON e.dst = r.src)
        |SELECT src, dst FROM reach""".stripMargin,
    "q37_datalog_or" ->
      """SELECT c_custkey AS e, c_name AS name FROM customer
        |WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')""".stripMargin,
    "q38_datalog_collection" ->
      """SELECT c_custkey AS e, c_name AS name, c_mktsegment AS seg FROM customer
        |WHERE c_mktsegment IN ('HOUSEHOLD', 'BUILDING')""".stripMargin,
    "q40_pull_in_find" ->
      """SELECT n_nationkey AS e, n_name AS nation_name,
        |  CAST(n_regionkey AS VARCHAR) AS region_key
        |FROM nation""".stripMargin,
    "q39_retraction" ->
      """WITH base AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS e, o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |log AS (
        |  SELECT e, cents, TRUE AS op, 1 AS tx FROM base
        |  UNION ALL SELECT e, cents, FALSE, 2 FROM base WHERE k % 10 = 0
        |  UNION ALL SELECT e, cents * 2, TRUE, 3 FROM base WHERE k % 20 = 0),
        |horizons AS (SELECT CAST(1 AS BIGINT) AS asof_tx
        |  UNION ALL SELECT CAST(2 AS BIGINT) UNION ALL SELECT CAST(3 AS BIGINT)),
        |vals AS (
        |  SELECT h.asof_tx, l.e, l.cents,
        |    arg_max(CASE WHEN l.op THEN 1 ELSE 0 END, l.tx) AS last_op,
        |    max(CASE WHEN l.op THEN l.tx END) AS assert_tx
        |  FROM log l JOIN horizons h ON l.tx <= h.asof_tx
        |  GROUP BY h.asof_tx, l.e, l.cents),
        |picked AS (
        |  SELECT asof_tx, e, cents,
        |    ROW_NUMBER() OVER (PARTITION BY asof_tx, e ORDER BY assert_tx DESC) AS rn
        |  FROM vals WHERE last_op = 1)
        |SELECT asof_tx, CAST(COUNT(*) AS BIGINT) AS n_entities,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM picked WHERE rn = 1 GROUP BY asof_tx""".stripMargin,
    "q36_datalog_negation" ->
      """SELECT c_custkey AS e, c_name AS name FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "q35_range_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND epoch_us(c.ts) >= epoch_us(p.ts)
        | AND epoch_us(c.ts) < epoch_us(p.ts) + 3600000000
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'""".stripMargin,
    "q34_asof_join" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, arg_max(value, event_id) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.user_id, p.event_id, CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
        |  COALESCE(CAST(CAST(c.click_value AS DECIMAL(18,2)) * 100 AS BIGINT), -1) AS click_cents
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    "q33_pull_api" ->
      """SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS e,
        |  n_name AS nation_name, r_name AS region_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "q32_datalog_predicates" ->
      """SELECT n_nationkey AS e,
        |  n_name || '#' || CAST(n_regionkey AS VARCHAR) AS tagged
        |FROM nation WHERE n_regionkey < 2""".stripMargin,
    "q27_set_ops" ->
      """WITH big AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        |auto AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        |SELECT c_custkey, 'union' AS set_op FROM (SELECT c_custkey FROM big UNION SELECT c_custkey FROM auto)
        |UNION ALL
        |SELECT c_custkey, 'intersect' AS set_op FROM (SELECT c_custkey FROM big INTERSECT SELECT c_custkey FROM auto)
        |UNION ALL
        |SELECT c_custkey, 'except' AS set_op FROM (SELECT c_custkey FROM big EXCEPT SELECT c_custkey FROM auto)""".stripMargin,
    "q24_explode_unnest" ->
      """SELECT vec_id,
        |  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
        |  round(CAST(unnest(embedding) AS DOUBLE), 6) AS component
        |FROM embeddings WHERE vec_id < 50""".stripMargin,
    "q25_quarantine" ->
      """SELECT (NOT (l_quantity <= 0 OR l_quantity > 50
        |         OR l_discount < 0 OR l_discount > 1
        |         OR l_returnflag IS NULL
        |         OR l_extendedprice <= 0)) AS is_valid,
        |  COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem GROUP BY 1""".stripMargin,
    // LLM-pipeline oracles. The xxhash-dependent family (minhash/
    // simhash/LSH) is covered too: XxhOracle (further down) generates
    // a DuckDB-SQL implementation of XXH64 itself.
    "d01_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "d07_cosine_topk" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings),
        |m AS (SELECT vec_id, vec, sqrt(list_inner_product(vec, vec)) AS norm FROM n),
        |q AS (SELECT vec_id AS query_id, vec AS q_vec, norm AS q_norm FROM m WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, m.vec_id,
        |    list_inner_product(m.vec, q.q_vec) / (m.norm * q.q_norm) AS cosine
        |  FROM m CROSS JOIN q WHERE m.vec_id >= 8),
        |ranked AS (
        |  SELECT query_id, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank,
        |    cosine
        |  FROM scored)
        |SELECT query_id, rank, vec_id AS neighbor_id, round(cosine, 6) AS cosine
        |FROM ranked WHERE rank <= 5""".stripMargin,
    "d13_dedup_corpus" ->
      """SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d
        |JOIN (SELECT md5(text) AS h, min(doc_id) AS c FROM documents GROUP BY 1) x
        |  ON md5(d.text) = x.h AND d.doc_id = x.c""".stripMargin,
    "d14_rolling_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split_regex(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), ''),
        |      c -> CAST(ord(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
        |FROM documents""".stripMargin,
    "d09_lang_id" ->
      """SELECT doc_id, lang AS labeled_lang,
        |  CAST((length(lower(text)) - length(replace(lower(text), ' the ', ''))) / 5 AS BIGINT)
        |  + CAST((length(lower(text)) - length(replace(lower(text), ' and ', ''))) / 5 AS BIGINT)
        |  + CAST((length(lower(text)) - length(replace(lower(text), ' of ', ''))) / 4 AS BIGINT) AS score_en,
        |  CAST((length(lower(text)) - length(replace(lower(text), ' der ', ''))) / 5 AS BIGINT)
        |  + CAST((length(lower(text)) - length(replace(lower(text), ' und ', ''))) / 5 AS BIGINT)
        |  + CAST((length(lower(text)) - length(replace(lower(text), ' die ', ''))) / 5 AS BIGINT) AS score_de,
        |  CAST((length(lower(text)) - length(replace(lower(text), ' le ', ''))) / 4 AS BIGINT)
        |  + CAST((length(lower(text)) - length(replace(lower(text), ' et ', ''))) / 4 AS BIGINT)
        |  + CAST((length(lower(text)) - length(replace(lower(text), ' la ', ''))) / 4 AS BIGINT) AS score_fr,
        |  CAST((length(lower(text)) - length(replace(lower(text), ' el ', ''))) / 4 AS BIGINT)
        |  + CAST((length(lower(text)) - length(replace(lower(text), ' y ', ''))) / 3 AS BIGINT)
        |  + CAST((length(lower(text)) - length(replace(lower(text), ' de ', ''))) / 4 AS BIGINT) AS score_es,
        |  CASE
        |    WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
        |    WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
        |    WHEN score_fr >= score_es THEN 'fr'
        |    ELSE 'es' END AS predicted
        |FROM documents""".stripMargin,
    "d10_quality_score" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), w -> length(w) > 0) AS words
        |  FROM documents)
        |SELECT doc_id, n_len, n_punct,
        |  CAST(len(words) AS BIGINT) AS n_words,
        |  CAST(len(list_filter(words, w -> w IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS BIGINT) AS n_stop,
        |  round(n_punct / greatest(n_len, 1), 6) AS punct_ratio,
        |  round(CAST(len(list_filter(words, w -> w IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS BIGINT)
        |        / greatest(CAST(len(words) AS BIGINT), 1), 6) AS stop_ratio
        |FROM w""".stripMargin,
    "d11_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), w -> length(w) > 0)) AS BIGINT) AS n_ws_tokens,
        |  CAST(COALESCE(list_sum(list_transform(
        |    list_filter(regexp_split_to_array(text, '\s+'), w -> length(w) > 0),
        |    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_bpe_est
        |FROM documents""".stripMargin,
    "d12_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin,
    "mm1_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  'application/octet-stream' AS mime,
        |  CAST(n_chars % 640 AS BIGINT) AS width,
        |  CAST(doc_id % 480 AS BIGINT) AS height
        |FROM documents""".stripMargin,
    // The corpus is ASCII (verified: octet_length(encode(text)) =
    // length(text) for every row), so DuckDB's char-level functions
    // see exactly the bytes Spark's binary payload does.
    "mm2_decode_features" ->
      """WITH b AS (
        |  SELECT doc_id, list_transform(string_split(text, ''), c -> ord(c)) AS bs
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum(bs) AS BIGINT) AS byte_sum,
        |  CAST(len(list_filter(list_transform(range(2, len(bs)+1), i -> abs(bs[i]-bs[i-1])), d -> d > 16)) AS BIGINT) AS byte_transitions,
        |  CAST(len(bs) AS BIGINT) AS n_bytes
        |FROM b""".stripMargin,
    "mm3_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_transform(range(0, greatest(length(text)-32, 0) // 64 + 1),
        |      i -> substr(text, CAST(i*64+1 AS INT), 32)) AS frames
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(generate_subscripts(frames, 1) - 1 AS BIGINT) AS frame_idx,
        |  md5(unnest(frames)) AS frame_md5,
        |  CAST(length(unnest(frames)) AS BIGINT) AS frame_len
        |FROM f""".stripMargin,
    "mm4_resize" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    greatest(n_chars % 640, 1) AS w,
        |    greatest(doc_id % 480, 1) AS h,
        |    greatest(length(text), 1) AS len, text
        |  FROM documents)
        |SELECT doc_id, w AS src_w, h AS src_h,
        |  CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
        |  md5(array_to_string(
        |    list_transform(range(0, 64), p -> substr(text,
        |      CAST(least(((p // 8) * h // 8) * w + ((p % 8) * w // 8), len - 1) AS INT) + 1, 1)),
        |    '')) AS thumb_md5
        |FROM g""".stripMargin,
    // mm5: aHash = thumbnail bytes vs their integer mean, rendered as
    // a 64-char bitstring; clusters keyed by the hash
    "mm5_perceptual_hash" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    greatest(n_chars % 640, 1) AS w,
        |    greatest(doc_id % 480, 1) AS h,
        |    greatest(length(text), 1) AS len, text
        |  FROM documents),
        |t AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 64), p -> ord(substr(text,
        |      CAST(least(((p // 8) * h // 8) * w + ((p % 8) * w // 8), len - 1) AS INT) + 1, 1))) AS bs
        |  FROM g),
        |p AS (SELECT doc_id, bs, list_sum(bs) // 64 AS mean FROM t),
        |hh AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(bs, x -> CASE WHEN x > mean THEN '1' ELSE '0' END), '') AS phash
        |  FROM p),
        |c AS (SELECT phash, min(doc_id) AS canonical_id, count(*) AS n_copies FROM hh GROUP BY phash)
        |SELECT hh.doc_id, hh.phash, c.canonical_id, CAST(c.n_copies AS BIGINT) AS n_copies
        |FROM hh JOIN c USING (phash)""".stripMargin,
    "q28_approx_distinct" ->
      """SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  COUNT(*) AS n_rows,
        |  TRUE AS orders_ok, TRUE AS parts_ok
        |FROM lineitem""".stripMargin,
    "d04_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> length(w) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ws) = 0 THEN []
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
        |    END AS grams FROM t),
        |k AS (SELECT doc_id, grams, list_aggregate(grams, 'min') AS block FROM g WHERE len(grams) > 0)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(len(list_intersect(a.grams, b.grams)) / greatest(len(list_distinct(a.grams || b.grams)), 1), 6) AS jaccard
        |FROM k a JOIN k b ON a.block = b.block AND a.doc_id < b.doc_id""".stripMargin,
    "d17_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> length(w) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, len(ws) AS n_tokens,
        |    CASE WHEN len(ws) = 0 THEN 0 WHEN len(ws) < 3 THEN 1 ELSE len(ws) - 2 END AS total_grams,
        |    CASE WHEN len(ws) = 0 THEN 0
        |         WHEN len(ws) < 3 THEN 1
        |         ELSE len(list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
        |    END AS distinct_grams
        |  FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(total_grams AS BIGINT) AS total_grams,
        |  CAST(distinct_grams AS BIGINT) AS distinct_grams,
        |  CAST(CASE WHEN total_grams = 0 THEN 0
        |       ELSE (total_grams - distinct_grams) * 10000 // total_grams END AS BIGINT) AS rep_bp
        |FROM g""".stripMargin,
    "d18_dedup_clusters" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> length(w) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ws) = 0 THEN []
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
        |    END AS grams FROM t),
        |k AS (SELECT doc_id, grams, list_aggregate(grams, 'min') AS block FROM g WHERE len(grams) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM k a JOIN k b ON a.block = b.block AND a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.grams, b.grams)) / greatest(len(list_distinct(a.grams || b.grams)), 1), 6) >= 0.5),
        |edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.dst, r.r FROM edges e JOIN reach r ON e.src = r.id)
        |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY id""".stripMargin,
    "d31_cluster_representatives" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> length(w) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ws) = 0 THEN []
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
        |    END AS grams FROM t),
        |k AS (SELECT doc_id, grams, list_aggregate(grams, 'min') AS block FROM g WHERE len(grams) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM k a JOIN k b ON a.block = b.block AND a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.grams, b.grams)) / greatest(len(list_distinct(a.grams || b.grams)), 1), 6) >= 0.5),
        |edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.dst, r.r FROM edges e JOIN reach r ON e.src = r.id),
        |cl AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY id),
        |w AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words FROM t),
        |j AS (SELECT cl.cluster_id, cl.doc_id, w.n_words FROM cl JOIN w USING (doc_id)),
        |rep AS (
        |  SELECT cluster_id, doc_id AS rep_doc,
        |    ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY n_words DESC, doc_id ASC) AS rn
        |  FROM j),
        |agg AS (
        |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
        |    CAST(SUM(n_words) AS BIGINT) AS total_words,
        |    CAST(SUM(n_words) - MAX(n_words) AS BIGINT) AS words_dropped
        |  FROM j GROUP BY cluster_id)
        |SELECT agg.cluster_id, agg.n_members, rep.rep_doc, agg.total_words, agg.words_dropped
        |FROM agg JOIN rep USING (cluster_id) WHERE rep.rn = 1""".stripMargin,
    // xxhash-internal family: DuckDB-SQL XXH64 (generated — see
    // graft.queries.XxhOracle) gives these full value-level oracles
    "d02_minhash_signatures" -> XxhOracle.d02Sql,
    "d03_minhash_lsh_pairs" -> XxhOracle.d03Sql,
    "d05_simhash" -> XxhOracle.d05Sql,
    "d06_simhash_pairs" -> XxhOracle.d06Sql,
    "d08_ann_lsh" -> Llm.d08OracleSql,
    "d15_embedding_near_dup" -> Llm.d15OracleSql,
    "d16_ann_ivf" -> Llm.d16OracleSql,
    // Curation family: RE2-compatible regexes run verbatim in DuckDB
    // (note the 'g' flag — DuckDB replaces first-match by default)
    "d19_pii_scrub" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    regexp_replace(regexp_replace(regexp_replace(text,
        |      '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '(?i)https?://[^\s]+', '<URL>', 'g'),
        |      '(?i)\bcustomer\b', '<TOK>', 'g') AS scrubbed
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '(?i)https?://[^\s]+')) AS BIGINT) AS n_url,
        |  CAST(len(regexp_extract_all(text, '(?i)\bcustomer\b')) AS BIGINT) AS n_tok,
        |  CAST(length(scrubbed) AS BIGINT) AS clean_len,
        |  md5(scrubbed) AS clean_hash
        |FROM s""".stripMargin,
    // d24 injects synthetic PII on BOTH sides so the email/URL regexes
    // (never fired by the clean corpus — see d19) get a true cross-
    // engine parity check under the hash gate
    "d24_pii_fixture" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    text || ' Contact John.Doe+' || CAST(doc_id AS VARCHAR)
        |         || '@Example-Mail.COM or HTTPS://t.example.org/p/'
        |         || CAST(doc_id AS VARCHAR) || '?q=1&r=2 now.' AS text
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text,
        |    regexp_replace(regexp_replace(regexp_replace(text,
        |      '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '(?i)https?://[^\s]+', '<URL>', 'g'),
        |      '(?i)\bcustomer\b', '<TOK>', 'g') AS scrubbed
        |  FROM f)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '(?i)https?://[^\s]+')) AS BIGINT) AS n_url,
        |  CAST(len(regexp_extract_all(text, '(?i)\bcustomer\b')) AS BIGINT) AS n_tok,
        |  CAST(length(scrubbed) AS BIGINT) AS clean_len,
        |  md5(scrubbed) AS clean_hash
        |FROM s""".stripMargin,
    "d20_boilerplate" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> length(w) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ws) = 0 THEN []
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
        |    END AS grams FROM t),
        |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
        |b AS (SELECT gram FROM e GROUP BY gram HAVING count(*) >= 3),
        |pd AS (SELECT e.doc_id, count(*) AS n_boiler FROM e JOIN b USING (gram) GROUP BY e.doc_id)
        |SELECT g.doc_id, CAST(len(g.grams) AS BIGINT) AS n_grams,
        |  CAST(coalesce(pd.n_boiler, 0) AS BIGINT) AS n_boiler,
        |  CAST(CASE WHEN len(g.grams) = 0 THEN 0
        |       ELSE coalesce(pd.n_boiler, 0) * 10000 // len(g.grams) END AS BIGINT) AS boiler_bp
        |FROM g LEFT JOIN pd ON g.doc_id = pd.doc_id""".stripMargin,
    "d21_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, source, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> length(w) > 0) AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    CASE WHEN len(ws) = 0 THEN []
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
        |    END AS grams FROM t),
        |e AS (SELECT doc_id, source, unnest(grams) AS gram FROM g),
        |bench AS (SELECT DISTINCT gram FROM e WHERE source = 'src0'),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_contam FROM e JOIN bench USING (gram)
        |  WHERE source <> 'src0' GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(h.n_contam, 0) AS BIGINT) AS n_contam,
        |  CAST(CASE WHEN coalesce(h.n_contam, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |WHERE d.source <> 'src0'""".stripMargin,
    "d22_hash_sample" ->
      """SELECT doc_id, lang, CAST(b AS BIGINT) AS bucket FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(doc_id::VARCHAR || ':graft'), 1, 15))::BIGINT % 100 AS b,
        |    CASE WHEN lang = 'en' THEN 30 ELSE 10 END AS rate
        |  FROM documents)
        |WHERE b < rate""".stripMargin,
    "d23_corpus_stats" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), ' +')) END) AS BIGINT) AS total_tokens,
        |  CAST(quantile_cont(n_chars, 0.5) * 10 AS BIGINT) AS median_chars_x10
        |FROM documents GROUP BY source, lang""".stripMargin,
    "q41_bucketed_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q42_click_attribution" -> (
      """WITH c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id AS i_user, event_id AS imp_id, epoch_us(ts) AS imp_us
        |  FROM events WHERE event_type = 'view')
        |SELECT user_id, click_id, imp_id,
        |  CAST(click_us // 1000 AS BIGINT) AS click_ms,
        |  CAST(imp_us // 1000 AS BIGINT) AS imp_ms
        |FROM c JOIN v ON user_id = i_user
        |  AND imp_us <= click_us
        |  AND imp_us >= click_us - """.stripMargin +
        graft.streaming.Streams.attributionHorizonUs.toString),
    "q43_datalog_relation_binding" ->
      """SELECT CAST(n_nationkey AS INT) AS e, n_name AS name
        |FROM nation
        |JOIN (VALUES (5, 0), (7, 2), (10, 2)) t(tk, tr)
        |  ON n_nationkey = t.tk AND n_regionkey = t.tr""".stripMargin,
    "q44_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    // fulltext: needle "small" also occurs in the NON-fulltext
    // part/type attr ("SMALL") — the oracle only searches p_name, so a
    // hash match proves the schema gate
    "q46_fulltext" ->
      """SELECT p_partkey AS e, 'part/name' AS a, p_name AS v FROM part
        |WHERE list_contains(
        |  list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), t -> length(t) > 0),
        |  'small')""".stripMargin,
    "q47_index_range" ->
      """SELECT o_orderkey AS e,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
        |FROM orders
        |WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) >= 5000000
        |  AND CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) < 6000000""".stripMargin,
    "q48_cas" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT
        |  (SELECT COUNT(*) FROM o WHERE k % 4 = 0) AS n_accepted,
        |  (SELECT COUNT(*) FROM o WHERE k % 4 = 1) AS n_rejected,
        |  (SELECT CAST(SUM(CASE WHEN k % 4 = 0 THEN cents + 100 ELSE cents END) AS BIGINT)
        |     FROM o) AS total_cents""".stripMargin,
    "q49_retract_entity" ->
      """WITH alive_o AS (
        |  SELECT o_orderkey AS k, o_custkey AS ck,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 100 <> 0),
        |alive_l AS (
        |  SELECT l_orderkey AS k, (l_orderkey, l_linenumber, l_partkey, l_suppkey) AS lid,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qcents
        |  FROM lineitem WHERE l_orderkey % 100 <> 0)
        |SELECT 'order/price' AS a, COUNT(*) AS n_datoms,
        |  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_entities,
        |  CAST(SUM(cents) AS BIGINT) AS total_v
        |FROM alive_o
        |UNION ALL
        |SELECT 'order/line', COUNT(*), CAST(COUNT(DISTINCT k) AS BIGINT), CAST(0 AS BIGINT)
        |FROM alive_l
        |UNION ALL
        |SELECT 'line/qty', COUNT(*),
        |  CAST(COUNT(DISTINCT lid) AS BIGINT), CAST(SUM(qcents) AS BIGINT)
        |FROM alive_l
        |UNION ALL
        |SELECT 'cust/order', COUNT(*), CAST(COUNT(DISTINCT ck) AS BIGINT), CAST(0 AS BIGINT)
        |FROM alive_o""".stripMargin,
    "q50_datalog_multi_db" ->
      """SELECT n_nationkey AS e, n_name AS nation_name, r_name AS region_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "q51_entity_api" ->
      """SELECT n_nationkey AS e, n_name AS name,
        |  CAST(n_regionkey AS VARCHAR) AS region_key
        |FROM nation""".stripMargin,
    "q52_datalog_tx" ->
      """SELECT o_orderkey AS e,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |  CAST(1 AS BIGINT) AS tx
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 2,
        |  CAST(2 AS BIGINT)
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "d26_source_mix" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), ' +')) END AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT source, least(10000, 800 * 10000 // sum(n_tokens)) AS rate_bp
        |  FROM t GROUP BY source)
        |SELECT t.doc_id, t.source, CAST(r.rate_bp AS BIGINT) AS rate_bp,
        |  CAST(t.n_tokens AS BIGINT) AS n_tokens
        |FROM t JOIN r USING (source)
        |WHERE ('0x' || substr(md5(t.doc_id::VARCHAR || ':mix'), 1, 15))::BIGINT % 10000
        |      < r.rate_bp""".stripMargin,
    "d25_segment_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
        |    generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, pos // 8 AS seg_idx,
        |    string_agg(word, ' ' ORDER BY pos) AS seg
        |  FROM w GROUP BY doc_id, pos // 8),
        |c AS (SELECT seg, min(doc_id * 1000000 + seg_idx) AS canon_key FROM s GROUP BY seg)
        |SELECT s.doc_id, COUNT(*) AS n_segs,
        |  CAST(SUM(CASE WHEN s.doc_id * 1000000 + s.seg_idx = c.canon_key THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  md5(coalesce(string_agg(
        |    CASE WHEN s.doc_id * 1000000 + s.seg_idx = c.canon_key THEN s.seg END,
        |    ' ' ORDER BY s.seg_idx), '')) AS clean_hash
        |FROM s JOIN c USING (seg) GROUP BY s.doc_id""".stripMargin,
    "q53_speculative_with" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT
        |  (SELECT COUNT(*) FROM o) AS n_base,
        |  (SELECT CAST(SUM(cents) AS BIGINT) FROM o) AS base_cents,
        |  (SELECT COUNT(*) FROM o) AS n_with,
        |  (SELECT CAST(SUM(CASE WHEN k % 10 = 0 THEN cents * 2 ELSE cents END) AS BIGINT)
        |     FROM o) AS with_cents""".stripMargin,
    "q54_tuple_attrs" ->
      """SELECT '[' || CAST(o_custkey AS VARCHAR) || ' '
        |    || CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ']' AS cust_date,
        |  COUNT(*) AS n_orders, min(o_orderkey) AS first_order
        |FROM orders GROUP BY 1 HAVING COUNT(*) >= 2""".stripMargin,
    "q55_ensure_specs" ->
      """WITH o AS (
        |  SELECT o_orderkey // 100 AS tx,
        |    (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) >= 49800000
        |     OR (o_orderstatus = 'P'
        |         AND CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) < 600000)) AS bad
        |  FROM orders),
        |v AS (SELECT tx, bool_or(bad) AS tx_bad FROM o GROUP BY tx)
        |SELECT
        |  (SELECT COUNT(*) FROM v) AS n_tx,
        |  (SELECT COUNT(*) FROM v WHERE tx_bad) AS n_tx_rejected,
        |  (SELECT COUNT(*) FROM o JOIN v USING (tx) WHERE NOT tx_bad) AS n_accepted,
        |  (SELECT COUNT(*) FROM o JOIN v USING (tx) WHERE tx_bad AND NOT bad) AS n_collateral,
        |  (SELECT COUNT(*) FROM o WHERE bad) AS n_violating""".stripMargin,
    "q56_vaet_scan" ->
      """SELECT 'cust/order' AS a,
        |  COUNT(*) AS n_inbound,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_targets,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_sources
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,
    "q57_pull_options" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, o_custkey AS c,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |per AS (
        |  SELECT c, list_sort(list(CAST(cents AS VARCHAR)))[1:3] AS prices
        |  FROM o GROUP BY c)
        |SELECT 'c' || CAST(c AS VARCHAR) AS e,
        |  CASE WHEN c % 10 = 0 THEN 'name-' || CAST(c AS VARCHAR)
        |       ELSE 'unknown' END AS name,
        |  CAST(len(prices) AS BIGINT) AS n_orders,
        |  array_to_string(prices, ',') AS prices
        |FROM per""".stripMargin,
    "q58_excision" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |kept AS (SELECT * FROM o WHERE k % 20 <> 0),
        |audit AS (SELECT COUNT(*) AS n_audit FROM o WHERE k % 20 = 0)
        |SELECT CAST(1 AS BIGINT) AS asof_tx, COUNT(*) AS n_entities,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents, audit.n_audit
        |FROM kept CROSS JOIN audit GROUP BY audit.n_audit
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), COUNT(*),
        |  CAST(SUM(CASE WHEN k % 10 = 0 THEN cents * 2 ELSE cents END) AS BIGINT),
        |  audit.n_audit
        |FROM kept CROSS JOIN audit GROUP BY audit.n_audit""".stripMargin,
    "q59_datalog_agg_n" ->
      """WITH v AS (SELECT DISTINCT n_regionkey AS r, n_name AS n FROM nation)
        |SELECT CAST(r AS BIGINT) AS region_key,
        |  array_to_string(list_sort(list(n))[1:2], ',') AS two_smallest,
        |  array_to_string(list_sort(list(n))[-1:], ',') AS largest
        |FROM v GROUP BY r""".stripMargin,
    // q63: page boundary ties break on the entity key's STRING order
    // (the AVET surface's promise), so the oracle sorts the same way
    "q63_index_pull" ->
      """SELECT o_orderkey AS e,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
        |  o_orderpriority AS priority
        |FROM orders
        |WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) >= 5000000
        |ORDER BY price_cents, CAST(o_orderkey AS VARCHAR)
        |LIMIT 100""".stripMargin,
    // q64: typed-tuple round-trip — aggregates over the DECODED slots
    // must equal the base-column aggregation (a broken tuple encode or
    // decode shifts groups/sums and breaks the hash)
    "q64_typed_tuples" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_cust,
        |  CAST(sum(c_nationkey) AS BIGINT) AS nation_sum
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    // q65: the seeded draws — sample ranks distinct values by
    // md5(value) (identical hex in DuckDB and Spark); rand's draw k
    // min_by's md5(value || '#k'); both collections sort ascending
    "q65_datalog_sample" ->
      """WITH v AS (SELECT DISTINCT n_regionkey AS r, n_name AS n FROM nation),
        |s AS (SELECT r, n, row_number() OVER (PARTITION BY r ORDER BY md5(n)) AS rk FROM v),
        |samp AS (SELECT r, array_to_string(list_sort(list(n)), ',') AS sampled
        |         FROM s WHERE rk <= 3 GROUP BY r),
        |d0 AS (SELECT r, min_by(n, md5(n || '#0')) AS x0 FROM v GROUP BY r),
        |d1 AS (SELECT r, min_by(n, md5(n || '#1')) AS x1 FROM v GROUP BY r)
        |SELECT CAST(samp.r AS BIGINT) AS region_key, samp.sampled,
        |  CASE WHEN x0 <= x1 THEN x0 || ',' || x1 ELSE x1 || ',' || x0 END AS rand_drawn
        |FROM samp JOIN d0 ON samp.r = d0.r JOIN d1 ON samp.r = d1.r""".stripMargin,
    // q62: hop-a through mutually recursive rules = direct edges plus
    // the two-hop pairs reached through hop-b
    "q62_datalog_mutual" ->
      """SELECT 's' || CAST(s_suppkey AS VARCHAR) AS src,
        |       'n' || CAST(s_nationkey AS VARCHAR) AS dst
        |FROM supplier
        |UNION
        |SELECT 's' || CAST(s_suppkey AS VARCHAR),
        |       'r' || CAST(n_regionkey AS VARCHAR)
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin,
    // q61: the date→tx resolution happens engine-side (txInstant index);
    // the oracle pins the resulting state at both horizons — a wrong or
    // exclusive boundary rule lands the second group on tx 1's totals.
    // 1580515200000 = 2020-02-01T00Z, 1583798400000 = 2020-03-10T00Z.
    "q61_asof_instant" ->
      """WITH log AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS e,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents, 1 AS tx
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(o_orderkey AS VARCHAR),
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 2, 2
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |horizons AS (
        |  SELECT CAST(1580515200000 AS BIGINT) AS asof_ms, 1 AS htx
        |  UNION ALL SELECT CAST(1583798400000 AS BIGINT), 2),
        |resolved AS (
        |  SELECT h.asof_ms, l.e, l.cents,
        |    ROW_NUMBER() OVER (PARTITION BY h.asof_ms, l.e ORDER BY l.tx DESC) AS rn
        |  FROM log l JOIN horizons h ON l.tx <= h.htx)
        |SELECT asof_ms, CAST(COUNT(*) AS BIGINT) AS n_entities,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM resolved WHERE rn = 1 GROUP BY asof_ms""".stripMargin,
    // q60: recursive pull to depth 2 = two LEFT self-joins up the
    // parent chain; the depth-exhausted third level is the plain ref id
    "q60_pull_recursion" ->
      """WITH c AS (SELECT c_custkey AS k, c_name FROM customer)
        |SELECT 'c' || CAST(c.k AS VARCHAR) AS e, c.c_name AS name,
        |  p.c_name AS parent_name, g.c_name AS gp_name,
        |  CASE WHEN g.k >= 10 THEN 'c' || CAST(g.k // 10 AS VARCHAR) END AS ggp_id
        |FROM c
        |LEFT JOIN c p ON c.k >= 10 AND p.k = c.k // 10
        |LEFT JOIN c g ON p.k >= 10 AND g.k = p.k // 10""".stripMargin,
    "d30_unigram_logprob" -> Llm.d30OracleSql,
    "d32_chunking" -> Curate.d32OracleSql,
    "d33_gopher_rules" -> Curate.d33OracleSql,
    "d34_novelty" -> Curate.d34OracleSql,
    "d35_prefix_dedup" -> Llm.d35OracleSql,
    "d36_shard_plan" -> Curate.d36OracleSql,
    "d37_duplicate_spans" -> Llm.d37OracleSql,
    "d38_curation_pipeline" -> Curate.d38OracleSql,
    "d39_temperature_mix" -> Curate.d39OracleSql,
    "mm6_silence_segments" -> Multimodal.mm6OracleSql,
    "d41_bm25_topk" -> Llm.d41OracleSql,
    "d40_containment" -> Curate.d40OracleSql,
    // q67: the same predicate set over the same synthesized datoms —
    // rejects = rows failing ANY declared pred of their attr
    "q67_attr_preds" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    o_orderpriority AS pr
        |  FROM orders)
        |SELECT 'order/price' AS a, COUNT(*) AS n_datoms,
        |  CAST(SUM(CASE WHEN NOT (cents > 0 AND cents < 50000000) THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected
        |FROM o
        |UNION ALL
        |SELECT 'order/priority', COUNT(*),
        |  CAST(SUM(CASE WHEN pr = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT)
        |FROM o""".stripMargin,
    // q68: inc-balance adds 100 cents to every order divisible by 7
    "q68_tx_fn" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT COUNT(*) AS n_entities,
        |  CAST(SUM(cents + CASE WHEN k % 7 = 0 THEN 100 ELSE 0 END) AS BIGINT) AS total_cents
        |FROM o""".stripMargin,
    "d42_rrf_hybrid" -> Llm.d42OracleSql,
    "d43_semdedup" -> Llm.d43OracleSql,
    "d44_quality_classifier" -> graft.queries.XxhOracle.d44Sql,
    // q71: the redaction predicate hides only the 5-LOW priority
    // datoms; the count-per-priority over the filtered db loses that
    // one group
    "q71_filtered_db" ->
      """SELECT o_orderpriority AS priority, COUNT(*) AS n_orders
        |FROM orders WHERE o_orderpriority <> '5-LOW'
        |GROUP BY o_orderpriority""".stripMargin,
    // q72: xform applies to stored values (names upper-case), the
    // :default fills untransformed (lowercase 'unknown'); nested
    // prices parse-long, so the 2-smallest slice is NUMERIC order
    "q72_pull_xform" ->
      """WITH p AS (
        |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS e,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price
        |  FROM orders),
        |two AS (
        |  SELECT e, price, ROW_NUMBER() OVER (PARTITION BY e ORDER BY price) AS rn
        |  FROM p),
        |s AS (
        |  SELECT e, CAST(COUNT(*) AS BIGINT) AS n2, CAST(SUM(price) AS BIGINT) AS sum_price2
        |  FROM two WHERE rn <= 2 GROUP BY e),
        |nm AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS e,
        |    upper('name-' || CAST(o_custkey AS VARCHAR)) AS name
        |  FROM orders WHERE o_custkey % 10 = 0)
        |SELECT s.e, coalesce(nm.name, 'unknown') AS name, s.n2, s.sum_price2
        |FROM s LEFT JOIN nm USING (e)""".stripMargin,
    // q73: composites exist for loaded (%3) or tx2-touched (%10)
    // orders, minus retracted (%100); the day slot is the base epoch
    // day, +30 for updated (%10) orders
    "q73_tuple_maintenance" ->
      """WITH t AS (
        |  SELECT o_orderkey AS k,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS base_day,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      + CASE WHEN o_orderkey % 10 = 0 THEN 30 ELSE 0 END AS tday
        |  FROM orders
        |  WHERE (o_orderkey % 3 = 0 OR o_orderkey % 10 = 0)
        |    AND o_orderkey % 100 <> 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_tuples,
        |  CAST(sum(CASE WHEN tday <> base_day THEN 1 ELSE 0 END) AS BIGINT) AS n_shifted,
        |  CAST(sum(tday) AS BIGINT) AS total_day
        |FROM t""".stripMargin,
    // q74: expected OUTCOME per value class — heartbeat h2 survives
    // iff superseded-and-not-retracted (%2 and not %10), h1 is the
    // visible value everywhere else (incl. the %10 resurface); price
    // history passes through whole
    "q74_nohistory" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT 'order/price' AS a, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST(0 AS BIGINT) AS n_h1, CAST(0 AS BIGINT) AS n_h2
        |FROM base
        |UNION ALL
        |SELECT 'order/heartbeat', CAST(count(*) AS BIGINT),
        |  CAST(0 AS BIGINT),
        |  CAST(sum(CASE WHEN k % 2 <> 0 OR k % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN k % 2 = 0 AND k % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM base""".stripMargin,
    // q75: expected final state computed directly — price per order:
    // %20 resurfaces the base (its 2x was retracted), %5-not-%20 takes
    // the tx3 3x, %4 keeps its 2x, else base; tags: t1 always, t2 iff
    // %3 and not %6, t3 iff %7
    // q80: transitions = (tx1→tx2 on k%10=0) ∪ (tx2→tx3 on k%100=0,
    // since %100 ⊂ %10 the prev there is the 2x); txInstant =
    // 1700000000000 + tx·86400000; output sampled to k%500=0
    "q80_history_audit" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders WHERE o_orderkey % 500 = 0)
        |SELECT CAST(k AS BIGINT) AS order_key, CAST(2 AS BIGINT) AS tx,
        |  c AS prev_cents, c * 2 AS new_cents,
        |  CAST(1700000000000 + 2 * 86400000 AS BIGINT) AS tx_ms
        |FROM base WHERE k % 10 = 0
        |UNION ALL
        |SELECT CAST(k AS BIGINT), CAST(3 AS BIGINT), c * 2, c * 3,
        |  CAST(1700000000000 + 3 * 86400000 AS BIGINT)
        |FROM base WHERE k % 100 = 0""".stripMargin,
    // q81: the oracle replays the engine's visibility rule per
    // (e,a,v) — latest event wins, value visible iff it's an assert —
    // then card-one picks the max-assert-tx value; the stale retract
    // ('999' never asserted) must vanish, the %18 re-assert brings t1
    // back after the %9 retract, the %40 tx4 re-assert outranks the
    // resurfaced base. `agrees` is the in-engine cold-vs-live check,
    // expected uniformly true.
    // q82: final membership per orderkey k after the card flip at tx2
    // and the tx3/tx4 suffix — S1 iff k odd and not retracted (k%5),
    // S2 iff k even minus the k%4 set-removes, S3 iff k%3=0. The
    // unique-gate and alias metrics are the SEMANTIC expectations the
    // Spark side must compute: order/code distinct ⇒ 0 conflicts,
    // order/status as of tx2 collides on exactly {S1, S2} ⇒ 2, and
    // the old-ident alias read path must agree ⇒ 1.
    "q84_inverted_fulltext" -> Relational.q84OracleSql,
    "q85_zorder_events" -> Relational.q85OracleSql,
    "q86_resample_gapfill" -> Relational.q86OracleSql,
    "q87_pagerank" -> Relational.q87OracleSql,
    "q88_index_compaction" -> Relational.q88OracleSql,
    "q83_avet_layout" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_datoms,
        |  CAST(sum(c) AS BIGINT) AS total_cents,
        |  CAST(min(c) AS BIGINT) AS min_cents, CAST(max(c) AS BIGINT) AS max_cents
        |FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |      FROM orders)
        |WHERE c >= 5000000 AND c < 6000000""".stripMargin,
    "q82_schema_alter" ->
      """WITH st AS (
        |  SELECT o_orderkey AS k,
        |    (o_orderkey % 2 <> 0 AND o_orderkey % 5 <> 0) AS s1,
        |    (o_orderkey % 2 = 0 AND o_orderkey % 4 <> 0) AS s2,
        |    (o_orderkey % 3 = 0) AS s3
        |  FROM orders)
        |SELECT 'n_s1' AS metric, CAST(count(*) FILTER (s1) AS BIGINT) AS value FROM st
        |UNION ALL SELECT 'n_s2', CAST(count(*) FILTER (s2) AS BIGINT) FROM st
        |UNION ALL SELECT 'n_s3', CAST(count(*) FILTER (s3) AS BIGINT) FROM st
        |UNION ALL SELECT 'n_states',
        |  CAST(count(*) FILTER (s1) + count(*) FILTER (s2) + count(*) FILTER (s3) AS BIGINT) FROM st
        |UNION ALL SELECT 'n_multi',
        |  CAST(count(*) FILTER (CAST(s1 AS INT) + CAST(s2 AS INT) + CAST(s3 AS INT) >= 2) AS BIGINT) FROM st
        |UNION ALL SELECT 'uniq_code_conflicts', CAST(0 AS BIGINT)
        |UNION ALL SELECT 'uniq_status_conflicts', CAST(2 AS BIGINT)
        |UNION ALL SELECT 'alias_same', CAST(1 AS BIGINT)""".stripMargin,
    "q81_restore_audit" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, CAST(o_orderkey AS VARCHAR) AS e,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |datoms AS (
        |  SELECT e, 'order/price' AS a, CAST(c AS VARCHAR) AS v, c AS v_long,
        |    1 AS tx, true AS op FROM base
        |  UNION ALL SELECT e, 'order/price', CAST(c*2 AS VARCHAR), c*2, 2, true
        |    FROM base WHERE k % 4 = 0
        |  UNION ALL SELECT e, 'order/price', CAST(c*3 AS VARCHAR), c*3, 3, true
        |    FROM base WHERE k % 5 = 0 AND k % 20 <> 0
        |  UNION ALL SELECT e, 'order/price', CAST(c*2 AS VARCHAR), c*2, 3, false
        |    FROM base WHERE k % 20 = 0
        |  UNION ALL SELECT e, 'order/price', '999', 999, 4, false
        |    FROM base WHERE k % 11 = 0
        |  UNION ALL SELECT e, 'order/price', CAST(c*4 AS VARCHAR), c*4, 4, true
        |    FROM base WHERE k % 40 = 0
        |  UNION ALL SELECT e, 'order/tag', 't1', NULL, 1, true FROM base
        |  UNION ALL SELECT e, 'order/tag', 't2', NULL, 2, true FROM base WHERE k % 3 = 0
        |  UNION ALL SELECT e, 'order/tag', 't1', NULL, 3, false FROM base WHERE k % 9 = 0
        |  UNION ALL SELECT e, 'order/tag', 't2', NULL, 3, false FROM base WHERE k % 6 = 0
        |  UNION ALL SELECT e, 'order/tag', 't1', NULL, 4, true FROM base WHERE k % 18 = 0
        |  UNION ALL SELECT e, 'order/tag', 't2', NULL, 4, true FROM base WHERE k % 12 = 0),
        |vis AS (
        |  SELECT e, a, v, max(v_long) AS v_long,
        |    max(CASE WHEN op THEN tx END) AS atx,
        |    coalesce(max(CASE WHEN NOT op THEN tx END), 0) AS rtx
        |  FROM datoms GROUP BY e, a, v),
        |visible AS (SELECT * FROM vis WHERE atx IS NOT NULL AND atx > rtx),
        |one AS (
        |  SELECT e, a, v, v_long FROM (
        |    SELECT *, row_number() OVER (PARTITION BY e, a
        |      ORDER BY atx DESC, v DESC) AS rn
        |    FROM visible WHERE a = 'order/price') WHERE rn = 1),
        |cur AS (SELECT * FROM one
        |  UNION ALL SELECT e, a, v, v_long FROM visible WHERE a = 'order/tag')
        |SELECT a, CAST(count(*) AS BIGINT) AS n_datoms,
        |  CAST(coalesce(sum(v_long), 0) AS BIGINT) AS total_cents,
        |  CAST(sum(CASE WHEN v = 't1' THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
        |  CAST(sum(CASE WHEN v = 't2' THEN 1 ELSE 0 END) AS BIGINT) AS n_t2,
        |  true AS agrees
        |FROM cur GROUP BY a""".stripMargin,
    // q78: the [2,4) window keeps tx2 (price*2 on k%10=0, asserts) and
    // tx3 (status on k%20=0, asserts, no v_long); tx1 and the tx4
    // retracts fall outside the half-open range
    "q78_log_tx_range" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders)
        |SELECT CAST(2 AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS n_datoms,
        |  CAST(count(*) AS BIGINT) AS n_asserts, CAST(0 AS BIGINT) AS n_retracts,
        |  CAST(count(*) AS BIGINT) AS n_entities, CAST(sum(c * 2) AS BIGINT) AS sum_v
        |FROM base WHERE k % 10 = 0
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(0 AS BIGINT), CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
        |FROM base WHERE k % 20 = 0""".stripMargin,
    // q79: eid = (part_idx << 42) | t; 4398046511104 = 2^42. The five
    // user partitions take indices 5..9 in install (= segment) order.
    "q79_partitions" ->
      """WITH placed AS (
        |  SELECT o_orderkey, 5 + CASE c_mktsegment
        |      WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
        |      WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3 ELSE 4 END AS part_idx
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |w AS (
        |  SELECT part_idx,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY part_idx ORDER BY o_orderkey) AS BIGINT) AS t
        |  FROM placed),
        |e AS (
        |  SELECT part_idx, t, (CAST(part_idx AS BIGINT) << 42) | t AS eid FROM w)
        |SELECT CAST(part_idx AS BIGINT) AS part_idx,
        |  CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(min(eid) AS BIGINT) AS min_eid, CAST(max(eid) AS BIGINT) AS max_eid,
        |  (max(t) - min(t) + 1 = count(*)) AS dense,
        |  (sum(CASE WHEN (eid >> 42) = part_idx AND (eid & 4398046511103) = t
        |            THEN 1 ELSE 0 END) = count(*)) AS recovered
        |FROM e GROUP BY part_idx""".stripMargin,
    "q77_typed_values" ->
      """WITH t AS (
        |  SELECT CAST(o_orderkey AS DECIMAL(38,0)) * 10000000000000 AS bi,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,18)) AS bd,
        |    unhex(md5(o_orderstatus || CAST(o_orderkey AS VARCHAR))) AS by
        |  FROM orders)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(bi) AS VARCHAR) AS min_bigint,
        |  CAST(max(bi) AS VARCHAR) AS max_bigint,
        |  CAST(CAST(sum(bd) AS DECIMAL(38,18)) AS VARCHAR) AS sum_bigdec,
        |  min(to_base64(by)) AS min_blob_b64,
        |  max(to_base64(by)) AS max_blob_b64
        |FROM t""".stripMargin,
    "q76_query_page" ->
      """SELECT CAST(e AS BIGINT) AS order_key, CAST(cust AS BIGINT) AS cust_key,
        |  prio AS priority
        |FROM (
        |  SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS e,
        |    CAST(o_custkey AS VARCHAR) AS cust, o_orderpriority AS prio
        |  FROM orders
        |  ORDER BY cust, e, prio LIMIT 50 OFFSET 100)""".stripMargin,
    "q75_incremental_hybrid" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |price AS (
        |  SELECT k, CASE WHEN k % 20 = 0 THEN c
        |                 WHEN k % 5 = 0 THEN c * 3
        |                 WHEN k % 4 = 0 THEN c * 2
        |                 ELSE c END AS v FROM base),
        |tags AS (
        |  SELECT k, 't1' AS t FROM base
        |  UNION ALL SELECT k, 't2' FROM base WHERE k % 3 = 0 AND k % 6 <> 0
        |  UNION ALL SELECT k, 't3' FROM base WHERE k % 7 = 0)
        |SELECT 'order/price' AS a, CAST(count(*) AS BIGINT) AS n_datoms,
        |  CAST(sum(v) AS BIGINT) AS total_cents,
        |  CAST(0 AS BIGINT) AS n_t1, CAST(0 AS BIGINT) AS n_t2, CAST(0 AS BIGINT) AS n_t3
        |FROM price
        |UNION ALL
        |SELECT 'order/tag', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
        |  CAST(sum(CASE WHEN t = 't1' THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN t = 't2' THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN t = 't3' THEN 1 ELSE 0 END) AS BIGINT)
        |FROM tags""".stripMargin,
    "d45_length_quantiles" -> Llm.d45OracleSql,
    "d46_fuzzy_join" -> Llm.d46OracleSql,
    "d47_weighted_sample" -> graft.queries.XxhOracle.d47Sql,
    "d48_bloom_decontaminate" -> Curate.d48OracleSql,
    "d49_leakage_split" -> graft.queries.XxhOracle.d49Sql,
    "d50_bpe_mix" -> Curate.d50OracleSql,
    "d51_dsir" -> graft.queries.XxhOracle.d51Sql,
    "d52_fertility" -> Curate.d52OracleSql,
    "d53_bpe_train" -> graft.ops.BpeTrain.oracleSql(
      graft.ops.BpeTrain.DefaultRounds, graft.ops.BpeTrain.DefaultVocabCap),
    "mm7_keyframes" -> Multimodal.mm7OracleSql,
    "mm8_shot_segments" -> Multimodal.mm8OracleSql,
    "mm9_phash_recall" -> Multimodal.mm9OracleSql,
    "mm10_audio_match" -> Multimodal.mm10OracleSql,
    "d54_url_dedup" -> Curate.d54OracleSql,
    "d55_ccnet_buckets" -> Curate.d55OracleSql,
    "d56_char_entropy" -> Curate.d56OracleSql,
    "d57_ngram_topk" -> Llm.d57OracleSql,
    "d58_source_overlap" -> Curate.d58OracleSql,
    "d59_pq_adc" -> Llm.d59OracleSql,
    "d60_bigram_logprob" -> Llm.d60OracleSql,
    "d61_source_drift" -> Llm.d61OracleSql,
    "d62_heavy_hitters" -> Llm.d62OracleSql,
    "d63_blocklist" -> Curate.d63OracleSql,
    "d64_cms_heavy_users" -> XxhOracle.d64Sql,
    "d65_classifier_train" -> XxhOracle.d65Sql,
    "d66_substring_dedup_cut" -> Llm.d66OracleSql,
    // q69: the same two-attribute AVET union, seek from
    // (order/cust, 1490) to the index end — the 200-row page crosses
    // the attribute boundary into order/price
    "q69_seek_datoms" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    o_custkey AS ck
        |  FROM orders),
        |dat AS (
        |  SELECT 'order/price' AS a, cents AS v_long, CAST(k AS VARCHAR) AS e FROM o
        |  UNION ALL
        |  SELECT 'order/cust', ck, CAST(k AS VARCHAR) FROM o)
        |SELECT a, v_long, e FROM dat
        |WHERE a > 'order/cust' OR (a = 'order/cust' AND v_long >= 1490)
        |ORDER BY a, v_long, e LIMIT 200""".stripMargin,
    // q70: each clause's frame cardinality recomputed relationally
    "q70_query_stats" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    o_orderpriority AS pr
        |  FROM orders)
        |SELECT CAST(0 AS BIGINT) AS clause_idx, COUNT(*) AS rows_out FROM o
        |UNION ALL
        |SELECT 1, COUNT(*) FROM o WHERE cents > 20000000
        |UNION ALL
        |SELECT 2, COUNT(*) FROM o WHERE cents > 20000000 AND pr = '1-URGENT'""".stripMargin,
    "d27_kmeans" -> Llm.d27OracleSql,
    "d28_tfidf" -> Llm.d28OracleSql,
    "d29_sequence_pack" -> Curate.d29OracleSql,
    "q45_pivot" ->
      """SELECT c_mktsegment,
        |  COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS n_1,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderpriority = '1-URGENT'), 0) * 100 AS BIGINT) AS cents_1,
        |  COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS n_2,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderpriority = '2-HIGH'), 0) * 100 AS BIGINT) AS cents_2,
        |  COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_3,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderpriority = '3-MEDIUM'), 0) * 100 AS BIGINT) AS cents_3,
        |  COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS n_4,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderpriority = '4-NOT SPECIFIED'), 0) * 100 AS BIGINT) AS cents_4,
        |  COUNT(*) FILTER (o_orderpriority = '5-LOW') AS n_5,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderpriority = '5-LOW'), 0) * 100 AS BIGINT) AS cents_5
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
  )
}
