"""Registry assembly — importing this module registers every query family.

Verification-order policy (explicit, per round-1 verdict): the driver
hash-verifies the FIRST 50 registry entries per round, so ordering is part
of the evidence plan, not an import accident. ``_VERIFY_PRIORITY`` lists, in
order, the queries that most need a driver CORRECTNESS row THIS round:

- round 1 verified registration slots 1-50 (pipeline + core SQL families);
- round 2 therefore front-loads everything round 1 could not see — the whole
  extension (dedup/similarity/text/sampling/multimodal) and event/streaming
  surface plus the SQL tail — with oracle-backed queries before rows-only
  ones, so any overflow past slot 50 costs only a weaker rows-only check;
- ``pipeline_training_data_prep`` re-enters the window to prove the oracle
  HUGEINT cast fix.

Queries not named in the priority list (all driver-green in round 1) follow
in family registration order. Future rounds rotate this list so every query
is driver-verified across consecutive rounds.

ROUND-3 ROTATION PLAN (precomputed; swap into ``_VERIFY_PRIORITY`` at the
start of round 3): after round 2 the only queries with NO driver row are
the ones registered past slot 50 this round —

1. round-2 additions (oracle-backed, never driver-checked): the nine
   TPC-H completions ``q2_min_cost_supplier q7_volume_shipping
   q8_market_share q9_product_type_profit q11_important_stock
   q12_shipmode_priority q15_top_supplier q20_potential_promotion
   q21_waiting_supplier``, plus ``cdc_merge_apply sim_quantize_contract
   events_stream_enrich sample_dsir_scores text_c4_clean
   sample_token_budget catalog_analyze_stats events_hll_rollup_contract
   pipeline_data_quality join_interval_bucketed cdc_table_diff
   dedup_fuzzy_names pipeline_publish_gated agg_histogram``;
2. the demoted SQL tail (oracle-backed, never driver-checked):
   ``window_sliding_avg percentiles_exact map_from_entries_props
   posexplode_tokens udf_python_rowwise agg_listagg_ordered
   join_null_safe window_first_last window_range_frame``;
3. the rows-only sketches (driver records a weaker rows-only check, still
   worth a slot each once the above fit): ``dedup_semantic dedup_simhash
   sim_ann_ivf_topk sim_ann_lsh_topk percentiles_approx
   multimodal_frame_sample multimodal_feature_ann``;
4. fill remaining slots by re-verifying round-1 families oldest-first.

That is 23 + 9 + 8 = 40 never-checked entries — they all fit in one
50-slot window with 10 slots left for re-verification.
"""

from __future__ import annotations

# imports are side-effecting: each module fills REGISTRY on import
import split_kinesis_streams_with_glue_spark.plans.pipeline_queries  # noqa: F401
import split_kinesis_streams_with_glue_spark.plans.sql_queries  # noqa: F401
import split_kinesis_streams_with_glue_spark.plans.extension_queries  # noqa: F401
import split_kinesis_streams_with_glue_spark.plans.event_queries  # noqa: F401

from split_kinesis_streams_with_glue_spark.plans.registry import REGISTRY, QuerySpec

_VERIFY_PRIORITY: list[str] = [
    # --- SQL tail, oracle-backed (unseen by driver in round 1; the most
    # distinctive forms — siblings whose CATEGORY already has a round-1
    # driver-green row are demoted below the window for round-3 rotation) ---
    "pivot_status_by_priority",
    "unpivot_lineitem_amounts",
    "join_salted_skew",
    "pandas_udaf_weighted_avg",
    "events_timeseries_gapfill",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    # --- extension surface (SURVEY §2.6), oracle-backed ---
    "dedup_exact_doubled",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "sim_pairs_topk",
    "dedup_embedding_pairs",
    "dedup_embedding_cosine",
    "sim_ann_brute_topk",
    "text_token_counts",
    "text_tfidf_topterms",
    "sample_train_val_split",
    "sample_stratified_lang",
    "text_quality_scores",
    "text_language_id",
    "text_fingerprint",
    "multimodal_decode_meta",
    "text_winnow_chunks",
    "multimodal_resize",
    "multimodal_audio_chunks",
    # --- event/streaming surface (SURVEY T6/T7), oracle-backed ---
    "events_tumbling_counts",
    "events_sessionize",
    "events_sessionize_stateful",
    "events_stream_dedup",
    "join_asof_attribution",
    "events_cohort_retention",
    "events_stream_stream_join",
    "events_funnel",
    "events_continuous_rollup",
    # --- round-1 hash-fail, oracle fixed this round ---
    "pipeline_training_data_prep",
    # --- new this round ---
    "choice_make_struct",
    "agg_approx_distinct_error",
    "sim_ann_recall_contract",
    "percentiles_approx_contract",
    "events_session_window",  # oracle-backed as of round 2
    "sample_cap_per_source",
    "text_redact_pii",
    "dedup_paragraphs",
    "text_repetition_scores",
    # --- round-2b training-pipeline ops, oracle-backed ---
    "pipeline_pack_sequences",
    "text_decontaminate",
    "text_unigram_logprob",
    "sample_temperature_mix",
    "events_anomaly_zscore",
    # --- demoted SQL-tail siblings (categories driver-green in round 1;
    # round-3 rotation re-prioritizes these) ---
    "window_sliding_avg",
    "percentiles_exact",
    "map_from_entries_props",
    "posexplode_tokens",
    "udf_python_rowwise",
    "agg_listagg_ordered",
    "join_null_safe",
    "window_first_last",
    "window_range_frame",
    # --- rows-only (weakest check → absorb any window overflow) ---
    "dedup_semantic",
    "dedup_simhash",
    "sim_ann_ivf_topk",
    "sim_ann_lsh_topk",
    "percentiles_approx",
    "multimodal_frame_sample",
    "multimodal_feature_ann",
]


def _reorder() -> None:
    missing = [n for n in _VERIFY_PRIORITY if n not in REGISTRY]
    if missing:  # a typo here would silently drop driver coverage
        raise RuntimeError(f"_VERIFY_PRIORITY names unknown queries: {missing}")
    ordered: dict[str, QuerySpec] = {n: REGISTRY[n] for n in _VERIFY_PRIORITY}
    for name, spec in REGISTRY.items():
        ordered.setdefault(name, spec)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()


def all_queries() -> dict[str, QuerySpec]:
    return dict(REGISTRY)
