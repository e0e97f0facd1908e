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

Queries not named in the priority list (all driver-green in a past round)
follow in family registration order. Each round the list is REGENERATED
from the actual never-checked set — ``set(REGISTRY) - keys(CORRECTNESS_r*)``
— never hand-maintained: round 2's precomputed plan drifted stale (claimed
40 never-checked; the true count after the late round-2 commits was 54) and
``tests/test_registry_rotation.py`` now fails the suite if the window would
leave an oracle-backed query unverified.

ROUND-4 WINDOW (derived by set-diff against CORRECTNESS_r01+r02+r03 — 25
never-checked entries: 18 oracle-backed ``since=3`` + 7 rows-only — plus
one previously-errored query and 24 staleness re-verifications):

1. the 18 oracle-backed round-3 operators that overflowed round 3's
   window (the rotation test's planned one-round wait) — the layout /
   Z-order family as a set, the derived-state streamers
   (space-saving top-k, CMS heavy hitters, quantile sketch), the
   quadratic-oracle dedup checks (``dedup_fuzzy_names_k2``,
   ``pipeline_entity_resolution``), and the sampling/quality/profile/
   time-travel tail;
2. ``agg_listagg_ordered`` — round 3's single red row was a harness
   artifact (pandas cannot canonicalize an ``array<string>`` column);
   the array is now emitted as JSON text on both sides, so this
   re-entry must come back green;
3. the 7 never-checked rows-only sketches (inside the window so the
   frontload invariant holds; several are upgraded to oracle-backed
   contracts this round);
4. 24 staleness re-verifications — the core families last driver-checked
   in round 1 (CDC compaction, stream split, cube/rollup/grouping-sets,
   the whole join family, windows, set ops) so every green claim rests on
   evidence at most two rounds old. The other 25 round-1-only queries
   (scan/format/choice/scalar-func/subquery tails) rotate in next round.

New round-4 queries are appended AFTER the window, tagged ``since=4`` —
the "brand-new queries may wait one round" exemption both rotation tests
encode.

ROUND-5 ROTATION PRECOMPUTE (for the next regeneration): round 4
registered 39 new oracle-backed ``since=4`` queries past the window —
all already fresh-process-verified against DuckDB locally (SURVEY.md
§11 evidence summary), but none will have a driver CORRECTNESS row
until round 5. When CORRECTNESS_r04.json lands, regenerate
``_VERIFY_PRIORITY`` from the set-diff as usual: the 39 plus the
stalest earlier-round re-verifications fill the 50 slots; the overflow
waits one round per the standing policy.
"""

from __future__ import annotations

# imports are side-effecting: each module fills REGISTRY on import
import split_kinesis_streams_with_glue_spark.plans.pipeline_queries  # noqa: F401
import split_kinesis_streams_with_glue_spark.plans.sql_queries  # noqa: F401
import split_kinesis_streams_with_glue_spark.plans.extension_queries  # noqa: F401
import split_kinesis_streams_with_glue_spark.plans.event_queries  # noqa: F401
import split_kinesis_streams_with_glue_spark.plans.scale_queries  # noqa: F401

from split_kinesis_streams_with_glue_spark.plans.registry import REGISTRY, QuerySpec

_VERIFY_PRIORITY: list[str] = [
    # --- the 18 oracle-backed round-3 operators that waited one round ---
    # layout/Z-order family verified as a set: bit-exact Morton oracles +
    # the pruned-read == full-scan-filter equivalence, cross-engine
    "layout_zorder_key",
    "layout_zorder3_key",
    "layout_stats_prune",
    "maintenance_compact_files",
    # derived-state streamers: sketch tables answering without fact rescans
    "events_stream_topk",
    "events_heavy_hitters_contract",
    "events_quantile_sketch_contract",
    # quadratic-oracle dedup evidence: blocking misses nothing
    "dedup_fuzzy_names_k2",
    "pipeline_entity_resolution",
    "dedup_pagerank_centrality",
    # decontamination / sampling / quality / profiling / time travel
    "text_bloom_decontaminate",
    "sample_cluster_safe_split",
    "sample_weighted_pps",
    "quality_k_anonymity",
    "profile_documents",
    "pipeline_publish_time_travel",
    "agg_salted_skew",
    "events_ewma_trend",
    # --- round 3's only red row: array<string> broke the driver's pandas
    # canonicalizer; re-enters with the array emitted as JSON text ---
    "agg_listagg_ordered",
    # --- never-checked rows-only sketches (several upgraded to
    # oracle-backed contracts this round) ---
    "dedup_semantic",
    "dedup_simhash",
    "sim_ann_ivf_topk",
    "sim_ann_lsh_topk",
    "percentiles_approx",
    "multimodal_frame_sample",
    "multimodal_feature_ann",
    # --- staleness re-verification: last driver-checked in round 1 ---
    "cdc_compact_customer",
    "stream_split_customer",
    "q1_pricing_summary",
    "agg_cube",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_count_distinct",
    "agg_stats",
    "join_broadcast_dims",
    "join_left_with_empty",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross_small",
    "join_range_events",
    "window_rank_topn",
    "window_lag_lead",
    "window_running_sum",
    "window_ntile",
    "topk_orders",
    "set_union_all",
    "set_intersect",
    "set_except",
    "set_except_all",
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
