"""Registry invariants: the external driver verifies only the first
50 queries() keys, so the priority window must stay <= 50 and must
contain a verified representative of every SURVEY §2 family and every
LLM-pipeline operator."""

from __future__ import annotations

import __spark_entry__ as entry_mod

# One representative per operator family that MUST sit inside the
# driver's verification window (SURVEY §2 + the pipeline table).
REQUIRED_IN_WINDOW = [
    # relational
    "tpch_q1",
    "tpch_q3",
    "tpch_q9_style",
    # event engine
    "event_agg_by_type",
    "event_agg_rollup",
    "user_purchase_totals",
    "events_with_user_dim",
    "first_events_per_user",
    # behavioral
    "session_counts",
    # round-3 rotation: previously never driver-verified
    "session_counts_5min",
    "osl_histogram_weeks",
    "funnel_within_hour",
    "next_event_transitions",
    "next_session_transitions",
    "top_paths",
    "top_event_types_per_day",
    "weekly_retention",
    "days_to_convert",
    # segments
    "segment_counts",
    "segment_algebra",
    "segment_sequence_counts",
    "textual_user_core",
    # OSL front-end
    "osl_event_agg",
    "osl_funnel_continue",
    "osl_segment_counts",
    # property / histogram / customer
    "property_counts_bucketed",
    "property_counts_between",
    "property_counts_by_segment",
    "histogram_spend_clipped",
    "histogram_by_type",
    "session_length_quantiles",
    "customer_timeline",
    # round-4 rotation: the two NTZ-affected extras from the r3
    # rotation promise + the first OSL-imperative oracle
    "histogram_weeks_since",
    "recent_purchase_totals",
    "osl_script_counter",
    # round-5 rotation (VERDICT r4 asks #1/#4): first driver rows for
    # the r4 extras + the z-order oracle; props_json_extract,
    # user_event_type_sets, top_bigrams, token_counts (all r4-green)
    # rotated to extras — text family stays represented by
    # text_stats/quality_score/lang_id/doc_fingerprint
    "osl_customer_write",
    "osl_return_first",
    "osl_agg_options",
    "zorder_first_rows",
    # pipeline (every operator family; dedup_ngram_jaccard and
    # clean_documents rotated to extras in round 4 after their r3
    # green rows — exact-jaccard is covered by dedup_exact/minhash
    # family reps, cleaning by text_stats/quality_score)
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding",
    "ann_topk",
    "ann_lsh",
    "ann_ivf",
    "text_stats",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
]


def test_priority_window_fits():
    keys = list(entry_mod.queries().keys())
    window = keys[: entry_mod._DRIVER_WINDOW]
    missing = [k for k in REQUIRED_IN_WINDOW if k not in window]
    assert not missing, f"family reps outside driver window: {missing}"


def test_oracle_keys_are_queries():
    qs = set(entry_mod.queries())
    extra = set(entry_mod.oracle_sql()) - qs
    assert not extra, f"oracle_sql keys without queries entry: {extra}"


def test_no_duplicate_keys_across_tiers():
    prio = set(entry_mod._priority_queries())
    tail = set(entry_mod._extra_queries())
    assert not prio & tail, f"duplicated keys: {prio & tail}"
