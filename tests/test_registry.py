"""Registry invariants: the external driver verifies only the first
50 queries() keys, so the priority window must stay <= 50 and every
SURVEY §2 / LLM-pipeline operator family must stay driver-FRESH: at
least one representative either sits in the current window (verified
this round) or was driver-green within the last 2 completed rounds
(CORRECTNESS_r*.json ledger). The window ROTATES each round
(COVERAGE.md is the cumulative ledger; tools/plan_window.py computes
the rotation), and since r12 the forced set (never-green + 2-rounds
stale) can fill all 50 slots — so the invariant is ledger freshness,
not per-window coverage. Pinning exact keys, or even per-window
family coverage, would make a correct forced rotation a failure."""

from __future__ import annotations

import __spark_entry__ as entry_mod

from tools.plan_window import load_ledger

# Operator families (SURVEY §2 + the pipeline table) -> the keys that
# can represent them. Every family must keep >= 1 member in the
# driver window through any rotation.
WINDOW_FAMILIES = {
    "relational": [
        "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q7_style",
        "tpch_q9_style", "tpch_q10_style", "tpch_q18_style", "top_customers",
    ],
    "event_agg": [
        "event_agg_by_type", "event_agg_rollup", "event_agg_by_day",
        "event_agg_two_level", "event_agg_distinct_stamps",
        "user_purchase_totals", "recent_purchase_totals",
    ],
    "event_rows": [
        "first_events_per_user", "last_purchase_per_user",
        "zorder_first_rows", "row_count_distribution",
    ],
    "dim_join": ["events_with_user_dim", "customer_timeline"],
    "sessionize": ["session_counts", "session_counts_5min", "session_stats"],
    "funnel": [
        "funnel_within_hour", "funnel_signup_purchase", "days_to_convert",
    ],
    "paths": [
        "next_event_transitions", "next_session_transitions", "top_paths",
    ],
    "retention": ["weekly_retention", "monthly_retention"],
    "segments": [
        "segment_counts", "segment_algebra", "segment_sequence_counts",
        "textual_user_core",
    ],
    "osl_declarative": [
        "osl_event_agg", "osl_funnel_continue", "osl_segment_counts",
        "osl_histogram_weeks", "osl_agg_options",
    ],
    "osl_imperative": [
        "osl_script_counter", "osl_customer_write", "osl_return_first",
    ],
    "property_counts": [
        "property_counts", "property_counts_rx", "property_counts_bucketed",
        "property_counts_between", "property_counts_by_segment",
    ],
    "histogram": [
        "histogram_spend_clipped", "histogram_by_type",
        "histogram_weeks_since", "session_length_quantiles",
        "purchases_by_quarter",
    ],
    "props_sets": ["props_json_extract", "user_event_type_sets"],
    "dedup_exact": ["dedup_exact", "dedup_exact_keep"],
    "dedup_sketch": [
        "dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
        "dedup_embedding", "substring_dup_pairs", "containment_pairs",
    ],
    "ann": ["ann_topk", "ann_lsh", "ann_ivf", "embedding_centroids"],
    "text": [
        "text_stats", "quality_score", "lang_id", "doc_fingerprint",
        "token_counts", "clean_documents", "top_bigrams",
        "repetition_signals", "char_entropy", "readability",
        "vocab_growth",
    ],
    "decontam": ["contamination_check"],
    "sampling": ["token_budget_select", "sample_per_stratum"],
    "retention_maintenance": ["retention_cull", "retention_cap"],
}


def test_every_family_is_driver_fresh():
    """Each family has a rep in the current window (verified next
    driver run) OR driver-green within the last 2 completed rounds.
    This is the rotation-safe form of per-window family coverage."""
    keys, last_green, cur = load_ledger()
    window = set(keys[: entry_mod._DRIVER_WINDOW])
    stale_floor = cur - 1  # green in round cur or cur-1 counts as fresh
    missing = [
        fam for fam, reps in WINDOW_FAMILIES.items()
        if not any(
            k in window or last_green.get(k, -10) >= stale_floor
            for k in reps
        )
    ]
    assert not missing, f"families with no fresh driver rep: {missing}"
    # ... and the family map itself must not drift from the registry
    unknown = {
        k for reps in WINDOW_FAMILIES.values() for k in reps
    } - set(keys)
    assert not unknown, f"family map names unknown keys: {unknown}"


def test_oracle_keys_are_queries():
    qs = set(entry_mod.queries())
    extra = set(entry_mod.oracle_sql()) - qs
    assert not extra, f"oracle_sql keys without queries entry: {extra}"


def test_no_duplicate_keys_across_tiers():
    prio = set(entry_mod._priority_queries())
    tail = set(entry_mod._extra_queries())
    assert not prio & tail, f"duplicated keys: {prio & tail}"
