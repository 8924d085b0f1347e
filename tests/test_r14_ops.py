"""Round-14 operators: filter-ensemble agreement (pairwise
agreement + integer-exact Cohen's kappa across the cheap quality
filters). URL curation lives in tests/test_urls.py; both families'
cross-engine exactness is additionally locked by their oracle keys
in tests/test_correctness.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openset_spark.pipeline.corpus_stats import filter_agreement


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark's `div` (and
    the operator's sign-routed form), NOT Python's flooring //."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _english(i: int) -> str:
    words = (
        "the cat sat on the mat and looked at the dog that ran "
        "past the old house with a red door while birds flew over "
        "the quiet field near the river bank under a pale sky as "
        "children played games by the tall trees and wind moved "
        "softly through green leaves all day"
    ).split()
    return " ".join(words) + f" extra{i} tale"


def _flags(spark, docs, entropy_min):
    from openset_spark.pipeline.textstats import (
        char_entropy,
        gopher_quality_flags,
        repetition_signals,
    )

    g = {r.doc_id: bool(r.keep) for r in gopher_quality_flags(docs).collect()}
    rep = {
        r.doc_id: not r.flagged for r in repetition_signals(docs).collect()
    }
    e = {
        r.doc_id: float(r.entropy_bits) >= entropy_min
        for r in char_entropy(docs).collect()
    }
    ids = sorted(set(g) & set(rep) & set(e))
    return {
        "entropy": [e[i] for i in ids],
        "gopher": [g[i] for i in ids],
        "repetition": [rep[i] for i in ids],
    }


def _expected(flags, a, b):
    ka_list, kb_list = flags[a], flags[b]
    n = len(ka_list)
    bk = sum(1 for x, y in zip(ka_list, kb_list) if x and y)
    bd = sum(1 for x, y in zip(ka_list, kb_list) if not x and not y)
    ka, kb = sum(ka_list), sum(kb_list)
    po = (bk + bd) * 1_000_000 // n
    pe = (ka * kb + (n - ka) * (n - kb)) * 1_000_000 // (n * n)
    if pe >= 1_000_000:
        kappa = None
    else:
        kappa = _tdiv((po - pe) * 1_000_000, 1_000_000 - pe)
    return n, bk, bd, po, kappa


def test_filter_agreement_matches_python_replay(spark):
    """Mixed corpus (good English, token spam, short gibberish):
    every emitted pair row equals a pure-Python replay of the same
    flags with Spark's truncate-toward-zero div semantics."""
    rows = [(i, _english(i)) for i in range(4)]
    rows.append((10, "spam " * 80))  # repetition-flagged, gopher-drop
    rows.append((11, "zq xv qp mw"))  # short, gopher-drop
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        (r.filter_a, r.filter_b): r
        for r in filter_agreement(docs, entropy_min=2.0).collect()
    }
    assert set(out) == {
        ("entropy", "gopher"),
        ("entropy", "repetition"),
        ("gopher", "repetition"),
    }
    flags = _flags(spark, docs, 2.0)
    for (a, b), r in out.items():
        n, bk, bd, po, kappa = _expected(flags, a, b)
        assert (r.n_docs, r.n_both_keep, r.n_both_drop) == (n, bk, bd)
        assert r.agree_ppm == po
        assert r.kappa_ppm == kappa, (a, b)


def test_filter_agreement_negative_kappa_sign_routing(spark):
    """Perfectly anti-correlated pair -> kappa_ppm == -1_000_000
    exactly (the negative branch must truncate toward zero like the
    DuckDB oracle's sign-routed form, not floor)."""
    from openset_spark.pipeline.textstats import char_entropy

    rows = [(i, _english(i)) for i in range(2)]
    # high-entropy gibberish: distinct chars, fails gopher
    rows.append((20, "qz wx vj kp bm fd gh ln rs tc uy ae io"))
    rows.append((21, "zj qx wv pk mb df hg nl sr ct yu ea oi"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ents = {
        r.doc_id: float(r.entropy_bits)
        for r in char_entropy(docs).collect()
    }
    lo = max(ents[0], ents[1])
    hi = min(ents[20], ents[21])
    assert lo < hi, ents  # gibberish must out-entropy English here
    cut = (lo + hi) / 2
    out = {
        (r.filter_a, r.filter_b): r
        for r in filter_agreement(docs, entropy_min=cut).collect()
    }
    r = out[("entropy", "gopher")]
    # entropy keeps exactly the gopher-dropped docs and vice versa
    assert (r.n_both_keep, r.n_both_drop) == (0, 0)
    assert r.agree_ppm == 0
    assert r.kappa_ppm == -1_000_000


def test_filter_agreement_degenerate_marginal_null_kappa(spark):
    """entropy_min below every doc's entropy and an all-keep second
    filter make pe_ppm == 1e6 -> kappa NULL, agree_ppm still 1e6."""
    rows = [(i, _english(i)) for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.filter_a, r.filter_b): r
        for r in filter_agreement(docs, entropy_min=0.0).collect()
    }
    r = out[("entropy", "repetition")]  # both keep everything here
    assert r.agree_ppm == 1_000_000
    assert r.kappa_ppm is None


def test_embedding_health_positive_semantics(spark):
    """Planted dirt: null vector, wrong dim, NaN element, null
    element, all-zero vector, and clean vectors — each counted in
    exactly one audit column (zero_vec only among clean vectors by
    contract)."""
    import math

    from openset_spark.pipeline.similarity import embedding_health

    rows = [
        (1, [1.0, 2.0], 0),
        (2, [3.0, 4.0], 0),
        (3, None, 0),
        (4, [1.0, 2.0, 3.0], 0),          # wrong dim (mode is 2)
        (5, [float("nan"), 1.0], 1),
        (6, [None, 1.0], 1),
        (7, [0.0, 0.0], 1),               # clean all-zero
        (8, [float("nan"), None], 1),     # counts in nan AND null_elem
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r.label: r for r in embedding_health(df).collect()}
    a, b = out[0], out[1]
    assert (a.n_vecs, a.n_null_vec, a.n_wrong_dim) == (4, 1, 1)
    assert (a.n_with_nan, a.n_with_null_elem, a.n_zero_vec) == (0, 0, 0)
    assert (b.n_vecs, b.n_with_nan, b.n_with_null_elem) == (4, 2, 2)
    assert b.n_zero_vec == 1  # only the clean [0,0]
    assert b.n_wrong_dim == 0


def test_embedding_health_explicit_dim_and_empty(spark):
    from openset_spark.pipeline.similarity import embedding_health

    df = spark.createDataFrame(
        [(1, [1.0], 0)], "vec_id long, embedding array<double>, label int"
    )
    r = embedding_health(df, expected_dim=4).first()
    assert r.n_wrong_dim == 1
    import pytest as _pytest

    empty = spark.createDataFrame(
        [(1, None, 0)], "vec_id long, embedding array<double>, label int"
    )
    with _pytest.raises(ValueError, match="no non-null"):
        embedding_health(empty)


def test_script_profile_hand_counts(spark):
    from openset_spark.pipeline.textstats import script_profile

    rows = [
        (1, "hello мир 123"),          # 5 latin, 3 cyrillic, 3 digit
        (2, "日本語 かな カナ"),        # 3 cjk, 4 kana
        (3, "   "),                    # whitespace only
        (4, "abc €€€"),                # 3 latin, 3 other
        (5, "مرحبا"),                  # 5 arabic
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in script_profile(df).collect()}
    r = out[1]
    assert (r.n_chars, r.n_latin, r.n_cyrillic, r.n_digit) == (
        11, 5, 3, 3,
    )
    assert r.n_other == 0 and r.main_script == "latin"
    r = out[2]
    assert (r.n_cjk, r.n_hiragana_katakana) == (3, 4)
    assert r.main_script == "hiragana_katakana"
    assert out[3].n_chars == 0 and out[3].main_script == "none"
    r = out[4]
    assert (r.n_latin, r.n_other) == (3, 3)
    # 3-vs-3 tie: class order wins over 'other'
    assert r.main_script == "latin"
    assert out[5].main_script == "arabic"


def test_script_profile_zero_exchanges(spark):
    from openset_spark.pipeline.textstats import script_profile

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        script_profile(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_sentence_chunks_assignment_law(spark):
    """Hand-checked: sentences keep order, never split; chunk_id
    follows (cum-1) div budget; a budget-crossing sentence overshoots
    into the earlier chunk; punctuation-only docs emit nothing."""
    from openset_spark.pipeline.packing import sentence_chunks

    text = (
        "one two three. four five? six seven eight nine! "
        "ten eleven twelve thirteen."
    )
    df = spark.createDataFrame(
        [(1, text), (2, "..."), (3, "no punctuation tail")],
        "doc_id long, text string",
    )
    out = sentence_chunks(df, budget=5).collect()
    got = {
        (r.doc_id, r.chunk_id): (r.n_sentences, r.n_tokens, r.chunk_text)
        for r in out
    }
    # cum: 3, 5, 9, 13 -> chunk ids (cum-1)//5: 0, 0, 1, 2
    assert got[(1, 0)] == (2, 5, "one two three. four five?")
    assert got[(1, 1)] == (1, 4, "six seven eight nine!")
    assert got[(1, 2)] == (1, 4, "ten eleven twelve thirteen.")
    assert not any(d == 2 for d, _ in got)  # punctuation-only: nothing
    assert got[(3, 0)] == (1, 3, "no punctuation tail")


def test_sentence_chunks_single_exchange(spark):
    from openset_spark.pipeline.packing import sentence_chunks

    df = spark.createDataFrame(
        [(1, "a b. c d.")], "doc_id long, text string"
    )
    plan = (
        sentence_chunks(df)._jdf.queryExecution().executedPlan().toString()
    )
    # window partitioning on id serves the (id, chunk) aggregate too
    assert plan.count("Exchange hashpartitioning") == 1


def test_decayed_counts_fold_law_and_leakage(spark):
    """The docstring's store law: a partial evaluated at T1 rescales
    to T2 by the constant 0.5^((T2-T1)/hl) and composes with the
    late events' own T2 partial — equal (to float tolerance, before
    the surface rounding) to the direct T2 build. Events after `at`
    never contribute."""
    import datetime as dt
    import math

    from openset_spark.operators.events import decayed_counts

    rows = [
        (1, dt.datetime(2024, 1, 1), 10.0),
        (1, dt.datetime(2024, 1, 10), 20.0),
        (1, dt.datetime(2024, 1, 20), 40.0),
        (2, dt.datetime(2024, 1, 25), 5.0),
        (1, dt.datetime(2024, 2, 5), 99.0),  # after T2: excluded
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    t1, t2, hl = dt.datetime(2024, 1, 15), dt.datetime(2024, 2, 1), 7.0
    direct = {
        r.user_id: (r.n_events, r.decayed_events, r.decayed_value)
        for r in decayed_counts(df, at=t2, half_life_days=hl).collect()
    }
    assert direct[1][0] == 3  # the Feb 5 event is excluded
    early = {
        r.user_id: (r.decayed_events, r.decayed_value)
        for r in decayed_counts(
            df.filter(f"ts <= timestamp'{t1}'"), at=t1, half_life_days=hl
        ).collect()
    }
    late = {
        r.user_id: (r.decayed_events, r.decayed_value)
        for r in decayed_counts(
            df.filter(f"ts > timestamp'{t1}'"), at=t2, half_life_days=hl
        ).collect()
    }
    scale = 0.5 ** (((t2 - t1).total_seconds() / 86400.0) / hl)
    for u in direct:
        for i in (0, 1):
            folded = early.get(u, (0.0, 0.0))[i] * scale + late.get(
                u, (0.0, 0.0)
            )[i]
            assert abs(folded - direct[u][i + 1]) < 2e-3, (u, i)


def test_decayed_store_roundtrip_matches_direct(spark, tmp_path):
    """The stored half: per-(user, day) partials written
    day-partitioned, read back, rescaled to the evaluation time —
    equal to the direct build on all of n_events (exact) and the
    rounded decayed sums (the exp(a)*exp(b) ulp makes this the one
    tolerance fold in the store family)."""
    import datetime as dt
    import os

    from openset_spark.operators.events import (
        decayed_counts,
        decayed_from_partials,
        decayed_partials,
    )
    from openset_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    at = dt.datetime(2024, 1, 31)
    from openset_spark.pipeline.sliding import write_sliding_partials

    parts = decayed_partials(ev, half_life_days=7.0)
    store = os.path.join(str(tmp_path), "decayed")
    write_sliding_partials(parts, store, "_db")
    stored = spark.read.parquet(store).drop("_day")
    got = {
        r.user_id: (r.n_events, r.decayed_events, r.decayed_value)
        for r in decayed_from_partials(
            stored, at=at, half_life_days=7.0
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.decayed_events, r.decayed_value)
        for r in decayed_counts(ev, at=at, half_life_days=7.0).collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], u  # exact event counts
        for i in (1, 2):
            assert abs(got[u][i] - want[u][i]) <= 1e-3, (u, i)


def test_lang_script_agreement_single_scan_no_join(spark, sf_dir):
    """r15: the audit fuses lang_id's stopword hits into
    script_profile's entry projection — ONE scan of the corpus, no
    join. A second scan or a join reappearing here would double the
    read cost at corpus scale."""
    from openset_spark.pipeline.textstats import lang_script_agreement
    from openset_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        lang_script_agreement(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
