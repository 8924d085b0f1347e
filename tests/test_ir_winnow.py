"""IR scoring (TF-IDF / BM25) and winnowing fingerprint semantics.

The DuckDB oracle replay for the four registry keys lives in
tests/test_correctness.py (automatic — every oracle_sql() entry);
these tests pin the hand-checkable math and the paper guarantees.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openset_spark.pipeline.ir import bm25_search, tfidf_top_terms
from openset_spark.pipeline.winnow import winnow_fingerprints, winnow_matches
from openset_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_tfidf_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry durian cherry cherry"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.term): (r.tf, r.score, r.rank)
        for r in tfidf_top_terms(df, k=2).collect()
    }
    # N=3; df: apple 1, banana 2, cherry 2, durian 1
    # idf: ln(3)=1.0986, ln(1.5)=0.4055
    assert rows[(1, "apple")] == (2, 2.1972, 1)
    assert rows[(1, "banana")] == (1, 0.4055, 2)
    assert rows[(3, "cherry")] == (3, 1.2164, 1)
    assert rows[(3, "durian")] == (1, 1.0986, 2)
    assert rows[(2, "banana")][2] in (1, 2) and rows[(2, "cherry")][2] in (1, 2)


def test_tfidf_rank_tie_breaks_by_term(spark):
    # two terms with identical tf and df inside one doc: rank must be
    # alphabetical (the portable tie-break the oracle mirrors)
    df = spark.createDataFrame(
        [(1, "zebra apple"), (2, "other words")], "doc_id long, text string"
    )
    got = [
        r.term
        for r in tfidf_top_terms(df, k=2)
        .filter(F.col("doc_id") == 1)
        .orderBy("rank")
        .collect()
    ]
    assert got == ["apple", "zebra"]


def test_bm25_prefers_more_hits_and_rarer_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler filler"),
            (2, "spark filler filler filler filler filler"),
            (3, "filler filler filler filler filler filler"),
            (4, "common filler filler filler filler filler"),
            (5, "common spark filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    top = bm25_search(df, ["spark"], top_n=10).collect()
    ids = [r.doc_id for r in top]
    assert ids[0] == 1  # highest tf at equal length
    assert 3 not in ids and 4 not in ids  # no query term, no score
    # saturation: tf 3 scores less than 3x tf 1
    s = {r.doc_id: r.score for r in top}
    assert s[1] < 3 * s[2]


def test_bm25_length_normalization(spark):
    # same tf, longer doc scores lower
    df = spark.createDataFrame(
        [
            (1, "spark filler filler filler"),
            (2, "spark " + "filler " * 20),
            (3, "pad filler filler filler"),
        ],
        "doc_id long, text string",
    )
    s = {r.doc_id: r.score for r in bm25_search(df, ["spark"], top_n=10).collect()}
    assert s[1] > s[2]


def _mkdoc(words: list[str]) -> str:
    return " ".join(words)


def test_winnow_guarantee_shared_run_yields_shared_fingerprint(spark):
    # the winnowing theorem (Schleimer et al. 2003, thm 2): any shared
    # token run of length >= w + k - 1 produces at least one shared
    # selected hash in both documents
    k, w = 4, 5
    shared = [f"s{i}" for i in range(k + w - 1)]  # exactly the bound
    a = [f"a{i}" for i in range(10)] + shared + [f"A{i}" for i in range(10)]
    b = [f"b{i}" for i in range(7)] + shared + [f"B{i}" for i in range(13)]
    df = spark.createDataFrame(
        [(1, _mkdoc(a)), (2, _mkdoc(b))], "doc_id long, text string"
    )
    fps = winnow_fingerprints(df, k=k, w=w)
    h1 = {r.khash for r in fps.filter("doc_id = 1").collect()}
    h2 = {r.khash for r in fps.filter("doc_id = 2").collect()}
    assert h1 & h2, "guaranteed shared fingerprint missing"
    m = winnow_matches(df, k=k, w=w, min_shared=1).collect()
    assert [(r.id_a, r.id_b) for r in m] == [(1, 2)]


def test_winnow_no_false_disjoint_match(spark):
    # disjoint vocabularies share nothing
    df = spark.createDataFrame(
        [
            (1, _mkdoc([f"x{i}" for i in range(30)])),
            (2, _mkdoc([f"y{i}" for i in range(30)])),
        ],
        "doc_id long, text string",
    )
    assert winnow_matches(df, min_shared=1).count() == 0


def test_winnow_positional_coverage_gap_bounded(spark):
    # consecutive selected positions within a doc are at most w apart —
    # the density/coverage half of the winnowing contract
    w = 5
    docs = load_table(spark, SF, "documents").limit(50)
    fps = winnow_fingerprints(docs, k=4, w=w).collect()
    by_doc: dict[int, list[int]] = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, []).append(r.kpos)
    assert by_doc
    for doc_id, poss in by_doc.items():
        poss.sort()
        assert poss[0] <= w, (doc_id, poss[0])
        gaps = [b - a for a, b in zip(poss, poss[1:])]
        assert all(g <= w for g in gaps), (doc_id, max(gaps))


def test_winnow_matches_boilerplate_cap_bounds_output(spark):
    # 200 docs sharing one 12-token boilerplate run. The cap's contract
    # is BOUNDING the per-key quadratic blow-up, not eliminating
    # boilerplate matches: selection near the unique/boiler border
    # depends on per-doc hashes, so an interior boiler gram can be
    # selected by a sub-cap subset of docs (observed: df=33 -> 528
    # pairs) and legitimately survive. Every surviving hash contributes
    # at most C(max_hash_df, 2) pairs; dominant hashes (df=200) are
    # dropped before pairing.
    boiler = " ".join(f"bp{i}" for i in range(12))
    rows = [
        (i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f " + boiler)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_capped = winnow_matches(df, max_hash_df=50, min_shared=1).count()
    assert n_capped <= 50 * 49 // 2  # per-hash quadratic bound holds
    n_uncapped = winnow_matches(df, max_hash_df=10**9, min_shared=1).count()
    assert n_uncapped == 200 * 199 // 2  # all-pairs without the cap
    assert n_capped < n_uncapped // 10
