"""URL curation operators (pipeline/urls.py): canonicalization
semantics hand-checked per component (case, ports, userinfo,
trailing dot, tracking params, param order, fragments), registered-
domain extraction incl. the multi-part-TLD table, URL-level dedup
resolution, and domain stats. The cross-engine exactness of every
column is additionally locked by the url_normalize / url_dedup_keep
/ domain_stats oracle keys in tests/test_correctness.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openset_spark.pipeline.urls import (
    domain_stats,
    parse_urls,
    url_dedup_keep,
)


def _frame(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )


def _parse_one(spark, url):
    return parse_urls(_frame(spark, [url])).first()


def test_parse_normalizes_case_port_and_params(spark):
    r = _parse_one(
        spark, "HTTP://Example.COM:80/a/b?utm_source=x&b=2&a=1#frag"
    )
    assert r.scheme == "http"
    assert r.host == "example.com"
    assert r.port is None  # default port stripped
    assert r.path == "/a/b"
    assert r.query_norm == "a=1&b=2"  # tracking dropped, rest sorted
    assert r.norm_url == "http://example.com/a/b?a=1&b=2"


def test_parse_userinfo_trailing_dot_and_multipart_tld(spark):
    r = _parse_one(spark, "https://user:pw@www.Example.co.uk./path")
    assert r.host == "www.example.co.uk"
    assert r.registered_domain == "example.co.uk"
    assert r.norm_url == "https://www.example.co.uk/path"


def test_parse_nondefault_port_and_empty_path(spark):
    assert (
        _parse_one(spark, "https://example.com:8443").norm_url
        == "https://example.com:8443/"
    )
    assert (
        _parse_one(spark, "ftp://files.example.org:21/x").norm_url
        == "ftp://files.example.org/x"
    )


def test_parse_all_tracking_query_and_fragment(spark):
    r = _parse_one(spark, "https://example.com/a?fbclid=abc#sec")
    assert r.query_norm == ""
    assert r.norm_url == "https://example.com/a"


def test_parse_invalid_rows_null_out(spark):
    r = _parse_one(spark, "not a url")
    assert r.norm_url is None and r.host is None and r.scheme is None


def test_registered_domain_fallback_and_single_label(spark):
    assert (
        _parse_one(spark, "https://a.b.github.io/").registered_domain
        == "github.io"
    )
    assert (
        _parse_one(spark, "http://localhost:9000/").registered_domain
        == "localhost"
    )


def test_url_dedup_keeps_best_per_canonical(spark):
    df = spark.createDataFrame(
        [
            (1, "https://example.com/a?utm_source=x", 5),
            (2, "https://EXAMPLE.com:443/a", 9),
            (3, "https://example.com/a?b=1", 7),
            (4, "oops", 1),
        ],
        "doc_id long, url string, score long",
    )
    out = {
        r.doc_id: r.keep
        for r in url_dedup_keep(df, score_col="score").collect()
    }
    # 1 and 2 canonize identically; 2 wins on score. 3 differs
    # (distinct query), 4 is unparseable -> kept by contract.
    assert out == {1: False, 2: True, 3: True, 4: True}


def test_url_dedup_tie_breaks_to_lowest_id(spark):
    df = spark.createDataFrame(
        [(7, "https://x.org/p", 3), (2, "https://x.org/p", 3)],
        "doc_id long, url string, score long",
    )
    out = {
        r.doc_id: r.keep
        for r in url_dedup_keep(df, score_col="score").collect()
    }
    assert out == {2: True, 7: False}


def test_domain_stats_counts_and_share(spark):
    df = _frame(
        spark,
        [
            "https://a.example.com/1",
            "https://b.example.com/2?utm_source=t",
            "https://b.example.com/2",  # same canonical as above
            "https://other.org/x",
            "junk",  # excluded
        ],
    )
    rows = {
        r.registered_domain: r for r in domain_stats(df).collect()
    }
    ex = rows["example.com"]
    assert (ex.n_docs, ex.n_hosts, ex.n_urls) == (3, 2, 2)
    assert ex.share_ppm == 3 * 1_000_000 // 4
    assert rows["other.org"].share_ppm == 1_000_000 // 4


def test_url_plan_shapes(spark):
    """parse_urls is one stateless projection (zero exchanges);
    url_dedup_keep pays exactly one shuffle (the norm_url window);
    domain_stats pins the bounded per-domain frame so the corpus
    aggregation plans ONCE (no second scan subtree)."""
    df = spark.createDataFrame(
        [(1, "https://a.example.com/x?b=1&utm_s=2", 3)],
        "doc_id long, url string, score long",
    )
    p = parse_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    k = (
        url_dedup_keep(df, score_col="score")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert k.count("Exchange") == 1
    d = domain_stats(df)._jdf.queryExecution().executedPlan().toString()
    # pinned: downstream of the checkpoint only the total agg + the
    # broadcast remain — the Expand/scan subtree must not re-appear
    assert "Expand" not in d
    assert "BroadcastNestedLoopJoin" in d or "BroadcastExchange" in d


def test_extract_links_both_quote_styles_and_case(spark):
    from openset_spark.pipeline.urls import extract_links

    df = spark.createDataFrame(
        [
            (
                1,
                '<a href="https://a.com/x">x</a>'
                " <A HREF='https://b.org/y'>y</A>"
                ' <a href="/relative">r</a>',
            )
        ],
        "doc_id long, text string",
    )
    got = sorted(r.url for r in extract_links(df).collect())
    assert got == ["/relative", "https://a.com/x", "https://b.org/y"]


def test_domain_links_adjacency(spark):
    from openset_spark.pipeline.urls import domain_links

    df = spark.createDataFrame(
        [
            (
                1,
                "https://blog.example.com/post",
                '<a href="https://example.com/a">x</a>'
                " <a href='https://news.site.org/b?utm_source=f'>y</a>"
                ' <a href="/rel">rel</a>',
            ),
            (
                2,
                "https://news.site.org/index",
                '<A HREF="https://blog.example.com/post#sec">back</A>',
            ),
            (3, "https://example.com/", "no links here"),
            (
                4,
                "https://shop.example.co.uk/",
                '<a href="https://example.com/a">1</a>'
                '<a href="https://example.com/b">2</a>'
                '<a href="https://EXAMPLE.com/a">dup</a>',
            ),
        ],
        "doc_id long, url string, text string",
    )
    got = {
        (r.src_domain, r.dst_domain): (r.n_links, r.n_src_docs)
        for r in domain_links(df).collect()
    }
    assert got == {
        ("example.com", "example.com"): (1, 1),
        ("example.com", "site.org"): (1, 1),
        ("site.org", "example.com"): (1, 1),
        ("example.co.uk", "example.com"): (3, 1),
    }


def test_domain_links_single_shuffle(spark):
    from openset_spark.pipeline.urls import domain_links

    df = spark.createDataFrame(
        [(1, "https://a.com/", '<a href="https://b.com/">b</a>')],
        "doc_id long, url string, text string",
    )
    plan = (
        domain_links(df)._jdf.queryExecution().executedPlan().toString()
    )
    # the (src, dst) aggregate with a countDistinct = the standard
    # two-exchange distinct plan over ONE upstream pass — no joins
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_domain_pagerank_hand_computed(spark):
    """3-node directed graph with a dangling sink, hand-replayed in
    Python (same float order: t + d*(s + dm/n)) — mass conserves to
    1 every iteration and the operator matches the replay to 1e-12
    before its ROUND(6)."""
    from openset_spark.pipeline.urls import domain_pagerank

    edges = spark.createDataFrame(
        [("a", "b", 2), ("a", "c", 1), ("b", "c", 1)],
        "src_domain string, dst_domain string, n_links long",
    )
    got = {
        r.domain: (r.pr, r.rank)
        for r in domain_pagerank(edges, iters=3, k=10).collect()
    }
    n, d = 3, 0.85
    t = (1.0 - d) / n
    pr = {v: 1.0 / n for v in "abc"}
    w = {"a": 3, "b": 1}
    for _ in range(3):
        dm = pr["c"]  # c has no outlinks
        s = {
            "b": pr["a"] * 2 / 3,
            "c": pr["a"] * 1 / 3 + pr["b"] * 1 / 1,
        }
        pr = {
            v: t + d * (s.get(v, 0.0) + dm / float(n)) for v in "abc"
        }
    assert abs(sum(pr.values()) - 1.0) < 1e-9  # mass conservation
    for v in "abc":
        assert got[v][0] == round(pr[v], 6), (v, got[v], pr[v])
    ranked = sorted(pr, key=lambda v: (-round(pr[v], 6), v))
    assert [got[v][1] for v in ranked] == [1, 2, 3]


def test_domain_pagerank_empty_and_topk(spark):
    from openset_spark.pipeline.urls import domain_pagerank

    empty = spark.createDataFrame(
        [], "src_domain string, dst_domain string, n_links long"
    )
    assert domain_pagerank(empty).count() == 0
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)],
        "src_domain string, dst_domain string, n_links long",
    )
    top = domain_pagerank(edges, iters=2, k=2).collect()
    assert len(top) == 2 and [r.rank for r in top] == [1, 2]


_ROBOTS = (
    "# global rules\n"
    "User-agent: *\n"
    "Disallow: /private/\r\n"
    "Allow: /private/ok\n"
    "Disallow:\n"
    "\n"
    "User-agent: googlebot\n"
    "User-agent: bingbot\n"
    "Disallow: /\n"
    "\n"
    "User-agent: other\n"
    "Disallow: /other/  # trailing comment\n"
)


def _robots_frame(spark):
    return spark.createDataFrame(
        [("example.com", _ROBOTS)], "host string, text string"
    )


def test_parse_robots_star_agent(spark):
    from openset_spark.pipeline.urls import parse_robots

    rules = sorted(
        (r.allow, r.path)
        for r in parse_robots(_robots_frame(spark)).collect()
    )
    # '*' group only: empty Disallow dropped, comments stripped
    assert rules == [(False, "/private/"), (True, "/private/ok")]


def test_parse_robots_most_specific_group_wins(spark):
    from openset_spark.pipeline.urls import parse_robots

    got = sorted(
        (r.allow, r.path)
        for r in parse_robots(
            _robots_frame(spark), agent="GoogleBot"
        ).collect()
    )
    # exact group exists -> '*' block ignored entirely
    assert got == [(False, "/")]
    got2 = sorted(
        (r.allow, r.path)
        for r in parse_robots(
            _robots_frame(spark), agent="unknown-bot"
        ).collect()
    )
    assert got2 == [(False, "/private/"), (True, "/private/ok")]


def test_robots_filter_longest_match_wins(spark):
    from openset_spark.pipeline.urls import parse_robots, robots_filter

    rules = parse_robots(_robots_frame(spark))
    urls = spark.createDataFrame(
        [
            (1, "https://example.com/public/x"),
            (2, "https://example.com/private/secret"),
            (3, "https://example.com/private/ok/page"),
            (4, "https://other.org/anything"),  # no rules -> allowed
        ],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: r.crawl_allowed
        for r in robots_filter(urls, rules).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: True}


def test_robots_filter_tie_goes_to_allow(spark):
    from openset_spark.pipeline.urls import robots_filter

    rules = spark.createDataFrame(
        [("h.com", False, "/a/"), ("h.com", True, "/a/")],
        "host string, allow boolean, path string",
    )
    urls = spark.createDataFrame(
        [(1, "https://h.com/a/x")], "doc_id long, url string"
    )
    assert robots_filter(urls, rules).first().crawl_allowed is True


def test_robots_filter_wildcards_and_anchor(spark):
    """RFC 9309 wildcard matching: '*' spans, trailing '$' anchors,
    regex metachars in rule paths stay literal, specificity is the
    original pattern length and ties go to Allow."""
    from openset_spark.pipeline.urls import robots_filter

    rules = spark.createDataFrame(
        [
            ("w.com", False, "/*.pdf$"),
            ("w.com", True, "/docs/*"),
            ("w.com", False, "/docs/private*"),
            ("w.com", False, "/a(b)/"),  # metachars literal
        ],
        "host string, allow boolean, path string",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://w.com/docs/pub/x.html"),  # allow /docs/*
            (2, "https://w.com/file.pdf"),         # *.pdf$ disallow
            (3, "https://w.com/file.pdf.html"),    # $ anchors: allowed
            (4, "https://w.com/docs/private/f"),   # longer disallow
            (5, "https://w.com/docs/guide.pdf"),   # 7==7 tie -> Allow
            (6, "https://w.com/a(b)/x"),           # literal parens
            (7, "https://w.com/aXbY/x"),           # '(' not a group
        ],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: r.crawl_allowed
        for r in robots_filter(urls, rules).collect()
    }
    assert got == {
        1: True, 2: False, 3: True, 4: False, 5: True,
        6: False, 7: True,
    }


def test_curate_urls_recipe(spark):
    """robots -> canonical dedup -> domain cap, end to end: the
    disallowed URL drops first, the tracking twin collapses, and the
    domain cap keeps the best-scored survivors."""
    from openset_spark.pipeline.urls import curate_urls, parse_robots

    robots = spark.createDataFrame(
        [("e.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, text string",
    )
    rules = parse_robots(robots)
    urls = spark.createDataFrame(
        [
            (1, "https://e.com/a?utm_source=x", 5),
            (2, "https://e.com/a", 9),            # dedup winner of 1/2
            (3, "https://e.com/private/x", 99),   # robots-dropped
            (4, "https://e.com/b", 7),
            (5, "https://e.com/c", 6),
            (6, "https://other.org/z", 1),
            (7, "junk", 1),
        ],
        "doc_id long, url string, score long",
    )
    out = curate_urls(
        urls, rules=rules, score_col="score", per_domain_cap=2
    )
    kept = sorted(r.doc_id for r in out.collect())
    # e.com survivors by score: 2 (9), 4 (7) — 5 capped out;
    # other.org keeps its single URL
    assert kept == [2, 4, 6]
    no_cap = curate_urls(urls, rules=rules, score_col="score")
    assert sorted(r.doc_id for r in no_cap.collect()) == [2, 4, 5, 6]
