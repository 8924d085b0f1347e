"""URL curation operators — the provenance-keyed front end of a
crawl pipeline (FineWeb/CCNet shape: URL canonicalization and
URL-level dedup run BEFORE any content pass, because a crawler
revisits the same page under utm-tagged / reordered-query / default-
port spellings and content dedup should never pay for those).

Reference parity: the reference engine has no URL operators (its
domain is product events); this module is part of the §2.8
LLM-training-data surface the build brief adds beyond the reference.

Design rules (the pii.py precedent): every pattern sits in the regex
subset Java regex and RE2 read identically — no backrefs, no
lookaround — and all derived values are strings/integers, so the
DuckDB oracle replays every column byte-for-byte. Everything is one
stateless projection (whole-stage codegen, no UDFs, no shuffle);
only url_dedup_keep and domain_stats aggregate, each with exactly
one shuffle on its natural key.

At 100 TB: parsing is embarrassingly parallel; url_dedup_keep
shuffles on norm_url (key space ~ page count; a mega-duplicated URL
is bounded by its own duplicate count, the skew the operator
removes); domain_stats shuffles on registered_domain and its
share denominator rides a broadcast one-row total, never a global
window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# groups: 1 scheme, 2 authority, 3 path, 4 query (no '?'), 5 fragment.
# (?s) makes the fragment's .* consume newlines, which makes the
# pattern TOTAL for any string matching ABS_URL_PREFIX_RE: the char
# classes already match \n, so prefix-match <=> full-match. That
# equivalence is what lets operators pre-filter on the CHEAP prefix
# regex against the raw column instead of post-filtering a parsed
# column — a post-parse filter gets predicate-pushed below the
# staged projections and FilterExec re-inlines the whole expression
# chain per row with no CSE (measured 7.4s of a 13.6s domain_links
# run at 6M hrefs).
URL_RE = (
    r"(?s)^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)"
    r"(?:\?([^#]*))?(?:#(.*))?$"
)

# cheap absolute-URL gate; by the (?s) totality note above, a row
# passes this iff parse_urls yields non-null parsed columns
ABS_URL_PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"

# tracking/session params dropped by normalization (the FineWeb /
# canonical-URL cleaning list): utm_* plus the big ad-click ids.
TRACKING_PARAM_RE = (
    r"^(utm_[^=]*|gclid|fbclid|msclkid|igshid|mc_eid|yclid|ref|ref_src"
    r"|spm)(=.*)?$"
)

DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}

# Compact multi-part public-suffix sample (the common ccTLD
# second-level registries). A production deployment swaps in the full
# Mozilla Public Suffix List as a broadcast table via ``suffixes=``;
# the fallback heuristic (last two labels) is right for every gTLD.
MULTI_PART_TLDS = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.in", "net.in", "org.in", "ac.in",
    "com.br", "net.br", "org.br",
    "com.mx", "com.ar", "com.cn", "com.sg", "com.tr", "com.tw",
    "co.za", "co.kr", "or.kr", "com.hk", "com.my", "co.id",
)


def _norm_query(qs: Column) -> Column:
    """Canonical query string: drop tracking params, sort the rest,
    rejoin. Empty/null input and all-tracking input both canonize to
    ''. array_join on an empty array is '' in Spark; the DuckDB twin
    needs COALESCE (array_to_string([]) is NULL there)."""
    parts = F.filter(
        F.split(F.coalesce(qs, F.lit("")), "&"), lambda x: x != ""
    )
    kept = F.filter(parts, lambda x: ~x.rlike(TRACKING_PARAM_RE))
    return F.array_join(F.array_sort(kept), "&")


def _registered_domain(
    host: Column, labels: Column, suffixes: tuple[str, ...]
) -> Column:
    """Registrable domain from a normalized host: last TWO labels,
    or last THREE when the two-label suffix is a known multi-part
    registry (co.uk et al). Single-label hosts (localhost, intranet
    names) pass through unchanged. ``labels`` must be the BOUND
    split(host, '.') column — inlining the split here would
    re-evaluate the regex split 8x per row (no CSE across the
    element_at/size references; measured 6.7s -> 0.5s at 6M hrefs
    when the caller staged it)."""
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    suffix_hit = F.element_at(labels, -2).isNotNull() & last2.isin(
        *suffixes
    )
    return F.when(n <= 1, host).otherwise(
        F.when((n >= 3) & suffix_hit, last3).otherwise(last2)
    )


def parse_urls(
    df: DataFrame,
    url_col: str = "url",
    suffixes: tuple[str, ...] = MULTI_PART_TLDS,
) -> DataFrame:
    """Add parsed + canonical URL columns: ``scheme`` (lowered),
    ``host`` (lowered, userinfo and trailing dot stripped), ``port``
    (long; NULL when absent or the scheme default), ``path`` ('/'
    when empty), ``query_norm`` (tracking-stripped, sorted),
    ``registered_domain``, and ``norm_url`` (the canonical spelling
    — fragment always dropped). Rows whose value does not parse as
    an absolute URL get NULLs throughout (filter on
    ``norm_url IS NOT NULL``). Zero exchanges.

    STAGED projections, not one wide select: Catalyst does no CSE
    across projection columns, so a single select would re-run the
    URL_RE extraction for every column that mentions scheme/host/...
    (measured 2.8x slower at 2M rows). Each stage binds the previous
    stage's columns, every regex runs once per row, and the chain
    still fuses into one WholeStageCodegen projection."""
    u = F.col(url_col)
    p0 = df.select(
        "*",
        F.regexp_extract(u, URL_RE, 1).alias("_scheme_raw"),
        F.regexp_extract(u, URL_RE, 2).alias("_auth"),
        F.regexp_extract(u, URL_RE, 3).alias("_path_raw"),
        F.regexp_extract(u, URL_RE, 4).alias("_qs"),
    )
    p1 = p0.select(
        "*",
        F.lower(F.col("_scheme_raw")).alias("_scheme"),
        F.regexp_replace(F.col("_auth"), "^[^@]*@", "").alias("_hp"),
    )
    p2 = p1.select(
        "*",
        F.regexp_replace(
            F.lower(F.regexp_replace(F.col("_hp"), ":[0-9]+$", "")),
            r"\.$",
            "",
        ).alias("_host"),
        F.regexp_extract(F.col("_hp"), ":([0-9]+)$", 1).alias("_port_s"),
    )
    port = F.when(F.col("_port_s") != "", F.col("_port_s").cast("long"))
    default_port = F.coalesce(
        *[
            F.when(F.col("_scheme") == s, F.lit(p))
            for s, p in DEFAULT_PORTS.items()
        ],
        F.lit(-1),
    )
    p2b = p2.select(
        "*", F.split(F.col("_host"), r"\.").alias("_labels")
    )
    p3 = p2b.select(
        "*",
        F.when(port != default_port, port).alias("_port"),
        F.when(F.col("_path_raw") == "", F.lit("/"))
        .otherwise(F.col("_path_raw"))
        .alias("_path"),
        _norm_query(F.col("_qs")).alias("_qn"),
        _registered_domain(
            F.col("_host"), F.col("_labels"), suffixes
        ).alias("_reg"),
    )
    ok = F.col("_scheme_raw") != ""
    norm = F.concat(
        F.col("_scheme"),
        F.lit("://"),
        F.col("_host"),
        F.when(
            F.col("_port").isNotNull(),
            F.concat(F.lit(":"), F.col("_port").cast("string")),
        ).otherwise(F.lit("")),
        F.col("_path"),
        F.when(
            F.col("_qn") != "", F.concat(F.lit("?"), F.col("_qn"))
        ).otherwise(F.lit("")),
    )
    null_s = F.lit(None).cast("string")
    return p3.select(
        *df.columns,
        F.when(ok, F.col("_scheme")).otherwise(null_s).alias("scheme"),
        F.when(ok, F.col("_host")).otherwise(null_s).alias("host"),
        F.when(ok, F.col("_port")).alias("port"),
        F.when(ok, F.col("_path")).otherwise(null_s).alias("path"),
        F.when(ok, F.col("_qn")).otherwise(null_s).alias("query_norm"),
        F.when(ok, F.col("_reg")).otherwise(null_s).alias(
            "registered_domain"
        ),
        F.when(ok, norm).otherwise(null_s).alias("norm_url"),
    )


def url_dedup_keep(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    score_col: str | None = None,
) -> DataFrame:
    """URL-level dedup: one keeper per CANONICAL url — highest
    ``score_col`` (ties and scoreless: lowest id; the dedup_keep_best
    resolution policy). Returns the parsed frame plus ``keep``; rows
    that did not parse keep NULL norm_url and are all kept (content
    dedup owns them). One window shuffle on norm_url carrying (id,
    score) — never text. Unparseable rows get a SYNTHETIC unique
    partition key (their keep is constant True, but a shared NULL
    key would pin every invalid row of a dirty 100 TB crawl onto
    one window partition)."""
    from pyspark.sql.window import Window

    parsed = parse_urls(df, url_col)
    order = (
        [F.col(score_col).desc_nulls_last(), F.col(id_col).asc()]
        if score_col
        else [F.col(id_col).asc()]
    )
    pkey = F.coalesce(
        F.col("norm_url"),
        F.concat(F.lit("\x00invalid:"), F.col(id_col).cast("string")),
    )
    w = Window.partitionBy(pkey).orderBy(*order)
    rn = F.row_number().over(w)
    return parsed.withColumn(
        "keep", F.col("norm_url").isNull() | (rn == 1)
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per registered domain: docs, distinct hosts, distinct
    canonical URLs, and the corpus share in exact integer ppm
    (docs*1e6 div total — engine-portable, no float division). The
    domain-concentration report a crawl curation pass caps from.
    One groupBy shuffle; the share denominator is a broadcast
    one-row total, never a global window."""
    # pre-filter on the cheap prefix gate against the RAW column —
    # equivalent to norm_url IS NOT NULL (the URL_RE totality
    # contract) without the FilterExec expression-inlining cost
    parsed = parse_urls(
        df.filter(F.col(url_col).rlike(ABS_URL_PREFIX_RE)), url_col
    )
    # `per` feeds TWO subtrees (the total aggregate and the final
    # join) and Catalyst plans each its own copy of the whole corpus
    # aggregation — two full scans at 100 TB. The per-domain frame is
    # bounded by registered-domain cardinality, so pin it (the
    # Catalyst multi-reference rule; the sliding/kmv precedent).
    per = parsed.groupBy("registered_domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.countDistinct("norm_url").alias("n_urls"),
    ).localCheckpoint()
    total = per.agg(F.sum("n_docs").alias("_total"))
    return per.crossJoin(F.broadcast(total)).select(
        "registered_domain",
        "n_docs",
        "n_hosts",
        "n_urls",
        F.expr("n_docs * 1000000 div _total").alias("share_ppm"),
    )


# href attribute values, both quote styles — (?i) and the classes
# mean the same thing in Java regex and RE2 (the pii.py discipline)
HREF_DQ_RE = r'(?i)href\s*=\s*"([^"]*)"'
HREF_SQ_RE = r"(?i)href\s*=\s*'([^']*)'"


def extract_links(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(src_id, url) per href occurrence in the document markup —
    the raw edge list of the crawl link graph. Both quote styles;
    duplicates kept (each anchor is an edge). Relative hrefs are
    emitted verbatim — parse_urls downstream nulls them out, and a
    caller with base URLs resolves them first. One stateless
    extract + explode, zero exchanges."""
    hrefs = F.concat(
        F.regexp_extract_all(F.col(text_col), F.lit(HREF_DQ_RE), F.lit(1)),
        F.regexp_extract_all(F.col(text_col), F.lit(HREF_SQ_RE), F.lit(1)),
    )
    return df.select(
        F.col(id_col).alias("src_id"), F.explode(hrefs).alias("url")
    )


def domain_links(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The registered-domain adjacency of the crawl link graph:
    (src_domain, dst_domain, n_links, n_src_docs) — who links to
    whom, the input to domain-authority / link-spam screens
    (FineWeb-style curation ranks hosts by exactly this table).
    Only ABSOLUTE hrefs that parse contribute edges; each anchor
    occurrence counts as one link.

    One pass, zero joins: the source document's own domain is a
    row-local projection (url and text sit on the same row), so the
    href explode carries src_domain with it and the single shuffle
    is the final (src, dst) aggregate."""
    src = parse_urls(
        df.filter(F.col(url_col).rlike(ABS_URL_PREFIX_RE)), url_col
    ).select(
        F.col("registered_domain").alias("src_domain"),
        F.col(id_col),
        F.col(text_col),
    )
    hrefs = F.concat(
        F.regexp_extract_all(F.col(text_col), F.lit(HREF_DQ_RE), F.lit(1)),
        F.regexp_extract_all(F.col(text_col), F.lit(HREF_SQ_RE), F.lit(1)),
    )
    exploded = src.select(
        "src_domain", F.col(id_col), F.explode(hrefs).alias("url")
    )
    dst = parse_urls(
        exploded.filter(F.col("url").rlike(ABS_URL_PREFIX_RE))
    )
    return dst.groupBy(
        "src_domain",
        F.col("registered_domain").alias("dst_domain"),
    ).agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct(id_col).alias("n_src_docs"),
    )


def domain_pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` domains by WEIGHTED DIRECTED PageRank over a
    domain_links adjacency — the domain-authority ranking FineWeb-
    style curation feeds into quality priors (high-authority domains
    up-weighted, link-farm hubs surfaced). Unlike dup_pagerank's
    symmetrized dup graph this one is directed with DANGLING nodes
    (domains that are linked to but crawl no outlinks), so each
    iteration redistributes the dangling mass uniformly:

        pr'(v) = (1-d)/N + d * (sum_{u->v} pr(u) * w_uv / W_u
                                + dangling_mass / N)

    Shape: the edge list is bounded by domain-PAIR cardinality (a
    catalog-scale table, not the corpus), pinned once; each
    iteration is one weighted join-aggregate plus a one-row dangling
    sum (broadcast), previous vector localCheckpointed so plan depth
    stays O(1) per iteration (the dup_clusters loop posture). N is
    ONE driver scalar. Scores surface ROUND(6) (cross-engine
    group-sum order, the dup_pagerank float contract), ranked
    (pr DESC, domain ASC) via sort+limit."""
    from pyspark.sql.window import Window

    edges = edges.select(
        "src_domain", "dst_domain", "n_links"
    ).localCheckpoint()
    nodes = (
        edges.select(F.col("src_domain").alias("d"))
        .unionAll(edges.select(F.col("dst_domain").alias("d")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return edges.sparkSession.createDataFrame(
            [], "domain string, pr double, rank long"
        )
    outw = (
        edges.groupBy("src_domain")
        .agg(F.sum("n_links").alias("_w"))
        .localCheckpoint()
    )
    r = nodes.select("d", F.lit(1.0 / n_nodes).alias("pr"))
    teleport = (1.0 - damping) / n_nodes
    for _ in range(iters):
        dang = r.join(
            outw, r["d"] == outw["src_domain"], "left_anti"
        ).agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm"))
        contrib = (
            edges.join(outw, "src_domain")
            .join(r, edges["src_domain"] == r["d"])
            .groupBy("dst_domain")
            .agg(
                F.sum(
                    F.col("pr") * F.col("n_links") / F.col("_w")
                ).alias("_s")
            )
        )
        r = (
            nodes.join(
                contrib, nodes["d"] == contrib["dst_domain"], "left"
            )
            .crossJoin(F.broadcast(dang))
            .select(
                "d",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_s"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n_nodes))
                    )
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    scored = r.select(
        F.col("d").alias("domain"), F.round("pr", 6).alias("pr")
    )
    order = (F.desc("pr"), F.asc("domain"))
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    agent: str = "*",
) -> DataFrame:
    """robots.txt text -> (host, allow, path) rules for ``agent``.

    Grammar subset (the crawler-relevant core): ``User-agent:`` /
    ``Allow:`` / ``Disallow:`` directives, case-insensitive keys,
    ``#`` comments stripped, CR tolerated. Section semantics: a
    maximal run of consecutive User-agent lines opens a BLOCK; every
    rule line belongs to the most recent block above it; a block
    applies to ``agent`` by the RFC 9309 most-specific-group rule:
    blocks naming ``agent`` exactly (case-insensitive) win, and the
    ``*`` blocks apply only to hosts where no exact group exists. An empty Disallow value
    ("Disallow:") allows everything, so it is dropped with the
    comment lines rather than emitted as a match-all ban.

    Shape: one posexplode over lines (bounded by robots.txt size, a
    few KB per host), then three windows ALL partitioned by the same
    host key — one shuffle total: block starts by lag, block ids by
    running sum, each rule's governing block by running
    last(ignorenulls). The agent match is a semi-join of rules to
    their block's User-agent rows on (host, block)."""
    from pyspark.sql.window import Window

    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "idx", "line"
        ),
    ).select(
        "host",
        "idx",
        F.trim(
            F.regexp_replace(F.regexp_replace("line", "#.*$", ""), "\r", "")
        ).alias("line"),
    )
    key = F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1)))
    val = F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1))
    typed = lines.select(
        "host", "idx", key.alias("key"), val.alias("val")
    ).filter(F.col("key").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("idx")
    is_ua = F.col("key") == "user-agent"
    run_start = is_ua & ~F.coalesce(
        F.lag(is_ua).over(w), F.lit(False)
    )
    blocks = typed.select(
        "*",
        F.sum(run_start.cast("long")).over(w).alias("_blk"),
    ).select(
        "*",
        F.last(F.when(is_ua, F.col("_blk")), ignorenulls=True)
        .over(w)
        .alias("_rule_blk"),
    )
    agents = blocks.filter(is_ua).select(
        "host",
        F.col("_blk").alias("_b"),
        F.lower(F.col("val")).alias("_agent"),
    ).localCheckpoint()
    # RFC 9309 most-specific-group rule: when any block names the
    # agent exactly, the '*' blocks are IGNORED for that host; '*'
    # applies only to hosts with no exact group. (`agents` is
    # referenced from both branches — lazily pinned above so the
    # robots text parses once, the Catalyst multi-reference rule.)
    exact = agents.filter(F.col("_agent") == agent.lower()).select(
        "host", "_b"
    )
    star = agents.filter(F.col("_agent") == "*").select("host", "_b")
    wanted = exact.unionAll(
        star.join(
            exact.select("host").distinct(), "host", "left_anti"
        )
    ).distinct()
    rules = blocks.filter(~is_ua & (F.col("val") != "")).select(
        "host",
        F.col("_rule_blk").alias("_b"),
        (F.col("key") == "allow").alias("allow"),
        F.col("val").alias("path"),
    )
    return rules.join(wanted, ["host", "_b"], "left_semi").select(
        "host", "allow", "path"
    )


# regex metacharacters escaped during wildcard-rule translation —
# every char EXCEPT '*' (which becomes '.*'); '$' is escaped here
# and re-added as the anchor only when it TRAILS the rule. The same
# table generates the oracle's replace chain (literal replace(), no
# regex-in-regex) so translation cannot drift between engines.
ROBOTS_RX_ESCAPE = [
    "\\", ".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^", "$",
]


def _robots_rx(base: Column) -> Column:
    for ch in ROBOTS_RX_ESCAPE:
        base = F.replace(base, F.lit(ch), F.lit("\\" + ch))
    return F.replace(base, F.lit("*"), F.lit(".*"))


def pack_robots_rules(rules: DataFrame) -> DataFrame:
    """(host, _rules: array<struct(l, a, p, w, rx)>) — rules grouped
    per host for the broadcast verdict fold. Wildcard rules (any
    '*', or a trailing '$' end-anchor — RFC 9309 §2.2.3) carry a
    translated regex ``rx`` (anchored '^', metachars escaped via the
    shared literal-replace table, '*' -> '.*', trailing '$' kept as
    the anchor); plain rules keep the cheap startswith path.
    Specificity ``l`` is the ORIGINAL pattern length (the RFC's
    most-octets rule). The aggregate runs on the RULES frame only (a
    few rows per host, catalog-scale), never on URLs."""
    trailing = F.col("path").endswith("$")
    base = F.when(
        trailing,
        F.expr("substring(path, 1, length(path) - 1)"),
    ).otherwise(F.col("path"))
    rx = F.concat(
        F.lit("^"),
        _robots_rx(base),
        F.when(trailing, F.lit("$")).otherwise(F.lit("")),
    )
    wild = F.col("path").contains("*") | trailing
    return rules.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.length("path").alias("l"),
                F.col("allow").alias("a"),
                F.col("path").alias("p"),
                wild.alias("w"),
                rx.alias("rx"),
            )
        ).alias("_rules")
    )


def robots_filter(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Tag every URL with its robots verdict: ``crawl_allowed`` by
    the standard LONGEST-MATCH-WINS rule (the Google/RFC 9309
    semantics): among the host's rules matching the URL path, the
    longest PATTERN decides (the RFC's most-octets rule, measured on
    the original rule text); a length tie goes to Allow; no matching
    rule (and no rules for the host) means allowed. Rule matching:
    plain rules are prefix tests; rules carrying '*' or a trailing
    '$' end-anchor take the translated-regex path built at pack time
    (the shared literal-replace escape table — oracle-replayable, no
    regex-in-regex).

    CONTRACT (deliberate subset, locked by the oracle): rules match
    against the URL *path only* — parse_urls' ``path`` column
    excludes the query string, so a rule containing '?' (e.g.
    ``Disallow: /search?q=``) can never fire here, where RFC 9309 /
    Google semantics match path+query. Likewise authority is keyed
    on HOST only: http/https/any-port of one host share a rule set,
    where the RFC scopes robots.txt per (scheme, host, port). Both
    are documented merges, not bugs — widening either changes every
    verdict hash and needs the oracle regenerated in lockstep.

    Shape — the 100 TB story: rules pack per host FIRST (an
    aggregate over the tiny rules frame), the packed side rides a
    BROADCAST left join, and the verdict is one F.aggregate fold
    over the host's rule array — URL rows never shuffle at all
    (join + groupBy per URL would re-key the whole corpus). The
    post-join plan is a pure projection, so the operator runs
    unchanged on a stream against static rules (stream-static
    broadcast join; 40th parity surface)."""
    parsed = parse_urls(
        df.filter(F.col(url_col).rlike(ABS_URL_PREFIX_RE)), url_col
    ).withColumnRenamed("path", "_upath")
    joined = parsed.join(
        F.broadcast(pack_robots_rules(rules)), "host", "left"
    )
    win = F.aggregate(
        F.coalesce(F.col("_rules"), F.array().cast(
            "array<struct<l:int,a:boolean,p:string,w:boolean,rx:string>>"
        )),
        F.struct(
            F.lit(-1).cast("int").alias("l"), F.lit(True).alias("a")
        ),
        lambda acc, r: F.when(
            F.when(
                r["w"], F.regexp_like(F.col("_upath"), r["rx"])
            ).otherwise(F.col("_upath").startswith(r["p"]))
            & (
                (r["l"] > acc["l"])
                | ((r["l"] == acc["l"]) & r["a"] & ~acc["a"])
            ),
            F.struct(r["l"].alias("l"), r["a"].alias("a")),
        ).otherwise(acc),
    )
    out_cols = [
        F.col(c).alias("path") if c == "_upath" else F.col(c)
        for c in parsed.columns
    ]
    return joined.select(*out_cols, win["a"].alias("crawl_allowed"))


def curate_urls(
    df: DataFrame,
    rules: DataFrame | None = None,
    score_col: str | None = None,
    per_domain_cap: int | None = None,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """The URL-side preparation recipe (compose.prepare_corpus's
    provenance sibling, run BEFORE any content is fetched or
    processed): robots verdicts (optional) -> canonical URL dedup
    (best score, ties to lowest id) -> optional per-registered-domain
    cap. Returns the parsed keeper rows.

    Scale shape: every stage reuses the family's documented form —
    the robots fold adds no URL shuffle, dedup is the one norm_url
    window (near-unique key, no skew), and the domain cap is
    sampling.group_cap's GROUPED distributed prefix sum, NOT a
    per-domain window — the monster domain this cap exists for
    would pin a single window partition."""
    from pyspark.sql.window import Window

    from openset_spark.pipeline.sampling import group_cap

    if rules is not None:
        parsed = robots_filter(df, rules, url_col).filter(
            F.col("crawl_allowed")
        ).drop("crawl_allowed")
    else:
        parsed = parse_urls(
            df.filter(F.col(url_col).rlike(ABS_URL_PREFIX_RE)), url_col
        )
    order = (
        [F.col(score_col).desc_nulls_last(), F.col(id_col).asc()]
        if score_col
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy("norm_url").orderBy(*order)
    kept = (
        parsed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if per_domain_cap is not None:
        kept = group_cap(
            kept, ["registered_domain"], order, per_domain_cap
        )
    return kept
