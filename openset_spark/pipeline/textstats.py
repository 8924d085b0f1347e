"""Text analysis for training-data pipelines: token counts, quality
scoring, language ID, fingerprinting. All JVM built-ins — these run
at full codegen speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.text import STOPWORDS, normalize, tokens


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc: char/token counts, avg token length, punct/digit/space
    ratios."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    # counts surface as BIGINT (like every SQL engine's length/count)
    # so downstream unions/oracle comparisons don't see int32 drift
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.length(F.regexp_replace(normalize(t), " ", "")) / F.size(toks)).alias(
            "avg_token_len"
        ),
        (
            (n_chars - F.length(F.regexp_replace(t, "[!-/:-@\\[-`{-~]", ""))) / n_chars
        ).alias("punct_ratio"),
        ((n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))) / n_chars).alias(
            "digit_ratio"
        ),
    )


# GPT-2-style pre-tokenizer approximation, ASCII classes so the Java
# (Spark) and RE2 (DuckDB oracle) regex engines agree: contractions,
# space-prefixed letter runs, digit runs, punct runs, whitespace runs.
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Approximate BPE token count (pre-tokenizer piece count) — the
    cheap JVM-side stand-in for a real tokenizer when sizing a
    pretraining mix; counts regex pieces, never materializes them."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc whitespace and BPE-ish token counts."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(tokens(t)).cast("long").alias("ws_tokens"),
        bpe_token_count(t).cast("long").alias("bpe_tokens"),
    )


def stopword_hits(toks: Column, lang: str) -> Column:
    return F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS[lang]))
    )


def quality_columns(text_col: str = "text") -> dict:
    """The quality heuristic as reusable named Columns (length band,
    stopword density, alpha ratio) — so fused queries can ride them
    along another scan instead of joining two derived frames."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tokens = F.size(toks)
    stop_ratio = stopword_hits(toks, "en") / n_tokens
    alpha_ratio = F.length(F.regexp_replace(t, r"[^A-Za-z ]", "")) / F.length(t)
    len_band = F.when((n_tokens >= 20) & (n_tokens <= 10000), 1.0).otherwise(0.5)
    score = F.round(
        (
            F.least(stop_ratio * 5, F.lit(1.0)) * 0.4
            + alpha_ratio * 0.4
            + len_band * 0.2
        ),
        4,
    )
    return {
        "n_tokens": n_tokens.cast("long"),
        "stop_ratio": F.round(stop_ratio, 4),
        "quality": score,
    }


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """A deterministic heuristic quality score in [0,1]: length band,
    stopword density, alpha ratio — the usual cheap pretraining filter."""
    cols = quality_columns(text_col)
    return df.select(
        F.col(id_col), *[c.alias(n) for n, c in cols.items()]
    )


def lang_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: dict | None = None,
) -> DataFrame:
    """Stopword-hit argmax language guess over en/de/fr/es.
    ``extra_cols`` ({name: Column}) ride along in the same scan —
    the fusion hook that lets a mix query compute language + quality
    in ONE pass instead of joining two derived frames."""
    extra_cols = extra_cols or {}
    toks = tokens(F.col(text_col))
    scores = [
        stopword_hits(toks, lang).cast("long").alias(f"hits_{lang}")
        for lang in STOPWORDS
    ]
    scored = df.select(
        F.col(id_col),
        *[c.alias(n) for n, c in extra_cols.items()],
        *scores,
    )
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    guess = F.coalesce(
        *[F.when(F.col(f"hits_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return scored.select(
        id_col,
        *extra_cols.keys(),
        *[f"hits_{lang}" for lang in langs],
        F.when(best > 0, guess).otherwise(F.lit("unknown")).alias("lang_guess"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stable content fingerprints: md5 of normalized text + xxhash64."""
    norm = normalize(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint_md5"),
        F.xxhash64(norm).alias("fingerprint_xx64"),
    )


def _run_bounds(arr: str) -> str:
    """SQL snippet: 1-based END positions of each run of equal values
    in the SORTED array column ``arr`` — run j's length is
    bounds[j] - bounds[j-1] and run j's value sits at bounds[j]. Run
    lengths of a sorted array ARE the per-value counts, so this is
    the row-local substitute for an explode + groupBy count (zero
    corpus shuffles; the per-element pass is a bare-comparison
    filter, no per-element state allocation). The i = size(...)
    disjunct short-circuits before the lookahead so element_at stays
    in bounds under ANSI; the size-0 guard dodges sequence(1, 0)
    being DESCENDING."""
    return (
        f"if(size({arr}) = 0, array(), "
        f"filter(sequence(1, size({arr})), "
        f"i -> i = size({arr}) "
        f"or element_at({arr}, i + 1) != element_at({arr}, i)))"
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    App. A1.1, adapted to single-line documents): the duplicate-token
    fraction and the character fraction covered by the most frequent
    word 2-gram — the cheap structural filters a pretraining pipeline
    runs before any model-based scoring.

    The top-bigram tie-break is the lexicographically greatest bigram
    at the max count (a struct max — deterministic, mirrored in the
    oracle). ``top_bigram_char_frac`` counts occurrences * bigram
    length over normalized chars (overlapping occurrences not merged
    — the usual simplification). Documents with fewer than 2 tokens
    are excluded. ``flagged`` applies Gopher-ish thresholds (dup
    fraction > 0.5 or top-bigram coverage > 0.2), computed on
    unrounded values.

    Scale shape (r15): ONE corpus scan, ZERO corpus-sized shuffles —
    the per-(doc, bigram) counting that used to ride an explode +
    groupBy exchange (the bigram stream is corpus-sized at 100 TB) is
    a row-LOCAL run-length pass over the sorted per-doc bigram array
    (see :func:`_run_bounds`; `array_max` over (count, gram) structs
    replicates the struct-max tiebreak exactly — ascending sort order
    means a count tie is always won by the lexicographically greater
    run). Value-identical to the explode form: run lengths of a
    sorted array ARE the per-bigram counts (integer-exact, no
    summation-order question)."""
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        toks.alias("toks"),
        F.length(normalize(F.col(text_col))).alias("n_chars"),
    ).filter(F.size("toks") >= 2)
    staged = base.select(
        id_col,
        "n_chars",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.expr(
            "array_sort(transform(sequence(0, size(toks)-2), "
            "i -> concat(element_at(toks, i+1), ' ', "
            "element_at(toks, i+2))))"
        ).alias("_bgs"),
    ).select("*", F.expr(_run_bounds("_bgs")).alias("_bb"))
    best = F.expr(
        "array_max(zip_with("
        "transform(_bb, (b, j) -> b - if(j = 0, 0, element_at(_bb, j))), "
        "transform(_bb, b -> element_at(_bgs, b)), "
        "(r, g) -> struct(cast(r as bigint) as c, g as bigram)))"
    )
    top = staged.select(
        id_col, "n_chars", "n_tokens", "n_distinct", best.alias("m")
    )
    dup = 1.0 - F.col("n_distinct") / F.col("n_tokens")
    frac = F.col("m.c") * F.length("m.bigram") / F.col("n_chars")
    return top.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(dup, 4).alias("dup_token_ratio"),
        F.col("m.bigram").alias("top_bigram"),
        F.col("m.c").alias("top_bigram_count"),
        F.round(frac, 4).alias("top_bigram_char_frac"),
        ((dup > 0.5) | (frac > 0.2)).alias("flagged"),
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc Shannon entropy (bits/char) over normalized characters
    — the classic gibberish/low-diversity quality signal (near-zero
    for repeated-char spam, ~4.2 for natural English).

    Shape (r15): ONE corpus scan, ZERO shuffles — the per-(doc, char)
    counting that used to ride an explode + groupBy exchange (the
    char stream is the corpus at 100 TB) is row-LOCAL: count of char
    c = (len(s) - len(replace(s, c, ''))) / len(c), the
    script_profile length-difference trick, where ``replace`` is a
    codegen'd byte scan and the only interpreted lambda runs once per
    DISTINCT char (~dozens), not once per char. The len(c) divisor
    keeps surrogate-pair (2-code-unit) chars exact; counts stay
    integer-exact. H = log2(n) - sum(c*log2(c))/n keeps all
    arithmetic on integer counts until the final expression; the sum
    accumulates in array_distinct's first-occurrence order and the
    result is rounded to 4 decimals — the same ROUND(4) contract that
    already absorbs the DuckDB oracle's own libm/summation-order
    noise (~1e-13)."""
    staged = df.select(
        F.col(id_col), normalize(F.col(text_col)).alias("_norm")
    ).select(
        F.col(id_col),
        "_norm",
        F.expr("filter(split(_norm, ''), c -> c != '')").alias("_chs"),
    )
    clog = F.expr(
        "aggregate(transform(array_distinct(_chs), "
        "c -> (length(_norm) - length(replace(_norm, c, ''))) div length(c)), "
        "cast(0 as double), (a, cc) -> a + cc * log2(cc))"
    )
    n = F.size("_chs")
    return staged.filter(n > 0).select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        F.round(F.log2(n) - clog / n, 4).alias("entropy_bits"),
    )


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch-Kincaid-style readability from pure column expressions:
    syllables approximated as vowel-group runs (the standard cheap
    estimator), sentences as terminal-punctuation runs (floored at 1
    so punctuation-free corpora don't divide by zero).

    ASCII character classes only, so the Java (Spark) and RE2
    (DuckDB) regex engines agree. Grade = 0.39*words/sentences +
    11.8*syllables/words - 15.59, reported at 2 decimals.

    Rounding is deliberately NOT float ROUND(x, 2): the grade is an
    exact small-denominator rational (100*grade = (39w² + 1180*syl*s
    - 1559ws)/(ws)), so values routinely land exactly ON a rounding
    boundary, where Spark (BigDecimal of the shortest decimal
    repr, HALF_UP) and DuckDB (binary-value rounding) disagree —
    9.995 → 10.0 vs 9.99. Instead the centigrade integer is rounded
    explicitly as floor((2a+b)/(2b)) (ties toward +inf) — identical
    IEEE ops in both engines — and divided by 100."""
    t = F.col(text_col)
    toks = tokens(t)
    words = F.size(toks).cast("long")
    syllables = F.regexp_count(F.lower(t), F.lit("[aeiouy]+")).cast("long")
    sentences = F.greatest(
        F.regexp_count(t, F.lit("[.!?]+")), F.lit(1)
    ).cast("long")
    num = (
        F.lit(39) * words * words
        + F.lit(1180) * syllables * sentences
        - F.lit(1559) * words * sentences
    )
    den = words * sentences
    cent = F.floor((F.lit(2) * num + den) / (F.lit(2) * den))
    return df.filter(words > 0).select(
        F.col(id_col),
        words.alias("n_words"),
        syllables.alias("n_syllables"),
        sentences.alias("n_sentences"),
        (cent / F.lit(100.0)).alias("fk_grade"),
    )


def vocab_growth(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group vocabulary statistics: total tokens, distinct tokens
    (corpus-wide vocabulary per group, NOT summed per-doc distincts)
    and the type-token ratio — the Heaps-law health check a corpus
    card reports per source/domain.

    One token explode, then a two-level aggregate: (group, token)
    partial counts collapse the explode map-side before the distinct
    count — the same shape at 100 TB, with vocabulary (not corpus)
    cardinality in the final shuffle."""
    toked = df.select(
        F.col(group_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    per_tok = toked.groupBy(group_col, "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_tok.groupBy(group_col)
        .agg(
            F.sum("c").cast("long").alias("total_tokens"),
            F.count(F.lit(1)).cast("long").alias("distinct_tokens"),
        )
        .select(
            group_col,
            "total_tokens",
            "distinct_tokens",
            F.round(
                F.col("distinct_tokens") / F.col("total_tokens"), 6
            ).alias("type_token_ratio"),
        )
    )


def keyword_tags(
    df: DataFrame,
    lexicon: dict[str, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Taxonomy tagging by keyword lexicon (the FlashText /
    domain-routing shape every corpus triage step starts with):
    ``lexicon`` maps topic -> keyword list; each document gets the
    sorted set of topics whose keywords it contains plus the count
    of distinct matched keywords. A keyword claimed by several
    topics counts once per topic it tags but once total in
    ``n_hit_words``.

    Scale shape: the lexicon is a broadcast dim (thousands of rows
    at most — a catalog artifact); the document side is ONE
    outer-exploded distinct-token pass LEFT-joined to the lexicon,
    so every doc reaches the per-doc aggregate directly —
    explode_outer keeps a NULL-word row for empty/NULL-token docs,
    non-matching words ride through with a NULL topic, and the
    aggregate counts only matched rows. r16: this replaces the old
    inner join + second corpus scan for the id spine (2 corpus
    scans + a corpus-sized join -> 1 scan, same rows: collect_set
    skips NULLs, countDistinct(when(matched, word)) is exactly the
    old countDistinct over the inner-join rows)."""
    rows = sorted(
        {(w, t) for t, ws in lexicon.items() for w in ws}
    )
    spark = df.sparkSession
    lex = spark.createDataFrame(rows, "word string, topic string")
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(tokens(F.col(text_col)))
        ).alias("word"),
    )
    return (
        toks.join(F.broadcast(lex), "word", "left")
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_set("topic")).alias("topics"),
            F.countDistinct(
                F.when(F.col("topic").isNotNull(), F.col("word"))
            ).cast("long").alias("n_hit_words"),
        )
    )


GOPHER_REQUIRED_STOPWORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with",
]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: dict | None = None,
    stage_cols: dict | None = None,
) -> DataFrame:
    """The Gopher rule-set (Rae et al. 2021, App. A1.1) as one
    fused column pass: word-count band [50, 100k], mean word length
    band [3, 10], symbol-to-word ratio (# and ellipsis) < 0.1,
    alphabetic-word fraction > 0.8, and >= 2 of the eight required
    English stopwords — plus the combined ``keep``. Every published
    pretraining pipeline (Gopher, MassiveText, RefinedWeb, Dolma)
    applies exactly this family before anything expensive runs.

    All JVM built-ins over one token array; rule comparisons happen
    on the RAW rational values (exact IEEE divisions of integer
    counts — identical in any engine), with only the REPORTED ratio
    columns rounded.

    ``extra_cols`` ({name: Column}) ride along in the same scan —
    the lang_id/script_profile fusion hook, so an audit that needs
    gopher flags PLUS other row-local stats reads the corpus once
    (filter_agreement). Expressions may reference the staged
    ``_text`` (raw text) and ``_toks`` (token array) columns so the
    tokenize tree is not rebuilt per column. ``stage_cols``
    ({name: Column over the INPUT columns}) are computed in the base
    projection alongside ``_text``/``_toks`` so extra_cols that
    share an expensive intermediate (e.g. the normalized text)
    evaluate it once — the staged-projection no-CSE house rule."""
    extra_cols = extra_cols or {}
    stage_cols = stage_cols or {}
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        t.alias("_text"),
        tokens(t).alias("_toks"),
        *[c.alias(nm) for nm, c in stage_cols.items()],
    )
    n_words = F.size("_toks")
    sum_len = F.length(F.concat_ws("", F.col("_toks")))
    n_hash = F.length("_text") - F.length(
        F.regexp_replace("_text", "#", "")
    )
    n_ell = (
        F.length("_text")
        - F.length(F.regexp_replace("_text", r"\.\.\.", ""))
    ) / 3
    n_alpha = F.expr("size(filter(_toks, w -> w rlike '[a-z]'))")
    req = F.array([F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS])
    n_req = F.size(
        F.array_distinct(F.array_intersect(F.array_distinct("_toks"), req))
    )
    mean_len = sum_len / n_words
    sym = (n_hash + n_ell) / n_words
    alpha = n_alpha / n_words
    keep = (
        n_words.between(50, 100_000)
        & mean_len.between(3, 10)
        & (sym < 0.1)
        & (alpha > 0.8)
        & (n_req >= 2)
    )
    return base.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(sym, 4).alias("symbol_ratio"),
        F.round(alpha, 4).alias("alpha_word_frac"),
        n_req.cast("long").alias("n_req_stopwords"),
        keep.alias("keep"),
        *[c.alias(nm) for nm, c in extra_cols.items()],
    )


def lexical_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc lexical-diversity profile: token/type counts, TTR and
    hapax-legomenon fraction — the cheap repetitiveness screens a
    corpus card reports next to the Gopher flags (templated or spammy
    text shows depressed TTR long before a dedup pass finds it).

    Ratios surface as exact integer basis points (``x10k`` columns,
    integer division) instead of ROUND()ed doubles: float rounding
    half-way cases are the one place Spark (BigDecimal HALF_UP on the
    shortest repr) and other engines (binary rounding) disagree, and
    integer division of the exact counts sidesteps the whole class.

    Scale shape: one explode into a two-level hash aggregate —
    (doc, token) partial counts map-side combine before the shuffle,
    so the wire carries per-doc vocabularies (bounded by Heaps' law),
    never raw token instances.
    """
    inst = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    per = inst.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    n_tok = F.sum("c")
    n_typ = F.count(F.lit(1))
    n_hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return per.groupBy(id_col).agg(
        n_tok.cast("long").alias("n_tokens"),
        n_typ.cast("long").alias("n_types"),
        n_hapax.cast("long").alias("n_hapax"),
        F.expr("10000 * count(1) div sum(c)").alias("ttr_x10k"),
        F.expr(
            "10000 * sum(case when c = 1 then 1 else 0 end) div count(1)"
        ).alias("hapax_x10k"),
    )


def lang_confusion(
    df: DataFrame,
    gold_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Language-ID evaluation against gold labels: the confusion
    matrix (gold, guess, n_docs) every classifier audit starts from.
    Rides lang_id's extra_cols fusion hook, so gold labels flow
    through the SAME single scan the classifier uses — no join back
    to the source table. One hash aggregate on a (|langs|+1)^2-bounded
    key space; the result is a catalog-sized frame at any corpus
    size."""
    guessed = lang_id(
        df, text_col=text_col, id_col=id_col,
        extra_cols={"_gold": F.col(gold_col)},
    )
    return (
        guessed.groupBy(
            F.col("_gold").alias(gold_col),
            F.col("lang_guess"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def length_histogram(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence-length histogram in log2 buckets per group — the
    loader-planning statistic (how much padding a fixed context
    window wastes, which sources need packing vs truncation).
    Bucket = bit_length(n_tokens) - 1, i.e. doc lands in
    [2^b, 2^(b+1)): INTEGER arithmetic via the binary-string length,
    immune to the float-log2 boundary divergence a log()-based
    bucketing has between engines.

    Zero-token docs (empty/whitespace-only/NULL text — note
    split('') yields [''] so their token_count reads 1, not 0) are
    EXCLUDED: no bucket satisfies the [2^b, 2^(b+1)) contract for
    them, and a loader plans no sequence for an empty doc. The
    emptiness test is on the NORMALIZED text, matching the
    tokenizer's own definition.

    Output: (group, bucket, n_docs, sum_tokens, min_tokens,
    max_tokens). One map-side-combinable aggregate; no explode."""
    from openset_spark.functions.text import normalize, token_count

    base = (
        df.filter(F.length(normalize(F.col(text_col))) > 0)
        .select(
            F.col(group_col),
            token_count(F.col(text_col)).alias("_n"),
        )
        .withColumn("bucket", (F.length(F.expr("bin(_n)")) - 1).cast("long"))
    )
    return base.groupBy(group_col, "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n").alias("sum_tokens"),
        F.min("_n").cast("long").alias("min_tokens"),
        F.max("_n").cast("long").alias("max_tokens"),
    )


# Unicode script ranges as LITERAL character-class strings — built
# from chr() so the very same literal reaches Java regex and RE2
# (escape syntaxes differ between them; literal ranges do not).
# Ordered: the dominant-script argmax tie-breaks to the FIRST class
# here (then 'other').
SCRIPT_CLASSES = [
    ("latin", "A-Za-z"),
    ("cyrillic", chr(0x0400) + "-" + chr(0x04FF)),
    ("greek", chr(0x0370) + "-" + chr(0x03FF)),
    ("arabic", chr(0x0600) + "-" + chr(0x06FF)),
    ("devanagari", chr(0x0900) + "-" + chr(0x097F)),
    ("cjk", chr(0x4E00) + "-" + chr(0x9FFF)),
    ("hiragana_katakana", chr(0x3040) + "-" + chr(0x30FF)),
    ("hangul", chr(0xAC00) + "-" + chr(0xD7AF)),
    ("digit", "0-9"),
]


# explicit whitespace class shared with the oracle: Java's \s
# includes \x0B (vertical tab) while RE2's does not — a literal
# class sidesteps the divergence
SCRIPT_WHITESPACE = " \t\n\r\f" + chr(0x0B)


def script_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: dict | None = None,
) -> DataFrame:
    """Per-doc Unicode script histogram + dominant script — the
    multilingual-corpus routing/QA signal beside lang_id (a doc
    whose label says 'en' but whose chars are 80% Cyrillic is a
    mislabel or mojibake): (id, n_chars, n_<script>..., n_other,
    main_script). Counts are CHARACTERS per script class via the
    length-difference trick (length(t) - length(t with the class
    removed) — each match is one char, so the count is exact and
    integer; no explode, zero exchanges). main_script = argmax over
    the counts with ties to SCRIPT_CLASSES order then 'other';
    whitespace is excluded from n_chars and from 'other'. One
    STAGED projection per class (the parse_urls lesson: the shared
    text column binds once, each class regex runs once per row).

    ``extra_cols`` ({name: Column}) ride along in the entry
    projection — the lang_id fusion hook (r15): a consumer that
    needs script + another per-row signal computes both in ONE scan
    instead of joining two derived frames (lang_script_agreement
    dropped from two text scans + a join to one scan this way)."""
    extra_cols = extra_cols or {}
    cur = df.select(
        F.col(id_col),
        *[c.alias(n) for n, c in extra_cols.items()],
        F.regexp_replace(
            F.col(text_col), "[" + SCRIPT_WHITESPACE + "]", ""
        ).alias("_t"),
    ).select("*", F.length("_t").alias("n_chars"))
    names = []
    for name, cls in SCRIPT_CLASSES:
        cur = cur.select(
            "*",
            (
                F.col("n_chars")
                - F.length(
                    F.regexp_replace(F.col("_t"), f"[{cls}]", "")
                )
            )
            .cast("long")
            .alias(f"n_{name}"),
        )
        names.append(f"n_{name}")
    other = F.col("n_chars") - sum(
        (F.col(c) for c in names), F.lit(0).cast("long")
    )
    cur = cur.select("*", other.alias("n_other"))
    best = F.greatest(*[F.col(c) for c in names], F.col("n_other"))
    main = F.when(F.col("n_chars") == 0, F.lit("none")).otherwise(
        F.coalesce(
            *[
                F.when(F.col(c) == best, F.lit(c[2:]))
                for c in names
            ],
            F.when(F.col("n_other") == best, F.lit("other")),
        )
    )
    return cur.select(
        id_col,
        *extra_cols.keys(),
        F.col("n_chars").cast("long").alias("n_chars"),
        *names,
        "n_other",
        main.alias("main_script"),
    )


def lang_script_agreement(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(lang_guess, main_script, n_docs) — the mislabel/mojibake
    audit the script_profile docstring promises: a language guess
    whose docs' dominant script disagrees with the language's
    expected script (an 'en' bucket that is mostly Cyrillic) marks
    broken routing or encoding damage upstream.

    ONE text scan (r15; was two scans joined on the id — half the
    read cost at corpus scale): the stopword-hit columns ride
    script_profile's entry projection via ``extra_cols`` (the
    lang_id fusion hook), the language argmax is the IDENTICAL
    expression lang_id builds over those columns, and the result
    feeds one bounded (|langs|+1) x (|scripts|+1) aggregate — the
    lang_confusion shape with the script column as the second
    axis. No join anywhere in the plan (plan-fenced in
    tests/test_r14_ops.py)."""
    toks = tokens(F.col(text_col))
    hits = {
        f"hits_{lang}": stopword_hits(toks, lang).cast("long")
        for lang in STOPWORDS
    }
    prof = script_profile(df, text_col, id_col, extra_cols=hits)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    guess = F.coalesce(
        *[F.when(F.col(f"hits_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return (
        prof.select(
            F.when(best > 0, guess).otherwise(F.lit("unknown")).alias(
                "lang_guess"
            ),
            "main_script",
        )
        .groupBy("lang_guess", "main_script")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
