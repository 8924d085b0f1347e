"""Main-content extraction (pipeline/cleaning.py): block split on
block-level tags, link-density classification, document-order
reassembly. The registry oracle (`main_content`) replays the full
pipeline cross-engine over the inline HTML fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openset_spark.pipeline.cleaning import (
    content_blocks,
    extract_main_content,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_blocks_split_and_classify(spark):
    html = (
        "<nav><a href=x>home</a> <a href=y>about</a></nav>"
        "<p>real prose with plenty of words to keep here</p>"
        "<li>menu</li>"
    )
    rows = content_blocks(_docs(spark, [(1, html)])).orderBy(
        "block_idx"
    ).collect()
    # 3 non-empty blocks: nav (all anchors), paragraph, short li
    assert [(r.n_tokens, r.anchor_tokens, r.kept) for r in rows] == [
        (2, 2, False),   # link density 1.0
        (9, 0, True),
        (1, 0, False),   # under min_tokens
    ]


def test_nested_inline_tags_inside_anchor(spark):
    html = "<p>see <a href=a>this <b>bold</b> link</a> and four more words</p>"
    r = content_blocks(_docs(spark, [(1, html)])).first()
    # anchor text 'this bold link' = 3 tokens of 8 total
    assert (r.n_tokens, r.anchor_tokens, bool(r.kept)) == (8, 3, True)


def test_density_boundary_is_inclusive_permille(spark):
    # exactly half the tokens in anchors: 2*1000 <= 500*4 -> kept
    at_half = "<p><a href=x>one two</a> three four</p>"
    over = "<p><a href=x>one two three</a> four five</p>"
    rows = {
        r.doc_id: r
        for r in content_blocks(
            _docs(spark, [(1, at_half), (2, over)])
        ).collect()
    }
    assert bool(rows[1].kept) is True
    assert bool(rows[2].kept) is False


def test_main_text_document_order_and_empty(spark):
    html = (
        "<p>first kept block of words</p><li>skip</li>"
        "<p>second kept block of words</p>"
    )
    out = {r.doc_id: r for r in extract_main_content(
        _docs(spark, [(1, html), (2, "<nav><a href=x>only links here</a></nav>"), (3, "<div><br></div>")])
    ).collect()}
    assert out[1].main_text == (
        "first kept block of words second kept block of words"
    )
    # three non-empty blocks (the 1-token <li> counts), two kept
    assert (out[1].n_blocks, out[1].n_kept) == (3, 2)
    # all-boilerplate doc still emits, empty
    assert (out[2].n_kept, out[2].main_text) == (0, "")
    # pure-markup doc has no non-empty block at all -> no row
    assert 3 not in out


def test_tag_free_document_kept_whole(spark):
    out = extract_main_content(
        _docs(spark, [(1, "plain prose with no markup at all")])
    ).first()
    assert (out.n_blocks, out.n_kept) == (1, 1)
    assert out.main_text == "plain prose with no markup at all"


def test_param_validation(spark):
    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        content_blocks(d, min_tokens=0)
    with pytest.raises(ValueError):
        content_blocks(d, max_link_permille=1001)


def test_mojibake_repair_roundtrip(spark):
    """Independent oracle: BUILD the mojibake by actually encoding
    UTF-8 and mis-decoding as latin-1 / CP1252, then assert the
    repair recovers the original string."""
    from openset_spark.pipeline.cleaning import mojibake_repair

    originals = [
        "café crème déjà",
        "naïve résumé from Zürich",
        "price 100° with «guillemets»",
    ]
    rows = [(i, s.encode("utf-8").decode("latin-1"))
            for i, s in enumerate(originals)]
    # latin-1 maps A0 -> NBSP like CP1252; the punct chars need CP1252
    rows.append((10, "don’t “quote… — dash".encode("utf-8").decode("cp1252")))
    out = {r.doc_id: r for r in mojibake_repair(
        _docs(spark, rows)
    ).collect()}
    assert out[0].repaired == "café crème déjà"
    assert out[1].repaired == "naïve résumé from Zürich"
    # the spacing class repairs NBSP artifacts to plain spaces
    assert out[2].repaired == "price 100° with «guillemets»"
    assert out[10].repaired == "don’t “quote… — dash"
    assert all(out[i].flagged for i in (0, 1, 2, 10))


def test_mojibake_progressive_counts_no_double_count(spark):
    """A double-encoded apostrophe contains accent ('Ã¢') and
    spacing sequences as substrings; progressive per-class counting
    must attribute exactly ONE repair to the double class and zero
    elsewhere."""
    from openset_spark.pipeline.cleaning import mojibake_repair

    doubled = "it’s".encode("utf-8").decode("cp1252") \
        .encode("utf-8").decode("cp1252")
    r = mojibake_repair(_docs(spark, [(1, doubled)])).first()
    assert (r.n_double, r.n_punct, r.n_accent, r.n_spacing) == (1, 0, 0, 0)
    assert r.n_mojibake == 1
    assert r.repaired == "it’s"


def test_mojibake_clean_text_untouched(spark):
    from openset_spark.pipeline.cleaning import mojibake_repair

    r = mojibake_repair(
        _docs(spark, [(1, "plain ascii and real unicode: é ü — ’")])
    ).first()
    assert r.n_mojibake == 0 and not r.flagged
    assert r.repaired == "plain ascii and real unicode: é ü — ’"


def test_no_shuffle_in_block_classification(spark):
    """content_blocks is projection + explode only — the per-block
    rows never leave their document's partition (the 100 TB posture:
    classification costs one pass, zero exchanges)."""
    d = _docs(spark, [(1, "<p>a b c</p>")])
    plan = content_blocks(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_preprocess_crawl_fused_order_and_single_shuffle(spark):
    """The fused crawl front-end: extraction FIRST (mojibake inside a
    dropped nav menu never counts), repair second, redaction last —
    and the whole pass plans exactly ONE exchange (the reassembly
    groupBy); repair/redaction are projections on the same stage."""
    from openset_spark.pipeline.compose import preprocess_crawl

    docs = _docs(spark, [
        # mojibake ONLY inside the boilerplate nav -> must not count
        (1, "<nav><a href=x>CafÃ© menu</a></nav>"
            "<p>contact bob@example.org for details tonight</p>"),
        (2, "<p>the naÃ¯ve rÃ©sumÃ© draft needs words</p>"),
    ])
    out = {r.doc_id: r for r in preprocess_crawl(docs).collect()}
    assert out[1].n_mojibake == 0
    assert "<EMAIL>" in out[1].clean_text and "@" not in out[1].clean_text
    assert out[2].n_mojibake == 3
    assert "naïve résumé" in out[2].clean_text

    plan = preprocess_crawl(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan


def test_markdown_strip_semantics(spark):
    """Hand-checked markdown -> plain: fences swallow their contents
    (no heading/link counts inside), images before links, alt/anchor
    text kept, emphasis unwrapped, snake_case untouched, spaces
    collapsed."""
    from openset_spark.pipeline.cleaning import markdown_strip

    md = (
        "# Title\n\nSome *bold* text with a [link](https://e.com/a) "
        "and ![img](pic.png).\n\n```\ncode # not a heading\n"
        "[not a link](x)\n```\n\n> quote\n\n---\n\n"
        "snake_case stays __strong__ <br> end"
    )
    df = spark.createDataFrame(
        [(1, md), (2, "plain text no markdown")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in markdown_strip(df).collect()}
    r = out[1]
    assert (r.n_code_blocks, r.n_images, r.n_links, r.n_headings) == (
        1, 1, 1, 1,
    )
    assert "code" not in r.plain and "not a link" not in r.plain
    assert "link" in r.plain and "img" in r.plain
    assert "bold" in r.plain and "*" not in r.plain
    assert "snake_case stays strong" in r.plain
    assert "<br>" not in r.plain and "---" not in r.plain
    assert "  " not in r.plain.replace("\n", "|")
    p = out[2]
    assert p.plain == "plain text no markdown"
    assert (p.n_code_blocks, p.n_links) == (0, 0)


def test_markdown_strip_unterminated_fence_counts_inside(spark):
    from openset_spark.pipeline.cleaning import markdown_strip

    df = spark.createDataFrame(
        [(1, "``` unterminated\n# heading inside")],
        "doc_id long, text string",
    )
    r = markdown_strip(df).first()
    # no closing fence -> no code block; the heading then counts
    assert r.n_code_blocks == 0 and r.n_headings == 1


def test_markdown_strip_zero_exchanges(spark):
    from openset_spark.pipeline.cleaning import markdown_strip

    df = spark.createDataFrame(
        [(1, "# t\nx")], "doc_id long, text string"
    )
    plan = (
        markdown_strip(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
