"""Table catalog + JSON insert ingest + batch query composition —
the reference's table-management / insert / batch endpoints
(docs/rest/README.md:28-158,379-418, src/rpc_insert.cpp)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from openset_spark.plans.batch import (
    BatchQuery,
    HistogramSpec,
    PropertySpec,
    run_batch,
)
from openset_spark.operators.segments import Segment
from openset_spark.sources.catalog import PropertyDef, TableDef
from openset_spark.sources.json_events import customer_snapshot, parse_events

HIGHSTREET = TableDef(
    name="highstreet",
    id_type="textual",
    properties=(
        PropertyDef("product_name", "text"),
        PropertyDef("product_price", "double"),
        PropertyDef("product_tags", "text", is_set=True),
        PropertyDef("cart_size", "int"),
        PropertyDef("age", "int", is_customer=True),
    ),
    event_order=("purchase", "purchase_item"),
)


def test_catalog_schemas_and_describe_roundtrip():
    es = HIGHSTREET.event_schema()
    assert [f.name for f in es.fields] == [
        "user_id", "ts", "event_type",
        "product_name", "product_price", "product_tags", "cart_size",
    ]
    assert isinstance(es["user_id"].dataType, StringType)  # textual ids
    assert isinstance(es["product_tags"].dataType, ArrayType)  # is_set
    cs = HIGHSTREET.customer_schema()
    assert [f.name for f in cs.fields] == ["user_id", "age"]
    assert TableDef.from_describe(HIGHSTREET.describe()) == HIGHSTREET


def test_catalog_property_management_and_validation():
    t2 = HIGHSTREET.with_property(PropertyDef("shipper", "text"))
    assert "shipper" in [p.name for p in t2.properties]
    t3 = t2.drop_property("shipper")
    assert t3 == HIGHSTREET
    with pytest.raises(ValueError):
        PropertyDef("9bad", "text")
    with pytest.raises(ValueError):
        PropertyDef("ok", "float")  # not a reference type
    with pytest.raises(ValueError):
        TableDef("t", properties=(PropertyDef("a", "int"), PropertyDef("a", "int")))


def _insert_lines(spark, objs):
    return spark.createDataFrame([(json.dumps(o),) for o in objs], "value string")


INSERTS = [
    {"uuid": "u1", "stamp": 1_458_820_830_000, "event": "purchase",
     "product_name": "hammer", "product_price": 9.99,
     "product_tags": ["tools", "red"], "cart_size": 2, "age": 30},
    {"uuid": "u1", "stamp": 1_458_820_840_000, "event": "view",
     "product_name": "saw"},
    {"uuid": "u2", "stamp": 1_458_820_850_000, "event": "purchase",
     "product_name": "drill", "product_price": 79.99, "age": 41},
    # later event for u1 without age: must NOT clobber the fact
    {"uuid": "u1", "stamp": 1_458_820_860_000, "event": "view"},
]


def test_parse_events_typed(spark):
    ev = parse_events(_insert_lines(spark, INSERTS), HIGHSTREET)
    assert [f.name for f in ev.schema.fields] == [
        "user_id", "ts", "event_type",
        "product_name", "product_price", "product_tags", "cart_size",
    ]
    rows = {(r.user_id, r.event_type, r.product_name) for r in ev.collect()}
    assert ("u1", "purchase", "hammer") in rows
    assert ("u2", "purchase", "drill") in rows
    first = ev.filter(F.col("product_name") == "hammer").collect()[0]
    assert first.product_tags == ["tools", "red"]  # is_set -> array
    assert first.ts.second == 30  # ms stamp -> exact timestamp


def test_customer_snapshot_latest_nonnull_wins(spark):
    snap = customer_snapshot(_insert_lines(spark, INSERTS), HIGHSTREET)
    got = {r.user_id: r.age for r in snap.collect()}
    # u1's age came on the first event; later fact-less events keep it
    assert got == {"u1": 30, "u2": 41}


def test_run_batch_combined(spark):
    ev = parse_events(_insert_lines(spark, INSERTS), HIGHSTREET)
    batch = BatchQuery(
        segments=(Segment("buyers", F.col("event_type") == "purchase"),),
        use=("buyers",),
        properties=(PropertySpec("product_name"),),
        histograms=(
            HistogramSpec(
                "spend",
                scalar=lambda e: e.filter(F.col("event_type") == "purchase")
                .groupBy("user_id")
                .agg(F.sum("product_price").alias("spend")),
                bucket=50.0,
            ),
        ),
    )
    out = run_batch(ev, batch)
    segs = {(r.segment, r.people) for r in out["segments"].collect()}
    assert segs == {("buyers", 2)}
    props = {
        (r.value, r.people, r.buyers_people)
        for r in out["property:product_name"].collect()
    }
    assert ("hammer", 1, 1) in props and ("saw", 1, 1) in props
    hist = {(r.spend, r.people) for r in out["histogram:spend"].collect()}
    assert hist == {(0.0, 1), (50.0, 1)}
    ev.unpersist()


def test_set_property_predicates(spark):
    from openset_spark.functions.sets import (
        contains,
        contains_all,
        contains_any,
        set_eq,
    )

    ev = parse_events(_insert_lines(spark, INSERTS), HIGHSTREET)
    tagged = ev.filter(F.col("product_tags").isNotNull())
    assert tagged.filter(contains(F.col("product_tags"), "red")).count() == 1
    assert (
        tagged.filter(contains_any(F.col("product_tags"), ["red", "blue"])).count()
        == 1
    )
    assert (
        tagged.filter(contains_all(F.col("product_tags"), ["red", "tools"])).count()
        == 1
    )
    assert (
        tagged.filter(contains_all(F.col("product_tags"), ["red", "huge"])).count()
        == 0
    )
    assert (
        tagged.filter(set_eq(F.col("product_tags"), ["red", "tools"])).count() == 1
    )
    # per-user `ever(any [...])` composes with the segment machinery
    from openset_spark.operators.segments import Segment, membership

    m = membership(
        ev, [Segment("tooled", contains_any(F.col("product_tags"), ["tools"]))]
    )
    got = {r.user_id: r.tooled for r in m.collect()}
    assert got == {"u1": True, "u2": False}


def test_result_tree_from_rollup(spark):
    from openset_spark.operators.events import event_aggregate_rollup
    from openset_spark.plans.result_tree import to_result_tree

    df = spark.createDataFrame(
        [
            (1, 1, "p", "x"), (2, 1, "p", "y"), (3, 2, "p", "x"),
            (4, 2, "q", "x"),
        ],
        "event_id long, user_id long, event_type string, tag string",
    )
    roll = event_aggregate_rollup(
        df, ["event_type", "tag"], [("count", "event_id", "events")]
    )
    tree = to_result_tree(roll, ["event_type", "tag"], ["people", "events"])
    # root totals: 2 people, 4 events
    assert tree["c"] == [2, 4]
    top = {n["g"]: n for n in tree["_"]}
    assert top["p"]["c"] == [2, 3] and top["q"]["c"] == [1, 1]
    p_kids = {n["g"]: n["c"] for n in top["p"]["_"]}
    assert p_kids == {"x": [2, 2], "y": [1, 1]}
    assert "_" not in top["q"] or {n["g"] for n in top["q"]["_"]} == {"x"}


def test_document_corpus_readers(spark, tmp_path_factory):
    """Every corpus ingest format normalizes to (doc_id, text, source)
    and content-hashed ids are reproducible across re-reads and
    partitionings — the property downstream dedup/sampling relies on."""
    import json as _json

    from openset_spark.sources.documents import (
        read_documents,
        read_documents_csv,
        read_documents_jsonl,
        read_documents_text_files,
        read_documents_text_lines,
    )

    d = tmp_path_factory.mktemp("corpus")
    # jsonl with ids and a metadata field
    with open(d / "a.jsonl", "w") as f:
        for i, t in enumerate(["hello world", "the rain in spain"]):
            f.write(_json.dumps({"doc_id": i, "text": t, "lang": "en"}) + "\n")
    jl = read_documents_jsonl(
        spark, str(d / "a.jsonl"), meta_fields=("lang",)
    ).collect()
    assert {(r.doc_id, r.text, r.lang) for r in jl} == {
        (0, "hello world", "en"),
        (1, "the rain in spain", "en"),
    }
    assert all(r.source.endswith("a.jsonl") for r in jl)

    # csv with a quoted embedded newline
    with open(d / "b.csv", "w") as f:
        f.write('doc_id,text\n7,"line one\nline two"\n8,plain\n')
    cs = {r.doc_id: r.text for r in read_documents_csv(spark, str(d / "b.csv")).collect()}
    assert cs == {7: "line one\nline two", 8: "plain"}

    # one file per document
    sub = tmp_path_factory.mktemp("files")
    (sub / "x.txt").write_text("document x body")
    (sub / "y.txt").write_text("document y body")
    tf = read_documents_text_files(spark, str(sub)).collect()
    assert {r.text for r in tf} == {"document x body", "document y body"}
    assert len({r.doc_id for r in tf}) == 2

    # one line per document, blanks dropped
    (d / "c.txt").write_text("alpha\n\nbeta\n")
    tl = read_documents_text_lines(spark, str(d / "c.txt")).collect()
    assert {r.text for r in tl} == {"alpha", "beta"}

    # content-hashed ids are reproducible across reads AND repartitioning
    a = {r.text: r.doc_id for r in read_documents(spark, str(sub), "text_files").collect()}
    b = {
        r.text: r.doc_id
        for r in read_documents(spark, str(sub), "text_files").repartition(8).collect()
    }
    assert a == b

    # ... AND across a corpus move/re-mount: the source label is
    # relative to the ingest root, so the same layout in a different
    # directory yields identical ids (dedup/sampling stability)
    import shutil as _sh

    moved = tmp_path_factory.mktemp("relocated") / "corpus"
    _sh.copytree(str(sub), str(moved))
    c = {r.text: r.doc_id for r in read_documents(spark, str(moved), "text_files").collect()}
    assert c == a
    mv_src = {r.source for r in read_documents(spark, str(moved), "text_files").collect()}
    assert mv_src == {"x.txt", "y.txt"}

    # ... AND when the root contains URI-hostile characters: the
    # percent-encoded input_file_name() is url-decoded before the
    # prefix strip, so spaces / non-ASCII / '+' in the path still get
    # relative labels and mount-portable ids (ADVICE r6)
    hostile = tmp_path_factory.mktemp("weird") / "my corpus+v2 ü"
    _sh.copytree(str(sub), str(hostile))
    hs = read_documents(spark, str(hostile), "text_files").collect()
    assert {r.source for r in hs} == {"x.txt", "y.txt"}
    assert {r.text: r.doc_id for r in hs} == a
