"""OSL query-index culling — the Spark analog of the reference's
bitmap index compiler (src/queryindexing.h; test/test_db.h "index
compiler" suite): where-clause terms become per-user existence flags
combined with the clause's boolean structure, producing a candidate
semi-join applied BEFORE the per-user stages. Computed properties and
script variables degrade exactly where the reference's compiler emits
PUSH_VAL NONE; an unindexable OR arm disables culling entirely.

Culling is opt-in (`compile_osl(..., cull=True)`) — Spark semi-joins
are not free the way the reference's bitmaps are — and must NEVER
change results.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openset_spark.osl import compile_osl
from openset_spark.sources.tables import load_table
from tests.test_plans import plan_str

CM = {"event": "event_type"}


def _rows(q, ev):
    return sorted(
        tuple(r) for r in q.dataframe(ev, now_ms=1_700_000_000_000).collect()
    )


def _compare(spark, sf_dir, script):
    ev = load_table(spark, sf_dir, "events")
    plain = compile_osl(script, column_map=CM)
    culled = compile_osl(script, column_map=CM, cull=True)
    a, b = _rows(plain, ev), _rows(culled, ev)
    assert a == b and len(a) > 0, (len(a), len(b))
    return plain, culled, ev


def test_equality_where_culls_and_preserves_results(spark, sf_dir):
    script = """
    select
      count id as people
    end

    each_row where event.is(== "purchase") && value > 100
        << event
    end
    """
    plain, culled, ev = _compare(spark, sf_dir, script)
    h = culled.index_hints()
    assert h["cullable"] and all(t["indexed"] for t in h["terms"])
    # the semi-join drops non-candidate users' rows entirely (every
    # sf0.001 user qualifies, so prove the drop on a crafted frame:
    # user 2 never purchases, user 3 purchases only under the value
    # bar — both must vanish with ALL their rows)
    tiny = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00", "purchase", 150.0),
            (2, 1, "2024-01-01 01:00:00", "view", 0.0),
            (3, 2, "2024-01-01 00:00:00", "view", 0.0),
            (4, 3, "2024-01-01 00:00:00", "purchase", 50.0),
        ],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    kept = culled._apply_cull(tiny, 0)
    assert {r.user_id for r in kept.select("user_id").collect()} == {1}
    assert kept.count() == 2  # BOTH of user 1's rows survive


def test_never_and_is_not_terms_index_as_negated_flags(spark, sf_dir):
    script = """
    select
      count id as people
    end

    each_row where value.never(> 190) && event.is(== "purchase")
        << event
    end
    """
    plain, culled, ev = _compare(spark, sf_dir, script)
    h = culled.index_hints()
    assert h["cullable"]
    modes = {t.get("mode") for t in h["terms"] if t["indexed"]}
    assert "never" in modes
    # purchase-having users who never crossed the value bar
    n_culled = culled._apply_cull(ev, 0).select("user_id").distinct().count()
    manual = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("value") > 190, 1)).alias("e"),
            F.max(F.when(F.col("event_type") == "purchase", 1)).alias("p"),
        )
        .filter((F.col("e").isNull()) & (F.col("p") == 1))
        .count()
    )
    assert n_culled == manual > 0


def test_session_reference_degrades(spark, sf_dir):
    # test_db.h "index compiler cull session": a computed property
    # cannot pre-cull; the query must still run (cull silently off)
    script = """
    select
      count id as people
    end

    each_row where event.is(!= "blog") && session.is(== 2)
        << event
    end
    """
    plain, culled, ev = _compare(spark, sf_dir, script)
    h = culled.index_hints()
    # the session arm degrades, but the conjunction still culls on
    # the indexable != term — the reference's index likewise keeps
    # the table-column hint and pushes NONE for the session arm
    assert h["cullable"]
    assert any(
        t.get("why") == "computed property" and t["prop"] == "session"
        for t in h["terms"]
    )
    assert any(t["indexed"] for t in h["terms"])


def test_script_variable_degrades(spark, sf_dir):
    # test_db.h "index compiler cull user variable": comparing a
    # script variable carries no per-user index information — BUT a
    # variable used as the VALUE side resolves to a literal and stays
    # indexable
    script_var_prop = """
    select
      count id as people
    end

    some_flag = 1

    each_row where some_flag.is(== 1) && event.is(== "purchase")
        << event
    end
    """
    plain, culled, ev = _compare(spark, sf_dir, script_var_prop)
    h = culled.index_hints()
    # the variable arm degrades; the conjunction still culls on the
    # event term
    assert h["cullable"]
    assert any(t.get("why") == "script variable" for t in h["terms"])

    # a variable as the ONLY term: nothing to index at all
    script_var_only = """
    select
      count id as people
    end

    some_flag = 1

    each_row where some_flag.is(== 1)
        << event
    end
    """
    _, culled_only, _ = _compare(spark, sf_dir, script_var_only)
    assert not culled_only.index_hints()["cullable"]

    script_var_value = """
    select
      count id as people
    end

    wanted = "purchase"

    each_row where event.is(== wanted)
        << event
    end
    """
    _, culled2, _ = _compare(spark, sf_dir, script_var_value)
    assert culled2.index_hints()["cullable"]


def test_unindexable_or_arm_disables_culling(spark, sf_dir):
    script = """
    select
      count id as people
    end

    each_row where event.is(== "purchase") || session.is(== 1)
        << event
    end
    """
    plain, culled, ev = _compare(spark, sf_dir, script)
    assert not culled.index_hints()["cullable"]
    # ...while an unindexable AND arm merely weakens the index
    script_and = """
    select
      count id as people
    end

    each_row where event.is(== "purchase") && session.is(>= 1)
        << event
    end
    """
    _, culled2, _ = _compare(spark, sf_dir, script_and)
    assert culled2.index_hints()["cullable"]


def test_cull_semi_join_sits_before_session_window(spark, sf_dir):
    """Plan shape: the candidate semi-join must prune people BEFORE
    the session computation's per-user window (the whole point — the
    reference scans only indexed people)."""
    ev = load_table(spark, sf_dir, "events")
    script = """
    select
      count id as people
    end

    each_row where event.is(== "purchase") && session.is(>= 1)
        << event
    end
    """
    q = compile_osl(script, column_map=CM, cull=True)
    plan = plan_str(q.dataframe(ev, now_ms=0), "simple")
    semi = plan.find("LeftSemi")
    win = plan.find("Window")
    assert semi != -1 and win != -1
    # simple-mode plans print top-down: the window consumes the
    # semi-join's output, so Window appears ABOVE (before) LeftSemi
    assert win < semi, plan


def test_engine_osl_threads_cull_and_zorder(spark, sf_dir):
    """The facade must hand both the declared z-order AND the cull
    switch to the compiler (the z-order passthrough was silently
    missing before r6)."""
    from openset_spark.engine import OpenSetEngine

    order = ["signup", "purchase", "error", "click", "view"]
    eng = OpenSetEngine(spark, sf_dir, event_order=order)
    script = """
    select
      count id as people
    end

    each_row where event.is(== "purchase")
        << event
    end
    """
    plain = sorted(tuple(r) for r in eng.osl(script, column_map=CM).collect())
    culled = sorted(
        tuple(r) for r in eng.osl(script, column_map=CM, cull=True).collect()
    )
    assert plain == culled and len(plain) > 0
    plan = eng.osl(script, column_map=CM, cull=True, debug=True)
    assert "LeftSemi" in plan


def test_degraded_or_inside_and_leaves_no_orphan_flags(spark, sf_dir):
    """When an OR arm degrades inside an enclosing AND, the AND drops
    the OR — and every existence flag the OR's live arms appended
    must go with it (ADVICE r6: orphan flags were computed in the
    candidate aggregate but referenced by no formula). The surviving
    index program is exactly the indexable AND arm."""
    script = """
    select
      count id as people
    end

    each_row where event.is(== "purchase") && (value > 100 || session.is(== 1))
        << event
    end
    """
    plain, culled, ev = _compare(spark, sf_dir, script)
    h = culled.index_hints()
    assert h["cullable"]
    indexed = [t for t in h["terms"] if t.get("indexed")]
    # only the AND's own arm survives; the poisoned OR contributes no
    # flags (value's flag would be the orphan) and its degradation
    # reason is still reported
    assert [t["prop"] for t in indexed] == ["event"]
    assert indexed[0]["flag"] == 0
    assert any(
        t["prop"] == "session" and not t["indexed"] for t in h["terms"]
    )
    # the candidate aggregate computes exactly ONE flag
    terms, formulas, _ = culled._cull_plan(1_700_000_000_000)
    assert len(terms) == 1 and formulas is not None


def test_poisoned_top_level_or_truncates_all_terms(spark, sf_dir):
    """A top-level OR with an unindexable arm disables culling AND
    leaves an empty term list (no orphan aggregates)."""
    script = """
    select
      count id as people
    end

    each_row where event.is(== "purchase") || session.is(== 1)
        << event
    end
    """
    _, culled, _ = _compare(spark, sf_dir, script)
    terms, formulas, hints = culled._cull_plan(1_700_000_000_000)
    assert formulas is None and terms is None
    # the live arm's flag was truncated with the poisoned OR: no hint
    # claims an indexed flag
    assert not any(t.get("indexed") for t in hints)
