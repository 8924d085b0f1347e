"""OSL front-end: replay the reference's own doc/test scripts
(test/test_osl_language.h, docs/osl/language_reference.md) against the
compiled Spark plans.

The fixture mirrors the reference's user1 fruit timeline verbatim
(5 purchases, one customer, 1-second stamps) so each script's expected
match counts are the reference's own assertions."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from openset_spark.osl import OslUnsupported, compile_osl

BASE = datetime(2016, 3, 24, 12, 0, 30, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def fruit_events(spark):
    # test_osl_language.h user1_raw_inserts: 5 purchases @ 1s apart
    rows = [
        ("user1", i, "purchase", BASE.replace(second=30 + i), fruit, price)
        for i, (fruit, price) in enumerate(
            [
                ("orange", 5.55),
                ("apple", 9.95),
                ("pear", 12.49),
                ("banana", 2.49),
                ("orange", 5.55),
            ]
        )
    ]
    return spark.createDataFrame(
        rows, "user_id string, event_id long, event_type string, ts timestamp, fruit string, price double"
    )


def _counts(script, events):
    return [df.count() for df in compile_osl(script).matched_blocks(events)]


# ----------------------------------------------------- reference tests
def test_each_ever_never(fruit_events):
    # "test OSL each": 4 scans, debug fires twice (blocks 2 and 4)
    script = """
    each_row where fruit.is(== "banana") && fruit.ever(== "donkey")
        debug(true)
    end

    each_row where fruit.is(== "banana") && fruit.ever(== "pear")
        debug(true)
    end

    each_row where fruit.is(== "banana") && fruit.never(== "pear")
        debug(true)
    end

    each_row where fruit.is(== "banana")
        debug(true)
    end
    """
    assert _counts(script, fruit_events) == [0, 1, 0, 1]


def test_each_row_limit(fruit_events):
    # "test OSL each_row with limit": counter == 2
    script = """
    counter = 0

    each_row.limit(2) where event == "purchase"
      counter = counter + 1
    end

    debug(counter == 2)
    """
    assert _counts(script, fruit_events) == [2]


def test_each_row_range(fruit_events):
    # "test OSL each_row .range": 3 matches, stamps ascending
    script = """
    counter = 0

    each_row.range("2016-03-24T12:00:30+00:00", "2016-03-24T12:00:32+00:00") where event == "purchase"
      counter = counter + 1
      debug(stamp)
    end

    debug(counter == 3)
    """
    q = compile_osl(script)
    rows = q.matched(fruit_events).collect()
    # inclusive bounds: stamps :30, :31, :32 of the 5-row timeline
    assert sorted(r.ts.second for r in rows) == [30, 31, 32]


def test_each_row_range_reverse(fruit_events):
    # "test OSL each_row .range .reverse": same 3, visited newest-first
    script = """
    each_row.reverse().range("2016-03-24T12:00:30+00:00", "2016-03-24T12:00:32+00:00") where event == "purchase"
      debug(stamp)
    end
    """
    rows = compile_osl(script).matched(fruit_events).orderBy("match_n").collect()
    assert len(rows) == 3
    assert [r.ts for r in rows] == sorted((r.ts for r in rows), reverse=True)


def test_each_row_continue_no_advance(fruit_events):
    # "test OSL each_row .continue (no advance)": counter == 5
    script = """
    each_row.limit(1) where event.is(== "purchase")
      each_row.continue() where event.is(== "purchase")
        counter = counter + 1
      end
    end
    """
    assert _counts(script, fruit_events) == [5]


def test_each_row_continue_next(fruit_events):
    # "test OSL each_row .continue .next (with advance)": counter == 4
    script = """
    each_row.limit(1) where event.is(== "purchase")
      each_row.continue().next() where event.is(== "purchase")
        counter = counter + 1
      end
    end
    """
    assert _counts(script, fruit_events) == [4]


def test_each_row_from(fruit_events):
    # "test OSL each_row .from": counter == 3
    script = """
    each_row.from(2) where event.is(== "purchase")
      counter = counter + 1
    end
    """
    assert _counts(script, fruit_events) == [3]


# ------------------------------------------------- doc example scripts
def test_select_count_id_pivot(fruit_events):
    # language_reference.md "<< push to aggregator": count id by pivot
    script = """
    select
      count id
    end

    each_row where event.is(== "purchase")
        << fruit
    end
    """
    out = compile_osl(script).dataframe(fruit_events)
    got = {r.fruit: r.people for r in out.collect()}
    assert got == {"orange": 1, "apple": 1, "pear": 1, "banana": 1}


def test_select_sum_alias(fruit_events):
    script = """
    select
      count id
      sum price as total
    end

    each_row where event.is(== "purchase")
        << fruit
    end
    """
    out = compile_osl(script).dataframe(fruit_events)
    got = {r.fruit: r.total for r in out.collect()}
    assert got["orange"] == pytest.approx(11.10)
    assert got["banana"] == pytest.approx(2.49)


def test_get_day_of_week_pivot(fruit_events):
    # doc: count all people that purchased by day of week
    script = """
    each_row where event.is(== "purchase")
        << get_day_of_week(event_time)
    end
    """
    out = compile_osl(script).dataframe(fruit_events)
    rows = out.collect()
    # 2016-03-24 is a Thursday (Spark dayofweek: Sun=1 .. Thu=5)
    assert len(rows) == 1 and rows[0][0] == 5 and rows[0].people == 1


def test_bucket_row_count_pivot(fruit_events):
    # doc: << bucket( row_count, 5 )
    script = """
    each_row where event.is(== "purchase")
        << bucket( row_count, 5 )
    end
    """
    out = compile_osl(script).dataframe(fruit_events)
    rows = out.collect()
    assert len(rows) == 1 and rows[0][0] == 5 and rows[0].people == 1


def test_session_pivot(fruit_events):
    # doc "Session Functions": session.is(== n) with << pivot
    script = """
    select
      count id
    end

    each_row where event.is(== "purchase") && session.is(== 1)
        << fruit
    end
    """
    out = compile_osl(script).dataframe(fruit_events)
    assert out.count() == 4  # all rows in one 30-min session


def test_never_with_window(fruit_events):
    # doc: property.within(span, now).never(== value)
    now_ms = int(BASE.timestamp() * 1000) + 10_000
    script = """
    each_row where fruit.within(1_hour, now).never(== "dog") && event.is(== "purchase")
      debug(true)
    end
    """
    q = compile_osl(script)
    assert q.matched(fruit_events, now_ms=now_ms).count() == 5
    script2 = """
    each_row where fruit.within(1_hour, now).never(== "pear") && event.is(== "purchase")
      debug(true)
    end
    """
    assert compile_osl(script2).matched(fruit_events, now_ms=now_ms).count() == 0


def test_start_of_month_pivot(fruit_events):
    script = """
    each_row where event.is(== "purchase")
        << start_of_month(event_time)
    end
    """
    out = compile_osl(script).dataframe(fruit_events).collect()
    month_start_ms = int(
        datetime(2016, 3, 1, tzinfo=timezone.utc).timestamp() * 1000
    )
    assert len(out) == 1 and out[0][0] == month_start_ms


def test_if_guarded_push_applies_guard(fruit_events):
    # a variable-logic if around debug() replays as a no-op on the row
    # set; an if guarding a << push is semantic — the round-3 compiler
    # ANDs the guard into the push predicate, so price <= 5 rows
    # (banana @ 2.49) drop out of the pivot.
    script_ok = """
    each_row where event == "purchase"
      if price > 5
        debug(true)
      end
    end
    """
    assert _counts(script_ok, fruit_events) == [5]
    out = compile_osl(
        """
        each_row where event == "purchase"
          if price > 5
            << fruit
          end
        end
        """
    ).dataframe(fruit_events)
    got = {r.fruit: r.people for r in out.collect()}
    assert got == {"orange": 1, "apple": 1, "pear": 1}


def test_reference_basic_logic_script_replays():
    # "test OSL basic logic" (test_osl_language.h:203-240): top-level
    # variable logic only — parses clean, defines no scans
    script = """
    test_value = 123
    some_list = ["apple", "orange", "pear", "banana"]

    if test_value == 123
       debug(true)
    end

    if test_value != 321
       debug(true)
    end

    if "peach" in some_list || "plum" in some_list
       debug(true)
    end
    """
    q = compile_osl(script)
    assert q.script.blocks == []


def test_reference_for_break_script_replays():
    # "test OSL for/break" (test_osl_language.h:340-362): nested
    # for/if/break over variables — a no-op for the row set
    script = """
    number_list = ["one", "two", "three", "four", "five", "six", "seven"]
    letter_list = ["a", "b", "c", "d"]

    counter = 0
    for number in number_list

      for letter in letter_list
        if number == "three" && letter == "c"
          break(2)
        end
        counter = counter + 1
      end

    end

    debug(counter == 10)
    """
    q = compile_osl(script)
    assert q.script.blocks == []


def test_return_inside_if_still_raises():
    with pytest.raises(OslUnsupported):
        compile_osl(
            """
            each_row where event == "purchase"
              if price > 5
                return(true)
              end
            end
            """
        )


def test_sort_section(fruit_events):
    script = """
    select
      count id
      sum price as total
    end

    each_row where event.is(== "purchase")
        << fruit
    end

    sort
      total asc
    end
    """
    out = compile_osl(script).dataframe(fruit_events).collect()
    totals = [r.total for r in out]
    assert totals == sorted(totals)


def test_multi_scan_pushes_merge_into_one_tree(fruit_events):
    # two sections pushing the same pivot shape: rows merge into ONE
    # aggregator tree (the reference merges all sections' pushes)
    script = """
    select
      count id
      count fruit as rows
    end

    each_row where fruit.is(== "banana")
      << event
    end

    each_row where fruit.is(== "pear")
      << event
    end
    """
    out = compile_osl(script).dataframe(fruit_events)
    rows = {r["event"]: (r["people"], r["rows"]) for r in out.collect()}
    # both scans matched rows of the same single customer
    assert rows == {"purchase": (1, 2)}


def test_customer_props_readable_in_scripts(spark, fruit_events):
    # is_customer properties (language_reference.md:102-117): a
    # per-user frame joined on user_col, readable like row props
    cust = spark.createDataFrame(
        [("user1", "gold")], "user_id string, tier string"
    )
    script = """
    select
      count id
    end

    each_row where tier.is(== "gold") && fruit.is(== "banana")
      << event, tier
    end
    """
    q = compile_osl(script)
    out = q.__class__(
        q.script, customer_df=cust
    ).dataframe(fruit_events)
    rows = [(r["event"], r["tier"], r["people"]) for r in out.collect()]
    assert rows == [("purchase", "gold", 1)]


def test_engine_osl_endpoint(spark):
    from openset_spark.engine import OpenSetEngine

    eng = OpenSetEngine(spark, "/root/testdata/sf0.001")
    out = eng.osl(
        "select\n  count id\nend\n\n"
        'each_row where event.is(== "purchase")\n  << event\nend'
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["event"] == "purchase"
    want = (
        eng.events.filter(F.col("event_type") == "purchase")
        .select("user_id").distinct().count()
    )
    assert rows[0]["people"] == want


def test_select_session_without_body_reference(fruit_events):
    # `select max session` must trigger sessionization even when no
    # where/push mentions the session column (regression: the session
    # walk only covered each_row bodies)
    script = """
    select
      max session as max_session
    end

    each_row where event.is(== "purchase")
        << fruit
    end
    """
    out = compile_osl(script).dataframe(fruit_events)
    rows = out.collect()
    assert len(rows) == 4
    assert all(r.max_session >= 1 for r in rows)


def test_literal_pushes_merge_positionally(fruit_events):
    # the reference's common idiom: different << lines tally different
    # literal branch labels into ONE grouping column of the merged
    # result tree (pivot keyed by position, not by derived name)
    script = """
    select
      count id
    end

    each_row where fruit.is(== "orange")
        << "citrus"
    end

    each_row where fruit.is(== "banana")
        << "tropical"
    end
    """
    out = compile_osl(script).dataframe(fruit_events)
    got = {r[0]: r.people for r in out.collect()}
    assert got == {"citrus": 1, "tropical": 1}


def test_pushes_still_reject_arity_mismatch(fruit_events):
    script = """
    each_row where fruit.is(== "orange")
        << "a"
    end

    each_row where fruit.is(== "banana")
        << "b", fruit
    end
    """
    with pytest.raises(OslUnsupported, match="arity"):
        compile_osl(script).dataframe(fruit_events)


def test_negative_literal_in_where(fruit_events):
    # unary minus in comparator values
    script = """
    each_row where price.is(> -1.5)
        debug(true)
    end
    """
    assert _counts(script, fruit_events) == [5]
    script2 = """
    each_row where price.is(< -1.5)
        debug(true)
    end
    """
    assert _counts(script2, fruit_events) == [0]


def test_session_property_scan(spark):
    # reference test_sessions.h: `if session == 2: debug(True)` — the
    # scan auto-sessionizes when the where clause references `session`
    from datetime import timedelta

    stamps = [
        BASE,
        BASE + timedelta(minutes=5),
        BASE + timedelta(hours=1),
        BASE + timedelta(hours=1, minutes=2),
        BASE + timedelta(hours=3),
    ]
    rows = [("u1", i, "purchase", ts, float(i)) for i, ts in enumerate(stamps)]
    ev = spark.createDataFrame(
        rows,
        "user_id string, event_id long, event_type string, ts timestamp,"
        " value double",
    )
    q = compile_osl("each_row where session == 2\n  debug(true)\nend")
    assert q.matched(ev).count() == 2  # the two events of session 2


def test_aggregator_with_and_all_options(fruit_events):
    # language_reference.md:25-29 `[with {{other key}}] [all]`:
    # `count id with fruit` counts distinct fruit values per group
    # (the alternate distinct key of queryinterpreter.cpp:229);
    # `count id all` counts every matched row (nonDistinct, :219)
    out = compile_osl(
        """
        select
          count id with fruit as n_fruits
          count id all as n_rows
          sum price as total
        end

        each_row where event.is(== "purchase")
            << "basket"
        end
        """
    ).dataframe(fruit_events)
    row = out.collect()[0]
    # 5 purchases, 4 distinct fruits (orange twice), one customer
    assert row.n_fruits == 4
    assert row.n_rows == 5
    assert row.total == pytest.approx(36.03)


def test_multi_push_default_dedups_rows_all_does_not(fruit_events):
    # two scans match overlapping rows into the SAME group: default
    # sums each (row, group) once; `all` counts every visit
    script = """
    select
      sum price as total
      count id all as visits
    end

    each_row where event.is(== "purchase")
        << "g"
    end

    each_row where event.is(== "purchase") && price > 6
        << "g"
    end
    """
    row = compile_osl(script).dataframe(fruit_events).collect()[0]
    # default sum: the 5 rows once each = 36.03 (NOT + the two > 6 again)
    assert row.total == pytest.approx(36.03)
    # all-visits count: 5 + 2 rows matched by the second scan
    assert row.visits == 7


def test_sort_group(fruit_events):
    # REST `sort=group`: order the result by the grouping names
    script = """
    each_row where event.is(== "purchase")
        << fruit
    end

    sort
      group asc
    end
    """
    out = compile_osl(script).dataframe(fruit_events).collect()
    assert [r.fruit for r in out] == ["apple", "banana", "orange", "pear"]


def test_query_params_override_script_variables(fruit_events):
    # REST str_/int_/dbl_/bool_{var} query params
    # (docs/rest/README.md:233-236): the supplied value overrides the
    # same-named script variable
    script = """
    min_price = 0

    each_row where event == "purchase" && price > min_price
      debug(true)
    end
    """
    assert (
        compile_osl(script, column_map={"event": "event_type"})
        .matched(fruit_events)
        .count()
        == 5
    )
    assert (
        compile_osl(
            script, column_map={"event": "event_type"}, params={"min_price": 6}
        )
        .matched(fruit_events)
        .count()
        == 2
    )


def test_for_over_set_push_explodes(spark):
    # test_db.h:225 "iterate a Set column in row" — the push inside
    # `for ref in referral_search` emits one result row per set
    # element; nil sets and nil pages contribute nothing
    rows = [
        ("u1", 0, "view", BASE, "home", "google", ["red", "blue"]),
        ("u1", 1, "view", BASE.replace(second=31), None, "x", ["zzz"]),
        ("u1", 2, "view", BASE.replace(second=32), "docs", "bing", None),
        ("u1", 3, "view", BASE.replace(second=33), "blog", "google", ["red"]),
    ]
    events = spark.createDataFrame(
        rows,
        "user_id string, event_id long, event_type string, ts timestamp,"
        " page string, referral_source string, referral_search array<string>",
    )
    out = compile_osl(
        """
        select
          count id
        end

        each_row where page.is(!= nil)
            for ref in referral_search
                << referral_source, ref
            end
        end
        """
    ).dataframe(events)
    got = {(r.referral_source, r.ref): r.people for r in out.collect()}
    assert got == {
        ("google", "red"): 1,
        ("google", "blue"): 1,
    }


def test_each_row_limit_respects_declared_zorder(spark):
    """A compiled each_row.limit(1) grid honors the table's declared
    z-order (test/test_zorder.h zOrder property): the same-stamp pair
    resolves by priority, not insertion id."""
    import datetime as _dt

    from openset_spark.osl import compile_osl

    stamp = _dt.datetime(2024, 1, 1, 12, 0)
    events = spark.createDataFrame(
        [
            (1, stamp, 7, "view", 1.0),
            (2, stamp, 7, "purchase", 2.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    script = """
    select
      count id as people
    end

    each_row.limit(1) where event != "nothing"
        << event
    end
    """
    with_z = compile_osl(
        script, event_order=["purchase", "view"]
    ).dataframe(events)
    assert [r[0] for r in with_z.collect()] == ["purchase"]
    without = compile_osl(script).dataframe(events)
    assert [r[0] for r in without.collect()] == ["view"]
