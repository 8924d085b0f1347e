"""Replay the reference's imperative OSL scripts through
ScriptRunner.replay and assert the debug VALUES, not just the parse.

Scripts are taken verbatim from test/test_osl_language.h (the
reference's TestScriptRunner suite); its ASSERTDEBUGLOG asserts every
logged value is true, so the expected log is [True] * n. The fixture
is the same user1 fruit timeline tests/test_osl.py uses."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from openset_spark.osl import OslUnsupported
from openset_spark.osl.lang import ScriptRunner

BASE = datetime(2016, 3, 24, 12, 0, 30, tzinfo=timezone.utc)

FRUITS = [
    ("orange", 5.55),
    ("apple", 9.95),
    ("pear", 12.49),
    ("banana", 2.49),
    ("orange", 5.55),
]


@pytest.fixture(scope="module")
def fruit_events(spark):
    rows = [
        ("user1", i, "purchase", BASE.replace(second=30 + i), fruit, price)
        for i, (fruit, price) in enumerate(FRUITS)
    ]
    return spark.createDataFrame(
        rows,
        "user_id string, event_id long, event_type string, ts timestamp,"
        " fruit string, price double",
    )


def test_basic_assign_and_multiply(fruit_events):
    # test_osl_language.h "test OSL basic assign and multiply"
    log = ScriptRunner(
        """
        test_value = 123
        new_value = test_value * 2
        debug(test_value == 123)
        debug(new_value == 246)
        """
    ).replay(fruit_events)
    assert log == [True, True]


def test_basic_containers(fruit_events):
    # "test OSL basic containers": 10 debugs, all true
    log = ScriptRunner(
        """
        test_value = ["apple", "pear", "orange"]
        debug(test_value[0] == "apple")
        debug(test_value[1] != "apple")
        debug(test_value[2] == "orange")
        debug(len(test_value) == 3)
        debug("apple" in test_value)
        debug((test_value contains "donkey") == false)
        debug(test_value contains ["apple", "pear"])
        debug((test_value contains ["apple", "duck"]) == false)
        debug(test_value any ["donkey", "apple", "bear"])
        debug((test_value any ["donkey", "duck", "bear"]) == false)
        """
    ).replay(fruit_events)
    assert log == [True] * 10


def test_basic_dictionary(fruit_events):
    # "test OSL basic dictionary": 7 debugs, including a bare
    # expression statement (the `== "dog"` no-op line) and iteration
    # over dict keys
    log = ScriptRunner(
        """
        test_value = {
            fruits: ["apple", "orange", "pear", "banana"],
            animals: ["zebra", "unicorn", "donkey"],
            a_boolean: true
        }

        debug(len(test_value) == 3)
        debug(len(test_value["fruits"]) == 4)
        debug(test_value["animals"][1] == "unicorn")

        test_value["animals"][1] == "dog"
        debug(test_value["animals"][1] == "unicorn")

        for key in test_value
           debug(key in ["fruits", "animals", "a_boolean"])
        end
        """
    ).replay(fruit_events)
    assert log == [True] * 7


def test_basic_logic(fruit_events):
    # "test OSL basic logic" (test_osl_language.h:203-240): 6 blocks,
    # exactly 4 fire. Blocks 5/6 mix constants with customer values
    # (fruit cursor = first row = "orange"), so the last block's guard
    # is row-dependent and resolves per user.
    log = ScriptRunner(
        """
        test_value = 123
        some_list = ["apple", "orange", "pear", "banana"]

        if test_value == 123
           debug(true)
        end

        if test_value != 321
           debug(true)
        end

        if test_value == 123 && ("peach" in some_list || "apple" in some_list)
           debug(true)
        end

        if "peach" in some_list || "plum" in some_list
           debug(true)
        end

        some_list = ["dog", ["cat", "tiger"], "hamster"]

        if fruit in ["apple", "orange"] || ["banana", "peach", "pumpkin"] contains fruit
            debug(true)
        end
        """
    ).replay(fruit_events)
    assert log == [True] * 4


def test_break_and_continue(fruit_events):
    # "test OSL break and continue": 4 debugs, all true
    log = ScriptRunner(
        """
        source_list = ["one", "two", "three", "four", "five", "six", "seven"]

        debug(len(source_list) == 7)

        counter = 0
        for item in source_list
           counter = counter + 1
           if counter == 3
              break
           end
        end

        debug(counter == 3)

        counter = 0
        after_count = 0
        for item in source_list
           counter = counter + 1
           if counter >= 3
              continue
           end
           after_count = after_count + 1
        end

        debug(counter == 7)
        debug(after_count == 2)
        """
    ).replay(fruit_events)
    assert log == [True] * 4


def test_break_with_depth(fruit_events):
    # "test OSL break with depth": break(2) out of the nested loop
    log = ScriptRunner(
        """
        number_list = ["one", "two", "three", "four", "five", "six", "seven"]
        letter_list = ["a", "b", "c", "d"]

        debug(len(number_list) == 7)
        debug(len(letter_list) == 4)

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
    ).replay(fruit_events)
    assert log == [True] * 3


def test_counter_in_each_row(fruit_events):
    # "test OSL each_row with limit": the counter lowers to a per-user
    # matched-row count, debug(counter == 2) resolves on the user frame
    log = ScriptRunner(
        """
        counter = 0

        each_row.limit(2) where event == "purchase"
          counter = counter + 1
        end

        debug(counter == 2)
        """,
        column_map={"event": "event_type"},
    ).replay(fruit_events)
    assert log == [True]


def test_counter_value_not_just_flag(fruit_events):
    # assert the VALUE the counter reaches, with a filter and step > 1
    log = ScriptRunner(
        """
        counter = 0
        each_row where event == "purchase" && price > 5
          counter = counter + 2
        end
        debug(counter)
        """,
        column_map={"event": "event_type"},
    ).replay(fruit_events)
    # orange 5.55, apple 9.95, pear 12.49, orange 5.55 match -> 4 * 2
    assert log == [8]


def test_guarded_debug_only_where_guard_holds(spark):
    # two customers; the if-guard is row-dependent so debug logs only
    # for the customer where it holds
    rows = [
        ("u1", 0, "purchase", BASE, "apple", 3.0),
        ("u2", 1, "purchase", BASE, "pear", 4.0),
    ]
    events = spark.createDataFrame(
        rows,
        "user_id string, event_id long, event_type string, ts timestamp,"
        " fruit string, price double",
    )
    log = ScriptRunner(
        """
        if fruit == "apple"
          debug("got apple")
        end
        debug(fruit)
        """
    ).replay(events)
    # u1 logs both ("got apple", "apple"); u2 only its cursor fruit
    assert log == ["got apple", "apple", "pear"]


def test_replay_refuses_beyond_user_bound(spark):
    rows = [
        (f"u{i}", i, "purchase", BASE, "apple", 1.0) for i in range(5)
    ]
    events = spark.createDataFrame(
        rows,
        "user_id string, event_id long, event_type string, ts timestamp,"
        " fruit string, price double",
    )
    with pytest.raises(OslUnsupported, match="more than 3 customers"):
        ScriptRunner("debug(fruit)").replay(events, max_users=3)
    # frame() is the unbounded, distributed mode
    out = ScriptRunner("debug(fruit)").frame(events, names=["cursor_fruit"])
    assert out.count() == 5
    assert set(out.columns) == {"user_id", "cursor_fruit"}


def test_frame_counter_matches_sql(spark, sf_dir):
    # the aggregate-only mode over real testdata: per-user counter ==
    # a plain SQL count
    from openset_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    out = ScriptRunner(
        """
        counter = 0
        each_row where event == "purchase"
          counter = counter + 1
        end
        debug(counter)
        """,
        column_map={"event": "event_type"},
    ).frame(events, names=["n_purchases"])
    events.createOrReplaceTempView("_ev_lang")
    want = spark.sql(
        "select user_id, count(case when event_type = 'purchase' then 1 end)"
        " as n from _ev_lang group by user_id"
    )
    got = {r.user_id: r.n_purchases for r in out.collect()}
    exp = {r.user_id: r.n for r in want.collect()}
    assert got == exp


# ------------------------- customer-property writes + return() in scans
def test_customer_prop_write_doc_example(fruit_events):
    # language_reference.md:102-117 verbatim shape:
    # total_purchase_value = sum(...).within(span, now) where event.is(...)
    now_ms = int(BASE.timestamp() * 1000) + 1_000
    r = ScriptRunner(
        """
        total_purchase_value = sum(price).within(1_year, now) where event.is(== "purchase")
        debug(total_purchase_value)
        """,
        column_map={"event": "event_type"},
        now_ms=now_ms,
    )
    log = r.replay(fruit_events)
    assert log == [pytest.approx(36.03)]
    upd = r.customer_updates(fruit_events)
    rows = upd.collect()
    assert len(rows) == 1
    assert rows[0].total_purchase_value == pytest.approx(36.03)


def test_customer_prop_write_window_clips(fruit_events):
    # anchor :31, span 2s -> rows :30..:33 only (|stamp-now| <= span)
    now_ms = int(BASE.replace(second=31).timestamp() * 1000)
    r = ScriptRunner(
        """
        recent_value = sum(price).within(2_seconds, now) where event.is(== "purchase")
        """,
        column_map={"event": "event_type"},
        now_ms=now_ms,
    )
    rows = r.customer_updates(fruit_events).collect()
    assert rows[0].recent_value == pytest.approx(5.55 + 9.95 + 12.49 + 2.49)


def test_last_and_first_aggregate_assign(fruit_events):
    # last = max-of-(order, value) struct; first = min — the max_by
    # update frame for last-value-wins customer facts
    r = ScriptRunner(
        """
        last_expensive = last(fruit) where price > 6
        first_expensive = first(fruit) where price > 6
        """,
    )
    rows = r.customer_updates(fruit_events).collect()
    assert rows[0].last_expensive == "pear"
    assert rows[0].first_expensive == "apple"


def test_return_in_each_row_first_match(spark):
    rows = [
        ("u1", 0, "purchase", BASE, "orange", 5.55),
        ("u1", 1, "purchase", BASE.replace(second=31), "apple", 9.95),
        ("u2", 2, "purchase", BASE, "banana", 2.49),
        ("u3", 3, "view", BASE, "pear", 12.49),
    ]
    events = spark.createDataFrame(
        rows,
        "user_id string, event_id long, event_type string, ts timestamp,"
        " fruit string, price double",
    )
    out = ScriptRunner(
        """
        each_row where event.is(== "purchase") && price > 3
          return(fruit)
        end
        """,
        column_map={"event": "event_type"},
    ).result_frame(events, name="first_big")
    got = {r.user_id: r.first_big for r in out.collect()}
    # u1: first matched row -> orange; u2: no row > 3 -> null;
    # u3: no purchase -> null
    assert got == {"u1": "orange", "u2": None, "u3": None}


def test_return_under_if_row_semantics(fruit_events):
    # row-by-row: the FIRST matched row decides — row 0 (orange, 5.55)
    # fails the if, so the unguarded return fires first even though a
    # later row (pear, 12.49) would satisfy the guard
    out = ScriptRunner(
        """
        each_row where event.is(== "purchase")
          if price > 10
            return("big")
          end
          return(fruit)
        end
        """,
        column_map={"event": "event_type"},
    ).result_frame(fruit_events)
    assert [r.result for r in out.collect()] == ["orange"]


def test_return_only_guarded_site(spark):
    rows = [
        ("u1", 0, "purchase", BASE, "orange", 5.55),
        ("u1", 1, "purchase", BASE.replace(second=31), "apple", 9.95),
        ("u2", 2, "purchase", BASE, "banana", 2.49),
    ]
    events = spark.createDataFrame(
        rows,
        "user_id string, event_id long, event_type string, ts timestamp,"
        " fruit string, price double",
    )
    out = ScriptRunner(
        """
        each_row where event.is(== "purchase")
          if price > 6
            return(fruit)
          end
        end
        """,
        column_map={"event": "event_type"},
    ).result_frame(events, name="big_fruit")
    got = {r.user_id: r.big_fruit for r in out.collect()}
    assert got == {"u1": "apple", "u2": None}


def test_apply_customer_updates_merges(spark, fruit_events):
    customers = spark.createDataFrame(
        [("user1", 1.0), ("user9", 2.0)],
        "id string, total_purchase_value double",
    )
    r = ScriptRunner(
        """
        total_purchase_value = sum(price) where event.is(== "purchase")
        """,
        column_map={"event": "event_type"},
    )
    out = r.apply_customer_updates(customers, fruit_events, id_col="id")
    got = {row.id: row.total_purchase_value for row in out.collect()}
    # user1 updated by the script; user9 (no events) keeps the old value
    assert got["user1"] == pytest.approx(36.03)
    assert got["user9"] == pytest.approx(2.0)


def test_counter_as_declared_customer_prop(fruit_events):
    r = ScriptRunner(
        """
        n_cheap = 0
        each_row where event == "purchase" && price < 6
          n_cheap = n_cheap + 1
        end
        """,
        column_map={"event": "event_type"},
        customer_props={"n_cheap"},
    )
    rows = r.customer_updates(fruit_events).collect()
    assert rows[0].n_cheap == 3  # orange, banana, orange


def test_session_count_in_script(spark):
    # reference test_sessions.h: `debug(session_count == 3)` — three
    # bursts separated by > 30min; the scan side (`session == 2`)
    # replays through the declarative compiler (tests/test_osl.py)
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
    assert ScriptRunner("debug(session_count == 3)").replay(ev) == [True]
    assert ScriptRunner("debug(session_count)").replay(ev) == [3]


def test_get_row_and_cursor(fruit_events):
    # language_reference.md:729-737: get_row(cursor) returns the row
    # the cursor is on (row 0 outside scans); indexing reads fields
    log = ScriptRunner(
        """
        data_in_row = get_row(cursor)
        debug(data_in_row["fruit"])
        debug(get_row(2)["price"])
        """
    ).replay(fruit_events)
    assert log == ["orange", 12.49]


def test_one_line_searches(fruit_events):
    # language_reference.md:767-800: row/test/dcount one-line
    # searches, with the doc's own multi-line `where` wrapping
    now_ms = int(BASE.timestamp() * 1000) + 10_000
    log = ScriptRunner(
        """
        matching_row = row.within(1_hour, now) where
            fruit.is(== "pear")

        last_orange = row.reverse() where fruit.is(== "orange")

        is_pear = test where
            fruit.is(== "pear")

        no_kiwi = test where fruit.is(== "kiwi")

        n_fruits = dcount(fruit) where event.is(== "purchase")

        debug(matching_row)
        debug(last_orange)
        debug(is_pear)
        debug(no_kiwi == false)
        debug(n_fruits)
        """,
        column_map={"event": "event_type"},
        now_ms=now_ms,
    ).replay(fruit_events)
    # pear is row 2; the last orange is row 4; 4 distinct fruits
    assert log == [2, 4, True, True, 4]


def test_for_over_set_column_counter(spark):
    # test_db.h:225 "iterate a Set column in row": the for loop counts
    # one per set element, skipping nil sets without an explicit
    # != nil guard; here with a page.is(!= nil) scan filter as in the
    # reference script
    rows = [
        ("u1", 0, "view", BASE, "home", ["google", "red"]),
        ("u1", 1, "view", BASE.replace(second=31), "docs", ["bing"]),
        ("u1", 2, "view", BASE.replace(second=32), None, ["x", "y", "z"]),
        ("u1", 3, "view", BASE.replace(second=33), "blog", None),
        ("u1", 4, "view", BASE.replace(second=34), "shop", ["ad", "mail", "rss"]),
    ]
    events = spark.createDataFrame(
        rows,
        "user_id string, event_id long, event_type string, ts timestamp,"
        " page string, referral_search array<string>",
    )
    log = ScriptRunner(
        """
        counter = 0

        each_row where page.is(!= nil)
            for ref in referral_search
                counter = counter + 1
            end
        end
        debug(counter == 6)
        debug(counter)
        """
    ).replay(events)
    # rows with page != nil: 0 (2 refs), 1 (1), 3 (nil set -> 0), 4 (3)
    assert log == [True, 6]


def test_nil_comparisons(spark):
    rows = [
        ("u1", 0, "view", BASE, "home"),
        ("u2", 1, "view", BASE, None),
    ]
    events = spark.createDataFrame(
        rows,
        "user_id string, event_id long, event_type string, ts timestamp,"
        " page string",
    )
    from openset_spark.osl import compile_osl

    assert compile_osl(
        "each_row where page.is(!= nil)\n  debug(true)\nend"
    ).matched(events).count() == 1
    assert compile_osl(
        "each_row where page.is(== nil)\n  debug(true)\nend"
    ).matched(events).count() == 1
    # imperative: cursor-row nil check
    log = ScriptRunner("debug(page != nil)").replay(events)
    assert log == [True, False]


def test_row_value_assignment_in_scan(spark):
    # `x = <row expr>` inside each_row: last matched visit wins (the
    # max_by update frame); customers with no match keep the prior
    # value
    rows = [
        ("u1", 0, "purchase", BASE, "orange", 5.55),
        ("u1", 1, "purchase", BASE.replace(second=31), "pear", 12.49),
        ("u2", 2, "view", BASE, "kiwi", 1.0),
    ]
    events = spark.createDataFrame(
        rows,
        "user_id string, event_id long, event_type string, ts timestamp,"
        " fruit string, price double",
    )
    r = ScriptRunner(
        """
        favorite_fruit = "unset"
        each_row where event == "purchase"
          favorite_fruit = fruit
        end
        """,
        column_map={"event": "event_type"},
        customer_props={"favorite_fruit"},
    )
    got = {
        row.user_id: row.favorite_fruit
        for row in r.customer_updates(events).collect()
    }
    assert got == {"u1": "pear", "u2": "unset"}


def test_scalar_builtins_doc_examples(fruit_events):
    """The scalar built-ins with the language_reference.md:641-766
    examples VERBATIM: bucket rounding down to multiples, half-up
    round (the doc's example contradicts its 'bank rounding' label —
    round(0.5)==1 wins), trunc toward zero, fix as fixed-point text,
    iso8601_to_stamp, and the url_decode dictionary (bare params get
    True)."""
    log = ScriptRunner(
        """
        debug(bucket(23.26, 0.50) == 23.00)
        debug(bucket(27.11, 25) == 25)
        debug(round(0.5) == 1)
        debug(round(0.05) == 0)
        debug(trunc(5.5) == 5)
        debug(fix(24.9499, 2) == "24.95")
        debug(iso8601_to_stamp("1970-01-01T00:00:01Z") == 1000)
        parts = url_decode("http://somehost.com/this/is/the/path?param1=one&param2=two&param3")
        debug(parts["host"] == "somehost.com")
        debug(parts["path"] == "/this/is/the/path")
        debug(parts["params"]["param1"] == "one")
        debug(parts["params"]["param3"] == true)
        """
    ).replay(fruit_events)
    assert log == [True] * 11


def test_scalar_builtins_row_dependent(fruit_events):
    """The same built-ins over row-dependent values lower to JVM
    column expressions: bucket the price of the first apple row."""
    log = ScriptRunner(
        """
        pr = 0.0
        each_row.limit(50) where fruit.is(== "apple")
            pr = price
        end
        debug(bucket(pr, 0.50) == 9.50)
        debug(round(pr) == 10)
        debug(trunc(pr) == 9)
        debug(fix(pr, 1) == "9.9")  # 9.95 is 9.9499... in binary
        """
    ).replay(fruit_events)
    assert log == [True] * 4
