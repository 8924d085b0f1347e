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
