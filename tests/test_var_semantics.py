"""The reference's dynamic-value (cvar) semantics, replayed through
the OSL interpreter — test/test_lib_var.h re-expressed on the
LANGUAGE surface (the C++ cvar API itself is library plumbing; what a
script author observes is coercion inside expressions).

Each test runs an OSL script whose debug() lines assert the cvar
behavior; like the reference's ASSERTDEBUGLOG, the expected log is
[True] * n.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from openset_spark.osl.lang import ScriptRunner


@pytest.fixture(scope="module")
def one_event(spark):
    ts = datetime(2016, 3, 24, 12, 0, 30, tzinfo=timezone.utc)
    return spark.createDataFrame(
        [("user1", 0, "purchase", ts, 1.0)],
        "user_id string, event_id long, event_type string, ts timestamp,"
        " value double",
    )


def _replay(script: str, events) -> list:
    return ScriptRunner(script).replay(events)


def test_cross_type_equality(one_event):
    # test_lib_var.h "cvar-to-cvar cross type comparison operators"
    log = _replay(
        """
        left = "123"
        debug(left == 123)
        left = "123.5"
        debug(left == 123.5)
        left = "123"
        debug(left == 123.0)
        left = "1"
        debug(left == true)
        left = "true"
        debug(left == true)
        left = "true"
        debug(left != false)
        left = ""
        debug(left == false)
        left = "0"
        debug(left == false)
        left = "false"
        debug(left == false)
        """,
        one_event,
    )
    assert log == [True] * 9


def test_string_minus_removes_all_occurrences(one_event):
    # cvar::subStrings (lib/var/var.h:657) LOOPS: every occurrence of
    # the right side is removed, and a numeric right side is rendered
    # through getString first ("a1b" - 1 == "ab")
    log = _replay(
        """
        somevar = "abcabcabc"
        somevar = somevar - "bc"
        debug(somevar == "aaa")
        somevar = "a1b1c" - 1
        debug(somevar == "abc")
        somevar = "x1.5y1.5z" - 1.5
        debug(somevar == "xyz")
        """,
        one_event,
    )
    assert log == [True] * 3


def test_float_string_rendering_is_fixed_point(one_event):
    # cvar::getString -> trimZeros(std::to_string(v))
    # (lib/var/var.h:1149): fixed-point with trailing-zero trim, one
    # decimal kept — NEVER scientific notation, so values beyond %g's
    # 6 significant digits keep their full form
    log = _replay(
        """
        somevar = "" + 1234567.8
        debug(somevar == "1234567.8")
        somevar = "" + 53.0
        debug(somevar == "53.0")
        somevar = "n=" + 0.0001
        debug(somevar == "n=0.0001")
        """,
        one_event,
    )
    assert log == [True] * 3


def test_string_math_operators(one_event):
    # test_lib_var.h "cvar: string math operators" — minus removes the
    # occurrence(s), plus concatenates
    log = _replay(
        """
        somevar = "the rain in Spain"
        somevar = somevar - "Spain"
        debug(somevar == "the rain in ")
        somevar = somevar + "Canada"
        debug(somevar == "the rain in Canada")
        somevar = somevar + " is wet"
        debug(somevar == "the rain in Canada is wet")
        somevar = somevar - " is wet"
        debug(somevar == "the rain in Canada")
        """,
        one_event,
    )
    assert log == [True] * 4


def test_text_addition_coercion(one_event):
    # test_lib_var.h "cvar: text assignment with text addition":
    # + with a string on EITHER side concatenates the string forms
    log = _replay(
        """
        somevar = 49.5 + 5
        debug(somevar == 54.5)
        somevar = "49.5" + 5
        debug(somevar == "49.55")
        somevar = "49.5" + "5"
        debug(somevar == "49.55")
        somevar = 5 + "49.5"
        debug(somevar == "549.5")
        somevar = "5" + "49.5"
        debug(somevar == "549.5")
        """,
        one_event,
    )
    assert log == [True] * 5


def test_unary_minus_on_numeric_string(one_event):
    # test_lib_var.h "cvar: unary operator on all types"
    log = _replay(
        """
        somevar = "1234.5"
        somevar = -somevar
        debug(somevar == "-1234.5")
        somevar = 1234.5
        somevar = -somevar
        debug(somevar == -1234.5)
        somevar = 1234
        somevar = -somevar
        debug(somevar == -1234)
        """,
        one_event,
    )
    assert log == [True] * 3


def test_js_like_conversions(one_event):
    # test_lib_var.h "cvar: test JS like conversion functions" +
    # "string numeric to all types"
    log = _replay(
        """
        somevar = "1234.5"
        debug(float(somevar) == 1234.5)
        debug(int(somevar) == 1234)
        somevar = 1234.5
        debug(str(somevar) == "1234.5")
        """,
        one_event,
    )
    assert log == [True] * 3


def test_ordering_comparisons_coerce(one_event):
    # implied by the cvar comparison overloads: ordering against a
    # numeric string compares numerically ("9" < 10, not lexically)
    log = _replay(
        """
        somevar = "9"
        debug(somevar < 10)
        debug(somevar > 8.5)
        somevar = "10"
        debug(somevar >= 10)
        """,
        one_event,
    )
    assert log == [True] * 3


def test_container_semantics(one_event):
    # test_lib_var.h "cvar: container constructors" — set dedupes,
    # list keeps duplicates, dict indexes; bad lookups return nil
    log = _replay(
        """
        someset = set(1, 2, 3, 4, 5, 1)
        debug(len(someset) == 5)
        somelist = list(1, 2, 3, 4, 5, 1)
        debug(len(somelist) == 6)
        somedict = dict()
        somedict["salt"] = "water"
        somedict["tree"] = "house"
        debug(len(somedict) == 2)
        debug(somedict["salt"] == "water")
        """,
        one_event,
    )
    assert log == [True] * 4
