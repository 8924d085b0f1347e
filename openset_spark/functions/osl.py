"""OSL built-in scalar functions
(docs/osl/language_reference.md:641-766) as JVM column expressions.

``bucket`` lives in functions/time.py; per-user variables
(first_stamp/last_stamp/row_count/session_count) are window or
aggregate expressions over the user partition, provided here as
window-column helpers so queries can reference them like OSL does.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from openset_spark.functions.time import epoch_ms


def osl_round(value: Column) -> Column:
    """OSL ``round``: half-up to nearest integer, returned as long."""
    return F.round(value, 0).cast("long")


def trunc(value: Column) -> Column:
    """OSL ``trunc``: drop the decimal part (toward zero)."""
    return value.cast("long")


def fix(value: Column, decimals: int) -> Column:
    """OSL ``fix(value, n)``: fixed decimal places, returned as STRING
    (the reference returns text — format_number without grouping)."""
    return F.regexp_replace(F.format_number(value, decimals), ",", "")


def iso8601_to_stamp(iso: Column) -> Column:
    """ISO-8601 text (with zone / Z, optional millis) -> ms epoch."""
    ts = F.to_timestamp(iso)
    return epoch_ms(ts)


def url_decode(url: Column) -> Column:
    """OSL ``url_decode``: struct(host, path, query, params) — params
    is a map; bare params (no ``=``) get the string 'true' (map values
    are homogeneous in Spark, unlike the reference's dict). Values are
    split on the FIRST ``=`` only (base64/nested-URL values keep their
    ``=``) and percent-decoded (try_url_decode: malformed %-escapes
    yield null rather than failing the row).

    All parse_url + higher-order functions: stays JVM-side, but like
    the reference docs warn, prefer extracting URL parts at ingest."""
    query = F.parse_url(url, F.lit("QUERY"))
    pairs = F.split(query, "&")

    def _value(p: Column) -> Column:
        eq = F.instr(p, "=")
        raw = F.when(eq == 0, F.lit("true")).otherwise(
            F.substring(p, eq + 1, F.lit(1 << 20))
        )
        return F.coalesce(F.try_url_decode(raw), raw)

    params = F.map_from_entries(
        F.transform(
            F.filter(pairs, lambda p: p != ""),
            lambda p: F.struct(
                F.split_part(p, F.lit("="), F.lit(1)).alias("key"),
                _value(p).alias("value"),
            ),
        )
    )
    return F.struct(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        query.alias("query"),
        params.alias("params"),
    )


# ---- per-user OSL variables as window columns ----
def _user_window(user_col: str) -> Window:
    return Window.partitionBy(user_col)


def first_stamp(ts_col: str = "ts", user_col: str = "user_id") -> Column:
    """OSL ``first_stamp``: oldest event time in the user's record."""
    return F.min(ts_col).over(_user_window(user_col))


def last_stamp(ts_col: str = "ts", user_col: str = "user_id") -> Column:
    """OSL ``last_stamp``: most recent event time in the user's record."""
    return F.max(ts_col).over(_user_window(user_col))


def row_count(user_col: str = "user_id") -> Column:
    """OSL ``row_count``: events in the user's record."""
    return F.count(F.lit(1)).over(_user_window(user_col))


def cursor(
    ts_col: str = "ts",
    user_col: str = "user_id",
    tiebreak_col: str = "event_id",
) -> Column:
    """OSL ``cursor``: 0-based row index in the user's ordered record."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    return F.row_number().over(w) - 1
