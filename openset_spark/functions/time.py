"""Time column helpers mirroring the reference's OSL time surface.

OSL exposes ``to_seconds/to_days/...`` (ms-span converters),
``get_hour/get_day_of_week/...`` (calendar part extractors),
``start_of_day/...`` (truncators), inline spans (``30_minutes``) and
``bucket`` (docs/osl/language_reference.md:493-556,641). All are thin
wrappers over JVM built-ins so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- inline time spans (milliseconds), OSL `10_minutes` etc. ----
SECOND_MS = 1_000
MINUTE_MS = 60 * SECOND_MS
HOUR_MS = 60 * MINUTE_MS
DAY_MS = 24 * HOUR_MS
WEEK_MS = 7 * DAY_MS
MONTH_MS = 31 * DAY_MS  # OSL months are 31 days
YEAR_MS = 365 * DAY_MS  # OSL years are 365 days


def span(n: int, unit: str) -> int:
    """``span(3, 'months')`` == OSL ``3_months`` (milliseconds)."""
    table = {
        "second": SECOND_MS, "seconds": SECOND_MS,
        "minute": MINUTE_MS, "minutes": MINUTE_MS,
        "hour": HOUR_MS, "hours": HOUR_MS,
        "day": DAY_MS, "days": DAY_MS,
        "week": WEEK_MS, "weeks": WEEK_MS,
        "month": MONTH_MS, "months": MONTH_MS,
        "year": YEAR_MS, "years": YEAR_MS,
    }
    return n * table[unit]


def to_ltz(ts: Column) -> Column:
    """Normalize a timestamp column to TIMESTAMP_LTZ.

    Spark 4 reads tz-less parquet ``timestamp[us]`` as TIMESTAMP_NTZ,
    which ``unix_micros``/``unix_millis`` reject. Casting to the
    explicit ``timestamp_ltz`` type is a no-op on LTZ input and
    interprets NTZ wall-clock under the session timezone — the engine
    pins that to UTC at load (sources/tables.py), so epoch semantics
    are deterministic and match DuckDB's naive-as-UTC ``epoch_us``.
    """
    return ts.cast("timestamp_ltz")


def epoch_us(ts: Column) -> Column:
    """Timestamp column (LTZ or NTZ) -> epoch microseconds."""
    return F.unix_micros(to_ltz(ts))


def epoch_ms(ts: Column) -> Column:
    """Timestamp column (LTZ or NTZ) -> epoch milliseconds (OSL `stamp`)."""
    return (F.unix_micros(to_ltz(ts)) / 1000).cast("long")


# ---- ms-span converters (truncating, like OSL to_*) ----
def to_seconds(ms: Column) -> Column:
    return (ms / SECOND_MS).cast("long")


def to_minutes(ms: Column) -> Column:
    return (ms / MINUTE_MS).cast("long")


def to_hours(ms: Column) -> Column:
    return (ms / HOUR_MS).cast("long")


def to_days(ms: Column) -> Column:
    return (ms / DAY_MS).cast("long")


def to_weeks(ms: Column) -> Column:
    return (ms / WEEK_MS).cast("long")


# ---- calendar extractors (OSL get_*) ----
def get_second(ts: Column) -> Column:
    return F.second(ts)


def get_minute(ts: Column) -> Column:
    return F.minute(ts)


def get_hour(ts: Column) -> Column:
    return F.hour(ts)


def get_month(ts: Column) -> Column:
    return F.month(ts)


def get_quarter(ts: Column) -> Column:
    return F.quarter(ts)


def get_year(ts: Column) -> Column:
    return F.year(ts)


def get_day_of_week(ts: Column) -> Column:
    return F.dayofweek(ts)


def get_day_of_month(ts: Column) -> Column:
    return F.dayofmonth(ts)


def get_day_of_year(ts: Column) -> Column:
    return F.dayofyear(ts)


# ---- truncators (OSL start_of_*) ----
def start_of_second(ts: Column) -> Column:
    return F.date_trunc("second", ts)


def start_of_minute(ts: Column) -> Column:
    return F.date_trunc("minute", ts)


def start_of_hour(ts: Column) -> Column:
    return F.date_trunc("hour", ts)


def start_of_day(ts: Column) -> Column:
    return F.date_trunc("day", ts)


def start_of_week(ts: Column) -> Column:
    return F.date_trunc("week", ts)


def start_of_month(ts: Column) -> Column:
    return F.date_trunc("month", ts)


def start_of_quarter(ts: Column) -> Column:
    return F.date_trunc("quarter", ts)


def start_of_year(ts: Column) -> Column:
    return F.date_trunc("year", ts)


def bucket(value: Column, size: float) -> Column:
    """OSL ``bucket(value, size)``: round down to nearest multiple of size."""
    return F.floor(value / F.lit(size)) * F.lit(size)
