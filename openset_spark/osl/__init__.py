"""OSL front-end: parse the reference's query language and compile it
to the Spark operators.

The reference is *programmable* — every query is an OSL script
(docs/osl/language_reference.md; interpreter in
src/queryinterpreter.cpp). This package covers the declarative core a
distributed engine can execute as one plan:

- ``select`` aggregator block (count/sum/min/max/avg, ``count id`` ==
  distinct customers)
- ``each_row[.mods] where <expr>`` row scans with
  ``.limit/.reverse/.from/.range/.within/.look_ahead/.look_back``
- nested ``each_row.continue().next()`` scans (funnel chaining)
- ``<<`` pivot pushes with the OSL scalar surface (``bucket``,
  ``get_*``, ``start_of_*``, ``to_*``, ``row_count``, ``session``)
- property modifiers ``.is/.is_not/.ever/.never`` with optional date
  windows, composable with ``&&``/``||``/parentheses

Imperative statements that cannot change the matched row set
(variable assignments, ``debug(...)``) are accepted and ignored so the
reference's own doc/test scripts replay verbatim; flow control that
*could* (``if``/``for``/``break``/``exit``) raises ``OslUnsupported``.
"""

from openset_spark.osl.parser import (
    OslSyntaxError,
    OslUnsupported,
    parse_batch,
    parse_histogram,
    parse_osl,
    parse_segments,
)
from openset_spark.osl.compiler import (
    OslBatch,
    OslHistogram,
    OslQuery,
    OslSegments,
    compile_osl,
    compile_osl_batch,
    compile_osl_histogram,
    compile_osl_segments,
)

__all__ = [
    "OslBatch",
    "OslHistogram",
    "OslQuery",
    "OslSegments",
    "OslSyntaxError",
    "OslUnsupported",
    "compile_osl",
    "compile_osl_batch",
    "compile_osl_histogram",
    "compile_osl_segments",
    "parse_batch",
    "parse_histogram",
    "parse_osl",
    "parse_segments",
]
