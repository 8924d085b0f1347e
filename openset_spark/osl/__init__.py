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

The imperative half of the language lives in ``osl/lang.py``:

- top-level CONSTANT assignments become named values resolvable in
  where clauses and pushes (``Script.consts``)
- ``if`` blocks guarding ``<<`` pushes lower to row filters (CASE
  WHEN shape); ``for x in [literals]`` bodies with pushes unroll
- ``ScriptRunner.replay(events)`` runs full scripts — variables,
  dict/set/list containers and their operators, semantic
  ``if``/``for``/``break``/``continue``, ``debug()`` — returning the
  reference interpreter's debug log (test/test_osl_language.h
  semantics); constant logic evaluates driver-side, row/customer
  expressions lower to one per-user aggregate plan.

Flow control that would require per-row interpretation the compiler
cannot express still raises ``OslUnsupported`` (loudly, never
silently wrong).
"""

from openset_spark.osl.lang import ScriptRunner
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
    "ScriptRunner",
    "compile_osl",
    "compile_osl_batch",
    "compile_osl_histogram",
    "compile_osl_segments",
    "parse_batch",
    "parse_histogram",
    "parse_osl",
    "parse_segments",
]
