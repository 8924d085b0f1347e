"""Compile the OSL AST to Spark DataFrame plans.

Mapping (reference: src/queryinterpreter.cpp, docs/osl/
language_reference.md):

- ``each_row where P`` -> row filter; ``.ever/.never`` predicate parts
  become window booleans over the user partition (the reference scans
  the customer's whole row set; here one ``max(when(...))`` over ONE
  user-keyed exchange shared with every other per-user expression).
- ``.limit/.reverse/.from`` -> ``matching_rows`` (rank within the same
  user window).
- nested ``each_row.continue().next()`` -> anchor on the outer scan's
  first match (``matching_rows(limit=1)``), inner rows restricted to
  (ts, event_id) after the anchor — the funnel min-ts chaining of
  ``operators/funnel.py`` expressed through the same user partition.
- ``select`` aggregators + ``<<`` pivots -> ``event_aggregate``
  (``count id`` == the implicit distinct-customer count).

Everything stays in one user-keyed shuffle + one aggregation shuffle;
no driver-side iteration, so a compiled script runs unchanged on a
1000-executor cluster.

All OSL time values are epoch **milliseconds** (the reference's
``stamp``); timestamps convert at the edges via ``timestamp_millis``.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openset_spark.functions import time as T
from openset_spark.functions.osl import osl_round, row_count, trunc
from openset_spark.functions.time import epoch_ms
from openset_spark.operators.events import event_aggregate, matching_rows
from openset_spark.operators.sessionize import with_session
from openset_spark.osl.parser import (
    BoolOp,
    EachRow,
    OslUnsupported,
    PAggWhere,
    PBin,
    PCall,
    PExplode,
    PLit,
    PName,
    Pred,
    Script,
    parse_osl,
)

_NO_LIMIT = 1 << 62
DEFAULT_SESSION_GAP_MS = 30 * 60 * 1000


def _iso_to_ms(v: Any) -> int:
    if isinstance(v, (int, float)):
        return int(v)
    dt = datetime.fromisoformat(str(v))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


class _Ctx:
    def __init__(
        self,
        df: DataFrame,
        user_col: str,
        ts_col: str,
        event_col: str,
        order_col: str,
        column_map: dict[str, str],
        now_ms: int,
        consts: dict | None = None,
        event_order: list[str] | None = None,
    ) -> None:
        self.df = df
        self.user_col = user_col
        self.ts_col = ts_col
        self.event_col = event_col
        self.order_col = order_col
        self.column_map = column_map
        self.now_ms = now_ms
        self.consts = consts or {}
        self.event_order = event_order

    @property
    def user_window(self) -> Window:
        return Window.partitionBy(self.user_col)

    def stamp(self) -> Column:
        return epoch_ms(F.col(self.ts_col))

    def resolve(self, prop: str) -> Column:
        if prop in self.consts:
            v = self.consts[prop]
            if isinstance(v, (list, tuple, set, dict)):
                raise OslUnsupported(
                    f"container variable {prop!r} in scalar position"
                )
            return F.lit(v)
        if prop in ("stamp", "event_time"):
            return self.stamp()
        if prop == "event":
            return F.col(self.event_col)
        if prop == "id":
            return F.col(self.user_col)
        if prop == "row_count":
            return row_count(self.user_col)
        if prop == "session_count":
            return F.max("session").over(self.user_window)
        if prop == "now":
            return F.lit(self.now_ms)
        return F.col(self.column_map.get(prop, prop))


_CMP_FNS = {
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
}


def _word_cmp(p: Pred, ctx: _Ctx) -> Column:
    """``contains`` / ``any`` / ``in`` against scalar or set (array)
    columns (functions/sets.py has the set matchers; for scalars,
    ``contains`` is substring — the reference's
    ``referral_search.ever(contains "red")``, test/test_db.h:585 —
    and ``any``/``in`` are list membership)."""
    from pyspark.sql.types import ArrayType

    from openset_spark.functions import sets

    col = ctx.resolve(p.prop)
    is_array = False
    bound = ctx.column_map.get(p.prop, p.prop)
    field = next((f for f in ctx.df.schema.fields if f.name == bound), None)
    if field is not None:
        is_array = isinstance(field.dataType, ArrayType)
    raw = p.value
    # a script variable holding a container: `fruit in my_list`
    if isinstance(raw, PName) and isinstance(
        ctx.consts.get(raw.name), (list, tuple, set)
    ):
        raw = tuple(ctx.consts[raw.name])
    vals = list(raw) if isinstance(raw, tuple) else None
    if p.op == "contains":
        if vals is not None:  # contains [..] == holds ALL listed
            if is_array:
                return sets.contains_all(col, vals)
            conds = [col.contains(v) for v in vals]
            out = conds[0]
            for c in conds[1:]:
                out = out & c
            return out
        return sets.contains(col, raw) if is_array else col.contains(raw)
    if p.op in ("any", "in"):
        if vals is None:
            raise OslUnsupported(f"'{p.op}' needs a [list] value")
        return sets.contains_any(col, vals) if is_array else col.isin(vals)
    raise OslUnsupported(f"comparator {p.op!r}")


def _value_lit(v: Any, ctx: _Ctx) -> Column:
    if isinstance(v, PName):
        return ctx.resolve(v.name)
    return F.lit(v)


def _window_cond(window: tuple, ctx: _Ctx) -> Column:
    kind, a, b = window
    stamp = ctx.stamp()
    if kind == "range":
        return stamp.between(_iso_to_ms(a), _iso_to_ms(b))
    span = int(a) if not isinstance(a, PName) else None
    if span is None:
        raise OslUnsupported(f"non-literal span in .{kind}()")
    anchor = _value_lit(b, ctx) if isinstance(b, PName) else F.lit(_iso_to_ms(b))
    if kind == "within":
        return F.abs(anchor - stamp) <= span
    if kind == "look_ahead":
        return (stamp - anchor).between(0, span)
    if kind == "look_back":
        return (anchor - stamp).between(0, span)
    raise OslUnsupported(f"date window .{kind}()")


def _pred_col(p: Pred, ctx: _Ctx) -> Column:
    if p.op in ("contains", "any", "in"):
        base = _word_cmp(p, ctx)
    elif p.value is None and p.op in ("==", "!="):
        # `prop.is(!= nil)` (test_db.h:252): null checks, not a
        # three-valued comparison against a null literal
        col = ctx.resolve(p.prop)
        base = col.isNull() if p.op == "==" else col.isNotNull()
    else:
        base = _CMP_FNS[p.op](ctx.resolve(p.prop), _value_lit(p.value, ctx))
    if p.mode in ("is", "is_not"):
        if p.window is not None:
            # ".is may not be used with date modifiers" (language ref)
            raise OslUnsupported(".is()/.is_not() with a date window")
        return base if p.mode == "is" else ~base
    # ever/never scan the customer's whole row set: a window boolean
    # over the user partition (shares the one user-keyed exchange).
    cond = base
    if p.window is not None:
        cond = cond & _window_cond(p.window, ctx)
    ever = (
        F.max(F.when(cond, F.lit(1)).otherwise(F.lit(0))).over(ctx.user_window)
        == 1
    )
    return ever if p.mode == "ever" else ~ever


def _bool_col(expr: Any, ctx: _Ctx) -> Column:
    if isinstance(expr, Pred):
        return _pred_col(expr, ctx)
    if isinstance(expr, BoolOp):
        cols = [_bool_col(p, ctx) for p in expr.parts]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if expr.kind == "and" else (out | c)
        return out
    raise OslUnsupported(f"where expression node: {expr!r}")


# ------------------------------------------------- query-index culling
#
# The reference compiles every where clause into an INDEX program over
# per-value people bitmaps (src/queryindexing.h; test/test_db.h "index
# compiler" suite): equality terms intersect bitmaps, negated/computed
# terms degrade, AND/OR become BIT_AND/BIT_OR, and only the surviving
# people are scanned. The Spark translation: each indexable term
# becomes a per-user EXISTENCE flag (one conditional max in a single
# user aggregate), the boolean structure combines the flags, and the
# result is a candidate-user semi-join applied BEFORE the session
# window — people-pruning ahead of the expensive per-user stages.
#
# Degradations (mirroring the reference tests):
# - `session`/`session_count`/`row_count` terms: computed properties,
#   not available pre-scan -> term unindexable ("cull session").
# - script-variable PROPERTY positions: constant comparisons carry no
#   per-user information -> unindexable ("cull user variable").
# - an unindexable term inside AND is dropped (weaker index, still
#   sound); inside OR it poisons the whole OR (can't bound a union).
# - never/is_not: indexable as the NEGATED existence flag — users with
#   rows are judged on their rows (userless rows don't exist in the
#   frame, so the reference's all-people bitmap is implicit).

_UNINDEXABLE_PROPS = frozenset({"session", "session_count", "row_count"})


def _cull_base(p: Pred, ctx: _Ctx) -> Column:
    """Row-level base condition of one predicate (no quantifier)."""
    if p.op in ("contains", "any", "in"):
        base = _word_cmp(p, ctx)
    elif p.value is None and p.op in ("==", "!="):
        col = ctx.resolve(p.prop)
        base = col.isNull() if p.op == "==" else col.isNotNull()
    else:
        base = _CMP_FNS[p.op](ctx.resolve(p.prop), _value_lit(p.value, ctx))
    if p.window is not None and p.mode in ("ever", "never"):
        base = base & _window_cond(p.window, ctx)
    return base


def _cull_formula(expr: Any, ctx: _Ctx, terms: list, hints: list):
    """Fold a where clause into (callable flags->Column) over per-term
    existence flags, appending row conditions to ``terms``. Returns
    None where the reference's index compiler would degrade."""
    if isinstance(expr, Pred):
        if expr.prop in _UNINDEXABLE_PROPS:
            hints.append({"prop": expr.prop, "op": expr.op, "indexed": False,
                          "why": "computed property"})
            return None
        if expr.prop in ctx.consts:
            hints.append({"prop": expr.prop, "op": expr.op, "indexed": False,
                          "why": "script variable"})
            return None
        try:
            base = _cull_base(expr, ctx)
        except OslUnsupported:
            hints.append({"prop": expr.prop, "op": expr.op, "indexed": False,
                          "why": "untranslatable"})
            return None
        negate = expr.mode == "never"
        if expr.mode == "is_not":
            base = ~base
        idx = len(terms)
        terms.append(base)
        hints.append({"prop": expr.prop, "op": expr.op, "indexed": True,
                      "mode": expr.mode, "flag": idx})
        if negate:
            return lambda flags: ~flags[idx]
        return lambda flags: flags[idx]
    if isinstance(expr, BoolOp):
        # Degraded subtrees must not leave ORPHAN existence flags
        # behind (ADVICE r6): every term a discarded arm appended is
        # truncated immediately — before the next arm runs, so later
        # flag indices stay aligned — and its indexed=True hints go
        # with it (the degradation-reason hints stay).
        start, hstart = len(terms), len(hints)

        def _drop_from(t0: int, h0: int) -> None:
            del terms[t0:]
            hints[h0:] = [h for h in hints[h0:] if not h.get("indexed")]

        parts = []
        for p in expr.parts:
            t0, h0 = len(terms), len(hints)
            r = _cull_formula(p, ctx, terms, hints)
            if r is None:
                _drop_from(t0, h0)
            parts.append(r)
        if expr.kind == "and":
            live = [p for p in parts if p is not None]
            if not live:
                return None
            return lambda flags: _fold(live, flags, "and")
        if any(p is None for p in parts):
            # a poisoned OR discards its live arms' flags too
            _drop_from(start, hstart)
            return None
        return lambda flags: _fold(parts, flags, "or")
    return None


def _fold(fns, flags, kind):
    out = fns[0](flags)
    for fn in fns[1:]:
        out = (out & fn(flags)) if kind == "and" else (out | fn(flags))
    return out


def _required_scan(blk: "EachRow") -> "EachRow":
    """The scan whose matches gate a block's output: the head of the
    LAST non-continue segment of the child chain (continue-linked
    children require their anchor's match; a non-continue child
    restarts independently)."""
    eff, cur = blk, blk
    while cur.children:
        child = cur.children[0]
        if not child.mods.get("continue"):
            eff = child
        cur = child
    return eff


# ------------------------------------------------- pivot expressions
def _ts_of(ms: Column) -> Column:
    return F.timestamp_millis(ms.cast("long"))


_PIVOT_FNS: dict[str, Any] = {
    "bucket": None,  # handled inline (literal size)
    "round": osl_round,
    "trunc": trunc,
    "to_seconds": T.to_seconds,
    "to_minutes": T.to_minutes,
    "to_hours": T.to_hours,
    "to_days": T.to_days,
    "to_weeks": T.to_weeks,
    # singular aliases (the batch docs use to_day, README:410)
    "to_second": T.to_seconds,
    "to_minute": T.to_minutes,
    "to_hour": T.to_hours,
    "to_day": T.to_days,
    "to_week": T.to_weeks,
}
for _name in (
    "get_second", "get_minute", "get_hour", "get_month", "get_quarter",
    "get_year", "get_day_of_week", "get_day_of_month", "get_day_of_year",
):
    _PIVOT_FNS[_name] = getattr(T, _name)
for _name in (
    "start_of_second", "start_of_minute", "start_of_hour", "start_of_day",
    "start_of_week", "start_of_month", "start_of_quarter", "start_of_year",
):
    _PIVOT_FNS[_name] = getattr(T, _name)

_TIME_ARG_FNS = {n for n in _PIVOT_FNS if n.startswith(("get_", "start_of_"))}
_START_OF_FNS = {n for n in _PIVOT_FNS if n.startswith("start_of_")}


def _pexpr_col(e: Any, ctx: _Ctx) -> tuple[Column, str]:
    if isinstance(e, PLit):
        return F.lit(e.value), str(e.value)
    if isinstance(e, PExplode):
        # set-element pivot (for-over-set push): one result row per
        # element; nil/empty sets contribute nothing — exactly the
        # reference's loop skip (test_db.h:252)
        return F.explode(ctx.resolve(e.prop)), e.var or e.prop
    if isinstance(e, PName):
        return ctx.resolve(e.name), e.name
    if isinstance(e, PCall):
        if e.fn == "bucket":
            val, vname = _pexpr_col(e.args[0], ctx)
            size = e.args[1]
            if not isinstance(size, PLit):
                raise OslUnsupported("bucket() size must be a literal")
            return T.bucket(val, size.value), f"bucket_{vname}"
        fn = _PIVOT_FNS.get(e.fn)
        if fn is None:
            raise OslUnsupported(f"pivot function {e.fn}()")
        arg, aname = _pexpr_col(e.args[0], ctx)
        if e.fn in _TIME_ARG_FNS:
            out = fn(_ts_of(arg))
            # OSL integers are int64: ms for start_of_*, long parts
            # for get_* (Spark's calendar extractors return int32)
            out = epoch_ms(out) if e.fn in _START_OF_FNS else out.cast("long")
            return out, f"{e.fn}_{aname}"
        return fn(arg), f"{e.fn}_{aname}"
    raise OslUnsupported(f"pivot expression: {e!r}")


# ---------------------------------------------------------- the query
class OslQuery:
    """A compiled OSL script, runnable against an events DataFrame."""

    def __init__(
        self,
        script: Script,
        column_map: dict[str, str] | None = None,
        user_col: str = "user_id",
        ts_col: str = "ts",
        event_col: str = "event_type",
        order_col: str = "event_id",
        customer_df: DataFrame | None = None,
        params: dict | None = None,
        event_order: list[str] | None = None,
        cull: bool = False,
    ) -> None:
        self.script = script
        self.column_map = dict(column_map or {})
        self.user_col = user_col
        self.ts_col = ts_col
        self.event_col = event_col
        self.order_col = order_col
        # the table's declared z-order priority (test/test_zorder.h):
        # threads into the session window and each_row grid ranking
        self.event_order = list(event_order) if event_order else None
        # REST str_/int_/dbl_/bool_{var} query params
        # (docs/rest/README.md:233-236): externally supplied values
        # override same-named script variables
        self.params = dict(params or {})
        # is_customer properties (language_reference.md:102-117): one
        # row per user; scripts read them like row properties. Joined
        # on user_col — co-keyed with every other per-user expression,
        # so bucketed/bucket-joined layouts add no extra shuffle, and
        # a small dim broadcasts under AQE.
        self.customer_df = customer_df
        # opt-in query-index culling (the reference builds its people
        # index unconditionally because bitmaps are ~free there; a
        # Spark semi-join is not, so the people pre-pass is a caller
        # decision — same switch as operators/funnel.py cull=)
        self.cull = cull

    # -- helpers ------------------------------------------------------
    def _references_session(self) -> bool:
        names: set[str] = set()

        def walk_expr(e):
            if isinstance(e, Pred):
                names.add(e.prop)
            elif isinstance(e, BoolOp):
                for p in e.parts:
                    walk_expr(p)

        def walk_pexpr(e):
            if isinstance(e, PName):
                names.add(e.name)
            elif isinstance(e, PCall):
                for a in e.args:
                    walk_pexpr(a)

        def walk_block(b: EachRow):
            walk_expr(b.where)
            for guard, push in b.pushes:
                if guard is not None:
                    walk_expr(guard)
                for e in push:
                    walk_pexpr(e)
            for c in b.children:
                walk_block(c)

        for b in self.script.blocks:
            walk_block(b)
        for _fn, prop, _alias, with_prop, _all in self.script.selects:
            names.add(prop)
            if with_prop:
                names.add(with_prop)
        return "session" in names or "session_count" in names

    def _ctx(
        self,
        events: DataFrame,
        now_ms: int | None,
        session_gap_ms: int,
    ) -> _Ctx:
        df = events
        if now_ms is None:
            now_ms = int(datetime.now(timezone.utc).timestamp() * 1000)
        if self.customer_df is not None:
            df = df.join(self.customer_df, self.user_col, "left")
        if self.cull:
            df = self._apply_cull(df, now_ms)
        if self._references_session():
            df = with_session(
                df, session_gap_ms, self.user_col, self.ts_col,
                event_order=self.event_order,
            )
        return _Ctx(
            df,
            self.user_col,
            self.ts_col,
            self.event_col,
            self.order_col,
            self.column_map,
            now_ms,
            consts={
                **(getattr(self.script, "consts", None) or {}),
                **self.params,
            },
            event_order=self.event_order,
        )

    def _cull_plan(self, now_ms: int):
        """(terms, per-block formulas, hints) of the script's index
        program, or (None, None, hints) when any block degrades."""
        probe = _Ctx(
            None, self.user_col, self.ts_col, self.event_col,
            self.order_col, self.column_map, now_ms,
            consts={**(getattr(self.script, "consts", None) or {}),
                    **self.params},
            event_order=self.event_order,
        )
        terms: list[Column] = []
        formulas = []
        hints: list[dict] = []
        for b in self.script.blocks:
            fn = _cull_formula(_required_scan(b).where, probe, terms, hints)
            if fn is None:
                return None, None, hints
            formulas.append(fn)
        return terms, formulas, hints

    def index_hints(self, now_ms: int = 0) -> dict:
        """Introspection of the index program (the analog of the
        reference's queryMacros.index assertions in test_db.h): which
        where terms are indexable and whether the script culls."""
        terms, formulas, hints = self._cull_plan(now_ms)
        return {"cullable": formulas is not None, "terms": hints}

    def _apply_cull(self, df: DataFrame, now_ms: int) -> DataFrame:
        terms, formulas, _ = self._cull_plan(now_ms)
        if not formulas:
            return df
        flag_aggs = [
            F.max(F.when(c, F.lit(1))).alias(f"_ix{i}")
            for i, c in enumerate(terms)
        ]
        cands = df.groupBy(self.user_col).agg(*flag_aggs)
        flags = [
            F.coalesce(F.col(f"_ix{i}"), F.lit(0)) == 1
            for i in range(len(terms))
        ]
        keep = formulas[0](flags)
        for fn in formulas[1:]:
            keep = keep | fn(flags)
        return df.join(
            cands.filter(keep).select(self.user_col),
            self.user_col,
            "left_semi",
        )

    def _block_matched(
        self, blk: EachRow, ctx: _Ctx, anchor: tuple[DataFrame, bool] | None
    ) -> DataFrame:
        """Rows of ctx.df matched by one each_row scan (after its
        anchor, window mods, .from/.reverse/.limit)."""
        cond = _bool_col(blk.where, ctx)
        for kind in ("range", "within", "look_ahead", "look_back"):
            if kind in blk.mods:
                a, b = blk.mods[kind]
                cond = cond & _window_cond((kind, a, b), ctx)
        df = ctx.df
        if anchor is not None:
            a_df, strict = anchor  # strict: .next() advances past anchor
            df = df.join(a_df, self.user_col)
            ts, oc = F.col(self.ts_col), F.col(self.order_col)
            tie = oc > F.col("_a_oc") if strict else oc >= F.col("_a_oc")
            after = (ts > F.col("_a_ts")) | ((ts == F.col("_a_ts")) & tie)
            df = df.filter(after).drop("_a_ts", "_a_oc")
        # window expressions cannot sit in a bare filter: materialize
        df = df.withColumn("_osl_match", cond)
        needs_rank = any(k in blk.mods for k in ("limit", "reverse", "from"))
        if needs_rank:
            return matching_rows(
                df,
                where=F.col("_osl_match"),
                limit=blk.mods.get("limit", _NO_LIMIT),
                reverse=bool(blk.mods.get("reverse")),
                user_col=self.user_col,
                order_cols=(self.ts_col, self.order_col),
                from_row=blk.mods.get("from", 0),
                event_order=ctx.event_order,
                event_col=self.event_col,
            ).drop("_osl_match")
        return df.filter(F.col("_osl_match")).drop("_osl_match")

    def _leaf_matched(self, blk: EachRow, ctx: _Ctx) -> tuple[EachRow, DataFrame]:
        """Walk the single-child chain; outer scans become per-user
        anchors (first match), the leaf yields its matched rows."""
        anchor: tuple[DataFrame, bool] | None = None
        cur = blk
        while cur.children:
            if len(cur.children) > 1:
                raise OslUnsupported("each_row with multiple nested scans")
            child = cur.children[0]
            if not child.mods.get("continue"):
                anchor = None  # child restarts at row 0: independent scan
                cur = child
                continue
            if cur.mods.get("limit") != 1:
                raise OslUnsupported(
                    "outer each_row feeding .continue() must be .limit(1)"
                )
            first = self._block_matched(cur, ctx, anchor)
            a = first.select(
                self.user_col,
                F.col(self.ts_col).alias("_a_ts"),
                F.col(self.order_col).alias("_a_oc"),
            )
            anchor = (a, bool(child.mods.get("next")))
            cur = child
        return cur, self._block_matched(cur, ctx, anchor)

    # -- public surface ----------------------------------------------
    def matched_blocks(
        self,
        events: DataFrame,
        now_ms: int | None = None,
        session_gap_ms: int = DEFAULT_SESSION_GAP_MS,
    ) -> list[DataFrame]:
        """One DataFrame of leaf-matched rows per top-level each_row
        block — the rows the reference's interpreter would visit (what
        a script body's side effects observe)."""
        ctx = self._ctx(events, now_ms, session_gap_ms)
        return [self._leaf_matched(b, ctx)[1] for b in self.script.blocks]

    def matched(self, events: DataFrame, **kw) -> DataFrame:
        blocks = self.matched_blocks(events, **kw)
        if len(blocks) != 1:
            raise OslUnsupported(
                f"matched() needs exactly one scan, script has {len(blocks)}"
            )
        return blocks[0]

    def dataframe(
        self,
        events: DataFrame,
        now_ms: int | None = None,
        session_gap_ms: int = DEFAULT_SESSION_GAP_MS,
    ) -> DataFrame:
        """The aggregated result: select aggregators grouped by the
        script's ``<<`` pivot (event_aggregate under the hood)."""
        ctx = self._ctx(events, now_ms, session_gap_ms)
        # every << push in every scan contributes rows to the SAME
        # aggregator tree (the reference merges all sections' pushes
        # into one result tree); pivot expressions materialize as
        # columns BEFORE the groupBy — window-backed pivots
        # (row_count, session_count) are illegal directly in GROUP BY.
        # Pivot columns are keyed POSITIONALLY (_g0, _g1, ...): the
        # reference merges every push into one result tree by position,
        # so different << lines may tally different literal branch
        # labels (<< "purchase" vs << "return") into the same grouping
        # column. Display names come from the first push's derived
        # names and are restored after the aggregate.
        parts: list[DataFrame] = []
        display: list[str] | None = None
        for b in self.script.blocks:
            leaf, block_rows = self._leaf_matched(b, ctx)
            for guard, push in leaf.pushes:
                # an if-guarded push tallies only rows satisfying the
                # branch condition — the flow control lowers to a
                # filter over the matched rows (CASE WHEN shape)
                cur = (
                    block_rows
                    if guard is None
                    else block_rows.withColumn(
                        "_osl_guard", _bool_col(guard, ctx)
                    ).filter(F.col("_osl_guard")).drop("_osl_guard")
                )
                names = []
                for i, e in enumerate(push):
                    col, name = _pexpr_col(e, ctx)
                    cur = cur.withColumn(f"_g{i}", col)
                    names.append(name)
                if display is None:
                    display = names
                elif len(names) != len(display):
                    raise OslUnsupported(
                        f"pushes disagree on pivot arity: {names} vs "
                        f"{display} — all << lines must push the same "
                        "number of pivots"
                    )
                parts.append(cur)
        if display is None:
            raise OslUnsupported("compile target needs at least one << push")
        gnames = [f"_g{i}" for i in range(len(display))]
        rows = parts[0]
        for p in parts[1:]:
            rows = rows.unionByName(p)

        selects = self.script.selects or [("count", "id", None, None, False)]
        # reference default: the SAME row tallied into the SAME group
        # by several pushes counts once (the eventDistinct key of
        # src/queryinterpreter.cpp:229 includes the row number); `all`
        # skips that dedup. With one push part no duplicate (row,
        # group) can exist, so the visit-flag window is only added for
        # multi-push scripts that have a non-`all` aggregator.
        needs_dedup = len(parts) > 1 and any(
            not a and not (f == "count" and p == "id") for f, p, _al, _w, a in selects
        )
        first_visit = None
        if needs_dedup:
            from pyspark.sql import Window as _W

            rows = rows.withColumn(
                "_visit_rn",
                F.row_number().over(
                    _W.partitionBy(self.order_col, *gnames).orderBy(F.lit(1))
                ),
            )
            first_visit = F.col("_visit_rn") == 1

        aggs: list[tuple[str, Any, str]] = []
        count_people = False
        people_alias = "people"
        for fn, prop, alias, with_prop, all_flag in selects:
            if fn == "count" and prop == "id":
                if with_prop is not None:
                    # `count id with Y`: the distinct key is Y's value
                    # instead of the customer id (queryinterpreter.cpp
                    # distinctColumn) — distinct Y values per group
                    aggs.append(
                        ("dcount", ctx.resolve(with_prop), alias or "people")
                    )
                elif all_flag:
                    # nonDistinct people: every matched row counts
                    aggs.append(("count", F.lit(1), alias or "people"))
                else:
                    count_people = True
                    people_alias = alias or "people"
                continue
            col = ctx.resolve(with_prop) if (
                fn == "dcount" and with_prop is not None
            ) else ctx.resolve(prop)
            if first_visit is not None and not all_flag and fn != "dcount":
                col = F.when(first_visit, col)
            aggs.append((fn, col, alias or f"{fn}_{prop}"))
        out = event_aggregate(
            rows,
            group_by=gnames,
            aggs=aggs,
            user_col=self.user_col,
            count_people=count_people,
            people_alias=people_alias,
        )
        for g, disp in zip(gnames, display):
            out = out.withColumnRenamed(g, disp)
        for name, direction in self.script.sorts:
            if name == "group":
                # REST `sort=group`: order by the grouping names
                # (docs/rest/README.md query-params table)
                keys = [
                    F.asc(d) if direction == "asc" else F.desc(d)
                    for d in display
                ]
                out = out.orderBy(*keys)
            elif name in out.columns:
                out = out.orderBy(
                    F.asc(name) if direction == "asc" else F.desc(name)
                )
        return out

    def run(
        self,
        spark: SparkSession,
        sf_dir: str,
        table: str = "events",
        **kw,
    ) -> DataFrame:
        from openset_spark.sources.tables import load_table

        return self.dataframe(load_table(spark, sf_dir, table), **kw)


def compile_osl(
    script: str,
    column_map: dict[str, str] | None = None,
    **kw,
) -> OslQuery:
    """Parse + bind an OSL script. ``column_map`` maps OSL property
    names to events-table columns (``event``/``stamp``/``id``/
    ``session``/``row_count`` are built in)."""
    return OslQuery(parse_osl(script), column_map=column_map, **kw)


# ----------------------------------------------- @segment compilation
def _leaf_rowcond(p: Pred, ctx: _Ctx) -> Column:
    """ROW-level condition of one segment leaf predicate (quantifier
    applied later, per user)."""
    if p.op in ("contains", "any", "in"):
        base = _word_cmp(p, ctx)
    else:
        base = _CMP_FNS[p.op](ctx.resolve(p.prop), _value_lit(p.value, ctx))
    if p.window is not None:
        base = base & _window_cond(p.window, ctx)
    return base


class OslSegments:
    """A compiled /counts-endpoint script: named segments + policies.

    Spark-first: ALL segments' leaf predicates evaluate in ONE
    ``groupBy(user)`` aggregation over one scan of the events table —
    each leaf is a ``max(when(rowcond, 1)) == 1`` conditional
    aggregate, and each segment's membership is boolean algebra over
    its leaves (the reference's bitmap composition,
    src/oloop_segment.cpp). N segments never cost N scans.

    Quantifier semantics per the reference's per-customer scripts:
    ``.ever``/bare/``.is`` -> the customer has a matching row;
    ``.never``/``.is_not`` -> the customer has none.
    """

    def __init__(
        self,
        defs: list,
        column_map: dict[str, str] | None = None,
        user_col: str = "user_id",
        ts_col: str = "ts",
        event_col: str = "event_type",
        order_col: str = "event_id",
    ) -> None:
        self.defs = defs
        self.column_map = dict(column_map or {})
        self.user_col = user_col
        self.ts_col = ts_col
        self.event_col = event_col
        self.order_col = order_col

    def _ctx(self, events: DataFrame, now_ms: int | None) -> _Ctx:
        if now_ms is None:
            now_ms = int(datetime.now(timezone.utc).timestamp() * 1000)
        return _Ctx(
            events, self.user_col, self.ts_col, self.event_col,
            self.order_col, self.column_map, now_ms,
        )

    def membership(
        self, events: DataFrame, now_ms: int | None = None,
        defs: list | None = None,
    ) -> DataFrame:
        ctx = self._ctx(events, now_ms)
        defs = self.defs if defs is None else defs
        leaves: dict[Pred, str] = {}

        def collect(e):
            if isinstance(e, Pred):
                leaves.setdefault(e, f"_leaf_{len(leaves)}")
            elif isinstance(e, BoolOp):
                for p in e.parts:
                    collect(p)
            else:
                raise OslUnsupported(f"@segment expression node: {e!r}")

        for d in defs:
            collect(d.where)
        aggs = [
            (
                F.max(
                    F.when(_leaf_rowcond(p, ctx), F.lit(1)).otherwise(F.lit(0))
                )
                == 1
            ).alias(name)
            for p, name in leaves.items()
        ]

        def seg_col(e) -> Column:
            if isinstance(e, Pred):
                ever = F.col(leaves[e])
                return ever if e.mode in ("is", "ever") else ~ever
            cols = [seg_col(p) for p in e.parts]
            out = cols[0]
            for c in cols[1:]:
                out = (out & c) if e.kind == "and" else (out | c)
            return out

        m = ctx.df.groupBy(self.user_col).agg(*aggs)
        return m.select(
            self.user_col, *[seg_col(d.where).alias(d.name) for d in defs]
        )

    def counts(
        self, events: DataFrame, now_ms: int | None = None
    ) -> DataFrame:
        """The /counts response: (segment, people), script order."""
        m = self.membership(events, now_ms)
        names = [d.name for d in self.defs]
        agg = m.agg(
            *[F.sum(F.col(n).cast("long")).cast("long").alias(n) for n in names]
        )
        return agg.selectExpr(
            f"stack({len(names)}, "
            + ", ".join(f"'{n}', `{n}`" for n in names)
            + ") as (segment, people)"
        )

    def _as_simple_segment(self, d):
        """A Segment (incremental-refresh capable) when the expression
        is one symbol-comparator pred — or an OR of same-mode evers,
        since ever(p1) || ever(p2) == ever(p1 || p2). Window/word-op/
        compound expressions fall back to recompute-on-refresh."""
        from openset_spark.operators.segments import Segment

        preds = (
            list(d.where.parts)
            if isinstance(d.where, BoolOp) and d.where.kind == "or"
            else [d.where]
        )
        if not all(
            isinstance(p, Pred)
            and p.op in _CMP_FNS
            and p.window is None
            and p.mode in ("is", "ever")
            and not isinstance(p.value, PName)
            and p.prop not in ("stamp", "event_time", "id", "now",
                               "row_count", "session_count")
            for p in preds
        ):
            return None
        cols = [
            _CMP_FNS[p.op](
                F.col(self.column_map.get(p.prop, p.prop))
                if p.prop != "event"
                else F.col(self.event_col),
                F.lit(p.value),
            )
            for p in preds
        ]
        out = cols[0]
        for c in cols[1:]:
            out = out | c
        return Segment(d.name, out, "ever")

    def register(self, store, stream_predicates: dict | None = None) -> None:
        """Install every section into a ``SegmentStore`` with its
        parsed policy params. Simple predicates keep the store's
        delta-only incremental refresh; compound/windowed ones
        recompute on refresh (still one scan each)."""
        for d in self.defs:
            policy = dict(d.params)
            simple = self._as_simple_segment(d)
            if simple is not None:
                store.define(
                    simple,
                    stream_predicate=(stream_predicates or {}).get(d.name),
                    **policy,
                )
            else:
                # now_ms flows from the store's caller so a
                # now-anchored window (stamp.within(.., now)) inside a
                # registered @segment evaluates against the SAME pinned
                # clock as counts_query(now_ms=X), not the wall clock
                store.define_custom(
                    d.name,
                    lambda ev, now_ms=None, d=d: self.membership(
                        ev, now_ms=now_ms, defs=[d]
                    ),
                    **policy,
                )


def compile_osl_segments(
    script: str, column_map: dict[str, str] | None = None, **kw
) -> OslSegments:
    """Parse + bind a /counts ``@segment`` script
    (docs/rest/README.md:258-290)."""
    from openset_spark.osl.parser import parse_segments

    return OslSegments(parse_segments(script), column_map=column_map, **kw)


# ---------------------------------------------- histogram compilation
_HIST_AGG_PRIMS = {
    "first_stamp": lambda ts, user: F.min(F.col(ts)),
    "last_stamp": lambda ts, user: F.max(F.col(ts)),
    "row_count": lambda ts, user: F.count(F.lit(1)),
    "session_count": lambda ts, user: F.max(F.col("session")),
}

# batch docs spell them last_event/first_event (README:410)
_PRIM_ALIASES = {"last_event": "last_stamp", "first_event": "first_stamp"}

_SCALAR_AGG_COLS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "dcount": F.count_distinct,
}


def _rowlevel_bool(expr: Any, ctx: _Ctx) -> Column:
    """Row-level boolean for agg-where conditions: quantifier modes
    would nest a window inside an aggregate — reject them."""

    def check(e):
        if isinstance(e, Pred):
            if e.mode not in ("is", "is_not"):
                raise OslUnsupported(
                    f".{e.mode}() inside an aggregate's where — use a "
                    "row-level .is()/.is_not() condition"
                )
        elif isinstance(e, BoolOp):
            for p in e.parts:
                check(p)

    check(expr)
    return _bool_col(expr, ctx)


class OslHistogram:
    """A compiled histogram-endpoint script: ``return(expr)`` computes
    ONE scalar per customer (docs/rest/README.md:349-357,
    src/oloop_histogram.cpp).

    Spark-first: every per-user primitive the expression references
    (``first_stamp``/``last_stamp``/``row_count``/``session_count``)
    becomes one aggregate in a single ``groupBy(user)``; the arithmetic
    runs as a projection over that one-row-per-user frame, and the
    bucketing reuses ``operators/histogram.py`` (a second tiny
    aggregate). One scan, two shuffles, at any scale.
    """

    def __init__(
        self,
        expr: Any,
        user_col: str = "user_id",
        ts_col: str = "ts",
        event_col: str = "event_type",
        foreach: str | None = None,
        column_map: dict[str, str] | None = None,
    ) -> None:
        self.expr = expr
        self.user_col = user_col
        self.ts_col = ts_col
        self.event_col = event_col
        # ``foreach=`` histogram param: the scalar is computed per
        # (user, property value); each_value resolves to the property
        self.foreach = foreach
        self.column_map = dict(column_map or {})

    def _walk(self) -> tuple[set[str], list]:
        """(referenced prim/unknown names, PAggWhere nodes in eval
        order)."""
        names: set[str] = set()
        aggs: list = []

        def walk(e):
            if isinstance(e, PName):
                names.add(_PRIM_ALIASES.get(e.name, e.name))
            elif isinstance(e, PCall):
                for a in e.args:
                    walk(a)
            elif isinstance(e, PBin):
                walk(e.left)
                walk(e.right)
            elif isinstance(e, PAggWhere):
                if e not in aggs:
                    aggs.append(e)

        walk(self.expr)
        return names, aggs

    def per_user(
        self,
        events: DataFrame,
        now_ms: int | None = None,
        session_gap_ms: int = DEFAULT_SESSION_GAP_MS,
    ) -> DataFrame:
        """(user_col, value) — the scalar the script returns per
        customer."""
        names, aggwheres = self._walk()
        unknown = names - set(_HIST_AGG_PRIMS) - {"now"}
        if unknown:
            raise OslUnsupported(
                f"histogram scripts support per-user primitives "
                f"{sorted(_HIST_AGG_PRIMS)} + now; got {sorted(unknown)}"
            )
        if now_ms is None:
            now_ms = int(datetime.now(timezone.utc).timestamp() * 1000)
        df = events
        if "session_count" in names:
            df = with_session(df, session_gap_ms, self.user_col, self.ts_col)
        # row-pred context for agg-where conditions; each_value is the
        # foreach property (per-group it equals the group key, so
        # `shipper.is(== each_value)` folds to the group's own rows)
        cmap = dict(self.column_map)
        if self.foreach is not None:
            cmap.setdefault("each_value", self.foreach)
        ctx = _Ctx(
            df, self.user_col, self.ts_col, self.event_col,
            "event_id", cmap, now_ms,
        )
        agg_alias = {aw: f"_aw_{i}" for i, aw in enumerate(aggwheres)}
        agg_exprs: list[Column] = []
        for aw, alias in agg_alias.items():
            col = ctx.resolve(aw.prop)
            if aw.where is not None:
                cond = _rowlevel_bool(aw.where, ctx)
                col = F.when(cond, col)
            fn = _SCALAR_AGG_COLS.get(aw.fn)
            if fn is None:
                raise OslUnsupported(f"aggregate {aw.fn}() in histogram")
            agg_exprs.append(fn(col).alias(alias))
        agg_exprs += [
            _HIST_AGG_PRIMS[n](self.ts_col, self.user_col).alias(f"_{n}")
            for n in sorted(names)
            if n in _HIST_AGG_PRIMS
        ]
        if not agg_exprs:
            agg_exprs = [F.count(F.lit(1)).alias("_row_count")]
        gcols = [self.user_col] + (
            [self.foreach] if self.foreach is not None else []
        )
        per_user = df.groupBy(*gcols).agg(*agg_exprs)

        def ev(e) -> Column:
            if isinstance(e, PLit):
                return F.lit(e.value)
            if isinstance(e, PAggWhere):
                return F.col(agg_alias[e])
            if isinstance(e, PName):
                name = _PRIM_ALIASES.get(e.name, e.name)
                if name == "now":
                    return F.lit(now_ms)
                col = F.col(f"_{name}")
                if name in ("first_stamp", "last_stamp"):
                    return epoch_ms(col)  # OSL stamps are epoch ms
                return col
            if isinstance(e, PBin):
                l, r = ev(e.left), ev(e.right)
                return {
                    "+": l + r, "-": l - r, "*": l * r, "/": l / r,
                }[e.op]
            if isinstance(e, PCall):
                fn = _PIVOT_FNS.get(e.fn)
                if fn is None or e.fn == "bucket":
                    raise OslUnsupported(f"histogram function {e.fn}()")
                arg = ev(e.args[0])
                if e.fn in _TIME_ARG_FNS:
                    out = fn(_ts_of(arg))
                    return (
                        epoch_ms(out)
                        if e.fn in _START_OF_FNS
                        else out.cast("long")
                    )
                return fn(arg)
            raise OslUnsupported(f"histogram expression node: {e!r}")

        return per_user.select(
            *gcols, ev(self.expr).alias("value")
        )

    def histogram(
        self,
        events: DataFrame,
        bucket: float = 1.0,
        min_value: float | None = None,
        max_value: float | None = None,
        name: str = "value",
        **kw,
    ) -> DataFrame:
        from openset_spark.operators.histogram import histogram

        return histogram(
            self.per_user(events, **kw),
            "value",
            bucket=bucket,
            min_value=min_value,
            max_value=max_value,
            user_col=self.user_col,
            name=name,
        )


def compile_osl_histogram(script: str, **kw) -> OslHistogram:
    """Parse + bind a histogram-endpoint ``return(expr)`` script."""
    from openset_spark.osl.parser import parse_histogram

    return OslHistogram(parse_histogram(script), **kw)


# --------------------------------------------------- batch compilation
class OslBatch:
    """A compiled /batch document (docs/rest/README.md:379-418): the
    reference's combined segment + property + histogram POST body.

    Execution binds to ``plans/batch.py::run_batch``: the events scan
    is cached once, segment membership is computed once and shared by
    the ``@use``-scoped property counts, and every ``@histogram``
    scalar is one groupBy(user[, foreach]) — k sub-queries cost one
    read plus k tiny shuffles.
    """

    def __init__(
        self,
        doc,
        column_map: dict[str, str] | None = None,
        user_col: str = "user_id",
        ts_col: str = "ts",
        event_col: str = "event_type",
        order_col: str = "event_id",
    ) -> None:
        self.doc = doc
        self.column_map = dict(column_map or {})
        self.user_col = user_col
        self.ts_col = ts_col
        self.event_col = event_col
        self.order_col = order_col

    def _to_segment(self, d, ctx: _Ctx):
        """Lift a SegmentDef to one ever/never row predicate:
        ever(p1) || ever(p2) == ever(p1 || p2) and
        never(p1) && never(p2) == never(p1 || p2); anything else is
        outside the batch operator's single-Segment shape."""
        from openset_spark.operators.segments import Segment

        preds = (
            list(d.where.parts)
            if isinstance(d.where, BoolOp)
            else [d.where]
        )
        if not all(isinstance(p, Pred) for p in preds):
            raise OslUnsupported(
                f"@segment {d.name}: nested boolean shapes need the "
                "/counts endpoint (OslSegments)"
            )
        modes = {("ever" if p.mode in ("is", "ever") else "never")
                 for p in preds}
        kind = d.where.kind if isinstance(d.where, BoolOp) else "or"
        if len(modes) > 1 or (
            len(preds) > 1
            and (modes == {"ever"}) != (kind == "or")
        ):
            raise OslUnsupported(
                f"@segment {d.name}: mixed quantifiers need the "
                "/counts endpoint (OslSegments)"
            )
        conds = [_leaf_rowcond(p, ctx) for p in preds]
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return Segment(d.name, out, modes.pop())

    def batch_query(self, events: DataFrame, now_ms: int | None = None):
        """Bind to the events schema (set-property matchers dispatch
        on array vs scalar columns) and return the executable
        BatchQuery."""
        from openset_spark.plans.batch import (
            BatchQuery,
            HistogramSpec,
            PropertySpec,
        )

        # one wall-clock `now` shared by segment windows AND histogram
        # scalars (a now-anchored @segment must not see epoch 0)
        if now_ms is None:
            now_ms = int(datetime.now(timezone.utc).timestamp() * 1000)
        ctx = _Ctx(
            events, self.user_col, self.ts_col, self.event_col,
            self.order_col, self.column_map, now_ms,
        )
        segments = tuple(
            self._to_segment(d, ctx) for d in self.doc.segments
        )
        properties = tuple(
            PropertySpec(name, bucket=params.get("bucket"))
            for name, params in self.doc.properties
        )

        def scalar_of(h):
            hist = OslHistogram(
                h.expr,
                user_col=self.user_col,
                ts_col=self.ts_col,
                event_col=self.event_col,
                foreach=h.params.get("foreach"),
                column_map=self.column_map,
            )
            return lambda ev: hist.per_user(ev, now_ms=now_ms)

        histograms = tuple(
            HistogramSpec(
                name=h.name,
                scalar=scalar_of(h),
                bucket=h.params.get("bucket", 1.0),
                min_value=h.params.get("min_value"),
                max_value=h.params.get("max_value"),
                foreach=h.params.get("foreach"),
            )
            for h in self.doc.histograms
        )
        return BatchQuery(
            segments=segments,
            use=tuple(self.doc.use),
            properties=properties,
            histograms=histograms,
        )

    def run(
        self, events: DataFrame, now_ms: int | None = None
    ) -> dict[str, DataFrame]:
        from openset_spark.plans.batch import run_batch

        return run_batch(events, self.batch_query(events, now_ms))


def compile_osl_batch(script: str, **kw) -> OslBatch:
    """Parse + bind a /batch-endpoint OSL document."""
    from openset_spark.osl.parser import parse_batch

    return OslBatch(parse_batch(script), **kw)
