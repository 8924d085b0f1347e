"""General OSL programmability: expression/statement AST + replay
interpreter.

Covers the imperative half of the language the declarative compiler
(``osl/compiler.py``) does not: user variables, ``dict``/``set``/
``list`` containers with ``+``/``-``/``in``/``contains``/``any``/
``len``/``keys`` (docs/osl/language_reference.md:118-273), semantic
``if``/``for``/``break``/``continue`` (language_reference.md:343-426),
and ``debug()`` — the surface the reference exercises in
test/test_osl_language.h.

Execution model (Spark-first, not a row interpreter):

- CONSTANT logic — variables, containers, flow over literals — is
  customer-independent, so it evaluates driver-side once with full
  Python semantics. Running it once IS the distributed answer.
- Expressions touching row/customer properties lower to Spark Column
  expressions over ONE per-user aggregate frame:
    * a bare property reference outside ``each_row`` reads the
      CURSOR row (the reference starts each customer's interpreter at
      row 0) -> ``min_by(col, order)`` per user;
    * ``prop.ever(..)/.never(..)`` -> conditional-max flag per user;
    * a counter incremented inside an ``each_row`` body ->
      initial + step * (matched-row count per user).
  A replay over N customers is one groupBy(user) plan + one small
  collect of the debug columns — never a per-row driver loop.
- ``debug(expr)`` under an ``if`` whose condition is row-dependent
  logs only for customers where the condition holds (the guard
  becomes a boolean column; reference semantics: the branch body
  only executes when taken).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from openset_spark.osl.parser import (
    OslSyntaxError,
    OslUnsupported,
    PName,
    Pred,
    _EACH_ROW_RE,
    _logical_lines,
    _parse_expr,
    _parse_mods,
    _parse_push,
    _tokenize,
    _Tokens,
)

# ------------------------------------------------------ expression AST
@dataclass(frozen=True)
class LLit:
    value: Any


@dataclass(frozen=True)
class LName:
    name: str


@dataclass(frozen=True)
class LList:
    items: tuple


@dataclass(frozen=True)
class LDict:
    pairs: tuple  # ((key, expr), ...)


@dataclass(frozen=True)
class LBin:
    op: str  # + - * / == != < > <= >= in contains any && ||
    left: Any
    right: Any


@dataclass(frozen=True)
class LNeg:
    expr: Any


@dataclass(frozen=True)
class LIndex:
    obj: Any
    idx: Any


@dataclass(frozen=True)
class LCall:
    fn: str
    args: tuple


@dataclass(frozen=True)
class LMod:
    """``prop.ever(== x)`` / ``prop.never(contains y)`` inside a
    general expression — a per-customer quantifier leaf."""

    prop: str
    mode: str  # ever | never | is | is_not
    op: str
    value: Any


# ------------------------------------------------------- statement AST
@dataclass
class SAssign:
    name: str
    indexes: tuple  # () for plain `x = ...`; exprs for `x[k][i] = ...`
    expr: Any


@dataclass
class SIf:
    cond: Any
    body: list


@dataclass
class SFor:
    var: str
    it: Any
    body: list


@dataclass
class SBreak:
    depth: int = 1


@dataclass
class SContinue:
    pass


@dataclass
class SDebug:
    expr: Any


@dataclass
class SReturn:
    """``return(expr)``: the script's per-customer result value.
    Inside an ``each_row`` scan it reads the FIRST matched row
    (language_reference.md:380-391)."""

    expr: Any


@dataclass
class SAggAssign:
    """Aggregate assignment — the customer-property write form
    ``total = sum(price).within(1_year, now) where event.is(== "x")``
    (language_reference.md:102-117) and the one-line searches
    ``row``/``test`` (language_reference.md:767-800). Lowers to one
    per-user conditional aggregate; ``first``/``last`` use the
    min/max-of-(order, value)-struct trick (the max_by update
    frame)."""

    name: str
    fn: str  # sum count dcount min max avg first last row test
    arg: Any  # expression AST or None (count/row/test)
    window: Any  # (span_expr, anchor_expr) or None
    where: Any  # parser Pred/BoolOp tree or None
    reverse: bool = False  # row.reverse(): newest-first search


@dataclass
class SEachRow:
    where: Any  # parser Pred/BoolOp tree
    mods: dict
    body: list


@dataclass
class SPush:
    exprs: list


@dataclass
class SExit:
    pass


# -------------------------------------------------- expression parsing
_CMP_OPS = {"==", "!=", "<", ">", "<=", ">="}
_WORD_OPS = {"in", "contains", "any"}
_PRED_MODES = {"is", "is_not", "ever", "never"}


def parse_expr_text(src: str):
    tk = _Tokens(_tokenize(src))
    e = _expr(tk)
    if tk.peek():
        raise OslSyntaxError(f"trailing tokens in expression: {src!r}")
    return e


def _expr(tk):
    parts = [_and_expr(tk)]
    while tk.peek() and tk.peek()[1] in ("||", "or"):
        tk.next()
        parts.append(_and_expr(tk))
    out = parts[0]
    for p in parts[1:]:
        out = LBin("||", out, p)
    return out


def _and_expr(tk):
    parts = [_cmp_expr(tk)]
    while tk.peek() and tk.peek()[1] in ("&&", "and"):
        tk.next()
        parts.append(_cmp_expr(tk))
    out = parts[0]
    for p in parts[1:]:
        out = LBin("&&", out, p)
    return out


def _cmp_expr(tk):
    left = _add_expr(tk)
    t = tk.peek()
    if t and (t[1] in _CMP_OPS or t[1] in _WORD_OPS):
        op = tk.next()[1]
        right = _add_expr(tk)
        return LBin(op, left, right)
    return left


def _add_expr(tk):
    out = _mul_expr(tk)
    while tk.peek() and tk.peek()[1] in ("+", "-"):
        op = tk.next()[1]
        out = LBin(op, out, _mul_expr(tk))
    return out


def _mul_expr(tk):
    out = _unary(tk)
    while tk.peek() and tk.peek()[1] in ("*", "/"):
        op = tk.next()[1]
        out = LBin(op, out, _unary(tk))
    return out


def _unary(tk):
    if tk.peek() and tk.peek()[1] == "-":
        tk.next()
        return LNeg(_unary(tk))
    return _postfix(tk)


def _postfix(tk):
    out = _atom(tk)
    while True:
        t = tk.peek()
        if t and t[1] == "[":
            tk.next()
            idx = _expr(tk)
            tk.expect("]")
            out = LIndex(out, idx)
        elif t and t[1] == ".":
            tk.next()
            _k, name = tk.next()
            tk.expect("(")
            if name not in _PRED_MODES:
                raise OslUnsupported(f"method .{name}() in expression")
            if not isinstance(out, LName):
                raise OslUnsupported(f".{name}() on a non-property")
            # comparator (symbol or word) + value expression
            ck, ctext = tk.next()
            if ctext not in _CMP_OPS and ctext not in _WORD_OPS:
                raise OslSyntaxError(
                    f".{name}() needs a comparator, got {ctext!r}"
                )
            val = _expr(tk)
            tk.expect(")")
            out = LMod(out.name, name, ctext, val)
        else:
            return out


def _atom(tk):
    t = tk.peek()
    if t is None:
        raise OslSyntaxError("unexpected end of expression")
    kind, text = t
    if kind == "NUM":
        tk.next()
        return LLit(float(text) if "." in text else int(text))
    if kind == "STR":
        tk.next()
        return LLit(text[1:-1])
    if kind == "SPAN":
        tk.next()
        from openset_spark.functions.time import span as span_ms

        n, unit = text.split("_", 1)
        return LLit(span_ms(int(n), unit.lower()))
    if text == "(":
        tk.next()
        e = _expr(tk)
        tk.expect(")")
        return e
    if text == "[":
        tk.next()
        items = []
        while not tk.accept("]"):
            items.append(_expr(tk))
            tk.accept(",")
        return LList(tuple(items))
    if text == "{":
        tk.next()
        pairs = []
        while not tk.accept("}"):
            kk, kt = tk.next()
            if kk == "STR":
                key = kt[1:-1]
            elif kk == "NAME":
                key = kt  # the reference's tests use unquoted keys
            else:
                raise OslSyntaxError(f"bad dict key {kt!r}")
            tk.expect(":")
            pairs.append((key, _expr(tk)))
            tk.accept(",")
        return LDict(tuple(pairs))
    if kind == "NAME":
        tk.next()
        if text in ("true", "false"):
            return LLit(text == "true")
        if text == "nil":
            return LLit(None)
        if tk.peek() and tk.peek()[1] == "(":
            tk.next()
            args = []
            while not tk.accept(")"):
                args.append(_expr(tk))
                tk.accept(",")
            return LCall(text, tuple(args))
        return LName(text)
    raise OslSyntaxError(f"unexpected token {text!r}")


# --------------------------------------------------- statement parsing
_ASSIGN_SPLIT_RE = re.compile(
    r"^([A-Za-z_]\w*)((?:\[[^\[\]]*\])*)\s*=\s*(?![=])(.+)$"
)
_AGG_ASSIGN_HEAD_RE = re.compile(
    r"^([A-Za-z_]\w*)\s*=\s*(sum|count|dcount|min|max|avg|first|last)\s*\("
)
_SEARCH_ASSIGN_RE = re.compile(
    r"^([A-Za-z_]\w*)\s*=\s*(row|test)\b\s*(.*)$", re.DOTALL
)
_RETURN_RE = re.compile(r"^return\s*\((.*)\)\s*$", re.DOTALL)


def _balanced(src: str, start: int) -> int:
    """Index just past the ``)`` matching the ``(`` at ``start``."""
    depth = 0
    for i in range(start, len(src)):
        if src[i] == "(":
            depth += 1
        elif src[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise OslSyntaxError(f"unbalanced parens in {src!r}")


def _parse_agg_assign(line: str) -> SAggAssign | None:
    """``name = agg(arg)[.within(span, anchor)] [where <pred>]`` or
    the one-line search ``name = row|test[.reverse()][.within(...)]
    where <pred>``; None when the line is neither shape."""
    reverse = False
    if sm := _SEARCH_ASSIGN_RE.match(line):
        name, fn, rest = sm.group(1), sm.group(2), sm.group(3).strip()
        arg = None
    else:
        m = _AGG_ASSIGN_HEAD_RE.match(line)
        if not m:
            return None
        name, fn = m.group(1), m.group(2)
        open_idx = m.end() - 1
        close = _balanced(line, open_idx)
        arg_src = line[open_idx + 1 : close - 1].strip()
        arg = parse_expr_text(arg_src) if arg_src else None
        rest = line[close:].strip()
    window = None
    if rm := re.match(r"^\.\s*reverse\s*\(\s*\)", rest):
        reverse = True
        rest = rest[rm.end() :].strip()
    if rest.startswith("."):
        wm = re.match(r"^\.\s*within\s*\(", rest)
        if not wm:
            raise OslSyntaxError(f"bad aggregate modifier in {line!r}")
        wclose = _balanced(rest, wm.end() - 1)
        inner = rest[wm.end() : wclose - 1]
        # split on the ONE top-level comma
        depth, cut = 0, -1
        for i, ch in enumerate(inner):
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                cut = i
                break
        if cut < 0:
            raise OslSyntaxError(".within(span, anchor) needs two args")
        window = (
            parse_expr_text(inner[:cut].strip()),
            parse_expr_text(inner[cut + 1 :].strip()),
        )
        rest = rest[wclose:].strip()
    where = None
    if rest:
        wm = re.match(r"^where\s+(.+)$", rest, re.DOTALL)
        if not wm:
            raise OslSyntaxError(f"trailing tokens in aggregate assign: {rest!r}")
        tk = _Tokens(_tokenize(wm.group(1)))
        where = _parse_expr(tk)
        if tk.peek():
            raise OslSyntaxError(f"trailing tokens in where: {rest!r}")
    if fn in ("row", "test") and where is None:
        raise OslSyntaxError(f"{fn} search needs a where clause: {line!r}")
    return SAggAssign(name, fn, arg, window, where, reverse)
_IF_RE = re.compile(r"^if[\s(](.*)$", re.DOTALL)
_FOR_RE = re.compile(r"^for\s+([A-Za-z_]\w*)\s+in\s+(.+)$")
_BREAK_RE = re.compile(r"^break(?:\s*\(\s*(\d+)\s*\))?$")
_DEBUG_RE = re.compile(r"^debug\s*\((.*)\)\s*$", re.DOTALL)
_LOG_RE = re.compile(r"^log\s*\(")


def parse_statements(script: str) -> list:
    lines = _logical_lines(script)
    stmts, i = _parse_stmt_body(lines, 0, top=True)
    return stmts


def _parse_stmt_body(lines, i, top=False):
    out: list = []
    while i < len(lines):
        line = lines[i]
        if line == "end":
            if top:
                raise OslSyntaxError("unmatched 'end'")
            return out, i + 1
        if m := _IF_RE.match(line):
            cond = parse_expr_text(m.group(1).strip())
            body, i = _parse_stmt_body(lines, i + 1)
            out.append(SIf(cond, body))
        elif m := _FOR_RE.match(line):
            it = parse_expr_text(m.group(2).strip())
            body, i = _parse_stmt_body(lines, i + 1)
            out.append(SFor(m.group(1), it, body))
        elif m := _BREAK_RE.match(line):
            out.append(SBreak(int(m.group(1) or 1)))
            i += 1
        elif line == "continue":
            out.append(SContinue())
            i += 1
        elif line == "exit":
            out.append(SExit())
            i += 1
        elif m := _DEBUG_RE.match(line):
            out.append(SDebug(parse_expr_text(m.group(1).strip())))
            i += 1
        elif _LOG_RE.match(line):
            i += 1  # log() goes to the server log, not the result
        elif line.startswith("each_row"):
            m = _EACH_ROW_RE.match(line)
            if not m:
                raise OslSyntaxError(f"bad each_row header: {line!r}")
            mods = _parse_mods(m.group(1))
            tk = _Tokens(_tokenize(m.group(2)))
            where = _parse_expr(tk)
            if tk.peek():
                raise OslSyntaxError(f"trailing tokens in where: {line!r}")
            body, i = _parse_stmt_body(lines, i + 1)
            out.append(SEachRow(where, mods, body))
        elif line.startswith("<<"):
            out.append(SPush(_parse_push(line)))
            i += 1
        elif line in ("select", "sort"):
            # aggregate config: handled by the declarative compiler;
            # replay skips to the matching end
            depth = 1
            i += 1
            while i < len(lines) and depth:
                if lines[i] == "end":
                    depth -= 1
                i += 1
        elif agg := _parse_agg_assign(line):
            out.append(agg)
            i += 1
        elif m := _ASSIGN_SPLIT_RE.match(line):
            name, idx_src, rhs = m.group(1), m.group(2), m.group(3)
            indexes = tuple(
                parse_expr_text(s)
                for s in re.findall(r"\[([^\[\]]*)\]", idx_src)
            )
            out.append(SAssign(name, indexes, parse_expr_text(rhs.strip())))
            i += 1
        elif m := _RETURN_RE.match(line):
            out.append(SReturn(parse_expr_text(m.group(1).strip())))
            i += 1
        elif line.startswith("return"):
            out.append(SExit())  # bare return: stop this customer
            i += 1
        else:
            # bare expression statement — evaluated and discarded, like
            # the reference interpreter (its own test scripts contain
            # e.g. `test_value["animals"][1] == "dog"` as a no-op line,
            # test/test_osl_language.h:184)
            try:
                parse_expr_text(line)
            except (OslSyntaxError, OslUnsupported):
                raise OslSyntaxError(f"unrecognized statement: {line!r}")
            i += 1
    if not top:
        raise OslSyntaxError("block missing 'end'")
    return out, i


def const_assign(line: str, env: dict) -> tuple[str | None, Any]:
    """Parse one assignment line; return (name, value) when the RHS is
    a compile-time constant given ``env`` (earlier consts). Raises on
    non-assignments, indexed targets, or row-dependent RHS — callers
    treat any raise as "not a const"."""
    m = _ASSIGN_SPLIT_RE.match(line)
    if not m or m.group(2):
        raise OslUnsupported("not a plain assignment")
    value = const_eval(parse_expr_text(m.group(3).strip()), env)
    return m.group(1), value


class _NotConst(Exception):
    pass


def const_eval(e: Any, env: dict) -> Any:
    """Evaluate an expression AST over constants only; raise _NotConst
    when it touches anything row/customer-dependent."""
    if isinstance(e, LLit):
        return e.value
    if isinstance(e, LName):
        if e.name in env:
            v = env[e.name]
            if isinstance(v, Col):
                # a script variable that became row-dependent (e.g. a
                # counter accumulated in each_row) is NOT a constant
                raise _NotConst(e.name)
            return v
        raise _NotConst(e.name)
    if isinstance(e, LList):
        return [const_eval(x, env) for x in e.items]
    if isinstance(e, LDict):
        return {k: const_eval(v, env) for k, v in e.pairs}
    if isinstance(e, LNeg):
        return _cvar_neg(const_eval(e.expr, env))
    if isinstance(e, LIndex):
        return _index(const_eval(e.obj, env), const_eval(e.idx, env))
    if isinstance(e, LCall):
        return _call_const(e.fn, [const_eval(a, env) for a in e.args])
    if isinstance(e, LBin):
        left = const_eval(e.left, env)
        # short-circuit like the reference interpreter
        if e.op == "&&":
            return bool(left) and bool(const_eval(e.right, env))
        if e.op == "||":
            return bool(left) or bool(const_eval(e.right, env))
        return _binop_const(e.op, left, const_eval(e.right, env))
    raise _NotConst(repr(e))


def _index(obj, idx):
    try:
        return obj[idx]
    except (KeyError, IndexError, TypeError):
        return None  # the reference returns nil on a bad lookup


def _call_const(fn: str, args: list):
    if fn == "len":
        try:
            return len(args[0])
        except TypeError:
            return 0
    if fn == "keys":
        return list(args[0].keys()) if isinstance(args[0], dict) else []
    if fn == "int":
        try:
            return int(float(args[0]))
        except (TypeError, ValueError):
            return 0
    if fn == "float":
        try:
            return float(args[0])
        except (TypeError, ValueError):
            return 0.0
    if fn == "str":
        # through the cvar rendering (trimZeros fixed-point for
        # floats, true/false bools), same as every other string form
        return _cvar_str(args[0])
    if fn == "set":
        return set(args)
    if fn == "list":
        return list(args)
    if fn == "dict":
        if args:
            raise OslUnsupported("dict() takes no arguments")
        return {}
    # scalar built-ins (docs/osl/language_reference.md:641-766) —
    # semantics pinned to the documented examples
    if fn == "bucket":
        import math

        v, size = args[0], args[1]
        b = math.floor(v / size) * size
        if isinstance(v, int) and isinstance(size, int):
            return int(b)
        return round(b, 10)  # shave FP dust from size multiples
    if fn == "round":
        # doc example round(0.5)==1: half-up, not banker's
        from decimal import ROUND_HALF_UP, Decimal

        return int(
            Decimal(str(args[0])).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )
    if fn == "trunc":
        return int(args[0])
    if fn == "fix":
        return f"{float(args[0]):.{int(args[1])}f}"
    if fn == "iso8601_to_stamp":
        import datetime as _dt

        s = str(args[0]).replace("Z", "+00:00")
        return int(_dt.datetime.fromisoformat(s).timestamp() * 1000)
    if fn == "url_decode":
        from urllib.parse import unquote, urlsplit

        parts = urlsplit(str(args[0]))
        params: dict = {}
        for kv in (parts.query or "").split("&"):
            if not kv:
                continue
            if "=" in kv:
                k, v = kv.split("=", 1)
                params[k] = unquote(v)
            else:
                params[kv] = True  # bare param (doc example)
        return {
            "host": parts.hostname or "",
            "path": parts.path,
            "query": parts.query,
            "params": params,
        }
    raise _NotConst(f"call {fn}()")


def _trim_zeros(s: str) -> str:
    """cvar::trimZeros (lib/var/var.h:647): strip trailing zeros from a
    fixed-point rendering, keeping at least one decimal digit."""
    while len(s) > 2 and s[-1] == "0":
        s = s[:-1]
    if s[-1] == ".":
        s += "0"
    return s


def _cvar_str(v) -> str:
    """The reference's string rendering (cvar::getString): ints render
    without a decimal point, bools as true/false, floats through
    trimZeros(std::to_string(v)) — FIXED-POINT with 6 decimals then
    trailing-zero trim (lib/var/var.h:1149-1151), so 1234.5 -> "1234.5",
    53.0 -> "53.0", and 1234567.8 -> "1234567.8" (never scientific
    notation, unlike %g)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            return str(v)  # to_string renders inf/nan textually too
        return _trim_zeros(f"{v:.6f}")
    return str(v)


def _cvar_numeric(v):
    """Numeric view under cvar coercion, or None when not numeric:
    numeric STRINGS parse ("1234.5" -> 1234.5), bools are 1/0
    (test_lib_var.h "string numeric to all types")."""
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return None
    return None


def _cvar_neg(v):
    """Unary minus; a numeric STRING stays a string
    (test_lib_var.h "unary operator on all types":
    -cvar("1234.5") == "-1234.5")."""
    if isinstance(v, str):
        n = _cvar_numeric(v)
        if n is None:
            raise _NotConst(f"unary - on non-numeric string {v!r}")
        return v[1:] if v.startswith("-") else "-" + v
    return -v


def _cvar_eq(a, b) -> bool:
    """cvar cross-type equality (test_lib_var.h "cross type comparison
    operators"): "123" == 123, "123" == 123.0, "1"/"true" == true,
    ""/"0"/"false" == false."""
    if isinstance(a, bool) or isinstance(b, bool):
        s, o = (b, a) if isinstance(a, bool) else (a, b)
        if isinstance(s, str):
            return (s.lower() not in ("", "0", "false")) == o
        if isinstance(s, (int, float)):
            return bool(s) == o
        return s == o
    if isinstance(a, str) != isinstance(b, str):
        na, nb = _cvar_numeric(a), _cvar_numeric(b)
        if na is not None and nb is not None:
            return na == nb
        return False
    return a == b


def _cvar_cmp_pair(a, b):
    """Operands for an ordering comparison: numeric-coerce when types
    mix (string "9" < 10), raw values otherwise."""
    if isinstance(a, str) != isinstance(b, str):
        na, nb = _cvar_numeric(a), _cvar_numeric(b)
        if na is not None and nb is not None:
            return na, nb
    return a, b


def _binop_const(op: str, a, b):
    if op == "+":
        if isinstance(a, dict) and isinstance(b, dict):
            return {**a, **b}
        if isinstance(a, set):
            return a | (set(b) if not isinstance(b, set) else b)
        if isinstance(a, list) and isinstance(b, list):
            return a + b
        if isinstance(a, str) or isinstance(b, str):
            # cvar string math: + with a string on EITHER side is
            # concatenation of the string forms (test_lib_var.h
            # "text assignment with text addition": "49.5" + 5 ==
            # "49.55", 5 + "49.5" == "549.5")
            return _cvar_str(a) + _cvar_str(b)
        return a + b
    if op == "-":
        # container removal (language_reference.md:228-247)
        if isinstance(a, dict):
            drop = b if isinstance(b, (list, set, tuple)) else [b]
            return {k: v for k, v in a.items() if k not in drop}
        if isinstance(a, set):
            drop = b if isinstance(b, (list, set, tuple)) else [b]
            return a - set(drop)
        if isinstance(a, list):
            drop = b if isinstance(b, (list, set, tuple)) else [b]
            return [x for x in a if x not in drop]
        if isinstance(a, str):
            # cvar string math: subStrings (lib/var/var.h:657) loops
            # and removes ALL occurrences of the right side; a
            # non-string RHS is rendered through getString first
            # (var.h operator-(const cvar&) STR case), so
            # "a1b" - 1 == "ab".
            return a.replace(_cvar_str(b), "")
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return a / b
    if op == "==":
        return _cvar_eq(a, b)
    if op == "!=":
        return not _cvar_eq(a, b)
    if op == "<":
        a, b = _cvar_cmp_pair(a, b)
        return a < b
    if op == ">":
        a, b = _cvar_cmp_pair(a, b)
        return a > b
    if op == "<=":
        a, b = _cvar_cmp_pair(a, b)
        return a <= b
    if op == ">=":
        a, b = _cvar_cmp_pair(a, b)
        return a >= b
    if op == "in":
        try:
            return a in b
        except TypeError:
            return False
    if op == "contains":
        # container contains value / ALL of a list of values
        if isinstance(b, (list, set, tuple)):
            return all(x in a for x in b)
        try:
            return b in a
        except TypeError:
            return False
    if op == "any":
        if not isinstance(b, (list, set, tuple)):
            b = [b]
        return any(x in a for x in b)
    raise _NotConst(f"op {op!r}")


# ------------------------------------------------- replay interpreter
class Col:
    """A row/customer-dependent value: a Spark Column over the
    per-user frame the runner assembles at the end."""

    def __init__(self, col):
        self.col = col


class _Break(Exception):
    def __init__(self, depth: int):
        self.depth = depth


class _Continue(Exception):
    pass


class _Exit(Exception):
    pass


class ScriptRunner:
    """Replays a full OSL script (imperative statements included)
    against an events DataFrame and returns the reference
    interpreter's ``debugLog()`` — the list of values ``debug()``
    produced, per customer in script order.

    Reference: TestScriptRunner + debugLog in
    test/test_osl_language.h; semantics per
    docs/osl/language_reference.md. See the module docstring for the
    constant-vs-column execution split.
    """

    def __init__(
        self,
        script: str,
        column_map: dict[str, str] | None = None,
        user_col: str = "user_id",
        ts_col: str = "ts",
        event_col: str = "event_type",
        order_col: str = "event_id",
        now_ms: int = 0,
        customer_props: set[str] | None = None,
    ) -> None:
        self.stmts = parse_statements(script)
        self.column_map = dict(column_map or {})
        self.user_col = user_col
        self.ts_col = ts_col
        self.event_col = event_col
        self.order_col = order_col
        self.now_ms = now_ms
        # names declared is_customer in the catalog: assignments to
        # them are recorded as write-backs (language_reference.md:102)
        self.customer_props = set(customer_props or ())

    #: replay() is the DEBUG surface — it mirrors the reference
    #: interpreter's debugLog(), which is inherently a driver-side
    #: value list. It refuses beyond this many customers; use
    #: ``frame()`` (a distributed per-user DataFrame, no collect) as
    #: the query path at scale.
    MAX_REPLAY_USERS = 10_000

    # -- public -------------------------------------------------------
    def _run(self, events) -> None:
        """Execute the statement list, populating the aggregate /
        debug state (no Spark action yet)."""
        self._events = events
        self._aggs: dict[str, Any] = {}  # name -> aggregate Column
        self._count_frames: list = []  # (colname, DataFrame, fill_zero)
        self._row_debugs: dict[int, Any] = {}  # debug idx -> (df, col)
        self._debugs: list = []  # (kind, guard, value)
        self._ret_sites: list = []  # (matched_df, rowguard|None, value col)
        self._prop_writes: dict[str, Any] = {}  # prop -> const | Col
        env: dict[str, Any] = {}
        try:
            self._exec(self.stmts, env, None)
        except _Exit:
            pass

    def _user_frame(self):
        """The ONE per-user aggregate frame all user-level debug
        columns read from: groupBy(user) over the cursor/ever aggs,
        left-joined with each each_row counter count (same user key,
        so every join reuses the one hash partitioning)."""
        frame = self._events.groupBy(self.user_col).agg(
            *[c.alias(n) for n, c in self._aggs.items()]
        ) if self._aggs else self._events.select(self.user_col).distinct()
        for cname, cdf, fill_zero in self._count_frames:
            frame = frame.join(cdf, self.user_col, "left")
            if fill_zero:
                frame = frame.na.fill({cname: 0})
        return frame

    def frame(self, events, names: list[str] | None = None):
        """Aggregate-only result mode: one row per customer, one
        column per user-level ``debug()`` in script order (guarded
        debugs are NULL where the guard is false). This is the
        distributed query path — no driver collect, safe at any
        customer count."""
        from pyspark.sql import functions as F

        self._run(events)
        cols = []
        j = 0
        for _i, (kind, g, v) in enumerate(self._debugs):
            if kind == "rows":
                raise OslUnsupported(
                    "frame() with a per-row debug — use replay()"
                )
            val = v.col if isinstance(v, Col) else F.lit(v)
            if g is not None:
                val = F.when(g.col, val)
            name = names[j] if names else f"d{j}"
            cols.append(val.alias(name))
            j += 1
        return self._user_frame().select(self.user_col, *cols)

    def result_frame(self, events, name: str = "result"):
        """``return(expr)`` inside an ``each_row`` scan, lowered to a
        per-user FIRST-MATCH value (language_reference.md:380-391: the
        scan stops at return, so the result is the earliest matched
        row's value). Each return site aggregates min-of-(order, value)
        struct per user; with several sites the winner is the site
        whose firing row comes first (ties broken by script order).
        One groupBy per each_row block — distributed, no collect."""
        from pyspark.sql import functions as F

        self._run(events)
        if not self._ret_sites:
            raise OslUnsupported("script has no return(expr) in a scan")
        frame = self._user_frame()
        site_cols = []
        for i, site in enumerate(self._ret_sites):
            if site[0] == "agg":
                # simple scan: the site is already an aggregate column
                # in the shared per-user frame — no join at all
                site_cols.append(F.col(site[1]))
                continue
            _kind, mdf, g, val = site
            order = F.col(self.order_col)
            cand = F.struct(order.alias("o"), val.alias("v"))
            if g is not None:
                cand = F.when(g, cand)
            sf = mdf.groupBy(self.user_col).agg(F.min(cand).alias(f"_site{i}"))
            frame = frame.join(sf, self.user_col, "left")
            site_cols.append(F.col(f"_site{i}"))
        if len(site_cols) == 1:
            res = site_cols[0].getField("v")
        else:
            cands = [
                F.when(
                    c.isNotNull(),
                    F.struct(
                        c.getField("o").alias("o"),
                        F.lit(i).alias("i"),
                        c.getField("v").alias("v"),
                    ),
                )
                for i, c in enumerate(site_cols)
            ]
            res = F.least(*cands).getField("v")
        return frame.select(self.user_col, res.alias(name))

    def customer_updates(self, events):
        """The write-back frame for modified customer properties
        (language_reference.md:102-117): one row per customer, one
        column per property the script assigned via an aggregate
        assignment. The caller merges it into the customer record
        (see :meth:`apply_customer_updates`)."""
        from pyspark.sql import functions as F

        self._run(events)
        if not self._prop_writes:
            raise OslUnsupported("script writes no customer properties")
        return self._user_frame().select(
            self.user_col,
            *[
                (v.col if isinstance(v, Col) else F.lit(v)).alias(n)
                for n, v in self._prop_writes.items()
            ],
        )

    def apply_customer_updates(self, customers, events, id_col: str = "id"):
        """Merge the write-back frame into a customer dimension:
        updated values win, customers the script never touched keep
        their old value (left join + coalesce — broadcast-friendly
        when the update frame is small)."""
        from pyspark.sql import functions as F

        upd = self.customer_updates(events)
        renamed = upd.select(
            F.col(self.user_col).alias(id_col),
            *[F.col(n).alias(f"_new_{n}") for n in self._prop_writes],
        )
        out = customers.join(renamed, id_col, "left")
        for n in self._prop_writes:
            newc = F.col(f"_new_{n}")
            out = out.withColumn(
                n, F.coalesce(newc, F.col(n)) if n in customers.columns else newc
            ).drop(f"_new_{n}")
        return out

    def replay(self, events, max_users: int | None = None) -> list:
        """Run the script; return the flat debug log (single-customer
        fixtures log exactly the reference's debugLog; multi-customer
        frames log per customer, customers in user-id order).

        Debug surface only: raises beyond ``max_users`` customers
        (default MAX_REPLAY_USERS) — use :meth:`frame` for a
        distributed result."""
        from pyspark.sql import functions as F

        limit = self.MAX_REPLAY_USERS if max_users is None else max_users
        self._run(events)

        needs_frame = any(k == "user" for k, _g, _v in self._debugs)
        rows_by_user: dict[Any, Any] = {}
        if needs_frame:
            frame = self._user_frame()
            gcols = [
                (F.lit(True) if g is None else g.col).alias(f"_dg{i}")
                for i, (k, g, _v) in enumerate(self._debugs)
                if k == "user"
            ]
            vcols = [
                (v.col if isinstance(v, Col) else F.lit(v)).alias(f"_dv{i}")
                for i, (k, _g, v) in enumerate(self._debugs)
                if k == "user"
            ]
            collected = frame.select(
                self.user_col, *gcols, *vcols
            ).orderBy(self.user_col).limit(limit + 1).collect()
            if len(collected) > limit:
                raise OslUnsupported(
                    f"replay() over more than {limit} customers is a "
                    "driver-side debug surface — use frame() for a "
                    "distributed result"
                )
            rows_by_user = {r[self.user_col]: r for r in collected}

        row_vals: dict[int, list] = {}
        for i, (df, col) in self._row_debugs.items():
            got = df.select(
                self.user_col, col.alias("_v"), self.order_col
            ).orderBy(self.user_col, self.order_col).limit(limit + 1).collect()
            if len(got) > limit:
                raise OslUnsupported(
                    f"replay() over more than {limit} matched rows — "
                    "use frame() for a distributed result"
                )
            row_vals[i] = [r["_v"] for r in got]

        log: list = []
        if not rows_by_user:
            # no row-dependent debug: const entries once (they are
            # customer-independent), row-entry values in script order
            for i, (kind, _g, v) in enumerate(self._debugs):
                if kind == "const":
                    log.append(v)
                elif kind == "rows":
                    log.extend(row_vals.get(i, []))
            return log
        for user in sorted(rows_by_user):
            r = rows_by_user[user]
            for i, (kind, _g, v) in enumerate(self._debugs):
                if kind == "const":
                    log.append(v)
                elif kind == "rows":
                    log.extend(row_vals.get(i, []))
                elif r[f"_dg{i}"]:
                    log.append(r[f"_dv{i}"])
        return log

    # -- statement execution -----------------------------------------
    def _exec(self, stmts, env, guard) -> None:
        for st in stmts:
            if isinstance(st, SAssign):
                if guard is not None:
                    raise OslUnsupported(
                        "assignment under a row-dependent if"
                    )
                val = self._eval(st.expr, env)
                self._assign(st, val, env)
                if st.name in self.customer_props and not st.indexes:
                    self._record_prop_write(st.name, val)
            elif isinstance(st, SAggAssign):
                if guard is not None:
                    raise OslUnsupported(
                        "aggregate assignment under a row-dependent if"
                    )
                self._agg_assign(st, env)
            elif isinstance(st, SReturn):
                raise OslUnsupported(
                    "return(expr) outside an each_row scan — use the "
                    "histogram endpoint script path"
                )
            elif isinstance(st, SDebug):
                val = self._eval(st.expr, env)
                if guard is None and not isinstance(val, Col):
                    self._debugs.append(("const", None, val))
                else:
                    self._debugs.append(("user", guard, val))
            elif isinstance(st, SIf):
                cond = self._eval(st.cond, env)
                if isinstance(cond, Col):
                    from pyspark.sql import functions as F

                    g = cond if guard is None else Col(guard.col & cond.col)
                    self._exec(st.body, env, g)
                elif cond:
                    self._exec(st.body, env, guard)
            elif isinstance(st, SFor):
                seq = self._eval(st.it, env)
                if isinstance(seq, Col):
                    raise OslUnsupported("for over a row-dependent value")
                items = list(seq.keys()) if isinstance(seq, dict) else list(seq)
                for v in items:
                    env[st.var] = v
                    try:
                        self._exec(st.body, env, guard)
                    except _Continue:
                        continue
                    except _Break as b:
                        if b.depth > 1:
                            raise _Break(b.depth - 1)
                        break
            elif isinstance(st, SBreak):
                raise _Break(st.depth)
            elif isinstance(st, SContinue):
                raise _Continue()
            elif isinstance(st, SExit):
                raise _Exit()
            elif isinstance(st, SEachRow):
                self._exec_each_row(st, env, guard)
            elif isinstance(st, SPush):
                pass  # aggregation is the declarative compiler's job
            else:  # pragma: no cover
                raise OslUnsupported(f"statement {st!r}")

    def _assign(self, st: SAssign, val, env) -> None:
        if not st.indexes:
            env[st.name] = val
            return
        if st.name not in env:
            raise OslUnsupported(f"indexed assignment to unset {st.name!r}")
        obj = env[st.name]
        for ix in st.indexes[:-1]:
            obj = _index(obj, const_eval(ix, env))
        key = const_eval(st.indexes[-1], env)
        obj[key] = val

    # -- each_row lowering -------------------------------------------
    def _exec_each_row(self, st: SEachRow, env, guard) -> None:
        """Counters (`x = x + const`) become per-user matched-row
        counts; per-row ``debug`` collects from the matched frame;
        ``return(expr)`` records a first-match site; an ``if`` whose
        condition reads the row narrows all of those with a row-level
        guard (scan semantics: the branch runs per visited row).

        Scans with no mods and a window-free, row-mode where clause
        fold DIRECTLY into the shared per-user aggregate as
        conditional aggregates — zero extra shuffles and no join; only
        mods (limit/range/reverse) or ever/never quantifiers fall back
        to a separate matched frame + user-keyed join."""
        if guard is not None:
            raise OslUnsupported("each_row under a row-dependent if")
        cond = self._simple_scan_cond(st, env)
        matched = None if cond is not None else self._matched_frame(st, env)
        self._each_row_body(st.body, env, matched, cond, None)

    def _simple_scan_cond(self, st: SEachRow, env):
        """The scan's where clause as ONE row-level Column, or None
        when it needs the matched-frame machinery (mods, date windows,
        ever/never quantifiers — those compile to window functions,
        which cannot nest inside aggregates)."""
        from openset_spark.osl.parser import BoolOp

        from openset_spark.osl.compiler import _bool_col

        if st.mods:
            return None

        def row_only(e) -> bool:
            if isinstance(e, Pred):
                return e.mode in ("is", "is_not") and e.window is None
            if isinstance(e, BoolOp):
                return all(row_only(p) for p in e.parts)
            return False

        where = _subst_env_where(st.where, env)
        if not row_only(where):
            return None
        return _bool_col(where, self._ctx())

    def _each_row_body(self, stmts, env, matched, cond, rowguard) -> None:
        """``matched``/``cond`` are the two lowering modes: a matched
        DataFrame (mods path) or a row-level condition Column folded
        into the shared aggregate (simple path). ``rowguard`` is the
        row-level guard from enclosing ifs inside the body."""
        from pyspark.sql import functions as F

        def full_cond():
            c = cond if rowguard is None else (
                cond & rowguard if cond is not None else rowguard
            )
            return F.lit(True) if c is None else c

        frame = None
        if matched is not None:
            frame = matched if rowguard is None else matched.filter(rowguard)
        for s in stmts:
            if isinstance(s, SAssign) and not s.indexes:
                # x = x + <const> accumulation over matched rows
                e = s.expr
                step = None
                if (
                    isinstance(e, LBin)
                    and e.op == "+"
                    and isinstance(e.left, LName)
                    and e.left.name == s.name
                ):
                    step = const_eval(e.right, env)
                if step is None:
                    # x = <row expr>: each visit overwrites, so the
                    # variable ends as the LAST matched row's value —
                    # a max-of-(order, value) struct (the max_by
                    # update frame); unmatched customers keep the
                    # prior value via coalesce
                    val = self._row_expr(s.expr, env)
                    order = F.col(self.order_col)
                    sname = f"_set{len(self._count_frames) + len(self._aggs)}"
                    cand = F.struct(order.alias("o"), val.alias("v"))
                    if matched is None:
                        self._aggs[sname] = F.max(
                            F.when(full_cond(), cand)
                        ).getField("v")
                    else:
                        self._count_frames.append((
                            sname,
                            frame.groupBy(self.user_col).agg(
                                F.max(cand).getField("v").alias(sname)
                            ),
                            False,
                        ))
                    prev = env.get(s.name)
                    new = F.col(sname)
                    if prev is not None:
                        prev_col = (
                            prev.col if isinstance(prev, Col) else F.lit(prev)
                        )
                        new = F.coalesce(new, prev_col)
                    env[s.name] = Col(new)
                    if s.name in self.customer_props:
                        self._record_prop_write(s.name, env[s.name])
                    continue
                cname = f"_cnt{len(self._count_frames) + len(self._aggs)}"
                if matched is None:
                    self._aggs[cname] = F.count(F.when(full_cond(), F.lit(1)))
                else:
                    self._count_frames.append((
                        cname,
                        frame.groupBy(self.user_col).agg(
                            F.count(F.lit(1)).alias(cname)
                        ),
                        True,
                    ))
                prev = env.get(s.name, 0)
                prev_col = prev.col if isinstance(prev, Col) else F.lit(prev)
                env[s.name] = Col(prev_col + F.col(cname) * F.lit(step))
                if s.name in self.customer_props:
                    self._record_prop_write(s.name, env[s.name])
            elif isinstance(s, SDebug):
                idx = len(self._debugs)
                self._debugs.append(("rows", None, None))
                src = frame if frame is not None else self._events.filter(
                    full_cond()
                )
                self._row_debugs[idx] = (src, self._row_expr(s.expr, env))
            elif isinstance(s, SReturn):
                val = self._row_expr(s.expr, env)
                if matched is None:
                    order = F.col(self.order_col)
                    sname = f"_ret{len(self._aggs)}"
                    self._aggs[sname] = F.min(
                        F.when(
                            full_cond(),
                            F.struct(order.alias("o"), val.alias("v")),
                        )
                    )
                    self._ret_sites.append(("agg", sname))
                else:
                    self._ret_sites.append(("frame", matched, rowguard, val))
            elif isinstance(s, SIf):
                try:
                    c = const_eval(s.cond, env)
                    if c:
                        self._each_row_body(s.body, env, matched, cond, rowguard)
                    continue
                except _NotConst:
                    pass
                g = self._row_expr(s.cond, env)
                g = g if rowguard is None else rowguard & g
                self._each_row_body(s.body, env, matched, cond, g)
            elif isinstance(s, SFor):
                self._each_row_for(s, env, matched, cond, rowguard)
            elif isinstance(s, SPush):
                pass
            else:
                raise OslUnsupported(
                    f"each_row body statement in replay: {s!r}"
                )

    def _each_row_for(self, s: SFor, env, matched, cond, rowguard) -> None:
        """``for x in <container>`` inside a scan. A constant
        container unrolls; a row-dependent one must be a SET column
        (test_db.h:225 ``for ref in referral_search``) and supports
        counter bodies — ``counter += step`` per element lowers to
        sum(size(set)) * step over matched rows (nil sets contribute
        0, matching the reference's skip)."""
        from pyspark.sql import functions as F

        try:
            seq = const_eval(s.it, env)
        except _NotConst:
            seq = None
        if seq is not None:
            items = list(seq.keys()) if isinstance(seq, dict) else list(seq)
            for v in items:
                env[s.var] = v
                self._each_row_body(s.body, env, matched, cond, rowguard)
            return
        arr = self._row_expr(s.it, env)
        per_row = F.when(arr.isNotNull(), F.size(arr)).otherwise(F.lit(0))
        full = cond if rowguard is None else (
            cond & rowguard if cond is not None else rowguard
        )
        for inner in s.body:
            if isinstance(inner, SAssign) and not inner.indexes:
                e = inner.expr
                step = None
                if (
                    isinstance(e, LBin)
                    and e.op == "+"
                    and isinstance(e.left, LName)
                    and e.left.name == inner.name
                ):
                    step = const_eval(e.right, env)
                if step is None:
                    raise OslUnsupported(
                        "for-over-set body assignment must be "
                        "'x = x + <constant>'"
                    )
                cname = f"_cnt{len(self._count_frames) + len(self._aggs)}"
                counted = per_row if full is None else F.when(
                    full, per_row
                ).otherwise(F.lit(0))
                if matched is None:
                    self._aggs[cname] = F.coalesce(
                        F.sum(counted), F.lit(0)
                    )
                else:
                    frame = matched if rowguard is None else matched.filter(
                        rowguard
                    )
                    self._count_frames.append((
                        cname,
                        frame.groupBy(self.user_col).agg(
                            F.coalesce(F.sum(per_row), F.lit(0)).alias(cname)
                        ),
                        True,
                    ))
                prev = env.get(inner.name, 0)
                prev_col = prev.col if isinstance(prev, Col) else F.lit(prev)
                env[inner.name] = Col(prev_col + F.col(cname) * F.lit(step))
                if inner.name in self.customer_props:
                    self._record_prop_write(inner.name, env[inner.name])
            elif isinstance(inner, SPush):
                pass  # set-explode pushes are the compiler's job
            else:
                raise OslUnsupported(
                    f"for-over-set body statement: {inner!r}"
                )

    def _matched_frame(self, st: SEachRow, env):
        """Matched rows via the declarative compiler's scan machinery
        (anchors/mods/window preds identical to the dataframe path)."""
        from openset_spark.osl.compiler import OslQuery
        from openset_spark.osl.parser import EachRow, Script

        where = _subst_env_where(st.where, env)
        q = OslQuery(
            Script(
                selects=[],
                blocks=[EachRow(where=where, mods=st.mods)],
                sorts=[],
            ),
            column_map=self.column_map,
            user_col=self.user_col,
            ts_col=self.ts_col,
            event_col=self.event_col,
            order_col=self.order_col,
        )
        return q.matched(self._events, now_ms=self.now_ms)

    # -- expression evaluation ---------------------------------------
    def _ctx(self):
        from openset_spark.osl.compiler import _Ctx

        return _Ctx(
            self._events,
            self.user_col,
            self.ts_col,
            self.event_col,
            self.order_col,
            self.column_map,
            self.now_ms,
        )

    def _cursor(self, prop: str) -> Col:
        """The cursor row's value of a property: the reference starts
        each customer's interpreter at row 0 -> min_by per user."""
        from pyspark.sql import functions as F

        from openset_spark.functions.time import epoch_ms

        if prop == "id":
            return Col(F.col(self.user_col))
        name = f"_cur_{prop}"
        if name not in self._aggs:
            if prop in ("stamp", "event_time"):
                src = epoch_ms(F.col(self.ts_col))
            elif prop == "event":
                src = F.col(self.event_col)
            else:
                src = F.col(self.column_map.get(prop, prop))
            self._aggs[name] = F.min_by(src, F.col(self.order_col))
        return Col(F.col(name))

    def _record_prop_write(self, name: str, val) -> None:
        self._prop_writes[name] = val

    def _ensure_cursor(self) -> None:
        """Add the 0-based per-user timeline index column (OSL
        ``cursor`` semantics) once."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        if "_cursor" not in self._events.columns:
            w = Window.partitionBy(self.user_col).orderBy(
                F.col(self.ts_col), F.col(self.order_col)
            )
            self._events = self._events.withColumn(
                "_cursor", F.row_number().over(w) - 1
            )

    def _agg_assign(self, st: SAggAssign, env) -> None:
        """``name = agg(arg)[.within(span, anchor)] [where pred]`` —
        ONE conditional aggregate in the shared per-user frame. first/
        last use min/max of an (order, value) struct: the max_by
        update frame for last-value-wins customer facts."""
        from pyspark.sql import functions as F

        from openset_spark.osl.compiler import _bool_col

        ctx = self._ctx()
        cond = None
        if st.where is not None:
            cond = _bool_col(_subst_env_where(st.where, env), ctx)
        if st.window is not None:
            span = const_eval(st.window[0], env)
            anchor = self._eval(st.window[1], env)
            if isinstance(anchor, Col):
                raise OslUnsupported("row-dependent anchor in .within()")
            wcond = F.abs(F.lit(anchor) - ctx.stamp()) <= F.lit(span)
            cond = wcond if cond is None else cond & wcond
        cond = F.lit(True) if cond is None else cond
        arg = self._row_expr(st.arg, env) if st.arg is not None else F.lit(1)
        order = F.col(self.order_col)
        if st.fn == "sum":
            agg = F.sum(F.when(cond, arg))
        elif st.fn == "count":
            agg = F.count(F.when(cond, F.lit(1)))
        elif st.fn == "dcount":
            agg = F.count_distinct(F.when(cond, arg))
        elif st.fn == "row":
            # one-line row search (language_reference.md:767-775): the
            # matching row's timeline index, or nil. The cursor index
            # is a row_number window sharing the user partitioning, so
            # the whole statement still costs ONE exchange.
            self._ensure_cursor()
            pick = F.max if st.reverse else F.min
            agg = pick(F.when(cond, F.col("_cursor")))
        elif st.fn == "test":
            agg = F.max(F.when(cond, F.lit(1)).otherwise(F.lit(0))) == 1
        elif st.fn == "min":
            agg = F.min(F.when(cond, arg))
        elif st.fn == "max":
            agg = F.max(F.when(cond, arg))
        elif st.fn == "avg":
            agg = F.avg(F.when(cond, arg))
        elif st.fn == "first":
            agg = F.min(
                F.when(cond, F.struct(order.alias("o"), arg.alias("v")))
            ).getField("v")
        else:  # last
            agg = F.max(
                F.when(cond, F.struct(order.alias("o"), arg.alias("v")))
            ).getField("v")
        cname = f"_cp_{st.name}"
        self._aggs[cname] = agg
        env[st.name] = Col(F.col(cname))
        # without a catalog every aggregate assignment is a customer-
        # property write (row/test searches are reads, not writes);
        # with one, only declared is_customer names are
        if st.name in self.customer_props or (
            not self.customer_props and st.fn not in ("row", "test")
        ):
            self._record_prop_write(st.name, env[st.name])

    def _row_expr(self, e, env):
        """Expression over an INDIVIDUAL ROW (debug/return inside
        each_row, aggregate arguments, row-level if guards): names
        resolve to the row's columns directly."""
        from pyspark.sql import functions as F

        try:
            return F.lit(const_eval(e, env))
        except _NotConst:
            pass
        ctx = self._ctx()
        if isinstance(e, LName):
            if isinstance(env.get(e.name), Col):
                raise OslUnsupported(
                    f"user-frame variable {e.name!r} in a row expression"
                )
            return ctx.resolve(e.name)
        if isinstance(e, LNeg):
            return -self._row_expr(e.expr, env)
        if isinstance(e, LCall):
            args = [self._row_expr(a, env) for a in e.args]
            if e.fn == "len":
                return F.length(args[0])
            if e.fn in ("int", "float", "str"):
                t = {"int": "long", "float": "double", "str": "string"}
                return args[0].cast(t[e.fn])
            raise OslUnsupported(f"{e.fn}() in a row expression")
        if isinstance(e, LBin):
            if e.op in ("in", "any", "contains"):
                try:
                    b = const_eval(e.right, env)
                except _NotConst:
                    raise OslUnsupported(
                        f"{e.op!r} needs a constant container in a row "
                        "expression"
                    )
                a = self._row_expr(e.left, env)
                vals = list(b) if isinstance(b, (list, set, tuple)) else [b]
                if e.op in ("in", "any"):
                    return a.isin(vals)
                out = a.contains(vals[0])
                for v in vals[1:]:
                    out = out & a.contains(v)
                return out
            # nil comparisons are null checks (reference semantics)
            for side, other in ((e.right, e.left), (e.left, e.right)):
                try:
                    if const_eval(side, env) is None and e.op in ("==", "!="):
                        col = self._row_expr(other, env)
                        return col.isNull() if e.op == "==" else col.isNotNull()
                except _NotConst:
                    pass
            a = self._row_expr(e.left, env)
            b = self._row_expr(e.right, env)
            fns = {
                "+": lambda x, y: x + y,
                "-": lambda x, y: x - y,
                "*": lambda x, y: x * y,
                "/": lambda x, y: x / y,
                "==": lambda x, y: x == y,
                "!=": lambda x, y: x != y,
                "<": lambda x, y: x < y,
                ">": lambda x, y: x > y,
                "<=": lambda x, y: x <= y,
                ">=": lambda x, y: x >= y,
                "&&": lambda x, y: x & y,
                "||": lambda x, y: x | y,
            }
            if e.op not in fns:
                raise OslUnsupported(f"operator {e.op!r} in a row expression")
            return fns[e.op](a, b)
        raise OslUnsupported(f"row expression {e!r}")

    def _eval(self, e, env):
        try:
            return const_eval(e, env)
        except _NotConst:
            pass
        return self._eval_dyn(e, env)

    def _eval_dyn(self, e, env):
        from pyspark.sql import functions as F

        if isinstance(e, LName):
            if e.name in env:
                return env[e.name]
            if e.name == "now":
                return self.now_ms
            if e.name == "cursor":
                # the interpreter's row cursor sits at 0 outside scans
                # (language_reference.md:326-332)
                return 0
            if e.name == "session_count":
                # per-user session total (reference test_sessions.h:
                # `session_count == 3`); sessionize lazily on first use
                from openset_spark.operators.sessionize import with_session

                if "session" not in self._events.columns:
                    self._events = with_session(
                        self._events,
                        user_col=self.user_col,
                        ts_col=self.ts_col,
                    )
                if "_session_count" not in self._aggs:
                    self._aggs["_session_count"] = F.max(F.col("session"))
                return Col(F.col("_session_count"))
            return self._cursor(e.name)
        if isinstance(e, LMod):
            return self._ever_flag(e, env)
        if isinstance(e, LNeg):
            v = self._eval(e.expr, env)
            return Col(-v.col) if isinstance(v, Col) else -v
        if isinstance(e, LCall):
            args = [self._eval(a, env) for a in e.args]
            if e.fn == "get_row":
                # language_reference.md:729-737: the full row at a
                # timeline index, as a struct per user. Expensive by
                # design (the docs flag it): a per-user sorted
                # collect_list — only the constant-index form lowers.
                if len(args) != 1 or isinstance(args[0], Col):
                    raise OslUnsupported(
                        "get_row() needs a constant row index"
                    )
                idx = int(args[0])
                name = f"_getrow{idx}"
                if name not in self._aggs:
                    order = F.col(self.order_col)
                    row_struct = F.struct(
                        *[F.col(c) for c in self._events.columns]
                    )
                    self._aggs[name] = F.element_at(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    order.alias("o"), row_struct.alias("r")
                                )
                            )
                        ),
                        idx + 1,
                    ).getField("r")
                return Col(F.col(name))
            if not any(isinstance(a, Col) for a in args):
                return _call_const(e.fn, args)
            if e.fn == "len":
                return Col(F.length(args[0].col))
            if e.fn in ("int", "float", "str"):
                t = {"int": "long", "float": "double", "str": "string"}
                return Col(args[0].col.cast(t[e.fn]))
            # scalar built-ins over row-dependent values lower to the
            # JVM column forms (functions/osl.py, functions/time.py)
            if e.fn == "bucket" and not isinstance(args[1], Col):
                from openset_spark.functions.time import bucket as _bucket_col

                return Col(_bucket_col(args[0].col, args[1]))
            if e.fn == "round":
                from openset_spark.functions.osl import osl_round

                return Col(osl_round(args[0].col))
            if e.fn == "trunc":
                from openset_spark.functions.osl import trunc as _trunc_col

                return Col(_trunc_col(args[0].col))
            if e.fn == "fix" and not isinstance(args[1], Col):
                from openset_spark.functions.osl import fix as _fix_col

                return Col(_fix_col(args[0].col, int(args[1])))
            if e.fn == "iso8601_to_stamp":
                from openset_spark.functions.osl import iso8601_to_stamp

                return Col(iso8601_to_stamp(args[0].col))
            if e.fn == "url_decode":
                from openset_spark.functions.osl import url_decode

                return Col(url_decode(args[0].col))
            raise OslUnsupported(f"{e.fn}() over a row-dependent value")
        if isinstance(e, LIndex):
            obj = self._eval(e.obj, env)
            idx = self._eval(e.idx, env)
            if isinstance(obj, Col) and not isinstance(idx, Col):
                if isinstance(idx, str):  # struct/map field access
                    return Col(obj.col.getItem(idx))
                if isinstance(idx, int):  # OSL lists are 0-based
                    return Col(F.element_at(obj.col, idx + 1))
                return Col(F.element_at(obj.col, idx))
            return _index(obj, idx)
        if isinstance(e, LBin):
            a = self._eval(e.left, env)
            b = self._eval(e.right, env)
            return self._binop_dyn(e.op, a, b)
        raise OslUnsupported(f"expression {e!r}")

    def _ever_flag(self, e: LMod, env) -> Col:
        """prop.ever/never/is(...) in a script expression: ever/never
        aggregate over the customer's rows; is/is_not reads the cursor
        row."""
        from pyspark.sql import functions as F

        from openset_spark.osl.compiler import _pred_col

        value = const_eval(e.value, env)
        if isinstance(value, list):
            value = tuple(value)
        # mode="is" yields the bare ROW-level comparison; the
        # quantifier is applied here as a per-user aggregate
        cond = _pred_col(Pred(e.prop, e.op, value, mode="is"), self._ctx())
        if e.mode in ("is", "is_not"):
            # cursor-row evaluation: flag on the min-by row
            name = f"_is{len(self._aggs)}"
            self._aggs[name] = F.min_by(cond, F.col(self.order_col))
            col = F.col(name)
            return Col(col if e.mode == "is" else ~col)
        name = f"_ever{len(self._aggs)}"
        self._aggs[name] = (
            F.max(F.when(cond, F.lit(1)).otherwise(F.lit(0))) == 1
        )
        col = F.col(name)
        return Col(col if e.mode == "ever" else ~col)

    def _binop_dyn(self, op: str, a, b):
        from pyspark.sql import functions as F

        def c(x):
            return x.col if isinstance(x, Col) else F.lit(x)

        if op in ("&&", "||"):
            ca, cb = c(a), c(b)
            return Col(ca & cb if op == "&&" else ca | cb)
        if op in ("+", "-", "*", "/"):
            fn = {
                "+": lambda x, y: x + y,
                "-": lambda x, y: x - y,
                "*": lambda x, y: x * y,
                "/": lambda x, y: x / y,
            }[op]
            return Col(fn(c(a), c(b)))
        if op in ("==", "!=", "<", ">", "<=", ">="):
            # nil comparisons are null CHECKS (reference semantics),
            # not three-valued SQL comparisons against a null literal
            if b is None and op in ("==", "!="):
                col = c(a)
                return Col(col.isNull() if op == "==" else col.isNotNull())
            if a is None and op in ("==", "!="):
                col = c(b)
                return Col(col.isNull() if op == "==" else col.isNotNull())
            fn = {
                "==": lambda x, y: x == y,
                "!=": lambda x, y: x != y,
                "<": lambda x, y: x < y,
                ">": lambda x, y: x > y,
                "<=": lambda x, y: x <= y,
                ">=": lambda x, y: x >= y,
            }[op]
            return Col(fn(c(a), c(b)))
        if op == "in":
            # scalar in container
            if isinstance(a, Col) and not isinstance(b, Col):
                return Col(a.col.isin(list(b)))
            if not isinstance(a, Col) and isinstance(b, Col):
                return Col(F.array_contains(b.col, F.lit(a)))
            raise OslUnsupported("'in' over two row-dependent values")
        if op in ("contains", "any"):
            from openset_spark.functions import sets

            if isinstance(a, Col) and not isinstance(b, Col):
                vals = list(b) if isinstance(b, (list, set, tuple)) else [b]
                if op == "any":
                    return Col(a.col.isin(vals))
                out = a.col.contains(vals[0])
                for v in vals[1:]:
                    out = out & a.col.contains(v)
                return Col(out)
            if not isinstance(a, Col) and isinstance(b, Col):
                # const container op row value: membership of the value
                return Col(b.col.isin(list(a)))
            raise OslUnsupported(f"{op!r} over two row-dependent values")
        raise OslUnsupported(f"operator {op!r}")


def _subst_env_where(e, env):
    """Resolve script-variable references in a where tree to their
    constant values before the declarative compiler sees them."""
    if isinstance(e, Pred):
        v = e.value
        if isinstance(v, PName) and v.name in env:
            cv = env[v.name]
            if isinstance(cv, Col):
                raise OslUnsupported(
                    f"row-dependent variable {v.name!r} in where"
                )
            if isinstance(cv, (list, set)):
                cv = tuple(cv)
            return Pred(e.prop, e.op, cv, e.mode, e.window)
        return e
    from openset_spark.osl.parser import BoolOp

    if isinstance(e, BoolOp):
        return BoolOp(
            e.kind, tuple(_subst_env_where(p, env) for p in e.parts)
        )
    return e
