"""OSL tokenizer + recursive-descent parser -> small AST.

Grammar (the declarative core; docs/osl/language_reference.md):

    script    := (select | sort | each_row | ignored_line)*
    select    := 'select' NL (agg_line)* 'end'
    agg_line  := ('count'|'sum'|'min'|'max'|'avg') name ['as' name]
    sort      := 'sort' NL (name ['asc'|'desc'])* 'end'
    each_row  := 'each_row' mods 'where' expr NL body 'end'
    mods      := ('.' name '(' args? ')')*
    body      := (push | each_row | ignored_line)*
    push      := '<<' pexpr (',' pexpr)*
    expr      := andx ('||' andx)*      # also accepts 'or'
    andx      := atom ('&&' atom)*      # also accepts 'and'
    atom      := '(' expr ')' | predicate
    predicate := name modchain | name cmp value
    modchain  := ('.' name '(' margs ')')+   # is/is_not/ever/never/
                                             # within/look_ahead/
                                             # look_back/range
    cmp       := '=='|'!='|'>='|'<='|'>'|'<'
    value     := STRING | NUMBER | SPAN | name
    pexpr     := name | STRING | NUMBER | name '(' pexpr (',' pexpr)* ')'

Ignored lines: assignments (``x = ...``) and ``debug(...)`` — they
cannot change which rows match. Flow control raises OslUnsupported.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from openset_spark.functions.time import span as span_ms


class OslSyntaxError(ValueError):
    pass


class OslUnsupported(ValueError):
    """Valid OSL the Spark compile does not cover (imperative flow)."""


# ---------------------------------------------------------------- AST
@dataclass(frozen=True)
class Pred:
    prop: str
    op: str  # == != > < >= <=
    value: Any
    mode: str = "is"  # is | is_not | ever | never
    window: tuple | None = None  # ("within"|"look_ahead"|"look_back", ms, anchor) | ("range", a, b)


@dataclass(frozen=True)
class BoolOp:
    kind: str  # "and" | "or"
    parts: tuple


@dataclass(frozen=True)
class PName:
    name: str


@dataclass(frozen=True)
class PLit:
    value: Any


@dataclass(frozen=True)
class PCall:
    fn: str
    args: tuple


@dataclass(frozen=True)
class PExplode:
    """A set-column element in a push: ``for ref in referral_search``
    with ``<< ..., ref`` pushes one result row per element
    (test/test_db.h:225). ``var`` is the loop variable, used as the
    result column label."""

    prop: str
    var: str = ""


@dataclass
class EachRow:
    where: Any
    mods: dict = field(default_factory=dict)
    # list[(guard, [pexpr])] — guard is None for unconditional pushes,
    # or a where-style expression (Pred/BoolOp) from enclosing ``if``
    # blocks inside the each_row body (lowered to a row filter: the
    # CASE WHEN shape of the reference's interpreted branch)
    pushes: list = field(default_factory=list)
    children: list = field(default_factory=list)  # nested EachRow


@dataclass
class Script:
    selects: list  # [(fn, prop, alias, with_prop, all_flag)]
    blocks: list  # top-level EachRow
    sorts: list  # [(name, "asc"|"desc")]
    # top-level variables whose values are compile-time constants
    # (straight-line assignment of literals/containers/arithmetic) —
    # resolvable by name in where clauses and pushes
    consts: dict = field(default_factory=dict)


@dataclass(frozen=True)
class PBin:
    """Arithmetic node in a scalar expression (histogram scripts)."""

    op: str  # + - * /
    left: Any
    right: Any


@dataclass(frozen=True)
class PAggWhere:
    """Row-search aggregate in a scalar expression
    (``sum(total) where event.is(== "purchase")`` — the batch docs'
    histogram bodies, docs/rest/README.md:404-414)."""

    fn: str  # sum|count|min|max|avg|dcount
    prop: str
    where: Any | None  # Pred | BoolOp | None


@dataclass(frozen=True)
class SegmentDef:
    """One ``@segment name param=value ...`` section of a /counts
    script (docs/rest/README.md:258-290): policy params + the
    membership expression from its ``if <expr> return(true) end``
    body."""

    name: str
    params: dict  # ttl_s/refresh_s/use_cached/on_insert/z_index
    where: Any  # Pred | BoolOp


# ---------------------------------------------------------- tokenizer
_TOKEN_RE = re.compile(
    r"""
    (?P<SPAN>\d+_[a-zA-Z]+)
  | (?P<NUM>\d+\.\d+|\d+)
  | (?P<STR>"[^"]*"|'[^']*')
  | (?P<OP><<|==|!=|>=|<=|&&|\|\||[()\[\]{}:,.<>=+\-*/])
  | (?P<NAME>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<WS>[ \t]+)
    """,
    re.VERBOSE,
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise OslSyntaxError(f"cannot tokenize at: {s[i:i + 20]!r}")
        kind = m.lastgroup
        if kind != "WS":
            out.append((kind, m.group()))
        i = m.end()
    return out


def _literal(kind: str, text: str) -> Any:
    if kind == "STR":
        return text[1:-1]
    if kind == "NUM":
        return float(text) if "." in text else int(text)
    if kind == "SPAN":
        n, unit = text.split("_", 1)
        return span_ms(int(n), unit.lower())
    if kind == "NAME":
        if text == "nil":  # the reference's null literal
            return None
        if text in ("true", "false"):
            return text == "true"
        return PName(text)
    raise OslSyntaxError(f"expected literal, got {text!r}")


class _Tokens:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise OslSyntaxError("unexpected end of expression")
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, text: str) -> bool:
        t = self.peek()
        if t and t[1] == text:
            self.i += 1
            return True
        return False

    def expect(self, text: str) -> None:
        t = self.next()
        if t[1] != text:
            raise OslSyntaxError(f"expected {text!r}, got {t[1]!r}")


_CMPS = {"==", "!=", ">", "<", ">=", "<="}
# word comparators (docs/osl/language_reference.md:139-260): scalar
# membership and set-property matchers
_WORD_CMPS = {"contains", "any", "in"}
_PRED_MODES = {"is", "is_not", "ever", "never"}
_PRED_WINDOWS = {"within", "look_ahead", "look_back", "range"}


def _parse_value(tk: "_Tokens"):
    """Literal, name, or ``[list, of, literals]`` — with unary minus
    on numeric literals (``value > -5``)."""

    def one():
        k, t = tk.next()
        if t == "-":  # unary minus
            k, t = tk.next()
            v = _literal(k, t)
            if not isinstance(v, (int, float)):
                raise OslSyntaxError(f"unary minus before {t!r}")
            return -v
        return _literal(k, t)

    if tk.accept("["):
        vals = []
        while not tk.accept("]"):
            vals.append(one())
            tk.accept(",")
        return tuple(v.name if isinstance(v, PName) else v for v in vals)
    return one()


def _parse_cmp_value(tk: "_Tokens", owner: str):
    """comparator + value, where the comparator is a symbol (==, >=,
    ...) or a word (contains / any / in)."""
    ckind, ctext = tk.next()
    if ctext in _CMPS or ctext in _WORD_CMPS:
        return ctext, _parse_value(tk)
    raise OslSyntaxError(f"{owner} needs a comparator, got {ctext!r}")


# ------------------------------------------------- where-expr parsing
def _parse_expr(tk: _Tokens):
    left = _parse_and(tk)
    parts = [left]
    while True:
        t = tk.peek()
        if t and t[1] in ("||", "or"):
            tk.next()
            parts.append(_parse_and(tk))
        else:
            break
    return parts[0] if len(parts) == 1 else BoolOp("or", tuple(parts))


def _parse_and(tk: _Tokens):
    parts = [_parse_atom(tk)]
    while True:
        t = tk.peek()
        if t and t[1] in ("&&", "and"):
            tk.next()
            parts.append(_parse_atom(tk))
        else:
            break
    return parts[0] if len(parts) == 1 else BoolOp("and", tuple(parts))


def _parse_atom(tk: _Tokens):
    if tk.accept("("):
        inner = _parse_expr(tk)
        tk.expect(")")
        return inner
    kind, name = tk.next()
    if kind != "NAME":
        raise OslSyntaxError(f"expected property name, got {name!r}")
    # modifier chain: prop.within(...).never(== x) / prop.is(== x)
    mode, op, value, window = None, None, None, None
    while tk.peek() and tk.peek()[1] == ".":
        tk.next()
        mkind, mname = tk.next()
        if mkind != "NAME":
            raise OslSyntaxError(f"expected modifier after '.', got {mname!r}")
        tk.expect("(")
        if mname in _PRED_MODES:
            op, value = _parse_cmp_value(tk, f".{mname}()")
            mode = mname
        elif mname in _PRED_WINDOWS:
            a_kind, a_text = tk.next()
            a = _literal(a_kind, a_text)
            tk.expect(",")
            b_kind, b_text = tk.next()
            b = _literal(b_kind, b_text)
            window = (mname, a, b)
        else:
            raise OslUnsupported(f"predicate modifier .{mname}()")
        tk.expect(")")
    if mode is None:
        # bare comparison: event == "purchase" / fruit in [...] —
        # row-level 'is'
        op, value = _parse_cmp_value(tk, f"property {name!r}")
        mode = "is"
    return Pred(name, op, value, mode, window)


# ------------------------------------------------------ pivot parsing
def _parse_pexpr(tk: _Tokens):
    kind, text = tk.next()
    if kind in ("STR", "NUM", "SPAN"):
        return PLit(_literal(kind, text))
    if kind != "NAME":
        raise OslSyntaxError(f"bad pivot expression at {text!r}")
    if tk.peek() and tk.peek()[1] == "(":
        tk.next()
        args = [_parse_pexpr(tk)]
        while tk.accept(","):
            args.append(_parse_pexpr(tk))
        tk.expect(")")
        return PCall(text, tuple(args))
    return PName(text)


def _parse_push(line: str) -> list:
    tk = _Tokens(_tokenize(line))
    tk.expect("<<")
    exprs = [_parse_pexpr(tk)]
    while tk.accept(","):
        exprs.append(_parse_pexpr(tk))
    if tk.peek():
        raise OslSyntaxError(f"trailing tokens in push: {line!r}")
    return exprs


# ----------------------------------------------------- line structure
_ASSIGN_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\[[^\]]*\])?\s*=[^=]")
_IGNORED_CALL_RE = re.compile(r"^debug\s*\(")
_FLOW_RE = re.compile(r"^(if|for|break|continue|return|exit|match)\b")
_BLOCK_OPEN_RE = re.compile(r"^(if|for)\b")
_LOOP_CTL_RE = re.compile(r"^(break|continue)\b")
_IF_HDR_RE = re.compile(r"^if[\s(]")
_FOR_HDR_RE = re.compile(r"^for\b")
_FOR_LIT_RE = re.compile(r"^for\s+([A-Za-z_]\w*)\s+in\s+(\[.*\])\s*$")
_FOR_PROP_RE = re.compile(r"^for\s+([A-Za-z_]\w*)\s+in\s+([A-Za-z_]\w*)\s*$")


def _block_has_push(lines: list[str], idx: int) -> bool:
    """Does the if/for block opening at ``lines[idx]`` contain a
    ``<<`` push (transitively)? Push-bearing blocks are SEMANTIC —
    parsed with their condition as a push guard / unrolled — while
    variable-only blocks stay skippable."""
    depth = 0
    for j in range(idx, len(lines)):
        line = lines[j]
        if _BLOCK_OPEN_RE.match(line):
            depth += 1
        elif line == "end":
            depth -= 1
            if depth == 0:
                return False
        elif line.startswith("<<"):
            return True
    return False


def _subst_pexpr(e, var: str, v):
    """Replace the loop variable in a push expression — with an
    unrolled literal, or with another push node (PExplode)."""
    if isinstance(e, PName) and e.name == var:
        return v if isinstance(v, PExplode) else PLit(v)
    if isinstance(e, PCall):
        return PCall(e.fn, tuple(_subst_pexpr(a, var, v) for a in e.args))
    return e


def _subst_where(e, var: str, v):
    """Replace the loop variable in a guard expression's value slots."""
    if isinstance(e, Pred):
        if isinstance(e.value, PName) and e.value.name == var:
            return Pred(e.prop, e.op, v, e.mode, e.window)
        return e
    if isinstance(e, BoolOp):
        return BoolOp(e.kind, tuple(_subst_where(p, var, v) for p in e.parts))
    return e


def _skip_noop_block(lines: list[str], idx: int) -> int:
    """``lines[idx]`` opens an ``if``/``for`` block. If everything in
    it (transitively) is imperative state the compile ignores anyway —
    assignments, ``debug()``, ``break``/``continue``, ``else``, nested
    if/for of the same — the block cannot change which rows match, so
    it is skipped verbatim (the reference's own variable-logic test
    scripts replay this way). A ``<<`` push, ``each_row``, ``return``
    or ``exit`` inside makes it semantic: raise OslUnsupported."""
    depth = 0
    j = idx
    while j < len(lines):
        line = lines[j]
        if _BLOCK_OPEN_RE.match(line):
            depth += 1
        elif line == "end":
            depth -= 1
            if depth == 0:
                return j + 1
        elif (
            _ASSIGN_RE.match(line)
            or _IGNORED_CALL_RE.match(line)
            or _LOOP_CTL_RE.match(line)
            or line == "else"
            or line.startswith("elif ")
        ):
            pass
        else:
            raise OslUnsupported(
                f"flow control with side effects on the matched rows: "
                f"{line!r}"
            )
        j += 1
    raise OslSyntaxError(f"{lines[idx].split()[0]!r} block missing 'end'")
_EACH_ROW_RE = re.compile(r"^each_row((?:\.\w+\([^)]*\))*)\s+where\s+(.+)$")
_EACH_ROW_NOWHERE_RE = re.compile(r"^each_row((?:\.\w+\([^)]*\))*)\s*$")
_MOD_RE = re.compile(r"\.(\w+)\(([^)]*)\)")


def _parse_mods(modstr: str) -> dict:
    mods: dict = {}
    for name, args in _MOD_RE.findall(modstr):
        args = args.strip()
        if name == "limit":
            mods["limit"] = int(args)
        elif name == "from":
            mods["from"] = int(args)
        elif name in ("reverse", "forward", "continue", "next"):
            mods[name] = True
        elif name in ("range", "within", "look_ahead", "look_back"):
            tk = _Tokens(_tokenize(args))
            a_kind, a_text = tk.next()
            a = _literal(a_kind, a_text)
            tk.expect(",")
            b_kind, b_text = tk.next()
            b = _literal(b_kind, b_text)
            mods[name] = (a, b)
        else:
            raise OslUnsupported(f"each_row modifier .{name}()")
    return mods


def _logical_lines(script: str) -> list[str]:
    """Strip comments/blank lines; join multi-line dict/list literals
    minimally (we only need them to skip assignments cleanly), and
    join explicit continuations — a line ending in ``where``, ``&&``,
    ``||`` or ``,`` cannot be complete (the reference's one-line
    search examples wrap after ``where``)."""
    out = []
    depth = 0
    buf = ""
    for raw in script.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        buf = f"{buf} {line}".strip() if buf else line
        depth += line.count("[") + line.count("{") + line.count("(")
        depth -= line.count("]") + line.count("}") + line.count(")")
        if depth <= 0 and not buf.endswith(("where", "&&", "||", ",")):
            out.append(buf)
            buf = ""
            depth = 0
    if buf:
        out.append(buf)
    return out


def parse_osl(script: str) -> Script:
    lines = _logical_lines(script)
    selects: list = []
    sorts: list = []
    blocks: list = []
    consts: dict = {}
    i = 0

    def parse_block(header: str, idx: int) -> tuple[EachRow, int]:
        m = _EACH_ROW_RE.match(header)
        if m:
            mods, where_src = _parse_mods(m.group(1)), m.group(2)
            tk = _Tokens(_tokenize(where_src))
            where = _parse_expr(tk)
            if tk.peek():
                raise OslSyntaxError(f"trailing tokens in where: {where_src!r}")
        else:
            m2 = _EACH_ROW_NOWHERE_RE.match(header)
            if not m2:
                raise OslSyntaxError(f"bad each_row header: {header!r}")
            raise OslSyntaxError("each_row requires a where condition")
        blk = EachRow(where=where, mods=mods)

        def parse_body(idx: int, guard) -> int:
            """Body statements until the matching ``end``. ``guard`` is
            the AND of enclosing if-conditions: a ``<<`` push under an
            ``if`` keeps the condition and compiles to a row filter
            (the reference's interpreted branch, lowered to CASE WHEN
            shape instead of flow control)."""
            while idx < len(lines):
                line = lines[idx]
                if line == "end":
                    return idx + 1
                if line.startswith("<<"):
                    blk.pushes.append((guard, _parse_push(line)))
                    idx += 1
                elif line.startswith("each_row"):
                    if guard is not None:
                        raise OslUnsupported("each_row nested under if")
                    child, idx = parse_block(line, idx + 1)
                    blk.children.append(child)
                elif _IF_HDR_RE.match(line) and _block_has_push(lines, idx):
                    tk = _Tokens(_tokenize(line[2:].strip()))
                    cond = _parse_expr(tk)
                    if tk.peek():
                        raise OslSyntaxError(f"trailing tokens in if: {line!r}")
                    g = cond if guard is None else BoolOp("and", (guard, cond))
                    idx = parse_body(idx + 1, g)
                elif _FOR_HDR_RE.match(line) and _block_has_push(lines, idx):
                    if m := _FOR_LIT_RE.match(line):
                        var = m.group(1)
                        values = _parse_value(_Tokens(_tokenize(m.group(2))))
                        start = len(blk.pushes)
                        idx = parse_body(idx + 1, guard)
                        # unroll: one copy of the body's pushes per literal
                        templ = blk.pushes[start:]
                        del blk.pushes[start:]
                        for v in values:
                            for g, pexprs in templ:
                                blk.pushes.append((
                                    None
                                    if g is None
                                    else _subst_where(g, var, v),
                                    [_subst_pexpr(e, var, v) for e in pexprs],
                                ))
                    elif m := _FOR_PROP_RE.match(line):
                        # for over a SET column: the loop variable in a
                        # push becomes an element explode — one result
                        # row per element per matched row
                        # (test/test_db.h:225)
                        var, prop = m.group(1), m.group(2)
                        start = len(blk.pushes)
                        idx = parse_body(idx + 1, guard)
                        templ = blk.pushes[start:]
                        del blk.pushes[start:]
                        for g, pexprs in templ:
                            blk.pushes.append((
                                g,
                                [
                                    _subst_pexpr(e, var, PExplode(prop, var))
                                    for e in pexprs
                                ],
                            ))
                    else:
                        raise OslUnsupported(
                            f"for-with-push needs a literal list or a "
                            f"set property: {line!r}"
                        )
                elif _ASSIGN_RE.match(line) or _IGNORED_CALL_RE.match(line):
                    idx += 1  # imperative no-op for the matched row set
                elif _BLOCK_OPEN_RE.match(line):
                    idx = _skip_noop_block(lines, idx)
                elif _FLOW_RE.match(line):
                    raise OslUnsupported(
                        f"flow control in each_row body: {line!r}"
                    )
                else:
                    raise OslSyntaxError(f"unrecognized statement: {line!r}")
            raise OslSyntaxError("each_row block missing 'end'")

        return blk, parse_body(idx, None)

    while i < len(lines):
        line = lines[i]
        if line.startswith("@segment"):
            raise OslUnsupported(
                "@segment sections are a /counts script — use "
                "parse_segments()/compile_osl_segments()"
            )
        if line == "select":
            i += 1
            while i < len(lines) and lines[i] != "end":
                tk = _Tokens(_tokenize(lines[i]))
                fkind, fn = tk.next()
                if fn not in ("count", "sum", "min", "max", "avg", "dcount"):
                    raise OslSyntaxError(f"bad aggregator: {lines[i]!r}")
                pkind, prop = tk.next()
                alias = None
                with_prop = None
                all_flag = False
                while tk.peek():
                    _k, opt = tk.next()
                    if opt == "as":
                        _, alias = tk.next()
                    elif opt == "with":
                        # alternate distinct key (language_reference.md:25-29;
                        # src/queryinterpreter.cpp:229 distinctColumn)
                        _, with_prop = tk.next()
                    elif opt == "all":
                        # nonDistinct: count every scan visit, no
                        # row-dedup (queryinterpreter.cpp:219)
                        all_flag = True
                    else:
                        raise OslUnsupported(
                            f"aggregator option {opt!r}: {lines[i]!r}"
                        )
                selects.append((fn, prop, alias, with_prop, all_flag))
                i += 1
            if i == len(lines):
                raise OslSyntaxError("select block missing 'end'")
            i += 1
        elif line == "sort":
            i += 1
            while i < len(lines) and lines[i] != "end":
                parts = lines[i].split()
                sorts.append((parts[0], parts[1] if len(parts) > 1 else "desc"))
                i += 1
            if i == len(lines):
                raise OslSyntaxError("sort block missing 'end'")
            i += 1
        elif line.startswith("each_row"):
            blk, i = parse_block(line, i + 1)
            blocks.append(blk)
        elif _ASSIGN_RE.match(line):
            # straight-line constant assignments become named values
            # usable in where clauses and pushes; anything else
            # (row-dependent, reassigned in flow) stays a no-op for
            # the row set as before
            _try_const_assign(line, consts)
            i += 1
        elif _IGNORED_CALL_RE.match(line):
            i += 1
        elif _BLOCK_OPEN_RE.match(line):
            i = _skip_noop_block(lines, i)
        elif _FLOW_RE.match(line):
            raise OslUnsupported(f"top-level flow control: {line!r}")
        else:
            raise OslSyntaxError(f"unrecognized statement: {line!r}")

    return Script(selects=selects, blocks=blocks, sorts=sorts, consts=consts)


def _try_const_assign(line: str, consts: dict) -> None:
    from openset_spark.osl import lang

    try:
        name, value = lang.const_assign(line, consts)
    except Exception:
        return
    if name is not None:
        consts[name] = value


# ------------------------------------------------- @segment sections
_SEG_PARAM_KEYS = {
    "ttl": "ttl_s",
    "refresh": "refresh_s",
    "use_cached": "use_cached",
    "on_insert": "on_insert",
    "z_index": "z_index",
}


def _seg_param_value(key: str, text: str):
    low = text.lower()
    if low in ("true", "false"):
        return low == "true"
    if re.fullmatch(r"\d+_[a-zA-Z]+", text):  # 5_minutes -> seconds
        n, unit = text.split("_", 1)
        return span_ms(int(n), unit.lower()) / 1000.0
    if re.fullmatch(r"\d+(\.\d+)?", text):
        return int(text) if key == "z_index" else float(text)
    raise OslSyntaxError(f"bad @segment param value {key}={text!r}")


def parse_segments(script: str) -> list[SegmentDef]:
    """Parse a /counts-endpoint script: one or more ``@segment``
    sections, each ``@segment name [param=value ...]`` followed by an
    ``if <expr>`` / ``return(true)`` / ``end`` body (the documented
    shape, docs/rest/README.md:275-290)."""
    lines = _logical_lines(script)
    defs: list[SegmentDef] = []
    name: str | None = None
    params: dict = {}
    where = None
    i = 0

    def flush():
        nonlocal name, params, where
        if name is not None:
            if where is None:
                raise OslSyntaxError(f"@segment {name} has no if-body")
            defs.append(SegmentDef(name, params, where))
        name, params, where = None, {}, None

    while i < len(lines):
        line = lines[i]
        if line.startswith("@segment"):
            flush()
            parts = line.split()
            if len(parts) < 2:
                raise OslSyntaxError(f"@segment needs a name: {line!r}")
            name = parts[1]
            for p in parts[2:]:
                if "=" not in p:
                    raise OslSyntaxError(f"bad @segment param {p!r}")
                k, v = p.split("=", 1)
                if k not in _SEG_PARAM_KEYS:
                    raise OslUnsupported(f"@segment param {k}=")
                params[_SEG_PARAM_KEYS[k]] = _seg_param_value(k, v)
            i += 1
        elif line.startswith("if ") or line.startswith("if("):
            if name is None:
                raise OslSyntaxError("if-body before any @segment header")
            if where is not None:
                raise OslUnsupported("multiple if-blocks in one @segment")
            tk = _Tokens(_tokenize(line[2:].strip()))
            where = _parse_expr(tk)
            if tk.peek():
                raise OslSyntaxError(f"trailing tokens in if: {line!r}")
            i += 1
            # body: return(true) [return(false)] ... end
            while i < len(lines) and lines[i] != "end":
                if not re.fullmatch(
                    r"return\s*\(\s*(true|false)\s*\)", lines[i]
                ):
                    raise OslUnsupported(
                        f"@segment body statement: {lines[i]!r}"
                    )
                i += 1
            if i == len(lines):
                raise OslSyntaxError("@segment if-block missing 'end'")
            i += 1
        elif _ASSIGN_RE.match(line) or _IGNORED_CALL_RE.match(line):
            i += 1
        elif re.fullmatch(r"return\s*\(\s*(true|false)\s*\)", line):
            i += 1  # trailing default return
        else:
            raise OslSyntaxError(f"unrecognized @segment statement: {line!r}")
    flush()
    if not defs:
        raise OslSyntaxError("no @segment sections found")
    return defs


# --------------------------------------------- histogram return(expr)
_SCALAR_AGG_FNS = {"sum", "count", "min", "max", "avg", "dcount"}


def _parse_scalar_expr(tk: _Tokens):
    """Arithmetic over literals, names, spans, and calls:
    term (('+'|'-') term)*, term := factor (('*'|'/') factor)*."""
    left = _parse_scalar_term(tk)
    while tk.peek() and tk.peek()[1] in ("+", "-"):
        op = tk.next()[1]
        left = PBin(op, left, _parse_scalar_term(tk))
    return left


def _parse_scalar_term(tk: _Tokens):
    left = _parse_scalar_factor(tk)
    while tk.peek() and tk.peek()[1] in ("*", "/"):
        op = tk.next()[1]
        left = PBin(op, left, _parse_scalar_factor(tk))
    return left


def _parse_scalar_factor(tk: _Tokens):
    if tk.accept("-"):  # unary minus
        return PBin("-", PLit(0), _parse_scalar_factor(tk))
    if tk.accept("("):
        inner = _parse_scalar_expr(tk)
        tk.expect(")")
        return inner
    kind, text = tk.next()
    if kind in ("NUM", "SPAN", "STR"):
        return PLit(_literal(kind, text))
    if kind != "NAME":
        raise OslSyntaxError(f"bad scalar expression at {text!r}")
    if tk.peek() and tk.peek()[1] == "(":
        tk.next()
        args = [_parse_scalar_expr(tk)]
        while tk.accept(","):
            args.append(_parse_scalar_expr(tk))
        tk.expect(")")
        # row-search aggregate: sum(total) where <expr>
        if text in _SCALAR_AGG_FNS:
            if len(args) != 1 or not isinstance(args[0], PName):
                raise OslSyntaxError(
                    f"{text}() aggregate needs one property name"
                )
            where = None
            if tk.accept("where"):
                where = _parse_expr(tk)
            return PAggWhere(text, args[0].name, where)
        return PCall(text, tuple(args))
    return PName(text)


_RETURN_RE = re.compile(r"^return\s*\((.*)\)\s*$")


def parse_histogram(script: str):
    """Parse a histogram-endpoint script (docs/rest/README.md:349-357):
    no ``select``, one ``return(expr)`` giving the per-customer scalar
    (e.g. ``return( to_weeks(now - last_stamp) )``)."""
    lines = _logical_lines(script)
    expr = None
    for line in lines:
        m = _RETURN_RE.match(line)
        if m:
            if expr is not None:
                raise OslUnsupported("multiple return() in histogram script")
            tk = _Tokens(_tokenize(m.group(1)))
            expr = _parse_scalar_expr(tk)
            if tk.peek():
                raise OslSyntaxError(f"trailing tokens in return: {line!r}")
        elif _ASSIGN_RE.match(line) or _IGNORED_CALL_RE.match(line):
            continue
        else:
            raise OslUnsupported(f"histogram script statement: {line!r}")
    if expr is None:
        raise OslSyntaxError("histogram script needs a return(expr)")
    return expr


# ------------------------------------------------ batch documents
@dataclass(frozen=True)
class HistogramDef:
    """``@histogram name [bucket= min= max= foreach=]`` + its
    ``return(expr)`` body."""

    name: str
    params: dict  # bucket/min_value/max_value/foreach
    expr: Any


@dataclass(frozen=True)
class BatchDoc:
    """A parsed /batch POST body (docs/rest/README.md:379-418)."""

    segments: tuple  # SegmentDef, ...
    use: tuple  # segment names applied to the property counts
    properties: tuple  # (name, {"bucket": float?}), ...
    histograms: tuple  # HistogramDef, ...


def parse_batch(script: str) -> BatchDoc:
    """Parse the batch endpoint's combined OSL document: ``@segment``
    sections, one ``@use``, ``@property`` lines, ``@histogram``
    sections with ``return(expr)`` bodies."""
    lines = _logical_lines(script)
    seg_lines: list[str] = []
    use: list[str] = []
    properties: list[tuple] = []
    histograms: list[HistogramDef] = []
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        if line.startswith("@segment"):
            seg_lines.append(line)
            i += 1
            while i < n and not lines[i].startswith("@"):
                seg_lines.append(lines[i])
                i += 1
        elif line.startswith("@use"):
            use.extend(line.split()[1:])
            i += 1
        elif line.startswith("@property"):
            parts = line.split()
            if len(parts) < 2:
                raise OslSyntaxError(f"@property needs a name: {line!r}")
            params: dict = {}
            for p in parts[2:]:
                k, _, v = p.partition("=")
                if k != "bucket" or not v:
                    raise OslUnsupported(f"@property param {p!r}")
                params["bucket"] = float(v)
            properties.append((parts[1], params))
            i += 1
        elif line.startswith("@histogram"):
            parts = line.split()
            if len(parts) < 2:
                raise OslSyntaxError(f"@histogram needs a name: {line!r}")
            params = {}
            for p in parts[2:]:
                k, _, v = p.partition("=")
                if k in ("bucket", "min", "max") and v:
                    key = {"min": "min_value", "max": "max_value"}.get(k, k)
                    params[key] = float(v)
                elif k == "foreach" and v:
                    params["foreach"] = v
                else:
                    raise OslUnsupported(f"@histogram param {p!r}")
            i += 1
            expr = None
            while i < n and not lines[i].startswith("@"):
                m = _RETURN_RE.match(lines[i])
                if m:
                    if expr is not None:
                        raise OslUnsupported(
                            f"multiple return() in @histogram {parts[1]}"
                        )
                    tk = _Tokens(_tokenize(m.group(1)))
                    expr = _parse_scalar_expr(tk)
                    if tk.peek():
                        raise OslSyntaxError(
                            f"trailing tokens in return: {lines[i]!r}"
                        )
                elif _ASSIGN_RE.match(lines[i]) or _IGNORED_CALL_RE.match(
                    lines[i]
                ):
                    pass
                else:
                    raise OslSyntaxError(
                        f"unrecognized @histogram statement: {lines[i]!r}"
                    )
                i += 1
            if expr is None:
                raise OslSyntaxError(f"@histogram {parts[1]} needs return()")
            histograms.append(HistogramDef(parts[1], params, expr))
        else:
            raise OslSyntaxError(f"unrecognized batch statement: {line!r}")
    segments = (
        tuple(parse_segments("\n".join(seg_lines))) if seg_lines else ()
    )
    return BatchDoc(segments, tuple(use), tuple(properties), tuple(histograms))
