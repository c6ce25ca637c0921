"""Bloblang-subset -> Catalyst Column compiler.

The reference interprets Bloblang per message with a tree-walk executor
(parser /root/reference/internal/bloblang/parser/mapping_parser.go,
executor internal/bloblang/mapping/executor.go:89-260, arithmetic
internal/bloblang/query/arithmetic.go:19-53). We compile the same surface
to Column expressions instead — Catalyst whole-stage-codegen executes them,
so there is no interpreter in the data path at all.

Supported subset (grows as configs need it):
- statements  `root.x = <expr>`, `root = deleted()` / conditional delete
  (filter), `meta k = <expr>`
- literals    ints, floats, strings ("…"), true/false/null, arrays
- refs        this.field / this.a.b (nested), bare `this` is invalid here
              (fixed schema), meta("k")
- operators   + - * / % == != > >= < <= && || ! and `|` (pipe = coalesce,
              arithmetic.go:19-53)
- if/else     `if cond { a } else { b }` expression form
- functions   now(), uuid_v4(), timestamp_unix(), hostname() -> literal
- methods     (reference files methods_strings.go / methods_numbers.go /
  methods_structured.go / methods.go): uppercase lowercase capitalize trim
  length slice split join contains has_prefix has_suffix replace_all
  re_replace_all re_match index_of reverse string number bool floor ceil
  round abs sqrt log log10 min max sum unique sort flatten first last
  catch or not_null type hash encode ts_unix ts_format
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<op>\|\||&&|==|!=|>=|<=|=>|->|[-+*/%<>=!|.,(){}\[\]:])
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str
    text: str
    pos: int


def _tokenize(src: str) -> list[Tok]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise BloblangError(f"unexpected character {src[pos]!r} at {pos}")
        kind = m.lastgroup or ""
        if kind not in ("ws", "comment"):
            out.append(Tok(kind, m.group(), pos))
        pos = m.end()
    out.append(Tok("eof", "", pos))
    return out


class BloblangError(ValueError):
    pass


# ---------------------------------------------------------------------------
# parser (Pratt) producing Column expressions directly
# ---------------------------------------------------------------------------

_BINARY_PREC = {
    "||": 1,
    "&&": 2,
    "==": 3,
    "!=": 3,
    ">": 4,
    ">=": 4,
    "<": 4,
    "<=": 4,
    "|": 5,  # pipe = coalesce (arithmetic.go:455)
    "+": 6,
    "-": 6,
    "*": 7,
    "/": 7,
    "%": 7,
}


class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0
        self.bindings: dict[str, Column] = {}

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise BloblangError(f"expected {text!r}, got {t.text!r} at {t.pos}")
        return t

    # expression entry
    def parse_expr(self, min_prec: int = 0) -> Column:
        left = self.parse_unary()
        while True:
            t = self.peek()
            prec = _BINARY_PREC.get(t.text)
            if t.kind != "op" or prec is None or prec < min_prec:
                return left
            self.next()
            right = self.parse_expr(prec + 1)
            left = self.apply_binary(t.text, left, right)

    def apply_binary(self, op: str, a: Column, b: Column) -> Column:
        if op == "||":
            return a | b
        if op == "&&":
            return a & b
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        if op == ">":
            return a > b
        if op == ">=":
            return a >= b
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == "|":
            return F.coalesce(a, b)
        if op == "+":
            # Bloblang + concatenates strings (arithmetic.go Add). Column
            # types are unknown at compile time, but a string LITERAL on
            # either side is a reliable signal; col+col strings still need
            # format()/concat methods (documented).
            def _stringy(c: Column) -> bool:
                return isinstance(c.__dict__.get("_bl_lit"), str) or c.__dict__.get(
                    "_bl_is_str", False
                )

            if _stringy(a) or _stringy(b):
                # NULL operands render as 'null' (the compile_interpolated
                # precedent) — a bare concat would NULL the whole result and
                # silently blank the field
                null = F.lit("null")
                out = F.concat(
                    F.coalesce(a.cast("string"), null), F.coalesce(b.cast("string"), null)
                )
                # string-ness propagates so `"a" + x + y.string() + "b"`
                # stays a concatenation at every step of the left-assoc fold
                out.__dict__["_bl_is_str"] = True
                return out
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        if op == "%":
            return a % b
        raise BloblangError(f"unknown operator {op}")

    def parse_unary(self) -> Column:
        t = self.peek()
        if t.text == "!":
            self.next()
            return ~self.parse_unary()
        if t.text == "-":
            self.next()
            return -self.parse_unary()
        return self.parse_postfix()

    def parse_postfix(self) -> Column:
        col = self.parse_primary()
        while True:
            t = self.peek()
            if t.text == ".":
                self.next()
                name = self.next().text
                args: list = []
                if self.peek().text == "(":
                    self.next()
                    while self.peek().text != ")":
                        args.append(self.parse_arg())
                        if self.peek().text == ",":
                            self.next()
                    self.expect(")")
                    col = _apply_method(name, col, args)
                else:
                    col = col.getField(name) if isinstance(col, Column) else col[name]
            elif t.text == "[":
                self.next()
                idx = self.parse_expr()
                self.expect("]")
                # try_element_at: out-of-bounds indexing NULLs the row
                # instead of aborting the job under ANSI mode
                col = F.try_element_at(col, idx + 1)
            else:
                return col

    def parse_arg(self):
        """A method argument: either an expression or a lambda
        `x -> expr` / `(a, b) -> expr` (Bloblang lambdas, e.g.
        `filter(loc -> loc.v > 0)` — query/expression.go). Lambdas compile
        to Python callables over Columns, feeding Spark higher-order
        functions (F.filter/transform/aggregate/...)."""
        # lookahead: NAME ->   |   ( NAME [, NAME] ) ->
        if self.peek().kind == "name" and self.toks[self.i + 1].text == "->":
            params = [self.next().text]
            self.next()  # ->
            return self._make_lambda(params)
        if self.peek().text == "(":
            j = self.i + 1
            params = []
            while self.toks[j].kind == "name":
                params.append(self.toks[j].text)
                j += 1
                if self.toks[j].text == ",":
                    j += 1
                    continue
                break
            if params and self.toks[j].text == ")" and self.toks[j + 1].text == "->":
                self.i = j + 2
                return self._make_lambda(params)
        return self.parse_expr()

    def _make_lambda(self, params: list[str]):
        start = self.i
        # advance past the body once (with dummy bindings) so the outer
        # parse continues correctly; the closure re-parses with real args
        saved = dict(self.bindings)
        self.bindings.update({p: F.lit(None) for p in params})
        self.parse_expr()
        end = self.i
        self.bindings = saved

        def body(cols: tuple[Column, ...]) -> Column:
            sub = _Parser.__new__(_Parser)
            sub.toks = self.toks
            sub.i = start
            sub.bindings = {**saved, **dict(zip(params, cols))}
            out = sub.parse_expr()
            if sub.i != end:
                raise BloblangError("lambda body re-parse mismatch")
            return out

        # Spark's _create_lambda inspects the signature: it must be plain
        # positional args, so build a fixed-arity wrapper.
        if len(params) == 1:
            fn = lambda a: body((a,))  # noqa: E731
        elif len(params) == 2:
            fn = lambda a, b: body((a, b))  # noqa: E731
        elif len(params) == 3:
            fn = lambda a, b, c: body((a, b, c))  # noqa: E731
        else:
            raise BloblangError(f"lambdas support 1-3 parameters, got {len(params)}")
        fn._bl_lambda = True  # type: ignore[attr-defined]
        return fn

    def parse_primary(self) -> Column:
        t = self.next()
        if t.kind == "int":
            col = F.lit(int(t.text))
            col.__dict__["_bl_lit"] = int(t.text)
            return col
        if t.kind == "float":
            return F.lit(float(t.text))
        if t.kind == "string":
            s = _unquote(t.text)
            col = F.lit(s)
            col.__dict__["_bl_lit"] = s  # compile-time literal (format/hash selectors)
            return col
        if t.text == "(":
            e = self.parse_expr()
            self.expect(")")
            return e
        if t.text == "[":
            items = []
            while self.peek().text != "]":
                items.append(self.parse_expr())
                if self.peek().text == ",":
                    self.next()
            self.expect("]")
            arr = F.array(*items)
            arr.__dict__["_bl_is_array"] = True
            return arr
        if t.kind == "name":
            return self.parse_name(t.text)
        raise BloblangError(f"unexpected token {t.text!r} at {t.pos}")

    def parse_name(self, name: str) -> Column:
        if name == "true":
            return F.lit(True)
        if name == "false":
            return F.lit(False)
        if name == "null":
            return F.lit(None)
        if name == "match":
            # match expressions (reference internal/bloblang/query/expression.go):
            #   match this.x { cond => val, cond => val, _ => default }
            # where each cond is a full expression (or `_` catch-all).
            subject = None
            if self.peek().text != "{":
                subject = self.parse_expr()
            self.expect("{")
            arms: list[tuple[Column | None, Column]] = []
            while self.peek().text != "}":
                t = self.peek()
                if t.kind == "name" and t.text == "_":
                    self.next()
                    cond = None
                else:
                    cond = self.parse_expr()
                    if subject is not None:
                        # a bare value arm means equality with the subject;
                        # a boolean expression arm is used as-is. We follow
                        # the reference: non-boolean arm => equality check.
                        cond = cond if _is_boolish(cond) else (subject == cond)
                self.expect("=>")
                val = self.parse_expr()
                arms.append((cond, val))
                if self.peek().text == ",":
                    self.next()
            self.expect("}")
            out: Column | None = None
            default = F.lit(None)
            chain = None
            for cond, val in arms:
                if cond is None:
                    default = val
                    continue
                chain = F.when(cond, val) if chain is None else chain.when(cond, val)
            out = default if chain is None else chain.otherwise(default)
            return out
        if name == "if":
            cond = self.parse_expr()
            self.expect("{")
            then = self.parse_expr()
            self.expect("}")
            otherwise = F.lit(None)
            if self.peek().text == "else":
                self.next()
                self.expect("{")
                otherwise = self.parse_expr()
                self.expect("}")
            return F.when(cond, then).otherwise(otherwise)
        if name == "this":
            self.expect(".")
            field = self.next().text
            return F.col(field)
        if self.peek().text == "(":
            self.next()
            args = []
            while self.peek().text != ")":
                args.append(self.parse_expr())
                if self.peek().text == ",":
                    self.next()
            self.expect(")")
            return _apply_function(name, args)
        if name in self.bindings:
            return self.bindings[name]
        # bare name = column reference (our rows are typed columns)
        return F.col(name)


def _unquote(s: str) -> str:
    # backslashreplace -> unicode_escape: plain .encode() would feed
    # UTF-8 bytes through a latin-1 decode and corrupt every non-ASCII
    # character in the literal ("caf\u00e9" -> "caf\u00c3\u00a9")
    return s[1:-1].encode("latin-1", "backslashreplace").decode("unicode_escape")


_BOOL_EXPR_HINTS = (" > ", " >= ", " < ", " <= ", " = ", " != ", " AND ", " OR ", "NOT ", "LIKE", "RLIKE", "IN (", "IS NULL", "IS NOT NULL", "contains(", "startswith(", "endswith(", "regexp_like(")


def _is_boolish(col: Column) -> bool:
    """Best-effort: does this Column already evaluate to a boolean?

    Match arms that are boolean predicates are used as-is; value arms become
    equality checks against the subject (reference match semantics). Literal
    true/false also count as predicates.
    """
    try:
        s = col._jc.toString() if hasattr(col, "_jc") else str(col)
    except Exception:
        s = str(col)
    if s.strip() in ("true", "false"):
        return True
    return any(h in s for h in _BOOL_EXPR_HINTS)


# ---------------------------------------------------------------------------
# function & method registries
# (reference: internal/bloblang/query/functions.go, methods_strings.go,
#  methods_numbers.go, methods_structured.go, methods.go)
# ---------------------------------------------------------------------------


def _apply_function(name: str, args: list[Column]) -> Column:
    if name == "now":
        return F.current_timestamp()
    if name == "timestamp_unix":
        return F.unix_timestamp(F.current_timestamp())
    if name == "uuid_v4":
        return F.expr("uuid()")
    if name == "random_int":
        return (F.rand() * F.lit(2**31)).cast("long")
    if name == "deleted":
        raise BloblangError("deleted() is only valid as a whole-root assignment")
    if name == "meta":
        return F.col("meta").getItem(args[0])
    if name == "error":
        return F.col("error")
    if name == "errored":
        return F.col("error").isNotNull()
    if name == "content":
        return F.col("bytes")
    if name == "range":
        # stop is EXCLUSIVE and b <= a must yield [] — a bare
        # sequence(a, b-1) defaults to step -1 when a > b-1 and fabricates a
        # descending range (range(5,5) -> [5,4]); typed empty comes from
        # slicing a one-element sequence to length 0
        a, b = args[0], args[1]
        step = args[2] if len(args) == 3 else F.lit(1)
        empty = F.slice(F.sequence(a, a), 1, 0)
        asc = F.when(b <= a, empty).otherwise(F.sequence(a, b - 1, step))
        if len(args) == 2:
            return asc
        desc = F.when(b >= a, empty).otherwise(F.sequence(a, b + 1, step))
        return F.when(step > 0, asc).otherwise(desc)
    if name == "throw":
        return F.raise_error(args[0])
    if name == "pi":
        return F.lit(math.pi)
    if name in ("nanoid", "ksuid", "ulid"):
        # unique-id generators (functions.go:875,:913; impl/lang ulid);
        # uuid is Spark's native per-row unique id — same contract
        # (uniqueness), different format, documented deviation
        return F.expr("uuid()")
    if name == "fake":
        return _fake(_lit_str(args[0]))
    if name == "counter":
        # impl/pure/bloblang_general.go counter(min=1, max=maxInt): a
        # sequential per-mapping counter starting at min, wrapping past
        # max. Sequential state needs a total row order — compiled as
        # row_number over a single-partition window, which is DEV-GRADE
        # (the reference's counter is also one process). At scale use
        # uuid()/monotonically_increasing_id-style ids instead. The
        # dynamic `set:` reset parameter is a per-row state machine a
        # columnar plan cannot express — named error.
        if len(args) > 2:
            raise BloblangError(
                "counter(): the `set:` reset parameter is not supported "
                "(sequential per-row state); use min/max only")
        from pyspark.sql.window import Window

        mn = args[0] if args else F.lit(1)
        w = Window.orderBy(F.monotonically_increasing_id())
        seq = F.row_number().over(w) - F.lit(1)
        if len(args) == 2:
            span = args[1] - mn + F.lit(1)
            return mn + seq % span
        return mn + seq
    if name == "snowflake_id":
        # impl/lang/bloblang.go:99 (bwmarrin/snowflake layout: 41-bit ms
        # since epoch 1288834974657 << 22 | 10-bit node << 12 | 12-bit
        # sequence; string form). The per-process sequence maps to
        # monotonically_increasing_id's per-partition record number —
        # unique within (ms, node) at <=4096 rows per partition-ms, the
        # original's own bound. DOCUMENTED DEVIATION: with no node_id the
        # reference uses node 1; here the default is spark_partition_id()
        # so concurrent executors don't share a node and collide.
        # COLLISION WARNING (ADVICE r05): an EXPLICIT node_id pins the
        # reference layout but makes the node constant across partitions
        # while current_timestamp is constant per batch and the sequence
        # is the PER-PARTITION record number — two partitions can then
        # emit the same (ms, node, seq). Use the default (partition-id
        # node) for distributed uniqueness; explicit node_id is only safe
        # single-partition or when ids are never compared across
        # partitions.
        node = (args[0].cast("long") if args
                else F.spark_partition_id().cast("long")) % F.lit(1024)
        ms = F.unix_millis(F.current_timestamp()) - F.lit(1288834974657)
        seq = F.pmod(F.monotonically_increasing_id(), F.lit(4096))
        return (F.shiftleft(ms, 22).bitwiseOR(F.shiftleft(node, 12))
                .bitwiseOR(seq)).cast("string")
    if name == "hostname":
        import socket

        return F.lit(socket.gethostname())
    if name == "env":
        import os as _os

        return F.lit(_os.environ.get(_lit_str(args[0]), ""))
    if name == "file":
        # internal/impl/io/bloblang.go file(): contents resolved once at
        # mapping-init time (compile time here) — a per-row read would be
        # a driver-side file in every executor's plan, not the contract
        with open(_lit_str(args[0]), encoding="utf-8") as f:
            content = f.read()
        col = F.lit(content)
        # carry the python value like parser string literals do, so
        # literal-consuming methods (.format template, selectors) see the
        # REAL contents, not a regex scrape of the column expr
        col.__dict__["_bl_lit"] = content
        return col
    raise BloblangError(f"unsupported function {name}()")


# Methods whose RESULT is an array (drives polymorphic .length() dispatch —
# Bloblang's length works on strings and arrays alike, Spark splits that
# into length()/size()).
_ARRAY_PRODUCERS = {
    "split", "unique", "sort", "flatten", "append", "concat_arrays", "keys",
    "values", "filter", "map_each", "find_all", "re_find_all", "zip", "enumerated",
    "key_values",
}

# methods whose result is definitely a string — lets `+` compile to
# concatenation past the first literal (see the `+` operator)
_STRING_PRODUCERS = {
    "string", "uppercase", "lowercase", "trim", "trim_prefix", "trim_suffix",
    "capitalize", "reverse_string", "quote", "unquote", "slug", "join",
    "format_timestamp", "encode", "concat", "replace_all", "re_replace_all",
    "substr", "slice_string", "repeat", "diff", "patch",
}


def _apply_method(name: str, col: Column, args: list[Column]) -> Column:
    # NB: plain getattr would hit Column.__getattr__ and build a field access
    if name == "length" and col.__dict__.get("_bl_is_array", False):
        return F.size(col)
    m = _METHODS.get(name)
    if m is None:
        raise BloblangError(f"unsupported method .{name}()")
    out = m(col, *args)
    if name in _ARRAY_PRODUCERS:
        out.__dict__["_bl_is_array"] = True
    if name in _STRING_PRODUCERS:
        # lets `+` treat the result as concatenation (Bloblang arithmetic.go
        # Add concatenates strings; see the `+` operator above)
        out.__dict__["_bl_is_str"] = True
    return out


_METHODS = {
    # strings (methods_strings.go)
    "uppercase": lambda c: F.upper(c),
    "lowercase": lambda c: F.lower(c),
    "capitalize": lambda c: F.initcap(c),
    "trim": lambda c, *a: F.trim(c),
    "length": lambda c: F.length(c),
    "slice": lambda c, lo, hi=None: _slice(c, lo, hi),
    "split": lambda c, sep: F.split(c, sep),
    "join": lambda c, sep=None: F.array_join(c, sep if sep is not None else F.lit("")),
    "contains": lambda c, s: F.contains(c, s),
    "has_prefix": lambda c, s: F.startswith(c, s),
    "has_suffix": lambda c, s: F.endswith(c, s),
    "index_of": lambda c, s: F.locate(_lit_str(s), c) - 1,
    "replace_all": lambda c, a, b: F.replace(c, a, b),
    "re_replace_all": lambda c, pat, rep: F.regexp_replace(c, pat, rep),
    "re_match": lambda c, pat: F.regexp_like(c, pat),
    "reverse": lambda c: F.reverse(c),
    "repeat": lambda c, n: F.repeat(c, n),
    "quote": lambda c: F.concat(F.lit('"'), c, F.lit('"')),
    "strip_html": lambda c: F.regexp_replace(c, "<[^>]*>", ""),
    # encoding / hashing
    "hash": lambda c, alg: _hash(c, alg),
    "encode": lambda c, scheme: _encode(c, scheme),
    "decode": lambda c, scheme: _decode(c, scheme),
    # numbers (methods_numbers.go, bloblang_numbers_v2.go)
    "abs": lambda c: F.abs(c),
    "ceil": lambda c: F.ceil(c),
    "floor": lambda c: F.floor(c),
    "round": lambda c: F.round(c, 0),
    "sqrt": lambda c: F.sqrt(c),
    "log": lambda c: F.log(c),
    "log10": lambda c: F.log10(c),
    "pow": lambda c, e: F.pow(c, e),
    "sin": lambda c: F.sin(c),
    "cos": lambda c: F.cos(c),
    "tan": lambda c: F.tan(c),
    # arrays/objects (methods_structured.go)
    "sum": lambda c: F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x),
    # min/max: no-arg = array reduction; with args = pairwise least/greatest
    # (Bloblang numbers methods_numbers.go)
    "min": lambda c, *a: F.least(c, *a) if a else F.array_min(c),
    "max": lambda c, *a: F.greatest(c, *a) if a else F.array_max(c),
    "snake_case": lambda c: F.lower(F.regexp_replace(F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1_$2"), r"[\s-]+", "_")),
    "unique": lambda c: F.array_distinct(c),
    "sort": lambda c: F.sort_array(c),
    "flatten": lambda c: F.flatten(c),
    "first": lambda c: F.try_element_at(c, F.lit(1)),
    "last": lambda c: F.try_element_at(c, F.lit(-1)),
    "append": lambda c, *xs: F.concat(c, F.array(*xs)),
    "concat": lambda c, other: F.concat(c, other),
    "index": lambda c, i: F.try_element_at(c, i + 1),
    "keys": lambda c: F.map_keys(c),
    "values": lambda c: F.map_values(c),
    "get": lambda c, k: F.try_element_at(c, k),
    "exists": lambda c, k: F.map_contains_key(c, k),
    # coercion / error handling (methods.go:14-335)
    "string": lambda c: c.cast("string"),
    "number": lambda c: c.cast("double"),
    "bool": lambda c: c.cast("boolean"),
    "bytes": lambda c: c.cast("binary"),
    "catch": lambda c, fallback: F.coalesce(c, fallback),
    "or": lambda c, fallback: F.coalesce(c, fallback),
    "not_null": lambda c: c,  # nullability is schema-level here; no-op
    "type": lambda c: F.typeof(c),
    # timestamps (internal/impl/pure/bloblang_time.go)
    "ts_unix": lambda c: F.unix_timestamp(c),
    "ts_unix_milli": lambda c: F.unix_millis(c.cast("timestamp")),
    "ts_unix_micro": lambda c: F.unix_micros(c.cast("timestamp")),
    "ts_format": lambda c, fmt: F.date_format(c, fmt),
    "ts_strftime": lambda c, fmt: F.date_format(c, fmt),
    "ts_parse": lambda c, fmt: F.to_timestamp(c, fmt),
    "ts_strptime": lambda c, fmt: F.to_timestamp(c, fmt),
    "ts_round": lambda c, unit: F.date_trunc(_lit_str(unit), c),
    "ts_tz": lambda c, tz: F.from_utc_timestamp(c, tz),
    # higher-order (Bloblang lambdas over arrays, methods_structured.go:
    # filter, map_each, fold :641, any/all exist via find/check patterns)
    "filter": lambda c, fn: F.filter(c, fn),
    "map_each": lambda c, fn: F.transform(c, fn),
    "any": lambda c, fn: F.exists(c, fn),
    "all": lambda c, fn: F.forall(c, fn),
    "fold": lambda c, init, fn: F.aggregate(c, _widen_init(init), fn),
    "find": lambda c, fn: F.try_element_at(F.filter(c, fn), F.lit(1)),
    "find_all": lambda c, fn: F.filter(c, fn),
    "zip": lambda c, other: F.arrays_zip(c, other),
    "enumerated": lambda c: F.arrays_zip(
        F.slice(F.sequence(F.lit(0), F.greatest(F.size(c) - 1, F.lit(0)), F.lit(1)), 1, F.size(c)), c
    ),
    "without": lambda c, *keys: F.map_filter(c, lambda k, v: ~k.isin(*[_lit_str(x) for x in keys])),
    "not_empty": lambda c: F.when(F.length(c.cast("string")) > 0, c),
    # format (methods_strings.go `format`): "%s-%d".format(a, b)
    "format": lambda c, *a: F.format_string(_lit_str(c), *a),
    "pad_left": lambda c, n, ch: F.lpad(c, n if isinstance(n, int) else _lit_int(n), _lit_str(ch)),
    "pad_right": lambda c, n, ch: F.rpad(c, n if isinstance(n, int) else _lit_int(n), _lit_str(ch)),
    "trim_prefix": lambda c, p: F.when(F.startswith(c, p), F.substring(c, F.length(p) + 1, F.lit(1 << 30))).otherwise(c),
    "trim_suffix": lambda c, s: F.when(F.endswith(c, s), F.substring(c, 1, F.length(c) - F.length(s))).otherwise(c),
    "escape_url_query": lambda c: F.url_encode(c),
    "unescape_url_query": lambda c: F.url_decode(c),
    "re_find_all": lambda c, pat: F.regexp_extract_all(c, pat, F.lit(0)),
    "int64": lambda c: c.cast("bigint"),
    "int32": lambda c: c.cast("int"),
    "float64": lambda c: c.cast("double"),
    "float32": lambda c: c.cast("float"),
    # parsing (methods_strings.go parse_csv/parse_json/parse_url,
    # bloblang_duration.go parse_duration_iso8601). Schemas are compile-time
    # DDL literals — Spark needs the shape up front; the reference infers it
    # per message, which a columnar engine cannot.
    "parse_csv": lambda c, schema: F.from_csv(c, F.lit(_lit_full_str(schema))),
    "parse_json": lambda c, schema: F.from_json(c, _lit_full_str(schema)),
    "parse_url": lambda c: _parse_url(c),
    "parse_duration_iso8601": lambda c: _parse_duration_iso8601(c),
    # yaml (methods_strings.go parse_yaml:1169/format_yaml:1201). YAML has
    # no JVM builtin: the text<->JSON leg runs as an Arrow-batched pandas
    # UDF (codec, not hot-path), typing stays in Catalyst via from_json.
    "parse_yaml": lambda c, schema: F.from_json(_yaml_to_json(c), _lit_full_str(schema)),
    "format_yaml": lambda c: _json_to_yaml(F.to_json(c)),
    # msgpack (impl/msgpack/bloblang.go:30,52) — same Arrow-UDF JSON-leg
    # shape as yaml, typed via the compile-time DDL schema; the spec-level
    # codec is operators/msgpack_codec. Binary map values stringify on the
    # JSON leg (a typed column can't hold heterogeneous bytes).
    "parse_msgpack": lambda c, schema: F.from_json(_msgpack_to_json(c), _lit_full_str(schema)),
    "format_msgpack": lambda c: _json_to_msgpack(F.to_json(c)),
    # changelog diff/patch (impl/changelog/bloblang.go wrapping
    # r3labs/diff/v3, semantics pinned to its test vectors in
    # functions/changelog.py). Structured From/To are heterogeneous, so
    # the result rides the JSON leg: .diff() returns the changelog as a
    # JSON string, .patch() takes one and returns the patched value as a
    # JSON string — re-type with .parse_json(schema) like the other
    # schemaless codecs.
    "diff": lambda c, other: _changelog_diff(F.to_json(c), F.to_json(other)),
    "patch": lambda c, cl: _changelog_patch(F.to_json(c), cl),
    # html escaping (methods_strings.go escape_html/unescape_html — Go
    # html.EscapeString's 5 entities)
    "escape_html": lambda c: _escape_html(c),
    "unescape_html": lambda c: _unescape_html(c),
    # crypto (methods_strings.go encrypt_aes/decrypt_aes/hmac)
    "encrypt_aes": lambda c, mode, key, iv=None: _aes(c, mode, key, iv, encrypt=True),
    "decrypt_aes": lambda c, mode, key, iv=None: _aes(c, mode, key, iv, encrypt=False),
    "hmac": lambda c, alg, key: _hmac(c, alg, key),
    # JWT HS-family (impl/crypto/jwt_sign.go:155, jwt_parse.go:174) — pure
    # expressions composed from the HMAC blocks above; RS/ES need key infra
    # (documented out)
    "sign_jwt_hs256": lambda c, key: _sign_jwt(c, key, 256),
    "sign_jwt_hs384": lambda c, key: _sign_jwt(c, key, 384),
    "sign_jwt_hs512": lambda c, key: _sign_jwt(c, key, 512),
    "parse_jwt_hs256": lambda c, key, schema: _parse_jwt(c, key, schema, 256),
    "parse_jwt_hs384": lambda c, key, schema: _parse_jwt(c, key, schema, 384),
    "parse_jwt_hs512": lambda c, key, schema: _parse_jwt(c, key, schema, 512),
    # JWT RS/ES families (jwt_sign.go:112-148, jwt_parse.go) — pure-Python
    # RSA PKCS#1 v1.5 + RFC 6979 deterministic ECDSA (crypto_prims.py);
    # the PEM key is a compile-time literal, signing is an Arrow-batched
    # pandas UDF (bigint modexp can't be a Catalyst expression)
    "sign_jwt_rs256": lambda c, key: _sign_jwt_pk(c, key, "RS256"),
    "sign_jwt_rs384": lambda c, key: _sign_jwt_pk(c, key, "RS384"),
    "sign_jwt_rs512": lambda c, key: _sign_jwt_pk(c, key, "RS512"),
    "sign_jwt_es256": lambda c, key: _sign_jwt_pk(c, key, "ES256"),
    "sign_jwt_es384": lambda c, key: _sign_jwt_pk(c, key, "ES384"),
    "sign_jwt_es512": lambda c, key: _sign_jwt_pk(c, key, "ES512"),
    "parse_jwt_rs256": lambda c, key, schema: _parse_jwt_pk(c, key, schema, "RS256"),
    "parse_jwt_rs384": lambda c, key, schema: _parse_jwt_pk(c, key, schema, "RS384"),
    "parse_jwt_rs512": lambda c, key, schema: _parse_jwt_pk(c, key, schema, "RS512"),
    "parse_jwt_es256": lambda c, key, schema: _parse_jwt_pk(c, key, schema, "ES256"),
    "parse_jwt_es384": lambda c, key, schema: _parse_jwt_pk(c, key, schema, "ES384"),
    "parse_jwt_es512": lambda c, key, schema: _parse_jwt_pk(c, key, schema, "ES512"),
    # bcrypt compare (crypto/bcrypt.go:25): pure-Python eksblowfish.
    # A cost-10 compare runs in SECONDS per distinct secret — an auth
    # check on control-plane flows, never a bulk row transform.
    "compare_bcrypt": lambda c, hashed: _compare_bcrypt(c, hashed),
    # jsonpath (impl/jsonpath/bloblang_jsonpath.go:18) — Spark's native
    # get_json_object speaks the same $.a.b[0] core syntax
    "json_path": lambda c, p: F.get_json_object(c, _lit_str(p)),
    # structured/map methods (methods_structured.go squash:1897,
    # key_values:641, map_each_key, with)
    "squash": lambda c: F.map_from_entries(F.flatten(F.transform(c, lambda m: F.map_entries(m)))),
    "key_values": lambda c: F.map_entries(c),
    "map_each_key": lambda c, fn: F.transform_keys(c, lambda k, v: fn(k)),
    "with": lambda c, *keys: F.map_filter(c, lambda k, v: k.isin(*[_lit_str(x) for x in keys])),
    # typed-map subset of reference merge: right side wins on key clash
    # (the reference's untyped merge collects BOTH values into an array on
    # collision — inexpressible in a map<K,V> column). Expressed via
    # map_filter so it never trips spark.sql.mapKeyDedupPolicy.
    "merge": lambda c, other: F.map_concat(
        F.map_filter(c, lambda k, v: ~F.map_contains_key(other, k)), other
    ),
    "sort_by": lambda c, fn: _sort_by(c, fn),
    "unquote": lambda c: F.regexp_replace(c, '^"(.*)"$', "$1"),
    "parse_form_url_encoded": lambda c: _parse_form(c),
    # timestamp +/- an ISO-8601 duration (bloblang_time.go ts_add_iso8601)
    "ts_add_iso8601": lambda c, d: _ts_shift(c, d, 1),
    "ts_sub_iso8601": lambda c, d: _ts_shift(c, d, -1),
}


def _slice(c: Column, lo, hi=None) -> Column:
    """Bloblang slice with from-the-end negative indices (methods.go slice):
    [lo, hi) over characters; negative values count from the length. The
    previous substring(lo+1, hi-lo) was off by one for negatives (Spark's
    negative substring pos has its own from-end convention)."""
    lo = F.lit(lo) if isinstance(lo, int) else lo
    hi = F.lit(hi) if isinstance(hi, int) else hi
    n = F.length(c)
    lo_i = F.when(lo >= 0, lo).otherwise(F.greatest(n + lo, F.lit(0)))
    hi_i = n if hi is None else F.when(hi >= 0, F.least(hi, n)).otherwise(n + hi)
    return F.substring(c, lo_i + 1, F.greatest(hi_i - lo_i, F.lit(0)))


def _parse_form(c: Column) -> Column:
    """application/x-www-form-urlencoded -> map (methods_strings.go
    parse_form_url_encoded). Keys AND values are url-decoded; repeated keys
    keep the LAST value (typed-map subset — the reference returns arrays
    for repeats) without tripping mapKeyDedupPolicy."""
    entries = F.transform(
        F.split(c, "&"),
        lambda kv: F.struct(
            F.url_decode(F.split_part(kv, F.lit("="), F.lit(1))).alias("k"),
            F.url_decode(F.split_part(kv, F.lit("="), F.lit(2))).alias("v"),
        ),
    )
    empty = F.expr("cast(map() as map<string,string>)")
    return F.aggregate(
        entries,
        empty,
        lambda acc, e: F.map_concat(
            F.map_filter(acc, lambda k, v: k != e["k"]), F.create_map(e["k"], e["v"])
        ),
    )


def _sort_by(c: Column, fn) -> Column:
    """sort_by(fn): sort array elements by a derived key
    (methods_structured.go sort_by:1310). sort_array on (key, value)
    structs orders by the leading field."""
    keyed = F.transform(c, lambda x: F.struct(fn(x).alias("k"), x.alias("v")))
    return F.transform(F.sort_array(keyed), lambda s: s["v"])


def _ts_shift(c: Column, dur: Column, sign: int) -> Column:
    # micros round-trip preserves Spark's full timestamp precision
    ns = _parse_duration_iso8601(dur)
    return F.timestamp_micros(
        F.unix_micros(c.cast("timestamp")) + sign * (ns / F.lit(1_000)).cast("bigint")
    )


def _parse_url(c: Column) -> Column:
    """URL -> struct(scheme, host, port, path, query, fragment)
    (methods_strings.go parse_url -> object). Pure Catalyst parse_url."""
    part = lambda p: F.parse_url(c, F.lit(p))  # noqa: E731
    # port: trailing ":<digits>" of the authority — split-on-':' element 1
    # is wrong for userinfo ('user:pw@host:8443') and IPv6 ('[::1]:8080')
    port = F.nullif(F.regexp_extract(part("AUTHORITY"), r":(\d+)$", 1), F.lit("")).cast("int")
    return F.struct(
        part("PROTOCOL").alias("scheme"),
        part("HOST").alias("host"),
        port.alias("port"),
        part("PATH").alias("path"),
        part("QUERY").alias("query"),
        part("REF").alias("fragment"),
    )


_ISO_DUR_PAT = r"^(-?)P(?:(\d+)W)?(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"


def _parse_duration_iso8601(c: Column) -> Column:
    """ISO-8601 duration -> integer nanoseconds (reference
    bloblang parse_duration_iso8601 contract). Unmatched input -> NULL."""
    def g(i: int) -> Column:
        return F.coalesce(F.nullif(F.regexp_extract(c, _ISO_DUR_PAT, i), F.lit("")).cast("double"), F.lit(0.0))

    total_s = g(2) * 604800 + g(3) * 86400 + g(4) * 3600 + g(5) * 60 + g(6)
    sign = F.when(F.regexp_extract(c, _ISO_DUR_PAT, 1) == "-", F.lit(-1)).otherwise(F.lit(1))
    ns = (sign * total_s * F.lit(1_000_000_000)).cast("bigint")
    return F.when(F.regexp_like(c, F.lit(_ISO_DUR_PAT)), ns)


_HTML_ESCAPES = [("&", "&amp;"), ("'", "&#39;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&#34;")]


def _escape_html(c: Column) -> Column:
    for raw, ent in _HTML_ESCAPES:  # & first so entities aren't double-escaped
        c = F.replace(c, F.lit(raw), F.lit(ent))
    return c


def _unescape_html(c: Column) -> Column:
    # common aliases first, & last (exact inverse of _escape_html ordering)
    for ent, raw in [("&quot;", '"'), ("&apos;", "'"), ("&#34;", '"'), ("&#39;", "'"),
                     ("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&")]:
        c = F.replace(c, F.lit(ent), F.lit(raw))
    return c


def _aes(c: Column, mode: Column, key: Column, iv: Column | None, encrypt: bool) -> Column:
    """AES via Spark's native aes_encrypt/aes_decrypt (JVM, codegen). Modes
    ECB/CBC/GCM; pass a literal iv for deterministic output (GCM/CBC
    otherwise salt with a random iv, which breaks replay identity)."""
    m = _lit_str(mode).upper()
    if m not in ("ECB", "CBC", "GCM"):
        raise BloblangError(f"unsupported AES mode {m} (one of ECB, CBC, GCM)")
    if encrypt:
        args = [c.cast("binary"), key.cast("binary"), F.lit(m), F.lit("DEFAULT")]
        if iv is not None:
            args.append(iv.cast("binary"))
        return F.aes_encrypt(*args)
    return F.aes_decrypt(c.cast("binary"), key.cast("binary"), F.lit(m))


def _hmac_raw(c: Column, key: Column, bits: int) -> Column:
    """HMAC as a pure Catalyst expression (no UDF): the ipad/opad key blocks
    are compile-time binary literals (key must be a literal, as in reference
    configs), the two passes are native sha2. Returns the raw digest bytes."""
    block = 64 if bits == 256 else 128
    k = _lit_full_str(key).encode()
    if len(k) > block:
        import hashlib

        k = hashlib.new(f"sha{bits}", k).digest()
    k = k.ljust(block, b"\0")
    ipad = bytes(b ^ 0x36 for b in k)
    opad = bytes(b ^ 0x5C for b in k)
    inner_hex = F.sha2(F.concat(F.lit(ipad), c.cast("binary")), bits)
    return F.unhex(F.sha2(F.concat(F.lit(opad), F.unhex(inner_hex)), bits))


def _hmac(c: Column, alg: Column, key: Column) -> Column:
    name = _lit_str(alg).lower()
    bits = {"sha256": 256, "sha384": 384, "sha512": 512}.get(name)
    if bits is None:
        raise BloblangError(f"unsupported hmac algorithm {name} (sha256/sha384/sha512)")
    return F.lower(F.hex(_hmac_raw(c, key, bits)))


def _b64(c: Column) -> Column:
    """RFC 4648 base64 with NO line breaks: Spark's base64() MIME-chunks at
    76 chars with CRLF when spark.sql.chunkBase64String.enabled is on (it's
    off in get_spark, but strip defensively for foreign sessions —
    translate() DELETES chars with no counterpart)."""
    return F.translate(F.base64(c), "\r\n", "")


def _b64url(c: Column) -> Column:
    """Unpadded URL-safe base64 of a binary column (RFC 7515 encoding)."""
    return F.regexp_replace(F.translate(_b64(c), "+/", "-_"), "=+$", "")


def _sign_jwt(c: Column, key: Column, bits: int) -> Column:
    """JWT HSxxx signing as a pure expression (crypto/jwt_sign.go:155):
    payload JSON -> b64url(header).b64url(payload).b64url(hmac)."""
    import base64 as _b64
    import json as _json

    header = _b64.urlsafe_b64encode(
        _json.dumps({"alg": f"HS{bits}", "typ": "JWT"}, separators=(",", ":")).encode()
    ).rstrip(b"=").decode("ascii")
    signing_input = F.concat(F.lit(header + "."), _b64url(c.cast("binary")))
    return F.concat(signing_input, F.lit("."), _b64url(_hmac_raw(signing_input, key, bits)))


def _parse_jwt(c: Column, key: Column, schema: Column, bits: int) -> Column:
    """Verify-and-decode a JWT HSxxx token (crypto/jwt_parse.go:174).
    Returns the typed claims struct, or NULL when the signature or the
    header's alg doesn't match (the reference errors the message; pair with
    the error protocol via `.catch()`/set_error on NULL — columnar methods
    can't raise per-row)."""
    h = F.split_part(c, F.lit("."), F.lit(1))
    p = F.split_part(c, F.lit("."), F.lit(2))
    s = F.split_part(c, F.lit("."), F.lit(3))
    signing_input = F.concat(h, F.lit("."), p)
    expect = _b64url(_hmac_raw(signing_input, key, bits))
    # try_to_binary: a garbage token (non-base64 segments) must NULL the
    # row, never abort the job (unbase64 throws under ANSI mode)
    alg = F.get_json_object(
        F.try_to_binary(F.translate(h, "-_", "+/"), F.lit("base64")).cast("string"),
        "$.alg",
    )
    claims_json = F.try_to_binary(F.translate(p, "-_", "+/"), F.lit("base64")).cast("string")
    return F.when(
        (alg == F.lit(f"HS{bits}")) & (s == expect),
        F.from_json(claims_json, _lit_full_str(schema)),
    )


def _jwt_pk_key(pem: str, alg: str, private: bool) -> dict:
    """Parse + validate a literal PEM for a public-key JWT alg at compile
    time (a bad key must fail the mapping compile, not every row). For
    parse_*, a private PEM is accepted too — the verify key derives from
    it (jwt_parse_test.go does the same)."""
    from bento_spark.functions import crypto_prims as cp

    bits = int(alg[2:])
    try:
        if alg.startswith("RS"):
            if private:
                key = cp.parse_rsa_private(pem)
            else:
                try:
                    key = cp.parse_rsa_public(pem)
                except ValueError:
                    key = cp.parse_rsa_private(pem)  # verify with n,e
            return {"kind": "rsa", "bits": bits, **key}
        curve, hash_bits = cp.JOSE_CURVE[alg]
        try:
            key = cp.parse_ec_private(pem)
            if not private:
                x, y = cp.ec_public_from_private(key["curve"], key["d"])
                key = {"curve": key["curve"], "x": x, "y": y}
        except ValueError:
            if private:
                raise
            key = cp.parse_ec_public(pem)
        if key["curve"] != curve:
            raise BloblangError(
                f"{alg} requires a {curve} key, got {key['curve']} "
                "(jwt ES algs pin the curve)"
            )
        return {"kind": "ec", "bits": hash_bits, **key}
    except ValueError as e:
        raise BloblangError(f"invalid PEM key for {alg}: {e}") from e


def _sign_jwt_pk(c: Column, key: Column, alg: str) -> Column:
    """JWT RSxxx/ESxxx signing (jwt_sign.go:112-148): the b64url
    header.payload builds JVM-side; only the signature crosses into an
    Arrow-batched UDF. RFC 6979 nonces keep ES tokens deterministic
    (same row -> same token, the replay-identity invariant)."""
    import base64 as _b64lib
    import json as _json

    k = _jwt_pk_key(_lit_full_str(key), alg, private=True)
    header = _b64lib.urlsafe_b64encode(
        _json.dumps({"alg": alg, "typ": "JWT"}, separators=(",", ":")).encode()
    ).rstrip(b"=").decode("ascii")
    signing_input = F.concat(F.lit(header + "."), _b64url(c.cast("binary")))

    @pandas_udf("string")
    def sign(s: pd.Series) -> pd.Series:
        import base64 as _b

        from bento_spark.functions import crypto_prims as cp

        def one(t):
            if t is None:
                return None
            msg = t.encode("ascii")
            if k["kind"] == "rsa":
                sig = cp.rsa_sign(k, msg, k["bits"])
            else:
                sig = cp.ecdsa_sign_jose(k["curve"], k["d"], msg, k["bits"])
            return t + "." + _b.urlsafe_b64encode(sig).rstrip(b"=").decode("ascii")

        return s.map(one)

    return sign(signing_input)


def _parse_jwt_pk(c: Column, key: Column, schema: Column, alg: str) -> Column:
    """Verify-and-decode a JWT RSxxx/ESxxx token (jwt_parse.go). Returns
    the typed claims struct, or NULL when the signature or the header alg
    doesn't match — same NULL-on-failure contract as the HS family."""
    k = _jwt_pk_key(_lit_full_str(key), alg, private=False)
    ddl = _lit_full_str(schema)

    @pandas_udf("string")
    def verify(s: pd.Series) -> pd.Series:
        import base64 as _b
        import json as _json

        from bento_spark.functions import crypto_prims as cp

        def one(t):
            if t is None:
                return None
            try:
                h, p, sig_b64 = t.split(".")
                pad = lambda x: x + "=" * (-len(x) % 4)  # noqa: E731
                if _json.loads(_b.urlsafe_b64decode(pad(h))).get("alg") != alg:
                    return None
                sig = _b.urlsafe_b64decode(pad(sig_b64))
                msg = (h + "." + p).encode("ascii")
                if k["kind"] == "rsa":
                    ok = cp.rsa_verify(k, msg, sig, k["bits"])
                else:
                    ok = cp.ecdsa_verify_jose(
                        k["curve"], k["x"], k["y"], msg, sig, k["bits"])
                if not ok:
                    return None
                return _b.urlsafe_b64decode(pad(p)).decode("utf-8")
            except (ValueError, KeyError):
                return None  # malformed token NULLs the row (catch protocol)

        return s.map(one)

    return F.from_json(verify(c), ddl)


# fake() wordlists (impl/lang/bloblang.go:126 GetFakeValue — the
# reference wraps go-faker; the function set below mirrors its supported
# kinds as pure Catalyst expressions over rand(), so generation stays
# JVM-side and nondeterministic-per-row like the original)
_FAKE_FIRST = ["Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald",
               "Radia", "Leslie", "Margaret", "Dennis"]
_FAKE_LAST = ["Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov",
              "Knuth", "Perlman", "Lamport", "Hamilton", "Ritchie"]
_FAKE_WORDS = ["stream", "window", "batch", "broker", "buffer", "offset",
               "schema", "topic", "shard", "vector"]
_FAKE_DOMAINS = ["example.com", "example.org", "example.net", "test.dev"]
_FAKE_TZ = ["UTC", "America/New_York", "Europe/Berlin", "Asia/Tokyo",
            "Australia/Sydney"]
_FAKE_CC = ["Visa", "MasterCard", "American Express", "Discover"]
_FAKE_CUR = ["USD", "EUR", "GBP", "JPY", "CHF"]
_FAKE_CN_FIRST = ["Wei", "Fang", "Min", "Jing", "Lei", "Yan"]
_FAKE_CN_LAST = ["Wang", "Li", "Zhang", "Liu", "Chen", "Yang"]


def _fake(kind: str) -> Column:
    """fake(kind) (impl/lang/bloblang.go:126): each call site draws fresh
    per-row values. Unknown kinds fail the mapping compile (the reference
    errors at eval; Bloblang literals make compile-time the honest spot)."""

    def pick(values: list[str]) -> Column:
        arr = F.array(*[F.lit(v) for v in values])
        return F.element_at(arr, (F.rand() * len(values)).cast("int") + 1)

    def digits(n: int) -> Column:
        return F.concat(*[(F.rand() * 10).cast("int").cast("string") for _ in range(n)])

    def hexs(n: int) -> Column:
        return F.concat(*[
            F.format_string("%x", (F.rand() * 16).cast("int")) for _ in range(n)
        ])

    # everything below is LAZY (a thunk per kind): each Column expression
    # is a driver->JVM round-trip, so only the requested kind is built
    def rand_ts():
        return F.timestamp_seconds((F.rand() * F.lit(1_700_000_000)).cast("long"))

    def first():
        return pick(_FAKE_FIRST)

    def last():
        return pick(_FAKE_LAST)

    def username():
        return F.concat(F.lower(first()), F.lit("."), F.lower(last()),
                        (F.rand() * 100).cast("int").cast("string"))

    out = {
        "latitude": lambda: F.round(F.rand() * 180 - 90, 6),
        "longitude": lambda: F.round(F.rand() * 360 - 180, 6),
        "unix_time": lambda: (F.rand() * F.lit(1_700_000_000)).cast("long"),
        "date": lambda: F.date_format(rand_ts(), "yyyy-MM-dd"),
        "time_string": lambda: F.date_format(rand_ts(), "HH:mm:ss"),
        "month_name": lambda: F.date_format(rand_ts(), "MMMM"),
        "year_string": lambda: F.date_format(rand_ts(), "yyyy"),
        "day_of_week": lambda: F.date_format(rand_ts(), "EEEE"),
        "day_of_month": lambda: F.date_format(rand_ts(), "d"),
        "timestamp": lambda: F.date_format(rand_ts(), "yyyy-MM-dd HH:mm:ss"),
        "century": lambda: pick(["XIX", "XX", "XXI"]),
        "timezone": lambda: pick(_FAKE_TZ),
        "time_period": lambda: pick(["AM", "PM"]),
        "email": lambda: F.concat(username(), F.lit("@"), pick(_FAKE_DOMAINS)),
        "mac_address": lambda: F.concat_ws(":", *[hexs(2) for _ in range(6)]),
        "domain_name": lambda: pick(_FAKE_DOMAINS),
        "url": lambda: F.concat(F.lit("https://"), pick(_FAKE_DOMAINS),
                                F.lit("/"), pick(_FAKE_WORDS)),
        "username": username,
        "ipv4": lambda: F.concat_ws(
            ".", *[(F.rand() * 256).cast("int").cast("string") for _ in range(4)]),
        "ipv6": lambda: F.concat_ws(":", *[hexs(4) for _ in range(8)]),
        "password": lambda: hexs(16),
        "jwt": lambda: F.concat_ws(".", hexs(12), hexs(24), hexs(16)),
        "word": lambda: pick(_FAKE_WORDS),
        "cc_type": lambda: pick(_FAKE_CC),
        "cc_number": lambda: digits(16),
        "currency": lambda: pick(_FAKE_CUR),
        "amount_with_currency": lambda: F.concat(
            F.format_number(F.rand() * 10000, 2), F.lit(" "), pick(_FAKE_CUR)),
        "title_male": lambda: F.lit("Mr."),
        "title_female": lambda: F.lit("Mrs."),
        "first_name": first,
        "first_name_male": first,
        "first_name_female": first,
        "last_name": last,
        "name": lambda: F.concat_ws(" ", first(), last()),
        "gender": lambda: pick(["Male", "Female"]),
        "chinese_first_name": lambda: pick(_FAKE_CN_FIRST),
        "chinese_last_name": lambda: pick(_FAKE_CN_LAST),
        "chinese_name": lambda: F.concat_ws(
            " ", pick(_FAKE_CN_LAST), pick(_FAKE_CN_FIRST)),
        "phone_number": lambda: F.concat(digits(3), F.lit("-"), digits(3),
                                         F.lit("-"), digits(4)),
        "toll_free_phone_number": lambda: F.concat(
            F.lit("(888) "), digits(3), F.lit("-"), digits(4)),
        "e164_phone_number": lambda: F.concat(F.lit("+1"), digits(10)),
        "uuid_hyphenated": lambda: F.expr("uuid()"),
        "uuid_digit": lambda: F.replace(F.expr("uuid()"), F.lit("-"), F.lit("")),
    }
    if kind == "sentence":
        words = F.concat_ws(" ", *[pick(_FAKE_WORDS) for _ in range(6)])
        return F.concat(F.initcap(F.substring(words, 1, 1)),
                        F.substring(words, 2, 1 << 20), F.lit("."))
    if kind == "paragraph":
        return F.concat_ws(" ", *[_fake("sentence") for _ in range(3)])
    if kind not in out:
        raise BloblangError(
            f"fake: unsupported kind {kind!r} (impl/lang/bloblang.go function set)")
    return out[kind]()


def _compare_bcrypt(c: Column, hashed: Column) -> Column:
    """compare_bcrypt(hashed_secret) -> boolean (crypto/bcrypt.go:25:
    False on mismatch, NULL on a malformed hash via the catch protocol).
    Distinct secrets memoize within the batch — bcrypt's work factor is
    the point, so re-deriving per equal row would multiply seconds."""
    from bento_spark.functions.crypto_prims import bcrypt_parse

    hashed_lit = _lit_full_str(hashed)
    try:  # malformed hash fails the compile, not every row — format
        # check only (a full compare would run 2^cost eksblowfish here)
        bcrypt_parse(hashed_lit)
    except ValueError as e:
        raise BloblangError(f"compare_bcrypt: {e}") from e

    @pandas_udf("boolean")
    def cmp(s: pd.Series) -> pd.Series:
        from bento_spark.functions.crypto_prims import bcrypt_compare as _cmp

        memo: dict[str, bool] = {}

        def one(t):
            if t is None:
                return None
            if t not in memo:
                memo[t] = _cmp(t.encode("utf-8"), hashed_lit)
            return memo[t]

        return s.map(one)

    return cmp(c)


def _lit_full_str(col: Column) -> str:
    """A compile-time string literal preserved verbatim (DDL schemas, hmac
    keys — anything where _lit_str's identifier-only extraction is lossy)."""
    if "_bl_lit" in col.__dict__:
        return col.__dict__["_bl_lit"]
    raise BloblangError("expected a literal string argument")

def _widen_init(init: Column) -> Column:
    """fold's init literal must match the lambda's result type; widen int
    literals to bigint and float literals to double (Bloblang numbers are
    int64/float64, type_helpers.go:14-36)."""
    lit = init.__dict__.get("_bl_lit") if hasattr(init, "__dict__") else None
    if isinstance(lit, int):
        return init.cast("bigint")
    if isinstance(lit, float):
        return init.cast("double")
    return init


def _lit_int(col: Column | int) -> int:
    if isinstance(col, int):
        return col
    if "_bl_lit" in getattr(col, "__dict__", {}):
        return int(col.__dict__["_bl_lit"])
    expr = col._jc.toString() if hasattr(col, "_jc") else str(col)
    m = re.search(r"(\d+)", expr)
    if not m:
        raise BloblangError(f"expected a literal int argument, got {expr}")
    return int(m.group(1))


def _lit_str(col: Column) -> str:
    """Extract a python string from a literal Column arg (hash/encode
    algorithm selectors must be compile-time constants)."""
    if "_bl_lit" in col.__dict__:
        return col.__dict__["_bl_lit"]
    expr = col._jc.toString() if hasattr(col, "_jc") else str(col)
    m = re.match(r"^'?\"?([A-Za-z0-9_]+)", expr.strip())
    if not m:
        raise BloblangError(f"expected a literal string argument, got {expr}")
    return m.group(1)


def _hash(c: Column, alg: Column) -> Column:
    name = _lit_str(alg).lower()
    if name == "md5":
        return F.md5(c.cast("binary"))
    if name in ("sha256", "sha2"):
        return F.sha2(c.cast("binary"), 256)
    if name == "sha512":
        return F.sha2(c.cast("binary"), 512)
    if name == "crc32":
        return F.crc32(c.cast("binary"))
    if name == "xxhash64":
        return F.xxhash64(c)
    raise BloblangError(f"unsupported hash algorithm {name}")


def _encode(c: Column, scheme: Column) -> Column:
    # schemes per methods_strings.go encode:93 (base64/base64url/
    # base64rawurl/hex/ascii85). The base64 family stays pure Catalyst:
    # URL-safe is a character translation of standard base64 (RFC 4648),
    # raw-url additionally strips padding. ascii85 has no JVM builtin and
    # is a codec (not a hot-path expression), so it runs as an
    # Arrow-batched pandas UDF.
    name = _lit_str(scheme).lower()
    if name == "base64":
        return _b64(c.cast("binary"))
    if name == "base64url":
        return F.translate(_b64(c.cast("binary")), "+/", "-_")
    if name == "base64rawurl":
        return F.regexp_replace(F.translate(_b64(c.cast("binary")), "+/", "-_"), "=+$", "")
    if name == "hex":
        return F.hex(c.cast("binary"))
    if name == "ascii85":
        return _ascii85_encode(c.cast("binary"))
    raise BloblangError(f"unsupported encode scheme {name}")


def _decode(c: Column, scheme: Column) -> Column:
    # try_to_binary, not unbase64/unhex: malformed input must NULL the row
    # (the `.catch()` / error-protocol contract), where the strict builtins
    # abort the whole job under ANSI mode (Spark 4 default)
    name = _lit_str(scheme).lower()
    if name == "base64":
        return F.try_to_binary(c, F.lit("base64"))
    if name in ("base64url", "base64rawurl"):
        # base64 decoding tolerates missing padding, so one decoder covers both
        return F.try_to_binary(F.translate(c, "-_", "+/"), F.lit("base64"))
    if name == "hex":
        return F.try_to_binary(c, F.lit("hex"))
    if name == "ascii85":
        return _ascii85_decode(c)
    raise BloblangError(f"unsupported decode scheme {name}")


# codec pandas UDFs are created lazily (pandas_udf parses its return-type
# DDL against the active session, so decorating at import time fails before
# a SparkSession exists)


def _ascii85_encode(c: Column) -> Column:
    @pandas_udf("string")
    def enc(s: pd.Series) -> pd.Series:
        import base64 as _b64

        return s.map(lambda b: None if b is None else _b64.a85encode(bytes(b)).decode("ascii"))

    return enc(c)


def _ascii85_decode(c: Column) -> Column:
    @pandas_udf("binary")
    def dec(s: pd.Series) -> pd.Series:
        import base64 as _b64lib

        def one(t):
            if t is None:
                return None
            try:
                return _b64lib.a85decode(t)
            except ValueError:
                return None  # malformed input NULLs the row (catch protocol)

        return s.map(one)

    return dec(c)


def _yaml_to_json(c: Column) -> Column:
    @pandas_udf("string")
    def conv(s: pd.Series) -> pd.Series:
        import json as _json

        import yaml as _yaml

        def one(t):
            if t is None:
                return None
            try:
                return _json.dumps(_yaml.safe_load(t), sort_keys=False)
            except _yaml.YAMLError:
                return None  # malformed YAML NULLs the row (catch protocol)

        return s.map(one)

    return conv(c)


def _msgpack_to_json(c: Column) -> Column:
    @pandas_udf("string")
    def conv(s: pd.Series) -> pd.Series:
        import json as _json

        from bento_spark.operators.msgpack_codec import mp_decode

        def one(b):
            if b is None:
                return None
            try:
                return _json.dumps(
                    mp_decode(bytes(b)),
                    sort_keys=False,
                    default=lambda o: o.decode("utf-8", "replace")
                    if isinstance(o, (bytes, bytearray))
                    else str(o),
                )
            except ValueError:
                return None  # malformed blob NULLs the row (catch protocol)

        return s.map(one)

    return conv(c)


def _json_to_msgpack(c: Column) -> Column:
    @pandas_udf("binary")
    def conv(s: pd.Series) -> pd.Series:
        import json as _json

        from bento_spark.operators.msgpack_codec import mp_encode

        return s.map(lambda t: None if t is None else mp_encode(_json.loads(t)))

    return conv(c)


def _changelog_diff(a: Column, b: Column) -> Column:
    @pandas_udf("string")
    def conv(sa: pd.Series, sb: pd.Series) -> pd.Series:
        import json as _json

        from bento_spark.functions.changelog import diff_values

        def one(x, y):
            av = None if x is None else _json.loads(x)
            bv = None if y is None else _json.loads(y)
            return _json.dumps(diff_values(av, bv))

        return pd.Series([one(x, y) for x, y in zip(sa, sb)])

    return conv(a, b)


def _changelog_patch(c: Column, cl: Column) -> Column:
    @pandas_udf("string")
    def conv(sv: pd.Series, scl: pd.Series) -> pd.Series:
        import json as _json

        from bento_spark.functions.changelog import patch_values

        def one(x, y):
            if x is None:
                return None  # bloblang.go: nil input passes through
            try:
                changes = [] if y is None else _json.loads(y)
                return _json.dumps(patch_values(_json.loads(x), changes))
            except (ValueError, KeyError, IndexError):
                return None  # malformed changelog NULLs the row (catch)

        return pd.Series([one(x, y) for x, y in zip(sv, scl)])

    return conv(c, cl)


def _json_to_yaml(c: Column) -> Column:
    @pandas_udf("string")
    def conv(s: pd.Series) -> pd.Series:
        import json as _json

        import yaml as _yaml

        return s.map(
            lambda t: None
            if t is None
            else _yaml.safe_dump(_json.loads(t), sort_keys=False, default_flow_style=False)
        )

    return conv(c)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def compile_expr(src: str) -> Column:
    """Compile a single Bloblang expression to a Column."""
    p = _Parser(src)
    col = p.parse_expr()
    if p.peek().kind != "eof":
        t = p.peek()
        raise BloblangError(f"trailing input at {t.pos}: {t.text!r}")
    return col


_INTERP_RE = re.compile(r"\$\{!\s*(.*?)\s*\}")


def compile_interpolated(src: str) -> Column:
    """Compile an interpolated config string — literal text with embedded
    `${! <expr> }` segments (reference
    internal/bloblang/field/expression.go:19) — to ONE string Column:
    F.concat of literal pieces and compiled expressions. A string with no
    interpolation compiles to a plain literal, so static fields cost
    nothing."""
    parts: list[Column] = []
    last = 0
    for m in _INTERP_RE.finditer(src):
        if m.start() > last:
            parts.append(F.lit(src[last : m.start()]))
        # NULL segments render as "null" (reference field interpolation
        # renders null values, never nulls the whole string) — otherwise
        # F.concat would NULL the entire field and e.g. a NULL in an error
        # message would silently unflag the row (DLQ bypass).
        parts.append(F.coalesce(compile_expr(m.group(1)).cast("string"), F.lit("null")))
        last = m.end()
    if last == 0:
        return F.lit(src)
    if last < len(src):
        parts.append(F.lit(src[last:]))
    return parts[0] if len(parts) == 1 else F.concat(*parts)


@dataclass
class CompiledMapping:
    # ordered statements, executed in source order exactly like the
    # reference executor (mapping/executor.go:115-209): each entry is
    # ("assign", name, Column) or ("remap", [(name, Column), ...])
    statements: list[tuple]
    filter_keep: Column | None  # None = keep all
    meta: list[tuple[str, Column]]

    @property
    def assignments(self) -> list[tuple[str, Column]]:
        return [(s[1], s[2]) for s in self.statements if s[0] == "assign"]

    def apply(self, df: DataFrame) -> DataFrame:
        if self.filter_keep is not None:
            df = df.filter(self.filter_keep)
        for st in self.statements:
            if st[0] == "remap":
                # root = {...}: the object IS the new row (executor.go root
                # reassignment) — a plain SELECT, so Catalyst prunes the
                # scan to the referenced source columns. Assignments BEFORE
                # it are visible inside (they ran), ones after extend it —
                # source order, as in the reference. The reference keeps a
                # message's error flag and metadata OUTSIDE the document, so
                # a root reassignment never clears them — carry `error` and
                # `meta` through unless the remap sets them explicitly
                # (dropping `error` here would silently unflag errored rows
                # past the DLQ split).
                names = {name for name, _ in st[1]}
                # request_id is the sync_response routing key (engine
                # metadata like error/meta — rides outside the document)
                carried = [c for c in ("error", "meta", "request_id")
                           if c in df.columns and c not in names]
                df = df.select(*[col.alias(name) for name, col in st[1]], *carried)
                continue
            _, name, col = st
            if "." in name:
                # nested target root.a.b = expr -> struct-field update
                # (assignment.go nested paths); withField handles deeper
                # nesting via its dotted name form
                top, _, rest = name.partition(".")
                df = df.withColumn(top, F.col(top).withField(rest, col))
            else:
                df = df.withColumn(name, col)
        for k, v in self.meta:
            if "meta" in df.columns:
                df = df.withColumn(
                    "meta", F.map_concat(F.col("meta"), F.create_map(F.lit(k), v.cast("string")))
                )
            else:
                df = df.withColumn("meta", F.create_map(F.lit(k), v.cast("string")))
        return df


_DELETED_IF_RE = re.compile(r"^\s*root\s*=\s*(?:deleted\(\)\s+if|if)\s+(.*?)\s*\{\s*deleted\(\)\s*\}\s*$")


def compile_mapping(src: str) -> CompiledMapping:
    """Compile a full mapping (one statement per line) mirroring the
    executor semantics of mapping/executor.go:115-209: ordered assignments,
    root-deletion = filter, meta assignment, root = {...} remap.

    Documented deviation: after `root = {...}`, `this.` resolves against
    the REMAPPED row (the reference keeps `this` bound to the original
    input document for the whole mapping). In a typed columnar engine the
    remap is a projection; keep any source fields you still need as remap
    fields."""
    statements: list[tuple] = []
    meta: list[tuple[str, Column]] = []
    filter_keep: Column | None = None

    # join continuation lines (statement per line in our subset, except the
    # multi-line `root = { ... }` object form)
    lines = list(src.splitlines())
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line or line.startswith("#"):
            continue
        m = _DELETED_IF_RE.match(line)
        if m or line.startswith("root = deleted() if "):
            cond_src = m.group(1) if m else line[len("root = deleted() if ") :]
            drop = compile_expr(cond_src)
            keep = ~F.coalesce(drop, F.lit(False))
            filter_keep = keep if filter_keep is None else (filter_keep & keep)
            continue
        if line.startswith("root = {"):
            # full remap: accumulate lines until braces balance, then parse
            # the object body as `"name": expr` pairs
            body = line[len("root = ") :]
            while body.count("{") > body.count("}") and i < len(lines):
                body += "\n" + lines[i]
                i += 1
            statements.append(("remap", _parse_object(body)))
            continue
        if line.startswith("meta "):
            body = line[len("meta ") :]
            k, _, expr_src = body.partition("=")
            meta.append((k.strip(), compile_expr(expr_src.strip())))
            continue
        if line.startswith("root."):
            target, _, expr_src = line.partition("=")
            name = target.strip()[len("root.") :]
            statements.append(("assign", name, compile_expr(expr_src.strip())))
            continue
        if line.startswith("root =") or line.startswith("root="):
            # scalar root assignment: the expression becomes the message
            # CONTENT (the reference's `root = <expr>` replaces the whole
            # document; our content column is `bytes` — content() reads it)
            _, _, expr_src = line.partition("=")
            statements.append(("assign", "bytes", compile_expr(expr_src.strip())))
            continue
        raise BloblangError(f"unsupported statement: {line!r}")
    return CompiledMapping(statements, filter_keep, meta)


def _parse_object(src: str) -> list[tuple[str, Column]]:
    """Parse `{ "name": expr, ... }` into ordered (name, Column) pairs."""
    p = _Parser(src)
    p.expect("{")
    fields: list[tuple[str, Column]] = []
    while p.peek().text != "}":
        t = p.next()
        if t.kind == "string":
            name = _unquote(t.text)
        elif t.kind == "name":
            name = t.text
        else:
            raise BloblangError(f"object key must be a name or string, got {t.text!r} at {t.pos}")
        p.expect(":")
        fields.append((name, p.parse_expr()))
        if p.peek().text == ",":
            p.next()
    p.expect("}")
    if p.peek().kind != "eof":
        raise BloblangError(f"trailing input after object at {p.peek().pos}")
    if not fields:
        raise BloblangError("root = {} would drop every column; use deleted() to drop rows")
    return fields
