"""Property tests for the unified Cypher expression compiler
(cypher/exprs.py, the r8-verdict Pratt-parser milestone).

Two layers:

1. hypothesis round-trips — randomly generated expression trees render
   to Cypher text and must COMPILE cleanly (full-input consumption, no
   ladder-ordering dependence) regardless of nesting position;
2. a seeded differential batch — 150 generated trees evaluate in ONE
   Spark job and every value must equal the Python-model evaluation
   (arithmetic, booleans, CASE, lists, subscripts/slices, comprehensions,
   reduce, quantifiers, string concat, scalar calls — each allowed to
   nest inside any other).

Plus pinned precedence/associativity cases the fully-parenthesized
generators can't exercise.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docker_neo4j_spark.cypher.exprs import compile_expr


def _raising_resolver(name: str):
    raise AssertionError(f"closed expression resolved a name: {name!r}")


# ---- expression-tree model ------------------------------------------------
# node := (kind, *children); render() emits Cypher text (parenthesized, so
# value checks are precedence-independent); ev() is the Python model.

_STR_ALPHABET = "abxyz XY_0"


def _gen(rng: random.Random, depth: int, want: str):
    """Random typed expression tree: want ∈ {'int', 'bool', 'str', 'list'}."""
    if depth <= 0:
        if want == "int":
            return ("int", rng.randint(-50, 50))
        if want == "bool":
            return ("bool", rng.random() < 0.5)
        if want == "str":
            return ("str", "".join(rng.choice(_STR_ALPHABET) for _ in range(rng.randint(0, 5))))
        return ("list", [rng.randint(-9, 9) for _ in range(rng.randint(1, 5))])
    d = depth - 1
    if want == "int":
        k = rng.choice(
            ["int", "add", "sub", "mul", "mod", "neg", "case", "idx", "reduce",
             "size", "abs", "mapidx"]
        )
        if k == "int":
            return ("int", rng.randint(-50, 50))
        if k in ("add", "sub", "mul"):
            return (k, _gen(rng, d, "int"), _gen(rng, d, "int"))
        if k == "mod":
            # both operands non-negative: Spark's % takes the dividend's
            # sign (Java), Python the divisor's — same only when both ≥ 0
            return ("mod", ("abs", _gen(rng, d, "int")), ("int", rng.randint(1, 9)))
        if k == "neg":
            return ("neg", _gen(rng, d, "int"))
        if k == "case":
            return ("case", _gen(rng, d, "bool"), _gen(rng, d, "int"), _gen(rng, d, "int"))
        if k == "idx":
            lst = _gen(rng, d, "list")
            n = len(_ev(lst))
            if n == 0:  # a comprehension/slice can filter down to empty
                lst = ("list", [rng.randint(-9, 9) for _ in range(rng.randint(1, 5))])
                n = len(_ev(lst))
            return ("idx", lst, rng.randint(-n, n - 1))
        if k == "reduce":
            return ("reduce", _gen(rng, d, "list"))
        if k == "size":
            return ("size", _gen(rng, d, "str"))
        if k == "mapidx":
            keys = ["ka", "kb", "kc"][: rng.randint(1, 3)]
            return (
                "mapidx",
                {kk: _gen(rng, d, "int") for kk in keys},
                rng.choice(keys),
            )
        return ("abs", _gen(rng, d, "int"))
    if want == "bool":
        k = rng.choice(["bool", "cmp", "and", "or", "xor", "not", "quant", "strcmp", "inlist"])
        if k == "bool":
            return ("bool", rng.random() < 0.5)
        if k == "cmp":
            op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
            return ("cmp", op, _gen(rng, d, "int"), _gen(rng, d, "int"))
        if k == "strcmp":
            # ASCII-only alphabet: Spark's UTF8 binary compare == Python's
            # code-point compare
            op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
            return ("cmp", op, _gen(rng, d, "str"), _gen(rng, d, "str"))
        if k == "inlist":
            return ("inlist", _gen(rng, d, "int"), [rng.randint(-9, 9) for _ in range(rng.randint(1, 4))])
        if k in ("and", "or", "xor"):
            return (k, _gen(rng, d, "bool"), _gen(rng, d, "bool"))
        if k == "not":
            return ("not", _gen(rng, d, "bool"))
        return ("quant", rng.choice(["all", "any", "none", "single"]), _gen(rng, d, "list"), rng.randint(-5, 5))
    if want == "str":
        k = rng.choice(["str", "concat", "upper", "casestr"])
        if k == "str":
            return ("str", "".join(rng.choice(_STR_ALPHABET) for _ in range(rng.randint(0, 5))))
        if k == "concat":
            return ("concat", _gen(rng, d, "str"), _gen(rng, d, "str"))
        if k == "upper":
            return ("upper", _gen(rng, d, "str"))
        return ("case", _gen(rng, d, "bool"), _gen(rng, d, "str"), _gen(rng, d, "str"))
    # list
    k = rng.choice(["list", "slice", "comp"])
    if k == "list":
        return ("list", [rng.randint(-9, 9) for _ in range(rng.randint(1, 5))])
    if k == "slice":
        lst = _gen(rng, d, "list")
        n = len(_ev(lst))
        a = rng.randint(0, n)
        return ("slice", lst, a, rng.randint(a, n))
    # parity 0 only: Spark's % takes the dividend's sign, Python the
    # divisor's, so `x % 2 = 1` would diverge on negative elements
    return ("comp", _gen(rng, d, "list"), 0)


def _render(e) -> str:
    k = e[0]
    if k == "int":
        return str(e[1])
    if k == "bool":
        return "true" if e[1] else "false"
    if k == "str":
        return f"'{e[1]}'"
    if k == "list":
        return "[" + ", ".join(str(x) for x in e[1]) + "]"
    if k in ("add", "sub", "mul", "mod"):
        op = {"add": "+", "sub": "-", "mul": "*", "mod": "%"}[k]
        return f"({_render(e[1])} {op} {_render(e[2])})"
    if k == "neg":
        return f"(-{_render(e[1])})"
    if k == "cmp":
        return f"({_render(e[2])} {e[1]} {_render(e[3])})"
    if k in ("and", "or", "xor"):
        return f"({_render(e[1])} {k.upper()} {_render(e[2])})"
    if k == "not":
        return f"(NOT {_render(e[1])})"
    if k == "case":
        return f"CASE WHEN {_render(e[1])} THEN {_render(e[2])} ELSE {_render(e[3])} END"
    if k == "idx":
        return f"{_render(e[1])}[{e[2]}]"
    if k == "slice":
        return f"{_render(e[1])}[{e[2]}..{e[3]}]"
    if k == "comp":
        return f"[x IN {_render(e[1])} WHERE x % 2 = {e[2]} | x * 2]"
    if k == "reduce":
        return f"reduce(acc = 0, x IN {_render(e[1])} | acc + x)"
    if k == "quant":
        return f"{e[1]}(x IN {_render(e[2])} WHERE x > {e[3]})"
    if k == "inlist":
        return f"({_render(e[1])} IN [{', '.join(str(x) for x in e[2])}])"
    if k == "mapidx":
        body = ", ".join(f"{kk}: {_render(v)}" for kk, v in e[1].items())
        return f"{{{body}}}['{e[2]}']"
    if k == "concat":
        return f"({_render(e[1])} + {_render(e[2])})"
    if k == "upper":
        return f"toUpper({_render(e[1])})"
    if k == "size":
        return f"size({_render(e[1])})"
    if k == "abs":
        return f"abs({_render(e[1])})"
    raise AssertionError(k)


def _ev(e):
    k = e[0]
    if k in ("int", "bool", "str", "list"):
        return e[1]
    if k == "add":
        return _ev(e[1]) + _ev(e[2])
    if k == "sub":
        return _ev(e[1]) - _ev(e[2])
    if k == "mul":
        return _ev(e[1]) * _ev(e[2])
    if k == "mod":
        return _ev(e[1]) % _ev(e[2])
    if k == "neg":
        return -_ev(e[1])
    if k == "cmp":
        a, b = _ev(e[2]), _ev(e[3])
        return {
            "=": a == b,
            "<>": a != b,
            "<": a < b,
            "<=": a <= b,
            ">": a > b,
            ">=": a >= b,
        }[e[1]]
    if k == "and":
        return _ev(e[1]) and _ev(e[2])
    if k == "or":
        return _ev(e[1]) or _ev(e[2])
    if k == "xor":
        return _ev(e[1]) != _ev(e[2])
    if k == "not":
        return not _ev(e[1])
    if k == "case":
        return _ev(e[2]) if _ev(e[1]) else _ev(e[3])
    if k == "idx":
        return _ev(e[1])[e[2]]
    if k == "slice":
        return _ev(e[1])[e[2] : e[3]]
    if k == "comp":
        return [x * 2 for x in _ev(e[1]) if x % 2 == e[2]]
    if k == "reduce":
        return sum(_ev(e[1]))
    if k == "quant":
        vals, thr = _ev(e[2]), e[3]
        hits = [x for x in vals if x > thr]
        return {
            "all": len(hits) == len(vals),
            "any": bool(hits),
            "none": not hits,
            "single": len(hits) == 1,
        }[e[1]]
    if k == "inlist":
        return _ev(e[1]) in e[2]
    if k == "mapidx":
        return _ev(e[1][e[2]])
    if k == "concat":
        return _ev(e[1]) + _ev(e[2])
    if k == "upper":
        return _ev(e[1]).upper()
    if k == "size":
        return len(_ev(e[1]))
    if k == "abs":
        return abs(_ev(e[1]))
    raise AssertionError(k)


# ---- layer 1: hypothesis compile round-trips ------------------------------


@given(st.integers(min_value=0, max_value=10**9), st.sampled_from(["int", "bool", "str", "list"]))
@settings(max_examples=200, deadline=None)
def test_generated_expressions_compile(spark, seed, want):
    """Every generated tree, rendered to Cypher, compiles with full input
    consumption — no construct depends on being the OUTERMOST shape."""
    rng = random.Random(seed)
    e = _gen(rng, rng.randint(1, 4), want)
    compile_expr(_render(e), _raising_resolver)


# ---- layer 2: seeded differential batch (one Spark job) -------------------


def test_expression_values_match_python_model(spark):
    rng = random.Random(20260815)
    trees = []
    for i in range(150):
        want = ("int", "bool", "str", "list")[i % 4]
        trees.append(_gen(rng, rng.randint(1, 4), want))
    cols = [
        compile_expr(_render(t), _raising_resolver).alias(f"e{i}")
        for i, t in enumerate(trees)
    ]
    row = spark.range(1).select(cols).collect()[0]
    for i, t in enumerate(trees):
        got, want = row[f"e{i}"], _ev(t)
        assert got == want, f"{_render(t)!r}: spark={got!r} python={want!r}"


# ---- pinned precedence / associativity ------------------------------------


@pytest.mark.parametrize(
    "src,expected",
    [
        ("1 + 2 * 3", 7),
        ("(1 + 2) * 3", 9),
        ("10 - 4 - 3", 3),          # left-associative
        ("20 % 7 % 4", 2),
        ("2 + 3 * 4 - 5", 9),
        ("-3 + 5", 2),
        ("2 ^ 3 ^ 2", 512.0),       # right-associative power
        ("-2 ^ 2", -4.0),           # unary minus binds looser than ^
        ("1 + 2 = 3", True),        # arithmetic before comparison
        ("true OR false AND false", True),   # AND before OR
        ("NOT true AND false", False),       # NOT before AND
        ("true XOR true OR true", True),     # XOR before OR
        ("false XOR true AND true", True),   # AND before XOR
        ("'a' + 'b' + 1", "ab1"),   # string + chains as concat
        ("1 + 2 IN [3, 4]", True),  # arithmetic before IN
        ("5 NOT IN [1, 2]", True),
        ("[1, 2, 3][1..3][0]", 2),  # postfix chains left-to-right
        ("size('ab') + size('xyz')", 5),
        ("'WHERE' + ' ' + 'AND'", "WHERE AND"),  # keywords in literals
    ],
)
def test_pinned_precedence(spark, src, expected):
    got = spark.range(1).select(compile_expr(src, _raising_resolver).alias("v")).collect()[0]["v"]
    assert got == expected, f"{src!r} -> {got!r}"
