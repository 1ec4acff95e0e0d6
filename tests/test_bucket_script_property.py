"""Property test: the bucket_script arithmetic compiler vs a Python
reference evaluator — random expression trees over buckets_path
variables and integer literals must produce identical Q20-floored
results (both sides are IEEE doubles with the same left-associative
op order; division by zero is NULL on both)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pycasselastic_spark.operators.search_compose import (
    _parse_bucket_script,
)

_VARS = {"a": 7, "b": 3, "n": 12}

_leaf = st.one_of(
    st.sampled_from(sorted(_VARS)).map(lambda v: ("var", v)),
    st.integers(0, 9).map(lambda x: ("lit", x)),
)


def _trees(depth):
    if depth == 0:
        return _leaf
    sub = _trees(depth - 1)
    return st.one_of(
        _leaf,
        st.tuples(st.sampled_from(["+", "-", "*", "/"]), sub, sub),
        st.tuples(st.just("neg"), sub),
        st.tuples(st.just("paren"), sub),
    )


def _render(node):
    kind = node[0]
    if kind == "var":
        return f"params.{node[1]}"
    if kind == "lit":
        return str(node[1])
    if kind == "neg":
        # parenthesize the operand: unary minus binds TIGHTER than
        # binary ops, so "-X" with a compound X would re-associate
        # (hypothesis caught exactly this on '-(a) + (a)')
        return f"-({_render(node[1])})"
    if kind == "paren":
        return f"({_render(node[1])})"
    op, l, r = node
    # parenthesize both sides so the rendered text's structure IS the
    # tree (the compiler's own precedence is exercised by the flat
    # leaves and the paren/neg cases)
    return f"({_render(l)}) {op} ({_render(r)})"


def _eval_ref(node):
    kind = node[0]
    if kind == "var":
        return float(_VARS[node[1]])
    if kind == "lit":
        return float(node[1])
    if kind == "neg":
        v = _eval_ref(node[1])
        return None if v is None else -v
    if kind == "paren":
        return _eval_ref(node[1])
    op, l, r = node
    lv, rv = _eval_ref(l), _eval_ref(r)
    if lv is None or rv is None:
        return None
    if op == "+":
        return lv + rv
    if op == "-":
        return lv - rv
    if op == "*":
        return lv * rv
    return None if rv == 0.0 else lv / rv


@pytest.fixture(scope="module")
def bucket_row(spark):
    return spark.createDataFrame(
        [tuple(_VARS[k] for k in sorted(_VARS))],
        ", ".join(f"{k} long" for k in sorted(_VARS)),
    )


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=_trees(3))
def test_bucket_script_matches_reference_evaluator(bucket_row, tree):
    script = _render(tree)
    col = _parse_bucket_script(script, {v: v for v in _VARS})
    got = bucket_row.select(
        F.floor(col * (1 << 20)).cast("long").alias("r")
    ).collect()[0]["r"]
    ref = _eval_ref(tree)
    exp = None if ref is None else math.floor(ref * (1 << 20))
    assert got == exp, f"script={script!r} got={got} exp={exp}"
