"""Property-based tests for operators/scalerank.py.

The parquet-fixture tests pin the helpers on realistic data; these pin
them on ADVERSARIAL data — duplicates, negatives, skewed runs, empty-ish
frames — across partition counts, against pure-Python references. The
helpers' one precondition (order_cols is a total order) is satisfied by
ranking on (value, idx) with idx unique.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spotify_tags_etl_spark.operators.scalerank import (
    global_rank,
    ntile_expr,
    prefix_max,
    prefix_sum,
)

_VALS = st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60)
_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _frame(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "idx LONG, v LONG"
    )


@given(vals=_VALS, nparts=st.sampled_from([1, 2, 5]))
@settings(**_SETTINGS)
def test_global_rank_property(spark, vals, nparts):
    df = _frame(spark, vals)
    ranked, total = global_rank(
        df, [F.col("v").asc(), F.col("idx").asc()], rank_col="rk", num_partitions=nparts
    )
    got = {r.idx: r.rk for r in ranked.collect()}
    order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
    want = {idx: pos + 1 for pos, idx in enumerate(order)}
    assert total == len(vals)
    assert got == want


@given(vals=_VALS, nparts=st.sampled_from([1, 2, 5]))
@settings(**_SETTINGS)
def test_prefix_sum_property(spark, vals, nparts):
    df = _frame(spark, vals)
    out, total = prefix_sum(
        df, [F.col("idx").asc()], "v", sum_col="cs", num_partitions=nparts
    )
    got = {r.idx: r.cs for r in out.collect()}
    acc = 0
    want = {}
    for i, v in enumerate(vals):
        acc += v
        want[i] = acc
    assert total == sum(vals)
    assert got == want


@given(vals=_VALS, nparts=st.sampled_from([1, 2, 5]))
@settings(**_SETTINGS)
def test_prefix_max_property(spark, vals, nparts):
    df = _frame(spark, vals)
    out = prefix_max(
        df, [F.col("idx").asc()], "v", out_col="hm", num_partitions=nparts
    )
    got = {r.idx: r.hm for r in out.collect()}
    hi = None
    want = {}
    for i, v in enumerate(vals):
        hi = v if hi is None else max(hi, v)
        want[i] = hi
    assert got == want


@given(n=st.integers(min_value=1, max_value=200), k=st.integers(min_value=1, max_value=32))
@settings(max_examples=50, deadline=None)
def test_ntile_expr_closed_form_property(n, k):
    """Pure-arithmetic re-check of the ntile bucket map on a wide grid
    (no Spark needed: the expression's integer algebra evaluated in
    Python must reproduce literal NTILE semantics)."""
    q, m = divmod(n, k)
    big = m * (q + 1)
    ref = []
    for tile in range(1, k + 1):
        ref.extend([tile] * ((q + 1) if tile <= m else q))
    for r in range(1, n + 1):
        if q == 0:
            got = r
        elif r <= big:
            got = (r - 1) // (q + 1) + 1
        else:
            got = m + (r - big - 1) // q + 1
        assert got == ref[r - 1], (n, k, r)
