"""Property-based test for zaops.quantile_drift_from_summaries — the
summary-side half shared by za03 (batch) and zb02 (streaming).

The oracle-parity tests pin it on the events fixture; this pins it on
ADVERSARIAL histograms (duplicate cents across shards, single-row
shards, heavy skew, negative cents) against a pure-Python rank-select
reference implementing the same definition: the q-quantile of a shard
is the smallest cents value whose inclusive cumulative count reaches
q/1000 of the shard total.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_tags_etl_spark.operators.zaops import (
    ZA03_QS,
    quantile_drift_from_summaries,
)

# (shard, cents, count) cells; shards 0..2, cents −5..5, count 1..50.
_CELLS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=-5, max_value=5),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _rank_select(hist: dict[int, int], q: int) -> int:
    n = sum(hist.values())
    cum = 0
    for cents in sorted(hist):
        cum += hist[cents]
        if 1000 * cum >= q * n:
            return cents
    raise AssertionError("unreachable: q <= 1000")


def _reference(cells):
    shards: dict[int, dict[int, int]] = {}
    glob: dict[int, int] = {}
    for s, c, n in cells:
        shards.setdefault(s, {})[c] = shards.get(s, {}).get(c, 0) + n
        glob[c] = glob.get(c, 0) + n
    out = []
    for q in ZA03_QS:
        g = _rank_select(glob, q)
        per = [_rank_select(h, q) for h in shards.values()]
        out.append((q, g, min(per), max(per), max(g - min(per), max(per) - g)))
    return out


@given(cells=_CELLS)
@settings(**_SETTINGS)
def test_quantile_drift_matches_brute_force(spark, cells):
    hs = spark.createDataFrame(
        [(s, c, n) for s, c, n in cells], "shard long, cents long, c long"
    )
    got = [
        tuple(r)
        for r in quantile_drift_from_summaries(spark, hs)
        .orderBy("q_permille")
        .collect()
    ]
    assert got == _reference(cells)
