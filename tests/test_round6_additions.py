"""Structural invariants for the late round-6 ops (yv10/yv14/yv15).

Oracle parity at sf0.001 is covered by test_oracle_parity.py's registry
parametrization; these pin the algorithmic claims the docstrings make.
"""

from __future__ import annotations

import re

from spotify_tags_etl_spark.operators.ycuration import YV15_BLOCKLIST, yv15
from spotify_tags_etl_spark.operators.yrlhf import YV14_CLASSES, yv14
from spotify_tags_etl_spark.operators.ytrain import YV10_ROUNDS, yv10
from spotify_tags_etl_spark.sources.tpch import load_table

_SYM = re.compile(r"^[a-z]+$")


def test_yv10_merge_table_shape(spark, sf_dir):
    rows = yv10(spark, sf_dir).collect()
    assert [r.round for r in rows] == list(range(1, YV10_ROUNDS + 1))
    # symbols are alphabetic concatenations (the injection-safety invariant
    # the literal-embedding merge fold relies on)
    for r in rows:
        assert _SYM.match(r.pa) and _SYM.match(r.pb)
        assert r.pair_count > 0
    # the selected pair count never increases round-over-round: merging
    # (a,b) -> ab only shrinks existing pair counts, and any NEW pair
    # (x,ab)/(ab,y) inherits at most the replaced pair's count
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    # later rules may reference merged symbols; round 1 must be two chars
    assert len(rows[0].pa) == 1 and len(rows[0].pb) == 1


def test_yv14_consensus_partitions_items(spark, sf_dir):
    rows = yv14(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_items for r in rows) == n_events
    for r in rows:
        assert 0 <= r.winner < YV14_CLASSES
        assert 0 <= r.n_majority <= r.n_items
        assert r.majority_ppm == r.n_majority * 1_000_000 // r.n_items


def test_yv15_gate_decision_is_consistent(spark, sf_dir):
    rows = yv15(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    blocked = {r.source for r in rows if r.blocklisted}
    assert blocked == set(YV15_BLOCKLIST)
    for r in rows:
        assert 0 < r.mean_ttr_pm <= 1000
        assert r.keep == int(not r.blocklisted and not r.low_quality)
