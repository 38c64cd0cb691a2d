"""Physical-plan regression ratchet: every benched batch query's
executed plan must not get WORSE than tools/plans_snapshot.json on any
audited metric (shuffle exchanges, single-partition exchanges, Python
eval nodes, cartesian products, sort-merge joins). Improvements pass;
ratchet the snapshot down with ``python tools/plan_audit.py --write``
after an intentional improvement.

One test per query so a regression names its query directly.
"""

from __future__ import annotations

import json
import os

import pytest

_SNAP_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "plans_snapshot.json")
_SNAP = json.load(open(_SNAP_PATH))["plans"]


@pytest.mark.parametrize("name", sorted(_SNAP))
def test_plan_not_worse_than_snapshot(spark, sf_dir, name):
    from spotify_tags_etl_spark.plans import registry
    from tools.plan_audit import fingerprint

    queries = registry.all_queries()
    key = registry.resolve(name)
    if key not in queries:
        pytest.skip(f"{name} no longer registered")
    cur = fingerprint(queries[key](spark, sf_dir))
    base = _SNAP[name]
    worse = {m: (base.get(m, 0), v) for m, v in cur.items() if v > base.get(m, 0)}
    assert not worse, f"{name}: plan regressed: {worse}"
