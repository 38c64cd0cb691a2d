"""Doc-figure consistency — COVERAGE.md / PLANS.md counts are derived,
not hand-maintained.

Two figures drifted stale across rounds 6 and 7 because they were
hand-edited each time the registry grew: COVERAGE.md's header query
count and PLANS.md's batch-pin count. This test makes them mechanical:
each figure is grepped out of the doc and asserted equal to the live
source of truth (``registry.all_queries()`` / ``plans_snapshot.json``),
so growing the registry without updating the doc fails CI by name.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_coverage_header_matches_registry() -> None:
    from spotify_tags_etl_spark.plans import registry

    text = (ROOT / "COVERAGE.md").read_text()
    m = re.search(r"Registry index: (\d+) registered queries", text)
    assert m, "COVERAGE.md header lost its 'Registry index: N registered queries' line"
    assert int(m.group(1)) == len(registry.all_queries()), (
        f"COVERAGE.md says {m.group(1)} queries but the registry has "
        f"{len(registry.all_queries())} — update the COVERAGE.md header"
    )


def test_plans_pin_count_matches_snapshot() -> None:
    text = (ROOT / "PLANS.md").read_text()
    m = re.search(r"ALL (\d+) batch queries carry fingerprint\s+pins", text)
    assert m, "PLANS.md lost its 'ALL N batch queries carry fingerprint pins' line"
    snap = json.loads((ROOT / "tools" / "plans_snapshot.json").read_text())
    assert int(m.group(1)) == len(snap["plans"]), (
        f"PLANS.md says {m.group(1)} pinned plans but plans_snapshot.json has "
        f"{len(snap['plans'])} — update the PLANS.md figure"
    )
