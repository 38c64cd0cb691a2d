"""Bench harness contract: every suite name must resolve in the registry.

The driver records BENCH_r{N}.json from one bench.py run per round; a
query renamed by the zv_ rotation (or removed) would otherwise silently
drop out of `names` and the suite totals would shrink without any error
— round-over-round comparisons would read as a speedup. Pin the full
suite membership here so a rotation/refactor breaks a test instead of
the benchmark's meaning.
"""

from __future__ import annotations

import bench
from spotify_tags_etl_spark.plans import registry


def test_every_bench_suite_name_resolves():
    queries = registry.all_queries()
    for suite in (bench.HEADLINE, bench.LLM_SUITE, bench.STREAMING_SUITE, bench.CLASSICS_SUITE, bench.ANALYTICS_SUITE, bench.CURATION_SUITE, bench.MINING_SUITE):
        for name in suite:
            assert registry.resolve(name) in queries, f"bench suite entry {name!r} lost"


def test_suites_are_disjoint_and_nonempty():
    suites = [bench.HEADLINE, bench.LLM_SUITE, bench.STREAMING_SUITE, bench.CLASSICS_SUITE, bench.ANALYTICS_SUITE, bench.CURATION_SUITE, bench.MINING_SUITE]
    all_names = [n for s in suites for n in s]
    assert all(len(s) > 0 for s in suites)
    assert len(all_names) == len(set(all_names))
