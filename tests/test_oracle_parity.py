"""Every registered query with an oracle must hash-match DuckDB (driver's t2 gate)."""

from __future__ import annotations

import pytest

from spotify_tags_etl_spark.plans import registry
from tests.oracle_harness import run_parity

_QUERIES = registry.all_queries()
_ORACLES = registry.all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    run_parity(spark, sf_dir, name, _QUERIES[name], _ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
