"""Executed-plan assertions for the round-4 operators: the yq classics
must broadcast their dims and keep exactly the planned fact shuffles,
and the curation family must stay JVM-side (no Python eval nodes) with
no cartesian products outside sanctioned broadcast-of-scalar forms.
Same criteria as tests/test_scale_physical.py (AQE final plans)."""

from __future__ import annotations

import re

import pytest

from spotify_tags_etl_spark.plans.registry import get


def _executed_plan(df) -> str:
    df.count()  # force AQE final plan
    return df._jdf.queryExecution().executedPlan().toString()


def _plan(spark, sf_dir, name) -> str:
    return _executed_plan(get(name).builder(spark, sf_dir))


@pytest.mark.parametrize(
    "name,min_broadcast",
    [
        ("yq08_market_share", 2),   # market dim + home-region row
        ("yq09_product_profit", 3), # part + supplier + nation
        ("yq16_supplier_relationship", 2),  # part dim + blacklist anti
    ],
)
def test_yq_dims_broadcast(spark, sf_dir, name, min_broadcast):
    plan = _plan(spark, sf_dir, name)
    assert plan.count("BroadcastHashJoin") >= min_broadcast, plan


def test_yq21_no_fact_self_join(spark, sf_dir):
    """Q21's double-EXISTS must be two co-keyed aggregates — the plan
    may join the AGGREGATED frames but never two raw lineitem scans."""
    plan = _plan(spark, sf_dir, "yq21_sole_return_supplier")
    # EXACTLY one scan of lineitem (the per-(order,supp) rollup feeds both
    # window branches from a single pass); a second scan IS the raw fact
    # self-join shape this test exists to forbid.
    assert len(re.findall(r"FileScan parquet.*lineitem", plan)) <= 1, plan


@pytest.mark.parametrize(
    "name",
    [
        "ya01_ngram_novelty",
        "yt01_containment_dedup",
        "yw01_lateness_audit",
        "yq02_min_cost_supplier",
        "yq11_important_stock",
        "yq20_majority_share_suppliers",
        "yn01_contrastive_negatives",
        "yr01_daily_corr",
        "yk01_knn_holdout_eval",
    ],
)
def test_round4_no_python_nodes(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


@pytest.mark.parametrize(
    "name",
    ["ya01_ngram_novelty", "yt01_containment_dedup", "yw01_lateness_audit"],
)
def test_round4_no_cartesian(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan


def test_yw01_window_is_per_key(spark, sf_dir):
    """The lateness window must partition by user_id — a global-order
    window here would be the exact single-reducer shape scalerank
    exists to avoid."""
    plan = _plan(spark, sf_dir, "yw01_lateness_audit")
    assert "SinglePartition" not in plan, plan
