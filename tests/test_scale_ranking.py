"""operators/scalerank.py — the range-partitioned exact-rank machinery
that replaces single-reducer ORDER BY windows (round-3 verdict item 5).

Pins three things:
1. global_rank == row_number() over the single-reducer window, at
   several partition counts (boundary placement must not matter);
2. ntile_expr(rank) == F.ntile(k) over the same total order, for Ns
   that exercise N % k == 0, != 0, and N < k;
3. the xh01/xi04 executed plans contain NO single-partition Window —
   every window in the plan carries a partition spec.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spotify_tags_etl_spark.operators.scalerank import (
    global_rank,
    ntile_expr,
    tile_start,
)
from spotify_tags_etl_spark.sources.tpch import load_table


@pytest.mark.parametrize("num_partitions", [1, 3, 8])
def test_global_rank_matches_window_rank(spark, sf_dir, num_partitions):
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked, total = global_rank(
        orders, ["o_totalprice", "o_orderkey"], rank_col="rk", num_partitions=num_partitions
    )
    got = {r.o_orderkey: r.rk for r in ranked.collect()}
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {
        r.o_orderkey: r.rk
        for r in orders.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert total == len(want)
    assert got == want


@pytest.mark.parametrize("n,k", [(100, 16), (97, 16), (5, 16), (96, 16), (10, 10)])
def test_ntile_expr_matches_builtin_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id"))
    w = Window.orderBy("id")
    builtin = {r.id: r.t for r in df.withColumn("t", F.ntile(k).over(w)).collect()}
    via_rank = {
        r.id: r.t
        for r in df.withColumn("rk", F.row_number().over(w))
        .withColumn("t", ntile_expr("rk", n, k))
        .collect()
    }
    assert via_rank == builtin


@pytest.mark.parametrize("n,k", [(100, 16), (97, 16), (5, 16)])
def test_tile_start_matches_bucket_boundaries(spark, n, k):
    df = spark.range(n)
    w = Window.orderBy("id")
    tiled = (
        df.withColumn("rk", F.row_number().over(w))
        .withColumn("t", F.ntile(k).over(w))
    )
    # min rank within each tile must equal tile_start + 1
    starts = {
        r.t: r.mn
        for r in tiled.groupBy("t").agg(F.min("rk").alias("mn")).collect()
    }
    check = {
        r.t: r.st
        for r in tiled.select("t").distinct().withColumn(
            "st", tile_start(n, k, "t")
        ).collect()
    }
    for t, mn in starts.items():
        assert check[t] + 1 == mn, (t, mn, check[t])


def _executed_plan(df) -> str:
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def _global_order_windows(plan: str) -> list[str]:
    """Window nodes whose partition spec is EMPTY (the single-reducer
    shape). A partitioned Window renders three top-level bracket groups
    — ``Window [exprs], [partitionCols], [orderCols]`` — while a
    global-order one renders only two; this catches the shape even when
    AQE coalesces the feeding exchange to one partition without a
    literal ``Exchange SinglePartition`` node."""
    return [
        line.strip()
        for line in plan.splitlines()
        if re.search(r"\bWindow \[", line) and len(line.split("], [")) < 3
    ]


def _has_single_partition_exchange(plan: str) -> bool:
    return "Exchange SinglePartition" in plan


def test_xh01_plan_has_no_single_partition_exchange(spark, sf_dir):
    from spotify_tags_etl_spark.plans.registry import get

    df = get("xh01_equi_depth_histogram").builder(spark, sf_dir)
    plan = _executed_plan(df)
    assert not _global_order_windows(plan), plan
    assert not _has_single_partition_exchange(plan), plan


def test_xi04_plan_has_no_single_partition_exchange(spark, sf_dir):
    from spotify_tags_etl_spark.plans.registry import get

    df = get("xi04_curriculum_order").builder(spark, sf_dir)
    plan = _executed_plan(df)
    assert not _global_order_windows(plan), plan
    assert not _has_single_partition_exchange(plan), plan


def test_xc02_xi01_plans_have_no_single_partition_exchange(spark, sf_dir):
    """The round-5 scalerank rewrites: the RFM triple-NTILE and the PPS
    cumulative-weight axis must carry NO single-reducer stage at all."""
    from spotify_tags_etl_spark.plans.registry import get

    for name in ("xc02_rfm_segments", "xi01_pps_systematic_sample"):
        plan = _executed_plan(get(name).builder(spark, sf_dir))
        assert not _global_order_windows(plan), (name, plan)
        assert not _has_single_partition_exchange(plan), (name, plan)


def test_xj02_xw05_plans_have_no_global_order_window(spark, sf_dir):
    """xj02/xw05 end in an O(#partitions)-row scalar aggregate (whose
    tiny final-reduce exchange is fine); what must be GONE is any
    global-order window over the data-sized frame."""
    from spotify_tags_etl_spark.plans.registry import get

    for name in ("xj02_key_skew_metrics", "xw05_watermark_lateness_audit"):
        plan = _executed_plan(get(name).builder(spark, sf_dir))
        assert not _global_order_windows(plan), (name, plan)


@pytest.mark.parametrize("num_partitions", [1, 3, 8])
def test_prefix_sum_matches_window_sum(spark, sf_dir, num_partitions):
    from spotify_tags_etl_spark.operators.scalerank import prefix_sum

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    got_df, total = prefix_sum(
        docs,
        [F.col("doc_id").asc()],
        "n_chars",
        sum_col="cs",
        num_partitions=num_partitions,
    )
    got = {r.doc_id: r.cs for r in got_df.collect()}
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r.doc_id: r.cs
        for r in docs.withColumn("cs", F.sum("n_chars").over(w)).collect()
    }
    assert got == want
    assert total == max(want.values())


@pytest.mark.parametrize("num_partitions", [1, 3, 8])
def test_prefix_max_matches_window_max(spark, sf_dir, num_partitions):
    from spotify_tags_etl_spark.operators.scalerank import prefix_max

    # Rank by a NON-monotone axis (totalprice) so the running max over
    # orderkey order genuinely goes through partition-offset folding.
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v")
    )
    got_df = prefix_max(
        orders,
        [F.col("o_orderkey").asc()],
        "v",
        out_col="hm",
        num_partitions=num_partitions,
    )
    got = {r.o_orderkey: r.hm for r in got_df.collect()}
    w = Window.orderBy("o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r.o_orderkey: r.hm
        for r in orders.withColumn("hm", F.max("v").over(w)).collect()
    }
    assert got == want


def _ntile_reference(n: int, k: int) -> list[int]:
    """Literal NTILE semantics: first n%k buckets get n//k+1 rows."""
    q, m = divmod(n, k)
    out = []
    for tile in range(1, k + 1):
        size = q + 1 if tile <= m else q
        out.extend([tile] * size)
    return out


def test_ntile_expr_formula_matches_reference_exhaustive():
    """The closed form in ntile_expr (evaluated as plain integer math)
    must reproduce literal NTILE semantics for every (n, k) in a dense
    grid — covers n % k == 0, n < k, k == 1, and every remainder class
    without paying Spark startup per case."""
    for n in range(1, 80):
        for k in (1, 2, 3, 5, 7, 10, 16):
            q, m = divmod(n, k)
            big = m * (q + 1)
            got = []
            for r in range(1, n + 1):
                if q == 0:
                    got.append(r)
                elif r <= big:
                    got.append((r - 1) // (q + 1) + 1)
                else:
                    got.append(m + (r - big - 1) // q + 1)
            assert got == _ntile_reference(n, k), (n, k)


def test_tile_start_formula_matches_reference_exhaustive():
    from spotify_tags_etl_spark.operators.scalerank import tile_start  # noqa: F401

    for n in range(1, 80):
        for k in (1, 2, 3, 5, 7, 10, 16):
            q, m = divmod(n, k)
            ref = _ntile_reference(n, k)
            for tile in sorted(set(ref)):
                expected_start = ref.index(tile)  # 0-based first rank - 1
                t0 = tile - 1
                got = t0 * (q + 1) if t0 <= m else m * (q + 1) + (t0 - m) * q
                assert got == expected_start, (n, k, tile)
