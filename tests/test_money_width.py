"""Money-sum width audit pins (round 5).

Every micros-scale SUM (addend ~ cents x basis-points, 1e10..1e11 per
row) must accumulate in DECIMAL(38,0): Spark's SUM(BIGINT) silently
wraps once a group's total passes 2^63 (ANSI off), while the DuckDB
oracle's SUM promotes to HUGEINT and stays exact — a latent silent
divergence that the small test SFs can never trigger. Plain cents sums
(addend <= 1e7) stay long on purpose: they are int64-safe past 100 TB
row counts and long adds codegen ~3x faster than decimal adds.

Two layers: a synthetic proof that the failure mode is real in this
Spark build, and a per-query plan pin that each audited site actually
accumulates in decimal (so a refactor back to the long accumulator
fails here, not at SF40 in production).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from spotify_tags_etl_spark.plans.registry import get


def test_bigint_sum_wraps_where_decimal_sum_is_exact(spark):
    """The premise: two addends near 2^62 push the true total past
    2^63. SUM(BIGINT) wraps negative; SUM(DECIMAL(38,0)) is exact."""
    a = 2**62
    b = 2**62 + 12345
    true_total = a + b  # 9223372036854788153 > 2^63 - 1
    df = spark.createDataFrame([(a,), (b,)], "x BIGINT")
    row = df.agg(
        F.sum("x").alias("as_long"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("as_dec"),
    ).collect()[0]
    assert int(row.as_dec) == true_total
    assert row.as_long != true_total  # wrapped (negative) — the bug class
    assert row.as_long < 0


#: Queries whose plan must show a decimal-accumulated sum. The match is
#: against the optimized logical plan, where a hardened site renders as
#: ``sum(cast(... as decimal(38,0)))`` (possibly wrapped in promotion
#: casts); a long accumulator renders with no decimal(38,0) in any sum.
_AUDITED = [
    "xq01_shipping_priority",  # _rev_micros (classics.py)
    "xq08_forecast_revenue",
    "xq10_promo_revenue_share",
    "xq11_disjunctive_revenue",
    "xq13_top_supplier_revenue",  # _rev_micros via groupBy
    "yq08_market_share",
    "yq09_product_profit",
    "yq11_important_stock",  # the GLOBAL position total
    "q13_groupby_agg",  # sum_disc_price only; cents sums stay long
]


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.mark.parametrize("name", _AUDITED)
def test_micros_sum_accumulates_in_decimal(spark, sf_dir, name):
    try:
        entry = get(name)
    except KeyError:
        # r1-verified names carry the rotation prefix in the registry.
        entry = get("zv_" + name)
    plan = _optimized_plan(entry.builder(spark, sf_dir))
    # A hardened site renders as sum(cast(<nested expr> as decimal(38,0)))
    # — the addend expression nests parens, so match lazily to the first
    # "as decimal(38,0)" after "sum(cast(" on the same plan line.
    assert re.search(
        r"sum\(cast\(.*?as decimal\(38,0\)\)\)", plan, re.IGNORECASE
    ), f"{name}: no DECIMAL(38,0)-accumulated sum in optimized plan:\n{plan}"


def test_cross_engine_agreement_at_wrap_magnitudes(spark):
    """End-to-end pin of the audit's claim: at per-row-square magnitudes
    beyond 2^63 the hardened spellings agree ACROSS ENGINES, while the
    long spellings wrap (Spark) or error (DuckDB) — i.e. the divergence
    the audit removed is real and the fix is the cross-engine-exact one."""
    import duckdb

    x = 3_040_000_000  # x*x = 9.2416e18 > 2^63 - 1 ~ 9.2233e18
    rows = [(x,), (x,)]
    sdf = spark.createDataFrame(rows, "x BIGINT")
    hardened = sdf.agg(
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("s")
    ).collect()[0].s
    con = duckdb.connect()
    oracle = con.execute(
        f"SELECT SUM(CAST(x AS HUGEINT) * x) FROM (VALUES ({x}), ({x})) t(x)"
    ).fetchone()[0]
    assert int(hardened) == int(oracle) == 2 * x * x
    # the long spellings really do fail: Spark wraps (mod 2^64 — here it
    # lands on a PLAUSIBLE-LOOKING positive number, the worst case)...
    wrapped = sdf.agg(F.sum(F.col("x") * F.col("x")).alias("s")).collect()[0].s
    assert wrapped == 2 * x * x - 2**64  # silently wrong, not an error
    assert wrapped != 2 * x * x
    # ...and DuckDB refuses the int64 multiply outright.
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute(f"SELECT SUM(x * x) FROM (VALUES ({x}), ({x})) t(x)").fetchone()


#: Second-moment / product-sum sites (the audit's other class): the
#: addend is itself a product (cents^2, id^2, signed-count x signed-
#: count), so even the PER-ROW value can pass 2^63 at fact scale —
#: these render as sum((cast(... as decimal(38,0)) * ...)) rather than
#: a bare sum(cast(...)), so they get a looser same-line pattern.
_PRODUCT_AUDITED = [
    "av13_moments",
    "xr02_grouped_linreg",
    "yj01_ams_join_size",
    # r6: the ESS denominator's Σw² (addend ≤ 8.1e7 wraps a long sum
    # near 1e11 rows) and Fleiss' ΣT_c² (T_c reaches N·m).
    "yv16_ips_offpolicy",
    "yv17_fleiss_kappa",
]


@pytest.mark.parametrize("name", _PRODUCT_AUDITED)
def test_product_sum_accumulates_in_decimal(spark, sf_dir, name):
    try:
        entry = get(name)
    except KeyError:
        entry = get("zv_" + name)
    plan = _optimized_plan(entry.builder(spark, sf_dir))
    assert re.search(
        r"sum\(.*decimal\(38,0\)", plan, re.IGNORECASE
    ), f"{name}: no DECIMAL(38,0)-accumulated product sum in optimized plan:\n{plan}"


def test_q13_cents_sums_stay_long(spark, sf_dir):
    """The flip side of the audit: q13's quantity/base-price cents sums
    must NOT pay the decimal-adds tax — only the micros measure is wide."""
    try:
        entry = get("q13_groupby_agg")
    except KeyError:
        entry = get("zv_q13_groupby_agg")
    plan = _optimized_plan(entry.builder(spark, sf_dir))
    hits = re.findall(r"sum\(cast\(.*?as decimal\(38,0\)\)\)", plan, re.IGNORECASE)
    assert len(hits) == 1, f"expected exactly one decimal sum (sum_disc_price): {hits}\n{plan}"


def test_width_audit_clean():
    """The source-level lint (tools/width_audit.py) backs the per-query
    plan pins above with repo-wide coverage: any NEW Spark-side sum
    whose addend multiplies two non-literal terms fails here until it
    is DECIMAL(38,0)-widened (in the argument or at the factor's
    definition site) or allowlisted with a boundedness justification."""
    import tools.width_audit as wa

    hits = wa.scan()
    assert not hits, "unaudited product sum(s):\n" + "\n".join(
        f"  {p}:{ln}  SUM({snip}...)" for p, ln, snip in hits
    )


def test_width_audit_dec_placeholder_is_pinned():
    """The lint treats the ``{dec}`` f-string placeholder as widening
    evidence — valid only while every ``dec = ...`` assignment under
    the package is exactly DECIMAL(38,0)."""
    import tools.width_audit as wa

    for path, lineno, value in wa.pinned_dec_placeholders():
        assert value == "DECIMAL(38,0)", f"{path}:{lineno} dec = {value!r}"
