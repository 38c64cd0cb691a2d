"""Classic decision-support query shapes (TPC-H Q3/Q5/Q10 adapted to the
driver's TPC-H-ish star schema).

Beyond-reference relational depth: multi-way join pipelines with
selective dimension filters, exact-money aggregation, and deterministic
top-k — the canonical shapes a warehouse engine is judged on. All money
math is integer cents × basis-point discount factors (order-independent,
engine-exact; q13's rationale), and every top-k is a row_number with a
total-order tiebreak (a bare LIMIT over ties is nondeterministic across
engines, so it would be unverifiable).

(``xq`` registry prefix sorts after the current 50-name driver window —
these queue for the next rotation per the registry's late-sorting-name
policy; oracle-checked locally meanwhile.)

Scale notes (100 TB): all three are the textbook broadcast-dim pattern —
nation/region/supplier broadcast, orders⋈lineitem is the one real
shuffle, group-by keys are low-cardinality so partials map-combine.
Catalyst pushes the date/segment/flag filters to the parquet scans
(pinned for q13's scan in tests/test_scale_physical.py; same mechanics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.tpch import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: revenue in micros of a currency unit: cents(price) * (10000 - bp(disc))
def _rev_micros():
    # Per-row product stays < 2^63 (cents * bp ~ 3.6e10), but the SUM
    # accumulator must not: Spark SUM(BIGINT) silently wraps near SF40+
    # fact volumes while the DuckDB oracle's SUM promotes to HUGEINT —
    # accumulate in DECIMAL(38,0) (exact 128-bit, identical partials
    # algebra) and let each call site cast the total down.
    return F.sum(
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(10000) - F.round(F.col("l_discount") * 10000).cast("bigint"))
        ).cast("decimal(38,0)")
    )


_REV_SQL = (
    "SUM(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))"
)


@register(
    "xq01_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority, rk FROM (
      SELECT l_orderkey, revenue, o_orderdate, o_orderpriority,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderdate, l_orderkey) AS rk
      FROM (
        SELECT l.l_orderkey, {_REV_SQL} / 1000000.0 AS revenue,
               STRFTIME(o.o_orderdate, '%Y-%m-%d') AS o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1997-03-15'
          AND l.l_shipdate > TIMESTAMP '1997-03-15'
        GROUP BY l.l_orderkey, STRFTIME(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
      )
    ) WHERE rk <= 10
    """,
    doc=(
        "TPC-H Q3 shape (shipping priority): unshipped BUILDING-segment "
        "orders by revenue, deterministic top-10 (row_number, not LIMIT, "
        "so ties can't diverge across engines). One orders⋈lineitem "
        "shuffle; the customer filter reaches its scan."
    ),
    tags=("join", "aggregate", "topk", "tpch"),
)
def xq01(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1997-03-15").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    agg = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg((_rev_micros() / 1000000.0).alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority", "rk")
    )


@register(
    "xq02_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, {_REV_SQL} / 1000000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    doc=(
        "TPC-H Q5 shape (local supplier volume): revenue where customer "
        "and supplier share a nation, ASIA region, one order year. "
        "Six-way join: region/nation/supplier broadcast, the fact-side "
        "orders⋈lineitem shuffle is the only wide exchange; group key "
        "cardinality = nations, so partials map-combine to nothing."
    ),
    tags=("join", "aggregate", "tpch"),
)
def xq02(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    sup = F.broadcast(_t(spark, sf_dir, "supplier"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            sup,
            (li["l_suppkey"] == sup["s_suppkey"])
            & (cust["c_nationkey"] == sup["s_nationkey"]),
        )
        .join(nation, sup["s_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg((_rev_micros() / 1000000.0).alias("revenue"))
    )


@register(
    "xq03_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, revenue, c_acctbal, n_name, rk FROM (
      SELECT c_custkey, c_name, revenue, c_acctbal, n_name,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rk
      FROM (
        SELECT c.c_custkey, c.c_name, {_REV_SQL} / 1000000.0 AS revenue,
               ROUND(c.c_acctbal, 2) AS c_acctbal, n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-10-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2), n.n_name
      )
    ) WHERE rk <= 20
    """,
    doc=(
        "TPC-H Q10 shape (returned items): top-20 customers by revenue "
        "lost to returns in one quarter. orders⋈lineitem shuffle + "
        "broadcast nation; deterministic top-k with c_custkey "
        "tiebreak. Because the rank is PROJECTED (not just filtered), "
        "a plain row_number()<=k global window would keep a real "
        "WindowExec over the O(customers) frame (the filter-only form "
        "xq01 uses compiles to TakeOrderedAndProject; the projected "
        "form does not) — so the top-20 is taken first with "
        "orderBy+limit (TakeOrderedAndProject, parallel partial "
        "top-k per task) and the rank window runs over the CONSTANT "
        "20-row result. Oracle keeps the one-window spelling."
    ),
    tags=("join", "aggregate", "topk", "tpch"),
)
def xq03(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    agg = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name"
        )
        .agg((_rev_micros() / 1000000.0).alias("revenue"))
    )
    top = agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "rk")
    )


@register(
    "xq04_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) > 21000
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           SUM(CAST(round(l.l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
             STRFTIME(o.o_orderdate, '%Y-%m-%d'), ROUND(o.o_totalprice, 2)
    """,
    doc=(
        "TPC-H Q18 shape (large-volume customers): orders whose total "
        "line quantity clears a threshold — a HAVING-filtered aggregate "
        "feeding a semi-join back into the fact pipeline. The aggregate "
        "runs once (integer cents), its tiny key set semi-joins orders; "
        "at scale this is agg → broadcast-semi, never a re-aggregate "
        "above the join."
    ),
    tags=("join", "aggregate", "semijoin", "tpch"),
)
def xq04(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty_cents = F.round(F.col("l_quantity") * 100).cast("bigint")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_cents).alias("_q"))
        .where(F.col("_q") > 21000)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg((F.sum(qty_cents) / 100.0).alias("sum_qty"))
    )


@register(
    "xq05_global_avg_filter",
    oracle="""
    WITH avg_bal AS (
      SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) * 1.0 / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS n_rich_inactive,
           SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0 AS total_bal
    FROM customer c, avg_bal
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
    doc=(
        "TPC-H Q22 shape (rich inactive customers): a scalar-subquery "
        "global average (exact integer cents, so both engines compute "
        "the identical threshold) filters customers, an anti-join drops "
        "anyone with orders, grouped totals per nation. At scale the "
        "1-row average broadcasts and the anti-join is the only "
        "shuffle."
    ),
    tags=("aggregate", "antijoin", "subquery", "tpch"),
)
def xq05(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg((F.sum(cents) * 1.0 / F.count(F.lit(1))).alias("a"))
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(cents > F.col("a"))
        .join(
            orders.select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
    )
    return rich.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_rich_inactive"),
        (F.sum(cents) / 100.0).alias("total_bal"),
    )


@register(
    "xj01_null_safe_join",
    oracle="""
    WITH l AS (
      SELECT NULLIF(user_id % 10, 7) AS band, COUNT(*) AS n_events
      FROM events GROUP BY NULLIF(user_id % 10, 7)
    ),
    r AS (
      SELECT NULLIF(c_custkey % 10, 7) AS band, COUNT(*) AS n_customers
      FROM customer GROUP BY NULLIF(c_custkey % 10, 7)
    )
    SELECT l.band, l.n_events, r.n_customers
    FROM l JOIN r ON l.band IS NOT DISTINCT FROM r.band
    """,
    doc=(
        "Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the NULL "
        "band row joins NULL-to-NULL instead of silently dropping — the "
        "semantics trap in every dimension join against a nullable key "
        "(a plain `=` loses the unknown-band row on both sides). Keys "
        "are pre-aggregated so both join sides are band-cardinality; "
        "Spark plans a normal hash join on the null-safe predicate, no "
        "nested loop."
    ),
    tags=("join", "nullsafe"),
)
def xj01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .groupBy(F.nullif(F.col("user_id") % 10, F.lit(7)).alias("band"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.nullif(F.col("c_custkey") % 10, F.lit(7)).alias("band"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return ev.join(cust.withColumnRenamed("band", "r_band"), ev["band"].eqNullSafe(F.col("r_band"))).select(
        "band", "n_events", "n_customers"
    )


@register(
    "xq06_nation_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {_REV_SQL} / 1000000.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l.l_shipdate) AS l_year,
             l.l_extendedprice, l.l_discount
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc=(
        "TPC-H Q7 shape (volume shipping between two nations, both "
        "directions, by ship year): six-way join where BOTH nation "
        "dims broadcast with their selective name filters applied "
        "below the join — the disjunctive two-direction predicate "
        "cannot be pushed into either fact scan, but the broadcast "
        "semi-reduction of supplier/customer by their filtered "
        "nations shrinks both fact join inputs before the "
        "orders⋈lineitem exchange (the only wide shuffle). Revenue "
        "through exact integer micros (classics discipline); output "
        "cardinality 2 directions x years."
    ),
    tags=("join", "aggregate", "tpch"),
)
def xq06(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").where(F.col("n_name").isin("NATION_1", "NATION_2"))
    ).alias("n1")
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").where(F.col("n_name").isin("NATION_1", "NATION_2"))
    ).alias("n2")
    sup = _t(spark, sf_dir, "supplier").join(
        n1, F.col("s_nationkey") == F.col("n1.n_nationkey")
    ).select("s_suppkey", F.col("n1.n_name").alias("supp_nation"))
    cust = _t(spark, sf_dir, "customer").join(
        n2, F.col("c_nationkey") == F.col("n2.n_nationkey")
    ).select("c_custkey", F.col("n2.n_name").alias("cust_nation"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate")).cast("bigint").alias("l_year"),
        )
        .agg((_rev_micros() / 1000000.0).alias("revenue"))
    )


@register(
    "xq07_late_shipment_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
    """,
    doc=(
        "TPC-H Q12 shape (late-shipment priority split, adapted to "
        "the synthetic schema: linestatus for shipmode, ship-lag > 90 "
        "days for the commit/receipt lateness chain): one "
        "orders-lineitem equi-join with a JOIN-DEPENDENT date "
        "predicate (shipdate vs orderdate + interval — cannot be "
        "pushed to either scan alone, unlike the year filter, which "
        "IS pushed to the lineitem scan), then conditional "
        "partial-agg counts per status. The shuffle is the one "
        "fact-fact join; the priority CASE folds into map-side "
        "partials, output is 2 rows."
    ),
    tags=("join", "aggregate", "tpch"),
)
def xq07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# xq08 — Q6 forecasting revenue change (single-scan filter + agg)
# ---------------------------------------------------------------------------


@register(
    "xq08_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT) AS rev_micro_bp
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND round(l_discount * 10000) BETWEEN 500 AND 700
      AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6 shape: would-be revenue from discount elimination — "
        "one scan, three pushed predicates, one global sum. The "
        "benchmark's canonical predicate-pushdown probe: every filter "
        "reaches the parquet scan (year range on l_shipdate, basis-"
        "point discount band, quantity cap), so at 100 TB the scan "
        "reads only row groups whose min/max stats overlap the year. "
        "Money math in integer cents x basis points (exact, order-"
        "independent; q13's rationale)."
    ),
    tags=("classic", "scan", "aggregate"),
)
def xq08(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bp = F.round(F.col("l_discount") * 10000).cast("bigint")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & bp.between(500, 700)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # DECIMAL(38,0) accumulator (the _rev_micros discipline): the
            # per-row cents*bp product fits int64 but the global SUM wraps
            # silently past 2^63 while the oracle's HUGEINT stays exact.
            F.sum(
                (F.round(F.col("l_extendedprice") * 100).cast("bigint") * bp).cast(
                    "decimal(38,0)"
                )
            )
            .cast("bigint")
            .alias("rev_micro_bp")
        )
    )


# ---------------------------------------------------------------------------
# xq09 — Q4 order-priority checking (EXISTS semi-join with join predicate)
# ---------------------------------------------------------------------------


@register(
    "xq09_priority_late_ship",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape (adapted: the schema has no commit/receipt "
        "dates, so 'late' = any line shipped >60 days after the order "
        "date): per-priority counts of orders with at least one late "
        "line. The EXISTS compiles to a LEFT SEMI join — lineitem is "
        "deduplicated by the join itself, never aggregated; the "
        "correlated date predicate rides the join condition, so "
        "Catalyst evaluates it during the semi probe instead of "
        "materializing matches. One orders-side shuffle; priority "
        "cardinality is 5, partials map-combine."
    ),
    tags=("classic", "semi-join"),
)
def xq09(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# xq10 — Q14 promotion effect (conditional-aggregate ratio)
# ---------------------------------------------------------------------------


@register(
    "xq10_promo_revenue_share",
    oracle="""
    WITH j AS (
      SELECT p.p_type,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
        AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    ),
    s AS (
      SELECT SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS np,
             SUM(rev) AS d
      FROM j
    )
    SELECT CAST(np * 1000000 // d AS BIGINT)
           AS promo_share_ppm
    FROM s
    """,
    doc=(
        "TPC-H Q14 shape: promotional revenue share for one month — "
        "fact-dim join + conditional aggregation, the ratio emitted in "
        "integer ppm by exact cross-division (no float percent). The "
        "ppm is exact 128-bit long division: numerator*1e6 overflows "
        "int64 at sf>=0.1 revenue sums (Spark wraps silently with ANSI "
        "off, DuckDB errors), and staged base-1000 division is unsafe "
        "too — its remainder*1000 is bounded by d*1000, past 2^63 once "
        "monthly revenue nears 1e16 micros. Spark's DECIMAL(38,0) DIV "
        "is exact integral division returning BIGINT and matches "
        "DuckDB's HUGEINT floor bit-for-bit at any SF (yq08/xs06's "
        "discipline). Month filter prunes the fact scan BEFORE "
        "the join; part broadcasts. Single wide aggregate, one row out."
    ),
    tags=("classic", "join", "aggregate"),
)
def xq10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(10000) - F.round(F.col("l_discount") * 10000).cast("bigint")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("p_type"), rev.alias("rev"))
        .agg(
            # DECIMAL(38,0) accumulators: monthly revenue micros pass 2^63
            # near SF3500 — the BIGINT intermediates would wrap in Spark and
            # error in the oracle's down-cast; only the ppm quotient is int64.
            F.expr(
                "SUM(CAST(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END"
                " AS DECIMAL(38,0)))"
            ).alias("np"),
            F.expr("SUM(CAST(rev AS DECIMAL(38,0)))").alias("d"),
        )
        .select(
            F.expr("CAST(np * 1000000 DIV d AS BIGINT)").alias("promo_share_ppm")
        )
    )


# ---------------------------------------------------------------------------
# xq11 — Q19 discounted revenue (disjunction-of-conjunctions pushdown)
# ---------------------------------------------------------------------------


@register(
    "xq11_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))) AS BIGINT)
           AS rev_micro
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc=(
        "TPC-H Q19 shape: revenue under a disjunction of brand/size/"
        "quantity conjunctions spanning both join sides. The optimizer "
        "test: Catalyst factors the single-side conjuncts out of the "
        "OR — part prunes on (brand IN ... AND size <= 35), lineitem "
        "on quantity ranges — BEFORE the join, leaving only the cross-"
        "side residual on join output. Part broadcasts; one row out, "
        "exact integer money."
    ),
    tags=("classic", "join", "pushdown"),
)
def xq11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(10000) - F.round(F.col("l_discount") * 10000).cast("bigint")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        # DECIMAL(38,0) accumulator — micros sums wrap int64 at large SF
        # while the oracle's HUGEINT stays exact (_rev_micros discipline).
        .agg(F.sum(rev.cast("decimal(38,0)")).cast("bigint").alias("rev_micro"))
    )


# ---------------------------------------------------------------------------
# xz08 — skyline / Pareto frontier (maximize p_size, minimize price)
# ---------------------------------------------------------------------------


@register(
    "xz08_skyline_parts",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_size,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part
    ),
    g AS (SELECT p_size, MIN(price_cents) AS best FROM p GROUP BY p_size),
    m AS (
      SELECT p_size, best,
             MIN(best) OVER (ORDER BY p_size DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_larger
      FROM g
    )
    SELECT p.p_partkey, p.p_size, p.price_cents
    FROM p JOIN m ON p.p_size = m.p_size
    WHERE p.price_cents = m.best
      AND (m.m_larger IS NULL OR p.price_cents < m.m_larger)
    ORDER BY p.p_size, p.p_partkey
    """,
    doc=(
        "Skyline (Pareto frontier) over parts — maximize p_size, "
        "minimize price: a part survives iff no other part is >= in "
        "size and <= in price with one strict (equal-on-both ties "
        "both survive, standard skyline semantics). NOT the quadratic "
        "self-anti-join: per-size minima (|distinct sizes| rows) plus "
        "one running-min window over that tiny frame decide dominance "
        "— the corpus is touched once, the window runs on ~50 rows. "
        "At 100 TB this is the classic 2D skyline reduction: group to "
        "per-x best-y, prefix-min over x, join back as a broadcast; "
        "higher dimensions fall back to block-nested-loop over the "
        "reduced candidate set. All-integer cents."
    ),
    tags=("classic", "skyline", "window"),
)
def xz08(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
    )
    g = p.groupBy("p_size").agg(F.min("price_cents").alias("best"))
    w = Window.orderBy(F.col("p_size").desc()).rowsBetween(Window.unboundedPreceding, -1)
    m = g.select("p_size", "best", F.min("best").over(w).alias("m_larger"))
    return (
        p.join(F.broadcast(m), "p_size")
        .where(
            (F.col("price_cents") == F.col("best"))
            & (F.col("m_larger").isNull() | (F.col("price_cents") < F.col("m_larger")))
        )
        .select("p_partkey", "p_size", "price_cents")
        .orderBy("p_size", "p_partkey")
    )


# ---------------------------------------------------------------------------
# xo03 — Benford first-digit audit (data-quality forensics)
# ---------------------------------------------------------------------------

#: round(log10(1 + 1/d) * 1e6) — Benford expected ppm per leading digit.
_BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
                6: 66947, 7: 57992, 8: 51153, 9: 45757}


def _benford_case_sql() -> str:
    whens = " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    return f"CASE digit {whens} END"


@register(
    "xo03_benford_audit",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT c.digit, c.n,
           CAST((c.n * 1000000) // t.total AS BIGINT) AS obs_ppm,
           CAST({_benford_case_sql()} AS BIGINT) AS exp_ppm,
           CAST((c.n * 1000000) // t.total - {_benford_case_sql()} AS BIGINT) AS delta_ppm
    FROM c CROSS JOIN t
    ORDER BY c.digit
    """,
    doc=(
        "Benford's-law first-digit audit over order totals: observed "
        "leading-digit frequencies (integer ppm) against the log10(1 + "
        "1/d) expectation (precomputed integer constants — no floats "
        "in the output), with signed deltas. The fraud/synthetic-data "
        "forensic every financial warehouse runs; here it doubles as "
        "a fixture-realism probe. One scan, 9-row aggregate with "
        "map-side partials, O(1)-row total broadcast back (xr05's "
        "ratio pattern)."
    ),
    tags=("quality", "audit", "aggregate"),
)
def xo03(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    exp_ppm = F.element_at(
        F.create_map(*[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]), F.col("digit")
    ).cast("bigint")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.expr("(n * 1000000) DIV total").alias("obs_ppm"),
            exp_ppm.alias("exp_ppm"),
            (F.expr("(n * 1000000) DIV total") - exp_ppm).alias("delta_ppm"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# xq12 — Q13 customer order-count distribution (left join + double agg)
# ---------------------------------------------------------------------------


@register(
    "xq12_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc=(
        "TPC-H Q13 shape: the distribution of customers by how many "
        "orders they placed — LEFT join so zero-order customers count "
        "in the c_count=0 bucket (the reason this can never be an "
        "inner join), then the double aggregation customers→counts→"
        "histogram. First aggregate carries O(customers) groups (the "
        "wide stage); the histogram re-aggregate is O(distinct "
        "counts) and map-combines to nothing. Deterministic order by "
        "(custdist, c_count) both DESC — a total order because "
        "c_count is the group key."
    ),
    tags=("classic", "join", "histogram"),
)
def xq12(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# xq13 — Q15 top supplier(s) by period revenue (agg + global-max semi)
# ---------------------------------------------------------------------------


@register(
    "xq13_top_supplier_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, CAST({_REV_SQL} AS BIGINT) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc=(
        "TPC-H Q15 shape (top supplier): quarterly revenue per "
        "supplier (the view step), then every supplier matching the "
        "GLOBAL max — the scalar-subquery-on-an-aggregate pattern "
        "where ties legitimately return multiple rows (exact integer "
        "revenue makes the tie semantics deterministic, which the "
        "float original cannot promise). The revenue view is the one "
        "wide aggregate; the max is O(1) broadcast back over it; "
        "supplier dim broadcasts into the final join."
    ),
    tags=("classic", "aggregate", "scalar-subquery"),
)
def xq13(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _rev_micros().cast("bigint").alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# xq14 — Q17 small-quantity-order revenue (correlated avg subquery)
# ---------------------------------------------------------------------------


@register(
    "xq14_small_quantity_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sq, COUNT(*) AS n
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS small_order_rev_cents,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND 10 * CAST(ROUND(l.l_quantity) AS BIGINT) * pq.n < 2 * pq.sq
    """,
    doc=(
        "TPC-H Q17 shape (small-quantity order revenue): lines of one "
        "brand whose quantity is below 20% of the part's average — "
        "the correlated-average predicate decorrelated into a per-"
        "part (sum, count) aggregate joined back, with the avg "
        "comparison cross-multiplied to exact integers (10·qty·n < "
        "2·sum ⇔ qty < 0.2·avg; no float division anywhere, so the "
        "boundary rows are engine-exact). The per-part aggregate is "
        "the wide stage; brand-filtered part broadcasts; at scale "
        "the pq frame is the classic magic-set reduction of the "
        "correlated subquery."
    ),
    tags=("classic", "join", "decorrelation"),
)
def xq14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(pq, li["l_partkey"] == pq["pk"])
        .where(
            F.lit(10) * F.round(F.col("l_quantity")).cast("bigint") * F.col("n")
            < F.lit(2) * F.col("sq")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("small_order_rev_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
