"""Relational operator inventory (SURVEY.md §2.2–§2.8) on the test star schema.

Each query re-expresses one operator shape from the reference's query
surface (``/root/reference/src/spotify_tags_etl/sql/params_queries.py:7-54``
and the client-side operators of ``spotify_client.py`` /
``postgres_media.py``) against the driver's TPC-H-ish tables, as an
idiomatic Catalyst-optimizable DataFrame plan plus a DuckDB oracle.

Scale stance: every plan here is declarative — filters sit directly on
scans (parquet pushdown), projections prune columns, joins are equi-joins
Catalyst can broadcast or sort-merge, aggregations get map-side partial
apply, and AQE handles skew. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.tpch import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# The reference's 8 canned query shapes (params_queries.py:7-35), re-keyed
# onto the star schema. Q1-Q5: projection + IN / equality filters.
# ---------------------------------------------------------------------------


@register(
    "q01_project_in_filter",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_mktsegment IN ('BUILDING')
    """,
    doc="ARTIST_SELECT shape (reference sql/params_queries.py:7): project + single-key IN.",
    tags=("projection", "filter"),
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "q02_project_in_filter_multi",
    oracle="""
    SELECT p_partkey, p_name, p_size, p_retailprice
    FROM part WHERE p_brand IN ('Brand#1', 'Brand#2')
    """,
    doc="ALBUM_SELECT shape (params_queries.py:9): project + IN over two values.",
    tags=("projection", "filter"),
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand").isin("Brand#1", "Brand#2"))
        .select("p_partkey", "p_name", "p_size", "p_retailprice")
    )


@register(
    "q03_project_in_filter_wide",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    doc="TRACK_SELECT shape (params_queries.py:11): wider projection + IN.",
    tags=("projection", "filter"),
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    )


@register(
    "q04_two_key_in",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation WHERE n_name IN ('NATION_3', 'NATION_7')
    """,
    doc="GENRE_SELECT shape (params_queries.py:31): IN with exactly two keys.",
    tags=("projection", "filter"),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@register(
    "q05_equality_filter",
    oracle="""
    SELECT event_id, user_id, value
    FROM events WHERE event_type = 'click'
    """,
    doc="FILE_SELECT shape (params_queries.py:33): single equality predicate, pushed to scan.",
    tags=("projection", "filter"),
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .select("event_id", "user_id", "value")
    )


@register(
    "q06_join3_theta_sort",
    oracle="""
    SELECT o_orderkey, c_name, n_name, o_totalprice
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_totalprice < 5000.0
    ORDER BY o_totalprice DESC
    """,
    doc=(
        "GAIN_SELECT shape (params_queries.py:13-20): 3-way equi-join + theta filter "
        "+ ORDER BY DESC. Nation is a broadcast dim; the theta filter pushes below the join."
    ),
    tags=("join", "filter", "sort"),
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") < 5000.0)
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .orderBy(F.desc("o_totalprice"))
        .select("o_orderkey", "c_name", "n_name", "o_totalprice")
    )


@register(
    "q07_join3_in_sort",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('EUROPE')
    ORDER BY c_name
    """,
    doc="JOIN_SELECT shape (params_queries.py:22-29): dim-dim-fact join chain + IN + ASC sort.",
    tags=("join", "filter", "sort"),
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name").isin("EUROPE"))
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .orderBy("c_name")
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "q08_scalar_agg_round",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) / 1000.0, 2) AS avg_kprice
    FROM orders
    """,
    doc=(
        "AVG_SIZE_SELECT shape (params_queries.py:35): whole-table scalar aggregate + "
        "arithmetic + round. Sum flows through DECIMAL so the value is accumulation-order "
        "independent (float sums differ between engines/partitionings)."
    ),
    tags=("aggregate",),
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
            / 1000.0,
            2,
        ).alias("avg_kprice")
    )


# ---------------------------------------------------------------------------
# Q9-Q13: dynamic IN expansion, projections, validity predicates.
# ---------------------------------------------------------------------------


def dynamic_in_filter(df: DataFrame, column: str, values: list) -> DataFrame:
    """Q9 ``build_placeholders`` analog (params_queries.py:38-54): the SQL
    string-building machinery collapses to ``isin(*values)``."""
    return df.where(F.col(column).isin(*values))


@register(
    "q09_dynamic_in",
    oracle="""
    SELECT p_partkey, p_type, p_size
    FROM part WHERE p_type IN ('ECONOMY', 'PROMO', 'STANDARD') AND p_size >= 25
    """,
    doc="build_placeholders shape (params_queries.py:38-54): param-count-driven IN expansion.",
    tags=("filter",),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(F.col("p_size") >= 25)
    return dynamic_in_filter(part, "p_type", ["ECONOMY", "PROMO", "STANDARD"]).select(
        "p_partkey", "p_type", "p_size"
    )


@register(
    "q10_column_subset",
    oracle="SELECT s_suppkey, s_name FROM supplier",
    doc="Per-table column-subset projection (postgres_media.py:270): catalog-driven select.",
    tags=("projection",),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")


@register(
    "q11_drop_column",
    oracle="SELECT s_suppkey, s_name, s_nationkey FROM supplier",
    doc="Drop-column projection (postgres_media.py:225): remove surrogate columns pre-write.",
    tags=("projection",),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "supplier").drop("s_acctbal")


@register(
    "q12_validity_filter",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE value BETWEEN 1.0 AND 100.0
      AND event_type IN ('click', 'view', 'purchase', 'signup', 'error')
    """,
    doc=(
        "Row-validity predicates (reference models.py:46,50,120-144 pydantic ranges + "
        "type whitelist models.py:17-25): constraints as filters, invalid rows quarantined "
        "rather than failing the job."
    ),
    tags=("filter", "validation"),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    valid = F.col("value").between(1.0, 100.0) & F.col("event_type").isin(
        "click", "view", "purchase", "signup", "error"
    )
    return events.where(valid).select("event_id", "event_type", "value")


# ---------------------------------------------------------------------------
# Aggregations (§2.4) and windows (§2.5).
# ---------------------------------------------------------------------------


@register(
    "q13_groupby_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (10000 - CAST(round(l_discount * 10000) AS BIGINT))) / 1000000.0 AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "Pricing-summary group-by (TPC-H Q1 shape; beyond-reference core agg). "
        "Exact sums via integer cents (2dp measures ×100, discount factor ×10⁴): "
        "order-independent like DECIMAL. The cents sums stay long (addend ≤1e7, "
        "int64-safe past 100 TB row counts); the micros-scale disc-price sum "
        "accumulates in DECIMAL(38,0) — its BIGINT form wraps near SF250 with "
        "only ~6 groups, while the oracle's HUGEINT stays exact. Filter pushed "
        "to parquet scan."
    ),
    tags=("aggregate", "groupby"),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
    cents = lambda c, s=100: F.round(F.col(c) * s).cast("bigint")  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"),
        (F.sum(cents("l_extendedprice")) / 100.0).alias("sum_base_price"),
        (
            F.sum(
                (cents("l_extendedprice") * (F.lit(10000) - cents("l_discount", 10000))).cast(
                    "decimal(38,0)"
                )
            )
            / 1000000.0
        ).alias("sum_disc_price"),
        F.count("*").alias("count_order"),
    )


@register(
    "q14_argmax_window",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name, c_acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn = 1
    """,
    doc=(
        "Argmax / top-1-per-group (reference find_closest_match argmax, "
        "spotify_client.py:171-175): window row_number with total-order tiebreak."
    ),
    tags=("window", "argmax"),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
    )


@register(
    "q15_max_by",
    oracle="""
    SELECT n_regionkey, MAX_BY(n_name, n_nationkey) AS max_nation, MAX(n_nationkey) AS max_key
    FROM nation GROUP BY n_regionkey
    """,
    doc="max_by aggregate (A2/A6, spotify_client.py:171-175): argmax on a unique key.",
    tags=("aggregate", "argmax"),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.max_by("n_name", "n_nationkey").alias("max_nation"),
            F.max("n_nationkey").alias("max_key"),
        )
    )


@register(
    "q16_dedup_exact_keyed",
    oracle="""
    SELECT user_id, MIN(event_id) AS first_event_id, COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
    doc=(
        "Distinct accumulation / keep-first dedup (A3, spotify_client.py:545-546): "
        "deterministic keep-first = groupBy + min, not dropDuplicates (which keeps an "
        "arbitrary row per partition ordering)."
    ),
    tags=("aggregate", "dedup"),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("event_id").alias("first_event_id"), F.count("*").alias("n_events"))
    )


@register(
    "q17_count_distinct",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="Count / count-distinct (A4, spotify_client.py:550-551).",
    tags=("aggregate",),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "q18_every_fold",
    oracle="""
    SELECT l_orderkey,
           BOOL_AND(l_discount > 0.02) AS all_discounted,
           BOOL_OR(l_tax > 0.05) AS any_taxed
    FROM lineitem GROUP BY l_orderkey
    """,
    doc=(
        "Boolean all-success fold (A5, postgres_media.py:272-283 — the reference's fold "
        "is buggy, returning only the first status; this implements the intended "
        "every-semantics with bool_and)."
    ),
    tags=("aggregate",),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.every(F.col("l_discount") > 0.02).alias("all_discounted"),
        F.some(F.col("l_tax") > 0.05).alias("any_taxed"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (§2.6), set ops (§2.7), join variants (§2.3).
# ---------------------------------------------------------------------------


@register(
    "q19_union_all",
    oracle="""
    SELECT event_id, event_type, value, 'hot' AS bucket FROM events WHERE value > 400.0
    UNION ALL
    SELECT event_id, event_type, value, 'cold' AS bucket FROM events WHERE value < 1.0
    """,
    doc="UNION ALL (§2.7: the reference's multi-file ingest loop, postgres_media.py:297).",
    tags=("setop",),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hot = ev.where(F.col("value") > 400.0).select("event_id", "event_type", "value", F.lit("hot").alias("bucket"))
    cold = ev.where(F.col("value") < 1.0).select("event_id", "event_type", "value", F.lit("cold").alias("bucket"))
    return hot.unionByName(cold)


@register(
    "q20_topk_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc=(
        "Top-k with deterministic total order (O4/O6, postgres_media.py:238-239, "
        "spotify_client.py:530-532). Spark executes as TakeOrderedAndProject — no full sort."
    ),
    tags=("sort", "limit"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q21_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
    """,
    doc="Left-semi join (§2.3 'not present in reference' — exposed as engine built-in).",
    tags=("join",),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000.0)
    return customer.join(big, customer.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q22_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
    """,
    doc=(
        "Left-anti join (§2.3): customers with no high-value order. (The "
        "filter keeps the result non-empty at every test SF — an all-"
        "customers-have-orders dataset would make a bare anti-join a "
        "vacuous 0=0 correctness check.)"
    ),
    tags=("join",),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 350000.0)
    return customer.join(big, customer.c_custkey == big.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q23_outer_join_agg",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    doc="Left-outer join + per-key aggregate with zero-fill (§2.3 built-in exposure).",
    tags=("join", "aggregate"),
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pre-aggregate orders by the join key BEFORE the outer join: the join
    # then shuffles one compact row per customer instead of every wide
    # order row, and the map-side partial aggregation does most of the
    # reduction. At 100x scale this is the difference between shuffling
    # O(|orders|) and O(|customers|) bytes for an identical result.
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("o_orderkey").alias("_n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_spend"),
        )
    )
    return customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce(F.col("_n"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("_spend").cast("double"), F.lit(0.0)).alias("total_spend"),
    )


# ---------------------------------------------------------------------------
# Window analytics beyond top-1 (§2.5 exposure) + event-time bucketing
# (§2.9 streaming analog, expressed in batch).
# ---------------------------------------------------------------------------


@register(
    "q24_window_rank_topk",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    doc="Top-k per group via ranking window (§2.5; generalizes the reference's top-1).",
    tags=("window",),
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
    )


@register(
    "q25_cumulative_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    """,
    doc=(
        "Cumulative sum per key in event-time order (§2.5/§2.9). Decimal accumulator "
        "keeps the running sum exact regardless of frame evaluation strategy."
    ),
    tags=("window",),
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .withColumn("running_value", F.sum(F.col("value").cast("decimal(14,2)")).over(w).cast("double"))
        .select("event_id", "user_id", "running_value")
    )


@register(
    "q26_time_bucket_agg",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:00:00') AS hour_bucket,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc=(
        "Tumbling event-time window aggregate in batch (§2.9 streaming analog; the "
        "streaming module runs the same logical shape with a watermark)."
    ),
    tags=("aggregate", "eventtime"),
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00").alias("hour_bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "q27_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
    doc="Nested JSON extraction (F12/F13, spotify_client.py:393-429): get_json_object path.",
    tags=("json", "function"),
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.select("event_id", k.alias("prop_k")).where(F.col("prop_k") >= 50)


@register(
    "q28_sorted_list_agg",
    oracle="""
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
    doc="Deterministic list aggregation (K3 NDJSON-export shape): collect + sort + join.",
    tags=("aggregate",),
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
    )


@register(
    "q32_intersect_except",
    oracle="""
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995),
    y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)
    SELECT o_custkey, 'both' AS cohort FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
    UNION ALL
    SELECT o_custkey, 'only_1995' AS cohort FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
    """,
    doc=(
        "Set operations (SURVEY §2.7 — absent in the reference, built-in "
        "here): INTERSECT / EXCEPT cohorts of customers by order year. "
        "Both compile to aggregate + join — one shuffle each on the key."
    ),
    tags=("setop",),
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    y95 = orders.where(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = orders.where(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    both = y95.intersect(y96).withColumn("cohort", F.lit("both"))
    only95 = y95.exceptAll(y96).withColumn("cohort", F.lit("only_1995"))
    return both.unionByName(only95)


@register(
    "q33_track_tag_format",
    oracle="""
    SELECT printf('%03d | %s | %s | %02d-%s',
                  CAST(s_suppkey % 1000 AS INT), s_name, n_name,
                  CAST(s_nationkey % 100 AS INT), s_name) AS track_tag
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
    doc=(
        "F18 (postgres_media.py:256-260): printf-style key formatting via "
        "format_string over a broadcast dim join."
    ),
    tags=("function", "format"),
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tags_etl_spark.functions.format import track_tag

    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey).select(
        track_tag(
            (F.col("s_suppkey") % 1000).cast("int"),
            F.col("s_name"),
            F.col("n_name"),
            (F.col("s_nationkey") % 100).cast("int"),
            F.col("s_name"),
        ).alias("track_tag")
    )


@register(
    "q34_readable_size",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN b < 1024.0 THEN printf('%.2f B', round(b, 2))
                WHEN b < 1048576.0 THEN printf('%.2f KiB', round(b / 1024.0, 2))
                WHEN b < 1073741824.0 THEN printf('%.2f MiB', round(b / 1048576.0, 2))
                ELSE printf('%.2f GiB', round(b / 1073741824.0, 2))
           END AS readable
    FROM (SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DOUBLE) AS b
          FROM orders)
    """,
    doc=(
        "F14 (util/logger.py:11-20): bytes → human-readable size as a "
        "codegen'd when-ladder (binary 1024 units; the reference's loop "
        "divides by 1000 while printing binary labels — fixed here)."
    ),
    tags=("function", "format"),
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tags_etl_spark.functions.format import readable_size

    # exact integer "bytes": decimal route — double→bigint casts TRUNCATE in
    # Spark but ROUND in DuckDB, so never integer-cast a double directly
    b = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("double")
    return _t(spark, sf_dir, "orders").select("o_orderkey", readable_size(b).alias("readable"))


@register(
    "xn01_variant_shred",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_decade,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
    """,
    doc=(
        "Semi-structured VARIANT path (Spark 4): props parses ONCE to "
        "the binary VARIANT encoding, typed fields shred out via "
        "try_variant_get, then a plain relational aggregate — the "
        "engine-native alternative to per-row JSON string re-parsing "
        "(q27's get_json_object path re-tokenizes the string per "
        "extraction; VARIANT amortizes the parse and scales to many "
        "extractions per document). Missing/empty props shred to NULL "
        "and group as the NULL decade on both engines."
    ),
    tags=("json", "variant", "aggregate"),
)
def xn01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select(k.alias("_k"))
        # floor division (not DIV's truncate-toward-zero) to match DuckDB
        # `//` if a future fixture ships negative k values
        .groupBy(F.floor(F.col("_k") / F.lit(10)).cast("bigint").alias("k_decade"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_k").cast("bigint").alias("sum_k"))
    )


@register(
    "xm01_bag_set_ops",
    oracle="""
    WITH q1 AS (
      SELECT l_suppkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    ),
    q2 AS (
      SELECT l_suppkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-04-01' AND l_shipdate < TIMESTAMP '1996-07-01'
    )
    SELECT l_suppkey, 'common' AS op, COUNT(*) AS n
    FROM (SELECT * FROM q1 INTERSECT ALL SELECT * FROM q2) GROUP BY l_suppkey
    UNION ALL
    SELECT l_suppkey, 'q1_excess' AS op, COUNT(*) AS n
    FROM (SELECT * FROM q1 EXCEPT ALL SELECT * FROM q2) GROUP BY l_suppkey
    """,
    doc=(
        "Multiset (bag) set operations: INTERSECT ALL keeps min-count "
        "copies and EXCEPT ALL subtracts multiplicities — the semantics "
        "q32's distinct-set forms cannot express (a supplier shipping 5 "
        "times in Q1 and 3 in Q2 has 3 common + 2 excess, not 1 + 0). "
        "Both compile to a count-aggregate + join on the key: one "
        "shuffle per side, no row-level materialization of duplicates."
    ),
    tags=("setop", "multiset"),
)
def xm01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q1 = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_suppkey")
    q2 = li.where(
        (F.col("l_shipdate") >= F.lit("1996-04-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("l_suppkey")
    common = (
        q1.intersectAll(q2)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("common"))
    )
    excess = (
        q1.exceptAll(q2)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("q1_excess"))
    )
    return common.unionByName(excess).select("l_suppkey", "op", "n")


# ---------------------------------------------------------------------------
# xz13 / xz14 — Spark 4 SQL surface: WITH RECURSIVE and LATERAL
# ---------------------------------------------------------------------------


@register(
    "xz13_recursive_reachability",
    oracle="""
    WITH RECURSIVE reach(node, d) AS (
      SELECT CAST('click' AS VARCHAR), 0
      UNION ALL
      SELECT e.dst, r.d + 1
      FROM reach r JOIN (
        SELECT DISTINCT prev_type AS src, event_type AS dst FROM (
          SELECT event_type,
                 LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events)
        WHERE prev_type IS NOT NULL
      ) e ON e.src = r.node
      WHERE r.d < 4
    )
    SELECT node, MIN(d) AS hops FROM reach GROUP BY node ORDER BY node
    """,
    doc=(
        "Recursive-CTE graph reachability (WITH RECURSIVE, Spark 4 SQL "
        "surface): minimum hop count from the 'click' node over the "
        "event-transition edge set, depth-bounded at 4 so the UNION "
        "ALL expansion terminates independent of cycles, min-hop "
        "aggregated outside the recursion. The declarative dual of "
        "xg03's unrolled-iteration DataFrame form and vz01's label "
        "propagation — the engine now exposes BOTH idioms for "
        "iterative graph logic. The recursion's per-step work is a "
        "join against the (tiny, re-derived once by the planner) edge "
        "relation; at scale the same statement runs with edges as a "
        "materialized table, which is where a bounded-depth BFS "
        "belongs anyway."
    ),
    tags=("sql", "recursive", "graph"),
)
def xz13(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH RECURSIVE reach(node, d) AS (
          SELECT CAST('click' AS STRING), 0
          UNION ALL
          SELECT e.dst, r.d + 1
          FROM reach r JOIN (
            SELECT DISTINCT prev_type AS src, event_type AS dst FROM (
              SELECT event_type,
                     LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
              FROM events)
            WHERE prev_type IS NOT NULL
          ) e ON e.src = r.node
          WHERE r.d < 4
        )
        SELECT node, MIN(d) AS hops FROM reach GROUP BY node ORDER BY node
        """
    )


@register(
    "xz14_lateral_topk",
    oracle="""
    SELECT n.n_name, l.c_name, l.bal
    FROM nation n, LATERAL (
      SELECT c_name, ROUND(c_acctbal, 2) AS bal
      FROM customer c WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) l
    ORDER BY n.n_name, l.bal DESC, l.c_name
    """,
    doc=(
        "Correlated LATERAL top-k (Spark 4 SQL surface): each nation's "
        "two richest customers via a per-row correlated subquery with "
        "ORDER BY/LIMIT — the SQL-standard spelling of q14/q24's "
        "window row_number top-k (total-order tiebreak on c_name keeps "
        "it deterministic). Catalyst decorrelates the lateral into a "
        "ranked join rather than executing per-row — same physical "
        "shape as the window form, so the 100 TB cost model is "
        "unchanged; what this adds is the API: correlated-subquery "
        "workloads port verbatim."
    ),
    tags=("sql", "lateral", "topk"),
)
def xz14(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, l.c_name, l.bal
        FROM nation n, LATERAL (
          SELECT c_name, ROUND(c_acctbal, 2) AS bal
          FROM customer c WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) l
        ORDER BY n.n_name, l.bal DESC, l.c_name
        """
    )


@register(
    "xz17_pipe_syntax",
    oracle="""
    SELECT user_id, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id HAVING COUNT(*) >= 2
    ORDER BY user_id LIMIT 5
    """,
    doc=(
        "SQL pipe syntax (Spark 4 `|>` operators): filter → aggregate "
        "→ having-filter → order → limit written as a linear pipeline, "
        "hash-checked against the equivalent classic SELECT. Pure "
        "surface parity — Catalyst compiles both spellings to the "
        "identical plan, so analysts migrating pipe-first SQL "
        "(BigQuery/ZetaSQL style) port queries without rewrites. "
        "user_id is unique per group, so ORDER BY + LIMIT is "
        "deterministic without an extra tiebreak."
    ),
    tags=("sql", "pipe-syntax"),
)
def xz17(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        FROM events
        |> WHERE event_type = 'purchase'
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
           GROUP BY user_id
        |> WHERE n >= 2
        |> ORDER BY user_id
        |> LIMIT 5
        """
    )


@register(
    "xz18_sql_scripting",
    oracle="""
    WITH t AS (
      SELECT SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) // COUNT(*) AS threshold
      FROM events
    )
    SELECT event_type, COUNT(*) AS n_above
    FROM events CROSS JOIN t
    WHERE CAST(ROUND(value * 100, 0) AS BIGINT) > t.threshold
    GROUP BY event_type ORDER BY event_type
    """,
    doc=(
        "SQL scripting (Spark 4 BEGIN/DECLARE/SET blocks): a session "
        "variable captures the floor-average cents (SUM DIV COUNT — "
        "integer-exact; a double AVG cast differs between engines: "
        "Spark truncates, DuckDB rounds), then parameterizes "
        "the above-average count per type; the oracle is the same "
        "logic as one statement with the scalar via CROSS JOIN. "
        "Procedural-SQL workloads (stored-procedure migrations) run "
        "as-is; the variable materializes as an O(1) scalar subquery, "
        "so the plan is two scans exactly like the relational form — "
        "xq05's scalar-subquery shape behind procedural syntax."
    ),
    tags=("sql", "scripting"),
)
def xz18(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        BEGIN
          DECLARE threshold BIGINT DEFAULT 0;
          SET threshold = (SELECT SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) DIV COUNT(*)
                           FROM events);
          SELECT event_type, COUNT(*) AS n_above
          FROM events
          WHERE CAST(ROUND(value * 100, 0) AS BIGINT) > threshold
          GROUP BY event_type ORDER BY event_type;
        END
        """
    )
