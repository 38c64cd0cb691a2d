"""Advanced relational + temporal operators beyond the reference surface.

The reference (SURVEY.md §2.4-2.7) has no grouping sets, percentiles,
pivots, as-of/range joins, sessionization, or sketches — all of which a
large-scale analytics engine must expose. Everything here is pure
DataFrame algebra over the built-in functions (JVM-side, codegen'd), each
with a DuckDB oracle.

Cross-engine determinism (registry rules): measure sums go through
``DECIMAL(14,2)``; percentile/ratio doubles are rounded; every window
has a total-order tiebreak; timestamps are formatted to strings.

Scale notes per operator are on the individual docstrings; the common
themes at 100 TB:

* rollup/cube are partial-agg friendly (map-side combine per grouping
  set) — no extra shuffle vs. a flat groupBy;
* the as-of join is the union+window merge pattern: ONE shuffle on the
  key, no per-row subquery, no broadcast of the big side;
* the range join buckets time so candidate pairs are per-(key, bucket)
  — never an unbounded theta join;
* sessionization is lag+cumsum over (user, ts) — single shuffle, state
  bounded by partition, the same shape Structured Streaming uses for
  session windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.tpch import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _dec_sum(col: str = "value"):
    return F.sum(F.col(col).cast("decimal(14,2)")).cast("double")


# ---------------------------------------------------------------------------
# grouping sets / rollup / cube
# ---------------------------------------------------------------------------


@register(
    "av01_rollup_agg",
    oracle="""
    SELECT COALESCE(event_type, '(all)') AS event_type,
           COALESCE(CAST(user_id % 10 AS VARCHAR), '(all)') AS user_band,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           CAST(GROUPING(user_id % 10) AS INT) AS g_band,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP(event_type, user_id % 10)
    """,
    doc=(
        "ROLLUP hierarchy (event_type → user band → grand total) with "
        "GROUPING disambiguation. Partial-aggregable: one shuffle, "
        "map-side combine covers all grouping sets."
    ),
    tags=("aggregate", "groupingsets"),
)
def av01(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ev(spark, sf_dir).createOrReplaceTempView("_av01_events")
    return spark.sql(
        """
        SELECT COALESCE(event_type, '(all)') AS event_type,
               COALESCE(CAST(user_id % 10 AS STRING), '(all)') AS user_band,
               CAST(GROUPING(event_type) AS INT) AS g_type,
               CAST(GROUPING(user_id % 10) AS INT) AS g_band,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        FROM _av01_events
        GROUP BY ROLLUP(event_type, user_id % 10)
        """
    )


@register(
    "av02_cube_agg",
    oracle="""
    SELECT COALESCE(event_type, '(all)') AS event_type,
           COALESCE(CAST(EXTRACT(hour FROM ts) AS VARCHAR), '(all)') AS hr,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           CAST(GROUPING(EXTRACT(hour FROM ts)) AS INT) AS g_hr,
           COUNT(*) AS n
    FROM events
    GROUP BY CUBE(event_type, EXTRACT(hour FROM ts))
    """,
    doc="CUBE over (event_type, hour-of-day): all 4 grouping sets in one shuffle.",
    tags=("aggregate", "groupingsets"),
)
def av02(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ev(spark, sf_dir).createOrReplaceTempView("_av02_events")
    return spark.sql(
        """
        SELECT COALESCE(event_type, '(all)') AS event_type,
               COALESCE(CAST(HOUR(ts) AS STRING), '(all)') AS hr,
               CAST(GROUPING(event_type) AS INT) AS g_type,
               CAST(GROUPING(HOUR(ts)) AS INT) AS g_hr,
               COUNT(*) AS n
        FROM _av02_events
        GROUP BY CUBE(event_type, HOUR(ts))
        """
    )


@register(
    "av03_grouping_sets",
    oracle="""
    SELECT COALESCE(event_type, '(all)') AS event_type,
           COALESCE(CAST(user_id % 10 AS VARCHAR), '(all)') AS user_band,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10))
    """,
    doc="Explicit GROUPING SETS ((type), (band)) — two independent aggregates in one pass.",
    tags=("aggregate", "groupingsets"),
)
def av03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    ev.createOrReplaceTempView("_av03_events")
    return spark.sql(
        """
        SELECT COALESCE(event_type, '(all)') AS event_type,
               COALESCE(CAST(user_id % 10 AS STRING), '(all)') AS user_band,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        FROM _av03_events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10))
        """
    )


# ---------------------------------------------------------------------------
# pivot
# ---------------------------------------------------------------------------


@register(
    "av04_pivot",
    oracle=f"""
    SELECT user_id % 10 AS user_band,
           {", ".join(
               f"CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(14,2)) END) AS DOUBLE) AS sum_{t}"
               for t in EVENT_TYPES
           )}
    FROM events GROUP BY user_id % 10
    """,
    doc=(
        "Pivot event_type → columns (explicit value list so no extra "
        "distinct-values job; one shuffle, conditional map-side partials)."
    ),
    tags=("aggregate", "pivot"),
)
def av04(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ev(spark, sf_dir)
        .groupBy((F.col("user_id") % 10).alias("user_band"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(_dec_sum())
        .withColumnsRenamed({t: f"sum_{t}" for t in EVENT_TYPES})
    )


# ---------------------------------------------------------------------------
# percentiles / distribution
# ---------------------------------------------------------------------------


#: Quantile levels shared by av05 (exact) and av12 (sketch) — the two ops
#: are compared against each other in tests, so the levels/rounding live
#: in one place.
_QUANTILES = (0.25, 0.50, 0.75, 0.95)


def _quantile_agg(spark: SparkSession, sf_dir: str, pctl_fn) -> DataFrame:
    """Per-event-type quantiles via ``pctl_fn(col, levels_array)``."""
    pc = pctl_fn(F.col("value"), F.array(*[F.lit(x) for x in _QUANTILES]))
    return (
        _ev(spark, sf_dir)
        .groupBy("event_type")
        .agg(pc.alias("p"))
        .select(
            "event_type",
            *[
                F.round(F.col("p")[i], 6).alias(f"p{int(q * 100)}")
                for i, q in enumerate(_QUANTILES)
            ],
        )
    )


@register(
    "av05_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) AS p25,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.75), 6) AS p75,
           ROUND(quantile_cont(value, 0.95), 6) AS p95
    FROM events GROUP BY event_type
    """,
    doc=(
        "Exact linear-interpolation percentiles per group. At 100 TB exact "
        "percentile needs a full sort per group — av11's KMV / "
        "approx_percentile is the scale path; this is the truth baseline."
    ),
    tags=("aggregate", "percentile"),
)
def av05(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _quantile_agg(spark, sf_dir, F.percentile)


# ---------------------------------------------------------------------------
# as-of join (union + window merge pattern)
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: dict[str, str],
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` on the same key.

    Implementation is the sort-merge pattern Spark lacks as a primitive:
    union both sides tagged, window ``last(right_struct, ignoreNulls)``
    over (key) ordered by (ts, side) — right rows sort before left rows
    at equal ts so '<=' semantics hold. ONE shuffle on the key; no
    per-row subquery, no candidate explosion; state per partition is a
    single struct (the running latest right row). This is exactly how
    an interval-state streaming as-of would behave.
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        F.col(key),
        F.col(ts),
        F.struct(*[F.col(c).alias(a) for c, a in right_cols.items()]).alias("_rstruct"),
    ).withColumn("_side", F.lit(0))
    # unionByName aligns by name and null-fills _rstruct on the left side /
    # the left-only columns on the right side.
    both = lt.unionByName(rt, allowMissingColumns=True)
    # _rstruct as the final orderBy term gives right-side ties at equal
    # (key, ts) a total order — without it, last() would return whichever
    # tied right row the shuffle happened to place last (registry rule:
    # every window has a total-order tiebreak).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_rstruct").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn("_m", F.last("_rstruct", ignorenulls=True).over(w))
    out = matched.where(F.col("_side") == 1).drop("_side", "_rstruct")
    for _, a in right_cols.items():
        out = out.withColumn(a, F.col("_m")[a])
    return out.drop("_m")


@register(
    "av06_asof_join",
    oracle=f"""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    errors AS (
      SELECT event_id AS err_event_id, user_id, ts, value AS err_value
      FROM events WHERE event_type = 'error'
    )
    SELECT c.event_id,
           c.user_id,
           STRFTIME(c.ts, '{_TS_FMT_DUCK}') AS click_ts,
           e.err_event_id,
           e.err_value
    FROM clicks c
    ASOF LEFT JOIN errors e
      ON c.user_id = e.user_id AND e.ts <= c.ts
    """,
    doc=(
        "Backward as-of join: each click paired with the user's latest "
        "error at-or-before it. Union+window merge — one shuffle on "
        "user_id (DuckDB oracle uses its native ASOF JOIN)."
    ),
    tags=("join", "asof", "eventtime"),
)
def av06(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    # Merge on ts_ns for full-precision internal determinism. NOTE on the
    # oracle: DuckDB reads this TIMESTAMP(NANOS) parquet as usec TIMESTAMP
    # (typeof(ts) = TIMESTAMP), so its ASOF compares usec-truncated values;
    # the generated ts_ns are all exact usec multiples, so ns and usec
    # comparisons agree on this data. Sub-usec data would need the merge
    # (here and av07's strict >) truncated to usec to match that oracle.
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts", "ts_ns")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_ns", "value"
    )
    joined = asof_join(
        clicks,
        errors,
        key="user_id",
        ts="ts_ns",
        right_cols={"event_id": "err_event_id", "value": "err_value"},
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("click_ts"),
        "err_event_id",
        "err_value",
    )


# ---------------------------------------------------------------------------
# range (interval) join with time-bucket pruning
# ---------------------------------------------------------------------------

_RANGE_S = 3600  # click within 1h after an error (per-user event cadence ~min gap 6-7 min)


@register(
    "av07_range_join",
    oracle=f"""
    SELECT e.event_id AS err_id, c.event_id AS click_id, e.user_id,
           CAST((epoch_us(c.ts) - epoch_us(e.ts)) // 1000 AS BIGINT) AS lag_ms
    FROM events e
    JOIN events c
      ON c.user_id = e.user_id
     AND e.event_type = 'error' AND c.event_type = 'click'
     AND c.ts > e.ts
     AND epoch_us(c.ts) - epoch_us(e.ts) <= CAST({_RANGE_S} AS BIGINT) * 1000000
    """,
    doc=(
        "Range/interval join: clicks within 1h after an error, same user. "
        "Scale path: equi-join on (user_id, bucket) where bucket width = "
        "the 1h range itself, error side exploded to its two candidate "
        "buckets (bk, bk+1) so every in-range pair co-locates; exact range "
        "as post-filter — candidate pairs are per-(key,bucket), never an "
        "unbounded theta join (which Spark would execute as BNLJ)."
    ),
    tags=("join", "range", "eventtime"),
)
def av07(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).withColumn("us", F.expr("ts_ns DIV 1000"))
    bucket_us = _RANGE_S * 1_000_000
    err = (
        ev.where(F.col("event_type") == "error")
        .select(F.col("event_id").alias("err_id"), "user_id", F.col("us").alias("e_us"))
        .withColumn("bk", F.explode(F.array(F.expr(f"e_us DIV {bucket_us}"), F.expr(f"e_us DIV {bucket_us} + 1"))))
    )
    clk = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("us").alias("c_us"),
        F.expr(f"us DIV {bucket_us}").alias("bk"),
    )
    return (
        err.join(clk, ["user_id", "bk"])
        .where((F.col("c_us") > F.col("e_us")) & (F.col("c_us") - F.col("e_us") <= bucket_us))
        .select("err_id", "click_id", "user_id", ((F.col("c_us") - F.col("e_us")) / F.lit(1000)).cast("bigint").alias("lag_ms"))
    )


# ---------------------------------------------------------------------------
# sessionization (gap-based)
# ---------------------------------------------------------------------------

_GAP_MIN = 30


@register(
    "av08_sessionize",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {_GAP_MIN} * 60 * 1000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM ordered
    )
    SELECT user_id, session_seq,
           STRFTIME(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           STRFTIME(MAX(ts), '{_TS_FMT_DUCK}') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM sessioned GROUP BY user_id, session_seq
    """,
    doc=(
        "Gap-based sessionization (30-min inactivity): lag → new-session "
        "flag → running sum = session id → per-session rollup. One "
        "shuffle on user_id; per-partition state is O(1). Streaming "
        "equivalent: session_window/applyInPandasWithState (st03)."
    ),
    tags=("window", "session", "eventtime"),
)
def av08(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    # Order by ts_ns: the oracle's windows compare full ns precision, and
    # usec-tied events must not reorder between engines.
    w = Window.partitionBy("user_id").orderBy("ts_ns")
    gap_us = _GAP_MIN * 60 * 1_000_000
    prev = F.lag(F.expr("ts_ns DIV 1000")).over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(prev.isNull() | (F.expr("ts_ns DIV 1000") - prev > gap_us), 1).otherwise(0),
    )
    run = Window.partitionBy("user_id").orderBy("ts_ns").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessioned = flagged.withColumn("session_seq", F.sum("is_new").over(run))
    return sessioned.groupBy("user_id", "session_seq").agg(
        F.date_format(F.min("ts"), _TS_FMT_SPARK).alias("session_start"),
        F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("session_end"),
        F.count("*").alias("n_events"),
        _dec_sum().alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# lead/lag gap analysis
# ---------------------------------------------------------------------------


@register(
    "av09_lead_lag_gaps",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))) // 1000000
               AS gap_s
      FROM events
    )
    SELECT user_id, COUNT(gap_s) AS n_gaps,
           MIN(gap_s) AS min_gap_s, MAX(gap_s) AS max_gap_s,
           CAST(SUM(gap_s) AS BIGINT) AS total_gap_s
    FROM gaps GROUP BY user_id
    """,
    doc="Inter-event gap stats per user via lag(): integer-second gaps, exact sums.",
    tags=("window",),
)
def av09(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    us = F.expr("ts_ns DIV 1000")
    gap = ((us - F.lag(us).over(w)) / F.lit(1_000_000)).cast("bigint")
    return (
        ev.withColumn("gap_s", gap)
        .groupBy("user_id")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
            F.sum("gap_s").cast("bigint").alias("total_gap_s"),
        )
    )


@register(
    "av10_rank_family",
    oracle="""
    SELECT event_id, event_type,
           NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile,
           CAST(DENSE_RANK() OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS drank,
           ROUND(PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value), 6) AS prank
    FROM events WHERE user_id < 10
    """,
    doc=(
        "Ranking family (ntile/dense_rank/percent_rank) with total-order "
        "tiebreaks where assignment is order-dependent (ntile)."
    ),
    tags=("window", "rank"),
)
def av10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).where(F.col("user_id") < 10)
    w_total = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_val = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w_total).alias("quartile"),
        F.dense_rank().over(w_val).cast("bigint").alias("drank"),
        F.round(F.percent_rank().over(w_val), 6).alias("prank"),
    )


# ---------------------------------------------------------------------------
# deterministic distinct-count sketch (KMV)
# ---------------------------------------------------------------------------

_KMV_K = 32


@register(
    "av11_kmv_sketch",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_exact
      FROM hashed
    )
    SELECT event_type, n_exact,
           CASE WHEN n_exact <= {_KMV_K} THEN CAST(n_exact AS BIGINT)
                ELSE CAST(ROUND(({_KMV_K} - 1) /
                     (CAST(('0x' || substr(MAX(CASE WHEN rn = {_KMV_K} THEN h END), 1, 8))::UBIGINT AS DOUBLE)
                      / 4294967296.0), 0) AS BIGINT)
           END AS approx_distinct
    FROM ranked GROUP BY event_type, n_exact
    """,
    doc=(
        "KMV (k-minimum-values) distinct-user sketch, k=32: estimate = "
        "(k-1)/u_k where u_k is the k-th smallest normalized md5. A "
        "DETERMINISTIC sketch — identical in any engine, mergeable "
        "(union = min-merge of value sets), the oracle-able stand-in for "
        "HLL/approx_count_distinct at 100 TB. Exact count carried for "
        "error inspection."
    ),
    tags=("aggregate", "sketch"),
)
def av11(spark: SparkSession, sf_dir: str) -> DataFrame:
    hashed = (
        _ev(spark, sf_dir)
        .select("event_type", F.md5(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_exact", F.count("*").over(Window.partitionBy("event_type"))
    )
    u_k = F.conv(F.substring(F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)
    return ranked.groupBy("event_type", "n_exact").agg(
        F.when(F.col("n_exact") <= _KMV_K, F.col("n_exact").cast("bigint"))
        .otherwise(F.round((_KMV_K - 1) / u_k, 0).cast("bigint"))
        .alias("approx_distinct")
    )


#: percentile_approx(accuracy=A) guarantees the returned element's exact
#: rank is within eps*N of the target rank, eps = 1/A. The registered
#: output is the tolerance VERDICT (per group, per level): sketch answers
#: are algorithm-specific so their values can't hash-match a different
#: engine, but "is the answer's empirical rank inside the published
#: bound" is engine-independent — the oracle asserts TRUE per cell and
#: anchors n_rows exactly, so the driver's hash gate becomes a real
#: tolerance check instead of rows-only.
_AV12_ACCURACY = 10000
_AV12_EPS = 2.0 / _AV12_ACCURACY  # published bound + equal-value slack


@register(
    "av12_approx_percentile",
    oracle="""
    SELECT event_type, COUNT(*) AS n_rows,
           TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p95_ok
    FROM events GROUP BY event_type
    """,
    doc=(
        "approx_percentile (KLL/GK sketch): the 100 TB scale path for "
        "av05's exact percentiles — single pass, mergeable partials, no "
        "per-group sort. Tolerance oracle: each group/level cell is TRUE "
        "iff the sketch answer's exact rank (counted against the raw "
        "data) lies within the published eps=1/accuracy rank bound; "
        "DuckDB asserts the same cells TRUE and anchors exact n_rows. "
        "Point accuracy is additionally pinned in tests/test_advanced.py."
    ),
    tags=("aggregate", "percentile", "sketch"),
)
def av12(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("event_type", "value")
    approx = _quantile_agg(
        spark,
        sf_dir,
        lambda c, levels: F.percentile_approx(c, levels, F.lit(_AV12_ACCURACY)),
    )
    # Re-scan events once, broadcast the O(#groups) sketch answers onto it,
    # and count each answer's exact rank interval [cnt_lt+1, cnt_le] in the
    # same single aggregation (one shuffle on event_type).
    j = ev.join(F.broadcast(approx), "event_type")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for q in _QUANTILES:
        p = f"p{int(q * 100)}"
        aggs.append(F.sum(F.when(F.col("value") < F.col(p), 1).otherwise(0)).alias(f"_lt_{p}"))
        aggs.append(F.sum(F.when(F.col("value") <= F.col(p), 1).otherwise(0)).alias(f"_le_{p}"))
    counted = j.groupBy("event_type").agg(*aggs)
    checks = []
    for q in _QUANTILES:
        p = f"p{int(q * 100)}"
        lo = (F.lit(q) - F.lit(_AV12_EPS)) * F.col("n_rows")
        hi = (F.lit(q) + F.lit(_AV12_EPS)) * F.col("n_rows") + F.lit(1.0)
        # rank interval of the returned element intersects [lo, hi]
        checks.append(
            ((F.col(f"_lt_{p}") + 1 <= hi) & (F.col(f"_le_{p}") >= lo)).alias(f"{p}_ok")
        )
    return counted.select("event_type", "n_rows", *checks)


@register(
    "av13_moments",
    oracle="""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(round(value * 100) AS BIGINT)) AS sc,
             SUM(CAST(round(value * 100) AS HUGEINT) * CAST(round(value * 100) AS BIGINT)) AS sc2,
             SUM(user_id) AS su,
             SUM(CAST(user_id AS HUGEINT) * user_id) AS su2,
             SUM(CAST(round(value * 100) AS HUGEINT) * user_id) AS scu
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(sc / 100.0 / n, 6) AS mean_value,
           ROUND((sc2 - CAST(sc AS DOUBLE) * sc / n) / 10000.0 / (n - 1), 6) AS var_value,
           ROUND((scu - CAST(sc AS DOUBLE) * su / n)
                 / sqrt((sc2 - CAST(sc AS DOUBLE) * sc / n) * (su2 - CAST(su AS DOUBLE) * su / n)), 6)
             AS corr_value_user
    FROM s
    """,
    doc=(
        "Statistical moments (mean / sample variance / Pearson corr) from "
        "EXACT integer sufficient statistics: Σc, Σc², Σu, Σu², Σcu over "
        "integer cents — order-independent partial aggregation (unlike "
        "float Welford merges, which differ run-to-run and engine-to-"
        "engine), final moments derived in one double expression. The "
        "only cross-engine-deterministic way to oracle-check stddev/corr."
    ),
    tags=("aggregate", "statistics"),
)
def av13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.round(F.col("value") * 100).cast("bigint")
    u = F.col("user_id")
    # Second moments in DECIMAL(38,0) / HUGEINT on both sides: u*u can
    # pass 2^63 PER ROW at real id widths (Spark wraps, DuckDB errors on
    # the int64 multiply), and every product sum wraps long before the
    # plain sums do. The decimal→double at the end is the same double
    # the long path produced at every test SF (values < 2^53).
    cd, ud = c.cast("decimal(38,0)"), u.cast("decimal(38,0)")
    s = _ev(spark, sf_dir).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cd).alias("sc"),
        F.sum(cd * c).alias("sc2"),
        F.sum(ud).alias("su"),
        F.sum(ud * u).alias("su2"),
        F.sum(cd * u).alias("scu"),
    )
    n, sc, sc2, su, su2, scu = [F.col(x) for x in ("n", "sc", "sc2", "su", "su2", "scu")]
    return s.select(
        "event_type",
        "n",
        F.round(sc / 100.0 / n, 6).alias("mean_value"),
        F.round((sc2 - sc.cast("double") * sc / n) / 10000.0 / (n - 1), 6).alias("var_value"),
        F.round(
            (scu - sc.cast("double") * su / n)
            / F.sqrt((sc2 - sc.cast("double") * sc / n) * (su2 - su.cast("double") * su / n)),
            6,
        ).alias("corr_value_user"),
    )


#: approx_count_distinct (HyperLogLog++) relative standard deviation. The
#: sketch's error is probabilistic (rsd = standard error), so the verdict
#: bound is 5 sigma — astronomically unlikely to trip on a correct
#: implementation, while a broken sketch (or a wrong merge) lands far
#: outside it. Same engine-independent tolerance-verdict shape as av12.
_AV14_RSD = 0.05
_AV14_BOUND = 5 * _AV14_RSD


@register(
    "av14_hll_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS hll_ok
    FROM events GROUP BY event_type
    """,
    doc=(
        "HyperLogLog++ distinct count (approx_count_distinct): the 100 TB "
        "scale path for q17's exact COUNT(DISTINCT) — single pass, "
        "fixed-size mergeable sketch per partition, no distinct shuffle. "
        "Tolerance oracle (av12 pattern): per group, TRUE iff the sketch "
        "estimate is within 5*rsd of the exact count, which is computed "
        "in the same aggregation and anchored exactly by DuckDB. "
        "Completes the sketch family: KMV (av11), quantile (av12), "
        "moments (av13), cardinality (av14)."
    ),
    tags=("aggregate", "sketch", "distinct"),
)
def av14(spark: SparkSession, sf_dir: str) -> DataFrame:
    est = F.approx_count_distinct("user_id", rsd=_AV14_RSD)
    exact = F.countDistinct("user_id")
    return (
        _ev(spark, sf_dir)
        .groupBy("event_type")
        .agg(est.alias("_est"), exact.alias("n_exact"))
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("_est") - F.col("n_exact"))
                <= F.lit(_AV14_BOUND) * F.col("n_exact")
            ).alias("hll_ok"),
        )
    )


@register(
    "av15_unpivot",
    oracle=f"""
    WITH wide AS (
      SELECT user_id % 10 AS user_band,
             {", ".join(
                 f"CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(14,2)) END) AS DOUBLE) AS sum_{t}"
                 for t in EVENT_TYPES
             )}
      FROM events GROUP BY user_id % 10
    )
    SELECT user_band, event_type, sum_value FROM (
      {" UNION ALL ".join(
          f"SELECT user_band, '{t}' AS event_type, sum_{t} AS sum_value FROM wide"
          for t in EVENT_TYPES
      )}
    ) WHERE sum_value IS NOT NULL
    """,
    doc=(
        "Unpivot (melt): av04's wide per-band sums back to long "
        "(band, event_type, sum_value) via the native unpivot operator "
        "— wide→long reshaping for metrics/feature tables, a pure "
        "narrow projection (no shuffle beyond av04's own aggregate; "
        "NULL cells dropped like Spark's unpivot does)."
    ),
    tags=("reshape", "unpivot"),
)
def av15(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        _ev(spark, sf_dir)
        .groupBy((F.col("user_id") % 10).alias("user_band"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(_dec_sum())
        .withColumnsRenamed({t: f"sum_{t}" for t in EVENT_TYPES})
    )
    return wide.unpivot(
        ids=["user_band"],
        values=[f"sum_{t}" for t in EVENT_TYPES],
        variableColumnName="event_type",
        valueColumnName="sum_value",
    ).select(
        "user_band",
        F.expr("substring(event_type, 5)").alias("event_type"),
        "sum_value",
    ).where(F.col("sum_value").isNotNull())


#: nearest-as-of tolerance (both directions)
_NEAREST_TOL_S = 1800


@register(
    "av16_nearest_asof",
    oracle=f"""
    SELECT click_id, user_id, err_id, lag_us FROM (
      SELECT c.event_id AS click_id, c.user_id, e.event_id AS err_id,
             CAST(epoch_us(e.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us,
             ROW_NUMBER() OVER (
               PARTITION BY c.event_id
               ORDER BY abs(epoch_us(e.ts) - epoch_us(c.ts)), e.ts, e.event_id
             ) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      JOIN (SELECT * FROM events WHERE event_type = 'error') e
        ON e.user_id = c.user_id
       AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= CAST({_NEAREST_TOL_S} AS BIGINT) * 1000000
    ) WHERE rn = 1
    """,
    doc=(
        "Nearest-direction as-of join (pandas merge_asof "
        "direction='nearest'): each click pairs with the closest error "
        "in EITHER direction within a ±30 min tolerance; signed lag "
        "keeps the direction. Same bucketed shape as av07: the error "
        "side explodes to its three candidate buckets (bk-1, bk, bk+1 at "
        "bucket width = tolerance) so every in-tolerance pair "
        "co-locates on (user_id, bucket) — an equi-join plus argmin "
        "window, never an unbounded theta join. Ties break on earlier "
        "error then event_id (total order). Clicks with no error in "
        "tolerance drop (inner as-of)."
    ),
    tags=("join", "asof", "eventtime"),
)
def av16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).withColumn("us", F.expr("ts_ns DIV 1000"))
    tol_us = _NEAREST_TOL_S * 1_000_000
    err = (
        ev.where(F.col("event_type") == "error")
        .select(F.col("event_id").alias("err_id"), "user_id", F.col("us").alias("e_us"))
        .withColumn(
            "bk",
            F.explode(
                F.array(
                    F.expr(f"e_us DIV {tol_us} - 1"),
                    F.expr(f"e_us DIV {tol_us}"),
                    F.expr(f"e_us DIV {tol_us} + 1"),
                )
            ),
        )
    )
    clk = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("us").alias("c_us"),
        F.expr(f"us DIV {tol_us}").alias("bk"),
    )
    cand = (
        clk.join(err, ["user_id", "bk"])
        .where(F.abs(F.col("e_us") - F.col("c_us")) <= tol_us)
        # a (click, error) pair can co-locate in up to 2 shared buckets —
        # dedup before the argmin so row_number sees each pair once
        .dropDuplicates(["click_id", "err_id"])
    )
    w = Window.partitionBy("click_id").orderBy(
        F.abs(F.col("e_us") - F.col("c_us")).asc(), F.col("e_us").asc(), F.col("err_id").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "click_id",
            "user_id",
            "err_id",
            # exact integer usec lag: no ms division whose floor-vs-
            # truncate semantics could diverge across engines on
            # negative (forward-direction) lags
            (F.col("e_us") - F.col("c_us")).alias("lag_us"),
        )
    )


@register(
    "xf01_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS mv FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS mc
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.mv
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS mp
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.mc
      GROUP BY e.user_id
    )
    SELECT 'view' AS step, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL SELECT 'view>click', (SELECT COUNT(*) FROM c)
    UNION ALL SELECT 'view>click>purchase', (SELECT COUNT(*) FROM p)
    """,
    doc=(
        "Funnel analysis (sequential pattern): users whose FIRST view "
        "precedes a click that precedes a purchase, counted per prefix "
        "step — the event-analytics staple. Each step is a keyed "
        "min-aggregate semi-joined to the previous step's anchor "
        "timestamp: per step one shuffle on user_id (partial-agg "
        "friendly), anchors are one row per user so the join side "
        "stays key-sized at any scale."
    ),
    tags=("aggregate", "funnel", "eventtime"),
)
def xf01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "event_type", "ts")
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("mv"))
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("mv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("mc"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("mc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("mp"))
    )
    return (
        v.agg(F.lit("view").alias("step"), F.count(F.lit(1)).alias("n_users"))
        .unionByName(c.agg(F.lit("view>click").alias("step"), F.count(F.lit(1)).alias("n_users")))
        .unionByName(
            p.agg(F.lit("view>click>purchase").alias("step"), F.count(F.lit(1)).alias("n_users"))
        )
    )


@register(
    "xr01_range_frame_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_cents
    FROM events
    """,
    doc=(
        "RANGE-interval window frame: per user, the rolling 1-hour sum "
        "of value (exact integer cents) — a VALUE-based frame over "
        "event time, not a row-count frame (q25 covers ROWS frames). "
        "Frame bounds on epoch microseconds so both engines resolve the "
        "identical peer sets; one shuffle on user_id, running-frame "
        "state is O(events in the hour window) per key."
    ),
    tags=("window", "eventtime", "rangeframe"),
)
def xr01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).cast("bigint").alias("rolling_cents"),
    )


@register(
    "xg01_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    doc=(
        "Event-sequence transition counts (Markov sufficient "
        "statistics): per user, consecutive event-type pairs under the "
        "total (ts, event_id) order, counted globally — the behavioral "
        "transition matrix feeding next-event models and anomaly "
        "scores. One shuffle on user_id for the lag, one tiny "
        "(|types|^2-cardinality) aggregate with map-side partials."
    ),
    tags=("window", "sequence", "statistics"),
)
def xg01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")).asc(), F.col("event_id").asc())
    return (
        ev.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "xy01_builtin_session_window",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {_GAP_MIN} * 60 * 1000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM sessioned GROUP BY user_id, session_seq
    """,
    doc=(
        "Built-in session_window (gap-based session assignment as ONE "
        "native grouping expression): the engine-primitive counterpart "
        "of av08's manual lag+cumsum islands — same 30-min-gap "
        "semantics, verified against the same islands oracle. One "
        "shuffle on (user, session); the same operator the streaming "
        "engine uses for session windows, here on a batch frame."
    ),
    tags=("window", "session", "eventtime"),
)
def xy01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), f"{_GAP_MIN} minutes").alias("sw"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("sum_cents"),
        )
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), _TS_FMT_SPARK).alias("session_start"),
            "n_events",
            "sum_cents",
        )
    )


#: Epoch-anchored week length in microseconds — both engines derive the
#: week index with the same non-negative integer division, so cohort
#: assignment can't drift on engine-specific WEEK/DOW truncation rules.
_WEEK_US = 7 * 86_400 * 1_000_000


@register(
    "xc01_cohort_retention",
    oracle=f"""
    WITH wk AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS wk FROM events
    ),
    first AS (
      SELECT user_id, MIN(wk) AS cohort_wk FROM wk GROUP BY user_id
    ),
    act AS (
      SELECT f.cohort_wk, w.wk - f.cohort_wk AS week_offset, COUNT(*) AS n_users
      FROM wk w JOIN first f USING (user_id)
      GROUP BY f.cohort_wk, w.wk - f.cohort_wk
    ),
    size AS (
      SELECT cohort_wk, COUNT(*) AS cohort_size FROM first GROUP BY cohort_wk
    )
    SELECT a.cohort_wk, a.week_offset, a.n_users, s.cohort_size,
           CAST((1000000 * a.n_users) // s.cohort_size AS BIGINT) AS retention_ppm
    FROM act a JOIN size s USING (cohort_wk)
    """,
    doc=(
        "Weekly cohort retention matrix: users grouped by the "
        "epoch-anchored week of their first event; for each (cohort, "
        "week-offset) cell, the distinct active users and the exact "
        "integer retention rate in ppm. The canonical product-analytics "
        "rollup. Shape: ONE shuffle on user_id — collect_set folds the "
        "distinct (user, week) activity AND the per-user min into a "
        "single aggregate (the week-set per user is bounded by the "
        "observation span, never by event volume), so the event stream "
        "crosses the wire once; the cohort matrix is then a tiny "
        "(#cohorts x #offsets) aggregate, and cohort SIZE is read off "
        "the matrix's own offset-0 cell (every user is active in their "
        "first week by definition) via a cohort-keyed window over the "
        "matrix — never a second user-level aggregate, and never a "
        "self-join that would duplicate the big subtree. At 1e9 users "
        "the wide stage is the one user_id exchange; plan test pins "
        "exactly 3 hash exchanges (1 user-sized + 2 matrix-sized)."
    ),
    tags=("aggregate", "eventtime", "analytics"),
)
def xc01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    per_user = (
        ev.select("user_id", F.expr(f"unix_micros(ts) DIV {_WEEK_US}").alias("wk"))
        .groupBy("user_id")
        .agg(F.collect_set("wk").alias("wks"))
    )
    act = (
        per_user.select(
            F.array_min("wks").alias("cohort_wk"), F.explode("wks").alias("wk")
        )
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    size = F.sum(F.when(F.col("week_offset") == 0, F.col("n_users"))).over(
        Window.partitionBy("cohort_wk")
    )
    return act.withColumn("cohort_size", size).select(
        "cohort_wk",
        "week_offset",
        "n_users",
        "cohort_size",
        F.expr("(1000000 * n_users) DIV cohort_size").alias("retention_ppm"),
    )


@register(
    "xc02_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS max_ts FROM events),
    per_user AS (
      SELECT user_id,
             DATEDIFF('day', MAX(ts), ANY_VALUE(a.max_ts)) AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(round(value * 100) AS BIGINT)) AS monetary_cents
      FROM events CROSS JOIN anchor a GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, monetary_cents,
             NTILE(4) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
             NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f_score,
             NTILE(4) OVER (ORDER BY monetary_cents DESC, user_id) AS m_score
      FROM per_user
    )
    SELECT r_score, f_score, m_score, COUNT(*) AS n_users,
           CAST(SUM(monetary_cents) AS BIGINT) AS sum_cents
    FROM scored GROUP BY r_score, f_score, m_score
    """,
    doc=(
        "RFM (recency / frequency / monetary) customer segmentation: "
        "per-user aggregates scored into quartiles along three "
        "orderings (each with a user_id total-order tiebreak, so the "
        "quartile boundaries are deterministic in both engines), then "
        "the <=64-cell segment census. Monetary goes through integer "
        "cents. Shape: the big reduction is the per-user aggregate "
        "(one user_id shuffle, map-side partials); the three quartile "
        "scores ride operators/scalerank.py — range-partitioned exact "
        "global rank + the closed-form ntile_expr bucket map — so NO "
        "stage funnels the O(users) frame through one reducer (the "
        "NTILE-spelled oracle stays as the semantic truth anchor and "
        "proves the rewrite hash-neutral)."
    ),
    tags=("aggregate", "window", "analytics"),
)
def xc02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scalerank import global_rank, ntile_expr

    ev = _ev(spark, sf_dir)
    anchor = ev.agg(F.max("ts").alias("max_ts"))
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.datediff(F.any_value("max_ts"), F.max("ts")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("monetary_cents"),
        )
    )
    # Three exact NTILE(4)s without a single-reducer sort: chain one
    # scale-safe global_rank per ordering (each is a range shuffle of
    # the already-reduced O(users) frame + a PARALLEL per-partition
    # window), then map rank -> quartile with the closed-form bucket
    # sizes both engines' NTILE implements.
    r1, n_users = global_rank(
        per_user, [F.col("recency_days").asc(), F.col("user_id").asc()], rank_col="_rk_r"
    )
    r1 = r1.withColumn("r_score", ntile_expr("_rk_r", n_users, 4))
    r2, _ = global_rank(
        r1, [F.col("frequency").desc(), F.col("user_id").asc()], rank_col="_rk_f"
    )
    r2 = r2.withColumn("f_score", ntile_expr("_rk_f", n_users, 4))
    r3, _ = global_rank(
        r2, [F.col("monetary_cents").desc(), F.col("user_id").asc()], rank_col="_rk_m"
    )
    scored = r3.withColumn("m_score", ntile_expr("_rk_m", n_users, 4))
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("monetary_cents").cast("bigint").alias("sum_cents"),
    )


_DAY_US = 86_400 * 1_000_000
#: xk02 tolerance: HLL lgK=12 has ~1.6% rsd; 5% absorbs small-count noise.
_XK02_BOUND = 0.05


@register(
    "xk02_hll_rollup_merge",
    oracle=f"""
    SELECT epoch_us(ts) // {7 * _DAY_US} AS wk,
           COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS merged_ok
    FROM events GROUP BY epoch_us(ts) // {7 * _DAY_US}
    """,
    doc=(
        "Hierarchical sketch rollup: per-DAY HyperLogLog sketches "
        "(hll_sketch_agg) merged register-wise into per-WEEK "
        "cardinalities (hll_union_agg) — the mergeable-partials "
        "pattern that makes 100 TB distinct-count dashboards "
        "incremental: daily sketch bytes are computed once at ingest "
        "(O(4KB) each, uz04's incremental-rollup discipline applied "
        "to sketches), and ANY coarser rollup (week/month/quarter) is "
        "a union over stored partials — never a re-scan of raw "
        "events. Tolerance oracle (av14 pattern): TRUE iff the merged "
        "estimate lands within 5% of the exact weekly distinct, "
        "anchored exactly by DuckDB; a unit test additionally pins "
        "merged == direct-weekly sketch equality (union exactness)."
    ),
    tags=("aggregate", "sketch", "incremental"),
)
def xk02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "user_id",
        F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day"),
        F.expr(f"unix_micros(ts) DIV {7 * _DAY_US}").alias("wk"),
    )
    daily = ev.groupBy("wk", "day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    weekly_est = daily.groupBy("wk").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est")
    )
    weekly_exact = ev.groupBy("wk").agg(F.count_distinct("user_id").alias("n_exact"))
    return weekly_exact.join(weekly_est, "wk").select(
        "wk",
        "n_exact",
        (
            F.abs(F.col("_est") - F.col("n_exact"))
            <= F.lit(_XK02_BOUND) * F.col("n_exact")
        ).alias("merged_ok"),
    )


@register(
    "xr02_grouped_linreg",
    oracle="""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE))) AS sx,
             SUM(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE))
                 * DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE))) AS sx2,
             SUM(CAST(round(value * 100) AS BIGINT)) AS sy,
             SUM(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE))
                 * CAST(round(value * 100) AS BIGINT)) AS sxy
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sx2 - sx * sx AS DOUBLE), 6) AS slope_cents_per_day,
           ROUND(CAST(sy * sx2 - sx * sxy AS DOUBLE)
                 / CAST(n * sx2 - sx * sx AS DOUBLE), 6) AS intercept_cents
    FROM s
    """,
    doc=(
        "Per-group OLS trend line (value-cents regressed on event day) "
        "from EXACT integer sufficient statistics — av13's discipline "
        "extended to regression: Σx, Σx², Σy, Σxy over integer "
        "day/cents accumulate order-independently with map-side "
        "partials (float regr_slope accumulators differ run-to-run at "
        "scale), and slope/intercept fall out of one closed-form "
        "double expression over exact integers — both engines divide "
        "the SAME two integers, so the rounded doubles agree exactly. "
        "One shuffle, #groups output rows. The trend-metric primitive "
        "for drift detection over 100 TB of event history."
    ),
    tags=("aggregate", "statistics", "regression"),
)
def xr02(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).cast("bigint")
    y = F.round(F.col("value") * 100).cast("bigint")
    # DECIMAL(38,0) sufficient statistics (av13's hardening): the Σxy
    # accumulator and the derived n·Σx² − (Σx)² products wrap int64 at
    # fact-scale row counts; the oracle's HUGEINT sums are exact
    # throughout, so the long spelling diverges silently at scale. The
    # final doubles are unchanged at every test SF.
    xd, yd = x.cast("decimal(38,0)"), y.cast("decimal(38,0)")
    s = (
        _ev(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(xd).alias("sx"),
            F.sum(xd * x).alias("sx2"),
            F.sum(yd).alias("sy"),
            F.sum(xd * y).alias("sxy"),
        )
    )
    den = (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        "event_type",
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / den, 6
        ).alias("slope_cents_per_day"),
        F.round(
            (F.col("sy") * F.col("sx2") - F.col("sx") * F.col("sxy")).cast("double") / den, 6
        ).alias("intercept_cents"),
    )


@register(
    "xw03_rolling_distinct_users",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
    ),
    contrib AS (
      SELECT user_id, day + o AS wday FROM ud, UNNEST(generate_series(0, 6)) AS t(o)
    )
    SELECT wday, COUNT(DISTINCT user_id) AS dau7
    FROM contrib GROUP BY wday
    """,
    doc=(
        "Rolling 7-day distinct users (the sliding-window DISTINCT "
        "metric no window frame can express, since distinct doesn't "
        "decompose over frame slides): each (user, day) activity pair "
        "CONTRIBUTES itself to the 7 window-end days it falls inside "
        "(explode of a 7-element sequence), then one count-distinct "
        "per window-end day — trailing-window semantics, edges "
        "included. Bounded 7x row amplification of the already-"
        "deduplicated (user, day) frame, partial-agg friendly, no "
        "self-join of the event table against 7 shifted copies. At "
        "100 TB swap the exact inner distinct for per-day HLL "
        "sketches unioned across the 7 contributing days (xk02's "
        "mergeable partials) — same contribution shape, O(sketch) "
        "state per day."
    ),
    tags=("aggregate", "eventtime", "sliding", "distinct"),
)
def xw03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = (
        _ev(spark, sf_dir)
        .select("user_id", F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day"))
        .distinct()
    )
    contrib = ud.select(
        "user_id", F.explode(F.expr("sequence(day, day + 6)")).alias("wday")
    )
    return contrib.groupBy("wday").agg(F.count_distinct("user_id").alias("dau7"))


@register(
    "xl01_gap_fill_locf",
    oracle=f"""
    WITH obs AS (
      SELECT user_id, epoch_us(ts) // {_DAY_US} AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY user_id),
    spine AS (
      SELECT user_id, d0 + o AS day
      FROM span, UNNEST(generate_series(0, d1 - d0)) AS t(o)
    ),
    j AS (
      SELECT s.user_id, s.day, o.cents
      FROM spine s LEFT JOIN obs o USING (user_id, day)
    )
    SELECT user_id, day,
           LAST_VALUE(cents IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING
           ) AS cents_filled,
           (cents IS NOT NULL) AS is_observed
    FROM j
    """,
    doc=(
        "Time-series resample + forward-fill (LOCF gap fill): each "
        "user's daily observations are projected onto a dense daily "
        "spine (sequence-explode between the user's first and last "
        "active day — generated, never materialized as a calendar "
        "table) and gaps carry the last observation forward via "
        "last(..., ignorenulls) over an unbounded-preceding frame — "
        "O(1) running state per row, the standard panel-data / "
        "feature-freshness densification. Integer cents observations. "
        "Every stage is keyed on user_id (obs aggregate, span, spine "
        "join, fill window) — one key domain end to end, so at 1e9 "
        "users the plan is a chain of co-keyed exchanges AQE can "
        "coalesce, with spine width bounded by the observation span."
    ),
    tags=("window", "eventtime", "timeseries"),
)
def xl01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    obs = (
        ev.select(
            "user_id",
            F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("cents").alias("cents"))
    )
    span = obs.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = span.select(
        "user_id", F.explode(F.expr("sequence(d0, d1)")).alias("day")
    )
    j = spine.join(obs, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.last("cents", ignorenulls=True).over(w).alias("cents_filled"),
        F.col("cents").isNotNull().alias("is_observed"),
    )


@register(
    "xf02_funnel_latency",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS mv FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS mc
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.mv
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS mp
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.mc
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT 'view>click' AS step_pair,
             epoch_us(c.mc) - epoch_us(v.mv) AS us
      FROM c JOIN v USING (user_id)
      UNION ALL
      SELECT 'click>purchase',
             epoch_us(p.mp) - epoch_us(c.mc)
      FROM p JOIN c USING (user_id)
    ),
    ranked AS (
      SELECT step_pair, us,
             ROW_NUMBER() OVER (PARTITION BY step_pair ORDER BY us) AS rn,
             COUNT(*) OVER (PARTITION BY step_pair) AS n
      FROM lat
    )
    SELECT step_pair, MAX(n) AS n_converted,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN us END) AS p50_us,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN us END) AS p90_us
    FROM ranked GROUP BY step_pair
    """,
    doc=(
        "Funnel conversion latency: xf01's sequential step anchors "
        "(first view -> first subsequent click -> first subsequent "
        "purchase) extended with the time-to-convert distribution per "
        "step pair — DISCRETE p50/p90 of the integer microsecond "
        "deltas, selected by exact rank ceil(q*n) so the reported "
        "quantile is an actual observed delta. (Interpolated "
        "percentiles were the first cut: Spark's and DuckDB's linear "
        "interpolation disagree in the last double ulp, and the "
        "bigint cast amplified that to an off-by-one at one scale "
        "factor — rank selection is integer-exact at every SF.) The "
        "metric funnels are actually read for: WHERE users drop off "
        "and HOW LONG conversion takes. Anchors are one row per "
        "user, so every join and the quantile input stay key-sized; "
        "two-row output."
    ),
    tags=("aggregate", "funnel", "eventtime", "percentile"),
)
def xf02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "event_type", "ts")
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("mv"))
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("mv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("mc"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("mc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("mp"))
    )
    lat = (
        c.join(v, "user_id")
        .select(
            F.lit("view>click").alias("step_pair"),
            (F.unix_micros("mc") - F.unix_micros("mv")).alias("us"),
        )
        .unionByName(
            p.join(c, "user_id").select(
                F.lit("click>purchase").alias("step_pair"),
                (F.unix_micros("mp") - F.unix_micros("mc")).alias("us"),
            )
        )
    )
    wp = Window.partitionBy("step_pair")
    ranked = lat.select(
        "step_pair",
        "us",
        F.row_number().over(wp.orderBy("us")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return ranked.groupBy("step_pair").agg(
        F.max("n").alias("n_converted"),
        F.max(F.when(F.expr("rn = (n + 1) DIV 2"), F.col("us"))).alias("p50_us"),
        F.max(F.when(F.expr("rn = (9 * n + 9) DIV 10"), F.col("us"))).alias("p90_us"),
    )


#: xr03 CUSUM alarm threshold: cumulative deviation beyond 3x the mean
#: daily count (numerators cross-multiplied — no float shares).
_CUSUM_H_NUM, _CUSUM_H_DEN = 3, 1


@register(
    "xr03_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {86_400 * 1_000_000} AS day, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    base AS (SELECT SUM(c) AS total, COUNT(*) AS nd FROM daily),
    dev AS (
      SELECT d.day, d.c,
             SUM(d.c * b.nd - b.total) OVER (ORDER BY d.day
                                             ROWS UNBOUNDED PRECEDING) AS cusum_num,
             b.nd, b.total
      FROM daily d CROSS JOIN base b
    )
    SELECT day, c,
           CAST(cusum_num AS BIGINT) AS cusum_num,
           cusum_num * {_CUSUM_H_DEN} > {_CUSUM_H_NUM} * total AS alarm
    FROM dev
    """,
    doc=(
        "CUSUM changepoint detection over daily event volume: the "
        "running sum of deviations from the global mean daily count, "
        "alarmed when it exceeds 3x the mean — the temporal "
        "complement of xa01 (which compares distributions ACROSS "
        "windows; this finds WHEN the level shifted). All integer: "
        "deviations are cross-multiplied (c*nd - total keeps the "
        "mean exact without division), so the cumulative statistic "
        "is engine-exact. One tiny (O(#days)) aggregate + one "
        "running-sum window; the scan is the only data-sized stage. "
        "At scale the daily counts come from uz04's standing rollup "
        "— change detection then never touches raw events."
    ),
    tags=("eventtime", "statistics", "changepoint"),
)
def xr03(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _ev(spark, sf_dir)
        .groupBy(F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    base = daily.agg(F.sum("c").alias("total"), F.count(F.lit(1)).alias("nd"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev = daily.crossJoin(F.broadcast(base)).withColumn(
        "cusum_num",
        F.sum(F.col("c") * F.col("nd") - F.col("total")).over(w),
    )
    return dev.select(
        "day",
        "c",
        "cusum_num",
        (F.col("cusum_num") * _CUSUM_H_DEN > F.lit(_CUSUM_H_NUM) * F.col("total")).alias(
            "alarm"
        ),
    )


@register(
    "xr04_clamped_running_balance",
    oracle="""
    WITH deltas AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN event_type = 'purchase'
                  THEN -CAST(round(value * 100) AS BIGINT)
                  ELSE CAST(round(value * 100) AS BIGINT) END AS d
      FROM events
    ),
    sums AS (
      SELECT user_id, event_id, us, d,
             SUM(d) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS s
      FROM deltas
    ),
    pre AS (
      SELECT user_id, event_id, d, s,
             LEAST(0, MIN(s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING)) AS m
      FROM sums
    )
    SELECT user_id, event_id, d, CAST(s - m AS BIGINT) AS balance_cents
    FROM pre
    """,
    doc=(
        "Floor-clamped running balance — the NON-ASSOCIATIVE "
        "recurrence b_t = max(0, b_(t-1) + d_t) (wallets, inventory, "
        "rate-limiter tokens) solved in closed window form: "
        "b_t = cumsum_t - min(0, running_min(cumsum)) — the "
        "max-drawdown identity — so a recurrence that LOOKS like it "
        "needs row-at-a-time state (applyInPandas, UDAF loops) runs "
        "as two stacked windows over ONE user-keyed exchange, fully "
        "JVM-side at any scale. Purchases debit, everything else "
        "credits, in integer cents with a (ts, event_id) total "
        "order. The identity (not just the algebra mirror in the "
        "oracle) is pinned by a unit test against the literal "
        "row-by-row recursion."
    ),
    tags=("window", "recurrence", "eventtime"),
)
def xr04(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("bigint")
    d = F.when(F.col("event_type") == "purchase", -cents).otherwise(cents)
    deltas = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), d.alias("d")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = deltas.withColumn("s", F.sum("d").over(w)).withColumn(
        "m", F.least(F.lit(0), F.min("s").over(w))
    )
    return pre.select(
        "user_id", "event_id", "d", (F.col("s") - F.col("m")).alias("balance_cents")
    )


@register(
    "xl02_seasonal_decompose",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    trended AS (
      SELECT day, c,
             CASE WHEN COUNT(*) OVER w7 = 7
                  THEN SUM(c) OVER w7 // 7 END AS trend7
      FROM daily
      WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    dow AS (
      SELECT day, c, trend7, day % 7 AS dow,
             SUM(c - trend7) FILTER (WHERE trend7 IS NOT NULL)
               OVER (PARTITION BY day % 7) AS dow_num,
             COUNT(*) FILTER (WHERE trend7 IS NOT NULL)
               OVER (PARTITION BY day % 7) AS dow_n
      FROM trended
    )
    SELECT day, c, CAST(trend7 AS BIGINT) AS trend7, dow,
           CAST(CASE WHEN dow_n > 0 THEN dow_num // dow_n END AS BIGINT) AS dow_effect,
           CAST(CASE WHEN trend7 IS NOT NULL AND dow_n > 0
                THEN c - trend7 - dow_num // dow_n END AS BIGINT) AS residual
    FROM dow
    """,
    doc=(
        "Additive seasonal decomposition of daily event volume: "
        "7-day centered moving-average trend (full windows only), "
        "epoch-anchored day-of-week effect (mean detrended deviation "
        "per dow), and the residual — classic-decomposition "
        "mechanics with every division an integer floor, so the "
        "components are engine-exact (no float means). The "
        "seasonality-aware complement of xr03's level-shift CUSUM: "
        "alarm on RESIDUALS, not raw counts, and weekly rhythm stops "
        "paging you every Monday. Windows run on the O(#days) "
        "aggregate — the scan is the only data-sized stage, and at "
        "scale the daily counts come from uz04's standing rollup."
    ),
    tags=("eventtime", "statistics", "timeseries"),
)
def xl02(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _ev(spark, sf_dir)
        .groupBy(F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn(
        "trend7",
        F.when(F.count(F.lit(1)).over(w7) == 7, F.expr("SUM(c) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) DIV 7")),
    )
    wd = Window.partitionBy(F.expr("day % 7"))
    dow = (
        trended.withColumn("dow", F.expr("day % 7"))
        .withColumn(
            "dow_num",
            F.sum(F.when(F.col("trend7").isNotNull(), F.col("c") - F.col("trend7"))).over(wd),
        )
        .withColumn(
            "dow_n", F.count(F.when(F.col("trend7").isNotNull(), 1)).over(wd)
        )
    )
    # Negative-numerator note: DuckDB's integer // truncates toward
    # zero (SELECT -3 // 2 -> -1), exactly like Spark's DIV — so the
    # truncating form is the cross-engine-consistent one here (Python's
    # flooring // is the odd one out, not DuckDB's).
    fdiv = F.expr("dow_num DIV dow_n")
    dow_effect = F.when(F.col("dow_n") > 0, fdiv)
    return dow.select(
        "day",
        "c",
        "trend7",
        "dow",
        dow_effect.alias("dow_effect"),
        F.when(
            F.col("trend7").isNotNull() & (F.col("dow_n") > 0),
            F.col("c") - F.col("trend7") - fdiv,
        ).alias("residual"),
    )


@register(
    "xg02_user_paths",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             STRING_AGG(event_type, '>' ORDER BY rn) AS path
      FROM ordered WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users
    FROM paths GROUP BY path
    """,
    doc=(
        "User journey path extraction (sankey / flow-diagram prep): "
        "each user's FIRST THREE event types under the total (ts, "
        "event_id) order concatenated into a path string, counted "
        "across users — the onboarding-flow census behind every "
        "product-analytics flow chart (xg01 counts pairwise "
        "transitions anywhere; this keeps position and order from "
        "the journey's start). One user-keyed window + an ordered "
        "in-group string agg + an O(|types|^3)-cardinality count. "
        "The rank filter caps state at 3 rows per user regardless of "
        "history length."
    ),
    tags=("window", "sequence", "analytics"),
)
def xg02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc(), F.col("event_id").asc()
    )
    ordered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 3)
    paths = ordered.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn"), F.col("event_type").alias("t")))
                ),
                lambda s: s["t"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# xg03 — fixed-iteration PageRank over the event-transition graph
# ---------------------------------------------------------------------------

#: Fixed-point scale for PageRank mass (1e12): ranks are BIGINTs in
#: units of 1e-12, so every arithmetic step is exact integer math —
#: float damping sums would make the result depend on accumulation
#: order and diverge between engines at the last ulp.
PR_SCALE = 1_000_000_000_000
PR_ITERS = 3


def _transition_edges(ev: DataFrame) -> DataFrame:
    """Weighted edge list src->dst from per-user consecutive events
    (same derivation as xg01's transition matrix)."""
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")).asc(), F.col("event_id").asc()
    )
    return (
        ev.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
        .where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def pagerank_fixed(nodes: DataFrame, edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Integer-exact weighted PageRank, ``iters`` unrolled iterations.

    rank'(v) = (15*SCALE) DIV 100 + (85 * sum_in((rank(u)*w_uv) DIV out_w(u))) DIV 100

    Deliberate fixed-point semantics: DIV floors once per edge and once
    per damping step, so the result is a deterministic function of the
    graph — reproducible across engines, partitionings, and retries
    (the property float PageRank lacks). Nodes without out-edges drop
    their mass (standard simplification, documented); nodes without
    in-edges keep the base (0.15) mass.

    Scale shape: the expensive part is the ONE windowed pass deriving
    edges; each iteration is a join on the edge list + an aggregate of
    |E| rows into |V| — with |V| (distinct keys) small the rank frame
    broadcasts, so iterations add NO wide shuffle of the event corpus.
    At web scale this becomes the classic partition-by-src iterate
    (rank frame co-partitioned with edges); the unrolled-loop plan here
    is exactly that shape with broadcast substituted for the small side.
    """
    # Materialize the (tiny) graph frames ONCE before iterating: without
    # this, every unrolled iteration re-derives edges and nodes from the
    # event corpus through their full lineage — 22 exchanges / 3+ corpus
    # passes in the executed plan instead of the 5-exchange single-pass
    # form (the same recompute hazard dd02's banding rewrite fixed).
    # localCheckpoint cuts lineage deterministically; |V|+|E| rows only.
    nodes = nodes.localCheckpoint(eager=True)
    outw = edges.groupBy("src").agg(F.sum("cnt").alias("out_w"))
    e = edges.join(outw, "src").localCheckpoint(eager=True)
    rank = nodes.select("node", F.lit(PR_SCALE).cast("bigint").alias("rank"))
    base = (15 * PR_SCALE) // 100
    for _ in range(iters):
        contrib = (
            e.join(F.broadcast(rank.withColumnRenamed("node", "src")), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("(rank * cnt) DIV out_w")).alias("contrib"))
        )
        rank = (
            nodes.join(
                F.broadcast(contrib.withColumnRenamed("dst", "node")), "node", "left"
            )
            .select(
                "node",
                (F.lit(base) + F.expr("(85 * coalesce(contrib, 0)) DIV 100"))
                .cast("bigint")
                .alias("rank"),
            )
        )
    return rank.orderBy("node")


def _pr_oracle_sql(iters: int = PR_ITERS) -> str:
    base = (15 * PR_SCALE) // 100
    ctes = [
        f"""seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    edges AS (
      SELECT prev_type AS src, event_type AS dst, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    outw AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS out_w FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes)"""
    ]
    for i in range(iters):
        ctes.append(
            f"""r{i + 1} AS (
      SELECT n.node,
             CAST({base} + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(SUM((r.rank * e.cnt) // o.out_w) AS BIGINT) AS contrib
        FROM edges e JOIN outw o ON e.src = o.src JOIN r{i} r ON r.node = e.src
        GROUP BY e.dst
      ) c ON n.node = c.node
    )"""
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"\n    SELECT node, rank FROM r{iters} ORDER BY node"
    )


@register(
    "xg03_pagerank_transitions",
    oracle=_pr_oracle_sql(),
    doc=(
        "Fixed-point integer PageRank over the event-type transition "
        "graph (edges = xg01's per-user consecutive-event counts), "
        f"{PR_ITERS} unrolled iterations, damping 0.85, ranks as "
        "BIGINT mass in units of 1e-12. Demonstrates the iterative- "
        "algorithm pattern as deterministic DataFrame algebra: one "
        "wide pass derives the graph, then each iteration is an "
        "edge-join + aggregate with the rank vector broadcast — no "
        "further pass over the corpus (connected-components cousin: "
        "vz01's min-label propagation)."
    ),
    tags=("graph", "iterative"),
)
def xg03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    return pagerank_fixed(nodes, _transition_edges(ev))


# ---------------------------------------------------------------------------
# xl03 — per-user rolling median of event value (trailing 7 events)
# ---------------------------------------------------------------------------

#: Trailing-window length (current row + 6 predecessors).
ROLLMED_LOOKBACK = 6


@register(
    "xl03_rolling_median",
    oracle=f"""
    SELECT event_id, user_id,
           quantile_cont(CAST(ROUND(value * 100, 0) AS BIGINT), 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLLMED_LOOKBACK} PRECEDING AND CURRENT ROW
           ) AS med_cents
    FROM events
    """,
    doc=(
        "Per-user rolling median of the event value over the trailing "
        f"{ROLLMED_LOOKBACK + 1}-event window — the robust-baseline "
        "smoother (median is outlier-immune where xl02's moving mean "
        "is not). Exact discrete median over integer cents with linear "
        "interpolation on even counts (Spark percentile == DuckDB "
        "quantile_cont; interpolated halves of integers are exact in "
        "doubles, so the cross-engine hash is stable — no float "
        "summation anywhere). ONE shuffle on user_id under a rows "
        "frame; state per row is the O(k) trailing buffer, the same "
        "shape as every lag/lead window here (at 100 TB the k-row "
        "frame keeps window state constant-size — contrast an "
        "unbounded range frame whose state grows with history)."
    ),
    tags=("window", "timeseries", "robust"),
)
def xl03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")).asc(), F.col("event_id").asc())
        .rowsBetween(-ROLLMED_LOOKBACK, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    return ev.withColumn("__cents", cents).select(
        "event_id",
        "user_id",
        F.expr("percentile(__cents, 0.5)").over(w).alias("med_cents"),
    )


# ---------------------------------------------------------------------------
# xg04 — triangle listing on the undirected transition graph
# ---------------------------------------------------------------------------


@register(
    "xg04_triangle_list",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    und AS (
      SELECT DISTINCT LEAST(prev_type, event_type) AS a,
                      GREATEST(prev_type, event_type) AS b
      FROM seq WHERE prev_type IS NOT NULL AND prev_type <> event_type
    )
    SELECT e1.a AS a, e1.b AS b, e2.b AS c
    FROM und e1
    JOIN und e2 ON e2.a = e1.b
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ORDER BY a, b, c
    """,
    doc=(
        "Triangle listing over the undirected event-transition graph "
        "(edges = distinct consecutive-event pairs, canonicalized "
        "least/greatest so each undirected edge appears once): the "
        "a<b<c ordered double self-join — each triangle emitted "
        "exactly once, no permutation dedup needed. The classic graph "
        "clustering primitive; at web scale the joins partition on the "
        "shared vertex and the canonical a<b orientation IS the "
        "standard degree-ordering trick that bounds intermediate "
        "wedges. Corpus is touched once (the xg01 window pass); "
        "everything after is |E|-sized."
    ),
    tags=("graph", "join"),
)
def xg04(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")).asc(), F.col("event_id").asc()
    )
    und = (
        ev.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
        .where(F.col("prev_type").isNotNull() & (F.col("prev_type") != F.col("event_type")))
        .select(
            F.least("prev_type", "event_type").alias("a"),
            F.greatest("prev_type", "event_type").alias("b"),
        )
        .distinct()
    )
    e1 = und.alias("e1")
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c")).alias("e2")
    e3 = und.select(F.col("a").alias("a3"), F.col("b").alias("c3")).alias("e3")
    return (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
        .orderBy("a", "b", "c")
    )


# ---------------------------------------------------------------------------
# xr05 — ratio-to-report (per-group share of total, integer ppm)
# ---------------------------------------------------------------------------


@register(
    "xr05_ratio_to_report",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY event_type
    ),
    t AS (SELECT SUM(cents) AS total FROM g)
    SELECT g.event_type, g.cents,
           CAST(CAST(g.cents AS HUGEINT) * 1000000 // t.total AS BIGINT) AS share_ppm
    FROM g CROSS JOIN t
    ORDER BY g.event_type
    """,
    doc=(
        "Ratio-to-report: each event type's share of the global cents "
        "total in integer ppm — the BI percent-of-total shape. "
        "Deliberately NOT the `SUM() OVER ()` unpartitioned window "
        "(which funnels the whole relation through one reducer at "
        "scale): the total is an O(1)-row aggregate broadcast back "
        "over the per-group frame, so both passes are map-combined "
        "group aggregates. Integer cents + integer ppm floor division "
        "keep the output engine/order-invariant."
    ),
    tags=("aggregate", "ratio"),
)
def xr05(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    g = ev.groupBy("event_type").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents")
    )
    t = g.agg(F.sum("cents").alias("total"))
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "event_type",
            "cents",
            # DECIMAL(38,0) DIV: cents*1e6 wraps int64 once the global
            # total nears 1e13 cents (the yq08/xq10 ppm lesson); decimal
            # integral division is exact and matches HUGEINT floor.
            F.expr("CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 DIV total AS BIGINT)").alias("share_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# xz09 — linear-touch revenue attribution (integer-conserving split)
# ---------------------------------------------------------------------------

#: Attribution lookback window (days before the purchase).
ATTR_WINDOW_DAYS = 7


@register(
    "xz09_linear_attribution",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, event_id AS c_eid, epoch_us(ts) AS c_us
      FROM events WHERE event_type = 'click'
    ),
    purch AS (
      SELECT user_id, event_id AS p_eid, epoch_us(ts) AS p_us,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT p.p_eid, p.cents, c.c_eid,
             COUNT(*) OVER (PARTITION BY p.p_eid) AS n,
             ROW_NUMBER() OVER (PARTITION BY p.p_eid ORDER BY c.c_us DESC, c.c_eid DESC) AS rn
      FROM purch p JOIN clicks c
        ON c.user_id = p.user_id
       AND c.c_us < p.p_us
       AND c.c_us >= p.p_us - {ATTR_WINDOW_DAYS * 86400 * 1_000_000}
    )
    SELECT c_eid AS event_id,
           CAST(SUM(cents // n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END) AS BIGINT)
             AS attributed_cents,
           COUNT(DISTINCT p_eid) AS n_purchases
    FROM pairs GROUP BY c_eid ORDER BY c_eid
    """,
    doc=(
        "Linear-touch revenue attribution: each purchase's cents split "
        f"equally across the user's clicks in the prior {ATTR_WINDOW_DAYS} "
        "days, integer floor shares with the REMAINDER credited to the "
        "last touch — so attribution conserves revenue exactly (sum of "
        "attributed cents == sum of attributed purchases' cents, "
        "unit-pinned), which float percentage splits never do. The "
        "user-keyed interval join co-partitions both event subsets on "
        "user_id — one shuffle pair, candidate pairs bounded per user; "
        "at 100 TB add av07's time-bucket blocking so the join "
        "condition prunes buckets, not rows. Window functions keyed by "
        "purchase ride the SAME user-partitioned exchange."
    ),
    tags=("join", "window", "attribution"),
)
def xz09(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    # Distinct aliases on the self-join key: both subsets derive from the
    # SAME parent plan, so purch["user_id"] == clicks["user_id"] resolves
    # to one column (Spark warns "trivially true") and the join silently
    # degenerates to a time-filtered cross join across users.
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"),
        F.col("event_id").alias("c_eid"),
        F.unix_micros(F.col("ts")).alias("c_us"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"),
        F.col("event_id").alias("p_eid"),
        F.unix_micros(F.col("ts")).alias("p_us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    lookback = ATTR_WINDOW_DAYS * 86400 * 1_000_000
    pairs = purch.join(
        clicks,
        (F.col("p_uid") == F.col("c_uid"))
        & (F.col("c_us") < F.col("p_us"))
        & (F.col("c_us") >= F.col("p_us") - F.lit(lookback)),
    )
    wn = Window.partitionBy("p_eid")
    wr = Window.partitionBy("p_eid").orderBy(F.desc("c_us"), F.desc("c_eid"))
    shared = pairs.select(
        "p_eid",
        "cents",
        "c_eid",
        F.count(F.lit(1)).over(wn).alias("n"),
        F.row_number().over(wr).alias("rn"),
    )
    return (
        shared.groupBy(F.col("c_eid").alias("event_id"))
        .agg(
            F.sum(
                F.expr("cents DIV n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END")
            )
            .cast("bigint")
            .alias("attributed_cents"),
            F.count_distinct("p_eid").alias("n_purchases"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# xr06 — Kendall-tau trend detection over per-user daily volume
# ---------------------------------------------------------------------------


@register(
    "xr06_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             epoch_us(ts) // 86400000000 AS day,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY user_id, epoch_us(ts) // 86400000000
    ),
    pairs AS (
      SELECT a.user_id,
             CAST(SUM(CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
             CAST(SUM(CASE WHEN b.cents < a.cents THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
             CAST(SUM(CASE WHEN b.cents = a.cents THEN 1 ELSE 0 END) AS BIGINT) AS ties
      FROM daily a JOIN daily b
        ON a.user_id = b.user_id AND b.day > a.day
      GROUP BY a.user_id
    )
    SELECT user_id, concordant, discordant, ties,
           CAST((1000 * (concordant - discordant))
                // (concordant + discordant + ties) AS BIGINT) AS tau_permille
    FROM pairs ORDER BY user_id
    """,
    doc=(
        "Kendall-tau trend per user: concordant / discordant / tied "
        "day-pair counts of daily spend (later day vs earlier day), "
        "tau in integer permille — the nonparametric monotone-trend "
        "detector (robust where xr02's least-squares slope is outlier-"
        "sensitive, exact where it is float). Pairs are enumerated "
        "per user over the ~30-row DAILY rollup, never raw events: "
        "the O(n²) lives on O(days)² per key after a map-combined "
        "pre-aggregate, so the wide stages are one groupBy and one "
        "co-partitioned self-join on user_id (same-exchange reuse). "
        "All-integer: the gate catches any engine disagreement to the "
        "last pair."
    ),
    tags=("statistics", "trend", "join"),
)
def xr06(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"))
    a = daily.select(
        F.col("user_id").alias("uid_a"), F.col("day").alias("day_a"), F.col("cents").alias("ca")
    )
    b = daily.select(
        F.col("user_id").alias("uid_b"), F.col("day").alias("day_b"), F.col("cents").alias("cb")
    )
    pairs = a.join(
        b, (F.col("uid_a") == F.col("uid_b")) & (F.col("day_b") > F.col("day_a"))
    ).groupBy(F.col("uid_a").alias("user_id")).agg(
        F.sum(F.expr("CASE WHEN cb > ca THEN 1 ELSE 0 END")).alias("concordant"),
        F.sum(F.expr("CASE WHEN cb < ca THEN 1 ELSE 0 END")).alias("discordant"),
        F.sum(F.expr("CASE WHEN cb = ca THEN 1 ELSE 0 END")).alias("ties"),
    )
    return pairs.select(
        "user_id",
        "concordant",
        "discordant",
        "ties",
        F.expr(
            "CAST((1000 * (concordant - discordant))"
            " DIV (concordant + discordant + ties) AS BIGINT)"
        ).alias("tau_permille"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# xz16 — association rules over per-user event-type baskets
# ---------------------------------------------------------------------------


@register(
    "xz16_association_rules",
    oracle="""
    WITH baskets AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT COUNT(DISTINCT user_id) AS total FROM baskets),
    item AS (SELECT event_type, COUNT(*) AS cnt FROM baskets GROUP BY event_type),
    pair AS (
      SELECT a.event_type AS ante, b.event_type AS cons, COUNT(*) AS both
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.ante, p.cons, p.both,
           CAST((p.both * 1000000) // n.total AS BIGINT) AS support_ppm,
           CAST((p.both * 1000000) // ia.cnt AS BIGINT) AS confidence_ppm,
           CAST(CAST(p.both AS HUGEINT) * n.total * 1000000 // (CAST(ia.cnt AS HUGEINT) * ic.cnt) AS BIGINT) AS lift_ppm
    FROM pair p
    JOIN item ia ON ia.event_type = p.ante
    JOIN item ic ON ic.event_type = p.cons
    CROSS JOIN n
    ORDER BY p.ante, p.cons
    """,
    doc=(
        "Market-basket association rules over per-user event-type "
        "baskets: pairwise support / confidence / lift, every metric "
        "an integer-ppm floor division (lift's cross-multiplied form "
        "(both*total*1e6) DIV (cnt_a*cnt_b) keeps it exact — bounded "
        "~1e17 at 1000x this scale, documented). The co-occurrence "
        "self-join runs on the DISTINCT (user, item) basket relation "
        "— one dedup shuffle, then a user-keyed join whose fan-out is "
        "items-per-user choose 2, the Apriori candidate-pair step; "
        "item supports broadcast back onto the pair frame. Token-"
        "level cousin: xt01's PMI (log-scored, windowed); this is the "
        "transaction-level rule-mining form with exact arithmetic."
    ),
    tags=("statistics", "association", "join"),
)
def xz16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    baskets = ev.select("user_id", "event_type").distinct()
    total = baskets.agg(F.count_distinct("user_id").alias("total"))
    item = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    a = baskets.select(F.col("user_id").alias("u"), F.col("event_type").alias("ante"))
    b = baskets.select(F.col("user_id").alias("u2"), F.col("event_type").alias("cons"))
    pair = (
        a.join(b, (F.col("u") == F.col("u2")) & (F.col("ante") < F.col("cons")))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("both"))
    )
    ia = item.select(F.col("event_type").alias("ante"), F.col("cnt").alias("cnt_a"))
    ic = item.select(F.col("event_type").alias("cons"), F.col("cnt").alias("cnt_c"))
    return (
        pair.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(total))
        .select(
            "ante",
            "cons",
            "both",
            F.expr("CAST((both * 1000000) DIV total AS BIGINT)").alias("support_ppm"),
            F.expr("CAST((both * 1000000) DIV cnt_a AS BIGINT)").alias("confidence_ppm"),
            # both*total*1e6 is a triple product of counts — wraps int64
            # at ~1e9-row fact tables; DECIMAL(38,0) keeps it exact.
            F.expr("CAST(CAST(both AS DECIMAL(38,0)) * total * 1000000 DIV (CAST(cnt_a AS DECIMAL(38,0)) * cnt_c) AS BIGINT)").alias(
                "lift_ppm"
            ),
        )
        .orderBy("ante", "cons")
    )


# ---------------------------------------------------------------------------
# xs06 — A/B experiment analysis (integer-exact effect + chi-square parts)
# ---------------------------------------------------------------------------


@register(
    "xs06_ab_test_analysis",
    oracle="""
    WITH arms AS (
      SELECT user_id, user_id % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN arm = 0 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN arm = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN arm = 1 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM arms
    )
    SELECT a, b, c, d,
           CAST((a * 1000000) // (a + b) AS BIGINT) AS p0_ppm,
           CAST((c * 1000000) // (c + d) AS BIGINT) AS p1_ppm,
           CAST((c * 1000000) // (c + d) - (a * 1000000) // (a + b) AS BIGINT) AS delta_ppm,
           CAST(CAST(CAST(a + b + c + d AS DECIMAL(38,0)) * (a * d - b * c) * (a * d - b * c) AS DECIMAL(38,0)) AS VARCHAR) AS chi2_num,
           CAST(CAST(CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d) AS DECIMAL(38,0)) AS VARCHAR) AS chi2_den
    FROM c
    """,
    doc=(
        "Experiment (A/B) analysis: users split into arms by the "
        "deterministic user_id parity, per-arm conversion (any "
        "purchase) as a 2x2 contingency table, conversion rates and "
        "uplift in integer ppm, and the chi-square statistic emitted "
        "as its EXACT integer numerator N*(ad-bc)^2 and denominator "
        "(row x column margins) — DECIMAL(38,0), no float division, "
        "so the gate checks the test statistic to the last digit and "
        "any consumer divides at display time. The per-user reduce is "
        "one map-combined aggregate; the 2x2 rollup is O(1). At 100 "
        "TB the arm column comes from the assignment log — the same "
        "two aggregates, one scan."
    ),
    tags=("statistics", "experiment", "aggregate"),
)
def xs06(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    arms = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted")
    ).select((F.col("user_id") % 2).alias("arm"), "converted")
    c = arms.agg(
        F.sum(F.expr("CASE WHEN arm = 0 AND converted = 1 THEN 1 ELSE 0 END")).cast("bigint").alias("a"),
        F.sum(F.expr("CASE WHEN arm = 0 AND converted = 0 THEN 1 ELSE 0 END")).cast("bigint").alias("b"),
        F.sum(F.expr("CASE WHEN arm = 1 AND converted = 1 THEN 1 ELSE 0 END")).cast("bigint").alias("c"),
        F.sum(F.expr("CASE WHEN arm = 1 AND converted = 0 THEN 1 ELSE 0 END")).cast("bigint").alias("d"),
    )
    return c.select(
        "a",
        "b",
        "c",
        "d",
        F.expr("CAST((a * 1000000) DIV (a + b) AS BIGINT)").alias("p0_ppm"),
        F.expr("CAST((c * 1000000) DIV (c + d) AS BIGINT)").alias("p1_ppm"),
        F.expr(
            "CAST((c * 1000000) DIV (c + d) - (a * 1000000) DIV (a + b) AS BIGINT)"
        ).alias("delta_ppm"),
        # Emitted as strings: DECIMAL(38,0) round-trips lossily through
        # the driver's pandas frames (DuckDB fetchdf → float64, Spark →
        # Decimal objects) — VARCHAR is the one hash-stable spelling of
        # an exact 38-digit statistic. The oracle multiplies DECIMAL-
        # first too, so neither engine can int64-overflow at large SF.
        F.expr(
            "CAST(CAST(CAST(a + b + c + d AS DECIMAL(38,0)) * (a * d - b * c) * (a * d - b * c)"
            " AS DECIMAL(38,0)) AS STRING)"
        ).alias("chi2_num"),
        F.expr(
            "CAST(CAST(CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d)"
            " AS DECIMAL(38,0)) AS STRING)"
        ).alias("chi2_den"),
    )


# ---------------------------------------------------------------------------
# xl04 — seasonal-naive forecast backtest (integer MAE)
# ---------------------------------------------------------------------------


@register(
    "xl04_seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY epoch_us(ts) // 86400000000
    ),
    j AS (
      SELECT a.day, a.cents AS actual, f.cents AS forecast
      FROM daily a JOIN daily f ON f.day = a.day - 7
    )
    SELECT COUNT(*) AS n_days,
           CAST(SUM(ABS(actual - forecast)) AS BIGINT) AS mae_num_cents,
           CAST(MAX(ABS(actual - forecast)) AS BIGINT) AS worst_abs_err_cents
    FROM j
    """,
    doc=(
        "Seasonal-naive forecast backtest: forecast(day) = actual(day "
        "- 7), evaluated over every day with a week-old ancestor — "
        "integer MAE numerator and worst-case error in cents (the "
        "honest baseline every fancier forecaster must beat; xl02's "
        "decomposition supplies the seasonal structure this exploits). "
        "One daily rollup (map-combined), one self-join on the lagged "
        "day key — at years of history both sides are the same tiny "
        "daily table. Emitting the MAE as an exact numerator+count "
        "pair keeps the gate integer-strict."
    ),
    tags=("timeseries", "forecast", "backtest"),
)
def xl04(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    daily = ev.groupBy(F.expr("unix_micros(ts) DIV 86400000000").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents")
    )
    a = daily.select(F.col("day").alias("d"), F.col("cents").alias("actual"))
    f = daily.select((F.col("day") + 7).alias("d"), F.col("cents").alias("forecast"))
    j = a.join(f, "d")
    return j.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("actual") - F.col("forecast"))).cast("bigint").alias("mae_num_cents"),
        F.max(F.abs(F.col("actual") - F.col("forecast"))).cast("bigint").alias(
            "worst_abs_err_cents"
        ),
    )


# ---------------------------------------------------------------------------
# xc03 — net revenue retention by signup cohort (week over week)
# ---------------------------------------------------------------------------


@register(
    "xc03_net_revenue_retention",
    oracle="""
    WITH first_wk AS (
      SELECT user_id, MIN(epoch_us(ts) // 604800000000) AS cohort_wk
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT e.user_id,
             f.cohort_wk,
             epoch_us(e.ts) // 604800000000 - f.cohort_wk AS age_wk,
             CAST(ROUND(e.value * 100, 0) AS BIGINT) AS cents
      FROM events e JOIN first_wk f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    ),
    base AS (
      SELECT cohort_wk, SUM(cents) AS w0_cents FROM rev WHERE age_wk = 0 GROUP BY cohort_wk
    ),
    aged AS (
      SELECT cohort_wk, age_wk, SUM(cents) AS cents
      FROM rev GROUP BY cohort_wk, age_wk
    )
    SELECT a.cohort_wk, a.age_wk, CAST(a.cents AS BIGINT) AS cents,
           CAST(CAST(a.cents AS HUGEINT) * 1000000 // b.w0_cents AS BIGINT) AS nrr_ppm
    FROM aged a JOIN base b ON b.cohort_wk = a.cohort_wk
    WHERE b.w0_cents > 0
    ORDER BY a.cohort_wk, a.age_wk
    """,
    doc=(
        "Net revenue retention: per signup-week cohort (first event "
        "week), purchase revenue at each cohort age as an integer-ppm "
        "ratio to the cohort's week-0 revenue — the expansion/"
        "contraction matrix behind every SaaS retention chart (the "
        "revenue-weighted complement of xc01's user-count retention). "
        "Cohort assignment is one per-user min aggregate broadcast "
        "back onto the purchase stream; the (cohort, age) rollup "
        "map-combines to a ~weeks² frame; week-0 bases broadcast for "
        "the ratio. All integer cents/ppm."
    ),
    tags=("analytics", "cohort", "retention"),
)
def xc03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    wk = F.expr("unix_micros(ts) DIV 604800000000")
    first_wk = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_wk"))
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(first_wk), "user_id")
        .select(
            "cohort_wk",
            (wk - F.col("cohort_wk")).alias("age_wk"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        )
    )
    aged = rev.groupBy("cohort_wk", "age_wk").agg(F.sum("cents").alias("cents"))
    # O(#cohorts x #ages) rows; without this checkpoint the base-week
    # frame and the final join each re-derive the aged rollup - and two
    # more corpus scans (r7 scan audit: events read 4x, now 2x: the
    # cohort pass and the purchase pass).
    from spotify_tags_etl_spark.plans.planmetrics import record_plan

    record_plan(aged, "xc03:aged_rollup")
    aged = aged.localCheckpoint(eager=True)
    base = (
        aged.where(F.col("age_wk") == 0)
        .select(F.col("cohort_wk").alias("b_wk"), F.col("cents").alias("w0_cents"))
        .where(F.col("w0_cents") > 0)
    )
    return (
        aged.join(F.broadcast(base), F.col("cohort_wk") == F.col("b_wk"))
        .select(
            "cohort_wk",
            "age_wk",
            "cents",
            # money * 1e6: DECIMAL(38,0) DIV, the exact ppm spelling.
            F.expr("CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 DIV w0_cents AS BIGINT)").alias("nrr_ppm"),
        )
        .orderBy("cohort_wk", "age_wk")
    )


# ---------------------------------------------------------------------------
# xo04 — seasonality-adjusted anomaly days (xl02 residuals + MAD gate)
# ---------------------------------------------------------------------------

#: Robust gate: |residual - median| > MAD_K * MAD flags the day.
MAD_K = 3


@register(
    "xo04_seasonal_anomaly_days",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    trended AS (
      SELECT day, c,
             CASE WHEN COUNT(*) OVER w7 = 7
                  THEN SUM(c) OVER w7 // 7 END AS trend7
      FROM daily
      WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    dow AS (
      SELECT day, c, trend7,
             SUM(c - trend7) FILTER (WHERE trend7 IS NOT NULL)
               OVER (PARTITION BY day % 7) AS dow_num,
             COUNT(*) FILTER (WHERE trend7 IS NOT NULL)
               OVER (PARTITION BY day % 7) AS dow_n
      FROM trended
    ),
    res AS (
      SELECT day, c, CAST(c - trend7 - dow_num // dow_n AS BIGINT) AS residual
      FROM dow WHERE trend7 IS NOT NULL AND dow_n > 0
    ),
    med AS (SELECT quantile_cont(residual, 0.5) AS m FROM res),
    mad AS (
      SELECT quantile_cont(ABS(res.residual - med.m), 0.5) AS v, ANY_VALUE(med.m) AS m
      FROM res, med
    )
    SELECT r.day, r.c, r.residual
    FROM res r, mad
    WHERE ABS(r.residual - mad.m) > {MAD_K} * mad.v
    ORDER BY r.day
    """,
    doc=(
        "Seasonality-adjusted anomaly detection: xl02's integer "
        "decomposition residuals gated by the robust median ± "
        f"{MAD_K}·MAD fence (xo01's statistic applied to the "
        "deseasonalized series) — alarms fire on what trend and "
        "weekly rhythm CANNOT explain, the composition that stops "
        "Monday-morning pages. Medians over integer residuals "
        "interpolate to exact halves, so the flagged-day set is "
        "engine-exact. Everything past the daily rollup runs on the "
        "O(#days) frame; the two quantiles are an O(1)-row broadcast "
        "back onto it."
    ),
    tags=("timeseries", "anomaly", "robust"),
)
def xo04(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _ev(spark, sf_dir)
        .groupBy(F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn(
        "trend7",
        F.when(
            F.count(F.lit(1)).over(w7) == 7,
            F.floor(F.sum("c").over(w7) / 7).cast("bigint"),
        ),
    )
    wd = Window.partitionBy(F.expr("day % 7"))
    dow = trended.withColumn(
        "dow_num", F.sum(F.when(F.col("trend7").isNotNull(), F.col("c") - F.col("trend7"))).over(wd)
    ).withColumn(
        "dow_n", F.count(F.when(F.col("trend7").isNotNull(), F.lit(1))).over(wd)
    )
    res = (
        dow.where(F.col("trend7").isNotNull() & (F.col("dow_n") > 0))
        .select(
            "day",
            "c",
            (F.col("c") - F.col("trend7") - F.expr("dow_num DIV dow_n")).alias("residual"),
        )
    )
    med = res.agg(F.expr("percentile(residual, 0.5)").alias("m"))
    mad = (
        res.crossJoin(F.broadcast(med))
        .agg(F.expr("percentile(ABS(residual - m), 0.5)").alias("v"), F.first("m").alias("m"))
    )
    return (
        res.crossJoin(F.broadcast(mad))
        .where(F.abs(F.col("residual") - F.col("m")) > F.lit(MAD_K) * F.col("v"))
        .select("day", "c", "residual")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# xz20 — user growth curve (daily new users, cumulative, WoW change)
# ---------------------------------------------------------------------------


@register(
    "xz20_user_growth_curve",
    oracle=f"""
    WITH first_day AS (
      SELECT user_id, MIN(epoch_us(ts) // {_DAY_US}) AS day FROM events GROUP BY user_id
    ),
    daily AS (SELECT day, COUNT(*) AS new_users FROM first_day GROUP BY day),
    curve AS (
      SELECT day, new_users,
             CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users,
             LAG(new_users, 7) OVER (ORDER BY day) AS new_users_w_ago
      FROM daily
    )
    SELECT day, new_users, cum_users,
           CASE WHEN new_users_w_ago > 0
                THEN CAST(((new_users - new_users_w_ago) * 1000000) // new_users_w_ago AS BIGINT)
           END AS wow_delta_ppm
    FROM curve ORDER BY day
    """,
    doc=(
        "User growth curve: each user's first-seen day (one per-key "
        "min aggregate), daily new-user counts, the cumulative "
        "adoption running sum, and week-over-week growth in integer "
        "ppm (NULL where the 7-day-ago base is missing or zero — "
        "never a float division). The acquisition-side complement of "
        "xc01/xc03's retention matrices. Post-aggregate work runs on "
        "the O(#days) frame under one global-order window — gate-"
        "scale formulation, range-partitioned prefix sum at 1e10 "
        "users (xh01's documented swap)."
    ),
    tags=("analytics", "growth", "window"),
)
def xz20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    first_day = ev.groupBy("user_id").agg(
        F.min(F.expr(f"unix_micros(ts) DIV {_DAY_US}")).alias("day")
    )
    daily = first_day.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wl = Window.orderBy("day")
    curve = daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
        F.lag("new_users", 7).over(wl).alias("base"),
    )
    return curve.select(
        "day",
        "new_users",
        "cum_users",
        F.when(
            F.col("base") > 0,
            F.expr("CAST(((new_users - base) * 1000000) DIV base AS BIGINT)"),
        ).alias("wow_delta_ppm"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# xg05 — transition-graph degree census
# ---------------------------------------------------------------------------


@register(
    "xg05_degree_census",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    edges AS (
      SELECT DISTINCT prev_type AS src, event_type AS dst
      FROM seq WHERE prev_type IS NOT NULL
    ),
    nodes AS (SELECT DISTINCT event_type AS node FROM events)
    SELECT n.node,
           (SELECT COUNT(*) FROM edges e WHERE e.src = n.node) AS out_degree,
           (SELECT COUNT(*) FROM edges e WHERE e.dst = n.node) AS in_degree,
           (SELECT COUNT(*) FROM edges e WHERE e.src = n.node AND e.dst = n.node) AS has_self_loop
    FROM nodes n ORDER BY n.node
    """,
    doc=(
        "Degree census of the event-transition graph: per node, "
        "distinct out-/in-degree and self-loop flag — the structural "
        "profile read before choosing graph algorithms (degree skew "
        "decides xg03's broadcast-vs-partition strategy; xj02 is the "
        "key-level analog for joins). One windowed pass derives "
        "edges; the census is |V|-sized aggregates over the distinct "
        "edge set."
    ),
    tags=("graph", "statistics"),
)
def xg05(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")).asc(), F.col("event_id").asc()
    )
    edges = (
        ev.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
        .where(F.col("prev_type").isNotNull())
        .select(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # three census probes below reuse it
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    outd = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("out_degree"))
    ind = edges.groupBy(F.col("dst").alias("node")).agg(F.count(F.lit(1)).alias("in_degree"))
    loops = (
        edges.where(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("has_self_loop"))
    )
    return (
        nodes.join(F.broadcast(outd), "node", "left")
        .join(F.broadcast(ind), "node", "left")
        .join(F.broadcast(loops), "node", "left")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("has_self_loop", F.lit(0)).alias("has_self_loop"),
        )
        .orderBy("node")
    )
