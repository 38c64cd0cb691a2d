"""Scale-safe exact global ranking — the range-partitioned replacement
for single-reducer ``Window.orderBy(...)`` ranks.

An ``ORDER BY`` window with no ``PARTITION BY`` funnels the entire table
through ONE reducer task: correct at test SF, a wall at 100 TB. The
classic distributed-exact alternative (TeraSort's bookkeeping, and what
the round-3 verdict prescribed for xh01/xi04):

1. ``repartitionByRange`` on the order key — ranges are assigned to
   partitions in ascending partition-id order, so partition p holds keys
   strictly below partition p+1 (the order key must be a total order —
   unique tiebreak column included — so no key straddles a boundary);
2. ``localCheckpoint`` the ranged frame — the per-partition counts and
   the ranked output must see the SAME physical layout (and the input is
   scanned once, not twice);
3. one O(#partitions) count job → cumulative offsets on the driver
   (plan-feeding statistics, the repo's sanctioned collect class);
4. ``row_number() OVER (PARTITION BY partition_id ORDER BY key)`` — a
   PARALLEL window, every partition ranks locally — plus the broadcast
   offset literal.

The result is bit-identical to the single-reducer rank at any partition
count (pinned by tests/test_scale_ranking.py against F.ntile and the
NTILE oracles), with max task size O(rows/partitions) instead of O(rows).

``ntile_expr`` then maps a 1-based global rank to the exact NTILE(k)
bucket: with N rows, q = N DIV k and m = N % k, the first m buckets get
q+1 rows and the rest get q — both Spark and DuckDB implement exactly
these sizes, so the formula reproduces either engine's NTILE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _range_layout(
    df: DataFrame, order_cols: list, num_partitions: int | None
) -> tuple[DataFrame, list]:
    """Freeze a range-partitioned layout over ``order_cols``: partition p
    holds keys strictly below partition p+1. The layout is
    ``localCheckpoint``-ed so the per-partition statistics job and the
    final parallel window see the SAME physical placement (and the input
    is scanned once, not twice). Returns ``(ranged frame + _pid, cols)``."""
    from spotify_tags_etl_spark.plans.planmetrics import record_plan

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    pre = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # The input scan lives BEFORE this checkpoint, so consumers' loop-
    # stage scan pins can only see it here (cf. planmetrics.SCAN_LOG).
    record_plan(pre, "scalerank:layout")
    ranged = pre.localCheckpoint(eager=True)
    return ranged, cols


def _pid_map(offsets: dict) -> Column:
    """Broadcast-literal map _pid -> offset (skipping None entries);
    missing pids resolve to NULL at lookup."""
    pairs: list[Column] = []
    for pid in sorted(offsets):
        if offsets[pid] is None:
            continue
        pairs.extend([F.lit(pid), F.lit(offsets[pid])])
    if not pairs:
        return F.lit(None).cast("bigint")
    return F.element_at(F.create_map(*pairs), F.col("_pid"))


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact 1-based global row_number over ``order_cols`` (which must be
    a TOTAL order — include a unique tiebreak) without a single-reducer
    window. Returns ``(frame + rank_col, total_row_count)``; the count
    comes from the same layout pass, so no extra scan."""
    ranged, cols = _range_layout(df, order_cols, num_partitions)
    # O(#partitions) rows to the driver: plan-feeding statistics only.
    counts = {r["_pid"]: r["n"] for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_of = F.coalesce(_pid_map(offsets), F.lit(0))
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.withColumn(rank_col, F.row_number().over(w) + offset_of).drop("_pid"),
        total,
    )


def prefix_sum(
    df: DataFrame,
    order_cols: list,
    weight_col: str,
    sum_col: str = "cumsum",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact INCLUSIVE running ``SUM(weight_col)`` over the total order
    ``order_cols`` — the weighted generalization of :func:`global_rank`
    (row_number is prefix_sum with weight 1). Same three-step shape:
    range layout, one O(#partitions) subtotal job folded into cumulative
    offsets on the driver, then a PARALLEL per-partition running sum plus
    the broadcast offset literal. Returns ``(frame + sum_col,
    total_weight)``; the total comes from the same statistics pass."""
    ranged, cols = _range_layout(df, order_cols, num_partitions)
    subtotals = {
        r["_pid"]: (r["s"] or 0)
        for r in ranged.groupBy("_pid").agg(F.sum(weight_col).alias("s")).collect()
    }
    total = sum(subtotals.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid]
    offset_of = F.coalesce(_pid_map(offsets), F.lit(0))
    w = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ranged.withColumn(sum_col, F.sum(weight_col).over(w) + offset_of).drop("_pid"),
        total,
    )


def prefix_sums(
    df: DataFrame,
    order_cols: list,
    weights: dict[str, str],
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Several exact inclusive running sums over ONE total order in ONE
    pass (r13, guide §1.2): :func:`prefix_sum` called k times re-lays
    out, re-checkpoints, and re-collects subtotals for the same frame k
    times; the sums are independent so one layout + one O(#partitions)
    subtotal job + one window projection computes them all.
    ``weights`` maps output column -> weight column. Returns
    ``(frame + all sum columns, {output column -> total})`` — totals
    and columns bit-identical to the chained single-column calls
    (integer sums are order-free)."""
    ranged, cols = _range_layout(df, order_cols, num_partitions)
    aggs = [F.sum(w).alias(out) for out, w in weights.items()]
    sub_rows = ranged.groupBy("_pid").agg(*aggs).collect()
    out_frame = ranged
    totals: dict[str, int] = {}
    w = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    for out, wcol in weights.items():
        subtotals = {r["_pid"]: (r[out] or 0) for r in sub_rows}
        totals[out] = sum(subtotals.values())
        offsets: dict[int, int] = {}
        acc = 0
        for pid in sorted(subtotals):
            offsets[pid] = acc
            acc += subtotals[pid]
        offset_of = F.coalesce(_pid_map(offsets), F.lit(0))
        out_frame = out_frame.withColumn(
            out, F.sum(wcol).over(w) + offset_of
        )
    return out_frame.drop("_pid"), totals


def prefix_max(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "runmax",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE running ``MAX(value_col)`` over the total order
    ``order_cols`` (a high-water mark) without a single-reducer window:
    range layout, one O(#partitions) per-partition-max job, prefix-fold
    the maxima on the driver (offset of partition p = max over all
    partitions < p, NULL for the first), then GREATEST(parallel local
    running max, broadcast offset) — both engines' GREATEST skips NULLs,
    so the first partition needs no special case."""
    ranged, cols = _range_layout(df, order_cols, num_partitions)
    part_max = {
        r["_pid"]: r["m"]
        for r in ranged.groupBy("_pid").agg(F.max(value_col).alias("m")).collect()
    }
    offsets: dict[int, int | None] = {}
    acc: int | None = None
    for pid in sorted(part_max):
        offsets[pid] = acc
        m = part_max[pid]
        if m is not None:
            acc = m if acc is None else max(acc, m)
    w = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ranged.withColumn(
        out_col, F.greatest(F.max(value_col).over(w), _pid_map(offsets))
    ).drop("_pid")


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact 1-based ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY
    order)`` without per-group reducers — for LOW-cardinality groups,
    where ``Window.partitionBy(group)`` would funnel millions of rows
    into #groups tasks (13 length bands, 25 regions, ...). High-
    cardinality groups don't need this: their keyed window is already
    parallel.

    Same recipe as :func:`global_rank` with group-aware bookkeeping:
    range layout over (group, order) — so each group occupies a
    contiguous run of partitions; one O(#partitions + #groups) stats
    job (groups are contiguous, so at most #pids + #groups rows);
    cumulative per-(partition, group) offsets broadcast as a literal
    map keyed by '_pid:group'; then a PARALLEL window partitioned by
    (_pid, group) — max task size stays O(rows/partitions) regardless
    of group skew. Returns ``(frame + rank_col, total_row_count)``.

    ``group_cols`` must be column NAMES (the offset lookup re-reads
    them); ``order_cols`` may be names or Column expressions and, with
    the group prefix prepended, must total-order the frame.

    The broadcast offset map is keyed by ``pid:hex(group1):hex(group2)``
    — each group value is lowercase-hex-encoded (NULL -> a ``\\x00``
    sentinel no hex string can contain) on BOTH the Python and the
    Spark side, so a group value containing the ``:`` delimiter cannot
    collide across multi-column groups and NULL group values cannot be
    silently dropped by ``concat_ws`` (they'd otherwise fall back to
    offset 0 with a wrong rank)."""

    def _gkey_py(v: object) -> str:
        return "\x00" if v is None else str(v).encode("utf-8").hex()

    def _gkey_col(c: str) -> Column:
        return F.coalesce(
            F.lower(F.hex(F.encode(F.col(c).cast("string"), "UTF-8"))),
            F.lit("\x00"),
        )

    gcols = [F.col(c) for c in group_cols]
    ranged, cols = _range_layout(df, [*gcols, *order_cols], num_partitions)
    stats = (
        ranged.groupBy("_pid", *group_cols).agg(F.count(F.lit(1)).alias("n")).collect()
    )
    total = sum(r["n"] for r in stats)
    running: dict[tuple, int] = {}
    pairs: list[Column] = []
    for r in sorted(stats, key=lambda r: r["_pid"]):
        gkey = tuple(r[c] for c in group_cols)
        off = running.get(gkey, 0)
        running[gkey] = off + r["n"]
        pairs.extend(
            [
                F.lit(f"{r['_pid']}:" + ":".join(_gkey_py(v) for v in gkey)),
                F.lit(off),
            ]
        )
    lookup_key = F.concat_ws(
        ":", F.col("_pid").cast("string"), *[_gkey_col(c) for c in group_cols]
    )
    offset_of = (
        F.coalesce(F.element_at(F.create_map(*pairs), lookup_key), F.lit(0))
        if pairs
        else F.lit(0)
    )
    w = Window.partitionBy("_pid", *group_cols).orderBy(*cols)
    return (
        ranged.withColumn(rank_col, F.row_number().over(w) + offset_of).drop("_pid"),
        total,
    )


def ntile_expr(rank_col: str, n_rows: int, k: int) -> Column:
    """Exact NTILE(k) bucket (1-based) of a 1-based global rank over
    ``n_rows`` rows — the first ``n_rows % k`` buckets hold
    ``n_rows DIV k + 1`` rows, the rest ``n_rows DIV k`` (both engines'
    NTILE semantics)."""
    q, m = divmod(n_rows, k)
    if q == 0:
        return F.col(rank_col).cast("int")
    big = m * (q + 1)
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {big} THEN ({rank_col} - 1) DIV {q + 1} "
        f"ELSE {m} + ({rank_col} - {big} - 1) DIV {q} END + 1 AS INT)"
    )


def tile_start(n_rows: int, k: int, tile_col: str) -> Column:
    """0-based global rank offset at which ``tile`` begins (ranks are
    1-based: tile t spans ranks tile_start+1 .. tile_start+size)."""
    q, m = divmod(n_rows, k)
    return F.expr(
        f"CAST(CASE WHEN {tile_col} - 1 <= {m} THEN ({tile_col} - 1) * {q + 1} "
        f"ELSE {m} * {q + 1} + ({tile_col} - 1 - {m}) * {q} END AS BIGINT)"
    )
