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
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        # Counts and ranks MUST see one frozen layout (and one input scan).
        .localCheckpoint(eager=True)
    )
    # O(#partitions) rows to the driver: plan-feeding statistics only.
    counts = {r["_pid"]: r["n"] for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    pairs: list[Column] = []
    for pid in sorted(offsets):
        pairs.extend([F.lit(pid), F.lit(offsets[pid])])
    offset_of = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col("_pid")) if pairs else F.lit(0),
        F.lit(0),
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
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
