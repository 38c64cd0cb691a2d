"""Skew- and shuffle-management helpers: salting and bucketing.

Neither changes query *semantics* — they change the physical exchange
plan, so they are exposed as helpers (not registry queries) and pinned
by plan-shape tests (tests/test_scale_physical.py) rather than oracles.

* **Salted aggregation** — two-phase agg for skewed keys: key → (key,
  salt) partial agg (spreads one hot key over N reducers) → final agg on
  key. Works for any algebraic aggregate (sum/count/min/max); the same
  decomposition Spark uses internally for partial aggregation, made
  explicit when one key dominates a partition.
* **Salted broadcast-backed skew join** — replicate the small side N×
  with a salt column, salt the big side randomly-but-deterministically
  (hash of a row id % N), equi-join on (key, salt). Turns one hot
  reducer into N. AQE's skew-join split does this adaptively at runtime;
  the explicit form is for engines/paths where AQE can't see the skew
  (e.g. custom bucket joins).
* **Bucketed co-located join** — ``bucketBy(k, key).sortBy(key)`` both
  sides at write time → sort-merge join with ZERO Exchange at read time.
  The write-once/join-many pattern: at 100 TB re-shuffling a fact table
  per query is the dominant cost; bucketing amortizes it to ingest time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salts: int):
    """Deterministic per-row salt: hash of the FULL row content.

    Never salt a shuffle key from monotonically_increasing_id()/rand():
    those re-evaluate differently when a map task is retried, so
    recomputed rows land in different reduce partitions than the output
    other reducers already fetched — rows double-count or vanish (the
    classic repartition-by-rand hazard; retries are routine at the
    1000-executor design point). Content-hash salts are retry-stable;
    the only tradeoff is that fully-identical rows share a salt, which
    merely caps the spread for exact-duplicate rows."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg(df: DataFrame, key: str, aggs: dict, n_salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation for any set of algebraic aggregates.

    ``aggs`` maps each output column name to ``(partial, merge)`` where
    ``partial`` is the phase-1 aggregate Column (over the input rows,
    e.g. ``F.count("*")``, ``F.sum(col)``) and ``merge`` maps the
    partial's column name to the phase-2 aggregate that combines partials
    (``F.sum`` for sum/count, ``F.min``/``F.max`` for min/max). Phase 1
    groups on (key, retry-deterministic content-hash salt — see
    _row_salt), spreading each hot key over ``n_salts`` reducers; phase 2
    merges the ≤ n_salts partial rows per key."""
    partial_cols = [p.alias(f"_p{i}") for i, (p, _) in enumerate(aggs.values())]
    partial = (
        df.withColumn("_salt", _row_salt(df, n_salts))
        .groupBy(key, "_salt")
        .agg(*partial_cols)
    )
    final_cols = [m(f"_p{i}").alias(out) for i, (out, (_, m)) in enumerate(aggs.items())]
    return partial.groupBy(key).agg(*final_cols)


def salted_sum(
    df: DataFrame, key: str, value_col, out: str, n_salts: int = 16
) -> DataFrame:
    """Single-SUM convenience wrapper over :func:`salted_agg`."""
    return salted_agg(df, key, {out: (F.sum(value_col), F.sum)}, n_salts)


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Skew-safe equi-join: small side replicated ``n_salts``×, big side
    salted deterministically; join on (key, salt). Inner join semantics
    identical to ``big.join(small, key)``."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", _row_salt(big, n_salts))
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8, sort: bool = True
) -> None:
    """Write a table bucketed (and sorted) by the join key — the
    co-location contract later joins rely on."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, force_sort_merge: bool = False
) -> DataFrame:
    """Join two co-bucketed tables: Catalyst sees matching bucket specs
    and plans a sort-merge join with no Exchange on either side.

    ``force_sort_merge`` adds a MERGE hint — at toy scale Catalyst
    correctly prefers broadcasting the small side (which ignores the
    bucket layout); the hint pins the plan shape the bucketing exists
    for, i.e. what a 100 TB fact-fact join would pick on its own.
    """
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), key)


# One registry row pins the salting path to the correctness gate: the
# salted two-phase aggregate must equal the plain aggregate (the oracle
# is the plain SQL agg — salting is semantics-neutral by construction).
from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.tpch import load_table


@register(
    "wz01_salted_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    doc=(
        "Skew-safe two-phase salted aggregation over the hot event_type "
        "key: partial agg on (key, salt) spreads each hot key over 16 "
        "reducers, final agg merges partials. Result provably equals the "
        "plain aggregate (the oracle) — salting only reshapes the "
        "exchange."
    ),
    tags=("aggregate", "skew"),
)
def wz01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return salted_agg(
        ev,
        "event_type",
        {
            "n": (F.count("*"), F.sum),
            "sum_value": (
                F.sum(F.col("value").cast("decimal(14,2)")),
                lambda c: F.sum(c).cast("double"),
            ),
        },
        n_salts=16,
    )


@register(
    "wz02_salted_join",
    oracle="""
    SELECT s.s_nationkey, COUNT(*) AS n,
           SUM(CAST(round(l.l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
    doc=(
        "Skew-safe salted equi-join pinned to the correctness gate: the "
        "supplier side is replicated 16x with a salt, the fact side is "
        "salted by retry-stable content hash, and the (key, salt) join "
        "provably equals the plain join (the oracle) — salting only "
        "splits hot reducers. Post-join integer-cents aggregate keeps "
        "the compared output small and order-independent."
    ),
    tags=("join", "skew"),
)
def wz02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = salted_join(li, sup, "suppkey", n_salts=16)
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        (F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")) / 100.0).alias("sum_qty"),
    )


def bitmap_of(small: DataFrame, key: str, m_bits: int = 1 << 16) -> DataFrame:
    """Compact membership bitmap over the build side's join keys:
    ``m_bits`` hash buckets packed 64-per-row into ``(seg, bits)`` —
    at the default 2^16 buckets that is <= 1024 bigint rows regardless
    of build-side cardinality, always broadcastable."""
    return (
        small.select(F.pmod(F.xxhash64(F.col(key)), F.lit(m_bits)).alias("p"))
        .select(
            F.expr("p DIV 64").alias("seg"),
            F.expr("shiftleft(1L, CAST(pmod(p, 64) AS INT))").alias("b"),
        )
        .groupBy("seg")
        .agg(F.bit_or(F.col("b")).alias("bits"))
    )


def bitmap_semi_join(
    big: DataFrame, small: DataFrame, big_key: str, small_key: str, m_bits: int = 1 << 16
) -> DataFrame:
    """Runtime-filtered semi-join: probe rows are pre-filtered by a
    broadcast membership bitmap of the build side's keys BEFORE the
    exact left-semi join (the explicit form of Spark's runtime bloom
    filter / DPP row-level filtering).

    Why it matters at 100 TB: the semi-join's shuffle carries only rows
    that pass the bitmap — for a selective build side that is the
    difference between exchanging the whole fact table and exchanging
    ~|matches| (+ the bitmap's false-positive leakage, bounded by
    load factor |keys|/m_bits). Correctness never depends on the
    bitmap: false positives are eliminated by the closing exact
    semi-join, and false negatives are impossible (every build key set
    its bit; a probe row joining some build row hashes to the same
    bucket). The bitmap inner-join is itself part of the filter: a
    probe segment absent from the bitmap frame has zero bits set, so
    dropping it is exact."""
    bmp = bitmap_of(small, small_key, m_bits)
    pre = (
        big.withColumn("_p", F.pmod(F.xxhash64(F.col(big_key)), F.lit(m_bits)))
        .withColumn("_seg", F.expr("_p DIV 64"))
        .join(F.broadcast(bmp), F.col("_seg") == F.col("seg"))
        .where(F.expr("(bits & shiftleft(1L, CAST(pmod(_p, 64) AS INT))) != 0"))
        .drop("_p", "_seg", "seg", "bits")
    )
    return pre.join(
        small.select(F.col(small_key).alias(big_key)).distinct(), big_key, "left_semi"
    )


@register(
    "xb01_bitmap_runtime_filter",
    oracle="""
    SELECT l.l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM lineitem l
    WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice < 2000)
    GROUP BY l.l_returnflag
    """,
    doc=(
        "Runtime-filter (bloom-style) semi-join pinned to the "
        "correctness gate: lineitem rows are pre-filtered by a "
        "broadcast 2^16-bit membership bitmap of the selective orders "
        "subset's keys before the exact semi-join — the oracle is the "
        "PLAIN semi-join, proving the bitmap changes only how many "
        "rows reach the exchange, never the result (wz01/wz02's "
        "semantics-neutrality discipline for the runtime-filter "
        "pattern). Spark's own runtime bloom filter does this "
        "adaptively; the explicit form documents the shape and covers "
        "paths the optimizer won't (pre-aggregations, custom sources)."
    ),
    tags=("join", "runtime-filter", "skew"),
)
def xb01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    cheap = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") < 2000)
    filtered = bitmap_semi_join(li, cheap, "l_orderkey", "o_orderkey")
    return filtered.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
    )


@register(
    "xj02_key_skew_metrics",
    oracle="""
    WITH kc AS (
      SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT c,
             ROW_NUMBER() OVER (ORDER BY c, k) AS rn,
             COUNT(*) OVER () AS nk,
             SUM(c) OVER () AS total
      FROM kc
    )
    SELECT MAX(nk) AS n_keys,
           CAST(MAX(total) AS BIGINT) AS n_rows,
           MAX(c) AS max_key_rows,
           CAST((1000000 * MAX(c)) // MAX(total) AS BIGINT) AS max_share_ppm,
           MAX(CASE WHEN rn = (99 * nk + 99) // 100 THEN c END) AS p99_key_rows
    FROM ranked
    """,
    doc=(
        "Join-key skew diagnostics: per-key cardinality census over "
        "the orders fact's customer key — key count, hottest-key row "
        "share (exact ppm), and the discrete p99 key size (rank-"
        "selected, xf02's discipline) — the measurement that DECIDES "
        "whether a join needs wz02's salting or can lean on AQE skew "
        "split (a max_share_ppm near 1e6/n_reducers means one reducer "
        "owns the key). Shape: n_keys/n_rows/max/share are PLAIN "
        "aggregates (no window at all); the p99 order statistic rides "
        "scalerank.global_rank (range-partitioned parallel rank), so "
        "the O(#keys) frame never funnels through one reducer — the "
        "skew-diagnosis tool is itself skew-free. The single-reducer "
        "window lives only in the oracle as the truth anchor. At "
        "100 TB sample the census or sketch it (av11/av14) — the "
        "decision only needs the head of the distribution."
    ),
    tags=("skew", "statistics", "diagnostics"),
)
def xj02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scalerank import global_rank

    kc = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # One frozen ranked layout feeds BOTH the scalar census and the
    # rank-selected p99 (the checkpoint inside global_rank means the
    # per-key aggregate is computed once, not twice).
    ranked, nk = global_rank(kc, [F.col("c").asc(), F.col("k").asc()], rank_col="rn")
    p99_rank = (99 * nk + 99) // 100
    return ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").alias("max_key_rows"),
        F.expr("(1000000 * MAX(c)) DIV SUM(c)").cast("bigint").alias("max_share_ppm"),
        F.max(F.when(F.col("rn") == F.lit(p99_rank), F.col("c"))).alias(
            "p99_key_rows"
        ),
    )


# ---------------------------------------------------------------------------
# xj03 — join fan-out audit (pre-join cardinality accounting)
# ---------------------------------------------------------------------------


@register(
    "xj03_join_fanout_audit",
    oracle="""
    WITH lo AS (SELECT l_orderkey AS k, COUNT(*) AS n_l FROM lineitem GROUP BY l_orderkey),
    oo AS (SELECT o_orderkey AS k, COUNT(*) AS n_o FROM orders GROUP BY o_orderkey),
    per_key AS (
      SELECT lo.k, lo.n_l * oo.n_o AS prod FROM lo JOIN oo ON lo.k = oo.k
    )
    SELECT CAST(SUM(prod) AS BIGINT) AS predicted_rows,
           (SELECT COUNT(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
             AS actual_rows,
           CAST(MAX(prod) AS BIGINT) AS max_key_fanout,
           CAST(SUM(prod) AS BIGINT) = (SELECT COUNT(*) FROM lineitem l
                                        JOIN orders o ON l.l_orderkey = o.o_orderkey)
             AS accounting_ok
    FROM per_key
    """,
    doc=(
        "Join fan-out audit — the pre-flight cardinality guardrail: "
        "the exact identity |A ⋈_k B| = Σ_k n_A(k)·n_B(k) computed "
        "from two per-key count aggregates BEFORE running the join, "
        "next to the actual join count and the hottest key's product "
        "(the number that decides salting vs AQE skew-split — xj02's "
        "ppm skew metrics are the relative view, this is the absolute "
        "row-explosion bound). The accounting_ok verdict pins the "
        "identity end-to-end. At 100 TB the per-key count frames are "
        "what a planner can afford to materialize when it suspects "
        "fan-out; the audit costs two map-combined aggregates + an "
        "O(keys) join, never the full join it is guarding."
    ),
    tags=("skew", "diagnostics", "join"),
)
def xj03(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lo = li.groupBy(F.col("l_orderkey").alias("k")).agg(F.count(F.lit(1)).alias("n_l"))
    oo = o.groupBy(F.col("o_orderkey").alias("k")).agg(F.count(F.lit(1)).alias("n_o"))
    per_key = lo.join(oo, "k").select((F.col("n_l") * F.col("n_o")).alias("prod"))
    actual = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    return (
        per_key.agg(
            F.sum("prod").cast("bigint").alias("predicted_rows"),
            F.max("prod").cast("bigint").alias("max_key_fanout"),
        )
        .crossJoin(F.broadcast(actual))
        .select(
            "predicted_rows",
            "actual_rows",
            "max_key_fanout",
            (F.col("predicted_rows") == F.col("actual_rows")).alias("accounting_ok"),
        )
    )
