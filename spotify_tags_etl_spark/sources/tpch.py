"""Parquet warehouse source layer for the driver-generated test tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an
``sf*/`` directory.

Scale notes (100 TB design point):

* ``spark.read.parquet`` is the only scan primitive — predicate pushdown,
  column pruning, and partition pruning all flow from declaring the read
  here and filtering lazily downstream. Never ``.cache()`` inside the
  loader; callers decide materialization.
* At cluster scale these would be directory-partitioned datasets
  (``orders/o_orderdate=.../``); the loader takes any path, so swapping a
  partitioned root in requires no call-site change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that are always sensible broadcast candidates.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_defaults(spark: SparkSession) -> None:
    """Pin runtime-settable confs every loader depends on, on ANY session.

    The driver harness hands queries a vanilla SparkSession (none of our
    ``session.py`` build-time confs). Round 1 lost 18/50 driver checks to a
    loader that assumed a build-time conf; the standing rule is that every
    entry-point loader self-heals the confs it needs:

    * ``spark.sql.session.timeZone = UTC`` — parquet timestamps are instants;
      HOUR / date_format / year / string→timestamp literal casts all render
      in the *session* timezone, while the DuckDB oracles compare naive-UTC
      values. On a driver JVM whose default TZ is not UTC, every
      time-bucketing query would shift by the UTC offset without this pin.
    * ``spark.sql.ansi.enabled = false`` — Spark 4 defaults ANSI on for
      vanilla sessions while our ``session.py`` factory runs ANSI off; the
      engine's documented semantics (wrap-around integer sufficient
      statistics with stated overflow bounds, NULL on degenerate
      arithmetic) are the ANSI-off ones, and they must not depend on which
      session the caller built. Hot-path divisions are additionally
      NULLIF-guarded so results match the DuckDB oracles in either mode.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a canonical pair regardless of
    the parquet file's physical encoding:

    * ``ts``    — TIMESTAMP (instant; session tz is pinned UTC upstream)
    * ``ts_ns`` — BIGINT epoch nanoseconds (full-precision ordering key)

    The driver regenerates the fixtures between rounds and has shipped two
    encodings so far: TIMESTAMP(NANOS) (readable only as bigint ns via
    ``spark.sql.legacy.parquet.nanosAsLong``) and plain ``timestamp[us]``
    (read as TIMESTAMP_NTZ). Branching on the *observed* dtype here — not
    on an assumed encoding — is what keeps every downstream event-time
    operator (windows, as-of joins, watermarks) stable across regens.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        # nanosAsLong path: keep full-precision ns, derive a usec instant.
        return df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns DIV 1000"))
        )
    if dtype == "timestamp_ntz":
        # usec-encoded naive timestamp: the session tz is pinned UTC by
        # ensure_session_defaults, so the NTZ→TIMESTAMP cast is value-stable
        # (same wall-clock digits, now an instant — required by
        # withWatermark, which rejects TIMESTAMP_NTZ event time).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        dtype = "timestamp"
    if dtype == "timestamp" and "ts_ns" not in df.columns:
        df = df.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TPCH_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TPCH_TABLES}")
    ensure_session_defaults(spark)
    if name == "events":
        # Some fixture generations store TIMESTAMP(NANOS); vanilla Spark
        # rejects that physical type outright (PARQUET_TYPE_ILLEGAL) unless
        # this runtime conf is on. Harmless for usec-encoded files. Set it
        # here so the loader is self-sufficient on ANY session it is handed
        # (driver harness, notebooks), not only sessions built by our
        # session.py factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    else:
        # Generalized round-2 lesson: fixture regens can flip timestamp
        # encodings on ANY table. The session tz is pinned UTC above, so
        # NTZ→TIMESTAMP is value-stable, and DuckDB (which reads the same
        # parquet naively) renders identical wall-clock digits either way.
        ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
        if ntz:
            from pyspark.sql import functions as F

            df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every test table lazily; nothing is scanned until an action."""
    return {name: load_table(spark, sf_dir, name) for name in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register each table as a temp view for ``spark.sql`` queries."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
