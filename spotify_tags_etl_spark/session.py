"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every setting is chosen for the
1000-executor / 100 TB design point:

* AQE on — runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy demotion replace hand-tuned partition counts.
* Arrow on — all pandas UDF / ``mapInPandas`` exchanges are columnar.
* Session timezone pinned to UTC — the reference stamps ISO-8601 UTC
  timestamps (reference ``postgres_media.py:302``); correctness oracles
  must be timezone-stable.
* Shuffle partitions default to a small number locally; at cluster scale
  AQE's ``advisoryPartitionSizeInBytes`` governs, so the static number
  only needs to be an upper bound for the initial stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "spotify-tags-etl-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the singleton SparkSession with engine defaults."""
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # parquet scans: pushdown + pruning are on by default; keep
        # vectorized reader explicit so a config drift can't disable it.
        .config("spark.sql.parquet.filterPushdown", "true")
        # the events table ships TIMESTAMP(NANOS) parquet, which Spark's
        # vectorized reader rejects; read as long (ns since epoch) and let
        # the source layer derive a usec timestamp column.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # broadcast threshold: dims (region/nation/supplier/part at test SF)
        # broadcast; at 100 TB the same plans sort-merge automatically once
        # sides exceed the threshold — AQE re-checks at runtime.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.ansi.enabled", "false")
        # Plan-string render cap only (no planning effect): the v2
        # flags artifact carries 12 columns, and the default 100-char
        # ReadSchema elision would turn the scan-pushdown pins into
        # '<truncated>' markers instead of auditable column lists.
        .config("spark.sql.maxMetadataStringLength", "512")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # S9 TOML settings source: a settings file supplies session confs
    # (timezone today; the dataclasses carry db/api settings for the
    # sinks and the paged REST source). Env vars still win when unset.
    settings_path = os.environ.get("SPARK_GRAFT_SETTINGS")
    if settings_path:
        from spotify_tags_etl_spark.settings import load_project_config, open_toml, spark_confs

        for key, value in spark_confs(load_project_config(open_toml(settings_path))).items():
            builder = builder.config(key, value)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    return builder.getOrCreate()
