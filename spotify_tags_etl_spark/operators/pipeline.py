"""End-to-end training-data pipeline: the composite query gluing the
operator families together — redaction → quality gate → exact dedup →
split assignment → shard layout — as ONE Spark DAG.

This is the shape a 100 TB corpus actually runs: a single scan feeds
narrow per-row stages (redact, quality features, split/shard
assignment — zero shuffles), the only wide stages are the content-hash
dedup (one shuffle on md5) and the final O(splits × shards) summary
aggregate. Nothing materializes between stages; Catalyst fuses the
narrow pipeline into the scan's codegen stage.

(``tp`` registry prefix = rotation-safe slot; see ``plans/registry.py``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_tags_etl_spark.operators.textops import redact_pii
from spotify_tags_etl_spark.operators.training import (
    _hash_frac_sql,
    shard_of,
    train_val_test_split,
)
from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.tpch import load_table

MIN_WORDS = 8


def training_pipeline(docs: DataFrame) -> DataFrame:
    """documents → redact → quality-gate → dedup(keep-first) → split →
    shard → per-(split, shard) summary."""
    red = redact_pii(docs).select(
        "doc_id", F.col("redacted").alias("text"), F.size(F.split("redacted", " ")).alias("n_words")
    )
    gated = red.where(F.col("n_words") >= MIN_WORDS)
    # Both window functions must share ONE exchange: partition on a
    # materialized hash column (partitioning directly on the md5(...)
    # expression gives each Window node its own projected `_w0` key,
    # which blocks CollapseWindow and doubles the shuffle — pinned by
    # the plan test).
    w = Window.partitionBy("_h").orderBy("doc_id")
    deduped = (
        gated.withColumn("_h", F.md5("text"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_copies",
            F.count("*").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn", "_h")
    )
    assigned = train_val_test_split(deduped, "doc_id").withColumn(
        "shard", shard_of(F.col("doc_id"))
    )
    return (
        assigned.groupBy("split", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(F.col("n_copies") - 1).alias("n_dupes_absorbed"),
        )
        .orderBy("split", "shard")
    )


@register(
    "tp01_training_pipeline",
    oracle=f"""
    WITH red AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                 '[0-9]{{7,}}', '<NUM>', 'g') AS text
      FROM documents
    ),
    gated AS (
      SELECT doc_id, text FROM red WHERE len(string_split(text, ' ')) >= {MIN_WORDS}
    ),
    deduped AS (
      SELECT doc_id, text, n_copies FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
        FROM gated
      ) WHERE rn = 1
    ),
    assigned AS (
      SELECT doc_id, text, n_copies,
             CASE WHEN {_hash_frac_sql('doc_id')} < 0.8 THEN 'train'
                  WHEN {_hash_frac_sql('doc_id')} < 0.9 THEN 'val'
                  ELSE 'test' END AS split,
             (doc_id * 2654435761) % 4294967296 % 16 AS shard
      FROM deduped
    )
    SELECT split, shard, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(n_copies - 1) AS BIGINT) AS n_dupes_absorbed
    FROM assigned GROUP BY split, shard ORDER BY split, shard
    """,
    doc=(
        "The composite training-data pipeline as one DAG: PII redaction, "
        "min-length quality gate, content-hash dedup with keep-first and "
        "absorbed-duplicate accounting, stable split assignment, shard "
        "layout, per-(split, shard) summary. One dedup shuffle + one "
        "48-group aggregate; every other stage is scan-fused."
    ),
    tags=("training", "pipeline", "dedup"),
)
def tp01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return training_pipeline(load_table(spark, sf_dir, "documents"))
