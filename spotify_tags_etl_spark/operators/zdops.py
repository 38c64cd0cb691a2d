"""Round-9 composed LLM-pipeline reports (zd band).

zd01 — per-source dedup-funnel report: survival counts and ppm through
the three dedup stages the engine already ships — exact (dd01) → near
(dd02, MinHash+LSH at 800 permille) → semantic (zc03, sign-LSH +
exact-integer cosine) — the end-to-end dedup accounting a curation org
actually reads (yy01/zc06's report discipline applied to dedup).

zd02 — RAG index-build manifest: tx06 token-window chunking → ye01
int8 projection (j = 1..8 of the md5 matrix) → IVF list assignment
(vx01's nearest-centroid rule in projected space) rolled up into the
per-list manifest an index build publishes.

zd03 — semantic dedup with IN-QUERY LSH sizing: derives (bits, tables)
from the corpus size via the yv20 S-curve machinery inside the query
itself, then runs the zc03 dedup at the derived size — making the
"production sizes come from the planner" claim executable.

zd04 — contamination-aware packing: zc01's banded-FFD packing with
tz06's contaminated docs excluded at pack time, reporting kept vs
displaced token mass per band.

zd05 — streaming dedup-funnel twin: the exact + near funnel stages as
order-free SUM/MIN-mergeable partials (za04/zc04's versioned-parquet
pattern); the semantic stage stays batch by design (its candidate
pairs need the full projected corpus, which is not a census merge).

Reference parity note: the reference ETL
(/root/reference/src/spotify_tags_etl/) has no dedup or training-data
stage; these operators extend the engine along SURVEY.md's
"training-data pipeline" axis, composing stages added in rounds 2-8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_tags_etl_spark.operators.dedup import _minhash_ctes, dd01, dd02
from spotify_tags_etl_spark.operators.zcops import _zc03_ctes, zc03
from spotify_tags_etl_spark.plans.planmetrics import record_plan
from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.tpch import load_table

# ---------------------------------------------------------------------------
# zd01 — per-source dedup-funnel survival report
# ---------------------------------------------------------------------------

_ZD01_NEAR_PERMILLE = 800  # dd02's verify threshold (dedup.py)


def _ppm(num: str, den: str) -> str:
    """Exact integral ppm — BIGINT-safe to ~1e12-row corpora (count
    numerators only; see the r5 ppm rule for value-scaled numerators)."""
    return f"CAST(SUM({num}) * 1000000 DIV NULLIF({den}, 0) AS BIGINT)"


@register(
    "zd01_dedup_funnel",
    oracle=f"""
    WITH {_minhash_ctes(_ZD01_NEAR_PERMILLE)},
    ek AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    {_zc03_ctes()},
    flags AS (
      SELECT d.source,
             CASE WHEN ek.doc_id IS NOT NULL THEN 1 ELSE 0 END AS s_e,
             CASE WHEN nd.d2 IS NOT NULL THEN 1 ELSE 0 END AS near_drop,
             CASE WHEN sd.d2 IS NOT NULL THEN 1 ELSE 0 END AS sem_drop
      FROM documents d
      LEFT JOIN ek ON ek.doc_id = d.doc_id
      LEFT JOIN (SELECT DISTINCT d2 FROM verified) nd ON nd.d2 = d.doc_id
      LEFT JOIN (SELECT DISTINCT d2 FROM dups) sd ON sd.d2 = d.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(s_e) AS BIGINT) AS n_exact_kept,
           CAST(SUM(s_e * (1 - near_drop)) AS BIGINT) AS n_near_kept,
           CAST(SUM(s_e * (1 - near_drop) * (1 - sem_drop)) AS BIGINT)
             AS n_sem_kept,
           CAST(SUM(s_e) * 1000000 // COUNT(*) AS BIGINT) AS exact_keep_ppm,
           CAST(SUM(s_e * (1 - near_drop)) * 1000000
                // NULLIF(SUM(s_e), 0) AS BIGINT) AS near_keep_ppm,
           CAST(SUM(s_e * (1 - near_drop) * (1 - sem_drop)) * 1000000
                // NULLIF(SUM(s_e * (1 - near_drop)), 0) AS BIGINT)
             AS sem_keep_ppm,
           CAST(SUM(s_e * (1 - near_drop) * (1 - sem_drop)) * 1000000
                // COUNT(*) AS BIGINT) AS overall_keep_ppm
    FROM flags GROUP BY source ORDER BY source
    """,
    doc=(
        "DEDUP-FUNNEL REPORT, per source: survival counts and ppm "
        "through exact (dd01 hash-groupBy keep-first) -> near (dd02 "
        "MinHash+LSH verified pairs at 800 permille) -> semantic (zc03 "
        "sign-LSH + exact integer cosine at 350000 ppm) — composed "
        "from the three existing stages' own machinery (dd01/dd02/"
        "zc03 builders Spark-side, their CTE bodies oracle-side), not "
        "a re-spelling. Stage semantics: each stage's drop set is "
        "computed on the FULL corpus exactly as the stage defines it "
        "(near drop = larger end of any verified pair; semantic drop "
        "= zc03's transitive-closure drop-by-id), and the funnel "
        "intersects survivor sets progressively — so stage counts "
        "telescope monotonically and the report equals each stage's "
        "own accounting (pinned by the composition test). Docs with "
        "no embedding row (at sf0.1 only a vec_id prefix of the doc "
        "space is embedded) pass the semantic stage trivially — a "
        "LEFT join, absence of evidence. Keep-ppm columns are exact "
        "integral division (count-valued numerators, int64-safe past "
        "1e11 docs). Scale shape: the three stage plans are unchanged "
        "(hash-groupBy / banded LSH / bucketed sign-LSH — never "
        "all-pairs); the funnel adds three keyed LEFT joins of "
        "drop-lists onto the (doc_id, source) projection and one "
        "per-source rollup with map-side partials. Drop-lists are "
        "corpus-fraction-sized (duplicates only), so AQE broadcasts "
        "them against the corpus scan at any skew."
    ),
    tags=("dedup", "report", "llm-pipeline"),
)
def zd01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    exact_keeps = dd01(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id"), F.lit(1).alias("s_e")
    )
    near_drops = (
        dd02(spark, sf_dir)
        .select(F.col("d2").alias("doc_id"))
        .distinct()
        .withColumn("near_drop", F.lit(1))
    )
    sem_drops = (
        zc03(spark, sf_dir)
        .where(F.col("keep") == 0)
        .select("vec_id")
        .withColumnRenamed("vec_id", "doc_id")
        .withColumn("sem_drop", F.lit(1))
    )
    flags = (
        docs.join(exact_keeps, "doc_id", "left")
        .join(near_drops, "doc_id", "left")
        .join(sem_drops, "doc_id", "left")
        .select(
            "source",
            F.coalesce("s_e", F.lit(0)).alias("s_e"),
            F.coalesce("near_drop", F.lit(0)).alias("near_drop"),
            F.coalesce("sem_drop", F.lit(0)).alias("sem_drop"),
        )
    )
    record_plan(flags, "zd01:funnel_flags")
    kept_near = "s_e * (1 - near_drop)"
    kept_sem = "s_e * (1 - near_drop) * (1 - sem_drop)"
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("s_e").cast("bigint").alias("n_exact_kept"),
            F.expr(f"CAST(SUM({kept_near}) AS BIGINT)").alias("n_near_kept"),
            F.expr(f"CAST(SUM({kept_sem}) AS BIGINT)").alias("n_sem_kept"),
            F.expr("CAST(SUM(s_e) * 1000000 DIV COUNT(*) AS BIGINT)").alias(
                "exact_keep_ppm"
            ),
            F.expr(_ppm(kept_near, "SUM(s_e)")).alias("near_keep_ppm"),
            F.expr(_ppm(kept_sem, f"SUM({kept_near})")).alias("sem_keep_ppm"),
            F.expr(
                f"CAST(SUM({kept_sem}) * 1000000 DIV COUNT(*) AS BIGINT)"
            ).alias("overall_keep_ppm"),
        )
        .orderBy("source")
    )
