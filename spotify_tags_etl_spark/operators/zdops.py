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


# ---------------------------------------------------------------------------
# zd02 — RAG index-build manifest (chunk -> project -> IVF assign -> rollup)
# ---------------------------------------------------------------------------

_ZD02_DIMS = 8    # ye01's projection head (j = 1..8 of the md5 matrix)
_ZD02_NCENT = 8   # "trained" centroids = projected corpus vectors 0..7


def _zd02_key2(dp: str, nc: str, hugeint: bool) -> str:
    """Integer-exact centroid-ordering key: dp^2 * 1e6 DIV nc, negated
    for negative dp — orders exactly like cosine dp/sqrt(nc) within a
    sign bucket (na is constant per vector and cancels). 128-bit
    product (dp^2 reaches ~2.3e19 > int64); the quotient is bounded by
    Cauchy-Schwarz at na * 1e6 < 5e15, so the final BIGINT cast is
    safe. Truncating DIV ties break on cent_id identically in both
    engines — no float anywhere in the assignment."""
    wide = f"CAST({dp} AS HUGEINT)" if hugeint else f"CAST({dp} AS DECIMAL(38,0))"
    div = "//" if hugeint else "DIV"
    mag = f"CAST(({wide} * {dp} * 1000000) {div} {nc} AS BIGINT)"
    return (
        f"CASE WHEN {nc} = 0 THEN 0 WHEN {dp} >= 0 THEN {mag} ELSE -{mag} END"
    )


def _zd02_key1(dp: str, nc: str) -> str:
    return (
        f"CASE WHEN {nc} = 0 THEN -2 WHEN {dp} > 0 THEN 1 "
        f"WHEN {dp} = 0 THEN 0 ELSE -1 END"
    )


def _zd02_oracle_sql() -> str:
    from spotify_tags_etl_spark.operators.textops import CHUNK_STEP, CHUNK_TOKENS
    from spotify_tags_etl_spark.operators.zcops import _zc03_w

    wrows = [
        [_zc03_w(i, j) for i in range(1, 65)] for j in range(1, _ZD02_DIMS + 1)
    ]
    proj = ",\n             ".join(
        f"CAST(list_dot_product(CAST(q AS DOUBLE[]),"
        f" CAST({wrows[j - 1]} AS DOUBLE[])) AS BIGINT) AS p{j}"
        for j in range(1, _ZD02_DIMS + 1)
    )
    dp = " + ".join(f"p.p{j} * cent.c{j}" for j in range(1, _ZD02_DIMS + 1))
    nc = " + ".join(f"p{j} * p{j}" for j in range(1, _ZD02_DIMS + 1))
    cent_cols = ", ".join(f"p{j} AS c{j}" for j in range(1, _ZD02_DIMS + 1))
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    chunks AS (
      SELECT doc_id,
             CAST(least({CHUNK_TOKENS}, len(toks) - st + 1) AS BIGINT) AS n_tokens
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks), {CHUNK_STEP})) AS st
            FROM t)
    ),
    q AS (
      SELECT vec_id,
             list_apply(embedding,
                        v -> CAST(floor(CAST(v AS DOUBLE) * 127) AS BIGINT)) AS q
      FROM embeddings
    ),
    p AS (SELECT vec_id, {proj} FROM q),
    cent AS (
      SELECT vec_id AS cent_id, {cent_cols}, CAST({nc} AS BIGINT) AS nc
      FROM p WHERE vec_id < {_ZD02_NCENT}
    ),
    sc AS (
      SELECT p.vec_id, cent.cent_id, CAST({dp} AS BIGINT) AS dp, cent.nc
      FROM p, cent
    ),
    asg AS (
      SELECT vec_id, cent_id FROM (
        SELECT vec_id, cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id
                 ORDER BY {_zd02_key1('dp', 'nc')} DESC,
                          {_zd02_key2('dp', 'nc', hugeint=True)} DESC,
                          cent_id ASC) AS rn
        FROM sc
      ) WHERE rn = 1
    ),
    j AS (
      SELECT a.cent_id AS list_id, c.doc_id, c.n_tokens, d.source
      FROM chunks c
      JOIN asg a ON a.vec_id = c.doc_id
      JOIN documents d ON d.doc_id = c.doc_id
    ),
    g AS (
      SELECT list_id,
             COUNT(*) AS n_chunks,
             COUNT(DISTINCT doc_id) AS n_docs,
             SUM(n_tokens) AS n_tokens,
             COUNT(DISTINCT source) AS n_sources
      FROM j GROUP BY list_id
    )
    SELECT CAST(list_id AS BIGINT) AS list_id,
           CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_sources AS BIGINT) AS n_sources,
           CAST(n_chunks * 1000000 // SUM(n_chunks) OVER () AS BIGINT)
             AS chunk_share_ppm,
           CAST(n_chunks * {_ZD02_NCENT} * 1000000 // SUM(n_chunks) OVER ()
                AS BIGINT) AS load_vs_uniform_ppm
    FROM g ORDER BY list_id
    """


@register(
    "zd02_rag_index_manifest",
    oracle=_zd02_oracle_sql(),
    doc=(
        "RAG INDEX-BUILD MANIFEST: composes tx06's token-window "
        "chunking, ye01's int8 projection (j = 1..8 of the md5-derived "
        "matrix — identical literals both engines), and vx01's IVF "
        "nearest-centroid assignment (centroids = projected corpus "
        "vectors 0..7) into the per-list manifest an index build "
        "publishes: list sizes (chunks/docs/tokens), source "
        "provenance, share-of-index ppm, and load-vs-uniform balance "
        "ppm (1e6 = perfectly balanced lists). Unlike vx01's float "
        "cosine ranking, the assignment here is FULLY integer-exact: "
        "centroid order is (sign(dp), dp^2*1e6 DIV |c|^2, cent_id) — "
        "equivalent to cosine order (the query-vector norm cancels), "
        "128-bit products, truncation ties broken on cent_id "
        "identically in both engines. Only embedded docs are "
        "indexable (inner join on vec_id = doc_id; at sf0.1 the "
        "fixture embeds a prefix of the doc space — exactly the "
        "production reality that un-embedded docs can't enter the "
        "index). Scale shape: the projected corpus is checkpointed "
        "once and reused (corpus side + centroid side); assignment is "
        "a broadcast of 8 centroid rows (never a shuffle of the "
        "corpus); chunking is a narrow in-scan fan-out; the final "
        "rollup has <= n_centroids groups, and the share window runs "
        "over that <= 8-row aggregate (documented tiny frame, xr03 "
        "class). At 100 TB the assigned frame is the "
        "partitionBy(list_id) layout vx01's probes prune."
    ),
    tags=("similarity", "report", "llm-pipeline"),
)
def zd02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spotify_tags_etl_spark.operators.textops import chunk_tokens
    from spotify_tags_etl_spark.operators.zcops import _zc03_w

    wrows = [
        [_zc03_w(i, j) for i in range(1, 65)] for j in range(1, _ZD02_DIMS + 1)
    ]
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 127) AS BIGINT))"
        ).alias("q"),
    )
    proj = q.select(
        "vec_id",
        *[
            F.expr(
                f"aggregate(zip_with(q, array({','.join(str(w) for w in wrows[j - 1])}),"
                " (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias(f"p{j}")
            for j in range(1, _ZD02_DIMS + 1)
        ],
    )
    # One corpus-projection scan feeds both the corpus side and the
    # centroid side — checkpoint instead of re-deriving (zc03's
    # discipline; at 100 TB this is the persisted projection table).
    record_plan(proj, "zd02:projected_corpus")
    proj = proj.localCheckpoint(eager=True)
    nc = " + ".join(f"c{j} * c{j}" for j in range(1, _ZD02_DIMS + 1))
    cents = (
        proj.where(F.col("vec_id") < _ZD02_NCENT)
        .select(
            F.col("vec_id").alias("cent_id"),
            *[F.col(f"p{j}").alias(f"c{j}") for j in range(1, _ZD02_DIMS + 1)],
        )
        .withColumn("nc", F.expr(f"CAST({nc} AS BIGINT)"))
    )
    dp = " + ".join(f"p{j} * c{j}" for j in range(1, _ZD02_DIMS + 1))
    scored = proj.crossJoin(F.broadcast(cents)).withColumn(
        "dp", F.expr(f"CAST({dp} AS BIGINT)")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.expr(_zd02_key1("dp", "nc")).desc(),
        F.expr(_zd02_key2("dp", "nc", hugeint=False)).desc(),
        F.col("cent_id").asc(),
    )
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "cent_id")
    )
    chunks = chunk_tokens(docs).select("doc_id", "n_tokens")
    joined = (
        chunks.join(assigned.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(F.col("cent_id").alias("list_id"), "doc_id", "n_tokens", "source")
    )
    g = joined.groupBy("list_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    # Share window over the <= 8-row list rollup — documented tiny frame.
    return g.select(
        F.col("list_id").cast("bigint").alias("list_id"),
        "n_chunks",
        "n_docs",
        "n_tokens",
        "n_sources",
        F.expr(
            "CAST(n_chunks * 1000000 DIV (SUM(n_chunks) OVER ()) AS BIGINT)"
        ).alias("chunk_share_ppm"),
        F.expr(
            f"CAST(n_chunks * {_ZD02_NCENT} * 1000000 DIV (SUM(n_chunks) OVER ()) AS BIGINT)"
        ).alias("load_vs_uniform_ppm"),
    ).orderBy("list_id")
