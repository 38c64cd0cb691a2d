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

from spotify_tags_etl_spark.operators.dedup import _minhash_ctes
from spotify_tags_etl_spark.operators.zcops import _zc03_ctes
from spotify_tags_etl_spark.plans.planmetrics import record_plan
from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.functions.arrowdot import pair_dot_int64
from spotify_tags_etl_spark.functions.concurrency import fan_out_scan
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
        "1e11 docs). Scale shape (r11): the report READS the PUBLISHED "
        "zf01 flags artifact (staleness-pinned spark-warehouse "
        "parquet), which stores exactly these three stages' "
        "unconditional verdicts (s_e, f_near, f_sem) — the live "
        "stage builders (hash-groupBy / banded LSH / bucketed "
        "sign-LSH, never all-pairs) run only when the artifact is "
        "absent/stale, under zf01's own publish path. Steady state is "
        "ONE pruned 4-column artifact scan + one map-combined "
        "per-source rollup — the ~5 s three-stage re-derivation this "
        "query paid before the artifact existed is now zf01's "
        "publish-once cost."
    ),
    tags=("dedup", "report", "llm-pipeline"),
)
def zd01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tags_etl_spark.operators.zfops import zf01_flags_artifact

    flags = zf01_flags_artifact(spark, sf_dir).select(
        "source",
        "s_e",
        F.col("f_near").alias("near_drop"),
        F.col("f_sem").alias("sem_drop"),
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
    from spotify_tags_etl_spark.operators.textops import chunk_tokens

    docs = load_table(spark, sf_dir, "documents")
    assigned = zd02_assignment(spark, sf_dir)
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
    return _zd02_share_columns(g)


def _zd02_share_columns(g: DataFrame) -> DataFrame:
    """Share/balance ppm columns over the <= 8-row per-list rollup —
    documented tiny frame (xr03 class); shared by zd02 and zd07."""
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


def zd02_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest's IVF assignment (vec_id -> cent_id): int8
    projection (ye01's matrix, j = 1..8), centroids = projected vectors
    0..7, integer-exact cosine ordering — shared by batch zd02 and the
    zd07 streaming twin (where it is the static side of the
    stream-static join)."""
    from pyspark.sql import Window

    from spotify_tags_etl_spark.operators.zcops import _zc03_w

    wrows = [
        [_zc03_w(i, j) for i in range(1, 65)] for j in range(1, _ZD02_DIMS + 1)
    ]
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
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "cent_id")
    )


# ---------------------------------------------------------------------------
# zd03 — semantic dedup with IN-QUERY LSH sizing (yv20 wiring, executable)
# ---------------------------------------------------------------------------

#: Occupancy target: bits grow until expected per-table bucket load
#: n / 2^bits <= this — the "~log n" sizing zc03 documents.
_ZD03_OCC = 32

#: Stripe width: table t always reads projections (t-1)*8+1 .. (t-1)*8+8
#: and uses the first ``bits`` of its stripe — so the projection INDEX
#: never depends on the derived bits (only a CASE gate does), keeping
#: the 32-dim literal matrix static in both engines.
_ZD03_MAX_BITS = 8
_ZD03_MAX_TABLES = 4

#: Per-bit sign-LSH collision probability at zc03's cosine threshold
#: (T = 350000 ppm): p = 1 - acos(0.35)/pi = 0.6138..., rounded to the
#: planner's 25-permille grid. A documented offline constant — the
#: only non-integer input, frozen so the in-query S-curve stays exact.
_ZD03_TAU_PM = 600

_ZD03_T_PPM = 350_000  # zc03's verify threshold — same decision rule


def zd03_plan(n: int) -> tuple[int, int]:
    """Python twin of the in-query (bits, tables) derivation — pinned
    against the SQL spelling by tests/test_round9_additions.py.

    bits: smallest power of two in {2,4,8} with n / 2^bits <= occupancy
    target (computed via the bin-length trick, never float log2);
    tables: argmin over {1,2,4} of the yv20 S-curve error at r=bits,
    tau=600 permille (exact ppm fixed-point, truncating squares)."""
    raw = len(bin(max((n - 1) // _ZD03_OCC, 0))[2:]) if n > 1 else 1
    bits = 2 if raw <= 2 else 4 if raw <= 4 else 8

    def sq(x: int) -> int:
        return (x * x) // 1_000_000

    best = None
    for b in (1, 2, 4):
        err = 0
        for s_pm in range(25, 976, 25):
            sr = sq(sq(s_pm * 1000))
            if bits == 2:
                sr = sq(s_pm * 1000)
            elif bits == 8:
                sr = sq(sq(sq(s_pm * 1000)))
            q = 1_000_000 - sr
            qb = q if b == 1 else sq(q) if b == 2 else sq(sq(q))
            p = 1_000_000 - qb
            err += p if s_pm < _ZD03_TAU_PM else 1_000_000 - p
        if best is None or (err, b) < best:
            best = (err, b)
    return bits, best[1]


def _zd03_curve(sq_div: str) -> str:
    """Shared staged-squaring fragment: expects (b, s_pm, bits) rows,
    yields (b, s_pm, p_ppm). Power-of-two exponents only — the exact
    fixed-point primitive both engines spell identically (yv20)."""

    def sq(x: str) -> str:
        return f"((({x}) * ({x})) {sq_div} 1000000)"

    s2, s4 = sq("s_pm * 1000"), sq(sq("s_pm * 1000"))
    s8 = sq(sq(sq("s_pm * 1000")))
    q1 = f"(1000000 - CASE bits WHEN 2 THEN {s2} WHEN 4 THEN {s4} ELSE {s8} END)"
    return (
        f"1000000 - CASE b WHEN 1 THEN {q1} WHEN 2 THEN {sq(q1)} "
        f"ELSE {sq(sq(q1))} END"
    )


def _zd03_oracle_sql() -> str:
    from spotify_tags_etl_spark.operators.zcops import _zc03_w

    dims = _ZD03_MAX_BITS * _ZD03_MAX_TABLES
    wrows = [[_zc03_w(i, j) for i in range(1, 65)] for j in range(1, dims + 1)]
    proj = ",\n             ".join(
        f"CAST(list_dot_product(CAST(q AS DOUBLE[]),"
        f" CAST({wrows[j - 1]} AS DOUBLE[])) AS BIGINT) AS p{j}"
        for j in range(1, dims + 1)
    )
    bks = ",\n             ".join(
        "("
        + " + ".join(
            f"CASE WHEN {m} < bits THEN {1 << m} * "
            f"(CASE WHEN p{_ZD03_MAX_BITS * (t - 1) + m + 1} > 0 THEN 1 ELSE 0 END)"
            " ELSE 0 END"
            for m in range(_ZD03_MAX_BITS)
        )
        + f") AS bk{t}"
        for t in range(1, _ZD03_MAX_TABLES + 1)
    )
    bk_case = " ".join(f"WHEN {t} THEN bk{t}" for t in range(1, _ZD03_MAX_TABLES + 1))
    t2 = _ZD03_T_PPM * _ZD03_T_PPM
    return f"""
    WITH n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    pl0 AS (
      SELECT n, CASE WHEN raw <= 2 THEN 2 WHEN raw <= 4 THEN 4 ELSE 8 END AS bits
      FROM (SELECT n, CASE WHEN n <= 1 THEN 1
                           ELSE length(bin((n - 1) // {_ZD03_OCC})) END AS raw
            FROM n0)
    ),
    curve AS (
      SELECT b, s_pm, {_zd03_curve("//")} AS p_ppm
      FROM (SELECT CAST(bb.b AS BIGINT) AS b, CAST(ss.s_pm AS BIGINT) AS s_pm,
                   pl0.bits
            FROM UNNEST([1, 2, 4]) AS bb(b),
                 UNNEST(generate_series(25, 975, 25)) AS ss(s_pm), pl0)
    ),
    pl AS (
      SELECT pl0.n, pl0.bits, sc.b AS tables
      FROM pl0, (
        SELECT b FROM (
          SELECT b, SUM(CASE WHEN s_pm < {_ZD03_TAU_PM} THEN p_ppm
                             ELSE 1000000 - p_ppm END) AS total_err
          FROM curve GROUP BY b
        ) ORDER BY total_err, b LIMIT 1
      ) sc
    ),
    q AS (
      SELECT vec_id,
             list_apply(embedding,
                        v -> CAST(floor(CAST(v AS DOUBLE) * 127) AS BIGINT)) AS q
      FROM embeddings
    ),
    p AS (
      SELECT vec_id, q,
             CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
                  AS BIGINT) AS na,
             {proj}
      FROM q
    ),
    b AS (
      SELECT vec_id, q, na,
             {bks}
      FROM p, pl
    ),
    c AS (
      SELECT b.vec_id, t, CASE t {bk_case} END AS bk
      FROM b, UNNEST([{",".join(str(t) for t in range(1, _ZD03_MAX_TABLES + 1))}]) AS u(t), pl
      WHERE t <= pl.tables
    ),
    pairs AS (
      SELECT DISTINCT c1.vec_id AS d1, c2.vec_id AS d2
      FROM c c1 JOIN c c2 ON c1.t = c2.t AND c1.bk = c2.bk
                         AND c1.vec_id < c2.vec_id
    ),
    dots AS (
      SELECT j.d2 AS d2,
             CAST(list_dot_product(CAST(b1.q AS DOUBLE[]), CAST(b2.q AS DOUBLE[]))
                  AS BIGINT) AS dp,
             b1.na AS na1, b2.na AS na2
      FROM pairs j
      JOIN b b1 ON b1.vec_id = j.d1
      JOIN b b2 ON b2.vec_id = j.d2
    ),
    dups AS (
      SELECT d2, COUNT(*) AS n FROM dots
      WHERE dp > 0
        AND CAST(dp AS HUGEINT) * dp * 1000000000000
            >= {t2} * (CAST(na1 AS HUGEINT) * na2)
      GROUP BY d2
    )
    SELECT q.vec_id AS vec_id,
           CAST(CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_smaller_dups,
           pl.n AS corpus_n,
           CAST(pl.bits AS BIGINT) AS bits,
           CAST(pl.tables AS BIGINT) AS tables
    FROM q LEFT JOIN dups d ON d.d2 = q.vec_id, pl
    ORDER BY vec_id
    """


@register(
    "zd03_semantic_dedup_planned",
    oracle=_zd03_oracle_sql(),
    doc=(
        "SEMANTIC DEDUP WITH IN-QUERY LSH SIZING — makes zc03's "
        "'production sizes come from the planner' claim executable: "
        "(bits, tables) are DERIVED INSIDE THE QUERY from the corpus "
        "size and the yv20 S-curve machinery, then the dedup runs at "
        "that size, emitting (corpus_n, bits, tables) alongside every "
        "keep/drop decision so the wiring itself is hash-checked. "
        "Sizing: bits = smallest power of two in {2,4,8} with "
        f"n/2^bits <= {_ZD03_OCC} expected bucket occupancy (the "
        "bin-length trick — never float log2); tables = argmin over "
        "{1,2,4} of the S-curve error 1-(1-s^bits)^tables vs the "
        f"{_ZD03_TAU_PM}-permille per-bit collision threshold "
        "(= sign-LSH collision prob 1-acos(0.35)/pi at zc03's cosine "
        "threshold, rounded to the planner grid — the one documented "
        "offline constant), evaluated in exact ppm fixed-point by "
        "repeated truncating squaring (yv20's primitive). Projection "
        "layout: table t always reads its OWN 8-wide stripe of the "
        "32-dim md5 matrix and gates bits with a CASE — so the "
        "literal matrix is static in both engines while the used "
        "width is data-dependent. Same exact-integer cosine verify "
        "and transitive-closure drop-by-id rule as zc03 (see zc03's "
        "doc for the chain-over-drop caveat). At the fixture SFs the "
        "derivation yields bits=4 @ n=500 (matching zc03's hand "
        "constant) and bits=8 @ n=2000 — the planner reacting to "
        "corpus growth is exactly what the driver's multi-SF sweep "
        "now checks. Scale shape: the planner is O(1) rows (count + "
        "117-point grid, broadcast onto the corpus via a 1-row "
        "equi-join); the projected corpus is checkpointed once for "
        "all three consumers; per-table bucket joins keyed (t, bk); "
        "never all-pairs."
    ),
    tags=("dedup", "similarity", "planner", "llm-pipeline"),
)
def zd03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tags_etl_spark.operators.zcops import _zc03_w

    dims = _ZD03_MAX_BITS * _ZD03_MAX_TABLES
    wrows = [[_zc03_w(i, j) for i in range(1, 65)] for j in range(1, dims + 1)]
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # --- planner: 1-row (n, bits) frame -> S-curve -> (n, bits, tables)
    pl0 = (
        emb.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .selectExpr(
            "n",
            f"CASE WHEN n <= 1 THEN 1 ELSE length(bin((n - 1) DIV {_ZD03_OCC})) END AS raw",
        )
        .selectExpr(
            "n",
            "CAST(CASE WHEN raw <= 2 THEN 2 WHEN raw <= 4 THEN 4 ELSE 8 END AS BIGINT) AS bits",
        )
        .withColumn("_k", F.lit(1))
    )
    grid = (
        spark.range(1)
        .select(F.explode(F.array(F.lit(1), F.lit(2), F.lit(4))).alias("b"))
        .select(
            F.col("b").cast("long").alias("b"),
            F.explode(F.sequence(F.lit(25), F.lit(975), F.lit(25))).alias("s_pm"),
        )
        .select("b", F.col("s_pm").cast("long").alias("s_pm"))
        .withColumn("_k", F.lit(1))
    )
    curve = grid.join(F.broadcast(pl0), "_k").selectExpr(
        "b", "s_pm", f"{_zd03_curve('DIV')} AS p_ppm"
    )
    scored = curve.groupBy("b").agg(
        F.sum(
            F.when(F.col("s_pm") < _ZD03_TAU_PM, F.col("p_ppm")).otherwise(
                1_000_000 - F.col("p_ppm")
            )
        ).alias("total_err")
    )
    best = scored.agg(
        F.min(F.struct("total_err", "b")).alias("m")
    ).select(F.col("m.b").cast("bigint").alias("tables"), F.lit(1).alias("_k"))
    plan = pl0.join(F.broadcast(best), "_k").select("n", "bits", "tables", "_k")

    # --- corpus side: 32 stripe projections, bits-gated buckets
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 127) AS BIGINT))"
        ).alias("q"),
    )
    proj_cols = [
        F.expr(
            f"aggregate(zip_with(q, array({','.join(str(w) for w in wrows[j - 1])}),"
            " (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias(f"p{j}")
        for j in range(1, dims + 1)
    ]
    na = F.expr(
        "aggregate(zip_with(q, q, (x, y) -> x * y), CAST(0 AS BIGINT),"
        " (acc, v) -> acc + v)"
    ).alias("na")
    p = q.select("vec_id", "q", na, *proj_cols).withColumn("_k", F.lit(1))
    bks = [
        F.expr(
            " + ".join(
                f"CASE WHEN {m} < bits THEN {1 << m} * "
                f"(CASE WHEN p{_ZD03_MAX_BITS * (t - 1) + m + 1} > 0 THEN 1 ELSE 0 END)"
                " ELSE 0 END"
                for m in range(_ZD03_MAX_BITS)
            )
        ).alias(f"bk{t}")
        for t in range(1, _ZD03_MAX_TABLES + 1)
    ]
    b = p.join(F.broadcast(plan), "_k").select(
        "vec_id", "q", "na", "n", "bits", "tables", *bks
    )
    # ONE corpus scan for candidate explode + both pair sides (zc03's
    # checkpoint discipline) — also freezes the derived plan columns.
    record_plan(b, "zd03:projected_corpus")
    b = b.localCheckpoint(eager=True)
    c = b.select(
        "vec_id",
        "tables",
        F.posexplode(
            F.array(*[F.col(f"bk{t}") for t in range(1, _ZD03_MAX_TABLES + 1)])
        ).alias("t0", "bk"),
    ).where(F.col("t0") < F.col("tables")).select(
        "vec_id", (F.col("t0") + 1).alias("t"), "bk"
    )
    c1 = c.select(F.col("vec_id").alias("d1"), "t", "bk")
    c2 = c.select(F.col("vec_id").alias("d2"), "t", "bk")
    pairs = (
        c1.join(c2, ["t", "bk"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    b1 = b.select(
        F.col("vec_id").alias("d1"), F.col("q").alias("q1"), F.col("na").alias("na1")
    )
    b2 = b.select(
        F.col("vec_id").alias("d2"), F.col("q").alias("q2"), F.col("na").alias("na2")
    )
    t2 = _ZD03_T_PPM * _ZD03_T_PPM
    # r13: exact-verify dot as one numpy einsum per Arrow batch (guide
    # §4.2; integer sums — bit-identical; functions/arrowdot.py).
    dups = (
        pair_dot_int64(
            pairs.join(b1, "d1").join(b2, "d2").select(
                "d2", "na1", "na2", "q1", "q2"
            ),
            "q1",
            "q2",
            "dp",
        )
        .where(
            (F.col("dp") > 0)
            & (
                F.expr("CAST(dp AS DECIMAL(38,0)) * dp * 1000000000000")
                >= F.expr(f"{t2} * (CAST(na1 AS DECIMAL(38,0)) * na2)")
            )
        )
        .groupBy("d2")
        .agg(F.count(F.lit(1)).alias("dn"))
    )
    return (
        b.select("vec_id", "n", "bits", "tables")
        .join(dups.withColumnRenamed("d2", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.expr("CAST(CASE WHEN dn IS NULL THEN 1 ELSE 0 END AS BIGINT)").alias(
                "keep"
            ),
            F.coalesce("dn", F.lit(0)).cast("bigint").alias("n_smaller_dups"),
            F.col("n").alias("corpus_n"),
            F.col("bits").cast("bigint").alias("bits"),
            F.col("tables").cast("bigint").alias("tables"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# zd04 — contamination-aware packing (zc01 x tz06)
# ---------------------------------------------------------------------------


def contamination_aware_packing(
    docs: DataFrame, contaminated: DataFrame
) -> DataFrame:
    """Banded-FFD packing plan with an exclusion list applied at pack
    time: ``contaminated`` (any frame with a ``doc_id`` column) is
    dropped from the packing input, and the per-band report accounts
    BOTH sides — kept docs/tokens plus window counts via zc01's exact
    rank arithmetic (windows = ceil(kept / k), k = W / 2^band), and the
    displaced docs/token mass the exclusion removed. Token and band
    arithmetic is zc01's verbatim (same constants), so displaced + kept
    telescopes to zc01's input mass exactly."""
    from spotify_tags_etl_spark.operators.zcops import ZC01_TOK_PPM, ZC01_WINDOW

    banded = docs.select(
        "doc_id",
        F.expr(
            f"LEAST(GREATEST(CAST(n_chars AS BIGINT) * {ZC01_TOK_PPM}"
            f" DIV 1000000, 1), {ZC01_WINDOW})"
        ).alias("tok"),
    ).withColumn(
        "band_exp",
        F.expr("CASE WHEN tok <= 1 THEN 0 ELSE length(bin(tok - 1)) END"),
    )
    con = contaminated.select("doc_id").distinct().withColumn("con", F.lit(1))
    flagged = banded.join(con, "doc_id", "left").select(
        "band_exp", "tok", F.coalesce("con", F.lit(0)).alias("con")
    )
    record_plan(flagged, "zd04:flagged_bands")
    return (
        flagged.groupBy("band_exp")
        .agg(
            F.expr("CAST(SUM(1 - con) AS BIGINT)").alias("n_kept"),
            F.expr("CAST(SUM(con) AS BIGINT)").alias("n_displaced"),
            F.expr("CAST(SUM((1 - con) * tok) AS BIGINT)").alias("kept_tokens"),
            F.expr("CAST(SUM(con * tok) AS BIGINT)").alias("displaced_tokens"),
        )
        .select(
            F.col("band_exp").cast("bigint").alias("band_exp"),
            "n_kept",
            "n_displaced",
            "kept_tokens",
            "displaced_tokens",
            F.expr(
                f"CAST((n_kept + ({ZC01_WINDOW} DIV shiftleft(CAST(1 AS BIGINT), band_exp)) - 1)"
                f" DIV ({ZC01_WINDOW} DIV shiftleft(CAST(1 AS BIGINT), band_exp)) AS BIGINT)"
            ).alias("n_windows"),
        )
        .withColumn(
            "fill_ppm",
            F.expr(
                f"CAST(kept_tokens * 1000000 DIV NULLIF(n_windows * {ZC01_WINDOW}, 0) AS BIGINT)"
            ),
        )
        .orderBy("band_exp")
    )


def _zd04_oracle_sql() -> str:
    from spotify_tags_etl_spark.operators.training import DECON_NGRAM
    from spotify_tags_etl_spark.operators.training import _hash_frac_sql
    from spotify_tags_etl_spark.operators.zcops import ZC01_TOK_PPM, ZC01_WINDOW

    return f"""
    WITH g AS (
      SELECT doc_id,
             {_hash_frac_sql('doc_id')} AS frac,
             unnest([array_to_string(toks[i : i + {DECON_NGRAM} - 1], ' ')
                     for i in generate_series(1, greatest(len(toks) - {DECON_NGRAM - 1}, 0))]) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    train AS (SELECT DISTINCT doc_id, gram FROM g WHERE frac < 0.8),
    test AS (SELECT DISTINCT gram FROM g WHERE frac >= 0.9),
    con AS (SELECT DISTINCT train.doc_id FROM train JOIN test USING (gram)),
    banded AS (
      SELECT d.doc_id,
             LEAST(GREATEST(CAST(n_chars AS BIGINT) * {ZC01_TOK_PPM} // 1000000, 1),
                   {ZC01_WINDOW}) AS tok,
             CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS con
      FROM documents d LEFT JOIN con c ON c.doc_id = d.doc_id
    ),
    bands AS (
      SELECT CASE WHEN tok <= 1 THEN 0 ELSE length(bin(tok - 1)) END AS band_exp,
             tok, con
      FROM banded
    ),
    agg AS (
      SELECT band_exp,
             CAST(SUM(1 - con) AS BIGINT) AS n_kept,
             CAST(SUM(con) AS BIGINT) AS n_displaced,
             CAST(SUM((1 - con) * tok) AS BIGINT) AS kept_tokens,
             CAST(SUM(con * tok) AS BIGINT) AS displaced_tokens,
             {ZC01_WINDOW} // (CAST(1 AS BIGINT) << band_exp) AS k
      FROM bands GROUP BY band_exp
    )
    SELECT CAST(band_exp AS BIGINT) AS band_exp,
           n_kept, n_displaced, kept_tokens, displaced_tokens,
           CAST((n_kept + k - 1) // k AS BIGINT) AS n_windows,
           CAST(kept_tokens * 1000000
                // NULLIF(((n_kept + k - 1) // k) * {ZC01_WINDOW}, 0) AS BIGINT)
             AS fill_ppm
    FROM agg ORDER BY band_exp
    """


@register(
    "zd04_contamination_aware_packing",
    oracle=_zd04_oracle_sql(),
    doc=(
        "CONTAMINATION-AWARE PACKING: zc01's banded-FFD sequence "
        "packing composed with tz06's eval decontamination — "
        "contaminated docs (train-split docs sharing any eval n-gram) "
        "are excluded AT PACK TIME, and the per-band report accounts "
        "both sides: kept docs/tokens with the resulting window count "
        "and fill ppm (zc01's exact rank arithmetic: windows = "
        "ceil(kept/k), k = W/2^band), and the DISPLACED doc/token "
        "mass the exclusion removed — the number a pretraining run "
        "ships so the data org can see what decontamination cost "
        "each length band. Kept + displaced telescopes to the "
        "unfiltered corpus mass per band (planted-contamination test "
        "pins displaced == planted). Scale shape: one corpus "
        "projection scan (doc_id, n_chars) LEFT-joined against the "
        "contaminated id list (corpus-fraction-sized, AQE-broadcast); "
        "<= 13-band rollup with map-side partials; the n-gram "
        "machinery is tz06's own (test-side gram set broadcast). All "
        "integer arithmetic — bin-length bands, exact ceil-div window "
        "counts, truncating ppm — bit-identical across engines."
    ),
    tags=("training", "packing", "quality", "llm-pipeline"),
)
def zd04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tags_etl_spark.operators.training import decontaminate

    # r12 §14: fan the single-split corpus out before the gram explodes
    docs = fan_out_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    return contamination_aware_packing(docs, decontaminate(docs))


# ---------------------------------------------------------------------------
# zd05 — streaming twin of zd01's exact + near funnel stages
# ---------------------------------------------------------------------------


def streaming_dedup_funnel(spark: SparkSession, stream_docs: DataFrame) -> DataFrame:
    """Incremental dedup-funnel accounting: each micro-batch of
    documents reduces to

    * a (text_hash, source, n, min_doc) EXACT-stage census partial,
      SUM/MIN-merged into a versioned-parquet census — n and min_doc
      merge associatively and commutatively, so the converged census
      equals the batch hash-groupBy whatever the micro-batch layout
      (and is watchable mid-stream for duplicate-rate drift), and
    * idempotent per-batch NEAR-stage doc partials (overwrite by
      batch_id; each doc arrives in exactly one batch): the doc's
      MinHash signature (computed fully in-batch — a signature is a
      per-doc aggregate) and its shingle set, i.e. exactly the
      persisted signature/shingle store a production LSH dedup keeps.

    At close the census yields per-source doc counts and exact keeps
    (global per-hash min over the per-source minima), the signature
    store band-joins into candidate pairs and the shingle store
    verifies them at dd02's threshold — the same near-drop set as the
    batch path, never an all-pairs join. The SEMANTIC stage stays
    batch by design: its candidate pairs need the full projected
    corpus on both sides (zc03), which is not a census merge — a
    production run executes zc03/zd03 over the accumulated corpus
    after ingest, exactly as zd01 composes it."""
    import os
    import shutil
    import tempfile

    from spotify_tags_etl_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )
    from spotify_tags_etl_spark.streaming.ops import (
        record_batch_plan,
        record_state_ops,
    )

    root = tempfile.mkdtemp(prefix="zd05_funnel_")
    sig_root = os.path.join(root, "signatures")
    sh_root = os.path.join(root, "shingles")
    sig_dirs: list[str] = []
    sh_dirs: list[str] = []
    current: list[str] = []  # exact-census version pointer

    plan_seen: set = set()  # r13: fingerprint each label once per run
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        from spotify_tags_etl_spark.functions.concurrency import (
            fan_out_scan,
            run_parallel,
        )

        # r12 §14: single-split fixture batches would run the per-doc
        # shingle/MinHash map work as ONE task — fan out to the core
        # count (scale-adaptive no-op once the batch has >= cores splits)
        batch = fan_out_scan(batch, "doc_id")
        # r13: checkpointing the shared shingle explode here was
        # measured WORSE (alternating-process A/B: plain medians
        # 2.8-3.8 s vs checkpointed 3.5-5.7) — the two consumers run in
        # CONCURRENT jobs, so the duplicate explode was already free on
        # idle cores while the checkpoint serializes a job ahead of
        # them. Contrast st09, where the same subtree fed three
        # branches of ONE job and the checkpoint won 0.79x.
        sh = word_shingles(batch)
        sig = minhash_signatures(sh)
        record_batch_plan(sig, "zd05:sig_partial", seen=plan_seen)
        sig_dir = os.path.join(sig_root, f"b{batch_id}")
        sh_dir = os.path.join(sh_root, f"b{batch_id}")
        part = batch.groupBy(
            F.md5("text").alias("text_hash"), F.col("source")
        ).agg(
            F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_doc")
        )
        if current:
            merged = (
                spark.read.parquet(current[0])
                .unionByName(part)
                .groupBy("text_hash", "source")
                .agg(F.sum("n").alias("n"), F.min("min_doc").alias("min_doc"))
            )
        else:
            merged = part
        record_batch_plan(merged, "zd05:exact_census_merge", seen=plan_seen)
        target = os.path.join(root, f"census_v{batch_id}")

        # r12 §2.6: the three per-trigger writes are independent sinks
        # (per-batch overwrites / a fresh census version) — overlap
        # them. Frames, plans, and replay semantics are unchanged; the
        # census version pointer advances only after ITS write returns.
        def census_write() -> None:
            merged.write.mode("overwrite").parquet(target)
            current[:] = [target]

        run_parallel(
            lambda: sig.write.mode("overwrite").parquet(sig_dir),
            lambda: sh.write.mode("overwrite").parquet(sh_dir),
            census_write,
        )
        if sig_dir not in sig_dirs:
            sig_dirs.append(sig_dir)
        if sh_dir not in sh_dirs:
            sh_dirs.append(sh_dir)

    q = (
        stream_docs.select("doc_id", "source", "text")
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        record_state_ops(q, "foreachBatch")
    finally:
        q.stop()
    if not current:
        return spark.createDataFrame(
            [],
            "source string, n_docs bigint, n_exact_kept bigint, "
            "n_near_kept bigint, exact_keep_ppm bigint, near_keep_ppm bigint",
        )
    # checkpoint only because rmtree below deletes the backing files; a
    # production run leaves census + stores as the parquet they are
    # (r12 §2.6: three independent reads — materialize concurrently)
    from spotify_tags_etl_spark.functions.concurrency import checkpoint_parallel

    cps = checkpoint_parallel(
        {
            "census": spark.read.parquet(current[0]),
            "sig_store": spark.read.parquet(*sig_dirs),
            "sh_store": spark.read.parquet(*sh_dirs),
        }
    )
    census, sig_store, sh_store = cps["census"], cps["sig_store"], cps["sh_store"]
    # r13: the delete needs nothing below and nothing below needs it —
    # off the critical path (zf02's close change)
    import threading

    threading.Thread(
        target=shutil.rmtree, args=(root,), kwargs={"ignore_errors": True}
    ).start()

    # Exact keeps: per-hash global min over the per-(hash, source)
    # minima — each keep attributed to ITS OWN source via min(struct).
    keeps = (
        census.groupBy("text_hash")
        .agg(F.min(F.struct("min_doc", "source")).alias("m"))
        .select(F.col("m.min_doc").alias("doc_id"), F.col("m.source").alias("source"))
    )
    near_drops = (
        jaccard_verify(
            lsh_candidate_pairs(sig_store), sh_store, threshold_permille=_ZD01_NEAR_PERMILLE
        )
        .select(F.col("d2").alias("doc_id"))
        .distinct()
        .withColumn("near_drop", F.lit(1))
    )
    kept = keeps.join(near_drops, "doc_id", "left").select(
        "source", F.coalesce("near_drop", F.lit(0)).alias("near_drop")
    )
    per_source_docs = census.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs")
    )
    per_source_keeps = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact_kept"),
        F.expr("CAST(SUM(1 - near_drop) AS BIGINT)").alias("n_near_kept"),
    )
    out = (
        per_source_docs.join(per_source_keeps, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_exact_kept", F.lit(0)).alias("n_exact_kept"),
            F.coalesce("n_near_kept", F.lit(0)).alias("n_near_kept"),
        )
        .withColumn(
            "exact_keep_ppm",
            F.expr("CAST(n_exact_kept * 1000000 DIV n_docs AS BIGINT)"),
        )
        .withColumn(
            "near_keep_ppm",
            F.expr("CAST(n_near_kept * 1000000 DIV NULLIF(n_exact_kept, 0) AS BIGINT)"),
        )
        .orderBy("source")
    )
    record_plan(out, "zd05:funnel_report")
    return out


def _zd05_register() -> None:
    @register(
        "zd05_stream_dedup_funnel",
        oracle=f"""
        WITH {_minhash_ctes(_ZD01_NEAR_PERMILLE)},
        ek AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        flags AS (
          SELECT d.source,
                 CASE WHEN ek.doc_id IS NOT NULL THEN 1 ELSE 0 END AS s_e,
                 CASE WHEN nd.d2 IS NOT NULL THEN 1 ELSE 0 END AS near_drop
          FROM documents d
          LEFT JOIN ek ON ek.doc_id = d.doc_id
          LEFT JOIN (SELECT DISTINCT d2 FROM verified) nd ON nd.d2 = d.doc_id
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(s_e) AS BIGINT) AS n_exact_kept,
               CAST(SUM(s_e * (1 - near_drop)) AS BIGINT) AS n_near_kept,
               CAST(SUM(s_e) * 1000000 // COUNT(*) AS BIGINT) AS exact_keep_ppm,
               CAST(SUM(s_e * (1 - near_drop)) * 1000000
                    // NULLIF(SUM(s_e), 0) AS BIGINT) AS near_keep_ppm
        FROM flags GROUP BY source ORDER BY source
        """,
        doc=(
            "Streaming twin of zd01's exact + near funnel stages: per "
            "micro-batch the documents reduce to a SUM/MIN-mergeable "
            "(text_hash, source, n, min_doc) exact census (versioned-"
            "parquet state, watchable mid-stream for duplicate-rate "
            "drift) and idempotent per-batch MinHash-signature + "
            "shingle doc partials (signatures are per-doc aggregates, "
            "so they compute fully in-batch); at close the census "
            "yields per-source counts and exact keeps, and the "
            "signature store band-joins + shingle-verifies into "
            "dd02's near-drop set — identical to the batch funnel for "
            "any micro-batch layout (pinned under a 3-file split). "
            "The SEMANTIC stage stays batch by design: its candidate "
            "pairs need the full projected corpus on both sides, "
            "which is not a census merge — production runs zc03/zd03 "
            "over the accumulated corpus after ingest (zd01). Oracle: "
            "zd01's SQL minus the semantic stage. Per-trigger cost "
            "O(batch); the raw stream is never re-scanned."
        ),
        tags=("streaming", "dedup", "report", "llm-pipeline"),
    )
    def zd05(spark: SparkSession, sf_dir: str) -> DataFrame:
        from spotify_tags_etl_spark.streaming.ops import read_table_stream

        return streaming_dedup_funnel(
            spark, read_table_stream(spark, sf_dir, "documents")
        )


_zd05_register()


# ---------------------------------------------------------------------------
# zd06 — keep-set greedy semantic dedup (SemDeDup-faithful variant of zc03)
# ---------------------------------------------------------------------------

#: Dependency-chain bound for the greedy fixed point — same role as
#: connected_components' max_iter (vz01). Chains longer than this
#: raise loudly rather than return a partial keep-set.
_ZD06_MAX_ROUNDS = 16


def _zd06_oracle_sql() -> str:
    rounds = []
    for i in range(1, _ZD06_MAX_ROUNDS + 1):
        prev = f"r{i - 1}"
        rounds.append(f"""
    r{i} AS MATERIALIZED (
      SELECT v, keep, rnd FROM {prev}
      UNION ALL
      SELECT d2 AS v,
             CASE WHEN any_kept = 1 THEN 0 ELSE 1 END AS keep,
             {i} AS rnd
      FROM (
        SELECT e.d2,
               MAX(CASE WHEN p.keep = 1 THEN 1 ELSE 0 END) AS any_kept,
               MIN(CASE WHEN p.v IS NOT NULL THEN 1 ELSE 0 END) AS all_decided
        FROM edges e
        LEFT JOIN {prev} p ON p.v = e.d1
        WHERE e.d2 NOT IN (SELECT v FROM {prev})
        GROUP BY e.d2
      ) s
      WHERE any_kept = 1 OR all_decided = 1
    )""")
    from spotify_tags_etl_spark.operators.zcops import _zc03_ctes

    return f"""
    WITH {_zc03_ctes()},
    r0 AS MATERIALIZED (
      SELECT q.vec_id AS v, 1 AS keep, 0 AS rnd
      FROM q WHERE q.vec_id NOT IN (SELECT d2 FROM edges)
    ),{",".join(rounds)}
    SELECT v AS vec_id,
           CAST(keep AS BIGINT) AS keep,
           CAST(rnd AS BIGINT) AS decided_round
    FROM r{_ZD06_MAX_ROUNDS} ORDER BY vec_id
    """


@register(
    "zd06_semantic_dedup_keepset",
    oracle=_zd06_oracle_sql(),
    doc=(
        "KEEP-SET GREEDY semantic dedup — the SemDeDup-faithful "
        "decision rule zc03's doc explicitly does NOT implement: a "
        "vector is dropped iff some KEPT smaller-id vector clears the "
        "threshold, so on a chain A~B, B~C, A!~C it keeps C (compared "
        "only against kept A) where zc03's transitive-closure rule "
        "over-drops both B and C. Candidate generation and the exact "
        "integer-cosine edge relation are zc03's own "
        "(zc03_corpus_and_edges — shared code and shared CTE body, "
        "not a re-spelling); the greedy fixed point is computed by "
        "bounded parallel rounds over the duplicate-edge graph: round "
        "0 keeps every vector with no smaller dup partner, round k "
        "decides any vector with a kept smaller neighbor (drop) or "
        "with all smaller neighbors decided-dropped (keep). Rounds "
        f"needed = longest dependency chain, bounded at "
        f"{_ZD06_MAX_ROUNDS} (raises loudly past it — vz01's max_iter "
        "discipline); the oracle unrolls the SAME rounds as "
        "MATERIALIZED CTEs (za02's lesson: DuckDB default CTE "
        "inlining is exponential when a round is referenced twice). "
        "Each round is O(edges) keyed joins against the checkpointed "
        "edge graph — vertices outside the dup graph decide at round "
        "0 and never re-enter; per-round frames are localCheckpointed "
        "(plan-feeding loop, za02/yv10 class) and stage plans are "
        "recorded per round. Output (vec_id, keep, decided_round). "
        "Drop-set containment vs zc03 (keepset drops are a SUBSET of "
        "transitive drops) is pinned by a test."
    ),
    tags=("dedup", "similarity", "embedding", "llm-pipeline"),
)
def zd06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tags_etl_spark.operators.zcops import zc03_corpus_and_edges

    b, edges = zc03_corpus_and_edges(spark, sf_dir)
    record_plan(edges, "zd06:dup_edges")
    edges = edges.localCheckpoint(eager=True)
    verts = b.select("vec_id")
    targets = edges.select(F.col("d2").alias("vec_id")).distinct()
    decided = (
        verts.join(targets, "vec_id", "left_anti")
        .select(
            "vec_id",
            F.lit(1).cast("long").alias("keep"),
            F.lit(0).cast("long").alias("decided_round"),
        )
    )
    record_plan(decided, "zd06:round0")
    decided = decided.localCheckpoint(eager=True)
    undecided = targets.localCheckpoint(eager=True)
    for i in range(1, _ZD06_MAX_ROUNDS + 1):
        if undecided.isEmpty():
            break
        nbr = undecided.withColumnRenamed("vec_id", "d2").join(edges, "d2")
        j = nbr.join(
            decided.select(F.col("vec_id").alias("d1"), "keep"), "d1", "left"
        )
        newly = (
            j.groupBy("d2")
            .agg(
                F.max(F.coalesce("keep", F.lit(0))).alias("any_kept"),
                F.min(
                    F.when(F.col("keep").isNotNull(), 1).otherwise(0)
                ).alias("all_decided"),
            )
            .where((F.col("any_kept") == 1) | (F.col("all_decided") == 1))
            .select(
                F.col("d2").alias("vec_id"),
                F.when(F.col("any_kept") == 1, F.lit(0))
                .otherwise(F.lit(1))
                .cast("long")
                .alias("keep"),
                F.lit(i).cast("long").alias("decided_round"),
            )
        )
        record_plan(newly, f"zd06:round")
        decided = decided.unionByName(newly).localCheckpoint(eager=True)
        undecided = undecided.join(
            newly.select("vec_id"), "vec_id", "left_anti"
        ).localCheckpoint(eager=True)
    if not undecided.isEmpty():
        raise RuntimeError(
            f"zd06: dependency chain exceeds {_ZD06_MAX_ROUNDS} rounds"
        )
    return decided.orderBy("vec_id")


# ---------------------------------------------------------------------------
# zd07 — streaming twin of zd02: incremental index-build manifest
# ---------------------------------------------------------------------------


def streaming_rag_manifest(spark: SparkSession, sf_dir: str, stream_docs: DataFrame) -> DataFrame:
    """Incremental RAG index-build accounting: the IVF assignment
    (vec_id -> list_id, zd02_assignment) is the STATIC side — computed
    once up front from the embeddings table and broadcast against every
    micro-batch (the stream-static join pattern, st04). Each batch of
    documents chunks (tx06), joins the assignment, and reduces to a
    (list_id, source, n_chunks, n_docs, n_tokens) census partial that
    SUM-merges into versioned parquet — docs arrive whole (all chunks
    of a doc are in its batch), so per-batch distinct-doc counts merge
    exactly; distinct sources per list fall out of the census KEY. At
    close the census rolls up to zd02's exact per-list manifest —
    order-free merges => micro-batch-layout invariant."""
    import os
    import shutil
    import tempfile

    from spotify_tags_etl_spark.operators.textops import chunk_tokens
    from spotify_tags_etl_spark.streaming.ops import (
        record_batch_plan,
        record_state_ops,
    )

    assigned = zd02_assignment(spark, sf_dir).localCheckpoint(eager=True)
    root = tempfile.mkdtemp(prefix="zd07_manifest_")
    current: list[str] = []

    plan_seen: set = set()  # r13: fingerprint each label once per run
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        chunks = chunk_tokens(batch).select("doc_id", "n_tokens")
        part = (
            chunks.join(
                F.broadcast(assigned.withColumnRenamed("vec_id", "doc_id")),
                "doc_id",
            )
            .join(batch.select("doc_id", "source"), "doc_id")
            .groupBy(F.col("cent_id").alias("list_id"), "source")
            .agg(
                F.count(F.lit(1)).alias("n_chunks"),
                F.countDistinct("doc_id").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
            )
        )
        if current:
            merged = (
                spark.read.parquet(current[0])
                .unionByName(part)
                .groupBy("list_id", "source")
                .agg(
                    F.sum("n_chunks").alias("n_chunks"),
                    F.sum("n_docs").alias("n_docs"),
                    F.sum("n_tokens").alias("n_tokens"),
                )
            )
        else:
            merged = part
        record_batch_plan(merged, "zd07:census_merge", seen=plan_seen)
        target = os.path.join(root, f"census_v{batch_id}")
        merged.write.mode("overwrite").parquet(target)
        current[:] = [target]

    q = (
        stream_docs.select("doc_id", "source", "text")
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        record_state_ops(q, "foreachBatch")
    finally:
        q.stop()
    if not current:
        return spark.createDataFrame(
            [],
            "list_id bigint, n_chunks bigint, n_docs bigint, n_tokens bigint,"
            " n_sources bigint, chunk_share_ppm bigint, load_vs_uniform_ppm bigint",
        )
    census = spark.read.parquet(current[0]).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    g = census.groupBy("list_id").agg(
        F.sum("n_chunks").cast("bigint").alias("n_chunks"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        # distinct sources per list == census rows per list (source is
        # part of the census key)
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    out = _zd02_share_columns(g)
    record_plan(out, "zd07:manifest_report")
    return out


def _zd07_register() -> None:
    @register(
        "zd07_stream_rag_manifest",
        oracle=_zd02_oracle_sql(),
        doc=(
            "Streaming twin of zd02: the IVF assignment is the static "
            "side (zd02_assignment, computed once and broadcast — the "
            "st04 stream-static join pattern); each micro-batch of "
            "documents chunks (tx06), joins the assignment, and "
            "reduces to a (list_id, source) census partial SUM-merged "
            "into versioned parquet. Docs arrive whole, so per-batch "
            "distinct-doc counts merge exactly, and distinct sources "
            "per list fall out of the census key at close. The "
            "close-time rollup is zd02's manifest exactly (oracle: "
            "zd02's SQL verbatim; layout-invariance pinned under a "
            "3-file split). Per-trigger cost O(batch + lists x "
            "sources); the raw stream is never re-scanned."
        ),
        tags=("streaming", "similarity", "report", "llm-pipeline"),
    )
    def zd07(spark: SparkSession, sf_dir: str) -> DataFrame:
        from spotify_tags_etl_spark.streaming.ops import read_table_stream

        return streaming_rag_manifest(
            spark, sf_dir, read_table_stream(spark, sf_dir, "documents")
        )


_zd07_register()
