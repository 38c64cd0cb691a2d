"""Round-10 compositions (zg band): close the curation-to-training loop.

zg01 — curated-corpus packing manifest: zf01's five-stage survivor set
packed with zc01's banded FFD, reported per length band with the token
mass each curation stage DISPLACED from that band (first-drop
attribution) — the "final training batches" manifest a pretraining org
ships: how many windows the curated corpus actually fills, at what
fill, and what each curation stage cost each band.

zg02 — curated curriculum schedule: zc05's quota-mixed easy-to-hard
dataloader manifest re-derived over the SURVIVOR corpus — curation
shifts per-source char mass, so the Hamilton quotas are re-apportioned
over what survived, not inherited from the uncurated mix.

zg03 — classifier-gate threshold sweep: ze04 generalized from a fixed
decile table into the PR-curve/tuning table an org reads before
deploying the ze02 gate — per candidate threshold (the 9 decile edges
of the averaged margin), the keep rate, precision, recall, and
accuracy the gate would achieve at that cut.

Reference parity note: the reference ETL
(/root/reference/src/spotify_tags_etl/) has no curation or training
stage; these compose operators added in rounds 2-10 along SURVEY.md's
"training-data pipeline" axis (same as the zc-zf bands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_tags_etl_spark.operators.ytrain import quota_ctes
from spotify_tags_etl_spark.operators.zcops import (
    ZC01_TOK_PPM,
    ZC01_WINDOW,
    curriculum_schedule,
)
from spotify_tags_etl_spark.operators.zeops import (
    _margins,
    _ze01_ctes,
    ZE01_ROUNDS,
    ze01_feats,
    ze01_fit_artifact,
)
from spotify_tags_etl_spark.operators.zfops import _zf01_flags_ctes, zf01_flags
from spotify_tags_etl_spark.plans.planmetrics import record_plan
from spotify_tags_etl_spark.plans.registry import register

# ---------------------------------------------------------------------------
# zg01 — curated-corpus packing manifest (zf01 survivors x zc01 FFD)
# ---------------------------------------------------------------------------

#: Per-doc first-drop-reason selectors over the zf01 flag columns —
#: mutually exclusive and exhaustive (they sum to 1 per doc), so the
#: per-band token attribution telescopes exactly to the band's corpus
#: mass. Shared between the Spark builder and the DuckDB oracle.
_ZG01_REASONS = (
    ("kept", "s_e * (1 - f_near) * (1 - f_sem) * (1 - f_con) * (1 - f_off)"),
    ("r_exact", "(1 - s_e)"),
    ("r_near", "s_e * f_near"),
    ("r_sem", "s_e * (1 - f_near) * f_sem"),
    ("r_con", "s_e * (1 - f_near) * (1 - f_sem) * f_con"),
    ("r_off", "s_e * (1 - f_near) * (1 - f_sem) * (1 - f_con) * f_off"),
)

_ZG01_TOK = (
    f"LEAST(GREATEST(CAST(n_chars AS BIGINT) * {ZC01_TOK_PPM}"
    f" {{div}} 1000000, 1), {ZC01_WINDOW})"
)


def _zg01_oracle_sql() -> str:
    reasons = ",\n             ".join(f"{expr} AS {name}" for name, expr in _ZG01_REASONS)
    return f"""
    WITH {_zf01_flags_ctes(", d.n_chars")},
    btoks AS (
      SELECT s_e, f_near, f_sem, f_con, f_off,
             {_ZG01_TOK.format(div="//")} AS tok
      FROM flags
    ),
    breason AS (
      SELECT tok,
             CASE WHEN tok <= 1 THEN 0 ELSE length(bin(tok - 1)) END AS band_exp,
             {reasons}
      FROM btoks
    ),
    bagg AS (
      SELECT band_exp,
             CAST(SUM(kept) AS BIGINT) AS n_kept,
             CAST(SUM(1 - kept) AS BIGINT) AS n_displaced,
             CAST(SUM(kept * tok) AS BIGINT) AS kept_tokens,
             CAST(SUM(r_exact * tok) AS BIGINT) AS disp_exact_tokens,
             CAST(SUM(r_near * tok) AS BIGINT) AS disp_near_tokens,
             CAST(SUM(r_sem * tok) AS BIGINT) AS disp_sem_tokens,
             CAST(SUM(r_con * tok) AS BIGINT) AS disp_contam_tokens,
             CAST(SUM(r_off * tok) AS BIGINT) AS disp_offtarget_tokens,
             {ZC01_WINDOW} // (CAST(1 AS BIGINT) << band_exp) AS k
      FROM breason GROUP BY band_exp
    )
    SELECT CAST(band_exp AS BIGINT) AS band_exp,
           n_kept, n_displaced, kept_tokens,
           CAST((n_kept + k - 1) // k AS BIGINT) AS n_windows,
           CAST(CAST(kept_tokens AS HUGEINT) * 1000000
                // NULLIF(((n_kept + k - 1) // k) * {ZC01_WINDOW}, 0) AS BIGINT)
             AS fill_ppm,
           disp_exact_tokens, disp_near_tokens, disp_sem_tokens,
           disp_contam_tokens, disp_offtarget_tokens,
           CAST(disp_exact_tokens + disp_near_tokens + disp_sem_tokens
                + disp_contam_tokens + disp_offtarget_tokens AS BIGINT)
             AS displaced_tokens
    FROM bagg ORDER BY band_exp
    """


@register(
    "zg01_curated_pack_manifest",
    oracle=_zg01_oracle_sql(),
    doc=(
        "CURATED-CORPUS PACKING MANIFEST — the end-to-end composition "
        "that closes the curation loop: zf01's five-stage survivor set "
        "(exact dedup -> near dedup -> semantic dedup -> eval "
        "decontamination -> DSIR target-likeness) packed with zc01's "
        f"banded FFD into {ZC01_WINDOW}-token windows, reported per "
        "power-of-two length band with the window count and fill the "
        "CURATED corpus achieves (exact rank arithmetic: windows = "
        "ceil(n_kept/k), k = W/2^band) AND the token mass each stage "
        "DISPLACED from the band under zf01's mutually-exclusive "
        "FIRST-failing-stage attribution. Mass conserves exactly: "
        "kept_tokens + displaced_tokens = the band's full corpus token "
        "mass (zc06's doc_tokens; pinned by test), and the per-stage "
        "split telescopes the same way — this is zd04's "
        "kept-vs-displaced accounting widened from one exclusion "
        "(contamination) to the full curation lineage. Shape: the five "
        "stage drop-lists come from zf01_flags (each stage's OWN "
        "builder, localCheckpointed — the zd01 rule: one (doc_id, "
        "source, n_chars) corpus projection scan joined against "
        "materialized duplicate/contamination-fraction-sized lists, "
        "AQE-broadcast), then ONE <= 13-row map-combined band rollup. "
        "No per-window state is materialized: window counts are pure "
        "rank arithmetic, so the manifest stays O(bands) however large "
        "the corpus — the 100 TB shape. All integer arithmetic "
        "(bin-length bands, ceil-div windows, HUGEINT/DECIMAL-widened "
        "ppm) — bit-identical across engines."
    ),
    tags=("curation", "packing", "report", "llm-pipeline"),
)
def zg01(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = zf01_flags(spark, sf_dir, extra_cols=("n_chars",))
    breason = flags.selectExpr(
        f"{_ZG01_TOK.format(div='DIV')} AS tok",
        "s_e", "f_near", "f_sem", "f_con", "f_off",
    ).selectExpr(
        "tok",
        "CASE WHEN tok <= 1 THEN 0 ELSE length(bin(tok - 1)) END AS band_exp",
        *[f"{expr} AS {name}" for name, expr in _ZG01_REASONS],
    )
    record_plan(breason, "zg01:band_reasons")
    agg = breason.groupBy("band_exp").agg(
        F.expr("CAST(SUM(kept) AS BIGINT)").alias("n_kept"),
        F.expr("CAST(SUM(1 - kept) AS BIGINT)").alias("n_displaced"),
        F.expr("CAST(SUM(kept * tok) AS BIGINT)").alias("kept_tokens"),
        F.expr("CAST(SUM(r_exact * tok) AS BIGINT)").alias("disp_exact_tokens"),
        F.expr("CAST(SUM(r_near * tok) AS BIGINT)").alias("disp_near_tokens"),
        F.expr("CAST(SUM(r_sem * tok) AS BIGINT)").alias("disp_sem_tokens"),
        F.expr("CAST(SUM(r_con * tok) AS BIGINT)").alias("disp_contam_tokens"),
        F.expr("CAST(SUM(r_off * tok) AS BIGINT)").alias("disp_offtarget_tokens"),
    )
    return (
        agg.select(
            F.col("band_exp").cast("bigint").alias("band_exp"),
            "n_kept",
            "n_displaced",
            "kept_tokens",
            F.expr(
                f"CAST((n_kept + ({ZC01_WINDOW} DIV shiftleft(CAST(1 AS BIGINT), band_exp)) - 1)"
                f" DIV ({ZC01_WINDOW} DIV shiftleft(CAST(1 AS BIGINT), band_exp)) AS BIGINT)"
            ).alias("n_windows"),
            "disp_exact_tokens",
            "disp_near_tokens",
            "disp_sem_tokens",
            "disp_contam_tokens",
            "disp_offtarget_tokens",
        )
        .select(
            "band_exp",
            "n_kept",
            "n_displaced",
            "kept_tokens",
            "n_windows",
            F.expr(
                f"CAST(CAST(kept_tokens AS DECIMAL(38,0)) * 1000000"
                f" DIV NULLIF(n_windows * {ZC01_WINDOW}, 0) AS BIGINT)"
            ).alias("fill_ppm"),
            "disp_exact_tokens",
            "disp_near_tokens",
            "disp_sem_tokens",
            "disp_contam_tokens",
            "disp_offtarget_tokens",
            F.expr(
                "CAST(disp_exact_tokens + disp_near_tokens + disp_sem_tokens"
                " + disp_contam_tokens + disp_offtarget_tokens AS BIGINT)"
            ).alias("displaced_tokens"),
        )
        .orderBy("band_exp")
    )


# ---------------------------------------------------------------------------
# zg02 — curated curriculum schedule (zf01 survivors x zc05)
# ---------------------------------------------------------------------------


def _zg02_oracle_sql() -> str:
    return f"""
    WITH {_zf01_flags_ctes(", d.n_chars")},
    kdocs AS MATERIALIZED (
      SELECT doc_id, source, n_chars FROM flags
      WHERE s_e = 1 AND f_near = 0 AND f_sem = 0 AND f_con = 0 AND f_off = 0
    ),
    {quota_ctes("kdocs")},
    rn AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars ASC, doc_id ASC) AS crank
      FROM kdocs
    )
    SELECT rn.doc_id AS doc_id, rn.source AS source,
           CAST(rn.crank AS BIGINT) AS crank,
           CAST((rn.crank - 1) // q.quota AS BIGINT) AS block,
           CAST((rn.crank - 1) % q.quota AS BIGINT) AS slot
    FROM rn JOIN quotas q ON q.source = rn.source AND q.quota > 0
    ORDER BY block, source, slot
    """


@register(
    "zg02_curated_curriculum",
    oracle=_zg02_oracle_sql(),
    doc=(
        "CURATED CURRICULUM SCHEDULE — zc05's dataloader manifest "
        "(largest-remainder mixing quotas x per-source easy-to-hard "
        "order) re-derived over the zf01 SURVIVOR corpus: curation "
        "drops shift each source's char mass, so the Hamilton quotas "
        "are RE-APPORTIONED over what survived rather than inherited "
        "from the uncurated mix — the schedule the trainer actually "
        "replays after curation ships. Output = (doc_id, source, "
        "crank, block, slot): block b takes each surviving source's "
        "next quota_s docs, difficulty (n_chars) ramping monotonically "
        "within each source lane; zero-quota sources are excluded "
        "(zc05's rule). Shape: the survivor set comes from zf01_flags "
        "(stage drop-lists via each stage's own builder, "
        "localCheckpointed, joined against one corpus projection "
        "scan); the filtered frame then flows through zc05's own "
        "curriculum_schedule machinery — scalerank.grouped_rank for "
        "the per-source rank (sources are few and skewed; a keyed "
        "window would funnel the survivor corpus into #source "
        "reducers), the ranked frame checkpointed once and reused by "
        "BOTH the quota rollup and the schedule join, quotas a "
        "broadcast O(#sources) join. Oracle: the flags chain + zc05's "
        "quota/rank SQL with the survivor set substituted for the "
        "corpus (ytrain.quota_ctes parameterized on the relation)."
    ),
    tags=("curation", "training", "planner", "ordering", "llm-pipeline"),
)
def zg02(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = zf01_flags(spark, sf_dir, extra_cols=("n_chars",))
    kept = flags.where(
        "s_e = 1 AND f_near = 0 AND f_sem = 0 AND f_con = 0 AND f_off = 0"
    ).select("doc_id", "source", "n_chars")
    return curriculum_schedule(kept, label="zg02")


# ---------------------------------------------------------------------------
# zg03 — classifier-gate threshold sweep (PR curve over the ze01 fit)
# ---------------------------------------------------------------------------

#: Candidate thresholds: the averaged-margin values at the 9 interior
#: decile edges (ze04's equal-mass cuts, reused as the tuning grid).
ZG03_CUTS = 9


def _zg03_oracle_sql(rounds: int = ZE01_ROUNDS) -> str:
    avg_union = " UNION ALL ".join(
        f"SELECT * FROM w{r}" for r in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(_ze01_ctes(rounds))
        + f""",
    wavg AS MATERIALIZED (
      SELECT bucket, SUM(w) AS w FROM ({avg_union}) GROUP BY bucket
    ),
    sm AS MATERIALIZED (
      SELECT f.doc_id, f.y, SUM(CAST(f.cnt AS HUGEINT) * w.w) AS m
      FROM feats f JOIN wavg w ON w.bucket = f.bucket
      GROUP BY f.doc_id, f.y
    ),
    rk AS MATERIALIZED (
      SELECT m,
             ROW_NUMBER() OVER (ORDER BY m, doc_id) AS r,
             (SELECT COUNT(*) FROM sm) AS n
      FROM sm
    ),
    cuts AS (
      SELECT ks.k, rk.m AS t
      FROM (SELECT UNNEST(generate_series(1, {ZG03_CUTS})) AS k) ks
      JOIN rk ON rk.r = GREATEST(ks.k * rk.n // 10, 1)
    )
    SELECT CAST(c.k AS BIGINT) AS k,
           CAST(c.t AS BIGINT) AS thr,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN s.m > c.t THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN s.m > c.t THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS kept_ppm,
           CAST(SUM(CASE WHEN s.m > c.t AND s.y = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tgt_kept,
           CAST(SUM(CASE WHEN s.m > c.t AND s.y = 1 THEN 1 ELSE 0 END) * 1000000
                // NULLIF(SUM(CASE WHEN s.m > c.t THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS prec_ppm,
           CAST(SUM(CASE WHEN s.m > c.t AND s.y = 1 THEN 1 ELSE 0 END) * 1000000
                // NULLIF(SUM(CASE WHEN s.y = 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS recall_ppm,
           CAST(SUM(CASE WHEN (s.m > c.t) = (s.y = 1) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN (s.m > c.t) = (s.y = 1) THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS acc_ppm
    FROM sm s CROSS JOIN cuts c
    GROUP BY c.k, c.t
    ORDER BY k
    """
    )


@register(
    "zg03_gate_threshold_sweep",
    oracle=_zg03_oracle_sql(),
    doc=(
        "CLASSIFIER-GATE THRESHOLD SWEEP — ze04's calibration table "
        "generalized into the PR-curve/tuning report an org reads "
        "before DEPLOYING the ze02 gate: for each candidate threshold "
        f"(the {ZG03_CUTS} interior decile edges of the averaged "
        "margin — ze04's equal-mass cuts reused as the grid), the doc "
        "mass the gate would keep (kept_ppm), its precision and recall "
        "on the target-language label, and its raw accuracy, all at "
        "the cut margin > t (the yv21 sweep pattern applied to the ze "
        "fit). Reading the table: precision rises and recall falls "
        "with k; the deployed t = 0 gate (ze02) sits wherever its "
        "margin sign lands — this is the evidence for moving it. "
        "Shape: reads the PUBLISHED ze01 fit artifact (live refit "
        "only when absent/stale), ONE scoring aggregate over the "
        "checkpointed design matrix, scalerank.global_rank for the "
        "edge margins (range layout + O(#partitions) offsets, no "
        "single-reducer sort), then the O(#docs) margin frame "
        f"broadcast-cross-joined against the {ZG03_CUTS}-row threshold "
        "frame and folded in ONE map-combined aggregate — a bounded "
        f"{ZG03_CUTS}x row amplification of a slim (y, m) frame, "
        "never a second corpus scan. Thresholds compare on the "
        "full-precision DECIMAL(38,0) margin (ze05's rule); thr is "
        "the BIGINT report spelling. Oracle = ze02's CTE chain + the "
        "same rank/edge/sweep arithmetic."
    ),
    tags=("curation", "quality", "eval", "report", "llm-pipeline"),
)
def zg03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tags_etl_spark.operators.scalerank import global_rank

    _nd, _curve, w_hist = ze01_fit_artifact(spark, sf_dir)
    wavg = {b: sum(w[b] for w in w_hist) for b in w_hist[0]}
    feats = ze01_feats(spark, sf_dir)
    margins = _margins(feats, wavg).localCheckpoint(eager=True)  # O(#docs)
    feats.unpersist()
    ranked, n = global_rank(
        margins, [F.col("m").asc(), F.col("doc_id").asc()], rank_col="r"
    )
    edge_rows = [(k, max(1, (k * n) // 10)) for k in range(1, ZG03_CUTS + 1)]
    cuts = (
        ranked.join(
            F.broadcast(
                margins.sparkSession.createDataFrame(edge_rows, "k bigint, r bigint")
            ),
            "r",
        )
        .select("k", F.col("m").alias("t"))
        .localCheckpoint(eager=True)  # ZG03_CUTS rows
    )
    sweep = margins.crossJoin(F.broadcast(cuts))
    report = (
        sweep.groupBy("k", "t")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("m") > F.col("t"), 1).otherwise(0)).alias("n_kept"),
            F.sum(
                F.when((F.col("m") > F.col("t")) & (F.col("y") == 1), 1).otherwise(0)
            ).alias("n_tgt_kept"),
            F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("n_tgt"),
            F.sum(
                F.when((F.col("m") > F.col("t")) == (F.col("y") == 1), 1).otherwise(0)
            ).alias("n_correct"),
        )
        .select(
            F.col("k").cast("bigint").alias("k"),
            F.col("t").cast("bigint").alias("thr"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_kept").cast("bigint").alias("n_kept"),
            F.expr("n_kept * 1000000 DIV n_docs").alias("kept_ppm"),
            F.col("n_tgt_kept").cast("bigint").alias("n_tgt_kept"),
            F.expr("n_tgt_kept * 1000000 DIV NULLIF(n_kept, 0)").alias("prec_ppm"),
            F.expr("n_tgt_kept * 1000000 DIV NULLIF(n_tgt, 0)").alias("recall_ppm"),
            F.col("n_correct").cast("bigint").alias("n_correct"),
            F.expr("n_correct * 1000000 DIV n_docs").alias("acc_ppm"),
        )
        .orderBy("k")
    )
    record_plan(report, "zg03:threshold_sweep")
    return report
