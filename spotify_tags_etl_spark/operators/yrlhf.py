"""Preference-data / eval operators for an RLHF-era pipeline (round 6).

The reference ETL (averille-demo/spotify-tags-etl) ends at curated rows;
a modern training-data platform also has to PREPARE PREFERENCE DATA and
SCORE MODEL OUTPUTS. This module adds that axis, each op as exact-integer
relational algebra with a DuckDB oracle (labels/ratings are md5-derived
from stable ids — the ye01/yv04 synthesis pattern, so every SF is
deterministic and the oracle is closed-form):

* ``yv05_preference_pairs`` — DPO-style (chosen, rejected) pair
  construction per prompt group with total-order tiebreaks;
* ``yv06_annotator_kappa`` — Cohen's kappa inter-annotator agreement,
  exact ppm via 128-bit cross-multiplication;
* ``yv07_winrate_matrix`` — pairwise head-to-head win-rate matrix
  (the arena-style table a model-selection loop reads);
* ``yv08_pass_at_k`` — the unbiased pass@k estimator
  (1 - C(n-c,k)/C(n,k)) as exact integer ppm, histogrammed;
* ``yv09_grpo_advantage`` — group-relative advantage summary
  (GRPO-style r_i - mean(group), kept integer as n*r_i - sum_r);
* ``yv11_best_of_n_value`` — expected best-of-n policy value via the
  exact order-statistics identity sum r_(i)*C(i-1,k-1)/C(n,k);
* ``yv12_calibration_bins`` — reliability diagram (accuracy vs stated
  confidence per decile) in exact 128-bit ppm;
* ``yv13_preference_cycles`` — intransitivity audit over the arena
  matrix (cyclic triads), the gate before fitting Elo/BT rankings;
* ``yv14_label_majority`` — weighted annotator majority-vote
  aggregation with exact dominance margins (the step upstream of
  yv06's kappa QA).

Scale notes are per-op; none of these introduces a data-sized
single-reducer stage (the only global ORDER BY sites are final
O(#groups) result orderings, which the driver consumes sorted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.tpch import load_table

#: Docs per prompt group in yv05 (doc_id DIV 5).
YV05_GROUP = 5

#: Rating modulus shared by yv05/yv07/yv09.
_RMOD = 1000

#: (rating DESC, doc_id ASC) one-int64 encoding: key = r*1e12 - doc_id.
#: Exact while doc_id < 1e12 (|key| <= 1e15) — documented bound; at
#: larger id widths widen to DECIMAL(38,0) on both sides.
_KEY_SCALE = 10**12

#: Number of synthetic models in yv07's arena.
YV07_MODELS = 6

#: Samples per problem-group (event_id DIV 20) and k for yv08.
YV08_GROUP, YV08_K = 20, 5

#: Samples per prompt group for yv09 (event_id DIV 16).
YV09_GROUP = 16


def _h(tag: str, col: str) -> str:
    """Spark SQL: first-32-bits-of-md5 integer from a tagged id."""
    return (
        f"CAST(conv(substring(md5(concat('{tag}:', CAST({col} AS STRING))), 1, 8),"
        f" 16, 10) AS BIGINT)"
    )


def _hd(tag: str, col: str) -> str:
    """DuckDB twin of :func:`_h` (same bytes, same integer)."""
    return f"('0x' || substr(md5('{tag}:' || CAST({col} AS VARCHAR)), 1, 8))::BIGINT"


# ---------------------------------------------------------------------------
# yv05 — DPO-style preference-pair construction
# ---------------------------------------------------------------------------


@register(
    "yv05_preference_pairs",
    oracle=f"""
    WITH rated AS (
      SELECT doc_id // {YV05_GROUP} AS pid, doc_id,
             {_hd('r', 'doc_id')} % {_RMOD} AS rating
      FROM documents
    ),
    keyed AS (
      SELECT pid, doc_id, rating,
             rating * {_KEY_SCALE} - doc_id AS key
      FROM rated
    ),
    g AS (
      SELECT pid,
             COUNT(*) AS n_cands,
             MAX_BY(doc_id, key) AS chosen_doc,
             MAX_BY(rating, key) AS chosen_rating,
             MIN_BY(doc_id, key) AS rejected_doc,
             MIN_BY(rating, key) AS rejected_rating
      FROM keyed GROUP BY pid
    )
    SELECT CAST(pid AS BIGINT) AS pid,
           CAST(n_cands AS BIGINT) AS n_cands,
           CAST(chosen_doc AS BIGINT) AS chosen_doc,
           CAST(rejected_doc AS BIGINT) AS rejected_doc,
           CAST(chosen_rating AS BIGINT) AS chosen_rating,
           CAST(rejected_rating AS BIGINT) AS rejected_rating,
           CAST(chosen_rating - rejected_rating AS BIGINT) AS margin
    FROM g
    WHERE n_cands >= 2 AND chosen_rating > rejected_rating
    ORDER BY pid
    """,
    doc=(
        "DPO-style preference-pair construction: responses (documents) "
        f"are grouped into prompts of {YV05_GROUP}; per prompt the "
        "highest- and lowest-rated responses become (chosen, rejected), "
        "tie-broken by doc_id through a single injective int64 key "
        "(rating * 1e12 - doc_id encodes rating DESC, id ASC — no "
        "sort, no window: two max_by/min_by aggregates). Groups with "
        "<2 candidates or a zero margin are dropped, matching DPO "
        "practice of discarding ties. Shape: ONE map-combined "
        "groupBy(pid) — a 100 TB response log becomes pairs in a "
        "single hash exchange. Ratings are md5-derived (ye01/yv04 "
        "synthesis pattern) so the oracle is closed-form."
    ),
    tags=("rlhf", "training", "llm-pipeline"),
)
def yv05(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        F.expr(f"doc_id DIV {YV05_GROUP}").alias("pid"),
        "doc_id",
        (F.expr(_h("r", "doc_id")) % _RMOD).alias("rating"),
    ).withColumn("key", F.col("rating") * _KEY_SCALE - F.col("doc_id"))
    g = keyed.groupBy("pid").agg(
        F.count(F.lit(1)).alias("n_cands"),
        F.expr("max_by(doc_id, key)").alias("chosen_doc"),
        F.expr("max_by(rating, key)").alias("chosen_rating"),
        F.expr("min_by(doc_id, key)").alias("rejected_doc"),
        F.expr("min_by(rating, key)").alias("rejected_rating"),
    )
    return (
        g.where((F.col("n_cands") >= 2) & (F.col("chosen_rating") > F.col("rejected_rating")))
        .select(
            F.col("pid").cast("bigint").alias("pid"),
            F.col("n_cands").cast("bigint").alias("n_cands"),
            F.col("chosen_doc").cast("bigint").alias("chosen_doc"),
            F.col("rejected_doc").cast("bigint").alias("rejected_doc"),
            F.col("chosen_rating").cast("bigint").alias("chosen_rating"),
            F.col("rejected_rating").cast("bigint").alias("rejected_rating"),
            (F.col("chosen_rating") - F.col("rejected_rating")).cast("bigint").alias("margin"),
        )
        .orderBy("pid")
    )


# ---------------------------------------------------------------------------
# yv06 — Cohen's kappa inter-annotator agreement (exact ppm)
# ---------------------------------------------------------------------------


@register(
    "yv06_annotator_kappa",
    oracle=f"""
    WITH lab AS (
      SELECT {_hd('a', 'event_id')} % 3 AS la,
             {_hd('b', 'event_id')} % 3 AS lb
      FROM events
    ),
    cells AS (SELECT la, lb, COUNT(*) AS c FROM lab GROUP BY la, lb),
    rowm AS (SELECT la AS lbl, SUM(c) AS rm FROM cells GROUP BY la),
    colm AS (SELECT lb AS lbl, SUM(c) AS cm FROM cells GROUP BY lb),
    pe AS (
      SELECT SUM(CAST(COALESCE(rm, 0) AS HUGEINT) * COALESCE(cm, 0)) AS pe_num
      FROM rowm FULL JOIN colm USING (lbl)
    ),
    tot AS (
      SELECT SUM(c) AS n, SUM(c) FILTER (WHERE la = lb) AS agree FROM cells
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(agree AS BIGINT) AS agree,
           CAST(CAST(agree AS HUGEINT) * 1000000 // n AS BIGINT) AS po_ppm,
           CAST(pe_num * 1000000 // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_ppm,
           CAST((CAST(n AS HUGEINT) * agree - pe_num) * 1000000
                // (CAST(n AS HUGEINT) * n - pe_num) AS BIGINT) AS kappa_ppm
    FROM tot, pe
    """,
    doc=(
        "Cohen's kappa between two annotators (md5-derived 3-class "
        "labels per event — the annotation-QA gate a labeling pipeline "
        "runs before trusting a batch): observed agreement po, chance "
        "agreement pe from the confusion-matrix marginals, and "
        "kappa = (po-pe)/(1-pe), ALL as exact truncated ppm — the "
        "kappa numerator/denominator are cross-multiplied in 128-bit "
        "(n*agree and n*n pass 2^63 at n ~ 3e9 rows, real at 100 TB; "
        "Spark DECIMAL(38,0) / DuckDB HUGEINT, both truncate DIV "
        "toward zero so negative kappa agrees bit-for-bit). Shape: "
        "one map-combined groupBy onto a <=9-row confusion frame; "
        "every later step is O(#classes). Composes with yl02 (class "
        "balance) and tz02 (split assignment)."
    ),
    tags=("rlhf", "eval", "llm-pipeline"),
)
def yv06(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id")
    lab = ev.select(
        (F.expr(_h("a", "event_id")) % 3).alias("la"),
        (F.expr(_h("b", "event_id")) % 3).alias("lb"),
    )
    cells = lab.groupBy("la", "lb").agg(F.count(F.lit(1)).alias("c"))
    # O(#classes^2) = 9 rows; without this checkpoint the marginals and
    # the totals each re-derive the cell census - and its corpus scan -
    # three times over (r7 scan audit).
    from spotify_tags_etl_spark.plans.planmetrics import record_plan

    record_plan(cells, "yv06:cell_census")
    cells = cells.localCheckpoint(eager=True)
    rowm = cells.groupBy(F.col("la").alias("lbl")).agg(F.sum("c").alias("rm"))
    colm = cells.groupBy(F.col("lb").alias("lbl")).agg(F.sum("c").alias("cm"))
    pe = (
        rowm.join(colm, "lbl", "full")
        .agg(
            F.sum(
                F.coalesce(F.col("rm"), F.lit(0)).cast("decimal(38,0)")
                * F.coalesce(F.col("cm"), F.lit(0))
            ).alias("pe_num")
        )
    )
    tot = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("la") == F.col("lb"), F.col("c")).otherwise(0)).alias("agree"),
    )
    return tot.crossJoin(F.broadcast(pe)).selectExpr(
        "CAST(n AS BIGINT) AS n",
        "CAST(agree AS BIGINT) AS agree",
        "CAST(CAST(agree AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT) AS po_ppm",
        "CAST(pe_num * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT) AS pe_ppm",
        "CAST((CAST(n AS DECIMAL(38,0)) * agree - pe_num) * 1000000"
        " DIV (CAST(n AS DECIMAL(38,0)) * n - pe_num) AS BIGINT) AS kappa_ppm",
    )


# ---------------------------------------------------------------------------
# yv07 — pairwise win-rate matrix (arena table)
# ---------------------------------------------------------------------------


@register(
    "yv07_winrate_matrix",
    oracle=f"""
    WITH battles AS (
      SELECT {_hd('m', 'event_id')} % {YV07_MODELS} AS ma,
             {_hd('n', 'event_id')} % {YV07_MODELS} AS mb,
             {_hd('wa', 'event_id')} % {_RMOD} AS sa,
             {_hd('wb', 'event_id')} % {_RMOD} AS sb
      FROM events
    ),
    oriented AS (
      SELECT LEAST(ma, mb) AS m_lo, GREATEST(ma, mb) AS m_hi,
             CASE WHEN ma < mb THEN sa ELSE sb END AS s_lo,
             CASE WHEN ma < mb THEN sb ELSE sa END AS s_hi
      FROM battles WHERE ma <> mb
    )
    SELECT CAST(m_lo AS BIGINT) AS m_lo,
           CAST(m_hi AS BIGINT) AS m_hi,
           CAST(COUNT(*) AS BIGINT) AS n_battles,
           CAST(SUM(CASE WHEN s_lo > s_hi THEN 1 ELSE 0 END) AS BIGINT) AS wins_lo,
           CAST(SUM(CASE WHEN s_hi > s_lo THEN 1 ELSE 0 END) AS BIGINT) AS wins_hi,
           CAST(SUM(CASE WHEN s_lo = s_hi THEN 1 ELSE 0 END) AS BIGINT) AS draws,
           CAST(CAST(2 * SUM(CASE WHEN s_lo > s_hi THEN 1 ELSE 0 END)
                     + SUM(CASE WHEN s_lo = s_hi THEN 1 ELSE 0 END) AS HUGEINT)
                * 1000000 // (2 * COUNT(*)) AS BIGINT) AS winrate_lo_ppm
    FROM oriented GROUP BY m_lo, m_hi ORDER BY m_lo, m_hi
    """,
    doc=(
        f"Arena-style head-to-head table over {YV07_MODELS} synthetic "
        "models: every event is a battle (contestants and scores "
        "md5-derived), canonically oriented to the unordered pair "
        "(LEAST, GREATEST) so each matchup aggregates once; emits "
        "wins/draws and the draw-adjusted win rate "
        "(2*wins + draws) / (2*n) in exact truncated ppm, "
        "128-bit-multiplied (wraps int64 past ~9e12 battles per cell). "
        "This is the model-selection summary an RLHF loop reads to "
        "pick a policy checkpoint. Shape: pure map-side label "
        "derivation + ONE map-combined groupBy onto an O(models^2) "
        "frame; the final ORDER BY is over 15 rows."
    ),
    tags=("rlhf", "eval", "llm-pipeline"),
)
def yv07(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id")
    battles = ev.select(
        (F.expr(_h("m", "event_id")) % YV07_MODELS).alias("ma"),
        (F.expr(_h("n", "event_id")) % YV07_MODELS).alias("mb"),
        (F.expr(_h("wa", "event_id")) % _RMOD).alias("sa"),
        (F.expr(_h("wb", "event_id")) % _RMOD).alias("sb"),
    ).where(F.col("ma") != F.col("mb"))
    oriented = battles.select(
        F.least("ma", "mb").alias("m_lo"),
        F.greatest("ma", "mb").alias("m_hi"),
        F.when(F.col("ma") < F.col("mb"), F.col("sa")).otherwise(F.col("sb")).alias("s_lo"),
        F.when(F.col("ma") < F.col("mb"), F.col("sb")).otherwise(F.col("sa")).alias("s_hi"),
    )
    wins_lo = F.sum(F.when(F.col("s_lo") > F.col("s_hi"), 1).otherwise(0))
    wins_hi = F.sum(F.when(F.col("s_hi") > F.col("s_lo"), 1).otherwise(0))
    draws = F.sum(F.when(F.col("s_lo") == F.col("s_hi"), 1).otherwise(0))
    return (
        oriented.groupBy(
            F.col("m_lo").cast("bigint").alias("m_lo"),
            F.col("m_hi").cast("bigint").alias("m_hi"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_battles"),
            wins_lo.cast("bigint").alias("wins_lo"),
            wins_hi.cast("bigint").alias("wins_hi"),
            draws.cast("bigint").alias("draws"),
        )
        .withColumn(
            "winrate_lo_ppm",
            F.expr(
                "CAST(CAST(2 * wins_lo + draws AS DECIMAL(38,0)) * 1000000"
                " DIV (2 * n_battles) AS BIGINT)"
            ),
        )
        .orderBy("m_lo", "m_hi")
    )


# ---------------------------------------------------------------------------
# yv08 — unbiased pass@k estimator (exact integer ppm)
# ---------------------------------------------------------------------------

# C(n-c,k)/C(n,k) as the k-term falling-factorial ratio, k=5 unrolled so
# both engines evaluate the SAME exact integer product (128-bit: nf^5
# passes 2^63 once a problem holds ~6600 samples — real for big evals).
_FF5_SPARK = (
    "CAST(nf AS DECIMAL(38,0)) * (nf-1) * (nf-2) * (nf-3) * (nf-4)"
)
_FF5_DEN_SPARK = "CAST(n AS DECIMAL(38,0)) * (n-1) * (n-2) * (n-3) * (n-4)"
_FF5_DUCK = "CAST(nf AS HUGEINT) * (nf-1) * (nf-2) * (nf-3) * (nf-4)"
_FF5_DEN_DUCK = "CAST(n AS HUGEINT) * (n-1) * (n-2) * (n-3) * (n-4)"


@register(
    "yv08_pass_at_k",
    oracle=f"""
    WITH s AS (
      SELECT event_id // {YV08_GROUP} AS problem,
             CASE WHEN {_hd('p', 'event_id')} % 5 = 0 THEN 1 ELSE 0 END AS pass
      FROM events
    ),
    g AS (
      SELECT problem, COUNT(*) AS n, SUM(pass) AS c, COUNT(*) - SUM(pass) AS nf
      FROM s GROUP BY problem HAVING COUNT(*) >= {YV08_K}
    ),
    p AS (
      SELECT problem, n, c,
             1000000 - CAST(CASE WHEN nf >= {YV08_K}
                  THEN ({_FF5_DUCK}) * 1000000 // ({_FF5_DEN_DUCK})
                  ELSE 0 END AS BIGINT) AS pass5_ppm
      FROM g
    )
    SELECT CAST(pass5_ppm // 100000 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_problems,
           CAST(SUM(n) AS BIGINT) AS n_samples,
           CAST(SUM(c) AS BIGINT) AS n_passing,
           CAST(SUM(pass5_ppm) // COUNT(*) AS BIGINT) AS mean_pass5_ppm
    FROM p GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "The unbiased pass@k estimator (Chen et al. 2021, HumanEval): "
        f"per problem ({YV08_GROUP} samples via event_id DIV), "
        "pass@5 = 1 - C(n-c,5)/C(n,5), computed as the EXACT k-term "
        "falling-factorial ratio in truncated ppm — no floats, no "
        "binomial tables: the 5-term products run 128-bit on both "
        "sides (nf^5 wraps int64 past ~6.6e3 samples/problem). "
        "Problems with n<k are excluded (the estimator is undefined), "
        "results histogrammed by pass@5 decile so the output is an "
        "O(11)-row eval summary. Shape: one groupBy(problem) with "
        "map-side combine, then O(#problems) arithmetic and a second "
        "tiny groupBy — two exchanges total at any scale."
    ),
    tags=("rlhf", "eval", "llm-pipeline"),
)
def yv08(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id")
    s = ev.select(
        F.expr(f"event_id DIV {YV08_GROUP}").alias("problem"),
        F.when(F.expr(_h("p", "event_id")) % 5 == 0, 1).otherwise(0).alias("pass"),
    )
    g = (
        s.groupBy("problem")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("pass").alias("c"),
            (F.count(F.lit(1)) - F.sum("pass")).alias("nf"),
        )
        .where(F.col("n") >= YV08_K)
    )
    p = g.select(
        "problem",
        "n",
        "c",
        (
            F.lit(1000000)
            - F.expr(
                f"CAST(CASE WHEN nf >= {YV08_K}"
                f" THEN ({_FF5_SPARK}) * 1000000 DIV ({_FF5_DEN_SPARK})"
                f" ELSE 0 END AS BIGINT)"
            )
        ).alias("pass5_ppm"),
    )
    return (
        p.groupBy(F.expr("pass5_ppm DIV 100000").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_problems"),
            F.sum("n").cast("bigint").alias("n_samples"),
            F.sum("c").cast("bigint").alias("n_passing"),
            F.expr("CAST(SUM(pass5_ppm) DIV COUNT(*) AS BIGINT)").alias("mean_pass5_ppm"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# yv09 — group-relative (GRPO-style) advantage summary
# ---------------------------------------------------------------------------


@register(
    "yv09_grpo_advantage",
    oracle=f"""
    WITH s AS (
      SELECT event_id // {YV09_GROUP} AS gid, event_id,
             {_hd('g', 'event_id')} % {_RMOD} AS reward
      FROM events
    ),
    w AS (
      SELECT gid, event_id, reward,
             COUNT(*) OVER (PARTITION BY gid) AS n,
             SUM(reward) OVER (PARTITION BY gid) AS sum_r
      FROM s
    )
    SELECT CAST(gid AS BIGINT) AS gid,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(sum_r) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN n * reward - sum_r > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           CAST(MAX(n * reward - sum_r) AS BIGINT) AS max_adv,
           CAST(MIN(n * reward - sum_r) AS BIGINT) AS min_adv,
           CAST(MAX_BY(event_id, reward * {_KEY_SCALE} - event_id) AS BIGINT)
             AS best_event
    FROM w GROUP BY gid ORDER BY gid
    """,
    doc=(
        "GRPO-style group-relative advantage: rewards (md5-derived) "
        f"are compared to their prompt group's mean ({YV09_GROUP} "
        "samples per group); to stay integer-exact the advantage is "
        "kept as the cross-multiplied numerator n*r_i - sum(r) "
        "(sign-identical to r_i - mean, no float division anywhere). "
        "Emits per group: sample count, reward mass, how many samples "
        "sit above the group mean, the advantage extremes, and the "
        "argmax sample (injective rating*1e12 - id tiebreak). Shape: "
        "ONE hash exchange on gid feeds both the partitioned window "
        "and the groupBy (same key, partitioning reused — verified in "
        "the pinned plan); group frames are O(16) rows, so no "
        "data-sized sort or reducer exists at any scale. n*reward "
        "stays int64-safe while group size * reward < 9e18 (group "
        "size is a constant here; widen for unbounded groups)."
    ),
    tags=("rlhf", "training", "llm-pipeline"),
)
def yv09(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id")
    s = ev.select(
        F.expr(f"event_id DIV {YV09_GROUP}").alias("gid"),
        "event_id",
        (F.expr(_h("g", "event_id")) % _RMOD).alias("reward"),
    )
    w = Window.partitionBy("gid")
    adv = (F.col("n") * F.col("reward") - F.col("sum_r"))
    enriched = s.select(
        "gid",
        "event_id",
        "reward",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("reward").over(w).alias("sum_r"),
    )
    return (
        enriched.groupBy("gid")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.max("sum_r").cast("bigint").alias("sum_r"),
            F.sum(F.when(adv > 0, 1).otherwise(0)).cast("bigint").alias("n_pos"),
            F.max(adv).cast("bigint").alias("max_adv"),
            F.min(adv).cast("bigint").alias("min_adv"),
            F.expr(f"max_by(event_id, reward * {_KEY_SCALE} - event_id)")
            .cast("bigint")
            .alias("best_event"),
        )
        .select(
            F.col("gid").cast("bigint").alias("gid"),
            "n",
            "sum_r",
            "n_pos",
            "max_adv",
            "min_adv",
            "best_event",
        )
        .orderBy("gid")
    )


# ---------------------------------------------------------------------------
# yv11 — expected best-of-n policy value (exact order statistics)
# ---------------------------------------------------------------------------

#: Samples per prompt group (event_id DIV 16) and the "n" of best-of-n.
YV11_GROUP, YV11_K = 16, 4

# E[max of a uniform random k-subset] = sum_i r_(i) * C(i-1,k-1) / C(n,k)
# over ascending ranks i. For k=4: C(i-1,3) = (i-1)(i-2)(i-3)/6 and
# C(n,4) = n(n-1)(n-2)(n-3)/24 — products of consecutive integers, so the
# divisions are exact in integers on both engines (DIV / `//` truncate the
# same way, and the operands are non-negative). int64-safe while
# C(n,4)*maxr*1e6 < 2^63, i.e. group size <~700 — group size is the
# compile-time constant 16 here; widen to 128-bit for unbounded groups.
_W3_SPARK = "(CASE WHEN i >= 4 THEN (i-1)*(i-2)*(i-3) DIV 6 ELSE 0 END)"
_W3_DUCK = "(CASE WHEN i >= 4 THEN (i-1)*(i-2)*(i-3) // 6 ELSE 0 END)"
_C4_SPARK = "(n*(n-1)*(n-2)*(n-3) DIV 24)"
_C4_DUCK = "(n*(n-1)*(n-2)*(n-3) // 24)"


@register(
    "yv11_best_of_n_value",
    oracle=f"""
    WITH s AS (
      SELECT event_id // {YV11_GROUP} AS gid, event_id,
             {_hd('v', 'event_id')} % {_RMOD} AS reward
      FROM events
    ),
    r AS (
      SELECT gid, reward,
             ROW_NUMBER() OVER (PARTITION BY gid ORDER BY reward, event_id) AS i
      FROM s
    ),
    g AS (
      SELECT gid, COUNT(*) AS n, SUM(reward) AS sum_r, MAX(reward) AS max_r,
             SUM(reward * {_W3_DUCK}) AS num
      FROM r GROUP BY gid HAVING COUNT(*) >= {YV11_K}
    )
    SELECT CAST(gid AS BIGINT) AS gid,
           CAST(n AS BIGINT) AS n,
           CAST(max_r AS BIGINT) AS max_r,
           CAST(num * 1000000 // {_C4_DUCK} AS BIGINT) AS e_bo4_micro,
           CAST(sum_r * 1000000 // n AS BIGINT) AS mean_micro,
           CAST(num * 1000000 // {_C4_DUCK}
                - sum_r * 1000000 // n AS BIGINT) AS uplift_micro
    FROM g ORDER BY gid
    """,
    doc=(
        "Expected best-of-n policy value (the quantity a best-of-n / "
        "rejection-sampling deployment actually realizes): per prompt "
        f"group ({YV11_GROUP} samples), E[max of a random "
        f"{YV11_K}-subset] via the exact order-statistics identity "
        "sum r_(i)*C(i-1,k-1)/C(n,k) — the same falling-factorial "
        "discipline as yv08, fully integer (micro-reward units, "
        "truncated), plus the group mean and the best-of-n uplift "
        "over it. Ranks come from a window PARTITIONED BY gid "
        "(O(16)-row frames) and the follow-up groupBy reuses the SAME "
        "hash exchange — one wire pass at any scale, no global sort. "
        "Rewards are md5-derived so the oracle is closed-form."
    ),
    tags=("rlhf", "eval", "llm-pipeline"),
)
def yv11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").select("event_id")
    s = ev.select(
        F.expr(f"event_id DIV {YV11_GROUP}").alias("gid"),
        "event_id",
        (F.expr(_h("v", "event_id")) % _RMOD).alias("reward"),
    )
    r = s.withColumn(
        "i", F.row_number().over(W.partitionBy("gid").orderBy("reward", "event_id"))
    )
    g = (
        r.groupBy("gid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("reward").alias("sum_r"),
            F.max("reward").alias("max_r"),
            F.sum(F.expr(f"reward * {_W3_SPARK}")).alias("num"),
        )
        .where(F.col("n") >= YV11_K)
    )
    return g.selectExpr(
        "CAST(gid AS BIGINT) AS gid",
        "CAST(n AS BIGINT) AS n",
        "CAST(max_r AS BIGINT) AS max_r",
        f"CAST(num * 1000000 DIV {_C4_SPARK} AS BIGINT) AS e_bo4_micro",
        "CAST(sum_r * 1000000 DIV n AS BIGINT) AS mean_micro",
        f"CAST(num * 1000000 DIV {_C4_SPARK}"
        " - sum_r * 1000000 DIV n AS BIGINT) AS uplift_micro",
    ).orderBy("gid")


# ---------------------------------------------------------------------------
# yv12 — confidence calibration bins (reliability diagram, exact ppm)
# ---------------------------------------------------------------------------


@register(
    "yv12_calibration_bins",
    oracle=f"""
    WITH s AS (
      SELECT {_hd('c', 'event_id')} % 1001 AS conf,
             CASE WHEN {_hd('y', 'event_id')} % 1000000
                  < ({_hd('c', 'event_id')} % 1001)
                    * ({_hd('c', 'event_id')} % 1001)
                  THEN 1 ELSE 0 END AS correct
      FROM events
    )
    SELECT CAST(conf // 100 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(correct) AS BIGINT) AS n_correct,
           CAST(CAST(SUM(correct) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
             AS acc_ppm,
           CAST(CAST(SUM(conf) AS HUGEINT) * 1000 // COUNT(*) AS BIGINT)
             AS conf_ppm,
           CAST(CAST(SUM(conf) AS HUGEINT) * 1000 // COUNT(*)
                - CAST(SUM(correct) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
             AS gap_ppm
    FROM s GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "Reliability diagram for a scored classifier/judge: md5-derived "
        "permille confidences with a deliberately OVERCONFIDENT "
        "synthetic truth (P(correct) = conf² — quadratic, so every bin "
        "shows a positive calibration gap and the op provably measures "
        "something); per confidence decile emits count, accuracy, mean "
        "stated confidence, and the gap, all exact truncated ppm with "
        "128-bit numerators (n_correct*1e6 and sum_conf*1e3 pass 2^63 "
        "near 1e13 events — real at 100 TB). This is the judge-QA "
        "table an RLHF pipeline reads before trusting a reward model. "
        "Shape: pure map-side label derivation + ONE map-combined "
        "groupBy onto an O(11)-row frame; ORDER BY is over 11 rows."
    ),
    tags=("rlhf", "eval", "llm-pipeline"),
)
def yv12(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id")
    s = ev.select(
        (F.expr(_h("c", "event_id")) % 1001).alias("conf"),
        F.when(
            (F.expr(_h("y", "event_id")) % 1000000)
            < (F.expr(_h("c", "event_id")) % 1001) * (F.expr(_h("c", "event_id")) % 1001),
            1,
        )
        .otherwise(0)
        .alias("correct"),
    )
    return (
        s.groupBy(F.expr("conf DIV 100").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("correct").alias("nc"),
            F.sum("conf").alias("sc"),
        )
        .selectExpr(
            "bucket",
            "CAST(cnt AS BIGINT) AS n",
            "CAST(nc AS BIGINT) AS n_correct",
            "CAST(CAST(nc AS DECIMAL(38,0)) * 1000000 DIV cnt AS BIGINT) AS acc_ppm",
            "CAST(CAST(sc AS DECIMAL(38,0)) * 1000 DIV cnt AS BIGINT) AS conf_ppm",
            "CAST(CAST(sc AS DECIMAL(38,0)) * 1000 DIV cnt"
            " - CAST(nc AS DECIMAL(38,0)) * 1000000 DIV cnt AS BIGINT) AS gap_ppm",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# yv13 — preference-cycle (intransitivity) audit over the arena matrix
# ---------------------------------------------------------------------------


@register(
    "yv13_preference_cycles",
    oracle=f"""
    WITH battles AS (
      SELECT {_hd('m', 'event_id')} % {YV07_MODELS} AS ma,
             {_hd('n', 'event_id')} % {YV07_MODELS} AS mb,
             {_hd('wa', 'event_id')} % {_RMOD} AS sa,
             {_hd('wb', 'event_id')} % {_RMOD} AS sb
      FROM events
    ),
    oriented AS (
      SELECT LEAST(ma, mb) AS m_lo, GREATEST(ma, mb) AS m_hi,
             CASE WHEN ma < mb THEN sa ELSE sb END AS s_lo,
             CASE WHEN ma < mb THEN sb ELSE sa END AS s_hi
      FROM battles WHERE ma <> mb
    ),
    edges AS (
      SELECT m_lo, m_hi,
             CASE WHEN SUM(CASE WHEN s_lo > s_hi THEN 1 ELSE 0 END)
                       >= SUM(CASE WHEN s_hi > s_lo THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS lo_wins
      FROM oriented GROUP BY m_lo, m_hi
    ),
    triads AS (
      SELECT ab.lo_wins AS ab_w, bc.lo_wins AS bc_w, ac.lo_wins AS ac_w
      FROM edges ab
      JOIN edges bc ON bc.m_lo = ab.m_hi
      JOIN edges ac ON ac.m_lo = ab.m_lo AND ac.m_hi = bc.m_hi
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triads,
           CAST(SUM(CASE WHEN (ab_w = 1 AND bc_w = 1 AND ac_w = 0)
                           OR (ab_w = 0 AND bc_w = 0 AND ac_w = 1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_cyclic,
           CAST(CAST(SUM(CASE WHEN (ab_w = 1 AND bc_w = 1 AND ac_w = 0)
                                OR (ab_w = 0 AND bc_w = 0 AND ac_w = 1)
                         THEN 1 ELSE 0 END) AS HUGEINT)
                * 1000000 // COUNT(*) AS BIGINT) AS cyclic_ppm
    FROM triads
    """,
    doc=(
        "Intransitivity audit over yv07's arena: per unordered pair the "
        "majority winner (ties toward the lower id — deterministic "
        "total tournament), then every model triad a<b<c is checked "
        "for a preference cycle (a>b>c>a or its reverse: "
        "lo_wins patterns 110 / 001 on edges ab/bc/ac). A high cyclic "
        "rate means pairwise win rates cannot be summarized by any "
        "single ranking — the sanity gate before fitting Elo/BT "
        "scores. Shape: the corpus-sized work is yv07's ONE "
        "map-combined groupBy; the triple join runs on the O(models²) "
        "edge frame (broadcast, 20 triads for 6 models) and emits one "
        "row. 128-bit ppm keeps the division exact at any triad count."
    ),
    tags=("rlhf", "eval", "llm-pipeline"),
)
def yv13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id")
    battles = ev.select(
        (F.expr(_h("m", "event_id")) % YV07_MODELS).alias("ma"),
        (F.expr(_h("n", "event_id")) % YV07_MODELS).alias("mb"),
        (F.expr(_h("wa", "event_id")) % _RMOD).alias("sa"),
        (F.expr(_h("wb", "event_id")) % _RMOD).alias("sb"),
    ).where(F.col("ma") != F.col("mb"))
    oriented = battles.select(
        F.least("ma", "mb").alias("m_lo"),
        F.greatest("ma", "mb").alias("m_hi"),
        F.when(F.col("ma") < F.col("mb"), F.col("sa")).otherwise(F.col("sb")).alias("s_lo"),
        F.when(F.col("ma") < F.col("mb"), F.col("sb")).otherwise(F.col("sa")).alias("s_hi"),
    )
    edges = oriented.groupBy("m_lo", "m_hi").agg(
        F.when(
            F.sum(F.when(F.col("s_lo") > F.col("s_hi"), 1).otherwise(0))
            >= F.sum(F.when(F.col("s_hi") > F.col("s_lo"), 1).otherwise(0)),
            1,
        )
        .otherwise(0)
        .alias("lo_wins")
    )
    # O(models^2) = 15 rows; without this checkpoint the three triad
    # role-projections each re-derive the edge aggregation - and its
    # corpus scan - three times over (r7 scan audit).
    from spotify_tags_etl_spark.plans.planmetrics import record_plan

    record_plan(edges, "yv13:edge_majorities")
    edges = edges.localCheckpoint(eager=True)
    ab = edges.select(
        F.col("m_lo").alias("a"), F.col("m_hi").alias("b"), F.col("lo_wins").alias("ab_w")
    )
    bc = edges.select(
        F.col("m_lo").alias("b"), F.col("m_hi").alias("c"), F.col("lo_wins").alias("bc_w")
    )
    ac = edges.select(
        F.col("m_lo").alias("a"), F.col("m_hi").alias("c"), F.col("lo_wins").alias("ac_w")
    )
    triads = ab.join(F.broadcast(bc), "b").join(F.broadcast(ac), ["a", "c"])
    cyc = F.sum(
        F.when(
            ((F.col("ab_w") == 1) & (F.col("bc_w") == 1) & (F.col("ac_w") == 0))
            | ((F.col("ab_w") == 0) & (F.col("bc_w") == 0) & (F.col("ac_w") == 1)),
            1,
        ).otherwise(0)
    )
    return triads.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triads"),
        cyc.cast("bigint").alias("n_cyclic"),
    ).selectExpr(
        "n_triads",
        "n_cyclic",
        "CAST(CAST(n_cyclic AS DECIMAL(38,0)) * 1000000 DIV n_triads AS BIGINT)"
        " AS cyclic_ppm",
    )


# ---------------------------------------------------------------------------
# yv14 — weighted annotator majority-vote aggregation
# ---------------------------------------------------------------------------

#: Annotators per item and label classes for yv14.
YV14_ANNOTATORS, YV14_CLASSES = 5, 4

#: Injective (weight DESC, label ASC) key: weight <= 45 = 5*9, label
#: <= 3 < 8, so key = w*8 - label separates weight steps by >= 8.
_YV14_KEY = 8


@register(
    "yv14_label_majority",
    oracle=f"""
    WITH votes AS (
      SELECT e.event_id,
             ('0x' || substr(md5('l' || CAST(t.i AS VARCHAR) || ':'
                             || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % {YV14_CLASSES} AS label,
             ('0x' || substr(md5('w' || CAST(t.i AS VARCHAR) || ':'
                             || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % 9 + 1 AS weight
      FROM events e, UNNEST(generate_series(0, {YV14_ANNOTATORS - 1})) AS t(i)
    ),
    lw AS (
      SELECT event_id, label, SUM(weight) AS w
      FROM votes GROUP BY 1, 2
    ),
    item AS (
      SELECT event_id,
             MAX_BY(label, w * {_YV14_KEY} - label) AS winner,
             MAX(w) AS top_w,
             SUM(w) AS total_w
      FROM lw GROUP BY 1
    )
    SELECT CAST(winner AS BIGINT) AS winner,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CASE WHEN 2 * top_w > total_w THEN 1 ELSE 0 END) AS BIGINT)
             AS n_majority,
           CAST(SUM(CASE WHEN 2 * top_w > total_w THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS majority_ppm,
           CAST(SUM(2 * top_w - total_w) AS BIGINT) AS sum_margin
    FROM item GROUP BY 1 ORDER BY 1
    """,
    doc=(
        f"Weighted annotator label aggregation: {YV14_ANNOTATORS} "
        "md5-derived annotators each cast a weighted vote over "
        f"{YV14_CLASSES} classes per item; per item the winning label "
        "is the weight argmax (weight DESC, label ASC through one "
        "injective int key — no window), with the dominance margin "
        "2*top_w - total_w (positive iff absolute majority). Emitted "
        "as the per-winner consensus table (n_items, majority count "
        "and exact ppm, total margin) a labeling pipeline reads before "
        "trusting a batch — the aggregation step yv06's kappa QA "
        "assumes. Shape: one map-combined groupBy(item, label), one "
        "groupBy(item), then an O(#classes) final frame; the "
        "annotator explode is map-side. At 100 TB both wide stages "
        "hash-partition on the item key with no skew (md5-uniform)."
    ),
    tags=("rlhf", "labeling", "llm-pipeline"),
)
def yv14(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id")
    votes = ev.select(
        "event_id", F.explode(F.sequence(F.lit(0), F.lit(YV14_ANNOTATORS - 1))).alias("i")
    ).select(
        "event_id",
        (
            F.expr(
                "CAST(conv(substring(md5(concat('l', CAST(i AS STRING), ':',"
                " CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            )
            % YV14_CLASSES
        ).alias("label"),
        (
            F.expr(
                "CAST(conv(substring(md5(concat('w', CAST(i AS STRING), ':',"
                " CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            )
            % 9
            + 1
        ).alias("weight"),
    )
    lw = votes.groupBy("event_id", "label").agg(F.sum("weight").alias("w"))
    item = lw.groupBy("event_id").agg(
        F.expr(f"max_by(label, w * {_YV14_KEY} - label)").alias("winner"),
        F.max("w").alias("top_w"),
        F.sum("w").alias("total_w"),
    )
    maj = F.when(2 * F.col("top_w") > F.col("total_w"), 1).otherwise(0)
    return (
        item.groupBy(F.col("winner").cast("bigint").alias("winner"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(maj).alias("n_majority"),
            F.sum(2 * F.col("top_w") - F.col("total_w")).cast("bigint").alias("sum_margin"),
        )
        .select(
            "winner",
            F.col("n_items").cast("bigint").alias("n_items"),
            F.col("n_majority").cast("bigint").alias("n_majority"),
            F.expr("CAST(n_majority * 1000000 DIV n_items AS BIGINT)").alias("majority_ppm"),
            "sum_margin",
        )
        .orderBy("winner")
    )


# ---------------------------------------------------------------------------
# yv16 — off-policy evaluation: IPS / SNIPS / effective sample size
# ---------------------------------------------------------------------------

#: Candidate target policies scored by yv16.
YV16_POLICIES = 3

#: Propensity range (permille): 100..900 keeps importance weights in
#: [111, 9000] permille — bounded, so no clipping branch is needed and
#: every accumulator bound below is closed-form.
_YV16_PMIN, _YV16_PSPAN = 100, 801


@register(
    "yv16_ips_offpolicy",
    oracle=f"""
    WITH logged AS (
      SELECT t.p AS policy,
             ('0x' || substr(md5('r:' || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS r,
             {_YV16_PMIN} + ('0x' || substr(md5('b:' || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % {_YV16_PSPAN} AS pb_pm,
             {_YV16_PMIN} + ('0x' || substr(md5('t' || CAST(t.p AS VARCHAR) || ':'
                             || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % {_YV16_PSPAN} AS pt_pm
      FROM events e, UNNEST(generate_series(0, {YV16_POLICIES - 1})) AS t(p)
    ),
    w AS (
      SELECT policy, r, pt_pm * 1000 // pb_pm AS w_pm FROM logged
    ),
    s AS (
      SELECT policy,
             COUNT(*) AS n,
             SUM(w_pm) AS s1,
             SUM(r * w_pm) AS sr,
             SUM(CAST(w_pm AS HUGEINT) * w_pm) AS s2
      FROM w GROUP BY 1
    )
    SELECT CAST(policy AS BIGINT) AS policy,
           CAST(n AS BIGINT) AS n,
           CAST(CAST(sr AS HUGEINT) * 1000 // n AS BIGINT) AS ips_ppm,
           CAST(CAST(sr AS HUGEINT) * 1000000 // s1 AS BIGINT) AS snips_ppm,
           CAST(CAST(s1 AS HUGEINT) * s1 * 1000000 // (n * s2) AS BIGINT) AS ess_ppm,
           CAST(s1 // n AS BIGINT) AS mean_w_pm
    FROM s ORDER BY policy
    """,
    doc=(
        "Off-policy evaluation of candidate response policies from "
        "logged bandit feedback — the RLHF data loop's 'score a new "
        "policy WITHOUT redeploying' step. Each logged event carries an "
        "md5-derived behavior propensity and binary reward; "
        f"{YV16_POLICIES} target policies get per-event propensities, "
        "and per policy the query emits the IPS value estimate "
        "(mean r*w), the self-normalized SNIPS estimate "
        "(sum r*w / sum w — lower variance, slight bias), and the "
        "effective sample size ratio ESS/n = S1^2/(n*S2) — the "
        "diagnostic that says whether the overlap between behavior and "
        "target policy is good enough to trust either estimate. "
        "Everything is exact integer: weights are quantized to "
        "permille by truncating division (identical in Spark DIV and "
        "DuckDB //), and every product that can pass int64 at 100 TB "
        "row counts is 128-bit (S2's addend reaches 8.1e7, so its sum "
        "wraps int64 near 1e11 rows — DECIMAL(38,0)/HUGEINT on both "
        "sides; S1^2*1e6 <= 8.1e37 fits DECIMAL(38,0) up to ~1e13 "
        "rows/policy, documented bound). Shape: one map-side explode "
        f"(x{YV16_POLICIES}), one map-combined groupBy(policy) to "
        f"O({YV16_POLICIES}) rows — no joins, no windows, no skew."
    ),
    tags=("rlhf", "offpolicy", "llm-pipeline"),
)
def yv16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id")
    logged = ev.select(
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(YV16_POLICIES - 1))).alias("policy"),
    ).select(
        "policy",
        (F.expr(_h("r", "event_id")) % 2).alias("r"),
        (F.expr(_h("b", "event_id")) % _YV16_PSPAN + _YV16_PMIN).alias("pb_pm"),
        (
            F.expr(
                "CAST(conv(substring(md5(concat('t', CAST(policy AS STRING), ':',"
                " CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            )
            % _YV16_PSPAN
            + _YV16_PMIN
        ).alias("pt_pm"),
    )
    w = logged.select("policy", "r", F.expr("pt_pm * 1000 DIV pb_pm").alias("w_pm"))
    s = w.groupBy("policy").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w_pm").alias("s1"),
        F.sum(F.col("r") * F.col("w_pm")).alias("sr"),
        # w_pm^2 <= 8.1e7 per row: a plain long sum wraps near 1e11 rows
        # (real 100 TB territory) — accumulate 128-bit, like av13/yj01.
        F.sum(F.col("w_pm").cast("decimal(38,0)") * F.col("w_pm")).alias("s2"),
    )
    return s.select(
        F.col("policy").cast("bigint").alias("policy"),
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST(CAST(sr AS DECIMAL(38,0)) * 1000 DIV n AS BIGINT)").alias("ips_ppm"),
        F.expr("CAST(CAST(sr AS DECIMAL(38,0)) * 1000000 DIV s1 AS BIGINT)").alias(
            "snips_ppm"
        ),
        F.expr(
            "CAST(CAST(s1 AS DECIMAL(38,0)) * s1 * 1000000 DIV (n * s2) AS BIGINT)"
        ).alias("ess_ppm"),
        F.expr("CAST(s1 DIV n AS BIGINT)").alias("mean_w_pm"),
    ).orderBy("policy")


# ---------------------------------------------------------------------------
# yv17 — Fleiss' kappa: multi-rater agreement over the yv14 vote frame
# ---------------------------------------------------------------------------

#: Raters per item and label classes (complete design: every item gets
#: exactly _YV17_M ratings, Fleiss' precondition).
_YV17_M, _YV17_C = 5, 4


@register(
    "yv17_fleiss_kappa",
    oracle=f"""
    WITH votes AS (
      SELECT e.event_id,
             ('0x' || substr(md5('f' || CAST(t.i AS VARCHAR) || ':'
                             || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % {_YV17_C} AS label
      FROM events e, UNNEST(generate_series(0, {_YV17_M - 1})) AS t(i)
    ),
    lw AS (
      SELECT event_id, label, COUNT(*) AS n_uc FROM votes GROUP BY 1, 2
    ),
    per_class AS (
      SELECT label, SUM(n_uc * n_uc) AS sa_c, SUM(n_uc) AS t_c
      FROM lw GROUP BY 1
    ),
    tot AS (
      SELECT SUM(sa_c) AS sa,
             SUM(CAST(t_c AS HUGEINT) * t_c) AS st2,
             SUM(t_c) AS nm
      FROM per_class
    ),
    ppm AS (
      SELECT nm // {_YV17_M} AS n_items,
             CAST((sa - nm) AS HUGEINT) * 1000000
               // (nm * {_YV17_M - 1}) AS po_ppm,
             st2 * 1000000 // (CAST(nm AS HUGEINT) * nm) AS pe_ppm
      FROM tot
    )
    SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(po_ppm AS BIGINT) AS po_ppm,
           CAST(pe_ppm AS BIGINT) AS pe_ppm,
           CAST((po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm) AS BIGINT)
             AS kappa_ppm
    FROM ppm
    """,
    doc=(
        f"Fleiss' kappa over a complete {_YV17_M}-rater, {_YV17_C}-class "
        "annotation design (the same md5 vote synthesis family as "
        "yv14/yv06): chance-corrected agreement for MANY raters, the QA "
        "gate a labeling vendor report actually needs (yv06's Cohen "
        "kappa only covers rater PAIRS). P_o = (sum n_uc^2 - N*m) / "
        "(N*m*(m-1)), P_e = sum T_c^2 / (N*m)^2, both emitted as exact "
        "truncating-division ppm; kappa_ppm is then derived from the "
        "ppm-rounded P_o/P_e (documented spec — deterministic on both "
        "engines, signed DIV truncates toward zero identically). "
        "Width discipline: T_c reaches N*m, so T_c^2 is squared in "
        "128-bit on the O(#classes) frame, never per row; sum n_uc^2 "
        "has addend <= m^2 = 25 and stays a long sum (int64-safe past "
        "1e16 rows). Shape: one map-combined groupBy(item, label), one "
        f"groupBy(label) to {_YV17_C} rows, one 1-row final agg — the "
        "only single-partition stage is the O(1) scalar fold."
    ),
    tags=("rlhf", "labeling", "llm-pipeline"),
)
def yv17(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id")
    votes = ev.select(
        "event_id", F.explode(F.sequence(F.lit(0), F.lit(_YV17_M - 1))).alias("i")
    ).select(
        "event_id",
        (
            F.expr(
                "CAST(conv(substring(md5(concat('f', CAST(i AS STRING), ':',"
                " CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            )
            % _YV17_C
        ).alias("label"),
    )
    lw = votes.groupBy("event_id", "label").agg(F.count(F.lit(1)).alias("n_uc"))
    per_class = lw.groupBy("label").agg(
        F.sum(F.col("n_uc") * F.col("n_uc")).alias("sa_c"),
        F.sum("n_uc").alias("t_c"),
    )
    tot = per_class.agg(
        F.sum("sa_c").alias("sa"),
        # T_c reaches N*m: square in 128-bit on this O(#classes) frame.
        F.sum(F.col("t_c").cast("decimal(38,0)") * F.col("t_c")).alias("st2"),
        F.sum("t_c").alias("nm"),
    )
    ppm = tot.selectExpr(
        f"nm DIV {_YV17_M} AS n_items",
        f"CAST(CAST(sa - nm AS DECIMAL(38,0)) * 1000000 DIV (nm * {_YV17_M - 1})"
        " AS BIGINT) AS po_ppm",
        "CAST(st2 * 1000000 DIV (CAST(nm AS DECIMAL(38,0)) * nm) AS BIGINT) AS pe_ppm",
    )
    return ppm.selectExpr(
        "CAST(n_items AS BIGINT) AS n_items",
        "po_ppm",
        "pe_ppm",
        "CAST((po_ppm - pe_ppm) * 1000000 DIV (1000000 - pe_ppm) AS BIGINT)"
        " AS kappa_ppm",
    )


# ---------------------------------------------------------------------------
# yv19 — bootstrap confidence intervals for the SNIPS estimate
# ---------------------------------------------------------------------------

#: Bootstrap replicates (shared across policies — a PAIRED resample, so
#: cross-policy comparisons difference out resampling noise).
_YV19_REPS = 20

#: Poisson(1) pmf as cumulative permille cut points for w = 0,1,2,3,>=4
#: (368/368/184/61/19+tail merged into 4 — documented approximation;
#: md5-uniform u in [0,1000) makes the resample deterministic).
_YV19_CUTS = (368, 736, 920, 981)


def _yv19_bw(u: str) -> str:
    """SQL CASE mapping a uniform permille draw to a Poisson(1) weight."""
    c = _YV19_CUTS
    return (
        f"CASE WHEN {u} < {c[0]} THEN 0 WHEN {u} < {c[1]} THEN 1"
        f" WHEN {u} < {c[2]} THEN 2 WHEN {u} < {c[3]} THEN 3 ELSE 4 END"
    )


@register(
    "yv19_snips_bootstrap_ci",
    oracle=f"""
    WITH logged AS (
      SELECT t.p AS policy, e.event_id,
             ('0x' || substr(md5('r:' || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS r,
             {_YV16_PMIN} + ('0x' || substr(md5('b:' || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % {_YV16_PSPAN} AS pb_pm,
             {_YV16_PMIN} + ('0x' || substr(md5('t' || CAST(t.p AS VARCHAR) || ':'
                             || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % {_YV16_PSPAN} AS pt_pm
      FROM events e, UNNEST(generate_series(0, {YV16_POLICIES - 1})) AS t(p)
    ),
    w AS (
      SELECT policy, event_id, r, pt_pm * 1000 // pb_pm AS w_pm FROM logged
    ),
    rep AS (
      SELECT w.*, j.j,
             {_yv19_bw("('0x' || substr(md5('bs' || CAST(j.j AS VARCHAR) || ':' "
                       "|| CAST(w.event_id AS VARCHAR)), 1, 8))::BIGINT % 1000")} AS bw
      FROM w, UNNEST(generate_series(0, {_YV19_REPS - 1})) AS j(j)
    ),
    per_rep AS (
      SELECT policy, j,
             CAST(CAST(SUM(bw * r * w_pm) AS HUGEINT) * 1000000
                  // NULLIF(SUM(bw * w_pm), 0) AS BIGINT) AS v
      FROM rep GROUP BY 1, 2
    ),
    ranked AS (
      SELECT policy, v,
             ROW_NUMBER() OVER (PARTITION BY policy ORDER BY v, j) AS rn,
             COUNT(*) OVER (PARTITION BY policy) AS n_reps
      FROM per_rep WHERE v IS NOT NULL
    ),
    ci AS (
      SELECT policy, CAST(MAX(n_reps) AS BIGINT) AS n_reps,
             MAX(CASE WHEN rn = (n_reps * 5 + 99) // 100 THEN v END)
               AS lo_ppm,
             MAX(CASE WHEN rn = (n_reps + 1) // 2 THEN v END) AS med_ppm,
             MAX(CASE WHEN rn = n_reps - (n_reps * 5 + 99) // 100 + 1 THEN v END)
               AS hi_ppm
      FROM ranked GROUP BY policy
    ),
    point AS (
      SELECT policy,
             CAST(CAST(SUM(r * w_pm) AS HUGEINT) * 1000000
                  // SUM(w_pm) AS BIGINT) AS snips_ppm
      FROM w GROUP BY 1
    )
    SELECT CAST(p.policy AS BIGINT) AS policy, p.snips_ppm,
           c.n_reps, CAST(c.lo_ppm AS BIGINT) AS lo_ppm,
           CAST(c.med_ppm AS BIGINT) AS med_ppm, CAST(c.hi_ppm AS BIGINT) AS hi_ppm
    FROM point p JOIN ci c USING (policy)
    ORDER BY policy
    """,
    doc=(
        "Error bars for the off-policy estimate: a deterministic paired "
        f"Poisson bootstrap ({_YV19_REPS} replicates, weights md5-drawn "
        "from the Poisson(1) pmf at permille resolution, SHARED across "
        "policies so policy deltas difference out resampling noise — "
        "the streaming-friendly resample that never materializes a "
        "resampled dataset, the standard bootstrap-on-MapReduce shape). "
        "Per (policy, replicate) one map-combined aggregate computes "
        "the SNIPS ppm value; the 90% CI is EXACT rank-selection over "
        "the replicate values (ceil-rank formulas, total-ordered by "
        "(value, replicate) — no float quantile interpolation "
        "anywhere). Width: bootstrap addend bw*w_pm <= 36000 keeps "
        "int64 sums safe past 2.5e14 rows; the ppm scaling "
        "cross-multiplies in 128-bit. Shape: the explode is map-side "
        f"(x{YV16_POLICIES}x{_YV19_REPS}), immediately collapsed to "
        f"O({YV16_POLICIES}*{_YV19_REPS}) partial rows; windows "
        "partition by policy over those tiny frames."
    ),
    tags=("rlhf", "offpolicy", "bootstrap", "llm-pipeline"),
)
def yv19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id")
    logged = ev.select(
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(YV16_POLICIES - 1))).alias("policy"),
    ).select(
        "policy",
        "event_id",
        (F.expr(_h("r", "event_id")) % 2).alias("r"),
        (F.expr(_h("b", "event_id")) % _YV16_PSPAN + _YV16_PMIN).alias("pb_pm"),
        (
            F.expr(
                "CAST(conv(substring(md5(concat('t', CAST(policy AS STRING), ':',"
                " CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            )
            % _YV16_PSPAN
            + _YV16_PMIN
        ).alias("pt_pm"),
    )
    w = logged.select(
        "policy", "event_id", "r", F.expr("pt_pm * 1000 DIV pb_pm").alias("w_pm")
    )
    rep = w.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(_YV19_REPS - 1))).alias("j")
    ).withColumn(
        "bw",
        F.expr(
            _yv19_bw(
                "CAST(conv(substring(md5(concat('bs', CAST(j AS STRING), ':',"
                " CAST(event_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1000"
            )
        ),
    )
    per_rep = (
        rep.groupBy("policy", "j")
        .agg(
            F.sum(F.col("bw") * F.col("r") * F.col("w_pm")).alias("sn"),
            F.sum(F.col("bw") * F.col("w_pm")).alias("sd"),
        )
        .selectExpr(
            "policy",
            "j",
            "CAST(CAST(sn AS DECIMAL(38,0)) * 1000000 DIV NULLIF(sd, 0) AS BIGINT) AS v",
        )
        .where("v IS NOT NULL")
    )
    wv = Window.partitionBy("policy").orderBy("v", "j")
    ranked = per_rep.withColumn("rn", F.row_number().over(wv)).withColumn(
        "n_reps", F.count(F.lit(1)).over(Window.partitionBy("policy"))
    )
    # conditional rank picks (ceil-rank lo, median, symmetric hi)
    ci = ranked.groupBy("policy").agg(
        F.max("n_reps").cast("bigint").alias("n_reps"),
        F.max(F.expr("CASE WHEN rn = (n_reps * 5 + 99) DIV 100 THEN v END")).alias(
            "lo_ppm"
        ),
        F.max(F.expr("CASE WHEN rn = (n_reps + 1) DIV 2 THEN v END")).alias("med_ppm"),
        F.max(
            F.expr("CASE WHEN rn = n_reps - (n_reps * 5 + 99) DIV 100 + 1 THEN v END")
        ).alias("hi_ppm"),
    )
    point = w.groupBy("policy").agg(
        F.expr(
            "CAST(CAST(SUM(r * w_pm) AS DECIMAL(38,0)) * 1000000 DIV SUM(w_pm)"
            " AS BIGINT)"
        ).alias("snips_ppm")
    )
    return (
        point.join(F.broadcast(ci), "policy")
        .select(
            F.col("policy").cast("bigint").alias("policy"),
            "snips_ppm",
            "n_reps",
            F.col("lo_ppm").cast("bigint").alias("lo_ppm"),
            F.col("med_ppm").cast("bigint").alias("med_ppm"),
            F.col("hi_ppm").cast("bigint").alias("hi_ppm"),
        )
        .orderBy("policy")
    )


# ---------------------------------------------------------------------------
# yv23 — composed RLHF eval report (the eval twin of yy01's health report)
# ---------------------------------------------------------------------------


@register(
    "yv23_rlhf_eval_report",
    oracle=f"""
    WITH logged AS (
      SELECT t.p AS policy,
             ('0x' || substr(md5('r:' || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS r,
             {_YV16_PMIN} + ('0x' || substr(md5('b:' || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % {_YV16_PSPAN} AS pb_pm,
             {_YV16_PMIN} + ('0x' || substr(md5('t' || CAST(t.p AS VARCHAR) || ':'
                             || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % {_YV16_PSPAN} AS pt_pm
      FROM events e, UNNEST(generate_series(0, {YV16_POLICIES - 1})) AS t(p)
    ),
    w AS (SELECT policy, r, pt_pm * 1000 // pb_pm AS w_pm FROM logged),
    pol AS (
      SELECT policy,
             CAST(CAST(SUM(r * w_pm) AS HUGEINT) * 1000000 // SUM(w_pm) AS BIGINT)
               AS snips_ppm,
             CAST(CAST(SUM(w_pm) AS HUGEINT) * SUM(w_pm) * 1000000
                  // (COUNT(*) * SUM(CAST(w_pm AS HUGEINT) * w_pm)) AS BIGINT)
               AS ess_ppm
      FROM w GROUP BY 1
    ),
    fv AS (
      SELECT e.event_id,
             ('0x' || substr(md5('f' || CAST(t.i AS VARCHAR) || ':'
                             || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % {_YV17_C} AS label
      FROM events e, UNNEST(generate_series(0, {_YV17_M - 1})) AS t(i)
    ),
    flw AS (SELECT event_id, label, COUNT(*) AS n_uc FROM fv GROUP BY 1, 2),
    fpc AS (SELECT label, SUM(n_uc * n_uc) AS sa_c, SUM(n_uc) AS t_c FROM flw GROUP BY 1),
    ftot AS (
      SELECT SUM(sa_c) AS sa, SUM(CAST(t_c AS HUGEINT) * t_c) AS st2, SUM(t_c) AS nm
      FROM fpc
    ),
    fk AS (
      SELECT CAST(sa - nm AS HUGEINT) * 1000000 // (nm * {_YV17_M - 1}) AS po_ppm,
             st2 * 1000000 // (CAST(nm AS HUGEINT) * nm) AS pe_ppm
      FROM ftot
    ),
    mv AS (
      SELECT e.event_id,
             ('0x' || substr(md5('l' || CAST(t.i AS VARCHAR) || ':'
                             || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % {YV14_CLASSES} AS label,
             ('0x' || substr(md5('w' || CAST(t.i AS VARCHAR) || ':'
                             || CAST(e.event_id AS VARCHAR)), 1, 8))::BIGINT
               % 9 + 1 AS weight
      FROM events e, UNNEST(generate_series(0, {YV14_ANNOTATORS - 1})) AS t(i)
    ),
    mlw AS (SELECT event_id, label, SUM(weight) AS w FROM mv GROUP BY 1, 2),
    mitem AS (
      SELECT event_id, MAX(w) AS top_w, SUM(w) AS total_w FROM mlw GROUP BY 1
    )
    SELECT 'best_policy' AS metric,
           CAST(MAX_BY(policy, snips_ppm * 10 - policy) AS BIGINT) AS value FROM pol
    UNION ALL
    SELECT 'best_policy_snips_ppm', CAST(MAX(snips_ppm) AS BIGINT) FROM pol
    UNION ALL
    SELECT 'min_ess_ppm', CAST(MIN(ess_ppm) AS BIGINT) FROM pol
    UNION ALL
    SELECT 'fleiss_kappa_ppm',
           CAST((po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm) AS BIGINT) FROM fk
    UNION ALL
    SELECT 'label_majority_ppm',
           CAST(SUM(CASE WHEN 2 * top_w > total_w THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT)
    FROM mitem
    """,
    doc=(
        "The composed RLHF EVAL REPORT — yy01's composition discipline "
        "applied to the preference-data family: which candidate policy "
        "wins (yv16's SNIPS argmax, policy-asc tiebreak through one "
        "injective key), its value, the WORST policy-overlap diagnostic "
        "(min ESS — the 'can you trust any of this' gate), annotation "
        "quality (yv17's Fleiss kappa), and the share of items with an "
        "absolute weighted label majority (yv14's frame). Every branch "
        "reduces to an O(1) scalar before the union; each keeps its "
        "family's shape (map-combined groupBys, no joins wider than the "
        f"O({YV16_POLICIES}) policy frame). One dashboard query a "
        "preference-data pipeline pages on; all values exact integers, "
        "so the report itself is hash-checkable."
    ),
    tags=("rlhf", "composed", "monitoring", "llm-pipeline"),
)
def yv23(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (guide §2.4): three report branches aggregate the SAME
    # O(YV16_POLICIES)-row policy frame, and union branches cannot share
    # a subtree — the events x policies explode (the report's heaviest
    # pass) ran THREE times. Fold the three scalars into ONE aggregate
    # over one pol subtree and stack them into the (metric, value) rows:
    # still a single job (kappa/maj branches schedule concurrently with
    # it inside that job), one corpus pass instead of three. A
    # checkpoint-per-section variant (§2.6) was measured and rejected —
    # 4 extra driver round-trips cost more than the saved passes at any
    # size where the pass isn't minutes long; the stack form wins both
    # locally and at scale.
    pol = yv16(spark, sf_dir)
    three = pol.agg(
        F.expr("CAST(max_by(policy, snips_ppm * 10 - policy) AS BIGINT)").alias("_b"),
        F.max("snips_ppm").cast("bigint").alias("_bv"),
        F.min("ess_ppm").cast("bigint").alias("_e"),
    ).selectExpr(
        "stack(3, 'best_policy', _b, 'best_policy_snips_ppm', _bv,"
        " 'min_ess_ppm', _e) AS (metric, value)"
    )
    kappa = yv17(spark, sf_dir).select(
        F.lit("fleiss_kappa_ppm").alias("metric"),
        F.col("kappa_ppm").cast("bigint").alias("value"),
    )
    maj = yv14(spark, sf_dir).agg(
        F.lit("label_majority_ppm").alias("metric"),
        F.expr(
            "CAST(SUM(n_majority) * 1000000 DIV SUM(n_items) AS BIGINT)"
        ).alias("value"),
    )
    return three.unionByName(kappa).unionByName(maj)
