"""Round-8 LLM-pipeline operators (zc band).

zc01 — sequence packing: assemble variable-length documents into
fixed-size training context windows with bounded padding, as pure
relational algebra (the stage after za01/zb01's tokenization that
actually BUILDS the training sequences).

zc02 — tokenizer round-trip audit: prove corpus-level losslessness of
the learned BPE tokenization by comparing the detokenized vocabulary
against an independently re-derived source vocabulary via grouped
checksums (the gate a real pipeline runs after every vocab change).

Reference parity note: the reference ETL
(/root/reference/src/spotify_tags_etl/) has no training-data stage;
these operators extend the engine along SURVEY.md's
"training-data pipeline" axis, same as the za/zb band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_tags_etl_spark.operators.scalerank import grouped_rank
from spotify_tags_etl_spark.operators.ytrain import (
    YV10_MAX_LEN,
    YV10_MIN_LEN,
    YV10_ROUNDS,
    bpe_ctes,
    bpe_learn,
)
from spotify_tags_etl_spark.plans.planmetrics import record_plan
from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.tpch import load_table

# ---------------------------------------------------------------------------
# zc01 — banded first-fit-decreasing sequence packing
# ---------------------------------------------------------------------------

#: Context window size in tokens.
ZC01_WINDOW = 4096

#: chars -> tokens conversion rate (ppm). A fixed planning constant so
#: the packing query is self-contained and cheap; in production this is
#: wired from za05's measured ``tokens_per_char_ppm`` (the two compose:
#: za05 measures the rate under the learned tokenizer, zc01 consumes
#: it). 250000 ppm = 4 chars/token, the conventional rule of thumb.
ZC01_TOK_PPM = 250_000

#: window_id = band_exp * 2^44 + index-within-band: 2^44 windows per
#: band before collision — at 4096-token windows that is ~7e16 tokens
#: PER BAND, comfortably past 100 TB corpora.
ZC01_BAND_BASE = 1 << 44


@register(
    "zc01_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             LEAST(GREATEST(CAST(n_chars AS BIGINT) * {ZC01_TOK_PPM} // 1000000, 1),
                   {ZC01_WINDOW}) AS tok
      FROM documents
    ),
    banded AS (
      SELECT doc_id, tok,
             CASE WHEN tok <= 1 THEN 0
                  ELSE length(bin(tok - 1)) END AS band_exp
      FROM toks
    ),
    ranked AS (
      SELECT doc_id, tok, band_exp,
             ROW_NUMBER() OVER (PARTITION BY band_exp
                                ORDER BY tok DESC, doc_id ASC) - 1 AS r
      FROM banded
    ),
    placed AS (
      SELECT doc_id, tok, band_exp, r,
             (CAST(1 AS BIGINT) << band_exp) AS slot_len,
             {ZC01_WINDOW} // (CAST(1 AS BIGINT) << band_exp) AS k
      FROM ranked
    ),
    w AS (
      SELECT doc_id,
             CAST(tok AS BIGINT) AS doc_tokens,
             CAST(band_exp AS BIGINT) * {ZC01_BAND_BASE} + r // k AS window_id,
             CAST((r % k) * slot_len AS BIGINT) AS slot_offset
      FROM placed
    )
    SELECT window_id, doc_id, slot_offset, doc_tokens,
           CAST(SUM(doc_tokens) OVER (PARTITION BY window_id) * 1000000
                // {ZC01_WINDOW} AS BIGINT) AS fill_ppm
    FROM w
    ORDER BY window_id, slot_offset
    """,
    doc=(
        "SEQUENCE PACKING: assemble documents into fixed "
        f"{ZC01_WINDOW}-token context windows — the stage that builds "
        "the actual training sequences after tokenization (za01/zb01) "
        "and budgeting (yv18). Exact first-fit-decreasing is "
        "inherently sequential (each placement depends on every bin's "
        "current fill), so this is the BANDED FFD approximation that "
        "parallelizes: documents band by power-of-two token length, "
        "each window packs k = W/2^b same-band documents into fixed "
        "slots, and slot assignment is pure rank arithmetic "
        "(window = rank DIV k, slot_offset = (rank MOD k) * 2^b). "
        "Padding per doc is bounded by its slot slack < half the slot, "
        "so every window is > 50% full wherever its band has >= k "
        "docs remaining — the bound exact FFD also cannot beat by 2x. "
        "Scale shape: ONE corpus-projection scan (doc_id, n_chars), "
        "per-band rank via scalerank.grouped_rank (range repartition "
        "+ parallel (_pid, band) window + broadcast per-(partition, "
        "band) offsets — no single-reducer and no 13-reducer band "
        "window), per-window fill via a keyed window "
        "partitioned on window_id (<= k rows per partition). Output: "
        "(window_id, doc_id, slot_offset, doc_tokens, fill_ppm). "
        "Deviation from exact FFD is the point — documented above; "
        "integer-exact, so the DuckDB oracle (same arithmetic, "
        "per-band ROW_NUMBER) is bit-identical."
    ),
    tags=("training", "packing", "llm-pipeline"),
)
def zc01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    banded = docs.select(
        "doc_id",
        F.expr(
            f"LEAST(GREATEST(CAST(n_chars AS BIGINT) * {ZC01_TOK_PPM}"
            f" DIV 1000000, 1), {ZC01_WINDOW})"
        ).alias("tok"),
    ).withColumn(
        # smallest power of two >= tok, integer-exact via the binary
        # string length of tok-1 (float log2 could flip at 2^p +/- 1
        # boundaries between engines; bin() cannot).
        "band_exp",
        F.expr("CASE WHEN tok <= 1 THEN 0 ELSE length(bin(tok - 1)) END"),
    )
    # Per-band rank via scalerank.grouped_rank: <= 13 bands means a
    # Window.partitionBy(band_exp) would funnel millions of rows into
    # 13 reducers — exactly the skewed-window class the plan ratchet
    # bans. grouped_rank range-lays-out (band, tok DESC, doc_id),
    # broadcasts per-(partition, band) offsets, and ranks in a PARALLEL
    # (_pid, band) window: one corpus-projection scan, no skew.
    ranked, _n = grouped_rank(
        banded,
        ["band_exp"],
        [F.col("tok").desc(), F.col("doc_id").asc()],
        rank_col="brk",
    )
    record_plan(ranked, "zc01:banded_rank")
    placed = ranked.selectExpr(
        "doc_id",
        "CAST(tok AS BIGINT) AS doc_tokens",
        "band_exp",
        "brk - 1 AS r",
        "shiftleft(CAST(1 AS BIGINT), band_exp) AS slot_len",
        f"{ZC01_WINDOW} DIV shiftleft(CAST(1 AS BIGINT), band_exp) AS k",
    )
    w = placed.selectExpr(
        "doc_id",
        "doc_tokens",
        f"CAST(band_exp AS BIGINT) * {ZC01_BAND_BASE} + r DIV k AS window_id",
        "CAST((r % k) * slot_len AS BIGINT) AS slot_offset",
    )
    return w.select(
        "window_id",
        "doc_id",
        "slot_offset",
        "doc_tokens",
        F.expr(
            f"CAST(SUM(doc_tokens) OVER (PARTITION BY window_id) * 1000000"
            f" DIV {ZC01_WINDOW} AS BIGINT)"
        ).alias("fill_ppm"),
    ).orderBy("window_id", "slot_offset")


# ---------------------------------------------------------------------------
# zc02 — tokenizer round-trip losslessness audit
# ---------------------------------------------------------------------------

#: Checksum buckets: the audit rolls corpus-level equality up to a few
#: bucket rows so the evidence is inspectable without shipping the
#: vocabulary anywhere.
ZC02_BUCKETS = 16


def _zc02_oracle_sql(rounds: int = YV10_ROUNDS) -> str:
    ctes = bpe_ctes(rounds)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    det AS (SELECT replace(seq, '|', '') AS w, cnt, -1 AS side FROM w{rounds}),
    src AS (SELECT w, cnt, 1 AS side FROM tok),
    u AS (
      SELECT ('0x' || substr(md5(w), 1, 2))::BIGINT % {ZC02_BUCKETS} AS bucket,
             w, cnt, side,
             ('0x' || substr(md5(w || ':' || CAST(cnt AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM (SELECT w, cnt, side FROM src UNION ALL SELECT w, cnt, side FROM det) z
    ),
    g AS (
      SELECT bucket, w,
             SUM(CASE WHEN side = 1 THEN cnt END) AS cnt_src,
             SUM(CASE WHEN side = -1 THEN cnt END) AS cnt_det,
             SUM(CASE WHEN side = 1 THEN h END) AS h_src,
             SUM(CASE WHEN side = -1 THEN h END) AS h_det
      FROM u GROUP BY bucket, w
    )
    SELECT bucket,
           CAST(COUNT(cnt_src) AS BIGINT) AS src_types,
           CAST(COUNT(cnt_det) AS BIGINT) AS det_types,
           CAST(SUM(cnt_src) AS BIGINT) AS src_occurrences,
           CAST(SUM(cnt_det) AS BIGINT) AS det_occurrences,
           CAST(SUM(h_src) AS BIGINT) AS src_checksum,
           CAST(SUM(h_det) AS BIGINT) AS det_checksum,
           CAST(SUM(CASE WHEN cnt_src IS DISTINCT FROM cnt_det
                         THEN 1 ELSE 0 END) AS BIGINT) AS mismatch_types
    FROM g GROUP BY bucket ORDER BY bucket
    """
    )


@register(
    "zc02_tokenizer_roundtrip",
    oracle=_zc02_oracle_sql(),
    doc=(
        "TOKENIZER ROUND-TRIP AUDIT: detokenize the learned-BPE "
        "vocabulary (concat tokens in order = strip the '|' "
        "separators) and prove corpus-level equality with an "
        "independently re-derived source vocabulary — the "
        "'tokenization is lossless' gate a production pipeline runs "
        "after every vocab change before anything downstream trains "
        "on the tokens. Evidence is rolled up to "
        f"{ZC02_BUCKETS} md5-bucket rows: per bucket the word-type and "
        "occurrence totals, an order-insensitive SUM-of-md5-prefix "
        "checksum for each side, and mismatch_types = count of words "
        "whose (word, count) pair differs between the sides — every "
        "row must show src == det and mismatch_types = 0 (pinned by "
        "tests/test_round8_additions.py). Shape: the detok side is "
        "the learner's O(vocab) frame (checkpointed); the source side "
        "is one map-combined corpus groupBy; both sides then flow "
        "through ONE union -> (bucket, word) groupBy -> bucket rollup "
        "— no join, two keyed exchanges, nothing corpus-sized on a "
        "single reducer. The checksum addend is a 32-bit md5 prefix, "
        "so the per-bucket SUM stays int64-safe past 4e9 word types."
    ),
    tags=("text", "tokenizer", "audit", "llm-pipeline"),
)
def zc02(spark: SparkSession, sf_dir: str) -> DataFrame:
    _rows, words = bpe_learn(spark, sf_dir, YV10_ROUNDS)
    det = words.select(
        F.translate("seq", "|", "").alias("w"), "cnt", F.lit(-1).alias("side")
    )
    record_plan(det, "zc02:detok")
    det = det.localCheckpoint(eager=True)
    words.unpersist()
    docs = load_table(spark, sf_dir, "documents")
    src = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .where(F.length("w").between(YV10_MIN_LEN, YV10_MAX_LEN))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("w", "cnt", F.lit(1).alias("side"))
    )
    u = src.unionByName(det).select(
        F.expr(
            f"CAST(conv(substring(md5(w), 1, 2), 16, 10) AS BIGINT) % {ZC02_BUCKETS}"
        ).alias("bucket"),
        "w",
        "cnt",
        "side",
        F.expr(
            "CAST(conv(substring(md5(concat(w, ':', CAST(cnt AS STRING))), 1, 8),"
            " 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    g = u.groupBy("bucket", "w").agg(
        F.sum(F.when(F.col("side") == 1, F.col("cnt"))).alias("cnt_src"),
        F.sum(F.when(F.col("side") == -1, F.col("cnt"))).alias("cnt_det"),
        F.sum(F.when(F.col("side") == 1, F.col("h"))).alias("h_src"),
        F.sum(F.when(F.col("side") == -1, F.col("h"))).alias("h_det"),
    )
    return (
        g.groupBy("bucket")
        .agg(
            F.count("cnt_src").cast("bigint").alias("src_types"),
            F.count("cnt_det").cast("bigint").alias("det_types"),
            F.sum("cnt_src").cast("bigint").alias("src_occurrences"),
            F.sum("cnt_det").cast("bigint").alias("det_occurrences"),
            F.sum("h_src").cast("bigint").alias("src_checksum"),
            F.sum("h_det").cast("bigint").alias("det_checksum"),
            F.sum(
                F.expr("CASE WHEN cnt_src IS DISTINCT FROM cnt_det THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias("mismatch_types"),
        )
        .orderBy("bucket")
    )
