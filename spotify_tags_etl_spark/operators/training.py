"""Training-data pipeline operators: deterministic sampling, dataset
splits, and TF-IDF term weighting over the ``documents`` table.

Everything is hash-deterministic (md5-bucket thresholds, never
``rand()``): a sampling decision that changes across retries/partitions
poisons incremental pipelines, dedup bookkeeping, and eval splits. All
column expressions are built-in (JVM codegen); no UDFs.

(Registry names use the ``tz`` prefix — late-sorting slots that queue
for the next driver-window rotation instead of displacing the queries
currently under verification; oracle-checked locally meanwhile. See
``plans/registry.py``.)

Scale notes (100 TB):

* md5-bucket sampling/splitting is a scan-time narrow filter — no
  shuffle, no state, embarrassingly parallel, reproducible across runs
  and engines;
* TF-IDF is two aggregations: term counts per doc (shuffle on doc_id —
  but the explode keeps (doc_id, term) partial-agg friendly) and document
  frequencies (shuffle on term, output is vocabulary-sized → broadcast
  back). The vocabulary table is the classic broadcast dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.functions.concurrency import fan_out_scan
from spotify_tags_etl_spark.sources.tpch import load_table

#: Per-language sampling rates (stratified): lang → keep fraction.
SAMPLE_RATES: dict[str, float] = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.1}
DEFAULT_RATE = 0.05

#: train/val/test split fractions (cumulative bucket edges).
SPLIT_EDGES = (("train", 0.8), ("val", 0.9), ("test", 1.0))

from spotify_tags_etl_spark.functions.hashing import BUCKET_DENOM as _BUCKET_DENOM  # noqa: F401
from spotify_tags_etl_spark.functions.hashing import hash_frac as _hash_frac
from spotify_tags_etl_spark.functions.hashing import hash_frac_sql as _hash_frac_sql


def stratified_sample(df: DataFrame, stratum_col: str, key_col: str, rates: dict[str, float]) -> DataFrame:
    """Keep a per-stratum fraction of rows, chosen by key hash (stable
    under reruns, repartitions, and engine changes — unlike ``rand()`` or
    ``df.sample``)."""
    rate = F.lit(DEFAULT_RATE)
    for stratum, r in rates.items():
        rate = F.when(F.col(stratum_col) == stratum, F.lit(r)).otherwise(rate)
    return df.where(_hash_frac(F.col(key_col)) < rate)


def train_val_test_split(df: DataFrame, key_col: str) -> DataFrame:
    """Assign each row a stable split label by key hash (80/10/10).

    The fallback is the LAST split, matching the oracle's CASE ELSE: a
    NULL key hashes to NULL frac, every `<` is NULL-false, and a
    NULL-default would leave such rows in NO split — silently lost from
    train, val, and test alike."""
    frac = _hash_frac(F.col(key_col))
    expr = F.lit(SPLIT_EDGES[-1][0])
    for name, edge in reversed(SPLIT_EDGES[:-1]):
        expr = F.when(frac < edge, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


@register(
    "tz01_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_hash_frac_sql('doc_id')} <
          CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 WHEN 'fr' THEN 0.25
                    WHEN 'es' THEN 0.1 ELSE {DEFAULT_RATE} END
    """,
    doc=(
        "Deterministic stratified sampling: per-language keep rates, "
        "membership by md5-bucket of doc_id — reproducible across runs, "
        "partition layouts, and engines; a scan-time narrow filter with "
        "no shuffle."
    ),
    tags=("training", "sampling"),
)
def tz01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", "doc_id", SAMPLE_RATES).select("doc_id", "lang", "source")


@register(
    "tz02_train_val_test_split",
    oracle=f"""
    WITH f AS (SELECT doc_id, lang, {_hash_frac_sql('doc_id')} AS frac FROM documents)
    SELECT doc_id, lang,
           CASE WHEN frac < 0.8 THEN 'train' WHEN frac < 0.9 THEN 'val' ELSE 'test' END AS split
    FROM f
    """,
    doc=(
        "Stable 80/10/10 train/val/test assignment by md5-bucket of the "
        "document key: a new document never moves an existing one between "
        "splits (no global sort, no rand); join-free, shuffle-free."
    ),
    tags=("training", "sampling"),
)
def tz02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return train_val_test_split(docs, "doc_id").select("doc_id", "lang", "split")


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------

TFIDF_TOP = 3
MIN_TERM_LEN = 3


def tfidf_top_terms(docs: DataFrame, k: int = TFIDF_TOP) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tokenize (lowercase, split on non-alpha runs, drop short tokens) →
    term counts per doc → document frequencies → idf = ln(N/df) →
    tf·idf → window top-k. The df table is vocabulary-sized — broadcast
    back to the term-count frame; both aggregations are partial-agg
    friendly.
    """
    n_docs = docs.select(F.countDistinct("doc_id")).collect()[0][0]
    terms = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
        )
        .where(F.length("term") >= MIN_TERM_LEN)
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_), "term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "rank", "tf", "df", F.round("tfidf", 6).alias("tfidf_r"))
    )


@register(
    "tz03_tfidf_top_terms",
    oracle=f"""
    WITH terms AS (
      SELECT doc_id, term
      FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
            FROM documents)
      WHERE length(term) >= {MIN_TERM_LEN}
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df, tf.tf * ln(n.n_docs / df.df) AS tfidf
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, rank, tf, df, ROUND(tfidf, 6) AS tfidf_r FROM (
      SELECT doc_id, term, tf, df, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
      FROM scored
    ) WHERE rank <= {TFIDF_TOP}
    """,
    doc=(
        "TF-IDF top-3 terms per document: explode-tokenize, two partial-"
        "agg-friendly aggregations, vocabulary broadcast join, window "
        "top-k with term tiebreak."
    ),
    tags=("training", "text"),
)
def tz03(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# deterministic shard planning
# ---------------------------------------------------------------------------

N_SHARDS = 16
#: Knuth multiplicative constant — pure 64-bit integer math, so the shard
#: assignment is identical in any engine (no engine hash function).
_KNUTH = 2654435761
_MOD32 = 1 << 32


def shard_of(key) -> F.Column:
    """Deterministic shard id in [0, N_SHARDS) from an integer key."""
    return ((key * F.lit(_KNUTH)) % F.lit(_MOD32) % F.lit(N_SHARDS)).cast("bigint")


def shard_plan(docs: DataFrame) -> DataFrame:
    """Training-export shard layout: assign every document a stable shard
    by multiplicative hash of its key and report per-shard row/byte
    totals. The assignment column is what a writer would pass to
    ``repartition(N_SHARDS, col)`` + ``write.partitionBy`` — shards are
    balanced (multiplicative hashing scatters sequential ids), stable
    across runs, and engine-independent. The plan query itself is one
    partial-agg shuffle with N_SHARDS groups — negligible at any scale."""
    return (
        docs.groupBy(shard_of(F.col("doc_id")).alias("shard"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("shard")
    )


@register(
    "tz04_shard_plan",
    oracle=f"""
    SELECT (doc_id * {_KNUTH}) % {_MOD32} % {N_SHARDS} AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY shard ORDER BY shard
    """,
    doc=(
        f"Deterministic {N_SHARDS}-way shard plan for training export: "
        "Knuth-multiplicative hash of doc_id (engine-independent integer "
        "math), per-shard row and byte totals; the layout key for "
        "repartition + partitionBy writes."
    ),
    tags=("training", "layout"),
)
def tz04(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_plan(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chop)
# ---------------------------------------------------------------------------

PACK_BUDGET = 512  # tokens per packed sequence


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Concat-and-chop sequence packing: within each shard, documents are
    laid end-to-end in stable doc_id order; a document's bin is its start
    offset DIV budget — the standard LLM pretraining packing, made
    distributed: ONE window cumsum per shard partition (running state
    O(1)), no driver loop, deterministic across engines and reruns.

    At 100 TB each shard's prefix-sum is independent — the shard key IS
    the parallelism unit, and packing never shuffles document text, only
    the (id, token-count) manifest."""
    toks = docs.select(
        "doc_id",
        shard_of(F.col("doc_id")).alias("shard"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.withColumn("end_off", F.sum("n_tokens").over(w)).select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.col("end_off") - F.col("n_tokens")).alias("start_off"),
        ((F.col("end_off") - F.col("n_tokens")) / budget).cast("bigint").alias("bin"),
    )


@register(
    "tz05_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             (doc_id * 2654435761) % 4294967296 % 16 AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    offs AS (
      SELECT doc_id, shard, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           end_off - n_tokens AS start_off,
           (end_off - n_tokens) // {PACK_BUDGET} AS bin
    FROM offs
    """,
    doc=(
        "Concat-and-chop sequence packing: per-shard prefix sum of token "
        "counts in stable doc order; bin = start offset DIV budget. One "
        "window shuffle on the shard key; only the manifest moves, never "
        "document text."
    ),
    tags=("training", "layout"),
)
def tz05(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# train/eval decontamination
# ---------------------------------------------------------------------------

DECON_NGRAM = 5


def decontaminate(docs: DataFrame, n: int = DECON_NGRAM) -> DataFrame:
    """Flag train-split documents sharing any ``n``-word-gram with a
    test-split document — eval decontamination, the check every serious
    pretraining corpus runs.

    Join strategy is left to AQE: a REAL eval set is tiny and
    auto-broadcasts, but this self-contained fixture derives "test"
    from a hash bucket — O(corpus) grams, which must never be force-
    broadcast (terabytes at the 100 TB design point). Output is
    per-contaminated-doc with distinct offending-gram counts, so the
    downstream filter is a semi-join on doc_id."""
    frac = _hash_frac(F.col("doc_id"))
    # Docs with < n tokens contribute no grams. The pre-filter is load-
    # bearing: sequence(1, 0) in Spark is the DESCENDING [1, 0] (step
    # defaults to -1), so without it a short doc feeds slice(..., 0, n)
    # and the whole job dies with INVALID_PARAMETER_VALUE — while the
    # oracle's generate_series(1, 0) is empty. Filtering on both sides
    # makes the semantics identical and total.
    grams = (
        docs.where(F.size(F.split("text", " ")) >= n)
        .select(
            "doc_id",
            frac.alias("frac"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(split(text, ' ')) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(split(text, ' '), i, {n})))"
                )
            ).alias("g"),
        )
    )
    train_edge, test_edge = SPLIT_EDGES[0][1], SPLIT_EDGES[1][1]
    train = grams.where(F.col("frac") < train_edge).select("doc_id", "g").distinct()
    test = grams.where(F.col("frac") >= test_edge).select(F.col("g").alias("tg")).distinct()
    return (
        train.join(test, train["g"] == test["tg"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


@register(
    "tz06_decontaminate",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             {_hash_frac_sql('doc_id')} AS frac,
             unnest([array_to_string(toks[i : i + {DECON_NGRAM} - 1], ' ')
                     for i in generate_series(1, greatest(len(toks) - {DECON_NGRAM - 1}, 0))]) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    train AS (SELECT DISTINCT doc_id, gram FROM g WHERE frac < 0.8),
    test AS (SELECT DISTINCT gram FROM g WHERE frac >= 0.9)
    SELECT train.doc_id, COUNT(*) AS n_shared_grams
    FROM train JOIN test USING (gram)
    GROUP BY train.doc_id ORDER BY train.doc_id
    """,
    doc=(
        f"Eval decontamination: train-split docs sharing any {DECON_NGRAM}-"
        "word-gram with the test split, with distinct shared-gram counts. "
        "Test-side gram set broadcast (the eval set is always the small "
        "side); train side streams through the join."
    ),
    tags=("training", "quality"),
)
def tz06(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 §14: fan the single-split corpus out before the gram explode
    return decontaminate(fan_out_scan(load_table(spark, sf_dir, "documents"), "doc_id"))


# ---------------------------------------------------------------------------
# tz08 — contamination RATE audit (per-doc n-gram overlap measurement)
# ---------------------------------------------------------------------------
#
# tz06 answers "which train docs share ANY eval n-gram" (the removal
# list); auditors need the GRADED metric: what fraction of each doc's
# gram positions is eval-contaminated (the 13-gram-overlap style audit
# from the GPT-3/PaLM contamination appendices). Counting POSITIONS, not
# distinct grams, weights repeated contaminated spans honestly. The flag
# stays integer-exact (10*hits > positions ⇔ rate > 0.1) so no float
# threshold ever disagrees across engines.


def contamination_rate(docs: DataFrame, n: int = DECON_NGRAM) -> DataFrame:
    """Per-train-doc eval-overlap rate: positions whose ``n``-gram occurs
    anywhere in the test split / total gram positions. Shares tz06's
    gram pipeline; the distinct eval-gram side is AQE-sized (real eval
    sets broadcast; this fixture's hash-bucket one must not be forced).
    Zero-gram docs (< n tokens) are re-attached with NULL rate and a
    FALSE flag — absence of evidence, not contamination."""
    frac = _hash_frac(F.col("doc_id"))
    grams = (
        docs.where(F.size(F.split("text", " ")) >= n)
        .select(
            "doc_id",
            frac.alias("frac"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(split(text, ' ')) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(split(text, ' '), i, {n})))"
                )
            ).alias("g"),
        )
    )
    train_edge, test_edge = SPLIT_EDGES[0][1], SPLIT_EDGES[1][1]
    train_g = grams.where(F.col("frac") < train_edge).select("doc_id", "g")
    test = grams.where(F.col("frac") >= test_edge).select(F.col("g").alias("tg")).distinct()
    hits = (
        train_g.join(test, train_g["g"] == test["tg"], "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("tg").isNotNull(), 1).otherwise(0)).alias("n_hit"),
        )
    )
    train_docs = docs.where(frac < train_edge).select("doc_id")
    return (
        train_docs.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            F.round(
                F.col("n_hit").cast("double") / F.nullif(F.col("n_grams"), F.lit(0)), 6
            ).alias("contam_r"),
            (F.lit(10) * F.coalesce("n_hit", F.lit(0)) > F.coalesce("n_grams", F.lit(0))).alias(
                "contaminated"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "tz08_contamination_rate",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             {_hash_frac_sql('doc_id')} AS frac,
             unnest([array_to_string(toks[i : i + {DECON_NGRAM} - 1], ' ')
                     for i in generate_series(1, greatest(len(toks) - {DECON_NGRAM - 1}, 0))]) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    test AS (SELECT DISTINCT gram AS tg FROM g WHERE frac >= 0.9),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN t.tg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      FROM (SELECT doc_id, gram FROM g WHERE frac < 0.8) tg_
      LEFT JOIN test t ON tg_.gram = t.tg
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_grams, 0) AS n_grams,
           COALESCE(h.n_hit, 0) AS n_hit,
           ROUND(CAST(h.n_hit AS DOUBLE) / NULLIF(h.n_grams, 0), 6) AS contam_r,
           10 * COALESCE(h.n_hit, 0) > COALESCE(h.n_grams, 0) AS contaminated
    FROM (SELECT doc_id FROM documents WHERE {_hash_frac_sql('doc_id')} < 0.8) d
    LEFT JOIN hits h USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc=(
        f"Per-doc contamination rate: fraction of a train doc's "
        f"{DECON_NGRAM}-word-gram POSITIONS found anywhere in the test "
        "split, with an integer-exact >10% flag. The graded audit "
        "companion to tz06's binary removal list."
    ),
    tags=("training", "quality"),
)
def tz08(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 §14: fan the single-split corpus out before the gram explodes
    return contamination_rate(fan_out_scan(load_table(spark, sf_dir, "documents"), "doc_id"))


# ---------------------------------------------------------------------------
# tz07 — target-mixture sampling (data mixing)
# ---------------------------------------------------------------------------
#
# Training corpora are blended to a TARGET mixture over domains ("3 parts
# web : 2 parts books : 1 part everything else"), not sampled at the raw
# corpus proportions. Given integer relative weights per source, compute
# per-source accept rates against a global budget and keep a row iff its
# key-hash fraction clears the rate — fully deterministic, no rand().
# Integer weights keep the weight total exact; every double op after that
# is a single same-order IEEE expression in both engines.

#: relative mixture weights (integers — exact total in any sum order);
#: sources not listed get weight 1.
MIX_WEIGHTS: dict[str, int] = {"src0": 4, "src1": 3, "src2": 2}
#: overall sampling budget as a fraction of the corpus
MIX_BUDGET_FRAC = 0.4


def _mix_weight(col) -> F.Column:
    expr = F.lit(1)
    for s, w in sorted(MIX_WEIGHTS.items()):
        expr = F.when(col == s, F.lit(w)).otherwise(expr)
    return expr


def mixture_sample(docs: DataFrame, stratum_col: str = "source", key_col: str = "doc_id") -> DataFrame:
    """Deterministic mixture sampler: accept rate per stratum is
    ``least(1, (w_s * N / W) / count_s)`` with N = floor(budget_frac *
    total).

    The per-stratum counts are an O(#strata) aggregate collected to the
    driver (the Spark-idiomatic "small stats feed the plan" move — same
    shape as AQE's runtime stats), and the rates come back as a literal
    when-ladder fused into the scan. The corpus therefore makes exactly
    ONE pass, with zero exchanges of doc rows (pinned by the plan test;
    the naive all-DataFrame formulation re-evaluates the counts subtree
    and scans the corpus three times). Rate arithmetic is the same
    single left-associated IEEE expression the oracle uses, on exact
    integer inputs, so driver-side Python doubles match DuckDB's."""
    import math

    counts = {
        r[0]: r[1] for r in docs.groupBy(stratum_col).agg(F.count("*").alias("_c")).collect()
    }
    n_total = sum(counts.values())
    weights = {stratum: MIX_WEIGHTS.get(stratum, 1) for stratum in counts}
    w_total = sum(weights.values())
    budget = float(math.floor(MIX_BUDGET_FRAC * n_total))
    rate_expr = F.lit(None).cast("double")
    for stratum in sorted(counts):
        rate = min(1.0, weights[stratum] * budget / w_total / counts[stratum])
        rate_expr = F.when(F.col(stratum_col) == stratum, F.lit(rate)).otherwise(rate_expr)
    return (
        docs.withColumn("_rate", rate_expr)
        .where(_hash_frac(F.col(key_col)) < F.col("_rate"))
        .select(key_col, stratum_col, F.round("_rate", 6).alias("rate_r"))
        .orderBy(key_col)
    )


def _mix_weight_sql(expr: str) -> str:
    cases = " ".join(f"WHEN '{s}' THEN {w}" for s, w in sorted(MIX_WEIGHTS.items()))
    return f"CASE {expr} {cases} ELSE 1 END"


@register(
    "tz07_mixture_sample",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS c, {_mix_weight_sql('source')} AS w
      FROM documents GROUP BY source
    ),
    totals AS (SELECT SUM(c) AS n_total, SUM(w) AS w_total FROM counts),
    rates AS (
      SELECT source,
             LEAST(1.0, CAST(w AS DOUBLE) * CAST(FLOOR({MIX_BUDGET_FRAC} * n_total) AS DOUBLE)
                        / w_total / c) AS rate
      FROM counts, totals
    )
    SELECT d.doc_id, d.source, ROUND(r.rate, 6) AS rate_r
    FROM documents d JOIN rates r USING (source)
    WHERE {_hash_frac_sql('d.doc_id')} < r.rate
    ORDER BY d.doc_id
    """,
    doc=(
        "Data mixing: deterministic per-source sampling to a target "
        "mixture (integer relative weights, hash-threshold accept, "
        "global budget = 40% of corpus). The mixture spec and rates are "
        "O(#sources) broadcasts; the corpus scans once."
    ),
    tags=("training", "sampling"),
)
def tz07(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_sample(load_table(spark, sf_dir, "documents"))


#: xi01 target sample size (number of systematic strides across the
#: total weight).
PPS_TARGET = 100


def pps_systematic_sample(docs: DataFrame, n: int = PPS_TARGET) -> DataFrame:
    """Probability-proportional-to-size systematic sample: lay ``n``
    equally-spaced picks across the cumulative weight axis (weight =
    ``n_chars``) and keep every document whose weight interval contains
    a pick, with its multiplicity. Exact integer arithmetic end-to-end
    (stride/offset by integer DIV), so the sample is identical across
    engines, retries, and layouts — the property rand()-based weighted
    sampling cannot give an incremental pipeline. Oversized documents
    legitimately receive multiplicity > 1 (classic PPS semantics).

    Scale shape: the cumulative-weight axis rides
    ``scalerank.prefix_sum`` (range-partitioned parallel running sum +
    broadcast partition offsets — NO single-reducer window), and the
    total weight falls out of the same statistics pass, so stride and
    offset become plan literals instead of a crossJoin'd 1-row frame.
    """
    from .scalerank import prefix_sum

    w = docs.select("doc_id", F.col("n_chars").alias("w"))
    cw, tw = prefix_sum(w, [F.col("doc_id").asc()], "w", sum_col="cw")
    stride = tw // n
    off = stride // 2

    def picks(x: str) -> str:
        return f"(CASE WHEN {x} >= {off} THEN ({x} - {off}) DIV {stride} + 1 ELSE 0 END)"

    m = f"{picks('(cw - 1)')} - {picks('(cw - w - 1)')}"
    return (
        cw.withColumn("multiplicity", F.expr(m))
        .where(F.col("multiplicity") > 0)
        .select("doc_id", "w", "multiplicity")
    )


@register(
    "xi01_pps_systematic_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, n_chars AS w,
             SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cw
      FROM documents
    ),
    par AS (
      SELECT SUM(n_chars) // {PPS_TARGET} AS stride,
             (SUM(n_chars) // {PPS_TARGET}) // 2 AS off
      FROM documents
    )
    SELECT doc_id, w, multiplicity FROM (
      SELECT doc_id, w,
        CAST((CASE WHEN cw - 1 >= off THEN (cw - 1 - off) // stride + 1 ELSE 0 END)
        - (CASE WHEN cw - w - 1 >= off THEN (cw - w - 1 - off) // stride + 1 ELSE 0 END)
          AS BIGINT) AS multiplicity
      FROM w CROSS JOIN par
    ) WHERE multiplicity > 0
    """,
    doc=(
        "Deterministic weighted (PPS) sampling for training-data "
        "curation: systematic picks along the exact cumulative-weight "
        "axis — each document's selection probability is proportional "
        "to its size, with no rand() anywhere, so the drawn set is "
        "stable under retries, repartitions, and engine swaps "
        "(stratified-rate cousin: tz01; quality-weighted mixing "
        "cousin: tz07). Shape: the cumulative-weight axis is "
        "scalerank.prefix_sum — the two-pass range-partitioned "
        "prefix sum (per-partition subtotals collected once, "
        "partition offsets fused back as broadcast literals, running "
        "sum PARALLEL per partition) — so no stage funnels the corpus "
        "through one reducer; stride/offset are plan literals from "
        "the same statistics pass. The single-reducer window lives "
        "only in the oracle, which proves the rewrite hash-neutral."
    ),
    tags=("training", "sampling", "deterministic"),
)
def xi01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pps_systematic_sample(load_table(spark, sf_dir, "documents"))


#: xn02: per-source budget fraction kept (9/10), as an exact ratio.
BUDGET_NUM, BUDGET_DEN = 9, 10


@register(
    "xn02_token_budget_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n_chars) OVER (PARTITION BY source) AS total
      FROM documents
    )
    SELECT source, doc_id, n_chars, CAST(cum AS BIGINT) AS cum
    FROM ranked
    WHERE {BUDGET_DEN} * (cum - n_chars) < {BUDGET_NUM} * total
    """,
    doc=(
        "Per-source token-budget cap: each source keeps its largest "
        "documents, greedily filled until 90% of the source's total "
        "char budget is reached (the doc crossing the boundary is "
        "kept; everything after is trimmed). The deterministic "
        "budget-capping half of data mixing — tz07 hits target "
        "mixture RATES by hash sampling; this enforces absolute "
        "BUDGETS with a stable greedy order (n_chars desc, doc_id "
        "tiebreak), so re-runs keep byte-identical corpora. Exact "
        "integer cross-multiplication for the 9/10 boundary — no "
        "float shares. Shape: ONE shuffle on source (both window "
        "passes share the partitioning; the per-source total is a "
        "frame-unbounded window over the same exchange). Source "
        "cardinality is low → skewed reducers; at 100 TB pre-compute "
        "per-source totals as an O(#sources) broadcast and the cumsum "
        "becomes the only wide pass (AQE skew-split handles the rest)."
    ),
    tags=("training", "sampling", "budget"),
)
def xn02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w_ord = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.sum("n_chars").over(w_ord).alias("cum"),
        F.sum("n_chars").over(w_all).alias("total"),
    )
    return ranked.where(
        F.lit(BUDGET_DEN) * (F.col("cum") - F.col("n_chars"))
        < F.lit(BUDGET_NUM) * F.col("total")
    ).select("source", "doc_id", "n_chars", "cum")


#: xi02 temporal split: test = last 7 days, embargo gap = 2 days.
SPLIT_TEST_DAYS, SPLIT_EMBARGO_DAYS = 7, 2
_DAY_US_T = 86_400 * 1_000_000


@register(
    "xi02_temporal_embargo_split",
    oracle=f"""
    WITH bounds AS (
      SELECT MAX(epoch_us(ts)) // {_DAY_US_T} AS max_day FROM events
    ),
    labeled AS (
      SELECT e.event_id, e.user_id,
             CASE
               WHEN epoch_us(e.ts) // {_DAY_US_T} > b.max_day - {SPLIT_TEST_DAYS}
                 THEN 'test'
               WHEN epoch_us(e.ts) // {_DAY_US_T}
                    > b.max_day - {SPLIT_TEST_DAYS + SPLIT_EMBARGO_DAYS}
                 THEN 'embargo'
               ELSE 'train'
             END AS split
      FROM events e CROSS JOIN bounds b
    )
    SELECT split, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
    FROM labeled GROUP BY split
    """,
    doc=(
        "Temporal train/test split with an embargo gap: test = the "
        "last 7 event-days, train = everything at least 2 days older "
        "than the test window, the gap EXCLUDED from both — the "
        "leakage-hygiene split for forecasting/ranking models where "
        "tz02's hash split would leak future signal through "
        "time-correlated rows (and through windowed features that "
        "straddle the boundary — the embargo is what absorbs feature "
        "lookback). Boundary from a 1-row max aggregate fused back "
        "as a literal comparison; the labeling is a narrow scan-time "
        "CASE — at 100 TB it prunes to partition predicates on the "
        "date key. Split census output; the labeled frame itself is "
        "the narrow projection."
    ),
    tags=("training", "split", "eventtime"),
)
def xi02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tags_etl_spark.sources.tpch import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    bounds = ev.agg(F.expr(f"MAX(unix_micros(ts)) DIV {_DAY_US_T}").alias("max_day"))
    day = F.expr(f"unix_micros(ts) DIV {_DAY_US_T}")
    split = (
        F.when(day > F.col("max_day") - SPLIT_TEST_DAYS, "test")
        .when(day > F.col("max_day") - (SPLIT_TEST_DAYS + SPLIT_EMBARGO_DAYS), "embargo")
        .otherwise("train")
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select("event_id", "user_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# xu02 — Bloom-filter decontamination gate
# ---------------------------------------------------------------------------

#: Bloom geometry: 4096 bits, 3 portable hash positions per gram.
BLOOM_BITS = 4096
BLOOM_K = 3


def _bloom_pos_spark(k: F.Column, gram: F.Column) -> F.Column:
    h = F.md5(F.concat_ws(":", k.cast("string"), gram))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % F.lit(BLOOM_BITS)).alias("pos")


def _bloom_pos_sql(k: str, gram: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({k} AS VARCHAR) || ':' || {gram}), 1, 8))::UBIGINT "
        f"% {BLOOM_BITS} AS BIGINT)"
    )


def bloom_decontaminate(docs: DataFrame, n: int = DECON_NGRAM) -> DataFrame:
    """tz06's eval-decontamination with the test side compressed to a
    Bloom filter: instead of joining train grams against the distinct
    test-gram SET (O(|test grams|) state), set ``BLOOM_K`` md5-derived
    bit positions per test gram and flag a train gram iff ALL its
    positions are set. Guaranteed superset of the exact tz06 result
    (no false negatives; false-positive rate ~(1-e^{-kn/m})^k), and
    bit-deterministic across engines because the positions come from
    the portable md5 idiom — which is what makes the *approximation
    itself* testable against a SQL oracle.

    Scale story: the filter is ``BLOOM_BITS`` bits regardless of eval-
    set size — at 100 TB the set-membership join (terabytes of state)
    becomes a broadcast bitmap probed at scan time, the same mechanism
    as Spark's own runtime bloom-pushdown (xb01 is the row-level
    cousin). Here the bitmap is an explicit ≤4096-row position table
    broadcast into the probe join so the structure is inspectable and
    oracle-checkable; ``might_contain`` over a packed binary is the
    drop-in production form.
    """
    frac = _hash_frac(F.col("doc_id"))
    grams = (
        docs.where(F.size(F.split("text", " ")) >= n)
        .select(
            "doc_id",
            frac.alias("frac"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(split(text, ' ')) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(split(text, ' '), i, {n})))"
                )
            ).alias("g"),
        )
    )
    train_edge, test_edge = SPLIT_EDGES[0][1], SPLIT_EDGES[1][1]
    ks = F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("k")
    bits = (
        grams.where(F.col("frac") >= test_edge)
        .select(F.col("g").alias("tg"))
        .distinct()
        .select("tg", ks)
        .select(_bloom_pos_spark(F.col("k"), F.col("tg")))
        .distinct()
    )
    probe = (
        grams.where(F.col("frac") < train_edge)
        .select("doc_id", "g")
        .distinct()
        .select("doc_id", "g", ks)
        .select("doc_id", "g", "k", _bloom_pos_spark(F.col("k"), F.col("g")))
    )
    hits = (
        probe.join(F.broadcast(bits), "pos")
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("nset"))
        .where(F.col("nset") == BLOOM_K)
    )
    return hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_maybe_grams")).orderBy("doc_id")


@register(
    "xu02_bloom_decontaminate",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             {_hash_frac_sql('doc_id')} AS frac,
             unnest([array_to_string(toks[i : i + {DECON_NGRAM} - 1], ' ')
                     for i in generate_series(1, greatest(len(toks) - {DECON_NGRAM - 1}, 0))]) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    ks AS (SELECT unnest(range({BLOOM_K})) AS k),
    bits AS (
      SELECT DISTINCT {_bloom_pos_sql('ks.k', 't.gram')} AS pos
      FROM (SELECT DISTINCT gram FROM g WHERE frac >= 0.9) t CROSS JOIN ks
    ),
    probe AS (
      SELECT t.doc_id, t.gram, ks.k, {_bloom_pos_sql('ks.k', 't.gram')} AS pos
      FROM (SELECT DISTINCT doc_id, gram FROM g WHERE frac < 0.8) t CROSS JOIN ks
    ),
    hits AS (
      SELECT doc_id, gram
      FROM probe JOIN bits USING (pos)
      GROUP BY doc_id, gram
      HAVING COUNT(*) = {BLOOM_K}
    )
    SELECT doc_id, COUNT(*) AS n_maybe_grams FROM hits GROUP BY doc_id ORDER BY doc_id
    """,
    doc=(
        "Bloom-compressed eval decontamination: train docs whose "
        f"{DECON_NGRAM}-grams fully hit the {BLOOM_BITS}-bit/"
        f"{BLOOM_K}-hash filter built from the test split — the "
        "constant-memory superset gate in front of tz06's exact join "
        "(false positives re-checked exactly downstream, never false "
        "negatives). Positions are portable md5 hashes, so the filter "
        "and its false-positive set are engine-reproducible."
    ),
    tags=("training", "quality", "sketch", "llm-pipeline"),
)
def xu02(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 §14: fan the single-split corpus out before the gram explodes
    return bloom_decontaminate(fan_out_scan(load_table(spark, sf_dir, "documents"), "doc_id"))


# ---------------------------------------------------------------------------
# xi04 — deterministic curriculum ordering (difficulty-interleaved)
# ---------------------------------------------------------------------------

#: Number of difficulty tiles the curriculum round-robins through.
CURRICULUM_TILES = 10

#: Knuth multiplicative hash (same constant as tz04's shard assignment) —
#: engine-independent integer scatter for the within-tile shuffle.
_KNUTH = 2654435761


@register(
    "xi04_curriculum_order",
    oracle=f"""
    WITH tiled AS (
      SELECT doc_id,
             NTILE({CURRICULUM_TILES}) OVER (ORDER BY n_chars, doc_id) AS tile,
             (doc_id * {_KNUTH}) % 4294967296 AS h
      FROM documents
    ),
    rn AS (
      SELECT doc_id, tile,
             ROW_NUMBER() OVER (PARTITION BY tile ORDER BY h, doc_id) AS r
      FROM tiled
    )
    SELECT doc_id, tile, (r - 1) * {CURRICULUM_TILES} + tile AS ord
    FROM rn ORDER BY ord, doc_id
    """,
    doc=(
        "Deterministic curriculum ordering: documents split into "
        f"{CURRICULUM_TILES} difficulty tiles (n_chars as the "
        "difficulty proxy, total-order tiebreak), shuffled WITHIN each "
        "tile by the engine-independent Knuth multiplicative hash, "
        "then interleaved round-robin — every training window sees "
        "the full difficulty spectrum, yet the byte order of the "
        "epoch is a pure function of the corpus (re-runs, retries, "
        "and engine swaps read the same sequence; the property a "
        "rand() shuffle cannot give a resumable trainer). Both ranking "
        "passes are SCALE-SAFE (operators/scalerank.py — range-"
        "repartition + parallel per-partition row_number + broadcast "
        "offsets; no single-reducer window, and no PARTITION BY tile "
        f"either, which would funnel the corpus through "
        f"{CURRICULUM_TILES} reducers): the tile comes from the closed-"
        "form NTILE bucket of the first global rank, and the WITHIN-"
        "tile rank is the second global rank over (tile, h, doc_id) "
        "minus the tile's closed-form start offset — tile sizes are a "
        "pure function of N and k, so no per-tile count pass is "
        "needed. Slots between tz07's mixture sampling and tz05's "
        "sequence packing in a full curriculum pipeline."
    ),
    tags=("training", "ordering", "llm-pipeline"),
)
def xi04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scalerank import global_rank, ntile_expr, tile_start

    docs = load_table(spark, sf_dir, "documents")
    ranked, n_rows = global_rank(
        docs.select("doc_id", "n_chars"), ["n_chars", "doc_id"], rank_col="_rk1"
    )
    tiled = ranked.select(
        "doc_id",
        ntile_expr("_rk1", n_rows, CURRICULUM_TILES).alias("tile"),
        F.expr(f"(doc_id * {_KNUTH}) % 4294967296").alias("h"),
    )
    # Within-tile rank without a PARTITION BY tile window: global rank
    # over (tile, h, doc_id) minus the tile's start offset — exact NTILE
    # sizes make the offset a closed-form expression of (N, k).
    reranked, _ = global_rank(tiled, ["tile", "h", "doc_id"], rank_col="_rk2")
    rn = reranked.withColumn(
        "r", F.col("_rk2") - tile_start(n_rows, CURRICULUM_TILES, "tile")
    )
    return rn.select(
        "doc_id",
        "tile",
        ((F.col("r") - 1) * CURRICULUM_TILES + F.col("tile")).alias("ord"),
    ).orderBy("ord", "doc_id")


# ---------------------------------------------------------------------------
# xz10 — greedy set-cover corpus selection (coverage-maximizing subset)
# ---------------------------------------------------------------------------

#: Greedy rounds (documents selected).
COVER_ROUNDS = 5


def _cover_oracle_sql(rounds: int = COVER_ROUNDS) -> str:
    ctes = [
        '''toks AS (
      SELECT DISTINCT doc_id,
             unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 2
    )'''
    ]
    picked_union = None
    cov = None
    for r in range(1, rounds + 1):
        if r == 1:
            gain_src = "SELECT doc_id, COUNT(*) AS gain FROM toks GROUP BY doc_id"
        else:
            gain_src = f"""SELECT t.doc_id, COUNT(*) AS gain
          FROM toks t
          WHERE t.tok NOT IN (SELECT tok FROM cov{r - 1})
            AND t.doc_id NOT IN ({picked_union})
          GROUP BY t.doc_id"""
        ctes.append(
            f"""r{r} AS (
      SELECT {r} AS round, doc_id, gain
      FROM ({gain_src}) g
      ORDER BY gain DESC, doc_id LIMIT 1
    )"""
        )
        picked_union = " UNION ALL ".join(f"SELECT doc_id FROM r{i}" for i in range(1, r + 1))
        cov = f"""cov{r} AS (
      SELECT DISTINCT tok FROM toks WHERE doc_id IN ({picked_union})
    )"""
        ctes.append(cov)
    sel = " UNION ALL ".join(f"SELECT * FROM r{i}" for i in range(1, rounds + 1))
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT p.round, p.doc_id, p.gain,
           (SELECT COUNT(*) FROM cov{rounds}) AS final_covered
    FROM ({sel}) p ORDER BY p.round"""
    )


@register(
    "xz10_greedy_cover",
    oracle=_cover_oracle_sql(),
    doc=(
        f"Greedy set-cover corpus selection: {COVER_ROUNDS} rounds, each "
        "picking the document adding the most NOT-yet-covered bigrams "
        "(marginal-gain argmax, doc_id tiebreak) — the classic "
        "(1-1/e)-approximate coverage/facility-location selection that "
        "underlies diversity-driven data curation. Spark loop per "
        "round: anti-join against the covered-token set, map-combined "
        "gain aggregate, 1-ROW argmax collect to fuse the pick into "
        "the next plan (the tz07 plan-feeding pattern — O(rounds) "
        "driver rows total, never data), covered set re-derived and "
        "localCheckpointed. At 100 TB the anti-join probe is the only "
        "wide op per round and the covered set stays a token-distinct "
        "frame — lazy-greedy/priority-queue variants change the pick "
        "schedule, not this data path. Oracle: the same greedy "
        "unrolled as nested CTEs."
    ),
    tags=("training", "selection", "llm-pipeline"),
)
def xz10(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.split("text", " ").alias("t"))
        .where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(t) - 1),"
                        " i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"
                    )
                )
            ).alias("tok"),
        )
    )
    toks = toks.localCheckpoint(eager=True)  # 5 rounds re-probe this; derive once
    picked: list[int] = []
    rows: list[tuple[int, int, int]] = []
    covered = None
    for r in range(1, COVER_ROUNDS + 1):
        cand = toks if covered is None else toks.join(covered, "tok", "left_anti")
        if picked:
            cand = cand.where(~F.col("doc_id").isin(picked))
        hit = (
            cand.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.desc("gain"), F.asc("doc_id"))
            .limit(1)
            .collect()
        )
        if not hit:
            # vocabulary exhausted before the round budget: every
            # remaining doc's token rows all dropped in the anti-join —
            # greedy is done. The oracle's r{r} CTE goes empty the same
            # way, so both sides emit the same truncated round list.
            break
        top = hit[0]
        picked.append(int(top.doc_id))
        rows.append((r, int(top.doc_id), int(top.gain)))
        # r13 (guide §1.2): the covered set grows INCREMENTALLY — union
        # the new pick's tokens into the previous checkpoint instead of
        # re-deriving from all picked docs (one toks probe per round,
        # not r of them), and checkpoint LAZILY so the next round's
        # anti-join materializes it as a side effect (bpe_learn's fused
        # one-job-per-round shape; 11 driver jobs -> 6).
        new_toks = toks.where(F.col("doc_id") == int(top.doc_id)).select("tok")
        covered = (
            new_toks if covered is None else covered.unionByName(new_toks)
        ).distinct().localCheckpoint(eager=False)
    final_covered = covered.count()
    return spark.createDataFrame(
        [(r, d, g, final_covered) for r, d, g in rows],
        "round int, doc_id long, gain long, final_covered long",
    )


# ---------------------------------------------------------------------------
# xi05 — importance reweighting to a target language mixture
# ---------------------------------------------------------------------------

#: Target language shares in ppm (must sum to 1e6): the uniform-ish
#: mixture a multilingual training run wants, vs the corpus's skew.
TARGET_MIX_PPM = {"en": 400_000, "de": 200_000, "fr": 200_000, "es": 100_000, "pt": 100_000}


def _mix_case_sql(col: str = "d.lang") -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in TARGET_MIX_PPM.items())
    return f"CASE {col} {whens} ELSE 0 END"


@register(
    "xi05_importance_reweight",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS total FROM documents),
    share AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang AS lang,
           CAST(({_mix_case_sql()} * n.total) // (1000000 * s.cnt) * 1000000
                + ((({_mix_case_sql()} * n.total) % (1000000 * s.cnt)) * 1000000)
                  // (1000000 * s.cnt) AS BIGINT) AS weight_ppm
    FROM documents d
    JOIN share s ON s.lang = d.lang
    CROSS JOIN n
    ORDER BY d.doc_id
    """,
    doc=(
        "Importance reweighting to a target language mixture: each "
        "document's loss weight = target_share / observed_share as "
        "integer ppm (exact two-step long division — the weight is "
        "target_ppm*total / (1e6*cnt_lang), computed quotient-then-"
        "remainder so nothing overflows and no float appears). The "
        "WEIGHTING counterpart of tz07's mixture SAMPLING: sampling "
        "changes the corpus, reweighting changes the loss — both "
        "driven by the same O(#strata) share statistics, here joined "
        "back as a broadcast instead of fused as a when-ladder, "
        "because every row gets a value (no filtering). Weights are "
        "a pure function of (lang, corpus counts): retry/layout/"
        "engine-invariant by construction."
    ),
    tags=("training", "weighting", "llm-pipeline"),
)
def xi05(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    total = docs.agg(F.count(F.lit(1)).alias("total"))
    share = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    tgt = F.element_at(
        F.create_map(*[F.lit(x) for kv in TARGET_MIX_PPM.items() for x in kv]),
        F.col("lang"),
    )
    return (
        docs.select("doc_id", "lang")
        .join(F.broadcast(share), "lang")
        .crossJoin(F.broadcast(total))
        .withColumn("tgt_ppm", F.coalesce(tgt, F.lit(0)).cast("bigint"))
        .select(
            "doc_id",
            "lang",
            F.expr(
                "CAST((tgt_ppm * total) DIV (1000000 * cnt) * 1000000"
                " + (((tgt_ppm * total) % (1000000 * cnt)) * 1000000)"
                " DIV (1000000 * cnt) AS BIGINT)"
            ).alias("weight_ppm"),
        )
        .orderBy("doc_id")
    )
