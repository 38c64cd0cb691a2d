"""Text analysis operators for training-data pipelines.

Language-ID (marker-n-gram heuristic), quality scoring, token counting,
and document fingerprinting — all built-in column expressions (JVM-side,
whole-stage codegen); no UDFs. Each has a DuckDB oracle.

Determinism notes: counts are integers; ratios are single double
divisions of identical integer inputs (no accumulation, no rounding) —
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.functions.concurrency import fan_out_scan
from spotify_tags_etl_spark.sources.tpch import load_table

#: language → marker words (padded match on ' word ').
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "das", "ist"),
    "fr": ("le", "et", "les", "est"),
    "es": ("el", "y", "los", "es"),
}
_LANG_ORDER = ("en", "de", "fr", "es")


def _hits(padded, word: str):
    """Occurrences of ' word ' via length-difference (builtin-only trick)."""
    token = f" {word} "
    return (F.length(padded) - F.length(F.replace(padded, F.lit(token), F.lit("")))) / len(token)


def _hits_sql(padded: str, word: str) -> str:
    token = f" {word} "
    return f"(length({padded}) - length(replace({padded}, '{token}', ''))) / {len(token)}"


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language from marker-word frequency; 'und' (undetermined)
    when no marker hits. Ties break by fixed language priority."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scored = df.withColumns(
        {f"s_{lang}": sum(_hits(padded, w) for w in ws).cast("bigint") for lang, ws in LANG_MARKERS.items()}
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in _LANG_ORDER])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in _LANG_ORDER:  # first max in priority order wins
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return scored.withColumn("pred_lang", pred)


def _lang_id_oracle() -> str:
    padded = "(' ' || text || ' ')"
    scores = ",\n           ".join(
        f"CAST({' + '.join(_hits_sql(padded, w) for w in ws)} AS BIGINT) AS s_{lang}"
        for lang, ws in LANG_MARKERS.items()
    )
    best = f"greatest({', '.join('s_' + lang for lang in _LANG_ORDER)})"
    case = " ".join(f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in _LANG_ORDER)
    return f"""
    WITH scored AS (
      SELECT doc_id, lang,
           {scores}
      FROM documents
    )
    SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
           CASE WHEN {best} <= 0 THEN 'und' {case} END AS pred_lang
    FROM scored
    """


@register(
    "tx01_lang_id",
    oracle=_lang_id_oracle(),
    doc="Marker-n-gram language ID: per-language stopword hit counts → argmax with fixed-priority tiebreak.",
    tags=("text",),
)
def tx01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return lang_id(docs).select("doc_id", "lang", "s_en", "s_de", "s_fr", "s_es", "pred_lang")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / word / punctuation / stopword features + a composite score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(t, " ")
    n_words = F.size(words)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    n_stop = sum(_hits(padded, w) for w in LANG_MARKERS["en"]).cast("bigint")
    return df.withColumns(
        {
            "n_chars_obs": n_chars,
            "n_words": n_words,
            "n_punct": n_punct,
            "n_stopwords": n_stop,
            "avg_word_len": (n_chars - (n_words - F.lit(1))) / n_words,
            "stopword_ratio": n_stop / n_words,
            "punct_ratio": n_punct / n_chars,
        }
    )


@register(
    "tx02_quality_score",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_obs,
           len(string_split(text, ' ')) AS n_words,
           length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
           CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
              + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' and ', ''))) / 5
              + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' of ', ''))) / 4
              + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' is ', ''))) / 4
             AS BIGINT) AS n_stopwords,
           (length(text) - (len(string_split(text, ' ')) - 1))
             / len(string_split(text, ' ')) AS avg_word_len
    FROM documents
    """,
    doc="Quality features: char/word/punct/stopword counts + mean word length (all codegen'd builtins).",
    tags=("text",),
)
def tx02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id", "n_chars_obs", "n_words", "n_punct", "n_stopwords", "avg_word_len"
    )


TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


@register(
    "tx03_token_count",
    oracle=rf"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS bpe_ish_tokens,
           length(text) / NULLIF(len(regexp_extract_all(text, '{TOKEN_PATTERN}')), 0) AS chars_per_token
    FROM documents
    """,
    doc=(
        "Token counting: whitespace tokens + a BPE-ish regex segmentation "
        "(letter runs / single digits / punctuation) — the standard cheap "
        "token estimator for LLM data budgeting."
    ),
    tags=("text",),
)
def tx03(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", F.lit(TOKEN_PATTERN), F.lit(0)))
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        bpe.alias("bpe_ish_tokens"),
        # NULLIF guard: an empty/whitespace-only doc has 0 tokens; the ratio
        # is NULL (not a DIVIDE_BY_ZERO abort on ANSI-on sessions, not inf).
        (F.length("text") / F.nullif(bpe, F.lit(0))).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: Patterns kept to the regex subset where Java (Spark) and RE2 (DuckDB)
#: agree: character classes, bounded/unbounded repetition — no lookaround,
#: no backrefs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONGNUM_RE = r"[0-9]{7,}"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact email addresses and long digit runs (phone/account-number
    shaped) from ``text_col``; adds per-row match counts and the redacted
    text. Narrow per-row transform — no shuffle, no UDF, scan-parallel at
    any scale; the regexes compile once per task, not per row."""
    t = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), LONGNUM_RE, "<NUM>"
    )
    return df.withColumns(
        {
            "n_emails": F.regexp_count(t, F.lit(EMAIL_RE)),
            "n_longnums": F.regexp_count(t, F.lit(LONGNUM_RE)),
            "redacted": red,
        }
    )


@register(
    "tx05_redact_pii",
    oracle=rf"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' reach user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or call '
                  || lpad(CAST((doc_id * 37) % 10000000 AS VARCHAR), 9, '7') AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{LONGNUM_RE}')) AS INT) AS n_longnums,
           length(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                 '{LONGNUM_RE}', '<NUM>', 'g')) AS redacted_len,
           md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{LONGNUM_RE}', '<NUM>', 'g')) AS redacted_md5
    FROM seeded
    """,
    doc=(
        "PII redaction: emails + 7-plus-digit runs replaced by typed "
        "placeholders, with per-row match counts. The fixture seeds one "
        "deterministic email + phone per row so both patterns are "
        "exercised; parity is checked on counts, redacted length, and "
        "md5 of the redacted text."
    ),
    tags=("text", "privacy"),
)
def tx05(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or call "),
            F.lpad(((F.col("doc_id") * 37) % 10000000).cast("string"), 9, "7"),
        ),
    )
    out = redact_pii(seeded)
    return out.select(
        "doc_id",
        "n_emails",
        "n_longnums",
        F.length("redacted").alias("redacted_len"),
        F.md5("redacted").alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# token-window chunking
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 8
CHUNK_STEP = 6  # overlap = CHUNK_TOKENS - CHUNK_STEP = 2 tokens


def chunk_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Split each document into overlapping ``CHUNK_TOKENS``-token windows
    every ``CHUNK_STEP`` tokens — the standard pre-embedding chunker for
    RAG / training pipelines. Pure narrow transform: tokenize once, build
    the start-offset array, posexplode — the 1→N row fan-out happens
    inside the scan stage, no shuffle; at 100 TB the output is written
    straight back out partition-local."""
    return (
        df.select("doc_id", F.split(F.col(text_col), " ").alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.posexplode(
                F.sequence(F.lit(1), F.size("toks"), F.lit(CHUNK_STEP))
            ).alias("chunk_idx", "st"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.least(F.lit(CHUNK_TOKENS), F.size("toks") - F.col("st") + 1)
            .cast("bigint")
            .alias("n_tokens"),
            F.array_join(F.slice("toks", F.col("st"), F.lit(CHUNK_TOKENS)), " ").alias(
                "chunk_text"
            ),
        )
    )


@register(
    "tx06_chunk_tokens",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         s AS (SELECT doc_id, toks,
                      unnest(generate_series(1, len(toks), {CHUNK_STEP})) AS st
               FROM t)
    SELECT doc_id,
           CAST((st - 1) // {CHUNK_STEP} AS BIGINT) AS chunk_idx,
           CAST(least({CHUNK_TOKENS}, len(toks) - st + 1) AS BIGINT) AS n_tokens,
           array_to_string(toks[st : st + {CHUNK_TOKENS} - 1], ' ') AS chunk_text
    FROM s
    """,
    doc=(
        f"Overlapping token-window chunking ({CHUNK_TOKENS}-token windows, "
        f"stride {CHUNK_STEP}): tokenize → start-offset array → posexplode. "
        "1→N fan-out stays inside the scan stage (no shuffle)."
    ),
    tags=("text", "chunking"),
)
def tx06(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_tokens(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# repetition-ratio quality filter
# ---------------------------------------------------------------------------

REPETITION_FLAG_RATIO = 0.2


def repetition_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filter: fraction of all word-bigrams taken
    by the single most frequent bigram. Boilerplate/spam scores high;
    clean prose low. Two partial-agg-friendly aggregations keyed on
    doc_id — the explode fan-out combines map-side before the shuffle, so
    shuffled bytes are O(distinct bigrams), not O(tokens)."""
    toks = df.select("doc_id", F.split(F.col(text_col), " ").alias("toks")).where(
        F.size("toks") >= 2
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("bg"),
    )
    counts = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("n"))
    return (
        counts.groupBy("doc_id")
        .agg(F.max("n").alias("top_bigram_n"), F.sum("n").alias("n_bigrams"))
        .withColumn("rep_ratio", F.col("top_bigram_n") / F.col("n_bigrams"))
        .withColumn("flagged", F.col("rep_ratio") > REPETITION_FLAG_RATIO)
    )


@register(
    "tx07_repetition_ratio",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         b AS (SELECT doc_id,
                      unnest([toks[i] || ' ' || toks[i + 1]
                              for i in generate_series(1, len(toks) - 1)]) AS bg
               FROM t WHERE len(toks) >= 2),
         c AS (SELECT doc_id, bg, COUNT(*) AS n FROM b GROUP BY doc_id, bg)
    SELECT doc_id, MAX(n) AS top_bigram_n, CAST(SUM(n) AS BIGINT) AS n_bigrams,
           CAST(MAX(n) AS DOUBLE) / SUM(n) AS rep_ratio,
           CAST(MAX(n) AS DOUBLE) / SUM(n) > {REPETITION_FLAG_RATIO} AS flagged
    FROM c GROUP BY doc_id
    """,
    doc=(
        "Repetition-ratio quality filter: top-bigram share of all word "
        "bigrams per document, flagged above "
        f"{REPETITION_FLAG_RATIO}. Map-side combine keeps the shuffle "
        "O(distinct bigrams)."
    ),
    tags=("text", "quality"),
)
def tx07(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_ratio(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "top_bigram_n", "n_bigrams", "rep_ratio", "flagged"
    )


@register(
    "tx04_fingerprint",
    oracle="""
    SELECT doc_id,
           list_min([md5(substr(text, i, 8)) for i in range(1, length(text) - 6)]) AS fingerprint
    FROM documents WHERE length(text) >= 8
    """,
    doc=(
        "Document fingerprint: min-hash over sliding char-8-grams (rolling-"
        "hash winnowing, window = whole doc). One row per doc; stable under "
        "small edits away from the minimizing gram."
    ),
    tags=("text", "sketch"),
)
def tx04(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") >= 8)
    grams = F.expr("transform(sequence(1, length(text) - 7), i -> md5(substring(text, i, 8)))")
    return docs.select("doc_id", F.array_min(grams).alias("fingerprint"))


# ---------------------------------------------------------------------------
# tx08 — corpus-frequency quality score (perplexity proxy)
# ---------------------------------------------------------------------------
#
# A document stuffed with tokens the corpus has never seen (mojibake,
# hashes, boilerplate IDs) scores badly under any LM; the cheap in-engine
# proxy is the MEAN CORPUS FREQUENCY of the document's tokens. Everything
# stays integer-exact until one final division, so the score is identical
# in any engine / partition order — no log(), whose libm low bits differ
# across runtimes.


def mean_token_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc mean corpus frequency of its tokens (BPE-ish segmentation,
    shared with tx03) + a rare-heavy flag: mean below HALF the global
    mean token frequency.

    Zero-token docs (empty / whitespace-only / NULL text) produce no
    exploded rows, so they are re-attached with a LEFT join and flagged
    rare_heavy outright — they are the degenerate documents the quality
    proxy most needs to surface, and silently dropping them would wave
    them through every downstream quality filter.

    The flag comparison runs on DECIMAL(38,0) cross-products (DuckDB
    sums bigints into HUGEINT, so the oracle is exact too): exact while
    2·s·gn stays under 10^38, i.e. corpora through ~10^15 tokens —
    int64 would already wrap near 3·10^7 tokens for a long doc heavy in
    the hottest zipfian token.

    Scale: the token→vocab join shuffles on the token key — zipfian-hot
    ("the") by construction; AQE skew-join splits those reducers. The
    vocab side is count(*) per token (map-combined)."""
    toks = docs.select(
        "doc_id", F.explode(F.regexp_extract_all(text_col, F.lit(TOKEN_PATTERN), F.lit(0))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    per_doc = (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("_s"), F.count("*").alias("_n"))
    )
    glob = per_doc.agg(F.sum("_s").alias("_gs"), F.sum("_n").alias("_gn"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(glob))
        .select(
            "doc_id",
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_toks"),
            F.round(F.col("_s").cast("double") / F.col("_n"), 6).alias("mean_freq_r"),
            F.when(F.col("_s").isNull(), F.lit(True))
            .otherwise(F.lit(2).cast("decimal(38,0)") * dec("_s") * dec("_gn") < dec("_gs") * dec("_n"))
            .alias("rare_heavy"),
        )
        .orderBy("doc_id")
    )


@register(
    "tx08_mean_token_freq",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    per_doc AS (
      SELECT doc_id, SUM(cnt) AS s, COUNT(*) AS n
      FROM toks JOIN vocab USING (tok) GROUP BY doc_id
    ),
    gtot AS (SELECT SUM(s) AS gs, SUM(n) AS gn FROM per_doc)
    SELECT d.doc_id, COALESCE(p.n, 0) AS n_toks,
           ROUND(CAST(p.s AS DOUBLE) / p.n, 6) AS mean_freq_r,
           CASE WHEN p.s IS NULL THEN TRUE
                ELSE 2 * p.s * gn < gs * p.n END AS rare_heavy
    FROM documents d LEFT JOIN per_doc p USING (doc_id), gtot
    ORDER BY d.doc_id
    """,
    doc=(
        "Perplexity-proxy quality score: per-doc mean corpus frequency "
        "of its BPE-ish tokens, with an exact cross-multiplied "
        "rare-heavy flag (mean < half the global mean). Integer "
        "sufficient statistics end-to-end; one skew-prone shuffle on "
        "the token key (AQE skew-join)."
    ),
    tags=("text", "quality"),
)
def tx08(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mean_token_freq(load_table(spark, sf_dir, "documents"))


@register(
    "xo01_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, abs(e.value - m.med) AS dev, m.med
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type, COUNT(*) AS n,
           CAST(SUM(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(ANY_VALUE(d.med), 6) AS med_r,
           ROUND(m.mad, 6) AS mad_r
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, ROUND(m.mad, 6)
    """,
    doc=(
        "Robust outlier detection via median absolute deviation: per "
        "group, flag |x - median| > 3*MAD — the quality gate that "
        "survives heavy-tailed value distributions where mean/stddev "
        "gates drown (training-data filtering staple). Two grouped "
        "exact medians (linear-interpolation percentile, identical in "
        "both engines — av05's precedent) with the O(#groups) stats "
        "broadcast back; two corpus passes total, outlier verdicts "
        "integer-counted. At sketch scale, swap the medians for "
        "approx_percentile (av12) without changing the shape."
    ),
    tags=("quality", "statistics", "outlier"),
)
def xo01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    # O(#event_types) frames, checkpointed: MAD is inherently a
    # three-pass statistic (median pass, deviation-median pass, gate
    # pass) but without the checkpoints the deviation subtree re-derives
    # the median pass inside BOTH later passes (r7 scan audit: events
    # read 4x, now the minimal 3x).
    from spotify_tags_etl_spark.plans.planmetrics import record_plan

    med = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.5)).alias("med")
    )
    record_plan(med, "xo01:median_pass")
    med = med.localCheckpoint(eager=True)
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.col("dev"), F.lit(0.5)).alias("mad")
    )
    record_plan(mad, "xo01:mad_pass")
    mad = mad.localCheckpoint(eager=True)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", F.round("mad", 6).alias("mad_r"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)).alias("n_outliers"),
            F.round(F.any_value(F.col("med")), 6).alias("med_r"),
        )
        .select("event_type", "n", "n_outliers", "med_r", "mad_r")
    )


#: xt01 parameters: vocabulary cut + report size
_PMI_VOCAB = 30
_PMI_TOP = 50


@register(
    "xt01_pmi_cooccurrence",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '{{TOKEN_PATTERN}}')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rn
        FROM toks GROUP BY tok
      ) WHERE rn <= {_PMI_VOCAB}
    ),
    dt AS (SELECT doc_id, tok FROM toks WHERE tok IN (SELECT tok FROM vocab)),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    df AS (SELECT tok, COUNT(*) AS n_t FROM dt GROUP BY tok),
    pairs AS (
      SELECT l.tok AS tok_a, r.tok AS tok_b, COUNT(*) AS n_ab
      FROM dt l JOIN dt r ON l.doc_id = r.doc_id AND l.tok < r.tok
      GROUP BY l.tok, r.tok
    )
    SELECT tok_a, tok_b, n_ab, n_a, n_b, score_ppm, rk FROM (
      SELECT p.tok_a, p.tok_b, p.n_ab, a.n_t AS n_a, b.n_t AS n_b,
             CAST((1000000 * p.n_ab * n.n_docs) // (a.n_t * b.n_t) AS BIGINT) AS score_ppm,
             ROW_NUMBER() OVER (
               ORDER BY (1000000 * p.n_ab * n.n_docs) // (a.n_t * b.n_t) DESC, p.tok_a, p.tok_b
             ) AS rk
      FROM pairs p
      JOIN df a ON a.tok = p.tok_a
      JOIN df b ON b.tok = p.tok_b
      CROSS JOIN n
    ) WHERE rk <= {_PMI_TOP}
    """.replace("{TOKEN_PATTERN}", TOKEN_PATTERN),
    doc=(
        "PMI-style token co-occurrence statistics: document-level "
        "co-occurrence counts among the top-30 vocabulary tokens, "
        "scored by the exact integer lift ratio 1e6*n_ab*N/(n_a*n_b) "
        "(the PMI argument without the log — same ordering, no libm "
        "nondeterminism), deterministic top-50. The corpus-statistics "
        "prep for embedding training / collocation mining. Self-join "
        "on doc_id restricted to the broadcast vocabulary — at most "
        "V(V-1)/2 pairs per doc; at 1e10-doc scale the bigint lift "
        "numerator wants DECIMAL(38) (noted, exact here)."
    ),
    tags=("text", "statistics", "cooccurrence"),
)
def xt01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.regexp_extract_all("text", F.lit(TOKEN_PATTERN), F.lit(0)))
        ).alias("tok"),
    )
    wv = Window.orderBy(F.desc("n"), F.asc("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") <= _PMI_VOCAB)
        .select("tok")
    )
    dt = toks.join(F.broadcast(vocab), "tok").select("doc_id", "tok")
    n_docs = docs.select(F.countDistinct("doc_id")).collect()[0][0]  # 1-row plan stat
    df_ = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("n_t"))
    l = dt.select("doc_id", F.col("tok").alias("tok_a"))
    r = dt.select("doc_id", F.col("tok").alias("tok_b"))
    pairs = (
        l.join(r, "doc_id")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    scored = (
        pairs.join(F.broadcast(df_.withColumnsRenamed({"tok": "tok_a", "n_t": "n_a"})), "tok_a")
        .join(F.broadcast(df_.withColumnsRenamed({"tok": "tok_b", "n_t": "n_b"})), "tok_b")
        .withColumn(
            "score_ppm",
            F.expr(f"(1000000 * n_ab * CAST({n_docs} AS BIGINT)) DIV (n_a * n_b)"),
        )
    )
    wr = Window.orderBy(F.desc("score_ppm"), F.asc("tok_a"), F.asc("tok_b"))
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= _PMI_TOP)
        .select("tok_a", "tok_b", "n_ab", "n_a", "n_b", "score_ppm", "rk")
    )


@register(
    "xs01_source_quality_gate",
    oracle="""
    WITH feat AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_words,
             CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5
                + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' and ', ''))) / 5
                + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' of ', ''))) / 4
                + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' is ', ''))) / 4
               AS BIGINT) AS n_stop
      FROM documents
    ),
    per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_words) AS BIGINT) AS sum_words,
             CAST(SUM(n_stop) AS BIGINT) AS sum_stopwords
      FROM feat GROUP BY source
    ),
    gtot AS (SELECT SUM(sum_words) AS gw, SUM(sum_stopwords) AS gs FROM per_src)
    SELECT source, n_docs, sum_words, sum_stopwords,
           2 * sum_stopwords * gw < gs * sum_words AS low_quality
    FROM per_src, gtot
    """,
    doc=(
        "Source/domain-level quality gate (the CommonCrawl-pipeline "
        "domain filter): per-source exact integer stopword density "
        "compared against HALF the corpus density via cross-"
        "multiplication (no float ratio can diverge between engines — "
        "tx08's flag pattern). Gated sources' documents are then one "
        "broadcast semi-join away from removal. Per-source sums are "
        "map-combined partials; the global row broadcasts."
    ),
    tags=("text", "quality", "gate"),
)
def xs01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(docs).select("doc_id", "n_words", "n_stopwords")
    per_src = (
        docs.select("doc_id", "source")
        .join(feats, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("sum_words"),
            F.sum("n_stopwords").cast("bigint").alias("sum_stopwords"),
        )
    )
    glob = per_src.agg(
        F.sum("sum_words").alias("gw"), F.sum("sum_stopwords").alias("gs")
    )
    return (
        per_src.crossJoin(F.broadcast(glob))
        .select(
            "source",
            "n_docs",
            "sum_words",
            "sum_stopwords",
            (F.lit(2) * F.col("sum_stopwords") * F.col("gw") < F.col("gs") * F.col("sum_words")).alias(
                "low_quality"
            ),
        )
    )


#: xk01 duplicated-span gram width (tokens).
_SPAN_N = 5


def dup_span_detect(docs: DataFrame, n: int = _SPAN_N) -> DataFrame:
    """Cross-document duplicated-SPAN detection (the exact-substring
    dedup primitive from the 'Deduplicating Training Data' line of
    work): every ``n``-gram occurring in >= 2 distinct documents marks
    its positions, and runs of consecutive marked positions merge into
    maximal islands per document — the spans an exact-substring dedup
    pass would cut. Emits per-doc span count, longest span (tokens) and
    summed island extents (adjacent-overlap counted once per island;
    islands >= 2 apart may overlap in coverage and are summed as-is —
    the oracle applies the identical formula).

    Shape: the wide stage is the gram-key aggregate (zipfian-hot —
    AQE skew handling, map-side partials) + a gram-key semi-join back;
    the island merge is one per-doc window. At 100 TB swap the raw
    gram string key for ``xxhash64(gram)`` to shrink shuffle width
    (collision-safe enough at 64 bits for span MARKING); same plan.
    """
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(t) >= {n} THEN transform(sequence(0, size(t) - {n}), "
                f"i -> struct(i AS pos, array_join(slice(t, i + 1, {n}), ' ') AS gram)) "
                "ELSE array() END"
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    # ">= 2 distinct docs" as min != max: algebraic partials (no
    # distinct expansion on the zipfian-hot gram key — count_distinct
    # would carry per-key doc-id sets through the shuffle).
    dup = (
        grams.groupBy("gram")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .where(F.col("d0") != F.col("d1"))
    )
    pos_dup = grams.join(dup, "gram", "left_semi").select("doc_id", "pos").distinct()
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        pos_dup.withColumn("isl", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "isl")
        .agg(F.min("pos").alias("p0"), F.max("pos").alias("p1"))
    )
    ext = F.col("p1") - F.col("p0") + F.lit(n)
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max(ext).alias("max_span_tokens"),
        F.sum(ext).cast("bigint").alias("dup_span_tokens"),
    )


@register(
    "xk01_dup_span_detect",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(list_slice(t, i, i + {_SPAN_N} - 1), ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - {_SPAN_N} + 1)) AS u(i)
    ),
    dupg AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
    pos_dup AS (
      SELECT DISTINCT doc_id, pos FROM grams WHERE gram IN (SELECT gram FROM dupg)
    ),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM pos_dup
    ),
    spans AS (SELECT doc_id, MIN(pos) AS p0, MAX(pos) AS p1 FROM isl GROUP BY doc_id, g)
    SELECT doc_id, COUNT(*) AS n_spans,
           MAX(p1 - p0 + {_SPAN_N}) AS max_span_tokens,
           CAST(SUM(p1 - p0 + {_SPAN_N}) AS BIGINT) AS dup_span_tokens
    FROM spans GROUP BY doc_id
    """,
    doc=(
        "Exact duplicated-substring span detection across the corpus "
        "(5-gram islands) — the span-level complement of dd01/dd02's "
        "whole/near-document dedup: finds the repeated PASSAGES "
        "(boilerplate, licenses, templates) inside otherwise-distinct "
        "documents that document-level dedup can never see. Gram-key "
        "aggregate + semi-join + per-doc island window; all integer "
        "outputs."
    ),
    tags=("text", "dedup", "spans"),
)
def xk01(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 §14: fan the single-split corpus out before the span explode
    return dup_span_detect(fan_out_scan(load_table(spark, sf_dir, "documents"), "doc_id"))


#: xt02 phrase-detection parameters: discount + report size.
_PHRASE_DELTA = 5
_PHRASE_TOP = 20


@register(
    "xt02_phrase_merge",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    uni AS (
      SELECT tok, COUNT(*) AS c FROM toks, UNNEST(t) AS u(tok) GROUP BY tok
    ),
    n AS (SELECT SUM(c) AS n_tok FROM uni),
    pairs AS (
      SELECT t[i] AS a, t[i + 1] AS b, COUNT(*) AS cab
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
      GROUP BY t[i], t[i + 1]
    )
    SELECT a, b, cab, score_ppm, rk FROM (
      SELECT p.a, p.b, p.cab,
             CAST(((p.cab - {_PHRASE_DELTA}) * 1000000 * n.n_tok) // (ua.c * ub.c) AS BIGINT) AS score_ppm,
             ROW_NUMBER() OVER (
               ORDER BY ((p.cab - {_PHRASE_DELTA}) * 1000000 * n.n_tok) // (ua.c * ub.c) DESC,
                        p.a, p.b
             ) AS rk
      FROM pairs p
      JOIN uni ua ON ua.tok = p.a
      JOIN uni ub ON ub.tok = p.b
      CROSS JOIN n
      WHERE p.cab > {_PHRASE_DELTA}
    ) WHERE rk <= {_PHRASE_TOP}
    """,
    doc=(
        "Phrase detection (word2phrase-style merge scoring): ADJACENT "
        "word bigram counts scored by the discounted integer lift "
        "(cab - d) * 1e6 * N / (ca * cb) — the vocabulary-induction "
        "step that decides which token pairs fuse into phrases before "
        "embedding/tokenizer training. Positional adjacency, unlike "
        "xt01's anywhere-in-document co-occurrence. Shape: bigrams "
        "read straight off the token arrays (no self-join), one "
        "zipfian-hot pair-key aggregate + two broadcast-sized unigram "
        "joins + a 1-row total broadcast; top-k via a single "
        "total-order window over the already-aggregated pair frame. "
        "Integer lift keeps the ranking engine-exact (xt01's no-libm "
        "discipline); at 1e12-token corpora the lift numerator wants "
        "DECIMAL(38,0) (int64-exact here, noted)."
    ),
    tags=("text", "statistics", "phrases"),
)
def xt02(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    uni = toks.select(F.explode("t").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    n_tok = uni.agg(F.sum("c").alias("n_tok"))
    pairs = (
        toks.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b)) "
                    "ELSE array() END"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cab"))
        .where(F.col("cab") > _PHRASE_DELTA)
    )
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    scored = (
        pairs.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(n_tok))
        .withColumn(
            "score_ppm",
            F.expr(f"((cab - {_PHRASE_DELTA}) * 1000000 * n_tok) DIV (ca * cb)"),
        )
    )
    w = Window.orderBy(F.col("score_ppm").desc(), F.col("a"), F.col("b"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _PHRASE_TOP)
        .select("a", "b", "cab", "score_ppm", "rk")
    )


@register(
    "xo02_winsorize",
    oracle="""
    WITH cents AS (
      SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    ranked AS (
      SELECT event_type, c,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM cents
    ),
    cuts AS (
      SELECT event_type,
             MAX(CASE WHEN rn = (n + 19) // 20 THEN c END) AS lo,
             MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN c END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT c.event_type, COUNT(*) AS n,
           COUNT(*) FILTER (WHERE c.c < u.lo) AS n_clipped_lo,
           COUNT(*) FILTER (WHERE c.c > u.hi) AS n_clipped_hi,
           CAST(SUM(c.c) AS BIGINT) AS sum_cents_raw,
           CAST(SUM(LEAST(GREATEST(c.c, u.lo), u.hi)) AS BIGINT) AS sum_cents_wins
    FROM cents c JOIN cuts u USING (event_type)
    GROUP BY c.event_type
    """,
    doc=(
        "Per-group winsorization (clip at discrete p5/p95): cutoffs "
        "are rank-selected ACTUAL values (ceil(q*n) with an event_id "
        "tiebreak — xf02's integer-exact discrete-quantile "
        "discipline; interpolated cutoffs would reintroduce the "
        "cross-engine ulp hazard), broadcast back as an O(#groups) "
        "frame, then one clamp-and-aggregate pass — the heavy-tail "
        "containment step before any mean-based training statistic "
        "(xo01 DETECTS outliers; this bounds their influence). Two "
        "passes over the measure column: a per-group rank window and "
        "the clip scan; at sketch scale swap the rank window for "
        "approx_percentile cutoffs (av12) with the same clamp."
    ),
    tags=("quality", "statistics", "robust"),
)
def xo02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", F.round(F.col("value") * 100).cast("bigint").alias("c")
    )
    wp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "c",
        F.row_number().over(wp.orderBy("c", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    cuts = ranked.groupBy("event_type").agg(
        F.max(F.when(F.expr("rn = (n + 19) DIV 20"), F.col("c"))).alias("lo"),
        F.max(F.when(F.expr("rn = (19 * n + 19) DIV 20"), F.col("c"))).alias("hi"),
    )
    clipped = ev.join(F.broadcast(cuts), "event_type")
    wins = F.least(F.greatest(F.col("c"), F.col("lo")), F.col("hi"))
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("c") < F.col("lo"), 1)).alias("n_clipped_lo"),
        F.count(F.when(F.col("c") > F.col("hi"), 1)).alias("n_clipped_hi"),
        F.sum("c").cast("bigint").alias("sum_cents_raw"),
        F.sum(wins).cast("bigint").alias("sum_cents_wins"),
    )


# ---------------------------------------------------------------------------
# xt05 — Zipf rank-frequency table (corpus-law diagnostics)
# ---------------------------------------------------------------------------


@register(
    "xt05_zipf_rank_frequency",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    freq AS (SELECT t, COUNT(*) AS f FROM tok WHERE t <> '' GROUP BY t),
    ranked AS (
      SELECT t, f, ROW_NUMBER() OVER (ORDER BY f DESC, t) AS r FROM freq
    )
    SELECT r, t, f, CAST(r * f AS BIGINT) AS rf_product
    FROM ranked WHERE r <= 20 ORDER BY r
    """,
    doc=(
        "Zipf rank-frequency diagnostics: the top-20 tokens with rank, "
        "frequency, and the rank x frequency product — under Zipf's "
        "law r·f is near-constant, so the column IS the law check "
        "without any log-log float fit (the integer formulation of "
        "the slope test; tx08's corpus frequency table is the same "
        "aggregate without ranks). One token-key aggregate with "
        "map-side partials + a top-k window with total-order "
        "tiebreaks. Corpus-health probe: a collapsing rf curve means "
        "boilerplate domination — feeds the tx07 repetition gate."
    ),
    tags=("text", "statistics", "llm-pipeline"),
)
def xt05(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("t")).where(F.col("t") != "")
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.desc("f"), F.asc("t"))
    return (
        freq.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 20)
        .select("r", "t", "f", (F.col("r") * F.col("f")).cast("bigint").alias("rf_product"))
        .orderBy("r")
    )
