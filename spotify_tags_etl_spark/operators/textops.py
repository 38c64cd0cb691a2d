"""Text analysis operators for training-data pipelines.

Language-ID (marker-n-gram heuristic), quality scoring, token counting,
and document fingerprinting — all built-in column expressions (JVM-side,
whole-stage codegen); no UDFs. Each has a DuckDB oracle.

Determinism notes: counts are integers; ratios are single double
divisions of identical integer inputs (no accumulation, no rounding) —
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_tags_etl_spark.plans.registry import register
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
           length(text) / len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS chars_per_token
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
        (F.length("text") / bpe).alias("chars_per_token"),
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
