"""Playlist pipeline: liked songs + audio features (reference pipeline 2).

Spark-first re-expression of ``run_playlist_etl.py trigger_etl``
(SURVEY.md §3.2). The reference does: paginated extraction → per-item
``parse_favorite`` (nested dict plucks) → pydantic validation (raise &
skip) → NDJSON export → per-row ORM INSERT. Here:

* extraction is the paged DataSource (sources/paged_api.py) or any
  NDJSON drop of raw API items;
* ``parse_favorite`` (spotify_client.py:393-429) is a nested-field
  ``select`` — ``linked_from`` coalesce, ``album.artists[0].name``,
  F3/F4/F5 conversions — one codegen'd projection, no row loop;
* validation is a filter + quarantine split (the reference *skips*
  invalid rows via try/except, run_playlist_etl.py:48-58 — same row-drop
  semantics, but the rejects are kept as a frame, not a log line);
* audio-feature conformance applies the F7/F8 decode maps and the
  model's range constraints (models.py:101-175);
* the dedup is ``dropDuplicates("track_id")`` (A3,
  spotify_client.py:545-546);
* sinks are set-oriented ``write.json`` (K3) / ``write.parquet`` —
  never per-row commits.

At 100 TB: everything here is a narrow projection/filter pipeline — no
shuffle except the final dedup (hash-partition on track_id) and
optional output partitioning; validation quarantine is a second filter
over the same scan (Catalyst shares it when written from one cached
conformed frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spotify_tags_etl_spark.functions.decode import (
    convert_added_at,
    convert_duration,
    convert_release_date,
    decode_mode,
    decode_pitch_class,
)

from spotify_tags_etl_spark.schemas import VALID_TYPES  # single source (models.py:16-25)


def _batch_stamp() -> "F.Column":
    """Literal batch timestamp, resolved once on the driver.

    current_timestamp() re-evaluates per ACTION: a frame written to two
    sinks (NDJSON export + warehouse parquet) would carry two different
    stamps for the same rows. A driver-side literal makes every sink of
    one batch agree."""
    import datetime as _dt

    return F.lit(_dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)).cast("timestamp")

#: Raw saved-tracks API item (get-users-saved-tracks): explicit schema —
#: nested structs, optional linked_from. Inference is banned on dirty
#: data (SURVEY §7 step 1).
FAVORITE_RAW_SCHEMA = StructType(
    [
        StructField("added_at", StringType()),
        StructField(
            "track",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("type", StringType()),
                    StructField("name", StringType()),
                    StructField("track_number", LongType()),
                    StructField("duration_ms", LongType()),
                    StructField("popularity", LongType()),
                    StructField("linked_from", StructType([StructField("id", StringType())])),
                    StructField(
                        "album",
                        StructType(
                            [
                                StructField("name", StringType()),
                                StructField("release_date", StringType()),
                                StructField(
                                    "artists",
                                    ArrayType(StructType([StructField("name", StringType())])),
                                ),
                            ]
                        ),
                    ),
                    StructField("external_urls", StructType([StructField("spotify", StringType())])),
                ]
            ),
        ),
    ]
)

#: Raw audio-features API object (get-several-audio-features); key/mode
#: arrive as ints and are cast to string pre-validation (F9,
#: spotify_client.py:458-460).
AUDIO_FEATURE_RAW_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("type", StringType()),
        StructField("uri", StringType()),
        StructField("acousticness", StringType()),
        StructField("danceability", StringType()),
        StructField("duration_ms", LongType()),
        StructField("energy", StringType()),
        StructField("instrumentalness", StringType()),
        StructField("key", LongType()),
        StructField("mode", LongType()),
        StructField("liveness", StringType()),
        StructField("loudness", StringType()),
        StructField("speechiness", StringType()),
        StructField("tempo", StringType()),
        StructField("time_signature", LongType()),
        StructField("valence", StringType()),
        StructField("track_href", StringType()),
        StructField("analysis_url", StringType()),
    ]
)


def read_liked_songs_json(spark: SparkSession, path: str) -> DataFrame:
    from ..sources.tpch import ensure_session_defaults

    ensure_session_defaults(spark)
    return spark.read.schema(FAVORITE_RAW_SCHEMA).json(path)


def read_audio_features_json(spark: SparkSession, path: str) -> DataFrame:
    from ..sources.tpch import ensure_session_defaults

    ensure_session_defaults(spark)
    return spark.read.schema(AUDIO_FEATURE_RAW_SCHEMA).json(path)


def parse_favorites(raw: DataFrame) -> DataFrame:
    """F12 (parse_favorite, spotify_client.py:393-429) as one projection:
    linked_from-preferred track id, album.artists[0].name, F3/F4/F5."""
    return raw.select(
        F.coalesce(F.col("track.linked_from.id"), F.col("track.id")).alias("track_id"),
        F.col("track.type").alias("type"),
        F.element_at(F.col("track.album.artists"), 1)["name"].alias("artist_name"),
        F.col("track.album.name").alias("album_name"),
        F.col("track.name").alias("track_name"),
        F.col("track.track_number").cast("int").alias("track_number"),
        convert_duration("track.duration_ms").alias("duration"),
        F.date_format(convert_release_date("track.album.release_date"), "yyyy-MM-dd").alias(
            "release_date"
        ),
        F.col("track.popularity").cast("int").alias("popularity"),
        F.date_format(convert_added_at("added_at"), "yyyy-MM-dd HH:mm:ss").alias("added_at"),
        F.col("track.external_urls.spotify").alias("external_url"),
        _batch_stamp().alias("extract_date"),
    )


def favorite_validity() -> F.Column:
    """Model constraints for liked_song (models.py:41-71): type whitelist,
    track_number ≥ 0, popularity 0-100, required keys present."""
    return (
        F.col("type").isin(*VALID_TYPES)
        & F.col("track_id").isNotNull()
        & (F.col("track_number") >= 0)
        & F.col("popularity").between(0, 100)
        & F.col("added_at").isNotNull()
    )


def split_favorites(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Row-drop semantics of the reference's try/except (run_playlist_etl.
    py:48-58), but rejects land in a quarantine frame instead of a log."""
    cond = favorite_validity()
    return parsed.where(cond), parsed.where(~F.coalesce(cond, F.lit(False)))


def dedup_favorites(valid: DataFrame) -> DataFrame:
    """A3 (spotify_client.py:545-546): one row per track_id, keeping the
    earliest added_at (deterministic, vs the reference's arrival order)."""
    w = Window.partitionBy("track_id").orderBy(F.asc_nulls_last("added_at"), F.asc("track_name"))
    return valid.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


_UNIT_DEC = "decimal(7,6)"  # condecimal(ge=0, le=1, decimal_places=6)


def conform_audio_features(raw: DataFrame) -> DataFrame:
    """Typed cast + F7/F8 decode for audio_feature (models.py:101-175).

    key/mode: int → string (F9) → notation decode (F7/F8). The 0-1
    features become DECIMAL(7,6); loudness DECIMAL(6,3)."""
    unit = lambda c: F.col(c).cast(_UNIT_DEC)  # noqa: E731
    return raw.select(
        F.col("id").alias("track_id"),
        F.col("type"),
        F.col("uri"),
        unit("acousticness").alias("acousticness"),
        unit("danceability").alias("danceability"),
        F.col("duration_ms"),
        unit("energy").alias("energy"),
        unit("instrumentalness").alias("instrumentalness"),
        decode_pitch_class(F.col("key").cast("string")).alias("key"),
        decode_mode(F.col("mode").cast("string")).alias("mode"),
        unit("liveness").alias("liveness"),
        F.col("loudness").cast("decimal(6,3)").alias("loudness"),
        unit("speechiness").alias("speechiness"),
        F.col("tempo").cast("decimal(9,3)").alias("tempo"),
        F.col("time_signature").cast("int").alias("time_signature"),
        unit("valence").alias("valence"),
        F.col("track_href"),
        F.col("analysis_url"),
        _batch_stamp().alias("extract_date"),
    )


def audio_feature_validity() -> F.Column:
    """Range constraints (models.py:116-150): unit interval features,
    loudness ≤ 0, tempo > 0, time_signature > 0, duration ≥ 0, type
    whitelist."""
    unit_ok = lambda c: F.col(c).between(0.0, 1.0)  # noqa: E731
    return (
        F.col("type").isin(*VALID_TYPES)
        & F.col("track_id").isNotNull()
        & unit_ok("acousticness")
        & unit_ok("danceability")
        & unit_ok("energy")
        & unit_ok("instrumentalness")
        & unit_ok("liveness")
        & unit_ok("speechiness")
        & unit_ok("valence")
        & (F.col("loudness") <= 0.0)
        & (F.col("tempo") > 0.0)
        & (F.col("time_signature") > 0)
        & (F.col("duration_ms") >= 0)
    )


def split_audio_features(conformed: DataFrame) -> tuple[DataFrame, DataFrame]:
    cond = audio_feature_validity()
    return conformed.where(cond), conformed.where(~F.coalesce(cond, F.lit(False)))


def export_ndjson(df: DataFrame, path: str) -> None:
    """K3 (save_records, spotify_client.py:118-134): NDJSON export —
    set-oriented ``write.json``, one file per partition."""
    df.write.mode("overwrite").json(path)


def run_playlist_pipeline(
    spark: SparkSession,
    liked_src: str,
    features_src: str,
    out_dir: str,
) -> dict[str, DataFrame]:
    """End-to-end §3.2: parse → validate/quarantine → dedup → export →
    warehouse load (parquet; swap for JDBC for PG parity)."""
    parsed = parse_favorites(read_liked_songs_json(spark, liked_src))
    liked_ok, liked_bad = split_favorites(parsed)
    # Literal load_date + cache: each frame feeds two sinks (NDJSON +
    # parquet); without both, the sinks would re-run the pipeline and
    # stamp different load_dates on identical rows (and an exact dedup
    # tie could even pick a different survivor per sink).
    liked = dedup_favorites(liked_ok).withColumn("load_date", _batch_stamp()).cache()

    feats = conform_audio_features(read_audio_features_json(spark, features_src))
    feats_ok, feats_bad = split_audio_features(feats)
    feats_ok = feats_ok.withColumn("load_date", _batch_stamp()).cache()

    try:
        export_ndjson(liked, f"{out_dir}/liked_song_records")
        export_ndjson(feats_ok, f"{out_dir}/audio_feature_records")
        liked.write.mode("overwrite").parquet(f"{out_dir}/warehouse/liked_song")
        feats_ok.write.mode("overwrite").parquet(f"{out_dir}/warehouse/audio_feature")
    finally:
        liked.unpersist()
        feats_ok.unpersist()
    return {
        "liked_song": liked,
        "liked_quarantine": liked_bad,
        "audio_feature": feats_ok,
        "audio_feature_quarantine": feats_bad,
    }
