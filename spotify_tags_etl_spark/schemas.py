"""Explicit StructType schemas for every record shape the engine ingests.

Explicit schemas are non-negotiable (SURVEY.md §7 step 1): the reference's
source data is dirty — numerics ship as strings and ``album_gain`` is
string on some rows and number on others (reference
``data/local_media_extract.json:1`` vs ``:12``) — so inference is a trap.
The raw schema is all-string-tolerant; the conform layer casts.

Reference schema sources:
* media wide record: ``postgres_media.py:300`` ingest of 29-field NDJSON
* warehouse tables: ``sql/create_tables.sql:3-66``
* liked_song / audio_feature: ``sql/models.py:29-71`` / ``:101-175``
"""

from __future__ import annotations

from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _string_fields(*names: str) -> list[StructField]:
    return [StructField(n, StringType(), True) for n in names]


#: Raw 29-field media record. Everything that can arrive dirty is a string;
#: fields that are *always* JSON numbers in the source keep numeric types.
MEDIA_RAW_SCHEMA = StructType(
    _string_fields("index")
    + [StructField("file_size", IntegerType(), True)]
    + _string_fields("readable_size", "file_ext", "artist_name", "album_title", "track_title")
    + _string_fields("track_number", "track_length", "music_genre", "genre_in_dict", "album_art", "year")
    + [StructField("rating", DecimalType(2, 1), True)]
    + _string_fields("encoder", "composer", "conductor", "comment")
    + _string_fields("track_gain", "album_gain")  # mixed string/number in source → string, cast later
    + [
        StructField("bitrate", IntegerType(), True),
        StructField("sampling_rate", IntegerType(), True),
    ]
    + _string_fields("file_name", "path_len", "last_modified", "encoding", "hash")
    + _string_fields("artist_id", "album_id", "track_id")
)

#: Typed (conformed) media record: post-cast logical types per
#: create_tables.sql DDL.
MEDIA_CONFORMED_CASTS: dict[str, str] = {
    "track_number": "smallint",
    "year": "smallint",
    "track_gain": "decimal(5,2)",
    "album_gain": "decimal(5,2)",
    "path_len": "smallint",
    "last_modified": "timestamp",
}

#: Vertical split: warehouse table → ordered column list
#: (create_tables.sql:3-66; id SERIAL omitted per postgres_media.py:225).
WAREHOUSE_TABLES: dict[str, list[str]] = {
    "artist": ["artist_id", "artist_name", "composer", "conductor", "extract_date"],
    "album": ["album_id", "artist_id", "album_title", "year", "album_gain", "album_art", "extract_date"],
    "track": [
        "track_id",
        "album_title",
        "track_title",
        "artist_id",
        "track_number",
        "track_length",
        "rating",
        "comment",
        "track_gain",
        "bitrate",
        "sampling_rate",
        "extract_date",
    ],
    "genre": ["artist_id", "artist_name", "music_genre", "genre_in_dict", "extract_date"],
    "metadata": [
        "track_id",
        "file_size",
        "readable_size",
        "file_ext",
        "encoder",
        "file_name",
        "path_len",
        "last_modified",
        "encoding",
        "hash",
        "extract_date",
    ],
}

#: Valid object types (models.py:17-25): whitelist constraint.
VALID_TYPES = ("track", "artist", "album", "playlist", "show", "episode", "audio_features")

#: liked_song row (models.py:29-71).
LIKED_SONG_SCHEMA = StructType(
    _string_fields("track_id", "type", "artist_name", "album_name", "track_name")
    + [StructField("track_number", IntegerType(), True)]
    + _string_fields("duration", "release_date")
    + [StructField("popularity", IntegerType(), True)]
    + _string_fields("added_at", "external_url", "extract_date", "load_date")
)

#: audio_feature row (models.py:101-175). Bounded 0-1 features are
#: decimal(7,6); loudness ≤ 0 with 3 dp; key/mode decoded to strings.
AUDIO_FEATURE_SCHEMA = StructType(
    _string_fields("id", "type", "uri", "track_href", "analysis_url")
    + [
        StructField("acousticness", DecimalType(7, 6), True),
        StructField("danceability", DecimalType(7, 6), True),
        StructField("energy", DecimalType(7, 6), True),
        StructField("instrumentalness", DecimalType(7, 6), True),
        StructField("liveness", DecimalType(7, 6), True),
        StructField("speechiness", DecimalType(7, 6), True),
        StructField("valence", DecimalType(7, 6), True),
        StructField("loudness", DecimalType(9, 3), True),
        StructField("tempo", DecimalType(9, 3), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("key", StringType(), True),
        StructField("mode", StringType(), True),
        StructField("time_signature", ShortType(), True),
    ]
    + _string_fields("extract_date", "load_date")
)

# Pitch-class / mode decode maps live in functions/decode.py (the copy
# used by the decode expressions and golden tests); re-exported here for
# schema-adjacent callers. A second literal copy had already drifted
# from the reference's unicode-flat spellings (models.py:76-97).
from spotify_tags_etl_spark.functions.decode import MODE, PITCH_CLASS  # noqa: E402,F401
