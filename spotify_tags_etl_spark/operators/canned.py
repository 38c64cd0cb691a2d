"""The reference's 8 canned parameterized queries (params_queries.py:7-35).

Every query has a DataFrame builder over the warehouse split frames;
two of them (Q1 artist-select and Q8 avg-size — one IN-parameterized,
one aggregate) additionally exist as parameterized SQL templates run via
``spark.sql(template, args=...)`` to demonstrate the Spark-native analog
of the reference's mogrify/execute path (``postgres_media.py:97-122``).
The other six share that machinery; their templates would be mechanical
repeats, so only the builders are registered.

The dynamic IN-placeholder machinery (``build_placeholders``,
``params_queries.py:38-54``) collapses to ``isin(*values)`` /
parameterized arrays — no string splicing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# SQL templates over temp views (named parameter style).
ARTIST_SELECT = "SELECT artist_id, artist_name, composer FROM artist WHERE artist_name IN (SELECT explode(:names))"
AVG_SIZE_SELECT = (
    "SELECT ROUND(CAST(SUM(CAST(file_size AS DECIMAL(18,0))) AS DOUBLE)"
    " / COUNT(*) / (1024*1024), 2) AS avg_mib FROM metadata"
)


def artist_select(tables: dict[str, DataFrame], names: Sequence[str]) -> DataFrame:
    """Q1 (params_queries.py:7): projection + IN on one key."""
    return (
        tables["artist"]
        .where(F.col("artist_name").isin(*names))
        .select("artist_id", "artist_name", "composer")
    )


def album_select(tables: dict[str, DataFrame], titles: Sequence[str]) -> DataFrame:
    """Q2 (params_queries.py:9)."""
    return (
        tables["album"]
        .where(F.col("album_title").isin(*titles))
        .select("album_id", "album_title", "year", "album_gain")
    )


def track_select(tables: dict[str, DataFrame], titles: Sequence[str]) -> DataFrame:
    """Q3 (params_queries.py:11)."""
    return (
        tables["track"]
        .where(F.col("track_title").isin(*titles))
        .select("artist_id", "album_title", "track_title", "track_length", "rating")
    )


def genre_select(tables: dict[str, DataFrame], genres: Sequence[str]) -> DataFrame:
    """Q4 (params_queries.py:31): two-key IN."""
    return tables["genre"].where(F.col("music_genre").isin(*genres)).select("artist_name", "music_genre")


def file_select(tables: dict[str, DataFrame], ext: str) -> DataFrame:
    """Q5 (params_queries.py:33): equality predicate."""
    return tables["metadata"].where(F.col("file_ext") == ext).select("file_name", "encoding", "file_ext")


def gain_select(tables: dict[str, DataFrame], max_gain: float) -> DataFrame:
    """Q6 (params_queries.py:13-20): track ⋈ artist ⋈ album + theta + DESC sort.

    artist/album are broadcast-size dims after the split; at 100 TB the
    same plan sort-merges on artist_id automatically.
    """
    track = tables["track"].select("artist_id", "track_title")
    artist = tables["artist"].select("artist_id", "artist_name")
    album = tables["album"].where(F.col("album_gain") < max_gain).select(
        "artist_id", "album_title", "album_gain"
    )
    return (
        track.join(artist, "artist_id")
        .join(album, "artist_id")
        .orderBy(F.desc("album_gain"))
        .select("track_title", "artist_name", "album_title", "album_gain")
    )


def join_select(tables: dict[str, DataFrame], genres: Sequence[str]) -> DataFrame:
    """Q7 (params_queries.py:22-29): artist ⋈ genre ⋈ track + IN + ASC sort."""
    artist, genre, track = tables["artist"], tables["genre"], tables["track"]
    return (
        artist.select("artist_id", "artist_name")
        .join(genre.where(F.col("music_genre").isin(*genres)).select("artist_id", "music_genre"), "artist_id")
        .join(track.select("artist_id", "track_title"), "artist_id")
        .orderBy("artist_name")
        .select("artist_name", "music_genre", "track_title")
    )


def avg_size_select(tables: dict[str, DataFrame]) -> DataFrame:
    """Q8 (params_queries.py:35): scalar AVG → MiB, 2 dp (decimal-exact sum)."""
    return tables["metadata"].agg(
        F.round(
            F.sum(F.col("file_size").cast("decimal(18,0)")).cast("double") / F.count("*") / (1024 * 1024),
            2,
        ).alias("avg_mib")
    )


# ---------------------------------------------------------------------------
# Driver registrations with full DuckDB oracles: each oracle reproduces the
# whole pipeline (NDJSON ingest with explicit columns → conform casts →
# validity filter → offline-ID broadcast enrichment → vertical-split
# projection → query) as SQL CTEs over ``read_json`` of the same fixture,
# so the reference's literal 8-query surface gets a hard value-hash check.
# Decimal measure columns are cast to DOUBLE on BOTH sides (registry
# determinism rule — decimal objects don't value-compare across engines).
# ---------------------------------------------------------------------------

import os as _os

from spotify_tags_etl_spark.etl.media import media_tables
from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.offline_ids import ALBUM_IDS, ARTIST_IDS, TRACK_IDS

FIXTURE_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "data",
    "local_media_sample.json",
)


def _values_clause(mapping: dict[str, str]) -> str:
    q = "'"
    return ", ".join(f"('{n.replace(q, q * 2)}', '{i}')" for n, i in mapping.items())


#: Shared oracle prelude: the media pipeline as DuckDB CTEs (ingest with the
#: explicit MEDIA_RAW_SCHEMA column types, conform casts per
#: MEDIA_CONFORMED_CASTS, validity_condition(), enrich_offline_ids()).
_MEDIA_BASE = f"""
WITH raw AS (
  SELECT * FROM read_json('{FIXTURE_PATH}', format='newline_delimited',
    columns={{"index": 'VARCHAR', "file_size": 'INTEGER', "readable_size": 'VARCHAR',
             "file_ext": 'VARCHAR', "artist_name": 'VARCHAR', "album_title": 'VARCHAR',
             "track_title": 'VARCHAR', "track_number": 'VARCHAR', "track_length": 'VARCHAR',
             "music_genre": 'VARCHAR', "genre_in_dict": 'VARCHAR', "album_art": 'VARCHAR',
             "year": 'VARCHAR', "rating": 'DECIMAL(2,1)', "encoder": 'VARCHAR',
             "composer": 'VARCHAR', "conductor": 'VARCHAR', "comment": 'VARCHAR',
             "track_gain": 'VARCHAR', "album_gain": 'VARCHAR', "bitrate": 'INTEGER',
             "sampling_rate": 'INTEGER', "file_name": 'VARCHAR', "path_len": 'VARCHAR',
             "last_modified": 'VARCHAR', "encoding": 'VARCHAR', "hash": 'VARCHAR',
             "artist_id": 'VARCHAR', "album_id": 'VARCHAR', "track_id": 'VARCHAR'}})
),
conformed AS (
  SELECT "index", file_size, readable_size, file_ext, artist_name, album_title, track_title,
         CAST(track_number AS SMALLINT) AS track_number, track_length, music_genre,
         genre_in_dict, album_art, CAST("year" AS SMALLINT) AS "year", rating,
         regexp_replace(encoder, '[\\r\\n\\t]+$', '') AS encoder, composer, conductor, comment,
         CAST(track_gain AS DECIMAL(5,2)) AS track_gain,
         CAST(album_gain AS DECIMAL(5,2)) AS album_gain,
         bitrate, sampling_rate, file_name, CAST(path_len AS SMALLINT) AS path_len,
         CAST(last_modified AS TIMESTAMP) AS last_modified, encoding, "hash"
  FROM raw
  WHERE "index" IS NOT NULL AND artist_name IS NOT NULL
    AND (rating IS NULL OR rating BETWEEN 0.0 AND 5.0)
    AND COALESCE(CAST(track_number AS SMALLINT), 0) >= 0
    AND COALESCE(file_size, 0) >= 0
),
amap(name, id) AS (VALUES {_values_clause(ARTIST_IDS)}),
almap(name, id) AS (VALUES {_values_clause(ALBUM_IDS)}),
tmap(name, id) AS (VALUES {_values_clause(TRACK_IDS)}),
enriched AS (
  SELECT c.*, COALESCE(a.id, 'not_found') AS artist_id,
         COALESCE(al.id, 'not_found') AS album_id,
         COALESCE(t.id, 'not_found') AS track_id
  FROM conformed c
  LEFT JOIN amap a ON c.artist_name = a.name
  LEFT JOIN almap al ON c.album_title = al.name
  LEFT JOIN tmap t ON c.track_title = t.name
)
"""

_MEDIA_ORACLES = {
    "media_q01_artist_select": _MEDIA_BASE
    + "SELECT artist_id, artist_name, composer FROM enriched WHERE artist_name IN ('Velvet Harbor')",
    "media_q02_album_select": _MEDIA_BASE
    + "SELECT album_id, album_title, \"year\", CAST(album_gain AS DOUBLE) AS album_gain "
    "FROM enriched WHERE album_title IN ('First Light')",
    "media_q03_track_select": _MEDIA_BASE
    + "SELECT artist_id, album_title, track_title, track_length, CAST(rating AS DOUBLE) AS rating "
    "FROM enriched WHERE track_title IN ('Future Proof')",
    "media_q04_genre_select": _MEDIA_BASE
    + "SELECT artist_name, music_genre FROM enriched WHERE music_genre IN ('Trip-Hop', 'Alternative')",
    "media_q05_file_select": _MEDIA_BASE
    + "SELECT file_name, encoding, file_ext FROM enriched WHERE file_ext = '.flac'",
    "media_q06_gain_select": _MEDIA_BASE
    + """
    SELECT t.track_title, a.artist_name, al.album_title, CAST(al.album_gain AS DOUBLE) AS album_gain
    FROM (SELECT artist_id, track_title FROM enriched) t
    JOIN (SELECT artist_id, artist_name FROM enriched) a ON t.artist_id = a.artist_id
    JOIN (SELECT artist_id, album_title, album_gain FROM enriched WHERE album_gain < -4.0) al
      ON t.artist_id = al.artist_id
    """,
    "media_q07_join_select": _MEDIA_BASE
    + """
    SELECT a.artist_name, g.music_genre, t.track_title
    FROM (SELECT artist_id, artist_name FROM enriched) a
    JOIN (SELECT artist_id, music_genre FROM enriched WHERE music_genre IN ('Classical')) g
      ON a.artist_id = g.artist_id
    JOIN (SELECT artist_id, track_title FROM enriched) t ON a.artist_id = t.artist_id
    """,
    "media_q08_avg_size_select": _MEDIA_BASE
    + "SELECT ROUND(CAST(SUM(CAST(file_size AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*) / (1024*1024), 2)"
    " AS avg_mib FROM enriched",
}


def _dbl(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("double"))
    return df


_MEDIA_QUERIES = {
    "media_q01_artist_select": lambda t, s: artist_select(t, ["Velvet Harbor"]),
    "media_q02_album_select": lambda t, s: _dbl(album_select(t, ["First Light"]), "album_gain"),
    "media_q03_track_select": lambda t, s: _dbl(track_select(t, ["Future Proof"]), "rating"),
    "media_q04_genre_select": lambda t, s: genre_select(t, ["Trip-Hop", "Alternative"]),
    "media_q05_file_select": lambda t, s: file_select(t, ".flac"),
    "media_q06_gain_select": lambda t, s: _dbl(gain_select(t, -4.0), "album_gain"),
    "media_q07_join_select": lambda t, s: join_select(t, ["Classical"]),
    "media_q08_avg_size_select": lambda t, s: avg_size_select(t),
}


def _make_media_builder(fn):
    def builder(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(media_tables(spark, FIXTURE_PATH), spark)

    return builder


for _name, _fn in _MEDIA_QUERIES.items():
    register(
        _name,
        oracle=_MEDIA_ORACLES[_name],
        doc="Reference canned query (params_queries.py:7-35) over the media warehouse fixture.",
        tags=("media", "canned"),
    )(_make_media_builder(_fn))


def artist_select_sql(spark: SparkSession, names: Sequence[str]) -> DataFrame:
    """Parameterized-SQL path (postgres_media.py:97-122 analog): binding is
    engine-side — no mogrify string splicing."""
    return spark.sql(ARTIST_SELECT, args={"names": list(names)})


def avg_size_select_sql(spark: SparkSession) -> DataFrame:
    return spark.sql(AVG_SIZE_SELECT)
