"""The reference's 8 canned parameterized queries (params_queries.py:7-35).

Each query exists twice, sharing semantics:

* a DataFrame builder over the warehouse split frames;
* a parameterized SQL template run via ``spark.sql(template, args=...)``
  over the registered temp views — the Spark-native analog of the
  reference's mogrify/execute path (``postgres_media.py:97-122``).

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
# Driver registrations: the canned queries run on the engine's own media
# warehouse (built from the repo fixture), which the driver's DuckDB views
# can't see → rows-only checks. Exact-value parity is covered by
# tests/test_media_etl.py golden assertions + a local DuckDB oracle.
# ---------------------------------------------------------------------------

import os as _os

from spotify_tags_etl_spark.etl.media import register_media_views
from spotify_tags_etl_spark.plans.registry import register

FIXTURE_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "data",
    "local_media_sample.json",
)

_MEDIA_QUERIES = {
    "media_q01_artist_select": lambda t, s: artist_select(t, ["Velvet Harbor"]),
    "media_q02_album_select": lambda t, s: album_select(t, ["First Light"]),
    "media_q03_track_select": lambda t, s: track_select(t, ["Future Proof"]),
    "media_q04_genre_select": lambda t, s: genre_select(t, ["Trip-Hop", "Alternative"]),
    "media_q05_file_select": lambda t, s: file_select(t, ".flac"),
    "media_q06_gain_select": lambda t, s: gain_select(t, -4.0),
    "media_q07_join_select": lambda t, s: join_select(t, ["Classical"]),
    "media_q08_avg_size_select": lambda t, s: avg_size_select(t),
}


def _make_media_builder(fn):
    def builder(spark: SparkSession, sf_dir: str) -> DataFrame:
        tables = register_media_views(spark, FIXTURE_PATH)
        return fn(tables, spark)

    return builder


for _name, _fn in _MEDIA_QUERIES.items():
    register(
        _name,
        oracle=None,
        doc="Reference canned query (params_queries.py:7-35) over the media warehouse fixture.",
        tags=("media", "canned"),
    )(_make_media_builder(_fn))


def artist_select_sql(spark: SparkSession, names: Sequence[str]) -> DataFrame:
    """Parameterized-SQL path (postgres_media.py:97-122 analog): binding is
    engine-side — no mogrify string splicing."""
    return spark.sql(ARTIST_SELECT, args={"names": list(names)})


def avg_size_select_sql(spark: SparkSession) -> DataFrame:
    return spark.sql(AVG_SIZE_SELECT)
