"""Catalog/DDL surface (S7/S8, K5-K7): database lifecycle, schema-from-
model table creation, insertable-column introspection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from spotify_tags_etl_spark.sources import catalog

_DB = "media_db_test"

ARTIST = StructType(
    [
        StructField("id", LongType()),
        StructField("artist_id", StringType()),
        StructField("artist_name", StringType()),
        StructField("composer", StringType()),
    ]
)
ALBUM = StructType(
    [
        StructField("id", LongType()),
        StructField("album_id", StringType()),
        StructField("album_title", StringType()),
        StructField("year", IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def warehouse(spark):
    catalog.drop_database(spark, _DB)
    catalog.create_database(spark, _DB)
    catalog.recreate_tables(spark, {"artist": ARTIST, "album": ALBUM}, database=_DB)
    yield spark
    catalog.drop_database(spark, _DB)


def test_show_tables(warehouse):
    assert catalog.show_tables(warehouse, _DB) == ["album", "artist"]


def test_table_columns_excludes_surrogate_key(warehouse):
    cols = catalog.table_columns(warehouse, f"{_DB}.artist")
    assert cols == ["artist_id", "artist_name", "composer"]  # 'id' dropped (Q11)


def test_insertable_projection_map(warehouse):
    m = catalog.insertable_projection(warehouse, _DB)
    assert m == {
        "album": ["album_id", "album_title", "year"],
        "artist": ["artist_id", "artist_name", "composer"],
    }


def test_recreate_is_idempotent_and_writable(warehouse):
    catalog.recreate_tables(warehouse, {"artist": ARTIST}, database=_DB)
    df = warehouse.createDataFrame([(1, "a1", "Mazzy Star", None)], ARTIST)
    df.write.mode("append").saveAsTable(f"{_DB}.artist")
    assert warehouse.table(f"{_DB}.artist").count() == 1


def test_approx_percentile_accuracy(spark):
    """av12 (sketch) must track av05 (exact) closely — the contract that
    makes it a legitimate 100 TB substitute. Uses sf0.01 (~2000-row
    groups): the sketch returns a real data element, so tiny groups
    differ from interpolated quantiles by the inter-element gap."""
    from pyspark.sql import functions as F

    from spotify_tags_etl_spark.operators.advanced import _AV12_ACCURACY, _quantile_agg
    from spotify_tags_etl_spark.plans import registry

    sf_dir = "/root/testdata/sf0.01"
    exact = {r.event_type: (r.p25, r.p50, r.p75, r.p95)
             for r in registry.get("av05_percentiles").builder(spark, sf_dir).collect()}
    sketch = _quantile_agg(
        spark, sf_dir, lambda c, levels: F.percentile_approx(c, levels, F.lit(_AV12_ACCURACY))
    )
    approx = {r.event_type: (r.p25, r.p50, r.p75, r.p95) for r in sketch.collect()}
    assert set(exact) == set(approx)
    for et in exact:
        for e, a in zip(exact[et], approx[et]):
            assert a == pytest.approx(e, rel=0.02, abs=1.0)  # within 2% at accuracy=10000
    # The registered av12 surface is the tolerance verdict: every cell TRUE.
    for r in registry.get("av12_approx_percentile").builder(spark, sf_dir).collect():
        assert r.p25_ok and r.p50_ok and r.p75_ok and r.p95_ok and r.n_rows > 0


def test_show_tables_excludes_temp_views(spark):
    """Temp views leak into listTables(db); qualifying one as db.view is
    unresolvable — show_tables/insertable_projection must skip them."""
    from spotify_tags_etl_spark.sources import catalog

    spark.sql("CREATE DATABASE IF NOT EXISTS tvleak_db")
    try:
        spark.createDataFrame([(1,)], "x int").write.mode("overwrite").saveAsTable("tvleak_db.realtbl")
        spark.createDataFrame([(2,)], "y int").createOrReplaceTempView("leaky_view")
        assert catalog.show_tables(spark, "tvleak_db") == ["realtbl"]
        proj = catalog.insertable_projection(spark, "tvleak_db", exclude=())
        assert proj == {"realtbl": ["x"]}
    finally:
        spark.catalog.dropTempView("leaky_view")
        spark.sql("DROP DATABASE IF EXISTS tvleak_db CASCADE")
