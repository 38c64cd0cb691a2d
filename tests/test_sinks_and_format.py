"""Side-output/remote sinks (K4/K9) and formatting functions (F14/F16/
F18), plus O3 scan provenance."""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import functions as F

from spotify_tags_etl_spark.etl.media import read_media_json
from spotify_tags_etl_spark.functions.format import build_search_url, readable_size, track_tag
from spotify_tags_etl_spark.sinks import foreach_partition_sink, save_debug_json

_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def test_readable_size_bands(spark):
    df = spark.createDataFrame(
        [(0,), (512,), (2048,), (1048576,), (5_368_709_120,)], "n long"
    )
    got = [r.s for r in df.select(readable_size("n").alias("s")).collect()]
    assert got == ["0.00 B", "512.00 B", "2.00 KiB", "1.00 MiB", "5.00 GiB"]


def test_track_tag_format(spark):
    df = spark.createDataFrame([(7, "Mazzy Star", "So Tonight", 2, "Fade Into You")],
                               "i int, artist string, album string, num int, title string")
    got = df.select(track_tag("i", "artist", "album", "num", "title").alias("t")).collect()[0].t
    assert got == "007 | Mazzy Star | So Tonight | 02-Fade Into You"


def test_build_search_url_deterministic():
    url = build_search_url("https://api.example.com/v1/search", {"q": "artist:Beck", "limit": 50, "type": "track"})
    assert url == "https://api.example.com/v1/search?limit=50&q=artist%3ABeck&type=track"


def test_save_debug_json_dated_path(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    path = save_debug_json(df, str(tmp_path), "search_results", date=datetime.date(2026, 8, 13))
    assert path == str(tmp_path / "api" / "2026-08-13" / "search_results")
    rows = []
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".json"):
                with open(os.path.join(root, f)) as fh:
                    rows += [json.loads(line) for line in fh if line.strip()]
    assert sorted(r["id"] for r in rows) == [1, 2]


def test_foreach_partition_sink_batches(spark, tmp_path):
    """Every row delivered exactly once; no request exceeds the API batch
    contract. The recording client writes per-batch files (executor-side,
    local[*] shares the FS)."""
    outdir = str(tmp_path / "api_calls")
    os.makedirs(outdir, exist_ok=True)

    def client_factory():
        import os as _os
        import uuid as _uuid

        def send(batch):
            assert len(batch) <= 50
            with open(_os.path.join(outdir, f"req-{_uuid.uuid4().hex}.json"), "w") as fh:
                json.dump([row.track_id for row in batch], fh)

        return send

    df = spark.range(0, 230).select(F.concat(F.lit("t"), F.col("id")).alias("track_id")).repartition(3)
    foreach_partition_sink(df, client_factory)
    sent = []
    for f in os.listdir(outdir):
        with open(os.path.join(outdir, f)) as fh:
            batch = json.load(fh)
        assert len(batch) <= 50
        sent += batch
    assert sorted(sent) == sorted(f"t{i}" for i in range(230))


def test_scan_provenance_column(spark):
    df = read_media_json(spark, os.path.join(_DATA, "*local*.json"), with_source_file=True)
    files = {r.source_file for r in df.select("source_file").distinct().collect()}
    assert len(files) == 1
    assert next(iter(files)).endswith("local_media_sample.json")


def test_jdbc_writer_option_passthrough(spark):
    """K1 JDBC sink: settings → writer options (no PG server in the test
    container; the option mapping + writer construction is the engine
    surface, .save() is deployment)."""
    from spotify_tags_etl_spark.settings import load_db_config, open_toml
    from spotify_tags_etl_spark.sinks import jdbc_writer

    cfg = open_toml(os.path.join(os.path.dirname(_DATA), "config", "settings_example.toml"))
    db = load_db_config(cfg)
    df = spark.range(3).select(F.col("id").alias("k"))
    writer = jdbc_writer(df, "warehouse.artist", db)
    # DataFrameWriter keeps options in a scala CaseInsensitiveMap
    opts = writer._jwrite.extraOptions()
    assert opts.apply("url") == "jdbc:postgresql://localhost:5432/media_db"
    assert opts.apply("dbtable") == "warehouse.artist"
    assert opts.apply("batchsize") == "10000"


def test_readable_size_null_and_nan_yield_null(spark):
    """NULL/NaN byte counts must map to NULL, not fall through the
    when-ladder into a 'nu PiB'/'NaN PiB' string from the PiB branch."""
    df = spark.createDataFrame([(None,), (float("nan"),), (2048.0,)], "n double")
    got = [r.s for r in df.select(readable_size("n").alias("s")).collect()]
    assert got[0] is None and got[1] is None
    assert got[2] == "2.00 KiB"


def test_decode_functions_ansi_safe(spark):
    """Malformed input yields null on an ANSI-on session (the vanilla
    Spark 4 default) — try_-variants, not throwing casts/parses."""
    from spotify_tags_etl_spark.functions.decode import (
        convert_added_at,
        convert_duration,
        convert_release_date,
    )

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame(
            [("abcd", "not-a-date", "abc"), ("2020-13-45", "x", "1"), ("2019-03-11", "2021-01-02T03:04:05Z", "61000")],
            "rd string, aa string, ms string",
        )
        rows = df.select(
            convert_release_date("rd").alias("rd"),
            convert_added_at("aa").alias("aa"),
            convert_duration("ms").alias("ms"),
        ).collect()
        assert rows[0].rd is None and rows[0].aa is None and rows[0].ms is None
        assert rows[1].rd is None and rows[1].aa is None
        assert str(rows[2].rd) == "2019-03-11"
        assert rows[2].aa is not None and rows[2].ms == "00:01:01"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
