"""Fuzzy top-1 match (J3) + offline lookup (J4) behavior tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_tags_etl_spark.functions.text import indel_ratio, normalize_text
from spotify_tags_etl_spark.operators.fuzzy import fuzzy_top_match, offline_lookup


@pytest.fixture(scope="module")
def frames(spark):
    local = spark.createDataFrame(
        [("Velvet Harbour",), ("Quiet Atlas",), ("Bjork",), ("Zzzz Qqqq",)],
        "keyword string",
    )
    candidates = spark.createDataFrame(
        [("Velvet Harbor", "a1"), ("Quiet Atlas", "a2"), ("Björk", "a3"), ("Lantern Motel", "a4")],
        "cand_name string, cand_id string",
    )
    return local, candidates


def test_exact_match_scores_100(spark, frames):
    local, candidates = frames
    matches, _ = fuzzy_top_match(local, candidates, "keyword", "cand_name", threshold=70.0, block=False)
    got = {r.keyword: (r.best_name, r.score) for r in matches.collect()}
    assert got["Quiet Atlas"] == ("Quiet Atlas", 100.0)
    # deaccent: Björk normalizes to Bjork → exact
    assert got["Bjork"] == ("Björk", 100.0)


def test_near_match_and_threshold_split(spark, frames):
    local, candidates = frames
    matches, audit = fuzzy_top_match(local, candidates, "keyword", "cand_name", threshold=70.0, block=False)
    got = {r.keyword: r for r in matches.collect()}
    expected = indel_ratio("velvet harbour", "velvet harbor")
    assert got["Velvet Harbour"].best_name == "Velvet Harbor"
    assert got["Velvet Harbour"].score == expected
    # the nonsense keyword's best match lands below threshold → audit frame
    audit_rows = audit.collect()
    assert [r.keyword for r in audit_rows] == ["Zzzz Qqqq"]
    assert all(r.score < 70.0 for r in audit_rows)


def test_blocked_path_agrees_on_matches(spark, frames):
    local, candidates = frames
    exact, _ = fuzzy_top_match(local, candidates, "keyword", "cand_name", threshold=70.0, block=False)
    blocked, _ = fuzzy_top_match(local, candidates, "keyword", "cand_name", threshold=70.0, block=True)
    e = {(r.keyword, r.best_name, r.score) for r in exact.collect()}
    b = {(r.keyword, r.best_name, r.score) for r in blocked.collect()}
    assert b == e  # same-prefix candidates survive the block rule here


def test_offline_lookup_default(spark):
    local = spark.createDataFrame([("Velvet Harbor",), ("Unknown Band",)], "artist_name string")
    ids = spark.createDataFrame([("Velvet Harbor", "a1")], "name string, id string")
    got = {r.artist_name: r.matched_id for r in offline_lookup(local, ids, "artist_name").collect()}
    assert got == {"Velvet Harbor": "a1", "Unknown Band": "not_found"}


def test_normalize_udf_matches_python(spark):
    from spotify_tags_etl_spark.functions.text import normalize_udf

    vals = ["Björk", "A & B  (c)", None, "  x   y "]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(normalize_udf(F.col("s")).alias("n"))
    assert [r.n for r in df.collect()] == [normalize_text(v) for v in vals]
