"""Property-based tests for the F3-F8 decode/convert functions (SURVEY
§5.4): partial-date semantics, duration formatting, pitch/mode gates."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spotify_tags_etl_spark.functions.decode import (
    MODE,
    PITCH_CLASS,
    convert_duration,
    convert_release_date,
    decode_mode,
    decode_pitch_class,
)


def _one(spark, col_expr, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col_expr.alias("out")).collect()[0].out


@settings(max_examples=25, deadline=None)
@given(st.dates(min_value=datetime.date(1900, 1, 1), max_value=datetime.date(2099, 12, 31)))
def test_release_date_precision_ladder(spark, d):
    """For any date: 'YYYY' → Jan 1, 'YYYY-MM' → 1st, 'YYYY-MM-DD' → exact
    (spotify_client.py:360-371 semantics)."""
    iso = d.isoformat()
    assert _one(spark, convert_release_date(F.col("v")), iso[:4]) == d.replace(month=1, day=1)
    assert _one(spark, convert_release_date(F.col("v")), iso[:7]) == d.replace(day=1)
    assert _one(spark, convert_release_date(F.col("v")), iso) == d


def test_release_date_invalid_lengths_null(spark):
    for bad in ("", "199", "19999", "2020-1", "bad-date", "2020-01-01T00"):
        assert _one(spark, convert_release_date(F.col("v")), bad) is None


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=86_399_999))
def test_duration_matches_python_formula(spark, ms):
    got = _one(spark, convert_duration(F.col("v").cast("long")), str(ms))
    s = ms // 1000
    assert got == f"{s // 3600:02d}:{(s % 3600) // 60:02d}:{s % 60:02d}"


def test_pitch_decode_table_and_gate(spark):
    # every digit code decodes per the map; '-1' passes through undecoded
    for code, want in PITCH_CLASS.items():
        got = _one(spark, decode_pitch_class(F.col("v")), code)
        assert got == (code if code == "-1" else want)
    assert _one(spark, decode_pitch_class(F.col("v")), "12") is None  # unmapped digit
    assert _one(spark, decode_pitch_class(F.col("v")), "G") == "G"    # already decoded


def test_mode_decode_table_and_gate(spark):
    for code, want in MODE.items():
        assert _one(spark, decode_mode(F.col("v")), code) == want
    assert _one(spark, decode_mode(F.col("v")), "Major") == "Major"
    assert _one(spark, decode_mode(F.col("v")), "7") is None
