"""Golden tests for the playlist pipeline (reference pipeline 2, SURVEY
§3.2): nested parse (F12), F3-F5 conversions, F7/F8 decode, validation
row-drop semantics, track_id dedup (A3), NDJSON export (K3).

The fixture data/liked_songs_api_sample.json is hand-built with every
edge the reference exercises: linked_from relinking, partial release
dates ('1994', '2013-06'), an unparseable date, invalid type /
popularity / track_number rows, an exact duplicate saved twice, and
non-ASCII names.
"""

from __future__ import annotations

import json
import os

import pytest

from spotify_tags_etl_spark.etl.playlist import (
    conform_audio_features,
    dedup_favorites,
    parse_favorites,
    read_audio_features_json,
    read_liked_songs_json,
    run_playlist_pipeline,
    split_audio_features,
    split_favorites,
)

_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
LIKED = os.path.join(_DATA, "liked_songs_api_sample.json")
FEATS = os.path.join(_DATA, "audio_features_api_sample.json")


@pytest.fixture(scope="module")
def parsed(spark):
    return parse_favorites(read_liked_songs_json(spark, LIKED)).cache()


def _by_id(df):
    return {r.track_id: r for r in df.collect()}


def test_parse_nested_fields(parsed):
    rows = _by_id(parsed)
    r1 = rows["trk001aaaaaaaaaaaaaaaa"]
    assert r1.artist_name == "Aurora Fade"
    assert r1.album_name == "City Lights"
    assert r1.duration == "00:03:35"           # F3: 215000 ms
    assert r1.release_date == "2019-05-17"     # F4: full precision
    assert r1.added_at == "2024-03-01 09:15:00"  # F5


def test_linked_from_relinking(parsed):
    # F12: the original id from linked_from wins over track.id
    assert "orig002cccccccccccccc" in _by_id(parsed)
    assert "trk002bbbbbbbbbbbbbbbb" not in _by_id(parsed)


def test_partial_release_dates(parsed):
    rows = _by_id(parsed)
    assert rows["trk003dddddddddddddddd"].release_date == "1994-01-01"   # len 4
    assert rows["orig002cccccccccccccc"].release_date == "2013-06-01"    # len 7
    assert rows["trk009jjjjjjjjjjjjjjjj"].release_date is None           # unparseable
    assert rows["trk010kkkkkkkkkkkkkkkk"].release_date == "2024-01-01"


def test_non_ascii_and_first_artist(parsed):
    rows = _by_id(parsed)
    assert rows["trk003dddddddddddddddd"].artist_name == "Björn Åkesson"
    # artists[0], not any other element
    assert rows["trk010kkkkkkkkkkkkkkkk"].artist_name == "Solstice Choir"


def test_long_duration_rollover(parsed):
    assert _by_id(parsed)["trk009jjjjjjjjjjjjjjjj"].duration == "01:02:05"  # 3725 s


def test_validation_row_drop_semantics(parsed):
    ok, bad = split_favorites(parsed)
    bad_ids = {r.track_id for r in bad.collect()}
    assert bad_ids == {
        "trk005ffffffffffffffff",  # type 'podcast' not in whitelist
        "trk006gggggggggggggggg",  # popularity 150
        "trk007hhhhhhhhhhhhhhhh",  # track_number -1
    }
    assert ok.count() + bad.count() == parsed.count()
    # 'episode' IS a valid IANA spotify type (models.py:17-25)
    assert "trk004eeeeeeeeeeeeeeee" in _by_id(ok)


def test_dedup_keeps_earliest_added(parsed):
    ok, _ = split_favorites(parsed)
    deduped = dedup_favorites(ok)
    assert deduped.count() == ok.count() - 1  # the twice-saved track collapses
    assert _by_id(deduped)["orig002cccccccccccccc"].added_at == "2024-03-02 18:00:30"


@pytest.fixture(scope="module")
def features(spark):
    return conform_audio_features(read_audio_features_json(spark, FEATS)).cache()


def test_pitch_and_mode_decode(features):
    rows = _by_id(features)
    assert rows["trk001aaaaaaaaaaaaaaaa"].key == "G"
    assert rows["trk001aaaaaaaaaaaaaaaa"].mode == "Major"
    assert rows["orig002cccccccccccccc"].key == "C"
    assert rows["orig002cccccccccccccc"].mode == "minor"
    assert rows["trk010kkkkkkkkkkkkkkkk"].key == "A#,B♭"
    # the reference's isdigit() gate: '-1' passes through UNdecoded
    assert rows["trk003dddddddddddddddd"].key == "-1"


def test_decimal_conformance(features):
    r = _by_id(features)["trk010kkkkkkkkkkkkkkkk"]
    assert str(r.danceability) == "0.123457"  # DECIMAL(7,6) half-up
    assert str(r.acousticness) == "1.000000"  # rounds up to the bound → still valid
    assert str(r.loudness) == "0.000"


def test_audio_feature_validation(features):
    ok, bad = split_audio_features(features)
    assert {r.track_id for r in bad.collect()} == {
        "trk011badbadbadbadbad1",  # acousticness 1.5 > 1
        "trk012badbadbadbadbad2",  # loudness > 0, tempo 0, time_signature 0
    }
    assert ok.count() == 4


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "playlist_out")
    res = run_playlist_pipeline(spark, LIKED, FEATS, out)
    assert res["liked_song"].count() == 6
    assert res["liked_quarantine"].count() == 3
    assert res["audio_feature"].count() == 4
    assert res["audio_feature_quarantine"].count() == 2
    # K3 NDJSON export round-trips
    lines = []
    for root, _, files in os.walk(os.path.join(out, "liked_song_records")):
        for f in files:
            if f.endswith(".json"):
                with open(os.path.join(root, f)) as fh:
                    lines.extend(json.loads(line) for line in fh if line.strip())
    assert len(lines) == 6
    assert {r["track_id"] for r in lines} == {r.track_id for r in res["liked_song"].collect()}
    # warehouse parquet readable
    assert spark.read.parquet(os.path.join(out, "warehouse", "liked_song")).count() == 6
