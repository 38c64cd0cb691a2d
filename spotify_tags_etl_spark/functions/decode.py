"""Scalar decode/convert functions (SURVEY.md §2.8 F3-F8) as pure
column expressions — JVM-side, whole-stage codegen, no UDFs.

Reference semantics being matched:

* F3 ``convert_duration`` (spotify_client.py:328-344): ms → 'HH:MM:SS'.
* F4 ``convert_release_date`` (spotify_client.py:346-374): partial-
  precision dates — 'YYYY' → Jan 1, 'YYYY-MM' → 1st of month,
  'YYYY-MM-DD' → as-is, anything else → null.
* F5 ``convert_added_at`` (spotify_client.py:376-391): ISO-8601 'Z'
  suffixed UTC instant → timestamp.
* F7 pitch-class decode (models.py:76-90,156-161): key '-1'..'11' →
  '' / 'C' / 'C#,D♭' / ….
* F8 mode decode (models.py:93-97,163-168): '0' → 'minor',
  '1' → 'Major'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: F7 — pitch-class notation map (reference models.py:76-90).
PITCH_CLASS: dict[str, str] = {
    "-1": "",
    "0": "C",
    "1": "C#,D♭",
    "2": "D",
    "3": "D#,E♭",
    "4": "E,F♭",
    "5": "F,E#",
    "6": "F#,G♭",
    "7": "G",
    "8": "G#,A♭",
    "9": "A",
    "10": "A#,B♭",
    "11": "B,C♭",
}

#: F8 — modality decode (reference models.py:93-97).
MODE: dict[str, str] = {"0": "minor", "1": "Major"}


def _map_literal(mapping: dict[str, str]) -> Column:
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


_DIGITS_RE = "^[0-9]+$"


def decode_pitch_class(key: Column | str) -> Column:
    """F7: pitch-class code → notation.

    Faithful to the reference validator (models.py:156-161), which only
    rewrites ``v.isdigit()`` values — so '-1' (no key detected) passes
    through UNdecoded even though the map has an entry for it; unmapped
    digit codes (e.g. '12') become null, matching ``dict.get``.
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.when(c.rlike(_DIGITS_RE), _map_literal(PITCH_CLASS)[c]).otherwise(c)


def decode_mode(mode: Column | str) -> Column:
    """F8: '0'/'1' → 'minor'/'Major'; non-digit input passes through
    (models.py:163-168 has the same ``isdigit`` gate)."""
    c = F.col(mode) if isinstance(mode, str) else mode
    return F.when(c.rlike(_DIGITS_RE), _map_literal(MODE)[c]).otherwise(c)


def convert_duration(ms: Column | str) -> Column:
    """F3: milliseconds → 'HH:MM:SS' string (reference parses via epoch;
    equivalent to formatting the epoch-seconds instant in UTC)."""
    c = F.col(ms) if isinstance(ms, str) else ms
    # try_cast: a malformed duration yields null on ANY session — a plain
    # cast throws CAST_INVALID_INPUT under ANSI mode (the vanilla Spark 4
    # default), making results depend on which session the caller built.
    return F.date_format(F.timestamp_seconds(c.try_cast("bigint") / F.lit(1000)), "HH:mm:ss")


def convert_release_date(s: Column | str) -> Column:
    """F4: partial-precision release date → DateType.

    len 4 → YYYY-01-01; len 7 → YYYY-MM-01; len 10 → full parse;
    anything else → null (exactly spotify_client.py:360-371).

    try_to_date (not to_date): the length guard admits malformed content
    like 'abcd' or '2020-13-45', which must yield null per the contract —
    to_date would throw under ANSI mode (the vanilla Spark 4 default).
    """
    c = F.col(s) if isinstance(s, str) else s
    return (
        F.when(F.length(c) == 4, F.try_to_date(F.concat(c, F.lit("-01-01"))))
        .when(F.length(c) == 7, F.try_to_date(F.concat(c, F.lit("-01"))))
        .when(F.length(c) == 10, F.try_to_date(c))
        .otherwise(F.lit(None).cast("date"))
    )


def convert_added_at(s: Column | str) -> Column:
    """F5: 'YYYY-MM-DDTHH:MM:SSZ' → UTC timestamp (session tz is UTC).

    try_to_timestamp: malformed input is null on any session, not a
    CANNOT_PARSE_TIMESTAMP abort under ANSI mode."""
    c = F.col(s) if isinstance(s, str) else s
    return F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))
