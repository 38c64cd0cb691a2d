"""Formatting scalar functions (SURVEY.md §2.8 F14, F16, F18) — pure
column expressions, no UDFs.

* F14 ``readable_size`` (util/logger.py:11-20): bytes → '1.23 MiB'
  (÷1024 ladder; the reference divides by 1000 but labels with binary
  units — we implement true binary units and note the divergence).
* F16 URL building (spotify_client.py:225): driver-side query-string
  assembly for the paged source; exposed for parity, not a column op.
* F18 track_tag (postgres_media.py:256-260):
  ``'%03d | %s | %s | %02d-%s'`` printf formatting via format_string.
"""

from __future__ import annotations

from urllib.parse import urlencode

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNITS = ("B", "KiB", "MiB", "GiB", "TiB", "PiB")


def readable_size(nbytes: Column | str, precision: int = 2) -> Column:
    """F14: byte count → human-readable string, binary (1024) units.

    A when-ladder over log-1024 bands — codegen'd, no UDF. (The
    reference's loop divides by 1000 while printing KiB/MiB; we use the
    honest 1024 so '1048576' → '1.00 MiB'.)
    """
    c = (F.col(nbytes) if isinstance(nbytes, str) else nbytes).cast("double")
    # NULL/NaN fail every `c < bound` and would fall into the PiB
    # otherwise-branch, where format_string renders 'nu PiB'/'NaN PiB';
    # the contract (and the q34 oracle's CASE-over-NULL) is null → null.
    expr = F.when(c.isNull() | F.isnan(c), F.lit(None).cast("string"))
    for i, unit in enumerate(_UNITS):
        bound = float(1024 ** (i + 1))
        # round() BEFORE formatting: %.2f ties round half-even in C
        # (DuckDB) but half-up in Java (Spark); round() is half-up in
        # both, and a pre-rounded value can never tie at format time.
        cond = F.format_string(f"%.{precision}f {unit}", F.round(c / float(1024**i), precision))
        if i < len(_UNITS) - 1:
            expr = expr.when(c < bound, cond)
        else:
            expr = expr.otherwise(cond)
    return expr


def track_tag(
    index: Column | str, artist: Column | str, album: Column | str, number: Column | str, title: Column | str
) -> Column:
    """F18: ``f"{i:03d} | {artist} | {album} | {number:02d}-{title}"``."""
    col = lambda c: F.col(c) if isinstance(c, str) else c  # noqa: E731
    return F.format_string("%03d | %s | %s | %02d-%s", col(index), col(artist), col(album), col(number), col(title))


def build_search_url(base: str, params: dict[str, str | int]) -> str:
    """F16 (driver-side source plumbing): deterministic query-string
    assembly for the paged REST source."""
    return f"{base}?{urlencode(sorted(params.items()))}"
