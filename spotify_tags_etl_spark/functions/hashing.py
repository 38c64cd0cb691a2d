"""Deterministic hash-fraction helpers shared by every sampling/split
operator and its DuckDB oracle.

One definition on purpose: the md5-first-8-hex / 2^32 fraction is
determinism-CRITICAL (splits, mixtures, cluster caps all key on it), and
parity between the Spark and SQL forms must never drift. Import these;
do not re-derive the expression locally."""

from __future__ import annotations

from pyspark.sql import functions as F

#: 2^32 — the uint32 domain of the first 8 md5 hex chars.
BUCKET_DENOM = float(1 << 32)


def hash_frac(col) -> F.Column:
    """Deterministic uniform [0,1) from md5 of the key — identical in any
    engine (first 8 hex chars of md5 as uint32 / 2^32)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("double") / F.lit(
        BUCKET_DENOM
    )


def hash_frac_sql(expr: str) -> str:
    """DuckDB mirror of :func:`hash_frac` (bit-identical)."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))::UBIGINT AS DOUBLE) / {BUCKET_DENOM}"
