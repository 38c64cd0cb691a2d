"""Vector-expression helpers for the embedding hot paths.

The one transferable optimization here is HOISTING: keep per-element
casts/floors out of per-PAIR loops. ``quantize_long`` runs once per row
(O(rows x dim)); the pair-scoring fold then reduces to the minimal
``x * y`` lambda (O(pairs x dim) multiplies, nothing else).

A measured negative result worth keeping (r12 optimization round):
Spark's higher-order functions (``zip_with``/``aggregate``) are
CodegenFallback — interpreted, boxed per element — and unrolling a
fixed-dim dot product into a flat 64-term arithmetic expression DOES
make the executed stage faster (1.85 s -> 0.93-1.07 s on the yv02 pair
loop in a single-expression micro-bench). But in the real queries the
unrolled trees (16-32 projections x 64 GetArrayItem terms) made every
run SLOWER end-to-end — 2-6x worse (ss02 2.8 -> 18 s, zc03 2.0 ->
10.7 s isolated medians) — because per-run analysis/optimization/codegen
walks the 64x larger expression tree each execution and planning
dominates these queries. The zip_with spellings in
similarity.py/zcops.py/zdops.py are therefore the RIGHT form; do not
"optimize" them into flat expressions without re-measuring end-to-end
(plan + execute), not just the stage. Details: OPTIMIZATION_r12.md.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize_long(col: str, scale: int = 127) -> Column:
    """Per-element int quantization (one pass per ROW, hoisted out of
    any downstream per-pair fold): ``transform(col, v ->
    CAST(floor(CAST(v AS DOUBLE) * scale) AS BIGINT))`` — the floor
    spelling shared by vx02/ye01/yv02/zc03."""
    return F.expr(
        f"transform({col}, v -> CAST(floor(CAST(v AS DOUBLE) * {scale}) AS BIGINT))"
    )
