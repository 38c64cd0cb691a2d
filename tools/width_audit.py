#!/usr/bin/env python
"""Source-level numeric-width lint: every product-valued SUM must be
128-bit or allowlisted.

The round-5 width audit (BASELINE.md, tests/test_money_width.py) found
that Spark's ``SUM(BIGINT)`` silently wraps mod 2^64 once a group's
total passes 2^63 while the DuckDB oracles promote to HUGEINT — so any
sum whose addend is a PRODUCT (micros = cents x basis-points, second
moments, sketch inner products) must accumulate in DECIMAL(38,0) /
HUGEINT on the respective side. This lint keeps that a property of the
whole repo rather than of the sites the audit happened to visit: it
extracts the balanced-paren argument of every ``F.sum(...)`` and SQL
``SUM(...)`` under ``spotify_tags_etl_spark/`` and flags arguments that
multiply two non-literal terms without a DECIMAL/HUGEINT widening.

Bounded product sums are fine in long arithmetic when the addend or the
group cardinality is provably small — those sites are allowlisted BELOW
WITH THEIR JUSTIFICATION so a reviewer can audit the claims, and any
new unhardened product sum fails tests/test_money_width.py until it is
either widened or allowlisted with a reason.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PKG = os.path.join(ROOT, "spotify_tags_etl_spark")

#: Allowlisted product-sum snippets (normalized whitespace, prefix
#: match) with the boundedness argument that justifies long arithmetic.
ALLOWLIST = {
    # pagerank fixed-point contributions: Σ contrib per dst is bounded by
    # the CONSERVED total mass |V|*PR_SCALE (mass only leaks to floors),
    # which stays well under 2^63 at any graph the event corpus induces.
    "(rank * cnt) DIV out_w": "conserved fixed-point mass <= |V|*PR_SCALE",
    "(85 * coalesce(contrib, 0)) DIV 100": "damped share of conserved mass",
    # yb02 TF-IDF pair scores: per-pair shared vocabulary is bounded by
    # document length and the df<=100 cap bounds posting lists; addend
    # tf*tf*idf <= len^2 * 1e6 with len the SHORTER doc's term count.
    "a.tf * b.tf * a.idf": "per-pair shared-vocab sum, df-capped index",
    "tf_a * tf_b * idf_a": "per-pair shared-vocab sum, df-capped index",
    # int8-quantized dot products: |q|,|w| <= 127, dimension fixed (64),
    # so a dot is <= 127*127*64 ~ 1e6 — int64-safe by ~12 orders.
    "q.q * w.w": "int8 x int8 over fixed dim",
    "a.q * b.q": "int8 x int8 over fixed dim",
    "a.p * b.p": "int8 PQ codes over fixed dim",
    "q.c * c.c": "int8 PQ distance table over fixed dim",
    # yd03 census prefix sums: Σ(cx*v) over the whole census equals the
    # side's total cents (<= ~1e17 at 100 TB event volumes) — the 128-bit
    # work happens in the downstream pairwise terms, which ARE widened.
    "cx * v": "census count x cents; total = side's exact cents sum",
    "cy * v": "census count x cents; total = side's exact cents sum",
    # daily-gap window: addend day-count x #days, frame is O(#days).
    "d.c * b.nd - b.total": "O(#days) frame of day-count products",
}


def _normalize(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def _balanced_arg(text: str, start: int) -> str:
    """Return the balanced-paren argument beginning at text[start] == '('."""
    depth = 0
    for i in range(start, min(len(text), start + 4000)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    return text[start + 1 : start + 4000]


#: a multiply between two term-like operands (identifier/paren/number on
#: both sides) — excludes '**', glob stars, and SQL comments.
_MUL = re.compile(r"[\w\)\]]\s*\*\s*[\w\(]")

#: evidence the site is already widened (either engine's spelling).
_WIDE = re.compile(r"decimal\s*\(\s*38|HUGEINT", re.IGNORECASE)

#: CASE WHEN <cond> THEN 0/1-style indicator sums: the product lives in
#: the comparison, the SUMMED value is an indicator — long is correct.
_INDICATOR = re.compile(r"CASE\s+WHEN\s+.*\bTHEN\s+1\b.*\bELSE\s+0\b", re.IGNORECASE | re.DOTALL)


def scan() -> list[tuple[str, int, str]]:
    """(relpath, lineno, normalized-arg) for every unhardened, non-
    allowlisted product sum under the package."""
    hits: list[tuple[str, int, str]] = []
    for dirpath, _dirnames, filenames in os.walk(PKG):
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            text = open(path, encoding="utf-8").read()
            for m in re.finditer(r"(?:F\.sum|\bSUM)\s*(\()", text):
                arg = _balanced_arg(text, m.start(1))
                if not _MUL.search(arg):
                    continue
                if _WIDE.search(arg) or _INDICATOR.search(arg):
                    continue
                norm = _normalize(arg)
                if any(norm.startswith(a) or a in norm for a in ALLOWLIST):
                    continue
                lineno = text.count("\n", 0, m.start()) + 1
                hits.append((os.path.relpath(path, ROOT), lineno, norm[:120]))
    return hits


def main() -> int:
    hits = scan()
    if not hits:
        print("width audit clean: every product sum is 128-bit or allowlisted")
        return 0
    print(f"{len(hits)} unaudited product sum(s):")
    for path, lineno, snippet in hits:
        print(f"  {path}:{lineno}  SUM({snippet}...)")
    print("widen to DECIMAL(38,0)/HUGEINT or allowlist WITH JUSTIFICATION in tools/width_audit.py")
    return 1


if __name__ == "__main__":
    sys.exit(main())
