#!/usr/bin/env python
"""Source-level numeric-width lint: Spark-side product sums must be
128-bit, operand-widened, or allowlisted with a justification.

The round-5 width audit (BASELINE.md, tests/test_money_width.py) found
that Spark's ``SUM(BIGINT)`` silently wraps mod 2^64 once a group's
total passes 2^63 while the DuckDB oracles promote to HUGEINT — so any
Spark-side sum whose addend is a PRODUCT (micros = cents x basis-points,
second moments, sketch inner products) must accumulate in DECIMAL(38,0).
This lint keeps that a property of the whole repo rather than of the
sites the audit happened to visit. ``tests/test_money_width.py::
test_width_audit_clean`` runs ``scan()`` and fails on any new
unhardened product sum until it is widened or allowlisted with a reason.

What counts as a product sum: a SUM argument containing a multiply
whose operands are BOTH non-literal (``value * 100`` is a scale
conversion, not a product — its addend is one bounded term).

What counts as widened:

* ``DECIMAL(38,...)`` / ``HUGEINT`` spelled inside the argument (either
  engine's syntax), or the ``{dec}`` f-string placeholder — every
  ``dec = ...`` assignment under the package is pinned to
  ``"DECIMAL(38,0)"`` by the same test, so the placeholder IS the
  widening;
* a factor that is a bare identifier whose defining assignment (earlier
  in the same file) casts it to ``decimal(38,...)`` — Spark promotes a
  ``decimal * long`` multiply to decimal, so widening one factor at its
  definition site widens every product it enters (the ``cd, ud =
  c.cast("decimal(38,0)"), ...`` pattern).

SQL-string sums that are NOT Spark SQL (no ``spark.sql`` / ``F.expr`` /
``selectExpr`` adjacent) are DuckDB oracle text and are exempt: DuckDB's
integer SUM accumulator promotes to HUGEINT (exact), and a per-row
multiply that overflows int64 ERRORS loudly there rather than wrapping —
the silent-divergence class this lint hunts lives on the Spark side.
The per-row-overflow class (factors themselves near 2^63, av13's u*u)
was audited separately and those sites carry explicit HUGEINT casts.

Indicator sums (``CASE WHEN <product cond> THEN 1 ELSE 0``,
``F.when(cond, 1).otherwise(0)``) sum a 0/1 value — exempt.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PKG = os.path.join(ROOT, "spotify_tags_etl_spark")

#: Allowlisted product-sum arguments (normalized whitespace, ANCHORED:
#: the normalized argument must START with the key) with the
#: boundedness argument that justifies long arithmetic.
#: za/zb band disposition (r7 verdict item 7) — these sites are NOT
#: allowlist entries because the auditor already classifies them, but
#: the addend math belongs here with the rest:
#:
#: * za02 Bradley–Terry `t` accumulator: addend `2n * ZA02_SCALE //
#:   (s_i + s_j)` with n <= #battles (~1e5 at sf0.1, ~1e8 at SF100)
#:   and SCALE = 1e12 -> the NUMERATOR 2n*SCALE reaches ~2e20 > 2^63,
#:   so BOTH engines widen before the multiply: Spark
#:   `CAST(2 * n AS DECIMAL(38,0)) * SCALE` (zaops.py:275, matched by
#:   the _WIDE decimal(38 pattern), DuckDB `CAST(2 * e.n AS HUGEINT)`
#:   (oracle side, HUGEINT-exempt). The SUM itself runs over <= 6
#:   models' opponents — O(#models) addends.
#: * zb03 importance: `SUM(w)` is NOT a product sum (the per-bucket
#:   weight w = tgt_ppm - raw_ppm is precomputed, |w| <= 1e6) — the
#:   auditor's SUM(a*b) scanner rightly skips it; per-doc addend count
#:   = n_grams <= words/doc, so |importance| <= 1e6 * doc_words:
#:   int64-safe past 9e12-word documents. The ppm weights themselves
#:   widen the numerator (DECIMAL(38,0)/HUGEINT, zaops.py ~:1045)
#:   because tgt_n * 1e6 can pass 2^63 at 100 TB gram counts.
ALLOWLIST = {
    # zd04 per-band token masses: con is a 0/1 flag and tok is clamped
    # to the 4096-token window, so the addend is <= 4096 — the per-band
    # SUM stays int64-safe past 2e15 docs per band (same bound as
    # zc01/zc06's kept-token sums).
    "(1 - con) * tok": "0/1 flag x window-clamped tokens, addend <= 4096",
    "con * tok": "0/1 flag x window-clamped tokens, addend <= 4096",
    # zg01 per-band first-drop token attribution: every reason column
    # (kept, r_exact, r_near, r_sem, r_con, r_off) is a mutually-
    # exclusive 0/1 flag and tok is clamped to the 4096-token window —
    # zd04's bound widened to the full lineage (addend <= 4096, per-band
    # SUM int64-safe past 2e15 docs per band).
    "kept * tok": "0/1 first-drop flag x window-clamped tokens, addend <= 4096",
    "r_exact * tok": "0/1 first-drop flag x window-clamped tokens, addend <= 4096",
    "r_near * tok": "0/1 first-drop flag x window-clamped tokens, addend <= 4096",
    "r_sem * tok": "0/1 first-drop flag x window-clamped tokens, addend <= 4096",
    "r_con * tok": "0/1 first-drop flag x window-clamped tokens, addend <= 4096",
    "r_off * tok": "0/1 first-drop flag x window-clamped tokens, addend <= 4096",
    # zg04 datasheet intersection: cur and gk are 0/1 flags (curation
    # survivor x gate keep), tok is window-clamped — addend <= 1 for
    # the count, <= 4096 for the token mass (same bounds as above).
    "cur * gk": "product of 0/1 flags (x window-clamped tok), addend <= 4096",
    # zg09's fixed drop_long term (the threshold-varying terms are
    # interpolated and don't surface): product of 0/1 rule flags.
    "(1 - r_short) * r_long": "product of 0/1 rule flags; addend <= 1",
    # zf01 first-drop attribution: every factor is a 0/1 stage flag, so
    # each addend is 0 or 1 — the SUM is a plain count, int64-safe past
    # 9e18 docs (zd01 carries the same arithmetic via an interpolated
    # variable, which is why only these literal spellings surface here).
    "s_e * f_near": "product of 0/1 stage flags; addend <= 1",
    "s_e * (1 - f_near)": "product of 0/1 stage flags; addend <= 1",
    # zf02's close-time attribution runs on the exact-keeps frame, so
    # the s_e factor is implicit — same 0/1 flag algebra
    "(1 - f_near) * f_sem": "product of 0/1 stage flags; addend <= 1",
    "(1 - f_near) * (1 - f_sem)": "product of 0/1 stage flags; addend <= 1",
    # zh02 per-band system-granularity token attribution: d_rules /
    # d_funnel / d_gate are mutually-exclusive first-fail 0/1 flags
    # (products of 0/1 rule+stage flags) and tok is window-clamped —
    # zg01's bound at system granularity (addend <= 4096).
    "d_rules * tok": "0/1 first-fail system flag x window-clamped tokens, addend <= 4096",
    "d_funnel * tok": "0/1 first-fail system flag x window-clamped tokens, addend <= 4096",
    # zi01/zi02 unified keep-set counting: _RP, _FP, and gk are each
    # products of 0/1 rule/stage/gate flags, so every addend is 0 or 1
    # — the SUM is a plain count, int64-safe past 9e18 docs (zh01
    # carries the same selector algebra via interpolated _ZH01_STAGES
    # exprs, which is why only zi's literal spellings surface here).
    "({_RP}) * ({_FP}) * ({gk})": "product of 0/1 selector flags; addend <= 1",
    "({_RP}) * (1 - ({_FP}))": "product of 0/1 selector flags; addend <= 1",
    "({_RP}) * ({_FP}) * (1 - ({gk}))": "product of 0/1 selector flags; addend <= 1",
    "d_gate * tok": "0/1 first-fail system flag x window-clamped tokens, addend <= 4096",
    # zh05 pairwise overlap sums: both factors are parenthesized 0/1
    # system verdicts (products/complements of 0/1 flags), so each
    # addend is 0 or 1 — plain counts, int64-safe past 9e18 docs
    # (zg08's bound; surfaces here because the f-string interpolates
    # whole parenthesized verdicts).
    "({_ZH05_SYSTEMS[i][1]}) * ({_ZH05_SYSTEMS[j][1]})": "product of 0/1 system verdicts; addend <= 1",
    # zc04 per-doc importance: n = gram occurrences per (doc, bucket)
    # (bounded by document length), |w| <= 1e6 (a ppm difference), so
    # the addend is <= doc_grams x 1e6 and the per-doc SUM stays
    # int64-safe past 9e12 grams per document — same bound as batch
    # zb03's SUM(w) over gram rows, just pre-aggregated per bucket.
    "n * w": "gram-count x ppm-weight, addend <= doc_grams x 1e6",
    # ze01 oracle weight checksum: w is HUGEINT (declared in w0 and
    # propagated through every w{r}), bucket+2 <= 65, so the product and
    # SUM stay in HUGEINT; the engine-side twin is a Python-int fold
    # (arbitrary precision) — both sides are overflow-free by type.
    "w * (bucket + 2)": "HUGEINT weight x small constant; engine twin is Python int",
    # yb02 TF-IDF pair scores: per-pair shared vocabulary is bounded by
    # document length and the df<=100 cap bounds posting lists; addend
    # tf*tf*idf <= len^2 * 1e6 with len the SHORTER doc's term count.
    'F.col("tf_a") * F.col("tf_b") * F.col("idf_a")': "per-pair shared-vocab sum, df-capped index",
    # int8-quantized dot products: |q|,|w| <= 127, dimension fixed (64),
    # so a dot is <= 127*127*64 ~ 1e6 — int64-safe by ~12 orders.
    'F.col("q") * F.col("w")': "int8 x int8 over fixed dim 64",
    'F.col("qv") * F.col("cv")': "int8 x int8 over fixed dim 64",
    'F.col("qp") * F.col("cp")': "int8 PQ distance table over fixed dim",
    # daily-gap window: addend day-count x #days, frame is O(#days).
    'F.col("c") * F.col("nd") - F.col("total")': "O(#days) frame of day-count products",
    # pagerank fixed-point contributions: Σ contrib per dst is bounded by
    # the CONSERVED total mass |V|*PR_SCALE (mass only leaks to floors),
    # which stays well under 2^63 at any graph the event corpus induces.
    'F.expr("(rank * cnt) DIV out_w")': "conserved fixed-point mass <= |V|*PR_SCALE",
    # same bound, the DuckDB spelling — built by a shared f-string helper
    # far from any oracle=/spark.sql marker, so the context classifier
    # cannot see which engine it is; the bound holds for both.
    "(r.rank * e.cnt) // o.out_w": "conserved fixed-point mass <= |V|*PR_SCALE",
    # yv16/yv19 off-policy sums: r in {0,1}, w_pm <= 9000 permille,
    # bootstrap weight bw <= 4 -> addend <= 36000; int64-safe past
    # 2.5e14 rows/policy (documented in both docstrings; the one sum
    # whose addend CAN wrap at 1e11 rows — w_pm^2 <= 8.1e7 — IS 128-bit).
    'F.col("r") * F.col("w_pm")': "binary reward x permille weight, addend <= 9000",
    'F.col("bw") * F.col("r") * F.col("w_pm")': "Poisson(<=4) x binary x permille, addend <= 36000",
    'F.col("bw") * F.col("w_pm")': "Poisson(<=4) x permille, addend <= 36000",
    "r * w_pm": "binary reward x permille weight, addend <= 9000",
    # yv17 Fleiss per-unit agreement: n_uc <= m = 5 raters, addend <= 25;
    # the T_c^2 term that reaches (N*m)^2 is squared in 128-bit on the
    # O(#classes) frame instead.
    'F.col("n_uc") * F.col("n_uc")': "per-unit rating count, addend <= m^2 = 25",
    # classics/classics2 _REV_SQL / _REV_MICROS_SQL: DuckDB-ORACLE-only
    # revenue helper (interpolated solely into oracle= f-strings, where
    # SUM promotes to HUGEINT); defined at module top before any marker,
    # so the fail-closed classifier counts it as Spark text. The Spark
    # twin _rev_micros() accumulates in DECIMAL(38,0) already.
    'CAST(round(l_extendedprice * 100) AS BIGINT)" " *'
    " (10000 - CAST(round(l_discount * 10000) AS BIGINT))": (
        "oracle-only helper string; HUGEINT SUM on the DuckDB side"
    ),
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


_NUM_LIT = re.compile(r"^\d+(\.\d+)?$")

#: evidence the site is already widened (either engine's spelling, or
#: the pinned {dec} f-string placeholder).
_WIDE = re.compile(r"decimal\s*\(\s*38|HUGEINT|\{dec\}", re.IGNORECASE)

#: CASE WHEN <cond> THEN 0/1-style indicator sums (SQL and F.when
#: spellings): the product lives in the comparison, the SUMMED value is
#: an indicator — long is correct.
_INDICATOR = re.compile(
    r"CASE\s+WHEN\s+.*\bTHEN\s+1\b.*\bELSE\s+0\b|F\.when\s*\(.*\)\s*\.otherwise\s*\(\s*0\s*\)",
    re.IGNORECASE | re.DOTALL,
)

#: markers classifying a SQL-text SUM: Spark SQL (wraps silently) vs a
#: DuckDB oracle string (SUM promotes to HUGEINT). The NEAREST preceding
#: marker wins — an F.expr from the previous query must not claim the
#: next query's oracle="..." block.
_SPARK_MARK = re.compile(r"spark\.sql\s*\(|F\.expr\s*\(|selectExpr\s*\(")
_ORACLE_MARK = re.compile(r"\boracle\s*=")


def _sql_is_spark(text: str, pos: int) -> bool:
    """Classify the SQL text containing a SUM at ``pos``: Spark SQL
    (wraps silently — audit it) vs a DuckDB oracle string (HUGEINT
    promotion — exempt). Scans the ENTIRE prefix, not a fixed lookback
    window: a SUM >2k chars into a long Spark SQL string must not fall
    off the edge of the search. FAILS CLOSED — a SUM with no preceding
    marker at all (e.g. SQL built by a helper and passed to spark.sql
    via a variable) counts as Spark-side, so unclassifiable sites
    surface in the audit instead of being silently skipped."""
    window = text[:pos]
    spark_at = max((m.end() for m in _SPARK_MARK.finditer(window)), default=-1)
    oracle_at = max((m.end() for m in _ORACLE_MARK.finditer(window)), default=-1)
    if oracle_at == -1:
        return True
    return spark_at > oracle_at


def _left_operand(arg: str, star: int) -> str:
    """Token ending at arg[star] == '*' (identifier chain or paren group)."""
    i = star - 1
    while i >= 0 and arg[i].isspace():
        i -= 1
    if i < 0:
        return ""
    if arg[i] in ")]":
        close, open_ = arg[i], "(" if arg[i] == ")" else "["
        depth = 0
        j = i
        while j >= 0:
            if arg[j] == close:
                depth += 1
            elif arg[j] == open_:
                depth -= 1
                if depth == 0:
                    break
            j -= 1
        # include a leading callee name (e.g. CAST(...), F.col(...))
        k = j - 1
        while k >= 0 and (arg[k].isalnum() or arg[k] in "._"):
            k -= 1
        return arg[k + 1 : i + 1]
    j = i
    while j >= 0 and (arg[j].isalnum() or arg[j] in "._'\""):
        j -= 1
    return arg[j + 1 : i + 1]


def _right_operand(arg: str, star: int) -> str:
    i = star + 1
    while i < len(arg) and arg[i].isspace():
        i += 1
    if i >= len(arg):
        return ""
    if arg[i] == "(":
        return "(" + _balanced_arg(arg, i) + ")"
    j = i
    while j < len(arg) and (arg[j].isalnum() or arg[j] in "._'\""):
        j += 1
    # a call like DATEDIFF(...): swallow the paren group too
    if j < len(arg) and arg[j] == "(":
        return arg[i:j] + "(" + _balanced_arg(arg, j) + ")"
    return arg[i:j]


def _real_products(arg: str) -> list[tuple[str, str]]:
    """(left, right) operand pairs for every multiply where BOTH sides
    are non-literal — scale conversions (``x * 100``) are not products."""
    out = []
    for m in re.finditer(r"\*", arg):
        if m.start() > 0 and arg[m.start() - 1] == "*":  # '**'
            continue
        if m.end() < len(arg) and arg[m.end()] == "*":
            continue
        left, right = _left_operand(arg, m.start()), _right_operand(arg, m.start())
        if not left or not right:
            continue
        if _NUM_LIT.match(left) or _NUM_LIT.match(right):
            continue
        out.append((left, right))
    return out


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _operand_widened_upstream(text: str, match_start: int, operand: str) -> bool:
    """True when ``operand`` is a bare identifier whose defining
    assignment earlier in the file casts it to decimal(38,...) — the
    ``cd, ud = c.cast("decimal(38,0)"), ...`` pattern. One widened
    factor widens the whole product (Spark promotes decimal*long)."""
    if not _IDENT.match(operand):
        return False
    before = text[:match_start]
    pat = re.compile(
        r"^[^\n#]*\b" + re.escape(operand) + r"\b[^\n=]*=[^\n]*decimal\s*\(\s*38",
        re.IGNORECASE | re.MULTILINE,
    )
    return bool(pat.search(before))


def scan() -> list[tuple[str, int, str]]:
    """(relpath, lineno, normalized-arg) for every unhardened, non-
    allowlisted Spark-side product sum under the package."""
    hits: list[tuple[str, int, str]] = []
    for dirpath, _dirnames, filenames in os.walk(PKG):
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            text = open(path, encoding="utf-8").read()
            for m in re.finditer(r"(F\.sum|\bSUM)\s*(\()", text):
                is_spark = m.group(1) == "F.sum" or _sql_is_spark(text, m.start())
                if not is_spark:
                    continue  # DuckDB oracle text: SUM promotes to HUGEINT
                arg = _balanced_arg(text, m.start(2))
                products = _real_products(arg)
                if not products:
                    continue
                if _WIDE.search(arg) or _INDICATOR.search(arg):
                    continue
                if any(
                    _operand_widened_upstream(text, m.start(), op)
                    for pair in products
                    for op in pair
                ):
                    continue
                norm = _normalize(arg)
                if any(norm.startswith(_normalize(a)) for a in ALLOWLIST):
                    continue
                lineno = text.count("\n", 0, m.start()) + 1
                hits.append((os.path.relpath(path, ROOT), lineno, norm[:120]))
    return hits


def pinned_dec_placeholders() -> list[tuple[str, int, str]]:
    """Every ``dec = "..."`` assignment under the package — the test
    pins each to DECIMAL(38,0) so the {dec} widening evidence is real."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(PKG):
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            text = open(path, encoding="utf-8").read()
            for m in re.finditer(r'^\s*dec\s*=\s*"([^"]*)"', text, re.MULTILINE):
                lineno = text.count("\n", 0, m.start()) + 1
                out.append((os.path.relpath(path, ROOT), lineno, m.group(1)))
    return out


def main() -> int:
    hits = scan()
    if not hits:
        print("width audit clean: every Spark-side product sum is 128-bit, operand-widened, or allowlisted")
        return 0
    print(f"{len(hits)} unaudited product sum(s):")
    for path, lineno, snippet in hits:
        print(f"  {path}:{lineno}  SUM({snippet}...)")
    print("widen to DECIMAL(38,0) or allowlist WITH JUSTIFICATION in tools/width_audit.py")
    return 1


if __name__ == "__main__":
    sys.exit(main())
