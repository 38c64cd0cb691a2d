"""Compare two bench JSON records and classify the drift.

The recurring per-round question (BASELINE.md r5/r6/r7 adjudications):
did wall-clock move because of a code change, or because of machine
state? The signature of environmental drift is UNIFORM inflation —
every common query moves by a similar factor with zero improvements —
while a code regression moves specific queries. This tool prints the
per-query ratio distribution and a verdict heuristic so the next
adjudication is one command instead of a hand-rolled script. Plan
fingerprints (tools/plans_snapshot.json et al.) remain the arbiter;
this only classifies wall-clock noise.

Usage:
    python tools/bench_compare.py BASE.json NEW.json [--floor 0.2]

Accepts either raw `bench.py` output (one JSON line, possibly preceded
by log noise) or a driver BENCH_r{N}.json wrapper (uses its last line
of embedded output when present — older wrappers hold only a truncated
tail and are rejected with a clear message).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def load_bench(path: str) -> dict:
    raw = open(path).read()
    # raw bench.py output: last line that parses as JSON with "queries"
    for line in reversed(raw.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in d:
            return d
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    raise SystemExit(
        f"{path}: no parsable bench record with a 'queries' map "
        "(driver BENCH_r*.json wrappers keep only a truncated tail — "
        "compare against tools/bench_cold_*.json records instead)"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("new")
    ap.add_argument(
        "--floor",
        type=float,
        default=0.2,
        help="ignore queries faster than this many seconds in BASE "
        "(sub-floor timings are scheduling noise)",
    )
    args = ap.parse_args()
    base, new = load_bench(args.base), load_bench(args.new)
    qb, qn = base["queries"], new["queries"]
    common = sorted(set(qb) & set(qn))
    only_b, only_n = sorted(set(qb) - set(qn)), sorted(set(qn) - set(qb))
    ratios = {k: qn[k] / qb[k] for k in common if qb[k] >= args.floor}
    if not ratios:
        raise SystemExit("no common queries above the floor")
    med = statistics.median(ratios.values())
    improved = {k: r for k, r in ratios.items() if r < 0.9}
    regressed = {k: r for k, r in ratios.items() if r > max(1.25, med * 1.25)}
    print(f"common: {len(common)}  compared (>= {args.floor}s): {len(ratios)}")
    if only_b:
        print(f"only in base ({len(only_b)}): {', '.join(only_b[:8])}...")
    if only_n:
        print(f"only in new  ({len(only_n)}): {', '.join(only_n[:8])}...")
    print(
        f"headline: {base.get('value')} -> {new.get('value')}  "
        f"median per-query ratio: {med:.3f}"
    )
    for label, d in (("improved <0.9x", improved), ("outliers >max(1.25, 1.25*median)", regressed)):
        tops = sorted(d.items(), key=lambda kv: kv[1])
        print(f"{label}: {len(d)}")
        for k, r in tops[:10]:
            print(f"  {r:.2f}x  {k}  ({qb[k]:.2f}s -> {qn[k]:.2f}s)")
    # Verdict heuristic: uniform = environmental; targeted = investigate.
    # "Uniform" means everything moved the same DIRECTION (zero
    # improvements) with an inflated median — same-direction outliers
    # are part of the inflation, not code signals (a loaded machine
    # inflates heavy queries harder than light ones).
    if med > 1.15 and not improved:
        print(
            "VERDICT: uniform inflation, zero improvements — the "
            "documented environmental signature (BASELINE.md). Re-run "
            "on a cold JVM before attributing to code; plans are the "
            "arbiter."
        )
    elif regressed:
        print(
            "VERDICT: targeted movement — check the listed outliers "
            "against tools/plans_snapshot.json (plan_audit) before "
            "anything else."
        )
    else:
        print("VERDICT: within noise / net improvement.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
