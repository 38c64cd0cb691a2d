"""Emulate the driver's correctness gate locally.

The driver builds a VANILLA SparkSession (none of our session.py confs),
takes the first 50 registry names in sort order, and for each runs the
Spark builder and the DuckDB oracle at sf0.01, comparing row count +
schema + order-insensitive value hash. This script reproduces that gate
so CORRECTNESS_r{N}.json is predictable before the round ends.

Differences from the driver (both strictly safe):
* one shared vanilla session instead of a fresh JVM per query — temp
  views are dropped and runtime-set confs unset between queries so no
  query can lean on another's session state;
* exact value equality instead of a hash — stricter, so a pass here
  implies a hash match there.

Usage:
    python tools/driver_emu.py [--sf-dir /root/testdata/sf0.01] [--window 50] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def _input_mtimes(sf_dir: str) -> dict[str, float]:
    import glob

    return {p: os.path.getmtime(p) for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet")))}


def check_fresh(out_path: str) -> bool:
    """True iff the recorded sweep is still valid: no input parquet has
    been modified since the sweep ran. Round 2's '103/105 green' claim
    was true at 16:35 and false at 19:07 because the driver regenerated
    the fixtures in between — a green verdict must carry its evidence."""
    try:
        data = json.load(open(out_path))
        meta = data.get("_meta", {})
        recorded = meta.get("input_mtimes", {})
    except (OSError, json.JSONDecodeError):
        print(f"STALE: {out_path} missing or unreadable")
        return False
    if not recorded:
        print("STALE: sweep predates mtime recording")
        return False
    stale = [
        p
        for p, m in recorded.items()
        if not os.path.exists(p) or os.path.getmtime(p) != m
    ]
    current = _input_mtimes(meta.get("sf_dir", ""))
    new = sorted(set(current) - set(recorded))
    if stale or new:
        for p in stale:
            print(f"STALE: {p} changed/removed since sweep")
        for p in new:
            print(f"STALE: {p} appeared since sweep")
        return False
    print(f"FRESH: sweep at {meta.get('swept_at')} still matches {len(recorded)} inputs")
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument(
        "--check-fresh",
        action="store_true",
        help="don't sweep; exit 0 iff driver_emu_last.json predates no input parquet change",
    )
    ap.add_argument(
        "--out",
        default=None,
        help="result JSON path (default tools/driver_emu_last.json for full "
        "sweeps, tools/driver_emu_adhoc.json when explicit names are given "
        "— so ad-hoc runs never clobber the round's sweep record)",
    )
    ap.add_argument("names", nargs="*", help="explicit query names (overrides --window)")
    args = ap.parse_args()

    # driver_emu_last.json is the round's FULL-sweep record; only a sweep
    # that can cover the whole registry may write it. Named runs AND
    # window-limited runs (the default 50-name gate replication) go to
    # the gitignored adhoc file so they never clobber the record.
    full_sweep = not args.names and args.window >= 400
    default_name = "driver_emu_last.json" if full_sweep else "driver_emu_adhoc.json"
    out_path = args.out or os.path.join(_REPO, "tools", default_name)
    if args.check_fresh:
        # freshness is always judged against the round RECORD, whatever
        # window this invocation would have swept
        record = args.out or os.path.join(_REPO, "tools", "driver_emu_last.json")
        return 0 if check_fresh(record) else 1

    from pyspark.sql import SparkSession

    # Vanilla, like the driver: no repo session factory, no extra confs.
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver-emu")
        .getOrCreate()
    )

    import __spark_entry__ as entry
    from oracle_harness import compare_frames, duckdb_connect

    queries = entry.queries()
    oracles = entry.oracle_sql()
    # Accept pre-rotation spellings (the names recorded in CORRECTNESS_r{N}
    # and driver output) for explicitly-passed names: driver-verified
    # queries re-key to zv_<name> each round.
    from spotify_tags_etl_spark.plans.registry import resolve

    names = [resolve(n) for n in args.names] or sorted(queries)[: args.window]

    # Snapshot inputs BEFORE the sweep: if a fixture regen lands mid-sweep,
    # the post-sweep freshness check fails (mtime mismatch), which is the
    # correct outcome — results partly against old data are not green.
    input_mtimes = _input_mtimes(args.sf_dir)
    swept_at = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())

    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        rec: dict = {"ok": None, "err": None, "secs": None, "rows": None}
        try:
            spark_pdf = queries[name](spark, args.sf_dir).toPandas()
            rec["rows"] = len(spark_pdf)
            if name in oracles:
                con = duckdb_connect(args.sf_dir)
                try:
                    oracle_pdf = con.execute(oracles[name]).fetchdf()
                finally:
                    con.close()
                compare_frames(spark_pdf, oracle_pdf, name)
                rec["ok"] = True
            else:
                rec["ok"] = rec["rows"] >= 0
                rec["err"] = "no_oracle"
        except Exception:
            rec["ok"] = False
            rec["err"] = traceback.format_exc(limit=3)
        rec["secs"] = round(time.time() - t0, 2)
        results[name] = rec
        status = "PASS" if rec["ok"] else "FAIL"
        tag = " (no_oracle)" if rec["err"] == "no_oracle" else ""
        print(f"{status}{tag} {name} rows={rec['rows']} {rec['secs']}s", flush=True)
        if not rec["ok"]:
            print(rec["err"], flush=True)
        # Driver isolation: each driver query gets a fresh session. Drop any
        # temp views and runtime confs a builder registered so the next
        # query cannot depend on them.
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        for key in (
            "spark.sql.legacy.parquet.nanosAsLong",
            "spark.sql.shuffle.partitions",  # streaming builders pin it
            # ensure_session_defaults sets these two; a builder that forgot
            # its own self-heal must not pass by inheriting them from the
            # previous query (the driver gives every query a fresh JVM).
            "spark.sql.session.timeZone",
            "spark.sql.ansi.enabled",
        ):
            try:
                spark.conf.unset(key)
            except Exception:
                pass

    n_pass = sum(1 for r in results.values() if r["ok"] and r["err"] is None)
    n_no_oracle = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_fail = sum(1 for r in results.values() if not r["ok"])
    print(f"\n{n_pass} pass / {n_no_oracle} no_oracle / {n_fail} FAIL of {len(results)}")
    try:
        import subprocess

        git_head = subprocess.run(
            ["git", "-C", _REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip()
    except Exception:
        git_head = None
    payload: dict = {
        "_meta": {
            "sf_dir": args.sf_dir,
            "swept_at": swept_at,
            "git_head": git_head,
            "input_mtimes": input_mtimes,
        }
    }
    payload.update(results)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, default=str)
    print(f"wrote {out_path}")
    # Refuse a green verdict whose inputs changed under the sweep.
    if not n_fail and not check_fresh(out_path):
        print("inputs changed during sweep; verdict NOT green")
        return 1
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
