"""Compute the next driver-window rotation.

The driver's correctness gate checks only the FIRST 50 registry names in
sort order. plans/registry.py re-keys already-driver-verified queries
behind a ``zv_`` prefix so never-verified ones rotate into the window
(see VERIFIED there). After a round's CORRECTNESS_r{N}.json lands,
run this to print the updated frozenset literal: every query the driver
has EVER verified green (hash_match, or rows-only for no_oracle entries
that returned rows) joins the rotation set.

Usage:
    python tools/rotate_verified.py CORRECTNESS_r02.json [CORRECTNESS_r01.json ...]
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    from spotify_tags_etl_spark.plans.registry import VERIFIED

    verified: set[str] = set(VERIFIED)
    for path in sys.argv[1:]:
        data = json.load(open(path))
        for name, rec in data.items():
            base = name[3:] if name.startswith("zv_") else name
            if rec.get("hash_match") is True:
                verified.add(base)
            elif rec.get("err") == "no_oracle" and (rec.get("spark_rows") or 0) >= 0:
                # rows-only check passed; keep it in the window anyway so a
                # future oracle gets a verdict — do NOT rotate.
                pass
    print("VERIFIED = frozenset(")
    print("    {")
    for name in sorted(verified):
        print(f'        "{name}",')
    print("    }")
    print(")")
    print(f"# {len(verified)} verified; registry window frees "
          f"{len(verified) - len(VERIFIED)} new slots next round")
    return 0


if __name__ == "__main__":
    sys.exit(main())
