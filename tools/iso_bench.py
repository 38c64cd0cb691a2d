"""Isolated per-query timing: warm process, median of N noop-sink runs.

The 142-query bench process accumulates state across queries (checkpointed
RDD blocks, broadcasts), so its single-sample per-query numbers drift 2-4x.
For A/B claims, run the target query alone: one warm-up execution, then
``reps`` timed noop-sink executions, report the median.

Usage::

    python tools/iso_bench.py <query_name> [<query_name> ...]

Env: ``ISO_REPS`` (default 5), ``SPARK_GRAFT_SF_DIR`` (default sf0.1).
Each named query gets its own timing but shares the process; pass ONE name
for a true run-alone median.  Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from spotify_tags_etl_spark.plans import registry  # noqa: E402
from spotify_tags_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: iso_bench.py <query_name> [...]")
    reps = int(os.environ.get("ISO_REPS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("spotify-tags-etl-spark-iso")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    for name in names:
        fn = queries[registry.resolve(name)]
        spark.sparkContext.setJobDescription(f"iso:{name}:warmup")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"iso:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 4))
        print(
            json.dumps(
                {
                    "query": name,
                    "median": round(statistics.median(samples), 4),
                    "samples": samples,
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
