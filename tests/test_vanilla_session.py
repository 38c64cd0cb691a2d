"""Driver-contract regression: queries must run on a VANILLA SparkSession.

Round-1 driver gate failed 18/50 queries because ``load_table`` relied on
a session-build conf (``spark.sql.legacy.parquet.nanosAsLong``) that only
the repo's own session factory set — the driver's harness builds a plain
``SparkSession.builder.getOrCreate()``. This test reproduces the driver's
environment in a subprocess (fresh JVM, no repo session factory, no extra
confs) and runs an events-touching query end-to-end.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-driver-emulation")
    .getOrCreate()
)
import __spark_entry__ as e

qs = e.queries()
# q05 touches events.parquet (TIMESTAMP(NANOS)) — the round-1 failure mode.
# st02 exercises the streaming scan path; vx01/tz03/vz01 exercise the
# newest families (ANSI-on vanilla sessions must not break their casts,
# higher-order functions, or the iterative-checkpoint loop).
counts = []
for name in (
    "q05_equality_filter",
    "st02_stream_dedup",
    "vx01_ivf_ann",
    "tz03_tfidf_top_terms",
    "vz01_dup_components",
):
    n = qs[name](spark, {sf_dir!r}).count()
    assert n > 0, f"{{name}}: expected rows, got {{n}}"
    counts.append(n)
print("VANILLA_OK", counts)
spark.stop()
"""


def test_events_queries_on_vanilla_session(sf_dir):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(repo=repo, sf_dir=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "VANILLA_OK" in proc.stdout
