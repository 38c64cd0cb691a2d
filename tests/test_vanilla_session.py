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
df = qs["q05_equality_filter"](spark, {sf_dir!r})
n = df.count()
assert n > 0, f"expected rows, got {{n}}"
# streaming path reads events with its own scan — exercise it too.
df2 = qs["st02_stream_dedup"](spark, {sf_dir!r})
n2 = df2.count()
assert n2 > 0, f"expected rows from streaming dedup, got {{n2}}"
print("VANILLA_OK", n, n2)
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
