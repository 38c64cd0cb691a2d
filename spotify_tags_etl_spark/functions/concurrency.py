"""Overlap independent Spark actions (optimization guide §2.6).

Actions are only sequential because driver code calls them
sequentially: Spark's scheduler happily runs several jobs at once
inside one application, and with default FIFO scheduling a later job's
tasks back-fill executors freed by the earlier job's tail. None of the
close-time/per-trigger jobs these helpers are used on fills the
cluster by itself, so overlapping them buys wall clock without
changing a single frame, plan, or value.

Thread safety: job submission through py4j is thread-safe; job
descriptions/groups are thread-local (guide §1.5), so each submitted
job is labelled by its own thread. The pools here are tiny (one
worker per independent action) and short-lived.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable

from pyspark.sql import DataFrame


def checkpoint_parallel(frames: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Eagerly localCheckpoint INDEPENDENT frames as concurrent jobs.
    Same frames, same plans, same checkpoints — only the driver-side
    submission overlaps."""
    if len(frames) <= 1:
        return {k: df.localCheckpoint(eager=True) for k, df in frames.items()}
    with ThreadPoolExecutor(max_workers=len(frames)) as pool:
        futs = {k: pool.submit(df.localCheckpoint, True) for k, df in frames.items()}
        return {k: f.result() for k, f in futs.items()}


#: Per-task input floor for :func:`fan_out_scan` — the fan width is
#: ceil(input bytes / this), capped at the core count, so a task always
#: has enough work to clear the scheduling floor (the §2.2 analog of
#: ``spark.sql.files.maxPartitionBytes``, applied where file splits
#: cannot: a single-row-group parquet file is one split no matter the
#: split config). Measured at sf0.1: width 8-10 beats both no fan-out
#: (single-task map work) and a full 32-way fan (per-task work drops
#: under the scheduling floor and the per-trigger stores fragment into
#: 32 files each, which the close-time reads then pay for).
FAN_TASK_BYTES = int(os.environ.get("SPARK_GRAFT_FAN_TASK_BYTES", str(64 * 1024)))


def fan_out_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Scale-adaptive scan fan-out (guide §2.2/§2.5/§6): when an
    input's scan parallelism is below the session's core count — the
    fixture corpora are single parquet files with ONE row group, so
    every per-doc map stage (shingling, MinHash, gram explodes,
    design-matrix folds) otherwise runs as ONE task on a 32-core box —
    hash-repartition by a stable key so the heavy narrow compute
    spreads. The width derives from the input's optimizer size
    statistics (bytes / FAN_TASK_BYTES, floor 2 so the plan shape is
    deterministic at every fixture SF, cap ``defaultParallelism``);
    the shuffle moves only the sub-core-count input (hundreds of KB
    here), and the hash key is a real column (never rand()), so
    retried tasks reproduce the same assignment (guide §2.5 /
    SPARK-38388).

    At production scale the condition — not a tuned constant — is the
    contract: a 100 TB corpus scan already has far more splits than
    cores, ``getNumPartitions() >= defaultParallelism`` holds, and the
    frame passes through untouched (no shuffle of the payload)."""
    from pyspark.sql import functions as F

    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    have = df.rdd.getNumPartitions()
    if have >= cores:
        return df
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    width = min(cores, max(2, -(-size // FAN_TASK_BYTES)))
    if width <= have:
        return df
    if keys:
        return df.repartition(width, *[F.col(k) for k in keys])
    return df.repartition(width)


def run_parallel(*thunks: Callable[[], object]) -> list[object]:
    """Run INDEPENDENT actions (sink writes, collects) concurrently;
    returns their results in argument order. Exceptions propagate
    after all thunks have settled."""
    if len(thunks) <= 1:
        return [t() for t in thunks]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futs = [pool.submit(t) for t in thunks]
        return [f.result() for f in futs]
