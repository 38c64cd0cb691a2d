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


def run_parallel(*thunks: Callable[[], object]) -> list[object]:
    """Run INDEPENDENT actions (sink writes, collects) concurrently;
    returns their results in argument order. Exceptions propagate
    after all thunks have settled."""
    if len(thunks) <= 1:
        return [t() for t in thunks]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futs = [pool.submit(t) for t in thunks]
        return [f.result() for f in futs]
