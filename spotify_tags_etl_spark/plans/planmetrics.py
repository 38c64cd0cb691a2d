"""Physical-plan fingerprint metric table — the single source of truth
shared by the batch plan ratchet (``tools/plan_audit.py`` /
``tests/test_plan_snapshot.py``) and the streaming micro-batch plan pins
(``streaming/ops.py`` / ``tests/test_stream_state_shape.py``).

Each metric counts occurrences of a plan-node substring in an executed
physical plan's string rendering. "Worse" for the batch ratchet means
strictly greater than the pinned snapshot on any metric; the streaming
pins are exact (a micro-batch plan gaining OR losing an exchange is a
deliberate change either way).
"""

from __future__ import annotations

#: Metric name -> executed-plan substring counted.
METRICS: dict[str, str] = {
    "exchanges": "Exchange hashpartitioning",
    "single_partition": "Exchange SinglePartition",
    "python_eval": "BatchEvalPython",
    "arrow_eval": "ArrowEvalPython",
    "cartesian": "CartesianProduct",
    "sort_merge_joins": "SortMergeJoin",
    # Count EVERY Python boundary Spark renders with a distinct node
    # name — a plan could grow a whole pandas stage while "python_eval"
    # stays 0. Nonzero is CORRECT only for declared UDF-surface queries.
    "map_in_pandas": "MapInPandas",
    "map_in_arrow": "MapInArrow",
    "grouped_map_pandas": "FlatMapGroupsInPandas",
    "grouped_agg_arrow": "ArrowAggregatePython",
}


def count_metrics(plan: str) -> dict[str, int]:
    """Count each metric's plan-node substring in ``plan``."""
    return {m: plan.count(sub) for m, sub in METRICS.items()}
