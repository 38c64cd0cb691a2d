"""Structured Streaming operators (SURVEY.md §2.9).

The reference is batch-only; its nearest stream is the paginated,
rate-limited API pull (``spotify_client.py:136-138,222-245``) with
cross-page dedup (``:545-546``). This module provides the streaming
analogs as first-class operators:

* st01 — watermarked tumbling event-time window aggregate;
* st02 — streaming dedup with state (the cross-page track_id dedup);
* st03 — custom stateful sessionizer via ``applyInPandasWithState``
  (GroupState: last-seen timestamp + running session counter per user);
* st04 — stream-static broadcast enrichment join;
* st05 — sliding (overlapping) window aggregate;
* st06/st07 — stream-stream interval joins, inner and left-outer
  (watermark-evicted null rows behind a deterministic cutoff);
* st08 — foreachBatch CDC upsert through the engine-level LWW merge
  into a versioned parquet target;
* st09 — incremental MinHash+LSH near-dup detection against a standing
  signature store (equals batch dd02 for any micro-batch layout);
* xw01 — incremental funnel (CEP-lite): per-user sequential-pattern
  anchors merged set-orientedly into versioned keyed state.

Each runs as a real streaming query (``readStream`` → transform →
``writeStream`` to a memory sink, ``Trigger.AvailableNow``) and returns
the materialized result, so the driver's oracle gate applies to the
*streaming* execution path, not a batch stand-in. With a single input
file the run is one micro-batch, so watermark-driven late-data drops
cannot fire and results are deterministic = the batch equivalent; the
multi-batch behavior (state carry-over, watermark eviction) is
exercised in tests/test_streaming.py with maxFilesPerTrigger=1 over a
multi-file copy.

Scale notes (1000-executor design point):

* state stores shard by ``spark.sql.shuffle.partitions`` at first run —
  size it for the *key* cardinality (users), not event volume;
* the watermark bounds every state store: window state evicts at
  watermark - lateness, dedup state at the dedup watermark;
* ``applyInPandasWithState`` state is per-key and Arrow-batched; keep
  per-key state O(1) (we store 3 scalars) — never a growing list.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spotify_tags_etl_spark.plans.registry import register

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def read_table_stream(
    spark: SparkSession, sf_dir: str, name: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming file-source scan of any test table (same symlink-staging
    and session self-healing as :func:`read_events_stream`, minus the
    events-specific timestamp normalization)."""
    import hashlib

    from ..sources.tpch import ensure_session_defaults

    path = os.path.join(sf_dir, f"{name}.parquet")
    stream_dir = os.path.join(
        "/tmp/spark_graft_stream", hashlib.md5(sf_dir.encode()).hexdigest()[:12], name
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, f"{name}.parquet")
    if not os.path.lexists(link):
        try:
            os.symlink(path, link)
        except FileExistsError:
            pass
    ensure_session_defaults(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
        )
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stream_dir)


def read_events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming scan of the events table: file-source micro-batches.

    Schema comes from one batch footer read (streaming sources require
    an explicit schema); the ``ts`` column is normalized to a TIMESTAMP
    instant + bigint ``ts_ns`` exactly as the batch loader does
    (sources/tpch.py:normalize_events_ts), whatever the fixture encoding.
    """
    import hashlib
    import os

    path = os.path.join(sf_dir, "events.parquet")
    # The file stream source requires a *directory* to monitor; the test
    # tables are single files (read-only), so stage a symlink dir. At
    # cluster scale the source would watch a real landing directory.
    stream_dir = os.path.join(
        "/tmp/spark_graft_stream", hashlib.md5(sf_dir.encode()).hexdigest()[:12], "events"
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    # lexists (not exists): a dangling link from a regenerated fixture must
    # not trigger a re-create; FileExistsError guards concurrent stagers.
    if not os.path.lexists(link):
        try:
            os.symlink(path, link)
        except FileExistsError:
            pass
    # Same vanilla-session guard as sources/tpch.py:load_table — the
    # TIMESTAMP(NANOS) physical type needs this runtime conf on ANY session,
    # and event-time windows/date_format must render in UTC to match the
    # naive-UTC DuckDB oracles regardless of the driver JVM's default TZ.
    from ..sources.tpch import ensure_session_defaults, normalize_events_ts

    ensure_session_defaults(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # State-store partition count is frozen from shuffle.partitions at
    # query start; a vanilla session's 200 means 200 state partitions per
    # stateful operator per micro-batch — pure overhead at this scale.
    # Only replace the untouched Spark default: a session where the caller
    # explicitly tuned shuffle.partitions keeps its setting (at cluster
    # scale this is sized to executor count, not left at 200).
    import os as _os

    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            _os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
        )
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(stream_dir)
    # Same encoding-driven normalization as the batch loader: whatever the
    # fixture's physical type (bigint ns / timestamp / timestamp_ntz), the
    # stream exposes TIMESTAMP ``ts`` (watermark-eligible) + bigint ``ts_ns``.
    return normalize_events_ts(df)


#: State-operator names of the most recent :func:`run_to_memory_with_progress`
#: execution (union across its progress events, sorted). The batch plan
#: ratchet (tools/plan_audit.py) cannot see streaming micro-batch plans —
#: the returned frame is a memory-sink scan — so this is the streaming
#: twin of the plan fingerprint: tests pin each streaming query's state
#: shape against it (a vanished dedup/session/join state operator, or an
#: extra one, is the streaming analog of a plan regression).
LAST_RUN_STATE_OPS: list[str] = []

#: Per-run log since the last test-side clear: one ``(sink_kind,
#: sorted_state_op_names)`` tuple per streaming execution, in start
#: order. Queries that run more than one stream (or none through the
#: memory-sink path) pin the whole log, so a query silently gaining or
#: losing a streaming run is caught too.
STATE_OPS_LOG: list[tuple[str, tuple[str, ...]]] = []

#: Micro-batch PLAN fingerprints since the last test-side clear — the
#: second half of the streaming ratchet. The state-shape log above pins
#: WHAT state the engine keeps; this pins the physical shape of the
#: work each micro-batch does, with the same metric table as the batch
#: plan ratchet (plans/planmetrics.METRICS). Two capture paths:
#:
#: * engine-sink runs: :func:`record_state_ops` reads the engine's own
#:   last-executed micro-batch plan (``explainInternal``) — one
#:   ``("engine:<sink>", metrics)`` entry per streaming run;
#: * foreachBatch runs: the engine-side plan is a trivial hand-off, so
#:   each inner write site calls :func:`record_batch_plan` on the frame
#:   it is about to materialize — one ``(label, metrics)`` entry per
#:   micro-batch per site.
#:
#: Tests pin the DEDUPLICATED set per query (micro-batch plans are
#: data-independent in shape, so every batch of a site fingerprints
#: identically; the set form keeps pins stable under batch-count
#: changes from maxFilesPerTrigger tuning). A foreachBatch merge
#: silently gaining an exchange — invisible to both the batch ratchet
#: and the state-shape pin — now fails a test.
MICRO_PLAN_LOG: list[tuple[str, tuple[tuple[str, int], ...]]] = []


def record_batch_plan(df: DataFrame, label: str, seen: set | None = None) -> None:
    """Fingerprint a foreachBatch inner frame's physical plan into
    :data:`MICRO_PLAN_LOG`. Uses the pre-execution physical plan
    (deterministic for a fixed query shape and config — AQE runtime
    re-planning is deliberately NOT awaited, so the pin tracks the
    declared shape, not data-size-dependent runtime choices).

    ``seen`` (r13): a caller-owned per-STREAM-RUN set; when given, each
    label is fingerprinted only on its first batch of that run. The
    render forces a full extra analysis/optimization/physical-planning
    pass on the driver (~0.2 s per site per trigger at any data size —
    the write job plans its own QueryExecution separately), and batch
    plans are data-independent in shape BY THE PIN'S OWN CONTRACT (the
    tests pin deduplicated fingerprint sets), so batches 1..n of a run
    re-rendered the identical string. A fresh run (and every test that
    clears MICRO_PLAN_LOG and re-invokes the operator) constructs a
    fresh ``seen`` and still records every label."""
    if seen is not None:
        if label in seen:
            return
        seen.add(label)
    from spotify_tags_etl_spark.plans.planmetrics import count_metrics

    plan = df._jdf.queryExecution().executedPlan().toString()
    MICRO_PLAN_LOG.append((label, tuple(sorted(count_metrics(plan).items()))))


def record_state_ops(q, sink: str) -> None:
    """Union the state-operator names across a finished streaming
    query's progress events into the module-level pin globals.

    ``stateOperators`` in each progress event lists the stateful
    operators of that micro-batch's physical plan (dedupe,
    stateStoreSave, symmetricHashJoin, applyInPandasWithState, session
    window...). A stateless plan (pure foreachBatch projection) reports
    none — an empty entry is itself a meaningful pin."""
    ops: set[str] = set()
    for prog in q.recentProgress:
        for op in prog.get("stateOperators") or []:
            if op.get("operatorName"):
                ops.add(op["operatorName"])
    LAST_RUN_STATE_OPS[:] = sorted(ops)
    STATE_OPS_LOG.append((sink, tuple(sorted(ops))))
    # Micro-batch plan fingerprint: the engine's last-executed batch
    # plan (shape is data-independent, so "last" is representative).
    # foreachBatch queries capture their INNER plans at each write site
    # via record_batch_plan instead — the engine-side plan there is a
    # trivial hand-off, but pin it anyway: it going non-trivial would
    # mean work silently moved out of the instrumented batch_fn.
    try:
        from spotify_tags_etl_spark.plans.planmetrics import count_metrics

        plan = q._jsq.explainInternal(False)
        MICRO_PLAN_LOG.append(
            (f"engine:{sink}", tuple(sorted(count_metrics(plan).items())))
        )
    except Exception:  # no batch executed — nothing to fingerprint
        pass


def versioned_state_source(cur: list[str], target: str) -> str | None:
    """Resolve the merge SOURCE for a versioned-census update (the
    zf02/ze03 foreachBatch pattern: each batch writes the accumulated
    census to a new batch-keyed parquet version and advances a
    ``cur`` pointer list).

    Replay safety (r9 advice): foreachBatch MAY re-deliver a batch_id
    after a partial failure. On first delivery ``cur[0]`` (if any) is
    the previous batch's version — merge against it. On a REPLAY the
    pointer already names this batch's own target, and merging against
    it would (a) double-count the batch and (b) lazily read the very
    directory the write is about to clobber; the correct source is the
    version that preceded the first attempt, kept as ``cur[1]``."""
    if not cur:
        return None
    if cur[0] == target:  # replay: merge against the pre-attempt version
        return cur[1] if len(cur) > 1 else None
    return cur[0]


def commit_versioned_state(df: DataFrame, cur: list[str], target: str, src: str | None) -> None:
    """Materialize a merged census and advance the version pointer,
    replay-safely: write to ``<target>.tmp`` FIRST (so the lazy merge
    read in ``df`` never points at a directory being deleted — Spark's
    overwrite removes the target before the read executes), then
    rename whole onto ``target``. A half-written first attempt is
    replaced atomically; ``cur`` keeps [current, previous] so a replay
    can re-resolve its source via :func:`versioned_state_source`."""
    import os
    import shutil

    tmp = target + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target):
        shutil.rmtree(target)
    os.rename(tmp, target)
    cur[:] = [target] + ([src] if src else [])


def run_to_memory(stream: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming frame to completion (AvailableNow) into a
    memory sink; return the materialized result as a batch DataFrame.

    The sink's temp view is dropped before returning (the result is
    localCheckpoint'ed first) — otherwise every invocation would pin its
    full result set in driver memory for the session lifetime."""
    out, _ = run_to_memory_with_progress(stream, output_mode)
    return out


#: Shuffle/state-partition count frozen into engine-sink streaming
#: queries at start. Two reasons this is NOT the batch-side number
#: (r12 §15): AQE is disabled under Structured Streaming, so the
#: static ``spark.sql.shuffle.partitions`` runs UNCOALESCED in every
#: micro-batch; and each stateful operator materializes one state
#: store per partition, each committing a delta file (+fsync) per
#: trigger — at the fixture's KB-sized state, 32 stores cost ~0.5 s
#: per query of pure commit overhead (measured: stateful floor 1.33 s
#: at 32 partitions, 0.90 s at 8; 4 is no better than 8). Micro-batch
#: volume is bounded by trigger sizing, so the right static number
#: tracks per-trigger state/batch volume, not the batch-scan core
#: count — production deployments size it via this env knob.
STREAM_PARTITIONS = int(os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"))


def run_to_memory_with_progress(stream: DataFrame, output_mode: str):
    """:func:`run_to_memory` plus the query's final watermark (epoch
    usec, or None before any advance) read from the engine's own
    progress metrics — the observability-driven alternative to
    re-scanning inputs to reconstruct event-time bookkeeping."""
    from spotify_tags_etl_spark.functions.concurrency import _SHUFFLE_BOUND_LOCK

    spark = stream.sparkSession
    name = f"st_{uuid.uuid4().hex[:12]}"
    # The partition count is frozen into the query's state-store layout
    # at start; restore the session value once the run has terminated
    # (AvailableNow runs synchronously inside this function). r13
    # (ADVICE): the whole set/start/restore sequence sits inside ONE
    # try/finally under the shared shuffle-bound lock — a start-time
    # analysis error can no longer leave the session pinned, and a
    # concurrent bounded_shuffle region cannot interleave its
    # set/restore pair with this one.
    q = None
    wm_us = None
    with _SHUFFLE_BOUND_LOCK:
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(min(int(prev_parts), STREAM_PARTITIONS)),
            )
            q = (
                stream.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # Watermark advances at batch BOUNDARIES: the final (empty,
            # state-flushing) batch of an AvailableNow run reports the
            # post-data watermark. Take the max across recent progress
            # to be robust to progress-array ordering.
            for prog in q.recentProgress:
                wm = (prog.get("eventTime") or {}).get("watermark")
                if wm:
                    ts = pd.Timestamp(wm.replace("Z", "+00:00"))
                    us = ts.value // 1000
                    if us > 0 and (wm_us is None or us > wm_us):
                        wm_us = us
            record_state_ops(q, "memory")
        finally:
            if q is not None:
                q.stop()
            # conf capture happens on the query thread, not at .start()
            # — restore only once the (synchronous AvailableNow) run is
            # over, and on ANY exit including start-time failure
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out, wm_us


def windowed_agg(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 1-hour event-time windows with a late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:00:00").alias("hour_bucket"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "st01_stream_windowed_agg",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:00:00') AS hour_bucket,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc=(
        "Structured Streaming tumbling-window aggregate with watermark, "
        "run to completion via AvailableNow into a memory sink (complete "
        "mode). Single-batch input ⇒ no late drops ⇒ equals the batch "
        "window agg (q26) — which is the oracle. Multi-batch watermark "
        "eviction is pinned in tests/test_streaming.py."
    ),
    tags=("streaming", "window", "eventtime"),
)
def st01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(windowed_agg(read_events_stream(spark, sf_dir)), "complete")


def stream_dedup_keys(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming distinct on (user_id, event_type): stateful dedup whose
    state IS bounded by the watermark — dropDuplicatesWithinWatermark
    evicts a key's state once the watermark passes its event time, so a
    long-running stream holds state only for keys seen within the last
    `watermark` of event time (plain dropDuplicates on a subset without
    the event-time column would grow state forever). Output = keys only
    (the kept 'first' row is arrival-order-dependent; keys are
    deterministic). A key re-appearing after a >watermark quiet period
    re-emits — acceptable for the cross-page dedup semantics (pages of
    one extract arrive well within the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


@register(
    "st02_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc=(
        "Streaming stateful dedup (the reference's cross-page track_id "
        "dedup, spotify_client.py:545-546, generalized): dropDuplicates "
        "with watermark-bounded state, append mode. Emits each key once "
        "on first arrival."
    ),
    tags=("streaming", "dedup"),
)
def st02(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(stream_dedup_keys(read_events_stream(spark, sf_dir)), "append")


# ---------------------------------------------------------------------------
# custom stateful operator: gap-based sessionizer
# ---------------------------------------------------------------------------

_GAP_MIN = 30

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_seq", LongType(), False),
        StructField("session_start", StringType(), True),
        StructField("session_end", StringType(), True),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType(), True),       # last event time seen
        StructField("session_seq", LongType(), True),   # current session ordinal
        StructField("start_us", LongType(), True),      # current session start
        StructField("n_events", LongType(), True),
        StructField("sum_cents", LongType(), True),     # exact integer money
    ]
)


def _fmt_us(us: int) -> str:
    # Explicit %f: str(pd.Timestamp) drops the fractional part entirely on
    # whole-second values, but the DuckDB oracle's STRFTIME '%f' always
    # emits 6 digits — format must match for second-boundary timestamps.
    return pd.Timestamp(us * 1000).strftime("%Y-%m-%d %H:%M:%S.%f")


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user gap sessionizer. State = (last ts, session ordinal, open
    session accumulators) — O(1) per key. Emits every session touched in
    this batch (closed ones finally; the open one with its running
    totals, re-emitted/extended next batch — last-write-wins on
    (user_id, session_seq))."""
    (user_id,) = key
    gap_us = _GAP_MIN * 60 * 1_000_000
    if state.exists:
        last_us, seq, start_us, n_ev, cents = state.get
    else:
        last_us, seq, start_us, n_ev, cents = None, 0, None, 0, 0

    out = []

    def emit(end_us: int) -> None:
        out.append(
            (
                user_id,
                seq,
                _fmt_us(start_us),
                _fmt_us(end_us),
                n_ev,
                cents / 100.0,
            )
        )

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("us")
    for us, cents_v in zip(rows["us"], rows["cents"]):
        us = int(us)
        if last_us is None or us - last_us > gap_us:
            if last_us is not None:
                emit(last_us)
            seq += 1
            start_us, n_ev, cents = us, 0, 0
        n_ev += 1
        cents += int(cents_v)
        last_us = us
    if last_us is not None:
        emit(last_us)
    state.update((last_us, seq, start_us, n_ev, cents))
    yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA.fields])


def stateful_sessions(events: DataFrame) -> DataFrame:
    """applyInPandasWithState sessionizer over the event stream."""
    prepped = events.select(
        "user_id",
        F.expr("ts_ns DIV 1000").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "st03_stream_sessions",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {_GAP_MIN} * 60 * 1000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM ordered
    )
    SELECT user_id, session_seq,
           STRFTIME(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           STRFTIME(MAX(ts), '{_TS_FMT_DUCK}') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
    FROM sessioned GROUP BY user_id, session_seq
    """,
    doc=(
        "Custom stateful streaming operator: applyInPandasWithState "
        "gap-sessionizer (30 min), O(1) state per user (last ts + open-"
        "session accumulators as integer cents). Single-batch run equals "
        "batch sessionization (the oracle); incremental state carry-over "
        "across micro-batches is pinned in tests/test_streaming.py."
    ),
    tags=("streaming", "session", "stateful", "udf"),
)
def st03(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(stateful_sessions(read_events_stream(spark, sf_dir)), "update")


# ---------------------------------------------------------------------------
# sliding (overlapping) event-time windows
# ---------------------------------------------------------------------------

_SLIDE_MIN = 20  # 1h windows sliding every 20 min
_WINDOW_MIN = 60  # sliding window size; must be a multiple of _SLIDE_MIN
#: Overlapping windows per event — drives BOTH the engine's window spec and
#: the st05 oracle's offset expansion, so retuning the slide keeps parity.
_N_OVERLAP = _WINDOW_MIN // _SLIDE_MIN


def sliding_agg(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """1-hour windows sliding every 20 minutes: each event contributes to
    size/slide = _N_OVERLAP overlapping windows. State is (windows × keys);
    the watermark evicts each window at its end + lateness, so open state
    is always ≤ _N_OVERLAP window generations per key."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{_WINDOW_MIN} minutes", f"{_SLIDE_MIN} minutes"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "st05_stream_sliding_window",
    oracle=f"""
    WITH ev AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
    w AS (
      SELECT ((us // {_SLIDE_MIN * 60 * 1_000_000}) - o) * {_SLIDE_MIN * 60 * 1_000_000}
               AS wstart_us,
             event_type, value
      FROM ev, (SELECT unnest({list(range(_N_OVERLAP))}) AS o)
    )
    SELECT STRFTIME(make_timestamp(wstart_us), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM w GROUP BY 1, 2
    """,
    doc=(
        "Sliding event-time windows (1h size, 20min slide): overlapping-"
        "window assignment (size/slide windows per event), watermark-"
        "bounded state. The oracle replays Spark's window math (floor to "
        "slide grid, one row per overlap offset) in SQL."
    ),
    tags=("streaming", "window", "eventtime"),
)
def st05(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(sliding_agg(read_events_stream(spark, sf_dir)), "complete")


# ---------------------------------------------------------------------------
# stream-static join
# ---------------------------------------------------------------------------


def stream_static_enrich(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch hash-joins against the static
    dimension (re-broadcast per batch; at scale, a broadcast of the dim
    or a bucketed static side). Aggregation keys on the dim attribute."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "st04_stream_static_join",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    doc=(
        "Stream-static broadcast join + windowless agg (complete mode): "
        "the streaming enrichment shape — every micro-batch joins the "
        "static customer dim without state; only the aggregate is "
        "stateful."
    ),
    tags=("streaming", "join"),
)
def st04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tags_etl_spark.sources.tpch import load_table

    customers = load_table(spark, sf_dir, "customer")
    return run_to_memory(stream_static_enrich(read_events_stream(spark, sf_dir), customers), "complete")


# ---------------------------------------------------------------------------
# stream-stream interval join
# ---------------------------------------------------------------------------

_JOIN_RANGE_S = 3600
_JOIN_WATERMARK_S = 1800
_JOIN_WATERMARK = f"{_JOIN_WATERMARK_S} seconds"
_JOIN_COND = (
    f"e_user = c_user AND c_ts > e_ts AND c_ts <= e_ts + INTERVAL {_JOIN_RANGE_S} SECONDS"
)


def _interval_join_sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The shared err/clk sides of the st06/st07 interval joins: one
    definition so watermark delay and column shapes cannot drift between
    the inner and outer variants."""
    err = (
        events.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
            F.expr("ts_ns DIV 1000").alias("e_us"),
        )
        .withWatermark("e_ts", _JOIN_WATERMARK)
    )
    clk = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.expr("ts_ns DIV 1000").alias("c_us"),
        )
        .withWatermark("c_ts", _JOIN_WATERMARK)
    )
    return err, clk


def stream_stream_interval_join(events: DataFrame) -> DataFrame:
    """Errors joined to the same user's clicks within 1 hour after — as a
    STREAM-STREAM join: both sides watermarked, the join condition bounds
    event time on both sides, so each side's buffered state evicts once
    the other stream's watermark passes the range. The batch equivalent
    is av07's bucketed range join (same oracle shape); here the interval
    bound is what makes unbounded-stream state finite.
    """
    err, clk = _interval_join_sides(events)
    return err.join(clk, F.expr(_JOIN_COND)).select(
        "err_id",
        "click_id",
        F.col("e_user").alias("user_id"),
        ((F.col("c_us") - F.col("e_us")) / F.lit(1000)).cast("bigint").alias("lag_ms"),
    )


@register(
    "st06_stream_stream_join",
    oracle=f"""
    SELECT e.event_id AS err_id, c.event_id AS click_id, e.user_id,
           CAST((epoch_us(c.ts) - epoch_us(e.ts)) // 1000 AS BIGINT) AS lag_ms
    FROM events e
    JOIN events c
      ON c.user_id = e.user_id
     AND e.event_type = 'error' AND c.event_type = 'click'
     AND c.ts > e.ts
     AND epoch_us(c.ts) - epoch_us(e.ts) <= CAST({_JOIN_RANGE_S} AS BIGINT) * 1000000
    """,
    doc=(
        "Stream-stream interval join (errors ⋈ clicks within 1h, same "
        "user): both sides watermarked, event-time-bounded condition ⇒ "
        "finite buffered state on an unbounded stream. Single-batch "
        "AvailableNow run equals the batch range join (av07's oracle)."
    ),
    tags=("streaming", "join", "eventtime"),
)
def st06(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(
        stream_stream_interval_join(read_events_stream(spark, sf_dir)), "append"
    )


# ---------------------------------------------------------------------------
# stream-stream LEFT OUTER interval join
# ---------------------------------------------------------------------------

#: Unmatched-row emission boundary: an error's null row emits once the
#: click watermark passes its join window. Final watermark = max event
#: time - _JOIN_WATERMARK_S delay; window = _JOIN_RANGE_S; plus a 60 s
#: margin to absorb the engine's ms-truncated watermark bookkeeping. Rows
#: inside the margin band are excluded deterministically on BOTH engine
#: and oracle sides, so the compare never rides the eviction boundary.
#: Derived (not hardcoded) so retuning the watermark keeps the cutoff safe.
_OUTER_SAFETY_S = _JOIN_RANGE_S + _JOIN_WATERMARK_S + 60


def stream_stream_outer_join(events: DataFrame) -> DataFrame:
    """st06's interval join as LEFT OUTER: errors with no click within 1h
    emit a null-click row — but only once the click-side watermark passes
    the error's join window (that is what bounds the buffered state; a
    batch outer join has no such notion). ``e_ts`` is kept in the output
    so the caller can apply the deterministic emission cutoff."""
    err, clk = _interval_join_sides(events)
    joined = err.join(clk, F.expr(_JOIN_COND), "left_outer")
    return joined.select(
        "err_id",
        "click_id",
        F.col("e_user").alias("user_id"),
        ((F.col("c_us") - F.col("e_us")) / F.lit(1000)).cast("bigint").alias("lag_ms"),
        "e_ts",
    )


@register(
    "st07_stream_outer_join",
    oracle=f"""
    WITH m AS (SELECT least(
                 (SELECT max(ts) FROM events WHERE event_type = 'error'),
                 (SELECT max(ts) FROM events WHERE event_type = 'click')) AS mx),
         j AS (
           SELECT e.event_id AS err_id, c.event_id AS click_id, e.user_id,
                  CAST((epoch_us(c.ts) - epoch_us(e.ts)) // 1000 AS BIGINT) AS lag_ms,
                  e.ts AS e_ts
           FROM (SELECT * FROM events WHERE event_type = 'error') e
           LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             ON c.user_id = e.user_id
            AND c.ts > e.ts
            AND epoch_us(c.ts) - epoch_us(e.ts) <= CAST({_JOIN_RANGE_S} AS BIGINT) * 1000000
         )
    SELECT err_id, click_id, user_id, lag_ms
    FROM j, m
    WHERE click_id IS NOT NULL
       OR e_ts < date_trunc('second', mx - INTERVAL {_OUTER_SAFETY_S} SECONDS)
    """,
    doc=(
        "LEFT OUTER stream-stream interval join: matched rows emit "
        "immediately; null rows emit on watermark-driven state eviction. "
        "Both engine and oracle exclude the 60 s eviction-boundary band, "
        "making the unmatched set deterministic."
    ),
    tags=("streaming", "join", "eventtime"),
)
def st07(spark: SparkSession, sf_dir: str) -> DataFrame:
    res, wm_us = run_to_memory_with_progress(
        stream_stream_outer_join(read_events_stream(spark, sf_dir)), "append"
    )
    # Cutoff from the query's OWN final watermark (progress metrics) —
    # no second scan of the events table. The engine floors max event
    # time to ms before subtracting the (whole-second) delay, so
    # truncating the cutoff to the whole second makes it agree exactly
    # with the oracle's usec-precise max-derived cutoff:
    # floor_sec(floor_ms(mx) - D) == floor_sec(mx) - D.
    if wm_us is None:
        cutoff_us = -(2**62)  # watermark never advanced: no null row is final
    else:
        cutoff_us = (wm_us // 1_000_000 - (_JOIN_RANGE_S + 60)) * 1_000_000
    return res.where(
        F.col("click_id").isNotNull() | (F.unix_micros(F.col("e_ts")) < F.lit(cutoff_us))
    ).select("err_id", "click_id", "user_id", "lag_ms")


# ---------------------------------------------------------------------------
# foreachBatch sink
# ---------------------------------------------------------------------------


def run_foreach_batch(stream: DataFrame, batch_fn) -> None:
    """§2.9's batch-of-50 keyed enrichment analog: ``foreachBatch`` hands
    each micro-batch to arbitrary batch-DataFrame logic (enrichment
    joins, idempotent upserts, multi-sink writes) with the batch id for
    exactly-once bookkeeping."""
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        record_state_ops(q, "foreachBatch")
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# streaming CDC upsert via foreachBatch (merge-into pattern)
# ---------------------------------------------------------------------------


def streaming_upsert(stream: DataFrame) -> DataFrame:
    """Streaming MERGE INTO: every micro-batch is reduced to one
    last-write-wins row per key and merged into the standing keyed table
    — the foreachBatch + upsert shape that maintains a serving table
    from a CDC stream.

    Layout-invariance: "keep the row with the larger (ts_us, event_id)"
    is associative and commutative, so any micro-batch partitioning of
    the same events yields the same final table (proved in
    tests/test_streaming.py against a differently-batched run and the
    batch oracle).

    The standing table is a versioned parquet target merged through the
    engine-level MERGE primitive (operators/maintenance.py:upsert_lww,
    the uz01 shape): per batch, an argmax pre-reduction shrinks the
    merge input to O(keys-in-batch), then a co-partitioned full-outer
    join against the current version writes the next version. Writing
    to ``v{batch_id}`` makes retries idempotent (exactly-once on top of
    foreachBatch's at-least-once). No ``.collect()`` anywhere — the
    driver holds only the current-version path."""
    import shutil
    import tempfile

    from spotify_tags_etl_spark.operators.maintenance import upsert_lww

    spark = stream.sparkSession
    root = tempfile.mkdtemp(prefix="st08_merge_")
    current: list[str] = []  # version POINTER, not state

    plan_seen: set = set()  # r13: fingerprint each label once per run
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        # Order on (usec, event_id): DuckDB reads the NANOS column at
        # microsecond precision, so the merge relation must not depend
        # on sub-usec digits the oracle cannot see.
        w = Window.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
        latest = (
            batch.withColumn("ts_us", F.expr("ts_ns DIV 1000"))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("user_id", "event_id", "ts_us", "value")
        )
        if current:
            merged = upsert_lww(
                spark.read.parquet(current[0]), latest, "user_id", ("ts_us", "event_id")
            )
        else:
            merged = latest
        target = os.path.join(root, f"v{batch_id}")
        record_batch_plan(merged, "st08:merge", seen=plan_seen)
        merged.write.mode("overwrite").parquet(target)
        current[:] = [target]

    q = (
        stream.select("user_id", "event_id", "ts_ns", "value")
        .writeStream.foreachBatch(apply_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        record_state_ops(q, "foreachBatch")
    finally:
        q.stop()
    if not current:
        return spark.createDataFrame(
            [], "user_id long, last_event_id long, last_ts_us long, last_value double"
        )
    final = (
        spark.read.parquet(current[0])
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts_us").alias("last_ts_us"),
            F.col("value").alias("last_value"),
        )
        .localCheckpoint(eager=True)  # detach from the temp files before cleanup
    )
    shutil.rmtree(root, ignore_errors=True)
    return final


@register(
    "st08_stream_upsert",
    oracle="""
    SELECT user_id, event_id AS last_event_id,
           epoch_us(ts) AS last_ts_us, value AS last_value
    FROM (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 ORDER BY user_id
    """,
    doc=(
        "Streaming CDC upsert: foreachBatch reduces each micro-batch to "
        "last-write-wins per key and merges into the standing keyed "
        "table. Merge relation is associative+commutative, so the final "
        "table is micro-batch-layout invariant; oracle is the batch "
        "argmax per key."
    ),
    tags=("streaming", "upsert", "cdc"),
)
def st08(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_upsert(read_events_stream(spark, sf_dir))


# ---------------------------------------------------------------------------
# streaming near-duplicate detection (incremental MinHash+LSH)
# ---------------------------------------------------------------------------


def streaming_neardup(
    stream_docs: DataFrame, corpus_docs: DataFrame, threshold_permille: int = 800
) -> DataFrame:
    """Incremental MinHash+LSH near-dup detection: each micro-batch of
    documents is shingled and signatured, banded against the STANDING
    signature store UNION the batch itself (so new-new and new-old
    collisions both surface), and the candidate pairs accumulate; exact
    Jaccard verification runs ONCE at the end over the distinct pair
    set, fetching shingles from the corpus table pruned to candidate
    docs (at scale: a keyed lakehouse lookup, never a re-shingle of
    everything).

    The final pair set provably equals batch dd02's: a pair band-
    collides independently of which batch each member arrived in, and
    (least, greatest) canonicalization + the closing distinct absorb
    both orientations and any retried-batch re-appends (append-mode
    candidate writes are therefore retry-safe). The signature store is
    batch-id-versioned parquet like st08 — no driver-held state beyond
    the current-version path."""
    import shutil
    import tempfile

    from spotify_tags_etl_spark.operators.dedup import (
        banded_frame,
        jaccard_verify,
        minhash_signatures,
        word_shingles,
    )

    spark = stream_docs.sparkSession
    root = tempfile.mkdtemp(prefix="st09_neardup_")
    pairs_dir = os.path.join(root, "pairs")
    current: list[str] = []  # signature-store version pointer

    plan_seen: set = set()  # r13: fingerprint each label once per run
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        from spotify_tags_etl_spark.functions.concurrency import fan_out_scan

        # r12 §14: fan the single-split fixture batch out to the core
        # count before the per-doc signature map work (scale-adaptive
        # no-op once the batch already has >= cores partitions)
        batch = fan_out_scan(batch, "doc_id")
        # r13 (guide §1.2): the batch signature subtree fed THREE plan
        # branches (both candidate join sides + the store write), so the
        # shingle explode + 8-perm MinHash ran three times per trigger.
        # Materialize it once; the two overlapped write jobs below and
        # the self-join both read the checkpoint.
        sig_b = minhash_signatures(word_shingles(batch)).localCheckpoint(
            eager=True
        )
        sig_all = (
            sig_b.unionByName(spark.read.parquet(current[0])) if current else sig_b
        )
        new_side = banded_frame(sig_b).alias("l")
        all_side = banded_frame(sig_all).alias("r")
        cand = (
            new_side.join(
                all_side,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bk") == F.col("r.bk"))
                & (F.col("l.doc_id") != F.col("r.doc_id")),
            )
            .select(
                F.least("l.doc_id", "r.doc_id").alias("d1"),
                F.greatest("l.doc_id", "r.doc_id").alias("d2"),
            )
            .distinct()
        )
        record_batch_plan(cand, "st09:candidates", seen=plan_seen)
        target = os.path.join(root, f"sig_v{batch_id}")
        record_batch_plan(sig_all, "st09:signatures", seen=plan_seen)
        # r12 §2.6: the candidate append and the signature-store
        # version write are independent sinks (append is retry-safe by
        # the closing distinct; the version pointer advances only after
        # its own write) — overlap them
        from spotify_tags_etl_spark.functions.concurrency import run_parallel

        run_parallel(
            lambda: cand.write.mode("append").parquet(pairs_dir),
            lambda: sig_all.write.mode("overwrite").parquet(target),
        )
        current[:] = [target]

    q = (
        stream_docs.select("doc_id", "text")
        .writeStream.foreachBatch(apply_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        record_state_ops(q, "foreachBatch")
    finally:
        q.stop()
    if not os.path.isdir(pairs_dir):
        return spark.createDataFrame([], "d1 long, d2 long, jaccard_permille long")
    pairs = spark.read.parquet(pairs_dir).distinct()
    # verify once, against corpus shingles pruned to candidate docs
    cand_ids = pairs.select(F.col("d1").alias("doc_id")).unionByName(
        pairs.select(F.col("d2").alias("doc_id"))
    ).distinct()
    sh = word_shingles(corpus_docs.join(cand_ids, "doc_id", "left_semi"))
    out = jaccard_verify(pairs, sh, threshold_permille).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


from spotify_tags_etl_spark.operators.dedup import _minhash_oracle as _dd02_oracle


@register(
    "st09_stream_neardup",
    oracle=_dd02_oracle(800),  # same logical result as batch dd02
    doc=(
        "Streaming MinHash+LSH near-dup detection: per micro-batch, new "
        "signatures band-join against the standing signature store plus "
        "the batch itself; candidates accumulate append-only (retry-"
        "safe under the closing distinct); exact-Jaccard verification "
        "runs once at stream end against corpus shingles pruned to "
        "candidate docs. Final pair set provably equals batch dd02 for "
        "any micro-batch layout (pinned in tests/test_streaming.py)."
    ),
    tags=("streaming", "dedup", "lsh"),
)
def st09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tags_etl_spark.sources.tpch import load_table

    return streaming_neardup(
        read_table_stream(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "documents"),
    )


# ---------------------------------------------------------------------------
# streaming funnel (incremental sequential-pattern state)
# ---------------------------------------------------------------------------


def streaming_funnel(stream_events: DataFrame) -> DataFrame:
    """Incremental funnel (CEP-lite): per user, maintain the anchors
    (first view, first click after it, first purchase after that) as a
    keyed state table, merged set-orientedly per micro-batch — no
    per-row driver logic, no Python state; the same versioned-parquet
    state idiom as st08/st09.

    Per batch the three anchors re-derive from (standing state ∪ batch
    mins): ``mv' = min(mv, batch view min)``, ``mc' = min(mc, batch
    click min > mv')``, ``mp'`` analogously — each a keyed aggregate of
    the BATCH joined to the key-sized state, exact under event-time-
    ordered arrival (the file source's time-split contract; within a
    batch ordering is irrelevant because the set expressions see the
    whole batch). Output = xf01's per-step user counts, same oracle.

    (``xw`` registry name: sorts after the current driver window so it
    queues for the next rotation — see plans/registry.py.)"""
    import shutil
    import tempfile

    spark = stream_events.sparkSession
    root = tempfile.mkdtemp(prefix="xw01_funnel_")
    current: list[str] = []

    plan_seen: set = set()  # r13: fingerprint each label once per run
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        b = batch.select("user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
        state = (
            spark.read.parquet(current[0])
            if current
            else spark.createDataFrame([], "user_id long, mv timestamp, mc timestamp, mp timestamp")
        )
        keys = (
            b.select("user_id").unionByName(state.select("user_id")).distinct()
        )
        st = keys.join(state, "user_id", "left")
        bv = b.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("bv"))
        st = st.join(bv, "user_id", "left").withColumn("mv", F.least("mv", "bv")).withColumn(
            "mv", F.coalesce("mv", "bv")
        ).drop("bv")
        bc = (
            b.where(F.col("event_type") == "click")
            .join(st.select("user_id", "mv"), "user_id")
            .where(F.col("ts") > F.col("mv"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("bc"))
        )
        st = st.join(bc, "user_id", "left").withColumn("mc", F.least("mc", "bc")).withColumn(
            "mc", F.coalesce("mc", "bc")
        ).drop("bc")
        bp = (
            b.where(F.col("event_type") == "purchase")
            .join(st.select("user_id", "mc"), "user_id")
            .where(F.col("ts") > F.col("mc"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("bp"))
        )
        st = st.join(bp, "user_id", "left").withColumn("mp", F.least("mp", "bp")).withColumn(
            "mp", F.coalesce("mp", "bp")
        ).drop("bp")
        target = os.path.join(root, f"v{batch_id}")
        record_batch_plan(st, "xw01:funnel_state", seen=plan_seen)
        st.write.mode("overwrite").parquet(target)
        current[:] = [target]

    q = (
        stream_events.select("user_id", "event_type", "ts")
        .writeStream.foreachBatch(apply_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        record_state_ops(q, "foreachBatch")
    finally:
        q.stop()
    if not current:
        return spark.createDataFrame([], "step string, n_users long")
    st = spark.read.parquet(current[0])
    out = (
        st.agg(F.lit("view").alias("step"), F.count("mv").alias("n_users"))
        .unionByName(st.agg(F.lit("view>click").alias("step"), F.count("mc").alias("n_users")))
        .unionByName(
            st.agg(F.lit("view>click>purchase").alias("step"), F.count("mp").alias("n_users"))
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "xw01_stream_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS mv FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS mc
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.mv
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS mp
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.mc
      GROUP BY e.user_id
    )
    SELECT 'view' AS step, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL SELECT 'view>click', (SELECT COUNT(*) FROM c)
    UNION ALL SELECT 'view>click>purchase', (SELECT COUNT(*) FROM p)
    """,
    doc=(
        "Streaming funnel: the xf01 sequential pattern maintained "
        "incrementally — per micro-batch, the three per-user anchors "
        "merge set-orientedly into a versioned keyed state table "
        "(st08's idiom; state is O(users), merge input O(keys-in-"
        "batch)). Equals the batch funnel under event-time-ordered "
        "arrival; same oracle as xf01."
    ),
    tags=("streaming", "funnel", "cep"),
)
def xw01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_funnel(read_events_stream(spark, sf_dir))


# ---------------------------------------------------------------------------
# streaming sketch maintenance (incremental HLL rollup)
# ---------------------------------------------------------------------------


def streaming_hll_rollup(spark: SparkSession, sf_dir: str, stream: DataFrame) -> DataFrame:
    """Streaming maintenance of xk02's per-(week, day) HyperLogLog store:
    every micro-batch is reduced to O(days-in-batch) sketch partials and
    merged into the standing store by register-wise ``hll_union`` — an
    associative, commutative AND idempotent relation, so the final store
    is micro-batch-layout invariant and retry-safe by algebra alone (no
    dedup bookkeeping, unlike count-based upserts). Versioned parquet
    target (st08's pattern); the driver holds only the version pointer.

    At stream end the store's weekly union estimates are anchored two
    ways (verdict columns only, like av14's exact): equality with the
    batch-direct weekly sketch, and a 5% tolerance against the exact
    distinct. At 100 TB the store IS the dashboard table: per-day
    sketch bytes are O(4KB), batches never re-scan history, and any
    coarser rollup is a union over stored partials.
    """
    import shutil
    import tempfile

    from spotify_tags_etl_spark.operators.advanced import _DAY_US, _XK02_BOUND
    from spotify_tags_etl_spark.sources.tpch import load_table

    root = tempfile.mkdtemp(prefix="xk03_hll_")
    current: list[str] = []  # version pointer, not state

    plan_seen: set = set()  # r13: fingerprint each label once per run
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        daily = (
            batch.select(
                "user_id",
                F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day"),
                F.expr(f"unix_micros(ts) DIV {7 * _DAY_US}").alias("wk"),
            )
            .groupBy("wk", "day")
            .agg(F.hll_sketch_agg("user_id").alias("sk"))
        )
        if current:
            stored = spark.read.parquet(current[0])
            merged = (
                stored.select("wk", "day", F.col("sk").alias("sk_a"))
                .join(daily.select("wk", "day", F.col("sk").alias("sk_b")), ["wk", "day"], "full_outer")
                .select(
                    "wk",
                    "day",
                    F.when(F.col("sk_a").isNull(), F.col("sk_b"))
                    .when(F.col("sk_b").isNull(), F.col("sk_a"))
                    .otherwise(F.hll_union(F.col("sk_a"), F.col("sk_b")))
                    .alias("sk"),
                )
            )
        else:
            merged = daily
        target = os.path.join(root, f"v{batch_id}")
        record_batch_plan(merged, "xk03:hll_merge", seen=plan_seen)
        merged.write.mode("overwrite").parquet(target)
        current[:] = [target]

    run_foreach_batch(stream.select("user_id", "ts"), apply_batch)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(ts) DIV {7 * _DAY_US}").alias("wk"),
        F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day"),
    )
    # Apples-to-apples anchor: batch-side UNION of the same daily partials,
    # not a directly-built weekly sketch. Datasketches HLL estimates a
    # directly-updated sketch with its HIP estimator but a UNIONED sketch
    # with the composite estimator, so "union == direct" is NOT a true
    # invariant — it held at sf0.01 by coincidence and broke at sf0.1.
    # Union associativity (stream-merge layout invariance) is the property
    # this query actually claims, and union-vs-union tests exactly that;
    # closeness to ground truth is the separate 5% n_exact band.
    anchor = (
        ev.groupBy("wk", "day")
        .agg(F.hll_sketch_agg("user_id").alias("dsk"))
        .groupBy("wk")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("dsk")).alias("_direct"))
        .join(ev.groupBy("wk").agg(F.count_distinct("user_id").alias("n_exact")), "wk")
    )
    if not current:
        return spark.createDataFrame([], "wk long, n_exact long, merged_ok boolean")
    store = spark.read.parquet(current[0])
    weekly = store.groupBy("wk").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est")
    )
    out = (
        weekly.join(anchor, "wk")
        .select(
            "wk",
            "n_exact",
            (
                (F.col("_est") == F.col("_direct"))
                & (F.abs(F.col("_est") - F.col("n_exact")) <= F.lit(_XK02_BOUND) * F.col("n_exact"))
            ).alias("merged_ok"),
        )
        .localCheckpoint(eager=True)  # detach before temp cleanup
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "xk03_stream_hll_rollup",
    oracle=f"""
    SELECT epoch_us(ts) // {7 * 86_400 * 1_000_000} AS wk,
           COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS merged_ok
    FROM events GROUP BY epoch_us(ts) // {7 * 86_400 * 1_000_000}
    """,
    doc=(
        "Streaming HLL sketch maintenance: per-batch daily sketch "
        "partials hll_union-merged into a versioned standing store — "
        "register-wise union is associative, commutative, and "
        "IDEMPOTENT, so layout invariance and retry safety hold by "
        "algebra with zero dedup bookkeeping. Verdict: streaming-"
        "merged weekly estimates equal the batch-direct sketch AND "
        "land within 5% of exact (av14-style anchor)."
    ),
    tags=("streaming", "sketch", "incremental"),
)
def xk03(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_hll_rollup(spark, sf_dir, read_events_stream(spark, sf_dir))


#: xw05 candidate watermark delays (minutes) audited against the log.
_WM_CANDIDATES_MIN = (1, 10, 60)

#: Deterministic bounded-jitter arrival model: each event arrives at
#: event-time + 0..4095 seconds of Knuth-hash jitter — the mostly-
#: ordered-with-bounded-disorder shape real ingest has (a full random
#: permutation would mark ~everything late; zero jitter marks nothing).
#: Pure integer arithmetic, identical in both engines.
_ARR = "(epoch_us(ts) + ((event_id * 2654435761) % 4096) * 1000000)"
_ARR_SPARK = "(unix_micros(ts) + ((event_id * 2654435761) % 4096) * 1000000)"


@register(
    "xw05_watermark_lateness_audit",
    oracle=f"""
    WITH arr AS (
      SELECT event_id, epoch_us(ts) AS us,
             MAX(epoch_us(ts)) OVER (ORDER BY {_ARR}, event_id
                                     ROWS UNBOUNDED PRECEDING) AS hwm
      FROM events
    ),
    lateness AS (SELECT event_id, hwm - us AS late_us FROM arr)
    SELECT * FROM (
      {" UNION ALL ".join(
          f"SELECT {m} AS watermark_min, COUNT(*) AS n_events, "
          f"COUNT(*) FILTER (WHERE late_us > {m * 60 * 1_000_000}) AS n_dropped, "
          f"(1000000 * COUNT(*) FILTER (WHERE late_us > {m * 60 * 1_000_000})) // COUNT(*) AS drop_ppm "
          "FROM lateness"
          for m in _WM_CANDIDATES_MIN
      )}
    )
    ORDER BY watermark_min
    """,
    doc=(
        "Watermark lateness audit: replay the event log in ARRIVAL "
        "order (event time plus 0-68 min of deterministic Knuth-hash "
        "jitter - bounded out-of-orderness, the shape real ingest "
        "has), track the running "
        "event-time high-water mark, and for each candidate watermark "
        "delay count the events that would have been DROPPED as "
        "too-late — the measurement that chooses st01/st02's "
        "watermark instead of guessing it ('measure, don't guess' "
        "applied to streaming design; the drop rate IS the "
        "correctness cost of each state-size choice). The running max "
        "rides scalerank.prefix_max — range-partitioned parallel "
        "per-partition maxima + broadcast prefix offsets, exactly the "
        "partition-local-scan-with-carried-offsets shape an ingest "
        "log has at scale — followed by one conditional aggregate per "
        "candidate over the checkpointed lateness frame."
    ),
    tags=("streaming", "watermark", "audit"),
)
def xw05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tags_etl_spark.operators.scalerank import prefix_max
    from spotify_tags_etl_spark.sources.tpch import load_table as _lt

    # Running event-time high-water mark over ARRIVAL order via
    # scalerank.prefix_max: range-partition on the arrival key, parallel
    # per-partition running max, GREATEST with the broadcast prefix of
    # preceding partitions' maxima — no single-reducer window (the
    # global-order window lives only in the oracle as the truth anchor).
    arr = _lt(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.expr(_ARR_SPARK).alias("_arr"),
    )
    hwm = prefix_max(
        arr, [F.col("_arr").asc(), F.col("event_id").asc()], "us", out_col="hwm"
    )
    late = hwm.select((F.col("hwm") - F.col("us")).alias("late_us"))
    # ONE aggregate pass counts every candidate's drops (the lateness
    # frame and its running max are computed once, not once per
    # candidate), then inline() unpacks the O(#candidates) row set.
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for m in _WM_CANDIDATES_MIN:
        thr = m * 60 * 1_000_000  # precomputed: a 60-min literal product
        # written inline would overflow INT32 in both engines' parsers
        aggs.append(F.count(F.when(F.col("late_us") > thr, 1)).alias(f"_nd_{m}"))
    one = late.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(m).alias("watermark_min"),
                F.col("n_events").alias("n_events"),
                F.col(f"_nd_{m}").alias("n_dropped"),
                F.expr(f"(1000000 * _nd_{m}) DIV n_events").alias("drop_ppm"),
            )
            for m in _WM_CANDIDATES_MIN
        ]
    )
    return one.select(F.inline(rows))


# ---------------------------------------------------------------------------
# streaming count-min maintenance (incremental frequency sketch)
# ---------------------------------------------------------------------------


def streaming_cms_rollup(spark: SparkSession, sf_dir: str, stream: DataFrame) -> DataFrame:
    """Streaming maintenance of xz06's count-min table: each micro-batch
    reduces to <= D*W counter-cell partials, summed cell-wise into the
    standing store (versioned parquet, st08/xk03's idiom). Counter
    addition is associative and commutative, so the merged sketch is
    BIT-IDENTICAL to the batch-built one whatever the micro-batch
    layout — which is why this query checks against the very same
    DuckDB oracle as xz06, not a weaker streaming-only verdict.
    (Contrast xk03's HLL, whose union is also idempotent; counter adds
    are not — exactly-once delivery comes from the availableNow
    file-source contract + versioned targets keyed by batch_id.)

    At 100 TB/day the store stays D*W rows forever; batches never
    re-scan history, and the heavy-hitter dashboard reads one tiny
    table. State lives in the store, not the state-store — no watermark
    needed for a monotone additive aggregate.
    """
    import os
    import shutil
    import tempfile

    from spotify_tags_etl_spark.operators.sketches import cms_report, cms_sketch
    from spotify_tags_etl_spark.sources.tpch import load_table

    root = tempfile.mkdtemp(prefix="xw06_cms_")
    current: list[str] = []  # version pointer, not state

    plan_seen: set = set()  # r13: fingerprint each label once per run
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        part = cms_sketch(batch, "event_type")
        if current:
            stored = spark.read.parquet(current[0])
            merged = stored.union(part).groupBy("j", "bucket").agg(F.sum("c").alias("c"))
        else:
            merged = part
        target = os.path.join(root, f"v{batch_id}")
        record_batch_plan(merged, "xw06:cms_merge", seen=plan_seen)
        merged.write.mode("overwrite").parquet(target)
        current[:] = [target]

    run_foreach_batch(stream.select("event_type"), apply_batch)

    if not current:
        return spark.createDataFrame(
            [], "event_type string, est_count long, exact_count long, overcount long"
        )
    sketch = spark.read.parquet(current[0])
    out = cms_report(spark, sf_dir, sketch).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


def _cms_oracle() -> str:
    from spotify_tags_etl_spark.operators.sketches import CMS_ORACLE

    return CMS_ORACLE


@register(
    "xw06_stream_cms_rollup",
    oracle=_cms_oracle(),
    doc=(
        "Streaming count-min maintenance: per-micro-batch counter-cell "
        "partials summed into a standing D*W store — additive merge "
        "makes the incrementally-built sketch bit-identical to xz06's "
        "batch build, checked against the SAME oracle (frequency "
        "cousin of xk03's idempotent HLL union store)."
    ),
    tags=("streaming", "sketch", "incremental"),
)
def xw06(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_cms_rollup(spark, sf_dir, read_events_stream(spark, sf_dir))


# ---------------------------------------------------------------------------
# transformWithState running aggregates (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------


def transform_with_state_available() -> bool:
    """The transformWithState Python runner serializes its state-server
    protocol with ``google.protobuf``, which pyspark does NOT vendor.
    In environments without protobuf (this container), the query is
    implemented but cannot execute — gate registration on the import so
    the operator appears exactly where it can run (the brief's
    import-try pattern; st03's applyInPandasWithState is the exercised
    custom-stateful path everywhere else)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _make_running_stats_processor():
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningStats(StatefulProcessor):
        def init(self, handle) -> None:
            self._st = handle.getValueState("st", "n BIGINT, s BIGINT, mx BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n, s, mx = (self._st.get() or (0, 0, None)) if self._st.exists() else (0, 0, None)
            for pdf in rows:
                if len(pdf):
                    n += int(len(pdf))
                    s += int(pdf["cents"].sum())
                    m = int(pdf["cents"].max())
                    mx = m if mx is None else max(mx, m)
            self._st.update((n, s, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "sum_cents": [s], "max_cents": [mx]}
            )

        def close(self) -> None:
            pass

    return RunningStats()


def stream_running_stats(spark: SparkSession, sf_dir: str, stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) of event cents via the
    arbitrary-state API, merged across micro-batches through a keyed
    ValueState; every batch emits the keys it touched (Update mode) and
    a foreachBatch LWW upsert keeps the serving table at the latest
    emission — st08's versioned-store idiom with transformWithState
    upstream. State is O(users) fixed-width tuples in the state store
    (RocksDB at scale), NOT collected anywhere; at stream end the
    serving table equals the batch groupBy exactly (integer additive
    merges), which is what the oracle checks."""
    import os
    import shutil
    import tempfile

    from spotify_tags_etl_spark.operators.maintenance import upsert

    cents = stream.select(
        "user_id", F.round(F.col("value") * 100, 0).cast("bigint").alias("cents")
    )
    updated = cents.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_running_stats_processor(),
        outputStructType="user_id BIGINT, n BIGINT, sum_cents BIGINT, max_cents BIGINT",
        outputMode="Update",
        timeMode="None",
    )

    root = tempfile.mkdtemp(prefix="xw08_tws_")
    current: list[str] = []

    plan_seen: set = set()  # r13: fingerprint each label once per run
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        latest = batch.dropDuplicates(["user_id"])
        if current:
            stored = spark.read.parquet(current[0])
            merged = upsert(stored, latest, "user_id").drop("_op")
        else:
            merged = latest
        target = os.path.join(root, f"v{batch_id}")
        record_batch_plan(merged, "xw08:stats_merge", seen=plan_seen)
        merged.write.mode("overwrite").parquet(target)
        current[:] = [target]

    run_foreach_batch(updated, apply_batch)

    if not current:
        return spark.createDataFrame(
            [], "user_id long, n long, sum_cents long, max_cents long"
        )
    out = (
        spark.read.parquet(current[0])
        .select("user_id", "n", "sum_cents", "max_cents")
        .orderBy("user_id")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def xw08(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_running_stats(spark, sf_dir, read_events_stream(spark, sf_dir))


if transform_with_state_available():  # pragma: no cover — env-dependent
    register(
        "xw08_stream_running_stats",
        oracle="""
    SELECT user_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS max_cents
    FROM events GROUP BY user_id ORDER BY user_id
    """,
        doc=(
            "Custom stateful streaming via the Spark 4 arbitrary-state "
            "API (transformWithStateInPandas + ValueState): per-user "
            "running count/sum/max of cents merged across micro-"
            "batches, Update-mode emissions LWW-upserted into a "
            "versioned serving table. Integer additive merges make the "
            "end state equal the batch groupBy exactly. API-surface "
            "complement to st03's applyInPandasWithState; registered "
            "only where google.protobuf exists (the runner's wire "
            "dependency, absent in this container)."
        ),
        tags=("streaming", "stateful", "transformWithState"),
    )(xw08)


# ---------------------------------------------------------------------------
# xw09 — streaming orphan detection (the ANTI view of the outer join)
# ---------------------------------------------------------------------------


@register(
    "xw09_stream_orphan_errors",
    oracle=f"""
    WITH m AS (SELECT least(
                 (SELECT max(ts) FROM events WHERE event_type = 'error'),
                 (SELECT max(ts) FROM events WHERE event_type = 'click')) AS mx)
    SELECT e.event_id AS err_id, e.user_id,
           CAST(epoch_us(e.ts) AS BIGINT) AS err_us
    FROM (SELECT * FROM events WHERE event_type = 'error') e, m
    WHERE NOT EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click'
          AND c.user_id = e.user_id
          AND c.ts > e.ts
          AND epoch_us(c.ts) - epoch_us(e.ts) <= CAST({_JOIN_RANGE_S} AS BIGINT) * 1000000
      )
      AND e.ts < date_trunc('second', m.mx - INTERVAL {_OUTER_SAFETY_S} SECONDS)
    ORDER BY err_id
    """,
    doc=(
        "Streaming orphan detection — errors with NO click follow-up "
        "within the hour (abandoned-flow alerting): Structured "
        "Streaming has no stream-stream anti join, so the engine form "
        "is the standard idiom st07 enables — LEFT OUTER interval "
        "join, keep the null-match rows, which by construction emit "
        "only on watermark-driven state eviction (an anti verdict is "
        "only FINAL once the other stream's watermark passes the "
        "window; the cutoff from the query's own progress metrics "
        "makes that deterministic). Oracle: batch NOT EXISTS under "
        "the same eviction cutoff."
    ),
    tags=("streaming", "anti-join", "eventtime"),
)
def xw09(spark: SparkSession, sf_dir: str) -> DataFrame:
    res, wm_us = run_to_memory_with_progress(
        stream_stream_outer_join(read_events_stream(spark, sf_dir)), "append"
    )
    if wm_us is None:
        cutoff_us = -(2**62)
    else:
        cutoff_us = (wm_us // 1_000_000 - (_JOIN_RANGE_S + 60)) * 1_000_000
    return (
        res.where(
            F.col("click_id").isNull() & (F.unix_micros(F.col("e_ts")) < F.lit(cutoff_us))
        )
        .select(
            "err_id",
            "user_id",
            F.unix_micros(F.col("e_ts")).cast("bigint").alias("err_us"),
        )
        .orderBy("err_id")
    )


# ---------------------------------------------------------------------------
# xw10 — streaming checksum maintenance (incremental replication guard)
# ---------------------------------------------------------------------------


@register(
    "xw10_stream_checksum",
    oracle="""
    SELECT 'events' AS tbl, COUNT(*) AS n_rows,
           CAST(SUM(('0x' || substr(md5(
             COALESCE(CAST(event_id AS VARCHAR), '~null~') || ':'
             || COALESCE(CAST(user_id AS VARCHAR), '~null~') || ':'
             || COALESCE(CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS VARCHAR), '~null~')
             || ':' || COALESCE(event_type, '~null~')
           ), 1, 8))::UBIGINT::HUGEINT) AS VARCHAR) AS checksum
    FROM events
    """,
    doc=(
        "Streaming maintenance of xz21's replication checksum: each "
        "micro-batch reduces to ONE (n, checksum-partial) row summed "
        "into the standing pair — row-hash addition is commutative "
        "and associative, so the incrementally-maintained fingerprint "
        "is bit-identical to the batch computation on any micro-batch "
        "layout (xw06's CMS argument applied to integrity checking). "
        "The continuously-current replica guard: O(1) state, zero "
        "rescans, checked against the batch-side oracle."
    ),
    tags=("streaming", "checksum", "incremental"),
)
def xw10(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    stream = read_events_stream(spark, sf_dir)
    # Per-field NULL sentinel, mirroring xz21: concat_ws SKIPS null parts
    # while the oracle's '||' propagates NULL — a NULL-bearing row must
    # hash identically on both sides.
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.coalesce(F.col("event_id").cast("string"), F.lit("~null~")),
                    F.coalesce(F.col("user_id").cast("string"), F.lit("~null~")),
                    F.coalesce(
                        F.round(F.col("value") * 100, 0).cast("bigint").cast("string"),
                        F.lit("~null~"),
                    ),
                    F.coalesce(F.col("event_type"), F.lit("~null~")),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    # DECIMAL(38,0) accumulator, mirroring xz21: the standing checksum
    # passes int64's 2^63 at ~2.1e9 rows (Spark wraps silently, the
    # oracle's HUGEINT is exact) — state and output stay 128-bit.
    enriched = stream.select(h.cast("decimal(38,0)").alias("h"))

    root = tempfile.mkdtemp(prefix="xw10_chk_")
    current: list[str] = []

    plan_seen: set = set()  # r13: fingerprint each label once per run
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        part = batch.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").cast("decimal(38,0)").alias("checksum"),
        )
        if current:
            stored = spark.read.parquet(current[0])
            part = (
                stored.unionByName(part)
                .agg(
                    F.sum("n_rows").cast("bigint").alias("n_rows"),
                    F.sum("checksum").cast("decimal(38,0)").alias("checksum"),
                )
            )
        target = os.path.join(root, f"v{batch_id}")
        record_batch_plan(part, "xw10:checksum_part", seen=plan_seen)
        part.write.mode("overwrite").parquet(target)
        current[:] = [target]

    run_foreach_batch(enriched, apply_batch)

    if not current:
        return spark.createDataFrame([], "tbl string, n_rows long, checksum string")
    out = (
        spark.read.parquet(current[0])
        .select(
            F.lit("events").alias("tbl"),
            "n_rows",
            F.col("checksum").cast("string").alias("checksum"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# yi03 — streaming partition-stats manifest maintenance
# ---------------------------------------------------------------------------


@register(
    "yi03_stream_stats_manifest",
    oracle="""
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           COUNT(*) AS n_rows,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(MAX(user_id) AS BIGINT) AS max_user,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1
    """,
    doc=(
        "Streaming maintenance of yl01's data-skipping manifest: each "
        "micro-batch reduces to O(days-in-batch) stat partials "
        "(count/min/max/sum — every one associative and commutative), "
        "merged into the versioned standing store by the same algebra "
        "(st08/xk03's idiom: write v{batch_id}, driver holds only the "
        "version pointer, retries idempotent). Because the merge is "
        "pure monoid algebra the final manifest is micro-batch-layout "
        "invariant and equals the batch-built manifest EXACTLY — so "
        "this query checks against yl01's own oracle minus the NDV "
        "column (exact distinct is the one stat that does not merge; "
        "at scale it rides xk03's HLL union instead). This is how a "
        "100 TB lake keeps its skipping index current WITHOUT nightly "
        "re-scans: stats arrive with the data."
    ),
    tags=("streaming", "maintenance", "incremental"),
)
def yi03(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    stream = read_events_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="yi03_manifest_")
    current: list[str] = []  # version pointer, not state

    plan_seen: set = set()  # r13: fingerprint each label once per run
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        part = batch.groupBy(
            F.expr("CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.unix_micros("ts")).cast("bigint").alias("min_ts_us"),
            F.max(F.unix_micros("ts")).cast("bigint").alias("max_ts_us"),
            F.min("user_id").cast("bigint").alias("min_user"),
            F.max("user_id").cast("bigint").alias("max_user"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("sum_cents"),
        )
        if current:
            stored = spark.read.parquet(current[0])
            part = (
                stored.unionByName(part)
                .groupBy("day")
                .agg(
                    F.sum("n_rows").cast("bigint").alias("n_rows"),
                    F.min("min_ts_us").cast("bigint").alias("min_ts_us"),
                    F.max("max_ts_us").cast("bigint").alias("max_ts_us"),
                    F.min("min_user").cast("bigint").alias("min_user"),
                    F.max("max_user").cast("bigint").alias("max_user"),
                    F.sum("sum_cents").cast("bigint").alias("sum_cents"),
                )
            )
        target = os.path.join(root, f"v{batch_id}")
        record_batch_plan(part, "yi03:manifest_part", seen=plan_seen)
        part.write.mode("overwrite").parquet(target)
        current[:] = [target]

    run_foreach_batch(stream.select("ts", "user_id", "value"), apply_batch)

    if not current:
        return spark.createDataFrame(
            [],
            "day long, n_rows long, min_ts_us long, max_ts_us long, "
            "min_user long, max_user long, sum_cents long",
        )
    out = (
        spark.read.parquet(current[0])
        .select("day", "n_rows", "min_ts_us", "max_ts_us", "min_user", "max_user", "sum_cents")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return out
