"""Paginated API source family (SURVEY.md §2.1 S4-S6) as Spark-native
distributed sources.

The reference consumes the Spotify REST API as driver-side paged loops:

* S4 ``query_all`` — search pages until an empty page
  (``spotify_client.py:204-245``);
* S5 ``extract_favorite_tracks`` — probe the total with a ``limit=1``
  request, then page by offset (``spotify_client.py:506-553``);
* S6 ``query_audio_features`` — chunk ids into ≤50 per request
  (``spotify_client.py:431-467``).

Here the same shapes are *executor-parallel*:

* ``PagedSearchDataSource`` — a Spark 4 Python DataSource whose reader
  probes the collection size up front (S5's probe) and plans one input
  partition per offset range; each executor pulls its own pages with the
  reference's page size (≤50/request) and optional inter-request delay
  (``api_timeout`` analog). 1000 executors ⇒ 1000 concurrent page
  cursors, not one driver loop.
* ``batched_feature_lookup`` — S6 as ``mapInPandas``: each Arrow batch
  is re-chunked to the API batch limit and looked up per chunk; the
  Arrow batch size (session ``maxRecordsPerBatch``) controls
  request granularity, exactly the §2.10 mapping.

Determinism/test seam: the "remote" catalog is simulated by pure
functions of the item index built on md5 (``_track_row``) — the same
trick the reference's ``offline_ids.py`` uses to cut the network out of
tests, but still executed *through* the full source machinery
(partition planning, page loops, batch chunking). Being md5-derived,
a DuckDB oracle reproduces the collection exactly via ``range()``
(see sp01/sp02) — the source path itself is hash-checked, not just
row-counted. A real deployment swaps ``_fetch_page`` for an HTTP call;
nothing else changes.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.tpch import load_table

API_PAGE_LIMIT = 50  # Spotify max page size (reference api_limit, toml:31-32)

SEARCH_SCHEMA_DDL = (
    "idx BIGINT, track_id STRING, track_name STRING, artist_name STRING, "
    "popularity INT, duration_ms BIGINT"
)

FEATURE_SCHEMA_DDL = "track_idx BIGINT, danceability_millis INT, energy_millis INT, tempo_centi INT"


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _track_row(i: int) -> tuple:
    """The simulated remote catalog: a pure md5-derived function of the
    item index (reproducible in any engine; see the sp01 oracle)."""
    h = _md5_hex(str(i))
    return (
        i,
        h[:22],
        f"track {i:06d}",
        f"artist {i % 97:03d}",
        int(h[:4], 16) % 101,            # popularity 0-100
        30000 + int(h[4:9], 16) % 300000,  # 30s..330s
    )


def _fetch_page(offset: int, limit: int, total: int) -> list[tuple]:
    """One simulated API request: items [offset, offset+limit) ∩ [0, total)."""
    return [_track_row(i) for i in range(offset, min(offset + limit, total))]


class _OffsetRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


# ---------------------------------------------------------------------------
# Adapter contract: point S4/S5 at a REAL paged API
# ---------------------------------------------------------------------------
#
# The engine's paged source is deliberately split into (a) the Spark
# machinery — probe → offset-range partitions → executor page cursors —
# and (b) ONE user-supplied function that performs a page fetch:
#
#     def fetch_page(offset: int, limit: int) -> list[tuple]:
#         '''Return the items at [offset, offset+limit) as tuples
#         matching schema_ddl, [] when the cursor is past the end.'''
#
# That is the whole contract. ``make_paged_datasource`` wraps it in a
# registrable Spark 4 DataSource; everything else (partition planning,
# ≤50-item page loop, empty-page termination = the reference's S4
# semantics, per-cursor rate limiting = the reference's ``api_timeout``
# knob, spotify_client.py:136-138) is provided. The callback must be
# importable/picklable (a module-level function, not a lambda closing
# over sockets) because it executes on the executors.


def make_paged_datasource(
    fetch_page,
    *,
    name: str,
    schema_ddl: str = SEARCH_SCHEMA_DDL,
) -> type:
    """Build a registrable paged-API DataSource around ``fetch_page``.

    ``fetch_page(offset, limit) -> list[tuple]`` is the ONLY code a user
    writes to point the engine at a real HTTP API (requests.get + token
    refresh live inside it). Reader options, all strings per the
    DataSource API:

    * ``total``        — collection size (S5's probe result; run your
                         probe request driver-side and pass it here);
    * ``page_delay_s`` — seconds to sleep before each request, PER
                         EXECUTOR CURSOR — the reference's
                         ``api_timeout`` rate-limit knob
                         (spotify_client.py:136-138);
    * ``pages_per_partition`` — cursor granularity: fewer pages per
                         partition ⇒ more parallel cursors.

    The engine's own synthetic source (``PagedSearchDataSource``) runs
    the identical partition-plan/page-loop machinery with its md5
    catalog as the fetcher — the test path and the real-API path differ
    only in this one function
    (tests/test_paged_source.py::test_custom_fetch_callback injects a
    user callback end-to-end)."""

    class _AdapterReader(DataSourceReader):
        def __init__(self, options: dict):
            self.total = int(options.get("total", "1000"))
            self.page_delay_s = float(options.get("page_delay_s", "0"))
            self.pages_per_partition = int(options.get("pages_per_partition", "4"))

        def partitions(self) -> list[InputPartition]:
            step = API_PAGE_LIMIT * self.pages_per_partition
            return [
                _OffsetRange(o, min(o + step, self.total))
                for o in range(0, self.total, step)
            ]

        def read(self, partition: _OffsetRange) -> Iterator[tuple]:
            offset = partition.start
            while offset < partition.end:
                if self.page_delay_s:
                    time.sleep(self.page_delay_s)
                page = fetch_page(offset, min(API_PAGE_LIMIT, partition.end - offset))
                if not page:
                    break  # S4 semantics: empty page terminates the cursor
                yield from page
                offset += API_PAGE_LIMIT

    ds_name = name

    class _AdapterSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return ds_name

        def schema(self) -> str:
            return schema_ddl

        def reader(self, schema) -> _AdapterReader:
            return _AdapterReader(self.options)

    return _AdapterSource


def read_paged_api(
    spark: SparkSession,
    fetch_page,
    *,
    name: str,
    total: int,
    schema_ddl: str = SEARCH_SCHEMA_DDL,
    pages_per_partition: int = 4,
    page_delay_s: float = 0.0,
) -> DataFrame:
    """One-call adapter entry point: register + read a paged API through
    a user ``fetch_page(offset, limit)`` callback. See
    :func:`make_paged_datasource` for the contract."""
    spark.dataSource.register(
        make_paged_datasource(fetch_page, name=name, schema_ddl=schema_ddl)
    )
    return (
        spark.read.format(name)
        .option("total", str(total))
        .option("pages_per_partition", str(pages_per_partition))
        .option("page_delay_s", str(page_delay_s))
        .load()
    )


class PagedSearchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.total = int(options.get("total", "1000"))  # S5 probe result
        self.page_delay_s = float(options.get("page_delay_s", "0"))
        self.pages_per_partition = int(options.get("pages_per_partition", "4"))

    def partitions(self) -> list[InputPartition]:
        """Plan: contiguous offset ranges of N pages each (the probe+page
        strategy of spotify_client.py:527-539, parallelized)."""
        step = API_PAGE_LIMIT * self.pages_per_partition
        return [_OffsetRange(o, min(o + step, self.total)) for o in range(0, self.total, step)]

    def read(self, partition: _OffsetRange) -> Iterator[tuple]:
        offset = partition.start
        while offset < partition.end:
            if self.page_delay_s:
                time.sleep(self.page_delay_s)  # api_timeout analog — per executor cursor
            page = _fetch_page(offset, min(API_PAGE_LIMIT, partition.end - offset), self.total)
            if not page:
                break  # S4 semantics: empty page terminates the cursor
            yield from page
            offset += API_PAGE_LIMIT


class PagedSearchDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_search"

    def schema(self) -> str:
        return SEARCH_SCHEMA_DDL

    def reader(self, schema) -> PagedSearchReader:
        return PagedSearchReader(self.options)


def register_paged_source(spark: SparkSession) -> None:
    # Unconditional: registration is an idempotent overwrite and costs one
    # RPC. Memoizing on id(spark) (the previous design) silently skips
    # registration when CPython reuses a stopped session's object address.
    spark.dataSource.register(PagedSearchDataSource)


def read_paged_search(spark: SparkSession, total: int, pages_per_partition: int = 4) -> DataFrame:
    register_paged_source(spark)
    return (
        spark.read.format("paged_search")
        .option("total", str(total))
        .option("pages_per_partition", str(pages_per_partition))
        .load()
    )


# ---------------------------------------------------------------------------
# S6: batched keyed lookup as mapInPandas
# ---------------------------------------------------------------------------


def _feature_lookup_batch(ids: list[int]) -> list[tuple]:
    """One simulated audio-features request (≤50 ids). Integer-milli
    features derived from md5 so the oracle is exact (no float parsing)."""
    assert len(ids) <= API_PAGE_LIMIT, "API contract: at most 50 ids per request"
    out = []
    for i in ids:
        h = _md5_hex(f"feat|{i}")
        out.append(
            (
                i,
                int(h[:4], 16) % 1001,        # danceability 0.000-1.000 (millis)
                int(h[4:8], 16) % 1001,       # energy
                int(h[8:12], 16) % 20000,     # tempo 0.00-200.00 (centi)
            )
        )
    return out


def batched_feature_lookup(ids_df: DataFrame, id_col: str = "track_idx") -> DataFrame:
    """S6 (spotify_client.py:431-467) Spark-side: every Arrow batch is
    re-chunked to the ≤50-id API limit; requests run on executors, one
    cursor per partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["track_idx", "danceability_millis", "energy_millis", "tempo_centi"]
        for batch in batches:
            ids = batch[id_col].tolist()
            rows: list[tuple] = []
            for j in range(0, len(ids), API_PAGE_LIMIT):
                rows.extend(_feature_lookup_batch(ids[j : j + API_PAGE_LIMIT]))
            yield pd.DataFrame(rows, columns=cols)

    return ids_df.mapInPandas(run, schema=FEATURE_SCHEMA_DDL)


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

_SP01_TOTAL = 730  # deliberately not a multiple of the page size

#: One oracle for every query that drains the full simulated catalog
#: (sp01 batch source, sp03 UDTF, sz01 stream) — they must stay
#: byte-equivalent because they describe the same _track_row generator,
#: so the SQL lives once. NOTE: lpad(...,6) matches Python's f"{i:06d}"
#: only while total <= 999999 (same clamp both sides).
_CATALOG_ORACLE = f"""
    SELECT i AS idx,
           substr(md5(CAST(i AS VARCHAR)), 1, 22) AS track_id,
           'track ' || lpad(CAST(i AS VARCHAR), 6, '0') AS track_name,
           'artist ' || lpad(CAST(i % 97 AS VARCHAR), 3, '0') AS artist_name,
           CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 4))::INT % 101 AS INT) AS popularity,
           30000 + ('0x' || substr(md5(CAST(i AS VARCHAR)), 5, 5))::BIGINT % 300000 AS duration_ms
    FROM range(0, {_SP01_TOTAL}) t(i)
    """


@register(
    "sp01_paged_source",
    oracle=_CATALOG_ORACLE,
    doc=(
        "Spark 4 Python DataSource for the paginated search API (S4/S5, "
        "spotify_client.py:204-245,506-553): probe total → plan offset-"
        "range partitions → executor-side page cursors (≤50/page). The "
        "simulated catalog is md5-derived, so the oracle reproduces the "
        "whole collection via range() — full value-hash over the source "
        "path."
    ),
    tags=("source", "paged"),
)
def sp01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_paged_search(spark, total=_SP01_TOTAL)


@register(
    "sp03_udtf_pages",
    oracle=_CATALOG_ORACLE,
    doc=(
        "Pagination generator as a Python UDTF (SURVEY §2.10, the "
        "row→N-rows shape of query_all, spotify_client.py:204-245): a "
        "frame of page offsets LATERAL-joined to fetch_page(offset) — "
        "each offset expands to its ≤50-item page on the executors. "
        "Same md5 catalog as sp01, so the full-collection oracle applies."
    ),
    tags=("source", "paged", "udtf"),
)
def sp03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType=SEARCH_SCHEMA_DDL)
    class FetchPage:
        def eval(self, offset: int, total: int):
            yield from _fetch_page(int(offset), API_PAGE_LIMIT, int(total))

    # Re-registering the same name is an idempotent overwrite (the UDTF is
    # closure-free: total arrives as a SQL argument), so concurrent builds
    # can't observe each other's parameters. The offsets come from the
    # range() table function inline — no temp view, no catalog mutation
    # (the repo rule: query builders leave the shared session catalog
    # untouched).
    spark.udtf.register("fetch_page", FetchPage)
    return spark.sql(
        f"SELECT p.* FROM range(0, {_SP01_TOTAL}, {API_PAGE_LIMIT}) o, "
        f"LATERAL fetch_page(CAST(o.id AS INT), {_SP01_TOTAL}) p"
    )


@register(
    "sp02_batched_lookup",
    oracle="""
    WITH ids AS (SELECT DISTINCT l_partkey AS track_idx FROM lineitem WHERE l_partkey <= 300)
    SELECT track_idx,
           CAST(('0x' || substr(md5('feat|' || CAST(track_idx AS VARCHAR)), 1, 4))::INT % 1001 AS INT)
             AS danceability_millis,
           CAST(('0x' || substr(md5('feat|' || CAST(track_idx AS VARCHAR)), 5, 4))::INT % 1001 AS INT)
             AS energy_millis,
           CAST(('0x' || substr(md5('feat|' || CAST(track_idx AS VARCHAR)), 9, 4))::INT % 20000 AS INT)
             AS tempo_centi
    FROM ids
    """,
    doc=(
        "Batched keyed enrichment (S6, spotify_client.py:431-467) as "
        "mapInPandas: distinct keys, Arrow batches re-chunked to the ≤50-"
        "id API limit, executor-parallel lookups. Features are integer "
        "milli-units (exact cross-engine)."
    ),
    tags=("source", "udf", "enrichment"),
)
def sp02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("track_idx"))
        .where(F.col("track_idx") <= 300)
        .distinct()
    )
    return batched_feature_lookup(ids)


# ---------------------------------------------------------------------------
# streaming variant: the paged API as an unbounded source
# ---------------------------------------------------------------------------


from pyspark.sql.datasource import SimpleDataSourceStreamReader


class PagedSearchStreamReader(SimpleDataSourceStreamReader):
    """Streaming cursor over the paged API (Spark 4
    ``SimpleDataSourceStreamReader``): the offset IS the stream offset,
    so micro-batches are exactly page ranges, replay
    (``readBetweenOffsets``) is a deterministic re-fetch of [start, end),
    and a restart resumes from the checkpointed offset — the polling
    analog of the reference's driver-side page loop
    (spotify_client.py:204-245), with exactly-once page accounting.

    A real deployment keeps polling past ``total`` as the collection
    grows; the fixture's fixed total makes the stream's steady state
    (empty batches) testable."""

    def __init__(self, options: dict):
        self.total = int(options.get("total", "1000"))
        self.pages_per_batch = int(options.get("pages_per_batch", "2"))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _fetch_range(self, start: int, end: int) -> list[tuple]:
        rows: list[tuple] = []
        off = start
        while off < end:
            rows.extend(_fetch_page(off, min(API_PAGE_LIMIT, end - off), self.total))
            off += API_PAGE_LIMIT
        return rows

    def read(self, start: dict):
        o = start["offset"]
        end = min(o + API_PAGE_LIMIT * self.pages_per_batch, self.total)
        return iter(self._fetch_range(o, end)), {"offset": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._fetch_range(start["offset"], end["offset"]))


class PagedSearchStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_search_stream"

    def schema(self) -> str:
        return SEARCH_SCHEMA_DDL

    def simpleStreamReader(self, schema) -> PagedSearchStreamReader:
        return PagedSearchStreamReader(self.options)


def read_paged_search_stream(spark: SparkSession, total: int, pages_per_batch: int = 2) -> DataFrame:
    spark.dataSource.register(PagedSearchStreamSource)
    return (
        spark.readStream.format("paged_search_stream")
        .option("total", str(total))
        .option("pages_per_batch", str(pages_per_batch))
        .load()
    )


@register(
    "sz01_stream_paged_source",
    oracle=_CATALOG_ORACLE,
    doc=(
        "The paged API as a STREAMING source (Spark 4 Python "
        "SimpleDataSourceStreamReader): page offset = stream offset, "
        "micro-batch = page range, deterministic replay between "
        "checkpointed offsets. Drained to a memory sink; the full "
        "collection must hash-match the same range() oracle as sp01."
    ),
    tags=("source", "paged", "streaming"),
)
def sz01(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    stream = read_paged_search_stream(spark, total=_SP01_TOTAL)
    name = f"sz01_{_uuid.uuid4().hex[:12]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        # The cursor reaches `total` in total/(pages_per_batch*50) batches;
        # after that read() returns empty batches — stop once drained.
        deadline = time.time() + 120
        while spark.table(name).count() < _SP01_TOTAL:
            if q.exception() is not None:
                # Fail fast with the root cause — a dead stream would
                # otherwise busy-wait the full timeout and mask the error.
                raise q.exception()
            if time.time() >= deadline:
                # Never hand back a silently-truncated collection — a
                # partial table would surface downstream as a value-hash
                # mismatch pointing at the operator, not the timeout.
                raise TimeoutError(
                    f"sz01 drained only {spark.table(name).count()} of "
                    f"{_SP01_TOTAL} rows within 120s"
                )
            time.sleep(0.2)
        # Lazy import: streaming.ops imports nothing from this module's
        # streaming path, but keep the coupling one-way at import time.
        from spotify_tags_etl_spark.streaming.ops import record_state_ops

        record_state_ops(q, "memory")
    finally:
        q.stop()
    # Checkpoint + drop the memory-sink view: same no-leak rule as
    # streaming/ops.run_to_memory.
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def make_paged_stream_datasource(
    fetch_page,
    *,
    name: str,
    schema_ddl: str = SEARCH_SCHEMA_DDL,
) -> type:
    """Streaming twin of :func:`make_paged_datasource`: wrap the same
    ONE-function ``fetch_page(offset, limit) -> list[tuple]`` contract in
    a ``SimpleDataSourceStreamReader`` whose stream offset IS the page
    offset — micro-batches are page ranges, ``readBetweenOffsets`` is a
    deterministic re-fetch, restarts resume from the checkpoint. Options:
    ``total`` (stop polling past it; a live API would keep growing it)
    and ``pages_per_batch``."""

    class _AdapterStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options: dict):
            self.total = int(options.get("total", "1000"))
            self.pages_per_batch = int(options.get("pages_per_batch", "2"))

        def initialOffset(self) -> dict:
            return {"offset": 0}

        def _fetch_range(self, start: int, end: int) -> list[tuple]:
            rows: list[tuple] = []
            off = start
            while off < end:
                page = fetch_page(off, min(API_PAGE_LIMIT, end - off))
                if not page:
                    break
                rows.extend(page)
                off += API_PAGE_LIMIT
            return rows

        def read(self, start: dict):
            o = start["offset"]
            end = min(o + API_PAGE_LIMIT * self.pages_per_batch, self.total)
            return iter(self._fetch_range(o, end)), {"offset": end}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter(self._fetch_range(start["offset"], end["offset"]))

    ds_name = name

    class _AdapterStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return ds_name

        def schema(self) -> str:
            return schema_ddl

        def simpleStreamReader(self, schema) -> _AdapterStreamReader:
            return _AdapterStreamReader(self.options)

    return _AdapterStreamSource
