"""Paginated-source plumbing: partition planning, page-size contract,
chunked lookup. Value correctness vs DuckDB is in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_tags_etl_spark.sources.paged_api import (
    API_PAGE_LIMIT,
    PagedSearchReader,
    batched_feature_lookup,
    read_paged_search,
)


def test_partition_planning_covers_range_without_overlap():
    reader = PagedSearchReader({"total": "730", "pages_per_partition": "4"})
    parts = reader.partitions()
    # 730 items / (50*4) per partition → 4 ranges
    assert [(p.start, p.end) for p in parts] == [(0, 200), (200, 400), (400, 600), (600, 730)]
    seen = []
    for p in parts:
        seen.extend(r[0] for r in reader.read(p))
    assert sorted(seen) == list(range(730))  # every idx exactly once


def test_source_is_executor_partitioned(spark):
    df = read_paged_search(spark, total=730, pages_per_partition=2)
    assert df.rdd.getNumPartitions() == 8  # 730 / (50*2) → 8 ranges
    assert df.count() == 730
    assert df.select(F.countDistinct("idx")).collect()[0][0] == 730


def test_batched_lookup_respects_api_limit(spark):
    # 3 partitions × >50 ids each: every request chunk must be ≤ 50
    ids = spark.range(0, 240).select(F.col("id").alias("track_idx")).repartition(3)
    out = batched_feature_lookup(ids)
    assert out.count() == 240
    assert out.select(F.countDistinct("track_idx")).collect()[0][0] == 240
    row = out.where(F.col("track_idx") == 0).collect()[0]
    assert 0 <= row.danceability_millis <= 1000
    assert API_PAGE_LIMIT == 50


def test_stream_source_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once page accounting across restarts: a checkpointed run
    stopped mid-collection must resume from the committed offset — the
    union of both runs covers every idx exactly once, no page replayed
    into the sink, no page skipped."""
    import time as _time

    from spotify_tags_etl_spark.sources.paged_api import read_paged_search_stream

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "rows")

    def count_out() -> int:
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    def run(min_rows: int, trigger: str, wall_s: float = 120.0) -> int:
        q = (
            read_paged_search_stream(spark, total=730, pages_per_batch=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime=trigger)
            .start()
        )
        try:
            deadline = _time.time() + wall_s
            while _time.time() < deadline and count_out() < min_rows:
                _time.sleep(0.05)
        finally:
            q.stop()
        return count_out()

    # First run: stop at the first visible batch. Batches are 50 rows /
    # 300 ms, and the poll loop reacts within a fraction of a batch
    # interval, so the stop always lands mid-collection (15 batches ≈
    # 4.5 s away from completion).
    first = run(min_rows=1, trigger="300 milliseconds")
    assert 0 < first < 730
    total = run(min_rows=730, trigger="50 milliseconds")  # resume + drain
    assert total == 730
    idx = [r.idx for r in spark.read.parquet(out).select("idx").collect()]
    assert sorted(idx) == list(range(730))  # exactly once, despite restart


# ---------------------------------------------------------------------------
# adapter contract: a USER fetch_page callback through the real machinery
# ---------------------------------------------------------------------------


def _fake_api_fetch(offset: int, limit: int) -> list[tuple]:
    """Stand-in for a user's HTTP page fetch: deterministic rows keyed by
    index, honoring the [offset, offset+limit) window. Module-level so it
    pickles to executors exactly like a real adapter would."""
    _FAKE_TOTAL = 123
    return [
        (i, f"id{i}", f"t{i}", f"a{i % 7}", i % 101, 30000 + i)
        for i in range(offset, min(offset + limit, _FAKE_TOTAL))
    ]


def test_custom_fetch_callback(spark):
    """make_paged_datasource/read_paged_api: the one-function adapter
    seam the README documents — inject a fake page fetcher, get the full
    collection back through probe→partition→page-cursor machinery."""
    from spotify_tags_etl_spark.sources.paged_api import read_paged_api

    df = read_paged_api(
        spark,
        _fake_api_fetch,
        name="fake_api_test",
        total=123,
        pages_per_partition=1,
    )
    # 123 items at 50/page, 1 page per partition -> 3 planned partitions
    assert df.rdd.getNumPartitions() == 3
    rows = sorted((r.idx, r.track_id, r.popularity) for r in df.collect())
    assert len(rows) == 123
    assert rows[0] == (0, "id0", 0)
    assert rows[-1] == (122, "id122", 122 % 101)


def test_custom_fetch_callback_rate_limit_knob(spark):
    """page_delay_s (the reference api_timeout analog) must throttle each
    executor cursor: with 2 pages in one partition and 0.2 s delay the
    read cannot finish in under ~0.4 s."""
    import time as _time

    from spotify_tags_etl_spark.sources.paged_api import read_paged_api

    df = read_paged_api(
        spark,
        _fake_api_fetch,
        name="fake_api_ratelimit",
        total=100,
        pages_per_partition=2,
        page_delay_s=0.2,
    )
    t0 = _time.time()
    assert df.count() == 100
    assert _time.time() - t0 >= 0.4


def test_custom_fetch_callback_streaming(spark, tmp_path):
    """The streaming adapter seam: the same fake fetch callback drained
    through the streaming engine must yield the full collection exactly
    once."""
    import time as _time

    from spotify_tags_etl_spark.sources.paged_api import make_paged_stream_datasource

    spark.dataSource.register(
        make_paged_stream_datasource(_fake_api_fetch, name="fake_api_stream_test")
    )
    stream = (
        spark.readStream.format("fake_api_stream_test")
        .option("total", "123")
        .option("pages_per_batch", "1")
        .load()
    )
    name = "fake_stream_sink"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 60
        while spark.table(name).count() < 123:
            if q.exception() is not None:
                raise q.exception()
            assert _time.time() < deadline, "stream did not drain in 60s"
            _time.sleep(0.2)
    finally:
        q.stop()
    idx = sorted(r.idx for r in spark.table(name).collect())
    spark.catalog.dropTempView(name)
    assert idx == list(range(123))
