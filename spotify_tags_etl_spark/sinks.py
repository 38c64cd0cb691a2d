"""Side-output and remote-mutation sinks (SURVEY.md §2.1 K4, K9).

* K4 ``save_response`` (spotify_client.py:91-116): debug JSON dumps into
  a dated directory ``api/YYYY-MM-DD/<name>/``. Spark-side this is a
  plain ``write.json`` side output — set-oriented, one file per
  partition, date resolved once on the driver.
* K9 ``add_liked_song``/``remove_liked_song`` (spotify_client.py:469-504):
  remote mutations against the API. Spark-side the pattern is
  ``foreachPartition``: one client per partition (connection setup is
  per-executor, never per-row), requests batched to the API's ≤50-id
  contract, failures surfaced per batch. The client is injected so tests
  (and offline runs) use a recording fake — the same seam the
  reference's offline_ids provides.

At scale: foreachPartition is the only sane remote-write shape — N
partitions ⇒ N concurrent clients with per-client rate limiting
(api_timeout analog), and no driver fan-in. Output volume is bounded by
the API, not the cluster, so repartition the frame down to the number
of concurrent clients the remote service tolerates.
"""

from __future__ import annotations

import datetime as _dt
import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

#: Spotify page/batch contract (config/settings_example.toml:31-32).
API_BATCH = 50


def save_debug_json(df: DataFrame, root: str, name: str, date: _dt.date | None = None) -> str:
    """K4: dated debug side-output ``<root>/api/YYYY-MM-DD/<name>/``."""
    # UTC, matching the pipeline's batch stamps — date.today() is host-
    # local and misdates dumps near midnight.
    d = (date or _dt.datetime.now(_dt.timezone.utc).date()).isoformat()
    path = os.path.join(root, "api", d, name)
    df.write.mode("overwrite").json(path)
    return path


def foreach_partition_sink(
    df: DataFrame,
    client_factory: Callable[[], Callable[[list], None]],
    batch_size: int = API_BATCH,
) -> None:
    """K9: push every row of ``df`` to a remote endpoint, one client per
    partition, ``batch_size`` rows per request.

    ``client_factory`` runs ON THE EXECUTOR (must be picklable) and
    returns a callable invoked once per batch of rows.
    """

    def run(rows: Iterator) -> None:
        # Peek before paying client setup: empty partitions (routine after
        # filters or under skew) must not open a remote connection each.
        first = next(rows, None)
        if first is None:
            return
        send = client_factory()
        batch: list = [first]
        for row in rows:
            batch.append(row)
            if len(batch) >= batch_size:
                send(batch)
                batch = []
        if batch:
            send(batch)

    df.foreachPartition(run)


def jdbc_writer(df: DataFrame, table: str, db_config, mode: str = "append"):
    """K1/K2 letter-parity: relational sink as a JDBC option pass-through
    (reference ``postgres_media.py:264-270`` INSERTs row-by-row; Spark
    writes set-oriented, one connection per partition, ``batchsize`` rows
    per round trip).

    Returns the configured ``DataFrameWriter`` — callers ``.save()`` it.
    Split this way because the test container has no Postgres server (and
    no JDBC driver jar); the option mapping and writer construction are
    the testable engine surface, the ``.save()`` is deployment.
    """
    from spotify_tags_etl_spark.settings import jdbc_options

    opts = jdbc_options(db_config)
    return (
        df.write.format("jdbc")
        .mode(mode)
        .options(**opts)
        .option("dbtable", table)
        .option("batchsize", "10000")
        .option("isolationLevel", "READ_COMMITTED")
    )
