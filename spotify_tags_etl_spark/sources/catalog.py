"""Catalog + DDL surface (SURVEY.md §2.1 S7/S8, K5-K7).

The reference manages its warehouse through PostgreSQL system catalogs:
``show_tables`` reads ``pg_class`` (postgres_media.py:74-81),
``query_table_columns`` reads ``information_schema`` minus the ``id``
serial and the ORM tables (postgres_media.py:211-226), and DDL is
``CREATE DATABASE`` / drop-and-recreate scripts
(postgres_media.py:167-209, models.py:190-199).

Spark-side the catalog IS the metastore: ``spark.catalog`` for
introspection, ``spark.sql`` DDL + ``StructType``-driven empty-frame
``saveAsTable`` for schema-from-model (K7). The reference's
*anti-pattern* — re-introspecting columns inside the row loop
(postgres_media.py:262) — disappears: columns are introspected once and
drive set-oriented projections.

ACL management (K8, ``add_role``) is a metastore/governance concern,
deliberately out of the engine (documented non-goal, SURVEY §2.1).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

#: ORM-managed tables excluded from dynamic-projection loads
#: (postgres_media.py:218-223).
ORM_TABLES = frozenset({"liked_song", "audio_feature"})


def create_database(spark: SparkSession, name: str) -> None:
    """K5 (postgres_media.py:167-192): idempotent database creation."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def drop_database(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def show_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """S7 (postgres_media.py:74-81): user tables from the catalog.

    Session-scoped temp views are excluded: listTables(database) returns
    them alongside the database's real tables, but they don't live in
    the database — qualifying one as ``db.view`` (as
    insertable_projection does) is unresolvable and the reference's
    pg_tables scan never saw views either."""
    return sorted(
        t.name for t in spark.catalog.listTables(database) if t.tableType != "TEMPORARY"
    )


def table_columns(
    spark: SparkSession,
    table: str,
    exclude: tuple[str, ...] = ("id",),
) -> list[str]:
    """S8 (postgres_media.py:211-226): per-table insertable columns —
    catalog columns minus the surrogate key. Called once per plan, never
    per row."""
    return [c.name for c in spark.catalog.listColumns(table) if c.name not in exclude]


def recreate_tables(spark: SparkSession, schemas: dict[str, StructType], database: str) -> None:
    """K6/K7 (postgres_media.py:194-209, models.py:190-199): drop +
    create every warehouse table from its declared StructType — the
    schema-from-model path, no SQL DDL files."""
    for name, schema in schemas.items():
        fq = f"{database}.{name}"
        spark.sql(f"DROP TABLE IF EXISTS {fq}")
        spark.createDataFrame([], schema).write.saveAsTable(fq)


def insertable_projection(spark: SparkSession, database: str, exclude: tuple[str, ...] = ("id",)) -> dict[str, list[str]]:
    """The reference's per-table column map (query_table_columns over all
    tables), computed once: table → ordered insertable columns."""
    return {
        t: table_columns(spark, f"{database}.{t}", exclude)
        for t in show_tables(spark, database)
        if t not in ORM_TABLES
    }
