"""Query registry — the engine's declared operator inventory.

Every operator the engine claims (SURVEY.md §2) registers here as a
``QueryDef``: a named DataFrame builder ``(spark, sf_dir) -> DataFrame``
plus, when the semantics are ANSI-SQL-expressible, a DuckDB oracle SQL
string computing the same result on the same parquet tables. The driver
(and ``tests/test_oracle_parity.py``) run both sides and compare
row-count + schema + order-insensitive value hash.

Cross-engine determinism rules every registered query follows:

* aggregate money/measure columns through ``DECIMAL`` (exact) and cast
  the final value to double — never hash a float-summation whose
  accumulation order differs between engines;
* no raw timestamp/date outputs — format to strings;
* every top-k / argmax has a total-order tiebreak;
* column names are aliased identically on both sides (the comparator
  sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QueryDef(name=name, builder=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module so registrations run."""
    import spotify_tags_etl_spark.operators.relational  # noqa: F401

    for mod in (
        "spotify_tags_etl_spark.operators.advanced",
        "spotify_tags_etl_spark.operators.canned",
        "spotify_tags_etl_spark.operators.dedup",
        "spotify_tags_etl_spark.operators.similarity",
        "spotify_tags_etl_spark.operators.textops",
        "spotify_tags_etl_spark.operators.fuzzy",
        "spotify_tags_etl_spark.operators.multimodal",
        "spotify_tags_etl_spark.sources.paged_api",
        "spotify_tags_etl_spark.streaming.ops",
    ):
        __import__(mod)  # mandatory: a broken module must fail loudly, not drop its queries


def all_queries() -> dict[str, Builder]:
    _load_all()
    return {name: qd.builder for name, qd in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: qd.oracle for name, qd in sorted(_REGISTRY.items()) if qd.oracle is not None}


def get(name: str) -> QueryDef:
    _load_all()
    return _REGISTRY[name]
