"""TOML settings source (SURVEY §2.1 S9; reference ``util/settings.py:46-159``).

The reference parses ``config/settings*.toml`` into validated pydantic
settings objects (project metadata, database connection, API credentials
with range-constrained ports/timeouts/limits). This is the Spark-first
analog: ``tomllib`` (stdlib) + frozen dataclasses + explicit validators —
no pydantic dependency — feeding the pieces of this engine that take
configuration:

* ``project.timezone``  → ``spark.sql.session.timeZone`` (spark_confs())
* ``api.api_limit``     → the paged REST source's page size (§2.1 S4-S6)
* ``api.thold``         → the fuzzy-join acceptance threshold (§2.3 J3)
* ``database``          → JDBC sink options (sinks.jdbc_options())

``get_spark`` consumes a TOML file automatically when
``SPARK_GRAFT_SETTINGS`` points at one.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass
from pathlib import Path
from typing import Any

VALID_DB_ENV = frozenset(("dev", "prod"))


def open_toml(path: str | Path) -> dict[str, Any]:
    """Load a TOML file to a nested dict (reference ``settings.py:46-52``)."""
    p = Path(path)
    if not p.is_file():
        raise FileNotFoundError(f"settings file not found: {p}")
    with open(p, "rb") as fp:
        return tomllib.load(fp)


def _check_range(name: str, value: float, lo: float, hi: float, inclusive: bool = False) -> None:
    ok = (lo <= value <= hi) if inclusive else (lo < value < hi)
    if not ok:
        bound = "<=" if inclusive else "<"
        raise ValueError(f"{name}={value!r} violates {lo} {bound} {name} {bound} {hi}")


@dataclass(frozen=True)
class ProjectConfig:
    """[project] table: name, timezone, declared sources/sinks."""

    name: str
    timezone: str
    sources: tuple[str, ...]
    sinks: tuple[str, ...]


@dataclass(frozen=True)
class DatabaseConfig:
    """[<backend>.<env>] table (reference ``DatabaseConfig``, :58-80).

    Port constrained to (1024, 49151) EXCLUSIVE — matching the
    reference's ``conint(gt=1024, lt=49151)`` exactly, which itself
    excludes the boundary ports — timeout to (1, 10) —
    the reference's ``conint`` bounds.
    """

    name: str
    timezone: str
    environment: str
    endpoint: str
    username: str
    password: str
    database: str
    port: int
    timeout: int

    def __post_init__(self) -> None:
        if self.environment not in VALID_DB_ENV:
            raise ValueError(f"environment {self.environment!r} not in {sorted(VALID_DB_ENV)}")
        _check_range("port", self.port, 1024, 49151)
        _check_range("timeout", self.timeout, 1, 10)


@dataclass(frozen=True)
class ApiConfig:
    """[spotify.<env>] table (reference ``SpotifyApiConfig``, :110-135).

    ``scopes`` normalizes list → comma-delimited string; ``api_limit``
    capped at the API's page-size maximum of 50; ``thold`` is the fuzzy
    match confidence threshold in (0, 100).
    """

    client_id: str
    client_secret: str
    redirect_uri: str
    port: int
    scopes: str
    market: str
    api_timeout: float
    api_limit: int
    thold: float

    def __post_init__(self) -> None:
        _check_range("port", self.port, 1024, 49151)
        _check_range("api_timeout", self.api_timeout, 0.0, 5.0)
        _check_range("api_limit", self.api_limit, 1, 50, inclusive=True)
        _check_range("thold", self.thold, 0.0, 100.0)


def _scopes_str(raw: Any) -> str:
    if isinstance(raw, str):
        return raw
    if isinstance(raw, (list, tuple)):
        return ",".join(str(s) for s in raw)
    raise ValueError(f"invalid scopes: {raw!r}")


def load_project_config(config: dict[str, Any]) -> ProjectConfig:
    proj = config["project"]
    return ProjectConfig(
        name=proj["name"],
        timezone=proj["timezone"],
        sources=tuple(proj.get("sources", ())),
        sinks=tuple(proj.get("sinks", ())),
    )


def load_db_config(
    config: dict[str, Any], backend: str = "postgres", environment: str = "dev"
) -> DatabaseConfig:
    proj, db = config["project"], config[backend][environment]
    return DatabaseConfig(
        name=proj["name"],
        timezone=proj["timezone"],
        environment=environment,
        endpoint=db["endpoint"],
        username=db["username"],
        password=db["password"],
        database=db["database"],
        port=db["port"],
        timeout=db["timeout"],
    )


def load_api_config(config: dict[str, Any], environment: str = "dev") -> ApiConfig:
    api = config["spotify"][environment]
    return ApiConfig(
        client_id=api["client_id"],
        client_secret=api["client_secret"],
        redirect_uri=api["redirect_uri"],
        port=api["port"],
        scopes=_scopes_str(api["scopes"]),
        market=api.get("market", "US"),
        api_timeout=api["api_timeout"],
        api_limit=api["api_limit"],
        thold=api["thold"],
    )


def spark_confs(project: ProjectConfig) -> dict[str, str]:
    """Project settings → SparkSession confs (the S9 → session seam)."""
    return {"spark.sql.session.timeZone": project.timezone}


def jdbc_options(db: DatabaseConfig) -> dict[str, str]:
    """Database settings → ``spark.write.format('jdbc')`` options (K1/K2
    letter-of-the-survey sink parity; reference ``postgres_media.py:264``)."""
    return {
        "url": f"jdbc:postgresql://{db.endpoint}:{db.port}/{db.database}",
        "user": db.username,
        "password": db.password,
        "connectTimeout": str(db.timeout),
    }
