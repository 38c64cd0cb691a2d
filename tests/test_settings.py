"""S9 TOML settings source: parse, validate, and map to engine config."""

from __future__ import annotations

import os

import pytest

from spotify_tags_etl_spark.settings import (
    ApiConfig,
    DatabaseConfig,
    jdbc_options,
    load_api_config,
    load_db_config,
    load_project_config,
    open_toml,
    spark_confs,
)

EXAMPLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config", "settings_example.toml"
)


@pytest.fixture(scope="module")
def config():
    return open_toml(EXAMPLE)


def test_project_config(config):
    proj = load_project_config(config)
    assert proj.name == "spotify_tags_etl_spark"
    assert proj.timezone == "UTC"
    assert "rest.paged.api" in proj.sources
    assert spark_confs(proj) == {"spark.sql.session.timeZone": "UTC"}


def test_db_config(config):
    db = load_db_config(config, backend="postgres", environment="dev")
    assert db.endpoint == "localhost"
    assert db.port == 5432
    opts = jdbc_options(db)
    assert opts["url"] == "jdbc:postgresql://localhost:5432/media_db"
    assert opts["user"] == "warehouse_user"


def test_api_config_scopes_joined(config):
    api = load_api_config(config, environment="dev")
    assert api.scopes == "user-library-read,playlist-read-private"
    assert api.api_limit == 50
    assert api.thold == 70.0


@pytest.mark.parametrize(
    "field,value",
    [
        ("port", 80),          # below registered range
        ("port", 65000),       # above
        ("timeout", 0),        # conint(gt=1)
        ("timeout", 10),       # conint(lt=10)
    ],
)
def test_db_config_range_validation(field, value):
    kwargs = dict(
        name="x", timezone="UTC", environment="dev", endpoint="h", username="u",
        password="p", database="d", port=5432, timeout=5,
    )
    kwargs[field] = value
    with pytest.raises(ValueError):
        DatabaseConfig(**kwargs)


def test_db_config_environment_whitelist():
    with pytest.raises(ValueError):
        DatabaseConfig(
            name="x", timezone="UTC", environment="staging", endpoint="h", username="u",
            password="p", database="d", port=5432, timeout=5,
        )


@pytest.mark.parametrize(
    "field,value",
    [("api_limit", 0), ("api_limit", 51), ("thold", 0.0), ("thold", 100.0), ("api_timeout", 5.0)],
)
def test_api_config_range_validation(field, value):
    kwargs = dict(
        client_id="i", client_secret="s", redirect_uri="http://localhost", port=9000,
        scopes="a,b", market="US", api_timeout=0.5, api_limit=50, thold=70.0,
    )
    kwargs[field] = value
    with pytest.raises(ValueError):
        ApiConfig(**kwargs)


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        open_toml("/nonexistent/settings.toml")
