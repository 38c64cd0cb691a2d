"""Concrete HTTP/OAuth fetch layer for the paged-API source family.

This closes the seam `paged_api.make_paged_datasource` leaves open: the
ONE user function `fetch_page(offset, limit) -> list[tuple]`, here
implemented against a REAL HTTP API with the behaviors the reference's
client has (reference `spotify_client.py:52-89` connect/OAuth,
`:136-138` rate limit, `:452-453` 50-item pages, `:469-504` batched
requests):

* OAuth2 client-credentials token fetch (`POST token_url` with
  client_id/client_secret form fields), cached per process with expiry
  refresh — executors each hold their own token, so no credential
  object ever rides the task closure;
* bounded retry with backoff on 429/5xx, honoring ``Retry-After``;
* a minimum inter-request interval per cursor (the reference's
  ``api_timeout`` pause);
* page parse: ``{"total": N, "items": [...]}`` with one tuple per item
  in SEARCH_SCHEMA_DDL order.

`requests` is gated behind an import-try (absent in some containers);
everything is exercised end-to-end against an in-process
`http.server` in tests/test_http_api.py — the same machinery works
against any real endpoint by changing the config URLs.  NOTE: this
module talks only to URLs the CALLER configures; nothing here embeds a
remote endpoint.
"""

from __future__ import annotations

import json
import time
import urllib.parse
from dataclasses import dataclass

try:  # gated: containers without requests still import the module
    import requests
except Exception:  # pragma: no cover - env without requests
    requests = None

from spotify_tags_etl_spark.sources.paged_api import (
    API_PAGE_LIMIT,
    SEARCH_SCHEMA_DDL,
    make_paged_datasource,
)

#: attempts per page request (initial + retries).
MAX_ATTEMPTS = 5

#: default backoff when a retryable response has no Retry-After.
BACKOFF_S = 0.2

#: process-local token cache: token_url -> (access_token, expiry_epoch).
_TOKENS: dict[str, tuple[str, float]] = {}


@dataclass(frozen=True)
class HttpApiConfig:
    """Everything the fetch layer needs — plain strings/numbers only, so
    the callable stays picklable for executor-side execution."""

    search_url: str
    token_url: str
    client_id: str
    client_secret: str
    #: reference api_timeout: min seconds between requests per cursor.
    min_interval_s: float = 0.0
    timeout_s: float = 5.0


def _require_requests() -> None:
    if requests is None:  # pragma: no cover
        raise RuntimeError(
            "the HTTP fetch layer needs the 'requests' package; "
            "use the synthetic PagedSearchDataSource or inject your own "
            "fetch_page callback instead"
        )


def get_token(cfg: HttpApiConfig) -> str:
    """Client-credentials token, cached per process until ~expiry.

    The reference's SpotifyOAuth cache file plays this role on disk
    (spotify_client.py:59-69 + config/.cache); per-process memory is the
    executor-safe equivalent (no shared mutable file between cursors).
    """
    _require_requests()
    tok = _TOKENS.get(cfg.token_url)
    now = time.time()
    if tok and tok[1] > now + 5:
        return tok[0]
    resp = requests.post(
        cfg.token_url,
        data={
            "grant_type": "client_credentials",
            "client_id": cfg.client_id,
            "client_secret": cfg.client_secret,
        },
        timeout=cfg.timeout_s,
    )
    resp.raise_for_status()
    body = resp.json()
    token = body["access_token"]
    _TOKENS[cfg.token_url] = (token, now + float(body.get("expires_in", 3600)))
    return token


def _get_with_retry(cfg: HttpApiConfig, url: str) -> "requests.Response":
    """GET with bounded retry on 429/5xx, honoring Retry-After, and a
    fresh token on 401 (expiry race between cache check and call)."""
    last = None
    for attempt in range(MAX_ATTEMPTS):
        resp = requests.get(
            url,
            headers={"Authorization": f"Bearer {get_token(cfg)}"},
            timeout=cfg.timeout_s,
        )
        if resp.status_code == 401:
            _TOKENS.pop(cfg.token_url, None)  # force refresh, retry
            last = resp
            continue
        if resp.status_code == 429 or resp.status_code >= 500:
            last = resp
            if attempt == MAX_ATTEMPTS - 1:
                break  # no retry left — don't burn the backoff delay
            try:
                # RFC 7231 also allows an HTTP-date here; on anything
                # non-numeric fall back to linear backoff.
                delay = float(resp.headers["Retry-After"])
            except (KeyError, ValueError):
                delay = BACKOFF_S * (attempt + 1)
            time.sleep(delay)
            continue
        resp.raise_for_status()
        return resp
    raise RuntimeError(
        f"page request failed after {MAX_ATTEMPTS} attempts: "
        f"{last.status_code if last is not None else '?'} {url}"
    )


class HttpFetchPage:
    """Picklable ``fetch_page(offset, limit)`` over a real HTTP API.

    A module-level class with only the frozen config as state — exactly
    what the adapter contract requires for executor-side execution."""

    def __init__(self, cfg: HttpApiConfig):
        self.cfg = cfg
        self._last_request = 0.0

    def __call__(self, offset: int, limit: int) -> list[tuple]:
        _require_requests()
        if self.cfg.min_interval_s:
            wait = self._last_request + self.cfg.min_interval_s - time.time()
            if wait > 0:
                time.sleep(wait)
        q = urllib.parse.urlencode({"offset": offset, "limit": limit})
        resp = _get_with_retry(self.cfg, f"{self.cfg.search_url}?{q}")
        self._last_request = time.time()
        items = resp.json().get("items", [])
        return [
            (
                int(it["idx"]),
                it["track_id"],
                it["track_name"],
                it["artist_name"],
                int(it["popularity"]),
                int(it["duration_ms"]),
            )
            for it in items
        ]


def probe_total(cfg: HttpApiConfig) -> int:
    """S5's driver-side probe: one limit=1 request returns the
    collection size the partition plan is built from
    (reference spotify_client.py probe-then-page loop)."""
    _require_requests()
    q = urllib.parse.urlencode({"offset": 0, "limit": 1})
    resp = _get_with_retry(cfg, f"{cfg.search_url}?{q}")
    return int(resp.json()["total"])


def read_http_paged(spark, cfg: HttpApiConfig, *, name: str = "http_paged_search"):
    """End-to-end S4/S5 over a live API: probe the total driver-side,
    build the offset-range partition plan, and fan page cursors out to
    the executors — each with its own token cache, retry loop, and rate
    limiter. Returns the DataFrame."""
    total = probe_total(cfg)
    source = make_paged_datasource(
        HttpFetchPage(cfg), name=name, schema_ddl=SEARCH_SCHEMA_DDL
    )
    spark.dataSource.register(source)
    return (
        spark.read.format(name)
        .option("total", str(total))
        .option("page_delay_s", str(cfg.min_interval_s))
        .load()
    )


__all__ = [
    "API_PAGE_LIMIT",
    "HttpApiConfig",
    "HttpFetchPage",
    "get_token",
    "probe_total",
    "read_http_paged",
]
