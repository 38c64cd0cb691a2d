"""sources/http_api.py — the concrete HTTP/OAuth fetch layer, exercised
END-TO-END against an in-process http.server playing the paged API:

* OAuth2 client-credentials token issue + Bearer enforcement;
* offset/limit paging with a deterministic catalog and `total`;
* one injected 429 (Retry-After: 0) that the retry loop must absorb;
* a forced 401 mid-run that must trigger a token refresh;
* the full Spark DataSource path (driver probe -> offset-range
  partitions -> executor cursors) returning the exact catalog.

No external network: the server binds 127.0.0.1 on an ephemeral port.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

pytest.importorskip("requests")

from spotify_tags_etl_spark.sources.http_api import (
    HttpApiConfig,
    HttpFetchPage,
    _TOKENS,
    get_token,
    probe_total,
    read_http_paged,
)

N_ITEMS = 137
CLIENT_ID, CLIENT_SECRET = "test-client", "test-secret"


def _item(i: int) -> dict:
    return {
        "idx": i,
        "track_id": f"t{i:05d}",
        "track_name": f"track {i}",
        "artist_name": f"artist {i % 7}",
        "popularity": i % 101,
        "duration_ms": 180_000 + i,
    }


class _ApiState:
    def __init__(self):
        self.token_calls = 0
        self.search_calls = 0
        self.injected_429 = False
        self.injected_401 = False
        self.lock = threading.Lock()


def _make_handler(state: _ApiState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, body: dict, headers: dict | None = None):
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            if urlparse(self.path).path != "/token":
                return self._json(404, {"error": "not found"})
            length = int(self.headers.get("Content-Length", "0"))
            form = parse_qs(self.rfile.read(length).decode())
            if (
                form.get("grant_type") != ["client_credentials"]
                or form.get("client_id") != [CLIENT_ID]
                or form.get("client_secret") != [CLIENT_SECRET]
            ):
                return self._json(400, {"error": "invalid_client"})
            with state.lock:
                state.token_calls += 1
                n = state.token_calls
            self._json(200, {"access_token": f"tok-{n}", "expires_in": 3600})

        def do_GET(self):
            url = urlparse(self.path)
            if url.path != "/search":
                return self._json(404, {"error": "not found"})
            auth = self.headers.get("Authorization", "")
            if not auth.startswith("Bearer tok-"):
                return self._json(401, {"error": "no token"})
            q = parse_qs(url.query)
            offset = int(q.get("offset", ["0"])[0])
            limit = int(q.get("limit", ["50"])[0])
            with state.lock:
                state.search_calls += 1
                # one 429 on the first request for offset 50
                if offset == 50 and not state.injected_429:
                    state.injected_429 = True
                    return self._json(429, {"error": "rate"}, {"Retry-After": "0"})
                # one 401 on the first request for offset 100: the client
                # must drop its cached token and refresh
                if offset == 100 and not state.injected_401:
                    state.injected_401 = True
                    return self._json(401, {"error": "expired"})
            items = [_item(i) for i in range(offset, min(offset + limit, N_ITEMS))]
            self._json(200, {"total": N_ITEMS, "items": items})

    return Handler


@pytest.fixture()
def api_server():
    state = _ApiState()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    cfg = HttpApiConfig(
        search_url=f"{base}/search",
        token_url=f"{base}/token",
        client_id=CLIENT_ID,
        client_secret=CLIENT_SECRET,
    )
    _TOKENS.clear()  # isolate the per-process token cache between tests
    try:
        yield cfg, state
    finally:
        srv.shutdown()
        srv.server_close()


def test_token_is_cached_per_process(api_server):
    cfg, state = api_server
    t1 = get_token(cfg)
    t2 = get_token(cfg)
    assert t1 == t2
    assert state.token_calls == 1


def test_probe_total(api_server):
    cfg, state = api_server
    assert probe_total(cfg) == N_ITEMS


def test_fetch_page_retries_429_and_refreshes_401(api_server):
    cfg, state = api_server
    fetch = HttpFetchPage(cfg)
    page0 = fetch(0, 50)
    assert [r[0] for r in page0] == list(range(50))
    page1 = fetch(50, 50)  # first attempt 429s, retry must succeed
    assert [r[0] for r in page1] == list(range(50, 100))
    tokens_before = state.token_calls
    page2 = fetch(100, 50)  # first attempt 401s, token must refresh
    assert [r[0] for r in page2] == list(range(100, N_ITEMS))
    assert state.token_calls == tokens_before + 1
    assert fetch(N_ITEMS, 50) == []  # past the end: empty page


def test_spark_reads_full_catalog_through_http(spark, api_server):
    cfg, state = api_server
    df = read_http_paged(spark, cfg, name="http_paged_search_test")
    rows = sorted(df.collect(), key=lambda r: r.idx)
    assert len(rows) == N_ITEMS
    assert [r.idx for r in rows] == list(range(N_ITEMS))
    want = _item(42)
    got = rows[42]
    assert (got.track_id, got.track_name, got.artist_name, got.popularity, got.duration_ms) == (
        want["track_id"],
        want["track_name"],
        want["artist_name"],
        want["popularity"],
        want["duration_ms"],
    )
    # the whole catalog came over HTTP in <=50-item pages + the probe
    assert state.search_calls >= N_ITEMS // 50 + 1


@pytest.fixture()
def always_429_server():
    """A server whose /search always answers 429 with an HTTP-date
    Retry-After — the RFC 7231 form float() cannot parse."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, code, body, extra=None):
            payload = json.dumps(body).encode()
            self.send_response(code)
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            self._json(200, {"access_token": "tok-x", "expires_in": 3600})

        def do_GET(self):
            self._json(
                429,
                {"error": "rate"},
                {"Retry-After": "Fri, 15 Aug 2026 00:00:00 GMT"},
            )

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    cfg = HttpApiConfig(
        search_url=f"{base}/search",
        token_url=f"{base}/token",
        client_id=CLIENT_ID,
        client_secret=CLIENT_SECRET,
    )
    _TOKENS.clear()
    try:
        yield cfg
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_date_retry_after_falls_back_and_final_attempt_does_not_sleep(
    always_429_server, monkeypatch
):
    """RFC 7231 allows an HTTP-date Retry-After: the parse must fall
    back to linear backoff instead of raising ValueError, and the FINAL
    attempt must raise immediately instead of sleeping a delay no retry
    will ever use."""
    import spotify_tags_etl_spark.sources.http_api as ha

    slept: list[float] = []
    monkeypatch.setattr(ha.time, "sleep", slept.append)
    with pytest.raises(RuntimeError, match="429"):
        ha._get_with_retry(always_429_server, always_429_server.search_url)
    # linear-backoff fallback values, one per NON-final attempt
    assert slept == [ha.BACKOFF_S * (i + 1) for i in range(ha.MAX_ATTEMPTS - 1)]
