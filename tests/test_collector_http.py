"""make_http_fetch against a real local HTTP server (S1: the reference's
collector.py:26-39 GET-poll entry point — header auth, JSON list body,
errors swallowed to None unless strict)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from ai_powered_e_commerce_analytics_spark.pipeline import (
    make_http_fetch,
    run_collector,
)

ROWS = [
    {
        "product_name": f"P{i}",
        "price": 10.0 + i,
        "quantity": 1 + i,
        "category": "Food",
        "description": f"item {i}",
        "availability": True,
        "discount_percentage": 5.0,
        "date": "2026-08-01",
    }
    for i in range(4)
]


class _Handler(BaseHTTPRequestHandler):
    seen_headers: list[dict] = []

    def do_GET(self):  # noqa: N802 - http.server API
        # header names are case-insensitive (urllib normalizes to
        # X-api-key); store lowercased
        _Handler.seen_headers.append(
            {k.lower(): v for k, v in self.headers.items()}
        )
        if self.path == "/products":
            body = json.dumps(ROWS).encode()
            self.send_response(200)
        elif self.path == "/notalist":
            body = json.dumps({"oops": 1}).encode()
            self.send_response(200)
        else:
            body = b"boom"
            self.send_response(500)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_fetch_success_and_header_auth(server):
    fetch = make_http_fetch(f"{server}/products", api_key="sekret")
    assert fetch() == ROWS
    assert _Handler.seen_headers[-1].get("x-api-key") == "sekret"


def test_fetch_error_swallowed_to_none_like_reference(server):
    # collector.py getData's `finally: return result` returns None on
    # every failure — the default contract here.
    assert make_http_fetch(f"{server}/error")() is None
    assert make_http_fetch(f"{server}/notalist")() is None
    assert make_http_fetch("http://127.0.0.1:1/closed", timeout=0.5)() is None


def test_fetch_strict_raises(server):
    with pytest.raises(Exception):
        make_http_fetch(f"{server}/error", strict=True)()
    with pytest.raises(ValueError, match="JSON list"):
        make_http_fetch(f"{server}/notalist", strict=True)()


def test_run_collector_accepts_url(spark, tmp_path, server):
    out = run_collector(
        spark,
        f"{server}/products",
        str(tmp_path / "bronze"),
        pulls=2,
        api_key="k",
    )
    assert out == {"rows": 8}  # 2 pulls x 4 rows, written as one batch
    # one timestamped batch subdir under bronze/
    got = spark.read.json(str(tmp_path / "bronze" / "*"))
    assert got.count() == 8
    assert {"id", "shop_id", "product_name"} <= set(got.columns)
