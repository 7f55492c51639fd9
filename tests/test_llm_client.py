"""OpenAICompatClient driven end-to-end against a stdlib fake-OpenAI
HTTP server — covers the real async client paths the stub can't:
request framing, strict-JSON response parsing, HTTP errors, malformed
payloads, timeouts, semaphore fan-out, and the operator's retry +
null-fill semantics over a flaky endpoint (reference retry contract:
enricher.go:89-121, 3 attempts + backoff).

Behavior is selected by the requested ``model`` name so one server
serves every scenario; flaky state is keyed per prompt so concurrent
batches don't share failure counters.
"""

from __future__ import annotations

import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ai_powered_e_commerce_analytics_spark.operators._http_shim import (
    HTTPStatusError,
    TimeoutException,
)
from ai_powered_e_commerce_analytics_spark.operators.enrich import (
    OpenAICompatClient,
    enrich_sentiments,
)


def _ids_from_prompt(prompt: str) -> list[int]:
    return [int(m) for m in re.findall(r"id : (\d+) ,", prompt)]


class FakeOpenAIHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # keep pytest output clean
        pass

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        payload = json.loads(self.rfile.read(n))
        model = payload["model"]
        ollama = self.path == "/api/chat"
        if ollama:
            # Ollama-native structured output: schema rides the
            # top-level format= field; record it for assertions.
            kind = payload["format"]["required"][0]
            self.server.last_ollama_payload = payload
        else:
            kind = payload["response_format"]["json_schema"]["name"]
        prompt = payload["messages"][0]["content"]
        ids = _ids_from_prompt(prompt)

        if model == "error500":
            self.send_response(500)
            self.end_headers()
            return
        if model == "slow":
            time.sleep(2.0)
        if model == "malformed":
            content = "this is not json {"
        elif model == "flaky":
            with self.server.lock:
                seen = self.server.attempts.get(prompt, 0)
                self.server.attempts[prompt] = seen + 1
            if seen == 0:  # first attempt per prompt fails validation
                content = json.dumps({kind: [{"item_id": -1}]})
            else:
                content = self._good(kind, ids)
        else:
            content = self._good(kind, ids)

        if ollama:
            body = json.dumps({"message": {"content": content}}).encode()
        else:
            body = json.dumps(
                {"choices": [{"message": {"content": content}}]}
            ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    @staticmethod
    def _good(kind: str, ids: list[int]) -> str:
        if kind == "sentiments":
            rows = [{"item_id": i, "sentiment": i % 2 == 0} for i in ids]
        else:
            rows = [{"item_id": i, "review": f"review {i}"} for i in ids]
        return json.dumps({kind: rows})


_SRV = None  # the live fake server, for request-shape assertions


@pytest.fixture(scope="module")
def fake_openai():
    global _SRV
    srv = ThreadingHTTPServer(("127.0.0.1", 0), FakeOpenAIHandler)
    srv.lock = threading.Lock()
    srv.attempts = {}
    srv.last_ollama_payload = None
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    _SRV = srv
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    thread.join(timeout=5)


BATCH = [{"item_id": i, "review": f"text {i}"} for i in range(1, 6)]


def test_client_success_sentiments(fake_openai):
    client = OpenAICompatClient(fake_openai, "good")
    out = client.classify_sentiments(BATCH, 0)
    assert [r["item_id"] for r in out] == [1, 2, 3, 4, 5]
    assert out[0]["sentiment"] is False and out[1]["sentiment"] is True


def test_client_success_reviews(fake_openai):
    client = OpenAICompatClient(fake_openai, "good")
    out = client.generate_reviews(BATCH, 0)
    assert out[2] == {"item_id": 3, "review": "review 3"}


def test_client_http_error_raises(fake_openai):
    client = OpenAICompatClient(fake_openai, "error500")
    with pytest.raises(HTTPStatusError):
        client.classify_sentiments(BATCH, 0)


def test_client_malformed_json_raises(fake_openai):
    client = OpenAICompatClient(fake_openai, "malformed")
    with pytest.raises(json.JSONDecodeError):
        client.classify_sentiments(BATCH, 0)


def test_client_timeout(fake_openai):
    client = OpenAICompatClient(fake_openai, "slow", timeout_s=0.3)
    t0 = time.time()
    with pytest.raises(TimeoutException):
        client.classify_sentiments(BATCH, 0)
    assert time.time() - t0 < 1.5  # timed out, didn't wait the full 2 s


def test_call_many_isolates_failures(fake_openai):
    # F4 wave: one bad batch -> None in its slot, good batches unaffected.
    good = OpenAICompatClient(fake_openai, "good")
    out = good.call_many("classify_sentiments", [BATCH, BATCH], [0, 1], 2)
    assert all(r is not None for r in out)
    bad = OpenAICompatClient(fake_openai, "error500")
    out = bad.call_many("classify_sentiments", [BATCH], [0], 2)
    assert out == [None]


def test_operator_retry_recovers_flaky_endpoint(spark, fake_openai):
    # End-to-end through mapInPandas: every batch's FIRST attempt returns
    # an invalid payload; the operator's retry loop (F7) must call again
    # and land the good rows — no null-fill, correct ids.
    items = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 51)], "item_id long, review string"
    ).coalesce(1)
    url = fake_openai
    out = enrich_sentiments(
        items,
        client_factory=lambda: OpenAICompatClient(url, "flaky"),
        batch_size=25,
        max_attempts=3,
    ).collect()
    assert len(out) == 50
    assert all(r.sentiment is not None for r in out)
    assert {r.item_id for r in out} == set(range(1, 51))


def test_operator_nullfills_hard_failure(spark, fake_openai):
    # An endpoint that always 500s must yield the F6 null-fill rows with
    # the batch's ACTUAL ids after max_attempts expire.
    items = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 11)], "item_id long, review string"
    ).coalesce(1)
    url = fake_openai
    out = enrich_sentiments(
        items,
        client_factory=lambda: OpenAICompatClient(url, "error500"),
        batch_size=5,
        max_attempts=2,
    ).collect()
    assert len(out) == 10
    assert all(r.sentiment is None for r in out)
    assert {r.item_id for r in out} == set(range(1, 11))


def test_ollama_client_native_protocol(fake_openai):
    # Ollama-native /api/chat: schema in the top-level format= field,
    # stream=False, keep_alive + options.temperature carried through
    # (reference ollama_client.py:38-50), {"message": {"content"}} body.
    from ai_powered_e_commerce_analytics_spark.operators.enrich import (
        OllamaClient,
    )

    client = OllamaClient(fake_openai, "good", keep_alive=7, temperature=0.5)
    out = client.classify_sentiments(BATCH, 0)
    assert [r["item_id"] for r in out] == [1, 2, 3, 4, 5]
    out = client.generate_reviews(BATCH, 0)
    assert out[2] == {"item_id": 3, "review": "review 3"}


def test_ollama_client_request_shape_and_errors(fake_openai):
    from ai_powered_e_commerce_analytics_spark.operators.enrich import (
        OllamaClient,
    )

    client = OllamaClient(fake_openai, "good", keep_alive=7, temperature=0.5)
    client.generate_reviews(BATCH, 0)
    # the handler stashed the last /api/chat payload — prove the native
    # protocol shape the reference client sends (ollama_client.py:38-50)
    p = _SRV.last_ollama_payload
    assert p["stream"] is False and p["keep_alive"] == 7
    assert p["options"] == {"temperature": 0.5}
    assert p["format"]["properties"]["reviews"]["minItems"] == len(BATCH)

    with pytest.raises(HTTPStatusError):
        OllamaClient(fake_openai, "error500").classify_sentiments(BATCH, 0)
    with pytest.raises(json.JSONDecodeError):
        OllamaClient(fake_openai, "malformed").classify_sentiments(BATCH, 0)


def test_operator_through_ollama_client(spark, fake_openai):
    # The enrichment operator is client-agnostic: the Ollama-native
    # client drives the same mapInPandas path end-to-end.
    from ai_powered_e_commerce_analytics_spark.operators.enrich import (
        OllamaClient,
    )

    items = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 21)], "item_id long, review string"
    ).coalesce(1)
    url = fake_openai
    out = enrich_sentiments(
        items,
        client_factory=lambda: OllamaClient(url, "good"),
        batch_size=10,
        max_attempts=2,
    ).collect()
    assert len(out) == 20
    assert {r.item_id for r in out} == set(range(1, 21))
    assert all(r.sentiment is not None for r in out)
