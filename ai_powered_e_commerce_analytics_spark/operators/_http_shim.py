"""Minimal httpx-compatible async HTTP client on stdlib asyncio only.

Vendored fallback so :class:`~.enrich.OpenAICompatClient` (reference
data_transformer.py:27-54, enricher.go:73-121) is fully exercisable in
environments without httpx — this container has no serving stack, but the
client's success / malformed-JSON / HTTP-error / timeout / retry paths
are real code that deserves real coverage (tests/test_llm_client.py
drives them against a stdlib ``http.server`` fake-OpenAI endpoint).

Implements ONLY the subset the client touches:

- ``AsyncClient(timeout=...)`` as async context manager
- ``await client.post(url, headers=..., json=...)``
- ``Response.status_code`` / ``.json()`` / ``.raise_for_status()``
- ``HTTPStatusError`` / ``TimeoutException``

HTTP/1.1 over plaintext TCP, ``Connection: close`` framing with a
Content-Length fast path. No TLS, redirects, chunked decoding, or
connection pooling — production deployments install real httpx, which
shadows this module (see the import fallback in enrich.py).
"""

from __future__ import annotations

import asyncio
import json as _json
from urllib.parse import urlsplit


class TimeoutException(Exception):
    """Request exceeded the client timeout (httpx.TimeoutException twin)."""


class HTTPStatusError(Exception):
    """4xx/5xx response (httpx.HTTPStatusError twin)."""

    def __init__(self, message: str, *, response: "Response"):
        super().__init__(message)
        self.response = response


class Response:
    def __init__(self, status_code: int, content: bytes):
        self.status_code = status_code
        self.content = content

    def json(self):
        return _json.loads(self.content)

    def raise_for_status(self) -> "Response":
        if self.status_code >= 400:
            raise HTTPStatusError(
                f"HTTP {self.status_code}", response=self
            )
        return self


class AsyncClient:
    def __init__(self, timeout: float | None = None):
        self.timeout = timeout

    async def __aenter__(self) -> "AsyncClient":
        return self

    async def __aexit__(self, *exc) -> bool:
        return False

    async def post(self, url: str, *, headers=None, json=None) -> Response:
        try:
            return await asyncio.wait_for(
                self._post(url, dict(headers or {}), json), self.timeout
            )
        except asyncio.TimeoutError as e:
            raise TimeoutException(
                f"request timed out after {self.timeout}s: {url}"
            ) from e

    async def _post(self, url: str, headers: dict, payload) -> Response:
        u = urlsplit(url)
        if u.scheme != "http":
            raise ValueError("http:// only (install httpx for TLS)")
        body = _json.dumps(payload).encode()
        path = u.path or "/"
        if u.query:
            path += "?" + u.query
        req_headers = {
            "Host": u.netloc,
            "Content-Type": "application/json",
            "Content-Length": str(len(body)),
            "Connection": "close",
            **headers,
        }
        head = "".join(
            f"{k}: {v}\r\n" for k, v in req_headers.items()
        )
        request = f"POST {path} HTTP/1.1\r\n{head}\r\n".encode() + body

        reader, writer = await asyncio.open_connection(
            u.hostname, u.port or 80
        )
        try:
            writer.write(request)
            await writer.drain()
            raw = await reader.read()  # Connection: close => EOF delimits
        finally:
            writer.close()
            try:
                await writer.wait_closed()
            except Exception:
                pass

        header_blob, _, rest = raw.partition(b"\r\n\r\n")
        lines = header_blob.split(b"\r\n")
        status = int(lines[0].split()[1])
        resp_headers = {}
        for ln in lines[1:]:
            k, _, v = ln.decode("latin1").partition(":")
            resp_headers[k.strip().lower()] = v.strip()
        if "content-length" in resp_headers:
            rest = rest[: int(resp_headers["content-length"])]
        return Response(status, rest)
