"""HTTP LLM/embedding adapter: rate limiting, retry/backoff, batch
coalescing, env gating — against an in-process fake OpenAI-compatible server
that injects 429/500s (the reference's embedding_rate_limiter test surface)."""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from cognee_graphdb_spark.llm.http_gateway import (
    HttpEmbedder,
    HttpLLMGateway,
    RetryableHTTPError,
    TokenBucketRateLimiter,
    call_with_retry,
    embedder_from_env,
    gateway_from_env,
)


class _FakeOpenAI(BaseHTTPRequestHandler):
    """Embeddings: vector = [len(text), token_count, 0...]; chat: echoes the
    prompt length.  ``server.fail_statuses`` is a list of statuses to serve
    (one per request) before succeeding."""

    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        srv = self.server
        with srv.lock:
            srv.requests.append(self.path)
            if srv.fail_statuses:
                status = srv.fail_statuses.pop(0)
                self.send_response(status)
                self.end_headers()
                self.wfile.write(b"injected failure")
                return
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        if self.path.endswith("/embeddings"):
            texts = body["input"]
            dim = body.get("dimensions", 8)
            data = [
                {
                    "index": i,
                    "embedding": [float(len(t)), float(len(t.split()))] + [0.0] * (dim - 2),
                }
                for i, t in enumerate(texts)
            ]
            out = {"data": data}
        else:
            prompt = body["messages"][0]["content"]
            out = {"choices": [{"message": {"content": f"ECHO[{len(prompt)}]"}}]}
        raw = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeOpenAI)
    srv.requests = []
    srv.fail_statuses = []
    srv.lock = threading.Lock()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _emb(srv, **kw):
    return HttpEmbedder(
        endpoint=f"http://127.0.0.1:{srv.server_address[1]}/v1/embeddings",
        dim=8,
        base_backoff=0.001,
        **kw,
    )


# -- rate limiter -------------------------------------------------------------


def test_token_bucket_blocks_after_burst_and_refills():
    clock = {"t": 0.0}
    waits = []

    def now():
        return clock["t"]

    def sleep(s):
        waits.append(s)
        clock["t"] += s

    rl = TokenBucketRateLimiter(max_requests=3, interval_seconds=30.0, now=now, sleep=sleep)
    for _ in range(3):
        assert rl.acquire() == 0.0  # burst of 3 passes instantly
    waited = rl.acquire()  # 4th must wait for a refill: 1 token = 10s
    assert waited == pytest.approx(10.0)
    assert waits == [pytest.approx(10.0)]
    # after a long idle stretch the bucket refills only to capacity
    clock["t"] += 1e6
    assert rl.try_acquire() and rl.try_acquire() and rl.try_acquire()
    assert not rl.try_acquire()


def test_token_bucket_rejects_bad_config():
    with pytest.raises(ValueError):
        TokenBucketRateLimiter(max_requests=0)


# -- retry/backoff ------------------------------------------------------------


def test_retry_backoff_sequence_and_success():
    delays = []
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] <= 3:
            raise RetryableHTTPError(429)
        return "ok"

    out = call_with_retry(
        fn, max_retries=5, base_backoff=1.0, backoff_factor=2.0, jitter=0.0,
        sleep=delays.append, rng=lambda: 0.5,
    )
    assert out == "ok"
    assert delays == [1.0, 2.0, 4.0]  # exponential, jitter disabled


def test_retry_gives_up_after_max_retries():
    delays = []

    def fn():
        raise RetryableHTTPError(503)

    with pytest.raises(RetryableHTTPError):
        call_with_retry(fn, max_retries=2, base_backoff=0.5, jitter=0.0, sleep=delays.append)
    assert delays == [0.5, 1.0]  # exactly max_retries sleeps


# -- HTTP embedder ------------------------------------------------------------


def test_embedder_survives_injected_429_then_500(server):
    server.fail_statuses = [429, 500]
    v = _emb(server).embed("hello world")
    assert v[:2] == [11.0, 2.0]
    assert len(server.requests) == 3  # 2 failures + 1 success


def test_embedder_raises_on_non_retryable_4xx(server):
    import urllib.error

    server.fail_statuses = [404]
    with pytest.raises(urllib.error.HTTPError):
        _emb(server).embed("x")
    assert len(server.requests) == 1  # no retry on 404


def test_embedder_batch_coalescing(server):
    import pandas as pd

    e = _emb(server, batch_size=2)
    out = e.embed_batch(pd.Series(["a", "bb ccc", "dddd", "e f g", "hh"]))
    assert len(server.requests) == 3  # 5 texts / batch_size 2 -> 3 requests
    assert list(out.map(lambda v: v[0])) == [1.0, 6.0, 4.0, 5.0, 2.0]
    assert list(out.map(lambda v: v[1])) == [1.0, 2.0, 1.0, 3.0, 1.0]


def test_embed_column_with_http_embedder_in_spark(spark, server):
    """End-to-end: the pandas UDF ships the picklable embedder into python
    workers, which batch HTTP calls against the fake server."""
    from pyspark.sql import functions as F

    from cognee_graphdb_spark.llm.embedder import embed_column

    df = spark.createDataFrame([("ab",), ("c d e",)], ["text"]).repartition(1)
    rows = (
        df.withColumn("v", embed_column("text", dim=8, embedder=_emb(server, batch_size=10)))
        .select("text", F.element_at("v", 1).alias("l"), F.element_at("v", 2).alias("w"))
        .collect()
    )
    got = {r["text"]: (r["l"], r["w"]) for r in rows}
    assert got == {"ab": (2.0, 1.0), "c d e": (5.0, 3.0)}


# -- HTTP gateway -------------------------------------------------------------


def test_gateway_complete_and_retry(server):
    server.fail_statuses = [500]
    gw = HttpLLMGateway(
        endpoint=f"http://127.0.0.1:{server.server_address[1]}/v1/chat/completions",
        base_backoff=0.001,
    )
    out = gw.complete("hi there")
    assert out == "ECHO[8]"
    assert len(server.requests) == 2


def test_gateway_json_methods_raise_on_non_json(server):
    gw = HttpLLMGateway(
        endpoint=f"http://127.0.0.1:{server.server_address[1]}/v1/chat/completions",
        base_backoff=0.001,
    )
    with pytest.raises(ValueError, match="non-JSON"):
        gw.sentiment("great stuff")  # the echo server returns prose, not JSON


# -- env gating ---------------------------------------------------------------


def test_factories_default_to_mocks(monkeypatch):
    monkeypatch.delenv("COGNEE_SPARK_LLM_ENDPOINT", raising=False)
    monkeypatch.delenv("COGNEE_SPARK_EMBEDDING_ENDPOINT", raising=False)
    from cognee_graphdb_spark.llm.embedder import HashEmbedder
    from cognee_graphdb_spark.llm.gateway import MockLLMGateway

    assert isinstance(gateway_from_env(), MockLLMGateway)
    assert isinstance(embedder_from_env(), HashEmbedder)


def test_factories_switch_to_http_when_env_set(monkeypatch):
    monkeypatch.setenv("COGNEE_SPARK_LLM_ENDPOINT", "http://h/v1/chat/completions")
    monkeypatch.setenv("COGNEE_SPARK_EMBEDDING_ENDPOINT", "http://h/v1/embeddings")
    monkeypatch.setenv("COGNEE_SPARK_EMBEDDING_MODEL", "my-embed")
    gw = gateway_from_env()
    em = embedder_from_env(dim=32)
    assert isinstance(gw, HttpLLMGateway)
    assert isinstance(em, HttpEmbedder) and em.dim == 32 and em.model == "my-embed"


def test_http_embedder_is_picklable_without_limiter_state(server):
    import pickle

    e = _emb(server)
    e._bucket()  # instantiate limiter (holds an unpicklable lock)
    e2 = pickle.loads(pickle.dumps(e))
    assert e2._limiter is None and e2.endpoint == e.endpoint
