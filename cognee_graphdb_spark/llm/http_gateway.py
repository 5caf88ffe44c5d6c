"""Env-gated HTTP adapters for the LLM / embedding seam.

The engine is mock-first (``MockLLMGateway`` / ``HashEmbedder`` keep every
oracle deterministic), but the reference ships a production embedding engine
behind the same isolation boundary — LiteLLM-backed requests with a dedicated
rate limiter and sleep-and-retry decorators
(cognee/infrastructure/databases/vector/embeddings/LiteLLMEmbeddingEngine.py,
embedding_rate_limiter.py: DEFAULT_MAX_RETRIES=5, exponential backoff with
jitter).  This module is that seam for the Spark engine, with no new
dependencies:

- :class:`TokenBucketRateLimiter` — requests-per-interval token bucket
  (thread-safe; the reference's EmbeddingRateLimiter is likewise per-process.
  On a cluster each executor enforces its own bucket, so size the per-process
  budget as cluster_budget / num_executors).
- :func:`call_with_retry` — exponential backoff + jitter on 429/5xx and
  transport errors, mirroring embedding_sleep_and_retry_sync(max_retries=5,
  base_backoff=1.0).
- :class:`HttpEmbedder` — OpenAI-compatible ``/v1/embeddings`` client that
  coalesces texts into ``batch_size``-sized requests INSIDE the Arrow batch
  (so the Spark-side pandas UDF pays one HTTP round-trip per
  ``batch_size`` rows, not per row).
- :class:`HttpLLMGateway` — OpenAI-compatible ``/v1/chat/completions``
  client implementing the :class:`~cognee_graphdb_spark.llm.gateway.LLMGateway`
  protocol; structured methods request strict JSON and parse it.

Selection is env-gated and mock-by-default:
``COGNEE_SPARK_LLM_ENDPOINT`` / ``COGNEE_SPARK_EMBEDDING_ENDPOINT`` switch the
factories to HTTP; unset, tests and the correctness driver keep the
deterministic mocks.
"""

from __future__ import annotations

import json
import os
import random
import threading
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field

DEFAULT_MAX_RETRIES = 5
DEFAULT_BASE_BACKOFF = 1.0
DEFAULT_BACKOFF_FACTOR = 2.0
DEFAULT_JITTER = 0.1  # fraction of the delay, uniform


class RetryableHTTPError(Exception):
    """A response worth retrying (429 or 5xx)."""

    def __init__(self, status: int, body: str = ""):
        super().__init__(f"HTTP {status}: {body[:200]}")
        self.status = status


class TokenBucketRateLimiter:
    """``max_requests`` per ``interval_seconds``, token-bucket semantics:
    a full bucket allows a burst of ``max_requests``, then refills at
    ``max_requests / interval`` tokens per second.  ``acquire`` blocks
    (sleeps) until a token is available.

    ``now`` / ``sleep`` are injectable for deterministic tests.
    """

    def __init__(
        self,
        max_requests: int = 60,
        interval_seconds: float = 60.0,
        now=time.monotonic,
        sleep=time.sleep,
    ):
        if max_requests <= 0 or interval_seconds <= 0:
            raise ValueError("max_requests and interval_seconds must be positive")
        self.capacity = float(max_requests)
        self.rate = max_requests / interval_seconds
        self._tokens = float(max_requests)
        self._last = now()
        self._now = now
        self._sleep = sleep
        self._lock = threading.Lock()

    def _refill(self) -> None:
        t = self._now()
        self._tokens = min(self.capacity, self._tokens + (t - self._last) * self.rate)
        self._last = t

    def try_acquire(self) -> bool:
        with self._lock:
            self._refill()
            if self._tokens >= 1.0:
                self._tokens -= 1.0
                return True
            return False

    def acquire(self) -> float:
        """Block until a token is available; returns the seconds waited."""
        waited = 0.0
        while True:
            with self._lock:
                self._refill()
                if self._tokens >= 1.0:
                    self._tokens -= 1.0
                    return waited
                need = (1.0 - self._tokens) / self.rate
            self._sleep(need)
            waited += need


def call_with_retry(
    fn,
    max_retries: int = DEFAULT_MAX_RETRIES,
    base_backoff: float = DEFAULT_BASE_BACKOFF,
    backoff_factor: float = DEFAULT_BACKOFF_FACTOR,
    jitter: float = DEFAULT_JITTER,
    sleep=time.sleep,
    rng=random.random,
):
    """Run ``fn`` with exponential-backoff retries on retryable failures.

    Retryable: :class:`RetryableHTTPError` (429/5xx) and ``URLError``
    (connection refused / reset).  Delay_i = base * factor^i * (1 ± jitter),
    the reference's embedding_sleep_and_retry shape.  Raises the last error
    after ``max_retries`` failed attempts.
    """
    attempt = 0
    while True:
        try:
            return fn()
        except urllib.error.HTTPError:
            # HTTPError SUBCLASSES URLError; any that reaches here was judged
            # non-retryable by _http_post_json (4xx other than 429) — re-raise
            # before the URLError arm can swallow it
            raise
        except (RetryableHTTPError, urllib.error.URLError):
            attempt += 1
            if attempt > max_retries:
                raise
            delay = base_backoff * (backoff_factor ** (attempt - 1))
            delay *= 1.0 + jitter * (2.0 * rng() - 1.0)
            sleep(max(0.0, delay))


def _http_post_json(url: str, payload: dict, api_key: str | None, timeout: float) -> dict:
    """One POST; 429/5xx raise RetryableHTTPError, other HTTP errors re-raise."""
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={
            "Content-Type": "application/json",
            **({"Authorization": f"Bearer {api_key}"} if api_key else {}),
        },
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        body = ""
        try:
            body = e.read().decode("utf-8", "replace")
        except Exception:
            pass
        if e.code == 429 or e.code >= 500:
            raise RetryableHTTPError(e.code, body) from e
        raise


@dataclass
class HttpEmbedder:
    """OpenAI-compatible embedding client with worker-side batch coalescing.

    Picklable config-only dataclass: the rate limiter and any connection state
    are built lazily per process, so the object ships into Spark python
    workers unchanged.  Inside ``embed_batch`` (called once per Arrow batch by
    the pandas UDF) texts coalesce into requests of ``batch_size`` — the same
    batching as the reference engine's ``batch_size=100``
    (LiteLLMEmbeddingEngine.__init__).
    """

    endpoint: str  # e.g. http://host:port/v1/embeddings
    model: str = "text-embedding-3-small"
    dim: int = 64
    api_key: str | None = None
    batch_size: int = 100
    timeout: float = 30.0
    max_retries: int = DEFAULT_MAX_RETRIES
    base_backoff: float = DEFAULT_BASE_BACKOFF
    max_requests_per_minute: int = 600
    _limiter: TokenBucketRateLimiter | None = field(default=None, repr=False, compare=False)

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_limiter"] = None  # rebuilt lazily in the worker process
        return state

    def _bucket(self) -> TokenBucketRateLimiter:
        if self._limiter is None:
            self._limiter = TokenBucketRateLimiter(self.max_requests_per_minute, 60.0)
        return self._limiter

    def _request(self, texts: list[str]) -> list[list[float]]:
        def go():
            self._bucket().acquire()
            out = _http_post_json(
                self.endpoint,
                {"model": self.model, "input": texts, "dimensions": self.dim},
                self.api_key,
                self.timeout,
            )
            data = sorted(out["data"], key=lambda d: d.get("index", 0))
            if len(data) != len(texts):
                raise ValueError(f"embedding count mismatch: sent {len(texts)}, got {len(data)}")
            return [d["embedding"] for d in data]

        return call_with_retry(go, max_retries=self.max_retries, base_backoff=self.base_backoff)

    def embed(self, text: str) -> list[float]:
        return self._request([text or ""])[0]

    def embed_batch(self, texts) -> "object":
        """pd.Series[str] -> pd.Series[list[float]], one HTTP request per
        ``batch_size`` texts (same signature as HashEmbedder.embed_batch, so
        ``embed_column(..., embedder=...)`` swaps engines without touching
        the Spark plan)."""
        import pandas as pd

        vals = ["" if t is None else str(t) for t in texts]
        out: list[list[float]] = []
        for i in range(0, len(vals), self.batch_size):
            out.extend(self._request(vals[i : i + self.batch_size]))
        return pd.Series(out, index=texts.index)


@dataclass
class HttpLLMGateway:
    """OpenAI-compatible chat-completions client implementing the LLMGateway
    protocol.  Each structured method issues one chat call that demands
    strict JSON and parses it — the reference routes the same calls through
    LiteLLM structured output (LLMGateway.acreate_structured_output).  A
    malformed reply raises ValueError; callers with retry loops (U5's <=3
    attempts) feed the failure back as ``previous_attempts``.
    """

    endpoint: str  # e.g. http://host:port/v1/chat/completions
    model: str = "gpt-4o-mini"
    api_key: str | None = None
    timeout: float = 60.0
    max_retries: int = DEFAULT_MAX_RETRIES
    base_backoff: float = DEFAULT_BASE_BACKOFF
    max_requests_per_minute: int = 120
    _limiter: TokenBucketRateLimiter | None = field(default=None, repr=False, compare=False)

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_limiter"] = None
        return state

    def _bucket(self) -> TokenBucketRateLimiter:
        if self._limiter is None:
            self._limiter = TokenBucketRateLimiter(self.max_requests_per_minute, 60.0)
        return self._limiter

    def complete(self, prompt: str) -> str:
        def go():
            self._bucket().acquire()
            out = _http_post_json(
                self.endpoint,
                {"model": self.model, "messages": [{"role": "user", "content": prompt}]},
                self.api_key,
                self.timeout,
            )
            return out["choices"][0]["message"]["content"]

        return call_with_retry(go, max_retries=self.max_retries, base_backoff=self.base_backoff)

    def _json(self, prompt: str):
        raw = self.complete(prompt + "\n\nReply with STRICT JSON only, no prose.")
        try:
            return json.loads(raw)
        except json.JSONDecodeError as e:
            raise ValueError(f"gateway returned non-JSON: {raw[:200]}") from e

    # -- LLMGateway protocol methods (prompt + parse) -------------------------
    def extract_summary(self, text: str) -> str:
        return self.complete(f"Summarize in one sentence:\n{text}")

    def extract_graph(self, text: str):
        out = self._json(
            "Extract a knowledge graph from the text as "
            '{"nodes": [{"name", "type"}], "edges": [{"src_name", "dst_name", "relationship_name"}]}.'
            f"\nText:\n{text}"
        )
        return out.get("nodes", []), out.get("edges", [])

    def extract_interval(self, question: str):
        out = self._json(
            'Extract the time interval of the question as {"from": epoch_seconds, "to": epoch_seconds} '
            f'or {{"from": null}}.\nQuestion: {question}'
        )
        if out.get("from") is None:
            return None
        return int(out["from"]), int(out["to"])

    def sentiment(self, text: str) -> int:
        out = self._json(f'Score the sentiment from -5 to 5 as {{"score": n}}.\nText: {text}')
        return max(-5, min(5, int(out["score"])))

    def nl_to_sql(self, question: str, schema, previous_attempts: str = "") -> str:
        prompt = (
            "Write ONE ANSI-SQL SELECT over tables nodes(id, name, type) and "
            f"edges(src, dst, relationship_name) answering: {question}\nSchema values: {schema!r}"
        )
        if previous_attempts:
            prompt += f"\nPrevious failed attempts:\n{previous_attempts}"
        return self.complete(prompt)

    def followup_question(self, query: str, answer: str, context: str) -> str:
        return self.complete(
            f"Given the question {query!r} and the answer so far, ask ONE follow-up question.\n"
            f"Answer: {answer}\nContext:\n{context}"
        )

    def select_search_type(self, query: str) -> str:
        out = self._json(
            'Pick one of ["TEMPORAL", "SUMMARIES", "INSIGHTS", "RAG_COMPLETION"] as {"type": t} '
            f"for the query: {query}"
        )
        return out["type"]

    def parse_code_query(self, query: str):
        out = self._json(
            f'Split the code query into {{"files": [...], "terms": [...]}}.\nQuery: {query}'
        )
        return out.get("files", []), out.get("terms", [])

    def extract_events(self, text: str):
        out = self._json(
            'Extract events as {"events": [{"name", "ts_from", "ts_to"}]} (epoch seconds, ts_to may be null).'
            f"\nText:\n{text}"
        )
        return out.get("events", [])

    def extract_rules(self, text: str):
        out = self._json(f'Extract developer rules as {{"rules": [...]}} from:\n{text}')
        return out.get("rules", [])[:5]

    def judge_correctness(self, question: str, answer: str, gold: str) -> float:
        out = self._json(
            'Judge answer correctness against the gold answer as {"score": x} with x in [0, 1].'
            f"\nQuestion: {question}\nAnswer: {answer}\nGold: {gold}"
        )
        return max(0.0, min(1.0, float(out["score"])))

    def judge_context_coverage(self, golden_context: str, retrieval_context: str) -> float:
        out = self._json(
            'Judge how much of the golden context the retrieved context covers as {"score": x} in [0, 1].'
            f"\nGolden:\n{golden_context}\nRetrieved:\n{retrieval_context}"
        )
        return max(0.0, min(1.0, float(out["score"])))

    def classify_chunk(self, text: str) -> dict:
        out = self._json(
            f'Classify the chunk as {{"type": label, "subclasses": [...]}}.\nText:\n{text}'
        )
        return {"type": out.get("type", "TextContent"), "subclasses": out.get("subclasses", [])}

    def create_transcript(self, features: dict) -> str:
        return self.complete(f"Transcribe the audio with these decoded signal features: {features!r}")

    def transcribe_image(self, features: dict) -> str:
        return self.complete(f"Describe the image with these decoded pixel features: {features!r}")


def gateway_from_env():
    """``COGNEE_SPARK_LLM_ENDPOINT`` set -> HttpLLMGateway; else the
    deterministic mock (the default keeps every driver oracle reproducible)."""
    endpoint = os.environ.get("COGNEE_SPARK_LLM_ENDPOINT")
    if not endpoint:
        from cognee_graphdb_spark.llm.gateway import MockLLMGateway

        return MockLLMGateway()
    return HttpLLMGateway(
        endpoint=endpoint,
        model=os.environ.get("COGNEE_SPARK_LLM_MODEL", "gpt-4o-mini"),
        api_key=os.environ.get("COGNEE_SPARK_LLM_API_KEY"),
    )


def embedder_from_env(dim: int = 64):
    """``COGNEE_SPARK_EMBEDDING_ENDPOINT`` set -> HttpEmbedder; else the
    deterministic hash embedder."""
    endpoint = os.environ.get("COGNEE_SPARK_EMBEDDING_ENDPOINT")
    if not endpoint:
        from cognee_graphdb_spark.llm.embedder import HashEmbedder

        return HashEmbedder(dim)
    return HttpEmbedder(
        endpoint=endpoint,
        model=os.environ.get("COGNEE_SPARK_EMBEDDING_MODEL", "text-embedding-3-small"),
        dim=dim,
        api_key=os.environ.get("COGNEE_SPARK_EMBEDDING_API_KEY"),
    )
