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
- A model-server backend slots into the same constructor (load once
  per actor, batch per call) exactly like ``TripleExtractor``.
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


def embed_documents(
    docs: ray.data.Dataset,
    *,
    dim: int = 128,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 256,
) -> ray.data.Dataset:
    """``(doc_id, text)`` -> ``(doc_id, embedding: list<double>)``."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        HashingEmbedder,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
