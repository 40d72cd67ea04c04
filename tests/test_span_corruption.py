"""Span corruption: determinism under repartitioning, reconstruction
property (input + target recover the original token stream), and rate
sanity."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.training import generate_span_corruption

_SENTINEL = re.compile(r"<extra_id_(\d+)>")


def _docs(n: int = 40, seed: int = 5) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(f"w{rng.integers(0, 200)}" for _ in range(rng.integers(1, 120)))
        for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _run(df: pd.DataFrame, parts: int) -> pd.DataFrame:
    ds = ray.data.from_pandas(df).repartition(parts)
    return (
        generate_span_corruption(ds, seed=42)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _reconstruct(inp: str, tgt: str) -> str:
    """Invert the corruption: replace <extra_id_k> in input with the
    k-th span from target."""
    spans: dict[int, list[str]] = {}
    cur = None
    for tok in tgt.split():
        m = _SENTINEL.fullmatch(tok)
        if m:
            cur = int(m.group(1))
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out = []
    for tok in inp.split():
        m = _SENTINEL.fullmatch(tok)
        if m:
            out.extend(spans[int(m.group(1))])
        else:
            out.append(tok)
    return " ".join(out)


class TestSpanCorruption:
    def test_deterministic_across_partitionings(self):
        df = _docs()
        a = _run(df, 2)
        b = _run(df, 7)
        pd.testing.assert_frame_equal(a, b)

    def test_reconstruction(self):
        df = _docs()
        out = _run(df, 3)
        orig = {r["doc_id"]: " ".join(r["text"].split()) for _, r in df.iterrows()}
        for _, r in out.iterrows():
            assert _reconstruct(r["input"], r["target"]) == orig[r["doc_id"]]

    def test_mask_rate_in_band(self):
        # with enough tokens the realized rate should be near 15%
        rng = np.random.default_rng(1)
        text = " ".join(f"t{rng.integers(0, 50)}" for _ in range(20000))
        df = pd.DataFrame({"doc_id": [0], "text": [text]})
        out = _run(df, 1)
        rate = out.iloc[0]["n_masked"] / out.iloc[0]["n_tokens"]
        assert 0.10 < rate < 0.20

    def test_empty_doc(self):
        df = pd.DataFrame({"doc_id": [0], "text": [""]})
        out = _run(df, 1)
        assert out.iloc[0]["n_tokens"] == 0
        assert out.iloc[0]["target"] == "<extra_id_0>"

    def test_sentinels_sequential_in_input(self):
        df = _docs(10, seed=9)
        out = _run(df, 2)
        for _, r in out.iterrows():
            ids = [int(m.group(1)) for m in _SENTINEL.finditer(r["input"])]
            assert ids == list(range(len(ids)))
