"""HttpEmbedder transport policy (A6 backend — VERDICT r3 missing
#3): same faked-session strategy as TestModelRetryPolicy; the real
wire is exercised by the env-gated smoke test."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data


class _Resp:
    def __init__(self, status, vectors=None):
        self.status_code = status
        self.text = "err"
        self._vectors = vectors or []

    def json(self):
        # deliberately out of order: the client must sort by index
        data = [
            {"index": i, "embedding": v}
            for i, v in enumerate(self._vectors)
        ][::-1]
        return {"data": data}


def _client(**kw):
    from ai_knowledge_graph_ray.stages.embed import HttpEmbedder

    return HttpEmbedder(
        model="m", base_url="http://x/v1/embeddings", backoff_base=0.0, **kw
    )


class TestHttpEmbedderTransport:
    def test_batch_roundtrip_reorders_by_index(self):
        c = _client()

        class S:
            def post(s, *a, **k):
                return _Resp(200, [[1.0, 0.0], [0.0, 1.0]])

        c.session = S()
        out = c._embed(["a", "b"])
        assert out == [[1.0, 0.0], [0.0, 1.0]]

    def test_transient_then_success(self):
        c = _client(max_retries=3)
        calls = []

        class S:
            def post(s, *a, **k):
                calls.append(1)
                if len(calls) < 3:
                    raise ConnectionError("boom")
                return _Resp(200, [[0.5]])

        c.session = S()
        assert c._embed(["a"]) == [[0.5]]
        assert len(calls) == 3

    def test_retryable_status_then_success(self):
        c = _client(max_retries=2)
        seq = [_Resp(503), _Resp(200, [[2.0]])]

        class S:
            def post(s, *a, **k):
                return seq.pop(0)

        c.session = S()
        assert c._embed(["a"]) == [[2.0]]

    def test_non_retryable_raises_immediately(self):
        c = _client(max_retries=5)
        calls = []

        class S:
            def post(s, *a, **k):
                calls.append(1)
                return _Resp(401)

        c.session = S()
        with pytest.raises(RuntimeError):
            c._embed(["a"])
        assert len(calls) == 1

    def test_count_mismatch_raises(self):
        c = _client()

        class S:
            def post(s, *a, **k):
                return _Resp(200, [[1.0]])

        c.session = S()
        with pytest.raises(RuntimeError, match="1 vectors for 2"):
            c._embed(["a", "b"])

    def test_batch_call_emits_arrow(self):
        c = _client()

        class S:
            def post(s, *a, **k):
                return _Resp(200, [[1.0, 2.0], [3.0, 4.0]])

        c.session = S()
        out = c(pd.DataFrame({"doc_id": [7, 8], "text": ["x", None]}))
        assert out.column_names == ["doc_id", "embedding"]
        assert out["embedding"].to_pylist() == [[1.0, 2.0], [3.0, 4.0]]


class TestProviderDispatch:
    def test_hashing_default_unchanged(self):
        from ai_knowledge_graph_ray.stages.embed import embed_documents

        docs = ray.data.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta", "gamma"]})
        )
        out = embed_documents(docs, dim=16).to_pandas()
        assert len(out) == 2
        assert len(out["embedding"].iloc[0]) == 16
