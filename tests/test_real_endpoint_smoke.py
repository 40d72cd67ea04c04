"""Env-gated real-LLM end-to-end smoke test (VERDICT r3 item 5).

Everything in this sandbox runs on the deterministic mock model; the
OpenAI-compatible transport (``functions/model.py:OpenAIChatModel``,
retries + semantic re-prompt in ``stages/extract.py``) exists but has
never driven a pipeline here because there is no network. This test
closes that plumbing-vs-proven gap WHEN an endpoint is available:

    GRAFT_LLM_BASE_URL=http://host:port/v1 \
    GRAFT_LLM_MODEL=llama3 [GRAFT_LLM_API_KEY=...] \
    python -m pytest tests/test_real_endpoint_smoke.py -q

Skipped by default (no env var set) — see NOTES.md.
"""

from __future__ import annotations

import os

import pytest

BASE_URL = os.environ.get("GRAFT_LLM_BASE_URL")

pytestmark = pytest.mark.skipif(
    not BASE_URL,
    reason="GRAFT_LLM_BASE_URL not set (no real LLM endpoint in this environment)",
)


def _config() -> dict:
    return {
        "llm": {
            "provider": "openai",
            "base_url": BASE_URL,
            "model": os.environ.get("GRAFT_LLM_MODEL", "llama3"),
            "api_key": os.environ.get("GRAFT_LLM_API_KEY", ""),
            "max_tokens": 1500,
            "temperature": 0.0,
        },
        "chunking": {"chunk_size": 100, "overlap": 20},
    }


def test_real_endpoint_build_graph_smoke():
    """build_graph on sf0.001 against the real endpoint: non-empty
    edges and a consistent rejects-channel accounting."""
    from ai_knowledge_graph_ray.pipelines.kg import build_graph, collect_stats
    from ai_knowledge_graph_ray.sources.pages import pages_from_documents

    res = build_graph(pages_from_documents("/root/testdata/sf0.001"), _config())
    stats = collect_stats(res)
    assert stats["edges"] > 0, stats
    assert stats["nodes"] > 0, stats

    if "rejects" in res and res["rejects"] is not None:
        n_rejects = res["rejects"].count()
        assert n_rejects >= 0  # channel exists and is countable


def test_real_endpoint_chat_roundtrip():
    """One raw chat call through the transport (retries exercised on
    flaky endpoints; a hard failure here isolates transport vs
    pipeline problems)."""
    from ai_knowledge_graph_ray.functions.model import make_model

    model = make_model(_config())
    out = model.chat(None, 'Reply with exactly the JSON: [{"ok": true}]')
    assert isinstance(out, str) and len(out) > 0


@pytest.mark.skipif(
    not os.environ.get("GRAFT_EMBED_BASE_URL"),
    reason="GRAFT_EMBED_BASE_URL not set (no embeddings endpoint)",
)
def test_real_endpoint_embeddings_roundtrip():
    """Batched /embeddings call through the HttpEmbedder actor stage
    over a small corpus slice — the A6 backend on the real wire."""
    import ray.data as rd

    from ai_knowledge_graph_ray.stages.embed import embed_documents

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).limit(8)
    out = embed_documents(
        docs,
        provider="http",
        http_cfg={
            "model": os.environ.get("GRAFT_EMBED_MODEL", "nomic-embed-text"),
            "base_url": os.environ["GRAFT_EMBED_BASE_URL"],
            "api_key": os.environ.get("GRAFT_LLM_API_KEY", ""),
        },
        concurrency=(1, 2),
    ).to_pandas()
    assert len(out) == 8
    dims = {len(v) for v in out["embedding"]}
    assert len(dims) == 1 and dims.pop() > 0
