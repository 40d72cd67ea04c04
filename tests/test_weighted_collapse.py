"""Weighted-collapse fast path: build_graph with the Phase-1 distinct
collapse must be bit-identical to the raw-table flow (max-of-maxes
representative selection + weighted entity frequencies)."""

from __future__ import annotations

import pandas as pd
import ray.data

from ai_knowledge_graph_ray.pipelines.kg import build_graph
from ai_knowledge_graph_ray.sources.pages import pages_from_documents
from ai_knowledge_graph_ray.stages.infer import dedup_triples_weighted, with_lineage


def _table(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_build_graph_weighted_equals_raw(sf_dir):
    cfg = {"chunking": {"chunk_size": 100, "overlap": 20}}
    fast = build_graph(pages_from_documents(sf_dir), dict(cfg))
    slow = build_graph(
        pages_from_documents(sf_dir),
        {**cfg, "runtime": {"weighted_collapse": False}},
    )
    for k in ["triples", "edges", "nodes"]:
        f, s = _table(fast[k]), _table(slow[k])
        assert list(f.columns) == list(s.columns), k
        pd.testing.assert_frame_equal(f, s, check_like=False), k
    assert fast["components"] == slow["components"]


def test_weighted_dedup_weights_and_representatives(sf_dir):
    """Weights = raw multiplicities; representative row = the exact row
    plain dedup_triples keeps (same order-key winner)."""
    from ai_knowledge_graph_ray.stages.chunk import chunk_docs
    from ai_knowledge_graph_ray.stages.docs import extract_docs
    from ai_knowledge_graph_ray.stages.extract import extract_triples
    from ai_knowledge_graph_ray.stages.infer import dedup_triples

    cfg = {"llm": {"provider": "mock"}}
    raw = extract_triples(
        chunk_docs(extract_docs(pages_from_documents(sf_dir)), 100, 20),
        cfg,
        concurrency=2,
        batch_size=64,
    ).materialize()

    lineaged = with_lineage(raw, "extracted")
    weighted = dedup_triples_weighted(lineaged).to_pandas()
    plain = dedup_triples(lineaged).to_pandas()
    rawpd = raw.to_pandas()

    key = ["subject", "predicate", "object"]
    # multiplicities
    truth = rawpd.groupby(key).size().rename("w").reset_index()
    m = weighted.merge(truth, on=key, how="outer", indicator=True)
    assert (m["_merge"] == "both").all()
    assert (m["weight"] == m["w"]).all()
    # representatives: identical rows (incl. lineage) to plain dedup
    cols = list(plain.columns)
    w_rows = weighted[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    p_rows = plain[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(w_rows, p_rows)
