"""Incremental corpus growth: update_graph(stored raw, new pages) must
be bit-identical to a full rebuild over old+new pages (extraction is
per-page deterministic; phases key on explicit order columns)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ai_knowledge_graph_ray.pipelines.kg import build_graph, update_graph
from ai_knowledge_graph_ray.sources.pages import pages_from_documents
from ai_knowledge_graph_ray.stages.chunk import chunk_docs
from ai_knowledge_graph_ray.stages.docs import extract_docs
from ai_knowledge_graph_ray.stages.extract import extract_triples

CFG = {"chunking": {"chunk_size": 100, "overlap": 20}}


def _subset(pages: ray.data.Dataset, lo: int, hi: int, parity: int | None):
    def _f(b: pa.Table) -> pa.Table:
        # self-contained: test modules are not importable on workers
        ids = pc.cast(
            pc.replace_substring(b["url"], "https://example.org/doc/", ""),
            pa.int64(),
        )
        mask = pc.and_(pc.greater_equal(ids, lo), pc.less(ids, hi))
        if parity is not None:
            mask = pc.and_(mask, pc.equal(pc.bit_wise_and(ids, 1), parity))
        return b.filter(mask)

    return pages.map_batches(_f, batch_format="pyarrow")


def _frame(ds, cols) -> pd.DataFrame:
    df = ds.to_pandas()[cols]
    return df.sort_values(cols, kind="stable").reset_index(drop=True)


class TestIncrementalUpdate:
    def test_matches_full_rebuild(self, sf_dir):
        pages = pages_from_documents(sf_dir).materialize()
        pages_all = _subset(pages, 0, 120, None).materialize()
        pages_a = _subset(pages, 0, 120, 0).materialize()
        pages_b = _subset(pages, 0, 120, 1).materialize()

        # the "stored corpus": Phase-1 raw triples over A only (what
        # run.py's checkpoint sink persists, minus lineage columns)
        raw_a = extract_triples(
            chunk_docs(extract_docs(pages_a), 100, 20),
            {"llm": {"provider": "mock"}},
            concurrency=2,
        ).materialize()
        assert raw_a.count() > 0

        full = build_graph(pages_all, CFG)
        inc = update_graph(raw_a, pages_b, CFG)

        tcols = ["url", "chunk_id", "subject", "predicate", "object", "inferred"]
        pd.testing.assert_frame_equal(
            _frame(full["triples"], tcols), _frame(inc["triples"], tcols)
        )
        ecols = ["src", "dst", "predicate", "inferred"]
        pd.testing.assert_frame_equal(
            _frame(full["edges"], ecols), _frame(inc["edges"], ecols)
        )
        assert full["components"] == inc["components"]
