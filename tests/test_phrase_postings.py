"""Positional bigram counts and phrase postings: adjacency (not
co-occurrence), per-doc counts, empty/one-token docs."""

from __future__ import annotations

import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.vocab import bigram_counts, phrase_postings

DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "big data big data big",   # 'big data' x2, 'data big' x2
            "Big DATA!",                # case/punct fold -> 'big data'
            "data",                     # single token: no bigrams
            "",                         # empty: no bigrams
            None,                       # null: no bigrams
        ],
    }
)


class TestBigramCounts:
    def test_counts_and_adjacency(self):
        got = {
            r["bigram"]: r["n"]
            for r in bigram_counts(
                ray.data.from_pandas(DOCS).repartition(3)
            ).take_all()
        }
        assert got == {"big data": 3, "data big": 2}


class TestPhrasePostings:
    def test_per_doc_counts(self):
        out = (
            phrase_postings(
                ray.data.from_pandas(DOCS).repartition(3), ["big data"]
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert list(out["doc_id"]) == [1, 2]
        assert list(out["n"]) == [2, 1]
        assert set(out["phrase"]) == {"big data"}

    def test_unknown_phrase_empty(self):
        out = phrase_postings(
            ray.data.from_pandas(DOCS), ["no such"]
        ).take_all()
        assert out == []
