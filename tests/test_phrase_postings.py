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


class TestDistinctiveTerms:
    def test_hand_lift_and_layout(self):
        from ai_knowledge_graph_ray.stages.vocab import distinctive_terms_per_group

        df = pd.DataFrame(
            {
                "source": ["A", "A", "B", "B"],
                "text": ["apple apple banana", "common common",
                         "cherry cherry common", "common common"],
            }
        )
        # nt: apple 2, banana 1 (pruned at min 2), cherry 2, common 5
        # ng: A=5, B=5; N=10
        want = {
            ("A", "apple"): (2, 2 * 10 * 1000 // (2 * 5)),     # 2000
            ("A", "common"): (2, 2 * 10 * 1000 // (5 * 5)),    # 800
            ("B", "cherry"): (2, 2000),
            ("B", "common"): (3, 3 * 10 * 1000 // (5 * 5)),    # 1200
        }
        for parts in (1, 4):
            out = distinctive_terms_per_group(
                ray.data.from_pandas(df).repartition(parts), "source",
                k=5, min_token_count=2, num_buckets=2,
            ).to_pandas()
            got = {
                (r["group"], r["token"]): (r["n"], r["lift_milli"])
                for _, r in out.iterrows()
            }
            assert got == want
