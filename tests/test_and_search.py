"""Conjunctive (boolean-AND) multi-term retrieval."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from ai_knowledge_graph_ray.stages.vocab import conjunctive_search


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


class TestConjunctiveSearch:
    def test_all_terms_required(self):
        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "alpha beta gamma",
                    "alpha beta",
                    "beta gamma alpha alpha",
                    "ALPHA Gamma beta!",  # case-insensitive, punct-tokenized
                ],
            }
        )
        out = conjunctive_search(_ds(df), ("alpha", "beta", "gamma")).to_pandas()
        assert sorted(out["doc_id"]) == [1, 3, 4]
        assert (out["n_matched"] == 3).all()

    def test_single_term(self):
        df = pd.DataFrame({"doc_id": [1, 2], "text": ["x y", "z"]})
        out = conjunctive_search(_ds(df, 1), ("z",)).to_pandas()
        assert list(out["doc_id"]) == [2]

    def test_empty_terms_raises(self):
        df = pd.DataFrame({"doc_id": [1], "text": ["x"]})
        with pytest.raises(ValueError):
            conjunctive_search(_ds(df, 1), ())

    def test_layout_independent(self):
        df = pd.DataFrame(
            {
                "doc_id": range(40),
                "text": [
                    ("hash join stream" if i % 3 == 0 else "hash join")
                    for i in range(40)
                ],
            }
        )
        one = conjunctive_search(_ds(df, 1), ("hash", "stream")).to_pandas()
        many = conjunctive_search(_ds(df, 8), ("hash", "stream")).to_pandas()
        key = lambda d: d.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(key(one), key(many))
