"""Reciprocity and text-reuse originality."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.dedup import originality_scores
from ai_knowledge_graph_ray.stages.graph_algos import reciprocity


def _edges(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.string()),
                "dst": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


class TestReciprocity:
    def test_hand_graph(self):
        # a<->b reciprocal (2 edges), a->c one-way, d->d self-loop
        # (excluded), duplicate a->b (deduped)
        out = reciprocity(
            _edges([("a", "b"), ("b", "a"), ("a", "c"), ("d", "d"), ("a", "b")])
        ).iloc[0]
        assert out["n_edges"] == 3
        assert out["n_reciprocal"] == 2
        assert out["reciprocity_milli"] == 666

    def test_pure_dag(self):
        out = reciprocity(_edges([("a", "b"), ("b", "c")])).iloc[0]
        assert out["n_reciprocal"] == 0

    def test_layout_independence(self):
        import numpy as np

        rng = np.random.default_rng(7)
        pairs = [
            (f"n{int(rng.integers(0, 20))}", f"n{int(rng.integers(0, 20))}")
            for _ in range(200)
        ]
        a = reciprocity(_edges(pairs)).iloc[0]
        b = reciprocity(_edges(pairs).repartition(7)).iloc[0]
        assert dict(a) == dict(b)


class TestOriginality:
    def _docs(self, texts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def test_copier_scores_zero(self):
        orig = "alpha beta gamma delta epsilon zeta eta theta"
        out = (
            originality_scores(self._docs([orig, orig]), k=3)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "originality_milli"] == 1000  # min doc id wins
        assert out.loc[2, "originality_milli"] == 0

    def test_fresh_doc_scores_full(self):
        out = (
            originality_scores(
                self._docs(
                    ["one two three four", "five six seven eight nine"]
                ),
                k=3,
            )
            .to_pandas()
            .set_index("doc_id")
        )
        assert (out["originality_milli"] == 1000).all()

    def test_partial_reuse(self):
        # doc2 = doc1's tail + new words: shared grams attribute to 1
        d1 = "a1 a2 a3 a4 a5"
        d2 = "a3 a4 a5 b1 b2"
        out = (
            originality_scores(self._docs([d1, d2]), k=3)
            .to_pandas()
            .set_index("doc_id")
        )
        # doc2 grams: (a3 a4 a5)(shared), (a4 a5 b1), (a5 b1 b2) -> 2/3
        assert out.loc[2, "n_grams"] == 3
        assert out.loc[2, "n_first_seen"] == 2
        assert out.loc[1, "originality_milli"] == 1000
