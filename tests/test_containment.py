"""Asymmetric n-gram containment pairs: planted quote-inside-article
fixture, direction correctness, both-direction near-dups, threshold
edge, and layout independence."""

from __future__ import annotations

import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.dedup import ngram_containment_pairs


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


def _words(n: int, salt: str) -> str:
    return " ".join(f"{salt}{i}" for i in range(n))


class TestContainment:
    def test_planted_quote(self):
        quote = _words(12, "q")  # 10 distinct 3-grams
        article = _words(40, "body") + " " + quote + " " + _words(40, "tail")
        other = _words(30, "zz")
        df = pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": [quote, article, other]}
        )
        out = ngram_containment_pairs(_ds(df), threshold=0.8).to_pandas()
        # quote (1) is fully contained in article (2); never the reverse
        rows = {(r.id_sub, r.id_sup) for r in out.itertuples()}
        assert (1, 2) in rows and (2, 1) not in rows
        r = out[(out.id_sub == 1) & (out.id_sup == 2)].iloc[0]
        assert r["n_common"] == r["n_sub"] == 10
        assert r["n_sup"] > r["n_sub"]

    def test_near_identical_emits_both_directions(self):
        a = _words(20, "w")
        df = pd.DataFrame({"doc_id": [1, 2], "text": [a, a]})
        out = ngram_containment_pairs(_ds(df, 2), threshold=0.8).to_pandas()
        rows = {(r.id_sub, r.id_sup) for r in out.itertuples()}
        assert rows == {(1, 2), (2, 1)}

    def test_threshold_boundary(self):
        # sub has 10 grams, 8 shared: containment exactly 0.8 passes;
        # 7 shared (0.7) fails
        base = _words(10, "s")  # words s0..s9 -> 8 grams
        # construct docs sharing exactly some grams via shared word runs
        sub = _words(12, "k")  # 10 grams k0..k9 windows
        sup = _words(10, "k") + " break " + _words(60, "pad")
        # sup contains k0..k9 words -> shares grams k0k1k2 .. k7k8k9 = 8
        df = pd.DataFrame({"doc_id": [1, 2], "text": [sub, sup]})
        out = ngram_containment_pairs(_ds(df, 1), threshold=0.8).to_pandas()
        got = {(r.id_sub, r.id_sup) for r in out.itertuples()}
        assert (1, 2) in got  # 8/10 == 0.8 exactly -> >= passes
        out2 = ngram_containment_pairs(_ds(df, 1), threshold=0.81).to_pandas()
        got2 = {(r.id_sub, r.id_sup) for r in out2.itertuples()}
        assert (1, 2) not in got2
        _ = base

    def test_layout_independent(self):
        quote = _words(12, "q")
        docs = [
            (1, quote),
            (2, _words(30, "a") + " " + quote),
            (3, _words(25, "b")),
            (4, quote + " " + _words(5, "c")),
        ]
        df = pd.DataFrame(docs, columns=["doc_id", "text"])
        key = lambda d: d.sort_values(
            ["id_sub", "id_sup"]
        ).reset_index(drop=True)
        one = ngram_containment_pairs(_ds(df, 1)).to_pandas()
        many = ngram_containment_pairs(_ds(df, 4)).to_pandas()
        pd.testing.assert_frame_equal(key(one), key(many))
