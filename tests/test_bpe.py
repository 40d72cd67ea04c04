"""BPE trainer + encoder: the classic Sennrich hand corpus, encode
consistency, determinism, and distributed-vs-pure-python agreement."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from ai_knowledge_graph_ray.functions.bpe import (
    bpe_encode_word,
    bpe_train_from_counts,
)
from ai_knowledge_graph_ray.stages.vocab import bpe_token_counts, bpe_train

# Sennrich et al. (2016) example vocabulary
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


class TestBpeCore:
    def test_sennrich_first_merges(self):
        merges = bpe_train_from_counts(SENNRICH, 4)
        # 'es' occurs 9x (newest+widest) -> first merge; then 'es'+'t</w>'
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t</w>")
        assert ("l", "o") in merges[:4]  # 'lo' occurs 7x

    def test_encode_applies_ranks_greedily(self):
        merges = bpe_train_from_counts(SENNRICH, 10)
        ranks = {m: i for i, m in enumerate(merges)}
        assert "".join(bpe_encode_word("newest", ranks)) == "newest</w>"
        assert len(bpe_encode_word("newest", ranks)) <= 3
        # unseen word degrades to characters + learned suffixes
        toks = bpe_encode_word("zest", ranks)
        assert "".join(toks) == "zest</w>" and toks[-1] == "est</w>"

    def test_tie_break_deterministic(self):
        # all pairs occur once except ties; smallest pair wins
        merges_a = bpe_train_from_counts({"ab": 2, "cd": 2}, 1)
        assert merges_a == [("a", "b</w>")]


class TestBpeDistributed:
    def test_train_matches_pure_python(self):
        rows = []
        i = 0
        for w, c in SENNRICH.items():
            for _ in range(c):
                rows.append({"doc_id": i, "text": w})
                i += 1
        ds = ray.data.from_items(rows).repartition(3)
        got = bpe_train(ds, n_merges=6).to_pandas()
        want = bpe_train_from_counts(SENNRICH, 6)
        assert list(zip(got["left"], got["right"])) == want
        assert got["rank"].tolist() == list(range(len(want)))

    def test_token_counts(self):
        docs = pd.DataFrame(
            {"doc_id": [1, 2], "text": ["newest widest", "low low low"]}
        )
        corpus = ray.data.from_pandas(
            pd.DataFrame({"doc_id": range(4), "text": list(SENNRICH) * 1})
        )
        merges_df = bpe_train(corpus, n_merges=10).to_pandas()
        merges = list(zip(merges_df["left"], merges_df["right"]))
        out = (
            bpe_token_counts(ray.data.from_pandas(docs), merges)
            .to_pandas()
            .set_index("doc_id")
        )
        ranks = {m: i for i, m in enumerate(merges)}
        from ai_knowledge_graph_ray.functions.bpe import bpe_encode_word as enc

        want1 = len(enc("newest", ranks)) + len(enc("widest", ranks))
        assert out.loc[1, "n_bpe_tokens"] == want1
        assert out.loc[1, "n_words"] == 2
        assert out.loc[2, "n_bpe_tokens"] == 3 * len(enc("low", ranks))
