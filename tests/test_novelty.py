"""Per-doc novelty (corpus-unique gram share) — planted fixtures."""

from __future__ import annotations

import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.dedup import novelty_scores


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


def _words(n: int, salt: str) -> str:
    return " ".join(f"{salt}{i}" for i in range(n))


class TestNovelty:
    def test_exact_copy_scores_zero(self):
        a = _words(20, "w")
        df = pd.DataFrame({"doc_id": [1, 2], "text": [a, a]})
        out = novelty_scores(_ds(df)).to_pandas().set_index("doc_id")
        assert out.loc[1]["novelty_milli"] == 0
        assert out.loc[2]["novelty_milli"] == 0
        assert out.loc[1]["n_unique"] == 0

    def test_original_doc_scores_full(self):
        df = pd.DataFrame(
            {"doc_id": [1, 2], "text": [_words(20, "a"), _words(20, "b")]}
        )
        out = novelty_scores(_ds(df)).to_pandas().set_index("doc_id")
        assert out.loc[1]["novelty_milli"] == 1000
        assert out.loc[2]["novelty_milli"] == 1000

    def test_half_quoted(self):
        # doc 1: 12 words -> 10 grams, all unique
        # doc 2: its own 12 words + doc 1's words appended:
        #   shares doc 1's 10 grams (plus 2 bridge grams unique)
        quote = _words(12, "q")
        own = _words(12, "o")
        df = pd.DataFrame({"doc_id": [1, 2], "text": [quote, own + " " + quote]})
        out = novelty_scores(_ds(df)).to_pandas().set_index("doc_id")
        d1 = out.loc[1]
        assert d1["n_grams"] == 10 and d1["n_unique"] == 0  # all shared
        d2 = out.loc[2]
        # doc 2 grams: 22 total; 10 shared with doc 1, 12 unique
        assert d2["n_grams"] == 22 and d2["n_unique"] == 12
        assert d2["novelty_milli"] == 12 * 1000 // 22

    def test_short_doc_whole_text_gram(self):
        df = pd.DataFrame({"doc_id": [1, 2], "text": ["one two", "three"]})
        out = novelty_scores(_ds(df, 1)).to_pandas().set_index("doc_id")
        assert out.loc[1]["n_grams"] == 1 and out.loc[1]["novelty_milli"] == 1000

    def test_layout_independent(self):
        df = pd.DataFrame(
            {
                "doc_id": range(20),
                "text": [_words(15, f"s{i % 4}") for i in range(20)],
            }
        )
        key = lambda d: d.sort_values("doc_id").reset_index(drop=True)
        one = novelty_scores(_ds(df, 1)).to_pandas()
        many = novelty_scores(_ds(df, 8)).to_pandas()
        pd.testing.assert_frame_equal(key(one), key(many))
