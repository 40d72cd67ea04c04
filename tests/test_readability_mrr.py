"""Integer Flesch readability and grouped ranking metrics (hit@k /
integer MRR) — hand-computed expectations + layout independence."""

from __future__ import annotations

import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.retrieval import ranking_metrics
from ai_knowledge_graph_ray.stages.text_analysis import readability


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


class TestReadability:
    def test_hand_counts(self):
        df = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["The cat sat. It purred!", ""],
            }
        )
        out = readability(_ds(df)).to_pandas().set_index("doc_id")
        r = out.loc[1]
        # words: the,cat,sat,it,purred = 5; sentences: '.' and '!' = 2
        # vowel groups (lower): e,a,a,i,u,e  -> the(1) cat(1) sat(1)
        # it(1) purred(2: u, e) = 6
        assert r["n_words"] == 5 and r["n_sentences"] == 2
        assert r["n_syllables"] == 6
        assert r["flesch_x1000"] == 206835 - (1015 * 5) // 2 - (84600 * 6) // 5
        e = out.loc[2]
        assert e["n_words"] == 0 and e["n_sentences"] == 0 and e["n_syllables"] == 0
        assert e["flesch_x1000"] == 206835

    def test_no_sentence_marks(self):
        df = pd.DataFrame({"doc_id": [9], "text": ["hello world"]})
        out = readability(_ds(df, 1)).to_pandas().iloc[0]
        # s=0 guards to 1
        assert out["n_sentences"] == 0
        assert out["flesch_x1000"] == 206835 - 1015 * 2 - (84600 * 3) // 2


class TestRankingMetrics:
    def _fixture(self) -> pd.DataFrame:
        # group g1: query A candidates scored 30,20,10 — relevant at
        # score 20 => first_rel rank 2; query B no relevant => rr 0.
        # group g2: query C relevant at rank 1.
        return pd.DataFrame(
            {
                "grp": ["g1"] * 5 + ["g2"] * 2,
                "qid": [1, 1, 1, 2, 2, 3, 3],
                "score": [30, 20, 10, 9, 8, 5, 4],
                "tie": [1, 2, 3, 4, 5, 6, 7],
                "rel": [False, True, True, False, False, True, False],
            }
        )

    def test_hand_metrics(self):
        out = (
            ranking_metrics(
                _ds(self._fixture()),
                group_col="grp",
                query_col="qid",
                order_col="score",
                tie_col="tie",
                relevant_col="rel",
                k=10,
            )
            .to_pandas()
            .set_index("grp")
        )
        g1 = out.loc["g1"]
        assert g1["n_queries"] == 2 and g1["n_hits"] == 1
        assert g1["sum_rr_x1e6"] == 1_000_000 // 2
        g2 = out.loc["g2"]
        assert g2["n_queries"] == 1 and g2["n_hits"] == 1
        assert g2["sum_rr_x1e6"] == 1_000_000

    def test_k_cut_excludes_late_relevant(self):
        df = self._fixture()
        out = (
            ranking_metrics(
                _ds(df),
                group_col="grp",
                query_col="qid",
                order_col="score",
                tie_col="tie",
                relevant_col="rel",
                k=1,
            )
            .to_pandas()
            .set_index("grp")
        )
        # with k=1 only query C (rank-1 relevant) hits
        assert out.loc["g1"]["n_hits"] == 0 and out.loc["g1"]["sum_rr_x1e6"] == 0
        assert out.loc["g2"]["n_hits"] == 1

    def test_tie_break_deterministic_and_layout_independent(self):
        # two candidates share the top score; tie col decides rank 1
        df = pd.DataFrame(
            {
                "grp": ["g"] * 4,
                "qid": [1] * 4,
                "score": [10, 10, 5, 1],
                "tie": [7, 3, 1, 2],
                "rel": [True, False, False, False],
            }
        )
        kw = dict(
            group_col="grp", query_col="qid", order_col="score",
            tie_col="tie", relevant_col="rel", k=10,
        )
        out = ranking_metrics(_ds(df, 1), **kw).to_pandas()
        # tie=3 (not relevant) outranks tie=7, so first relevant is rank 2
        assert out.iloc[0]["sum_rr_x1e6"] == 500_000
        many = ranking_metrics(_ds(df, 4), **kw).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values("grp").reset_index(drop=True),
            many.sort_values("grp").reset_index(drop=True),
        )
