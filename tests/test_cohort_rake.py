"""Planted-fixture tests for the cohort LTV triangle and the
RAKE-style keyphrase extraction."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


def _frame(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    return res


class TestCohortLtv:
    def test_planted_triangle(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_orders_cohort_ltv

        orders = pd.DataFrame(
            {
                "o_custkey": [1, 1, 1, 2, 2],
                "o_orderdate": pd.to_datetime(
                    [
                        "1996-01-15",  # c1 cohort Jan-96
                        "1996-03-02",  # offset 2
                        "1996-01-20",  # offset 0 again
                        "1996-02-01",  # c2 cohort Feb-96
                        "1996-02-28",  # offset 0
                    ]
                ).astype("datetime64[us]"),
                "o_totalprice": [10.0, 20.0, 30.0, 5.0, 7.0],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet")
        )
        out = _frame(q_orders_cohort_ltv(str(tmp_path)))
        jan96 = 1996 * 12 + 0
        feb96 = 1996 * 12 + 1
        got = {
            (r.cohort_m, r.offset_m): (r.revenue_cents, r.n_orders)
            for r in out.itertuples()
        }
        assert got == {
            (jan96, 0): (4000, 2),
            (jan96, 2): (2000, 1),
            (feb96, 0): (1200, 2),
        }


class TestRakeKeyphrases:
    def test_planted_islands_and_scores(self):
        from ai_knowledge_graph_ray.stages.text_analysis import rake_top_phrases

        # stopwords from the en list split runs: "the" splits the text
        # into islands. doc 1: "red cats" and "red dogs".
        # word stats: red freq 2 degree 4; cats freq 1 degree 2;
        # dogs freq 1 degree 2. both phrases: deg_sum 6, freq_sum 3
        # -> tie broken to 'red cats' (asc).
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "red cats the red dogs",
                    "the and of",   # all stopwords -> no phrase
                    "solo",
                ],
            }
        )
        out = _frame(
            rake_top_phrases(ray.data.from_pandas(docs).repartition(2))
        ).set_index("doc_id")
        assert out.loc[1, "phrase"] == "red cats"
        assert out.loc[1, "deg_sum"] == 6
        assert out.loc[1, "freq_sum"] == 3
        assert out.loc[1, "n_words"] == 2
        assert 2 not in out.index
        assert out.loc[3, "phrase"] == "solo"
        assert out.loc[3, "deg_sum"] == 1 and out.loc[3, "freq_sum"] == 1

    def test_longer_phrase_wins_by_degree(self):
        from ai_knowledge_graph_ray.stages.text_analysis import rake_top_phrases

        # "big green engine" (len 3: each word degree 3 -> deg_sum 9)
        # beats "pump" (deg_sum 1).
        docs = pd.DataFrame(
            {"doc_id": [7], "text": ["big green engine the pump"]}
        )
        out = _frame(rake_top_phrases(ray.data.from_pandas(docs)))
        assert out["phrase"].iloc[0] == "big green engine"
        assert out["deg_sum"].iloc[0] == 9


class TestPrefixDedup:
    def test_shared_prefix_collapses(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_doc_prefix_dedup

        base = "x" * 100
        docs = pd.DataFrame(
            {
                "doc_id": [3, 1, 2],
                "text": [base + "tail-a", base + "tail-b", "different"],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet")
        )
        out = _frame(q_doc_prefix_dedup(str(tmp_path)))
        assert len(out) == 2
        row = out[out["n_docs"] == 2].iloc[0]
        assert row["keep_id"] == 1  # min doc_id wins


class TestBenford:
    def test_digit_census(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_orders_benford

        orders = pd.DataFrame(
            {"o_totalprice": [1.00, 19.99, 102.50, 9.01, 950.00]}
        )
        pq.write_table(
            pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet")
        )
        # cents: 100, 1999, 10250, 901, 95000 -> digits 1,1,1,9,9
        out = _frame(q_orders_benford(str(tmp_path)))
        got = dict(zip(out["digit"], out["n"]))
        assert got == {"1": 3, "9": 2}
