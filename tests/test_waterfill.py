"""Max-min-fair budget allocation (water-filling): closed form,
binary-search scale path equivalence, quota semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.webtext import (
    source_budget_quotas,
    waterfill_threshold,
)


def _docs(sources):
    return ray.data.from_arrow(
        pa.table({"source": pa.array(sources, pa.string())})
    )


def _brute_threshold(counts, budget):
    if len(counts) == 0 or budget <= 0:
        return 0
    if sum(counts) <= budget:
        return max(counts)
    t = 0
    while sum(min(c, t + 1) for c in counts) <= budget:
        t += 1
    return t


class TestThreshold:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(5)
        for _ in range(30):
            counts = rng.integers(0, 50, size=int(rng.integers(1, 12)))
            budget = int(rng.integers(0, 300))
            assert waterfill_threshold(counts, budget) == _brute_threshold(
                list(counts), budget
            ), (list(counts), budget)

    def test_edge_cases(self):
        assert waterfill_threshold(np.array([], dtype=int), 10) == 0
        assert waterfill_threshold(np.array([7]), 0) == 0
        assert waterfill_threshold(np.array([7]), 100) == 7


class TestQuotas:
    def test_quota_semantics(self):
        # sources: a x10, b x20, c x30; budget 45 -> T=17
        srcs = ["a"] * 10 + ["b"] * 20 + ["c"] * 30
        out = (
            source_budget_quotas(_docs(srcs), "source", budget=45)
            .to_pandas()
            .set_index("source")
        )
        assert out.loc["a", "quota"] == 10
        assert out.loc["b", "quota"] == 17
        assert out.loc["c", "quota"] == 17
        assert out["quota"].sum() <= 45

    def test_binary_search_path_matches_closed_form(self):
        rng = np.random.default_rng(9)
        srcs = [f"s{int(rng.integers(0, 15))}" for _ in range(400)]
        a = (
            source_budget_quotas(_docs(srcs), "source", budget=250)
            .to_pandas().sort_values("source").reset_index(drop=True)
        )
        b = (
            source_budget_quotas(
                _docs(srcs), "source", budget=250, driver_max_keys=0
            )
            .to_pandas().sort_values("source").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_budget_covers_everything(self):
        out = source_budget_quotas(
            _docs(["x"] * 5 + ["y"] * 3), "source", budget=100
        ).to_pandas()
        assert (out["quota"] == out["n_docs"]).all()


class TestBudgetedSample:
    def test_composite_enforces_quota(self, tmp_path):
        import pyarrow.parquet as pq

        from ai_knowledge_graph_ray.pipelines.queries import q_doc_budgeted_sample

        # sources: a x10 (ids 0-9), b x5 (ids 10-14) -> budget 9:
        # T = 4 (4+4=8 <= 9; 5+5=10 > 9); keep 4 smallest ids each
        df = pd.DataFrame(
            {
                "doc_id": list(range(15)),
                "source": ["a"] * 10 + ["b"] * 5,
            }
        )
        pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
        out = q_doc_budgeted_sample(str(tmp_path)).to_pandas()
        got = out.groupby("source")["doc_id"].apply(set).to_dict()
        assert got == {"a": {0, 1, 2, 3}, "b": {10, 11, 12, 13}}
