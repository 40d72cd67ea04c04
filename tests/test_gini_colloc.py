"""categorical_gini exact integers; string-item cooccur_lift."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.cooccur import cooccur_lift
from ai_knowledge_graph_ray.stages.profile import categorical_gini


class TestCategoricalGini:
    def test_hand_values_and_layout(self):
        df = pd.DataFrame(
            {
                "user_id": [1] * 4 + [2] * 3 + [3] * 2,
                "event_type": ["a", "a", "b", "b",   # 1: 2/2 -> gini .5
                               "a", "a", "a",        # 2: pure -> 0
                               "a", "b"],            # 3: 1/1 -> .5
            }
        )
        want = {1: (4, 500), 2: (3, 0), 3: (2, 500)}
        for parts in (1, 5):
            got = {
                r["user_id"]: (r["n"], r["gini_milli"])
                for r in categorical_gini(
                    ray.data.from_pandas(df).repartition(parts),
                    "user_id", "event_type", num_buckets=2,
                ).take_all()
            }
            assert got == want


class TestStringLift:
    def test_string_items_lift(self):
        # docs: 'x y' together in 3 of 4 baskets; x alone in 1
        rows = []
        for d, toks in enumerate([["x", "y"], ["x", "y"], ["x", "y"], ["x", "z"]]):
            rows += [{"doc_id": d, "token": t} for t in toks]
        ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
        out = cooccur_lift(
            ds, "doc_id", "token", min_count=2, top_k=10,
            item_type=pa.string(), num_buckets=2,
        ).to_pandas().sort_values(["item_a", "item_b"]).reset_index(drop=True)
        xy = out[(out["item_a"] == "x") & (out["item_b"] == "y")].iloc[0]
        # lift = n_ab*N*1000 // (n_a*n_b) = 3*4*1000 // (4*3) = 1000
        assert xy["n_baskets"] == 3 and xy["lift_milli"] == 1000
