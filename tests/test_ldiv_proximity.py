"""L-diversity audit and positional proximity search — planted
fixtures."""

from __future__ import annotations

import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.validate import l_diversity_report
from ai_knowledge_graph_ray.stages.vocab import proximity_search


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


class TestLDiversity:
    def test_monoculture_group_fails(self):
        df = pd.DataFrame(
            {
                "grp": ["a"] * 5 + ["b"] * 4,
                "sv": ["x"] * 5 + ["x", "y", "z", "x"],
            }
        )
        out = (
            l_diversity_report(_ds(df), ["grp"], "sv", l=2)
            .to_pandas()
            .set_index("grp")
        )
        a = out.loc["a"]
        assert a["n_rows"] == 5 and a["n_distinct_sensitive"] == 1
        assert not a["l_ok"]
        b = out.loc["b"]
        assert b["n_rows"] == 4 and b["n_distinct_sensitive"] == 3
        assert b["l_ok"]

    def test_layout_independent(self):
        df = pd.DataFrame(
            {
                "grp": [f"g{i % 4}" for i in range(100)],
                "sv": [f"v{i % 7}" for i in range(100)],
            }
        )
        key = lambda d: d.sort_values("grp").reset_index(drop=True)
        one = l_diversity_report(_ds(df, 1), ["grp"], "sv", l=3).to_pandas()
        many = l_diversity_report(_ds(df, 8), ["grp"], "sv", l=3).to_pandas()
        pd.testing.assert_frame_equal(key(one), key(many))


class TestProximity:
    def test_min_distance_and_window(self):
        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "hash x y join",                      # dist 3
                    "hash " + "w " * 50 + "join",         # dist 51 > 10
                    "join q hash p hash",                 # dist 2
                    "hash only here",                     # no join
                ],
            }
        )
        out = (
            proximity_search(_ds(df), "hash", "join", window=10)
            .to_pandas()
            .set_index("doc_id")
        )
        assert set(out.index) == {1, 3}
        assert out.loc[1]["min_dist"] == 3
        assert out.loc[3]["min_dist"] == 2

    def test_case_insensitive(self):
        df = pd.DataFrame({"doc_id": [1], "text": ["HASH Join"]})
        out = proximity_search(_ds(df, 1), "hash", "join", window=5).to_pandas()
        assert len(out) == 1 and out.iloc[0]["min_dist"] == 1
