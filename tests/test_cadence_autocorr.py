"""Per-key autocorrelation sufficient sums and per-user cadence
profiles — planted fixtures with hand-computed integer expectations,
plus layout independence."""

from __future__ import annotations

import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.drift import autocorr_sums
from ai_knowledge_graph_ray.stages.sessions import cadence_profile


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


class TestAutocorrSums:
    def test_planted_series(self):
        # key "a": counts by bucket {0: 2, 1: 1, 3: 1}  (bucket 2 empty)
        df = pd.DataFrame(
            {
                "k": ["a"] * 4 + ["b"],
                "hour": [0, 0, 1, 3, 7],
            }
        )
        out = (
            autocorr_sums(_ds(df), "k", "hour")
            .to_pandas()
            .set_index("k")
        )
        a = out.loc["a"]
        # span 0..3 -> 4; total 4; sum_sq 4+1+1 = 6
        assert a["span"] == 4 and a["total"] == 4 and a["sum_sq"] == 6
        # dot_1: (b0,b1)=2*1=2 ; (b2 empty) ; (b2,b3) 0 -> 2
        # dot_2: (b1,b3)=1*1=1 ; dot_3: (b0,b3)=2*1=2
        assert a["dot_1"] == 2 and a["dot_2"] == 1 and a["dot_3"] == 2
        b = out.loc["b"]
        assert b["span"] == 1 and b["total"] == 1 and b["sum_sq"] == 1
        assert b["dot_1"] == 0 and b["dot_2"] == 0 and b["dot_3"] == 0

    def test_layout_independent(self):
        df = pd.DataFrame(
            {
                "k": ["x", "y"] * 50,
                "hour": [i % 7 for i in range(100)],
            }
        )
        one = autocorr_sums(_ds(df, 1), "k", "hour").to_pandas()
        many = autocorr_sums(_ds(df, 8), "k", "hour").to_pandas()
        key = lambda d: d.sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(key(one), key(many))


class TestCadenceProfile:
    def test_planted_gaps(self):
        # user 1: ts at 0s, 0s (dup), 2.5s, 10s  -> gaps [0, 2, 7] (floor)
        # user 2: single event -> min_gap -1
        us = 1_000_000
        df = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1, 2],
                "ts": pd.to_datetime(
                    [0, 0, int(2.5 * us), 10 * us, 5 * us], unit="us"
                ),
            }
        )
        out = cadence_profile(_ds(df)).to_pandas().set_index("user_id")
        u1 = out.loc[1]
        assert u1["n_events"] == 4 and u1["n_dup_ts"] == 1
        assert u1["min_gap_s"] == 0
        assert u1["sum_gap_s"] == 0 + 2 + 7
        assert u1["sum_gap_sq"] == 0 + 4 + 49
        u2 = out.loc[2]
        assert u2["n_events"] == 1 and u2["n_dup_ts"] == 0
        assert u2["min_gap_s"] == -1
        assert u2["sum_gap_s"] == 0 and u2["sum_gap_sq"] == 0

    def test_no_dups_min_positive(self):
        df = pd.DataFrame(
            {
                "user_id": [7, 7, 7],
                "ts": pd.to_datetime([0, 3_000_000, 9_000_000], unit="us"),
            }
        )
        out = cadence_profile(_ds(df, 2)).to_pandas().set_index("user_id")
        u = out.loc[7]
        assert u["n_dup_ts"] == 0 and u["min_gap_s"] == 3
        assert u["sum_gap_s"] == 9 and u["sum_gap_sq"] == 9 + 36

    def test_layout_independent(self):
        df = pd.DataFrame(
            {
                "user_id": [i % 5 for i in range(200)],
                "ts": pd.to_datetime(
                    [(i * 977_001) % 60_000_000 for i in range(200)], unit="us"
                ),
            }
        )
        one = cadence_profile(_ds(df, 1)).to_pandas()
        many = cadence_profile(_ds(df, 8)).to_pandas()
        key = lambda d: d.sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(key(one), key(many))
