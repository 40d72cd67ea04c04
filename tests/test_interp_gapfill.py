"""Linear-interpolation gap fill: hand-computed slopes (including the
negative-slope truncating-division case), exact rows, layout
independence."""

from __future__ import annotations

import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.sessions import interpolated_gapfill


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


def _counts(pairs) -> pd.DataFrame:
    # expand (key, hour, count) into raw rows
    rows = []
    for k, h, c in pairs:
        rows.extend([(k, h)] * c)
    return pd.DataFrame(rows, columns=["event_type", "hour"])


class TestInterpolatedGapfill:
    def test_rising_slope(self):
        # key a: hour 0 -> 2, hour 3 -> 8; gaps at 1, 2
        df = _counts([("a", 0, 2), ("a", 3, 8)])
        out = (
            interpolated_gapfill(_ds(df))
            .to_pandas()
            .sort_values("hour")
            .reset_index(drop=True)
        )
        assert list(out["hour"]) == [0, 1, 2, 3]
        assert list(out["n"]) == [2, 4, 6, 8]
        assert list(out["filled"]) == [False, True, True, False]

    def test_negative_slope_truncates_like_duckdb(self):
        # 8 at hour 0 -> 1 at hour 3: slope -7/3; interpolated:
        # h1: 8 + trunc(-7*1/3) = 8 - 2 = 6  (floor would give 5)
        # h2: 8 + trunc(-7*2/3) = 8 - 4 = 4
        df = _counts([("a", 0, 8), ("a", 3, 1)])
        out = (
            interpolated_gapfill(_ds(df, 2))
            .to_pandas()
            .sort_values("hour")
            .reset_index(drop=True)
        )
        assert list(out["n"]) == [8, 6, 4, 1]

    def test_multiple_keys_and_no_gap(self):
        df = _counts([("a", 5, 3), ("b", 1, 1), ("b", 2, 7)])
        out = interpolated_gapfill(_ds(df)).to_pandas()
        a = out[out["event_type"] == "a"]
        assert len(a) == 1 and a.iloc[0]["n"] == 3 and not a.iloc[0]["filled"]
        b = out[out["event_type"] == "b"].sort_values("hour")
        assert list(b["n"]) == [1, 7] and not b["filled"].any()

    def test_layout_independent(self):
        df = _counts(
            [("x", h, (h % 5) + 1) for h in range(0, 30, 3)]
            + [("y", h, 2) for h in range(0, 11, 5)]
        )
        key = lambda d: d.sort_values(["event_type", "hour"]).reset_index(drop=True)
        one = interpolated_gapfill(_ds(df, 1)).to_pandas()
        many = interpolated_gapfill(_ds(df, 8)).to_pandas()
        pd.testing.assert_frame_equal(key(one), key(many))
