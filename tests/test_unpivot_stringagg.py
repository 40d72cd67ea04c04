"""Planted-fixture tests for the melt/string_agg/crosscorr/calibration
batch: unpivot round trip, ordered list aggregation (layout
independence), lagged cross-correlation sums, reliability bins."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _frame(res) -> pd.DataFrame:
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    return res


class TestUnpivot:
    def test_round_trip(self):
        from ai_knowledge_graph_ray.stages.relational import pivot_counts, unpivot

        ev = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2, 2, 3],
                "event_type": ["view", "view", "click", "view", "error", "click"],
            }
        )
        ds = ray.data.from_pandas(ev).repartition(3)
        types = ["view", "click", "error"]
        wide = pivot_counts(ds, "user_id", "event_type", types, key_type=pa.int64())
        long = _frame(
            unpivot(
                wide, ["user_id"], [f"n_{t}" for t in types],
                var_name="event_type", value_name="n",
                var_labels={f"n_{t}": t for t in types}, drop_zero=True,
            )
        )
        got = {(r.user_id, r.event_type): r.n for r in long.itertuples()}
        assert got == {
            (1, "view"): 2, (1, "click"): 1,
            (2, "view"): 1, (2, "error"): 1,
            (3, "click"): 1,
        }

    def test_zero_cells_kept_when_not_dropped(self):
        from ai_knowledge_graph_ray.stages.relational import pivot_counts, unpivot

        ds = ray.data.from_pandas(
            pd.DataFrame({"user_id": [1], "event_type": ["view"]})
        )
        wide = pivot_counts(ds, "user_id", "event_type", ["view", "click"],
                            key_type=pa.int64())
        long = _frame(unpivot(wide, ["user_id"], ["n_view", "n_click"]))
        assert len(long) == 2  # explicit zero row for click survives


class TestGroupedStringAgg:
    def _orders(self):
        # deliberately out of order: the agg must sort per key
        return pd.DataFrame(
            {
                "k": [1, 2, 1, 1, 2],
                "d": pd.to_datetime(
                    ["2020-01-03", "2020-02-01", "2020-01-01", "2020-01-02",
                     "2020-01-15"]
                ).astype("datetime64[us]"),
                "tid": [10, 20, 11, 12, 21],
                "v": ["c", "z", "a", "b", "y"],
            }
        )

    def test_ordered_join(self):
        from ai_knowledge_graph_ray.stages.relational import grouped_string_agg

        out = _frame(
            grouped_string_agg(
                ray.data.from_pandas(self._orders()).repartition(4),
                ["k"], ["d", "tid"], "v",
                key_fields=[pa.field("k", pa.int64())], out_name="seq",
            )
        )
        got = dict(zip(out["k"], out["seq"]))
        assert got == {1: "a|b|c", 2: "y|z"}

    def test_layout_independent(self):
        from ai_knowledge_graph_ray.stages.relational import grouped_string_agg

        frames = []
        for parts in (1, 5):
            out = _frame(
                grouped_string_agg(
                    ray.data.from_pandas(self._orders()).repartition(parts),
                    ["k"], ["d", "tid"], "v",
                    key_fields=[pa.field("k", pa.int64())], out_name="seq",
                )
            ).sort_values("k").reset_index(drop=True)
            frames.append(out)
        pd.testing.assert_frame_equal(frames[0], frames[1])

    def test_tiebreak_column_orders_equal_dates(self):
        from ai_knowledge_graph_ray.stages.relational import grouped_string_agg

        df = pd.DataFrame(
            {
                "k": [1, 1],
                "d": pd.to_datetime(["2020-01-01", "2020-01-01"]).astype(
                    "datetime64[us]"
                ),
                "tid": [2, 1],
                "v": ["second", "first"],
            }
        )
        out = _frame(
            grouped_string_agg(
                ray.data.from_pandas(df), ["k"], ["d", "tid"], "v",
                key_fields=[pa.field("k", pa.int64())], out_name="seq",
            )
        )
        assert out["seq"].iloc[0] == "first|second"


class TestCrosscorr:
    def test_planted_lead_lag(self):
        from ai_knowledge_graph_ray.stages.drift import crosscorr_sums

        # view counts: hour 0 -> 2, hour 1 -> 1; click: hour 1 -> 3,
        # hour 2 -> 1. Hour 3 has only 'purchase' (excluded from h).
        rows = (
            [("view", 0)] * 2 + [("view", 1)] + [("click", 1)] * 3
            + [("click", 2)] + [("purchase", 3)]
        )
        df = pd.DataFrame(rows, columns=["event_type", "hour"])
        df["hour"] = df["hour"].astype("int64")
        out = _frame(
            crosscorr_sums(
                ray.data.from_pandas(df).repartition(3),
                "hour", "event_type", "view", "click", lags=(0, 1, 2),
            )
        ).set_index("lag")
        # h = {0: (2,0), 1: (1,3), 2: (0,1)}
        # lag 0: pairs (0,0),(1,1),(2,2) -> 2*0 + 1*3 + 0*1 = 3, n=3
        assert out.loc[0, "vc_sum"] == 3 and out.loc[0, "n_hours"] == 3
        # lag 1: (0,1),(1,2) -> 2*3 + 1*1 = 7, n=2
        assert out.loc[1, "vc_sum"] == 7 and out.loc[1, "n_hours"] == 2
        # lag 2: (0,2) -> 2*1 = 2, n=1
        assert out.loc[2, "vc_sum"] == 2 and out.loc[2, "n_hours"] == 1


class TestCalibrationBins:
    def test_planted_bins(self):
        from ai_knowledge_graph_ray.stages.text_analysis import calibration_bins

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    # 2 tokens, 1 en marker -> 1000//3 = 333 -> bin 3; en label
                    "the cat",
                    # 2 tokens, 0 markers -> 0 -> bin 0; und label (neg)
                    "zzz qqq",
                    # 1 token of de -> de label (neg), score 0 -> bin 0
                    "der",
                ],
            }
        )
        out = _frame(
            calibration_bins(ray.data.from_pandas(docs).repartition(2))
        ).set_index("bin")
        assert out.loc[3, "n_docs"] == 1
        assert out.loc[3, "n_pos"] == 1
        assert out.loc[3, "sum_score_pm"] == 333
        assert out.loc[0, "n_docs"] == 2
        assert out.loc[0, "n_pos"] == 0
        assert out.loc[0, "sum_score_pm"] == 0
