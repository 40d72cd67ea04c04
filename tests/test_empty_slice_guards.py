"""Empty-input guards flagged by the round-3 advisor (ADVICE.md):

1. q_orders_seasonal_index — total == 0 crashed (.astype on int 0).
2. hll_rollup._partial — empty batch emitted an untyped empty frame,
   breaking Arrow schema unification in bucketed_reduce.
3. crosscorr_sums — 0 rows vs the SQL twin's one zero row per lag.
4. unpivot — hard-coded object/int64 empty-frame dtypes vs real dtypes.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def _to_pdf(out):
    if isinstance(out, pd.DataFrame):
        return out
    if isinstance(out, pa.Table):
        return out.to_pandas()
    return out.to_pandas()


class TestSeasonalIndexEmpty:
    def test_zero_total_returns_empty_not_crash(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_orders_seasonal_index

        pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "o_totalprice": pd.Series([], dtype="float64"),
            }
        ).to_parquet(tmp_path / "orders.parquet")
        out = _to_pdf(q_orders_seasonal_index(str(tmp_path)))
        assert len(out) == 0
        assert "seasonal_bps" in out.columns

    def test_zero_priced_orders(self, tmp_path):
        # non-empty table whose revenue sums to zero: rows exist but
        # the index must be all-zero, not a crash
        from ai_knowledge_graph_ray.pipelines.queries import q_orders_seasonal_index

        pd.DataFrame(
            {
                "o_orderkey": [1, 2],
                "o_orderdate": pd.to_datetime(["2024-01-05", "2024-02-07"]),
                "o_totalprice": [0.0, 0.0],
            }
        ).to_parquet(tmp_path / "orders.parquet")
        out = _to_pdf(q_orders_seasonal_index(str(tmp_path)))
        assert len(out) == 2
        assert (out["seasonal_bps"] == 0).all()
        assert out["seasonal_bps"].dtype == np.int64


class TestHllRollupEmptyBlocks:
    def test_mixed_empty_and_full_blocks(self):
        from ai_knowledge_graph_ray.stages.sketches import hll_rollup

        full = pd.DataFrame(
            {"day": ["d1"] * 50 + ["d2"] * 50, "uid": np.arange(100, dtype=np.int64)}
        )
        empty = full.iloc[:0]
        ds = ray.data.from_pandas([empty, full, empty.copy()])
        out = _to_pdf(hll_rollup(ds, "uid", [["day"], []]).to_pandas().pipe(lambda x: x))
        # two day rows + one global row, all estimated from 100 distinct
        assert len(out) == 3
        glob = out[out["level"] == ""] if "level" in out.columns else out
        assert (out["approx_distinct"] > 0).all()

    def test_all_empty_blocks(self):
        from ai_knowledge_graph_ray.stages.sketches import hll_rollup

        empty = pd.DataFrame(
            {"day": pd.Series([], dtype="object"), "uid": pd.Series([], dtype="int64")}
        )
        ds = ray.data.from_pandas([empty, empty.copy()])
        out = _to_pdf(hll_rollup(ds, "uid", [["day"], []]))
        # no day keys; the global level still rolls up to an estimate of 0
        assert (out["approx_distinct"] == 0).all()


class TestCrosscorrEmptySlice:
    def test_no_matching_types_emits_zero_row_per_lag(self):
        from ai_knowledge_graph_ray.stages.drift import crosscorr_sums

        df = pd.DataFrame(
            {
                "hour": pd.Series([1, 2, 3], dtype="int64"),
                "etype": ["other", "other", "other"],
            }
        )
        ds = ray.data.from_pandas(df)
        out = _to_pdf(
            crosscorr_sums(ds, "hour", "etype", "click", "purchase", lags=(0, 1, 2))
        ).sort_values("lag").reset_index(drop=True)
        assert list(out["lag"]) == [0, 1, 2]
        assert (out["vc_sum"] == 0).all()
        assert (out["n_hours"] == 0).all()


class TestUnpivotEmptyBlockDtypes:
    def test_mixed_blocks_unify(self):
        from ai_knowledge_graph_ray.stages.relational import unpivot

        full = pd.DataFrame(
            {
                "user_id": pd.Series([10, 11], dtype="int64"),
                "n_click": pd.Series([3, 0], dtype="int64"),
                "n_view": pd.Series([1, 2], dtype="int64"),
            }
        )
        empty = full.iloc[:0]
        ds = ray.data.from_pandas([empty, full, empty.copy()])
        out = _to_pdf(
            unpivot(ds, ["user_id"], ["n_click", "n_view"])
        ).sort_values(["user_id", "variable"]).reset_index(drop=True)
        assert len(out) == 4
        # int64 id column must survive the empty blocks un-coerced
        assert out["user_id"].dtype == np.int64
        assert out["value"].dtype == np.int64
