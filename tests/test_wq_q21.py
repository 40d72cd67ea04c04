"""Weighted quantiles (hand-computed mass cuts, gate raise) and the
Q21-shaped lone-late-supplier query on a planted fixture."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from ai_knowledge_graph_ray.stages.quantiles import weighted_quantiles


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


class TestWeightedQuantiles:
    def test_hand_mass_cuts(self):
        # values 1 (w 1), 10 (w 9), 100 (w 90): total 100
        # q250: cum(1)=1 <25, cum(10)=10 <25 -> 100?  10*1000=10000 < 250*100=25000
        # -> first value with cum*1000 >= q*total: 100 for q=.25? cum(10)=10,
        # 10*1000=10000 < 25000 -> yes 100. q=.05 -> 10 (cum 10*1000 >= 5*100*... )
        df = pd.DataFrame({"v": [1, 10, 100], "w": [1, 9, 90]})
        out = (
            weighted_quantiles(_ds(df), "v", "w", (50, 100, 250, 1000))
            .to_pandas()
            .set_index("q_milli")["value"]
        )
        assert out[50] == 10  # cum 10 * 1000 >= 50 * 100
        assert out[100] == 10
        assert out[250] == 100
        assert out[1000] == 100

    def test_duplicate_values_merge(self):
        df = pd.DataFrame({"v": [5, 5, 5, 7], "w": [1, 1, 1, 97]})
        out = (
            weighted_quantiles(_ds(df, 2), "v", "w", (30, 500))
            .to_pandas()
            .set_index("q_milli")["value"]
        )
        assert out[30] == 5  # cum(5)=3, 3*1000 >= 30*100
        assert out[500] == 7

    def test_layout_independent(self):
        df = pd.DataFrame({"v": list(range(50)) * 4, "w": [1] * 200})
        one = weighted_quantiles(_ds(df, 1), "v", "w").to_pandas()
        many = weighted_quantiles(_ds(df, 8), "v", "w").to_pandas()
        pd.testing.assert_frame_equal(
            one.sort_values("q_milli").reset_index(drop=True),
            many.sort_values("q_milli").reset_index(drop=True),
        )

    def test_gate_raises_loudly(self):
        df = pd.DataFrame({"v": range(100), "w": [1] * 100})
        with pytest.raises(ValueError, match="driver gate"):
            weighted_quantiles(_ds(df), "v", "w", (500,), driver_max_distinct=10)


class TestSupplierWaiting:
    def test_planted_lone_late(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ai_knowledge_graph_ray.pipelines.queries import q_supplier_waiting

        day_us = 86_400_000_000
        t0 = 1_600_000_000_000_000
        # order 1 (F): supp 1 late, supp 2 on time  -> counts for supp 1
        # order 2 (F): both supps late              -> excluded (nl=2)
        # order 3 (F): single supplier late         -> excluded (ns=1)
        # order 4 (O): supp 1 late but not finished -> excluded
        orders = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3, 4],
                "o_orderdate": pd.to_datetime([t0] * 4, unit="us"),
                "o_orderstatus": ["F", "F", "F", "O"],
            }
        )
        li = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2, 2, 3, 4, 4],
                "l_suppkey": [1, 2, 1, 2, 5, 1, 3],
                "l_shipdate": pd.to_datetime(
                    [
                        t0 + 120 * day_us,  # late
                        t0 + 10 * day_us,   # on time
                        t0 + 120 * day_us,  # late
                        t0 + 120 * day_us,  # late
                        t0 + 120 * day_us,  # late, lone supplier
                        t0 + 120 * day_us,  # late but order open
                        t0 + 5 * day_us,
                    ],
                    unit="us",
                ),
            }
        )
        pq.write_table(pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet"))
        pq.write_table(pa.Table.from_pandas(li), str(tmp_path / "lineitem.parquet"))
        out = q_supplier_waiting(str(tmp_path)).to_pandas()
        assert dict(zip(out["s_suppkey"], out["numwait"])) == {1: 1}
