"""Planted-fixture tests for the fourth TPC-H shape batch: Q8
(market share in integer bps), Q9 (profit by supplier nation x order
year), Q16 (distinct-supplier counts with the NOT-IN side), Q20
(majority-share supplier semi-join). Every expectation below is
hand-computed from the fixture."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name: str, df: pd.DataFrame) -> None:
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / f"{name}.parquet"))


@pytest.fixture()
def tpch_dir(tmp_path):
    _write(tmp_path, "region", pd.DataFrame(
        {"r_regionkey": [0, 2], "r_name": ["AFRICA", "ASIA"]}
    ))
    _write(tmp_path, "nation", pd.DataFrame(
        {
            "n_nationkey": [0, 2, 7],
            "n_name": ["NATION_0", "NATION_2", "NATION_7"],
            "n_regionkey": [0, 2, 2],
        }
    ))
    _write(tmp_path, "supplier", pd.DataFrame(
        {
            "s_suppkey": [1, 2, 3],
            "s_name": ["S1", "S2", "S3"],
            "s_nationkey": [2, 7, 0],
            "s_acctbal": [10.0, -5.0, 3.0],
        }
    ))
    _write(tmp_path, "customer", pd.DataFrame(
        {"c_custkey": [1, 2], "c_nationkey": [2, 0]}
    ))
    _write(tmp_path, "part", pd.DataFrame(
        {
            "p_partkey": [1, 2, 3],
            "p_name": ["blue rod", "cold widget", "blue bolt"],
            "p_brand": ["Brand#19", "Brand#13", "Brand#5"],
            "p_type": ["PROMO", "ECONOMY", "LARGE"],
            "p_size": [5, 9, 7],
        }
    ))
    _write(tmp_path, "orders", pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [1, 1, 2, 1],
            "o_orderdate": pd.to_datetime(
                ["1996-05-01", "1997-02-01", "1996-06-01", "1995-01-01"]
            ).astype("datetime64[us]"),
        }
    ))
    _write(tmp_path, "lineitem", pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3, 4],
            "l_partkey": [1, 3, 2, 1, 1],
            "l_suppkey": [1, 3, 1, 1, 2],
            "l_quantity": [10.0, 5.0, 7.0, 20.0, 9.0],
            "l_extendedprice": [100.0, 50.0, 70.0, 10.0, 30.0],
            "l_discount": [0.0, 0.10, 0.0, 0.0, 0.0],
            "l_shipdate": pd.to_datetime(
                ["1997-03-01", "1996-05-05", "1997-04-01", "1997-05-01", "1997-06-01"]
            ).astype("datetime64[us]"),
        }
    ))
    return str(tmp_path)


def _frame(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


class TestMarketShare:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import q_nation_market_share

        # ASIA customers = c1; in-window orders o1 (1996), o2 (1997).
        # o1: L1 rev 1_000_000 e4 via s1 (NATION_2) + L2 rev 450_000
        # via s3 (NATION_0); o2: L3 rev 700_000 via s1.
        out = _frame(q_nation_market_share(tpch_dir)).set_index("o_year")
        assert out.loc[1996, "rev_all_e4"] == 1_450_000
        assert out.loc[1996, "rev_x_e4"] == 1_000_000
        assert out.loc[1996, "share_bps"] == 1_000_000 * 10000 // 1_450_000
        assert out.loc[1997, "rev_all_e4"] == 700_000
        assert out.loc[1997, "share_bps"] == 10000


class TestPartProfit:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import q_nation_part_profit

        # Blue parts p1/p3. L1 (s1=NATION_2, o1 1996): 1_000_000;
        # L4 (s1, o3 1996): 100_000; L2 (s3=NATION_0, 1996): 450_000;
        # L5 (s2=NATION_7, o4 1995): 300_000. L3 is not blue.
        out = _frame(q_nation_part_profit(tpch_dir))
        got = {
            (r.n_name, r.o_year): r.profit_e4 for r in out.itertuples()
        }
        assert got == {
            ("NATION_2", 1996): 1_100_000,
            ("NATION_0", 1996): 450_000,
            ("NATION_7", 1995): 300_000,
        }


class TestPartSupplierCounts:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import q_part_supplier_counts

        # Brand#13 part p2 excluded; negative-balance supplier s2
        # excluded (drops the (p1, s2) pair from L5). Surviving
        # distinct pairs: (p1, s1) x2 lines -> 1 supplier, (p3, s3).
        out = _frame(q_part_supplier_counts(tpch_dir))
        got = {
            (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
            for r in out.itertuples()
        }
        assert got == {("Brand#19", "PROMO", 5): 1, ("Brand#5", "LARGE", 7): 1}


class TestDominantSuppliers:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import q_dominant_suppliers

        # 1997 shipments only (L2 is 1996). Part 1: s1 ships 30 of 39
        # (majority), s2 ships 9 (not). Part 2: s1 ships all 7.
        out = _frame(q_dominant_suppliers(tpch_dir))
        got = dict(zip(out["s_suppkey"], out["n_parts"]))
        assert got == {1: 2}

    def test_exact_half_not_dominant(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_dominant_suppliers

        # 50/50 split: neither supplier holds a strict majority.
        _write(tmp_path, "lineitem", pd.DataFrame(
            {
                "l_orderkey": [1, 2],
                "l_partkey": [1, 1],
                "l_suppkey": [1, 2],
                "l_quantity": [10.0, 10.0],
                "l_extendedprice": [1.0, 1.0],
                "l_discount": [0.0, 0.0],
                "l_shipdate": pd.to_datetime(
                    ["1997-03-01", "1997-04-01"]
                ).astype("datetime64[us]"),
            }
        ))
        out = _frame(q_dominant_suppliers(str(tmp_path)))
        assert len(out) == 0


class TestMinCostSupplier:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import q_part_min_cost_supplier

        # No EUROPE region in the base fixture -> empty result.
        out = _frame(q_part_min_cost_supplier(tpch_dir))
        assert len(out) == 0

    def test_argmin_tie_breaks_to_smallest_suppkey(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_part_min_cost_supplier

        _write(tmp_path, "region", pd.DataFrame(
            {"r_regionkey": [0], "r_name": ["EUROPE"]}
        ))
        _write(tmp_path, "nation", pd.DataFrame(
            {"n_nationkey": [0], "n_name": ["NATION_0"], "n_regionkey": [0]}
        ))
        _write(tmp_path, "supplier", pd.DataFrame(
            {"s_suppkey": [1, 2, 3], "s_nationkey": [0, 0, 0]}
        ))
        _write(tmp_path, "part", pd.DataFrame(
            {"p_partkey": [1, 2], "p_type": ["LARGE", "SMALL"]}
        ))
        # part 1: suppliers 2 and 3 tie at min price 5.00; supplier 1
        # ships at 9.00. part 2 is not LARGE -> excluded.
        _write(tmp_path, "lineitem", pd.DataFrame(
            {
                "l_partkey": [1, 1, 1, 2],
                "l_suppkey": [1, 3, 2, 1],
                "l_extendedprice": [9.0, 5.0, 5.0, 1.0],
            }
        ))
        out = _frame(q_part_min_cost_supplier(str(tmp_path)))
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["p_partkey"], r["s_suppkey"], r["min_price_cents"]) == (1, 2, 500)


class TestForecastRevenue:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import q_forecast_revenue

        # fixture discounts are 0 or 10% -> nothing in [5, 7] -> zeros
        out = _frame(q_forecast_revenue(tpch_dir))
        assert out["revenue_e4"].iloc[0] == 0 and out["n_rows"].iloc[0] == 0

    def test_predicate_window(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_forecast_revenue

        _write(tmp_path, "lineitem", pd.DataFrame(
            {
                "l_shipdate": pd.to_datetime(
                    ["1997-06-01", "1997-06-02", "1996-06-01", "1997-06-03"]
                ).astype("datetime64[us]"),
                "l_discount": [0.06, 0.04, 0.06, 0.07],
                "l_quantity": [10.0, 10.0, 10.0, 50.0],
                "l_extendedprice": [100.0, 100.0, 100.0, 100.0],
            }
        ))
        # only row 1 passes (row 2: disc 4%, row 3: 1996, row 4: qty 50)
        out = _frame(q_forecast_revenue(str(tmp_path)))
        assert out["revenue_e4"].iloc[0] == 10000 * 6
        assert out["n_rows"].iloc[0] == 1


class TestImportantParts:
    def test_global_threshold(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_important_parts

        # values: p1 = 10*100c*qty1 ... craft: p1 value 9000, p2..p10
        # value 1000 each -> total 18000; threshold value*1250 > total
        # -> value > 14.4 -> all pass; tighten: p1 = 99 units of 1.00,
        # p2 = 1 unit of 1.00 -> total 10000; p2: 100*1250 = 125000 >
        # 10000 passes too. Use many small parts: p1 qty 99, parts
        # 2..101 qty 1 at price 0.01 each.
        rows = [(1, 99.0, 1.0)] + [(i, 1.0, 0.01) for i in range(2, 102)]
        df = pd.DataFrame(rows, columns=["l_partkey", "l_quantity", "l_extendedprice"])
        _write(tmp_path, "lineitem", df)
        # values: p1 = 99*100 = 9900; others = 1*1 = 1 -> total 10000.
        # threshold: v*1250 > 10000 -> v > 8 -> only p1.
        out = _frame(q_important_parts(str(tmp_path)))
        assert len(out) == 1
        assert out["p_partkey"].iloc[0] == 1 and out["value_e2"].iloc[0] == 9900

    def test_empty_result_keeps_schema(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_important_parts

        # 2000 equal parts -> every share is exactly 1/2000 = 0.05%
        # < 0.08% -> empty, but the schema must survive
        df = pd.DataFrame(
            {
                "l_partkey": np.arange(2000, dtype=np.int64),
                "l_quantity": np.ones(2000),
                "l_extendedprice": np.ones(2000),
            }
        )
        _write(tmp_path, "lineitem", df)
        out = _frame(q_important_parts(str(tmp_path)))
        assert len(out) == 0
        assert list(out.columns) == ["p_partkey", "value_e2"]
