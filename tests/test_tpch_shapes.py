"""Planted-fixture tests for the TPC-H-shaped relational queries
added alongside Q3/Q5/Q7/Q17/Q21: Q4 (EXISTS semi-join), Q12
(conditional counts over a join), Q13 (left-join count distribution
with the zero group), Q14 (promo revenue share in integer bps), Q22
(scalar-threshold + anti-join). Every expectation below is
hand-computed from the fixture."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name: str, df: pd.DataFrame) -> None:
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / f"{name}.parquet"))


@pytest.fixture()
def tpch_dir(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5],
            "o_custkey": [1, 1, 2, 3, 2],
            "o_orderdate": pd.to_datetime(
                ["1996-07-10", "1996-08-01", "1995-01-01", "1996-09-30", "1996-07-20"]
            ).astype("datetime64[us]"),
            "o_orderpriority": [
                "1-URGENT", "3-MEDIUM", "2-HIGH", "4-NOT SPECIFIED", "1-URGENT",
            ],
            "o_totalprice": [100.50, 200.00, 300.25, 415.75, 500.00],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3, 5, 4, 4, 1],
            "l_partkey": [1, 2, 1, 2, 1, 2, 2],
            "l_returnflag": ["A", "R", "A", "R", "A", "N", "N"],
            "l_shipdate": pd.to_datetime(
                [
                    "1996-07-15", "1996-07-20", "1997-03-01", "1997-06-01",
                    "1997-09-15", "1996-09-30", "1997-09-20",
                ]
            ).astype("datetime64[us]"),
            "l_extendedprice": [10.0, 20.0, 30.0, 40.0, 50.0, 5.0, 10.0],
            "l_discount": [0.10, 0.00, 0.05, 0.20, 0.10, 0.00, 0.00],
            "l_quantity": [10.0, 20.0, 30.0, 40.0, 150.0, 60.0, 5.0],
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4],
            "c_name": ["Cust1", "Cust2", "Cust3", "Cust4"],
            "c_nationkey": [10, 10, 20, 20],
            "c_acctbal": [100.00, 900.00, 800.00, -50.00],
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": [1, 2],
            "p_type": ["PROMO", "STANDARD"],
            "p_brand": ["Brand#13", "Brand#19"],
            "p_size": [5, 15],
        }
    )
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", lineitem)
    _write(tmp_path, "customer", customer)
    _write(tmp_path, "part", part)
    return str(tmp_path)


def _frame(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


class TestOrderPriorityCheck:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import q_order_priority_check

        # In-window orders: 1, 2, 4, 5. Order 1 ships 07-15 > 07-10
        # (exists), order 2 ships 07-20 < 08-01 (no), order 4's max
        # ship 1997-09-15 > 09-30 (exists; the equal-date 09-30 line
        # alone would NOT count), order 5 ships 1997 (exists).
        out = _frame(q_order_priority_check(tpch_dir))
        got = dict(zip(out["o_orderpriority"], out["order_count"]))
        assert got == {"1-URGENT": 2, "4-NOT SPECIFIED": 1}


class TestLinePriorityModes:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import q_line_priority_modes

        # 1997-shipped lines: order3/A (2-HIGH -> high), order5/R
        # (URGENT -> high), order4/A (NOT SPECIFIED -> low),
        # order1/N (URGENT -> high).
        out = _frame(q_line_priority_modes(tpch_dir)).set_index("l_returnflag")
        assert out.loc["A", "high_line_count"] == 1
        assert out.loc["A", "low_line_count"] == 1
        assert out.loc["R", "high_line_count"] == 1
        assert out.loc["R", "low_line_count"] == 0
        assert out.loc["N", "high_line_count"] == 1
        assert out.loc["N", "low_line_count"] == 0


class TestCustomerOrderDistribution:
    def test_planted_with_zero_group(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import (
            q_customer_order_distribution,
        )

        # Qualifying orders (priority <> 4-NOT SPECIFIED): cust1 has
        # 2, cust2 has 2, cust3's only order is excluded -> 0, cust4
        # never ordered -> 0.
        out = _frame(q_customer_order_distribution(tpch_dir))
        got = dict(zip(out["c_count"], out["custdist"]))
        assert got == {2: 2, 0: 2}

    def test_no_zero_row_when_all_ordered(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import (
            q_customer_order_distribution,
        )

        _write(
            tmp_path,
            "orders",
            pd.DataFrame(
                {"o_custkey": [7, 7, 8], "o_orderpriority": ["1-URGENT"] * 3}
            ),
        )
        _write(tmp_path, "customer", pd.DataFrame({"c_custkey": [7, 8]}))
        out = _frame(q_customer_order_distribution(str(tmp_path)))
        got = dict(zip(out["c_count"], out["custdist"]))
        assert got == {2: 1, 1: 1}


class TestPromoRevenue:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import q_promo_revenue

        # Sept-1997 lines: order4/part1 (PROMO) 5000c x (100-10) =
        # 450000; order1/part2 (STANDARD) 1000c x 100 = 100000.
        out = _frame(q_promo_revenue(tpch_dir)).iloc[0]
        assert out["promo_revenue_e4"] == 450000
        assert out["total_revenue_e4"] == 550000
        assert out["promo_bps"] == (450000 * 10000) // 550000


class TestLargeVolumeOrders:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import q_large_volume_orders

        # Per-order quantity sums: o1=15, o2=20, o3=30, o4=150+60=210,
        # o5=40 -> only order 4 (cust3) clears the >200 HAVING.
        out = _frame(q_large_volume_orders(tpch_dir))
        assert len(out) == 1
        row = out.iloc[0]
        assert row["c_name"] == "Cust3"
        assert row["o_orderkey"] == 4
        assert row["sum_qty"] == 210
        assert row["total_cents"] == 41575


class TestBrandedRevenue:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import q_branded_revenue

        # Branch 1 (Brand#13, size 5, qty 1-11): line0 qty10 ->
        # 1000c x 90 = 90000. Branch 2 (Brand#19, size 15, qty
        # 10-20): line1 qty20 -> 2000c x 100 = 200000. No other line
        # satisfies any branch.
        out = _frame(q_branded_revenue(tpch_dir)).iloc[0]
        assert out["revenue_e4"] == 290000
        assert out["n_rows"] == 2


class TestWealthyInactiveCustomers:
    def test_planted(self, tpch_dir):
        from ai_knowledge_graph_ray.pipelines.queries import (
            q_wealthy_inactive_customers,
        )

        # Positive balances 100/900/800 -> avg 600; rich = cust2,
        # cust3. URGENT orders belong to cust1 and cust2 -> only
        # cust3 (nation 20, 800.00) survives the anti-join.
        out = _frame(q_wealthy_inactive_customers(tpch_dir))
        assert len(out) == 1
        row = out.iloc[0]
        assert row["c_nationkey"] == 20
        assert row["numcust"] == 1
        assert row["totacctbal_cents"] == 80000


class TestTopSupplierRevenue:
    def test_planted_tie(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_top_supplier_revenue

        li = pd.DataFrame(
            {
                "l_suppkey": [1, 1, 2, 3],
                "l_shipdate": pd.to_datetime(
                    ["1997-02-01", "1997-03-01", "1997-02-15", "1995-01-01"]
                ).astype("datetime64[us]"),
                "l_extendedprice": [10.0, 10.0, 20.0, 999.0],
                "l_discount": [0.0, 0.0, 0.0, 0.0],
            }
        )
        _write(tmp_path, "lineitem", li)
        out = _frame(q_top_supplier_revenue(str(tmp_path)))
        # suppliers 1 and 2 tie at 200000 e4; supplier 3 out of window
        got = set(zip(out["s_suppkey"], out["revenue_e4"]))
        assert got == {(1, 200000), (2, 200000)}


class TestReturnedItemCustomers:
    def test_planted(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import (
            q_returned_item_customers,
        )

        _write(
            tmp_path,
            "lineitem",
            pd.DataFrame(
                {
                    "l_orderkey": [1, 1, 2, 3],
                    "l_returnflag": ["R", "N", "R", "R"],
                    "l_extendedprice": [10.0, 99.0, 20.0, 30.0],
                    "l_discount": [0.0, 0.0, 0.5, 0.0],
                }
            ),
        )
        _write(
            tmp_path,
            "orders",
            pd.DataFrame(
                {
                    "o_orderkey": [1, 2, 3],
                    "o_custkey": [7, 7, 8],
                    "o_orderdate": pd.to_datetime(
                        ["1997-02-01", "1997-03-01", "1996-01-01"]
                    ).astype("datetime64[us]"),
                }
            ),
        )
        _write(
            tmp_path,
            "customer",
            pd.DataFrame(
                {
                    "c_custkey": [7, 8],
                    "c_name": ["CustA", "CustB"],
                    "c_acctbal": [12.34, 1.00],
                }
            ),
        )
        out = _frame(q_returned_item_customers(str(tmp_path)))
        # order 3 outside window; cust7: R-lines 10.0@0 + 20.0@50% ->
        # 100000 + 2000*50 = 200000 e4
        assert len(out) == 1
        row = out.iloc[0]
        assert row["c_custkey"] == 7
        assert row["revenue_e4"] == 100000 + 2000 * 50
        assert row["acctbal_cents"] == 1234
