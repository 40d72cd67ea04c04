"""Double-sweep diameter bound and grouped reciprocal-rank fusion."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import double_sweep_bounds
from ai_knowledge_graph_ray.stages.retrieval import rrf_fuse_grouped


class TestDoubleSweep:
    def test_path_graph_exact_diameter(self):
        # path a0-a1-...-a6: double sweep finds the true diameter 6
        df = pd.DataFrame(
            {"src": [f"a{i}" for i in range(6)],
             "dst": [f"a{i+1}" for i in range(6)]}
        )
        row = double_sweep_bounds(ray.data.from_pandas(df)).to_pandas().iloc[0]
        assert row["start"] == "a0"
        assert row["ecc1"] == 6 and row["far1"] == "a6"
        assert row["ecc2"] == 6 and row["far2"] == "a0"

    def test_lower_bound_vs_networkx(self):
        import networkx as nx

        rng = np.random.RandomState(31)
        a = rng.randint(0, 25, 60)
        b = rng.randint(0, 25, 60)
        df = pd.DataFrame(
            {"src": [f"n{x:02d}" for x in a], "dst": [f"n{x:02d}" for x in b]}
        )
        row = double_sweep_bounds(ray.data.from_pandas(df)).to_pandas().iloc[0]
        g = nx.Graph(list(zip(df["src"], df["dst"])))
        g.remove_edges_from(nx.selfloop_edges(g))
        start = min(g.nodes)
        comp = nx.node_connected_component(g, start)
        diam = nx.diameter(g.subgraph(comp))
        assert row["ecc2"] <= diam
        # ecc1 is exactly start's eccentricity within its component
        assert row["ecc1"] == nx.eccentricity(g.subgraph(comp), v=start)

    def test_forced_gate_equivalence_tiny(self):
        # distributed path (gate shut) must match the driver twin;
        # tiny graph + small horizon keeps the frontier loop short
        df = pd.DataFrame(
            {"src": ["a", "b", "c", "c"], "dst": ["b", "c", "d", "e"]}
        )
        ds = ray.data.from_pandas(df).repartition(2)
        fast = double_sweep_bounds(ds, max_hops=5).to_pandas()
        slow = double_sweep_bounds(
            ds, max_hops=5, driver_max_edges=0, num_buckets=2
        ).to_pandas()
        pd.testing.assert_frame_equal(fast, slow)

    def test_empty(self):
        df = pd.DataFrame({"src": pd.Series([], dtype=object),
                           "dst": pd.Series([], dtype=object)})
        assert double_sweep_bounds(ray.data.from_pandas(df)).count() == 0


def _rrf_brute(df, k=60, scale=1_000_000, topk=3):
    out = []
    for cust, g in df.groupby("cust"):
        ra = g.sort_values(["pa", "item"], ascending=[False, True]).reset_index()
        rb = g.sort_values(["pb", "item"], ascending=[False, True]).reset_index()
        rka = {r["item"]: i + 1 for i, r in ra.iterrows()}
        rkb = {r["item"]: i + 1 for i, r in rb.iterrows()}
        rows = [
            (cust, it, scale // (k + rka[it]) + scale // (k + rkb[it]))
            for it in g["item"]
        ]
        rows.sort(key=lambda t: (-t[2], t[1]))
        out.extend(rows[:topk])
    return (
        pd.DataFrame(out, columns=["cust", "item", "rrf_scaled"])
        .sort_values(["cust", "item"]).reset_index(drop=True)
    )


class TestRrfFusion:
    def test_matches_bruteforce_any_layout(self):
        rng = np.random.RandomState(17)
        n = 400
        df = pd.DataFrame(
            {
                "cust": [f"c{x}" for x in rng.randint(0, 40, n)],
                "item": [f"i{j:03d}" for j in range(n)],
                "pa": rng.randint(0, 50, n).astype(np.int64),  # heavy ties
                "pb": rng.randint(0, 50, n).astype(np.int64),
            }
        )
        want = _rrf_brute(df)
        for parts in (1, 6):
            got = (
                rrf_fuse_grouped(
                    ray.data.from_pandas(df).repartition(parts),
                    "cust", "item",
                    order_a=(["pa", "item"], [False, True]),
                    order_b=(["pb", "item"], [False, True]),
                )
                .to_pandas().sort_values(["cust", "item"]).reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, want)

    def test_agreeing_rankings_keep_order(self):
        df = pd.DataFrame(
            {"cust": ["u"] * 4, "item": list("abcd"),
             "pa": [4, 3, 2, 1], "pb": [40, 30, 20, 10]}
        )
        got = rrf_fuse_grouped(
            ray.data.from_pandas(df), "cust", "item",
            order_a=(["pa"], [False]), order_b=(["pb"], [False]), topk=4,
        ).to_pandas().sort_values("rrf_scaled", ascending=False)
        assert got["item"].tolist() == list("abcd")
