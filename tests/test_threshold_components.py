"""Threshold-sweep components: networkx pins per tau, monotonicity,
forced-gate (distributed) equivalence, duplicate-edge weight summing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import threshold_components


def _nx_counts(df: pd.DataFrame, taus):
    import networkx as nx

    und = (
        df.assign(
            a=np.minimum(df["src"].to_numpy(object), df["dst"].to_numpy(object)),
            b=np.maximum(df["src"].to_numpy(object), df["dst"].to_numpy(object)),
        )
        .query("a != b")
        .groupby(["a", "b"], as_index=False)["w"].sum()
    )
    nodes = sorted(set(und["a"]) | set(und["b"]))
    rows = []
    for tau in sorted(taus):
        g = nx.Graph()
        g.add_nodes_from(nodes)
        kept = und[und["w"] >= tau]
        g.add_edges_from(zip(kept["a"], kept["b"]))
        rows.append((tau, len(nodes), nx.number_connected_components(g)))
    return pd.DataFrame(rows, columns=["tau", "n_nodes", "n_components"]).astype(
        "int64"
    )


def _rand_edges(rng, n_edges, n_nodes, wmax):
    return pd.DataFrame(
        {
            "src": [f"n{x}" for x in rng.randint(0, n_nodes, n_edges)],
            "dst": [f"n{x}" for x in rng.randint(0, n_nodes, n_edges)],
            "w": rng.randint(1, wmax, n_edges).astype(np.int64),
        }
    )


class TestThresholdComponents:
    def test_matches_networkx(self):
        rng = np.random.RandomState(21)
        df = _rand_edges(rng, 200, 50, 6)
        taus = [1, 2, 4]
        got = threshold_components(
            ray.data.from_pandas(df), taus
        ).to_pandas().astype("int64")
        pd.testing.assert_frame_equal(got, _nx_counts(df, taus))
        # monotone non-decreasing in tau
        assert (np.diff(got["n_components"].to_numpy()) >= 0).all()

    def test_forced_gate_equivalence(self):
        rng = np.random.RandomState(22)
        df = _rand_edges(rng, 150, 35, 5)
        ds = ray.data.from_pandas(df).repartition(5)
        taus = [1, 3]
        fast = threshold_components(ds, taus).to_pandas().astype("int64")
        slow = threshold_components(
            ds, taus, driver_max_edges=0, num_buckets=3
        ).to_pandas().astype("int64")
        pd.testing.assert_frame_equal(fast, slow)

    def test_duplicate_edges_sum_weights(self):
        # (a,b,w=1) three times in both orientations -> summed weight 3
        df = pd.DataFrame(
            {"src": ["a", "b", "a"], "dst": ["b", "a", "b"], "w": [1, 1, 1]}
        )
        out = threshold_components(
            ray.data.from_pandas(df), [2, 3, 4]
        ).to_pandas().set_index("tau")
        assert out.loc[2, "n_components"] == 1  # 3 >= 2: one component
        assert out.loc[3, "n_components"] == 1
        assert out.loc[4, "n_components"] == 2  # edge dropped: 2 singletons

    def test_all_edges_dropped(self):
        df = pd.DataFrame({"src": ["a"], "dst": ["b"], "w": [1]})
        out = threshold_components(
            ray.data.from_pandas(df), [10]
        ).to_pandas().iloc[0]
        assert out["n_nodes"] == 2 and out["n_components"] == 2
