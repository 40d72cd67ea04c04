"""Bipartite 2-coloring: networkx pins, odd-cycle condemnation,
forced-gate (distributed) equivalence, forced flag-join path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    bipartite_labels,
    bipartite_local,
)


def _mixed_graph():
    # two even cycles (bipartite), one odd cycle, one star, one path
    even1 = [("a0", "a1"), ("a1", "a2"), ("a2", "a3"), ("a3", "a0")]
    odd = [("b0", "b1"), ("b1", "b2"), ("b2", "b0")]
    star = [("h", f"l{i}") for i in range(5)]
    path = [("p0", "p1"), ("p1", "p2")]
    return pd.DataFrame(even1 + odd + star + path, columns=["src", "dst"])


class TestBipartite:
    def test_matches_networkx(self):
        import networkx as nx

        df = _mixed_graph()
        out = bipartite_labels(ray.data.from_pandas(df)).to_pandas()
        g = nx.Graph(list(zip(df["src"], df["dst"])))
        for comp_nodes in nx.connected_components(g):
            sub = g.subgraph(comp_nodes)
            label = min(comp_nodes)
            rows = out[out["component"] == label].set_index("entity")
            assert set(rows.index) == comp_nodes
            if nx.is_bipartite(sub):
                assert rows["is_bipartite"].all()
                # valid 2-coloring with root at side 0
                assert rows.loc[label, "side"] == 0
                for u, v in sub.edges():
                    assert rows.loc[u, "side"] != rows.loc[v, "side"]
            else:
                assert (~rows["is_bipartite"]).all()
                assert (rows["side"] == -1).all()

    def test_forced_gate_equivalence(self):
        rng = np.random.RandomState(4)
        a = rng.randint(0, 30, 120)
        b = rng.randint(0, 30, 120)
        df = pd.DataFrame(
            {"src": [f"n{x:02d}" for x in a], "dst": [f"n{x:02d}" for x in b]}
        )
        ds = ray.data.from_pandas(df).repartition(5)
        fast = (
            bipartite_labels(ds)
            .to_pandas().sort_values("entity").reset_index(drop=True)
        )
        slow = (
            bipartite_labels(
                ds, driver_max_edges=0, num_buckets=3
            )
            .to_pandas().sort_values("entity").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, slow)
        # and the flag-JOIN path (broadcast gate forced shut) too
        joiny = (
            bipartite_labels(
                ds, driver_max_edges=0, flag_broadcast_max=0, num_buckets=3
            )
            .to_pandas().sort_values("entity").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, joiny)

    def test_local_twin_deterministic_coloring(self):
        # coloring must not depend on edge order
        df = _mixed_graph()
        a = bipartite_local(
            df.rename(columns={"src": "a", "dst": "b"})
        )
        flipped = df.iloc[::-1].reset_index(drop=True)
        b = bipartite_local(
            flipped.rename(columns={"src": "a", "dst": "b"})
        )
        pd.testing.assert_frame_equal(a, b)
