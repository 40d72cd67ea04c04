"""Edge triangle support + k-truss: networkx pins, forced-gate
equivalence, zero-support inclusion, planted-clique peeling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    edge_support,
    k_truss,
    k_truss_local,
)


def _random_edges(seed=5, n_nodes=40, n_edges=160):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, n_edges)
    b = rng.randint(0, n_nodes, n_edges)
    return pd.DataFrame(
        {
            "src": [f"n{x}" for x in a],
            "dst": [f"n{x}" for x in b],
        }
    )


def _nx_graph(df):
    import networkx as nx

    g = nx.Graph()
    for s, o in zip(df["src"], df["dst"]):
        if s != o:
            g.add_edge(s, o)
    return g


class TestEdgeSupport:
    def test_matches_networkx_common_neighbors(self):
        df = _random_edges()
        g = _nx_graph(df)
        ds = ray.data.from_pandas(df).repartition(4)
        out = edge_support(ds).to_pandas()
        assert len(out) == g.number_of_edges()
        for _, row in out.iterrows():
            expect = len(set(g[row["a"]]) & set(g[row["b"]]))
            assert row["support"] == expect, (row["a"], row["b"])

    def test_zero_support_edges_included(self):
        # path graph: no triangles anywhere
        df = pd.DataFrame(
            {"src": ["a", "b", "c"], "dst": ["b", "c", "d"]}
        )
        out = edge_support(ray.data.from_pandas(df)).to_pandas()
        assert len(out) == 3
        assert (out["support"] == 0).all()

    def test_forced_gate_equivalence(self):
        df = _random_edges(seed=9)
        ds = ray.data.from_pandas(df).repartition(5)
        fast = (
            edge_support(ds)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        )
        slow = (
            edge_support(ds, driver_max_edges=0, driver_max_nodes=0)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, slow)


class TestKTruss:
    def test_matches_networkx(self):
        import networkx as nx

        df = _random_edges(seed=17, n_nodes=30, n_edges=140)
        g = _nx_graph(df)
        ds = ray.data.from_pandas(df)
        for k in (3, 4, 5):
            out = k_truss(ds, k).to_pandas()
            # empty Ray datasets drop their schema in to_pandas
            mine = set(zip(out["a"], out["b"])) if len(out) else set()
            theirs = {
                (min(u, v), max(u, v)) for u, v in nx.k_truss(g, k).edges()
            }
            assert mine == theirs, k

    def test_planted_clique_survives_pendants(self):
        # K5 clique + pendant chain: 5-truss keeps exactly the clique
        clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
        pendants = [("c0", "p1"), ("p1", "p2"), ("p2", "p3")]
        df = pd.DataFrame(clique + pendants, columns=["src", "dst"])
        out = k_truss(ray.data.from_pandas(df), 5).to_pandas()
        got = {(a, b) for a, b in zip(out["a"], out["b"])}
        assert got == {(min(a, b), max(a, b)) for a, b in clique}
        # inside K5 every edge sits in exactly 3 triangles
        assert (out["support"] == 3).all()

    def test_forced_gate_equivalence(self):
        # small on purpose: the forced-distributed peel (3 rounds of
        # 32->23->19 edges at seed 1) runs the full per-round shuffle
        # plan; a bigger fixture costs minutes at 4 CPUs for zero
        # extra coverage
        df = _random_edges(seed=1, n_nodes=12, n_edges=40)
        ds = ray.data.from_pandas(df).repartition(3)
        fast = (
            k_truss(ds, 4, num_buckets=2)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        )
        slow = (
            k_truss(
                ds, 4, driver_max_edges=0, driver_max_nodes=0, num_buckets=2
            )
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, slow)

    def test_local_twin_empty_and_bad_k(self):
        empty = pd.DataFrame({"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object)})
        assert len(k_truss_local(empty, 3, 1 << 62)) == 0
        with pytest.raises(ValueError):
            k_truss(ray.data.from_pandas(_random_edges()), 1)
