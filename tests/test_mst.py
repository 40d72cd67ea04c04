"""Boruvka minimum spanning forest: networkx pin on distinct weights,
Kruskal-twin equality on both gate paths, multigraph collapse, and
forest behavior on disconnected inputs."""

from __future__ import annotations

import networkx as nx
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    minimum_spanning_forest,
    mst_local,
)


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


def _rand_graph(n: int = 24, seed: int = 7) -> pd.DataFrame:
    import random

    rng = random.Random(seed)
    rows = []
    weights = rng.sample(range(1, 10_000), n * 3)
    i = 0
    for a in range(n):
        for _ in range(3):
            b = rng.randrange(n)
            if b == a:
                continue
            rows.append((f"n{a}", f"n{b}", weights[i]))
            i += 1
    return pd.DataFrame(rows, columns=["u", "v", "w"])


def _canon(df: pd.DataFrame) -> set[tuple[str, str, int]]:
    return {
        (min(u, v), max(u, v), int(w))
        for u, v, w in zip(df["u"], df["v"], df["w"])
    }


class TestMst:
    def test_networkx_pin_distinct_weights(self):
        df = _rand_graph()
        out = minimum_spanning_forest(_ds(df)).to_pandas()
        g = nx.Graph()
        for u, v, w in zip(df["u"], df["v"], df["w"]):
            # networkx keeps the LAST parallel edge; feed it the
            # pair-min like the operator computes
            key = (min(u, v), max(u, v))
            if not g.has_edge(*key) or g.edges[key]["weight"] > w:
                g.add_edge(*key, weight=int(w))
        want = nx.minimum_spanning_tree(g, algorithm="kruskal")
        assert _canon(out) == {
            (min(u, v), max(u, v), int(d["weight"]))
            for u, v, d in want.edges(data=True)
        }

    def test_forced_distributed_matches_driver(self):
        df = _rand_graph(seed=11)
        driver = minimum_spanning_forest(_ds(df)).to_pandas()
        dist = minimum_spanning_forest(
            _ds(df, 5), driver_max_edges=0
        ).to_pandas()
        assert _canon(driver) == _canon(dist)

    def test_forced_distributed_contraction(self):
        df = _rand_graph(n=12, seed=3)
        driver = minimum_spanning_forest(_ds(df)).to_pandas()
        dist = minimum_spanning_forest(
            _ds(df, 4), driver_max_edges=0, contraction_driver_max=0
        ).to_pandas()
        assert _canon(driver) == _canon(dist)

    def test_ties_match_kruskal_twin(self):
        # equal weights everywhere: comparator falls back to (u, v).
        # mst_local's contract is CANONICAL pairs (u < v) — feed it the
        # same canonical form the operator computes internally.
        df = pd.DataFrame(
            {
                "u": ["a", "a", "b", "c", "a"],
                "v": ["b", "c", "c", "d", "d"],
                "w": [5, 5, 5, 5, 5],
            }
        )
        dist = minimum_spanning_forest(_ds(df, 2), driver_max_edges=0).to_pandas()
        local = mst_local(df)
        assert _canon(dist) == _canon(local)

    def test_multigraph_keeps_cheapest(self):
        df = pd.DataFrame(
            {"u": ["a", "b", "a"], "v": ["b", "a", "b"], "w": [9, 2, 5]}
        )
        out = minimum_spanning_forest(_ds(df, 1)).to_pandas()
        assert _canon(out) == {("a", "b", 2)}

    def test_disconnected_forest(self):
        df = pd.DataFrame(
            {
                "u": ["a", "b", "x", "y"],
                "v": ["b", "c", "y", "z"],
                "w": [1, 2, 3, 4],
            }
        )
        out = minimum_spanning_forest(_ds(df, 2)).to_pandas()
        # 6 nodes, 2 components -> 4 forest edges (all of them here)
        assert len(out) == 4 and _canon(out) == _canon(df)

    def test_self_loops_dropped_empty_ok(self):
        df = pd.DataFrame({"u": ["a"], "v": ["a"], "w": [1]})
        out = minimum_spanning_forest(_ds(df, 1)).to_pandas()
        assert len(out) == 0
