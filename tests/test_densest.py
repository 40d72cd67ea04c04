"""Densest-subgraph batched greedy peel: planted-clique recovery,
density optimality on hand graphs, forced-gate equality."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    densest_subgraph,
    densest_subgraph_local,
)


def _ds(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.string()),
                "dst": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def _und(pairs):
    return pd.DataFrame({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})


class TestLocal:
    def test_planted_clique_recovered(self):
        rng = np.random.default_rng(3)
        clique = [f"c{i}" for i in range(8)]
        pairs = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
        pairs += [
            (f"r{int(rng.integers(0, 60))}", f"r{int(rng.integers(0, 60))}")
            for _ in range(70)
        ]
        nodes, m, n = densest_subgraph_local(_und(pairs))
        assert set(clique) <= set(nodes)
        # density at least the clique's (within the 2(1+eps) bound it
        # must be >= half of the optimum; here it finds >= clique/2)
        assert m * 8 >= (28 // 2) * n

    def test_single_edge(self):
        nodes, m, n = densest_subgraph_local(_und([("a", "b")]))
        assert set(nodes) == {"a", "b"} and (m, n) == (1, 2)

    def test_self_loops_ignored(self):
        nodes, m, n = densest_subgraph_local(_und([("a", "a"), ("a", "b")]))
        assert set(nodes) == {"a", "b"} and m == 1


class TestDistributedGate:
    def test_forced_gate_equivalence(self):
        rng = np.random.default_rng(11)
        clique = [f"k{i}" for i in range(6)]
        pairs = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
        pairs += [
            (f"z{int(rng.integers(0, 40))}", f"z{int(rng.integers(0, 40))}")
            for _ in range(60)
        ]
        drv = sorted(densest_subgraph(_ds(pairs)).to_pandas()["node"])
        dist = sorted(
            densest_subgraph(_ds(pairs), driver_max_edges=0).to_pandas()["node"]
        )
        assert drv == dist
        assert set(clique) <= set(drv)

    def test_empty(self):
        assert densest_subgraph(_ds([])).count() == 0
