"""Directed triangle motif census (cyclic vs transitive)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    directed_triangle_census,
    directed_triangle_census_local,
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


class TestCensus:
    def test_cyclic_and_transitive(self):
        pairs = [
            ("a", "b"), ("b", "c"), ("c", "a"),   # cyclic
            ("x", "y"), ("x", "z"), ("y", "z"),   # transitive
        ]
        out = directed_triangle_census_local(pairs).iloc[0]
        assert out["n_triangles"] == 2
        assert out["n_cyclic"] == 1
        assert out["n_transitive"] == 1

    def test_reciprocal_pairs_excluded(self):
        pairs = [("p", "q"), ("q", "p"), ("p", "r"), ("q", "r")]
        out = directed_triangle_census_local(pairs).iloc[0]
        assert out["n_triangles"] == 0

    def test_all_cyclic_orientations_detected(self):
        # both rotations of the 3-cycle are cyclic
        for cyc in ([("a", "b"), ("b", "c"), ("c", "a")],
                    [("b", "a"), ("c", "b"), ("a", "c")]):
            out = directed_triangle_census_local(cyc).iloc[0]
            assert out["n_cyclic"] == 1, cyc

    def test_forced_gate_equivalence(self):
        rng = np.random.default_rng(41)
        pairs = [
            (f"m{int(rng.integers(0, 20))}", f"m{int(rng.integers(0, 20))}")
            for _ in range(140)
        ]
        loc = directed_triangle_census_local(pairs)
        dist = directed_triangle_census(_ds(pairs), driver_max_edges=0)
        assert loc.equals(dist)

    def test_empty(self):
        out = directed_triangle_census_local([])
        assert out.iloc[0]["n_triangles"] == 0
