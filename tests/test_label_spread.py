"""Seeded label spreading: clamping, majority with multiplicity,
deterministic tie-breaks, fallback-to-previous, forced-gate
equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    label_spread,
    label_spread_local,
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


class TestLocal:
    def test_parallel_edges_vote_with_multiplicity(self):
        out = label_spread_local(
            [("s1", "a"), ("s2", "a"), ("s2", "a")], [("s1", 5), ("s2", 3)],
            iters=1,
        )
        lbl = dict(zip(out["node"], out["label"]))
        assert lbl["a"] == 3  # two votes beat one

    def test_tie_breaks_to_min_label(self):
        out = label_spread_local(
            [("s1", "a"), ("s2", "a")], [("s1", 9), ("s2", 4)], iters=1
        )
        assert dict(zip(out["node"], out["label"]))["a"] == 4

    def test_seeds_clamped(self):
        # s1 is flooded by label-3 neighbors but stays 5
        out = label_spread_local(
            [("s2", "s1"), ("s2", "s1"), ("s2", "s1")],
            [("s1", 5), ("s2", 3)],
            iters=3,
        )
        lbl = dict(zip(out["node"], out["label"]))
        assert lbl["s1"] == 5 and lbl["s2"] == 3

    def test_keeps_previous_when_neighbors_unlabeled(self):
        # chain s - a - b - c: after round 1 only a is labeled; in
        # round 2, b adopts a's label; a keeps its label even though
        # b/c were unlabeled voters in round 1
        out = label_spread_local(
            [("s", "a"), ("a", "b"), ("b", "c")], [("s", 7)], iters=2
        )
        lbl = dict(zip(out["node"], out["label"]))
        assert lbl["a"] == 7 and lbl["b"] == 7 and "c" not in lbl

    def test_isolated_seed_survives(self):
        out = label_spread_local([("x", "y")], [("lone", 2), ("x", 1)], iters=2)
        lbl = dict(zip(out["node"], out["label"]))
        assert lbl["lone"] == 2 and lbl["y"] == 1


class TestDistributedGate:
    def test_forced_gate_equivalence(self):
        rng = np.random.default_rng(23)
        pairs = [
            (f"n{int(rng.integers(0, 30))}", f"n{int(rng.integers(0, 30))}")
            for _ in range(90)
        ]
        seeds = pd.DataFrame({"node": ["n0", "n7", "n13"], "label": [2, 1, 2]})
        ds = _ds(pairs)
        drv = (
            label_spread(ds, seeds, iters=3)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        dist = (
            label_spread(ds, seeds, iters=3, driver_max_edges=0)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(drv, dist)

    def test_empty_edges(self):
        seeds = pd.DataFrame({"node": ["a"], "label": [4]})
        out = label_spread(_ds([]), seeds, iters=2).to_pandas()
        assert list(out["node"]) == ["a"] and list(out["label"]) == [4]
