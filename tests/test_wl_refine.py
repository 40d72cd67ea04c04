"""Weisfeiler-Lehman refinement (wl_refine) and the distributed
dense-rank primitive behind it."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import wl_refine, wl_refine_local
from ai_knowledge_graph_ray.stages.relational import dense_rank_distinct


def _edges_ds(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.string()),
                "dst": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


class TestDenseRankDistinct:
    def test_ranks_match_sorted_order(self):
        vals = [f"v{i:03d}" for i in range(97)]
        rng = np.random.default_rng(7)
        shuffled = list(rng.permutation(vals))
        ds = ray.data.from_arrow(
            pa.table({"sig": pa.array(shuffled, pa.string())})
        ).repartition(8)
        out = dense_rank_distinct(ds, "sig", rank_col="r").to_pandas()
        out = out.sort_values("sig").reset_index(drop=True)
        assert list(out["sig"]) == sorted(vals)
        assert list(out["r"]) == list(range(1, len(vals) + 1))

    def test_empty(self):
        ds = ray.data.from_arrow(pa.table({"sig": pa.array([], pa.string())}))
        assert dense_rank_distinct(ds, "sig").count() == 0


class TestWlLocal:
    def test_path_graph_symmetry(self):
        # P4: endpoints {a, d} and middles {b, c} are structurally
        # interchangeable at every refinement depth.
        out = wl_refine_local([("a", "b"), ("b", "c"), ("c", "d")], iters=2)
        lbl = dict(zip(out["node"], out["wl_label"]))
        assert lbl["a"] == lbl["d"] and lbl["b"] == lbl["c"]
        assert lbl["a"] != lbl["b"]
        cs = dict(zip(out["node"], out["class_size"]))
        assert cs == {"a": 2, "b": 2, "c": 2, "d": 2}

    def test_star_center_distinguished(self):
        out = wl_refine_local(
            [("hub", "x"), ("hub", "y"), ("hub", "z")], iters=1
        )
        lbl = dict(zip(out["node"], out["wl_label"]))
        assert lbl["x"] == lbl["y"] == lbl["z"] != lbl["hub"]

    def test_refinement_splits_degree_ties(self):
        # b and e both have degree 2, but b's neighbors are a leaf and
        # a middle while e's are two middles of a 6-cycle -> one WL
        # round keeps a cycle uniform but separates the path's b.
        path = [("a", "b"), ("b", "c"), ("c", "d")]
        cyc = [("p", "q"), ("q", "r"), ("r", "s"), ("s", "t"), ("t", "u"), ("u", "p")]
        out = wl_refine_local(path + cyc, iters=2)
        lbl = dict(zip(out["node"], out["wl_label"]))
        assert len({lbl[n] for n in "pqrstu"}) == 1  # cycle stays one class
        assert lbl["b"] != lbl["q"]  # degree tie broken by context

    def test_multiplicity_and_self_loop(self):
        # one graph holding a single edge (x,y) and a doubled edge
        # (p,q): the parallel edge gives p/q degree 2, so they land in
        # a different class than x/y even though both components are
        # "two nodes joined".
        out = wl_refine_local(
            [("x", "y"), ("p", "q"), ("p", "q")], iters=1
        )
        lbl = dict(zip(out["node"], out["wl_label"]))
        assert lbl["x"] == lbl["y"] and lbl["p"] == lbl["q"]
        assert lbl["x"] != lbl["p"]
        # self-loop: degree 2 (both endpoints), node is its own
        # neighbor twice, a singleton class
        loop = wl_refine_local([("x", "x")], iters=1)
        assert list(loop["node"]) == ["x"] and list(loop["class_size"]) == [1]


class TestWlDistributedGate:
    def test_forced_gate_equivalence(self):
        rng = np.random.default_rng(11)
        pairs = [
            (f"n{int(rng.integers(0, 40))}", f"n{int(rng.integers(0, 40))}")
            for _ in range(120)
        ] + [("a", "b"), ("b", "c"), ("c", "d")]
        ds = _edges_ds(pairs)
        drv = (
            wl_refine(ds, iters=2)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        dist = (
            wl_refine(ds, iters=2, driver_max_edges=0)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(drv, dist)

    def test_empty_edges(self):
        ds = _edges_ds([])
        out = wl_refine(ds, iters=2)
        assert out.count() == 0
