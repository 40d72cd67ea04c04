"""Integer feature smoothing (SGC propagation): hand-computed means,
self-loop fixed point, defaults, forced-gate equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    feature_smooth,
    feature_smooth_local,
)


def _edges(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.string()),
                "dst": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def _feats(items):
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array([i[0] for i in items], pa.string()),
                "feat": pa.array([i[1] for i in items], pa.int64()),
            }
        )
    )


class TestLocal:
    def test_hand_computed_two_rounds(self):
        # a=100 (deg 2 via parallel a-b), b (deg 3), c=40 (deg 1)
        out = feature_smooth_local(
            [("a", "b"), ("b", "c"), ("a", "b")],
            [("a", 100), ("c", 40)],
            iters=2,
        )
        got = dict(zip(out["node"], out["feat"]))
        # r1: a=(100)//3=33, b=(0+200+40)//4=60, c=(40)//2=20
        # r2: a=(33+120)//3=51, b=(60+66+20)//4=36, c=(20+60)//2=40
        assert got == {"a": 51, "b": 36, "c": 40}

    def test_self_loop_is_fixed_point(self):
        out = feature_smooth_local([("d", "d")], [("d", 30)], iters=5)
        assert dict(zip(out["node"], out["feat"]))["d"] == 30

    def test_isolated_feature_node_keeps_value(self):
        out = feature_smooth_local([("a", "b")], [("z", 7)], iters=3)
        assert dict(zip(out["node"], out["feat"]))["z"] == 7

    def test_uniform_features_invariant(self):
        edges = [("a", "b"), ("b", "c"), ("c", "a")]
        out = feature_smooth_local(edges, [(n, 12) for n in "abc"], iters=4)
        assert set(out["feat"]) == {12}


class TestDistributedGate:
    def test_forced_gate_equivalence(self):
        rng = np.random.default_rng(31)
        pairs = [
            (f"n{int(rng.integers(0, 25))}", f"n{int(rng.integers(0, 25))}")
            for _ in range(80)
        ]
        items = [(f"n{i}", int(rng.integers(0, 1000))) for i in range(0, 25, 2)]
        drv = (
            feature_smooth(_edges(pairs), _feats(items), iters=2)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        dist = (
            feature_smooth(
                _edges(pairs), _feats(items), iters=2, driver_max_edges=0
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(drv, dist)

    def test_empty_graph_passthrough(self):
        out = feature_smooth(
            _edges([]), _feats([("a", 5)]), iters=2
        ).to_pandas()
        assert list(out["node"]) == ["a"] and list(out["feat"]) == [5]
