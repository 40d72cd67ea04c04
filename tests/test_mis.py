"""Maximal independent set: greedy-twin equality, independence,
maximality, forced-gate equivalence, late-isolated-node inclusion."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    maximal_independent_set,
    mis_local,
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


def _check_properties(pairs, mis):
    nbrs = {}
    for a, b in pairs:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    mis = set(mis)
    # independence
    for n in mis:
        assert not (nbrs.get(n, set()) & mis), f"{n} has a MIS neighbor"
    # maximality: every non-member has a MIS neighbor
    for n in nbrs:
        if n not in mis:
            assert nbrs[n] & mis, f"{n} could be added"


class TestMis:
    def test_properties_random_graph(self):
        rng = np.random.default_rng(7)
        pairs = list(
            {
                (f"n{int(rng.integers(0, 60))}", f"n{int(rng.integers(0, 60))}")
                for _ in range(250)
            }
        )
        out = maximal_independent_set(_ds(pairs)).to_pandas()
        _check_properties(pairs, out["node"])

    def test_forced_gate_matches_greedy_twin(self):
        rng = np.random.default_rng(19)
        pairs = list(
            {
                (f"v{int(rng.integers(0, 40))}", f"v{int(rng.integers(0, 40))}")
                for _ in range(150)
            }
        )
        drv = (
            maximal_independent_set(_ds(pairs))
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        dist = (
            maximal_independent_set(_ds(pairs), driver_max_edges=0)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(drv, dist)
        _check_properties(pairs, drv["node"])

    def test_forced_anti_join_removal_path(self):
        rng = np.random.default_rng(23)
        pairs = list(
            {
                (f"w{int(rng.integers(0, 30))}", f"w{int(rng.integers(0, 30))}")
                for _ in range(100)
            }
        )
        drv = (
            maximal_independent_set(_ds(pairs))
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        dist = (
            maximal_independent_set(
                _ds(pairs), driver_max_edges=0, removed_broadcast_max=0
            )
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(drv, dist)

    def test_star_takes_center_or_all_leaves(self):
        pairs = [("hub", f"l{i}") for i in range(6)]
        out = set(maximal_independent_set(_ds(pairs)).to_pandas()["node"])
        assert out == {"hub"} or out == {f"l{i}" for i in range(6)}

    def test_empty(self):
        assert maximal_independent_set(_ds([])).count() == 0

    def test_local_twin_late_isolated_node(self):
        # y's only neighbor l1 gets blocked when the hub wins first in
        # some rank order; whichever order, y or l1 must end up in the
        # MIS (never neither)
        pairs = [("x", "l1"), ("x", "l2"), ("x", "l3"), ("l1", "y")]
        out = set(
            mis_local(
                pd.DataFrame(
                    {"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]}
                )
            )["node"]
        )
        _check_properties(pairs, out)
        assert ("y" in out) or ("l1" in out)
