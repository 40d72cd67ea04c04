"""Bow-tie decomposition: textbook shape, pivot determinism,
forced-gate equivalence, degenerate graphs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    bowtie_local,
    bowtie_regions,
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


BOWTIE = [
    ("a", "c"), ("b", "c"),            # IN
    ("c", "d"), ("d", "e"), ("e", "c"),  # core cycle
    ("e", "f"), ("f", "g"),            # OUT
    ("t", "t2"),                       # disconnected tendril
]


class TestLocal:
    def test_textbook_shape(self):
        out = bowtie_local(BOWTIE)
        got = dict(zip(out["node"], out["region"]))
        assert {k: got[k] for k in "cde"} == {c: "core" for c in "cde"}
        assert got["a"] == got["b"] == "in"
        assert got["f"] == got["g"] == "out"
        assert got["t"] == got["t2"] == "other"

    def test_pure_cycle_all_core(self):
        out = bowtie_local([("x", "y"), ("y", "z"), ("z", "x")])
        assert set(out["region"]) == {"core"}

    def test_dag_has_singleton_core(self):
        # no cycle: the pivot's SCC is itself
        out = bowtie_local([("p", "q"), ("q", "r")])
        got = dict(zip(out["node"], out["region"]))
        assert list(got.values()).count("core") == 1

    def test_empty(self):
        assert len(bowtie_local([])) == 0


class TestDistributedGate:
    def test_forced_gate_equivalence_textbook(self):
        drv = bowtie_local(BOWTIE).sort_values("node").reset_index(drop=True)
        dist = (
            bowtie_regions(_ds(BOWTIE), driver_max_edges=0)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(drv, dist)

    def test_forced_gate_equivalence_random(self):
        rng = np.random.default_rng(29)
        pairs = [
            (f"n{int(rng.integers(0, 30))}", f"n{int(rng.integers(0, 30))}")
            for _ in range(120)
        ]
        drv = bowtie_local(pairs).sort_values("node").reset_index(drop=True)
        dist = (
            bowtie_regions(_ds(pairs), driver_max_edges=0)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(drv, dist)
