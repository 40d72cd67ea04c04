"""GraphSAGE-style deterministic neighbor sampling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.walks import _ns_rank, neighbor_sample


def _ds(src, dst):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(src, dtype=np.int64), pa.int64()),
                "dst": pa.array(np.asarray(dst, dtype=np.int64), pa.int64()),
            }
        )
    )


def _expected(src, dst, seeds, fanout):
    """Brute-force twin using the same rank arithmetic."""
    und = set()
    for s, d in zip(src, dst):
        und.add((int(s), int(d)))
        und.add((int(d), int(s)))
    adj: dict[int, list[int]] = {}
    for n, m in und:
        adj.setdefault(n, []).append(m)
    samp = {
        n: [
            m
            for m in sorted(
                ms,
                key=lambda m: (
                    int(_ns_rank(np.array([n]), np.array([m]))[0]),
                    m,
                ),
            )
        ]
        for n, ms in adj.items()
    }
    rows = {(s, 0, s) for s in seeds}
    frontier = {(s, s) for s in seeds}
    for h, f in enumerate(fanout, start=1):
        nxt = set()
        for s, n in frontier:
            for m in samp.get(n, [])[:f]:
                nxt.add((s, m))
        rows |= {(s, h, m) for s, m in nxt}
        frontier = nxt
    return rows


class TestNeighborSample:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(17)
        src = rng.integers(0, 25, 300) * 2
        dst = rng.integers(0, 40, 300) * 2 + 1
        seeds = [0, 4, 8]
        out = neighbor_sample(_ds(src, dst).repartition(5), seeds, [3, 2]).to_pandas()
        got = set(zip(out["seed"], out["hop"], out["node"]))
        assert got == _expected(src, dst, seeds, [3, 2])

    def test_fanout_bounds(self):
        rng = np.random.default_rng(2)
        src = rng.integers(0, 10, 200) * 2
        dst = rng.integers(0, 50, 200) * 2 + 1
        out = neighbor_sample(_ds(src, dst), [0, 2], [4]).to_pandas()
        h1 = out[out["hop"] == 1].groupby("seed").size()
        assert (h1 <= 4).all()

    def test_same_node_same_sample_across_seeds(self):
        # two seeds adjacent to the same hub must expand the hub to
        # the SAME hop-2 set
        src = [0, 2] + [1] * 6
        dst = [1, 1] + [10, 12, 14, 16, 18, 20]
        out = neighbor_sample(_ds(src, dst), [0, 2], [1, 3]).to_pandas()
        h2 = out[out["hop"] == 2]
        sets = {s: frozenset(g["node"]) for s, g in h2.groupby("seed")}
        assert sets[0] == sets[2] and len(sets[0]) == 3

    def test_isolated_seed_only_hop0(self):
        out = neighbor_sample(_ds([4], [5]), [99], [2, 2]).to_pandas()
        assert list(out["hop"]) == [0] and list(out["node"]) == [99]
