"""Integer fixed-point PageRank: local/distributed bit-equality, the
count gate, and sanity of the rank ordering."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    pagerank_int,
    pagerank_int_local,
)

EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"),       # 3-cycle
    ("d", "c"), ("e", "c"),                   # c gets extra in-links
    ("f", "g"),                               # g is dangling
]


def _ds(edge_list):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edge_list], pa.string()),
                "dst": pa.array([e[1] for e in edge_list], pa.string()),
            }
        )
    )


class TestPagerankInt:
    def test_distributed_equals_local_bitexact(self):
        local = pagerank_int_local(EDGES, iters=4)
        dist = {
            r["node"]: r["rank_scaled"]
            for r in pagerank_int(_ds(EDGES), iters=4, driver_max_edges=0).take_all()
        }
        assert dist == local

    def test_gate_path_equals_scale_path(self):
        gated = {
            r["node"]: r["rank_scaled"]
            for r in pagerank_int(_ds(EDGES), iters=3).take_all()
        }
        dist = {
            r["node"]: r["rank_scaled"]
            for r in pagerank_int(_ds(EDGES), iters=3, driver_max_edges=0).take_all()
        }
        assert gated == dist

    def test_rank_ordering_sane(self):
        r = pagerank_int_local(EDGES, iters=10)
        # c has the most in-links -> highest rank; mass conserved-ish
        assert max(r, key=r.get) == "c"
        assert abs(sum(r.values()) - 10**12) < 10**9  # integer truncation drift only

    def test_empty(self):
        assert pagerank_int(_ds([])).take_all() == []
        assert pagerank_int_local([]) == {}
