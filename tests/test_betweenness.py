"""Sampled betweenness centrality: networkx agreement, driver vs
forced-distributed bit-equality, hop cap, hand cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import sampled_betweenness

SCALE = 1_000_000


def _edges(pairs: list[tuple[str, str]], parts: int = 2) -> ray.data.Dataset:
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    return ray.data.from_pandas(df).repartition(parts)


def _run(pairs, sources, **kw) -> dict[str, int]:
    out = sampled_betweenness(_edges(pairs), sources, scale=SCALE, **kw).to_pandas()
    if len(out) == 0:  # Ray drops columns from fully-empty pipelines
        return {}
    return dict(zip(out["entity"], out["bc_scaled"]))


class TestBetweenness:
    def test_star_center_takes_all(self):
        pairs = [("c", f"x{i}") for i in range(5)]
        got = _run(pairs, [f"x{i}" for i in range(5)] + ["c"])
        # only the hub lies on any shortest path
        assert set(got) == {"c"}
        # each ordered leaf pair (5*4 = 20) contributes scale via c
        assert got["c"] == 20 * SCALE

    def test_path_graph_matches_networkx(self):
        import networkx as nx

        pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        nodes = list("abcde")
        got = _run(pairs, nodes)
        g = nx.Graph(pairs)
        want = nx.betweenness_centrality(g, normalized=False)
        for n in nodes:
            # ours counts ordered pairs -> 2x nx's undirected convention
            assert abs(got.get(n, 0) / SCALE - 2 * want[n]) < 1e-3, n

    def test_random_graph_matches_networkx(self):
        import networkx as nx

        rng = np.random.RandomState(5)
        nodes = [f"n{i}" for i in range(30)]
        pairs = set()
        for _ in range(70):
            a, b = rng.choice(30, 2, replace=False)
            pairs.add((f"n{a}", f"n{b}"))
        pairs = sorted(pairs)
        got = _run(pairs, nodes, max_hops=30)
        g = nx.Graph(pairs)
        want = nx.betweenness_centrality(g, normalized=False)
        for n in nodes:
            assert abs(got.get(n, 0) / SCALE - 2 * want[n]) < 0.01, n

    def test_forced_distributed_bit_equal(self):
        rng = np.random.RandomState(11)
        pairs = sorted(
            {
                (f"n{rng.randint(0, 20)}", f"n{rng.randint(0, 20)}")
                for _ in range(40)
            }
        )
        pairs = [(a, b) for a, b in pairs if a != b]
        sources = [f"n{i}" for i in range(0, 20, 3)]
        a = _run(pairs, sources, max_hops=6)
        b = _run(pairs, sources, max_hops=6, driver_max_edges=0)
        assert a == b

    def test_hop_cap_limits_accumulation(self):
        pairs = [("a", "b"), ("b", "c"), ("c", "d")]
        # cap 1: no node is interior to any <=1-hop path
        got = _run(pairs, list("abcd"), max_hops=1)
        assert got == {}

    def test_sampled_subset_of_sources(self):
        pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        got = _run(pairs, ["a"])  # only paths FROM a accumulate
        # delta_a: b sits on paths a->c,a->d,a->e (3), c on 2, d on 1
        assert got == {"b": 3 * SCALE, "c": 2 * SCALE, "d": 1 * SCALE}

    def test_empty_and_missing_source(self):
        pairs = [("a", "b")]
        assert _run(pairs, ["zzz"]) == {}
        out = sampled_betweenness(
            _edges([("a", "a")]), ["a"], scale=SCALE
        ).to_pandas()
        assert len(out) == 0
