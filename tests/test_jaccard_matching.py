"""Jaccard node similarity (networkx pin, threshold exactness) and
deterministic maximal matching (greedy-twin equality on both gate
paths, matching/maximality properties)."""

from __future__ import annotations

import networkx as nx
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    matching_local,
    maximal_matching,
    node_jaccard,
)


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


def _edges(pairs) -> pd.DataFrame:
    return pd.DataFrame(pairs, columns=["src", "dst"])


class TestNodeJaccard:
    def test_networkx_pin(self):
        pairs = [
            ("a", "x"), ("a", "y"), ("a", "z"),
            ("b", "x"), ("b", "y"),
            ("c", "z"), ("c", "w"),
            ("d", "w"),
        ]
        out = node_jaccard(_ds(_edges(pairs)), threshold_x1e6=1).to_pandas()
        g = nx.Graph(pairs)
        got = {
            (r.node_a, r.node_b): (r.n_common, r.jac_x1e6)
            for r in out.itertuples()
        }
        # verify against networkx jaccard_coefficient on every emitted pair
        for (u, v), (cn, jac) in got.items():
            nu, nv = set(g[u]), set(g[v])
            inter, union = len(nu & nv), len(nu | nv)
            assert cn == inter and inter > 0
            assert jac == (inter * 1_000_000) // union
        # completeness: every pair sharing a neighbor appears
        import itertools

        for u, v in itertools.combinations(sorted(g.nodes), 2):
            if set(g[u]) & set(g[v]):
                assert (u, v) in got

    def test_threshold_exact_boundary(self):
        # a-b share 1 of union 4 -> jac 0.25 exactly
        pairs = [("a", "m"), ("b", "m"), ("a", "p"), ("a", "q"), ("b", "r")]
        lo = node_jaccard(_ds(_edges(pairs)), threshold_x1e6=250_000).to_pandas()
        hi = node_jaccard(_ds(_edges(pairs)), threshold_x1e6=250_001).to_pandas()
        lo_pairs = {(r.node_a, r.node_b) for r in lo.itertuples()}
        hi_pairs = {(r.node_a, r.node_b) for r in hi.itertuples()}
        assert ("a", "b") in lo_pairs and ("a", "b") not in hi_pairs

    def test_layout_independent(self):
        pairs = [(f"u{i % 7}", f"v{i % 5}") for i in range(60)]
        key = lambda d: d.sort_values(["node_a", "node_b"]).reset_index(drop=True)
        one = node_jaccard(_ds(_edges(pairs), 1), threshold_x1e6=1).to_pandas()
        many = node_jaccard(_ds(_edges(pairs), 8), threshold_x1e6=1).to_pandas()
        pd.testing.assert_frame_equal(key(one), key(many))


def _is_matching(df: pd.DataFrame) -> bool:
    nodes = list(df["u"]) + list(df["v"])
    return len(nodes) == len(set(nodes))


def _is_maximal(df: pd.DataFrame, edges: pd.DataFrame) -> bool:
    matched = set(df["u"]) | set(df["v"])
    for s, d in zip(edges["src"], edges["dst"]):
        if s != d and s not in matched and d not in matched:
            return False
    return True


class TestMaximalMatching:
    def _graph(self, n: int = 30, seed: int = 5) -> pd.DataFrame:
        import random

        rng = random.Random(seed)
        return _edges(
            [(f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(80)]
        )

    def test_properties_and_twin(self):
        df = self._graph()
        out = maximal_matching(_ds(df)).to_pandas()
        assert _is_matching(out) and _is_maximal(out, df)
        # driver path IS the greedy twin; check equality explicitly
        und = (
            pd.DataFrame(
                {
                    "u": df["src"].where(df["src"] < df["dst"], df["dst"]),
                    "v": df["dst"].where(df["src"] < df["dst"], df["src"]),
                }
            )
            .query("u != v")
            .drop_duplicates()
        )
        twin = matching_local(und)
        assert set(zip(out["u"], out["v"])) == set(zip(twin["u"], twin["v"]))

    def test_forced_distributed_matches_driver(self):
        df = self._graph(seed=9)
        driver = maximal_matching(_ds(df)).to_pandas()
        dist = maximal_matching(_ds(df, 5), driver_max_edges=0).to_pandas()
        assert set(zip(driver["u"], driver["v"])) == set(zip(dist["u"], dist["v"]))

    def test_forced_antijoin_removal(self):
        df = self._graph(n=16, seed=2)
        driver = maximal_matching(_ds(df)).to_pandas()
        dist = maximal_matching(
            _ds(df, 4), driver_max_edges=0, matched_broadcast_max=0
        ).to_pandas()
        assert set(zip(driver["u"], driver["v"])) == set(zip(dist["u"], dist["v"]))

    def test_path_graph_converges(self):
        # the case hash-ordering exists for: a long path
        df = _edges([(f"p{i:03d}", f"p{i + 1:03d}") for i in range(40)])
        out = maximal_matching(_ds(df, 4), driver_max_edges=0).to_pandas()
        assert _is_matching(out) and _is_maximal(out, df)

    def test_empty(self):
        df = _edges([("a", "a")])  # self-loop only -> no simple edges
        out = maximal_matching(_ds(df, 1)).to_pandas()
        assert len(out) == 0
