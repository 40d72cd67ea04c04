"""Greedy graph coloring (Jones-Plassmann on the derandomized order):
properness, exact equality of the driver twin and the forced-distributed
rounds, layout independence, and the Delta+1 bound."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data


def _edges(pairs):
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    return ray.data.from_pandas(df)


def _colors(res) -> dict[str, int]:
    df = res.to_pandas()
    return dict(zip(df["node"], df["color"]))


PAIRS = [
    ("a", "b"), ("b", "c"), ("c", "a"),          # triangle
    ("c", "d"), ("d", "e"),                      # tail
    ("x", "y"),                                  # separate component
    ("e", "e"),                                  # self-loop (dropped)
    ("b", "a"),                                  # reverse duplicate
]


class TestGreedyColoring:
    def test_proper_and_complete(self):
        from ai_knowledge_graph_ray.stages.graph_algos import greedy_coloring

        got = _colors(greedy_coloring(_edges(PAIRS)))
        assert set(got) == {"a", "b", "c", "d", "e", "x", "y"}
        for u, v in PAIRS:
            if u != v:
                assert got[u] != got[v], (u, v)
        # triangle needs exactly 3 colors; edge components need 2
        assert len({got["a"], got["b"], got["c"]}) == 3
        assert got["x"] != got["y"]

    def test_forced_distributed_matches_driver_twin(self):
        from ai_knowledge_graph_ray.stages.graph_algos import greedy_coloring

        driver = _colors(greedy_coloring(_edges(PAIRS)))
        dist = _colors(
            greedy_coloring(_edges(PAIRS), driver_max_edges=0)
        )
        assert driver == dist

    def test_layout_independent(self):
        from ai_knowledge_graph_ray.stages.graph_algos import greedy_coloring

        base = _colors(greedy_coloring(_edges(PAIRS), driver_max_edges=0))
        repart = _colors(
            greedy_coloring(
                _edges(PAIRS).repartition(5), driver_max_edges=0
            )
        )
        assert base == repart

    def test_star_uses_two_colors(self):
        from ai_knowledge_graph_ray.stages.graph_algos import greedy_coloring

        pairs = [("hub", f"leaf{i}") for i in range(8)]
        got = _colors(greedy_coloring(_edges(pairs)))
        # greedy on any order colors a star with exactly 2 colors
        assert len(set(got.values())) == 2
        for i in range(8):
            assert got[f"leaf{i}"] != got["hub"]

    def test_empty(self):
        from ai_knowledge_graph_ray.stages.graph_algos import greedy_coloring

        out = greedy_coloring(_edges([]).filter(lambda r: False)).to_pandas()
        assert len(out) == 0
