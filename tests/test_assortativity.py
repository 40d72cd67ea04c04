"""Degree-mixing sums: networkx assortativity pin, layout
independence, hand-computed star pin."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import degree_mixing_sums


def _r_from_sums(row) -> Fraction:
    m, s_sum, s_prod, s_sq = (
        int(row["m"]), int(row["s_sum"]), int(row["s_prod"]), int(row["s_sq"])
    )
    return Fraction(4 * m * s_prod - s_sum**2, 2 * m * s_sq - s_sum**2)


class TestDegreeMixing:
    def test_matches_networkx(self):
        import networkx as nx

        rng = np.random.RandomState(5)
        a = rng.randint(0, 40, 150)
        b = rng.randint(0, 40, 150)
        df = pd.DataFrame(
            {"src": [f"n{x}" for x in a], "dst": [f"n{x}" for x in b]}
        )
        row = degree_mixing_sums(ray.data.from_pandas(df)).to_pandas().iloc[0]
        g = nx.Graph(list(zip(df["src"], df["dst"])))
        g.remove_edges_from(nx.selfloop_edges(g))
        assert int(row["m"]) == g.number_of_edges()
        want = nx.degree_assortativity_coefficient(g)
        assert abs(float(_r_from_sums(row)) - want) < 1e-9

    def test_star_pin(self):
        # star K_{1,4}: every edge joins deg 4 with deg 1
        df = pd.DataFrame({"src": ["h"] * 4, "dst": list("abcd")})
        row = degree_mixing_sums(ray.data.from_pandas(df)).to_pandas().iloc[0]
        assert row.tolist() == [4, 4 * 5, 4 * 4, 4 * 17]

    def test_layout_independent(self):
        rng = np.random.RandomState(8)
        a = rng.randint(0, 25, 90)
        b = rng.randint(0, 25, 90)
        df = pd.DataFrame(
            {"src": [f"n{x}" for x in a], "dst": [f"n{x}" for x in b]}
        )
        rows = [
            degree_mixing_sums(
                ray.data.from_pandas(df).repartition(p), num_buckets=nb
            ).to_pandas().iloc[0].tolist()
            for p, nb in ((1, None), (7, 3), (13, 5))
        ]
        assert rows[0] == rows[1] == rows[2]


class TestRichClub:
    def test_matches_networkx(self):
        import networkx as nx

        from ai_knowledge_graph_ray.stages.graph_algos import rich_club_counts

        rng = np.random.RandomState(12)
        a = rng.randint(0, 30, 120)
        b = rng.randint(0, 30, 120)
        df = pd.DataFrame(
            {"src": [f"n{x}" for x in a], "dst": [f"n{x}" for x in b]}
        )
        ks = [1, 2, 3, 5]
        out = (
            rich_club_counts(ray.data.from_pandas(df), ks)
            .to_pandas().set_index("k")
        )
        g = nx.Graph(list(zip(df["src"], df["dst"])))
        g.remove_edges_from(nx.selfloop_edges(g))
        for k in ks:
            rich = [n for n, d in g.degree() if d > k]
            sub = g.subgraph(rich)
            assert out.loc[k, "n_nodes"] == len(rich)
            assert out.loc[k, "n_edges"] == sub.number_of_edges()

    def test_layout_independent(self):
        from ai_knowledge_graph_ray.stages.graph_algos import rich_club_counts

        rng = np.random.RandomState(13)
        a = rng.randint(0, 20, 70)
        b = rng.randint(0, 20, 70)
        df = pd.DataFrame(
            {"src": [f"n{x}" for x in a], "dst": [f"n{x}" for x in b]}
        )
        outs = [
            rich_club_counts(
                ray.data.from_pandas(df).repartition(p), [0, 2, 4], num_buckets=nb
            ).to_pandas().values.tolist()
            for p, nb in ((1, None), (6, 3))
        ]
        assert outs[0] == outs[1]
