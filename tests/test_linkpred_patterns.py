"""Resource-allocation link prediction + event-sequence pattern
matching: networkx pins, exclusion of existing edges, non-overlapping
regex semantics, determinism across layouts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import resource_allocation_topk
from ai_knowledge_graph_ray.stages.sessions import sequence_pattern_counts


def _random_edges(seed=5, n_nodes=40, n_edges=160):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, n_edges)
    b = rng.randint(0, n_nodes, n_edges)
    return pd.DataFrame(
        {
            "src": [f"n{x:02d}" for x in a],
            "dst": [f"n{x:02d}" for x in b],
        }
    )


class TestResourceAllocation:
    def test_matches_networkx_fixed_point(self):
        import networkx as nx

        df = _random_edges()
        g = nx.Graph()
        for s, o in zip(df["src"], df["dst"]):
            if s != o:
                g.add_edge(s, o)
        out = resource_allocation_topk(
            ray.data.from_pandas(df).repartition(4), top_k=30
        ).to_pandas()
        assert len(out) == 30
        adj = {n: set(g[n]) for n in g}
        for _, row in out.iterrows():
            x, y = row["x"], row["y"]
            assert y not in adj[x], (x, y)  # non-adjacent only
            expect = sum(
                1_000_000 // g.degree(w) for w in adj[x] & adj[y]
            )
            assert row["score"] == expect, (x, y)
        # descending, ties by (x, y)
        key = list(zip(-out["score"], out["x"], out["y"]))
        assert key == sorted(key)

    def test_max_degree_drops_celebrity_middles(self):
        # star: hub h connects s0..s9 -> every leaf pair shares only h
        star = pd.DataFrame(
            {"src": ["h"] * 10, "dst": [f"s{i}" for i in range(10)]}
        )
        full = resource_allocation_topk(ray.data.from_pandas(star), top_k=100)
        assert full.count() == 45  # C(10,2) leaf pairs
        capped = resource_allocation_topk(
            ray.data.from_pandas(star), top_k=100, max_degree=5
        )
        assert capped.count() == 0

    def test_layout_independence(self):
        df = _random_edges(seed=11)
        a = resource_allocation_topk(
            ray.data.from_pandas(df), top_k=25, num_buckets=3
        ).to_pandas()
        b = resource_allocation_topk(
            ray.data.from_pandas(df).repartition(7), top_k=25, num_buckets=9
        ).to_pandas()
        pd.testing.assert_frame_equal(a, b)


def _events(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
                "event_type": [r[2] for r in rows],
                "event_id": list(range(len(rows))),
            }
        )
    )


CHARS = {"view": "v", "click": "c", "purchase": "p"}


class TestSequencePatterns:
    def test_hand_pinned_counts(self):
        # u1: v c c p v c p  -> 2 matches; u2: v p (no click) -> 0;
        # u3 overlapping bait: v c p c p -> only the first vc+p matches
        rows = (
            [(1, t, e) for t, e in enumerate(
                ["view", "click", "click", "purchase", "view", "click", "purchase"]
            )]
            + [(2, t, e) for t, e in enumerate(["view", "purchase"])]
            + [(3, t, e) for t, e in enumerate(
                ["view", "click", "purchase", "click", "purchase"]
            )]
        )
        out = (
            sequence_pattern_counts(_events(rows), "vc+p", CHARS)
            .to_pandas().set_index("user_id")
        )
        assert out.loc[1, "n_matches"] == 2 and out.loc[1, "n_events"] == 7
        assert out.loc[2, "n_matches"] == 0
        assert out.loc[3, "n_matches"] == 1

    def test_tie_order_and_unknown_types(self):
        # same ts -> event_id breaks the tie; unknown type maps to 'x'
        rows = [(7, 0, "click"), (7, 0, "view"), (7, 1, "mystery"), (7, 2, "purchase")]
        ds = _events(rows)
        # event_id order: click(0) view(1) ... -> "cvxp": no match
        out = sequence_pattern_counts(ds, "vc+p", CHARS).to_pandas()
        assert out.loc[0, "n_matches"] == 0
        # but 'x' wildcarded in the pattern finds v..p via explicit class
        out2 = sequence_pattern_counts(ds, "v[cx]+p", CHARS).to_pandas()
        assert out2.loc[0, "n_matches"] == 1

    def test_layout_independence(self):
        rng = np.random.RandomState(3)
        types = np.array(["view", "click", "purchase"])
        rows = [
            (int(u), int(t), types[rng.randint(3)])
            for u in rng.randint(0, 20, 400)
            for t in [rng.randint(0, 10_000)]
        ]
        a = sequence_pattern_counts(_events(rows), "vc+p", CHARS).to_pandas()
        b = (
            sequence_pattern_counts(
                _events(rows).repartition(11), "vc+p", CHARS, num_buckets=5
            )
            .to_pandas()
        )
        key = ["user_id"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )
