"""Structural graph analytics (triangles, degree histogram) and
market-basket co-occurrence: hand-computed fixtures, a networkx pin on
a seeded random graph, and driver-vs-distributed gate equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.cooccur import cooccur_pairs
from ai_knowledge_graph_ray.stages.graph_algos import (
    degree_histogram,
    triangle_counts,
    undirected_simple_edges,
)


def _edges_ds(pairs):
    return ray.data.from_items([{"src": s, "dst": d} for s, d in pairs])


def _tri_df(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("node").reset_index(drop=True)


# K4 on a..d (every node in 3 triangles), a pendant path e-f, a
# self-loop, duplicate + reversed edges (all must collapse).
K4_PLUS = [
    ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
    ("e", "f"), ("f", "e"), ("g", "g"), ("b", "a"),
]


class TestTriangles:
    def test_k4_counts(self):
        out = _tri_df(triangle_counts(_edges_ds(K4_PLUS)))
        assert out["node"].tolist() == ["a", "b", "c", "d"]  # e,f,g: zero
        assert out["n_triangles"].tolist() == [3, 3, 3, 3]

    def test_gate_equivalence_all_tiers(self):
        # local twin (default) vs broadcast-orient vs join-orient
        local = _tri_df(triangle_counts(_edges_ds(K4_PLUS)))
        bcast = _tri_df(triangle_counts(_edges_ds(K4_PLUS), driver_max_edges=0))
        joined = _tri_df(
            triangle_counts(
                _edges_ds(K4_PLUS), driver_max_edges=0, driver_max_nodes=0
            )
        )
        pd.testing.assert_frame_equal(local, bcast)
        pd.testing.assert_frame_equal(local, joined)

    def test_networkx_pin(self):
        import networkx as nx

        rng = np.random.RandomState(7)
        g = nx.gnm_random_graph(40, 160, seed=7)
        pairs = [(f"n{u}", f"n{v}") for u, v in g.edges]
        # shuffle in duplicates/reversals
        extra = [(b, a) for a, b in pairs[::3]]
        # force the distributed (broadcast-orient) tier for the pin
        out = _tri_df(triangle_counts(_edges_ds(pairs + extra), driver_max_edges=0))
        want = {f"n{v}": c for v, c in nx.triangles(g).items() if c > 0}
        got = dict(zip(out["node"], out["n_triangles"]))
        assert got == want

    def test_empty(self):
        out = triangle_counts(_edges_ds([("x", "y")])).to_pandas()
        assert len(out) == 0


class TestDegreeHistogram:
    def test_hand_case(self):
        # star: hub degree 3, leaves degree 1 (x3)
        out = (
            degree_histogram(_edges_ds([("h", "l1"), ("h", "l2"), ("l3", "h")]))
            .to_pandas()
            .sort_values("degree")
            .reset_index(drop=True)
        )
        assert out["degree"].tolist() == [1, 3]
        assert out["n_nodes"].tolist() == [3, 1]

    def test_simple_graph_collapse(self):
        und = (
            undirected_simple_edges(_edges_ds(K4_PLUS))
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        assert len(und) == 7  # 6 K4 edges + e-f; self-loop and dups gone
        assert (und["a"] < und["b"]).all()


class TestCooccur:
    def _baskets(self):
        rows = []
        baskets = {
            1: [10, 20, 30],
            2: [10, 20],
            3: [10, 20, 40],
            4: [30, 40],
            5: [30, 40],
            6: [50],
        }
        for b, items in baskets.items():
            rows += [{"basket": b, "item": i} for i in items]
        rows.append({"basket": 1, "item": 10})  # dup (basket,item) row
        return ray.data.from_items(rows)

    def test_counts_and_order(self):
        out = cooccur_pairs(
            self._baskets(), "basket", "item", min_count=2, top_k=10
        ).to_pandas()
        # (10,20) in baskets 1,2,3; (30,40) in baskets 4,5
        got = list(zip(out["item_a"], out["item_b"], out["n_baskets"]))
        assert got == [(10, 20, 3), (30, 40, 2)]

    def test_top_k_and_min_count(self):
        out = cooccur_pairs(
            self._baskets(), "basket", "item", min_count=1, top_k=3
        ).to_pandas()
        got = list(zip(out["item_a"], out["item_b"], out["n_baskets"]))
        # full: (10,20)=3,(30,40)=2,(10,30)=(20,30)=(10,40)=(20,40)=1
        assert got == [(10, 20, 3), (30, 40, 2), (10, 30, 1)]

    def test_max_basket_size_drops(self):
        out = cooccur_pairs(
            self._baskets(), "basket", "item",
            min_count=1, top_k=10, max_basket_size=2,
        ).to_pandas()
        got = list(zip(out["item_a"], out["item_b"], out["n_baskets"]))
        # only size-<=2 baskets remain: 2:(10,20), 4/5:(30,40)
        assert got == [(30, 40, 2), (10, 20, 1)]

    def test_string_items_common_neighbors(self):
        # common-neighbor counting IS cooccur with middle node = basket
        import pyarrow as pa

        neigh = ray.data.from_items(
            [
                # square a-b-c-d-a: (a,c) and (b,d) share 2 middles each
                {"node": m, "nb": x}
                for m, xs in {
                    "a": ["b", "d"], "b": ["a", "c"],
                    "c": ["b", "d"], "d": ["c", "a"],
                }.items()
                for x in xs
            ]
        )
        out = cooccur_pairs(
            neigh, "node", "nb", min_count=2, top_k=10, item_type=pa.string()
        ).to_pandas()
        got = list(zip(out["item_a"], out["item_b"], out["n_baskets"]))
        assert got == [("a", "c", 2), ("b", "d", 2)]


class TestWeakComponents:
    # two components: a-b-c chain (min label "a") and x-y (min "x"),
    # plus duplicate/reversed edges that must collapse
    PAIRS = [("b", "a"), ("b", "c"), ("c", "b"), ("x", "y"), ("x", "y")]

    def _ds(self):
        return ray.data.from_items(
            [{"subject": s, "object": o} for s, o in self.PAIRS]
        )

    def _run(self, **kw) -> list[tuple[str, str]]:
        from ai_knowledge_graph_ray.stages.graph_algos import weak_components

        df = weak_components(self._ds(), **kw).to_pandas()
        return sorted(zip(df["entity"], df["component"]))

    def test_driver_path(self):
        assert self._run() == [
            ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"),
        ]

    def test_forced_distributed_equivalence(self):
        assert self._run(driver_max_edges=0) == self._run()


class TestHarmonicCentrality:
    def test_path_graph_hand_values(self):
        import pandas as pd
        import ray.data

        from ai_knowledge_graph_ray.stages.graph_algos import harmonic_centrality

        S = 1_000_000
        edges = ray.data.from_pandas(
            pd.DataFrame(
                [("a", "b"), ("b", "c"), ("c", "d")], columns=["src", "dst"]
            )
        ).repartition(2)
        out = harmonic_centrality(edges, ["a", "d"], max_hops=3, scale=S).to_pandas()
        got = dict(zip(out["entity"], out["harmonic_scaled"]))
        # from a: b=1, c=2, d=3; from d: c=1, b=2, a=3
        assert got == {
            "a": S // 3,
            "b": S // 1 + S // 2,
            "c": S // 2 + S // 1,
            "d": S // 3,
        }

    def test_layout_independent(self):
        import numpy as np
        import pandas as pd
        import ray.data

        from ai_knowledge_graph_ray.stages.graph_algos import harmonic_centrality

        rng = np.random.RandomState(7)
        pairs = sorted(
            {(f"n{rng.randint(0, 25)}", f"n{rng.randint(0, 25)}") for _ in range(60)}
        )
        pairs = [(a, b) for a, b in pairs if a != b]
        df = pd.DataFrame(pairs, columns=["src", "dst"])
        srcs = [f"n{i}" for i in range(0, 25, 5)]
        a = (
            harmonic_centrality(ray.data.from_pandas(df), srcs, max_hops=4)
            .to_pandas().sort_values("entity").reset_index(drop=True)
        )
        b = (
            harmonic_centrality(
                ray.data.from_pandas(df).repartition(7), srcs, max_hops=4
            )
            .to_pandas().sort_values("entity").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
