"""Integer fixed-point PageRank: local/distributed bit-equality, the
count gate, and sanity of the rank ordering."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    graph_search,
    k_hop_neighbors,
    katz_int,
    katz_int_local,
    shortest_path,
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


class TestKatzInt:
    def test_distributed_equals_local_bitexact(self):
        local = katz_int_local(EDGES, iters=4)
        dist = {
            r["node"]: r["katz_scaled"]
            for r in katz_int(_ds(EDGES), iters=4, driver_max_edges=0).take_all()
        }
        assert dist == local

    def test_gate_path_equals_scale_path(self):
        gated = {
            r["node"]: r["katz_scaled"]
            for r in katz_int(_ds(EDGES), iters=3).take_all()
        }
        dist = {
            r["node"]: r["katz_scaled"]
            for r in katz_int(_ds(EDGES), iters=3, driver_max_edges=0).take_all()
        }
        assert gated == dist

    def test_matches_networkx_ordering_and_hand_case(self):
        # one iteration by hand on a -> c, b -> c:
        # x0 = scale everywhere; x1(c) = scale + (2*scale)//10
        r = katz_int_local([("a", "c"), ("b", "c")], iters=1, scale=10**9)
        assert r == {"a": 10**9, "b": 10**9, "c": 10**9 + 2 * 10**9 // 10}
        # on the shared fixture, c has the most in-links -> top katz
        full = katz_int_local(EDGES, iters=6)
        assert max(full, key=full.get) == "c"
        # unnormalized integer katz ranks agree with networkx katz order
        import networkx as nx

        g = nx.DiGraph(EDGES)
        want = nx.katz_centrality(g, alpha=0.1, beta=1.0, tol=1e-12)
        ours = sorted(full, key=lambda n: (full[n], n))
        theirs = sorted(want, key=lambda n: (round(want[n], 9), n))
        assert ours == theirs

    def test_parallel_edges_count_with_multiplicity(self):
        single = katz_int_local([("a", "b")], iters=2)
        double = katz_int_local([("a", "b"), ("a", "b")], iters=2)
        assert double["b"] > single["b"]

    def test_layout_independent(self):
        base = None
        for parts, nb in ((1, None), (5, 3), (11, 4)):
            got = {
                r["node"]: r["katz_scaled"]
                for r in katz_int(
                    _ds(EDGES * 3).repartition(parts),
                    iters=3, driver_max_edges=0, num_buckets=nb,
                ).take_all()
            }
            base = base or got
            assert got == base

    def test_empty(self):
        assert katz_int(_ds([])).take_all() == []
        assert katz_int_local([]) == {}


class TestGraphQueries:
    """k-hop BFS, shortest path, and node search vs networkx / the
    reference's scoring rules."""

    PAIRS = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
        ("a", "x"), ("x", "e"),                      # shortcut a-x-e
        ("isolated1", "isolated2"),
    ]

    def test_k_hop_matches_networkx(self):
        import networkx as nx

        hops = {
            r["entity"]: r["hop"]
            for r in k_hop_neighbors(_ds(self.PAIRS), ["a"], 2).take_all()
        }
        G = nx.Graph()
        G.add_edges_from(self.PAIRS)
        want = nx.single_source_shortest_path_length(G, "a", cutoff=2)
        assert hops == dict(want)

    def test_k_hop_directed(self):
        hops = {
            r["entity"]: r["hop"]
            for r in k_hop_neighbors(_ds(self.PAIRS), ["c"], 3, directed=True).take_all()
        }
        assert hops == {"c": 0, "d": 1, "e": 2}  # no backward edges

    def test_shortest_path(self):
        import networkx as nx

        path = shortest_path(_ds(self.PAIRS), "a", "e")
        G = nx.Graph()
        G.add_edges_from(self.PAIRS)
        assert len(path) == len(nx.shortest_path(G, "a", "e"))  # == 3 via x
        assert path[0] == "a" and path[-1] == "e"
        for u, v in zip(path, path[1:]):
            assert G.has_edge(u, v)
        assert shortest_path(_ds(self.PAIRS), "a", "isolated1") == []
        assert shortest_path(_ds(self.PAIRS), "a", "a") == ["a"]

    def test_graph_search_scoring(self):
        import pyarrow as pa
        import ray.data as rd

        nodes = rd.from_arrow(
            pa.table(
                {
                    "entity": pa.array(
                        ["order_block", "block", "blocker", "other"], pa.string()
                    ),
                    "type": pa.array(["concept"] * 4, pa.string()),
                    "label": pa.array([""] * 4, pa.string()),
                    "attrs": pa.array(
                        ['{"definition": "a block of orders"}', "{}", "{}",
                         '{"definition": "mentions block here"}'],
                        pa.string(),
                    ),
                }
            )
        )
        edges = _ds([("order_block", "block"), ("order_block", "blocker")]).map_batches(
            lambda b: pa.table(
                {
                    "src": b["src"], "dst": b["dst"],
                    "predicate": pa.array(["rel"] * len(b), pa.string()),
                    "inferred": pa.array([False] * len(b), pa.bool_()),
                    "chunk_id": pa.array([1] * len(b), pa.int32()),
                    "url": pa.array(["u"] * len(b), pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        res = graph_search(nodes, edges, "block", top_k=3)
        assert [r["node"] for r in res][:1] == ["block"]  # exact match wins (50+10)
        scores = {r["node"]: r["score"] for r in res}
        assert scores["block"] == 60
        assert scores["order_block"] == 15  # substring + definition
        # 'other' (definition only, score 5) ranks below substring hits
        assert [r["node"] for r in res] == ["block", "order_block", "blocker"]


class TestMultiSourceHopsGate:
    def test_khop_local_and_distributed_paths_identical(self):
        from ai_knowledge_graph_ray.stages.graph_algos import k_hop_neighbors

        pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("a", "x")]
        for hops in (1, 3):
            loc = sorted(
                (r["entity"], r["hop"])
                for r in k_hop_neighbors(_ds(pairs), ["a"], hops).take_all()
            )
            dist = sorted(
                (r["entity"], r["hop"])
                for r in k_hop_neighbors(
                    _ds(pairs), ["a"], hops, driver_max_edges=0
                ).take_all()
            )
            assert loc == dist and len(loc) > 0

    def test_local_and_distributed_paths_identical(self):
        from ai_knowledge_graph_ray.stages.graph_algos import multi_source_hops

        pairs = [
            ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
            ("x", "y"), ("a", "x"), ("b", "c"),  # dup edge
        ]
        for hops in (1, 2, 4):
            loc = sorted(
                (r["source"], r["entity"], r["hop"])
                for r in multi_source_hops(
                    _ds(pairs), ["a", "x"], hops
                ).take_all()
            )
            dist = sorted(
                (r["source"], r["entity"], r["hop"])
                for r in multi_source_hops(
                    _ds(pairs), ["a", "x"], hops, driver_max_edges=0
                ).take_all()
            )
            assert loc == dist and len(loc) > 0


class TestLabelPropagation:
    def test_two_cliques_split(self):
        from ai_knowledge_graph_ray.stages.graph_algos import (
            label_propagation_communities,
        )

        cl_a = [("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"), ("a2", "a4"), ("a3", "a4")]
        cl_b = [("b1", "b2"), ("b1", "b3"), ("b1", "b4"), ("b2", "b3"), ("b2", "b4"), ("b3", "b4")]
        labels = {
            r["entity"]: r["component"]
            for r in label_propagation_communities(
                _ds(cl_a + cl_b + [("a1", "b1")]), iters=4
            ).take_all()
        }
        a = {labels[f"a{i}"] for i in range(1, 5)}
        b = {labels[f"b{i}"] for i in range(1, 5)}
        assert len(a) == 1 and len(b) == 1 and a != b

    def test_local_and_distributed_paths_identical(self):
        from ai_knowledge_graph_ray.stages.graph_algos import (
            label_propagation_communities,
        )

        pairs = [
            ("a1", "a2"), ("a2", "a3"), ("a3", "a1"), ("a3", "a4"),
            ("b1", "b2"), ("b2", "b3"), ("hub", "a1"), ("hub", "b1"),
            ("a1", "a2"),  # duplicate edge: vote multiplicity must match
        ]
        for it in (1, 3, 5):
            loc = sorted(
                (r["entity"], r["component"])
                for r in label_propagation_communities(
                    _ds(pairs), iters=it
                ).take_all()
            )
            dist = sorted(
                (r["entity"], r["component"])
                for r in label_propagation_communities(
                    _ds(pairs), iters=it, driver_max_edges=0
                ).take_all()
            )
            assert loc == dist

    def test_deterministic_and_nodes_table_compatible(self):
        from ai_knowledge_graph_ray.stages.graph_algos import (
            label_propagation_communities,
        )
        from ai_knowledge_graph_ray.stages.materialize import nodes_table

        pairs = [("x", "y"), ("y", "z"), ("p", "q")]
        l1 = sorted(
            (r["entity"], r["component"])
            for r in label_propagation_communities(_ds(pairs), iters=3).take_all()
        )
        l2 = sorted(
            (r["entity"], r["component"])
            for r in label_propagation_communities(
                _ds(pairs).repartition(4), iters=3
            ).take_all()
        )
        assert l1 == l2
        import pyarrow as pa

        edges_full = _ds(pairs).map_batches(
            lambda b: pa.table(
                {
                    "src": b["src"], "dst": b["dst"],
                    "predicate": pa.array(["r"] * len(b), pa.string()),
                    "inferred": pa.array([False] * len(b), pa.bool_()),
                    "chunk_id": pa.array([1] * len(b), pa.int32()),
                    "url": pa.array(["u"] * len(b), pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        rows = nodes_table(
            edges_full, label_propagation_communities(_ds(pairs), iters=3)
        ).take_all()
        assert len(rows) == 5
        comm = {r["entity"]: r["community"] for r in rows}
        assert comm["p"] == comm["q"]
        assert comm["x"] != comm["p"]


class TestPathWithRelations:
    def test_relations_and_direction(self):
        import pyarrow as pa
        import ray.data as rd

        from ai_knowledge_graph_ray.stages.graph_algos import (
            shortest_path_with_relations,
        )

        rows = [("a", "b", "starts"), ("c", "b", "feeds"), ("c", "d", "ends")]
        edges = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([r[0] for r in rows], pa.string()),
                    "dst": pa.array([r[1] for r in rows], pa.string()),
                    "predicate": pa.array([r[2] for r in rows], pa.string()),
                }
            )
        )
        out = shortest_path_with_relations(edges, "a", "d")
        assert [o["relation"] for o in out] == ["starts", "feeds", "ends"]
        # the b->c hop only exists as the reverse edge c->b
        assert out[1] == {"from": "c", "to": "b", "relation": "feeds", "reversed": True}
        assert "reversed" not in out[0]
        assert shortest_path_with_relations(edges, "a", "zzz") == []


class TestHitsInt:
    EDGES = [("a", "b"), ("a", "c"), ("d", "b")]

    def _ds(self, pairs):
        return ray.data.from_items([{"src": s, "dst": d} for s, d in pairs])

    def test_hand_case_one_iter(self):
        from ai_knowledge_graph_ray.stages.graph_algos import hits_int_local

        # a points to both authorities -> top hub; b has in-degree 2 ->
        # top authority; d's single link to b scores 1e6*1e6//1.5e6
        assert hits_int_local(self.EDGES, iters=1, scale=10**6) == {
            "a": (1000000, 0),
            "b": (0, 1000000),
            "c": (0, 500000),
            "d": (666666, 0),
        }

    def test_gate_equivalence_random_graph(self):
        import numpy as np

        from ai_knowledge_graph_ray.stages.graph_algos import hits_int

        rng = np.random.RandomState(0)
        pairs = [(f"n{rng.randint(30)}", f"n{rng.randint(30)}") for _ in range(150)]
        ds = self._ds(pairs)
        local = hits_int(ds, iters=2).to_pandas().sort_values("node").reset_index(drop=True)
        dist = (
            hits_int(ds, iters=2, driver_max_edges=0)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert local.equals(dist)

    def test_float_power_iteration_pin(self):
        import numpy as np

        from ai_knowledge_graph_ray.stages.graph_algos import hits_int_local

        # independent float HITS (classic power iteration, max-norm)
        rng = np.random.RandomState(5)
        pairs = list({(f"n{rng.randint(25)}", f"n{rng.randint(25)}") for _ in range(120)})
        pairs = [(s, d) for s, d in pairs if s != d]
        nodes = sorted({x for e in pairs for x in e})
        ix = {v: i for i, v in enumerate(nodes)}
        m = np.zeros((len(nodes), len(nodes)))
        for s, d in pairs:
            m[ix[s], ix[d]] = 1.0
        h = np.ones(len(nodes))
        for _ in range(200):
            a = m.T @ h
            a /= a.max()
            h = m @ a
            h /= h.max()
        ours = hits_int_local(pairs, iters=50, scale=10**9)
        # same top hub/authority, and scaled scores within 1e-6 relative
        assert max(ours, key=lambda v: (ours[v][0], v)) == nodes[int(np.argmax(h))]
        assert max(ours, key=lambda v: (ours[v][1], v)) == nodes[int(np.argmax(a))]
        for v in nodes:
            assert abs(ours[v][0] / 10**9 - h[ix[v]]) < 1e-6
            assert abs(ours[v][1] / 10**9 - a[ix[v]]) < 1e-6

    def test_empty(self):
        from ai_knowledge_graph_ray.stages.graph_algos import hits_int

        out = hits_int(self._ds([]).filter(lambda r: False), iters=2)
        assert out.count() == 0


class TestPprInt:
    def test_distributed_equals_local_bitexact(self):
        from ai_knowledge_graph_ray.stages.graph_algos import ppr_int, ppr_int_local

        seeds = ("a", "c")
        local = ppr_int_local(EDGES, seeds, iters=4)
        dist = {
            r["node"]: r["ppr_scaled"]
            for r in ppr_int(_ds(EDGES), seeds, iters=4, driver_max_edges=0).take_all()
        }
        assert dist == local

    def test_gate_path_equals_scale_path(self):
        from ai_knowledge_graph_ray.stages.graph_algos import ppr_int

        seeds = ("b",)
        gated = {
            r["node"]: r["ppr_scaled"]
            for r in ppr_int(_ds(EDGES), seeds, iters=3).take_all()
        }
        dist = {
            r["node"]: r["ppr_scaled"]
            for r in ppr_int(_ds(EDGES), seeds, iters=3, driver_max_edges=0).take_all()
        }
        assert gated == dist

    def test_mass_concentrates_near_seeds(self):
        from ai_knowledge_graph_ray.stages.graph_algos import ppr_int_local

        # seed at 'a': its direct successor 'b' must outrank the node
        # 'f' that is unreachable from the seed
        r = ppr_int_local(EDGES, ("a",), iters=10)
        assert r["b"] > r["f"]
        assert r["a"] > 0

    def test_no_seeds_in_graph_empty(self):
        from ai_knowledge_graph_ray.stages.graph_algos import ppr_int, ppr_int_local

        assert ppr_int_local(EDGES, ("zz",), iters=3) == {}
        assert ppr_int(_ds(EDGES), ("zz",), iters=3).take_all() == []
        assert ppr_int(_ds(EDGES), ("zz",), iters=3, driver_max_edges=0).take_all() == []


class TestSccLabels:
    # 3-cycle {1,2,3}, bridge 3->4, 2-cycle {4,5}, isolated 6
    SCC_EDGES = [
        ("1", "2"), ("2", "3"), ("3", "1"),
        ("3", "4"), ("4", "5"), ("5", "4"),
    ]
    WANT = {"1": "1", "2": "1", "3": "1", "4": "4", "5": "4", "6": "6"}

    def test_components_and_canonical_labels(self):
        from ai_knowledge_graph_ray.stages.graph_algos import scc_labels

        nodes = sorted(self.WANT)
        got = {
            r["entity"]: r["scc_id"]
            for r in scc_labels(_ds(self.SCC_EDGES), nodes).take_all()
        }
        assert got == self.WANT

    def test_bridge_direction_matters(self):
        from ai_knowledge_graph_ray.stages.graph_algos import scc_labels

        # adding the reverse bridge 4->3 merges everything reachable
        edges = self.SCC_EDGES + [("4", "3")]
        got = {
            r["entity"]: r["scc_id"]
            for r in scc_labels(_ds(edges), sorted(self.WANT)).take_all()
        }
        assert got == {"1": "1", "2": "1", "3": "1", "4": "1", "5": "1", "6": "6"}

    def test_gate_path_equals_scale_path(self):
        from ai_knowledge_graph_ray.stages.graph_algos import scc_labels

        nodes = sorted(self.WANT)
        dist = {
            r["entity"]: r["scc_id"]
            for r in scc_labels(
                _ds(self.SCC_EDGES).repartition(5), nodes,
                num_buckets=2, driver_max_edges=0,
            ).take_all()
        }
        assert dist == self.WANT


class TestTreeRollup:
    @staticmethod
    def _ds_vals(vals: dict):
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(list(vals), pa.int64()),
                    "value": pa.array(list(vals.values()), pa.int64()),
                }
            )
        )

    @staticmethod
    def _ds_edges(parents: dict):
        return ray.data.from_arrow(
            pa.table(
                {
                    "child": pa.array(list(parents), pa.int64()),
                    "parent": pa.array(list(parents.values()), pa.int64()),
                }
            )
        )

    # small two-tree forest: 1 -> (2, 3), 2 -> (4, 5); 9 isolated root
    VALS = {1: 10, 2: 20, 3: 30, 4: 40, 5: 50, 9: 7}
    PARS = {2: 1, 3: 1, 4: 2, 5: 2}
    WANT = {1: 150, 2: 110, 3: 30, 4: 40, 5: 50, 9: 7}

    def test_local_twin(self):
        from ai_knowledge_graph_ray.stages.graph_algos import tree_rollup_local

        assert tree_rollup_local(self.VALS, self.PARS) == self.WANT

    def test_gate_path_equals_scale_path(self):
        from ai_knowledge_graph_ray.stages.graph_algos import tree_rollup

        for gate in (2_000_000, 0):  # driver twin vs forced distributed
            got = {
                r["node"]: r["subtree_value"]
                for r in tree_rollup(
                    self._ds_vals(self.VALS),
                    self._ds_edges(self.PARS),
                    driver_max_edges=gate,
                ).take_all()
            }
            assert got == self.WANT

    def test_valueless_ancestor_gets_carrier_row(self):
        from ai_knowledge_graph_ray.stages.graph_algos import tree_rollup

        # node 1 has no value row of its own, only children
        for gate in (2_000_000, 0):
            got = {
                r["node"]: r["subtree_value"]
                for r in tree_rollup(
                    self._ds_vals({2: 5, 3: 6}),
                    self._ds_edges({2: 1, 3: 1}),
                    driver_max_edges=gate,
                ).take_all()
            }
            assert got == {1: 11, 2: 5, 3: 6}

    def test_deep_chain_doubling(self):
        from ai_knowledge_graph_ray.stages.graph_algos import tree_rollup

        # chain 0 <- 1 <- ... <- 30: subtree(k) = sum over j >= k
        n = 31
        vals = {i: i for i in range(n)}
        pars = {i: i - 1 for i in range(1, n)}
        got = {
            r["node"]: r["subtree_value"]
            for r in tree_rollup(
                self._ds_vals(vals), self._ds_edges(pars), driver_max_edges=0
            ).take_all()
        }
        assert got == {k: sum(range(k, n)) for k in range(n)}

    def test_cycle_raises(self):
        from ai_knowledge_graph_ray.stages.graph_algos import (
            tree_rollup,
            tree_rollup_local,
        )

        with pytest.raises(ValueError, match="cycle"):
            tree_rollup_local({1: 1, 2: 1}, {1: 2, 2: 1})
        with pytest.raises(ValueError, match="cycle|depth"):
            tree_rollup(
                self._ds_vals({1: 1, 2: 1}),
                self._ds_edges({1: 2, 2: 1}),
                driver_max_edges=0,
                max_depth=6,
            ).materialize()

    def test_layout_independent(self):
        from ai_knowledge_graph_ray.stages.graph_algos import tree_rollup

        for parts, nb in ((1, None), (5, 3), (9, 4)):
            got = {
                r["node"]: r["subtree_value"]
                for r in tree_rollup(
                    self._ds_vals(self.VALS).repartition(parts),
                    self._ds_edges(self.PARS).repartition(parts),
                    driver_max_edges=0,
                    num_buckets=nb,
                ).take_all()
            }
            assert got == self.WANT
