"""k-core peeling: networkx pin + forced-distributed equivalence on
both membership-filter paths; deterministic shuffle-shard assignment."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import k_core, k_core_local
from ai_knowledge_graph_ray.stages.packing import shuffle_shards


def _random_edges(seed: int, n_nodes: int, n_edges: int) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n_nodes, size=n_edges)
    dst = rng.randint(0, n_nodes, size=n_edges)
    return pd.DataFrame(
        {"src": [f"n{i}" for i in src], "dst": [f"n{i}" for i in dst]}
    )


def _nx_core_nodes(df: pd.DataFrame, k: int) -> list[str]:
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(
        (a, b) for a, b in zip(df["src"], df["dst"]) if a != b
    )
    return sorted(nx.k_core(g, k).nodes())


class TestKCore:
    def test_matches_networkx(self):
        df = _random_edges(3, 60, 400)
        ds = ray.data.from_pandas(df).repartition(5)
        for k in (2, 3, 5):
            got = sorted(r["node"] for r in k_core(ds, k).take_all())
            assert got == _nx_core_nodes(df, k), f"k={k}"

    def test_distributed_broadcast_path_equivalent(self):
        df = _random_edges(7, 80, 500)
        ds = ray.data.from_pandas(df).repartition(4)
        local = sorted(r["node"] for r in k_core(ds, 3).take_all())
        dist = sorted(
            r["node"]
            for r in k_core(ds, 3, driver_max_edges=0).take_all()
        )
        assert dist == local

    def test_distributed_join_path_equivalent(self):
        df = _random_edges(11, 50, 300)
        ds = ray.data.from_pandas(df).repartition(3)
        local = sorted(r["node"] for r in k_core(ds, 2).take_all())
        dist = sorted(
            r["node"]
            for r in k_core(
                ds, 2, driver_max_edges=0, driver_max_nodes=0
            ).take_all()
        )
        assert dist == local

    def test_empty_core(self):
        # a path graph has no 3-core
        df = pd.DataFrame(
            {"src": ["a", "b", "c"], "dst": ["b", "c", "d"]}
        )
        assert k_core(ray.data.from_pandas(df), 3).count() == 0

    def test_local_twin_peels_transitively(self):
        # triangle + pendant chain: 2-core is exactly the triangle
        # (peeling the chain exposes new degree-1 nodes each round)
        df = pd.DataFrame(
            {
                "src": ["a", "b", "c", "c", "d", "e"],
                "dst": ["b", "c", "a", "d", "e", "f"],
            }
        )
        got = sorted(r["node"] for r in k_core(ray.data.from_pandas(df), 2).take_all())
        assert got == ["a", "b", "c"]


class TestShuffleShards:
    def test_assignment_matches_formula_and_balances(self):
        ids = np.arange(10_000, dtype="int64")
        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(7)
        out = (
            shuffle_shards(ds, n_shards=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        rank = (ids * 48271) % 2147483647
        assert (out["shard_rank"].to_numpy() == rank).all()
        assert (out["shard_id"].to_numpy() == rank % 8).all()
        sizes = out["shard_id"].value_counts()
        assert len(sizes) == 8
        # pseudo-random balance: no shard more than 20% off even split
        assert sizes.max() < 1250 * 1.2 and sizes.min() > 1250 * 0.8

    def test_permutation_covers_all_rows_once(self):
        ids = np.arange(777, dtype="int64") * 13 + 5
        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids}))
        out = shuffle_shards(ds, n_shards=4).to_pandas()
        assert len(out) == 777 and out["doc_id"].is_unique
