"""Capacity-constrained LPA partitioning: capacity invariant, gate
equivalence (driver twin vs forced-distributed rounds), layout
independence, and cut improvement on a planted community graph."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data


def _edges_ds(pairs):
    return ray.data.from_pandas(pd.DataFrame(pairs, columns=["src", "dst"]))


def _parts(res) -> dict[str, int]:
    df = res.to_pandas()
    return dict(zip(df["node"], df["partition"]))


def _two_cliques(n=8):
    pairs = []
    for grp, prefix in ((range(n), "a"), (range(n), "b")):
        names = [f"{prefix}{i}" for i in grp]
        pairs += [(u, v) for i, u in enumerate(names) for v in names[i + 1:]]
    pairs.append(("a0", "b0"))  # one bridge
    return pairs


def _cut(pairs, parts) -> int:
    return sum(1 for u, v in pairs if u != v and parts[u] != parts[v])


class TestCapacityPartition:
    def test_two_cliques_converge_and_respect_capacity(self):
        from ai_knowledge_graph_ray.stages.graph_algos import capacity_partition

        pairs = _two_cliques()
        parts = _parts(capacity_partition(_edges_ds(pairs), k=2, iters=8))
        assert set(parts) == {f"a{i}" for i in range(8)} | {f"b{i}" for i in range(8)}
        # capacity default = ceil(1.1 * 16/2) = 9
        sizes = pd.Series(list(parts.values())).value_counts()
        assert sizes.max() <= 9
        # each clique ends in ONE partition (the bridge edge may or
        # may not be cut depending on which side a0/b0 land)
        assert len({parts[f"a{i}"] for i in range(8)}) == 1
        assert len({parts[f"b{i}"] for i in range(8)}) == 1
        # cut strictly improves over the initial hash partition
        from ai_knowledge_graph_ray.stages.graph_algos import _node_rank

        nodes = pd.Series(sorted(parts))
        init = dict(zip(nodes, (_node_rank(nodes) % np.uint64(2)).astype(int)))
        assert _cut(pairs, parts) <= _cut(pairs, init)

    def test_forced_distributed_matches_driver_twin(self):
        from ai_knowledge_graph_ray.stages.graph_algos import capacity_partition

        pairs = _two_cliques(5)
        a = _parts(capacity_partition(_edges_ds(pairs), k=2, iters=4))
        b = _parts(
            capacity_partition(
                _edges_ds(pairs), k=2, iters=4, driver_max_edges=0
            )
        )
        assert a == b

    def test_layout_independent(self):
        from ai_knowledge_graph_ray.stages.graph_algos import capacity_partition

        pairs = _two_cliques(5)
        a = _parts(
            capacity_partition(
                _edges_ds(pairs), k=2, iters=4, driver_max_edges=0
            )
        )
        b = _parts(
            capacity_partition(
                _edges_ds(pairs).repartition(7), k=2, iters=4,
                driver_max_edges=0,
            )
        )
        assert a == b

    def test_tight_capacity_blocks_overflow(self):
        from ai_knowledge_graph_ray.stages.graph_algos import capacity_partition

        # a star wants every leaf in the hub's partition; capacity 3
        # admits at most 3 nodes per partition regardless
        pairs = [("hub", f"leaf{i}") for i in range(6)]
        parts = _parts(
            capacity_partition(_edges_ds(pairs), k=4, capacity=3, iters=6)
        )
        sizes = pd.Series(list(parts.values())).value_counts()
        assert sizes.max() <= 3

    def test_empty(self):
        from ai_knowledge_graph_ray.stages.graph_algos import capacity_partition

        out = capacity_partition(
            _edges_ds([("x", "x")])  # self-loop only -> empty simple graph
        ).to_pandas()
        assert len(out) == 0
