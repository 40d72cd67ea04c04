"""Property-style tests (pure pandas/python — no Ray) for the
driver twins of the fifteenth-session graph operators, plus planted
tests for the anomalous-hours and Pareto queries (which do run Ray).

The twins ARE the semantics over the count gate, so invariants proved
here hold for the distributed paths via the existing gate-equivalence
tests."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _rand_graph(rng: random.Random, n: int, m: int) -> pd.DataFrame:
    pairs = set()
    while len(pairs) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((f"n{min(a,b)}", f"n{max(a,b)}"))
    return pd.DataFrame(sorted(pairs), columns=["a", "b"])


class TestColoringLocalProperties:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_proper_and_equals_sequential_greedy(self, seed):
        from ai_knowledge_graph_ray.stages.graph_algos import (
            _node_rank,
            coloring_local,
        )

        rng = random.Random(seed)
        und = _rand_graph(rng, 30, 60)
        out = coloring_local(und)
        colors = dict(zip(out["node"], out["color"]))
        adj: dict[str, set] = {}
        for a, b in zip(und["a"], und["b"]):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        # proper
        for a, b in zip(und["a"], und["b"]):
            assert colors[a] != colors[b]
        # equals an independent re-derivation of sequential greedy
        nodes = pd.Series(sorted(adj))
        ranks = dict(zip(nodes, _node_rank(nodes)))
        ref: dict[str, int] = {}
        for v in sorted(adj, key=lambda x: (ranks[x], x)):
            used = {ref[u] for u in adj[v] if u in ref}
            c = 0
            while c in used:
                c += 1
            ref[v] = c
        assert colors == ref
        # Delta+1 bound
        delta = max(len(s) for s in adj.values())
        assert max(colors.values()) <= delta


class TestPartitionLocalProperties:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_capacity_never_exceeded_and_deterministic(self, seed):
        from ai_knowledge_graph_ray.stages.graph_algos import partition_local

        rng = random.Random(seed)
        und = _rand_graph(rng, 40, 90)
        cap = 12
        out1 = partition_local(und, k=4, capacity=cap, iters=6)
        out2 = partition_local(
            und.sample(frac=1.0, random_state=7).reset_index(drop=True),
            k=4, capacity=cap, iters=6,
        )
        sizes = out1["partition"].value_counts()
        assert sizes.max() <= cap
        # row-order independent
        pd.testing.assert_frame_equal(
            out1.reset_index(drop=True), out2.reset_index(drop=True)
        )

    def test_moves_only_improve_local_vote(self):
        from ai_knowledge_graph_ray.stages.graph_algos import partition_local

        # a node fully surrounded by one partition must end there
        # (capacity permitting): hub with 5 neighbors
        und = pd.DataFrame(
            [("hub", f"x{i}") for i in range(5)]
            + [(f"x{i}", f"x{(i+1) % 5}") for i in range(5)],
            columns=["a", "b"],
        )
        out = partition_local(und, k=2, capacity=6, iters=6)
        parts = dict(zip(out["node"], out["partition"]))
        leaf_parts = pd.Series([parts[f"x{i}"] for i in range(5)])
        if leaf_parts.nunique() == 1:
            assert parts["hub"] == leaf_parts.iloc[0]


class TestAnomalousHours:
    def test_planted_spike(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_events_anomalous_hours

        # 20 calm hours at 10 events, one spike hour at 100
        rows = []
        t0 = pd.Timestamp("2020-01-01")
        for h in range(20):
            rows += [t0 + pd.Timedelta(hours=h, seconds=s) for s in range(10)]
        rows += [
            t0 + pd.Timedelta(hours=30, seconds=s) for s in range(100)
        ]
        ev = pd.DataFrame({"ts": pd.Series(rows).astype("datetime64[us]")})
        pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
        out = q_events_anomalous_hours(str(tmp_path))
        df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
        if isinstance(out, pa.Table):
            df = out.to_pandas()
        assert list(df["n"]) == [100]

    def test_uniform_counts_no_anomaly_keeps_schema(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_events_anomalous_hours

        t0 = pd.Timestamp("2020-01-01")
        rows = [t0 + pd.Timedelta(hours=h) for h in range(12)]
        ev = pd.DataFrame({"ts": pd.Series(rows).astype("datetime64[us]")})
        pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
        out = q_events_anomalous_hours(str(tmp_path))
        assert isinstance(out, pa.Table)
        assert out.num_rows == 0 and out.column_names == ["hour", "n"]


class TestCustomerPareto:
    def test_planted_concentration(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_customer_pareto

        # revenue cents: c1=8000, c2=1000, c3=1000 -> total 10000;
        # 80% reached by c1 alone
        orders = pd.DataFrame(
            {
                "o_custkey": [1, 1, 2, 3],
                "o_totalprice": [50.0, 30.0, 10.0, 10.0],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet")
        )
        out = q_customer_pareto(str(tmp_path))
        r = out.iloc[0]
        assert r["n_customers_80pct"] == 1
        assert r["n_customers"] == 3
        assert r["total_cents"] == 10000
