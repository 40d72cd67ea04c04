"""Temporal reachability (earliest arrival) and exact heavy hitters:
pinned semantics, forced-gate (distributed) equivalence, brute-force
ground truth under randomized layouts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.graph_algos import (
    temporal_reachability,
    temporal_reachability_local,
)
from ai_knowledge_graph_ray.stages.sketches import exact_heavy_hitters


def _out(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("entity").reset_index(drop=True)


class TestTemporalReachability:
    def test_pinned_semantics(self):
        # a->b@5 then b->c@3 is NOT time-respecting; b->c@7 is.
        # waiting is free; equal-timestamp chaining (d@5 -> e@5) counts.
        edges = pd.DataFrame(
            {
                "src": ["a", "b", "b", "a", "d"],
                "dst": ["b", "c", "c", "d", "e"],
                "ts": [5, 3, 7, 5, 5],
            }
        )
        out = _out(
            temporal_reachability(ray.data.from_pandas(edges), ["a"], start=0)
        ).set_index("entity")["arrival"]
        assert out.to_dict() == {"a": 0, "b": 5, "c": 7, "d": 5, "e": 5}

    def test_edge_into_past_unreachable(self):
        edges = pd.DataFrame(
            {"src": ["a", "b"], "dst": ["b", "c"], "ts": [10, 2]}
        )
        out = _out(
            temporal_reachability(ray.data.from_pandas(edges), ["a"], start=0)
        )
        assert set(out["entity"]) == {"a", "b"}  # c never reached

    def test_start_time_gates_first_edge(self):
        edges = pd.DataFrame({"src": ["a"], "dst": ["b"], "ts": [4]})
        early = _out(
            temporal_reachability(ray.data.from_pandas(edges), ["a"], start=5)
        )
        assert set(early["entity"]) == {"a"}
        late = _out(
            temporal_reachability(ray.data.from_pandas(edges), ["a"], start=4)
        )
        assert set(late["entity"]) == {"a", "b"}

    def test_forced_gate_equivalence(self):
        rng = np.random.RandomState(11)
        n = 400
        edges = pd.DataFrame(
            {
                "src": [f"n{x}" for x in rng.randint(0, 60, n)],
                "dst": [f"n{x}" for x in rng.randint(0, 60, n)],
                "ts": rng.randint(0, 50, n).astype(np.int64),
            }
        )
        ds = ray.data.from_pandas(edges).repartition(6)
        seeds = ["n0", "n7"]
        fast = _out(temporal_reachability(ds, seeds, start=0))
        slow = _out(
            temporal_reachability(
                ds, seeds, start=0, driver_max_edges=0, num_buckets=3
            )
        )
        pd.testing.assert_frame_equal(fast, slow)

    def test_local_twin_equal_timestamp_fixpoint(self):
        # chain entirely at one timestamp needs the re-sweep, and the
        # result must not depend on edge order
        edges = pd.DataFrame(
            {"src": ["c", "b", "a"], "dst": ["d", "c", "b"], "ts": [5, 5, 5]}
        )
        out = temporal_reachability_local(edges, ["a"], 0)
        assert set(out["entity"]) == {"a", "b", "c", "d"}
        assert (out.set_index("entity")["arrival"].loc[["b", "c", "d"]] == 5).all()


def _zipf_values(rng, n):
    ranks = rng.zipf(1.3, n)
    return pd.Series([f"v{r}" for r in ranks], dtype=object)


class TestExactHeavyHitters:
    def _truth(self, vals: pd.Series, denom: int) -> pd.DataFrame:
        vc = vals.value_counts()
        keep = vc[vc * denom >= len(vals)]
        return (
            pd.DataFrame({"value": keep.index.astype(object), "cnt": keep.to_numpy(np.int64)})
            .sort_values("value")
            .reset_index(drop=True)
        )

    def test_exact_vs_bruteforce_both_paths(self):
        rng = np.random.RandomState(3)
        vals = _zipf_values(rng, 20_000)
        ds = ray.data.from_pandas(pd.DataFrame({"value": vals})).repartition(7)
        truth = self._truth(vals, 100)
        got = (
            exact_heavy_hitters(ds, "value", denom=100)
            .to_pandas().sort_values("value").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, truth)
        # forced semi-join path (broadcast gate shut)
        joiny = (
            exact_heavy_hitters(
                ds, "value", denom=100, candidate_broadcast_max=0, num_buckets=3
            )
            .to_pandas().sort_values("value").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(joiny, truth)

    def test_layout_independent_near_threshold(self):
        # values sitting exactly AT the threshold must survive any
        # block layout (the candidate rule is per-block)
        n, denom = 5000, 50
        base = [f"pad{i}" for i in range(n - 2 * (n // denom))]
        hot = ["hh1"] * (n // denom) + ["hh2"] * (n // denom)
        vals = pd.Series(base + hot, dtype=object)
        truth = self._truth(vals, denom)
        assert set(truth["value"]) == {"hh1", "hh2"}
        rng = np.random.RandomState(9)
        for parts in (2, 5, 13):
            shuffled = vals.sample(frac=1.0, random_state=rng).reset_index(drop=True)
            ds = ray.data.from_pandas(
                pd.DataFrame({"value": shuffled})
            ).repartition(parts)
            got = (
                exact_heavy_hitters(ds, "value", denom=denom)
                .to_pandas().sort_values("value").reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, truth)

    def test_empty_input(self):
        ds = ray.data.from_pandas(pd.DataFrame({"value": pd.Series([], dtype=object)}))
        assert exact_heavy_hitters(ds, "value", denom=10).count() == 0


class TestWeightedSssp:
    def test_matches_networkx_bounded(self):
        import networkx as nx

        from ai_knowledge_graph_ray.stages.graph_algos import weighted_sssp

        rng = np.random.RandomState(51)
        n = 300
        df = pd.DataFrame(
            {
                "src": [f"n{x}" for x in rng.randint(0, 50, n)],
                "dst": [f"n{x}" for x in rng.randint(0, 50, n)],
                "w": rng.randint(1, 8, n).astype(np.int64),
            }
        )
        limit = 10
        got = (
            weighted_sssp(ray.data.from_pandas(df), ["n0", "n3"],
                          dist_limit=limit)
            .to_pandas().set_index("entity")["dist"].to_dict()
        )
        g = nx.MultiDiGraph()
        for r in df.itertuples(index=False):
            g.add_edge(r.src, r.dst, weight=int(r.w))
        want = {}
        for s in ("n0", "n3"):
            if s not in g:
                want.setdefault(s, 0)
                continue
            for node, d in nx.single_source_dijkstra_path_length(
                g, s, cutoff=limit, weight="weight"
            ).items():
                want[node] = min(want.get(node, limit + 1), int(d))
        assert got == want

    def test_parallel_edges_take_cheapest(self):
        from ai_knowledge_graph_ray.stages.graph_algos import weighted_sssp

        df = pd.DataFrame(
            {"src": ["a", "a", "b"], "dst": ["b", "b", "c"], "w": [9, 2, 3]}
        )
        got = (
            weighted_sssp(ray.data.from_pandas(df), ["a"], dist_limit=100)
            .to_pandas().set_index("entity")["dist"].to_dict()
        )
        assert got == {"a": 0, "b": 2, "c": 5}

    def test_forced_gate_equivalence(self):
        from ai_knowledge_graph_ray.stages.graph_algos import weighted_sssp

        rng = np.random.RandomState(52)
        df = pd.DataFrame(
            {
                "src": [f"n{x}" for x in rng.randint(0, 25, 120)],
                "dst": [f"n{x}" for x in rng.randint(0, 25, 120)],
                "w": rng.randint(1, 5, 120).astype(np.int64),
            }
        )
        ds = ray.data.from_pandas(df).repartition(4)
        fast = (
            weighted_sssp(ds, ["n1"], dist_limit=7)
            .to_pandas().sort_values("entity").reset_index(drop=True)
        )
        slow = (
            weighted_sssp(
                ds, ["n1"], dist_limit=7, driver_max_edges=0, num_buckets=3
            )
            .to_pandas().sort_values("entity").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, slow)
