"""Tests for the link-prediction eval harness and the HLL sketch
rollup: planted held-out-edge hit, and bit-identity of rolled-up
estimates with direct sketches."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data


class TestHllRollup:
    def _events(self):
        rng = np.random.default_rng(7)
        n = 3000
        return pd.DataFrame(
            {
                "day": rng.integers(0, 3, n).astype(str),
                "event_type": np.where(rng.random(n) < 0.5, "view", "click"),
                "user_id": rng.integers(0, 400, n),
            }
        )

    def test_rollup_matches_direct_sketch_bit_for_bit(self):
        from ai_knowledge_graph_ray.stages.sketches import hll_distinct, hll_rollup

        df = self._events()
        ds = ray.data.from_pandas(df).repartition(4)
        out = hll_rollup(
            ds, "user_id", [["day", "event_type"], ["day"], []]
        ).to_pandas()
        # per-day rollup == direct per-day sketch (register max-merge
        # is exact, so the estimates are identical integers)
        direct_day = hll_distinct(
            ray.data.from_pandas(df).repartition(4), "user_id", ["day"]
        ).to_pandas()
        roll_day = out[out["level"] == "day"].set_index("key")["approx_distinct"]
        for _, r in direct_day.iterrows():
            assert roll_day[str(r["day"])] == r["approx_distinct"]
        # global rollup == direct global sketch
        direct_all = hll_distinct(
            ray.data.from_pandas(df).repartition(4), "user_id"
        ).to_pandas()
        got_all = out[out["level"] == "<all>"]["approx_distinct"].iloc[0]
        assert got_all == direct_all["approx_distinct"].iloc[0]

    def test_levels_are_complete(self):
        from ai_knowledge_graph_ray.stages.sketches import hll_rollup

        df = self._events()
        out = hll_rollup(
            ray.data.from_pandas(df), "user_id",
            [["day", "event_type"], ["day"], []],
        ).to_pandas()
        assert (out["level"] == "day,event_type").sum() == 6
        assert (out["level"] == "day").sum() == 3
        assert (out["level"] == "<all>").sum() == 1


class TestLinkPredEvalShape:
    def test_accuracy_is_reasonable_on_fixture(self):
        # the sf0.001 fixture graph has dense triangles; the harness
        # must find at least one held-out edge among the predictions
        from ai_knowledge_graph_ray.pipelines.queries import q_link_pred_eval

        out = q_link_pred_eval("/root/testdata/sf0.001")
        r = out.iloc[0]
        assert r["k"] == 100
        assert r["n_test"] > 0
        assert 0 <= r["n_hits"] <= min(100, r["n_test"])

    def test_split_is_deterministic(self):
        from ai_knowledge_graph_ray.pipelines.queries import q_link_pred_eval

        a = q_link_pred_eval("/root/testdata/sf0.001")
        b = q_link_pred_eval("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(a, b)


class TestGraphLcc:
    def test_planted_triangle_plus_pendant(self, tmp_path, monkeypatch):
        import pyarrow as pa
        import ray.data

        from ai_knowledge_graph_ray.pipelines import queries as Q

        # triangle a-b-c plus pendant d hanging off a
        edges = pd.DataFrame(
            {"src": ["a", "b", "c", "a"], "dst": ["b", "c", "a", "d"]}
        )

        monkeypatch.setattr(
            Q, "_cnrs_edges", lambda sf: ray.data.from_pandas(edges)
        )
        out = Q.q_graph_lcc("ignored").to_pandas().set_index("node")
        assert out.loc["b", "n_triangles"] == 1
        assert out.loc["b", "lcc_num"] == 2 and out.loc["b", "lcc_den"] == 2
        # a has degree 3 (b, c, d), one triangle -> 2/6
        assert out.loc["a", "lcc_num"] == 2 and out.loc["a", "lcc_den"] == 6
        # pendant d: zero triangles, den 0
        assert out.loc["d", "n_triangles"] == 0 and out.loc["d", "lcc_den"] == 0


class TestPartitionQuality:
    def test_report_invariants(self):
        from ai_knowledge_graph_ray.pipelines.queries import q_link_partition_quality

        out = q_link_partition_quality("/root/testdata/sf0.001")
        r = out.iloc[0]
        assert r["n_edges"] >= 1
        assert r["n_edges_labeled"] == r["n_edges"]
        assert r["cut_ok"] == 1


class TestGraphVoronoi:
    def test_tie_breaks_to_smaller_seed(self, monkeypatch):
        import pyarrow as pa
        import ray.data

        from ai_knowledge_graph_ray.pipelines import queries as Q

        # path r0 - m - r1: m is 1 hop from BOTH seeds -> r0 wins
        edges = pd.DataFrame(
            {"src": ["r0", "r1"], "dst": ["m", "m"]}
        )
        monkeypatch.setattr(
            Q, "_cnrs_edges", lambda sf: ray.data.from_pandas(edges)
        )
        monkeypatch.setattr(
            Q.pd, "read_parquet", Q.pd.read_parquet
        )
        import pyarrow.parquet as pq_mod

        real_read = pq_mod.read_table

        def _fake_read(path, columns=None):
            if "region" in str(path):
                return pa.Table.from_pandas(
                    pd.DataFrame({"r_regionkey": [0, 1]})
                )
            return real_read(path, columns=columns)

        monkeypatch.setattr(pq_mod, "read_table", _fake_read)
        out = Q.q_graph_voronoi("ignored").to_pandas().set_index("entity")
        assert out.loc["m", "seed"] == "r0" and out.loc["m", "hop"] == 1
        assert out.loc["r1", "seed"] == "r1" and out.loc["r1", "hop"] == 0
