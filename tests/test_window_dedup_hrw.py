"""TTL-window dedup flags and rendezvous-hash shard stability."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.packing import hrw_assign, hrw_stability
from ai_knowledge_graph_ray.stages.sessions import window_dedup


def _events(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "key": pa.array([r[1] for r in rows], pa.string()),
                "ts_us": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


class TestWindowDedup:
    def test_ttl_semantics(self):
        # key a: t=0, t=50 (dup), t=200 (expired -> not dup),
        #         t=249 (dup of the t=200 one)
        # key b: t=60 only
        rows = [
            (1, "a", 0), (2, "a", 50), (3, "a", 200), (4, "a", 249),
            (5, "b", 60),
        ]
        out = (
            window_dedup(_events(rows), ["key"], "ts_us", "event_id", ttl_us=100)
            .to_pandas()
            .set_index("event_id")["is_dup"]
        )
        assert dict(out) == {1: 0, 2: 1, 3: 0, 4: 1, 5: 0}

    def test_exact_ttl_boundary_is_dup(self):
        rows = [(1, "k", 0), (2, "k", 100)]
        out = (
            window_dedup(_events(rows), ["key"], "ts_us", "event_id", ttl_us=100)
            .to_pandas()
            .set_index("event_id")["is_dup"]
        )
        assert dict(out) == {1: 0, 2: 1}

    def test_layout_independence(self):
        rng = np.random.default_rng(13)
        rows = [
            (i, f"k{int(rng.integers(0, 5))}", int(rng.integers(0, 1000)))
            for i in range(300)
        ]
        a = (
            window_dedup(_events(rows), ["key"], "ts_us", "event_id", ttl_us=40)
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        b = (
            window_dedup(
                _events(rows).repartition(7), ["key"], "ts_us", "event_id",
                ttl_us=40,
            )
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestHrw:
    def test_assign_matches_bruteforce_argmax(self):
        from ai_knowledge_graph_ray.stages.packing import hrw_rank

        ids = np.arange(0, 500, dtype=np.int64)
        got = hrw_assign(ids, 5)
        scores = np.stack([hrw_rank(ids, s) for s in range(5)], axis=1)
        assert (got == scores.argmax(axis=1)).all()
        assert set(got) == set(range(5))  # all shards used

    def test_stability_moves_about_one_in_n_plus_one(self):
        ids = pd.DataFrame({"doc_id": np.arange(0, 20000, dtype=np.int64)})
        ds = ray.data.from_pandas(ids)
        rep = hrw_stability(ds, "doc_id", n_shards=7).iloc[0]
        assert rep["n_rows"] == 20000
        # expected ~1/8 = 125 permille; generous band
        assert 80 <= rep["moved_permille"] <= 180

    def test_only_moves_to_the_new_shard(self):
        ids = np.arange(0, 5000, dtype=np.int64)
        before = hrw_assign(ids, 7)
        after = hrw_assign(ids, 8)
        moved = before != after
        assert (after[moved] == 7).all()  # HRW invariant
