"""Exponential-decay scores and grouped centroid sums: hand cases,
pandas twins, layout independence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.clustering import grouped_centroid_sums
from ai_knowledge_graph_ray.stages.sessions import decayed_counts


class TestDecayedCounts:
    def _events(self) -> pd.DataFrame:
        base = pd.Timestamp("2026-01-02 10:00:00")
        return pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2, 2],
                "ts": [
                    base,                                # age 0
                    base - pd.Timedelta(hours=1),        # age 1
                    base - pd.Timedelta(hours=3),        # age 3
                    base - pd.Timedelta(minutes=30),     # age 1 (floor bucket)
                    base - pd.Timedelta(hours=100),      # deep decay -> 0
                ],
                "value": [8.0, 8.0, 8.0, 4.0, 5.0],
            }
        )

    def test_hand_values(self):
        out = (
            decayed_counts(ray.data.from_pandas(self._events()).repartition(3))
            .to_pandas()
            .set_index("user_id")["decayed_cents"]
            .to_dict()
        )
        # user 1: 800//1 + 800//2 + 800//8 = 800+400+100
        # user 2: ts at -30min is in the PREVIOUS hour bucket -> age 1
        #         400//2 = 200; the 100h-old event decays to 0
        assert out == {1: 1300, 2: 200}

    def test_layout_independent(self):
        rng = np.random.RandomState(8)
        df = pd.DataFrame(
            {
                "user_id": rng.randint(0, 20, 500).astype(np.int64),
                "ts": pd.Timestamp("2026-01-01")
                + pd.to_timedelta(rng.randint(0, 72 * 3600, 500), unit="s"),
                "value": rng.uniform(0.1, 50, 500),
            }
        )
        a = (
            decayed_counts(ray.data.from_pandas(df))
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        b = (
            decayed_counts(ray.data.from_pandas(df).repartition(9))
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestGroupedCentroidSums:
    def test_matches_pandas_twin(self):
        rng = np.random.RandomState(5)
        n, dim = 120, 8
        df = pd.DataFrame(
            {
                "label": rng.choice(["a", "b", "c"], n),
                "embedding": list(rng.uniform(-1, 1, (n, dim)).astype(np.float32)),
            }
        )
        got = (
            grouped_centroid_sums(
                ray.data.from_pandas(df).repartition(5), "label"
            )
            .to_pandas().sort_values(["grp", "dim"]).reset_index(drop=True)
        )
        mat = np.floor(
            np.stack(df["embedding"].to_numpy()).astype(np.float64) * (1 << 20)
        ).astype(np.int64)
        rows = []
        for g in sorted(df["label"].unique()):
            sub = mat[(df["label"] == g).to_numpy()]
            for d in range(dim):
                rows.append(
                    {"grp": g, "dim": d + 1, "sum_fixed": int(sub[:, d].sum()),
                     "n": len(sub)}
                )
        want = pd.DataFrame(rows)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_single_group_centroid_recoverable(self):
        vecs = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], dtype=np.float32)
        df = pd.DataFrame({"label": ["x"] * 3, "embedding": list(vecs)})
        out = grouped_centroid_sums(ray.data.from_pandas(df), "label").to_pandas()
        s = out.set_index("dim")["sum_fixed"]
        n = out["n"].iloc[0]
        centroid = np.array([s[1], s[2]]) / (n * (1 << 20))
        np.testing.assert_allclose(centroid, [2 / 3, 2 / 3], atol=1e-5)


class TestEmbeddingGram:
    def test_matches_numpy_twin_any_layout(self):
        from ai_knowledge_graph_ray.stages.clustering import embedding_gram

        rng = np.random.RandomState(7)
        n, dim = 90, 6
        df = pd.DataFrame(
            {"embedding": list(rng.uniform(-1, 1, (n, dim)).astype(np.float32))}
        )
        fixed = np.floor(
            np.stack(df["embedding"].to_numpy()).astype(np.float64) * (1 << 10)
        ).astype(np.int64)
        gram = fixed.T @ fixed
        iu, ju = np.triu_indices(dim)
        want = pd.DataFrame(
            {"i": iu + 1, "j": ju + 1, "sum_fixed": gram[iu, ju], "n": n}
        )
        for parts in (1, 7):
            got = (
                embedding_gram(ray.data.from_pandas(df).repartition(parts))
                .to_pandas().sort_values(["i", "j"]).reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
