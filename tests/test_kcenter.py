"""Greedy k-center coreset selection: brute-force twin, layout
independence, duplicate-vector early stop."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.clustering import FIXED_SCALE, kcenter_select


def _brute(df: pd.DataFrame, k: int) -> pd.DataFrame:
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    fixed = np.floor(mat * FIXED_SCALE).astype(np.int64)
    ids = df["vec_id"].to_numpy(np.int64)
    order = np.argsort(ids)
    fixed, ids = fixed[order], ids[order]
    sel = [(0, int(ids[0]), 0)]
    md = ((fixed - fixed[0]) ** 2).sum(axis=1)
    for r in range(1, k):
        best = np.lexsort((ids, -md))[0]
        if md[best] == 0:
            break
        sel.append((r, int(ids[best]), int(md[best])))
        md = np.minimum(md, ((fixed - fixed[best]) ** 2).sum(axis=1))
    return pd.DataFrame(sel, columns=["rnk", "vec_id", "sel_dist"]).astype("int64")


def _rand_df(rng, n, d=8):
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(rng.randn(n, d).astype(np.float32) * 0.3),
        }
    )


class TestKCenter:
    def test_matches_bruteforce_any_layout(self):
        rng = np.random.RandomState(7)
        df = _rand_df(rng, 120)
        want = _brute(df, 6)
        for parts in (1, 4, 11):
            got = (
                kcenter_select(
                    ray.data.from_pandas(df).repartition(parts), k=6
                )
                .to_pandas().astype("int64")
            )
            pd.testing.assert_frame_equal(got, want)

    def test_radius_sequence_non_increasing(self):
        rng = np.random.RandomState(1)
        df = _rand_df(rng, 80)
        out = kcenter_select(ray.data.from_pandas(df), k=8).to_pandas()
        d = out["sel_dist"].to_numpy()[1:]  # rank 0 is the seed's 0
        assert (np.diff(d) <= 0).all()

    def test_duplicate_vectors_stop_early(self):
        v = np.ones(4, np.float32) * 0.1
        w = -np.ones(4, np.float32) * 0.1
        df = pd.DataFrame(
            {"vec_id": [3, 1, 2, 0], "embedding": [v, w, v, w]}
        )
        out = kcenter_select(ray.data.from_pandas(df), k=4).to_pandas()
        # only two distinct points exist: seed id 0, then one of {2,3}
        assert len(out) == 2
        assert out["vec_id"].tolist() == [0, 2]  # min-id tie-break

    def test_k1_returns_seed_only(self):
        rng = np.random.RandomState(2)
        df = _rand_df(rng, 10)
        out = kcenter_select(ray.data.from_pandas(df), k=1).to_pandas()
        assert out["vec_id"].tolist() == [0] and out["sel_dist"].tolist() == [0]
