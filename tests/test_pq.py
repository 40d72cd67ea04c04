"""Product quantization (stages/pq.py): planted-codebook exactness,
recall vs brute-force L2, layout independence, code compactness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from ai_knowledge_graph_ray.stages.pq import pq_encode, pq_search, pq_train
from ai_knowledge_graph_ray.stages.similarity import knn_brute

DIM, M, K = 16, 4, 8


def _blobs(n_per: int = 40, seed: int = 9, noise: float = 0.01) -> pd.DataFrame:
    """K well-separated blob centers per subspace — PQ's home turf."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-1, 1, size=(K, DIM))
    rows = []
    vid = 0
    for c in range(K):
        pts = centers[c] + rng.normal(0, noise, size=(n_per, DIM))
        for p in pts:
            rows.append({"vec_id": vid, "embedding": p.astype(np.float32)})
            vid += 1
    return pd.DataFrame(rows)


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


class TestPq:
    def test_codes_are_m_bytes(self):
        df = _blobs(10)
        books = pq_train(_ds(df), m=M, k=K, iters=2)
        codes = pq_encode(_ds(df), books).to_pandas()
        assert all(len(c) == M for c in codes["code"])
        assert len(codes) == len(df)

    def test_layout_independent_codebooks_and_results(self):
        df = _blobs(20, seed=4)
        b1 = pq_train(_ds(df, 1), m=M, k=K, iters=3)
        b2 = pq_train(_ds(df, 7), m=M, k=K, iters=3)
        np.testing.assert_array_equal(b1, b2)
        qids = np.array([0, 50, 99], dtype=np.int64)
        qmat = np.stack(df.set_index("vec_id").loc[qids, "embedding"].to_numpy())
        r1 = (
            pq_search(pq_encode(_ds(df, 1), b1), b1, qids, qmat, k=5)
            .to_pandas()
            .sort_values(["query_id", "score", "vec_id"])
            .reset_index(drop=True)
        )
        r2 = (
            pq_search(pq_encode(_ds(df, 7), b2), b2, qids, qmat, k=5)
            .to_pandas()
            .sort_values(["query_id", "score", "vec_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(r1, r2)

    def test_adc_equals_brute_l2_over_reconstructions(self):
        """ADC distance IS the exact L2 distance to the code's
        reconstruction — so pq_search must return the same neighbor
        sets as knn_brute(l2) run over the decoded vectors (identical
        (score, vec_id) tie-break on equal codes)."""
        df = _blobs(40, seed=13, noise=0.02)
        ds = _ds(df, 4)
        qids = np.array([5, 77, 150, 260], dtype=np.int64)
        qmat = np.stack(df.set_index("vec_id").loc[qids, "embedding"].to_numpy())
        books = pq_train(ds, m=M, k=K, iters=4)
        codes = pq_encode(ds, books).to_pandas()
        got = pq_search(
            ray.data.from_pandas(codes).repartition(4),
            books, qids, qmat, k=10, exclude_self=False,
        ).to_pandas()
        # decode: reconstruction = concat of sub-centroids
        dsub = DIM // M
        recon = np.empty((len(codes), DIM))
        cm = np.frombuffer(b"".join(codes["code"]), dtype=np.uint8).reshape(-1, M)
        for s in range(M):
            recon[:, s * dsub : (s + 1) * dsub] = books[s][cm[:, s]]
        rdf = pd.DataFrame(
            {"vec_id": codes["vec_id"], "embedding": list(recon)}
        )
        want = knn_brute(
            _ds(rdf, 4), qids, qmat, k=10, metric="l2", exclude_self=False
        ).to_pandas()
        for qid in qids:
            g = set(got[got["query_id"] == qid]["vec_id"])
            w = set(want[want["query_id"] == qid]["vec_id"])
            assert g == w, (qid, g, w)

    def test_neighbors_come_from_query_blob(self):
        df = _blobs(40, seed=13, noise=0.02)
        ds = _ds(df, 4)
        qids = np.array([5, 77, 150, 260], dtype=np.int64)
        qmat = np.stack(df.set_index("vec_id").loc[qids, "embedding"].to_numpy())
        books = pq_train(ds, m=M, k=K, iters=4)
        got = pq_search(pq_encode(ds, books), books, qids, qmat, k=10).to_pandas()
        for qid in qids:
            blob = qid // 40
            neigh = got[got["query_id"] == qid]["vec_id"].to_numpy()
            assert (neigh // 40 == blob).all()

    def test_zero_noise_blobs_rank_own_blob_first(self):
        df = _blobs(12, seed=2, noise=0.0)  # every vector IS a center
        ds = _ds(df, 2)
        books = pq_train(ds, m=M, k=K, iters=4)
        qids = np.array([0], dtype=np.int64)
        qmat = df.iloc[[0]]["embedding"].to_numpy()
        qmat = np.stack(qmat)
        got = pq_search(pq_encode(ds, books), books, qids, qmat, k=11).to_pandas()
        # all 11 same-blob duplicates at approx distance ~0, i.e. top score
        same_blob = set(range(1, 12))
        assert set(got["vec_id"]) == same_blob

    def test_dim_not_divisible_raises(self):
        df = _blobs(5)
        with pytest.raises(ValueError, match="not divisible"):
            pq_train(_ds(df), m=5, k=4, iters=1)
