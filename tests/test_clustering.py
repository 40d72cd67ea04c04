"""Distributed k-means + SemDeDup semantic dedup: planted-blob
recovery, layout-independence (integer partial sums), forced
over-gate partial combining, planted near-dup groups."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data

from ai_knowledge_graph_ray.stages.clustering import (
    kmeans_assign,
    kmeans_fit_distributed,
    semantic_dedup,
)


def _blobs(n_per: int = 40, dim: int = 16, k: int = 3, seed: int = 7):
    """k well-separated unit blobs; ids are interleaved across blobs so
    block layout never aligns with cluster structure."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, dim) * 10.0
    rows = []
    for i in range(n_per * k):
        blob = i % k
        # noise sigma 1.0 on centers of norm ~40: within-blob cosine
        # ~0.99 — blob mates are NOT near-dups at a 0.99999 threshold
        v = centers[blob] + rng.randn(dim) * 1.0
        rows.append({"vec_id": i, "embedding": v.tolist(), "label": blob})
    return rows


def _ds(rows, blocks: int = 4):
    return ray.data.from_items(rows, override_num_blocks=blocks)


class TestKmeans:
    def test_blob_recovery(self):
        rows = _blobs()
        ds = _ds(rows)
        cents = kmeans_fit_distributed(ds, 3, iters=5)
        asg = kmeans_assign(ds, cents).to_pandas()
        truth = {r["vec_id"]: r["label"] for r in rows}
        asg["label"] = asg["vec_id"].map(truth)
        # perfect purity: each k-means cluster is exactly one blob
        per = asg.groupby("cluster")["label"].nunique()
        assert (per == 1).all() and asg["cluster"].nunique() == 3

    def test_layout_independence(self):
        rows = _blobs()
        outs = []
        for blocks in (1, 7):
            ds = _ds(rows, blocks)
            cents = kmeans_fit_distributed(ds, 3, iters=4)
            asg = (
                kmeans_assign(ds, cents)
                .to_pandas()
                .sort_values("vec_id")
                .reset_index(drop=True)
            )
            outs.append((cents, asg))
        # integer partial sums commute: bit-identical centroids and
        # assignments at any parallelism
        assert np.array_equal(outs[0][0], outs[1][0])
        assert outs[0][1].equals(outs[1][1])

    def test_forced_distributed_partials(self):
        rows = _blobs()
        ds = _ds(rows)
        a = kmeans_fit_distributed(ds, 3, iters=3)
        b = kmeans_fit_distributed(ds, 3, iters=3, driver_max_partials=0)
        assert np.array_equal(a, b)

    def test_k_capped_to_n(self):
        rows = _blobs(n_per=1, k=3)  # 3 rows total
        cents = kmeans_fit_distributed(_ds(rows, 1), 5, iters=2)
        assert cents.shape[0] == 3

    def test_empty_raises(self):
        empty = ray.data.from_items([{"vec_id": 1, "embedding": [0.1, 0.2]}]).filter(
            lambda r: False
        )
        with pytest.raises(ValueError):
            kmeans_fit_distributed(empty, 2)


class TestSemanticDedup:
    def test_planted_groups(self):
        rows = _blobs()
        base = np.asarray(rows[0]["embedding"])
        # a 3-member near-dup group: ids 500/501 echo id 0 (tiny noise,
        # and a pure scaling which cosine ignores)
        rng = np.random.RandomState(3)
        rows.append({"vec_id": 500, "embedding": (base + rng.randn(16) * 1e-4).tolist(), "label": 0})
        rows.append({"vec_id": 501, "embedding": (base * 7.0).tolist(), "label": 0})
        out = semantic_dedup(_ds(rows), k=3, iters=4, threshold=0.99999).to_pandas()
        got = dict(zip(out["vec_id"], out["dup_of"]))
        assert got == {500: 0, 501: 0}

    def test_no_false_positives_on_blobs(self):
        # blob members sit ~0.99 cosine apart (one chance pair at 0.9991): none passes 0.99999
        out = semantic_dedup(_ds(_blobs()), k=3, iters=3, threshold=0.99999).to_pandas()
        assert len(out) == 0

    def test_mapping_targets_min_id(self):
        rows = _blobs()
        v = np.asarray(rows[5]["embedding"])
        rows.append({"vec_id": 600, "embedding": (v * 2).tolist(), "label": 5 % 3})
        rows.append({"vec_id": 601, "embedding": (v * 3).tolist(), "label": 5 % 3})
        out = semantic_dedup(_ds(rows), k=3, iters=4, threshold=0.99999).to_pandas()
        got = dict(zip(out["vec_id"], out["dup_of"]))
        assert got == {600: 5, 601: 5}


class TestAnchorCap:
    def test_hot_cluster_capped_but_min_id_wins(self):
        import numpy as np

        # 60 near-identical vectors: with max_anchors=5 every member is
        # still compared against the 5 smallest ids (which include the
        # global min), so ALL map to id 0 despite the bounded work
        rng = np.random.RandomState(1)
        base = rng.randn(8) * 10
        rows = [
            {"vec_id": i, "embedding": (base + rng.randn(8) * 1e-5).tolist()}
            for i in range(60)
        ]
        out = semantic_dedup(
            ray.data.from_items(rows).repartition(4),
            k=1, iters=2, threshold=0.999, max_anchors=5,
        ).to_pandas()
        got = dict(zip(out["vec_id"], out["dup_of"]))
        assert got == {i: 0 for i in range(1, 60)}
