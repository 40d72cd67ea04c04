"""Dedup/similarity operators on corpora with PLANTED duplicates —
verifying detection, canonical mapping, and non-detection of unrelated
content."""

from __future__ import annotations

import numpy as np
import pytest
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.dedup import (
    embedding_dedup,
    exact_dedup,
    jaccard,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from ai_knowledge_graph_ray.stages.similarity import knn_brute, knn_ivf

BASE = (
    "the steam engine transformed industry across britain powering new "
    "factories mills and railways while coal mines fed the growing demand "
    "for energy and ports moved goods to distant markets every year"
)
NEAR = BASE.replace("distant markets", "faraway markets")  # 1-word change
OTHER = (
    "completely different subject matter entirely about marine biology "
    "coral reefs fish populations ocean currents and tidal patterns with "
    "no overlap in vocabulary whatsoever against the industrial corpus"
)


def _docs():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": [BASE, NEAR, OTHER, BASE, "short text"],
            }
        )
    )


class TestExactDedup:
    def test_keeps_min_id(self):
        out = exact_dedup(_docs())
        ids = sorted(r["doc_id"] for r in out.select_columns(["doc_id"]).take_all())
        assert ids == [1, 2, 3, 5]  # doc 4 == doc 1 dropped


class TestMinHash:
    def test_near_dup_found(self):
        out = minhash_lsh_dedup(_docs(), threshold=0.5).take_all()
        mapping = {r["doc_id"]: r["dup_of"] for r in out}
        # exact copy 4 -> 1; near copy 2 -> 1 (high jaccard)
        assert mapping.get(4) == 1
        assert mapping.get(2) == 1
        assert 3 not in mapping
        assert jaccard(BASE, NEAR, 5) > 0.5

    def test_no_false_positives_on_disjoint(self):
        out = minhash_lsh_dedup(
            ray.data.from_arrow(
                pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": [BASE, OTHER]})
            )
        ).take_all()
        assert out == []


class TestSimHash:
    def test_exact_and_near(self):
        out = simhash_dedup(_docs()).take_all()
        mapping = {r["doc_id"]: r["dup_of"] for r in out}
        assert mapping.get(4) == 1  # identical -> hamming 0
        assert 3 not in mapping


class TestNgramJaccard:
    def test_pair_counts_exact(self):
        rows = ngram_jaccard_pairs(_docs(), k=3, threshold=0.5).take_all()
        pairs = {(r["id_a"], r["id_b"]): (r["n_common"], r["n_union"]) for r in rows}
        assert (1, 4) in pairs
        c, u = pairs[(1, 4)]
        assert c == u  # identical docs share all 3-grams
        assert (1, 2) in pairs  # near dup above 0.5
        assert not any(3 in p for p in pairs)


class TestEmbeddingDedup:
    def test_scaled_vector_is_dup(self):
        rng = np.random.RandomState(3)
        v = rng.randn(16)
        w = rng.randn(16)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([1, 2, 3], pa.int64()),
                    "embedding": pa.array(
                        [v.tolist(), (2.0 * v).tolist(), w.tolist()],
                        pa.list_(pa.float64()),
                    ),
                }
            )
        )
        out = embedding_dedup(ds, threshold=0.99).take_all()
        mapping = {r["vec_id"]: r["dup_of"] for r in out}
        assert mapping.get(2) == 1
        assert 3 not in mapping


class TestKnn:
    def test_ivf_recall_vs_brute(self, sf_dir):
        ds = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        import pandas as pd

        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id").head(3)
        qids = emb["vec_id"].to_numpy()
        qmat = np.stack(emb["embedding"].to_numpy())
        brute = knn_brute(ds, qids, qmat, k=10).take_all()
        approx = knn_ivf(ds, qids, qmat, k=10, n_clusters=8, n_probe=4).take_all()
        b = {(r["query_id"], r["vec_id"]) for r in brute}
        a = {(r["query_id"], r["vec_id"]) for r in approx}
        recall = len(a & b) / len(b)
        assert recall >= 0.5, recall

    def test_brute_self_excluded(self, sf_dir):
        ds = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        import pandas as pd

        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id").head(2)
        out = knn_brute(
            ds, emb["vec_id"].to_numpy(), np.stack(emb["embedding"].to_numpy()), k=5
        ).take_all()
        assert all(r["query_id"] != r["vec_id"] for r in out)
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], 0)
            per_q[r["query_id"]] += 1
        assert all(v == 5 for v in per_q.values())


class TestScalePathEquivalence:
    """The count-gated driver paths and the distributed paths (text-join
    verify + min-label-propagation components) must produce identical
    mappings; force the distributed branch with zero-sized gates."""

    def test_minhash_distributed_equals_driver(self):
        kw = dict(threshold=0.5)
        drv = minhash_lsh_dedup(_docs(), **kw).take_all()
        dist = minhash_lsh_dedup(
            _docs(), driver_max_pairs=0, driver_max_verify_pairs=0, **kw
        ).take_all()
        as_map = lambda rows: {r["doc_id"]: r["dup_of"] for r in rows}
        assert as_map(drv) == as_map(dist)
        assert as_map(drv).get(4) == 1

    def test_simhash_distributed_equals_driver(self):
        drv = simhash_dedup(_docs()).take_all()
        dist = simhash_dedup(_docs(), driver_max_pairs=0).take_all()
        as_map = lambda rows: {r["doc_id"]: r["dup_of"] for r in rows}
        assert as_map(drv) == as_map(dist)

    def test_embedding_distributed_equals_driver(self):
        rng = np.random.RandomState(3)
        v, w = rng.randn(16), rng.randn(16)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "embedding": pa.array(
                        [v.tolist(), (2.0 * v).tolist(), w.tolist(), (0.5 * v).tolist()],
                        pa.list_(pa.float64()),
                    ),
                }
            )
        )
        drv = embedding_dedup(ds, threshold=0.99).take_all()
        dist = embedding_dedup(ds, threshold=0.99, driver_max_pairs=0).take_all()
        as_map = lambda rows: {r["vec_id"]: r["dup_of"] for r in rows}
        assert as_map(drv) == as_map(dist)
        assert as_map(drv) == {2: 1, 4: 1}

    def test_resolve_chain_min_id(self):
        # chain 5-3, 3-9, plus isolated 7-8: canonical is the component min
        from ai_knowledge_graph_ray.stages.dedup import resolve_dup_mapping

        pairs = ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([5, 3, 7], pa.int64()),
                    "id_b": pa.array([3, 9, 8], pa.int64()),
                }
            )
        )
        drv = {r["doc_id"]: r["dup_of"] for r in resolve_dup_mapping(pairs).take_all()}
        dist = {
            r["doc_id"]: r["dup_of"]
            for r in resolve_dup_mapping(pairs, driver_max_pairs=0).take_all()
        }
        assert drv == dist == {5: 3, 9: 3, 8: 7}


class TestIvfIndex:
    """ivf_build + knn_ivf_indexed: recall parity with the filter-based
    knn_ivf, and ACTUAL partition pruning — only the probed list
    directories are read."""

    def test_indexed_recall_and_pruning(self, sf_dir, tmp_path):
        import pandas as pd
        from ai_knowledge_graph_ray.stages.similarity import (
            ivf_build,
            knn_brute,
            knn_ivf_indexed,
        )

        ds = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        idx_dir = str(tmp_path / "ivf")
        cents = ivf_build(ds, idx_dir, n_clusters=8)
        assert len(cents) == 8

        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id").head(3)
        qids = emb["vec_id"].to_numpy()
        qmat = np.stack(emb["embedding"].to_numpy())

        stats = {}
        approx = knn_ivf_indexed(
            idx_dir, qids, qmat, k=10, n_probe=4, stats=stats
        ).take_all()
        brute = knn_brute(ds, qids, qmat, k=10).take_all()
        b = {(r["query_id"], r["vec_id"]) for r in brute}
        a = {(r["query_id"], r["vec_id"]) for r in approx}
        assert len(a & b) / len(b) >= 0.5

        # pruning is real: reads at most the union of probe lists
        assert stats["n_lists"] == 8
        assert stats["lists_read"] <= min(8, 3 * 4)
        single = {}
        knn_ivf_indexed(idx_dir, qids[:1], qmat[:1], k=10, n_probe=2, stats=single)
        assert single["lists_read"] == 2
        assert single["scan_fraction"] == 2 / 8


@pytest.mark.slow
def test_dup_heavy_corpus_distributed_path():
    """Crawl-like dup rate (50% of docs are near-copies of a small set
    of originals): the FORCED distributed verify + components path must
    recover the same canonical mapping as the driver path, with a pair
    set that is O(corpus), not a tiny residue."""
    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(800)]
    originals = [
        " ".join(rng.choice(vocab, size=60, replace=True)) for _ in range(40)
    ]
    rows = []
    doc_id = 0
    for i, base in enumerate(originals):
        rows.append((doc_id, base)); doc_id += 1
        for _ in range(25):  # 25 near-copies each -> ~96% dup mass
            toks = base.split()
            j = int(rng.randint(0, len(toks)))
            toks[j] = str(rng.choice(vocab))
            rows.append((doc_id, " ".join(toks))); doc_id += 1
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(8).materialize()

    drv = {
        r["doc_id"]: r["dup_of"]
        for r in minhash_lsh_dedup(ds, threshold=0.5).take_all()
    }
    dist = {
        r["doc_id"]: r["dup_of"]
        for r in minhash_lsh_dedup(
            ds, threshold=0.5, driver_max_pairs=0, driver_max_verify_pairs=0
        ).take_all()
    }
    assert drv == dist
    # the clusters actually formed: most copies resolve to their original
    n_mapped = len(dist)
    assert n_mapped > 800  # out of 1000 copies
    # no cross-cluster merges: a canonical id is always an original's id
    import pytest as _p

    originals_ids = set(range(0, len(rows), 26))
    assert set(dist.values()) <= originals_ids


class TestBatchedSignatures:
    def test_bit_equal_to_per_doc(self, monkeypatch):
        """The across-document vectorized signature kernel must be
        bit-identical to the per-doc reference (minhash is invariant to
        gram multiplicity), including across slab boundaries and with
        empty/short/duplicate-heavy docs interleaved."""
        import ai_knowledge_graph_ray.stages.dedup as dd

        texts = [
            "the quick brown fox jumps over the lazy dog again and again",
            "",
            "one two",  # shorter than k -> single gram
            "dup dup dup dup dup dup dup dup dup dup",
            "the quick brown fox jumps over the lazy dog again and again",
            "   ",
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        ]
        a, b = dd._minhash_params(64)
        want = np.stack(
            [dd._minhash_sig(dd._shingles(t, 3), a, b) for t in texts]
        )
        got = dd._batch_minhash_sigs(texts, 3, a, b)
        assert got.dtype == np.uint64
        assert np.array_equal(got, want)
        # force multiple slabs (each doc has < 10 grams)
        monkeypatch.setattr(dd, "_SIG_SLAB_GRAMS", 10)
        got_slabbed = dd._batch_minhash_sigs(texts, 3, a, b)
        assert np.array_equal(got_slabbed, want)


class TestRrfFuse:
    def test_hand_case(self):
        import numpy as np
        import pandas as pd

        from ai_knowledge_graph_ray.stages.similarity import rrf_fuse

        # list A ranks: x(1), y(2); list B ranks: y(1), z(2)
        a = ray.data.from_pandas(
            pd.DataFrame(
                {"query_id": [7, 7], "vec_id": [100, 200], "score": [0.9, 0.5]}
            )
        )
        b = ray.data.from_pandas(
            pd.DataFrame(
                {"query_id": [7, 7], "vec_id": [200, 300], "score": [0.8, 0.2]}
            )
        )
        out = rrf_fuse([a, b], k_const=60, top_k=3).to_pandas()
        got = dict(zip(out["vec_id"], out["rrf_micro"]))
        p1, p2 = 1_000_000 // 61, 1_000_000 // 62
        # y appears rank2 in A and rank1 in B -> top fused item
        assert got == {200: p2 + p1, 100: p1, 300: p2}
        assert out.iloc[0]["vec_id"] == 200

    def test_l2_metric_ordering(self):
        import numpy as np

        from ai_knowledge_graph_ray.stages.similarity import knn_brute

        # vectors along one axis: L2 ranks by absolute distance while
        # cosine sees all three as identical direction
        rows = [
            {"vec_id": 0, "embedding": [1.0, 0.0]},
            {"vec_id": 1, "embedding": [2.0, 0.0]},
            {"vec_id": 2, "embedding": [9.0, 0.0]},
        ]
        ds = ray.data.from_items(rows)
        q = np.array([[1.0, 0.0]])
        l2 = knn_brute(ds, np.array([0]), q, k=2, metric="l2").to_pandas()
        assert l2["vec_id"].tolist() == [1, 2]  # nearest first
        cos = knn_brute(ds, np.array([0]), q, k=2, metric="cosine").to_pandas()
        assert set(cos["vec_id"]) == {1, 2}  # same direction: tie by id


class TestCrossNearDup:
    def _tables(self):
        import pandas as pd

        corpus = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    BASE,                       # light paraphrase of bench 10
                    OTHER,                      # unrelated
                    BASE,                       # exact duplicate of doc 1 (corpus-corpus: must NOT pair)
                    "something else entirely about cooking recipes and baking bread daily",
                ],
            }
        )
        bench = pd.DataFrame({"bench_id": [10, 11], "text": [NEAR, "quantum chromodynamics lattice gauge theory"]})
        return corpus, bench

    def test_cross_only_detection(self):
        from ai_knowledge_graph_ray.stages.dedup import cross_near_dup

        corpus, bench = self._tables()
        out = cross_near_dup(
            ray.data.from_pandas(corpus).repartition(2),
            ray.data.from_pandas(bench),
            threshold=0.5,
        ).to_pandas()
        got = sorted(zip(out["id_a"], out["id_b"]))
        # both paraphrase-identical corpus docs flag against bench 10;
        # NO corpus-corpus pair (1,3) despite being exact dups of each other
        assert got == [(1, 10), (3, 10)]

    def test_forced_distributed_verify(self):
        from ai_knowledge_graph_ray.stages.dedup import cross_near_dup

        corpus, bench = self._tables()
        a = cross_near_dup(
            ray.data.from_pandas(corpus), ray.data.from_pandas(bench), threshold=0.5
        ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        b = cross_near_dup(
            ray.data.from_pandas(corpus), ray.data.from_pandas(bench),
            threshold=0.5, driver_max_verify_pairs=0,
        ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert a.equals(b)

    def test_no_candidates(self):
        from ai_knowledge_graph_ray.stages.dedup import cross_near_dup

        corpus, _ = self._tables()
        import pandas as pd

        bench = pd.DataFrame({"bench_id": [99], "text": ["zzz qqq vvv www completely disjoint tokens"]})
        out = cross_near_dup(
            ray.data.from_pandas(corpus), ray.data.from_pandas(bench), threshold=0.9
        )
        assert out.count() == 0


class TestRerankClusterReps:
    def _run(self, mapping_df, quality_df, parts=1):
        import ray.data

        from ai_knowledge_graph_ray.stages.dedup import rerank_cluster_reps

        m = ray.data.from_pandas(mapping_df)
        q = ray.data.from_pandas(quality_df)
        if parts > 1:
            m, q = m.repartition(parts), q.repartition(parts)
        return (
            rerank_cluster_reps(m, q, score_col="score")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_best_quality_member_wins(self):
        import pandas as pd

        mapping = pd.DataFrame(
            {"doc_id": [2, 3, 11], "dup_of": [1, 1, 10]}
        )
        quality = pd.DataFrame(
            {"doc_id": [1, 2, 3, 10, 11], "score": [5, 9, 9, 4, 2]}
        )
        out = self._run(mapping, quality)
        got = dict(zip(out["doc_id"], out["keep_id"]))
        # cluster {1,2,3}: 2 and 3 tie at 9 -> lower id 2 wins
        assert got == {1: 2, 2: 2, 3: 2, 10: 10, 11: 10}

    def test_layout_independent(self):
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(3)
        roots = np.repeat(np.arange(0, 200, 10), 4)
        members = roots + np.tile([1, 2, 3, 4], 20)
        mapping = pd.DataFrame({"doc_id": members, "dup_of": roots})
        ids = np.unique(np.concatenate([roots, members]))
        quality = pd.DataFrame(
            {"doc_id": ids, "score": rng.randint(0, 100, len(ids))}
        )
        a = self._run(mapping, quality, parts=1)
        b = self._run(mapping, quality, parts=6)
        import pandas.testing as pdt

        pdt.assert_frame_equal(a, b)
        # every keep_id is the argmax (score, -id) of its cluster
        qmap = dict(zip(quality["doc_id"], quality["score"]))
        full = pd.concat(
            [mapping, pd.DataFrame({"doc_id": np.unique(roots),
                                    "dup_of": np.unique(roots)})]
        )
        for root, grp in full.groupby("dup_of"):
            best = sorted(grp["doc_id"], key=lambda i: (-qmap[i], i))[0]
            sel = a[a["doc_id"].isin(grp["doc_id"])]["keep_id"]
            assert (sel == best).all()


class TestExactDedupAgainst:
    def test_planted_overlap_dropped(self):
        import pandas as pd
        import ray.data

        from ai_knowledge_graph_ray.stages.dedup import exact_dedup_against

        ref = pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["alpha", "beta", "gamma"]}
        )
        new = pd.DataFrame(
            {
                "doc_id": [10, 11, 12, 13],
                "text": ["alpha", "delta", "beta", "epsilon"],
            }
        )
        out = exact_dedup_against(
            ray.data.from_pandas(new).repartition(2),
            ray.data.from_pandas(ref).repartition(2),
        ).to_pandas()
        assert sorted(out["doc_id"]) == [11, 13]

    def test_empty_reference_keeps_all(self):
        import pandas as pd
        import ray.data

        from ai_knowledge_graph_ray.stages.dedup import exact_dedup_against

        new = pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]})
        ref = pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "text": pd.Series([], dtype=object)}
        )
        out = exact_dedup_against(
            ray.data.from_pandas(new), ray.data.from_pandas(ref)
        ).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2]
