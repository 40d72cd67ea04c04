"""Content-defined chunking: boundary shift-invariance (the property
fixed-size chunking lacks), size bounds, layout independence, and the
chunk-level dedup summary."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.cdc import (
    cdc_chunk_table,
    cdc_dedup_stats,
    chunk_boundaries,
    gear_hashes,
)


def _rand_text(seed: int, n_words: int = 2500) -> str:
    rng = np.random.default_rng(seed)
    words = ["".join(chr(97 + c) for c in rng.integers(0, 26, size=5))
             for _ in range(n_words)]
    return " ".join(words)


def _docs_ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


class TestGearHash:
    def test_window_locality(self):
        # positions >= 64 depend only on the trailing 64 bytes: two
        # buffers sharing a suffix hash identically there
        rng = np.random.default_rng(3)
        tail = rng.integers(0, 256, size=200, dtype=np.uint8)
        a = np.concatenate([rng.integers(0, 256, size=100, dtype=np.uint8), tail])
        bb = np.concatenate([rng.integers(0, 256, size=37, dtype=np.uint8), tail])
        ha, hb = gear_hashes(a), gear_hashes(bb)
        assert np.array_equal(ha[-(200 - 64):], hb[-(200 - 64):])

    def test_boundary_walk_bounds(self):
        cands = np.array([70, 100, 150, 151, 400, 2000])
        cuts = chunk_boundaries(cands, 500, min_size=64, max_size=256)
        assert cuts == [70, 150, 400, 500]
        # no candidates at all -> forced max_size cuts + tail
        assert chunk_boundaries(np.array([], dtype=np.int64), 600,
                                min_size=64, max_size=256) == [256, 512, 600]


class TestCdcChunks:
    def test_shift_invariance(self):
        # prepending a prefix re-chunks only the head: the tail chunk
        # hashes realign (fixed-size chunking would share ~nothing)
        base = _rand_text(1)
        shifted = "PREFIX-INSERTED-BYTES " * 3 + base
        out = cdc_chunk_table(_docs_ds([base, shifted])).to_pandas()
        h1 = set(out.loc[out["doc_id"] == 1, "chunk_md5"])
        h2 = set(out.loc[out["doc_id"] == 2, "chunk_md5"])
        shared = len(h1 & h2) / len(h1)
        assert shared > 0.7

    def test_size_bounds_and_coverage(self):
        txt = _rand_text(2)
        out = cdc_chunk_table(_docs_ds([txt])).to_pandas()
        out = out.sort_values("chunk_idx")
        assert out["length"].iloc[:-1].min() >= 64
        assert out["length"].max() <= 1024
        # chunks tile the document exactly
        assert int(out["length"].sum()) == len(txt.encode("utf-8"))
        assert list(out["start"]) == list(
            np.concatenate([[0], np.cumsum(out["length"].to_numpy())[:-1]])
        )

    def test_layout_independence(self):
        texts = [_rand_text(s) for s in range(8)]
        one = cdc_chunk_table(_docs_ds(texts)).to_pandas()
        many = cdc_chunk_table(_docs_ds(texts).repartition(6)).to_pandas()
        key = ["doc_id", "chunk_idx"]
        pd.testing.assert_frame_equal(
            one.sort_values(key).reset_index(drop=True),
            many.sort_values(key).reset_index(drop=True),
        )

    def test_degenerate_constant_byte(self):
        # a constant buffer may never hit the mask: every chunk is a
        # forced max_size cut, tail smaller
        out = cdc_chunk_table(_docs_ds(["a" * 5000])).to_pandas()
        assert out["length"].max() <= 1024
        assert int(out["length"].sum()) == 5000

    def test_empty_and_tiny_docs(self):
        out = cdc_chunk_table(_docs_ds(["", "xy"])).to_pandas()
        assert set(out["doc_id"]) == {2}
        assert list(out["length"]) == [2]


class TestCdcDedupStats:
    def test_duplicated_corpus(self):
        base = _rand_text(5)
        stats = cdc_dedup_stats(_docs_ds([base, base, base])).iloc[0]
        assert stats["bytes_total"] == 3 * stats["bytes_distinct"]
        assert stats["dedup_ratio_milli"] == 333
        assert stats["n_chunks"] == 3 * stats["n_distinct"]

    def test_unique_corpus(self):
        stats = cdc_dedup_stats(_docs_ds([_rand_text(7), _rand_text(8)])).iloc[0]
        assert stats["dedup_ratio_milli"] >= 990
