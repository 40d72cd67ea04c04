"""Perceptual image dedup: dHash invariance to re-encoding and small
noise, discrimination of distinct images, and the planted-edition
mapping end-to-end."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.functions.png import encode_png
from ai_knowledge_graph_ray.stages.multimodal import dhash64, phash_media_dedup


def _gradient(h: int = 32, w: int = 32) -> np.ndarray:
    x = np.arange(w) * 256 // w  # relative position -> scale-free
    img = np.tile(x, (h, 1)).astype(np.uint8)
    return np.stack([img, img, img], axis=2)


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class TestDhash64:
    def test_reencode_invariant(self):
        img = _gradient()
        assert dhash64(img) == dhash64(img.copy())

    def test_small_noise_close(self):
        img = _gradient()
        noisy = img.copy()
        noisy[5, 5] = [255, 255, 255]  # one hot pixel
        assert _hamming(dhash64(img), dhash64(noisy)) <= 3

    def test_distinct_images_far(self):
        rng = np.random.default_rng(4)
        a = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        b = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        assert _hamming(dhash64(a), dhash64(b)) > 10

    def test_resize_invariant(self):
        # same gradient at two sizes pools to the same 9x8 cells
        assert dhash64(_gradient(32, 32)) == dhash64(_gradient(64, 64))


class TestPhashDedup:
    def test_planted_editions_resolved(self):
        rows = []
        rng = np.random.default_rng(7)
        for i in range(20):
            img = rng.integers(0, 256, (12, 12, 3)).astype(np.uint8)
            rows.append((i, encode_png(img, filter_type=i % 5)))
            if i % 4 == 0:  # byte-different re-encode of same pixels
                rows.append((i + 1000, encode_png(img, filter_type=(i + 1) % 5)))
        media = ray.data.from_arrow(
            pa.table(
                {
                    "media_id": pa.array([r[0] for r in rows], pa.int64()),
                    "content": pa.array([r[1] for r in rows], pa.binary()),
                }
            )
        ).repartition(3)
        out = phash_media_dedup(media).to_pandas().sort_values("media_id")
        got = dict(zip(out["media_id"], out["dup_of"]))
        assert got == {1000 + i: i for i in range(0, 20, 4)}

    def test_undecodable_skipped(self):
        media = ray.data.from_arrow(
            pa.table(
                {
                    "media_id": pa.array([1, 2], pa.int64()),
                    "content": pa.array([b"not a png", b""], pa.binary()),
                }
            )
        )
        assert phash_media_dedup(media).count() == 0
