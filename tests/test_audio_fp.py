"""Audio fingerprinting: peak extraction, snippet matching with the
right frame offset, noise rejection, layout independence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.functions.wav import encode_wav
from ai_knowledge_graph_ray.stages.audio_fp import (
    _frame_peaks,
    _pair_hashes,
    audio_fingerprints,
    audio_match,
    trim_clips,
)


def _melody(seed: int, nseg: int = 10, seg: int = 512, rate: int = 8000) -> bytes:
    r = np.random.default_rng(seed)
    out = []
    for _ in range(nseg):
        b = 2 + int(r.integers(0, 100))
        f = b * rate / 256.0
        out.append(10000 * np.sin(2 * np.pi * f * np.arange(seg) / rate))
    return encode_wav(np.concatenate(out).astype(np.int16), rate=rate)


def _media(items):
    return ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array([i for i, _ in items], pa.int64()),
                "content": pa.array([b for _, b in items], pa.binary()),
            }
        )
    )


class TestKernels:
    def test_frame_peaks_pure_tone(self):
        rate, bin_idx = 8000, 17
        f = bin_idx * rate / 256.0
        amp = 10000 * np.sin(2 * np.pi * f * np.arange(2048) / rate)
        peaks = _frame_peaks(amp, 256)
        assert len(peaks) == 8
        assert (peaks == bin_idx).all()

    def test_pair_hashes_shape_and_packing(self):
        peaks = np.array([5, 9, 5], dtype=np.int64)
        t, fp = _pair_hashes(peaks, 2)
        # d=1: (5,9),(9,5); d=2: (5,5)
        assert list(t) == [0, 1, 0]
        assert list(fp) == [
            (5 << 20) | (9 << 8) | 1,
            (9 << 20) | (5 << 8) | 1,
            (5 << 20) | (5 << 8) | 2,
        ]

    def test_short_clip_no_pairs(self):
        t, fp = _pair_hashes(np.array([3], dtype=np.int64), 3)
        assert len(t) == 0 and len(fp) == 0


class TestMatch:
    def test_snippet_matches_source_at_offset(self):
        corpus = _media([(1, _melody(1)), (2, _melody(2)), (3, _melody(3))])
        queries = trim_clips(_media([(2, _melody(2))]), skip_frames=4)
        m = audio_match(corpus, queries).to_pandas()
        assert len(m) == 1
        row = m.iloc[0]
        assert row["query_id"] == 2 and row["media_id"] == 2
        assert row["offset"] == 4
        assert row["votes"] > 10

    def test_unrelated_noise_rejected(self):
        corpus = _media([(1, _melody(1)), (2, _melody(2))])
        # white noise shares no stable peak pairs above min_votes
        rng = np.random.default_rng(99)
        noise = encode_wav(
            (3000 * rng.standard_normal(4096)).astype(np.int16), rate=8000
        )
        m = audio_match(corpus, _media([(7, noise)]), min_votes=5).to_pandas()
        assert (m["votes"] < 15).all() if len(m) else True
        # and the true positive still dominates any noise match
        q = trim_clips(_media([(1, _melody(1))]), skip_frames=2)
        good = audio_match(corpus, q).to_pandas()
        assert good.iloc[0]["media_id"] == 1 and good.iloc[0]["offset"] == 2

    def test_layout_independence(self):
        items = [(i, _melody(i)) for i in range(1, 9)]
        corpus1 = _media(items)
        corpus2 = _media(items).repartition(5)
        q = trim_clips(_media([(4, _melody(4)), (6, _melody(6))]), skip_frames=3)
        m1 = audio_match(corpus1, q).to_pandas().sort_values("query_id")
        m2 = audio_match(corpus2, q).to_pandas().sort_values("query_id")
        assert m1.reset_index(drop=True).equals(m2.reset_index(drop=True))
        assert list(m1["media_id"]) == [4, 6]

    def test_bad_payload_skipped(self):
        fps = audio_fingerprints(_media([(1, b"junk")])).to_pandas()
        assert len(fps) == 0
