"""VAD segmentation (tone/silence boundaries) and point-in-time SCD-2
lookup (gap probes drop, containment exact)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.functions.wav import encode_wav
from ai_knowledge_graph_ray.stages.diff import pit_lookup
from ai_knowledge_graph_ray.stages.multimodal import vad_segments


def _clip(pattern: list[tuple[bool, int]], rate: int = 8000) -> bytes:
    """Build a WAV from (active, n_frames) runs; frame = 160 samples."""
    parts = []
    for active, n_frames in pattern:
        n = 160 * n_frames
        if active:
            t = np.arange(n)
            parts.append((12000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16))
        else:
            parts.append(np.zeros(n, dtype=np.int16))
    return encode_wav(np.concatenate(parts), rate=rate)


class TestVadSegments:
    def test_tone_silence_tone(self):
        media = ray.data.from_arrow(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "content": pa.array(
                        [_clip([(True, 5), (False, 3), (True, 4)])], pa.binary()
                    ),
                }
            )
        )
        out = (
            vad_segments(media).to_pandas().sort_values("seg_id").reset_index(drop=True)
        )
        assert list(out["start_frame"]) == [0, 8]
        assert list(out["end_frame"]) == [5, 12]
        assert (out["energy_mean"] > 500).all()

    def test_all_silence_empty(self):
        media = ray.data.from_arrow(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "content": pa.array([_clip([(False, 6)])], pa.binary()),
                }
            )
        )
        assert vad_segments(media).count() == 0

    def test_undecodable_skipped(self):
        media = ray.data.from_arrow(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "content": pa.array([b"junk"], pa.binary()),
                }
            )
        )
        assert vad_segments(media).count() == 0


class TestPitLookup:
    def test_containment_and_gap(self):
        hist = pd.DataFrame(
            {
                "key": [1, 1, 2],
                "val": ["a", "b", "x"],
                "valid_from": [1, 3, 1],
                "valid_to": [2, 4, 1],
            }
        )
        probes = pd.DataFrame({"key": [1, 1, 1, 2, 3], "t": [1, 3, 9, 1, 1]})
        out = (
            pit_lookup(
                ray.data.from_pandas(probes).repartition(2),
                ray.data.from_pandas(hist).repartition(2),
                probe_schema=pa.schema([("key", pa.int64()), ("t", pa.int64())]),
                history_schema=pa.schema(
                    [("key", pa.int64()), ("val", pa.string()),
                     ("valid_from", pa.int64()), ("valid_to", pa.int64())]
                ),
            )
            .to_pandas()
            .sort_values(["key", "t"])
            .reset_index(drop=True)
        )
        got = list(zip(out["key"], out["t"], out["val"]))
        # t=9 beyond history and key=3 unknown -> dropped
        assert got == [(1, 1, "a"), (1, 3, "b"), (2, 1, "x")]
