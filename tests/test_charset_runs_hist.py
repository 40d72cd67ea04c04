"""Charset census, event-type run-length profile, and PNG channel
histograms — hand-computed fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.functions.png import encode_png
from ai_knowledge_graph_ray.stages.multimodal import channel_histograms
from ai_knowledge_graph_ray.stages.sessions import event_runs
from ai_knowledge_graph_ray.stages.text_analysis import charset_profile


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


class TestCharsetProfile:
    def test_hand_counts(self):
        df = pd.DataFrame(
            {"doc_id": [1], "text": ["Ab1 c,d! é中\tx\n"]}
        )
        out = charset_profile(_ds(df, 1)).to_pandas().iloc[0]
        # letters: A b c d x = 5; digits: 1; spaces: ' 'x2 + \t + \n = 4
        # punct: ',' '!' = 2; non-ascii: é 中 = 2
        assert out["n_ascii_alpha"] == 5
        assert out["n_digit"] == 1
        assert out["n_space"] == 4
        assert out["n_punct"] == 2
        assert out["n_non_ascii"] == 2

    def test_empty_and_null(self):
        df = pd.DataFrame({"doc_id": [1, 2], "text": ["", None]})
        out = charset_profile(_ds(df, 1)).to_pandas()
        assert (out[["n_ascii_alpha", "n_digit", "n_space",
                     "n_punct", "n_non_ascii"]].to_numpy() == 0).all()


class TestEventRuns:
    def test_hand_runs(self):
        us = 1_000_000
        df = pd.DataFrame(
            {
                "user_id": [1] * 5 + [2],
                "event_type": ["a", "a", "b", "b", "b", "z"],
                "ts": pd.to_datetime([i * us for i in range(5)] + [0], unit="us"),
                "event_id": range(6),
            }
        )
        out = event_runs(_ds(df)).to_pandas().set_index("user_id")
        u1 = out.loc[1]
        assert u1["n_events"] == 5 and u1["n_runs"] == 2 and u1["max_run"] == 3
        u2 = out.loc[2]
        assert u2["n_events"] == 1 and u2["n_runs"] == 1 and u2["max_run"] == 1

    def test_tie_breaks_on_event_id(self):
        # same ts: order by event_id decides runs
        t = pd.to_datetime([0, 0, 0], unit="us")
        df = pd.DataFrame(
            {
                "user_id": [1, 1, 1],
                "event_type": ["a", "b", "a"],
                "ts": t,
                "event_id": [3, 1, 2],
            }
        )
        out = event_runs(_ds(df, 1)).to_pandas().iloc[0]
        # order by event_id: b, a, a -> runs: b, aa -> 2 runs, max 2
        assert out["n_runs"] == 2 and out["max_run"] == 2

    def test_layout_independent(self):
        df = pd.DataFrame(
            {
                "user_id": [i % 4 for i in range(100)],
                "event_type": [("x" if i % 3 else "y") for i in range(100)],
                "ts": pd.to_datetime(range(100), unit="s"),
                "event_id": range(100),
            }
        )
        one = event_runs(_ds(df, 1)).to_pandas()
        many = event_runs(_ds(df, 8)).to_pandas()
        key = lambda d: d.sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(key(one), key(many))


class TestChannelHistograms:
    def test_two_tone_image(self):
        # 4x4 RGB: half pixels (0,0,0), half (255, 16, 128)
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img[2:, :, 0] = 255
        img[2:, :, 1] = 16
        img[2:, :, 2] = 128
        blob = encode_png(img)
        media = ray.data.from_arrow(
            pa.table(
                {"media_id": pa.array([7], pa.int64()),
                 "content": pa.array([blob], pa.binary())}
            )
        )
        out = channel_histograms(media, concurrency=(1, 2)).to_pandas()
        got = {
            (r.channel, r.bucket): r.n_pixels for r in out.itertuples()
        }
        # channel 0: 8 px in bucket 0, 8 px in bucket 15 (255>>4)
        assert got[(0, 0)] == 8 and got[(0, 15)] == 8
        # channel 1: 8 in bucket 0, 8 in bucket 1 (16>>4)
        assert got[(1, 0)] == 8 and got[(1, 1)] == 8
        # channel 2: 8 in bucket 0, 8 in bucket 8 (128>>4)
        assert got[(2, 0)] == 8 and got[(2, 8)] == 8
        assert out["n_pixels"].sum() == 3 * 16

    def test_bad_payload_skipped(self):
        media = ray.data.from_arrow(
            pa.table(
                {"media_id": pa.array([1], pa.int64()),
                 "content": pa.array([b"not a png"], pa.binary())}
            )
        )
        out = channel_histograms(media, concurrency=(1, 2)).to_pandas()
        assert len(out) == 0
