"""WAV banded spectrogram (pure-tone band concentration) and the
Q17-shaped small-quantity revenue on a planted fixture."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.functions.wav import encode_wav
from ai_knowledge_graph_ray.stages.multimodal import wav_spectrogram


def _tone(freq_frac: float, n: int = 2048) -> bytes:
    # freq_frac: frequency as a fraction of Nyquist (0..1)
    t = np.arange(n)
    samples = (16000 * np.sin(np.pi * freq_frac * t)).astype(np.int16)
    return encode_wav(samples, rate=16000)


class TestWavSpectrogram:
    def test_pure_tone_band_concentration(self):
        # tone at 0.3 x Nyquist with frame_len 256 -> rfft bin ~38 of
        # 128 usable -> band 2 of 8 (bins 32..47)
        media = ray.data.from_arrow(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "content": pa.array([_tone(0.3)], pa.binary()),
                }
            )
        )
        out = wav_spectrogram(media, concurrency=(1, 2)).to_pandas()
        assert len(out) > 0
        per_band = out.groupby("band")["energy"].sum()
        assert per_band.idxmax() == 2
        # dominant band carries the overwhelming majority of energy
        assert per_band.max() > 0.9 * per_band.sum()

    def test_bad_payload_skipped(self):
        media = ray.data.from_arrow(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "content": pa.array([b"junk"], pa.binary()),
                }
            )
        )
        assert len(wav_spectrogram(media, concurrency=(1, 2)).to_pandas()) == 0


class TestSmallQtyRevenue:
    def test_planted(self, tmp_path):
        import pyarrow.parquet as pq

        from ai_knowledge_graph_ray.pipelines.queries import q_small_qty_revenue

        # part 1: quantities 1, 100, 100 -> avg 67, 0.2*avg = 13.4:
        #   the q=1 row qualifies (price 5.00)
        # part 2: quantities 10, 10 -> nothing below 0.2*avg=2
        li = pd.DataFrame(
            {
                "l_partkey": [1, 1, 1, 2, 2],
                "l_quantity": [1.0, 100.0, 100.0, 10.0, 10.0],
                "l_extendedprice": [5.0, 1.0, 1.0, 1.0, 1.0],
            }
        )
        pq.write_table(pa.Table.from_pandas(li), str(tmp_path / "lineitem.parquet"))
        out = q_small_qty_revenue(str(tmp_path)).to_pandas().iloc[0]
        assert out["revenue_cents"] == 500 and out["n_rows"] == 1
