"""Audio fingerprinting and snippet matching (constellation /
offset-vote scheme a la Shazam).

Fingerprint: per FFT frame take the strongest spectral bin (the
"peak"); pair each anchor frame's peak with the peaks of the next
``fan_out`` frames into a packed int64 hash ``peak_a << 20 | peak_b
<< 8 | dt``. Matching joins query and corpus fingerprints on the hash
and votes on the FRAME OFFSET ``t_corpus - t_query``: a true match
concentrates its votes on one (media, offset) cell, noise spreads
thin. Deterministic end to end (FFT of identical frames is
bit-stable, argmax ties break to the lowest bin), so results are
layout-independent; no SQL oracle (FFT), invariants pinned in tests.

Scale shape: fingerprint extraction is an actor-pool ``map_batches``
(decode + one batched rfft per clip); the match is ONE cogroup join on
the hash plus two bucketed reduces (offset votes, per-query top-1) —
never an all-pairs comparison. Hash collisions across different audio
are expected and harmless: they lose the offset vote.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce, normalize_blocks, sanitize_for_join
from .relational import cogroup_join

FP_SCHEMA = pa.schema(
    [("media_id", pa.int64()), ("t", pa.int64()), ("fp", pa.int64())]
)
MATCH_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("media_id", pa.int64()),
        ("offset", pa.int64()),
        ("votes", pa.int64()),
    ]
)


def _frame_peaks(amp: np.ndarray, frame_len: int) -> np.ndarray:
    """Strongest FFT bin per frame (bin 0 / DC excluded; argmax ties
    break to the LOWEST bin, numpy's documented behavior)."""
    n = (len(amp) // frame_len) * frame_len
    if n == 0:
        return np.empty(0, dtype=np.int64)
    frames = amp[:n].reshape(-1, frame_len)
    spec = np.abs(np.fft.rfft(frames, axis=1))
    return (np.argmax(spec[:, 1:], axis=1) + 1).astype(np.int64)


def _pair_hashes(peaks: np.ndarray, fan_out: int) -> tuple[np.ndarray, np.ndarray]:
    """(anchor_t, fp) arrays for every (anchor, anchor+d) pair,
    d = 1..fan_out, fully vectorized."""
    ts: list[np.ndarray] = []
    fps: list[np.ndarray] = []
    n = len(peaks)
    for d in range(1, fan_out + 1):
        if n <= d:
            break
        a = peaks[: n - d]
        b = peaks[d:]
        ts.append(np.arange(n - d, dtype=np.int64))
        fps.append((a << np.int64(20)) | (b << np.int64(8)) | np.int64(d))
    if not ts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(ts), np.concatenate(fps)


class _Fingerprinter:
    """Actor-pool stage: decode WAV once per row, one batched rfft,
    packed peak-pair hashes out."""

    def __init__(self, frame_len: int = 256, fan_out: int = 3) -> None:
        from ..functions.wav import decode_wav

        self._decode = decode_wav
        self.frame_len = int(frame_len)
        self.fan_out = int(fan_out)

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ids_out: list[np.ndarray] = []
        ts_out: list[np.ndarray] = []
        fp_out: list[np.ndarray] = []
        for mid, blob in zip(
            batch["media_id"].to_pylist(), batch["content"].to_pylist()
        ):
            try:
                samples, _rate = self._decode(blob or b"")
            except Exception:
                continue
            mono = samples.mean(axis=1) if samples.ndim == 2 else samples
            peaks = _frame_peaks(mono * 32768.0, self.frame_len)
            t, fp = _pair_hashes(peaks, self.fan_out)
            if len(t) == 0:
                continue
            ids_out.append(np.full(len(t), int(mid), dtype=np.int64))
            ts_out.append(t)
            fp_out.append(fp)
        if not ids_out:
            return FP_SCHEMA.empty_table().to_pandas()
        return pd.DataFrame(
            {
                "media_id": np.concatenate(ids_out),
                "t": np.concatenate(ts_out),
                "fp": np.concatenate(fp_out),
            }
        )


def audio_fingerprints(
    media: ray.data.Dataset,
    *,
    frame_len: int = 256,
    fan_out: int = 3,
    concurrency=(1, 4),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """``(media_id, t, fp)`` peak-pair fingerprints over binary WAV
    payloads — actor pool, payload-aware batch size."""
    return media.select_columns(["media_id", "content"]).map_batches(
        _Fingerprinter,
        fn_constructor_kwargs={"frame_len": frame_len, "fan_out": fan_out},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_match(
    corpus: ray.data.Dataset,
    queries: ray.data.Dataset,
    *,
    frame_len: int = 256,
    fan_out: int = 3,
    min_votes: int = 2,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Best corpus match per query clip: join fingerprints on the
    hash, vote on (query, media, frame offset), keep each query's
    top cell (votes desc, then media_id / offset asc for determinism);
    cells under ``min_votes`` are noise and dropped."""
    fp_c = sanitize_for_join(
        audio_fingerprints(corpus, frame_len=frame_len, fan_out=fan_out),
        FP_SCHEMA,
    )
    fp_q = sanitize_for_join(
        audio_fingerprints(queries, frame_len=frame_len, fan_out=fan_out)
        .map_batches(
            lambda b: pa.table(
                {
                    "query_id": b["media_id"],
                    "tq": b["t"],
                    "fp": b["fp"],
                }
            ),
            batch_format="pyarrow",
        ),
        pa.schema([("query_id", pa.int64()), ("tq", pa.int64()), ("fp", pa.int64())]),
    )
    joined = cogroup_join(
        fp_q,
        fp_c,
        on=["fp"],
        how="inner",
        left_schema=pa.schema(
            [("query_id", pa.int64()), ("tq", pa.int64()), ("fp", pa.int64())]
        ),
        right_schema=FP_SCHEMA,
        num_buckets=num_buckets,
    )

    def _cells(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int64"),
                    "media_id": pd.Series(dtype="int64"),
                    "offset": pd.Series(dtype="int64"),
                    "votes": pd.Series(dtype="int64"),
                }
            )
        cells = pd.DataFrame(
            {
                "query_id": b["query_id"].to_numpy().astype(np.int64),
                "media_id": b["media_id"].to_numpy().astype(np.int64),
                "offset": (b["t"].to_numpy() - b["tq"].to_numpy()).astype(np.int64),
                "votes": np.ones(len(b), dtype=np.int64),
            }
        )
        return cells.groupby(
            ["query_id", "media_id", "offset"], as_index=False, sort=False
        )["votes"].sum()

    cell_schema = pa.schema(
        [
            ("query_id", pa.int64()),
            ("media_id", pa.int64()),
            ("offset", pa.int64()),
            ("votes", pa.int64()),
        ]
    )
    cells = bucketed_reduce(
        joined.map_batches(_cells, batch_format="pandas"),
        ["query_id", "media_id", "offset"],
        _cells_reduce,
        cell_schema,
        num_buckets=num_buckets,
    )

    def _top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["votes"] >= min_votes]
        if len(g) == 0:
            return MATCH_SCHEMA.empty_table().to_pandas()
        g = g.sort_values(
            ["query_id", "votes", "media_id", "offset"],
            ascending=[True, False, True, True],
            kind="stable",
        )
        return g.drop_duplicates("query_id")[
            ["query_id", "media_id", "offset", "votes"]
        ]

    return normalize_blocks(
        bucketed_reduce(
            cells, ["query_id"], _top1, MATCH_SCHEMA, num_buckets=num_buckets
        ),
        MATCH_SCHEMA,
    )


def _cells_reduce(g: pd.DataFrame) -> pd.DataFrame:
    return g.groupby(
        ["query_id", "media_id", "offset"], as_index=False, sort=False
    )["votes"].sum()


def synth_melody_media(
    sf_dir: str,
    *,
    n_segments: int = 10,
    seg_len: int = 512,
    rate: int = 8000,
    limit: int | None = None,
) -> ray.data.Dataset:
    """Deterministic per-document MELODIES (a sequence of pure-tone
    segments whose frequencies derive from the doc digest) — unlike a
    single tone, the peak sequence is document-specific, which is what
    a fingerprint needs. Same schema as ``synth_media_from_documents``."""
    import os

    from ..functions.wav import encode_wav

    from ..sources.readers import read_parquet_clean
    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    if limit is not None:
        docs = docs.limit(limit)

    def _blob(i: int) -> bytes:
        digest = hashlib.md5(f"melody:{i}".encode()).digest()
        segs = []
        for s in range(n_segments):
            bin_idx = 2 + digest[s % len(digest)] % 100  # FFT bin at frame 256
            freq = bin_idx * rate / 256.0
            t = np.arange(seg_len)
            segs.append(10000 * np.sin(2 * np.pi * freq * t / rate))
        samples = np.concatenate(segs).astype(np.int16)
        return encode_wav(samples, rate=rate)

    def _f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "content": pa.array([_blob(int(i)) for i in ids], pa.binary()),
            }
        )

    return docs.map_batches(_f, batch_format="pyarrow")


def trim_clips(media: ray.data.Dataset, *, skip_frames: int,
               frame_len: int = 256) -> ray.data.Dataset:
    """Re-encode each WAV with the first ``skip_frames`` frames
    dropped — the snippet generator for match tests/queries."""
    from ..functions.wav import decode_wav, encode_wav

    skip = int(skip_frames) * int(frame_len)

    def _trim(batch: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for mid, blob in zip(
            batch["media_id"].to_pylist(), batch["content"].to_pylist()
        ):
            try:
                samples, rate = decode_wav(blob or b"")
            except Exception:
                continue
            mono = samples.mean(axis=1) if samples.ndim == 2 else samples
            cut = (mono[skip:] * 32768.0).astype(np.int16)
            if len(cut) == 0:
                continue
            ids.append(int(mid))
            blobs.append(encode_wav(cut, rate=rate))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "content": pa.array(blobs, pa.binary()),
            }
        )

    return media.map_batches(_trim, batch_format="pyarrow")
