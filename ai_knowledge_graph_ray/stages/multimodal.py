"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata, the
standard layout for multimodal training-data pipelines. The actual
codec work (image decode, resize, audio features, frame sampling) is
STUBBED — the sandbox ships no imaging/audio libraries — behind a
deterministic fake so the Ray-side plumbing (schema, actor-pool
signature, batch sizing for large payloads, output layout) is real and
tested:

- ``decoder="fake"`` (default): deterministic pseudo-decode — fixed
  shape + md5-seeded statistics from the bytes; fully testable.
- ``decoder="png"``: a REAL decode path — the dependency-free PNG
  codec in ``functions/png.py`` (zlib scanline filters 0-4, 8-bit
  RGB/RGBA). Undecodable rows are emitted with ``decode_ok=false``
  and zero features (rejects side-channel, not a crash).
- ``decoder="pil"`` / ``"ffmpeg"``: raise ``NotImplementedError`` with
  the dependency name (swap-in point for a real cluster image).

Stages are actor pools (``map_batches(Cls, concurrency=...)``) with a
small default ``batch_size`` because each row carries a large binary
payload — the knob that keeps ``batch_size x concurrency x payload``
inside worker heaps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # image | audio | video
        ("content", pa.binary()),
        ("mime", pa.string()),
        ("source_url", pa.string()),
    ]
)

FEATURE_DIM = 64


def synth_media_from_documents(sf_dir: str, media_type: str = "image") -> ray.data.Dataset:
    """Deterministic media table derived from the documents corpus:
    content bytes are a pure function of (doc_id, text) — stands in
    for a WARC media payload at the same schema. ``media_type="png"``
    emits REAL (small) PNG images so the actual codec path is exercised
    end-to-end."""
    import os

    from ..sources.readers import read_parquet_clean
    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def _blob(i, t):
        digest = hashlib.md5(f"{i}:{(t or '')[:64]}".encode()).digest()
        if media_type == "png":
            from ..functions.png import encode_png

            rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
            h, w = 8 + digest[4] % 9, 8 + digest[5] % 9
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            return encode_png(img, filter_type=digest[6] % 5)
        if media_type == "wav":
            from ..functions.wav import encode_wav

            rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
            n = 400 + int(digest[4]) * 8
            tone = (
                10000 * np.sin(2 * np.pi * (100 + digest[5]) * np.arange(n) / 8000.0)
            ).astype(np.int16)
            return encode_wav(tone, rate=8000)
        return digest * 64

    def _f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        blobs = [_blob(i, t) for i, t in zip(ids, texts)]
        mime = {
            "png": "image/png",
            "wav": "audio/wav",
            "image": "image/fake",
        }.get(media_type, "audio/fake")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array([media_type] * len(ids), pa.string()),
                "content": pa.array(blobs, pa.binary()),
                "mime": pa.array([mime] * len(ids), pa.string()),
                "source_url": pa.array(
                    [f"https://example.org/media/{i}" for i in ids], pa.string()
                ),
            }
        )

    return docs.map_batches(_f, batch_format="pyarrow")


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract one media batch.

    ``__init__`` is where a real deployment loads the codec/model once
    per actor; the fake decoder derives a deterministic FEATURE_DIM
    float vector and (h, w) metadata from the content hash.
    """

    def __init__(self, decoder: str = "fake", target_size: tuple[int, int] = (224, 224)) -> None:
        self.decoder = decoder
        self.target_size = target_size
        if decoder == "fake":
            self._decode = self._fake_decode
        elif decoder == "png":
            self._decode = self._png_decode
        elif decoder == "wav":
            self._decode = self._wav_decode
        elif decoder == "pil":
            raise NotImplementedError(
                "real image decode needs Pillow; not available in this sandbox — "
                "install pillow and implement _pil_decode on a real cluster image"
            )
        elif decoder == "ffmpeg":
            raise NotImplementedError(
                "real audio/video decode needs ffmpeg bindings; not available here"
            )
        else:
            raise ValueError(f"unknown decoder: {decoder}")

    def _fake_decode(self, blob: bytes) -> tuple[int, int, np.ndarray, bool]:
        digest = hashlib.md5(blob or b"").digest()
        h = 128 + digest[0]
        w = 128 + digest[1]
        seed = int.from_bytes(digest[:4], "big")
        rng = np.random.RandomState(seed)
        feats = rng.randn(FEATURE_DIM).astype(np.float64)
        return h, w, feats, True

    def _png_decode(self, blob: bytes) -> tuple[int, int, np.ndarray, bool]:
        from ..functions.png import UnsupportedPngError, decode_png, png_features

        try:
            img = decode_png(blob or b"")
        except Exception:  # UnsupportedPngError, corrupt zlib, ...
            return 0, 0, np.zeros(FEATURE_DIM, dtype=np.float64), False
        h, w = img.shape[:2]
        return h, w, png_features(img, FEATURE_DIM), True

    def _wav_decode(self, blob: bytes) -> tuple[int, int, np.ndarray, bool]:
        from ..functions.wav import decode_wav, wav_features

        try:
            samples, rate = decode_wav(blob or b"")
        except Exception:
            return 0, 0, np.zeros(FEATURE_DIM, dtype=np.float64), False
        # (height, width) repurposed as (n_frames, sample_rate)
        return len(samples), rate, wav_features(samples, rate, FEATURE_DIM), True

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        blobs = batch["content"].to_pylist()
        hs, ws, feats, oks = [], [], [], []
        for blob in blobs:
            h, w, f, ok = self._decode(blob)
            hs.append(h)
            ws.append(w)
            feats.append(f.tolist())
            oks.append(ok)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "height": pa.array(hs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "target_h": pa.array([self.target_size[0]] * len(ids), pa.int32()),
                "target_w": pa.array([self.target_size[1]] * len(ids), pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float64())),
                "decode_ok": pa.array(oks, pa.bool_()),
            }
        )


def extract_media_features(
    media: ray.data.Dataset,
    *,
    decoder: str = "fake",
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """media table -> ``(media_id, height, width, target_*, features)``.

    Small ``batch_size`` by design: rows carry the full binary payload,
    so ``batch_size x concurrency`` bounds peak worker memory.
    """
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def resize_nearest(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) uint8 array — pure
    numpy index mapping (source index = floor(i * h / th)), no PIL
    dependency. Deterministic and shape-exact."""
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot resize an empty image")
    rows = (np.arange(th, dtype=np.int64) * h) // th
    cols = (np.arange(tw, dtype=np.int64) * w) // tw
    return img[rows][:, cols]


class ImageResizer:
    """Actor-pool stage: REAL decode -> nearest-neighbor resize ->
    re-encode through the stdlib PNG codec. A real deployment swaps
    the codec in ``__init__`` (PIL/turbojpeg) and keeps the identical
    batch contract: (media_id, content) -> (media_id, content,
    height, width, resize_ok)."""

    def __init__(self, target_size: tuple[int, int] = (64, 64)) -> None:
        from ..functions import png as _png  # codec bound once per actor

        self._png = _png
        self.th, self.tw = int(target_size[0]), int(target_size[1])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        out_blobs: list[bytes] = []
        ok: list[bool] = []
        for blob in batch["content"].to_pylist():
            try:
                img = self._png.decode_png(blob or b"")
                out_blobs.append(
                    self._png.encode_png(resize_nearest(img, self.th, self.tw))
                )
                ok.append(True)
            except Exception:
                out_blobs.append(b"")
                ok.append(False)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "content": pa.array(out_blobs, pa.binary()),
                "height": pa.array(
                    [self.th if o else 0 for o in ok], pa.int32()
                ),
                "width": pa.array([self.tw if o else 0 for o in ok], pa.int32()),
                "resize_ok": pa.array(ok, pa.bool_()),
            }
        )


def resize_images(
    media: ray.data.Dataset,
    *,
    target_size: tuple[int, int] = (64, 64),
    concurrency=(1, 8),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Distributed image resize over a binary ``content`` column:
    stateful actor pool (codec bound in ``__init__``), small batches —
    decoded frames are the memory hot spot, not the encoded payloads."""
    return media.select_columns(["media_id", "content"]).map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target_size": target_size},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resample_linear(samples: np.ndarray, rate: int, target_rate: int) -> np.ndarray:
    """Linear-interpolation resample of (n, channels) float samples to
    ``target_rate`` — pure ``np.interp`` per channel, no scipy. Output
    length = round(n * target_rate / rate)."""
    n = samples.shape[0]
    if n == 0 or rate <= 0 or target_rate <= 0:
        raise ValueError("need non-empty samples and positive rates")
    m = max(1, int(round(n * target_rate / rate)))
    src_t = np.arange(n, dtype=np.float64) / rate
    dst_t = np.arange(m, dtype=np.float64) / target_rate
    return np.stack(
        [np.interp(dst_t, src_t, samples[:, c]) for c in range(samples.shape[1])],
        axis=1,
    )


class AudioResampler:
    """Actor-pool stage: REAL WAV decode -> linear resample ->
    re-encode (int16). Same contract shape as :class:`ImageResizer`:
    (media_id, content) -> (media_id, content, height=n_samples,
    width=rate, resample_ok)."""

    def __init__(self, target_rate: int = 8000) -> None:
        from ..functions import wav as _wav

        self._wav = _wav
        self.target_rate = int(target_rate)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        out_blobs: list[bytes] = []
        n_out: list[int] = []
        ok: list[bool] = []
        for blob in batch["content"].to_pylist():
            try:
                samples, rate = self._wav.decode_wav(blob or b"")
                res = resample_linear(samples, rate, self.target_rate)
                pcm = np.clip(np.round(res * 32767.0), -32768, 32767).astype(np.int16)
                out_blobs.append(self._wav.encode_wav(pcm, rate=self.target_rate))
                n_out.append(len(pcm))
                ok.append(True)
            except Exception:
                out_blobs.append(b"")
                n_out.append(0)
                ok.append(False)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "content": pa.array(out_blobs, pa.binary()),
                "height": pa.array(n_out, pa.int32()),
                "width": pa.array(
                    [self.target_rate if o else 0 for o in ok], pa.int32()
                ),
                "resample_ok": pa.array(ok, pa.bool_()),
            }
        )


def resample_audio(
    media: ray.data.Dataset,
    *,
    target_rate: int = 8000,
    concurrency=(1, 8),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Distributed audio resample over a binary ``content`` column
    (actor pool, codec bound once per actor)."""
    return media.select_columns(["media_id", "content"]).map_batches(
        AudioResampler,
        fn_constructor_kwargs={"target_rate": target_rate},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_stub(
    media: ray.data.Dataset, *, every_n: int = 10, max_frames: int = 8
) -> ray.data.Dataset:
    """Video frame-sampling plumbing: emits one row per (deterministic)
    sampled frame index with a fake frame payload — the real decoder
    slot is the same ``MediaFeatureExtractor`` signature."""

    def _f(batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, blob in zip(batch["media_id"].to_pylist(), batch["content"].to_pylist()):
            n_frames = 1 + (hashlib.md5(blob or b"").digest()[2] % 100)
            for k, frame_i in enumerate(range(0, n_frames, every_n)):
                if k >= max_frames:
                    break
                ids.append(mid)
                fidx.append(frame_i)
                frames.append(hashlib.md5(f"{mid}:{frame_i}".encode()).digest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )

    return media.map_batches(_f, batch_format="pyarrow", batch_size=16)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash, public): grayscale, area-resize
    to 9x8, compare horizontal neighbors row-wise — robust to
    re-encoding, small noise, and resizing, which byte hashes are
    not. Pure integer numpy."""
    if img.ndim == 3:
        gray = img.astype(np.int64).sum(axis=2) // img.shape[2]
    else:
        gray = img.astype(np.int64)
    h, w = gray.shape
    th, tw = 8, 9
    # area pooling via bucketed row/col sums (exact integer means)
    ri = np.minimum((np.arange(h) * th) // max(1, h), th - 1)
    ci = np.minimum((np.arange(w) * tw) // max(1, w), tw - 1)
    sums = np.zeros((th, tw), dtype=np.int64)
    cnts = np.zeros((th, tw), dtype=np.int64)
    np.add.at(sums, (ri[:, None], ci[None, :]), gray)
    np.add.at(cnts, (ri[:, None], ci[None, :]), 1)
    cells = sums // np.maximum(1, cnts)
    bits = (cells[:, 1:] > cells[:, :-1]).reshape(-1)  # 8x8
    return int(np.packbits(bits).view(">u8")[0])


def synth_media_with_editions(sf_dir: str) -> ray.data.Dataset:
    """The PNG media table plus planted re-encoded editions: every
    5th document's image is re-emitted byte-DIFFERENT (another PNG
    filter type) but pixel-identical, as ``media_id + 1_000_000`` —
    the near-dup fixture exact byte hashing cannot catch."""
    base = synth_media_from_documents(sf_dir, media_type="png")

    def _editions(batch: pa.Table) -> pa.Table:
        from ..functions.png import decode_png, encode_png

        ids = batch["media_id"].to_pylist()
        blobs = batch["content"].to_pylist()
        out_ids, out_blobs = list(ids), list(blobs)
        for i, blob in zip(ids, blobs):
            if i % 5 != 0:
                continue
            img = decode_png(blob)
            redo = encode_png(img, filter_type=(i + 1) % 5)
            out_ids.append(i + 1_000_000)
            out_blobs.append(redo)
        return pa.table(
            {
                "media_id": pa.array(out_ids, pa.int64()),
                "content": pa.array(out_blobs, pa.binary()),
            }
        )

    return base.select_columns(["media_id", "content"]).map_batches(
        _editions, batch_format="pyarrow"
    )


class _DHashSig:
    """Actor-pool stage: decode PNG once per batch row, emit the
    64-bit dHash signature (codec state per actor, not per batch)."""

    def __init__(self) -> None:
        from ..functions.png import decode_png

        self._decode = decode_png

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ids = batch["media_id"].to_pylist()
        blobs = batch["content"].to_pylist()
        out_ids, sigs = [], []
        for i, blob in zip(ids, blobs):
            try:
                img = self._decode(blob or b"")
            except Exception:
                continue  # undecodable media can't near-dup
            out_ids.append(i)
            sigs.append(dhash64(img))
        return pd.DataFrame(
            {
                "media_id": np.asarray(out_ids, dtype=np.int64),
                "sig": pd.array(np.asarray(sigs, dtype=np.uint64), dtype="uint64"),
            }
        )


def phash_media_dedup(
    media: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    concurrency=(1, 4),
    driver_max_pairs: int | None = None,
) -> ray.data.Dataset:
    """Perceptual near-dup mapping ``(media_id, dup_of)`` over an
    image table: dHash signatures in the decode actor pool, then the
    SAME 4x16-band Hamming engine the text SimHash dedup uses
    (``dedup.hamming_band_dedup``) — byte-different re-encodings and
    lightly-noised copies collapse; distinct images don't."""
    from .dedup import DRIVER_MAX_PAIRS, hamming_band_dedup

    sigs = media.select_columns(["media_id", "content"]).map_batches(
        _DHashSig, batch_format="pyarrow", concurrency=concurrency,
        batch_size=64,
    )
    return hamming_band_dedup(
        sigs, id_col="media_id", sig_col="sig", max_hamming=max_hamming,
        driver_max_pairs=(
            DRIVER_MAX_PAIRS if driver_max_pairs is None else driver_max_pairs
        ),
    )


VAD_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("seg_id", pa.int64()),
        ("start_frame", pa.int64()),
        ("end_frame", pa.int64()),
        ("energy_mean", pa.int64()),
    ]
)


class _VadSegments:
    """Actor-pool stage: decode WAV once per row, frame the samples,
    threshold integer mean-abs energy, and merge consecutive active
    frames into segments (vectorized gaps-and-islands per clip)."""

    def __init__(self, frame_len: int = 160, threshold: int = 500) -> None:
        from ..functions.wav import decode_wav

        self._decode = decode_wav
        self.frame_len = frame_len
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ids = batch["media_id"].to_pylist()
        blobs = batch["content"].to_pylist()
        out = {k: [] for k in VAD_SCHEMA.names}
        for mid, blob in zip(ids, blobs):
            try:
                samples, _rate = self._decode(blob or b"")
            except Exception:
                continue
            # decode_wav yields (n, ch) float64 in [-1, 1]; fold
            # channels and rescale to int16 units so energy is integer
            mono = np.abs(samples).mean(axis=1) if samples.ndim == 2 else np.abs(samples)
            amp = (mono * 32768.0).astype(np.int64)
            n = (len(amp) // self.frame_len) * self.frame_len
            if n == 0:
                continue
            frames = amp[:n].reshape(-1, self.frame_len)
            energy = frames.sum(axis=1) // self.frame_len
            active = energy > self.threshold
            if not active.any():
                continue
            prev = np.empty(len(active), dtype=bool)
            prev[0] = False
            prev[1:] = active[:-1]
            starts = np.nonzero(active & ~prev)[0]
            nxt = np.empty(len(active), dtype=bool)
            nxt[-1] = False
            nxt[:-1] = active[1:]
            ends = np.nonzero(active & ~nxt)[0] + 1  # exclusive
            for si, (s, e) in enumerate(zip(starts, ends)):
                out["media_id"].append(mid)
                out["seg_id"].append(si)
                out["start_frame"].append(int(s))
                out["end_frame"].append(int(e))
                out["energy_mean"].append(int(energy[s:e].mean()))
        return pd.DataFrame(
            {k: np.asarray(v, dtype=np.int64) for k, v in out.items()}
        )


def vad_segments(
    media: ray.data.Dataset,
    *,
    frame_len: int = 160,
    threshold: int = 500,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    """Voice-activity segments per audio clip: ``(media_id, seg_id,
    start_frame, end_frame, energy_mean)`` — integer mean-abs energy
    over fixed frames, threshold, merge runs. Map-only actor pool
    (codec state per actor); the standard pre-filter before ASR or
    audio feature extraction at corpus scale."""
    from .infer import normalize_blocks

    segs = media.select_columns(["media_id", "content"]).map_batches(
        _VadSegments,
        fn_constructor_kwargs={"frame_len": frame_len, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
    return normalize_blocks(segs, VAD_SCHEMA)


HIST_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("channel", pa.int64()),
        ("bucket", pa.int64()),
        ("n_pixels", pa.int64()),
    ]
)


class _ChannelHistogram:
    """Actor-pool stage: decode PNG once per payload, emit a 16-bin
    intensity histogram per channel — the exposure/colorcast screen an
    image-curation pass runs before training (all-dark / clipped /
    single-color images fail it). Codec bound once per actor; the
    histogram itself is ONE vectorized ``np.bincount`` over
    ``channel * 16 + (value >> 4)`` composite codes per image — no
    per-pixel Python."""

    def __init__(self, n_bins: int = 16) -> None:
        from ..functions import png as _png

        self._png = _png
        self.n_bins = int(n_bins)
        assert 256 % self.n_bins == 0
        self.shift = (256 // self.n_bins).bit_length() - 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        ch_out: list[np.ndarray] = []
        bk_out: list[np.ndarray] = []
        px_out: list[np.ndarray] = []
        for mid, blob in zip(
            batch["media_id"].to_pylist(), batch["content"].to_pylist()
        ):
            try:
                img = self._png.decode_png(blob or b"")
            except Exception:
                continue
            c = img.shape[2]
            codes = (
                np.arange(c, dtype=np.int64)[None, None, :] * self.n_bins
                + (img.astype(np.int64) >> self.shift)
            ).ravel()
            counts = np.bincount(codes, minlength=c * self.n_bins)
            nz = np.flatnonzero(counts)
            ids_out.extend([int(mid)] * len(nz))
            ch_out.append(nz // self.n_bins)
            bk_out.append(nz % self.n_bins)
            px_out.append(counts[nz])
        if not ids_out:
            return HIST_SCHEMA.empty_table()
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "channel": pa.array(np.concatenate(ch_out), pa.int64()),
                "bucket": pa.array(np.concatenate(bk_out), pa.int64()),
                "n_pixels": pa.array(np.concatenate(px_out), pa.int64()),
            }
        )


def channel_histograms(
    media: ray.data.Dataset,
    *,
    n_bins: int = 16,
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Per-image per-channel intensity histograms over binary PNG
    payloads — actor pool (codec state in ``__init__``), payload-aware
    ``batch_size`` like the other media stages; only nonzero bins are
    emitted so output rows stay <= images x channels x bins."""
    return media.select_columns(["media_id", "content"]).map_batches(
        _ChannelHistogram,
        fn_constructor_kwargs={"n_bins": n_bins},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


SPEC_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("frame_id", pa.int64()),
        ("band", pa.int64()),
        ("energy", pa.int64()),
    ]
)


class _Spectrogram:
    """Actor-pool stage: decode WAV once per row, frame the samples,
    ONE batched ``np.fft.rfft`` over the whole frame matrix per clip,
    fold |X|^2 bins into ``n_bands`` equal-width bands, floor to int64
    — the audio-feature extraction stage (language/music/silence
    screens run on exactly this banded energy shape). Deterministic:
    FFT of identical frames is bit-stable, and the integer floor makes
    the emitted rows layout-independent."""

    def __init__(self, frame_len: int = 256, n_bands: int = 8, scale: int = 1) -> None:
        from ..functions.wav import decode_wav

        self._decode = decode_wav
        self.frame_len = int(frame_len)
        self.n_bands = int(n_bands)
        self.scale = int(scale)

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        out = {k: [] for k in SPEC_SCHEMA.names}
        for mid, blob in zip(
            batch["media_id"].to_pylist(), batch["content"].to_pylist()
        ):
            try:
                samples, _rate = self._decode(blob or b"")
            except Exception:
                continue
            mono = samples.mean(axis=1) if samples.ndim == 2 else samples
            amp = mono * 32768.0
            n = (len(amp) // self.frame_len) * self.frame_len
            if n == 0:
                continue
            frames = amp[:n].reshape(-1, self.frame_len)
            spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (F, frame_len//2+1)
            nbins = spec.shape[1] - 1  # drop the Nyquist bin for even split
            per = nbins // self.n_bands
            usable = spec[:, : per * self.n_bands]
            bands = usable.reshape(spec.shape[0], self.n_bands, per).sum(axis=2)
            energy = np.floor(bands * self.scale).astype(np.int64)
            f_ids, b_ids = np.nonzero(energy > 0)
            out["media_id"].extend([int(mid)] * len(f_ids))
            out["frame_id"].extend(f_ids.tolist())
            out["band"].extend(b_ids.tolist())
            out["energy"].extend(energy[f_ids, b_ids].tolist())
        return pd.DataFrame({k: np.asarray(v, dtype=np.int64) for k, v in out.items()})


def wav_spectrogram(
    media: ray.data.Dataset,
    *,
    frame_len: int = 256,
    n_bands: int = 8,
    concurrency=(1, 4),
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Banded power-spectrogram rows ``(media_id, frame_id, band,
    energy)`` over binary WAV payloads — actor pool, payload-aware
    batch size; only positive-energy cells emitted."""
    return media.select_columns(["media_id", "content"]).map_batches(
        _Spectrogram,
        fn_constructor_kwargs={"frame_len": frame_len, "n_bands": n_bands},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
