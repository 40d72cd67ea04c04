"""Pure-stdlib PNG codec (zlib + struct) — the REAL image-decode path
for the multimodal stage.

The sandbox ships no imaging libraries, but PNG is just zlib over
per-row filtered scanlines, so a dependency-free codec upgrades the
multimodal plumbing from "deterministic fake" to an actual decode for
the most common web image format. Supported: 8-bit-depth, color type 2
(RGB) and 6 (RGBA), non-interlaced — the shape the encoder here emits
and the overwhelming majority of web PNGs. Everything else raises
``UnsupportedPngError`` (callers route those rows to a rejects
column, same policy as the extraction rejects side-channel).

Filters 0-4 (none/sub/up/average/paeth) are implemented on both sides;
the encoder takes a per-image filter type so tests can exercise every
decode branch with exact round-trips.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


class UnsupportedPngError(ValueError):
    pass


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray, *, filter_type: int = 0) -> bytes:
    """(h, w, 3|4) uint8 -> PNG bytes, every row filtered with
    ``filter_type`` (0-4)."""
    if img.ndim != 3 or img.shape[2] not in (3, 4) or img.dtype != np.uint8:
        raise ValueError("need (h, w, 3|4) uint8")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type in 0..4")
    h, w, ch = img.shape
    color_type = 2 if ch == 3 else 6
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        row = img[y]
        left = np.vstack([np.zeros((1, ch), np.uint8), row[:-1]])
        upleft = np.vstack([np.zeros((1, ch), np.uint8), prev[:-1]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # sub
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # up
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:  # average
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (row.astype(np.int16) - avg).astype(np.uint8)
        else:  # paeth
            filt = (row.astype(np.int16) - _paeth(left, prev, upleft)).astype(np.uint8)
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3|4) uint8. 8-bit RGB/RGBA, non-interlaced."""
    if not data or not data.startswith(_SIGNATURE):
        raise UnsupportedPngError("not a PNG")
    pos = len(_SIGNATURE)
    width = height = None
    channels = 0
    idat = bytearray()
    # Truncated/corrupt chunk payloads raise struct.error / zlib.error;
    # re-raise everything as the documented UnsupportedPngError so
    # direct callers can rely on one exception contract.
    try:
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            payload = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", payload
                )
                if depth != 8:
                    raise UnsupportedPngError(f"bit depth {depth}")
                if color_type not in (2, 6):
                    raise UnsupportedPngError(f"color type {color_type}")
                if interlace != 0:
                    raise UnsupportedPngError("interlaced")
                channels = 3 if color_type == 2 else 4
            elif tag == b"IDAT":
                idat.extend(payload)
            elif tag == b"IEND":
                break
        if width is None or not idat:
            raise UnsupportedPngError("missing IHDR/IDAT")
        raw = zlib.decompress(bytes(idat))
    except (struct.error, zlib.error) as exc:
        raise UnsupportedPngError(f"corrupt PNG: {exc}") from exc
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise UnsupportedPngError("scanline size mismatch")
    out = np.empty((height, width, channels), dtype=np.uint8)
    prev = np.zeros((width, channels), dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1).reshape(width, channels)
        if ftype == 0:
            rec = row.copy()
        elif ftype == 2:  # up
            rec = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):
            # left-dependent filters reconstruct pixel-by-pixel
            rec = np.zeros_like(row)
            for x in range(width):
                left = rec[x - 1] if x else np.zeros(channels, np.uint8)
                up = prev[x]
                upleft = prev[x - 1] if x else np.zeros(channels, np.uint8)
                if ftype == 1:
                    pred = left.astype(np.int16)
                elif ftype == 3:
                    pred = (left.astype(np.int16) + up.astype(np.int16)) // 2
                else:
                    pred = _paeth(
                        left[None, :], up[None, :], upleft[None, :]
                    )[0].astype(np.int16)
                rec[x] = (row[x].astype(np.int16) + pred).astype(np.uint8)
        else:
            raise UnsupportedPngError(f"filter {ftype}")
        out[y] = rec
        prev = rec
    return out


def png_features(img: np.ndarray, dim: int = 64) -> np.ndarray:
    """Deterministic ``dim``-float feature vector from a decoded image:
    4x4 grid of per-cell channel means (48), global per-channel
    mean/std (6), normalized h/w (2), zero-padded."""
    h, w, ch = img.shape
    rgb = img[:, :, :3].astype(np.float64)
    feats = []
    for gy in range(4):
        for gx in range(4):
            cell = rgb[
                (h * gy) // 4 : max((h * (gy + 1)) // 4, (h * gy) // 4 + 1),
                (w * gx) // 4 : max((w * (gx + 1)) // 4, (w * gx) // 4 + 1),
            ]
            feats.extend(cell.reshape(-1, 3).mean(axis=0) / 255.0)
    feats.extend(rgb.reshape(-1, 3).mean(axis=0) / 255.0)
    feats.extend(rgb.reshape(-1, 3).std(axis=0) / 255.0)
    feats.append(min(h, 4096) / 4096.0)
    feats.append(min(w, 4096) / 4096.0)
    out = np.zeros(dim, dtype=np.float64)
    out[: min(dim, len(feats))] = feats[:dim]
    return out
