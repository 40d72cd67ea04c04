"""Content-defined chunking (FastCDC-style gear rolling hash) and
chunk-level dedup statistics.

Fixed-size chunking breaks on any insertion (every later chunk
shifts); CDC cuts where a rolling hash of the trailing 64 bytes hits a
mask, so chunk boundaries are a function of LOCAL CONTENT only — an
edit near the front of a document re-chunks at most one or two chunks
and the rest of the corpus keeps its chunk identities. That is what
makes chunk-hash dedup effective on near-identical crawl snapshots
(the reference dedups whole documents only; this is the sub-document
generalization used by storage systems and long-doc near-dup).

Scale shape: the gear hash is computed VECTORIZED over the
concatenated batch payload (64 shift-add passes in numpy, never a
per-byte Python loop); the boundary walk is per emitted chunk (output-
size bound, ~bytes/target_size iterations); chunk identity is md5 of
the chunk bytes. Dedup statistics run through one bucketed reduce on
the chunk hash with a map-side combiner — the standard dedup exchange.

Cross-document window hygiene: the rolling window is 64 bytes and cut
candidates below ``min_size >= 64`` bytes into a document are never
eligible, so hashing the batch as one buffer cannot leak a neighbor
document's bytes into any CHOSEN boundary.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce, normalize_blocks, pa_from_pandas

_WINDOW = 64


def _gear_table() -> np.ndarray:
    """256 deterministic uint64 gear values (splitmix64 of the byte)."""
    x = np.arange(256, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


_GEAR = _gear_table()


def gear_hashes(data: np.ndarray) -> np.ndarray:
    """Rolling gear hash at every position of a uint8 buffer:
    ``h[i] = sum_{k<64} GEAR[data[i-k]] << k (mod 2^64)`` — the closed
    form of ``h = (h << 1) + GEAR[b]`` (older terms shift out of the
    64-bit word). 64 vectorized shift-add passes, no per-byte Python."""
    n = len(data)
    h = np.zeros(n, dtype=np.uint64)
    g = _GEAR[data]
    with np.errstate(over="ignore"):
        for k in range(min(_WINDOW, n)):
            if k == 0:
                h += g
            else:
                h[k:] += g[: n - k] << np.uint64(k)
    return h


def chunk_boundaries(
    candidates: np.ndarray,
    n: int,
    *,
    min_size: int,
    max_size: int,
) -> list[int]:
    """Cut positions (exclusive ends) for one document given the
    sorted candidate cut positions where the masked gear hash hit
    zero. Walk is O(#chunks): first candidate in
    ``[start+min_size, start+max_size]`` wins, else a forced cut at
    ``start+max_size``; a tail shorter than ``min_size`` merges into
    the forced/natural cut arithmetic as its own final chunk."""
    cuts: list[int] = []
    start = 0
    while start < n:
        if n - start <= min_size:
            cuts.append(n)
            break
        lo = start + min_size
        limit = min(start + max_size, n)
        j = int(np.searchsorted(candidates, lo, side="left"))
        if j < len(candidates) and candidates[j] <= limit:
            cut = int(candidates[j])
        else:
            cut = limit
        cuts.append(cut)
        start = cut
    return cuts


CDC_CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("chunk_idx", pa.int64()),
        ("start", pa.int64()),
        ("length", pa.int64()),
        ("chunk_md5", pa.string()),
    ]
)


def cdc_chunk_table(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_size: int = 64,
    avg_bits: int = 8,
    max_size: int = 1024,
) -> ray.data.Dataset:
    """``(doc_id, chunk_idx, start, length, chunk_md5)`` — one row per
    content-defined chunk. Map-only; deterministic for any block
    layout (boundaries depend only on each document's own bytes)."""
    if min_size < _WINDOW:
        raise ValueError(f"min_size must be >= the {_WINDOW}-byte hash window")
    if max_size < min_size:
        raise ValueError("max_size must be >= min_size")
    mask = np.uint64((1 << avg_bits) - 1)

    def _chunks(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return CDC_CHUNK_SCHEMA.empty_table().to_pandas()
        payloads = b[text_col].fillna("").str.encode("utf-8")
        lens = payloads.str.len().to_numpy().astype(np.int64)
        buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        h = gear_hashes(buf)
        all_cands = np.flatnonzero((h & mask) == np.uint64(0)) + 1
        offs = np.concatenate([[0], np.cumsum(lens)])
        ids_out: list[int] = []
        idx_out: list[int] = []
        st_out: list[int] = []
        ln_out: list[int] = []
        md_out: list[str] = []
        ids = b[id_col].to_numpy()
        for r in range(len(b)):
            n = int(lens[r])
            if n == 0:
                continue
            o0, o1 = int(offs[r]), int(offs[r + 1])
            lo = np.searchsorted(all_cands, o0 + min_size, side="left")
            hi = np.searchsorted(all_cands, o1, side="left")
            cands = all_cands[lo:hi] - o0
            cuts = chunk_boundaries(cands, n, min_size=min_size, max_size=max_size)
            prev = 0
            for ci, cut in enumerate(cuts):
                seg = buf[o0 + prev : o0 + cut]
                ids_out.append(int(ids[r]))
                idx_out.append(ci)
                st_out.append(prev)
                ln_out.append(cut - prev)
                md_out.append(hashlib.md5(seg.tobytes()).hexdigest())
                prev = cut
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids_out, dtype="int64"),
                "chunk_idx": pd.Series(idx_out, dtype="int64"),
                "start": pd.Series(st_out, dtype="int64"),
                "length": pd.Series(ln_out, dtype="int64"),
                "chunk_md5": pd.Series(md_out, dtype="object"),
            }
        )

    return normalize_blocks(
        docs.map_batches(_chunks, batch_format="pandas"), CDC_CHUNK_SCHEMA
    )


CDC_STATS_SCHEMA = pa.schema(
    [
        ("n_chunks", pa.int64()),
        ("n_distinct", pa.int64()),
        ("bytes_total", pa.int64()),
        ("bytes_distinct", pa.int64()),
        ("dedup_ratio_milli", pa.int64()),
    ]
)


def cdc_dedup_stats(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_size: int = 64,
    avg_bits: int = 8,
    max_size: int = 1024,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """One-row corpus summary of chunk-level duplication:
    ``bytes_distinct / bytes_total`` is the storage a chunk store
    would need (``dedup_ratio_milli`` = its integer permille). One
    bucketed exchange on the chunk hash (map-side combiner collapses
    within-block repeats); the per-hash residue reduces to one partial
    row per output block before the driver sums."""
    chunks = cdc_chunk_table(
        docs,
        id_col=id_col,
        text_col=text_col,
        min_size=min_size,
        avg_bits=avg_bits,
        max_size=max_size,
    )

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "chunk_md5": pd.Series(dtype="object"),
                    "length": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        if "n" not in b.columns:
            b = pd.DataFrame(
                {
                    "chunk_md5": b["chunk_md5"].to_numpy(),
                    "length": b["length"].to_numpy(),
                    "n": np.ones(len(b), dtype=np.int64),
                }
            )
        return b.groupby(["chunk_md5", "length"], as_index=False, sort=False)[
            "n"
        ].sum()

    per_hash = bucketed_reduce(
        chunks.map_batches(
            lambda b: b[["chunk_md5", "length"]] if len(b) else b,
            batch_format="pandas",
        ),
        ["chunk_md5"],
        _comb,
        pa.schema(
            [("chunk_md5", pa.string()), ("length", pa.int64()), ("n", pa.int64())]
        ),
        combiner=_comb,
        num_buckets=num_buckets,
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "n" not in b.columns:
            return pd.DataFrame(
                {
                    "n_chunks": pd.Series(dtype="int64"),
                    "n_distinct": pd.Series(dtype="int64"),
                    "bytes_total": pd.Series(dtype="int64"),
                    "bytes_distinct": pd.Series(dtype="int64"),
                }
            )
        n = b["n"].to_numpy().astype(np.int64)
        ln = b["length"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "n_chunks": [int(n.sum())],
                "n_distinct": [len(b)],
                "bytes_total": [int((n * ln).sum())],
                "bytes_distinct": [int(ln.sum())],
            }
        )

    parts = per_hash.map_batches(
        _partial, batch_format="pandas", batch_size=None
    ).to_pandas()
    tot = parts.sum() if len(parts) else None
    n_chunks = int(tot["n_chunks"]) if tot is not None else 0
    n_distinct = int(tot["n_distinct"]) if tot is not None else 0
    b_total = int(tot["bytes_total"]) if tot is not None else 0
    b_dist = int(tot["bytes_distinct"]) if tot is not None else 0
    ratio = (b_dist * 1000) // b_total if b_total else 1000
    return pd.DataFrame(
        {
            "n_chunks": pd.Series([n_chunks], dtype="int64"),
            "n_distinct": pd.Series([n_distinct], dtype="int64"),
            "bytes_total": pd.Series([b_total], dtype="int64"),
            "bytes_distinct": pd.Series([b_dist], dtype="int64"),
            "dedup_ratio_milli": pd.Series([ratio], dtype="int64"),
        }
    )
