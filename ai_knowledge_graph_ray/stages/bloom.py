"""Bloom-filter semi-join prefilter.

At crawl scale the expensive part of a semi/inner join is shipping
LEFT rows that can never match into the shuffle. A Bloom filter of
the right side's keys is a few hundred KiB regardless of row count,
broadcasts once (``ray.put``), and lets every left map task drop
non-members before the exchange — the classic runtime-filter push-down
(Spark/Trino "dynamic filtering"), rebuilt on Ray Data:

    build  : per-block bitmaps (vectorized double hashing), OR-merged
             on the driver (bounded: num_blocks x num_bits/8 bytes)
    filter : map-side vectorized membership test, zero shuffle
    exact  : the surviving rows still flow through the exact
             ``cogroup_join`` — false positives are removed there, so
             the composed ``semi_join_bloom`` is EXACT, the filter
             only cuts shuffle volume.

The filter hashes the same dtype-stable key frame as
``cogroup_join``'s bucket hash, so any key dtype works and the build
and probe sides always agree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .infer import stable_key_frame

def _key_series(batch: pd.DataFrame, on: list[str]) -> pd.DataFrame:
    # dtype-stable frame hash: build and probe sides must agree, and
    # canonical-int hashing skips the 5-50x str-render tax
    return stable_key_frame(batch, on)


def _mix(h: np.ndarray, c1: int, c2: int) -> np.ndarray:
    """splitmix64-style finalizer — a cheap vectorized bijection that
    decorrelates two derived hashes from one base hash. (pandas'
    ``hash_key`` seeds OBJECT columns only, so two seeded
    ``hash_pandas_object`` passes over integer keys return the SAME
    values — the Kirsch-Mitzenmacher base hashes must come from
    distinct mixers instead.)"""
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(c1)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(c2)
        return h ^ (h >> np.uint64(31))


def _canon_keys(keys):
    """Collapse 1-column key frames to a canonical-dtype Series so a
    caller passing a raw key Series to :func:`bloom_contains` hashes
    identically to the frame-built bitmap (frame-hash of one column
    != series-hash of the same column in pandas)."""
    if isinstance(keys, pd.DataFrame):
        if keys.shape[1] != 1:
            return keys  # multi-key: stable frame, frame hash
        keys = keys.iloc[:, 0]
    dt = keys.dtype
    if isinstance(dt, np.dtype) and dt.kind in ("i", "b"):
        return keys.astype("int64")
    if isinstance(dt, np.dtype) and dt.kind == "u":
        return keys.astype("uint64")
    return keys.astype(str)


def _positions(keys, num_bits: int, num_hashes: int) -> np.ndarray:
    """(len(keys) * num_hashes,) bit positions via double hashing —
    one vectorized hash pass, two independent mixes, k derived probes."""
    base = (
        pd.util.hash_pandas_object(_canon_keys(keys), index=False)
        .to_numpy()
        .astype(np.uint64)
    )
    h1 = _mix(base, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB)
    h2 = _mix(base, 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53) | np.uint64(1)
    with np.errstate(over="ignore"):
        probes = [
            (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
            for i in range(num_hashes)
        ]
    return np.concatenate(probes)


def build_bloom(
    ds: ray.data.Dataset,
    on: list[str],
    *,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
) -> np.ndarray:
    """Build a Bloom bitmap (packed ``uint8`` array, ``num_bits/8``
    bytes) of ``ds``'s keys. Per-block bitmaps are built vectorized in
    the tasks, OR-combined in a distributed fan-in pass (so the driver
    never sees one bitmap per block — at 100k blocks that residue
    would be 100k x 1 MiB), and the driver ORs the <=32 survivors."""
    nbytes = num_bits // 8

    def _block_bitmap(b: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(nbytes, dtype=np.uint8)
        if len(b):
            pos = _positions(_key_series(b, on), num_bits, num_hashes)
            np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame({"bitmap": [bm.tobytes()]})

    def _or_batch(b: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(nbytes, dtype=np.uint8)
        for payload in b["bitmap"]:
            bm |= np.frombuffer(payload, dtype=np.uint8)
        return pd.DataFrame({"bitmap": [bm.tobytes()]})

    combined = (
        ds.map_batches(_block_bitmap, batch_format="pandas", batch_size=None)
        # fan-in: many per-block bitmaps -> <=32 partition bitmaps
        .repartition(32)
        .map_batches(_or_batch, batch_format="pandas", batch_size=None)
    )
    out = np.zeros(nbytes, dtype=np.uint8)
    for row in combined.iter_rows():
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out


def bloom_contains(
    bitmap: np.ndarray, keys, *, num_hashes: int = 4
) -> np.ndarray:
    """Vectorized membership mask (true = POSSIBLY present)."""
    num_bits = len(bitmap) * 8
    pos = _positions(keys, num_bits, num_hashes)
    hits = ((bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).astype(bool)
    return hits.reshape(num_hashes, -1).all(axis=0)


def bloom_prefilter(
    ds: ray.data.Dataset,
    on: list[str],
    bitmap_ref,
    *,
    num_hashes: int = 4,
) -> ray.data.Dataset:
    """Drop rows whose key is DEFINITELY not in the broadcast bitmap
    (``ray.put(build_bloom(...))``). Map-side only — no shuffle."""

    def _f(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        bm = ray.get(bitmap_ref) if isinstance(bitmap_ref, ray.ObjectRef) else bitmap_ref
        return b[bloom_contains(bm, _key_series(b, on), num_hashes=num_hashes)]

    return ds.map_batches(_f, batch_format="pandas")


def semi_join_bloom(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    *,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """EXACT left-semi join with a Bloom runtime filter: build the
    bitmap from ``right``, prefilter ``left`` map-side (no shuffle for
    the dropped rows), then the exact bucketed ``left_semi`` join on
    the survivors removes Bloom false positives."""
    from .relational import cogroup_join

    bm_ref = ray.put(build_bloom(right, on, num_bits=num_bits, num_hashes=num_hashes))
    pre = bloom_prefilter(left, on, bm_ref, num_hashes=num_hashes)
    return cogroup_join(
        pre,
        right,
        on=on,
        how="left_semi",
        left_schema=left_schema if left_schema is not None else left.schema(),
        right_schema=right_schema if right_schema is not None else right.schema(),
    )
