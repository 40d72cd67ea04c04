"""Distributed interval-containment (range) join.

Ray Data has no non-equi join; the standard distributed plan is a
GRID join: pick a bucket width, replicate each interval onto every
grid cell it overlaps, key points by their own cell, equi-join on the
cell id, then apply the exact containment predicate inside the
co-group. Each (point, interval) pair meets in EXACTLY ONE cell (the
point's), so no post-join dedup is needed.

Scale properties:

- One exchange (the cell-keyed cogroup join); replication factor is
  ``ceil(interval_len / bucket_width) + 1`` copies per interval —
  choose ``bucket_width`` near the typical interval length so the
  factor stays ~2.
- Skewed cells (a hot time window) are bounded by the cell width, and
  the within-cell work is a vectorized ``pandas.merge`` cross product
  filtered by the predicate — no per-pair Python.
- Keys are int64 (epoch-us or any integer domain) — far below the
  2^53 float-upcast hazard documented on ``cogroup_join``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import normalize_blocks
from .relational import cogroup_join


def _with_point_cell(batch: pd.DataFrame, point_col: str, width: int) -> pd.DataFrame:
    if len(batch) == 0:
        b = batch.copy()
        b["__cell"] = pd.Series([], dtype="int64")
        return b
    b = batch.copy()
    b["__cell"] = b[point_col].to_numpy(np.int64) // width
    return b


def _replicate_intervals(
    batch: pd.DataFrame, start_col: str, end_col: str, width: int
) -> pd.DataFrame:
    """One output row per (interval, overlapped grid cell).

    Intervals are half-open ``[start, end)``; empty/negative intervals
    (end <= start) are dropped.
    """
    if len(batch) == 0:
        b = batch.copy()
        b["__cell"] = pd.Series([], dtype="int64")
        return b
    s = batch[start_col].to_numpy(np.int64)
    e = batch[end_col].to_numpy(np.int64)
    keep = e > s
    batch = batch[keep]
    s, e = s[keep], e[keep]
    first = s // width
    last = (e - 1) // width
    n = (last - first + 1).astype(np.int64)
    rep = batch.iloc[np.repeat(np.arange(len(batch)), n)].copy()
    # cell = first[i] + (0..n[i]-1), laid out flat
    offs = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(n) - n, n
    )
    rep["__cell"] = np.repeat(first, n) + offs
    return rep


def interval_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    out_schema: pa.Schema,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Inner join: every (point row, interval row) pair with
    ``start <= point < end``. Non-key columns of the two sides must be
    disjoint; all of ``point_col``/``start_col``/``end_col`` must be
    int64 (convert timestamps to epoch-us first). ``out_schema`` is
    the joined row schema (point columns + interval columns).
    """
    p = points.map_batches(
        lambda b: _with_point_cell(b, point_col, bucket_width),
        batch_format="pandas",
        batch_size=None,
    )
    iv = intervals.map_batches(
        lambda b: _replicate_intervals(b, start_col, end_col, bucket_width),
        batch_format="pandas",
        batch_size=None,
    )
    joined = cogroup_join(
        p,
        iv,
        ["__cell"],
        how="inner",
        num_buckets=num_buckets,
    )

    def _filter_contained(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        pv = b[point_col].to_numpy(np.int64)
        sv = b[start_col].to_numpy(np.int64)
        ev = b[end_col].to_numpy(np.int64)
        out = b[(pv >= sv) & (pv < ev)]
        return out.drop(columns=["__cell"], errors="ignore")

    out_cols = [f.name for f in out_schema]
    return normalize_blocks(
        joined.map_batches(
            lambda b: _filter_contained(b)[out_cols]
            if len(b)
            else pd.DataFrame({c: pd.Series([], dtype=object) for c in out_cols}),
            batch_format="pandas",
            batch_size=None,
        ),
        out_schema,
    )
