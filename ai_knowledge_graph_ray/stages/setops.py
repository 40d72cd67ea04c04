"""Distinct set operations and keyed upsert compaction.

SQL's ``INTERSECT`` / ``EXCEPT`` (both DISTINCT by definition) and
the lakehouse "merge latest version per key" compaction, each as ONE
bucketed shuffle over the repo's standard machinery:

- tag side (0/1 int column, map-side distinct combiner) -> bucket on
  the key columns -> per-bucket vectorized membership test. Rows of a
  key land in one bucket, so the per-bucket answer is the global one.
- ``upsert_latest`` is last-wins ``drop_duplicates(keep="last")`` per
  key after an in-bucket stable sort on the version column — the
  distributed ``MERGE INTO``-style compaction of an append log
  (``state/checkpoint.py`` stores such logs; this operator compacts
  one without materializing it on the driver).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce


def _tagged_union(
    left: ray.data.Dataset, right: ray.data.Dataset, cols: list[str]
) -> ray.data.Dataset:
    def _tag(side: int):
        def _f(b: pd.DataFrame) -> pd.DataFrame:
            out = b[cols].drop_duplicates().copy()
            out["__side"] = np.int64(side)
            return out

        return _f

    return left.map_batches(
        _tag(0), batch_format="pandas", batch_size=None
    ).union(right.map_batches(_tag(1), batch_format="pandas", batch_size=None))


def _setop(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cols: list[str],
    schema: pa.Schema,
    want_in_right: bool,
) -> ray.data.Dataset:
    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        sides = g.groupby(cols, sort=False)["__side"].agg(["min", "max"])
        if want_in_right:
            keys = sides[(sides["min"] == 0) & (sides["max"] == 1)]
        else:
            keys = sides[sides["max"] == 0]
        return keys.reset_index()[cols]

    return bucketed_reduce(
        _tagged_union(left, right, cols),
        cols,
        _reduce,
        schema,
        combiner=lambda b: b.drop_duplicates(),
    )


def intersect_distinct(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cols: list[str],
    schema: pa.Schema,
) -> ray.data.Dataset:
    """SQL ``INTERSECT``: distinct ``cols`` rows present in BOTH sides."""
    return _setop(left, right, cols, schema, want_in_right=True)


def except_distinct(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cols: list[str],
    schema: pa.Schema,
) -> ray.data.Dataset:
    """SQL ``EXCEPT``: distinct ``cols`` rows of left absent from right."""
    return _setop(left, right, cols, schema, want_in_right=False)


def upsert_latest(
    ds: ray.data.Dataset,
    key_cols: list[str],
    version_col: str,
    schema: pa.Schema,
    *,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """One row per key: the row with the greatest ``version_col``
    (ties broken toward the later row in ``(version, stable input
    order)`` — pass a strictly ordered version column for full
    determinism, e.g. an event id or commit sequence). The map-side
    combiner compacts each block first, so a hot key crosses the
    shuffle once per block, not once per update."""

    def _latest(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(version_col, kind="stable").drop_duplicates(
            key_cols, keep="last"
        )

    return bucketed_reduce(
        ds,
        key_cols,
        lambda g: _latest(g)[list(schema.names)],
        schema,
        combiner=_latest,
        num_buckets=num_buckets,
    )


def _bag_op(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cols: list[str],
    schema: pa.Schema,
    intersect: bool,
) -> ray.data.Dataset:
    """Shared core of the BAG-semantics set ops: per-key multiplicity
    partials (m0, m1) from each side collapse map-side, one bucketed
    sum, then each key re-emits ``min(m0, m1)`` (INTERSECT ALL) or
    ``max(0, m0 - m1)`` (EXCEPT ALL) copies via np.repeat."""

    def _tag(side: int):
        def _f(b: pd.DataFrame) -> pd.DataFrame:
            g = b[cols].groupby(cols, sort=False, dropna=False).size()
            out = g.reset_index(name="__m")
            out["__m0"] = out["__m"] if side == 0 else 0
            out["__m1"] = out["__m"] if side == 1 else 0
            return out.drop(columns="__m").astype({"__m0": "int64", "__m1": "int64"})

        return _f

    tagged = left.map_batches(
        _tag(0), batch_format="pandas", batch_size=None
    ).union(right.map_batches(_tag(1), batch_format="pandas", batch_size=None))

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        return b.groupby(cols, sort=False, as_index=False, dropna=False)[
            ["__m0", "__m1"]
        ].sum()

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = _comb(g)
        if intersect:
            k = np.minimum(agg["__m0"].to_numpy(), agg["__m1"].to_numpy())
        else:
            k = np.maximum(agg["__m0"].to_numpy() - agg["__m1"].to_numpy(), 0)
        keep = k > 0
        agg, k = agg[keep], k[keep]
        idx = np.repeat(np.arange(len(agg)), k)
        return agg.iloc[idx][cols].reset_index(drop=True)

    return bucketed_reduce(tagged, cols, _reduce, schema, combiner=_comb)


def intersect_all(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cols: list[str],
    schema: pa.Schema,
) -> ray.data.Dataset:
    """SQL ``INTERSECT ALL``: each row appears min(multiplicity-left,
    multiplicity-right) times."""
    return _bag_op(left, right, cols, schema, intersect=True)


def except_all(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cols: list[str],
    schema: pa.Schema,
) -> ray.data.Dataset:
    """SQL ``EXCEPT ALL``: each left row survives max(0, m_left -
    m_right) times."""
    return _bag_op(left, right, cols, schema, intersect=False)
