"""Hierarchical (ROLLUP) aggregation and grouped mode — grouped
aggregates beyond plain sums.

``rollup_aggregate`` computes the full prefix hierarchy
``(k1..kn), (k1..kn-1), ..., ()`` the way a distributed engine should:
ONE shuffle over raw rows (the finest level, with a map-side
combiner), then each coarser level re-reduces the PREVIOUS level's
already-tiny residue — never rescanning the input. Rolled-up key
positions carry an explicit sentinel (default ``'(all)'``) instead of
NULL so downstream hashing/joins stay dtype-stable.

``grouped_mode`` is the per-group most-frequent value with a total
deterministic tie-break (higher count, then lexicographically
smallest value): two bucketed exchanges — ``(group, value)`` counts
with a map-side ``value_counts`` combiner, then a per-group argmax
over the distinct-pair residue.

No counterpart in the reference (its aggregates are driver-side
Counters, e.g. ``visualization.py`` predicate histograms); SQL twins:
``GROUP BY ROLLUP`` / ``row_number() OVER (ORDER BY cnt DESC, val)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce

ALL_SENTINEL = "(all)"


def rollup_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    *,
    out_name: str = "total",
    sentinel: str = ALL_SENTINEL,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Sum ``value_col`` (int64) grouped by every prefix of ``keys``
    plus the grand total. Output: ``keys`` (strings; rolled-up
    positions = ``sentinel``), ``lvl`` (number of live keys) and
    ``out_name``.

    Key columns are string-rendered so the sentinel fill never mixes
    dtypes within a column.
    """
    out_schema = pa.schema(
        [(k, pa.string()) for k in keys]
        + [("lvl", pa.int64()), (out_name, pa.int64())]
    )

    def _level_schema(cols: list[str]) -> pa.Schema:
        return pa.schema([(k, pa.string()) for k in cols] + [(out_name, pa.int64())])

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {**{k: pd.Series([], dtype="object") for k in keys},
                 out_name: pd.Series([], dtype="int64")}
            )
        g = b.copy()
        for k in keys:
            g[k] = g[k].astype(str)
        out = g.groupby(keys, sort=False, as_index=False)[value_col].sum()
        return out.rename(columns={value_col: out_name})

    def _sum_level(cols: list[str]):
        def _reduce(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(cols, sort=False, as_index=False)[out_name].sum()

        return _reduce

    finest = bucketed_reduce(
        ds.select_columns(keys + [value_col]),
        keys,
        _sum_level(keys),
        _level_schema(keys),
        combiner=_comb,
        num_buckets=num_buckets,
    ).materialize()  # each coarser level re-reduces this residue

    levels: list[ray.data.Dataset] = []

    def _finish(cols: list[str]):
        lvl = len(cols)

        def _fill(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(index=b.index if len(b) else None)
            for k in keys:
                if k in cols and k in b.columns:
                    out[k] = b[k]
                else:
                    out[k] = sentinel
            out["lvl"] = np.int64(lvl)
            out[out_name] = (
                b[out_name] if out_name in b.columns else pd.Series([], dtype="int64")
            )
            return out if len(b) else out.iloc[0:0]

        return _fill

    prev = finest
    levels.append(
        finest.map_batches(_finish(keys), batch_format="pandas", batch_size=None)
    )
    for n in range(len(keys) - 1, 0, -1):
        cols = keys[:n]
        lv = bucketed_reduce(
            prev.select_columns(cols + [out_name]),
            cols,
            _sum_level(cols),
            _level_schema(cols),
            num_buckets=num_buckets,
        ).materialize()
        levels.append(
            lv.map_batches(_finish(cols), batch_format="pandas", batch_size=None)
        )
        prev = lv

    # grand total: driver sum of the coarsest level's tiny residue
    top = prev.to_pandas()
    total = int(top[out_name].sum()) if out_name in top.columns else 0
    grand = pa.Table.from_pandas(
        pd.DataFrame([{**{k: sentinel for k in keys}, "lvl": 0, out_name: total}]),
        schema=out_schema,
    )
    levels.append(ray.data.from_arrow(grand))

    from .infer import normalize_blocks

    return normalize_blocks(levels[0].union(*levels[1:]), out_schema)


def cube_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    *,
    out_name: str = "total",
    sentinel: str = ALL_SENTINEL,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Sum ``value_col`` grouped by EVERY subset of ``keys`` (the full
    ``GROUP BY CUBE`` lattice, ``2^n`` grouping sets). Same output
    contract as :func:`rollup_aggregate` (string keys, rolled-up
    positions = ``sentinel``, ``lvl`` = number of live keys).

    Shuffle plan: exactly ONE pass over raw rows builds the finest
    level (map-side combiner); every other grouping set re-reduces
    that already-tiny residue — ``2^n - 2`` cheap residue exchanges,
    never a rescan. The empty grouping set (grand total) is a driver
    sum over a single-key level's residue."""
    if not keys:
        raise ValueError("cube_aggregate needs at least one key")
    out_schema = pa.schema(
        [(k, pa.string()) for k in keys]
        + [("lvl", pa.int64()), (out_name, pa.int64())]
    )

    def _level_schema(cols: list[str]) -> pa.Schema:
        return pa.schema([(k, pa.string()) for k in cols] + [(out_name, pa.int64())])

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {**{k: pd.Series([], dtype="object") for k in keys},
                 out_name: pd.Series([], dtype="int64")}
            )
        g = b.copy()
        for k in keys:
            g[k] = g[k].astype(str)
        out = g.groupby(keys, sort=False, as_index=False)[value_col].sum()
        return out.rename(columns={value_col: out_name})

    def _sum_level(cols: list[str]):
        def _reduce(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(cols, sort=False, as_index=False)[out_name].sum()

        return _reduce

    def _finish(cols: list[str]):
        lvl = len(cols)

        def _fill(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(index=b.index if len(b) else None)
            for k in keys:
                if k in cols and k in b.columns:
                    out[k] = b[k]
                else:
                    out[k] = sentinel
            out["lvl"] = np.int64(lvl)
            out[out_name] = (
                b[out_name] if out_name in b.columns else pd.Series([], dtype="int64")
            )
            return out if len(b) else out.iloc[0:0]

        return _fill

    finest = bucketed_reduce(
        ds.select_columns(keys + [value_col]),
        keys,
        _sum_level(keys),
        _level_schema(keys),
        combiner=_comb,
        num_buckets=num_buckets,
    ).materialize()

    levels: list[ray.data.Dataset] = [
        finest.map_batches(_finish(keys), batch_format="pandas", batch_size=None)
    ]

    from itertools import combinations

    grand_source: pd.DataFrame | None = None
    for size in range(len(keys) - 1, 0, -1):
        for cols_t in combinations(keys, size):
            cols = list(cols_t)
            lv = bucketed_reduce(
                finest.select_columns(cols + [out_name]),
                cols,
                _sum_level(cols),
                _level_schema(cols),
                num_buckets=num_buckets,
            ).materialize()
            levels.append(
                lv.map_batches(_finish(cols), batch_format="pandas", batch_size=None)
            )
            if size == 1 and grand_source is None:
                grand_source = lv.to_pandas()

    if grand_source is None:  # single-key cube: finest IS the single level
        grand_source = finest.to_pandas()
    total = (
        int(grand_source[out_name].sum()) if out_name in grand_source.columns else 0
    )
    grand = pa.Table.from_pandas(
        pd.DataFrame([{**{k: sentinel for k in keys}, "lvl": 0, out_name: total}]),
        schema=out_schema,
    )
    levels.append(ray.data.from_arrow(grand))

    from .infer import normalize_blocks

    return normalize_blocks(levels[0].union(*levels[1:]), out_schema)


MODE_SUFFIX_CNT = "cnt"


def grouped_mode(
    ds: ray.data.Dataset,
    group_cols: list[str],
    value_col: str,
    *,
    out_schema: pa.Schema | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Most frequent ``value_col`` per group with a deterministic
    total tie-break (count desc, then value asc). Output:
    ``group_cols + [value_col, "cnt"]``. Nulls in ``value_col`` are
    ignored; groups whose values are all null are dropped. Pass
    ``out_schema`` to pin key dtypes (default: all strings)."""
    if out_schema is None:
        out_schema = pa.schema(
            [(c, pa.string()) for c in group_cols]
            + [(value_col, pa.string()), ("cnt", pa.int64())]
        )
    pair_schema = out_schema

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {**{c: pd.Series([], dtype="object") for c in group_cols},
                 value_col: pd.Series([], dtype="object"),
                 "cnt": pd.Series([], dtype="int64")}
            )
        g = b.dropna(subset=[value_col])
        out = (
            g.groupby(group_cols + [value_col], sort=False, dropna=False)
            .size()
            .reset_index(name="cnt")
        )
        return out

    counts = bucketed_reduce(
        ds.select_columns(group_cols + [value_col]),
        group_cols + [value_col],
        lambda g: g.groupby(
            group_cols + [value_col], sort=False, as_index=False, dropna=False
        )["cnt"].sum(),
        pair_schema,
        combiner=_comb,
        num_buckets=num_buckets,
    )

    def _argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cnt", value_col], ascending=[False, True], kind="stable"
        )
        return g.drop_duplicates(subset=group_cols, keep="first")

    return bucketed_reduce(
        counts, group_cols, _argmax, out_schema, num_buckets=num_buckets
    )
