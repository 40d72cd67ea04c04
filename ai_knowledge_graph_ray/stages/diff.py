"""Keyed snapshot diff between two table versions.

The reference's incremental story is "re-run and overwrite"
(`scripts/clean_graph.py` rewrites the whole corpus JSON); a 100-TB
pipeline instead needs to DIFF two snapshot versions — detect
added / removed / changed rows by key — so downstream stages
(re-embedding, re-indexing, KG update) can process only the delta.

Plan: each side maps to ``(key cols..., md5-of-rendered-compare-cols)``
— a map-only projection that drops the wide payload before the
exchange — then ONE full-outer cogroup join on the keys classifies
every key. The md5 travels as a hex STRING, immune to the 64-bit
float-upcast hazard documented on ``cogroup_join``.

Rendering contract (shared with the DuckDB oracle): each compare
column is cast to its string form (`str(int)` / the string itself)
and joined with ``'|'`` — i.e. ``md5(concat_ws('|', CAST(c1 AS
VARCHAR), ...))`` in SQL. Restrict compare columns to integers and
strings; floats must be integerized first (their SQL rendering is not
reproducible).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce, normalize_blocks
from .relational import cogroup_join


def _row_md5(batch: pd.DataFrame, cols: list[str]) -> np.ndarray:
    if len(batch) == 0:
        return np.empty(0, dtype=object)
    rendered = batch[cols[0]].astype(str)
    for c in cols[1:]:
        rendered = rendered + "|" + batch[c].astype(str)
    return np.fromiter(
        (hashlib.md5(s.encode("utf-8")).hexdigest() for s in rendered.to_numpy()),
        dtype=object,
        count=len(batch),
    )


def _hash_side(
    ds: ray.data.Dataset, key_cols: list[str], compare_cols: list[str], out_col: str
) -> ray.data.Dataset:
    def _project(b: pd.DataFrame) -> pd.DataFrame:
        out = b[key_cols].copy()
        out[out_col] = _row_md5(b, compare_cols)
        return out

    return ds.map_batches(_project, batch_format="pandas", batch_size=None)


DIFF_CHANGE_FIELD = pa.field("change", pa.string())


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key_cols: list[str],
    compare_cols: list[str],
    *,
    key_schema: pa.Schema | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """``(key cols..., change, old_md5, new_md5)`` for every key whose
    row was added, removed, or changed between ``old`` and ``new``
    (unchanged keys are dropped). Missing-side hashes are ``''``.

    ``key_schema`` (the Arrow types of the key columns) is required
    when either side can be empty.
    """
    oh = _hash_side(old, key_cols, compare_cols, "old_md5")
    nh = _hash_side(new, key_cols, compare_cols, "new_md5")
    if key_schema is None:
        # ds.schema().names/types work for both Arrow- and pandas-backed
        # blocks (base_schema is a PandasBlockSchema namedtuple for the
        # latter, which is not iterable as fields).
        sch = old.schema()
        by_name = dict(zip(sch.names, sch.types))
        key_schema = pa.schema([pa.field(c, by_name[c]) for c in key_cols])
    out_schema = pa.schema(
        list(key_schema)
        + [DIFF_CHANGE_FIELD, pa.field("old_md5", pa.string()), pa.field("new_md5", pa.string())]
    )
    l_schema = pa.schema(list(key_schema) + [pa.field("old_md5", pa.string())])
    r_schema = pa.schema(list(key_schema) + [pa.field("new_md5", pa.string())])
    j = cogroup_join(
        oh,
        nh,
        key_cols,
        how="full_outer",
        num_buckets=num_buckets,
        left_schema=l_schema,
        right_schema=r_schema,
    )

    def _classify(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({f.name: pd.Series([], dtype=object) for f in out_schema})
        o = b["old_md5"].fillna("")
        n = b["new_md5"].fillna("")
        change = np.where(
            o == "", "added", np.where(n == "", "removed", "changed")
        )
        out = b[key_cols].copy()
        out["change"] = change
        out["old_md5"] = o
        out["new_md5"] = n
        return out[(o != n).to_numpy()]

    return normalize_blocks(
        j.map_batches(_classify, batch_format="pandas", batch_size=None), out_schema
    )


def pit_lookup(
    probes: ray.data.Dataset,
    history: ray.data.Dataset,
    *,
    key_col: str = "key",
    time_col: str = "t",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    probe_schema: pa.Schema | None = None,
    history_schema: pa.Schema | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Point-in-time lookup: join each probe ``(key, t)`` to the
    history row whose validity interval contains ``t`` (SCD-2
    dimension lookup at event time — the leakage-safe way to attach
    dimension attributes to facts). Intervals per key are disjoint by
    construction (:func:`scd2_history`), so this is ONE keyed
    partitioned join + a vectorized containment filter — no interval
    replication, no range bucketing (contrast
    :func:`..rangejoin.interval_join`, which handles un-keyed
    interval containment). Probes in deletion gaps emit nothing.
    """
    j = cogroup_join(
        probes, history, [key_col],
        left_schema=probe_schema, right_schema=history_schema,
        num_buckets=num_buckets,
    )

    def _contained(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or time_col not in b.columns:
            return b
        t = b[time_col].to_numpy(np.int64)
        keep = (b[from_col].to_numpy(np.int64) <= t) & (
            t <= b[to_col].to_numpy(np.int64)
        )
        return b[keep]

    return j.map_batches(_contained, batch_format="pandas", batch_size=None)


SCD2_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),
        ("val", pa.string()),
        ("valid_from", pa.int64()),
        ("valid_to", pa.int64()),
    ]
)


def scd2_history(
    snapshots: ray.data.Dataset,
    *,
    key_col: str = "key",
    snap_col: str = "snap",
    val_col: str = "val",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Slowly-changing-dimension (type 2) history from a stack of keyed
    snapshots ``(key, snap, val)``: one validity interval per run of
    consecutive snapshots where the key held the same value —
    ``(key, val, valid_from, valid_to)`` with snapshot ids as the
    interval bounds (inclusive). A key absent from an intermediate
    snapshot BREAKS the run (deletion then re-insert opens a new
    interval), detected by a snapshot-id gap.

    The gaps-and-islands window (lag + running change-count) has no
    native Ray op; it is one key-bucketed shuffle with a vectorized
    in-bucket sort + shift + cumsum — the same shape as
    :func:`~.sessions.sessionize`. SQL twin:
    ``lag() OVER (PARTITION BY key ORDER BY snap)`` change flags and a
    window sum."""

    def _islands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, snap_col], kind="stable")
        k = g[key_col].to_numpy(np.int64)
        s = g[snap_col].to_numpy(np.int64)
        v = g[val_col].to_numpy(object)
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        chg = np.empty(len(g), dtype=bool)
        chg[0] = True
        chg[1:] = new_key[1:] | (v[1:] != v[:-1]) | (s[1:] - s[:-1] > 1)
        grp = np.cumsum(chg)
        df = pd.DataFrame({"key": k, "val": v, "snap": s, "grp": grp})
        agg = df.groupby("grp", sort=False).agg(
            key=("key", "first"),
            val=("val", "first"),
            valid_from=("snap", "min"),
            valid_to=("snap", "max"),
        )
        return agg.reset_index(drop=True)

    return bucketed_reduce(
        snapshots.select_columns([key_col, snap_col, val_col]),
        [key_col],
        _islands,
        SCD2_SCHEMA,
        num_buckets=num_buckets,
    )
