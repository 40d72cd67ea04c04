"""Distributed per-column data profile: the data-quality summary every
ingest stage wants before a 100-TB run (null rates, exact distinct
cardinality, min/max) — one row per profiled column.

The reference's analogue is `health_check_full.py` (driver-side JSON
integrity scans over the whole corpus); this is the distributed,
columnar restatement.

Two passes, both scale-safe:

1. **Scalar stats** (count / nulls / min / max): map-side per-block
   partials — ONE tiny row per (block, column) — reduced on the
   driver (bounded by ``n_blocks x n_cols``). No shuffle at all.
2. **Exact distinct counts**: per-block distinct ``(column, value)``
   pairs (map-side dedup prunes repeats before the exchange), one
   bucketed shuffle keyed on the pair, per-bucket count per column,
   then a driver sum of ``<= n_buckets x n_cols`` partial rows.

Values travel RENDERED AS STRINGS in the distinct pass (`str(int)` /
the string itself), matching the DuckDB oracle's
``count(DISTINCT col)`` (rendering is injective for ints and strings;
floats must be integerized by the caller first). min/max compare in
the NATIVE type (integer order for ints), rendered to strings only in
the output row — mirror with ``CAST(min(col) AS VARCHAR)`` in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce

PROFILE_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("n_rows", pa.int64()),
        ("n_null", pa.int64()),
        ("n_distinct", pa.int64()),
        ("min_v", pa.string()),
        ("max_v", pa.string()),
    ]
)

_PAIR_SCHEMA = pa.schema([("column", pa.string()), ("value", pa.string())])
_DCOUNT_SCHEMA = pa.schema([("column", pa.string()), ("n_distinct", pa.int64())])


def _render(s: pd.Series) -> pd.Series:
    """Injective string rendering for ints and strings (the profile
    contract); NaN/None stay null."""
    mask = s.notna()
    out = pd.Series(np.full(len(s), None, dtype=object), index=s.index)
    out[mask] = s[mask].astype(str)
    return out


def profile_table(
    ds: ray.data.Dataset,
    columns: list[str],
    *,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """One ``(column, n_rows, n_null, n_distinct, min_v, max_v)`` row
    per profiled column. ``n_distinct`` excludes nulls; ``min_v`` /
    ``max_v`` are null-skipping and rendered as strings.
    """
    slim = ds.select_columns(columns)

    # --- pass 1: scalar stats, no shuffle ----------------------------
    def _partial_stats(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:
            s = b[c] if c in b.columns else pd.Series([], dtype=object)
            nn = s.notna()
            sub = s[nn]
            rows.append(
                {
                    "column": c,
                    "n_rows": len(s),
                    "n_null": int((~nn).sum()),
                    "has_vals": len(sub) > 0,
                    "min_n": sub.min() if len(sub) else None,
                    "max_n": sub.max() if len(sub) else None,
                }
            )
        return pd.DataFrame(rows)

    parts = slim.map_batches(
        _partial_stats, batch_format="pandas", batch_size=None
    ).to_pandas()  # bounded: n_blocks x n_cols tiny rows

    # --- pass 2: exact distinct via map-side-deduped pair shuffle ----
    def _pairs(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in columns:
            if c not in b.columns:
                continue
            vals = _render(b[c]).dropna().drop_duplicates()
            if len(vals):
                frames.append(pd.DataFrame({"column": c, "value": vals.to_numpy(object)}))
        if not frames:
            return pd.DataFrame(
                {"column": pd.Series([], dtype=object), "value": pd.Series([], dtype=object)}
            )
        return pd.concat(frames, ignore_index=True)

    def _count_per_col(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        vc = d["column"].value_counts(sort=False)
        return pd.DataFrame(
            {"column": vc.index.to_numpy(object), "n_distinct": vc.to_numpy(np.int64)}
        )

    dparts = bucketed_reduce(
        slim,
        ["column", "value"],
        _count_per_col,
        _DCOUNT_SCHEMA,
        combiner=_pairs,
        num_buckets=num_buckets,
    ).to_pandas()  # bounded: n_buckets x n_cols
    if "column" not in dparts.columns:  # all-empty result loses schema
        dparts = pd.DataFrame({"column": [], "n_distinct": []})
    if "column" not in parts.columns:
        parts = pd.DataFrame(
            {"column": [], "n_rows": [], "n_null": [], "has_vals": [],
             "min_n": [], "max_n": []}
        )

    # --- assemble on the driver (n_cols rows) -------------------------
    out_rows = []
    for c in columns:
        p = parts[parts["column"] == c]
        withv = p[p["has_vals"]]
        d = dparts[dparts["column"] == c]
        out_rows.append(
            {
                "column": c,
                "n_rows": int(p["n_rows"].sum()),
                "n_null": int(p["n_null"].sum()),
                "n_distinct": int(d["n_distinct"].sum()) if len(d) else 0,
                "min_v": str(withv["min_n"].min()) if len(withv) else None,
                "max_v": str(withv["max_n"].max()) if len(withv) else None,
            }
        )
    tbl = pa.Table.from_pandas(pd.DataFrame(out_rows), schema=PROFILE_SCHEMA)
    return ray.data.from_arrow(tbl)


FD_SCHEMA = pa.schema(
    [
        ("lhs", pa.string()),
        ("rhs", pa.string()),
        ("n_keys", pa.int64()),
        ("n_violating", pa.int64()),
    ]
)


def fd_audit(
    ds: ray.data.Dataset,
    pairs: list[tuple[str, str]],
    *,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Functional-dependency audit: for each candidate ``lhs -> rhs``
    pair, count distinct lhs keys and the keys VIOLATING the
    dependency (more than one distinct rhs value) — the schema-level
    integrity check (is order->status single-valued? does part
    determine supplier?) run before trusting a join key at scale.

    Per pair: map-side distinct ``(lhs, rhs)`` (repeats die before the
    exchange), one lhs-keyed bucketed shuffle, per-bucket nunique —
    each lhs whole in one bucket, so bucket partial counts are
    additive; the residue is ``<= n_buckets`` rows per pair. Values
    travel rendered as strings (injective for the int/string columns
    this audits; same contract as :func:`profile_table`).

    SQL twin: ``GROUP BY lhs HAVING count(DISTINCT rhs) > 1`` counts,
    one UNION ALL branch per pair."""
    part_schema = pa.schema([("n_keys", pa.int64()), ("n_violating", pa.int64())])
    out_rows = []
    for lhs, rhs in pairs:

        def _distinct(b: pd.DataFrame, lhs=lhs, rhs=rhs) -> pd.DataFrame:
            if len(b) == 0 or lhs not in b.columns:
                return pd.DataFrame(
                    {"k": pd.Series([], dtype="object"), "v": pd.Series([], dtype="object")}
                )
            return pd.DataFrame(
                {"k": _render(b[lhs]), "v": _render(b[rhs])}
            ).drop_duplicates()

        def _count(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop_duplicates()
            per_key = g.groupby("k", sort=False)["v"].nunique()
            return pd.DataFrame(
                {
                    "n_keys": [int(len(per_key))],
                    "n_violating": [int((per_key > 1).sum())],
                }
            )

        res = bucketed_reduce(
            ds.select_columns([lhs, rhs]).map_batches(
                _distinct, batch_format="pandas", batch_size=None
            ),
            ["k"],
            _count,
            part_schema,
            num_buckets=num_buckets,
        ).to_pandas()  # bounded: <= n_buckets rows
        out_rows.append(
            {
                "lhs": lhs,
                "rhs": rhs,
                "n_keys": int(res["n_keys"].sum()) if len(res) else 0,
                "n_violating": int(res["n_violating"].sum()) if len(res) else 0,
            }
        )
    tbl = pa.Table.from_pandas(pd.DataFrame(out_rows), schema=FD_SCHEMA)
    return ray.data.from_arrow(tbl)


SKEW_SCHEMA = pa.schema(
    [
        ("key_col", pa.string()),
        ("n_rows", pa.int64()),
        ("n_keys", pa.int64()),
        ("max_cnt", pa.int64()),
        ("p99_cnt", pa.int64()),
        ("top1_share_milli", pa.int64()),
    ]
)


def skew_profile(
    ds: ray.data.Dataset,
    key_cols: list[str],
    *,
    driver_max_distinct_counts: int = 1_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Key-skew report for shuffle planning: before hash-partitioning
    100 TB on a key, ask whether one key owns the exchange. Per key
    column: row count, distinct keys, the hottest key's count, the
    p99 per-key count (discrete, ceil definition — quantile_disc
    exact) and the hottest key's share in exact thousandths.

    Two bucketed exchanges per column, neither over raw rows: (1)
    per-key counts (map-side value_counts combiner), (2) the
    COUNT-OF-COUNTS histogram keyed on the count value — its residue
    is the distinct-count-value domain (heavily log-concentrated in
    real corpora; gated, trips loudly). No per-key rows ever reach
    the driver."""
    cc_schema = pa.schema([("c", pa.int64()), ("n_keys", pa.int64())])
    out_rows = []
    for col in key_cols:

        def _vc(b: pd.DataFrame, col=col) -> pd.DataFrame:
            if len(b) == 0 or col not in b.columns:
                return pd.DataFrame(
                    {"k": pd.Series([], dtype="object"), "c": pd.Series([], dtype="int64")}
                )
            vc = _render(b[col]).value_counts()
            return pd.DataFrame(
                {"k": vc.index.to_numpy(object), "c": vc.to_numpy(np.int64)}
            )

        def _sum_keys(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("k", sort=False, as_index=False)["c"].sum()

        key_counts = bucketed_reduce(
            ds.select_columns([col]),
            ["k"],
            _sum_keys,
            pa.schema([("k", pa.string()), ("c", pa.int64())]),
            combiner=_vc,
            num_buckets=num_buckets,
        )

        def _cc(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0 or "c" not in b.columns:  # empty blocks lose columns
                return pd.DataFrame(
                    {"c": pd.Series([], dtype="int64"),
                     "n_keys": pd.Series([], dtype="int64")}
                )
            vc = b["c"].value_counts()
            return pd.DataFrame(
                {"c": vc.index.to_numpy(np.int64), "n_keys": vc.to_numpy(np.int64)}
            )

        cc = bucketed_reduce(
            key_counts,
            ["c"],
            lambda g: g.groupby("c", sort=False, as_index=False)["n_keys"].sum(),
            cc_schema,
            combiner=_cc,
            num_buckets=num_buckets,
        ).to_pandas()
        if "c" not in cc.columns:  # fully-empty result loses its schema
            cc = pd.DataFrame({"c": [], "n_keys": []})
        cc = cc.sort_values("c", kind="stable")
        if len(cc) > driver_max_distinct_counts:
            raise ValueError(
                f"skew_profile: {len(cc)} distinct count values for {col} "
                f"exceed the gate ({driver_max_distinct_counts})"
            )
        if len(cc) == 0:
            out_rows.append(
                {"key_col": col, "n_rows": 0, "n_keys": 0, "max_cnt": 0,
                 "p99_cnt": 0, "top1_share_milli": 0}
            )
            continue
        c = cc["c"].to_numpy(np.int64)
        nk = cc["n_keys"].to_numpy(np.int64)
        n_keys = int(nk.sum())
        n_rows = int((c * nk).sum())
        max_cnt = int(c[-1])
        cum = nk.cumsum()
        target = -(-99 * n_keys // 100)  # ceil(0.99 * n_keys)
        p99 = int(c[int(np.searchsorted(cum, target, side="left"))])
        out_rows.append(
            {
                "key_col": col,
                "n_rows": n_rows,
                "n_keys": n_keys,
                "max_cnt": max_cnt,
                "p99_cnt": p99,
                "top1_share_milli": max_cnt * 1000 // n_rows,
            }
        )
    return ray.data.from_arrow(
        pa.Table.from_pandas(pd.DataFrame(out_rows), schema=SKEW_SCHEMA)
    )


def categorical_gini(
    ds: ray.data.Dataset,
    key_col: str,
    cat_col: str,
    *,
    key_type: pa.DataType | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-key Gini impurity of a categorical column in exact integer
    thousandths: ``gini_milli = ((n^2 - sum_c n_c^2) * 1000) // n^2``
    (0 = one category only, ->1000 = maximally mixed) — the behavioral
    diversity / label-noise profile over users, sources or shards,
    exact where an entropy (log) variant could never hash-match SQL.

    One key-bucketed exchange: map-side ``(key, cat)`` count partials,
    reduce finishes the counts and the integer arithmetic vectorized.
    int64 bound: ``n^2 < 2^63`` -> up to ~3e9 rows per key.
    """
    if key_type is None:
        key_type = pa.int64()
    out_schema = pa.schema(
        [(key_col, key_type), ("n", pa.int64()), ("gini_milli", pa.int64())]
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby([key_col, cat_col], sort=False, as_index=False).size()
        return out.rename(columns={"size": "n"})

    def _finish(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby([key_col, cat_col], sort=False, as_index=False)["n"].sum()
        c["sq"] = c["n"].to_numpy(np.int64) ** 2
        a = c.groupby(key_col, sort=False, as_index=False).agg(
            n=("n", "sum"), s2=("sq", "sum")
        )
        nn = a["n"].to_numpy(np.int64) ** 2
        a["gini_milli"] = ((nn - a["s2"].to_numpy(np.int64)) * 1000) // nn
        return a[[key_col, "n", "gini_milli"]]

    return bucketed_reduce(
        ds.select_columns([key_col, cat_col]),
        [key_col],
        _finish,
        out_schema,
        combiner=_partial,
        num_buckets=num_buckets,
    )
