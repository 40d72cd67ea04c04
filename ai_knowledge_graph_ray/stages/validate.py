"""Declarative data-quality expectations over a Dataset — the gate a
curation pipeline runs before shipping a corpus shard to training
(schema drift, null floods, broken referential integrity all show up
here first, not three stages downstream).

A check list compiles into at most three exchange families, none of
which ever moves raw rows to the driver:

- **row-local checks** (``not_null``, ``range``, ``in_set``,
  ``regex``) — ONE shared pass over the input: each batch emits a
  per-check partial ``(check_id, n_rows, n_violating)``; a tiny
  keyed sum folds the partials (residue = one row per check).
- **``unique``** — distinct-key count via a key-bucketed reduce
  (map-side ``drop_duplicates`` combiner; per-bucket distinct counts
  sum exactly because buckets partition the key space). Violations =
  rows − distinct keys.
- **``fk``** — child side reduced to ``(value, multiplicity)``,
  parent side reduced to distinct values, then one partitioned
  anti-join; violations = summed multiplicity of orphans. Joins move
  O(distinct values), never O(rows).

No counterpart in the reference (its pipeline trusts its own
extractor); this is the "expectations" shape every large-scale
pipeline bolts on. SQL twin per check kind in
``pipelines/queries.py:orders_expectations``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce, normalize_blocks
from .relational import cogroup_join

CHECK_SCHEMA = pa.schema(
    [
        ("check_id", pa.string()),
        ("kind", pa.string()),
        ("n_rows", pa.int64()),
        ("n_violating", pa.int64()),
        ("ok", pa.bool_()),
    ]
)

_PARTIAL_SCHEMA = pa.schema(
    [
        ("check_id", pa.string()),
        ("n_rows", pa.int64()),
        ("n_violating", pa.int64()),
    ]
)

_ROW_LOCAL = ("not_null", "range", "in_set", "regex")


def _violations(check: dict, b: pd.DataFrame) -> int:
    col = b[check["col"]]
    kind = check["kind"]
    if kind == "not_null":
        return int(col.isna().sum())
    if kind == "range":
        v = pd.to_numeric(col, errors="coerce")
        bad = ((v < check["lo"]) | (v > check["hi"])) & col.notna()
        return int(bad.sum())
    if kind == "in_set":
        return int((~col.isin(check["values"]) & col.notna()).sum())
    if kind == "regex":
        pat = check["_compiled"]
        s = col.dropna().astype(str)
        if len(s) == 0:
            return 0
        matched = s.str.match(pat)
        return int((~matched).sum())
    raise ValueError(f"unknown row-local check kind: {kind}")


def _sum_partials(ds: ray.data.Dataset, num_buckets: int | None) -> pd.DataFrame:
    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("check_id", sort=False, as_index=False).sum()

    out = bucketed_reduce(
        ds, ["check_id"], _sum, _PARTIAL_SCHEMA, num_buckets=num_buckets
    ).to_pandas()
    if "check_id" not in out.columns:  # fully-empty pipelines lose schema
        out = pd.DataFrame({"check_id": [], "n_rows": [], "n_violating": []})
    return out


def expectations_report(
    ds: ray.data.Dataset,
    checks: list[dict],
    *,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Evaluate ``checks`` against ``ds``; returns one row per check:
    ``(check_id, kind, n_rows, n_violating, ok)``.

    Check shapes (dicts)::

        {"id", "kind": "not_null", "col"}
        {"id", "kind": "range",    "col", "lo", "hi"}   # nulls pass
        {"id", "kind": "in_set",   "col", "values"}     # nulls pass
        {"id", "kind": "regex",    "col", "pattern"}    # full-match at
                                                        # start (re.match)
        {"id", "kind": "unique",   "cols": [...]}
        {"id", "kind": "fk", "col", "ref": Dataset, "ref_col"}
    """
    row_local = [dict(c) for c in checks if c["kind"] in _ROW_LOCAL]
    for c in row_local:
        if c["kind"] == "regex":
            c["_compiled"] = re.compile(c["pattern"])

    results: list[pd.DataFrame] = []

    if row_local:
        needed = sorted({c["col"] for c in row_local})

        def _partials(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0 or any(col not in b.columns for col in needed):
                return pd.DataFrame(
                    {
                        "check_id": pd.Series([], dtype="object"),
                        "n_rows": pd.Series([], dtype="int64"),
                        "n_violating": pd.Series([], dtype="int64"),
                    }
                )
            n = len(b)
            return pd.DataFrame(
                {
                    "check_id": [c["id"] for c in row_local],
                    "n_rows": np.full(len(row_local), n, dtype=np.int64),
                    "n_violating": np.array(
                        [_violations(c, b) for c in row_local], dtype=np.int64
                    ),
                }
            )

        partials = ds.select_columns(needed).map_batches(
            _partials, batch_format="pandas", batch_size=None
        )
        agg = _sum_partials(partials, num_buckets)
        kinds = {c["id"]: c["kind"] for c in row_local}
        agg["kind"] = agg["check_id"].map(kinds)
        # checks that saw zero batches (empty input) still report
        for c in row_local:
            if c["id"] not in set(agg["check_id"]):
                agg = pd.concat(
                    [agg, pd.DataFrame([{"check_id": c["id"], "n_rows": 0,
                                         "n_violating": 0, "kind": c["kind"]}])],
                    ignore_index=True,
                )
        results.append(agg)

    uniques = [c for c in checks if c["kind"] == "unique"]
    if uniques:
        results.append(_unique_checks(ds, uniques, num_buckets))
    for c in checks:
        if c["kind"] == "fk":
            results.append(_fk_check(ds, c, num_buckets))
        elif c["kind"] not in _ROW_LOCAL + ("unique", "fk"):
            raise ValueError(f"unknown check kind: {c['kind']}")

    if not results:
        return ray.data.from_arrow(CHECK_SCHEMA.empty_table())
    out = pd.concat(results, ignore_index=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_violating"] = out["n_violating"].astype("int64")
    out["ok"] = out["n_violating"] == 0
    out = out[["check_id", "kind", "n_rows", "n_violating", "ok"]]
    return ray.data.from_arrow(pa.Table.from_pandas(out, schema=CHECK_SCHEMA))


def _unique_checks(
    ds: ray.data.Dataset, checks: list[dict], num_buckets: int | None
) -> pd.DataFrame:
    """ALL unique checks share ONE exchange: each batch emits
    map-side-deduped ``(check_id, rendered key, multiplicity)`` rows
    for every check, partitioned on (check_id, key) — the same
    column/value-pair trick the table profiler uses for exact
    distinct counts. N checks no longer cost N shuffles."""
    part_schema = pa.schema(
        [("check_id", pa.string()), ("__key", pa.string()), ("__mult", pa.int64())]
    )
    all_cols = sorted({c for ch in checks for c in ch["cols"]})

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for ch in checks:
            cols = list(ch["cols"])
            if len(b) == 0 or any(c not in b.columns for c in cols):
                continue
            g = (
                b.groupby(cols, sort=False, dropna=False)
                .size()
                .reset_index(name="__mult")
            )
            key = g[cols[0]].astype(str)
            for c in cols[1:]:
                key = key + "\x00" + g[c].astype(str)
            frames.append(
                pd.DataFrame(
                    {"check_id": ch["id"], "__key": key, "__mult": g["__mult"]}
                )
            )
        if not frames:
            return pd.DataFrame(
                {"check_id": pd.Series([], dtype="object"),
                 "__key": pd.Series([], dtype="object"),
                 "__mult": pd.Series([], dtype="int64")}
            )
        return pd.concat(frames, ignore_index=True)

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(["check_id", "__key"], sort=False, as_index=False)[
            "__mult"
        ].sum()
        agg = gg.groupby("check_id", sort=False)["__mult"].agg(
            n_rows="sum",
            n_violating=lambda s: int((s - 1).clip(lower=0).sum()),
        )
        return agg.reset_index()

    out_schema = pa.schema(
        [("check_id", pa.string()), ("n_rows", pa.int64()),
         ("n_violating", pa.int64())]
    )
    per_bucket = bucketed_reduce(
        ds.select_columns(all_cols), ["check_id", "__key"], _reduce, out_schema,
        combiner=_comb, num_buckets=num_buckets,
    ).to_pandas()
    if "check_id" not in per_bucket.columns:
        per_bucket = pd.DataFrame({"check_id": [], "n_rows": [], "n_violating": []})
    rows = []
    for ch in checks:
        mine = per_bucket[per_bucket["check_id"] == ch["id"]]
        rows.append(
            {
                "check_id": ch["id"],
                "kind": "unique",
                "n_rows": int(mine["n_rows"].sum()),
                "n_violating": int(mine["n_violating"].sum()),
            }
        )
    return pd.DataFrame(rows)


def _fk_check(
    ds: ray.data.Dataset, check: dict, num_buckets: int | None
) -> pd.DataFrame:
    col, ref_col = check["col"], check["ref_col"]
    val_cnt = pa.schema([("__val", pa.string()), ("__cnt", pa.int64())])
    val_only = pa.schema([("__val", pa.string())])

    def _as_val(b: pd.DataFrame, src: str) -> pd.DataFrame:
        if len(b) == 0 or src not in b.columns:
            return pd.DataFrame({"__val": pd.Series([], dtype="object")})
        # string-render: fk equality must not depend on dtype skew
        # between child and parent (int32 child vs int64 parent)
        return pd.DataFrame({"__val": b[src].dropna().astype(str)})

    def _child_comb(b: pd.DataFrame) -> pd.DataFrame:
        v = _as_val(b, col)
        if len(v) == 0:
            v["__cnt"] = pd.Series([], dtype="int64")
            return v
        vc = v["__val"].value_counts()
        return pd.DataFrame(
            {"__val": vc.index.to_numpy(object), "__cnt": vc.to_numpy(np.int64)}
        )

    child = bucketed_reduce(
        ds.select_columns([col]),
        ["__val"],
        lambda g: g.groupby("__val", sort=False, as_index=False)["__cnt"].sum(),
        val_cnt,
        combiner=_child_comb,
        num_buckets=num_buckets,
    ).materialize()  # consumed twice (join + total); avoid re-execution
    parent = bucketed_reduce(
        check["ref"].select_columns([ref_col]),
        ["__val"],
        lambda g: g.drop_duplicates(),
        val_only,
        combiner=lambda b: _as_val(b, ref_col).drop_duplicates(),
        num_buckets=num_buckets,
    )
    orphans = cogroup_join(
        child, parent, ["__val"], how="left_anti",
        left_schema=val_cnt, right_schema=val_only, num_buckets=num_buckets,
    ).to_pandas()
    n_orphan_rows = int(orphans["__cnt"].sum()) if "__cnt" in orphans.columns else 0
    # total child rows (non-null) from the already-reduced child side
    tot = child.to_pandas()
    n_rows = int(tot["__cnt"].sum()) if "__cnt" in tot.columns else 0
    return pd.DataFrame(
        [
            {
                "check_id": check["id"],
                "kind": "fk",
                "n_rows": n_rows,
                "n_violating": n_orphan_rows,
            }
        ]
    )


def k_anonymize(
    ds: ray.data.Dataset,
    quasi_cols: list[str],
    *,
    k: int,
    out_schema: pa.Schema,
    sentinel: str = "(suppressed)",
    driver_max_small_groups: int = 2_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """K-anonymity suppression (governance gate before publishing a
    derived table): rows whose quasi-identifier combination occurs
    fewer than ``k`` times get every quasi column replaced by
    ``sentinel``, so no released combination identifies < k people.

    One bucketed count over DISTINCT combinations (map-side
    ``value_counts`` combiner), then the SMALL-group key set —
    counted first, broadcast under ``driver_max_small_groups``, else
    applied with a partitioned flag join — masks rows map-side. The
    quasi columns in ``out_schema`` must be strings (the sentinel
    shares the column)."""
    from .relational import cogroup_join

    cnt_schema = pa.schema(
        [(c, pa.string()) for c in quasi_cols] + [("__cnt", pa.int64())]
    )

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = pd.DataFrame(
                {c: pd.Series([], dtype="object") for c in quasi_cols}
            )
            out["__cnt"] = pd.Series([], dtype="int64")
            return out
        g = b.copy()
        for c in quasi_cols:
            g[c] = g[c].astype(str)
        return (
            g.groupby(quasi_cols, sort=False, dropna=False)
            .size()
            .reset_index(name="__cnt")
        )

    counts = bucketed_reduce(
        ds.select_columns(quasi_cols),
        quasi_cols,
        lambda g: g.groupby(quasi_cols, sort=False, as_index=False, dropna=False)[
            "__cnt"
        ].sum(),
        cnt_schema,
        combiner=_comb,
        num_buckets=num_buckets,
    )
    small = counts.filter(
        expr=f"__cnt < {int(k)}"
    ).materialize()  # counted next, then broadcast or joined

    def _mask_frame(b: pd.DataFrame, is_small: np.ndarray) -> pd.DataFrame:
        out = b.copy()
        for c in quasi_cols:
            col = out[c].astype(str)
            col[is_small] = sentinel
            out[c] = col
        return out

    n_small = small.count()
    if n_small <= driver_max_small_groups:
        sm = small.to_pandas()
        key_set = (
            set(map(tuple, sm[quasi_cols].astype(str).to_numpy()))
            if len(sm)
            else set()
        )
        key_ref = ray.put(key_set)

        def _apply(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return b
            keys = ray.get(key_ref)
            tup = list(map(tuple, b[quasi_cols].astype(str).to_numpy()))
            is_small = np.fromiter(
                (t in keys for t in tup), dtype=bool, count=len(tup)
            )
            return _mask_frame(b, is_small)

        return normalize_blocks(
            ds.map_batches(_apply, batch_format="pandas", batch_size=None),
            out_schema,
        )

    # scale path: flag join on the quasi key
    flag_schema = pa.schema(
        [(c, pa.string()) for c in quasi_cols] + [("__small", pa.bool_())]
    )
    flags = normalize_blocks(
        small.map_batches(
            lambda b: b.assign(__small=np.ones(len(b), dtype=bool)).drop(
                columns="__cnt"
            ),
            batch_format="pandas",
        ),
        flag_schema,
    )
    flagged = cogroup_join(
        ds,
        flags,
        quasi_cols,
        how="left_outer",
        left_schema=out_schema,
        right_schema=flag_schema,
        num_buckets=num_buckets,
    )

    def _apply_joined(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        is_small = b["__small"].fillna(False).to_numpy(bool)
        return _mask_frame(b.drop(columns="__small"), is_small)

    return normalize_blocks(
        flagged.map_batches(_apply_joined, batch_format="pandas", batch_size=None),
        out_schema,
    )


# ---------------------------------------------------------------------------
# Content checksum (migration / replication fingerprint)
# ---------------------------------------------------------------------------

CHECKSUM_SCHEMA = pa.schema(
    [("slice", pa.int64()), ("n_rows", pa.int64()), ("checksum", pa.int64())]
)

MERSENNE61 = (1 << 61) - 1


def content_checksum(
    ds: ray.data.Dataset,
    cols: list[str],
    *,
    n_slices: int = 64,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Order-insensitive content fingerprint of a table: ``(slice,
    n_rows, checksum)`` where each row hashes to ``h =
    md5_number_lower(concat_ws(US, cols))`` (DuckDB's exact function —
    little-endian int of md5 digest bytes 8..16), lands in slice
    ``h % n_slices``, and contributes ``h % (2^61-1)`` to its slice's
    modular checksum. Two engines (or two sides of a 100-TB
    migration / replication / backfill) agree on every slice iff the
    row MULTISETS agree — and when they differ, the mismatched slices
    localize the diff to 1/n_slices of the data before anyone runs an
    expensive row-level join. Commutative + associative by
    construction, so the result is independent of block layout, scan
    order, and parallelism.

    ``cols`` must be integer or string typed (floats render
    differently across engines — refused loudly). Rendering matches
    ``CAST(col AS VARCHAR)`` for int64 and identity for strings;
    columns join on the unit separator ``\\x1f``. NULLs are refused
    (DuckDB's concat_ws SKIPS nulls, silently aliasing rows).

    Scale shape: map-only hashing (the md5 digest is itself the work —
    a per-row C-level digest loop, no cheaper vectorized form exists),
    map-side combiner collapses every block to <= n_slices partial
    rows with exact Python-int modular sums, then one tiny bucketed
    reduce over <= n_slices keys. Nothing but the n_slices-row residue
    ever crosses the wire.
    """
    import hashlib

    sch = ds.schema()  # Ray's Schema wrapper: parallel .names / .types
    types = dict(zip(sch.names, sch.types))
    for c in cols:
        dt = types[c]
        if isinstance(dt, pa.DataType):
            ok = (
                pa.types.is_integer(dt)
                or pa.types.is_string(dt)
                or pa.types.is_large_string(dt)
            )
        else:
            # pandas-block datasets expose numpy dtypes or bare Python
            # types (object for strings) instead of pa.DataTypes
            nd = np.dtype(dt) if not isinstance(dt, np.dtype) else dt
            ok = nd.kind in ("i", "u", "O", "U")
        if not ok:
            raise TypeError(
                f"content_checksum column {c!r} has non-portable type {dt} "
                "(only integer/string columns render identically across engines)"
            )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "slice": pd.Series([], dtype="int64"),
                    "n_rows": pd.Series([], dtype="int64"),
                    "checksum": pd.Series([], dtype=object),
                }
            )
        if b[cols].isna().any().any():
            raise ValueError("content_checksum: NULL in checksum columns")
        s = b[cols[0]].astype(str)
        for c in cols[1:]:
            s = s + "\x1f" + b[c].astype(str)
        md5 = hashlib.md5
        h = np.fromiter(
            (
                int.from_bytes(md5(x.encode()).digest()[8:16], "little")
                for x in s.to_numpy(object)
            ),
            dtype=np.uint64,
            count=len(s),
        )
        df = pd.DataFrame(
            {
                "slice": (h % n_slices).astype(np.int64),
                "n_rows": np.ones(len(h), np.int64),
                # object dtype: Python-int sums never overflow; a slice
                # partial is < 2^61 only AFTER the mod below
                "checksum": (h % MERSENNE61).astype(object),
            }
        )
        agg = df.groupby("slice", sort=False, as_index=False).agg(
            n_rows=("n_rows", "sum"), checksum=("checksum", "sum")
        )
        agg["checksum"] = agg["checksum"].map(lambda v: int(v) % MERSENNE61)
        return agg

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["checksum"] = g["checksum"].astype(object)
        agg = g.groupby("slice", sort=False, as_index=False).agg(
            n_rows=("n_rows", "sum"), checksum=("checksum", "sum")
        )
        agg["checksum"] = agg["checksum"].map(lambda v: int(v) % MERSENNE61).astype("int64")
        return agg

    return bucketed_reduce(
        ds.select_columns(cols).map_batches(
            _partial, batch_format="pandas", batch_size=None
        ),
        ["slice"],
        _reduce,
        CHECKSUM_SCHEMA,
        num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# Differentially-private noisy counts (truncated two-sided geometric)
# ---------------------------------------------------------------------------

DP_SCHEMA = pa.schema([("group", pa.string()), ("noisy_count", pa.int64())])


def geometric_noise_table(k_bound: int) -> tuple[list[tuple[int, int, int]], int]:
    """Inverse-CDF table for the truncated two-sided geometric
    distribution with ratio p = 1/2: noise k in [-K..K] has weight
    ``2^(K-|k|)`` (total ``3*2^K - 2``). Returns ``([(lo, hi, k)],
    total)`` — a draw r in [0, total) maps to the row with
    ``lo <= r < hi``. All exact integers, so ANY engine reproduces the
    same noise from the same hash draw."""
    ks = list(range(-k_bound, k_bound + 1))
    weights = [1 << (k_bound - abs(k)) for k in ks]
    rows, lo = [], 0
    for k, w in zip(ks, weights):
        rows.append((lo, lo + w, k))
        lo += w
    return rows, lo


def dp_noisy_counts(
    ds: ray.data.Dataset,
    group_col: str,
    *,
    k_bound: int = 12,
    seed: str = "dp",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group counts released under the (truncated) two-sided
    geometric mechanism — the governance primitive for publishing
    statistics about a 100-TB corpus without exposing any single
    contributor: ``noisy_count = max(0, count + noise)`` where noise
    is a two-sided geometric draw with ratio 1/2 (epsilon = ln 2 per
    count; truncation at ``k_bound`` makes the mechanism approximate —
    tail mass ~2^-k_bound — and is stated, not hidden).

    The draw is DERANDOMIZED for auditability: ``r =
    md5_number_lower(group || '|' || seed) % total`` feeds the exact
    integer inverse-CDF from :func:`geometric_noise_table`, so the
    release is reproducible by any engine with md5 (the SQL twin joins
    the same table) — change ``seed`` per release to re-randomize.
    NOTE: derandomized noise is deterministic GIVEN the seed; true DP
    requires the seed to stay secret (documented trade: this is the
    testable, migration-diffable variant).

    Scale shape: map-side count combiner, one bucketed count reduce
    (residue = one row per group), noise applied map-only on the
    residue. Nothing row-level ever reaches the driver."""
    import hashlib

    rows, total = geometric_noise_table(k_bound)

    def _cnt(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"group": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64")}
            )
        col = "group" if "group" in b.columns else group_col
        vc = b.groupby(col, sort=False)["n"].sum() if "n" in b.columns else (
            b[col].value_counts(sort=False)
        )
        out = vc.rename("n").reset_index()
        out.columns = ["group", "n"]
        out["n"] = out["n"].astype("int64")
        return out

    counts = bucketed_reduce(
        # the map-side combiner renames to the canonical (group, n)
        # partial shape, so the shuffle keys on "group"
        ds.select_columns([group_col]),
        ["group"],
        _cnt,
        pa.schema([("group", pa.string()), ("n", pa.int64())]),
        combiner=_cnt,
        num_buckets=num_buckets,
    )

    lows = np.array([r[0] for r in rows], dtype=np.int64)
    noises = np.array([r[2] for r in rows], dtype=np.int64)

    def _noise(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"group": pd.Series([], dtype=object),
                 "noisy_count": pd.Series([], dtype="int64")}
            )
        md5 = hashlib.md5
        r = np.fromiter(
            (
                int.from_bytes(
                    md5(f"{g}|{seed}".encode()).digest()[8:16], "little"
                ) % total
                for g in b["group"].to_numpy(object)
            ),
            dtype=np.int64,
            count=len(b),
        )
        idx = np.searchsorted(lows, r, side="right") - 1
        noisy = np.maximum(b["n"].to_numpy(np.int64) + noises[idx], 0)
        return pd.DataFrame({"group": b["group"], "noisy_count": noisy})

    from .infer import normalize_blocks as _nb

    return _nb(
        counts.map_batches(_noise, batch_format="pandas", batch_size=None),
        DP_SCHEMA,
    )


LDIV_SCHEMA_SUFFIX = [
    ("n_rows", pa.int64()),
    ("n_distinct_sensitive", pa.int64()),
    ("l_ok", pa.bool_()),
]


def l_diversity_report(
    ds: ray.data.Dataset,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    l: int,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """L-diversity audit — the governance check K-ANONYMITY MISSES:
    a quasi-group can be large (k-anonymous) yet expose everyone in it
    because all its rows share ONE sensitive value. Per quasi-group:
    row count, distinct sensitive values, and ``l_ok = (n_distinct >=
    l)``. One bucketed reduce over map-side DISTINCT
    (quasi..., sensitive, partial count) partials — the shuffle
    carries the (group x sensitive-value) domain, never rows."""
    from .infer import bucketed_reduce

    out_schema = pa.schema(
        [(c, pa.string()) for c in quasi_cols] + LDIV_SCHEMA_SUFFIX
    )
    part_schema = pa.schema(
        [(c, pa.string()) for c in quasi_cols]
        + [("__sv", pa.string()), ("__cnt", pa.int64())]
    )

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or sensitive_col not in b.columns and "__sv" not in b.columns:
            out = pd.DataFrame({c: pd.Series([], dtype="object") for c in quasi_cols})
            out["__sv"] = pd.Series([], dtype="object")
            out["__cnt"] = pd.Series([], dtype="int64")
            return out
        g = b.copy()
        if "__sv" not in g.columns:
            g["__sv"] = g[sensitive_col].astype(str)
        for c in quasi_cols:
            g[c] = g[c].astype(str)
        if "__cnt" in g.columns:
            return g.groupby(quasi_cols + ["__sv"], as_index=False, sort=False,
                             dropna=False)["__cnt"].sum()
        return (
            g.groupby(quasi_cols + ["__sv"], sort=False, dropna=False)
            .size()
            .reset_index(name="__cnt")
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(quasi_cols + ["__sv"], as_index=False, sort=False,
                        dropna=False)["__cnt"].sum()
        per = agg.groupby(quasi_cols, as_index=False, sort=False, dropna=False).agg(
            n_rows=("__cnt", "sum"), n_distinct_sensitive=("__sv", "size")
        )
        per["l_ok"] = per["n_distinct_sensitive"] >= l
        for c in ("n_rows", "n_distinct_sensitive"):
            per[c] = per[c].astype("int64")
        return per

    cols = quasi_cols + [sensitive_col]
    return bucketed_reduce(
        ds.select_columns(cols),
        quasi_cols,
        _reduce,
        out_schema,
        combiner=_comb,
        num_buckets=num_buckets,
    )


TCLOSE_SCHEMA_SUFFIX = [
    ("n_rows", pa.int64()),
    ("tclose_milli", pa.int64()),
    ("t_ok", pa.bool_()),
]


def t_closeness_report(
    ds: ray.data.Dataset,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    t_milli: int,
    driver_max_categories: int = 100_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """T-closeness audit — the governance check L-DIVERSITY misses: a
    group can hold l distinct sensitive values yet still leak because
    its DISTRIBUTION deviates from the corpus (e.g. 99% one value).
    Per quasi-group: total-variation distance to the global sensitive
    distribution in exact integer permille —
    ``tclose_milli = 500 * Σ_c |n_gc*N - n_c*N_g| // (N_g * N)`` —
    and ``t_ok = tclose_milli <= t_milli``.

    The global category histogram is small by construction (sensitive
    attributes are categorical); it collects under
    ``driver_max_categories`` and broadcasts into the one group-keyed
    bucketed reduce (absent categories enter via the closed form
    ``S = Σ_{c in G} (|n_gc*N - n_c*N_g| - n_c*N_g) + N_g*N``).
    Exactness bound: products are int64, so N * max group size must
    stay under 2^63 (N < ~3e9 rows with million-row groups) — DuckDB
    errors loudly on the same bound rather than wrapping."""
    import ray as _ray

    from .infer import bucketed_reduce

    cols = quasi_cols + [sensitive_col]
    gl_parts = ds.select_columns([sensitive_col]).map_batches(
        lambda b: b.groupby(sensitive_col, sort=False, dropna=False)
        .size()
        .reset_index(name="n")
        if len(b)
        else pd.DataFrame(
            {sensitive_col: pd.Series(dtype="object"),
             "n": pd.Series(dtype="int64")}
        ),
        batch_format="pandas",
    ).to_pandas()
    if len(gl_parts) == 0:
        out_schema = pa.schema(
            [(c, pa.string()) for c in quasi_cols] + TCLOSE_SCHEMA_SUFFIX
        )
        return ray.data.from_arrow(out_schema.empty_table())
    gl = gl_parts.groupby(sensitive_col, sort=False, dropna=False)["n"].sum()
    if len(gl) > driver_max_categories:
        raise ValueError(
            f"sensitive domain {len(gl)} exceeds driver_max_categories — "
            "t-closeness needs a categorical sensitive column"
        )
    n_c = {str(k): int(v) for k, v in gl.items()}
    n_total = int(gl.sum())
    nc_ref = _ray.put(n_c)

    out_schema = pa.schema(
        [(c, pa.string()) for c in quasi_cols] + TCLOSE_SCHEMA_SUFFIX
    )

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = pd.DataFrame({c: pd.Series([], dtype="object") for c in quasi_cols})
            out["__sv"] = pd.Series([], dtype="object")
            out["__cnt"] = pd.Series([], dtype="int64")
            return out
        g = b.copy()
        if "__sv" not in g.columns:
            g["__sv"] = g[sensitive_col].astype(str)
        for c in quasi_cols:
            g[c] = g[c].astype(str)
        if "__cnt" in g.columns:
            return g.groupby(quasi_cols + ["__sv"], as_index=False, sort=False,
                             dropna=False)["__cnt"].sum()
        return (
            g.groupby(quasi_cols + ["__sv"], sort=False, dropna=False)
            .size()
            .reset_index(name="__cnt")
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        nc = _ray.get(nc_ref) if isinstance(nc_ref, _ray.ObjectRef) else nc_ref
        agg = g.groupby(quasi_cols + ["__sv"], as_index=False, sort=False,
                        dropna=False)["__cnt"].sum()
        ncv = agg["__sv"].map(nc).fillna(0).astype("int64").to_numpy()
        ngc = agg["__cnt"].to_numpy().astype(np.int64)
        sizes = agg.groupby(quasi_cols, sort=False, dropna=False)["__cnt"].transform("sum").to_numpy().astype(np.int64)
        term = np.abs(ngc * n_total - ncv * sizes) - ncv * sizes
        agg = agg.assign(__term=term, __ng=sizes)
        per = agg.groupby(quasi_cols, as_index=False, sort=False, dropna=False).agg(
            n_rows=("__cnt", "sum"), s_part=("__term", "sum"), n_g=("__ng", "max")
        )
        n_g = per["n_g"].to_numpy().astype(np.int64)
        s = per["s_part"].to_numpy().astype(np.int64) + n_g * n_total
        per["tclose_milli"] = (500 * s) // (n_g * n_total)
        per["t_ok"] = per["tclose_milli"] <= t_milli
        per["n_rows"] = per["n_rows"].astype("int64")
        per["tclose_milli"] = per["tclose_milli"].astype("int64")
        return per[quasi_cols + ["n_rows", "tclose_milli", "t_ok"]]

    return bucketed_reduce(
        ds.select_columns(cols),
        quasi_cols,
        _reduce,
        out_schema,
        combiner=_comb,
        num_buckets=num_buckets,
    )
