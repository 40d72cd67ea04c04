"""Mergeable sketches — the aggregation pattern for metrics that are
too expensive to compute exactly at 100 TB.

HyperLogLog (Flajolet et al., 2007; public algorithm) implemented the
Ray-Data way: each batch emits ONE serialized register array per group
key (the map-side partial), a single small groupby max-merges the
registers, and the driver reads back only ``groups x 2^p`` bytes —
no shuffle of raw values at all. Standard bias correction for the
small-range regime; expected relative error ~1.04/sqrt(2^p) (~3.2%
at p=10).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _hash64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big"
        )
    return out


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (binary search, exact)."""
    clz = np.zeros(len(x), dtype=np.uint8)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        zero_top = (v >> np.uint64(64 - shift)) == 0
        clz[zero_top] += shift
        v[zero_top] = v[zero_top] << np.uint64(shift)
    return clz  # == 64 for x == 0


def _registers(values, p: int) -> np.ndarray:
    """HLL register array (2^p uint8) for one batch of values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & np.uint64((1 << 64) - 1)
    # rank = leading zeros of the (64-p)-bit suffix + 1, capped
    ranks = np.minimum(_clz64(rest), 64 - p).astype(np.uint8) + 1
    np.maximum.at(regs, idx, ranks)
    return regs


def _estimate(regs: np.ndarray) -> int:
    """Exact-arithmetic HLL estimate, truncated to int: the register
    power sum ``S = sum(2^(64-r))`` is an exact Python integer, so the
    value is independent of summation order and reproducible
    bit-for-bit by a SQL twin (HUGEINT power sum, one double cast,
    identical IEEE op order); the small-range linear-counting branch
    uses ``math.log`` (libm — matches DuckDB ``ln`` on this platform,
    exhaustively probed over every possible zeros count)."""
    import math

    m = len(regs)
    counts = np.bincount(regs)
    S = 0
    for r, c in enumerate(counts):
        if c:
            S += int(c) << (64 - r)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m * 2.0**64 / float(S)
    zeros = int(counts[0]) if len(counts) else m
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)  # linear counting for small range
    return int(est)


def hll_distinct(
    ds: ray.data.Dataset,
    value_col: str,
    group_cols: list[str] | None = None,
    *,
    p: int = 10,
) -> ray.data.Dataset:
    """Approximate count-distinct of ``value_col`` (optionally per
    group): per-batch register partials -> per-group register
    max-merge -> estimate. Output ``(group..., approx_distinct:
    int64)``."""
    group_cols = group_cols or []

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if group_cols:
            for keys, g in batch.groupby(group_cols, sort=False):
                if not isinstance(keys, tuple):
                    keys = (keys,)
                rows.append(
                    dict(zip(group_cols, keys))
                    | {"__regs": _registers(g[value_col].to_numpy(), p).tobytes()}
                )
        else:
            rows.append({"__regs": _registers(batch[value_col].to_numpy(), p).tobytes()})
        return pd.DataFrame(rows)

    partials = ds.select_columns(group_cols + [value_col]).map_batches(
        _partial, batch_format="pandas"
    )

    out_schema = pa.schema(
        [pa.field(c, pa.string()) for c in group_cols]
        + [pa.field("approx_distinct", pa.int64())]
    )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for blob in g["__regs"]:
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
        row = {c: g[c].iloc[0] for c in group_cols}
        row["approx_distinct"] = _estimate(merged)
        return pd.DataFrame([row])

    if group_cols:
        from .infer import bucketed_reduce

        def _merge_all(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for _, grp in g.groupby(group_cols, sort=False):
                outs.append(_merge(grp))
            return pd.concat(outs, ignore_index=True)

        return bucketed_reduce(partials, group_cols, _merge_all, out_schema)
    # global: tiny — merge on the driver
    pdf = partials.to_pandas()
    return ray.data.from_pandas(_merge(pdf))


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

HH_SCHEMA = pa.schema([("value", pa.string()), ("est_count", pa.int64())])


def _cms_positions(values: pd.Series, depth: int, width: int) -> np.ndarray:
    """(n, depth) cell columns via Kirsch-Mitzenmacher double hashing —
    one base hash pass + two DISTINCT splitmix finalizers (pandas'
    hash_key seeds object columns only; see stages/bloom.py)."""
    from .bloom import _mix

    base = pd.util.hash_pandas_object(values.astype(str), index=False).to_numpy(
        np.uint64
    )
    h1 = _mix(base, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB)
    h2 = _mix(base, 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53) | np.uint64(1)
    d = np.arange(depth, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + d[None, :] * h2[:, None]) % np.uint64(width)).astype(
            np.int64
        )


def cms_heavy_hitters(
    ds: ray.data.Dataset,
    value_col: str,
    *,
    k: int = 20,
    depth: int = 4,
    width: int = 2048,
    candidates_per_block: int = 256,
) -> ray.data.Dataset:
    """Approximate top-``k`` heavy hitters of ``value_col`` with
    count-min-sketch estimates: ``(value, est_count)``, est_count >=
    true count, overestimate bounded by ~e*N/width per hash row.

    Fully distributed, no driver gate needed: per-block exact
    value_counts feed (a) nonzero CMS cell increments — ONE bucketed
    integer sum over at most depth x width cells, collected as a
    bounded-constant table — and (b) a block-local candidate top-m.
    The candidate union is estimated against the merged sketch and
    the global top-k taken by (est desc, value).

    Caveat (documented, standard for sketch heavy-hitters): a value
    only reaches the candidate set if it is in the top-``m`` of at
    least one block; for the skewed distributions heavy-hitter queries
    target this always holds, but an adversarially uniform spread can
    hide a key. Raise ``candidates_per_block`` (or use the exact
    top-k operators) when in doubt."""
    from .infer import bucketed_reduce, normalize_blocks

    cell_schema = pa.schema([("cell", pa.int64()), ("n", pa.int64())])
    cand_schema = pa.schema([("value", pa.string())])

    def _cells(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"cell": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        counts = b[value_col].astype(str).value_counts()
        pos = _cms_positions(counts.index.to_series(), depth, width)
        rows = depth * len(counts)
        return pd.DataFrame(
            {
                "cell": (pos + (np.arange(depth) * width)[None, :]).ravel(),
                "n": np.repeat(counts.to_numpy(np.int64), depth),
            }
        ) if rows else pd.DataFrame({"cell": [], "n": []})

    def _sum_cells(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "cell" not in g.columns:  # empty blocks lose cols
            return pd.DataFrame({"cell": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        return g.groupby("cell", as_index=False).agg(n=("n", "sum"))

    src = ds.select_columns([value_col]).materialize()
    cells = bucketed_reduce(
        src.map_batches(_cells, batch_format="pandas", batch_size=None),
        ["cell"],
        _sum_cells,
        cell_schema,
        combiner=_sum_cells,
    ).to_pandas()  # bounded: <= depth x width rows

    def _cands(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"value": pd.Series([], dtype="object")})
        top = (
            b[value_col].astype(str).value_counts().head(candidates_per_block)
        )
        return pd.DataFrame({"value": top.index})

    def _dd(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "value" not in g.columns:
            return pd.DataFrame({"value": pd.Series([], dtype="object")})
        return g.drop_duplicates("value")

    cand = (
        bucketed_reduce(
            normalize_blocks(
                src.map_batches(_cands, batch_format="pandas", batch_size=None),
                cand_schema,
            ),
            ["value"],
            _dd,
            cand_schema,
            combiner=_dd,
        )
        .to_pandas()  # bounded: <= candidates_per_block x n_blocks
    )

    sketch = np.zeros(depth * width, dtype=np.int64)
    if len(cells) and "cell" in cells.columns:  # empty result loses cols
        sketch[cells["cell"].to_numpy(np.int64)] = cells["n"].to_numpy(np.int64)
    sketch = sketch.reshape(depth, width)

    if len(cand) == 0:
        return ray.data.from_arrow(HH_SCHEMA.empty_table())
    pos = _cms_positions(cand["value"], depth, width)
    est = sketch[np.arange(depth)[None, :], pos].min(axis=1)
    out = (
        pd.DataFrame({"value": cand["value"], "est_count": est.astype(np.int64)})
        .sort_values(["est_count", "value"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    return ray.data.from_arrow(pa.Table.from_pandas(out, schema=HH_SCHEMA, preserve_index=False))


# ---------------------------------------------------------------------------
# Exact heavy hitters — frequent-items candidates + exact recount
# ---------------------------------------------------------------------------

EHH_SCHEMA = pa.schema([("value", pa.string()), ("cnt", pa.int64())])


def exact_heavy_hitters(
    ds: ray.data.Dataset,
    value_col: str,
    *,
    denom: int = 1000,
    candidate_broadcast_max: int = 2_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """EXACT counts of every value whose frequency is at least
    ``1/denom`` of the total (``cnt * denom >= N``) — WITHOUT a full
    groupby over the distinct-value domain. The two-pass
    frequent-items scheme (Misra–Gries 1982 bound, per-block form):

    1. One map pass: per-block ``value_counts`` emits dedup'd partials
       ``(value, n)`` plus a candidate flag ``n * (denom+1) > n_block``.
       Guarantee: a value heavy globally is a candidate in >= 1 block —
       if ``c_b * (denom+1) <= n_b`` everywhere then summing gives
       ``C <= N/(denom+1)``, so ``C * denom < N``. The candidate union
       is therefore a SUPERSET of the answer, at most ``denom`` values
       per block.
    2. Exact recount of candidates only: partials are filtered to the
       candidate set (broadcast under ``candidate_broadcast_max``, a
       bucketed left-semi join over it) and summed with one bucketed
       reduce — the only shuffle, sized by candidates x blocks, not by
       the distinct-value domain (the thing that makes a plain groupby
       a 100-TB all-to-all on open-vocabulary columns).

    Output ``(value, cnt)`` with exact ``cnt``; hash-matches a plain
    ``GROUP BY ... HAVING count(*)*denom >= N`` SQL twin.
    """
    from .infer import bucketed_reduce, normalize_blocks

    part_schema = pa.schema(
        [("value", pa.string()), ("n", pa.int64()), ("is_cand", pa.bool_())]
    )
    cand_schema = pa.schema([("value", pa.string())])

    def _partials(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"value": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64"),
                 "is_cand": pd.Series([], dtype=bool)}
            )
        vc = b[value_col].astype(str).value_counts(sort=False)
        n = vc.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "value": vc.index.to_numpy(object),
                "n": n,
                "is_cand": n * (denom + 1) > int(n.sum()),
            }
        )

    partials = normalize_blocks(
        ds.select_columns([value_col]).map_batches(
            _partials, batch_format="pandas", batch_size=None
        ),
        part_schema,
    ).materialize()
    n_total = int(partials.sum("n") or 0)
    if n_total == 0:
        return ray.data.from_arrow(EHH_SCHEMA.empty_table())

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates("value")

    cand = bucketed_reduce(
        partials.map_batches(
            lambda b: b.loc[b["is_cand"], ["value"]], batch_format="pandas"
        ),
        ["value"],
        _dd,
        cand_schema,
        combiner=_dd,
        num_buckets=num_buckets,
    ).materialize()

    counts_in = partials.map_batches(
        lambda b: b[["value", "n"]], batch_format="pandas"
    )
    if cand.count() <= candidate_broadcast_max:
        cdf = cand.to_pandas()
        cset = set(cdf["value"].to_numpy(object)) if len(cdf) else set()
        ref = ray.put(cset)

        class _Filter:
            def __init__(self, r):
                self._s = ray.get(r)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                if len(b) == 0:
                    return b
                return b.loc[b["value"].isin(self._s)]

        matched = counts_in.map_batches(
            _Filter, fn_constructor_kwargs={"r": ref},
            batch_format="pandas", concurrency=(1, 8),
        )
    else:
        from .relational import cogroup_join

        matched = cogroup_join(
            counts_in,
            cand,
            ["value"],
            how="left_semi",
            num_buckets=num_buckets,
            left_schema=pa.schema([("value", pa.string()), ("n", pa.int64())]),
            right_schema=cand_schema,
        )

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("value", sort=False, as_index=False).agg(cnt=("cnt", "sum"))
        return agg.loc[agg["cnt"] * denom >= n_total]

    return bucketed_reduce(
        matched.map_batches(
            lambda b: b.rename(columns={"n": "cnt"}), batch_format="pandas"
        ),
        ["value"],
        _sum,
        EHH_SCHEMA,
        combiner=lambda b: (
            b.groupby("value", sort=False, as_index=False).agg(cnt=("cnt", "sum"))
            if len(b)
            else b
        ),
        num_buckets=num_buckets,
    )


ROLLUP_SCHEMA = pa.schema(
    [
        ("level", pa.string()),
        ("key", pa.string()),
        ("approx_distinct", pa.int64()),
    ]
)


def hll_rollup(
    ds: ray.data.Dataset,
    value_col: str,
    levels: list[list[str]],
    *,
    p: int = 10,
) -> ray.data.Dataset:
    """Mergeable-sketch rollup: HLL register blobs computed ONCE at
    the finest grouping merge upward through coarser levels WITHOUT
    rescanning the input — the warehouse pattern for distinct-count
    hierarchies (day x type -> day -> global). ``levels`` must be
    nested coarsenings, finest first, ending with ``[]`` for the
    grand total if wanted. Register max-merge is exact, so a rolled-up
    estimate is BIT-IDENTICAL to a direct sketch of the same slice
    (pinned in pytest). Output: ``(level, key, approx_distinct)`` with
    ``key = '|'.join(level values)``."""
    from .infer import bucketed_reduce

    finest = levels[0]
    for coarser in levels[1:]:
        assert set(coarser) <= set(finest), "levels must be nested coarsenings"

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if finest:
            for keys, g in batch.groupby(finest, sort=False):
                if not isinstance(keys, tuple):
                    keys = (keys,)
                rows.append(
                    {c: str(k) for c, k in zip(finest, keys)}
                    | {"__regs": _registers(g[value_col].to_numpy(), p).tobytes()}
                )
        else:
            rows.append({"__regs": _registers(batch[value_col].to_numpy(), p).tobytes()})
        if not rows:
            # typed empty frame: an all-empty batch must still carry the
            # partial schema or Arrow unification fails in bucketed_reduce
            return pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in finest}
                | {"__regs": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(rows)

    reg_schema = pa.schema(
        [pa.field(c, pa.string()) for c in finest] + [pa.field("__regs", pa.binary())]
    )

    def _merge_blobs(cols: list[str]):
        def _f(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            if cols:
                for keys, grp in g.groupby(cols, sort=False):
                    if not isinstance(keys, tuple):
                        keys = (keys,)
                    merged = np.zeros(1 << p, dtype=np.uint8)
                    for blob in grp["__regs"]:
                        merged = np.maximum(
                            merged, np.frombuffer(blob, dtype=np.uint8)
                        )
                    outs.append(
                        {c: str(k) for c, k in zip(cols, keys)}
                        | {"__regs": merged.tobytes()}
                    )
            else:
                merged = np.zeros(1 << p, dtype=np.uint8)
                for blob in g["__regs"]:
                    merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
                outs.append({"__regs": merged.tobytes()})
            return pd.DataFrame(outs)

        return _f

    tables: list[pd.DataFrame] = []
    current = bucketed_reduce(
        ds.select_columns(finest + [value_col]).map_batches(
            _partial, batch_format="pandas"
        ),
        finest,
        _merge_blobs(finest),
        reg_schema,
    ).to_pandas() if finest else None
    if current is None:
        # degenerate: only the global level
        pdf = ds.select_columns([value_col]).map_batches(
            _partial, batch_format="pandas"
        ).to_pandas()
        merged = np.zeros(1 << p, dtype=np.uint8)
        for blob in pdf["__regs"]:
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
        current = pd.DataFrame([{"__regs": merged.tobytes()}])
    elif len(current) == 0 or "__regs" not in current.columns:
        # empty pipelines lose their schema (NOTES.md edge 7): a fully
        # empty input still rolls up to zero-register sketches so the
        # [] level emits its approx_distinct=0 row
        current = pd.DataFrame(
            {c: pd.Series([], dtype=object) for c in finest}
            | {"__regs": pd.Series([], dtype=object)}
        )

    for cols in levels:
        if cols != finest:
            # roll the PREVIOUS level's registers up — no rescan; the
            # register table is (distinct finest keys) rows, driver-ok
            # at rollup granularity by construction
            outs = []
            if cols:
                for keys, grp in current.groupby(cols, sort=False):
                    if not isinstance(keys, tuple):
                        keys = (keys,)
                    merged = np.zeros(1 << p, dtype=np.uint8)
                    for blob in grp["__regs"]:
                        merged = np.maximum(
                            merged, np.frombuffer(blob, dtype=np.uint8)
                        )
                    outs.append(
                        {c: str(k) for c, k in zip(cols, keys)}
                        | {"__regs": merged.tobytes()}
                    )
            else:
                merged = np.zeros(1 << p, dtype=np.uint8)
                for blob in current["__regs"]:
                    merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
                outs = [{"__regs": merged.tobytes()}]
            lvl_regs = pd.DataFrame(outs)
        else:
            lvl_regs = current
        rows = []
        for _, r in lvl_regs.iterrows():
            key = "|".join(str(r[c]) for c in cols) if cols else ""
            est = _estimate(np.frombuffer(r["__regs"], dtype=np.uint8))
            rows.append(
                {"level": ",".join(cols) if cols else "<all>", "key": key,
                 "approx_distinct": est}
            )
        tables.append(pd.DataFrame(rows))

    out = pd.concat(tables, ignore_index=True)
    out["approx_distinct"] = out["approx_distinct"].astype("int64")
    return ray.data.from_arrow(
        pa.Table.from_pandas(out, schema=ROLLUP_SCHEMA, preserve_index=False)
    )
