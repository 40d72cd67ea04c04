"""Exact distributed quantiles over an integer column.

Percentile cutoffs (median doc length, p99 token count) drive corpus
quality gates, but naive quantiles sort the whole dataset. For the
integer measures this engine produces (token counts, char lengths,
degrees) the DISTINCT-value domain is tiny next to the row count, so
the exact answer needs only a value histogram:

1. ``(value, cnt)`` via one ``bucketed_reduce`` (map-side combiner
   collapses each block to its distinct values first).
2. Count-gate the histogram. Under the gate (default 5M distinct
   values = ~80 MB) the driver sorts it and reads each quantile off
   the cumulative counts. Over the gate, coarse ``value // range``
   prefix sums (the :mod:`packing` scan machinery) locate the single
   range containing each target rank; only those ranges' histogram
   rows are collected (bounded by gate/#ranges each).

Definition (discrete, "lower" interpolation): quantile ``q`` is the
smallest value whose cumulative count reaches ``ceil(q * n)`` — exact
and SQL-oracle-expressible with a window cumsum, unlike interpolating
variants whose float semantics drift across engines.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce

DRIVER_MAX_DISTINCT = 5_000_000

_HIST_SCHEMA = pa.schema([("v", pa.int64()), ("cnt", pa.int64())])


def value_histogram(
    ds: ray.data.Dataset, value_col: str
) -> ray.data.Dataset:
    """``(v, cnt)`` — exact distinct-value counts of an int64 column."""

    def _combine(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pd.DataFrame({"v": u, "cnt": c.astype("int64")})

    return bucketed_reduce(
        ds.select_columns([value_col]),
        ["v"],
        lambda g: g.groupby("v", sort=False, as_index=False)["cnt"].sum(),
        _HIST_SCHEMA,
        combiner=_combine,
    )


def _targets(qs: tuple[float, ...], n: int) -> list[int]:
    return [max(1, math.ceil(q * n)) for q in qs]


def exact_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    *,
    driver_max_distinct: int = DRIVER_MAX_DISTINCT,
    range_size: int = 4096,
) -> pa.Table:
    """``(q, value)`` — exact discrete quantiles of an int64 column.

    Returns a small Arrow table (len(qs) rows); the heavy work is the
    one histogram shuffle. ``qs`` must be in (0, 1].
    """
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("each q must be in (0, 1]")
    hist = value_histogram(ds, value_col).materialize()
    n_distinct = hist.count()
    if n_distinct == 0:
        return pa.table({"q": pa.array([], pa.float64()), "value": pa.array([], pa.int64())})

    if n_distinct <= driver_max_distinct:
        df = hist.to_pandas().sort_values("v", kind="stable")
        v = df["v"].to_numpy(np.int64)
        cum = df["cnt"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        idx = np.searchsorted(cum, _targets(qs, n))
        return pa.table(
            {"q": pa.array(list(qs), pa.float64()), "value": pa.array(v[idx], pa.int64())}
        )

    # Over the gate: coarse range prefix sums locate each target rank's
    # range; collect only those ranges' histogram rows.
    def _to_range(batch: pd.DataFrame) -> pd.DataFrame:
        rid = batch["v"].to_numpy(np.int64) // range_size
        return (
            pd.DataFrame({"range_id": rid, "cnt": batch["cnt"].to_numpy(np.int64)})
            .groupby("range_id", sort=False, as_index=False)["cnt"]
            .sum()
        )

    ranges = bucketed_reduce(
        hist,
        ["range_id"],
        lambda g: g.groupby("range_id", sort=False, as_index=False)["cnt"].sum(),
        pa.schema([("range_id", pa.int64()), ("cnt", pa.int64())]),
        combiner=_to_range,
    ).to_pandas().sort_values("range_id", kind="stable")
    rids = ranges["range_id"].to_numpy(np.int64)
    rcnt = ranges["cnt"].to_numpy(np.int64)
    rcum = rcnt.cumsum()
    n = int(rcum[-1])
    targets = _targets(qs, n)
    need = np.unique(rids[np.searchsorted(rcum, targets)])

    def _prune(b: pd.DataFrame) -> pd.DataFrame:
        keep = np.isin(b["v"].to_numpy(np.int64) // range_size, need)
        return b[keep]

    sub = (
        hist.map_batches(_prune, batch_format="pandas")
        .to_pandas()
        .sort_values("v", kind="stable")
    )
    sv = sub["v"].to_numpy(np.int64)
    srid = sv // range_size
    scnt = sub["cnt"].to_numpy(np.int64)
    vals = []
    for t in targets:
        pos = int(np.searchsorted(rcum, t))
        ri = int(rids[pos])
        before = int(rcum[pos]) - int(rcnt[pos])  # rows in earlier ranges
        mask = srid == ri
        local_cum = scnt[mask].cumsum() + before
        vals.append(int(sv[mask][np.searchsorted(local_cum, t)]))
    return pa.table(
        {"q": pa.array(list(qs), pa.float64()), "value": pa.array(vals, pa.int64())}
    )


def grouped_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> ray.data.Dataset:
    """``(group, q, value)`` — exact discrete quantiles per group.

    One bucketed shuffle keyed on the group; the per-bucket reduce is
    fully vectorized (grouped histogram -> grouped cumsum -> first row
    per (group, target) via a C-level groupby head), so a bucket may
    hold millions of groups without a per-group Python call. Skewed
    hot groups cost one histogram per distinct value, not per row —
    the map-side combiner collapses duplicates before the shuffle.
    """
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("each q must be in (0, 1]")

    def _combine(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {"g": batch[group_col], "v": batch[value_col].to_numpy(np.int64)}
            )
            .groupby(["g", "v"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        h = (
            g.groupby(["g", "v"], sort=False, as_index=False)["cnt"]
            .sum()
            .sort_values(["g", "v"], kind="stable")
        )
        cum = h.groupby("g", sort=False)["cnt"].cumsum()
        tot = h.groupby("g", sort=False)["cnt"].transform("sum")
        outs = []
        for q in qs:
            target = np.maximum(1, np.ceil(q * tot.to_numpy()).astype(np.int64))
            hit = h[cum.to_numpy() >= target]
            first = hit.groupby("g", sort=False, as_index=False).head(1)
            outs.append(
                pd.DataFrame({"g": first["g"], "q": float(q), "value": first["v"]})
            )
        return pd.concat(outs, ignore_index=True)

    out_schema = pa.schema(
        [("g", pa.string()), ("q", pa.float64()), ("value", pa.int64())]
    )
    return bucketed_reduce(
        ds.select_columns([group_col, value_col]),
        ["g"],
        _reduce,
        out_schema,
        combiner=_combine,
    ).rename_columns({"g": group_col})


def quantile_buckets(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    qs: tuple[float, ...] = (1 / 3, 2 / 3),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    passthrough_cols: list[str] | None = None,
    max_groups: int = 1_000_000,
) -> ray.data.Dataset:
    """Tag every row with its group's quantile bucket — the CCNet-style
    head/middle/tail corpus split (Wenzek et al. 2020), generalized to
    any integer signal: rows with ``value <= q_i threshold`` get
    ``labels[i]``, the rest the last label.

    Two passes: :func:`grouped_quantiles` (one bucketed shuffle)
    produces the per-group thresholds — a residue of ``len(qs)`` rows
    per group, count-gated by ``max_groups`` (group domains here are
    languages/sources; a corpus-sized group column is a caller error,
    not a spill case) — which broadcast once; bucket assignment is
    map-side vectorized, zero further shuffle."""
    if len(labels) != len(qs) + 1:
        raise ValueError("need len(qs)+1 labels")
    import ray

    thr = grouped_quantiles(ds, group_col, value_col, qs)
    thr_df = thr.to_pandas()
    if thr_df[group_col].nunique() > max_groups:
        raise ValueError(
            f"quantile_buckets: {thr_df[group_col].nunique()} groups exceed "
            f"max_groups={max_groups} — bucket by a bounded group column"
        )
    pivot: dict[str, list[int]] = {}
    for g, grp in thr_df.groupby(group_col, sort=False):
        byq = dict(zip(grp["q"], grp["value"]))
        pivot[g] = [int(byq[float(q)]) for q in qs]
    thr_ref = ray.put(pivot)

    keep = [c for c in (passthrough_cols or []) if c not in (group_col, value_col)]

    def _tag(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref) if isinstance(thr_ref, ray.ObjectRef) else thr_ref
        v = b[value_col].to_numpy(np.int64)
        out = np.full(len(b), labels[-1], dtype=object)
        groups = b[group_col].to_numpy()
        # vectorized per threshold level, iterating groups once each
        bounds = np.full((len(b), len(qs)), np.iinfo(np.int64).max, dtype=np.int64)
        for g, ts in t.items():
            m = groups == g
            if m.any():
                bounds[m] = ts
        for i in range(len(qs) - 1, -1, -1):
            out[v <= bounds[:, i]] = labels[i]
        cols = {c: b[c] for c in keep}
        cols[group_col] = b[group_col]
        cols[value_col] = v
        cols["bucket"] = out
        return pd.DataFrame(cols)

    return ds.map_batches(_tag, batch_format="pandas")


def percentile_ranks(
    ds: ray.data.Dataset,
    id_col: str,
    value_col: str,
    *,
    driver_max_values: int = 2_000_000,
) -> ray.data.Dataset:
    """Integer cume_dist: ``(id, value, pct_milli)`` where
    ``pct_milli = (rows with value <= v) * 1000 // total`` — the SQL
    window ``cume_dist()`` in exact integer thousandths, so it is
    hash-portable across engines (float cume_dist is not).

    One :func:`value_histogram` shuffle builds the (distinct value ->
    cumulative count) table; that residue is the DISTINCT VALUE domain
    (count-gated, trips loudly — an int64 signal column with more
    distinct values than the gate wants a coarser signal), broadcast
    once; ranking is map-side ``searchsorted``."""
    import ray

    hist = value_histogram(ds, value_col).to_pandas()
    if len(hist) > driver_max_values:
        raise ValueError(
            f"percentile_ranks: {len(hist)} distinct values exceed the "
            f"gate ({driver_max_values}); bucket the signal first"
        )
    hist = hist.sort_values("v", kind="stable")
    values = hist["v"].to_numpy(np.int64)
    cum = hist["cnt"].to_numpy(np.int64).cumsum()
    total = int(cum[-1]) if len(cum) else 0
    table_ref = ray.put({"values": values, "cum": cum, "total": total})

    def _rank(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(table_ref) if isinstance(table_ref, ray.ObjectRef) else table_ref
        v = b[value_col].to_numpy(np.int64)
        idx = np.searchsorted(t["values"], v, side="right") - 1
        le = np.where(idx >= 0, t["cum"][np.clip(idx, 0, None)], 0)
        pct = (le * 1000) // t["total"] if t["total"] else np.zeros(len(b), np.int64)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                value_col: v,
                "pct_milli": pct.astype(np.int64),
            }
        )

    return ds.select_columns([id_col, value_col]).map_batches(
        _rank, batch_format="pandas"
    )


MAD_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("value", pa.int64()),
        ("med", pa.int64()),
        ("mad", pa.int64()),
        ("is_outlier", pa.int64()),
    ]
)


def mad_outliers(
    ds: ray.data.Dataset,
    id_col: str,
    value_col: str,
    *,
    k: int = 3,
    driver_max_distinct: int = DRIVER_MAX_DISTINCT,
) -> ray.data.Dataset:
    """Robust outlier flags via median absolute deviation, all-integer:
    ``med = quantile_disc(0.5)`` of the value, ``mad =
    quantile_disc(0.5)`` of ``|v − med|``, and a row is an outlier iff
    ``|v − med| > k·mad`` (the integer analogue of the classic
    3-sigma-equivalent MAD rule — no 1.4826 float constant, so the
    DuckDB oracle is bit-exact).

    Cost: two histogram shuffles (each over DISTINCT values, tiny for
    count-like columns) + one map-only flag pass with the two scalars
    in the task closure. Output columns are generic ``(id, value,
    med, mad, is_outlier)``.
    """
    med = int(
        exact_quantiles(
            ds, value_col, (0.5,), driver_max_distinct=driver_max_distinct
        )["value"][0].as_py()
    )

    def _dev(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"dev": np.abs(b[value_col].to_numpy(np.int64) - med)}
        )

    devs = ds.map_batches(_dev, batch_format="pandas", batch_size=None)
    mad = int(
        exact_quantiles(
            devs, "dev", (0.5,), driver_max_distinct=driver_max_distinct
        )["value"][0].as_py()
    )

    def _flag(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(np.int64)
        dev = np.abs(v - med)
        return pd.DataFrame(
            {
                "id": b[id_col].to_numpy(np.int64),
                "value": v,
                "med": np.full(len(b), med, np.int64),
                "mad": np.full(len(b), mad, np.int64),
                "is_outlier": (dev > k * mad).astype(np.int64),
            }
        )

    from .infer import normalize_blocks

    return normalize_blocks(
        ds.map_batches(_flag, batch_format="pandas", batch_size=None), MAD_SCHEMA
    )


APPROX_Q_SCHEMA = pa.schema(
    [("q_milli", pa.int64()), ("bin", pa.int64()), ("approx_value", pa.int64())]
)


def approx_quantiles_hist(
    ds: ray.data.Dataset,
    value_col: str,
    qs_milli: tuple[int, ...] = (250, 500, 750, 900, 990),
    *,
    n_bins: int = 1000,
) -> ray.data.Dataset:
    """Approximate quantiles from a MERGEABLE fixed-width histogram —
    the scale path beside :func:`exact_quantiles` for columns whose
    DISTINCT-value domain exceeds the exact gate (near-unique int64
    signals). Deterministic and engine-portable because the sketch is
    pure integer arithmetic, so it still carries a hash-exact SQL twin
    (width-bucket + window cumsum):

        bin(v)       = ((v - lo) * n_bins) // (hi - lo + 1)
        answer(q)    = smallest bin with cum >= ceil(q * n)
        approx_value = lo + bin * (hi - lo + 1) // n_bins   (bin floor)

    Error bound: one bin width = (hi - lo + 1) / n_bins. Two streaming
    scans (min/max/count partials, then per-block ``np.bincount``
    partials into one tiny bin-keyed reduce — residue <= n_bins rows);
    no sort, no full-value shuffle, blocks merge by addition."""
    if not qs_milli or any(not (0 < q <= 1000) for q in qs_milli):
        raise ValueError("each q_milli must be in (0, 1000]")

    stats = ds.map_batches(
        lambda b: pd.DataFrame(
            {
                "lo": [int(b[value_col].min())],
                "hi": [int(b[value_col].max())],
                "n": [int(len(b))],
            }
        )
        if len(b)
        else pd.DataFrame({"lo": [], "hi": [], "n": []}),
        batch_format="pandas",
        batch_size=None,
    ).to_pandas()  # bounded: one row per block
    if len(stats) == 0 or stats["n"].sum() == 0:
        return ray.data.from_arrow(APPROX_Q_SCHEMA.empty_table())
    lo = int(stats["lo"].min())
    hi = int(stats["hi"].max())
    n = int(stats["n"].sum())
    width = hi - lo + 1

    def _bins(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"bin": pd.Series([], dtype="int64"), "cnt": pd.Series([], dtype="int64")}
            )
        v = b[value_col].to_numpy(np.int64)
        bins = (v - lo) * n_bins // width
        cnt = np.bincount(bins, minlength=0)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame({"bin": nz.astype(np.int64), "cnt": cnt[nz].astype(np.int64)})

    hist = (
        bucketed_reduce(
            ds.select_columns([value_col]),
            ["bin"],
            lambda g: g.groupby("bin", sort=False, as_index=False)["cnt"].sum(),
            pa.schema([("bin", pa.int64()), ("cnt", pa.int64())]),
            combiner=_bins,
        )
        .to_pandas()  # bounded: <= n_bins rows
        .sort_values("bin", kind="stable")
    )
    cum = hist["cnt"].to_numpy(np.int64).cumsum()
    bins = hist["bin"].to_numpy(np.int64)
    rows = []
    for q in qs_milli:
        target = (q * n + 999) // 1000
        i = int(np.searchsorted(cum, target, side="left"))
        b = int(bins[min(i, len(bins) - 1)])
        rows.append(
            {"q_milli": int(q), "bin": b, "approx_value": lo + b * width // n_bins}
        )
    return ray.data.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), schema=APPROX_Q_SCHEMA))


WINSOR_SCHEMA_VALUE_COLS = [
    ("n", pa.int64()),
    ("n_lo_clamped", pa.int64()),
    ("n_hi_clamped", pa.int64()),
    ("lo", pa.int64()),
    ("hi", pa.int64()),
    ("winsorized_sum", pa.int64()),
]


def winsorized_group_stats(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    driver_max_groups: int = 1_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group winsorized sum of an int64 column: values are clamped
    to the group's exact discrete ``[q_lo, q_hi]`` quantiles before
    summing — the robust-aggregate primitive (a handful of corrupted
    crawl records or fat-finger prices can't move the total), with the
    clamp bounds and clamp counts reported per group.

    All-integer (discrete quantiles + integer clamp + integer sum), so
    a ``quantile_disc`` + ``least``/``greatest`` SQL twin hash-matches
    bit-for-bit.

    Cost: one grouped-histogram shuffle for the bounds (distinct
    values per group, not rows — see :func:`grouped_quantiles`) plus
    one shuffle for the clamped sums. COUNT-GATED per house policy:
    when the bounds table is under ``driver_max_groups`` rows it is
    collected once and broadcast into a map-side clamp (zero joins);
    over the gate the bounds stream through a ``cogroup_join`` instead
    and the final sums run as one ``bucketed_reduce``.
    """
    if not (0.0 < q_lo < q_hi <= 1.0):
        raise ValueError("need 0 < q_lo < q_hi <= 1")
    from .infer import bucketed_reduce as _br, normalize_blocks
    from .relational import cogroup_join

    out_schema = pa.schema([(group_col, pa.string())] + WINSOR_SCHEMA_VALUE_COLS)

    slim = ds.select_columns([group_col, value_col])
    bounds = grouped_quantiles(slim, group_col, value_col, (q_lo, q_hi)).materialize()

    def _stats_frame(g: pd.Series, v: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> pd.DataFrame:
        clamped = np.minimum(np.maximum(v, lo), hi)
        return pd.DataFrame(
            {
                "g": g,
                "n": np.ones(len(v), np.int64),
                "n_lo_clamped": (v < lo).astype(np.int64),
                "n_hi_clamped": (v > hi).astype(np.int64),
                "lo": lo,
                "hi": hi,
                "winsorized_sum": clamped,
            }
        )

    def _sum_partials(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("g", sort=False, as_index=False).agg(
            n=("n", "sum"),
            n_lo_clamped=("n_lo_clamped", "sum"),
            n_hi_clamped=("n_hi_clamped", "sum"),
            lo=("lo", "first"),
            hi=("hi", "first"),
            winsorized_sum=("winsorized_sum", "sum"),
        )
        return agg

    if bounds.count() <= 2 * driver_max_groups:
        bdf = bounds.to_pandas()
        lo_map = dict(
            zip(bdf.loc[bdf["q"] == q_lo, group_col], bdf.loc[bdf["q"] == q_lo, "value"].astype(int))
        )
        hi_map = dict(
            zip(bdf.loc[bdf["q"] == q_hi, group_col], bdf.loc[bdf["q"] == q_hi, "value"].astype(int))
        )
        bounds_ref = ray.put((lo_map, hi_map))

        class _Clamp:
            def __init__(self, ref):
                self._lo, self._hi = ray.get(ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                if len(batch) == 0:
                    return _stats_frame(
                        pd.Series([], dtype=object),
                        np.array([], np.int64),
                        np.array([], np.int64),
                        np.array([], np.int64),
                    )
                v = batch[value_col].to_numpy(np.int64)
                lo = batch[group_col].map(self._lo).to_numpy(np.int64)
                hi = batch[group_col].map(self._hi).to_numpy(np.int64)
                return _sum_partials(_stats_frame(batch[group_col], v, lo, hi))

        tagged = slim.map_batches(
            _Clamp,
            fn_constructor_kwargs={"ref": bounds_ref},
            batch_format="pandas",
            batch_size=None,
            concurrency=(1, 8),
        )
    else:
        wide = bounds.map_batches(
            lambda b: pd.DataFrame(
                {
                    "g": b[group_col],
                    "lo": np.where(b["q"].to_numpy() == q_lo, b["value"], np.int64(np.iinfo(np.int64).min)),
                    "hi": np.where(b["q"].to_numpy() == q_hi, b["value"], np.int64(np.iinfo(np.int64).max)),
                }
            )
            if len(b)
            else pd.DataFrame(
                {
                    "g": pd.Series([], dtype=object),
                    "lo": pd.Series([], dtype="int64"),
                    "hi": pd.Series([], dtype="int64"),
                }
            ),
            batch_format="pandas",
        )
        bounds_wide = _br(
            wide,
            ["g"],
            lambda g: g.groupby("g", sort=False, as_index=False).agg(
                lo=("lo", "max"), hi=("hi", "min")
            ),
            pa.schema([("g", pa.string()), ("lo", pa.int64()), ("hi", pa.int64())]),
            combiner=lambda b: b.groupby("g", sort=False, as_index=False).agg(
                lo=("lo", "max"), hi=("hi", "min")
            ),
            num_buckets=num_buckets,
        )
        renamed = slim.map_batches(
            lambda b: pd.DataFrame(
                {"g": b[group_col], "v": b[value_col].to_numpy(np.int64)}
            )
            if len(b)
            else pd.DataFrame(
                {"g": pd.Series([], dtype=object), "v": pd.Series([], dtype="int64")}
            ),
            batch_format="pandas",
        )
        joined = cogroup_join(
            renamed,
            bounds_wide,
            ["g"],
            num_buckets=num_buckets,
            left_schema=pa.schema([("g", pa.string()), ("v", pa.int64())]),
            right_schema=pa.schema(
                [("g", pa.string()), ("lo", pa.int64()), ("hi", pa.int64())]
            ),
        )
        tagged = joined.map_batches(
            lambda b: _sum_partials(
                _stats_frame(
                    b["g"],
                    b["v"].to_numpy(np.int64),
                    b["lo"].to_numpy(np.int64),
                    b["hi"].to_numpy(np.int64),
                )
            )
            if len(b)
            else _stats_frame(
                pd.Series([], dtype=object),
                np.array([], np.int64),
                np.array([], np.int64),
                np.array([], np.int64),
            ),
            batch_format="pandas",
            batch_size=None,
        )

    final = _br(
        tagged,
        ["g"],
        _sum_partials,
        pa.schema([("g", pa.string())] + WINSOR_SCHEMA_VALUE_COLS),
        combiner=_sum_partials,
        num_buckets=num_buckets,
    )
    return normalize_blocks(final, pa.schema([("g", pa.string())] + WINSOR_SCHEMA_VALUE_COLS)).rename_columns(
        {"g": group_col}
    )


WQ_SCHEMA = pa.schema([("q_milli", pa.int64()), ("value", pa.int64())])


def weighted_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    weight_col: str,
    qs_milli: tuple[int, ...] = (250, 500, 750),
    *,
    driver_max_distinct: int = DRIVER_MAX_DISTINCT,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact WEIGHTED discrete quantiles: the smallest ``value`` whose
    cumulative weight (in ascending value order) satisfies
    ``cum * 1000 >= q_milli * total_weight`` — e.g. "the document
    length below which half the TOKEN MASS lies", the curation signal
    unweighted medians misstate on long-tailed corpora. Pure integer
    comparisons, so a window-cumsum SQL twin hash-matches.

    One value-keyed bucketed sum collapses rows to the distinct-value
    weight histogram (map-side combiner; the shuffle carries partials,
    never rows); the histogram residue is count-gated at
    ``driver_max_distinct`` and the cumulative scan is a driver
    cumsum. A value domain that outgrows the gate should use
    :func:`approx_quantiles_hist`'s binned shape instead — this raises
    loudly rather than collecting unbounded."""
    from .infer import bucketed_reduce

    if not qs_milli or any(not (0 < q <= 1000) for q in qs_milli):
        raise ValueError("each q_milli must be in (0, 1000]")

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or value_col not in b.columns:
            return pd.DataFrame(
                {
                    value_col: pd.Series([], dtype="int64"),
                    "w": pd.Series([], dtype="int64"),
                }
            )
        if "w" in b.columns:
            g = b.groupby(value_col, as_index=False)["w"].sum()
        else:
            g = (
                b.assign(w=b[weight_col].astype("int64"))
                .groupby(value_col, as_index=False)["w"]
                .sum()
            )
        g[value_col] = g[value_col].astype("int64")
        g["w"] = g["w"].astype("int64")
        return g[[value_col, "w"]]

    hist_schema = pa.schema([(value_col, pa.int64()), ("w", pa.int64())])
    hist = bucketed_reduce(
        ds.select_columns([value_col, weight_col]),
        [value_col],
        _comb,
        hist_schema,
        combiner=_comb,
        num_buckets=num_buckets,
    ).materialize()
    n_distinct = hist.count()
    if n_distinct == 0:
        return ray.data.from_arrow(WQ_SCHEMA.empty_table())
    if n_distinct > driver_max_distinct:
        raise ValueError(
            f"weighted_quantiles: {n_distinct} distinct values exceed the "
            f"driver gate ({driver_max_distinct}); use approx_quantiles_hist"
        )
    df = hist.to_pandas().sort_values(value_col, kind="mergesort")
    cum = df["w"].cumsum().to_numpy("int64")
    total = int(cum[-1])
    vals = df[value_col].to_numpy("int64")
    out_q, out_v = [], []
    for q in qs_milli:
        idx = int(np.searchsorted(cum * 1000, q * total, side="left"))
        out_q.append(int(q))
        out_v.append(int(vals[min(idx, len(vals) - 1)]))
    return ray.data.from_arrow(
        pa.table({"q_milli": pa.array(out_q, pa.int64()),
                  "value": pa.array(out_v, pa.int64())})
    )
