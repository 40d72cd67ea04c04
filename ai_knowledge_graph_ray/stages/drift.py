"""Distribution-drift report between two corpus slices — the monitor
a continuously-ingesting training pipeline runs before accepting a
new crawl snapshot (did the length / language / quality mix shift?).

All-integer: per-bin per-mille rates and their absolute difference
(the L1 / total-variation drift, scaled by 1000) — float divergences
(PSI, KL) can never hash-match an oracle; the milli-L1 carries the
same signal and is SQL-exact.

One shared pass over each side (map-side bucket×side counts), one
bucketed sum keyed on the bin, rates finished vectorized inside the
reduce — the residue is the bin domain, never rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce, normalize_blocks

DRIFT_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("cnt_a", pa.int64()),
        ("cnt_b", pa.int64()),
        ("rate_a_milli", pa.int64()),
        ("rate_b_milli", pa.int64()),
        ("drift_milli", pa.int64()),
    ]
)


def histogram_drift(
    ds_a: ray.data.Dataset,
    ds_b: ray.data.Dataset,
    bucket_col: str,
    *,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-bin drift between two slices sharing an integer
    ``bucket_col``: counts, per-mille rates (floor of
    ``cnt * 1000 / side_total``) and ``drift_milli = |rate_a -
    rate_b|``. Bins missing on one side count 0 there."""
    cnt_schema = pa.schema(
        [("bucket", pa.int64()), ("side", pa.string()), ("c", pa.int64())]
    )

    def _comb(side: str):
        def _f(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0 or bucket_col not in b.columns:
                return pd.DataFrame(
                    {"bucket": pd.Series([], dtype="int64"),
                     "side": pd.Series([], dtype="object"),
                     "c": pd.Series([], dtype="int64")}
                )
            vc = b[bucket_col].value_counts()
            return pd.DataFrame(
                {"bucket": vc.index.to_numpy(np.int64), "side": side,
                 "c": vc.to_numpy(np.int64)}
            )

        return _f

    tagged = (
        ds_a.select_columns([bucket_col])
        .map_batches(_comb("a"), batch_format="pandas", batch_size=None)
        .union(
            ds_b.select_columns([bucket_col]).map_batches(
                _comb("b"), batch_format="pandas", batch_size=None
            )
        )
    )

    counts = bucketed_reduce(
        tagged,
        ["bucket", "side"],
        lambda g: g.groupby(["bucket", "side"], sort=False, as_index=False)["c"].sum(),
        cnt_schema,
        num_buckets=num_buckets,
    ).materialize()

    # side totals: tiny driver sum over the per-(bin, side) residue
    tot = counts.to_pandas()
    if "side" not in tot.columns:
        tot = pd.DataFrame({"bucket": [], "side": [], "c": []})
    n_a = int(tot.loc[tot["side"] == "a", "c"].sum())
    n_b = int(tot.loc[tot["side"] == "b", "c"].sum())

    def _finish(g: pd.DataFrame) -> pd.DataFrame:
        w = g.pivot_table(index="bucket", columns="side", values="c",
                          aggfunc="sum", fill_value=0)
        a = w["a"].to_numpy(np.int64) if "a" in w.columns else np.zeros(len(w), np.int64)
        b = w["b"].to_numpy(np.int64) if "b" in w.columns else np.zeros(len(w), np.int64)
        ra = a * 1000 // max(1, n_a)
        rb = b * 1000 // max(1, n_b)
        return pd.DataFrame(
            {
                "bucket": w.index.to_numpy(np.int64),
                "cnt_a": a,
                "cnt_b": b,
                "rate_a_milli": ra,
                "rate_b_milli": rb,
                "drift_milli": np.abs(ra - rb),
            }
        )

    return normalize_blocks(
        bucketed_reduce(counts, ["bucket"], _finish, DRIFT_SCHEMA,
                        num_buckets=num_buckets),
        DRIFT_SCHEMA,
    )


def cusum_changepoints(
    ds: ray.data.Dataset,
    key_col: str,
    bucket_col: str,
    *,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-key CUSUM level-shift scan over integer time buckets — the
    changepoint monitor a crawl-ingest pipeline runs per source/type
    ("did this feed's hourly volume step up, and when?").

    For each key, with per-bucket counts ``x_t`` (t = sorted distinct
    ``bucket_col`` values), n buckets and total S, the mean-centered
    deviation ``d_t = x_t * n - S`` (scaled by n — no division, so the
    arithmetic is exact integers and sums to 0), prefix sums ``P_t``,
    and the one-sided CUSUM drawup ``D_t = P_t - min_{j<=t} P_j``.
    Emits ``(key, cusum_max, change_bucket)`` where ``cusum_max =
    max_t D_t`` and ``change_bucket`` is the FIRST bucket achieving
    it. The ``P - running-min`` identity makes the recursive
    ``max(0, prev + d)`` form window-expressible, so an exact SQL twin
    exists (float CUSUM with a divided mean could never hash-match).

    ONE exchange: the map-side combiner collapses each block to
    (key, bucket, partial count); the key-bucketed reduce re-sums and
    runs the vectorized grouped cumsum/cummin scan. The shuffle never
    carries raw rows, only per-block bucket partials; the per-key
    residue is its distinct-bucket count (bounded by the time range),
    never its row count.
    """
    cnt_schema = pa.schema(
        [(key_col, pa.string()), (bucket_col, pa.int64()), ("c", pa.int64())]
    )
    out_schema = pa.schema(
        [
            (key_col, pa.string()),
            ("cusum_max", pa.int64()),
            ("change_bucket", pa.int64()),
        ]
    )

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or key_col not in b.columns:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype="object"),
                    bucket_col: pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        if "c" in b.columns:  # already partial counts (combiner re-entry)
            g = b.groupby([key_col, bucket_col], as_index=False)["c"].sum()
        else:
            g = b.groupby([key_col, bucket_col], as_index=False).agg(
                c=(bucket_col, "size")
            )
        g[bucket_col] = g[bucket_col].astype("int64")
        g["c"] = g["c"].astype("int64")
        return g[[key_col, bucket_col, "c"]]

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby([key_col, bucket_col], as_index=False)["c"]
            .sum()
            .sort_values([key_col, bucket_col], kind="mergesort")
            .reset_index(drop=True)
        )
        keys = agg[key_col]
        n = agg.groupby(key_col)[bucket_col].transform("size").astype("int64")
        s = agg.groupby(key_col)["c"].transform("sum").astype("int64")
        dev = agg["c"].astype("int64") * n - s
        pf = dev.groupby(keys).cumsum()
        drawup = pf - pf.groupby(keys).cummin()
        mx = drawup.groupby(keys).transform("max")
        hits = agg.loc[drawup == mx, [key_col, bucket_col]]
        first = hits.groupby(key_col, as_index=False).agg(
            change_bucket=(bucket_col, "min")
        )
        mxs = pd.DataFrame({key_col: keys, "cusum_max": mx}).drop_duplicates(key_col)
        out = mxs.merge(first, on=key_col)
        out["cusum_max"] = out["cusum_max"].astype("int64")
        out["change_bucket"] = out["change_bucket"].astype("int64")
        return out[[key_col, "cusum_max", "change_bucket"]]

    counted = ds.select_columns([key_col, bucket_col])
    return bucketed_reduce(
        counted, [key_col], _reduce, out_schema,
        combiner=_comb, num_buckets=num_buckets,
    )


def autocorr_sums(
    ds: ray.data.Dataset,
    key_col: str,
    bucket_col: str,
    *,
    lags: tuple[int, ...] = (1, 2, 3),
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-key lagged-autocovariance sufficient statistics over an
    integer time-bucket series — the seasonality/burstiness probe a
    feed monitor runs per source ("is this crawl's hourly volume
    self-similar at lag 1/2/3, or a burst?").

    For each key, with per-bucket counts ``x_b`` zero-filled over the
    key's own ``[min_b, max_b]`` span, emits one row
    ``(key, span, total, sum_sq, dot_1..dot_k)`` where ``span =
    max_b - min_b + 1``, ``total = sum x_b``, ``sum_sq = sum x_b**2``
    and ``dot_k = sum_b x_b * x_{b+k}``. All BIGINT, so the ACF
    ``r_k = (n*dot_k - total^2) / (n*sum_sq - total^2)`` is derivable
    exactly downstream; a float ACF could never hash-match the oracle.

    Zero-filling is implicit: a missing bucket contributes 0 to every
    sum, so ``dot_k`` is just the sum over bucket pairs exactly ``k``
    apart with BOTH present — one vectorized self-merge per lag inside
    the reduce, no materialized spine. ONE exchange: map-side combiner
    collapses blocks to (key, bucket, partial count); the residue per
    key is its distinct-bucket count (bounded by the covered time
    range), never its row count.
    """
    out_fields = [
        (key_col, pa.string()),
        ("span", pa.int64()),
        ("total", pa.int64()),
        ("sum_sq", pa.int64()),
    ] + [(f"dot_{k}", pa.int64()) for k in lags]
    out_schema = pa.schema(out_fields)

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or key_col not in b.columns:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype="object"),
                    bucket_col: pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        if "c" in b.columns:
            g = b.groupby([key_col, bucket_col], as_index=False)["c"].sum()
        else:
            g = b.groupby([key_col, bucket_col], as_index=False).agg(
                c=(bucket_col, "size")
            )
        g[bucket_col] = g[bucket_col].astype("int64")
        g["c"] = g["c"].astype("int64")
        return g[[key_col, bucket_col, "c"]]

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby([key_col, bucket_col], as_index=False)["c"].sum()
        agg["c"] = agg["c"].astype("int64")
        base = agg.groupby(key_col).agg(
            lo=(bucket_col, "min"),
            hi=(bucket_col, "max"),
            total=("c", "sum"),
        )
        base["span"] = base["hi"] - base["lo"] + 1
        base["sum_sq"] = (agg["c"] * agg["c"]).groupby(agg[key_col].values).sum()
        out = base.reset_index()[[key_col, "span", "total", "sum_sq"]]
        for k in lags:
            shifted = agg.assign(__bj=agg[bucket_col] - int(k))
            m = agg.merge(
                shifted,
                left_on=[key_col, bucket_col],
                right_on=[key_col, "__bj"],
                suffixes=("", "_r"),
            )
            dot = (
                (m["c"] * m["c_r"]).groupby(m[key_col].values).sum()
                if len(m)
                else pd.Series(dtype="int64")
            )
            out[f"dot_{k}"] = (
                out[key_col].map(dot).fillna(0).astype("int64")
            )
        for c in ("span", "total", "sum_sq"):
            out[c] = out[c].astype("int64")
        return out

    counted = ds.select_columns([key_col, bucket_col])
    return bucketed_reduce(
        counted, [key_col], _reduce, out_schema,
        combiner=_comb, num_buckets=num_buckets,
    )


def crosscorr_sums(
    ds: ray.data.Dataset,
    bucket_col: str,
    type_col: str,
    type_a: str,
    type_b: str,
    *,
    lags: tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6),
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Lagged cross-correlation sufficient sums between two series
    sharing an integer time bucket: for each lag k, ``vc_sum = sum_t
    a(t) * b(t+k)`` and ``n_hours`` = the number of (t, t+k) bucket
    pairs where BOTH buckets saw >= 1 event of either type (the "does
    type_b follow type_a?" lead-lag probe). All BIGINT — a float
    correlation could never hash-match the oracle; the exact r_k is
    derivable downstream from these sums.

    Two-level: a bucketed per-hour count reduce (distributed — the
    raw event volume never converges), then one single-bucket reduce
    over the per-hour residue, which is bounded by the covered TIME
    SPAN, not by row count (same residue argument as
    :func:`autocorr_sums` / the sweep-line concurrency op).
    """
    def _per_hour_comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or bucket_col not in b.columns:
            return pd.DataFrame(
                {
                    bucket_col: pd.Series(dtype="int64"),
                    "va": pd.Series(dtype="int64"),
                    "vb": pd.Series(dtype="int64"),
                }
            )
        if "va" in b.columns:
            g = b.groupby(bucket_col, as_index=False)[["va", "vb"]].sum()
        else:
            b = b[b[type_col].isin([type_a, type_b])]
            g = pd.DataFrame(
                {
                    bucket_col: b[bucket_col].to_numpy(),
                    "va": (b[type_col] == type_a).astype("int64").to_numpy(),
                    "vb": (b[type_col] == type_b).astype("int64").to_numpy(),
                }
            ).groupby(bucket_col, as_index=False).sum()
        for c in (bucket_col, "va", "vb"):
            g[c] = g[c].astype("int64")
        return g

    hour_schema = pa.schema(
        [
            pa.field(bucket_col, pa.int64()),
            pa.field("va", pa.int64()),
            pa.field("vb", pa.int64()),
        ]
    )
    hourly = bucketed_reduce(
        ds.select_columns([bucket_col, type_col]),
        [bucket_col],
        _per_hour_comb,
        hour_schema,
        combiner=_per_hour_comb,
        num_buckets=num_buckets,
    ).materialize()  # bounded by covered time span, not row count

    if hourly.count() == 0:
        # empty slice: match the SQL twin's shape — one zero row per lag
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "lag": np.asarray(lags, dtype=np.int64),
                    "vc_sum": np.zeros(len(lags), dtype=np.int64),
                    "n_hours": np.zeros(len(lags), dtype=np.int64),
                }
            )
        )

    out_schema = pa.schema(
        [
            pa.field("lag", pa.int64()),
            pa.field("vc_sum", pa.int64()),
            pa.field("n_hours", pa.int64()),
        ]
    )

    def _const(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__one"] = np.zeros(len(b), dtype=np.int64)
        return b

    def _corr(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby(bucket_col, as_index=False)[["va", "vb"]].sum()
        rows = []
        for k in lags:
            shifted = h.assign(__t=h[bucket_col] - int(k))
            m = h.merge(shifted, left_on=bucket_col, right_on="__t",
                        suffixes=("", "_r"))
            rows.append(
                (
                    int(k),
                    int((m["va"] * m["vb_r"]).sum()),
                    int(len(m)),
                )
            )
        return pd.DataFrame(rows, columns=["lag", "vc_sum", "n_hours"])

    return bucketed_reduce(
        hourly.map_batches(_const, batch_format="pandas"),
        ["__one"],
        lambda g: _corr(g.drop(columns="__one")),
        out_schema,
        num_buckets=1,
    )
