"""RFM customer segmentation (recency / frequency / monetary).

The classic marketing-analytics segmentation: score every customer
1..n_bins on how recently they ordered, how often, and how much they
spent, then label them with the 3-digit segment string ("555" = best).
Two distributed shapes compose it:

1. per-customer metrics — ONE key-bucketed shuffle with a map-side
   combiner (each block pre-collapses to its distinct customers, so
   the shuffle moves O(customers-per-block) not O(orders)); money in
   integer cents (float sums never hash-match across engines).
2. per-metric scoring — rank-free integer binning off the same
   distinct-value histogram machinery as
   :func:`..quantiles.percentile_ranks`: ``le = rows with value <= v``
   (cumulative histogram, broadcast once, map-side searchsorted), and

       score = 1 + min(n_bins - 1, (n_bins * (le - 1)) // total)

   which is deterministic under ties (peers share a score) and
   SQL-exact: ``le`` is ``count(*) OVER (ORDER BY v)`` (RANGE frame
   includes peers). Float ntile()/cume_dist() would never hash-match.

The histogram residue is the DISTINCT value domain per metric
(count-gated, trips loudly — order DATES and order counts are tiny
domains; near-unique monetary values past the gate want coarser cents
bucketing first, same contract as percentile_ranks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .infer import bucketed_reduce
from .quantiles import value_histogram

RFM_SCHEMA = pa.schema(
    [
        ("o_custkey", pa.int64()),
        ("last_us", pa.int64()),
        ("n_orders", pa.int64()),
        ("monetary_cents", pa.int64()),
        ("r_score", pa.int64()),
        ("f_score", pa.int64()),
        ("m_score", pa.int64()),
        ("segment", pa.string()),
    ]
)

_METRIC_SCHEMA = pa.schema(
    [
        ("o_custkey", pa.int64()),
        ("last_us", pa.int64()),
        ("n_orders", pa.int64()),
        ("monetary_cents", pa.int64()),
    ]
)


def _empty_metrics() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "o_custkey": pd.Series([], dtype="int64"),
            "last_us": pd.Series([], dtype="int64"),
            "n_orders": pd.Series([], dtype="int64"),
            "monetary_cents": pd.Series([], dtype="int64"),
        }
    )


def customer_metrics(
    orders: ray.data.Dataset,
    *,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
) -> ray.data.Dataset:
    """``(o_custkey, last_us, n_orders, monetary_cents)`` — one
    customer-keyed bucketed reduce; map-side combiner collapses each
    block to per-customer partials first."""

    def _combine(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or cust_col not in b.columns:
            return _empty_metrics()
        us = b[date_col].to_numpy("datetime64[us]").astype("int64")
        cents = np.round(b[price_col].to_numpy(np.float64) * 100.0).astype(np.int64)
        df = pd.DataFrame(
            {
                "o_custkey": b[cust_col].to_numpy(np.int64),
                "last_us": us,
                "n_orders": np.ones(len(b), np.int64),
                "monetary_cents": cents,
            }
        )
        return df.groupby("o_custkey", sort=False, as_index=False).agg(
            last_us=("last_us", "max"),
            n_orders=("n_orders", "sum"),
            monetary_cents=("monetary_cents", "sum"),
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_custkey", sort=False, as_index=False).agg(
            last_us=("last_us", "max"),
            n_orders=("n_orders", "sum"),
            monetary_cents=("monetary_cents", "sum"),
        )

    return bucketed_reduce(
        orders.select_columns([cust_col, date_col, price_col]),
        ["o_custkey"],
        _reduce,
        _METRIC_SCHEMA,
        combiner=_combine,
    )


def _add_score(
    metrics: ray.data.Dataset,
    col: str,
    out_col: str,
    *,
    n_bins: int,
    driver_max_values: int,
) -> ray.data.Dataset:
    hist = value_histogram(metrics, col).to_pandas()
    if len(hist) > driver_max_values:
        raise ValueError(
            f"rfm_segments: {len(hist)} distinct {col} values exceed the "
            f"gate ({driver_max_values}); bucket the metric first"
        )
    hist = hist.sort_values("v", kind="stable")
    values = hist["v"].to_numpy(np.int64)
    cum = hist["cnt"].to_numpy(np.int64).cumsum()
    total = int(cum[-1]) if len(cum) else 0
    ref = ray.put({"values": values, "cum": cum, "total": total})

    def _apply(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if len(b) == 0:
            b[out_col] = pd.Series([], dtype="int64")
            return b
        t = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        v = b[col].to_numpy(np.int64)
        idx = np.searchsorted(t["values"], v, side="right") - 1
        le = np.where(idx >= 0, t["cum"][np.clip(idx, 0, None)], 1)
        score = 1 + np.minimum(n_bins - 1, (n_bins * (le - 1)) // max(t["total"], 1))
        b[out_col] = score.astype(np.int64)
        return b

    return metrics.map_batches(_apply, batch_format="pandas")


def rfm_segments(
    orders: ray.data.Dataset,
    *,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
    n_bins: int = 5,
    driver_max_values: int = 2_000_000,
) -> ray.data.Dataset:
    """Per-customer RFM scores and segment label. ``last_us`` ranks
    ascending (later = better), as do ``n_orders`` and
    ``monetary_cents`` — score ``n_bins`` is always the "best" bin."""
    metrics = customer_metrics(
        orders, cust_col=cust_col, date_col=date_col, price_col=price_col
    ).materialize()  # three histogram passes below re-read it
    scored = _add_score(
        metrics, "last_us", "r_score", n_bins=n_bins, driver_max_values=driver_max_values
    )
    scored = _add_score(
        scored, "n_orders", "f_score", n_bins=n_bins, driver_max_values=driver_max_values
    )
    scored = _add_score(
        scored,
        "monetary_cents",
        "m_score",
        n_bins=n_bins,
        driver_max_values=driver_max_values,
    )

    def _label(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if len(b) == 0:
            b["segment"] = pd.Series([], dtype="object")
            return b
        b["segment"] = (
            b["r_score"].astype(str) + b["f_score"].astype(str) + b["m_score"].astype(str)
        )
        return b

    out = scored.map_batches(_label, batch_format="pandas")
    return out.select_columns(
        [
            "o_custkey",
            "last_us",
            "n_orders",
            "monetary_cents",
            "r_score",
            "f_score",
            "m_score",
            "segment",
        ]
    )
