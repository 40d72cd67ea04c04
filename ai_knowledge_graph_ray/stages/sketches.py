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


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting for small range
    return float(est)


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
        row["approx_distinct"] = int(round(_estimate(merged)))
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
