"""Grouped exact least-squares trend (integer-rational OLS slope).

Per-group linear trend ("is revenue drifting up?") is a one-pass
aggregation: the OLS slope over points (x, y) is

    slope = (n*Σxy − Σx*Σy) / (n*Σx² − (Σx)²)

All five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are map-side
int64 partial sums (exact — per-BATCH sums stay far below 2^63 for
day-scale x and cent-scale y), combined per group in ONE bucketed
exchange. The final per-group arithmetic runs on the tiny reduced
residue in arbitrary-precision PYTHON ints (the cross terms n*Σxy can
exceed int64 at 100-TB group sizes; the residue is groups×1 rows so
object-dtype math is free), and the slope is reported as a TRUNCATED
integer ``slope_micro = (num * 10^6) trunc/ den`` — bit-identical to
DuckDB HUGEINT arithmetic (`//` on HUGEINT truncates toward zero),
so the oracle hash-matches where a float slope never could.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce


def _trunc_div(num: int, den: int) -> int:
    """C-style truncating integer division (DuckDB ``//`` semantics;
    Python ``//`` floors, which differs for negative results)."""
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den >= 0) else -q


def grouped_ols_slope(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    *,
    group_type: pa.DataType = pa.string(),
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """``(group_col, n, slope_micro)`` per group — exact integer OLS.

    ``x_col``/``y_col`` must be int64 (integerize first: epoch days,
    cents). Groups with a degenerate denominator (all x equal, or
    n < 2) are emitted with ``slope_micro`` NULL.
    """
    out_schema = pa.schema(
        [(group_col, group_type), ("n", pa.int64()), ("slope_micro", pa.int64())]
    )
    part_cols = ["n", "sx", "sy", "sxy", "sxx"]

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {group_col: pd.Series(dtype=object)}
                | {c: pd.Series(dtype="int64") for c in part_cols}
            )
        x = b[x_col].to_numpy(np.int64)
        y = b[y_col].to_numpy(np.int64)
        t = pd.DataFrame(
            {
                group_col: b[group_col],
                "n": np.ones(len(b), np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        return t.groupby(group_col, sort=False, as_index=False).sum()

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        # object dtype -> Python-int (arbitrary precision) sums
        agg = (
            g.assign(**{c: g[c].astype(object) for c in part_cols})
            .groupby(group_col, sort=False, as_index=False)[part_cols]
            .sum()
        )
        slopes = []
        for n, sx, sy, sxy, sxx in zip(
            agg["n"], agg["sx"], agg["sy"], agg["sxy"], agg["sxx"]
        ):
            num = int(n) * int(sxy) - int(sx) * int(sy)
            den = int(n) * int(sxx) - int(sx) * int(sx)
            slopes.append(None if den == 0 else _trunc_div(num * scale, den))
        return pd.DataFrame(
            {
                group_col: agg[group_col],
                "n": agg["n"].astype("int64"),
                "slope_micro": pd.array(slopes, dtype="Int64"),
            }
        )

    return bucketed_reduce(
        ds.select_columns([group_col, x_col, y_col]),
        [group_col],
        _reduce,
        out_schema,
        combiner=_partial,
    )
