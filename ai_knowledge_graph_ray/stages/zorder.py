"""Z-order (Morton) keys — multi-dimensional physical layout.

At 100 TB the cheapest query is the one that never reads a block: a
corpus laid out by a space-filling curve over two correlated filter
dimensions (user × time, domain × length, lat × lon) lets a 2-D range
predicate touch O(perimeter) contiguous key ranges instead of every
partition. ``zorder_key`` is the map-only key computation (integer
quantization + bit interleave, all numpy bit ops — one pass, no
shuffle); ``zorder_layout`` sorts by the key, which is the one
all-to-all this operator ever pays, and is exactly the exchange a
``repartition`` by any OTHER single column would also pay.

SQL twin: the identical quantize-and-interleave expression unrolled
over bit positions (the query module builds it from the SAME
constants, so stage and oracle cannot drift).

No counterpart in the reference (single-machine, whole-file scans).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ColSpec = tuple[str, int, int]  # (column, lo, hi) — inclusive clip bounds


def _quantize(v: np.ndarray, lo: int, hi: int, bits: int) -> np.ndarray:
    """Clip to [lo, hi] and scale to [0, 2**bits - 1] in pure int64
    arithmetic (floor division — replicated by the SQL twin)."""
    v = np.clip(v.astype(np.int64), lo, hi)
    return (v - lo) * ((1 << bits) - 1) // (hi - lo)


def zorder_key(
    ds: ray.data.Dataset,
    specs: list[ColSpec],
    *,
    bits: int = 16,
    out_col: str = "zvalue",
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Append ``out_col``: the Morton interleave of the quantized
    ``specs`` columns (2 dims × ``bits`` bits → a ``2*bits``-bit
    int64 key). Map-only."""
    if len(specs) != 2:
        raise ValueError("zorder_key supports exactly 2 dimensions")
    if bits * len(specs) > 62:
        raise ValueError("bits too large for an int64 key")
    keep = keep_cols or []
    in_cols = sorted({c for c, _, _ in specs} | set(keep))

    def _z(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=b.index)
        for c in keep:
            out[c] = b[c] if c in b.columns else pd.Series([], dtype="object")
        if len(b) == 0:
            out[out_col] = pd.Series([], dtype="int64")
            return out
        (cx, lox, hix), (cy, loy, hiy) = specs
        nx = _quantize(b[cx].to_numpy(), lox, hix, bits)
        ny = _quantize(b[cy].to_numpy(), loy, hiy, bits)
        z = np.zeros(len(b), dtype=np.int64)
        for i in range(bits):
            z |= ((nx >> i) & 1) << (2 * i + 1)
            z |= ((ny >> i) & 1) << (2 * i)
        out[out_col] = z
        return out

    return ds.select_columns(in_cols).map_batches(
        _z, batch_format="pandas", batch_size=None
    )


def zorder_sql_expr(x_expr: str, y_expr: str, specs_bounds: list[tuple[int, int]],
                    bits: int = 16) -> str:
    """The DuckDB expression computing the identical key — built from
    the same quantization rule so the oracle cannot drift."""
    (lox, hix), (loy, hiy) = specs_bounds
    m = (1 << bits) - 1
    nx = f"(((least(greatest(CAST({x_expr} AS BIGINT), {lox}), {hix}) - {lox}) * {m}) // {hix - lox})"
    ny = f"(((least(greatest(CAST({y_expr} AS BIGINT), {loy}), {hiy}) - {loy}) * {m}) // {hiy - loy})"
    terms = []
    for i in range(bits):
        terms.append(f"((({nx} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({ny} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    ds: ray.data.Dataset,
    specs: list[ColSpec],
    *,
    bits: int = 16,
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Sort by the Morton key — the clustered physical layout. The
    sort is the single all-to-all; downstream ``write_parquet`` emits
    contiguous z-ranges per file, so a 2-D range filter prunes to the
    few files whose [min(z), max(z)] intervals the query box's z
    ranges intersect."""
    return zorder_key(ds, specs, bits=bits, keep_cols=keep_cols).sort("zvalue")
