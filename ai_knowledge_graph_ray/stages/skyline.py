"""2-D skyline (Pareto frontier) over a Dataset.

"Best trade-off" queries — e.g. the orders that are not beaten on BOTH
price and recency by any other order — are a standard analytics
operator (Börzsönyi et al., "The Skyline Operator", ICDE 2001 —
public) that Ray Data has no primitive for. The 2-D case admits a
fully deterministic, shuffle-free plan because the skyline operator is
idempotent and associative over unions:

    skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B))

so each block reduces to its LOCAL frontier (vectorized sort + running
min — no quadratic dominance test), and one final pass over the
concatenated local frontiers (a single small block; the global
frontier of real distributions is tiny relative to the input) yields
the exact global frontier.

Dominance (maximize ``max_col``, minimize ``min_col``): row r is
dominated iff some row s has ``s.max >= r.max AND s.min <= r.min``
with at least one strict. ALL non-dominated rows are kept — ties on
both dimensions keep every tied row, which makes the result
deterministic and lets a DuckDB window oracle reproduce it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import normalize_blocks


def _local_skyline(df: pd.DataFrame, max_col: str, min_col: str) -> pd.DataFrame:
    """Exact skyline of one in-memory frame, vectorized."""
    if len(df) == 0:
        return df
    # best (minimum) min_col per max_col value
    gmin = df.groupby(max_col)[min_col].transform("min")
    cand = df[df[min_col] == gmin]
    # per distinct max_col (desc): keep where min_col beats every
    # higher max_col's best — a running min over the sorted uniques
    per = (
        cand.groupby(max_col, as_index=False)[min_col]
        .min()
        .sort_values(max_col, ascending=False, kind="stable")
    )
    md = per[min_col].to_numpy()
    prev_best = np.empty(len(md), dtype=md.dtype)
    if len(md):
        prev_best[0] = np.iinfo(np.int64).max
        np.minimum.accumulate(md[:-1], out=prev_best[1:])
    keep_max = per[max_col].to_numpy()[md < prev_best]
    return cand[cand[max_col].isin(keep_max)]


def pareto_front(
    ds: ray.data.Dataset,
    *,
    max_col: str,
    min_col: str,
    schema: pa.Schema,
) -> ray.data.Dataset:
    """Global skyline maximizing ``max_col`` and minimizing
    ``min_col`` (both int64). ``schema`` fixes the output columns
    (payload columns ride along unchanged)."""

    def _local(b: pd.DataFrame) -> pd.DataFrame:
        return _local_skyline(b, max_col, min_col)

    local = ds.map_batches(_local, batch_format="pandas", batch_size=None)
    # final pass: local frontiers concatenated into one block — the
    # global frontier is the skyline of this (small) union
    merged = local.repartition(1).map_batches(
        _local, batch_format="pandas", batch_size=None
    )
    return normalize_blocks(merged, schema)
