"""Columnar JSON field extraction over string-typed JSON columns.

The reference's JSON handling is driver-side LLM-output repair
(``llm.py:63-163`` -> ``functions/jsonx.py``); real event tables carry
per-row JSON property blobs (the fixture ``events.props`` column).
This is the batch counterpart: pull one scalar field out of millions
of JSON strings without a Python loop in the hot path.

Two-tier kernel per batch:

1. vectorized regex fast path for the overwhelmingly common flat case
   (``"field": <int>`` with no string containing the same pattern
   earlier in the blob — guarded below);
2. ``json.loads`` fallback ONLY for rows the fast path cannot prove
   safe (regex miss, nested braces, a quote before the match). The
   fallback preserves exact JSON semantics; the fast path is an
   optimization, not a dialect.

Output column semantics match DuckDB ``json_extract`` + BIGINT cast
(missing field / invalid JSON / non-integer value -> NULL), so the
result is SQL-oracle-exact.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import ray.data


def json_field_int(
    ds: ray.data.Dataset,
    json_col: str,
    field: str,
    *,
    out_col: str | None = None,
) -> ray.data.Dataset:
    """Append ``out_col`` (default ``field``): the top-level integer
    ``field`` of the JSON object in ``json_col``, nullable int64."""
    out = out_col or field
    # fast path: object is flat (single {...}, no nested braces, no
    # backslash escapes) AND the field appears exactly once
    flat_re = re.compile(r"^\s*\{[^{}\\]*\}\s*$")
    pat = re.compile(r'"' + re.escape(field) + r'"\s*:\s*(-?\d+)(?=\s*[,}])')

    def _slow(s: str | None):
        if s is None:
            return None
        try:
            obj = json.loads(s)
        except (ValueError, TypeError):
            return None
        v = obj.get(field) if isinstance(obj, dict) else None
        # bool is an int subclass; JSON true/false are not integers here
        return int(v) if isinstance(v, int) and not isinstance(v, bool) else None

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        s = batch[json_col]
        filled = s.fillna("")
        is_flat = filled.str.match(flat_re)
        hits = filled.str.extract(pat, expand=False)
        n_hits = filled.str.count(pat)
        fast = (is_flat & hits.notna() & (n_hits == 1)).to_numpy()
        vals = pd.to_numeric(hits, errors="coerce").astype("Int64").where(fast)
        slow_idx = np.flatnonzero(~fast)
        if len(slow_idx):
            vals.iloc[slow_idx] = pd.array(
                [_slow(x) for x in s.iloc[slow_idx]], dtype="Int64"
            )
        out_df = batch.copy()
        out_df[out] = vals
        return out_df

    return ds.map_batches(_f, batch_format="pandas")
