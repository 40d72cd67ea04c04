"""Metadata-clean Parquet reads.

pyarrow 16's ``pa.Schema.__hash__`` raises ``unhashable type: 'dict'``
when the schema carries key-value metadata (the ``pandas`` blob every
pandas-written file has). Ray Data hashes block schemas to deduplicate
them before unification, so every read of a pandas-written file spams
``Failed to hash the schemas (for deduplication)`` warnings from the
read workers. :func:`read_parquet_clean` strips the metadata by
passing an explicit bare ``schema=`` to ``read_parquet`` — same data,
hashable schema, silent logs. Files without metadata (anything Ray
itself wrote) pass through untouched.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _first_file(paths) -> str | None:
    p = paths[0] if isinstance(paths, (list, tuple)) else paths
    if not isinstance(p, str):
        return None
    if os.path.isdir(p):
        cands = sorted(
            f for f in os.listdir(p) if f.endswith(".parquet")
        )
        return os.path.join(p, cands[0]) if cands else None
    return p


def read_parquet_clean(paths, *, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with file-level key-value metadata
    stripped via an explicit ``schema=`` (see module docstring)."""
    if "schema" not in kwargs:
        try:
            p = _first_file(paths)
            if p is not None:
                sch = pq.read_schema(p)
                if sch.metadata or any(f.metadata for f in sch):
                    fields = [sch.field(i).remove_metadata() for i in range(len(sch))]
                    by_name = {f.name: f for f in fields}
                    if columns is not None:
                        fields = [by_name[c] for c in columns]
                    kwargs["schema"] = pa.schema(fields)
        except Exception:
            pass  # fall back to the plain read
    return ray.data.read_parquet(paths, columns=columns, **kwargs)
