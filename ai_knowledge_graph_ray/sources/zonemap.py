"""Zone-map clustered Parquet layout: sort-clustered write + a reader
that prunes whole files by min/max footer statistics.

The IVF index (``stages/similarity.py``) prunes by centroid
partition; this is the general-purpose version for ANY orderable
column (ship date, z-order key, token count): cluster the table on
the column once (the single all-to-all this layout costs), then every
range scan opens only the files whose ``[min, max]`` interval
intersects the predicate. At 100 TB the zone map (two values per
file) is the only thing the planner reads — the map lives in one
JSON sidecar built from Parquet footer statistics, never from data
pages.

Writes are atomic: data lands in a temp dir and ``os.replace`` moves
it into place with the manifest written last, so a crashed build is
invisible to readers (the stale-/tmp-index hazard ADVICE.md flagged
on the IVF cache).

No counterpart in the reference (whole-file scans only).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

MANIFEST = "zonemap.json"


def write_clustered(
    ds: ray.data.Dataset,
    col: str,
    out_dir: str,
    *,
    num_files: int | None = None,
) -> dict:
    """Sort ``ds`` by ``col``, write Parquet into ``out_dir`` (atomic
    replace), and return the zone map ``{file: [min, max]}`` (also
    persisted as ``zonemap.json``). ``num_files`` controls layout
    granularity (defaults to the dataset's block count)."""
    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".zonemap_build_", dir=parent)
    try:
        s = ds.sort(col)
        if num_files:
            s = s.repartition(num_files)
        s.write_parquet(tmp)
        zones: dict[str, list] = {}
        for name in sorted(os.listdir(tmp)):
            if not name.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(tmp, name))
            idx = md.schema.to_arrow_schema().get_field_index(col)
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(f"no min/max stats for {col} in {name}")
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                zones[name] = [lo, hi]
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump({"col": col, "zones": zones}, f)
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.replace(tmp, out_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return zones


def read_pruned(
    out_dir: str,
    lo,
    hi,
    *,
    columns: list[str] | None = None,
) -> tuple[ray.data.Dataset, float]:
    """Range scan ``col in [lo, hi]`` over a clustered layout: open
    only files whose zone intersects, then apply the exact residual
    filter. Returns ``(dataset, scan_fraction)`` — the fraction of
    files opened, the number a caller asserts pruning on."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        man = json.load(f)
    col, zones = man["col"], man["zones"]
    hit = [
        os.path.join(out_dir, name)
        for name, (zlo, zhi) in sorted(zones.items())
        if not (zhi < lo or zlo > hi)
    ]
    frac = len(hit) / max(1, len(zones))
    if not hit:
        return ray.data.from_arrow(pa.table({col: []})), 0.0
    if columns is not None and col not in columns:
        raise ValueError(f"columns must include the zone column {col!r}")
    ds = ray.data.read_parquet(hit, columns=columns)
    import pyarrow.compute as pc

    def _residual(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b[col], pa.scalar(lo)),
            pc.less_equal(b[col], pa.scalar(hi)),
        )
        return b.filter(m)

    return ds.map_batches(_residual, batch_format="pyarrow"), frac
