"""Partitioned, resumable Parquet output with a manifest.

Replaces the reference's chunk-granular full-JSON-rewrite checkpoint
(``main.py:119-171``: dump ALL triples every 10 chunks, resume from
``max(chunk)+1``) with the layout the north rule requires at 10^12-doc
scale:

- Output is partitioned by ``hash(key) % num_partitions`` — one
  directory per partition, written atomically (temp file + rename),
  each carrying lineage columns (``partition_id``, ``run_id``,
  ``stage``).
- ``_manifest.json`` records completed partitions (id, rows, path,
  run_id). A failed run leaves the manifest reflecting only completed
  partitions.
- Resume = anti-join the input against the done-partition set: filter
  input rows by partition id BEFORE any heavy work, so finished
  partitions cost nothing on rerun.

The manifest is maintained by the driver (a few bytes per partition);
partition writes happen inside workers via ``groupby(partition)``.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..stages.infer import pa_from_pandas

MANIFEST = "_manifest.json"


def partition_of(key: str, num_partitions: int) -> int:
    """Deterministic, process-independent partition id."""
    h = hashlib.md5(str(key).encode("utf-8")).digest()
    return int.from_bytes(h[:4], "big") % num_partitions


def partition_ids(keys, num_partitions: int):
    """Vectorized :func:`partition_of` over a key sequence — one
    ``np.fromiter`` over C md5 digests instead of a per-row Python
    function call (the digest IS the work; measured hot at 450M-row
    sink writes)."""
    import numpy as np

    md5 = hashlib.md5
    return (
        np.fromiter(
            (
                int.from_bytes(md5(str(k).encode("utf-8")).digest()[:4], "big")
                for k in keys
            ),
            dtype=np.int64,
            count=len(keys),
        )
        % num_partitions
    )


class PartitionedSink:
    """Hash-partitioned resumable Parquet sink."""

    def __init__(
        self,
        out_dir: str,
        num_partitions: int = 64,
        key_col: str = "url",
        run_id: str = "run",
    ) -> None:
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.key_col = key_col
        self.run_id = run_id
        os.makedirs(out_dir, exist_ok=True)

    # -- manifest ---------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.out_dir, MANIFEST)

    def done_partitions(self) -> dict[int, dict]:
        try:
            with open(self._manifest_path(), encoding="utf-8") as f:
                entries = json.load(f)
            return {int(e["partition_id"]): e for e in entries}
        except FileNotFoundError:
            return {}

    def _record(self, new_entries: list[dict]) -> None:
        done = self.done_partitions()
        for e in new_entries:
            done[int(e["partition_id"])] = e
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(sorted(done.values(), key=lambda e: e["partition_id"]), f, indent=1)
        os.replace(tmp, self._manifest_path())

    # -- pipeline hooks ---------------------------------------------------

    def filter_pending(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        """Drop rows whose partition is already in the manifest —
        applied at the READ so finished partitions skip all compute."""
        done = set(self.done_partitions())
        if not done:
            return ds
        key_col, P = self.key_col, self.num_partitions
        done_ref = ray.put(done)

        def _f(batch: pa.Table) -> pa.Table:
            import numpy as np

            d = ray.get(done_ref) if isinstance(done_ref, ray.ObjectRef) else done_ref
            pids = partition_ids(batch[key_col].to_pylist(), P)
            mask = ~np.isin(pids, np.fromiter(d, dtype=np.int64, count=len(d)))
            return batch.filter(pa.array(mask, pa.bool_()))

        return ds.map_batches(_f, batch_format="pyarrow")

    def write(self, ds: ray.data.Dataset, stage: str = "triples") -> list[dict]:
        """Write pending rows partition-by-partition (atomic rename),
        then extend the manifest. Returns the new manifest entries."""
        key_col, P = self.key_col, self.num_partitions
        out_dir, run_id = self.out_dir, self.run_id
        done = set(self.done_partitions())

        def _assign(batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                b = batch.copy()
                b["partition_id"] = pd.Series([], dtype="int64")
                return b
            b = batch.copy()
            b["partition_id"] = partition_ids(b[key_col].to_numpy(object), P)
            return b[~b["partition_id"].isin(done)] if done else b

        def _write_one(g: pd.DataFrame) -> dict:
            pid = int(g["partition_id"].iloc[0])
            part_dir = os.path.join(out_dir, f"part={pid:05d}")
            os.makedirs(part_dir, exist_ok=True)
            g = g.copy()
            g["run_id"] = run_id
            g["stage"] = stage
            final = os.path.join(part_dir, "data.parquet")
            fd, tmp = tempfile.mkstemp(dir=part_dir, suffix=".tmp")
            os.close(fd)
            pq.write_table(
                pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None),
                tmp,
            )
            os.replace(tmp, final)  # atomic publish
            return {"partition_id": pid, "rows": len(g), "path": final}

        def _write_bucket(b: pd.DataFrame) -> pd.DataFrame:
            # one bucket may carry several partition ids (hash-bucketed
            # reduce, NOT a global sort shuffle — NOTES.md edge 3);
            # each id's rows are complete within the bucket
            if len(b) == 0 or "partition_id" not in b.columns:
                return pd.DataFrame(
                    {
                        "partition_id": pd.Series(dtype="int64"),
                        "rows": pd.Series(dtype="int64"),
                        "path": pd.Series(dtype=object),
                    }
                )
            rows = [
                _write_one(g) for _, g in b.groupby("partition_id", sort=True)
            ]
            return pd.DataFrame(rows)

        from ..stages.infer import bucketed_reduce

        written_schema = pa.schema(
            [
                ("partition_id", pa.int64()),
                ("rows", pa.int64()),
                ("path", pa.string()),
            ]
        )
        written = bucketed_reduce(
            ds.map_batches(_assign, batch_format="pandas"),
            ["partition_id"],
            _write_bucket,
            written_schema,
        ).to_pandas()
        entries = []
        if len(written) and "partition_id" in written.columns:
            for _, row in written.iterrows():
                entries.append(
                    {
                        "partition_id": int(row["partition_id"]),
                        "rows": int(row["rows"]),
                        "path": str(row["path"]),
                        "run_id": run_id,
                        "stage": stage,
                    }
                )
        self._record(entries)
        return entries

    def read_all(self, expected_stage: str | None = None) -> ray.data.Dataset:
        """Read back every completed partition (an empty manifest —
        e.g. a finalize after an all-empty input — yields an empty
        lineage-shaped dataset rather than a read error).

        ``expected_stage`` guards resume across sink-format versions:
        if any manifest entry was written under a DIFFERENT stage name,
        refuse loudly instead of silently mixing differently-processed
        triples in one finalize (e.g. feeding already-standardized
        rows back through standardization)."""
        entries = self.done_partitions().values()
        if expected_stage is not None:
            bad = sorted(
                {e.get("stage", "<missing>") for e in entries} - {expected_stage}
            )
            if bad:
                raise ValueError(
                    f"sink {self.out_dir!r} contains partitions from stage(s) "
                    f"{bad}, expected {expected_stage!r}; refusing to resume a "
                    "mixed-stage checkpoint — finalize with the version that "
                    "wrote it, or start a fresh out_dir"
                )
        paths = [e["path"] for e in entries]
        if not paths:
            from ..stages.infer import LINEAGE_SCHEMA

            empty = pa.schema(
                list(LINEAGE_SCHEMA)
                + [pa.field("partition_id", pa.int64()), pa.field("run_id", pa.string())]
            )
            return ray.data.from_arrow(empty.empty_table())
        return ray.data.read_parquet(paths)


def compact_sink(
    src: PartitionedSink,
    dst_dir: str,
    *,
    target_partitions: int,
    expected_stage: str | None = None,
    run_id: str = "compact",
) -> PartitionedSink:
    """Small-file compaction: rewrite a completed sink into a new one
    with fewer (larger) partitions — the maintenance pass a long-lived
    resumable layout needs once many runs have left thousands of tiny
    part files. The source is NOT modified; the destination is built
    complete-or-absent (written to a temp dir, verified row-for-row
    count-equal against the source manifest, then atomically renamed),
    so a crashed compaction can simply be re-run and readers never see
    a partial sink."""
    import shutil
    import tempfile as _tf

    src_rows = sum(e["rows"] for e in src.done_partitions().values())
    parent = os.path.dirname(os.path.abspath(dst_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp_dir = _tf.mkdtemp(prefix=".compact.", dir=parent)
    try:
        dst = PartitionedSink(
            tmp_dir,
            num_partitions=target_partitions,
            key_col=src.key_col,
            run_id=run_id,
        )
        data = src.read_all(expected_stage=expected_stage)
        # stage must survive the rewrite; lineage run_id becomes the
        # compaction's (the manifest keeps per-partition provenance)
        stages = {e.get("stage") for e in src.done_partitions().values()}
        stage = stages.pop() if len(stages) == 1 else "mixed"
        drop = [c for c in ("partition_id", "run_id", "stage") if c in (data.schema().names if data.schema() else [])]
        if drop:
            data = data.drop_columns(drop)
        entries = dst.write(data, stage=stage)
        dst_rows = sum(e["rows"] for e in entries)
        if dst_rows != src_rows:
            raise RuntimeError(
                f"compaction row mismatch: src {src_rows} != dst {dst_rows}"
            )
        if os.path.isdir(dst_dir):
            shutil.rmtree(dst_dir)
        os.replace(tmp_dir, dst_dir)
        # the manifest recorded absolute paths into the temp dir —
        # repoint them at the published location
        mpath = os.path.join(dst_dir, MANIFEST)
        with open(mpath, encoding="utf-8") as f:
            manifest = json.load(f)
        for e in manifest:
            e["path"] = os.path.join(
                dst_dir, os.path.relpath(e["path"], tmp_dir)
            )
        tmp_m = mpath + ".tmp"
        with open(tmp_m, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        os.replace(tmp_m, mpath)
    except BaseException:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise
    return PartitionedSink(
        dst_dir, num_partitions=target_partitions, key_col=src.key_col, run_id=run_id
    )
