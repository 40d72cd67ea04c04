"""S9 — knowledge-base file crawler.

Distributed rebuild of the reference's driver-side ingest walk
(``/root/reference/src/graph_rag/graph_retriever.py:102-149``): rglob
over ``md/yaml/yml/json/txt`` files, skip anything over 2 MB, decode
UTF-8 (undecodable files dropped, like the reference's bare
``except``), and carry the reference's per-document metadata columns
(``source``, ``filename``, ``source_dir``).

Ray-Data shape: ``ray.data.read_binary_files(include_paths=True)``
fans the reads across the cluster; size-skip and decode run as one
vectorized ``map_batches``. The listing itself is the only driver
work (same as the reference), and missing directories are skipped
silently (reference ``:122-123``).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

KB_EXTENSIONS = (".md", ".yaml", ".yml", ".json", ".txt")
MAX_FILE_BYTES = 2 * 1024 * 1024

KB_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("filename", pa.string()),
        ("source_dir", pa.string()),
        ("text", pa.string()),
    ]
)


def crawl_knowledge_base(
    source_dirs: list[str],
    *,
    extensions: tuple[str, ...] = KB_EXTENSIONS,
    max_bytes: int = MAX_FILE_BYTES,
) -> ray.data.Dataset:
    """``(source, filename, source_dir, text)`` — one row per readable
    knowledge-base file under any of ``source_dirs`` (recursive)."""
    existing = [d for d in source_dirs if os.path.isdir(d)]
    if not existing:
        return ray.data.from_arrow(KB_SCHEMA.empty_table())

    files = ray.data.read_binary_files(
        existing,
        include_paths=True,
        file_extensions=[e.lstrip(".") for e in extensions],
    )

    def _decode(batch: pa.Table) -> pa.Table:
        sources, names, dirs, texts = [], [], [], []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            if len(data) > max_bytes:  # reference: skip >2MB (:128-129)
                continue
            try:
                text = bytes(data).decode("utf-8")
            except Exception:  # reference: unreadable -> skip (:131-133)
                continue
            sources.append(path)
            names.append(os.path.basename(path))
            dirs.append(os.path.basename(os.path.dirname(path)))
            texts.append(text)
        return pa.table(
            {
                "source": pa.array(sources, pa.string()),
                "filename": pa.array(names, pa.string()),
                "source_dir": pa.array(dirs, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return files.map_batches(_decode, batch_format="pyarrow")
