"""docs -> chunks: overlapping word-window chunking.

Reference semantics: ``text_utils.py:5-46`` + 1-indexed chunk ids
(``main.py:154-155``), reimplemented in ``functions/chunking.py``.
Expressed as a stateless ``map_batches`` that emits a variable number
of output rows per input row (a flat-map over Arrow batches — cheaper
than per-row ``Dataset.flat_map``).

Chunk ids are per-document (url), so the stage is embarrassingly
parallel and deterministic under any block layout.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.chunking import chunk_rows


def _chunk_batch(batch: pa.Table, chunk_size: int, overlap: int) -> pa.Table:
    urls: list[str] = []
    chunk_ids: list[int] = []
    chunk_texts: list[str] = []
    n_words: list[int] = []
    for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
        if not text:
            continue
        for cid, ctext, nw in chunk_rows(text, chunk_size, overlap):
            urls.append(url)
            chunk_ids.append(cid)
            chunk_texts.append(ctext)
            n_words.append(nw)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "chunk_id": pa.array(chunk_ids, pa.int32()),
            "chunk_text": pa.array(chunk_texts, pa.string()),
            "n_words": pa.array(n_words, pa.int32()),
        }
    )


def chunk_docs(
    docs: ray.data.Dataset,
    chunk_size: int = 500,
    overlap: int = 50,
    *,
    batch_size: int | None = 256,
) -> ray.data.Dataset:
    """``docs(url, text, ...)`` -> ``chunks(url, chunk_id, chunk_text, n_words)``."""
    return docs.select_columns(["url", "text"]).map_batches(
        _chunk_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_kwargs={"chunk_size": chunk_size, "overlap": overlap},
    )
