"""pages -> docs: HTML main-text extraction + language filter.

The reference reads one plain-text file (``main.py:282-284``); the
north star replaces that with a deterministic HTML->text stage over
the ``pages`` table. Stateless ``map_batches`` over Arrow batches:
rows with a non-null ``text`` pass it through; NULL-``text`` rows are
recovered from ``html`` with the deterministic extractor (per-url
byte-identical across runs/parallelism — see
``functions/html_extract.py``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.html_extract import EXTRACTOR_VERSION, extract_text


def _extract_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    htmls = batch["html"].to_pylist()
    out = [t if t is not None else extract_text(h or b"") for t, h in zip(texts, htmls)]
    return pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "text": pa.array(out, pa.string()),
            "lang": batch["lang"],
            "extractor_version": pa.array([EXTRACTOR_VERSION] * len(out), pa.string()),
        }
    )


def extract_docs(
    pages: ray.data.Dataset,
    *,
    langs: list[str] | None = None,
    batch_size: int | None = 256,
) -> ray.data.Dataset:
    """``pages(url, warc_ts, html, text, lang)`` ->
    ``docs(url, warc_ts, text, lang, extractor_version)``.

    ``langs`` applies an optional language allow-list filter (vectorized,
    before the HTML parse so filtered rows never pay extraction).
    Small ``batch_size`` keeps large binary ``html`` payloads from
    blowing up worker heaps (the column is dropped on output).
    """
    ds = pages
    if langs:
        allow = pa.array(langs, pa.string())

        def _lang_filter(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch["lang"], value_set=allow))

        ds = ds.map_batches(_lang_filter, batch_format="pyarrow")
    return ds.map_batches(_extract_batch, batch_format="pyarrow", batch_size=batch_size)
