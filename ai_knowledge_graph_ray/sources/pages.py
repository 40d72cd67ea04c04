"""The ``pages`` input table (Common-Crawl-style web pages).

Schema per ``BASELINE.json`` ``input_hint``:
``url: string, warc_ts: timestamp[us], html: binary, text: string
(nullable), lang: string``.

Two entry points:

- ``read_pages(path, ...)`` — plain ``ray.data.read_parquet`` with
  column pruning; the production reader (the reference's single
  ``--input`` text file, ``main.py:282-284``, becomes one row here).
- ``pages_from_documents(sf_dir, ...)`` — deterministic synthesizer
  that lifts the driver's ``documents(doc_id, text, lang, source,
  n_chars)`` table into the ``pages`` shape (FIXTURES.md "Driver
  note"): ``url``/``warc_ts`` derived from ``doc_id`` (no wall clock),
  ``html`` generated with :func:`wrap_html` so the HTML->text stage
  can be verified byte-identically; a deterministic 2% of rows get a
  NULL ``text`` to force the extractor path.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray
import ray.data

from ..functions.html_extract import wrap_html
from .readers import read_parquet_clean

# Fixed epoch for synthetic warc_ts: 2026-01-01T00:00:00 UTC in micros.
_WARC_EPOCH_US = 1_767_225_600_000_000

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def read_pages(path: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read a ``pages`` Parquet table, pruning columns at the read."""
    return read_parquet_clean(path, columns=columns, **kwargs)


def _canonical_text(t: str | None) -> str:
    """Paragraph-normalize so ``extract_text(wrap_html(t)) == t`` holds
    byte-for-byte (the per-url invariant)."""
    if not t:
        return ""
    return "\n\n".join(p.strip() for p in t.split("\n\n") if p.strip())


def _docs_to_pages(batch: pa.Table, null_text: bool = True) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = [_canonical_text(t) for t in batch["text"].to_pylist()]
    langs = batch["lang"].to_pylist()
    urls = [f"https://example.org/doc/{d}" for d in doc_ids]
    # modulo keeps replicated ids (base + k*10^7) inside int64 micros —
    # a replica shares its base doc's ts; ids < 10^7 are unchanged
    ts = pa.array(
        [_WARC_EPOCH_US + (int(d) % 10_000_000) * 137_000_000 for d in doc_ids],
        pa.timestamp("us"),
    )
    # Deterministic outlinks (derandomized — the SQL oracle regenerates
    # the identical arithmetic): 3 internal targets + 1 external host.
    # They live in the dropped <nav>, so extract_text round-trip
    # byte-identity is untouched.
    links = [
        tuple(
            f"https://example.org/doc/{(int(d) * 131 + i * 31) % 997}"
            for i in range(3)
        )
        + (f"https://ext{int(d) % 13}.example.com/x",)
        for d in doc_ids
    ]
    html = [
        wrap_html(t, title=f"doc-{d}", links=ln)
        for d, t, ln in zip(doc_ids, texts, links)
    ]
    # Deterministic 2% of rows: text NULL, recoverable only via the
    # extractor (drives the per-url byte-identity invariant).
    out_text = [
        None if (null_text and int(d) % 50 == 0) else t for d, t in zip(doc_ids, texts)
    ]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            "html": pa.array(html, pa.binary()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def pages_from_documents(
    sf_dir: str, *, null_text: bool = True, replication: int = 1, **read_kwargs
) -> ray.data.Dataset:
    """Synthesize the ``pages`` table from ``{sf_dir}/documents.parquet``.

    Deterministic: url/ts/html are pure functions of (doc_id, text).
    ``replication`` tiles the document set K times with distinct
    doc_ids/urls (``doc_id + k * 10^7``) — used by the benchmark to
    scale the same driver-provided corpus up until compute dominates
    fixed startup cost; content is unchanged, ids/urls stay unique.
    """
    if "override_num_blocks" not in read_kwargs:
        # One parquet file would otherwise become ~16 blocks, capping
        # the fused downstream chain (HTML synth -> extract -> chunk ->
        # model actor pool) at 16 concurrent tasks. Split to ~4 tasks
        # per core so the actor pool can actually fill the cluster.
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        read_kwargs["override_num_blocks"] = max(32, 4 * cpus)
    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
        **read_kwargs,
    )
    if replication > 1:
        # A single parquet file reads as ONE task that streams its
        # split blocks out serially — that serial producer throttles
        # the whole fused pipeline, so tiles are always handed over as
        # pre-split object-store blocks (lazily fusing the tiler into
        # the extraction actors measured 10x slower end-to-end — 52 s
        # vs 4.7 s at replication=64). HOW they get there is sized to
        # the tiling: small corpora (bench default, rep=64) use direct
        # driver-side puts — a distributed tile pays a scheduling +
        # materialize round that measured ~1 s of pure overhead at
        # rep=64 (the r4->r3 headline gap); big tilings (memory/scale
        # probes, rep>=512) fan the copies out of a range(K) dataset,
        # because the serial put loop collapses at rep=8192 — one core
        # grinding 25 GB of puts while 31 sat idle.
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang"],
        ).replace_schema_metadata(None)  # keep block schemas hashable
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        target_blocks = max(32, 4 * cpus)
        slices_per_rep = max(1, target_blocks // replication)
        n = len(tbl)
        step = max(1, n // slices_per_rep)
        id_idx = tbl.schema.get_field_index("doc_id")
        driver_tile_max_rows = int(
            os.environ.get("GRAFT_TILE_DRIVER_MAX_ROWS", "1000000")
        )

        if n * replication <= driver_tile_max_rows:
            refs = []
            for k in range(replication):
                shifted = tbl.set_column(
                    id_idx, "doc_id", pc.add(tbl["doc_id"], k * 10_000_000)
                )
                for s in range(0, n, step):
                    refs.append(ray.put(shifted.slice(s, min(step, n - s))))
            docs = ray.data.from_arrow_refs(refs)
        else:
            base_ref = ray.put(tbl)

            def _tile(batch: pa.Table):
                base = (
                    ray.get(base_ref)
                    if isinstance(base_ref, ray.ObjectRef)
                    else base_ref
                )
                for k in batch["id"].to_pylist():
                    shifted = base.set_column(
                        id_idx, "doc_id",
                        pc.add(base["doc_id"], int(k) * 10_000_000),
                    )
                    for s in range(0, n, step):
                        yield shifted.slice(s, min(step, n - s))

            docs = (
                ray.data.range(
                    replication,
                    override_num_blocks=min(replication, target_blocks),
                )
                .map_batches(_tile, batch_format="pyarrow")
                .materialize()
            )
    return docs.map_batches(
        _docs_to_pages, batch_format="pyarrow", fn_kwargs={"null_text": null_text}
    )
