"""Triple-corpus readers/writers.

- :func:`read_triples_json` — loads a persisted triple corpus like the
  reference does when re-processing (``scripts/finalize_graph.py:9-16``
  and ``graph_store.load_triples``, ``graph_store.py:82-115``):
  tolerates stray keys (``predicate2``/``object2``), list-typed
  objects, nulls. Arrow cannot mix ``string``/``list`` in one column,
  so the dirty ``object`` field is split into ``object`` (string) and
  ``object_list`` (list<string>, null unless the row had a list) —
  the cleaning stage reunifies them (clean.py step 1).
- :func:`triples_from_records` — same normalization from in-memory
  dicts (test fixtures).
- :func:`write_graph_csv` — Neo4j-style nodes.csv / edges.csv export
  (``graph_store.py:620-639``) via ``write_csv``.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data


def _records_to_table(records: list[dict]) -> pa.Table:
    subs, preds, objs, obj_lists, chunks, seqs = [], [], [], [], [], []
    for i, r in enumerate(records):
        if not isinstance(r, dict):
            continue
        o = r.get("object")
        if isinstance(o, list):
            objs.append(None)
            obj_lists.append([str(x) if x is not None else None for x in o])
        else:
            objs.append(o if o is None or isinstance(o, str) else str(o))
            obj_lists.append(None)
        s = r.get("subject")
        p = r.get("predicate")
        subs.append(s if s is None or isinstance(s, str) else str(s))
        preds.append(p if p is None or isinstance(p, str) else str(p))
        c = r.get("chunk")
        chunks.append(int(c) if isinstance(c, (int, float)) else 0)
        seqs.append(i)
    return pa.table(
        {
            "subject": pa.array(subs, pa.string()),
            "predicate": pa.array(preds, pa.string()),
            "object": pa.array(objs, pa.string()),
            "object_list": pa.array(obj_lists, pa.list_(pa.string())),
            "chunk": pa.array(chunks, pa.int32()),
            "seq": pa.array(seqs, pa.int64()),
        }
    )


def triples_from_records(records: list[dict]) -> ray.data.Dataset:
    return ray.data.from_arrow(_records_to_table(records))


def read_triples_json(path: str) -> ray.data.Dataset:
    """One JSON array file -> triples dataset (driver parse; corpora
    like the reference's 11k-triple file are small. At scale, shard the
    corpus into JSONL files and lift ``_records_to_table`` into a
    ``read_text``+``map_batches`` pipeline)."""
    with open(path, encoding="utf-8") as f:
        records = json.load(f)
    return triples_from_records(records)


def write_graph_csv(nodes: ray.data.Dataset, edges: ray.data.Dataset, out_dir: str) -> None:
    """nodes.csv / edges.csv directories (Neo4j-importable layout)."""
    nodes.write_csv(f"{out_dir}/nodes")
    edges.write_csv(f"{out_dir}/edges")


# ---------------------------------------------------------------------------
# RDF N-Triples export (W3C line format — the interchange sink Neo4j
# CSV doesn't cover; any triple store imports it)
# ---------------------------------------------------------------------------

_NT_LITERAL_ESC = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def _nt_literal(s: str) -> str:
    out = []
    for ch in s:
        out.append(_NT_LITERAL_ESC.get(ch, ch))
    return '"' + "".join(out) + '"'


def _nt_iri(base: str, name: str) -> str:
    from urllib.parse import quote

    # percent-encode everything an IRI ref cannot carry raw
    return "<" + base + quote(name, safe="") + ">"


def write_ntriples(
    edges: ray.data.Dataset,
    out_dir: str,
    *,
    base_iri: str = "urn:kg:",
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
    object_as_literal: bool = False,
) -> int:
    """Export a triple table as RDF N-Triples part files (one ``.nt``
    per input block, written by the tasks themselves — distributed,
    resumable at part granularity like the Parquet sinks). Subjects
    and predicates become percent-encoded IRIs under ``base_iri``;
    objects are IRIs too unless ``object_as_literal`` (then escaped
    string literals). Returns the number of lines written.

    The reference exports Neo4j CSV only (``graph_store.py:620-639``);
    N-Triples is the vendor-neutral equivalent for RDF stores."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def _write(b) -> "ray.data.Dataset":
        import pandas as pd

        if len(b) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        lines = []
        for s, p, o in zip(
            b[subject_col].astype(str),
            b[predicate_col].astype(str),
            b[object_col].astype(str),
        ):
            obj = _nt_literal(o) if object_as_literal else _nt_iri(base_iri, o)
            lines.append(
                f"{_nt_iri(base_iri, s)} {_nt_iri(base_iri + 'pred/', p)} {obj} ."
            )
        part = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.nt")
        tmp = part + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, part)
        return pd.DataFrame({"path": [part], "n": [len(lines)]})

    manifest = edges.select_columns(
        [subject_col, predicate_col, object_col]
    ).map_batches(_write, batch_format="pandas", batch_size=None).to_pandas()
    return int(manifest["n"].sum()) if len(manifest) else 0
