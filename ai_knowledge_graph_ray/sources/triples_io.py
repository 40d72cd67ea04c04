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
