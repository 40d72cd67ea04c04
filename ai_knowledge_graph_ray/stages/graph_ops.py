"""Graph-store query/audit operators ([rag]/[scripts] layer).

Rebuilds the fork's graph-store statistics and audit batch jobs on Ray
Data (SURVEY.md G9, M14, M15, M16, J4):

- :func:`relation_type_counts` / :func:`node_degrees` — distributed
  grouped counts (``graph_store.py:560-610``).
- :func:`tag_signal_noise` — substring-match a term inventory against
  triples, tagging signal vs noise (``audit_quality.py:7-46``).
- :func:`extract_concepts` — match graph node names (with
  underscore/space variants and scored partial token overlap) against
  free text, broadcast node list (``graph_retriever.py:436-450``,
  ``rag_chat.py:149-181``).
- :func:`recursive_split` — recursive character splitter (paragraph ->
  sentence -> window) with the <=1800-char safety filter
  (``graph_retriever.py:156-169``; LangChain-free reimplementation).
- :func:`coverage_report` — concept inventory vs graph nodes: present /
  missing / thin coverage via broadcast semi/anti joins
  (``scripts/audit_coverage.py``).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.textnorm import normalize_node_id
from .relational import grouped_sums


def relation_type_counts(edges: ray.data.Dataset) -> ray.data.Dataset:
    """``(predicate, n_edges)`` — G9."""
    pre = edges.map_batches(
        lambda b: pa.table(
            {"predicate": b["predicate"], "one": pa.array([1] * len(b), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return grouped_sums(pre, ["predicate"], {"n_edges": "one"})


def node_degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """``(entity, degree)`` — union src/dst then partial-count combine."""
    import pyarrow.compute as pc

    def _partial(batch: pa.Table) -> pa.Table:
        ents = pa.concat_arrays(
            [
                batch["src"].combine_chunks().cast(pa.string()),
                batch["dst"].combine_chunks().cast(pa.string()),
            ]
        )
        vc = ents.value_counts()
        return pa.table(
            {"entity": vc.field("values"), "degree": vc.field("counts").cast(pa.int64())}
        )

    return (
        edges.select_columns(["src", "dst"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("entity")
        .aggregate(Sum("degree", alias_name="degree"))
    )


def tag_signal_noise(
    triples: ray.data.Dataset, term_inventory: list[str]
) -> tuple[ray.data.Dataset, dict]:
    """M14: tag each triple signal/noise by substring match of any
    inventory term in subject or object (case-insensitive); returns the
    tagged dataset + counts."""
    terms = [t.lower() for t in term_inventory]
    ref = ray.put(terms)

    def _tag(batch: pa.Table) -> pa.Table:
        tset = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        tags = []
        for s, o in zip(batch["subject"].to_pylist(), batch["object"].to_pylist()):
            s_l, o_l = (s or "").lower(), (o or "").lower()
            tags.append(any(t in s_l or t in o_l for t in tset))
        return batch.append_column("is_signal", pa.array(tags, pa.bool_()))

    tagged = triples.map_batches(_tag, batch_format="pyarrow").materialize()
    n = tagged.count()
    import pyarrow.compute as pc

    n_signal = (
        tagged.select_columns(["is_signal"])
        .map_batches(
            lambda b: pa.table(
                {"n": pa.array([pc.sum(pc.cast(b["is_signal"], pa.int64())).as_py() or 0])}
            ),
            batch_format="pyarrow",
        )
        .sum("n")
        or 0
    )
    return tagged, {"total": n, "signal": n_signal, "noise": n - n_signal}


_WORD_RE = re.compile(r"\w+")


def extract_concepts(
    docs: ray.data.Dataset,
    node_names: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    partial_threshold: float = 0.5,
) -> ray.data.Dataset:
    """M15: ``(id, concept, score)`` — exact name or underscore/space
    variant match scores 1.0; partial match scores the fraction of the
    concept's tokens present in the text (>= threshold kept). The node
    list is broadcast once; matching is per batch against a token set.
    """
    concepts = sorted({normalize_node_id(n) for n in node_names if n})
    concept_tokens = {c: c.split("_") for c in concepts}
    ref = ray.put(concept_tokens)

    def _match(batch: pd.DataFrame) -> pd.DataFrame:
        ct = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        out_id, out_c, out_s = [], [], []
        for i, text in zip(batch[id_col], batch[text_col].fillna("")):
            low = text.lower()
            toks = set(_WORD_RE.findall(low))
            for c, parts in ct.items():
                spaced = c.replace("_", " ")
                if spaced in low or c in low:
                    out_id.append(i)
                    out_c.append(c)
                    out_s.append(1.0)
                    continue
                hit = sum(1 for p in parts if p in toks)
                score = hit / len(parts) if parts else 0.0
                if score >= partial_threshold and hit > 0 and len(parts) > 1:
                    out_id.append(i)
                    out_c.append(c)
                    out_s.append(round(score, 4))
        return pd.DataFrame({id_col: out_id, "concept": out_c, "score": out_s})

    return docs.select_columns([id_col, text_col]).map_batches(
        _match, batch_format="pandas"
    )


def recursive_split(
    docs: ray.data.Dataset,
    *,
    chunk_size: int = 800,
    overlap: int = 150,
    max_len: int = 1800,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """M16: character-budget recursive splitter — try paragraph
    boundaries, then sentence boundaries, then hard character windows
    with overlap; drop splits longer than ``max_len`` (safety filter).
    Deterministic, dependency-free."""

    def _split_text(text: str) -> list[str]:
        def windows(s: str) -> list[str]:
            out = []
            step = max(1, chunk_size - overlap)
            for start in range(0, len(s), step):
                out.append(s[start : start + chunk_size])
                if start + chunk_size >= len(s):
                    break
            return out

        def pack(parts: list[str], sep: str) -> list[str]:
            chunks, cur = [], ""
            for p in parts:
                cand = (cur + sep + p) if cur else p
                if len(cand) <= chunk_size:
                    cur = cand
                else:
                    if cur:
                        chunks.append(cur)
                    if len(p) <= chunk_size:
                        cur = p
                    else:
                        chunks.extend(split_level(p, 1))
                        cur = ""
            if cur:
                chunks.append(cur)
            return chunks

        def split_level(s: str, level: int) -> list[str]:
            if len(s) <= chunk_size:
                return [s]
            if level == 0:
                parts = [p for p in s.split("\n\n") if p.strip()]
                if len(parts) > 1:
                    return pack(parts, "\n\n")
                level = 1
            if level == 1:
                parts = [p for p in re.split(r"(?<=[.!?])\s+", s) if p.strip()]
                if len(parts) > 1:
                    return pack(parts, " ")
            return windows(s)

        return [c for c in split_level(text, 0) if c and len(c) <= max_len]

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        ids, sids, texts = [], [], []
        for i, t in zip(batch[id_col], batch[text_col].fillna("")):
            for j, c in enumerate(_split_text(t)):
                ids.append(i)
                sids.append(j)
                texts.append(c)
        return pd.DataFrame({id_col: ids, "split_id": sids, "split_text": texts})

    return docs.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


def coverage_report(
    concept_inventory: list[str],
    nodes: ray.data.Dataset,
    *,
    thin_degree: int = 2,
) -> dict:
    """J4: compare a (small) master concept inventory against the
    materialized node table: present / missing / thin (degree <
    ``thin_degree``). Broadcast semi/anti join — the inventory is the
    small side; the node table streams."""
    inv = {normalize_node_id(c) for c in concept_inventory if c}
    ref = ray.put(inv)

    def _match(batch: pa.Table) -> pa.Table:
        iv = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        ents = [normalize_node_id(e) for e in batch["entity"].to_pylist()]
        mask = pa.array([e in iv for e in ents], pa.bool_())
        hit = batch.filter(mask)
        return pa.table(
            {
                "entity": pa.array(
                    [normalize_node_id(e) for e in hit["entity"].to_pylist()], pa.string()
                ),
                "degree": hit["degree"],
            }
        )

    hits = nodes.select_columns(["entity", "degree"]).map_batches(
        _match, batch_format="pyarrow"
    ).to_pandas()
    present = set(hits["entity"]) if len(hits) else set()
    thin = (
        set(hits.loc[hits["degree"] < thin_degree, "entity"]) if len(hits) else set()
    )
    return {
        "inventory": len(inv),
        "present": sorted(present),
        "missing": sorted(inv - present),
        "thin": sorted(thin),
        "coverage_pct": round(100.0 * len(present) / max(1, len(inv)), 1),
    }
