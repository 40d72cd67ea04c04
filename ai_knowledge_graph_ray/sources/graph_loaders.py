"""S7 — multi-source graph loader adapters.

Rebuild of the reference's five heterogeneous graph sources
(``/root/reference/src/graph_rag/graph_store.py:73-388``), each
normalized into two flat tables instead of an in-memory MultiDiGraph:

- ``edges(src, dst, relation, source, attrs)``
- ``nodes(entity, type, label, attrs)``

``attrs`` carries the per-edge/node extras (weights, reasons, time
windows, ...) as a JSON string so the schema stays flat/stable across
sources. Node ids use the reference's ``_normalize`` rule
(``graph_store.py:52-59``): str-coerce (lists joined with ", "),
strip, lower, spaces/hyphens -> underscores — reimplemented as
``functions.textnorm.normalize_node_id``.

These source files are configuration-scale (KBs — schemas, ontologies,
a ForceGraph export), so each adapter parses driver-side exactly like
the reference and lifts the result into a ``ray.data.Dataset``; only
the triples source can be large and reads through ``read_json``-style
distribution when needed. ``load_all_sources`` unions whatever subset
of the five exists (missing files are skipped silently, reference
``:86-88``).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data

from ..functions.textnorm import normalize_node_id

EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("relation", pa.string()),
        ("source", pa.string()),
        ("attrs", pa.string()),
    ]
)

NODE_SCHEMA = pa.schema(
    [
        ("entity", pa.string()),
        ("type", pa.string()),
        ("label", pa.string()),
        ("attrs", pa.string()),
    ]
)


def _edges_table(rows: list[tuple]) -> pa.Table:
    return pa.table(
        {
            "src": pa.array([r[0] for r in rows], pa.string()),
            "dst": pa.array([r[1] for r in rows], pa.string()),
            "relation": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "attrs": pa.array([json.dumps(r[4]) if r[4] else "{}" for r in rows], pa.string()),
        }
    )


def _nodes_table(rows: dict[str, tuple]) -> pa.Table:
    ents = sorted(rows)
    return pa.table(
        {
            "entity": pa.array(ents, pa.string()),
            "type": pa.array([rows[e][0] for e in ents], pa.string()),
            "label": pa.array([rows[e][1] for e in ents], pa.string()),
            "attrs": pa.array(
                [json.dumps(rows[e][2]) if rows[e][2] else "{}" for e in ents],
                pa.string(),
            ),
        }
    )


def _result(nodes: dict, edges: list) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    return (
        ray.data.from_arrow(_nodes_table(nodes)),
        ray.data.from_arrow(_edges_table(edges)),
    )


def _empty() -> tuple[ray.data.Dataset, ray.data.Dataset]:
    return (
        ray.data.from_arrow(NODE_SCHEMA.empty_table()),
        ray.data.from_arrow(EDGE_SCHEMA.empty_table()),
    )


def _add_node(nodes: dict, nid: str, ntype: str, label: str = "", attrs: dict | None = None):
    if nid and nid not in nodes:
        nodes[nid] = (ntype, label or nid, attrs or {})


# ---------------------------------------------------------------------------
# Source 1: triples JSON (graph_store.load_triples, :82-115)
# ---------------------------------------------------------------------------

def load_triples_source(path: str) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Triple-corpus JSON: null-field drop, normalize, ``obj == 'none'``
    drop, chunk provenance in attrs."""
    if not os.path.exists(path):
        return _empty()
    with open(path, encoding="utf-8") as f:
        triples = json.load(f)
    nodes: dict[str, tuple] = {}
    edges: list[tuple] = []
    for t in triples:
        if not t.get("subject") or not t.get("predicate") or not t.get("object"):
            continue
        subj = normalize_node_id(t["subject"])
        pred = str(t["predicate"]).strip().lower()
        obj = normalize_node_id(t["object"])
        if not subj or not obj or obj == "none":
            continue
        _add_node(nodes, subj, "concept")
        _add_node(nodes, obj, "concept")
        edges.append((subj, obj, pred, "triples", {"chunk": t.get("chunk", 0)}))
    return _result(nodes, edges)


# ---------------------------------------------------------------------------
# Source 2: ForceGraph JSON (load_graph_data, :117-150)
# ---------------------------------------------------------------------------

def load_forcegraph_source(path: str) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """``{nodes: [{id, group, label/name, ...}], links: [{source,
    target, label/relation}]}`` — link endpoints may be id strings or
    embedded node objects."""
    if not os.path.exists(path):
        return _empty()
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    nodes: dict[str, tuple] = {}
    edges: list[tuple] = []
    for node in data.get("nodes", []):
        nid = normalize_node_id(node["id"])
        extras = {
            k: v
            for k, v in node.items()
            if k not in ("id", "group", "name", "label", "type")
        }
        _add_node(
            nodes,
            nid,
            node.get("group", "concept"),
            node.get("label", node.get("name", node["id"])),
            extras,
        )
    for link in data.get("links", []):
        src = normalize_node_id(
            link["source"] if isinstance(link["source"], str) else link["source"]["id"]
        )
        tgt = normalize_node_id(
            link["target"] if isinstance(link["target"], str) else link["target"]["id"]
        )
        rel = link.get("label", link.get("relation", "related_to")).strip().lower()
        edges.append((src, tgt, rel, "graph_data", {}))
    return _result(nodes, edges)


# ---------------------------------------------------------------------------
# Source 3: concept-relationships YAML (load_concept_relationships, :152-287)
# ---------------------------------------------------------------------------

def load_concept_relationships_source(
    path: str, known_concepts: "set[str] | None" = None
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Typed schema YAML: causal chains (``precedes``), concept
    requirements (``requires``/``enhances``/``invalidates``/
    ``targets``), model blueprints (``requires`` via concept-mention
    matching against ``known_concepts``, ``active_during`` time
    windows), confluence weights (``contributes_to``), anti-patterns
    (``violates``), killzones (``best_for``)."""
    try:
        import yaml
    except ImportError:
        return _empty()
    if not os.path.exists(path):
        return _empty()
    with open(path, encoding="utf-8") as f:
        data = yaml.safe_load(f) or {}

    known = {normalize_node_id(c) for c in (known_concepts or set())}

    def _mentions(text: str) -> list[str]:
        """Graph concepts mentioned in free text (the reference matches
        against already-loaded node names, ``:224-229``)."""
        t = normalize_node_id(text)
        return sorted(c for c in known if c and c in t)

    nodes: dict[str, tuple] = {}
    edges: list[tuple] = []

    for chain_name, chain in (data.get("causal_chains") or {}).items():
        steps = chain.get("steps", {})
        ordered = sorted(steps.items(), key=lambda x: int(x[0]))
        for i in range(len(ordered) - 1):
            curr = normalize_node_id(
                ordered[i][1].get("concept", ordered[i][1].get("phase", f"step_{i}"))
            )
            nxt = normalize_node_id(
                ordered[i + 1][1].get("concept", ordered[i + 1][1].get("phase", f"step_{i+1}"))
            )
            _add_node(nodes, curr, "concept")
            _add_node(nodes, nxt, "concept")
            edges.append((curr, nxt, "precedes", "concept_rels", {"chain": chain_name}))

    for concept, reqs in (data.get("concept_requirements") or {}).items():
        cnode = normalize_node_id(concept)
        _add_node(nodes, cnode, "concept")
        for req in reqs.get("requires") or []:
            rnode = normalize_node_id(req["concept"])
            _add_node(nodes, rnode, "concept")
            edges.append((cnode, rnode, "requires", "concept_rels", {"reason": req.get("why", "")}))
        for enh in reqs.get("enhanced_by") or []:
            enode = normalize_node_id(enh["concept"])
            _add_node(nodes, enode, "concept")
            edges.append(
                (enode, cnode, "enhances", "concept_rels",
                 {"bonus": enh.get("bonus", 0), "reason": enh.get("why", "")})
            )
        for inv in reqs.get("invalidated_by") or []:
            cond = normalize_node_id(inv.get("condition", inv.get("concept", "unknown")))
            _add_node(nodes, cond, "condition")
            edges.append((cond, cnode, "invalidates", "concept_rels", {"reason": inv.get("why", "")}))
        for tgt in reqs.get("targets") or []:
            tnode = normalize_node_id(tgt["concept"])
            _add_node(nodes, tnode, "concept")
            edges.append((cnode, tnode, "targets", "concept_rels", {"reason": tgt.get("why", "")}))

    for model_name, model in (data.get("models") or {}).items():
        mnode = normalize_node_id(model_name)
        _add_node(nodes, mnode, "model")
        for req_str in model.get("required") or []:
            for concept in _mentions(req_str):
                edges.append(
                    (mnode, concept, "requires", "concept_rels", {"requirement_text": req_str})
                )
        for tw in model.get("time_windows") or []:
            tw_node = normalize_node_id(tw.get("name", f"{model_name}_window"))
            _add_node(
                nodes, tw_node, "time_window", "",
                {"start": tw.get("start"), "end": tw.get("end"), "timezone": tw.get("timezone")},
            )
            edges.append((mnode, tw_node, "active_during", "concept_rels", {}))

    for tier, items in (data.get("confluence_weights") or {}).items():
        if tier == "thresholds" or not isinstance(items, dict):
            continue
        for factor, weight in items.items():
            fnode = normalize_node_id(factor)
            _add_node(nodes, fnode, "confluence_factor")
            _add_node(nodes, "confluence_scoring", "system")
            edges.append(
                (fnode, "confluence_scoring", "contributes_to", "concept_rels",
                 {"weight": weight, "tier": tier})
            )

    for ap_name, ap in (data.get("anti_patterns") or {}).items():
        anode = normalize_node_id(ap_name)
        _add_node(
            nodes, anode, "anti_pattern", "",
            {"description": ap.get("description", ""), "why_fails": ap.get("why_fails", ""),
             "fix": ap.get("fix", "")},
        )
        for concept in _mentions(f"{ap.get('description', '')} {ap.get('fix', '')}"):
            edges.append((anode, concept, "violates", "concept_rels", {}))

    for kz_name, kz in ((data.get("time_rules") or {}).get("killzones") or {}).items():
        kznode = normalize_node_id(f"killzone_{kz_name}")
        _add_node(
            nodes, kznode, "killzone", "",
            {"time": kz.get("time", ""), "behavior": kz.get("behavior", "")},
        )
        for setup in kz.get("best_setups") or []:
            snode = normalize_node_id(setup)
            edges.append((kznode, snode, "best_for", "concept_rels", {}))

    return _result(nodes, edges)


# ---------------------------------------------------------------------------
# Source 4: ontology YAML (load_ontology, :289-339)
# ---------------------------------------------------------------------------

def load_ontology_source(path: str) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Category -> item -> sub-item walk: ``belongs_to`` edges to the
    category, ``is_type_of`` for definition-bearing sub-items."""
    try:
        import yaml
    except ImportError:
        return _empty()
    if not os.path.exists(path):
        return _empty()
    with open(path, encoding="utf-8") as f:
        data = yaml.safe_load(f) or {}

    nodes: dict[str, tuple] = {}
    edges: list[tuple] = []
    for category, items in data.items():
        if not isinstance(items, dict):
            continue
        cat_node = normalize_node_id(category)
        _add_node(nodes, cat_node, "category")
        for item_name, item_data in items.items():
            inode = normalize_node_id(item_name)
            if isinstance(item_data, dict):
                scalars = {
                    k: v
                    for k, v in item_data.items()
                    if isinstance(v, (str, int, float, bool))
                    and k not in ("definition", "description")
                }
                scalars["definition"] = item_data.get(
                    "definition", item_data.get("description", "")
                )
                _add_node(nodes, inode, "concept", "", scalars)
                edges.append((inode, cat_node, "belongs_to", "ontology", {}))
                for sub_name, sub_data in item_data.items():
                    if isinstance(sub_data, dict) and any(
                        k in sub_data
                        for k in ("definition", "meaning", "description", "full_name")
                    ):
                        snode = normalize_node_id(sub_name)
                        _add_node(
                            nodes, snode, "concept", "",
                            {"definition": sub_data.get("definition", sub_data.get("meaning", ""))},
                        )
                        edges.append((snode, inode, "is_type_of", "ontology", {}))
            elif isinstance(item_data, str):
                _add_node(nodes, inode, "concept", "", {"definition": item_data})
                edges.append((inode, cat_node, "belongs_to", "ontology", {}))
    return _result(nodes, edges)


# ---------------------------------------------------------------------------
# Source 5: concept-graph JSON (load_concept_graph, :341-388)
# ---------------------------------------------------------------------------

def load_concept_graph_source(path: str) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """``{nodes, edges|links}`` with nodes as a dict-keyed-by-id OR a
    list, and edges accepting source/target, from/to aliases."""
    if not os.path.exists(path):
        return _empty()
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    nodes: dict[str, tuple] = {}
    edges: list[tuple] = []
    if isinstance(data, dict):
        nodes_data = data.get("nodes", [])
        if isinstance(nodes_data, dict):
            for key, node in nodes_data.items():
                if isinstance(node, dict):
                    nid = normalize_node_id(node.get("id", key))
                    attrs = {
                        "level": node.get("level", 0),
                        "description": node.get("description", ""),
                    }
                    _add_node(
                        nodes, nid,
                        node.get("category", node.get("type", "concept")),
                        node.get("name", key), attrs,
                    )
                else:
                    _add_node(nodes, normalize_node_id(key), "concept")
        else:
            for node in nodes_data:
                nid = normalize_node_id(node.get("id", node.get("name", "")))
                if nid:
                    _add_node(nodes, nid, node.get("type", "concept"))
        for edge in data.get("edges", data.get("links", [])):
            src = normalize_node_id(edge.get("source", edge.get("from", "")))
            tgt = normalize_node_id(edge.get("target", edge.get("to", "")))
            rel = edge.get("relation", edge.get("relationship", edge.get("label", "related_to")))
            rel = rel.lower() if isinstance(rel, str) else "related_to"
            if src and tgt:
                edges.append(
                    (src, tgt, rel, "concept_graph", {"description": edge.get("description", "")})
                )
    return _result(nodes, edges)


# ---------------------------------------------------------------------------
# Union (load_all, :73-80)
# ---------------------------------------------------------------------------

def load_all_sources(
    *,
    triples_path: str | None = None,
    forcegraph_path: str | None = None,
    concept_rels_path: str | None = None,
    ontology_path: str | None = None,
    concept_graph_path: str | None = None,
    known_concepts: "set[str] | None" = None,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Union of whichever sources exist -> one (nodes, edges) pair.
    Node rows are first-source-wins deduped per entity (the reference's
    add_node keeps re-adding attrs; first wins is the deterministic
    choice); parallel edges survive (MultiDiGraph semantics).

    Reference order matters for ``known_concepts``: the model/anti-
    pattern mention matching sees the concepts of the EARLIER sources
    (``load_all``'s fixed call order) — pass the accumulated node set
    explicitly, or leave None to derive it from the triples +
    forcegraph + ontology sources loaded here first.
    """
    parts = []
    parts.append(load_triples_source(triples_path) if triples_path else _empty())
    parts.append(load_forcegraph_source(forcegraph_path) if forcegraph_path else _empty())
    if known_concepts is None:
        known_concepts = set()
        for n, _ in parts:
            known_concepts.update(r["entity"] for r in n.take_all())
        if ontology_path:
            onto_nodes, _oe = load_ontology_source(ontology_path)
            known_concepts.update(r["entity"] for r in onto_nodes.take_all())
    parts.append(
        load_concept_relationships_source(concept_rels_path, known_concepts)
        if concept_rels_path
        else _empty()
    )
    parts.append(load_ontology_source(ontology_path) if ontology_path else _empty())
    parts.append(
        load_concept_graph_source(concept_graph_path) if concept_graph_path else _empty()
    )

    all_nodes = parts[0][0].union(*[p[0] for p in parts[1:]])
    all_edges = parts[0][1].union(*[p[1] for p in parts[1:]])

    def _dedupe_nodes(g):
        import pandas as pd  # noqa: F401

        return g.drop_duplicates("entity", keep="first")

    from ..stages.infer import bucketed_reduce

    nodes = bucketed_reduce(all_nodes, ["entity"], _dedupe_nodes, NODE_SCHEMA)
    return nodes, all_edges
