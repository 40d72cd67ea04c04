"""S7 — multi-source graph loader adapters vs the reference's five
source shapes (graph_store.py:73-388): per-source normalization,
null/degenerate drops, both concept-graph layouts, mention matching,
and the union."""

from __future__ import annotations

import json

import pytest

from ai_knowledge_graph_ray.sources.graph_loaders import (
    load_all_sources,
    load_concept_graph_source,
    load_concept_relationships_source,
    load_forcegraph_source,
    load_ontology_source,
    load_triples_source,
)


def _edges(ds):
    return [(r["src"], r["dst"], r["relation"], r["source"]) for r in ds.take_all()]


class TestTriplesSource:
    def test_normalize_and_drops(self, tmp_path):
        p = tmp_path / "t.json"
        p.write_text(
            json.dumps(
                [
                    {"subject": "Steam Engine", "predicate": " Powers ", "object": "Textile-Mill", "chunk": 3},
                    {"subject": "a", "predicate": "rel", "object": "none"},
                    {"subject": None, "predicate": "rel", "object": "b"},
                    {"subject": "x", "object": "y"},
                ]
            )
        )
        nodes, edges = load_triples_source(str(p))
        assert _edges(edges) == [("steam_engine", "textile_mill", "powers", "triples")]
        assert {r["entity"] for r in nodes.take_all()} == {"steam_engine", "textile_mill"}

    def test_missing_file(self, tmp_path):
        nodes, edges = load_triples_source(str(tmp_path / "nope.json"))
        assert edges.take_all() == [] and nodes.take_all() == []


class TestForceGraph:
    def test_object_and_string_endpoints(self, tmp_path):
        p = tmp_path / "g.json"
        p.write_text(
            json.dumps(
                {
                    "nodes": [
                        {"id": "Order Block", "group": "structure", "label": "OB"},
                        {"id": "FVG", "name": "fair value gap"},
                    ],
                    "links": [
                        {"source": "Order Block", "target": {"id": "FVG"}, "label": "Creates"},
                        {"source": {"id": "FVG"}, "target": "Order Block"},
                    ],
                }
            )
        )
        nodes, edges = load_forcegraph_source(str(p))
        got = _edges(edges)
        assert ("order_block", "fvg", "creates", "graph_data") in got
        assert ("fvg", "order_block", "related_to", "graph_data") in got
        types = {r["entity"]: r["type"] for r in nodes.take_all()}
        assert types == {"order_block": "structure", "fvg": "concept"}


class TestConceptRels:
    YAML = """
causal_chains:
  displacement_chain:
    steps:
      "1": {concept: liquidity sweep}
      "2": {concept: displacement}
      "3": {phase: continuation}
concept_requirements:
  displacement:
    requires:
      - {concept: liquidity sweep, why: needs fuel}
    enhanced_by:
      - {concept: killzone timing, bonus: 2}
    invalidated_by:
      - {condition: low volume}
    targets:
      - {concept: fair value gap}
models:
  silver_bullet:
    required: ["a displacement after the liquidity sweep"]
    time_windows:
      - {name: am window, start: "10:00", end: "11:00", timezone: EST}
confluence_weights:
  primary:
    htf_bias: 3
  thresholds: {min: 5}
anti_patterns:
  chasing_price:
    description: entering after displacement without retrace
    fix: wait for fair value gap
time_rules:
  killzones:
    london:
      time: "02:00-05:00"
      best_setups: [judas swing]
"""

    def test_all_sections(self, tmp_path):
        p = tmp_path / "rels.yaml"
        p.write_text(self.YAML)
        nodes, edges = load_concept_relationships_source(
            str(p), known_concepts={"displacement", "liquidity_sweep", "fair_value_gap"}
        )
        got = _edges(edges)
        assert ("liquidity_sweep", "displacement", "precedes", "concept_rels") in got
        assert ("displacement", "continuation", "precedes", "concept_rels") in got
        assert ("displacement", "liquidity_sweep", "requires", "concept_rels") in got
        assert ("killzone_timing", "displacement", "enhances", "concept_rels") in got
        assert ("low_volume", "displacement", "invalidates", "concept_rels") in got
        assert ("displacement", "fair_value_gap", "targets", "concept_rels") in got
        # model mention matching against known concepts
        assert ("silver_bullet", "displacement", "requires", "concept_rels") in got
        assert ("silver_bullet", "liquidity_sweep", "requires", "concept_rels") in got
        assert ("silver_bullet", "am_window", "active_during", "concept_rels") in got
        assert ("htf_bias", "confluence_scoring", "contributes_to", "concept_rels") in got
        assert ("chasing_price", "fair_value_gap", "violates", "concept_rels") in got
        assert ("chasing_price", "displacement", "violates", "concept_rels") in got
        assert ("killzone_london", "judas_swing", "best_for", "concept_rels") in got
        types = {r["entity"]: r["type"] for r in nodes.take_all()}
        assert types["silver_bullet"] == "model"
        assert types["low_volume"] == "condition"
        assert types["killzone_london"] == "killzone"


class TestOntology:
    YAML = """
structures:
  order_block:
    definition: last opposing candle
    bos: {definition: break of structure}
  simple_term: just a string definition
not_a_dict: 42
"""

    def test_walk(self, tmp_path):
        p = tmp_path / "onto.yaml"
        p.write_text(self.YAML)
        nodes, edges = load_ontology_source(str(p))
        got = _edges(edges)
        assert ("order_block", "structures", "belongs_to", "ontology") in got
        assert ("bos", "order_block", "is_type_of", "ontology") in got
        assert ("simple_term", "structures", "belongs_to", "ontology") in got
        types = {r["entity"]: r["type"] for r in nodes.take_all()}
        assert types["structures"] == "category"


class TestConceptGraph:
    def test_dict_nodes(self, tmp_path):
        p = tmp_path / "cg.json"
        p.write_text(
            json.dumps(
                {
                    "nodes": {"A Concept": {"id": "A Concept", "category": "core", "level": 2}},
                    "edges": [{"from": "A Concept", "to": "Other", "relationship": "Leads To"}],
                }
            )
        )
        nodes, edges = load_concept_graph_source(str(p))
        assert _edges(edges) == [("a_concept", "other", "leads to", "concept_graph")]
        types = {r["entity"]: r["type"] for r in nodes.take_all()}
        assert types["a_concept"] == "core"

    def test_list_nodes_and_links(self, tmp_path):
        p = tmp_path / "cg.json"
        p.write_text(
            json.dumps(
                {
                    "nodes": [{"id": "N1"}, {"name": "N2", "type": "aux"}],
                    "links": [{"source": "N1", "target": "N2"}],
                }
            )
        )
        nodes, edges = load_concept_graph_source(str(p))
        assert _edges(edges) == [("n1", "n2", "related_to", "concept_graph")]


class TestUnion:
    def test_load_all(self, tmp_path):
        (tmp_path / "t.json").write_text(
            json.dumps([{"subject": "displacement", "predicate": "creates", "object": "fvg"}])
        )
        (tmp_path / "g.json").write_text(
            json.dumps(
                {
                    "nodes": [{"id": "displacement", "group": "event"}],
                    "links": [{"source": "displacement", "target": "fvg", "label": "makes"}],
                }
            )
        )
        nodes, edges = load_all_sources(
            triples_path=str(tmp_path / "t.json"),
            forcegraph_path=str(tmp_path / "g.json"),
            concept_graph_path=str(tmp_path / "missing.json"),
        )
        got = _edges(edges)
        assert len(got) == 2  # parallel edges survive (MultiDiGraph semantics)
        node_rows = nodes.take_all()
        assert len({r["entity"] for r in node_rows}) == len(node_rows)  # deduped
        types = {r["entity"]: r["type"] for r in node_rows}
        assert types["displacement"] == "concept"  # first source wins
