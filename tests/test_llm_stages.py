"""Model-assisted global stages (A3 entity resolution, A4/A5
community inference) exercised with a SCRIPTED model that returns real
JSON — verifying the full accept/validate/apply paths, not just the
mock's no-op."""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.canonicalize import (
    llm_resolve_entities,
    standardize_triples,
)
from ai_knowledge_graph_ray.stages.infer import infer_relationships, with_lineage


class ScriptedModel:
    """Returns canned responses by prompt kind; records calls."""

    def __init__(self, resolution=None, inference=None):
        self.resolution = resolution
        self.inference = inference
        self.calls: list[str] = []

    def chat(self, system_prompt, user_prompt):
        if "entity" in (system_prompt or "").lower() and "merge" in (system_prompt or "").lower():
            self.calls.append("resolution")
            return json.dumps(self.resolution or {})
        self.calls.append("inference")
        return json.dumps(self.inference or [])


def _triples(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["u"] * len(rows), pa.string()),
                "chunk_id": pa.array([r[3] for r in rows], pa.int32()),
                "seq": pa.array(list(range(len(rows))), pa.int32()),
                "subject": pa.array([r[0] for r in rows], pa.string()),
                "predicate": pa.array([r[1] for r in rows], pa.string()),
                "object": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def test_llm_resolution_applied(monkeypatch):
    model = ScriptedModel(resolution={"ai": ["artificial intelligence", "ai system"]})
    mapping = llm_resolve_entities(
        [("ai", 5), ("artificial intelligence", 3), ("ai system", 1), ("coal", 2)], model
    )
    assert mapping == {
        "artificial intelligence": "ai",
        "ai system": "ai",
        "ai": "ai",
    }
    assert model.calls == ["resolution"]


def test_llm_resolution_bad_output():
    model = ScriptedModel()
    model.chat = lambda s, u: "no json at all"
    assert llm_resolve_entities([("a", 1)], model) == {}


def test_standardize_with_llm(monkeypatch):
    import ai_knowledge_graph_ray.functions.model as model_mod

    scripted = ScriptedModel(resolution={"steamx": ["steamy"]})
    monkeypatch.setattr(model_mod, "make_model", lambda cfg: scripted)
    # make_model is imported inside canonicalize at call time via module
    import ai_knowledge_graph_ray.stages.canonicalize as canon

    monkeypatch.setattr(canon, "make_model", lambda cfg: scripted)

    ds = _triples(
        [
            ("steamx", "powers", "millx", 1),
            ("steamy", "propels", "loomx", 2),
        ]
    )
    out, alias = standardize_triples(
        ds, {"standardization": {"use_llm_for_entities": True, "second_pass": False}}
    )
    rows = {(r["subject"], r["object"]) for r in out.take_all()}
    # "steamy" rewritten to "steamx" by the scripted LLM mapping
    assert ("steamx", "loomx") in rows


def test_llm_inference_accepts_valid_triples(monkeypatch):
    import ai_knowledge_graph_ray.stages.infer as infer_mod

    scripted = ScriptedModel(
        inference=[
            {"subject": "island_a", "predicate": "bridges over to the", "object": "island_b"},
            {"subject": "self", "predicate": "loops", "object": "self"},  # dropped
            {"bad": "row"},  # dropped
        ]
    )
    # Two disconnected components so A4 has a pair to work on.
    ds = _triples(
        [
            ("island_a", "contains", "beach_a", 1),
            ("island_a", "contains", "cliff_a", 1),
            ("island_a", "near", "reef_a", 1),
            ("island_a", "has", "port_a", 1),
            ("island_b", "contains", "beach_b", 2),
            ("island_b", "has", "port_b", 2),
            ("island_b", "near", "reef_b", 2),
            ("island_b", "holds", "fort_b", 2),
        ]
    )
    final, labels = infer_relationships(
        ds,
        {"inference": {"use_llm_for_inference": True}},
        model=scripted,
        lexical_mode="exact",
    )
    rows = {
        (r["subject"], r["predicate"], r["object"]): r
        for r in final.take_all()
    }
    # accepted, predicate limited to 3 words ("bridges over to" -> drop
    # trailing stop-word "to" -> "bridges over"), marked inferred
    hit = [k for k in rows if k[0] == "island_a" and k[2] == "island_b"]
    assert hit, rows.keys()
    (s, p, o) = hit[0]
    assert p == "bridges over"
    assert rows[(s, p, o)]["inferred"] is True
    assert not any(k[0] == "self" and k[2] == "self" for k in rows)
    assert "inference" in scripted.calls


def test_a5_hot_pair_duplicates_gated():
    """The A5 within-community connected-pair collect must see only
    DISTINCT (subject, object) pairs: a hot pair duplicated hundreds of
    times yields the same candidate-pair prompt as a single edge (and
    the duplicated edges never change which pairs are proposed)."""
    from ai_knowledge_graph_ray.stages.infer import infer_with_model, with_lineage

    class RecordingModel:
        def __init__(self):
            self.user_prompts = []

        def chat(self, system_prompt, user_prompt):
            self.user_prompts.append(user_prompt)
            return "[]"

    community = {
        "steam engine",
        "steam power",
        "steam boiler",
        "steam valve",
        "steam pipe",
    }

    def _run(hot_copies: int):
        rows = [("steam engine", "generates", "steam power", 1)] * hot_copies
        rows += [("steam boiler", "feeds", "steam pipe", 2)]
        ds = with_lineage(_triples(rows), "extracted").materialize()
        model = RecordingModel()
        infer_with_model(ds, [community], {}, model)
        return model.user_prompts

    single = _run(1)
    hot = _run(400)
    assert len(hot) == 1 and len(single) == 1
    # The candidate-pair section (everything before the context
    # triples) is identical: duplicates are invisible to the collect.
    # The context section legitimately differs (reference semantics
    # keep duplicate context triples).
    pairs_of = lambda p: p.split("Existing relationships")[0]
    assert pairs_of(single[0]) == pairs_of(hot[0])
    # connected pairs are excluded from the proposed pairs
    assert "steam engine and steam power" not in hot[0]
    # unconnected word-sharing pairs are proposed
    assert "steam boiler and steam engine" in hot[0]
