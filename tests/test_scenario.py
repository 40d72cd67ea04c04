"""Scenario-evaluation operator (reference logic_engine.py:165-224
generalized to a batch contract over the materialized tables).

Pinned-fixture scoring: the milli-point blend (7*sat/total +
3*spec/max_spec + 1500 perfect bonus) is computed by hand for a tiny
blueprint and asserted exactly, including specificity sharing, the
red-flag disqualifier, confluence weights, and the go/no-go threshold.
"""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from ai_knowledge_graph_ray.stages.scenario import (
    MAX_RULES,
    evaluate_scenarios,
    rules_from_edges,
    scenarios_from_chunks,
)

RULES = [
    {"model": "silver_bullet", "requirement": "fair value gap present"},
    {"model": "silver_bullet", "requirement": "displacement confirmed"},
    {"model": "silver_bullet", "requirement": "liquidity sweep"},
    {"model": "breaker", "requirement": "breaker block"},
    {"model": "breaker", "requirement": "displacement confirmed"},
]

SCENARIOS = [
    # perfect silver_bullet fit + weighted confluence factor
    {"scenario_id": 1, "signals": ["fair_value_gap", "displacement_confirmed", "liquidity_sweep"]},
    # nothing matches -> no recommendation, no-go
    {"scenario_id": 2, "signals": ["random_concept"]},
    # good fit but carries a red flag -> no-go
    {"scenario_id": 3, "signals": ["fair_value_gap", "displacement_confirmed", "liquidity_sweep", "news_event"]},
    # partial breaker fit, below threshold without confluence
    {"scenario_id": 4, "signals": ["breaker_block"]},
]


def _eval(scenarios=None, **kw):
    kw.setdefault("red_flags", ["news_event"])
    kw.setdefault("weights", {"liquidity_sweep": 2.0})
    kw.setdefault("min_score", 5.0)
    return (
        evaluate_scenarios(
            ray.data.from_items(scenarios or SCENARIOS),
            ray.data.from_items(RULES),
            **kw,
        )
        .to_pandas()
        .set_index("scenario_id")
        .sort_index()
    )


class TestScenarioEval:
    def test_pinned_scores(self, ray_session):
        out = _eval()
        s1 = out.loc[1]
        # silver_bullet: sat 3/3 -> 7000; spec (1000+500+1000)/2500 ->
        # 3000; perfect bonus 1500. Confluence: liquidity_sweep 2.0.
        assert s1["recommendation"] == "silver_bullet"
        assert s1["model_score_milli"] == 11500
        assert s1["confluence_milli"] == 2000
        assert s1["n_satisfied"] == 3 and s1["n_missing"] == 0
        assert s1["n_red_flags"] == 0 and bool(s1["go_no_go"]) is True

        s2 = out.loc[2]
        assert s2["recommendation"] == "" and bool(s2["go_no_go"]) is False
        assert s2["model_score_milli"] == 0

        s3 = out.loc[3]
        assert s3["recommendation"] == "silver_bullet"
        assert s3["n_red_flags"] == 1
        assert bool(s3["go_no_go"]) is False  # disqualified despite fit

        s4 = out.loc[4]
        # breaker: sat 1/2 -> 3500; spec 1000/1500 -> 2000. No
        # confluence -> 5500 >= 5000 threshold.
        assert s4["recommendation"] == "breaker"
        assert s4["model_score_milli"] == 5500
        assert bool(s4["go_no_go"]) is True

    def test_threshold_gates_go(self, ray_session):
        out = _eval(min_score=6.0)
        assert bool(out.loc[4, "go_no_go"]) is False  # 5500 < 6000
        assert bool(out.loc[1, "go_no_go"]) is True

    def test_partition_independent(self, ray_session):
        one = _eval()
        many = (
            evaluate_scenarios(
                ray.data.from_items(SCENARIOS).repartition(4),
                ray.data.from_items(RULES).repartition(3),
                red_flags=["news_event"],
                weights={"liquidity_sweep": 2.0},
            )
            .to_pandas()
            .set_index("scenario_id")
            .sort_index()
        )
        pd.testing.assert_frame_equal(one, many)

    def test_shared_requirement_specificity(self, ray_session):
        # displacement_confirmed alone: shared by both models (spec
        # 500 each). silver_bullet 7000//3=2333 + 3000*500//2500=600;
        # breaker 3500 + 3000*500//1500=1000 -> breaker wins 4500.
        out = _eval(
            [{"scenario_id": 9, "signals": ["displacement_confirmed"]}]
        )
        assert out.loc[9, "recommendation"] == "breaker"
        assert out.loc[9, "model_score_milli"] == 4500

    def test_rules_cap_is_a_hard_error(self, ray_session, monkeypatch):
        import ai_knowledge_graph_ray.stages.scenario as sc

        monkeypatch.setattr(sc, "MAX_RULES", 2)
        with pytest.raises(ValueError, match="cap 2"):
            sc.evaluate_scenarios(
                ray.data.from_items(SCENARIOS), ray.data.from_items(RULES)
            )
        assert MAX_RULES > len(RULES)  # real cap far above fixtures

    def test_empty_scenarios_and_empty_rules(self, ray_session):
        empty = evaluate_scenarios(
            ray.data.from_items(SCENARIOS).filter(lambda r: False),
            ray.data.from_items(RULES),
        )
        assert empty.count() == 0
        no_rules = evaluate_scenarios(
            ray.data.from_items(SCENARIOS),
            ray.data.from_items(RULES).filter(lambda r: False),
        ).to_pandas()
        assert (no_rules["recommendation"] == "").all()
        assert not no_rules["go_no_go"].any()


TRIPLES = [
    # hub "steam engine" -> 3 out-neighbors; "factory" -> 2; "loom" -> 1
    ("steam engine", "powers", "mill", "u1", 0),
    ("steam engine", "powers", "pump", "u1", 0),
    ("steam engine", "moves", "train", "u1", 1),
    ("factory", "contains", "mill", "u2", 0),
    ("factory", "contains", "loom", "u2", 0),
    ("loom", "weaves", "cloth", "u2", 1),
    ("steam engine", "powers", "mill", "u2", 1),  # duplicate edge
]


def _edges_ds():
    return ray.data.from_items(
        [
            {"src": s, "dst": d, "predicate": p, "url": u, "chunk_id": c}
            for s, p, d, u, c in TRIPLES
        ]
    )


def _triples_ds():
    return ray.data.from_items(
        [
            {"subject": s, "predicate": p, "object": d, "url": u, "chunk_id": c}
            for s, p, d, u, c in TRIPLES
        ]
    )


class TestBlueprintDerivation:
    def test_rules_from_edges_hubs_and_caps(self, ray_session):
        rules = rules_from_edges(_edges_ds(), n_models=2).to_pandas()
        got = sorted(map(tuple, rules[["model", "requirement"]].values))
        assert got == [
            ("factory", "loom"),
            ("factory", "mill"),
            ("steam engine", "mill"),
            ("steam engine", "pump"),
            ("steam engine", "train"),
        ]
        capped = rules_from_edges(
            _edges_ds(), n_models=2, max_requirements=1
        ).to_pandas()
        got = sorted(map(tuple, capped[["model", "requirement"]].values))
        # sorted requirement order -> first per model
        assert got == [("factory", "loom"), ("steam engine", "mill")]

    def test_scenarios_from_chunks(self, ray_session):
        scen = scenarios_from_chunks(_triples_ds()).to_pandas()
        assert len(scen) == 4  # (u1,0) (u1,1) (u2,0) (u2,1)
        sets = sorted(tuple(s) for s in scen["signals"])
        assert sets == [
            ("cloth", "loom", "mill", "steam engine"),  # u2#1 incl dup edge
            ("factory", "loom", "mill"),
            ("mill", "pump", "steam engine"),
            ("steam engine", "train"),
        ]
        assert scen["scenario_id"].is_unique
        assert (scen["scenario_id"] >= 0).all()
        # deterministic ids across runs
        again = scenarios_from_chunks(_triples_ds().repartition(3)).to_pandas()
        a = scen.assign(signals=scen["signals"].map(tuple)).sort_values("scenario_id")
        b = again.assign(signals=again["signals"].map(tuple)).sort_values("scenario_id")
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )

    def test_end_to_end_over_derived_blueprint(self, ray_session):
        scen = scenarios_from_chunks(_triples_ds())
        rules = rules_from_edges(_edges_ds(), n_models=2)
        out = evaluate_scenarios(
            scen, rules, weights={"mill": 1.0}, min_score=5.0
        ).to_pandas()
        assert len(out) == 4
        # the u1#0 chunk (mill, pump, steam engine) satisfies 2/3 of
        # steam engine's requirements -> recommendation steam_engine
        by_rec = out["recommendation"].value_counts().to_dict()
        assert by_rec.get("steam_engine", 0) >= 1
