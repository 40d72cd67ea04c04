"""The last two reference generator families (VERDICT r3 missing #4):
record-annotation analysis (training_generator.py:603-664 generalized)
and checklist-validation reasoning (722-795 generalized)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _edges():
    rows = [
        ("water wheel", "grain mill", "turns"),
        ("water wheel", "sawmill", "turns"),
        ("river flow", "water wheel", "drives"),
        ("gear train", "grain mill", "connects"),
    ]
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.string()),
                "dst": pa.array([r[1] for r in rows], pa.string()),
                "predicate": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


class TestRecordAnalysis:
    def _docs(self):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "The WATER WHEEL at the mill pond was restored.",
                        "A treatise on gear train maintenance.",
                        "Nothing graph-related here at all.",
                    ],
                }
            )
        )

    def test_annotates_matching_docs_only(self):
        from ai_knowledge_graph_ray.stages.training import generate_record_analysis

        out = generate_record_analysis(self._docs(), _edges()).to_pandas()
        # doc 1 mentions "water wheel" (case-insensitive), doc 2 "gear
        # train", doc 3 nothing
        assert len(out) == 2
        assert set(out["category"]) == {"record_analysis"}
        by_input = {r["input"]: r["output"] for _, r in out.iterrows()}
        assert "Record 1." in by_input
        assert "Water Wheel turns: Grain Mill, Sawmill" in by_input["Record 1."]
        assert "Gear Train connects: Grain Mill" in by_input["Record 2."]

    def test_layout_independent(self):
        from ai_knowledge_graph_ray.stages.training import generate_record_analysis

        a = generate_record_analysis(self._docs(), _edges()).to_pandas()
        b = generate_record_analysis(
            self._docs().repartition(3), _edges().repartition(2)
        ).to_pandas()
        key = ["instruction", "input", "output", "category"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )

    def test_empty_graph_yields_no_rows(self):
        from ai_knowledge_graph_ray.stages.training import generate_record_analysis

        empty = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.string()),
                    "dst": pa.array([], pa.string()),
                    "predicate": pa.array([], pa.string()),
                }
            )
        )
        out = generate_record_analysis(self._docs(), empty).to_pandas()
        assert len(out) == 0


class TestValidationQa:
    SPEC = {
        "must_have_all": ["load_test_passed", "schema_reviewed"],
        "must_have_one": ["canary_green", "staging_green"],
        "should_have": ["rollback_plan"],
        "red_flags": ["open_incident", "frozen_window", "missing_owner"],
        "thresholds": {"minimum": 5.0, "good": 7.0, "excellent": 9.0},
    }

    def test_three_scenario_families(self):
        from ai_knowledge_graph_ray.stages.training import generate_validation_qa

        out = generate_validation_qa(self.SPEC).to_pandas()
        cats = out["category"].value_counts().to_dict()
        assert cats["checklist_validation"] == 1
        assert cats["checklist_red_flag"] == 3  # one per red flag
        assert cats["checklist_scoring"] == 1

    def test_red_flag_refuses(self):
        from ai_knowledge_graph_ray.stages.training import generate_validation_qa

        out = generate_validation_qa(self.SPEC).to_pandas()
        rf = out[out["category"] == "checklist_red_flag"].iloc[0]
        assert rf["output"].startswith("No.")
        assert "disqualifier" in rf["output"].lower()

    def test_empty_spec_yields_no_rows(self):
        from ai_knowledge_graph_ray.stages.training import generate_validation_qa

        out = generate_validation_qa({}).to_pandas()
        assert len(out) == 0

    def test_scoring_thresholds_rendered(self):
        from ai_knowledge_graph_ray.stages.training import generate_validation_qa

        out = generate_validation_qa(self.SPEC).to_pandas()
        sc = out[out["category"] == "checklist_scoring"].iloc[0]["output"]
        assert "5.0" in sc and "7.0" in sc and "9.0" in sc
