"""T-closeness audit: hand-computed total-variation distances,
missing-category handling, layout independence."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.validate import t_closeness_report


def _ds(groups, vals):
    return ray.data.from_arrow(
        pa.table(
            {
                "grp": pa.array(groups, pa.string()),
                "sv": pa.array(vals, pa.string()),
            }
        )
    )


class TestTCloseness:
    def test_hand_computed(self):
        # global: a x4, b x4 (p = 1/2 each). group g1 = [a,a,a,a]:
        # TV = 0.5*(|1-0.5| + |0-0.5|) = 0.5 -> 500 milli.
        # group g2 = [b,b,b,b]: also 500. t=300 -> both fail.
        ds = _ds(["g1"] * 4 + ["g2"] * 4, ["a"] * 4 + ["b"] * 4)
        out = (
            t_closeness_report(ds, ["grp"], "sv", t_milli=300)
            .to_pandas()
            .set_index("grp")
        )
        assert out.loc["g1", "tclose_milli"] == 500
        assert out.loc["g2", "tclose_milli"] == 500
        assert not out["t_ok"].any()

    def test_matching_distribution_is_zero(self):
        # both groups mirror the global 50/50 split exactly
        ds = _ds(
            ["g1", "g1", "g2", "g2"],
            ["a", "b", "a", "b"],
        )
        out = t_closeness_report(ds, ["grp"], "sv", t_milli=100).to_pandas()
        assert (out["tclose_milli"] == 0).all()
        assert out["t_ok"].all()

    def test_missing_category_counts(self):
        # global: a x3 (3/4), b x1 (1/4). group g2 = [a] alone:
        # TV = 0.5*(|1 - 3/4| + |0 - 1/4|) = 0.25 -> 250 milli
        ds = _ds(["g1", "g1", "g1", "g2"], ["a", "b", "a", "a"])
        out = (
            t_closeness_report(ds, ["grp"], "sv", t_milli=300)
            .to_pandas()
            .set_index("grp")
        )
        assert out.loc["g2", "tclose_milli"] == 250
        assert out.loc["g2", "n_rows"] == 1

    def test_layout_independence(self):
        import numpy as np

        rng = np.random.default_rng(3)
        groups = [f"g{int(x)}" for x in rng.integers(0, 8, 400)]
        vals = [f"v{int(x)}" for x in rng.integers(0, 5, 400)]
        a = (
            t_closeness_report(_ds(groups, vals), ["grp"], "sv", t_milli=200)
            .to_pandas().sort_values("grp").reset_index(drop=True)
        )
        b = (
            t_closeness_report(
                _ds(groups, vals).repartition(7), ["grp"], "sv", t_milli=200
            )
            .to_pandas().sort_values("grp").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
