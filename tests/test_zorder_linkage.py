"""Z-order layout keys (locality/pruning property, clipping) and
record-linkage scoring (planted fixture)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.fuzzy import record_linkage
from ai_knowledge_graph_ray.stages.zorder import zorder_key, zorder_layout


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


class TestZorderKey:
    def test_interleave_known_values(self):
        # 2-bit keys: x=0b11, y=0b01 over [0,3] -> z = x1 y1 x0 y0 = 1011
        df = pd.DataFrame({"x": [3], "y": [1], "id": [0]})
        out = zorder_key(
            _ds(df, 1), [("x", 0, 3), ("y", 0, 3)], bits=2, keep_cols=["id"]
        ).to_pandas()
        assert out.iloc[0]["zvalue"] == 0b1011

    def test_clipping(self):
        df = pd.DataFrame({"x": [-5, 100], "y": [0, 0], "id": [0, 1]})
        out = (
            zorder_key(_ds(df, 1), [("x", 0, 3), ("y", 0, 3)], bits=2,
                       keep_cols=["id"])
            .to_pandas()
            .sort_values("id")
        )
        lo, hi = out.iloc[0]["zvalue"], out.iloc[1]["zvalue"]
        # x clipped to 0 and 3
        assert lo == 0 and hi == 0b1010

    def test_locality_beats_row_order(self):
        # uniform grid of (x, y) points in arrival (row) order scattered
        # across x: a small x-y box must touch far fewer contiguous
        # chunks under z-layout than under arrival order.
        rng = np.random.default_rng(3)
        n = 4096
        df = pd.DataFrame(
            {
                "x": rng.integers(0, 256, n).astype("int64"),
                "y": rng.integers(0, 256, n).astype("int64"),
            }
        )
        df["id"] = np.arange(n, dtype=np.int64)
        specs = [("x", 0, 255), ("y", 0, 255)]
        z = (
            zorder_layout(_ds(df, 8), specs, bits=8, keep_cols=["id", "x", "y"])
            .to_pandas()
            .reset_index(drop=True)
        )
        k = 64
        box = lambda d: (d["x"] < 32) & (d["y"] < 32)

        def chunks_hit(frame: pd.DataFrame) -> int:
            chunk = np.arange(len(frame)) * k // len(frame)
            return len(set(chunk[box(frame).to_numpy()]))

        hit_z = chunks_hit(z)
        hit_row = chunks_hit(df)
        assert hit_z < hit_row / 3  # z-layout concentrates the box
        # sorted by zvalue
        assert (np.diff(z["zvalue"].to_numpy()) >= 0).all()


class TestRecordLinkage:
    def test_planted_scores(self):
        df = pd.DataFrame(
            {
                "name": ["alpha", "alphb", "beta", "betaa", "gamma"],
                "nat": ["1", "1", "2", "3", "4"],
                "seg": ["A", "B", "C", "C", "D"],
            }
        )
        out = (
            record_linkage(
                _ds(df, 2), "name", [("nat", 8, -3), ("seg", 5, -2)],
                name_weight=12,
            )
            .to_pandas()
            .sort_values(["name_a", "name_b"])
            .reset_index(drop=True)
        )
        got = {
            (r["name_a"], r["name_b"]): r["score"] for _, r in out.iterrows()
        }
        # alpha~alphb: same nat (+8), diff seg (-2) -> 18
        # beta~betaa: diff nat (-3), same seg (+5) -> 14
        assert got == {("alpha", "alphb"): 18, ("beta", "betaa"): 14}

    def test_no_pairs(self):
        df = pd.DataFrame({"name": ["aaaa", "zzzz"], "nat": ["1", "2"],
                           "seg": ["A", "B"]})
        out = record_linkage(_ds(df, 1), "name", [("nat", 8, -3)]).to_pandas()
        assert len(out) == 0
