"""Zone-map clustered layout: pruning really skips files, results
equal a full scan, rebuild is atomic (no duplicate rows), and the
hard-negative attribute exclusion masks before top-k."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.sources.zonemap import (
    MANIFEST,
    read_pruned,
    write_clustered,
)


def _table(n: int = 2000) -> pd.DataFrame:
    rng = np.random.default_rng(2)
    return pd.DataFrame(
        {
            "k": rng.integers(0, 1000, n).astype("int64"),
            "v": np.arange(n, dtype=np.int64),
        }
    )


class TestZonemap:
    def test_prunes_and_matches_full_scan(self, tmp_path):
        df = _table()
        out = str(tmp_path / "layout")
        zones = write_clustered(
            ray.data.from_pandas(df).repartition(6), "k", out, num_files=10
        )
        assert len(zones) >= 8
        ds, frac = read_pruned(out, 100, 199)
        got = ds.to_pandas().sort_values("v").reset_index(drop=True)
        want = (
            df[(df["k"] >= 100) & (df["k"] <= 199)]
            .sort_values("v")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["k", "v"]].astype("int64"), want[["k", "v"]].astype("int64")
        )
        # a 10% key range over a sorted layout must skip most files
        assert frac <= 0.4

    def test_empty_range(self, tmp_path):
        out = str(tmp_path / "layout")
        write_clustered(ray.data.from_pandas(_table(100)), "k", out, num_files=4)
        ds, frac = read_pruned(out, 5000, 6000)
        assert frac == 0.0 and ds.count() == 0

    def test_rebuild_replaces_no_duplicates(self, tmp_path):
        df = _table(300)
        out = str(tmp_path / "layout")
        write_clustered(ray.data.from_pandas(df), "k", out, num_files=4)
        write_clustered(ray.data.from_pandas(df), "k", out, num_files=4)
        ds, _ = read_pruned(out, 0, 1000)
        assert ds.count() == 300  # a second build replaced, not appended
        man = json.load(open(os.path.join(out, MANIFEST)))
        assert man["col"] == "k"


class TestHardNegativeExclusion:
    def test_attr_exclusion_masks_before_topk(self):
        from ai_knowledge_graph_ray.stages.similarity import knn_brute

        # 6 unit vectors on a line: all equally similar; sources
        # alternate. Query 0 (source 'a') must only get 'b' rows.
        n = 6
        vecs = np.tile(np.array([1.0, 0.0]), (n, 1))
        df = pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": list(vecs),
                "source": ["a", "b"] * 3,
            }
        )
        ds = ray.data.from_pandas(df).repartition(2)
        out = knn_brute(
            ds,
            np.array([0]),
            vecs[:1],
            k=10,
            exclude_attr=("source", {0: "a"}),
        ).to_pandas()
        assert set(out["vec_id"]) == {1, 3, 5}
