"""row_positions (distributed row_number) and sorted-neighborhood
blocking pairs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.fuzzy import sorted_neighborhood_pairs
from ai_knowledge_graph_ray.stages.relational import row_positions


def _tbl(names, ids):
    return ray.data.from_arrow(
        pa.table(
            {
                "name": pa.array(names, pa.string()),
                "rid": pa.array(ids, pa.int64()),
            }
        )
    )


class TestRowPositions:
    def test_matches_lexsort(self):
        rng = np.random.default_rng(3)
        names = [f"n{int(x):02d}" for x in rng.integers(0, 50, size=200)]
        ids = list(range(200))
        out = row_positions(
            _tbl(names, ids).repartition(7), ["name", "rid"]
        ).to_pandas()
        expect = (
            pd.DataFrame({"name": names, "rid": ids})
            .sort_values(["name", "rid"])
            .reset_index(drop=True)
        )
        got = out.sort_values("pos").reset_index(drop=True)
        assert list(got["pos"]) == list(range(200))
        assert list(got["name"]) == list(expect["name"])
        assert list(got["rid"]) == list(expect["rid"])

    def test_empty(self):
        out = row_positions(_tbl([], []), ["name", "rid"]).to_pandas()
        assert len(out) == 0


class TestSortedNeighborhood:
    def _expected(self, names, ids, w):
        order = sorted(range(len(ids)), key=lambda i: (names[i], ids[i]))
        exp = set()
        for i in range(len(order)):
            for d in range(1, w):
                if i + d < len(order):
                    exp.add((ids[order[i]], ids[order[i + d]], d))
        return exp

    def test_matches_bruteforce(self):
        rng = np.random.default_rng(11)
        names = [f"w{int(x):02d}" for x in rng.integers(0, 30, size=120)]
        ids = list(range(120))
        out = sorted_neighborhood_pairs(
            _tbl(names, ids).repartition(5), "name", "rid", window=4
        ).to_pandas()
        got = set(zip(out["id_a"], out["id_b"], out["dist"]))
        assert got == self._expected(names, ids, 4)

    def test_pair_count_bound(self):
        names = [f"x{i:03d}" for i in range(50)]
        out = sorted_neighborhood_pairs(
            _tbl(names, list(range(50))), "name", "rid", window=5
        ).to_pandas()
        # n*(w-1) - boundary shortfall: exactly sum over d of (n-d)
        assert len(out) == sum(50 - d for d in range(1, 5))
        assert out["dist"].max() == 4

    def test_window_two_is_adjacent_only(self):
        names = ["b", "a", "c"]
        out = sorted_neighborhood_pairs(
            _tbl(names, [10, 20, 30]), "name", "rid", window=2
        ).to_pandas()
        got = set(zip(out["id_a"], out["id_b"]))
        assert got == {(20, 10), (10, 30)}  # sorted order a(20), b(10), c(30)
