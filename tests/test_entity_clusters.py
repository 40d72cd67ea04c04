"""Entity-resolution clustering composite: planted typo chains
resolve to min-id canonical clusters through score thresholding."""

from __future__ import annotations

import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.dedup import resolve_dup_mapping
from ai_knowledge_graph_ray.stages.fuzzy import record_linkage


class TestEntityClusters:
    def test_threshold_then_cluster(self):
        # ids encoded in names; aaaa1/aaab1/aaac1 chain (same nation),
        # bbbb1/bbbc1 pair with DIFFERENT nation (score 14 < 15 -> no
        # cluster), dddd1 isolated
        df = pd.DataFrame(
            {
                "name": ["aaaa1", "aaab1", "aaac1", "bbbb1", "bbbc1", "dddd1"],
                "id": [1, 2, 3, 4, 5, 6],
                "nat": ["1", "1", "1", "2", "3", "4"],
                "seg": ["A", "A", "A", "B", "B", "C"],
            }
        )
        scored = record_linkage(
            ray.data.from_pandas(df).repartition(2), "name",
            [("nat", 8, -3), ("seg", 5, -2)], name_weight=12,
        ).to_pandas()
        ids = dict(zip(df["name"], df["id"]))
        keep = scored[scored["score"] >= 15]
        pairs = pd.DataFrame(
            {
                "id_a": keep["name_a"].map(ids).astype("int64"),
                "id_b": keep["name_b"].map(ids).astype("int64"),
            }
        )
        mapping = (
            resolve_dup_mapping(ray.data.from_pandas(pairs), "id")
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        got = dict(zip(mapping["id"], mapping["dup_of"]))
        # aaab1 and aaac1 both collapse to aaaa1; bbb pair rejected
        assert got == {2: 1, 3: 1}
