"""Determinism under parallelism (per-url byte identity, stable triple
output across block layouts) and hot-key skew behavior (FIXTURES.md
F7, SURVEY.md §4.1)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ai_knowledge_graph_ray.pipelines.kg import build_graph
from ai_knowledge_graph_ray.sources.pages import pages_from_documents
from ai_knowledge_graph_ray.stages.canonicalize import entity_counts
from ai_knowledge_graph_ray.stages.docs import extract_docs
from ai_knowledge_graph_ray.stages.infer import (
    distinct_edges,
    infer_transitive_broadcast,
    with_lineage,
)

CFG = {
    "chunking": {"chunk_size": 100, "overlap": 20},
    "runtime": {"lexical_mode": "exact"},
}


class TestDeterminism:
    def test_extracted_text_byte_identical_across_parallelism(self):
        a = (
            extract_docs(pages_from_documents("/root/testdata/sf0.001"))
            .select_columns(["url", "text"])
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        b = (
            extract_docs(
                pages_from_documents("/root/testdata/sf0.001", override_num_blocks=17)
            )
            .select_columns(["url", "text"])
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_final_triples_stable_across_block_layouts(self):
        def spo(num_blocks):
            pages = pages_from_documents(
                "/root/testdata/sf0.001", override_num_blocks=num_blocks
            ).limit(40)
            res = build_graph(pages, CFG)
            return sorted(
                (r["subject"], r["predicate"], r["object"])
                for r in res["triples"]
                .select_columns(["subject", "predicate", "object"])
                .take_all()
            )

        assert spo(4) == spo(19)


def _skew_triples(n_spokes: int = 400):
    """One hot entity with ~n_spokes edges + a sparse tail."""
    rows = []
    for i in range(n_spokes):
        rows.append(("hub", "links", f"spoke{i:04d}"))
    for i in range(50):
        rows.append((f"tail{i}", "touches", f"tail{i+1}"))
    tbl = pa.table(
        {
            "url": pa.array(["u"] * len(rows), pa.string()),
            "chunk_id": pa.array([1] * len(rows), pa.int32()),
            "seq": pa.array(list(range(len(rows))), pa.int32()),
            "subject": pa.array([r[0] for r in rows], pa.string()),
            "predicate": pa.array([r[1] for r in rows], pa.string()),
            "object": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return with_lineage(ray.data.from_arrow(tbl), "extracted").materialize()


class TestSkew:
    def test_entity_counts_hot_key(self):
        base = _skew_triples()
        counts = dict(
            (r["entity"], r["count"]) for r in entity_counts(base).take_all()
        )
        assert counts["hub"] == 400  # partial-count combine is exact under skew

    def test_transitive_cap_bounds_hot_mid(self):
        base = _skew_triples()
        # Add in-edges to the hub so hub is a mid with in x out = 10x400.
        extra = pa.table(
            {
                "url": pa.array(["u"] * 10, pa.string()),
                "chunk_id": pa.array([2] * 10, pa.int32()),
                "seq": pa.array(list(range(10)), pa.int32()),
                "subject": pa.array([f"feeder{i}" for i in range(10)], pa.string()),
                "predicate": pa.array(["feeds"] * 10, pa.string()),
                "object": pa.array(["hub"] * 10, pa.string()),
            }
        )
        full = base.union(
            with_lineage(ray.data.from_arrow(extra), "extracted")
        ).materialize()
        edges_pd = distinct_edges(full).to_pandas()
        uncapped = infer_transitive_broadcast(edges_pd).count()
        capped = infer_transitive_broadcast(edges_pd, max_fanout_per_mid=20).count()
        assert uncapped >= 10 * 400  # the quadratic hot-mid blowup is real
        assert capped <= 10 * 20 + 200  # and the cap bounds it


class TestSkewJoin:
    """skew_join: hot keys take the broadcast bypass, cold keys the
    bucketed join — output identical to the plain join on a corpus with
    a planted 100x-hot key."""

    def _sides(self):
        import pyarrow as pa
        import ray.data as rd

        left_rows = [("hot", i) for i in range(500)] + [
            (f"k{i % 20}", i) for i in range(200)
        ]
        right_rows = [("hot", "H")] + [(f"k{i}", f"V{i}") for i in range(20)]
        left = rd.from_arrow(
            pa.table(
                {
                    "key": pa.array([r[0] for r in left_rows], pa.string()),
                    "val": pa.array([r[1] for r in left_rows], pa.int64()),
                }
            )
        ).repartition(6)
        right = rd.from_arrow(
            pa.table(
                {
                    "key": pa.array([r[0] for r in right_rows], pa.string()),
                    "rv": pa.array([r[1] for r in right_rows], pa.string()),
                }
            )
        )
        return left, right

    def test_equals_plain_join(self):
        from ai_knowledge_graph_ray.stages.relational import cogroup_join, skew_join

        left, right = self._sides()
        plain = sorted(
            (r["key"], r["val"], r["rv"])
            for r in cogroup_join(left, right, on=["key"]).take_all()
        )
        explicit = sorted(
            (r["key"], r["val"], r["rv"])
            for r in skew_join(left, right, on=["key"], hot_keys=["hot"]).take_all()
        )
        auto = sorted(
            (r["key"], r["val"], r["rv"])
            for r in skew_join(
                left, right, on=["key"], hot_key_threshold=100
            ).take_all()
        )
        assert plain == explicit == auto
        assert len(plain) == 700

    def test_no_hot_keys_falls_through(self):
        from ai_knowledge_graph_ray.stages.relational import cogroup_join, skew_join

        left, right = self._sides()
        out = sorted(
            (r["key"], r["val"], r["rv"])
            for r in skew_join(
                left, right, on=["key"], hot_key_threshold=10_000
            ).take_all()
        )
        want = sorted(
            (r["key"], r["val"], r["rv"])
            for r in cogroup_join(left, right, on=["key"]).take_all()
        )
        assert out == want


class TestLeftOuterJoin:
    def test_left_outer_keeps_unmatched_with_nulls(self):
        import pandas as pd
        import ray.data

        from ai_knowledge_graph_ray.stages.relational import cogroup_join

        import pyarrow as pa

        left = ray.data.from_arrow(
            pa.table({"key": ["a", "b", "c", "a"], "val": [1, 2, 3, 4]})
        )
        right = ray.data.from_arrow(pa.table({"key": ["a", "x"], "rv": [10, 99]}))
        rows = sorted(
            (r["key"], r["val"], r["rv"])
            for r in cogroup_join(left, right, on=["key"], how="left_outer").take_all()
        )
        assert rows == [
            ("a", 1, 10),
            ("a", 4, 10),
            ("b", 2, None),
            ("c", 3, None),
        ]

    def test_left_outer_matches_pandas_merge(self):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from ai_knowledge_graph_ray.stages.relational import cogroup_join

        rng = np.random.default_rng(7)
        l = pd.DataFrame(
            {"key": rng.integers(0, 50, 400).astype(str), "val": np.arange(400)}
        )
        r = pd.DataFrame({"key": [str(k) for k in range(0, 50, 3)],
                          "rv": list(range(0, 50, 3))})
        got = sorted(
            (x["key"], x["val"], x["rv"])
            for x in cogroup_join(
                ray.data.from_arrow(pa.Table.from_pandas(l)),
                ray.data.from_arrow(pa.Table.from_pandas(r)),
                on=["key"], how="left_outer",
            ).take_all()
        )
        m = l.merge(r, on="key", how="left")
        want = sorted(
            (k, v, None if pd.isna(rv) else int(rv))
            for k, v, rv in zip(m["key"], m["val"], m["rv"])
        )
        assert got == want
