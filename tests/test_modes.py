"""Equivalence of scale-path vs parity-path implementations:
broadcast vs shuffle transitive join; exact vs blocked lexical
(SURVEY.md §5.2 item 6 — same results under different physical plans)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.infer import (
    distinct_edges,
    infer_transitive,
    infer_transitive_broadcast,
    with_lineage,
)
from ai_knowledge_graph_ray.stages.lexical import (
    _exact_lexical,
    infer_lexical,
    infer_lexical_fast,
)


def _triples_ds():
    rows = [
        ("alpha", "leads to", "beta", 1),
        ("beta", "leads to", "gamma", 2),
        ("gamma", "creates", "delta", 3),
        ("alpha", "creates", "delta", 4),
        ("epsilon", "uses", "beta", 5),
        ("delta", "feeds", "epsilon", 6),
    ]
    tbl = pa.table(
        {
            "url": pa.array(["u"] * len(rows), pa.string()),
            "chunk_id": pa.array([r[3] for r in rows], pa.int32()),
            "seq": pa.array(list(range(len(rows))), pa.int32()),
            "subject": pa.array([r[0] for r in rows], pa.string()),
            "predicate": pa.array([r[1] for r in rows], pa.string()),
            "object": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return with_lineage(ray.data.from_arrow(tbl), "extracted").materialize()


def _spo(ds):
    return sorted(
        (r["subject"], r["predicate"], r["object"])
        for r in ds.select_columns(["subject", "predicate", "object"]).take_all()
    )


class TestTransitiveModes:
    def test_broadcast_equals_shuffle(self):
        base = _triples_ds()
        edges_pd = distinct_edges(base).to_pandas()
        bcast = _spo(infer_transitive_broadcast(edges_pd))
        shuffle = _spo(infer_transitive(base, num_partitions=4))
        assert bcast == shuffle
        assert len(bcast) > 0

    def test_broadcast_equals_shuffle_with_cap(self):
        base = _triples_ds()
        edges_pd = distinct_edges(base).to_pandas()
        bcast = _spo(infer_transitive_broadcast(edges_pd, max_fanout_per_mid=1))
        shuffle = _spo(infer_transitive(base, num_partitions=4, max_fanout_per_mid=1))
        assert bcast == shuffle

    def test_semantics(self):
        # alpha->beta->gamma must produce "indirectly leads to";
        # existing pairs (alpha, delta) are anti-joined away.
        base = _triples_ds()
        edges_pd = distinct_edges(base).to_pandas()
        out = _spo(infer_transitive_broadcast(edges_pd))
        assert ("alpha", "indirectly leads to", "gamma") in out
        assert not any(s == "alpha" and o == "delta" for s, _, o in out)


ENTITIES = [
    "steam engine",
    "steam power",
    "engine room",
    "capitalism",
    "cap",
    "railway network",
    "network effects",
    "isolated",
]
EXISTING = {("steam engine", "steam power")}


class TestLexicalModes:
    def test_fast_equals_exact(self):
        exact = sorted(_exact_lexical(ENTITIES, EXISTING))
        fast_ds = infer_lexical_fast(ENTITIES, EXISTING, max_pairs_per_block=None)
        fast = _spo(fast_ds)
        assert fast == exact
        assert len(exact) > 0

    def test_join_path_equals_exact(self):
        # the join-based blocked path, driven through a triples ds
        tbl = pa.table(
            {
                "url": pa.array(["u"] * 1, pa.string()),
                "chunk_id": pa.array([1], pa.int32()),
                "seq": pa.array([0], pa.int32()),
                "subject": pa.array(["steam engine"], pa.string()),
                "predicate": pa.array(["generates"], pa.string()),
                "object": pa.array(["steam power"], pa.string()),
            }
        )
        base = with_lineage(ray.data.from_arrow(tbl), "extracted").materialize()
        ents = ["steam engine", "steam power"]
        exact = sorted(_exact_lexical(ents, {("steam engine", "steam power")}))
        joined = _spo(infer_lexical(base, mode="blocked", max_pairs_per_block=None))
        assert joined == exact

    def test_direction_rules(self):
        out = dict()
        for s, p, o in _exact_lexical(["capitalism", "cap"], set()):
            out[(s, o)] = p
        # "cap" ⊂ "capitalism", no shared words -> longer is subject
        assert out == {("capitalism", "cap"): "is type of"}

        res = _exact_lexical(["steam engine", "engine room"], set())
        # shared word "engine" (>=4); neither starts with it ... engine
        # room DOES start with it -> "steam engine" relates to it
        assert res == [("steam engine", "relates to", "engine room")]
