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


class TestResidueGate:
    """``infer_relationships`` with a forced zero residue gate (the
    full scale path: distributed components + shuffle transitive +
    join lexical) must produce the same final triples as the driver
    path, and its Dataset-shaped labels must flow through
    nodes_table/graph_stats."""

    def test_scale_path_equals_driver_path(self):
        from ai_knowledge_graph_ray.stages.infer import infer_relationships

        base = _triples_ds()
        drv_final, drv_labels = infer_relationships(base, {})
        scl_final, scl_labels = infer_relationships(
            base, {"inference": {"residue_max_edges": 0}}
        )
        assert _spo(drv_final) == _spo(scl_final)
        assert isinstance(drv_labels, dict)
        assert isinstance(scl_labels, ray.data.Dataset)
        # label partitions agree: same entity grouping either way
        import collections

        drv_groups = collections.defaultdict(set)
        for ent, lab in drv_labels.items():
            drv_groups[lab].add(ent)
        scl_groups = collections.defaultdict(set)
        for r in scl_labels.take_all():
            scl_groups[r["component"]].add(r["entity"])
        assert sorted(map(sorted, drv_groups.values())) == sorted(
            map(sorted, scl_groups.values())
        )

    def test_dataset_labels_through_materialize(self):
        from ai_knowledge_graph_ray.stages.infer import infer_relationships
        from ai_knowledge_graph_ray.stages.materialize import (
            edges_table,
            graph_stats,
            nodes_table,
        )

        base = _triples_ds()
        final, labels = infer_relationships(
            base, {"inference": {"residue_max_edges": 0}}
        )
        final = final.materialize()
        edges = edges_table(final)
        nodes = nodes_table(edges, labels)
        rows = nodes.take_all()
        assert rows and all(r["community"] >= 0 for r in rows)
        stats = graph_stats(edges, nodes, labels)
        assert stats["nodes"] == len(rows)
        assert stats["communities"] >= 1

    def test_community_residues_bounded_and_ordered(self):
        from ai_knowledge_graph_ray.stages.infer import (
            community_residues,
            connected_components_distributed,
            distinct_edges,
        )

        base = _triples_ds()
        labels = connected_components_distributed(distinct_edges(base))
        res = community_residues(labels, top_k=5, per_comm=2)
        assert res  # one component in the fixture
        assert all(len(s) <= 2 for s in res)


class TestContextSelection:
    def test_local_topk_equals_global_sort(self):
        """_context_triples_for must pick exactly the rows a global
        sort().limit() would, on a many-block dataset."""
        from ai_knowledge_graph_ray.stages.infer import (
            ORDER_COLS,
            _context_triples_for,
            with_lineage,
        )

        rows = []
        for u in range(6):
            for c in range(10):
                rows.append((f"u{u}", c, c, f"ent{u}", "rel", f"obj{c}"))
        tbl = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "chunk_id": pa.array([r[1] for r in rows], pa.int32()),
                "seq": pa.array([r[2] for r in rows], pa.int32()),
                "subject": pa.array([r[3] for r in rows], pa.string()),
                "predicate": pa.array([r[4] for r in rows], pa.string()),
                "object": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        ds = with_lineage(
            ray.data.from_arrow(tbl).repartition(8), "extracted"
        ).materialize()
        ents = {"ent1", "ent3", "ent5"}
        got = _context_triples_for(ds, ents, limit=7)
        want = (
            ds.filter(lambda r: r["subject"] in ents or r["object"] in ents)
            .sort(ORDER_COLS)
            .limit(7)
            .take_all()
        )
        key = lambda r: (r["url"], r["chunk_id"], r["seq"])
        assert [key(r) for r in got] == [key(r) for r in want]
        assert len(got) == 7


class TestPrededupEquivalence:
    """``infer_relationships(prededup_input=True)`` (ONE full-table
    pass, everything downstream over the distinct residue) must be
    output-identical to the two-pass path on Phase-2-shaped input —
    including heavy duplication with shuffled order keys."""

    def _dup_triples(self):
        rows = [
            ("alpha", "leads to", "beta"),
            ("beta", "leads to", "gamma"),
            ("gamma", "creates", "delta"),
            ("alpha", "creates", "delta"),
            ("epsilon", "uses", "beta"),
            ("delta", "feeds", "epsilon"),
        ]
        # every triple 7x, interleaved, distinct (url, chunk_id, seq)
        url, cid, seq, s, p, o = [], [], [], [], [], []
        k = 0
        for copy in range(7):
            for i, (a, b, c) in enumerate(rows):
                url.append(f"u{(k * 13) % 3}")
                cid.append((k * 7) % 11)
                seq.append(k)
                s.append(a)
                p.append(b)
                o.append(c)
                k += 1
        tbl = pa.table(
            {
                "url": pa.array(url, pa.string()),
                "chunk_id": pa.array(cid, pa.int32()),
                "seq": pa.array(seq, pa.int32()),
                "subject": pa.array(s, pa.string()),
                "predicate": pa.array(p, pa.string()),
                "object": pa.array(o, pa.string()),
            }
        )
        return with_lineage(ray.data.from_arrow(tbl), "extracted").materialize()

    def test_identical_output_and_labels(self):
        from ai_knowledge_graph_ray.stages.infer import infer_relationships

        base = self._dup_triples()
        cfg = {"inference": {"enabled": True}}
        fast, labels_fast = infer_relationships(
            base, cfg, lexical_mode="blocked", num_partitions=4,
            prededup_input=True,
        )
        slow, labels_slow = infer_relationships(
            base, cfg, lexical_mode="blocked", num_partitions=4,
            prededup_input=False,
        )
        assert labels_fast == labels_slow
        cols = ["url", "chunk_id", "seq", "subject", "predicate", "object",
                "inferred", "stage"]
        a = sorted(
            tuple(r[c] for c in cols)
            for r in fast.select_columns(cols).take_all()
        )
        b = sorted(
            tuple(r[c] for c in cols)
            for r in slow.select_columns(cols).take_all()
        )
        # full row equality INCLUDING which duplicate's lineage survived
        assert a == b and len(a) > 0
