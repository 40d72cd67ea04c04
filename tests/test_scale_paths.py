"""Scale-path equivalence: distributed election vs driver election;
label-propagation components vs union-find; join-based alias apply vs
broadcast apply."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.canonicalize import (
    apply_alias_map,
    apply_alias_map_join,
    elect_canonical,
    elect_canonical_distributed,
    entity_counts,
)
from ai_knowledge_graph_ray.stages.infer import (
    connected_components,
    connected_components_distributed,
    with_lineage,
)

PAIRS = [
    ("the steam engine", 5),
    ("steam engine", 9),
    ("steam  engine", 1),
    ("ai", 4),
    ("an ai", 4),        # count tie with "ai" -> shorter wins
    ("railway", 2),
    ("railway network", 2),
    ("of and", 1),       # empty norm key -> excluded from grouping
]


def test_distributed_election_equals_driver():
    driver = elect_canonical(PAIRS, second_pass=False)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "entity": pa.array([p[0] for p in PAIRS], pa.string()),
                "count": pa.array([p[1] for p in PAIRS], pa.int64()),
            }
        )
    )
    dist = {
        r["variant"]: r["standard"]
        for r in elect_canonical_distributed(ds).take_all()
    }
    assert dist == driver


def _triples(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["u"] * len(rows), pa.string()),
                "chunk_id": pa.array([1] * len(rows), pa.int32()),
                "seq": pa.array(list(range(len(rows))), pa.int32()),
                "subject": pa.array([r[0] for r in rows], pa.string()),
                "predicate": pa.array([r[1] for r in rows], pa.string()),
                "object": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def test_join_alias_apply_equals_broadcast():
    ds = with_lineage(
        _triples(
            [
                ("Steam Engine", "powers", "the mill", 1),
                ("steam engine", "propels", "loom", 2),
                ("unmapped", "touches", "also unmapped", 3),
            ]
        ),
        "extracted",
    ).materialize()
    alias = {"steam engine": "steam engine", "the mill": "mill", "loom": "loom"}
    bcast = sorted(
        (r["subject"], r["predicate"], r["object"])
        for r in apply_alias_map(ds, alias).take_all()
    )
    alias_ds = ray.data.from_arrow(
        pa.table(
            {
                "variant": pa.array(list(alias), pa.string()),
                "standard": pa.array(list(alias.values()), pa.string()),
            }
        )
    )
    joined = sorted(
        (r["subject"], r["predicate"], r["object"])
        for r in apply_alias_map_join(ds, alias_ds).take_all()
    )
    assert joined == bcast
    # case-insensitive lookup worked; unmapped rows fell through
    assert ("steam engine", "powers", "mill") in joined
    assert ("unmapped", "touches", "also unmapped") in joined


def test_label_propagation_equals_union_find():
    # two chains + one isolated pair + a star
    rows = [
        ("a1", "r", "a2", 1),
        ("a2", "r", "a3", 1),
        ("a3", "r", "a4", 1),
        ("b1", "r", "b2", 1),
        ("hubx", "r", "s1", 1),
        ("hubx", "r", "s2", 1),
        ("s2", "r", "s3", 1),
    ]
    ds = _triples(rows)
    uf = connected_components(
        [(r[0], r[2]) for r in rows]
    )
    dist_rows = connected_components_distributed(
        ds.select_columns(["subject", "object"])
    ).take_all()
    dist = {r["entity"]: r["component"] for r in dist_rows}
    assert set(dist) == set(uf)
    # same PARTITION: entities grouped identically
    from collections import defaultdict

    g1, g2 = defaultdict(set), defaultdict(set)
    for e, lab in uf.items():
        g1[lab].add(e)
    for e, lab in dist.items():
        g2[lab].add(e)
    assert sorted(map(sorted, g1.values())) == sorted(map(sorted, g2.values()))


def test_standardize_gate_equals_driver_no_second_pass():
    """standardize_triples over the entity-residue gate (forced with a
    zero cap) must match the driver path with second_pass=False (the
    distributed election intentionally has no O(k^2) second pass)."""
    from ai_knowledge_graph_ray.stages.canonicalize import standardize_triples

    rows = [
        ("the water wheel", "powers", "textile mill"),
        ("water wheel", "turns", "grain mill"),
        ("Water Wheel", "uses", "river flow"),
        ("river flow", "drives", "water wheel"),
        ("railway", "connects", "cities"),
    ]
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
    base = with_lineage(ray.data.from_arrow(tbl), "extracted").materialize()

    def spo(ds):
        return sorted(
            (r["subject"], r["predicate"], r["object"])
            for r in ds.select_columns(["subject", "predicate", "object"]).take_all()
        )

    drv, drv_alias = standardize_triples(
        base, {"standardization": {"second_pass": False}}
    )
    scl, scl_alias = standardize_triples(
        base, {"standardization": {"residue_max_entities": 0}}
    )
    assert spo(drv) == spo(scl)
    assert isinstance(drv_alias, dict)
    assert isinstance(scl_alias, ray.data.Dataset)
    # same alias decisions (restricted to non-identity rows)
    scl_map = {
        r["variant"]: r["standard"]
        for r in scl_alias.take_all()
        if r["variant"] != r["standard"]
    }
    drv_map = {k: v for k, v in drv_alias.items() if k != v}
    assert scl_map == drv_map


def test_tiling_paths_bit_identical(monkeypatch):
    """pages_from_documents replication: the driver-put fast path
    (small tilings, bench default) and the distributed range-fanout
    path (probe scale) must produce the same rows bit-for-bit."""
    from ai_knowledge_graph_ray.sources.pages import pages_from_documents

    sf = "/root/testdata/sf0.001"
    a = pages_from_documents(sf, replication=3).to_pandas()
    monkeypatch.setenv("GRAFT_TILE_DRIVER_MAX_ROWS", "0")  # force distributed
    b = pages_from_documents(sf, replication=3).to_pandas()
    key = sorted(a.columns)
    a = a[key].sort_values(key).reset_index(drop=True)
    b = b[key].sort_values(key).reset_index(drop=True)
    assert len(a) == 3 * pages_from_documents(sf).count()
    assert a.equals(b)
