"""Data-integrity conformance over a pipeline output directory —
rebuild of the reference's hand-rolled suite
(``health_check_full.py:1-173``): required columns, no empty fields,
graph loads, counts consistent with the stats file.

Usage: python tools/health_check.py /tmp/kg_out
"""

from __future__ import annotations

import json
import os
import sys

import duckdb


def check(out_dir: str) -> int:
    failures = []

    def ok(name, cond, detail=""):
        print(("PASS " if cond else "FAIL ") + name + (f" ({detail})" if detail else ""))
        if not cond:
            failures.append(name)

    edges_glob = os.path.join(out_dir, "edges", "*.parquet")
    nodes_glob = os.path.join(out_dir, "nodes", "*.parquet")
    tri_glob = os.path.join(out_dir, "triples", "part=*", "data.parquet")

    edges = duckdb.sql(f"SELECT * FROM '{edges_glob}'").df()
    nodes = duckdb.sql(f"SELECT * FROM '{nodes_glob}'").df()

    ok("edges required columns", {"src", "dst", "predicate", "inferred"} <= set(edges.columns))
    ok("nodes required columns", {"entity", "degree", "community", "size"} <= set(nodes.columns))
    ok("no empty edge endpoints", bool(((edges["src"] != "") & (edges["dst"] != "")).all()))
    ok("no null predicates", bool(edges["predicate"].notna().all()))
    ok("no self loops", bool((edges["src"] != edges["dst"]).all()))
    ok("node degrees positive", bool((nodes["degree"] > 0).all()))

    edge_entities = set(edges["src"]) | set(edges["dst"])
    ok(
        "node set == edge endpoints",
        set(nodes["entity"]) == edge_entities,
        f"{len(nodes)} nodes vs {len(edge_entities)} endpoints",
    )

    stats_path = os.path.join(out_dir, "stats.json")
    if os.path.exists(stats_path):
        stats = json.load(open(stats_path))
        ok("stats.edges matches", stats["edges"] == len(edges), f"{stats['edges']} vs {len(edges)}")
        ok("stats.nodes matches", stats["nodes"] == len(nodes))

    if os.path.exists(os.path.join(out_dir, "triples")):
        tri = duckdb.sql(
            f"SELECT count(*) n, count(DISTINCT partition_id) p FROM '{tri_glob}'"
        ).fetchone()
        man = json.load(open(os.path.join(out_dir, "triples", "_manifest.json")))
        ok("manifest rows match parquet", sum(e["rows"] for e in man) == tri[0])
        ok("manifest partitions match", len(man) == tri[1])

    print(f"\n{'ALL CHECKS PASSED' if not failures else f'{len(failures)} FAILURES: {failures}'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(check(sys.argv[1] if len(sys.argv) > 1 else "/tmp/kg_out"))
