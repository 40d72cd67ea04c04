"""Resumable job entrypoint (the ``ray job submit`` surface).

``run_resumable`` wires the KG pipeline into the partitioned
checkpoint sink: the pages input is filtered by the manifest BEFORE
any heavy work, so a rerun after a mid-job failure only processes the
partitions that never completed (north rule: resumable mid-pipeline
with per-partition checkpoints + lineage).

Phase structure per incremental run: phase 1 (extraction) is
per-partition-safe and its RAW output is what gets checkpointed. The
GLOBAL phases (canonicalization, inference, dedup, materialization)
operate over the union of all completed partitions — they are
recomputed from the checkpoint on finalize, which is cheap relative to
extraction (the reference has the same structure: ``finalize_graph.py``
re-runs phases 2-3 over the stored corpus). Canonicalization MUST live
in the finalize section: electing aliases per increment would let run
r1 and run r2 elect from different entity populations, so a resumed
run could produce different canonical forms than a single-shot run
whenever variants straddle the crash boundary (pinned by
``test_resume_pipeline``'s planted-alias fixture).

CLI (launch with ``ray job submit -- python -m
ai_knowledge_graph_ray.pipelines.run ...`` on a cluster; standalone
it initializes a local session):

    python -m ai_knowledge_graph_ray.pipelines.run \
        --sf-dir /root/testdata/sf0.001 --out /tmp/kg_out \
        --num-partitions 16 --chunk-size 200 --overlap 40
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any

import ray
import ray.data

from ..sources.pages import pages_from_documents, read_pages
from ..stages.chunk import chunk_docs
from ..stages.docs import extract_docs
from ..stages.extract import extract_triples
from ..stages.canonicalize import standardize_triples
from ..stages.infer import infer_relationships, with_lineage
from ..stages.materialize import edges_table, graph_stats, nodes_table
from ..state.checkpoint import PartitionedSink
from .kg import _merged


def run_resumable(
    pages: ray.data.Dataset,
    out_dir: str,
    config: dict | None = None,
    *,
    num_partitions: int = 64,
    run_id: str = "run",
) -> dict[str, Any]:
    """Checkpointed end-to-end run; safe to re-invoke after a crash.

    Returns the stats dict; writes ``triples/`` (per-partition),
    ``edges/``, ``nodes/``, ``stats.json`` under ``out_dir``.
    """
    cfg = _merged(config)
    rt = cfg["runtime"]
    if rt.get("extract_concurrency") is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        rt["extract_concurrency"] = max(1, cpus - 2)

    sink = PartitionedSink(
        os.path.join(out_dir, "triples"),
        num_partitions=num_partitions,
        key_col="url",
        run_id=run_id,
    )

    # Incremental section: pending partitions only.
    pending = sink.filter_pending(pages)
    docs = extract_docs(pending, langs=rt.get("langs"))
    chunks = chunk_docs(docs, cfg["chunking"]["chunk_size"], cfg["chunking"]["overlap"])
    raw = extract_triples(
        chunks, cfg, concurrency=rt["extract_concurrency"],
        batch_size=rt["extract_batch_size"],
    )
    # STREAMING into the sink: no materialize barrier — the sink's own
    # consumption is the single execution of the extraction pipeline,
    # so blocks flow read -> extract -> partition shuffle -> atomic
    # per-partition write with backpressure, never holding the whole
    # raw-triples set in the object store. An all-done (empty) pending
    # set writes nothing and adds no manifest entries.
    sink.write(with_lineage(raw, "extracted"), stage="triples_raw")

    # Global section: recompute over ALL completed partitions.
    # Standardization runs HERE, over the full corpus, never per
    # increment — alias election must see the global entity population.
    all_raw = sink.read_all(expected_stage="triples_raw").drop_columns(
        ["partition_id", "run_id"]
    )
    if cfg["standardization"].get("enabled", True):
        all_std, _alias = standardize_triples(all_raw, cfg)
        all_std = with_lineage(all_std, "extracted")
    else:
        all_std = with_lineage(all_raw, "extracted")
    triples, components = infer_relationships(
        all_std,
        cfg,
        lexical_mode=rt["lexical_mode"],
        num_partitions=rt["num_partitions"],
        max_fanout_per_mid=rt["max_fanout_per_mid"],
    )
    triples = triples.materialize()
    edges = edges_table(triples)
    nodes = nodes_table(edges, components)
    # edges/nodes are DERIVED outputs recomputed on every finalize —
    # replace them (write_parquet appends part files into an existing
    # directory, which would duplicate rows on rerun/resume).
    import shutil

    for sub in ("edges", "nodes"):
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
    edges.write_parquet(os.path.join(out_dir, "edges"))
    nodes.write_parquet(os.path.join(out_dir, "nodes"))
    stats = graph_stats(edges, nodes, components)
    with open(os.path.join(out_dir, "stats.json"), "w", encoding="utf-8") as f:
        json.dump(stats, f, indent=1)
    return stats


def main() -> None:
    ap = argparse.ArgumentParser(description="Resumable KG construction job")
    ap.add_argument("--sf-dir", help="testdata dir (documents.parquet synthesized to pages)")
    ap.add_argument("--pages", help="path to a real pages parquet table")
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--chunk-size", type=int, default=500)
    ap.add_argument("--overlap", type=int, default=50)
    ap.add_argument("--run-id", default="run")
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        pages = (
            read_pages(args.pages) if args.pages else pages_from_documents(args.sf_dir)
        )
        stats = run_resumable(
            pages,
            args.out,
            {"chunking": {"chunk_size": args.chunk_size, "overlap": args.overlap}},
            num_partitions=args.num_partitions,
            run_id=args.run_id,
        )
        print(json.dumps(stats))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
