"""End-to-end KG construction pipeline (the reference's
``generate-graph.py`` lifecycle, ``main.py:240-314``, rebuilt as a
composition of ``Dataset -> Dataset`` phases).

Each phase is callable à la carte (like ``scripts/finalize_graph.py``
re-runs phases 2-4 on a stored corpus):

    pages --extract_docs--> docs --chunk_docs--> chunks
          --extract_triples--> triples_raw
          --standardize_triples--> triples_std        (Phase 2)
          --infer_relationships--> triples_final      (Phase 3)
          --edges_table/nodes_table--> edges, nodes   (materialize)

Config mirrors the reference's TOML sections (``config.toml:1-35``):
``llm``, ``chunking``, ``standardization``, ``inference`` — plus
Ray-specific ``runtime`` knobs (actor-pool size, batch size, join
partitions, skew caps).
"""

from __future__ import annotations

from typing import Any

import ray.data

from ..stages.chunk import chunk_docs
from ..stages.docs import extract_docs
from ..stages.extract import extract_triples
from ..stages.canonicalize import standardize_triples
from ..stages.infer import infer_relationships, with_lineage
from ..stages.materialize import (
    centrality_blend_sizes,
    edges_table,
    graph_stats,
    louvain_communities,
    nodes_table,
)

DEFAULT_CONFIG: dict[str, Any] = {
    "llm": {"provider": "mock"},
    # Reference defaults: config.toml:20-22 (500/50).
    "chunking": {"chunk_size": 500, "overlap": 50},
    "standardization": {"enabled": True, "use_llm_for_entities": False, "second_pass": True},
    "inference": {"enabled": True, "use_llm_for_inference": False},
    # communities: "components" (weak components, the scale default),
    # "louvain" (reference visualization.py:186-205 parity, driver-side
    # over the count-gated edge residue), or "lpa" (distributed label
    # propagation — the community-detection path that works at any edge
    # count). sizing: "degree" or "blend" (reference
    # 0.5·deg + 0.3·btw + 0.2·eig, small graphs only).
    "materialize": {"communities": "components", "sizing": "degree"},
    "runtime": {
        "extract_concurrency": None,   # None -> autoscale (1, cpus-2)
        "extract_batch_size": 64,
        "num_partitions": None,        # None -> sized to cluster CPUs
        "max_fanout_per_mid": None,   # transitive-join skew cap; set at scale
        "lexical_mode": "auto",
        "langs": None,                # optional language allow-list
    },
}


def _merged(config: dict | None) -> dict:
    cfg = {k: dict(v) for k, v in DEFAULT_CONFIG.items()}
    for k, v in (config or {}).items():
        if isinstance(v, dict):
            cfg.setdefault(k, {}).update(v)
        else:
            cfg[k] = v
    return cfg


def build_graph(
    pages: ray.data.Dataset,
    config: dict | None = None,
    *,
    extra_raw: ray.data.Dataset | None = None,
) -> dict[str, Any]:
    """Run the full pipeline over a ``pages`` dataset.

    Returns ``{"triples": Dataset, "edges": Dataset, "nodes": Dataset,
    "components": dict, "config": dict}`` — all datasets lazy until
    consumed. Call :func:`collect_stats` for run metrics.

    ``extra_raw`` optionally unions a stored raw-triples corpus into
    Phase 1's output before the global phases (see
    :func:`update_graph`).
    """
    cfg = _merged(config)
    rt = cfg["runtime"]
    if rt.get("extract_concurrency") is None:
        # Fixed-size pool, leaving CPU headroom for the read/shuffle
        # stages (a pool reserving every CPU deadlocks the streaming
        # executor). Fixed beats autoscaling here: the (1, N) ramp-up
        # measured ~2x slower on the extraction stage because the pool
        # grows one actor at a time while the backlog waits.
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        rt["extract_concurrency"] = max(1, cpus - 2)

    docs = extract_docs(pages, langs=rt.get("langs"))
    chunks = chunk_docs(
        docs, cfg["chunking"]["chunk_size"], cfg["chunking"]["overlap"]
    )
    triples = extract_triples(
        chunks,
        cfg,
        concurrency=rt["extract_concurrency"],
        batch_size=rt["extract_batch_size"],
    )
    if extra_raw is not None:
        from ..stages.extract import TRIPLES_RAW_SCHEMA

        # align to the raw schema (drop lineage/extra columns a stored
        # corpus may carry) so the union is exactly Phase 1's multiset
        triples = triples.union(
            extra_raw.select_columns([f.name for f in TRIPLES_RAW_SCHEMA])
        )

    # Weighted collapse fast path: Phase-1 output is massively
    # duplicated (every chunk of every page re-emits its triples —
    # bench corpus: 3.2M raw rows -> 9k distinct). Collapsing ONCE
    # here to (distinct key, representative row, raw multiplicity)
    # lets Phase 2's alias apply and Phase 3's scans run over the
    # distinct residue instead of re-scanning the raw table twice.
    # Output-identical (max-of-maxes; weighted entity frequencies) —
    # pinned by test_weighted_collapse. Disabled when model-assisted
    # inference is on: the reference's context selection deliberately
    # reads duplicate context triples from the raw table.
    weighted = (
        rt.get("weighted_collapse", True)
        and cfg["standardization"].get("enabled", True)
        # Phase 3's final dedup is what makes the collapse invisible in
        # the output; with inference disabled the contract is the raw
        # standardized table (duplicates included) — keep it.
        and cfg["inference"].get("enabled", True)
        and not cfg["inference"].get("use_llm_for_inference", False)
    )
    weight_col = None
    if weighted:
        import ray

        from ..stages.infer import dedup_triples_weighted

        # The collapse shuffle's input is (distinct keys x input
        # blocks): extraction emits one small block per task, so
        # coalescing to ~1 block/CPU first shrinks the map-side
        # combiner residue — and the shuffle — ~4x (measured 7.2 s ->
        # 2.0 s on the 320k-doc bench). Coalesce BEFORE attaching
        # lineage columns: the raw table moves ~5x fewer bytes. At
        # corpus scale, where Phase-1 blocks already reach the target
        # block size, set runtime.collapse_coalesce = 0 to disable
        # (coalescing 100 TB into cpus blocks would create oversized
        # blocks).
        n_coalesce = rt.get("collapse_coalesce")
        if n_coalesce is None:
            n_coalesce = int(ray.cluster_resources().get("CPU", 8))
        if n_coalesce:
            triples = triples.repartition(int(n_coalesce))
        triples = dedup_triples_weighted(with_lineage(triples, "extracted"))
        weight_col = "weight"

    # Phase boundary: Phases 2/3 fan out into several consumers
    # (entity counts, component residue, transitive self-join, lexical
    # blocking) — pin the triple table in the object store once so the
    # expensive extraction stage is not re-executed per consumer. The
    # triples table is orders of magnitude smaller than the pages
    # input; at cluster scale this is a spillable object-store pin,
    # or swap for a Parquet checkpoint via state.checkpoint.
    if rt.get("materialize_intermediates", True):
        triples = triples.materialize()

    if cfg["standardization"].get("enabled", True):
        triples, _alias = standardize_triples(triples, cfg, weight_col=weight_col)
        # Attach lineage before the phase boundary so Phase 3's several
        # consumers share one already-lineaged materialization.
        triples = with_lineage(triples, "extracted")
        if weighted:
            # multiplicities served the election; drop them before the
            # phase boundary (Phase 3 re-dedups post-alias keys anyway)
            triples = triples.map_batches(
                lambda b: b.drop_columns(["weight"])
                if "weight" in b.column_names
                else b,
                batch_format="pyarrow",
            )
        if rt.get("materialize_intermediates", True):
            triples = triples.materialize()

    components: dict[str, int] = {}
    if cfg["inference"].get("enabled", True):
        triples, components = infer_relationships(
            triples,
            cfg,
            lexical_mode=rt["lexical_mode"],
            num_partitions=rt["num_partitions"],
            max_fanout_per_mid=rt["max_fanout_per_mid"],
        )
    else:
        triples = with_lineage(triples, "extracted")

    # The final table feeds three consumers (edges, nodes, stats) —
    # pin it once.
    if rt.get("materialize_intermediates", True):
        triples = triples.materialize()

    edges = edges_table(triples)
    mat_cfg = cfg.get("materialize", {})
    if mat_cfg.get("communities") == "louvain":
        louv = louvain_communities(edges)
        if louv is not None:  # over the gate: keep weak components
            components = louv
    elif mat_cfg.get("communities") == "lpa":
        from ..stages.graph_algos import label_propagation_communities

        components = label_propagation_communities(edges)
    sizes = None
    if mat_cfg.get("sizing") == "blend":
        sizes = centrality_blend_sizes(edges)
    nodes = nodes_table(edges, components, sizes=sizes)
    return {
        "triples": triples,
        "edges": edges,
        "nodes": nodes,
        "components": components,
        "config": cfg,
    }


def update_graph(
    prior_raw: ray.data.Dataset,
    new_pages: ray.data.Dataset,
    config: dict | None = None,
) -> dict[str, Any]:
    """Incremental corpus growth: extract triples from the NEW pages
    only, union the stored raw-triples corpus (``scripts/
    finalize_graph.py``'s re-finalize lifecycle, Ray-native), and
    re-run the global phases. The global phases always see the full
    population — alias election and inference are corpus-level by the
    reference's contract — so only Phase 1's per-page work is saved.

    Output is IDENTICAL to a full rebuild over old+new pages:
    extraction is per-page deterministic and every order-sensitive
    phase keys on explicit ``(url, chunk_id, seq)`` columns, so the
    union multiset equals the one-shot Phase-1 output (pinned by
    ``TestIncrementalUpdate``). For resumable on-disk increments use
    ``pipelines/run.py``, which is this same shape with a partitioned
    checkpoint sink.
    """
    return build_graph(new_pages, config, extra_raw=prior_raw)


def collect_stats(result: dict[str, Any]) -> dict:
    return graph_stats(result["edges"], result["nodes"], result["components"])
