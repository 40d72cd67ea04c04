"""Graph materialization: Parquet ``edges`` / ``nodes`` tables + stats.

Replaces the reference's vis.js HTML output
(``/root/reference/src/knowledge_graph/visualization.py:19-163``) with
queryable tables (the north star's contract):

- ``edges(src, dst, predicate, inferred, chunk_id, url)`` — one row
  per final triple.
- ``nodes(entity, degree, community, size)`` — degree = number of
  incident edges (counting multiplicity, like the reference's
  ``nx.degree`` over the final edge list); community = weak-component
  label (the reference's non-Louvain community notion,
  ``entity_standardization.py:273-312``; Louvain is a viz-only
  concern); ``size`` = the reference's 10-30 scaling applied to
  normalized degree (``visualization.py:207-227`` uses a centrality
  blend — betweenness/eigenvector are not meaningful distributed at
  10^12 scale, so the materialized size uses degree only; documented
  deviation, viz-only).
- ``graph_stats`` — nodes/edges/original vs inferred/communities
  (``main.py:213-216``, ``visualization.py:154-163``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum


def edges_table(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Final triples -> ``edges`` (column renames + projection)."""
    return triples.select_columns(
        ["subject", "object", "predicate", "inferred", "chunk_id", "url"]
    ).rename_columns({"subject": "src", "object": "dst"})


def nodes_table(
    edges: ray.data.Dataset,
    components: "dict[str, int] | ray.data.Dataset | None" = None,
    *,
    sizes: "dict[str, float] | None" = None,
) -> ray.data.Dataset:
    """Distributed degree + community label + display size.

    Degree via the same partial-count-then-combine pattern as entity
    counting (skew-safe). Component labels are broadcast when they are
    the small driver dict; when Phase 3 ran over its residue gate they
    arrive as an ``(entity, component)`` Dataset instead and are
    JOINED on (community id = stable 32-bit hash of the component
    representative — dense renumbering would need a global index, and
    the column is viz-only).
    """

    def _partial(batch: pa.Table) -> pa.Table:
        ents = pa.concat_arrays(
            [batch["src"].combine_chunks().cast(pa.string()),
             batch["dst"].combine_chunks().cast(pa.string())]
        )
        vc = ents.value_counts()
        return pa.table(
            {
                "entity": vc.field("values"),
                "degree": vc.field("counts").cast(pa.int64()),
            }
        )

    deg = (
        edges.select_columns(["src", "dst"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("entity")
        .aggregate(Sum("degree", alias_name="degree"))
    ).materialize()  # small (one row per entity); reused by max + finish
    max_deg = deg.max("degree") or 1

    if isinstance(components, ray.data.Dataset):
        from .infer import sanitize_for_join
        from .relational import cogroup_join

        label_schema = pa.schema([("entity", pa.string()), ("component", pa.string())])
        deg_schema = pa.schema([("entity", pa.string()), ("degree", pa.int64())])
        joined = cogroup_join(
            sanitize_for_join(deg, deg_schema),
            sanitize_for_join(components, label_schema),
            on=["entity"],
            left_schema=deg_schema,
            right_schema=label_schema,
        )

        size_ref = ray.put(sizes)

        def _finish_ds(batch: pd.DataFrame) -> pd.DataFrame:
            comm = (
                pd.util.hash_array(batch["component"].to_numpy(dtype=object))
                % (1 << 31)
            ).astype("int32") if len(batch) else pd.Series([], dtype="int32")
            sz = ray.get(size_ref) if isinstance(size_ref, ray.ObjectRef) else size_ref
            deg_size = 10.0 + 20.0 * (batch["degree"] / max_deg)
            size_col = (
                [sz.get(e, d) for e, d in zip(batch["entity"], deg_size)]
                if sz is not None
                else deg_size
            )
            return pd.DataFrame(
                {
                    "entity": batch["entity"],
                    "degree": batch["degree"].astype("int64"),
                    "community": comm,
                    "size": size_col,
                }
            )

        return joined.map_batches(_finish_ds, batch_format="pandas")

    comp_ref = ray.put(components or {})
    size_ref = ray.put(sizes)

    class _Finish:
        def __init__(self) -> None:
            self.comps: dict[str, int] = ray.get(comp_ref)
            self.sizes: dict[str, float] | None = ray.get(size_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ents = batch["entity"].to_pylist()
            degs = batch["degree"].to_pylist()
            comm = [self.comps.get(e, -1) for e in ents]
            size = [
                self.sizes.get(e, 10.0 + 20.0 * (d / max_deg))
                if self.sizes is not None
                else 10.0 + 20.0 * (d / max_deg)
                for e, d in zip(ents, degs)
            ]
            return pa.table(
                {
                    "entity": batch["entity"],
                    "degree": batch["degree"],
                    "community": pa.array(comm, pa.int32()),
                    "size": pa.array(size, pa.float64()),
                }
            )

    return deg.map_batches(_Finish, batch_format="pyarrow", concurrency=2)


def _distinct_undirected_pairs(
    edges: ray.data.Dataset, *, max_edges: int
) -> "list[tuple[str, str]] | None":
    """The distinct (src, dst) edge residue, COUNT-GATED: counted
    before collection, ``None`` when it exceeds ``max_edges`` (callers
    fall back to the distributed/degree paths). One bucketed distinct —
    no multi-key Ray groupby."""
    from .infer import bucketed_reduce

    pair_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["src", "dst"])

    distinct = bucketed_reduce(
        edges.select_columns(["src", "dst"]), ["src", "dst"], _dd, pair_schema,
        combiner=_dd,
    ).materialize()
    if distinct.count() > max_edges:
        return None
    df = distinct.to_pandas()
    if df.empty or "src" not in df.columns:
        return []
    return list(zip(df["src"], df["dst"]))


def louvain_communities(
    edges: ray.data.Dataset, *, seed: int = 7, max_edges: int = 2_000_000
) -> "dict[str, int] | None":
    """Louvain community labels over the final edge list — reference
    ``visualization.py:186-205`` semantics (python-louvain partition of
    the undirected graph, degree-mod-8 fallback when detection fails).

    Runs driver-side over the distinct-edge residue exactly like the
    reference (whose graphs cap at ~10k nodes); the residue is
    count-gated and the function returns ``None`` over the gate, at
    which point the caller keeps weak-component labels (the documented
    scale deviation). Community ids are deterministic: communities
    ordered by (size desc, smallest member).
    """
    import networkx as nx

    pairs = _distinct_undirected_pairs(edges, max_edges=max_edges)
    if pairs is None:
        return None
    if not pairs:
        return {}
    G = nx.Graph()
    G.add_edges_from(pairs)
    try:
        comms = nx.community.louvain_communities(G, seed=seed)
    except Exception:
        # Reference fallback: degree % 8 (visualization.py:197-205).
        return {n: max(0, int(d)) % 8 for n, d in G.degree()}
    ordered = sorted(comms, key=lambda c: (-len(c), min(c)))
    return {n: i for i, c in enumerate(ordered) for n in c}


def centrality_blend_sizes(
    edges: ray.data.Dataset, *, max_edges: int = 200_000
) -> "dict[str, float] | None":
    """Reference node sizing (``visualization.py:207-227``): size =
    10 + 20 * (0.5·degree + 0.3·betweenness + 0.2·eigenvector), each
    normalized by its max. Betweenness is O(V·E) — strictly a
    small-residue computation (tighter gate than Louvain's); ``None``
    over the gate means keep degree-only sizing."""
    import networkx as nx

    pairs = _distinct_undirected_pairs(edges, max_edges=max_edges)
    if pairs is None:
        return None
    if not pairs:
        return {}
    G = nx.Graph()
    G.add_edges_from(pairs)
    betweenness = nx.betweenness_centrality(G)
    degree = dict(G.degree())
    try:
        eigenvector = nx.eigenvector_centrality(G, max_iter=1000)
    except Exception:
        eigenvector = {n: 0.5 for n in G.nodes()}
    max_b = max(betweenness.values()) if betweenness else 1
    max_d = max(degree.values()) if degree else 1
    max_e = max(eigenvector.values()) if eigenvector else 1
    out = {}
    for n in G.nodes():
        dn = degree.get(n, 1) / max_d
        bn = (betweenness.get(n, 0) / max_b) if max_b > 0 else 0
        en = (eigenvector.get(n, 0) / max_e) if max_e > 0 else 0
        out[n] = 10.0 + 20.0 * (0.5 * dn + 0.3 * bn + 0.2 * en)
    return out


def graph_stats(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    components: "dict[str, int] | ray.data.Dataset | None",
) -> dict:
    """Run metrics (``main.py:305-312`` + ``visualization.py:154-163``)."""
    import pyarrow.compute as pc

    n_edges = edges.count()
    n_inferred = (
        edges.select_columns(["inferred"])
        .map_batches(
            lambda b: pa.table(
                {"n": pa.array([pc.sum(pc.cast(b["inferred"], pa.int64())).as_py() or 0])}
            ),
            batch_format="pyarrow",
        )
        .sum("n")
        or 0
    )
    n_nodes = nodes.count()
    if isinstance(components, ray.data.Dataset):
        # distinct-component count, distributed (labels over the gate)
        n_comms = (
            components.select_columns(["component"]).groupby("component").count().count()
        )
    else:
        n_comms = (max(components.values()) + 1) if components else 0
    return {
        "nodes": n_nodes,
        "edges": n_edges,
        "original_edges": n_edges - n_inferred,
        "inferred_edges": n_inferred,
        "communities": n_comms,
    }
