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

        def _finish_ds(batch: pd.DataFrame) -> pd.DataFrame:
            comm = (
                pd.util.hash_array(batch["component"].to_numpy(dtype=object))
                % (1 << 31)
            ).astype("int32") if len(batch) else pd.Series([], dtype="int32")
            return pd.DataFrame(
                {
                    "entity": batch["entity"],
                    "degree": batch["degree"].astype("int64"),
                    "community": comm,
                    "size": 10.0 + 20.0 * (batch["degree"] / max_deg),
                }
            )

        return joined.map_batches(_finish_ds, batch_format="pandas")

    comp_ref = ray.put(components or {})

    class _Finish:
        def __init__(self) -> None:
            self.comps: dict[str, int] = ray.get(comp_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ents = batch["entity"].to_pylist()
            degs = batch["degree"].to_pylist()
            comm = [self.comps.get(e, -1) for e in ents]
            size = [10.0 + 20.0 * (d / max_deg) for d in degs]
            return pa.table(
                {
                    "entity": batch["entity"],
                    "degree": batch["degree"],
                    "community": pa.array(comm, pa.int32()),
                    "size": pa.array(size, pa.float64()),
                }
            )

    return deg.map_batches(_Finish, batch_format="pyarrow", concurrency=2)


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
