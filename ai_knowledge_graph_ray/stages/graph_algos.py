"""Distributed graph algorithms over an ``(src, dst)`` edge table.

:func:`pagerank_int` — PageRank as iterated joins + grouped sums, in
FIXED-POINT INTEGER arithmetic so the result is bit-exact across
engines (float summation order makes float PageRank unverifiable
against a SQL oracle; integer sums commute). The recurrence, per
iteration, with scale ``S``, damping ``d_num/d_den`` and node count
``N`` (all integer ops, ``//`` = floor division on non-negatives):

    base     = ((d_den - d_num) * S // d_den) // N
    contrib(u) = r[u] // outdeg(u)            (u with out-edges)
    dangling =  sum of r[u] for u without out-edges
    r'[v]    = base + d_num * (S_v + dangling // N) // d_den
               where S_v = sum of contrib(u) over in-edges (u, v)

This upgrades the degree-only node-importance signal (the reference
blends eigenvector centrality driver-side, ``visualization.py:170-178``
— meaningless at web scale): every step here is a bucketed join or a
combined grouped sum, so it runs at any node count. Matches
:func:`pagerank_int_local` (the pure-Python reference used by tests
and the oracle-SQL generator) exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .infer import bucketed_reduce, normalize_blocks, pa_from_pandas, sanitize_for_join
from .relational import cogroup_join, grouped_sums

EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])
RANK_SCHEMA = pa.schema([("node", pa.string()), ("rank_scaled", pa.int64())])


def pagerank_int(
    edges: ray.data.Dataset,
    *,
    iters: int = 5,
    scale: int = 10**12,
    d_num: int = 85,
    d_den: int = 100,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """``(node, rank_scaled)`` after ``iters`` integer PageRank steps.

    ``edges`` needs ``src``/``dst`` string columns; parallel edges
    count with multiplicity (like repeated links in a web graph).
    COUNT-GATED like every residue collect in this repo: under
    ``driver_max_edges`` the bit-identical local twin runs on the
    collected edge list (the distributed plan's ~4 joins x iters of
    fixed stage cost dwarf a small graph); over it, nothing is
    collected and the iterated bucketed joins run. Both paths produce
    identical integers (pinned by test).
    """
    node_schema = pa.schema([("node", pa.string())])

    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.count() <= driver_max_edges:
        df = edges.to_pandas()
        if df.empty or "src" not in df.columns:  # empty loses its schema
            return ray.data.from_arrow(RANK_SCHEMA.empty_table())
        r = pagerank_int_local(
            list(zip(df["src"], df["dst"])),
            iters=iters, scale=scale, d_num=d_num, d_den=d_den,
        )
        ks = sorted(r)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(ks, pa.string()),
                    "rank_scaled": pa.array([r[k] for k in ks], pa.int64()),
                }
            )
        )

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates("node")

    # Explicit Arrow projections (Dataset.rename_columns breaks on
    # pandas-backed blocks in this Ray version).
    def _as_node(col: str):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table({"node": b[col].combine_chunks().cast(pa.string())})

        return _f

    both = edges.map_batches(_as_node("src"), batch_format="pyarrow").union(
        edges.map_batches(_as_node("dst"), batch_format="pyarrow")
    )
    nodes = sanitize_for_join(
        bucketed_reduce(both, ["node"], _dd, node_schema, combiner=_dd,
                        num_buckets=num_buckets),
        node_schema,
    ).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(RANK_SCHEMA.empty_table())

    # STATE table (node, outdeg, rank_scaled): outdeg rides along with
    # the rank so no per-iteration rank<->outdeg join is needed, and
    # the per-iteration inner+anti join pair against the node universe
    # collapses into the contribution sum itself (every node
    # contributes a carrier row with s_v=0, so nodes without in-links
    # come out of the SAME grouped sum with s_v=0). 2 shuffles per
    # iteration (edge join + contribution sum) instead of 5.
    state_schema = pa.schema(
        [("node", pa.string()), ("outdeg", pa.int64()), ("rank_scaled", pa.int64())]
    )
    base = ((d_den - d_num) * scale // d_den) // n
    r0 = scale // n

    deg_rows = edges.map_batches(
        lambda b: pa.table(
            {
                "node": b["src"].combine_chunks().cast(pa.string()),
                "one": pa.array([1] * len(b), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).union(
        nodes.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"].combine_chunks().cast(pa.string()),
                    "one": pa.array([0] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    state = sanitize_for_join(
        grouped_sums(deg_rows, ["node"], {"outdeg": "one"}).map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "outdeg": b["outdeg"].astype("int64"),
                    "rank_scaled": np.full(len(b), r0, dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        state_schema,
    ).materialize()

    edges_s = sanitize_for_join(edges.select_columns(["src", "dst"]), EDGE_SCHEMA)
    contrib_schema = pa.schema([("src", pa.string()), ("contrib", pa.int64())])

    def _masses(st: ray.data.Dataset) -> tuple[int, int]:
        """(total, linked) rank mass in one pass over the state."""
        agg = st.map_batches(
            lambda b: pd.DataFrame(
                {
                    "total": [int(b["rank_scaled"].sum())],
                    "linked": [int(b.loc[b["outdeg"] > 0, "rank_scaled"].sum())],
                }
            ),
            batch_format="pandas",
        )
        return int(agg.sum("total") or 0), int(agg.sum("linked") or 0)

    for _ in range(iters):
        total, linked = _masses(state)
        dangling = total - linked
        d_share = dangling // n

        contrib = sanitize_for_join(
            state.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "src": b.loc[b["outdeg"] > 0, "node"],
                        "contrib": (
                            b.loc[b["outdeg"] > 0, "rank_scaled"].astype("int64")
                            // b.loc[b["outdeg"] > 0, "outdeg"].astype("int64")
                        ),
                    }
                ),
                batch_format="pandas",
            ),
            contrib_schema,
        )
        edge_contrib = cogroup_join(
            edges_s, contrib, on=["src"],
            num_buckets=num_buckets,
            left_schema=EDGE_SCHEMA, right_schema=contrib_schema,
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["dst"].combine_chunks().cast(pa.string()),
                    "odeg": pa.array([0] * len(b), pa.int64()),
                    "s_v": b["contrib"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        carrier = state.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "odeg": b["outdeg"].astype("int64"),
                    "s_v": np.zeros(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )

        def _next(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": b["node"],
                    "outdeg": b["outdeg"].astype("int64"),
                    "rank_scaled": base
                    + d_num * (b["s_v"].astype("int64") + d_share) // d_den,
                }
            )

        state = sanitize_for_join(
            grouped_sums(
                edge_contrib.union(carrier), ["node"],
                {"outdeg": "odeg", "s_v": "s_v"},
            ).map_batches(_next, batch_format="pandas"),
            state_schema,
        ).materialize()

    return state.select_columns(["node", "rank_scaled"])


HITS_SCHEMA = pa.schema(
    [("node", pa.string()), ("hub_scaled", pa.int64()), ("auth_scaled", pa.int64())]
)


def hits_int_local(
    edge_list: list[tuple[str, str]], *, iters: int = 3, scale: int = 10**6
) -> dict[str, tuple[int, int]]:
    """Pure-Python reference of the integer HITS recurrence — the
    unit-test and oracle-construction twin of :func:`hits_int`.

    Per round: auth = in-sum of hubs, renormalized to ``scale`` by
    INTEGER division by the round's max; hubs symmetric from the new
    auths. Max-normalization in exact integers keeps every value
    <= max_in_degree * scale, so the recurrence never overflows as
    long as ``max_degree * scale^2 < 2^63`` — and, unlike float L2
    normalization, is bit-reproducible in any engine."""
    nodes = sorted({x for e in edge_list for x in e})
    h = {v: scale for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        a_raw = {v: 0 for v in nodes}
        for s, d in edge_list:
            a_raw[d] += h[s]
        am = max(a_raw.values(), default=0)
        a = {v: (x * scale) // am if am > 0 else 0 for v, x in a_raw.items()}
        h_raw = {v: 0 for v in nodes}
        for s, d in edge_list:
            h_raw[s] += a[d]
        hm = max(h_raw.values(), default=0)
        h = {v: (x * scale) // hm if hm > 0 else 0 for v, x in h_raw.items()}
    return {v: (h[v], a[v]) for v in nodes}


def hits_int(
    edges: ray.data.Dataset,
    *,
    iters: int = 3,
    scale: int = 10**6,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """``(node, hub_scaled, auth_scaled)`` after ``iters`` integer
    HITS rounds (Kleinberg 1999) — hash-exact vs an unrolled SQL
    oracle, same fixed-point discipline as :func:`pagerank_int`.

    Count-gated: under ``driver_max_edges`` the bit-identical local
    twin runs on the collected edge list; over it, each round is two
    bucketed edge joins + two combined grouped sums + two global
    integer maxes (tree-reduced, nothing collected). Parallel edges
    count with multiplicity."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.count() <= driver_max_edges:
        df = edges.to_pandas()
        if df.empty or "src" not in df.columns:
            return ray.data.from_arrow(HITS_SCHEMA.empty_table())
        r = hits_int_local(list(zip(df["src"], df["dst"])), iters=iters, scale=scale)
        ks = sorted(r)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(ks, pa.string()),
                    "hub_scaled": pa.array([r[k][0] for k in ks], pa.int64()),
                    "auth_scaled": pa.array([r[k][1] for k in ks], pa.int64()),
                }
            )
        )

    node_schema = pa.schema([("node", pa.string())])
    val_schema = pa.schema([("node", pa.string()), ("val", pa.int64())])

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates("node")

    def _as_node(col: str):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table({"node": b[col].combine_chunks().cast(pa.string())})

        return _f

    both = edges.map_batches(_as_node("src"), batch_format="pyarrow").union(
        edges.map_batches(_as_node("dst"), batch_format="pyarrow")
    )
    nodes = sanitize_for_join(
        bucketed_reduce(both, ["node"], _dd, node_schema, combiner=_dd,
                        num_buckets=num_buckets),
        node_schema,
    ).materialize()

    def _const(v: int):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b["node"].combine_chunks().cast(pa.string()),
                    "val": pa.array([v] * len(b), pa.int64()),
                }
            )

        return _f

    edges_s = sanitize_for_join(edges, EDGE_SCHEMA)
    h = sanitize_for_join(
        nodes.map_batches(_const(scale), batch_format="pyarrow"), val_schema
    ).materialize()
    a = sanitize_for_join(
        nodes.map_batches(_const(0), batch_format="pyarrow"), val_schema
    ).materialize()

    def _pulse(src_vals: ray.data.Dataset, join_col: str, emit_col: str):
        """Sum the joined side's values onto the other endpoint, with a
        zero carrier row per node so the output covers the universe."""
        tagged = src_vals.map_batches(
            lambda b, c=join_col: pa.table(
                {
                    c: b["node"].combine_chunks().cast(pa.string()),
                    "val": b["val"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        joined = cogroup_join(
            edges_s, sanitize_for_join(tagged, pa.schema([(join_col, pa.string()), ("val", pa.int64())])),
            on=[join_col], num_buckets=num_buckets,
            left_schema=EDGE_SCHEMA,
            right_schema=pa.schema([(join_col, pa.string()), ("val", pa.int64())]),
        ).map_batches(
            lambda b, e=emit_col: pa.table(
                {
                    "node": b[e].combine_chunks().cast(pa.string()),
                    "val": b["val"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        carrier = nodes.map_batches(_const(0), batch_format="pyarrow")
        return sanitize_for_join(
            grouped_sums(joined.union(carrier), ["node"], {"val": "val"}),
            val_schema,
        ).materialize()

    def _renorm(vals: ray.data.Dataset) -> ray.data.Dataset:
        m = int(vals.max("val") or 0)
        if m <= 0:
            return vals
        return sanitize_for_join(
            vals.map_batches(
                lambda b, mm=m: pd.DataFrame(
                    {
                        "node": b["node"],
                        "val": (b["val"].astype("int64") * scale) // mm,
                    }
                ),
                batch_format="pandas",
            ),
            val_schema,
        ).materialize()

    for _ in range(iters):
        a = _renorm(_pulse(h, "src", "dst"))
        h = _renorm(_pulse(a, "dst", "src"))

    merged = cogroup_join(
        h.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "hub_scaled": b["val"]}),
            batch_format="pandas",
        ),
        a.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "auth_scaled": b["val"]}),
            batch_format="pandas",
        ),
        on=["node"], num_buckets=num_buckets,
        left_schema=pa.schema([("node", pa.string()), ("hub_scaled", pa.int64())]),
        right_schema=pa.schema([("node", pa.string()), ("auth_scaled", pa.int64())]),
    )
    return sanitize_for_join(merged, HITS_SCHEMA)


def _undirect(edges: ray.data.Dataset) -> ray.data.Dataset:
    return edges.map_batches(
        lambda b: pa.table(
            {
                "src": pa.concat_arrays(
                    [
                        b["src"].combine_chunks().cast(pa.string()),
                        b["dst"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "dst": pa.concat_arrays(
                    [
                        b["dst"].combine_chunks().cast(pa.string()),
                        b["src"].combine_chunks().cast(pa.string()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    )


HOP_SCHEMA = pa.schema([("entity", pa.string()), ("hop", pa.int64())])


def k_hop_neighbors(
    edges: ray.data.Dataset,
    seeds: list[str],
    hops: int,
    *,
    directed: bool = False,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """``(entity, hop)`` — minimal hop distance (<= ``hops``) from any
    seed; the distributed twin of the reference's BFS neighborhood
    (``graph_store.py:436-456``, undirected by default there too).

    One frontier expansion per hop: cogroup-join the frontier onto the
    edge list, then ONE fused bucketed pass that both dedupes the new
    hits and anti-joins the visited set (visited rows ride along with
    ``hop=-1`` as the exclusion markers — two shuffles per hop total,
    not three). Frontiers and the visited set stay datasets — nothing
    scales with graph size on the driver."""
    from .infer import bucketed_reduce, sanitize_for_join
    from .relational import cogroup_join

    und = sanitize_for_join(
        edges.select_columns(["src", "dst"]) if directed else _undirect(edges),
        EDGE_SCHEMA,
    ).materialize()

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["entity", "hop"])

    def _new_only(g: pd.DataFrame) -> pd.DataFrame:
        """Fused dedup + anti-join: keep one row per fresh entity with
        no visited (hop=-1) marker row."""
        seen = g.loc[g["hop"] < 0, "entity"]
        fresh = g[g["hop"] >= 0]
        if len(seen):
            fresh = fresh[~fresh["entity"].isin(set(seen.to_numpy()))]
        return fresh.drop_duplicates("entity")

    def _mark_visited(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": b["entity"].combine_chunks().cast(pa.string()),
                "hop": pa.array([-1] * len(b), pa.int64()),
            }
        )

    visited = ray.data.from_arrow(
        pa.table(
            {
                "entity": pa.array(sorted(set(seeds)), pa.string()),
                "hop": pa.array([0] * len(set(seeds)), pa.int64()),
            }
        )
    ).materialize()
    frontier = visited

    # Count-gated local twin (same policy as multi_source_hops): the
    # single-source BFS is the multi-source sweep with one label.
    if und.count() + len(set(seeds)) <= driver_max_edges:
        seeds_df = pd.DataFrame(
            {
                "source": ["_"] * len(set(seeds)),
                "entity": sorted(set(seeds)),
                "hop": np.int64(0),
            }
        )
        out = multi_source_hops_local(und.to_pandas(), seeds_df, hops)
        return ray.data.from_arrow(
            pa.table(
                {
                    "entity": pa.array(out["entity"].astype(str), pa.string()),
                    "hop": pa.array(out["hop"].astype("int64"), pa.int64()),
                }
            ).cast(HOP_SCHEMA)
        )

    for h in range(1, hops + 1):
        hit = cogroup_join(
            und,
            frontier.select_columns(["entity"]).map_batches(
                lambda b: pa.table({"src": b["entity"]}), batch_format="pyarrow"
            ),
            on=["src"],
            num_buckets=num_buckets,
            left_schema=EDGE_SCHEMA,
            right_schema=pa.schema([("src", pa.string())]),
        ).map_batches(
            lambda b, hh=h: pa.table(
                {
                    "entity": b["dst"].combine_chunks().cast(pa.string()),
                    "hop": pa.array([hh] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        new = bucketed_reduce(
            hit.union(visited.map_batches(_mark_visited, batch_format="pyarrow")),
            ["entity"],
            _new_only,
            HOP_SCHEMA,
            combiner=_dd,
            num_buckets=num_buckets,
        ).materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new
    return visited


def shortest_path(
    edges: ray.data.Dataset,
    source: str,
    target: str,
    *,
    directed: bool = False,
    max_hops: int = 10,
    driver_max_visited: int = 2_000_000,
) -> list[str]:
    """One shortest path ``source -> ... -> target`` (BFS hop count —
    reference ``find_path``, ``graph_store.py:458-469``), ``[]`` when
    unreachable within ``max_hops``.

    The BFS runs distributed exactly like :func:`k_hop_neighbors` but
    carries a deterministic parent per newly-reached entity (min
    parent). Only the bounded parent residue of the VISITED set is
    collected for reconstruction, and only after counting it against
    ``driver_max_visited``."""
    from .infer import bucketed_reduce, sanitize_for_join
    from .relational import cogroup_join

    if source == target:
        return [source]
    und = sanitize_for_join(
        edges.select_columns(["src", "dst"]) if directed else _undirect(edges),
        EDGE_SCHEMA,
    ).materialize()

    parent_schema = pa.schema([("entity", pa.string()), ("parent", pa.string())])

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        """Map-side combine: one marker row per visited entity, one
        min-parent row per fresh entity."""
        vis = b[b["vis"] == 1].drop_duplicates("entity")
        fresh = (
            b[b["vis"] == 0]
            .sort_values(["entity", "parent"], kind="stable")
            .drop_duplicates("entity", keep="first")
        )
        return pd.concat([vis, fresh], ignore_index=True)

    def _new_min_parent(g: pd.DataFrame) -> pd.DataFrame:
        """Fused min-parent dedup + visited anti-join in one bucketed
        pass (two shuffles per hop, not three)."""
        seen = g.loc[g["vis"] == 1, "entity"]
        fresh = g[g["vis"] == 0]
        if len(seen):
            fresh = fresh[~fresh["entity"].isin(set(seen.to_numpy()))]
        return (
            fresh.sort_values(["entity", "parent"], kind="stable")
            .drop_duplicates("entity", keep="first")[["entity", "parent"]]
        )

    def _mark_visited(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": b["entity"].combine_chunks().cast(pa.string()),
                "parent": b["parent"].combine_chunks().cast(pa.string()),
                "vis": pa.array([1] * len(b), pa.int64()),
            }
        )

    visited = ray.data.from_arrow(
        pa.table({"entity": pa.array([source], pa.string()),
                  "parent": pa.array([""], pa.string())})
    ).materialize()
    frontier = visited
    found = False
    for _ in range(max_hops):
        hit = cogroup_join(
            und,
            frontier.select_columns(["entity"]).map_batches(
                lambda b: pa.table({"src": b["entity"]}), batch_format="pyarrow"
            ),
            on=["src"],
            left_schema=EDGE_SCHEMA,
            right_schema=pa.schema([("src", pa.string())]),
        ).map_batches(
            lambda b: pa.table(
                {
                    "entity": b["dst"].combine_chunks().cast(pa.string()),
                    "parent": b["src"].combine_chunks().cast(pa.string()),
                    "vis": pa.array([0] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        new = bucketed_reduce(
            hit.union(visited.map_batches(_mark_visited, batch_format="pyarrow")),
            ["entity"],
            _new_min_parent,
            parent_schema,
            combiner=_comb,
        ).materialize()
        if new.count() == 0:
            return []
        visited = visited.union(new).materialize()
        frontier = new
        if new.filter(lambda r: r["entity"] == target).count() > 0:
            found = True
            break
    if not found:
        return []
    if visited.count() > driver_max_visited:
        raise ValueError(
            "visited parent residue exceeds driver_max_visited; raise the "
            "gate or lower max_hops"
        )
    parents = {r["entity"]: r["parent"] for r in visited.take_all()}
    path = [target]
    while path[-1] != source:
        path.append(parents[path[-1]])
    return list(reversed(path))


def shortest_path_with_relations(
    edges: ray.data.Dataset,
    source: str,
    target: str,
    *,
    max_hops: int = 10,
) -> list[dict]:
    """Reference ``find_path_with_relations``
    (``graph_store.py:470-499``): the shortest path annotated per hop
    with an edge relation — forward edge preferred, reverse edge
    reported with ``reversed: true``. The reference picks the "first"
    parallel edge (MultiDiGraph insertion order, not reproducible);
    here the lexicographically smallest relation wins (deterministic).
    Relations for the <= max_hops consecutive pairs are fetched with
    ONE filtered distributed scan."""
    path = shortest_path(edges, source, target, directed=False, max_hops=max_hops)
    if len(path) < 2:
        return []
    pairs = list(zip(path, path[1:]))
    want = set(pairs) | {(b, a) for a, b in pairs}
    want_ref = ray.put(want)

    def _hit(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(want_ref) if not isinstance(want_ref, set) else want_ref
        keep = [
            (s, d) in w for s, d in zip(b["src"].astype(str), b["dst"].astype(str))
        ]
        return b.loc[keep, ["src", "dst", "predicate"]]

    hits = (
        edges.select_columns(["src", "dst", "predicate"])
        .map_batches(_hit, batch_format="pandas")
        .take_all()
    )
    best: dict[tuple[str, str], str] = {}
    for r in hits:
        k = (r["src"], r["dst"])
        if k not in best or r["predicate"] < best[k]:
            best[k] = r["predicate"]
    out = []
    for a, b in pairs:
        if (a, b) in best:
            out.append({"from": a, "to": b, "relation": best[(a, b)]})
        elif (b, a) in best:
            out.append(
                {"from": b, "to": a, "relation": best[(b, a)], "reversed": True}
            )
    return out


def graph_search(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    query: str,
    *,
    top_k: int = 20,
) -> list[dict]:
    """Reference node search (``graph_store.py:567-593``): +10 for
    substring in the node id, +50 for exact match, +5 for substring in
    the definition; ordered by (-score, -degree). Scoring is a
    vectorized distributed scan; degrees are joined onto the (small)
    scored survivors, and only the top-k reach the driver (per-batch
    local top-k + merge)."""
    import json as _json

    from .infer import local_topk_rows, sanitize_for_join
    from .materialize import nodes_table
    from .relational import cogroup_join

    q = query.lower()

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"node": [], "type": [], "score": []})
        ent = b["entity"].astype(str)
        score = (
            ent.str.contains(q, regex=False).astype(int) * 10
            + (ent == q).astype(int) * 50
        )
        if "attrs" in b.columns:
            defs = b["attrs"].map(
                lambda a: (_json.loads(a).get("definition", "") if a else "") or ""
            )
            score = score + defs.astype(str).str.lower().str.contains(q, regex=False).astype(int) * 5
        out = pd.DataFrame(
            {
                "node": ent,
                "type": (
                    b["type"] if "type" in b.columns else pd.Series(["unknown"] * len(b))
                ),
                "score": score.astype("int64"),
            }
        )
        return out[out["score"] > 0]

    scored_schema = pa.schema(
        [("node", pa.string()), ("type", pa.string()), ("score", pa.int64())]
    )
    scored = sanitize_for_join(
        nodes.map_batches(_score, batch_format="pandas"), scored_schema
    )
    deg = nodes_table(edges).map_batches(
        lambda b: pa.table(
            {
                "node": b["entity"].combine_chunks().cast(pa.string()),
                "degree": b["degree"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    hit = cogroup_join(
        scored,
        sanitize_for_join(deg, pa.schema([("node", pa.string()), ("degree", pa.int64())])),
        on=["node"],
        left_schema=scored_schema,
        right_schema=pa.schema([("node", pa.string()), ("degree", pa.int64())]),
    )
    miss = cogroup_join(
        scored,
        sanitize_for_join(deg, pa.schema([("node", pa.string()), ("degree", pa.int64())])),
        on=["node"],
        how="left_anti",
        left_schema=scored_schema,
        right_schema=pa.schema([("node", pa.string()), ("degree", pa.int64())]),
    ).map_batches(
        lambda b: b.append_column("degree", pa.array([0] * len(b), pa.int64())),
        batch_format="pyarrow",
    )
    return local_topk_rows(
        hit.union(miss),
        ["score", "degree", "node"],
        top_k,
        ascending=[False, False, True],
    )


LABEL_SCHEMA = pa.schema([("entity", pa.string()), ("component", pa.string())])


def weak_components(
    edges: ray.data.Dataset,
    *,
    driver_max_edges: int = 2_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Weakly-connected components as ``(entity, component)`` where
    ``component`` is the lexicographically smallest entity of the
    component — the public, count-gated face of
    :func:`~.infer.connected_components_distributed`.

    Gate: edge count under ``driver_max_edges`` -> collect the (small)
    edge list and run the driver union-find, then relabel each class
    by its min entity (identical labels to the distributed min-label
    propagation — pinned by the forced-path equivalence test). Over
    the gate -> iterative distributed min-label propagation (one
    cogroup join + one bucketed min per round, rounds = diameter)."""
    from .infer import connected_components, connected_components_distributed

    pairs = edges.select_columns(["subject", "object"]).materialize()
    if pairs.count() > driver_max_edges:
        return connected_components_distributed(pairs, num_buckets=num_buckets)

    rows = pairs.to_pandas()
    labels = connected_components(
        list(zip(rows["subject"].astype(str), rows["object"].astype(str)))
    )
    by_class: dict[int, str] = {}
    for entity, cls in labels.items():
        cur = by_class.get(cls)
        if cur is None or entity < cur:
            by_class[cls] = entity
    ents = sorted(labels)
    out = pa.table(
        {
            "entity": pa.array(ents, pa.string()),
            "component": pa.array([by_class[labels[e]] for e in ents], pa.string()),
        }
    )
    return ray.data.from_arrow(out.cast(LABEL_SCHEMA))


def lpa_local(und_df: pd.DataFrame, iters: int) -> pd.DataFrame:
    """Pure-pandas twin of the distributed LPA rounds below — same
    synchronous update over the SAME doubled edge table (neighbor
    votes keep edge multiplicities, one self vote, max count then
    smallest label string). The count-gated fast path AND the
    equivalence-test reference."""
    nodes = pd.Index(sorted(set(und_df["src"].astype(str))))
    lab = pd.Series(nodes, index=nodes)
    src = und_df["src"].astype(str).to_numpy()
    dst = und_df["dst"].astype(str).to_numpy()
    for _ in range(iters):
        votes = pd.concat(
            [
                pd.DataFrame({"entity": dst, "component": lab.loc[src].to_numpy()}),
                pd.DataFrame({"entity": nodes, "component": lab.to_numpy()}),
            ],
            ignore_index=True,
        )
        counts = votes.groupby(["entity", "component"], as_index=False).size()
        top = (
            counts.sort_values(
                ["entity", "size", "component"],
                ascending=[True, False, True],
                kind="stable",
            ).drop_duplicates("entity", keep="first")
        )
        lab = pd.Series(
            top["component"].to_numpy(), index=top["entity"].to_numpy()
        ).loc[nodes]
    return pd.DataFrame({"entity": nodes, "component": lab.to_numpy()})


def label_propagation_communities(
    edges: ray.data.Dataset,
    *,
    iters: int = 5,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """Community labels via synchronous label propagation — the
    DISTRIBUTED community-detection path for graphs whose edge residue
    exceeds the Louvain gate (weak components merge everything that
    touches; LPA converges to modularity-correlated communities and is
    expressible as joins + grouped counts at any scale).

    Deterministic: every node starts as its own label; each round all
    nodes simultaneously adopt the most frequent label among their
    neighbors PLUS their own current label (the self-vote breaks the
    classic synchronous-LPA oscillation on bipartite-ish structures —
    a 2-node component would otherwise swap labels forever), ties
    broken by the smallest label string. Returns ``(entity,
    component)`` — the same shape ``connected_components_distributed``
    emits, so ``nodes_table`` accepts it directly."""
    from .infer import bucketed_reduce, sanitize_for_join
    from .relational import cogroup_join, grouped_sums

    und = sanitize_for_join(_undirect(edges), EDGE_SCHEMA).materialize()

    # Count-gated local twin (same policy as every other graph op):
    # five distributed rounds cost ~5 exchanges of fixed latency —
    # ~25 s on a toy graph that pandas closes in well under a second.
    if und.count() <= driver_max_edges:
        out = lpa_local(und.to_pandas(), iters)
        return ray.data.from_arrow(
            pa.table(
                {
                    "entity": pa.array(out["entity"], pa.string()),
                    "component": pa.array(out["component"], pa.string()),
                }
            )
        )

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates("entity")

    nodes = sanitize_for_join(
        bucketed_reduce(
            und.map_batches(
                lambda b: pa.table({"entity": b["src"].combine_chunks().cast(pa.string())}),
                batch_format="pyarrow",
            ),
            ["entity"],
            _dd,
            pa.schema([("entity", pa.string())]),
            combiner=_dd,
            num_buckets=num_buckets,
        ),
        pa.schema([("entity", pa.string())]),
    ).materialize()

    labels = sanitize_for_join(
        nodes.map_batches(
            lambda b: pa.table({"entity": b["entity"], "component": b["entity"]}),
            batch_format="pyarrow",
        ),
        LABEL_SCHEMA,
    ).materialize()

    vote_schema = pa.schema(
        [("entity", pa.string()), ("component", pa.string()), ("n", pa.int64())]
    )

    def _top1(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["entity", "n", "component"],
                          ascending=[True, False, True], kind="stable")
            .drop_duplicates("entity", keep="first")
        )

    for _ in range(iters):
        neigh = cogroup_join(
            und,
            labels.map_batches(
                lambda b: pa.table({"src": b["entity"], "component": b["component"]}),
                batch_format="pyarrow",
            ),
            on=["src"],
            num_buckets=num_buckets,
            left_schema=EDGE_SCHEMA,
            right_schema=pa.schema([("src", pa.string()), ("component", pa.string())]),
        ).map_batches(
            lambda b: pa.table(
                {
                    "entity": b["dst"].combine_chunks().cast(pa.string()),
                    "component": b["component"].combine_chunks().cast(pa.string()),
                    "one": pa.array([1] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        self_votes = labels.map_batches(
            lambda b: pa.table(
                {
                    "entity": b["entity"],
                    "component": b["component"],
                    "one": pa.array([1] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        votes = grouped_sums(
            neigh.union(self_votes), ["entity", "component"], {"n": "one"}
        )
        labels = sanitize_for_join(
            bucketed_reduce(
                votes, ["entity"], _top1, vote_schema, num_buckets=num_buckets
            ).select_columns(["entity", "component"]),
            LABEL_SCHEMA,
        ).materialize()
    return labels


def pagerank_int_local(
    edge_list: list[tuple[str, str]],
    *,
    iters: int = 5,
    scale: int = 10**12,
    d_num: int = 85,
    d_den: int = 100,
) -> dict[str, int]:
    """Pure-Python reference of the exact same integer recurrence —
    the unit-test and oracle-construction twin of :func:`pagerank_int`."""
    nodes = sorted({x for e in edge_list for x in e})
    n = len(nodes)
    if n == 0:
        return {}
    out: dict[str, int] = {}
    for s, _ in edge_list:
        out[s] = out.get(s, 0) + 1
    base = ((d_den - d_num) * scale // d_den) // n
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if v not in out)
        d_share = dangling // n
        s_v = {v: 0 for v in nodes}
        for s, d in edge_list:
            s_v[d] += r[s] // out[s]
        r = {v: base + d_num * (s_v[v] + d_share) // d_den for v in nodes}
    return r


# ---------------------------------------------------------------------------
# Structural analytics: degree histogram + triangle counting
# ---------------------------------------------------------------------------

UND_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string())])
DEG_SCHEMA = pa.schema([("node", pa.string()), ("degree", pa.int64())])
DEG_HIST_SCHEMA = pa.schema([("degree", pa.int64()), ("n_nodes", pa.int64())])
TRI_SCHEMA = pa.schema([("node", pa.string()), ("n_triangles", pa.int64())])


def undirected_simple_edges(
    edges: ray.data.Dataset, *, num_buckets: int | None = None
) -> ray.data.Dataset:
    """``(a, b)`` with ``a < b`` — the distinct undirected simple graph
    under an ``(src, dst)`` edge table: self-loops dropped, direction
    and multiplicity collapsed. One bucketed shuffle with a map-side
    drop-duplicates combiner (a hot edge crosses once per block, not
    once per occurrence)."""

    def _canon(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["src"].astype(str)
        d = batch["dst"].astype(str)
        lo = s.where(s < d, d)
        hi = d.where(s < d, s)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[lo != hi].drop_duplicates()

    pairs = edges.select_columns(["src", "dst"]).map_batches(
        _canon, batch_format="pandas", batch_size=None
    )
    return bucketed_reduce(
        pairs,
        ["a", "b"],
        lambda g: g.drop_duplicates(),
        UND_SCHEMA,
        combiner=lambda b: b.drop_duplicates(),
        num_buckets=num_buckets,
    )


def undirected_degrees(
    und: ray.data.Dataset, *, num_buckets: int | None = None
) -> ray.data.Dataset:
    """``(node, degree)`` — distinct-neighbor degree over the simple
    graph produced by :func:`undirected_simple_edges`. Map-side partial
    counts, one bucketed sum."""

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([batch["a"], batch["b"]], ignore_index=True)
        vc = nodes.value_counts(sort=False)
        return pd.DataFrame(
            {"node": vc.index.to_numpy(object), "degree": vc.to_numpy(np.int64)}
        )

    partials = und.map_batches(_explode, batch_format="pandas", batch_size=None)

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("node", sort=False)["degree"].sum()
        return pd.DataFrame(
            {"node": s.index.to_numpy(object), "degree": s.to_numpy(np.int64)}
        )

    return bucketed_reduce(
        partials,
        ["node"],
        _sum,
        DEG_SCHEMA,
        combiner=lambda b: b.groupby("node", sort=False, as_index=False)["degree"].sum(),
        num_buckets=num_buckets,
    )


def degree_histogram(
    edges: ray.data.Dataset, *, num_buckets: int | None = None
) -> ray.data.Dataset:
    """``(degree, n_nodes)`` — how many nodes have each distinct-neighbor
    degree in the undirected simple graph. Two bucketed sums end to end
    (edge dedup -> per-node degree -> per-degree count); nothing ever
    lands on the driver."""
    deg = undirected_degrees(
        undirected_simple_edges(edges, num_buckets=num_buckets),
        num_buckets=num_buckets,
    )

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        vc = g.groupby("degree", sort=False)["n_nodes"].sum()
        return pd.DataFrame(
            {"degree": vc.index.to_numpy(np.int64), "n_nodes": vc.to_numpy(np.int64)}
        )

    partials = deg.map_batches(
        lambda b: pd.DataFrame(
            {
                "degree": b["degree"].value_counts(sort=False).index.to_numpy(np.int64),
                "n_nodes": b["degree"].value_counts(sort=False).to_numpy(np.int64),
            }
        ),
        batch_format="pandas",
        batch_size=None,
    )
    return bucketed_reduce(
        partials, ["degree"], _count, DEG_HIST_SCHEMA, num_buckets=num_buckets
    )


_ORIENTED_EMPTY = {
    "u": pd.Series([], dtype=object),
    "v": pd.Series([], dtype=object),
    "deg_v": pd.Series([], dtype="int64"),
}


def _oriented_distributed(
    und: ray.data.Dataset,
    *,
    driver_max_nodes: int,
    num_buckets: int | None,
) -> ray.data.Dataset:
    """Degree-ordered orientation of a canonical ``(a, b)`` simple-edge
    dataset — the shared front half of the distributed triangle and
    edge-support plans. COUNT-GATED on the node table: under
    ``driver_max_nodes`` the ``(node, degree)`` map broadcasts once via
    ``ray.put`` and orientation is map-side (zero joins); over it,
    orientation runs as two bucketed hash joins."""
    deg = undirected_degrees(und, num_buckets=num_buckets).materialize()

    if deg.count() <= driver_max_nodes:
        dd = deg.to_pandas()
        deg_map = dict(zip(dd["node"], dd["degree"].astype(int))) if len(dd) else {}
        ref = ray.put(deg_map)

        class _Orient:
            def __init__(self, deg_ref):
                self._deg = ray.get(deg_ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                if len(batch) == 0:
                    return pd.DataFrame(_ORIENTED_EMPTY)
                da = batch["a"].map(self._deg).to_numpy(np.int64)
                db = batch["b"].map(self._deg).to_numpy(np.int64)
                return _orient_frame(batch, da, db)

        return und.map_batches(
            _Orient,
            fn_constructor_kwargs={"deg_ref": ref},
            batch_format="pandas",
            batch_size=None,
            concurrency=(1, 8),
        )

    da = cogroup_join(
        und,
        deg.map_batches(
            lambda b: pd.DataFrame(
                {"a": b["node"], "deg_a": b["degree"].astype("int64")}
            ),
            batch_format="pandas",
        ),
        ["a"],
        num_buckets=num_buckets,
    )
    both = cogroup_join(
        da,
        deg.map_batches(
            lambda b: pd.DataFrame(
                {"b": b["node"], "deg_b": b["degree"].astype("int64")}
            ),
            batch_format="pandas",
        ),
        ["b"],
        num_buckets=num_buckets,
    )
    return both.map_batches(
        lambda batch: _orient_frame(
            batch,
            batch["deg_a"].to_numpy(np.int64),
            batch["deg_b"].to_numpy(np.int64),
        )
        if len(batch)
        else pd.DataFrame(_ORIENTED_EMPTY),
        batch_format="pandas",
    )


def triangle_counts(
    edges: ray.data.Dataset,
    *,
    driver_max_edges: int = 2_000_000,
    driver_max_nodes: int = 2_000_000,
    max_wedges_per_node: int = 1 << 62,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """``(node, n_triangles)`` — per-node triangle participation counts
    over the undirected simple graph (nodes in zero triangles are
    omitted). The classic degree-ordered orientation: every edge is
    directed from its lower ``(degree, node)`` endpoint to the higher,
    so each node's out-degree is O(sqrt(m)) and total wedge work is
    O(m^1.5) regardless of hot-node skew (a celebrity node's edges
    point INTO it; its fans enumerate the wedges). Each triangle is
    counted exactly once as apex->v->w with the closing oriented edge
    (v, w).

    DOUBLE COUNT-GATED per house policy (same tiering as
    :func:`pagerank_int`): a simple graph under ``driver_max_edges``
    runs the bit-identical local twin on the collected edge list (the
    distributed plan's ~5 bucketed shuffles of fixed stage cost dwarf a
    small graph). Over that, the (node, degree) table is counted; under
    ``driver_max_nodes`` it broadcasts once via ``ray.put`` and
    orientation is map-side (zero joins), over the gate orientation
    runs as two bucketed hash joins. Wedge generation and wedge-edge
    closing are bucketed shuffles on both distributed paths.
    ``max_wedges_per_node`` optionally caps per-apex wedge generation
    (an APPROXIMATION under extreme skew — leave at the default for
    exact counts)."""
    und = undirected_simple_edges(edges, num_buckets=num_buckets).materialize()

    if und.count() <= driver_max_edges:
        df = und.to_pandas()
        if df.empty or "a" not in df.columns:  # empty loses its schema
            return ray.data.from_arrow(TRI_SCHEMA.empty_table())
        out = _triangle_counts_local(df, max_wedges_per_node)
        return ray.data.from_arrow(pa_from_pandas(out, TRI_SCHEMA))

    # consumed twice (wedge generation + closing-edge markers) — pin it
    # so the orientation joins run once (NOTES.md item 11)
    oriented = _oriented_distributed(
        und, driver_max_nodes=driver_max_nodes, num_buckets=num_buckets
    ).materialize()

    wedge_schema = pa.schema(
        [("x", pa.string()), ("y", pa.string()), ("apex", pa.string())]
    )

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _pair_indices_by_size

        g = g.sort_values(["u", "deg_v", "v"], kind="stable")
        codes = g["u"].to_numpy(object)
        i, j = _pair_indices_by_size(codes, max_wedges_per_node)
        v = g["v"].to_numpy(object)
        return pd.DataFrame({"x": v[i], "y": v[j], "apex": codes[i]})

    wedges = bucketed_reduce(
        oriented, ["u"], _wedges, wedge_schema, num_buckets=num_buckets
    )

    closer_schema = pa.schema(
        [("x", pa.string()), ("y", pa.string()), ("apex", pa.string())]
    )
    edge_marker = oriented.map_batches(
        lambda b: pd.DataFrame(
            {
                "x": b["u"].to_numpy(object) if len(b) else pd.Series([], dtype=object),
                "y": b["v"].to_numpy(object) if len(b) else pd.Series([], dtype=object),
                "apex": pd.Series([None] * len(b), dtype=object),
            }
        ),
        batch_format="pandas",
    )

    count_schema = pa.schema([("node", pa.string()), ("n_triangles", pa.int64())])

    def _close(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["apex"].isna()
        closed = g[~is_edge].merge(
            g.loc[is_edge, ["x", "y"]].drop_duplicates(), on=["x", "y"], how="inner"
        )
        if len(closed) == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype=object),
                    "n_triangles": pd.Series([], dtype="int64"),
                }
            )
        corners = pd.concat(
            [closed["apex"], closed["x"], closed["y"]], ignore_index=True
        )
        vc = corners.value_counts(sort=False)
        return pd.DataFrame(
            {"node": vc.index.to_numpy(object), "n_triangles": vc.to_numpy(np.int64)}
        )

    partials = bucketed_reduce(
        wedges.union(edge_marker), ["x", "y"], _close, count_schema,
        num_buckets=num_buckets,
    )

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("node", sort=False)["n_triangles"].sum()
        return pd.DataFrame(
            {"node": s.index.to_numpy(object), "n_triangles": s.to_numpy(np.int64)}
        )

    return bucketed_reduce(
        partials,
        ["node"],
        _sum,
        TRI_SCHEMA,
        combiner=lambda b: b.groupby("node", sort=False, as_index=False)[
            "n_triangles"
        ].sum(),
        num_buckets=num_buckets,
    )


def _orient_frame(
    batch: pd.DataFrame, da: np.ndarray, db: np.ndarray
) -> pd.DataFrame:
    """Direct each undirected edge from its lower ``(degree, node)``
    endpoint to the higher; carry the head's degree so the wedge stage
    can order neighbor pairs by the same total rank."""
    a = batch["a"].to_numpy(object)
    b = batch["b"].to_numpy(object)
    a_first = (da < db) | ((da == db) & (a < b))
    u = np.where(a_first, a, b)
    v = np.where(a_first, b, a)
    deg_v = np.where(a_first, db, da)
    return pd.DataFrame({"u": u, "v": v, "deg_v": deg_v.astype("int64")})


def _triangle_counts_local(und: pd.DataFrame, max_wedges_per_node: int) -> pd.DataFrame:
    """Pandas twin of the distributed triangle plan — the SAME
    orientation, wedge templates and closing merge, run on the
    collected simple-edge list (bit-equal by construction; pinned by
    the gate-equivalence test)."""
    from .dedup import _pair_indices_by_size

    nodes = pd.concat([und["a"], und["b"]], ignore_index=True)
    degs = nodes.value_counts(sort=False)
    da = und["a"].map(degs).to_numpy(np.int64)
    db = und["b"].map(degs).to_numpy(np.int64)
    ori = _orient_frame(und, da, db).sort_values(
        ["u", "deg_v", "v"], kind="stable"
    )
    codes = ori["u"].to_numpy(object)
    i, j = _pair_indices_by_size(codes, max_wedges_per_node)
    v = ori["v"].to_numpy(object)
    wedges = pd.DataFrame({"x": v[i], "y": v[j], "apex": codes[i]})
    closed = wedges.merge(
        ori[["u", "v"]].rename(columns={"u": "x", "v": "y"}),
        on=["x", "y"],
        how="inner",
    )
    corners = pd.concat([closed["apex"], closed["x"], closed["y"]], ignore_index=True)
    vc = corners.value_counts(sort=False).sort_index()
    return pd.DataFrame(
        {"node": vc.index.to_numpy(object), "n_triangles": vc.to_numpy(np.int64)}
    )


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling)
# ---------------------------------------------------------------------------

KCORE_SCHEMA = pa.schema([("node", pa.string())])


def k_core_local(und_df: pd.DataFrame, k: int) -> list[str]:
    """Pure-pandas peeling over an ``(a, b)`` simple-edge frame — the
    count-gated local twin AND the reference the distributed loop and
    the networkx pin are tested against."""
    edges = und_df[["a", "b"]]
    while True:
        deg = pd.concat([edges["a"], edges["b"]], ignore_index=True).value_counts(
            sort=False
        )
        keep = set(deg[deg >= k].index)
        nxt = edges[edges["a"].isin(keep) & edges["b"].isin(keep)]
        if len(nxt) == len(edges):
            return sorted(keep) if len(edges) else []
        edges = nxt


def k_core(
    edges: ray.data.Dataset,
    k: int,
    *,
    driver_max_edges: int = 2_000_000,
    driver_max_nodes: int = 2_000_000,
    max_iters: int = 200,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """``(node,)`` — the k-core of the undirected simple graph under
    the edge table (the maximal subgraph where every node keeps degree
    >= k). Classic peeling, distributed:

    Each round is one degree reduce (:func:`undirected_degrees`) plus
    one membership filter over the surviving edges. The keep-set is
    count-gated: under ``driver_max_nodes`` it broadcasts once via
    ``ray.put`` (sorted array + ``searchsorted`` — no shuffle); over
    the gate the filter runs as two bucketed ``left_semi`` joins.
    Under ``driver_max_edges`` the whole graph runs through the
    bit-identical local twin instead (a few peel rounds of fixed
    ~3s/exchange stage latency dwarf a toy graph). Rounds are bounded
    by ``max_iters``; peeling converges in few rounds on real graphs
    but is O(n) adversarially — the bound fails loudly rather than
    looping forever.
    """
    import ray as _ray

    und = undirected_simple_edges(edges, num_buckets=num_buckets).materialize()
    if und.count() <= driver_max_edges:
        nodes = k_core_local(und.to_pandas(), k)
        if not nodes:
            return ray.data.from_arrow(KCORE_SCHEMA.empty_table())
        return ray.data.from_arrow(
            pa.table({"node": pa.array(nodes, pa.string())})
        )

    cur = und
    n_edges = cur.count()
    for _ in range(max_iters):
        deg = undirected_degrees(cur, num_buckets=num_buckets)
        keep = deg.map_batches(
            lambda b: b[b["degree"] >= k], batch_format="pandas"
        ).materialize()
        n_keep = keep.count()
        if n_keep == 0:
            return ray.data.from_arrow(KCORE_SCHEMA.empty_table())
        if n_keep <= driver_max_nodes:
            arr = np.sort(keep.to_pandas()["node"].to_numpy(object))
            ref = _ray.put(arr)

            def _filt(b: pd.DataFrame) -> pd.DataFrame:
                ks = _ray.get(ref)
                a = b["a"].to_numpy(object)
                bb = b["b"].to_numpy(object)
                ia = np.searchsorted(ks, a)
                ib = np.searchsorted(ks, bb)
                ok_a = (ia < len(ks)) & (ks[np.minimum(ia, len(ks) - 1)] == a)
                ok_b = (ib < len(ks)) & (ks[np.minimum(ib, len(ks) - 1)] == bb)
                return b[ok_a & ok_b]

            nxt = cur.map_batches(_filt, batch_format="pandas").materialize()
        else:
            keep_t = sanitize_for_join(
                keep.select_columns(["node"]), pa.schema([("node", pa.string())])
            )
            nxt = cogroup_join(
                cur.map_batches(
                    lambda b: b.rename(columns={"a": "node"}), batch_format="pandas"
                ),
                keep_t,
                on=["node"],
                how="left_semi",
                left_schema=pa.schema([("node", pa.string()), ("b", pa.string())]),
                right_schema=pa.schema([("node", pa.string())]),
                num_buckets=num_buckets,
            ).map_batches(
                lambda b: b.rename(columns={"node": "a", "b": "node"}),
                batch_format="pandas",
            )
            nxt = cogroup_join(
                nxt,
                keep_t,
                on=["node"],
                how="left_semi",
                left_schema=pa.schema([("a", pa.string()), ("node", pa.string())]),
                right_schema=pa.schema([("node", pa.string())]),
                num_buckets=num_buckets,
            ).map_batches(
                lambda b: b.rename(columns={"node": "b"}), batch_format="pandas"
            ).materialize()
        n_nxt = nxt.count()
        if n_nxt == n_edges:
            # stable: every surviving node has degree >= k
            def _nodes(b: pd.DataFrame) -> pd.DataFrame:
                u = pd.unique(pd.concat([b["a"], b["b"]], ignore_index=True))
                return pd.DataFrame({"node": u})

            return bucketed_reduce(
                cur.map_batches(_nodes, batch_format="pandas", batch_size=None),
                ["node"],
                lambda g: g.drop_duplicates("node"),
                KCORE_SCHEMA,
                combiner=lambda b: b.drop_duplicates("node"),
                num_buckets=num_buckets,
            )
        cur, n_edges = nxt, n_nxt
        if n_edges == 0:
            return ray.data.from_arrow(KCORE_SCHEMA.empty_table())
    raise RuntimeError(f"k_core did not converge within {max_iters} peel rounds")


MS_HOP_SCHEMA = pa.schema(
    [("source", pa.string()), ("entity", pa.string()), ("hop", pa.int64())]
)

CLOSENESS_SCHEMA = pa.schema(
    [("entity", pa.string()), ("n_reached", pa.int64()), ("total_dist", pa.int64())]
)


def multi_source_hops_local(
    und_df: pd.DataFrame, seeds: pd.DataFrame, hops: int
) -> pd.DataFrame:
    """Pure-pandas twin of :func:`_multi_source_sweep` — same
    merge-per-hop BFS over the SAME (possibly doubled) edge table,
    minimal hop per (source, entity). The count-gated fast path AND
    the equivalence-test reference."""
    visited = seeds[["source", "entity", "hop"]].drop_duplicates(
        ["source", "entity"]
    )
    frontier = visited
    edges_df = und_df[["src", "dst"]]
    for h in range(1, hops + 1):
        nxt = (
            frontier.merge(edges_df, left_on="entity", right_on="src")[
                ["source", "dst"]
            ]
            .rename(columns={"dst": "entity"})
            .drop_duplicates()
        )
        seen = visited["source"] + "\x00" + visited["entity"]
        fk = nxt["source"] + "\x00" + nxt["entity"]
        nxt = nxt[~fk.isin(set(seen.to_numpy()))]
        if len(nxt) == 0:
            break
        nxt = nxt.assign(hop=np.int64(h))
        visited = pd.concat([visited, nxt], ignore_index=True)
        frontier = nxt
    return visited


def multi_source_hops(
    edges: ray.data.Dataset,
    sources: "list[str] | ray.data.Dataset",
    hops: int,
    *,
    directed: bool = False,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """``(source, entity, hop)`` — minimal hop distance (<= ``hops``)
    from EACH source independently, in one shared BFS: the frontier
    carries the source label, so ``k`` sources cost the same number of
    sweeps as one (row volume k×, sweep count unchanged). Same fused
    dedup+anti-join shape as :func:`k_hop_neighbors`, keyed on
    ``(source, entity)``.

    ``sources`` may be a driver-side list OR a Dataset with a single
    ``source`` column — the Dataset form never collects the source set
    (the path for "one BFS per component root" where roots number in
    the millions)."""
    from .infer import bucketed_reduce, sanitize_for_join
    from .relational import cogroup_join

    und = sanitize_for_join(
        edges.select_columns(["src", "dst"]) if directed else _undirect(edges),
        EDGE_SCHEMA,
    ).materialize()

    if isinstance(sources, ray.data.Dataset):
        visited = sources.map_batches(
            lambda b: pa.table(
                {
                    "source": b["source"].combine_chunks().cast(pa.string()),
                    "entity": b["source"].combine_chunks().cast(pa.string()),
                    "hop": pa.array([0] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        srcs = sorted(set(sources))
        visited = ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array(srcs, pa.string()),
                    "entity": pa.array(srcs, pa.string()),
                    "hop": pa.array([0] * len(srcs), pa.int64()),
                }
            )
        ).materialize()

    # Count-gated local twin (same policy as every other graph op):
    # `hops` distributed rounds cost `hops` fixed-latency exchanges —
    # seconds of pure overhead on a toy graph pandas closes instantly.
    if und.count() + visited.count() <= driver_max_edges:
        out = multi_source_hops_local(und.to_pandas(), visited.to_pandas(), hops)
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array(out["source"].astype(str), pa.string()),
                    "entity": pa.array(out["entity"].astype(str), pa.string()),
                    "hop": pa.array(out["hop"].astype("int64"), pa.int64()),
                }
            ).cast(MS_HOP_SCHEMA)
        )
    return _multi_source_sweep(und, visited, hops, num_buckets=num_buckets)


def _multi_source_sweep(
    und: ray.data.Dataset,
    visited: ray.data.Dataset,
    hops: int,
    *,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """The shared frontier loop behind :func:`multi_source_hops`:
    ``visited`` seeds the sweep at hop 0; each round is one cogroup
    join (frontier x edges) + one fused dedup/anti-join bucketed
    reduce, stopping when the frontier empties."""
    from .infer import bucketed_reduce
    from .relational import cogroup_join

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["source", "entity", "hop"])

    def _new_only(g: pd.DataFrame) -> pd.DataFrame:
        seen = g.loc[g["hop"] < 0, ["source", "entity"]]
        fresh = g[g["hop"] >= 0]
        if len(seen):
            key = seen["source"] + "\x00" + seen["entity"]
            fk = fresh["source"] + "\x00" + fresh["entity"]
            fresh = fresh[~fk.isin(set(key.to_numpy()))]
        return fresh.drop_duplicates(["source", "entity"])

    def _mark_visited(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"].combine_chunks().cast(pa.string()),
                "entity": b["entity"].combine_chunks().cast(pa.string()),
                "hop": pa.array([-1] * len(b), pa.int64()),
            }
        )

    frontier = visited

    for h in range(1, hops + 1):
        hit = cogroup_join(
            und,
            frontier.map_batches(
                lambda b: pa.table(
                    {
                        "src": b["entity"].combine_chunks().cast(pa.string()),
                        "source": b["source"].combine_chunks().cast(pa.string()),
                    }
                ),
                batch_format="pyarrow",
            ),
            on=["src"],
            num_buckets=num_buckets,
            left_schema=EDGE_SCHEMA,
            right_schema=pa.schema([("src", pa.string()), ("source", pa.string())]),
        ).map_batches(
            lambda b, hh=h: pa.table(
                {
                    "source": b["source"].combine_chunks().cast(pa.string()),
                    "entity": b["dst"].combine_chunks().cast(pa.string()),
                    "hop": pa.array([hh] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        new = bucketed_reduce(
            hit.union(visited.map_batches(_mark_visited, batch_format="pyarrow")),
            ["source", "entity"],
            _new_only,
            MS_HOP_SCHEMA,
            combiner=_dd,
            num_buckets=num_buckets,
        ).materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new
    return visited


def sampled_closeness(
    edges: ray.data.Dataset,
    sources: list[str],
    *,
    max_hops: int = 10,
    directed: bool = False,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Sampled closeness-centrality statistics ``(entity, n_reached,
    total_dist)``: for every entity reachable from >= 1 of the
    deterministic ``sources``, how many sources reach it within
    ``max_hops`` and the sum of those hop distances (Eppstein–Wang
    sampled closeness, kept as exact integers so the recursive-CTE SQL
    oracle hash-matches; the float estimate ``n·|S| / (total·n_nodes)``
    is one map away and deliberately not baked in)."""
    from .infer import bucketed_reduce

    dists = multi_source_hops(
        edges, sources, max_hops, directed=directed, num_buckets=num_buckets
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("entity", sort=False, as_index=False).agg(
            n_reached=("hop", "size"), total_dist=("hop", "sum")
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("entity", sort=False, as_index=False)[
            ["n_reached", "total_dist"]
        ].sum()

    return bucketed_reduce(
        dists, ["entity"], _reduce, CLOSENESS_SCHEMA, combiner=_partial,
        num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# Personalized PageRank (teleport restricted to a seed set)
# ---------------------------------------------------------------------------

PPR_SCHEMA = pa.schema([("node", pa.string()), ("ppr_scaled", pa.int64())])


def ppr_int_local(
    edge_list: list[tuple[str, str]],
    seeds: tuple[str, ...],
    *,
    iters: int = 3,
    scale: int = 10**12,
    d_num: int = 85,
    d_den: int = 100,
) -> dict[str, int]:
    """Pure-Python reference of the integer personalized-PageRank
    recurrence — teleport mass ((1-d) restart AND dangling mass) lands
    only on the seed set, never uniformly:

        r'(v) = [v in S] * (base + d*(s_v + dangling//|S|)//den)
              + [v not in S] * (d*s_v//den)

    with ``base = ((den-num)*scale//den)//|S|`` and ``s_v`` the in-sum
    of ``r(u)//out(u)``. The unit-test and oracle-construction twin of
    :func:`ppr_int`."""
    nodes = sorted({x for e in edge_list for x in e})
    seed_set = sorted(set(seeds) & set(nodes))
    ns = len(seed_set)
    if not nodes or ns == 0:
        return {}
    out: dict[str, int] = {}
    for s, _ in edge_list:
        out[s] = out.get(s, 0) + 1
    base = ((d_den - d_num) * scale // d_den) // ns
    r = {v: (scale // ns if v in seed_set else 0) for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if v not in out)
        d_share = dangling // ns
        s_v = {v: 0 for v in nodes}
        for s, d in edge_list:
            s_v[d] += r[s] // out[s]
        r = {
            v: (
                base + d_num * (s_v[v] + d_share) // d_den
                if v in seed_set
                else d_num * s_v[v] // d_den
            )
            for v in nodes
        }
    return r


def ppr_int(
    edges: ray.data.Dataset,
    seeds: tuple[str, ...],
    *,
    iters: int = 3,
    scale: int = 10**12,
    d_num: int = 85,
    d_den: int = 100,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """``(node, ppr_scaled)`` after ``iters`` integer personalized
    PageRank steps from the given seed set (the relevance-to-S ranking
    behind KG neighborhood expansion and seeded retrieval).

    Same count-gated shape as :func:`pagerank_int`: under the gate the
    bit-identical local twin runs on the collected edge list; over it
    the iterated bucketed-join plan runs (2 shuffles per iteration)
    with the seed set broadcast in the stage closures (it is tiny by
    contract). Both paths produce identical integers (pinned by test).
    """
    node_schema = pa.schema([("node", pa.string())])
    seed_set = frozenset(seeds)

    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.count() <= driver_max_edges:
        df = edges.to_pandas()
        if df.empty or "src" not in df.columns:
            return ray.data.from_arrow(PPR_SCHEMA.empty_table())
        r = ppr_int_local(
            list(zip(df["src"], df["dst"])), seeds,
            iters=iters, scale=scale, d_num=d_num, d_den=d_den,
        )
        ks = sorted(r)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(ks, pa.string()),
                    "ppr_scaled": pa.array([r[k] for k in ks], pa.int64()),
                }
            )
        )

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates("node")

    def _as_node(col: str):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table({"node": b[col].combine_chunks().cast(pa.string())})

        return _f

    both = edges.map_batches(_as_node("src"), batch_format="pyarrow").union(
        edges.map_batches(_as_node("dst"), batch_format="pyarrow")
    )
    nodes = sanitize_for_join(
        bucketed_reduce(both, ["node"], _dd, node_schema, combiner=_dd,
                        num_buckets=num_buckets),
        node_schema,
    ).materialize()
    ns = int(
        nodes.map_batches(
            lambda b: pd.DataFrame(
                {"c": [int(b["node"].isin(seed_set).sum())]}
            ),
            batch_format="pandas",
        ).sum("c")
        or 0
    )
    if ns == 0:
        return ray.data.from_arrow(PPR_SCHEMA.empty_table())

    state_schema = pa.schema(
        [
            ("node", pa.string()),
            ("outdeg", pa.int64()),
            ("iseed", pa.int64()),
            ("rank_scaled", pa.int64()),
        ]
    )
    base = ((d_den - d_num) * scale // d_den) // ns
    r0 = scale // ns

    deg_rows = edges.map_batches(
        lambda b: pa.table(
            {
                "node": b["src"].combine_chunks().cast(pa.string()),
                "one": pa.array([1] * len(b), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).union(
        nodes.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"].combine_chunks().cast(pa.string()),
                    "one": pa.array([0] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def _init(b: pd.DataFrame) -> pd.DataFrame:
        seed = b["node"].isin(seed_set).to_numpy()
        return pd.DataFrame(
            {
                "node": b["node"],
                "outdeg": b["outdeg"].astype("int64"),
                "iseed": seed.astype(np.int64),
                "rank_scaled": np.where(seed, r0, 0).astype(np.int64),
            }
        )

    state = sanitize_for_join(
        grouped_sums(deg_rows, ["node"], {"outdeg": "one"}).map_batches(
            _init, batch_format="pandas"
        ),
        state_schema,
    ).materialize()

    edges_s = sanitize_for_join(edges.select_columns(["src", "dst"]), EDGE_SCHEMA)
    contrib_schema = pa.schema([("src", pa.string()), ("contrib", pa.int64())])

    def _masses(st: ray.data.Dataset) -> tuple[int, int]:
        agg = st.map_batches(
            lambda b: pd.DataFrame(
                {
                    "total": [int(b["rank_scaled"].sum())],
                    "linked": [int(b.loc[b["outdeg"] > 0, "rank_scaled"].sum())],
                }
            ),
            batch_format="pandas",
        )
        return int(agg.sum("total") or 0), int(agg.sum("linked") or 0)

    for _ in range(iters):
        total, linked = _masses(state)
        d_share = (total - linked) // ns

        contrib = sanitize_for_join(
            state.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "src": b.loc[b["outdeg"] > 0, "node"],
                        "contrib": (
                            b.loc[b["outdeg"] > 0, "rank_scaled"].astype("int64")
                            // b.loc[b["outdeg"] > 0, "outdeg"].astype("int64")
                        ),
                    }
                ),
                batch_format="pandas",
            ),
            contrib_schema,
        )
        edge_contrib = cogroup_join(
            edges_s, contrib, on=["src"],
            num_buckets=num_buckets,
            left_schema=EDGE_SCHEMA, right_schema=contrib_schema,
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["dst"].combine_chunks().cast(pa.string()),
                    "odeg": pa.array([0] * len(b), pa.int64()),
                    "isd": pa.array([0] * len(b), pa.int64()),
                    "s_v": b["contrib"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        carrier = state.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "odeg": b["outdeg"].astype("int64"),
                    "isd": b["iseed"].astype("int64"),
                    "s_v": np.zeros(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )

        def _next(b: pd.DataFrame, d_share=d_share) -> pd.DataFrame:
            seed = b["iseed"].astype("int64").to_numpy() > 0
            s_v = b["s_v"].astype("int64").to_numpy()
            rank = np.where(
                seed,
                base + d_num * (s_v + d_share) // d_den,
                d_num * s_v // d_den,
            )
            return pd.DataFrame(
                {
                    "node": b["node"],
                    "outdeg": b["outdeg"].astype("int64"),
                    "iseed": seed.astype(np.int64),
                    "rank_scaled": rank.astype(np.int64),
                }
            )

        state = sanitize_for_join(
            grouped_sums(
                edge_contrib.union(carrier), ["node"],
                {"outdeg": "odeg", "iseed": "isd", "s_v": "s_v"},
            ).map_batches(_next, batch_format="pandas"),
            state_schema,
        ).materialize()

    return state.map_batches(
        lambda b: pd.DataFrame(
            {"node": b["node"], "ppr_scaled": b["rank_scaled"].astype("int64")}
        ),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Sampled betweenness centrality (Brandes 2001, fixed-point dependencies)
# ---------------------------------------------------------------------------

BETWEENNESS_SCHEMA = pa.schema([("entity", pa.string()), ("bc_scaled", pa.int64())])
_BC_GUARD = 1 << 50  # sigma/delta ceiling: keeps every carry column and
#                      every product exactly representable (see below)


def _brandes_local_fixed(
    pairs: pd.DataFrame, sources: list[str], max_hops: int, scale: int
) -> dict[str, int]:
    """Driver twin — integer Brandes with the SAME fixed-point
    dependency arithmetic as the distributed path: contributions are
    ``sigma_u * (scale + delta_w) // sigma_w`` per (u, w) predecessor
    edge, summed as exact ints, so the two paths are bit-equal."""
    adj: dict[str, set[str]] = {}
    for a, b in zip(pairs["a"], pairs["b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    bc: dict[str, int] = {}
    for s in sources:
        if s not in adj:
            continue
        dist = {s: 0}
        sigma = {s: 1}
        levels: list[list[str]] = [[s]]
        frontier = [s]
        d = 0
        while frontier and d < max_hops:
            d += 1
            nxt: dict[str, None] = {}
            for u in frontier:
                for w in adj[u]:
                    if w in dist and dist[w] < d:
                        continue
                    if w not in dist:
                        dist[w] = d
                        nxt[w] = None
                    sigma[w] = sigma.get(w, 0) + sigma[u]
            frontier = list(nxt)
            if frontier:
                levels.append(frontier)
        delta = {v: 0 for v in dist}
        for dd in range(len(levels) - 1, 0, -1):
            for w in levels[dd]:
                val = scale + delta[w]
                for u in adj[w]:
                    if dist.get(u) == dd - 1:
                        delta[u] += sigma[u] * val // sigma[w]
                bc[w] = bc.get(w, 0) + delta[w]
    return {k: v for k, v in bc.items() if v > 0}


def sampled_betweenness(
    edges: ray.data.Dataset,
    sources: list[str],
    *,
    max_hops: int = 8,
    scale: int = 1_000_000,
    driver_max_edges: int = 2_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Sampled betweenness centrality (Brandes' dependency
    accumulation from a deterministic source sample — the standard
    estimator; exact Brandes is this with sources = all nodes).
    Output ``(entity, bc_scaled)``: the summed fixed-point dependency
    ``delta`` over sources, thousandths-of-``scale`` exact integers;
    zero-dependency nodes are omitted.

    Fixed-point deviation (documented, same family as
    ``pagerank_int``): real Brandes accumulates rational
    ``sigma_u/sigma_w (1 + delta_w)``; here every contribution is the
    floored integer ``sigma_u * (scale + delta_w) // sigma_w``, which
    makes the distributed and driver paths bit-equal and
    layout-independent. Error vs the rational value is < 1/scale per
    accumulation step.

    Scale plan: the undirected simple edge set is built with one
    bucketed dedup; under ``driver_max_edges`` the driver twin runs
    (like the other gated graph ops), above it the distributed path:
    per BFS level ONE edge join + ONE keyed reduce forward (sigma
    sums, fused visited markers), and per level backward one
    delta join + one edge join + one predecessor join + one keyed sum
    — all shared across the whole source sample (frontier rows carry
    the source label, so k sources cost k-fold rows, not k-fold
    sweeps). Sigma and delta are guarded below 2^50 so every
    cogroup_join carry column stays exactly representable if upcast
    (< 2^53) and every product fits int64; a graph that trips the
    guard raises loudly instead of silently wrapping."""
    simple = undirected_simple_edges(edges, num_buckets=num_buckets).materialize()
    srcs = sorted(set(sources))
    if not srcs or simple.count() == 0:
        return ray.data.from_arrow(BETWEENNESS_SCHEMA.empty_table())
    if simple.count() <= driver_max_edges:
        bc = _brandes_local_fixed(simple.to_pandas(), srcs, max_hops, scale)
        if not bc:
            return ray.data.from_arrow(BETWEENNESS_SCHEMA.empty_table())
        items = sorted(bc.items())
        return ray.data.from_arrow(
            pa.table(
                {
                    "entity": pa.array([k for k, _ in items], pa.string()),
                    "bc_scaled": pa.array([v for _, v in items], pa.int64()),
                }
            )
        )
    return _betweenness_distributed(simple, srcs, max_hops, scale, num_buckets)


def _betweenness_distributed(
    simple: ray.data.Dataset,
    srcs: list[str],
    max_hops: int,
    scale: int,
    num_buckets: int | None,
) -> ray.data.Dataset:
    from .infer import bucketed_reduce, sanitize_for_join
    from .relational import cogroup_join

    lvl_schema = pa.schema(
        [("source", pa.string()), ("entity", pa.string()), ("sigma", pa.int64())]
    )
    delta_schema = pa.schema(
        [("source", pa.string()), ("entity", pa.string()), ("delta", pa.int64())]
    )

    und = sanitize_for_join(
        _undirect(
            simple.map_batches(
                lambda b: pa.table(
                    {
                        "src": b["a"].combine_chunks().cast(pa.string()),
                        "dst": b["b"].combine_chunks().cast(pa.string()),
                    }
                ),
                batch_format="pyarrow",
            )
        ),
        EDGE_SCHEMA,
    ).materialize()

    lvl0 = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "entity": pa.array(srcs, pa.string()),
                "sigma": pa.array([1] * len(srcs), pa.int64()),
            }
        )
    ).materialize()
    levels = [lvl0]
    visited = lvl0
    frontier = lvl0

    flag_schema = pa.schema(list(lvl_schema) + [pa.field("flag", pa.int64())])

    def _next_level(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["source", "entity"], sort=False, as_index=False).agg(
            sigma=("sigma", "sum"), flag=("flag", "max")
        )
        agg = agg[agg["flag"] == 0]
        if len(agg) and int(agg["sigma"].max()) >= _BC_GUARD:
            raise OverflowError(
                "sampled_betweenness: sigma exceeded the 2^50 exactness "
                "guard — the sampled subgraph has too many shortest paths "
                "for fixed-point accumulation; lower max_hops or sample "
                "fewer/hub-free sources"
            )
        return agg[["source", "entity", "sigma"]]

    for _h in range(1, max_hops + 1):
        hit = cogroup_join(
            und,
            frontier.map_batches(
                lambda b: pa.table(
                    {
                        "src": b["entity"].combine_chunks().cast(pa.string()),
                        "source": b["source"].combine_chunks().cast(pa.string()),
                        "sigma": b["sigma"].combine_chunks().cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            on=["src"],
            num_buckets=num_buckets,
            left_schema=EDGE_SCHEMA,
            right_schema=pa.schema(
                [("src", pa.string()), ("source", pa.string()),
                 ("sigma", pa.int64())]
            ),
        ).map_batches(
            lambda b: pa.table(
                {
                    "source": b["source"].combine_chunks().cast(pa.string()),
                    "entity": b["dst"].combine_chunks().cast(pa.string()),
                    "sigma": b["sigma"].combine_chunks().cast(pa.int64()),
                    "flag": pa.array([0] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        markers = visited.map_batches(
            lambda b: pa.table(
                {
                    "source": b["source"].combine_chunks().cast(pa.string()),
                    "entity": b["entity"].combine_chunks().cast(pa.string()),
                    "sigma": pa.array([0] * len(b), pa.int64()),
                    "flag": pa.array([1] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        nxt = bucketed_reduce(
            hit.union(markers),
            ["source", "entity"],
            _next_level,
            lvl_schema,
            num_buckets=num_buckets,
        ).materialize()
        if nxt.count() == 0:
            break
        levels.append(nxt)
        visited = visited.union(nxt).materialize()
        frontier = nxt

    dmax = len(levels) - 1
    if dmax == 0:
        return ray.data.from_arrow(BETWEENNESS_SCHEMA.empty_table())

    bc_parts: list[ray.data.Dataset] = []
    delta_curr: ray.data.Dataset | None = None  # delta of levels[d] nodes

    def _sum_delta(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["source", "entity"], sort=False, as_index=False)[
            "delta"
        ].sum()
        if len(agg) and int(agg["delta"].max()) >= _BC_GUARD:
            raise OverflowError(
                "sampled_betweenness: delta exceeded the 2^50 exactness "
                "guard; lower max_hops or the source sample size"
            )
        return agg

    for d in range(dmax, 0, -1):
        rows_d = levels[d]
        if delta_curr is None:
            w_rows = rows_d.map_batches(
                lambda b: pa.table(
                    {
                        "source": b["source"].combine_chunks().cast(pa.string()),
                        "entity": b["entity"].combine_chunks().cast(pa.string()),
                        "sigma": b["sigma"].combine_chunks().cast(pa.int64()),
                        "delta": pa.array([0] * len(b), pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        else:
            w_rows = cogroup_join(
                rows_d,
                delta_curr,
                on=["source", "entity"],
                how="left_outer",
                num_buckets=num_buckets,
                left_schema=lvl_schema,
                right_schema=delta_schema,
            ).map_batches(
                lambda b: pd.DataFrame(
                    {
                        "source": b["source"],
                        "entity": b["entity"],
                        "sigma": b["sigma"].astype("int64"),
                        "delta": b["delta"].fillna(0).astype("int64"),
                    }
                ),
                batch_format="pandas",
            )
        w_rows = w_rows.materialize()
        bc_parts.append(
            w_rows.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "entity": b["entity"],
                        "delta": b["delta"].astype("int64"),
                    }
                ),
                batch_format="pandas",
            )
        )
        if d == 1:
            break

        wproj = w_rows.map_batches(
            lambda b: pd.DataFrame(
                {
                    "dst": b["entity"].astype(str),
                    "source": b["source"].astype(str),
                    "sigma_w": b["sigma"].astype("int64"),
                    "val": (np.int64(scale) + b["delta"].astype("int64")),
                }
            ),
            batch_format="pandas",
        )
        hit = cogroup_join(
            und,
            wproj,
            on=["dst"],
            num_buckets=num_buckets,
            left_schema=EDGE_SCHEMA,
            right_schema=pa.schema(
                [("dst", pa.string()), ("source", pa.string()),
                 ("sigma_w", pa.int64()), ("val", pa.int64())]
            ),
        ).map_batches(
            lambda b: pd.DataFrame(
                {
                    "source": b["source"].astype(str),
                    "entity": b["src"].astype(str),
                    "sigma_w": b["sigma_w"].astype("int64"),
                    "val": b["val"].astype("int64"),
                }
            ),
            batch_format="pandas",
        )
        pred = cogroup_join(
            hit,
            levels[d - 1].map_batches(
                lambda b: pa.table(
                    {
                        "source": b["source"].combine_chunks().cast(pa.string()),
                        "entity": b["entity"].combine_chunks().cast(pa.string()),
                        "sigma_u": b["sigma"].combine_chunks().cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            on=["source", "entity"],
            num_buckets=num_buckets,
            left_schema=pa.schema(
                [("source", pa.string()), ("entity", pa.string()),
                 ("sigma_w", pa.int64()), ("val", pa.int64())]
            ),
            right_schema=pa.schema(
                [("source", pa.string()), ("entity", pa.string()),
                 ("sigma_u", pa.int64())]
            ),
        )

        def _contrib(b: pd.DataFrame) -> pd.DataFrame:
            su = b["sigma_u"].to_numpy(np.int64)
            sw = b["sigma_w"].to_numpy(np.int64)
            val = b["val"].to_numpy(np.int64)
            if len(su) and (su.astype(np.float64) * val.astype(np.float64)).max() >= float(1 << 62):
                raise OverflowError(
                    "sampled_betweenness: sigma_u * (scale + delta) product "
                    "would overflow int64; lower scale or max_hops"
                )
            return pd.DataFrame(
                {
                    "source": b["source"],
                    "entity": b["entity"],
                    "delta": (su * val) // sw,
                }
            )

        delta_curr = bucketed_reduce(
            pred.map_batches(_contrib, batch_format="pandas"),
            ["source", "entity"],
            _sum_delta,
            delta_schema,
            num_buckets=num_buckets,
        ).materialize()

    def _bc_sum(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("entity", sort=False, as_index=False)["delta"].sum()
        agg = agg[agg["delta"] > 0]
        return pd.DataFrame(
            {"entity": agg["entity"], "bc_scaled": agg["delta"].astype("int64")}
        )

    allparts = bc_parts[0].union(*bc_parts[1:]) if len(bc_parts) > 1 else bc_parts[0]
    return bucketed_reduce(
        allparts, ["entity"], _bc_sum, BETWEENNESS_SCHEMA, num_buckets=num_buckets
    )


HARMONIC_SCHEMA = pa.schema(
    [("entity", pa.string()), ("harmonic_scaled", pa.int64())]
)


def harmonic_centrality(
    edges: ray.data.Dataset,
    sources: list[str],
    *,
    max_hops: int = 10,
    scale: int = 1_000_000,
    directed: bool = False,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Sampled harmonic centrality ``(entity, harmonic_scaled)`` =
    ``sum over reaching sources of scale // hop`` (hop >= 1) — the
    centrality that stays finite on disconnected graphs. Exact
    integers (``//`` matches DuckDB's), so the recursive-CTE oracle
    hash-matches; one shared multi-source BFS like
    :func:`sampled_closeness`."""
    from .infer import bucketed_reduce

    dists = multi_source_hops(
        edges, sources, max_hops, directed=directed, num_buckets=num_buckets
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "hop" not in b.columns:
            return pd.DataFrame(
                {"entity": pd.Series([], dtype=object),
                 "harmonic_scaled": pd.Series([], dtype="int64")}
            )
        b = b[b["hop"] > 0]
        h = pd.DataFrame(
            {
                "entity": b["entity"],
                "harmonic_scaled": np.int64(scale)
                // b["hop"].to_numpy(np.int64),
            }
        )
        return h.groupby("entity", sort=False, as_index=False)[
            "harmonic_scaled"
        ].sum()

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("entity", sort=False, as_index=False)[
            "harmonic_scaled"
        ].sum()

    return bucketed_reduce(
        dists, ["entity"], _reduce, HARMONIC_SCHEMA, combiner=_partial,
        num_buckets=num_buckets,
    )


SCC_SCHEMA = pa.schema([("entity", pa.string()), ("scc_id", pa.string())])


def scc_local(
    edge_list: list[tuple[str, str]], nodes: list[str]
) -> dict[str, str]:
    """Driver twin of :func:`scc_labels` — iterative Kosaraju over a
    collected edge list; returns ``{node: lexicographic-min member}``
    for every node in ``nodes``."""
    fwd: dict[str, list[str]] = {n: [] for n in nodes}
    bwd: dict[str, list[str]] = {n: [] for n in nodes}
    for s, d in edge_list:
        if s in fwd and d in fwd:
            fwd[s].append(d)
            bwd[d].append(s)
    order: list[str] = []
    seen: set[str] = set()
    for root in nodes:
        if root in seen:
            continue
        stack: list[tuple[str, int]] = [(root, 0)]
        seen.add(root)
        while stack:
            u, i = stack.pop()
            if i < len(fwd[u]):
                stack.append((u, i + 1))
                v = fwd[u][i]
                if v not in seen:
                    seen.add(v)
                    stack.append((v, 0))
            else:
                order.append(u)
    out: dict[str, str] = {}
    for root in reversed(order):
        if root in out:
            continue
        comp = [root]
        out[root] = root
        k = 0
        while k < len(comp):
            for v in bwd[comp[k]]:
                if v not in out:
                    out[v] = root
                    comp.append(v)
            k += 1
        label = min(comp)
        for v in comp:
            out[v] = label
    return out


def scc_labels(
    edges: ray.data.Dataset,
    nodes: list[str],
    *,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """``(entity, scc_id)`` — strongly connected component of every
    node in ``nodes`` over the DIRECTED ``(src, dst)`` edges, where
    ``scc_id`` is the lexicographic-min node id among co-reachable
    nodes (itself included), the deterministic canonical label.

    Shape: two shared-sweep BFS passes (:func:`multi_source_hops` on
    the forward and on the reversed edge set, every node a source), a
    bucketed semi-join keyed ``(source, entity)`` — ``s`` reaches
    ``u`` forward AND ``u`` reaches ``s`` (= ``s`` reaches ``u`` in
    the reversed graph) iff the pair is co-reachable — and one grouped
    lexicographic min.

    COUNT-GATED like every residue collect in this repo: under
    ``driver_max_edges`` the bit-identical Kosaraju twin runs on the
    collected edge list (the distributed plan pays ~4 fixed stage
    costs per BFS round, which dwarfs a small graph); over the gate
    nothing is collected and the shared-sweep path runs. Both paths
    produce identical labels (pinned by test).

    Partitioning assumption: ``nodes`` is a DIMENSION-sized vertex set
    (every node is a BFS source, so frontier row volume is |nodes| x
    reachable set — the all-pairs co-reachability this computes is
    quadratic by definition). For web-scale graphs run it on the
    contracted/community graph or a pivot sample, exactly like
    ``sampled_betweenness``/``sampled_closeness``.
    """
    from .infer import bucketed_reduce
    from .relational import cogroup_join

    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.count() <= driver_max_edges:
        df = edges.to_pandas()
        pairs = (
            list(zip(df["src"], df["dst"]))
            if not df.empty and "src" in df.columns
            else []
        )
        labels = scc_local(pairs, sorted(set(nodes)))
        ks = sorted(labels)
        return ray.data.from_arrow(
            pa.table(
                {
                    "entity": pa.array(ks, pa.string()),
                    "scc_id": pa.array([labels[k] for k in ks], pa.string()),
                }
            )
        )

    hops = max(1, len(nodes) - 1)
    fwd = multi_source_hops(
        edges, nodes, hops, directed=True, num_buckets=num_buckets
    ).select_columns(["source", "entity"])
    rev_edges = edges.map_batches(
        lambda b: pa.table(
            {
                "src": b["dst"].combine_chunks().cast(pa.string()),
                "dst": b["src"].combine_chunks().cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    bwd = multi_source_hops(
        rev_edges, nodes, hops, directed=True, num_buckets=num_buckets
    ).select_columns(["source", "entity"])

    pair_schema = pa.schema([("source", pa.string()), ("entity", pa.string())])
    co = cogroup_join(
        fwd, bwd, on=["source", "entity"], how="left_semi",
        num_buckets=num_buckets,
        left_schema=pair_schema, right_schema=pair_schema,
    )

    def _combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("entity", sort=False, as_index=False)["source"].min()

    def _finish(g: pd.DataFrame) -> pd.DataFrame:
        return _combine(g).rename(columns={"source": "scc_id"})

    return bucketed_reduce(
        co, ["entity"], _finish, SCC_SCHEMA,
        combiner=_combine, num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# Edge triangle support + k-truss decomposition
# ---------------------------------------------------------------------------

EDGE_SUPPORT_SCHEMA = pa.schema(
    [("a", pa.string()), ("b", pa.string()), ("support", pa.int64())]
)


def _canon_pairs(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lt = x < y
    return np.where(lt, x, y), np.where(lt, y, x)


def _support_from_closed(closed: pd.DataFrame) -> pd.DataFrame:
    """Each closed wedge (apex, x, y) is one triangle; credit its three
    edges, canonicalized to ``a < b`` (orientation order is by degree
    rank, not node name)."""
    ax = closed["apex"].to_numpy(object)
    x = closed["x"].to_numpy(object)
    y = closed["y"].to_numpy(object)
    a1, b1 = _canon_pairs(ax, x)
    a2, b2 = _canon_pairs(ax, y)
    a3, b3 = _canon_pairs(x, y)
    pairs = pd.DataFrame(
        {
            "a": np.concatenate([a1, a2, a3]),
            "b": np.concatenate([b1, b2, b3]),
        }
    )
    vc = pairs.value_counts(["a", "b"], sort=False).rename("support").reset_index()
    vc["support"] = vc["support"].astype("int64")
    return vc


def _edge_support_local(und: pd.DataFrame, max_wedges_per_node: int) -> pd.DataFrame:
    """Pandas twin of the distributed edge-support plan — SAME
    orientation + wedge templates + closing merge as
    :func:`_triangle_counts_local`, but credited per canonical edge
    (edges in zero triangles included with support 0)."""
    from .dedup import _pair_indices_by_size

    nodes = pd.concat([und["a"], und["b"]], ignore_index=True)
    degs = nodes.value_counts(sort=False)
    da = und["a"].map(degs).to_numpy(np.int64)
    db = und["b"].map(degs).to_numpy(np.int64)
    ori = _orient_frame(und, da, db).sort_values(["u", "deg_v", "v"], kind="stable")
    codes = ori["u"].to_numpy(object)
    i, j = _pair_indices_by_size(codes, max_wedges_per_node)
    v = ori["v"].to_numpy(object)
    wedges = pd.DataFrame({"x": v[i], "y": v[j], "apex": codes[i]})
    closed = wedges.merge(
        ori[["u", "v"]].rename(columns={"u": "x", "v": "y"}),
        on=["x", "y"],
        how="inner",
    )
    sup = _support_from_closed(closed) if len(closed) else pd.DataFrame(
        {"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object),
         "support": pd.Series([], dtype="int64")}
    )
    out = und[["a", "b"]].merge(sup, on=["a", "b"], how="left")
    out["support"] = out["support"].fillna(0).astype("int64")
    return out.sort_values(["a", "b"], kind="stable").reset_index(drop=True)


def edge_support(
    edges: ray.data.Dataset,
    *,
    driver_max_edges: int = 2_000_000,
    driver_max_nodes: int = 2_000_000,
    max_wedges_per_node: int = 1 << 62,
    num_buckets: int | None = None,
    _pre_canonical: bool = False,
) -> ray.data.Dataset:
    """``(a, b, support)`` — per-edge triangle count over the
    undirected simple graph (``a < b`` canonical; edges in zero
    triangles included with support 0). This is the k-truss peeling
    measure and a cohesion signal in its own right (an edge with high
    support sits inside a dense community; a bridge has support 0).

    Same plan and DOUBLE COUNT-GATING as :func:`triangle_counts` —
    degree-ordered orientation (O(m^1.5) wedge work independent of
    hot-node skew), one bucketed wedge shuffle, one closing shuffle —
    but the closing reduce credits each triangle's THREE canonical
    edges instead of its three corners, and a final union with
    zero-support edge markers keeps triangle-free edges in the output.
    ``_pre_canonical`` skips the simple-edge normalization when the
    caller already holds canonical ``(a, b)`` edges (the k-truss loop).
    """
    und = (
        edges.materialize()
        if _pre_canonical
        else undirected_simple_edges(edges, num_buckets=num_buckets).materialize()
    )

    if und.count() <= driver_max_edges:
        df = und.to_pandas()
        if df.empty or "a" not in df.columns:  # empty loses its schema
            return ray.data.from_arrow(EDGE_SUPPORT_SCHEMA.empty_table())
        out = _edge_support_local(df, max_wedges_per_node)
        return ray.data.from_arrow(pa_from_pandas(out, EDGE_SUPPORT_SCHEMA))

    oriented = _oriented_distributed(
        und, driver_max_nodes=driver_max_nodes, num_buckets=num_buckets
    ).materialize()

    wedge_schema = pa.schema(
        [("x", pa.string()), ("y", pa.string()), ("apex", pa.string())]
    )

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _pair_indices_by_size

        g = g.sort_values(["u", "deg_v", "v"], kind="stable")
        codes = g["u"].to_numpy(object)
        i, j = _pair_indices_by_size(codes, max_wedges_per_node)
        v = g["v"].to_numpy(object)
        return pd.DataFrame({"x": v[i], "y": v[j], "apex": codes[i]})

    wedges = bucketed_reduce(
        oriented, ["u"], _wedges, wedge_schema, num_buckets=num_buckets
    )

    edge_marker = oriented.map_batches(
        lambda b: pd.DataFrame(
            {
                "x": b["u"].to_numpy(object) if len(b) else pd.Series([], dtype=object),
                "y": b["v"].to_numpy(object) if len(b) else pd.Series([], dtype=object),
                "apex": pd.Series([None] * len(b), dtype=object),
            }
        ),
        batch_format="pandas",
    )

    def _close(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["apex"].isna()
        closed = g[~is_edge].merge(
            g.loc[is_edge, ["x", "y"]].drop_duplicates(), on=["x", "y"], how="inner"
        )
        if len(closed) == 0:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object),
                 "support": pd.Series([], dtype="int64")}
            )
        return _support_from_closed(closed)

    partials = bucketed_reduce(
        wedges.union(edge_marker), ["x", "y"], _close, EDGE_SUPPORT_SCHEMA,
        num_buckets=num_buckets,
    )

    zeros = und.map_batches(
        lambda b: pd.DataFrame(
            {
                "a": b["a"].to_numpy(object) if len(b) else pd.Series([], dtype=object),
                "b": b["b"].to_numpy(object) if len(b) else pd.Series([], dtype=object),
                "support": np.zeros(len(b), np.int64),
            }
        ),
        batch_format="pandas",
    )

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a", "b"], sort=False, as_index=False)["support"].sum()

    return bucketed_reduce(
        partials.union(zeros),
        ["a", "b"],
        _sum,
        EDGE_SUPPORT_SCHEMA,
        combiner=_sum,
        num_buckets=num_buckets,
    )


def k_truss_local(und: pd.DataFrame, k: int, max_wedges_per_node: int) -> pd.DataFrame:
    """Pandas peeling twin: drop edges with support < k-2, recompute,
    repeat to fixpoint. Returns the surviving edges with their
    within-truss support."""
    edges = und[["a", "b"]].reset_index(drop=True)
    while True:
        if len(edges) == 0:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object),
                 "support": pd.Series([], dtype="int64")}
            )
        sup = _edge_support_local(edges, max_wedges_per_node)
        keep = sup[sup["support"] >= k - 2]
        if len(keep) == len(edges):
            return keep.reset_index(drop=True)
        edges = keep[["a", "b"]].reset_index(drop=True)


def k_truss(
    edges: ray.data.Dataset,
    k: int,
    *,
    driver_max_edges: int = 2_000_000,
    driver_max_nodes: int = 2_000_000,
    max_wedges_per_node: int = 1 << 62,
    max_iters: int = 100,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """k-truss decomposition: the maximal subgraph in which every edge
    sits in at least ``k-2`` triangles OF THE SUBGRAPH — the standard
    community-core extractor one notch stronger than k-core (cf.
    networkx ``k_truss``; J. Cohen, "Trusses: cohesive subgraphs for
    social network analysis", 2008). Returns the surviving canonical
    edges with their within-truss support.

    COUNT-GATED per house policy: under ``driver_max_edges`` the whole
    peel runs on the collected edge list (bit-equal to the distributed
    loop by construction — pinned by the forced-gate test); over it,
    each round is one distributed :func:`edge_support` pass plus a
    map-only filter, and only the edge COUNT crosses the driver per
    round. Rounds are bounded by ``max_iters`` (each round strictly
    shrinks the edge set, so the loop terminates on its own; the bound
    is a backstop)."""
    if k < 2:
        raise ValueError("k-truss needs k >= 2")
    und = undirected_simple_edges(edges, num_buckets=num_buckets).materialize()

    if und.count() <= driver_max_edges:
        df = und.to_pandas()
        if df.empty or "a" not in df.columns:
            return ray.data.from_arrow(EDGE_SUPPORT_SCHEMA.empty_table())
        out = k_truss_local(df, k, max_wedges_per_node)
        return ray.data.from_arrow(pa_from_pandas(out, EDGE_SUPPORT_SCHEMA))

    cur = und
    n_cur = cur.count()
    for _ in range(max_iters):
        sup = edge_support(
            cur,
            driver_max_edges=driver_max_edges,
            driver_max_nodes=driver_max_nodes,
            max_wedges_per_node=max_wedges_per_node,
            num_buckets=num_buckets,
            _pre_canonical=True,
        ).materialize()
        keep = sup.map_batches(
            lambda b, _k=k: b.filter(pc.greater_equal(b["support"], _k - 2)),
            batch_format="pyarrow",
        ).materialize()
        n_keep = keep.count()
        if n_keep == n_cur:
            return keep
        if n_keep == 0:
            return ray.data.from_arrow(EDGE_SUPPORT_SCHEMA.empty_table())
        cur = keep.select_columns(["a", "b"]).materialize()
        n_cur = n_keep
    return keep


# ---------------------------------------------------------------------------
# Resource-allocation link prediction (Zhou, Lu, Zhang 2009)
# ---------------------------------------------------------------------------

RA_SCHEMA = pa.schema(
    [("x", pa.string()), ("y", pa.string()), ("score", pa.int64())]
)


def resource_allocation_topk(
    edges: ray.data.Dataset,
    *,
    top_k: int = 100,
    scale: int = 1_000_000,
    max_degree: int | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Top-``top_k`` NON-adjacent node pairs by the resource-allocation
    link-prediction index ``RA(x, y) = sum_{w in N(x) & N(y)} 1/deg(w)``
    in exact integer fixed-point (each common neighbor ``w``
    contributes ``scale // deg(w)``, so scores hash-match a pure-SQL
    twin where float RA never could). Ties break ``(score desc, x, y)``.

    Scale shape — two bucketed shuffles, zero joins:

    1. middle-keyed reduce: bucketing the adjacency by the MIDDLE node
       co-locates each middle's whole neighbor list, so its degree is
       its local group size (no degree join) and candidate pairs are
       vectorized ``_pair_indices_by_size`` templates, each carrying
       the middle's ``scale // deg`` weight; per-middle explosion is
       C(deg, 2), never corpus-sized.
    2. pair-keyed sum with existing edges excluded by SENTINEL rows
       (every real edge is unioned in once with score ``-4*scale``;
       a pair group containing a sentinel is an edge, dropped inside
       the reduce) — the anti-join costs zero extra exchanges. Local
       top-k per bucket, driver merges ``<= buckets * top_k`` rows.

    ``max_degree`` optionally DROPS celebrity middles (deg > cap)
    before pair generation — the standard RA stop-node guard (their
    per-pair contribution ``scale // deg`` is tiny while their pair
    explosion is quadratic). Exact when ``None``; any SQL twin must
    apply the same cap to stay comparable.
    """
    und = undirected_simple_edges(edges, num_buckets=num_buckets).materialize()

    adj_schema = pa.schema([("w", pa.string()), ("v", pa.string())])

    adj = und.map_batches(
        lambda b: pd.DataFrame(
            {
                "w": pd.concat([b["a"], b["b"]], ignore_index=True),
                "v": pd.concat([b["b"], b["a"]], ignore_index=True),
            }
        )
        if len(b)
        else pd.DataFrame({"w": pd.Series([], dtype=object), "v": pd.Series([], dtype=object)}),
        batch_format="pandas",
    )

    pair_schema = pa.schema(
        [("x", pa.string()), ("y", pa.string()), ("score", pa.int64())]
    )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _pair_indices_by_size

        g = g.sort_values(["w", "v"], kind="stable")
        deg = g.groupby("w", sort=False)["v"].transform("size")
        if max_degree is not None:
            g = g[deg <= max_degree]
            deg = deg[deg <= max_degree]
        codes = g["w"].to_numpy(object)
        i, j = _pair_indices_by_size(codes, 1 << 62)
        v = g["v"].to_numpy(object)
        wgt = (scale // deg.to_numpy(np.int64))[i]
        x, y = _canon_pairs(v[i], v[j])
        out = pd.DataFrame({"x": x, "y": y, "score": wgt})
        # map-side pre-aggregation: a hot pair crosses once per bucket
        return out.groupby(["x", "y"], sort=False, as_index=False)["score"].sum()

    partials = bucketed_reduce(adj, ["w"], _pairs, pair_schema, num_buckets=num_buckets)

    sentinel = -4 * scale
    markers = und.map_batches(
        lambda b: pd.DataFrame(
            {
                "x": b["a"].to_numpy(object) if len(b) else pd.Series([], dtype=object),
                "y": b["b"].to_numpy(object) if len(b) else pd.Series([], dtype=object),
                "score": np.full(len(b), sentinel, np.int64),
            }
        ),
        batch_format="pandas",
    )

    def _sum_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["x", "y"], sort=False, as_index=False)["score"].sum()
        # any group containing a sentinel is an existing edge: its sum
        # is <= sentinel + C(deg,2)*scale... not bounded — detect via min
        mins = g.groupby(["x", "y"], sort=False, as_index=False)["score"].min()
        s = s[mins["score"].to_numpy() > 0]
        s = s[s["score"] > 0]
        return s.sort_values(
            ["score", "x", "y"], ascending=[False, True, True]
        ).head(top_k)

    from .infer import default_num_partitions

    top = bucketed_reduce(
        partials.repartition(default_num_partitions()).union(markers),
        ["x", "y"],
        _sum_topk,
        pair_schema,
        num_buckets=num_buckets,
    )
    df = top.to_pandas()
    if df.empty or "x" not in df.columns:  # empty loses its schema
        return ray.data.from_arrow(RA_SCHEMA.empty_table())
    df = (
        df.sort_values(["score", "x", "y"], ascending=[False, True, True])
        .head(top_k)
        .reset_index(drop=True)
    )
    return ray.data.from_arrow(pa_from_pandas(df, RA_SCHEMA))


# ---------------------------------------------------------------------------
# Bipartite check + 2-coloring (doubled-graph parity closure)
# ---------------------------------------------------------------------------

BIPARTITE_SCHEMA = pa.schema(
    [
        ("entity", pa.string()),
        ("component", pa.string()),
        ("side", pa.int64()),
        ("is_bipartite", pa.bool_()),
    ]
)

_PARITY_SEP = "\x01"


def bipartite_local(und: pd.DataFrame) -> pd.DataFrame:
    """Driver twin: union-find components (labeled by min entity) +
    parity BFS from each root. For a bipartite component the parity of
    ANY path from the root is unique, so the coloring is deterministic
    regardless of visit order; a non-bipartite component (odd cycle)
    gets ``side = -1`` on every member."""
    from collections import deque

    adj: dict[str, set[str]] = {}
    for a, b in zip(und["a"], und["b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    seen: dict[str, tuple[str, int]] = {}  # entity -> (component, parity)
    comp_conflict: dict[str, bool] = {}
    for root in sorted(adj):
        if root in seen:
            continue
        comp_nodes, conflict = [], False
        parity = {root: 0}
        q = deque([root])
        while q:
            u = q.popleft()
            comp_nodes.append(u)
            for v in sorted(adj[u]):
                if v not in parity:
                    parity[v] = parity[u] ^ 1
                    q.append(v)
                elif parity[v] == parity[u]:
                    conflict = True
        label = min(comp_nodes)
        comp_conflict[label] = conflict
        for n in comp_nodes:
            seen[n] = (label, parity[n])

    ents = sorted(seen)
    comps = [seen[e][0] for e in ents]
    bip = [not comp_conflict[c] for c in comps]
    sides = [seen[e][1] if ok else -1 for e, ok in zip(ents, bip)]
    return pd.DataFrame(
        {
            "entity": ents,
            "component": comps,
            "side": np.array(sides, np.int64),
            "is_bipartite": bip,
        }
    )


def bipartite_labels(
    edges: ray.data.Dataset,
    *,
    driver_max_edges: int = 2_000_000,
    flag_broadcast_max: int = 2_000_000,
    max_hops: int = 10_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-node 2-coloring with odd-cycle detection: ``(entity,
    component, side, is_bipartite)`` where ``component`` is the weak
    component's min entity, ``side`` is the node's parity (hop
    distance mod 2) from that root — unique whenever the component IS
    bipartite — and every member of a non-bipartite component reports
    ``side = -1``. The workhorse behind "is this interaction graph
    really two-mode?" checks before any bipartite-projection operator
    runs (projecting a graph that secretly has odd cycles silently
    corrupts co-occurrence counts).

    COUNT-GATED per house policy: under ``driver_max_edges`` the whole
    thing runs on the collected edge list (:func:`bipartite_local` —
    bit-equal by the parity-uniqueness argument in its docstring).
    Distributed plan, all shuffles bucketed:

    1. :func:`weak_components` labels nodes (min-label propagation).
    2. The DOUBLED graph — each undirected edge becomes 4 directed
       state edges ``(u, p) -> (v, 1-p)`` — turns parity closure into
       plain reachability; component roots seed
       :func:`_multi_source_sweep` AS A DATASET at state parity 0
       (roots are never collected: web graphs have millions of tiny
       components), so one shared BFS colors every component.
    3. One ``(component, entity)``-keyed reduce folds the reached
       states: an entity holding BOTH parities is an odd-cycle
       witness; a per-component any-conflict reduce (residue = one row
       per component) then broadcasts (gated) or joins back.
    """
    und = undirected_simple_edges(edges, num_buckets=num_buckets).materialize()

    if und.count() <= driver_max_edges:
        df = und.to_pandas()
        if df.empty or "a" not in df.columns:
            return ray.data.from_arrow(BIPARTITE_SCHEMA.empty_table())
        return ray.data.from_arrow(
            pa_from_pandas(bipartite_local(df), BIPARTITE_SCHEMA)
        )

    from .infer import bucketed_reduce
    from .relational import cogroup_join

    comp = weak_components(
        und.map_batches(
            lambda b: pa.table(
                {
                    "subject": b["a"].combine_chunks().cast(pa.string()),
                    "object": b["b"].combine_chunks().cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        ),
        driver_max_edges=driver_max_edges,
        num_buckets=num_buckets,
    ).materialize()

    roots_schema = pa.schema([("source", pa.string())])

    def _roots(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"source": g["component"].unique()})

    roots = bucketed_reduce(
        comp.select_columns(["component"]),
        ["component"],
        _roots,
        roots_schema,
        combiner=lambda b: b.drop_duplicates("component"),
        num_buckets=num_buckets,
    ).map_batches(
        # seed at parity 0: the root's state is "root\x010"
        lambda b: pd.DataFrame(
            {"source": b["source"].astype(str) + _PARITY_SEP + "0"}
        ),
        batch_format="pandas",
    )

    def _double(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"src": pd.Series([], dtype=object), "dst": pd.Series([], dtype=object)}
            )
        a = b["a"].astype(str)
        c = b["b"].astype(str)
        return pd.DataFrame(
            {
                "src": pd.concat(
                    [a + _PARITY_SEP + "0", a + _PARITY_SEP + "1",
                     c + _PARITY_SEP + "0", c + _PARITY_SEP + "1"],
                    ignore_index=True,
                ),
                "dst": pd.concat(
                    [c + _PARITY_SEP + "1", c + _PARITY_SEP + "0",
                     a + _PARITY_SEP + "1", a + _PARITY_SEP + "0"],
                    ignore_index=True,
                ),
            }
        )

    doubled = und.map_batches(_double, batch_format="pandas")
    states = multi_source_hops(
        doubled, roots, max_hops, directed=True, num_buckets=num_buckets
    )

    ent_schema = pa.schema(
        [
            ("component", pa.string()),
            ("entity", pa.string()),
            ("side", pa.int64()),
            ("conflict", pa.bool_()),
        ]
    )

    def _decode(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"component": pd.Series([], dtype=object),
                 "entity": pd.Series([], dtype=object),
                 "parity": pd.Series([], dtype="int64")}
            )
        src = b["source"].astype(str).str.split(_PARITY_SEP, n=1).str[0]
        ent = b["entity"].astype(str).str.rsplit(_PARITY_SEP, n=1)
        return pd.DataFrame(
            {
                "component": src,
                "entity": ent.str[0],
                "parity": ent.str[1].astype("int64"),
            }
        ).drop_duplicates()

    def _sides(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["component", "entity"], sort=False).agg(
            lo=("parity", "min"), hi=("parity", "max")
        ).reset_index()
        agg["conflict"] = agg["lo"] != agg["hi"]
        agg["side"] = agg["lo"].astype("int64")
        return agg[["component", "entity", "side", "conflict"]]

    per_entity = bucketed_reduce(
        states.map_batches(_decode, batch_format="pandas", batch_size=None),
        ["component", "entity"],
        _sides,
        ent_schema,
        num_buckets=num_buckets,
    ).materialize()

    flag_schema = pa.schema([("component", pa.string()), ("odd", pa.bool_())])

    def _flags(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("component", sort=False, as_index=False)["odd"].max()

    flags = bucketed_reduce(
        per_entity.map_batches(
            lambda b: pd.DataFrame(
                {"component": b["component"], "odd": b["conflict"]}
            ),
            batch_format="pandas",
        ),
        ["component"],
        _flags,
        flag_schema,
        combiner=_flags,
        num_buckets=num_buckets,
    ).materialize()

    def _finish(b: pd.DataFrame, odd_map) -> pd.DataFrame:
        odd = b["component"].map(odd_map).fillna(False).to_numpy(bool)
        return pd.DataFrame(
            {
                "entity": b["entity"],
                "component": b["component"],
                "side": np.where(odd, -1, b["side"].to_numpy(np.int64)),
                "is_bipartite": ~odd,
            }
        )

    if flags.count() <= flag_broadcast_max:
        fd = flags.to_pandas()
        odd_map = dict(zip(fd["component"], fd["odd"])) if len(fd) else {}
        ref = ray.put(odd_map)

        class _Apply:
            def __init__(self, r):
                self._m = ray.get(r)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                if len(b) == 0:
                    return pd.DataFrame(
                        {c: pd.Series([], dtype=object) for c in
                         ("entity", "component")} |
                        {"side": pd.Series([], dtype="int64"),
                         "is_bipartite": pd.Series([], dtype=bool)}
                    )
                return _finish(b, self._m)

        out = per_entity.map_batches(
            _Apply, fn_constructor_kwargs={"r": ref},
            batch_format="pandas", concurrency=(1, 8),
        )
    else:
        joined = cogroup_join(
            per_entity, flags, ["component"],
            num_buckets=num_buckets,
            left_schema=ent_schema, right_schema=flag_schema,
        )
        def _join_finish(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame(
                    {"entity": pd.Series([], dtype=object),
                     "component": pd.Series([], dtype=object),
                     "side": pd.Series([], dtype="int64"),
                     "is_bipartite": pd.Series([], dtype=bool)}
                )
            odd = b["odd"].to_numpy(bool)
            return pd.DataFrame(
                {
                    "entity": b["entity"],
                    "component": b["component"],
                    "side": np.where(odd, -1, b["side"].to_numpy(np.int64)),
                    "is_bipartite": ~odd,
                }
            )

        out = joined.map_batches(_join_finish, batch_format="pandas")

    from .infer import normalize_blocks

    return normalize_blocks(out, BIPARTITE_SCHEMA)


# ---------------------------------------------------------------------------
# Time-respecting (temporal) reachability — earliest arrival
# ---------------------------------------------------------------------------

TEMPORAL_EDGE_SCHEMA = pa.schema(
    [("src", pa.string()), ("dst", pa.string()), ("ts", pa.int64())]
)
TEMPORAL_ARRIVAL_SCHEMA = pa.schema(
    [("entity", pa.string()), ("arrival", pa.int64())]
)

_TS_INF = np.iinfo(np.int64).max


def temporal_reachability_local(
    edges: pd.DataFrame, seeds: list[str], start: int
) -> pd.DataFrame:
    """Driver twin: repeated time-ascending relaxation sweeps to the
    fixpoint. Sorting edges by ``ts`` makes ONE sweep correct for any
    strictly-increasing-time path; re-sweeping until no update also
    admits equal-timestamp chains (edge usable when ``ts >=
    arrival``), matching the recursive-CTE oracle's semantics."""
    arrival: dict[str, int] = {str(s): int(start) for s in sorted(set(seeds))}
    if len(edges) == 0:
        ents = sorted(arrival)
        return pd.DataFrame(
            {"entity": ents,
             "arrival": np.array([arrival[e] for e in ents], np.int64)}
        )
    e = edges.sort_values("ts", kind="stable")
    srcs = e["src"].astype(str).to_numpy(object)
    dsts = e["dst"].astype(str).to_numpy(object)
    ts = e["ts"].to_numpy(np.int64)
    changed = True
    while changed:
        changed = False
        for u, v, t in zip(srcs, dsts, ts):
            a = arrival.get(u)
            if a is not None and t >= a and t < arrival.get(v, _TS_INF):
                arrival[v] = int(t)
                changed = True
    ents = sorted(arrival)
    return pd.DataFrame(
        {"entity": ents,
         "arrival": np.array([arrival[e] for e in ents], np.int64)}
    )


def temporal_reachability(
    edges: ray.data.Dataset,
    seeds: list[str],
    *,
    start: int = 0,
    driver_max_edges: int = 2_000_000,
    max_rounds: int = 10_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Earliest-arrival reachability over a TEMPORAL graph: edge
    ``(src, dst, ts)`` is traversable only at time ``ts >= arrival(src)``
    (waiting at a node is free), and a reached node's ``arrival`` is the
    minimum such traversal time over all time-respecting paths from any
    seed (seeds start at ``start``). The contagion/provenance primitive:
    "what can a record-poisoning event at source S reach, respecting
    shipment order?" — plain BFS over the same edges overcounts because
    it ignores that influence cannot ride an edge into the past.

    COUNT-GATED per house policy: under ``driver_max_edges`` the edge
    list is collected and :func:`temporal_reachability_local` runs the
    time-sorted relaxation sweeps. Distributed path = parallel
    Bellman–Ford min-fixpoint: each round joins the improved frontier
    to edges on ``src`` (one bucketed cogroup join), keeps traversable
    hits (``ts >= arrival``), and min-folds candidates against the
    current arrival table (one bucketed reduce, map-side combiner);
    rounds stop when no node improves. Round count is bounded by the
    longest time-respecting chain, NOT the node count.

    Both int64 payloads (``ts``, ``arrival``) ride a cogroup join where
    one-sided columns upcast to float64 — exact below 2^53, i.e. any
    epoch-us timestamp before year ~2255 (see ``cogroup_join``'s
    carry-column warning); values are cast back to int64 on exit.
    """
    from .infer import bucketed_reduce, normalize_blocks, sanitize_for_join
    from .relational import cogroup_join

    e = sanitize_for_join(
        edges.select_columns(["src", "dst", "ts"]), TEMPORAL_EDGE_SCHEMA
    ).materialize()
    seeds = sorted({str(s) for s in seeds})

    if e.count() <= driver_max_edges:
        df = e.to_pandas()
        return ray.data.from_arrow(
            pa_from_pandas(
                temporal_reachability_local(df, seeds, start),
                TEMPORAL_ARRIVAL_SCHEMA,
            )
        )

    state_schema = pa.schema(
        [("entity", pa.string()), ("arrival", pa.int64()), ("is_old", pa.bool_())]
    )
    fold_schema = pa.schema(
        [("entity", pa.string()), ("arrival", pa.int64()), ("improved", pa.bool_())]
    )
    frontier_schema = pa.schema([("src", pa.string()), ("f_arr", pa.int64())])

    arrival = ray.data.from_arrow(
        pa.table(
            {
                "entity": pa.array(seeds, pa.string()),
                "arrival": pa.array([start] * len(seeds), pa.int64()),
            }
        )
    ).materialize()
    frontier = arrival

    def _cand(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"entity": pd.Series([], dtype=object),
                 "arrival": pd.Series([], dtype="int64"),
                 "is_old": pd.Series([], dtype=bool)}
            )
        ok = b["ts"].to_numpy() >= b["f_arr"].to_numpy()
        hit = b.loc[ok]
        return pd.DataFrame(
            {
                "entity": hit["dst"].to_numpy(object),
                "arrival": hit["ts"].to_numpy().astype(np.int64),
                "is_old": np.zeros(len(hit), bool),
            }
        )

    def _tag_old(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["entity", "arrival"]].copy()
        out["is_old"] = True
        return out

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        return b.groupby(["entity", "is_old"], sort=False, as_index=False)[
            "arrival"
        ].min()[["entity", "arrival", "is_old"]]

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("entity", sort=False)["arrival"].min()
        old = g.loc[g["is_old"]].groupby("entity", sort=False)["arrival"].min()
        old = old.reindex(new.index)
        improved = old.isna().to_numpy() | (
            new.to_numpy() < old.fillna(_TS_INF).to_numpy()
        )
        return pd.DataFrame(
            {
                "entity": new.index.to_numpy(object),
                "arrival": new.to_numpy(np.int64),
                "improved": improved,
            }
        )

    def _drop_flag(b: pd.DataFrame) -> pd.DataFrame:
        return b[["entity", "arrival"]]

    for _ in range(max_rounds):
        f_side = normalize_blocks(
            frontier.map_batches(
                lambda b: pd.DataFrame(
                    {"src": b["entity"].to_numpy(object),
                     "f_arr": b["arrival"].to_numpy(np.int64)}
                ) if len(b) else pd.DataFrame(
                    {"src": pd.Series([], dtype=object),
                     "f_arr": pd.Series([], dtype="int64")}
                ),
                batch_format="pandas",
            ),
            frontier_schema,
        )
        hit = cogroup_join(
            e,
            f_side,
            on=["src"],
            num_buckets=num_buckets,
            left_schema=TEMPORAL_EDGE_SCHEMA,
            right_schema=frontier_schema,
        )
        folded = bucketed_reduce(
            hit.map_batches(_cand, batch_format="pandas").union(
                arrival.map_batches(_tag_old, batch_format="pandas")
            ),
            ["entity"],
            _fold,
            fold_schema,
            combiner=_pre,
            num_buckets=num_buckets,
        ).materialize()
        frontier = folded.map_batches(
            lambda b: b.loc[b["improved"], ["entity", "arrival"]]
            if len(b)
            else pd.DataFrame(
                {"entity": pd.Series([], dtype=object),
                 "arrival": pd.Series([], dtype="int64")}
            ),
            batch_format="pandas",
        ).materialize()
        arrival = normalize_blocks(
            folded.map_batches(_drop_flag, batch_format="pandas"),
            TEMPORAL_ARRIVAL_SCHEMA,
        ).materialize()
        if frontier.count() == 0:
            return arrival
    raise RuntimeError(
        f"temporal_reachability: no fixpoint after {max_rounds} rounds"
    )


# ---------------------------------------------------------------------------
# Degree-assortativity mixing sums
# ---------------------------------------------------------------------------

MIXING_SCHEMA = pa.schema(
    [
        ("m", pa.int64()),
        ("s_sum", pa.int64()),
        ("s_prod", pa.int64()),
        ("s_sq", pa.int64()),
    ]
)

_MIX_GUARD = 1 << 62


def degree_mixing_sums(
    edges: ray.data.Dataset,
    *,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact integer sufficient statistics of degree-degree mixing over
    the simple undirected graph: one row ``(m, s_sum, s_prod, s_sq)``
    where, over the ``m`` distinct edges with endpoint degrees
    ``(du, dv)``: ``s_sum = sum(du+dv)``, ``s_prod = sum(du*dv)``,
    ``s_sq = sum(du^2+dv^2)``. The Newman degree-assortativity
    coefficient is the pure-rational function
    ``r = (4*m*s_prod - s_sum^2) / (2*m*s_sq - s_sum^2)`` — left to the
    caller so the emitted row stays exact-integer and hash-matches the
    SQL twin (a float r never would).

    Shape: one endpoint-keyed count (degrees), one bucketed degree
    join, one pair-keyed reduce whose residue is ONE partial-sums row
    per bucket — the driver folds <= num_buckets rows with Python-int
    (unbounded) arithmetic and raises loudly if a final sum exceeds
    int64 rather than wrapping.
    """
    from .infer import bucketed_reduce
    from .relational import cogroup_join

    und = undirected_simple_edges(edges, num_buckets=num_buckets).materialize()

    deg_schema = pa.schema([("node", pa.string()), ("deg", pa.int64())])
    ends_schema = pa.schema([("node", pa.string()), ("n", pa.int64())])

    def _ends(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64")}
            )
        vc = pd.concat(
            [b["a"].astype(str), b["b"].astype(str)], ignore_index=True
        ).value_counts(sort=False)
        return pd.DataFrame(
            {"node": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)}
        )

    deg = bucketed_reduce(
        und,
        ["node"],
        lambda g: g.groupby("node", sort=False, as_index=False)
        .agg(n=("n", "sum"))
        .rename(columns={"n": "deg"}),
        deg_schema,
        combiner=_ends,
        num_buckets=num_buckets,
    )

    side_schema = pa.schema(
        [("node", pa.string()), ("pairkey", pa.string()), ("pos", pa.int64())]
    )

    def _sides(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=object),
                 "pairkey": pd.Series([], dtype=object),
                 "pos": pd.Series([], dtype="int64")}
            )
        a = b["a"].astype(str)
        c = b["b"].astype(str)
        key = (a + "\x01" + c).to_numpy(object)
        return pd.DataFrame(
            {
                "node": np.concatenate([a.to_numpy(object), c.to_numpy(object)]),
                "pairkey": np.concatenate([key, key]),
                "pos": np.concatenate(
                    [np.zeros(len(b), np.int64), np.ones(len(b), np.int64)]
                ),
            }
        )

    joined = cogroup_join(
        und.map_batches(_sides, batch_format="pandas"),
        deg,
        ["node"],
        num_buckets=num_buckets,
        left_schema=side_schema,
        right_schema=deg_schema,
    )

    def _partial(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["pairkey", "pos"], kind="stable")
        d0 = s.loc[s["pos"] == 0, "deg"].to_numpy(np.int64)
        d1 = s.loc[s["pos"] == 1, "deg"].to_numpy(np.int64)
        if len(d0) != len(d1):  # join dropped an endpoint — impossible
            raise RuntimeError("degree_mixing_sums: unpaired edge endpoint")
        m = len(d0)
        if m and int(d0.max()) * int(d1.max()) * m >= _MIX_GUARD:
            # exact fallback: Python ints, no wraparound
            s_sum = int(sum(int(x) + int(y) for x, y in zip(d0, d1)))
            s_prod = int(sum(int(x) * int(y) for x, y in zip(d0, d1)))
            s_sq = int(sum(int(x) ** 2 + int(y) ** 2 for x, y in zip(d0, d1)))
        else:
            s_sum = int((d0 + d1).sum())
            s_prod = int((d0 * d1).sum())
            s_sq = int((d0 * d0 + d1 * d1).sum())
        for v in (s_sum, s_prod, s_sq):
            if v >= _MIX_GUARD:
                raise OverflowError(
                    "degree_mixing_sums: bucket partial exceeds int64 guard"
                )
        return pd.DataFrame(
            {"m": [m], "s_sum": [s_sum], "s_prod": [s_prod], "s_sq": [s_sq]}
        )

    partials = bucketed_reduce(
        joined.map_batches(
            lambda b: b[["pairkey", "pos", "deg"]], batch_format="pandas"
        ),
        ["pairkey"],
        _partial,
        MIXING_SCHEMA,
        num_buckets=num_buckets,
    ).to_pandas()  # bounded: one row per bucket

    tot = {c: 0 for c in ("m", "s_sum", "s_prod", "s_sq")}
    for c in tot:
        if len(partials) and c in partials.columns:
            tot[c] = int(sum(int(x) for x in partials[c]))
        if tot[c] >= (1 << 63):
            raise OverflowError(f"degree_mixing_sums: {c} exceeds int64")
    out = pd.DataFrame({c: [tot[c]] for c in tot})
    return ray.data.from_arrow(
        pa.Table.from_pandas(out.astype("int64"), schema=MIXING_SCHEMA,
                             preserve_index=False)
    )


RICH_CLUB_SCHEMA = pa.schema(
    [("k", pa.int64()), ("n_nodes", pa.int64()), ("n_edges", pa.int64())]
)


def rich_club_counts(
    edges: ray.data.Dataset,
    ks: list[int],
    *,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Rich-club sufficient statistics: for each degree threshold ``k``
    one exact row ``(k, n_nodes, n_edges)`` — the number of nodes with
    degree > k and the number of distinct edges BOTH of whose endpoints
    exceed it. The rich-club coefficient is the caller-side rational
    ``phi(k) = 2*n_edges / (n_nodes*(n_nodes-1))`` (kept out so the row
    stays exact-integer and hash-matches the SQL twin).

    One degree count + one bucketed degree join + one pair-keyed fold:
    every threshold shares the SAME joined pass (thresholds are applied
    vectorized inside the reduce), so ``len(ks)`` costs no extra
    shuffles; residue = ``len(ks)`` rows per bucket plus a
    ``len(ks)``-row node-side residue."""
    from .infer import bucketed_reduce
    from .relational import cogroup_join

    ks = sorted(set(int(k) for k in ks))
    karr = np.array(ks, np.int64)
    und = undirected_simple_edges(edges, num_buckets=num_buckets).materialize()

    deg_schema = pa.schema([("node", pa.string()), ("deg", pa.int64())])

    def _ends(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=object),
                 "deg": pd.Series([], dtype="int64")}
            )
        vc = pd.concat(
            [b["a"].astype(str), b["b"].astype(str)], ignore_index=True
        ).value_counts(sort=False)
        return pd.DataFrame(
            {"node": vc.index.to_numpy(object), "deg": vc.to_numpy(np.int64)}
        )

    deg = bucketed_reduce(
        und,
        ["node"],
        lambda g: g.groupby("node", sort=False, as_index=False).agg(
            deg=("deg", "sum")
        ),
        deg_schema,
        combiner=_ends,
        num_buckets=num_buckets,
    ).materialize()

    part_schema = pa.schema([("k", pa.int64()), ("n", pa.int64())])

    def _node_part(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"k": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        d = b["deg"].to_numpy(np.int64)
        return pd.DataFrame(
            {"k": karr, "n": (d[None, :] > karr[:, None]).sum(axis=1)}
        )

    node_parts = deg.map_batches(
        _node_part, batch_format="pandas", batch_size=None
    ).to_pandas()  # bounded: len(ks) rows per block
    n_nodes = (
        node_parts.groupby("k")["n"].sum() if len(node_parts) else pd.Series(dtype="int64")
    )

    side_schema = pa.schema(
        [("node", pa.string()), ("pairkey", pa.string())]
    )

    def _sides(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=object),
                 "pairkey": pd.Series([], dtype=object)}
            )
        a = b["a"].astype(str)
        c = b["b"].astype(str)
        key = (a + "\x01" + c).to_numpy(object)
        return pd.DataFrame(
            {
                "node": np.concatenate([a.to_numpy(object), c.to_numpy(object)]),
                "pairkey": np.concatenate([key, key]),
            }
        )

    joined = cogroup_join(
        und.map_batches(_sides, batch_format="pandas"),
        deg,
        ["node"],
        num_buckets=num_buckets,
        left_schema=side_schema,
        right_schema=deg_schema,
    )

    def _edge_part(g: pd.DataFrame) -> pd.DataFrame:
        mind = g.groupby("pairkey", sort=False)["deg"].min().to_numpy(np.int64)
        return pd.DataFrame(
            {"k": karr, "n": (mind[None, :] > karr[:, None]).sum(axis=1)}
        )

    edge_parts = bucketed_reduce(
        joined.map_batches(
            lambda b: b[["pairkey", "deg"]], batch_format="pandas"
        ),
        ["pairkey"],
        _edge_part,
        part_schema,
        num_buckets=num_buckets,
    ).to_pandas()  # bounded: len(ks) rows per bucket
    n_edges = (
        edge_parts.groupby("k")["n"].sum() if len(edge_parts) else pd.Series(dtype="int64")
    )

    out = pd.DataFrame(
        {
            "k": karr,
            "n_nodes": [int(n_nodes.get(k, 0)) for k in ks],
            "n_edges": [int(n_edges.get(k, 0)) for k in ks],
        }
    )
    return ray.data.from_arrow(
        pa.Table.from_pandas(out.astype("int64"), schema=RICH_CLUB_SCHEMA,
                             preserve_index=False)
    )


# ---------------------------------------------------------------------------
# Threshold-sweep connected components (single-linkage dendrogram levels)
# ---------------------------------------------------------------------------

THRESH_COMP_SCHEMA = pa.schema(
    [("tau", pa.int64()), ("n_nodes", pa.int64()), ("n_components", pa.int64())]
)


def threshold_components(
    edges: ray.data.Dataset,
    taus: list[int],
    *,
    weight_col: str = "w",
    driver_max_edges: int = 2_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Component counts of the weighted graph at several weight
    thresholds in ONE call: for each ``tau`` a row ``(tau, n_nodes,
    n_components)`` counting components of the subgraph that keeps
    edges with summed weight >= tau, where nodes of the FULL graph
    whose every incident edge was dropped count as singletons —
    ``n_nodes`` is constant across rows and ``n_components`` is
    monotone non-decreasing in ``tau``. These are single-linkage
    dendrogram levels: the sensitivity curve behind "how many dup
    clusters survive at similarity >= 0.7 / 0.8 / 0.9" before anyone
    commits to a dedup threshold.

    COUNT-GATED per house policy: under ``driver_max_edges`` the
    deduped weighted edge list is collected and ONE descending-weight
    incremental union-find serves every threshold (each successful
    union lowers the running component count by exactly 1, so
    snapshots are free). Distributed path: per tau, a map-only weight
    filter feeds :func:`weak_components` (which re-gates itself on the
    FILTERED size) and two bounded counts — cost is |taus| component
    runs, stated rather than hidden.
    """
    from .infer import bucketed_reduce

    taus = sorted(set(int(t) for t in taus))
    wund_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("w", pa.int64())]
    )

    def _canon(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object),
                 "b": pd.Series([], dtype=object),
                 "w": pd.Series([], dtype="int64")}
            )
        s = b["src"].astype(str)
        d = b["dst"].astype(str)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s.to_numpy(object), d.to_numpy(object))
        hi = np.maximum(s.to_numpy(object), d.to_numpy(object))
        return (
            pd.DataFrame({"a": lo, "b": hi,
                          "w": b.loc[keep, weight_col].to_numpy(np.int64)})
            .groupby(["a", "b"], sort=False, as_index=False)["w"].sum()
        )

    wund = bucketed_reduce(
        edges.select_columns(["src", "dst", weight_col]),
        ["a", "b"],
        lambda g: g.groupby(["a", "b"], sort=False, as_index=False)["w"].sum(),
        wund_schema,
        combiner=_canon,
        num_buckets=num_buckets,
    ).materialize()

    if wund.count() <= driver_max_edges:
        df = wund.to_pandas()
        if df.empty or "a" not in df.columns:
            return ray.data.from_arrow(THRESH_COMP_SCHEMA.empty_table())
        nodes = sorted(set(df["a"]) | set(df["b"]))
        idx = {n: i for i, n in enumerate(nodes)}
        parent = list(range(len(nodes)))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        n_comp = len(nodes)
        df = df.sort_values("w", ascending=False, kind="stable")
        ws = df["w"].to_numpy(np.int64)
        aa = df["a"].to_numpy(object)
        bb = df["b"].to_numpy(object)
        out_rows = []
        i = 0
        for tau in sorted(taus, reverse=True):
            while i < len(ws) and ws[i] >= tau:
                ra, rb = find(idx[aa[i]]), find(idx[bb[i]])
                if ra != rb:
                    parent[ra] = rb
                    n_comp -= 1
                i += 1
            out_rows.append((tau, len(nodes), n_comp))
        out = pd.DataFrame(
            sorted(out_rows), columns=["tau", "n_nodes", "n_components"]
        )
        return ray.data.from_arrow(
            pa.Table.from_pandas(out.astype("int64"),
                                 schema=THRESH_COMP_SCHEMA,
                                 preserve_index=False)
        )

    node_schema = pa.schema([("node", pa.string())])

    def _node_rows(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype=object)})
        return pd.DataFrame(
            {"node": np.concatenate(
                [b["a"].to_numpy(object), b["b"].to_numpy(object)]
            )}
        ).drop_duplicates()

    n_nodes = bucketed_reduce(
        wund,
        ["node"],
        lambda g: g.drop_duplicates("node"),
        node_schema,
        combiner=_node_rows,
        num_buckets=num_buckets,
    ).count()

    comp_schema = pa.schema([("component", pa.string())])
    rows = []
    for tau in taus:
        kept = wund.map_batches(
            lambda b, t=tau: pd.DataFrame(
                {"subject": b.loc[b["w"] >= t, "a"].to_numpy(object),
                 "object": b.loc[b["w"] >= t, "b"].to_numpy(object)}
            ),
            batch_format="pandas",
        )
        cc = weak_components(
            kept, driver_max_edges=driver_max_edges, num_buckets=num_buckets
        ).materialize()
        touched = cc.count()
        n_comp_touched = bucketed_reduce(
            cc.select_columns(["component"]),
            ["component"],
            lambda g: g.drop_duplicates("component"),
            comp_schema,
            combiner=lambda b: b.drop_duplicates("component"),
            num_buckets=num_buckets,
        ).count()
        rows.append((tau, n_nodes, n_comp_touched + (n_nodes - touched)))

    out = pd.DataFrame(rows, columns=["tau", "n_nodes", "n_components"])
    return ray.data.from_arrow(
        pa.Table.from_pandas(out.astype("int64"), schema=THRESH_COMP_SCHEMA,
                             preserve_index=False)
    )


# ---------------------------------------------------------------------------
# Double-sweep eccentricity / diameter lower bound
# ---------------------------------------------------------------------------

DOUBLE_SWEEP_SCHEMA = pa.schema(
    [
        ("start", pa.string()),
        ("far1", pa.string()),
        ("ecc1", pa.int64()),
        ("far2", pa.string()),
        ("ecc2", pa.int64()),
    ]
)


def double_sweep_local(
    und: pd.DataFrame, max_hops: int
) -> pd.DataFrame:
    """Driver twin: two plain BFS sweeps over the collected edge list,
    same (hop desc, entity asc) argmax tie-break as the distributed
    path and the SQL twin."""
    from collections import deque

    adj: dict[str, list[str]] = {}
    for a, b in zip(und["a"].astype(str), und["b"].astype(str)):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)

    def _bfs_far(src: str) -> tuple[str, int]:
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        # tie-break: hop desc, entity ASC
        best_h = max(dist.values())
        cands = sorted(e for e, h in dist.items() if h == best_h)
        return cands[0], best_h

    start = min(adj)
    far1, ecc1 = _bfs_far(start)
    far2, ecc2 = _bfs_far(far1)
    return pd.DataFrame(
        [{"start": start, "far1": far1, "ecc1": ecc1,
          "far2": far2, "ecc2": ecc2}]
    )


def double_sweep_bounds(
    edges: ray.data.Dataset,
    *,
    max_hops: int = 20,
    driver_max_edges: int = 2_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Double-sweep diameter lower bound (Magnien, Latapy & Habib
    2009): BFS from the min-id node to its farthest reachable node
    ``far1`` (distance ``ecc1``), then BFS from ``far1`` to ``far2``
    (distance ``ecc2``). ``ecc2 <= diameter`` always, and on many real
    graphs the bound is tight. Distances are HORIZON-BOUNDED at
    ``max_hops`` (the SQL twin carries the same bound, so semantics
    match even on graphs wider than the horizon). Argmax ties break
    (hop desc, entity asc). One row out; empty input -> empty table.

    COUNT-GATED per house policy (:func:`double_sweep_local` under
    ``driver_max_edges``); the distributed path rides the shared
    multi-source BFS twice — two frontier loops, no new shuffle
    shapes — and is pinned bit-equal by the forced-gate test."""
    und = undirected_simple_edges(edges, num_buckets=num_buckets).materialize()
    if und.count() == 0:
        return ray.data.from_arrow(DOUBLE_SWEEP_SCHEMA.empty_table())

    if und.count() <= driver_max_edges:
        out = double_sweep_local(und.to_pandas(), max_hops)
        return ray.data.from_arrow(
            pa.Table.from_pandas(out, schema=DOUBLE_SWEEP_SCHEMA,
                                 preserve_index=False)
        )

    und_sd = und.map_batches(
        lambda b: pa.table(
            {
                "src": b["a"].combine_chunks().cast(pa.string()),
                "dst": b["b"].combine_chunks().cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def _block_min(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype=object)})
        return pd.DataFrame(
            {"node": [min(b["src"].astype(str).min(), b["dst"].astype(str).min())]}
        )

    mins = und_sd.map_batches(
        _block_min, batch_format="pandas", batch_size=None
    ).to_pandas()  # bounded: one row per block
    start = str(mins["node"].min())

    def _farthest(source: str) -> tuple[str, int]:
        visited = multi_source_hops(
            und_sd, [source], max_hops, directed=False, num_buckets=num_buckets
        )

        def _top(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame(
                    {"entity": pd.Series([], dtype=object),
                     "hop": pd.Series([], dtype="int64")}
                )
            i = b.sort_values(
                ["hop", "entity"], ascending=[False, True], kind="stable"
            ).index[0]
            return b.loc[[i], ["entity", "hop"]]

        cands = visited.map_batches(
            _top, batch_format="pandas", batch_size=None
        ).to_pandas()  # bounded: one row per block
        best = cands.sort_values(
            ["hop", "entity"], ascending=[False, True], kind="stable"
        ).iloc[0]
        return str(best["entity"]), int(best["hop"])

    far1, ecc1 = _farthest(start)
    far2, ecc2 = _farthest(far1)
    out = pd.DataFrame(
        [{"start": start, "far1": far1, "ecc1": ecc1,
          "far2": far2, "ecc2": ecc2}]
    )
    return ray.data.from_arrow(
        pa.Table.from_pandas(out, schema=DOUBLE_SWEEP_SCHEMA,
                             preserve_index=False)
    )


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (bounded-cost Bellman-Ford)
# ---------------------------------------------------------------------------

SSSP_SCHEMA = pa.schema([("entity", pa.string()), ("dist", pa.int64())])


def weighted_sssp_local(
    edges: pd.DataFrame, seeds: list[str], dist_limit: int
) -> pd.DataFrame:
    """Driver twin: Dijkstra with non-negative int weights, pruned at
    ``dist_limit`` — exact match for the distributed min-fixpoint and
    the bounded recursive-CTE oracle."""
    import heapq

    adj: dict[str, list[tuple[str, int]]] = {}
    for u, v, w in zip(
        edges["src"].astype(str), edges["dst"].astype(str),
        edges["w"].astype(int),
    ):
        adj.setdefault(u, []).append((v, int(w)))
    dist: dict[str, int] = {}
    heap = [(0, s) for s in sorted(set(str(s) for s in seeds))]
    for _, s in heap:
        dist[s] = 0
    heapq.heapify(heap)
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, d):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd <= dist_limit and nd < dist.get(v, dist_limit + 1):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    ents = sorted(dist)
    return pd.DataFrame(
        {"entity": ents, "dist": np.array([dist[e] for e in ents], np.int64)}
    )


def weighted_sssp(
    edges: ray.data.Dataset,
    seeds: list[str],
    *,
    dist_limit: int,
    driver_max_edges: int = 2_000_000,
    max_rounds: int = 10_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Multi-seed weighted shortest paths over directed edges
    ``(src, dst, w)`` with non-negative integer weights, BOUNDED at
    ``dist_limit`` (nodes farther than the budget are absent — the
    bound is what keeps the recursive SQL oracle's state space finite,
    and "everything within cost B" is the operative question for
    neighborhood joins anyway). Multigraph edges need no dedup: the
    min-fixpoint sees every parallel edge and keeps the cheapest.

    COUNT-GATED per house policy (:func:`weighted_sssp_local` Dijkstra
    under ``driver_max_edges``). Distributed path = the same parallel
    relaxation shape as :func:`temporal_reachability`: per round ONE
    bucketed frontier-x-edges cogroup join (candidates ``dist + w``,
    pruned at the budget) + ONE min-fold bucketed reduce with map-side
    combiner; rounds are bounded by the longest shortest path's edge
    count, and only improved nodes re-enter the frontier."""
    from .infer import bucketed_reduce, normalize_blocks, sanitize_for_join
    from .relational import cogroup_join

    edge_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("w", pa.int64())]
    )
    e = sanitize_for_join(
        edges.select_columns(["src", "dst", "w"]), edge_schema
    ).materialize()
    seeds = sorted({str(s) for s in seeds})

    if e.count() <= driver_max_edges:
        return ray.data.from_arrow(
            pa_from_pandas(
                weighted_sssp_local(e.to_pandas(), seeds, dist_limit),
                SSSP_SCHEMA,
            )
        )

    fold_schema = pa.schema(
        [("entity", pa.string()), ("dist", pa.int64()), ("improved", pa.bool_())]
    )
    frontier_schema = pa.schema([("src", pa.string()), ("f_dist", pa.int64())])
    state_cols = {"entity": object, "dist": "int64", "is_old": bool}

    dist = ray.data.from_arrow(
        pa.table(
            {
                "entity": pa.array(seeds, pa.string()),
                "dist": pa.array([0] * len(seeds), pa.int64()),
            }
        )
    ).materialize()
    frontier = dist

    def _empty_state() -> pd.DataFrame:
        return pd.DataFrame(
            {c: pd.Series([], dtype=t) for c, t in state_cols.items()}
        )

    def _cand(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return _empty_state()
        nd = b["w"].to_numpy().astype(np.int64) + b["f_dist"].to_numpy().astype(
            np.int64
        )
        ok = nd <= dist_limit
        hit = b.loc[ok]
        return pd.DataFrame(
            {
                "entity": hit["dst"].to_numpy(object),
                "dist": nd[ok],
                "is_old": np.zeros(int(ok.sum()), bool),
            }
        )

    def _tag_old(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["entity", "dist"]].copy()
        out["is_old"] = True
        return out

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        return b.groupby(["entity", "is_old"], sort=False, as_index=False)[
            "dist"
        ].min()[["entity", "dist", "is_old"]]

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("entity", sort=False)["dist"].min()
        old = g.loc[g["is_old"]].groupby("entity", sort=False)["dist"].min()
        old = old.reindex(new.index)
        improved = old.isna().to_numpy() | (
            new.to_numpy() < old.fillna(np.iinfo(np.int64).max).to_numpy()
        )
        return pd.DataFrame(
            {
                "entity": new.index.to_numpy(object),
                "dist": new.to_numpy(np.int64),
                "improved": improved,
            }
        )

    for _ in range(max_rounds):
        f_side = normalize_blocks(
            frontier.map_batches(
                lambda b: pd.DataFrame(
                    {"src": b["entity"].to_numpy(object),
                     "f_dist": b["dist"].to_numpy(np.int64)}
                ) if len(b) else pd.DataFrame(
                    {"src": pd.Series([], dtype=object),
                     "f_dist": pd.Series([], dtype="int64")}
                ),
                batch_format="pandas",
            ),
            frontier_schema,
        )
        hit = cogroup_join(
            e, f_side, on=["src"], num_buckets=num_buckets,
            left_schema=edge_schema, right_schema=frontier_schema,
        )
        folded = bucketed_reduce(
            hit.map_batches(_cand, batch_format="pandas").union(
                dist.map_batches(_tag_old, batch_format="pandas")
            ),
            ["entity"],
            _fold,
            fold_schema,
            combiner=_pre,
            num_buckets=num_buckets,
        ).materialize()
        frontier = folded.map_batches(
            lambda b: b.loc[b["improved"], ["entity", "dist"]]
            if len(b)
            else pd.DataFrame(
                {"entity": pd.Series([], dtype=object),
                 "dist": pd.Series([], dtype="int64")}
            ),
            batch_format="pandas",
        ).materialize()
        dist = normalize_blocks(
            folded.map_batches(
                lambda b: b[["entity", "dist"]], batch_format="pandas"
            ),
            SSSP_SCHEMA,
        ).materialize()
        if frontier.count() == 0:
            return dist
    raise RuntimeError(f"weighted_sssp: no fixpoint after {max_rounds} rounds")


KATZ_SCHEMA = pa.schema([("node", pa.string()), ("katz_scaled", pa.int64())])


def katz_int_local(
    edge_list: list[tuple[str, str]],
    *,
    iters: int = 4,
    scale: int = 10**9,
    a_num: int = 1,
    a_den: int = 10,
) -> dict[str, int]:
    """Pure-Python reference of the integer Katz recurrence — the
    gate-path twin and the oracle-SQL generator's contract.

    ``x_0(v) = scale`` (the beta term), then per iteration

        x_{t+1}(v) = scale + a_num * S_v // a_den

    where ``S_v`` is the integer sum of ``x_t(u)`` over in-edges
    ``(u, v)`` (parallel edges count with multiplicity). All-integer,
    so sums commute and the result is bit-exact across engines and
    block layouts — the same trick as :func:`pagerank_int` (float Katz
    can never hash-match a SQL oracle).
    """
    nodes: set[str] = set()
    for s, d in edge_list:
        nodes.add(s)
        nodes.add(d)
    x = {v: scale for v in nodes}
    for _ in range(iters):
        s_v = {v: 0 for v in nodes}
        for s, d in edge_list:
            s_v[d] += x[s]
        x = {v: scale + a_num * s_v[v] // a_den for v in nodes}
    return x


def katz_int(
    edges: ray.data.Dataset,
    *,
    iters: int = 4,
    scale: int = 10**9,
    a_num: int = 1,
    a_den: int = 10,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """``(node, katz_scaled)`` after ``iters`` integer Katz steps.

    Katz centrality upgrades the reference's degree-only importance
    signal (`visualization.py:170-178` blends centralities driver-side
    on an in-memory networkx graph — impossible at web scale) with
    attenuated path counting: unlike PageRank there is no out-degree
    normalization, so a hub's mass is credited in full along every
    out-edge.

    COUNT-GATED like every residue collect in this repo: under
    ``driver_max_edges`` the bit-identical local twin runs on the
    collected edge list; over it nothing is collected and each
    iteration is ONE bucketed join (edges x state on src) plus ONE
    combined grouped sum (dst) — simpler than PageRank because there
    is no contribution division and no dangling-mass pass. Both paths
    produce identical integers (pinned by test).

    Caller owns overflow headroom: ``S_v <= max_indeg * max_rank`` must
    stay below 2**63; with the default ``a_num/a_den = 1/10`` ranks
    stay O(scale * indeg / (a_den - growth)) for graphs whose spectral
    radius is under ``a_den / a_num``.
    """
    node_schema = pa.schema([("node", pa.string())])
    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.count() <= driver_max_edges:
        df = edges.to_pandas()
        if df.empty or "src" not in df.columns:  # empty loses its schema
            return ray.data.from_arrow(KATZ_SCHEMA.empty_table())
        r = katz_int_local(
            list(zip(df["src"], df["dst"])),
            iters=iters, scale=scale, a_num=a_num, a_den=a_den,
        )
        ks = sorted(r)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(ks, pa.string()),
                    "katz_scaled": pa.array([r[k] for k in ks], pa.int64()),
                }
            )
        )

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates("node")

    def _as_node(col: str):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table({"node": b[col].combine_chunks().cast(pa.string())})

        return _f

    both = edges.map_batches(_as_node("src"), batch_format="pyarrow").union(
        edges.map_batches(_as_node("dst"), batch_format="pyarrow")
    )
    nodes = sanitize_for_join(
        bucketed_reduce(both, ["node"], _dd, node_schema, combiner=_dd,
                        num_buckets=num_buckets),
        node_schema,
    ).materialize()
    if nodes.count() == 0:
        return ray.data.from_arrow(KATZ_SCHEMA.empty_table())

    state = sanitize_for_join(
        nodes.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"].combine_chunks().cast(pa.string()),
                    "katz_scaled": pa.array([scale] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        KATZ_SCHEMA,
    ).materialize()

    edges_s = sanitize_for_join(edges, EDGE_SCHEMA)
    contrib_schema = pa.schema([("src", pa.string()), ("contrib", pa.int64())])

    for _ in range(iters):
        contrib = sanitize_for_join(
            state.map_batches(
                lambda b: pa.table(
                    {
                        "src": b["node"].combine_chunks().cast(pa.string()),
                        "contrib": b["katz_scaled"].combine_chunks().cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            contrib_schema,
        )
        edge_contrib = cogroup_join(
            edges_s, contrib, on=["src"],
            num_buckets=num_buckets,
            left_schema=EDGE_SCHEMA, right_schema=contrib_schema,
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["dst"].combine_chunks().cast(pa.string()),
                    "s_v": b["contrib"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        # Carrier rows keep in-linkless nodes in the same grouped sum.
        carrier = state.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"].combine_chunks().cast(pa.string()),
                    "s_v": pa.array([0] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        state = sanitize_for_join(
            grouped_sums(edge_contrib.union(carrier), ["node"], {"s_v": "s_v"})
            .map_batches(
                lambda b: pd.DataFrame(
                    {
                        "node": b["node"],
                        "katz_scaled": scale
                        + a_num * b["s_v"].astype("int64") // a_den,
                    }
                ),
                batch_format="pandas",
            ),
            KATZ_SCHEMA,
        ).materialize()

    return state


ROLLUP_SCHEMA = pa.schema([("node", pa.int64()), ("subtree_value", pa.int64())])
_ANC_SCHEMA = pa.schema([("node", pa.int64()), ("anc", pa.int64())])


def tree_rollup_local(
    values: dict[int, int], parents: dict[int, int]
) -> dict[int, int]:
    """Pure-Python twin: subtree sums over a parent forest (iterative —
    no recursion limit). Nodes appearing only in ``parents`` carry
    value 0."""
    out = {n: 0 for n in values} | {
        n: 0 for e in parents.items() for n in e if n not in values
    }
    for n, v in values.items():
        out[n] = out.get(n, 0) + v
        a = parents.get(n)
        seen = 0
        while a is not None:
            out[a] = out.get(a, 0) + v
            a = parents.get(a)
            seen += 1
            if seen > len(parents) + 1:
                raise ValueError("tree_rollup: parent cycle detected")
    return out


def tree_rollup(
    values: ray.data.Dataset,
    parent_edges: ray.data.Dataset,
    *,
    max_depth: int = 64,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """Hierarchical subtree aggregation over a parent FOREST — the
    category/taxonomy/bill-of-materials rollup: for every node, the
    sum of ``value`` over its subtree (descendants + self).

    ``values``: ``(node: int64, value: int64)``; ``parent_edges``:
    ``(child: int64, parent: int64)`` with at most one parent per
    child and no cycles (a cycle raises after ``max_depth`` doubling
    rounds instead of looping).

    Distributed plan: the ancestor closure is built by POINTER
    DOUBLING — each round self-joins the current (node, anc) set with
    itself (``anc`` meets ``node``), so paths of length ≤ 2^t exist
    after t rounds: ceil(log2(depth)) bucketed join+dedup rounds, not
    depth. Contributions = closure ⋈ values unioned with the self
    rows, folded by one grouped sum. PARTITIONING ASSUMPTION: the
    closure materializes O(nodes × depth) rows — built for the
    bounded-depth hierarchies this operator is for (taxonomies, BOMs:
    depth ≤ ~20), not for path-graph chains. Count-gated under
    ``driver_max_edges``: the iterative local twin runs on the
    collected forest (bit-identical, pinned by test).
    """
    values = values.select_columns(["node", "value"]).materialize()
    parent_edges = parent_edges.select_columns(["child", "parent"]).materialize()

    if parent_edges.count() <= driver_max_edges and values.count() <= driver_max_edges:
        vdf = values.to_pandas()
        edf = parent_edges.to_pandas()
        vals = (
            dict(zip(vdf["node"].astype(int), vdf["value"].astype(int)))
            if len(vdf)
            else {}
        )
        pars = (
            dict(zip(edf["child"].astype(int), edf["parent"].astype(int)))
            if len(edf)
            else {}
        )
        r = tree_rollup_local(vals, pars)
        ks = sorted(r)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(ks, pa.int64()),
                    "subtree_value": pa.array([r[k] for k in ks], pa.int64()),
                }
            )
        )

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["node", "anc"])

    closure = sanitize_for_join(
        parent_edges.map_batches(
            lambda b: pa.table(
                {
                    "node": b["child"].combine_chunks().cast(pa.int64()),
                    "anc": b["parent"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        _ANC_SCHEMA,
    ).materialize()
    n_prev = closure.count()
    if n_prev:
        hop_schema = pa.schema([("anc", pa.int64()), ("anc2", pa.int64())])
        for _ in range(max_depth):
            hop = sanitize_for_join(
                closure.map_batches(
                    lambda b: pa.table(
                        {
                            "anc": b["node"].combine_chunks().cast(pa.int64()),
                            "anc2": b["anc"].combine_chunks().cast(pa.int64()),
                        }
                    ),
                    batch_format="pyarrow",
                ),
                hop_schema,
            )
            doubled = cogroup_join(
                closure, hop, on=["anc"],
                num_buckets=num_buckets,
                left_schema=_ANC_SCHEMA, right_schema=hop_schema,
            ).map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"].combine_chunks().cast(pa.int64()),
                        "anc": b["anc2"].combine_chunks().cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            closure = sanitize_for_join(
                bucketed_reduce(
                    closure.union(doubled), ["node", "anc"], _dd, _ANC_SCHEMA,
                    combiner=_dd, num_buckets=num_buckets,
                ),
                _ANC_SCHEMA,
            ).materialize()
            n_now = closure.count()
            if n_now == n_prev:
                break
            n_prev = n_now
        else:
            raise ValueError(
                f"tree_rollup: closure still growing after {max_depth} "
                "doubling rounds — parent cycle or pathological depth"
            )
        # a cycle converges to a CLOSED set containing self-ancestor
        # pairs instead of growing forever — detect those explicitly
        n_self = closure.map_batches(
            lambda b: pa.table(
                {"bad": pa.array([int(pc.sum(pc.equal(b["node"], b["anc"])).as_py() or 0)], pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("bad")
        if n_self:
            raise ValueError(
                "tree_rollup: parent cycle detected (self-ancestor pairs "
                "in the closure)"
            )

    val_schema = pa.schema([("node", pa.int64()), ("value", pa.int64())])
    values_s = sanitize_for_join(values, val_schema)
    inherited = cogroup_join(
        closure, values_s, on=["node"],
        num_buckets=num_buckets,
        left_schema=_ANC_SCHEMA, right_schema=val_schema,
    ).map_batches(
        lambda b: pa.table(
            {
                "node": b["anc"].combine_chunks().cast(pa.int64()),
                "v": b["value"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    own = values_s.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"].combine_chunks().cast(pa.int64()),
                "v": b["value"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    # zero carriers: ancestors with no value row of their own still
    # appear (every closure endpoint + every child)
    carriers = closure.map_batches(
        lambda b: pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        b["node"].combine_chunks().cast(pa.int64()),
                        b["anc"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "v": pa.array([0] * (2 * len(b)), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    summed = grouped_sums(
        inherited.union(own).union(carriers), ["node"], {"subtree_value": "v"}
    )
    return normalize_blocks(
        summed.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"].astype("int64"),
                    "subtree_value": b["subtree_value"].astype("int64"),
                }
            ),
            batch_format="pandas",
        ),
        ROLLUP_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Minimum spanning forest (Boruvka) over a weighted undirected edge table
# ---------------------------------------------------------------------------

MST_SCHEMA = pa.schema([("u", pa.string()), ("v", pa.string()), ("w", pa.int64())])

_WEL_SCHEMA = pa.schema(
    [
        ("u", pa.string()),
        ("v", pa.string()),
        ("w", pa.int64()),
        ("lu", pa.string()),
        ("lv", pa.string()),
    ]
)


def _mst_pair_min(weighted: ray.data.Dataset, num_buckets: int | None):
    """Canonicalize ``u < v`` and keep the single cheapest parallel
    edge per pair — weight-monotone, so the forest is unchanged, and
    it makes ``(w, u, v)`` a TOTAL order (each pair appears once),
    which is what guarantees Boruvka and Kruskal agree."""

    def _canon(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "u": pd.Series([], dtype="object"),
                    "v": pd.Series([], dtype="object"),
                    "w": pd.Series([], dtype="int64"),
                }
            )
        u = b["u"].astype(str)
        v = b["v"].astype(str)
        lo = u.where(u <= v, v)
        hi = v.where(u <= v, u)
        out = pd.DataFrame({"u": lo, "v": hi, "w": b["w"].astype("int64")})
        out = out[out["u"] != out["v"]]
        return out.sort_values(["u", "v", "w"], kind="mergesort").drop_duplicates(
            ["u", "v"], keep="first"
        )

    def _min_w(g: pd.DataFrame) -> pd.DataFrame:
        return _canon(g)

    return bucketed_reduce(
        weighted.map_batches(_canon, batch_format="pandas"),
        ["u", "v"],
        _min_w,
        MST_SCHEMA,
        num_buckets=num_buckets,
    )


def mst_local(df: pd.DataFrame) -> pd.DataFrame:
    """Kruskal over canonical ``(u, v, w)`` rows with the total order
    ``(w, u, v)`` — the driver twin of :func:`minimum_spanning_forest`
    (identical forest: distinct comparator keys make the MSF unique)."""
    df = df.sort_values(["w", "u", "v"], kind="mergesort")
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    keep_u, keep_v, keep_w = [], [], []
    for u, v, w in zip(df["u"], df["v"], df["w"]):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            keep_u.append(u)
            keep_v.append(v)
            keep_w.append(int(w))
    return pd.DataFrame({"u": keep_u, "v": keep_v, "w": keep_w}).astype(
        {"w": "int64"}
    )


def minimum_spanning_forest(
    weighted: ray.data.Dataset,
    *,
    driver_max_edges: int = 2_000_000,
    contraction_driver_max: int = 2_000_000,
    max_rounds: int = 40,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Minimum spanning forest of a weighted undirected multigraph
    ``(u, v, w)`` — Boruvka's algorithm, the classically distributed
    MST (each round every component grabs its cheapest outgoing edge;
    components at least halve, so rounds <= log2(n)).

    Deterministic: parallel edges collapse to the cheapest per pair
    first, making the comparator ``(w, u, v)`` a total order — the MSF
    under a total order is unique, so the distributed rounds, the
    driver Kruskal twin, and networkx (on distinct weights) all emit
    the same edge set (pinned by tests).

    Count-gated twice, per the repo's residue rule: the whole
    (pair-collapsed) edge list under ``driver_max_edges`` runs the
    driver Kruskal; over the gate, each round is two relabel joins +
    one component-keyed min reduce, and the per-round CONTRACTION
    residue (<= one selected edge per component, halving every round)
    is itself gated — driver union-find under
    ``contraction_driver_max``, min-label closure over it.
    """
    from .infer import connected_components, connected_components_distributed

    edges = sanitize_for_join(
        _mst_pair_min(weighted, num_buckets), MST_SCHEMA
    ).materialize()
    n_edges = edges.count()
    if n_edges == 0:  # empty to_pandas loses its schema — return typed empty
        return ray.data.from_arrow(MST_SCHEMA.empty_table())
    if n_edges <= driver_max_edges:
        out = mst_local(edges.to_pandas())
        return ray.data.from_arrow(pa_from_pandas(out, MST_SCHEMA))

    # --- distributed Boruvka: carry component labels ON the edges ---
    el = sanitize_for_join(
        edges.map_batches(
            lambda b: pa.table(
                {
                    "u": b["u"],
                    "v": b["v"],
                    "w": b["w"],
                    "lu": b["u"],
                    "lv": b["v"],
                }
            ),
            batch_format="pyarrow",
        ),
        _WEL_SCHEMA,
    ).materialize()

    forest: list[ray.data.Dataset] = []

    def _min_per_label(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["label", "w", "u", "v"], kind="mergesort")
            .drop_duplicates("label", keep="first")
            .drop(columns="label")
        )

    def _dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["u", "v"])

    def _cross_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.equal(b["lu"], b["lv"])))

    for _ in range(max_rounds):
        el = sanitize_for_join(
            el.map_batches(_cross_only, batch_format="pyarrow"), _WEL_SCHEMA
        ).materialize()
        if el.count() == 0:
            break

        tagged = el.map_batches(
            lambda b: pa.concat_tables(
                [
                    pa.table({"label": b["lu"], **{c: b[c] for c in _WEL_SCHEMA.names}}),
                    pa.table({"label": b["lv"], **{c: b[c] for c in _WEL_SCHEMA.names}}),
                ]
            ),
            batch_format="pyarrow",
        )
        sel = sanitize_for_join(
            bucketed_reduce(
                bucketed_reduce(
                    tagged, ["label"], _min_per_label, _WEL_SCHEMA,
                    num_buckets=num_buckets,
                ),
                ["u", "v"],
                _dedup_pairs,
                _WEL_SCHEMA,
                num_buckets=num_buckets,
            ),
            _WEL_SCHEMA,
        ).materialize()
        forest.append(sel.select_columns(["u", "v", "w"]))

        # contraction: components of the selected (lu, lv) merge graph
        merge_edges = sel.map_batches(
            lambda b: pa.table({"subject": b["lu"], "object": b["lv"]}),
            batch_format="pyarrow",
        ).materialize()
        if merge_edges.count() <= contraction_driver_max:
            rows = merge_edges.to_pandas()
            labels = connected_components(
                list(zip(rows["subject"].astype(str), rows["object"].astype(str)))
            )
            by_class: dict[int, str] = {}
            for ent, cls in labels.items():
                cur = by_class.get(cls)
                if cur is None or ent < cur:
                    by_class[cls] = ent
            mapping = {e: by_class[c] for e, c in labels.items()}
            import ray as _ray

            ref = _ray.put(mapping)

            def _relabel(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
                m = _ray.get(_ref)
                b = b.copy()
                for c in ("lu", "lv"):
                    mapped = b[c].map(m)  # dict map: C-level, NaN on miss
                    b[c] = mapped.where(mapped.notna(), b[c])
                return b

            el = sanitize_for_join(
                el.map_batches(_relabel, batch_format="pandas"), _WEL_SCHEMA
            ).materialize()
        else:
            cc = connected_components_distributed(
                merge_edges, num_buckets=num_buckets
            )
            for side in ("lu", "lv"):
                rename = cc.map_batches(
                    lambda b, s=side: pa.table(
                        {s: b["entity"], f"__new_{s}": b["component"]}
                    ),
                    batch_format="pyarrow",
                )
                el = cogroup_join(
                    el,
                    rename,
                    on=[side],
                    how="left_outer",
                    num_buckets=num_buckets,
                    left_schema=_WEL_SCHEMA,
                    right_schema=pa.schema(
                        [(side, pa.string()), (f"__new_{side}", pa.string())]
                    ),
                )

                def _apply(b: pd.DataFrame, s=side) -> pd.DataFrame:
                    b = b.copy()
                    new = b[f"__new_{s}"]
                    b[s] = new.where(new.notna(), b[s])
                    return b.drop(columns=[f"__new_{s}"])

                el = sanitize_for_join(
                    el.map_batches(_apply, batch_format="pandas"), _WEL_SCHEMA
                ).materialize()

    if not forest:
        return ray.data.from_arrow(MST_SCHEMA.empty_table())
    out = forest[0]
    for part in forest[1:]:
        out = out.union(part)
    return sanitize_for_join(
        bucketed_reduce(
            out, ["u", "v"], _dedup_pairs, MST_SCHEMA, num_buckets=num_buckets
        ),
        MST_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Jaccard node similarity (common neighbors / union of neighborhoods)
# ---------------------------------------------------------------------------

JACCARD_SCHEMA = pa.schema(
    [
        ("node_a", pa.string()),
        ("node_b", pa.string()),
        ("n_common", pa.int64()),
        ("deg_a", pa.int64()),
        ("deg_b", pa.int64()),
        ("jac_x1e6", pa.int64()),
    ]
)


def node_jaccard(
    edges: ray.data.Dataset,
    *,
    threshold_x1e6: int = 250_000,
    max_degree: int | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Jaccard neighborhood similarity for every node pair sharing a
    neighbor: ``|N(a) ∩ N(b)| / |N(a) ∪ N(b)| >= threshold`` — the
    degree-normalized link-prediction / entity-blocking signal raw
    common-neighbor counts skew toward hubs.

    Integer-exact: the filter is ``n_common * 1e6 >= T * (deg_a +
    deg_b - n_common)`` and the reported score is its floor quotient,
    so the SQL twin hash-matches. Pair generation explodes per MIDDLE
    node (deg² per middle, capped by ``max_degree`` when hub skew
    demands — documented truncation, same knob as cooccur); counts
    flow through two bucketed reduces, degrees arrive by two
    partitioned hash joins. Only thresholded survivors leave the
    final filter — no top-k, so the result is a deterministic SET.
    """
    from .dedup import _pair_indices_by_size

    und = sanitize_for_join(
        undirected_simple_edges(edges, num_buckets=num_buckets), UND_SCHEMA
    ).materialize()
    deg = undirected_degrees(und, num_buckets=num_buckets)

    neigh = und.map_batches(
        lambda b: pd.DataFrame(
            {
                "node": pd.concat([b["a"], b["b"]], ignore_index=True),
                "nb": pd.concat([b["b"], b["a"]], ignore_index=True),
            }
        ),
        batch_format="pandas",
    )
    cn_schema = pa.schema(
        [("node_a", pa.string()), ("node_b", pa.string()), ("n_common", pa.int64())]
    )

    def _dedup(b: pd.DataFrame) -> pd.DataFrame:
        return b[["node", "nb"]].drop_duplicates()

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["node", "nb"]).sort_values(
            ["node", "nb"], kind="stable"
        )
        if max_degree is not None:
            sizes = g.groupby("node", sort=False)["nb"].transform("size")
            g = g[sizes <= max_degree]
        i, j = _pair_indices_by_size(g["node"].to_numpy(), 1 << 62)
        items = g["nb"].to_numpy()
        out = pd.DataFrame({"node_a": items[i], "node_b": items[j]})
        vc = out.groupby(["node_a", "node_b"], sort=False).size()
        return pd.DataFrame(
            {
                "node_a": vc.index.get_level_values(0).to_numpy(object),
                "node_b": vc.index.get_level_values(1).to_numpy(object),
                "n_common": vc.to_numpy(np.int64),
            }
        )

    from .infer import default_num_partitions

    partials = bucketed_reduce(
        neigh.map_batches(_dedup, batch_format="pandas", batch_size=None),
        ["node"],
        _pairs,
        cn_schema,
        combiner=_dedup,
        num_buckets=num_buckets,
    ).repartition(default_num_partitions())

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["node_a", "node_b"], sort=False)["n_common"].sum()
        return pd.DataFrame(
            {
                "node_a": s.index.get_level_values(0).to_numpy(object),
                "node_b": s.index.get_level_values(1).to_numpy(object),
                "n_common": s.to_numpy(np.int64),
            }
        )

    counts = sanitize_for_join(
        bucketed_reduce(partials, ["node_a", "node_b"], _sum, cn_schema,
                        num_buckets=num_buckets),
        cn_schema,
    )

    deg_a = deg.map_batches(
        lambda b: pa.table({"node_a": b["node"], "deg_a": b["degree"]}),
        batch_format="pyarrow",
    )
    deg_b = deg.map_batches(
        lambda b: pa.table({"node_b": b["node"], "deg_b": b["degree"]}),
        batch_format="pyarrow",
    )
    da_schema = pa.schema([("node_a", pa.string()), ("deg_a", pa.int64())])
    db_schema = pa.schema([("node_b", pa.string()), ("deg_b", pa.int64())])
    joined = cogroup_join(
        cogroup_join(
            counts, deg_a, on=["node_a"], num_buckets=num_buckets,
            left_schema=cn_schema, right_schema=da_schema,
        ),
        deg_b,
        on=["node_b"],
        num_buckets=num_buckets,
        left_schema=pa.schema(list(cn_schema) + [pa.field("deg_a", pa.int64())]),
        right_schema=db_schema,
    )

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {f.name: pd.Series([], dtype="object" if f.type == pa.string() else "int64")
                 for f in JACCARD_SCHEMA}
            )
        cn = b["n_common"].astype("int64")
        da = b["deg_a"].astype("int64")
        db = b["deg_b"].astype("int64")
        union = da + db - cn
        keep = cn * 1_000_000 >= threshold_x1e6 * union
        out = pd.DataFrame(
            {
                "node_a": b["node_a"],
                "node_b": b["node_b"],
                "n_common": cn,
                "deg_a": da,
                "deg_b": db,
                "jac_x1e6": (cn * 1_000_000) // union,
            }
        )[keep]
        return out

    return normalize_blocks(
        joined.map_batches(_score, batch_format="pandas"), JACCARD_SCHEMA
    )


# ---------------------------------------------------------------------------
# Deterministic distributed maximal matching (hash-ordered local dominance)
# ---------------------------------------------------------------------------

MATCHING_SCHEMA = pa.schema([("u", pa.string()), ("v", pa.string())])


def _edge_rank(u: pd.Series, v: pd.Series) -> pd.Series:
    """Deterministic pseudo-random total order over edges: splitmix64
    of the pair hash. Hash order (not lexicographic) is what makes the
    local-dominance rounds converge in O(log n) expected instead of
    O(n) on path-shaped graphs — derandomized Luby, same auditable-
    noise discipline as dp_noisy_counts."""
    h = pd.util.hash_pandas_object(
        pd.DataFrame({"u": u.astype(str), "v": v.astype(str)}), index=False
    ).to_numpy(np.uint64)
    z = h + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return pd.Series(z.astype("uint64"), index=u.index)


def matching_local(df: pd.DataFrame) -> pd.DataFrame:
    """Sequential greedy matching over canonical ``(u, v)`` edges in
    ``(rank, u, v)`` order — the driver twin: hash-ordered local
    dominance computes exactly the greedy matching of this order."""
    df = df.copy()
    df["rank"] = _edge_rank(df["u"], df["v"])
    df = df.sort_values(["rank", "u", "v"], kind="mergesort")
    used: set[str] = set()
    ku, kv = [], []
    for u, v in zip(df["u"], df["v"]):
        if u not in used and v not in used:
            used.add(u)
            used.add(v)
            ku.append(u)
            kv.append(v)
    return pd.DataFrame({"u": ku, "v": kv})


def maximal_matching(
    edges: ray.data.Dataset,
    *,
    driver_max_edges: int = 2_000_000,
    matched_broadcast_max: int = 2_000_000,
    max_rounds: int = 60,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Deterministic maximal matching over an ``(src, dst)`` edge table
    — Hoepman-style local dominance: each round every node points at
    its minimum-rank incident edge; an edge matched by BOTH endpoints
    joins the matching; all edges touching matched nodes drop out.
    The rank is a hash total order, so the parallel rounds compute
    EXACTLY the sequential greedy matching of that order (pinned vs
    :func:`matching_local`) at any layout, and converge in O(log n)
    expected rounds.

    Count-gated twice: the whole simple-edge list under
    ``driver_max_edges`` runs the greedy twin; over the gate, each
    round is one node-keyed min reduce + one edge-keyed dominance
    count, and matched-node removal broadcasts under
    ``matched_broadcast_max`` / anti-joins over it.
    """
    und = sanitize_for_join(
        undirected_simple_edges(edges, num_buckets=num_buckets), UND_SCHEMA
    ).materialize()
    n_edges = und.count()
    if n_edges == 0:
        return ray.data.from_arrow(MATCHING_SCHEMA.empty_table())
    if n_edges <= driver_max_edges:
        out = matching_local(und.to_pandas().rename(columns={"a": "u", "b": "v"}))
        return ray.data.from_arrow(pa_from_pandas(out, MATCHING_SCHEMA))

    ranked_schema = pa.schema(
        [("u", pa.string()), ("v", pa.string()), ("rank", pa.uint64())]
    )

    def _rank_batch(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"u": b["a"].astype(str), "v": b["b"].astype(str)})
        out["rank"] = _edge_rank(out["u"], out["v"])
        return out

    active = sanitize_for_join(
        und.map_batches(_rank_batch, batch_format="pandas"), ranked_schema
    ).materialize()
    matched_parts: list[ray.data.Dataset] = []

    tag_schema = pa.schema([("node", pa.string())] + list(ranked_schema))

    def _min_per_node(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["node", "rank", "u", "v"], kind="mergesort")
            .drop_duplicates("node", keep="first")
            .drop(columns="node")
        )

    def _dominant(g: pd.DataFrame) -> pd.DataFrame:
        vc = g.groupby(["u", "v"], sort=False).size()
        both = vc[vc >= 2].index
        out = pd.DataFrame(
            {"u": both.get_level_values(0), "v": both.get_level_values(1)}
        )
        return out

    for _ in range(max_rounds):
        if active.count() == 0:
            break
        tagged = active.map_batches(
            lambda b: pa.concat_tables(
                [
                    pa.table({"node": b["u"], **{c: b[c] for c in ranked_schema.names}}),
                    pa.table({"node": b["v"], **{c: b[c] for c in ranked_schema.names}}),
                ]
            ),
            batch_format="pyarrow",
        )
        mins = bucketed_reduce(
            tagged, ["node"], _min_per_node, ranked_schema, num_buckets=num_buckets
        )
        sel = sanitize_for_join(
            bucketed_reduce(
                mins, ["u", "v"], _dominant, MATCHING_SCHEMA,
                num_buckets=num_buckets,
            ),
            MATCHING_SCHEMA,
        ).materialize()
        if sel.count() == 0:
            # no locally-dominant edge can only mean no active edges
            # (the global min is always dominant) — defensive break
            break
        matched_parts.append(sel)

        nodes = sel.map_batches(
            lambda b: pd.DataFrame(
                {"node": pd.concat([b["u"], b["v"]], ignore_index=True).astype(str)}
            ),
            batch_format="pandas",
        ).materialize()
        if nodes.count() <= matched_broadcast_max:
            import ray as _ray

            matched_set = set(nodes.to_pandas()["node"].astype(str))
            ref = _ray.put(matched_set)

            def _drop(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
                m = _ray.get(_ref)
                keep = ~(b["u"].isin(m) | b["v"].isin(m))
                return b[keep]

            active = sanitize_for_join(
                active.map_batches(_drop, batch_format="pandas"), ranked_schema
            ).materialize()
        else:
            node_schema = pa.schema([("node", pa.string())])
            for side in ("u", "v"):
                probe = nodes.map_batches(
                    lambda b, s=side: pa.table({s: b["node"]}),
                    batch_format="pyarrow",
                )
                active = cogroup_join(
                    active,
                    probe,
                    on=[side],
                    how="left_anti",
                    num_buckets=num_buckets,
                    left_schema=ranked_schema,
                    right_schema=pa.schema([(side, pa.string())]),
                )
                active = sanitize_for_join(active, ranked_schema).materialize()
            _ = node_schema
    else:
        if active.count() > 0:
            raise RuntimeError(
                "maximal_matching: not converged within max_rounds"
            )

    if not matched_parts:
        return ray.data.from_arrow(MATCHING_SCHEMA.empty_table())
    out = matched_parts[0]
    for part in matched_parts[1:]:
        out = out.union(part)
    return sanitize_for_join(out, MATCHING_SCHEMA)


# ---------------------------------------------------------------------------
# Weisfeiler-Lehman label refinement (structural node fingerprints)
# ---------------------------------------------------------------------------

WL_SCHEMA = pa.schema(
    [("node", pa.string()), ("wl_label", pa.int64()), ("class_size", pa.int64())]
)
_WL_ADJ_SCHEMA = pa.schema([("node", pa.string()), ("nbr", pa.string())])
_WL_LBL_SCHEMA = pa.schema([("node", pa.string()), ("lbl", pa.int64())])
_WL_SIG_SCHEMA = pa.schema([("node", pa.string()), ("sig", pa.string())])


def _wl_sig_frame(own: pd.DataFrame, nbrs: pd.DataFrame) -> pd.DataFrame:
    """``(node, sig)`` where sig = own label, '|', comma-joined
    ascending neighbor labels (with multiplicity). Shared by the local
    twin and the distributed reduce so the two paths cannot drift."""
    nbrs = nbrs.sort_values(["node", "lbl"], kind="stable")
    joined = (
        nbrs.assign(s=nbrs["lbl"].astype("int64").astype(str))
        .groupby("node", sort=False)["s"]
        .agg(",".join)
    )
    own = own.set_index("node")["lbl"].astype("int64").astype(str)
    sig = own + "|" + joined.reindex(own.index)
    return pd.DataFrame({"node": sig.index.to_numpy(), "sig": sig.to_numpy()})


def wl_refine_local(
    edge_list: list[tuple[str, str]], *, iters: int = 2
) -> pd.DataFrame:
    """Pure-pandas twin of :func:`wl_refine` (drives the count gate and
    the tests): undirected-with-multiplicity WL colour refinement,
    initial label = degree, per-round label = 1-based lexicographic
    dense rank of the signature string."""
    if not edge_list:
        return WL_SCHEMA.empty_table().to_pandas()
    e = pd.DataFrame(edge_list, columns=["src", "dst"]).astype(str)
    adj = pd.DataFrame(
        {
            "node": np.concatenate([e["src"].to_numpy(), e["dst"].to_numpy()]),
            "nbr": np.concatenate([e["dst"].to_numpy(), e["src"].to_numpy()]),
        }
    )
    lbl = adj.groupby("node", sort=False).size().rename("lbl").reset_index()
    for _ in range(iters):
        nb = adj.merge(lbl.rename(columns={"node": "nbr"}), on="nbr")
        sig = _wl_sig_frame(lbl, nb[["node", "lbl"]])
        ranks = {s: i + 1 for i, s in enumerate(sorted(set(sig["sig"])))}
        lbl = pd.DataFrame(
            {"node": sig["node"], "lbl": sig["sig"].map(ranks).astype("int64")}
        )
    cs = lbl.groupby("lbl", sort=False)["node"].transform("size")
    out = pd.DataFrame(
        {
            "node": lbl["node"],
            "wl_label": lbl["lbl"].astype("int64"),
            "class_size": cs.astype("int64"),
        }
    )
    return out.sort_values("node", kind="stable").reset_index(drop=True)


def wl_refine(
    edges: ray.data.Dataset,
    *,
    iters: int = 2,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """``(node, wl_label, class_size)`` after ``iters`` rounds of
    Weisfeiler-Lehman colour refinement over an undirected
    ``(src, dst)`` multigraph — the classic structural-role
    fingerprint (two nodes share a label iff their ``iters``-hop
    neighbourhood trees agree), SQL-oracle-exact because each round's
    new label is the LEXICOGRAPHIC DENSE RANK of the signature string
    rather than an engine-specific hash.

    COUNT-GATED like every graph op here: small edge lists run the
    bit-identical pandas twin; over the gate, each round is one
    cogroup join (neighbor labels onto adjacency), one bucketed
    signature reduce (own-label rows ride along as marker rows), one
    :func:`~.relational.dense_rank_distinct` sort exchange over the
    DISTINCT signatures (bounded by node count, never collected), and
    one join back. Signature strings grow with degree; hub nodes pay
    proportional bytes but never per-row Python."""
    from .relational import dense_rank_distinct

    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.count() <= driver_max_edges:
        df = edges.to_pandas()
        if df.empty or "src" not in df.columns:  # empty loses its schema
            return ray.data.from_arrow(WL_SCHEMA.empty_table())
        out = wl_refine_local(list(zip(df["src"], df["dst"])), iters=iters)
        return ray.data.from_arrow(pa_from_pandas(out, WL_SCHEMA))

    adj = sanitize_for_join(
        _undirect(edges).map_batches(
            lambda b: pa.table(
                {
                    "node": b["src"].combine_chunks().cast(pa.string()),
                    "nbr": b["dst"].combine_chunks().cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        ),
        _WL_ADJ_SCHEMA,
    ).materialize()

    def _deg(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype="object"), "lbl": pd.Series(dtype="int64")}
            )
        if "nbr" in b.columns:
            b = pd.DataFrame(
                {"node": b["node"].to_numpy(), "lbl": np.ones(len(b), dtype=np.int64)}
            )
        return b.groupby("node", as_index=False, sort=False)["lbl"].sum()

    labels = sanitize_for_join(
        bucketed_reduce(adj, ["node"], _deg, _WL_LBL_SCHEMA, combiner=_deg,
                        num_buckets=num_buckets),
        _WL_LBL_SCHEMA,
    ).materialize()

    for _ in range(iters):
        lbl_as_nbr = labels.map_batches(
            lambda b: pa.table(
                {
                    "nbr": b["node"].combine_chunks().cast(pa.string()),
                    "lbl": b["lbl"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        nbr_lbls = cogroup_join(
            adj, lbl_as_nbr, on=["nbr"], how="inner",
            left_schema=_WL_ADJ_SCHEMA,
            right_schema=pa.schema([("nbr", pa.string()), ("lbl", pa.int64())]),
            num_buckets=num_buckets,
        ).map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "lbl": b["lbl"].astype("int64"),
                    "is_own": np.zeros(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )
        own_rows = labels.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "lbl": b["lbl"].astype("int64"),
                    "is_own": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )

        def _sig(g: pd.DataFrame) -> pd.DataFrame:
            own = g[g["is_own"] == 1][["node", "lbl"]]
            nb = g[g["is_own"] == 0][["node", "lbl"]]
            # isolated carrier rows can't occur: every labeled node
            # came from the adjacency, so it has >= 1 neighbor row
            return _wl_sig_frame(own, nb)

        sigs = bucketed_reduce(
            nbr_lbls.union(own_rows), ["node"], _sig, _WL_SIG_SCHEMA,
            num_buckets=num_buckets,
        )

        def _dd_sig(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0 or "sig" not in b.columns:
                return pd.DataFrame({"sig": pd.Series(dtype="object")})
            return pd.DataFrame({"sig": pd.unique(b["sig"].to_numpy())})

        distinct = bucketed_reduce(
            sigs.map_batches(
                lambda b: b[["sig"]] if len(b) else b, batch_format="pandas"
            ),
            ["sig"],
            _dd_sig,
            pa.schema([("sig", pa.string())]),
            combiner=_dd_sig,
            num_buckets=num_buckets,
        )
        ranked = dense_rank_distinct(distinct, "sig", rank_col="lbl")
        labels = sanitize_for_join(
            cogroup_join(
                sigs, ranked, on=["sig"], how="inner",
                left_schema=_WL_SIG_SCHEMA,
                right_schema=pa.schema([("sig", pa.string()), ("lbl", pa.int64())]),
                num_buckets=num_buckets,
            ).map_batches(
                lambda b: pd.DataFrame(
                    {"node": b["node"], "lbl": b["lbl"].astype("int64")}
                ),
                batch_format="pandas",
            ),
            _WL_LBL_SCHEMA,
        ).materialize()

    def _cs(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"lbl": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")}
            )
        if "node" in b.columns:
            b = pd.DataFrame(
                {"lbl": b["lbl"].to_numpy(), "n": np.ones(len(b), dtype=np.int64)}
            )
        return b.groupby("lbl", as_index=False, sort=False)["n"].sum()

    sizes = bucketed_reduce(
        labels, ["lbl"], _cs,
        pa.schema([("lbl", pa.int64()), ("n", pa.int64())]),
        combiner=_cs, num_buckets=num_buckets,
    )
    out = cogroup_join(
        labels, sizes, on=["lbl"], how="inner",
        left_schema=_WL_LBL_SCHEMA,
        right_schema=pa.schema([("lbl", pa.int64()), ("n", pa.int64())]),
        num_buckets=num_buckets,
    )
    return normalize_blocks(
        out.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "wl_label": b["lbl"].astype("int64"),
                    "class_size": b["n"].astype("int64"),
                }
            ),
            batch_format="pandas",
        ),
        WL_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Seeded label spreading (semi-supervised node classification)
# ---------------------------------------------------------------------------

SPREAD_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.int64())])
_SPREAD_ROW_SCHEMA = pa.schema(
    [("node", pa.string()), ("lbl", pa.int64()), ("kind", pa.int64())]
)


def _spread_majority(g: pd.DataFrame) -> pd.DataFrame:
    """One synchronous round over marker rows: kind 2 = seed (clamps),
    1 = previous label (fallback), 0 = labeled-neighbor vote (with
    multiplicity). Majority count desc, tie-break min label. Shared by
    the local twin and the distributed reduce."""
    seeds = g[g["kind"] == 2].drop_duplicates("node")
    seeded = set(seeds["node"])
    rest = g[(g["kind"] != 2) & ~g["node"].isin(seeded)]
    votes = rest[rest["kind"] == 0]
    win = pd.DataFrame({"node": pd.Series(dtype="object"),
                        "lbl": pd.Series(dtype="int64")})
    if len(votes):
        counts = votes.groupby(["node", "lbl"], as_index=False, sort=False).size()
        counts = counts.sort_values(
            ["node", "size", "lbl"], ascending=[True, False, True], kind="stable"
        )
        win = counts.drop_duplicates("node")[["node", "lbl"]]
    prev = rest[rest["kind"] == 1][["node", "lbl"]]
    prev = prev[~prev["node"].isin(set(win["node"]))]
    out = pd.concat(
        [seeds[["node", "lbl"]], win, prev], ignore_index=True
    )
    out["lbl"] = out["lbl"].astype("int64")
    return out


def label_spread_local(
    edge_list: list[tuple[str, str]],
    seed_items: list[tuple[str, int]],
    *,
    iters: int = 2,
) -> pd.DataFrame:
    """Pure-pandas twin of :func:`label_spread` (drives the count gate
    and the tests) — same marker-row kernel, whole graph in one call."""
    seeds = pd.DataFrame(seed_items, columns=["node", "lbl"])
    seeds["node"] = seeds["node"].astype(str)
    seeds["lbl"] = seeds["lbl"].astype("int64")
    if not edge_list:
        adj = pd.DataFrame({"node": pd.Series(dtype="object"),
                            "nbr": pd.Series(dtype="object")})
    else:
        e = pd.DataFrame(edge_list, columns=["src", "dst"]).astype(str)
        adj = pd.DataFrame(
            {
                "node": np.concatenate([e["src"].to_numpy(), e["dst"].to_numpy()]),
                "nbr": np.concatenate([e["dst"].to_numpy(), e["src"].to_numpy()]),
            }
        )
    lab = seeds.copy()
    for _ in range(iters):
        nb = adj.merge(
            lab.rename(columns={"node": "nbr"}), on="nbr"
        )[["node", "lbl"]]
        nb["kind"] = 0
        prev = lab.copy()
        prev["kind"] = 1
        sd = seeds.copy()
        sd["kind"] = 2
        lab = _spread_majority(pd.concat([nb, prev, sd], ignore_index=True))
    out = lab.rename(columns={"lbl": "label"}).sort_values("node", kind="stable")
    return out.reset_index(drop=True)[["node", "label"]]


def label_spread(
    edges: ray.data.Dataset,
    seeds: pd.DataFrame,
    *,
    iters: int = 2,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """Semi-supervised label spreading over an undirected ``(src,
    dst)`` multigraph: seed nodes are clamped; each synchronous round
    every other node adopts the MAJORITY label of its labeled
    neighbors (parallel edges vote with multiplicity, ties break to
    the smallest label), keeping its previous label when no neighbor
    is labeled. Deterministic and layout-independent, so it is
    SQL-oracle-exact (unrolled rounds with a row_number majority).

    ``seeds`` is a small driver-side frame ``(node, label int64)`` —
    the classic use is a few thousand curated anchors; a corpus-sized
    seed table would need a seeds-as-Dataset variant. COUNT-GATED:
    small edge lists run the bit-identical pandas twin; over the gate,
    each round is one cogroup join (labels onto adjacency) and one
    bucketed majority reduce over marker rows (votes / previous /
    seed), exactly the shared kernel."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    seed_items = [
        (str(n), int(v)) for n, v in zip(seeds.iloc[:, 0], seeds.iloc[:, 1])
    ]
    if edges.count() <= driver_max_edges:
        df = edges.to_pandas()
        pairs = (
            [] if df.empty or "src" not in df.columns
            else list(zip(df["src"], df["dst"]))
        )
        out = label_spread_local(pairs, seed_items, iters=iters)
        return ray.data.from_arrow(pa_from_pandas(out, SPREAD_SCHEMA))

    adj = sanitize_for_join(
        _undirect(edges).map_batches(
            lambda b: pa.table(
                {
                    "node": b["src"].combine_chunks().cast(pa.string()),
                    "nbr": b["dst"].combine_chunks().cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        ),
        pa.schema([("node", pa.string()), ("nbr", pa.string())]),
    ).materialize()

    seed_tbl = pa.table(
        {
            "node": pa.array([n for n, _ in seed_items], pa.string()),
            "lbl": pa.array([v for _, v in seed_items], pa.int64()),
        }
    )
    seed_rows = ray.data.from_arrow(
        pa.table(
            {
                "node": seed_tbl["node"],
                "lbl": seed_tbl["lbl"],
                "kind": pa.array([2] * len(seed_tbl), pa.int64()),
            }
        )
    )
    labels = sanitize_for_join(
        ray.data.from_arrow(seed_tbl),
        pa.schema([("node", pa.string()), ("lbl", pa.int64())]),
    )

    def _maj(g: pd.DataFrame) -> pd.DataFrame:
        return _spread_majority(g)

    lbl_schema = pa.schema([("node", pa.string()), ("lbl", pa.int64())])
    for _ in range(iters):
        votes = cogroup_join(
            adj,
            labels.map_batches(
                lambda b: pa.table(
                    {
                        "nbr": b["node"].combine_chunks().cast(pa.string()),
                        "lbl": b["lbl"].combine_chunks().cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            on=["nbr"],
            how="inner",
            left_schema=pa.schema([("node", pa.string()), ("nbr", pa.string())]),
            right_schema=pa.schema([("nbr", pa.string()), ("lbl", pa.int64())]),
            num_buckets=num_buckets,
        ).map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "lbl": b["lbl"].astype("int64"),
                    "kind": np.zeros(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )
        prev = labels.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "lbl": b["lbl"].astype("int64"),
                    "kind": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )
        labels = sanitize_for_join(
            bucketed_reduce(
                votes.union(prev).union(seed_rows),
                ["node"],
                _maj,
                lbl_schema,
                num_buckets=num_buckets,
            ),
            lbl_schema,
        ).materialize()

    return normalize_blocks(
        labels.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"], "label": b["lbl"].astype("int64")}
            ),
            batch_format="pandas",
        ),
        SPREAD_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Integer feature smoothing (SGC-style propagation)
# ---------------------------------------------------------------------------

FEAT_SCHEMA = pa.schema([("node", pa.string()), ("feat", pa.int64())])
_FS_STATE_SCHEMA = pa.schema(
    [("node", pa.string()), ("deg", pa.int64()), ("f", pa.int64())]
)


def feature_smooth_local(
    edge_list: list[tuple[str, str]],
    feat_items: list[tuple[str, int]],
    *,
    iters: int = 2,
) -> pd.DataFrame:
    """Pure-Python twin of :func:`feature_smooth`: per round
    ``f'(v) = (f(v) + sum_{u in N(v)} f(u)) // (1 + deg(v))`` over the
    undirected multigraph, integer floor division (features must be
    non-negative), missing features default to 0."""
    from collections import defaultdict

    adj: dict[str, list[str]] = defaultdict(list)
    for s, d in edge_list:
        adj[str(s)].append(str(d))
        adj[str(d)].append(str(s))
    f = {str(n): int(v) for n, v in feat_items}
    universe = sorted(set(adj) | set(f))
    f = {n: f.get(n, 0) for n in universe}
    for _ in range(iters):
        f = {
            n: (f[n] + sum(f[u] for u in adj.get(n, ()))) // (1 + len(adj.get(n, ())))
            for n in universe
        }
    return pd.DataFrame(
        {"node": universe, "feat": pd.Series([f[n] for n in universe], dtype="int64")}
    )


def feature_smooth(
    edges: ray.data.Dataset,
    feats: ray.data.Dataset,
    *,
    iters: int = 2,
    num_buckets: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """``(node, feat)`` after ``iters`` rounds of self-inclusive
    integer mean smoothing over an undirected ``(src, dst)``
    multigraph — the SGC/feature-propagation preprocessing step
    (neighborhood-averaged features for downstream classifiers), in
    floor-division integer arithmetic so results are bit-exact at any
    layout and SQL-oracle-checkable. ``feats`` is ``(node, feat)``
    with NON-NEGATIVE int64 features; nodes without a feature smooth
    from 0, featured nodes without edges keep their value.

    COUNT-GATED: small edge lists collect into the Python twin; over
    the gate, the state table ``(node, deg, f)`` carries the degree
    with the feature (pagerank's trick — no per-round deg join), and
    each round is ONE cogroup join (state onto adjacency) plus ONE
    bucketed sum with self-carrier marker rows."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    feats = feats.materialize()
    if edges.count() <= driver_max_edges:
        edf = edges.to_pandas()
        fdf = feats.to_pandas()
        pairs = (
            [] if edf.empty or "src" not in edf.columns
            else list(zip(edf["src"], edf["dst"]))
        )
        items = (
            [] if fdf.empty or "node" not in fdf.columns
            else list(zip(fdf["node"], fdf["feat"]))
        )
        out = feature_smooth_local(pairs, items, iters=iters)
        return ray.data.from_arrow(pa_from_pandas(out, FEAT_SCHEMA))

    adj_schema = pa.schema([("node", pa.string()), ("nbr", pa.string())])
    adj = sanitize_for_join(
        _undirect(edges).map_batches(
            lambda b: pa.table(
                {
                    "node": b["src"].combine_chunks().cast(pa.string()),
                    "nbr": b["dst"].combine_chunks().cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        ),
        adj_schema,
    ).materialize()

    # universe with degree: adjacency counts + zero-degree carrier for
    # featured nodes, one combined grouped sum
    deg_rows = adj.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"].combine_chunks().cast(pa.string()),
                "one": pa.array([1] * len(b), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).union(
        feats.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"].combine_chunks().cast(pa.string()),
                    "one": pa.array([0] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    degs = sanitize_for_join(
        grouped_sums(deg_rows, ["node"], {"deg": "one"}),
        pa.schema([("node", pa.string()), ("deg", pa.int64())]),
    )
    state = sanitize_for_join(
        cogroup_join(
            degs,
            feats.map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"].combine_chunks().cast(pa.string()),
                        "feat": b["feat"].combine_chunks().cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            on=["node"],
            how="left_outer",
            left_schema=pa.schema([("node", pa.string()), ("deg", pa.int64())]),
            right_schema=FEAT_SCHEMA,
            num_buckets=num_buckets,
        ).map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "deg": b["deg"].astype("int64"),
                    "f": b["feat"].fillna(0).astype("int64"),
                }
            ),
            batch_format="pandas",
        ),
        _FS_STATE_SCHEMA,
    ).materialize()

    def _mean(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="object"),
                    "deg": pd.Series(dtype="int64"),
                    "f": pd.Series(dtype="int64"),
                }
            )
        agg = g.groupby("node", as_index=False, sort=False).agg(
            total=("val", "sum"), deg=("deg", "max")
        )
        return pd.DataFrame(
            {
                "node": agg["node"],
                "deg": agg["deg"].astype("int64"),
                "f": (agg["total"] // (1 + agg["deg"])).astype("int64"),
            }
        )

    for _ in range(iters):
        contribs = cogroup_join(
            adj,
            state.map_batches(
                lambda b: pa.table(
                    {
                        "nbr": b["node"].combine_chunks().cast(pa.string()),
                        "fv": b["f"].combine_chunks().cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            on=["nbr"],
            how="inner",
            left_schema=adj_schema,
            right_schema=pa.schema([("nbr", pa.string()), ("fv", pa.int64())]),
            num_buckets=num_buckets,
        ).map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "val": b["fv"].astype("int64"),
                    "deg": np.full(len(b), -1, dtype=np.int64),  # non-carrier
                }
            ),
            batch_format="pandas",
        )
        selfs = state.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "val": b["f"].astype("int64"),
                    "deg": b["deg"].astype("int64"),
                }
            ),
            batch_format="pandas",
        )
        state = sanitize_for_join(
            bucketed_reduce(
                contribs.union(selfs), ["node"], _mean, _FS_STATE_SCHEMA,
                num_buckets=num_buckets,
            ),
            _FS_STATE_SCHEMA,
        ).materialize()

    return normalize_blocks(
        state.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"], "feat": b["f"].astype("int64")}
            ),
            batch_format="pandas",
        ),
        FEAT_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Maximal independent set (derandomized Luby)
# ---------------------------------------------------------------------------

MIS_SCHEMA = pa.schema([("node", pa.string())])


def _node_rank(nodes: pd.Series) -> np.ndarray:
    """splitmix64 of the node-string hash — the same derandomized-Luby
    total order discipline as :func:`_edge_rank`, per node."""
    h = pd.util.hash_pandas_object(
        nodes.astype(str), index=False
    ).to_numpy(np.uint64)
    z = h + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return (z ^ (z >> np.uint64(31))).astype("uint64")


def mis_local(und: pd.DataFrame) -> pd.DataFrame:
    """Sequential greedy MIS over canonical ``(a, b)`` simple edges in
    ``(rank, node)`` order — the driver twin; hash-ordered local
    dominance computes exactly this greedy set at any layout."""
    nodes = pd.unique(
        np.concatenate([und["a"].to_numpy(), und["b"].to_numpy()])
    ) if len(und) else np.array([], dtype=object)
    nbrs: dict[str, set] = {str(n): set() for n in nodes}
    for a, b in zip(und["a"], und["b"]):
        if a != b:
            nbrs[str(a)].add(str(b))
            nbrs[str(b)].add(str(a))
    order = sorted(
        nbrs, key=lambda n: (int(_node_rank(pd.Series([n]))[0]), n)
    )
    mis: set = set()
    blocked: set = set()
    for n in order:
        if n in blocked:
            continue
        mis.add(n)
        blocked |= nbrs[n]
    # a self-loop node can never be independent of itself? convention:
    # simple-edge canonicalization drops self-loops upstream, so every
    # node here is eligible.
    return pd.DataFrame({"node": sorted(mis)})


def maximal_independent_set(
    edges: ray.data.Dataset,
    *,
    driver_max_edges: int = 2_000_000,
    removed_broadcast_max: int = 2_000_000,
    max_rounds: int = 60,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Deterministic maximal independent set over an ``(src, dst)``
    edge table — derandomized Luby: each round, a remaining node joins
    the MIS iff its ``(rank, node)`` key is a strict local minimum
    among remaining neighbors; winners' neighborhoods drop out. With a
    FIXED rank order the parallel rounds compute EXACTLY the
    sequential greedy MIS of that order (pinned vs :func:`mis_local`),
    layout-independent, O(log n) expected rounds. Self-loops are
    dropped by the simple-edge canonicalization (a self-looped node is
    treated like any other node). Rows-only (greedy MIS is not
    SQL-expressible); independence + maximality pinned in pytest.

    Count-gated twice, like :func:`maximal_matching`: the whole
    simple-edge list under ``driver_max_edges`` runs the greedy twin;
    over the gate each round is ONE node-keyed bucketed reduce
    (ranks are pure functions of the node string — no rank join), and
    neighborhood removal broadcasts under ``removed_broadcast_max``
    or anti-joins over it."""
    und = sanitize_for_join(
        undirected_simple_edges(edges, num_buckets=num_buckets), UND_SCHEMA
    ).materialize()
    n_edges = und.count()
    if n_edges == 0:
        return ray.data.from_arrow(MIS_SCHEMA.empty_table())
    if n_edges <= driver_max_edges:
        return ray.data.from_arrow(
            pa_from_pandas(mis_local(und.to_pandas()), MIS_SCHEMA)
        )

    import ray as _ray

    adj_schema = pa.schema([("node", pa.string()), ("nbr", pa.string())])
    adj = sanitize_for_join(
        und.map_batches(
            lambda b: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            b["a"].combine_chunks().cast(pa.string()),
                            b["b"].combine_chunks().cast(pa.string()),
                        ]
                    ),
                    "nbr": pa.concat_arrays(
                        [
                            b["b"].combine_chunks().cast(pa.string()),
                            b["a"].combine_chunks().cast(pa.string()),
                        ]
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        adj_schema,
    ).materialize()

    universe = sanitize_for_join(
        bucketed_reduce(
            adj.map_batches(
                lambda b: pa.table(
                    {"node": b["node"].combine_chunks().cast(pa.string())}
                ),
                batch_format="pyarrow",
            ),
            ["node"],
            lambda b: b.drop_duplicates("node") if len(b) else b,
            MIS_SCHEMA,
            combiner=lambda b: b.drop_duplicates("node") if len(b) else b,
            num_buckets=num_buckets,
        ),
        MIS_SCHEMA,
    ).materialize()

    # MIS = universe \ blocked, where blocked accumulates every
    # neighbor-of-winner: a node that is never blocked eventually
    # becomes isolated and joins the greedy set, so tracking blocked
    # (not winners) is what keeps late isolated nodes IN the MIS.
    blocked_parts: list[ray.data.Dataset] = []

    def _winners(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"node": pd.Series(dtype="object")})
        own_r = _node_rank(g["node"])
        nbr_r = _node_rank(g["nbr"])
        own_key = list(zip(own_r, g["node"]))
        nbr_key = list(zip(nbr_r, g["nbr"]))
        t = pd.DataFrame(
            {"node": g["node"].to_numpy(), "win": [o < n for o, n in zip(own_key, nbr_key)]}
        )
        agg = t.groupby("node", as_index=False, sort=False)["win"].all()
        return pd.DataFrame({"node": agg.loc[agg["win"], "node"]})

    for _ in range(max_rounds):
        if adj.count() == 0:
            break
        winners = sanitize_for_join(
            bucketed_reduce(
                adj, ["node"], _winners, MIS_SCHEMA, num_buckets=num_buckets
            ),
            MIS_SCHEMA,
        ).materialize()
        if winners.count() == 0:
            break
        # blocked this round = winners' neighbors
        blocked = sanitize_for_join(
            cogroup_join(
                adj,
                winners.map_batches(
                    lambda b: pa.table(
                        {"node": b["node"].combine_chunks().cast(pa.string())}
                    ),
                    batch_format="pyarrow",
                ),
                on=["node"],
                how="inner",
                left_schema=adj_schema,
                right_schema=MIS_SCHEMA,
                num_buckets=num_buckets,
            ).map_batches(
                lambda b: pd.DataFrame({"node": b["nbr"]}),
                batch_format="pandas",
            ),
            MIS_SCHEMA,
        ).materialize()
        blocked_parts.append(blocked)
        removed = blocked.union(winners).materialize()
        n_removed = removed.count()
        if n_removed <= removed_broadcast_max:
            rem = np.sort(
                pd.unique(removed.to_pandas()["node"].to_numpy()).astype(str)
            )
            rem_ref = _ray.put(rem)

            def _filter(b: pd.DataFrame) -> pd.DataFrame:
                if len(b) == 0:
                    return b
                r = _ray.get(rem_ref) if isinstance(rem_ref, _ray.ObjectRef) else rem_ref
                if len(r) == 0:
                    return b

                def _in(col):
                    v = b[col].to_numpy().astype(str)
                    idx = np.clip(np.searchsorted(r, v), 0, len(r) - 1)
                    return r[idx] == v

                return b[~_in("node") & ~_in("nbr")]

            adj = sanitize_for_join(
                adj.map_batches(_filter, batch_format="pandas"), adj_schema
            ).materialize()
        else:
            def _dd(b: pd.DataFrame) -> pd.DataFrame:
                return b.drop_duplicates("node") if len(b) else b

            removed_d = sanitize_for_join(
                bucketed_reduce(removed, ["node"], _dd, MIS_SCHEMA,
                                combiner=_dd, num_buckets=num_buckets),
                MIS_SCHEMA,
            )
            adj = sanitize_for_join(
                cogroup_join(
                    adj, removed_d, on=["node"], how="left_anti",
                    left_schema=adj_schema, right_schema=MIS_SCHEMA,
                    num_buckets=num_buckets,
                ),
                adj_schema,
            )
            adj = sanitize_for_join(
                cogroup_join(
                    adj.map_batches(
                        lambda b: pa.table(
                            {
                                "node": b["nbr"].combine_chunks().cast(pa.string()),
                                "nbr": b["node"].combine_chunks().cast(pa.string()),
                            }
                        ),
                        batch_format="pyarrow",
                    ),
                    removed_d,
                    on=["node"],
                    how="left_anti",
                    left_schema=adj_schema,
                    right_schema=MIS_SCHEMA,
                    num_buckets=num_buckets,
                ).map_batches(
                    lambda b: pa.table(
                        {
                            "node": b["nbr"].combine_chunks().cast(pa.string()),
                            "nbr": b["node"].combine_chunks().cast(pa.string()),
                        }
                    ),
                    batch_format="pyarrow",
                ),
                adj_schema,
            ).materialize()

    if adj.count() > 0:
        raise RuntimeError("maximal_independent_set: max_rounds exceeded")
    if not blocked_parts:
        return universe
    blocked_all = blocked_parts[0]
    for p in blocked_parts[1:]:
        blocked_all = blocked_all.union(p)

    def _dd_node(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates("node") if len(b) else b

    blocked_all = sanitize_for_join(
        bucketed_reduce(blocked_all, ["node"], _dd_node, MIS_SCHEMA,
                        combiner=_dd_node, num_buckets=num_buckets),
        MIS_SCHEMA,
    )
    return normalize_blocks(
        cogroup_join(
            universe, blocked_all, on=["node"], how="left_anti",
            left_schema=MIS_SCHEMA, right_schema=MIS_SCHEMA,
            num_buckets=num_buckets,
        ),
        MIS_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Densest subgraph (batched greedy 2(1+eps)-approximation)
# ---------------------------------------------------------------------------

DENSEST_SCHEMA = pa.schema([("node", pa.string())])


def densest_subgraph_local(
    und: pd.DataFrame, *, eps_milli: int = 100
) -> tuple[list[str], int, int]:
    """Driver twin of the batched-peel densest-subgraph approximation
    (Bahmani et al., VLDB'12): repeatedly delete every node whose
    degree is <= 2*(1+eps)*m/n (integer compare: deg * n * 1000 <=
    2 * (1000 + eps_milli) * m), remembering the densest intermediate
    subgraph (density compared exactly: m1*n2 vs m2*n1). Returns
    (nodes, m_best, n_best)."""
    edges = {tuple(e) for e in zip(und["a"].astype(str), und["b"].astype(str))}
    cur_edges = {(a, b) for a, b in edges if a != b}
    best: tuple[int, int, set] = (0, 1, set())  # (m, n, nodes)
    while cur_edges:
        # each round is defined over nodes INCIDENT to remaining edges
        # (0-degree stragglers only lower density and the distributed
        # path never sees them — both paths must agree)
        deg: dict[str, int] = {}
        for a, b in cur_edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        m, n = len(cur_edges), len(deg)
        if m * best[1] > best[0] * n:
            best = (m, n, set(deg))
        keep = {v for v, d in deg.items()
                if d * n * 1000 > 2 * (1000 + eps_milli) * m}
        nxt = {(a, b) for a, b in cur_edges if a in keep and b in keep}
        if nxt == cur_edges:  # cannot happen (avg-degree bound) — guard
            break
        cur_edges = nxt
    m, n, nodes = best
    return sorted(nodes), m, max(n, 1)


def densest_subgraph(
    edges: ray.data.Dataset,
    *,
    eps_milli: int = 100,
    driver_max_edges: int = 2_000_000,
    max_rounds: int = 200,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Node set of a 2(1+eps)-approximate densest subgraph over an
    ``(src, dst)`` edge table — the community-core extractor (spam
    cliques, mutual-link farms, over-represented template clusters)
    that exact max-density LP cannot touch at scale. Batched greedy
    peel: each round removes EVERY node under the 2(1+eps)*avg-degree
    bar at once, so rounds are O(log n) for any eps > 0; the densest
    intermediate snapshot wins (exact integer cross-multiplied
    density compare). Deterministic at any layout. Rows-only (the
    iterative peel is not SQL-expressible); planted-clique recovery,
    approximation bound, and forced-gate equality pinned in pytest.

    COUNT-GATED: under ``driver_max_edges`` the collected twin runs;
    over it, each round is one degree reduce + one broadcast/semi-join
    filter, and only (m, n) counters leave the cluster per round —
    the winning round is REPLAYED to materialize its node set."""
    und = sanitize_for_join(
        undirected_simple_edges(edges, num_buckets=num_buckets), UND_SCHEMA
    ).materialize()
    if und.count() == 0:
        return ray.data.from_arrow(DENSEST_SCHEMA.empty_table())
    if und.count() <= driver_max_edges:
        nodes, _m, _n = densest_subgraph_local(
            und.to_pandas(), eps_milli=eps_milli
        )
        return ray.data.from_arrow(
            pa.table({"node": pa.array(nodes, pa.string())})
        )

    import ray as _ray

    def _run(stop_round: int | None):
        """Peel forward; return per-round (m, n) history, and the node
        set at round ``stop_round`` when asked (replay)."""
        cur = und
        history: list[tuple[int, int]] = []
        for rnd in range(max_rounds):
            m = cur.count()
            if m == 0:
                break
            deg_rows = cur.map_batches(
                lambda b: pa.table(
                    {
                        "node": pa.concat_arrays(
                            [
                                b["a"].combine_chunks().cast(pa.string()),
                                b["b"].combine_chunks().cast(pa.string()),
                            ]
                        ),
                        "one": pa.array([1] * (2 * len(b)), pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            degs = sanitize_for_join(
                grouped_sums(deg_rows, ["node"], {"deg": "one"}),
                pa.schema([("node", pa.string()), ("deg", pa.int64())]),
            ).materialize()
            n = degs.count()
            history.append((m, n))
            if stop_round is not None and rnd == stop_round:
                return history, degs.map_batches(
                    lambda b: pa.table(
                        {"node": b["node"].combine_chunks().cast(pa.string())}
                    ),
                    batch_format="pyarrow",
                )
            thresh_num = 2 * (1000 + eps_milli) * m
            keep = sanitize_for_join(
                degs.map_batches(
                    lambda b, _n=n, _t=thresh_num: pd.DataFrame(
                        {
                            "node": b.loc[
                                b["deg"].to_numpy() * _n * 1000 > _t, "node"
                            ]
                        }
                    )
                    if len(b)
                    else pd.DataFrame({"node": pd.Series(dtype="object")}),
                    batch_format="pandas",
                ),
                DENSEST_SCHEMA,
            ).materialize()
            adj_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
            for col in ("a", "b"):
                cur = sanitize_for_join(
                    cogroup_join(
                        cur.map_batches(
                            lambda b, _c=col: pa.table(
                                {
                                    "node": b[_c].combine_chunks().cast(pa.string()),
                                    "other": b["b" if _c == "a" else "a"]
                                    .combine_chunks()
                                    .cast(pa.string()),
                                }
                            ),
                            batch_format="pyarrow",
                        ),
                        keep,
                        on=["node"],
                        how="left_semi",
                        left_schema=pa.schema(
                            [("node", pa.string()), ("other", pa.string())]
                        ),
                        right_schema=DENSEST_SCHEMA,
                        num_buckets=num_buckets,
                    ).map_batches(
                        lambda b, _c=col: pa.table(
                            {
                                "a": (b["node"] if _c == "a" else b["other"])
                                .combine_chunks()
                                .cast(pa.string()),
                                "b": (b["other"] if _c == "a" else b["node"])
                                .combine_chunks()
                                .cast(pa.string()),
                            }
                        ),
                        batch_format="pyarrow",
                    ),
                    adj_schema,
                ).materialize()
        return history, None

    history, _ = _run(None)
    if not history:
        return ray.data.from_arrow(DENSEST_SCHEMA.empty_table())
    best_round = max(
        range(len(history)),
        key=lambda i: (history[i][0] / max(history[i][1], 1), -i),
    )
    _, nodes = _run(best_round)
    return normalize_blocks(nodes, DENSEST_SCHEMA)


# ---------------------------------------------------------------------------
# Bow-tie decomposition of a directed graph (pivot-based)
# ---------------------------------------------------------------------------

BOWTIE_SCHEMA = pa.schema([("node", pa.string()), ("region", pa.string())])


def _bowtie_pivot(edge_list: list[tuple[str, str]]) -> str:
    """Deterministic pivot: max min(indeg, outdeg) WITH EDGE
    MULTIPLICITY (what the distributed degree reduce counts), tie ->
    lexicographic min node. A node with both heavy in- and out-degree
    is in the giant SCC of every bow-tie-shaped graph."""
    from collections import Counter

    outc = Counter(str(s) for s, _ in edge_list)
    inc = Counter(str(d) for _, d in edge_list)
    nodes = set(outc) | set(inc)
    return min(nodes, key=lambda n: (-min(inc[n], outc[n]), n))


def bowtie_local(edge_list: list[tuple[str, str]]) -> pd.DataFrame:
    """Driver twin: pivot selection + forward/backward BFS in Python,
    regions = core (fwd ∩ bwd), out (fwd \\ core), in (bwd \\ core),
    other."""
    fwd_adj: dict[str, set] = {}
    bwd_adj: dict[str, set] = {}
    for s, d in edge_list:
        fwd_adj.setdefault(str(s), set()).add(str(d))
        bwd_adj.setdefault(str(d), set()).add(str(s))
    nodes = set(fwd_adj) | set(bwd_adj)
    if not nodes:
        return BOWTIE_SCHEMA.empty_table().to_pandas()
    pivot = _bowtie_pivot(edge_list)

    def _reach(adj):
        seen = {pivot}
        frontier = [pivot]
        while frontier:
            nxt = []
            for v in frontier:
                for u in adj.get(v, ()):
                    if u not in seen:
                        seen.add(u)
                        nxt.append(u)
            frontier = nxt
        return seen

    fwd, bwd = _reach(fwd_adj), _reach(bwd_adj)
    core = fwd & bwd
    rows = []
    for n in sorted(nodes):
        if n in core:
            r = "core"
        elif n in fwd:
            r = "out"
        elif n in bwd:
            r = "in"
        else:
            r = "other"
        rows.append((n, r))
    return pd.DataFrame({"node": [r[0] for r in rows],
                         "region": [r[1] for r in rows]})


def reachable_set(
    adj: ray.data.Dataset,
    seeds: list[str],
    *,
    max_rounds: int = 100,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """All nodes reachable from the seed SET over ``(node, nbr)``
    adjacency (seeds included) — unlabeled set-BFS: the frontier is a
    plain node set (no per-source label, unlike multi_source_hops), so
    each round is one cogroup join + one marker-row dedup reduce and
    frontier volume is bounded by the vertex set."""
    node_schema = pa.schema([("node", pa.string())])
    row_schema = pa.schema([("node", pa.string()), ("is_new", pa.int64())])
    seed_tbl = pa.table({"node": pa.array(sorted(set(seeds)), pa.string())})
    visited = sanitize_for_join(
        ray.data.from_arrow(seed_tbl), node_schema
    ).materialize()
    frontier = visited

    def _new_only(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"node": pd.Series(dtype="object")})
        agg = g.groupby("node", as_index=False, sort=False)["is_new"].min()
        return pd.DataFrame({"node": agg.loc[agg["is_new"] == 1, "node"]})

    for _ in range(max_rounds):
        candidates = cogroup_join(
            frontier,
            adj,
            on=["node"],
            how="inner",
            left_schema=node_schema,
            right_schema=pa.schema([("node", pa.string()), ("nbr", pa.string())]),
            num_buckets=num_buckets,
        ).map_batches(
            lambda b: pd.DataFrame(
                {"node": b["nbr"], "is_new": np.ones(len(b), dtype=np.int64)}
            ),
            batch_format="pandas",
        )
        marked = visited.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"].combine_chunks().cast(pa.string()),
                    "is_new": pa.array([0] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        new = sanitize_for_join(
            bucketed_reduce(
                candidates.union(marked), ["node"], _new_only, node_schema,
                num_buckets=num_buckets,
            ),
            node_schema,
        ).materialize()
        if new.count() == 0:
            return visited
        visited = visited.union(new).materialize()
        frontier = new
    raise RuntimeError("reachable_set: max_rounds exceeded")


def bowtie_regions(
    edges: ray.data.Dataset,
    *,
    driver_max_edges: int = 2_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """``(node, region)`` bow-tie decomposition of a directed graph
    (Broder et al., WWW'00): core = the pivot's strongly connected
    component (forward ∩ backward reachability of one deterministic
    pivot — max min(indeg, outdeg), tie lexicographic min), out =
    forward-only, in = backward-only, other = the rest. EXACT when
    the pivot lies in the giant SCC (true for every bow-tie-shaped
    graph; degenerate graphs just get that pivot's own SCC as core).
    SQL-oracle-exact via two recursive-CTE reachability closures from
    the same pivot rule.

    COUNT-GATED: the Python twin under ``driver_max_edges``; over the
    gate, pivot selection is two degree reduces + a one-row argmin
    residue, and each region is one unlabeled set-BFS
    (:func:`reachable_set`) — never the quadratic all-pairs
    co-reachability of :func:`scc_labels`."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.count() <= driver_max_edges:
        df = edges.to_pandas()
        pairs = (
            [] if df.empty or "src" not in df.columns
            else list(zip(df["src"], df["dst"]))
        )
        return ray.data.from_arrow(
            pa_from_pandas(bowtie_local(pairs), BOWTIE_SCHEMA)
        )

    adj_schema = pa.schema([("node", pa.string()), ("nbr", pa.string())])

    def _dir(src_col: str, dst_col: str) -> ray.data.Dataset:
        return sanitize_for_join(
            edges.map_batches(
                lambda b, _s=src_col, _d=dst_col: pa.table(
                    {
                        "node": b[_s].combine_chunks().cast(pa.string()),
                        "nbr": b[_d].combine_chunks().cast(pa.string()),
                    }
                ),
                batch_format="pyarrow",
            ),
            adj_schema,
        ).materialize()

    fwd_adj, bwd_adj = _dir("src", "dst"), _dir("dst", "src")

    # pivot: strength = min(indeg, outdeg) over DISTINCT neighbors
    def _deg(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype="object"), "d": pd.Series(dtype="int64")}
            )
        if "nbr" in b.columns:
            b = pd.DataFrame(
                {"node": b["node"].to_numpy(), "d": np.ones(len(b), dtype=np.int64)}
            )
        return b.groupby("node", as_index=False, sort=False)["d"].sum()

    deg_schema = pa.schema([("node", pa.string()), ("d", pa.int64())])
    outd = bucketed_reduce(fwd_adj, ["node"], _deg, deg_schema)
    ind = bucketed_reduce(bwd_adj, ["node"], _deg, deg_schema)
    strengths = cogroup_join(
        sanitize_for_join(outd, deg_schema).map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "od": b["d"].astype("int64")}),
            batch_format="pandas",
        ),
        sanitize_for_join(ind, deg_schema).map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "idg": b["d"].astype("int64")}),
            batch_format="pandas",
        ),
        on=["node"],
        how="full_outer",
        left_schema=pa.schema([("node", pa.string()), ("od", pa.int64())]),
        right_schema=pa.schema([("node", pa.string()), ("idg", pa.int64())]),
        num_buckets=num_buckets,
    )
    best = strengths.map_batches(
        lambda b: pd.DataFrame(
            {
                "node": b["node"],
                "s": np.minimum(
                    b["od"].fillna(0).astype("int64"),
                    b["idg"].fillna(0).astype("int64"),
                ),
            }
        )
        .sort_values(["s", "node"], ascending=[False, True], kind="stable")
        .head(1)
        if len(b)
        else pd.DataFrame(
            {"node": pd.Series(dtype="object"), "s": pd.Series(dtype="int64")}
        ),
        batch_format="pandas",
        batch_size=None,
    ).to_pandas()
    best = best.sort_values(["s", "node"], ascending=[False, True], kind="stable")
    pivot = str(best["node"].iloc[0])

    fwd = reachable_set(fwd_adj, [pivot], num_buckets=num_buckets)
    bwd = reachable_set(bwd_adj, [pivot], num_buckets=num_buckets)

    node_schema = pa.schema([("node", pa.string())])
    universe = sanitize_for_join(
        bucketed_reduce(
            fwd_adj.union(
                bwd_adj.map_batches(
                    lambda b: pa.table({"node": b["node"], "nbr": b["nbr"]}),
                    batch_format="pyarrow",
                )
            ).map_batches(
                lambda b: pa.table({"node": b["node"].combine_chunks()}),
                batch_format="pyarrow",
            ),
            ["node"],
            lambda b: b.drop_duplicates("node") if len(b) else b,
            node_schema,
            combiner=lambda b: b.drop_duplicates("node") if len(b) else b,
            num_buckets=num_buckets,
        ),
        node_schema,
    )

    # region assembly: marker rows (node, bit) where bit 1 = in fwd,
    # 2 = in bwd; one reduce classifies every node
    def _mark(ds: ray.data.Dataset, bit: int) -> ray.data.Dataset:
        return ds.map_batches(
            lambda b, _bit=bit: pa.table(
                {
                    "node": b["node"].combine_chunks().cast(pa.string()),
                    "bit": pa.array([_bit] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    def _classify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return BOWTIE_SCHEMA.empty_table().to_pandas()
        agg = g.groupby("node", as_index=False, sort=False)["bit"].sum()
        mask = agg["bit"].to_numpy()
        region = np.where(
            mask & 1,
            np.where(mask & 2, "core", "out"),
            np.where(mask & 2, "in", "other"),
        )
        return pd.DataFrame({"node": agg["node"], "region": region})

    marked = _mark(universe, 0).union(_mark(fwd, 1)).union(_mark(bwd, 2))
    return normalize_blocks(
        bucketed_reduce(
            marked, ["node"], _classify, BOWTIE_SCHEMA, num_buckets=num_buckets
        ),
        BOWTIE_SCHEMA,
    )


RECIP_SCHEMA = pa.schema(
    [
        ("n_edges", pa.int64()),
        ("n_reciprocal", pa.int64()),
        ("reciprocity_milli", pa.int64()),
    ]
)


def reciprocity(
    edges: ray.data.Dataset,
    *,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """One-row directed-graph reciprocity: the fraction (integer
    permille) of distinct non-self-loop directed edges whose reverse
    edge also exists — the mutual-linking signal that separates
    social/link-exchange graphs from citation-like DAGs. One bucketed
    exchange keyed on the CANONICAL pair (min, max): each group holds
    both directions of at most one pair, so presence/reciprocity is a
    two-bit test; the residue is one partial row per reduce block."""

    def _pairs(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="object"),
                    "b": pd.Series(dtype="object"),
                    "bit": pd.Series(dtype="int64"),
                }
            )
        if "bit" in b.columns:
            return b.drop_duplicates()
        s = b["src"].astype(str).to_numpy()
        d = b["dst"].astype(str).to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        bit = np.where(s < d, 1, 2).astype(np.int64)
        return pd.DataFrame({"a": lo, "b": hi, "bit": bit}).drop_duplicates()

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"n_edges": pd.Series(dtype="int64"),
                 "n_recip": pd.Series(dtype="int64")}
            )
        # bits are distinct per (a, b) after dedup, so SUM == OR
        agg = g.drop_duplicates().groupby(["a", "b"], sort=False)["bit"].sum()
        m = agg.to_numpy()
        n_dir = int((m == 1).sum() + (m == 2).sum() + 2 * (m == 3).sum())
        n_rec = int(2 * (m == 3).sum())
        return pd.DataFrame({"n_edges": [n_dir], "n_recip": [n_rec]})

    from .infer import bucketed_reduce

    parts = bucketed_reduce(
        edges.select_columns(["src", "dst"]).map_batches(
            _pairs, batch_format="pandas"
        ),
        ["a", "b"],
        _count,
        pa.schema([("n_edges", pa.int64()), ("n_recip", pa.int64())]),
        combiner=_pairs,
        num_buckets=num_buckets,
    ).to_pandas()
    n_edges = int(parts["n_edges"].sum()) if len(parts) else 0
    n_rec = int(parts["n_recip"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "n_edges": pd.Series([n_edges], dtype="int64"),
            "n_reciprocal": pd.Series([n_rec], dtype="int64"),
            "reciprocity_milli": pd.Series(
                [(n_rec * 1000) // n_edges if n_edges else 0], dtype="int64"
            ),
        }
    )


# ---------------------------------------------------------------------------
# Directed triangle motif census (cyclic vs transitive)
# ---------------------------------------------------------------------------

MOTIF_SCHEMA = pa.schema(
    [
        ("n_triangles", pa.int64()),
        ("n_cyclic", pa.int64()),
        ("n_transitive", pa.int64()),
    ]
)


def _census_from_dirs(du_x, du_y, dx_y) -> np.ndarray:
    """True where the triangle (apex u, pair x, y) is CYCLIC given
    dir bits (1 = first→second). A directed triangle is cyclic iff
    every corner has out-degree exactly 1 inside it."""
    out_u = du_x + du_y
    out_x = (1 - du_x) + dx_y
    out_y = (1 - du_y) + (1 - dx_y)
    return (out_u == 1) & (out_x == 1) & (out_y == 1)


def directed_triangle_census_local(
    edge_list: list[tuple[str, str]]
) -> pd.DataFrame:
    """Driver twin: one-way canonical pairs, brute triangle scan,
    cyclic/transitive classification."""
    seen: dict[tuple[str, str], int] = {}
    for s, d in edge_list:
        s, d = str(s), str(d)
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        bit = 1 if s < d else 2
        seen[(a, b)] = seen.get((a, b), 0) | bit
    pairs = {k: v for k, v in seen.items() if v in (1, 2)}
    adj: dict[str, set] = {}
    for (a, b) in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = cyc = 0
    nodes = sorted(adj)
    for a in nodes:
        for b in sorted(adj[a]):
            if b <= a:
                continue
            for c in sorted(adj[a] & adj[b]):
                if c <= b:
                    continue
                tri += 1
                dab = 1 if pairs[(a, b)] == 1 else 0
                dac = 1 if pairs[(a, c)] == 1 else 0
                dbc = 1 if pairs[(b, c)] == 1 else 0
                if _census_from_dirs(
                    np.array([dab]), np.array([dac]), np.array([dbc])
                )[0]:
                    cyc += 1
    return pd.DataFrame(
        {
            "n_triangles": pd.Series([tri], dtype="int64"),
            "n_cyclic": pd.Series([cyc], dtype="int64"),
            "n_transitive": pd.Series([tri - cyc], dtype="int64"),
        }
    )


def directed_triangle_census(
    edges: ray.data.Dataset,
    *,
    driver_max_edges: int = 2_000_000,
    max_wedges_per_node: int = 2_000_000,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """One-row census of directed triangles over ONE-WAY pairs
    (reciprocal pairs and self-loops excluded — the classic simple
    subset of the 16-triad census): how many are CYCLIC (feedback
    loops) vs TRANSITIVE (hierarchy) — the motif signature separating
    flow/hierarchy graphs from circulation graphs. Direction bits ride
    the degree-ordered orientation plan of :func:`triangle_counts`
    (wedge work O(m^1.5) under skew, per-node wedge cap as the skew
    defense); the classification is a vectorized out-degree test at
    the closing join. SQL-oracle-exact (min-corner directed triple
    joins)."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.count() <= driver_max_edges:
        df = edges.to_pandas()
        pairs = (
            [] if df.empty or "src" not in df.columns
            else list(zip(df["src"], df["dst"]))
        )
        return directed_triangle_census_local(pairs)

    # one-way canonical pairs with a direction bit
    pair_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("dir", pa.int64())]
    )

    def _canon(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="object"),
                    "b": pd.Series(dtype="object"),
                    "bit": pd.Series(dtype="int64"),
                }
            )
        if "bit" in b.columns:
            return b.drop_duplicates()
        s = b["src"].astype(str).to_numpy()
        d = b["dst"].astype(str).to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pd.DataFrame(
            {
                "a": np.minimum(s, d),
                "b": np.maximum(s, d),
                "bit": np.where(s < d, 1, 2).astype(np.int64),
            }
        ).drop_duplicates()

    def _oneway(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="object"),
                    "b": pd.Series(dtype="object"),
                    "dir": pd.Series(dtype="int64"),
                }
            )
        agg = g.drop_duplicates().groupby(["a", "b"], as_index=False, sort=False)[
            "bit"
        ].sum()  # distinct bits per pair -> SUM == OR
        agg = agg[agg["bit"].isin([1, 2])]
        return pd.DataFrame(
            {
                "a": agg["a"],
                "b": agg["b"],
                "dir": (agg["bit"] == 1).astype(np.int64),
            }
        )

    pairs = sanitize_for_join(
        bucketed_reduce(
            edges.map_batches(_canon, batch_format="pandas"),
            ["a", "b"],
            _oneway,
            pair_schema,
            combiner=_canon,
            num_buckets=num_buckets,
        ),
        pair_schema,
    ).materialize()

    # degrees over the one-way pair graph
    deg_rows = pairs.map_batches(
        lambda b: pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        b["a"].combine_chunks().cast(pa.string()),
                        b["b"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "one": pa.array([1] * (2 * len(b)), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    degs = sanitize_for_join(
        grouped_sums(deg_rows, ["node"], {"deg": "one"}),
        pa.schema([("node", pa.string()), ("deg", pa.int64())]),
    )

    # orient each pair from lower (deg, node) to higher; dir_uv = 1
    # iff the actual edge goes u -> v
    j1 = cogroup_join(
        pairs,
        degs.map_batches(
            lambda b: pa.table(
                {"a": b["node"].combine_chunks().cast(pa.string()),
                 "deg_a": b["deg"].combine_chunks().cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        on=["a"],
        how="inner",
        left_schema=pair_schema,
        right_schema=pa.schema([("a", pa.string()), ("deg_a", pa.int64())]),
        num_buckets=num_buckets,
    )
    j2 = cogroup_join(
        sanitize_for_join(
            j1,
            pa.schema(
                [("a", pa.string()), ("b", pa.string()), ("dir", pa.int64()),
                 ("deg_a", pa.int64())]
            ),
        ),
        degs.map_batches(
            lambda b: pa.table(
                {"b": b["node"].combine_chunks().cast(pa.string()),
                 "deg_b": b["deg"].combine_chunks().cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        on=["b"],
        how="inner",
        left_schema=pa.schema(
            [("a", pa.string()), ("b", pa.string()), ("dir", pa.int64()),
             ("deg_a", pa.int64())]
        ),
        right_schema=pa.schema([("b", pa.string()), ("deg_b", pa.int64())]),
        num_buckets=num_buckets,
    )

    oriented_schema = pa.schema(
        [("u", pa.string()), ("v", pa.string()), ("deg_v", pa.int64()),
         ("duv", pa.int64())]
    )

    def _orient(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"u": pd.Series(dtype="object"), "v": pd.Series(dtype="object"),
                 "deg_v": pd.Series(dtype="int64"),
                 "duv": pd.Series(dtype="int64")}
            )
        a = b["a"].to_numpy(object)
        bb = b["b"].to_numpy(object)
        da = b["deg_a"].to_numpy().astype(np.int64)
        db = b["deg_b"].to_numpy().astype(np.int64)
        d = b["dir"].to_numpy().astype(np.int64)
        a_first = (da < db) | ((da == db) & (a < bb))
        u = np.where(a_first, a, bb)
        v = np.where(a_first, bb, a)
        deg_v = np.where(a_first, db, da)
        duv = np.where(a_first, d, 1 - d)
        return pd.DataFrame({"u": u, "v": v, "deg_v": deg_v, "duv": duv})

    oriented = sanitize_for_join(
        j2.map_batches(_orient, batch_format="pandas"), oriented_schema
    ).materialize()

    wedge_schema = pa.schema(
        [("x", pa.string()), ("y", pa.string()), ("dux", pa.int64()),
         ("duy", pa.int64())]
    )

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _pair_indices_by_size

        g = g.sort_values(["u", "deg_v", "v"], kind="stable")
        codes = g["u"].to_numpy(object)
        i, j = _pair_indices_by_size(codes, max_wedges_per_node)
        v = g["v"].to_numpy(object)
        duv = g["duv"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"x": v[i], "y": v[j], "dux": duv[i], "duy": duv[j]}
        )

    wedges = bucketed_reduce(
        oriented, ["u"], _wedges, wedge_schema, num_buckets=num_buckets
    )

    edge_marker = oriented.map_batches(
        lambda b: pd.DataFrame(
            {
                "x": b["u"].to_numpy(object) if len(b) else pd.Series([], dtype=object),
                "y": b["v"].to_numpy(object) if len(b) else pd.Series([], dtype=object),
                "dux": pd.Series([-1] * len(b), dtype="int64"),
                "duy": b["duv"].to_numpy().astype(np.int64)
                if len(b)
                else pd.Series([], dtype="int64"),
            }
        ),
        batch_format="pandas",
    )

    part_schema = pa.schema([("n_tri", pa.int64()), ("n_cyc", pa.int64())])

    def _close(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["dux"] == -1
        closed = g[~is_edge].merge(
            g.loc[is_edge, ["x", "y", "duy"]]
            .drop_duplicates(["x", "y"])
            .rename(columns={"duy": "dxy"}),
            on=["x", "y"],
            how="inner",
        )
        if len(closed) == 0:
            return pd.DataFrame(
                {"n_tri": pd.Series(dtype="int64"),
                 "n_cyc": pd.Series(dtype="int64")}
            )
        cyc = _census_from_dirs(
            closed["dux"].to_numpy(np.int64),
            closed["duy"].to_numpy(np.int64),
            closed["dxy"].to_numpy(np.int64),
        )
        return pd.DataFrame(
            {"n_tri": [int(len(closed))], "n_cyc": [int(cyc.sum())]}
        )

    parts = bucketed_reduce(
        wedges.union(edge_marker), ["x", "y"], _close, part_schema,
        num_buckets=num_buckets,
    ).to_pandas()
    tri = int(parts["n_tri"].sum()) if len(parts) else 0
    cyc = int(parts["n_cyc"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "n_triangles": pd.Series([tri], dtype="int64"),
            "n_cyclic": pd.Series([cyc], dtype="int64"),
            "n_transitive": pd.Series([tri - cyc], dtype="int64"),
        }
    )


MODULARITY_SCHEMA = pa.schema(
    [
        ("n_edges", pa.int64()),
        ("n_communities", pa.int64()),
        ("q_num", pa.int64()),
        ("q_den", pa.int64()),
    ]
)


def modularity_report(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset,
    *,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Newman modularity of a node partition as an EXACT RATIONAL —
    ``Q = q_num / q_den`` with ``q_num = Σ_c (4m*e_c - d_c²)`` and
    ``q_den = 4m²`` — the quality score that makes community outputs
    comparable across runs (floats never hash-match; the rational
    does). ``edges`` is an undirected multigraph as ``(src, dst)``
    rows (each row one edge); ``labels`` is ``(node, community)``;
    unlabeled endpoints form their own singleton community named by
    the node.

    Two cogroup joins tag each edge's endpoint communities; one
    grouped sum yields per-community (within-edges, degree) rows —
    a residue bounded by the community count, collected and finished
    in PYTHON INTS (d_c² overflows int64 exactly when the graph is
    huge, so the final arithmetic is arbitrary-precision — the
    grouped-OLS discipline)."""
    from .relational import cogroup_join, grouped_sums

    tagged = edges.select_columns(["src", "dst"])
    lbl_schema = pa.schema([("node", pa.string()), ("community", pa.string())])
    labels = sanitize_for_join(
        labels.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"].combine_chunks().cast(pa.string()),
                    "community": b["community"].combine_chunks().cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        ),
        lbl_schema,
    )

    j1 = cogroup_join(
        sanitize_for_join(
            tagged.map_batches(
                lambda b: pd.DataFrame({"node": b["src"], "dst": b["dst"]}),
                batch_format="pandas",
            ),
            pa.schema([("node", pa.string()), ("dst", pa.string())]),
        ),
        labels,
        on=["node"],
        how="left_outer",
        left_schema=pa.schema([("node", pa.string()), ("dst", pa.string())]),
        right_schema=lbl_schema,
        num_buckets=num_buckets,
    ).map_batches(
        lambda b: pd.DataFrame(
            {"node": b["dst"], "c_src": b["community"].fillna(b["node"])}
        )
        if len(b)
        else pd.DataFrame(
            {"node": pd.Series(dtype="object"),
             "c_src": pd.Series(dtype="object")}
        ),
        batch_format="pandas",
    )
    both = cogroup_join(
        sanitize_for_join(
            j1,
            pa.schema([("node", pa.string()), ("c_src", pa.string())]),
        ),
        labels,
        on=["node"],
        how="left_outer",
        left_schema=pa.schema(
            [("node", pa.string()), ("c_src", pa.string())]
        ),
        right_schema=lbl_schema,
        num_buckets=num_buckets,
    ).map_batches(
        lambda b: pd.DataFrame(
            {"c_src": b["c_src"], "c_dst": b["community"].fillna(b["node"])}
        )
        if len(b)
        else pd.DataFrame(
            {"c_src": pd.Series(dtype="object"),
             "c_dst": pd.Series(dtype="object")}
        ),
        batch_format="pandas",
    )

    # per-community degree and within-edge partial rows
    def _cells(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"community": pd.Series(dtype="object"),
                 "deg": pd.Series(dtype="int64"),
                 "within": pd.Series(dtype="int64")}
            )
        deg = pd.concat(
            [
                pd.DataFrame({"community": b["c_src"],
                              "deg": np.ones(len(b), dtype=np.int64),
                              "within": np.zeros(len(b), dtype=np.int64)}),
                pd.DataFrame({"community": b["c_dst"],
                              "deg": np.ones(len(b), dtype=np.int64),
                              "within": np.zeros(len(b), dtype=np.int64)}),
                pd.DataFrame(
                    {
                        "community": b["c_src"],
                        "deg": np.zeros(len(b), dtype=np.int64),
                        "within": (b["c_src"].to_numpy() == b["c_dst"].to_numpy())
                        .astype(np.int64),
                    }
                ),
            ],
            ignore_index=True,
        )
        return deg.groupby("community", as_index=False, sort=False).sum()

    per_comm = grouped_sums(
        both.map_batches(_cells, batch_format="pandas"),
        ["community"],
        {"deg": "deg", "within": "within"},
    ).to_pandas()

    m = int(per_comm["deg"].sum()) // 2 if len(per_comm) else 0
    if m == 0:
        return pd.DataFrame(
            {
                "n_edges": pd.Series([0], dtype="int64"),
                "n_communities": pd.Series([0], dtype="int64"),
                "q_num": pd.Series([0], dtype="int64"),
                "q_den": pd.Series([0], dtype="int64"),
            }
        )
    q_num = 0
    for _, row in per_comm.iterrows():
        q_num += 4 * m * int(row["within"]) - int(row["deg"]) ** 2
    q_den = 4 * m * m
    # q_num/q_den may exceed int64 at extreme scale; clamp-report is a
    # caller decision — here the sandbox ints always fit
    return pd.DataFrame(
        {
            "n_edges": pd.Series([m], dtype="int64"),
            "n_communities": pd.Series([len(per_comm)], dtype="int64"),
            "q_num": pd.Series([q_num], dtype="int64"),
            "q_den": pd.Series([q_den], dtype="int64"),
        }
    )


# ---------------------------------------------------------------------------
# Greedy graph coloring (Jones-Plassmann with the derandomized-Luby order)
# ---------------------------------------------------------------------------

COLOR_SCHEMA = pa.schema([("node", pa.string()), ("color", pa.int64())])


def coloring_local(und: pd.DataFrame) -> pd.DataFrame:
    """Sequential greedy coloring in ``(rank, node)`` order: each node
    takes the smallest color unused by its already-colored (= lower
    key) neighbors. The shared driver twin of :func:`greedy_coloring`
    — the distributed rounds compute EXACTLY this assignment."""
    if und.empty:
        return pd.DataFrame(
            {"node": pd.Series(dtype="object"), "color": pd.Series(dtype="int64")}
        )
    nodes = pd.Series(
        pd.unique(pd.concat([und["a"], und["b"]], ignore_index=True))
    )
    ranks = dict(zip(nodes, _node_rank(nodes)))
    adj: dict[str, set[str]] = {}
    for a, b in zip(und["a"], und["b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    colors: dict[str, int] = {}
    for v in sorted(nodes, key=lambda n: (ranks[n], n)):
        used = {colors[u] for u in adj.get(v, ()) if u in colors}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    out = pd.DataFrame(
        {"node": list(colors.keys()), "color": list(colors.values())}
    )
    out["color"] = out["color"].astype("int64")
    return out.sort_values("node", kind="stable").reset_index(drop=True)


def greedy_coloring(
    edges: ray.data.Dataset,
    *,
    driver_max_edges: int = 2_000_000,
    max_rounds: int = 200,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Deterministic greedy graph coloring over an ``(src, dst)`` edge
    table — Jones-Plassmann on the splitmix64 ``(rank, node)`` total
    order: a node colors as soon as ALL its lower-key neighbors are
    colored, taking the mex of their colors. With a fixed order the
    parallel rounds equal the sequential greedy of that order (pinned
    vs :func:`coloring_local`), layout-independent, rounds bounded by
    the longest decreasing-rank path (O(log n) expected). The classic
    use is conflict-free scheduling: co-update batches for entities
    sharing an edge, register allocation over interference graphs.

    Rows-only (greedy coloring is not SQL-expressible); properness +
    gate equivalence pinned in pytest. COUNT-GATED like
    :func:`maximal_independent_set`: small edge lists run the twin;
    over the gate each round is one cogroup-style attach reduce
    (current colors onto the static lower-adjacency) and one decide
    reduce — two exchanges per round, state rides as marker rows, no
    driver residue beyond the per-round uncolored count."""
    und = sanitize_for_join(
        undirected_simple_edges(edges, num_buckets=num_buckets), UND_SCHEMA
    ).materialize()
    n_edges = und.count()
    if n_edges == 0:
        return ray.data.from_arrow(COLOR_SCHEMA.empty_table())
    if n_edges <= driver_max_edges:
        return ray.data.from_arrow(
            pa_from_pandas(coloring_local(und.to_pandas()), COLOR_SCHEMA)
        )

    # static lower-adjacency: (node, nbr) with key(nbr) < key(node);
    # ranks are pure functions of the node string — no rank join
    def _lower(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype="object"), "nbr": pd.Series(dtype="object")}
            )
        node = pd.concat([b["a"], b["b"]], ignore_index=True)
        nbr = pd.concat([b["b"], b["a"]], ignore_index=True)
        rn, rb = _node_rank(node), _node_rank(nbr)
        keep = (rb < rn) | ((rb == rn) & (nbr.to_numpy() < node.to_numpy()))
        return pd.DataFrame({"node": node[keep], "nbr": nbr[keep]})

    adj_schema = pa.schema([("node", pa.string()), ("nbr", pa.string())])
    adj = sanitize_for_join(
        und.map_batches(_lower, batch_format="pandas"), adj_schema
    ).materialize()

    universe = sanitize_for_join(
        bucketed_reduce(
            und.map_batches(
                lambda b: pd.DataFrame(
                    {"node": pd.concat([b["a"], b["b"]], ignore_index=True)}
                ),
                batch_format="pandas",
            ),
            ["node"],
            lambda g: g.drop_duplicates("node"),
            pa.schema([("node", pa.string())]),
            combiner=lambda b: b.drop_duplicates("node") if len(b) else b,
            num_buckets=num_buckets,
        ),
        pa.schema([("node", pa.string())]),
    )

    state = sanitize_for_join(
        universe.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"], "color": np.full(len(b), -1, dtype=np.int64)}
            ),
            batch_format="pandas",
        ),
        COLOR_SCHEMA,
    ).materialize()

    att_schema = pa.schema([("node", pa.string()), ("c", pa.int64())])

    def _attach(g: pd.DataFrame) -> pd.DataFrame:
        st = g[g["kind"] == 1]
        ad = g[g["kind"] == 0]
        if len(ad) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype="object"), "c": pd.Series(dtype="int64")}
            )
        m = ad[["node", "key"]].merge(
            st[["key", "color"]], on="key", how="left"
        )
        return pd.DataFrame(
            {
                "node": m["node"].to_numpy(),
                "c": m["color"].fillna(-1).astype("int64").to_numpy(),
            }
        )

    def _decide(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["kind"] == 1][["node", "c"]].rename(columns={"c": "own"})
        nb = g[g["kind"] == 0][["node", "c"]]
        out = own.copy()
        unc = out["own"].to_numpy() < 0
        if unc.any():
            cand = nb[nb["node"].isin(out.loc[unc, "node"])]
            blocked = set(cand.loc[cand["c"] < 0, "node"])
            cols = cand[cand["c"] >= 0].drop_duplicates().sort_values(
                ["node", "c"], kind="stable"
            )
            pos = cols.groupby("node").cumcount().to_numpy()
            cvals = cols["c"].to_numpy()
            gap = cvals != pos
            mex_gap = (
                cols.loc[gap]
                .assign(p=pos[gap])
                .groupby("node")["p"]
                .min()
            )
            sizes = cols.groupby("node").size()
            # mex per uncolored node: 0 by default (no colored lower
            # nbrs), group size when colors form a full prefix, first
            # gap otherwise; blocked (an uncolored lower nbr) stays -1
            unc_nodes = out.loc[unc, "node"].to_numpy()
            mex = pd.Series(np.zeros(len(unc_nodes), dtype=np.int64),
                            index=unc_nodes)
            if len(sizes):
                mex.update(sizes.astype("int64"))
            if len(mex_gap):
                mex.update(mex_gap.astype("int64"))
            if blocked:
                mex[mex.index.isin(list(blocked))] = -1
            newly = out["node"].map(mex)
            out["own"] = np.where(
                unc, newly.fillna(-1).astype("int64"), out["own"]
            ).astype("int64")
        return out.rename(columns={"own": "color"})

    def _n_uncolored(st: ray.data.Dataset) -> int:
        parts = st.map_batches(
            lambda b: pd.DataFrame({"n": [int((b["color"] < 0).sum())]}),
            batch_format="pandas",
        ).to_pandas()
        return int(parts["n"].sum()) if len(parts) else 0

    for _ in range(max_rounds):
        if _n_uncolored(state) == 0:
            break
        att_in = adj.map_batches(
            lambda b: pd.DataFrame(
                {
                    "key": b["nbr"],
                    "node": b["node"],
                    "color": np.full(len(b), -1, dtype=np.int64),
                    "kind": np.zeros(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ).union(
            state.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "key": b["node"],
                        "node": b["node"],
                        "color": b["color"].astype("int64"),
                        "kind": np.ones(len(b), dtype=np.int64),
                    }
                ),
                batch_format="pandas",
            )
        )
        att = sanitize_for_join(
            bucketed_reduce(att_in, ["key"], _attach, att_schema,
                            num_buckets=num_buckets),
            att_schema,
        )
        dec_in = att.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "c": b["c"].astype("int64"),
                    "kind": np.zeros(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ).union(
            state.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "node": b["node"],
                        "c": b["color"].astype("int64"),
                        "kind": np.ones(len(b), dtype=np.int64),
                    }
                ),
                batch_format="pandas",
            )
        )
        state = sanitize_for_join(
            bucketed_reduce(dec_in, ["node"], _decide, COLOR_SCHEMA,
                            num_buckets=num_buckets),
            COLOR_SCHEMA,
        ).materialize()

    n_unc = _n_uncolored(state)
    if n_unc:
        raise RuntimeError(
            f"greedy_coloring: {n_unc} nodes uncolored after {max_rounds} rounds"
        )
    return state


# ---------------------------------------------------------------------------
# Capacity-constrained label-propagation partitioning (co-location planner)
# ---------------------------------------------------------------------------

PART_SCHEMA = pa.schema([("node", pa.string()), ("partition", pa.int64())])


def partition_local(
    und: pd.DataFrame, *, k: int, capacity: int, iters: int
) -> pd.DataFrame:
    """Driver twin of :func:`capacity_partition` — same rule, same
    tie-breaks, computed sequentially per round (rounds are synchronous
    in BOTH paths, so the results are bit-identical)."""
    if und.empty:
        return pd.DataFrame(
            {"node": pd.Series(dtype="object"), "partition": pd.Series(dtype="int64")}
        )
    nodes = pd.Series(pd.unique(pd.concat([und["a"], und["b"]], ignore_index=True)))
    lbl = dict(zip(nodes, (_node_rank(nodes) % np.uint64(k)).astype(np.int64)))
    adj: dict[str, list[str]] = {}
    for a, b in zip(und["a"], und["b"]):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for _ in range(iters):
        counts: dict[int, int] = {}
        for v in lbl.values():
            counts[v] = counts.get(v, 0) + 1
        cands = []
        for v in sorted(lbl):
            cur = lbl[v]
            votes: dict[int, int] = {}
            for u in adj.get(v, ()):
                votes[lbl[u]] = votes.get(lbl[u], 0) + 1
            if not votes:
                continue
            best = min(votes, key=lambda c: (-votes[c], c))
            gain = votes.get(best, 0) - votes.get(cur, 0)
            if best != cur and gain > 0:
                cands.append((v, cur, best, gain))
        if not cands:
            break
        moved = {}
        by_target: dict[int, list] = {}
        for v, cur, best, gain in cands:
            by_target.setdefault(best, []).append((v, gain))
        for tgt, lst in by_target.items():
            slots = max(0, capacity - counts.get(tgt, 0))
            lst.sort(key=lambda t: (-t[1], t[0]))
            for v, _ in lst[:slots]:
                moved[v] = tgt
        if not moved:
            break
        lbl.update(moved)
    out = pd.DataFrame({"node": list(lbl), "partition": [lbl[n] for n in lbl]})
    out["partition"] = out["partition"].astype("int64")
    return out.sort_values("node", kind="stable").reset_index(drop=True)


def capacity_partition(
    edges: ray.data.Dataset,
    *,
    k: int = 8,
    capacity: int | None = None,
    iters: int = 5,
    driver_max_edges: int = 2_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Capacity-constrained label-propagation graph partitioning —
    the co-location planner for a 100-TB layout: assign every node one
    of ``k`` partitions so linked records tend to land together
    WITHOUT any partition exceeding ``capacity`` nodes. Start from the
    splitmix64 hash partition; each synchronous round every node
    proposes a move to its neighborhood-majority partition (ties to
    the smaller id) when that strictly beats its current partition's
    local vote; per target partition, only the top ``capacity -
    current_size`` proposals by ``(gain desc, node asc)`` are accepted
    (conservative: outflow is not credited within the round, so the
    cap can never be overshot). Deterministic, layout-independent,
    rows-only (iterated LPA is not SQL-expressible).

    COUNT-GATED like the other graph ops: small edge lists run the
    bit-identical sequential twin; over the gate each round costs one
    label-attach reduce, one per-node proposal reduce, one per-target
    acceptance reduce (k groups — a hot target's candidate list lands
    in one reducer; if that ever skews, rank via the distributed
    ``row_positions`` primitive instead) and one label-update reduce.
    The per-partition census is a k-row residue."""
    if capacity is None:
        capacity = 0  # resolved after the node count is known
    und = sanitize_for_join(
        undirected_simple_edges(edges, num_buckets=num_buckets), UND_SCHEMA
    ).materialize()
    n_edges = und.count()
    if n_edges == 0:
        return ray.data.from_arrow(PART_SCHEMA.empty_table())

    # universe + initial hash labels
    universe = sanitize_for_join(
        bucketed_reduce(
            und.map_batches(
                lambda b: pd.DataFrame(
                    {"node": pd.concat([b["a"], b["b"]], ignore_index=True)}
                ),
                batch_format="pandas",
            ),
            ["node"],
            lambda g: g.drop_duplicates("node"),
            pa.schema([("node", pa.string())]),
            combiner=lambda b: b.drop_duplicates("node") if len(b) else b,
            num_buckets=num_buckets,
        ),
        pa.schema([("node", pa.string())]),
    ).materialize()
    n_nodes = universe.count()
    if capacity <= 0:
        capacity = -(-n_nodes * 11 // (10 * k))  # ceil(1.1 * n/k)

    if n_edges <= driver_max_edges:
        return ray.data.from_arrow(
            pa_from_pandas(
                partition_local(
                    und.to_pandas(), k=k, capacity=capacity, iters=iters
                ),
                PART_SCHEMA,
            )
        )

    adj_schema = pa.schema([("node", pa.string()), ("nbr", pa.string())])
    adj = sanitize_for_join(
        und.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": pd.concat([b["a"], b["b"]], ignore_index=True),
                    "nbr": pd.concat([b["b"], b["a"]], ignore_index=True),
                }
            ),
            batch_format="pandas",
        ),
        adj_schema,
    ).materialize()

    labels = sanitize_for_join(
        universe.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "partition": (
                        _node_rank(b["node"]) % np.uint64(k)
                    ).astype("int64"),
                }
            ),
            batch_format="pandas",
        ),
        PART_SCHEMA,
    ).materialize()

    att_schema = pa.schema([("node", pa.string()), ("nbr_lbl", pa.int64())])
    cand_schema = pa.schema(
        [
            ("node", pa.string()),
            ("cur", pa.int64()),
            ("to", pa.int64()),
            ("gain", pa.int64()),
        ]
    )

    def _census(lbls: ray.data.Dataset) -> dict[int, int]:
        parts = lbls.map_batches(
            lambda b: b.groupby("partition", as_index=False).size().rename(
                columns={"size": "n"}
            ),
            batch_format="pandas",
        ).to_pandas()
        if len(parts) == 0:
            return {}
        agg = parts.groupby("partition")["n"].sum()
        return {int(i): int(v) for i, v in agg.items()}

    def _attach(g: pd.DataFrame) -> pd.DataFrame:
        st = g[g["kind"] == 1]
        ad = g[g["kind"] == 0]
        if len(ad) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype="object"), "nbr_lbl": pd.Series(dtype="int64")}
            )
        m = ad[["node", "key"]].merge(st[["key", "lbl"]], on="key", how="inner")
        return pd.DataFrame(
            {"node": m["node"].to_numpy(), "nbr_lbl": m["lbl"].astype("int64").to_numpy()}
        )

    def _propose(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["kind"] == 1][["node", "val"]].rename(columns={"val": "cur"})
        nb = g[g["kind"] == 0][["node", "val"]]
        if len(nb) == 0 or len(own) == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="object"),
                    "cur": pd.Series(dtype="int64"),
                    "to": pd.Series(dtype="int64"),
                    "gain": pd.Series(dtype="int64"),
                }
            )
        votes = (
            nb.groupby(["node", "val"], as_index=False, sort=False)
            .size()
            .rename(columns={"val": "to", "size": "v"})
        )
        votes = votes.sort_values(["node", "v", "to"],
                                  ascending=[True, False, True], kind="stable")
        best = votes.drop_duplicates("node", keep="first")
        cur_votes = votes.merge(own, on="node")
        cur_votes = cur_votes[cur_votes["to"] == cur_votes["cur"]][["node", "v"]]
        out = best.merge(own, on="node").merge(
            cur_votes.rename(columns={"v": "v_cur"}), on="node", how="left"
        )
        out["v_cur"] = out["v_cur"].fillna(0).astype("int64")
        out["gain"] = out["v"] - out["v_cur"]
        out = out[(out["to"] != out["cur"]) & (out["gain"] > 0)]
        return out[["node", "cur", "to", "gain"]].astype(
            {"cur": "int64", "to": "int64", "gain": "int64"}
        )

    def _update(g: pd.DataFrame) -> pd.DataFrame:
        mv = g[g["kind"] == 1][["node", "val"]]
        base = g[g["kind"] == 0][["node", "val"]]
        out = base.set_index("node")["val"]
        if len(mv):
            out.update(mv.set_index("node")["val"])
        return pd.DataFrame(
            {"node": out.index.to_numpy(object), "partition": out.to_numpy(np.int64)}
        )

    for _ in range(iters):
        counts = _census(labels)
        att_in = adj.map_batches(
            lambda b: pd.DataFrame(
                {
                    "key": b["nbr"],
                    "node": b["node"],
                    "lbl": np.full(len(b), -1, dtype=np.int64),
                    "kind": np.zeros(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ).union(
            labels.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "key": b["node"],
                        "node": b["node"],
                        "lbl": b["partition"].astype("int64"),
                        "kind": np.ones(len(b), dtype=np.int64),
                    }
                ),
                batch_format="pandas",
            )
        )
        att = sanitize_for_join(
            bucketed_reduce(att_in, ["key"], _attach, att_schema,
                            num_buckets=num_buckets),
            att_schema,
        )
        prop_in = att.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "val": b["nbr_lbl"].astype("int64"),
                    "kind": np.zeros(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ).union(
            labels.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "node": b["node"],
                        "val": b["partition"].astype("int64"),
                        "kind": np.ones(len(b), dtype=np.int64),
                    }
                ),
                batch_format="pandas",
            )
        )
        cands = sanitize_for_join(
            bucketed_reduce(prop_in, ["node"], _propose, cand_schema,
                            num_buckets=num_buckets),
            cand_schema,
        ).materialize()
        if cands.count() == 0:
            break

        def _accept(g: pd.DataFrame, _counts=counts) -> pd.DataFrame:
            out = []
            for tgt, lst in g.groupby("to"):
                slots = max(0, capacity - _counts.get(int(tgt), 0))
                lst = lst.sort_values(["gain", "node"],
                                      ascending=[False, True], kind="stable")
                out.append(lst.head(slots))
            acc = pd.concat(out) if out else g.iloc[:0]
            return pd.DataFrame(
                {"node": acc["node"].to_numpy(), "val": acc["to"].astype("int64").to_numpy()}
            )

        acc_schema = pa.schema([("node", pa.string()), ("val", pa.int64())])
        accepted = sanitize_for_join(
            bucketed_reduce(cands, ["to"], _accept, acc_schema,
                            num_buckets=num_buckets),
            acc_schema,
        ).materialize()
        if accepted.count() == 0:
            break
        upd_in = labels.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["node"],
                    "val": b["partition"].astype("int64"),
                    "kind": np.zeros(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ).union(
            accepted.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "node": b["node"],
                        "val": b["val"].astype("int64"),
                        "kind": np.ones(len(b), dtype=np.int64),
                    }
                ),
                batch_format="pandas",
            )
        )
        labels = sanitize_for_join(
            bucketed_reduce(upd_in, ["node"], _update, PART_SCHEMA,
                            num_buckets=num_buckets),
            PART_SCHEMA,
        ).materialize()

    return labels
