"""Phase 3 — relationship inference + inferred-aware dedup.

Behavior parity with ``infer_relationships``
(``/root/reference/src/knowledge_graph/entity_standardization.py:183-271``)
and its helpers, re-expressed on Ray Data:

- **Connected components** (``:273-312``): the reference runs a
  recursive DFS over the in-memory entity graph. Here the *distinct*
  edge set is aggregated distributively (it is the small residue —
  unique entity pairs, not triples) and weakly-connected components
  are computed with an iterative union-find over that residue. The
  same component labels feed community-capped LLM inference and the
  materialized ``nodes`` table.
- **Transitive inference** (J2, ``:314-354``): a distributed hash
  self-join of the distinct edge list on the mid entity
  (``dst == src``), anti-joined against existing ``(subject, object)``
  pairs. Predicate per pair is last-wins by the stable order key
  ``(url, chunk_id, seq)`` (the reference's dict insertion order,
  ``:327-331``). New predicate: ``"indirectly {p}"`` when both legs
  share ``p``, else ``"{p1} via {mid}"``, 3-word-limited; marked
  ``inferred``. ``max_fanout_per_mid`` caps hot-node pair blowup
  (skew defense; ``None`` = exact parity).
- **Lexical similarity** (J3, ``:661-752``): all-pairs semantics via
  token blocking — a pair can emit a "relates to"/"related to" edge
  iff it shares a >=4-char word, which is exactly the token-blocking
  condition; containment pairs (``e1 in e2`` with NO shared words)
  are blocked on character 3-grams. Small entity sets short-circuit
  to an exact loop for bit-parity with the reference.
- **LLM-assisted inference** (A4/A5, ``:451-659``): community-capped
  (top-5 pairs / top-3 within) driver-orchestrated model calls —
  O(1) calls per run by construction, exactly like the reference.
- **Dedup** (G5, ``:356-375``): groupby (s,p,o); a non-inferred
  duplicate always wins (reference overwrites on every later
  non-inferred occurrence -> keep the LAST non-inferred by the stable
  key); otherwise the first occurrence survives.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pandas as pd
import ray
import ray.data

from ..functions import prompts
from ..functions.jsonx import extract_json_from_text
from ..functions.model import ChatModel
from ..functions.textnorm import limit_predicate_length

ORDER_COLS = ["url", "chunk_id", "seq"]


def pa_from_pandas(df: pd.DataFrame, schema: pa.Schema | None = None) -> pa.Table:
    """pandas -> Arrow without the pandas schema metadata (which is an
    unhashable dict that defeats Ray's block-schema dedup).

    Pass ``schema`` from ``map_groups`` functions: Ray calls them on
    EMPTY partitions too, and an empty DataFrame converts to null-typed
    columns that poison downstream join/rename schema unification.
    """
    if schema is not None:
        if len(df) == 0:
            return schema.empty_table()
        t = pa.Table.from_pandas(df[schema.names], preserve_index=False)
        return t.cast(schema).replace_schema_metadata(None)
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def normalize_blocks(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Coerce non-empty blocks to ``schema`` (column order + types).

    NOTE: Ray's hash-shuffle ``map_groups`` emits ZERO-COLUMN empty
    blocks for partitions that received no groups, and ``map_batches``
    passes those through WITHOUT calling the UDF — use
    :func:`sanitize_for_join` where an actually-empty-block-free
    dataset is required (schema introspection, ``cogroup_join`` sides
    built from groupby residues).
    """

    def _fix(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or len(batch) == 0:
            return schema.empty_table()
        return batch.select(schema.names).cast(schema)

    return ds.map_batches(_fix, batch_format="pyarrow")


def sanitize_for_join(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Physically drop empty blocks (join inputs must not contain the
    zero-column blocks that hash-shuffle map_groups emits for empty
    partitions — they break the join's key-field resolution).

    Materializes (join inputs here are small aggregated residues) and
    rebuilds the dataset zero-copy from the surviving block refs.
    """
    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(refs)


EDGE_SCHEMA = pa.schema(
    [("subject", pa.string()), ("object", pa.string()), ("predicate", pa.string())]
)

LINEAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("chunk_id", pa.int32()),
        ("seq", pa.int32()),
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("inferred", pa.bool_()),
        ("stage", pa.string()),
    ]
)


def default_num_partitions() -> int:
    """Join/shuffle partition count sized to the cluster: ~1 partition
    per 2 CPUs, min 2. On a 256-node cluster this tracks total cores."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus // 2)


def _ensure_lineage(batch: pa.Table, stage: str) -> pa.Table:
    """Attach missing provenance/lineage columns with defaults."""
    n = len(batch)
    cols = dict(zip(batch.column_names, batch.columns))
    cols.setdefault("url", pa.nulls(n, pa.string()).fill_null(""))
    cols.setdefault("chunk_id", pa.array([0] * n, pa.int32()))
    cols.setdefault("seq", pa.array([0] * n, pa.int32()))
    cols.setdefault("inferred", pa.array([False] * n, pa.bool_()))
    cols["stage"] = pa.array([stage] * n, pa.string())
    order = ["url", "chunk_id", "seq", "subject", "predicate", "object", "inferred", "stage"]
    return pa.table({k: cols[k] for k in order})


def with_lineage(triples: ray.data.Dataset, stage: str) -> ray.data.Dataset:
    try:
        names = set(triples.schema().names)
    except Exception:
        names = set()
    if {"url", "chunk_id", "seq", "inferred", "stage"} <= names:
        return triples  # already lineaged (avoid a full re-scan per consumer)
    return triples.map_batches(
        _ensure_lineage, batch_format="pyarrow", fn_kwargs={"stage": stage}
    )


# ---------------------------------------------------------------------------
# Bucketed reduce: the per-key reduce pattern without per-key Python.
#
# ``groupby(key).map_groups(fn)`` invokes Python once per KEY — death
# by interpreter overhead when keys number in the millions. Instead:
# map-side combiner -> shuffle on a coarse ``hash(key) % B`` bucket ->
# one VECTORIZED pandas reduce per bucket. B tracks the cluster size;
# each bucket holds many keys, amortizing per-call overhead.
# ---------------------------------------------------------------------------

def stable_key_frame(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Dtype-stable key projection for bucket/partition hashing.

    Numpy integer/bool key columns cast to a canonical width (int64 /
    uint64) so int32-vs-int64 blocks — or two join sides with
    different key widths — hash identically; everything else (strings,
    floats, extension dtypes that may hold NA) renders to ``str`` as
    before. Hashing canonical ints instead of their str rendering is
    5-50x faster (measured: 2M single-int keys 1.75s -> 0.04s; 2M
    int-pair keys 3.9s -> 0.8s) — the dominant constant factor of
    every bucketed shuffle in this repo.
    """
    out = {}
    for c in cols:
        s = df[c]
        dt = s.dtype
        if isinstance(dt, np.dtype) and dt.kind in ("i", "b"):
            out[c] = s.astype("int64")
        elif isinstance(dt, np.dtype) and dt.kind == "u":
            out[c] = s.astype("uint64")
        else:
            out[c] = s.astype(str)
    return pd.DataFrame(out)


def bucketed_reduce(
    ds: ray.data.Dataset,
    key_cols: list[str],
    reducer,
    out_schema: pa.Schema,
    *,
    combiner=None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """``reducer(pd.DataFrame) -> pd.DataFrame`` sees ALL rows of every
    key assigned to its bucket, vectorized. ``combiner`` (optional)
    pre-reduces each batch map-side before the shuffle."""
    if num_buckets is None:
        num_buckets = default_num_partitions()

    def _with_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        if combiner is not None:
            batch = combiner(batch)
        if len(batch) == 0:
            # Emit the empty block as Arrow: Ray's pandas size estimator
            # np.vectorize's over object columns and logs a warning on
            # size-0 input (ray pandas_block.py size_bytes); an Arrow
            # block sidesteps that path and unifies at the shuffle.
            fields = []
            for c, dt in batch.dtypes.items():
                try:
                    t = pa.string() if dt == object else pa.from_numpy_dtype(dt)
                except (pa.ArrowNotImplementedError, TypeError):
                    t = pa.string()
                fields.append(pa.field(str(c), t))
            fields.append(pa.field("__bucket", pa.int64()))
            return pa.schema(fields).empty_table()
        h = pd.util.hash_pandas_object(stable_key_frame(batch, key_cols), index=False)
        batch = batch.copy()
        batch["__bucket"] = (h % num_buckets).astype("int64")
        return batch

    def _reduce(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        out = reducer(g.drop(columns="__bucket"))
        return pa_from_pandas(out, out_schema)

    return normalize_blocks(
        # batch_size=None => the UDF sees the WHOLE block: the map-side
        # combiner collapses duplicates across the full block instead of
        # 1024-row slivers (measured: the dedup shuffle input shrinks ~2x)
        ds.map_batches(_with_bucket, batch_format="pandas", batch_size=None)
        .groupby("__bucket")
        .map_groups(_reduce, batch_format="pandas"),
        out_schema,
    )


# ---------------------------------------------------------------------------
# Distinct edges + last-wins predicate (feeds components & transitive join)
# ---------------------------------------------------------------------------

def distinct_edges(triples: ray.data.Dataset) -> ray.data.Dataset:
    """``(subject, object) -> predicate`` with last-wins by the stable
    order key — the distributed equivalent of the reference's
    ``predicates`` dict (``:327-331``). Bucketed reduce: map-side
    last-wins combiner, then vectorized per-bucket last-wins."""

    def _combine(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch
        return batch.sort_values(ORDER_COLS, kind="stable").drop_duplicates(
            ["subject", "object"], keep="last"
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return _combine(g)[["subject", "object", "predicate"]]

    cols = ["subject", "object", "predicate"] + ORDER_COLS
    return bucketed_reduce(
        triples.select_columns(cols),
        ["subject", "object"],
        _reduce,
        EDGE_SCHEMA,
        combiner=_combine,
    )


# ---------------------------------------------------------------------------
# Connected components (weak) over the aggregated edge residue
# ---------------------------------------------------------------------------

def connected_components(edges: list[tuple[str, str]]) -> dict[str, int]:
    """Union-find over unique entity pairs; labels are dense ints
    ordered by each component's lexicographically-smallest member —
    a pure function of the graph (edge ORDER cannot change the
    labels), which is what lets ``kg_nodes`` carry a hash-exact SQL
    twin (rank of the min-label component representative). Matches
    the reference's weakly-connected semantics (DFS over both edge
    directions, ``entity_standardization.py:273-312``) without its
    recursion-depth hazard."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for s, o in edges:
        for n in (s, o):
            if n not in parent:
                parent[n] = n
        rs, ro = find(s), find(o)
        if rs != ro:
            parent[ro] = rs
    comp_min: dict[str, str] = {}
    for n in parent:
        r = find(n)
        m = comp_min.get(r)
        if m is None or n < m:
            comp_min[r] = n
    rank = {m: i for i, m in enumerate(sorted(comp_min.values()))}
    return {n: rank[comp_min[find(n)]] for n in parent}


def connected_components_distributed(
    edges: ray.data.Dataset,
    *,
    max_iters: int = 25,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Weakly-connected components via iterative min-label propagation
    — the scale path for when even the distinct-edge residue outgrows
    the driver (SURVEY.md §4.2). Returns ``(entity, component)`` where
    ``component`` is the lexicographically smallest entity of the
    component (a deterministic representative; equivalence with the
    driver union-find is on the PARTITION, tested in test_modes).

    Each round: every edge endpoint offers its current label to the
    other side; labels are min-reduced per entity (one cogroup join +
    one bucketed min per round); stop when no label changes. Rounds
    needed = graph diameter in the worst case.
    """
    from .relational import cogroup_join

    if num_buckets is None:
        num_buckets = default_num_partitions()

    pair_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    und = edges.select_columns(["subject", "object"]).map_batches(
        lambda b: pa.table(
            {
                "src": pa.concat_arrays(
                    [b["subject"].combine_chunks(), b["object"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [b["object"].combine_chunks(), b["subject"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    und = sanitize_for_join(und, pair_schema)

    label_schema = pa.schema([("entity", pa.string()), ("component", pa.string())])
    tagged_schema = pa.schema(
        [("entity", pa.string()), ("component", pa.string()), ("is_old", pa.bool_())]
    )
    changed_schema = pa.schema(
        [("entity", pa.string()), ("component", pa.string()), ("changed", pa.int64())]
    )

    def _init(batch: pd.DataFrame) -> pd.DataFrame:
        ents = pd.unique(batch["src"])
        return pd.DataFrame({"entity": ents, "component": ents})

    def _min_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("entity", as_index=False, sort=False)["component"].min()

    labels = bucketed_reduce(
        und.map_batches(_init, batch_format="pandas"),
        ["entity"],
        _min_reduce,
        label_schema,
        num_buckets=num_buckets,
    )
    labels = sanitize_for_join(labels, label_schema)

    def _min_and_changed(g: pd.DataFrame) -> pd.DataFrame:
        # The old label rides along tagged is_old; convergence detection
        # happens INSIDE the min reduce (no extra per-round join). Two
        # vectorized groupby-mins — no per-key Python.
        new_min = g.groupby("entity", sort=False)["component"].min()
        old_min = g[g["is_old"]].groupby("entity", sort=False)["component"].min()
        out = new_min.to_frame("component").join(old_min.to_frame("old"))
        out["changed"] = (out["component"] < out["old"]).astype("int64")
        return out.reset_index()[["entity", "component", "changed"]]

    for _ in range(max_iters):
        offers = cogroup_join(
            und,
            labels.rename_columns({"entity": "src"}),
            on=["src"],
            how="inner",
            num_buckets=num_buckets,
            left_schema=pair_schema,
            right_schema=pa.schema([("src", pa.string()), ("component", pa.string())]),
        ).map_batches(
            lambda b: pa.table(
                {
                    "entity": b["dst"],
                    "component": b["component"],
                    "is_old": pa.array([False] * len(b), pa.bool_()),
                }
            ),
            batch_format="pyarrow",
        )
        old_tagged = labels.map_batches(
            lambda b: pa.table(
                {
                    "entity": b["entity"],
                    "component": b["component"],
                    "is_old": pa.array([True] * len(b), pa.bool_()),
                }
            ),
            batch_format="pyarrow",
        )
        merged = sanitize_for_join(
            bucketed_reduce(
                old_tagged.union(offers),
                ["entity"],
                _min_and_changed,
                changed_schema,
                num_buckets=num_buckets,
            ),
            changed_schema,
        )
        changed = merged.sum("changed") or 0
        labels = sanitize_for_join(
            merged.select_columns(["entity", "component"]), label_schema
        )
        if not changed:
            break
    return labels


# ---------------------------------------------------------------------------
# Transitive inference (J2)
# ---------------------------------------------------------------------------

def infer_transitive(
    triples: ray.data.Dataset,
    *,
    num_partitions: int | None = None,
    max_fanout_per_mid: int | None = None,
) -> ray.data.Dataset:
    """A->B ⋈ B->C => inferred A->C, excluding self-pairs and pairs
    already related (anti-join on (subject, object)).

    ``max_fanout_per_mid`` bounds the in-degree x out-degree blowup of
    hot mid entities: each side of the join is capped to that many
    edges per mid (deterministically, by the stable sort order). The
    reference has no cap (it is O(paths)); at web scale a cap is
    mandatory — leave ``None`` only for parity tests.
    """
    if num_partitions is None:
        num_partitions = default_num_partitions()
    edges = distinct_edges(triples)

    if max_fanout_per_mid is not None:
        # per-key cap WITHOUT per-key Python: one bucketed exchange,
        # vectorized sort + groupby().head inside each bucket (the
        # groupby(key).map_groups form costs one Python task per
        # distinct entity — the banned pattern; same fix as lexical)
        def _cap(key: str, order: list[str]):
            def _f(g: pd.DataFrame) -> pd.DataFrame:
                if len(g) == 0:
                    return g
                return (
                    g.sort_values([key] + order, kind="stable")
                    .groupby(key, sort=False)
                    .head(max_fanout_per_mid)
                )

            return _f

        out_edges = bucketed_reduce(
            edges, ["subject"], _cap("subject", ["object", "predicate"]),
            EDGE_SCHEMA,
        )
        in_edges = bucketed_reduce(
            edges, ["object"], _cap("object", ["subject", "predicate"]),
            EDGE_SCHEMA,
        )
    else:
        out_edges = edges
        in_edges = edges

    # cogroup_join, not Dataset.join: Ray 2.49's join operator fails
    # ("No match ... for key field") whenever a hash partition receives
    # zero rows — guaranteed on sparse keys.
    from .relational import cogroup_join

    left_schema = pa.schema([("src", pa.string()), ("mid", pa.string()), ("p1", pa.string())])
    right_schema = pa.schema([("mid", pa.string()), ("dst", pa.string()), ("p2", pa.string())])
    left = sanitize_for_join(
        in_edges.rename_columns({"subject": "src", "object": "mid", "predicate": "p1"}),
        left_schema,
    )
    right = sanitize_for_join(
        out_edges.rename_columns({"subject": "mid", "object": "dst", "predicate": "p2"}),
        right_schema,
    )
    paths = cogroup_join(
        left, right, on=["mid"], how="inner", num_buckets=num_partitions,
        left_schema=left_schema, right_schema=right_schema,
    )

    def _compose(batch: pa.Table) -> pa.Table:
        srcs = batch["src"].to_pylist()
        mids = batch["mid"].to_pylist()
        dsts = batch["dst"].to_pylist()
        p1s = batch["p1"].to_pylist()
        p2s = batch["p2"].to_pylist()
        o_s, o_p, o_o = [], [], []
        for s, m, d, p1, p2 in zip(srcs, mids, dsts, p1s, p2s):
            if s == d:
                continue
            new_pred = f"indirectly {p1}" if p1 == p2 else f"{p1} via {m}"
            o_s.append(s)
            o_p.append(limit_predicate_length(new_pred))
            o_o.append(d)
        return pa.table(
            {
                "subject": pa.array(o_s, pa.string()),
                "predicate": pa.array(o_p, pa.string()),
                "object": pa.array(o_o, pa.string()),
            }
        )

    candidates = paths.map_batches(_compose, batch_format="pyarrow").materialize()
    if candidates.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "chunk_id": pa.array([], pa.int32()),
                    "seq": pa.array([], pa.int32()),
                    "subject": pa.array([], pa.string()),
                    "predicate": pa.array([], pa.string()),
                    "object": pa.array([], pa.string()),
                    "inferred": pa.array([], pa.bool_()),
                    "stage": pa.array([], pa.string()),
                }
            )
        )
    # Anti-join against existing (subject, object) pairs.
    pair_schema = pa.schema([("subject", pa.string()), ("object", pa.string())])
    existing = sanitize_for_join(edges.select_columns(["subject", "object"]), pair_schema)
    candidates = sanitize_for_join(
        candidates,
        pa.schema(
            [("subject", pa.string()), ("predicate", pa.string()), ("object", pa.string())]
        ),
    )
    new = cogroup_join(
        candidates, existing, on=["subject", "object"], how="left_anti",
        num_buckets=num_partitions,
        left_schema=pa.schema(
            [("subject", pa.string()), ("predicate", pa.string()), ("object", pa.string())]
        ),
        right_schema=pair_schema,
    )
    return new.map_batches(
        lambda b: _ensure_lineage(
            b.append_column("inferred", pa.array([True] * len(b), pa.bool_())),
            "transitive",
        ),
        batch_format="pyarrow",
    )


def infer_transitive_broadcast(
    edges_pd: pd.DataFrame,
    *,
    max_fanout_per_mid: int | None = None,
    num_blocks: int = 16,
) -> ray.data.Dataset:
    """Transitive inference with the distinct-edge residue broadcast.

    The distinct edge list (unique entity pairs + last-wins predicate)
    is the small aggregated residue already collected for component
    labeling; broadcast it once (``ray.put``) and compose paths in a
    shuffle-free distributed map over the edge list itself: each task
    expands its slice of in-edges ``(s, mid, p1)`` against the
    broadcast out-edge index of ``mid``, excluding self-pairs and
    already-related pairs via the broadcast pair set. Path output
    (the quadratic part) streams out of the map — only the edge
    RESIDUE is broadcast, never the paths. Use
    :func:`infer_transitive` (hash join) when the residue outgrows
    broadcast (config ``inference.transitive_mode='shuffle'``).
    """
    out_map: dict[str, list[tuple[str, str]]] = {}
    for s, o, p in edges_pd[["subject", "object", "predicate"]].itertuples(index=False):
        out_map.setdefault(s, []).append((o, p))
    for s in out_map:
        out_map[s].sort()
        if max_fanout_per_mid is not None:
            out_map[s] = out_map[s][:max_fanout_per_mid]
    pair_set = set(zip(edges_pd["subject"], edges_pd["object"]))
    state_ref = ray.put((out_map, pair_set))

    class _Compose:
        def __init__(self) -> None:
            self.out_map, self.pairs = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            o_s, o_p, o_o = [], [], []
            for s, mid, p1 in zip(
                batch["subject"].to_pylist(),
                batch["object"].to_pylist(),
                batch["predicate"].to_pylist(),
            ):
                for dst, p2 in self.out_map.get(mid, ()):
                    if s == dst or (s, dst) in self.pairs:
                        continue
                    new_pred = f"indirectly {p1}" if p1 == p2 else f"{p1} via {mid}"
                    o_s.append(s)
                    o_p.append(limit_predicate_length(new_pred))
                    o_o.append(dst)
            return _ensure_lineage(
                pa.table(
                    {
                        "subject": pa.array(o_s, pa.string()),
                        "predicate": pa.array(o_p, pa.string()),
                        "object": pa.array(o_o, pa.string()),
                        "inferred": pa.array([True] * len(o_s), pa.bool_()),
                    }
                ),
                "transitive",
            )

    cap = max_fanout_per_mid
    edges_in = edges_pd
    if cap is not None:
        # Cap the in-edge side too (mirror of the out-edge cap).
        edges_in = (
            edges_pd.sort_values(["object", "subject", "predicate"], kind="stable")
            .groupby("object", sort=False)
            .head(cap)
        )
    ds = ray.data.from_pandas(edges_in.reset_index(drop=True))
    if ds.num_blocks() < num_blocks:
        ds = ds.repartition(num_blocks)
    return ds.map_batches(_Compose, batch_format="pyarrow", concurrency=(1, 8))


# ---------------------------------------------------------------------------
# Inferred-aware exact dedup (G5)
# ---------------------------------------------------------------------------

def dedup_triples(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup on (subject, predicate, object).

    Reference rule (``:356-375``): the stored triple is overwritten by
    every later NON-inferred duplicate => keep the last non-inferred by
    the stable order key when one exists, else the first occurrence.
    """

    key = ["subject", "predicate", "object"]

    def _combine(batch: pd.DataFrame) -> pd.DataFrame:
        # Map-side combiner: per (s,p,o) key keep only the two rows that
        # can still win globally — the max-order non-inferred and the
        # min-order row — before the shuffle. Cuts shuffle volume from
        # O(duplicates) to O(2 x distinct keys per block).
        if len(batch) == 0:
            return batch
        b = batch.sort_values(ORDER_COLS, kind="stable")
        firsts = b.drop_duplicates(key, keep="first")
        lasts = b[~b["inferred"]].drop_duplicates(key, keep="last")
        return pd.concat([firsts, lasts], ignore_index=True)

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        # Vectorized per-bucket reduce: winner = last non-inferred when
        # one exists, else the first occurrence.
        b = g.sort_values(ORDER_COLS, kind="stable")
        non_inf_last = b[~b["inferred"]].drop_duplicates(key, keep="last")
        firsts = b.drop_duplicates(key, keep="first")
        covered = firsts.merge(
            non_inf_last[key].assign(__hit=1), on=key, how="left"
        )
        only_inf = firsts[covered["__hit"].isna().to_numpy()]
        return pd.concat([non_inf_last, only_inf], ignore_index=True)[
            list(LINEAGE_SCHEMA.names)
        ]

    return bucketed_reduce(triples, key, _reduce, LINEAGE_SCHEMA, combiner=_combine)


WEIGHTED_LINEAGE_SCHEMA = pa.schema(
    list(LINEAGE_SCHEMA) + [pa.field("weight", pa.int64())]
)


def dedup_triples_weighted(triples: ray.data.Dataset) -> ray.data.Dataset:
    """G5 exact dedup that ALSO emits ``weight`` = how many raw rows
    each (s, p, o) key collapsed (its raw multiplicity).

    This is the enabler for running Phases 2/3 over the distinct
    residue instead of the raw table: Phase-2 entity frequencies are
    recovered exactly as weighted sums, and the representative row per
    key is the SAME row the raw-table dedup would keep (max-of-maxes:
    the per-key winner under the G5 rule is the max-order non-inferred
    row; the max over per-group maxes equals the global max, so
    collapsing before alias/predicate merges and re-deduping after is
    output-identical — pinned by ``test_weighted_collapse``).
    """

    key = ["subject", "predicate", "object"]

    def _combine(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            if "weight" not in batch.columns:
                batch = batch.assign(weight=pd.Series([], dtype="int64"))
            return batch
        b = batch.sort_values(ORDER_COLS, kind="stable")
        if "weight" not in b.columns:
            b = b.assign(weight=1)
        # per-key partial weight rides on the "first" candidate row;
        # the non-inferred "last" candidate carries 0 so re-combining
        # never double-counts
        w = b.groupby(key, sort=False)["weight"].transform("sum")
        firsts_mask = ~b.duplicated(key, keep="first")
        b = b.assign(weight=np.where(firsts_mask, w, 0))
        firsts = b[firsts_mask]
        lasts = b[~b["inferred"]].drop_duplicates(key, keep="last")
        lasts = lasts[~lasts.index.isin(firsts.index)]
        return pd.concat([firsts, lasts], ignore_index=True)

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        if "weight" not in g.columns:
            g = g.assign(weight=1)
        b = g.sort_values(ORDER_COLS, kind="stable")
        totals = b.groupby(key, as_index=False, sort=False)["weight"].sum()
        non_inf_last = b[~b["inferred"]].drop_duplicates(key, keep="last")
        firsts = b.drop_duplicates(key, keep="first")
        covered = firsts.merge(
            non_inf_last[key].assign(__hit=1), on=key, how="left"
        )
        only_inf = firsts[covered["__hit"].isna().to_numpy()]
        winners = pd.concat([non_inf_last, only_inf], ignore_index=True)
        out = winners.drop(columns="weight").merge(totals, on=key)
        return out[list(WEIGHTED_LINEAGE_SCHEMA.names)]

    return bucketed_reduce(
        triples, key, _reduce, WEIGHTED_LINEAGE_SCHEMA, combiner=_combine
    )


# ---------------------------------------------------------------------------
# LLM-assisted inference (A4 cross-community, A5 within-community)
# ---------------------------------------------------------------------------

def _validated_model_triples(response: str) -> list[dict]:
    """Accept-loop shared by A4/A5 (``:525-534`` / ``:641-650``)."""
    result = extract_json_from_text(response)
    out: list[dict] = []
    if result and isinstance(result, list):
        for t in result:
            if (
                isinstance(t, dict)
                and "subject" in t
                and "predicate" in t
                and "object" in t
            ):
                if t["subject"] == t["object"]:
                    continue
                out.append(
                    {
                        "subject": str(t["subject"]),
                        "predicate": limit_predicate_length(str(t["predicate"])),
                        "object": str(t["object"]),
                    }
                )
    return out


def local_topk_rows(
    ds: ray.data.Dataset,
    sort_cols: list[str],
    limit: int,
    ascending: bool | list[bool] = True,
) -> list[dict]:
    """Global top-``limit`` rows by ``sort_cols`` WITHOUT a global sort:
    per-batch local top-k (one vectorized sort per batch), then a tiny
    driver merge over the <= limit x n_batches survivors. The shape to
    use whenever k is small — ``Dataset.sort`` is an all-to-all
    shuffle."""

    def _local(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        return b.sort_values(sort_cols, ascending=ascending, kind="stable").head(limit)

    parts = ds.map_batches(_local, batch_format="pandas").take_all()
    if not parts:
        return []
    df = pd.DataFrame(parts)
    df = df.sort_values(sort_cols, ascending=ascending, kind="stable").head(limit)
    return df.to_dict("records")


def _context_triples_for(
    triples: ray.data.Dataset, entities: set[str], limit: int = 20
) -> list[dict]:
    """First <=20 triples touching ``entities``, by the stable order key
    (the reference takes the first 20 in list order, ``:491-492``).
    Selection is per-block local top-k + driver merge — never a global
    ``Dataset.sort`` (this runs up to ~13 times per model-assisted
    run)."""
    ref = ray.put(entities)

    class _Filter:
        def __init__(self) -> None:
            self.ents = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = [
                (s in self.ents) or (o in self.ents)
                for s, o in zip(batch["subject"].to_pylist(), batch["object"].to_pylist())
            ]
            return batch.filter(pa.array(mask, pa.bool_()))

    hits = triples.map_batches(_Filter, batch_format="pyarrow", concurrency=2)
    return local_topk_rows(hits, ORDER_COLS, limit)


def infer_with_model(
    triples: ray.data.Dataset,
    communities: list[set[str]],
    config: dict,
    model: ChatModel,
) -> list[dict]:
    """A4 + A5: community-capped model-assisted inference.

    Caps mirror the reference exactly (top-5 community pairs with 5
    representatives and <=20 context triples each; top-3 communities,
    <=10 disconnected pairs) so model work is O(1) per run regardless
    of input size. Representative/pair selection uses sorted order
    where the reference relies on set iteration order. Model errors are
    swallowed (``:540-541``). Returns plain triple dicts marked
    inferred.
    """
    new_triples: list[dict] = []
    within_cap = config.get("inference", {}).get("within_community_max_entities", 200)

    # --- A4: cross-community (``:451-543``) ---
    if len(communities) > 1:
        large = sorted(communities, key=len, reverse=True)[:5]
        for i, comm1 in enumerate(large):
            for j, comm2 in enumerate(large):
                if i >= j:
                    continue
                rep1 = sorted(comm1)[: min(5, len(comm1))]
                rep2 = sorted(comm2)[: min(5, len(comm2))]
                ctx = _context_triples_for(triples, set(rep1) | set(rep2))
                triples_text = "\n".join(
                    f"{t['subject']} {t['predicate']} {t['object']}" for t in ctx
                )
                try:
                    response = model.chat(
                        prompts.get_prompt("relationship_inference_system"),
                        prompts.get_prompt(
                            "relationship_inference_user",
                            ", ".join(rep1),
                            ", ".join(rep2),
                            triples_text,
                        ),
                    )
                    new_triples.extend(_validated_model_triples(response))
                except Exception:
                    pass

    # --- A5: within-community (``:545-659``) ---
    for community in sorted(communities, key=len, reverse=True)[:3]:
        if len(community) < 5:
            continue
        ents = sorted(community)[:within_cap]
        ent_set = set(ents)
        # Existing directed connections among the community subset.
        ref = ray.put(ent_set)

        class _Member:
            def __init__(self) -> None:
                self.ents = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                mask = [
                    (s in self.ents) and (o in self.ents)
                    for s, o in zip(
                        batch["subject"].to_pylist(), batch["object"].to_pylist()
                    )
                ]
                return batch.filter(pa.array(mask, pa.bool_()))

        # Reduce to DISTINCT (subject, object) pairs before collecting:
        # the entity subset is capped (<= within_cap) so distinct pairs
        # are bounded <= within_cap^2, but raw triples between a hot
        # pair are not — a pair with 10^6 duplicate edges must not ship
        # them all to the driver.
        member_pairs = triples.map_batches(
            _Member, batch_format="pyarrow", concurrency=2
        ).select_columns(["subject", "object"])

        def _dd(b: pd.DataFrame) -> pd.DataFrame:
            return b.drop_duplicates(["subject", "object"])

        pair_schema = pa.schema([("subject", pa.string()), ("object", pa.string())])
        connected = {
            (r["subject"], r["object"])
            for r in bucketed_reduce(
                member_pairs, ["subject", "object"], _dd, pair_schema, combiner=_dd
            ).take_all()
        }
        pairs = []
        for a in ents:
            for b in ents:
                if a == b or (a, b) in connected:
                    continue
                aw, bw = set(a.lower().split()), set(b.lower().split())
                if (aw & bw) or a.lower() in b.lower() or b.lower() in a.lower():
                    pairs.append((a, b))
            if len(pairs) >= 10:
                break
        pairs = pairs[:10]
        if not pairs:
            continue
        interest = {e for p in pairs for e in p}
        ctx = _context_triples_for(triples, interest)
        triples_text = "\n".join(
            f"{t['subject']} {t['predicate']} {t['object']}" for t in ctx
        )
        pairs_text = "\n".join(f"{a} and {b}" for a, b in pairs)
        try:
            response = model.chat(
                prompts.get_prompt("within_community_system"),
                prompts.get_prompt("within_community_user", pairs_text, triples_text),
            )
            new_triples.extend(_validated_model_triples(response))
        except Exception:
            pass

    for t in new_triples:
        t["inferred"] = True
    return new_triples


def community_residues(
    labels: ray.data.Dataset, *, top_k: int = 5, per_comm: int = 200
) -> list[set[str]]:
    """Top-``top_k`` components by TRUE member count, each reduced to
    its ``per_comm`` lexicographically-smallest entities, ordered by
    true size desc (ties: smaller component label first).

    This is the bounded residue the model-assisted inference needs when
    the full component labeling no longer fits the driver: the
    reference's own caps (5 reps per community pair, ``within_cap``
    entities per community) only ever read the smallest entities of the
    largest communities, so only those ever leave the cluster.
    ``labels`` is ``(entity, component)`` from
    :func:`connected_components_distributed`.
    """

    def _size_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"component": [], "n": []})
        out = b.groupby("component", as_index=False, sort=False).size()
        return out.rename(columns={"size": "n"})

    from ray.data.aggregate import Sum

    sizes = (
        labels.map_batches(_size_partial, batch_format="pandas")
        .groupby("component")
        .aggregate(Sum("n", alias_name="n"))
    )
    top = local_topk_rows(sizes, ["n", "component"], top_k, ascending=[False, True])
    if not top:
        return []
    comp_order = [r["component"] for r in top]
    keep = set(comp_order)
    mem_schema = pa.schema([("component", pa.string()), ("entity", pa.string())])

    def _filter(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["component"].isin(keep)][["component", "entity"]]

    def _heads(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values("entity", kind="stable")
            .groupby("component", sort=False)
            .head(per_comm)
        )

    members = bucketed_reduce(
        labels.map_batches(_filter, batch_format="pandas"),
        ["component"],
        _heads,
        mem_schema,
    ).take_all()
    by_comp: dict[str, set[str]] = {c: set() for c in comp_order}
    for r in members:
        by_comp[r["component"]].add(r["entity"])
    return [by_comp[c] for c in comp_order]


# ---------------------------------------------------------------------------
# Phase-3 composition
# ---------------------------------------------------------------------------

def infer_relationships(
    triples: ray.data.Dataset,
    config: dict | None = None,
    *,
    model: ChatModel | None = None,
    lexical_mode: str = "auto",
    num_partitions: int | None = None,
    max_fanout_per_mid: int | None = None,
    prededup_input: bool = True,
) -> tuple[ray.data.Dataset, "dict[str, int] | ray.data.Dataset"]:
    """Full Phase 3. Returns ``(final_triples, component_labels)``.

    Mirrors the reference order (``:230-271``): model-assisted
    inference (if enabled) -> transitive -> lexical -> union ->
    inferred-aware dedup -> final predicate limit -> self-loop filter.

    The distinct-edge residue is COUNTED before anything is collected
    (``inference.residue_max_edges``, default 2M pairs). Under the gate
    the residue is pulled to the driver once and drives component
    labeling, the broadcast transitive compose and the lexical sets
    (SURVEY.md §4.1: aggregate hard, work on the small residue); over
    it, NOTHING is collected — components run distributed (min-label
    propagation), transitive takes the shuffle self-join, lexical takes
    the join path, and the model-assisted step reads only the bounded
    ``community_residues``. Labels are returned as a ``dict`` under the
    gate and as an ``(entity, component)`` Dataset under/over it.

    ``prededup_input`` (default on): collapse exact duplicates with the
    G5 rule in ONE full-table pass up front, so the edge residue, the
    shuffle-mode transitive/lexical scans, and the final dedup all run
    over the distinct residue instead of each re-scanning the raw
    table (Phase-1 output is massively duplicated: every chunk of
    every tiled page re-emits its triples). Output-identical because
    Phase-2 output is all ``inferred=False``, for which G5 keeps
    exactly the max-order-key row per (s, p, o) — the same row every
    downstream last-wins rule would pick from the raw table (pinned by
    ``test_prededup_equivalence``). The model-assisted step still
    reads the RAW table: reference context selection deliberately
    keeps duplicate context triples. Set ``prededup_input=False`` when
    feeding a table that already carries ``inferred=True`` rows (e.g.
    re-running Phase 3 over a FINAL output) — there G5's
    first-occurrence fallback for only-inferred keys can pick a
    different (s, o)-last predicate than the raw scan would.
    """
    from ..functions.model import make_model
    from .lexical import infer_lexical

    config = config or {}
    inf_cfg = config.get("inference", {})
    if num_partitions is None:
        num_partitions = default_num_partitions()
    base = with_lineage(triples, "extracted")
    scan = dedup_triples(base).materialize() if prededup_input else base

    residue_cap = int(inf_cfg.get("residue_max_edges", 2_000_000))
    edges = distinct_edges(scan).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return base, {}

    driver_residue = n_edges <= residue_cap
    labels: dict[str, int] | ray.data.Dataset
    if driver_residue:
        edges_pd = edges.to_pandas()
        labels = connected_components(
            list(zip(edges_pd["subject"], edges_pd["object"]))
        )
    else:
        edges_pd = None
        labels = connected_components_distributed(edges)

    # NB: parts[0] is the pre-deduped scan table — the final dedup
    # collapses identically either way; base is kept only for the
    # model-assisted context selection below.
    parts: list[ray.data.Dataset] = [scan]

    if inf_cfg.get("use_llm_for_inference", False):
        if driver_residue:
            comms: dict[int, set[str]] = {}
            for ent, lab in labels.items():
                comms.setdefault(lab, set()).add(ent)
            communities = list(comms.values())
        else:
            communities = community_residues(
                labels,
                top_k=5,
                per_comm=inf_cfg.get("within_community_max_entities", 200),
            )
        model = model or make_model(config)
        llm_rows = infer_with_model(base, communities, config, model)
        if llm_rows:
            tbl = pa.table(
                {
                    "subject": pa.array([t["subject"] for t in llm_rows], pa.string()),
                    "predicate": pa.array([t["predicate"] for t in llm_rows], pa.string()),
                    "object": pa.array([t["object"] for t in llm_rows], pa.string()),
                    "inferred": pa.array([True] * len(llm_rows), pa.bool_()),
                }
            )
            parts.append(
                ray.data.from_arrow(tbl).map_batches(
                    lambda b: _ensure_lineage(b, "llm_inference"), batch_format="pyarrow"
                )
            )

    t_mode = inf_cfg.get("transitive_mode", "auto")
    if t_mode == "auto":
        # Broadcast while the residue is broadcastable; shuffle join
        # beyond (~2M distinct pairs ≈ a few hundred MB per worker).
        t_mode = "broadcast" if driver_residue else "shuffle"
    if t_mode == "broadcast" and edges_pd is None:
        edges_pd = edges.to_pandas()  # explicit user override of the gate
    if t_mode == "broadcast":
        parts.append(
            infer_transitive_broadcast(
                edges_pd,
                max_fanout_per_mid=max_fanout_per_mid,
                num_blocks=num_partitions,
            )
        )
    else:
        parts.append(
            infer_transitive(
                scan, num_partitions=num_partitions, max_fanout_per_mid=max_fanout_per_mid
            )
        )

    from .lexical import EXACT_THRESHOLD, _exact_lexical, infer_lexical_fast

    if edges_pd is None and lexical_mode in ("auto", "shuffle"):
        lexical_mode = "shuffle"  # residue over the gate: join path only
    if edges_pd is None and lexical_mode in ("exact", "blocked"):
        edges_pd = edges.to_pandas()  # explicit user override of the gate
    if lexical_mode != "shuffle":
        entities = sorted(set(edges_pd["subject"]) | set(edges_pd["object"]))
        existing_pairs = set(zip(edges_pd["subject"], edges_pd["object"]))
    if lexical_mode == "auto":
        lexical_mode = "exact" if len(entities) <= EXACT_THRESHOLD else "blocked"
    if lexical_mode == "exact":
        rows = _exact_lexical(entities, existing_pairs)
        tbl = pa.table(
            {
                "subject": pa.array([r[0] for r in rows], pa.string()),
                "predicate": pa.array([r[1] for r in rows], pa.string()),
                "object": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        parts.append(
            ray.data.from_arrow(tbl).map_batches(
                lambda b: _ensure_lineage(
                    b.append_column("inferred", pa.array([True] * len(b), pa.bool_())),
                    "lexical",
                ),
                batch_format="pyarrow",
            )
        )
    elif lexical_mode == "blocked":
        parts.append(
            infer_lexical_fast(entities, existing_pairs, num_blocks=num_partitions)
        )
    else:  # "shuffle": join-based scale path (residue too big to collect)
        parts.append(infer_lexical(scan, mode="blocked", num_partitions=num_partitions))

    # Under the driver gate the inferred parts are bounded (fanout
    # caps / capped pair sets) — materialize them and, when inference
    # added NOTHING (common on well-canonicalized corpora), skip the
    # final union+dedup shuffle outright: ``scan`` is already G5-
    # deduped when ``prededup_input`` ran. Over the gate the parts are
    # unbounded — keep the streaming union.
    if driver_residue and prededup_input:
        extras = [p.materialize() for p in parts[1:]]
        if sum(p.count() for p in extras) == 0:
            deduped = parts[0]
        else:
            deduped = dedup_triples(parts[0].union(*extras))
    else:
        deduped = dedup_triples(parts[0].union(*parts[1:]))

    def _final(batch: pa.Table) -> pa.Table:
        preds = pa.array(
            [limit_predicate_length(p) for p in batch["predicate"].to_pylist()],
            pa.string(),
        )
        batch = batch.set_column(
            batch.schema.get_field_index("predicate"), "predicate", preds
        )
        return batch.filter(pc.invert(pc.equal(batch["subject"], batch["object"])))

    final = deduped.map_batches(_final, batch_format="pyarrow")
    return final, labels
