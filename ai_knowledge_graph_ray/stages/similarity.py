"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_brute` — exact cosine top-k: the query matrix is
  broadcast once via ``ray.put``; each batch computes a vectorized
  ``numpy`` matmul and emits only its local top-k per query; a final
  small ``groupby(query_id)`` reduces the per-batch candidates to the
  global top-k. Work shipped per batch: O(batch x q); network: only
  k x q x n_batches candidate rows.
- :func:`knn_ivf` — IVF-style scale path: coarse centroids are fit
  once (sampled k-means on the driver — deterministic seed), every row
  is assigned to its nearest centroid inside ``map_batches``, and
  queries probe only the ``n_probe`` closest centroid partitions.

All math in float64 so results are bit-comparable with the DuckDB
oracle (``list_cosine_similarity`` computes in double).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .infer import pa_from_pandas


def _unit(mat: np.ndarray) -> np.ndarray:
    return mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)


class _BatchTopK:
    def __init__(
        self, q_ref, k: int, vec_col: str, id_col: str, exclude_self: bool,
        metric: str = "cosine",
    ) -> None:
        q = ray.get(q_ref)
        self.q_ids = q["ids"]
        self.metric = metric
        raw = q["mat"].astype(np.float64)
        self.q_mat = _unit(raw) if metric == "cosine" else raw
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.exclude_self = exclude_self
        # per-query excluded candidate ids (e.g. near-dups of the
        # query) — masked BEFORE top-k selection, once per actor
        self.exclude = {
            int(qid): np.asarray(sorted(vals), dtype=np.int64)
            for qid, vals in (q.get("exclude") or {}).items()
        }
        # attribute-based exclusion: candidates whose attr_col value
        # equals the query's are masked (hard negatives must come
        # from a different source/group). Scales without id lists —
        # one value per query rides the broadcast.
        self.attr_col = q.get("attr_col")
        self.attr_vals = q.get("attr_vals") or {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy()
        raw = np.stack(batch[self.vec_col].to_numpy()).astype(np.float64)
        if self.metric == "cosine":
            sims = self.q_mat @ _unit(raw).T  # (q, n)
        else:  # l2: higher score = closer (negated squared distance)
            sims = -(
                (self.q_mat**2).sum(1)[:, None]
                - 2.0 * (self.q_mat @ raw.T)
                + (raw**2).sum(1)[None, :]
            )
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            s = sims[qi]
            mask = np.ones(len(ids), dtype=bool)
            if self.exclude_self:
                mask &= ids != qid
            exc = self.exclude.get(int(qid))
            if exc is not None and len(exc):
                mask &= ~np.isin(ids, exc, assume_unique=False)
            if self.attr_col is not None and int(qid) in self.attr_vals:
                mask &= (
                    batch[self.attr_col].to_numpy() != self.attr_vals[int(qid)]
                )
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            order = idx[np.lexsort((ids[idx], -s[idx]))][: self.k]
            out_q.extend([qid] * len(order))
            out_id.extend(ids[order])
            out_s.extend(s[order])
        return pd.DataFrame(
            {"query_id": out_q, self.id_col: out_id, "score": np.array(out_s, dtype=np.float64)}
        )


def knn_brute(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    with_scores: bool = False,
    metric: str = "cosine",
    exclude: dict | None = None,
    exclude_attr: tuple[str, dict] | None = None,
) -> ray.data.Dataset:
    """Exact top-k of each query against the dataset — ``metric`` is
    ``"cosine"`` (unit-normalized dot) or ``"l2"`` (euclidean; scores
    are negated squared distances so "higher = closer" holds for both).

    Returns ``(query_id, vec_id[, score])`` with deterministic
    tie-break (higher score first, then lower vec_id). ``exclude``
    maps query id -> candidate ids to mask BEFORE top-k selection
    (hard-negative mining: drop the query's near-dups so they can't
    occupy negative slots); it is broadcast once with the query
    matrix, not re-shipped per batch. ``exclude_attr=(attr_col,
    {query_id: value})`` masks candidates whose ``attr_col`` equals
    the query's value (same-source exclusion) — scales without id
    lists."""
    assert metric in ("cosine", "l2")
    attr_col = exclude_attr[0] if exclude_attr else None
    q_ref = ray.put(
        {"ids": np.asarray(query_ids), "mat": np.asarray(query_mat),
         "exclude": exclude,
         "attr_col": attr_col,
         "attr_vals": ({int(k): v for k, v in exclude_attr[1].items()}
                       if exclude_attr else None)}
    )
    scan_cols = [id_col, vec_col] + ([attr_col] if attr_col else [])
    cand = ds.select_columns(scan_cols).map_batches(
        _BatchTopK,
        fn_constructor_kwargs={
            "q_ref": q_ref,
            "k": k,
            "vec_col": vec_col,
            "id_col": id_col,
            "exclude_self": exclude_self,
            "metric": metric,
        },
        batch_format="pandas",
        concurrency=(1, 8),
    )

    fields = [("query_id", pa.int64()), (id_col, pa.int64())] + (
        [("score", pa.float64())] if with_scores else []
    )
    out_schema = pa.schema(fields)

    def _reduce(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values(["score", id_col], ascending=[False, True], kind="stable").head(k)
        cols = ["query_id", id_col] + (["score"] if with_scores else [])
        return pa_from_pandas(g[cols], out_schema)

    from .infer import normalize_blocks

    return normalize_blocks(
        cand.groupby("query_id").map_groups(_reduce, batch_format="pandas"), out_schema
    )


def kmeans_fit(
    sample: np.ndarray, n_clusters: int, *, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Small deterministic k-means (Lloyd) on a driver-side sample —
    fits the IVF coarse quantizer. O(sample x clusters x iters)."""
    rng = np.random.RandomState(seed)
    x = _unit(sample.astype(np.float64))
    idx = rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)
    cents = x[idx].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _unit(cents)
    return cents


def ivf_build(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    n_clusters: int = 16,
    sample_size: int = 2000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 5,
) -> np.ndarray:
    """Materialize an IVF index: embeddings written as Parquet
    partitioned BY CENTROID ID (hive layout, one directory per list)
    plus the centroid matrix. ``knn_ivf_indexed`` then prunes whole
    partition directories at the read — the probe never scans rows of
    unprobed lists (the actual I/O saving ``knn_ivf``'s row filter
    cannot give).

    The index is built into a fresh temp dir and atomically swapped
    into place (``write_parquet`` APPENDS into existing partition dirs
    — NOTES.md item 6 — so building over a prior or interrupted index
    would duplicate vectors). A ``_SUCCESS`` marker is written last;
    readers must treat a marker-less directory as incomplete."""
    import os
    import shutil

    # Canonical sample order — see knn_ivf: the seeded init indexes
    # into the sample, so the sample must not inherit block order.
    sample = ds.select_columns([id_col, vec_col]).limit(sample_size).take_all()
    sample.sort(key=lambda r: r[id_col])
    mat = np.stack([r[vec_col] for r in sample])
    cents = kmeans_fit(mat, n_clusters, seed=seed)
    cents_ref = ray.put(cents)

    class _Assign:
        def __init__(self) -> None:
            self.cents = ray.get(cents_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            unit = _unit(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            batch = batch.copy()
            batch["list_id"] = np.argmax(unit @ self.cents.T, axis=1).astype(np.int64)
            return batch

    tmp_dir = f"{index_dir}.build.{os.getpid()}"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    ds.select_columns([id_col, vec_col]).map_batches(
        _Assign, batch_format="pandas", concurrency=(1, 8)
    ).write_parquet(os.path.join(tmp_dir, "lists"), partition_cols=["list_id"])
    np.save(os.path.join(tmp_dir, "centroids.npy"), cents)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.replace(tmp_dir, index_dir)
    return cents


def knn_ivf_indexed(
    index_dir: str,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    stats: dict | None = None,
) -> ray.data.Dataset:
    """Probed search over an ``ivf_build`` index: only the partition
    directories of the probed lists are read (block/file pruning, not
    row filtering). Pass ``stats={}`` to receive ``lists_read`` /
    ``n_lists`` / ``scan_fraction``."""
    import os

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    n_clusters = len(cents)
    qm = _unit(np.asarray(query_mat, dtype=np.float64))
    probe = np.argsort(-(qm @ cents.T), axis=1)[:, :n_probe]  # (q, n_probe)
    probe_sets = [set(map(int, row)) for row in probe]
    union_lists = sorted(set().union(*probe_sets))
    paths = [
        p
        for c in union_lists
        if os.path.isdir(p := os.path.join(index_dir, "lists", f"list_id={c}"))
    ]
    if stats is not None:
        stats["lists_read"] = len(paths)
        stats["n_lists"] = n_clusters
        stats["scan_fraction"] = len(paths) / max(1, n_clusters)
    out_schema = pa.schema([("query_id", pa.int64()), (id_col, pa.int64())])
    if not paths:
        return ray.data.from_arrow(out_schema.empty_table())

    # Only the probed partition directories' files are opened; each
    # row is then scored only for the queries that probed its list
    # (membership recomputed from the centroids — deterministic argmax,
    # identical to the build-time assignment).
    files = [
        os.path.join(p, f)
        for p in paths
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    lists_ds = ray.data.read_parquet(files)
    probe_ref = ray.put(probe_sets)
    cents_ref = ray.put(cents)
    q_ref = ray.put({"ids": np.asarray(query_ids), "mat": qm})

    class _ListTopK:
        def __init__(self) -> None:
            q = ray.get(q_ref)
            self.q_ids = q["ids"]
            self.q_mat = q["mat"]
            self.probe_sets = ray.get(probe_ref)
            self.cents = ray.get(cents_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch[id_col].to_numpy()
            mat = _unit(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            lists = np.argmax(mat @ self.cents.T, axis=1).astype(np.int64)
            sims = self.q_mat @ mat.T
            out_q, out_id, out_s = [], [], []
            for qi, qid in enumerate(self.q_ids):
                mask = np.isin(lists, list(self.probe_sets[qi]))
                if exclude_self:
                    mask &= ids != qid
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                s = sims[qi]
                order = idx[np.lexsort((ids[idx], -s[idx]))][:k]
                out_q.extend([qid] * len(order))
                out_id.extend(ids[order])
                out_s.extend(s[order])
            return pd.DataFrame(
                {
                    "query_id": out_q,
                    id_col: out_id,
                    "score": np.array(out_s, dtype=np.float64),
                }
            )

    cand = lists_ds.map_batches(_ListTopK, batch_format="pandas", concurrency=(1, 8))

    def _reduce(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values(["score", id_col], ascending=[False, True], kind="stable").head(k)
        return pa_from_pandas(g[["query_id", id_col]], out_schema)

    from .infer import normalize_blocks

    return normalize_blocks(
        cand.groupby("query_id").map_groups(_reduce, batch_format="pandas"), out_schema
    )


def knn_ivf(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_size: int = 2000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Approximate cosine top-k: IVF coarse quantizer + probed search.

    The centroid fit samples ``sample_size`` rows (one pass), then a
    single filtered brute pass runs only over rows whose centroid is
    among each query's ``n_probe`` nearest — at scale the dataset
    would be pre-partitioned by centroid id so the probe prunes whole
    blocks/files rather than filtering rows.
    """
    # Canonical sample ORDER (sorted by id): block arrival order is
    # nondeterministic, and kmeans_fit's seeded init indexes INTO the
    # sample — an order-dependent sample would make the quantizer (and
    # every acceptance floor downstream) flap run to run.
    sample = ds.select_columns([id_col, vec_col]).limit(sample_size).take_all()
    sample.sort(key=lambda r: r[id_col])
    mat = np.stack([r[vec_col] for r in sample])
    cents = kmeans_fit(mat, n_clusters)
    cents_ref = ray.put(cents)

    qm = _unit(np.asarray(query_mat, dtype=np.float64))
    probe = np.argsort(-(qm @ cents.T), axis=1)[:, :n_probe]  # (q, n_probe)
    probe_sets = [set(map(int, row)) for row in probe]
    probe_ref = ray.put(probe_sets)
    q_ref = ray.put({"ids": np.asarray(query_ids), "mat": qm})

    class _ProbedTopK:
        def __init__(self) -> None:
            q = ray.get(q_ref)
            self.q_ids = q["ids"]
            self.q_mat = q["mat"]
            self.cents = ray.get(cents_ref)
            self.probe_sets = ray.get(probe_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch[id_col].to_numpy()
            mat = _unit(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            assign = np.argmax(mat @ self.cents.T, axis=1)
            sims = self.q_mat @ mat.T
            out_q, out_id, out_s = [], [], []
            for qi, qid in enumerate(self.q_ids):
                mask = np.isin(assign, list(self.probe_sets[qi]))
                if exclude_self:
                    mask &= ids != qid
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                s = sims[qi]
                order = idx[np.lexsort((ids[idx], -s[idx]))][:k]
                out_q.extend([qid] * len(order))
                out_id.extend(ids[order])
                out_s.extend(s[order])
            return pd.DataFrame(
                {
                    "query_id": out_q,
                    id_col: out_id,
                    "score": np.array(out_s, dtype=np.float64),
                }
            )

    cand = ds.select_columns([id_col, vec_col]).map_batches(
        _ProbedTopK, batch_format="pandas", concurrency=(1, 8)
    )

    out_schema = pa.schema([("query_id", pa.int64()), (id_col, pa.int64())])

    def _reduce(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values(["score", id_col], ascending=[False, True], kind="stable").head(k)
        return pa_from_pandas(g[["query_id", id_col]], out_schema)

    from .infer import normalize_blocks

    return normalize_blocks(
        cand.groupby("query_id").map_groups(_reduce, batch_format="pandas"), out_schema
    )


RRF_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("vec_id", pa.int64()), ("rrf_micro", pa.int64())]
)


def rrf_fuse(
    ranked: list[ray.data.Dataset],
    *,
    k_const: int = 60,
    top_k: int = 10,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked
    retrieval lists: per query, each list contributes
    ``1_000_000 // (k_const + rank)`` to every item it ranked (rank
    1-based by ``(score desc, id asc)``), summed and re-ranked —
    all-integer, so the fused list is hash-exact cross-engine.

    Inputs are ``(query_id, id_col, score)`` datasets (e.g. two
    :func:`knn_brute` runs under different metrics). ONE bucketed
    shuffle keyed on the query: every list's rows for a query land in
    the same bucket, ranks + fusion + per-query top-k all vectorized
    inside the reduce."""
    import pandas as _pd

    from .infer import bucketed_reduce, normalize_blocks

    tagged = None
    for i, r in enumerate(ranked):
        t = r.map_batches(
            lambda b, src=i: _pd.DataFrame(
                {
                    "query_id": b["query_id"].to_numpy(np.int64),
                    id_col: b[id_col].to_numpy(np.int64),
                    "score": b["score"].to_numpy(np.float64),
                    "src": np.full(len(b), src, np.int64),
                }
            ),
            batch_format="pandas",
        )
        tagged = t if tagged is None else tagged.union(t)

    def _fuse(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["src", "query_id", "score", id_col],
            ascending=[True, True, False, True],
            kind="stable",
        )
        g["rank"] = g.groupby(["src", "query_id"], sort=False).cumcount() + 1
        g["pts"] = (1_000_000 // (k_const + g["rank"])).astype(np.int64)
        fused = g.groupby(["query_id", id_col], as_index=False)["pts"].sum()
        fused = fused.sort_values(
            ["query_id", "pts", id_col], ascending=[True, False, True], kind="stable"
        )
        out = fused.groupby("query_id", sort=False).head(top_k)
        return pd.DataFrame(
            {
                "query_id": out["query_id"].to_numpy(np.int64),
                id_col: out[id_col].to_numpy(np.int64),
                "rrf_micro": out["pts"].to_numpy(np.int64),
            }
        )

    return normalize_blocks(
        bucketed_reduce(tagged, ["query_id"], _fuse, RRF_SCHEMA),
        RRF_SCHEMA,
    )
