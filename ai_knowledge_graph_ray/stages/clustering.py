"""Distributed spherical k-means (Lloyd's) and SemDeDup-style
semantic deduplication over an embedding column (``list<float>``).

Layout independence: every vector is unit-normalized and rounded ONCE
to fixed-point int64 (scale 2^20); per-batch partial sums are integer,
so the cross-batch reduction commutes — the fitted centroids, and
therefore every assignment, are identical at any block layout /
parallelism (the ``pagerank_int`` trick applied to Lloyd's).
Distances are evaluated in float64 FROM those deterministic integers.

Residue policy (repo rule: count, then collect): per-iteration
partials are one row per (block, cluster); they are collected on the
driver under ``driver_max_partials`` and combined through a bucketed
integer reduce over it — both paths bit-equal (``test_clustering``).

Semantic dedup follows SemDeDup (Abbas et al. 2023, arXiv:2303.09540,
public): cluster with k-means, then mark within-cluster pairs with
cosine >= threshold as duplicates and keep the smallest id. Pairs
split across clusters are not compared — that is the method's
documented recall trade (it is what makes it O(n^2/k) instead of
O(n^2)). Within-cluster comparison is capped against the
``max_anchors`` smallest ids, bounding hot-cluster work the same way
``dedup.py`` caps per-bucket pairs.

The reference has no clustering operator; this extends the engine's
near-dup family (SURVEY.md §2.7) down the embedding axis at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .infer import bucketed_reduce, normalize_blocks

FIXED_SCALE = 1 << 20

ASSIGN_SCHEMA = pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64())])
_PARTIAL_SCHEMA = pa.schema(
    [("cluster", pa.int64()), ("count", pa.int64()), ("sums", pa.binary())]
)

_LEHMER_MULT = 48271
_LEHMER_MOD = (1 << 31) - 1


def _fixed_unit(mat: np.ndarray) -> np.ndarray:
    """Unit-normalize rows and round once to int64 fixed point — the
    single lossy step; everything downstream is exact."""
    mat = mat.astype(np.float64)
    unit = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    return np.round(unit * FIXED_SCALE).astype(np.int64)


def _assign(fixed: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest (max cosine) centroid per row; first-max tie-break.
    ``cents`` is float64 derived deterministically from integer sums,
    ``fixed`` is exact int64 — the product is the same everywhere."""
    return np.argmax((fixed / FIXED_SCALE) @ cents.T, axis=1)


def _init_centroids(
    ds: ray.data.Dataset, k: int, vec_col: str, id_col: str
) -> np.ndarray:
    """Deterministic, partition-independent seeds: the k rows with the
    smallest Lehmer rank of id (a fixed pseudo-random permutation —
    reproducible in any engine, unlike RandomState over a sample whose
    content depends on block layout)."""
    from .infer import local_topk_rows

    ranked = ds.map_batches(
        lambda b: pd.DataFrame(
            {
                "rank": (b[id_col].to_numpy().astype(np.int64) * _LEHMER_MULT)
                % _LEHMER_MOD,
                id_col: b[id_col],
                vec_col: b[vec_col],
            }
        ),
        batch_format="pandas",
    )
    rows = local_topk_rows(ranked, ["rank", id_col], k, ascending=True)
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return (_fixed_unit(mat) / FIXED_SCALE).astype(np.float64)


def kmeans_fit_distributed(
    ds: ray.data.Dataset,
    k: int,
    *,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    driver_max_partials: int = 200_000,
) -> np.ndarray:
    """Fit ``k`` unit-sphere centroids with ``iters`` Lloyd rounds.

    Each round: broadcast centroids -> one map pass emits per-block
    integer partial sums (<= k rows/block) -> combine (driver under
    the gate, bucketed integer reduce over it) -> recompute unit
    centroids from the EXACT global integer sums. Empty clusters keep
    their previous centroid."""
    dim_probe = ds.take(1)
    if not dim_probe:
        raise ValueError("kmeans over an empty dataset")
    dim = len(dim_probe[0][vec_col])
    cents = _init_centroids(ds, k, vec_col, id_col)
    k = len(cents)

    vecs = ds.select_columns([id_col, vec_col]).materialize()

    for _ in range(iters):
        cents_ref = ray.put(cents)

        def _partial(b: pd.DataFrame, _ref=cents_ref) -> pd.DataFrame:
            c = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
            fixed = _fixed_unit(np.stack(b[vec_col].to_numpy()))
            a = _assign(fixed, c)
            out_c, out_n, out_s = [], [], []
            for cl in np.unique(a):
                m = fixed[a == cl]
                out_c.append(int(cl))
                out_n.append(len(m))
                out_s.append(m.sum(axis=0, dtype=np.int64).tobytes())
            return pd.DataFrame({"cluster": out_c, "count": out_n, "sums": out_s})

        partials = normalize_blocks(
            vecs.map_batches(_partial, batch_format="pandas", batch_size=None),
            _PARTIAL_SCHEMA,
        ).materialize()

        def _combine_frame(g: pd.DataFrame) -> pd.DataFrame:
            out_c, out_n, out_s = [], [], []
            for cl, grp in g.groupby("cluster", sort=True):
                out_c.append(int(cl))
                out_n.append(int(grp["count"].sum()))
                mats = np.stack(
                    [np.frombuffer(x, dtype=np.int64) for x in grp["sums"]]
                )
                out_s.append(mats.sum(axis=0, dtype=np.int64).tobytes())
            return pd.DataFrame({"cluster": out_c, "count": out_n, "sums": out_s})

        if partials.count() <= driver_max_partials:
            combined = _combine_frame(partials.to_pandas())
        else:
            combined = bucketed_reduce(
                partials,
                ["cluster"],
                _combine_frame,
                _PARTIAL_SCHEMA,
                combiner=_combine_frame,
            ).to_pandas()

        new = cents.copy()
        for _, row in combined.iterrows():
            sums = np.frombuffer(row["sums"], dtype=np.int64).astype(np.float64)
            mean = sums / (row["count"] * FIXED_SCALE)
            norm = np.linalg.norm(mean)
            if norm > 1e-12:
                new[int(row["cluster"])] = mean / norm
        cents = new
        if cents.shape[1] != dim:
            raise ValueError("embedding dim changed mid-dataset")
    return cents


def kmeans_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """``(vec_id, cluster)`` — one stateless map pass against the
    broadcast centroid matrix."""
    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _map(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        fixed = _fixed_unit(np.stack(b[vec_col].to_numpy()))
        return pd.DataFrame(
            {
                "vec_id": b[id_col].to_numpy().astype(np.int64),
                "cluster": _assign(fixed, c).astype(np.int64),
            }
        )

    return normalize_blocks(
        ds.select_columns([id_col, vec_col]).map_batches(_map, batch_format="pandas"),
        ASSIGN_SCHEMA,
    )


MAPPING_SCHEMA = pa.schema([("vec_id", pa.int64()), ("dup_of", pa.int64())])


def semantic_dedup(
    ds: ray.data.Dataset,
    *,
    k: int = 10,
    iters: int = 5,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_anchors: int = 10_000,
    driver_max_partials: int = 200_000,
) -> ray.data.Dataset:
    """SemDeDup: ``(vec_id, dup_of)`` for embedding near-duplicates,
    comparing only WITHIN k-means clusters (O(n^2/k) verify work).

    One bucketed shuffle keyed by cluster id; inside each cluster the
    cosine matrix is evaluated against the ``max_anchors`` smallest
    ids (bounding a hot cluster exactly like ``max_pairs_per_bucket``
    bounds a hot LSH bucket), duplicate groups are closed with a local
    union-find, and each non-representative member maps to its group's
    min id. Same output contract as :func:`~.dedup.embedding_dedup`."""
    cents = kmeans_fit_distributed(
        ds,
        k,
        iters=iters,
        vec_col=vec_col,
        id_col=id_col,
        driver_max_partials=driver_max_partials,
    )
    cents_ref = ray.put(cents)

    def _tag(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        fixed = _fixed_unit(np.stack(b[vec_col].to_numpy()))
        return pd.DataFrame(
            {
                "vec_id": b[id_col].to_numpy().astype(np.int64),
                "cluster": _assign(fixed, c).astype(np.int64),
                "vec": [v.tobytes() for v in fixed],
            }
        )

    tagged = ds.select_columns([id_col, vec_col]).map_batches(
        _tag, batch_format="pandas"
    )

    def _dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        out_id: list[int] = []
        out_rep: list[int] = []
        for _, grp in g.groupby("cluster", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("vec_id", kind="stable")
            ids = grp["vec_id"].to_numpy()
            mat = (
                np.stack([np.frombuffer(v, dtype=np.int64) for v in grp["vec"]])
                / FIXED_SCALE
            )
            anchors = min(len(ids), max_anchors)
            sims = mat @ mat[:anchors].T  # (n, anchors)
            # local union-find over threshold edges (i > j anchor)
            parent = np.arange(len(ids))

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            ii, jj = np.nonzero(sims >= threshold)
            for i, j in zip(ii, jj):
                if i <= j:
                    continue
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
            for i in range(len(ids)):
                r = find(i)
                if r != i:
                    out_id.append(int(ids[i]))
                    out_rep.append(int(ids[r]))
        return pd.DataFrame({"vec_id": out_id, "dup_of": out_rep})

    return bucketed_reduce(
        tagged,
        ["cluster"],
        _dedup_cluster,
        MAPPING_SCHEMA,
    )


CENTROID_SUM_SCHEMA = pa.schema(
    [("grp", pa.string()), ("dim", pa.int64()),
     ("sum_fixed", pa.int64()), ("n", pa.int64())]
)


def grouped_centroid_sums(
    ds: ray.data.Dataset,
    group_col: str,
    *,
    vec_col: str = "embedding",
    scale: int = FIXED_SCALE,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group embedding centroid SUFFICIENT STATISTICS in long form:
    ``(grp, dim, sum_fixed, n)`` where ``sum_fixed`` is the exact
    integer sum of ``floor(vec[dim] * scale)`` over the group's
    vectors — the class-centroid primitives (nearest-centroid
    classifiers, SemDeDup seeding, per-source embedding drift).

    Quantization here is FLOOR, not round: DuckDB ``floor`` and
    ``numpy.floor`` agree on every double, while round's half-tie
    behavior differs (banker's vs half-away), so floor is the form a
    hash-exact SQL twin can reproduce. One map pass emits per-batch
    per-group per-dim partials (vectorized: one matmul-free groupby
    over a (rows x dims) reshape), one bucketed integer sum."""

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or vec_col not in b.columns:
            return pd.DataFrame(
                {"grp": pd.Series([], dtype=object),
                 "dim": pd.Series([], dtype="int64"),
                 "sum_fixed": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        fixed = np.floor(mat * scale).astype(np.int64)
        grp = b[group_col].astype(str).to_numpy(object)
        frame = pd.DataFrame(fixed)
        frame["grp"] = grp
        agg = frame.groupby("grp", sort=False).agg(["sum", "size"])
        dims = fixed.shape[1]
        sums = agg.xs("sum", axis=1, level=1).to_numpy(np.int64)
        n_per = agg.xs("size", axis=1, level=1).iloc[:, 0].to_numpy(np.int64)
        groups = agg.index.to_numpy(object)
        return pd.DataFrame(
            {
                "grp": np.repeat(groups, dims),
                "dim": np.tile(np.arange(1, dims + 1, dtype=np.int64), len(groups)),
                "sum_fixed": sums.reshape(-1),
                "n": np.repeat(n_per, dims),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["grp", "dim"], sort=False, as_index=False)[
            ["sum_fixed", "n"]
        ].sum()

    return bucketed_reduce(
        ds.select_columns([group_col, vec_col]).map_batches(
            _partial, batch_format="pandas", batch_size=None
        ),
        ["grp", "dim"],
        _reduce,
        CENTROID_SUM_SCHEMA,
        num_buckets=num_buckets,
    )


GRAM_SCHEMA = pa.schema(
    [("i", pa.int64()), ("j", pa.int64()),
     ("sum_fixed", pa.int64()), ("n", pa.int64())]
)


def embedding_gram(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    scale: int = 1 << 10,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact integer second-moment (Gram) matrix of an embedding
    column in long upper-triangle form ``(i, j, sum_fixed, n)`` with
    ``i <= j`` (1-based dims) — the PCA / whitening / covariance
    sufficient statistic (covariance = gram/n - mean outer product,
    derivable together with :func:`grouped_centroid_sums`).

    Each vector quantizes ONCE to ``floor(v * scale)`` int64 (floor,
    not round — the only rounding mode DuckDB and numpy agree on for
    every double, same contract as ``grouped_centroid_sums``); every
    downstream product/sum is exact integer arithmetic, so the result
    is bit-identical at any block layout and hash-exact vs the SQL
    twin. One map pass computes the per-batch d x d integer matmul
    (``fixed.T @ fixed`` — vectorized, no per-row Python) and emits
    the d(d+1)/2 upper-triangle partials; one bucketed integer sum
    over the tiny (i, j) key space finishes.

    Overflow bound: |fixed| <= scale so each product is <= scale^2 and
    the global sum needs n * scale^2 < 2^63 — at the default 2^10
    scale that is ~8.8e12 vectors, comfortably past a 100-TB corpus;
    raise ``scale`` only with a narrower row-count bound.
    """

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or vec_col not in b.columns:
            return pd.DataFrame(
                {"i": pd.Series([], dtype="int64"),
                 "j": pd.Series([], dtype="int64"),
                 "sum_fixed": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        fixed = np.floor(mat * scale).astype(np.int64)
        gram = fixed.T @ fixed
        d = gram.shape[0]
        iu, ju = np.triu_indices(d)
        return pd.DataFrame(
            {
                "i": (iu + 1).astype(np.int64),
                "j": (ju + 1).astype(np.int64),
                "sum_fixed": gram[iu, ju],
                "n": np.int64(len(b)),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["i", "j"], sort=False, as_index=False)[
            ["sum_fixed", "n"]
        ].sum()

    return bucketed_reduce(
        ds.select_columns([vec_col]).map_batches(
            _partial, batch_format="pandas", batch_size=None
        ),
        ["i", "j"],
        _reduce,
        GRAM_SCHEMA,
        num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# Greedy k-center (farthest-point) coreset selection
# ---------------------------------------------------------------------------

KCENTER_SCHEMA = pa.schema(
    [("rnk", pa.int64()), ("vec_id", pa.int64()), ("sel_dist", pa.int64())]
)


def kcenter_select(
    ds: ray.data.Dataset,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = FIXED_SCALE,
) -> ray.data.Dataset:
    """Greedy farthest-point traversal (Gonzalez 1985; the k-center
    coreset selection of Sener & Savarese 2018): pick the min-id point,
    then ``k-1`` times the point FARTHEST from the chosen set. Returns
    ``(rnk, vec_id, sel_dist)`` where ``sel_dist`` is the squared
    fixed-point L2 distance at selection time — the non-increasing
    coverage-radius sequence that makes the selection auditable.

    Exactness: every vector quantizes ONCE to ``floor(v * scale)``
    int64 (floor — DuckDB and numpy agree on every double; round's
    half-ties don't), distances are exact int64 sums (dim x (2*scale)^2
    headroom), argmax ties break on min id — so the selection is
    bit-identical at any block layout AND hash-matches an unrolled SQL
    twin.

    Scale shape: greedy k-center is inherently ``k`` passes. Each round
    is map-only — the running min-distance column ``md`` rides the
    materialized state, the new center broadcasts via ``ray.put``, and
    the global argmax is a per-block top-1 (one candidate row per
    block, carrying its vector so the driver never re-scans to fetch
    the winner). NO shuffle at any point; driver traffic is
    ``k x n_blocks`` candidate rows. Stops early (fewer than ``k``
    rows) when the farthest remaining distance is 0 — every point is
    already a duplicate of some center.
    """
    if k < 1:
        return ray.data.from_arrow(KCENTER_SCHEMA.empty_table())

    state_schema = pa.schema(
        [("vec_id", pa.int64()), ("q", pa.binary()), ("md", pa.int64())]
    )
    cand_schema = pa.schema(
        [("vec_id", pa.int64()), ("md", pa.int64()), ("q", pa.binary())]
    )

    def _quant(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                 "q": pd.Series([], dtype=object),
                 "md": pd.Series([], dtype="int64")}
            )
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        fixed = np.floor(mat * scale).astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": b[id_col].to_numpy(np.int64),
                "q": [row.tobytes() for row in fixed],
                "md": np.zeros(len(b), np.int64),
            }
        )

    state = normalize_blocks(
        ds.select_columns([id_col, vec_col]).map_batches(
            _quant, batch_format="pandas", batch_size=None
        ),
        state_schema,
    ).materialize()
    if state.count() == 0:
        return ray.data.from_arrow(KCENTER_SCHEMA.empty_table())

    def _block_best(by_md: bool):
        def _f(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame(
                    {"vec_id": pd.Series([], dtype="int64"),
                     "md": pd.Series([], dtype="int64"),
                     "q": pd.Series([], dtype=object)}
                )
            if by_md:
                i = b.sort_values(
                    ["md", "vec_id"], ascending=[False, True], kind="stable"
                ).index[0]
            else:
                i = b["vec_id"].idxmin()
            row = b.loc[[i]]
            return pd.DataFrame(
                {"vec_id": row["vec_id"].to_numpy(np.int64),
                 "md": row["md"].to_numpy(np.int64),
                 "q": row["q"].to_numpy(object)}
            )
        return _f

    def _merge(cands: pd.DataFrame, by_md: bool) -> pd.Series:
        if by_md:
            return cands.sort_values(
                ["md", "vec_id"], ascending=[False, True], kind="stable"
            ).iloc[0]
        return cands.sort_values("vec_id", kind="stable").iloc[0]

    def _pull(ds_state, by_md: bool) -> pd.Series:
        cands = normalize_blocks(
            ds_state.map_batches(
                _block_best(by_md), batch_format="pandas", batch_size=None
            ),
            cand_schema,
        ).to_pandas()  # bounded: one row per block
        return _merge(cands, by_md)

    seed = _pull(state, by_md=False)
    selected = [(0, int(seed["vec_id"]), 0)]
    center_q = np.frombuffer(seed["q"], dtype=np.int64)

    def _update(b: pd.DataFrame, cq_ref, first: bool) -> pd.DataFrame:
        if len(b) == 0:
            return b
        cq = ray.get(cq_ref)
        mat = np.stack([np.frombuffer(x, dtype=np.int64) for x in b["q"]])
        d = ((mat - cq[None, :]) ** 2).sum(axis=1)
        out = b.copy()
        out["md"] = d if first else np.minimum(b["md"].to_numpy(np.int64), d)
        return out

    first = True
    for r in range(1, k):
        ref = ray.put(center_q)
        state = normalize_blocks(
            state.map_batches(
                lambda b, _ref=ref, _f=first: _update(b, _ref, _f),
                batch_format="pandas",
                batch_size=None,
            ),
            state_schema,
        ).materialize()
        first = False
        best = _pull(state, by_md=True)
        if int(best["md"]) == 0:
            break
        selected.append((r, int(best["vec_id"]), int(best["md"])))
        center_q = np.frombuffer(best["q"], dtype=np.int64)

    out = pd.DataFrame(selected, columns=["rnk", "vec_id", "sel_dist"])
    return ray.data.from_arrow(
        pa.Table.from_pandas(out.astype("int64"), schema=KCENTER_SCHEMA,
                             preserve_index=False)
    )
