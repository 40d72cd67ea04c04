"""Product quantization (PQ) for vector search at corpus scale
(Jegou, Douze, Schmid 2011 — public method).

At 100 TB an embedding column is the dominant byte cost: a 64-dim
float32 vector is 256 bytes, its PQ code ``m`` bytes — a 32-64x
compression that turns an out-of-memory scan into an in-memory one.
The pipeline shape:

- :func:`pq_train` — ``m`` independent L2 k-means, one per subspace,
  ALL trained in the same single map pass per Lloyd round: every batch
  quantizes once to int64 fixed point and emits integer partial sums
  per ``(subspace, centroid)``; the cross-batch reduction is exact
  integer addition, so the codebooks are bit-identical at any block
  layout (the ``clustering.py`` fixed-point trick, unnormalized
  because PQ quantizes raw subvectors, not directions).
- :func:`pq_encode` — map-only: each vector becomes ``m`` uint8
  centroid ids packed in one ``binary`` column.
- :func:`pq_search` — asymmetric distance computation (ADC): the
  per-query ``(m, k)`` lookup table of exact subspace distances is
  broadcast with the queries; each batch scores its codes with ``m``
  numpy ``take`` gathers + one sum (no decode, no per-row Python),
  emits a local top-k, and a final per-query reduce merges candidates
  (the ``knn_brute`` fan-in shape). Scores are float64 sums over a
  fixed per-row term order — layout-independent.

Partials residue per round is ``m x k`` rows per block — counted and
combined under the same gate policy as ``kmeans_fit_distributed``.
The reference has no vector search; this extends the ANN family
(brute / IVF / IVF-indexed) with the memory-bound scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .infer import bucketed_reduce, normalize_blocks, pa_from_pandas

FIXED_SCALE = 1 << 20

_LEHMER_MULT = 48271
_LEHMER_MOD = (1 << 31) - 1

CODE_SCHEMA = pa.schema([("vec_id", pa.int64()), ("code", pa.binary())])
_PARTIAL_SCHEMA = pa.schema(
    [("sub", pa.int64()), ("cluster", pa.int64()),
     ("count", pa.int64()), ("sums", pa.binary())]
)


def _fixed(mat: np.ndarray) -> np.ndarray:
    """Quantize raw vectors once to int64 fixed point — the single
    lossy step; every downstream sum is exact."""
    return np.round(mat.astype(np.float64) * FIXED_SCALE).astype(np.int64)


def _sub_assign(fixed_sub: np.ndarray, cents_sub: np.ndarray) -> np.ndarray:
    """Nearest centroid (L2) per row for ONE subspace; first-min
    tie-break. ``cents_sub`` is float64 derived from exact integer
    sums, ``fixed_sub`` exact int64 — identical everywhere."""
    x = fixed_sub / FIXED_SCALE
    d = (
        (x**2).sum(1)[:, None]
        - 2.0 * (x @ cents_sub.T)
        + (cents_sub**2).sum(1)[None, :]
    )
    return np.argmin(d, axis=1)


def _init_codebooks(
    ds: ray.data.Dataset, m: int, k: int, vec_col: str, id_col: str
) -> np.ndarray:
    """Deterministic partition-independent seeds: the k smallest
    Lehmer-rank rows provide the initial centroids of EVERY subspace
    (standard PQ practice trains subspaces on the same sample)."""
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
    fixed = _fixed(mat) / FIXED_SCALE
    dim = fixed.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # (m, k, dsub); if fewer than k seed rows exist, k shrinks
    return np.stack([fixed[:, s * dsub : (s + 1) * dsub] for s in range(m)])


def pq_train(
    ds: ray.data.Dataset,
    *,
    m: int = 4,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    driver_max_partials: int = 200_000,
) -> np.ndarray:
    """Fit ``(m, k, dim/m)`` PQ codebooks — all subspaces in one map
    pass per Lloyd round, integer partial sums, gated combine."""
    books = _init_codebooks(ds, m, k, vec_col, id_col)
    m_eff, k_eff, dsub = books.shape

    vecs = ds.select_columns([id_col, vec_col]).materialize()

    for _ in range(iters):
        books_ref = ray.put(books)

        def _partial(b: pd.DataFrame, _ref=books_ref) -> pd.DataFrame:
            bk = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
            fixed = _fixed(np.stack(b[vec_col].to_numpy()))
            out_sub, out_c, out_n, out_s = [], [], [], []
            for s in range(len(bk)):
                sub = fixed[:, s * dsub : (s + 1) * dsub]
                a = _sub_assign(sub, bk[s])
                for cl in np.unique(a):
                    msk = sub[a == cl]
                    out_sub.append(s)
                    out_c.append(int(cl))
                    out_n.append(len(msk))
                    out_s.append(msk.sum(axis=0, dtype=np.int64).tobytes())
            return pd.DataFrame(
                {"sub": out_sub, "cluster": out_c, "count": out_n, "sums": out_s}
            )

        partials = normalize_blocks(
            vecs.map_batches(_partial, batch_format="pandas", batch_size=None),
            _PARTIAL_SCHEMA,
        ).materialize()

        def _combine_frame(g: pd.DataFrame) -> pd.DataFrame:
            out_sub, out_c, out_n, out_s = [], [], [], []
            for (s, cl), grp in g.groupby(["sub", "cluster"], sort=True):
                out_sub.append(int(s))
                out_c.append(int(cl))
                out_n.append(int(grp["count"].sum()))
                mats = np.stack(
                    [np.frombuffer(x, dtype=np.int64) for x in grp["sums"]]
                )
                out_s.append(mats.sum(axis=0, dtype=np.int64).tobytes())
            return pd.DataFrame(
                {"sub": out_sub, "cluster": out_c, "count": out_n, "sums": out_s}
            )

        if partials.count() <= driver_max_partials:
            combined = _combine_frame(partials.to_pandas())
        else:
            combined = bucketed_reduce(
                partials,
                ["sub", "cluster"],
                _combine_frame,
                _PARTIAL_SCHEMA,
                combiner=_combine_frame,
            ).to_pandas()

        new = books.copy()
        for _, row in combined.iterrows():
            sums = np.frombuffer(row["sums"], dtype=np.int64).astype(np.float64)
            new[int(row["sub"]), int(row["cluster"])] = sums / (
                row["count"] * FIXED_SCALE
            )
        books = new
    return books


def pq_encode(
    ds: ray.data.Dataset,
    codebooks: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """``(vec_id, code)`` — each vector's ``m`` uint8 centroid ids in
    one binary column (``m`` bytes/vector). Map-only."""
    m, k, dsub = codebooks.shape
    if k > 256:
        raise ValueError("pq_encode packs uint8 ids: k must be <= 256")
    books_ref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def _enc(b: pd.DataFrame) -> pd.DataFrame:
        bk = ray.get(books_ref) if isinstance(books_ref, ray.ObjectRef) else books_ref
        fixed = _fixed(np.stack(b[vec_col].to_numpy()))
        codes = np.empty((len(b), m), dtype=np.uint8)
        for s in range(m):
            codes[:, s] = _sub_assign(fixed[:, s * dsub : (s + 1) * dsub], bk[s])
        return pd.DataFrame(
            {
                "vec_id": b[id_col].to_numpy().astype(np.int64),
                "code": [c.tobytes() for c in codes],
            }
        )

    return normalize_blocks(
        ds.select_columns([id_col, vec_col]).map_batches(
            _enc, batch_format="pandas", batch_size=None
        ),
        CODE_SCHEMA,
    )


def pq_search(
    codes: ray.data.Dataset,
    codebooks: np.ndarray,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 10,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """ADC top-k: ``(query_id, vec_id, score)`` where score is the
    NEGATED approximate squared L2 distance (higher = closer, matching
    ``knn_brute(metric="l2")``). Ties break on lower vec_id."""
    m, kc, dsub = codebooks.shape
    q_fixed = _fixed(np.asarray(query_mat, dtype=np.float64)) / FIXED_SCALE
    # (q, m, kc) exact subspace distance tables
    luts = np.empty((len(q_fixed), m, kc), dtype=np.float64)
    for s in range(m):
        qs = q_fixed[:, s * dsub : (s + 1) * dsub]
        cs = codebooks[s]
        luts[:, s, :] = (
            (qs**2).sum(1)[:, None]
            - 2.0 * (qs @ cs.T)
            + (cs**2).sum(1)[None, :]
        )
    q_ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64), "luts": luts})

    def _scan(b: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        ids = b["vec_id"].to_numpy().astype(np.int64)
        code_mat = np.frombuffer(
            b"".join(b["code"].to_list()), dtype=np.uint8
        ).reshape(len(b), m)
        out = []
        for qi, qid in enumerate(q["ids"]):
            # dist[n] = sum_s LUT[qi, s, code[n, s]] — m gathers + sum
            dist = np.zeros(len(b), dtype=np.float64)
            for s in range(m):
                dist += q["luts"][qi, s][code_mat[:, s]]
            if exclude_self:
                dist = np.where(ids == qid, np.inf, dist)
            top = np.lexsort((ids, dist))[: min(k, len(b))]
            top = top[np.isfinite(dist[top])]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": np.int64(qid),
                        "vec_id": ids[top],
                        "score": -dist[top],
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)

    out_schema = pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("score", pa.float64())]
    )

    def _reduce(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.sort_values(
            ["score", "vec_id"], ascending=[False, True], kind="stable"
        ).head(k)
        return pa_from_pandas(g[["query_id", "vec_id", "score"]], out_schema)

    cand = codes.map_batches(_scan, batch_format="pandas", batch_size=None)
    return normalize_blocks(
        cand.groupby("query_id").map_groups(_reduce, batch_format="pandas"),
        out_schema,
    )
