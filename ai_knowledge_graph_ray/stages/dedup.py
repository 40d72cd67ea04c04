"""Deduplication operators for web-scale corpora.

- :func:`exact_dedup` — content-hash partition + per-group min-id
  winner (the scalable generalization of the reference's in-memory
  seen-set dedups, ``clean_graph.py:160-170`` / G5/G6).
- :func:`minhash_lsh_dedup` — shingle -> MinHash -> banded LSH
  bucketing -> candidate pairs -> Jaccard verify -> connected
  components -> ``(doc_id, dup_of)``.
- :func:`simhash_dedup` — 64-bit SimHash, 4x16-bit band blocking,
  Hamming-distance verify.
- :func:`ngram_jaccard_pairs` — exact word-n-gram Jaccard over
  candidate pairs (inverted-index blocking), no sketch approximation.
- :func:`embedding_dedup` — cosine near-dup over an embedding column
  (random-hyperplane LSH bucketing at scale; exact within buckets).

All follow the same shape: vectorized per-batch signature extraction,
one ``groupby`` on the bucket key (the only shuffle), bounded
within-bucket pairwise work, then a driver-side union-find over the
(small) surviving candidate-pair set. Pair generation per bucket is
capped (``max_pairs_per_bucket``) as the skew defense against
degenerate buckets.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import normalize_blocks, pa_from_pandas

_WORD_RE = re.compile(r"\w+")


def _md5_int(data: bytes) -> int:
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep one row per distinct ``text`` (the min ``id``).

    Hash-partition on md5(text) (the groupby shuffle key is the hash,
    so giant texts don't travel twice), keep min-id per group.
    """

    from .infer import bucketed_reduce

    base_schema = ds.schema().base_schema
    out_schema = pa.schema(list(base_schema) + [pa.field("text_md5", pa.string())])

    def _hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["text_md5"] = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in batch[text_col]
        ]
        # map-side combiner: min-id per hash within the batch
        return batch.sort_values(id_col, kind="stable").drop_duplicates(
            "text_md5", keep="first"
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="stable").drop_duplicates(
            "text_md5", keep="first"
        )[list(out_schema.names)]

    return bucketed_reduce(
        ds.map_batches(_hash, batch_format="pandas"),
        ["text_md5"],
        _reduce,
        out_schema,
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    prime = (1 << 61) - 1
    a = rng.randint(1, prime, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, prime, size=num_perm, dtype=np.uint64)
    return a, b


def _shingles(text: str, k: int) -> np.ndarray:
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.fromiter(
        (_md5_int(g.encode("utf-8")) for g in set(grams)), dtype=np.uint64, count=len(set(grams))
    )


def _minhash_sig(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    prime = np.uint64((1 << 61) - 1)
    if len(hashes) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (num_perm, n_shingles) universal hashing; min over shingles.
    vals = (np.outer(a, hashes) + b[:, None]) % prime
    return vals.min(axis=1)


def _resolve_dups(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over verified near-dup pairs -> {doc_id: canonical
    (min) doc_id}, identity rows omitted."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in pairs:
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    return {x: find(x) for x in parent if find(x) != x}


def jaccard(text_a: str, text_b: str, k: int) -> float:
    ta = _WORD_RE.findall(text_a.lower())
    tb = _WORD_RE.findall(text_b.lower())
    sa = set(" ".join(ta[i : i + k]) for i in range(max(1, len(ta) - k + 1)))
    sb = set(" ".join(tb[i : i + k]) for i in range(max(1, len(tb) - k + 1)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    max_pairs_per_bucket: int = 100,
    verify: bool = True,
) -> ray.data.Dataset:
    """Near-dup mapping ``(doc_id, dup_of)`` via MinHash-LSH.

    Pipeline: per-batch shingle+minhash (vectorized universal hashing)
    -> explode to one row per (band_id, band_hash) -> groupby band
    bucket -> candidate pairs (capped per bucket) -> optional exact
    Jaccard verify against ``threshold`` -> union-find on the driver
    over surviving pairs (candidate pairs are the tiny residue).
    Returns only rows whose canonical id differs (empty = no dups).

    Default banding 32x4 puts the LSH S-curve threshold at
    ``(1/32)^(1/4) ~= 0.42`` — deliberately below typical dedup
    thresholds so candidate recall is high; the exact-Jaccard verify
    step removes the false positives the loose banding admits.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm)

    def _sig(batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col].fillna("")):
            sig = _minhash_sig(_shingles(text, shingle_k), a, b)
            for bi in range(bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                ids.append(doc_id)
                band_ids.append(bi)
                band_hashes.append(bh)
        return pd.DataFrame({id_col: ids, "band_id": band_ids, "band_hash": band_hashes})

    def _bucket_pairs(g: pd.DataFrame) -> pa.Table:
        ids = sorted(set(g[id_col]))
        xs, ys = [], []
        n = 0
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                xs.append(ids[i])
                ys.append(ids[j])
                n += 1
                if n >= max_pairs_per_bucket:
                    return pa.table(
                        {"id_a": pa.array(xs, pa.int64()), "id_b": pa.array(ys, pa.int64())}
                    )
        return pa.table(
            {"id_a": pa.array(xs, pa.int64()), "id_b": pa.array(ys, pa.int64())}
        )

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    sigs = ds.select_columns([id_col, text_col]).map_batches(_sig, batch_format="pandas")
    cand = (
        normalize_blocks(
            sigs.groupby(["band_id", "band_hash"]).map_groups(
                _bucket_pairs, batch_format="pandas"
            ),
            pair_schema,
        )
        .groupby(["id_a", "id_b"])
        .count()
        .to_pandas()
    )
    if cand.empty or "id_a" not in cand.columns:
        pairs: list[tuple[int, int]] = []
    else:
        pairs = list(zip(cand["id_a"].astype(int), cand["id_b"].astype(int)))

    if verify and pairs:
        # Fetch candidate texts once (candidates are the small residue).
        need = {i for p in pairs for i in p}

        def _need_filter(batch: pa.Table) -> pa.Table:
            mask = [i in need for i in batch[id_col].to_pylist()]
            return batch.filter(pa.array(mask, pa.bool_()))

        texts = {
            r[id_col]: r[text_col]
            for r in ds.select_columns([id_col, text_col])
            .map_batches(_need_filter, batch_format="pyarrow")
            .take_all()
        }
        pairs = [
            (x, y)
            for x, y in pairs
            if jaccard(texts.get(x, ""), texts.get(y, ""), shingle_k) >= threshold
        ]

    mapping = _resolve_dups(pairs)
    tbl = pa.table(
        {
            id_col: pa.array(sorted(mapping), pa.int64()),
            "dup_of": pa.array([mapping[k] for k in sorted(mapping)], pa.int64()),
        }
    )
    return ray.data.from_arrow(tbl)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_pairs_per_bucket: int = 200,
) -> ray.data.Dataset:
    """``(doc_id, dup_of)`` via 64-bit SimHash with 4x16-bit band
    blocking (any pair within Hamming distance <=3 of each other
    shares at least one exact 16-bit band by pigeonhole... for
    distance <=3 over 4 bands, yes: 3 differing bits touch at most 3
    bands)."""
    from .text_analysis import simhash64

    def _sig(batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_vals, hashes = [], [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col].fillna("")):
            h = simhash64(text)
            for bi in range(4):
                ids.append(doc_id)
                band_ids.append(bi)
                band_vals.append((h >> (16 * bi)) & 0xFFFF)
                hashes.append(h)
        return pd.DataFrame(
            {
                id_col: ids,
                "band_id": band_ids,
                "band_val": band_vals,
                "simhash": pd.array(hashes, dtype="uint64"),
            }
        )

    def _bucket_pairs(g: pd.DataFrame) -> pa.Table:
        rows = sorted(set(zip(g[id_col], g["simhash"])))
        xs, ys = [], []
        n = 0
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin(int(rows[i][1]) ^ int(rows[j][1])).count("1")
                if ham <= max_hamming:
                    xs.append(int(rows[i][0]))
                    ys.append(int(rows[j][0]))
                    n += 1
                    if n >= max_pairs_per_bucket:
                        return pa.table(
                            {"id_a": pa.array(xs, pa.int64()), "id_b": pa.array(ys, pa.int64())}
                        )
        return pa.table(
            {"id_a": pa.array(xs, pa.int64()), "id_b": pa.array(ys, pa.int64())}
        )

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    sigs = ds.select_columns([id_col, text_col]).map_batches(_sig, batch_format="pandas")
    cand = (
        normalize_blocks(
            sigs.groupby(["band_id", "band_val"]).map_groups(
                _bucket_pairs, batch_format="pandas"
            ),
            pair_schema,
        )
        .groupby(["id_a", "id_b"])
        .count()
        .to_pandas()
    )
    pairs = (
        list(zip(cand["id_a"].astype(int), cand["id_b"].astype(int)))
        if not cand.empty and "id_a" in cand.columns
        else []
    )
    mapping = _resolve_dups(pairs)
    return ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array(sorted(mapping), pa.int64()),
                "dup_of": pa.array([mapping[k] for k in sorted(mapping)], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (inverted-index blocking)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_docs_per_gram: int = 50,
) -> ray.data.Dataset:
    """Exact word-``k``-gram Jaccard >= threshold pairs
    ``(id_a, id_b, n_common, n_union)``.

    Blocking: explode (gram_hash, doc_id), drop grams appearing in more
    than ``max_docs_per_gram`` docs (stop-gram pruning — a gram shared
    by everyone proves nothing and generates O(n^2) pairs), count
    common grams per pair via groupby, then verify |union| from
    per-doc gram counts. Integer outputs so the SQL oracle matches
    exactly.
    """

    def _grams(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ghs = [], []
        gram_counts_ids, gram_counts = [], []
        for doc_id, text in zip(batch[id_col], batch[text_col].fillna("")):
            toks = _WORD_RE.findall(text.lower())
            grams = (
                {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
                if len(toks) >= k
                else ({" ".join(toks)} if toks else set())
            )
            for g in grams:
                ids.append(doc_id)
                ghs.append(hashlib.md5(g.encode("utf-8")).hexdigest()[:16])
            gram_counts_ids.append(doc_id)
            gram_counts.append(len(grams))
        df = pd.DataFrame({id_col: ids, "gram": ghs})
        df2 = pd.DataFrame({id_col: gram_counts_ids, "n_grams": gram_counts})
        df = df.merge(df2, on=id_col)
        return df

    def _gram_pairs(g: pd.DataFrame) -> pa.Table:
        rows = sorted(set(zip(g[id_col], g["n_grams"])))
        if len(rows) > max_docs_per_gram:
            rows = rows[:0]  # stop-gram: drop entirely
        xs, ys, na, nb = [], [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                xs.append(int(rows[i][0]))
                ys.append(int(rows[j][0]))
                na.append(int(rows[i][1]))
                nb.append(int(rows[j][1]))
        return pa.table(
            {
                "id_a": pa.array(xs, pa.int64()),
                "id_b": pa.array(ys, pa.int64()),
                "n_a": pa.array(na, pa.int64()),
                "n_b": pa.array(nb, pa.int64()),
            }
        )

    quad_schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64())]
    )
    grams = ds.select_columns([id_col, text_col]).map_batches(_grams, batch_format="pandas")
    pair_counts = (
        normalize_blocks(
            grams.groupby("gram").map_groups(_gram_pairs, batch_format="pandas"),
            quad_schema,
        )
        .groupby(["id_a", "id_b", "n_a", "n_b"])
        .count()
    )

    # Integerized threshold (threshold = T/10000) so the comparison is
    # exact and bit-identical to the SQL oracle (no float division).
    thr_num = int(round(threshold * 10000))

    def _verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        common = pc.cast(batch["count()"], pa.int64())
        union = pc.subtract(pc.add(batch["n_a"], batch["n_b"]), common)
        jac_ok = pc.greater_equal(
            pc.multiply(common, 10000), pc.multiply(union, thr_num)
        )
        out = pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "n_common": common,
                "n_union": pc.cast(union, pa.int64()),
            }
        )
        return out.filter(jac_ok)

    return pair_counts.map_batches(_verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dedup(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    max_pairs_per_bucket: int = 500,
    exact: bool = False,
) -> ray.data.Dataset:
    """``(vec_id, dup_of)`` for pairs with cosine >= threshold.

    Scale path: random-hyperplane LSH — bucket by the sign pattern of
    ``n_planes`` fixed random projections, verify cosine exactly within
    buckets. ``exact=True`` short-circuits to all-pairs (small inputs /
    test oracle).
    """
    first = ds.take(1)
    if not first:
        return ray.data.from_arrow(
            pa.table({id_col: pa.array([], pa.int64()), "dup_of": pa.array([], pa.int64())})
        )
    dim = len(first[0][vec_col])
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, n_planes).astype(np.float64)

    def _bucket(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.clip(norms, 1e-12, None)
        signs = (unit @ planes) > 0
        keys = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        if exact:
            keys = np.zeros(len(keys), dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "bucket": keys.astype(np.int64),
                "unit": [u for u in unit],
            }
        )

    def _bucket_pairs(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(id_col, kind="stable")
        ids = g[id_col].to_numpy()
        mat = np.stack(g["unit"].to_numpy())
        sims = mat @ mat.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hits = sims[iu, ju] >= threshold
        xs = ids[iu[hits]][:max_pairs_per_bucket]
        ys = ids[ju[hits]][:max_pairs_per_bucket]
        return pa.table(
            {"id_a": pa.array(xs, pa.int64()), "id_b": pa.array(ys, pa.int64())}
        )

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    buckets = ds.select_columns([id_col, vec_col]).map_batches(_bucket, batch_format="pandas")
    cand = (
        normalize_blocks(
            buckets.groupby("bucket").map_groups(_bucket_pairs, batch_format="pandas"),
            pair_schema,
        )
        .groupby(["id_a", "id_b"])
        .count()
        .to_pandas()
    )
    pairs = (
        list(zip(cand["id_a"].astype(int), cand["id_b"].astype(int)))
        if not cand.empty and "id_a" in cand.columns
        else []
    )
    mapping = _resolve_dups(pairs)
    return ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array(sorted(mapping), pa.int64()),
                "dup_of": pa.array([mapping[k] for k in sorted(mapping)], pa.int64()),
            }
        )
    )
