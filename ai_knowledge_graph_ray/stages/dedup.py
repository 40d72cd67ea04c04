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

Scale shape (all near-dup ops): vectorized per-batch signature
extraction -> ONE bucket shuffle via :func:`bucketed_reduce` (never
``groupby(key).map_groups`` — that is one Python call per distinct
band/gram/bucket key, millions at corpus scale) -> within-bucket pair
generation that drops singleton keys VECTORIZED before any per-group
work -> pair dedup -> a COUNT-GATED resolve: the candidate-pair
residue is counted first, collected to the driver only when it is
provably small, and otherwise verified via distributed joins
(``cogroup_join`` of texts onto pairs) and component-resolved with
``connected_components_distributed`` — no unconditional
``to_pandas``/``take_all`` anywhere. Pair generation per key is capped
(``max_pairs_per_bucket``) as the skew defense against degenerate
buckets.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce, normalize_blocks

_WORD_RE = re.compile(r"\w+")

PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

# Driver-collect gates. Candidate PAIRS (two int64s each) are cheap on
# the driver up to millions; pair TEXTS are not — the distributed
# verify path kicks in far earlier.
DRIVER_MAX_PAIRS = 2_000_000
DRIVER_MAX_VERIFY_PAIRS = 10_000


def _hash_strs(values) -> np.ndarray:
    """Vectorized deterministic 64-bit string hashing (pandas siphash
    with the fixed default key — stable across processes/machines, no
    PYTHONHASHSEED dependence)."""
    arr = np.asarray(values, dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr)


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
# Shared near-dup machinery: pair generation, dedup, resolve
# ---------------------------------------------------------------------------

def _sorted_group_rows(
    keys: np.ndarray, ids: np.ndarray, *payload: np.ndarray
) -> tuple[np.ndarray, ...]:
    """Sort rows by (key, id) and drop exact (key, id) duplicates —
    the fully-vectorized preamble to within-group pair generation."""
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    payload = tuple(p[order] for p in payload)
    if len(keys):
        dup = np.zeros(len(keys), dtype=bool)
        dup[1:] = (keys[1:] == keys[:-1]) & (ids[1:] == ids[:-1])
        keep = ~dup
        keys, ids = keys[keep], ids[keep]
        payload = tuple(p[keep] for p in payload)
    return (keys, ids, *payload)


def _pair_indices_by_size(codes: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Row indices (i, j), i<j, of every within-group upper-triangle
    pair of a SORTED group-code array — vectorized over groups by
    iterating distinct group SIZES (broadcast precomputed triu index
    templates across all groups of that size), never over groups.
    ``cap`` bounds pairs per group (row-major prefix — skew defense)."""
    n = len(codes)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    starts = np.concatenate(([0], change))
    sizes = np.diff(np.concatenate((starts, [n])))
    multi = sizes >= 2
    starts, sizes = starts[multi], sizes[multi]
    out_i, out_j = [], []
    for sz in np.unique(sizes):
        iu, ju = np.triu_indices(int(sz), k=1)
        if len(iu) > cap:
            iu, ju = iu[:cap], ju[:cap]
        s = starts[sizes == sz]
        out_i.append((s[:, None] + iu[None, :]).reshape(-1))
        out_j.append((s[:, None] + ju[None, :]).reshape(-1))
    if not out_i:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_i), np.concatenate(out_j)


def _distinct_pairs(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Dedup (id_a, id_b) across bands — map-side combiner + one
    bucketed shuffle (a pair colliding in many bands crosses once-ish)."""

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["id_a", "id_b"])

    return bucketed_reduce(
        pairs, ["id_a", "id_b"], _dd, PAIR_SCHEMA, combiner=_dd
    )


def _empty_mapping(id_col: str) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({id_col: pa.array([], pa.int64()), "dup_of": pa.array([], pa.int64())})
    )


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


def resolve_dup_mapping(
    pairs: ray.data.Dataset,
    id_col: str = "doc_id",
    *,
    n_pairs: int | None = None,
    driver_max_pairs: int = DRIVER_MAX_PAIRS,
) -> ray.data.Dataset:
    """Verified pair set -> ``(id, dup_of=min id of component)``.

    COUNT FIRST, then choose: under ``driver_max_pairs`` the pair
    residue (two int64s per row) is collected and union-found locally;
    above it, ids are encoded as zero-padded strings (lexicographic ==
    numeric order) and resolved with
    ``connected_components_distributed`` (min-label propagation) — the
    driver never sees the pair set. Both paths produce the identical
    min-id-canonical mapping (pinned by test).
    """
    from .infer import connected_components_distributed

    if n_pairs is None:
        pairs = pairs.materialize()  # avoid double-execute on count + use
        n_pairs = pairs.count()
    if n_pairs == 0:
        return _empty_mapping(id_col)

    if n_pairs <= driver_max_pairs:
        df = pairs.to_pandas()
        mapping = _resolve_dups(
            list(zip(df["id_a"].astype(int), df["id_b"].astype(int)))
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array(sorted(mapping), pa.int64()),
                    "dup_of": pa.array([mapping[k] for k in sorted(mapping)], pa.int64()),
                }
            )
        )

    def _enc(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subject": b["id_a"].astype("int64").astype(str).str.zfill(20),
                "object": b["id_b"].astype("int64").astype(str).str.zfill(20),
            }
        )

    labels = connected_components_distributed(
        pairs.map_batches(_enc, batch_format="pandas")
    )

    def _dec(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["entity"] != b["component"]]
        return pd.DataFrame(
            {
                id_col: b["entity"].astype("int64"),
                "dup_of": b["component"].astype("int64"),
            }
        )

    out_schema = pa.schema([(id_col, pa.int64()), ("dup_of", pa.int64())])
    return normalize_blocks(
        labels.map_batches(_dec, batch_format="pandas"), out_schema
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


def _gram_set(text: str, k: int) -> set[str]:
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _shingles(text: str, k: int) -> np.ndarray:
    """Distinct word-k-gram hashes, one vectorized hashing pass."""
    return _hash_strs(list(_gram_set(text, k)))


def _minhash_sig(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    prime = np.uint64((1 << 61) - 1)
    if len(hashes) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (num_perm, n_shingles) universal hashing; min over shingles.
    vals = (np.outer(a, hashes % prime) + b[:, None]) % prime
    return vals.min(axis=1)


# Per-slab gram budget for the batched signature kernel: bounds the
# (num_perm x grams) universal-hash matrix to ~64 MB at num_perm=128.
_SIG_SLAB_GRAMS = 1 << 16


def _batch_minhash_sigs(
    texts, k: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signatures for a WHOLE batch of documents, vectorized
    across documents: all grams of all docs are hashed in ONE
    ``pd.util.hash_array`` call, then the universal-hash + per-doc min
    runs slab-wise with ``np.minimum.reduceat`` (offsets split the flat
    gram array back into documents). Bit-identical to mapping
    ``_minhash_sig(_shingles(t))`` per doc: minhash is invariant to
    gram multiplicity, so the per-doc set() dedup is dropped."""
    num_perm = len(a)
    sig = np.zeros((len(texts), num_perm), dtype=np.uint64)
    counts = np.zeros(len(texts), dtype=np.int64)
    gram_lists: list[list[str]] = []
    for i, text in enumerate(texts):
        toks = _WORD_RE.findall(text.lower())
        if not toks:
            continue
        if len(toks) < k:
            g = [" ".join(toks)]
        else:
            g = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        counts[i] = len(g)
        gram_lists.append(g)
    if not gram_lists:
        return sig
    flat = [g for doc in gram_lists for g in doc]
    prime = np.uint64((1 << 61) - 1)
    hm = _hash_strs(flat) % prime
    offsets = np.concatenate(([0], np.cumsum(counts)))
    doc_idx = np.flatnonzero(counts > 0)
    s = 0
    while s < len(doc_idx):
        e = s + 1
        total = counts[doc_idx[s]]
        while e < len(doc_idx) and total + counts[doc_idx[e]] <= _SIG_SLAB_GRAMS:
            total += counts[doc_idx[e]]
            e += 1
        docs = doc_idx[s:e]
        lo = offsets[docs[0]]
        hi = offsets[docs[-1]] + counts[docs[-1]]
        vals = (np.outer(a, hm[lo:hi]) + b[:, None]) % prime
        starts = (offsets[docs] - lo).astype(np.int64)
        sig[docs] = np.minimum.reduceat(vals, starts, axis=1).T
        s = e
    return sig


def _band_hashes(sig_mat: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, num_perm) signature matrix -> (n_docs, bands) band
    KEYS, FNV-1a-folded across the band's rows (vectorized; no per-band
    md5 calls). The band index is folded in first, so the key alone
    identifies (band, hash) — one shuffle column instead of two."""
    n, num_perm = sig_mat.shape
    r = num_perm // bands
    v = sig_mat.reshape(n, bands, r)
    h = np.full((n, bands), 14695981039346656037, dtype=np.uint64)
    fnv = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        h = (h ^ np.arange(bands, dtype=np.uint64)[None, :]) * fnv
        for i in range(r):
            h = (h ^ v[:, :, i]) * fnv
    return h


def jaccard(text_a: str, text_b: str, k: int) -> float:
    ta = _WORD_RE.findall(text_a.lower())
    tb = _WORD_RE.findall(text_b.lower())
    sa = set(" ".join(ta[i : i + k]) for i in range(max(1, len(ta) - k + 1)))
    sb = set(" ".join(tb[i : i + k]) for i in range(max(1, len(tb) - k + 1)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _verify_pairs_driver(
    pairs: list[tuple[int, int]],
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    k: int,
    threshold: float,
) -> list[tuple[int, int]]:
    """Small-residue verify: fetch only the candidate texts, compare
    locally. Only reachable under the pair-count gate."""
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
    return [
        (x, y)
        for x, y in pairs
        if jaccard(texts.get(x) or "", texts.get(y) or "", k) >= threshold
    ]


def _verify_pairs_distributed(
    pairs: ray.data.Dataset,
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    k: int,
    threshold: float,
) -> ray.data.Dataset:
    """Scale-path verify: cogroup-join the doc texts onto the pair set
    (by id_a, then id_b) and Jaccard-check each pair where it lands —
    the pair set never visits the driver."""
    from .relational import cogroup_join

    def _side(col: str, out: str):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table({col: b[id_col], out: b[text_col]})

        return _f

    texts_a = ds.select_columns([id_col, text_col]).map_batches(
        _side("id_a", "__text_a"), batch_format="pyarrow"
    )
    texts_b = ds.select_columns([id_col, text_col]).map_batches(
        _side("id_b", "__text_b"), batch_format="pyarrow"
    )
    with_a = cogroup_join(
        pairs,
        texts_a,
        on=["id_a"],
        left_schema=PAIR_SCHEMA,
        right_schema=pa.schema([("id_a", pa.int64()), ("__text_a", pa.string())]),
    )
    with_ab = cogroup_join(
        with_a,
        texts_b,
        on=["id_b"],
        left_schema=pa.schema(list(PAIR_SCHEMA) + [pa.field("__text_a", pa.string())]),
        right_schema=pa.schema([("id_b", pa.int64()), ("__text_b", pa.string())]),
    )

    def _check(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"id_a": [], "id_b": []})
        keep = [
            jaccard(ta or "", tb or "", k) >= threshold
            for ta, tb in zip(b["__text_a"], b["__text_b"])
        ]
        return b.loc[keep, ["id_a", "id_b"]]

    return normalize_blocks(
        with_ab.map_batches(_check, batch_format="pandas"), PAIR_SCHEMA
    )


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
    driver_max_pairs: int = DRIVER_MAX_PAIRS,
    driver_max_verify_pairs: int = DRIVER_MAX_VERIFY_PAIRS,
) -> ray.data.Dataset:
    """Near-dup mapping ``(doc_id, dup_of)`` via MinHash-LSH.

    Pipeline: per-batch shingle+minhash (vectorized universal hashing,
    vectorized band folding) -> explode to one row per (band_id,
    band_hash) -> ONE bucketed shuffle for candidate pairs (capped per
    bucket) -> pair dedup -> count gate -> exact-Jaccard verify
    (driver when tiny, text-join distributed otherwise) -> components
    (driver union-find when tiny, min-label propagation otherwise).
    Returns only rows whose canonical id differs (empty = no dups).

    Default banding 32x4 puts the LSH S-curve threshold at
    ``(1/32)^(1/4) ~= 0.42`` — deliberately below typical dedup
    thresholds so candidate recall is high; the exact-Jaccard verify
    step removes the false positives the loose banding admits.
    """
    assert num_perm % bands == 0
    a, b = _minhash_params(num_perm)

    def _sig(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame({id_col: [], "band_key": []})
        sig_mat = _batch_minhash_sigs(
            list(batch[text_col].fillna("")), shingle_k, a, b
        )
        bh = _band_hashes(sig_mat, bands)
        return pd.DataFrame(
            {
                id_col: np.repeat(batch[id_col].to_numpy(), bands),
                "band_key": bh.reshape(-1),
            }
        )

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys, ids = _sorted_group_rows(
            g["band_key"].to_numpy(np.uint64), g[id_col].to_numpy(np.int64)
        )
        I, J = _pair_indices_by_size(keys, max_pairs_per_bucket)
        return pd.DataFrame({"id_a": ids[I], "id_b": ids[J]})

    sigs = ds.select_columns([id_col, text_col]).map_batches(_sig, batch_format="pandas")
    # Dedup the multi-band duplicate pairs BEFORE the gate and
    # materialize the (small) distinct-pair residue: the driver-vs-
    # distributed verify decision must see the DISTINCT pair count
    # (dup-heavy corpora collide in many bands; gating on the raw
    # collision count would push a tiny distinct set onto the expensive
    # distributed text-join verify). The extra bucketed shuffle runs
    # over two-int64 rows — negligible next to either verify path.
    cand = _distinct_pairs(
        bucketed_reduce(sigs, ["band_key"], _bucket_pairs, PAIR_SCHEMA)
    ).materialize()

    n_pairs = cand.count()
    if n_pairs == 0:
        return _empty_mapping(id_col)
    if verify:
        if n_pairs <= driver_max_verify_pairs:
            df = cand.to_pandas()
            pairs = _verify_pairs_driver(
                list(zip(df["id_a"].astype(int), df["id_b"].astype(int))),
                ds, id_col, text_col, shingle_k, threshold,
            )
            if not pairs:
                return _empty_mapping(id_col)
            cand = ray.data.from_arrow(
                pa.table(
                    {
                        "id_a": pa.array([p[0] for p in pairs], pa.int64()),
                        "id_b": pa.array([p[1] for p in pairs], pa.int64()),
                    }
                )
            )
            n_pairs = len(pairs)
        else:
            cand = _verify_pairs_distributed(
                cand, ds, id_col, text_col, shingle_k, threshold
            )
            n_pairs = None  # recount inside resolve
    return resolve_dup_mapping(
        cand, id_col, n_pairs=n_pairs, driver_max_pairs=driver_max_pairs
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def hamming_band_dedup(
    sig_ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    max_hamming: int = 3,
    max_pairs_per_bucket: int = 200,
    driver_max_pairs: int = DRIVER_MAX_PAIRS,
) -> ray.data.Dataset:
    """``(id, dup_of)`` from any 64-bit signature column via 4x16-bit
    band blocking (for Hamming distance <=3 over 4 bands, pigeonhole
    guarantees at least one exactly-matching band). Shared engine for
    SimHash text dedup and dHash image dedup: one bucketed exchange
    over band rows, exact Hamming verify inside the reduce, and the
    count-gated component resolution of the other near-dup ops."""

    def _band(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame({id_col: [], "band_key": [], "simhash": []})
        hashes = batch[sig_col].to_numpy(dtype=np.uint64)
        # band_key = 16-bit band value | band index << 16 (exact,
        # single shuffle column)
        band_keys = np.stack(
            [
                (((hashes >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
                 | (bi << 16))
                for bi in range(4)
            ],
            axis=1,
        )
        return pd.DataFrame(
            {
                id_col: np.repeat(batch[id_col].to_numpy(), 4),
                "band_key": band_keys.reshape(-1),
                "simhash": pd.array(np.repeat(hashes, 4), dtype="uint64"),
            }
        )

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys, ids, sims = _sorted_group_rows(
            g["band_key"].to_numpy(np.int64),
            g[id_col].to_numpy(np.int64),
            g["simhash"].to_numpy(dtype=np.uint64),
        )
        I, J = _pair_indices_by_size(keys, max_pairs_per_bucket)
        xor = sims[I] ^ sims[J]
        ham = np.unpackbits(xor.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[I[keep]], "id_b": ids[J[keep]]})

    bands = sig_ds.select_columns([id_col, sig_col]).map_batches(
        _band, batch_format="pandas"
    )
    # duplicate pairs across bands are fine — both resolve paths are
    # idempotent to them (no pre-dedupe shuffle needed)
    cand = bucketed_reduce(bands, ["band_key"], _bucket_pairs, PAIR_SCHEMA)
    return resolve_dup_mapping(cand, id_col, driver_max_pairs=driver_max_pairs)


def simhash_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_pairs_per_bucket: int = 200,
    driver_max_pairs: int = DRIVER_MAX_PAIRS,
) -> ray.data.Dataset:
    """``(doc_id, dup_of)`` via 64-bit SimHash signatures over the
    shared :func:`hamming_band_dedup` engine."""
    from .text_analysis import simhash64

    def _sig(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame({id_col: [], "sig": pd.array([], dtype="uint64")})
        hashes = np.fromiter(
            (simhash64(t) for t in batch[text_col].fillna("")),
            dtype=np.uint64,
            count=n,
        )
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(),
             "sig": pd.array(hashes, dtype="uint64")}
        )

    sigs = ds.select_columns([id_col, text_col]).map_batches(_sig, batch_format="pandas")
    return hamming_band_dedup(
        sigs, id_col=id_col, sig_col="sig", max_hamming=max_hamming,
        max_pairs_per_bucket=max_pairs_per_bucket,
        driver_max_pairs=driver_max_pairs,
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (inverted-index blocking)
# ---------------------------------------------------------------------------

def _ngram_pair_counts(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    k: int,
    max_docs_per_gram: int,
) -> ray.data.Dataset:
    """Shared front half of the exact n-gram pair family: distinct
    word-``k``-gram explode -> stop-gram pruning -> per-pair shared
    counts ``(id_a, id_b, n_a, n_b, n_shared)`` (id_a < id_b), via two
    bucketed reduces. :func:`ngram_jaccard_pairs` thresholds it
    symmetrically, :func:`ngram_containment_pairs` asymmetrically."""

    def _grams(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ghs, ns = [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col].fillna("")):
            grams = _gram_set(text, k)
            gh = _hash_strs(list(grams))
            ids.append(np.full(len(gh), doc_id, dtype=np.int64))
            ghs.append(gh)
            ns.append(np.full(len(gh), len(grams), dtype=np.int64))
        if not ids:
            return pd.DataFrame({id_col: [], "gram": [], "n_grams": []})
        return pd.DataFrame(
            {
                id_col: np.concatenate(ids),
                "gram": np.concatenate(ghs),
                "n_grams": np.concatenate(ns),
            }
        )

    quad_schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64())]
    )

    def _gram_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys, ids, ngr = _sorted_group_rows(
            g["gram"].to_numpy(np.uint64),
            g[id_col].to_numpy(np.int64),
            g["n_grams"].to_numpy(np.int64),
        )
        # stop-gram pruning: drop whole groups larger than the cap
        # (vectorized — mark group sizes via run-length boundaries)
        if len(keys):
            change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            starts = np.concatenate(([0], change))
            sizes = np.diff(np.concatenate((starts, [len(keys)])))
            keep = np.repeat(sizes <= max_docs_per_gram, sizes)
            keys, ids, ngr = keys[keep], ids[keep], ngr[keep]
        I, J = _pair_indices_by_size(keys, cap=1 << 62)
        # local pre-combine: one row per pair per BUCKET crosses the
        # second shuffle, not one per shared gram
        return (
            pd.DataFrame(
                {"id_a": ids[I], "id_b": ids[J], "n_a": ngr[I], "n_b": ngr[J]}
            )
            .groupby(["id_a", "id_b", "n_a", "n_b"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n_shared"})
        )

    count_schema = pa.schema(list(quad_schema) + [pa.field("n_shared", pa.int64())])

    def _sum_shared(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["id_a", "id_b", "n_a", "n_b"], as_index=False, sort=False)[
            "n_shared"
        ].sum()

    grams = ds.select_columns([id_col, text_col]).map_batches(_grams, batch_format="pandas")
    # NOTE: Ray's native multi-key groupby().count() measured ~30x
    # slower than this two-level bucketed sum on the same pair set.
    return bucketed_reduce(
        bucketed_reduce(grams, ["gram"], _gram_pairs, count_schema),
        ["id_a", "id_b"],
        _sum_shared,
        count_schema,
        combiner=_sum_shared,
    )


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
    per-doc gram counts. Per-gram pair generation goes through the
    bucketed reduce (one shuffle, no per-gram Python task). Integer
    outputs so the SQL oracle matches exactly.
    """
    pair_counts = _ngram_pair_counts(
        ds, text_col=text_col, id_col=id_col, k=k,
        max_docs_per_gram=max_docs_per_gram,
    )

    # Integerized threshold (threshold = T/10000) so the comparison is
    # exact and bit-identical to the SQL oracle (no float division).
    thr_num = int(round(threshold * 10000))

    def _verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        common = pc.cast(batch["n_shared"], pa.int64())
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


def ngram_containment_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_docs_per_gram: int = 50,
) -> ray.data.Dataset:
    """ASYMMETRIC n-gram containment pairs — the quote/boilerplate/
    subset detector symmetric Jaccard misses: a 50-gram doc fully
    quoted inside a 5000-gram doc has Jaccard ~0.01 but containment
    1.0. Emits one DIRECTED row ``(id_sub, id_sup, n_common, n_sub,
    n_sup)`` per direction with ``n_common / n_sub >= threshold``
    (distinct word-k-grams; near-identical docs emit both
    directions). Integerized threshold (``n_common * 1000 >= T *
    n_sub``) so the SQL oracle matches bit-for-bit.

    Shares the pair-count front half with :func:`ngram_jaccard_pairs`
    — same two bucketed shuffles, same stop-gram pruning (the oracle
    replicates the pruning rule, so exactness is preserved)."""
    pair_counts = _ngram_pair_counts(
        ds, text_col=text_col, id_col=id_col, k=k,
        max_docs_per_gram=max_docs_per_gram,
    )
    thr_num = int(round(threshold * 1000))

    def _verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        common = pc.cast(batch["n_shared"], pa.int64())
        scaled = pc.multiply(common, 1000)
        parts = []
        for sub, sup in (("a", "b"), ("b", "a")):
            ok = pc.greater_equal(
                scaled, pc.multiply(batch[f"n_{sub}"], thr_num)
            )
            parts.append(
                pa.table(
                    {
                        "id_sub": batch[f"id_{sub}"],
                        "id_sup": batch[f"id_{sup}"],
                        "n_common": common,
                        "n_sub": pc.cast(batch[f"n_{sub}"], pa.int64()),
                        "n_sup": pc.cast(batch[f"n_{sup}"], pa.int64()),
                    }
                ).filter(ok)
            )
        return pa.concat_tables(parts)

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
    driver_max_pairs: int = DRIVER_MAX_PAIRS,
) -> ray.data.Dataset:
    """``(vec_id, dup_of)`` for pairs with cosine >= threshold.

    Scale path: random-hyperplane LSH — bucket by the sign pattern of
    ``n_planes`` fixed random projections, verify cosine exactly within
    buckets (the verify is inside the bucketed pair reduce, so only
    true near-dup pairs ever leave it). ``exact=True`` short-circuits
    to all-pairs (small inputs / test oracle)."""
    first = ds.take(1)
    if not first:
        return _empty_mapping(id_col)
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

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"id_a": [], "id_b": []})
        keys = g["bucket"].to_numpy(np.int64)
        ids = g[id_col].to_numpy(np.int64)
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        mat = np.stack(g["unit"].to_numpy())[order]
        dup = np.zeros(len(keys), dtype=bool)
        dup[1:] = (keys[1:] == keys[:-1]) & (ids[1:] == ids[:-1])
        keep = ~dup
        keys, ids, mat = keys[keep], ids[keep], mat[keep]
        I, J = _pair_indices_by_size(keys, max_pairs_per_bucket)
        sims = np.einsum("ij,ij->i", mat[I], mat[J])
        hits = sims >= threshold
        return pd.DataFrame({"id_a": ids[I[hits]], "id_b": ids[J[hits]]})

    buckets = ds.select_columns([id_col, vec_col]).map_batches(_bucket, batch_format="pandas")
    cand = bucketed_reduce(buckets, ["bucket"], _bucket_pairs, PAIR_SCHEMA)
    return resolve_dup_mapping(cand, id_col, driver_max_pairs=driver_max_pairs)


# ---------------------------------------------------------------------------
# Cross-corpus fuzzy matching (MinHash-LSH between TWO tables):
# paraphrase-robust decontamination — exact n-gram decontamination
# (webtext.decontaminate) misses benchmark text that was lightly
# edited; LSH over shingles catches it.
# ---------------------------------------------------------------------------

CROSS_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def _cross_pair_indices(
    keys: np.ndarray, sides: np.ndarray, cap: int
) -> tuple[np.ndarray, np.ndarray]:
    """Row indices (i, j) of every CROSS-side pair within each key run
    of arrays sorted by (key, side, id) — side-0 row x side-1 row,
    vectorized over runs (never a Python loop per key), ``cap`` pairs
    per key (row-major prefix, skew defense)."""
    n = len(keys)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.r_[True, keys[1:] != keys[:-1]]
    run_id = np.cumsum(change) - 1
    run_start = np.flatnonzero(change)
    run_len = np.diff(np.r_[run_start, n])
    n0 = np.zeros(len(run_start), np.int64)
    np.add.at(n0, run_id, (sides == 0).astype(np.int64))
    n1 = run_len - n0
    tot = np.minimum(n0 * n1, cap)
    total = int(tot.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    run_rep = np.repeat(np.arange(len(run_start)), tot)
    starts = np.cumsum(tot) - tot
    p = np.arange(total, dtype=np.int64) - np.repeat(starts, tot)
    b_cnt = n1[run_rep]
    i = run_start[run_rep] + p // b_cnt
    j = run_start[run_rep] + n0[run_rep] + p % b_cnt
    return i, j


def cross_near_dup(
    corpus: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    *,
    text_col: str = "text",
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    shingle_k: int = 5,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    max_pairs_per_bucket: int = 100,
    driver_max_verify_pairs: int = DRIVER_MAX_VERIFY_PAIRS,
) -> ray.data.Dataset:
    """``(doc_id, bench_id)`` — corpus documents whose shingle Jaccard
    with a benchmark document reaches ``threshold`` (fuzzy test-set
    decontamination; the paraphrase-robust companion of the exact
    n-gram ``decontaminate``).

    Same scale shape as ``minhash_lsh_dedup``, with CROSS-side-only
    candidate generation inside the band buckets (corpus-corpus and
    bench-bench collisions never become pairs): vectorized signatures
    on both sides -> tagged band rows -> ONE bucketed shuffle ->
    cross-pair template generation (capped per bucket) -> distinct
    pairs -> count-gated exact-Jaccard verify (driver under the gate,
    two text cogroup-joins over it)."""
    a, b = _minhash_params(num_perm)

    def _sig_side(id_name: str, side: int):
        def _f(batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                return pd.DataFrame(
                    {"band_key": pd.Series([], dtype="uint64"),
                     "side": pd.Series([], dtype="int64"),
                     "rid": pd.Series([], dtype="int64")}
                )
            sig_mat = _batch_minhash_sigs(
                list(batch[text_col].fillna("")), shingle_k, a, b
            )
            bh = _band_hashes(sig_mat, bands)
            return pd.DataFrame(
                {
                    "band_key": bh.reshape(-1),
                    "side": np.full(len(batch) * bands, side, np.int64),
                    "rid": np.repeat(batch[id_name].to_numpy(np.int64), bands),
                }
            )

        return _f

    tagged = corpus.select_columns([corpus_id, text_col]).map_batches(
        _sig_side(corpus_id, 0), batch_format="pandas"
    ).union(
        benchmark.select_columns([bench_id, text_col]).map_batches(
            _sig_side(bench_id, 1), batch_format="pandas"
        )
    )

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["rid"].to_numpy(np.int64), g["side"].to_numpy(np.int64),
             g["band_key"].to_numpy(np.uint64))
        )
        keys = g["band_key"].to_numpy(np.uint64)[order]
        sides = g["side"].to_numpy(np.int64)[order]
        ids = g["rid"].to_numpy(np.int64)[order]
        # drop exact (key, side, id) duplicates
        if len(keys):
            dup = np.zeros(len(keys), bool)
            dup[1:] = (keys[1:] == keys[:-1]) & (sides[1:] == sides[:-1]) & (ids[1:] == ids[:-1])
            keep = ~dup
            keys, sides, ids = keys[keep], sides[keep], ids[keep]
        I, J = _cross_pair_indices(keys, sides, max_pairs_per_bucket)
        return pd.DataFrame({"id_a": ids[I], "id_b": ids[J]})

    cand = _distinct_pairs(
        bucketed_reduce(tagged, ["band_key"], _bucket_pairs, CROSS_PAIR_SCHEMA)
    ).materialize()
    n_pairs = cand.count()
    if n_pairs == 0:
        return ray.data.from_arrow(CROSS_PAIR_SCHEMA.empty_table())

    if n_pairs <= driver_max_verify_pairs:
        df = cand.to_pandas()
        a_ids, b_ids = set(df["id_a"].astype(int)), set(df["id_b"].astype(int))
        a_ref, b_ref = ray.put(a_ids), ray.put(b_ids)

        def _texts(ds_, idc, ref):
            def _f(bt: pd.DataFrame) -> pd.DataFrame:
                want = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
                m = bt[idc].isin(want)
                return pd.DataFrame({idc: bt[idc][m], text_col: bt[text_col][m]})

            return {
                int(r[idc]): r[text_col]
                for r in ds_.select_columns([idc, text_col])
                .map_batches(_f, batch_format="pandas")
                .take_all()
            }

        ta = _texts(corpus, corpus_id, a_ref)
        tb = _texts(benchmark, bench_id, b_ref)
        keep = [
            jaccard(ta.get(ia, ""), tb.get(ib, ""), shingle_k) >= threshold
            for ia, ib in zip(df["id_a"].astype(int), df["id_b"].astype(int))
        ]
        out = df.loc[keep]
        return ray.data.from_arrow(
            pa.table(
                {"id_a": pa.array(out["id_a"].astype("int64")),
                 "id_b": pa.array(out["id_b"].astype("int64"))}
            ).cast(CROSS_PAIR_SCHEMA)
        )

    # over the gate: join corpus texts on id_a, benchmark texts on id_b
    from .relational import cogroup_join

    texts_a = corpus.select_columns([corpus_id, text_col]).map_batches(
        lambda bt: pa.table(
            {"id_a": bt[corpus_id].combine_chunks().cast(pa.int64()),
             "__text_a": bt[text_col].combine_chunks().cast(pa.string())}
        ),
        batch_format="pyarrow",
    )
    texts_b = benchmark.select_columns([bench_id, text_col]).map_batches(
        lambda bt: pa.table(
            {"id_b": bt[bench_id].combine_chunks().cast(pa.int64()),
             "__text_b": bt[text_col].combine_chunks().cast(pa.string())}
        ),
        batch_format="pyarrow",
    )
    with_a = cogroup_join(
        cand, texts_a, on=["id_a"],
        left_schema=CROSS_PAIR_SCHEMA,
        right_schema=pa.schema([("id_a", pa.int64()), ("__text_a", pa.string())]),
    )
    with_ab = cogroup_join(
        with_a, texts_b, on=["id_b"],
        left_schema=pa.schema(list(CROSS_PAIR_SCHEMA) + [pa.field("__text_a", pa.string())]),
        right_schema=pa.schema([("id_b", pa.int64()), ("__text_b", pa.string())]),
    )

    def _check(bt: pd.DataFrame) -> pd.DataFrame:
        if len(bt) == 0:
            return pd.DataFrame({"id_a": [], "id_b": []})
        keep = [
            jaccard(x or "", y or "", shingle_k) >= threshold
            for x, y in zip(bt["__text_a"], bt["__text_b"])
        ]
        return bt.loc[keep, ["id_a", "id_b"]]

    return normalize_blocks(
        with_ab.map_batches(_check, batch_format="pandas"), CROSS_PAIR_SCHEMA
    )


REP_SCHEMA = pa.schema([("doc_id", pa.int64()), ("keep_id", pa.int64())])


def rerank_cluster_reps(
    mapping: ray.data.Dataset,
    quality: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    root_col: str = "dup_of",
    score_col: str = "score",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Re-root duplicate clusters at their BEST member instead of the
    min id: ``(doc_id, keep_id)`` for every cluster member, where
    ``keep_id`` is the member with the highest ``score_col`` (int64;
    tie-break lower id). The curation step after any near-dup pass —
    "keep the longest / highest-quality edition", not "keep the
    smallest id".

    ``mapping`` is the standard dedup output (non-representative
    member -> cluster root); ``quality`` must cover every cluster
    member (inner-join semantics — unscored members drop, loudly
    visible in row counts). Shuffle plan: one root-distinct exchange
    to add the roots' self-rows, one keyed join against the quality
    table, one root-keyed reduce that emits all members' verdicts —
    no driver residue at any size."""
    from .relational import cogroup_join

    pair_schema = pa.schema([(id_col, pa.int64()), (root_col, pa.int64())])

    def _self_rows(g: pd.DataFrame) -> pd.DataFrame:
        roots = np.unique(g[root_col].to_numpy(np.int64))
        return pd.DataFrame({id_col: roots, root_col: roots})

    roots_self = bucketed_reduce(
        mapping.select_columns([root_col]),
        [root_col],
        _self_rows,
        pair_schema,
        combiner=lambda b: b.drop_duplicates(),
        num_buckets=num_buckets,
    )
    members = mapping.select_columns([id_col, root_col]).union(roots_self)

    scored = cogroup_join(
        members,
        quality.select_columns([id_col, score_col]),
        on=[id_col],
        left_schema=pair_schema,
        right_schema=pa.schema([(id_col, pa.int64()), (score_col, pa.int64())]),
    )

    def _rerank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [root_col, score_col, id_col], ascending=[True, False, True],
            kind="stable",
        )
        keep = g.groupby(root_col, sort=False)[id_col].transform("first")
        return pd.DataFrame(
            {"doc_id": g[id_col].to_numpy(np.int64),
             "keep_id": keep.to_numpy(np.int64)}
        )

    return bucketed_reduce(
        scored, [root_col], _rerank, REP_SCHEMA, num_buckets=num_buckets
    )


def exact_dedup_against(
    new: ray.data.Dataset,
    reference: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Incremental exact dedup: ``(id, text_md5)`` of the NEW rows
    whose text does not already exist in the REFERENCE corpus — the
    every-crawl-cycle step (dedup tonight's batch against the stored
    snapshot without re-deduping the snapshot).

    One md5 map over each side, a distinct-hash reduce on the
    reference (a hash repeated across the snapshot crosses the
    exchange once per block), one hash-keyed anti join. Compose with
    :func:`exact_dedup` on the survivors when the new batch can also
    collide with itself."""
    from .relational import cogroup_join

    new_schema = pa.schema([(id_col, pa.int64()), ("text_md5", pa.string())])
    ref_schema = pa.schema([("text_md5", pa.string())])

    def _hash_side(batch: pd.DataFrame, keep_id: bool) -> pd.DataFrame:
        md5s = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch[text_col]
        ]
        if keep_id:
            return pd.DataFrame(
                {id_col: batch[id_col].to_numpy(np.int64), "text_md5": md5s}
            )
        return pd.DataFrame({"text_md5": md5s}).drop_duplicates()

    new_hashed = new.select_columns([id_col, text_col]).map_batches(
        lambda b: _hash_side(b, True), batch_format="pandas"
    )
    ref_hashes = bucketed_reduce(
        reference.select_columns([text_col]).map_batches(
            lambda b: _hash_side(b, False), batch_format="pandas"
        ),
        ["text_md5"],
        lambda g: g.drop_duplicates("text_md5"),
        ref_schema,
        num_buckets=num_buckets,
    )
    return cogroup_join(
        new_hashed,
        ref_hashes,
        on=["text_md5"],
        how="left_anti",
        num_buckets=num_buckets,
        left_schema=new_schema,
        right_schema=ref_schema,
    )


NOVELTY_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_grams", pa.int64()),
        ("n_unique", pa.int64()),
        ("novelty_milli", pa.int64()),
    ]
)


def novelty_scores(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-document novelty: the per-mille share of the doc's distinct
    word-``k``-grams that are CORPUS-UNIQUE (df == 1) — templated /
    boilerplate / near-copied documents score low, original prose
    scores high; the curation signal between exact dedup (too strict)
    and quality heuristics (content-blind).

    Two exchanges + one partitioned join: distinct (gram, doc) explode
    (same ``_gram_set`` as the overlap/containment family, so the SQL
    twin shares the gram rule), gram-keyed df sum, then df joined back
    on the gram HASH (64-bit hash rides only in the shared join-key
    column — the cogroup carry rule) and one doc-keyed sum. Integer
    floor per-mille so it is hash-exact."""
    from .infer import bucketed_reduce, sanitize_for_join
    from .relational import cogroup_join

    pair_schema = pa.schema(
        [("gram", pa.uint64()), (id_col, pa.int64()), ("n_grams", pa.int64())]
    )

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ghs, ns = [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col].fillna("")):
            grams = _gram_set(text, k)
            if not grams:
                continue
            gh = _hash_strs(list(grams))
            ids.append(np.full(len(gh), doc_id, dtype=np.int64))
            ghs.append(gh)
            ns.append(np.full(len(gh), len(grams), dtype=np.int64))
        if not ids:
            return pd.DataFrame(
                {
                    "gram": pd.Series([], dtype="uint64"),
                    id_col: pd.Series([], dtype="int64"),
                    "n_grams": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "gram": np.concatenate(ghs),
                id_col: np.concatenate(ids),
                "n_grams": np.concatenate(ns),
            }
        )

    pairs = sanitize_for_join(
        ds.select_columns([id_col, text_col]).map_batches(
            _explode, batch_format="pandas"
        ),
        pair_schema,
    ).materialize()

    df_schema = pa.schema([("gram", pa.uint64()), ("df", pa.int64())])

    def _df_comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "gram" not in b.columns:
            return pd.DataFrame(
                {"gram": pd.Series([], dtype="uint64"),
                 "df": pd.Series([], dtype="int64")}
            )
        if "df" in b.columns:
            return b.groupby("gram", as_index=False)["df"].sum()
        vc = b.groupby("gram", sort=False).size()
        return pd.DataFrame(
            {"gram": vc.index.to_numpy("uint64"), "df": vc.to_numpy("int64")}
        )

    def _df_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("gram", as_index=False)["df"].sum()
        out["df"] = out["df"].astype("int64")
        return out

    dfs = bucketed_reduce(
        pairs.select_columns(["gram"]),
        ["gram"],
        _df_sum,
        df_schema,
        combiner=_df_comb,
        num_buckets=num_buckets,
    )

    joined = cogroup_join(
        pairs,
        dfs,
        on=["gram"],
        num_buckets=num_buckets,
        left_schema=pair_schema,
        right_schema=df_schema,
    )

    def _doc_comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or id_col not in b.columns:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "n_grams": pd.Series([], dtype="int64"),
                    "n_unique": pd.Series([], dtype="int64"),
                }
            )
        if "n_unique" in b.columns:
            return b.groupby([id_col, "n_grams"], as_index=False)["n_unique"].sum()
        g = b.assign(n_unique=(b["df"].astype("int64") == 1).astype("int64"))
        return g.groupby([id_col, "n_grams"], as_index=False)["n_unique"].sum()

    def _doc_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby([id_col, "n_grams"], as_index=False)["n_unique"].sum()
        out["novelty_milli"] = (
            out["n_unique"].astype("int64") * 1000 // out["n_grams"].astype("int64")
        )
        for c in ("n_grams", "n_unique", "novelty_milli"):
            out[c] = out[c].astype("int64")
        return out[[id_col, "n_grams", "n_unique", "novelty_milli"]]

    return bucketed_reduce(
        joined,
        [id_col],
        _doc_sum,
        NOVELTY_SCHEMA,
        combiner=_doc_comb,
        num_buckets=num_buckets,
    )


ORIGINALITY_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_grams", pa.int64()),
        ("n_first_seen", pa.int64()),
        ("originality_milli", pa.int64()),
    ]
)


def originality_scores(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-document originality: the per-mille share of the doc's
    distinct word-``k``-grams whose FIRST corpus occurrence (minimum
    doc id — the ingestion-order attribution) is this document. The
    text-reuse complement of :func:`novelty_scores`: novelty asks "is
    this gram unique", originality asks "who said it first" — a late
    crawl of syndicated content scores near zero here while still
    scoring mid on novelty.

    Same scale shape as novelty: distinct (gram, doc) explode (shared
    ``_gram_set`` so the SQL twin shares the gram rule), gram-keyed
    MIN-doc reduce, df joined back on the gram hash (64-bit hash rides
    only in the shared join-key column), one doc-keyed sum."""
    from .infer import bucketed_reduce, sanitize_for_join
    from .relational import cogroup_join

    pair_schema = pa.schema(
        [("gram", pa.uint64()), (id_col, pa.int64()), ("n_grams", pa.int64())]
    )

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ghs, ns = [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col].fillna("")):
            grams = _gram_set(text, k)
            if not grams:
                continue
            gh = _hash_strs(list(grams))
            ids.append(np.full(len(gh), doc_id, dtype=np.int64))
            ghs.append(gh)
            ns.append(np.full(len(gh), len(grams), dtype=np.int64))
        if not ids:
            return pd.DataFrame(
                {
                    "gram": pd.Series([], dtype="uint64"),
                    id_col: pd.Series([], dtype="int64"),
                    "n_grams": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "gram": np.concatenate(ghs),
                id_col: np.concatenate(ids),
                "n_grams": np.concatenate(ns),
            }
        )

    pairs = sanitize_for_join(
        ds.select_columns([id_col, text_col]).map_batches(
            _explode, batch_format="pandas"
        ),
        pair_schema,
    ).materialize()

    first_schema = pa.schema([("gram", pa.uint64()), ("first_doc", pa.int64())])

    def _min_comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "gram" not in b.columns:
            return pd.DataFrame(
                {"gram": pd.Series([], dtype="uint64"),
                 "first_doc": pd.Series([], dtype="int64")}
            )
        if "first_doc" not in b.columns:
            b = pd.DataFrame(
                {"gram": b["gram"].to_numpy(), "first_doc": b[id_col].to_numpy()}
            )
        return b.groupby("gram", as_index=False, sort=False)["first_doc"].min()

    firsts = bucketed_reduce(
        pairs.map_batches(
            lambda b: b[["gram", id_col]] if len(b) else b, batch_format="pandas"
        ),
        ["gram"],
        _min_comb,
        first_schema,
        combiner=_min_comb,
        num_buckets=num_buckets,
    )

    joined = cogroup_join(
        pairs,
        firsts,
        on=["gram"],
        how="inner",
        left_schema=pair_schema,
        right_schema=first_schema,
        num_buckets=num_buckets,
    )

    def _per_doc(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return ORIGINALITY_SCHEMA.empty_table().to_pandas()
        g = g.assign(
            fs=(g[id_col].to_numpy() == g["first_doc"].to_numpy()).astype(np.int64)
        )
        out = g.groupby([id_col, "n_grams"], as_index=False, sort=False)["fs"].sum()
        return pd.DataFrame(
            {
                "doc_id": out[id_col].astype("int64"),
                "n_grams": out["n_grams"].astype("int64"),
                "n_first_seen": out["fs"].astype("int64"),
                "originality_milli": (
                    out["fs"].astype("int64") * 1000 // out["n_grams"].astype("int64")
                ),
            }
        )

    def _doc_comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        if "fs" not in b.columns:
            b = b.assign(
                fs=(b[id_col].to_numpy() == b["first_doc"].to_numpy()).astype(
                    np.int64
                )
            )[[id_col, "n_grams", "fs"]]
        return b.groupby([id_col, "n_grams"], as_index=False, sort=False)["fs"].sum()

    def _doc_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby([id_col, "n_grams"], as_index=False, sort=False)["fs"].sum()
        return pd.DataFrame(
            {
                "doc_id": out[id_col].astype("int64"),
                "n_grams": out["n_grams"].astype("int64"),
                "n_first_seen": out["fs"].astype("int64"),
                "originality_milli": (
                    out["fs"].astype("int64") * 1000 // out["n_grams"].astype("int64")
                ),
            }
        )

    return bucketed_reduce(
        joined,
        [id_col],
        _doc_sum,
        ORIGINALITY_SCHEMA,
        combiner=_doc_comb,
        num_buckets=num_buckets,
    )
