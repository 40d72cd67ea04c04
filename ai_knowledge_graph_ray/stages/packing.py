"""Token-budget shard packing via a distributed prefix sum (scan).

Training-data pipelines pack documents into fixed-token-budget shards
before tokenization/writing. The deterministic spec here: order docs
by an integer id and assign ``shard_id = exclusive_prefix_sum(tokens)
// budget`` — the contiguous greedy packing a sequential writer would
produce (splitting one doc across a shard boundary is a writer
concern, not an assignment concern). The reference has no counterpart
(its training writer is a driver loop, ``training_generator.py``);
this is the scan primitive that makes the same layout possible at
corpus scale.

Ray Data has no scan operator, so this builds one from two passes:

1. **Range sums.** ``range_id = id // range_size``; one
   ``bucketed_reduce`` (map-side combiner) yields ``(range_id,
   tok_sum)``. The residue is ``#distinct ranges`` rows of two int64s
   — count-gated, and if over the gate the SUMS TABLE ITSELF is
   re-aggregated at ``range_id // 2`` (no rescan of the data; floor
   division composes: ``id//r//2 == id//(2r)``) until it fits.
2. **Driver scan.** Sort the range sums, exclusive-cumsum into a base
   offset per range, broadcast both arrays once with ``ray.put``.
3. **Per-range cumsum.** One bucketed shuffle keyed on the (final)
   range id; each range group sorts by id, takes its local exclusive
   cumsum, adds the broadcast base offset, and divides by the budget.

At 100 TB: the driver residue is bounded by the gate (default 5M
ranges ≈ 80 MB), the pass-2 shuffle moves only ``(id, tokens)``
pairs, and every per-group step is vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .infer import bucketed_reduce, pa_from_pandas

DRIVER_MAX_RANGES = 5_000_000


def _range_sums(
    ds: ray.data.Dataset, id_col: str, tokens_col: str, range_size: int
) -> ray.data.Dataset:
    """``(range_id, tok_sum)`` partial sums, one row per non-empty range."""

    def _combine(batch: pd.DataFrame) -> pd.DataFrame:
        rid = batch[id_col].to_numpy(np.int64) // range_size
        return (
            pd.DataFrame({"range_id": rid, "tok_sum": batch[tokens_col].to_numpy(np.int64)})
            .groupby("range_id", sort=False, as_index=False)["tok_sum"]
            .sum()
        )

    return bucketed_reduce(
        ds.select_columns([id_col, tokens_col]),
        ["range_id"],
        lambda g: g.groupby("range_id", sort=False, as_index=False)["tok_sum"].sum(),
        pa.schema([("range_id", pa.int64()), ("tok_sum", pa.int64())]),
        combiner=_combine,
    )


def _coarsen(sums: ray.data.Dataset) -> ray.data.Dataset:
    """Halve the range resolution by re-aggregating the sums table."""

    def _half(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["range_id"] = out["range_id"].to_numpy(np.int64) // 2
        return out.groupby("range_id", sort=False, as_index=False)["tok_sum"].sum()

    return bucketed_reduce(
        sums,
        ["range_id"],
        lambda g: g.groupby("range_id", sort=False, as_index=False)["tok_sum"].sum(),
        pa.schema([("range_id", pa.int64()), ("tok_sum", pa.int64())]),
        combiner=_half,
    )


def pack_shards(
    ds: ray.data.Dataset,
    *,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    range_size: int = 4096,
    driver_max_ranges: int = DRIVER_MAX_RANGES,
    with_offset: bool = False,
) -> ray.data.Dataset:
    """Append ``shard_id``: the fixed-token-budget training shard each
    row lands in when rows are packed in ``id_col`` order.

    ``shard_id = (sum of tokens_col over all rows with smaller id) //
    budget`` — SQL-oracle-exact (a window function), deterministic
    under any parallelism. Requires an integer id column; duplicate
    ids within one range are summed in stable id order (their relative
    order is unspecified, matching SQL's).

    ``with_offset=True`` also emits ``offset`` — the exclusive prefix
    sum modulo ``budget``, i.e. the token position at which the row
    STARTS inside its shard (a row may straddle the shard boundary;
    the writer that consumes the manifest splits it there). This is
    the full placement manifest a tokenized-shard writer needs.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")

    out_schema = pa.schema(
        [(id_col, pa.int64()), (tokens_col, pa.int64()), ("shard_id", pa.int64())]
        + ([("offset", pa.int64())] if with_offset else [])
    )
    sums = _range_sums(ds, id_col, tokens_col, range_size).materialize()
    if sums.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    scale = 0
    while sums.count() > driver_max_ranges:
        sums = _coarsen(sums).materialize()
        scale += 1
    final_range = range_size << scale

    df = sums.to_pandas().sort_values("range_id", kind="stable")
    rids = df["range_id"].to_numpy(np.int64)
    tok = df["tok_sum"].to_numpy(np.int64)
    base = np.cumsum(tok) - tok  # exclusive scan over range totals
    ref = ray.put((rids, base))

    def _with_range(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__range"] = batch[id_col].to_numpy(np.int64) // final_range
        return batch

    def _assign(g: pd.DataFrame) -> pd.DataFrame:
        rids_l, base_l = ray.get(ref)
        g = g.sort_values(["__range", id_col], kind="stable")
        t = g[tokens_col].to_numpy(np.int64)
        rng = g["__range"].to_numpy(np.int64)
        # exclusive cumsum restarting at each range boundary
        cum = np.cumsum(t)
        starts = np.flatnonzero(np.r_[True, rng[1:] != rng[:-1]])
        offsets = np.repeat(cum[starts] - t[starts], np.diff(np.r_[starts, len(t)]))
        excl = cum - t - offsets
        pos = np.searchsorted(rids_l, rng[starts])
        excl += np.repeat(base_l[pos], np.diff(np.r_[starts, len(t)]))
        out = {
            id_col: g[id_col].to_numpy(np.int64),
            tokens_col: t,
            "shard_id": excl // budget,
        }
        if with_offset:
            out["offset"] = excl % budget
        return pd.DataFrame(out)

    return bucketed_reduce(
        ds.select_columns([id_col, tokens_col]).map_batches(
            _with_range, batch_format="pandas"
        ),
        ["__range"],
        _assign,
        out_schema,
    )


def shuffle_shards(
    ds: ray.data.Dataset,
    *,
    n_shards: int,
    id_col: str = "doc_id",
    mult: int = 48271,
    mod: int = 2147483647,
) -> ray.data.Dataset:
    """Deterministic pseudo-random shuffle of rows into ``n_shards``
    training shards: ``rank = (id * mult) % mod`` (the Lehmer-style
    mixer :func:`~.relational.sample_per_group` already uses —
    reproducible in ANY engine with 64-bit integers, so the assignment
    is SQL-oracle-checkable, unlike seeded RNG), ``shard = rank %
    n_shards``, within-shard order ``(rank, id)``. Map-side only: no
    shuffle at all — the sink's partition-by-shard write is the only
    data movement, exactly what a 100 TB shuffled-training-data writer
    wants (vs ``random_shuffle``'s full all-to-all).

    Output: ``(id, shard_id, shard_rank)``; write with
    ``write_parquet(..., partition_cols=["shard_id"])`` and read each
    shard ordered by ``(shard_rank, id)`` for a reproducible global
    permutation.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")

    def _assign(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(np.int64)
        rank = (ids * mult) % mod
        return pd.DataFrame(
            {
                id_col: ids,
                "shard_id": (rank % n_shards).astype("int64"),
                "shard_rank": rank.astype("int64"),
            }
        )

    return ds.select_columns([id_col]).map_batches(_assign, batch_format="pandas")


def shard_stats(packed: ray.data.Dataset) -> ray.data.Dataset:
    """``(shard_id, n_docs, tokens)`` summary of a packing."""

    def _combine(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby("shard_id", sort=False).agg(
            n_docs=("shard_id", "size"), tokens=("n_tokens", "sum")
        )
        return out.reset_index()

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("shard_id", sort=False, as_index=False)[
            ["n_docs", "tokens"]
        ].sum()

    return bucketed_reduce(
        packed,
        ["shard_id"],
        _reduce,
        pa.schema(
            [("shard_id", pa.int64()), ("n_docs", pa.int64()), ("tokens", pa.int64())]
        ),
        combiner=_combine,
    )


SHARD_FILE_SCHEMA = pa.schema(
    [("shard_id", pa.int64()), ("n_docs", pa.int64()),
     ("n_tokens", pa.int64()), ("path", pa.string())]
)


def write_token_shards(
    ids: ray.data.Dataset,
    out_dir: str,
    *,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    bin_col: str = "ids_bin",
    range_size: int = 4096,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Materialize the pretraining token shards: rows carrying uint32
    token-id bytes (:func:`~.vocab.encode_token_ids`) are placed by the
    distributed prefix-sum packer (docs kept WHOLE — a shard is where
    a doc starts, so files vary around ``budget``), then each shard's
    reduce concatenates its docs in id order and writes ONE ``.bin``
    part file atomically. Returns the shard manifest ``(shard_id,
    n_docs, n_tokens, path)`` — the artifact a training loader mmaps.

    Two exchanges total: the packer's range-sum pass and the
    shard-keyed write reduce; token bytes cross the wire once."""
    import os

    from .infer import bucketed_reduce
    from .relational import cogroup_join

    os.makedirs(out_dir, exist_ok=True)
    manifest = pack_shards(
        ids.select_columns([id_col, tokens_col]),
        budget=budget,
        id_col=id_col,
        tokens_col=tokens_col,
        range_size=range_size,
    ).map_batches(
        lambda b: b[[id_col, "shard_id"]], batch_format="pandas"
    )
    placed = cogroup_join(
        ids.select_columns([id_col, tokens_col, bin_col]),
        manifest,
        on=[id_col],
        num_buckets=num_buckets,
        left_schema=pa.schema(
            [(id_col, pa.int64()), (tokens_col, pa.int64()), (bin_col, pa.binary())]
        ),
        right_schema=pa.schema([(id_col, pa.int64()), ("shard_id", pa.int64())]),
    )

    def _write(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for sid, grp in g.groupby("shard_id", sort=True):
            grp = grp.sort_values(id_col, kind="stable")
            blob = b"".join(bytes(x) for x in grp[bin_col])
            path = os.path.join(out_dir, f"shard-{int(sid):06d}.bin")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
            rows.append(
                {
                    "shard_id": int(sid),
                    "n_docs": len(grp),
                    "n_tokens": int(grp[tokens_col].sum()),
                    "path": path,
                }
            )
        return pd.DataFrame(
            rows,
            columns=["shard_id", "n_docs", "n_tokens", "path"],
        )

    return bucketed_reduce(
        placed, ["shard_id"], _write, SHARD_FILE_SCHEMA, num_buckets=num_buckets
    )


LENGTH_BATCH_SCHEMA = pa.schema(
    [
        ("batch_id", pa.int64()),
        ("n_docs", pa.int64()),
        ("max_len", pa.int64()),
        ("sum_len", pa.int64()),
        ("pad_waste", pa.int64()),
    ]
)

_LEN_AXIS = 1 << 32


def length_grouped_batches(
    ds: ray.data.Dataset,
    *,
    batch_rows: int,
    id_col: str = "doc_id",
    len_col: str = "n_chars",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Length-grouped batch assignment + padding-waste accounting —
    the pre-tokenization layout decision that determines how much of a
    training cluster's FLOPs go into pad tokens: sort rows by
    ``(length, id)``, cut into fixed ``batch_rows`` batches, and report
    per batch ``(n_docs, max_len, sum_len, pad_waste)`` where
    ``pad_waste = n_docs * max_len - sum_len`` (every row pads to its
    batch's max). Sorting by length first makes each batch
    near-homogeneous, so the report IS the argument for (or against)
    length bucketing on the real corpus.

    Scale shape: the global rank is NOT a global sort — rows map onto
    the composite integer axis ``length * 2^32 + id`` (lexicographic
    by construction while ``id < 2^32``) and reuse
    :func:`pack_shards`'s distributed range prefix-sum with a
    constant token weight of 1: ``batch_id = rank // batch_rows``.
    One coarse range-sum pass + one bucketed stats reduce; raw rows
    never sort and never reach the driver. SQL twin: ``row_number()
    OVER (ORDER BY len, id)``.
    """
    if batch_rows <= 0:
        raise ValueError("batch_rows must be positive")

    def _axis(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"axis": pd.Series([], dtype="int64"),
                 "one": pd.Series([], dtype="int64")}
            )
        ids = b[id_col].to_numpy(np.int64)
        lens = b[len_col].to_numpy(np.int64)
        if (ids < 0).any() or (ids >= _LEN_AXIS).any():
            raise ValueError("length_grouped_batches needs 0 <= id < 2^32")
        if (lens < 0).any():
            raise ValueError("negative length")
        return pd.DataFrame(
            {"axis": lens * _LEN_AXIS + ids, "one": np.ones(len(b), np.int64)}
        )

    packed = pack_shards(
        ds.select_columns([id_col, len_col]).map_batches(
            _axis, batch_format="pandas", batch_size=None
        ),
        budget=batch_rows,
        id_col="axis",
        tokens_col="one",
    )

    def _stats(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in LENGTH_BATCH_SCHEMA.names}
            )
        lens = g["axis"].to_numpy(np.int64) // _LEN_AXIS
        df = pd.DataFrame({"batch_id": g["shard_id"].to_numpy(np.int64), "len": lens})
        agg = df.groupby("batch_id", sort=False).agg(
            n_docs=("len", "size"), max_len=("len", "max"), sum_len=("len", "sum")
        ).reset_index()
        agg["pad_waste"] = agg["n_docs"] * agg["max_len"] - agg["sum_len"]
        return agg.astype("int64")

    from .infer import bucketed_reduce

    return bucketed_reduce(
        packed, ["shard_id"], _stats, LENGTH_BATCH_SCHEMA, num_buckets=num_buckets
    )


_HRW_MULT, _HRW_MIX, _HRW_MOD = 48271, 1291394886, 2147483647


def hrw_rank(ids: np.ndarray, shard: int) -> np.ndarray:
    """Rendezvous (highest-random-weight) score of every id for one
    shard: the CUBE of the combined linear form, ``z^3 mod M`` with
    ``z = (id*48271 + (s+1)*1291394886) mod M``. The nonlinearity is
    load-bearing: a purely linear form gives every id the same shard
    ordering up to wraparound (measured: ALL ids on one shard), and a
    single multiplicative mix leaves the per-shard scores correlated
    (measured 7049-vs-1099 imbalance at 7 shards); the cube measures
    2799-2920 per shard of 20k sequential ids (ideal 2857) and a
    122-permille move rate at 7->8 (ideal 125). Every intermediate
    product stays under 2^63 (numpy would wrap silently, DuckDB BIGINT
    errors); the SQL twin regenerates the identical expression."""
    a = ids.astype(np.int64) % _HRW_MOD
    z = (a * _HRW_MULT + (shard + 1) * _HRW_MIX) % _HRW_MOD
    z2 = (z * z) % _HRW_MOD
    return (z2 * z) % _HRW_MOD


def hrw_assign(ids: np.ndarray, n_shards: int) -> np.ndarray:
    """argmax-over-shards rendezvous assignment (tie-break lowest
    shard). Vectorized: an (n, n_shards) score matrix per batch —
    n_shards is small (a cluster's shard count), so this is the
    textbook HRW evaluation."""
    scores = np.stack([hrw_rank(ids, s) for s in range(n_shards)], axis=1)
    return np.argmax(scores, axis=1).astype(np.int64)


HRW_STABILITY_SCHEMA = pa.schema(
    [
        ("n_rows", pa.int64()),
        ("n_moved", pa.int64()),
        ("moved_permille", pa.int64()),
    ]
)


def hrw_stability(
    ds: ray.data.Dataset,
    id_col: str,
    *,
    n_shards: int,
) -> pd.DataFrame:
    """One-row report of how many rows CHANGE SHARD when a rendezvous-
    hashed layout grows from ``n_shards`` to ``n_shards + 1`` — the
    property that makes HRW the right assignment for incremental
    100-TB layouts (only ~1/(n+1) of keys move, vs ~all keys for mod-n
    hashing). Map-only partials, driver-summed; zero shuffles."""

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "n_rows": pd.Series(dtype="int64"),
                    "n_moved": pd.Series(dtype="int64"),
                }
            )
        ids = b[id_col].to_numpy().astype(np.int64)
        before = hrw_assign(ids, n_shards)
        after = hrw_assign(ids, n_shards + 1)
        return pd.DataFrame(
            {"n_rows": [len(ids)], "n_moved": [int((before != after).sum())]}
        )

    parts = ds.select_columns([id_col]).map_batches(
        _partial, batch_format="pandas"
    ).to_pandas()
    n = int(parts["n_rows"].sum()) if len(parts) else 0
    moved = int(parts["n_moved"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "n_rows": pd.Series([n], dtype="int64"),
            "n_moved": pd.Series([moved], dtype="int64"),
            "moved_permille": pd.Series(
                [(moved * 1000) // n if n else 0], dtype="int64"
            ),
        }
    )
