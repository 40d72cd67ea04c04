"""Flagship corpus-curation pipeline — the standard webtext
training-data preparation chain, composed end-to-end from this
engine's operators (each individually oracle- or twin-pinned):

    1. Unicode NFC hygiene  (map-only; composed/decomposed forms
       collapse to one dedup key)
    2. exact dedup          (one md5-keyed shuffle, keep min doc_id)
    3. Gopher quality gate  (stateless vectorized integer signals)
    4. per-source mixture   (map-only deterministic Bernoulli)
    5. shard packing        (distributed prefix sum over token counts)

Everything streams: the only all-to-all exchanges are the dedup
shuffle and the pack prefix-sum reduce; filters and sampling are
map-side. The pipeline returns the curated manifest ``(doc_id,
source, n_tokens, shard_id)`` — the row set a trainer would read —
plus a small integer funnel report (docs surviving each step) built
from per-step counts.

This file is the composition layer only; see the per-operator modules
for the scale analysis of each step.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

CURATED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("source", pa.string()),
        ("n_tokens", pa.int64()),
        ("shard_id", pa.int64()),
    ]
)


def curate_corpus(
    docs: ray.data.Dataset,
    *,
    rates_milli: dict[str, int] | None = None,
    default_milli: int = 1000,
    shard_budget: int = 20_000,
    with_report: bool = False,
):
    """Run the 5-step curation chain over ``(doc_id, source, text)``
    rows. Returns the curated manifest Dataset, or ``(manifest,
    report)`` when ``with_report`` — report values are exact integer
    survivor counts per step (each count executes the pipeline prefix
    once; leave ``with_report=False`` in production and read counts
    off the sink instead)."""
    import unicodedata

    from ..stages.dedup import exact_dedup
    from ..stages.packing import pack_shards
    from ..stages.relational import bernoulli_mixture_sample
    from ..stages.webtext import gopher_filter

    report: dict[str, int] = {}
    if with_report:
        report["input"] = docs.count()

    # 1. NFC-normalize the text itself (map-only) so steps 2-5 all see
    # canonical bytes — dedup, tokenization, budgets agree across
    # composed/decomposed inputs
    def _nfc(b: pd.DataFrame) -> pa.Table:
        # Arrow out: exact_dedup derives its schema from the upstream
        # block type, and pandas-backed blocks don't carry one
        return pa.table(
            {
                "doc_id": pa.array(b["doc_id"].to_numpy(np.int64), pa.int64()),
                "source": pa.array(b["source"], pa.string()),
                "text": pa.array(
                    [unicodedata.normalize("NFC", t or "") for t in b["text"]],
                    pa.string(),
                ),
            }
        )

    normed = docs.map_batches(_nfc, batch_format="pandas")

    # 2. exact dedup (keep min doc_id per identical normalized text)
    deduped = exact_dedup(normed, text_col="text", id_col="doc_id").materialize()
    if with_report:
        report["after_dedup"] = deduped.count()

    # 3. Gopher gate: join the keep bit back is unnecessary — the gate
    # re-derives token counts in the same pass we need for packing
    gated = gopher_filter(deduped, text_col="text", id_col="doc_id")
    kept_ids = gated.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_tokens": b["n_tokens"].to_numpy(np.int64),
            }
        )[b["keep"].to_numpy(np.int64) == 1],
        batch_format="pandas",
    )
    # re-attach source via the deduped side (map-side merge within the
    # dedup output is avoided by carrying source through the gate
    # instead at real scale; here the id->source join is one cogroup)
    from ..stages.relational import cogroup_join

    def _srcs(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "source" not in b.columns:  # empty blocks lose cols
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "source": pd.Series([], dtype="object")}
            )
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(np.int64), "source": b["source"]}
        )

    srcs = deduped.map_batches(_srcs, batch_format="pandas")
    survivors = cogroup_join(
        kept_ids, srcs, on=["doc_id"], how="inner",
        left_schema=pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("source", pa.string())]),
    ).materialize()
    if with_report:
        report["after_quality"] = survivors.count()

    # 4. per-source mixture sampling (map-only, deterministic)
    sampled = bernoulli_mixture_sample(
        survivors, "doc_id", "source", rates_milli or {},
        default_milli=default_milli,
    ).materialize()
    if with_report:
        report["after_mixture"] = sampled.count()

    # 5. fixed-token-budget shard assignment (distributed prefix sum)
    # pack_shards emits (doc_id, n_tokens, shard_id) only — rejoin the
    # source column for the trainer manifest
    packed = pack_shards(sampled, budget=shard_budget)
    sampled_srcs = sampled.map_batches(_srcs, batch_format="pandas")
    manifest = cogroup_join(
        packed, sampled_srcs, on=["doc_id"], how="inner",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("shard_id", pa.int64())]
        ),
        right_schema=pa.schema([("doc_id", pa.int64()), ("source", pa.string())]),
    ).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                "source": b["source"].combine_chunks().cast(pa.string()),
                "n_tokens": b["n_tokens"].combine_chunks().cast(pa.int64()),
                "shard_id": b["shard_id"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    if with_report:
        return manifest, report
    return manifest


def curate_embeddings(
    docs: "ray.data.Dataset",
    *,
    dim: int = 64,
    k_clusters: int = 8,
    dedup_threshold: float = 0.95,
    pq_m: int = 8,
    pq_k: int = 16,
    pq_iters: int = 4,
) -> "ray.data.Dataset":
    """The vector-side curation chain, composed from pinned operators:
    embed (actor pool) -> SemDeDup near-dup removal (cluster-scoped
    cosine) -> PQ codebook training + encoding of the SURVIVORS.
    Returns ``(vec_id, code)`` — the m-byte compressed index a 100-TB
    retrieval/dedup system actually stores (raw vectors are 32-64x
    bigger). Every stage streams: the only driver residues are the
    k-means partials and the dedup mapping, both count-gated in their
    own operators."""
    import pyarrow as pa

    from ..stages.clustering import semantic_dedup
    from ..stages.embed import embed_documents
    from ..stages.pq import pq_encode, pq_train
    from ..stages.relational import cogroup_join

    emb = embed_documents(docs, dim=dim).map_batches(
        lambda b: b.rename(columns={"doc_id": "vec_id"}), batch_format="pandas"
    ).materialize()
    mapping = semantic_dedup(
        emb, k=k_clusters, threshold=dedup_threshold, vec_col="embedding",
        id_col="vec_id",
    )
    survivors = cogroup_join(
        emb,
        mapping.map_batches(
            lambda b: b[["vec_id"]], batch_format="pandas"
        ),
        on=["vec_id"],
        how="left_anti",
        left_schema=pa.schema(
            [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float64()))]
        ),
        right_schema=pa.schema([("vec_id", pa.int64())]),
    ).materialize()
    books = pq_train(survivors, m=pq_m, k=pq_k, iters=pq_iters)
    return pq_encode(survivors, books)
