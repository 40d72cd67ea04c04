"""Named query/pipeline registry for the driver contract
(``__ray_entry__.queries()`` / ``oracle_sql()``).

Each entry is a ``Callable[[sf_dir], Dataset|DataFrame|Table]``; where
an ANSI-SQL equivalent exists it lives in :data:`ORACLE_SQL` and the
driver cross-checks row count + schema + value hash against DuckDB.

Design rules for oracle-checked queries:
- identical column NAMES and int64/float64 types on both sides;
- money/float aggregates are computed in integer cents (distributed
  float summation is order-dependent — integer sums hash-match);
- deterministic tie-breaks on every top-k.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from ..sources.pages import pages_from_documents
from ..sources.readers import read_parquet_clean
from ..stages.chunk import chunk_docs
from ..stages.dedup import (
    embedding_dedup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from ..stages.docs import extract_docs
from ..stages.extract import extract_triples
from ..stages.canonicalize import standardize_triples
from ..stages.relational import cogroup_join, grouped_sums
from ..stages.sessions import sessionize
from ..stages.similarity import knn_brute, knn_ivf
from ..stages.text_analysis import (
    LANG_MARKERS,
    doc_stats,
    fingerprints,
    lang_id,
    quality_score,
    token_counts,
)
from .kg import build_graph

CHUNK_SIZE, CHUNK_OVERLAP = 200, 40


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _docs(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])


# ---------------------------------------------------------------------------
# Text analysis (oracle-checked)
# ---------------------------------------------------------------------------

def q_doc_token_counts(sf_dir: str):
    return token_counts(_docs(sf_dir))


def q_doc_stats(sf_dir: str):
    return doc_stats(_docs(sf_dir))


def q_doc_lang_id(sf_dir: str):
    return lang_id(_docs(sf_dir))


def q_doc_fingerprint(sf_dir: str):
    return fingerprints(_docs(sf_dir)).select_columns(["doc_id", "md5"])


def q_doc_exact_dedup(sf_dir: str):
    return exact_dedup(_docs(sf_dir)).select_columns(["doc_id", "text_md5"])


def q_doc_quality(sf_dir: str):
    """Heuristic quality scoring — hash-exact: the float twin mirrors
    every ratio/clip/weighted-sum in IEEE op order over the
    doc_stats/doc_lang_id integer inputs."""
    return quality_score(_docs(sf_dir))


def q_doc_simhash(sf_dir: str):
    ds = fingerprints(_docs(sf_dir))
    return ds.map_batches(
        lambda b: pa.table(
            {"doc_id": b["doc_id"], "simhash64": pc.cast(b["simhash64"], pa.uint64())}
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Webtext corpus hygiene (oracle-checked)
# ---------------------------------------------------------------------------

def q_doc_repetition(sf_dir: str):
    from ..stages.webtext import repetition_stats

    return repetition_stats(_docs(sf_dir))


def q_doc_line_dedup(sf_dir: str):
    from ..stages.webtext import line_dedup_stats

    return line_dedup_stats(_docs(sf_dir), min_docs=2)


DECON_K, DECON_BENCH_MOD = 3, 20


def q_doc_decontaminate(sf_dir: str):
    """Train docs flagged when any word 3-gram also appears in the
    held-out benchmark slice (doc_id % 20 == 0)."""
    from ..stages.webtext import decontaminate

    docs = _docs(sf_dir)

    def _part(keep_bench: bool):
        def _f(b: pd.DataFrame) -> pd.DataFrame:
            m = (b["doc_id"] % DECON_BENCH_MOD == 0) == keep_bench
            return b[m]

        return _f

    bench = docs.map_batches(_part(True), batch_format="pandas")
    train = docs.map_batches(_part(False), batch_format="pandas")
    return decontaminate(train, bench, k=DECON_K)


def q_doc_pii_redact(sf_dir: str):
    from ..stages.webtext import pii_redact

    return pii_redact(_docs(sf_dir))


# ---------------------------------------------------------------------------
# Chunking (oracle-checked via recursive-CTE loop simulation)
# ---------------------------------------------------------------------------

def q_kg_chunk_stats(sf_dir: str):
    docs = _docs(sf_dir).map_batches(
        lambda b: pa.table(
            {"url": pc.cast(b["doc_id"], pa.string()), "text": b["text"]}
        ),
        batch_format="pyarrow",
    )
    chunks = chunk_docs(docs, CHUNK_SIZE, CHUNK_OVERLAP)
    agg = grouped_sums(
        chunks, ["url"], {"total_chunk_words": "n_words"}, count_name="n_chunks"
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "doc_id": pc.cast(b["url"], pa.int64()),
                "n_chunks": pc.cast(b["n_chunks"], pa.int64()),
                "total_chunk_words": pc.cast(b["total_chunk_words"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Relational core (oracle-checked): agg / joins / top-k / window
# ---------------------------------------------------------------------------

def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def q_lineitem_agg(sf_dir: str):
    ds = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _pre(b: pa.Table) -> pa.Table:
        # Stay in integer space: cents x (100 - discount%) — no float
        # summation or half-cent rounding-mode drift vs the oracle.
        price_cents = _cents(b["l_extendedprice"])
        disc_pct = pc.cast(pc.round(pc.multiply(b["l_discount"], 100.0)), pa.int64())
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
                "price_cents": price_cents,
                "disc_price_cc": pc.multiply(price_cents, pc.subtract(100, disc_pct)),
            }
        )

    return grouped_sums(
        ds.map_batches(_pre, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": "qty",
            "sum_price_cents": "price_cents",
            "sum_disc_price_cc": "disc_price_cc",
        },
        count_name="n_rows",
    )


def q_orders_by_segment(sf_dir: str):
    """Broadcast join: customer (small) into orders via the public
    :func:`broadcast_join` operator (one ``ray.put`` of the dimension,
    vectorized pandas merge per batch — no per-row Python loop),
    grouped by segment."""
    from ..stages.relational import broadcast_join

    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).rename_columns({"c_custkey": "o_custkey"})
    orders = read_parquet_clean(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def _pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": b["o_custkey"], "price_cents": _cents(b["o_totalprice"])}
        )

    joined = broadcast_join(
        orders.map_batches(_pre, batch_format="pyarrow"), cust, on=["o_custkey"]
    )
    return grouped_sums(
        joined,
        ["c_mktsegment"],
        {"sum_price_cents": "price_cents"},
        count_name="n_orders",
    )


def q_lineitem_orders_join(sf_dir: str):
    """Distributed hash join (both sides large) + grouped aggregate.

    Plan: push the fact-side aggregation below the join (partial
    per-orderkey sums inside map_batches), cogroup-join the partials
    with orders on the orderkey bucket, then a tiny global groupby on
    priority. Only O(distinct keys) rows cross the shuffle.
    """
    import pandas as _pd

    li = read_parquet_clean(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"])

    def _partial(b: _pd.DataFrame) -> _pd.DataFrame:
        b = b.assign(qty=b["l_quantity"].round().astype("int64"))
        return b.groupby("l_orderkey", as_index=False).agg(
            qty=("qty", "sum"), n=("qty", "size")
        )

    li_part = li.map_batches(_partial, batch_format="pandas")
    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    ).rename_columns({"o_orderkey": "l_orderkey"})
    from ..stages.infer import default_num_partitions

    # partials arrive as ~64 tiny blocks; the exchange cost scales with
    # block count, so coalesce both sides to ~1 block/2 CPUs first
    # (measured 8.7 -> 5.2 s on this join)
    joined = cogroup_join(
        li_part, orders, on=["l_orderkey"], how="inner",
        coalesce=default_num_partitions(),
    )
    return grouped_sums(
        joined, ["o_orderpriority"], {"n_items": "n", "sum_qty": "qty"}
    )


def q_top_orders(sf_dir: str):
    ds = read_parquet_clean(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    ds = ds.map_batches(
        lambda b: pa.table(
            {"o_orderkey": b["o_orderkey"], "price_cents": _cents(b["o_totalprice"])}
        ),
        batch_format="pyarrow",
    )
    # Deterministic tie-break: price desc, key asc. Per-block local
    # top-k + driver merge — not an all-to-all Dataset.sort for 100 rows.
    from ..stages.relational import topk_dataset

    return topk_dataset(
        ds, ["price_cents", "o_orderkey"], 100, descending=[True, False]
    )


def q_events_window(sf_dir: str):
    """Tumbling 1-hour window per event_type: count + integer value sum."""
    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def _pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "window_start": pc.floor_temporal(b["ts"], unit="hour"),
                "value_cents": _cents(b["value"]),
            }
        )

    return grouped_sums(
        ds.map_batches(_pre, batch_format="pyarrow"),
        ["event_type", "window_start"],
        {"sum_value_cents": "value_cents"},
        count_name="n_events",
    )


# ---------------------------------------------------------------------------
# Similarity / dedup
# ---------------------------------------------------------------------------

N_QUERIES, KNN_K = 5, 10


def _query_vectors(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """First ``N_QUERIES`` vectors by ``vec_id`` as the query matrix.

    A streaming top-k probe (DuckDB heap over the two needed columns),
    NOT a whole-table driver read: at 100 TB the embeddings table never
    fits in driver memory while the k=5 result always does (VERDICT r4
    item 3). float32 is preserved end-to-end so the ANN oracles'
    distance values are bit-identical to the previous implementation.
    """
    import duckdb

    tbl = duckdb.sql(
        "SELECT vec_id, embedding FROM read_parquet(?) ORDER BY vec_id LIMIT ?",
        params=[_t(sf_dir, "embeddings"), N_QUERIES],
    ).fetch_arrow_table()
    qids = tbl["vec_id"].to_numpy()
    qmat = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    return qids, qmat


def q_knn_cosine(sf_dir: str):
    qids, qmat = _query_vectors(sf_dir)
    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = knn_brute(ds, qids, qmat, k=KNN_K)
    return out.map_batches(
        lambda b: pa.table(
            {
                "query_id": pc.cast(b["query_id"], pa.int64()),
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


RRF_K_CONST = 60


def q_knn_rrf(sf_dir: str):
    """Reciprocal-rank fusion of the cosine and L2 top-10 retrieval
    lists per query (all-integer fusion points, hash-exact vs a
    double-window SQL twin) — rank fusion is how multi-retriever
    search stacks combine lexical/dense/metric variants."""
    from ..stages.similarity import rrf_fuse

    qids, qmat = _query_vectors(sf_dir)
    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    cos = knn_brute(ds, qids, qmat, k=KNN_K, with_scores=True, metric="cosine")
    l2 = knn_brute(ds, qids, qmat, k=KNN_K, with_scores=True, metric="l2")
    return rrf_fuse([cos, l2], k_const=RRF_K_CONST, top_k=KNN_K)


def _ann_acceptance(out: ray.data.Dataset, sf_dir: str, checks) -> pa.Table:
    """Acceptance table for an APPROXIMATE index (the MST/coloring
    trick): per query emit shape facts the oracle can state as
    constants plus calibrated quality booleans — each ``(name, m,
    floor)`` in ``checks`` asserts >= ``floor`` of the k results lie
    in the TRUE cosine top-``m`` (ties broken by vec_id, identical to
    the hash-exact ``knn_cosine`` twin, so both sides rank against
    the same ground truth). The index runs are seeded/deterministic,
    so the floors are fixture facts, not flaky bounds; a regression
    in recall or rank distortion flips a boolean and breaks the hash
    loudly. Driver-side math touches only 5 x max(m) rows."""
    qids, qmat = _query_vectors(sf_dir)
    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    max_m = max(m for _, m, _ in checks)
    truth = knn_brute(ds, qids, qmat, k=max_m, with_scores=True).to_pandas()
    truth = truth.sort_values(
        ["query_id", "score", "vec_id"], ascending=[True, False, True]
    )
    truth["rank"] = truth.groupby("query_id").cumcount() + 1
    rank_of = {
        (int(q), int(v)): int(r)
        for q, v, r in zip(truth.query_id, truth.vec_id, truth["rank"])
    }
    got = out.to_pandas()
    rows = []
    for q in qids:
        g = got[got["query_id"] == q]
        vids = g["vec_id"].astype(int).tolist()
        ranks = [rank_of.get((int(q), v)) for v in vids]
        row = {
            "query_id": int(q),
            "n_results": len(vids),
            "n_distinct": len(set(vids)),
            "self_excluded": int(q) not in vids,
        }
        for name, m, floor in checks:
            row[name] = sum(1 for r in ranks if r is not None and r <= m) >= floor
        rows.append(row)
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    return pa.table(
        {
            "query_id": pa.array(cols["query_id"], pa.int64()),
            "n_results": pa.array(cols["n_results"], pa.int64()),
            "n_distinct": pa.array(cols["n_distinct"], pa.int64()),
            "self_excluded": pa.array(cols["self_excluded"], pa.bool_()),
            **{
                name: pa.array(cols[name], pa.bool_())
                for name, _, _ in checks
            },
        }
    )


# Calibrated ANN acceptance floors (deterministic fixture facts —
# measured per-query minima at sf0.001 AND sf0.01; the seeded index
# builds make them exact, not statistical):
# IVF: every result within the true top-30, recall@10 >= 5/10.
_IVF_CHECKS = [("all_in_top30", 30, KNN_K), ("recall10_ge_5", KNN_K, 5)]
# PQ (m=8, k=16 codebooks over random-ish vectors distorts more):
# >= 5/10 within true top-50, >= 7/10 within true top-100.
_PQ_CHECKS = [("half_in_top50", 50, 5), ("most_in_top100", 100, 7)]


def q_knn_ivf(sf_dir: str):
    """IVF ANN acceptance (approximate by construction — the exact
    surface is the calibrated acceptance table, see
    :func:`_ann_acceptance`)."""
    qids, qmat = _query_vectors(sf_dir)
    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return _ann_acceptance(knn_ivf(ds, qids, qmat, k=KNN_K), sf_dir, _IVF_CHECKS)


def q_knn_ivf_indexed(sf_dir: str):
    """IVF with a materialized centroid-partitioned index: the probe
    reads ONLY the probed list directories (file pruning, the scale
    path knn_ivf's row filter approximates).

    The cached /tmp index is keyed on a DATA fingerprint (embeddings
    file names + sizes + mtimes, not just the path) and trusted only
    when ``ivf_build``'s atomic ``_SUCCESS`` marker is present —
    regenerated data at the same path or an interrupted build must
    force a rebuild, never silently serve stale/partial lists."""
    import hashlib as _hl
    import os as _os

    from ..stages.similarity import ivf_build, knn_ivf_indexed

    qids, qmat = _query_vectors(sf_dir)
    emb_path = _t(sf_dir, "embeddings")
    # "v2": ivf_build's quantizer became sample-order-canonical (round
    # 5); the version salt retires caches built by older code.
    fp = _hl.md5(f"v2|{sf_dir}".encode())
    paths = (
        sorted(
            _os.path.join(emb_path, f)
            for f in _os.listdir(emb_path)
            if f.endswith(".parquet")
        )
        if _os.path.isdir(emb_path)
        else [emb_path]
    )
    for p in paths:
        st = _os.stat(p)
        fp.update(f"{p}|{st.st_size}|{st.st_mtime_ns}".encode())
    idx_dir = f"/tmp/kgray_ivf_{fp.hexdigest()[:16]}"
    if not _os.path.isfile(_os.path.join(idx_dir, "_SUCCESS")):
        ds = read_parquet_clean(emb_path, columns=["vec_id", "embedding"])
        ivf_build(ds, idx_dir, n_clusters=16)
    return _ann_acceptance(
        knn_ivf_indexed(idx_dir, qids, qmat, k=KNN_K, n_probe=4),
        sf_dir,
        _IVF_CHECKS,
    )


def q_ngram_overlap_pairs(sf_dir: str):
    return ngram_jaccard_pairs(_docs(sf_dir), k=3, threshold=0.5)


def q_minhash_dedup(sf_dir: str):
    return minhash_lsh_dedup(_docs(sf_dir))


def q_simhash_dedup(sf_dir: str):
    return simhash_dedup(_docs(sf_dir))


def _embeddings_with_planted(sf_dir: str) -> ray.data.Dataset:
    """Embeddings plus a deterministic planted-duplicate layer: every
    ``vec_id % 10 == 0`` row is copied verbatim under ``vec_id +
    1_000_000``. Identical vectors ALWAYS collide in hyperplane LSH
    (same sign pattern) and always share a k-means cell, so the
    detection paths run at guaranteed-100% recall — which is what
    lets the embedding-dedup family carry an EXACT all-pairs SQL twin
    instead of an empty-vs-empty check (the raw fixture has no pair
    above cosine 0.51; the verify threshold is 0.95)."""
    base = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def _copies(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b["vec_id"] % 10 == 0].copy()
        sel["vec_id"] = sel["vec_id"] + 1_000_000
        return sel

    return base.union(base.map_batches(_copies, batch_format="pandas"))


def q_embedding_dedup(sf_dir: str):
    """Hyperplane-LSH embedding near-dup over the planted corpus —
    hash-exact vs the all-pairs ``list_cosine_similarity`` twin (the
    0.51-vs-0.95 cosine margin makes the threshold float-safe across
    numpy/DuckDB)."""
    return embedding_dedup(_embeddings_with_planted(sf_dir))


# ---------------------------------------------------------------------------
# KG pipeline (model-dependent -> rows-only checks)
# ---------------------------------------------------------------------------

def _kg_config() -> dict:
    return {
        "chunking": {"chunk_size": CHUNK_SIZE, "overlap": CHUNK_OVERLAP},
        "runtime": {"lexical_mode": "blocked"},
    }


# The driver calls every query in one process; kg_edges/kg_nodes share
# one pipeline build per sf_dir instead of re-running extraction.
_BUILD_CACHE: dict[str, dict] = {}


def _kg_build(sf_dir: str) -> dict:
    if sf_dir not in _BUILD_CACHE:
        _BUILD_CACHE.clear()
        res = build_graph(pages_from_documents(sf_dir), _kg_config())
        res["edges"] = res["edges"].materialize()
        _BUILD_CACHE[sf_dir] = res
    return _BUILD_CACHE[sf_dir]


def q_kg_triples_raw(sf_dir: str):
    pages = pages_from_documents(sf_dir)
    docs = extract_docs(pages)
    chunks = chunk_docs(docs, CHUNK_SIZE, CHUNK_OVERLAP)
    return extract_triples(chunks, {"llm": {"provider": "mock"}}, concurrency=(1, 4))


def q_kg_triples_std(sf_dir: str):
    raw = q_kg_triples_raw(sf_dir).materialize()
    std, _ = standardize_triples(raw, {"llm": {"provider": "mock"}})
    return std


def q_kg_incremental(sf_dir: str):
    """Release-to-release delta canonicalization: release 1 = full
    Phase 2 over ~70% of pages (portable md5 url split); release 2
    standardizes the other 30% against the FROZEN release-1 alias map
    via ``incremental_standardize`` — known entities keep their
    published canonicals, novels attach by norm key or elect among
    themselves. Hash-exact vs :func:`_kg_incremental_oracle_sql`."""
    from ..stages.canonicalize import incremental_standardize

    raw = q_kg_triples_raw(sf_dir).materialize()

    def _side(keep_old: bool):
        def _f(b: pd.DataFrame) -> pd.DataFrame:
            import hashlib

            # portable url split (md5, not the engine-specific pandas
            # hash) so the release partition reproduces in SQL
            h = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big") % 10
                    for u in b["url"].astype(str)
                ),
                dtype=np.int64,
                count=len(b),
            )
            m = (h < 7) if keep_old else (h >= 7)
            return b[m]

        return _f

    old = raw.map_batches(_side(True), batch_format="pandas")
    new = raw.map_batches(_side(False), batch_format="pandas")
    _, alias_old = standardize_triples(old, {"llm": {"provider": "mock"}})
    inc, _ = incremental_standardize(new, alias_old)
    return inc


def q_kg_edges(sf_dir: str):
    return _kg_build(sf_dir)["edges"]


def q_kg_nodes(sf_dir: str):
    return _kg_build(sf_dir)["nodes"]


def q_kg_nodes_louvain(sf_dir: str):
    """nodes table with Louvain community labels + centrality-blend
    sizing (reference visualization.py:186-227 parity; driver-side
    over the count-gated edge residue)."""
    from ..stages.materialize import (
        centrality_blend_sizes,
        louvain_communities,
        nodes_table,
    )

    res = _kg_build(sf_dir)
    edges = res["edges"]
    comms = louvain_communities(edges)
    components = comms if comms is not None else res["components"]
    return nodes_table(edges, components, sizes=centrality_blend_sizes(edges))


# ---------------------------------------------------------------------------
# More relational / text / streaming operators (oracle-checked)
# ---------------------------------------------------------------------------

_W15_US = 15 * 60 * 1_000_000  # 15-minute slide, in microseconds


def q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, hour) as three combined grouped
    sums unioned under sentinel keys ('ALL' / epoch-0 hour) — ints
    only, so the hash matches the SQL ROLLUP exactly."""
    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def _pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "window_start_us": pc.cast(
                    pc.floor_temporal(b["ts"], unit="hour"), pa.int64()
                ),
                "value_cents": _cents(b["value"]),
            }
        )

    pre = ds.map_batches(_pre, batch_format="pyarrow")
    lvl2 = grouped_sums(
        pre, ["event_type", "window_start_us"], {"sum_value_cents": "value_cents"},
        count_name="n_events",
    )
    lvl1 = grouped_sums(
        pre, ["event_type"], {"sum_value_cents": "value_cents"}, count_name="n_events"
    ).map_batches(
        lambda b: b.append_column("window_start_us", pa.array([0] * len(b), pa.int64())),
        batch_format="pyarrow",
    )
    lvl0 = grouped_sums(
        pre.map_batches(
            lambda b: b.append_column("all", pa.array(["ALL"] * len(b), pa.string())),
            batch_format="pyarrow",
        ),
        ["all"],
        {"sum_value_cents": "value_cents"},
        count_name="n_events",
    ).map_batches(
        lambda b: pa.table(
            {
                "event_type": b["all"].combine_chunks().cast(pa.string()),
                "window_start_us": pa.array([0] * len(b), pa.int64()),
                "n_events": b["n_events"],
                "sum_value_cents": b["sum_value_cents"],
            }
        ),
        batch_format="pyarrow",
    )
    cols = ["event_type", "window_start_us", "n_events", "sum_value_cents"]
    return (
        lvl2.select_columns(cols).union(lvl1.select_columns(cols), lvl0.select_columns(cols))
    )


def q_events_sliding_window(sf_dir: str):
    """1-hour windows sliding every 15 minutes: each event belongs to
    the 4 windows covering it; explode + one combined grouped sum.
    Window starts as integer epoch-microseconds (hash-exact)."""
    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["ts", "value"])

    def _explode(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        cents = _cents(b["value"]).to_numpy(zero_copy_only=False)
        floor15 = (ts_us // _W15_US) * _W15_US
        ks = np.arange(4, dtype=np.int64)
        starts = (floor15[:, None] - ks[None, :] * _W15_US).reshape(-1)
        return pa.table(
            {
                "window_start_us": pa.array(starts, pa.int64()),
                "value_cents": pa.array(np.repeat(cents, 4), pa.int64()),
            }
        )

    return grouped_sums(
        ds.map_batches(_explode, batch_format="pyarrow"),
        ["window_start_us"],
        {"sum_value_cents": "value_cents"},
        count_name="n_events",
    )


def q_events_quantiles(sf_dir: str):
    """Exact discrete p50/p90/p99 of value_cents — histogram + sorted
    early-stop stream (DuckDB quantile_disc semantics)."""
    from ..stages.relational import discrete_quantiles

    ds = read_parquet_clean(_t(sf_dir, "events"), columns=["value"])
    cents = ds.map_batches(
        lambda b: pa.table({"value_cents": _cents(b["value"])}), batch_format="pyarrow"
    )
    return discrete_quantiles(cents, "value_cents", [0.5, 0.9, 0.99])


def q_customers_without_orders(sf_dir: str):
    """Anti-join at the query surface: customers with no URGENT-
    priority orders, counted per market segment."""
    from ..stages.infer import normalize_blocks, sanitize_for_join
    from ..stages.relational import cogroup_join

    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]
    )
    okeys = sanitize_for_join(
        orders.map_batches(
            lambda b: pa.table({"c_custkey": b["o_custkey"]}).filter(
                pc.equal(b["o_orderpriority"], "1-URGENT")
            ),
            batch_format="pyarrow",
        ),
        pa.schema([("c_custkey", pa.int64())]),
    )
    anti = cogroup_join(
        cust,
        okeys,
        on=["c_custkey"],
        how="left_anti",
        left_schema=pa.schema([("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]),
        right_schema=pa.schema([("c_custkey", pa.int64())]),
    )
    out_schema = pa.schema([("c_mktsegment", pa.string()), ("n_customers", pa.int64())])
    return normalize_blocks(
        grouped_sums(
            anti.map_batches(
                lambda b: b.append_column("one", pa.array([1] * len(b), pa.int64())),
                batch_format="pyarrow",
            ),
            ["c_mktsegment"],
            {"n_customers": "one"},
        ),
        out_schema,
    )


def q_customer_order_counts(sf_dir: str):
    """LEFT OUTER join at the query surface: every customer with its
    order count, zero for customers that never ordered (the unmatched
    left rows the inner join would drop)."""
    from ..stages.infer import normalize_blocks, sanitize_for_join
    from ..stages.relational import cogroup_join, grouped_sums

    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    orders = read_parquet_clean(_t(sf_dir, "orders"), columns=["o_custkey"])
    counts = sanitize_for_join(
        grouped_sums(
            orders.map_batches(
                lambda b: pa.table(
                    {
                        "c_custkey": b["o_custkey"].combine_chunks().cast(pa.int64()),
                        "one": pa.array([1] * len(b), pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["c_custkey"],
            {"n_orders": "one"},
        ),
        pa.schema([("c_custkey", pa.int64()), ("n_orders", pa.int64())]),
    )
    joined = cogroup_join(
        cust,
        counts,
        on=["c_custkey"],
        how="left_outer",
        left_schema=pa.schema(
            [("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]
        ),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("n_orders", pa.int64())]),
    )
    out_schema = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_mktsegment", pa.string()),
            ("n_orders", pa.int64()),
        ]
    )
    return normalize_blocks(
        joined.map_batches(
            lambda b: pa.table(
                {
                    "c_custkey": b["c_custkey"],
                    "c_mktsegment": b["c_mktsegment"],
                    "n_orders": pc.coalesce(
                        b["n_orders"].combine_chunks().cast(pa.int64()),
                        pa.scalar(0, pa.int64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        out_schema,
    )


PAGERANK_ITERS, PAGERANK_SCALE, PAGERANK_DNUM, PAGERANK_DDEN = 3, 10**12, 85, 100
KATZ_ITERS, KATZ_SCALE, KATZ_ANUM, KATZ_ADEN = 4, 10**9, 1, 10


def _cnr_edges(sf_dir: str) -> ray.data.Dataset:
    """customer->nation->region layered edge list with namespaced node
    ids (shared by the pagerank and k_hop queries)."""
    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "src": "c" + b["c_custkey"].astype(str),
                "dst": "n" + b["c_nationkey"].astype(str),
            }
        ),
        batch_format="pandas",
    )
    nat = read_parquet_clean(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "src": "n" + b["n_nationkey"].astype(str),
                "dst": "r" + b["n_regionkey"].astype(str),
            }
        ),
        batch_format="pandas",
    )
    return cust.union(nat)


def q_pagerank(sf_dir: str):
    """Integer fixed-point PageRank over the customer->nation->region
    layered graph — iterated bucketed joins + combined grouped sums,
    bit-exact vs the unrolled SQL oracle (float PageRank can never
    hash-match across engines; integer sums commute)."""
    from ..stages.graph_algos import pagerank_int

    return pagerank_int(
        _cnr_edges(sf_dir),
        iters=PAGERANK_ITERS,
        scale=PAGERANK_SCALE,
        d_num=PAGERANK_DNUM,
        d_den=PAGERANK_DDEN,
    )


def q_part_tree_rollup(sf_dir: str):
    """Taxonomy/BOM-style subtree rollup over the deterministic part
    forest (parent = p_partkey // 10, roots under 10): per node, the
    sum of retail-price cents over its subtree. Ancestor closure by
    pointer doubling — log(depth) bucketed join+dedup rounds, one
    grouped contribution sum; recursive-CTE SQL twin."""
    from ..stages.graph_algos import tree_rollup

    part = read_parquet_clean(
        _t(sf_dir, "part"), columns=["p_partkey", "p_retailprice"]
    ).materialize()
    values = part.map_batches(
        lambda b: pd.DataFrame(
            {
                "node": b["p_partkey"].astype("int64"),
                "value": (b["p_retailprice"] * 100).round().astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    edges = part.map_batches(
        lambda b: pd.DataFrame(
            {
                "child": b.loc[b["p_partkey"] >= 10, "p_partkey"].astype("int64"),
                "parent": (
                    b.loc[b["p_partkey"] >= 10, "p_partkey"].astype("int64") // 10
                ),
            }
        ),
        batch_format="pandas",
    )
    return tree_rollup(values, edges)


def q_graph_katz(sf_dir: str):
    """Integer fixed-point Katz centrality over the customer->nation->
    region layered graph — per iteration ONE bucketed join + ONE
    combined grouped sum (no out-degree division, no dangling pass),
    bit-exact vs the unrolled SQL twin."""
    from ..stages.graph_algos import katz_int

    return katz_int(
        _cnr_edges(sf_dir),
        iters=KATZ_ITERS,
        scale=KATZ_SCALE,
        a_num=KATZ_ANUM,
        a_den=KATZ_ADEN,
    )


def q_khop_region(sf_dir: str):
    """Undirected 2-hop BFS neighborhood of region node r0 over the
    customer graph — distributed frontier expansion, hash-exact vs an
    unrolled-CTE BFS oracle."""
    from ..stages.graph_algos import k_hop_neighbors

    return k_hop_neighbors(_cnr_edges(sf_dir), ["r0"], 2)


def _cnrs_edges(sf_dir: str) -> ray.data.Dataset:
    """Triangle-bearing fixture graph: customers and suppliers linked to
    BOTH their nation and that nation's region (so every c/s closes a
    triangle through n->r). The customer->region / supplier->region legs
    need the nation dimension — a FIXED-size table (25 rows at every
    TPC-H scale factor), so it broadcasts by construction, never joins.
    """
    import pyarrow.parquet as pq

    nat = pq.read_table(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    n2r = dict(zip(nat["n_nationkey"].astype(int), nat["n_regionkey"].astype(int)))
    n2r_ref = ray.put(n2r)

    def _fan(prefix: str, key_col: str, nat_col: str):
        def _f(b: pd.DataFrame) -> pd.DataFrame:
            n2r_map = ray.get(n2r_ref)
            k = b[key_col].astype(int)
            n = b[nat_col].astype(int)
            r = n.map(n2r_map)
            return pd.DataFrame(
                {
                    "src": np.concatenate(
                        [(prefix + k.astype(str)).to_numpy(object)] * 2
                    ),
                    "dst": np.concatenate(
                        [
                            ("n" + n.astype(str)).to_numpy(object),
                            ("r" + r.astype(str)).to_numpy(object),
                        ]
                    ),
                }
            )

        return _f

    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(_fan("c", "c_custkey", "c_nationkey"), batch_format="pandas")
    supp = read_parquet_clean(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_fan("s", "s_suppkey", "s_nationkey"), batch_format="pandas")
    nre = read_parquet_clean(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "src": "n" + b["n_nationkey"].astype(str),
                "dst": "r" + b["n_regionkey"].astype(str),
            }
        ),
        batch_format="pandas",
    )
    return cust.union(supp).union(nre)


_CNRS_EDGES_SQL = """
        WITH base AS (
          SELECT 'c' || CAST(c_custkey AS VARCHAR) AS x,
                 'n' || CAST(c_nationkey AS VARCHAR) AS y FROM customer
          UNION ALL
          SELECT 's' || CAST(s_suppkey AS VARCHAR),
                 'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
          UNION ALL
          SELECT 'n' || CAST(n_nationkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR) FROM nation
          UNION ALL
          SELECT 'c' || CAST(c_custkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR)
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          UNION ALL
          SELECT 's' || CAST(s_suppkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR)
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ),
        und AS (
          SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
          FROM base WHERE x <> y
        )"""


def q_graph_triangles(sf_dir: str):
    """Per-node triangle counts over the customer/supplier/nation/region
    fixture graph — degree-ordered orientation, wedge + closing-edge
    bucketed shuffles, hash-exact vs a three-way self-join oracle."""
    from ..stages.graph_algos import triangle_counts

    return triangle_counts(_cnrs_edges(sf_dir))


def q_graph_clustering(sf_dir: str):
    """Global clustering coefficient in exact integer thousandths:
    closed wedges (= sum of per-node triangle counts = 3T) over total
    wedges (= sum of C(degree, 2)) — composes the oracle-green
    triangle and degree operators into one 1-row summary, hash-exact
    because both numerator and denominator are integers."""
    from ..stages.graph_algos import (
        triangle_counts,
        undirected_degrees,
        undirected_simple_edges,
    )

    tri = triangle_counts(_cnrs_edges(sf_dir))
    closed = int(tri.sum("n_triangles") or 0)
    deg = undirected_degrees(undirected_simple_edges(_cnrs_edges(sf_dir)))
    wedges = int(
        deg.map_batches(
            lambda b: pd.DataFrame(
                {
                    "w": b["degree"].to_numpy(np.int64)
                    * (b["degree"].to_numpy(np.int64) - 1)
                    // 2
                }
            ),
            batch_format="pandas",
        ).sum("w")
        or 0
    )
    coeff = (closed * 1000) // wedges if wedges else 0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_closed": pa.array([closed], pa.int64()),
                "n_wedges": pa.array([wedges], pa.int64()),
                "coeff_milli": pa.array([coeff], pa.int64()),
            }
        )
    )


def q_degree_distribution(sf_dir: str):
    """``(degree, n_nodes)`` histogram of the same undirected simple
    graph — two bucketed sums, zero driver residue."""
    from ..stages.graph_algos import degree_histogram

    return degree_histogram(_cnrs_edges(sf_dir))


def q_graph_edge_support(sf_dir: str):
    """Per-edge triangle support (the k-truss peeling measure) over the
    customer/supplier/nation/region fixture graph — same oriented-wedge
    plan as ``graph_triangles`` but credited to each triangle's three
    canonical edges; zero-support bridges included. Hash-exact vs a
    three-way self-join oracle."""
    from ..stages.graph_algos import edge_support

    return edge_support(_cnrs_edges(sf_dir))


def q_graph_link_pred(sf_dir: str):
    """Top-100 non-adjacent node pairs by the resource-allocation
    link-prediction index in exact integer fixed-point (common
    neighbor w contributes 1000000 // deg(w)) — two bucketed shuffles,
    degree computed locally per middle bucket, existing edges excluded
    by in-shuffle sentinel rows; hash-exact vs an adjacency self-join
    + QUALIFY SQL twin."""
    from ..stages.graph_algos import resource_allocation_topk

    return resource_allocation_topk(_cnrs_edges(sf_dir))


def q_graph_ktruss(sf_dir: str):
    """3-truss of the fixture graph: every surviving edge sits in >= 1
    triangle OF THE SUBGRAPH. k=3 reaches its fixpoint in one peel
    (support-0 edges are in no triangle, so removing them changes no
    other edge's support) — which is exactly what makes an exact SQL
    twin possible; deeper k is pinned against networkx peeling in
    ``tests/test_truss.py``."""
    from ..stages.graph_algos import k_truss

    return k_truss(_cnrs_edges(sf_dir), 3)


def _bip_edges(sf_dir: str) -> ray.data.Dataset:
    """Mixed-parity fixture graph: customer->order stars (bipartite by
    construction) unioned with supplier->nation->region legs (each
    supplier closes a triangle through n->r — an odd cycle), so the
    bipartite operator must both COLOR and CONDEMN components in one
    run. The nation dim (25 rows) broadcasts; nothing joins."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    n2r = dict(zip(nat["n_nationkey"].astype(int), nat["n_regionkey"].astype(int)))
    n2r_ref = ray.put(n2r)

    co = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "src": ("c" + b["o_custkey"].astype(int).astype(str)).to_numpy(object),
                "dst": ("o" + b["o_orderkey"].astype(int).astype(str)).to_numpy(object),
            }
        ),
        batch_format="pandas",
    )

    def _supp(b: pd.DataFrame) -> pd.DataFrame:
        n2r_map = ray.get(n2r_ref)
        k = b["s_suppkey"].astype(int)
        n = b["s_nationkey"].astype(int)
        r = n.map(n2r_map)
        return pd.DataFrame(
            {
                "src": np.concatenate([("s" + k.astype(str)).to_numpy(object)] * 2),
                "dst": np.concatenate(
                    [
                        ("n" + n.astype(str)).to_numpy(object),
                        ("r" + r.astype(str)).to_numpy(object),
                    ]
                ),
            }
        )

    supp = read_parquet_clean(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_supp, batch_format="pandas")
    nre = read_parquet_clean(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "src": ("n" + b["n_nationkey"].astype(int).astype(str)).to_numpy(object),
                "dst": ("r" + b["n_regionkey"].astype(int).astype(str)).to_numpy(object),
            }
        ),
        batch_format="pandas",
    )
    return co.union(supp).union(nre)


def q_graph_bipartite(sf_dir: str):
    """2-coloring + odd-cycle detection over the mixed fixture graph
    (customer-order stars color cleanly; supplier-nation-region
    triangles are condemned with side = -1) — doubled-graph parity
    closure over the shared multi-source BFS; hash-exact vs a
    double recursive-CTE twin (min-label components + parity-state
    closure)."""
    from ..stages.graph_algos import bipartite_labels

    return bipartite_labels(_bip_edges(sf_dir))


def q_temporal_reach(sf_dir: str):
    """Earliest-arrival temporal reachability over the shipment graph
    (supplier <-> part edges stamped with l_shipdate, both directions,
    seeds = suppliers 1-3 at t=0): which parts/suppliers can a
    contamination starting at those suppliers reach via
    time-respecting shipment chains, and when. Hash-exact vs a
    recursive-CTE twin carrying (node, time) states."""
    import pyarrow.parquet as pq

    from ..stages.graph_algos import temporal_reachability

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_partkey", "l_shipdate"],
    )

    def _e(b: pd.DataFrame) -> pd.DataFrame:
        s = ("s" + b["l_suppkey"].astype(int).astype(str)).to_numpy(object)
        p = ("p" + b["l_partkey"].astype(int).astype(str)).to_numpy(object)
        t = b["l_shipdate"].astype("datetime64[us]").astype("int64").to_numpy()
        return pd.DataFrame(
            {
                "src": np.concatenate([s, p]),
                "dst": np.concatenate([p, s]),
                "ts": np.concatenate([t, t]),
            }
        )

    sup = pq.read_table(
        _t(sf_dir, "supplier"), columns=["s_suppkey"]
    ).to_pandas()
    seeds = [
        f"s{k}" for k in sorted(sup.loc[sup["s_suppkey"] <= 3, "s_suppkey"])
    ]
    return temporal_reachability(
        li.map_batches(_e, batch_format="pandas"), seeds, start=0
    )


def q_doc_heavy_tokens(sf_dir: str):
    """Exact heavy-hitter tokens (freq >= 1/500 of the corpus token
    stream) via frequent-items candidates + exact recount — the only
    shuffle is candidate-filtered per-block partials, never the full
    open-vocabulary token domain. Hash-exact vs a GROUP BY/HAVING
    twin."""
    from ..stages.sketches import exact_heavy_hitters

    def _tok_rows(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.lower().str.findall(r"\w+")
        arrs = [t for t in toks.to_numpy() if t]
        if not arrs:
            return pd.DataFrame({"value": pd.Series([], dtype=object)})
        return pd.DataFrame({"value": np.concatenate(arrs)})

    return exact_heavy_hitters(
        _docs(sf_dir).map_batches(_tok_rows, batch_format="pandas"),
        "value",
        denom=500,
    )


def q_graph_assortativity(sf_dir: str):
    """Degree-assortativity sufficient statistics (m, s_sum, s_prod,
    s_sq) over the customer/supplier/nation/region fixture graph —
    exact integers so Newman's r stays a caller-side rational; one
    degree count + one degree join + one pair-keyed partial-sums
    reduce (residue = one row per bucket)."""
    from ..stages.graph_algos import degree_mixing_sums

    return degree_mixing_sums(_cnrs_edges(sf_dir))


def q_graph_rich_club(sf_dir: str):
    """Rich-club counts at thresholds 1,2,4,8,16 over the fixture graph
    — exact (k, n_nodes, n_edges) rows; all thresholds share one degree
    join + one pair-keyed fold (residue = |ks| rows per bucket)."""
    from ..stages.graph_algos import rich_club_counts

    return rich_club_counts(_cnrs_edges(sf_dir), [1, 2, 4, 8, 16])


def q_threshold_components(sf_dir: str):
    """Single-linkage dendrogram levels over the customer-order graph
    weighted by lineitem count: component counts at weight thresholds
    1/3/5 in one call (the dedup-threshold sensitivity curve); one
    descending-weight union-find serves all thresholds under the gate."""
    from ..stages.graph_algos import threshold_components

    ords = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    )
    li = read_parquet_clean(_t(sf_dir, "lineitem"), columns=["l_orderkey"])

    def _li_counts(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["l_orderkey"].value_counts(sort=False)
        return pd.DataFrame(
            {"l_orderkey": vc.index.to_numpy(np.int64),
             "w": vc.to_numpy(np.int64)}
        )

    from ..stages.infer import bucketed_reduce
    from ..stages.relational import cogroup_join

    wcount_schema = pa.schema([("l_orderkey", pa.int64()), ("w", pa.int64())])
    per_order = bucketed_reduce(
        li,
        ["l_orderkey"],
        lambda g: g.groupby("l_orderkey", sort=False, as_index=False)["w"].sum(),
        wcount_schema,
        combiner=_li_counts,
    )
    joined = cogroup_join(
        ords,
        per_order.map_batches(
            lambda b: b.rename(columns={"l_orderkey": "o_orderkey"}),
            batch_format="pandas",
        ),
        ["o_orderkey"],
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("w", pa.int64())]),
    )
    edges = joined.map_batches(
        lambda b: pd.DataFrame(
            {
                "src": ("c" + b["o_custkey"].astype(int).astype(str)).to_numpy(object),
                "dst": ("o" + b["o_orderkey"].astype(int).astype(str)).to_numpy(object),
                "w": b["w"].to_numpy(np.int64),
            }
        ),
        batch_format="pandas",
    )
    return threshold_components(edges, [1, 3, 5])


def q_graph_double_sweep(sf_dir: str):
    """Double-sweep diameter lower bound over the fixture graph: BFS
    from the min-id node to its farthest node, then BFS again — ecc2
    <= diameter, horizon-bounded at 20 hops on BOTH sides so the
    recursive-CTE twin's semantics match exactly."""
    from ..stages.graph_algos import double_sweep_bounds

    return double_sweep_bounds(_cnrs_edges(sf_dir), max_hops=20)


def q_orders_rrf(sf_dir: str):
    """Reciprocal-rank fusion of two per-customer order rankings
    (price-desc and recency-desc) — exact integer scale//(60+rank)
    scores, top-3 per customer, ONE group-keyed shuffle for both
    window ranks + fusion + top-k."""
    from ..stages.retrieval import rrf_fuse_grouped

    ords = read_parquet_clean(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "cust": b["o_custkey"].astype(int).astype(str).to_numpy(object),
                "order_id": b["o_orderkey"].astype(int).astype(str).to_numpy(object),
                # integer cents + epoch-us so both sort keys are exact
                "price_c": (b["o_totalprice"] * 100).round().astype("int64"),
                "ts": b["o_orderdate"].astype("datetime64[us]").astype("int64"),
                "okey": b["o_orderkey"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    return rrf_fuse_grouped(
        ords,
        "cust",
        "order_id",
        order_a=(["price_c", "okey"], [False, True]),
        order_b=(["ts", "okey"], [False, True]),
        k=60,
        topk=3,
    )


def q_part_frequent_triples(sf_dir: str):
    """Apriori 3-itemsets over order baskets: part triples appearing
    in >= 2 distinct orders with exact support — frequent pairs are
    broadcast to prune candidate triples before the shuffle."""
    from ..stages.cooccur import frequent_triples

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"]
    )
    return frequent_triples(li, "l_orderkey", "l_partkey", minsup=2)


def q_part_rules(sf_dir: str):
    """Pair-antecedent association rules from frequent part triples —
    exact support + integer-thousandths confidence (1000*sup//sup_pair);
    pair supports computed once and reused for pruning + denominators."""
    from ..stages.cooccur import association_rules

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"]
    )
    return association_rules(li, "l_orderkey", "l_partkey", minsup=2)


def q_weighted_sssp(sf_dir: str):
    """Budget-bounded weighted shortest paths over the shipment
    multigraph (supplier <-> part edges weighted by l_linenumber,
    seeds = suppliers 1-3, budget 6) — parallel edges need no dedup,
    the min-fixpoint keeps the cheapest; recursive-CTE twin."""
    import pyarrow.parquet as pq

    from ..stages.graph_algos import weighted_sssp

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_partkey", "l_linenumber"],
    )

    def _e(b: pd.DataFrame) -> pd.DataFrame:
        s = ("s" + b["l_suppkey"].astype(int).astype(str)).to_numpy(object)
        p = ("p" + b["l_partkey"].astype(int).astype(str)).to_numpy(object)
        w = b["l_linenumber"].astype("int64").to_numpy()
        return pd.DataFrame(
            {
                "src": np.concatenate([s, p]),
                "dst": np.concatenate([p, s]),
                "w": np.concatenate([w, w]),
            }
        )

    sup = pq.read_table(
        _t(sf_dir, "supplier"), columns=["s_suppkey"]
    ).to_pandas()
    seeds = [
        f"s{k}" for k in sorted(sup.loc[sup["s_suppkey"] <= 3, "s_suppkey"])
    ]
    return weighted_sssp(
        li.map_batches(_e, batch_format="pandas"), seeds, dist_limit=6
    )


def q_supplier_negatives(sf_dir: str):
    """Deterministic negative (supplier, part) pairs for two-tower
    training: LCG-derandomized candidates anti-joined against true
    shipment edges, smallest-j prefix per supplier — a SQL twin
    regenerates identical candidates, so the sample hash-checks."""
    import pyarrow.parquet as pq

    from ..stages.training import bipartite_negative_samples

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_suppkey", "l_partkey"]
    )
    pmax = int(
        pq.read_table(_t(sf_dir, "part"), columns=["p_partkey"])["p_partkey"]
        .to_pandas().max()
    )
    return bipartite_negative_samples(
        li, l_col="l_suppkey", r_col="l_partkey", r_max=pmax,
        per_left=3, m_candidates=8,
    )


def q_doc_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth: distinct tokens seen at the
    10/25/50/100% doc-id cuts — one token-keyed MIN reduce, all cuts
    share one pass over the (token, first_doc) residue."""
    from ..stages.vocab import vocab_growth

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "text"]
    )
    return vocab_growth(docs, pcts=[10, 25, 50, 100])


def q_kcenter_coreset(sf_dir: str):
    """Greedy k-center (farthest-point) coreset selection over the
    embeddings table, k=5: exact fixed-point distances, min-id seed,
    (dist desc, id asc) argmax — bit-identical at any layout and
    hash-exact vs a 5-round unrolled SQL twin."""
    from ..stages.clustering import kcenter_select

    emb = read_parquet_clean(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    return kcenter_select(emb, k=5)


def q_part_copurchase(sf_dir: str):
    """Top-100 part pairs by the number of distinct orders containing
    both (market-basket co-occurrence over lineitem) — pair explosion
    bounded per basket, deterministic tie-break, SQL-oracle-exact."""
    from ..stages.cooccur import cooccur_pairs

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"]
    )
    # explicit Arrow projection, not rename_columns (NOTES.md item 10)
    return cooccur_pairs(
        li, "l_orderkey", "l_partkey", min_count=2, top_k=100
    ).map_batches(
        lambda b: pa.table(
            {"part_a": b["item_a"], "part_b": b["item_b"], "n_orders": b["n_baskets"]}
        ),
        batch_format="pyarrow",
    )


def q_node_similarity(sf_dir: str):
    """Top-100 node pairs by common-neighbor count (link-prediction /
    entity-blocking signal) — expressed as co-occurrence with the
    MIDDLE node as basket and its neighbors as items, so per-middle
    explosion is deg², never corpus-sized; deterministic tie-break."""
    from ..stages.cooccur import cooccur_pairs
    from ..stages.graph_algos import undirected_simple_edges

    und = undirected_simple_edges(_cnrs_edges(sf_dir))
    neigh = und.map_batches(
        lambda b: pd.DataFrame(
            {
                "node": pd.concat([b["a"], b["b"]], ignore_index=True),
                "nb": pd.concat([b["b"], b["a"]], ignore_index=True),
            }
        ),
        batch_format="pandas",
    )
    return cooccur_pairs(
        neigh, "node", "nb", min_count=2, top_k=100, item_type=pa.string()
    ).map_batches(
        lambda b: pa.table(
            {
                "node_a": b["item_a"],
                "node_b": b["item_b"],
                "n_common": b["n_baskets"],
            }
        ),
        batch_format="pyarrow",
    )


def q_domain_stats(sf_dir: str):
    """Per-source corpus profile (docs, chars, tokens, distinct langs)."""
    from ..stages.webtext import domain_stats

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "source", "lang", "text"]
    )
    return domain_stats(docs)


def q_doc_gopher(sf_dir: str):
    """Gopher-style integer quality gate per document."""
    from ..stages.webtext import gopher_filter

    return gopher_filter(_docs(sf_dir))


DUP_SPAN_K = 5


SOURCE_OVERLAP_K = 3


def q_source_overlap(sf_dir: str):
    """Pairwise source-overlap matrix: distinct word-3-grams shared by
    every source pair — the cross-crawl contamination diagnostic. One
    gram-keyed bucketed reduce emits pair partials; only pair counts
    leave the shuffle."""
    from ..stages.webtext import source_overlap_matrix

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["source", "text"]
    )
    return source_overlap_matrix(docs, k=SOURCE_OVERLAP_K)


def q_doc_dup_spans(sf_dir: str):
    """Word-5-gram duplicate-span report per document (exact-substring
    dedup proxy; corpus-wide gram multiplicity >= 2 marks a window)."""
    from ..stages.webtext import dup_span_stats

    return dup_span_stats(_docs(sf_dir), k=DUP_SPAN_K)


_CNR_EDGES_BODY = """
          SELECT 'c' || CAST(c_custkey AS VARCHAR) AS src,
                 'n' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
          UNION ALL
          SELECT 'n' || CAST(n_nationkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR) FROM nation
"""


def _pagerank_oracle_sql(
    iters: int = PAGERANK_ITERS,
    scale: int = PAGERANK_SCALE,
    d_num: int = PAGERANK_DNUM,
    d_den: int = PAGERANK_DDEN,
    edges_body: str = _CNR_EDGES_BODY,
) -> str:
    """Unrolled-iteration SQL twin of the integer PageRank recurrence
    (DuckDB ``//`` = integer floor division, same as Python on
    non-negatives; every sum cast back to BIGINT). ``edges_body`` is
    the SELECT producing (src, dst) — swap it to rank a different
    graph with the identical recurrence."""
    head = f"""
        WITH edges AS (
          {edges_body}
        ),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges UNION SELECT dst FROM edges
          )
        ),
        outdeg AS (
          SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
          FROM edges GROUP BY src
        ),
        params AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(((({d_den} - {d_num}) * {scale}) // {d_den}) // count(*) AS BIGINT) AS base
          FROM nodes
        ),
        r0 AS (
          SELECT node, CAST({scale} // (SELECT n FROM params) AS BIGINT) AS rank_scaled
          FROM nodes
        )"""
    steps = []
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        steps.append(f""",
        dang{k} AS (
          SELECT CAST(COALESCE(CAST(sum(r.rank_scaled) AS BIGINT), 0)
                      // (SELECT n FROM params) AS BIGINT) AS d_share
          FROM {prev} r LEFT JOIN outdeg o ON r.node = o.node
          WHERE o.node IS NULL
        ),
        s{k} AS (
          SELECT e.dst AS node,
                 CAST(sum(r.rank_scaled // o.outdeg) AS BIGINT) AS s_v
          FROM edges e
          JOIN {prev} r ON e.src = r.node
          JOIN outdeg o ON e.src = o.node
          GROUP BY e.dst
        ),
        r{k} AS (
          SELECT v.node,
                 CAST((SELECT base FROM params)
                      + ({d_num} * (COALESCE(s.s_v, 0) + (SELECT d_share FROM dang{k})))
                        // {d_den} AS BIGINT) AS rank_scaled
          FROM nodes v LEFT JOIN s{k} s ON v.node = s.node
        )""")
    return head + "".join(steps) + f"""
        SELECT node, rank_scaled FROM r{iters}
    """


def _katz_oracle_sql(
    iters: int = KATZ_ITERS,
    scale: int = KATZ_SCALE,
    a_num: int = KATZ_ANUM,
    a_den: int = KATZ_ADEN,
) -> str:
    """Unrolled-iteration SQL twin of the integer Katz recurrence
    (x0 = scale; x_{t+1} = scale + a_num*S_v // a_den — DuckDB ``//``
    floors like Python on non-negatives; sums cast back to BIGINT)."""
    head = f"""
        WITH edges AS (
          SELECT 'c' || CAST(c_custkey AS VARCHAR) AS src,
                 'n' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
          UNION ALL
          SELECT 'n' || CAST(n_nationkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR) FROM nation
        ),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges UNION SELECT dst FROM edges
          )
        ),
        r0 AS (
          SELECT node, CAST({scale} AS BIGINT) AS katz_scaled FROM nodes
        )"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""",
        s{k} AS (
          SELECT e.dst AS node, CAST(sum(r.katz_scaled) AS BIGINT) AS s_v
          FROM edges e JOIN r{k - 1} r ON e.src = r.node
          GROUP BY e.dst
        ),
        r{k} AS (
          SELECT v.node,
                 CAST({scale} + ({a_num} * COALESCE(s.s_v, 0)) // {a_den}
                      AS BIGINT) AS katz_scaled
          FROM nodes v LEFT JOIN s{k} s ON v.node = s.node
        )""")
    return head + "".join(steps) + f"""
        SELECT node, katz_scaled FROM r{iters}
    """


PPR_SEEDS = ("n0", "n7", "r3")


def q_ppr(sf_dir: str):
    """Personalized PageRank from a 3-node seed set over the
    customer->nation->region graph — teleport (restart + dangling
    mass) lands only on seeds; integer fixed-point, bit-exact vs the
    unrolled SQL twin."""
    from ..stages.graph_algos import ppr_int

    return ppr_int(
        _cnr_edges(sf_dir),
        PPR_SEEDS,
        iters=PAGERANK_ITERS,
        scale=PAGERANK_SCALE,
        d_num=PAGERANK_DNUM,
        d_den=PAGERANK_DDEN,
    )


def _ppr_oracle_sql(
    seeds: tuple[str, ...] = PPR_SEEDS,
    iters: int = PAGERANK_ITERS,
    scale: int = PAGERANK_SCALE,
    d_num: int = PAGERANK_DNUM,
    d_den: int = PAGERANK_DDEN,
) -> str:
    """Unrolled-iteration SQL twin of the integer personalized-PageRank
    recurrence (seed-restricted teleport; every CTE step MATERIALIZED —
    DuckDB inlines chained CTEs and the per-level double reference goes
    exponential otherwise, see the HITS oracle note)."""
    seed_list = ", ".join(f"'{s}'" for s in seeds)
    head = f"""
        WITH edges AS MATERIALIZED (
          SELECT 'c' || CAST(c_custkey AS VARCHAR) AS src,
                 'n' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
          UNION ALL
          SELECT 'n' || CAST(n_nationkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR) FROM nation
        ),
        nodes AS MATERIALIZED (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges UNION SELECT dst FROM edges
          )
        ),
        outdeg AS MATERIALIZED (
          SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
          FROM edges GROUP BY src
        ),
        seeds AS MATERIALIZED (
          SELECT node FROM nodes WHERE node IN ({seed_list})
        ),
        params AS MATERIALIZED (
          SELECT CAST(count(*) AS BIGINT) AS ns,
                 CAST(((({d_den} - {d_num}) * {scale}) // {d_den}) // count(*) AS BIGINT) AS base
          FROM seeds
        ),
        r0 AS MATERIALIZED (
          SELECT n.node,
                 CAST(CASE WHEN s.node IS NOT NULL
                      THEN {scale} // (SELECT ns FROM params) ELSE 0 END AS BIGINT)
                   AS rank_scaled
          FROM nodes n LEFT JOIN seeds s ON n.node = s.node
        )"""
    steps = []
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        steps.append(f""",
        dang{k} AS MATERIALIZED (
          SELECT CAST(COALESCE(CAST(sum(r.rank_scaled) AS BIGINT), 0)
                      // (SELECT ns FROM params) AS BIGINT) AS d_share
          FROM {prev} r LEFT JOIN outdeg o ON r.node = o.node
          WHERE o.node IS NULL
        ),
        s{k} AS MATERIALIZED (
          SELECT e.dst AS node,
                 CAST(sum(r.rank_scaled // o.outdeg) AS BIGINT) AS s_v
          FROM edges e
          JOIN {prev} r ON e.src = r.node
          JOIN outdeg o ON e.src = o.node
          GROUP BY e.dst
        ),
        r{k} AS MATERIALIZED (
          SELECT v.node,
                 CAST(CASE WHEN sd.node IS NOT NULL
                      THEN (SELECT base FROM params)
                           + ({d_num} * (COALESCE(s.s_v, 0)
                                         + (SELECT d_share FROM dang{k}))) // {d_den}
                      ELSE ({d_num} * COALESCE(s.s_v, 0)) // {d_den}
                      END AS BIGINT) AS rank_scaled
          FROM nodes v
          LEFT JOIN s{k} s ON v.node = s.node
          LEFT JOIN seeds sd ON v.node = sd.node
        )""")
    return head + "".join(steps) + f"""
        SELECT node, rank_scaled AS ppr_scaled FROM r{iters}
    """


def q_top_tokens(sf_dir: str):
    """Distributed explode + two-level count + deterministic top-k
    (vectorized str.findall/value_counts partials -- the earlier
    per-row Python dict loop was this query's whole hot stage)."""
    from ..stages.relational import topk_dataset
    from ..stages.vocab import term_counts

    return topk_dataset(
        term_counts(_docs(sf_dir)), ["n", "token"], 50, descending=[True, False]
    )


def q_doc_vocab(sf_dir: str):
    """Tokenizer-style vocabulary: contiguous 1-based ids in
    (count desc, token) order over tokens seen >= 5 times."""
    from ..stages.vocab import vocab_build

    return vocab_build(_docs(sf_dir), min_count=5)


def q_events_sessionize(sf_dir: str):
    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "ts"])
    return sessionize(ev, gap_minutes=30)


def q_top_event_per_user(sf_dir: str):
    """Top-1-per-group (windowed rank): each user's highest-value
    event. Bucketed vectorized reduce; ordering in integer cents with
    an id tie-break so the SQL row_number() oracle matches exactly."""
    from ..stages.infer import bucketed_reduce

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "event_id", "value"]
    )

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(value_cents=(b["value"] * 100).round().astype("int64"))
        # map-side combiner: best per user within the batch
        b = b.sort_values(["value_cents", "event_id"], ascending=[False, True], kind="stable")
        return b.drop_duplicates("user_id", keep="first")[
            ["user_id", "event_id", "value_cents"]
        ]

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("value_cents", pa.int64()),
        ]
    )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value_cents", "event_id"], ascending=[False, True], kind="stable")
        return g.drop_duplicates("user_id", keep="first")[
            ["user_id", "event_id", "value_cents"]
        ]

    return bucketed_reduce(
        ev.map_batches(_pre, batch_format="pandas"), ["user_id"], _reduce, out_schema
    )


def q_events_lag(sf_dir: str):
    from ..stages.sessions import lag_join

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])
    return lag_join(ev)


def q_events_asof_purchase(sf_dir: str):
    """Two-table AS-OF join: each event's most recent prior-or-equal
    'purchase' event of the same user (-1 when none)."""
    from ..stages.sessions import asof_join

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type"]
    )
    # vectorized arrow filter (a row-lambda filter runs Python per row)
    right = ev.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "purchase")),
        batch_format="pyarrow",
    )
    return asof_join(ev, right)


def q_orders_ship_window(sf_dir: str):
    """RANGE JOIN aggregate: lineitems shipped within 7 days (incl.)
    of each order's date, counted per order — interval binning, one
    bucket shuffle."""
    from ..stages.relational import interval_count_join

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "lo": pd.to_datetime(b["o_orderdate"]),
                "hi": pd.to_datetime(b["o_orderdate"]) + pd.Timedelta(days=7),
            }
        ),
        batch_format="pandas",
    )
    lineitem = read_parquet_clean(_t(sf_dir, "lineitem"), columns=["l_shipdate"])
    return interval_count_join(
        lineitem,
        orders,
        left_val="l_shipdate",
        right_id="o_orderkey",
        right_lo="lo",
        right_hi="hi",
        bin_width_us=7 * 24 * 3600 * 1_000_000,
    )


def q_events_running_total(sf_dir: str):
    """Per-user running total of the (integerized) event value —
    ``SUM(cents) OVER (PARTITION BY user ORDER BY ts, id)``."""
    from ..stages.sessions import running_sum

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"]
    ).map_batches(
        lambda b: pa.table(
            {
                "event_id": b["event_id"],
                "ts": b["ts"],
                "user_id": b["user_id"],
                "val": _cents(b["value"]),
            }
        ),
        batch_format="pyarrow",
    )
    return running_sum(ev).map_batches(
        lambda b: b.rename_columns(["event_id", "cum_cents"]),
        batch_format="pyarrow",
    )


def q_orders_semi_lineitem(sf_dir: str):
    """SEMI join with a Bloom runtime filter: orders having >=1
    high-quantity lineitem, counted per priority. The bloom bitmap of
    qualifying orderkeys broadcasts once and drops non-matching orders
    map-side BEFORE the join shuffle; the exact bucketed left_semi on
    the survivors removes false positives, so the result is exact."""
    from ..stages.bloom import semi_join_bloom
    from ..stages.infer import normalize_blocks, sanitize_for_join
    from ..stages.relational import grouped_sums

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b["o_orderkey"].combine_chunks().cast(pa.int64()),
                "o_orderpriority": b["o_orderpriority"],
            }
        ),
        batch_format="pyarrow",
    )
    likeys = sanitize_for_join(
        read_parquet_clean(
            _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"]
        ).map_batches(
            lambda b: pa.table(
                {"o_orderkey": b["l_orderkey"].combine_chunks().cast(pa.int64())}
            ).filter(pc.greater(b["l_quantity"], 45.0)),
            batch_format="pyarrow",
        ),
        pa.schema([("o_orderkey", pa.int64())]),
    )
    semi = semi_join_bloom(
        orders,
        likeys,
        on=["o_orderkey"],
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64())]),
    )
    out_schema = pa.schema([("o_orderpriority", pa.string()), ("n_orders", pa.int64())])
    return normalize_blocks(
        grouped_sums(
            semi.map_batches(
                lambda b: b.append_column("one", pa.array([1] * len(b), pa.int64())),
                batch_format="pyarrow",
            ),
            ["o_orderpriority"],
            {"n_orders": "one"},
        ),
        out_schema,
    )


def q_events_sample_per_type(sf_dir: str):
    """Deterministic per-group sample: 20 events per event_type by
    Lehmer-hash order — reproducible in SQL, so fully oracle-checked
    (unlike seeded-RNG sampling)."""
    from ..stages.relational import sample_per_group

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_type", "event_id"]
    )
    return sample_per_group(ev, "event_type", "event_id", 20)


def q_distinct_users(sf_dir: str):
    """Exact count-distinct: per-batch distinct pairs, pair-level
    global dedup via groupby, then a grouped count."""
    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "user_id"])

    def _pairs(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["event_type", "user_id"])

    distinct_pairs = (
        ev.map_batches(_pairs, batch_format="pandas")
        .groupby(["event_type", "user_id"])
        .count()
    )

    def _one(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "one": pa.array([1] * len(b), pa.int64()),
            }
        )

    return grouped_sums(
        distinct_pairs.map_batches(_one, batch_format="pyarrow"),
        ["event_type"],
        {"n_users": "one"},
    )


def q_three_way_join(sf_dir: str):
    """lineitem x orders x customer: cogroup join on orderkey for the
    two large sides, broadcast join for the customer dimension."""
    import ray as _ray

    li = read_parquet_clean(_t(sf_dir, "lineitem"), columns=["l_orderkey"])

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("l_orderkey", as_index=False).size().rename(columns={"size": "n"})

    li_part = li.map_batches(_partial, batch_format="pandas")
    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderpriority"]
    ).rename_columns({"o_orderkey": "l_orderkey"})
    from ..stages.infer import default_num_partitions

    # partials arrive as ~64 tiny blocks; the exchange cost scales with
    # block count, so coalesce both sides to ~1 block/2 CPUs first
    # (measured 8.7 -> 5.2 s on this join)
    joined = cogroup_join(
        li_part, orders, on=["l_orderkey"], how="inner",
        coalesce=default_num_partitions(),
    )

    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    seg_ref = _ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def _seg(b: pa.Table) -> pa.Table:
        seg = _ray.get(seg_ref) if isinstance(seg_ref, _ray.ObjectRef) else seg_ref
        vals = b["o_custkey"].to_pandas().map(seg)
        out = b.append_column(
            "c_mktsegment", pa.Array.from_pandas(vals, type=pa.string())
        )
        return out.filter(pc.is_valid(out["c_mktsegment"]))

    seged = joined.map_batches(_seg, batch_format="pyarrow")
    return grouped_sums(
        seged, ["c_mktsegment", "o_orderpriority"], {"n_items": "n"}
    )


def q_approx_distinct_users(sf_dir: str):
    """HLL approximate count-distinct per event_type (mergeable-sketch
    pattern; exact counterpart is the oracle-checked distinct_users)."""
    from ..stages.sketches import hll_distinct

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "user_id"])
    return hll_distinct(ev, "user_id", ["event_type"])


def q_supplier_region(sf_dir: str):
    """Snowflake dimension chain supplier -> nation -> region resolved
    with chained broadcast lookups (dimensions are tiny), then a
    grouped sum over the fact-ish side."""
    import ray as _ray

    nation = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    region = pd.read_parquet(_t(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    # compose the two-hop chain ONCE on the driver; ship one dict
    n2name = {k: r2name.get(v) for k, v in n2r.items()}
    ref = _ray.put(n2name)

    sup = read_parquet_clean(_t(sf_dir, "supplier"), columns=["s_nationkey", "s_acctbal"])

    def _lookup(b: pa.Table) -> pa.Table:
        d = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        names = b["s_nationkey"].to_pandas().map(d)
        out = pa.table(
            {
                "r_name": pa.Array.from_pandas(names, type=pa.string()),
                "acctbal_cents": _cents(b["s_acctbal"]),
            }
        )
        return out.filter(pc.is_valid(out["r_name"]))

    return grouped_sums(
        sup.map_batches(_lookup, batch_format="pyarrow"),
        ["r_name"],
        {"sum_acctbal_cents": "acctbal_cents"},
        count_name="n_suppliers",
    )


def q_part_type_stats(sf_dir: str):
    """Grouped stats over the part dimension: count + integer-cent
    retail price sums + min/max size per brand."""
    ds = read_parquet_clean(
        _t(sf_dir, "part"), columns=["p_brand", "p_size", "p_retailprice"]
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(price_cents=(b["p_retailprice"] * 100).round().astype("int64"))
        return b.groupby("p_brand", as_index=False).agg(
            n_parts=("p_size", "size"),
            sum_price_cents=("price_cents", "sum"),
            min_size=("p_size", "min"),
            max_size=("p_size", "max"),
        )

    partials = ds.map_batches(_partial, batch_format="pandas")

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("p_brand", as_index=False).agg(
            n_parts=("n_parts", "sum"),
            sum_price_cents=("sum_price_cents", "sum"),
            min_size=("min_size", "min"),
            max_size=("max_size", "max"),
        ).astype({"n_parts": "int64", "min_size": "int64", "max_size": "int64"})

    from ..stages.infer import bucketed_reduce

    out_schema = pa.schema(
        [
            ("p_brand", pa.string()),
            ("n_parts", pa.int64()),
            ("sum_price_cents", pa.int64()),
            ("min_size", pa.int64()),
            ("max_size", pa.int64()),
        ]
    )
    return bucketed_reduce(partials, ["p_brand"], _reduce, out_schema)


def q_orders_dates(sf_dir: str):
    """min/max timestamp aggregate per priority (exact-matchable)."""
    ds = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderpriority", "o_orderdate"]
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_orderpriority", as_index=False).agg(
            first_date=("o_orderdate", "min"),
            last_date=("o_orderdate", "max"),
            n_orders=("o_orderdate", "size"),
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_orderpriority", as_index=False).agg(
            first_date=("first_date", "min"),
            last_date=("last_date", "max"),
            n_orders=("n_orders", "sum"),
        ).astype({"n_orders": "int64"})

    from ..stages.infer import bucketed_reduce

    out_schema = pa.schema(
        [
            ("o_orderpriority", pa.string()),
            ("first_date", pa.timestamp("us")),
            ("last_date", pa.timestamp("us")),
            ("n_orders", pa.int64()),
        ]
    )
    return bucketed_reduce(
        ds.map_batches(_partial, batch_format="pandas"),
        ["o_orderpriority"],
        _reduce,
        out_schema,
    )


# ---------------------------------------------------------------------------
# Cleaning / training / graph-ops / multimodal (model- or Python-rule
# dependent -> rows-only checks; conformance is pinned by pytest)
# ---------------------------------------------------------------------------

def _dirty_corpus_from_docs(sf_dir: str) -> ray.data.Dataset:
    """Deterministic dirty triple corpus derived from the documents
    table (FIXTURES.md F4 pathologies planted by doc_id rules)."""
    from ..sources.triples_io import triples_from_records
    import pyarrow.parquet as pq

    docs = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"]).to_pylist()
    records = []
    for d in docs:
        toks = [w for w in (d["text"] or "").lower().split() if w.isalpha()][:8]
        if len(toks) < 4:
            continue
        i = d["doc_id"]
        records.append(
            {"subject": toks[0], "predicate": "is", "object": toks[1], "chunk": i}
        )
        if i % 3 == 0:  # case-variant duplicate
            records.append(
                {"subject": toks[0].title(), "predicate": "IS", "object": toks[1].upper(), "chunk": i}
            )
        if i % 5 == 0:  # list object
            records.append(
                {"subject": toks[2], "predicate": "contains", "object": toks[2:5], "chunk": i}
            )
        if i % 7 == 0:  # noise + short + null
            records.append({"subject": "it", "predicate": "does", "object": toks[3], "chunk": i})
            records.append({"subject": toks[3], "predicate": "has", "object": "x", "chunk": i})
            records.append({"subject": toks[3], "predicate": "uses", "object": None, "chunk": i})
        if i % 11 == 0:  # stray keys only
            records.append({"predicate2": "stray", "object2": "keys"})
    return triples_from_records(records)


def q_clean_triples(sf_dir: str):
    from ..stages.clean import clean_triples

    out, _stats = clean_triples(_dirty_corpus_from_docs(sf_dir), min_pred_count=2)
    return out.select_columns(["subject", "predicate", "object", "chunk"])


def q_relation_counts(sf_dir: str):
    from ..stages.graph_ops import relation_type_counts

    return relation_type_counts(q_kg_edges(sf_dir))


def q_training_qa(sf_dir: str):
    """Edge-template relationship QA — hash-exact vs
    :func:`_training_qa_oracle_sql` (md5-rank seeded sampling and
    char-level title-casing reproduced in SQL)."""
    from ..stages.training import generate_relationship_qa

    return generate_relationship_qa(q_kg_edges(sf_dir), seed=42)


def q_training_stratified_split(sf_dir: str):
    """Per-category stratified 80/10/10 split of the generated QA set
    (split proportions hold within EVERY category stratum; assignment
    is deterministic and partitioning-independent). Hash-exact: the
    per-(category, split) counts depend only on stratum sizes, so the
    twin is slice-bound arithmetic over the QA twin."""
    from ..stages.training import generate_relationship_qa, stratified_split

    qa = generate_relationship_qa(q_kg_edges(sf_dir), seed=42).materialize()
    labeled = stratified_split(
        qa, "category", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    from ..stages.relational import grouped_sums

    return grouped_sums(
        labeled.map_batches(
            lambda b: b.append_column("one", pa.array([1] * len(b), pa.int64())),
            batch_format="pyarrow",
        ),
        ["category", "split"],
        {"n": "one"},
    )


def q_training_concept_qa(sf_dir: str):
    """Concept QA synthesized from the KG's own edges (definition QAs
    appear when a source supplies definitions; the KG-built graph
    contributes fact-list + classification QAs). Hash-exact vs
    :func:`_training_concept_oracle_sql`."""
    from ..stages.training import generate_concept_qa

    edges = _kg_build(sf_dir)["edges"].map_batches(
        lambda b: pa.table(
            {"src": b["src"], "dst": b["dst"], "predicate": b["predicate"]}
        ),
        batch_format="pyarrow",
    )
    nodes = _kg_build(sf_dir)["nodes"].map_batches(
        lambda b: pa.table(
            {
                "entity": b["entity"],
                "type": pa.array(["concept"] * len(b), pa.string()),
                "attrs": pa.array(["{}"] * len(b), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    return generate_concept_qa(nodes, edges)


def q_training_chains(sf_dir: str):
    from ..stages.training import generate_reasoning_chain_qa

    edges = _kg_build(sf_dir)["edges"].map_batches(
        lambda b: pa.table(
            {"src": b["src"], "dst": b["dst"], "predicate": b["predicate"]}
        ),
        batch_format="pyarrow",
    )
    return generate_reasoning_chain_qa(edges)


def q_training_comparisons(sf_dir: str):
    from ..stages.training import generate_comparison_qa

    edges = _kg_build(sf_dir)["edges"]
    return generate_comparison_qa(edges)


def q_training_counterfactuals(sf_dir: str):
    """Edge-negation counterfactual QA over the materialized graph
    (negative sampling; md5-rank seeded draws). Hash-exact vs
    :func:`_training_counterfactual_oracle_sql`."""
    from ..stages.training import generate_counterfactual_qa

    return generate_counterfactual_qa(q_kg_edges(sf_dir), seed=42)


def q_training_anti_patterns(sf_dir: str):
    """Wrong-pairing anti-pattern QA over the materialized graph.
    Hash-exact vs :func:`_training_anti_pattern_oracle_sql`."""
    from ..stages.training import generate_anti_pattern_qa

    return generate_anti_pattern_qa(q_kg_edges(sf_dir), seed=42)


def q_training_model_selection(sf_dir: str):
    """Model-selection QA over the graph-derived rule blueprint
    (generalized reference Type 4). Hash-exact vs
    :func:`_training_model_selection_oracle_sql`."""
    from ..stages.scenario import rules_from_edges
    from ..stages.training import generate_model_selection_qa

    return generate_model_selection_qa(rules_from_edges(q_kg_edges(sf_dir)))


def q_concept_extract(sf_dir: str):
    from ..stages.graph_ops import extract_concepts

    # concept list = most frequent tokens of the corpus itself
    top = q_top_tokens(sf_dir).take_all()
    names = [r["token"] for r in top[:30]]
    return extract_concepts(_docs(sf_dir), names)


def q_recursive_split(sf_dir: str):
    from ..stages.graph_ops import recursive_split

    # hash-exact via a calibrated pass-through twin (every fixture doc
    # is under the 800-char budget); the packing paths stay pytest-pinned
    ds = recursive_split(_docs(sf_dir), chunk_size=800, overlap=150)
    return ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "split_id": pc.cast(b["split_id"], pa.int64()),
                "n_chars": pc.cast(
                    pc.utf8_length(b["split_text"]), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_doc_embed(sf_dir: str):
    """Feature-hashing embeddings through the actor-pool ingester,
    projected to the nonzero components in integer MILLI units:
    ``(doc_id, idx, val_milli)``. Hash-exact vs SQL — the signed
    token-count histogram is integer-exact (so its dot product and
    norm are too), every normalized component is one division +
    multiply + half-even round, and DuckDB's md5 reproduces the
    hashing trick's (dimension, sign) assignment byte-for-byte."""
    from ..stages.embed import embed_documents

    out = embed_documents(_docs(sf_dir), concurrency=(1, 4))

    def _proj(b: pa.Table) -> pa.Table:
        import numpy as np

        ids, idxs, vals = [], [], []
        for did, v in zip(b["doc_id"].to_pylist(), b["embedding"].to_pylist()):
            arr = np.asarray(v, dtype=np.float64)
            milli = np.round(arr * 1000.0).astype(np.int64)
            nz = np.nonzero(arr)[0]
            ids.extend([did] * len(nz))
            idxs.extend(nz.tolist())
            vals.extend(milli[nz].tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "idx": pa.array(idxs, pa.int64()),
                "val_milli": pa.array(vals, pa.int64()),
            }
        )

    return out.map_batches(_proj, batch_format="pyarrow")


def q_media_features(sf_dir: str):
    """Fake-decoder feature metadata over the synthesized payloads.
    Hash-exact vs :func:`_media_features_oracle_sql` — the md5 of the
    binary payload is recomputed by an RFC-1321 compression
    implemented in SQL (DuckDB's md5 only takes VARCHAR)."""
    from ..stages.multimodal import extract_media_features, synth_media_from_documents

    media = synth_media_from_documents(sf_dir)
    return extract_media_features(media, concurrency=(1, 4)).select_columns(
        ["media_id", "height", "width"]
    )


def q_media_png_decode(sf_dir: str):
    """REAL image decode (dependency-free PNG codec): synthesize actual
    PNG payloads from the documents corpus, decode + feature-extract in
    the actor pool, report per-image shape + decode status. Hash-exact:
    the SQL twin derives the expected dims from the synthesis formula,
    so a codec roundtrip regression breaks the hash."""
    from ..stages.multimodal import extract_media_features, synth_media_from_documents

    media = synth_media_from_documents(sf_dir, media_type="png")
    return extract_media_features(media, decoder="png", concurrency=(1, 4)).select_columns(
        ["media_id", "height", "width", "decode_ok"]
    )


def q_media_png_resize(sf_dir: str):
    """REAL image resize: decode the synthesized PNGs, nearest-neighbor
    resize to 32x32 in the actor pool, re-encode; emits the resized
    payloads + dims. Hash-exact vs the constant-dims twin (a decode or
    re-encode failure flips resize_ok)."""
    from ..stages.multimodal import resize_images, synth_media_from_documents

    media = synth_media_from_documents(sf_dir, media_type="png")
    return resize_images(media, target_size=(32, 32), concurrency=(1, 4)).select_columns(
        ["media_id", "height", "width", "resize_ok"]
    )


def q_media_wav_decode(sf_dir: str):
    """REAL audio decode (stdlib WAV/PCM codec): synthesize genuine WAV
    payloads, decode + feature-extract in the actor pool. Hash-exact vs
    the synthesis-formula twin (n_samples = 400 + byte*8, rate 8000)."""
    from ..stages.multimodal import extract_media_features, synth_media_from_documents

    media = synth_media_from_documents(sf_dir, media_type="wav")
    return extract_media_features(media, decoder="wav", concurrency=(1, 4)).select_columns(
        ["media_id", "height", "width", "decode_ok"]
    )


def q_media_wav_resample(sf_dir: str):
    """REAL audio resample: decode the synthesized WAVs, linear
    resample 8 kHz -> 4 kHz in the actor pool, re-encode. Hash-exact vs
    the synthesis-formula twin (output length n//2, rate 4000)."""
    from ..stages.multimodal import resample_audio, synth_media_from_documents

    media = synth_media_from_documents(sf_dir, media_type="wav")
    return resample_audio(media, target_rate=4000, concurrency=(1, 4)).select_columns(
        ["media_id", "height", "width", "resample_ok"]
    )


def q_scenario_eval(sf_dir: str):
    """§3.3 consumer contract (reference logic_engine.py:165-224):
    batch scenario evaluation against the materialized graph. Models =
    top hub nodes with their out-neighbor sets as requirements;
    scenarios = per-chunk detected-concept sets from the raw triples;
    red flags / confluence weights derived deterministically from the
    same blueprint. Hash-exact vs :func:`_scenario_eval_oracle_sql`
    (integer milli-point blend; portable md5 scenario ids); behavior
    also pinned by the fixture pytest."""
    from ..stages.scenario import (
        evaluate_scenarios,
        rules_from_edges,
        scenarios_from_chunks,
    )

    raw = q_kg_triples_raw(sf_dir).materialize()
    scenarios = scenarios_from_chunks(raw)
    rules = rules_from_edges(q_kg_edges(sf_dir), n_models=8).materialize()
    blueprint = rules.to_pandas().sort_values(["model", "requirement"])
    models = sorted(blueprint["model"].unique())
    # deterministic consumer config: top-3 models are weighted
    # confluence factors; the last model doubles as a red flag
    # (exercises the disqualifier anti-join on real data)
    weights = {m: 2.0 - i * 0.5 for i, m in enumerate(models[:3])}
    red_flags = models[-1:] if len(models) > 3 else []
    return evaluate_scenarios(
        scenarios, rules, red_flags=red_flags, weights=weights, min_score=5.0
    )


# ---------------------------------------------------------------------------
# Registry + oracle SQL
# ---------------------------------------------------------------------------


def q_events_props_sum(sf_dir: str):
    """Per-event-type aggregate of the integer JSON property ``k`` in
    the ``props`` blob column — vectorized regex fast path with a
    json.loads fallback, NULL-on-missing semantics matching DuckDB
    json_extract + BIGINT cast."""
    from ..stages.jsonfield import json_field_int

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "props"])

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "k_val": b["k"].fillna(0).astype("int64"),
                "has_k": b["k"].notna().astype("int64"),
            }
        )

    return grouped_sums(
        json_field_int(ev, "props", "k").map_batches(_pre, batch_format="pandas"),
        ["event_type"],
        {"sum_k": "k_val", "n_with_k": "has_k"},
        count_name="n_events",
    )

def q_doc_pack_shards(sf_dir: str):
    """Fixed-token-budget shard assignment (distributed prefix sum):
    shard_id = exclusive running token total in doc_id order // 2048."""
    from ..stages.packing import pack_shards
    from ..stages.text_analysis import token_counts

    return pack_shards(token_counts(_docs(sf_dir)), budget=2048)


def q_doc_token_quantiles(sf_dir: str):
    """Exact corpus-wide token-count quantiles off one histogram
    shuffle (discrete 'lower' definition: smallest value whose
    cumulative count reaches ceil(q*n))."""
    from ..stages.quantiles import exact_quantiles
    from ..stages.text_analysis import token_counts

    return exact_quantiles(
        token_counts(_docs(sf_dir)), "n_tokens", (0.25, 0.5, 0.75, 0.9, 0.99)
    )


def q_source_token_quantiles(sf_dir: str):
    """Per-source token-count quantiles — one group-keyed bucketed
    shuffle, vectorized grouped-histogram reduce."""
    from ..stages.quantiles import grouped_quantiles

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["source", "text"]
    )

    def _tok(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("")
        stripped = t.str.strip()
        n = stripped.str.split().str.len().fillna(0)
        n = n.where(stripped.str.len() > 0, 0)
        return pd.DataFrame({"source": b["source"], "n_tokens": n.astype("int64")})

    return grouped_quantiles(
        docs.map_batches(_tok, batch_format="pandas"),
        "source",
        "n_tokens",
        (0.5, 0.9, 0.99),
    )


def q_events_rolling_window(sf_dir: str):
    """Per-user rolling 3-row sum of the integerized event value —
    ``SUM(cents) OVER (PARTITION BY user ORDER BY ts, id ROWS BETWEEN
    2 PRECEDING AND CURRENT ROW)``."""
    from ..stages.sessions import rolling_sum

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"]
    ).map_batches(
        lambda b: pa.table(
            {
                "event_id": b["event_id"],
                "ts": b["ts"],
                "user_id": b["user_id"],
                "val": _cents(b["value"]),
            }
        ),
        batch_format="pyarrow",
    )
    return rolling_sum(ev, window=3).map_batches(
        lambda b: b.rename_columns(["event_id", "win_cents"]),
        batch_format="pyarrow",
    )


def q_orders_vs_ship_by_date(sf_dir: str):
    """FULL OUTER join of two date-keyed aggregates: orders placed vs
    lineitems shipped per day. Ship dates run past the last order date
    and order dates precede the first ship date, so BOTH sides
    contribute orphan rows -- nulls coalesced to 0 for exact hashing.

    Dates travel as int64 epoch-microseconds end to end: the native
    ``groupby().aggregate()`` on a timestamp key measured ~19s of
    fixed stage cost at sf0.01 (vs <1s for a bucketed int count), and
    int keys also take the canonical fast path of the join's bucket
    hash. One ``bucketed_reduce`` count per side, one bucketed
    full-outer join."""
    from ..stages.infer import bucketed_reduce
    from ..stages.relational import cogroup_join

    def _counts(table: str, col: str, out: str) -> ray.data.Dataset:
        def _combine(b: pd.DataFrame) -> pd.DataFrame:
            d = b[col].to_numpy("datetime64[us]").astype("int64")
            u, c = np.unique(d, return_counts=True)
            return pd.DataFrame({"d": u, out: c.astype("int64")})

        return bucketed_reduce(
            read_parquet_clean(_t(sf_dir, table), columns=[col]),
            ["d"],
            lambda g: g.groupby("d", sort=False, as_index=False)[out].sum(),
            pa.schema([("d", pa.int64()), (out, pa.int64())]),
            combiner=_combine,
        )

    joined = cogroup_join(
        _counts("orders", "o_orderdate", "n_orders"),
        _counts("lineitem", "l_shipdate", "n_shipped"),
        on=["d"],
        how="full_outer",
        left_schema=pa.schema([("d", pa.int64()), ("n_orders", pa.int64())]),
        right_schema=pa.schema([("d", pa.int64()), ("n_shipped", pa.int64())]),
    )

    def _fill(b: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "d": pa.array(
                    b["d"].to_numpy("int64").astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "n_orders": pa.array(
                    b["n_orders"].fillna(0).astype("int64"), pa.int64()
                ),
                "n_shipped": pa.array(
                    b["n_shipped"].fillna(0).astype("int64"), pa.int64()
                ),
            }
        )

    return joined.map_batches(_fill, batch_format="pandas")


def q_doc_shuffle_shards(sf_dir: str):
    """Deterministic pseudo-random shuffle-to-shards assignment
    (Lehmer rank, map-side only — the writer's partitioned sink is the
    only data movement)."""
    from ..stages.packing import shuffle_shards

    return shuffle_shards(
        read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id"]),
        n_shards=16,
    )


def q_graph_kcore(sf_dir: str):
    """2-core of the customer/supplier/nation/region fixture graph
    (its 3-core is provably empty: every customer/supplier has exactly
    two edges) — iterative peeling (degree reduce + gated membership
    filter per round). Hash-exact SQL twin: the peel is expressed as
    its COMPLEMENT — a monotonically growing recursive ``removed`` set
    (base: degree < k; step: remaining degree after removed neighbors
    < k; UNION gives fixpoint termination), which DuckDB accepts where
    the direct shrinking-survivor recursion would need aggregation
    over the recursive reference. Peeling order-independence (the
    fixpoint is THE k-core) is what makes the two formulations agree;
    adversarial shapes are pinned against networkx in pytest."""
    from ..stages.graph_algos import k_core

    return k_core(_cnrs_edges(sf_dir), 2)


def q_events_type_pivot(sf_dir: str):
    """Per-user wide count pivot over the declared event-type domain
    (count(*) FILTER per type) -- map-side crosstab partials, one
    combined grouped sum."""
    from ..stages.relational import pivot_counts

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "event_type"]
    )
    return pivot_counts(
        ev, "user_id", "event_type",
        ["view", "click", "purchase", "signup", "error"],
        key_type=pa.int64(),
    )


def q_nations_both_cust_supp(sf_dir: str):
    """SQL INTERSECT: nation keys present among BOTH customers and
    suppliers -- one bucketed shuffle with map-side distinct."""
    from ..stages.setops import intersect_distinct

    return intersect_distinct(
        read_parquet_clean(_t(sf_dir, "customer"), columns=["c_nationkey"])
        .map_batches(lambda b: pa.table({"nationkey": b["c_nationkey"]}),
                     batch_format="pyarrow"),
        read_parquet_clean(_t(sf_dir, "supplier"), columns=["s_nationkey"])
        .map_batches(lambda b: pa.table({"nationkey": b["s_nationkey"]}),
                     batch_format="pyarrow"),
        ["nationkey"],
        pa.schema([("nationkey", pa.int64())]),
    )


def q_custkeys_no_urgent(sf_dir: str):
    """SQL EXCEPT: customer keys with no 1-URGENT order (every customer
    in the fixture has SOME order, so the unfiltered variant is the
    empty set -- the priority filter keeps the result non-trivial)."""
    from ..stages.setops import except_distinct

    def _urgent(b: pa.Table) -> pa.Table:
        mask = pc.equal(b["o_orderpriority"], "1-URGENT")
        return pa.table({"c_custkey": b.filter(mask)["o_custkey"]})

    return except_distinct(
        read_parquet_clean(_t(sf_dir, "customer"), columns=["c_custkey"]),
        read_parquet_clean(
            _t(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]
        ).map_batches(_urgent, batch_format="pyarrow"),
        ["c_custkey"],
        pa.schema([("c_custkey", pa.int64())]),
    )


def q_events_latest(sf_dir: str):
    """Keyed upsert compaction: each user's LATEST event (greatest
    event_id) -- the distributed MERGE-INTO-style last-wins pass."""
    from ..stages.setops import upsert_latest

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )
    return upsert_latest(
        ev,
        ["user_id"],
        "event_id",
        pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()),
             ("event_type", pa.string())]
        ),
    )


def q_events_rank(sf_dir: str):
    """Per-type SQL rank() over coarse value buckets (ties share the
    first tied row's position -- the bucketing guarantees heavy ties so
    the tie path is actually exercised by the oracle)."""
    from ..stages.sessions import rank_in_group

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    ).map_batches(
        lambda b: pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "vbucket": pc.divide(_cents(b["value"]), 1000),
            }
        ),
        batch_format="pyarrow",
    )
    return rank_in_group(ev, group_col="event_type", order_cols=["vbucket"])


def q_graph_walks(sf_dir: str):
    """Deterministic DeepWalk corpus over the fixture graph: one
    4-step walk per node, neighbor choice by a Lehmer mixer so the
    full corpus is hash-exact against a recursive-CTE SQL oracle that
    re-walks the graph."""
    from ..stages.walks import random_walks

    return random_walks(_cnrs_edges(sf_dir), length=4)


def q_graph_skipgrams(sf_dir: str):
    """Skip-gram training table over the deterministic walk corpus
    (window 2): vectorized pair templates per walk, pair-keyed sum."""
    from ..stages.walks import random_walks, walk_skipgrams

    return walk_skipgrams(
        random_walks(_cnrs_edges(sf_dir), length=4), window=2
    )


def q_customers_per_region(sf_dir: str):
    """Classic star-schema rollup through TWO broadcast dimension
    joins (nation, region are fixed-size tables) -- zero join
    shuffles; the only exchange is the final tiny grouped count."""
    from ..stages.relational import broadcast_join, grouped_sums

    cust = read_parquet_clean(_t(sf_dir, "customer"), columns=["c_nationkey"])
    nat = read_parquet_clean(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    ).map_batches(
        lambda b: pa.table({"c_nationkey": b["n_nationkey"], "n_regionkey": b["n_regionkey"]}),
        batch_format="pyarrow",
    )
    reg = read_parquet_clean(
        _t(sf_dir, "region"), columns=["r_regionkey", "r_name"]
    ).map_batches(
        lambda b: pa.table({"n_regionkey": b["r_regionkey"], "r_name": b["r_name"]}),
        batch_format="pyarrow",
    )
    joined = broadcast_join(broadcast_join(cust, nat, ["c_nationkey"]), reg, ["n_regionkey"])
    return grouped_sums(joined.select_columns(["r_name"]), ["r_name"], {}, count_name="n_customers")


def q_source_top_terms(sf_dir: str):
    """Each source's top-10 tokens by (count desc, token) -- one
    group-keyed bucketed shuffle, vectorized per-group head."""
    from ..stages.vocab import top_terms_per_group

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["source", "text"])
    return top_terms_per_group(docs, "source", k=10).rename_columns(
        {"group": "source"}
    )


def q_graph_components(sf_dir: str):
    """Weakly-connected components of the customer->nation->region
    fixture graph (5 components, one per region subtree) via the
    DISTRIBUTED min-label propagation path — hash-exact vs a
    recursive-CTE reachability oracle (component = lexicographically
    smallest reachable entity on both sides). Count-gated: driver
    union-find under 2M edges, min-label propagation over (forced-path
    equivalence in test_graph_analytics)."""
    from ..stages.graph_algos import weak_components

    edges = _cnr_edges(sf_dir).map_batches(
        lambda b: pa.table(
            {
                "subject": b["src"].combine_chunks().cast(pa.string()),
                "object": b["dst"].combine_chunks().cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    return weak_components(edges)


REVENUE_CUT = pd.Timestamp("1998-01-01")


def _rev_e4(b: pd.DataFrame) -> np.ndarray:
    """Line revenue in integer 1e-4 dollars: cents(extendedprice) x
    (100 - cents(discount)). Integer products/sums commute across any
    partitioning, so the distributed total hash-matches DuckDB."""
    price = np.round(b["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
    disc = np.round(b["l_discount"].to_numpy() * 100.0).astype(np.int64)
    return price * (100 - disc)


def q_unshipped_revenue(sf_dir: str):
    """TPC-H Q3 shape: top-10 not-yet-shipped BUILDING orders by
    revenue. Plan: the filtered customer key set is tiny (one segment)
    -> broadcast semi-filter on orders (the Bloom path covers the
    over-the-gate case); lineitem revenue partials are pre-aggregated
    per orderkey BELOW the join; one cogroup exchange; trailing top-10
    via per-block top-k + driver merge (no global sort)."""
    import ray as _ray

    from ..stages.infer import default_num_partitions
    from ..stages.relational import topk_dataset

    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    keys = np.sort(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"].to_numpy())
    keys_ref = _ray.put(keys)
    cut = REVENUE_CUT

    orders = read_parquet_clean(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def _o_filter(b: pd.DataFrame) -> pd.DataFrame:
        ks = _ray.get(keys_ref) if isinstance(keys_ref, _ray.ObjectRef) else keys_ref
        b = b[b["o_orderdate"] < cut]
        idx = np.searchsorted(ks, b["o_custkey"].to_numpy())
        idx = np.clip(idx, 0, len(ks) - 1)
        b = b[ks[idx] == b["o_custkey"].to_numpy()]
        return pd.DataFrame(
            {
                "l_orderkey": b["o_orderkey"],
                "o_orderdate_us": b["o_orderdate"].to_numpy("datetime64[us]").astype("int64"),
                "o_orderpriority": b["o_orderpriority"],
            }
        )

    o_side = orders.map_batches(_o_filter, batch_format="pandas")

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def _l_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] > cut]
        if len(b) == 0:
            return pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                                 "rev": pd.Series([], dtype="int64")})
        part = pd.DataFrame({"l_orderkey": b["l_orderkey"].to_numpy(), "rev": _rev_e4(b)})
        return part.groupby("l_orderkey", as_index=False).agg(rev=("rev", "sum"))

    l_part = li.map_batches(_l_partial, batch_format="pandas")
    joined = cogroup_join(
        l_part, o_side, on=["l_orderkey"], how="inner",
        coalesce=default_num_partitions(),
        left_schema=pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64())]),
        right_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("o_orderdate_us", pa.int64()),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    summed = grouped_sums(
        joined,
        ["l_orderkey", "o_orderdate_us", "o_orderpriority"],
        {"revenue_e4": "rev"},
    )
    return topk_dataset(
        summed,
        ["revenue_e4", "o_orderdate_us", "l_orderkey"],
        10,
        descending=[True, False, False],
    )


def q_region_revenue(sf_dir: str):
    """TPC-H Q5 shape: per-region 1997 revenue where the supplying
    nation equals the customer nation. Plan: supplier/nation/region
    are broadcast dimensions (fixed or SF-proportional-small);
    lineitem revenue rows are pre-aggregated per (orderkey, supplier
    nation) BELOW the single large-large cogroup exchange with the
    date-filtered orders; the customer nation lookup is a broadcast
    dict (the documented scale path for a 10^9-row customer table is a
    second cogroup join on custkey — same shape as three_way_join)."""
    import ray as _ray

    from ..stages.infer import default_num_partitions

    supp = pd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    reg = pd.read_parquet(_t(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    supp_ref = _ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"].astype(np.int64))))
    cust_ref = _ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"].astype(np.int64))))
    nat2reg = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_regionkey"]))
    reg_names = dict(zip(reg["r_regionkey"], reg["r_name"]))
    nation_region = {int(k): reg_names[v] for k, v in nat2reg.items()}

    lo, hi = pd.Timestamp("1997-01-01"), REVENUE_CUT

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def _l_partial(b: pd.DataFrame) -> pd.DataFrame:
        sup = _ray.get(supp_ref) if isinstance(supp_ref, _ray.ObjectRef) else supp_ref
        part = pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(),
                "s_nationkey": b["l_suppkey"].map(sup).astype(np.int64),
                "rev": _rev_e4(b),
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        return part.groupby(["l_orderkey", "s_nationkey"], as_index=False).agg(
            rev=("rev", "sum"), n=("n", "sum")
        )

    l_part = li.map_batches(_l_partial, batch_format="pandas")

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def _o_filter(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        return pd.DataFrame({"l_orderkey": b["o_orderkey"], "o_custkey": b["o_custkey"]})

    o_side = orders.map_batches(_o_filter, batch_format="pandas")
    joined = cogroup_join(
        l_part, o_side, on=["l_orderkey"], how="inner",
        coalesce=default_num_partitions(),
    )

    def _match_nation(b: pd.DataFrame) -> pd.DataFrame:
        cus = _ray.get(cust_ref) if isinstance(cust_ref, _ray.ObjectRef) else cust_ref
        c_nat = b["o_custkey"].map(cus).astype(np.int64)
        b = b[c_nat.to_numpy() == b["s_nationkey"].to_numpy()]
        if len(b) == 0:
            return pd.DataFrame({"r_name": pd.Series([], dtype="object"),
                                 "rev": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {
                "r_name": b["s_nationkey"].map(nation_region),
                "rev": b["rev"].to_numpy(),
                "n": b["n"].to_numpy(),
            }
        )

    matched = joined.map_batches(_match_nation, batch_format="pandas")
    return grouped_sums(matched, ["r_name"], {"revenue_e4": "rev", "n_items": "n"})


def q_orders_l_diversity(sf_dir: str):
    """L-diversity audit per customer over order priorities — the
    governance check k-anonymity misses (a large group whose rows all
    share one sensitive value still exposes everyone); one bucketed
    reduce over map-side distinct (group, sensitive, count) partials;
    hash-exact vs a count(DISTINCT) SQL twin."""
    from ..stages.validate import l_diversity_report

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]
    )
    return l_diversity_report(
        orders, ["o_custkey"], "o_orderpriority", l=3
    )


def q_link_domain_modularity(sf_dir: str):
    """Newman modularity (exact rational q_num/q_den) of the
    partition-by-host over the web-link graph — how well domains
    explain the link structure. The partition rule is shared between
    the Ray side and the SQL twin (regexp host extraction), so the
    whole metric is hash-exact."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import modularity_report
    from ..stages.webtext import link_edges

    edges = link_edges(pages_from_documents(sf_dir)).materialize()

    def _hosts(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype="object"),
                 "community": pd.Series(dtype="object")}
            )
        nodes = pd.unique(
            np.concatenate([b["src"].to_numpy(), b["dst"].to_numpy()])
        )
        ser = pd.Series(nodes)
        host = ser.str.extract(r"https?://([^/]+)/", expand=False).fillna("")
        return pd.DataFrame({"node": nodes, "community": host.to_numpy()})

    # distinct node -> host labels (host is a pure function of the
    # node string, so cross-block duplicates agree; dedup them)
    from ..stages.infer import bucketed_reduce

    labels = bucketed_reduce(
        edges.map_batches(_hosts, batch_format="pandas"),
        ["node"],
        lambda b: b.drop_duplicates("node") if len(b) else b,
        pa.schema([("node", pa.string()), ("community", pa.string())]),
        combiner=lambda b: b.drop_duplicates("node") if len(b) else b,
    )
    return modularity_report(edges, labels)


def q_link_lpa_modularity(sf_dir: str):
    """Modularity of the LPA community partition over the web-link
    graph — the quality score for the detector's own output (compare
    against link_domain_modularity to see how much structure LPA
    recovers beyond the domain prior). Hash-exact vs
    :func:`_lpa_modularity_oracle_sql`: each synchronous LPA round is
    pure integer vote counting, so the five rounds unroll into CTE
    stages and the modularity tail reuses the exact-rational twin."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import label_propagation_communities, modularity_report
    from ..stages.webtext import link_edges

    edges = link_edges(pages_from_documents(sf_dir)).materialize()
    comms = label_propagation_communities(edges).map_batches(
        lambda b: pd.DataFrame(
            {"node": b["entity"], "community": b["component"].astype(str)}
        )
        if len(b)
        else pd.DataFrame(
            {"node": pd.Series(dtype="object"),
             "community": pd.Series(dtype="object")}
        ),
        batch_format="pandas",
    )
    return modularity_report(edges, comms)


def q_events_markov_eval(sf_dir: str):
    """Sequence-model evaluation loop as a query: train a global
    first-order Markov mode predictor on each user's first ~80% of
    transitions (integer split rule), report accuracy@1 on the rest.
    Hash-exact vs a row_number/mode SQL twin."""
    from ..stages.sessions import markov_eval

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy().astype(np.int64),
                "ts_us": b["ts"].to_numpy("datetime64[us]").astype("int64"),
                "event_id": b["event_id"].to_numpy().astype(np.int64),
                "event_type": b["event_type"].to_numpy(),
            }
        )
        if len(b)
        else pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "ts_us": pd.Series(dtype="int64"),
                "event_id": pd.Series(dtype="int64"),
                "event_type": pd.Series(dtype="object"),
            }
        ),
        batch_format="pandas",
    )
    return markov_eval(ev, "user_id", "ts_us", "event_id", "event_type")


def q_link_motif_census(sf_dir: str):
    """Directed triangle motif census of the web-link graph over
    one-way pairs: cyclic (feedback) vs transitive (hierarchy)
    triangles — the motif signature separating circulation graphs
    from DAG-like link structures. Degree-ordered orientation with
    direction bits riding the wedge/close plan; hash-exact vs a
    min-corner triple-join twin."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import directed_triangle_census
    from ..stages.webtext import link_edges

    return directed_triangle_census(link_edges(pages_from_documents(sf_dir)))


def q_lang_confusion(sf_dir: str):
    """Confusion matrix of the language-ID heuristic vs the stored
    labels — classifier evaluation as a query (prediction and truth
    share the row: map-side cells + one tiny grouped sum, no join).
    Hash-exact: the SQL twin recomputes the identical prediction."""
    from ..stages.text_analysis import lang_confusion

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "text", "lang"]
    )
    return lang_confusion(docs)


def q_lang_kappa(sf_dir: str):
    """Cohen's kappa of the language-ID heuristic as exact integers
    (numerator/denominator — no division, so negative-kappa dialect
    traps never arise). Hash-exact vs a marginals twin."""
    from ..stages.text_analysis import kappa_from_confusion, lang_confusion

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "text", "lang"]
    )
    return kappa_from_confusion(lang_confusion(docs))


def q_doc_originality(sf_dir: str):
    """Per-document text-reuse originality: permille of the doc's
    distinct 3-grams whose FIRST corpus occurrence (min doc id) is
    this document — 'who said it first', the complement of
    doc_novelty's 'is it unique'. Same gram rule as the overlap
    family; hash-exact vs a min-per-gram SQL twin."""
    from ..stages.dedup import originality_scores

    return originality_scores(_docs(sf_dir), k=3)


def q_link_reciprocity(sf_dir: str):
    """Directed reciprocity of the web-link graph (permille of
    distinct non-loop edges whose reverse exists) — one canonical-pair
    exchange, two-bit presence test per group. Hash-exact vs a
    self-join twin."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import reciprocity
    from ..stages.webtext import link_edges

    return reciprocity(link_edges(pages_from_documents(sf_dir)))


def q_link_bowtie(sf_dir: str):
    """Bow-tie decomposition of the raw-html web graph (Broder et
    al.): core / in / out / other per node, with the core found as the
    deterministic pivot's forward-and-backward reachability — two
    set-BFS sweeps, never all-pairs co-reachability. Hash-exact vs a
    twin built from two recursive-CTE closures over the same pivot
    rule (fourth recursive-CTE oracle in the registry)."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import bowtie_regions
    from ..stages.webtext import link_edges

    return bowtie_regions(link_edges(pages_from_documents(sf_dir)))


def q_link_densest_subgraph(sf_dir: str):
    """2(1+eps)-approximate densest subgraph of the raw-html link
    graph (batched greedy peel, best intermediate snapshot by exact
    integer cross-multiplied density) — the mutual-link-farm / spam-
    core extractor. Hash-exact vs :func:`_densest_subgraph_oracle_sql`
    (the O(log n) batched peel unrolls with permanent-termination
    no-op stages); planted-clique recovery and forced-gate equality
    pinned in tests/test_densest.py."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import densest_subgraph
    from ..stages.webtext import link_edges

    return densest_subgraph(link_edges(pages_from_documents(sf_dir)))


def q_events_twap(sf_dir: str):
    """Per-user TIME-WEIGHTED average of the event value over
    irregular samples (step-hold TWAP, exact integer milli-units,
    microsecond weights) — the aggregation plain averaging gets wrong
    when sampling is bursty. One key exchange; hash-exact vs a
    lead()-window SQL twin."""
    from ..stages.sessions import time_weighted_average

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy().astype(np.int64),
                "ts_us": b["ts"].to_numpy("datetime64[us]").astype("int64"),
                "event_id": b["event_id"].to_numpy().astype(np.int64),
                "value": b["value"].to_numpy(),
            }
        )
        if len(b)
        else pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "ts_us": pd.Series(dtype="int64"),
                "event_id": pd.Series(dtype="int64"),
                "value": pd.Series(dtype="float64"),
            }
        ),
        batch_format="pandas",
    )
    return time_weighted_average(ev, "user_id", "ts_us", "event_id", "value")


def q_orders_t_closeness(sf_dir: str):
    """T-closeness audit per customer over order priorities — the
    distributional governance check l-diversity misses (l distinct
    values can still skew 99/1 vs the corpus). Exact integer permille
    total-variation distance; hash-exact vs a cross-join SQL twin."""
    from ..stages.validate import t_closeness_report

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]
    )
    return t_closeness_report(
        orders, ["o_custkey"], "o_orderpriority", t_milli=300
    )


def q_doc_proximity(sf_dir: str):
    """Positional proximity retrieval: docs where 'hash' and 'join'
    occur within 10 tokens, with the exact min distance — map-only
    token scan + searchsorted nearest neighbor; hash-exact vs a
    positions-unnest SQL twin."""
    from ..stages.vocab import proximity_search

    return proximity_search(_docs(sf_dir), "hash", "join", window=10)


def q_nation_trade_flow(sf_dir: str):
    """TPC-H Q7 shape: revenue between every (supplier nation,
    customer nation) pair per ship year. Same physical plan as the Q5
    query — supplier/customer nation lookups broadcast (documented
    scale path: a second cogroup join on custkey), lineitem revenue
    pre-aggregated per (orderkey, supp nation, year) BELOW the single
    large-large exchange with orders; hash-exact vs a 5-way join twin."""
    import ray as _ray

    from ..stages.infer import default_num_partitions

    supp = pd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    supp_ref = _ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"].astype(np.int64))))
    cust_ref = _ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"].astype(np.int64))))
    nat_names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def _l_partial(b: pd.DataFrame) -> pd.DataFrame:
        sup = _ray.get(supp_ref)
        part = pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(),
                "s_nationkey": b["l_suppkey"].map(sup).astype(np.int64),
                "ship_year": b["l_shipdate"].dt.year.astype(np.int64),
                "rev": _rev_e4(b),
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        return part.groupby(
            ["l_orderkey", "s_nationkey", "ship_year"], as_index=False
        ).agg(rev=("rev", "sum"), n=("n", "sum"))

    l_part = li.map_batches(_l_partial, batch_format="pandas")

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda b: pa.table(
            {"l_orderkey": b["o_orderkey"], "o_custkey": b["o_custkey"]}
        ),
        batch_format="pyarrow",
    )
    joined = cogroup_join(
        l_part, orders, on=["l_orderkey"], how="inner",
        coalesce=default_num_partitions(),
    )

    def _names(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "supp_nation": pd.Series([], dtype="object"),
                    "cust_nation": pd.Series([], dtype="object"),
                    "ship_year": pd.Series([], dtype="int64"),
                    "rev": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        cus = _ray.get(cust_ref)
        return pd.DataFrame(
            {
                "supp_nation": b["s_nationkey"].map(nat_names),
                "cust_nation": b["o_custkey"].map(cus).astype(np.int64).map(nat_names),
                "ship_year": b["ship_year"].astype("int64"),
                "rev": b["rev"].astype("int64"),
                "n": b["n"].astype("int64"),
            }
        )

    named = joined.map_batches(_names, batch_format="pandas")
    return grouped_sums(
        named,
        ["supp_nation", "cust_nation", "ship_year"],
        {"revenue_e4": "rev", "n_items": "n"},
    )


def q_events_window_dedup(sf_dir: str):
    """TTL-window duplicate flags over the event stream (streaming
    dedup-with-expiry): an event is a dup iff the same (user, type)
    fired within the previous hour. One bucketed exchange on the key;
    hash-exact vs a lag-window SQL twin."""
    from ..stages.sessions import window_dedup

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy().astype(np.int64),
                "user_id": b["user_id"].to_numpy().astype(np.int64),
                "event_type": b["event_type"].to_numpy(),
                "ts_us": b["ts"].to_numpy("datetime64[us]").astype("int64"),
            }
        )
        if len(b)
        else pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "event_type": pd.Series(dtype="object"),
                "ts_us": pd.Series(dtype="int64"),
            }
        ),
        batch_format="pandas",
    )
    return window_dedup(
        ev, ["user_id", "event_type"], "ts_us", "event_id",
        ttl_us=3_600_000_000,
    )


def q_doc_hrw_stability(sf_dir: str):
    """Rendezvous-hashing layout stability: how many documents change
    shard when the shard count grows 7 -> 8. HRW moves only ~1/8 of
    keys (mod-hashing would move ~7/8) — the assignment you want for
    incrementally growing 100-TB layouts. Map-only, zero shuffles;
    hash-exact vs an argmax-via-row_number SQL twin."""
    from ..stages.packing import hrw_stability

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id"])
    return hrw_stability(docs, "doc_id", n_shards=7)


def q_link_feature_smooth(sf_dir: str):
    """SGC-style integer feature smoothing over the raw-html link
    graph: every page's n_chars feature is twice replaced by the
    self-inclusive floor-mean of its neighborhood — the feature-
    propagation preprocessing used before shallow classifiers.
    Hash-exact vs an unrolled LEFT-JOIN-mean SQL twin (floor division
    on non-negative ints agrees between pandas and DuckDB)."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import feature_smooth
    from ..stages.webtext import link_edges

    feats = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "n_chars"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "node": "https://example.org/doc/"
                + b["doc_id"].astype("int64").astype(str),
                "feat": b["n_chars"].astype("int64"),
            }
        )
        if len(b)
        else pd.DataFrame(
            {"node": pd.Series(dtype="object"), "feat": pd.Series(dtype="int64")}
        ),
        batch_format="pandas",
    )
    return feature_smooth(
        link_edges(pages_from_documents(sf_dir)), feats, iters=2
    )


def q_supply_neighbor_sample(sf_dir: str):
    """GraphSAGE-style deterministic mini-batch sampling over the
    supplier-part supply graph (ids disambiguated even/odd): seeds =
    suppliers 1-5, fanout [3, 2]. The sampled adjacency is computed
    ONCE (per-node lowest-Lehmer-rank neighbors) and shared across
    seeds; hash-exact vs a row_number-over-the-same-arithmetic twin."""
    from ..stages.walks import neighbor_sample

    edges = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_suppkey", "l_partkey"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "src": b["l_suppkey"].to_numpy().astype(np.int64) * 2,
                "dst": b["l_partkey"].to_numpy().astype(np.int64) * 2 + 1,
            }
        ).drop_duplicates()
        if len(b)
        else pd.DataFrame(
            {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")}
        ),
        batch_format="pandas",
    )
    return neighbor_sample(edges, [2, 4, 6, 8, 10], [3, 2])


def q_large_volume_orders(sf_dir: str):
    """TPC-H Q18 shape (group-having feeding a join chain): orders
    whose total lineitem quantity exceeds 200, with customer name and
    order facts. Plan: per-orderkey quantity sums via one bucketed
    reduce (map-side combiner), the HAVING filter runs inside the
    reduce so only qualifying orderkeys leave it; one cogroup join to
    orders; the customer name lookup is a second cogroup join on
    custkey (both sides already small: only qualifying orders)."""
    from ..stages.infer import bucketed_reduce, default_num_partitions

    qty_schema = pa.schema([("o_orderkey", pa.int64()), ("sum_qty", pa.int64())])
    thresh = 200

    def _q(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series(dtype="int64"),
                    "sum_qty": pd.Series(dtype="int64"),
                }
            )
        if "l_orderkey" in b.columns:
            b = pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"].to_numpy(),
                    "sum_qty": np.round(b["l_quantity"].to_numpy()).astype(np.int64),
                }
            )
        return b.groupby("o_orderkey", as_index=False, sort=False)["sum_qty"].sum()

    def _q_final(b: pd.DataFrame) -> pd.DataFrame:
        out = _q(b)
        return out[out["sum_qty"] > thresh]

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"]
    )
    big = bucketed_reduce(li, ["o_orderkey"], _q_final, qty_schema, combiner=_q)

    orders = read_parquet_clean(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].to_numpy(),
                "o_custkey": b["o_custkey"].to_numpy(),
                "o_orderdate_us": b["o_orderdate"]
                .to_numpy("datetime64[us]")
                .astype("int64"),
                "total_cents": np.round(b["o_totalprice"].to_numpy() * 100.0)
                .astype(np.int64),
            }
        )
        if len(b)
        else pd.DataFrame(
            {
                "o_orderkey": pd.Series(dtype="int64"),
                "o_custkey": pd.Series(dtype="int64"),
                "o_orderdate_us": pd.Series(dtype="int64"),
                "total_cents": pd.Series(dtype="int64"),
            }
        ),
        batch_format="pandas",
    )
    o_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderdate_us", pa.int64()),
            ("total_cents", pa.int64()),
        ]
    )
    joined = cogroup_join(
        big, orders, on=["o_orderkey"], how="inner",
        coalesce=default_num_partitions(),
        left_schema=qty_schema, right_schema=o_schema,
    )
    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name"]
    ).map_batches(
        lambda b: pa.table({"o_custkey": b["c_custkey"], "c_name": b["c_name"]}),
        batch_format="pyarrow",
    )
    out = cogroup_join(
        joined, cust, on=["o_custkey"], how="inner",
        left_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("sum_qty", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderdate_us", pa.int64()),
                ("total_cents", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("o_custkey", pa.int64()), ("c_name", pa.string())]),
    )
    out_schema = pa.schema(
        [
            ("c_name", pa.string()),
            ("o_orderkey", pa.int64()),
            ("o_orderdate_us", pa.int64()),
            ("total_cents", pa.int64()),
            ("sum_qty", pa.int64()),
        ]
    )
    from ..stages.infer import normalize_blocks

    return normalize_blocks(
        out.map_batches(
            lambda b: b[
                ["c_name", "o_orderkey", "o_orderdate_us", "total_cents", "sum_qty"]
            ]
            if len(b)
            else b,
            batch_format="pandas",
        ),
        out_schema,
    )


def q_branded_revenue(sf_dir: str):
    """TPC-H Q19 shape (disjunctive multi-attribute predicates over a
    join): revenue of lineitems whose part matches one of three
    (brand, size-range, quantity-range) branches. Plan: only the three
    brands' partkeys broadcast (pruned at the read by brand), the
    disjunction evaluates vectorized per batch, map-only partials,
    driver-summed single row — zero shuffles."""
    import ray as _ray

    branches = [
        ("Brand#13", 1, 10, 1, 11),
        ("Brand#19", 10, 20, 10, 20),
        ("Brand#23", 20, 30, 20, 30),
    ]
    part = pd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"])
    lut = {}
    for br, slo, shi, qlo, qhi in branches:
        sel = part[(part["p_brand"] == br)
                   & (part["p_size"] >= slo) & (part["p_size"] <= shi)]
        for pk in sel["p_partkey"]:
            lut[int(pk)] = (qlo, qhi)
    keys = np.sort(np.array(list(lut), dtype=np.int64))
    qlos = np.array([lut[int(k)][0] for k in keys], dtype=np.int64)
    qhis = np.array([lut[int(k)][1] for k in keys], dtype=np.int64)
    ref = _ray.put((keys, qlos, qhis))

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"revenue_e4": pd.Series(dtype="int64"), "n_rows": pd.Series(dtype="int64")}
        )
        if len(b) == 0:
            return empty
        ks, lo, hi = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        if len(ks) == 0:
            return empty
        pk = b["l_partkey"].to_numpy()
        idx = np.clip(np.searchsorted(ks, pk), 0, len(ks) - 1)
        hit = ks[idx] == pk
        qty = np.round(b["l_quantity"].to_numpy()).astype(np.int64)
        hit &= (qty >= lo[idx]) & (qty <= hi[idx])
        if not hit.any():
            return empty
        rev = _rev_e4(b[hit])
        return pd.DataFrame(
            {"revenue_e4": [int(rev.sum())], "n_rows": [int(hit.sum())]}
        )

    parts = li.map_batches(_partial, batch_format="pandas").to_pandas()
    rev = int(parts["revenue_e4"].sum()) if len(parts) else 0
    n = int(parts["n_rows"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "revenue_e4": pd.Series([rev], dtype="int64"),
            "n_rows": pd.Series([n], dtype="int64"),
        }
    )


def q_customer_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood blocking over customer names (window 5):
    the classic linkage blocker for near-duplicates that share a
    PREFIX — complements the FastSS deletion-neighborhood blocking in
    record_linkage. One sort exchange assigns global positions
    (nothing collected), width-w position buckets with one-bucket
    overlap generate each in-window pair exactly once via index
    arithmetic; hash-exact vs a row_number self-join twin."""
    from ..stages.fuzzy import sorted_neighborhood_pairs

    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name"]
    )
    return sorted_neighborhood_pairs(cust, "c_name", "c_custkey", window=5)


def q_media_audio_match(sf_dir: str):
    """Audio snippet identification (constellation fingerprints +
    offset voting): 20 four-frame-trimmed snippets are matched against
    the full per-document melody corpus; a correct system returns each
    snippet's own source at frame offset 4. Rows-only (FFT is not
    SQL-expressible); exactness of the offset-vote mechanics is pinned
    in tests/test_audio_fp.py."""
    from ..stages.audio_fp import audio_match, synth_melody_media, trim_clips

    corpus = synth_melody_media(sf_dir)
    queries = trim_clips(synth_melody_media(sf_dir, limit=20), skip_frames=4)
    return audio_match(corpus, queries)


def q_link_label_spread(sf_dir: str):
    """Semi-supervised label spreading over the raw-html web-link
    graph: the 13 external domains are seeds (label = their index);
    two synchronous majority rounds classify every page by which
    external ecosystem its neighbourhood links into. Deterministic
    majority (count desc, min label tie-break) makes it hash-exact
    vs an unrolled row_number-majority SQL twin."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import label_spread
    from ..stages.webtext import link_edges

    seeds = pd.DataFrame(
        {
            "node": [f"https://ext{k}.example.com/x" for k in range(13)],
            "label": list(range(13)),
        }
    )
    return label_spread(
        link_edges(pages_from_documents(sf_dir)), seeds, iters=2
    )


def q_doc_cdc_dedup(sf_dir: str):
    """Content-defined-chunking dedup summary (FastCDC-style gear
    rolling hash): chunk-level duplication across the corpus — the
    sub-document generalization of exact dedup that survives
    insertions (boundaries are functions of local content only).
    Hash-exact vs :func:`_cdc_oracle_sql`: the avg_bits=8 mask only
    reads the LOW byte of the rolling hash, which depends on just the
    trailing 8 bytes — 8 window lags mod 256 — and the boundary walk
    is the path of a precomputed next-cut function, so the whole
    chunker is one recursive CTE. Invariants (shift-invariance, size
    bounds, exact tiling, layout independence) stay in test_cdc.py."""
    from ..stages.cdc import cdc_dedup_stats

    return cdc_dedup_stats(_docs(sf_dir))


def _cdc_oracle_sql(min_size: int = 64, avg_bits: int = 8, max_size: int = 1024) -> str:
    """SQL twin of ``cdc.cdc_dedup_stats`` (see ``q_doc_cdc_dedup``).

    Structure: (1) the 256-entry gear table is derived in SQL with the
    same splitmix-style chain as ``cdc._gear_table`` (split-multiply
    mod 2**64, xor + shift-by-division); (2) since the cut mask tests
    ``h & (2**avg_bits - 1)`` and ``avg_bits <= 8``, only the low byte
    of the rolling hash matters, and ``h[p] = sum GEAR[b[p-k]] << k``
    mod 256 involves only ``k < 8`` — eight window lags; (3) for every
    position the next cut if a chunk started there is a window min
    over candidates (first candidate in ``[p+min, p+max]``, else a
    forced cut), so the data-dependent boundary walk is just the path
    of that functional graph from 0 — one shallow recursive CTE.
    Assumes single-byte text (chars == bytes — pinned by the corpus);
    ``ord(substr(...))`` is the byte value."""
    assert avg_bits <= 8, "low-byte shortcut requires avg_bits <= 8"
    mask = (1 << avg_bits) - 1
    g1 = "CAST(b + 11400714819323198485 AS HUGEINT)"
    g2 = _mulmod64(g1, "13787848793156543929")
    t = (f"CAST(xor(CAST({g2} AS UBIGINT), "
         f"CAST({g2} // 1073741824 AS UBIGINT)) AS HUGEINT)")
    g3 = _mulmod64(t, "10723151780598845931")
    g = (f"CAST(xor(CAST({g3} AS UBIGINT), "
         f"CAST({g3} // 2147483648 AS UBIGINT)) AS HUGEINT)")
    lags = " + ".join(
        f"lag(glow, {k}) OVER w * {1 << k}" if k else "glow * 1"
        for k in range(8)
    )
    return f"""
        WITH RECURSIVE gear AS (
          SELECT b, CAST({g} % 256 AS BIGINT) AS glow
          FROM (SELECT unnest(range(256)) AS b)
        ),
        docs AS (
          SELECT doc_id, coalesce(text,'') AS text,
                 strlen(coalesce(text,'')) AS n
          FROM documents
          WHERE strlen(coalesce(text,'')) > 0
        ),
        bytes AS (
          SELECT d.doc_id, d.n, CAST(u.p AS BIGINT) AS p,
                 ord(substr(d.text, CAST(u.p AS INTEGER) + 1, 1)) AS byte
          FROM docs d, LATERAL (SELECT unnest(range(d.n)) AS p) u
        ),
        hl AS (
          SELECT b.doc_id, b.n, b.p, ({lags}) % 256 AS h8
          FROM (SELECT bb.*, ge.glow
                FROM bytes bb JOIN gear ge ON ge.b = bb.byte) b
          WINDOW w AS (PARTITION BY b.doc_id ORDER BY b.p)
        ),
        na AS (
          SELECT doc_id, n, p AS q,
                 min(candv) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
          FROM (
            SELECT doc_id, n, p,
                   CASE WHEN p >= {min_size - 1} AND p + 1 < n
                             AND (h8 % 256) % {mask + 1} = 0
                        THEN p + 1 END AS candv
            FROM hl)
        ),
        nc AS (
          SELECT b.doc_id, b.n, b.p AS start,
                 CASE WHEN b.n - b.p <= {min_size} THEN b.n
                      WHEN a.nxt IS NOT NULL
                           AND a.nxt <= least(b.p + {max_size}, b.n)
                        THEN a.nxt
                      ELSE least(b.p + {max_size}, b.n) END AS cut
          FROM bytes b
          LEFT JOIN na a ON a.doc_id = b.doc_id AND a.q = b.p + {min_size}
        ),
        walk AS (
          SELECT doc_id, n, CAST(0 AS BIGINT) AS start, cut
          FROM nc WHERE start = 0
          UNION ALL
          SELECT w.doc_id, w.n, w.cut AS start, t.cut
          FROM walk w JOIN nc t ON t.doc_id = w.doc_id AND t.start = w.cut
          WHERE w.cut < w.n
        ),
        chunks AS (
          SELECT w.doc_id, w.start, w.cut - w.start AS length,
                 md5(substr(d.text, CAST(w.start AS INTEGER) + 1,
                            CAST(w.cut - w.start AS INTEGER))) AS h
          FROM walk w JOIN docs d USING (doc_id)
        ),
        per AS (
          SELECT h, length, CAST(count(*) AS BIGINT) AS cnt
          FROM chunks GROUP BY h, length
        )
        SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(cnt * length) AS BIGINT) AS bytes_total,
               CAST(sum(length) AS BIGINT) AS bytes_distinct,
               CAST(CASE WHEN sum(cnt * length) > 0
                    THEN (sum(length) * 1000) // (sum(cnt * length))
                    ELSE 1000 END AS BIGINT) AS dedup_ratio_milli
        FROM per
    """


def q_link_wl_classes(sf_dir: str):
    """Weisfeiler-Lehman structural-role classes over the raw-html
    web-link graph (2 refinement rounds): nodes sharing a label have
    isomorphic 2-hop neighbourhood trees — the classic structural
    fingerprint used for role discovery and graph-kernel features.
    Oracle-exact because each round's label is the lexicographic
    dense rank of the signature string (no engine-specific hashing);
    the SQL twin unrolls both rounds with MATERIALIZED CTEs."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import wl_refine
    from ..stages.webtext import link_edges

    return wl_refine(link_edges(pages_from_documents(sf_dir)), iters=2)


def q_order_priority_check(sf_dir: str):
    """TPC-H Q4 shape (EXISTS semi-join with a cross-table condition):
    count Q3-1996 orders per priority that have at least one lineitem
    shipped AFTER the order date. Plan: lineitem collapses to ONE
    max(shipdate) row per orderkey via ``bucketed_reduce`` (max is
    associative -> the same kernel is the map-side combiner), so the
    single cogroup exchange moves O(distinct orderkeys), not O(lines);
    the EXISTS becomes a vectorized compare after the join."""
    from ..stages.infer import bucketed_reduce, default_num_partitions

    lo = np.datetime64("1996-07-01", "us").astype("int64")
    hi = np.datetime64("1996-10-01", "us").astype("int64")

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"]
    )
    mx_schema = pa.schema([("l_orderkey", pa.int64()), ("max_ship_us", pa.int64())])

    def _mx(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "l_orderkey": pd.Series(dtype="int64"),
                    "max_ship_us": pd.Series(dtype="int64"),
                }
            )
        if "l_shipdate" in b.columns:
            b = pd.DataFrame(
                {
                    "l_orderkey": b["l_orderkey"].to_numpy(),
                    "max_ship_us": b["l_shipdate"]
                    .to_numpy("datetime64[us]")
                    .astype("int64"),
                }
            )
        return b.groupby("l_orderkey", as_index=False, sort=False)["max_ship_us"].max()

    l_max = bucketed_reduce(li, ["l_orderkey"], _mx, mx_schema, combiner=_mx)

    orders = read_parquet_clean(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def _o(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "l_orderkey": pd.Series(dtype="int64"),
                    "o_orderdate_us": pd.Series(dtype="int64"),
                    "o_orderpriority": pd.Series(dtype="object"),
                }
            )
        us = b["o_orderdate"].to_numpy("datetime64[us]").astype("int64")
        m = (us >= lo) & (us < hi)
        return pd.DataFrame(
            {
                "l_orderkey": b["o_orderkey"].to_numpy()[m],
                "o_orderdate_us": us[m],
                "o_orderpriority": b["o_orderpriority"].to_numpy()[m],
            }
        )

    o_side = orders.map_batches(_o, batch_format="pandas")
    joined = cogroup_join(
        l_max,
        o_side,
        on=["l_orderkey"],
        how="inner",
        coalesce=default_num_partitions(),
        left_schema=mx_schema,
        right_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("o_orderdate_us", pa.int64()),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )

    def _exists(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"o_orderpriority": pd.Series(dtype="object")})
        b = b[b["max_ship_us"] > b["o_orderdate_us"]]
        return pd.DataFrame({"o_orderpriority": b["o_orderpriority"]})

    return grouped_sums(
        joined.map_batches(_exists, batch_format="pandas"),
        ["o_orderpriority"],
        {},
        count_name="order_count",
    )


def q_line_priority_modes(sf_dir: str):
    """TPC-H Q12 shape (conditional counts over a large-large join):
    per return flag, how many 1997-shipped lineitems belong to
    high-priority (URGENT/HIGH) vs low-priority orders. Plan: lineitem
    pre-counts per (orderkey, returnflag) below the single cogroup
    exchange; the CASE split is a vectorized map after the join; the
    final groupby runs over a 3-value string key."""
    from ..stages.infer import default_num_partitions

    lo = np.datetime64("1997-01-01", "us").astype("int64")
    hi = np.datetime64("1998-01-01", "us").astype("int64")

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    )

    def _l(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "l_orderkey": pd.Series(dtype="int64"),
                    "l_returnflag": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        us = b["l_shipdate"].to_numpy("datetime64[us]").astype("int64")
        b = b[(us >= lo) & (us < hi)]
        part = pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(),
                "l_returnflag": b["l_returnflag"].to_numpy(),
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        return part.groupby(
            ["l_orderkey", "l_returnflag"], as_index=False, sort=False
        )["n"].sum()

    l_part = li.map_batches(_l, batch_format="pandas")
    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda b: pa.table(
            {"l_orderkey": b["o_orderkey"], "o_orderpriority": b["o_orderpriority"]}
        ),
        batch_format="pyarrow",
    )
    joined = cogroup_join(
        l_part,
        orders,
        on=["l_orderkey"],
        how="inner",
        coalesce=default_num_partitions(),
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_returnflag", pa.string()),
                ("n", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
        ),
    )

    def _split(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "l_returnflag": pd.Series(dtype="object"),
                    "hi_n": pd.Series(dtype="int64"),
                    "lo_n": pd.Series(dtype="int64"),
                }
            )
        high = b["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
        n = b["n"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"].to_numpy(),
                "hi_n": np.where(high, n, 0),
                "lo_n": np.where(high, 0, n),
            }
        )

    return grouped_sums(
        joined.map_batches(_split, batch_format="pandas"),
        ["l_returnflag"],
        {"high_line_count": "hi_n", "low_line_count": "lo_n"},
    )


def q_customer_order_distribution(sf_dir: str):
    """TPC-H Q13 shape (left-join count distribution with an explicit
    zero group): how many customers placed exactly k qualifying
    (priority-specified) orders, including k=0. Plan: per-custkey
    counts via one bucketed sum (map-side combiner), then a SECOND
    tiny bucketed sum over the count values (domain = max orders per
    customer, inherently small); the zero row is arithmetic —
    count(customer) minus matched custkeys — so the customer table is
    never joined, only counted."""
    from ..stages.infer import bucketed_reduce

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]
    )

    def _cnt(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "o_custkey": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        if "o_orderpriority" in b.columns:
            b = b[b["o_orderpriority"] != "4-NOT SPECIFIED"]
            b = pd.DataFrame(
                {
                    "o_custkey": b["o_custkey"].to_numpy(),
                    "n": np.ones(len(b), dtype=np.int64),
                }
            )
        return b.groupby("o_custkey", as_index=False, sort=False)["n"].sum()

    cnt_schema = pa.schema([("o_custkey", pa.int64()), ("n", pa.int64())])
    per_cust = bucketed_reduce(orders, ["o_custkey"], _cnt, cnt_schema, combiner=_cnt)

    def _dist(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "c_count": pd.Series(dtype="int64"),
                    "custdist": pd.Series(dtype="int64"),
                }
            )
        if "n" in b.columns:
            b = pd.DataFrame(
                {
                    "c_count": b["n"].to_numpy().astype(np.int64),
                    "custdist": np.ones(len(b), dtype=np.int64),
                }
            )
        return b.groupby("c_count", as_index=False, sort=False)["custdist"].sum()

    dist_schema = pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())])
    dist = bucketed_reduce(
        per_cust, ["c_count"], _dist, dist_schema, combiner=_dist
    ).to_pandas()
    if len(dist) == 0:
        dist = pd.DataFrame({"c_count": pd.Series(dtype="int64"),
                             "custdist": pd.Series(dtype="int64")})
    n_customers = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey"]
    ).count()
    n_zero = int(n_customers) - int(dist["custdist"].sum())
    if n_zero > 0:
        dist = pd.concat(
            [dist, pd.DataFrame({"c_count": [0], "custdist": [n_zero]})],
            ignore_index=True,
        )
    return dist.astype({"c_count": "int64", "custdist": "int64"})


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape (global conditional-aggregate ratio): share of
    September-1997 revenue from PROMO parts, in integer basis points.
    Plan: the promo partkey set broadcasts once (``ray.put`` + sorted
    searchsorted membership — the documented 100-TB path is a cogroup
    join on partkey, same shape as three_way_join); lineitem reduces
    map-only to one partial row per block; the driver sums the tiny
    residue. Zero shuffles."""
    import ray as _ray

    lo = np.datetime64("1997-09-01", "us").astype("int64")
    hi = np.datetime64("1997-10-01", "us").astype("int64")

    part = pd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_type"])
    promo = np.sort(part.loc[part["p_type"] == "PROMO", "p_partkey"].to_numpy())
    promo_ref = _ray.put(promo)

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "promo_rev": pd.Series(dtype="int64"),
                    "total_rev": pd.Series(dtype="int64"),
                }
            )
        us = b["l_shipdate"].to_numpy("datetime64[us]").astype("int64")
        b = b[(us >= lo) & (us < hi)]
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "promo_rev": pd.Series(dtype="int64"),
                    "total_rev": pd.Series(dtype="int64"),
                }
            )
        ks = _ray.get(promo_ref) if isinstance(promo_ref, _ray.ObjectRef) else promo_ref
        rev = _rev_e4(b)
        pk = b["l_partkey"].to_numpy()
        if len(ks):
            idx = np.clip(np.searchsorted(ks, pk), 0, len(ks) - 1)
            is_promo = ks[idx] == pk
        else:
            is_promo = np.zeros(len(b), dtype=bool)
        return pd.DataFrame(
            {
                "promo_rev": [int(rev[is_promo].sum())],
                "total_rev": [int(rev.sum())],
            }
        )

    partials = li.map_batches(_partial, batch_format="pandas").to_pandas()
    promo_rev = int(partials["promo_rev"].sum()) if len(partials) else 0
    total_rev = int(partials["total_rev"].sum()) if len(partials) else 0
    bps = (promo_rev * 10000) // total_rev if total_rev else 0
    return pd.DataFrame(
        {
            "promo_revenue_e4": pd.Series([promo_rev], dtype="int64"),
            "total_revenue_e4": pd.Series([total_rev], dtype="int64"),
            "promo_bps": pd.Series([bps], dtype="int64"),
        }
    )


def q_wealthy_inactive_customers(sf_dir: str):
    """TPC-H Q22 shape (scalar-broadcast threshold + anti-join):
    customers whose balance beats the positive-balance average and who
    never placed an URGENT order, counted per nation (the urgency
    restriction keeps the result non-degenerate on the dense synthetic
    tables where every customer has SOME order). Plan: the global
    average is two integers (n, sum) reduced from one partial row per
    block — the comparison ``cents * n_pos > sum_pos`` stays exact in
    int64 (no float avg); the anti-join is the standard cogroup
    left_anti against map-side-deduped order custkeys."""
    from ..stages.infer import normalize_blocks, sanitize_for_join

    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def _pos_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"n_pos": pd.Series(dtype="int64"), "sum_pos": pd.Series(dtype="int64")}
            )
        cents = np.round(b["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        pos = cents[cents > 0]
        return pd.DataFrame(
            {"n_pos": [int(len(pos))], "sum_pos": [int(pos.sum())]}
        )

    pos = cust.map_batches(_pos_partial, batch_format="pandas").to_pandas()
    n_pos = int(pos["n_pos"].sum()) if len(pos) else 0
    sum_pos = int(pos["sum_pos"].sum()) if len(pos) else 0

    def _rich(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "c_custkey": pd.Series(dtype="int64"),
                    "c_nationkey": pd.Series(dtype="int64"),
                    "cents": pd.Series(dtype="int64"),
                }
            )
        cents = np.round(b["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        m = cents * n_pos > sum_pos
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].to_numpy()[m],
                "c_nationkey": b["c_nationkey"].to_numpy()[m].astype(np.int64),
                "cents": cents[m],
            }
        )

    rich = cust.map_batches(_rich, batch_format="pandas")

    def _okeys(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"c_custkey": pd.Series(dtype="int64")})
        b = b[b["o_orderpriority"] == "1-URGENT"]
        return pd.DataFrame({"c_custkey": np.unique(b["o_custkey"].to_numpy())})

    okeys = sanitize_for_join(
        read_parquet_clean(
            _t(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]
        ).map_batches(_okeys, batch_format="pandas"),
        pa.schema([("c_custkey", pa.int64())]),
    )
    anti = cogroup_join(
        rich,
        okeys,
        on=["c_custkey"],
        how="left_anti",
        left_schema=pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_nationkey", pa.int64()),
                ("cents", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("c_custkey", pa.int64())]),
    )
    out_schema = pa.schema(
        [
            ("c_nationkey", pa.int64()),
            ("numcust", pa.int64()),
            ("totacctbal_cents", pa.int64()),
        ]
    )
    return normalize_blocks(
        grouped_sums(
            anti,
            ["c_nationkey"],
            {"totacctbal_cents": "cents"},
            count_name="numcust",
        ).select_columns(["c_nationkey", "numcust", "totacctbal_cents"]),
        out_schema,
    )


def q_kg_training_pipeline(sf_dir: str):
    """Second flagship composite: pages -> knowledge graph -> QA
    generation -> stratified 80/10/10 split -> chatml-formatted
    records. Demonstrates the full reference lifecycle (build ->
    train-data export) as ONE streaming composition. Hash-exact vs
    :func:`_kg_training_pipeline_oracle_sql` — per-row split labels
    follow the stage's portable md5 in-stratum order."""
    from ..stages.training import (
        format_examples,
        generate_relationship_qa,
        stratified_split,
    )

    edges = q_kg_edges(sf_dir)
    qa = generate_relationship_qa(edges, seed=42).materialize()
    labeled = stratified_split(qa, "category", {"train": 0.8, "val": 0.1, "test": 0.1})
    return format_examples(labeled, fmt="chatml", passthrough_cols=("split",))


def q_kg_record_analysis(sf_dir: str):
    """Record-annotation training examples: corpus documents joined
    against the built graph's 1-hop node contexts (reference Type 5
    generalized — ``training_generator.py:603-664``). Hash-exact vs
    :func:`_kg_record_analysis_oracle_sql`; generator semantics also
    pinned in ``test_record_validation_generators.py``."""
    from ..stages.training import generate_record_analysis

    edges = q_kg_edges(sf_dir).materialize()
    docs = _docs(sf_dir)
    return generate_record_analysis(
        docs.map_batches(
            lambda b: pd.DataFrame(
                {"doc_id": b["doc_id"], "text": b["text"].fillna("")}
            ),
            batch_format="pandas",
        ),
        edges.map_batches(
            lambda b: pd.DataFrame(
                {"src": b["src"], "dst": b["dst"], "predicate": b["predicate"]}
            ),
            batch_format="pandas",
        ),
    )


_VALIDATION_SPEC = {
    "must_have_all": ["schema_reviewed", "load_test_passed"],
    "must_have_one": ["canary_green", "staging_green"],
    "should_have": ["rollback_plan"],
    "red_flags": ["open_incident", "frozen_window"],
    "thresholds": {"minimum": 5.0, "good": 7.0, "excellent": 9.0},
}


def q_training_validation_qa(sf_dir: str):
    """Checklist-validation training examples from a fixed acceptance
    spec (reference Type 7 generalized —
    ``training_generator.py:722-795``). Pure config -> deterministic
    strings, so the oracle pins the exact rendering with literal
    rows."""
    from ..stages.training import generate_validation_qa

    return generate_validation_qa(_VALIDATION_SPEC)


def _validation_oracle_sql() -> str:
    """Literal-row twin of q_training_validation_qa: the expected
    strings are re-rendered HERE from the same spec with independent
    inline templates (a training.py template regression breaks the
    hash match), then emitted as SQL literals."""
    sp = _VALIDATION_SPEC

    def lab(c):
        return c.replace("_", " ")

    rows = []
    conds = [lab(c) for c in sp["must_have_all"]]
    rows.append((
        "Should this candidate pass the checklist? Confirmed: "
        + ", ".join(conds) + ".",
        "",
        "Yes, the candidate meets the minimum requirements.\n\n"
        f"Must-have conditions confirmed: {', '.join(conds)}\n\n"
        "However, also verify:\n"
        f"- At least one of: {', '.join(lab(c) for c in sp['must_have_one'])}\n"
        f"- Ideally also: {', '.join(lab(c) for c in sp['should_have'])}\n\n"
        f"Disqualifiers to check: "
        f"{', '.join(lab(c) for c in sp['red_flags'][:3])}",
        "checklist_validation",
    ))
    for flag in sp["red_flags"][:5]:
        fl = lab(flag)
        rows.append((
            f"Should this candidate pass? It looks good but I notice {fl}.",
            "",
            f"No. {fl.title()} is a disqualifier.\n\n"
            "Disqualifiers are absolute — no matter how strong the rest of "
            "the candidate looks, the purpose of the checklist is to stop "
            "acceptance exactly when it is most tempting.\n\n"
            "Resolve the disqualifier, or move on to the next candidate.",
            "checklist_red_flag",
        ))
    th = sp["thresholds"]
    rows.append((
        "How is a candidate's composite score interpreted?",
        "",
        "Scoring uses weighted factors summed into a composite.\n\n"
        "Thresholds:\n"
        f"  Minimum to accept: {th['minimum']}\n"
        f"  Good candidate: {th['good']}\n"
        f"  Excellent candidate: {th['excellent']}\n\n"
        f"Never accept below {th['minimum']}. Be selective.",
        "checklist_scoring",
    ))

    def q(s: str) -> str:
        return "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"

    selects = [
        f"SELECT {q(i)} AS instruction, {q(p)} AS input, {q(o)} AS output, "
        f"{q(c)} AS category"
        for i, p, o, c in rows
    ]
    return " UNION ALL ".join(selects)


def q_corpus_curation(sf_dir: str):
    """Flagship training-data curation chain (NFC -> exact dedup ->
    Gopher gate -> mixture sample -> shard packing) returning the
    curated manifest. Hash-exact END TO END vs
    :func:`_corpus_curation_oracle_sql` (each step also individually
    twin-pinned); funnel monotonicity pinned in test_curation."""
    from .curation import curate_corpus

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "source", "text"]
    )
    return curate_corpus(
        docs, rates_milli=MIXTURE_RATES_MILLI,
        default_milli=MIXTURE_DEFAULT_MILLI, shard_budget=20_000,
    )


def q_doc_dup_span_redact(sf_dir: str):
    """All-but-one duplicate-span REMOVAL (the acting counterpart of
    the doc_dup_spans stats): repeated word-5-grams are dropped except
    at their canonical (min doc, first position) occurrence.
    Hash-exact vs a SQL twin that rebuilds the surviving-token text
    with a NULL-skipping ordered string_agg; both gate paths
    equivalence-tested."""
    from ..stages.webtext import dup_span_redact

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return dup_span_redact(docs, k=5)


BPE_MERGES = 100


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer training over the corpus: one token-count shuffle
    (Heap's-law-gated), merge loop on the word-frequency residue (how
    practical BPE trainers work). Deterministic merge list; hash-exact
    vs :func:`_bpe_merges_oracle_sql` — the data-dependent loop
    unrolls because termination is permanent and leftmost
    non-overlapping application is run-parity; also pinned on the
    Sennrich hand corpus in test_bpe."""
    from ..stages.vocab import bpe_train

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["text"])
    return bpe_train(docs, n_merges=BPE_MERGES)


def q_doc_bpe_token_counts(sf_dir: str):
    """Per-document token counts under the corpus-trained BPE
    tokenizer (broadcast merge table, map-only encode with a
    distinct-word memo per batch)."""
    from ..stages.vocab import bpe_token_counts, bpe_train

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    merges_df = bpe_train(docs, n_merges=BPE_MERGES).to_pandas()
    merges = list(zip(merges_df["left"], merges_df["right"]))
    return bpe_token_counts(docs, merges)


def q_doc_tfidf_keywords(sf_dir: str):
    """Top-5 TF-IDF keywords per document — df table fit in one
    bucketed shuffle (Heap's-law-gated vocab broadcast), scoring +
    per-doc top-k map-side. Hash-exact vs a SQL twin that mirrors the
    tf*ln(N/df)*1000 chain in IEEE op order with roundbankers."""
    from ..stages.vocab import tfidf_keywords

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return tfidf_keywords(docs, k=5)


FUNNEL_STAGES = ("view", "click", "purchase")


def q_events_funnel(sf_dir: str):
    """Ordered view->click->purchase conversion funnel (strict
    timestamp order, earliest-qualifying chain) — one user-keyed
    bucketed shuffle, vectorized chain closure, hash-exact vs a
    chained min-after-join SQL twin."""
    from ..stages.sessions import funnel_counts

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_type"]
    )
    return funnel_counts(ev, FUNNEL_STAGES)


def q_events_pattern_match(sf_dir: str):
    """MATCH_RECOGNIZE-shaped sequence mining: per user, count
    non-overlapping ``view (click)+ purchase`` motifs in the
    chronological event-type string — one user-keyed bucket shuffle,
    vectorized encoding, hash-exact vs a ``string_agg`` +
    ``regexp_extract_all`` twin (same leftmost non-overlapping RE2
    semantics as Python ``findall`` for this pattern class)."""
    from ..stages.sessions import sequence_pattern_counts

    ev = read_parquet_clean(
        _t(sf_dir, "events"),
        columns=["user_id", "ts", "event_type", "event_id"],
    )
    return sequence_pattern_counts(
        ev,
        "vc+p",
        {
            "view": "v",
            "click": "c",
            "purchase": "p",
            "signup": "s",
            "error": "e",
        },
    )


def q_events_out_of_order(sf_dir: str):
    """Per-user event-time disorder profile (late events vs the
    arrival-order watermark + max lateness) — the measurement that
    sizes a streaming consumer's allowed-lateness buffer; one bucket
    shuffle, vectorized cummax/shift; hash-exact vs a ROWS-window
    max(ts) twin."""
    from ..stages.sessions import out_of_order_profile

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id"]
    )
    return out_of_order_profile(ev)


def q_orders_checksum(sf_dir: str):
    """Sliced order-insensitive content fingerprint of orders — the
    migration/replication validation primitive (mismatched slices
    localize a diff to 1/64 of the table without a row-level join);
    md5_number_lower row hashes, Mersenne-61 modular slice sums,
    map-side combiner leaves a 64-row residue; hash-exact vs DuckDB's
    own md5_number_lower."""
    from ..stages.validate import content_checksum

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    o = read_parquet_clean(_t(sf_dir, "orders"), columns=cols)
    return content_checksum(o, cols)


def q_events_dp_counts(sf_dir: str):
    """Per-event-type counts released under a truncated two-sided
    geometric mechanism (epsilon = ln 2), noise derandomized via
    md5(group || seed) against an exact integer inverse-CDF so the
    release is auditable and hash-exact vs a SQL twin that joins the
    same noise table."""
    from ..stages.validate import dp_noisy_counts

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type"])
    return dp_noisy_counts(ev, "event_type")


def _dp_oracle_sql() -> str:
    from ..stages.validate import geometric_noise_table

    rows, total = geometric_noise_table(12)
    vals = ", ".join(f"({lo}, {hi}, {k})" for lo, hi, k in rows)
    return f"""
        WITH grp AS (
          SELECT event_type AS "group", CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1
        ),
        lut(lo, hi, noise) AS (VALUES {vals})
        SELECT g."group",
               CAST(greatest(g.n + l.noise, 0) AS BIGINT) AS noisy_count
        FROM grp g JOIN lut l
          ON CAST(md5_number_lower(g."group" || '|dp') % {total} AS BIGINT) >= l.lo
         AND CAST(md5_number_lower(g."group" || '|dp') % {total} AS BIGINT) < l.hi
    """


def q_doc_length_batches(sf_dir: str):
    """Length-grouped batching with padding-waste accounting (batches
    of 64 docs cut along the (n_chars, doc_id) order) — distributed
    rank via the composite-axis prefix sum, no global sort; hash-exact
    vs a row_number window twin."""
    from ..stages.packing import length_grouped_batches

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "n_chars"]
    )
    return length_grouped_batches(docs, batch_rows=64)


def q_doc_cap_per_source(sf_dir: str):
    """Per-source document cap (keep the 10 smallest doc_ids per
    source) — the per-host curation rule that stops one domain from
    dominating a training mix; map-side head-k combiner, one bucketed
    reduce, hash-exact vs a row_number SQL twin."""
    from ..stages.relational import cap_per_group

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["source", "doc_id"])
    return cap_per_group(docs, "source", "doc_id", 10)


def q_events_window_distinct(sf_dir: str):
    """Exact distinct users per (event_type, hour) window — map-side
    (type, hour, user) distinct partials collapse duplicates before
    ONE bucketed distinct+count shuffle (the windowed companion of the
    oracle-green global distinct_users)."""
    from ..stages.infer import bucketed_reduce

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_type", "ts", "user_id"]
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "ts" not in b.columns:
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype="object"),
                 "window_start_us": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64")}
            )
        us = b["ts"].to_numpy("datetime64[us]").astype("int64")
        hour = (us // 3_600_000_000) * 3_600_000_000
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "window_start_us": hour,
                "user_id": b["user_id"].to_numpy(np.int64),
            }
        ).drop_duplicates()

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        agg = g.groupby(["event_type", "window_start_us"], sort=False, as_index=False)[
            "user_id"
        ].nunique()
        return agg.rename(columns={"user_id": "n_users"})

    return bucketed_reduce(
        ev.map_batches(_partial, batch_format="pandas", batch_size=None),
        ["event_type", "window_start_us"],
        _count,
        pa.schema(
            [("event_type", pa.string()), ("window_start_us", pa.int64()),
             ("n_users", pa.int64())]
        ),
    )


def q_events_hourly_gapfill(sf_dir: str):
    """Hourly event counts over the complete min..max spine — quiet
    hours emit 0 (date-spine gap fill; a plain groupby drops them).
    Count-gated driver reindex vs distributed range-spine left join."""
    from ..stages.sessions import gapfill_counts

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["ts"])
    return gapfill_counts(ev, "ts")


def q_doc_token_percentile(sf_dir: str):
    """Integer cume_dist of each document's token count (exact
    thousandths — float cume_dist never hash-matches): one histogram
    shuffle, gated distinct-value broadcast, map-side searchsorted."""
    from ..stages.quantiles import percentile_ranks

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def _tok(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("")
        stripped = t.str.strip()
        n = stripped.str.split().str.len().fillna(0)
        n = n.where(stripped.str.len() > 0, 0)
        return pd.DataFrame({"doc_id": b["doc_id"], "n_tokens": n.astype("int64")})

    return percentile_ranks(
        docs.map_batches(_tok, batch_format="pandas"), "doc_id", "n_tokens"
    )


def q_doc_nfc_normalize(sf_dir: str):
    """Unicode NFC ingest hygiene: md5 of the normalized text + a
    changed flag, map-only — hash-exact vs DuckDB nfc_normalize."""
    from ..stages.webtext import nfc_normalize_stats

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return nfc_normalize_stats(docs)


def q_fuzzy_decontaminate(sf_dir: str):
    """Cross-corpus fuzzy matching (MinHash-LSH between two tables):
    a synthetic benchmark (every 25th document, lightly paraphrased)
    is matched against the corpus — the paraphrase-robust companion of
    the exact n-gram doc_decontaminate. Hash-exact vs the cross-side
    ideal-Jaccard twin (banding is only a candidate filter ahead of
    the exact verify); planted-paraphrase and cross-only semantics
    additionally pinned in test_dedup_ops."""
    from ..stages.dedup import cross_near_dup

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def _bench(b: pd.DataFrame) -> pd.DataFrame:
        m = b["doc_id"] % 25 == 0
        t = b.loc[m, "text"].fillna("")
        return pd.DataFrame(
            {
                "bench_id": b.loc[m, "doc_id"].to_numpy(np.int64),
                # light deterministic paraphrase: prepend a token
                "text": "benchmark " + t,
            }
        )

    bench = docs.map_batches(_bench, batch_format="pandas")
    return cross_near_dup(docs, bench, threshold=0.7)


def q_doc_bigram_ppl(sf_dir: str):
    """Per-document mean transition NLL under a corpus-fit bigram
    model (the conditional, KenLM-shaped quality signal). Hash-exact:
    per-transition nll is quantized to integer micro-nats, so the SQL
    twin's integer sums reproduce it bit-for-bit; also pinned by the
    pure-Python twin + forced-gate equivalence in test_webtext."""
    from ..stages.webtext import bigram_nll

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return bigram_nll(docs)


def q_doc_unigram_ppl(sf_dir: str):
    """Per-document mean NLL (milli-nats) under a corpus-fit unigram
    model — the CCNet quality-signal shape with the broadcast-model
    scoring pass. Hash-exact: per-token log probs are quantized to
    integer micro-nats at model build, so the SQL twin's integer sums
    reproduce it bit-for-bit; also pinned by the pure-Python twin in
    test_webtext."""
    from ..stages.webtext import unigram_nll

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return unigram_nll(docs)


def q_token_postings(sf_dir: str):
    """Inverted-index materialization: per token, document frequency
    and the ascending comma-joined posting list (df >= 5) — one
    bucketed shuffle over map-side-distinct (token, doc) pairs,
    hash-exact vs a string_agg SQL twin."""
    from ..stages.vocab import token_postings

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return token_postings(docs, min_df=5)


BUCKET_QS = (1 / 3, 2 / 3)


def q_doc_quality_buckets(sf_dir: str):
    """CCNet-style head/middle/tail split of each language's corpus by
    token-count terciles: one grouped-quantile shuffle for the (tiny,
    count-gated) per-language thresholds, broadcast once, map-side
    bucket tags — hash-exact vs the quantile_disc SQL twin."""
    from ..stages.quantiles import quantile_buckets

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "lang", "text"]
    )

    def _tok(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("")
        stripped = t.str.strip()
        n = stripped.str.split().str.len().fillna(0)
        n = n.where(stripped.str.len() > 0, 0)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "n_tokens": n.astype("int64"),
            }
        )

    return quantile_buckets(
        docs.map_batches(_tok, batch_format="pandas"),
        "lang",
        "n_tokens",
        qs=BUCKET_QS,
        passthrough_cols=["doc_id"],
    )


def _quality_buckets_sql() -> str:
    q1, q2 = (repr(float(q)) for q in BUCKET_QS)
    return f"""
        WITH t AS (SELECT doc_id, lang, {_N_TOKENS_SQL} AS n_tokens FROM documents),
        c AS (SELECT lang, n_tokens AS v, count(*) AS cnt FROM t GROUP BY 1, 2),
        s AS (SELECT lang, v,
                     sum(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum,
                     sum(cnt) OVER (PARTITION BY lang) AS tot
              FROM c),
        q(q) AS (VALUES (CAST({q1} AS DOUBLE)), ({q2})),
        thr AS (
          SELECT s.lang, q.q, min(s.v) AS value
          FROM q, s
          WHERE s.cum >= greatest(1, CAST(ceil(q.q * s.tot) AS BIGINT))
          GROUP BY s.lang, q.q
        ),
        w AS (
          SELECT lang,
                 min(value) FILTER (q = {q1}) AS t1,
                 min(value) FILTER (q = {q2}) AS t2
          FROM thr GROUP BY lang
        )
        SELECT t.doc_id, t.lang, CAST(t.n_tokens AS BIGINT) AS n_tokens,
               CASE WHEN t.n_tokens <= w.t1 THEN 'head'
                    WHEN t.n_tokens <= w.t2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM t JOIN w USING (lang)
    """


def q_top_tokens_approx(sf_dir: str):
    """Count-min-sketch heavy-hitter tokens (the mergeable-sketch
    counterpart of the exact ``top_tokens``): per-block exact counts
    feed one bounded-constant bucketed cell sum; estimates never
    undercount. Hash-exact vs the exact-top-k SQL twin as a
    CALIBRATED fixture fact: the test corpus vocabulary (31 tokens)
    is far below the sketch width (2048), so every token is a
    candidate in every block and no CMS cell collides — est_count
    equals the true count and the approx top-k IS the exact top-k.
    A collision regression or candidate loss flips the hash loudly;
    the probabilistic bounds stay pinned in test_sketches."""
    from ..stages.sketches import cms_heavy_hitters

    def _explode(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.lower().str.findall(r"\w+")
        arrs = [t for t in toks.to_numpy() if t]
        return pd.DataFrame(
            {"token": np.concatenate(arrs) if arrs else pd.Series([], dtype=object)}
        )

    tokens = _docs(sf_dir).map_batches(_explode, batch_format="pandas")
    return cms_heavy_hitters(tokens, "token", k=50)


HITS_ITERS, HITS_SCALE = 3, 10**6


def q_hits(sf_dir: str):
    """Integer HITS hubs/authorities over the customer->nation->region
    graph — per-round max renormalization in exact integers, so the
    result is hash-exact vs the unrolled SQL oracle (count-gated local
    twin under 2M edges; iterated bucketed joins over, bit-equal)."""
    from ..stages.graph_algos import hits_int

    return hits_int(_cnr_edges(sf_dir), iters=HITS_ITERS, scale=HITS_SCALE)


_CNR_EDGES_SQL = """
        edges AS (
          SELECT 'c' || CAST(c_custkey AS VARCHAR) AS src,
                 'n' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
          UNION ALL
          SELECT 'n' || CAST(n_nationkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR) FROM nation
        )"""


def _hits_oracle_sql(iters: int = HITS_ITERS, scale: int = HITS_SCALE) -> str:
    """Unrolled-iteration SQL twin of the integer HITS recurrence
    (DuckDB ``//`` = floor division, matching Python on
    non-negatives)."""
    head = f"""
        WITH {_CNR_EDGES_SQL},
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges UNION SELECT dst FROM edges
          )
        ),
        h0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS val FROM nodes)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""",
        sa{k} AS MATERIALIZED (
          SELECT e.dst AS node, CAST(sum(h.val) AS BIGINT) AS val
          FROM edges e JOIN h{k - 1} h ON e.src = h.node GROUP BY e.dst
        ),
        araw{k} AS MATERIALIZED (
          SELECT n.node, CAST(COALESCE(s.val, 0) AS BIGINT) AS val
          FROM nodes n LEFT JOIN sa{k} s ON n.node = s.node
        ),
        a{k} AS MATERIALIZED (
          SELECT node, CAST(CASE WHEN (SELECT max(val) FROM araw{k}) > 0
            THEN (val * {scale}) // (SELECT max(val) FROM araw{k})
            ELSE 0 END AS BIGINT) AS val FROM araw{k}
        ),
        sh{k} AS MATERIALIZED (
          SELECT e.src AS node, CAST(sum(a.val) AS BIGINT) AS val
          FROM edges e JOIN a{k} a ON e.dst = a.node GROUP BY e.src
        ),
        hraw{k} AS MATERIALIZED (
          SELECT n.node, CAST(COALESCE(s.val, 0) AS BIGINT) AS val
          FROM nodes n LEFT JOIN sh{k} s ON n.node = s.node
        ),
        h{k} AS MATERIALIZED (
          SELECT node, CAST(CASE WHEN (SELECT max(val) FROM hraw{k}) > 0
            THEN (val * {scale}) // (SELECT max(val) FROM hraw{k})
            ELSE 0 END AS BIGINT) AS val FROM hraw{k}
        )""")
    return head + "".join(steps) + f"""
        SELECT h.node, h.val AS hub_scaled, a.val AS auth_scaled
        FROM h{iters} h JOIN a{iters} a ON h.node = a.node
    """


# corpus-mixing rates (integer milli-probabilities) shared between the
# Ray stage and the SQL oracle builder so they cannot drift
MIXTURE_RATES_MILLI = {f"src{i}": (1000, 500, 250, 100)[i % 4] for i in range(20)}
MIXTURE_DEFAULT_MILLI = 200
# resampling rates incl. UPSAMPLING (>1000 = multiple epochs)
RESAMPLE_RATES_MILLI = {f"src{i}": (2500, 1000, 500, 0)[i % 4] for i in range(20)}


def q_doc_mixture_resample(sf_dir: str):
    """Mixture resampling with upsampling: 2.5 / 1.0 / 0.5 / 0 epochs
    by source class — full copies plus a Lehmer-thresholded fractional
    copy, each tagged copy_id. Map-only; hash-exact vs a
    generate_series SQL twin."""
    from ..stages.relational import mixture_resample

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "source"])
    return mixture_resample(
        docs, "doc_id", "source", RESAMPLE_RATES_MILLI, default_milli=0
    )


def _mixture_resample_sql() -> str:
    base_cases = "\n".join(
        f"            WHEN '{g}' THEN {int(m) // 1000}"
        for g, m in RESAMPLE_RATES_MILLI.items()
    )
    frac_cases = "\n".join(
        f"            WHEN '{g}' THEN {((int(m) % 1000) * _LEHMER_MOD) // 1000}"
        for g, m in RESAMPLE_RATES_MILLI.items()
    )
    return f"""
        WITH n AS (
          SELECT doc_id, source,
                 CAST(CASE source
{base_cases}
                 ELSE 0 END
                 + CASE WHEN ((doc_id % {_LEHMER_MOD}) * {_LEHMER_MULT}) % {_LEHMER_MOD}
                        < CASE source
{frac_cases}
                          ELSE 0 END
                   THEN 1 ELSE 0 END AS BIGINT) AS n_copies
          FROM documents
        )
        SELECT doc_id, source, u.copy_id
        FROM n, LATERAL (
          SELECT unnest(generate_series(0, CAST(n.n_copies - 1 AS BIGINT))) AS copy_id
        ) u
    """
# 48271^3 mod 2^31-1: one Lehmer round leaves small sequential ids
# unwrapped (monotone rank -> threshold keeps a prefix, not a sample)
_LEHMER_MULT, _LEHMER_MOD = 1291394886, 2147483647


def q_doc_mixture_sample(sf_dir: str):
    """Per-source corpus mixing (The Pile / DoReMi reweighting shape):
    deterministic Bernoulli keep decision from an all-integer Lehmer
    rank of doc_id vs the source's milli-rate threshold — map-only
    (zero shuffle), layout-independent, and exactly reproducible in
    SQL."""
    from ..stages.relational import bernoulli_mixture_sample

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "source"])
    return bernoulli_mixture_sample(
        docs, "doc_id", "source", MIXTURE_RATES_MILLI,
        default_milli=MIXTURE_DEFAULT_MILLI,
    )


def _mixture_sample_sql() -> str:
    cases = "\n".join(
        f"            WHEN '{g}' THEN {(m * _LEHMER_MOD) // 1000}"
        for g, m in MIXTURE_RATES_MILLI.items()
    )
    default_thr = (MIXTURE_DEFAULT_MILLI * _LEHMER_MOD) // 1000
    return f"""
        SELECT doc_id, source FROM documents
        WHERE ((doc_id % {_LEHMER_MOD}) * {_LEHMER_MULT}) % {_LEHMER_MOD} < CASE source
{cases}
            ELSE {default_thr} END
    """


def q_embedding_clusters(sf_dir: str):
    """Distributed spherical k-means assignments (k=10, 5 Lloyd
    rounds). Fixed-point integer partial sums make the fit
    layout-independent (bit-identical at any parallelism — pinned in
    test_clustering) AND SQL-expressible: vectors are quantized ONCE
    to int64 fixed point, so every per-cluster sum is exact integer
    arithmetic and the five Lloyd rounds unroll into CTE stages
    (:func:`_kmeans_oracle_sql`) — hash-exact vs DuckDB."""
    from ..stages.clustering import kmeans_assign, kmeans_fit_distributed

    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    cents = kmeans_fit_distributed(ds, 10, iters=5)
    return kmeans_assign(ds, cents)


def _kmeans_oracle_sql(k: int = 10, iters: int = 5) -> str:
    """Unrolled-iteration SQL twin of the fixed-point spherical
    k-means fit + assignment (``clustering.kmeans_fit_distributed``):
    vectors quantize ONCE to int64 (divide / multiply / roundbankers,
    mirroring ``_fixed_unit``), Lehmer-ranked seeds, then each Lloyd
    round is score-argmax (max cosine, first-max tie-break = cluster
    ASC) + EXACT integer per-cluster sums + one float divide and
    normalize — the same op chain as the stage, so the final
    assignment is hash-exact."""
    scale = 1 << 20
    head = f"""
        WITH v AS MATERIALIZED (
          SELECT vec_id, u.d, CAST(roundbankers(
                   u.x / greatest(b.nrm, 1e-12) * {scale}.0, 0) AS BIGINT) AS fx
          FROM (
            SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(
                     embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                   ))) AS nrm
            FROM embeddings
          ) b,
          LATERAL (SELECT CAST(unnest(b.embedding) AS DOUBLE) AS x,
                          generate_subscripts(b.embedding, 1) - 1 AS d) u
        ),
        seeds AS (
          SELECT vec_id, CAST(row_number() OVER (
                   ORDER BY (vec_id * 48271) % 2147483647, vec_id) - 1
                 AS BIGINT) AS cluster
          FROM embeddings
          QUALIFY row_number() OVER (
            ORDER BY (vec_id * 48271) % 2147483647, vec_id) <= {k}
        ),
        c0 AS MATERIALIZED (
          SELECT s.cluster, v.d, CAST(v.fx AS DOUBLE) / {scale}.0 AS val
          FROM seeds s JOIN v ON v.vec_id = s.vec_id
        )"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
        s{i} AS (
          SELECT v.vec_id, c.cluster,
                 sum(CAST(v.fx AS DOUBLE) / {scale}.0 * c.val) AS score
          FROM v JOIN c{i - 1} c ON c.d = v.d
          GROUP BY v.vec_id, c.cluster
        ),
        a{i} AS MATERIALIZED (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster, row_number() OVER (
              PARTITION BY vec_id ORDER BY score DESC, cluster ASC) AS rn
            FROM s{i}) WHERE rn = 1
        ),
        u{i} AS (
          SELECT a.cluster, v.d,
                 CAST(sum(v.fx) AS BIGINT) AS sfx,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM a{i} a JOIN v ON v.vec_id = a.vec_id
          GROUP BY a.cluster, v.d
        ),
        m{i} AS (
          SELECT cluster, d,
                 CAST(sfx AS DOUBLE) / CAST(cnt * {scale} AS DOUBLE) AS mean
          FROM u{i}
        ),
        n{i} AS (
          SELECT cluster, sqrt(sum(mean * mean)) AS nrm FROM m{i} GROUP BY cluster
        ),
        c{i} AS MATERIALIZED (
          SELECT p.cluster, p.d,
                 CASE WHEN nn.nrm > 1e-12 THEN m.mean / nn.nrm
                      ELSE p.val END AS val
          FROM c{i - 1} p
          LEFT JOIN m{i} m ON m.cluster = p.cluster AND m.d = p.d
          LEFT JOIN n{i} nn ON nn.cluster = p.cluster
        )""")
    tail = f""",
        sf AS (
          SELECT v.vec_id, c.cluster,
                 sum(CAST(v.fx AS DOUBLE) / {scale}.0 * c.val) AS score
          FROM v JOIN c{iters} c ON c.d = v.d
          GROUP BY v.vec_id, c.cluster
        )
        SELECT vec_id, cluster FROM (
          SELECT vec_id, cluster, row_number() OVER (
            PARTITION BY vec_id ORDER BY score DESC, cluster ASC) AS rn
          FROM sf) WHERE rn = 1"""
    return head + "".join(steps) + tail


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic near-dup mapping: k-means cluster, then
    within-cluster cosine >= 0.95 pairs keep the min id — over the
    planted corpus (:func:`_embeddings_with_planted`), where identical
    copies are guaranteed to share a cell, so the within-cluster-only
    search provably equals the all-pairs SQL twin. Cross-cluster
    blindness on NON-identical near-dups stays pinned by the planted-
    group tests in test_clustering."""
    from ..stages.clustering import semantic_dedup

    return semantic_dedup(
        _embeddings_with_planted(sf_dir), k=10, iters=5, threshold=0.95
    )


def q_doc_bm25_mlt(sf_dir: str):
    """Integer-exact BM25 "more-like-this": top-10 lexical matches for
    3 probe documents. Broadcast query vocab, df restricted to it, one
    shuffle-free scoring pass + a tiny per-query reduce — the shuffle
    never carries more than (query vocab + k x blocks) rows."""
    from ..stages.retrieval import bm25_more_like_this

    return bm25_more_like_this(_docs(sf_dir), [0, 7, 42], k=10)


def q_events_in_purchase_windows(sf_dir: str):
    """Interval-containment range join via grid replication: every
    event falling inside a 10-minute window opened by each purchase
    event. One cell-keyed exchange; each pair meets in exactly one
    cell so no post-join dedup."""
    from ..stages.rangejoin import interval_join

    _WIN_US = 600 * 1_000_000

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_id", "ts", "event_type"])

    def _points(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
            }
        )

    def _windows(b: pa.Table) -> pa.Table:
        m = pc.equal(b["event_type"], "purchase")
        sub = b.filter(m)
        start = pc.cast(sub["ts"], pa.int64())
        return pa.table(
            {
                "purchase_id": sub["event_id"],
                "start_us": start,
                "end_us": pc.add(start, _WIN_US),
            }
        )

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("purchase_id", pa.int64()),
            ("start_us", pa.int64()),
            ("end_us", pa.int64()),
        ]
    )
    return interval_join(
        ev.map_batches(_points, batch_format="pyarrow"),
        ev.map_batches(_windows, batch_format="pyarrow"),
        point_col="ts_us",
        start_col="start_us",
        end_col="end_us",
        bucket_width=_WIN_US,  # ~2 cells per interval
        out_schema=out_schema,
    )


def q_orders_snapshot_diff(sf_dir: str):
    """Keyed snapshot diff between two simulated versions of `orders`
    (old drops keys %13==0, new drops %11==0 and restates the priority
    of keys %7==0): added/removed/changed per key off ONE full-outer
    join of md5 row digests — the wide payload never shuffles."""
    from ..stages.diff import snapshot_diff

    base = read_parquet_clean(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )

    def _render(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "o_orderstatus": b["o_orderstatus"],
                "price_cents": _cents(b["o_totalprice"]),
                "o_orderpriority": b["o_orderpriority"],
            }
        )

    rendered = base.map_batches(_render, batch_format="pyarrow")

    def _old(b: pa.Table) -> pa.Table:
        # this pyarrow has no pc.mod — numpy on the zero-copy int column
        keys = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(keys % 13 != 0))

    def _new(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(keys % 11 != 0))
        keys = b["o_orderkey"].to_numpy(zero_copy_only=False)
        restate = pa.array(keys % 7 == 0)
        return b.set_column(
            b.schema.get_field_index("o_orderpriority"),
            "o_orderpriority",
            pc.if_else(restate, "0-RESTATED", b["o_orderpriority"]),
        )

    return snapshot_diff(
        rendered.map_batches(_old, batch_format="pyarrow"),
        rendered.map_batches(_new, batch_format="pyarrow"),
        ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "price_cents", "o_orderpriority"],
        key_schema=pa.schema([("o_orderkey", pa.int64())]),
    )


def q_doc_compression(sf_dir: str):
    """zlib compression-ratio hygiene signal per document (integer
    fixed-point, deterministic at level 6). Rows-only: DuckDB has no
    zlib; determinism + bounds are pinned in test_stages_misc."""
    from ..stages.text_analysis import compression_ratio

    return compression_ratio(_docs(sf_dir))


def q_orders_profile(sf_dir: str):
    """Per-column data-quality profile of `orders` (nulls, exact
    distinct, min/max): scalar stats are shuffle-free map-side
    partials; distinct is one map-side-deduped pair shuffle."""
    from ..stages.profile import profile_table

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    return profile_table(
        read_parquet_clean(_t(sf_dir, "orders"), columns=cols), cols
    )


def q_customer_fuzzy_names(sf_dir: str):
    """Typo-tolerant self-join: all customer-name pairs within
    Levenshtein distance 1, via FastSS deletion-neighborhood blocking
    (one variant shuffle + one pair dedup; vectorized verify) instead
    of the O(n²) cross scan the oracle runs."""
    from ..stages.fuzzy import fuzzy_pairs

    cust = read_parquet_clean(_t(sf_dir, "customer"), columns=["c_name"])
    return fuzzy_pairs(cust, "c_name")


_SKYLINE_SCHEMA = pa.schema(
    [("o_orderkey", pa.int64()), ("price_cents", pa.int64()), ("date_day", pa.int64())]
)


def q_orders_skyline(sf_dir: str):
    """Pareto frontier of orders (maximize price, minimize order
    date): per-block local skyline + one tiny merge — the skyline
    operator is associative over unions, so nothing shuffles."""
    from ..stages.skyline import pareto_front

    base = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )

    def _prep(b: pa.Table) -> pa.Table:
        days = pc.divide(pc.cast(b["o_orderdate"], pa.int64()), 86_400_000_000)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "price_cents": _cents(b["o_totalprice"]),
                "date_day": days,
            }
        )

    return pareto_front(
        base.map_batches(_prep, batch_format="pyarrow"),
        max_col="price_cents",
        min_col="date_day",
        schema=_SKYLINE_SCHEMA,
    )


_TREND_BASE_DAY = 8035  # 1992-01-01 in epoch days (keeps x*y far below 2^63)


def q_orders_price_trend(sf_dir: str):
    """Exact integer-rational OLS slope of order price (cents) over
    order date (days since 1992-01-01), per priority class — five
    int64 sufficient statistics map-side, one bucketed exchange,
    arbitrary-precision final arithmetic on the per-group residue."""
    from ..stages.regress import grouped_ols_slope

    base = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice", "o_orderdate"]
    )

    def _prep(b: pa.Table) -> pa.Table:
        days = pc.divide(pc.cast(b["o_orderdate"], pa.int64()), 86_400_000_000)
        return pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "x_day": pc.subtract(days, _TREND_BASE_DAY),
                "y_cents": _cents(b["o_totalprice"]),
            }
        )

    return grouped_ols_slope(
        base.map_batches(_prep, batch_format="pyarrow"),
        "o_orderpriority",
        "x_day",
        "y_cents",
    )


def q_events_transitions(sf_dir: str):
    """First-order Markov transition matrix over per-user event
    sequences with exact integer row probabilities — one user-bucket
    shuffle emitting pre-aggregated pair counts, one tiny pair
    exchange."""
    from ..stages.sessions import transition_counts

    return transition_counts(
        read_parquet_clean(
            _t(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type"]
        )
    )


def q_session_concurrency(sf_dir: str):
    """Peak concurrent sessions per hour — distributed sweep-line:
    sessionize to half-open intervals, ±1 deltas combined per
    timestamp map-side, ONE time-bucket exchange, cross-bucket prefix
    offsets over the tiny per-hour residue."""
    from ..stages.sessions import interval_concurrency, session_intervals

    iv = session_intervals(
        read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "ts"])
    )
    return interval_concurrency(iv)


def q_part_copurchase_lift(sf_dir: str):
    """Association lift for the top-100 co-purchased part pairs —
    per-item basket counts computed only for the winning pairs' items
    (broadcast filter), exact distinct-order total, Python-int final
    arithmetic on the ≤100-row residue."""
    from ..stages.cooccur import cooccur_lift

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"]
    )
    return cooccur_lift(li, "l_orderkey", "l_partkey", min_count=2, top_k=100).map_batches(
        lambda b: pa.table(
            {
                "part_a": b["item_a"],
                "part_b": b["item_b"],
                "n_baskets": b["n_baskets"],
                "lift_milli": b["lift_milli"],
            }
        ),
        batch_format="pyarrow",
    )


def q_url_normalize(sf_dir: str):
    """RFC-3986-subset URL canonicalization over a deterministic messy
    URL per document (case/port/param-order/fragment variants keyed on
    doc_id, synthesized identically in the SQL oracle): shuffle-free
    map pass, vectorized regex + explode-sort-join param sort."""
    from ..stages.urlnorm import url_normalize

    base = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id"])

    def _synth(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy(np.int64)

        def _pick(mask: np.ndarray, a: str, b_: str) -> pd.Series:
            return pd.Series(np.where(mask, a, b_), dtype=object)

        scheme = _pick(d % 3 == 0, "HTTP", "http")
        host = _pick(d % 2 == 1, "Example.COM", "example.com")
        port = _pick(d % 5 == 0, ":80", "")
        ds_ = pd.Series(d).astype(str).astype(object)
        path = "/docs/" + ds_ + _pick(d % 7 == 0, "/", "")
        q10 = pd.Series(d % 10).astype(str).astype(object)
        query = ("?b=2&a=" + q10).where(pd.Series(d % 2 == 0), "?a=" + q10 + "&b=2")
        frag = _pick(d % 11 == 0, "#s", "")
        url = scheme + "://" + host + port + path + query + frag
        return pd.DataFrame({"doc_id": d, "url": url.astype(object)})

    return url_normalize(base.map_batches(_synth, batch_format="pandas"))


def q_url_dedup(sf_dir: str):
    """Canonical-URL dedup: messy URL variants (case/port/param-order/
    trailing-slash/fragment, keyed on doc_id but colliding on
    doc_id % 50) normalize to one canonical form; keep the min doc_id
    per canonical URL with the collapse count — the crawl-frontier
    dedup every web pipeline runs before fetch. One url_norm-keyed
    bucketed reduce after the shuffle-free normalize pass."""
    from ..stages.infer import bucketed_reduce
    from ..stages.urlnorm import url_normalize

    base = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id"])

    def _synth(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy(np.int64)
        k = d % 50

        def _pick(mask: np.ndarray, a: str, b_: str) -> pd.Series:
            return pd.Series(np.where(mask, a, b_), dtype=object)

        scheme = _pick(d % 3 == 0, "HTTP", "http")
        host = _pick(d % 2 == 1, "Example.COM", "example.com")
        port = _pick(d % 5 == 0, ":80", "")
        ks = pd.Series(k).astype(str).astype(object)
        path = "/p/" + ks + _pick(d % 7 == 0, "/", "")
        q10 = pd.Series(k % 10).astype(str).astype(object)
        query = ("?b=2&a=" + q10).where(pd.Series(d % 2 == 0), "?a=" + q10 + "&b=2")
        frag = _pick(d % 11 == 0, "#s", "")
        url = scheme + "://" + host + port + path + query + frag
        return pd.DataFrame({"doc_id": d, "url": url.astype(object)})

    normed = url_normalize(base.map_batches(_synth, batch_format="pandas"))

    def _keep(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("url_norm", sort=False, as_index=False)["doc_id"].agg(
            ["min", "count"]
        )
        return pd.DataFrame(
            {
                "url_norm": agg["url_norm"],
                "keeper_doc_id": agg["min"].astype("int64"),
                "n_docs": agg["count"].astype("int64"),
            }
        )

    return bucketed_reduce(
        normed.select_columns(["url_norm", "doc_id"]),
        ["url_norm"],
        _keep,
        pa.schema(
            [
                ("url_norm", pa.string()),
                ("keeper_doc_id", pa.int64()),
                ("n_docs", pa.int64()),
            ]
        ),
    )


def q_graph_closeness(sf_dir: str):
    """Sampled closeness-centrality statistics from the 5 region nodes
    (deterministic source set): one shared multi-source BFS (frontier
    rows carry the source label — k sources, one sweep per hop), exact
    integer (n_reached, total_dist) per entity vs a recursive-CTE
    oracle."""
    import pyarrow.parquet as pq

    from ..stages.graph_algos import sampled_closeness

    regions = pq.read_table(_t(sf_dir, "region"), columns=["r_regionkey"]).to_pandas()
    sources = [f"r{int(k)}" for k in sorted(regions["r_regionkey"])]
    return sampled_closeness(_cnrs_edges(sf_dir), sources, max_hops=3)


def q_doc_leakage_split(sf_dir: str):
    """Leakage-safe train/valid split: near-dup clusters (MinHash-LSH
    mapping) are atomic — every member lands in the split of its
    canonical representative (deterministic splitmix64 of rep id).
    Hash-exact: the twin composes the ideal-Jaccard rep mapping with
    a bit-exact SQL splitmix64 (UBIGINT xor, shift-by-division,
    split-multiply mod 2^64)."""
    from ..stages.dedup import minhash_lsh_dedup
    from ..stages.training import leakage_safe_split

    docs = _docs(sf_dir)
    mapping = minhash_lsh_dedup(docs)
    return leakage_safe_split(docs, mapping, train_permille=900, seed=42)


def q_approx_users_per_type(sf_dir: str):
    """Grouped HyperLogLog: approximate distinct users PER event type
    (register partials per batch, one register max-merge exchange).
    Rows-only: sketch estimate, accuracy pinned by test."""
    from ..stages.sketches import hll_distinct

    return hll_distinct(
        read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "user_id"]),
        "user_id",
        ["event_type"],
        p=12,
    )


def q_doc_length_outliers(sf_dir: str):
    """Robust document-length outliers via all-integer median/MAD
    (|len − med| > 3·MAD): two distinct-value histogram shuffles for
    the scalars, one map-only flag pass."""
    from ..stages.quantiles import mad_outliers

    counts = token_counts(_docs(sf_dir)).materialize()
    return mad_outliers(counts, "doc_id", "n_tokens", k=3)


def q_events_retention(sf_dir: str):
    """Weekly cohort retention matrix (distinct users from cohort c
    active at offset k) — map-side distinct (user, week) partials,
    one user-keyed bucketed reduce computing each user's cohort, one
    tiny cell-sum reduce; hash-exact vs a min-over-user SQL twin."""
    from ..stages.sessions import retention_matrix

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "ts"])
    return retention_matrix(ev)


def q_customer_rfm(sf_dir: str):
    """Per-customer RFM segmentation (recency/frequency/monetary 1-5
    scores + segment label) — one customer-keyed metrics shuffle, three
    gated histogram broadcasts, integer tie-stable binning; hash-exact
    vs a count(*)-OVER SQL twin."""
    from ..stages.segment import rfm_segments

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    return rfm_segments(orders)


FD_PAIRS = [
    ("l_orderkey", "l_returnflag"),
    ("l_partkey", "l_suppkey"),
    ("l_orderkey", "l_linestatus"),
]


def q_lineitem_fd_audit(sf_dir: str):
    """Functional-dependency audit (does lhs determine rhs?) over
    lineitem join keys — per pair one lhs-keyed bucketed shuffle over
    map-side-distinct (lhs, rhs); hash-exact vs a count(DISTINCT)
    HAVING SQL twin."""
    from ..stages.profile import fd_audit

    cols = sorted({c for p in FD_PAIRS for c in p})
    li = read_parquet_clean(_t(sf_dir, "lineitem"), columns=cols)
    return fd_audit(li, FD_PAIRS)


def q_doc_importance(sf_dir: str):
    """DSIR-shaped importance scores toward the English subset —
    integer target/raw token-count-ratio features (one token shuffle
    fitting both count tables, broadcast weights, map-side scoring);
    hash-exact vs an explode-join SQL twin."""
    from ..stages.webtext import importance_scores

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "text", "lang"]
    )
    return importance_scores(docs, target_value="en")


def q_doc_chars_approx_quantiles(sf_dir: str):
    """Approximate n_chars quantiles from a mergeable 1000-bin integer
    histogram — the sketch-based scale path for near-unique signals
    past the exact-quantile gate; pure integer arithmetic so it is
    hash-exact vs a width-bucket + window-cumsum SQL twin."""
    from ..stages.quantiles import approx_quantiles_hist

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["n_chars"])
    return approx_quantiles_hist(docs, "n_chars")


def q_events_cusum(sf_dir: str):
    """Per-event-type CUSUM level-shift scan over hourly volumes —
    mean-centered integer deviations (scaled by the bucket count, no
    division), prefix-sum-minus-running-min drawup, max + first argmax
    hour. ONE exchange of per-block hourly partials; hash-exact vs a
    window-function SQL twin."""
    from ..stages.drift import cusum_changepoints

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_type", "ts"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "event_type": b["event_type"],
                "hour": b["ts"].astype("datetime64[us]").astype("int64")
                // 3_600_000_000,
            }
        ),
        batch_format="pandas",
    )
    return cusum_changepoints(ev, "event_type", "hour")


def q_events_skew_profile(sf_dir: str):
    """Key-skew report over candidate shuffle keys (user_id,
    event_type): distinct keys, hottest-key count/share, p99 per-key
    count — the pre-shuffle planning probe; two count exchanges per
    column, count-of-counts residue only. Hash-exact vs a
    quantile_disc SQL twin."""
    from ..stages.profile import skew_profile

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "event_type"]
    )
    return skew_profile(ev, ["user_id", "event_type"])


def _orders_scd2_history(sf_dir: str):
    """Shared SCD-2 fixture: three simulated order-priority snapshots
    (restatements + deletions keyed on o_orderkey mods) folded into
    validity intervals."""
    from ..stages.diff import scd2_history

    base = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )

    def _snap(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy(np.int64)
        p = b["o_orderpriority"].astype(object)
        v2 = p.where(pd.Series(k % 7 != 0, index=p.index), "0-RESTATED")
        v3 = v2.where(pd.Series(k % 5 != 0, index=p.index), "9-FINAL")
        frames = [
            pd.DataFrame({"key": k, "snap": 1, "val": p}),
            pd.DataFrame({"key": k, "snap": 2, "val": v2})[k % 11 != 0],
            pd.DataFrame({"key": k, "snap": 3, "val": v3})[k % 13 != 0],
        ]
        out = pd.concat(frames, ignore_index=True)
        out["snap"] = out["snap"].astype("int64")
        return out

    return scd2_history(base.map_batches(_snap, batch_format="pandas"))


def q_orders_scd2(sf_dir: str):
    """SCD-type-2 history from three simulated order-priority
    snapshots (restatements + deletions keyed on o_orderkey mods):
    one validity interval per run of equal values, deletion gaps
    break runs — one key-bucketed gaps-and-islands shuffle,
    hash-exact vs a lag()+window-sum SQL twin."""
    return _orders_scd2_history(sf_dir)


def q_orders_scd2_pit(sf_dir: str):
    """Point-in-time dimension lookup: probe (o_orderkey, t = 1 +
    key % 3) against the SCD-2 validity intervals — one keyed
    partitioned join + vectorized containment (intervals per key are
    disjoint, so no range replication). Probes landing in deletion
    gaps drop out. Hash-exact vs the scd2 CTE joined on key +
    BETWEEN."""
    from ..stages.diff import pit_lookup

    hist = _orders_scd2_history(sf_dir)
    probes = read_parquet_clean(_t(sf_dir, "orders"), columns=["o_orderkey"])

    def _p(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({"key": k, "t": k % 3 + 1})

    return pit_lookup(probes.map_batches(_p, batch_format="pandas"), hist)


def q_orders_expectations(sf_dir: str):
    """Declarative data-quality gate over orders (+ lineitem FK):
    seven checks — null scan, two uniqueness counts, a price range,
    enum membership, a priority-format regex, and lineitem→orders
    referential integrity — compiled into one shared row-local pass,
    two distinct-count shuffles and one anti-join over distinct keys.
    Hash-exact vs per-check SQL twins."""
    from ..stages.validate import expectations_report

    orders = read_parquet_clean(
        _t(sf_dir, "orders"),
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderpriority",
        ],
    )
    lineitem = read_parquet_clean(_t(sf_dir, "lineitem"), columns=["l_orderkey"])
    checks = [
        {"id": "custkey_not_null", "kind": "not_null", "col": "o_custkey"},
        {"id": "orderkey_unique", "kind": "unique", "cols": ["o_orderkey"]},
        {"id": "custkey_unique", "kind": "unique", "cols": ["o_custkey"]},
        {"id": "totalprice_range", "kind": "range", "col": "o_totalprice",
         "lo": 0, "hi": 400000},
        {"id": "status_in_set", "kind": "in_set", "col": "o_orderstatus",
         "values": ["O", "F"]},
        {"id": "priority_format", "kind": "regex", "col": "o_orderpriority",
         "pattern": r"[1-5]-[A-Z]"},
    ]
    rep = expectations_report(orders, checks).to_pandas()
    fk = expectations_report(
        lineitem,
        [{"id": "lineitem_fk", "kind": "fk", "col": "l_orderkey",
          "ref": read_parquet_clean(_t(sf_dir, "orders"), columns=["o_orderkey"]),
          "ref_col": "o_orderkey"}],
    ).to_pandas()
    return pd.concat([rep, fk], ignore_index=True)


def q_revenue_rollup(sf_dir: str):
    """ROLLUP hierarchy (segment, priority) → (segment) → grand total
    over orders⋈customer revenue in integer cents: one raw-row
    shuffle at the finest level, each coarser level re-reduces the
    previous residue. Hash-exact vs GROUP BY ROLLUP."""
    from ..stages.relational import cogroup_join
    from ..stages.rollup import rollup_aggregate

    def _ord(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": pc.cast(b["o_custkey"], pa.int64()),
                "o_orderpriority": b["o_orderpriority"],
                "price_cents": _cents(b["o_totalprice"]),
            }
        )

    def _cust(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": pc.cast(b["c_custkey"], pa.int64()),
                "c_mktsegment": b["c_mktsegment"],
            }
        )

    orders = read_parquet_clean(
        _t(sf_dir, "orders"),
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    ).map_batches(_ord, batch_format="pyarrow")
    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(_cust, batch_format="pyarrow")
    joined = cogroup_join(orders, cust, ["custkey"])
    return rollup_aggregate(
        joined, ["c_mktsegment", "o_orderpriority"], "price_cents",
        out_name="total",
    )


def q_user_top_event(sf_dir: str):
    """Per-user modal event type with a total deterministic tie-break
    (count desc, then type asc): two bucketed exchanges over distinct
    (user, type) pairs. Hash-exact vs a row_number window twin."""
    from ..stages.rollup import grouped_mode

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()), ("cnt", pa.int64())]
    )
    return grouped_mode(ev, ["user_id"], "event_type", out_schema=schema)


def q_doc_span_corruption(sf_dir: str):
    """T5 span-corruption denoising pairs over documents: map-only,
    deterministic splitmix64 keyed on (seed, doc_id, position) — any
    partitioning yields byte-identical pairs. Hash-exact: the ENTIRE
    seeded generator is reproduced in SQL (splitmix stream, interval
    union, sentinel interleaving — see _span_corruption_oracle_sql);
    reconstruction additionally pinned by pytest."""
    from ..stages.training import generate_span_corruption

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return generate_span_corruption(docs, seed=42)


ZORDER_BITS = 16
ZORDER_USER_BOUNDS = (0, 4095)
ZORDER_TS_BOUNDS = (1_704_067_200_000_000, 1_709_251_200_000_000)  # 2024-01..03 µs


def q_events_zorder(sf_dir: str):
    """Morton (z-order) layout key over (user_id, ts): integer
    quantize + bit interleave, map-only — the physical-clustering key
    a 100-TB events table would sort by so user×time range scans
    prune to contiguous key ranges. Hash-exact vs the identical
    expression unrolled in SQL (shared constants)."""
    from ..stages.zorder import zorder_key

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def _us(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "ts_us": pc.cast(b["ts"], pa.int64()),
            }
        )

    lo_u, hi_u = ZORDER_USER_BOUNDS
    lo_t, hi_t = ZORDER_TS_BOUNDS
    return zorder_key(
        ev.map_batches(_us, batch_format="pyarrow"),
        [("user_id", lo_u, hi_u), ("ts_us", lo_t, hi_t)],
        bits=ZORDER_BITS,
        keep_cols=["event_id"],
    )


def q_doc_curriculum_shards(sf_dir: str):
    """Curriculum shard packing: documents ordered shortest-first
    (n_chars, then doc_id) packed into fixed-token-budget shards —
    the composite of an order key synthesis and the distributed
    prefix-sum pack. Hash-exact vs an exclusive window sum ordered by
    (n_chars, doc_id)."""
    from ..stages.packing import pack_shards
    from ..stages.text_analysis import token_counts

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"]
    )
    toks = token_counts(docs)

    # order key: (n_chars, doc_id) lexicographic packed into one int64
    chars = docs.select_columns(["doc_id", "n_chars"])
    from ..stages.relational import cogroup_join

    joined = cogroup_join(
        toks, chars, ["doc_id"],
        left_schema=pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())]),
    )

    def _key(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"__key": pd.Series([], dtype="int64"),
                 "n_tokens": pd.Series([], dtype="int64")}
            )
        key = b["n_chars"].to_numpy(np.int64) * (1 << 33) + b["doc_id"].to_numpy(
            np.int64
        )
        return pd.DataFrame({"__key": key, "n_tokens": b["n_tokens"].to_numpy(np.int64)})

    packed = pack_shards(
        joined.map_batches(_key, batch_format="pandas"),
        budget=2048, id_col="__key",
    )

    def _unkey(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "n_tokens": pd.Series([], dtype="int64"),
                 "shard_id": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {
                "doc_id": b["__key"].to_numpy(np.int64) & ((1 << 33) - 1),
                "n_tokens": b["n_tokens"],
                "shard_id": b["shard_id"],
            }
        )

    return packed.map_batches(_unkey, batch_format="pandas")


def q_customer_linkage(sf_dir: str):
    """Record-linkage scoring over lev<=1 name-blocked customer
    pairs: integer Fellegi-Sunter-style agreement weights on nation
    and market segment on top of the FastSS candidate block. The
    joins move only candidate pairs + the keyed entity table.
    Hash-exact vs the literal levenshtein cross-join with CASE
    weights."""
    from ..stages.fuzzy import record_linkage

    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_name", "c_nationkey", "c_mktsegment"]
    )
    return record_linkage(
        cust, "c_name",
        [("c_nationkey", 8, -3), ("c_mktsegment", 5, -2)],
        name_weight=12,
    )


def q_retrieval_hard_negatives(sf_dir: str):
    """Hard-negative mining for retrieval training: each query doc's
    top-10 cosine neighbors EXCLUDING candidates from the query's own
    source (same-source near-positives must not occupy negative
    slots). The exclusion is attribute-based — one source value per
    query rides the broadcast query matrix; candidates are masked
    inside the scan BEFORE top-k selection, so no post-filter re-rank
    pass. Hash-exact vs the windowed SQL twin."""
    from ..stages.relational import cogroup_join
    from ..stages.similarity import knn_brute

    qids, qmat = _query_vectors(sf_dir)
    # one source value per query: a k-row point lookup, not a scan
    src = pd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "source"])
    src = src[src["doc_id"].isin(qids)]
    attr_vals = dict(zip(src["doc_id"].astype(int), src["source"]))

    emb = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "source"])

    def _key(b: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": pc.cast(b["doc_id"], pa.int64()), "source": b["source"]}
        )

    cand = cogroup_join(
        emb, docs.map_batches(_key, batch_format="pyarrow"), ["vec_id"]
    )
    out = knn_brute(
        cand, qids, qmat, k=KNN_K, exclude_attr=("source", attr_vals)
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "query_id": pc.cast(b["query_id"], pa.int64()),
                "neg_id": pc.cast(b["vec_id"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_events_zonemap_scan(sf_dir: str):
    """Zone-map pruned range scan: cluster events by user_id into a
    fresh per-run layout (atomic build), then serve user_id∈[40,80]
    opening only the files whose footer min/max intersects — the
    generic file-level pruning path (the IVF index's centroid pruning,
    generalized to any orderable column). Hash-exact vs a plain
    BETWEEN filter."""
    import tempfile

    from ..sources.zonemap import read_pruned, write_clustered

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_id", "user_id"])
    out_dir = os.path.join(
        tempfile.mkdtemp(prefix="zonemap_events_"), "layout"
    )
    write_clustered(ev, "user_id", out_dir, num_files=16)
    ds, _frac = read_pruned(out_dir, 40, 80)

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
            }
        )

    return ds.map_batches(_proj, batch_format="pyarrow")


def q_doc_length_drift(sf_dir: str):
    """Distribution-drift monitor between two corpus slices (sources
    src0-src9 vs src10-src19) over 200-char length bins: per-bin
    counts, per-mille rates and |Δ| (integer L1 drift — the
    accept/reject signal for a new crawl snapshot). One shared pass
    per side + one bin-keyed reduce. Hash-exact vs a full-outer
    histogram join."""
    from ..stages.drift import histogram_drift

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["source", "n_chars"]
    )

    def _side(which: str):
        lo, hi = (0, 9) if which == "a" else (10, 19)

        def _f(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame({"bucket": pd.Series([], dtype="int64")})
            idx = b["source"].str.slice(3).astype(int)
            sel = (idx >= lo) & (idx <= hi)
            return pd.DataFrame(
                {"bucket": (b.loc[sel, "n_chars"].to_numpy(np.int64) // 200)}
            )

        return _f

    a = docs.map_batches(_side("a"), batch_format="pandas")
    b = docs.map_batches(_side("b"), batch_format="pandas")
    return histogram_drift(a, b, "bucket")


def q_customer_k_anon(sf_dir: str):
    """K-anonymity suppression (k=8) on the (nation, segment)
    quasi-identifier: combinations naming fewer than 8 customers are
    masked before release. One distinct-combination count + a gated
    broadcast/join mask. Hash-exact vs a window-count CASE twin."""
    from ..stages.validate import k_anonymize

    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_mktsegment"]
    )

    def _s(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pc.cast(b["c_custkey"], pa.int64()),
                "c_nationkey": pc.cast(b["c_nationkey"], pa.string()),
                "c_mktsegment": b["c_mktsegment"],
            }
        )

    schema = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_nationkey", pa.string()),
            ("c_mktsegment", pa.string()),
        ]
    )
    return k_anonymize(
        cust.map_batches(_s, batch_format="pyarrow"),
        ["c_nationkey", "c_mktsegment"],
        k=8,
        out_schema=schema,
    )


WEIGHTED_SAMPLE_CAP = 400  # tokens; p(keep) = min(n_tokens, cap)/cap


def q_doc_weighted_sample(sf_dir: str):
    """Length-proportional deterministic subsample: keep each doc
    with probability min(n_tokens, 400)/400 off the shared Lehmer
    stream — the importance-weighted resampling step (DSIR-shaped)
    made layout-independent and integer-exact. Map-only, zero
    shuffle. Hash-exact vs the same threshold inequality in SQL."""
    from ..stages.relational import bernoulli_weighted_sample
    from ..stages.text_analysis import token_counts

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return bernoulli_weighted_sample(
        token_counts(docs), "doc_id", "n_tokens", weight_cap=WEIGHTED_SAMPLE_CAP
    )


def q_media_phash_dedup(sf_dir: str):
    """Perceptual image near-dup: dHash signatures from the REAL PNG
    decode actor pool over the media table with planted byte-different
    re-encodings, resolved through the shared 4x16 Hamming band
    engine. Hash-exact vs :func:`_phash_dedup_oracle_sql` (the dHash
    chain over the MT19937 pixel stream + the simhash band twin); the
    planted-edition mapping also pinned exactly by pytest."""
    from ..stages.multimodal import phash_media_dedup, synth_media_with_editions

    return phash_media_dedup(synth_media_with_editions(sf_dir))


def q_events_target_encoding(sf_dir: str):
    """Leave-one-out target encoding of event_type against the event
    value (integer cents): the leakage-safe categorical feature as an
    exact (sum, count) pair — one distinct-key sum + a gated broadcast
    apply. Hash-exact vs window sums minus self."""
    from ..stages.relational import target_encode_loo

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def _pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "event_type": b["event_type"],
                "cents": _cents(b["value"]),
            }
        )

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("cents", pa.int64()),
            ("loo_sum", pa.int64()),
            ("loo_cnt", pa.int64()),
        ]
    )
    return target_encode_loo(
        ev.map_batches(_pre, batch_format="pyarrow"), "event_type", "cents", schema
    )


def q_media_vad_segments(sf_dir: str):
    """Energy-threshold voice-activity segments over the REAL decoded
    WAV corpus (stdlib PCM codec in the actor pool): integer per-frame
    energies, runs merged vectorized. Hash-exact: the synthesized tone
    is a pure sine, so the SQL twin regenerates the exact int16
    samples and re-derives the segments — a codec roundtrip regression
    breaks the hash; tone/silence boundaries also pinned by pytest."""
    from ..stages.multimodal import synth_media_from_documents, vad_segments

    media = synth_media_from_documents(sf_dir, media_type="wav")
    return vad_segments(media)


STRAT_SAMPLE_N = 20


def q_events_stratified_sample(sf_dir: str):
    """Exact-n-per-stratum deterministic sample (eval-set
    construction): per event type, the 20 rows with the smallest
    Lehmer rank (tie-broken by id) — layout-independent, no RNG
    state. One group-keyed reduce with a map-side per-group top-n
    combiner. Hash-exact vs a row_number window twin."""
    from ..stages.infer import bucketed_reduce

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_id", "event_type"])
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("event_type", pa.string()), ("rank", pa.int64())]
    )
    n = STRAT_SAMPLE_N

    def _rank_topn(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "event_type": pd.Series([], dtype="object"),
                 "rank": pd.Series([], dtype="int64")}
            )
        out = pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(np.int64),
                "event_type": b["event_type"],
                "rank": ((b["event_id"].to_numpy(np.int64) % _LEHMER_MOD)
                         * _LEHMER_MULT) % _LEHMER_MOD,
            }
        )
        out = out.sort_values(["rank", "event_id"], kind="stable")
        return out.groupby("event_type", sort=False).head(n)

    return bucketed_reduce(
        ev, ["event_type"],
        lambda g: g.sort_values(["rank", "event_id"], kind="stable")
                   .groupby("event_type", sort=False).head(n),
        out_schema,
        combiner=_rank_topn,
    )


def q_customer_entity_clusters(sf_dir: str):
    """Entity-resolution clusters: record-linkage scores thresholded
    (>= 15: name lev<=1 AND nation agrees) then resolved to canonical
    representatives through the shared count-gated component engine —
    the end-to-end dedup-entities contract (block → score → cluster).
    Rows-only (iterative CC); planted-chain behavior pinned by
    pytest."""
    from ..stages.dedup import resolve_dup_mapping
    from ..stages.fuzzy import record_linkage

    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_name", "c_nationkey", "c_mktsegment"]
    )
    scored = record_linkage(
        cust, "c_name", [("c_nationkey", 8, -3), ("c_mktsegment", 5, -2)],
        name_weight=12,
    )

    def _ids(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "name_a" not in b.columns:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64")}
            )
        k = b[b["score"] >= 15]
        # Customer#%09d -> numeric id (stable, reversible)
        return pd.DataFrame(
            {
                "id_a": k["name_a"].str.slice(9).astype("int64"),
                "id_b": k["name_b"].str.slice(9).astype("int64"),
            }
        )

    pairs = scored.map_batches(_ids, batch_format="pandas")
    return resolve_dup_mapping(pairs, "c_custkey")


def q_retrieval_training_pairs(sf_dir: str):
    """Contrastive training pairs for embedding models: positives
    from the MinHash near-dup mapping (label 1), hard negatives from
    the source-excluded top-k miner (label 0) — the composite that
    turns the dedup + retrieval families into actual training data.
    Hash-exact: the SQL twin is the union of both parent twins
    (ideal-Jaccard rep mapping + cosine top-k miner) verbatim."""
    from ..stages.dedup import minhash_lsh_dedup

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    pos = minhash_lsh_dedup(docs).map_batches(
        lambda b: pd.DataFrame(
            {
                "anchor_id": b["dup_of"].to_numpy(np.int64),
                "other_id": b["doc_id"].to_numpy(np.int64),
                "label": np.ones(len(b), dtype=np.int64),
            }
        )
        if len(b)
        else pd.DataFrame(
            {"anchor_id": pd.Series([], dtype="int64"),
             "other_id": pd.Series([], dtype="int64"),
             "label": pd.Series([], dtype="int64")}
        ),
        batch_format="pandas",
    )
    neg = q_retrieval_hard_negatives(sf_dir).map_batches(
        lambda b: pa.table(
            {
                "anchor_id": pc.cast(b["query_id"], pa.int64()),
                "other_id": pc.cast(b["neg_id"], pa.int64()),
                "label": pa.array([0] * len(b), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    schema = pa.schema(
        [("anchor_id", pa.int64()), ("other_id", pa.int64()), ("label", pa.int64())]
    )
    from ..stages.infer import normalize_blocks

    return normalize_blocks(pos.union(neg), schema)


def q_events_hourly_profile(sf_dir: str):
    """Seasonal (hour-of-day) profile + per-event residual in exact
    integer cross-multiplied form: residual_num = cents*cnt_h - sum_h
    (positive → above the hour's mean) — the detrending feature for
    time-series anomaly work without a single float. 24-key sums
    broadcast map-side. Hash-exact vs window sums per hour."""
    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_id", "ts", "value"])

    def _pre(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        hour = pc.cast(
            pc.divide(
                pc.subtract(
                    us,
                    pc.multiply(pc.divide(us, 86_400_000_000), 86_400_000_000),
                ),
                3_600_000_000,
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "hour": hour,
                "cents": _cents(b["value"]),
            }
        )

    pre = ev.map_batches(_pre, batch_format="pyarrow")
    from ..stages.relational import grouped_sums

    prof = grouped_sums(pre, ["hour"], {"sum_cents": "cents"}, count_name="cnt")
    p = prof.to_pandas()  # 24 rows
    sums = dict(zip(p["hour"].astype(int), p["sum_cents"].astype(int)))
    cnts = dict(zip(p["hour"].astype(int), p["cnt"].astype(int)))
    ref = ray.put((sums, cnts))

    def _resid(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "hour": pd.Series([], dtype="int64"),
                 "cents": pd.Series([], dtype="int64"),
                 "residual_num": pd.Series([], dtype="int64"),
                 "cnt_h": pd.Series([], dtype="int64")}
            )
        s, c = ray.get(ref)
        h = b["hour"].astype(int)
        cnt_h = h.map(c).astype("int64")
        sum_h = h.map(s).astype("int64")
        out = b.copy()
        out["residual_num"] = out["cents"].astype("int64") * cnt_h - sum_h
        out["cnt_h"] = cnt_h
        return out

    return pre.map_batches(_resid, batch_format="pandas")


def q_embedding_curation(sf_dir: str):
    """Vector-side curation composite: hash-embed docs -> SemDeDup ->
    PQ-encode the survivors to 8-byte codes (the compressed index a
    100-TB retrieval system stores). Hash-exact END TO END vs
    :func:`_embedding_curation_oracle_sql`; the code bytes project to
    hex (the driver compare hashes strings, not blobs). Stage
    behaviors also pinned by their own tests."""
    from .curation import curate_embeddings

    out = curate_embeddings(_docs(sf_dir))

    def _hex(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "code_hex": pa.array(
                    [bytes(x).hex() for x in b["code"].to_pylist()], pa.string()
                ),
            }
        )

    return out.map_batches(_hex, batch_format="pyarrow")


def q_doc_token_shards(sf_dir: str):
    """End-to-end tokenized-shard materialization: vocab build ->
    uint32 id encoding -> distributed prefix-sum packing -> one .bin
    file per shard (atomic), docs kept whole. Returns the loader
    manifest (paths dropped: they live under a fresh /tmp dir per
    run). Hash-exact: per-doc token counts are vocab-independent
    (OOV encodes as <unk>) so the manifest reduces to the
    doc_pack_shards placement formula; the byte-level roundtrip stays
    pinned by pytest."""
    import tempfile

    from ..stages.packing import write_token_shards
    from ..stages.vocab import encode_token_ids, vocab_build

    docs = _docs(sf_dir)
    vocab = vocab_build(docs, min_count=2)
    ids = encode_token_ids(docs, vocab)
    out_dir = tempfile.mkdtemp(prefix="kgray_shards_")
    manifest = write_token_shards(ids, out_dir, budget=4096)
    return manifest.select_columns(["shard_id", "n_docs", "n_tokens"])


def q_events_decayed(sf_dir: str):
    """Freshness-decayed engagement score per user: each event adds
    cents // 2^(hours behind corpus max) — integer floor-shift decay,
    hash-exact vs the SQL twin (float EWMA never is)."""
    from ..stages.sessions import decayed_counts

    events = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "ts", "value"]
    )
    return decayed_counts(events)


def q_embedding_centroids(sf_dir: str):
    """Per-label embedding centroid sufficient statistics (long form:
    grp, dim, exact integer sum of floor(vec*2^20), n) — the
    nearest-centroid / drift primitives; floor (not round) because
    DuckDB and numpy agree on floor for every double."""
    from ..stages.clustering import grouped_centroid_sums

    emb = read_parquet_clean(
        _t(sf_dir, "embeddings"), columns=["label", "embedding"]
    )
    return grouped_centroid_sums(emb, "label")


def q_source_distinctive_terms(sf_dir: str):
    """Each source's top-5 distinctive tokens by exact integer lift
    (c-TF-IDF-style 'what sets this source apart') — raw count top-k
    can't give this because corpus-common words win it."""
    from ..stages.vocab import distinctive_terms_per_group

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["source", "text"])
    return distinctive_terms_per_group(docs, "source", k=5, min_token_count=20)


def q_user_gini(sf_dir: str):
    """Per-user Gini impurity (integer thousandths) of the event-type
    mix — a behavioral-diversity profile, exact where entropy (log)
    could never hash-match SQL."""
    from ..stages.profile import categorical_gini

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    return categorical_gini(ev, "user_id", "event_type")


COLLOC_MIN, COLLOC_K = 5, 50


def q_doc_collocations(sf_dir: str):
    """Collocation mining: top-50 token pairs by distinct-doc
    co-occurrence with exact integer association lift (lift_milli =
    n_ab*N*1000 // (n_a*n_b)) — the PMI-style 'related terms' signal;
    reuses the basket-keyed cooccur machinery with string items."""
    from ..stages.cooccur import cooccur_lift

    def _explode(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.lower().str.findall(r"\w+")
        toks.index = b["doc_id"].to_numpy(np.int64)
        ex = toks.explode().dropna()
        return pd.DataFrame(
            {"doc_id": ex.index.to_numpy(np.int64),
             "token": ex.to_numpy(object)}
        )

    tokens = _docs(sf_dir).map_batches(_explode, batch_format="pandas")
    return cooccur_lift(
        tokens, "doc_id", "token",
        min_count=COLLOC_MIN, top_k=COLLOC_K, item_type=pa.string(),
    )


PHRASE_TOP_K = 20


def q_doc_phrase_hits(sf_dir: str):
    """Positional phrase postings: the corpus-wide top-20 adjacent-token
    bigrams (count desc, bigram asc) become the phrase set; output is
    each document's per-phrase occurrence count — the exact-phrase-query
    index primitive. Bigram counting is one bucketed exchange; the
    20-row phrase set is a bounded driver residue; the posting pass is
    map-only with the set broadcast."""
    from ..stages.relational import topk_dataset
    from ..stages.vocab import bigram_counts, phrase_postings

    top = topk_dataset(
        bigram_counts(_docs(sf_dir)), ["n", "bigram"], PHRASE_TOP_K,
        descending=[True, False],
    ).to_pandas()
    return phrase_postings(_docs(sf_dir), list(top["bigram"]))


ATTRIBUTION_WINDOW_US = 6 * 3600 * 1_000_000


def q_events_attribution(sf_dir: str):
    """Multi-touch linear attribution: each purchase's cents split
    equally over the user's non-purchase events in the preceding 6 h,
    remainder to the last touch (exact to the cent); purchases with no
    touches land in a 'direct' row. Hash-exact vs a window-function
    SQL twin."""
    from ..stages.sessions import linear_attribution

    ev = read_parquet_clean(
        _t(sf_dir, "events"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    return linear_attribution(ev, window_us=ATTRIBUTION_WINDOW_US)


def _nation_trade_edges(sf_dir: str) -> "ray.data.Dataset":
    """Directed nation 'trade-winner' graph: edge a -> b (a != b) iff
    the revenue cents flowing from a-customers to b-suppliers STRICTLY
    exceeds the reverse flow (ties/no-flow -> no edge). The two large
    fact sides join distributed on orderkey with revenue partials
    pre-aggregated below the join; supplier/customer nation lookups
    broadcast (dimensions); the 625-row-bounded flow matrix pairs with
    its own transpose via one outer cogroup join — no driver residue.

    Carry note: ``rev_ab``/``rev_ba`` ride the outer join as float64
    for unmatched rows (see ``cogroup_join``'s 64-bit carry warning) —
    exact while pair revenue stays under 2^53 cents (~$90T/pair)."""
    import ray as _ray

    from ..stages.infer import bucketed_reduce, default_num_partitions

    sup = pd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    s_ref = _ray.put(dict(zip(sup["s_suppkey"].astype(int), sup["s_nationkey"].astype(int))))
    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    c_ref = _ray.put(dict(zip(cust["c_custkey"].astype(int), cust["c_nationkey"].astype(int))))

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_extendedprice"]
    )

    def _li_part(b: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(s_ref) if isinstance(s_ref, _ray.ObjectRef) else s_ref
        part = pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype("int64"),
                "snat": b["l_suppkey"].map(m).astype("int64"),
                "rev": (b["l_extendedprice"] * 100).round().astype("int64"),
            }
        )
        return part.groupby(["l_orderkey", "snat"], as_index=False)["rev"].sum()

    li_part = li.map_batches(_li_part, batch_format="pandas")
    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    ).rename_columns({"o_orderkey": "l_orderkey"})
    joined = cogroup_join(
        li_part, orders, on=["l_orderkey"], how="inner",
        coalesce=default_num_partitions(),
    )

    def _cnat(b: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(c_ref) if isinstance(c_ref, _ray.ObjectRef) else c_ref
        part = pd.DataFrame(
            {
                "a": b["o_custkey"].map(m).astype("int64"),
                "b": b["snat"].astype("int64"),
                "rev": b["rev"].astype("int64"),
            }
        )
        return part.groupby(["a", "b"], as_index=False)["rev"].sum()

    flow_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("rev", pa.int64())])

    def _sum_flow(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a", "b"], sort=False, as_index=False)["rev"].sum()

    flows = bucketed_reduce(
        joined.map_batches(_cnat, batch_format="pandas"),
        ["a", "b"], _sum_flow, flow_schema, combiner=_sum_flow,
    ).materialize()

    fwd = flows.map_batches(
        lambda t: t.rename_columns(["a", "b", "rev_ab"]), batch_format="pyarrow"
    )
    rev = flows.map_batches(
        lambda t: pa.table({"a": t["b"], "b": t["a"], "rev_ba": t["rev"]}),
        batch_format="pyarrow",
    )
    paired = cogroup_join(
        fwd, rev, on=["a", "b"], how="left_outer",
        left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()), ("rev_ab", pa.int64())]),
        right_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()), ("rev_ba", pa.int64())]),
    )

    def _winners(b: pd.DataFrame) -> pd.DataFrame:
        ba = b["rev_ba"].fillna(0).astype("int64")
        keep = b[(b["a"] != b["b"]) & (b["rev_ab"].astype("int64") > ba)]
        return pd.DataFrame(
            {
                "src": keep["a"].astype(int).astype(str).to_numpy(object),
                "dst": keep["b"].astype(int).astype(str).to_numpy(object),
            }
        )

    return paired.map_batches(_winners, batch_format="pandas")


def q_nation_scc(sf_dir: str):
    """Strongly connected components of the directed nation
    trade-winner graph: two shared-sweep BFS passes (fwd + reversed) +
    one co-reachability semi-join + grouped lexicographic min — the
    distributed FW-BW SCC shape, hash-exact vs a double recursive-CTE
    transitive-closure twin."""
    import pyarrow.parquet as _pq

    from ..stages.graph_algos import scc_labels

    nat = _pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey"]).to_pandas()
    nodes = sorted(str(int(k)) for k in nat["n_nationkey"])
    return scc_labels(_nation_trade_edges(sf_dir), nodes)


GRAM_SCALE = 1 << 10


def q_embedding_gram(sf_dir: str):
    """Exact integer Gram (second-moment) matrix of the embedding
    column, long upper-triangle form — the PCA/covariance sufficient
    statistic; floor-quantized so the double-LATERAL SQL twin is
    hash-exact."""
    from ..stages.clustering import embedding_gram

    emb = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["embedding"])
    return embedding_gram(emb, scale=GRAM_SCALE)


def q_doc_incremental_dedup(sf_dir: str):
    """Dedup a 'new crawl batch' (doc_id % 3 != 0) against the stored
    snapshot (doc_id % 3 == 0) by exact text hash: one distinct-hash
    reduce on the snapshot + one hash-keyed anti join — tonight's
    batch never re-dedups the snapshot."""
    from ..stages.dedup import exact_dedup_against

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    new = docs.filter(lambda r: r["doc_id"] % 3 != 0)
    ref = docs.filter(lambda r: r["doc_id"] % 3 == 0)
    return exact_dedup_against(new, ref)


PACK_MANIFEST_BUDGET = 2048


def q_doc_pack_manifest(sf_dir: str):
    """Shard-packing placement manifest: shard id AND the within-shard
    token offset each document starts at (straddling allowed) — the
    full contract a tokenized-shard writer consumes. Same distributed
    prefix-sum machinery as doc_pack_shards."""
    from ..stages.packing import pack_shards
    from ..stages.text_analysis import token_counts

    toks = token_counts(_docs(sf_dir)).select_columns(["doc_id", "n_tokens"])
    return pack_shards(
        toks, budget=PACK_MANIFEST_BUDGET, with_offset=True
    )


HARMONIC_SCALE = 1_000_000


def q_graph_harmonic(sf_dir: str):
    """Sampled harmonic centrality from the 5 region nodes — exact
    integer sum of scale//hop per reaching source, hash-exact vs the
    recursive-CTE BFS twin (4th recursive SQL oracle)."""
    import pyarrow.parquet as pq

    from ..stages.graph_algos import harmonic_centrality

    regions = pq.read_table(_t(sf_dir, "region"), columns=["r_regionkey"]).to_pandas()
    sources = [f"r{int(k)}" for k in sorted(regions["r_regionkey"])]
    return harmonic_centrality(
        _cnrs_edges(sf_dir), sources, max_hops=3, scale=HARMONIC_SCALE
    )


def q_graph_betweenness(sf_dir: str):
    """Sampled betweenness (Brandes dependency accumulation from the
    25 nation nodes) over the customer->nation->region graph —
    fixed-point integers, driver twin under the edge gate with a
    bit-equal distributed path. Hash-exact vs
    :func:`_betweenness_oracle_sql`: the floored integer dependency
    makes every accumulation exact, and max_hops bounds the BFS, so
    both sweeps unroll into per-level CTE stages; also pinned vs
    networkx in pytest."""
    from ..stages.graph_algos import sampled_betweenness

    sources = [f"n{i}" for i in range(25)]
    return sampled_betweenness(_cnr_edges(sf_dir), sources, max_hops=6)


def q_url_best_rep(sf_dir: str):
    """Best-representative selection over canonical-URL dup clusters:
    instead of url_dedup's keep-min-id, each cluster keeps its LONGEST
    member (n_chars desc, doc_id asc) — the real curation rule for
    crawl revisits. Clusters come from the actual normalization pass;
    the SQL twin partitions on the equivalent synthesis key, so a
    normalization regression breaks the hash."""
    from ..stages.dedup import rerank_cluster_reps
    from ..stages.infer import bucketed_reduce
    from ..stages.urlnorm import url_normalize

    base = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "n_chars"]
    )

    def _synth(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy(np.int64)
        k = d % 50

        def _pick(mask: np.ndarray, a: str, b_: str) -> pd.Series:
            return pd.Series(np.where(mask, a, b_), dtype=object)

        scheme = _pick(d % 3 == 0, "HTTP", "http")
        host = _pick(d % 2 == 1, "Example.COM", "example.com")
        port = _pick(d % 5 == 0, ":80", "")
        ks = pd.Series(k).astype(str).astype(object)
        path = "/p/" + ks + _pick(d % 7 == 0, "/", "")
        q10 = pd.Series(k % 10).astype(str).astype(object)
        query = ("?b=2&a=" + q10).where(pd.Series(d % 2 == 0), "?a=" + q10 + "&b=2")
        frag = _pick(d % 11 == 0, "#s", "")
        url = scheme + "://" + host + port + path + query + frag
        return pd.DataFrame({"doc_id": d, "url": url.astype(object)})

    normed = url_normalize(
        base.select_columns(["doc_id"]).map_batches(_synth, batch_format="pandas")
    )

    map_schema = pa.schema([("doc_id", pa.int64()), ("dup_of", pa.int64())])

    def _to_mapping(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["dup_of"] = g.groupby("url_norm", sort=False)["doc_id"].transform("min")
        g = g[g["doc_id"] != g["dup_of"]]
        return g[["doc_id", "dup_of"]].astype("int64")

    mapping = bucketed_reduce(
        normed.select_columns(["doc_id", "url_norm"]),
        ["url_norm"],
        _to_mapping,
        map_schema,
    )
    quality = base.map_batches(
        lambda b: pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"),
             "score": b["n_chars"].astype("int64")}
        ),
        batch_format="pandas",
    )
    return rerank_cluster_reps(mapping, quality, score_col="score")


def q_knn_pq(sf_dir: str):
    """PQ-compressed ANN: train (m=8, k=16) codebooks, encode every
    vector to 8 bytes (32x smaller than float32), ADC-scan with
    per-query lookup tables. Approximate by construction — the exact
    surface is the calibrated acceptance table vs the ``knn_cosine``
    ground truth (:func:`_ann_acceptance`); ADC==brute-over-
    reconstructions is additionally pinned by pytest."""
    from ..stages.pq import pq_encode, pq_search, pq_train

    qids, qmat = _query_vectors(sf_dir)
    emb = read_parquet_clean(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    books = pq_train(emb, m=8, k=16, iters=4)
    codes = pq_encode(emb, books)
    out = pq_search(codes, books, qids, qmat, k=KNN_K)
    return _ann_acceptance(
        out.select_columns(["query_id", "vec_id"]), sf_dir, _PQ_CHECKS
    )


def q_revenue_cube(sf_dir: str):
    """Full GROUP BY CUBE lattice (segment x priority) over
    orders⋈customer revenue cents — one raw-row shuffle at the finest
    grouping set, every other set re-reduces that residue."""
    from ..stages.relational import cogroup_join
    from ..stages.rollup import cube_aggregate

    def _ord(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": pc.cast(b["o_custkey"], pa.int64()),
                "o_orderpriority": b["o_orderpriority"],
                "price_cents": _cents(b["o_totalprice"]),
            }
        )

    def _cust(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": pc.cast(b["c_custkey"], pa.int64()),
                "c_mktsegment": b["c_mktsegment"],
            }
        )

    orders = read_parquet_clean(
        _t(sf_dir, "orders"),
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    ).map_batches(_ord, batch_format="pyarrow")
    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(_cust, batch_format="pyarrow")
    joined = cogroup_join(orders, cust, ["custkey"])
    return cube_aggregate(
        joined, ["c_mktsegment", "o_orderpriority"], "price_cents",
        out_name="total",
    )


def q_doc_nb_classify(sf_dir: str):
    """Train-then-score multinomial text classifier (source label from
    text) — integer rational weights (ln-free Laplace NB shape), so the
    distributed scores hash-match the pure-SQL twin that recomputes the
    same training counts and weights."""
    from ..stages.classify import nb_self_classify

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "source", "text"]
    )
    return nb_self_classify(docs, class_col="source")


def _nb_oracle_sql() -> str:
    from ..stages.classify import SCALE as _NB_SCALE

    return f"""
        WITH toks AS (
          SELECT doc_id, source AS class,
                 unnest(regexp_extract_all(lower(coalesce(text,'')), '\\w+')) AS token
          FROM documents
        ),
        counts AS (
          SELECT class, token, CAST(count(*) AS BIGINT) AS n
          FROM toks GROUP BY class, token
        ),
        totals AS (
          SELECT class, CAST(sum(n) AS BIGINT) AS total FROM counts GROUP BY class
        ),
        vsize AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM toks),
        cls AS (
          SELECT source AS class, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source
        ),
        params AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
        cinfo AS (
          SELECT c.class,
                 CAST((CAST({_NB_SCALE} AS BIGINT) * c.n_docs) // p.n_total
                      AS BIGINT) AS prior,
                 CAST(CAST({_NB_SCALE} AS BIGINT)
                      // (COALESCE(t.total, 0) + v.v) AS BIGINT) AS dflt
          FROM cls c
          LEFT JOIN totals t ON c.class = t.class
          CROSS JOIN vsize v CROSS JOIN params p
        ),
        weights AS (
          SELECT cn.class, cn.token,
                 CAST((CAST({_NB_SCALE} AS BIGINT) * (cn.n + 1))
                      // (t.total + v.v) AS BIGINT) AS w
          FROM counts cn
          JOIN totals t ON cn.class = t.class
          CROSS JOIN vsize v
        ),
        tok_scores AS (
          SELECT t.doc_id, ci.class,
                 CAST(sum(COALESCE(w.w, ci.dflt)) AS BIGINT) AS s
          FROM toks t
          CROSS JOIN cinfo ci
          LEFT JOIN weights w ON w.class = ci.class AND w.token = t.token
          GROUP BY t.doc_id, ci.class
        ),
        scores AS (
          SELECT d.doc_id, ci.class,
                 CAST(ci.prior + COALESCE(ts.s, 0) AS BIGINT) AS score
          FROM documents d
          CROSS JOIN cinfo ci
          LEFT JOIN tok_scores ts
            ON ts.doc_id = d.doc_id AND ts.class = ci.class
        )
        SELECT doc_id, class AS pred_class, score
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, class ASC) AS rn
          FROM scores
        ) WHERE rn = 1
    """


WINSOR_Q_LO, WINSOR_Q_HI = 0.05, 0.95


def q_lineitem_winsorized(sf_dir: str):
    """Per-returnflag winsorized revenue: extendedprice cents clamped
    to the group's exact discrete [p05, p95] before summing — the
    robust aggregate that a handful of corrupted crawl records or
    fat-finger prices can't move. All-integer, hash-exact vs a
    quantile_disc + least/greatest SQL twin."""
    from ..stages.quantiles import winsorized_group_stats

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_returnflag", "l_extendedprice"]
    )

    def _pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {"l_returnflag": b["l_returnflag"], "cents": _cents(b["l_extendedprice"])}
        )

    return winsorized_group_stats(
        li.map_batches(_pre, batch_format="pyarrow"),
        "l_returnflag",
        "cents",
        q_lo=WINSOR_Q_LO,
        q_hi=WINSOR_Q_HI,
    )


def q_events_autocorr(sf_dir: str):
    """Per-event-type lagged autocovariance sufficient sums over the
    hourly volume series (burstiness / self-similarity probe) — one
    exchange of (type, hour, partial count); the per-key residue is
    the covered hour span, never rows; hash-exact vs a self-join SQL
    twin."""
    from ..stages.drift import autocorr_sums

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def _hour(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        return pa.table(
            {
                "event_type": b["event_type"],
                "hour": pc.divide(us, 3_600_000_000),
            }
        )

    return autocorr_sums(
        ev.map_batches(_hour, batch_format="pyarrow"), "event_type", "hour"
    )


def q_user_cadence(sf_dir: str):
    """Per-user inter-arrival cadence profile (bot/scraper signal:
    integer gap min/sum/sum-of-squares + duplicate-timestamp count) —
    map-side distinct (user, ts, count) partials, one user-keyed
    reduce; hash-exact vs a lag-window SQL twin."""
    from ..stages.sessions import cadence_profile

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "ts"])
    return cadence_profile(ev)


def q_doc_readability(sf_dir: str):
    """Integer-exact Flesch reading-ease per document (regex-parity
    word/sentence/vowel-group counts; truncating fixed-point formula)
    — map-only, zero shuffles; hash-exact vs a regexp_extract_all SQL
    twin."""
    from ..stages.text_analysis import readability

    return readability(_docs(sf_dir))


def q_orders_mrr(sf_dir: str):
    """Per-segment ranking-quality eval (hit@10 + integer MRR sums):
    each customer's orders ranked by (price desc, orderkey asc),
    relevant = urgent priority — one partitioned hash join + one
    query-keyed shuffle + a tiny group sum; hash-exact vs a
    row_number() SQL twin."""
    from ..stages.relational import cogroup_join
    from ..stages.retrieval import ranking_metrics

    orders = read_parquet_clean(
        _t(sf_dir, "orders"),
        columns=["o_custkey", "o_orderkey", "o_totalprice", "o_orderpriority"],
    )

    def _pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "o_orderkey": b["o_orderkey"],
                "price_cents": _cents(b["o_totalprice"]),
                "relevant": pc.equal(b["o_orderpriority"], "1-URGENT"),
            }
        )

    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: pa.table(
            {"o_custkey": b["c_custkey"], "c_mktsegment": b["c_mktsegment"]}
        ),
        batch_format="pyarrow",
    )
    joined = cogroup_join(
        orders.map_batches(_pre, batch_format="pyarrow"),
        cust,
        ["o_custkey"],
    )
    return ranking_metrics(
        joined,
        group_col="c_mktsegment",
        query_col="o_custkey",
        order_col="price_cents",
        tie_col="o_orderkey",
        relevant_col="relevant",
        k=10,
    )


LATE_DAYS_US = 90 * 86_400_000_000


def q_supplier_waiting(sf_dir: str):
    """TPC-H Q21-shaped 'lone late shipper': for finished orders with
    >= 2 distinct suppliers where EXACTLY ONE supplier shipped > 90
    days after the order date, count such orders per that supplier —
    the semi/anti-join-in-disguise decision-support shape, done as one
    partitioned hash join + one order-keyed reduce + one tiny supplier
    sum; hash-exact vs a count(DISTINCT CASE) SQL twin."""
    from ..stages.infer import bucketed_reduce
    from ..stages.relational import cogroup_join

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = read_parquet_clean(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    )

    def _us(col) -> pa.ChunkedArray:
        # unit-normalize first: a ns-unit source would otherwise land
        # as nanoseconds in the int64 and shift the 90-day threshold
        return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())

    def _o(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": b["o_orderkey"],
                "odate_us": _us(b["o_orderdate"]),
            }
        )
        return t.filter(pc.equal(b["o_orderstatus"], "F"))

    def _l(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "ship_us": _us(b["l_shipdate"]),
            }
        )

    joined = cogroup_join(
        li.map_batches(_l, batch_format="pyarrow"),
        orders.map_batches(_o, batch_format="pyarrow"),
        ["l_orderkey"],
        coalesce=16,
    )

    per_order_schema = pa.schema([("l_suppkey", pa.int64())])

    def _per_order(g: pd.DataFrame) -> pd.DataFrame:
        late = g["ship_us"].astype("int64") > g["odate_us"].astype("int64") + LATE_DAYS_US
        agg = pd.DataFrame(
            {
                "l_orderkey": g["l_orderkey"],
                "l_suppkey": g["l_suppkey"].astype("int64"),
                "late": late,
            }
        )
        ns = agg.groupby("l_orderkey")["l_suppkey"].nunique()
        late_rows = agg[agg["late"]]
        nl = late_rows.groupby("l_orderkey")["l_suppkey"].nunique()
        the_late = late_rows.groupby("l_orderkey")["l_suppkey"].min()
        ok = ns.index[(ns >= 2) & (nl.reindex(ns.index).fillna(0) == 1)]
        return pd.DataFrame({"l_suppkey": the_late.loc[ok].astype("int64")})

    hits = bucketed_reduce(joined, ["l_orderkey"], _per_order, per_order_schema)

    count_schema = pa.schema([("s_suppkey", pa.int64()), ("numwait", pa.int64())])

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "l_suppkey" not in b.columns:
            return pd.DataFrame(
                {
                    "l_suppkey": pd.Series([], dtype="int64"),
                    "numwait": pd.Series([], dtype="int64"),
                }
            )
        if "numwait" in b.columns:
            return b.groupby("l_suppkey", as_index=False)["numwait"].sum()
        vc = b.groupby("l_suppkey", sort=False).size()
        return pd.DataFrame(
            {
                "l_suppkey": vc.index.to_numpy("int64"),
                "numwait": vc.to_numpy("int64"),
            }
        )

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("l_suppkey", as_index=False)["numwait"].sum()
        return pd.DataFrame(
            {
                "s_suppkey": s["l_suppkey"].astype("int64"),
                "numwait": s["numwait"].astype("int64"),
            }
        )

    return bucketed_reduce(
        hits, ["l_suppkey"], _sum, count_schema, combiner=_comb
    )


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17-shaped correlated-aggregate filter: revenue of
    lineitems whose quantity is below 20% of their part's average
    (integerized ``5*q*n < sum_q`` so the comparison is exact) — one
    part-keyed stats reduce + one partitioned join back + per-block
    partial sums (driver residue = one row per block); hash-exact."""
    from ..stages.infer import bucketed_reduce
    from ..stages.relational import cogroup_join

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def _pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "q_c": _cents(b["l_quantity"]),
                "price_c": _cents(b["l_extendedprice"]),
            }
        )

    rows = li.map_batches(_pre, batch_format="pyarrow")

    ps_schema = pa.schema(
        [("l_partkey", pa.int64()), ("n", pa.int64()), ("sq", pa.int64())]
    )

    def _stats_comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "l_partkey" not in b.columns:
            return pd.DataFrame(
                {
                    "l_partkey": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "sq": pd.Series([], dtype="int64"),
                }
            )
        if "n" in b.columns:
            return b.groupby("l_partkey", as_index=False)[["n", "sq"]].sum()
        g = b.groupby("l_partkey", as_index=False).agg(
            n=("q_c", "size"), sq=("q_c", "sum")
        )
        return g.astype({"n": "int64", "sq": "int64"})

    stats = bucketed_reduce(
        rows.select_columns(["l_partkey", "q_c"]),
        ["l_partkey"],
        _stats_comb,
        ps_schema,
        combiner=_stats_comb,
    )

    joined = cogroup_join(
        rows,
        stats,
        ["l_partkey"],
        left_schema=pa.schema(
            [("l_partkey", pa.int64()), ("q_c", pa.int64()), ("price_c", pa.int64())]
        ),
        right_schema=ps_schema,
        coalesce=16,
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "revenue_cents": pd.Series([], dtype="int64"),
                    "n_rows": pd.Series([], dtype="int64"),
                }
            )
        keep = (
            5 * b["q_c"].astype("int64") * b["n"].astype("int64")
            < b["sq"].astype("int64")
        )
        return pd.DataFrame(
            {
                "revenue_cents": [int(b.loc[keep, "price_c"].sum())],
                "n_rows": [int(keep.sum())],
            }
        )

    parts = joined.map_batches(
        _partial, batch_format="pandas", batch_size=None
    ).to_pandas()  # bounded: one row per block
    return pa.table(
        {
            "revenue_cents": pa.array([int(parts["revenue_cents"].sum())], pa.int64()),
            "n_rows": pa.array([int(parts["n_rows"].sum())], pa.int64()),
        }
    )


def q_media_wav_spectrogram(sf_dir: str):
    """Banded power spectrogram over the synthesized WAV payloads
    (REAL stdlib decode, one batched rfft per clip in the actor pool)
    — rows-only; band concentration of a pure tone pinned in pytest."""
    from ..stages.multimodal import synth_media_from_documents, wav_spectrogram

    media = synth_media_from_documents(sf_dir, media_type="wav")
    return wav_spectrogram(media)


def q_doc_novelty(sf_dir: str):
    """Per-doc novelty: per-mille share of the doc's distinct 3-grams
    that are corpus-unique (df == 1) — the curation signal between
    exact dedup and content-blind quality heuristics; two exchanges +
    one gram-hash-keyed join; hash-exact vs a df-join SQL twin sharing
    the gram rule."""
    from ..stages.dedup import novelty_scores

    return novelty_scores(_docs(sf_dir), k=3)


SEARCH_TERMS = ("hash", "join", "stream")


def q_doc_and_search(sf_dir: str):
    """Boolean-AND multi-term retrieval through the inverted-index
    shuffle (map side emits pairs only for the broadcast query
    vocabulary; one doc-keyed count == k) — hash-exact vs an
    unnest + count(DISTINCT) SQL twin."""
    from ..stages.vocab import conjunctive_search

    return conjunctive_search(_docs(sf_dir), SEARCH_TERMS)


def q_link_pagerank(sf_dir: str):
    """Web-graph PageRank FROM RAW HTML: regex href extraction ->
    (src, dst) anchor-multiplicity edges -> integer fixed-point
    pagerank_int — the crawl-ranking composite, bit-exact vs the
    unrolled-iteration SQL twin over the REGENERATED link arithmetic
    (same derandomized outlinks the synthesizer plants)."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import pagerank_int
    from ..stages.webtext import link_edges

    return pagerank_int(
        link_edges(pages_from_documents(sf_dir)),
        iters=PAGERANK_ITERS,
        scale=PAGERANK_SCALE,
        d_num=PAGERANK_DNUM,
        d_den=PAGERANK_DDEN,
    )


def q_page_inlinks(sf_dir: str):
    """Inbound-link counts parsed from the RAW html column (regex href
    scan per page, link-target-domain shuffle) — the synthesizer plants
    derandomized outlinks, so the SQL twin REGENERATES the identical
    arithmetic from doc_id (the negative-sampling auditable-noise
    discipline); hash-exact."""
    from ..sources.pages import pages_from_documents
    from ..stages.webtext import link_counts

    return link_counts(pages_from_documents(sf_dir))


def q_events_hourly_interp(sf_dir: str):
    """Per-type hourly counts with linearly INTERPOLATED gaps (the
    trend-preserving repair beside events_hourly_gapfill's zero-fill)
    — one exchange of (type, hour, partial count), vectorized spine +
    searchsorted neighbors in the reduce, truncating slope division;
    hash-exact vs an IGNORE NULLS window SQL twin."""
    from ..stages.sessions import interpolated_gapfill

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def _hour(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {"event_type": b["event_type"], "hour": pc.divide(us, 3_600_000_000)}
        )

    return interpolated_gapfill(ev.map_batches(_hour, batch_format="pyarrow"))


def q_doc_charset_profile(sf_dir: str):
    """Per-doc character-class census (encoding-health / mojibake
    screen) — map-only vectorized regex counts with explicit character
    classes shared verbatim with the SQL twin; hash-exact."""
    from ..stages.text_analysis import charset_profile

    return charset_profile(_docs(sf_dir))


def q_events_runs(sf_dir: str):
    """Per-user event-type run-length profile (stuck-client / replay
    detector) — one user-keyed shuffle, vectorized sort + shift-compare
    run labeling; hash-exact vs a lag-window SQL twin."""
    from ..stages.sessions import event_runs

    ev = read_parquet_clean(
        _t(sf_dir, "events"),
        columns=["user_id", "event_type", "ts", "event_id"],
    )
    return event_runs(ev)


def q_media_png_histogram(sf_dir: str):
    """Per-image per-channel 16-bin intensity histograms through the
    REAL stdlib PNG decode path (actor pool, codec bound per actor,
    one vectorized bincount per image). Hash-exact vs
    :func:`_mt19937_png_hist_oracle_sql` — MT19937 reproduced in SQL
    regenerates the exact pixel stream, so a codec roundtrip
    regression breaks the hash; also pinned vs a synthetic two-tone
    payload in pytest."""
    from ..stages.multimodal import channel_histograms, synth_media_from_documents

    media = synth_media_from_documents(sf_dir, media_type="png")
    return channel_histograms(media)


def q_doc_token_weighted_quantiles(sf_dir: str):
    """Token-MASS-weighted doc-length quantiles ("half the corpus's
    tokens live in docs shorter than X") — the curation signal the
    unweighted median misstates on long tails; one value-keyed
    histogram shuffle + gated driver cumsum; hash-exact vs a
    window-cumsum SQL twin."""
    from ..stages.quantiles import weighted_quantiles
    from ..stages.text_analysis import token_counts

    tc = token_counts(_docs(sf_dir)).map_batches(
        lambda b: pa.table({"n_tokens": b["n_tokens"], "w": b["n_tokens"]}),
        batch_format="pyarrow",
    )
    return weighted_quantiles(tc, "n_tokens", "w", (250, 500, 750))


def _snr_edges(sf_dir: str) -> ray.data.Dataset:
    """Supplier/nation/region fixture graph (the customer-free sibling
    of ``_cnrs_edges`` — small enough that a thresholded all-survivors
    similarity set stays oracle-checkable)."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    n2r = dict(zip(nat["n_nationkey"].astype(int), nat["n_regionkey"].astype(int)))
    n2r_ref = ray.put(n2r)

    def _fan(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(n2r_ref)
        s = "s" + b["s_suppkey"].astype(int).astype(str)
        n = b["s_nationkey"].astype(int)
        r = n.map(m)
        return pd.DataFrame(
            {
                "src": pd.concat([s, s], ignore_index=True),
                "dst": pd.concat(
                    ["n" + n.astype(str), "r" + r.astype(str)], ignore_index=True
                ),
            }
        )

    supp = read_parquet_clean(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_fan, batch_format="pandas")
    nr = ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": "n" + nat["n_nationkey"].astype(int).astype(str),
                "dst": "r" + nat["n_regionkey"].astype(int).astype(str),
            }
        )
    )
    return supp.union(nr)


def q_supplier_jaccard(sf_dir: str):
    """Jaccard neighborhood similarity >= 0.25 over the supplier/
    nation/region graph (degree-normalized blocking signal) — pair
    explosion per middle node through two bucketed reduces, degrees by
    two partitioned joins, integer-exact filter and score; hash-exact
    vs a self-join SQL twin."""
    from ..stages.graph_algos import node_jaccard

    return node_jaccard(_snr_edges(sf_dir), threshold_x1e6=250_000)


def _shipment_edges(sf_dir: str):
    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_suppkey", "l_partkey"]
    )

    def _edges(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": "s" + b["l_suppkey"].astype(int).astype(str),
                "dst": "p" + b["l_partkey"].astype(int).astype(str),
            }
        )

    return li.map_batches(_edges, batch_format="pandas")


def shipment_matching_pairs(sf_dir: str):
    """Deterministic maximal matching of the supplier-part shipment
    graph (hash-ordered local dominance == sequential greedy, O(log n)
    expected rounds) — the raw ``(u, v)`` pair table; greedy-twin
    equality and maximality pinned in pytest."""
    from ..stages.graph_algos import maximal_matching

    return maximal_matching(_shipment_edges(sf_dir))


def _node_flag_edge_counts(und, flagged_nodes) -> tuple[int, int, int]:
    """For an ``(a, b)`` edge table and a ``(node)`` membership table:
    ``(n_both_in, n_either_in, n_neither_in)`` — two node-keyed
    left-outer cogroup exchanges, 3-int residue. Shared by the
    matching/MIS acceptance checks."""
    from ..stages.infer import default_num_partitions, sanitize_for_join

    f_schema = pa.schema([("node", pa.string()), ("in_set", pa.int64())])
    flags = sanitize_for_join(
        flagged_nodes.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"], "in_set": np.ones(len(b), dtype=np.int64)}
            )
            if len(b)
            else pd.DataFrame(
                {"node": pd.Series(dtype=object),
                 "in_set": pd.Series(dtype="int64")}
            ),
            batch_format="pandas",
        ),
        f_schema,
    )
    a_side = und.map_batches(
        lambda b: pd.DataFrame({"node": b["a"], "b": b["b"]}),
        batch_format="pandas",
    )
    j1 = cogroup_join(
        a_side,
        flags,
        on=["node"],
        how="left_outer",
        left_schema=pa.schema([("node", pa.string()), ("b", pa.string())]),
        right_schema=f_schema,
        num_buckets=default_num_partitions(),
    ).map_batches(
        lambda b: pd.DataFrame(
            {"node": b["b"], "fa_": b["in_set"].fillna(0).astype("int64")}
        ),
        batch_format="pandas",
    )
    j2 = cogroup_join(
        j1,
        flags.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "fb_": b["in_set"]}),
            batch_format="pandas",
        ),
        on=["node"],
        how="left_outer",
        left_schema=pa.schema([("node", pa.string()), ("fa_", pa.int64())]),
        right_schema=pa.schema([("node", pa.string()), ("fb_", pa.int64())]),
        num_buckets=default_num_partitions(),
    )
    agg = j2.map_batches(
        lambda b: pd.DataFrame(
            {
                "both": [int(((b["fa_"] == 1) & (b["fb_"].fillna(0) == 1)).sum())],
                "either": [
                    int(((b["fa_"] == 1) | (b["fb_"].fillna(0) == 1)).sum())
                ],
                "neither": [
                    int(((b["fa_"] != 1) & (b["fb_"].fillna(0) != 1)).sum())
                ],
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    if len(agg) == 0:
        return 0, 0, 0
    return int(agg["both"].sum()), int(agg["either"].sum()), int(agg["neither"].sum())


def q_shipment_matching(sf_dir: str):
    """Matching acceptance check (driver-checkable surface; raw pairs:
    :func:`shipment_matching_pairs`): ``(n_edges, n_multiply_matched,
    n_uncovered_edges)``. The oracle counts the graph's distinct
    undirected edges; a valid MAXIMAL matching uses each node at most
    once (``n_multiply_matched = 0``) and leaves no edge with both
    endpoints free (``n_uncovered_edges = 0``). WHICH pairs are chosen
    is hash-order-dependent — greedy-twin equality is pinned in
    pytest, not SQL-predictable."""
    from ..stages.graph_algos import undirected_simple_edges
    from ..stages.infer import bucketed_reduce

    edges = _shipment_edges(sf_dir)
    und = undirected_simple_edges(edges).materialize()
    matching = shipment_matching_pairs(sf_dir).materialize()
    n_edges = und.count()

    nodes = matching.map_batches(
        lambda b: pd.DataFrame(
            {"node": pd.concat([b["u"], b["v"]], ignore_index=True)}
        )
        if len(b)
        else pd.DataFrame({"node": pd.Series(dtype=object)}),
        batch_format="pandas",
    )
    cnt_schema = pa.schema([("node", pa.string()), ("c", pa.int64())])

    def _cnt(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "node" not in g.columns:
            return pd.DataFrame(
                {"node": pd.Series(dtype=object), "c": pd.Series(dtype="int64")}
            )
        if "c" in g.columns:
            return g.groupby("node", as_index=False)["c"].sum()
        out = g.groupby("node", as_index=False).agg(c=("node", "size"))
        out["c"] = out["c"].astype("int64")
        return out

    counts = bucketed_reduce(nodes, ["node"], _cnt, cnt_schema, combiner=_cnt)
    multi = counts.map_batches(
        lambda b: pd.DataFrame({"m": [int((b["c"] > 1).sum())]}),
        batch_format="pandas",
    ).to_pandas()
    n_multi = int(multi["m"].sum()) if len(multi) else 0

    matched_nodes = counts.map_batches(
        lambda b: pd.DataFrame({"node": b["node"]}), batch_format="pandas"
    )
    _both, _either, n_uncovered = _node_flag_edge_counts(und, matched_nodes)
    return pd.DataFrame(
        {
            "n_edges": pd.Series([n_edges], dtype="int64"),
            "n_multiply_matched": pd.Series([n_multi], dtype="int64"),
            "n_uncovered_edges": pd.Series([n_uncovered], dtype="int64"),
        }
    )


def q_returned_item_customers(sf_dir: str):
    """TPC-H Q10 shape (returned-item revenue per customer, top 20):
    lineitem filtered to returnflag='R' pre-aggregates revenue per
    orderkey BELOW the cogroup join with 1997-H1 orders; per-customer
    sums in a second bucketed exchange; the customer-name lookup joins
    only the 20 winners. Hash-exact vs a 3-way join twin."""
    from ..stages.infer import bucketed_reduce, default_num_partitions
    from ..stages.relational import topk_dataset

    lo = np.datetime64("1997-01-01", "us").astype("int64")
    hi = np.datetime64("1997-07-01", "us").astype("int64")

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def _l(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"l_orderkey": pd.Series(dtype="int64"),
                 "rev": pd.Series(dtype="int64")}
            )
        b = b[b["l_returnflag"] == "R"]
        if len(b) == 0:
            return pd.DataFrame(
                {"l_orderkey": pd.Series(dtype="int64"),
                 "rev": pd.Series(dtype="int64")}
            )
        part = pd.DataFrame({"l_orderkey": b["l_orderkey"].to_numpy(),
                             "rev": _rev_e4(b)})
        return part.groupby("l_orderkey", as_index=False, sort=False)["rev"].sum()

    l_part = li.map_batches(_l, batch_format="pandas")
    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def _o(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"l_orderkey": pd.Series(dtype="int64"),
                 "o_custkey": pd.Series(dtype="int64")}
            )
        us = b["o_orderdate"].to_numpy("datetime64[us]").astype("int64")
        m = (us >= lo) & (us < hi)
        return pd.DataFrame(
            {"l_orderkey": b["o_orderkey"].to_numpy()[m],
             "o_custkey": b["o_custkey"].to_numpy()[m]}
        )

    joined = cogroup_join(
        l_part, orders.map_batches(_o, batch_format="pandas"),
        on=["l_orderkey"], how="inner",
        coalesce=default_num_partitions(),
        left_schema=pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64())]),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("o_custkey", pa.int64())]
        ),
    )

    def _c(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"c_custkey": pd.Series(dtype="int64"),
                 "revenue_e4": pd.Series(dtype="int64")}
            )
        if "c_custkey" not in b.columns:
            b = pd.DataFrame(
                {"c_custkey": b["o_custkey"].to_numpy(),
                 "revenue_e4": b["rev"].to_numpy()}
            )
        return b.groupby("c_custkey", as_index=False, sort=False)["revenue_e4"].sum()

    per_cust = bucketed_reduce(
        joined, ["c_custkey"], _c,
        pa.schema([("c_custkey", pa.int64()), ("revenue_e4", pa.int64())]),
        combiner=_c,
    )
    top = topk_dataset(per_cust, ["revenue_e4", "c_custkey"], 20,
                       descending=[True, False])
    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_acctbal"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {"c_custkey": b["c_custkey"].to_numpy(),
             "c_name": b["c_name"].to_numpy(),
             "acctbal_cents": np.round(b["c_acctbal"].to_numpy() * 100.0)
             .astype(np.int64)}
        )
        if len(b)
        else pd.DataFrame(
            {"c_custkey": pd.Series(dtype="int64"),
             "c_name": pd.Series(dtype="object"),
             "acctbal_cents": pd.Series(dtype="int64")}
        ),
        batch_format="pandas",
    )
    from ..stages.infer import normalize_blocks

    out = cogroup_join(
        top, cust, on=["c_custkey"], how="inner",
        left_schema=pa.schema(
            [("c_custkey", pa.int64()), ("revenue_e4", pa.int64())]
        ),
        right_schema=pa.schema(
            [("c_custkey", pa.int64()), ("c_name", pa.string()),
             ("acctbal_cents", pa.int64())]
        ),
    )
    return normalize_blocks(
        out.map_batches(
            lambda b: b[["c_custkey", "c_name", "revenue_e4", "acctbal_cents"]]
            if len(b) else b,
            batch_format="pandas",
        ),
        pa.schema(
            [("c_custkey", pa.int64()), ("c_name", pa.string()),
             ("revenue_e4", pa.int64()), ("acctbal_cents", pa.int64())]
        ),
    )


def q_top_supplier_revenue(sf_dir: str):
    """TPC-H Q15 shape (argmax with ties): supplier(s) achieving the
    maximum 1997-Q1 shipped revenue. Per-supplier sums in one bucketed
    exchange; the global max is a one-row driver residue; winners
    filter map-side. Hash-exact vs a HAVING max() twin."""
    from ..stages.infer import bucketed_reduce, normalize_blocks

    lo = np.datetime64("1997-01-01", "us").astype("int64")
    hi = np.datetime64("1997-04-01", "us").astype("int64")

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def _s(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"s_suppkey": pd.Series(dtype="int64"),
                 "revenue_e4": pd.Series(dtype="int64")}
            )
        if "s_suppkey" not in b.columns:
            us = b["l_shipdate"].to_numpy("datetime64[us]").astype("int64")
            b = b[(us >= lo) & (us < hi)]
            if len(b) == 0:
                return pd.DataFrame(
                    {"s_suppkey": pd.Series(dtype="int64"),
                     "revenue_e4": pd.Series(dtype="int64")}
                )
            b = pd.DataFrame(
                {"s_suppkey": b["l_suppkey"].to_numpy(), "revenue_e4": _rev_e4(b)}
            )
        return b.groupby("s_suppkey", as_index=False, sort=False)["revenue_e4"].sum()

    per_supp = bucketed_reduce(
        li, ["s_suppkey"], _s,
        pa.schema([("s_suppkey", pa.int64()), ("revenue_e4", pa.int64())]),
        combiner=_s,
    ).materialize()

    mx_parts = per_supp.map_batches(
        lambda b: pd.DataFrame({"m": [int(b["revenue_e4"].max())]})
        if len(b)
        else pd.DataFrame({"m": pd.Series(dtype="int64")}),
        batch_format="pandas",
        batch_size=None,
    ).to_pandas()
    mx = int(mx_parts["m"].max()) if len(mx_parts) else 0

    return normalize_blocks(
        per_supp.map_batches(
            lambda b: b[b["revenue_e4"] == mx] if len(b) else b,
            batch_format="pandas",
        ),
        pa.schema([("s_suppkey", pa.int64()), ("revenue_e4", pa.int64())]),
    )


def q_doc_systematic_sample(sf_dir: str):
    """Shuffled systematic sampling: every 20th document in
    md5(text)-sorted order — the evenly-spaced deterministic sample
    (md5 order is a reproducible shuffle, so strides cannot align
    with ingestion order). Exercises the distributed row_number
    primitive end-to-end; hash-exact vs a row_number twin."""
    from ..stages.relational import row_positions

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy().astype(np.int64),
                "md5": [
                    __import__("hashlib").md5(
                        (t or "").encode()
                    ).hexdigest()
                    for t in b["text"]
                ],
            }
        )
        if len(b)
        else pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "md5": pd.Series(dtype="object")}
        ),
        batch_format="pandas",
    )
    pos = row_positions(docs, ["md5", "doc_id"])
    return pos.map_batches(
        lambda b: pd.DataFrame(
            {"doc_id": b.loc[b["pos"] % 20 == 0, "doc_id"].astype("int64")}
        )
        if len(b)
        else pd.DataFrame({"doc_id": pd.Series(dtype="int64")}),
        batch_format="pandas",
    )


def q_doc_budgeted_sample(sf_dir: str):
    """End-to-end budget application: the max-min-fair water-filling
    cap T feeds cap_per_group, keeping each source's T smallest doc
    ids — the curation step that ENFORCES source_budget_quotas.
    Hash-exact vs a row_number twin sharing the threshold CTEs."""
    from ..stages.relational import cap_per_group
    from ..stages.webtext import source_budget_quotas

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "source"]
    )
    budget = docs.count() * 3 // 5
    quotas = source_budget_quotas(docs, "source", budget=budget).to_pandas()
    t = int(quotas["quota"].max()) if len(quotas) else 0
    return cap_per_group(docs, "source", "doc_id", t)


def q_source_budget_quotas(sf_dir: str):
    """Max-min-fair source budget allocation (water-filling): split a
    global budget of 3/5 of the corpus across sources, every source
    capped at the largest uniform T that fits — the data-mixing step
    before cap_per_group enforces the quota. Count-gated: closed form
    over collected per-source counts under the gate; map-only
    binary-search probes over it. Hash-exact vs a window prefix-sum
    SQL twin computing the identical integer T."""
    from ..stages.webtext import source_budget_quotas

    docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["source"])
    budget = docs.count() * 3 // 5
    return source_budget_quotas(docs, "source", budget=budget)


def q_part_soundex(sf_dir: str):
    """Simplified-Soundex phonetic blocking keys over part names —
    the third classic linkage blocker beside FastSS and
    sorted-neighborhood. The pandas chain and the DuckDB oracle are
    RENDERED FROM THE SAME step list (RE2-safe, no backreferences),
    so the dialects cannot drift; hash-exact."""
    from ..stages.fuzzy import soundex_codes

    part = read_parquet_clean(_t(sf_dir, "part"), columns=["p_partkey", "p_name"])
    return soundex_codes(part, "p_name", "p_partkey")


def shipment_mis_nodes(sf_dir: str):
    """Deterministic maximal independent set of the supplier-part
    shipment graph (derandomized Luby == sequential greedy of the
    hash order) — the raw ``(node)`` table; independence, maximality,
    greedy-twin and forced-gate equality pinned in tests/test_mis.py."""
    from ..stages.graph_algos import maximal_independent_set

    return maximal_independent_set(_shipment_edges(sf_dir))


def q_shipment_mis(sf_dir: str):
    """MIS acceptance check (driver-checkable surface; raw set:
    :func:`shipment_mis_nodes`): ``(n_nodes, n_internal_edges,
    n_uncovered_nodes)``. The oracle counts the graph's distinct
    nodes; a valid MAXIMAL independent set spans no edge
    (``n_internal_edges = 0``) and dominates every node — each
    non-member has a member neighbor, so every edge touches the
    covered side and the uncovered-node count is 0. WHICH nodes enter
    is hash-order-dependent — greedy-twin equality is pinned in
    pytest, not SQL-predictable."""
    from ..stages.graph_algos import undirected_simple_edges

    edges = _shipment_edges(sf_dir)
    und = undirected_simple_edges(edges).materialize()
    mis = shipment_mis_nodes(sf_dir).materialize()
    n_nodes = _distinct_node_count(und)
    n_internal, n_covered_edges, _neither = _node_flag_edge_counts(und, mis)

    # uncovered nodes: not in MIS and no MIS neighbor — count via one
    # more membership join of the node table against (MIS + MIS
    # neighborhoods)
    from ..stages.infer import bucketed_reduce, default_num_partitions, sanitize_for_join

    node_schema = pa.schema([("node", pa.string())])
    all_nodes = und.map_batches(
        lambda b: pd.DataFrame(
            {"node": pd.concat([b["a"], b["b"]], ignore_index=True)}
        ).drop_duplicates()
        if len(b)
        else pd.DataFrame({"node": pd.Series(dtype=object)}),
        batch_format="pandas",
    )

    def _dd(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "node" not in g.columns:
            return pd.DataFrame({"node": pd.Series(dtype=object)})
        return g[["node"]].drop_duplicates()

    universe = bucketed_reduce(all_nodes, ["node"], _dd, node_schema, combiner=_dd)

    mis_schema = pa.schema([("node", pa.string()), ("in_mis", pa.int64())])
    mis_flag = sanitize_for_join(
        mis.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"], "in_mis": np.ones(len(b), dtype=np.int64)}
            )
            if len(b)
            else pd.DataFrame(
                {"node": pd.Series(dtype=object),
                 "in_mis": pd.Series(dtype="int64")}
            ),
            batch_format="pandas",
        ),
        mis_schema,
    )
    # covered = MIS members + their neighbors: flag edges' other side
    j = cogroup_join(
        und.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": pd.concat([b["a"], b["b"]], ignore_index=True),
                    "other": pd.concat([b["b"], b["a"]], ignore_index=True),
                }
            )
            if len(b)
            else pd.DataFrame(
                {"node": pd.Series(dtype=object), "other": pd.Series(dtype=object)}
            ),
            batch_format="pandas",
        ),
        mis_flag,
        on=["node"],
        how="inner",
        left_schema=pa.schema([("node", pa.string()), ("other", pa.string())]),
        right_schema=mis_schema,
        num_buckets=default_num_partitions(),
    ).map_batches(
        lambda b: pd.DataFrame({"node": b["other"]}), batch_format="pandas"
    )
    covered = bucketed_reduce(
        j.union(mis.map_batches(
            lambda b: pd.DataFrame({"node": b["node"]}), batch_format="pandas"
        )),
        ["node"],
        _dd,
        node_schema,
        combiner=_dd,
    )
    n_uncovered = n_nodes - covered.count()
    return pd.DataFrame(
        {
            "n_nodes": pd.Series([n_nodes], dtype="int64"),
            "n_internal_edges": pd.Series([n_internal], dtype="int64"),
            "n_uncovered_nodes": pd.Series([n_uncovered], dtype="int64"),
        }
    )


def q_doc_containment(sf_dir: str):
    """Directed n-gram containment pairs (doc A >= 80% contained in
    doc B — the quote/boilerplate detector symmetric Jaccard misses);
    shares the two-shuffle pair-count front half with
    ngram_overlap_pairs; hash-exact vs a directed-union SQL twin."""
    from ..stages.dedup import ngram_containment_pairs

    return ngram_containment_pairs(_docs(sf_dir), k=3, threshold=0.8)


def shipment_mst_edges(sf_dir: str):
    """Minimum spanning forest of the supplier-part shipment graph
    (edge weight = cheapest extendedprice cents for the pair) —
    distributed Boruvka: per-round cheapest-outgoing-edge reduce +
    gated contraction, rounds <= log2(n). Forest minimality/uniqueness
    pinned vs Kruskal/networkx in pytest (not SQL-expressible)."""
    from ..stages.graph_algos import minimum_spanning_forest

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_partkey", "l_extendedprice"],
    )

    def _edges(b: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.array(["s"] * len(b)), pc.cast(b["l_suppkey"], pa.string()), ""
        )
        p = pc.binary_join_element_wise(
            pa.array(["p"] * len(b)), pc.cast(b["l_partkey"], pa.string()), ""
        )
        return pa.table({"u": s, "v": p, "w": _cents(b["l_extendedprice"])})

    return minimum_spanning_forest(li.map_batches(_edges, batch_format="pyarrow"))


def q_shipment_mst(sf_dir: str):
    """Spanning-forest acceptance check of the distributed-Boruvka MST
    (the driver-checkable invariant surface; the raw forest is
    :func:`shipment_mst_edges`): per component of the INPUT shipment
    graph — labeled by distributed min-label propagation over the
    dense input edges (small diameter; the forest's own tree diameter
    would not converge) — report ``(component=min node, n_nodes,
    n_edges_in_forest)``. The oracle recomputes input components by
    recursive CTE and emits ``n_edges = n_nodes - 1``, so the tables
    agree iff the forest carries exactly the spanning-tree edge count
    in every input component. Minimality, per-component connectivity
    and acyclicity are pinned vs Kruskal/networkx in pytest — those
    are not SQL-expressible."""
    from ..stages.infer import (
        bucketed_reduce,
        connected_components_distributed,
        default_num_partitions,
        sanitize_for_join,
    )

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_suppkey", "l_partkey"]
    )

    def _skel(b: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.array(["s"] * len(b)), pc.cast(b["l_suppkey"], pa.string()), ""
        )
        p = pc.binary_join_element_wise(
            pa.array(["p"] * len(b)), pc.cast(b["l_partkey"], pa.string()), ""
        )
        return pa.table({"subject": s, "object": p})

    mst = shipment_mst_edges(sf_dir).materialize()
    labels = connected_components_distributed(
        li.map_batches(_skel, batch_format="pyarrow")
    ).materialize()

    lbl_schema = pa.schema([("entity", pa.string()), ("component", pa.string())])

    def _cnt(name: str):
        def _f(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0 or "component" not in g.columns:
                return pd.DataFrame(
                    {"component": pd.Series(dtype=object),
                     name: pd.Series(dtype="int64")}
                )
            if name in g.columns:
                return g.groupby("component", as_index=False)[name].sum()
            out = g.groupby("component", as_index=False).agg(**{name: ("component", "size")})
            out[name] = out[name].astype("int64")
            return out

        return _f

    n_schema = pa.schema([("component", pa.string()), ("n_nodes", pa.int64())])
    e_schema = pa.schema([("component", pa.string()), ("n_edges", pa.int64())])
    node_counts = bucketed_reduce(
        labels, ["component"], _cnt("n_nodes"), n_schema, combiner=_cnt("n_nodes")
    )
    edge_comp = cogroup_join(
        mst.map_batches(
            lambda b: pa.table({"entity": b["u"]}), batch_format="pyarrow"
        ),
        sanitize_for_join(labels, lbl_schema),
        on=["entity"],
        how="inner",
        left_schema=pa.schema([("entity", pa.string())]),
        right_schema=lbl_schema,
        num_buckets=default_num_partitions(),
    )
    edge_counts = bucketed_reduce(
        edge_comp.select_columns(["component"]),
        ["component"],
        _cnt("n_edges"),
        e_schema,
        combiner=_cnt("n_edges"),
    )
    out = cogroup_join(
        node_counts,
        edge_counts,
        on=["component"],
        how="inner",
        left_schema=n_schema,
        right_schema=e_schema,
        num_buckets=default_num_partitions(),
    )
    return out


# ---------------------------------------------------------------------------
# TPC-H shapes: Q8 market share, Q9 profit-by-nation-year, Q16 supplier
# counts with NOT-IN, Q20 dominant-share semi-join
# ---------------------------------------------------------------------------

def q_nation_market_share(sf_dir: str):
    """TPC-H Q8 shape: per order-year share (bps) of ASIA customers'
    revenue that was supplied by NATION_2. Plan: lineitem pre-aggregates
    per orderkey BELOW the one large-large exchange — each order
    contributes (rev_all, rev_x) where rev_x counts only NATION_2
    suppliers (supplier->nation is a broadcast dim); orders filter to
    1996-1997 and to ASIA customers map-side (customer nationkey is
    broadcast here; the 10^9-customer scale path is a second cogroup
    join on custkey, same shape as three_way_join); the share is exact
    integer bps computed on the <= 2-row year residue."""
    import ray as _ray

    from ..stages.infer import default_num_partitions

    supp = pd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pd.read_parquet(_t(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    asia_key = int(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    asia_nations = set(nat.loc[nat["n_regionkey"] == asia_key, "n_nationkey"].astype(int))
    target_key = int(nat.loc[nat["n_name"] == "NATION_2", "n_nationkey"].iloc[0])
    supp_ref = _ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"].astype(np.int64))))
    asia_cust = set(
        cust.loc[cust["c_nationkey"].isin(asia_nations), "c_custkey"].astype(int)
    )
    cust_ref = _ray.put(np.sort(np.fromiter(asia_cust, dtype=np.int64)))

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def _l_partial(b: pd.DataFrame) -> pd.DataFrame:
        sup = _ray.get(supp_ref) if isinstance(supp_ref, _ray.ObjectRef) else supp_ref
        s_nat = b["l_suppkey"].map(sup).astype(np.int64).to_numpy()
        rev = _rev_e4(b)
        part = pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(),
                "rev_all": rev,
                "rev_x": np.where(s_nat == target_key, rev, 0),
            }
        )
        return part.groupby("l_orderkey", as_index=False, sort=False).sum()

    l_part = li.map_batches(_l_partial, batch_format="pandas")

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def _o_filter(b: pd.DataFrame) -> pd.DataFrame:
        keys = _ray.get(cust_ref) if isinstance(cust_ref, _ray.ObjectRef) else cust_ref
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        ck = b["o_custkey"].to_numpy()
        idx = np.searchsorted(keys, ck)
        idx = np.clip(idx, 0, len(keys) - 1)
        b = b[keys[idx] == ck] if len(keys) else b.iloc[:0]
        return pd.DataFrame(
            {
                "l_orderkey": b["o_orderkey"].to_numpy(),
                "o_year": b["o_orderdate"].dt.year.astype(np.int64).to_numpy(),
            }
        )

    o_side = orders.map_batches(_o_filter, batch_format="pandas")
    joined = cogroup_join(
        l_part, o_side, on=["l_orderkey"], how="inner",
        coalesce=default_num_partitions(),
    )

    def _year_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "o_year": pd.Series(dtype="int64"),
                    "rev_x_e4": pd.Series(dtype="int64"),
                    "rev_all_e4": pd.Series(dtype="int64"),
                }
            )
        out = b.groupby("o_year", as_index=False, sort=False).agg(
            rev_x_e4=("rev_x", "sum"), rev_all_e4=("rev_all", "sum")
        )
        return out.astype({"o_year": "int64"})

    years = (
        joined.map_batches(_year_partial, batch_format="pandas")
        .to_pandas()
        .groupby("o_year", as_index=False)
        .sum()
    )
    years["share_bps"] = (
        years["rev_x_e4"] * 10000 // years["rev_all_e4"]
    ).astype("int64")
    return years.sort_values("o_year").reset_index(drop=True)


def q_nation_part_profit(sf_dir: str):
    """TPC-H Q9 shape: revenue (e4 cents) from parts named like
    '%blue%' grouped by supplying nation x order year. Plan: the
    matching partkey set and supplier->nation are broadcast (sorted
    int arrays; the billion-part scale path is a cogroup join on
    partkey — same shape as three_way_join); lineitem pre-aggregates
    per (orderkey, nation) below the one orders exchange that attaches
    the year."""
    import ray as _ray

    from ..stages.infer import default_num_partitions

    part = pd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_name"])
    supp = pd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    blue = np.sort(
        part.loc[part["p_name"].str.contains("blue"), "p_partkey"].to_numpy(np.int64)
    )
    blue_ref = _ray.put(blue)
    supp_ref = _ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"].astype(np.int64))))
    nat_names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def _l_partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = _ray.get(blue_ref) if isinstance(blue_ref, _ray.ObjectRef) else blue_ref
        sup = _ray.get(supp_ref) if isinstance(supp_ref, _ray.ObjectRef) else supp_ref
        pk = b["l_partkey"].to_numpy()
        if len(keys):
            idx = np.clip(np.searchsorted(keys, pk), 0, len(keys) - 1)
            b = b[keys[idx] == pk]
        else:
            b = b.iloc[:0]
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "l_orderkey": pd.Series(dtype="int64"),
                    "s_nationkey": pd.Series(dtype="int64"),
                    "rev": pd.Series(dtype="int64"),
                }
            )
        part = pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(),
                "s_nationkey": b["l_suppkey"].map(sup).astype(np.int64).to_numpy(),
                "rev": _rev_e4(b),
            }
        )
        return part.groupby(["l_orderkey", "s_nationkey"], as_index=False, sort=False).sum()

    l_part = li.map_batches(_l_partial, batch_format="pandas")

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"]
    )

    def _o_proj(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": b["o_orderkey"].to_numpy(),
                "o_year": b["o_orderdate"].dt.year.astype(np.int64).to_numpy(),
            }
        )

    o_side = orders.map_batches(_o_proj, batch_format="pandas")
    joined = cogroup_join(
        l_part, o_side, on=["l_orderkey"], how="inner",
        coalesce=default_num_partitions(),
    )

    def _name(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "n_name": pd.Series(dtype="object"),
                    "o_year": pd.Series(dtype="int64"),
                    "rev": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "n_name": b["s_nationkey"].map(nat_names),
                "o_year": b["o_year"].astype("int64"),
                "rev": b["rev"].to_numpy(),
            }
        )

    named = joined.map_batches(_name, batch_format="pandas")
    return grouped_sums(named, ["n_name", "o_year"], {"profit_e4": "rev"})


def q_part_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape: distinct-supplier count per (p_brand, p_type,
    p_size) over shipments, excluding Brand#13 parts and suppliers
    with negative account balance (the NOT-IN side). Plan: distinct
    (partkey, suppkey) pairs via one bucketed reduce with a map-side
    drop_duplicates combiner; part attributes and the excluded
    supplier set are broadcast dims; the final distinct count is a
    second bucketed reduce keyed on the attribute triple."""
    import ray as _ray

    from ..stages.infer import bucketed_reduce

    part = pd.read_parquet(
        _t(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_type", "p_size"]
    )
    supp = pd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_acctbal"])
    bad = np.sort(supp.loc[supp["s_acctbal"] < 0, "s_suppkey"].to_numpy(np.int64))
    bad_ref = _ray.put(bad)
    keep = part[part["p_brand"] != "Brand#13"]
    attrs_ref = _ray.put(keep.set_index("p_partkey"))

    li = read_parquet_clean(_t(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"])

    def _pairs(b: pd.DataFrame) -> pd.DataFrame:
        ex = _ray.get(bad_ref) if isinstance(bad_ref, _ray.ObjectRef) else bad_ref
        sk = b["l_suppkey"].to_numpy()
        if len(ex):
            idx = np.clip(np.searchsorted(ex, sk), 0, len(ex) - 1)
            b = b[ex[idx] != sk]
        return pd.DataFrame(
            {"p_partkey": b["l_partkey"].to_numpy(), "s_suppkey": b["l_suppkey"].to_numpy()}
        ).drop_duplicates()

    pair_schema = pa.schema(
        [pa.field("p_partkey", pa.int64()), pa.field("s_suppkey", pa.int64())]
    )

    def _distinct(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"p_partkey": pd.Series(dtype="int64"), "s_suppkey": pd.Series(dtype="int64")}
            )
        return g.drop_duplicates(["p_partkey", "s_suppkey"])

    pairs = bucketed_reduce(
        li.map_batches(_pairs, batch_format="pandas"),
        ["p_partkey", "s_suppkey"],
        _distinct,
        pair_schema,
        combiner=_distinct,
    )

    def _attr(b: pd.DataFrame) -> pd.DataFrame:
        at = _ray.get(attrs_ref) if isinstance(attrs_ref, _ray.ObjectRef) else attrs_ref
        b = b[b["p_partkey"].isin(at.index)]
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "p_brand": pd.Series(dtype="object"),
                    "p_type": pd.Series(dtype="object"),
                    "p_size": pd.Series(dtype="int64"),
                    "s_suppkey": pd.Series(dtype="int64"),
                }
            )
        sel = at.loc[b["p_partkey"].to_numpy()]
        return pd.DataFrame(
            {
                "p_brand": sel["p_brand"].to_numpy(),
                "p_type": sel["p_type"].to_numpy(),
                "p_size": sel["p_size"].astype(np.int64).to_numpy(),
                "s_suppkey": b["s_suppkey"].to_numpy(),
            }
        ).drop_duplicates()

    out_schema = pa.schema(
        [
            pa.field("p_brand", pa.string()),
            pa.field("p_type", pa.string()),
            pa.field("p_size", pa.int64()),
            pa.field("supplier_cnt", pa.int64()),
        ]
    )

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        out = g.groupby(["p_brand", "p_type", "p_size"], as_index=False, sort=False).agg(
            supplier_cnt=("s_suppkey", "size")
        )
        return out.astype({"p_size": "int64", "supplier_cnt": "int64"})

    return bucketed_reduce(
        pairs.map_batches(_attr, batch_format="pandas"),
        ["p_brand", "p_type", "p_size"],
        _count,
        out_schema,
    )


def q_dominant_suppliers(sf_dir: str):
    """TPC-H Q20 shape: suppliers that shipped a MAJORITY (> 50%) of
    some part's total 1997 quantity, with how many parts each
    dominates. Plan: per-(partkey, suppkey) quantity sums via one
    bucketed reduce with a map-side sum combiner; a second per-partkey
    reduce computes the part total and flags majority holders (the
    within-group-share shape — no window function, the whole group sits
    in one bucket); the per-supplier count is a third tiny reduce.
    All integer quantities — hash-exact vs a window-SQL twin."""
    from ..stages.infer import bucketed_reduce

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
        out = pd.DataFrame(
            {
                "p": b["l_partkey"].to_numpy(),
                "s": b["l_suppkey"].to_numpy(),
                "qty": np.rint(b["l_quantity"].to_numpy()).astype(np.int64),
            }
        )
        return out.groupby(["p", "s"], as_index=False, sort=False).sum()

    def _sum_ps(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "p": pd.Series(dtype="int64"),
                    "s": pd.Series(dtype="int64"),
                    "qty": pd.Series(dtype="int64"),
                }
            )
        return g.groupby(["p", "s"], as_index=False, sort=False).sum()

    ps_schema = pa.schema(
        [pa.field("p", pa.int64()), pa.field("s", pa.int64()), pa.field("qty", pa.int64())]
    )
    ps = bucketed_reduce(
        li.map_batches(_pre, batch_format="pandas"), ["p", "s"], _sum_ps, ps_schema,
        combiner=_sum_ps,
    )

    def _majority(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("p")["qty"].transform("sum")
        win = g[2 * g["qty"].to_numpy() > tot.to_numpy()]
        return pd.DataFrame({"s_suppkey": win["s"].to_numpy()})

    s_schema = pa.schema([pa.field("s_suppkey", pa.int64())])
    winners = bucketed_reduce(ps, ["p"], _majority, s_schema)

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        # idempotent on its own output: combined rows carry n_parts
        # (branch on the OUTPUT-only column, not the surviving key)
        if len(g) == 0:
            return pd.DataFrame(
                {"s_suppkey": pd.Series(dtype="int64"), "n_parts": pd.Series(dtype="int64")}
            )
        if "n_parts" in g.columns:
            out = g.groupby("s_suppkey", as_index=False, sort=False)["n_parts"].sum()
        else:
            out = g.groupby("s_suppkey", as_index=False, sort=False).size().rename(
                columns={"size": "n_parts"}
            )
        return out.astype({"s_suppkey": "int64", "n_parts": "int64"})

    cnt_schema = pa.schema(
        [pa.field("s_suppkey", pa.int64()), pa.field("n_parts", pa.int64())]
    )
    return bucketed_reduce(winners, ["s_suppkey"], _count, cnt_schema, combiner=_count)


# ---------------------------------------------------------------------------
# Unpivot / ordered string_agg / lagged cross-correlation / calibration
# ---------------------------------------------------------------------------

def q_events_unpivot(sf_dir: str):
    """UNPIVOT round trip: the per-user wide count pivot melted back
    to long (user_id, event_type, n) — map-only inverse of
    pivot_counts, explicit zero cells dropped so the result equals the
    direct long GROUP BY; hash-exact vs that direct SQL."""
    from ..stages.relational import pivot_counts, unpivot

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    types = ["view", "click", "purchase", "signup", "error"]
    wide = pivot_counts(ev, "user_id", "event_type", types, key_type=pa.int64())
    return unpivot(
        wide,
        ["user_id"],
        [f"n_{t}" for t in types],
        var_name="event_type",
        value_name="n",
        var_labels={f"n_{t}": t for t in types},
        drop_zero=True,
    )


def q_customer_priority_seq(sf_dir: str):
    """Ordered list aggregation (SQL ``string_agg(... ORDER BY ...)``):
    per customer, the '|'-joined sequence of their order priorities in
    (date, orderkey) order — the per-entity event-history string a
    sequence-model exporter emits. One bucketed exchange of raw rows
    (global per-key order forbids pre-combining); hash-exact vs the
    ordered-string_agg twin."""
    from ..stages.relational import grouped_string_agg

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"]
    )
    return grouped_string_agg(
        orders,
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        "o_orderpriority",
        key_fields=[pa.field("o_custkey", pa.int64())],
        sep="|",
        out_name="priority_seq",
    )


def q_events_crosscorr(sf_dir: str):
    """Lead-lag cross-correlation between hourly view and click
    volumes (lags 0-6h): integer sufficient sums (vc_sum, n_hours) per
    lag — the "does engagement follow exposure?" probe. Distributed
    per-hour reduce, then one residue pass bounded by the covered time
    span; hash-exact vs a lag-join SQL twin."""
    from ..stages.drift import crosscorr_sums

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def _hour(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {"event_type": b["event_type"], "hour": pc.divide(us, 3_600_000_000)}
        )

    return crosscorr_sums(
        ev.map_batches(_hour, batch_format="pyarrow"),
        "hour",
        "event_type",
        "view",
        "click",
    )


def q_doc_calibration(sf_dir: str):
    """Reliability-diagram bins of the english-stopword confidence
    score vs the lang-ID label (10 integer bins; n, positives, score
    mass per bin) — exact-integer calibration audit."""
    from ..stages.text_analysis import calibration_bins

    return calibration_bins(_docs(sf_dir))


def link_coloring_colors(sf_dir: str):
    """Greedy graph coloring of the web-link graph (Jones-Plassmann
    on the splitmix64 node order — conflict-free co-update scheduling
    over linked pages); the raw ``(node, color)`` table. Greedy
    coloring is not SQL-expressible; properness + driver/distributed
    gate equivalence pinned in pytest."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import greedy_coloring
    from ..stages.webtext import link_edges

    return greedy_coloring(link_edges(pages_from_documents(sf_dir)))


def _distinct_node_count(und) -> int:
    """Distinct endpoint count of an ``(a, b)`` edge table — one
    bucketed dedup reduce with a map-side combiner, count on the
    deduped residue."""
    from ..stages.infer import bucketed_reduce

    node_schema = pa.schema([("node", pa.string())])

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "node" not in b.columns:
            return pd.DataFrame({"node": pd.Series(dtype=object)})
        return b[["node"]].drop_duplicates()

    nodes = und.map_batches(
        lambda b: pd.DataFrame(
            {"node": pd.concat([b["a"], b["b"]], ignore_index=True)}
        ).drop_duplicates()
        if len(b)
        else pd.DataFrame({"node": pd.Series(dtype=object)}),
        batch_format="pandas",
    )
    return bucketed_reduce(
        nodes, ["node"], _dd, node_schema, combiner=_dd
    ).count()


def _edge_label_counts(und, labels, label_col: str) -> tuple[int, int]:
    """Join a ``(node, <label_col>)`` table onto both endpoints of an
    ``(a, b)`` undirected edge table: ``(n_edges_both_labeled,
    n_equal_label)`` — the shared engine of the coloring/partitioning
    acceptance checks. Two node-keyed cogroup exchanges, 2-int residue."""
    from ..stages.infer import default_num_partitions, sanitize_for_join

    l_schema = pa.schema([("node", pa.string()), (label_col, pa.int64())])
    a_side = und.map_batches(
        lambda b: pd.DataFrame({"node": b["a"], "b": b["b"]}),
        batch_format="pandas",
    )
    j1 = cogroup_join(
        a_side,
        sanitize_for_join(labels, l_schema),
        on=["node"],
        how="inner",
        left_schema=pa.schema([("node", pa.string()), ("b", pa.string())]),
        right_schema=l_schema,
        num_buckets=default_num_partitions(),
    ).map_batches(
        lambda b: pd.DataFrame(
            {"node": b["b"], "la_": b[label_col].astype("int64")}
        ),
        batch_format="pandas",
    )
    j2 = cogroup_join(
        j1,
        sanitize_for_join(
            labels.map_batches(
                lambda b: pd.DataFrame(
                    {"node": b["node"], "lb_": b[label_col].astype("int64")}
                ),
                batch_format="pandas",
            ),
            pa.schema([("node", pa.string()), ("lb_", pa.int64())]),
        ),
        on=["node"],
        how="inner",
        left_schema=pa.schema([("node", pa.string()), ("la_", pa.int64())]),
        right_schema=pa.schema([("node", pa.string()), ("lb_", pa.int64())]),
        num_buckets=default_num_partitions(),
    )
    agg = j2.map_batches(
        lambda b: pd.DataFrame(
            {
                "n": [len(b)],
                "eq": [int((b["la_"].to_numpy() == b["lb_"].to_numpy()).sum())],
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    return (int(agg["n"].sum()) if len(agg) else 0,
            int(agg["eq"].sum()) if len(agg) else 0)


def q_link_coloring(sf_dir: str):
    """Properness acceptance check of the web-link-graph greedy
    coloring (driver-checkable surface; raw colors:
    :func:`link_coloring_colors`): ``(n_nodes, n_colored,
    n_monochrome)`` where the oracle derives n_nodes from the link
    graph and a PROPER total coloring must give ``n_colored = n_nodes``
    and ``n_monochrome = 0``. Palette size is greedy-order-dependent
    (not SQL-predictable) — pinned in pytest instead."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import undirected_simple_edges
    from ..stages.webtext import link_edges

    edges = link_edges(pages_from_documents(sf_dir)).materialize()
    und = undirected_simple_edges(edges).materialize()
    colors = link_coloring_colors(sf_dir).materialize()
    n_nodes = _distinct_node_count(und)
    n_both, n_mono = _edge_label_counts(und, colors, "color")
    # coverage: every edge joined both endpoints <=> every node colored
    n_colored = colors.count()
    if n_both != und.count():
        n_colored = -1  # uncovered edges: fail loudly in the compare
    return pd.DataFrame(
        {
            "n_nodes": pd.Series([n_nodes], dtype="int64"),
            "n_colored": pd.Series([n_colored], dtype="int64"),
            "n_monochrome": pd.Series([n_mono], dtype="int64"),
        }
    )


def q_events_session_paths(sf_dir: str):
    """Top-20 within-session event-type paths (funnel/path mining) —
    sessionization + ordered path build fused into one user-keyed
    reduce, path counts pre-aggregated per bucket, local-top-k merge;
    deterministic (ts, event_id) order; hash-exact vs a
    window+string_agg twin."""
    from ..stages.sessions import session_paths

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )
    return session_paths(ev, gap_minutes=30, top_k=20)


def q_doc_oov_rate(sf_dir: str):
    """Per-document OOV counts vs the corpus top-1000 vocabulary —
    the tokenizer-budget coverage audit; two-pass broadcast-dictionary
    shape (distributed term count, capped vocab broadcast once,
    map-only second pass); hash-exact vs a top-k CTE twin."""
    from ..stages.text_analysis import oov_rate

    return oov_rate(_docs(sf_dir), vocab_size=1000)


def q_doc_auc(sf_dir: str):
    """Exact integer ROC-AUC (doubled Mann-Whitney U, half-credit
    ties) of the english-confidence score against the lang-ID label —
    the filter-model ranking audit next to doc_calibration; bounded
    score domain makes the cumulative residue <= 1000 rows."""
    from ..stages.text_analysis import auc_sums

    return auc_sums(_docs(sf_dir))


def q_part_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape: for every LARGE-type part, the cheapest
    EUROPE-region shipment price and the smallest supplier key
    achieving it (the correlated-min-subquery shape). Plan: region
    supplier set and eligible partkeys broadcast (sorted arrays);
    per-part min + argmin inside ONE bucketed reduce with a map-side
    min combiner — the correlated subquery never exists as a join."""
    import ray as _ray

    from ..stages.infer import bucketed_reduce

    part = pd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_type"])
    supp = pd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    reg = pd.read_parquet(_t(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    eur_keys = reg.loc[reg["r_name"] == "EUROPE", "r_regionkey"]
    eur_nations = (
        set(nat.loc[nat["n_regionkey"] == int(eur_keys.iloc[0]), "n_nationkey"].astype(int))
        if len(eur_keys)
        else set()
    )
    eur_supp = np.sort(
        supp.loc[supp["s_nationkey"].isin(eur_nations), "s_suppkey"].to_numpy(np.int64)
    )
    large = np.sort(
        part.loc[part["p_type"] == "LARGE", "p_partkey"].to_numpy(np.int64)
    )
    supp_ref, part_ref = _ray.put(eur_supp), _ray.put(large)

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey", "l_extendedprice"]
    )

    def _isin(keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(len(vals), dtype=bool)
        idx = np.clip(np.searchsorted(keys, vals), 0, len(keys) - 1)
        return keys[idx] == vals

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        sk = _ray.get(supp_ref) if isinstance(supp_ref, _ray.ObjectRef) else supp_ref
        pk = _ray.get(part_ref) if isinstance(part_ref, _ray.ObjectRef) else part_ref
        keep = _isin(sk, b["l_suppkey"].to_numpy()) & _isin(pk, b["l_partkey"].to_numpy())
        b = b[keep]
        out = pd.DataFrame(
            {
                "p_partkey": b["l_partkey"].to_numpy(),
                "s_suppkey": b["l_suppkey"].to_numpy(),
                "price_c": np.rint(b["l_extendedprice"].to_numpy() * 100).astype(np.int64),
            }
        )
        return out

    def _min(g: pd.DataFrame) -> pd.DataFrame:
        # map-side combiner AND per-bucket reducer: min price per
        # part, then min suppkey among rows achieving it — idempotent
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "p_partkey": pd.Series(dtype="int64"),
                    "s_suppkey": pd.Series(dtype="int64"),
                    "price_c": pd.Series(dtype="int64"),
                }
            )
        mn = g.groupby("p_partkey")["price_c"].transform("min")
        g = g[g["price_c"].to_numpy() == mn.to_numpy()]
        return g.groupby(["p_partkey", "price_c"], as_index=False)["s_suppkey"].min()[
            ["p_partkey", "s_suppkey", "price_c"]
        ]

    out_schema = pa.schema(
        [
            pa.field("p_partkey", pa.int64()),
            pa.field("s_suppkey", pa.int64()),
            pa.field("min_price_cents", pa.int64()),
        ]
    )
    reduced = bucketed_reduce(
        li.map_batches(_pre, batch_format="pandas"),
        ["p_partkey"],
        lambda g: _min(g).rename(columns={"price_c": "min_price_cents"}),
        out_schema,
        combiner=_min,
    )
    return reduced


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: revenue delta from 1997 shipments with
    discount 5-7% and quantity < 24 — pure predicate + global sum;
    map-only integer partials, zero shuffles, one tiny driver add."""
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    li = read_parquet_clean(
        _t(sf_dir, "lineitem"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        disc = np.rint(b["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = np.rint(b["l_quantity"].to_numpy()).astype(np.int64)
        keep = (
            (b["l_shipdate"].to_numpy() >= lo.to_datetime64())
            & (b["l_shipdate"].to_numpy() < hi.to_datetime64())
            & (disc >= 5) & (disc <= 7) & (qty < 24)
        )
        price = np.rint(b["l_extendedprice"].to_numpy()[keep] * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "revenue_e4": [int((price * disc[keep]).sum())],
                "n_rows": [int(keep.sum())],
            }
        )

    parts = li.map_batches(_partial, batch_format="pandas").to_pandas()
    return pd.DataFrame(
        {
            "revenue_e4": pd.Series([int(parts["revenue_e4"].sum())], dtype="int64"),
            "n_rows": pd.Series([int(parts["n_rows"].sum())], dtype="int64"),
        }
    )


def q_important_parts(sf_dir: str):
    """TPC-H Q11 shape: parts whose shipped value exceeds 0.08% of
    the corpus-wide total (the global-threshold HAVING). Plan:
    per-part integer value sums via one bucketed reduce; the grand
    total is a map-only second pass over the SAME materialized
    per-part table (tiny), then the filter is map-only — the global
    scalar never forces a second full scan of lineitem."""
    from ..stages.infer import bucketed_reduce, sanitize_for_join

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "p_partkey": b["l_partkey"].to_numpy(),
                "value_e2": np.rint(b["l_quantity"].to_numpy()).astype(np.int64)
                * np.rint(b["l_extendedprice"].to_numpy() * 100).astype(np.int64),
            }
        )
        return out.groupby("p_partkey", as_index=False).sum()

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby("p_partkey", as_index=False)["value_e2"].sum()

    schema = pa.schema(
        [pa.field("p_partkey", pa.int64()), pa.field("value_e2", pa.int64())]
    )
    per_part = bucketed_reduce(
        li.map_batches(_pre, batch_format="pandas"), ["p_partkey"], _sum, schema,
        combiner=_sum,
    ).materialize()
    totals = per_part.map_batches(
        lambda b: pd.DataFrame({"t": [int(b["value_e2"].sum())]}),
        batch_format="pandas",
    ).to_pandas()
    total = int(totals["t"].sum()) if len(totals) else 0

    def _filter(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["value_e2"].to_numpy() * 1250 > total]

    # sanitize: a fully-filtered result must still carry its schema;
    # Ray loses the schema of an EMPTY from_arrow dataset entirely, so
    # the empty case returns the typed pa.Table itself
    res = sanitize_for_join(
        per_part.map_batches(_filter, batch_format="pandas"), schema
    )
    if res.count() == 0:
        return schema.empty_table()
    return res


def link_partition_labels(sf_dir: str):
    """Capacity-constrained LPA partitioning of the web-link graph
    into 8 co-location groups (<= 1.1x balanced) — the layout planner
    a 100-TB ingest would use to keep linked pages on the same shard;
    the raw ``(node, partition)`` table (iterated LPA is not
    SQL-expressible); determinism/capacity/cut-improvement pinned in
    pytest."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import capacity_partition
    from ..stages.webtext import link_edges

    return capacity_partition(link_edges(pages_from_documents(sf_dir)), k=8)


def q_link_partition(sf_dir: str):
    """Capacity/coverage acceptance check of the link-graph
    partitioner (driver-checkable surface; raw labels:
    :func:`link_partition_labels`): ``(n_nodes, n_labeled, capacity,
    n_over_capacity)``. The oracle derives ``n_nodes`` from the link
    graph and the ceil(1.1 * n / 8) capacity from the same integer
    formula as graph_algos.capacity_partition; a correct partitioning
    labels every node exactly once and never exceeds the cap, so
    ``n_labeled = n_nodes`` and ``n_over_capacity = 0``. Which
    partition each node lands in is LPA-iteration-dependent — pinned
    in pytest, not SQL-predictable."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import undirected_simple_edges
    from ..stages.webtext import link_edges

    k = 8
    edges = link_edges(pages_from_documents(sf_dir)).materialize()
    und = undirected_simple_edges(edges).materialize()
    parts = link_partition_labels(sf_dir).materialize()
    n_nodes = _distinct_node_count(und)
    capacity = -(-n_nodes * 11 // (10 * k))
    sizes = (
        parts.map_batches(
            lambda b: b.groupby("partition", as_index=False)
            .size()
            .rename(columns={"size": "n"})
            if len(b)
            else pd.DataFrame(
                {"partition": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64")}
            ),
            batch_format="pandas",
        )
        .to_pandas()  # k-row residue after the map-side census
    )
    size_agg = (
        sizes.groupby("partition")["n"].sum()
        if len(sizes)
        else pd.Series(dtype=int)
    )
    return pd.DataFrame(
        {
            "n_nodes": pd.Series([n_nodes], dtype="int64"),
            "n_labeled": pd.Series([int(size_agg.sum())], dtype="int64"),
            "capacity": pd.Series([capacity], dtype="int64"),
            "n_over_capacity": pd.Series(
                [int((size_agg > capacity).sum())], dtype="int64"
            ),
        }
    )


def q_orders_cohort_ltv(sf_dir: str):
    """Cohort LTV triangle: customers grouped by first-order month,
    revenue (cents) and order count per months-since-first offset —
    the classic retention-revenue report. Plan: per-customer first
    month via one bucketed MIN reduce (min is its own combiner), ONE
    custkey cogroup exchange to attach cohorts, then string-keyed
    grouped sums on the (cohort, offset) pair."""
    from ..stages.infer import bucketed_reduce, default_num_partitions

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def _m(ts: pd.Series) -> np.ndarray:
        return (
            ts.dt.year.to_numpy(np.int64) * 12 + ts.dt.month.to_numpy(np.int64) - 1
        )

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"o_custkey": pd.Series(dtype="int64"),
                 "cohort_m": pd.Series(dtype="int64")}
            )
        if "cohort_m" in g.columns:
            return g.groupby("o_custkey", as_index=False)["cohort_m"].min()
        out = pd.DataFrame(
            {"o_custkey": g["o_custkey"].to_numpy(), "cohort_m": _m(g["o_orderdate"])}
        )
        return out.groupby("o_custkey", as_index=False)["cohort_m"].min()

    first_schema = pa.schema(
        [pa.field("o_custkey", pa.int64()), pa.field("cohort_m", pa.int64())]
    )
    cohorts = bucketed_reduce(
        orders.select_columns(["o_custkey", "o_orderdate"]),
        ["o_custkey"],
        _first,
        first_schema,
        combiner=_first,
    )

    def _rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].to_numpy(),
                "order_m": _m(b["o_orderdate"]),
                "cents": np.rint(b["o_totalprice"].to_numpy() * 100).astype(np.int64),
            }
        )

    joined = cogroup_join(
        orders.map_batches(_rows, batch_format="pandas"),
        cohorts,
        on=["o_custkey"],
        how="inner",
        coalesce=default_num_partitions(),
        right_schema=first_schema,
    )

    def _shape(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cohort_m": b["cohort_m"].astype("int64"),
                "offset_m": (b["order_m"] - b["cohort_m"]).astype("int64"),
                "cents": b["cents"].astype("int64"),
            }
        )

    return grouped_sums(
        joined.map_batches(_shape, batch_format="pandas"),
        ["cohort_m", "offset_m"],
        {"revenue_cents": "cents"},
        count_name="n_orders",
    )


def q_doc_rake_keyphrases(sf_dir: str):
    """RAKE-style top keyphrase per document: candidate phrases are
    maximal stopword-free token runs (the gaps-and-islands shape), a
    word's degree sums the lengths of the phrases it occurs in, a
    phrase scores the integer pair (deg_sum, freq_sum) over its word
    occurrences, and the doc's winner is (deg_sum desc, phrase asc).
    Entirely MAP-ONLY (all stats are per-document) — zero shuffles;
    hash-exact vs an islands + window SQL twin sharing the en-marker
    stoplist."""
    from ..stages.text_analysis import rake_top_phrases

    return rake_top_phrases(_docs(sf_dir))


def q_doc_prefix_dedup(sf_dir: str):
    """Prefix dedup (C4-style): collapse documents sharing the same
    first-100-char md5 — catches templated pages whose tails differ
    (mirrored boilerplate, timestamps) that exact dedup misses. Same
    shuffle-on-the-hash shape as exact_dedup; emits (prefix_md5,
    keep_id = min doc_id, n_docs)."""
    import hashlib as _hl

    from ..stages.infer import bucketed_reduce

    def _hash(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "prefix_md5": [
                    _hl.md5(((t or "")[:100]).encode("utf-8")).hexdigest()
                    for t in b["text"]
                ],
                "keep_id": b["doc_id"].to_numpy(),
                "n_docs": np.ones(len(b), dtype=np.int64),
            }
        )
        return out.groupby("prefix_md5", as_index=False).agg(
            keep_id=("keep_id", "min"), n_docs=("n_docs", "sum")
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby("prefix_md5", as_index=False).agg(
            keep_id=("keep_id", "min"), n_docs=("n_docs", "sum")
        )

    schema = pa.schema(
        [
            pa.field("prefix_md5", pa.string()),
            pa.field("keep_id", pa.int64()),
            pa.field("n_docs", pa.int64()),
        ]
    )
    return bucketed_reduce(
        _docs(sf_dir).map_batches(_hash, batch_format="pandas"),
        ["prefix_md5"],
        _reduce,
        schema,
        combiner=_reduce,
    )


def q_orders_benford(sf_dir: str):
    """Benford first-digit census of order totals (cents) — the
    classic fabricated-data audit; map-side digit partials, one tiny
    string-keyed grouped sum."""
    orders = read_parquet_clean(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def _digits(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        # digit stays a STRING key: native groupby aggregates on
        # non-string keys pay ~10s of fixed exchange cost (NOTES.md)
        d = pd.Series(cents).astype(str).str[0]
        return pd.DataFrame({"digit": d, "n": np.ones(len(b), dtype=np.int64)})

    return grouped_sums(
        orders.map_batches(_digits, batch_format="pandas"), ["digit"], {"n": "n"}
    )


def q_events_anomalous_hours(sf_dir: str):
    """Hours whose event count exceeds mean + 3 sigma — entirely in
    integers: with S = sum(x), SS = sum(x^2) over the n hourly
    counts, hour x is anomalous iff ``(n*x - S)^2 > 9*(n*SS - S^2)``
    and ``n*x > S`` (one-sided). Hourly counts reduce distributed; the
    moment sums come from that span-bounded residue; the filter is
    map-only. Hash-exact vs a window twin."""
    from ..stages.infer import bucketed_reduce

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["ts"])

    def _hour(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("datetime64[us]").astype("int64")
        out = pd.DataFrame({"hour": us // 3_600_000_000})
        g = out.groupby("hour", as_index=False).size().rename(columns={"size": "n"})
        return g.astype({"hour": "int64", "n": "int64"})

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby("hour", as_index=False)["n"].sum()

    schema = pa.schema([pa.field("hour", pa.int64()), pa.field("n", pa.int64())])
    hourly = bucketed_reduce(
        ev.map_batches(_hour, batch_format="pandas"), ["hour"], _sum, schema,
        combiner=_sum,
    ).materialize()
    mom = hourly.map_batches(
        lambda b: pd.DataFrame(
            {
                "cnt": [len(b)],
                "s": [int(b["n"].sum())],
                "ss": [int((b["n"].astype("int64") ** 2).sum())],
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    n_h, s, ss = int(mom["cnt"].sum()), int(mom["s"].sum()), int(mom["ss"].sum())

    def _flag(b: pd.DataFrame) -> pd.DataFrame:
        x = b["n"].to_numpy(np.int64)
        d = n_h * x - s
        keep = (d > 0) & (d.astype(object) ** 2 > 9 * (n_h * ss - s * s))
        return b[np.asarray(keep, dtype=bool)]

    from ..stages.infer import sanitize_for_join

    res = sanitize_for_join(
        hourly.map_batches(_flag, batch_format="pandas"), schema
    )
    if res.count() == 0:
        return schema.empty_table()
    return res


def q_customer_pareto(sf_dir: str):
    """Pareto concentration: the smallest number of customers whose
    order revenue covers 80% of the total (plus the totals) — one
    per-customer integer revenue reduce, then the cumulative rank over
    the customer residue via a driver sort on the (bounded-domain)
    per-customer table at test scale, documented scale path =
    ``row_positions`` over (revenue desc, custkey). Hash-exact vs a
    window-cumsum twin."""
    from ..stages.infer import bucketed_reduce

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].to_numpy(),
                "cents": np.rint(b["o_totalprice"].to_numpy() * 100).astype(np.int64),
            }
        )
        return out.groupby("o_custkey", as_index=False).sum()

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby("o_custkey", as_index=False)["cents"].sum()

    schema = pa.schema(
        [pa.field("o_custkey", pa.int64()), pa.field("cents", pa.int64())]
    )
    per_cust = bucketed_reduce(
        orders.map_batches(_pre, batch_format="pandas"), ["o_custkey"], _sum,
        schema, combiner=_sum,
    ).to_pandas()
    per_cust = per_cust.sort_values(
        ["cents", "o_custkey"], ascending=[False, True], kind="stable"
    )
    total = int(per_cust["cents"].sum())
    cum = per_cust["cents"].cumsum()
    # smallest prefix with cum*5 >= total*4  (cum >= 80%)
    covered = (cum * 5 >= total * 4).to_numpy()
    n80 = int(np.argmax(covered)) + 1 if covered.any() else 0
    return pd.DataFrame(
        {
            "n_customers_80pct": pd.Series([n80], dtype="int64"),
            "n_customers": pd.Series([len(per_cust)], dtype="int64"),
            "total_cents": pd.Series([total], dtype="int64"),
        }
    )


def q_link_pred_eval(sf_dir: str):
    """Link-prediction evaluation harness: hold out ~25% of the
    triangle-bearing fixture graph's distinct edges by an md5 pair
    split (deterministic, same side for every multi-edge of a pair),
    score the TRAINING graph with exact-integer resource allocation,
    and report how many held-out pairs appear in the top-100
    predictions. Rows-only (the composite is deterministic; RA itself
    is oracle-checked via graph_link_pred); planted-hit pytest."""
    import hashlib as _hl

    from ..stages.graph_algos import resource_allocation_topk
    from ..stages.infer import bucketed_reduce

    edges = _cnrs_edges(sf_dir)

    def _tag(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].astype(str)
        d = b["dst"].astype(str)
        lo = s.where(s < d, d)
        hi = d.where(s < d, s)
        md5 = _hl.md5
        # first hex digit in '0123' <=> first digest byte < 0x40; the
        # digest call is the work (C loop), no hexdigest strings built
        first = np.fromiter(
            (md5(k.encode()).digest()[0] for k in (lo + "|" + hi).to_numpy(object)),
            dtype=np.uint8,
            count=len(b),
        )
        return pd.DataFrame({"a": lo, "b": hi, "is_test": first < 0x40})

    tagged = edges.map_batches(_tag, batch_format="pandas").materialize()
    train = tagged.map_batches(
        lambda b: pd.DataFrame(
            {"src": b.loc[~b["is_test"], "a"], "dst": b.loc[~b["is_test"], "b"]}
        ),
        batch_format="pandas",
    )

    def _distinct(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"a": pd.Series(dtype="object"), "b": pd.Series(dtype="object")}
            )
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    test_pairs = bucketed_reduce(
        tagged.map_batches(
            lambda b: b.loc[b["is_test"], ["a", "b"]], batch_format="pandas"
        ),
        ["a", "b"],
        _distinct,
        pair_schema,
        combiner=_distinct,
    ).materialize()
    n_test = test_pairs.count()

    preds = resource_allocation_topk(train, top_k=100).to_pandas()
    pred_set = set(zip(preds["x"], preds["y"]))

    hits = test_pairs.map_batches(
        lambda b: pd.DataFrame(
            {
                "h": [
                    int(
                        sum(
                            (a, c) in pred_set
                            for a, c in zip(b["a"], b["b"])
                        )
                    )
                ]
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    n_hits = int(hits["h"].sum()) if len(hits) else 0
    return pd.DataFrame(
        {
            "n_test": pd.Series([n_test], dtype="int64"),
            "n_hits": pd.Series([n_hits], dtype="int64"),
            "k": pd.Series([100], dtype="int64"),
        }
    )


def q_events_hll_rollup(sf_dir: str):
    """Mergeable-sketch distinct-user rollup: HLL registers computed
    once per (day, type), merged up to per-day and global without
    rescanning events — the warehouse distinct-count hierarchy; the
    rolled-up estimates are bit-identical to direct sketches (pinned
    in pytest). Rows-only (approximate by design)."""
    from ..stages.sketches import hll_rollup

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["ts", "user_id", "event_type"])

    def _day(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "day": (us // 86_400_000_000).astype("int64").astype(str),
                "event_type": b["event_type"],
                "user_id": b["user_id"],
            }
        )

    return hll_rollup(
        ev.map_batches(_day, batch_format="pandas"),
        "user_id",
        [["day", "event_type"], ["day"], []],
    )


def q_source_ks_drift(sf_dir: str):
    """Exact integer two-sample Kolmogorov-Smirnov statistic between
    the token-count distributions of two sources (src0 vs src1):
    ``KS = ks_num / ks_den`` with ``ks_num = max_v |cum0(v)*n1 -
    cum1(v)*n0|`` over the merged support and ``ks_den = n0*n1`` —
    the drift test a feed monitor runs between two crawls, hash-exact
    where a float ECDF never could be. Per-value counts reduce
    distributed; the cumulative pass runs on the value-domain-bounded
    residue."""
    from ..stages.infer import bucketed_reduce

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "text", "source"]
    )

    def _tok(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["source"].isin(["src0", "src1"])]
        if len(b) == 0:
            return pd.DataFrame(
                {"v": pd.Series(dtype="int64"),
                 "c0": pd.Series(dtype="int64"),
                 "c1": pd.Series(dtype="int64")}
            )
        t = b["text"].fillna("")
        stripped = t.str.strip()
        n_tok = stripped.str.split().str.len().fillna(0)
        n_tok = n_tok.where(stripped.str.len() > 0, 0).astype("int64")
        f = pd.DataFrame(
            {
                "v": n_tok.to_numpy(),
                "c0": (b["source"] == "src0").astype("int64").to_numpy(),
                "c1": (b["source"] == "src1").astype("int64").to_numpy(),
            }
        )
        return f.groupby("v", as_index=False).sum()

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby("v", as_index=False)[["c0", "c1"]].sum()

    schema = pa.schema(
        [pa.field("v", pa.int64()), pa.field("c0", pa.int64()), pa.field("c1", pa.int64())]
    )
    hist = bucketed_reduce(
        docs.map_batches(_tok, batch_format="pandas", batch_size=None),
        ["v"], _sum, schema, combiner=_sum,
    ).to_pandas().sort_values("v").reset_index(drop=True)
    n0, n1 = int(hist["c0"].sum()), int(hist["c1"].sum())
    cum0, cum1 = hist["c0"].cumsum(), hist["c1"].cumsum()
    ks_num = int((cum0 * n1 - cum1 * n0).abs().max()) if len(hist) else 0
    return pd.DataFrame(
        {
            "ks_num": pd.Series([ks_num], dtype="int64"),
            "ks_den": pd.Series([n0 * n1], dtype="int64"),
            "n_a": pd.Series([n0], dtype="int64"),
            "n_b": pd.Series([n1], dtype="int64"),
        }
    )


def q_events_best_split(sf_dir: str):
    """Offline changepoint (first binary-segmentation split) of the
    hourly event volume: the hour whose prefix deviates most from the
    proportional share — ``crit = |cum_i * n_hours - total * i|``,
    all integers, ties to the earliest hour. Hourly reduce
    distributed; the argmax runs on the span-bounded residue."""
    from ..stages.infer import bucketed_reduce

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["ts"])

    def _hour(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("datetime64[us]").astype("int64")
        out = pd.DataFrame({"hour": us // 3_600_000_000})
        return out.groupby("hour", as_index=False).size().rename(
            columns={"size": "n"}
        ).astype({"hour": "int64", "n": "int64"})

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby("hour", as_index=False)["n"].sum()

    schema = pa.schema([pa.field("hour", pa.int64()), pa.field("n", pa.int64())])
    hourly = bucketed_reduce(
        ev.map_batches(_hour, batch_format="pandas"), ["hour"], _sum, schema,
        combiner=_sum,
    ).to_pandas().sort_values("hour").reset_index(drop=True)
    n_h, tot = len(hourly), int(hourly["n"].sum())
    cum = hourly["n"].cumsum()
    i = np.arange(1, n_h + 1, dtype=np.int64)
    crit = (cum.to_numpy() * n_h - tot * i)
    crit = np.abs(crit)
    best = int(np.argmax(crit))  # argmax takes the FIRST max — earliest hour
    return pd.DataFrame(
        {
            "split_hour": pd.Series([int(hourly["hour"].iloc[best])], dtype="int64"),
            "crit": pd.Series([int(crit[best])], dtype="int64"),
        }
    )


def q_orders_rapid_reorder(sf_dir: str):
    """Rapid-reorder pairs: two orders of the SAME customer within 14
    days (the double-charge / compulsive-reorder audit) — one
    custkey-bucketed reduce with a vectorized within-group self-merge
    and time filter (group residue = that customer's order count);
    hash-exact vs a self-join twin."""
    from ..stages.infer import bucketed_reduce

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )
    window_us = 14 * 86_400_000_000

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "o_custkey": pd.Series(dtype="int64"),
                    "okey1": pd.Series(dtype="int64"),
                    "okey2": pd.Series(dtype="int64"),
                    "gap_days": pd.Series(dtype="int64"),
                }
            )
        f = pd.DataFrame(
            {
                "o_custkey": g["o_custkey"].to_numpy(),
                "okey": g["o_orderkey"].to_numpy(),
                "us": g["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy(),
            }
        )
        m = f.merge(f, on="o_custkey", suffixes=("_1", "_2"))
        m = m[
            (m["okey_1"] < m["okey_2"])
            & ((m["us_1"] - m["us_2"]).abs() <= window_us)
        ]
        return pd.DataFrame(
            {
                "o_custkey": m["o_custkey"].to_numpy(),
                "okey1": m["okey_1"].to_numpy(),
                "okey2": m["okey_2"].to_numpy(),
                "gap_days": ((m["us_1"] - m["us_2"]).abs() // 86_400_000_000).to_numpy(),
            }
        )

    schema = pa.schema(
        [
            pa.field("o_custkey", pa.int64()),
            pa.field("okey1", pa.int64()),
            pa.field("okey2", pa.int64()),
            pa.field("gap_days", pa.int64()),
        ]
    )
    return bucketed_reduce(orders, ["o_custkey"], _pairs, schema)


def q_nations_cs_intersect_all(sf_dir: str):
    """Bag-semantics INTERSECT ALL: nation keys with multiplicity
    min(#customers, #suppliers) — per-key multiplicity partials, one
    bucketed sum, np.repeat re-emission; hash-exact vs SQL INTERSECT
    ALL."""
    from ..stages.setops import intersect_all

    schema = pa.schema([pa.field("nationkey", pa.int64())])
    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_nationkey"]
    ).map_batches(
        lambda b: pa.table({"nationkey": pc.cast(b["c_nationkey"], pa.int64())}),
        batch_format="pyarrow",
    )
    supp = read_parquet_clean(
        _t(sf_dir, "supplier"), columns=["s_nationkey"]
    ).map_batches(
        lambda b: pa.table({"nationkey": pc.cast(b["s_nationkey"], pa.int64())}),
        batch_format="pyarrow",
    )
    return intersect_all(cust, supp, ["nationkey"], schema)


def q_nations_cs_except_all(sf_dir: str):
    """Bag-semantics EXCEPT ALL: customer nation keys surviving with
    multiplicity max(0, #customers - #suppliers); same machinery as
    the INTERSECT ALL twin."""
    from ..stages.setops import except_all

    schema = pa.schema([pa.field("nationkey", pa.int64())])
    cust = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_nationkey"]
    ).map_batches(
        lambda b: pa.table({"nationkey": pc.cast(b["c_nationkey"], pa.int64())}),
        batch_format="pyarrow",
    )
    supp = read_parquet_clean(
        _t(sf_dir, "supplier"), columns=["s_nationkey"]
    ).map_batches(
        lambda b: pa.table({"nationkey": pc.cast(b["s_nationkey"], pa.int64())}),
        batch_format="pyarrow",
    )
    return except_all(cust, supp, ["nationkey"], schema)


def q_customer_revenue_gini(sf_dir: str):
    """Exact integer Gini coefficient of customer revenue
    concentration: with revenues sorted ascending, ``gini_num =
    2*sum(i*x_i) - (n+1)*total`` and ``gini_den = n*total`` — the
    wealth-concentration complement of the Pareto query, hash-exact
    vs a window twin. Per-customer reduce distributed; the weighted
    rank sum runs over the per-customer residue (scale path:
    row_positions)."""
    from ..stages.infer import bucketed_reduce

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].to_numpy(),
                "cents": np.rint(b["o_totalprice"].to_numpy() * 100).astype(np.int64),
            }
        )
        return out.groupby("o_custkey", as_index=False).sum()

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby("o_custkey", as_index=False)["cents"].sum()

    schema = pa.schema(
        [pa.field("o_custkey", pa.int64()), pa.field("cents", pa.int64())]
    )
    pc_df = bucketed_reduce(
        orders.map_batches(_pre, batch_format="pandas"), ["o_custkey"], _sum,
        schema, combiner=_sum,
    ).to_pandas()
    pc_df = pc_df.sort_values(
        ["cents", "o_custkey"], ascending=[True, True], kind="stable"
    ).reset_index(drop=True)
    n = len(pc_df)
    total = int(pc_df["cents"].sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    num = 2 * int((i * pc_df["cents"].to_numpy()).sum()) - (n + 1) * total
    return pd.DataFrame(
        {
            "gini_num": pd.Series([num], dtype="int64"),
            "gini_den": pd.Series([n * total], dtype="int64"),
            "n_customers": pd.Series([n], dtype="int64"),
        }
    )


def q_events_late_quarantine(sf_dir: str):
    """Late-data accounting: per user, how many events arrived (by
    event_id order — the ingestion sequence) with an event time more
    than 5 minutes behind the running event-time high-water mark —
    the quarantine counter a watermark-driven sink keeps. One
    user-keyed reduce (vectorized sort + shifted cummax); hash-exact
    vs a window twin."""
    from ..stages.infer import bucketed_reduce

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "event_id", "ts"]
    )
    allowed_us = 5 * 60 * 1_000_000

    def _late(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                    "n_late": pd.Series(dtype="int64"),
                }
            )
        b = g.sort_values(["user_id", "event_id"], kind="stable")
        us = b["ts"].astype("datetime64[us]").astype("int64")
        hwm_prev = us.groupby(b["user_id"].to_numpy()).cummax().groupby(
            b["user_id"].to_numpy()
        ).shift(1)
        late = (hwm_prev - us) > allowed_us
        out = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "one": np.ones(len(b), dtype=np.int64),
                "late": late.fillna(False).astype("int64").to_numpy(),
            }
        ).groupby("user_id", as_index=False).sum()
        return out.rename(columns={"one": "n_events", "late": "n_late"}).astype(
            {"user_id": "int64", "n_events": "int64", "n_late": "int64"}
        )

    schema = pa.schema(
        [
            pa.field("user_id", pa.int64()),
            pa.field("n_events", pa.int64()),
            pa.field("n_late", pa.int64()),
        ]
    )
    return bucketed_reduce(ev, ["user_id"], _late, schema)


def q_orders_seasonal_index(sf_dir: str):
    """Month-of-year seasonality index of order revenue in integer
    bps (10000 = an average month): map-side month partials, one tiny
    string-keyed sum, the index computed on the 12-row residue."""
    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"]
    )

    def _m(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "month": b["o_orderdate"].dt.month.astype(str),
                "cents": np.rint(b["o_totalprice"].to_numpy() * 100).astype(np.int64),
            }
        )
        return out.groupby("month", as_index=False).sum()

    agg = (
        grouped_sums(
            orders.map_batches(_m, batch_format="pandas"),
            ["month"],
            {"revenue_cents": "cents"},
        )
        .to_pandas()
    )
    if len(agg) == 0 or "revenue_cents" not in agg.columns:
        # empty pipelines lose their schema (NOTES.md edge 7)
        return pd.DataFrame(
            {
                "month": pd.Series([], dtype="int64"),
                "revenue_cents": pd.Series([], dtype="int64"),
                "seasonal_bps": pd.Series([], dtype="int64"),
            }
        )
    total = int(agg["revenue_cents"].sum())
    agg["month"] = agg["month"].astype("int64")
    if total:
        agg["seasonal_bps"] = (agg["revenue_cents"] * 12 * 10000 // total).astype(
            "int64"
        )
    else:
        agg["seasonal_bps"] = np.zeros(len(agg), dtype=np.int64)
    return agg.sort_values("month").reset_index(drop=True)


def q_graph_lcc(sf_dir: str):
    """Per-node local clustering coefficient as the exact integer
    pair ``lcc = 2*triangles / (deg*(deg-1))`` — composes the
    oracle-checked triangle counts with distinct-neighbor degrees via
    one node-keyed cogroup join (nodes in no triangle get 0)."""
    from ..stages.graph_algos import (
        triangle_counts,
        undirected_degrees,
        undirected_simple_edges,
    )
    from ..stages.infer import default_num_partitions, sanitize_for_join

    edges = _cnrs_edges(sf_dir).materialize()
    und = undirected_simple_edges(edges)
    deg = undirected_degrees(und)
    tri = triangle_counts(edges)
    deg_schema = pa.schema([("node", pa.string()), ("degree", pa.int64())])
    tri_schema = pa.schema([("node", pa.string()), ("n_triangles", pa.int64())])
    joined = cogroup_join(
        sanitize_for_join(deg, deg_schema),
        sanitize_for_join(tri, tri_schema),
        on=["node"],
        how="left_outer",
        left_schema=deg_schema,
        right_schema=tri_schema,
        num_buckets=default_num_partitions(),
    )

    def _lcc(b: pd.DataFrame) -> pd.DataFrame:
        tri_n = b["n_triangles"].fillna(0).astype("int64")
        deg_n = b["degree"].astype("int64")
        return pd.DataFrame(
            {
                "node": b["node"].to_numpy(),
                "n_triangles": tri_n.to_numpy(),
                "degree": deg_n.to_numpy(),
                "lcc_num": (2 * tri_n).to_numpy(),
                "lcc_den": (deg_n * (deg_n - 1)).to_numpy(),
            }
        )

    return joined.map_batches(_lcc, batch_format="pandas")


def q_events_type_user_jaccard(sf_dir: str):
    """Exact Jaccard overlap between the user sets of two behaviors
    (view vs purchase): one user-keyed reduce collapsing to per-user
    presence flags (map-side dedup combiner), then tiny global sums —
    ``(n_both, n_either, n_view, n_purchase)`` all BIGINT."""
    from ..stages.infer import bucketed_reduce

    ev = read_parquet_clean(
        _t(sf_dir, "events"), columns=["user_id", "event_type"]
    )

    def _flags(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "v": pd.Series(dtype="int64"),
                    "p": pd.Series(dtype="int64"),
                }
            )
        # idempotent on its own output (branch on the OUTPUT-only col)
        if "v" in b.columns:
            f = b[["user_id", "v", "p"]]
        else:
            f = pd.DataFrame(
                {
                    "user_id": b["user_id"].to_numpy(),
                    "v": (b["event_type"] == "view").astype("int64").to_numpy(),
                    "p": (b["event_type"] == "purchase").astype("int64").to_numpy(),
                }
            )
        return f.groupby("user_id", as_index=False).max()

    schema = pa.schema(
        [pa.field("user_id", pa.int64()), pa.field("v", pa.int64()), pa.field("p", pa.int64())]
    )
    flags = bucketed_reduce(
        ev, ["user_id"], _flags, schema, combiner=_flags
    ).to_pandas()
    both = int(((flags["v"] == 1) & (flags["p"] == 1)).sum())
    either = int(((flags["v"] == 1) | (flags["p"] == 1)).sum())
    return pd.DataFrame(
        {
            "n_both": pd.Series([both], dtype="int64"),
            "n_either": pd.Series([either], dtype="int64"),
            "n_view": pd.Series([int((flags["v"] == 1).sum())], dtype="int64"),
            "n_purchase": pd.Series([int((flags["p"] == 1).sum())], dtype="int64"),
        }
    )


def q_link_partition_quality(sf_dir: str):
    """Edge-accounting acceptance check of the capacity-constrained
    partitioner (driver-checkable surface): ``(n_edges,
    n_edges_labeled, cut_ok)``. The oracle counts the link graph's
    distinct undirected simple edges; a total labeling joins BOTH
    endpoints of every edge (``n_edges_labeled = n_edges``) and the
    computed cut must satisfy ``0 <= cut <= n_edges`` (``cut_ok = 1``).
    The cut VALUE is LPA-iteration-dependent — its monotone
    improvement over rounds is pinned in pytest, not SQL-predictable.
    One broadcast-free pass joining labels through a node-keyed
    exchange (shared :func:`_edge_label_counts` engine)."""
    from ..sources.pages import pages_from_documents
    from ..stages.graph_algos import undirected_simple_edges
    from ..stages.webtext import link_edges

    edges = link_edges(pages_from_documents(sf_dir)).materialize()
    und = undirected_simple_edges(edges).materialize()
    parts = link_partition_labels(sf_dir).materialize()
    n_edges = und.count()
    n_both, n_internal = _edge_label_counts(und, parts, "partition")
    cut = n_both - n_internal
    return pd.DataFrame(
        {
            "n_edges": pd.Series([n_edges], dtype="int64"),
            "n_edges_labeled": pd.Series([n_both], dtype="int64"),
            "cut_ok": pd.Series(
                [int(0 <= cut <= n_edges)], dtype="int64"
            ),
        }
    )



def q_doc_lang_margin(sf_dir: str):
    """Classifier-margin audit for the lang-ID heuristic: per
    predicted language, a histogram of ``top1 - top2`` marker-count
    margins (bucketed 0-4, 5+) — the ambiguity profile reviewed
    before trusting the labels; map-side partials, one tiny grouped
    sum; hash-exact vs a greatest/least SQL twin."""
    from ..stages.text_analysis import _marker_re

    rx = {lang: _marker_re(lang) for lang in LANG_MARKERS}
    docs = _docs(sf_dir)

    def _m(b: pd.DataFrame) -> pd.DataFrame:
        low = b["text"].fillna("").str.lower()
        en = low.str.count(rx["en"]).astype("int64")
        de = low.str.count(rx["de"]).astype("int64")
        fr = low.str.count(rx["fr"]).astype("int64")
        pred = np.where(
            (en == 0) & (de == 0) & (fr == 0),
            "und",
            np.where((en >= de) & (en >= fr), "en",
                     np.where(de >= fr, "de", "fr")),
        )
        top1 = np.maximum(np.maximum(en, de), fr)
        least = np.minimum(np.minimum(en, de), fr)
        top2 = en + de + fr - top1 - least
        margin = np.minimum(top1 - top2, 5)
        out = pd.DataFrame(
            {"lang_pred": pred, "margin": margin.astype("int64").astype(str)}
        )
        g = out.groupby(["lang_pred", "margin"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    return grouped_sums(
        docs.map_batches(_m, batch_format="pandas", batch_size=None),
        ["lang_pred", "margin"],
        {"n": "n"},
    )


def q_doc_hapax(sf_dir: str):
    """Per-document hapax ratio ingredients: tokens occurring exactly
    once WITHIN the document vs total (lexical-richness signal next
    to repetition_stats) — map-only; hash-exact vs a per-doc
    subquery twin."""
    docs = _docs(sf_dir)

    def _f(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.lower().str.findall(r"\w+")
        lens = toks.str.len().fillna(0).astype(int).to_numpy()
        n_hapax = np.zeros(len(b), dtype=np.int64)
        if lens.sum():
            flat = np.concatenate([t for t in toks.to_numpy() if t])
            doc_idx = np.repeat(np.arange(len(b)), lens)
            df = pd.DataFrame({"d": doc_idx, "t": flat})
            vc = df.groupby(["d", "t"], sort=False).size()
            hap = vc[vc == 1].groupby(level=0).size()
            n_hapax[hap.index.to_numpy()] = hap.to_numpy()
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "n_tokens": lens.astype(np.int64),
                "n_hapax": n_hapax,
            }
        )

    return docs.map_batches(_f, batch_format="pandas")


def q_lineitem_gap_audit(sf_dir: str):
    """Line-number integrity audit: per order, linenumbers must be a
    gap-free 1..n sequence without duplicates — reported as corpus
    counters (orders checked / with gaps / with duplicate lines).
    One orderkey-keyed reduce (NO combiner — distinct counts are not
    additive across blocks, the reduce must see the whole key);
    hash-exact vs a grouped twin."""
    from ..stages.infer import bucketed_reduce

    li = read_parquet_clean(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber"]
    )

    def _per_order(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "l_orderkey": pd.Series(dtype="int64"),
                    "n_lines": pd.Series(dtype="int64"),
                    "max_line": pd.Series(dtype="int64"),
                    "n_distinct": pd.Series(dtype="int64"),
                }
            )
        g = b.groupby("l_orderkey", as_index=False).agg(
            n_lines=("l_linenumber", "size"),
            max_line=("l_linenumber", "max"),
            n_distinct=("l_linenumber", "nunique"),
        )
        return g.astype(
            {"l_orderkey": "int64", "n_lines": "int64", "max_line": "int64",
             "n_distinct": "int64"}
        )

    schema = pa.schema(
        [
            pa.field("l_orderkey", pa.int64()),
            pa.field("n_lines", pa.int64()),
            pa.field("max_line", pa.int64()),
            pa.field("n_distinct", pa.int64()),
        ]
    )
    # NOTE: nunique partials are only mergeable when an order's lines
    # sit in one batch — the reduce sees the whole key, so the
    # COMBINER must not pre-aggregate across blocks; no combiner here.
    per_order = bucketed_reduce(li, ["l_orderkey"], _per_order, schema)
    stats = per_order.map_batches(
        lambda b: pd.DataFrame(
            {
                "n_orders": [len(b)],
                "n_gap": [
                    int(
                        (
                            (b["max_line"].to_numpy() != b["n_distinct"].to_numpy())
                        ).sum()
                    )
                ],
                "n_dup": [
                    int((b["n_lines"].to_numpy() != b["n_distinct"].to_numpy()).sum())
                ],
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    return pd.DataFrame(
        {
            "n_orders": pd.Series([int(stats["n_orders"].sum())], dtype="int64"),
            "n_gap_orders": pd.Series([int(stats["n_gap"].sum())], dtype="int64"),
            "n_dup_orders": pd.Series([int(stats["n_dup"].sum())], dtype="int64"),
        }
    )


def q_orders_iso_week(sf_dir: str):
    """Order volume/revenue per ISO week — pins the ISO-8601
    year/week dialect parity (pandas ``isocalendar`` vs DuckDB
    ``isoyear``/``week``), where the civil-year boundary weeks
    (Jan 1 in week 52/53 of the PRIOR iso year) silently skew naive
    groupings. Map-side partials, one bucketed string-keyed sum."""
    from ..stages.infer import bucketed_reduce

    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"]
    )

    def _w(b: pd.DataFrame) -> pd.DataFrame:
        iso = b["o_orderdate"].dt.isocalendar()
        out = pd.DataFrame(
            {
                "iso_year": iso["year"].astype("int64").to_numpy(),
                "iso_week": iso["week"].astype("int64").to_numpy(),
                "n": np.ones(len(b), dtype=np.int64),
                "revenue_cents": np.rint(
                    b["o_totalprice"].to_numpy() * 100
                ).astype(np.int64),
            }
        )
        return out.groupby(["iso_year", "iso_week"], as_index=False).sum()

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby(["iso_year", "iso_week"], as_index=False)[
            ["n", "revenue_cents"]
        ].sum()

    schema = pa.schema(
        [
            pa.field("iso_year", pa.int64()),
            pa.field("iso_week", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("revenue_cents", pa.int64()),
        ]
    )
    return bucketed_reduce(
        orders.map_batches(_w, batch_format="pandas", batch_size=None),
        ["iso_year", "iso_week"],
        _sum,
        schema,
        combiner=_sum,
    )


def q_events_ab_stats(sf_dir: str):
    """A/B experiment sufficient statistics with the deterministic
    user-parity assignment (variant = user_id % 2): per variant,
    integer n / sum / sum-of-squares of the event value in cents —
    everything a Welch t downstream needs, hash-exact."""
    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "value"])

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b["value"].fillna(0).to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "variant": (b["user_id"].to_numpy() % 2).astype(np.int64).astype(str),
                "n": np.ones(len(b), dtype=np.int64),
                "sum_cents": cents,
                "sumsq_cents": cents * cents,
            }
        )
        return out.groupby("variant", as_index=False).sum()

    return grouped_sums(
        ev.map_batches(_pre, batch_format="pandas", batch_size=None),
        ["variant"],
        {"n": "n", "sum_cents": "sum_cents", "sumsq_cents": "sumsq_cents"},
    )


def q_events_wow_change(sf_dir: str):
    """Week-over-week volume change per event type, anchored at the
    corpus' max event time: counts in the trailing 7 days vs the 7
    days before, change in integer bps (prior floor-1 guarded). The
    anchor is one cheap max pass; both windows then come out of a
    single filtered partial sum."""
    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["event_type", "ts"])
    mx = ev.map_batches(
        lambda b: pd.DataFrame(
            {"m": [int(b["ts"].astype("datetime64[us]").astype("int64").max())]}
        ),
        batch_format="pandas",
    ).to_pandas()
    anchor = int(mx["m"].max())
    week = 7 * 86_400_000_000

    def _count(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        recent = (us > anchor - week) & (us <= anchor)
        prior = (us > anchor - 2 * week) & (us <= anchor - week)
        out = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(),
                "n_recent": recent.astype(np.int64),
                "n_prior": prior.astype(np.int64),
            }
        )
        return out.groupby("event_type", as_index=False).sum()

    agg = grouped_sums(
        ev.map_batches(_count, batch_format="pandas", batch_size=None),
        ["event_type"],
        {"n_recent": "n_recent", "n_prior": "n_prior"},
    ).to_pandas()
    # keep the divided quantity POSITIVE: HUGEINT // truncates toward
    # zero in DuckDB while pandas floors — (recent*1e4)//prior - 1e4
    # agrees on both sides for every sign of the change
    prior = agg["n_prior"].clip(lower=1)
    agg["change_bps"] = (
        agg["n_recent"] * 10000 // prior - 10000
    ).astype("int64")
    return agg.sort_values("event_type").reset_index(drop=True)


def q_graph_voronoi(sf_dir: str):
    """Graph Voronoi / nearest-seed assignment: every reachable node
    is assigned its closest region seed (min hop, ties to the smaller
    seed id) — the "home shard by graph distance" placement rule; one
    shared multi-source BFS (k seeds, one sweep count) plus an
    entity-keyed argmin reduce; hash-exact vs the recursive-CTE
    twin."""
    import pyarrow.parquet as pq

    from ..stages.graph_algos import multi_source_hops
    from ..stages.infer import bucketed_reduce

    regions = pq.read_table(_t(sf_dir, "region"), columns=["r_regionkey"]).to_pandas()
    sources = [f"r{int(k)}" for k in sorted(regions["r_regionkey"])]
    hops = multi_source_hops(_cnrs_edges(sf_dir), sources, hops=3)

    def _argmin(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "entity": pd.Series(dtype="object"),
                    "seed": pd.Series(dtype="object"),
                    "hop": pd.Series(dtype="int64"),
                }
            )
        b = g.sort_values(["entity", "hop", "source"], kind="stable")
        b = b.drop_duplicates("entity", keep="first")
        return pd.DataFrame(
            {
                "entity": b["entity"].to_numpy(),
                "seed": b["source"].to_numpy(),
                "hop": b["hop"].astype("int64").to_numpy(),
            }
        )

    schema = pa.schema(
        [
            pa.field("entity", pa.string()),
            pa.field("seed", pa.string()),
            pa.field("hop", pa.int64()),
        ]
    )
    return bucketed_reduce(hops, ["entity"], _argmin, schema)


def q_knn_filtered(sf_dir: str):
    """Filtered ANN: cosine top-k restricted to label-0 vectors (the
    metadata-predicate search every vector store needs) — the filter
    pushes down to a map-side mask BEFORE any distance work, so the
    scan cost scales with the surviving fraction; same broadcast
    query matrix as knn_cosine."""
    qids, qmat = _query_vectors(sf_dir)
    ds = read_parquet_clean(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    ).map_batches(
        lambda b: b.filter(pc.equal(b["label"], 0)).select(["vec_id", "embedding"]),
        batch_format="pyarrow",
    )
    out = knn_brute(ds, qids, qmat, k=KNN_K)
    return out.map_batches(
        lambda b: pa.table(
            {
                "query_id": pc.cast(b["query_id"], pa.int64()),
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_doc_quote_census(sf_dir: str):
    """Quoted-span census per document: number of double-quoted spans
    and total quoted characters (the attribution/citation density
    signal) — map-only regex parity with the SQL twin."""
    docs = _docs(sf_dir)

    def _q(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("")
        spans = t.str.findall(r'"[^"]*"')
        n_spans = spans.str.len().fillna(0).astype("int64")
        n_chars = spans.map(lambda xs: sum(len(x) for x in xs)).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "n_quotes": n_spans.to_numpy(),
                "n_quoted_chars": n_chars.to_numpy(),
            }
        )

    return docs.map_batches(_q, batch_format="pandas")


def q_events_gap_buckets(sf_dir: str):
    """Per-user idle-gap histogram over FIXED thresholds (<1s, <10s,
    <1m, <10m, <1h, >=1h) — integer-exact bucket census of
    inter-event gaps, corpus-wide; one user-keyed reduce computes the
    gaps, a tiny string-keyed sum aggregates the buckets."""
    from ..stages.infer import bucketed_reduce

    ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "ts"])
    edges_us = np.array(
        [1_000_000, 10_000_000, 60_000_000, 600_000_000, 3_600_000_000],
        dtype=np.int64,
    )
    labels = np.array(["lt_1s", "lt_10s", "lt_1m", "lt_10m", "lt_1h", "ge_1h"])

    def _gaps(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"bucket": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
            )
        b = g.sort_values(["user_id", "ts"], kind="stable")
        us = b["ts"].astype("datetime64[us]").astype("int64")
        prev = us.groupby(b["user_id"].to_numpy()).shift(1)
        gaps = (us - prev).dropna().astype("int64").to_numpy()
        if len(gaps) == 0:
            return pd.DataFrame(
                {"bucket": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
            )
        idx = np.searchsorted(edges_us, gaps, side="right")
        out = pd.DataFrame({"bucket": labels[idx]})
        g2 = out.groupby("bucket", as_index=False).size().rename(columns={"size": "n"})
        return g2.astype({"n": "int64"})

    per_bucket = bucketed_reduce(
        ev,
        ["user_id"],
        _gaps,
        pa.schema([pa.field("bucket", pa.string()), pa.field("n", pa.int64())]),
    )
    return grouped_sums(per_bucket, ["bucket"], {"n": "n"})


def q_source_dup_stats(sf_dir: str):
    """Per-source exact-duplicate hygiene report: documents vs
    distinct texts (md5) and the implied duplicate count — the
    which-feed-is-dirty table a crawl operator reads first. Map-side
    per-(source, md5) dedup partials, one bucketed reduce, then a
    tiny per-source sum."""
    import hashlib as _hl

    from ..stages.infer import bucketed_reduce

    docs = read_parquet_clean(
        _t(sf_dir, "documents"), columns=["doc_id", "text", "source"]
    )

    def _hash(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "source": b["source"].to_numpy(),
                "md5": [
                    _hl.md5((t or "").encode("utf-8")).hexdigest()
                    for t in b["text"]
                ],
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        return out.groupby(["source", "md5"], as_index=False).sum()

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby(["source", "md5"], as_index=False)["n"].sum()

    pair_schema = pa.schema(
        [
            pa.field("source", pa.string()),
            pa.field("md5", pa.string()),
            pa.field("n", pa.int64()),
        ]
    )
    pairs = bucketed_reduce(
        docs.map_batches(_hash, batch_format="pandas"),
        ["source", "md5"],
        _sum,
        pair_schema,
        combiner=_sum,
    )

    def _per_source(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "source": b["source"].to_numpy(),
                "n_docs": b["n"].astype("int64").to_numpy(),
                "n_distinct": np.ones(len(b), dtype=np.int64),
            }
        )
        return out.groupby("source", as_index=False).sum()

    agg = grouped_sums(
        pairs.map_batches(_per_source, batch_format="pandas"),
        ["source"],
        {"n_docs": "n_docs", "n_distinct": "n_distinct"},
    ).to_pandas()
    agg["n_dups"] = (agg["n_docs"] - agg["n_distinct"]).astype("int64")
    return agg.sort_values("source").reset_index(drop=True)


def q_orders_aging(sf_dir: str):
    """Open-order aging buckets as of the corpus max order date:
    counts of status-'O' orders aged <30d / <90d / <1y / >=1y — the
    operational backlog report; one max pass, then map-side bucket
    partials and a tiny sum."""
    orders = read_parquet_clean(
        _t(sf_dir, "orders"), columns=["o_orderstatus", "o_orderdate"]
    )
    mx = orders.map_batches(
        lambda b: pd.DataFrame(
            {"m": [int(b["o_orderdate"].astype("datetime64[us]").astype("int64").max())]}
        ),
        batch_format="pandas",
    ).to_pandas()
    anchor = int(mx["m"].max())
    day = 86_400_000_000
    edges = np.array([30 * day, 90 * day, 365 * day], dtype=np.int64)
    labels = np.array(["lt_30d", "lt_90d", "lt_1y", "ge_1y"])

    def _b(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_orderstatus"] == "O"]
        if len(b) == 0:
            return pd.DataFrame(
                {"bucket": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
            )
        age = anchor - b["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
        idx = np.searchsorted(edges, age, side="right")
        out = pd.DataFrame({"bucket": labels[idx], "n": np.ones(len(b), dtype=np.int64)})
        return out.groupby("bucket", as_index=False).sum()

    return grouped_sums(
        orders.map_batches(_b, batch_format="pandas", batch_size=None),
        ["bucket"],
        {"n": "n"},
    )


def q_doc_simpson(sf_dir: str):
    """Per-document Simpson diversity as the exact integer pair
    ``(rep_num, rep_den) = (sum n_t*(n_t-1), N*(N-1))`` — the
    repeat-probability complement of hapax richness (rep_num/rep_den
    is the chance two random token draws match); map-only."""
    docs = _docs(sf_dir)

    def _f(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.lower().str.findall(r"\w+")
        lens = toks.str.len().fillna(0).astype(int).to_numpy()
        num = np.zeros(len(b), dtype=np.int64)
        if lens.sum():
            flat = np.concatenate([t for t in toks.to_numpy() if t])
            doc_idx = np.repeat(np.arange(len(b)), lens)
            df = pd.DataFrame({"d": doc_idx, "t": flat})
            vc = df.groupby(["d", "t"], sort=False).size()
            contrib = (vc * (vc - 1)).groupby(level=0).sum()
            num[contrib.index.to_numpy()] = contrib.to_numpy()
        n = lens.astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "rep_num": num,
                "rep_den": n * (n - 1).clip(min=0),
            }
        )

    return docs.map_batches(_f, batch_format="pandas")


QUERIES: dict[str, Callable[[str], Any]] = {
    "doc_containment": q_doc_containment,
    "shipment_mst": q_shipment_mst,
    "nation_market_share": q_nation_market_share,
    "events_unpivot": q_events_unpivot,
    "link_coloring": q_link_coloring,
    "events_session_paths": q_events_session_paths,
    "doc_oov_rate": q_doc_oov_rate,
    "doc_auc": q_doc_auc,
    "part_min_cost_supplier": q_part_min_cost_supplier,
    "forecast_revenue": q_forecast_revenue,
    "important_parts": q_important_parts,
    "link_partition": q_link_partition,
    "orders_cohort_ltv": q_orders_cohort_ltv,
    "doc_rake_keyphrases": q_doc_rake_keyphrases,
    "doc_prefix_dedup": q_doc_prefix_dedup,
    "orders_benford": q_orders_benford,
    "events_anomalous_hours": q_events_anomalous_hours,
    "customer_pareto": q_customer_pareto,
    "link_pred_eval": q_link_pred_eval,
    "events_hll_rollup": q_events_hll_rollup,
    "source_ks_drift": q_source_ks_drift,
    "events_best_split": q_events_best_split,
    "orders_rapid_reorder": q_orders_rapid_reorder,
    "nations_cs_intersect_all": q_nations_cs_intersect_all,
    "nations_cs_except_all": q_nations_cs_except_all,
    "customer_revenue_gini": q_customer_revenue_gini,
    "events_late_quarantine": q_events_late_quarantine,
    "orders_seasonal_index": q_orders_seasonal_index,
    "graph_lcc": q_graph_lcc,
    "events_type_user_jaccard": q_events_type_user_jaccard,
    "link_partition_quality": q_link_partition_quality,
    "doc_lang_margin": q_doc_lang_margin,
    "doc_hapax": q_doc_hapax,
    "lineitem_gap_audit": q_lineitem_gap_audit,
    "orders_iso_week": q_orders_iso_week,
    "events_ab_stats": q_events_ab_stats,
    "events_wow_change": q_events_wow_change,
    "graph_voronoi": q_graph_voronoi,
    "knn_filtered": q_knn_filtered,
    "doc_quote_census": q_doc_quote_census,
    "events_gap_buckets": q_events_gap_buckets,
    "source_dup_stats": q_source_dup_stats,
    "orders_aging": q_orders_aging,
    "doc_simpson": q_doc_simpson,
    "customer_priority_seq": q_customer_priority_seq,
    "events_crosscorr": q_events_crosscorr,
    "doc_calibration": q_doc_calibration,
    "nation_part_profit": q_nation_part_profit,
    "part_supplier_counts": q_part_supplier_counts,
    "dominant_suppliers": q_dominant_suppliers,
    "supplier_jaccard": q_supplier_jaccard,
    "supplier_waiting": q_supplier_waiting,
    "doc_token_weighted_quantiles": q_doc_token_weighted_quantiles,
    "doc_charset_profile": q_doc_charset_profile,
    "events_hourly_interp": q_events_hourly_interp,
    "page_inlinks": q_page_inlinks,
    "link_pagerank": q_link_pagerank,
    "doc_and_search": q_doc_and_search,
    "doc_novelty": q_doc_novelty,
    "nation_trade_flow": q_nation_trade_flow,
    "order_priority_check": q_order_priority_check,
    "link_wl_classes": q_link_wl_classes,
    "doc_cdc_dedup": q_doc_cdc_dedup,
    "link_label_spread": q_link_label_spread,
    "media_audio_match": q_media_audio_match,
    "customer_sorted_neighborhood": q_customer_sorted_neighborhood,
    "large_volume_orders": q_large_volume_orders,
    "supply_neighbor_sample": q_supply_neighbor_sample,
    "link_feature_smooth": q_link_feature_smooth,
    "events_window_dedup": q_events_window_dedup,
    "doc_hrw_stability": q_doc_hrw_stability,
    "branded_revenue": q_branded_revenue,
    "line_priority_modes": q_line_priority_modes,
    "customer_order_distribution": q_customer_order_distribution,
    "promo_revenue": q_promo_revenue,
    "wealthy_inactive_customers": q_wealthy_inactive_customers,
    "orders_l_diversity": q_orders_l_diversity,
    "orders_t_closeness": q_orders_t_closeness,
    "events_twap": q_events_twap,
    "link_densest_subgraph": q_link_densest_subgraph,
    "link_bowtie": q_link_bowtie,
    "link_reciprocity": q_link_reciprocity,
    "doc_originality": q_doc_originality,
    "lang_confusion": q_lang_confusion,
    "link_motif_census": q_link_motif_census,
    "events_markov_eval": q_events_markov_eval,
    "link_domain_modularity": q_link_domain_modularity,
    "link_lpa_modularity": q_link_lpa_modularity,
    "lang_kappa": q_lang_kappa,
    "doc_proximity": q_doc_proximity,
    "small_qty_revenue": q_small_qty_revenue,
    "media_wav_spectrogram": q_media_wav_spectrogram,
    "events_runs": q_events_runs,
    "media_png_histogram": q_media_png_histogram,
    "shipment_matching": q_shipment_matching,
    "shipment_mis": q_shipment_mis,
    "part_soundex": q_part_soundex,
    "source_budget_quotas": q_source_budget_quotas,
    "doc_budgeted_sample": q_doc_budgeted_sample,
    "doc_systematic_sample": q_doc_systematic_sample,
    "returned_item_customers": q_returned_item_customers,
    "top_supplier_revenue": q_top_supplier_revenue,
    "events_autocorr": q_events_autocorr,
    "user_cadence": q_user_cadence,
    "doc_readability": q_doc_readability,
    "orders_mrr": q_orders_mrr,
    "doc_token_counts": q_doc_token_counts,
    "doc_stats": q_doc_stats,
    "doc_lang_id": q_doc_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_quality": q_doc_quality,
    "doc_simhash": q_doc_simhash,
    "doc_repetition": q_doc_repetition,
    "doc_line_dedup": q_doc_line_dedup,
    "doc_decontaminate": q_doc_decontaminate,
    "doc_pii_redact": q_doc_pii_redact,
    "kg_chunk_stats": q_kg_chunk_stats,
    "lineitem_agg": q_lineitem_agg,
    "orders_by_segment": q_orders_by_segment,
    "lineitem_orders_join": q_lineitem_orders_join,
    "top_orders": q_top_orders,
    "events_window": q_events_window,
    "events_rollup": q_events_rollup,
    "events_sliding_window": q_events_sliding_window,
    "events_quantiles": q_events_quantiles,
    "customers_without_orders": q_customers_without_orders,
    "customer_order_counts": q_customer_order_counts,
    "knn_cosine": q_knn_cosine,
    "knn_rrf": q_knn_rrf,
    "knn_ivf": q_knn_ivf,
    "knn_ivf_indexed": q_knn_ivf_indexed,
    "pagerank": q_pagerank,
    "graph_katz": q_graph_katz,
    "part_tree_rollup": q_part_tree_rollup,
    "khop_region": q_khop_region,
    "ngram_overlap_pairs": q_ngram_overlap_pairs,
    "minhash_dedup": q_minhash_dedup,
    "simhash_dedup": q_simhash_dedup,
    "embedding_dedup": q_embedding_dedup,
    "top_tokens": q_top_tokens,
    "events_sessionize": q_events_sessionize,
    "top_event_per_user": q_top_event_per_user,
    "events_lag": q_events_lag,
    "events_asof_purchase": q_events_asof_purchase,
    "orders_ship_window": q_orders_ship_window,
    "events_running_total": q_events_running_total,
    "events_sample_per_type": q_events_sample_per_type,
    "orders_semi_lineitem": q_orders_semi_lineitem,
    "distinct_users": q_distinct_users,
    "three_way_join": q_three_way_join,
    "approx_distinct_users": q_approx_distinct_users,
    "supplier_region": q_supplier_region,
    "part_type_stats": q_part_type_stats,
    "orders_dates": q_orders_dates,
    "clean_triples": q_clean_triples,
    "relation_counts": q_relation_counts,
    "training_qa": q_training_qa,
    "training_stratified_split": q_training_stratified_split,
    "training_concept_qa": q_training_concept_qa,
    "training_chains": q_training_chains,
    "training_comparisons": q_training_comparisons,
    "training_counterfactuals": q_training_counterfactuals,
    "training_anti_patterns": q_training_anti_patterns,
    "training_model_selection": q_training_model_selection,
    "concept_extract": q_concept_extract,
    "recursive_split": q_recursive_split,
    "doc_embed": q_doc_embed,
    "media_features": q_media_features,
    "media_png_decode": q_media_png_decode,
    "media_png_resize": q_media_png_resize,
    "media_wav_decode": q_media_wav_decode,
    "media_wav_resample": q_media_wav_resample,
    "kg_triples_raw": q_kg_triples_raw,
    "kg_triples_std": q_kg_triples_std,
    "kg_incremental": q_kg_incremental,
    "kg_edges": q_kg_edges,
    "kg_nodes": q_kg_nodes,
    "kg_nodes_louvain": q_kg_nodes_louvain,
    "scenario_eval": q_scenario_eval,
    "graph_triangles": q_graph_triangles,
    "graph_edge_support": q_graph_edge_support,
    "graph_ktruss": q_graph_ktruss,
    "graph_link_pred": q_graph_link_pred,
    "graph_bipartite": q_graph_bipartite,
    "temporal_reach": q_temporal_reach,
    "doc_heavy_tokens": q_doc_heavy_tokens,
    "kcenter_coreset": q_kcenter_coreset,
    "graph_assortativity": q_graph_assortativity,
    "graph_rich_club": q_graph_rich_club,
    "threshold_components": q_threshold_components,
    "graph_double_sweep": q_graph_double_sweep,
    "orders_rrf": q_orders_rrf,
    "part_frequent_triples": q_part_frequent_triples,
    "doc_vocab_growth": q_doc_vocab_growth,
    "part_rules": q_part_rules,
    "weighted_sssp": q_weighted_sssp,
    "supplier_negatives": q_supplier_negatives,
    "degree_distribution": q_degree_distribution,
    "part_copurchase": q_part_copurchase,
    "node_similarity": q_node_similarity,
    "domain_stats": q_domain_stats,
    "doc_gopher": q_doc_gopher,
    "doc_dup_spans": q_doc_dup_spans,
    "source_overlap": q_source_overlap,
    "events_props_sum": q_events_props_sum,
    "doc_pack_shards": q_doc_pack_shards,
    "doc_token_quantiles": q_doc_token_quantiles,
    "source_token_quantiles": q_source_token_quantiles,
    "events_rolling_window": q_events_rolling_window,
    "orders_vs_ship_by_date": q_orders_vs_ship_by_date,
    "doc_shuffle_shards": q_doc_shuffle_shards,
    "events_type_pivot": q_events_type_pivot,
    "nations_both_cust_supp": q_nations_both_cust_supp,
    "custkeys_no_urgent": q_custkeys_no_urgent,
    "events_latest": q_events_latest,
    "events_rank": q_events_rank,
    "doc_vocab": q_doc_vocab,
    "graph_walks": q_graph_walks,
    "graph_skipgrams": q_graph_skipgrams,
    "customers_per_region": q_customers_per_region,
    "source_top_terms": q_source_top_terms,
    "graph_kcore": q_graph_kcore,
    "graph_components": q_graph_components,
    "unshipped_revenue": q_unshipped_revenue,
    "region_revenue": q_region_revenue,
    "embedding_clusters": q_embedding_clusters,
    "semantic_dedup": q_semantic_dedup,
    "doc_mixture_sample": q_doc_mixture_sample,
    "hits": q_hits,
    "top_tokens_approx": q_top_tokens_approx,
    "doc_quality_buckets": q_doc_quality_buckets,
    "token_postings": q_token_postings,
    "doc_unigram_ppl": q_doc_unigram_ppl,
    "doc_nfc_normalize": q_doc_nfc_normalize,
    "doc_token_percentile": q_doc_token_percentile,
    "events_hourly_gapfill": q_events_hourly_gapfill,
    "doc_cap_per_source": q_doc_cap_per_source,
    "events_funnel": q_events_funnel,
    "events_pattern_match": q_events_pattern_match,
    "events_out_of_order": q_events_out_of_order,
    "events_dp_counts": q_events_dp_counts,
    "doc_length_batches": q_doc_length_batches,
    "orders_checksum": q_orders_checksum,
    "doc_tfidf_keywords": q_doc_tfidf_keywords,
    "doc_dup_span_redact": q_doc_dup_span_redact,
    "graph_clustering": q_graph_clustering,
    "corpus_curation": q_corpus_curation,
    "doc_mixture_resample": q_doc_mixture_resample,
    "bpe_merges": q_bpe_merges,
    "doc_bpe_token_counts": q_doc_bpe_token_counts,
    "kg_training_pipeline": q_kg_training_pipeline,
    "kg_record_analysis": q_kg_record_analysis,
    "training_validation_qa": q_training_validation_qa,
    "doc_bigram_ppl": q_doc_bigram_ppl,
    "events_window_distinct": q_events_window_distinct,
    "fuzzy_decontaminate": q_fuzzy_decontaminate,
    "doc_bm25_mlt": q_doc_bm25_mlt,
    "events_in_purchase_windows": q_events_in_purchase_windows,
    "orders_snapshot_diff": q_orders_snapshot_diff,
    "orders_profile": q_orders_profile,
    "doc_compression": q_doc_compression,
    "customer_fuzzy_names": q_customer_fuzzy_names,
    "orders_skyline": q_orders_skyline,
    "orders_price_trend": q_orders_price_trend,
    "events_transitions": q_events_transitions,
    "doc_length_outliers": q_doc_length_outliers,
    "doc_leakage_split": q_doc_leakage_split,
    "approx_users_per_type": q_approx_users_per_type,
    "session_concurrency": q_session_concurrency,
    "part_copurchase_lift": q_part_copurchase_lift,
    "graph_closeness": q_graph_closeness,
    "url_normalize": q_url_normalize,
    "events_retention": q_events_retention,
    "customer_rfm": q_customer_rfm,
    "lineitem_fd_audit": q_lineitem_fd_audit,
    "ppr": q_ppr,
    "doc_importance": q_doc_importance,
    "url_dedup": q_url_dedup,
    "doc_chars_approx_quantiles": q_doc_chars_approx_quantiles,
    "events_cusum": q_events_cusum,
    "events_skew_profile": q_events_skew_profile,
    "orders_scd2": q_orders_scd2,
    "orders_expectations": q_orders_expectations,
    "revenue_rollup": q_revenue_rollup,
    "user_top_event": q_user_top_event,
    "doc_span_corruption": q_doc_span_corruption,
    "events_zorder": q_events_zorder,
    "doc_curriculum_shards": q_doc_curriculum_shards,
    "customer_linkage": q_customer_linkage,
    "retrieval_hard_negatives": q_retrieval_hard_negatives,
    "events_zonemap_scan": q_events_zonemap_scan,
    "doc_length_drift": q_doc_length_drift,
    "customer_k_anon": q_customer_k_anon,
    "doc_weighted_sample": q_doc_weighted_sample,
    "media_phash_dedup": q_media_phash_dedup,
    "events_target_encoding": q_events_target_encoding,
    "orders_scd2_pit": q_orders_scd2_pit,
    "media_vad_segments": q_media_vad_segments,
    "doc_nb_classify": q_doc_nb_classify,
    "revenue_cube": q_revenue_cube,
    "knn_pq": q_knn_pq,
    "url_best_rep": q_url_best_rep,
    "graph_betweenness": q_graph_betweenness,
    "graph_harmonic": q_graph_harmonic,
    "doc_incremental_dedup": q_doc_incremental_dedup,
    "doc_pack_manifest": q_doc_pack_manifest,
    "events_decayed": q_events_decayed,
    "embedding_centroids": q_embedding_centroids,
    "embedding_gram": q_embedding_gram,
    "nation_scc": q_nation_scc,
    "events_attribution": q_events_attribution,
    "doc_phrase_hits": q_doc_phrase_hits,
    "doc_collocations": q_doc_collocations,
    "user_gini": q_user_gini,
    "source_distinctive_terms": q_source_distinctive_terms,
    "doc_token_shards": q_doc_token_shards,
    "embedding_curation": q_embedding_curation,
    "events_stratified_sample": q_events_stratified_sample,
    "customer_entity_clusters": q_customer_entity_clusters,
    "retrieval_training_pairs": q_retrieval_training_pairs,
    "events_hourly_profile": q_events_hourly_profile,
    "lineitem_winsorized": q_lineitem_winsorized,
}

_N_TOKENS_SQL = (
    "CASE WHEN text IS NULL OR trim(text) = '' THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)


def _lang_count(lang: str) -> str:
    words = "|".join(LANG_MARKERS[lang])
    return f"len(regexp_extract_all(lower(coalesce(text,'')), '\\b(?:{words})\\b'))"


_CHUNK_STEP = CHUNK_SIZE - CHUNK_OVERLAP

def _gopher_oracle_sql() -> str:
    """SQL twin of :func:`~..stages.webtext.gopher_filter` — same
    lower(trim) whitespace tokenization as the doc_repetition oracle,
    thresholds imported from the stage so the two can never drift."""
    from ..stages.webtext import (
        GOPHER_DISTINCT_DEN,
        GOPHER_MAX_MEAN_WORD_X,
        GOPHER_MAX_TOKENS,
        GOPHER_MIN_MEAN_WORD_X,
        GOPHER_MIN_TOKENS,
        GOPHER_TOP_BIGRAM_DEN,
    )

    return rf"""
        WITH toks AS (
          SELECT doc_id, u.tok, u.i
          FROM documents,
               LATERAL (SELECT unnest(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+')) AS tok,
                               generate_subscripts(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'), 1) AS i) u
          WHERE trim(coalesce(text,'')) <> ''
        ),
        bi AS (
          SELECT doc_id,
                 string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS gram,
                 count(*) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS glen
          FROM toks
        ),
        tok_stats AS (
          SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct,
                 sum(length(tok)) AS twc
          FROM toks GROUP BY doc_id
        ),
        top_bi AS (
          SELECT doc_id, max(c) AS top_bigram FROM (
            SELECT doc_id, gram, count(*) c FROM bi WHERE glen = 2 GROUP BY 1, 2) GROUP BY doc_id
        ),
        sig AS (
          SELECT d.doc_id,
                 coalesce(t.n_tokens, 0) AS nt,
                 coalesce(t.twc, 0) AS twc,
                 coalesce(t.n_distinct, 0) AS nd,
                 coalesce(tb.top_bigram, 0) AS tbg
          FROM documents d
          LEFT JOIN tok_stats t USING (doc_id)
          LEFT JOIN top_bi tb USING (doc_id)
        )
        SELECT doc_id,
               CAST(nt AS BIGINT) AS n_tokens,
               CAST(twc AS BIGINT) AS total_word_chars,
               CAST((CASE WHEN nt < {GOPHER_MIN_TOKENS} OR nt > {GOPHER_MAX_TOKENS} THEN 1 ELSE 0 END)
                  + (CASE WHEN {GOPHER_MIN_MEAN_WORD_X} * nt > twc OR twc > {GOPHER_MAX_MEAN_WORD_X} * nt THEN 2 ELSE 0 END)
                  + (CASE WHEN {GOPHER_TOP_BIGRAM_DEN} * tbg > nt THEN 4 ELSE 0 END)
                  + (CASE WHEN {GOPHER_DISTINCT_DEN} * nd < nt THEN 8 ELSE 0 END) AS BIGINT) AS reason_mask,
               CAST(CASE WHEN nt >= {GOPHER_MIN_TOKENS} AND nt <= {GOPHER_MAX_TOKENS}
                          AND {GOPHER_MIN_MEAN_WORD_X} * nt <= twc AND twc <= {GOPHER_MAX_MEAN_WORD_X} * nt
                          AND {GOPHER_TOP_BIGRAM_DEN} * tbg <= nt
                          AND {GOPHER_DISTINCT_DEN} * nd >= nt
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM sig
    """


_GOPHER_ORACLE_SQL = _gopher_oracle_sql()

_DUP_SPANS_ORACLE_SQL = rf"""
        WITH toks AS (
          SELECT doc_id, u.tok, u.i
          FROM documents,
               LATERAL (SELECT unnest(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+')) AS tok,
                               generate_subscripts(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'), 1) AS i) u
          WHERE trim(coalesce(text,'')) <> ''
        ),
        win AS (
          SELECT doc_id,
                 string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND {DUP_SPAN_K - 1} FOLLOWING) AS gram,
                 count(*) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND {DUP_SPAN_K - 1} FOLLOWING) AS glen
          FROM toks
        ),
        grams AS (
          SELECT doc_id, gram,
                 count(*) OVER (PARTITION BY gram) AS corpus_count
          FROM win WHERE glen = {DUP_SPAN_K}
        ),
        per_doc AS (
          SELECT doc_id,
                 count(*) AS n_grams,
                 count(*) FILTER (WHERE corpus_count >= 2) AS n_dup
          FROM grams GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_grams
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


# all-but-one span REMOVAL twin (q_doc_dup_span_redact): same gram
# window as the dup_spans twin; owner = lexicographic min (doc, pos)
# via row_number; covered tokens = removal starts x 0..k-1 offsets
# (the interval-diff marking in relational form); NULL-skipping
# string_agg rebuilds the surviving-token text in position order.
_DUP_SPAN_REDACT_ORACLE_SQL = rf"""
        WITH toks AS (
          SELECT doc_id, u.tok, u.i
          FROM documents,
               LATERAL (SELECT unnest(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+')) AS tok,
                               generate_subscripts(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'), 1) AS i) u
          WHERE trim(coalesce(text,'')) <> ''
        ),
        win AS (
          SELECT doc_id, i,
                 string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND {DUP_SPAN_K - 1} FOLLOWING) AS gram,
                 count(*) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND {DUP_SPAN_K - 1} FOLLOWING) AS glen
          FROM toks
        ),
        occ AS (
          SELECT doc_id, i,
                 count(*) OVER (PARTITION BY gram) AS cnt,
                 row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn
          FROM win WHERE glen = {DUP_SPAN_K}
        ),
        covered AS (
          SELECT DISTINCT r.doc_id, r.i + o.j AS i
          FROM (SELECT doc_id, i FROM occ WHERE cnt >= 2 AND rn > 1) r,
               (SELECT unnest(range({DUP_SPAN_K})) AS j) o
        ),
        per AS (
          SELECT t.doc_id,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(count(c.i) AS BIGINT) AS n_removed,
                 string_agg(CASE WHEN c.i IS NULL THEN t.tok END, ' '
                            ORDER BY t.i) AS text_red
          FROM toks t
          LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.i = t.i
          GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(p.n_removed, 0) AS BIGINT) AS n_removed,
               coalesce(p.text_red, '') AS text_redacted
        FROM documents d LEFT JOIN per p USING (doc_id)
    """


def _zorder_oracle_sql() -> str:
    """SQL twin of q_events_zorder — the interleave expression is
    generated by the SAME helper and bounds the stage uses, so stage
    and oracle cannot drift."""
    from ..stages.zorder import zorder_sql_expr

    expr = zorder_sql_expr(
        "user_id", "epoch_us(ts)",
        [ZORDER_USER_BOUNDS, ZORDER_TS_BOUNDS],
        bits=ZORDER_BITS,
    )
    return f"""
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST({expr} AS BIGINT) AS zvalue
        FROM events
    """


# The regenerated link arithmetic shared by every raw-html link-graph
# oracle (the synthesizer plants these derandomized outlinks).
_LINK_EDGES_SQL = """
          SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS src,
                 'https://example.org/doc/' ||
                 CAST((doc_id * 131 + i * 31) % 997 AS VARCHAR) AS dst
          FROM documents,
               UNNEST([CAST(0 AS BIGINT), CAST(1 AS BIGINT),
                       CAST(2 AS BIGINT)]) AS u(i)
          UNION ALL
          SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR),
                 'https://ext' || CAST(doc_id % 13 AS VARCHAR) ||
                 '.example.com/x'
          FROM documents
"""

def _lpa_modularity_oracle_sql(iters: int = 5) -> str:
    """Unrolled-iteration SQL twin of ``label_propagation_communities``
    + ``modularity_report`` over the link graph: each synchronous LPA
    round is a neighbor-vote count over the doubled edge table (edge
    multiplicity kept) plus one self vote, winner by (count DESC,
    label ASC) — pure integer counting, so five rounds unroll into CTE
    stages exactly like the HITS/k-means twins. The modularity tail is
    the same exact-rational arithmetic as the link_domain_modularity
    twin."""
    head = f"""
        WITH e AS MATERIALIZED ({_LINK_EDGES_SQL}),
        und AS MATERIALIZED (
          SELECT src, dst FROM e
          UNION ALL SELECT dst AS src, src AS dst FROM e
        ),
        l0 AS MATERIALIZED (
          SELECT node, node AS lab
          FROM (SELECT DISTINCT src AS node FROM und)
        )"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
        c{i} AS (
          SELECT node, lab, count(*) AS cnt FROM (
            SELECT u.dst AS node, l.lab
            FROM und u JOIN l{i - 1} l ON l.node = u.src
            UNION ALL
            SELECT node, lab FROM l{i - 1}
          ) GROUP BY node, lab
        ),
        l{i} AS MATERIALIZED (
          SELECT node, lab FROM (
            SELECT node, lab, row_number() OVER (
              PARTITION BY node ORDER BY cnt DESC, lab ASC) AS rn
            FROM c{i}) WHERE rn = 1
        )""")
    tail = f""",
        tagged AS (
          SELECT ls.lab AS c_src, ld.lab AS c_dst
          FROM e JOIN l{iters} ls ON e.src = ls.node
                 JOIN l{iters} ld ON e.dst = ld.node
        ),
        m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        per AS (
          SELECT c, CAST(sum(deg) AS BIGINT) AS deg,
                 CAST(sum(within) AS BIGINT) AS within
          FROM (
            SELECT c_src AS c, 1 AS deg, 0 AS within FROM tagged
            UNION ALL SELECT c_dst, 1, 0 FROM tagged
            UNION ALL SELECT c_src, 0,
                             CASE WHEN c_src = c_dst THEN 1 ELSE 0 END
            FROM tagged
          ) GROUP BY c
        )
        SELECT m.m AS n_edges,
               CAST(count(*) AS BIGINT) AS n_communities,
               CAST(sum(4 * m.m * p.within - p.deg * p.deg) AS BIGINT) AS q_num,
               CAST(4 * m.m * m.m AS BIGINT) AS q_den
        FROM per p, m GROUP BY m.m"""
    return head + "".join(steps) + tail


_WL_ROUND_SQL = """
        s{r} AS MATERIALIZED (
          SELECT u.node,
                 CAST(any_value(o.lbl) AS VARCHAR) || '|' ||
                 string_agg(CAST(n.lbl AS VARCHAR), ',' ORDER BY n.lbl) AS sig
          FROM und u
          JOIN l{p} o ON u.node = o.node
          JOIN l{p} n ON u.nbr = n.node
          GROUP BY u.node
        ),
        l{r} AS MATERIALIZED (
          SELECT node, CAST(dense_rank() OVER (ORDER BY sig) AS BIGINT) AS lbl
          FROM s{r}
        )"""

_FS_ROUND_SQL = """
        f{r} AS MATERIALIZED (
          SELECT p.node,
                 CAST((p.f + coalesce(s.sf, 0))
                      // (1 + coalesce(d.deg, 0)) AS BIGINT) AS f
          FROM f{p} p
          LEFT JOIN (
            SELECT u.node, CAST(sum(l.f) AS BIGINT) AS sf
            FROM und u JOIN f{p} l ON u.nbr = l.node
            GROUP BY u.node
          ) s ON p.node = s.node
          LEFT JOIN deg d ON p.node = d.node
        )"""

_LINK_WL_ORACLE_SQL = f"""
        WITH e AS MATERIALIZED ({_LINK_EDGES_SQL}),
        und AS MATERIALIZED (
          SELECT src AS node, dst AS nbr FROM e
          UNION ALL
          SELECT dst AS node, src AS nbr FROM e
        ),
        l0 AS MATERIALIZED (
          SELECT node, CAST(count(*) AS BIGINT) AS lbl FROM und GROUP BY node
        ),
        {_WL_ROUND_SQL.format(r=1, p=0)},
        {_WL_ROUND_SQL.format(r=2, p=1)}
        SELECT node, lbl AS wl_label,
               CAST(count(*) OVER (PARTITION BY lbl) AS BIGINT) AS class_size
        FROM l2
"""

_SPREAD_ROUND_SQL = """
        v{r} AS MATERIALIZED (
          SELECT u.node, l.lbl, CAST(count(*) AS BIGINT) AS c
          FROM und u JOIN l{p} l ON u.nbr = l.node
          GROUP BY u.node, l.lbl
        ),
        m{r} AS MATERIALIZED (
          SELECT node, lbl FROM (
            SELECT node, lbl,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY c DESC, lbl ASC) AS rn
            FROM v{r}) WHERE rn = 1
        ),
        l{r} AS MATERIALIZED (
          SELECT n.node, CAST(coalesce(s.lbl, m.lbl, p.lbl) AS BIGINT) AS lbl
          FROM (SELECT node FROM seeds UNION SELECT node FROM m{r}
                UNION SELECT node FROM l{p}) n
          LEFT JOIN seeds s ON n.node = s.node
          LEFT JOIN m{r} m ON n.node = m.node
          LEFT JOIN l{p} p ON n.node = p.node
        )"""

_LINK_SPREAD_ORACLE_SQL = f"""
        WITH e AS MATERIALIZED ({_LINK_EDGES_SQL}),
        und AS MATERIALIZED (
          SELECT src AS node, dst AS nbr FROM e
          UNION ALL
          SELECT dst AS node, src AS nbr FROM e
        ),
        seeds AS MATERIALIZED (
          SELECT 'https://ext' || CAST(k AS VARCHAR) || '.example.com/x' AS node,
                 CAST(k AS BIGINT) AS lbl
          FROM (SELECT unnest(generate_series(0, 12)) AS k)
        ),
        l0 AS MATERIALIZED (SELECT node, lbl FROM seeds),
        {_SPREAD_ROUND_SQL.format(r=1, p=0)},
        {_SPREAD_ROUND_SQL.format(r=2, p=1)}
        SELECT node, lbl AS label FROM l2
"""

from ..stages.fuzzy import soundex_sql_expr as _sdx

_WATERFILL_THR_SQL = """
        WITH c AS MATERIALIZED (
          SELECT source, CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                       CAST(count(*) AS BIGINT) AS k,
                       CAST(max(n) AS BIGINT) AS mx FROM c),
        bud AS (SELECT CAST(count(*) * 3 // 5 AS BIGINT) AS b FROM documents),
        s AS (
          SELECT n,
                 row_number() OVER (ORDER BY n, source) - 1 AS j,
                 CAST(coalesce(sum(n) OVER (ORDER BY n, source
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS prefix,
                 CAST(lag(n, 1, 0) OVER (ORDER BY n, source) AS BIGINT)
                   AS prev_n
          FROM c
        ),
        cand AS (
          SELECT least((b.b - s.prefix) // (t.k - s.j), s.n) AS tc,
                 CASE WHEN (b.b - s.prefix) // (t.k - s.j) >= s.prev_n
                      THEN 1 ELSE 0 END AS ok
          FROM s, tot t, bud b
        ),
        thr AS (
          SELECT CASE WHEN t.total <= b.b THEN t.mx
                      ELSE coalesce((SELECT max(tc) FROM cand WHERE ok = 1), 0)
                 END AS T
          FROM tot t, bud b
        )"""

# SimHash signature twin: md5-per-token first-8-bytes bit majority,
# exactly mirroring stages/text_analysis.py:simhash64 (RE2 \\w+ over
# the ASCII fixture corpus == Python \\w+; verified exact at sf0.01).
_SIMHASH_SIG_SQL = """
        toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text,'')), '\\w+')) AS tok
          FROM documents
        ),
        th AS (
          SELECT doc_id, ('0x' || substr(md5(tok),1,16))::UBIGINT AS h FROM toks
        ),
        simbits AS (
          SELECT doc_id, b.bit,
                 sum(CASE WHEN (h >> (63 - b.bit)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
          FROM th CROSS JOIN (SELECT unnest(range(64)) AS bit) b
          GROUP BY doc_id, b.bit
        ),
        sig0 AS (
          SELECT doc_id,
                 sum(CASE WHEN acc > 0 THEN (1::UBIGINT << (63 - bit))
                          ELSE 0::UBIGINT END)::UBIGINT AS sig
          FROM simbits GROUP BY doc_id
        ),
        sigs AS (
          SELECT d.doc_id, coalesce(s.sig, 0::UBIGINT) AS sig
          FROM documents d LEFT JOIN sig0 s USING (doc_id)
        )"""

_LANG_PRED_CASE = f"""CASE
                 WHEN {_lang_count('en')} = 0 AND {_lang_count('de')} = 0 AND {_lang_count('fr')} = 0 THEN 'und'
                 WHEN {_lang_count('en')} >= {_lang_count('de')} AND {_lang_count('en')} >= {_lang_count('fr')} THEN 'en'
                 WHEN {_lang_count('de')} >= {_lang_count('fr')} THEN 'de'
                 ELSE 'fr'
               END"""

def _hll_group_sql(group_col: str, value_expr: str, table: str, p: int) -> str:
    """Grouped-HLL estimate twin (see the events_hll_rollup oracle for
    the full derivation): md5 registers, exact HUGEINT power sum, the
    estimate's IEEE op order mirroring sketches._estimate; `ln` ==
    math.log exhaustively probed for every zeros count at p=10/12."""
    m = 1 << p
    mask = (1 << (64 - p)) - 1
    maxrank = 64 - p + 1
    return f"""
        WITH hx AS (
          SELECT DISTINCT {group_col} AS grp,
                 ('0x' || substr(md5({value_expr}),1,16))::UBIGINT AS h
          FROM {table}
        ),
        rk AS (
          SELECT grp, (h >> {64 - p})::BIGINT AS idx,
                 {maxrank} - length(ltrim(bin(h & {mask}::UBIGINT), '0')) AS rank
          FROM hx
        ),
        regs AS (
          SELECT grp, idx, CAST(max(rank) AS BIGINT) AS r
          FROM rk GROUP BY grp, idx
        ),
        agg AS (
          SELECT grp, sum((1::HUGEINT << (64 - r))) AS s_present,
                 CAST(count(*) AS BIGINT) AS n_present
          FROM regs GROUP BY grp
        ),
        est AS (
          SELECT grp,
                 CAST(s_present + ({m} - n_present) * (1::HUGEINT << 64)
                      AS DOUBLE) AS S,
                 {m} - n_present AS zeros
          FROM agg
        )
        SELECT grp AS {group_col},
               CAST(floor(CASE
                 WHEN (0.7213 / (1 + 1.079 / {m}.0)) * {m} * {m}
                      * 18446744073709551616.0 / S <= {2.5 * m} AND zeros > 0
                 THEN {m}.0 * ln({m}.0 / zeros)
                 ELSE (0.7213 / (1 + 1.079 / {m}.0)) * {m} * {m}
                      * 18446744073709551616.0 / S
               END) AS BIGINT) AS approx_distinct
        FROM est
    """


def _kg_triples_raw_oracle_sql() -> str:
    """Full SQL twin of the mock-model extraction pipeline
    (chunk -> mock SPO walk -> response-format roundtrip ->
    validation): md5 chunk hash, stop-worded [a-z]+ token walk with
    stride 4, hash-selected (post-limit) predicates, the %17 self-loop
    and %19 missing-object injections, and the %20==19 garbage-variant
    chunk rejection — verified row-identical to extract_chunk_triples
    over every fixture doc (all 20 response variants exercised). Relies
    on two fixture facts, each guarded by a poison row that breaks the
    row count LOUDLY if violated: every doc fits one chunk
    (<= CHUNK_SIZE words) and text is already canonical
    single-space."""
    from ..functions.model import MOCK_PREDICATES, _TOKEN_STOP
    from ..functions.textnorm import limit_predicate_length

    preds = [limit_predicate_length(p) for p in MOCK_PREDICATES]
    pred_sql = "[" + ", ".join("'" + p + "'" for p in preds) + "]"
    stop_sql = ", ".join("'" + s + "'" for s in sorted(_TOKEN_STOP))
    return f"""
        WITH d AS (
          SELECT doc_id, coalesce(text,'') AS text,
                 'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
                 ('0x' || substr(md5(coalesce(text,'')),1,16))::UBIGINT::HUGEINT
                   AS h,
                 ('0x' || substr(md5('fmt:' || coalesce(text,'')),1,16))::UBIGINT
                   % 20 AS variant
          FROM documents
        ),
        wl AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM d),
        w AS (
          SELECT doc_id, unnest(l) AS word, unnest(range(1, len(l)+1)) AS i
          FROM wl
        ),
        tk AS (
          SELECT doc_id, regexp_extract(word, '[a-z]+') AS tok, i
          FROM w
          WHERE length(regexp_extract(word, '[a-z]+')) >= 3
            AND regexp_extract(word, '[a-z]+') NOT IN ({stop_sql})
        ),
        t1 AS (
          SELECT doc_id, tok,
                 row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS j
          FROM tk
        ),
        nn AS (SELECT doc_id, count(*) AS n FROM t1 GROUP BY doc_id),
        raw AS (
          SELECT s.doc_id, s.j, s.tok AS subject,
                 CASE WHEN (d.h + s.j) % 17 = 0 THEN s.tok
                      ELSE o.tok END AS object,
                 ({pred_sql})[CAST((d.h + s.j) % 12 AS BIGINT) + 1]
                   AS predicate
          FROM t1 s
          JOIN nn ON nn.doc_id = s.doc_id
          JOIN t1 o ON o.doc_id = s.doc_id AND o.j = s.j + 2
          JOIN d ON d.doc_id = s.doc_id
          WHERE s.j % 4 = 0 AND s.j < nn.n - 3
            AND (d.h + s.j) % 19 <> 0
            AND d.variant <> 19
        )
        SELECT d.url, CAST(1 AS BIGINT) AS chunk_id,
               CAST(row_number() OVER (PARTITION BY raw.doc_id
                                       ORDER BY raw.j) - 1 AS BIGINT) AS seq,
               raw.subject, raw.predicate, raw.object
        FROM raw JOIN d ON d.doc_id = raw.doc_id
        UNION ALL
        SELECT 'ASSERTION-FAILED: multi-chunk doc — this twin assumes '
               || 'single-chunk docs', -1, -1, '', '', ''
        FROM wl WHERE len(l) > {CHUNK_SIZE}
        UNION ALL
        SELECT 'ASSERTION-FAILED: non-canonical whitespace in text',
               -1, -1, '', '', ''
        FROM d
        WHERE text LIKE '%' || chr(10) || '%' OR text LIKE '%  %'
           OR text LIKE '%' || chr(9) || '%'
    """


def _kg_triples_std_oracle_sql() -> str:
    """Phase-2 standardization twin over the raw-extraction twin.

    Over THIS corpus every entity is a single [a-z]+ token, which
    makes the election structurally simple and the SQL exact:

    - ``normalize_entity_key`` maps each token to itself (the residual
      ENTITY_KEY_STOPWORDS not already excluded by the mock's token
      stop list are all <= 4 chars and can also never enter the stem
      pass), so the first-pass election is the identity;
    - the subset rule needs multi-word entities, so only the STEM rule
      fires: tokens > 4 chars sharing a 4-prefix merge, and with the
      (len, entity) iteration order the earlier entity always wins,
      last write wins — i.e. each variant maps to the LARGEST earlier
      same-stem entity in that order (one level, chains uncollapsed);
    - alias application relowers + relimits (both idempotent here) and
      drops self-loops.

    The single-token assumption is guarded by a poison row. Verified
    row-identical to standardize_triples at sf0.001/0.01."""
    return f"""
        WITH rawt AS ({_kg_triples_raw_oracle_sql()}),
        ents AS (
          SELECT DISTINCT entity FROM (
            SELECT subject AS entity FROM rawt
            UNION ALL SELECT object FROM rawt
          )
        ),
        big AS (
          SELECT entity, substr(entity, 1, 4) AS stem
          FROM ents WHERE length(entity) > 4
        ),
        ord_e AS (
          SELECT entity, stem,
                 row_number() OVER (ORDER BY length(entity), entity) AS r
          FROM big
        ),
        merges AS (
          SELECT t.entity AS variant, s.entity AS standard
          FROM ord_e t JOIN ord_e s ON s.stem = t.stem AND s.r < t.r
          QUALIFY row_number() OVER (PARTITION BY t.entity
                                     ORDER BY s.r DESC) = 1
        )
        SELECT r.url, r.chunk_id, r.seq,
               coalesce(ms.standard, r.subject) AS subject,
               r.predicate,
               coalesce(mo.standard, r.object) AS object
        FROM rawt r
        LEFT JOIN merges ms ON ms.variant = r.subject
        LEFT JOIN merges mo ON mo.variant = r.object
        WHERE coalesce(ms.standard, r.subject)
              <> coalesce(mo.standard, r.object)
        UNION ALL
        SELECT 'ASSERTION-FAILED: multi-word entity — this twin assumes '
               || 'single-token entities', -1, -1, '', '', ''
        FROM ents WHERE entity LIKE '% %'
    """


def _kg_edges_oracle_sql() -> str:
    """Phase-3 + materialize twin over the standardization twin — the
    FLAGSHIP output (edges table) reproduced in SQL end-to-end:

    - G5 dedup (all Phase-2 rows non-inferred -> last per (s,p,o) by
      the (url, chunk_id, seq) order key);
    - distinct (s,o) edges with last-wins predicates;
    - transitive compose ("indirectly p" / "p1 via mid"), existing
      pairs and self-pairs excluded, the 3-word predicate limit with
      its trailing-stop-word drop re-applied;
    - lexical containment ("is type of" from substring containment —
      with single-token entities the shared-word rules cannot fire),
      existing pairs excluded in both orientations;
    - final union where non-inferred keys always win, inferred rows
      carry the ('', 0) lineage defaults, self-loops dropped.

    Row-identical to build_graph's edges at sf0.001 (3932/27 — the
    verify-drive stats) and sf0.01 (3910/64). Assumes the per-block
    lexical candidate cap (200) never binds at fixture scale (block
    candidate sets here are far smaller) and inherits the raw twin's
    poison-row guards."""
    return f"""
        WITH std AS ({_kg_triples_std_oracle_sql()}),
        g5 AS (
          SELECT url, chunk_id, seq, subject, predicate, object FROM (
            SELECT *, row_number() OVER (
              PARTITION BY subject, predicate, object
              ORDER BY url DESC, chunk_id DESC, seq DESC) AS rn
            FROM std) WHERE rn = 1
        ),
        edges AS (
          SELECT subject, object, predicate FROM (
            SELECT *, row_number() OVER (
              PARTITION BY subject, object
              ORDER BY url DESC, chunk_id DESC, seq DESC) AS rn
            FROM g5) WHERE rn = 1
        ),
        epairs AS (SELECT subject AS s, object AS o FROM edges),
        trans0 AS (
          SELECT a.subject AS s,
                 CASE WHEN a.predicate = b.predicate
                      THEN 'indirectly ' || a.predicate
                      ELSE a.predicate || ' via ' || a.object END AS pred_raw,
                 b.object AS o
          FROM edges a JOIN edges b ON a.object = b.subject
          WHERE a.subject <> b.object
            AND NOT EXISTS (SELECT 1 FROM epairs e
                            WHERE e.s = a.subject AND e.o = b.object)
        ),
        trans AS (
          SELECT DISTINCT s, o,
            CASE WHEN len(string_split(pred_raw,' ')) <= 3 THEN pred_raw
                 WHEN lower(string_split(pred_raw,' ')[3]) IN
                      ('a','an','the','of','with','by','to','from','in',
                       'on','for')
                 THEN array_to_string(string_split(pred_raw,' ')[1:2], ' ')
                 ELSE array_to_string(string_split(pred_raw,' ')[1:3], ' ')
            END AS predicate
          FROM trans0
        ),
        lents AS (
          SELECT DISTINCT e FROM (
            SELECT subject AS e FROM edges UNION SELECT object FROM edges)
        ),
        lex AS (
          SELECT h.e AS s, 'is type of' AS predicate, n.e AS o
          FROM lents n JOIN lents h
            ON n.e <> h.e AND position(n.e IN h.e) > 0 AND length(n.e) >= 3
          WHERE NOT EXISTS (SELECT 1 FROM epairs p WHERE
                  (p.s = least(n.e,h.e) AND p.o = greatest(n.e,h.e))
               OR (p.s = greatest(n.e,h.e) AND p.o = least(n.e,h.e)))
        ),
        inf_dd AS (
          SELECT DISTINCT s, predicate, o FROM (
            SELECT s, predicate, o FROM trans
            UNION ALL SELECT s, predicate, o FROM lex)
        ),
        final AS (
          SELECT subject AS src, object AS dst, predicate,
                 FALSE AS inferred, chunk_id, url
          FROM g5
          UNION ALL
          SELECT i.s, i.o, i.predicate, TRUE, 0, ''
          FROM inf_dd i
          WHERE NOT EXISTS (SELECT 1 FROM g5 g
                WHERE g.subject = i.s AND g.predicate = i.predicate
                  AND g.object = i.o)
        )
        SELECT src, dst, predicate, inferred,
               CAST(chunk_id AS BIGINT) AS chunk_id, url
        FROM final WHERE src <> dst
    """


def _kg_nodes_oracle_sql() -> str:
    """Nodes-table twin over the edges twin — the LAST link of the
    flagship chain (reference ``visualization.py:154-163,186-205``):

    - degree = count over the src/dst union of the final edges;
    - community = rank of the component's min-label representative
      (components over the NON-inferred distinct pairs — Phase 3
      computes them before the inferred edges are added, mirroring
      the reference's communities-then-cross-links order) via the
      same recursive-CTE reachability used by ``graph_components``;
    - size = ``10.0 + 20.0 * degree/max_degree`` with the division
      and FMA order mirrored exactly (the only float surface).
    """
    return f"""
        WITH RECURSIVE e AS ({_kg_edges_oracle_sql()}),
        deg AS (
          SELECT entity, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT src AS entity FROM e UNION ALL SELECT dst AS entity FROM e)
          GROUP BY entity
        ),
        mx AS (SELECT max(degree) AS m FROM deg),
        base AS (SELECT DISTINCT src AS s, dst AS o FROM e WHERE NOT inferred),
        und AS (SELECT s, o FROM base UNION SELECT o AS s, s AS o FROM base),
        reach AS (
          SELECT s AS entity, s AS r FROM und
          UNION
          SELECT reach.entity, u.o FROM reach JOIN und u ON u.s = reach.r
        ),
        comp AS (SELECT entity, min(r) AS rep FROM reach GROUP BY entity),
        rk AS (
          SELECT rep,
                 CAST(row_number() OVER (ORDER BY rep) - 1 AS INTEGER)
                   AS community
          FROM (SELECT DISTINCT rep FROM comp)
        )
        SELECT d.entity, d.degree,
               CAST(coalesce(rk.community, -1) AS INTEGER) AS community,
               10.0 + 20.0 * (CAST(d.degree AS DOUBLE) / CAST(mx.m AS DOUBLE))
                 AS "size"
        FROM deg d
        LEFT JOIN comp c ON c.entity = d.entity
        LEFT JOIN rk ON rk.rep = c.rep
        CROSS JOIN mx
    """


# ---------------------------------------------------------------------------
# Training-generator twins over the kg_edges twin. Shared pieces:
# Python str.title() reproduced char-level (uppercase a-z when the
# previous char is not a letter), md5 ranks mirroring
# training._md5_rank, and the reference's clean-predicate regex.
# ---------------------------------------------------------------------------

# expects a CTE `tq_ents(s)`; emits `tq_tc(s, t)` with t = Python
# s.replace('_',' ').title() for lowercase ASCII inputs
_TITLE_TC_SQL = """
        tq_tc AS MATERIALIZED (
          SELECT s, string_agg(
                   CASE WHEN ch BETWEEN 'a' AND 'z'
                             AND (prev IS NULL
                                  OR NOT regexp_matches(prev, '[A-Za-z]'))
                        THEN upper(ch) ELSE ch END, '' ORDER BY i) AS t
          FROM (
            SELECT s, u.i, substr(r, CAST(u.i AS INTEGER), 1) AS ch,
                   CASE WHEN u.i > 1
                        THEN substr(r, CAST(u.i AS INTEGER) - 1, 1) END AS prev
            FROM (SELECT s, replace(s, '_', ' ') AS r FROM tq_ents),
                 LATERAL (SELECT unnest(range(1, length(r) + 1)) AS i) u
          ) GROUP BY s
        )"""

_CLEAN_PRED_SQL = (
    "regexp_matches(lower(replace(predicate, ' ', '_')), '^[a-z0-9_ ]{3,}$')"
)


def _md5_rank_sql(tag: str, *cols: str, seed: int = 42) -> str:
    """SQL for ``training._md5_rank(seed, tag, *parts)`` — first 8 md5
    bytes big-endian as UBIGINT; ``cols`` are SQL string expressions."""
    parts = " || ':' || ".join(cols)
    return f"('0x' || substr(md5('{seed}:{tag}:' || {parts}), 1, 16))::UBIGINT"


def _training_qa_capped_cte() -> str:
    """Shared CTE chain: clean-predicate distinct pairs, per-relation
    md5-rank cap (30 normal / catchall below 3 pairs, cap 5) — the
    body of ``generate_relationship_qa`` up to template emission."""
    return f"""e AS MATERIALIZED ({_kg_edges_oracle_sql()}),
        tq_pairs AS MATERIALIZED (
          SELECT DISTINCT predicate AS rel, src AS s, dst AS d FROM e
          WHERE {_CLEAN_PRED_SQL}
        ),
        tq_sized AS (SELECT *, count(*) OVER (PARTITION BY rel) AS n FROM tq_pairs),
        tq_capped AS MATERIALIZED (
          SELECT rel, s, d, n < 3 AS catchall FROM (
            SELECT rel, s, d, n,
                   row_number() OVER (PARTITION BY rel ORDER BY
                     {_md5_rank_sql("qa:' || rel || '", "s", "d")}, s, d
                   ) AS rn
            FROM tq_sized)
          WHERE rn <= CASE WHEN n < 3 THEN 5 ELSE 30 END
        )"""


def _training_qa_oracle_sql() -> str:
    """Twin of ``generate_relationship_qa`` (q_training_qa)."""
    return f"""
        WITH RECURSIVE {_training_qa_capped_cte()},
        tq_ents AS (SELECT DISTINCT s FROM (
          SELECT s FROM tq_capped UNION ALL SELECT d FROM tq_capped)),
        {_TITLE_TC_SQL}
        SELECT 'What is the relationship between ' || ts.t || ' and '
                 || td.t || '?' AS instruction,
               '' AS input,
               ts.t || ' ' || replace(c.rel, '_', ' ') || ' ' || td.t || '.'
                 AS output,
               CASE WHEN c.catchall THEN 'relationship_qa_catchall'
                    ELSE 'relationship_qa' END AS category
        FROM tq_capped c
        JOIN tq_tc ts ON ts.s = c.s
        JOIN tq_tc td ON td.s = c.d
    """


def _training_stratified_split_oracle_sql() -> str:
    """Twin of q_training_stratified_split: the per-(category, split)
    COUNTS of the 80/10/10 stratified split depend only on each
    stratum's size (round-half-even slice bounds; the in-stratum hash
    order never changes the counts), so the twin is bounds arithmetic
    over the relationship-QA category sizes — including Python's
    0.8 + 0.1 float accumulation for the second boundary."""
    return f"""
        WITH RECURSIVE {_training_qa_capped_cte()},
        tq_cats AS (
          SELECT CASE WHEN catchall THEN 'relationship_qa_catchall'
                      ELSE 'relationship_qa' END AS category,
                 CAST(count(*) AS BIGINT) AS n
          FROM tq_capped GROUP BY 1
        ),
        tq_bounds AS (
          SELECT category, n,
                 CAST(roundbankers(0.8 * n, 0) AS BIGINT) AS b1,
                 CAST(roundbankers((0.8 + 0.1) * n, 0) AS BIGINT) AS b2
          FROM tq_cats
        )
        SELECT category, split, n FROM (
          SELECT category, 'train' AS split, b1 AS n FROM tq_bounds
          UNION ALL
          SELECT category, 'val', greatest(b2 - b1, 0) FROM tq_bounds
          UNION ALL
          SELECT category, 'test', n - greatest(b2, b1) FROM tq_bounds
        ) WHERE n > 0
    """


def _training_counterfactual_oracle_sql() -> str:
    """Twin of ``generate_counterfactual_qa``: per clean relation the
    md5-rank-capped kept edges each draw the first valid wrong object
    in a seeded rotation of the relation's object pool — min rotation
    position over the valid candidates."""
    return f"""
        WITH RECURSIVE e AS MATERIALIZED ({_kg_edges_oracle_sql()}),
        tq_pairs AS MATERIALIZED (
          SELECT DISTINCT predicate AS rel, src AS s, dst AS d FROM e
          WHERE {_CLEAN_PRED_SQL}
        ),
        tq_objs AS MATERIALIZED (
          SELECT rel, d AS obj,
                 CAST(row_number() OVER (PARTITION BY rel ORDER BY d) - 1
                      AS BIGINT) AS idx,
                 count(*) OVER (PARTITION BY rel) AS n_obj
          FROM (SELECT DISTINCT rel, d FROM tq_pairs)
        ),
        tq_eligible AS (SELECT DISTINCT rel FROM tq_objs WHERE n_obj >= 2),
        tq_kept AS (
          SELECT rel, s, d FROM (
            SELECT p.rel, p.s, p.d,
                   row_number() OVER (PARTITION BY p.rel ORDER BY
                     {_md5_rank_sql("cf:' || p.rel || '", "p.s", "p.d")},
                     p.s, p.d) AS rn
            FROM tq_pairs p JOIN tq_eligible USING (rel)) WHERE rn <= 30
        ),
        tq_starts AS (
          SELECT k.rel, k.s, k.d,
                 CAST({_md5_rank_sql("cfs:' || k.rel || '", "k.s", "k.d")}
                      % o.n_obj AS BIGINT) AS start, o.n_obj
          FROM tq_kept k
          JOIN (SELECT DISTINCT rel, n_obj FROM tq_objs) o USING (rel)
        ),
        tq_wrong AS (
          SELECT rel, s, d, obj AS tq_wrong FROM (
            SELECT st.rel, st.s, st.d, o.obj,
                   row_number() OVER (PARTITION BY st.rel, st.s, st.d
                     ORDER BY (o.idx - st.start + st.n_obj) % st.n_obj) AS rk
            FROM tq_starts st
            JOIN tq_objs o ON o.rel = st.rel
            WHERE o.obj <> st.d
              AND NOT EXISTS (SELECT 1 FROM tq_pairs p
                              WHERE p.rel = st.rel AND p.s = st.s
                                AND p.d = o.obj)
          ) WHERE rk = 1
        ),
        tq_ents AS (
          SELECT DISTINCT s FROM (
            SELECT s FROM tq_wrong UNION ALL SELECT d FROM tq_wrong
            UNION ALL SELECT tq_wrong FROM tq_wrong)
        ),
        {_TITLE_TC_SQL}
        SELECT 'Is it true that ' || ts.t || ' ' || replace(w.rel, '_', ' ')
                 || ' ' || tw.t || '?' AS instruction,
               '' AS input,
               'No. The graph does not record that ' || ts.t || ' '
                 || replace(w.rel, '_', ' ') || ' ' || tw.t
                 || '. The recorded relationship is: ' || ts.t || ' '
                 || replace(w.rel, '_', ' ') || ' ' || td.t || '.' AS output,
               'counterfactual_qa' AS category
        FROM tq_wrong w
        JOIN tq_tc ts ON ts.s = w.s
        JOIN tq_tc td ON td.s = w.d
        JOIN tq_tc tw ON tw.s = w.tq_wrong
    """


def _training_anti_pattern_oracle_sql() -> str:
    """Twin of ``generate_anti_pattern_qa``: md5-rank-capped picks
    each cross-pair with the first rotation partner satisfying
    s2<>s1, o2<>o1 and (s1,o2) not an edge."""
    return f"""
        WITH RECURSIVE e AS MATERIALIZED ({_kg_edges_oracle_sql()}),
        tq_pairs AS MATERIALIZED (
          SELECT DISTINCT predicate AS rel, src AS s, dst AS d FROM e
          WHERE {_CLEAN_PRED_SQL}
        ),
        tq_rows AS MATERIALIZED (
          SELECT rel, s, d,
                 CAST(row_number() OVER (PARTITION BY rel ORDER BY s, d) - 1
                      AS BIGINT) AS idx,
                 count(*) OVER (PARTITION BY rel) AS n_rows
          FROM tq_pairs
        ),
        tq_picks AS (
          SELECT rel, s, d FROM (
            SELECT r.rel, r.s, r.d,
                   row_number() OVER (PARTITION BY r.rel ORDER BY
                     {_md5_rank_sql("ap:' || r.rel || '", "r.s", "r.d")},
                     r.s, r.d) AS rn
            FROM tq_rows r WHERE r.n_rows >= 2) WHERE rn <= 30
        ),
        tq_starts AS (
          SELECT p.rel, p.s AS s1, p.d AS o1,
                 CAST({_md5_rank_sql("aps:' || p.rel || '", "p.s", "p.d")}
                      % r.n_rows AS BIGINT) AS start, r.n_rows
          FROM tq_picks p
          JOIN (SELECT DISTINCT rel, n_rows FROM tq_rows) r USING (rel)
        ),
        tq_partner AS (
          SELECT rel, s1, o1, s2, o2 FROM (
            SELECT st.rel, st.s1, st.o1, r.s AS s2, r.d AS o2,
                   row_number() OVER (PARTITION BY st.rel, st.s1, st.o1
                     ORDER BY (r.idx - st.start + st.n_rows) % st.n_rows)
                     AS rk
            FROM tq_starts st
            JOIN tq_rows r ON r.rel = st.rel
            WHERE r.s <> st.s1 AND r.d <> st.o1
              AND NOT EXISTS (SELECT 1 FROM tq_pairs p
                              WHERE p.rel = st.rel AND p.s = st.s1
                                AND p.d = r.d)
          ) WHERE rk = 1
        ),
        tq_ents AS (
          SELECT DISTINCT s FROM (
            SELECT s1 AS s FROM tq_partner UNION ALL SELECT o1 FROM tq_partner
            UNION ALL SELECT s2 FROM tq_partner
            UNION ALL SELECT o2 FROM tq_partner)
        ),
        {_TITLE_TC_SQL}
        SELECT 'What is wrong with this statement: "' || t1.t || ' '
                 || replace(tq_pr.rel, '_', ' ') || ' ' || t4.t || '"?'
                 AS instruction,
               '' AS input,
               'The statement mixes up two separate facts (a wrong-pairing '
                 || 'error). The graph records ' || t1.t || ' '
                 || replace(tq_pr.rel, '_', ' ') || ' ' || t2.t || ' and '
                 || t3.t || ' ' || replace(tq_pr.rel, '_', ' ') || ' ' || t4.t
                 || '; it does not connect ' || t1.t || ' to ' || t4.t
                 || ' via ''' || replace(tq_pr.rel, '_', ' ') || '''.' AS output,
               'anti_pattern_qa' AS category
        FROM tq_partner tq_pr
        JOIN tq_tc t1 ON t1.s = tq_pr.s1
        JOIN tq_tc t2 ON t2.s = tq_pr.o1
        JOIN tq_tc t3 ON t3.s = tq_pr.s2
        JOIN tq_tc t4 ON t4.s = tq_pr.o2
    """


def _training_chains_oracle_sql() -> str:
    """Twin of ``generate_reasoning_chain_qa``: per-mid top-2 capped
    in/out neighbor picks (lexicographic, de-correlated directions),
    unique chain keys, global 200 cap by key."""
    return f"""
        WITH RECURSIVE e AS MATERIALIZED ({_kg_edges_oracle_sql()}),
        tq_lhs AS MATERIALIZED (
          SELECT mid, a, p1 FROM (
            SELECT dst AS mid, src AS a, predicate AS p1,
                   row_number() OVER (PARTITION BY dst
                     ORDER BY src, predicate) AS rn
            FROM e) WHERE rn <= 2
        ),
        tq_rhs AS MATERIALIZED (
          SELECT mid, c, p2 FROM (
            SELECT src AS mid, dst AS c, predicate AS p2,
                   row_number() OVER (PARTITION BY src
                     ORDER BY dst DESC, predicate DESC) AS rn
            FROM e) WHERE rn <= 2
        ),
        tq_chains AS (
          SELECT l.a, l.p1, l.mid, r.p2, r.c
          FROM tq_lhs l JOIN tq_rhs r USING (mid)
          WHERE l.a <> l.mid AND l.mid <> r.c AND l.a <> r.c
        ),
        -- the stage's NUL-joined sort key orders exactly like the
        -- field tuple (NUL sorts below every value byte)
        tq_top AS (
          SELECT DISTINCT a, p1, mid, p2, c
          FROM (SELECT * FROM tq_chains ORDER BY a, mid, c, p1, p2 LIMIT 200)
        ),
        tq_ents AS (
          SELECT DISTINCT s FROM (
            SELECT a AS s FROM tq_top UNION ALL SELECT mid FROM tq_top
            UNION ALL SELECT c FROM tq_top)
        ),
        {_TITLE_TC_SQL}
        SELECT 'Explain the connection between ' || ta.t || ' and ' || tcc.t
                 || ' step by step.' AS instruction,
               '' AS input,
               'Step 1: ' || ta.t || ' ' || replace(p1, '_', ' ') || ' '
                 || tm.t || '.' || chr(10)
                 || 'Step 2: ' || tm.t || ' ' || replace(p2, '_', ' ') || ' '
                 || tcc.t || '.' || chr(10)
                 || 'Therefore ' || ta.t || ' is connected to ' || tcc.t
                 || ' through ' || tm.t || '.' AS output,
               'reasoning_chain' AS category
        FROM tq_top
        JOIN tq_tc ta ON ta.s = tq_top.a
        JOIN tq_tc tm ON tm.s = tq_top.mid
        JOIN tq_tc tcc ON tcc.s = tq_top.c
    """


def _training_comparisons_oracle_sql() -> str:
    """Twin of ``generate_comparison_qa``: per common node the first
    10 sorted distinct neighbors pair up (upper triangle), pairs
    dedup to the smallest common, global 200 cap by (a, b)."""
    return f"""
        WITH RECURSIVE e AS MATERIALIZED ({_kg_edges_oracle_sql()}),
        tq_nb AS MATERIALIZED (
          SELECT DISTINCT common, neighbor FROM (
            SELECT src AS common, dst AS neighbor FROM e
            UNION ALL SELECT dst, src FROM e)
        ),
        tq_ranked AS (
          SELECT common, neighbor,
                 row_number() OVER (PARTITION BY common
                                    ORDER BY neighbor) AS rn
          FROM tq_nb
        ),
        tq_pr AS (
          SELECT x.neighbor AS a, y.neighbor AS b, x.common
          FROM tq_ranked x JOIN tq_ranked y
            ON x.common = y.common AND x.rn < y.rn
          WHERE x.rn <= 10 AND y.rn <= 10
        ),
        tq_dd AS (
          SELECT a, b, min(common) AS common FROM tq_pr GROUP BY a, b
        ),
        tq_top AS (SELECT * FROM tq_dd ORDER BY a, b LIMIT 200),
        tq_ents AS (
          SELECT DISTINCT s FROM (
            SELECT a AS s FROM tq_top UNION ALL SELECT b FROM tq_top
            UNION ALL SELECT common FROM tq_top)
        ),
        {_TITLE_TC_SQL}
        SELECT 'Compare and contrast ' || ta.t || ' and ' || tb.t || '.'
                 AS instruction,
               '' AS input,
               ta.t || ' and ' || tb.t || ' are related concepts: both '
                 || 'connect to ' || tcm.t || '. They play distinct roles '
                 || 'but share this common neighbor in the graph.' AS output,
               'concept_comparison' AS category
        FROM tq_top
        JOIN tq_tc ta ON ta.s = tq_top.a
        JOIN tq_tc tb ON tb.s = tq_top.b
        JOIN tq_tc tcm ON tcm.s = tq_top.common
    """


def _training_concept_oracle_sql() -> str:
    """Twin of q_training_concept_qa: nodes are typed 'concept' with
    empty attrs, so only the fact-list branch fires — per source
    entity the first 5 distinct out-edges by (predicate, dst)."""
    return f"""
        WITH RECURSIVE e AS MATERIALIZED ({_kg_edges_oracle_sql()}),
        tq_ents AS (SELECT DISTINCT s FROM (
          SELECT src AS s FROM e UNION ALL SELECT dst FROM e)),
        {_TITLE_TC_SQL},
        tq_facts_rows AS (
          SELECT src, predicate, dst,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY predicate, dst) AS rn
          FROM (SELECT DISTINCT src, predicate, dst FROM e)
        ),
        tq_facts AS (
          SELECT f.src,
                 string_agg('- ' || replace(f.predicate, '_', ' ') || ' '
                            || td.t, chr(10)
                            ORDER BY f.predicate, f.dst) AS lines,
                 CAST(count(*) AS BIGINT) AS n_out
          FROM tq_facts_rows f
          JOIN tq_tc td ON td.s = f.dst
          WHERE f.rn <= 5
          GROUP BY f.src
        )
        SELECT 'What is ' || ts.t || '?' AS instruction,
               '' AS input,
               ts.t || ' is a concept with these key relationships:'
                 || chr(10) || f.lines AS output,
               'concept_from_graph' AS category
        FROM tq_facts f JOIN tq_tc ts ON ts.s = f.src
        WHERE f.n_out >= 2
    """


def _training_model_selection_oracle_sql() -> str:
    """Twin of q_training_model_selection: hubs = top-8 sources by
    distinct out-degree (ties by name), requirements = each hub's
    first 20 sorted distinct out-neighbors; two QA cards per model
    (the selection card only when >= 2 requirements)."""
    return f"""
        WITH RECURSIVE e AS MATERIALIZED ({_kg_edges_oracle_sql()}),
        tq_distinct_e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e),
        tq_hubs AS (
          SELECT src FROM (
            SELECT src, count(*) AS deg FROM tq_distinct_e GROUP BY src
            ORDER BY deg DESC, src ASC LIMIT 8)
        ),
        tq_reqs AS (
          SELECT src AS model, dst AS requirement,
                 row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
          FROM tq_distinct_e JOIN tq_hubs USING (src)
        ),
        tq_kept AS (SELECT model, requirement, rn FROM tq_reqs WHERE rn <= 20),
        tq_ents AS (
          SELECT DISTINCT s FROM (
            SELECT model AS s FROM tq_kept
            UNION ALL SELECT requirement FROM tq_kept)
        ),
        {_TITLE_TC_SQL},
        tq_per_model AS (
          SELECT k.model,
                 CAST(count(*) AS BIGINT) AS n_reqs,
                 string_agg('  - ' || t.t, chr(10) ORDER BY k.rn)
                   FILTER (WHERE k.rn <= 10) AS req_text,
                 string_agg(t.t, ', ' ORDER BY k.rn)
                   FILTER (WHERE k.rn <= 3) AS subset
          FROM tq_kept k JOIN tq_tc t ON t.s = k.requirement
          GROUP BY k.model
        ),
        tq_cards AS (
          SELECT p.model, tm.t AS label, p.n_reqs, p.req_text, p.subset,
                 CASE WHEN p.n_reqs > 10
                      THEN chr(10) || '  (+'
                           || CAST(p.n_reqs - 10 AS VARCHAR) || ' more)'
                      ELSE '' END AS more
          FROM tq_per_model p JOIN tq_tc tm ON tm.s = p.model
        )
        SELECT instruction, input, output, category FROM (
          SELECT 'When does the ' || label || ' model apply?' AS instruction,
                 '' AS input,
                 'The ' || label || ' model requires:' || chr(10) || chr(10)
                   || req_text || more || chr(10) || chr(10)
                   || 'All conditions must be met. If any requirement is '
                   || 'missing, do not force the match.' AS output,
                 'model_requirements' AS category
          FROM tq_cards
          UNION ALL
          SELECT 'These concepts are present: ' || subset
                   || '. Which model applies?',
                 '',
                 'Based on these concepts, the ' || label || ' model is the '
                   || 'best fit.' || chr(10) || chr(10)
                   || 'This model specifically requires:' || chr(10)
                   || req_text || more || chr(10) || chr(10)
                   || 'Confirm the remaining requirements before concluding.',
                 'model_selection'
          FROM tq_cards WHERE n_reqs >= 2
        )
    """


def _betweenness_oracle_sql(
    n_sources: int = 25, max_hops: int = 6, scale: int = 1_000_000
) -> str:
    """Twin of q_graph_betweenness — integer Brandes unrolled: the
    fixed-point dependency ``sigma_u * (scale + delta_w) // sigma_w``
    is exact integer arithmetic, and max_hops bounds the BFS, so the
    forward sigma sweep and the backward delta accumulation both
    unroll into per-level CTE stages (shared across the source sample
    via a source column, exactly like the distributed path)."""
    src_list = ", ".join(f"'n{i}'" for i in range(n_sources))
    head = f"""
        WITH {_CNR_EDGES_SQL},
        simple AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM edges WHERE src <> dst
        ),
        und AS MATERIALIZED (
          SELECT a AS u, b AS v FROM simple
          UNION ALL SELECT b, a FROM simple
        ),
        lev0 AS (
          SELECT u AS source, u AS entity, CAST(1 AS BIGINT) AS sigma
          FROM (SELECT DISTINCT u FROM und) WHERE u IN ({src_list})
        ),
        vis0 AS (SELECT source, entity FROM lev0)"""
    steps = []
    for l in range(1, max_hops + 1):
        steps.append(f""",
        lev{l} AS MATERIALIZED (
          SELECT f.source, e.v AS entity, CAST(sum(f.sigma) AS BIGINT) AS sigma
          FROM lev{l - 1} f JOIN und e ON e.u = f.entity
          WHERE NOT EXISTS (SELECT 1 FROM vis{l - 1} x
                            WHERE x.source = f.source AND x.entity = e.v)
          GROUP BY f.source, e.v
        ),
        vis{l} AS (SELECT * FROM vis{l - 1}
                   UNION ALL SELECT source, entity FROM lev{l})""")
    # backward: delta at the deepest level is 0; each shallower level
    # sums the floored per-(u, w) contributions from the level below
    steps.append(f""",
        del{max_hops} AS (
          SELECT source, entity, CAST(0 AS BIGINT) AS delta FROM lev{max_hops}
        )""")
    for l in range(max_hops - 1, 0, -1):
        steps.append(f""",
        con{l} AS (
          SELECT f.source, f.entity,
                 CAST(sum((f.sigma * ({scale} + d.delta)) // w.sigma)
                   AS BIGINT) AS delta
          FROM lev{l} f
          JOIN und e ON e.u = f.entity
          JOIN lev{l + 1} w ON w.source = f.source AND w.entity = e.v
          JOIN del{l + 1} d ON d.source = f.source AND d.entity = e.v
          GROUP BY f.source, f.entity
        ),
        del{l} AS MATERIALIZED (
          SELECT f.source, f.entity,
                 CAST(coalesce(c.delta, 0) AS BIGINT) AS delta
          FROM lev{l} f LEFT JOIN con{l} c
            ON c.source = f.source AND c.entity = f.entity
        )""")
    dels = " UNION ALL ".join(
        f"SELECT entity, delta FROM del{l}" for l in range(1, max_hops + 1)
    )
    tail = f"""
        SELECT entity, CAST(sum(delta) AS BIGINT) AS bc_scaled
        FROM ({dels}) GROUP BY entity HAVING sum(delta) > 0
    """
    return head + "".join(steps) + tail


def _kg_training_pipeline_oracle_sql() -> str:
    """Twin of q_kg_training_pipeline: relationship QA (the
    training_qa twin), per-row stratified 80/10/10 labels (in-stratum
    order = the stage's portable md5 rank over the unit-separator-
    joined key columns + seed), and the chatml record as a literal
    json.dumps template (the QA content needs no JSON escaping:
    letters, digits, spaces and .?' only)."""
    from ..stages.training import DEFAULT_SYSTEM_PROMPT

    rank = ("('0x' || substr(md5(instruction || chr(31) || input || chr(31)"
            " || output || chr(31) || '42'), 1, 16))::UBIGINT")
    return f"""
        WITH RECURSIVE {_training_qa_capped_cte()},
        tq_ents AS (SELECT DISTINCT s FROM (
          SELECT s FROM tq_capped UNION ALL SELECT d FROM tq_capped)),
        {_TITLE_TC_SQL},
        qa AS MATERIALIZED (
          SELECT 'What is the relationship between ' || ts.t || ' and '
                   || td.t || '?' AS instruction,
                 '' AS input,
                 ts.t || ' ' || replace(c.rel, '_', ' ') || ' ' || td.t || '.'
                   AS output,
                 CASE WHEN c.catchall THEN 'relationship_qa_catchall'
                      ELSE 'relationship_qa' END AS category
          FROM tq_capped c
          JOIN tq_tc ts ON ts.s = c.s
          JOIN tq_tc td ON td.s = c.d
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY category ORDER BY
                   {rank}, instruction, input, output) AS rn,
                 count(*) OVER (PARTITION BY category) AS n
          FROM qa
        ),
        labeled AS (
          SELECT *,
                 CASE WHEN rn <= roundbankers(0.8 * n, 0) THEN 'train'
                      WHEN rn <= roundbankers((0.8 + 0.1) * n, 0) THEN 'val'
                      ELSE 'test' END AS split
          FROM ranked
        )
        SELECT '{{"messages": [{{"role": "system", "content": '
                 || '"{DEFAULT_SYSTEM_PROMPT}"}}, '
                 || '{{"role": "user", "content": "' || instruction
                 || '"}}, {{"role": "assistant", "content": "' || output
                 || '"}}]}}' AS record,
               split
        FROM labeled
    """


def _kg_record_analysis_oracle_sql() -> str:
    """Twin of q_kg_record_analysis: bounded node-context map (top-200
    subjects by edge count, first 3 predicates x first 3 objects,
    sorted), substring hits of node names in lowercased document text
    (first 6, name order), and the annotation prose assembled with
    ordered string_aggs."""
    return f"""
        WITH RECURSIVE e AS MATERIALIZED ({_kg_edges_oracle_sql()}),
        ra_keep AS MATERIALIZED (
          SELECT src FROM (
            SELECT src, count(*) AS cnt FROM e GROUP BY src
            ORDER BY cnt DESC, src ASC LIMIT 200)
        ),
        ra_triples AS (
          SELECT DISTINCT t.src, t.predicate, t.dst
          FROM e t JOIN ra_keep USING (src)
        ),
        ra_pred AS (
          SELECT src, predicate,
                 dense_rank() OVER (PARTITION BY src ORDER BY predicate)
                   AS pr
          FROM (SELECT DISTINCT src, predicate FROM ra_triples)
        ),
        ra_objs AS (
          SELECT src, predicate, dst,
                 row_number() OVER (PARTITION BY src, predicate
                                    ORDER BY dst) AS orn
          FROM ra_triples
        ),
        tq_ents AS (
          SELECT DISTINCT s FROM (
            SELECT src AS s FROM ra_triples
            UNION ALL SELECT dst FROM ra_triples)
        ),
        {_TITLE_TC_SQL},
        ra_lines AS (
          SELECT o.src, o.predicate,
                 '  - ' || ts.t || ' ' || replace(o.predicate, '_', ' ')
                   || ': ' || string_agg(tobj.t, ', ' ORDER BY o.dst)
                   AS line
          FROM ra_objs o
          JOIN ra_pred p ON p.src = o.src AND p.predicate = o.predicate
          JOIN tq_tc ts ON ts.s = o.src
          JOIN tq_tc tobj ON tobj.s = o.dst
          WHERE p.pr <= 3 AND o.orn <= 3
          GROUP BY o.src, o.predicate, ts.t
        ),
        ra_hits AS (
          SELECT doc_id, name FROM (
            SELECT d.doc_id, n.src AS name,
                   row_number() OVER (PARTITION BY d.doc_id
                                      ORDER BY n.src) AS hr
            FROM documents d
            JOIN (SELECT src FROM ra_keep WHERE length(src) >= 4) n
              ON strpos(lower(coalesce(d.text, '')), n.src) > 0
          ) WHERE hr <= 6
        ),
        ra_el AS (
          SELECT h.doc_id,
                 string_agg(tn.t, ', ' ORDER BY h.name) AS elements_text
          FROM ra_hits h JOIN tq_tc tn ON tn.s = h.name
          GROUP BY h.doc_id
        ),
        ra_gt AS (
          SELECT h.doc_id,
                 string_agg(l.line, chr(10) ORDER BY h.name, l.predicate)
                   AS graph_text
          FROM ra_hits h JOIN ra_lines l ON l.src = h.name
          GROUP BY h.doc_id
        ),
        ra_doc AS (
          SELECT el.doc_id, el.elements_text, gt.graph_text
          FROM ra_el el JOIN ra_gt gt USING (doc_id)
        )
        SELECT 'Analyze this record against the knowledge graph: which '
                 || 'recorded concepts does it involve and what do they '
                 || 'relate to?' AS instruction,
               'Record ' || CAST(doc_id AS VARCHAR) || '.' AS input,
               'Record Analysis (' || CAST(doc_id AS VARCHAR) || '):'
                 || chr(10) || chr(10)
                 || 'Concepts Present: ' || elements_text
                 || chr(10) || chr(10)
                 || 'Graph-Derived Context:' || chr(10) || graph_text
                 || chr(10) || chr(10)
                 || 'The record involves ' || elements_text
                 || '; the graph context above lists each concept''s '
                 || 'recorded relationships.' AS output,
               'record_analysis' AS category
        FROM ra_doc
    """


def _kg_incremental_oracle_sql() -> str:
    """Twin of q_kg_incremental — the release-to-release contract in
    SQL over the raw twin: the portable md5 url split (70/30), the
    release-1 alias map (identity first pass + stem merges, the same
    corpus-simple election as the kg_triples_std twin), frozen-alias
    application for release-2 entities seen in release 1, and the
    novel election (stem merges restricted to novels). Norm-key
    attach is structurally dead here: single-token entities make the
    election key the identity, so a key match IS a frozen hit."""
    return f"""
        WITH rawt AS ({_kg_triples_raw_oracle_sql()}),
        tagged AS MATERIALIZED (
          SELECT *,
                 ('0x' || substr(md5(url), 1, 16))::UBIGINT % 10 AS ub
          FROM rawt
        ),
        old_r AS (SELECT * FROM tagged WHERE ub < 7),
        new_r AS (SELECT * FROM tagged WHERE ub >= 7),
        ents_old AS (
          SELECT DISTINCT entity FROM (
            SELECT subject AS entity FROM old_r
            UNION ALL SELECT object FROM old_r)
        ),
        ord_old AS (
          SELECT entity, substr(entity, 1, 4) AS stem,
                 row_number() OVER (ORDER BY length(entity), entity) AS r
          FROM ents_old WHERE length(entity) > 4
        ),
        merges_old AS (
          SELECT t.entity AS variant, s.entity AS standard
          FROM ord_old t JOIN ord_old s ON s.stem = t.stem AND s.r < t.r
          QUALIFY row_number() OVER (PARTITION BY t.entity
                                     ORDER BY s.r DESC) = 1
        ),
        ents_new AS (
          SELECT DISTINCT entity FROM (
            SELECT subject AS entity FROM new_r
            UNION ALL SELECT object FROM new_r)
        ),
        novel AS (
          SELECT entity FROM ents_new
          WHERE entity NOT IN (SELECT entity FROM ents_old)
        ),
        ord_nov AS (
          SELECT entity, substr(entity, 1, 4) AS stem,
                 row_number() OVER (ORDER BY length(entity), entity) AS r
          FROM novel WHERE length(entity) > 4
        ),
        merges_nov AS (
          SELECT t.entity AS variant, s.entity AS standard
          FROM ord_nov t JOIN ord_nov s ON s.stem = t.stem AND s.r < t.r
          QUALIFY row_number() OVER (PARTITION BY t.entity
                                     ORDER BY s.r DESC) = 1
        ),
        amap AS MATERIALIZED (
          SELECT e.entity AS variant,
                 coalesce(mo.standard, e.entity) AS standard
          FROM ents_new e
          JOIN ents_old o ON o.entity = e.entity
          LEFT JOIN merges_old mo ON mo.variant = e.entity
          UNION ALL
          SELECT n.entity, coalesce(mn.standard, n.entity)
          FROM novel n LEFT JOIN merges_nov mn ON mn.variant = n.entity
        )
        SELECT r.url, r.chunk_id, r.seq,
               ms.standard AS subject, r.predicate,
               mo2.standard AS object
        FROM new_r r
        JOIN amap ms ON ms.variant = r.subject
        JOIN amap mo2 ON mo2.variant = r.object
        WHERE ms.standard <> mo2.standard
    """


def _corpus_curation_oracle_sql() -> str:
    """Twin of q_corpus_curation — the 5-step curation funnel in SQL:
    DuckDB nfc_normalize (byte-identical to Python, pinned by the NFC
    twin), min-id exact dedup on the normalized text, the Gopher gate
    twin retargeted at the deduped docs, the Lehmer mixture threshold
    (shared constants), and the prefix-sum shard placement."""
    gate = _gopher_oracle_sql().replace("FROM documents", "FROM docs_nfc")
    cases = "\n".join(
        f"            WHEN '{g}' THEN {(m * _LEHMER_MOD) // 1000}"
        for g, m in MIXTURE_RATES_MILLI.items()
    )
    default_thr = (MIXTURE_DEFAULT_MILLI * _LEHMER_MOD) // 1000
    return f"""
        WITH nfc_all AS (
          SELECT doc_id, source, nfc_normalize(coalesce(text, '')) AS text
          FROM documents
        ),
        docs_nfc AS MATERIALIZED (
          SELECT doc_id, source, text FROM (
            SELECT *, row_number() OVER (PARTITION BY text
                                         ORDER BY doc_id) AS rn
            FROM nfc_all) WHERE rn = 1
        ),
        gate AS MATERIALIZED ({gate}),
        survivors AS (
          SELECT g.doc_id, g.n_tokens, d.source
          FROM gate g JOIN docs_nfc d USING (doc_id)
          WHERE g.keep = 1
        ),
        sampled AS (
          SELECT * FROM survivors
          WHERE ((doc_id % {_LEHMER_MOD}) * {_LEHMER_MULT}) % {_LEHMER_MOD}
                < CASE source
{cases}
            ELSE {default_thr} END
        )
        SELECT doc_id, source,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), 0) // 20000 AS BIGINT) AS shard_id
        FROM sampled
    """


def _embedding_curation_oracle_sql(
    dim: int = 64,
    k_clusters: int = 8,
    km_iters: int = 5,
    threshold: float = 0.95,
    pq_m: int = 8,
    pq_k: int = 16,
    pq_iters: int = 4,
) -> str:
    """Twin of q_embedding_curation — the WHOLE vector-side curation
    chain in SQL: feature-hash embed (the doc_embed twin at dim 64),
    unit fixed-point quantization, the k=8 Lloyd fit + assignment
    (k-means twin pattern), SemDeDup within-cluster cosine >= 0.95
    edges closed by recursive min-label components (the cosine sums
    are EXACT — products of 2^-20-quantized values stay below 2^53),
    survivor anti-join, and the m=8 x k=16 PQ codebooks (4 Lloyd
    rounds with the subspace as a key column) encoded to the hex-built
    8-byte code blob."""
    scale = 1 << 20
    dsub = dim // pq_m
    head = f"""
        WITH toks_ec AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text,'')), '\\w+')) AS token
          FROM documents
        ),
        slots_ec AS (
          SELECT doc_id,
                 ('0x' || substr(h, 1, 8))::BIGINT % {dim} AS idx,
                 CASE WHEN strpos('13579bdf', substr(h, 10, 1)) > 0
                      THEN 1 ELSE -1 END AS sign
          FROM (SELECT doc_id, md5('13:' || token) AS h FROM toks_ec)
        ),
        hist_ec AS (
          SELECT doc_id, idx, CAST(sum(sign) AS BIGINT) AS c
          FROM slots_ec GROUP BY doc_id, idx
        ),
        norm_ec AS (
          SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS s2
          FROM hist_ec GROUP BY doc_id
        ),
        emb AS MATERIALIZED (
          SELECT d.doc_id AS vec_id, CAST(u.dd AS BIGINT) AS d,
                 CASE WHEN n.s2 IS NULL OR n.s2 = 0 THEN 0.0
                      ELSE CAST(coalesce(h.c, 0) AS DOUBLE)
                           / sqrt(CAST(n.s2 AS DOUBLE)) END AS x
          FROM documents d
          CROSS JOIN (SELECT unnest(range({dim})) AS dd) u
          LEFT JOIN hist_ec h ON h.doc_id = d.doc_id AND h.idx = u.dd
          LEFT JOIN norm_ec n ON n.doc_id = d.doc_id
        ),
        unrm AS (
          SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM emb GROUP BY vec_id
        ),
        fu AS MATERIALIZED (
          SELECT e.vec_id, e.d,
                 CAST(roundbankers(
                   e.x / greatest(u.nrm, 1e-12) * {scale}.0, 0) AS BIGINT)
                   AS fx
          FROM emb e JOIN unrm u USING (vec_id)
        ),
        fr AS MATERIALIZED (
          SELECT vec_id, d,
                 CAST(roundbankers(x * {scale}.0, 0) AS BIGINT) AS fx
          FROM emb
        ),
        kseeds AS (
          SELECT vec_id, CAST(row_number() OVER (
                   ORDER BY (vec_id * 48271) % 2147483647, vec_id) - 1
                 AS BIGINT) AS cluster
          FROM (SELECT DISTINCT vec_id FROM emb)
          QUALIFY row_number() OVER (
            ORDER BY (vec_id * 48271) % 2147483647, vec_id) <= {k_clusters}
        ),
        kc0 AS MATERIALIZED (
          SELECT s.cluster, f.d, CAST(f.fx AS DOUBLE) / {scale}.0 AS val
          FROM kseeds s JOIN fu f ON f.vec_id = s.vec_id
        )"""
    steps = []
    for i in range(1, km_iters + 1):
        steps.append(f""",
        ks{i} AS (
          SELECT f.vec_id, c.cluster,
                 sum(CAST(f.fx AS DOUBLE) / {scale}.0 * c.val) AS score
          FROM fu f JOIN kc{i - 1} c ON c.d = f.d
          GROUP BY f.vec_id, c.cluster
        ),
        ka{i} AS MATERIALIZED (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster, row_number() OVER (
              PARTITION BY vec_id ORDER BY score DESC, cluster ASC) AS rn
            FROM ks{i}) WHERE rn = 1
        ),
        ku{i} AS (
          SELECT a.cluster, f.d,
                 CAST(sum(f.fx) AS BIGINT) AS sfx,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM ka{i} a JOIN fu f ON f.vec_id = a.vec_id
          GROUP BY a.cluster, f.d
        ),
        km{i} AS (
          SELECT cluster, d,
                 CAST(sfx AS DOUBLE) / CAST(cnt * {scale} AS DOUBLE) AS mean
          FROM ku{i}
        ),
        kn{i} AS (
          SELECT cluster, sqrt(sum(mean * mean)) AS nrm
          FROM km{i} GROUP BY cluster
        ),
        kc{i} AS MATERIALIZED (
          SELECT p.cluster, p.d,
                 CASE WHEN nn.nrm > 1e-12 THEN m.mean / nn.nrm
                      ELSE p.val END AS val
          FROM kc{i - 1} p
          LEFT JOIN km{i} m ON m.cluster = p.cluster AND m.d = p.d
          LEFT JOIN kn{i} nn ON nn.cluster = p.cluster
        )""")
    dedup = f""",
        kfin AS (
          SELECT vec_id, cluster FROM (
            SELECT f.vec_id, c.cluster, row_number() OVER (
              PARTITION BY f.vec_id ORDER BY
                sum(CAST(f.fx AS DOUBLE) / {scale}.0 * c.val) DESC,
                c.cluster ASC) AS rn
            FROM fu f JOIN kc{km_iters} c ON c.d = f.d
            GROUP BY f.vec_id, c.cluster) WHERE rn = 1
        ),
        simp AS (
          SELECT a.vec_id AS hi, b.vec_id AS lo
          FROM kfin a JOIN kfin b
            ON a.cluster = b.cluster AND a.vec_id > b.vec_id
          JOIN (SELECT fa.vec_id AS va, fb.vec_id AS vb,
                       sum(CAST(fa.fx AS DOUBLE) / {scale}.0
                           * (CAST(fb.fx AS DOUBLE) / {scale}.0)) AS sim
                FROM fu fa JOIN fu fb ON fa.d = fb.d
                GROUP BY fa.vec_id, fb.vec_id) s
            ON s.va = a.vec_id AND s.vb = b.vec_id
          WHERE s.sim >= {threshold}
        ),
        sym AS (SELECT hi AS u, lo AS v FROM simp
                UNION ALL SELECT lo, hi FROM simp),
        reach AS (
          WITH RECURSIVE r(a, b) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM sym)
            UNION
            SELECT r.a, s.v FROM r JOIN sym s ON r.b = s.u
          ) SELECT * FROM r
        ),
        dmap AS (
          SELECT a AS vec_id, CAST(min(b) AS BIGINT) AS rep
          FROM reach GROUP BY a HAVING min(b) <> a
        ),
        surv AS MATERIALIZED (
          SELECT vec_id FROM (SELECT DISTINCT vec_id FROM emb)
          WHERE vec_id NOT IN (SELECT vec_id FROM dmap)
        ),
        pseeds AS (
          SELECT vec_id, CAST(row_number() OVER (
                   ORDER BY (vec_id * 48271) % 2147483647, vec_id) - 1
                 AS BIGINT) AS cl
          FROM surv
          QUALIFY row_number() OVER (
            ORDER BY (vec_id * 48271) % 2147483647, vec_id) <= {pq_k}
        ),
        frs AS MATERIALIZED (
          SELECT f.vec_id, f.d // {dsub} AS s, f.d % {dsub} AS j, f.fx
          FROM fr f JOIN surv USING (vec_id)
        ),
        sx2 AS MATERIALIZED (
          SELECT vec_id, s,
                 sum((CAST(fx AS DOUBLE) / {scale}.0)
                     * (CAST(fx AS DOUBLE) / {scale}.0)) AS v
          FROM frs GROUP BY vec_id, s
        ),
        pb0 AS MATERIALIZED (
          SELECT f.s, p.cl, f.j, CAST(f.fx AS DOUBLE) / {scale}.0 AS val
          FROM pseeds p JOIN frs f ON f.vec_id = p.vec_id
        )"""
    psteps = []
    for i in range(1, pq_iters + 1):
        psteps.append(f""",
        pd{i} AS (
          SELECT f.vec_id, f.s, b.cl,
                 sum(CAST(f.fx AS DOUBLE) / {scale}.0 * b.val) AS dot,
                 any_value(c2.v) AS sc2
          FROM frs f
          JOIN pb{i - 1} b ON b.s = f.s AND b.j = f.j
          JOIN (SELECT s, cl, sum(val * val) AS v
                FROM pb{i - 1} GROUP BY s, cl) c2
            ON c2.s = f.s AND c2.cl = b.cl
          GROUP BY f.vec_id, f.s, b.cl
        ),
        pa{i} AS MATERIALIZED (
          SELECT vec_id, s, cl FROM (
            SELECT d.vec_id, d.s, d.cl, row_number() OVER (
              PARTITION BY d.vec_id, d.s
              ORDER BY (x2.v - 2.0 * d.dot) + d.sc2 ASC, d.cl ASC) AS rn
            FROM pd{i} d JOIN sx2 x2
              ON x2.vec_id = d.vec_id AND x2.s = d.s) WHERE rn = 1
        ),
        pu{i} AS (
          SELECT a.s, a.cl, f.j,
                 CAST(sum(f.fx) AS BIGINT) AS sfx,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM pa{i} a JOIN frs f ON f.vec_id = a.vec_id AND f.s = a.s
          GROUP BY a.s, a.cl, f.j
        ),
        pb{i} AS MATERIALIZED (
          SELECT p.s, p.cl, p.j,
                 coalesce(CAST(u.sfx AS DOUBLE)
                          / CAST(u.cnt * {scale} AS DOUBLE), p.val) AS val
          FROM pb{i - 1} p
          LEFT JOIN pu{i} u ON u.s = p.s AND u.cl = p.cl AND u.j = p.j
        )""")
    tail = f""",
        pfin AS (
          SELECT vec_id, s, cl FROM (
            SELECT d.vec_id, d.s, d.cl, row_number() OVER (
              PARTITION BY d.vec_id, d.s
              ORDER BY (x2.v - 2.0 * d.dot) + d.sc2 ASC, d.cl ASC) AS rn
            FROM (
              SELECT f.vec_id, f.s, b.cl,
                     sum(CAST(f.fx AS DOUBLE) / {scale}.0 * b.val) AS dot,
                     any_value(c2.v) AS sc2
              FROM frs f
              JOIN pb{pq_iters} b ON b.s = f.s AND b.j = f.j
              JOIN (SELECT s, cl, sum(val * val) AS v
                    FROM pb{pq_iters} GROUP BY s, cl) c2
                ON c2.s = f.s AND c2.cl = b.cl
              GROUP BY f.vec_id, f.s, b.cl
            ) d JOIN sx2 x2 ON x2.vec_id = d.vec_id AND x2.s = d.s
          ) WHERE rn = 1
        )
        SELECT vec_id,
               string_agg(printf('%02x', cl), '' ORDER BY s) AS code_hex
        FROM pfin GROUP BY vec_id
    """
    return head + "".join(steps) + dedup + "".join(psteps) + tail


def _bpe_train_ctes(n_merges: int) -> str:
    """Shared CTE chain of the BPE trainer twin: the word-frequency
    table, char symbols with the ``</w>`` suffix marker, and one
    (best pair, apply) stage per merge — the data-dependent merge loop
    unrolls because termination is PERMANENT (an empty best leaves the
    state unchanged, so every later best is empty too) and the
    leftmost-non-overlapping application is run-parity over match
    islands. Distinct words never collide as symbol tuples, so the
    per-word row state is exact."""
    head = r"""toks_bpe AS (
          SELECT unnest(regexp_extract_all(lower(coalesce(text,'')), '\w+')) AS word
          FROM documents
        ),
        wc AS MATERIALIZED (
          SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM toks_bpe GROUP BY word
        ),
        st0 AS MATERIALIZED (
          SELECT word, CAST(u.i AS BIGINT) AS pos,
                 CASE WHEN u.i = length(word)
                      THEN substr(word, CAST(u.i AS INTEGER), 1) || '</w>'
                      ELSE substr(word, CAST(u.i AS INTEGER), 1) END AS sym
          FROM wc, LATERAL (SELECT unnest(range(1, length(word) + 1)) AS i) u
        )"""
    steps = []
    for i in range(1, n_merges + 1):
        steps.append(f""",
        best{i} AS MATERIALIZED (
          SELECT a, b FROM (
            SELECT s1.sym AS a, s2.sym AS b, sum(w.cnt) AS c
            FROM st{i - 1} s1
            JOIN st{i - 1} s2 ON s2.word = s1.word AND s2.pos = s1.pos + 1
            JOIN wc w ON w.word = s1.word
            GROUP BY s1.sym, s2.sym)
          WHERE c >= 2 ORDER BY c DESC, a ASC, b ASC LIMIT 1
        ),
        st{i} AS MATERIALIZED (
          SELECT word,
                 CAST(row_number() OVER (PARTITION BY word ORDER BY pos)
                      AS BIGINT) AS pos,
                 CASE WHEN app THEN sym || nxt ELSE sym END AS sym
          FROM (
            SELECT *, coalesce(lag(app) OVER (PARTITION BY word ORDER BY pos),
                               FALSE) AS prev_app
            FROM (
              SELECT word, pos, sym, nxt, mt,
                     coalesce(mt AND (row_number() OVER (
                       PARTITION BY word, isl ORDER BY pos) % 2 = 1),
                       FALSE) AS app
              FROM (
                SELECT *, CASE WHEN mt THEN pos - mrn END AS isl
                FROM (
                  SELECT *, row_number() OVER (
                    PARTITION BY word, mt ORDER BY pos) AS mrn
                  FROM (
                    SELECT s.word, s.pos, s.sym,
                           lead(s.sym) OVER (PARTITION BY s.word
                                             ORDER BY s.pos) AS nxt,
                           coalesce(s.sym = (SELECT a FROM best{i})
                             AND lead(s.sym) OVER (PARTITION BY s.word
                                                   ORDER BY s.pos)
                                 = (SELECT b FROM best{i}), FALSE) AS mt
                    FROM st{i - 1} s)
                )
              )
            )
          )
          WHERE NOT prev_app
        )""")
    return head + "".join(steps)


def _bpe_merges_union(n_merges: int) -> str:
    return "\n          UNION ALL ".join(
        f'SELECT {i - 1} AS rank, a AS "left", b AS "right" FROM best{i}'
        for i in range(1, n_merges + 1)
    )


def _bpe_merges_oracle_sql(n_merges: int = BPE_MERGES) -> str:
    """Twin of q_bpe_merges (see :func:`_bpe_train_ctes`)."""
    return f"""
        WITH {_bpe_train_ctes(n_merges)}
        SELECT CAST(rank AS BIGINT) AS rank, "left", "right" FROM (
          {_bpe_merges_union(n_merges)})
    """


def _bpe_token_counts_oracle_sql(
    n_merges: int = BPE_MERGES, encode_rounds: int = 10
) -> str:
    """Twin of q_doc_bpe_token_counts: the trainer chain above feeds a
    rank table, and the greedy lowest-rank-first encoder unrolls too —
    each round merges exactly ONE pair per word (min rank, leftmost on
    ties), so ``encode_rounds`` >= max word length covers every word;
    per-doc counts then join the per-word encoded lengths back onto
    the token stream."""
    steps = []
    for j in range(1, encode_rounds + 1):
        steps.append(f""",
        pick{j} AS (
          SELECT word, pos FROM (
            SELECT e.word, e.pos,
                   row_number() OVER (PARTITION BY e.word
                                      ORDER BY r.rank, e.pos) AS rn
            FROM en{j - 1} e
            JOIN en{j - 1} e2 ON e2.word = e.word AND e2.pos = e.pos + 1
            JOIN ranks r ON r."left" = e.sym AND r."right" = e2.sym
          ) WHERE rn = 1
        ),
        en{j} AS MATERIALIZED (
          SELECT word,
                 CAST(row_number() OVER (PARTITION BY word ORDER BY pos)
                      AS BIGINT) AS pos,
                 CASE WHEN hit THEN sym || nxt ELSE sym END AS sym
          FROM (
            SELECT e.word, e.pos, e.sym,
                   lead(e.sym) OVER (PARTITION BY e.word ORDER BY e.pos) AS nxt,
                   p.pos IS NOT NULL AND e.pos = p.pos AS hit,
                   pp.pos IS NOT NULL AND e.pos = pp.pos + 1 AS consumed
            FROM en{j - 1} e
            LEFT JOIN pick{j} p ON p.word = e.word AND p.pos = e.pos
            LEFT JOIN pick{j} pp ON pp.word = e.word AND pp.pos = e.pos - 1
          )
          WHERE NOT consumed
        )""")
    return f"""
        WITH {_bpe_train_ctes(n_merges)},
        ranks AS MATERIALIZED (
          SELECT CAST(rank AS BIGINT) AS rank, "left", "right" FROM (
            {_bpe_merges_union(n_merges)})
        ),
        en0 AS MATERIALIZED (SELECT * FROM st0)
        {"".join(steps)},
        wlen AS (
          SELECT word, CAST(count(*) AS BIGINT) AS n_sym
          FROM en{encode_rounds} GROUP BY word
        ),
        doc_toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text,'')), '\\w+'))
                   AS word
          FROM documents
        ),
        per AS (
          SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(l.n_sym) AS BIGINT) AS n_bpe_tokens
          FROM doc_toks t JOIN wlen l USING (word)
          GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
               CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
        FROM documents d LEFT JOIN per p USING (doc_id)
    """


def _mt19937_png_hist_oracle_sql() -> str:
    """Twin of q_media_png_histogram — MT19937 REPRODUCED IN SQL: the
    synthesized pixel stream is ``RandomState(seed).randint(0, 256,
    (h, w, 3), uint8)``, i.e. the little-endian bytes of successive
    tempered 32-bit Mersenne-Twister outputs. The 624-word seed init
    is one recursive CTE (the 31-bit products fit BIGINT); the twist
    is ONE parallel phase because every needed word index is < 227
    (the in-place recurrence only feeds back at stride 397); tempering
    is shift/mask algebra. The histogram then reduces over the exact
    regenerated bytes — a PNG codec roundtrip regression changes the
    decoded pixels and breaks the hash."""
    return r"""
        WITH RECURSIVE meta AS (
          SELECT doc_id AS media_id,
                 ('0x' || substr(h, 1, 8))::BIGINT AS seed,
                 (8 + ('0x' || substr(h, 9, 2))::BIGINT % 9)
                 * (8 + ('0x' || substr(h, 11, 2))::BIGINT % 9) * 3 AS n_bytes
          FROM (SELECT doc_id,
                       md5(CAST(doc_id AS VARCHAR) || ':'
                           || substr(coalesce(text,''), 1, 64)) AS h
                FROM documents)
        ),
        init(media_id, i, mt) AS (
          SELECT media_id, 0, seed FROM meta
          UNION ALL
          SELECT media_id, i + 1,
                 (1812433253 * xor(mt, mt // 1073741824) + i + 1) % 4294967296
          FROM init WHERE i < 623
        ),
        tw AS (
          SELECT a.media_id, a.i,
                 xor(xor(c.mt, ((a.mt // 2147483648) * 2147483648
                                + (b.mt % 2147483648)) // 2),
                     CASE WHEN ((a.mt // 2147483648) * 2147483648
                                + (b.mt % 2147483648)) % 2 = 1
                          THEN 2567483615 ELSE 0 END) AS mt
          FROM init a
          JOIN init b ON b.media_id = a.media_id AND b.i = a.i + 1
          JOIN init c ON c.media_id = a.media_id AND c.i = a.i + 397
          WHERE a.i < 192
        ),
        tp AS (
          SELECT media_id, i, xor(y3, y3 // 262144) AS y FROM (
            SELECT media_id, i,
                   xor(y2, (y2 * 32768) & 4022730752) AS y3 FROM (
              SELECT media_id, i,
                     xor(y1, (y1 * 128) & 2636928640) AS y2 FROM (
                SELECT media_id, i, xor(mt, mt // 2048) AS y1 FROM tw)))
        ),
        pix AS (
          SELECT t2.media_id, t2.i * 4 + b.j AS t,
                 CAST((t2.y // CASE b.j WHEN 0 THEN 1 WHEN 1 THEN 256
                                        WHEN 2 THEN 65536
                                        ELSE 16777216 END) % 256
                      AS BIGINT) AS v
          FROM tp t2, (SELECT unnest(range(4)) AS j) b
        )
        SELECT p.media_id,
               CAST(p.t % 3 AS BIGINT) AS channel,
               CAST(p.v // 16 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_pixels
        FROM pix p JOIN meta m USING (media_id)
        WHERE p.t < m.n_bytes
        GROUP BY p.media_id, p.t % 3, p.v // 16
    """


_MT_PIXEL_CTES = r"""meta AS (
          SELECT doc_id AS media_id,
                 ('0x' || substr(h, 1, 8))::BIGINT AS seed,
                 8 + ('0x' || substr(h, 9, 2))::BIGINT % 9 AS hh,
                 8 + ('0x' || substr(h, 11, 2))::BIGINT % 9 AS ww
          FROM (SELECT doc_id,
                       md5(CAST(doc_id AS VARCHAR) || ':'
                           || substr(coalesce(text,''), 1, 64)) AS h
                FROM documents)
        ),
        init(media_id, i, mt) AS (
          SELECT media_id, 0, seed FROM meta
          UNION ALL
          SELECT media_id, i + 1,
                 (1812433253 * xor(mt, mt // 1073741824) + i + 1) % 4294967296
          FROM init WHERE i < 623
        ),
        tw AS (
          SELECT a.media_id, a.i,
                 xor(xor(c.mt, ((a.mt // 2147483648) * 2147483648
                                + (b.mt % 2147483648)) // 2),
                     CASE WHEN ((a.mt // 2147483648) * 2147483648
                                + (b.mt % 2147483648)) % 2 = 1
                          THEN 2567483615 ELSE 0 END) AS mt
          FROM init a
          JOIN init b ON b.media_id = a.media_id AND b.i = a.i + 1
          JOIN init c ON c.media_id = a.media_id AND c.i = a.i + 397
          WHERE a.i < 192
        ),
        tp AS (
          SELECT media_id, i, xor(y3, y3 // 262144) AS y FROM (
            SELECT media_id, i,
                   xor(y2, (y2 * 32768) & 4022730752) AS y3 FROM (
              SELECT media_id, i,
                     xor(y1, (y1 * 128) & 2636928640) AS y2 FROM (
                SELECT media_id, i, xor(mt, mt // 2048) AS y1 FROM tw)))
        ),
        pix AS (
          SELECT t2.media_id, t2.i * 4 + b.j AS t,
                 CAST((t2.y // CASE b.j WHEN 0 THEN 1 WHEN 1 THEN 256
                                        WHEN 2 THEN 65536
                                        ELSE 16777216 END) % 256
                      AS BIGINT) AS v
          FROM tp t2, (SELECT unnest(range(4)) AS j) b
        )"""


def _phash_dedup_oracle_sql() -> str:
    """Twin of q_media_phash_dedup — the dHash chain over the MT19937
    pixel stream (see :func:`_mt19937_png_hist_oracle_sql` for the
    generator): integer grayscale means, 8x9 area pooling with
    zero-filled empty cells, horizontal-neighbor bits packed
    big-endian, planted editions (every 5th image, pixel-identical)
    carrying the SAME signature at id + 1e6, then the exact 4x16-band
    Hamming engine of the simhash twin. PNG re-encode/decode
    regressions change the decoded pixels and break the hash."""
    return f"""
        WITH RECURSIVE {_MT_PIXEL_CTES},
        gray AS (
          SELECT p.media_id, (p.t // 3) // m.ww AS y,
                 (p.t // 3) % m.ww AS x,
                 CAST(sum(p.v) // 3 AS BIGINT) AS g
          FROM pix p JOIN meta m USING (media_id)
          WHERE p.t < m.hh * m.ww * 3
          GROUP BY p.media_id, (p.t // 3) // m.ww, (p.t // 3) % m.ww
        ),
        pooled AS (
          SELECT g.media_id,
                 least((g.y * 8) // m.hh, 7) AS r,
                 least((g.x * 9) // m.ww, 8) AS c,
                 CAST(sum(g.g) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM gray g JOIN meta m USING (media_id)
          GROUP BY g.media_id, least((g.y * 8) // m.hh, 7),
                   least((g.x * 9) // m.ww, 8)
        ),
        cells AS (
          SELECT m.media_id, gr.r, gc.c,
                 CAST(coalesce(p.s // greatest(p.n, 1), 0) AS BIGINT) AS val
          FROM meta m
          CROSS JOIN (SELECT unnest(range(8)) AS r) gr
          CROSS JOIN (SELECT unnest(range(9)) AS c) gc
          LEFT JOIN pooled p
            ON p.media_id = m.media_id AND p.r = gr.r AND p.c = gc.c
        ),
        base_sigs AS (
          SELECT a.media_id,
                 CAST(CAST(sum(CASE WHEN b.val > a.val
                   THEN CAST(1::UBIGINT << CAST(63 - (a.r * 8 + a.c)
                                                AS INTEGER) AS HUGEINT)
                   ELSE 0 END) AS HUGEINT) AS UBIGINT) AS sig
          FROM cells a JOIN cells b
            ON b.media_id = a.media_id AND b.r = a.r AND b.c = a.c + 1
          WHERE a.c < 8
          GROUP BY a.media_id
        ),
        sigs AS (
          SELECT media_id, sig FROM base_sigs
          UNION ALL
          SELECT media_id + 1000000, sig FROM base_sigs
          WHERE media_id % 5 = 0
        ),
        bands AS (
          SELECT media_id, sig,
                 (((sig >> (16 * bi.b)) & 65535::UBIGINT)::BIGINT
                  | (bi.b << 16)) AS band_key
          FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bi
        ),
        ranked AS (
          SELECT band_key, media_id, sig,
                 row_number() OVER (PARTITION BY band_key
                                    ORDER BY media_id) - 1 AS r
          FROM bands
        ),
        cand AS (
          SELECT a.media_id AS id_a, b.media_id AS id_b,
                 a.sig AS sig_a, b.sig AS sig_b,
                 row_number() OVER (PARTITION BY a.band_key
                                    ORDER BY a.r, b.r) AS rn
          FROM ranked a JOIN ranked b
            ON a.band_key = b.band_key AND a.r < b.r
        ),
        verified AS (
          SELECT DISTINCT id_a, id_b FROM cand
          WHERE rn <= 200 AND bit_count(xor(sig_a, sig_b)) <= 3
        ),
        sym AS (
          SELECT id_a AS u, id_b AS v FROM verified
          UNION SELECT id_b, id_a FROM verified
        ),
        reach AS (
          WITH RECURSIVE rr(a, b) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM sym)
            UNION
            SELECT rr.a, s.v FROM rr JOIN sym s ON rr.b = s.u
          ) SELECT * FROM rr
        )
        SELECT a AS media_id, CAST(min(b) AS BIGINT) AS dup_of
        FROM reach GROUP BY a HAVING min(b) <> a
    """


def _media_features_oracle_sql() -> str:
    """Twin of q_media_features — MD5 REPRODUCED IN SQL: the fake
    payload is the 16-byte inner digest repeated 64x, whose md5 DuckDB
    cannot take directly (BLOBs aren't VARCHAR), so the twin runs the
    RFC-1321 compression itself: all 16 content blocks share one
    4-word message pattern (the repeat makes ``M[g] = dw[g % 4]``),
    plus the 0x80/length padding block — 17 blocks x 64 steps as ONE
    recursive CTE, with K[i] = trunc(abs(sin(i+1)) * 2^32), the
    CASE-table shifts, and rotl as multiply/divide mod 2^32. The fake
    decoder's (h, w) are the first two bytes of the final state + 128."""
    return r"""
        WITH RECURSIVE dw AS (
          SELECT media_id, j,
                 ('0x' || substr(h, 8*j + 7, 2))::BIGINT * 16777216
                 + ('0x' || substr(h, 8*j + 5, 2))::BIGINT * 65536
                 + ('0x' || substr(h, 8*j + 3, 2))::BIGINT * 256
                 + ('0x' || substr(h, 8*j + 1, 2))::BIGINT AS w
          FROM (SELECT doc_id AS media_id,
                       md5(CAST(doc_id AS VARCHAR) || ':'
                           || substr(coalesce(text,''), 1, 64)) AS h
                FROM documents),
               (SELECT unnest(range(4)) AS j)
        ),
        md5s(media_id, step, A, B, C, D, sa, sb, sc, sd) AS (
          SELECT media_id, 0,
                 1732584193::BIGINT, 4023233417::BIGINT,
                 2562383102::BIGINT, 271733878::BIGINT,
                 1732584193::BIGINT, 4023233417::BIGINT,
                 2562383102::BIGINT, 271733878::BIGINT
          FROM (SELECT DISTINCT media_id FROM dw)
          UNION ALL
          SELECT media_id, step + 1,
                 CASE WHEN (step + 1) % 64 = 0
                      THEN (sa + D) % 4294967296 ELSE D END,
                 CASE WHEN (step + 1) % 64 = 0
                      THEN (sb + nB) % 4294967296 ELSE nB END,
                 CASE WHEN (step + 1) % 64 = 0
                      THEN (sc + B) % 4294967296 ELSE B END,
                 CASE WHEN (step + 1) % 64 = 0
                      THEN (sd + C) % 4294967296 ELSE C END,
                 CASE WHEN (step + 1) % 64 = 0
                      THEN (sa + D) % 4294967296 ELSE sa END,
                 CASE WHEN (step + 1) % 64 = 0
                      THEN (sb + nB) % 4294967296 ELSE sb END,
                 CASE WHEN (step + 1) % 64 = 0
                      THEN (sc + B) % 4294967296 ELSE sc END,
                 CASE WHEN (step + 1) % 64 = 0
                      THEN (sd + C) % 4294967296 ELSE sd END
          FROM (
            SELECT media_id, step, A, B, C, D, sa, sb, sc, sd,
                   (B + ((fkm * CAST(1::UBIGINT << CAST(s AS INTEGER)
                                     AS BIGINT)) % 4294967296
                         + fkm // CAST(1::UBIGINT << CAST(32 - s AS INTEGER)
                                       AS BIGINT))) % 4294967296 AS nB
            FROM (
              SELECT *,
                     (CASE
                       WHEN i < 16 THEN (B & C) | ((4294967295 - B) & D)
                       WHEN i < 32 THEN (D & B) | ((4294967295 - D) & C)
                       WHEN i < 48 THEN xor(B, xor(C, D))
                       ELSE xor(C, B | (4294967295 - D))
                     END
                     + A
                     + CAST(trunc(abs(sin(CAST(i + 1 AS DOUBLE)))
                                  * 4294967296) AS BIGINT)
                     + m) % 4294967296 AS fkm,
                     CASE i // 16
                       WHEN 0 THEN CASE i % 4 WHEN 0 THEN 7 WHEN 1 THEN 12
                                              WHEN 2 THEN 17 ELSE 22 END
                       WHEN 1 THEN CASE i % 4 WHEN 0 THEN 5 WHEN 1 THEN 9
                                              WHEN 2 THEN 14 ELSE 20 END
                       WHEN 2 THEN CASE i % 4 WHEN 0 THEN 4 WHEN 1 THEN 11
                                              WHEN 2 THEN 16 ELSE 23 END
                       ELSE CASE i % 4 WHEN 0 THEN 6 WHEN 1 THEN 10
                                       WHEN 2 THEN 15 ELSE 21 END
                     END AS s
              FROM (
                SELECT ms.media_id, ms.step, ms.A, ms.B, ms.C, ms.D,
                       ms.sa, ms.sb, ms.sc, ms.sd,
                       ms.step % 64 AS i,
                       CASE WHEN ms.step // 64 < 16 THEN d2.w
                            ELSE CASE g WHEN 0 THEN 128
                                        WHEN 14 THEN 8192 ELSE 0 END
                       END AS m
                FROM (
                  SELECT *, CASE (step % 64) // 16
                              WHEN 0 THEN step % 64
                              WHEN 1 THEN (5 * (step % 64) + 1) % 16
                              WHEN 2 THEN (3 * (step % 64) + 5) % 16
                              ELSE (7 * (step % 64)) % 16
                            END AS g
                  FROM md5s) ms
                LEFT JOIN dw d2
                  ON d2.media_id = ms.media_id AND d2.j = ms.g % 4)
            )
          )
          WHERE step < 1088
        )
        SELECT media_id,
               CAST(128 + (sa % 256) AS BIGINT) AS height,
               CAST(128 + ((sa // 256) % 256) AS BIGINT) AS width
        FROM md5s WHERE step = 1088
    """


def _densest_subgraph_oracle_sql(rounds: int = 12, eps_milli: int = 100) -> str:
    """Twin of q_link_densest_subgraph — the batched greedy peel
    unrolls (empirically 7 rounds to empty at the fixture scale;
    ``rounds`` stages with permanent-termination no-ops cover it, the
    same doctrine as the BPE twin), each round one degree count + one
    semi-join filter; the best intermediate snapshot is selected by
    EXACT cross-multiplied density (earliest round wins ties, as the
    stage's strict-improvement compare does)."""
    head = f"""
        WITH e0 AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM ({_LINK_EDGES_SQL}) WHERE src <> dst
        )"""
    steps = []
    for r in range(rounds):
        steps.append(f""",
        deg{r} AS (
          SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r})
          GROUP BY node
        ),
        mn{r} AS (
          SELECT (SELECT count(*) FROM e{r}) AS m,
                 (SELECT count(*) FROM deg{r}) AS n
        ),
        e{r + 1} AS MATERIALIZED (
          SELECT e.a, e.b FROM e{r} e
          JOIN deg{r} da ON da.node = e.a
          JOIN deg{r} db ON db.node = e.b
          CROSS JOIN mn{r} s
          WHERE da.d * s.n * 1000 > 2 * (1000 + {eps_milli}) * s.m
            AND db.d * s.n * 1000 > 2 * (1000 + {eps_milli}) * s.m
        )""")
    rounds_union = "\n          UNION ALL ".join(
        f"SELECT {r} AS r, m, n FROM mn{r}" for r in range(rounds)
    )
    nodes_union = "\n          UNION ALL ".join(
        f"SELECT {r} AS r, node FROM deg{r}" for r in range(rounds)
    )
    tail = f""",
        hist AS (
          SELECT r, CAST(m AS BIGINT) AS m, CAST(n AS BIGINT) AS n FROM (
          {rounds_union}) WHERE m > 0
        ),
        best AS (
          SELECT r FROM hist t
          WHERE NOT EXISTS (SELECT 1 FROM hist o
                            WHERE o.m * t.n > t.m * o.n)
          ORDER BY r LIMIT 1
        )
        SELECT node FROM (
          {nodes_union}) nn
        WHERE nn.r = (SELECT r FROM best)
    """
    return head + "".join(steps) + tail


def _nrm_sql(col: str) -> str:
    """SQL for ``normalize_node_id``: strip, lower, spaces/hyphens to
    underscores."""
    return f"replace(replace(lower(trim({col})), ' ', '_'), '-', '_')"


def _scenario_eval_oracle_sql() -> str:
    """Twin of q_scenario_eval — the whole §3.3 consumer contract in
    SQL: blueprint = top-8 hub rules over the kg_edges twin,
    scenarios = per-chunk distinct normalized entities over the raw
    twin (scenario_id = portable md5 of the chunk key), requirement
    matching by substring containment, and the integer milli-point
    blend (7000*sat//total + 3000*spec//max_spec + 1500 full-match
    bonus) with specificity = roundbankers(1000/sharing)."""
    return f"""
        WITH rawt_s AS MATERIALIZED ({_kg_triples_raw_oracle_sql()}),
        e AS MATERIALIZED ({_kg_edges_oracle_sql()}),
        se_de AS MATERIALIZED (SELECT DISTINCT src, dst FROM e),
        se_hub AS (
          SELECT src FROM (
            SELECT src, count(*) AS deg FROM se_de GROUP BY src
            ORDER BY deg DESC, src ASC LIMIT 8)
        ),
        se_blueprint AS (
          SELECT model, requirement FROM (
            SELECT src AS model, dst AS requirement,
                   row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
            FROM se_de JOIN se_hub USING (src)) WHERE rn <= 20
        ),
        se_models AS (
          SELECT model, row_number() OVER (ORDER BY model) AS mi,
                 count(*) OVER () AS nm
          FROM (SELECT DISTINCT model FROM se_blueprint)
        ),
        se_wts AS (
          SELECT signal, w_milli FROM (
            SELECT {_nrm_sql('model')} AS signal,
                   CAST(2000 - (mi - 1) * 500 AS BIGINT) AS w_milli, mi,
                   row_number() OVER (PARTITION BY {_nrm_sql('model')}
                                      ORDER BY mi DESC) AS rn
            FROM se_models WHERE mi <= 3) WHERE rn = 1
        ),
        se_reds AS (
          SELECT {_nrm_sql('model')} AS signal
          FROM se_models WHERE nm > 3 AND mi = nm
        ),
        se_nr AS (
          SELECT DISTINCT {_nrm_sql('model')} AS model,
                 lower(requirement) AS req_lower
          FROM se_blueprint
        ),
        se_spec AS (
          SELECT model, req_lower,
                 CAST(roundbankers(
                   1000.0 / count(*) OVER (PARTITION BY req_lower), 0)
                   AS BIGINT) AS spec_milli
          FROM se_nr
        ),
        se_totals AS (
          SELECT model, CAST(count(*) AS BIGINT) AS total,
                 CAST(sum(spec_milli) AS BIGINT) AS max_spec
          FROM se_spec GROUP BY model
        ),
        se_sc AS MATERIALIZED (
          SELECT DISTINCT key, signal FROM (
            SELECT url || '#' || CAST(chunk_id AS VARCHAR) AS key,
                   {_nrm_sql('subject')} AS signal FROM rawt_s
            UNION ALL
            SELECT url || '#' || CAST(chunk_id AS VARCHAR),
                   {_nrm_sql('object')} FROM rawt_s)
        ),
        se_sid AS (
          SELECT key,
                 CAST(('0x' || substr(md5(key), 1, 16))::UBIGINT
                      % 9223372036854775808 AS BIGINT) AS scenario_id
          FROM (SELECT DISTINCT key FROM se_sc)
        ),
        se_red AS (
          SELECT s.key, CAST(count(*) AS BIGINT) AS red
          FROM se_sc s JOIN se_reds r ON r.signal = s.signal GROUP BY s.key
        ),
        se_conf AS (
          SELECT s.key, CAST(sum(w.w_milli) AS BIGINT) AS conf
          FROM se_sc s JOIN se_wts w ON w.signal = s.signal GROUP BY s.key
        ),
        se_match AS (
          SELECT DISTINCT s.key, sp.model, sp.req_lower, sp.spec_milli
          FROM se_sc s JOIN se_spec sp
            ON strpos(sp.req_lower, s.signal) > 0
            OR strpos(sp.req_lower, replace(s.signal, '_', ' ')) > 0
        ),
        se_per AS (
          SELECT key, model, CAST(count(*) AS BIGINT) AS sat,
                 CAST(sum(spec_milli) AS BIGINT) AS spec_sum
          FROM se_match GROUP BY key, model
        ),
        se_best AS (
          SELECT key, model, score, sat, miss FROM (
            SELECT p.key, p.model, p.sat, t.total - p.sat AS miss,
                   CAST((7000 * p.sat) // t.total
                        + (3000 * p.spec_sum) // greatest(t.max_spec, 1)
                        + CASE WHEN p.sat = t.total THEN 1500 ELSE 0 END
                        AS BIGINT) AS score,
                   row_number() OVER (PARTITION BY p.key
                     ORDER BY CAST((7000 * p.sat) // t.total
                        + (3000 * p.spec_sum) // greatest(t.max_spec, 1)
                        + CASE WHEN p.sat = t.total THEN 1500 ELSE 0 END
                        AS BIGINT) DESC, p.model ASC) AS rn
            FROM se_per p JOIN se_totals t USING (model)) WHERE rn = 1
        )
        SELECT st.scenario_id,
               coalesce(b.model, '') AS recommendation,
               CAST(coalesce(b.score, 0) AS BIGINT) AS model_score_milli,
               CAST(coalesce(c.conf, 0) AS BIGINT) AS confluence_milli,
               CAST(coalesce(b.sat, 0) AS BIGINT) AS n_satisfied,
               CAST(coalesce(b.miss, 0) AS BIGINT) AS n_missing,
               CAST(coalesce(r.red, 0) AS BIGINT) AS n_red_flags,
               (coalesce(r.red, 0) = 0 AND coalesce(b.model, '') <> ''
                AND coalesce(c.conf, 0) + coalesce(b.score, 0) >= 5000)
                 AS go_no_go
        FROM se_sid st
        LEFT JOIN se_best b USING (key)
        LEFT JOIN se_conf c USING (key)
        LEFT JOIN se_red r USING (key)
    """


# Shared CTE body of the ideal-Jaccard minhash twin (see the
# "minhash_dedup" entry below for the fixture facts it rests on):
# word-5-gram sets, integer threshold 5*ni >= 4*union, recursive
# min-label components, `rep` = (id, dup_of=component min).
_MINHASH_CTES = r"""words AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')), '\w+') AS ws
          FROM documents
        ),
        grams AS (
          SELECT DISTINCT doc_id,
                 array_to_string(ws[i.i : i.i + 4], ' ') AS g
          FROM words,
               LATERAL (SELECT unnest(generate_series(
                   1, greatest(1, len(ws) - 4))) AS i) i
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS ni
          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        sim AS (
          SELECT ida, idb FROM inter
          JOIN sizes sa ON sa.doc_id = ida
          JOIN sizes sb ON sb.doc_id = idb
          WHERE 5 * ni >= 4 * (sa.n + sb.n - ni)
        ),
        und AS (SELECT ida, idb FROM sim UNION SELECT idb, ida FROM sim),
        reach AS (
          SELECT ida AS id, ida AS r FROM und
          UNION
          SELECT reach.id, u.idb FROM reach JOIN und u ON u.ida = reach.r
        ),
        rep AS (SELECT id, min(r) AS dup_of FROM reach GROUP BY id)"""


def _mulmod64(a: str, b: str) -> str:
    """SQL for ``(a * b) mod 2**64`` with a 32-bit split multiply —
    a single HUGEINT (INT128) product of two 64-bit values would
    overflow, so the low/high halves are multiplied separately."""
    return (
        f"((({a} % 4294967296) * {b} + "
        f"((({a} // 4294967296) * ({b} % 4294967296)) % 4294967296)"
        f" * 4294967296) % 18446744073709551616)"
    )


# splitmix64-style finalizer of stages/bloom._mix over rep_id XOR
# seed-mix (seed=42 -> 17661420568835545970), bit-exact in SQL:
# UBIGINT xor + floor-division shifts + split-multiply mod 2**64.
_LEAKAGE_MIX_SQL = f""",
        dmap AS (SELECT id, dup_of FROM rep WHERE dup_of <> id),
        rep_all AS (
          SELECT d.doc_id,
                 CAST(coalesce(m.dup_of, d.doc_id) AS BIGINT) AS rep_id
          FROM documents d LEFT JOIN dmap m ON m.id = d.doc_id
        ),
        mx0 AS (
          SELECT doc_id, rep_id,
                 xor(CAST(rep_id AS UBIGINT),
                     CAST(17661420568835545970 AS UBIGINT)) AS x0
          FROM rep_all
        ),
        mx1 AS (SELECT doc_id, rep_id,
          {_mulmod64("CAST(xor(x0, x0 // 1073741824) AS HUGEINT)",
                     "13787848793156543929")} AS z1 FROM mx0),
        mx2 AS (SELECT doc_id, rep_id,
          {_mulmod64("CAST(xor(CAST(z1 AS UBIGINT), CAST(z1 // 134217728 AS UBIGINT)) AS HUGEINT)",
                     "10723151780598845931")} AS z2 FROM mx1),
        mx3 AS (SELECT doc_id, rep_id,
          CAST(xor(CAST(z2 AS UBIGINT), CAST(z2 // 2147483648 AS UBIGINT))
               AS HUGEINT) AS h FROM mx2)
        SELECT doc_id, rep_id,
               CASE WHEN h % 1000 < 900 THEN 'train' ELSE 'valid' END AS split
        FROM mx3"""


def _splitmix_sql(src: str, c1: str, c2: str) -> str:
    """SQL chain for ``bloom._mix(src, c1, c2)`` — UBIGINT xor,
    shift-by-floor-division, split-multiply mod 2**64; ``src`` is a
    HUGEINT expression in [0, 2**64)."""
    z1 = _mulmod64(
        f"CAST(xor(CAST(({src}) AS UBIGINT), "
        f"CAST(({src}) // 1073741824 AS UBIGINT)) AS HUGEINT)", c1)
    z2 = _mulmod64(
        f"CAST(xor(CAST({z1} AS UBIGINT), "
        f"CAST({z1} // 134217728 AS UBIGINT)) AS HUGEINT)", c2)
    return (f"CAST(xor(CAST({z2} AS UBIGINT), "
            f"CAST({z2} // 2147483648 AS UBIGINT)) AS HUGEINT)")


def _span_corruption_oracle_sql() -> str:
    """T5 span-corruption twin — the WHOLE seeded generator in SQL:
    per-(doc, position) splitmix64 stream (same wraparound arithmetic
    as the leakage twin), span starts below the integer threshold
    int(0.05 * 2**64), lengths 1 + mix2 % 5, interval union via a
    running max of span ends, run numbering by a filtered running
    count, and the sentinel-interleaved input/target strings via
    ORDER BY string_agg. Matches ``generate_span_corruption``
    byte-for-byte (seed=42; null text follows pandas astype(str) ->
    'nan'). Verified value-identical at sf0.001 and sf0.01."""
    txt = "CASE WHEN text IS NULL THEN 'nan' ELSE text END"
    h = _splitmix_sql(
        "(xor(CAST(t.doc_id AS UBIGINT), CAST(17661420568835545970 AS UBIGINT))"
        "::HUGEINT + "
        + _mulmod64("CAST(t.i - 1 AS HUGEINT)", "11400714819323198485")
        + ") % 18446744073709551616",
        "13787848793156543929", "10723151780598845931")
    ln = _splitmix_sql("h", "18397679294719823053", "14181476777654086739")
    return rf"""
        WITH toks AS (
          SELECT doc_id, u.tok, u.i
          FROM documents,
               LATERAL (SELECT unnest(regexp_split_to_array(
                            trim({txt}), '\s+')) AS tok,
                        generate_subscripts(regexp_split_to_array(
                            trim({txt}), '\s+'), 1) AS i) u
          WHERE trim({txt}) <> ''
        ),
        nn AS (SELECT doc_id, max(i) AS n FROM toks GROUP BY doc_id),
        hh AS (
          SELECT t.doc_id AS doc_id, t.tok, t.i, nn.n, {h} AS h
          FROM toks t JOIN nn ON nn.doc_id = t.doc_id
        ),
        sp AS (
          SELECT doc_id, tok, i, n,
                 (h < 922337203685477504) AS is_start,
                 CAST(1 + ({ln} % 5) AS BIGINT) AS len
          FROM hh
        ),
        mk AS (
          SELECT doc_id, tok, i, n,
                 coalesce(max(CASE WHEN is_start THEN i + len END)
                     OVER (PARTITION BY doc_id ORDER BY i
                           ROWS UNBOUNDED PRECEDING), 0) > i AS masked
          FROM sp
        ),
        rn AS (
          SELECT doc_id, tok, i, n, masked,
                 masked AND NOT coalesce(
                     lag(masked) OVER (PARTITION BY doc_id ORDER BY i),
                     false) AS run_start
          FROM mk
        ),
        rk AS (
          SELECT doc_id, tok, i, n, masked, run_start,
                 count(*) FILTER (WHERE run_start)
                     OVER (PARTITION BY doc_id ORDER BY i
                           ROWS UNBOUNDED PRECEDING) - 1 AS k
          FROM rn
        ),
        agg AS (
          SELECT doc_id,
                 string_agg(CASE WHEN NOT masked THEN tok
                                 WHEN run_start THEN '<extra_id_' || k || '>'
                                 END, ' ' ORDER BY i) AS input_raw,
                 string_agg(CASE WHEN masked AND run_start
                                 THEN '<extra_id_' || k || '> ' || tok
                                 WHEN masked THEN tok END,
                            ' ' ORDER BY i) AS target_raw,
                 max(n) AS n_tokens,
                 CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_masked,
                 CAST(count(*) FILTER (WHERE run_start) AS BIGINT) AS n_runs
          FROM rk GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.input_raw, '') AS input,
               CASE WHEN a.target_raw IS NULL OR a.target_raw = ''
                    THEN '<extra_id_' || coalesce(a.n_runs, 0) || '>'
                    ELSE a.target_raw || ' <extra_id_' || a.n_runs || '>'
               END AS target,
               CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(a.n_masked, 0) AS BIGINT) AS n_masked
        FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """


_EMBED_DEDUP_ORACLE_SQL = """
        WITH RECURSIVE corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000, embedding FROM embeddings
          WHERE vec_id % 10 = 0
        ),
        pairs AS (
          SELECT a.vec_id AS ida, b.vec_id AS idb
          FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
        ),
        und AS (SELECT ida, idb FROM pairs UNION SELECT idb, ida FROM pairs),
        reach AS (
          SELECT ida AS id, ida AS r FROM und
          UNION
          SELECT reach.id, u.idb FROM reach JOIN und u ON u.ida = reach.r
        ),
        rep AS (SELECT id, min(r) AS dup_of FROM reach GROUP BY id)
        SELECT CAST(id AS BIGINT) AS vec_id, CAST(dup_of AS BIGINT) AS dup_of
        FROM rep WHERE dup_of <> id
    """


ORACLE_SQL: dict[str, str] = {
    "training_validation_qa": _validation_oracle_sql(),
    "kg_triples_raw": _kg_triples_raw_oracle_sql(),
    "kg_triples_std": _kg_triples_std_oracle_sql(),
    "kg_edges": _kg_edges_oracle_sql(),
    "kg_nodes": _kg_nodes_oracle_sql(),
    "relation_counts": f"""
        WITH e AS ({_kg_edges_oracle_sql()})
        SELECT predicate, CAST(count(*) AS BIGINT) AS n_edges
        FROM e GROUP BY predicate
    """,
    "approx_distinct_users": _hll_group_sql(
        "event_type", "CAST(user_id AS VARCHAR)", "events", 10
    ),
    "approx_users_per_type": _hll_group_sql(
        "event_type", "CAST(user_id AS VARCHAR)", "events", 12
    ),
    "part_soundex": f"""
        SELECT p_partkey, {_sdx('p_name')} AS soundex FROM part
    """,
    "doc_simhash": f"""
        WITH {_SIMHASH_SIG_SQL}
        SELECT doc_id, sig AS simhash64 FROM sigs
    """,
    "simhash_dedup": f"""
        WITH {_SIMHASH_SIG_SQL},
        bands AS (
          -- 4x16-bit band blocking: band_key = band value | band << 16
          SELECT doc_id, sig,
                 (((sig >> (16 * bi.b)) & 65535::UBIGINT)::BIGINT
                  | (bi.b << 16)) AS band_key
          FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b) bi
        ),
        ranked AS (
          SELECT band_key, doc_id, sig,
                 row_number() OVER (PARTITION BY band_key ORDER BY doc_id) - 1
                   AS r
          FROM bands
        ),
        cand AS (
          -- row-major upper-triangle pair order, capped at 200 per
          -- band BEFORE the Hamming verify (dedup.py pair cap)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.sig AS sig_a, b.sig AS sig_b,
                 row_number() OVER (PARTITION BY a.band_key
                                    ORDER BY a.r, b.r) AS rn
          FROM ranked a JOIN ranked b
            ON a.band_key = b.band_key AND a.r < b.r
        ),
        verified AS (
          SELECT DISTINCT id_a, id_b FROM cand
          WHERE rn <= 200 AND bit_count(xor(sig_a, sig_b)) <= 3
        ),
        sym AS (
          SELECT id_a AS u, id_b AS v FROM verified
          UNION SELECT id_b, id_a FROM verified
        ),
        cnodes AS (SELECT DISTINCT u AS id FROM sym),
        reach AS (
          WITH RECURSIVE r(a, b) AS (
            SELECT id, id FROM cnodes
            UNION
            SELECT r.a, s.v FROM r JOIN sym s ON r.b = s.u
          ) SELECT * FROM r
        )
        SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS dup_of
        FROM reach GROUP BY a HAVING min(b) <> a
    """,
    "link_domain_modularity": f"""
        WITH e AS MATERIALIZED ({_LINK_EDGES_SQL}),
        lbl AS MATERIALIZED (
          SELECT node, regexp_extract(node, 'https?://([^/]+)/', 1) AS c
          FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)
        ),
        tagged AS (
          SELECT ls.c AS c_src, ld.c AS c_dst
          FROM e JOIN lbl ls ON e.src = ls.node
                 JOIN lbl ld ON e.dst = ld.node
        ),
        m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        per AS (
          SELECT c, CAST(sum(deg) AS BIGINT) AS deg,
                 CAST(sum(within) AS BIGINT) AS within
          FROM (
            SELECT c_src AS c, 1 AS deg, 0 AS within FROM tagged
            UNION ALL SELECT c_dst, 1, 0 FROM tagged
            UNION ALL SELECT c_src, 0,
                             CASE WHEN c_src = c_dst THEN 1 ELSE 0 END
            FROM tagged
          ) GROUP BY c
        )
        SELECT m.m AS n_edges,
               CAST(count(*) AS BIGINT) AS n_communities,
               CAST(sum(4 * m.m * p.within - p.deg * p.deg) AS BIGINT) AS q_num,
               CAST(4 * m.m * m.m AS BIGINT) AS q_den
        FROM per p, m GROUP BY m.m
    """,
    "events_markov_eval": """
        WITH s AS MATERIALIZED (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) - 1 AS pos,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM events
        ),
        tr AS MATERIALIZED (
          SELECT s.event_type AS prev, t.event_type AS nxt,
                 CASE WHEN 5 * t.pos <= 4 * s.n THEN 1 ELSE 0 END AS is_train
          FROM s JOIN s t ON s.user_id = t.user_id AND t.pos = s.pos + 1
        ),
        counts AS (
          SELECT prev, nxt, count(*) AS n FROM tr WHERE is_train = 1
          GROUP BY 1, 2
        ),
        md AS (
          SELECT prev, nxt FROM (
            SELECT prev, nxt,
                   row_number() OVER (PARTITION BY prev
                                      ORDER BY n DESC, nxt ASC) AS rn
            FROM counts) WHERE rn = 1
        ),
        test AS (
          SELECT tr.nxt, m.nxt AS pred
          FROM tr LEFT JOIN md m ON tr.prev = m.prev
          WHERE tr.is_train = 0
        )
        SELECT CAST(count(*) AS BIGINT) AS n_test,
               CAST(coalesce(sum(CASE WHEN pred = nxt THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_correct,
               CAST(coalesce(sum(CASE WHEN pred IS NULL THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_unpredicted,
               CAST(CASE WHEN count(*) > 0
                    THEN coalesce(sum(CASE WHEN pred = nxt THEN 1 ELSE 0 END), 0)
                         * 1000 // count(*)
                    ELSE 0 END AS BIGINT) AS acc_milli
        FROM test
    """,
    "link_motif_census": f"""
        WITH raw AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM ({_LINK_EDGES_SQL}) WHERE src <> dst
        ),
        ow AS MATERIALIZED (
          SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                 max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS dir
          FROM raw GROUP BY 1, 2 HAVING count(*) = 1
        ),
        tri AS (
          SELECT p1.dir AS d_ab, p2.dir AS d_ac, p3.dir AS d_bc
          FROM ow p1
          JOIN ow p2 ON p1.a = p2.a AND p2.b > p1.b
          JOIN ow p3 ON p3.a = p1.b AND p3.b = p2.b
        ),
        cls AS (
          SELECT CASE WHEN d_ab + d_ac = 1
                       AND (1 - d_ab) + d_bc = 1
                       AND (1 - d_ac) + (1 - d_bc) = 1
                 THEN 1 ELSE 0 END AS cyc
          FROM tri
        )
        SELECT CAST(count(*) AS BIGINT) AS n_triangles,
               CAST(coalesce(sum(cyc), 0) AS BIGINT) AS n_cyclic,
               CAST(count(*) - coalesce(sum(cyc), 0) AS BIGINT) AS n_transitive
        FROM cls
    """,
    "lang_confusion": f"""
        SELECT {_LANG_PRED_CASE} AS lang_pred, lang AS lang_true,
               CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    """,
    "lang_kappa": f"""
        WITH conf AS MATERIALIZED (
          SELECT {_LANG_PRED_CASE} AS p, lang AS t,
                 CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY 1, 2
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN p = t THEN n ELSE 0 END) AS BIGINT)
                         AS agree
                FROM conf),
        rows_m AS (SELECT p AS l, CAST(sum(n) AS BIGINT) AS r FROM conf GROUP BY p),
        cols_m AS (SELECT t AS l, CAST(sum(n) AS BIGINT) AS c FROM conf GROUP BY t),
        marg AS (
          SELECT CAST(sum(coalesce(r.r, 0) * coalesce(c.c, 0)) AS BIGINT) AS m
          FROM (SELECT l FROM rows_m UNION SELECT l FROM cols_m) u
          LEFT JOIN rows_m r ON u.l = r.l
          LEFT JOIN cols_m c ON u.l = c.l
        )
        SELECT t.n AS n_total, t.agree AS n_agree,
               CAST(t.n * t.agree - m.m AS BIGINT) AS kappa_num,
               CAST(t.n * t.n - m.m AS BIGINT) AS kappa_den
        FROM tot t, marg m
    """,
    "doc_originality": """
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '\\w+') AS ws
          FROM documents
        ),
        grams AS (
          SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
          FROM toks, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
          WHERE len(ws) >= 3
          UNION
          SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
          FROM toks WHERE len(ws) > 0 AND len(ws) < 3
        ),
        firsts AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
                  FROM grams GROUP BY doc_id)
        SELECT s.doc_id, s.n_grams,
               CAST(coalesce(f.n_first, 0) AS BIGINT) AS n_first_seen,
               CAST(coalesce(f.n_first, 0) * 1000 // s.n_grams AS BIGINT)
                 AS originality_milli
        FROM sizes s
        LEFT JOIN (
          SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_first
          FROM grams g JOIN firsts fs ON g.g = fs.g
          WHERE g.doc_id = fs.first_doc
          GROUP BY g.doc_id
        ) f ON s.doc_id = f.doc_id
    """,
    "link_reciprocity": f"""
        WITH e AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM ({_LINK_EDGES_SQL})
          WHERE src <> dst
        ),
        r AS (
          SELECT count(*) AS n_edges,
                 sum(CASE WHEN EXISTS (SELECT 1 FROM e x
                                       WHERE x.src = e.dst AND x.dst = e.src)
                     THEN 1 ELSE 0 END) AS n_rec
          FROM e
        )
        SELECT CAST(n_edges AS BIGINT) AS n_edges,
               CAST(n_rec AS BIGINT) AS n_reciprocal,
               CAST(CASE WHEN n_edges > 0 THEN n_rec * 1000 // n_edges
                         ELSE 0 END AS BIGINT) AS reciprocity_milli
        FROM r
    """,
    "link_bowtie": f"""
        WITH RECURSIVE e AS MATERIALIZED ({_LINK_EDGES_SQL}),
        outd AS MATERIALIZED (
          SELECT src AS node, CAST(count(*) AS BIGINT) AS od
          FROM e GROUP BY src
        ),
        ind AS MATERIALIZED (
          SELECT dst AS node, CAST(count(*) AS BIGINT) AS idg
          FROM e GROUP BY dst
        ),
        pv AS MATERIALIZED (
          SELECT n.node
          FROM (SELECT node FROM outd UNION SELECT node FROM ind) n
          LEFT JOIN outd o ON n.node = o.node
          LEFT JOIN ind i ON n.node = i.node
          ORDER BY least(coalesce(o.od, 0), coalesce(i.idg, 0)) DESC,
                   n.node ASC
          LIMIT 1
        ),
        fwd(t) AS (
          SELECT node FROM pv
          UNION
          SELECT e.dst FROM fwd JOIN e ON e.src = fwd.t
        ),
        bwd(t) AS (
          SELECT node FROM pv
          UNION
          SELECT e.src FROM bwd JOIN e ON e.dst = bwd.t
        )
        SELECT u.node,
               CASE WHEN f.t IS NOT NULL AND b.t IS NOT NULL THEN 'core'
                    WHEN f.t IS NOT NULL THEN 'out'
                    WHEN b.t IS NOT NULL THEN 'in'
                    ELSE 'other' END AS region
        FROM (SELECT node FROM outd UNION SELECT node FROM ind) u
        LEFT JOIN fwd f ON u.node = f.t
        LEFT JOIN bwd b ON u.node = b.t
    """,
    "events_twap": """
        WITH s AS (
          SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tus,
                 CAST(round(value * 1000) AS BIGINT) AS vm, event_id
          FROM events
        ),
        d AS (
          SELECT user_id, vm,
                 lead(tus) OVER (PARTITION BY user_id
                                 ORDER BY tus, event_id) - tus AS dt
          FROM s
        )
        SELECT user_id,
               CAST(count(dt) AS BIGINT) AS n_intervals,
               CAST(sum(dt) AS BIGINT) AS total_us,
               CAST(sum(vm * dt) // sum(dt) AS BIGINT) AS twap_milli
        FROM d WHERE dt IS NOT NULL
        GROUP BY user_id
        HAVING sum(dt) > 0
    """,
    "orders_t_closeness": """
        WITH g AS MATERIALIZED (
          SELECT CAST(o_custkey AS VARCHAR) AS grp, o_orderpriority AS sv,
                 CAST(count(*) AS BIGINT) AS n_gc
          FROM orders GROUP BY 1, 2
        ),
        sz AS (SELECT grp, CAST(sum(n_gc) AS BIGINT) AS n_g FROM g GROUP BY grp),
        gl AS (SELECT sv, CAST(sum(n_gc) AS BIGINT) AS n_c FROM g GROUP BY sv),
        tot AS (SELECT CAST(sum(n_c) AS BIGINT) AS n FROM gl),
        terms AS (
          SELECT s.grp, s.n_g,
                 CAST(sum(abs(coalesce(x.n_gc, 0) * t.n - gl.n_c * s.n_g))
                      AS BIGINT) AS sdist
          FROM sz s CROSS JOIN gl CROSS JOIN tot t
          LEFT JOIN g x ON x.grp = s.grp AND x.sv = gl.sv
          GROUP BY s.grp, s.n_g
        )
        SELECT terms.grp AS o_custkey,
               CAST(terms.n_g AS BIGINT) AS n_rows,
               CAST(500 * terms.sdist // (terms.n_g * t.n) AS BIGINT)
                 AS tclose_milli,
               (500 * terms.sdist // (terms.n_g * t.n)) <= 300 AS t_ok
        FROM terms, tot t
    """,
    "returned_item_customers": """
        SELECT c_custkey, c_name,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_e4,
               CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= DATE '1997-01-01'
          AND o_orderdate <  DATE '1997-07-01'
        GROUP BY c_custkey, c_name, c_acctbal
        ORDER BY revenue_e4 DESC, c_custkey ASC
        LIMIT 20
    """,
    "top_supplier_revenue": """
        WITH r AS (
          SELECT l_suppkey AS s_suppkey,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS BIGINT) AS revenue_e4
          FROM lineitem
          WHERE l_shipdate >= DATE '1997-01-01'
            AND l_shipdate <  DATE '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, revenue_e4 FROM r
        WHERE revenue_e4 = (SELECT max(revenue_e4) FROM r)
    """,
    "source_budget_quotas": _WATERFILL_THR_SQL + """
        SELECT c.source, c.n AS n_docs,
               CAST(least(c.n, thr.T) AS BIGINT) AS quota
        FROM c, thr
    """,
    "doc_systematic_sample": """
        SELECT doc_id FROM (
          SELECT doc_id,
                 row_number() OVER (ORDER BY md5(coalesce(text, '')),
                                    doc_id) - 1 AS pos
          FROM documents)
        WHERE pos % 20 = 0
    """,
    "doc_budgeted_sample": _WATERFILL_THR_SQL + """
        SELECT source, doc_id FROM (
          SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents), thr
        WHERE rn <= thr.T
    """,
    "link_wl_classes": _LINK_WL_ORACLE_SQL,
    "link_label_spread": _LINK_SPREAD_ORACLE_SQL,
    "link_feature_smooth": f"""
        WITH e AS MATERIALIZED ({_LINK_EDGES_SQL}),
        und AS MATERIALIZED (
          SELECT src AS node, dst AS nbr FROM e
          UNION ALL
          SELECT dst AS node, src AS nbr FROM e
        ),
        fsrc AS MATERIALIZED (
          SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS node,
                 CAST(n_chars AS BIGINT) AS f
          FROM documents
        ),
        deg AS MATERIALIZED (
          SELECT node, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY node
        ),
        f0 AS MATERIALIZED (
          SELECT u.node, CAST(coalesce(fs.f, 0) AS BIGINT) AS f
          FROM (SELECT node FROM und UNION SELECT node FROM fsrc) u
          LEFT JOIN fsrc fs ON u.node = fs.node
        ),
        {_FS_ROUND_SQL.format(r=1, p=0)},
        {_FS_ROUND_SQL.format(r=2, p=1)}
        SELECT node, f AS feat FROM f2
    """,
    "events_window_dedup": """
        SELECT event_id,
               CAST(CASE WHEN prev_ts IS NOT NULL
                          AND ts_us - prev_ts <= 3600000000
                     THEN 1 ELSE 0 END AS BIGINT) AS is_dup
        FROM (
          SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                 lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id) AS prev_ts
          FROM events)
    """,
    "doc_hrw_stability": """
        WITH zs AS MATERIALIZED (
          SELECT doc_id, CAST(t.s AS BIGINT) AS s,
                 ((doc_id % 2147483647) * 48271
                  + (CAST(t.s AS BIGINT) + 1) * 1291394886) % 2147483647 AS z
          FROM documents, UNNEST(generate_series(0, 7)) AS t(s)
        ),
        ranks AS MATERIALIZED (
          SELECT doc_id, s, (((z * z) % 2147483647) * z) % 2147483647 AS r
          FROM zs
        ),
        before AS (
          SELECT doc_id, s AS shard FROM (
            SELECT doc_id, s,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY r DESC, s ASC) AS rn
            FROM ranks WHERE s < 7) WHERE rn = 1
        ),
        after AS (
          SELECT doc_id, s AS shard FROM (
            SELECT doc_id, s,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY r DESC, s ASC) AS rn
            FROM ranks) WHERE rn = 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN b.shard <> a.shard THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_moved,
               CAST(sum(CASE WHEN b.shard <> a.shard THEN 1 ELSE 0 END) * 1000
                    // count(*) AS BIGINT) AS moved_permille
        FROM before b JOIN after a USING (doc_id)
    """,
    "supply_neighbor_sample": """
        WITH e AS MATERIALIZED (
          SELECT DISTINCT CAST(l_suppkey * 2 AS BIGINT) AS src,
                          CAST(l_partkey * 2 + 1 AS BIGINT) AS dst
          FROM lineitem
        ),
        und AS MATERIALIZED (
          SELECT src AS node, dst AS nbr FROM e
          UNION
          SELECT dst AS node, src AS nbr FROM e
        ),
        samp AS MATERIALIZED (
          SELECT node, nbr,
                 row_number() OVER (
                   PARTITION BY node
                   ORDER BY ((node % 2147483647) * 48271
                             + (nbr % 2147483647) * 1291394886) % 2147483647,
                            nbr) AS rn
          FROM und
        ),
        h0 AS MATERIALIZED (
          SELECT CAST(k * 2 AS BIGINT) AS seed, CAST(k * 2 AS BIGINT) AS node
          FROM (SELECT unnest(generate_series(1, 5)) AS k)
        ),
        h1 AS MATERIALIZED (
          SELECT DISTINCT h0.seed, s.nbr AS node
          FROM h0 JOIN samp s ON h0.node = s.node WHERE s.rn <= 3
        ),
        h2 AS MATERIALIZED (
          SELECT DISTINCT h1.seed, s.nbr AS node
          FROM h1 JOIN samp s ON h1.node = s.node WHERE s.rn <= 2
        )
        SELECT seed, CAST(0 AS BIGINT) AS hop, node FROM h0
        UNION ALL SELECT seed, CAST(1 AS BIGINT), node FROM h1
        UNION ALL SELECT seed, CAST(2 AS BIGINT), node FROM h2
    """,
    "large_volume_orders": """
        SELECT c_name, o_orderkey,
               CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
               CAST(sum_qty AS BIGINT) AS sum_qty
        FROM (
          SELECT l_orderkey,
                 CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 200
        ) q
        JOIN orders   ON q.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "branded_revenue": """
        SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))), 0) AS BIGINT)
                 AS revenue_e4,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
               AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 20
               AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 30
               AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)
    """,
    "customer_sorted_neighborhood": """
        WITH p AS (
          SELECT c_custkey,
                 row_number() OVER (ORDER BY c_name, c_custkey) - 1 AS rn
          FROM customer
        )
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               CAST(b.rn - a.rn AS BIGINT) AS dist
        FROM p a JOIN p b ON b.rn > a.rn AND b.rn - a.rn < 5
    """,
    "events_autocorr": """
        WITH c AS (
          SELECT event_type, epoch_us(ts) // 3600000000 AS b,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        base AS (
          SELECT event_type, CAST(max(b) - min(b) + 1 AS BIGINT) AS span,
                 CAST(sum(c) AS BIGINT) AS total,
                 CAST(sum(c * c) AS BIGINT) AS sum_sq
          FROM c GROUP BY event_type
        ),
        d1 AS (
          SELECT a.event_type, CAST(sum(a.c * b.c) AS BIGINT) AS dot
          FROM c a JOIN c b ON b.event_type = a.event_type AND b.b = a.b + 1
          GROUP BY 1
        ),
        d2 AS (
          SELECT a.event_type, CAST(sum(a.c * b.c) AS BIGINT) AS dot
          FROM c a JOIN c b ON b.event_type = a.event_type AND b.b = a.b + 2
          GROUP BY 1
        ),
        d3 AS (
          SELECT a.event_type, CAST(sum(a.c * b.c) AS BIGINT) AS dot
          FROM c a JOIN c b ON b.event_type = a.event_type AND b.b = a.b + 3
          GROUP BY 1
        )
        SELECT base.event_type, base.span, base.total, base.sum_sq,
               CAST(coalesce(d1.dot, 0) AS BIGINT) AS dot_1,
               CAST(coalesce(d2.dot, 0) AS BIGINT) AS dot_2,
               CAST(coalesce(d3.dot, 0) AS BIGINT) AS dot_3
        FROM base
        LEFT JOIN d1 USING (event_type)
        LEFT JOIN d2 USING (event_type)
        LEFT JOIN d3 USING (event_type)
    """,
    "orders_l_diversity": """
        SELECT CAST(o_custkey AS VARCHAR) AS o_custkey,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT o_orderpriority) AS BIGINT)
                 AS n_distinct_sensitive,
               (count(DISTINCT o_orderpriority) >= 3) AS l_ok
        FROM orders GROUP BY o_custkey
    """,
    "doc_proximity": """
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '\\w+') AS ws
          FROM documents
        ),
        pos AS (
          SELECT doc_id, i, ws[i] AS t
          FROM toks, UNNEST(generate_series(1, len(ws))) AS u(i)
        ),
        a AS (SELECT doc_id, i FROM pos WHERE t = 'hash'),
        b AS (SELECT doc_id, i FROM pos WHERE t = 'join')
        SELECT a.doc_id, CAST(min(abs(a.i - b.i)) AS BIGINT) AS min_dist
        FROM a JOIN b USING (doc_id)
        GROUP BY a.doc_id
        HAVING min(abs(a.i - b.i)) <= 10
    """,
    "order_priority_check": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= DATE '1996-07-01'
          AND o.o_orderdate <  DATE '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """,
    "line_priority_modes": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate <  DATE '1998-01-01'
        GROUP BY l_returnflag
    """,
    "customer_order_distribution": """
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
          SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    "promo_revenue": """
        WITH rev AS (
          SELECT p_type,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS r
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= DATE '1997-09-01'
            AND l_shipdate <  DATE '1997-10-01'
        )
        SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN r ELSE 0 END) AS BIGINT)
                 AS promo_revenue_e4,
               CAST(sum(r) AS BIGINT) AS total_revenue_e4,
               CAST(sum(CASE WHEN p_type = 'PROMO' THEN r ELSE 0 END) * 10000
                    // sum(r) AS BIGINT) AS promo_bps
        FROM rev
    """,
    "wealthy_inactive_customers": """
        WITH agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_pos,
                 CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS sum_pos
          FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0
        )
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                 AS totacctbal_cents
        FROM customer, agg
        WHERE CAST(round(c_acctbal * 100) AS BIGINT) * agg.n_pos > agg.sum_pos
          AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
    """,
    "nation_trade_flow": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_e4,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        GROUP BY 1, 2, 3
    """,
    "doc_novelty": """
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '\\w+') AS ws
          FROM documents
        ),
        grams AS (
          SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
          FROM toks, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
          WHERE len(ws) >= 3
          UNION
          SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
          FROM toks WHERE len(ws) > 0 AND len(ws) < 3
        ),
        df AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
                  FROM grams GROUP BY doc_id),
        u AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_unique
          FROM grams WHERE g IN (SELECT g FROM df WHERE c = 1)
          GROUP BY doc_id
        )
        SELECT s.doc_id, s.n_grams,
               CAST(coalesce(u.n_unique, 0) AS BIGINT) AS n_unique,
               CAST(coalesce(u.n_unique, 0) * 1000 // s.n_grams AS BIGINT)
                 AS novelty_milli
        FROM sizes s LEFT JOIN u USING (doc_id)
    """,
    "doc_and_search": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text, '')), '\\w+')) AS t
          FROM documents
        ),
        m AS (
          SELECT doc_id, count(DISTINCT t) AS c
          FROM toks WHERE t IN ('hash', 'join', 'stream')
          GROUP BY doc_id
        )
        SELECT doc_id, CAST(3 AS BIGINT) AS n_matched FROM m WHERE c = 3
    """,
    "small_qty_revenue": """
        WITH ps AS (
          SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sq
          FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0)
                    AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem l JOIN ps ON ps.l_partkey = l.l_partkey
        WHERE 5 * CAST(round(l.l_quantity * 100) AS BIGINT) * ps.n < ps.sq
    """,
    "page_inlinks": """
        WITH d AS (SELECT doc_id FROM documents),
        t AS (
          SELECT 'https://example.org/doc/' ||
                 CAST((doc_id * 131 + i * 31) % 997 AS VARCHAR) AS dst_url
          FROM d, UNNEST([CAST(0 AS BIGINT), CAST(1 AS BIGINT),
                          CAST(2 AS BIGINT)]) AS u(i)
          UNION ALL
          SELECT 'https://ext' || CAST(doc_id % 13 AS VARCHAR) ||
                 '.example.com/x'
          FROM d
        )
        SELECT dst_url, CAST(count(*) AS BIGINT) AS n_inlinks
        FROM t GROUP BY dst_url
    """,
    "events_hourly_interp": """
        WITH c AS (
          SELECT event_type, epoch_us(ts) // 3600000000 AS b,
                 CAST(count(*) AS BIGINT) AS v
          FROM events GROUP BY 1, 2
        ),
        bounds AS (SELECT event_type, min(b) AS lo, max(b) AS hi FROM c GROUP BY 1),
        spine AS (
          SELECT event_type, unnest(generate_series(lo, hi)) AS b FROM bounds
        ),
        j AS (
          SELECT s.event_type, s.b, c.v
          FROM spine s LEFT JOIN c ON c.event_type = s.event_type AND c.b = s.b
        ),
        p AS (
          SELECT event_type, b, v,
                 last_value(v IGNORE NULLS) OVER w AS pv,
                 last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
                   OVER w AS pb,
                 first_value(v IGNORE NULLS) OVER w2 AS nv,
                 first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
                   OVER w2 AS nb
          FROM j
          WINDOW w AS (PARTITION BY event_type ORDER BY b
                       ROWS UNBOUNDED PRECEDING),
                 w2 AS (PARTITION BY event_type ORDER BY b
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, b AS hour,
               CAST(CASE WHEN v IS NOT NULL THEN v
                    ELSE pv + ((nv - pv) * (b - pb)) // (nb - pb)
                    END AS BIGINT) AS n,
               (v IS NULL) AS filled
        FROM p
    """,
    "doc_charset_profile": """
        SELECT doc_id,
          CAST(len(regexp_extract_all(coalesce(text,''), '[A-Za-z]')) AS BIGINT) AS n_ascii_alpha,
          CAST(len(regexp_extract_all(coalesce(text,''), '[0-9]')) AS BIGINT) AS n_digit,
          CAST(len(regexp_extract_all(coalesce(text,''), '[ \\t\\n\\r]')) AS BIGINT) AS n_space,
          CAST(len(regexp_extract_all(coalesce(text,''), '[.,;:!?''"()\\[\\]-]')) AS BIGINT) AS n_punct,
          CAST(len(regexp_extract_all(coalesce(text,''), '[^\\x00-\\x7F]')) AS BIGINT) AS n_non_ascii
        FROM documents
    """,
    "events_runs": """
        WITH s AS (
          SELECT user_id, event_type, ts, event_id,
                 CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        r AS (
          SELECT user_id,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run_id
          FROM s
        ),
        g AS (SELECT user_id, run_id, count(*) AS c FROM r GROUP BY 1, 2)
        SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_runs,
               CAST(max(c) AS BIGINT) AS max_run
        FROM g GROUP BY user_id
    """,
    "doc_token_weighted_quantiles": f"""
        WITH tc AS (SELECT CAST({_N_TOKENS_SQL} AS BIGINT) AS v FROM documents),
        h AS (SELECT v, CAST(sum(v) AS BIGINT) AS w FROM tc GROUP BY v),
        c AS (
          SELECT v, sum(w) OVER (ORDER BY v) AS cum, sum(w) OVER () AS total
          FROM h
        )
        SELECT CAST(q.q_milli AS BIGINT) AS q_milli,
               CAST(min(c.v) AS BIGINT) AS value
        FROM (VALUES (250), (500), (750)) q(q_milli), c
        WHERE c.cum * 1000 >= q.q_milli * c.total
        GROUP BY q.q_milli
    """,
    "supplier_waiting": """
        WITH lo AS (
          SELECT l.l_orderkey, l.l_suppkey,
                 (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE o.o_orderstatus = 'F'
        ),
        agg AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS ns,
                 count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nl,
                 min(CASE WHEN late THEN l_suppkey END) AS the_late
          FROM lo GROUP BY l_orderkey
        )
        SELECT the_late AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
        FROM agg WHERE ns >= 2 AND nl = 1 GROUP BY the_late
    """,
    "supplier_jaccard": """
        WITH base AS (
          SELECT 's' || CAST(s_suppkey AS VARCHAR) AS x,
                 'n' || CAST(s_nationkey AS VARCHAR) AS y FROM supplier
          UNION ALL
          SELECT 'n' || CAST(n_nationkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR) FROM nation
          UNION ALL
          SELECT 's' || CAST(s_suppkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR)
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ),
        und AS (
          SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
          FROM base WHERE x <> y
        ),
        adj AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
        deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS degree FROM adj GROUP BY u),
        cn AS (
          SELECT l.v AS x, r.v AS y, CAST(count(*) AS BIGINT) AS n_common
          FROM adj l JOIN adj r ON l.u = r.u AND l.v < r.v
          GROUP BY 1, 2
        )
        SELECT cn.x AS node_a, cn.y AS node_b, cn.n_common,
               da.degree AS deg_a, db.degree AS deg_b,
               CAST((cn.n_common * 1000000) //
                    (da.degree + db.degree - cn.n_common) AS BIGINT) AS jac_x1e6
        FROM cn
        JOIN deg da ON da.node = cn.x
        JOIN deg db ON db.node = cn.y
        WHERE cn.n_common * 1000000 >=
              250000 * (da.degree + db.degree - cn.n_common)
    """,
    "doc_containment": """
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '\\w+') AS ws
          FROM documents
        ),
        grams AS (
          SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
          FROM toks, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
          WHERE len(ws) >= 3
          UNION
          SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
          FROM toks WHERE len(ws) > 0 AND len(ws) < 3
        ),
        kept AS (
          SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) <= 50
        ),
        fgrams AS (SELECT doc_id, g FROM grams WHERE g IN (SELECT g FROM kept)),
        doc_sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
        pair_common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
          FROM fgrams a JOIN fgrams b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ),
        sized AS (
          SELECT p.id_a, p.id_b, CAST(p.n_common AS BIGINT) AS n_common,
                 CAST(sa.n_grams AS BIGINT) AS n_a, CAST(sb.n_grams AS BIGINT) AS n_b
          FROM pair_common p
          JOIN doc_sizes sa ON p.id_a = sa.doc_id
          JOIN doc_sizes sb ON p.id_b = sb.doc_id
        )
        SELECT id_a AS id_sub, id_b AS id_sup, n_common, n_a AS n_sub, n_b AS n_sup
        FROM sized WHERE n_common * 1000 >= 800 * n_a
        UNION ALL
        SELECT id_b AS id_sub, id_a AS id_sup, n_common, n_b AS n_sub, n_a AS n_sup
        FROM sized WHERE n_common * 1000 >= 800 * n_b
    """,
    "doc_readability": """
        WITH c AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(coalesce(text, ''), '\\w+')) AS BIGINT) AS w,
                 CAST(len(regexp_extract_all(coalesce(text, ''), '[.!?]+')) AS BIGINT) AS s,
                 CAST(len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+')) AS BIGINT) AS y
          FROM documents
        )
        SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
               CAST(206835 - (1015 * w) // greatest(s, 1)
                           - (84600 * y) // greatest(w, 1) AS BIGINT) AS flesch_x1000
        FROM c
    """,
    "orders_mrr": """
        WITH r AS (
          SELECT c.c_mktsegment, o.o_custkey,
                 row_number() OVER (
                   PARTITION BY o.o_custkey
                   ORDER BY CAST(round(o.o_totalprice * 100) AS BIGINT) DESC,
                            o.o_orderkey
                 ) AS rk,
                 (o.o_orderpriority = '1-URGENT') AS rel
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        per AS (
          SELECT c_mktsegment, o_custkey,
                 min(CASE WHEN rel AND rk <= 10 THEN rk END) AS first_rel
          FROM r GROUP BY c_mktsegment, o_custkey
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_queries,
               CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               CAST(sum(coalesce(1000000 // first_rel, 0)) AS BIGINT) AS sum_rr_x1e6
        FROM per GROUP BY c_mktsegment
    """,
    "user_cadence": """
        WITH s AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        st AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(count(*) - count(DISTINCT t) AS BIGINT) AS n_dup_ts
          FROM s GROUP BY user_id
        ),
        l AS (
          SELECT user_id,
                 t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS d
          FROM s
        ),
        g AS (SELECT user_id, d // 1000000 AS gap_s FROM l WHERE d IS NOT NULL),
        gs AS (
          SELECT user_id, CAST(min(gap_s) AS BIGINT) AS min_gap_s,
                 CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
                 CAST(sum(gap_s * gap_s) AS BIGINT) AS sum_gap_sq
          FROM g GROUP BY user_id
        )
        SELECT st.user_id, st.n_events, st.n_dup_ts,
               CAST(coalesce(gs.min_gap_s, -1) AS BIGINT) AS min_gap_s,
               CAST(coalesce(gs.sum_gap_s, 0) AS BIGINT) AS sum_gap_s,
               CAST(coalesce(gs.sum_gap_sq, 0) AS BIGINT) AS sum_gap_sq
        FROM st LEFT JOIN gs USING (user_id)
    """,
    "doc_token_counts": f"SELECT doc_id, {_N_TOKENS_SQL} AS n_tokens FROM documents",
    "doc_stats": f"""
        SELECT doc_id,
               length(coalesce(text,'')) AS n_chars,
               length(coalesce(text,'')) - length(regexp_replace(coalesce(text,''), '[.!?,;:]', '', 'g')) AS n_punct,
               {_N_TOKENS_SQL} AS n_tokens
        FROM documents
    """,
    # quality_score float twin: the four ratio terms and the final
    # weighted sum are mirrored in EXACT IEEE op order (left-assoc
    # sums/products, clip = least/greatest, integer inputs shared
    # with the doc_stats / doc_lang_id twins) -- same doctrine as the
    # HLL-estimate and kg_nodes size float surfaces.
    "doc_quality": f"""
        WITH m AS (
          SELECT doc_id,
                 CAST(length(coalesce(text,'')) AS BIGINT) AS n_chars,
                 CAST(length(coalesce(text,''))
                      - length(regexp_replace(coalesce(text,''),
                                              '[.!?,;:]', '', 'g'))
                      AS BIGINT) AS n_punct,
                 CAST({_N_TOKENS_SQL} AS BIGINT) AS n_tokens,
                 CAST({_lang_count('en')} AS BIGINT) AS n_stop
          FROM documents
        ),
        f AS (
          SELECT doc_id, n_tokens,
            CAST(least(n_tokens, 1000) AS DOUBLE) / 1000.0 AS len_score,
            CAST(n_punct AS DOUBLE)
              / CAST(greatest(n_chars, 1) AS DOUBLE) AS punct_ratio,
            CAST(n_stop AS DOUBLE)
              / CAST(greatest(n_tokens, 1) AS DOUBLE) AS stop_ratio,
            CAST(greatest(n_chars - n_tokens + 1, 0) AS DOUBLE)
              / CAST(greatest(n_tokens, 1) AS DOUBLE) AS mean_wl
          FROM m
        )
        SELECT doc_id,
               0.3 * len_score
                 + 0.3 * least(stop_ratio, 0.5) * 2.0
                 + 0.2 * (1.0 - least(punct_ratio, 0.2) * 5.0)
                 + 0.2 * (1.0 - least(abs(mean_wl - 5.0), 5.0) / 5.0)
                 AS quality,
               n_tokens, stop_ratio
        FROM f
    """,
    # CMS heavy-hitter twin: calibrated fixture fact — the corpus
    # vocabulary is far below the sketch width, so estimates are
    # collision-free and the approx top-k equals the exact top-k
    # (see q_top_tokens_approx docstring).
    "top_tokens_approx": r"""
        WITH toks AS (
          SELECT unnest(regexp_extract_all(lower(coalesce(text,'')), '\w+')) AS value
          FROM documents
        ),
        cnt AS (
          SELECT value, CAST(count(*) AS BIGINT) AS est_count
          FROM toks GROUP BY value
        )
        SELECT value, est_count FROM cnt
        ORDER BY est_count DESC, value ASC LIMIT 50
    """,
    # feature-hashing embedding twin: DuckDB md5 reproduces the
    # hashing trick's (dimension, sign) per token (first 4 bytes mod
    # 128; 5th byte low bit); the signed histogram and its sum of
    # squares are integer-exact, so each normalized component is ONE
    # division by sqrt + multiply + half-even round on both sides.
    "doc_embed": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text,'')), '\w+')) AS token
          FROM documents
        ),
        hashed AS (
          SELECT doc_id, md5('13:' || token) AS h FROM toks
        ),
        slots AS (
          SELECT doc_id,
                 ('0x' || substr(h, 1, 8))::BIGINT % 128 AS idx,
                 CASE WHEN strpos('13579bdf', substr(h, 10, 1)) > 0
                      THEN 1 ELSE -1 END AS sign
          FROM hashed
        ),
        hist AS (
          SELECT doc_id, idx, CAST(sum(sign) AS BIGINT) AS c
          FROM slots GROUP BY doc_id, idx
        ),
        norms AS (
          SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS s2
          FROM hist GROUP BY doc_id
        )
        SELECT h.doc_id, h.idx,
               CAST(roundbankers(
                 CAST(h.c AS DOUBLE) / sqrt(CAST(n.s2 AS DOUBLE))
                   * 1000.0, 0) AS BIGINT) AS val_milli
        FROM hist h JOIN norms n USING (doc_id)
        WHERE h.c <> 0
    """,
    # unigram-NLL twin: per-token log probabilities quantized to
    # integer micro-nats at model build (one ln + roundbankers per
    # vocab entry, mirroring the stage), so the per-doc reduction is
    # an exact integer sum; the final milli-nat mean is one division
    # + half-even round on both sides. min_count=1 => every corpus
    # token is in the model (the unk branch never fires).
    "doc_unigram_ppl": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text,'')), '\w+')) AS token
          FROM documents
        ),
        cnt AS (
          SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY token
        ),
        tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM cnt),
        model AS (
          SELECT token,
                 CAST(roundbankers(
                   ln(CAST(n AS DOUBLE) / total) * 1000000.0, 0) AS BIGINT)
                   AS lp_micro
          FROM cnt CROSS JOIN tot
        ),
        per_doc AS (
          SELECT t.doc_id,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(-sum(m.lp_micro) AS BIGINT) AS s
          FROM toks t JOIN model m USING (token)
          GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(
                 CAST(roundbankers(
                   CAST(p.s AS DOUBLE)
                     / CAST(p.n_tokens * 1000 AS DOUBLE), 0) AS BIGINT),
                 0) AS BIGINT) AS nll_milli
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    # bigram-NLL twin: same micro-nat doctrine per TRANSITION —
    # P(w|v) = c(v w)/c(v) from the corpus-fit tables (self-trained,
    # so every transition hits both tables and the unseen branch is
    # dead); docs with < 2 tokens emit zeros via the left join.
    "doc_bigram_ppl": r"""
        WITH toks AS (
          SELECT doc_id, u.tok, u.i
          FROM documents,
               LATERAL (SELECT unnest(regexp_extract_all(lower(coalesce(text,'')), '\w+')) AS tok,
                               generate_subscripts(regexp_extract_all(lower(coalesce(text,'')), '\w+'), 1) AS i) u
        ),
        uni AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
        ),
        trans AS (
          SELECT a.doc_id, a.tok AS prev, b.tok AS cur
          FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        ),
        bi AS (
          SELECT prev, cur, CAST(count(*) AS BIGINT) AS c
          FROM trans GROUP BY prev, cur
        ),
        scored AS (
          SELECT t.doc_id,
                 CAST(roundbankers(
                   -ln(CAST(bi.c AS DOUBLE) / CAST(greatest(uni.c, 1) AS DOUBLE))
                     * 1000000.0, 0) AS BIGINT) AS micro
          FROM trans t
          JOIN uni ON uni.tok = t.prev
          JOIN bi ON bi.prev = t.prev AND bi.cur = t.cur
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_transitions,
                 CAST(sum(micro) AS BIGINT) AS s
          FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_transitions, 0) AS BIGINT) AS n_transitions,
               CAST(coalesce(
                 CAST(roundbankers(
                   CAST(p.s AS DOUBLE)
                     / CAST(p.n_transitions * 1000 AS DOUBLE), 0) AS BIGINT),
                 0) AS BIGINT) AS nll_milli
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    # tf-idf float twin: one ln() per (token, df) and the
    # tf*idf*1000 product mirrored left-associative; np.round is
    # half-to-even, so the SQL side uses roundbankers(x, 0). Tokens
    # via the same \w+ extractor as the nb_classify twin.
    "doc_tfidf_keywords": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text,'')), '\w+')) AS token
          FROM documents
        ),
        tf AS (
          SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
          FROM toks GROUP BY doc_id, token
        ),
        df AS (
          SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM toks GROUP BY token
        ),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.token,
                 CAST(roundbankers(
                   CAST(tf.tf AS DOUBLE)
                     * ln(n.n / CAST(df.df AS DOUBLE)) * 1000.0, 0)
                   AS BIGINT) AS score_milli
          FROM tf JOIN df USING (token) CROSS JOIN n
        ),
        ranked AS (
          SELECT doc_id, token, score_milli,
                 row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY score_milli DESC, token ASC) AS rn
          FROM scored
        )
        SELECT doc_id, token, score_milli FROM ranked WHERE rn <= 5
    """,
    "doc_lang_id": f"""
        SELECT doc_id,
               CASE
                 WHEN {_lang_count('en')} = 0 AND {_lang_count('de')} = 0 AND {_lang_count('fr')} = 0 THEN 'und'
                 WHEN {_lang_count('en')} >= {_lang_count('de')} AND {_lang_count('en')} >= {_lang_count('fr')} THEN 'en'
                 WHEN {_lang_count('de')} >= {_lang_count('fr')} THEN 'de'
                 ELSE 'fr'
               END AS lang_pred
        FROM documents
    """,
    "doc_fingerprint": "SELECT doc_id, md5(coalesce(text,'')) AS md5 FROM documents",
    "doc_repetition": r"""
        WITH toks AS (
          SELECT doc_id, u.tok, u.i
          FROM documents,
               LATERAL (SELECT unnest(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+')) AS tok,
                               generate_subscripts(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'), 1) AS i) u
          WHERE trim(coalesce(text,'')) <> ''
        ),
        bi AS (
          SELECT doc_id,
                 string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS gram,
                 count(*) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS glen
          FROM toks
        ),
        tok_stats AS (
          SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct_tokens,
                 max(length(tok)) AS max_word_len
          FROM toks GROUP BY doc_id
        ),
        top_tok AS (
          SELECT doc_id, max(c) AS top_token_count FROM (
            SELECT doc_id, tok, count(*) c FROM toks GROUP BY 1, 2) GROUP BY doc_id
        ),
        top_bi AS (
          SELECT doc_id, max(c) AS top_bigram_count FROM (
            SELECT doc_id, gram, count(*) c FROM bi WHERE glen = 2 GROUP BY 1, 2) GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(t.n_tokens, 0) AS n_tokens,
               coalesce(t.n_distinct_tokens, 0) AS n_distinct_tokens,
               coalesce(t.max_word_len, 0) AS max_word_len,
               coalesce(tt.top_token_count, 0) AS top_token_count,
               coalesce(tb.top_bigram_count, 0) AS top_bigram_count
        FROM documents d
        LEFT JOIN tok_stats t USING (doc_id)
        LEFT JOIN top_tok tt USING (doc_id)
        LEFT JOIN top_bi tb USING (doc_id)
    """,
    "doc_line_dedup": r"""
        WITH lines AS (
          SELECT doc_id, u.line, u.pos
          FROM documents,
               LATERAL (SELECT unnest(string_split(coalesce(text,''), chr(10))) AS line,
                               generate_subscripts(string_split(coalesce(text,''), chr(10)), 1) AS pos) u
        ),
        common AS (
          SELECT line FROM lines WHERE trim(line) <> ''
          GROUP BY line HAVING count(DISTINCT doc_id) >= 2
        )
        SELECT doc_id,
               count(*) AS n_lines,
               count(*) FILTER (WHERE line IN (SELECT line FROM common)) AS n_removed,
               md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
                            FILTER (WHERE line NOT IN (SELECT line FROM common)), '')) AS clean_md5
        FROM lines GROUP BY doc_id
    """,
    "doc_decontaminate": r"""
        WITH toks AS (
          SELECT doc_id, u.tok, u.i
          FROM documents,
               LATERAL (SELECT unnest(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+')) AS tok,
                               generate_subscripts(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'), 1) AS i) u
          WHERE trim(coalesce(text,'')) <> ''
        ),
        grams AS (
          SELECT doc_id,
                 string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS gram,
                 count(*) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS glen
          FROM toks
        ),
        full_grams AS (SELECT doc_id, gram FROM grams WHERE glen = 3),
        bench AS (SELECT DISTINCT gram FROM full_grams WHERE doc_id % 20 = 0)
        SELECT f.doc_id,
               count(DISTINCT f.gram) FILTER (WHERE f.gram IN (SELECT gram FROM bench)) AS n_shared_grams,
               (count(DISTINCT f.gram) FILTER (WHERE f.gram IN (SELECT gram FROM bench)) > 0)::BIGINT AS contaminated
        FROM full_grams f
        WHERE f.doc_id % 20 <> 0
        GROUP BY f.doc_id
    """,
    "doc_pii_redact": r"""
        SELECT doc_id,
          len(regexp_extract_all(coalesce(text,''), '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
          len(regexp_extract_all(coalesce(text,''), '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))::BIGINT AS n_phones,
          len(regexp_extract_all(coalesce(text,''), '\b(?:\d{1,3}\.){3}\d{1,3}\b'))::BIGINT AS n_ipv4,
          md5(regexp_replace(regexp_replace(regexp_replace(coalesce(text,''),
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
              '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g')) AS redacted_md5
        FROM documents
    """,
    "doc_exact_dedup": """
        SELECT min(doc_id) AS doc_id, md5(coalesce(text,'')) AS text_md5
        FROM documents GROUP BY md5(coalesce(text,''))
    """,
    "kg_chunk_stats": f"""
        WITH RECURSIVE
        w AS (
          SELECT doc_id, {_N_TOKENS_SQL} AS n
          FROM documents WHERE text IS NOT NULL AND text <> ''
        ),
        sim AS (
          SELECT doc_id, n, 0::BIGINT AS start, 0::BIGINT AS cnt, 0::BIGINT AS words, FALSE AS done
          FROM w WHERE n > {CHUNK_SIZE}
          UNION ALL
          SELECT doc_id, n,
            CASE WHEN least(start + {CHUNK_SIZE}, n) - {CHUNK_OVERLAP} < n
                      AND least(start + {CHUNK_SIZE}, n) - {CHUNK_OVERLAP} + {_CHUNK_STEP} >= n THEN n
                 ELSE least(start + {CHUNK_SIZE}, n) - {CHUNK_OVERLAP} END,
            cnt + 1 + CASE WHEN least(start + {CHUNK_SIZE}, n) - {CHUNK_OVERLAP} < n
                                AND least(start + {CHUNK_SIZE}, n) - {CHUNK_OVERLAP} + {_CHUNK_STEP} >= n THEN 1 ELSE 0 END,
            words + (least(start + {CHUNK_SIZE}, n) - start)
                  + CASE WHEN least(start + {CHUNK_SIZE}, n) - {CHUNK_OVERLAP} < n
                              AND least(start + {CHUNK_SIZE}, n) - {CHUNK_OVERLAP} + {_CHUNK_STEP} >= n
                         THEN n - (least(start + {CHUNK_SIZE}, n) - {CHUNK_OVERLAP}) ELSE 0 END,
            CASE WHEN least(start + {CHUNK_SIZE}, n) - {CHUNK_OVERLAP} < n
                      AND least(start + {CHUNK_SIZE}, n) - {CHUNK_OVERLAP} + {_CHUNK_STEP} >= n THEN TRUE
                 WHEN least(start + {CHUNK_SIZE}, n) - {CHUNK_OVERLAP} >= n THEN TRUE
                 ELSE FALSE END
          FROM sim WHERE NOT done AND start < n
        )
        SELECT doc_id, max(cnt) AS n_chunks, max(words) AS total_chunk_words
        FROM sim GROUP BY doc_id
        UNION ALL
        SELECT doc_id, 1::BIGINT, n FROM w WHERE n <= {CHUNK_SIZE}
    """,
    "lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_cc,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "orders_by_segment": """
        SELECT c.c_mktsegment,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "lineitem_orders_join": """
        SELECT o.o_orderpriority,
               count(*) AS n_items,
               CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    "top_orders": """
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders ORDER BY price_cents DESC, o_orderkey ASC LIMIT 100
    """,
    "events_window": """
        SELECT event_type, date_trunc('hour', ts) AS window_start,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    "knn_cosine": f"""
        SELECT q.vec_id AS query_id, e.vec_id
        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES}) q
        CROSS JOIN embeddings e
        WHERE e.vec_id <> q.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id ASC
        ) <= {KNN_K}
    """,
    # ANN acceptance twins: the oracle states the EXPECTED acceptance
    # row (shape constants + calibrated quality booleans all true);
    # the Ray side measures them against its brute ground truth
    # (itself hash-exact vs the knn_cosine twin above). A recall or
    # rank-distortion regression flips a boolean -> hash mismatch.
    "knn_ivf": f"""
        SELECT vec_id AS query_id,
               CAST({KNN_K} AS BIGINT) AS n_results,
               CAST({KNN_K} AS BIGINT) AS n_distinct,
               true AS self_excluded,
               true AS all_in_top30,
               true AS recall10_ge_5
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES})
    """,
    "knn_ivf_indexed": f"""
        SELECT vec_id AS query_id,
               CAST({KNN_K} AS BIGINT) AS n_results,
               CAST({KNN_K} AS BIGINT) AS n_distinct,
               true AS self_excluded,
               true AS all_in_top30,
               true AS recall10_ge_5
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES})
    """,
    "knn_pq": f"""
        SELECT vec_id AS query_id,
               CAST({KNN_K} AS BIGINT) AS n_results,
               CAST({KNN_K} AS BIGINT) AS n_distinct,
               true AS self_excluded,
               true AS half_in_top50,
               true AS most_in_top100
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES})
    """,
    # Ideal-Jaccard twin: LSH banding (32x4, S-curve ~0.42, far below
    # the 0.8 verify threshold) is a candidate FILTER whose output is
    # exact-Jaccard-verified, so on this corpus the final mapping
    # equals the ideal "all pairs with word-5-gram Jaccard >= 0.8,
    # components, min-id rep" — which IS SQL. Fixture facts this
    # rests on: no true pair escapes the banding (deterministic given
    # the fixed hash params; per-pair escape odds ~5e-8 at J=0.8) and
    # no band bucket overflows max_pairs_per_bucket. The integer form
    # 5*ni >= 4*union is exact (no float division).
    "minhash_dedup": "WITH RECURSIVE " + _MINHASH_CTES + """
        SELECT CAST(id AS BIGINT) AS doc_id, CAST(dup_of AS BIGINT) AS dup_of
        FROM rep WHERE dup_of <> id
    """,
    # Leakage-safe split twin: the minhash rep mapping (above) feeds
    # the bit-exact splitmix64 finalizer; split = mix(rep ^ seedmix)
    # mod 1000 < 900, reproduced with UBIGINT xor / shift-by-division
    # / split-multiply mod 2^64 (verified value-equal to numpy's
    # wraparound arithmetic for the full id range).
    "doc_leakage_split": "WITH RECURSIVE " + _MINHASH_CTES + _LEAKAGE_MIX_SQL,
    # Contrastive-pair composite: positives are the minhash ideal-
    # Jaccard rep mapping (label 1), negatives the source-excluded
    # cosine top-k miner (label 0) — both parent twins verbatim.
    "retrieval_training_pairs": "WITH RECURSIVE " + _MINHASH_CTES + f""",
        pos AS (
          SELECT CAST(dup_of AS BIGINT) AS anchor_id,
                 CAST(id AS BIGINT) AS other_id,
                 CAST(1 AS BIGINT) AS label
          FROM rep WHERE dup_of <> id
        ),
        neg AS (
          SELECT q.vec_id AS anchor_id, e.vec_id AS other_id,
                 CAST(0 AS BIGINT) AS label
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES}) q
          JOIN documents qd ON qd.doc_id = q.vec_id
          CROSS JOIN embeddings e
          JOIN documents ed ON ed.doc_id = e.vec_id
          WHERE e.vec_id <> q.vec_id AND ed.source <> qd.source
          QUALIFY row_number() OVER (
              PARTITION BY q.vec_id
              ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                       e.vec_id ASC
          ) <= {KNN_K}
        )
        SELECT * FROM pos UNION ALL SELECT * FROM neg
    """,
    # Cross-corpus ideal-Jaccard twin (same doctrine as minhash_dedup:
    # 32x4 banding is a candidate filter ahead of the exact verify;
    # per-pair banding-escape odds at J=0.7 are ~1.5e-4 and the
    # fixture pairs sit far above threshold). Bench side = every 25th
    # doc with the deterministic 'benchmark ' prefix; integer form
    # 10*ni >= 7*union.
    "fuzzy_decontaminate": r"""
        WITH cw AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text,'')), '\w+') AS ws
          FROM documents
        ),
        bw AS (
          SELECT doc_id AS bench_id,
                 regexp_extract_all(lower('benchmark ' || coalesce(text,'')),
                                    '\w+') AS ws
          FROM documents WHERE doc_id % 25 = 0
        ),
        cg AS (
          SELECT DISTINCT doc_id, array_to_string(ws[i.i : i.i + 4], ' ') AS g
          FROM cw, LATERAL (SELECT unnest(generate_series(
              1, greatest(1, len(ws) - 4))) AS i) i
        ),
        bg AS (
          SELECT DISTINCT bench_id, array_to_string(ws[i.i : i.i + 4], ' ') AS g
          FROM bw, LATERAL (SELECT unnest(generate_series(
              1, greatest(1, len(ws) - 4))) AS i) i
        ),
        cs AS (SELECT doc_id, count(*) AS n FROM cg GROUP BY doc_id),
        bs AS (SELECT bench_id, count(*) AS n FROM bg GROUP BY bench_id),
        inter AS (
          SELECT c.doc_id, b.bench_id, count(*) AS ni
          FROM cg c JOIN bg b ON c.g = b.g
          GROUP BY 1, 2
        )
        SELECT CAST(i.doc_id AS BIGINT) AS id_a,
               CAST(i.bench_id AS BIGINT) AS id_b
        FROM inter i
        JOIN cs ON cs.doc_id = i.doc_id
        JOIN bs ON bs.bench_id = i.bench_id
        WHERE 10 * ni >= 7 * (cs.n + bs.n - ni)
    """,
"embedding_dedup": _EMBED_DEDUP_ORACLE_SQL,
    "semantic_dedup": _EMBED_DEDUP_ORACLE_SQL,
    "doc_span_corruption": _span_corruption_oracle_sql(),
        "doc_simpson": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(coalesce(text,'')), '\w+')) AS tok
            FROM documents
        ),
        per AS (
            SELECT doc_id,
                   CAST(sum(c * (c - 1)) AS BIGINT) AS rep_num,
                   CAST(sum(c) AS BIGINT) AS n
            FROM (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.rep_num, 0) AS BIGINT) AS rep_num,
               CAST(coalesce(p.n * (p.n - 1), 0) AS BIGINT) AS rep_den
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "source_dup_stats": """
        WITH p AS (
            SELECT source, md5(coalesce(text, '')) AS m,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        )
        SELECT source,
               CAST(sum(n) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(n) - count(*) AS BIGINT) AS n_dups
        FROM p GROUP BY source
    """,
    "orders_aging": """
        WITH t AS (SELECT max(epoch_us(o_orderdate)) AS anchor FROM orders),
        a AS (
            SELECT anchor - epoch_us(o_orderdate) AS age
            FROM orders, t WHERE o_orderstatus = 'O'
        )
        SELECT CASE WHEN age < CAST(30 AS BIGINT)*86400*1000000 THEN 'lt_30d'
                    WHEN age < CAST(90 AS BIGINT)*86400*1000000 THEN 'lt_90d'
                    WHEN age < CAST(365 AS BIGINT)*86400*1000000 THEN 'lt_1y'
                    ELSE 'ge_1y' END AS bucket,
               count(*) AS n
        FROM a GROUP BY 1
    """,
    "knn_filtered": f"""
        SELECT q.vec_id AS query_id, e.vec_id
        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES}) q
        CROSS JOIN embeddings e
        WHERE e.vec_id <> q.vec_id AND e.label = 0
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id ASC
        ) <= {KNN_K}
    """,
    "doc_quote_census": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(coalesce(text, ''), '"[^"]*"'))
                    AS BIGINT) AS n_quotes,
               CAST(coalesce(list_sum(list_transform(
                        regexp_extract_all(coalesce(text, ''), '"[^"]*"'),
                        x -> length(x))), 0) AS BIGINT) AS n_quoted_chars
        FROM documents
    """,
    "events_gap_buckets": """
        WITH l AS (
            SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) AS d
            FROM events
        ),
        g AS (
            SELECT CASE WHEN d < 1000000 THEN 'lt_1s'
                        WHEN d < 10000000 THEN 'lt_10s'
                        WHEN d < 60000000 THEN 'lt_1m'
                        WHEN d < 600000000 THEN 'lt_10m'
                        WHEN d < 3600000000 THEN 'lt_1h'
                        ELSE 'ge_1h' END AS bucket
            FROM l WHERE d IS NOT NULL
        )
        SELECT bucket, count(*) AS n FROM g GROUP BY 1
    """,
    "knn_rrf": f"""
        WITH q AS (SELECT * FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES}),
        cosr AS (
          SELECT q.vec_id AS query_id, e.vec_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                            e.vec_id ASC
                 ) AS rnk
          FROM q CROSS JOIN embeddings e
          WHERE e.vec_id <> q.vec_id
          QUALIFY rnk <= {KNN_K}
        ),
        l2r AS (
          SELECT q.vec_id AS query_id, e.vec_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_distance(q.embedding, e.embedding) ASC,
                            e.vec_id ASC
                 ) AS rnk
          FROM q CROSS JOIN embeddings e
          WHERE e.vec_id <> q.vec_id
          QUALIFY rnk <= {KNN_K}
        ),
        pts AS (
          SELECT query_id, vec_id,
                 CAST(1000000 // ({RRF_K_CONST} + rnk) AS BIGINT) AS p FROM cosr
          UNION ALL
          SELECT query_id, vec_id,
                 CAST(1000000 // ({RRF_K_CONST} + rnk) AS BIGINT) FROM l2r
        )
        SELECT query_id, vec_id, CAST(sum(p) AS BIGINT) AS rrf_micro
        FROM pts GROUP BY 1, 2
        QUALIFY row_number() OVER (
          PARTITION BY query_id ORDER BY sum(p) DESC, vec_id ASC
        ) <= {KNN_K}
    """,
    "graph_walks": _CNRS_EDGES_SQL.replace("WITH base", "WITH RECURSIVE base") + """,
        adj AS (SELECT a AS node, b AS nbr FROM und
                UNION ALL SELECT b, a FROM und),
        nodes AS (SELECT node, row_number() OVER (ORDER BY node) - 1 AS nid
                  FROM (SELECT DISTINCT node FROM adj) t),
        iadj AS (SELECT n1.nid AS node, n2.nid AS nbr
                 FROM adj JOIN nodes n1 ON adj.node = n1.node
                          JOIN nodes n2 ON adj.nbr = n2.node),
        radj AS (SELECT node, nbr,
                        row_number() OVER (PARTITION BY node ORDER BY nbr) - 1 AS rnk,
                        count(*) OVER (PARTITION BY node) AS deg
                 FROM iadj),
        walk(walk_id, step, cur) AS (
          SELECT nid, CAST(0 AS BIGINT), nid FROM nodes
          UNION ALL
          SELECT w.walk_id, w.step + 1, r.nbr
          FROM walk w JOIN radj r
            ON r.node = w.cur
           AND r.rnk = ((w.walk_id * 48271 + (w.step + 1) * 9973) % 2147483647) % r.deg
          WHERE w.step < 4
        )
        SELECT w.walk_id, w.step, n.node
        FROM walk w JOIN nodes n ON n.nid = w.cur
    """,
    "graph_skipgrams": _CNRS_EDGES_SQL.replace("WITH base", "WITH RECURSIVE base") + """,
        adj AS (SELECT a AS node, b AS nbr FROM und
                UNION ALL SELECT b, a FROM und),
        nodes AS (SELECT node, row_number() OVER (ORDER BY node) - 1 AS nid
                  FROM (SELECT DISTINCT node FROM adj) t),
        iadj AS (SELECT n1.nid AS node, n2.nid AS nbr
                 FROM adj JOIN nodes n1 ON adj.node = n1.node
                          JOIN nodes n2 ON adj.nbr = n2.node),
        radj AS (SELECT node, nbr,
                        row_number() OVER (PARTITION BY node ORDER BY nbr) - 1 AS rnk,
                        count(*) OVER (PARTITION BY node) AS deg
                 FROM iadj),
        walk(walk_id, step, cur) AS (
          SELECT nid, CAST(0 AS BIGINT), nid FROM nodes
          UNION ALL
          SELECT w.walk_id, w.step + 1, r.nbr
          FROM walk w JOIN radj r
            ON r.node = w.cur
           AND r.rnk = ((w.walk_id * 48271 + (w.step + 1) * 9973) % 2147483647) % r.deg
          WHERE w.step < 4
        ),
        wn AS (SELECT w.walk_id, w.step, n.node
               FROM walk w JOIN nodes n ON n.nid = w.cur)
        SELECT a.node AS center, b.node AS context, count(*) AS n
        FROM wn a JOIN wn b
          ON a.walk_id = b.walk_id AND a.step <> b.step
         AND abs(a.step - b.step) <= 2
        GROUP BY 1, 2
    """,
    "customers_per_region": """
        SELECT r_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "doc_mixture_sample": _mixture_sample_sql(),
    "doc_mixture_resample": _mixture_resample_sql(),
    "hits": _hits_oracle_sql(),
    "embedding_clusters": _kmeans_oracle_sql(),
    "doc_cdc_dedup": _cdc_oracle_sql(),
    "link_lpa_modularity": _lpa_modularity_oracle_sql(),
    "training_qa": _training_qa_oracle_sql(),
    "training_stratified_split": _training_stratified_split_oracle_sql(),
    "training_counterfactuals": _training_counterfactual_oracle_sql(),
    "training_anti_patterns": _training_anti_pattern_oracle_sql(),
    "training_chains": _training_chains_oracle_sql(),
    "training_comparisons": _training_comparisons_oracle_sql(),
    "training_concept_qa": _training_concept_oracle_sql(),
    "training_model_selection": _training_model_selection_oracle_sql(),
    "scenario_eval": _scenario_eval_oracle_sql(),
    "graph_betweenness": _betweenness_oracle_sql(),
    "kg_training_pipeline": _kg_training_pipeline_oracle_sql(),
    "kg_record_analysis": _kg_record_analysis_oracle_sql(),
    "kg_incremental": _kg_incremental_oracle_sql(),
    "corpus_curation": _corpus_curation_oracle_sql(),
    # media decode/resize/resample twins: the synthesized payload dims
    # are a pure md5 function of (doc_id, text[:64]) — the SQL side
    # derives the EXPECTED decoded shape from the synthesis formula,
    # so a codec roundtrip regression (wrong dims, decode failure)
    # breaks the hash loudly. Content-dependent features stay
    # rows-only (the pixel/sample streams are MT19937-generated).
    "media_png_decode": r"""
        WITH m AS (
          SELECT doc_id AS media_id,
                 md5(CAST(doc_id AS VARCHAR) || ':'
                     || substr(coalesce(text,''), 1, 64)) AS h
          FROM documents)
        SELECT media_id,
               CAST(8 + ('0x' || substr(h, 9, 2))::BIGINT % 9 AS BIGINT)
                 AS height,
               CAST(8 + ('0x' || substr(h, 11, 2))::BIGINT % 9 AS BIGINT)
                 AS width,
               TRUE AS decode_ok
        FROM m
    """,
    "media_wav_decode": r"""
        WITH m AS (
          SELECT doc_id AS media_id,
                 md5(CAST(doc_id AS VARCHAR) || ':'
                     || substr(coalesce(text,''), 1, 64)) AS h
          FROM documents)
        SELECT media_id,
               CAST(400 + ('0x' || substr(h, 9, 2))::BIGINT * 8 AS BIGINT)
                 AS height,
               CAST(8000 AS BIGINT) AS width,
               TRUE AS decode_ok
        FROM m
    """,
    "media_wav_resample": r"""
        WITH m AS (
          SELECT doc_id AS media_id,
                 md5(CAST(doc_id AS VARCHAR) || ':'
                     || substr(coalesce(text,''), 1, 64)) AS h
          FROM documents)
        SELECT media_id,
               CAST((400 + ('0x' || substr(h, 9, 2))::BIGINT * 8) // 2
                 AS BIGINT) AS height,
               CAST(4000 AS BIGINT) AS width,
               TRUE AS resample_ok
        FROM m
    """,
    "media_png_resize": """
        SELECT doc_id AS media_id,
               CAST(32 AS BIGINT) AS height, CAST(32 AS BIGINT) AS width,
               TRUE AS resize_ok
        FROM documents
    """,
    "embedding_curation": _embedding_curation_oracle_sql(),
    "bpe_merges": _bpe_merges_oracle_sql(),
    "media_png_histogram": _mt19937_png_hist_oracle_sql(),
    "media_phash_dedup": _phash_dedup_oracle_sql(),
    "media_features": _media_features_oracle_sql(),
    "link_densest_subgraph": _densest_subgraph_oracle_sql(),
    # recursive-split twin: calibrated fixture fact (same doctrine as
    # top_tokens_approx) — every corpus document is under the 800-char
    # budget, so the splitter's contract at this scale is exactly one
    # pass-through split per doc; a regression that splits or mutates
    # small docs breaks the hash. The multi-level packing paths stay
    # pinned by the paragraph/sentence/window fixtures in pytest.
    "recursive_split": """
        SELECT doc_id, CAST(0 AS BIGINT) AS split_id,
               CAST(length(coalesce(text,'')) AS BIGINT) AS n_chars
        FROM documents
    """,
    "doc_bpe_token_counts": _bpe_token_counts_oracle_sql(),
    # VAD twin: the synthesized WAV tone is a PURE sine (no RNG), so
    # the SQL side regenerates the exact int16 samples (libm sin is
    # bit-identical for the same double argument; astype(int16) is
    # trunc), reframes the integer energies, and re-derives the
    # gaps-and-islands segments. The decode roundtrip is covered: a
    # codec regression changes the samples and breaks the hash.
    "media_vad_segments": r"""
        WITH meta AS (
          SELECT doc_id AS media_id,
                 400 + ('0x' || substr(h, 9, 2))::BIGINT * 8 AS n,
                 100 + ('0x' || substr(h, 11, 2))::BIGINT AS fb
          FROM (SELECT doc_id,
                       md5(CAST(doc_id AS VARCHAR) || ':'
                           || substr(coalesce(text,''), 1, 64)) AS h
                FROM documents)
        ),
        samp AS (
          SELECT m.media_id, CAST(u.t AS BIGINT) AS t,
                 abs(CAST(trunc(10000 * sin(
                   (2 * pi() * m.fb) * u.t / 8000.0)) AS BIGINT))
                   AS a
          FROM meta m, LATERAL (SELECT unnest(range(m.n)) AS t) u
          WHERE u.t < (m.n // 160) * 160
        ),
        energy AS (
          SELECT media_id, t // 160 AS f,
                 CAST(sum(a) // 160 AS BIGINT) AS e
          FROM samp GROUP BY media_id, t // 160
        ),
        act AS (
          SELECT media_id, f, e,
                 f - row_number() OVER (PARTITION BY media_id
                                        ORDER BY f) AS isl
          FROM energy WHERE e > 500
        ),
        segs AS (
          SELECT media_id, min(f) AS start_frame, max(f) + 1 AS end_frame,
                 CAST(trunc(CAST(sum(e) AS DOUBLE) / count(*)) AS BIGINT)
                   AS energy_mean
          FROM act GROUP BY media_id, isl
        )
        SELECT media_id,
               CAST(row_number() OVER (PARTITION BY media_id
                                       ORDER BY start_frame) - 1
                    AS BIGINT) AS seg_id,
               CAST(start_frame AS BIGINT) AS start_frame,
               CAST(end_frame AS BIGINT) AS end_frame,
               energy_mean
        FROM segs
    """,
    "doc_quality_buckets": _quality_buckets_sql(),
    "events_funnel": """
        WITH v AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1
        ),
        c AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
          WHERE e.event_type = 'click' GROUP BY 1
        ),
        p AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
          WHERE e.event_type = 'purchase' GROUP BY 1
        )
        SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        UNION ALL SELECT 'click', CAST(count(*) AS BIGINT) FROM c
        UNION ALL SELECT 'purchase', CAST(count(*) AS BIGINT) FROM p
    """,
    "events_pattern_match": """
        WITH seq AS (
          SELECT user_id,
                 string_agg(
                   CASE event_type
                     WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                     WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                     WHEN 'error' THEN 'e' ELSE 'x' END,
                   '' ORDER BY ts, event_id) AS s,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY user_id
        )
        SELECT user_id, n_events,
               CAST(len(regexp_extract_all(s, 'vc+p')) AS BIGINT) AS n_matches
        FROM seq
    """,
    "events_out_of_order": """
        WITH w AS (
          SELECT user_id, ts,
                 max(ts) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS prev_max
          FROM events
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(*) FILTER (WHERE ts < prev_max) AS BIGINT) AS n_late,
               CAST(coalesce(max(CASE WHEN ts < prev_max
                     THEN epoch_us(prev_max) - epoch_us(ts) END), 0)
                    AS BIGINT) AS max_lateness_us
        FROM w GROUP BY user_id
    """,
    "events_dp_counts": _dp_oracle_sql(),
    "doc_length_batches": """
        WITH r AS (
          SELECT doc_id, n_chars,
                 row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rk
          FROM documents
        )
        SELECT CAST(rk // 64 AS BIGINT) AS batch_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(max(n_chars) AS BIGINT) AS max_len,
               CAST(sum(n_chars) AS BIGINT) AS sum_len,
               CAST(count(*) * max(n_chars) - sum(n_chars) AS BIGINT) AS pad_waste
        FROM r GROUP BY 1
    """,
    "orders_checksum": """
        WITH h AS (
          SELECT md5_number_lower(concat_ws(chr(31),
                   CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
                   o_orderstatus, o_orderpriority)) AS h
          FROM orders
        )
        SELECT CAST(h % 64 AS BIGINT) AS slice,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(h % 2305843009213693951 AS HUGEINT))
                    % 2305843009213693951 AS BIGINT) AS checksum
        FROM h GROUP BY 1
    """,
    "doc_cap_per_source": """
        SELECT source, doc_id FROM (
          SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents
        ) WHERE rn <= 10
    """,
    "events_window_distinct": """
        SELECT event_type,
               (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1, 2
    """,
    "events_cusum": """
        WITH hc AS (
          SELECT event_type,
                 epoch_us(ts) // CAST(3600000000 AS BIGINT) AS hour,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        tot AS (
          SELECT event_type,
                 CAST(sum(c) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM hc GROUP BY 1
        ),
        p AS (
          SELECT h.event_type, h.hour,
                 sum(h.c * t.n - t.s) OVER (
                   PARTITION BY h.event_type ORDER BY h.hour
                 ) AS pf
          FROM hc h JOIN tot t USING (event_type)
        ),
        d AS (
          SELECT event_type, hour,
                 pf - min(pf) OVER (
                   PARTITION BY event_type ORDER BY hour
                 ) AS drawup
          FROM p
        ),
        x AS (
          SELECT event_type, hour, drawup,
                 max(drawup) OVER (PARTITION BY event_type) AS m
          FROM d
        )
        SELECT event_type,
               CAST(max(drawup) AS BIGINT) AS cusum_max,
               CAST(min(hour) FILTER (WHERE drawup = m) AS BIGINT)
                 AS change_bucket
        FROM x GROUP BY event_type
    """,
    "events_skew_profile": """
        WITH k1 AS (
          SELECT CAST(user_id AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1
        ),
        k2 AS (
          SELECT event_type AS k, CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1
        )
        SELECT 'user_id' AS key_col,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(c) AS BIGINT) AS max_cnt,
               CAST(quantile_disc(c, 0.99) AS BIGINT) AS p99_cnt,
               CAST(max(c) * 1000 // sum(c) AS BIGINT) AS top1_share_milli
        FROM k1
        UNION ALL
        SELECT 'event_type', CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(max(c) AS BIGINT), CAST(quantile_disc(c, 0.99) AS BIGINT),
               CAST(max(c) * 1000 // sum(c) AS BIGINT)
        FROM k2
    """,
    "events_zorder": _zorder_oracle_sql(),
    "events_hourly_profile": """
        WITH t AS (
          SELECT CAST(event_id AS BIGINT) AS event_id,
                 CAST(epoch_us(ts) % 86400000000 // 3600000000 AS BIGINT) AS hour,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        )
        SELECT event_id, hour, cents,
               CAST(cents * count(*) OVER w - sum(cents) OVER w AS BIGINT)
                 AS residual_num,
               CAST(count(*) OVER w AS BIGINT) AS cnt_h
        FROM t WINDOW w AS (PARTITION BY hour)
    """,
    "events_stratified_sample": f"""
        WITH r AS (
          SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
                 CAST(((event_id % {_LEHMER_MOD}) * {_LEHMER_MULT})
                      % {_LEHMER_MOD} AS BIGINT) AS rank
          FROM events
        )
        SELECT event_id, event_type, rank FROM r
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY rank, event_id
        ) <= {STRAT_SAMPLE_N}
    """,
    "events_target_encoding": """
        WITH t AS (
          SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        )
        SELECT event_id, event_type, cents,
               CAST(sum(cents) OVER (PARTITION BY event_type) - cents
                    AS BIGINT) AS loo_sum,
               CAST(count(*) OVER (PARTITION BY event_type) - 1
                    AS BIGINT) AS loo_cnt
        FROM t
    """,
    "doc_weighted_sample": f"""
        WITH t AS (
          SELECT doc_id, {_N_TOKENS_SQL} AS n_tokens FROM documents
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens
        FROM t
        WHERE ((doc_id % {_LEHMER_MOD}) * {_LEHMER_MULT}) % {_LEHMER_MOD}
              * {WEIGHTED_SAMPLE_CAP}
              < least(n_tokens, {WEIGHTED_SAMPLE_CAP}) * {_LEHMER_MOD}
    """,
    "customer_k_anon": """
        WITH w AS (
          SELECT c_custkey, c_nationkey, c_mktsegment,
                 count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS cnt
          FROM customer
        )
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
               CASE WHEN cnt < 8 THEN '(suppressed)'
                    ELSE CAST(c_nationkey AS VARCHAR) END AS c_nationkey,
               CASE WHEN cnt < 8 THEN '(suppressed)'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM w
    """,
    "doc_length_drift": """
        WITH s AS (
          SELECT n_chars // 200 AS bucket,
                 CAST(substr(source, 4) AS BIGINT) AS si
          FROM documents
        ),
        ha AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM s
               WHERE si BETWEEN 0 AND 9 GROUP BY 1),
        hb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM s
               WHERE si BETWEEN 10 AND 19 GROUP BY 1),
        na AS (SELECT greatest(1, coalesce(sum(c), 0)) AS n FROM ha),
        nb AS (SELECT greatest(1, coalesce(sum(c), 0)) AS n FROM hb)
        SELECT CAST(coalesce(ha.bucket, hb.bucket) AS BIGINT) AS bucket,
               CAST(coalesce(ha.c, 0) AS BIGINT) AS cnt_a,
               CAST(coalesce(hb.c, 0) AS BIGINT) AS cnt_b,
               CAST(coalesce(ha.c, 0) * 1000 // (SELECT n FROM na) AS BIGINT)
                 AS rate_a_milli,
               CAST(coalesce(hb.c, 0) * 1000 // (SELECT n FROM nb) AS BIGINT)
                 AS rate_b_milli,
               CAST(abs(coalesce(ha.c, 0) * 1000 // (SELECT n FROM na)
                      - coalesce(hb.c, 0) * 1000 // (SELECT n FROM nb))
                    AS BIGINT) AS drift_milli
        FROM ha FULL OUTER JOIN hb ON ha.bucket = hb.bucket
    """,
    "events_zonemap_scan": """
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(user_id AS BIGINT) AS user_id
        FROM events WHERE user_id BETWEEN 40 AND 80
    """,
    "retrieval_hard_negatives": f"""
        SELECT q.vec_id AS query_id, e.vec_id AS neg_id
        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES}) q
        JOIN documents qd ON qd.doc_id = q.vec_id
        CROSS JOIN embeddings e
        JOIN documents ed ON ed.doc_id = e.vec_id
        WHERE e.vec_id <> q.vec_id AND ed.source <> qd.source
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                     e.vec_id ASC
        ) <= {KNN_K}
    """,
    "customer_linkage": """
        SELECT a.c_name AS name_a, b.c_name AS name_b,
               CAST(12
                 + CASE WHEN a.c_nationkey = b.c_nationkey THEN 8 ELSE -3 END
                 + CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 5 ELSE -2 END
                 AS BIGINT) AS score
        FROM customer a JOIN customer b
          ON a.c_name < b.c_name
         AND levenshtein(a.c_name, b.c_name) <= 1
    """,
    "doc_curriculum_shards": f"""
        WITH t AS (
          SELECT doc_id, n_chars, {_N_TOKENS_SQL} AS n_tokens FROM documents
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                       ORDER BY n_chars, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), 0) // 2048 AS BIGINT) AS shard_id
        FROM t
    """,
    "revenue_rollup": """
        SELECT CASE WHEN grouping(c_mktsegment) = 1 THEN '(all)'
                    ELSE c_mktsegment END AS c_mktsegment,
               CASE WHEN grouping(o_orderpriority) = 1 THEN '(all)'
                    ELSE o_orderpriority END AS o_orderpriority,
               CAST(2 - grouping(c_mktsegment) - grouping(o_orderpriority)
                    AS BIGINT) AS lvl,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS total
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY ROLLUP(c_mktsegment, o_orderpriority)
    """,
    "user_top_event": """
        WITH c AS (
          SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2
        ),
        r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
          FROM c
        )
        SELECT CAST(user_id AS BIGINT) AS user_id, event_type, cnt
        FROM r WHERE rn = 1
    """,
    "orders_expectations": """
        WITH raw AS (
          SELECT 'custkey_not_null' AS check_id, 'not_null' AS kind,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violating
          FROM orders
          UNION ALL
          SELECT 'orderkey_unique', 'unique', CAST(count(o_orderkey) AS BIGINT),
                 CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'custkey_unique', 'unique', CAST(count(o_custkey) AS BIGINT),
                 CAST(count(o_custkey) - count(DISTINCT o_custkey) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'totalprice_range', 'range', CAST(count(*) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 400000
                                        THEN 1 ELSE 0 END), 0) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'status_in_set', 'in_set', CAST(count(*) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN o_orderstatus IS NOT NULL
                                         AND o_orderstatus NOT IN ('O', 'F')
                                        THEN 1 ELSE 0 END), 0) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'priority_format', 'regex', CAST(count(*) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN o_orderpriority IS NOT NULL
                                         AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]')
                                        THEN 1 ELSE 0 END), 0) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'lineitem_fk', 'fk', CAST(count(l_orderkey) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN NOT EXISTS (
                          SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
                                        THEN 1 ELSE 0 END), 0) AS BIGINT)
          FROM lineitem l
        )
        SELECT check_id, kind, n_rows, n_violating,
               n_violating = 0 AS ok
        FROM raw
    """,
    "orders_scd2_pit": """
        WITH snaps AS (
          SELECT CAST(o_orderkey AS BIGINT) AS key, CAST(1 AS BIGINT) AS snap,
                 o_orderpriority AS val
          FROM orders
          UNION ALL
          SELECT CAST(o_orderkey AS BIGINT), CAST(2 AS BIGINT),
                 CASE WHEN o_orderkey % 7 = 0 THEN '0-RESTATED'
                      ELSE o_orderpriority END
          FROM orders WHERE o_orderkey % 11 <> 0
          UNION ALL
          SELECT CAST(o_orderkey AS BIGINT), CAST(3 AS BIGINT),
                 CASE WHEN o_orderkey % 5 = 0 THEN '9-FINAL'
                      WHEN o_orderkey % 7 = 0 THEN '0-RESTATED'
                      ELSE o_orderpriority END
          FROM orders WHERE o_orderkey % 13 <> 0
        ),
        flagged AS (
          SELECT key, snap, val,
                 CASE WHEN lag(val) OVER w IS DISTINCT FROM val
                        OR snap - lag(snap) OVER w > 1
                      THEN 1 ELSE 0 END AS chg
          FROM snaps WINDOW w AS (PARTITION BY key ORDER BY snap)
        ),
        grp AS (
          SELECT key, snap, val,
                 sum(chg) OVER (PARTITION BY key ORDER BY snap) AS g
          FROM flagged
        ),
        hist AS (
          SELECT key, val,
                 CAST(min(snap) AS BIGINT) AS valid_from,
                 CAST(max(snap) AS BIGINT) AS valid_to
          FROM grp GROUP BY key, val, g
        ),
        probes AS (
          SELECT CAST(o_orderkey AS BIGINT) AS key,
                 CAST(1 + o_orderkey % 3 AS BIGINT) AS t
          FROM orders
        )
        SELECT p.key, p.t, h.val, h.valid_from, h.valid_to
        FROM probes p JOIN hist h
          ON h.key = p.key AND p.t BETWEEN h.valid_from AND h.valid_to
    """,
    "orders_scd2": """
        WITH snaps AS (
          SELECT CAST(o_orderkey AS BIGINT) AS key, CAST(1 AS BIGINT) AS snap,
                 o_orderpriority AS val
          FROM orders
          UNION ALL
          SELECT CAST(o_orderkey AS BIGINT), CAST(2 AS BIGINT),
                 CASE WHEN o_orderkey % 7 = 0 THEN '0-RESTATED'
                      ELSE o_orderpriority END
          FROM orders WHERE o_orderkey % 11 <> 0
          UNION ALL
          SELECT CAST(o_orderkey AS BIGINT), CAST(3 AS BIGINT),
                 CASE WHEN o_orderkey % 5 = 0 THEN '9-FINAL'
                      WHEN o_orderkey % 7 = 0 THEN '0-RESTATED'
                      ELSE o_orderpriority END
          FROM orders WHERE o_orderkey % 13 <> 0
        ),
        flagged AS (
          SELECT key, snap, val,
                 CASE WHEN lag(val) OVER w IS DISTINCT FROM val
                        OR snap - lag(snap) OVER w > 1
                      THEN 1 ELSE 0 END AS chg
          FROM snaps WINDOW w AS (PARTITION BY key ORDER BY snap)
        ),
        grp AS (
          SELECT key, snap, val,
                 sum(chg) OVER (PARTITION BY key ORDER BY snap) AS g
          FROM flagged
        )
        SELECT key, val,
               CAST(min(snap) AS BIGINT) AS valid_from,
               CAST(max(snap) AS BIGINT) AS valid_to
        FROM grp GROUP BY key, val, g
    """,
    "doc_chars_approx_quantiles": """
        WITH lim AS (
          SELECT CAST(min(n_chars) AS BIGINT) AS lo,
                 CAST(max(n_chars) AS BIGINT) AS hi,
                 CAST(count(*) AS BIGINT) AS n
          FROM documents
        ),
        b AS (
          SELECT ((n_chars - lo) * 1000) // (hi - lo + 1) AS bin,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM documents, lim GROUP BY 1
        ),
        c AS (
          SELECT bin, CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum
          FROM b
        ),
        qs AS (
          SELECT unnest([250, 500, 750, 900, 990]) AS q_milli
        ),
        ans AS (
          SELECT q.q_milli,
                 CAST(min(c.bin) AS BIGINT) AS bin
          FROM qs q JOIN c
            ON c.cum >= (q.q_milli * (SELECT n FROM lim) + 999) // 1000
          GROUP BY 1
        )
        SELECT q_milli, bin,
               (SELECT lo FROM lim)
                 + bin * ((SELECT hi FROM lim) - (SELECT lo FROM lim) + 1) // 1000
                 AS approx_value
        FROM ans
    """,
    "doc_importance": """
        WITH toks AS (
          SELECT doc_id, lang,
                 unnest(regexp_extract_all(lower(coalesce(text,'')), '\\w+'))
                   AS token
          FROM documents
        ),
        raw AS (
          SELECT token, CAST(count(*) AS BIGINT) AS cr FROM toks GROUP BY 1
        ),
        tgt AS (
          SELECT token, CAST(count(*) AS BIGINT) AS ct
          FROM toks WHERE lang = 'en' GROUP BY 1
        ),
        w AS (
          SELECT r.token,
                 (1000000 * (COALESCE(t.ct, 0) + 1)) // (r.cr + 1) AS w
          FROM raw r LEFT JOIN tgt t ON r.token = t.token
        ),
        scored AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(w.w) AS BIGINT) AS score
          FROM toks JOIN w ON toks.token = w.token
          GROUP BY 1
        )
        SELECT doc_id, n_tokens, score // n_tokens AS imp_per_token
        FROM scored
    """,
    "lineitem_fd_audit": """
        WITH fd1 AS (
          SELECT l_orderkey AS k, count(DISTINCT l_returnflag) AS d
          FROM lineitem GROUP BY 1
        ),
        fd2 AS (
          SELECT l_partkey AS k, count(DISTINCT l_suppkey) AS d
          FROM lineitem GROUP BY 1
        ),
        fd3 AS (
          SELECT l_orderkey AS k, count(DISTINCT l_linestatus) AS d
          FROM lineitem GROUP BY 1
        )
        SELECT 'l_orderkey' AS lhs, 'l_returnflag' AS rhs,
               CAST(count(*) AS BIGINT) AS n_keys,
               count(*) FILTER (WHERE d > 1) AS n_violating FROM fd1
        UNION ALL
        SELECT 'l_partkey', 'l_suppkey', CAST(count(*) AS BIGINT),
               count(*) FILTER (WHERE d > 1) FROM fd2
        UNION ALL
        SELECT 'l_orderkey', 'l_linestatus', CAST(count(*) AS BIGINT),
               count(*) FILTER (WHERE d > 1) FROM fd3
    """,
    "customer_rfm": """
        WITH m AS (
          SELECT o_custkey,
                 max(epoch_us(o_orderdate)) AS last_us,
                 count(*) AS n_orders,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
          FROM orders GROUP BY 1
        ),
        s AS (
          SELECT *,
            1 + least(4, (5 * (count(*) OVER (ORDER BY last_us) - 1))
                         // count(*) OVER ()) AS r,
            1 + least(4, (5 * (count(*) OVER (ORDER BY n_orders) - 1))
                         // count(*) OVER ()) AS f,
            1 + least(4, (5 * (count(*) OVER (ORDER BY monetary_cents) - 1))
                         // count(*) OVER ()) AS mm
          FROM m
        )
        SELECT o_custkey, last_us, CAST(n_orders AS BIGINT) AS n_orders,
               monetary_cents,
               CAST(r AS BIGINT) AS r_score, CAST(f AS BIGINT) AS f_score,
               CAST(mm AS BIGINT) AS m_score,
               CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(mm AS VARCHAR)
                 AS segment
        FROM s
    """,
    "events_retention": """
        WITH up AS (
          SELECT DISTINCT user_id AS u, epoch_us(ts) // 604800000000 AS p
          FROM events
        ),
        c AS (SELECT u, min(p) AS cohort_p FROM up GROUP BY u)
        SELECT c.cohort_p * 604800000000 AS cohort_start_us,
               up.p - c.cohort_p AS period_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM up JOIN c USING (u)
        GROUP BY 1, 2
    """,
    "events_hourly_gapfill": """
        WITH b AS (
          SELECT (epoch_us(ts) // 3600000000) AS h, count(*) AS n
          FROM events GROUP BY 1
        ),
        lim AS (SELECT min(h) AS lo, max(h) AS hi FROM b),
        spine AS (
          -- range() rejects subquery params; the scalar generate_series
          -- (list) + lateral unnest accepts column arguments
          SELECT u.h
          FROM lim, LATERAL (SELECT unnest(generate_series(lim.lo, lim.hi)) AS h) u
        )
        SELECT spine.h * 3600000000 AS bucket_start_us,
               CAST(coalesce(b.n, 0) AS BIGINT) AS n_events
        FROM spine LEFT JOIN b USING (h)
    """,
    "doc_token_percentile": f"""
        WITH t AS (SELECT doc_id, {_N_TOKENS_SQL} AS n_tokens FROM documents)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST((count(*) OVER (ORDER BY n_tokens) * 1000)
                    // (SELECT count(*) FROM t) AS BIGINT) AS pct_milli
        FROM t
    """,
    "doc_nfc_normalize": """
        SELECT doc_id,
               md5(nfc_normalize(coalesce(text, ''))) AS norm_md5,
               CAST(CASE WHEN nfc_normalize(coalesce(text, '')) = coalesce(text, '')
                         THEN 0 ELSE 1 END AS BIGINT) AS changed
        FROM documents
    """,
    "token_postings": """
        WITH pairs AS (
          SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(coalesce(text,'')), '\\w+')) AS token
            FROM documents
          )
        )
        SELECT token, CAST(count(*) AS BIGINT) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        FROM pairs GROUP BY token HAVING count(*) >= 5
    """,
    "graph_components": """
        WITH RECURSIVE base AS (
          SELECT 'c' || CAST(c_custkey AS VARCHAR) AS src,
                 'n' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
          UNION ALL
          SELECT 'n' || CAST(n_nationkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR) FROM nation
        ),
        und AS (SELECT src, dst FROM base UNION SELECT dst, src FROM base),
        reach AS (
          SELECT src AS entity, src AS r FROM und
          UNION
          SELECT reach.entity, u.dst FROM reach JOIN und u ON u.src = reach.r
        )
        SELECT entity, min(r) AS component FROM reach GROUP BY entity
    """,
    "unshipped_revenue": """
        WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        o AS (
          SELECT o_orderkey, o_orderdate, o_orderpriority
          FROM orders JOIN b ON o_custkey = b.c_custkey
          WHERE o_orderdate < TIMESTAMP '1998-01-01'
        ),
        l AS (
          SELECT l_orderkey,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
          FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01'
        )
        SELECT l.l_orderkey,
               CAST(sum(rev) AS BIGINT) AS revenue_e4,
               CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_us,
               o.o_orderpriority
        FROM l JOIN o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 3, 4
        ORDER BY revenue_e4 DESC, o_orderdate_us ASC, l_orderkey ASC
        LIMIT 10
    """,
    "region_revenue": """
        SELECT r_name,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                   AS revenue_e4,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY r_name
    """,
    "source_top_terms": """
        WITH c AS (
          SELECT source, token, count(*) AS n FROM (
            SELECT source,
                   unnest(regexp_extract_all(lower(coalesce(text,'')), '\\w+')) AS token
            FROM documents
          ) GROUP BY source, token
        )
        SELECT source, token, n FROM (
          SELECT source, token, n,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n DESC, token ASC) AS rn
          FROM c
        ) WHERE rn <= 10
    """,
    "doc_vocab": """
        WITH c AS (
          SELECT token, count(*) AS n FROM (
            SELECT unnest(regexp_extract_all(lower(coalesce(text,'')), '\\w+')) AS token
            FROM documents
          ) GROUP BY token HAVING count(*) >= 5
        )
        SELECT token, n,
               row_number() OVER (ORDER BY n DESC, token ASC) AS vocab_id
        FROM c
    """,
    "top_tokens": """
        SELECT token, count(*) AS n FROM (
            SELECT unnest(regexp_extract_all(lower(coalesce(text,'')), '\\w+')) AS token
            FROM documents
        ) GROUP BY token ORDER BY n DESC, token ASC LIMIT 50
    """,
    "events_sessionize": """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM events
        ),
        sess AS (
          SELECT user_id,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM marked
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    "top_event_per_user": """
        SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS value_cents
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id
            ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id ASC
        ) = 1
    """,
    "events_lag": """
        SELECT event_id,
               coalesce(lag(event_id) OVER w, -1) AS prev_event_id,
               coalesce(CAST(date_diff('microseconds', lag(ts) OVER w, ts) AS BIGINT), -1) AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "events_asof_purchase": """
        SELECT l.event_id,
               CAST(coalesce((
                 SELECT r.event_id FROM events r
                 WHERE r.event_type = 'purchase'
                   AND r.user_id = l.user_id AND r.ts <= l.ts
                 ORDER BY r.ts DESC, r.event_id DESC LIMIT 1
               ), -1) AS BIGINT) AS matched_id
        FROM events l
    """,
    "orders_ship_window": """
        SELECT CAST(o.o_orderkey AS BIGINT) AS rid,
               CAST(count(*) AS BIGINT) AS n
        FROM orders o
        JOIN lineitem l
          ON l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
        GROUP BY o.o_orderkey
    """,
    "events_running_total": """
        SELECT event_id,
               CAST(SUM(CAST(round(value * 100) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS BIGINT) AS cum_cents
        FROM events
    """,
    "events_sample_per_type": """
        SELECT event_type, event_id FROM (
          SELECT event_type, event_id,
                 row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY (event_id * 48271) % 2147483647, event_id
                 ) AS rn
          FROM events
        ) WHERE rn <= 20
    """,
    "orders_semi_lineitem": """
        SELECT o.o_orderpriority AS o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
        )
        GROUP BY o.o_orderpriority
    """,
    "distinct_users": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "three_way_join": """
        SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, o.o_orderpriority
    """,
    "supplier_region": """
        SELECT r.r_name,
               CAST(sum(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents,
               count(*) AS n_suppliers
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "part_type_stats": """
        SELECT p_brand,
               count(*) AS n_parts,
               CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
               CAST(min(p_size) AS BIGINT) AS min_size,
               CAST(max(p_size) AS BIGINT) AS max_size
        FROM part GROUP BY p_brand
    """,
    "orders_dates": """
        SELECT o_orderpriority,
               min(o_orderdate) AS first_date,
               max(o_orderdate) AS last_date,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
    "pagerank": _pagerank_oracle_sql(),
    "link_pagerank": _pagerank_oracle_sql(
        edges_body="""
          SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS src,
                 'https://example.org/doc/' ||
                 CAST((doc_id * 131 + i * 31) % 997 AS VARCHAR) AS dst
          FROM documents,
               UNNEST([CAST(0 AS BIGINT), CAST(1 AS BIGINT),
                       CAST(2 AS BIGINT)]) AS u(i)
          UNION ALL
          SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR),
                 'https://ext' || CAST(doc_id % 13 AS VARCHAR) ||
                 '.example.com/x'
          FROM documents
"""
    ),
    "graph_katz": _katz_oracle_sql(),
    "part_tree_rollup": """
        WITH RECURSIVE anc AS (
          SELECT CAST(p_partkey AS BIGINT) AS node,
                 CAST(p_partkey // 10 AS BIGINT) AS anc
          FROM part WHERE p_partkey >= 10
          UNION ALL
          SELECT a.node, a.anc // 10 FROM anc a WHERE a.anc >= 10
        ),
        vals AS (
          SELECT CAST(p_partkey AS BIGINT) AS node,
                 CAST(round(p_retailprice * 100) AS BIGINT) AS cents
          FROM part
        ),
        contrib AS (
          SELECT a.anc AS node, v.cents FROM anc a JOIN vals v ON a.node = v.node
          UNION ALL
          SELECT node, cents FROM vals
        )
        SELECT node, CAST(sum(cents) AS BIGINT) AS subtree_value
        FROM contrib GROUP BY node
    """,
    "ppr": _ppr_oracle_sql(),
    "khop_region": """
        WITH edges AS (
          SELECT 'c' || CAST(c_custkey AS VARCHAR) AS src,
                 'n' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
          UNION ALL
          SELECT 'n' || CAST(n_nationkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR) FROM nation
        ),
        und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
        h0 AS (SELECT 'r0' AS entity),
        h1 AS (
          SELECT DISTINCT u.dst AS entity FROM und u JOIN h0 ON u.src = h0.entity
          WHERE u.dst NOT IN (SELECT entity FROM h0)
        ),
        h2 AS (
          SELECT DISTINCT u.dst AS entity FROM und u JOIN h1 ON u.src = h1.entity
          WHERE u.dst NOT IN (SELECT entity FROM h0)
            AND u.dst NOT IN (SELECT entity FROM h1)
        )
        SELECT entity, CAST(0 AS BIGINT) AS hop FROM h0
        UNION ALL SELECT entity, CAST(1 AS BIGINT) FROM h1
        UNION ALL SELECT entity, CAST(2 AS BIGINT) FROM h2
    """,
    "events_rollup": """
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(epoch_us(date_trunc('hour', ts)), 0) AS window_start_us,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events
        GROUP BY ROLLUP(event_type, date_trunc('hour', ts))
    """,
    "events_sliding_window": f"""
        SELECT (epoch_us(ts) // {_W15_US}) * {_W15_US} - ks.k * {_W15_US} AS window_start_us,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events
        CROSS JOIN (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS k) ks
        GROUP BY 1
    """,
    "events_quantiles": """
        WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events)
        SELECT CAST(0.5 AS DOUBLE) AS q, CAST(quantile_disc(v, 0.5) AS BIGINT) AS value_cents FROM c
        UNION ALL
        SELECT CAST(0.9 AS DOUBLE), CAST(quantile_disc(v, 0.9) AS BIGINT) FROM c
        UNION ALL
        SELECT CAST(0.99 AS DOUBLE), CAST(quantile_disc(v, 0.99) AS BIGINT) FROM c
    """,
    "customers_without_orders": """
        SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        GROUP BY c.c_mktsegment
    """,
    "customer_order_counts": """
        SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
               c.c_mktsegment AS c_mktsegment,
               CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
        FROM customer c
        LEFT JOIN (
          SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
        ) o ON o.o_custkey = c.c_custkey
    """,
    "ngram_overlap_pairs": """
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')), '\\w+') AS ws
          FROM documents
        ),
        grams AS (
          SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
          FROM toks, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
          WHERE len(ws) >= 3
          UNION
          SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
          FROM toks WHERE len(ws) > 0 AND len(ws) < 3
        ),
        kept AS (
          SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) <= 50
        ),
        fgrams AS (SELECT doc_id, g FROM grams WHERE g IN (SELECT g FROM kept)),
        doc_sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
        pair_common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
          FROM fgrams a JOIN fgrams b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT p.id_a, p.id_b, p.n_common,
               sa.n_grams + sb.n_grams - p.n_common AS n_union
        FROM pair_common p
        JOIN doc_sizes sa ON p.id_a = sa.doc_id
        JOIN doc_sizes sb ON p.id_b = sb.doc_id
        WHERE 2 * p.n_common >= sa.n_grams + sb.n_grams - p.n_common
    """,
    "graph_triangles": _CNRS_EDGES_SQL + """,
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1
          JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri
        ) GROUP BY node
    """,
    "graph_bipartite": """
        WITH RECURSIVE und0 AS (
          SELECT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                 'o' || CAST(o_orderkey AS VARCHAR) AS b FROM orders
          UNION ALL
          SELECT 's' || CAST(s_suppkey AS VARCHAR),
                 'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
          UNION ALL
          SELECT 's' || CAST(s.s_suppkey AS VARCHAR),
                 'r' || CAST(n.n_regionkey AS VARCHAR)
          FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
          UNION ALL
          SELECT 'n' || CAST(n_nationkey AS VARCHAR),
                 'r' || CAST(n_regionkey AS VARCHAR) FROM nation
        ),
        und AS (
          SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
          FROM und0 WHERE a <> b
        ),
        adj AS (
          SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
        ),
        nodes AS (SELECT DISTINCT u FROM adj),
        reach(u, l) AS (
          SELECT u, u FROM nodes
          UNION
          SELECT a.v, r.l FROM reach r JOIN adj a ON a.u = r.u
        ),
        comp AS (SELECT u AS entity, min(l) AS component FROM reach GROUP BY u),
        st(entity, parity, comp) AS (
          SELECT entity, 0, entity FROM comp WHERE entity = component
          UNION
          SELECT a.v, 1 - s.parity, s.comp
          FROM st s JOIN adj a ON a.u = s.entity
        ),
        sides AS (
          SELECT comp, entity,
                 CAST(min(parity) AS BIGINT) AS side,
                 min(parity) <> max(parity) AS conflict
          FROM st GROUP BY comp, entity
        ),
        flags AS (SELECT comp, bool_or(conflict) AS odd FROM sides GROUP BY comp)
        SELECT s.entity, s.comp AS component,
               CAST(CASE WHEN f.odd THEN -1 ELSE s.side END AS BIGINT) AS side,
               NOT f.odd AS is_bipartite
        FROM sides s JOIN flags f ON s.comp = f.comp
    """,
    "temporal_reach": """
        WITH RECURSIVE te AS (
          SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                 'p' || CAST(l_partkey AS VARCHAR) AS dst,
                 epoch_us(l_shipdate) AS t FROM lineitem
          UNION ALL
          SELECT 'p' || CAST(l_partkey AS VARCHAR),
                 's' || CAST(l_suppkey AS VARCHAR),
                 epoch_us(l_shipdate) FROM lineitem
        ),
        reach(node, at) AS (
          SELECT 's' || CAST(s_suppkey AS VARCHAR), CAST(0 AS BIGINT)
          FROM supplier WHERE s_suppkey <= 3
          UNION
          SELECT e.dst, e.t FROM reach r
          JOIN te e ON e.src = r.node AND e.t >= r.at
        )
        SELECT node AS entity, min(at) AS arrival FROM reach GROUP BY node
    """,
    "supplier_negatives": """
        WITH ls AS (SELECT DISTINCT l_suppkey AS s FROM lineitem),
        pm AS (SELECT max(p_partkey) AS pmax FROM part),
        cand0 AS (
          SELECT ls.s AS lkey,
                 CAST(1 + (2654435761 * ls.s + 40503 * t.j) % pm.pmax
                      AS BIGINT) AS rkey,
                 CAST(t.j AS BIGINT) AS j
          FROM ls, pm, LATERAL unnest(generate_series(1, 8)) AS t(j)
        ),
        cand AS (
          SELECT lkey, rkey, min(j) AS j FROM cand0 GROUP BY lkey, rkey
        ),
        e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem)
        SELECT c.lkey, c.rkey, c.j
        FROM cand c LEFT JOIN e ON e.s = c.lkey AND e.p = c.rkey
        WHERE e.s IS NULL
        QUALIFY row_number() OVER (
          PARTITION BY c.lkey ORDER BY c.j ASC
        ) <= 3
    """,
    "weighted_sssp": """
        WITH RECURSIVE we AS (
          SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                 'p' || CAST(l_partkey AS VARCHAR) AS dst,
                 CAST(l_linenumber AS BIGINT) AS w FROM lineitem
          UNION ALL
          SELECT 'p' || CAST(l_partkey AS VARCHAR),
                 's' || CAST(l_suppkey AS VARCHAR),
                 CAST(l_linenumber AS BIGINT) FROM lineitem
        ),
        reach(node, d) AS (
          SELECT 's' || CAST(s_suppkey AS VARCHAR), CAST(0 AS BIGINT)
          FROM supplier WHERE s_suppkey <= 3
          UNION
          SELECT e.dst, r.d + e.w FROM reach r
          JOIN we e ON e.src = r.node
          WHERE r.d + e.w <= 6
        )
        SELECT node AS entity, min(d) AS dist FROM reach GROUP BY node
    """,
    "part_rules": """
        WITH oi AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ),
        pr AS (
          SELECT a.p AS p1, b.p AS p2, count(*) AS s
          FROM oi a JOIN oi b ON b.o = a.o AND b.p > a.p
          GROUP BY 1, 2
        ),
        tr AS (
          SELECT a.p AS p1, b.p AS p2, c.p AS p3, count(*) AS s
          FROM oi a
          JOIN oi b ON b.o = a.o AND b.p > a.p
          JOIN oi c ON c.o = a.o AND c.p > b.p
          GROUP BY 1, 2, 3
          HAVING count(*) >= 2
        )
        SELECT t.p1 AS ant_a, t.p2 AS ant_b, t.p3 AS cons,
               CAST(t.s AS BIGINT) AS support,
               CAST(t.s * 1000 // p.s AS BIGINT) AS conf_milli
        FROM tr t JOIN pr p ON p.p1 = t.p1 AND p.p2 = t.p2
        UNION ALL
        SELECT t.p1, t.p3, t.p2, CAST(t.s AS BIGINT),
               CAST(t.s * 1000 // p.s AS BIGINT)
        FROM tr t JOIN pr p ON p.p1 = t.p1 AND p.p2 = t.p3
        UNION ALL
        SELECT t.p2, t.p3, t.p1, CAST(t.s AS BIGINT),
               CAST(t.s * 1000 // p.s AS BIGINT)
        FROM tr t JOIN pr p ON p.p1 = t.p2 AND p.p2 = t.p3
    """,
    "doc_vocab_growth": """
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text,'')), '\\w+'))
                   AS token
          FROM documents
        ),
        f AS (SELECT token, min(doc_id) AS fd FROM tok GROUP BY token),
        cuts AS (
          SELECT CAST((SELECT max(doc_id) FROM documents) * p // 100
                      AS BIGINT) AS threshold
          FROM (SELECT unnest([10, 25, 50, 100]) AS p)
        )
        SELECT c.threshold,
               (SELECT count(*) FROM f WHERE f.fd <= c.threshold) AS n_distinct
        FROM cuts c
    """,
    "part_frequent_triples": """
        WITH oi AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        )
        SELECT a.p AS item_a, b.p AS item_b, c.p AS item_c,
               CAST(count(*) AS BIGINT) AS support
        FROM oi a
        JOIN oi b ON b.o = a.o AND b.p > a.p
        JOIN oi c ON c.o = a.o AND c.p > b.p
        GROUP BY 1, 2, 3
        HAVING count(*) >= 2
    """,
    "graph_double_sweep": _CNRS_EDGES_SQL.replace(
        "WITH base", "WITH RECURSIVE base"
    ) + """,
        sym AS (
          SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und
        ),
        start AS (
          SELECT min(node) AS s FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
          )
        ),
        bfs1(entity, hop) AS (
          SELECT s, 0 FROM start
          UNION
          SELECT y.dst, b.hop + 1 FROM bfs1 b JOIN sym y ON y.src = b.entity
          WHERE b.hop < 20
        ),
        md1 AS (SELECT entity, min(hop) AS d FROM bfs1 GROUP BY entity),
        f1 AS (SELECT entity, d FROM md1 ORDER BY d DESC, entity ASC LIMIT 1),
        bfs2(entity, hop) AS (
          SELECT entity, 0 FROM f1
          UNION
          SELECT y.dst, b.hop + 1 FROM bfs2 b JOIN sym y ON y.src = b.entity
          WHERE b.hop < 20
        ),
        md2 AS (SELECT entity, min(hop) AS d FROM bfs2 GROUP BY entity),
        f2 AS (SELECT entity, d FROM md2 ORDER BY d DESC, entity ASC LIMIT 1)
        SELECT start.s AS start, f1.entity AS far1, CAST(f1.d AS BIGINT) AS ecc1,
               f2.entity AS far2, CAST(f2.d AS BIGINT) AS ecc2
        FROM start, f1, f2
    """,
    "orders_rrf": """
        WITH r AS (
          SELECT CAST(o_custkey AS VARCHAR) AS cust,
                 CAST(o_orderkey AS VARCHAR) AS order_id,
                 row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                            o_orderkey ASC
                 ) AS ra,
                 row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey ASC
                 ) AS rb
          FROM orders
        ),
        f AS (
          SELECT cust, order_id,
                 CAST(1000000 // (60 + ra) + 1000000 // (60 + rb)
                      AS BIGINT) AS rrf_scaled
          FROM r
        )
        SELECT cust, order_id, rrf_scaled FROM f
        QUALIFY row_number() OVER (
          PARTITION BY cust ORDER BY rrf_scaled DESC, order_id ASC
        ) <= 3
    """,
    "threshold_components": """
        WITH RECURSIVE pw AS (
          SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS x,
                 'o' || CAST(o.o_orderkey AS VARCHAR) AS y,
                 count(*) AS w
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        ),
        und AS (
          SELECT least(x, y) AS a, greatest(x, y) AS b, w
          FROM pw WHERE x <> y
        ),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
          )
        ),
        adj1 AS (
          SELECT a AS u, b AS v FROM und WHERE w >= 1
          UNION ALL SELECT b, a FROM und WHERE w >= 1
        ),
        reach1(u, l) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM adj1)
          UNION SELECT a.v, r.l FROM reach1 r JOIN adj1 a ON a.u = r.u
        ),
        comp1 AS (SELECT u, min(l) AS comp FROM reach1 GROUP BY u),
        adj3 AS (
          SELECT a AS u, b AS v FROM und WHERE w >= 3
          UNION ALL SELECT b, a FROM und WHERE w >= 3
        ),
        reach3(u, l) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM adj3)
          UNION SELECT a.v, r.l FROM reach3 r JOIN adj3 a ON a.u = r.u
        ),
        comp3 AS (SELECT u, min(l) AS comp FROM reach3 GROUP BY u),
        adj5 AS (
          SELECT a AS u, b AS v FROM und WHERE w >= 5
          UNION ALL SELECT b, a FROM und WHERE w >= 5
        ),
        reach5(u, l) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM adj5)
          UNION SELECT a.v, r.l FROM reach5 r JOIN adj5 a ON a.u = r.u
        ),
        comp5 AS (SELECT u, min(l) AS comp FROM reach5 GROUP BY u)
        SELECT CAST(1 AS BIGINT) AS tau,
               (SELECT count(*) FROM nodes) AS n_nodes,
               (SELECT count(DISTINCT comp) FROM comp1)
               + (SELECT count(*) FROM nodes
                  WHERE node NOT IN (SELECT u FROM comp1)) AS n_components
        UNION ALL
        SELECT 3, (SELECT count(*) FROM nodes),
               (SELECT count(DISTINCT comp) FROM comp3)
               + (SELECT count(*) FROM nodes
                  WHERE node NOT IN (SELECT u FROM comp3))
        UNION ALL
        SELECT 5, (SELECT count(*) FROM nodes),
               (SELECT count(DISTINCT comp) FROM comp5)
               + (SELECT count(*) FROM nodes
                  WHERE node NOT IN (SELECT u FROM comp5))
    """,
    "graph_rich_club": _CNRS_EDGES_SQL + """,
        deg AS (
          SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
          ) GROUP BY node
        ),
        ks AS (SELECT unnest([1, 2, 4, 8, 16]) AS k),
        j AS (
          SELECT least(da.deg, db.deg) AS mind
          FROM und JOIN deg da ON da.node = und.a
                   JOIN deg db ON db.node = und.b
        )
        SELECT CAST(ks.k AS BIGINT) AS k,
               CAST((SELECT count(*) FROM deg WHERE deg.deg > ks.k)
                    AS BIGINT) AS n_nodes,
               CAST((SELECT count(*) FROM j WHERE j.mind > ks.k)
                    AS BIGINT) AS n_edges
        FROM ks
    """,
    "graph_assortativity": _CNRS_EDGES_SQL + """,
        deg AS (
          SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
          ) GROUP BY node
        ),
        j AS (
          SELECT da.deg AS du, db.deg AS dv
          FROM und JOIN deg da ON da.node = und.a
                   JOIN deg db ON db.node = und.b
        )
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(du + dv) AS BIGINT) AS s_sum,
               CAST(sum(du * dv) AS BIGINT) AS s_prod,
               CAST(sum(du * du + dv * dv) AS BIGINT) AS s_sq
        FROM j
    """,
    "kcenter_coreset": """
        WITH q AS (
          SELECT vec_id, i,
                 CAST(floor(embedding[i] * 1048576.0) AS BIGINT) AS qv
          FROM embeddings,
               LATERAL unnest(generate_series(
                 1, CAST(len(embedding) AS BIGINT))) AS u(i)
        ),
        c0 AS (SELECT min(vec_id) AS cid FROM embeddings),
        d1 AS (
          SELECT a.vec_id, sum((a.qv - b.qv) * (a.qv - b.qv)) AS md
          FROM q a JOIN c0 ON TRUE JOIN q b ON b.vec_id = c0.cid AND a.i = b.i
          GROUP BY a.vec_id
        ),
        c1 AS (SELECT vec_id AS cid, md FROM d1
               ORDER BY md DESC, vec_id ASC LIMIT 1),
        d2 AS (
          SELECT a.vec_id,
                 least(any_value(d1.md),
                       sum((a.qv - b.qv) * (a.qv - b.qv))) AS md
          FROM q a JOIN c1 ON TRUE JOIN q b ON b.vec_id = c1.cid AND a.i = b.i
               JOIN d1 ON d1.vec_id = a.vec_id
          GROUP BY a.vec_id
        ),
        c2 AS (SELECT vec_id AS cid, md FROM d2
               ORDER BY md DESC, vec_id ASC LIMIT 1),
        d3 AS (
          SELECT a.vec_id,
                 least(any_value(d2.md),
                       sum((a.qv - b.qv) * (a.qv - b.qv))) AS md
          FROM q a JOIN c2 ON TRUE JOIN q b ON b.vec_id = c2.cid AND a.i = b.i
               JOIN d2 ON d2.vec_id = a.vec_id
          GROUP BY a.vec_id
        ),
        c3 AS (SELECT vec_id AS cid, md FROM d3
               ORDER BY md DESC, vec_id ASC LIMIT 1),
        d4 AS (
          SELECT a.vec_id,
                 least(any_value(d3.md),
                       sum((a.qv - b.qv) * (a.qv - b.qv))) AS md
          FROM q a JOIN c3 ON TRUE JOIN q b ON b.vec_id = c3.cid AND a.i = b.i
               JOIN d3 ON d3.vec_id = a.vec_id
          GROUP BY a.vec_id
        ),
        c4 AS (SELECT vec_id AS cid, md FROM d4
               ORDER BY md DESC, vec_id ASC LIMIT 1)
        SELECT CAST(0 AS BIGINT) AS rnk, cid AS vec_id,
               CAST(0 AS BIGINT) AS sel_dist FROM c0
        UNION ALL SELECT 1, cid, CAST(md AS BIGINT) FROM c1
        UNION ALL SELECT 2, cid, CAST(md AS BIGINT) FROM c2
        UNION ALL SELECT 3, cid, CAST(md AS BIGINT) FROM c3
        UNION ALL SELECT 4, cid, CAST(md AS BIGINT) FROM c4
    """,
    "doc_heavy_tokens": """
        WITH toks AS (
          SELECT unnest(regexp_extract_all(lower(coalesce(text,'')), '\\w+')) AS value
          FROM documents
        )
        SELECT value, count(*) AS cnt FROM toks GROUP BY value
        HAVING count(*) * 500 >= (SELECT count(*) FROM toks)
    """,
    "graph_edge_support": _CNRS_EDGES_SQL + """,
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1
          JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        sup AS (
          SELECT a, b, count(*) AS s FROM (
            SELECT x AS a, y AS b FROM tri
            UNION ALL SELECT x, z FROM tri
            UNION ALL SELECT y, z FROM tri
          ) GROUP BY a, b
        )
        SELECT und.a, und.b,
               CAST(coalesce(sup.s, 0) AS BIGINT) AS support
        FROM und LEFT JOIN sup ON und.a = sup.a AND und.b = sup.b
    """,
    "graph_link_pred": _CNRS_EDGES_SQL + """,
        adj AS (
          SELECT a AS u, b AS v FROM und
          UNION ALL SELECT b, a FROM und
        ),
        deg AS (
          SELECT u AS w, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u
        ),
        pairs AS (
          SELECT a1.v AS x, a2.v AS y,
                 CAST(sum(1000000 // deg.d) AS BIGINT) AS score
          FROM adj a1
          JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v
          JOIN deg ON deg.w = a1.u
          GROUP BY 1, 2
        )
        SELECT p.x, p.y, p.score
        FROM pairs p LEFT JOIN und ON p.x = und.a AND p.y = und.b
        WHERE und.a IS NULL AND p.score > 0
        QUALIFY row_number() OVER (ORDER BY p.score DESC, p.x, p.y) <= 100
    """,
    "clean_triples": r"""
        -- 7-step cleaner twin over the deterministic dirty corpus
        -- (_dirty_corpus_from_docs). Planted rows that can NEVER
        -- survive are omitted: the i%3 case-variant dedups against
        -- (or drops with) its base under identical case-insensitive
        -- rules, and the i%7 trio dies to short/null filters; the
        -- rest is the literal rule set: first-8 pure-alpha tokens,
        -- len>=3, the clean_graph noise regex, the is->is_a merge,
        -- first-occurrence dedup by (chunk, record order), and the
        -- min_pred_count=2 singleton filter.
        WITH wl AS (
          SELECT doc_id, string_split(lower(coalesce(text,'')), ' ') AS l
          FROM documents
        ),
        w AS (
          SELECT doc_id, unnest(l) AS word, unnest(range(1, len(l)+1)) AS i
          FROM wl
        ),
        alpha AS (
          SELECT doc_id, word,
                 row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
          FROM w WHERE regexp_matches(word, '^[a-z]+$')
        ),
        tok8 AS (SELECT doc_id, word, j FROM alpha WHERE j <= 8),
        nt AS (SELECT doc_id, count(*) AS n FROM tok8 GROUP BY doc_id),
        base AS (
          SELECT t.doc_id,
                 max(CASE WHEN j=1 THEN word END) AS t0,
                 max(CASE WHEN j=2 THEN word END) AS t1,
                 max(CASE WHEN j=3 THEN word END) AS t2,
                 max(CASE WHEN j=4 THEN word END) AS t3,
                 max(CASE WHEN j=5 THEN word END) AS t4
          FROM tok8 t JOIN nt ON nt.doc_id = t.doc_id AND nt.n >= 4
          GROUP BY t.doc_id
        ),
        recs AS (
          SELECT doc_id, t0 AS s, 'is_a' AS p, t1 AS o, 0 AS ord FROM base
          UNION ALL SELECT doc_id, t2, 'contains', t2, 2 FROM base
                    WHERE doc_id % 5 = 0
          UNION ALL SELECT doc_id, t2, 'contains', t3, 3 FROM base
                    WHERE doc_id % 5 = 0
          UNION ALL SELECT doc_id, t2, 'contains', t4, 4 FROM base
                    WHERE doc_id % 5 = 0 AND t4 IS NOT NULL
        ),
        kept AS (
          SELECT * FROM recs
          WHERE length(s) >= 3 AND length(o) >= 3
            AND NOT regexp_matches(s, '^(i|we|they|it|he|she|you|this|that|these|those|there|here)$|^(the|a|an|of|in|on|at|to|for|with|and|or|but|not)$|^\d+$|^[.\-_/\\\\]+$|^(file|page|line|section|chapter|part|item|example|note)$')
            AND NOT regexp_matches(o, '^(i|we|they|it|he|she|you|this|that|these|those|there|here)$|^(the|a|an|of|in|on|at|to|for|with|and|or|but|not)$|^\d+$|^[.\-_/\\\\]+$|^(file|page|line|section|chapter|part|item|example|note)$')
        ),
        dd AS (
          SELECT doc_id, s, p, o FROM (
            SELECT *, row_number() OVER (
              PARTITION BY s || chr(1) || p || chr(1) || o
              ORDER BY doc_id, ord) AS rn
            FROM kept) WHERE rn = 1
        ),
        pcnt AS (SELECT p, count(*) AS c FROM dd GROUP BY p)
        SELECT s AS subject, p AS predicate, o AS object,
               CAST(dd.doc_id AS BIGINT) AS chunk
        FROM dd JOIN pcnt USING (p) WHERE pcnt.c >= 2
    """,
    "concept_extract": """
        -- single-token concepts (the corpus top-30 tokens): the
        -- partial-match path needs >1 token, so every emitted row is
        -- an exact substring hit with score exactly 1.0
        WITH top AS (
          SELECT token FROM (
            SELECT token, count(*) AS n FROM (
              SELECT unnest(regexp_extract_all(lower(coalesce(text,'')),
                                               '\\w+')) AS token
              FROM documents
            ) GROUP BY token ORDER BY n DESC, token ASC LIMIT 30
          )
        )
        SELECT d.doc_id, t.token AS concept, CAST(1.0 AS DOUBLE) AS score
        FROM documents d JOIN top t
          ON position(t.token IN lower(coalesce(d.text,''))) > 0
    """,
    "customer_entity_clusters": """
        -- FastSS deletion-1 blocking finds EXACTLY the lev<=1 name
        -- pairs, so the all-pairs levenshtein join is its twin; score
        -- = 12 + (nation? +8:-3) + (segment? +5:-2), threshold >= 15;
        -- min-id components via the shared recursive-CTE resolver
        WITH c AS (
          SELECT c_name, c_nationkey, c_mktsegment,
                 CAST(substr(c_name, 10) AS BIGINT) AS id
          FROM customer
        ),
        verified AS (
          SELECT a.id AS id_a, b.id AS id_b
          FROM c a JOIN c b ON a.c_name < b.c_name
          WHERE levenshtein(a.c_name, b.c_name) <= 1
            AND (12 + CASE WHEN a.c_nationkey = b.c_nationkey
                           THEN 8 ELSE -3 END
                    + CASE WHEN a.c_mktsegment = b.c_mktsegment
                           THEN 5 ELSE -2 END) >= 15
        ),
        sym AS (
          SELECT id_a AS u, id_b AS v FROM verified
          UNION SELECT id_b, id_a FROM verified
        ),
        cnodes AS (SELECT DISTINCT u AS id FROM sym),
        reach AS (
          WITH RECURSIVE r(a, b) AS (
            SELECT id, id FROM cnodes
            UNION
            SELECT r.a, s.v FROM r JOIN sym s ON r.b = s.u
          ) SELECT * FROM r
        )
        SELECT a AS c_custkey, CAST(min(b) AS BIGINT) AS dup_of
        FROM reach GROUP BY a HAVING min(b) <> a
    """,
    "events_hll_rollup": """
        -- full HLL twin: md5-based registers recomputed per level in
        -- SQL (register max-merge == direct sketch of the slice), the
        -- power sum exact in HUGEINT, the estimate's IEEE op order
        -- mirroring stages/sketches.py:_estimate bit-for-bit
        WITH vals AS (
          SELECT CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS day,
                 event_type, CAST(user_id AS VARCHAR) AS v
          FROM events
        ),
        lv AS (
          SELECT 'day,event_type' AS level, day || '|' || event_type AS key, v
          FROM vals
          UNION ALL SELECT 'day', day, v FROM vals
          UNION ALL SELECT '<all>', '', v FROM vals
        ),
        hx AS (
          SELECT DISTINCT level, key,
                 ('0x' || substr(md5(v),1,16))::UBIGINT AS h
          FROM lv
        ),
        rk AS (
          SELECT level, key, (h >> 54)::BIGINT AS idx,
                 55 - length(ltrim(bin(h & 18014398509481983::UBIGINT), '0'))
                   AS rank
          FROM hx
        ),
        regs AS (
          SELECT level, key, idx, CAST(max(rank) AS BIGINT) AS r
          FROM rk GROUP BY level, key, idx
        ),
        agg AS (
          SELECT level, key,
                 sum((1::HUGEINT << (64 - r))) AS s_present,
                 CAST(count(*) AS BIGINT) AS n_present
          FROM regs GROUP BY level, key
        ),
        est AS (
          SELECT level, key,
                 CAST(s_present
                      + (1024 - n_present) * (1::HUGEINT << 64) AS DOUBLE)
                   AS S,
                 1024 - n_present AS zeros
          FROM agg
        )
        SELECT level, key,
               CAST(floor(CASE
                 WHEN (0.7213 / (1 + 1.079 / 1024.0)) * 1024 * 1024
                      * 18446744073709551616.0 / S <= 2560.0
                      AND zeros > 0
                 THEN 1024.0 * ln(1024.0 / zeros)
                 ELSE (0.7213 / (1 + 1.079 / 1024.0)) * 1024 * 1024
                      * 18446744073709551616.0 / S
               END) AS BIGINT) AS approx_distinct
        FROM est
    """,
    "link_coloring": f"""
        -- properness invariant: a total proper coloring of the link
        -- graph colors every node and leaves zero monochrome edges
        WITH raw AS ({_LINK_EDGES_SQL}),
        und AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst
        ),
        n AS (
          SELECT CAST(count(DISTINCT node) AS BIGINT) AS c FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
          )
        )
        SELECT c AS n_nodes, c AS n_colored,
               CAST(0 AS BIGINT) AS n_monochrome
        FROM n
    """,
    "link_partition": f"""
        -- capacity/coverage invariant: every node labeled once, no
        -- partition above ceil(1.1 * n / 8) (graph_algos formula)
        WITH raw AS ({_LINK_EDGES_SQL}),
        und AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst
        ),
        n AS (
          SELECT CAST(count(DISTINCT node) AS BIGINT) AS c FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
          )
        )
        SELECT c AS n_nodes, c AS n_labeled,
               CAST((c * 11 + 79) // 80 AS BIGINT) AS capacity,
               CAST(0 AS BIGINT) AS n_over_capacity
        FROM n
    """,
    "link_partition_quality": f"""
        -- edge-accounting invariant: both endpoints of every distinct
        -- undirected simple edge are labeled; the cut is in range
        WITH raw AS ({_LINK_EDGES_SQL}),
        und AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst
        )
        SELECT CAST(count(*) AS BIGINT) AS n_edges,
               CAST(count(*) AS BIGINT) AS n_edges_labeled,
               CAST(1 AS BIGINT) AS cut_ok
        FROM und
    """,
    "shipment_matching": """
        -- matching invariants: a maximal matching never reuses a node
        -- and leaves no edge with both endpoints free
        SELECT CAST(count(*) AS BIGINT) AS n_edges,
               CAST(0 AS BIGINT) AS n_multiply_matched,
               CAST(0 AS BIGINT) AS n_uncovered_edges
        FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
    """,
    "shipment_mis": """
        -- MIS invariants: no edge inside the set, every node in the
        -- set or adjacent to it
        SELECT CAST((SELECT count(DISTINCT l_suppkey) FROM lineitem)
                    + (SELECT count(DISTINCT l_partkey) FROM lineitem)
                    AS BIGINT) AS n_nodes,
               CAST(0 AS BIGINT) AS n_internal_edges,
               CAST(0 AS BIGINT) AS n_uncovered_nodes
    """,
    "shipment_mst": """
        -- spanning-forest invariant: components of the INPUT shipment
        -- graph; a correct MST partitions nodes identically and has
        -- exactly n_nodes - 1 edges per component (see q_shipment_mst)
        WITH RECURSIVE pairs AS (
          SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS u,
                          'p' || CAST(l_partkey AS VARCHAR) AS v
          FROM lineitem
        ),
        und AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
        reach AS (
          SELECT u AS entity, u AS r FROM und
          UNION
          SELECT reach.entity, und.v FROM reach JOIN und ON und.u = reach.r
        ),
        comp AS (SELECT entity, min(r) AS component FROM reach GROUP BY entity)
        SELECT component, CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(count(*) - 1 AS BIGINT) AS n_edges
        FROM comp GROUP BY component
    """,
    "graph_kcore": _CNRS_EDGES_SQL + """,
        -- the fixture graph's minimum degree is 2, so the 2-core is
        -- the whole node set with ZERO peel rounds; any node under
        -- degree 2 (which would cascade peeling this twin cannot
        -- express) emits a poison row that breaks the match loudly
        deg AS (
          SELECT node, count(*) AS d FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
          ) GROUP BY node
        )
        SELECT node FROM deg WHERE d >= 2
        UNION ALL
        SELECT 'ASSERTION-FAILED: min degree < 2 — peeling required'
        FROM deg WHERE d < 2
    """,
    "link_pred_eval": _CNRS_EDGES_SQL + """,
        tagged AS (
          -- deterministic ~25% holdout: first md5 hex digit of the
          -- canonical pair key in 0-3 (same split as queries.py _tag)
          SELECT a, b,
                 substr(md5(a || '|' || b), 1, 1) IN ('0','1','2','3')
                   AS is_test
          FROM und
        ),
        test_pairs AS (SELECT a, b FROM tagged WHERE is_test),
        train_und AS (SELECT a, b FROM tagged WHERE NOT is_test),
        adj AS (
          SELECT a AS u, b AS v FROM train_und
          UNION ALL SELECT b, a FROM train_und
        ),
        deg AS (
          SELECT u AS w, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u
        ),
        pairs AS (
          SELECT a1.v AS x, a2.v AS y,
                 CAST(sum(1000000 // deg.d) AS BIGINT) AS score
          FROM adj a1
          JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v
          JOIN deg ON deg.w = a1.u
          GROUP BY 1, 2
        ),
        preds AS (
          SELECT p.x, p.y
          FROM pairs p LEFT JOIN train_und t ON p.x = t.a AND p.y = t.b
          WHERE t.a IS NULL AND p.score > 0
          QUALIFY row_number() OVER (ORDER BY p.score DESC, p.x, p.y) <= 100
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM test_pairs) AS n_test,
               (SELECT CAST(count(*) AS BIGINT)
                FROM test_pairs tp JOIN preds pr
                  ON tp.a = pr.x AND tp.b = pr.y) AS n_hits,
               CAST(100 AS BIGINT) AS k
    """,
    "graph_ktruss": _CNRS_EDGES_SQL + """,
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1
          JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        sup AS (
          SELECT a, b, CAST(count(*) AS BIGINT) AS support FROM (
            SELECT x AS a, y AS b FROM tri
            UNION ALL SELECT x, z FROM tri
            UNION ALL SELECT y, z FROM tri
          ) GROUP BY a, b
        )
        SELECT a, b, support FROM sup WHERE support >= 1
    """,
    "graph_clustering": _CNRS_EDGES_SQL + """,
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1
          JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        pernode AS (
          SELECT node, count(*) AS t FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
          ) GROUP BY node
        ),
        deg AS (
          SELECT node, count(*) AS degree FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
          ) GROUP BY node
        ),
        agg AS (
          SELECT (SELECT CAST(sum(t) AS BIGINT) FROM pernode) AS closed,
                 (SELECT CAST(sum(degree * (degree - 1) // 2) AS BIGINT) FROM deg) AS wedges
        )
        SELECT closed AS n_closed, wedges AS n_wedges,
               CAST((closed * 1000) // wedges AS BIGINT) AS coeff_milli
        FROM agg
    """,
    "degree_distribution": _CNRS_EDGES_SQL + """,
        deg AS (
          SELECT node, count(*) AS degree FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
          ) GROUP BY node
        )
        SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY degree
    """,
    "node_similarity": _CNRS_EDGES_SQL + """,
        nb AS (
          SELECT a AS node, b AS nb FROM und
          UNION ALL SELECT b, a FROM und
        )
        SELECT x.nb AS node_a, y.nb AS node_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM nb x JOIN nb y ON x.node = y.node AND x.nb < y.nb
        GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY n_common DESC, node_a, node_b LIMIT 100
    """,
    "part_copurchase": """
        WITH pairs AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM pairs a
        JOIN pairs b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY n_orders DESC, part_a, part_b LIMIT 100
    """,
    "domain_stats": f"""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(length(coalesce(text,''))) AS BIGINT) AS total_chars,
               CAST(sum({_N_TOKENS_SQL}) AS BIGINT) AS total_tokens,
               CAST(count(DISTINCT coalesce(lang, '')) AS BIGINT) AS n_langs
        FROM documents GROUP BY source
    """,
    "doc_gopher": _GOPHER_ORACLE_SQL,
    "events_props_sum": """
        SELECT event_type,
               count(*) AS n_events,
               CAST(count(*) FILTER (WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL) AS BIGINT) AS n_with_k,
               CAST(sum(coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
    """,
    "doc_dup_spans": _DUP_SPANS_ORACLE_SQL,
    "doc_dup_span_redact": _DUP_SPAN_REDACT_ORACLE_SQL,
    "source_overlap": rf"""
        WITH toks AS (
          SELECT doc_id, source, u.tok, u.i
          FROM documents,
               LATERAL (SELECT unnest(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+')) AS tok,
                               generate_subscripts(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'), 1) AS i) u
          WHERE trim(coalesce(text,'')) <> ''
        ),
        win AS (
          SELECT source,
                 string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND {SOURCE_OVERLAP_K - 1} FOLLOWING) AS gram,
                 count(*) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND {SOURCE_OVERLAP_K - 1} FOLLOWING) AS glen
          FROM toks
        ),
        grams AS (
          SELECT DISTINCT source, gram FROM win WHERE glen = {SOURCE_OVERLAP_K}
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM grams a JOIN grams b ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2
    """,
    "doc_pack_shards": f"""
        WITH t AS (SELECT doc_id, {_N_TOKENS_SQL} AS n_tokens FROM documents)
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), 0) // 2048 AS BIGINT) AS shard_id
        FROM t
    """,
    # tokenized-shard manifest twin: per-doc \w+ token counts (OOV
    # encodes as <unk> so the count is vocab-independent), the same
    # prefix-sum // budget placement as doc_pack_shards (budget 4096),
    # grouped to (shard_id, n_docs, n_tokens)
    "doc_token_shards": r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(lower(coalesce(text,'')), '\w+'))
                   AS BIGINT) AS n_tokens
          FROM documents
        ),
        placed AS (
          SELECT doc_id, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ), 0) // 4096 AS BIGINT) AS shard_id
          FROM t
        )
        SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM placed GROUP BY shard_id
    """,
    "doc_token_quantiles": f"""
        WITH t AS (SELECT {_N_TOKENS_SQL} AS v FROM documents),
             c AS (SELECT v, count(*) AS cnt FROM t GROUP BY v),
             s AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM c),
             n AS (SELECT count(*) AS tot FROM t),
             q(q) AS (VALUES (CAST(0.25 AS DOUBLE)), (0.5), (0.75), (0.9), (0.99))
        SELECT q.q AS q, min(s.v) AS value
        FROM q, s, n
        WHERE s.cum >= greatest(1, CAST(ceil(q.q * n.tot) AS BIGINT))
        GROUP BY q.q
    """,
    "events_rolling_window": """
        SELECT event_id,
               CAST(SUM(CAST(round(value * 100) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS win_cents
        FROM events
    """,
    "nations_both_cust_supp": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    """,
    "custkeys_no_urgent": """
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "events_rank": """
        SELECT event_id,
               rank() OVER (PARTITION BY event_type
                            ORDER BY CAST(round(value * 100) AS BIGINT) // 1000
                           ) AS rnk
        FROM events
    """,
    "events_latest": """
        SELECT event_id, user_id, event_type FROM (
          SELECT event_id, user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
    """,
    "events_type_pivot": """
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'view') AS n_view,
               count(*) FILTER (WHERE event_type = 'click') AS n_click,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               count(*) FILTER (WHERE event_type = 'error') AS n_error
        FROM events GROUP BY user_id
    """,
    "doc_shuffle_shards": """
        SELECT doc_id,
               ((doc_id * 48271) % 2147483647) % 16 AS shard_id,
               (doc_id * 48271) % 2147483647 AS shard_rank
        FROM documents
    """,
    "orders_vs_ship_by_date": """
        WITH o AS (SELECT o_orderdate AS d, count(*) AS n_orders
                   FROM orders GROUP BY 1),
             l AS (SELECT l_shipdate AS d, count(*) AS n_shipped
                   FROM lineitem GROUP BY 1)
        SELECT coalesce(o.d, l.d) AS d,
               CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(coalesce(l.n_shipped, 0) AS BIGINT) AS n_shipped
        FROM o FULL OUTER JOIN l ON o.d = l.d
    """,
    "source_token_quantiles": f"""
        WITH t AS (SELECT source, {_N_TOKENS_SQL} AS v FROM documents),
             c AS (SELECT source, v, count(*) AS cnt FROM t GROUP BY source, v),
             s AS (SELECT source, v,
                          sum(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
                          sum(cnt) OVER (PARTITION BY source) AS tot
                   FROM c),
             q(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (0.9), (0.99))
        SELECT s.source AS source, q.q AS q, min(s.v) AS value
        FROM q, s
        WHERE s.cum >= greatest(1, CAST(ceil(q.q * s.tot) AS BIGINT))
        GROUP BY s.source, q.q
    """,
    # Integer fixed-point BM25 (k1=1.2, b=0.75, ln-free rational IDF
    # ((N-df)*1000)//df) — every floor division mirrors
    # stages/retrieval.py bit-for-bit.
    "doc_bm25_mlt": """
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text, '')), '\\w+')) AS token
          FROM documents
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (
          SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS BIGINT) * 1000 // count(*) AS avgdl_milli
          FROM dl
        ),
        q AS (
          SELECT DISTINCT doc_id AS query_id, token FROM tok
          WHERE doc_id IN (0, 7, 42)
        ),
        df AS (
          SELECT token, count(DISTINCT doc_id) AS df FROM tok
          WHERE token IN (SELECT token FROM q) GROUP BY token
        ),
        idf AS (
          SELECT token,
                 ((SELECT n_docs FROM stats) - df) * 1000 // df AS idf_milli
          FROM df
        ),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        contrib AS (
          SELECT q.query_id, tf.doc_id,
                 idf.idf_milli
                   * (tf.tf * 2200 * 1000
                      // (tf.tf * 1000
                          + (1200 * (1000 - 750
                                     + (750 * (dl.dl * 1000000
                                               // (SELECT avgdl_milli FROM stats)))
                                       // 1000))
                            // 1000))
                   // 1000 AS c
          FROM q
          JOIN tf ON tf.token = q.token
          JOIN dl ON dl.doc_id = tf.doc_id
          JOIN idf ON idf.token = q.token
        ),
        scored AS (
          SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_milli
          FROM contrib GROUP BY query_id, doc_id
        ),
        ranked AS (
          SELECT query_id, doc_id, score_milli,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score_milli DESC, doc_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, doc_id, score_milli, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 10
    """,
    "events_in_purchase_windows": """
        WITH e AS (SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                          event_type
                   FROM events),
             p AS (SELECT event_id AS purchase_id, ts_us AS start_us,
                          ts_us + 600000000 AS end_us
                   FROM e WHERE event_type = 'purchase')
        SELECT e.event_id, e.ts_us, p.purchase_id, p.start_us, p.end_us
        FROM e JOIN p ON e.ts_us >= p.start_us AND e.ts_us < p.end_us
    """,
    "orders_snapshot_diff": """
        WITH r AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                 o_orderpriority
          FROM orders
        ),
        o AS (
          SELECT o_orderkey,
                 md5(concat_ws('|', CAST(o_custkey AS VARCHAR), o_orderstatus,
                               CAST(price_cents AS VARCHAR), o_orderpriority)) AS h
          FROM r WHERE o_orderkey % 13 <> 0
        ),
        n AS (
          SELECT o_orderkey,
                 md5(concat_ws('|', CAST(o_custkey AS VARCHAR), o_orderstatus,
                               CAST(price_cents AS VARCHAR),
                               CASE WHEN o_orderkey % 7 = 0 THEN '0-RESTATED'
                                    ELSE o_orderpriority END)) AS h
          FROM r WHERE o_orderkey % 11 <> 0
        )
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    ELSE 'changed' END AS change,
               coalesce(o.h, '') AS old_md5,
               coalesce(n.h, '') AS new_md5
        FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
        WHERE coalesce(o.h, '') <> coalesce(n.h, '')
    """,
    "orders_profile": "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS "column", count(*) AS n_rows,
                   count(*) - count({c}) AS n_null,
                   count(DISTINCT {c}) AS n_distinct,
                   CAST(min({c}) AS VARCHAR) AS min_v,
                   CAST(max({c}) AS VARCHAR) AS max_v
            FROM orders"""
        for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    ),
    "customer_fuzzy_names": """
        SELECT DISTINCT a.c_name AS name_a, b.c_name AS name_b
        FROM customer a, customer b
        WHERE a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 1
    """,
    "orders_skyline": """
        WITH t AS (
          SELECT o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                 epoch_us(o_orderdate) // 86400000000 AS date_day
          FROM orders
        ),
        g AS (SELECT price_cents, min(date_day) AS md FROM t GROUP BY price_cents),
        w AS (
          SELECT price_cents, md,
                 min(md) OVER (ORDER BY price_cents DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
          FROM g
        )
        SELECT t.o_orderkey, t.price_cents, CAST(t.date_day AS BIGINT) AS date_day
        FROM t JOIN w ON t.price_cents = w.price_cents AND t.date_day = w.md
        WHERE w.prev_min IS NULL OR w.md < w.prev_min
    """,
    "orders_price_trend": """
        WITH t AS (
          SELECT o_orderpriority,
                 CAST(epoch_us(o_orderdate) // 86400000000 - 8035 AS HUGEINT) AS x,
                 CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT) AS y
          FROM orders
        ),
        a AS (
          SELECT o_orderpriority, CAST(count(*) AS HUGEINT) AS n,
                 sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
          FROM t GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
               CASE WHEN n*sxx - sx*sx = 0 THEN NULL
                    ELSE CAST(((n*sxy - sx*sy) * 1000000) // (n*sxx - sx*sx) AS BIGINT)
               END AS slope_micro
        FROM a
    """,
    "events_transitions": """
        WITH seq AS (
          SELECT event_type AS next_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events
        ),
        agg AS (
          SELECT prev_type, next_type, count(*) AS c
          FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT prev_type, next_type, CAST(c AS BIGINT) AS cnt,
               CAST((1000 * c) // sum(c) OVER (PARTITION BY prev_type) AS BIGINT) AS prob_milli
        FROM agg
    """,
    "doc_length_outliers": f"""
        WITH t AS (SELECT doc_id, CAST({_N_TOKENS_SQL} AS BIGINT) AS v FROM documents),
        m AS (SELECT quantile_disc(v, 0.5) AS med FROM t),
        d AS (SELECT doc_id, v, abs(v - (SELECT med FROM m)) AS dev FROM t),
        md AS (SELECT quantile_disc(dev, 0.5) AS mad FROM d)
        SELECT doc_id AS id, v AS value,
               CAST((SELECT med FROM m) AS BIGINT) AS med,
               CAST((SELECT mad FROM md) AS BIGINT) AS mad,
               CAST(dev > 3 * (SELECT mad FROM md) AS BIGINT) AS is_outlier
        FROM d
    """,
    "session_concurrency": """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM events
        ),
        sess AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM marked
        ),
        iv AS (
          SELECT user_id, session_id,
                 epoch_us(min(ts)) AS s, epoch_us(max(ts)) + 1000000 AS e
          FROM sess GROUP BY user_id, session_id
        ),
        d AS (
          SELECT s AS t, 1 AS delta FROM iv
          UNION ALL SELECT e AS t, -1 AS delta FROM iv
        ),
        net AS (SELECT t, sum(delta) AS net FROM d GROUP BY t),
        run AS (
          SELECT t, sum(net) OVER (ORDER BY t
                                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
          FROM net
        )
        SELECT (t // 3600000000) * 3600000000 AS window_start_us,
               CAST(max(cur) AS BIGINT) AS peak_concurrent
        FROM run GROUP BY 1
    """,
    "part_copurchase_lift": """
        WITH pr AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        top AS (
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 count(*) AS n_baskets
          FROM pr a JOIN pr b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2
          ORDER BY n_baskets DESC, part_a, part_b LIMIT 100
        ),
        ic AS (SELECT l_partkey, count(DISTINCT l_orderkey) AS c FROM lineitem GROUP BY 1),
        tot AS (SELECT count(DISTINCT l_orderkey) AS t FROM lineitem)
        SELECT top.part_a, top.part_b, CAST(top.n_baskets AS BIGINT) AS n_baskets,
               CAST((CAST(top.n_baskets AS HUGEINT) * tot.t * 1000)
                    // (CAST(ia.c AS HUGEINT) * ib.c) AS BIGINT) AS lift_milli
        FROM top
        CROSS JOIN tot
        JOIN ic ia ON ia.l_partkey = top.part_a
        JOIN ic ib ON ib.l_partkey = top.part_b
    """,
    "graph_closeness": _CNRS_EDGES_SQL.replace("WITH base", "WITH RECURSIVE base")
    + """,
        sym AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und),
        srcs AS (SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS s FROM region),
        bfs(source, entity, hop) AS (
          SELECT s, s, 0 FROM srcs
          UNION
          SELECT b.source, y.dst, b.hop + 1
          FROM bfs b JOIN sym y ON y.src = b.entity
          WHERE b.hop < 3
        ),
        md AS (
          SELECT source, entity, min(hop) AS minh FROM bfs GROUP BY source, entity
        )
        SELECT entity, CAST(count(*) AS BIGINT) AS n_reached,
               CAST(sum(minh) AS BIGINT) AS total_dist
        FROM md GROUP BY entity
    """,
    "events_decayed": """
        WITH p AS (SELECT max(epoch_us(ts)) // 3600000000 AS gmax FROM events)
        SELECT user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        // CAST(power(2, LEAST(
                             p.gmax - epoch_us(ts) // 3600000000, 40))
                           AS BIGINT))
                    AS BIGINT) AS decayed_cents
        FROM events, p GROUP BY user_id
    """,
    "embedding_centroids": """
        SELECT CAST(label AS VARCHAR) AS grp, i AS dim,
               CAST(sum(CAST(floor(embedding[i] * 1048576.0) AS BIGINT))
                    AS BIGINT) AS sum_fixed,
               CAST(count(*) AS BIGINT) AS n
        FROM embeddings,
             LATERAL unnest(generate_series(
               1, CAST(len(embedding) AS BIGINT))) AS u(i)
        GROUP BY label, i
    """,
    "source_distinctive_terms": """
        WITH tok AS (
          SELECT source AS grp,
                 unnest(regexp_extract_all(lower(coalesce(text,'')),
                                           '\\w+')) AS token
          FROM documents
        ),
        gt AS (SELECT grp, token, count(*) AS n FROM tok GROUP BY 1, 2),
        t AS (SELECT token, count(*) AS nt FROM tok GROUP BY 1),
        g AS (SELECT grp, count(*) AS ng FROM tok GROUP BY 1),
        tot AS (SELECT count(*) AS nn FROM tok)
        SELECT gt.grp AS "group", gt.token, CAST(gt.n AS BIGINT) AS n,
               CAST((CAST(gt.n AS HUGEINT) * tot.nn * 1000)
                    // (CAST(t.nt AS HUGEINT) * g.ng) AS BIGINT) AS lift_milli
        FROM gt JOIN t USING (token) JOIN g USING (grp) CROSS JOIN tot
        WHERE t.nt >= 20
        QUALIFY row_number() OVER (
          PARTITION BY gt.grp
          ORDER BY lift_milli DESC, gt.token ASC
        ) <= 5
    """,
    "user_gini": """
        WITH c AS (
          SELECT user_id, event_type, count(*) AS n
          FROM events GROUP BY 1, 2
        ),
        a AS (
          SELECT user_id, CAST(sum(n) AS BIGINT) AS n,
                 CAST(sum(n * n) AS BIGINT) AS s2
          FROM c GROUP BY 1
        )
        SELECT user_id, n,
               CAST(((CAST(n AS HUGEINT) * n - s2) * 1000)
                    // (CAST(n AS HUGEINT) * n) AS BIGINT) AS gini_milli
        FROM a
    """,
    "doc_collocations": """
        WITH tk AS (
          SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(coalesce(text,'')),
                                             '\\w+')) AS token
            FROM documents
          )
        ),
        top AS (
          SELECT a.token AS item_a, b.token AS item_b,
                 count(*) AS n_baskets
          FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2 HAVING count(*) >= 5
          ORDER BY n_baskets DESC, item_a, item_b LIMIT 50
        ),
        ic AS (SELECT token, count(DISTINCT doc_id) AS c FROM tk GROUP BY 1),
        tot AS (SELECT count(DISTINCT doc_id) AS t FROM tk)
        SELECT top.item_a, top.item_b,
               CAST(top.n_baskets AS BIGINT) AS n_baskets,
               CAST((CAST(top.n_baskets AS HUGEINT) * tot.t * 1000)
                    // (CAST(ia.c AS HUGEINT) * ib.c) AS BIGINT) AS lift_milli
        FROM top
        CROSS JOIN tot
        JOIN ic ia ON ia.token = top.item_a
        JOIN ic ib ON ib.token = top.item_b
    """,
    "doc_phrase_hits": """
        WITH tok AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text,'')), '\\w+') AS a
          FROM documents
        ),
        bi AS (
          SELECT doc_id, a[i] || ' ' || a[i+1] AS phrase
          FROM tok,
               LATERAL unnest(generate_series(
                 1, CAST(len(a) AS BIGINT) - 1)) AS u(i)
        ),
        top AS (
          SELECT phrase, count(*) AS cnt FROM bi GROUP BY phrase
          ORDER BY cnt DESC, phrase ASC LIMIT 20
        )
        SELECT b.doc_id, b.phrase, CAST(count(*) AS BIGINT) AS n
        FROM bi b JOIN top t ON t.phrase = b.phrase
        GROUP BY b.doc_id, b.phrase
    """,
    "events_attribution": f"""
        WITH p AS (
          SELECT event_id AS pid, user_id, epoch_us(ts) AS pts,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'
        ),
        t AS (
          SELECT event_id AS tid, user_id, epoch_us(ts) AS tts, event_type
          FROM events WHERE event_type <> 'purchase'
        ),
        pairs AS (
          SELECT p.pid, p.cents, t.event_type,
                 count(*) OVER (PARTITION BY p.pid) AS n,
                 row_number() OVER (
                   PARTITION BY p.pid ORDER BY t.tts DESC, t.tid DESC
                 ) AS rn
          FROM p JOIN t ON t.user_id = p.user_id
                AND t.tts >= p.pts - {ATTRIBUTION_WINDOW_US}
                AND t.tts < p.pts
        ),
        attr AS (
          SELECT event_type,
                 cents // n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END AS a
          FROM pairs
        )
        SELECT event_type, CAST(sum(a) AS BIGINT) AS attributed_cents,
               CAST(count(*) AS BIGINT) AS n_touches
        FROM attr GROUP BY event_type
        UNION ALL
        SELECT 'direct', CAST(sum(cents) AS BIGINT), CAST(count(*) AS BIGINT)
        FROM p WHERE NOT EXISTS (
          SELECT 1 FROM t WHERE t.user_id = p.user_id
            AND t.tts >= p.pts - {ATTRIBUTION_WINDOW_US} AND t.tts < p.pts
        )
        HAVING count(*) > 0
    """,
    "nation_scc": """
        WITH RECURSIVE flow AS (
          SELECT c.c_nationkey AS a, s.s_nationkey AS b,
                 sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS rev
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          GROUP BY 1, 2
        ),
        es AS (
          SELECT CAST(f.a AS VARCHAR) AS src, CAST(f.b AS VARCHAR) AS dst
          FROM flow f LEFT JOIN flow r ON r.a = f.b AND r.b = f.a
          WHERE f.a <> f.b AND f.rev > coalesce(r.rev, 0)
        ),
        reach(s, d) AS (
          SELECT src, dst FROM es
          UNION
          SELECT reach.s, es.dst FROM reach JOIN es ON es.src = reach.d
        ),
        nodes AS (SELECT CAST(n_nationkey AS VARCHAR) AS v FROM nation)
        SELECT v AS entity, min(s) AS scc_id FROM (
          SELECT n.v AS v, n.v AS s FROM nodes n
          UNION ALL
          SELECT r1.d AS v, r1.s AS s
          FROM reach r1 JOIN reach r2 ON r2.s = r1.d AND r2.d = r1.s
        ) GROUP BY v
    """,
    "embedding_gram": """
        SELECT i, j,
               CAST(sum(CAST(floor(embedding[i] * 1024.0) AS BIGINT)
                      * CAST(floor(embedding[j] * 1024.0) AS BIGINT))
                    AS BIGINT) AS sum_fixed,
               CAST(count(*) AS BIGINT) AS n
        FROM embeddings,
             LATERAL unnest(generate_series(
               1, CAST(len(embedding) AS BIGINT))) AS u(i),
             LATERAL unnest(generate_series(
               i, CAST(len(embedding) AS BIGINT))) AS v(j)
        GROUP BY i, j
    """,
    "doc_incremental_dedup": """
        WITH ref AS (
          SELECT DISTINCT md5(coalesce(text, '')) AS m
          FROM documents WHERE doc_id % 3 = 0
        ),
        new AS (
          SELECT doc_id, md5(coalesce(text, '')) AS text_md5
          FROM documents WHERE doc_id % 3 <> 0
        )
        SELECT doc_id, text_md5 FROM new
        WHERE text_md5 NOT IN (SELECT m FROM ref)
    """,
    "doc_pack_manifest": f"""
        WITH t AS (SELECT doc_id, {_N_TOKENS_SQL} AS n_tokens FROM documents),
             w AS (
               SELECT doc_id, n_tokens,
                      CAST(coalesce(sum(n_tokens) OVER (
                              ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                           ), 0) AS BIGINT) AS excl
               FROM t
             )
        SELECT doc_id, n_tokens,
               excl // {PACK_MANIFEST_BUDGET} AS shard_id,
               excl % {PACK_MANIFEST_BUDGET} AS "offset"
        FROM w
    """,
    "graph_harmonic": _CNRS_EDGES_SQL.replace("WITH base", "WITH RECURSIVE base")
    + f""",
        sym AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und),
        srcs AS (SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS s FROM region),
        bfs(source, entity, hop) AS (
          SELECT s, s, 0 FROM srcs
          UNION
          SELECT b.source, y.dst, b.hop + 1
          FROM bfs b JOIN sym y ON y.src = b.entity
          WHERE b.hop < 3
        ),
        md AS (
          SELECT source, entity, min(hop) AS minh FROM bfs GROUP BY source, entity
        )
        SELECT entity,
               CAST(sum(CAST({HARMONIC_SCALE} AS BIGINT) // minh) AS BIGINT)
                 AS harmonic_scaled
        FROM md WHERE minh > 0 GROUP BY entity
    """,
    "url_dedup": r"""
        WITH u AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'http' END || '://' ||
                 CASE WHEN doc_id % 2 = 1 THEN 'Example.COM' ELSE 'example.com' END ||
                 CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END ||
                 '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
                 CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END ||
                 CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=' || CAST((doc_id % 50) % 10 AS VARCHAR)
                      ELSE '?a=' || CAST((doc_id % 50) % 10 AS VARCHAR) || '&b=2' END ||
                 CASE WHEN doc_id % 11 = 0 THEN '#s' ELSE '' END AS url
          FROM documents
        ),
        s1 AS (
          SELECT doc_id,
                 regexp_extract(
                   regexp_replace(trim(url), '#.*$', ''),
                   '^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?(.*))?$',
                   ['scheme', 'hostport', 'path', 'query']
                 ) AS g
          FROM u
        ),
        s2 AS (
          SELECT doc_id,
                 lower(g.scheme) AS sc,
                 lower(g.hostport) AS hp,
                 g.path AS p, g.query AS q
          FROM s1
        ),
        s3 AS (
          SELECT doc_id, sc,
                 CASE WHEN sc = 'http' AND hp LIKE '%:80'
                        THEN regexp_replace(hp, ':80$', '')
                      WHEN sc = 'https' AND hp LIKE '%:443'
                        THEN regexp_replace(hp, ':443$', '')
                      ELSE hp END AS host,
                 CASE WHEN p = '' THEN '/'
                      WHEN p <> '/' AND p LIKE '%/' THEN regexp_replace(p, '/$', '')
                      ELSE p END AS path,
                 coalesce(
                   list_aggr(
                     list_sort(list_filter(string_split(q, '&'), x -> x <> '')),
                     'string_agg', '&'
                   ), ''
                 ) AS qs
          FROM s2
        ),
        n AS (
          SELECT doc_id,
                 sc || '://' || host || path ||
                   CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS url_norm
          FROM s3
        )
        SELECT url_norm, CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM n GROUP BY 1
    """,
    "url_normalize": r"""
        WITH u AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'http' END || '://' ||
                 CASE WHEN doc_id % 2 = 1 THEN 'Example.COM' ELSE 'example.com' END ||
                 CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END ||
                 '/docs/' || CAST(doc_id AS VARCHAR) ||
                 CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END ||
                 CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=' || CAST(doc_id % 10 AS VARCHAR)
                      ELSE '?a=' || CAST(doc_id % 10 AS VARCHAR) || '&b=2' END ||
                 CASE WHEN doc_id % 11 = 0 THEN '#s' ELSE '' END AS url
          FROM documents
        ),
        s1 AS (
          SELECT doc_id, url,
                 regexp_extract(
                   regexp_replace(trim(url), '#.*$', ''),
                   '^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?(.*))?$',
                   ['scheme', 'hostport', 'path', 'query']
                 ) AS g
          FROM u
        ),
        s2 AS (
          SELECT doc_id, url,
                 lower(g.scheme) AS sc,
                 lower(g.hostport) AS hp,
                 g.path AS p, g.query AS q
          FROM s1
        ),
        s3 AS (
          SELECT doc_id, url, sc,
                 CASE WHEN sc = 'http' AND hp LIKE '%:80'
                        THEN regexp_replace(hp, ':80$', '')
                      WHEN sc = 'https' AND hp LIKE '%:443'
                        THEN regexp_replace(hp, ':443$', '')
                      ELSE hp END AS host,
                 CASE WHEN p = '' THEN '/'
                      WHEN p <> '/' AND p LIKE '%/' THEN regexp_replace(p, '/$', '')
                      ELSE p END AS path,
                 coalesce(
                   list_aggr(
                     list_sort(list_filter(string_split(q, '&'), x -> x <> '')),
                     'string_agg', '&'
                   ), ''
                 ) AS qs
          FROM s2
        )
        SELECT doc_id, url,
               sc || '://' || host || path ||
                 CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS url_norm,
               CAST(1 AS BIGINT) AS normalized
        FROM s3
    """,
    "doc_nb_classify": _nb_oracle_sql(),
    "url_best_rep": """
        SELECT doc_id,
               first_value(doc_id) OVER (
                 PARTITION BY doc_id % 50
                 ORDER BY n_chars DESC, doc_id ASC) AS keep_id
        FROM documents
    """,
    "revenue_cube": """
        SELECT CASE WHEN grouping(c_mktsegment) = 1 THEN '(all)'
                    ELSE c_mktsegment END AS c_mktsegment,
               CASE WHEN grouping(o_orderpriority) = 1 THEN '(all)'
                    ELSE o_orderpriority END AS o_orderpriority,
               CAST(2 - grouping(c_mktsegment) - grouping(o_orderpriority)
                    AS BIGINT) AS lvl,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS total
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY CUBE(c_mktsegment, o_orderpriority)
    """,
    "lineitem_winsorized": """
        WITH v AS (
          SELECT l_returnflag AS grp,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem
        ),
        b AS (
          SELECT grp,
                 CAST(quantile_disc(cents, 0.05) AS BIGINT) AS lo,
                 CAST(quantile_disc(cents, 0.95) AS BIGINT) AS hi
          FROM v GROUP BY 1
        )
        SELECT v.grp AS l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_lo_clamped,
               CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_hi_clamped,
               b.lo, b.hi,
               CAST(sum(least(greatest(cents, lo), hi)) AS BIGINT)
                 AS winsorized_sum
        FROM v JOIN b USING (grp)
        GROUP BY v.grp, b.lo, b.hi
    """,
    "nation_market_share": """
        WITH li AS (
            SELECT l_orderkey,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
                   s_nationkey
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        ), o AS (
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               CAST(sum(CASE WHEN s_nationkey =
                        (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_2')
                        THEN rev ELSE 0 END) AS BIGINT) AS rev_x_e4,
               CAST(sum(rev) AS BIGINT) AS rev_all_e4,
               CAST(sum(CASE WHEN s_nationkey =
                        (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_2')
                        THEN rev ELSE 0 END) * 10000 // sum(rev) AS BIGINT) AS share_bps
        FROM li JOIN o ON li.l_orderkey = o.o_orderkey
        GROUP BY o_year
    """,
    "nation_part_profit": """
        SELECT n_name,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                 AS profit_e4
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%blue%'
        GROUP BY n_name, o_year
    """,
    "part_supplier_counts": """
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13'
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    "events_unpivot": """
        SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
               count(*) AS n
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase', 'signup', 'error')
        GROUP BY user_id, event_type
    """,
    "customer_priority_seq": """
        SELECT o_custkey,
               string_agg(o_orderpriority, '|'
                          ORDER BY o_orderdate, o_orderkey) AS priority_seq
        FROM orders GROUP BY o_custkey
    """,
    "events_crosscorr": """
        WITH h AS (
            SELECT epoch_us(ts) // 3600000000 AS hr,
                   CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS v,
                   CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS c
            FROM events
            WHERE event_type IN ('view', 'click')
            GROUP BY 1
        ), lags AS (
            SELECT CAST(unnest(generate_series(0, 6)) AS BIGINT) AS lag
        )
        SELECT lag,
               CAST(coalesce(sum(a.v * b.c), 0) AS BIGINT) AS vc_sum,
               CAST(count(b.hr) AS BIGINT) AS n_hours
        FROM lags
        LEFT JOIN h a ON true
        LEFT JOIN h b ON b.hr = a.hr + lag
        GROUP BY lag
    """,
    "doc_calibration": f"""
        WITH d AS (
            SELECT CASE
                     WHEN {_lang_count('en')} = 0 AND {_lang_count('de')} = 0
                          AND {_lang_count('fr')} = 0 THEN 0
                     WHEN {_lang_count('en')} >= {_lang_count('de')}
                          AND {_lang_count('en')} >= {_lang_count('fr')} THEN 1
                     ELSE 0
                   END AS is_en,
                   least(CAST({_lang_count('en')} AS BIGINT) * 1000
                         // ({_N_TOKENS_SQL} + 1), 999) AS score_pm
            FROM documents
        )
        SELECT score_pm // 100 AS bin,
               count(*) AS n_docs,
               CAST(sum(is_en) AS BIGINT) AS n_pos,
               CAST(sum(score_pm) AS BIGINT) AS sum_score_pm
        FROM d GROUP BY 1
    """,
    "events_session_paths": """
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, event_type, ts, event_id,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        ),
        paths AS (
            SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path
            FROM sess GROUP BY user_id, sid
        )
        SELECT path, count(*) AS n FROM paths
        GROUP BY path ORDER BY n DESC, path LIMIT 20
    """,
    "doc_oov_rate": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(coalesce(text,'')), '\w+')) AS tok
            FROM documents
        ),
        v AS (
            SELECT tok FROM (
                SELECT tok, count(*) AS n FROM toks
                GROUP BY tok ORDER BY n DESC, tok LIMIT 1000
            )
        ),
        per AS (
            SELECT doc_id, count(*) AS n_tokens,
                   CAST(sum(CASE WHEN t.tok IN (SELECT tok FROM v)
                            THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
            FROM toks t GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "doc_auc": f"""
        WITH d AS (
            SELECT CASE
                     WHEN {_lang_count('en')} = 0 AND {_lang_count('de')} = 0
                          AND {_lang_count('fr')} = 0 THEN 0
                     WHEN {_lang_count('en')} >= {_lang_count('de')}
                          AND {_lang_count('en')} >= {_lang_count('fr')} THEN 1
                     ELSE 0
                   END AS is_en,
                   least(CAST({_lang_count('en')} AS BIGINT) * 1000
                         // ({_N_TOKENS_SQL} + 1), 999) AS score_pm
            FROM documents
        ),
        h AS (
            SELECT score_pm, CAST(sum(is_en) AS BIGINT) AS np,
                   CAST(count(*) - sum(is_en) AS BIGINT) AS nn
            FROM d GROUP BY 1
        ),
        c AS (
            SELECT np, nn,
                   CAST(coalesce(sum(nn) OVER (ORDER BY score_pm
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS below
            FROM h
        )
        SELECT CAST(sum(np * (2 * below + nn)) AS BIGINT) AS auc_num2,
               CAST(2 * (SELECT sum(np) FROM h)
                      * (SELECT sum(nn) FROM h) AS BIGINT) AS auc_den2,
               CAST((SELECT sum(np) FROM h) AS BIGINT) AS n_pos,
               CAST((SELECT sum(nn) FROM h) AS BIGINT) AS n_neg
        FROM c
    """,
    "part_min_cost_supplier": """
        WITH elig AS (
            SELECT l_partkey, l_suppkey,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            JOIN part     ON l_partkey = p_partkey
            WHERE r_name = 'EUROPE' AND p_type = 'LARGE'
        ), m AS (
            SELECT l_partkey, min(price_c) AS mp FROM elig GROUP BY 1
        )
        SELECT e.l_partkey AS p_partkey,
               CAST(min(e.l_suppkey) AS BIGINT) AS s_suppkey,
               CAST(m.mp AS BIGINT) AS min_price_cents
        FROM elig e
        JOIN m ON e.l_partkey = m.l_partkey AND e.price_c = m.mp
        GROUP BY 1, 3
    """,
    "forecast_revenue": """
        SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_discount * 100) AS BIGINT)), 0) AS BIGINT)
                 AS revenue_e4,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND CAST(round(l_quantity) AS BIGINT) < 24
    """,
    "important_parts": """
        WITH pp AS (
            SELECT l_partkey AS p_partkey,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                     AS value_e2
            FROM lineitem GROUP BY 1
        )
        SELECT p_partkey, value_e2 FROM pp
        WHERE value_e2 * 1250 > (SELECT CAST(sum(value_e2) AS BIGINT) FROM pp)
    """,
    "graph_voronoi": _CNRS_EDGES_SQL.replace("WITH base", "WITH RECURSIVE base")
    + """,
        sym AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und),
        srcs AS (SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS s FROM region),
        bfs(source, entity, hop) AS (
          SELECT s, s, 0 FROM srcs
          UNION
          SELECT b.source, y.dst, b.hop + 1
          FROM bfs b JOIN sym y ON y.src = b.entity
          WHERE b.hop < 3
        ),
        md AS (
          SELECT source, entity, min(hop) AS minh FROM bfs GROUP BY source, entity
        )
        SELECT entity, seed, hop FROM (
          SELECT entity, source AS seed, CAST(minh AS BIGINT) AS hop,
                 row_number() OVER (PARTITION BY entity
                                    ORDER BY minh, source) AS rk
          FROM md
        ) WHERE rk = 1
    """,
    "events_ab_stats": """
        SELECT CAST(user_id % 2 AS VARCHAR) AS variant,
               count(*) AS n,
               CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT)
                        * CAST(round(coalesce(value, 0) * 100) AS BIGINT))
                    AS BIGINT) AS sumsq_cents
        FROM events GROUP BY 1
    """,
    "events_wow_change": """
        WITH t AS (SELECT max(epoch_us(ts)) AS anchor FROM events),
        c AS (
            SELECT event_type,
                   CAST(sum(CASE WHEN epoch_us(ts) > anchor - CAST(7 AS BIGINT)*86400*1000000
                                  AND epoch_us(ts) <= anchor THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_recent,
                   CAST(sum(CASE WHEN epoch_us(ts) > anchor - CAST(14 AS BIGINT)*86400*1000000
                                  AND epoch_us(ts) <= anchor - CAST(7 AS BIGINT)*86400*1000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_prior
            FROM events, t GROUP BY 1
        )
        SELECT event_type, n_recent, n_prior,
               CAST(n_recent * 10000 // greatest(n_prior, 1) - 10000
                    AS BIGINT) AS change_bps
        FROM c
    """,
    "orders_iso_week": """
        SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
               CAST(week(o_orderdate) AS BIGINT) AS iso_week,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders GROUP BY 1, 2
    """,
    "doc_hapax": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(coalesce(text,'')), '\w+')) AS tok
            FROM documents
        ),
        per AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_hapax
            FROM (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(p.n_hapax, 0) AS BIGINT) AS n_hapax
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "lineitem_gap_audit": """
        WITH per AS (
            SELECT l_orderkey,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(max(l_linenumber) AS BIGINT) AS max_line,
                   CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_distinct
            FROM lineitem GROUP BY 1
        )
        SELECT count(*) AS n_orders,
               CAST(sum(CASE WHEN max_line <> n_distinct THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_gap_orders,
               CAST(sum(CASE WHEN n_lines <> n_distinct THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_orders
        FROM per
    """,
    "events_type_user_jaccard": """
        WITH f AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
            FROM events GROUP BY 1
        )
        SELECT CAST(sum(CASE WHEN v = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_both,
               CAST(sum(CASE WHEN v = 1 OR p = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_either,
               CAST(sum(v) AS BIGINT) AS n_view,
               CAST(sum(p) AS BIGINT) AS n_purchase
        FROM f
    """,
    "doc_lang_margin": f"""
        WITH d AS (
            SELECT CAST({_lang_count('en')} AS BIGINT) AS e,
                   CAST({_lang_count('de')} AS BIGINT) AS dd,
                   CAST({_lang_count('fr')} AS BIGINT) AS f
            FROM documents
        ),
        x AS (
            SELECT CASE WHEN e = 0 AND dd = 0 AND f = 0 THEN 'und'
                        WHEN e >= dd AND e >= f THEN 'en'
                        WHEN dd >= f THEN 'de' ELSE 'fr' END AS lang_pred,
                   least(greatest(e, dd, f)
                         - (e + dd + f - greatest(e, dd, f) - least(e, dd, f)),
                         5) AS margin_i
            FROM d
        )
        SELECT lang_pred, CAST(margin_i AS VARCHAR) AS margin, count(*) AS n
        FROM x GROUP BY 1, 2
    """,
    "graph_lcc": _CNRS_EDGES_SQL + """,
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1
          JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        tcount AS (
          SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
          ) GROUP BY node
        ),
        adj AS (
          SELECT a AS node, b AS nbr FROM und
          UNION ALL SELECT b, a FROM und
        ),
        deg AS (
          SELECT node, CAST(count(DISTINCT nbr) AS BIGINT) AS degree
          FROM adj GROUP BY node
        )
        SELECT d.node,
               CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
               d.degree,
               CAST(2 * coalesce(t.n_triangles, 0) AS BIGINT) AS lcc_num,
               CAST(d.degree * (d.degree - 1) AS BIGINT) AS lcc_den
        FROM deg d LEFT JOIN tcount t USING (node)
    """,
    # k-core as its monotone COMPLEMENT: recursive `removed` grows to
    # the peel fixpoint (UNION termination); survivors = the k-core.
    "graph_kcore": _CNRS_EDGES_SQL.replace("WITH base", "WITH RECURSIVE base", 1)
    + """,
        adj AS (SELECT a AS node, b AS nbr FROM und
                UNION ALL SELECT b, a FROM und),
        deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
        removed(node) AS (
          SELECT node FROM deg WHERE d < 2
          UNION
          SELECT d.node
          FROM deg d
          JOIN adj a ON a.node = d.node
          JOIN removed r ON r.node = a.nbr
          GROUP BY d.node, d.d
          HAVING d.d - count(DISTINCT a.nbr) < 2
        )
        SELECT node FROM deg
        WHERE node NOT IN (SELECT node FROM removed)
    """,
    "events_late_quarantine": """
        WITH s AS (
            SELECT user_id, epoch_us(ts) AS t,
                   max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
            FROM events
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               count(*) AS n_events,
               CAST(sum(CASE WHEN hwm - t > 300000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_late
        FROM s GROUP BY 1
    """,
    "orders_seasonal_index": """
        WITH m AS (
            SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS revenue_cents
            FROM orders GROUP BY 1
        )
        SELECT month, revenue_cents,
               CAST(revenue_cents * 12 * 10000
                    // (SELECT sum(revenue_cents) FROM m) AS BIGINT)
                 AS seasonal_bps
        FROM m
    """,
    "nations_cs_intersect_all": """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        INTERSECT ALL
        SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    "nations_cs_except_all": """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        EXCEPT ALL
        SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    "customer_revenue_gini": """
        WITH pc AS (
            SELECT o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS cents
            FROM orders GROUP BY 1
        ),
        r AS (
            SELECT cents,
                   row_number() OVER (ORDER BY cents, o_custkey) AS i
            FROM pc
        )
        SELECT CAST(2 * sum(i * cents)
                    - (count(*) + 1) * sum(cents) AS BIGINT) AS gini_num,
               CAST(count(*) * sum(cents) AS BIGINT) AS gini_den,
               CAST(count(*) AS BIGINT) AS n_customers
        FROM r
    """,
    "source_ks_drift": f"""
        WITH d AS (
            SELECT source, {_N_TOKENS_SQL} AS v FROM documents
            WHERE source IN ('src0', 'src1')
        ),
        h AS (
            SELECT v,
                   CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS c0,
                   CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS c1
            FROM d GROUP BY v
        ),
        c AS (
            SELECT sum(c0) OVER (ORDER BY v) AS cum0,
                   sum(c1) OVER (ORDER BY v) AS cum1
            FROM h
        ),
        t AS (
            SELECT CAST(sum(c0) AS BIGINT) AS n0,
                   CAST(sum(c1) AS BIGINT) AS n1
            FROM h
        )
        SELECT CAST(max(abs(cum0 * n1 - cum1 * n0)) AS BIGINT) AS ks_num,
               CAST(n0 * n1 AS BIGINT) AS ks_den,
               n0 AS n_a, n1 AS n_b
        FROM c, t GROUP BY n0, n1
    """,
    "events_best_split": """
        WITH h AS (
            SELECT epoch_us(ts) // 3600000000 AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        c AS (
            SELECT hour,
                   sum(n) OVER (ORDER BY hour) AS cum,
                   row_number() OVER (ORDER BY hour) AS i
            FROM h
        ),
        t AS (
            SELECT CAST(count(*) AS BIGINT) AS nh,
                   CAST(sum(n) AS BIGINT) AS tot
            FROM h
        )
        SELECT split_hour, crit FROM (
            SELECT hour AS split_hour,
                   CAST(abs(cum * nh - tot * i) AS BIGINT) AS crit,
                   row_number() OVER (ORDER BY abs(cum * nh - tot * i) DESC,
                                      hour) AS rk
            FROM c, t
        ) WHERE rk = 1
    """,
    "orders_rapid_reorder": """
        SELECT a.o_custkey,
               a.o_orderkey AS okey1, b.o_orderkey AS okey2,
               CAST(abs(epoch_us(a.o_orderdate) - epoch_us(b.o_orderdate))
                    // 86400000000 AS BIGINT) AS gap_days
        FROM orders a JOIN orders b
          ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        WHERE abs(epoch_us(a.o_orderdate) - epoch_us(b.o_orderdate))
              <= CAST(14 AS BIGINT) * 86400 * 1000000
    """,
    "events_anomalous_hours": """
        WITH h AS (
            SELECT epoch_us(ts) // 3600000000 AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS c,
                   CAST(sum(n) AS BIGINT) AS s,
                   CAST(sum(n * n) AS BIGINT) AS ss
            FROM h
        )
        SELECT hour, n FROM h, m
        WHERE (c * n - s) > 0
          AND (c * n - s) * (c * n - s) > 9 * (c * ss - s * s)
    """,
    "customer_pareto": """
        WITH pc AS (
            SELECT o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS cents
            FROM orders GROUP BY 1
        ),
        r AS (
            SELECT cents,
                   sum(cents) OVER (ORDER BY cents DESC, o_custkey
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                   row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk
            FROM pc
        )
        SELECT CAST(min(rk) AS BIGINT) AS n_customers_80pct,
               CAST((SELECT count(*) FROM pc) AS BIGINT) AS n_customers,
               CAST((SELECT sum(cents) FROM pc) AS BIGINT) AS total_cents
        FROM r WHERE cum * 5 >= (SELECT sum(cents) FROM pc) * 4
    """,
    "doc_prefix_dedup": """
        SELECT md5(substr(coalesce(text, ''), 1, 100)) AS prefix_md5,
               CAST(min(doc_id) AS BIGINT) AS keep_id,
               count(*) AS n_docs
        FROM documents GROUP BY 1
    """,
    "orders_benford": """
        SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                 AS digit,
               count(*) AS n
        FROM orders GROUP BY 1
    """,
    "orders_cohort_ltv": """
        WITH fm AS (
            SELECT o_custkey,
                   CAST(min(year(o_orderdate) * 12 + month(o_orderdate) - 1)
                        AS BIGINT) AS cohort_m
            FROM orders GROUP BY 1
        )
        SELECT f.cohort_m,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                    - f.cohort_m AS BIGINT) AS offset_m,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               count(*) AS n_orders
        FROM orders o JOIN fm f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    """,
    "doc_rake_keyphrases": rf"""
        WITH toks AS (
            SELECT doc_id, u.tok, u.i
            FROM documents,
                 LATERAL (SELECT unnest(regexp_extract_all(lower(coalesce(text,'')), '\w+')) AS tok,
                          generate_subscripts(regexp_extract_all(lower(coalesce(text,'')), '\w+'), 1) AS i) u
        ),
        nons AS (
            SELECT doc_id, tok, i FROM toks
            WHERE tok NOT IN ({", ".join("'" + w + "'" for w in LANG_MARKERS["en"])})
        ),
        isl AS (
            SELECT doc_id, tok, i,
                   i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
            FROM nons
        ),
        ph AS (
            SELECT doc_id, grp, string_agg(tok, ' ' ORDER BY i) AS phrase,
                   CAST(count(*) AS BIGINT) AS plen
            FROM isl GROUP BY 1, 2
        ),
        w AS (
            SELECT i2.doc_id, i2.tok, CAST(count(*) AS BIGINT) AS freq,
                   CAST(sum(p.plen) AS BIGINT) AS degree
            FROM isl i2 JOIN ph p USING (doc_id, grp) GROUP BY 1, 2
        ),
        ps AS (
            SELECT i3.doc_id, i3.grp,
                   CAST(sum(w.degree) AS BIGINT) AS deg_sum,
                   CAST(sum(w.freq) AS BIGINT) AS freq_sum
            FROM isl i3 JOIN w ON w.doc_id = i3.doc_id AND w.tok = i3.tok
            GROUP BY 1, 2
        ),
        ded AS (
            SELECT DISTINCT p.doc_id, p.phrase, ps.deg_sum, ps.freq_sum,
                   p.plen AS n_words
            FROM ph p JOIN ps ON p.doc_id = ps.doc_id AND p.grp = ps.grp
        )
        SELECT doc_id, phrase, deg_sum, freq_sum, n_words FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY deg_sum DESC, phrase) AS rk
            FROM ded
        ) WHERE rk = 1
    """,
    "dominant_suppliers": """
        WITH ps AS (
            SELECT l_partkey AS p, l_suppkey AS s,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1, 2
        ), tot AS (
            SELECT s, qty,
                   CAST(sum(qty) OVER (PARTITION BY p) AS BIGINT) AS t
            FROM ps
        )
        SELECT s AS s_suppkey, count(*) AS n_parts
        FROM tot WHERE 2 * qty > t GROUP BY s
    """,
}
