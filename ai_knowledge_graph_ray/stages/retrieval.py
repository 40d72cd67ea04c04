"""Lexical retrieval over the corpus: integer-exact BM25
"more-like-this" top-k.

The reference repo's retrieval layer (``src/graph_rag/graph_retriever.py``)
ranks graph nodes against a query with an embedding store; the
corpus-side lexical analogue every training-data pipeline needs —
"find the k documents most similar to this one" for dedup triage,
eval-set contamination review, and mixture curation — is a BM25 scan.
This module implements it Ray-Data-first:

- The QUERY side is tiny by contract (a handful of probe documents):
  its distinct term sets are collected once behind a hard count gate
  and broadcast via ``ray.put``.
- Document frequencies are needed ONLY for query terms: one bucketed
  reduce over map-side ``(token, partial_df)`` restricted to the
  broadcast query vocabulary (the shuffle carries at most
  ``|query vocab| x blocks`` rows, never the corpus vocabulary).
- Scoring is a single shuffle-free pass: every document's score is
  complete within its own batch (tf, dl are per-document), so each
  batch emits its local per-query top-k and one final per-query
  reduce (``k x blocks`` rows per query) picks the global top-k.

Scores use a RATIONAL fixed-point BM25 variant — the classic
saturation / length-normalization shape with k1=1.2, b=0.75, but with
``ln``-free integer IDF ``((N - df) * 1000) // df`` — so the DuckDB
oracle reproduces every score bit-for-bit (float BM25 could only ever
be rows-checked). All intermediate products stay far below 2^63.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .infer import bucketed_reduce

K1_MILLI = 1200
B_MILLI = 750

DRIVER_MAX_QUERY_TERMS = 2_000_000

BM25_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("score_milli", pa.int64()),
        ("rank", pa.int64()),
    ]
)

_DF_SCHEMA = pa.schema([("token", pa.string()), ("df", pa.int64())])


def _tokens(texts: pd.Series) -> pd.Series:
    """Lowercased ``\\w+`` tokens — the corpus-wide convention shared
    with ``vocab.term_counts`` and the DuckDB oracles."""
    return texts.fillna("").str.lower().str.findall(r"\w+")


def _doc_token_frame(batch: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    """``(id, token)`` exploded rows (one per token OCCURRENCE)."""
    toks = _tokens(batch[text_col])
    n = toks.str.len().to_numpy()
    if n.sum() == 0:
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"), "token": pd.Series([], dtype=object)}
        )
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks.to_numpy() if len(t)])
    ids = np.repeat(batch[id_col].to_numpy(np.int64), n)
    return pd.DataFrame({id_col: ids, "token": flat})


def bm25_more_like_this(
    docs: ray.data.Dataset,
    query_ids: list[int] | np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1_milli: int = K1_MILLI,
    b_milli: int = B_MILLI,
    driver_max_query_terms: int = DRIVER_MAX_QUERY_TERMS,
) -> ray.data.Dataset:
    """Top-``k`` BM25 matches per query document: ``(query_id, doc_id,
    score_milli, rank)``, ranked ``(score desc, doc_id asc)``.

    ``query_ids`` select the probe documents; their DISTINCT token
    sets are the queries ("more like this"). Documents with zero
    tokens are excluded from the corpus statistics (they can never
    match). The query side is capped at ``driver_max_query_terms``
    ``(query, token)`` pairs — a corpus-sized query set is a caller
    error, not a spill case (same policy as ``scenario.py``).
    """
    qid_arr = np.asarray(sorted(set(int(q) for q in query_ids)), dtype=np.int64)
    if len(qid_arr) == 0:
        return ray.data.from_arrow(BM25_SCHEMA.empty_table())

    slim = docs.select_columns([id_col, text_col])

    # --- query term sets (tiny by contract; hard gate) ---------------
    qid_set_ref = ray.put(qid_arr)

    def _query_terms(b: pd.DataFrame) -> pd.DataFrame:
        qids = ray.get(qid_set_ref) if isinstance(qid_set_ref, ray.ObjectRef) else qid_set_ref
        sub = b[np.isin(b[id_col].to_numpy(np.int64), qids)]
        if len(sub) == 0:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"), "token": pd.Series([], dtype=object)}
            )
        e = _doc_token_frame(sub, id_col, text_col).drop_duplicates()
        return e.rename(columns={id_col: "query_id"})

    qterms_ds = slim.map_batches(
        _query_terms, batch_format="pandas", batch_size=None
    ).materialize()
    n_qterms = qterms_ds.count()
    if n_qterms > driver_max_query_terms:
        raise ValueError(
            f"bm25_more_like_this: {n_qterms} (query, token) pairs exceed "
            f"driver_max_query_terms={driver_max_query_terms}; a query set "
            "this large is a caller error — pass fewer/shorter probes"
        )
    if n_qterms == 0:
        return ray.data.from_arrow(BM25_SCHEMA.empty_table())
    qterms = qterms_ds.to_pandas().drop_duplicates()
    qvocab = np.asarray(sorted(qterms["token"].unique()), dtype=object)

    # --- corpus stats + df in ONE scan: the stats partials (docs with
    # >=1 token, total tokens) travel as sentinel rows through the same
    # bucketed sum as the per-token dfs ("#..." can never collide
    # with a \w+ token), so the corpus is read once here, not twice ----
    _S_DOCS, _S_TOKENS = "#stats_docs", "#stats_tokens"
    qvocab_ref = ray.put(qvocab)

    def _df_partial(b: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(qvocab_ref) if isinstance(qvocab_ref, ray.ObjectRef) else qvocab_ref
        n = _tokens(b[text_col]).str.len().to_numpy(np.int64) if len(b) else np.zeros(0, np.int64)
        e = _doc_token_frame(b, id_col, text_col)
        e = e[e["token"].isin(qv)].drop_duplicates()
        vc = e["token"].value_counts(sort=False)
        return pd.DataFrame(
            {
                "token": np.concatenate(
                    [vc.index.to_numpy(object), np.array([_S_DOCS, _S_TOKENS], object)]
                ),
                "df": np.concatenate(
                    [vc.to_numpy(np.int64),
                     np.array([int((n > 0).sum()), int(n.sum())], np.int64)]
                ),
            }
        )

    df_ds = bucketed_reduce(
        slim,
        ["token"],
        lambda g: g.groupby("token", sort=False, as_index=False)["df"].sum(),
        _DF_SCHEMA,
        combiner=_df_partial,
    )
    df_pd = df_ds.to_pandas()  # bounded by |query vocab| + 2 (gated above)
    sent = df_pd["token"].isin([_S_DOCS, _S_TOKENS])
    by_tok = dict(zip(df_pd.loc[sent, "token"], df_pd.loc[sent, "df"]))
    n_docs = int(by_tok.get(_S_DOCS, 0))
    total_tokens = int(by_tok.get(_S_TOKENS, 0))
    df_pd = df_pd[~sent]
    if n_docs == 0:
        return ray.data.from_arrow(BM25_SCHEMA.empty_table())
    avgdl_milli = total_tokens * 1000 // n_docs

    # idf_milli = ((N - df) * 1000) // df  — ln-free rational IDF
    df_pd["idf_milli"] = ((n_docs - df_pd["df"].to_numpy(np.int64)) * 1000) // df_pd[
        "df"
    ].to_numpy(np.int64)
    qjoin = qterms.merge(df_pd[["token", "idf_milli"]], on="token", how="inner")
    qjoin_ref = ray.put(qjoin)

    # --- scoring pass: shuffle-free, local top-k per batch -----------
    k1p = k1_milli + 1000

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        qj = ray.get(qjoin_ref) if isinstance(qjoin_ref, ray.ObjectRef) else qjoin_ref
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
                "score_milli": pd.Series([], dtype="int64"),
            }
        )
        e = _doc_token_frame(b, id_col, text_col)
        if len(e) == 0:
            return empty
        dl = e.groupby(id_col, sort=False).size().rename("dl").reset_index()
        e = e[e["token"].isin(qj["token"].unique())]
        if len(e) == 0:
            return empty
        tf = e.groupby([id_col, "token"], sort=False).size().rename("tf").reset_index()
        m = tf.merge(qj, on="token", how="inner").merge(dl, on=id_col, how="left")
        if len(m) == 0:
            return empty
        tfv = m["tf"].to_numpy(np.int64)
        dlv = m["dl"].to_numpy(np.int64)
        idf = m["idf_milli"].to_numpy(np.int64)
        rel_len_milli = dlv * 1000000 // avgdl_milli
        denom_milli = tfv * 1000 + (
            k1_milli * (1000 - b_milli + (b_milli * rel_len_milli) // 1000)
        ) // 1000
        tf_part_milli = tfv * k1p * 1000 // denom_milli
        m["contrib"] = (idf * tf_part_milli) // 1000
        s = (
            m.groupby(["query_id", id_col], sort=False)["contrib"]
            .sum()
            .rename("score_milli")
            .reset_index()
            .rename(columns={id_col: "doc_id"})
        )
        s = s.sort_values(
            ["query_id", "score_milli", "doc_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        out = s.groupby("query_id", sort=False).head(k)
        return out.astype(
            {"query_id": "int64", "doc_id": "int64", "score_milli": "int64"}
        )

    cand_schema = pa.schema(
        [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score_milli", pa.int64())]
    )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["query_id", "score_milli", "doc_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        out = g.groupby("query_id", sort=False).head(k).copy()
        out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
        return out

    cands = slim.map_batches(_score, batch_format="pandas", batch_size=None)
    return bucketed_reduce(cands, ["query_id"], _final, BM25_SCHEMA)


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (grouped, one shuffle)
# ---------------------------------------------------------------------------

RRF_SCALE = 1_000_000


def rrf_fuse_grouped(
    ds: ray.data.Dataset,
    group_col: str,
    item_col: str,
    order_a: tuple[list[str], list[bool]],
    order_b: tuple[list[str], list[bool]],
    *,
    k: int = 60,
    scale: int = RRF_SCALE,
    topk: int = 3,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    within-group rankings computed from the SAME rows: each item gets
    ``scale // (k + rank_a) + scale // (k + rank_b)`` (exact integer —
    the float 1/(k+r) form could never hash-match SQL) and the top
    ``topk`` per group survive, ties broken by item id. ``order_a`` /
    ``order_b`` are ``(columns, ascending_flags)`` row_number sort
    keys; append the item column yourself if the key needs a
    deterministic tie-break.

    ONE group-keyed bucketed shuffle total: both ranks, the fusion
    arithmetic and the per-group top-k all happen vectorized inside
    the reduce — fusing two window functions and a join into a single
    exchange (the composed form would cost three)."""
    from .infer import bucketed_reduce

    out_schema = pa.schema(
        [
            (group_col, pa.string()),
            (item_col, pa.string()),
            ("rrf_scaled", pa.int64()),
        ]
    )

    cols = sorted(
        {group_col, item_col} | set(order_a[0]) | set(order_b[0])
    )

    def _rank(g: pd.DataFrame, order) -> np.ndarray:
        # within-group row_number, fully vectorized: one sort by
        # (group, keys), cumcount per group, scatter back to g's order
        by, asc = order
        s = g.sort_values(
            [group_col] + by, ascending=[True] + list(asc), kind="stable"
        )
        r = s.groupby(group_col, sort=False).cumcount().to_numpy(np.int64) + 1
        return pd.Series(r, index=s.index).reindex(g.index).to_numpy(np.int64)

    def _fuse(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {group_col: pd.Series([], dtype=object),
                 item_col: pd.Series([], dtype=object),
                 "rrf_scaled": pd.Series([], dtype="int64")}
            )
        ra = _rank(g, order_a)
        rb = _rank(g, order_b)
        f = pd.DataFrame(
            {
                group_col: g[group_col].astype(str).to_numpy(object),
                item_col: g[item_col].astype(str).to_numpy(object),
                "rrf_scaled": scale // (k + ra) + scale // (k + rb),
            }
        ).sort_values(
            [group_col, "rrf_scaled", item_col],
            ascending=[True, False, True],
            kind="stable",
        )
        keep = f.groupby(group_col, sort=False).cumcount() < topk
        return f.loc[keep.to_numpy()]

    return bucketed_reduce(
        ds.select_columns(cols),
        [group_col],
        _fuse,
        out_schema,
        num_buckets=num_buckets,
    )


RANKING_METRICS_SCHEMA_SUFFIX = [
    ("n_queries", pa.int64()),
    ("n_hits", pa.int64()),
    ("sum_rr_x1e6", pa.int64()),
]


def ranking_metrics(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    query_col: str,
    order_col: str,
    tie_col: str,
    relevant_col: str,
    k: int = 10,
    scale: int = 1_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Grouped ranking-quality metrics (hit@k + scaled MRR) — the eval
    harness every retrieval / recommender stage needs: given candidate
    rows per query with a boolean relevance label, rank within each
    query by ``(order_col DESC, tie_col ASC)`` and aggregate per
    ``group_col``:

    - ``n_queries``: queries with >= 1 candidate row,
    - ``n_hits``: queries whose top-``k`` contains a relevant row,
    - ``sum_rr_x1e6``: sum over queries of ``scale // first_relevant_rank``
      (0 when no relevant row in the top-k) — integer reciprocal rank,
      so MRR = sum_rr / (scale * n_queries) is derivable exactly and
      the result hash-matches a ``row_number()`` SQL twin (float RR
      never could).

    ONE query-keyed bucketed shuffle: every query's candidates land in
    one bucket, ranking is a vectorized sort + cumcount (no per-query
    Python), per-bucket partials collapse to one row per group; the
    tiny group-keyed second reduce sums partials. Skew note: a single
    query's candidate list must fit a bucket — cap candidate fan-in
    upstream if a query can exceed block memory.
    """
    group_schema = pa.schema(
        [(group_col, pa.string())] + RANKING_METRICS_SCHEMA_SUFFIX
    )

    def _per_query(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [query_col, order_col, tie_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        rk = g.groupby(query_col, sort=False).cumcount() + 1
        rel = g[relevant_col].astype(bool) & (rk <= k)
        hit_rk = pd.Series(rk.where(rel), index=g.index)
        per = (
            pd.DataFrame(
                {
                    group_col: g[group_col],
                    query_col: g[query_col],
                    "first_rel": hit_rk,
                }
            )
            .groupby([group_col, query_col], as_index=False)
            .agg(first_rel=("first_rel", "min"))
        )
        fr = per["first_rel"]
        rr = pd.Series(0, index=per.index, dtype="int64")
        got = fr.notna()
        rr[got] = (scale // fr[got].astype("int64")).astype("int64")
        out = (
            pd.DataFrame(
                {
                    group_col: per[group_col],
                    "n_queries": 1,
                    "n_hits": got.astype("int64"),
                    "sum_rr_x1e6": rr,
                }
            )
            .groupby(group_col, as_index=False)
            .sum()
        )
        for c in ("n_queries", "n_hits", "sum_rr_x1e6"):
            out[c] = out[c].astype("int64")
        return out

    def _sum_groups(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(group_col, as_index=False)[
            ["n_queries", "n_hits", "sum_rr_x1e6"]
        ].sum()
        for c in ("n_queries", "n_hits", "sum_rr_x1e6"):
            out[c] = out[c].astype("int64")
        return out

    cols = [group_col, query_col, order_col, tie_col, relevant_col]
    partials = bucketed_reduce(
        ds.select_columns(cols),
        [query_col],
        _per_query,
        group_schema,
        num_buckets=num_buckets,
    )
    return bucketed_reduce(
        partials,
        [group_col],
        _sum_groups,
        group_schema,
        combiner=_sum_groups,
        num_buckets=num_buckets,
    )
