"""Corpus term counting and vocabulary building (training prep).

``term_counts`` is the corpus-wide ``(token, n)`` histogram: one
vectorized explode per block (``str.findall`` + ``value_counts`` — no
Python loop over rows), map-side partials, one bucketed sum.

``vocab_build`` assigns contiguous ids by ``(count desc, token)`` —
the deterministic ordering every tokenizer-vocab format expects. The
id assignment is a GLOBAL row numbering, which is driver work over
the post-``min_count`` vocabulary: by Heap's law that residue is
10^5-10^7 tokens even at corpus scale, so the count gate is honest —
it trips loudly instead of silently shipping an unbounded vocab to
the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce

TERM_SCHEMA = pa.schema([("token", pa.string()), ("n", pa.int64())])
VOCAB_SCHEMA = pa.schema(
    [("token", pa.string()), ("n", pa.int64()), ("vocab_id", pa.int64())]
)

DRIVER_MAX_VOCAB = 5_000_000


def _explode_counts(b: pd.DataFrame, text_col: str) -> pd.DataFrame:
    toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
    arrs = [t for t in toks.to_numpy() if t]
    if not arrs:
        return pd.DataFrame(
            {"token": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
        )
    vc = pd.Series(np.concatenate(arrs)).value_counts(sort=False)
    return pd.DataFrame(
        {"token": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)}
    )


def term_counts(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """``(token, n)`` — corpus-wide ``\\w+`` token counts (lowercased)."""

    return bucketed_reduce(
        ds.select_columns([text_col]),
        ["token"],
        lambda g: g.groupby("token", sort=False, as_index=False)["n"].sum(),
        TERM_SCHEMA,
        combiner=lambda b: _explode_counts(b, text_col),
    )


GROUP_TERM_SCHEMA = pa.schema(
    [("group", pa.string()), ("token", pa.string()), ("n", pa.int64())]
)


def top_terms_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    *,
    text_col: str = "text",
    k: int = 10,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """``(group, token, n)`` — each group's top-``k`` tokens by
    ``(count desc, token asc)``. ONE bucketed shuffle: map-side
    per-(group, token) count partials, group-keyed reduce does the
    final sum plus a vectorized per-group head(k) (every group's rows
    land in one bucket, so the local top-k is the global one)."""

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
        lens = toks.str.len().to_numpy()
        arrs = [t for t in toks.to_numpy() if t]
        if not arrs:
            return pd.DataFrame(
                {
                    "group": pd.Series([], dtype=object),
                    "token": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        grp = np.repeat(b[group_col].to_numpy(object), lens)
        vc = (
            pd.DataFrame({"group": grp, "token": np.concatenate(arrs)})
            .groupby(["group", "token"], sort=False)
            .size()
        )
        return pd.DataFrame(
            {
                "group": vc.index.get_level_values(0).to_numpy(object),
                "token": vc.index.get_level_values(1).to_numpy(object),
                "n": vc.to_numpy(np.int64),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["group", "token"], sort=False, as_index=False)["n"].sum()
        s = s.sort_values(["group", "n", "token"], ascending=[True, False, True], kind="stable")
        return s.groupby("group", sort=False).head(k)

    return bucketed_reduce(
        ds.select_columns([group_col, text_col]).map_batches(
            _partial, batch_format="pandas", batch_size=None
        ),
        ["group"],
        _reduce,
        GROUP_TERM_SCHEMA,
        num_buckets=num_buckets,
    )


def vocab_build(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_count: int = 2,
    driver_max_vocab: int = DRIVER_MAX_VOCAB,
) -> ray.data.Dataset:
    """``(token, n, vocab_id)`` — ids are 1-based row numbers in
    ``(n desc, token asc)`` order over tokens with ``n >= min_count``."""
    counts = (
        term_counts(ds, text_col)
        .map_batches(lambda b: b[b["n"] >= min_count], batch_format="pandas")
        .materialize()
    )
    n_vocab = counts.count()
    if n_vocab > driver_max_vocab:
        raise ValueError(
            f"vocab_build: {n_vocab} tokens survive min_count={min_count} "
            f"(driver_max_vocab={driver_max_vocab}); raise min_count — a "
            "vocabulary larger than the gate is almost always a tokenizer "
            "bug, not a real vocab"
        )
    if n_vocab == 0:
        return ray.data.from_arrow(VOCAB_SCHEMA.empty_table())
    df = (
        counts.to_pandas()
        .sort_values(["n", "token"], ascending=[False, True], kind="stable")
        .reset_index(drop=True)
    )
    df["vocab_id"] = np.arange(1, len(df) + 1, dtype="int64")
    return ray.data.from_arrow(
        pa.table(
            {
                "token": pa.array(df["token"], pa.string()),
                "n": pa.array(df["n"], pa.int64()),
                "vocab_id": pa.array(df["vocab_id"], pa.int64()),
            }
        )
    )


POSTINGS_SCHEMA = pa.schema(
    [("token", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
)


def token_postings(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int | None = None,
) -> ray.data.Dataset:
    """Inverted-index build: ``(token, df, postings)`` where
    ``postings`` is the comma-joined ascending list of distinct doc
    ids containing the token — the search-index materialization shape.

    One bucketed shuffle over (token, doc) pairs: blocks emit their
    DISTINCT pairs (map-side combiner — a token repeated 100x in one
    doc crosses the exchange once), the token-keyed reduce sorts and
    joins. ``min_df``/``max_df`` drop hapax noise and stop-word
    postings (the classic IR cap that also bounds the hottest key's
    list length at corpus scale)."""

    def _pairs(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
        ids = b[id_col].to_numpy()
        arrs = [(i, t) for i, t in zip(ids, toks.to_numpy()) if len(t)]
        if not arrs:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object),
                 id_col: pd.Series([], dtype="int64")}
            )
        rep = np.concatenate([np.full(len(t), i, dtype=np.int64) for i, t in arrs])
        return pd.DataFrame(
            {"token": np.concatenate([t for _, t in arrs]), id_col: rep}
        ).drop_duplicates()

    def _combine(b: pd.DataFrame) -> pd.DataFrame:
        out = _pairs(b) if text_col in b.columns else b
        if "token" in out.columns and text_col not in out.columns:
            out = out.drop_duplicates()
        return out

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates().sort_values(["token", id_col], kind="stable")
        agg = g.groupby("token", sort=False).agg(
            df=(id_col, "size"),
            postings=(id_col, lambda s: ",".join(s.astype(str))),
        )
        agg = agg[agg["df"] >= min_df]
        if max_df is not None:
            agg = agg[agg["df"] <= max_df]
        return agg.reset_index()

    return bucketed_reduce(
        ds.select_columns([id_col, text_col]),
        ["token"],
        _reduce,
        POSTINGS_SCHEMA,
        combiner=_combine,
    )


KEYWORD_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("token", pa.string()), ("score_milli", pa.int64())]
)

DRIVER_MAX_DF_VOCAB = 5_000_000


def tfidf_keywords(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    driver_max_vocab: int = DRIVER_MAX_DF_VOCAB,
) -> ray.data.Dataset:
    """Top-``k`` TF-IDF keywords per document: ``(doc_id, token,
    score_milli)`` with ``score = tf * ln(N / df)`` in integer
    milli-units, ties broken ``(score desc, token asc)``.

    Two passes: ONE bucketed shuffle counts document frequencies (the
    df table is the vocabulary — Heap's-law count-gated like
    ``vocab_build``, broadcast once as sorted arrays); scoring +
    per-doc top-k is map-side vectorized, zero further shuffle.
    Hash-exact vs SQL: one ln() per (token, df), the tf*idf*1000
    product left-associative, np.round's half-to-even matched by
    roundbankers(x, 0); also pinned by a pure-Python twin test."""

    def _doc_pairs(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
        arrs = [np.unique(np.asarray(t, dtype=object)) for t in toks.to_numpy() if len(t)]
        if not arrs:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object), "one": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"token": np.concatenate(arrs), "one": np.int64(1)}
        ).groupby("token", as_index=False)["one"].sum()

    def _combine(b: pd.DataFrame) -> pd.DataFrame:
        if text_col in b.columns:
            return _doc_pairs(b)
        if len(b) == 0 or "token" not in b.columns:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object), "one": pd.Series([], dtype="int64")}
            )
        return b.groupby("token", as_index=False)["one"].sum()

    df_table = bucketed_reduce(
        ds.select_columns([text_col]),
        ["token"],
        lambda g: g.groupby("token", sort=False, as_index=False)["one"].sum(),
        pa.schema([("token", pa.string()), ("one", pa.int64())]),
        combiner=_combine,
    ).materialize()
    n_vocab = df_table.count()
    if n_vocab > driver_max_vocab:
        raise ValueError(
            f"tfidf_keywords: vocabulary {n_vocab} exceeds the driver gate"
        )
    n_docs = ds.count()
    vocab = df_table.to_pandas().sort_values("token", kind="stable")
    import ray as _ray

    model_ref = _ray.put(
        {
            "tokens": vocab["token"].to_numpy(object),
            "idf": np.log(float(n_docs) / vocab["one"].to_numpy(np.float64)),
        }
    )

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(model_ref) if isinstance(model_ref, _ray.ObjectRef) else model_ref
        toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
        out_id, out_tok, out_sc = [], [], []
        for did, t in zip(b[id_col].to_numpy(np.int64), toks.to_numpy()):
            if not len(t):
                continue
            u, tf = np.unique(np.asarray(t, dtype=object), return_counts=True)
            idx = np.searchsorted(m["tokens"], u)
            idx = np.clip(idx, 0, len(m["tokens"]) - 1)
            score = tf * m["idf"][idx]
            milli = np.round(score * 1000.0).astype(np.int64)
            order = np.lexsort((u, -milli))[:k]
            out_id.extend([did] * len(order))
            out_tok.extend(u[order])
            out_sc.extend(milli[order])
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_id, np.int64),
                "token": np.asarray(out_tok, object),
                "score_milli": np.asarray(out_sc, np.int64),
            }
        )

    from .infer import normalize_blocks

    return normalize_blocks(
        ds.select_columns([id_col, text_col]).map_batches(
            _score, batch_format="pandas"
        ),
        KEYWORD_SCHEMA,
    )


MERGES_SCHEMA = pa.schema(
    [("rank", pa.int64()), ("left", pa.string()), ("right", pa.string())]
)
BPE_COUNT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_words", pa.int64()), ("n_bpe_tokens", pa.int64())]
)


def bpe_train(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    n_merges: int = 200,
    driver_max_vocab: int = DRIVER_MAX_VOCAB,
) -> ray.data.Dataset:
    """Train a BPE merge table over the corpus: the corpus-scale work
    is ONE token-count shuffle (:func:`term_counts`, Heap's-law-gated
    residue like ``vocab_build``); the merge loop runs on the
    collected word-frequency table — which is how practical BPE
    trainers work (they never re-scan the corpus per merge). Returns
    ``(rank, left, right)``; deterministic (frequency ties break to
    the lexicographically smallest pair)."""
    from ..functions.bpe import bpe_train_from_counts

    counts = term_counts(ds, text_col).materialize()
    n_vocab = counts.count()
    if n_vocab > driver_max_vocab:
        raise ValueError(
            f"bpe_train: {n_vocab} distinct words exceed the driver gate"
        )
    wc = dict(zip(*(lambda df: (df["token"], df["n"]))(counts.to_pandas())))
    merges = bpe_train_from_counts(wc, n_merges)
    return ray.data.from_arrow(
        pa.table(
            {
                "rank": pa.array(range(len(merges)), pa.int64()),
                "left": pa.array([m[0] for m in merges], pa.string()),
                "right": pa.array([m[1] for m in merges], pa.string()),
            }
        )
    )


def bpe_token_counts(
    ds: ray.data.Dataset,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """``(doc_id, n_words, n_bpe_tokens)`` — encode every document with
    the broadcast merge table (map-only; per-batch distinct-word memo
    so each word is encoded once per batch regardless of repetition)."""
    import ray as _ray

    from ..functions.bpe import bpe_encode_word

    ranks_ref = _ray.put({tuple(m): i for i, m in enumerate(merges)})

    def _count(b: pd.DataFrame) -> pd.DataFrame:
        ranks = _ray.get(ranks_ref) if isinstance(ranks_ref, _ray.ObjectRef) else ranks_ref
        toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
        memo: dict[str, int] = {}
        out_w, out_t = [], []
        for t in toks.to_numpy():
            nw, nt = len(t), 0
            for w in t:
                n = memo.get(w)
                if n is None:
                    n = len(bpe_encode_word(w, ranks))
                    memo[w] = n
                nt += n
            out_w.append(nw)
            out_t.append(nt)
        return pd.DataFrame(
            {
                "doc_id": b[id_col].to_numpy(np.int64),
                "n_words": np.asarray(out_w, np.int64),
                "n_bpe_tokens": np.asarray(out_t, np.int64),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _count, batch_format="pandas"
    )


IDS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("ids_bin", pa.binary())]
)


def encode_token_ids(
    ds: ray.data.Dataset,
    vocab: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """``(doc_id, n_tokens, ids_bin)`` — every document encoded to its
    vocabulary-id sequence, packed as little-endian uint32 bytes (the
    binary-safe transport: a list column survives joins/shuffles less
    predictably and 4 bytes/token is the wire format shard writers
    want). OOV tokens encode as 0 (the conventional <unk> id; real
    vocab ids are 1-based from :func:`vocab_build`). Map-only after a
    one-time vocab broadcast."""
    vdf = vocab.select_columns(["token", "vocab_id"]).to_pandas()
    order = np.argsort(vdf["token"].to_numpy())
    v_tokens = vdf["token"].to_numpy()[order]
    v_ids = vdf["vocab_id"].to_numpy(np.int64)[order]
    ref = ray.put((v_tokens, v_ids))

    def _enc(b: pd.DataFrame) -> pd.DataFrame:
        toks_v, ids_v = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
        out_bin, out_n = [], []
        for t in toks.to_numpy():
            if len(t) == 0:
                out_bin.append(b"")
                out_n.append(0)
                continue
            arr = np.asarray(t)
            pos = np.searchsorted(toks_v, arr)
            pos_c = np.clip(pos, 0, max(len(toks_v) - 1, 0))
            hit = (toks_v[pos_c] == arr) if len(toks_v) else np.zeros(len(arr), bool)
            ids = np.where(hit, ids_v[pos_c] if len(ids_v) else 0, 0).astype(
                np.uint32
            )
            out_bin.append(ids.tobytes())
            out_n.append(len(ids))
        return pd.DataFrame(
            {
                "doc_id": b[id_col].to_numpy(np.int64),
                "n_tokens": np.asarray(out_n, np.int64),
                "ids_bin": out_bin,
            }
        )

    from .infer import normalize_blocks

    return normalize_blocks(
        ds.select_columns([id_col, text_col]).map_batches(
            _enc, batch_format="pandas", batch_size=None
        ),
        IDS_SCHEMA,
    )


BIGRAM_SCHEMA = pa.schema([("bigram", pa.string()), ("n", pa.int64())])
POSTING_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("phrase", pa.string()), ("n", pa.int64())]
)


def _doc_bigrams(b: pd.DataFrame, text_col: str, keep_doc: bool) -> pd.DataFrame:
    """Adjacent-token (positional) bigram strings per row, vectorized:
    one explode + one grouped shift — no per-document Python loop. The
    tokenization is the repo-wide ``lower + \\w+`` contract (same as
    ``term_counts`` and the ``top_tokens`` oracle)."""
    toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
    if keep_doc:
        toks.index = b["doc_id"].to_numpy(np.int64)
    ex = toks.explode()
    nxt = ex.groupby(level=0).shift(-1)
    mask = ex.notna() & nxt.notna()
    out = pd.DataFrame(
        {"__doc": ex.index[mask], "bigram": ex[mask] + " " + nxt[mask]}
    )
    return out


def bigram_counts(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """``(bigram, n)`` — corpus-wide POSITIONAL bigram (adjacent-token
    phrase) counts; same one-exchange shape as :func:`term_counts`."""

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        bg = _doc_bigrams(b, text_col, keep_doc=False)["bigram"]
        if not len(bg):
            return pd.DataFrame(
                {"bigram": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64")}
            )
        vc = bg.value_counts(sort=False)
        return pd.DataFrame(
            {"bigram": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)}
        )

    return bucketed_reduce(
        ds.select_columns([text_col]),
        ["bigram"],
        lambda g: g.groupby("bigram", sort=False, as_index=False)["n"].sum(),
        BIGRAM_SCHEMA,
        combiner=_partial,
    )


def phrase_postings(
    ds: ray.data.Dataset,
    phrases: list[str],
    *,
    text_col: str = "text",
) -> ray.data.Dataset:
    """``(doc_id, phrase, n)`` — positional postings: per-document
    occurrence counts of each phrase (adjacent-token bigram), the
    exact-phrase-query index primitive. ``phrases`` is a QUERY-sized
    list broadcast once via ``ray.put`` and read per actor batch —
    map-only, no exchange at all."""
    import ray as _ray

    ref = _ray.put(frozenset(phrases))

    def _match(b: pd.DataFrame) -> pd.DataFrame:
        pset = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        bg = _doc_bigrams(b, text_col, keep_doc=True)
        hit = bg[bg["bigram"].isin(pset)]
        if not len(hit):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "phrase": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64")}
            )
        out = hit.groupby(["__doc", "bigram"], sort=False).size().reset_index()
        out.columns = ["doc_id", "phrase", "n"]
        return out.astype({"doc_id": "int64", "n": "int64"})

    from .infer import normalize_blocks

    return normalize_blocks(
        ds.select_columns(["doc_id", text_col]).map_batches(
            _match, batch_format="pandas"
        ),
        POSTING_SCHEMA,
    )


DISTINCTIVE_SCHEMA = pa.schema(
    [("group", pa.string()), ("token", pa.string()),
     ("n", pa.int64()), ("lift_milli", pa.int64())]
)


def distinctive_terms_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    *,
    text_col: str = "text",
    k: int = 5,
    min_token_count: int = 20,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Each group's top-``k`` DISTINCTIVE tokens (c-TF-IDF-style) by
    exact integer lift ``lift_milli = n_gt * N * 1000 // (n_t * N_g)``
    — "what vocabulary sets this source apart", the corpus-triage
    signal a raw per-group count top-k (``top_terms_per_group``)
    cannot give because corpus-common words win it.

    Shape: ONE explode pass produces per-batch ``(group, token, n)``
    partials, materialized and reused by all three consumers — a
    token-keyed exchange that attaches the global token count, a tiny
    group-keyed exchange for the per-group token totals (bounded by
    group count; collected as the broadcast residue that also yields
    ``N``), and a group-keyed top-k reduce. The lift arithmetic runs
    in PYTHON ints inside the per-group reducer (``n*N*1000``
    overflows int64 at 100-TB token counts; rows per group are
    vocabulary-bounded), ties broken ``(lift desc, token asc)``.
    """
    import ray as _ray

    from .infer import bucketed_reduce

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
        toks.index = b[group_col].astype(str).to_numpy(object)
        ex = toks.explode().dropna()
        out = (
            pd.DataFrame({"group": ex.index.to_numpy(object), "token": ex.to_numpy(object)})
            .groupby(["group", "token"], sort=False, as_index=False).size()
            .rename(columns={"size": "n"})
        )
        return out

    partial_schema = pa.schema(
        [("group", pa.string()), ("token", pa.string()), ("n", pa.int64())]
    )
    partials = ds.select_columns([group_col, text_col]).map_batches(
        _partial, batch_format="pandas"
    ).materialize()

    def _with_nt(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["group", "token"], sort=False, as_index=False)["n"].sum()
        nt = c.groupby("token", sort=False)["n"].transform("sum")
        return c.assign(nt=nt.astype("int64"))

    gt = bucketed_reduce(
        partials, ["token"], _with_nt,
        pa.schema([("group", pa.string()), ("token", pa.string()),
                   ("n", pa.int64()), ("nt", pa.int64())]),
        num_buckets=num_buckets,
    )

    totals = bucketed_reduce(
        partials.map_batches(
            lambda b: b.groupby("group", sort=False, as_index=False)["n"].sum(),
            batch_format="pandas",
        ),
        ["group"],
        lambda g: g.groupby("group", sort=False, as_index=False)["n"].sum(),
        pa.schema([("group", pa.string()), ("n", pa.int64())]),
        num_buckets=num_buckets,
    ).to_pandas()  # bounded by group count — the broadcast residue
    ng_map = dict(zip(totals["group"], totals["n"].astype(int)))
    nn = int(totals["n"].sum())
    ng_ref = _ray.put((ng_map, nn))

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        ngm, total = (
            _ray.get(ng_ref) if isinstance(ng_ref, _ray.ObjectRef) else ng_ref
        )
        g = g[g["nt"] >= min_token_count]
        if not len(g):
            return pd.DataFrame(
                {"group": pd.Series([], dtype=object),
                 "token": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64"),
                 "lift_milli": pd.Series([], dtype="int64")}
            )
        lift = [
            (int(n) * total * 1000) // (int(nt) * ngm[grp])
            for grp, n, nt in zip(g["group"], g["n"], g["nt"])
        ]
        g = g.assign(lift_milli=pd.Series(lift, index=g.index, dtype="int64"))
        g = g.sort_values(
            ["group", "lift_milli", "token"], ascending=[True, False, True],
            kind="stable",
        )
        return (
            g.groupby("group", sort=False, as_index=False)
            .head(k)[["group", "token", "n", "lift_milli"]]
        )

    return bucketed_reduce(
        gt, ["group"], _topk, DISTINCTIVE_SCHEMA, num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# Vocabulary growth curve (Heaps-law statistics)
# ---------------------------------------------------------------------------

VOCAB_GROWTH_SCHEMA = pa.schema(
    [("threshold", pa.int64()), ("n_distinct", pa.int64())]
)


def vocab_growth(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    pcts: list[int] = (10, 25, 50, 100),
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Vocabulary growth curve: for each percentile cut of the doc-id
    axis, how many DISTINCT tokens appear in some document at or below
    it — the Heaps-law curve that sizes vocab tables and OOV budgets
    before committing to a tokenizer. Thresholds are
    ``(max_doc_id * pct) // 100`` so the SQL twin derives identical
    cuts with integer arithmetic.

    Exact and two passes: one token-keyed bucketed MIN reduce assigns
    each token its first-containing doc id (map-side per-block distinct
    (token, min doc) combiner, so a token crosses the exchange ~once
    per block, not once per occurrence); then every threshold shares
    ONE map over the reduced (token, first_doc) residue — per-block
    ``searchsorted``-free vectorized <=-counts, driver folds one row
    per (block, threshold)."""
    from .infer import normalize_blocks

    pcts = sorted(set(int(p) for p in pcts))
    first_schema = pa.schema([("token", pa.string()), ("fd", pa.int64())])

    max_doc = ds.max(doc_id_col)
    if max_doc is None:
        return ray.data.from_arrow(VOCAB_GROWTH_SCHEMA.empty_table())
    per_pct = np.array([(int(max_doc) * p) // 100 for p in pcts], np.int64)
    # colliding cuts would double-count in the per-block sum — count
    # each distinct threshold once, emit one row per pct at the end
    thresholds = np.unique(per_pct)

    def _first(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
        arrs = toks.to_numpy()
        ids = b[doc_id_col].to_numpy(np.int64)
        tok_flat, id_flat = [], []
        for t, d in zip(arrs, ids):
            if t:
                tok_flat.append(np.asarray(t, object))
                id_flat.append(np.full(len(t), d, np.int64))
        if not tok_flat:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object),
                 "fd": pd.Series([], dtype="int64")}
            )
        f = pd.DataFrame(
            {"token": np.concatenate(tok_flat), "fd": np.concatenate(id_flat)}
        )
        return f.groupby("token", sort=False, as_index=False)["fd"].min()

    first_doc = bucketed_reduce(
        ds.select_columns([text_col, doc_id_col]),
        ["token"],
        lambda g: g.groupby("token", sort=False, as_index=False)["fd"].min(),
        first_schema,
        combiner=_first,
        num_buckets=num_buckets,
    )

    def _counts(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"threshold": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        fd = b["fd"].to_numpy(np.int64)
        return pd.DataFrame(
            {"threshold": thresholds,
             "n": (fd[None, :] <= thresholds[:, None]).sum(axis=1)}
        )

    parts = normalize_blocks(
        first_doc.map_batches(_counts, batch_format="pandas", batch_size=None),
        pa.schema([("threshold", pa.int64()), ("n", pa.int64())]),
    ).to_pandas()  # bounded: |pcts| rows per block
    agg = (
        parts.groupby("threshold")["n"].sum()
        if len(parts)
        else pd.Series(dtype="int64")
    )
    out = pd.DataFrame(
        {"threshold": per_pct,
         "n_distinct": [int(agg.get(t, 0)) for t in per_pct]}
    )
    return ray.data.from_arrow(
        pa.Table.from_pandas(out.astype("int64"), schema=VOCAB_GROWTH_SCHEMA,
                             preserve_index=False)
    )


SEARCH_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_matched", pa.int64())])


def conjunctive_search(
    ds: ray.data.Dataset,
    terms: tuple[str, ...],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Boolean-AND retrieval through the inverted-index shuffle: docs
    containing EVERY query term (``\\w+`` tokens, lowercased). The
    map side emits distinct (doc, term) pairs ONLY for the broadcast
    query vocabulary — the exchange carries at most
    ``|terms| x |docs|`` rows, never the corpus token domain — and one
    doc-keyed count == k finishes it. This is the scalable form of
    multi-term search (a per-row regex scan re-reads every byte for
    every query; the posting shuffle touches each doc's term SET
    once)."""
    import re

    k = len(terms)
    if k == 0:
        raise ValueError("conjunctive_search: need at least one term")
    tset = frozenset(t.lower() for t in terms)
    tok_re = re.compile(r"\w+")

    pair_schema = pa.schema([(id_col, pa.int64()), ("term", pa.string())])

    def _pairs(b: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        hit: list[str] = []
        for doc_id, text in zip(b[id_col], b[text_col].fillna("")):
            present = tset.intersection(tok_re.findall(text.lower()))
            ids.extend([int(doc_id)] * len(present))
            hit.extend(sorted(present))
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "term": pd.Series(hit, dtype="object"),
            }
        )

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop_duplicates([id_col, "term"]).groupby(id_col).size()
        full = c[c == k]
        return pd.DataFrame(
            {
                id_col: full.index.to_numpy("int64"),
                "n_matched": np.full(len(full), k, dtype=np.int64),
            }
        )

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        _pairs, batch_format="pandas"
    )
    return bucketed_reduce(
        pairs, [id_col], _count, SEARCH_SCHEMA, num_buckets=num_buckets
    )


PROX_SCHEMA = pa.schema([("doc_id", pa.int64()), ("min_dist", pa.int64())])


def proximity_search(
    ds: ray.data.Dataset,
    term_a: str,
    term_b: str,
    *,
    window: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Positional proximity retrieval: docs where ``term_a`` and
    ``term_b`` occur within ``window`` tokens of each other, with the
    exact minimum token distance — the phrase-ish relevance signal
    boolean AND misses ("hash ... 3000 tokens ... join" is not about
    hash joins). Map-only: per doc one token scan + one searchsorted
    nearest-neighbor between the two (sorted) position lists; no
    shuffle. Hash-exact vs a positions-unnest SQL twin."""
    import re

    ta, tb = term_a.lower(), term_b.lower()
    tok_re = re.compile(r"\w+")

    def _scan(b: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        dists: list[int] = []
        for doc_id, text in zip(b[id_col], b[text_col].fillna("")):
            toks = tok_re.findall(text.lower())
            if not toks:
                continue
            arr = np.asarray(toks, dtype=object)
            pos_a = np.flatnonzero(arr == ta)
            pos_b = np.flatnonzero(arr == tb)
            if len(pos_a) == 0 or len(pos_b) == 0:
                continue
            # nearest b for each a via binary search on sorted pos_b
            idx = np.searchsorted(pos_b, pos_a)
            best = np.full(len(pos_a), np.iinfo(np.int64).max, dtype=np.int64)
            right_ok = idx < len(pos_b)
            best[right_ok] = pos_b[idx[right_ok]] - pos_a[right_ok]
            left_ok = idx > 0
            left = np.abs(pos_a[left_ok] - pos_b[idx[left_ok] - 1])
            best[left_ok] = np.minimum(best[left_ok], left)
            md = int(best.min())
            if md <= window:
                ids.append(int(doc_id))
                dists.append(md)
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "min_dist": pd.Series(dists, dtype="int64"),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _scan, batch_format="pandas"
    )
