"""Multinomial text classification (Naive-Bayes-shaped) at corpus
scale — the quality/domain classifier step of a webtext pipeline
(GPT-3 / CCNet curate with exactly this shape: train a linear
classifier on labeled text, score every document, filter or bucket).

Training is ONE bucketed shuffle: per-batch ``(class, token)`` count
partials (vectorized explode + groupby, no per-row Python), a
token-keyed reduce sums them, and the model residue — bounded by
Heap's law x n_classes, the same argument ``vocab_build`` makes — is
collected behind a hard count gate that trips loudly.

Scoring is shuffle-free: the integer weight matrix broadcasts once
(``ray.put``) and each batch does a flat searchsorted + one
``np.add.reduceat`` per class block. No per-document Python.

Hash-exactness deviation (documented): classic NB sums float log
probabilities, which can never value-hash against an oracle. Instead
each token weight is the RATIONAL fixed-point class-conditional
probability ``(SCALE*(n_ct+1)) // (total_c + V)`` (Laplace smoothing)
and the prior is ``(SCALE*docs_c) // N`` — all-integer sums, so the
distributed scores and a pure-SQL twin agree bit for bit (the
``bm25_more_like_this`` ln-free trick applied to classification).
The argmax therefore ranks by average smoothed token probability
rather than log likelihood; for the filtering/bucketing use this
serves, that is an accepted, pinned semantics, not an approximation
of something else.

The reference has no classifier; this extends the webtext hygiene
family (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .infer import bucketed_reduce, normalize_blocks

SCALE = 1_000_000
DRIVER_MAX_MODEL_ROWS = 5_000_000

TOKEN_RE = r"\w+"

_COUNT_SCHEMA = pa.schema(
    [("class", pa.string()), ("token", pa.string()), ("n", pa.int64())]
)

NB_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("pred_class", pa.string()), ("score", pa.int64())]
)


@dataclass
class NBModel:
    """Integer rational classifier: ``classes`` sorted ascending,
    ``vocab`` sorted token array, ``weights[v, c]`` the fixed-point
    token weight, ``dflt[c]`` the unseen-token weight, ``priors[c]``
    the class prior — every entry an exact int64."""

    classes: list[str]
    vocab: np.ndarray  # (V,) unicode, sorted
    weights: np.ndarray  # (V, C) int64
    dflt: np.ndarray  # (C,) int64
    priors: np.ndarray  # (C,) int64


def _class_token_partials(
    b: pd.DataFrame, class_col: str, text_col: str
) -> pd.DataFrame:
    if len(b) == 0 or text_col not in b.columns:
        cols = {"class", "token", "n"} & set(b.columns)
        if cols == {"class", "token", "n"}:
            return b
        return pd.DataFrame(
            {
                "class": pd.Series([], dtype=object),
                "token": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            }
        )
    toks = b[text_col].fillna("").str.lower().str.findall(TOKEN_RE)
    lens = toks.str.len().to_numpy()
    arrs = [t for t in toks.to_numpy() if t]
    if not arrs:
        return pd.DataFrame(
            {
                "class": pd.Series([], dtype=object),
                "token": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            }
        )
    cls = np.repeat(b[class_col].astype(str).to_numpy(object), lens)
    vc = (
        pd.DataFrame({"class": cls, "token": np.concatenate(arrs)})
        .groupby(["class", "token"], sort=False)
        .size()
    )
    return pd.DataFrame(
        {
            "class": vc.index.get_level_values(0).to_numpy(object),
            "token": vc.index.get_level_values(1).to_numpy(object),
            "n": vc.to_numpy(np.int64),
        }
    )


def nb_train(
    ds: ray.data.Dataset,
    *,
    class_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = SCALE,
    driver_max_model_rows: int = DRIVER_MAX_MODEL_ROWS,
) -> NBModel:
    """Fit the integer rational classifier from labeled documents.

    One ``(class, token)`` bucketed count shuffle; the model residue
    (distinct class-token pairs) is counted BEFORE it is collected and
    trips loudly over ``driver_max_model_rows`` — a model bigger than
    the gate means the tokenizer exploded, not that the corpus needs a
    bigger driver."""
    counts = bucketed_reduce(
        ds.select_columns([class_col, text_col]),
        ["class", "token"],
        lambda g: g.groupby(["class", "token"], sort=False, as_index=False)[
            "n"
        ].sum(),
        _COUNT_SCHEMA,
        combiner=lambda b: _class_token_partials(b, class_col, text_col),
    ).materialize()
    n_rows = counts.count()
    if n_rows > driver_max_model_rows:
        raise ValueError(
            f"nb_train: {n_rows} distinct (class, token) rows exceed "
            f"driver_max_model_rows={driver_max_model_rows}; by Heap's law a "
            "real vocabulary never gets here — check the tokenizer or raise "
            "the gate deliberately"
        )

    # tiny per-class doc counts: one grouped-count reduce (<= n_classes rows)
    cls_schema = pa.schema([("class", pa.string()), ("n_docs", pa.int64())])
    cls_counts = bucketed_reduce(
        ds.select_columns([class_col]),
        ["class"],
        lambda g: g.groupby("class", sort=False, as_index=False)["n_docs"].sum(),
        cls_schema,
        combiner=lambda b: (
            b
            if set(b.columns) == {"class", "n_docs"}
            else b[class_col]
            .astype(str)
            .value_counts(sort=False)
            .rename_axis("class")
            .reset_index(name="n_docs")
        ),
    ).to_pandas()

    cdf = counts.to_pandas()
    classes = sorted(cls_counts["class"].astype(str))
    cindex = {c: i for i, c in enumerate(classes)}
    vocab = np.sort(cdf["token"].unique()) if len(cdf) else np.array([], dtype=object)
    v_size = len(vocab)
    n_total = int(cls_counts["n_docs"].sum())

    totals = np.zeros(len(classes), dtype=np.int64)
    if len(cdf):
        tsum = cdf.groupby("class", sort=False)["n"].sum()
        for c, t in tsum.items():
            totals[cindex[str(c)]] = int(t)

    denom = totals + np.int64(v_size)
    denom_safe = np.where(denom > 0, denom, 1)
    dflt = (np.int64(scale) // denom_safe).astype(np.int64)
    dflt[denom == 0] = 0

    ndocs = np.zeros(len(classes), dtype=np.int64)
    for _, row in cls_counts.iterrows():
        ndocs[cindex[str(row["class"])]] = int(row["n_docs"])
    priors = (np.int64(scale) * ndocs // max(n_total, 1)).astype(np.int64)

    weights = np.tile(dflt, (v_size, 1)).astype(np.int64)
    if len(cdf):
        vi = np.searchsorted(vocab, cdf["token"].to_numpy())
        ci = np.array([cindex[str(c)] for c in cdf["class"]], dtype=np.int64)
        n = cdf["n"].to_numpy(np.int64)
        weights[vi, ci] = np.int64(scale) * (n + 1) // denom_safe[ci]
    return NBModel(
        classes=classes,
        vocab=vocab.astype(str),
        weights=weights,
        dflt=dflt,
        priors=priors,
    )


def nb_classify(
    ds: ray.data.Dataset,
    model: NBModel,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """``(doc_id, pred_class, score)`` — shuffle-free scoring pass.

    Per batch: one flat tokenize, one searchsorted against the sorted
    vocab, one weight gather and one ``np.add.reduceat`` per doc span;
    tokens outside the vocab fall back to the per-class default weight
    (identical to the SQL twin's COALESCE). Tie-break: highest score,
    then class ascending (np.argmax first-hit over ascending classes)."""
    model_ref = ray.put(model)

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        m: NBModel = (
            ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        )
        n_cls = len(m.classes)
        ids = b[id_col].to_numpy().astype(np.int64)
        toks = b[text_col].fillna("").str.lower().str.findall(TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        scores = np.tile(m.priors, (len(b), 1)).astype(np.int64)
        arrs = [t for t in toks.to_numpy() if t]
        if arrs and n_cls:
            flat = np.concatenate(arrs)
            if len(m.vocab):
                pos = np.searchsorted(m.vocab, flat)
                pos_c = np.clip(pos, 0, len(m.vocab) - 1)
                hit = m.vocab[pos_c] == flat
                w = np.where(
                    hit[:, None], m.weights[pos_c], m.dflt[None, :]
                ).astype(np.int64)
            else:
                w = np.tile(m.dflt, (len(flat), 1)).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            nonempty = lens > 0
            # reduceat over only the nonempty spans, then scatter back
            ne_starts = starts[nonempty]
            if len(ne_starts):
                sums = np.add.reduceat(w, ne_starts, axis=0)
                scores[nonempty] += sums
        if n_cls:
            best = np.argmax(scores, axis=1)
            pred = np.array(m.classes, dtype=object)[best]
            best_score = scores[np.arange(len(b)), best]
        else:
            pred = np.full(len(b), "", dtype=object)
            best_score = np.zeros(len(b), dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": ids, "pred_class": pred, "score": best_score}
        )

    return normalize_blocks(
        ds.select_columns([id_col, text_col]).map_batches(
            _score, batch_format="pandas", batch_size=None
        ),
        NB_SCHEMA,
    )


def nb_self_classify(
    ds: ray.data.Dataset,
    *,
    class_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = SCALE,
) -> ray.data.Dataset:
    """Train on the labeled corpus and score the SAME corpus — the
    standard train-then-filter curate shape (and the oracle-checkable
    composition: both halves are deterministic functions of the
    input)."""
    model = nb_train(
        ds, class_col=class_col, text_col=text_col, id_col=id_col, scale=scale
    )
    return nb_classify(ds, model, text_col=text_col, id_col=id_col)
