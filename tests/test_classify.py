"""Integer rational text classifier (stages/classify.py): planted
two-class recovery, exact agreement with a pure-Python twin, layout
independence, empty-doc prior fallback, and tie-breaks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from ai_knowledge_graph_ray.stages.classify import (
    SCALE,
    nb_classify,
    nb_self_classify,
    nb_train,
)

SPORT = ["goal", "match", "league", "coach", "season", "striker"]
MONEY = ["bond", "yield", "equity", "market", "rate", "dividend"]
STOP = ["the", "a", "of", "and"]


def _corpus(n_per_class: int = 30, seed: int = 7) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    did = 0
    for label, words in (("sports", SPORT), ("finance", MONEY)):
        for _ in range(n_per_class):
            toks = list(rng.choice(words, size=12)) + list(rng.choice(STOP, size=6))
            rng.shuffle(toks)
            rows.append({"doc_id": did, "source": label, "text": " ".join(toks)})
            did += 1
    return pd.DataFrame(rows)


def _python_twin(df: pd.DataFrame) -> pd.DataFrame:
    """Brute-force integer scoring with dict arithmetic — the
    spec the distributed kernel must match exactly."""
    import re

    tok = lambda s: re.findall(r"\w+", s.lower())
    toks = {r.doc_id: tok(r.text or "") for r in df.itertuples()}
    classes = sorted(df["source"].astype(str).unique())
    counts: dict[tuple[str, str], int] = {}
    totals = {c: 0 for c in classes}
    for r in df.itertuples():
        for t in toks[r.doc_id]:
            counts[(r.source, t)] = counts.get((r.source, t), 0) + 1
            totals[r.source] += 1
    vocab = {t for (_, t) in counts}
    v = len(vocab)
    n_total = len(df)
    ndocs = df["source"].value_counts().to_dict()
    out = []
    for r in df.itertuples():
        best_c, best_s = None, None
        for c in classes:
            s = SCALE * ndocs[c] // n_total
            for t in toks[r.doc_id]:
                n = counts.get((c, t))
                if n is None:
                    s += SCALE // (totals[c] + v)
                else:
                    s += SCALE * (n + 1) // (totals[c] + v)
            if best_s is None or s > best_s:
                best_c, best_s = c, s
        out.append({"doc_id": r.doc_id, "pred_class": best_c, "score": best_s})
    return pd.DataFrame(out).sort_values("doc_id").reset_index(drop=True)


def _run(df: pd.DataFrame, parts: int = 1) -> pd.DataFrame:
    ds = ray.data.from_pandas(df)
    if parts > 1:
        ds = ds.repartition(parts)
    return (
        nb_self_classify(ds, class_col="source")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class TestNbClassify:
    def test_planted_classes_recovered(self):
        df = _corpus()
        got = _run(df)
        merged = got.merge(df[["doc_id", "source"]], on="doc_id")
        acc = (merged["pred_class"] == merged["source"]).mean()
        assert acc == 1.0

    def test_matches_python_twin_exactly(self):
        df = _corpus(n_per_class=15, seed=3)
        got = _run(df)
        want = _python_twin(df)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_layout_independent(self):
        df = _corpus(n_per_class=20, seed=11)
        a = _run(df, parts=1)
        b = _run(df, parts=7)
        pd.testing.assert_frame_equal(a, b)

    def test_empty_doc_gets_prior_argmax(self):
        df = _corpus(n_per_class=5, seed=5)
        # unbalanced priors: add extra finance docs so prior argmax is finance
        extra = pd.DataFrame(
            [
                {"doc_id": 100 + i, "source": "finance", "text": "bond yield"}
                for i in range(5)
            ]
        )
        empty = pd.DataFrame([{"doc_id": 999, "source": "sports", "text": ""}])
        df = pd.concat([df, extra, empty], ignore_index=True)
        got = _run(df)
        row = got[got["doc_id"] == 999].iloc[0]
        assert row["pred_class"] == "finance"  # larger prior wins on no tokens
        want = _python_twin(df)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_tiebreak_class_ascending(self):
        # perfectly symmetric corpus: identical token stats per class
        df = pd.DataFrame(
            [
                {"doc_id": 0, "source": "b_cls", "text": "alpha beta"},
                {"doc_id": 1, "source": "a_cls", "text": "alpha beta"},
                {"doc_id": 2, "source": "b_cls", "text": "gamma"},
                {"doc_id": 3, "source": "a_cls", "text": "gamma"},
            ]
        )
        got = _run(df)
        # every doc scores equal under both classes -> min class name wins
        assert set(got["pred_class"]) == {"a_cls"}

    def test_model_gate_trips(self):
        df = _corpus(n_per_class=5)
        ds = ray.data.from_pandas(df)
        with pytest.raises(ValueError, match="driver_max_model_rows"):
            nb_train(ds, class_col="source", driver_max_model_rows=3)

    def test_unseen_tokens_use_default_weight(self):
        df = _corpus(n_per_class=10, seed=2)
        ds = ray.data.from_pandas(df)
        model = nb_train(ds, class_col="source")
        test = ray.data.from_pandas(
            pd.DataFrame(
                [{"doc_id": 77, "text": "zzz qqq www goal goal match"}]
            )
        )
        got = nb_classify(test, model).to_pandas()
        assert got.iloc[0]["pred_class"] == "sports"
