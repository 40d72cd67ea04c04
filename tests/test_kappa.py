"""Confusion matrix + Cohen's kappa (exact integer form)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.text_analysis import (
    kappa_from_confusion,
    lang_confusion,
)


def _conf(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "lang_pred": pa.array([r[0] for r in rows], pa.string()),
                "lang_true": pa.array([r[1] for r in rows], pa.string()),
                "n": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


class TestKappa:
    def test_perfect_agreement(self):
        out = kappa_from_confusion(_conf([("en", "en", 10), ("de", "de", 5)])).iloc[0]
        assert out["kappa_num"] == out["kappa_den"] > 0  # kappa = 1

    def test_textbook_case(self):
        # classic 2x2: a=20 agree-yes, d=15 agree-no, b=5, c=10
        out = kappa_from_confusion(
            _conf([("y", "y", 20), ("y", "n", 5), ("n", "y", 10), ("n", "n", 15)])
        ).iloc[0]
        n, agree = 50, 35
        marg = 25 * 30 + 25 * 20  # rows y=25,n=25; cols y=30,n=20
        assert out["n_total"] == n and out["n_agree"] == agree
        assert out["kappa_num"] == n * agree - marg
        assert out["kappa_den"] == n * n - marg
        # kappa = 500/1250 = 0.4 — the textbook value
        assert out["kappa_num"] * 5 == out["kappa_den"] * 2

    def test_systematic_disagreement_negative(self):
        out = kappa_from_confusion(
            _conf([("a", "b", 10), ("b", "a", 10)])
        ).iloc[0]
        assert out["kappa_num"] < 0  # below-chance agreement

    def test_empty(self):
        empty = _conf([]).filter(lambda r: False)
        out = kappa_from_confusion(empty).iloc[0]
        assert out["n_total"] == 0 and out["kappa_den"] == 0


class TestLangConfusion:
    def test_counts_sum_to_corpus(self):
        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(
                        ["the quick fox and the dog", "der und das ist", "xyzzy"],
                        pa.string(),
                    ),
                    "lang": pa.array(["en", "de", "zh"], pa.string()),
                }
            )
        )
        out = lang_confusion(docs).to_pandas()
        assert out["n"].sum() == 3
        got = {(r["lang_pred"], r["lang_true"]): r["n"] for _, r in out.iterrows()}
        assert got.get(("en", "en")) == 1
        assert got.get(("de", "de")) == 1
        assert got.get(("und", "zh")) == 1
