"""Planted-fixture tests for session path mining, OOV rate against a
capped vocabulary, and exact integer AUC."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data


def _frame(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    return res


class TestSessionPaths:
    def test_planted_sessions_and_gap(self):
        from ai_knowledge_graph_ray.stages.sessions import session_paths

        t0 = pd.Timestamp("2020-01-01")
        ev = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1, 2, 2],
                "event_id": [1, 2, 3, 4, 5, 6],
                "ts": [
                    t0,
                    t0 + pd.Timedelta(minutes=5),
                    # > 30 min gap -> new session
                    t0 + pd.Timedelta(hours=2),
                    t0 + pd.Timedelta(hours=2, minutes=1),
                    t0,
                    t0 + pd.Timedelta(minutes=1),
                ],
                "event_type": ["view", "click", "view", "click", "view", "click"],
            }
        )
        ev["ts"] = ev["ts"].astype("datetime64[us]")
        out = _frame(
            session_paths(ray.data.from_pandas(ev).repartition(3), top_k=10)
        )
        got = dict(zip(out["path"], out["n"]))
        assert got == {"view>click": 3}

    def test_equal_ts_ordered_by_event_id(self):
        from ai_knowledge_graph_ray.stages.sessions import session_paths

        t0 = pd.Timestamp("2020-01-01")
        ev = pd.DataFrame(
            {
                "user_id": [1, 1],
                "event_id": [9, 2],  # same ts: event_id 2 first
                "ts": [t0, t0],
                "event_type": ["late", "early"],
            }
        )
        ev["ts"] = ev["ts"].astype("datetime64[us]")
        out = _frame(session_paths(ray.data.from_pandas(ev), top_k=5))
        assert out["path"].iloc[0] == "early>late"

    def test_topk_tie_breaks_lexicographic(self):
        from ai_knowledge_graph_ray.stages.sessions import session_paths

        t0 = pd.Timestamp("2020-01-01")
        rows = []
        # three single-event sessions with distinct types, all count 1
        for i, et in enumerate(["c", "a", "b"]):
            rows.append((i + 10, i, t0, et))
        ev = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "event_type"])
        ev["ts"] = ev["ts"].astype("datetime64[us]")
        out = _frame(session_paths(ray.data.from_pandas(ev), top_k=2))
        assert list(out["path"]) == ["a", "b"]


class TestOovRate:
    def test_planted_vocab_cutoff(self):
        from ai_knowledge_graph_ray.stages.text_analysis import oov_rate

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "aa aa bb",      # aa x2, bb x1
                    "aa cc",          # cc x1
                    "",               # empty -> 0/0
                ],
            }
        )
        # vocab_size=2 keeps (aa, 2) and, tie n=1 broken by token asc, bb.
        out = _frame(
            oov_rate(ray.data.from_pandas(docs).repartition(2), vocab_size=2)
        ).set_index("doc_id")
        assert out.loc[1, "n_tokens"] == 3 and out.loc[1, "n_oov"] == 0
        assert out.loc[2, "n_tokens"] == 2 and out.loc[2, "n_oov"] == 1  # cc
        assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "n_oov"] == 0


class TestAucSums:
    def test_perfect_separation(self):
        from ai_knowledge_graph_ray.stages.text_analysis import auc_sums

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                # en doc: 1 marker / 1 token -> score 500; neg doc score 0
                "text": ["the", "zzz"],
            }
        )
        out = _frame(auc_sums(ray.data.from_pandas(docs)))
        r = out.iloc[0]
        assert r["n_pos"] == 1 and r["n_neg"] == 1
        assert r["auc_num2"] == 2 and r["auc_den2"] == 2  # AUC = 1

    def test_tie_half_credit(self):
        from ai_knowledge_graph_ray.stages.text_analysis import auc_sums

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                # both score 0: pos ('der' -> de label? no) ...
                # 'the the' -> en, score = 2*1000 // 3 = 666
                # craft a tie: en doc with 0 markers is impossible (label
                # needs markers), so tie at score 0: de doc (label 0) and
                # marker-free doc (label 0) give n_pos=0 -> den 0.
                # Instead: two en docs + one neg at the SAME score.
                "text": ["zzz", "qqq"],
            }
        )
        # both und -> n_pos 0; degenerate den
        out = _frame(auc_sums(ray.data.from_pandas(docs)))
        r = out.iloc[0]
        assert r["n_pos"] == 0 and r["auc_den2"] == 0 and r["auc_num2"] == 0

    def test_tie_between_pos_and_neg(self):
        from ai_knowledge_graph_ray.stages.text_analysis import auc_sums

        # pos: "the" -> en, 1 marker / 1 token -> 500
        # neg at same score: "der" -> de label, 1 de marker, en markers 0
        #   -> score 0. Need an actual tie: "der the" has en=1, de=1 ->
        #   en>=de -> labeled en. Try neg with en marker but fr-dominant:
        #   "le la les et the" -> fr=4 > en=1 -> label fr (neg), score =
        #   1*1000 // 6 = 166. Pos at 166: "the x x x x" -> en=1, 5 toks
        #   -> 166, labels en. Tie at 166 with one pos + one neg:
        #   num2 = np*(2*below + nn) = 1*(0 + 1) = 1; den2 = 2 -> AUC .5
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["the x x x x", "le la les et the"],
            }
        )
        out = _frame(auc_sums(ray.data.from_pandas(docs)))
        r = out.iloc[0]
        assert r["n_pos"] == 1 and r["n_neg"] == 1
        assert r["auc_num2"] == 1 and r["auc_den2"] == 2  # AUC = 0.5
