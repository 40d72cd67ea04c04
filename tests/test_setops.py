"""INTERSECT / EXCEPT / keyed upsert: SQL-set-semantics equivalence,
duplicate collapsing, empty results, last-wins determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.setops import (
    except_distinct,
    intersect_distinct,
    upsert_latest,
)

K_SCHEMA = pa.schema([("k", pa.int64())])


def _ds(vals, col="k"):
    return ray.data.from_pandas(pd.DataFrame({col: vals})).repartition(3)


class TestSetOps:
    def test_intersect_distinct_collapses_duplicates(self):
        out = intersect_distinct(
            _ds([1, 1, 2, 3, 3]), _ds([3, 3, 4, 1]), ["k"], K_SCHEMA
        ).to_pandas()
        assert sorted(out["k"]) == [1, 3]

    def test_except_distinct(self):
        out = except_distinct(
            _ds([1, 1, 2, 3]), _ds([3, 4]), ["k"], K_SCHEMA
        ).to_pandas()
        assert sorted(out["k"]) == [1, 2]

    def test_empty_results_are_legal(self):
        assert except_distinct(_ds([1, 2]), _ds([1, 2, 3]), ["k"], K_SCHEMA).count() == 0
        assert intersect_distinct(_ds([1]), _ds([2]), ["k"], K_SCHEMA).count() == 0

    def test_matches_sql_semantics_random(self):
        import duckdb

        rng = np.random.RandomState(17)
        a = rng.randint(0, 200, size=1_000).astype("int64")
        b = rng.randint(100, 300, size=1_000).astype("int64")
        con = duckdb.connect()
        con.register("ta", pd.DataFrame({"k": a}))
        con.register("tb", pd.DataFrame({"k": b}))
        want_i = sorted(r[0] for r in con.execute("SELECT k FROM ta INTERSECT SELECT k FROM tb").fetchall())
        want_e = sorted(r[0] for r in con.execute("SELECT k FROM ta EXCEPT SELECT k FROM tb").fetchall())
        got_i = sorted(intersect_distinct(_ds(a), _ds(b), ["k"], K_SCHEMA).to_pandas()["k"])
        got_e = sorted(except_distinct(_ds(a), _ds(b), ["k"], K_SCHEMA).to_pandas()["k"])
        assert got_i == want_i and got_e == want_e


class TestUpsertLatest:
    SCHEMA = pa.schema(
        [("key", pa.string()), ("ver", pa.int64()), ("val", pa.int64())]
    )

    def test_last_wins_per_key(self):
        rng = np.random.RandomState(29)
        n = 2_000
        df = pd.DataFrame(
            {
                "key": rng.choice(list("abcdefgh"), size=n),
                "ver": rng.permutation(n).astype("int64"),  # unique versions
                "val": np.arange(n, dtype="int64"),
            }
        )
        out = (
            upsert_latest(
                ray.data.from_pandas(df).repartition(7), ["key"], "ver", self.SCHEMA
            )
            .to_pandas()
            .sort_values("key")
            .reset_index(drop=True)
        )
        want = (
            df.sort_values("ver", kind="stable")
            .drop_duplicates("key", keep="last")
            .sort_values("key")
            .reset_index(drop=True)[["key", "ver", "val"]]
        )
        pd.testing.assert_frame_equal(out, want)

    def test_single_version_identity(self):
        df = pd.DataFrame({"key": ["x", "y"], "ver": [1, 2], "val": [10, 20]})
        out = upsert_latest(ray.data.from_pandas(df), ["key"], "ver", self.SCHEMA)
        assert out.count() == 2


class TestRankInGroup:
    def test_sql_rank_tie_semantics(self):
        from ai_knowledge_graph_ray.stages.sessions import rank_in_group

        rng = np.random.RandomState(37)
        n = 1_500
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype="int64"),
                "event_type": rng.choice(["a", "b", "c"], size=n),
                "vbucket": rng.randint(0, 12, size=n).astype("int64"),  # heavy ties
            }
        )
        out = (
            rank_in_group(
                ray.data.from_pandas(df).repartition(6),
                group_col="event_type",
                order_cols=["vbucket"],
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        want = (
            df.assign(
                rnk=df.groupby("event_type")["vbucket"]
                .rank(method="min")
                .astype("int64")
            )[["event_id", "rnk"]]
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, want)


class TestVocab:
    def test_term_counts_match_naive(self):
        import re

        from ai_knowledge_graph_ray.stages.vocab import term_counts

        texts = [
            "The quick brown fox",
            "the lazy dog! The DOG.",
            None,
            "",
            "fox fox fox",
        ]
        ds = ray.data.from_pandas(
            pd.DataFrame({"text": texts})
        ).repartition(3)
        out = term_counts(ds).to_pandas().set_index("token")["n"].to_dict()
        naive: dict = {}
        for t in texts:
            for w in re.findall(r"\w+", (t or "").lower()):
                naive[w] = naive.get(w, 0) + 1
        assert out == naive

    def test_vocab_ids_deterministic_and_gated(self):
        import pytest

        from ai_knowledge_graph_ray.stages.vocab import vocab_build

        ds = ray.data.from_pandas(
            pd.DataFrame({"text": ["a b b c c c", "a b c"] * 10})
        )
        v = vocab_build(ds, min_count=1).to_pandas()
        # (n desc, token asc): c=40? no -- c appears 4x/pair * 10
        assert list(v["token"]) == ["c", "b", "a"]
        assert list(v["vocab_id"]) == [1, 2, 3]
        with pytest.raises(ValueError, match="driver_max_vocab"):
            vocab_build(ds, min_count=1, driver_max_vocab=1)


class TestRandomWalks:
    @staticmethod
    def _ref_walks(df: pd.DataFrame, length: int):
        # pure-Python twin of the Lehmer walk spec
        und = set()
        for a, b in zip(df["src"], df["dst"]):
            if a != b:
                und.add((min(a, b), max(a, b)))
        adjm: dict = {}
        for a, b in und:
            adjm.setdefault(a, set()).add(b)
            adjm.setdefault(b, set()).add(a)
        nodes = sorted(adjm)
        nid = {n: i for i, n in enumerate(nodes)}
        rows = []
        for n in nodes:
            w = nid[n]
            cur = n
            rows.append((w, 0, cur))
            for t in range(1, length + 1):
                nbrs = sorted(nid[x] for x in adjm[cur])
                r = ((w * 48271 + t * 9973) % 2147483647) % len(nbrs)
                cur = nodes[nbrs[r]]
                rows.append((w, t, cur))
        return sorted(rows)

    def test_matches_reference_twin_both_paths(self):
        from ai_knowledge_graph_ray.stages.walks import random_walks

        rng = np.random.RandomState(43)
        df = pd.DataFrame(
            {
                "src": [f"n{i}" for i in rng.randint(0, 40, size=250)],
                "dst": [f"n{i}" for i in rng.randint(0, 40, size=250)],
            }
        )
        want = self._ref_walks(df, 4)
        for gate in (2_000_000, 0):  # broadcast-CSR path / forced join path
            out = random_walks(
                ray.data.from_pandas(df).repartition(5),
                length=4,
                driver_max_adj=gate,
            ).to_pandas()
            got = sorted(zip(out["walk_id"], out["step"], out["node"]))
            assert got == want, f"gate={gate}"

    def test_walk_edges_exist(self):
        import networkx as nx

        from ai_knowledge_graph_ray.stages.walks import random_walks

        rng = np.random.RandomState(47)
        df = pd.DataFrame(
            {
                "src": [f"n{i}" for i in rng.randint(0, 30, size=150)],
                "dst": [f"n{i}" for i in rng.randint(0, 30, size=150)],
            }
        )
        g = nx.Graph()
        g.add_edges_from(
            (a, b) for a, b in zip(df["src"], df["dst"]) if a != b
        )
        out = (
            random_walks(ray.data.from_pandas(df), length=3)
            .to_pandas()
            .sort_values(["walk_id", "step"])
        )
        for _, wdf in out.groupby("walk_id"):
            seq = list(wdf.sort_values("step")["node"])
            for a, b in zip(seq, seq[1:]):
                assert g.has_edge(a, b), (a, b)

    def test_skipgrams_match_naive(self):
        from ai_knowledge_graph_ray.stages.walks import random_walks, walk_skipgrams

        rng = np.random.RandomState(53)
        df = pd.DataFrame(
            {
                "src": [f"n{i}" for i in rng.randint(0, 25, size=120)],
                "dst": [f"n{i}" for i in rng.randint(0, 25, size=120)],
            }
        )
        walks = random_walks(ray.data.from_pandas(df), length=3)
        out = (
            walk_skipgrams(walks, window=2)
            .to_pandas()
            .set_index(["center", "context"])["n"]
            .to_dict()
        )
        naive: dict = {}
        wdf = walks.to_pandas().sort_values(["walk_id", "step"])
        for _, g in wdf.groupby("walk_id"):
            seq = list(g["node"])
            for i, a in enumerate(seq):
                for j in range(max(0, i - 2), min(len(seq), i + 3)):
                    if j != i:
                        naive[(a, seq[j])] = naive.get((a, seq[j]), 0) + 1
        assert out == naive


class TestBroadcastJoin:
    def test_inner_and_left_outer_match_pandas(self):
        import pytest

        from ai_knowledge_graph_ray.stages.relational import broadcast_join

        left = pd.DataFrame({"k": [1, 2, 3, 4, 2], "lx": [10, 20, 30, 40, 21]})
        right = pd.DataFrame({"k": [2, 3], "rx": ["b", "c"]})
        lds = ray.data.from_pandas(left).repartition(3)
        rds = ray.data.from_pandas(right)
        inner = (
            broadcast_join(lds, rds, ["k"])
            .to_pandas()
            .sort_values(["k", "lx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            inner,
            left.merge(right, on="k").sort_values(["k", "lx"]).reset_index(drop=True),
        )
        outer = broadcast_join(lds, rds, ["k"], how="left_outer").to_pandas()
        assert len(outer) == 5
        assert outer.loc[outer["k"] == 1, "rx"].isna().all()
        with pytest.raises(ValueError, match="broadcast_max_rows"):
            broadcast_join(lds, rds, ["k"], broadcast_max_rows=1)


class TestTopTermsPerGroup:
    def test_matches_naive(self):
        import re

        from ai_knowledge_graph_ray.stages.vocab import top_terms_per_group

        rng = np.random.RandomState(59)
        words = ["alpha", "beta", "gamma", "delta", "eps"]
        rows = []
        for i in range(300):
            g = f"s{i % 4}"
            text = " ".join(rng.choice(words, size=rng.randint(1, 9)))
            rows.append((g, text))
        df = pd.DataFrame(rows, columns=["source", "text"])
        out = (
            top_terms_per_group(
                ray.data.from_pandas(df).repartition(5), "source", k=3
            )
            .to_pandas()
            .sort_values(["group", "n", "token"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        naive: dict = {}
        for g, t in rows:
            for w in re.findall(r"\w+", t.lower()):
                naive[(g, w)] = naive.get((g, w), 0) + 1
        want_rows = []
        ndf = pd.DataFrame(
            [(g, w, n) for (g, w), n in naive.items()],
            columns=["group", "token", "n"],
        ).sort_values(["group", "n", "token"], ascending=[True, False, True])
        want = ndf.groupby("group").head(3).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out, want.astype({"n": "int64"}), check_dtype=False
        )


class TestTokenPostings:
    def test_postings_sorted_distinct_and_df_filters(self):
        import pandas as pd

        from ai_knowledge_graph_ray.stages.vocab import token_postings

        docs = pd.DataFrame(
            {
                "doc_id": [3, 1, 2, 4],
                "text": [
                    "apple apple banana",  # apple repeated in-doc: one posting
                    "apple cherry",
                    "apple banana",
                    "Cherry date",  # case-folded
                ],
            }
        )
        ds = ray.data.from_pandas(docs).repartition(3)
        out = (
            token_postings(ds, min_df=2)
            .to_pandas()
            .set_index("token")
            .sort_index()
        )
        assert out.loc["apple", "postings"] == "1,2,3"
        assert out.loc["apple", "df"] == 3
        assert out.loc["banana", "postings"] == "2,3"
        assert out.loc["cherry", "postings"] == "1,4"
        assert "date" not in out.index  # df=1 dropped
        capped = token_postings(ds, min_df=2, max_df=2).to_pandas()
        assert set(capped["token"]) == {"banana", "cherry"}


class TestTfidfKeywords:
    def test_matches_pure_python_twin(self):
        import math
        from collections import Counter

        import pandas as pd

        from ai_knowledge_graph_ray.stages.vocab import tfidf_keywords

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "apple banana apple cherry",
                    "banana banana date",
                    "apple elderberry elderberry",
                ],
            }
        )
        ds = ray.data.from_pandas(docs).repartition(2)
        out = tfidf_keywords(ds, k=2).to_pandas()
        got = {
            d: list(zip(g["token"], g["score_milli"]))
            for d, g in out.groupby("doc_id")
        }

        # independent twin
        n = len(docs)
        df = Counter()
        toks = {r.doc_id: r.text.lower().split() for r in docs.itertuples()}
        for ts in toks.values():
            df.update(set(ts))
        want = {}
        for did, ts in toks.items():
            tf = Counter(ts)
            scored = sorted(
                ((round(tf[t] * math.log(n / df[t]) * 1000), t) for t in tf),
                key=lambda x: (-x[0], x[1]),
            )[:2]
            want[did] = [(t, s) for s, t in scored]
        assert got == want

    def test_layout_independent(self):
        import pandas as pd

        from ai_knowledge_graph_ray.stages.vocab import tfidf_keywords

        docs = pd.DataFrame(
            {"doc_id": range(30), "text": [f"w{i%5} w{i%3} shared common" for i in range(30)]}
        )
        outs = []
        for blocks in (1, 6):
            ds = ray.data.from_pandas(docs).repartition(blocks)
            outs.append(
                tfidf_keywords(ds, k=3)
                .to_pandas()
                .sort_values(["doc_id", "token"])
                .reset_index(drop=True)
            )
        assert outs[0].equals(outs[1])


class TestBagSemantics:
    def test_intersect_all_multiplicity(self):
        import pyarrow as pa
        import ray.data

        from ai_knowledge_graph_ray.stages.setops import except_all, intersect_all

        schema = pa.schema([pa.field("k", pa.int64())])
        left = ray.data.from_pandas(
            pd.DataFrame({"k": [1, 1, 1, 2, 3]})
        ).repartition(3)
        right = ray.data.from_pandas(pd.DataFrame({"k": [1, 1, 2, 2, 4]}))
        inter = intersect_all(left, right, ["k"], schema).to_pandas()
        assert sorted(inter["k"]) == [1, 1, 2]
        exc = except_all(left, right, ["k"], schema).to_pandas()
        assert sorted(exc["k"]) == [1, 3]

    def test_gini_extremes(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ai_knowledge_graph_ray.pipelines.queries import q_customer_revenue_gini

        # perfectly equal: gini_num == 0
        eq = pd.DataFrame({"o_custkey": [1, 2, 3], "o_totalprice": [10.0] * 3})
        pq.write_table(pa.Table.from_pandas(eq), str(tmp_path / "orders.parquet"))
        out = q_customer_revenue_gini(str(tmp_path))
        assert out["gini_num"].iloc[0] == 0
        # fully concentrated (n=2): gini = 1/2 of max -> num/den = (n-1)/n /?
        conc = pd.DataFrame({"o_custkey": [1, 2], "o_totalprice": [0.01, 99.99]})
        pq.write_table(
            pa.Table.from_pandas(conc), str(tmp_path / "orders.parquet")
        )
        out2 = q_customer_revenue_gini(str(tmp_path))
        r = out2.iloc[0]
        # x = [1, 9999]: num = 2*(1*1 + 2*9999) - 3*10000 = 9998
        assert r["gini_num"] == 9998 and r["gini_den"] == 20000
