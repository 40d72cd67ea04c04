"""Property-style tests (pure pandas/python — no Ray) for the
driver twins of the fifteenth-session graph operators, plus planted
tests for the anomalous-hours and Pareto queries (which do run Ray).

The twins ARE the semantics over the count gate, so invariants proved
here hold for the distributed paths via the existing gate-equivalence
tests."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _rand_graph(rng: random.Random, n: int, m: int) -> pd.DataFrame:
    pairs = set()
    while len(pairs) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((f"n{min(a,b)}", f"n{max(a,b)}"))
    return pd.DataFrame(sorted(pairs), columns=["a", "b"])


class TestColoringLocalProperties:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_proper_and_equals_sequential_greedy(self, seed):
        from ai_knowledge_graph_ray.stages.graph_algos import (
            _node_rank,
            coloring_local,
        )

        rng = random.Random(seed)
        und = _rand_graph(rng, 30, 60)
        out = coloring_local(und)
        colors = dict(zip(out["node"], out["color"]))
        adj: dict[str, set] = {}
        for a, b in zip(und["a"], und["b"]):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        # proper
        for a, b in zip(und["a"], und["b"]):
            assert colors[a] != colors[b]
        # equals an independent re-derivation of sequential greedy
        nodes = pd.Series(sorted(adj))
        ranks = dict(zip(nodes, _node_rank(nodes)))
        ref: dict[str, int] = {}
        for v in sorted(adj, key=lambda x: (ranks[x], x)):
            used = {ref[u] for u in adj[v] if u in ref}
            c = 0
            while c in used:
                c += 1
            ref[v] = c
        assert colors == ref
        # Delta+1 bound
        delta = max(len(s) for s in adj.values())
        assert max(colors.values()) <= delta


class TestPartitionLocalProperties:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_capacity_never_exceeded_and_deterministic(self, seed):
        from ai_knowledge_graph_ray.stages.graph_algos import partition_local

        rng = random.Random(seed)
        und = _rand_graph(rng, 40, 90)
        cap = 12
        out1 = partition_local(und, k=4, capacity=cap, iters=6)
        out2 = partition_local(
            und.sample(frac=1.0, random_state=7).reset_index(drop=True),
            k=4, capacity=cap, iters=6,
        )
        sizes = out1["partition"].value_counts()
        assert sizes.max() <= cap
        # row-order independent
        pd.testing.assert_frame_equal(
            out1.reset_index(drop=True), out2.reset_index(drop=True)
        )

    def test_moves_only_improve_local_vote(self):
        from ai_knowledge_graph_ray.stages.graph_algos import partition_local

        # a node fully surrounded by one partition must end there
        # (capacity permitting): hub with 5 neighbors
        und = pd.DataFrame(
            [("hub", f"x{i}") for i in range(5)]
            + [(f"x{i}", f"x{(i+1) % 5}") for i in range(5)],
            columns=["a", "b"],
        )
        out = partition_local(und, k=2, capacity=6, iters=6)
        parts = dict(zip(out["node"], out["partition"]))
        leaf_parts = pd.Series([parts[f"x{i}"] for i in range(5)])
        if leaf_parts.nunique() == 1:
            assert parts["hub"] == leaf_parts.iloc[0]


class TestAnomalousHours:
    def test_planted_spike(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_events_anomalous_hours

        # 20 calm hours at 10 events, one spike hour at 100
        rows = []
        t0 = pd.Timestamp("2020-01-01")
        for h in range(20):
            rows += [t0 + pd.Timedelta(hours=h, seconds=s) for s in range(10)]
        rows += [
            t0 + pd.Timedelta(hours=30, seconds=s) for s in range(100)
        ]
        ev = pd.DataFrame({"ts": pd.Series(rows).astype("datetime64[us]")})
        pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
        out = q_events_anomalous_hours(str(tmp_path))
        df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
        if isinstance(out, pa.Table):
            df = out.to_pandas()
        assert list(df["n"]) == [100]

    def test_uniform_counts_no_anomaly_keeps_schema(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_events_anomalous_hours

        t0 = pd.Timestamp("2020-01-01")
        rows = [t0 + pd.Timedelta(hours=h) for h in range(12)]
        ev = pd.DataFrame({"ts": pd.Series(rows).astype("datetime64[us]")})
        pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
        out = q_events_anomalous_hours(str(tmp_path))
        assert isinstance(out, pa.Table)
        assert out.num_rows == 0 and out.column_names == ["hour", "n"]


class TestCustomerPareto:
    def test_planted_concentration(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_customer_pareto

        # revenue cents: c1=8000, c2=1000, c3=1000 -> total 10000;
        # 80% reached by c1 alone
        orders = pd.DataFrame(
            {
                "o_custkey": [1, 1, 2, 3],
                "o_totalprice": [50.0, 30.0, 10.0, 10.0],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet")
        )
        out = q_customer_pareto(str(tmp_path))
        r = out.iloc[0]
        assert r["n_customers_80pct"] == 1
        assert r["n_customers"] == 3
        assert r["total_cents"] == 10000


class TestKsDrift:
    def test_identical_distributions_zero(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_source_ks_drift

        docs = pd.DataFrame(
            {
                "doc_id": range(6),
                "text": ["a b", "a b", "a b c", "a b", "a b", "a b c"],
                "source": ["src0"] * 3 + ["src1"] * 3,
            }
        )
        pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
        out = q_source_ks_drift(str(tmp_path))
        r = out.iloc[0]
        assert r["ks_num"] == 0 and r["ks_den"] == 9

    def test_disjoint_distributions_max(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_source_ks_drift

        docs = pd.DataFrame(
            {
                "doc_id": range(4),
                "text": ["a", "a", "a b c", "a b c"],
                "source": ["src0", "src0", "src1", "src1"],
            }
        )
        pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
        out = q_source_ks_drift(str(tmp_path))
        r = out.iloc[0]
        # KS = 1: at v=1, cum0=2, cum1=0 -> |2*2 - 0*2| = 4 = den
        assert r["ks_num"] == 4 and r["ks_den"] == 4


class TestBestSplit:
    def test_level_shift_found(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_events_best_split

        # 10 hours at 2 events then 10 hours at 10 events: the best
        # split is at the end of the low regime (hour 9)
        t0 = pd.Timestamp("2020-01-01")
        rows = []
        for h in range(10):
            rows += [t0 + pd.Timedelta(hours=h, seconds=s) for s in range(2)]
        for h in range(10, 20):
            rows += [t0 + pd.Timedelta(hours=h, seconds=s) for s in range(10)]
        ev = pd.DataFrame({"ts": pd.Series(rows).astype("datetime64[us]")})
        pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
        out = q_events_best_split(str(tmp_path))
        r = out.iloc[0]
        base_hour = int(t0.value // 10**3 // 3_600_000_000)
        assert r["split_hour"] == base_hour + 9
        # crit at i=10: |cum*nh - tot*i| = |20*20 - 120*10| = 800
        assert r["crit"] == 800


class TestRapidReorder:
    def test_window_and_ordering(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_orders_rapid_reorder

        orders = pd.DataFrame(
            {
                "o_custkey": [1, 1, 1, 2],
                "o_orderkey": [10, 11, 12, 20],
                "o_orderdate": pd.to_datetime(
                    ["2020-01-01", "2020-01-10", "2020-03-01", "2020-01-02"]
                ).astype("datetime64[us]"),
            }
        )
        pq.write_table(pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet"))
        out = q_orders_rapid_reorder(str(tmp_path)).to_pandas()
        got = {(r.okey1, r.okey2): r.gap_days for r in out.itertuples()}
        # only (10, 11) is within 14 days; cust2 has a single order
        assert got == {(10, 11): 9}


class TestLateQuarantine:
    def test_arrival_order_not_event_time(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_events_late_quarantine

        t0 = pd.Timestamp("2020-01-01 12:00:00")
        # arrival order (event_id): t0, t0+1h, then a stale event 50
        # minutes BEHIND the high-water mark -> late; then one only 2
        # minutes behind -> on time.
        ev = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1],
                "event_id": [1, 2, 3, 4],
                "ts": pd.Series(
                    [
                        t0,
                        t0 + pd.Timedelta(hours=1),
                        t0 + pd.Timedelta(minutes=10),
                        t0 + pd.Timedelta(minutes=58),
                    ]
                ).astype("datetime64[us]"),
            }
        )
        pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
        out = q_events_late_quarantine(str(tmp_path)).to_pandas()
        r = out.iloc[0]
        assert r["n_events"] == 4 and r["n_late"] == 1


class TestSeasonalIndex:
    def test_planted_two_months(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_orders_seasonal_index

        orders = pd.DataFrame(
            {
                "o_orderdate": pd.to_datetime(
                    ["1996-01-10", "1996-01-20", "1997-02-05"]
                ).astype("datetime64[us]"),
                "o_totalprice": [10.0, 20.0, 30.0],
            }
        )
        pq.write_table(pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet"))
        out = q_orders_seasonal_index(str(tmp_path))
        got = {r.month: (r.revenue_cents, r.seasonal_bps) for r in out.itertuples()}
        # jan 3000 of 6000 -> 3000*12*10000//6000 = 60000 bps (6x avg month)
        assert got == {1: (3000, 60000), 2: (3000, 60000)}


class TestHapax:
    def test_planted(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_doc_hapax

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["one two two three three three", ""],
            }
        )
        pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
        out = q_doc_hapax(str(tmp_path)).to_pandas().set_index("doc_id")
        assert out.loc[1, "n_tokens"] == 6 and out.loc[1, "n_hapax"] == 1
        assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "n_hapax"] == 0


class TestGapAudit:
    def test_planted_gap_and_dup(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_lineitem_gap_audit

        li = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 1, 2, 2, 3, 3],
                # order 1: clean 1..3; order 2: gap (1, 3); order 3: dup (1, 1)
                "l_linenumber": [1, 2, 3, 1, 3, 1, 1],
            }
        )
        pq.write_table(pa.Table.from_pandas(li), str(tmp_path / "lineitem.parquet"))
        out = q_lineitem_gap_audit(str(tmp_path))
        r = out.iloc[0]
        assert r["n_orders"] == 3
        # order 2 has a gap (max 3 != 2 distinct); order 3's dup keeps
        # max == distinct == 1, so it is a dup but not a gap
        assert r["n_gap_orders"] == 1
        assert r["n_dup_orders"] == 1


class TestIsoWeek:
    def test_year_boundary_week(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_orders_iso_week

        # 2021-01-01 is a Friday -> ISO week 53 of ISO YEAR 2020
        orders = pd.DataFrame(
            {
                "o_orderdate": pd.to_datetime(
                    ["2021-01-01", "2021-01-04"]
                ).astype("datetime64[us]"),
                "o_totalprice": [10.0, 20.0],
            }
        )
        pq.write_table(pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet"))
        out = q_orders_iso_week(str(tmp_path)).to_pandas()
        got = {(r.iso_year, r.iso_week): r.n for r in out.itertuples()}
        assert got == {(2020, 53): 1, (2021, 1): 1}


class TestAbWow:
    def test_ab_parity_assignment(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_events_ab_stats

        ev = pd.DataFrame(
            {"user_id": [1, 2, 3, 4], "value": [1.0, 2.0, 3.0, None]}
        )
        pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
        out = q_events_ab_stats(str(tmp_path)).to_pandas().set_index("variant")
        # odd users 1,3 -> variant 1 with cents 100, 300
        assert out.loc["1", "n"] == 2
        assert out.loc["1", "sum_cents"] == 400
        assert out.loc["1", "sumsq_cents"] == 100**2 + 300**2
        # even users 2,4 -> 200 + null->0
        assert out.loc["0", "sum_cents"] == 200

    def test_wow_negative_change_matches_trunc_semantics(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_events_wow_change

        anchor = pd.Timestamp("2020-03-01")
        rows = []
        # prior week: 3 views; recent week: 1 view -> change -67%
        for d in (8, 9, 10):
            rows.append(("view", anchor - pd.Timedelta(days=d)))
        rows.append(("view", anchor - pd.Timedelta(days=1)))
        ev = pd.DataFrame(rows, columns=["event_type", "ts"])
        ev["ts"] = ev["ts"].astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
        out = q_events_wow_change(str(tmp_path))
        r = out.iloc[0]
        assert r["n_recent"] == 1 and r["n_prior"] == 3
        # 1*10000//3 - 10000 = 3333 - 10000 = -6667
        assert r["change_bps"] == -6667


class TestQuoteCensus:
    def test_planted(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_doc_quote_census

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ['say "hi" and "bye now"', "no quotes"],
            }
        )
        pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
        out = q_doc_quote_census(str(tmp_path)).to_pandas().set_index("doc_id")
        assert out.loc[1, "n_quotes"] == 2
        assert out.loc[1, "n_quoted_chars"] == len('"hi"') + len('"bye now"')
        assert out.loc[2, "n_quotes"] == 0 and out.loc[2, "n_quoted_chars"] == 0


class TestGapBuckets:
    def test_fixed_thresholds(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_events_gap_buckets

        t0 = pd.Timestamp("2020-01-01")
        ts = [
            t0,
            t0 + pd.Timedelta(milliseconds=500),   # gap 0.5s -> lt_1s
            t0 + pd.Timedelta(seconds=1, milliseconds=500),  # 1s -> lt_10s
            t0 + pd.Timedelta(hours=2),            # ~2h -> ge_1h
        ]
        ev = pd.DataFrame(
            {"user_id": [1] * 4, "ts": pd.Series(ts).astype("datetime64[us]")}
        )
        pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
        out = q_events_gap_buckets(str(tmp_path)).to_pandas()
        got = dict(zip(out["bucket"], out["n"]))
        assert got == {"lt_1s": 1, "lt_10s": 1, "ge_1h": 1}


class TestSourceDupStats:
    def test_planted(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_source_dup_stats

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["same", "same", "same", "unique"],
                "source": ["a", "a", "b", "b"],
            }
        )
        pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
        out = q_source_dup_stats(str(tmp_path)).set_index("source")
        assert out.loc["a", "n_docs"] == 2 and out.loc["a", "n_distinct"] == 1
        assert out.loc["a", "n_dups"] == 1
        assert out.loc["b", "n_docs"] == 2 and out.loc["b", "n_dups"] == 0


class TestOrdersAging:
    def test_buckets_from_anchor(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_orders_aging

        anchor = pd.Timestamp("2001-01-01")
        orders = pd.DataFrame(
            {
                "o_orderstatus": ["O", "O", "O", "F"],
                "o_orderdate": pd.Series(
                    [
                        anchor,                                # age 0 -> lt_30d
                        anchor - pd.Timedelta(days=60),        # lt_90d
                        anchor - pd.Timedelta(days=400),       # ge_1y
                        anchor - pd.Timedelta(days=1),         # F excluded
                    ]
                ).astype("datetime64[us]"),
            }
        )
        pq.write_table(pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet"))
        out = q_orders_aging(str(tmp_path)).to_pandas()
        got = dict(zip(out["bucket"], out["n"]))
        assert got == {"lt_30d": 1, "lt_90d": 1, "ge_1y": 1}


class TestSimpson:
    def test_planted(self, tmp_path):
        from ai_knowledge_graph_ray.pipelines.queries import q_doc_simpson

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["a a b", "x", ""],
            }
        )
        pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
        out = q_doc_simpson(str(tmp_path)).to_pandas().set_index("doc_id")
        # doc 1: counts {a:2, b:1} -> num = 2*1 = 2; den = 3*2 = 6
        assert out.loc[1, "rep_num"] == 2 and out.loc[1, "rep_den"] == 6
        assert out.loc[2, "rep_num"] == 0 and out.loc[2, "rep_den"] == 0
        assert out.loc[3, "rep_num"] == 0 and out.loc[3, "rep_den"] == 0
