"""Exact distributed quantiles: sorted-array reference equivalence,
forced over-gate range-pruned path, edge quantiles, negatives."""

from __future__ import annotations

import math

import numpy as np
import pytest
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.quantiles import (
    exact_quantiles,
    grouped_quantiles,
    value_histogram,
)


def _ref(vals: np.ndarray, qs) -> list[int]:
    v = np.sort(vals)
    n = len(v)
    return [int(v[max(1, math.ceil(q * n)) - 1]) for q in qs]


QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)


class TestExactQuantiles:
    def test_matches_sorted_reference(self):
        rng = np.random.RandomState(3)
        vals = np.concatenate(
            [
                rng.randint(-500, 500, size=3_000),
                np.full(400, 77),  # heavy duplicate mass
            ]
        ).astype("int64")
        ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(9)
        out = exact_quantiles(ds, "x", QS).to_pandas()
        assert list(out["value"]) == _ref(vals, QS)
        assert list(out["q"]) == list(QS)

    def test_over_gate_path_equivalent(self):
        rng = np.random.RandomState(5)
        vals = rng.randint(-2_000, 2_000, size=5_000).astype("int64")
        ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(7)
        out = exact_quantiles(
            ds, "x", QS, driver_max_distinct=10, range_size=64
        ).to_pandas()
        assert list(out["value"]) == _ref(vals, QS)

    def test_q1_is_max_and_tiny_input(self):
        ds = ray.data.from_pandas(pd.DataFrame({"x": [9, 2, 5]}))
        out = exact_quantiles(ds, "x", (0.01, 1.0)).to_pandas()
        assert list(out["value"]) == [2, 9]

    def test_grouped_matches_per_group_reference(self):
        rng = np.random.RandomState(13)
        groups = rng.choice(list("abcde"), size=4_000)
        vals = rng.randint(0, 300, size=4_000).astype("int64")
        df = pd.DataFrame({"src": groups, "x": vals})
        qs = (0.5, 0.9, 1.0)
        out = (
            grouped_quantiles(
                ray.data.from_pandas(df).repartition(11), "src", "x", qs
            )
            .to_pandas()
            .sort_values(["src", "q"])
            .reset_index(drop=True)
        )
        want_rows = []
        for g in sorted(df["src"].unique()):
            sub = df.loc[df["src"] == g, "x"].to_numpy()
            for q, v in zip(qs, _ref(sub, qs)):
                want_rows.append((g, q, v))
        got = list(out.itertuples(index=False, name=None))
        assert sorted(got) == sorted(want_rows)

    def test_grouped_single_row_groups(self):
        df = pd.DataFrame({"src": ["a", "b"], "x": [5, 9]})
        out = (
            grouped_quantiles(ray.data.from_pandas(df), "src", "x", (0.5,))
            .to_pandas()
            .sort_values("src")
        )
        assert list(out["value"]) == [5, 9]

    def test_histogram_counts(self):
        ds = ray.data.from_pandas(
            pd.DataFrame({"x": [4, 4, 4, 1, 1, 7]})
        ).repartition(3)
        h = value_histogram(ds, "x").to_pandas().sort_values("v")
        assert list(h["v"]) == [1, 4, 7]
        assert list(h["cnt"]) == [2, 3, 1]


class TestQuantileBuckets:
    def _ds(self):
        import pandas as pd

        rows = []
        # lang "en": values 1..9 -> terciles at 3 and 6
        for i, v in enumerate(range(1, 10)):
            rows.append({"id": i, "g": "en", "v": v})
        # lang "de": all equal -> everything lands in head
        for i in range(3):
            rows.append({"id": 100 + i, "g": "de", "v": 7})
        return ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)

    def test_tercile_assignment(self):
        from ai_knowledge_graph_ray.stages.quantiles import quantile_buckets

        out = quantile_buckets(
            self._ds(), "g", "v", passthrough_cols=["id"]
        ).to_pandas()
        en = out[out["g"] == "en"].set_index("id")["bucket"]
        assert list(en.sort_index()) == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        de = out[out["g"] == "de"]["bucket"]
        assert (de == "head").all()

    def test_label_arity_checked(self):
        from ai_knowledge_graph_ray.stages.quantiles import quantile_buckets

        with pytest.raises(ValueError):
            quantile_buckets(self._ds(), "g", "v", qs=(0.5,), labels=("a", "b", "c"))

    def test_group_gate_trips(self):
        from ai_knowledge_graph_ray.stages.quantiles import quantile_buckets

        with pytest.raises(ValueError, match="max_groups"):
            quantile_buckets(self._ds(), "g", "v", max_groups=1).to_pandas()


class TestPercentileRanks:
    def test_matches_naive_cume_dist(self):
        from ai_knowledge_graph_ray.stages.quantiles import percentile_ranks

        vals = [5, 1, 3, 3, 9, 1, 7]
        df = pd.DataFrame({"id": range(len(vals)), "v": vals})
        ds = ray.data.from_pandas(df).repartition(3)
        out = {r["id"]: r["pct_milli"] for r in percentile_ranks(ds, "id", "v").take_all()}
        n = len(vals)
        for i, v in enumerate(vals):
            le = sum(1 for x in vals if x <= v)
            assert out[i] == (le * 1000) // n

    def test_distinct_gate_trips(self):
        from ai_knowledge_graph_ray.stages.quantiles import percentile_ranks

        df = pd.DataFrame({"id": range(10), "v": range(10)})
        with pytest.raises(ValueError, match="distinct"):
            percentile_ranks(
                ray.data.from_pandas(df), "id", "v", driver_max_values=2
            ).take_all()


class TestRfmSegments:
    def test_planted_metrics_scores_and_ties(self):
        from ai_knowledge_graph_ray.stages.segment import rfm_segments

        def o(cust, date, price):
            return {
                "o_custkey": cust,
                "o_orderdate": pd.Timestamp(date),
                "o_totalprice": price,
            }

        rows = [
            o(1, "2024-01-10", 10.00), o(1, "2024-03-05", 5.50),
            o(2, "2024-02-01", 20.00),
            o(3, "2024-01-05", 20.00),
        ]
        out = (
            rfm_segments(ray.data.from_items(rows).repartition(3))
            .to_pandas()
            .set_index("o_custkey")
            .sort_index()
        )
        # metrics: max-date recency, order count, integer-cents sum
        assert out.loc[1, "n_orders"] == 2
        assert out.loc[1, "monetary_cents"] == 1550
        assert out.loc[2, "monetary_cents"] == 2000
        # recency: distinct dates rank c3 < c1's Jan order is superseded
        # by March (max), so order is c3 < c2 < c1
        assert list(out["r_score"]) == [4, 2, 1]
        # frequency: c2/c3 tie at 1 order share le=2 -> score 2; c1 -> 4
        assert list(out["f_score"]) == [4, 2, 2]
        # monetary: c2/c3 tie at the TOP share le=3 -> score 4; c1 -> 1
        assert list(out["m_score"]) == [1, 4, 4]
        assert list(out["segment"]) == ["441", "224", "124"]

    def test_all_tied_metric_lands_in_top_bin(self):
        from ai_knowledge_graph_ray.stages.segment import rfm_segments

        rows = [
            {"o_custkey": i, "o_orderdate": pd.Timestamp("2024-01-01"), "o_totalprice": 5.0}
            for i in range(5)
        ]
        out = rfm_segments(ray.data.from_items(rows)).to_pandas()
        # every metric fully tied: le = n for all -> everyone shares the
        # top bin (n >= n_bins; with fewer rows the shared bin is lower)
        assert set(out["segment"]) == {"555"}

    def test_gate_trips(self):
        from ai_knowledge_graph_ray.stages.segment import rfm_segments

        rows = [
            {"o_custkey": i, "o_orderdate": pd.Timestamp("2024-01-01") + pd.Timedelta(days=i), "o_totalprice": 5.0}
            for i in range(6)
        ]
        with pytest.raises(ValueError, match="distinct"):
            rfm_segments(
                ray.data.from_items(rows), driver_max_values=2
            ).take_all()


class TestApproxQuantilesHist:
    def test_within_one_bin_of_exact(self):
        from ai_knowledge_graph_ray.stages.quantiles import (
            approx_quantiles_hist,
            exact_quantiles,
        )

        rng = np.random.RandomState(7)
        vals = rng.randint(0, 100_000, size=5000)
        ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(5)
        approx = {
            r["q_milli"]: r["approx_value"]
            for r in approx_quantiles_hist(ds, "v", (250, 500, 900)).take_all()
        }
        exact = {
            int(round(r["q"] * 1000)): r["value"]
            for r in exact_quantiles(ds, "v", (0.25, 0.5, 0.9)).to_pylist()
        }
        width = (int(vals.max()) - int(vals.min()) + 1) / 1000
        for q, av in approx.items():
            assert abs(av - exact[q]) <= width + 1

    def test_partition_invariance(self):
        from ai_knowledge_graph_ray.stages.quantiles import approx_quantiles_hist

        vals = pd.DataFrame({"v": np.arange(1, 2001, dtype=np.int64) ** 2 % 7919})
        a = approx_quantiles_hist(ray.data.from_pandas(vals).repartition(1), "v").to_pandas()
        b = approx_quantiles_hist(ray.data.from_pandas(vals).repartition(13), "v").to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("q_milli").reset_index(drop=True),
            b.sort_values("q_milli").reset_index(drop=True),
        )

    def test_empty(self):
        from ai_knowledge_graph_ray.stages.quantiles import approx_quantiles_hist

        ds = ray.data.from_pandas(pd.DataFrame({"v": pd.Series([], dtype="int64")}))
        assert approx_quantiles_hist(ds, "v").count() == 0


class TestWinsorizedGroupStats:
    def _data(self, seed=7, n=4000, groups=("a", "b", "c")):
        rng = np.random.RandomState(seed)
        g = np.array(groups, dtype=object)[rng.randint(0, len(groups), n)]
        v = rng.randint(-1000, 1000, n).astype("int64")
        # plant extreme outliers that winsorization must clamp
        v[:20] = 10_000_000
        v[20:40] = -10_000_000
        return pd.DataFrame({"g": g, "v": v})

    def _ref(self, df, q_lo=0.05, q_hi=0.95):
        rows = []
        for g, sub in df.groupby("g"):
            v = np.sort(sub["v"].to_numpy())
            n = len(v)
            lo = int(v[max(1, math.ceil(q_lo * n)) - 1])
            hi = int(v[max(1, math.ceil(q_hi * n)) - 1])
            clamped = np.minimum(np.maximum(sub["v"].to_numpy(), lo), hi)
            rows.append(
                {
                    "g": g,
                    "n": n,
                    "n_lo_clamped": int((sub["v"].to_numpy() < lo).sum()),
                    "n_hi_clamped": int((sub["v"].to_numpy() > hi).sum()),
                    "lo": lo,
                    "hi": hi,
                    "winsorized_sum": int(clamped.sum()),
                }
            )
        return pd.DataFrame(rows).sort_values("g").reset_index(drop=True)

    def test_matches_reference_and_clamps(self):
        from ai_knowledge_graph_ray.stages.quantiles import winsorized_group_stats

        df = self._data()
        ds = ray.data.from_pandas(df).repartition(7)
        out = (
            winsorized_group_stats(ds, "g", "v")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, self._ref(df), check_dtype=False)
        assert (out["n_hi_clamped"] > 0).any()  # planted outliers clamped

    def test_gate_equivalence_broadcast_vs_join(self):
        from ai_knowledge_graph_ray.stages.quantiles import winsorized_group_stats

        df = self._data(seed=11, n=2500)
        ds = ray.data.from_pandas(df).repartition(5)
        fast = (
            winsorized_group_stats(ds, "g", "v")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        # driver_max_groups=0 forces the cogroup_join scale path
        slow = (
            winsorized_group_stats(ds, "g", "v", driver_max_groups=0)
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, slow, check_dtype=False)

    def test_bad_quantiles_raise(self):
        from ai_knowledge_graph_ray.stages.quantiles import winsorized_group_stats

        ds = ray.data.from_pandas(pd.DataFrame({"g": ["a"], "v": [1]}))
        with pytest.raises(ValueError):
            winsorized_group_stats(ds, "g", "v", q_lo=0.9, q_hi=0.5)
