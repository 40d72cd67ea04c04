"""Bloom semi-join prefilter, left_semi join, per-group hash sampling,
per-key running sums — semantics vs driver-side pandas ground truth."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ai_knowledge_graph_ray.stages.bloom import (
    bloom_contains,
    bloom_prefilter,
    build_bloom,
    semi_join_bloom,
)
from ai_knowledge_graph_ray.stages.relational import (
    cogroup_join,
    sample_per_group,
)
from ai_knowledge_graph_ray.stages.sessions import running_sum


def _arrow_ds(df: pd.DataFrame) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


class TestBloom:
    def test_no_false_negatives(self):
        keys = pd.DataFrame({"k": [f"key{i}" for i in range(5000)]})
        bm = build_bloom(_arrow_ds(keys), ["k"], num_bits=1 << 16)
        mask = bloom_contains(bm, keys["k"].astype(str))
        assert mask.all()

    def test_low_false_positive_rate(self):
        members = pd.DataFrame({"k": [f"in{i}" for i in range(2000)]})
        others = pd.Series([f"out{i}" for i in range(20000)])
        bm = build_bloom(_arrow_ds(members), ["k"], num_bits=1 << 16)
        fpr = bloom_contains(bm, others).mean()
        # 2000 keys in 2^16 bits, 4 hashes -> theoretical FPR ~ 0.2%
        assert fpr < 0.02, fpr

    def test_prefilter_drops_nonmembers(self):
        right = _arrow_ds(pd.DataFrame({"k": list(range(0, 100))}))
        left = _arrow_ds(pd.DataFrame({"k": list(range(0, 10000)), "v": range(10000)}))
        bm_ref = ray.put(build_bloom(right, ["k"]))
        kept = bloom_prefilter(left, ["k"], bm_ref).count()
        assert 100 <= kept < 300, kept  # all members + few false positives

    def test_semi_join_bloom_exact(self):
        rng = np.random.default_rng(3)
        l = pd.DataFrame({"k": rng.integers(0, 1000, 5000), "v": np.arange(5000)})
        r = pd.DataFrame({"k": rng.integers(0, 100, 500)})
        got = sorted(
            (x["k"], x["v"])
            for x in semi_join_bloom(_arrow_ds(l), _arrow_ds(r), on=["k"]).take_all()
        )
        want = sorted(
            (k, v) for k, v in zip(l["k"], l["v"]) if k in set(r["k"])
        )
        assert got == want


class TestLeftSemiJoin:
    def test_matches_pandas(self):
        l = pd.DataFrame({"k": ["a", "b", "c", "a"], "v": [1, 2, 3, 4]})
        r = pd.DataFrame({"k": ["a", "a", "x"], "rv": [1, 2, 3]})
        got = sorted(
            (x["k"], x["v"])
            for x in cogroup_join(
                _arrow_ds(l), _arrow_ds(r), on=["k"], how="left_semi"
            ).take_all()
        )
        assert got == [("a", 1), ("a", 4)]


class TestSamplePerGroup:
    def test_matches_driver_rank(self):
        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "g": rng.choice(list("abcd"), 2000),
                "id": np.arange(2000, dtype=np.int64),
            }
        )
        got = sorted(
            (r["g"], r["id"])
            for r in sample_per_group(_arrow_ds(df), "g", "id", 7).take_all()
        )
        d = df.copy()
        d["rank"] = (d["id"] * 48271) % 2147483647
        want = sorted(
            (g, i)
            for g, i in d.sort_values(["rank", "id"])
            .groupby("g", sort=False)
            .head(7)[["g", "id"]]
            .itertuples(index=False)
        )
        assert got == want

    def test_small_groups_returned_whole(self):
        df = pd.DataFrame({"g": ["x", "x", "y"], "id": [1, 2, 3]})
        got = sorted(
            (r["g"], r["id"])
            for r in sample_per_group(_arrow_ds(df), "g", "id", 10).take_all()
        )
        assert got == [("x", 1), ("x", 2), ("y", 3)]


class TestRunningSum:
    def test_matches_pandas_cumsum(self, sf_dir):
        cols = ["event_id", "ts", "user_id", "value"]
        pdf = pd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
        pdf["val"] = (pdf["value"] * 100).round().astype("int64")
        ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols).map_batches(
            lambda b: pd.DataFrame(
                {
                    "event_id": b["event_id"],
                    "ts": b["ts"],
                    "user_id": b["user_id"],
                    "val": (b["value"] * 100).round().astype("int64"),
                }
            ),
            batch_format="pandas",
        )
        got = {r["event_id"]: r["cum"] for r in running_sum(ds).take_all()}
        s = pdf.sort_values(["user_id", "ts", "event_id"], kind="stable")
        want = s.groupby("user_id", sort=False)["val"].cumsum()
        assert len(got) == len(pdf)
        for eid, w in zip(s["event_id"], want):
            assert got[eid] == w


class TestMixtureSample:
    def _ds(self, n=4000, blocks=4):
        df = pd.DataFrame(
            {
                "id": np.arange(n, dtype=np.int64),
                "g": np.where(np.arange(n) % 2 == 0, "half", "none"),
            }
        )
        return ray.data.from_pandas(df).repartition(blocks)

    def test_rates_and_unknown_default(self):
        from ai_knowledge_graph_ray.stages.relational import bernoulli_mixture_sample

        out = bernoulli_mixture_sample(
            self._ds(), "id", "g", {"half": 500, "none": 0}, default_milli=0
        ).to_pandas()
        assert (out["g"] == "half").all()  # rate-0 group fully dropped
        # 2000 candidates at 50%: binomial well inside +-5 sigma
        assert 850 <= len(out) <= 1150

    def test_full_rate_keeps_all_and_layout_independent(self):
        from ai_knowledge_graph_ray.stages.relational import bernoulli_mixture_sample

        full = bernoulli_mixture_sample(
            self._ds(), "id", "g", {"half": 1000, "none": 1000}
        ).to_pandas()
        assert len(full) == 4000
        a = bernoulli_mixture_sample(
            self._ds(blocks=1), "id", "g", {"half": 300}, default_milli=700
        ).to_pandas().sort_values("id").reset_index(drop=True)
        b = bernoulli_mixture_sample(
            self._ds(blocks=7), "id", "g", {"half": 300}, default_milli=700
        ).to_pandas().sort_values("id").reset_index(drop=True)
        assert a.equals(b)

    def test_large_ids_no_overflow(self):
        from ai_knowledge_graph_ray.stages.relational import bernoulli_mixture_sample

        df = pd.DataFrame({"id": np.int64([2**62, 2**62 + 1, 7]), "g": ["a"] * 3})
        out = bernoulli_mixture_sample(
            ray.data.from_pandas(df), "id", "g", {"a": 1000}
        ).to_pandas()
        assert len(out) == 3  # rate 1000 keeps everything, no wraparound


class TestCapPerGroup:
    def test_head_k_and_layouts(self):
        from ai_knowledge_graph_ray.stages.relational import cap_per_group

        df = pd.DataFrame(
            {
                "g": ["a"] * 5 + ["b"] * 2,
                "id": [50, 10, 30, 20, 40, 7, 3],
            }
        )
        for blocks in (1, 4):
            ds = ray.data.from_pandas(df).repartition(blocks)
            got = sorted(
                (r["g"], r["id"]) for r in cap_per_group(ds, "g", "id", 3).take_all()
            )
            assert got == [("a", 10), ("a", 20), ("a", 30), ("b", 3), ("b", 7)]


class TestMixtureResample:
    def test_copies_and_copy_ids(self):
        from ai_knowledge_graph_ray.stages.relational import mixture_resample

        df = pd.DataFrame(
            {"id": np.arange(2000, dtype=np.int64), "g": ["up", "down"] * 1000}
        )
        ds = ray.data.from_pandas(df).repartition(4)
        out = mixture_resample(
            ds, "id", "g", {"up": 2500, "down": 0}
        ).to_pandas()
        assert (out["g"] == "up").all()  # rate-0 group fully dropped
        per = out.groupby("id").size()
        # every up-row appears 2 or 3 times; ~half get the 3rd copy
        assert set(per.unique()) == {2, 3}
        n3 = (per == 3).sum()
        assert 350 <= n3 <= 650
        # copy ids are 0..n-1 per row
        for _, g in out.groupby("id"):
            assert sorted(g["copy_id"]) == list(range(len(g)))

    def test_exact_integer_epochs(self):
        from ai_knowledge_graph_ray.stages.relational import mixture_resample

        df = pd.DataFrame({"id": np.arange(50, dtype=np.int64), "g": ["a"] * 50})
        out = mixture_resample(ray.data.from_pandas(df), "id", "g", {"a": 3000}).to_pandas()
        assert len(out) == 150 and out.groupby("id").size().eq(3).all()
