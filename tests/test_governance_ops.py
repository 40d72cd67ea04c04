"""Out-of-orderness profile, content checksum, DP noisy counts,
length-grouped batching: hand pins, layout independence, tamper
detection, noise bounds."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from ai_knowledge_graph_ray.stages.packing import length_grouped_batches
from ai_knowledge_graph_ray.stages.sessions import out_of_order_profile
from ai_knowledge_graph_ray.stages.validate import (
    content_checksum,
    dp_noisy_counts,
    geometric_noise_table,
)


def _events(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                "event_id": list(range(len(rows))),
            }
        )
    )


class TestOutOfOrder:
    def test_hand_pinned(self):
        # u1 arrivals (event_id order) with event times:
        # 100, 300, 200 (late by 100), 300 (not late: not < max), 250 (late by 50)
        rows = [(1, 100), (1, 300), (1, 200), (1, 300), (1, 250), (2, 5)]
        out = out_of_order_profile(_events(rows)).to_pandas().set_index("user_id")
        assert out.loc[1, "n_events"] == 5
        assert out.loc[1, "n_late"] == 2
        assert out.loc[1, "max_lateness_us"] == 100
        assert out.loc[2, "n_late"] == 0 and out.loc[2, "max_lateness_us"] == 0

    def test_layout_independence(self):
        rng = np.random.RandomState(7)
        rows = [(int(u), int(t)) for u, t in zip(
            rng.randint(0, 30, 500), rng.randint(0, 10**9, 500)
        )]
        a = out_of_order_profile(_events(rows)).to_pandas()
        b = out_of_order_profile(
            _events(rows).repartition(9), num_buckets=5
        ).to_pandas()
        k = ["user_id"]
        pd.testing.assert_frame_equal(
            a.sort_values(k).reset_index(drop=True),
            b.sort_values(k).reset_index(drop=True),
        )


def _docs(n=200, seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": [f"s{int(x)}" for x in rng.randint(0, 7, n)],
            "n_chars": rng.randint(1, 5000, n).astype(np.int64),
        }
    )


class TestContentChecksum:
    def test_layout_and_order_insensitive(self):
        df = _docs()
        cols = ["doc_id", "source", "n_chars"]
        a = content_checksum(ray.data.from_pandas(df), cols).to_pandas()
        shuffled = df.sample(frac=1, random_state=1).reset_index(drop=True)
        b = content_checksum(
            ray.data.from_pandas(shuffled).repartition(7), cols, num_buckets=3
        ).to_pandas()
        k = ["slice"]
        pd.testing.assert_frame_equal(
            a.sort_values(k).reset_index(drop=True),
            b.sort_values(k).reset_index(drop=True),
        )
        assert a["n_rows"].sum() == len(df)

    def test_single_row_tamper_flips_exactly_its_slice(self):
        df = _docs()
        cols = ["doc_id", "source", "n_chars"]
        a = content_checksum(ray.data.from_pandas(df), cols).to_pandas()
        tampered = df.copy()
        tampered.loc[17, "n_chars"] += 1
        b = content_checksum(ray.data.from_pandas(tampered), cols).to_pandas()
        merged = a.merge(b, on="slice", how="outer", suffixes=("_a", "_b"))
        diff = merged[merged["checksum_a"] != merged["checksum_b"]]
        assert 1 <= len(diff) <= 2  # old slice and/or new slice of row 17

    def test_refuses_floats_and_nulls(self):
        df = _docs()
        df["f"] = 1.5
        with pytest.raises(TypeError):
            content_checksum(ray.data.from_pandas(df), ["doc_id", "f"])
        df2 = _docs().astype({"source": object})
        df2.loc[3, "source"] = None
        with pytest.raises(Exception):
            content_checksum(
                ray.data.from_pandas(df2), ["doc_id", "source"]
            ).materialize()


class TestDpCounts:
    def test_noise_bounded_and_deterministic(self):
        df = pd.DataFrame({"g": ["a"] * 100 + ["b"] * 50 + ["c"] * 3})
        ds = ray.data.from_pandas(df)
        out = dp_noisy_counts(ds, "g", k_bound=12).to_pandas().set_index("group")
        true = {"a": 100, "b": 50, "c": 3}
        for g, n in true.items():
            assert abs(int(out.loc[g, "noisy_count"]) - n) <= 12
        out2 = dp_noisy_counts(
            ray.data.from_pandas(df).repartition(5), "g", k_bound=12
        ).to_pandas().set_index("group")
        pd.testing.assert_frame_equal(out.sort_index(), out2.sort_index())

    def test_seed_changes_noise_and_clamps_at_zero(self):
        # 50 distinct groups of count 1: across seeds SOME noise differs,
        # and no release ever goes negative
        df = pd.DataFrame({"g": [f"g{i}" for i in range(50)]})
        ds = ray.data.from_pandas(df)
        a = dp_noisy_counts(ds, "g", seed="s1").to_pandas().set_index("group")
        b = dp_noisy_counts(ds, "g", seed="s2").to_pandas().set_index("group")
        assert (a["noisy_count"] >= 0).all() and (b["noisy_count"] >= 0).all()
        assert (a.sort_index()["noisy_count"] != b.sort_index()["noisy_count"]).any()

    def test_noise_table_is_a_partition(self):
        rows, total = geometric_noise_table(8)
        assert rows[0][0] == 0 and rows[-1][1] == total
        for (lo, hi, _), (lo2, _, _) in zip(rows, rows[1:]):
            assert hi == lo2 and hi > lo
        # symmetric weights
        ws = [hi - lo for lo, hi, _ in rows]
        assert ws == ws[::-1]


class TestLengthBatches:
    def test_matches_bruteforce(self):
        df = _docs(n=333)
        out = (
            length_grouped_batches(
                ray.data.from_pandas(df).repartition(6), batch_rows=50
            )
            .to_pandas().sort_values("batch_id").reset_index(drop=True)
        )
        ref = df.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        ref["batch_id"] = np.arange(len(ref)) // 50
        exp = ref.groupby("batch_id").agg(
            n_docs=("n_chars", "size"),
            max_len=("n_chars", "max"),
            sum_len=("n_chars", "sum"),
        ).reset_index()
        exp["pad_waste"] = exp["n_docs"] * exp["max_len"] - exp["sum_len"]
        pd.testing.assert_frame_equal(out, exp.astype("int64"))
        # length grouping keeps waste below the unsorted baseline
        unsorted = df.copy()
        unsorted["batch_id"] = np.arange(len(unsorted)) // 50
        base = unsorted.groupby("batch_id").apply(
            lambda g: len(g) * g["n_chars"].max() - g["n_chars"].sum(),
            include_groups=False,
        ).sum()
        assert out["pad_waste"].sum() < base

    def test_id_range_guard(self):
        df = pd.DataFrame({"doc_id": [1 << 33], "n_chars": [10]})
        with pytest.raises(Exception):
            length_grouped_batches(
                ray.data.from_pandas(df), batch_rows=4
            ).materialize()
