"""Histogram drift, k-anonymity suppression (both gate paths), and
weighted Bernoulli sampling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.drift import histogram_drift
from ai_knowledge_graph_ray.stages.relational import bernoulli_weighted_sample
from ai_knowledge_graph_ray.stages.validate import k_anonymize


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


class TestHistogramDrift:
    def test_planted_shift(self):
        a = pd.DataFrame({"bucket": [0] * 80 + [1] * 20})
        b = pd.DataFrame({"bucket": [0] * 20 + [1] * 80})
        out = (
            histogram_drift(_ds(a), _ds(b), "bucket")
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        assert list(out["cnt_a"]) == [80, 20]
        assert list(out["cnt_b"]) == [20, 80]
        assert list(out["rate_a_milli"]) == [800, 200]
        assert list(out["drift_milli"]) == [600, 600]

    def test_bucket_missing_on_one_side(self):
        a = pd.DataFrame({"bucket": [0, 0, 1]})
        b = pd.DataFrame({"bucket": [0, 2]})
        out = histogram_drift(_ds(a), _ds(b), "bucket").to_pandas()
        rows = {r["bucket"]: r for _, r in out.iterrows()}
        assert rows[1]["cnt_b"] == 0 and rows[2]["cnt_a"] == 0
        assert rows[2]["rate_b_milli"] == 500

    def test_one_side_empty(self):
        a = pd.DataFrame({"bucket": [0, 1]})
        b = pd.DataFrame({"bucket": pd.Series([], dtype="int64")})
        out = histogram_drift(_ds(a), ray.data.from_pandas(b), "bucket").to_pandas()
        assert (out["cnt_b"] == 0).all()
        assert (out["rate_a_milli"] == 500).all()


KANON_SCHEMA = pa.schema(
    [("rid", pa.int64()), ("q1", pa.string()), ("q2", pa.string())]
)


class TestKAnonymize:
    def _df(self):
        # group (x, p): 5 rows (safe at k=3); (y, p): 2 rows (small);
        # (z, q): 1 row (small)
        return pd.DataFrame(
            {
                "rid": np.arange(8, dtype=np.int64),
                "q1": ["x"] * 5 + ["y", "y", "z"],
                "q2": ["p"] * 7 + ["q"],
            }
        )

    def _check(self, out: pd.DataFrame):
        out = out.sort_values("rid").reset_index(drop=True)
        assert list(out["q1"][:5]) == ["x"] * 5
        assert list(out["q1"][5:]) == ["(suppressed)"] * 3
        assert list(out["q2"][5:]) == ["(suppressed)"] * 3

    def test_broadcast_path(self):
        out = k_anonymize(
            _ds(self._df(), 4), ["q1", "q2"], k=3, out_schema=KANON_SCHEMA
        ).to_pandas()
        self._check(out)

    def test_join_path_equivalent(self):
        out = k_anonymize(
            _ds(self._df(), 4), ["q1", "q2"], k=3, out_schema=KANON_SCHEMA,
            driver_max_small_groups=0,
        ).to_pandas()
        self._check(out)


class TestWeightedSample:
    def test_zero_weight_never_kept_cap_always(self):
        df = pd.DataFrame(
            {
                "id": np.arange(1, 2001, dtype=np.int64),
                "w": np.where(np.arange(1, 2001) % 2 == 0, 0, 10**6),
            }
        )
        out = bernoulli_weighted_sample(
            _ds(df, 4), "id", "w", weight_cap=100
        ).to_pandas()
        assert (out["w"] > 0).all()          # zero weight never kept
        assert len(out) == 1000              # weight >= cap always kept

    def test_rate_proportional(self):
        n = 20000
        df = pd.DataFrame(
            {"id": np.arange(n, dtype=np.int64),
             "w": np.full(n, 25, dtype=np.int64)}
        )
        out = bernoulli_weighted_sample(
            _ds(df, 4), "id", "w", weight_cap=100
        ).to_pandas()
        assert 0.22 < len(out) / n < 0.28    # ~25%

    def test_deterministic(self):
        df = pd.DataFrame(
            {"id": np.arange(500, dtype=np.int64),
             "w": np.arange(500, dtype=np.int64)}
        )
        a = bernoulli_weighted_sample(_ds(df, 2), "id", "w", weight_cap=250)
        b = bernoulli_weighted_sample(_ds(df, 7), "id", "w", weight_cap=250)
        pd.testing.assert_frame_equal(
            a.to_pandas().sort_values("id").reset_index(drop=True),
            b.to_pandas().sort_values("id").reset_index(drop=True),
        )


class TestCusumChangepoints:
    @staticmethod
    def _local(counts: dict) -> tuple[int, int]:
        """Brute CUSUM on {bucket: count} — max drawup + first argmax."""
        buckets = sorted(counts)
        n, s = len(buckets), sum(counts.values())
        # running min over SEEN prefixes only (no virtual empty-prefix
        # 0) — the operator's cummin and the SQL twin's window min
        pf, mn, best, at = 0, None, None, None
        for t in buckets:
            pf += counts[t] * n - s
            mn = pf if mn is None else min(mn, pf)
            d = pf - mn
            if best is None or d > best:
                best, at = d, t
        return best, at

    def test_planted_level_shift(self):
        from ai_knowledge_graph_ray.stages.drift import cusum_changepoints

        # 10 quiet hours of 5 events, then 10 loud hours of 50: the
        # change should land where the loud regime's drawup peaks.
        rows = []
        counts = {}
        for h in range(20):
            c = 5 if h < 10 else 50
            counts[h] = c
            rows += [{"k": "t", "hour": h}] * c
        out = cusum_changepoints(
            _ds(pd.DataFrame(rows), 5), "k", "hour"
        ).to_pandas()
        want_max, want_at = self._local(counts)
        assert out.iloc[0]["cusum_max"] == want_max
        assert out.iloc[0]["change_bucket"] == want_at
        assert want_at == 19  # drawup keeps climbing through the loud run

    def test_flat_series_zero(self):
        from ai_knowledge_graph_ray.stages.drift import cusum_changepoints

        rows = [{"k": "t", "hour": h} for h in range(8) for _ in range(3)]
        out = cusum_changepoints(_ds(pd.DataFrame(rows), 3), "k", "hour").to_pandas()
        assert out.iloc[0]["cusum_max"] == 0
        assert out.iloc[0]["change_bucket"] == 0  # first bucket ties at 0

    def test_matches_brute_multi_key_and_layout(self):
        from ai_knowledge_graph_ray.stages.drift import cusum_changepoints

        rng = np.random.RandomState(11)
        rows = []
        per_key = {}
        for k in ("a", "b", "c"):
            counts = {}
            for h in range(15):
                c = int(rng.randint(1, 12))
                counts[h] = c
                rows += [{"k": k, "hour": h}] * c
            per_key[k] = self._local(counts)
        df = pd.DataFrame(rows)
        outs = [
            cusum_changepoints(_ds(df, p), "k", "hour", num_buckets=nb)
            .to_pandas().sort_values("k").reset_index(drop=True)
            for p, nb in ((1, None), (7, 3), (13, 5))
        ]
        for out in outs:
            for _, r in out.iterrows():
                assert (r["cusum_max"], r["change_bucket"]) == per_key[r["k"]]
        pd.testing.assert_frame_equal(outs[0], outs[1])
        pd.testing.assert_frame_equal(outs[0], outs[2])
