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
