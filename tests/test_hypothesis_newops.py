"""Hypothesis property tests for the fifteenth-session primitives:
`grouped_string_agg` and `crosscorr_sums` against brute-force Python
references on generated inputs. max_examples is small because every
example executes a Ray pipeline (the shared session fixture)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data

settings.register_profile(
    "newops", deadline=None, max_examples=8, print_blob=True
)
settings.load_profile("newops")


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),          # key
        st.integers(min_value=0, max_value=50),         # order value
        st.integers(min_value=0, max_value=10 ** 6),    # unique tiebreak base
        st.sampled_from(["a", "b", "c", "xy"]),         # value token
    ),
    min_size=1,
    max_size=40,
)


class TestGroupedStringAggProperty:
    @given(rows=rows_strategy)
    def test_matches_bruteforce(self, rows):
        from ai_knowledge_graph_ray.stages.relational import grouped_string_agg

        import pyarrow as pa

        df = pd.DataFrame(rows, columns=["k", "o", "t", "v"])
        # make the tiebreak unique: (o, t, row index)
        df["t"] = df["t"] * 100 + range(len(df))
        out = (
            grouped_string_agg(
                ray.data.from_pandas(df).repartition(3),
                ["k"], ["o", "t"], "v",
                key_fields=[pa.field("k", pa.int64())], out_name="seq",
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        ref = (
            df.sort_values(["k", "o", "t"], kind="stable")
            .groupby("k", as_index=False)["v"]
            .agg("|".join)
            .rename(columns={"v": "seq"})
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            out.astype({"k": "int64"}), ref.astype({"k": "int64"})
        )


class TestCrosscorrProperty:
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["view", "click", "other"]),
                st.integers(min_value=0, max_value=12),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def test_matches_bruteforce(self, rows):
        from ai_knowledge_graph_ray.stages.drift import crosscorr_sums

        df = pd.DataFrame(rows, columns=["event_type", "hour"])
        df["hour"] = df["hour"].astype("int64")
        lags = (0, 1, 2)
        raw = crosscorr_sums(
            ray.data.from_pandas(df).repartition(2),
            "hour", "event_type", "view", "click", lags=lags,
        ).to_pandas()
        sub = df[df["event_type"].isin(["view", "click"])]
        if len(sub) == 0:
            # no view/click events: one zero row per lag — the SQL
            # twin's shape (ADVICE r3 fix; the old behavior returned
            # zero rows and diverged from the oracle on empty slices)
            assert list(raw.sort_values("lag")["lag"]) == list(lags)
            assert (raw["vc_sum"] == 0).all() and (raw["n_hours"] == 0).all()
            return
        out = raw.set_index("lag")
        h = (
            sub.assign(
                v=(sub["event_type"] == "view").astype(int),
                c=(sub["event_type"] == "click").astype(int),
            )
            .groupby("hour")[["v", "c"]]
            .sum()
        )
        for k in lags:
            vc, n = 0, 0
            for t, r in h.iterrows():
                if t + k in h.index:
                    vc += int(r["v"]) * int(h.loc[t + k, "c"])
                    n += 1
            assert out.loc[k, "vc_sum"] == vc, (k, rows)
            assert out.loc[k, "n_hours"] == n
