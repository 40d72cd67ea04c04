"""Rolling-window sums vs a pandas reference; full-outer join with
planted orphans on both sides and null right/left extras."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.relational import cogroup_join
from ai_knowledge_graph_ray.stages.sessions import rolling_sum


class TestRollingSum:
    def _frame(self):
        rng = np.random.RandomState(23)
        n = 3_000
        return pd.DataFrame(
            {
                "event_id": np.arange(n, dtype="int64"),
                "ts": rng.randint(0, 10_000, size=n).astype("int64"),
                "user_id": rng.randint(0, 40, size=n).astype("int64"),
                "val": rng.randint(-50, 200, size=n).astype("int64"),
            }
        )

    def test_matches_pandas_rolling(self):
        df = self._frame()
        out = (
            rolling_sum(ray.data.from_pandas(df).repartition(9), window=3)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        want = (
            s.assign(
                win_sum=s.groupby("user_id", sort=False)["val"]
                .rolling(3, min_periods=1)
                .sum()
                .reset_index(level=0, drop=True)
                .astype("int64")
            )[["event_id", "win_sum"]]
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, want)

    def test_window_one_is_identity(self):
        df = self._frame()
        out = (
            rolling_sum(ray.data.from_pandas(df), window=1)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert (out["win_sum"].to_numpy() == df["val"].to_numpy()).all()

    def test_window_larger_than_group_equals_running(self):
        from ai_knowledge_graph_ray.stages.sessions import running_sum

        df = self._frame()
        roll = (
            rolling_sum(ray.data.from_pandas(df), window=10_000)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        run = (
            running_sum(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert (roll["win_sum"].to_numpy() == run["cum"].to_numpy()).all()


class TestFullOuterJoin:
    def test_orphans_both_sides(self):
        left = pd.DataFrame({"k": [1, 2, 3], "lx": [10, 20, 30]})
        right = pd.DataFrame({"k": [2, 3, 4, 4], "rx": [200, 300, 400, 401]})
        out = (
            cogroup_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                on=["k"],
                how="full_outer",
            )
            .to_pandas()
            .sort_values(["k", "rx"], na_position="first")
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, on="k", how="outer")
            .sort_values(["k", "rx"], na_position="first")
            .reset_index(drop=True)
        )
        assert list(out["k"]) == list(want["k"])
        # left orphan k=1 has null rx; right orphans k=4 have null lx
        assert out.loc[out["k"] == 1, "rx"].isna().all()
        assert out.loc[out["k"] == 4, "lx"].isna().all()
        assert len(out) == 5
        # matched rows carry both sides
        m = out[out["k"] == 2]
        assert list(m["lx"]) == [20] and list(m["rx"]) == [200]

    def test_full_outer_reduces_to_inner_plus_orphans(self):
        rng = np.random.RandomState(31)
        left = pd.DataFrame(
            {"k": rng.randint(0, 60, size=400).astype("int64"),
             "lx": np.arange(400, dtype="int64")}
        ).drop_duplicates("k")
        right = pd.DataFrame(
            {"k": (rng.randint(0, 60, size=400) + 30).astype("int64"),
             "rx": np.arange(400, dtype="int64")}
        ).drop_duplicates("k")
        out = (
            cogroup_join(
                ray.data.from_pandas(left).repartition(5),
                ray.data.from_pandas(right).repartition(3),
                on=["k"],
                how="full_outer",
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, on="k", how="outer")
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert len(out) == len(want)
        assert list(out["k"]) == list(want["k"])
        assert out["lx"].isna().sum() == want["lx"].isna().sum()
        assert out["rx"].isna().sum() == want["rx"].isna().sum()

    def test_full_outer_empty_left(self):
        left = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                             "lx": pd.Series([], dtype="int64")})
        right = pd.DataFrame({"k": [7, 8], "rx": [70, 80]})
        out = (
            cogroup_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                on=["k"],
                how="full_outer",
                left_schema=pa.schema([("k", pa.int64()), ("lx", pa.int64())]),
                right_schema=pa.schema([("k", pa.int64()), ("rx", pa.int64())]),
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert list(out["k"]) == [7, 8]
        assert out["lx"].isna().all()
        assert list(out["rx"]) == [70, 80]


class TestPivotCounts:
    def test_matches_crosstab(self):
        from ai_knowledge_graph_ray.stages.relational import pivot_counts

        rng = np.random.RandomState(41)
        df = pd.DataFrame(
            {
                "g": rng.randint(0, 30, size=2_000).astype("int64"),
                "t": rng.choice(["x", "y", "z", "other"], size=2_000),
            }
        )
        out = (
            pivot_counts(
                ray.data.from_pandas(df).repartition(6),
                "g",
                "t",
                ["x", "y", "z"],
                key_type=pa.int64(),
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        ct = pd.crosstab(df["g"], df["t"])
        for v in ("x", "y", "z"):
            assert (
                out.set_index("g")[f"n_{v}"] == ct[v].reindex(out["g"]).fillna(0)
            ).all(), v
        # undeclared column values are ignored, not columns
        assert "n_other" not in out.columns


class TestGapfillCounts:
    def _ds(self):
        import pandas as pd

        # hours 0, 0, 3 (two empty hours in between)
        ts = pd.to_datetime(
            ["2024-01-01 00:10", "2024-01-01 00:50", "2024-01-01 03:05"]
        )
        return ray.data.from_pandas(pd.DataFrame({"ts": ts}))

    def test_fills_gaps_with_zero(self):
        from ai_knowledge_graph_ray.stages.sessions import gapfill_counts

        out = (
            gapfill_counts(self._ds(), "ts")
            .to_pandas()
            .sort_values("bucket_start_us")
            .reset_index(drop=True)
        )
        assert out["n_events"].tolist() == [2, 0, 0, 1]
        hrs = out["bucket_start_us"].to_numpy()
        assert ((hrs[1:] - hrs[:-1]) == 3_600_000_000).all()

    def test_forced_distributed_spine(self):
        from ai_knowledge_graph_ray.stages.sessions import gapfill_counts

        a = (
            gapfill_counts(self._ds(), "ts")
            .to_pandas()
            .sort_values("bucket_start_us")
            .reset_index(drop=True)
        )
        b = (
            gapfill_counts(self._ds(), "ts", driver_max_buckets=0)
            .to_pandas()
            .sort_values("bucket_start_us")
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_empty(self):
        from ai_knowledge_graph_ray.stages.sessions import gapfill_counts

        assert gapfill_counts(self._ds().filter(lambda r: False), "ts").count() == 0


class TestFunnelCounts:
    def test_hand_case_strict_order(self):
        import pandas as pd

        from ai_knowledge_graph_ray.stages.sessions import funnel_counts

        def ev(u, t, s):
            return {"user_id": u, "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=t), "event_type": s}

        rows = [
            # u1 full chain in order
            ev(1, 0, "view"), ev(1, 5, "click"), ev(1, 9, "purchase"),
            # u2 clicks BEFORE viewing -> stops at view
            ev(2, 5, "click"), ev(2, 9, "view"),
            # u3 view+click but purchase at the SAME ts as click (strict >)
            ev(3, 0, "view"), ev(3, 4, "click"), ev(3, 4, "purchase"),
            # u4 never views
            ev(4, 0, "click"), ev(4, 1, "purchase"),
            # noise types ignored
            ev(1, 2, "error"),
        ]
        out = {
            r["stage"]: r["n_users"]
            for r in funnel_counts(
                ray.data.from_items(rows).repartition(3),
                ("view", "click", "purchase"),
            ).take_all()
        }
        assert out == {"view": 3, "click": 2, "purchase": 1}

    def test_multiple_qualifying_events_use_earliest(self):
        import pandas as pd

        from ai_knowledge_graph_ray.stages.sessions import funnel_counts

        def ev(u, t, s):
            return {"user_id": u, "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=t), "event_type": s}

        # second view at t=6 would invalidate the t=5 click if the chain
        # wrongly used the LAST view; earliest-qualifying must pass
        rows = [ev(1, 0, "view"), ev(1, 6, "view"), ev(1, 5, "click"), ev(1, 7, "purchase")]
        out = {
            r["stage"]: r["n_users"]
            for r in funnel_counts(ray.data.from_items(rows), ("view", "click", "purchase")).take_all()
        }
        assert out == {"view": 1, "click": 1, "purchase": 1}


class TestRetentionMatrix:
    def test_planted_cohorts(self):
        import pandas as pd

        from ai_knowledge_graph_ray.stages.sessions import retention_matrix

        week = pd.Timedelta(days=7)
        t0 = pd.Timestamp("2024-01-04")  # mid-week; floor is epoch-based

        def ev(u, w, minute=0):
            return {"user_id": u, "ts": t0 + w * week + pd.Timedelta(minutes=minute)}

        rows = [
            # u1: cohort week 0, active weeks 0, 1, 3 (two events in week 1
            # must count once)
            ev(1, 0), ev(1, 1), ev(1, 1, minute=30), ev(1, 3),
            # u2: cohort week 0, active week 0 only
            ev(2, 0),
            # u3: cohort week 1, active weeks 1, 2
            ev(3, 1), ev(3, 2),
        ]
        out = retention_matrix(
            ray.data.from_items(rows).repartition(3)
        ).to_pandas()
        period = 604_800_000_000
        cohort0 = out["cohort_start_us"].min()
        cells = {
            (int((r.cohort_start_us - cohort0) // period), int(r.period_offset)): int(
                r.n_users
            )
            for r in out.itertuples()
        }
        assert cells == {
            (0, 0): 2,  # u1 + u2
            (0, 1): 1,  # u1 retained in week 1 (double event counts once)
            (0, 3): 1,  # u1 back in week 3
            (1, 0): 1,  # u3's own cohort starts a week later
            (1, 1): 1,  # u3 retained
        }

    def test_empty(self):
        from ai_knowledge_graph_ray.stages.sessions import retention_matrix

        import pandas as pd

        ev = ray.data.from_pandas(
            pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "ts": pd.Series([], dtype="datetime64[us]")})
        )
        assert retention_matrix(ev).count() == 0
