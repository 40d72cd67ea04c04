"""Table profiler: per-column null/distinct/min/max vs a DuckDB
UNION-ALL oracle, null handling, partition invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.profile import profile_table


def _frame(rng: np.random.RandomState, n: int = 2000) -> pd.DataFrame:
    ints = rng.randint(0, 50, n).astype("int64")
    strs = rng.choice(np.array(["alpha", "beta", "gamma", None], dtype=object), n)
    nullable_ints = pd.array(
        [None if rng.rand() < 0.1 else int(v) for v in ints], dtype="Int64"
    )
    return pd.DataFrame({"k": ints, "s": strs, "m": nullable_ints})


def _oracle(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    sql = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS "column", count(*) AS n_rows,
                   count(*) - count({c}) AS n_null,
                   count(DISTINCT {c}) AS n_distinct,
                   CAST(min({c}) AS VARCHAR) AS min_v,
                   CAST(max({c}) AS VARCHAR) AS max_v
            FROM t"""
        for c in cols
    )
    return con.execute(sql).df()


class TestProfileTable:
    def test_matches_duckdb_oracle(self):
        df = _frame(np.random.RandomState(5))
        cols = ["k", "s", "m"]
        got = (
            profile_table(ray.data.from_pandas(df).repartition(5), cols)
            .to_pandas()
            .sort_values("column")
            .reset_index(drop=True)
        )
        want = _oracle(df, cols).sort_values("column").reset_index(drop=True)
        for c in ["column", "n_rows", "n_null", "n_distinct", "min_v", "max_v"]:
            assert got[c].tolist() == want[c].tolist(), c

    def test_all_null_column(self):
        df = pd.DataFrame({"x": pd.array([None, None, None], dtype="Int64")})
        got = profile_table(ray.data.from_pandas(df).repartition(2), ["x"]).to_pandas()
        row = got.iloc[0]
        assert row["n_rows"] == 3 and row["n_null"] == 3
        assert row["n_distinct"] == 0
        assert row["min_v"] is None and row["max_v"] is None

    def test_partition_invariance(self):
        df = _frame(np.random.RandomState(8), n=500)
        a = profile_table(ray.data.from_pandas(df).repartition(1), ["k", "s"]).to_pandas()
        b = profile_table(ray.data.from_pandas(df).repartition(9), ["k", "s"]).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("column").reset_index(drop=True),
            b.sort_values("column").reset_index(drop=True),
        )


class TestFdAudit:
    def test_planted_violations(self):
        from ai_knowledge_graph_ray.stages.profile import fd_audit

        df = pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 3, 3],
                "v": ["x", "x", "y", "x", "z", "z"],
            }
        )
        out = (
            fd_audit(
                ray.data.from_pandas(df).repartition(3),
                [("k", "v"), ("v", "k")],
            )
            .to_pandas()
            .set_index(["lhs", "rhs"])
        )
        # k=1 sees {x,y}; k=2 and k=3 are single-valued
        assert out.loc[("k", "v"), "n_keys"] == 3
        assert out.loc[("k", "v"), "n_violating"] == 1
        # v=x sees keys {1,2}; y and z single-valued
        assert out.loc[("v", "k"), "n_keys"] == 3
        assert out.loc[("v", "k"), "n_violating"] == 1

    def test_clean_dependency(self):
        from ai_knowledge_graph_ray.stages.profile import fd_audit

        df = pd.DataFrame({"k": [1, 1, 2], "v": ["a", "a", "b"]})
        row = fd_audit(ray.data.from_pandas(df), [("k", "v")]).take_all()[0]
        assert row["n_keys"] == 2 and row["n_violating"] == 0


class TestSkewProfile:
    def test_planted_hot_key(self):
        from ai_knowledge_graph_ray.stages.profile import skew_profile

        keys = ["hot"] * 90 + [f"k{i}" for i in range(10)]
        df = pd.DataFrame({"k": keys})
        row = (
            skew_profile(ray.data.from_pandas(df).repartition(4), ["k"])
            .take_all()[0]
        )
        assert row["n_rows"] == 100
        assert row["n_keys"] == 11
        assert row["max_cnt"] == 90
        assert row["top1_share_milli"] == 900
        # counts sorted: ten keys at 1, one at 90; ceil(.99*11)=11 -> 90
        assert row["p99_cnt"] == 90

    def test_uniform_keys(self):
        from ai_knowledge_graph_ray.stages.profile import skew_profile

        df = pd.DataFrame({"k": list(range(20)) * 5})
        row = skew_profile(ray.data.from_pandas(df).repartition(3), ["k"]).take_all()[0]
        assert row["n_keys"] == 20 and row["max_cnt"] == 5
        assert row["top1_share_milli"] == 50
        assert row["p99_cnt"] == 5

    def test_empty(self):
        from ai_knowledge_graph_ray.stages.profile import skew_profile

        df = pd.DataFrame({"k": pd.Series([], dtype="object")})
        row = skew_profile(ray.data.from_pandas(df), ["k"]).take_all()[0]
        assert row["n_rows"] == 0 and row["n_keys"] == 0
