"""ROLLUP hierarchy and grouped mode: planted fixtures, tie-breaks,
empty input, and a randomized SQL twin."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.rollup import grouped_mode, rollup_aggregate


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


class TestRollup:
    def test_two_level_hierarchy(self):
        df = pd.DataFrame(
            {
                "a": ["x", "x", "x", "y"],
                "b": ["p", "p", "q", "p"],
                "v": [1, 2, 4, 8],
            }
        )
        out = rollup_aggregate(_ds(df, 4), ["a", "b"], "v").to_pandas()
        rows = {
            (r["a"], r["b"], r["lvl"]): r["total"] for _, r in out.iterrows()
        }
        assert rows[("x", "p", 2)] == 3
        assert rows[("x", "q", 2)] == 4
        assert rows[("y", "p", 2)] == 8
        assert rows[("x", "(all)", 1)] == 7
        assert rows[("y", "(all)", 1)] == 8
        assert rows[("(all)", "(all)", 0)] == 15
        assert len(out) == 6

    def test_single_key(self):
        df = pd.DataFrame({"a": ["x", "y", "x"], "v": [1, 2, 3]})
        out = rollup_aggregate(_ds(df), ["a"], "v").to_pandas()
        rows = {(r["a"], r["lvl"]): r["total"] for _, r in out.iterrows()}
        assert rows == {("x", 1): 4, ("y", 1): 2, ("(all)", 0): 6}

    def test_empty_input(self):
        df = pd.DataFrame(
            {"a": pd.Series([], dtype="object"), "v": pd.Series([], dtype="int64")}
        )
        out = rollup_aggregate(ray.data.from_pandas(df), ["a"], "v").to_pandas()
        # grand total row survives with 0
        assert len(out) == 1
        assert out.iloc[0]["a"] == "(all)" and out.iloc[0]["total"] == 0

    def test_randomized_sql_twin(self):
        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "a": rng.choice(list("abcd"), 500),
                "b": rng.choice(list("xyz"), 500),
                "v": rng.integers(-50, 50, 500),
            }
        )
        df["v"] = df["v"].astype("int64")
        got = (
            rollup_aggregate(_ds(df, 5), ["a", "b"], "v")
            .to_pandas()
            .sort_values(["lvl", "a", "b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            """
            SELECT CASE WHEN grouping(a)=1 THEN '(all)' ELSE a END AS a,
                   CASE WHEN grouping(b)=1 THEN '(all)' ELSE b END AS b,
                   CAST(2 - grouping(a) - grouping(b) AS BIGINT) AS lvl,
                   CAST(sum(v) AS BIGINT) AS total
            FROM t GROUP BY ROLLUP(a, b)
            ORDER BY lvl, a, b
            """
        ).df()
        pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


class TestCube:
    def test_two_key_lattice(self):
        df = pd.DataFrame(
            {
                "a": ["x", "x", "x", "y"],
                "b": ["p", "p", "q", "p"],
                "v": [1, 2, 4, 8],
            }
        )
        from ai_knowledge_graph_ray.stages.rollup import cube_aggregate

        out = cube_aggregate(_ds(df, 4), ["a", "b"], "v").to_pandas()
        rows = {
            (r["a"], r["b"], r["lvl"]): r["total"] for _, r in out.iterrows()
        }
        # finest (3) + {a} (2) + {b} (2) + grand (1) = 8 rows
        assert len(out) == 8
        assert rows[("x", "p", 2)] == 3
        assert rows[("x", "(all)", 1)] == 7
        assert rows[("y", "(all)", 1)] == 8
        assert rows[("(all)", "p", 1)] == 11
        assert rows[("(all)", "q", 1)] == 4
        assert rows[("(all)", "(all)", 0)] == 15

    def test_randomized_sql_twin(self):
        from ai_knowledge_graph_ray.stages.rollup import cube_aggregate

        rng = np.random.default_rng(23)
        df = pd.DataFrame(
            {
                "a": rng.choice(list("abcd"), 400),
                "b": rng.choice(list("xyz"), 400),
                "v": rng.integers(0, 1000, 400),
            }
        )
        got = (
            cube_aggregate(_ds(df, 5), ["a", "b"], "v")
            .to_pandas()
            .sort_values(["a", "b", "lvl"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.sql(
            """
            SELECT CASE WHEN grouping(a)=1 THEN '(all)' ELSE a END AS a,
                   CASE WHEN grouping(b)=1 THEN '(all)' ELSE b END AS b,
                   CAST(2 - grouping(a) - grouping(b) AS BIGINT) AS lvl,
                   CAST(sum(v) AS BIGINT) AS total
            FROM t GROUP BY CUBE(a, b)
            ORDER BY a, b, lvl
            """
        ).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestGroupedMode:
    def test_tie_break_lexicographic(self):
        df = pd.DataFrame(
            {"g": [1, 1, 1, 1, 2], "v": ["b", "b", "a", "a", "z"]}
        )
        schema = pa.schema(
            [("g", pa.int64()), ("v", pa.string()), ("cnt", pa.int64())]
        )
        out = (
            grouped_mode(_ds(df, 4), ["g"], "v", out_schema=schema)
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        # group 1: a and b tie at 2 -> 'a' wins
        assert list(out["g"]) == [1, 2]
        assert list(out["v"]) == ["a", "z"]
        assert list(out["cnt"]) == [2, 1]

    def test_nulls_ignored(self):
        df = pd.DataFrame({"g": [1, 1, 1, 2], "v": ["a", None, None, None]})
        schema = pa.schema(
            [("g", pa.int64()), ("v", pa.string()), ("cnt", pa.int64())]
        )
        out = grouped_mode(_ds(df), ["g"], "v", out_schema=schema).to_pandas()
        # group 2 (all-null) dropped; nulls in group 1 not counted
        assert len(out) == 1
        assert out.iloc[0]["g"] == 1 and out.iloc[0]["v"] == "a"
        assert out.iloc[0]["cnt"] == 1
