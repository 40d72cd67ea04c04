"""Expectations report: planted violations per check kind, empty
input, and fk orphan multiplicity."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.validate import expectations_report


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


def _by_id(rep) -> dict:
    df = rep.to_pandas()
    return {r["check_id"]: r for _, r in df.iterrows()}


class TestRowLocal:
    def test_planted_violations(self):
        df = pd.DataFrame(
            {
                "a": [1, None, 3, None, 5],
                "b": [10, 20, 999, -5, 30],
                "c": ["x", "y", "z", "x", None],
                "d": ["1-A", "2-B", "oops", None, "9-Z"],
            }
        )
        rep = _by_id(
            expectations_report(
                _ds(df),
                [
                    {"id": "a_nn", "kind": "not_null", "col": "a"},
                    {"id": "b_rng", "kind": "range", "col": "b", "lo": 0, "hi": 100},
                    {"id": "c_set", "kind": "in_set", "col": "c", "values": ["x", "y"]},
                    {"id": "d_re", "kind": "regex", "col": "d",
                     "pattern": r"[1-5]-[A-Z]"},
                ],
            )
        )
        assert rep["a_nn"]["n_violating"] == 2 and not rep["a_nn"]["ok"]
        assert rep["b_rng"]["n_violating"] == 2  # 999 and -5
        assert rep["c_set"]["n_violating"] == 1  # "z"; null passes
        # "oops" fails; null passes; "9-Z" fails ([1-5] only)
        assert rep["d_re"]["n_violating"] == 2
        assert all(rep[k]["n_rows"] == 5 for k in rep)

    def test_all_pass(self):
        df = pd.DataFrame({"a": [1, 2, 3]})
        rep = _by_id(
            expectations_report(_ds(df), [{"id": "a", "kind": "not_null", "col": "a"}])
        )
        assert rep["a"]["ok"] and rep["a"]["n_violating"] == 0

    def test_empty_input(self):
        df = pd.DataFrame({"a": pd.Series([], dtype="float64")})
        rep = _by_id(
            expectations_report(
                ray.data.from_pandas(df),
                [{"id": "a", "kind": "not_null", "col": "a"},
                 {"id": "u", "kind": "unique", "cols": ["a"]}],
            )
        )
        assert rep["a"]["n_rows"] == 0 and rep["a"]["ok"]
        assert rep["u"]["n_rows"] == 0 and rep["u"]["ok"]


class TestUnique:
    def test_duplicates_counted_in_excess(self):
        df = pd.DataFrame({"k": [1, 1, 1, 2, 3, 3]})
        rep = _by_id(
            expectations_report(_ds(df, 4), [{"id": "u", "kind": "unique", "cols": ["k"]}])
        )
        # 6 rows, 3 distinct -> 3 in excess
        assert rep["u"]["n_rows"] == 6
        assert rep["u"]["n_violating"] == 3

    def test_multi_col_key(self):
        df = pd.DataFrame({"k": [1, 1, 2], "j": ["a", "a", "b"]})
        rep = _by_id(
            expectations_report(
                _ds(df), [{"id": "u", "kind": "unique", "cols": ["k", "j"]}]
            )
        )
        assert rep["u"]["n_violating"] == 1


class TestFk:
    def test_orphans_counted_with_multiplicity(self):
        child = pd.DataFrame({"fk": [1, 1, 2, 9, 9, 9]})
        parent = pd.DataFrame({"pk": [1, 2, 3]})
        rep = _by_id(
            expectations_report(
                _ds(child, 4),
                [{"id": "fk", "kind": "fk", "col": "fk",
                  "ref": _ds(parent, 2), "ref_col": "pk"}],
            )
        )
        assert rep["fk"]["n_rows"] == 6
        assert rep["fk"]["n_violating"] == 3  # the three 9s
        assert not rep["fk"]["ok"]

    def test_dtype_skew_child_int32(self):
        child = pd.DataFrame({"fk": pd.array([1, 2], dtype="int32")})
        parent = pd.DataFrame({"pk": pd.array([1, 2], dtype="int64")})
        rep = _by_id(
            expectations_report(
                _ds(child, 1),
                [{"id": "fk", "kind": "fk", "col": "fk",
                  "ref": _ds(parent, 1), "ref_col": "pk"}],
            )
        )
        assert rep["fk"]["n_violating"] == 0
