"""Simplified Soundex: known vectors, dialect parity vs DuckDB
(the oracle expression is rendered from the same step list), stage
plumbing."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.fuzzy import (
    soundex_codes,
    soundex_series,
    soundex_sql_expr,
)


class TestSoundexKernel:
    def test_known_vectors(self):
        got = list(
            soundex_series(
                pd.Series(["Robert", "Rupert", "Smith", "Smyth", "Tymczak"])
            )
        )
        assert got == ["R163", "R163", "S530", "S530", "T522"]

    def test_phonetic_variants_collide(self):
        a, b = soundex_series(pd.Series(["Ashcraft", "Ashcroft"]))
        assert a == b

    def test_degenerate_inputs(self):
        got = list(soundex_series(pd.Series(["", "123", None, "A"])))
        assert got == ["", "", "", "A000"]

    def test_dialect_parity_vs_duckdb(self):
        names = pd.DataFrame(
            {
                "nm": [
                    "Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister",
                    "Honeyman", "cold widget", "large bolt", "", "42",
                    "O'Brien", "van der Berg", "Jackson", "AAAA", "bbbb",
                ]
            }
        )
        py = list(soundex_series(names["nm"]))
        sql = duckdb.sql(
            f"SELECT {soundex_sql_expr('nm')} AS s FROM names"
        ).df()["s"]
        assert py == list(sql)


class TestSoundexStage:
    def test_codes_stage(self):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "pid": pa.array([1, 2, 3], pa.int64()),
                    "nm": pa.array(["Smith", "Smyth", "Jones"], pa.string()),
                }
            )
        )
        out = soundex_codes(ds, "nm", "pid").to_pandas().sort_values("pid")
        assert list(out["soundex"])[:2] == ["S530", "S530"]
        assert out["soundex"].iloc[2] != "S530"
