"""Leave-one-out target encoding: planted fixture, both gate paths
bit-equal, singleton keys."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.relational import target_encode_loo

SCHEMA = pa.schema(
    [("id", pa.int64()), ("k", pa.string()), ("t", pa.int64()),
     ("loo_sum", pa.int64()), ("loo_cnt", pa.int64())]
)


def _ds(df: pd.DataFrame, parts: int = 3) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


def _fixture() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "id": [0, 1, 2, 3, 4],
            "k": ["a", "a", "a", "b", "c"],
            "t": [10, 20, 30, 7, 5],
        }
    )


class TestTargetEncodeLoo:
    def test_loo_values(self):
        out = (
            target_encode_loo(_ds(_fixture(), 4), "k", "t", SCHEMA)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert list(out["loo_sum"]) == [50, 40, 30, 0, 0]
        assert list(out["loo_cnt"]) == [2, 2, 2, 0, 0]

    def test_gate_paths_bit_equal(self):
        a = (
            target_encode_loo(_ds(_fixture(), 4), "k", "t", SCHEMA)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        b = (
            target_encode_loo(
                _ds(_fixture(), 4), "k", "t", SCHEMA, driver_max_keys=0
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a[SCHEMA.names], b[SCHEMA.names])
