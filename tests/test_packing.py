"""Token-budget shard packing: known assignments, pandas-scan
equivalence under forced multi-range + forced coarsening, stats."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.packing import pack_shards, shard_stats


def _pandas_pack(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    d = df.sort_values("doc_id", kind="stable").reset_index(drop=True)
    excl = d["n_tokens"].cumsum() - d["n_tokens"]
    return pd.DataFrame(
        {
            "doc_id": d["doc_id"],
            "n_tokens": d["n_tokens"],
            "shard_id": (excl // budget).astype("int64"),
        }
    )


def _sorted(out: ray.data.Dataset) -> pd.DataFrame:
    return out.to_pandas().sort_values("doc_id", kind="stable").reset_index(drop=True)


class TestPackShards:
    def test_known_assignment(self):
        df = pd.DataFrame(
            {"doc_id": [1, 2, 3, 4, 5, 6], "n_tokens": [3, 4, 2, 5, 1, 2]}
        )
        out = _sorted(pack_shards(ray.data.from_pandas(df), budget=5))
        # exclusive cumsums 0,3,7,9,14,15 -> //5 -> 0,0,1,1,2,3
        assert list(out["shard_id"]) == [0, 0, 1, 1, 2, 3]

    def test_equivalence_multi_range(self):
        rng = np.random.RandomState(7)
        ids = np.sort(rng.choice(100_000, size=2_000, replace=False)).astype("int64")
        df = pd.DataFrame(
            {"doc_id": ids, "n_tokens": rng.randint(0, 900, size=2_000).astype("int64")}
        )
        out = _sorted(
            pack_shards(
                ray.data.from_pandas(df).repartition(13),
                budget=4096,
                range_size=64,  # ~1500 non-empty ranges
            )
        )
        pd.testing.assert_frame_equal(out, _pandas_pack(df, 4096))

    def test_forced_coarsening(self):
        rng = np.random.RandomState(11)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(500, dtype="int64") * 3 + 17,
                "n_tokens": rng.randint(0, 50, size=500).astype("int64"),
            }
        )
        out = _sorted(
            pack_shards(
                ray.data.from_pandas(df).repartition(7),
                budget=100,
                range_size=1,  # 500 ranges ...
                driver_max_ranges=8,  # ... forced down through ~6 halvings
            )
        )
        pd.testing.assert_frame_equal(out, _pandas_pack(df, 100))

    def test_zero_token_docs_share_boundary(self):
        df = pd.DataFrame({"doc_id": [0, 1, 2], "n_tokens": [10, 0, 1]})
        out = _sorted(pack_shards(ray.data.from_pandas(df), budget=10))
        # doc 1 has exclusive sum 10 -> shard 1 even with zero tokens
        assert list(out["shard_id"]) == [0, 1, 1]

    def test_empty(self):
        empty = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "n_tokens": pa.array([], pa.int64())})
        )
        assert pack_shards(empty, budget=10).count() == 0

    def test_shard_stats(self):
        df = pd.DataFrame(
            {"doc_id": np.arange(40, dtype="int64"), "n_tokens": [7] * 40}
        )
        packed = pack_shards(ray.data.from_pandas(df).repartition(5), budget=21)
        stats = (
            shard_stats(packed)
            .to_pandas()
            .sort_values("shard_id")
            .reset_index(drop=True)
        )
        assert stats["n_docs"].sum() == 40
        assert stats["tokens"].sum() == 280
        # budget 21 / 7-token docs -> 3 docs per shard
        assert set(stats["n_docs"][:-1]) == {3}


class TestPackManifestOffsets:
    def test_offsets_match_window_twin(self):
        import numpy as np
        import pandas as pd
        import ray.data

        from ai_knowledge_graph_ray.stages.packing import pack_shards

        rng = np.random.RandomState(4)
        df = pd.DataFrame(
            {"doc_id": np.arange(200, dtype=np.int64),
             "n_tokens": rng.randint(1, 700, 200).astype(np.int64)}
        )
        got = (
            pack_shards(
                ray.data.from_pandas(df).repartition(5),
                budget=1000, with_offset=True, range_size=16,
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        excl = np.cumsum(df["n_tokens"].to_numpy()) - df["n_tokens"].to_numpy()
        assert (got["shard_id"].to_numpy() == excl // 1000).all()
        assert (got["offset"].to_numpy() == excl % 1000).all()
        # straddling rows exist in this fixture (offset + tokens > budget)
        assert ((got["offset"] + got["n_tokens"]) > 1000).any()
