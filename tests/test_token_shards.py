"""Tokenized shard materialization: id-encoding correctness, byte
roundtrip of written shards, whole-doc packing semantics."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.packing import write_token_shards
from ai_knowledge_graph_ray.stages.vocab import encode_token_ids, vocab_build


def _docs() -> pd.DataFrame:
    rows = []
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rng = np.random.RandomState(2)
    for i in range(40):
        n = rng.randint(3, 30)
        rows.append(
            {"doc_id": i, "text": " ".join(rng.choice(words, n))}
        )
    return pd.DataFrame(rows)


class TestEncodeTokenIds:
    def test_ids_match_vocab(self):
        df = _docs()
        ds = ray.data.from_pandas(df).repartition(3)
        vocab = vocab_build(ds, min_count=1)
        vdf = vocab.to_pandas()
        vmap = dict(zip(vdf["token"], vdf["vocab_id"]))
        out = encode_token_ids(ds, vocab).to_pandas().set_index("doc_id")
        for r in df.itertuples():
            ids = np.frombuffer(out.loc[r.doc_id, "ids_bin"], dtype=np.uint32)
            toks = r.text.lower().split()
            assert out.loc[r.doc_id, "n_tokens"] == len(toks)
            assert list(ids) == [vmap[t] for t in toks]

    def test_oov_encodes_zero(self):
        train = ray.data.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "text": ["aa bb aa", "bb cc bb"]})
        )
        vocab = vocab_build(train, min_count=2)  # only aa, bb survive
        test = ray.data.from_pandas(
            pd.DataFrame({"doc_id": [9], "text": ["aa zz bb"]})
        )
        out = encode_token_ids(test, vocab).to_pandas()
        ids = np.frombuffer(out.iloc[0]["ids_bin"], dtype=np.uint32)
        assert 0 in ids  # zz -> <unk>
        assert (ids == 0).sum() == 1


class TestWriteTokenShards:
    def test_roundtrip_and_manifest(self, tmp_path):
        df = _docs()
        ds = ray.data.from_pandas(df).repartition(4)
        vocab = vocab_build(ds, min_count=1)
        ids = encode_token_ids(ds, vocab).materialize()
        out_dir = str(tmp_path / "shards")
        manifest = (
            write_token_shards(ids, out_dir, budget=100, range_size=8)
            .to_pandas()
            .sort_values("shard_id")
            .reset_index(drop=True)
        )
        # every doc accounted for exactly once
        idf = ids.to_pandas().sort_values("doc_id")
        assert manifest["n_docs"].sum() == len(idf)
        assert manifest["n_tokens"].sum() == idf["n_tokens"].sum()
        # byte-level roundtrip: global concat in doc order == all shards
        # concatenated in shard order (docs whole, placed where they start)
        want = b"".join(bytes(x) for x in idf["ids_bin"])
        got = b""
        for p in sorted(glob.glob(os.path.join(out_dir, "*.bin"))):
            with open(p, "rb") as f:
                got += f.read()
        assert got == want
        # shard boundaries follow the exclusive prefix sum // budget
        excl = np.cumsum(idf["n_tokens"].to_numpy()) - idf["n_tokens"].to_numpy()
        want_shards = sorted(set(excl // 100))
        assert list(manifest["shard_id"]) == want_shards
