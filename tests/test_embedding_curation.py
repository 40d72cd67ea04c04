"""Embedding-curation composite: planted near-dups removed before PQ
encoding, codes are m bytes, survivors keep their ids."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.pipelines.curation import curate_embeddings


class TestEmbeddingCuration:
    def test_dups_removed_and_codes_compact(self):
        # diverse vocabulary so only PLANTED copies exceed the cosine
        # threshold — a tiny vocab makes every random doc a near-dup
        words = [f"w{i:03d}" for i in range(80)]
        rng = np.random.RandomState(3)
        rows = []
        for i in range(24):
            text = " ".join(rng.choice(words, 15, replace=False))
            rows.append({"doc_id": i, "text": text})
        # planted exact-text duplicates -> identical hash embeddings
        rows.append({"doc_id": 100, "text": rows[0]["text"]})
        rows.append({"doc_id": 101, "text": rows[1]["text"]})
        docs = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
        codes = curate_embeddings(
            docs, dim=64, k_clusters=4, pq_m=8, pq_k=8
        ).to_pandas()
        ids = set(codes["vec_id"])
        # the planted copies dedup against their originals (min id kept)
        assert 100 not in ids and 101 not in ids
        assert 0 in ids and 1 in ids
        assert len(ids) == 24
        assert all(len(c) == 8 for c in codes["code"])
