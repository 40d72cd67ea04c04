"""End-to-end corpus-curation chain: funnel monotonicity, dedup and
gate behavior on planted rows, deterministic manifest."""

from __future__ import annotations

import pandas as pd
import ray.data

from ai_knowledge_graph_ray.pipelines.curation import curate_corpus

GOOD = (
    "the industrial revolution transformed manufacturing transport and "
    "agriculture across europe introducing steam power mechanized looms "
    "railway networks and new forms of urban labor organization over decades"
)


def _docs():
    rows = []
    for i in range(40):
        rows.append(
            {"doc_id": i, "source": "web", "text": f"{GOOD} variant {i}"}
        )
    # exact duplicates of doc 0 (post-NFC) — dedup keeps doc 0
    rows.append({"doc_id": 100, "source": "web", "text": f"{GOOD} variant 0"})
    # decomposed-unicode duplicate of a composed doc
    rows.append({"doc_id": 101, "source": "web", "text": "café " + GOOD})
    rows.append({"doc_id": 102, "source": "web", "text": "café " + GOOD})
    # too short -> gopher-gated
    rows.append({"doc_id": 103, "source": "web", "text": "too short"})
    # dropped source (rate 0)
    rows.append({"doc_id": 104, "source": "junk", "text": f"{GOOD} junk copy"})
    return pd.DataFrame(rows)


class TestCuration:
    def test_funnel_and_semantics(self):
        ds = ray.data.from_pandas(_docs()).repartition(3)
        manifest, report = curate_corpus(
            ds,
            rates_milli={"web": 1000, "junk": 0},
            default_milli=0,
            shard_budget=200,
            with_report=True,
        )
        out = manifest.to_pandas().sort_values("doc_id").reset_index(drop=True)
        ids = set(out["doc_id"])
        assert 100 not in ids  # exact dup of doc 0
        assert 101 in ids and 102 not in ids  # NFC-collapsed dup, min id kept
        assert 103 not in ids  # quality-gated
        assert 104 not in ids  # mixture rate 0
        assert 0 in ids
        # funnel monotone and consistent with the manifest
        assert (
            report["input"]
            >= report["after_dedup"]
            >= report["after_quality"]
            >= report["after_mixture"]
            == len(out)
        )
        # shards are contiguous 0..max and budget-bounded from below
        assert out["shard_id"].min() == 0
        per = out.groupby("shard_id")["n_tokens"].sum()
        assert (per.iloc[:-1] >= 1).all()

    def test_deterministic_across_layouts(self):
        outs = []
        for blocks in (1, 5):
            ds = ray.data.from_pandas(_docs()).repartition(blocks)
            outs.append(
                curate_corpus(
                    ds, rates_milli={"web": 1000, "junk": 0}, default_milli=0,
                    shard_budget=200,
                )
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
        assert outs[0].equals(outs[1])
