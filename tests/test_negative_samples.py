"""Deterministic bipartite negative sampling: no true edge sampled,
layout independence, per-left cap, collision keeps smallest j."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.training import (
    _NEG_A,
    _NEG_C,
    bipartite_negative_samples,
)


def _edges(rng, n_left, r_max, per):
    rows = []
    for l in range(1, n_left + 1):
        for r in rng.choice(np.arange(1, r_max + 1), size=per, replace=False):
            rows.append((l, int(r)))
    return pd.DataFrame(rows, columns=["l", "r"])


class TestNegativeSamples:
    def test_never_a_true_edge_and_formula_pinned(self):
        rng = np.random.RandomState(61)
        df = _edges(rng, 20, 500, 5)
        out = bipartite_negative_samples(
            ray.data.from_pandas(df), l_col="l", r_col="r",
            r_max=500, per_left=3, m_candidates=8,
        ).to_pandas()
        true = set(zip(df["l"], df["r"]))
        for l, r, j in out.itertuples(index=False):
            assert (l, r) not in true
            assert r == 1 + (_NEG_A * l + _NEG_C * j) % 500

    def test_layout_independent(self):
        rng = np.random.RandomState(62)
        df = _edges(rng, 15, 300, 4)
        outs = []
        for parts, nb in ((1, None), (5, 3)):
            outs.append(
                bipartite_negative_samples(
                    ray.data.from_pandas(df).repartition(parts),
                    l_col="l", r_col="r", r_max=300,
                    per_left=2, m_candidates=6, num_buckets=nb,
                )
                .to_pandas().sort_values(["lkey", "j"])
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_per_left_cap_and_j_prefix(self):
        # left key with NO true edges gets exactly per_left negatives,
        # and they are the smallest-j distinct candidates
        df = pd.DataFrame({"l": [1], "r": [10 ** 6]})  # r outside universe
        out = bipartite_negative_samples(
            ray.data.from_pandas(df), l_col="l", r_col="r",
            r_max=97, per_left=3, m_candidates=8,
        ).to_pandas().sort_values("j")
        assert len(out) == 3
        # j-prefix after (l, r) collision dedup keeps smallest j
        seen = {}
        for j in range(1, 9):
            r = 1 + (_NEG_A * 1 + _NEG_C * j) % 97
            seen.setdefault(r, j)
        want_j = sorted(seen.values())[:3]
        assert out["j"].tolist() == want_j
