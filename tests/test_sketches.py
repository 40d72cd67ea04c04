"""HyperLogLog sketch: accuracy vs exact distinct, mergeability."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.sketches import (
    _estimate,
    _registers,
    hll_distinct,
)


def test_register_merge_equals_combined():
    a = _registers(np.arange(1000), p=10)
    b = _registers(np.arange(500, 1500), p=10)
    combined = _registers(np.arange(1500), p=10)
    assert (np.maximum(a, b) == combined).all()


def test_estimate_accuracy():
    for n in [100, 1000, 20000]:
        est = _estimate(_registers(np.arange(n), p=10))
        assert abs(est - n) / n < 0.12, (n, est)


def test_hll_distinct_global(sf_dir):
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    exact = len(set(r["user_id"] for r in ev.take_all()))
    approx = hll_distinct(ev, "user_id").take_all()[0]["approx_distinct"]
    assert abs(approx - exact) / exact < 0.12, (exact, approx)


def test_hll_distinct_grouped(sf_dir):
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    import pandas as pd

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    exact = pdf.groupby("event_type")["user_id"].nunique().to_dict()
    rows = hll_distinct(ev, "user_id", ["event_type"]).take_all()
    assert len(rows) == len(exact)
    for r in rows:
        ex = exact[r["event_type"]]
        assert abs(r["approx_distinct"] - ex) / ex < 0.15, (r, ex)


def test_lag_join_semantics(sf_dir):
    from ai_knowledge_graph_ray.stages.sessions import lag_join

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    rows = {r["event_id"]: r for r in lag_join(ev).take_all()}
    import pandas as pd

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    pdf = pdf.sort_values(["user_id", "ts", "event_id"], kind="stable")
    prev = pdf.groupby("user_id")["event_id"].shift(1).fillna(-1).astype(int)
    for eid, p in zip(pdf["event_id"], prev):
        assert rows[eid]["prev_event_id"] == p
    firsts = pdf.groupby("user_id").head(1)["event_id"]
    assert all(rows[e]["gap_us"] == -1 for e in firsts)


class TestCmsHeavyHitters:
    def _corpus(self):
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(0)
        vals = [f"hot{i}" for i in range(5) for _ in range(1000 - i * 100)]
        vals += [f"cold{rng.randint(5000)}" for _ in range(8000)]
        rng.shuffle(vals)
        return pd.DataFrame({"v": vals})

    def test_topk_and_overestimate_bound(self):
        import pandas as pd

        from ai_knowledge_graph_ray.stages.sketches import cms_heavy_hitters

        df = self._corpus()
        ds = ray.data.from_pandas(df).repartition(8)
        out = cms_heavy_hitters(ds, "v", k=5).to_pandas()
        true = df["v"].value_counts()
        # exact top-5 recovered in order; CMS never undercounts and the
        # overestimate stays within e*N/width per row (generous 2x)
        assert out["value"].tolist() == [f"hot{i}" for i in range(5)]
        for v, est in zip(out["value"], out["est_count"]):
            assert est >= true[v]
            assert est - true[v] <= 2 * 2.72 * len(df) / 2048

    def test_layout_independent_with_full_candidates(self):
        from ai_knowledge_graph_ray.stages.sketches import cms_heavy_hitters

        df = self._corpus()
        outs = []
        for blocks in (1, 8):
            ds = ray.data.from_pandas(df).repartition(blocks)
            outs.append(
                cms_heavy_hitters(
                    ds, "v", k=50, candidates_per_block=10**6
                ).to_pandas()
            )
        # cell sums commute; with the candidate union saturated the
        # whole output is layout-independent
        assert outs[0].equals(outs[1])

    def test_empty(self):
        from ai_knowledge_graph_ray.stages.sketches import cms_heavy_hitters

        ds = ray.data.from_items([{"v": "x"}]).filter(lambda r: False)
        assert cms_heavy_hitters(ds, "v").count() == 0
