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
