"""Two-table as-of join and interval (range) count join semantics.

Both operators are bucketed-shuffle compositions (Ray Data has no
native as-of or range join); these tests pin their semantics against
driver-side pandas ground truth on real sf tables plus synthetic
edge fixtures (ties, no-match rows, bin-boundary intervals).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.relational import interval_count_join
from ai_knowledge_graph_ray.stages.sessions import asof_join


def _asof_truth(ev: pd.DataFrame, right: pd.DataFrame) -> dict[int, int]:
    out = {}
    for _, l in ev.iterrows():
        cand = right[(right["user_id"] == l["user_id"]) & (right["ts"] <= l["ts"])]
        if len(cand) == 0:
            out[l["event_id"]] = -1
        else:
            cand = cand.sort_values(["ts", "event_id"], kind="stable")
            out[l["event_id"]] = int(cand.iloc[-1]["event_id"])
    return out


def test_asof_join_vs_pandas(sf_dir):
    cols = ["event_id", "ts", "user_id", "event_type"]
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
    import pyarrow.compute as pc

    right = ev.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "purchase")),
        batch_format="pyarrow",
    )
    got = {r["event_id"]: r["matched_id"] for r in asof_join(ev, right).take_all()}

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
    # cap the quadratic driver truth: first 30 users only
    keep = sorted(pdf["user_id"].unique())[:30]
    sub = pdf[pdf["user_id"].isin(keep)]
    truth = _asof_truth(sub, sub[sub["event_type"] == "purchase"])
    assert len(got) == len(pdf)
    for eid, want in truth.items():
        assert got[eid] == want, (eid, got[eid], want)


def test_asof_join_tie_breaks_on_greatest_id():
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00"] * 3 + ["2024-01-01 00:00:05"], utc=False
    )
    left = ray.data.from_pandas(
        pd.DataFrame({"event_id": [100], "ts": [ts[3]], "user_id": [1]})
    )
    # three right rows at the SAME timestamp: greatest event_id wins
    right = ray.data.from_pandas(
        pd.DataFrame({"event_id": [7, 9, 8], "ts": ts[:3], "user_id": [1, 1, 1]})
    )
    rows = asof_join(left, right).take_all()
    assert rows == [{"event_id": 100, "matched_id": 9}]


def test_asof_join_no_match_is_minus_one():
    t = pd.to_datetime(["2024-01-01", "2024-01-02"])
    left = ray.data.from_pandas(
        pd.DataFrame({"event_id": [1, 2], "ts": t, "user_id": [5, 5]})
    )
    # right exists only AFTER left's first row, and only for user 5
    right = ray.data.from_pandas(
        pd.DataFrame({"event_id": [50], "ts": [t[1]], "user_id": [5]})
    )
    got = {r["event_id"]: r["matched_id"] for r in asof_join(left, right).take_all()}
    assert got == {1: -1, 2: 50}


def _interval_truth(vals: pd.Series, iv: pd.DataFrame) -> dict[int, int]:
    out = {}
    for _, r in iv.iterrows():
        n = int(((vals >= r["lo"]) & (vals <= r["hi"])).sum())
        if n:
            out[int(r["rid"])] = n
    return out


def test_interval_count_join_vs_pandas(sf_dir):
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_shipdate"])
    iv = pd.DataFrame(
        {
            "rid": orders["o_orderkey"].astype("int64"),
            "lo": pd.to_datetime(orders["o_orderdate"]),
            "hi": pd.to_datetime(orders["o_orderdate"]) + pd.Timedelta(days=7),
        }
    )
    truth = _interval_truth(pd.to_datetime(li["l_shipdate"]), iv)

    got_ds = interval_count_join(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_shipdate"]),
        ray.data.from_pandas(iv),
        left_val="l_shipdate",
        right_id="rid",
        right_lo="lo",
        right_hi="hi",
        bin_width_us=7 * 24 * 3600 * 1_000_000,
    )
    got = {r["rid"]: r["n"] for r in got_ds.take_all()}
    assert got == truth


def test_interval_count_join_bin_edges():
    # intervals exactly on bin boundaries, spanning 1 and 3 bins, and a
    # zero-match interval (must be absent from the output)
    base = pd.Timestamp("2024-01-01")
    day = pd.Timedelta(days=1)
    vals = pd.DataFrame({"v": [base, base + day, base + 2 * day, base + 10 * day]})
    iv = pd.DataFrame(
        {
            "rid": [1, 2, 3],
            "lo": [base, base, base + 20 * day],
            "hi": [base, base + 2 * day, base + 21 * day],
        }
    )
    got_ds = interval_count_join(
        ray.data.from_pandas(vals),
        ray.data.from_pandas(iv),
        left_val="v",
        right_id="rid",
        right_lo="lo",
        right_hi="hi",
        bin_width_us=24 * 3600 * 1_000_000,  # bin == one day
    )
    got = {r["rid"]: r["n"] for r in got_ds.take_all()}
    assert got == {1: 1, 2: 3}

    truth = _interval_truth(vals["v"], iv)
    assert got == truth
