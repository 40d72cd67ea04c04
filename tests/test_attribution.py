"""Multi-touch linear attribution: exact cents splitting (share +
remainder-to-last-touch), window and user boundaries, direct row."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ai_knowledge_graph_ray.stages.sessions import linear_attribution

H = 3600 * 1_000_000  # 1h in us


def _ev(eid, ts_us, user, etype, value):
    return {
        "event_id": eid,
        "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(microseconds=ts_us),
        "user_id": user,
        "event_type": etype,
        "value": value,
    }


class TestLinearAttribution:
    def _fixture(self) -> pd.DataFrame:
        rows = [
            # user 1: two touches then a 1.00 purchase -> 50/50, no rem
            _ev(1, 0 * H, 1, "view", 9.99),
            _ev(2, 1 * H, 1, "click", 9.99),
            _ev(3, 2 * H, 1, "purchase", 1.00),
            # user 1: three touches then a 1.00 purchase -> 33+33+34
            # (remainder 1 to the LAST touch = event 6, a click)
            _ev(4, 10 * H, 1, "view", 9.99),
            _ev(5, 11 * H, 1, "view", 9.99),
            _ev(6, 12 * H, 1, "click", 9.99),
            _ev(7, 13 * H, 1, "purchase", 1.00),
            # user 2's touch must NOT attribute to user 1's purchase
            _ev(8, 2 * H - 1, 2, "click", 9.99),
            # user 2: purchase with no touches in window -> direct
            _ev(9, 50 * H, 2, "purchase", 2.50),
            # touch outside the 6h window -> ignored
            _ev(10, 40 * H, 2, "view", 9.99),
        ]
        return pd.DataFrame(rows)

    def test_exact_split_and_direct(self):
        ds = ray.data.from_pandas(self._fixture()).repartition(3)
        out = (
            linear_attribution(ds, window_us=6 * H)
            .to_pandas().set_index("event_type").sort_index()
        )
        # user1 p1: view 50, click 50; p2: view 33+33, click 33+1(rem)
        assert int(out.loc["view", "attributed_cents"]) == 50 + 66
        assert int(out.loc["click", "attributed_cents"]) == 50 + 34
        assert int(out.loc["direct", "attributed_cents"]) == 250
        assert int(out.loc["view", "n_touches"]) == 3
        assert int(out.loc["click", "n_touches"]) == 2
        assert int(out.loc["direct", "n_touches"]) == 1
        # conservation: attributed == total purchase cents
        assert int(out["attributed_cents"].sum()) == 100 + 100 + 250

    def test_layout_invariant(self):
        df = self._fixture()
        a = (
            linear_attribution(ray.data.from_pandas(df), window_us=6 * H)
            .to_pandas().sort_values("event_type").reset_index(drop=True)
        )
        b = (
            linear_attribution(
                ray.data.from_pandas(df).repartition(7), window_us=6 * H,
                num_buckets=3,
            )
            .to_pandas().sort_values("event_type").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
