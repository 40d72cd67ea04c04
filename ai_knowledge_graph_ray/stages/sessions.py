"""Stream-shaped operators over the events log.

Ray Data has no event-time windows; per the streaming guidance the
events table is treated as a partitioned log: partition by key, sort
by ts within the partition, window with vectorized pandas. Sessions
are the canonical example (gap-based windows cannot be expressed as a
tumbling groupby).

:func:`sessionize` — per-user session assignment with an inactivity
gap: one bucket shuffle (hash(user) % B), vectorized within-bucket
sort + lag-diff + cumulative-sum labeling. The SQL oracle is the
standard ``lag() OVER (PARTITION BY user ORDER BY ts)`` window — see
``pipelines/queries.py``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce

SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_id", pa.int64()),
        ("n_events", pa.int64()),
    ]
)


LAG_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("prev_event_id", pa.int64()),
        ("gap_us", pa.int64()),
    ]
)


def lag_join(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """As-of self-join: attach each event's most recent PRIOR event in
    the same key partition — the lag/as-of pattern Ray Data has no
    native operator for. One bucket shuffle on the key, vectorized
    sort + shift within the bucket (``pd.merge_asof`` drops into the
    same slot for two-table as-of joins). Deterministic tie-break
    ``(ts, event_id)``. ``prev_event_id = -1`` for the first event.
    Gap reported in exact integer MICROSECONDS (DuckDB's
    ``date_diff('second', ...)`` counts boundary crossings, not the
    floored delta — microseconds are exact on both sides).
    """

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values([user_col, ts_col, id_col], kind="stable")
        prev_id = b.groupby(user_col, sort=False)[id_col].shift(1)
        prev_ts = b.groupby(user_col, sort=False)[ts_col].shift(1)
        gap = (b[ts_col] - prev_ts).dt.total_seconds() * 1_000_000
        return pd.DataFrame(
            {
                "event_id": b[id_col].astype("int64"),
                "prev_event_id": prev_id.fillna(-1).astype("int64"),
                "gap_us": gap.round().fillna(-1).astype("int64"),
            }
        )

    return bucketed_reduce(
        events.select_columns([user_col, ts_col, id_col]),
        [user_col],
        _reduce,
        LAG_SCHEMA,
    )


def sessionize(
    events: ray.data.Dataset,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """``(user_id, session_id, n_events)`` — session_id is 1-based per
    user in timestamp order; a gap > ``gap_minutes`` starts a session.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values([user_col, ts_col], kind="stable")
        prev_ts = b.groupby(user_col, sort=False)[ts_col].shift(1)
        new_session = (b[ts_col] - prev_ts > gap) | prev_ts.isna()
        b = b.assign(session_id=new_session.groupby(b[user_col], sort=False).cumsum().astype("int64"))
        out = (
            b.groupby([user_col, "session_id"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n_events"})
        )
        return out[["user_id", "session_id", "n_events"]].astype(
            {"user_id": "int64", "session_id": "int64", "n_events": "int64"}
        )

    return bucketed_reduce(
        events.select_columns([user_col, ts_col]),
        [user_col],
        _reduce,
        SESSION_SCHEMA,
    )
