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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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


RUNNING_SUM_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("cum", pa.int64()),
    ]
)


def running_sum(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "val",
) -> ray.data.Dataset:
    """Per-key running total — ``SUM(val) OVER (PARTITION BY key ORDER
    BY ts, id)`` — over an INTEGER value column (callers integerize
    floats upstream so the sum is exact and order-independent to
    verify). One bucket shuffle on ``key``; within a bucket one
    vectorized sort + ``groupby(key).cumsum()`` covers every key in
    the bucket. Output: ``(event_id, cum)``, one row per input row.
    """
    from .infer import bucketed_reduce

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([key_col, ts_col, id_col], kind="stable")
        return pd.DataFrame(
            {
                "event_id": s[id_col].astype("int64"),
                "cum": s.groupby(key_col, sort=False)[val_col]
                .cumsum()
                .astype("int64"),
            }
        )

    return bucketed_reduce(
        ds.select_columns([key_col, ts_col, id_col, val_col]),
        [key_col],
        _reduce,
        RUNNING_SUM_SCHEMA,
    )


ROLLING_SUM_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("win_sum", pa.int64()),
    ]
)


def rolling_sum(
    ds: ray.data.Dataset,
    *,
    window: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "val",
) -> ray.data.Dataset:
    """Per-key rolling sum over the last ``window`` rows (inclusive) —
    ``SUM(val) OVER (PARTITION BY key ORDER BY ts, id ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)`` — over an INTEGER value
    column. Same one-bucket-shuffle shape as :func:`running_sum`; the
    rolling window is cumsum minus its per-key ``shift(window)``
    (both C-level grouped kernels), never a Python loop.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    from .infer import bucketed_reduce

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([key_col, ts_col, id_col], kind="stable")
        cum = s.groupby(key_col, sort=False)[val_col].cumsum()
        lag = cum.groupby(s[key_col], sort=False).shift(window).fillna(0)
        return pd.DataFrame(
            {
                "event_id": s[id_col].astype("int64"),
                "win_sum": (cum - lag).astype("int64"),
            }
        )

    return bucketed_reduce(
        ds.select_columns([key_col, ts_col, id_col, val_col]),
        [key_col],
        _reduce,
        ROLLING_SUM_SCHEMA,
    )


RANK_IN_GROUP_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("rnk", pa.int64()),
    ]
)


def rank_in_group(
    ds: ray.data.Dataset,
    *,
    group_col: str = "event_type",
    order_cols: list[str] | None = None,
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-group dense ordering rank — ``rank() OVER (PARTITION BY
    group ORDER BY order_cols)`` with SQL's tie semantics (equal keys
    share a rank; the next distinct key resumes at row position). Pass
    a tie-breaking final order column (e.g. the id) for a fully
    deterministic ordering when ranks must be unique. One bucket
    shuffle on the group; in-bucket work is one stable sort plus a
    grouped cumcount/duplicated scan — all C-level kernels.
    """
    order_cols = order_cols or [id_col]

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([group_col] + order_cols, kind="stable")
        pos = s.groupby(group_col, sort=False).cumcount() + 1
        # SQL rank(): rows tied on ALL order cols share the FIRST tied
        # row's position
        new_key = ~s.duplicated([group_col] + order_cols, keep="first")
        rnk = pos.where(new_key).groupby(s[group_col], sort=False).ffill()
        return pd.DataFrame(
            {
                "event_id": s[id_col].astype("int64"),
                "rnk": rnk.astype("int64"),
            }
        )

    from .infer import bucketed_reduce

    return bucketed_reduce(
        ds.select_columns(
            [group_col] + [c for c in order_cols if c != group_col]
            + ([id_col] if id_col not in order_cols else [])
        ),
        [group_col],
        _reduce,
        RANK_IN_GROUP_SCHEMA,
    )


ASOF_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("matched_id", pa.int64()),
    ]
)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """TWO-TABLE as-of join (Ray Data has no native operator): for
    each left row, the right row of the SAME key with the greatest
    ``ts <= left.ts`` (inclusive); ``matched_id = -1`` when none
    exists. Deterministic tie-break on equal right timestamps: the
    greatest ``id_col`` wins (the right side is sorted ``(key, ts,
    id)`` and ``pd.merge_asof`` takes the LAST qualifying row).

    Scale shape: both sides tagged and shuffled ONCE by ``key`` into
    the same buckets (left rows of a key always meet all right rows of
    that key); within each bucket a single vectorized
    ``pd.merge_asof(by=key)`` handles every key in the bucket at
    once. Output is one row per left row.
    """
    from .infer import bucketed_reduce

    def _tag(side: int):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": b[key_col].combine_chunks().cast(pa.int64()),
                    "ts": b[ts_col],
                    "id": b[id_col].combine_chunks().cast(pa.int64()),
                    "side": pa.array([side] * len(b), pa.int64()),
                }
            )

        return _f

    tagged = left.select_columns([key_col, ts_col, id_col]).map_batches(
        _tag(0), batch_format="pyarrow"
    ).union(
        right.select_columns([key_col, ts_col, id_col]).map_batches(
            _tag(1), batch_format="pyarrow"
        )
    )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0].sort_values(["ts", "id"], kind="stable")
        r = g[g["side"] == 1].sort_values(["ts", "id"], kind="stable")
        if len(l) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "matched_id": pd.Series(dtype="int64"),
                }
            )
        if len(r) == 0:
            return pd.DataFrame(
                {
                    "event_id": l["id"].astype("int64"),
                    "matched_id": np.full(len(l), -1, dtype=np.int64),
                }
            )
        m = pd.merge_asof(
            l,
            r.rename(columns={"id": "matched_id"})[["key", "ts", "matched_id"]],
            on="ts",
            by="key",
            direction="backward",
            allow_exact_matches=True,
        )
        return pd.DataFrame(
            {
                "event_id": m["id"].astype("int64"),
                "matched_id": m["matched_id"].fillna(-1).astype("int64"),
            }
        )

    return bucketed_reduce(tagged, ["key"], _reduce, ASOF_SCHEMA)


GAPFILL_SCHEMA = pa.schema([("bucket_start_us", pa.int64()), ("n_events", pa.int64())])


def gapfill_counts(
    ds: ray.data.Dataset,
    ts_col: str = "ts",
    *,
    bucket_us: int = 3_600_000_000,
    driver_max_buckets: int = 2_000_000,
) -> ray.data.Dataset:
    """Per-bucket event counts over the COMPLETE [min, max] time spine
    — empty buckets emit 0 (the date-spine / gap-fill shape dashboards
    and trainers expect; a plain groupby silently drops quiet hours).

    One grouped-count shuffle; the non-empty-bucket residue is
    count-gated: under the gate the driver reindexes against the full
    spine; over it a distributed ``ray.data.range`` spine left-joins
    the counts (forced-path equivalence in tests)."""
    from .relational import cogroup_join, grouped_sums

    def _bucket(b: pd.DataFrame) -> pd.DataFrame:
        us = b[ts_col].to_numpy("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "bucket_start_us": (us // bucket_us) * bucket_us,
                "one": np.ones(len(b), dtype=np.int64),
            }
        )

    counts = grouped_sums(
        ds.select_columns([ts_col]).map_batches(_bucket, batch_format="pandas"),
        ["bucket_start_us"],
        {"n_events": "one"},
    ).materialize()
    n_nonempty = counts.count()
    if n_nonempty == 0:
        return ray.data.from_arrow(GAPFILL_SCHEMA.empty_table())

    # min/max in one tiny pass over the (already small) counts table
    mm = counts.map_batches(
        lambda b: pd.DataFrame(
            {
                "lo": [int(b["bucket_start_us"].min())],
                "hi": [int(b["bucket_start_us"].max())],
            }
        ),
        batch_format="pandas",
    )
    lo = int(mm.min("lo"))
    hi = int(mm.max("hi"))
    n_buckets = (hi - lo) // bucket_us + 1

    if n_buckets <= driver_max_buckets:
        df = counts.to_pandas().set_index("bucket_start_us")["n_events"]
        spine = np.arange(lo, hi + bucket_us, bucket_us, dtype=np.int64)
        filled = df.reindex(spine, fill_value=0)
        return ray.data.from_arrow(
            pa.table(
                {
                    "bucket_start_us": pa.array(spine, pa.int64()),
                    "n_events": pa.array(filled.to_numpy(np.int64), pa.int64()),
                }
            )
        )

    # distributed spine: range -> bucket ids, left-join the counts
    spine = ray.data.range(n_buckets).map_batches(
        lambda b: pd.DataFrame(
            {"bucket_start_us": lo + b["id"].to_numpy(np.int64) * bucket_us}
        ),
        batch_format="pandas",
    )
    joined = cogroup_join(
        spine, counts, on=["bucket_start_us"], how="left_outer",
        left_schema=pa.schema([("bucket_start_us", pa.int64())]),
        right_schema=GAPFILL_SCHEMA,
    )
    return joined.map_batches(
        lambda b: pd.DataFrame(
            {
                "bucket_start_us": b["bucket_start_us"].to_numpy(np.int64),
                "n_events": b["n_events"].fillna(0).to_numpy(np.int64),
            }
        ),
        batch_format="pandas",
    )


FUNNEL_SCHEMA = pa.schema([("stage", pa.string()), ("n_users", pa.int64())])


def funnel_counts(
    ds: ray.data.Dataset,
    stages: tuple[str, ...],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> ray.data.Dataset:
    """Ordered-funnel conversion: ``(stage, n_users)`` — users counted
    at stage i if they performed stage events in strict timestamp
    order (earliest-qualifying chain: t_i = min ts of a stage-i event
    AFTER t_{i-1}; ties at identical timestamps do not advance).

    ONE bucketed shuffle keyed on the user; within each bucket the
    chain is closed with vectorized per-stage groupby-min + merge
    passes (no per-user Python); per-bucket partial counts reduce in a
    tiny final grouped sum."""
    from .relational import grouped_sums

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[type_col].isin(stages)]
        return pd.DataFrame(
            {
                "u": b[user_col].to_numpy(np.int64),
                "t": b[ts_col].to_numpy("datetime64[us]").astype("int64"),
                "s": b[type_col].to_numpy(object),
            }
        )

    def _chain(g: pd.DataFrame) -> pd.DataFrame:
        out_stage, out_n = [], []
        cur = None  # DataFrame (u, t_prev)
        for i, stage in enumerate(stages):
            ev = g[g["s"] == stage]
            if i == 0:
                cur = ev.groupby("u", as_index=False)["t"].min()
            else:
                m = ev.merge(cur, on="u", suffixes=("", "_prev"))
                m = m[m["t"] > m["t_prev"]]
                cur = m.groupby("u", as_index=False)["t"].min()
            out_stage.append(stage)
            out_n.append(len(cur))
            if len(cur) == 0:
                for rest in stages[i + 1:]:
                    out_stage.append(rest)
                    out_n.append(0)
                break
        return pd.DataFrame({"stage": out_stage, "n": np.asarray(out_n, np.int64)})

    from .infer import bucketed_reduce

    partials = bucketed_reduce(
        ds.select_columns([user_col, ts_col, type_col]).map_batches(
            _pre, batch_format="pandas", batch_size=None
        ),
        ["u"],
        _chain,
        pa.schema([("stage", pa.string()), ("n", pa.int64())]),
    )
    return grouped_sums(partials, ["stage"], {"n_users": "n"})


TRANSITION_SCHEMA = pa.schema(
    [
        ("prev_type", pa.string()),
        ("next_type", pa.string()),
        ("cnt", pa.int64()),
        ("prob_milli", pa.int64()),
    ]
)


def transition_counts(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> ray.data.Dataset:
    """First-order Markov transition matrix over per-user event
    sequences: ``(prev_type, next_type, cnt, prob_milli)`` where
    ``prob_milli = 1000*cnt // Σ cnt over the same prev_type``.

    Plan: ONE bucket shuffle on the user (vectorized within-bucket
    sort + shift emits per-bucket PRE-AGGREGATED pair counts — the
    second exchange moves at most ``|types|² × buckets`` rows), then a
    bucketed sum keyed on ``prev_type`` whose reducer sees every pair
    of a prev_type and computes the exact integer row-probability.
    Deterministic event order ``(ts, event_id)`` (duplicate timestamps
    exist in real logs).
    """

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values([user_col, ts_col, id_col], kind="stable")
        prev = b.groupby(user_col, sort=False)[type_col].shift(1)
        t = pd.DataFrame({"prev_type": prev, "next_type": b[type_col]}).dropna(
            subset=["prev_type"]
        )
        out = t.groupby(["prev_type", "next_type"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "cnt"})

    pair_partials = bucketed_reduce(
        events.select_columns([user_col, ts_col, id_col, type_col]),
        [user_col],
        _pairs,
        pa.schema(
            [("prev_type", pa.string()), ("next_type", pa.string()), ("cnt", pa.int64())]
        ),
    )

    def _combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["prev_type", "next_type"], sort=False, as_index=False)["cnt"].sum()

    def _probs(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["prev_type", "next_type"], sort=False, as_index=False)["cnt"].sum()
        tot = agg.groupby("prev_type", sort=False)["cnt"].transform("sum")
        agg["prob_milli"] = (1000 * agg["cnt"].astype("int64")) // tot.astype("int64")
        return agg

    return bucketed_reduce(
        pair_partials, ["prev_type"], _probs, TRANSITION_SCHEMA, combiner=_combine
    )


INTERVAL_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_id", pa.int64()),
        ("start_us", pa.int64()),
        ("end_us", pa.int64()),
    ]
)


def session_intervals(
    events: ray.data.Dataset,
    *,
    gap_minutes: int = 30,
    pad_us: int = 1_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Per-user session INTERVALS ``(user_id, session_id, start_us,
    end_us)`` — same gap rule as :func:`sessionize`, but emitting
    half-open time spans ``[min ts, max ts + pad_us)`` (a single-event
    session occupies ``pad_us``)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values([user_col, ts_col], kind="stable")
        prev_ts = b.groupby(user_col, sort=False)[ts_col].shift(1)
        new_session = (b[ts_col] - prev_ts > gap) | prev_ts.isna()
        b = b.assign(
            session_id=new_session.groupby(b[user_col], sort=False).cumsum().astype("int64"),
            us=b[ts_col].to_numpy("datetime64[us]").astype("int64"),
        )
        out = b.groupby([user_col, "session_id"], as_index=False, sort=False).agg(
            start_us=("us", "min"), end_us=("us", "max")
        )
        out["end_us"] = out["end_us"] + pad_us
        return out.astype(
            {user_col: "int64", "session_id": "int64", "start_us": "int64", "end_us": "int64"}
        )

    return bucketed_reduce(
        events.select_columns([user_col, ts_col]), [user_col], _reduce, INTERVAL_SCHEMA
    )


CONCURRENCY_SCHEMA = pa.schema(
    [("window_start_us", pa.int64()), ("peak_concurrent", pa.int64())]
)

# sweep-line range residue: one row per time bucket that contains a
# delta — bounded by the covered TIME SPAN, not the data size (2M
# hour-buckets = 228 years); a span beyond it is a caller error
DRIVER_MAX_RANGES = 2_000_000


def interval_concurrency(
    intervals: ray.data.Dataset,
    *,
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 3_600_000_000,
    driver_max_ranges: int = DRIVER_MAX_RANGES,
) -> ray.data.Dataset:
    """Peak number of concurrently-open intervals per time bucket —
    the classic sweep-line, distributed: ``(window_start_us,
    peak_concurrent)`` for every bucket containing an endpoint.

    Plan (ONE shuffle): endpoints become ±1 deltas, combined map-side
    per timestamp; a bucketed reduce keyed on the TIME BUCKET sorts
    each bucket's timestamps and emits one row ``(bucket, max of
    within-bucket running sum, bucket net total)``. The cross-bucket
    prefix offsets are a cumulative sum over that tiny residue
    (counted against ``driver_max_ranges`` — it scales with the
    covered time span, never with row count), exactly the prefix-sum
    shard-packing shape. Ends sort before starts at equal timestamps
    (half-open intervals), which the per-ts NET collapse encodes
    for free. Buckets with no endpoint are omitted (concurrency there
    equals the previous bucket's closing value).
    """

    def _deltas(b: pd.DataFrame) -> pd.DataFrame:
        t = np.concatenate(
            [b[start_col].to_numpy(np.int64), b[end_col].to_numpy(np.int64)]
        )
        d = np.concatenate(
            [np.ones(len(b), np.int64), -np.ones(len(b), np.int64)]
        )
        out = (
            pd.DataFrame({"t": t, "net": d})
            .groupby("t", sort=False, as_index=False)["net"]
            .sum()
        )
        out["range_id"] = out["t"].to_numpy(np.int64) // bucket_us
        return out[["range_id", "t", "net"]]

    def _combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["range_id", "t"], sort=False, as_index=False)["net"].sum()

    def _range_reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["range_id", "t"], sort=False, as_index=False)["net"].sum()
        agg = agg.sort_values(["range_id", "t"], kind="stable")
        cum = agg.groupby("range_id", sort=False)["net"].cumsum()
        per = pd.DataFrame({"range_id": agg["range_id"], "cum": cum}).groupby(
            "range_id", as_index=False, sort=False
        )["cum"].max()
        tot = agg.groupby("range_id", as_index=False, sort=False)["net"].sum()
        return per.merge(tot, on="range_id").rename(
            columns={"cum": "max_rel", "net": "total"}
        )

    residue_schema = pa.schema(
        [("range_id", pa.int64()), ("max_rel", pa.int64()), ("total", pa.int64())]
    )
    residue = bucketed_reduce(
        intervals.select_columns([start_col, end_col]).map_batches(
            _deltas, batch_format="pandas", batch_size=None
        ),
        ["range_id"],
        _range_reduce,
        residue_schema,
        combiner=_combine,
    ).materialize()
    n_ranges = residue.count()
    if n_ranges > driver_max_ranges:
        raise ValueError(
            f"interval_concurrency: {n_ranges} time buckets exceed "
            f"driver_max_ranges={driver_max_ranges}; widen bucket_us"
        )
    if n_ranges == 0:
        return ray.data.from_arrow(CONCURRENCY_SCHEMA.empty_table())
    df = residue.to_pandas().sort_values("range_id", kind="stable")
    offsets = df["total"].cumsum().shift(1, fill_value=0).to_numpy(np.int64)
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "window_start_us": df["range_id"].to_numpy(np.int64) * bucket_us,
                "peak_concurrent": df["max_rel"].to_numpy(np.int64) + offsets,
            }
        )
    )


RETENTION_SCHEMA = pa.schema(
    [
        ("cohort_start_us", pa.int64()),
        ("period_offset", pa.int64()),
        ("n_users", pa.int64()),
    ]
)


def retention_matrix(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = 604_800_000_000,
) -> ray.data.Dataset:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event; each cell counts distinct users from cohort c
    active in period c + offset. The classic growth-analytics query —
    Ray Data has no window functions, so the min-over-user plus the
    distinct-count per cell are expressed as two bucketed shuffles:

    1. user-keyed ``bucketed_reduce`` over map-side-distinct
       ``(user, period)`` partials — each user lands whole in one
       bucket, so the bucket computes the user's cohort (min period)
       and collapses straight to per-``(cohort, offset)`` partial
       counts (distinct users need no second dedup: one row per
       (user, period) survives the map partial).
    2. a tiny ``(cohort, offset)``-keyed reduce summing the partials
       (key domain = O(periods²), trivially small next to rows).

    SQL twin: ``min() OVER`` + ``count(DISTINCT ...)`` group — see
    ``pipelines/queries.py:events_retention``.
    """

    partial_schema = pa.schema([("u", pa.int64()), ("p", pa.int64())])

    def _distinct_user_period(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or ts_col not in b.columns:
            return pd.DataFrame(
                {"u": pd.Series([], dtype="int64"), "p": pd.Series([], dtype="int64")}
            )
        us = b[ts_col].to_numpy("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {"u": b[user_col].to_numpy(np.int64), "p": us // period_us}
        ).drop_duplicates()

    def _per_user_cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()  # map partials from different blocks overlap
        cohort = g.groupby("u", sort=False)["p"].transform("min")
        cells = pd.DataFrame(
            {"cohort_p": cohort.to_numpy(np.int64), "offset": (g["p"] - cohort).to_numpy(np.int64)}
        )
        out = cells.groupby(["cohort_p", "offset"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "n_users"})

    cell_schema = pa.schema(
        [("cohort_p", pa.int64()), ("offset", pa.int64()), ("n_users", pa.int64())]
    )
    partials = bucketed_reduce(
        events.map_batches(_distinct_user_period, batch_format="pandas", batch_size=None),
        ["u"],
        _per_user_cells,
        cell_schema,
    )

    def _sum_cells(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["cohort_p", "offset"], sort=False, as_index=False)["n_users"].sum()
        return pd.DataFrame(
            {
                "cohort_start_us": agg["cohort_p"].to_numpy(np.int64) * period_us,
                "period_offset": agg["offset"].to_numpy(np.int64),
                "n_users": agg["n_users"].to_numpy(np.int64),
            }
        )

    return bucketed_reduce(partials, ["cohort_p", "offset"], _sum_cells, RETENTION_SCHEMA)


DECAY_SCHEMA = pa.schema([("user_id", pa.int64()), ("decayed_cents", pa.int64())])


def decayed_counts(
    events: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_us: int = 3_600_000_000,
    max_age: int = 40,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exponential-decay activity score per key: each event contributes
    ``cents(value) // 2^age`` where ``age`` is whole time buckets
    (default hours) behind the corpus max — the freshness-weighted
    engagement score every recsys/feature pipeline keeps.

    Half-life = one bucket, decay by INTEGER floor-shift: exact
    integers, so the SQL window twin hash-matches (float EWMA never
    could). ``age`` caps at ``max_age`` (contributions are 0 long
    before 2^40 anyway; the cap keeps ``power(2, age)`` exact in the
    oracle's double). One tiny global max + one grouped sum — the
    decay itself is map-side."""
    # global max bucket: one tiny all-reduce on a projected column
    def _us(col: pd.Series) -> np.ndarray:
        # normalize any datetime resolution (ns from pandas, us from
        # parquet) to epoch MICROSECONDS before bucketing
        return col.astype("datetime64[us]").astype("int64").to_numpy()

    gmax = int(
        events.select_columns([ts_col])
        .map_batches(
            lambda b: pd.DataFrame(
                {"h": [int(_us(b[ts_col]).max()) // bucket_us]}
                if len(b)
                else {"h": pd.Series([], dtype="int64")}
            ),
            batch_format="pandas",
            batch_size=None,
        )
        .max("h")
    )

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {key_col: pd.Series([], dtype="int64"),
                 "decayed_cents": pd.Series([], dtype="int64")}
            )
        cents = np.round(b[value_col].to_numpy(np.float64) * 100.0).astype(np.int64)
        age = gmax - _us(b[ts_col]) // bucket_us
        age = np.minimum(age, max_age)
        contrib = cents // (np.int64(1) << age)
        out = pd.DataFrame({key_col: b[key_col].astype("int64"), "decayed_cents": contrib})
        return out.groupby(key_col, sort=False, as_index=False)["decayed_cents"].sum()

    from .infer import bucketed_reduce

    return bucketed_reduce(
        events.select_columns([key_col, ts_col, value_col]).map_batches(
            _score, batch_format="pandas", batch_size=None
        ),
        [key_col],
        lambda g: g.groupby(key_col, sort=False, as_index=False)["decayed_cents"].sum(),
        DECAY_SCHEMA,
        num_buckets=num_buckets,
    )


ATTRIBUTION_SCHEMA = pa.schema(
    [("event_type", pa.string()), ("attributed_cents", pa.int64()),
     ("n_touches", pa.int64())]
)


def linear_attribution(
    events: ray.data.Dataset,
    *,
    window_us: int,
    purchase_type: str = "purchase",
    user_col: str = "user_id",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Multi-touch LINEAR attribution: every purchase's value splits
    equally across the same user's non-purchase events ("touches") in
    the preceding ``window_us`` microseconds ``[ts_p - W, ts_p)``; a
    purchase with no touches lands in a ``direct`` row.

    Exactness contract: value converts once to int64 cents; each touch
    receives ``cents // n`` and the division REMAINDER goes to the
    LAST touch (max ``(ts, event_id)``) — attributed cents sum to the
    purchase cents to the cent, and the grouped totals are hash-exact
    vs a window-function SQL twin (floor division is identical because
    cents are non-negative).

    Shape: one user-keyed bucketed exchange; inside each bucket the
    per-purchase window lookups run on a composite integer axis
    ``user_index * M + (ts - ts_min)`` with ``M = span + W + 2`` so a
    single ``searchsorted`` serves every user at once (no per-user
    Python loop) and windows can never cross a user boundary; the
    per-touch shares accumulate with a prefix-difference pass. The
    per-type partials then re-reduce on the tiny type key. Composite
    bound: ``users_per_bucket * (span + W) < 2^63`` — raise
    ``num_buckets`` for corpora that approach it.

    For the ``direct`` row ``n_touches`` counts unattributed
    PURCHASES (there are no touch pairs to count).
    """

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: b[user_col].combine_chunks().cast(pa.int64()),
                "ts_us": b["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": b["event_id"].combine_chunks().cast(pa.int64()),
                "event_type": b["event_type"].combine_chunks().cast(pa.string()),
                "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64()),
            }
        )

    prepped = events.select_columns(
        [user_col, "ts", "event_id", "event_type", "value"]
    ).map_batches(_prep, batch_format="pyarrow")

    def _attribute(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "attributed_cents": pd.Series([], dtype="int64"),
                 "n_touches": pd.Series([], dtype="int64")}
            )
        g = g.sort_values([user_col, "ts_us", "event_id"], kind="stable")
        ts = g["ts_us"].to_numpy(np.int64)
        uidx = pd.factorize(g[user_col].to_numpy(), sort=False)[0].astype(np.int64)
        base = ts - ts.min()
        m = np.int64(base.max()) + np.int64(window_us) + 2
        comp = uidx * m + base
        is_p = (g["event_type"] == purchase_type).to_numpy()
        tcomp = comp[~is_p]
        ttypes = g.loc[~is_p, "event_type"].to_numpy(object)
        pcomp = comp[is_p]
        pcents = g.loc[is_p, "cents"].to_numpy(np.int64)

        lo = np.searchsorted(tcomp, pcomp - np.int64(window_us), side="left")
        hi = np.searchsorted(tcomp, pcomp, side="left")
        n = hi - lo
        hasn = n > 0
        share = np.zeros(len(pcomp), dtype=np.int64)
        rem = np.zeros(len(pcomp), dtype=np.int64)
        share[hasn] = pcents[hasn] // n[hasn]
        rem[hasn] = pcents[hasn] % n[hasn]

        att = np.zeros(len(tcomp) + 1, dtype=np.int64)
        cnt = np.zeros(len(tcomp) + 1, dtype=np.int64)
        np.add.at(att, lo[hasn], share[hasn])
        np.add.at(att, hi[hasn], -share[hasn])
        np.add.at(cnt, lo[hasn], 1)
        np.add.at(cnt, hi[hasn], -1)
        att = np.cumsum(att)[:-1]
        cnt = np.cumsum(cnt)[:-1]
        np.add.at(att, hi[hasn] - 1, rem[hasn])

        out = pd.DataFrame(
            {"event_type": ttypes, "attributed_cents": att, "n_touches": cnt}
        ).groupby("event_type", sort=False, as_index=False).sum()
        n_direct = int((~hasn).sum())
        if n_direct:
            out = pd.concat(
                [out, pd.DataFrame(
                    {"event_type": ["direct"],
                     "attributed_cents": [int(pcents[~hasn].sum())],
                     "n_touches": [n_direct]}
                )],
                ignore_index=True,
            )
        return out

    per_bucket = bucketed_reduce(
        prepped, [user_col], _attribute, ATTRIBUTION_SCHEMA,
        num_buckets=num_buckets,
    )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("event_type", sort=False, as_index=False)[
            ["attributed_cents", "n_touches"]
        ].sum()

    return bucketed_reduce(
        per_bucket, ["event_type"], _final, ATTRIBUTION_SCHEMA,
        combiner=_final, num_buckets=num_buckets,
    )


PATTERN_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_events", pa.int64()),
        ("n_matches", pa.int64()),
    ]
)


def sequence_pattern_counts(
    ds: ray.data.Dataset,
    pattern: str,
    type_chars: dict[str, str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    default_char: str = "x",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """MATCH_RECOGNIZE-shaped event-sequence pattern matching:
    ``(user_id, n_events, n_matches)`` where ``n_matches`` counts
    NON-OVERLAPPING, leftmost-first regex matches of ``pattern`` over
    the user's chronological event-type string (one character per
    event via ``type_chars``, ``(ts, event_id)`` total order so ties
    are deterministic). Every user with >= 1 event appears, matches or
    not — zero rows are the funnel's denominators.

    ONE bucket shuffle keyed on the user (the sessionize exchange);
    within a bucket the encoding is fully vectorized (one sort, one
    ``pd.Series.map``, one byte-codes array sliced per user by
    boundary offsets) and only the per-user ``findall`` over the
    assembled string is Python — bounded by that user's event count,
    parallel across buckets, and the same non-overlapping semantics
    DuckDB's RE2 ``regexp_extract_all`` twin uses (leftmost match,
    resume after the match end).
    """
    import re

    rx = re.compile(pattern)
    cmap = {k: v.encode()[:1] for k, v in type_chars.items()}
    dflt = default_char.encode()[:1]

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": b[user_col].to_numpy(np.int64),
                "t": b[ts_col].to_numpy("datetime64[us]").astype("int64"),
                "i": b[id_col].to_numpy(np.int64),
                "ch": b[type_col].map(cmap).fillna(dflt).to_numpy(object),
            }
        )

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "n_matches": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["u", "t", "i"], kind="stable")
        u = g["u"].to_numpy(np.int64)
        codes = np.frombuffer(b"".join(g["ch"].to_numpy(object)), dtype="S1")
        bounds = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[bounds[1:], len(u)]
        out_u = u[bounds]
        n_ev = (ends - bounds).astype(np.int64)
        n_m = np.fromiter(
            (
                len(rx.findall(codes[st:en].tobytes().decode("ascii")))
                for st, en in zip(bounds, ends)
            ),
            dtype=np.int64,
            count=len(bounds),
        )
        return pd.DataFrame(
            {"user_id": out_u, "n_events": n_ev, "n_matches": n_m}
        )

    prepped = ds.select_columns([user_col, ts_col, type_col, id_col]).map_batches(
        _pre, batch_format="pandas", batch_size=None
    )
    return bucketed_reduce(
        prepped, ["u"], _count, PATTERN_SCHEMA, num_buckets=num_buckets
    )


OOO_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_events", pa.int64()),
        ("n_late", pa.int64()),
        ("max_lateness_us", pa.int64()),
    ]
)


def out_of_order_profile(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-key event-time disorder profile: ``(user_id, n_events,
    n_late, max_lateness_us)`` where an event is LATE iff its event
    time precedes the running maximum event time over ARRIVAL order
    (``event_id`` — the log offset), and lateness is how far behind
    that watermark it arrived. This is the measurement that sizes a
    streaming pipeline's allowed-lateness / watermark delay: read the
    max (or a quantile) of ``max_lateness_us`` across keys and you
    have the reorder buffer a tumbling-window consumer needs.

    ONE user-keyed bucket shuffle; within a bucket everything is
    vectorized C (one sort by ``(user, arrival)``, one grouped cummax,
    one grouped shift, one grouped sum/max). SQL twin: ``max(ts) OVER
    (PARTITION BY user ORDER BY event_id ROWS UNBOUNDED PRECEDING TO 1
    PRECEDING)``.
    """

    def _pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": b[user_col].to_numpy(np.int64),
                "t": b[ts_col].to_numpy("datetime64[us]").astype("int64"),
                "i": b[id_col].to_numpy(np.int64),
            }
        )

    def _profile(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "n_late": pd.Series([], dtype="int64"),
                    "max_lateness_us": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["u", "i"], kind="stable")
        grp = g.groupby("u", sort=False)
        # shift makes each group's first row NaN (and floats the dtype);
        # substitute the row's own ts via the mask so the comparison and
        # difference stay exact int64 (us epochs sit near the float53
        # cliff — going through float would fuzz 1-us lateness)
        shifted = grp["t"].cummax().groupby(g["u"], sort=False).shift(1)
        first = shifted.isna().to_numpy()
        t = g["t"].to_numpy(np.int64)
        prev_max = np.where(first, t, shifted.fillna(0).to_numpy("int64"))
        late = t < prev_max
        lateness = np.where(late, prev_max - t, 0)
        out = pd.DataFrame(
            {
                "u": g["u"],
                "late": late.astype("int64"),
                "lateness": lateness,
            }
        )
        agg = out.groupby("u", sort=False).agg(
            n_events=("late", "size"),
            n_late=("late", "sum"),
            max_lateness_us=("lateness", "max"),
        ).reset_index()
        return agg.rename(columns={"u": "user_id"}).astype("int64")

    prepped = ds.select_columns([user_col, ts_col, id_col]).map_batches(
        _pre, batch_format="pandas", batch_size=None
    )
    return bucketed_reduce(prepped, ["u"], _profile, OOO_SCHEMA, num_buckets=num_buckets)


CADENCE_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_events", pa.int64()),
        ("n_dup_ts", pa.int64()),
        ("min_gap_s", pa.int64()),
        ("sum_gap_s", pa.int64()),
        ("sum_gap_sq", pa.int64()),
    ]
)


def cadence_profile(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-user inter-arrival cadence profile — the bot/scraper signal
    a crawl-hygiene pass computes per client (machine traffic has
    near-zero gap variance and many duplicate timestamps; humans are
    bursty).

    Emits ``(user_id, n_events, n_dup_ts, min_gap_s, sum_gap_s,
    sum_gap_sq)`` where gaps are successive-event deltas in WHOLE
    seconds (``floor(us_diff / 1e6)`` — positive, so floor == SQL
    trunc) over the user's ts-sorted stream; duplicate timestamps
    yield 0-second gaps; ``min_gap_s = -1`` for single-event users.
    Variance is derivable exactly from the integer sums downstream.

    ONE exchange, and the shuffle never carries raw rows: the
    map-side combiner collapses each block to distinct
    ``(user, ts, count)`` partials — gaps between equal timestamps are
    0, so distinct-ts diffs plus the duplicate count reconstruct the
    full gap multiset's min/sum/sum-of-squares exactly.
    """
    cnt_schema = pa.schema(
        [(user_col, pa.int64()), ("ts_us", pa.int64()), ("c", pa.int64())]
    )

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or user_col not in b.columns:
            return pd.DataFrame(
                {
                    user_col: pd.Series([], dtype="int64"),
                    "ts_us": pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        if "ts_us" in b.columns:
            g = b.groupby([user_col, "ts_us"], as_index=False)["c"].sum()
        else:
            b = b.assign(ts_us=b[ts_col].astype("datetime64[us]").astype("int64"))
            g = b.groupby([user_col, "ts_us"], as_index=False).agg(
                c=("ts_us", "size")
            )
        g["c"] = g["c"].astype("int64")
        return g[[user_col, "ts_us", "c"]]

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby([user_col, "ts_us"], as_index=False)["c"]
            .sum()
            .sort_values([user_col, "ts_us"], kind="mergesort")
            .reset_index(drop=True)
        )
        users = agg[user_col]
        n_events = agg.groupby(user_col)["c"].transform("sum").astype("int64")
        n_distinct = agg.groupby(user_col)["ts_us"].transform("size").astype("int64")
        # distinct-ts diffs within each user (first row of a user: NaN)
        d_us = agg["ts_us"].diff()
        first = users != users.shift()
        gap_s = (d_us // 1_000_000).where(~first)
        frame = pd.DataFrame(
            {
                user_col: users,
                "gap_s": gap_s,
                "gap_sq": gap_s * gap_s,
            }
        )
        per = frame.groupby(user_col).agg(
            min_pos=("gap_s", "min"),
            sum_gap_s=("gap_s", "sum"),
            sum_gap_sq=("gap_sq", "sum"),
        )
        per["n_events"] = n_events.groupby(users.values).first()
        per["n_dup_ts"] = per["n_events"] - n_distinct.groupby(users.values).first()
        # duplicate timestamps contribute 0-second gaps: min is 0 when
        # any dup exists; sums are unchanged (0 adds nothing)
        has_dup = per["n_dup_ts"] > 0
        per["min_gap_s"] = per["min_pos"].where(~has_dup, 0)
        # single-event users have no gaps at all
        no_gap = per["n_events"] < 2
        per["min_gap_s"] = per["min_gap_s"].fillna(-1).where(~no_gap, -1)
        out = per.reset_index()[
            [user_col, "n_events", "n_dup_ts", "min_gap_s", "sum_gap_s", "sum_gap_sq"]
        ]
        for c in out.columns:
            out[c] = out[c].fillna(0).astype("int64")
        return out

    return bucketed_reduce(
        events.select_columns([user_col, ts_col]),
        [user_col],
        _reduce,
        CADENCE_SCHEMA,
        combiner=_comb,
        num_buckets=num_buckets,
    )


RUNS_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_events", pa.int64()),
        ("n_runs", pa.int64()),
        ("max_run", pa.int64()),
    ]
)


def event_runs(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-user run-length profile of the event-type sequence —
    ``(n_events, n_runs, max_run)`` where a run is a maximal stretch of
    consecutive equal types in ``(ts, event_id)`` order (the
    stuck-client / replay detector: a user emitting one type 500 times
    in a row is a bot or a bug).

    Runs are order-dependent, so the shuffle carries the user's raw
    rows (key-partitioned, same shape as sessionize — no mergeable
    map-side combiner exists for sequences); within the bucket one
    vectorized sort + shift-compare + cumsum labels every run, no
    per-user Python. Hash-exact vs a lag-window SQL twin."""

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col], kind="mergesort")
        u = g[user_col].to_numpy()
        t = g[type_col].to_numpy(object)
        brk = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            same_user = u[1:] == u[:-1]
            same_type = t[1:] == t[:-1]
            brk[1:] = (~(same_user & same_type)).astype(np.int64)
        run_id = np.cumsum(brk)
        frame = pd.DataFrame({user_col: u, "run_id": run_id})
        runs = frame.groupby([user_col, "run_id"], sort=False).size()
        per = runs.groupby(level=0).agg(["sum", "size", "max"])
        out = pd.DataFrame(
            {
                user_col: per.index.to_numpy("int64"),
                "n_events": per["sum"].to_numpy("int64"),
                "n_runs": per["size"].to_numpy("int64"),
                "max_run": per["max"].to_numpy("int64"),
            }
        )
        return out

    return bucketed_reduce(
        events.select_columns([user_col, type_col, ts_col, id_col]),
        [user_col],
        _reduce,
        RUNS_SCHEMA,
        num_buckets=num_buckets,
    )


INTERP_SCHEMA = pa.schema(
    [
        ("event_type", pa.string()),
        ("hour", pa.int64()),
        ("n", pa.int64()),
        ("filled", pa.bool_()),
    ]
)


def interpolated_gapfill(
    events: ray.data.Dataset,
    *,
    key_col: str = "event_type",
    bucket_col: str = "hour",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-key hourly counts with LINEARLY INTERPOLATED gaps — the
    time-series repair step a feed monitor runs before anomaly scoring
    (a zero-filled gap looks like an outage; an interpolated one keeps
    the trend). For each key, every hour in the key's own
    ``[min, max]`` span gets a row: present hours keep their count,
    missing hours get ``pv + trunc((nv - pv) * (t - pb) / (nb - pb))``
    between the nearest present neighbors — TRUNCATING division
    (DuckDB ``//`` semantics; Python floor differs on negative slopes,
    the regress module's `_trunc_div` lesson), so the twin
    hash-matches.

    ONE exchange of per-block (key, hour, partial count); inside the
    reduce the spine expansion and neighbor lookups are fully
    vectorized via a combined ``code * 2^32 + hour`` sort key (one
    np.searchsorted each for prev/next — never lands outside the
    key's own span because its endpoints are present). Per-key residue
    is the covered hour span, same boundedness contract as
    cusum/autocorr."""
    cnt_schema = pa.schema(
        [(key_col, pa.string()), (bucket_col, pa.int64()), ("c", pa.int64())]
    )

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or key_col not in b.columns:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype="object"),
                    bucket_col: pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        if "c" in b.columns:
            g = b.groupby([key_col, bucket_col], as_index=False)["c"].sum()
        else:
            g = b.groupby([key_col, bucket_col], as_index=False).agg(
                c=(bucket_col, "size")
            )
        g[bucket_col] = g[bucket_col].astype("int64")
        g["c"] = g["c"].astype("int64")
        return g[[key_col, bucket_col, "c"]]

    BIG = np.int64(1) << np.int64(32)

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby([key_col, bucket_col], as_index=False)["c"]
            .sum()
            .sort_values([key_col, bucket_col], kind="mergesort")
            .reset_index(drop=True)
        )
        keys = agg[key_col].to_numpy(object)
        b = agg[bucket_col].to_numpy(np.int64)
        v = agg["c"].to_numpy(np.int64)
        uniq, codes = np.unique(keys, return_inverse=True)
        lo = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        hi = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(lo, codes, b)
        np.maximum.at(hi, codes, b)
        span = hi - lo + 1
        total = int(span.sum())
        # spine: for each key, lo..hi inclusive
        reps = np.repeat(np.arange(len(uniq)), span)
        offs = np.concatenate(([0], np.cumsum(span)[:-1]))
        spine_b = np.arange(total, dtype=np.int64) - np.repeat(offs, span) + np.repeat(lo, span)
        present_key = codes.astype(np.int64) * BIG + b
        spine_key = reps.astype(np.int64) * BIG + spine_b
        prev_i = np.searchsorted(present_key, spine_key, side="right") - 1
        next_i = np.searchsorted(present_key, spine_key, side="left")
        pv, pb = v[prev_i], b[prev_i]
        nv, nb = v[np.minimum(next_i, len(v) - 1)], b[np.minimum(next_i, len(v) - 1)]
        exact = np.isin(spine_key, present_key)
        den = np.where(nb == pb, 1, nb - pb)
        num = (nv - pv) * (spine_b - pb)
        # truncating division (sign-aware) to match DuckDB //
        q = np.abs(num) // np.abs(den)
        q = np.where((num >= 0) == (den > 0), q, -q)
        filled_val = pv + q
        out_n = np.where(exact, v[np.clip(next_i, 0, len(v) - 1)], filled_val)
        # for exact rows next_i points at the present row itself
        return pd.DataFrame(
            {
                key_col: uniq[reps],
                bucket_col: spine_b,
                "n": out_n.astype(np.int64),
                "filled": ~exact,
            }
        )

    out_schema = pa.schema(
        [
            (key_col, pa.string()),
            (bucket_col, pa.int64()),
            ("n", pa.int64()),
            ("filled", pa.bool_()),
        ]
    )
    return bucketed_reduce(
        events.select_columns([key_col, bucket_col]),
        [key_col],
        _reduce,
        out_schema,
        combiner=_comb,
        num_buckets=num_buckets,
    )


WINDOW_DEDUP_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("is_dup", pa.int64())]
)


def window_dedup(
    ds: ray.data.Dataset,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    *,
    ttl_us: int,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """TTL-window duplicate flags: an event is a duplicate iff the
    IMMEDIATELY PRECEDING event with the same key (event-time order,
    ``id_col`` tie-break) happened within ``ttl_us`` — the streaming
    dedup-with-expiry semantics (suppress repeats inside the window,
    let the key through again once it goes quiet), equal to SQL
    ``lag(ts) OVER (PARTITION BY key ORDER BY ts, id)``. One bucketed
    exchange on the key; the in-window compare is a vectorized shifted
    diff."""

    def _flags(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "is_dup": pd.Series(dtype="int64"),
                }
            )
        g = g.sort_values([*key_cols, ts_col, id_col], kind="stable")
        ts = g[ts_col].to_numpy().astype(np.int64)
        same_key = np.ones(len(g), dtype=bool)
        for c in key_cols:
            v = g[c].to_numpy()
            same_key &= np.concatenate([[False], v[1:] == v[:-1]])
        gap = np.concatenate([[np.iinfo(np.int64).max], ts[1:] - ts[:-1]])
        dup = same_key & (gap <= ttl_us)
        return pd.DataFrame(
            {
                "event_id": g[id_col].to_numpy().astype(np.int64),
                "is_dup": dup.astype(np.int64),
            }
        )

    from .infer import normalize_blocks

    cols = [*key_cols, ts_col, id_col]
    return normalize_blocks(
        bucketed_reduce(
            ds.select_columns(cols),
            key_cols,
            _flags,
            WINDOW_DEDUP_SCHEMA,
            num_buckets=num_buckets,
        ),
        WINDOW_DEDUP_SCHEMA,
    )


TWAP_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_intervals", pa.int64()),
        ("total_us", pa.int64()),
        ("twap_milli", pa.int64()),
    ]
)


def time_weighted_average(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    *,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-key TIME-WEIGHTED average over irregular samples: each
    value holds until the next sample (step interpolation), so
    ``twap = Σ v_i * dt_i // Σ dt_i`` with dt in microseconds and
    values in exact integer milli-units; the final sample bounds the
    last interval and contributes no value of its own (the standard
    TWAP convention). Keys with fewer than two samples emit nothing.
    One bucketed exchange; vectorized shifted diffs; hash-exact vs a
    lead()-window SQL twin."""

    def _twap(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return TWAP_SCHEMA.empty_table().to_pandas()
        g = g.sort_values([key_col, ts_col, id_col], kind="stable")
        ts = g[ts_col].to_numpy().astype(np.int64)
        keys = g[key_col].to_numpy().astype(np.int64)
        v = np.round(g[val_col].to_numpy() * 1000.0).astype(np.int64)
        same = np.concatenate([keys[1:] == keys[:-1], [False]])
        dt = np.concatenate([ts[1:] - ts[:-1], [0]])
        w = np.where(same, dt, 0)
        part = pd.DataFrame(
            {"user_id": keys, "w": w, "vw": v * w,
             "n": np.where(same, 1, 0).astype(np.int64)}
        )
        agg = part.groupby("user_id", as_index=False, sort=False).agg(
            n_intervals=("n", "sum"), total_us=("w", "sum"), vw=("vw", "sum")
        )
        agg = agg[agg["total_us"] > 0]
        if len(agg) == 0:
            return TWAP_SCHEMA.empty_table().to_pandas()
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].astype("int64"),
                "n_intervals": agg["n_intervals"].astype("int64"),
                "total_us": agg["total_us"].astype("int64"),
                "twap_milli": (agg["vw"] // agg["total_us"]).astype("int64"),
            }
        )

    from .infer import normalize_blocks

    return normalize_blocks(
        bucketed_reduce(
            ds.select_columns([key_col, ts_col, id_col, val_col]),
            [key_col],
            _twap,
            TWAP_SCHEMA,
            num_buckets=num_buckets,
        ),
        TWAP_SCHEMA,
    )


MARKOV_EVAL_SCHEMA = pa.schema(
    [
        ("n_test", pa.int64()),
        ("n_correct", pa.int64()),
        ("n_unpredicted", pa.int64()),
        ("acc_milli", pa.int64()),
    ]
)


def markov_eval(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
    *,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Next-event prediction evaluation: train a global first-order
    Markov mode predictor on each key's first ~80% of transitions
    (integer rule: transition i -> i+1 is TRAIN iff 5*(i+1) <= 4*n),
    evaluate accuracy@1 on the rest — the sequence-model eval loop as
    one query. Prediction = the most frequent TRAIN successor of the
    previous state (tie -> lexicographic min successor); unseen
    previous states count as incorrect but are reported separately.

    One key exchange extracts tagged transitions; train-mode counts
    group on the (prev, nxt) pair domain; the mode table (bounded by
    the state-pair domain — small for categorical event types)
    broadcasts into the test compare. Everything integer; hash-exact
    vs a row_number/mode SQL twin."""
    import ray as _ray

    from .infer import bucketed_reduce

    tr_schema = pa.schema(
        [("prev", pa.string()), ("nxt", pa.string()), ("is_train", pa.int64())]
    )

    def _transitions(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "prev": pd.Series(dtype="object"),
                    "nxt": pd.Series(dtype="object"),
                    "is_train": pd.Series(dtype="int64"),
                }
            )
        g = g.sort_values([key_col, ts_col, id_col], kind="stable")
        keys = g[key_col].to_numpy()
        st = g[state_col].astype(str).to_numpy()
        same = keys[1:] == keys[:-1]
        sizes = g.groupby(key_col, sort=False)[state_col].transform("size").to_numpy()
        pos = g.groupby(key_col, sort=False).cumcount().to_numpy()
        prev = st[:-1][same]
        nxt = st[1:][same]
        tgt_pos = (pos[1:][same]).astype(np.int64)
        n_of_key = sizes[1:][same].astype(np.int64)
        is_train = (5 * tgt_pos <= 4 * n_of_key).astype(np.int64)
        return pd.DataFrame({"prev": prev, "nxt": nxt, "is_train": is_train})

    trans = bucketed_reduce(
        ds.select_columns([key_col, ts_col, id_col, state_col]),
        [key_col],
        _transitions,
        tr_schema,
        num_buckets=num_buckets,
    ).materialize()

    # global train mode per prev (state-pair domain: small, collect)
    counts = trans.map_batches(
        lambda b: b[b["is_train"] == 1]
        .groupby(["prev", "nxt"], sort=False)
        .size()
        .reset_index(name="n")
        if len(b)
        else pd.DataFrame(
            {"prev": pd.Series(dtype="object"), "nxt": pd.Series(dtype="object"),
             "n": pd.Series(dtype="int64")}
        ),
        batch_format="pandas",
    ).to_pandas()
    if len(counts):
        counts = counts.groupby(["prev", "nxt"], as_index=False)["n"].sum()
        counts = counts.sort_values(
            ["prev", "n", "nxt"], ascending=[True, False, True], kind="stable"
        )
        mode = dict(zip(
            counts.drop_duplicates("prev")["prev"],
            counts.drop_duplicates("prev")["nxt"],
        ))
    else:
        mode = {}
    mode_ref = _ray.put(mode)

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"n_test": pd.Series(dtype="int64"),
             "n_correct": pd.Series(dtype="int64"),
             "n_unpred": pd.Series(dtype="int64")}
        )
        if len(b) == 0:
            return empty
        t = b[b["is_train"] == 0]
        if len(t) == 0:
            return empty
        m = _ray.get(mode_ref) if isinstance(mode_ref, _ray.ObjectRef) else mode_ref
        pred = t["prev"].map(m)
        return pd.DataFrame(
            {
                "n_test": [int(len(t))],
                "n_correct": [int((pred == t["nxt"]).sum())],
                "n_unpred": [int(pred.isna().sum())],
            }
        )

    parts = trans.map_batches(_score, batch_format="pandas").to_pandas()
    n_test = int(parts["n_test"].sum()) if len(parts) else 0
    n_corr = int(parts["n_correct"].sum()) if len(parts) else 0
    n_unp = int(parts["n_unpred"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "n_test": pd.Series([n_test], dtype="int64"),
            "n_correct": pd.Series([n_corr], dtype="int64"),
            "n_unpredicted": pd.Series([n_unp], dtype="int64"),
            "acc_milli": pd.Series(
                [(n_corr * 1000) // n_test if n_test else 0], dtype="int64"
            ),
        }
    )


PATH_SCHEMA = pa.schema([("path", pa.string()), ("n", pa.int64())])


def session_paths(
    events: ray.data.Dataset,
    *,
    gap_minutes: int = 30,
    top_k: int = 20,
    sep: str = ">",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Top-``k`` most common within-session event-type paths (path
    analysis: "view>view>click>purchase") — sessionization and the
    ordered path string build in ONE user-keyed reduce (each user's
    whole history sits in its bucket; the order key is ``(ts,
    event_id)`` so equal-timestamp events are deterministic), path
    counts pre-aggregate per bucket, one tiny path-keyed sum, then the
    per-block local top-k + driver merge (no global sort). Ties break
    to the lexicographically smallest path."""
    from .relational import topk_dataset

    gap = pd.Timedelta(minutes=gap_minutes)

    def _paths(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values([user_col, ts_col, id_col], kind="stable")
        prev_ts = b.groupby(user_col, sort=False)[ts_col].shift(1)
        new_session = (b[ts_col] - prev_ts > gap) | prev_ts.isna()
        sid = new_session.groupby(b[user_col], sort=False).cumsum()
        paths = (
            b.assign(__sid=sid)
            .groupby([user_col, "__sid"], sort=False)[type_col]
            .agg(sep.join)
        )
        vc = paths.value_counts(sort=False)
        return pd.DataFrame(
            {"path": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)}
        )

    per_bucket = bucketed_reduce(
        events.select_columns([user_col, ts_col, id_col, type_col]),
        [user_col],
        _paths,
        PATH_SCHEMA,
        num_buckets=num_buckets,
    )

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby("path", as_index=False, sort=False)["n"].sum()

    totals = bucketed_reduce(
        per_bucket, ["path"], _sum, PATH_SCHEMA, combiner=_sum,
        num_buckets=num_buckets,
    )
    return topk_dataset(
        totals, ["n", "path"], top_k, descending=[True, False],
        schema=PATH_SCHEMA,
    )
