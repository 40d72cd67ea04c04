"""Triple-corpus cleaning pipeline.

Behavior parity with ``scripts/clean_graph.py:82-233`` (the fork's
7-step batch cleaner), re-expressed as vectorized Ray Data stages with
distributed removal counters:

1. flatten list-typed objects into one triple per element (``:104-114``)
2. drop null/empty fields; normalize whitespace/quotes; predicate
   lower-cased and space->underscore (``:120-131``)
3. drop subject/object shorter than 3 chars (``:133-141``)
4. drop noise entities — pronouns/articles/numbers/punctuation
   (``:143-151``)
5. merge generic predicates via the synonym map (``:153-158``)
6. case-insensitive exact dedup, first occurrence wins (``:160-170``)
7. drop singleton predicates (count < min_pred_count) (``:172-180``)

Counters are accumulated per batch and combined (the reference's
``stats`` dict, ``:93-101``); dedup/singleton counts come from the
respective shuffles. Unknown/stray columns (``predicate2`` etc.,
SURVEY.md §1.2) are dropped at ingest.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.textnorm import PREDICATE_MERGES, is_noise_entity, normalize_ws
from .infer import bucketed_reduce

CLEAN_SCHEMA = pa.schema(
    [
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("chunk", pa.int32()),
        ("seq", pa.int64()),
    ]
)


def _clean_batch(batch: pa.Table) -> pa.Table:
    """Steps 1-5 on one Arrow batch; emits cleaned rows plus one
    counter row per batch in separate columns (split downstream)."""
    subjects = batch["subject"].to_pylist() if "subject" in batch.column_names else []
    n = len(batch)
    preds = batch["predicate"].to_pylist() if "predicate" in batch.column_names else [None] * n
    objs = batch["object"].to_pylist() if "object" in batch.column_names else [None] * n
    chunks = (
        batch["chunk"].to_pylist() if "chunk" in batch.column_names else [0] * n
    )
    seqs = batch["seq"].to_pylist() if "seq" in batch.column_names else list(range(n))
    # Rows whose object was list-typed arrive split out in
    # ``object_list`` (see sources.triples_io) — reunify here.
    if "object_list" in batch.column_names:
        obj_lists = batch["object_list"].to_pylist()
        objs = [ol if ol is not None else o for o, ol in zip(objs, obj_lists)]

    out_s, out_p, out_o, out_c, out_q = [], [], [], [], []
    stats = {
        "flattened_lists": 0,
        "list_rows": 0,
        "removed_null": 0,
        "removed_short": 0,
        "removed_noise": 0,
        "merged_predicates": 0,
    }
    for s, p, o, c, q in zip(subjects, preds, objs, chunks, seqs):
        # Step 1: flatten list objects
        if isinstance(o, list):
            items = [str(i) if i is not None else "" for i in o]
            stats["flattened_lists"] += len(items)
            stats["list_rows"] += 1
        else:
            items = [o]
        for oi in items:
            # Step 2: nulls / empties
            if not s or not p or (oi is None or (isinstance(oi, str) and not oi.strip())):
                stats["removed_null"] += 1
                continue
            cs = normalize_ws(s)
            cp = normalize_ws(p).lower().replace(" ", "_")
            co = normalize_ws(oi)
            # Step 3: short entities
            if len(cs) < 3 or len(co) < 3:
                stats["removed_short"] += 1
                continue
            # Step 4: noise entities
            if is_noise_entity(cs) or is_noise_entity(co):
                stats["removed_noise"] += 1
                continue
            # Step 5: predicate merges
            if cp in PREDICATE_MERGES:
                cp = PREDICATE_MERGES[cp]
                stats["merged_predicates"] += 1
            out_s.append(cs)
            out_p.append(cp)
            out_o.append(co)
            out_c.append(int(c) if c is not None else 0)
            out_q.append(int(q) if q is not None else 0)
    tbl = pa.table(
        {
            "subject": pa.array(out_s, pa.string()),
            "predicate": pa.array(out_p, pa.string()),
            "object": pa.array(out_o, pa.string()),
            "chunk": pa.array(out_c, pa.int32()),
            "seq": pa.array(out_q, pa.int64()),
        }
    )
    return tbl, stats


def clean_triples(
    ds: ray.data.Dataset,
    *,
    min_pred_count: int = 2,
    residue_max_predicates: int = 5_000_000,
) -> tuple[ray.data.Dataset, dict]:
    """Run the 7-step cleaner; returns ``(clean_ds, stats)``.

    ``stats`` mirrors the reference report (``:93-101`` / ``:183-199``):
    flattened_lists, removed_null, removed_short, removed_noise,
    merged_predicates, removed_duplicate, removed_singleton_pred,
    total_raw, total_final.

    Step 7 (singleton predicates) is COUNT-GATED like every other
    residue: the distinct-predicate histogram is collected and
    broadcast only while it has <= ``residue_max_predicates`` rows; a
    junk-predicate-heavy crawl corpus past the gate takes a
    ``skew_join`` semi-join against the keep-set instead (hot
    predicates — "related to" at crawl scale — get the broadcast
    bypass rather than serializing one join bucket).
    """
    total_raw = ds.count()

    def _map_rows(batch: pa.Table) -> pa.Table:
        tbl, _ = _clean_batch(batch)
        return tbl

    # Counters: a cheap second scan whose per-batch stats are summed
    # distributively (the cleaned rows and counters come from the same
    # pure function, so the two passes agree exactly).
    def _count_batch(batch: pa.Table) -> pa.Table:
        _, stats = _clean_batch(batch)
        return pa.table({k: pa.array([stats[k]], pa.int64()) for k in sorted(stats)})

    counter_ds = ds.map_batches(_count_batch, batch_format="pyarrow")
    counter_df = counter_ds.to_pandas()
    stats = {k: int(counter_df[k].sum()) for k in counter_df.columns} if len(counter_df) else {}

    cleaned = ds.map_batches(_map_rows, batch_format="pyarrow")

    # Step 6: case-insensitive dedup, first occurrence by stable seq.
    def _dedup_key(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch
        b = batch.copy()
        b["__key"] = (
            b["subject"].str.lower()
            + "\x00"
            + b["predicate"].str.lower()
            + "\x00"
            + b["object"].str.lower()
        )
        return b.sort_values(["chunk", "seq"], kind="stable").drop_duplicates(
            "__key", keep="first"
        )

    key_schema = pa.schema(list(CLEAN_SCHEMA) + [pa.field("__key", pa.string())])

    def _dedup_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["chunk", "seq"], kind="stable").drop_duplicates(
            "__key", keep="first"
        )[list(key_schema.names)]

    deduped = bucketed_reduce(
        cleaned.map_batches(_dedup_key, batch_format="pandas"),
        ["__key"],
        _dedup_reduce,
        key_schema,
    ).drop_columns(["__key"])

    deduped = deduped.materialize()
    n_after_dedup = deduped.count()
    # rows surviving steps 1-5 = raw - list_rows + flattened - drops;
    # dedup removals are the difference to the post-dedup count.
    stats["removed_duplicate"] = (
        total_raw
        - stats.get("list_rows", 0)
        + stats.get("flattened_lists", 0)
        - stats.get("removed_null", 0)
        - stats.get("removed_short", 0)
        - stats.get("removed_noise", 0)
        - n_after_dedup
    )

    # Step 7: singleton predicates — two-pass: predicate counts, then
    # filter. COUNT-GATED: broadcast set under the gate, skew_join
    # semi-join over it.
    pred_counts_ds = deduped.groupby("predicate").count().materialize()
    n_preds = pred_counts_ds.count()
    import ray as _ray

    if n_preds <= residue_max_predicates:
        pred_counts = pred_counts_ds.to_pandas()
        keep = set(
            pred_counts.loc[pred_counts["count()"] >= min_pred_count, "predicate"]
            if len(pred_counts)
            else []
        )
        keep_ref = _ray.put(keep)

        def _keep_filter(batch: pa.Table) -> pa.Table:
            kp = _ray.get(keep_ref) if isinstance(keep_ref, _ray.ObjectRef) else keep_ref
            mask = [p in kp for p in batch["predicate"].to_pylist()]
            return batch.filter(pa.array(mask, pa.bool_()))

        final = deduped.map_batches(_keep_filter, batch_format="pyarrow")
    else:
        from .relational import skew_join

        keep_ds = pred_counts_ds.filter(
            lambda r: r["count()"] >= min_pred_count
        ).select_columns(["predicate"])
        final = skew_join(
            deduped,
            keep_ds,
            on=["predicate"],
            left_schema=CLEAN_SCHEMA,
            right_schema=pa.schema([("predicate", pa.string())]),
        )
    final = final.materialize()
    n_final = final.count()
    stats["removed_singleton_pred"] = n_after_dedup - n_final
    stats["total_raw"] = total_raw
    stats["total_final"] = n_final
    stats["total_removed"] = total_raw - n_final
    return final, stats
