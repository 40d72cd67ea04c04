"""Market-basket co-occurrence: top item pairs by the number of
baskets containing both.

The reference repo has no co-occurrence operator; this extends the
SURVEY §2 relational/aggregation family with the classic
co-occurrence / association-mining primitive (the building block of
"related entities", co-citation and co-purchase analyses over a KG's
edge provenance — e.g. entities co-mentioned in a chunk).

Scale shape: pair generation is keyed by BASKET, so the explosion per
basket is C(|basket|, 2) — bounded by basket size, never by corpus
size. Two bucketed shuffles end to end:

1. basket-keyed bucketed reduce: per-batch distinct ``(basket, item)``
   combiner, then vectorized within-bucket ordered-pair generation
   (:func:`~.dedup._pair_indices_by_size` templates — no per-basket
   Python) with map-side pair pre-aggregation;
2. pair-keyed bucketed sum with a ``min_count`` filter inside the
   reduce, then per-block local top-k so the final global sort+limit
   runs over at most ``num_blocks * top_k`` rows.

``max_basket_size`` optionally DROPS oversized baskets (a skew guard —
a degenerate basket holding half the catalog would alone emit O(n²)
pairs; dropping is the standard practice and is reported honestly by
the caller's contract, not silently truncated pairs). Leave ``None``
for exact results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce, pa_from_pandas

PAIR_COUNT_SCHEMA = pa.schema(
    [("item_a", pa.int64()), ("item_b", pa.int64()), ("n_baskets", pa.int64())]
)


def cooccur_pairs(
    ds: ray.data.Dataset,
    basket_col: str,
    item_col: str,
    *,
    min_count: int = 2,
    top_k: int = 100,
    max_basket_size: int | None = None,
    item_type: pa.DataType | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """``(item_a, item_b, n_baskets)`` — the ``top_k`` item pairs
    (``item_a < item_b``) by the number of DISTINCT baskets containing
    both, ties broken ``(n_baskets desc, item_a, item_b)`` so the
    result set is fully deterministic (and SQL-oracle-exact). Pairs
    below ``min_count`` baskets are dropped before the top-k.
    ``item_type`` is the Arrow item dtype (default int64; pass
    ``pa.string()`` for string ids — e.g. common-neighbor node
    similarity, where baskets are middle nodes and items neighbors).
    """
    itype = item_type if item_type is not None else pa.int64()
    pairs_schema = pa.schema(
        [("item_a", itype), ("item_b", itype), ("n_baskets", pa.int64())]
    )

    def _dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[basket_col, item_col]].drop_duplicates()

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _pair_indices_by_size

        g = g.drop_duplicates([basket_col, item_col]).sort_values(
            [basket_col, item_col], kind="stable"
        )
        if max_basket_size is not None:
            sizes = g.groupby(basket_col, sort=False)[item_col].transform("size")
            g = g[sizes <= max_basket_size]
        codes = g[basket_col].to_numpy()
        i, j = _pair_indices_by_size(codes, 1 << 62)
        items = g[item_col].to_numpy()
        out = pd.DataFrame({"item_a": items[i], "item_b": items[j]})
        # map-side pre-aggregation: a hot pair crosses once per bucket
        vc = out.groupby(["item_a", "item_b"], sort=False).size()
        return pd.DataFrame(
            {
                "item_a": vc.index.get_level_values(0).to_numpy(),
                "item_b": vc.index.get_level_values(1).to_numpy(),
                "n_baskets": vc.to_numpy(np.int64),
            }
        )

    partials = bucketed_reduce(
        ds.select_columns([basket_col, item_col]).map_batches(
            _dedup, batch_format="pandas", batch_size=None
        ),
        [basket_col],
        _pairs,
        pairs_schema,
        combiner=_dedup,
        num_buckets=num_buckets,
    )

    # the first reduce emits one small block per shuffle partition;
    # coalescing to ~1 block/2 CPUs before the pair-keyed exchange
    # cuts its block-count-scaled fixed cost (measured 3.1-7.6 s ->
    # 2.7 s on the sf0.1 co-purchase pipeline, identical output)
    from .infer import default_num_partitions

    partials = partials.repartition(default_num_partitions())

    def _sum_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["item_a", "item_b"], sort=False)["n_baskets"].sum()
        s = s[s >= min_count]
        df = pd.DataFrame(
            {
                "item_a": s.index.get_level_values(0).to_numpy(),
                "item_b": s.index.get_level_values(1).to_numpy(),
                "n_baskets": s.to_numpy(np.int64),
            }
        )
        # local top-k: every key of a pair lands in ONE bucket, so the
        # global winners survive any per-bucket prefix of length top_k
        return df.sort_values(
            ["n_baskets", "item_a", "item_b"], ascending=[False, True, True]
        ).head(top_k)

    counts = bucketed_reduce(
        partials, ["item_a", "item_b"], _sum_topk, pairs_schema,
        num_buckets=num_buckets,
    )
    # final global top-k: every bucket already returned at most top_k
    # rows, so the survivor set is <= num_buckets * top_k — a driver
    # merge, not a third all-to-all exchange (Dataset.sort costs ~2-3s
    # of fixed stage latency regardless of input size)
    df = (
        counts.to_pandas()
        .sort_values(
            ["n_baskets", "item_a", "item_b"],
            ascending=[False, True, True],
            kind="stable",
        )
        .head(top_k)
    )
    return ray.data.from_arrow(pa_from_pandas(df, pairs_schema))


def _lift_schema(item_type: pa.DataType) -> pa.Schema:
    return pa.schema(
        [
            ("item_a", item_type),
            ("item_b", item_type),
            ("n_baskets", pa.int64()),
            ("lift_milli", pa.int64()),
        ]
    )


LIFT_SCHEMA = _lift_schema(pa.int64())


def cooccur_lift(
    ds: ray.data.Dataset,
    basket_col: str,
    item_col: str,
    *,
    min_count: int = 2,
    top_k: int = 100,
    max_basket_size: int | None = None,
    item_type: pa.DataType | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Association LIFT for the top-``top_k`` co-occurring pairs:
    ``lift = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)`` over DISTINCT
    baskets, reported as truncated integer ``lift_milli`` (>1000 means
    positively associated) so the DuckDB HUGEINT oracle is bit-exact.

    Cost on top of :func:`cooccur_pairs`: the per-item basket counts
    are computed ONLY for the ≤ ``2·top_k`` items appearing in the
    winning pairs (broadcast filter → one distinct exchange → one tiny
    count exchange), plus one distinct-basket count; the final
    arithmetic runs driver-side on the ≤ ``top_k`` residue in Python
    ints (``n_ab·N·1000`` overflows int64 at 100-TB basket counts).
    """
    if item_type is None:
        item_type = pa.int64()
    pairs = cooccur_pairs(
        ds,
        basket_col,
        item_col,
        min_count=min_count,
        top_k=top_k,
        max_basket_size=max_basket_size,
        item_type=item_type,
        num_buckets=num_buckets,
    ).materialize()
    pdf = pairs.to_pandas()  # <= top_k rows by contract
    if len(pdf) == 0:
        return ray.data.from_arrow(_lift_schema(item_type).empty_table())
    items = np.unique(
        np.concatenate([pdf["item_a"].to_numpy(), pdf["item_b"].to_numpy()])
    )
    items_ref = ray.put(items)

    slim = ds.select_columns([basket_col, item_col])

    def _filter_distinct(b: pd.DataFrame) -> pd.DataFrame:
        it = ray.get(items_ref) if isinstance(items_ref, ray.ObjectRef) else items_ref
        sub = b[np.isin(b[item_col].to_numpy(), it)]
        return sub.drop_duplicates([basket_col, item_col])

    pair_rows_schema = pa.schema(
        [(basket_col, pa.int64()), (item_col, item_type)]
    )
    distinct_bi = bucketed_reduce(
        slim.map_batches(_filter_distinct, batch_format="pandas", batch_size=None),
        [basket_col, item_col],
        lambda g: g.drop_duplicates([basket_col, item_col]),
        pair_rows_schema,
        num_buckets=num_buckets,
    )

    def _item_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(item_col, sort=False, as_index=False).size()
        return out.rename(columns={"size": "c"})

    item_counts = bucketed_reduce(
        distinct_bi,
        [item_col],
        lambda g: g.groupby(item_col, sort=False, as_index=False)["c"].sum(),
        pa.schema([(item_col, item_type), ("c", pa.int64())]),
        combiner=_item_partial,
        num_buckets=num_buckets,
    ).to_pandas()  # <= 2*top_k rows

    # exact distinct-basket count: map-side unique -> one distinct exchange
    def _uniq(b: pd.DataFrame) -> pd.DataFrame:
        return b[[basket_col]].drop_duplicates()

    total = (
        bucketed_reduce(
            slim.map_batches(_uniq, batch_format="pandas", batch_size=None),
            [basket_col],
            lambda g: g.drop_duplicates([basket_col]),
            pa.schema([(basket_col, pa.int64())]),
            combiner=_uniq,
            num_buckets=num_buckets,
        ).count()
    )

    cmap = dict(zip(item_counts[item_col], item_counts["c"].astype("int64")))
    lifts = []
    for a, b_, nab in zip(pdf["item_a"], pdf["item_b"], pdf["n_baskets"]):
        num = int(nab) * int(total) * 1000
        den = int(cmap[a]) * int(cmap[b_])
        lifts.append(num // den)  # all positive: floor == trunc
    out = pdf.copy()
    out["lift_milli"] = np.asarray(lifts, dtype=np.int64)
    return ray.data.from_arrow(pa_from_pandas(out, _lift_schema(item_type)))


# ---------------------------------------------------------------------------
# Apriori frequent triples (3-itemsets, pair-pruned)
# ---------------------------------------------------------------------------

TRIPLE_COUNT_SCHEMA = pa.schema(
    [
        ("item_a", pa.int64()),
        ("item_b", pa.int64()),
        ("item_c", pa.int64()),
        ("support", pa.int64()),
    ]
)


def basket_pair_counts(
    src: ray.data.Dataset,
    basket_col: str,
    item_col: str,
    *,
    max_basket_size: int | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact ``(item_a, item_b, n_baskets)`` for EVERY within-basket
    ordered pair (no min-count filter, no top-k) — the shared front
    half of :func:`frequent_triples` and :func:`association_rules`.
    Same two-exchange shape as :func:`cooccur_pairs`: basket-keyed
    vectorized pair templates with map-side pre-aggregation, then a
    pair-keyed sum."""

    def _dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[basket_col, item_col]].drop_duplicates()

    def _pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _pair_indices_by_size

        g = g.drop_duplicates([basket_col, item_col]).sort_values(
            [basket_col, item_col], kind="stable"
        )
        if max_basket_size is not None:
            sizes = g.groupby(basket_col, sort=False)[item_col].transform("size")
            g = g[sizes <= max_basket_size]
        i, j = _pair_indices_by_size(g[basket_col].to_numpy(), 1 << 62)
        items = g[item_col].to_numpy()
        vc = pd.DataFrame({"item_a": items[i], "item_b": items[j]}).groupby(
            ["item_a", "item_b"], sort=False
        ).size()
        return pd.DataFrame(
            {
                "item_a": vc.index.get_level_values(0).to_numpy(),
                "item_b": vc.index.get_level_values(1).to_numpy(),
                "n_baskets": vc.to_numpy(np.int64),
            }
        )

    partials = bucketed_reduce(
        src.map_batches(_dedup, batch_format="pandas", batch_size=None),
        [basket_col],
        _pair_partials,
        PAIR_COUNT_SCHEMA,
        combiner=_dedup,
        num_buckets=num_buckets,
    )

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["item_a", "item_b"], sort=False)["n_baskets"].sum()
        return pd.DataFrame(
            {
                "item_a": s.index.get_level_values(0).to_numpy(),
                "item_b": s.index.get_level_values(1).to_numpy(),
                "n_baskets": s.to_numpy(np.int64),
            }
        )

    return bucketed_reduce(
        partials, ["item_a", "item_b"], _sum, PAIR_COUNT_SCHEMA,
        num_buckets=num_buckets,
    )


def _triple_indices_by_size(codes: np.ndarray, cap: int):
    """Row indices (i, j, k), i<j<k, of every within-group ordered
    triple of a SORTED group-code array — same distinct-SIZE template
    broadcast as :func:`~.dedup._pair_indices_by_size` (no per-group
    Python). ``cap`` bounds triples per group (skew defense)."""
    n = len(codes)
    if n < 3:
        e = np.empty(0, np.int64)
        return e, e, e
    change = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    starts = np.concatenate(([0], change))
    sizes = np.diff(np.concatenate((starts, [n])))
    multi = sizes >= 3
    starts, sizes = starts[multi], sizes[multi]
    out = ([], [], [])
    for sz in np.unique(sizes):
        sz = int(sz)
        grid = np.array(
            [(i, j, k) for i in range(sz) for j in range(i + 1, sz)
             for k in range(j + 1, sz)],
            np.int64,
        )
        if len(grid) > cap:
            grid = grid[:cap]
        s = starts[sizes == sz]
        for d in range(3):
            out[d].append((s[:, None] + grid[None, :, d]).reshape(-1))
    if not out[0]:
        e = np.empty(0, np.int64)
        return e, e, e
    return tuple(np.concatenate(o) for o in out)


def frequent_triples(
    ds: ray.data.Dataset,
    basket_col: str,
    item_col: str,
    *,
    minsup: int = 2,
    max_basket_size: int | None = None,
    pair_broadcast_max: int = 2_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Apriori 3-itemsets: every item triple ``(a < b < c)`` contained
    in at least ``minsup`` DISTINCT baskets, with its exact support —
    the classic association-mining step above :func:`cooccur_pairs`.

    Apriori pruning, distributed: pass 1 counts pairs (the existing
    basket-keyed shape); the frequent-pair set (support >= minsup) is
    counted and, under ``pair_broadcast_max``, broadcast via
    ``ray.put`` so pass 2 generates a candidate triple ONLY when all
    three of its pairs are frequent — on sparse baskets this kills
    almost every C(|basket|, 3) candidate before the shuffle (the
    monotonicity guarantee: support(abc) >= minsup forces every pair's
    support >= minsup, so pruning never drops an answer). Over the
    gate, pass 2 runs unpruned (correct, heavier — bounded by
    ``max_basket_size``) and says so via the same honest-cap contract
    as ``cooccur_pairs``. Triple generation is vectorized over distinct
    basket SIZES, never per basket.
    """
    src = ds.select_columns([basket_col, item_col]).materialize()
    pair_counts = basket_pair_counts(
        src, basket_col, item_col,
        max_basket_size=max_basket_size, num_buckets=num_buckets,
    )

    def _dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[basket_col, item_col]].drop_duplicates()

    freq_pairs = pair_counts.map_batches(
        lambda b: b.loc[b["n_baskets"] >= minsup, ["item_a", "item_b"]],
        batch_format="pandas",
    ).materialize()

    pair_set: set | None = None
    if freq_pairs.count() <= pair_broadcast_max:
        fp = freq_pairs.to_pandas()
        pair_set = (
            set(zip(fp["item_a"].astype(np.int64), fp["item_b"].astype(np.int64)))
            if len(fp)
            else set()
        )
    ref = ray.put(pair_set)

    def _triple_partials(g: pd.DataFrame) -> pd.DataFrame:
        pruned = ray.get(ref)
        g = g.drop_duplicates([basket_col, item_col]).sort_values(
            [basket_col, item_col], kind="stable"
        )
        if max_basket_size is not None:
            sizes = g.groupby(basket_col, sort=False)[item_col].transform("size")
            g = g[sizes <= max_basket_size]
        i, j, k = _triple_indices_by_size(g[basket_col].to_numpy(), 1 << 62)
        items = g[item_col].to_numpy()
        a, b, c = items[i], items[j], items[k]
        if pruned is not None and len(a):
            keep = np.fromiter(
                (
                    (x, y) in pruned and (x, z) in pruned and (y, z) in pruned
                    for x, y, z in zip(a, b, c)
                ),
                bool,
                count=len(a),
            )
            a, b, c = a[keep], b[keep], c[keep]
        vc = pd.DataFrame(
            {"item_a": a, "item_b": b, "item_c": c}
        ).groupby(["item_a", "item_b", "item_c"], sort=False).size()
        return pd.DataFrame(
            {
                "item_a": vc.index.get_level_values(0).to_numpy(),
                "item_b": vc.index.get_level_values(1).to_numpy(),
                "item_c": vc.index.get_level_values(2).to_numpy(),
                "support": vc.to_numpy(np.int64),
            }
        )

    triple_partials = bucketed_reduce(
        src.map_batches(_dedup, batch_format="pandas", batch_size=None),
        [basket_col],
        _triple_partials,
        TRIPLE_COUNT_SCHEMA,
        combiner=_dedup,
        num_buckets=num_buckets,
    )

    def _sum_filter(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["item_a", "item_b", "item_c"], sort=False)["support"].sum()
        s = s[s >= minsup]
        return pd.DataFrame(
            {
                "item_a": s.index.get_level_values(0).to_numpy(),
                "item_b": s.index.get_level_values(1).to_numpy(),
                "item_c": s.index.get_level_values(2).to_numpy(),
                "support": s.to_numpy(np.int64),
            }
        )

    return bucketed_reduce(
        triple_partials,
        ["item_a", "item_b", "item_c"],
        _sum_filter,
        TRIPLE_COUNT_SCHEMA,
        num_buckets=num_buckets,
    )


RULE_SCHEMA = pa.schema(
    [
        ("ant_a", pa.int64()),
        ("ant_b", pa.int64()),
        ("cons", pa.int64()),
        ("support", pa.int64()),
        ("conf_milli", pa.int64()),
    ]
)


def association_rules(
    ds: ray.data.Dataset,
    basket_col: str,
    item_col: str,
    *,
    minsup: int = 2,
    max_basket_size: int | None = None,
    driver_max_triples: int = 2_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Pair-antecedent association rules ``{ant_a, ant_b} -> cons``
    from every frequent triple (one rule per triple member), with
    exact ``support`` (triple count) and integer-thousandths
    confidence ``conf_milli = 1000 * sup(abc) // sup(antecedent pair)``
    — the form a SQL twin can hash-match where a float ratio never
    would.

    Pair supports are computed once (:func:`basket_pair_counts`) and
    feed BOTH the Apriori pruning inside the triple pass and the
    confidence denominators. Frequent triples are a minsup-filtered
    residue (small by construction); under ``driver_max_triples`` they
    collect and the <= 3x|triples| needed pair supports arrive via a
    broadcast-key filter over the pair-counts dataset — no join
    shuffle. The distributed over-the-gate path is deliberately NOT
    built: a triple residue past 2M rows means minsup is set far too
    low for rules to be readable, and the loud error says so."""
    src = ds.select_columns([basket_col, item_col]).materialize()
    pair_counts = basket_pair_counts(
        src, basket_col, item_col,
        max_basket_size=max_basket_size, num_buckets=num_buckets,
    ).materialize()

    triples = frequent_triples(
        ds, basket_col, item_col,
        minsup=minsup, max_basket_size=max_basket_size,
        num_buckets=num_buckets,
    ).materialize()
    n_tri = triples.count()
    if n_tri == 0:
        return ray.data.from_arrow(RULE_SCHEMA.empty_table())
    if n_tri > driver_max_triples:
        raise ValueError(
            f"association_rules: {n_tri} frequent triples exceed "
            f"driver_max_triples={driver_max_triples}; raise minsup"
        )
    tri = triples.to_pandas()

    need = set()
    for a, b, c in zip(tri["item_a"], tri["item_b"], tri["item_c"]):
        need.add((int(a), int(b)))
        need.add((int(a), int(c)))
        need.add((int(b), int(c)))
    ref = ray.put(need)

    class _PairFilter:
        def __init__(self, r):
            self._s = ray.get(r)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return b
            keep = [
                (int(x), int(y)) in self._s
                for x, y in zip(b["item_a"], b["item_b"])
            ]
            return b.loc[np.asarray(keep, bool)]

    sup = (
        pair_counts.map_batches(
            _PairFilter, fn_constructor_kwargs={"r": ref},
            batch_format="pandas", concurrency=(1, 8),
        ).to_pandas()  # bounded: <= 3 x |triples| rows
    )
    pmap = {
        (int(x), int(y)): int(n)
        for x, y, n in zip(sup["item_a"], sup["item_b"], sup["n_baskets"])
    } if len(sup) else {}

    rows = []
    for a, b, c, s in zip(
        tri["item_a"].astype(int), tri["item_b"].astype(int),
        tri["item_c"].astype(int), tri["support"].astype(int),
    ):
        for (x, y), z in (((a, b), c), ((a, c), b), ((b, c), a)):
            rows.append((x, y, z, s, 1000 * s // pmap[(x, y)]))
    out = pd.DataFrame(
        rows, columns=["ant_a", "ant_b", "cons", "support", "conf_milli"]
    )
    return ray.data.from_arrow(
        pa.Table.from_pandas(out.astype("int64"), schema=RULE_SCHEMA,
                             preserve_index=False)
    )
