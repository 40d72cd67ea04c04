"""Phase 2 — entity canonicalization (standardization).

Behavior parity with ``standardize_entities``
(``/root/reference/src/knowledge_graph/entity_standardization.py:33-181``),
re-expressed Ray-Data-first:

1. **Entity frequency** (G1/G2): distributed two-level aggregation —
   per-batch partial ``value_counts`` over subject+object (this
   combine step is the skew defense: a hot entity collapses to one
   partial row per batch before the shuffle) then a small
   ``groupby(entity).sum``.
2. **Canonical-form election** (G3 + second pass): runs on the
   aggregated ``(entity, count)`` residue — entity cardinality is
   orders of magnitude below triple cardinality (reference README run:
   216 triples -> 201 entities; web scale: vocabulary-bounded). The
   election algorithm is a pure, unit-testable driver function that
   replicates the reference exactly: variants grouped by the
   stop-word-stripped ``norm_key``; representative = max count, tie ->
   shortest, tie -> first in ``(-len, entity)`` processing order;
   second pass merges standard forms by word-subset and 4-char-stem
   overlap (> 0.5) in ``(len, entity)`` order (the reference iterates
   a set here — nondeterministic across processes; we fix a
   deterministic total order, covered by the P/R tolerance).
3. **Alias application** (J1): the alias map is broadcast once via
   ``ray.put`` and applied inside ``map_batches`` (map-side hash
   join — no shuffle). ``subject``/``object`` are looked up by their
   lowercased form, falling back to the original string (reference
   ``:160-166``); predicates re-limited to 3 words; self-loops dropped
   (``:175-178``).
4. **Optional LLM resolution** (A3, ``:377-449``): top-100 entities by
   frequency -> one model call -> mapping broadcast and applied.

Scale note: when the alias map is too large to broadcast (billions of
entities), ``apply_alias_map_join`` switches to a shuffle hash join on
the entity key instead; the election second pass can be disabled
(``second_pass=False``) or bounded since it is O(k^2) in the number of
standard forms.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions import prompts
from ..functions.jsonx import extract_json_from_text
from ..functions.model import ChatModel, make_model
from ..functions.textnorm import limit_predicate_length, normalize_entity_key


def entity_counts(
    triples: ray.data.Dataset, weight_col: str | None = None
) -> ray.data.Dataset:
    """Distributed lower-cased entity frequency over subject+object.

    Emits ``(entity, count)``. Hot-entity skew is absorbed by the
    per-batch partial count (one row per distinct entity per batch)
    before the global groupby.

    ``weight_col``: when the input is a pre-collapsed distinct table
    (``dedup_triples_weighted``), each row counts ``weight`` times —
    the sums are then EXACTLY the raw-table frequencies.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        ents = pa.concat_arrays(
            [
                pc.utf8_lower(batch["subject"]).combine_chunks(),
                pc.utf8_lower(batch["object"]).combine_chunks(),
            ]
        )
        if weight_col is None:
            vc = ents.value_counts()
            return pa.table(
                {
                    "entity": vc.field("values"),
                    "count": pc.cast(vc.field("counts"), pa.int64()),
                }
            )
        w = batch[weight_col].combine_chunks().cast(pa.int64())
        df = pd.DataFrame(
            {
                "entity": ents.to_pandas(),
                "count": pa.concat_arrays([w, w]).to_pandas(),
            }
        )
        part = df.groupby("entity", as_index=False, sort=False)["count"].sum()
        return pa.table(
            {
                "entity": pa.array(part["entity"], pa.string()),
                "count": pa.array(part["count"], pa.int64()),
            }
        )

    cols = ["subject", "object"] + ([weight_col] if weight_col else [])
    partials = triples.select_columns(cols).map_batches(
        _partial, batch_format="pyarrow"
    )
    return partials.groupby("entity").aggregate(Sum("count", alias_name="count"))


def elect_canonical(entity_count_pairs: list[tuple[str, int]], second_pass: bool = True) -> dict[str, str]:
    """Reference-exact canonical-form election over the aggregated
    ``(lowercased entity, count)`` residue. Returns variant->standard.
    """
    counts = dict(entity_count_pairs)
    # Processing order: longer entities first (reference :86).
    sorted_entities = sorted(counts, key=lambda x: (-len(x), x))

    groups: dict[str, list[str]] = defaultdict(list)
    for entity in sorted_entities:
        key = normalize_entity_key(entity)
        if key:
            groups[key].append(entity)

    alias: dict[str, str] = {}
    for variants in groups.values():
        if len(variants) == 1:
            alias[variants[0]] = variants[0]
        else:
            standard = sorted(variants, key=lambda v: (-counts.get(v, 0), len(v)))[0]
            for v in variants:
                alias[v] = standard

    if second_pass:
        standard_forms = set(alias.values())
        # Deterministic total order (reference iterates a set: (len) only).
        sorted_standards = sorted(standard_forms, key=lambda x: (len(x), x))
        extra: dict[str, str] = {}
        for i, e1 in enumerate(sorted_standards):
            w1 = set(e1.split())
            for e2 in sorted_standards[i + 1 :]:
                if e1 == e2:
                    continue
                w2 = set(e2.split())
                if w1.issubset(w2) and len(w1) > 0:
                    extra[e2] = e1
                elif w2.issubset(w1) and len(w2) > 0:
                    extra[e1] = e2
                else:
                    stems1 = {w[:4] for w in w1 if len(w) > 4}
                    stems2 = {w[:4] for w in w2 if len(w) > 4}
                    shared = stems1 & stems2
                    if shared and (len(shared) / max(len(stems1), len(stems2))) > 0.5:
                        if len(e1) <= len(e2):
                            extra[e2] = e1
                        else:
                            extra[e1] = e2
        # One-level application, exactly like the reference (:153-155):
        # alias chains A->B->C are deliberately NOT collapsed.
        alias.update(extra)
    return alias


def elect_canonical_distributed(
    entities: ray.data.Dataset, *, num_buckets: int | None = None
) -> ray.data.Dataset:
    """First-pass canonical election fully distributed — the scale
    path for entity sets too large to collect (billions of variants).

    ``groupby(norm_key)`` with a vectorized per-bucket election using
    the exact driver tie-break ``(-count, len(variant), variant)``
    (identical to :func:`elect_canonical` with ``second_pass=False`` —
    equivalence-tested). The O(k^2) global subset/stem second pass is
    driver-only by nature (the reference compares ALL standard-form
    pairs); at this scale it is intentionally unavailable — enable it
    only when the residue fits the driver.

    Input: ``(entity, count)`` (lowercased). Output: ``(variant,
    standard)`` alias rows, applied with :func:`apply_alias_map_join`.
    """
    from .infer import bucketed_reduce, default_num_partitions

    if num_buckets is None:
        num_buckets = default_num_partitions()

    alias_schema = pa.schema([("variant", pa.string()), ("standard", pa.string())])

    def _with_key(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch.assign(norm_key=pd.Series([], dtype="object"))
        b = batch.copy()
        b["norm_key"] = [normalize_entity_key(e) for e in b["entity"]]
        return b[b["norm_key"] != ""]

    def _elect(g: pd.DataFrame) -> pd.DataFrame:
        b = g.sort_values("entity", kind="stable")
        b = b.assign(__len=b["entity"].str.len(), __neg=-b["count"].astype("int64"))
        b = b.sort_values(["norm_key", "__neg", "__len", "entity"], kind="stable")
        standards = b.drop_duplicates("norm_key", keep="first")[["norm_key", "entity"]]
        out = b.merge(standards.rename(columns={"entity": "standard"}), on="norm_key")
        return out.rename(columns={"entity": "variant"})[["variant", "standard"]]

    return bucketed_reduce(
        entities.map_batches(_with_key, batch_format="pandas"),
        ["norm_key"],
        _elect,
        alias_schema,
        num_buckets=num_buckets,
    )


def apply_alias_map_join(
    triples: ray.data.Dataset,
    alias: ray.data.Dataset,
    *,
    drop_self_loops: bool = True,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Alias application as a shuffle hash join — for alias maps too
    large to broadcast. Joins on the lowercased subject, then the
    lowercased object; predicate limit + self-loop filter as in the
    broadcast path."""
    from .infer import LINEAGE_SCHEMA, sanitize_for_join, with_lineage
    from .relational import cogroup_join

    alias_schema = pa.schema([("variant", pa.string()), ("standard", pa.string())])
    alias = sanitize_for_join(alias, alias_schema)
    base = with_lineage(triples, "extracted")

    # carry non-lineage passthrough columns (e.g. the weighted-collapse
    # ``weight``) through the join untouched
    try:
        in_names = list(base.schema().names)
    except Exception:
        in_names = list(LINEAGE_SCHEMA.names)
    extra_fields = [
        pa.field("weight", pa.int64())
        for n in ["weight"]
        if n in in_names and n not in LINEAGE_SCHEMA.names
    ]
    work_schema = pa.schema(
        list(LINEAGE_SCHEMA) + extra_fields + [pa.field("__k", pa.string())]
    )

    def _key_on(col: str):
        def _f(batch: pa.Table) -> pa.Table:
            vals = [
                (v.lower() if v is not None else v)
                for v in batch[col].to_pylist()
            ]
            if "__k" in batch.column_names:
                batch = batch.drop_columns(["__k"])
            return batch.append_column("__k", pa.array(vals, pa.string()))

        return _f

    out = base
    for col in ("subject", "object"):
        out = sanitize_for_join(
            out.map_batches(_key_on(col), batch_format="pyarrow"), work_schema
        )
        joined = cogroup_join(
            out,
            alias.rename_columns({"variant": "__k"}),
            on=["__k"],
            how="inner",
            num_buckets=num_buckets,
            left_schema=work_schema,
            right_schema=pa.schema([("__k", pa.string()), ("standard", pa.string())]),
        )
        # left rows with no alias fall back to the original value:
        misses = cogroup_join(
            out,
            alias.rename_columns({"variant": "__k"}),
            on=["__k"],
            how="left_anti",
            num_buckets=num_buckets,
            left_schema=work_schema,
            right_schema=pa.schema([("__k", pa.string()), ("standard", pa.string())]),
        )

        def _take_standard(batch: pa.Table, c=col) -> pa.Table:
            idx = batch.schema.get_field_index(c)
            return batch.set_column(idx, c, batch["standard"]).drop_columns(
                ["standard"]
            )

        out = joined.map_batches(_take_standard, batch_format="pyarrow").union(misses)
        out = out.map_batches(
            lambda b: b.drop_columns(["__k"]) if "__k" in b.column_names else b,
            batch_format="pyarrow",
        )

    def _finish(batch: pa.Table) -> pa.Table:
        preds = pa.array(
            [limit_predicate_length(p) for p in batch["predicate"].to_pylist()],
            pa.string(),
        )
        batch = batch.set_column(
            batch.schema.get_field_index("predicate"), "predicate", preds
        )
        if drop_self_loops:
            batch = batch.filter(
                pc.invert(pc.equal(batch["subject"], batch["object"]))
            )
        return batch

    return out.map_batches(_finish, batch_format="pyarrow")


# Per-worker-process cache of the broadcast alias map: stateless map
# tasks fetch the object once per process (local object-store get),
# avoiding actor-pool spawn cost for this cheap stage.
_BCAST_CACHE: dict = {}


def _bcast_get(ref):
    if not isinstance(ref, ray.ObjectRef):
        return ref  # already resolved (Ray may materialize fn_kwargs refs)
    key = ref.hex()
    if key not in _BCAST_CACHE:
        _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def _apply_alias_batch(batch: pa.Table, alias_ref, drop_self_loops: bool) -> pa.Table:
        alias = _bcast_get(alias_ref)
        subs = [
            alias.get(s.lower(), s) if s is not None else s
            for s in batch["subject"].to_pylist()
        ]
        objs = [
            alias.get(o.lower(), o) if o is not None else o
            for o in batch["object"].to_pylist()
        ]
        preds = [limit_predicate_length(p) for p in batch["predicate"].to_pylist()]
        batch = batch.set_column(
            batch.schema.get_field_index("subject"), "subject", pa.array(subs, pa.string())
        )
        batch = batch.set_column(
            batch.schema.get_field_index("object"), "object", pa.array(objs, pa.string())
        )
        batch = batch.set_column(
            batch.schema.get_field_index("predicate"), "predicate", pa.array(preds, pa.string())
        )
        if drop_self_loops:
            batch = batch.filter(
                pc.invert(pc.equal(batch["subject"], batch["object"]))
            )
        return batch


def apply_alias_map(
    triples: ray.data.Dataset,
    alias_map: dict[str, str],
    *,
    drop_self_loops: bool = True,
) -> ray.data.Dataset:
    """Map-side broadcast hash join of the alias map onto triples
    (stateless tasks; the map is fetched once per worker process from
    the local object store — no actor-pool spawn cost)."""
    ref = ray.put(alias_map)
    return triples.map_batches(
        _apply_alias_batch,
        fn_kwargs={"alias_ref": ref, "drop_self_loops": drop_self_loops},
        batch_format="pyarrow",
    )


def llm_resolve_entities(
    entity_count_pairs: list[tuple[str, int]], model: ChatModel
) -> dict[str, str]:
    """A3: one global model call over the <=100 most frequent entities;
    returns variant->standard (empty on unusable model output, errors
    swallowed like the reference ``:446-447``)."""
    entities = [e for e, _ in entity_count_pairs]
    if len(entities) > 100:
        entities = [
            e for e, _ in sorted(entity_count_pairs, key=lambda x: -x[1])[:100]
        ]
    try:
        response = model.chat(
            prompts.get_prompt("entity_resolution_system"),
            prompts.get_prompt("entity_resolution_user", "\n".join(sorted(entities))),
        )
        mapping = extract_json_from_text(response)
        if not mapping or not isinstance(mapping, dict):
            return {}
        out: dict[str, str] = {}
        for standard, variants in mapping.items():
            for v in variants:
                out[v] = standard
            out[standard] = standard
        return out
    except Exception:
        return {}


class _ExactApplier:
    """Exact-case mapping application (LLM resolution uses exact keys,
    reference ``:437-441``); no self-loop filtering here — the
    reference filters self-loops after this step."""

    def __init__(self, map_ref) -> None:
        self.mapping: dict[str, str] = ray.get(map_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.mapping
        subs = [m.get(s, s) for s in batch["subject"].to_pylist()]
        objs = [m.get(o, o) for o in batch["object"].to_pylist()]
        batch = batch.set_column(
            batch.schema.get_field_index("subject"), "subject", pa.array(subs, pa.string())
        )
        return batch.set_column(
            batch.schema.get_field_index("object"), "object", pa.array(objs, pa.string())
        )


def _standardize_over_gate(
    triples: ray.data.Dataset,
    counts: ray.data.Dataset,
    std_cfg: dict,
    config: dict,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Scale path for entity populations too large to collect: fully
    distributed election (``elect_canonical_distributed``) + shuffle
    alias join. The O(k^2) second pass is intentionally unavailable
    here (it compares ALL standard-form pairs — driver-only by nature,
    see ``elect_canonical_distributed``); the reference's A3 resolution
    stays available because its top-100-by-frequency cap is a bounded
    local-top-k over the POST-alias counts. Returns the alias map as a
    ``(variant, standard)`` Dataset."""
    from .infer import local_topk_rows, sanitize_for_join
    from .relational import cogroup_join

    alias_schema = pa.schema([("variant", pa.string()), ("standard", pa.string())])
    alias_ds = sanitize_for_join(
        elect_canonical_distributed(counts), alias_schema
    )
    out = apply_alias_map_join(
        triples, alias_ds,
        drop_self_loops=not std_cfg.get("use_llm_for_entities", False),
    )

    if std_cfg.get("use_llm_for_entities", False):
        count_schema = pa.schema([("entity", pa.string()), ("count", pa.int64())])
        hits = cogroup_join(
            sanitize_for_join(counts, count_schema).rename_columns(
                {"entity": "variant"}
            ),
            alias_ds,
            on=["variant"],
            left_schema=pa.schema([("variant", pa.string()), ("count", pa.int64())]),
            right_schema=alias_schema,
        ).map_batches(
            lambda b: pa.table({"entity": b["standard"], "count": b["count"]}),
            batch_format="pyarrow",
        )
        misses = cogroup_join(
            sanitize_for_join(counts, count_schema).rename_columns(
                {"entity": "variant"}
            ),
            alias_ds,
            on=["variant"],
            how="left_anti",
            left_schema=pa.schema([("variant", pa.string()), ("count", pa.int64())]),
            right_schema=alias_schema,
        ).rename_columns({"variant": "entity"})
        from .relational import grouped_sums

        std_counts = grouped_sums(hits.union(misses), ["entity"], {"count": "count"})
        top = local_topk_rows(std_counts, ["count", "entity"], 100, ascending=[False, True])
        model = make_model(config)
        llm_map = llm_resolve_entities([(r["entity"], r["count"]) for r in top], model)
        if llm_map:
            out = out.map_batches(
                _ExactApplier,
                fn_constructor_kwargs={"map_ref": ray.put(llm_map)},
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
        out = out.map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b["subject"], b["object"]))),
            batch_format="pyarrow",
        )
    return out, alias_ds


def standardize_triples(
    triples: ray.data.Dataset,
    config: dict | None = None,
    *,
    weight_col: str | None = None,
) -> tuple[ray.data.Dataset, "dict[str, str] | ray.data.Dataset"]:
    """Full Phase 2 over a ``triples_raw`` dataset.

    Returns ``(standardized_triples, alias_map)``. Config keys mirror
    the reference (``standardization.use_llm_for_entities``,
    ``standardization.second_pass``) plus the residue gate
    ``standardization.residue_max_entities`` (default 5M): the
    aggregated entity population is COUNTED before it is collected;
    over the gate the fully-distributed election + shuffle alias join
    run instead and the alias map returns as a Dataset.

    ``weight_col``: input is a pre-collapsed distinct table whose rows
    carry their raw multiplicity (see ``dedup_triples_weighted``) —
    the election sees identical frequencies, the alias map is applied
    to the (much smaller) distinct table, and the weight column passes
    through to the output.
    """
    config = config or {}
    std_cfg = config.get("standardization", {})
    residue_cap = int(std_cfg.get("residue_max_entities", 5_000_000))
    counts = entity_counts(triples, weight_col=weight_col).materialize()
    if counts.count() > residue_cap:
        return _standardize_over_gate(triples, counts, std_cfg, config)
    pairs_tbl = counts.to_pandas()
    # An empty groupby result loses its columns — treat as no entities.
    if "entity" not in pairs_tbl.columns or pairs_tbl.empty:
        pairs = []
    else:
        pairs = list(zip(pairs_tbl["entity"], pairs_tbl["count"]))
    alias = elect_canonical(pairs, second_pass=std_cfg.get("second_pass", True))

    use_llm = std_cfg.get("use_llm_for_entities", False)
    # Reference order: apply alias (with predicate limit), THEN LLM
    # resolution over standardized entities, THEN self-loop filter.
    out = apply_alias_map(triples, alias, drop_self_loops=not use_llm)
    if use_llm:
        model = make_model(config)
        # Entities after standardization = images of the alias map.
        std_pairs_src: dict[str, int] = {}
        for e, c in pairs:
            std = alias.get(e, e)
            std_pairs_src[std] = std_pairs_src.get(std, 0) + int(c)
        llm_map = llm_resolve_entities(list(std_pairs_src.items()), model)
        if llm_map:
            out = out.map_batches(
                _ExactApplier,
                fn_constructor_kwargs={"map_ref": ray.put(llm_map)},
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
        out = out.map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b["subject"], b["object"]))),
            batch_format="pyarrow",
        )
    return out, alias


def incremental_standardize(
    new_triples: ray.data.Dataset,
    existing_alias: dict[str, str],
    config: dict | None = None,
) -> tuple[ray.data.Dataset, "dict[str, str] | ray.data.Dataset"]:
    """Delta canonicalization: standardize a NEW batch of raw triples
    against an already-published graph WITHOUT re-running the global
    election — the release-to-release stability contract a production
    KG needs (entity ids in the shipped graph must not flip because a
    later crawl shifted the frequency vote; the reference has no
    incremental story at all — ``finalize_graph.py`` re-standardizes
    the whole corpus every run).

    Documented semantics (pinned by tests):

    1. **Frozen aliases** — a new-batch entity whose lowercased form is
       already a key of ``existing_alias`` keeps its OLD canonical,
       even when the new batch's frequencies would elect differently.
    2. **Norm-key attach** — a novel variant whose election key
       (:func:`normalize_entity_key`) matches any existing variant's
       key joins that variant's canonical (deterministically: the
       existing index keeps the first canonical in sorted-variant
       order per key).
    3. **Novel election** — entities with unseen norm keys are elected
       among THEMSELVES by the standard G3 rules, including the
       subset/stem second pass (restricted to novels, it can never
       touch a frozen canonical; disable with
       ``standardization.second_pass=False``). The scale path runs
       first-pass only — the same documented limitation as
       ``standardize_triples`` over its gate.

    Alias application, predicate re-limit and self-loop drop are the
    standard Phase-2 behaviors. Returns ``(standardized_delta,
    combined_alias_map)`` — the combined map is the next release's
    ``existing_alias``.

    COUNT-GATED: the new batch's entity residue is counted first;
    under ``standardization.residue_max_entities`` (default 5M) the
    classification + novel election run on the driver and the combined
    map broadcasts; over it, the novel counts never land on the driver
    — the known/attach classification happens map-side against the
    broadcast existing index and the novel election runs
    ``elect_canonical_distributed``, with the combined alias returned
    as a ``(variant, standard)`` Dataset (both paths
    equivalence-tested).
    """
    from ..functions.textnorm import normalize_entity_key

    config = config or {}
    std_cfg = config.get("standardization", {})
    residue_cap = int(std_cfg.get("residue_max_entities", 5_000_000))

    # existing norm-key -> canonical index, first canonical in
    # sorted-variant order per key (deterministic across releases)
    norm_index: dict[str, str] = {}
    for variant in sorted(existing_alias):
        nk = normalize_entity_key(variant)
        if nk and nk not in norm_index:
            norm_index[nk] = existing_alias[variant]

    counts = entity_counts(new_triples).materialize()
    if counts.count() <= residue_cap:
        tbl = counts.to_pandas()
        pairs = (
            list(zip(tbl["entity"], tbl["count"]))
            if "entity" in tbl.columns and not tbl.empty
            else []
        )
        attach: dict[str, str] = {}
        novel: list[tuple[str, int]] = []
        for e, c in pairs:
            if e in existing_alias:
                continue  # rule 1: frozen
            nk = normalize_entity_key(e)
            if nk and nk in norm_index:
                attach[e] = norm_index[nk]  # rule 2: attach
            else:
                novel.append((e, c))  # rule 3: elect among novels
        elected = elect_canonical(
            novel, second_pass=std_cfg.get("second_pass", True)
        )
        combined = dict(existing_alias)
        combined.update(attach)
        combined.update(elected)
        out = apply_alias_map(new_triples, combined, drop_self_loops=True)
        return out, combined

    # ---- scale path: the novel residue never lands on the driver ----
    from .infer import sanitize_for_join

    alias_schema = pa.schema([("variant", pa.string()), ("standard", pa.string())])
    known_ref = ray.put(set(existing_alias))
    index_ref = ray.put(norm_index)

    def _classify(b: pd.DataFrame) -> pd.DataFrame:
        known = _bcast_get(known_ref)
        index = _bcast_get(index_ref)
        if len(b) == 0 or "entity" not in b.columns:
            return pd.DataFrame(
                {
                    "entity": pd.Series([], dtype="object"),
                    "count": pd.Series([], dtype="int64"),
                    "cls": pd.Series([], dtype="object"),
                    "standard": pd.Series([], dtype="object"),
                }
            )
        ents = b["entity"].astype(str)
        nks = ents.map(normalize_entity_key)
        is_known = ents.isin(known)
        attached = nks.map(index).where(nks.astype(bool), None)
        cls = np.where(is_known, "known",
                       np.where(attached.notna(), "attach", "novel"))
        return pd.DataFrame(
            {
                "entity": ents,
                "count": b["count"].astype("int64"),
                "cls": cls,
                "standard": attached.where(cls == "attach", None),
            }
        )

    classified = counts.map_batches(_classify, batch_format="pandas").materialize()
    # Arrow outputs: pandas-backed blocks break Dataset.rename_columns
    # downstream (NOTES.md sharp edge 10)
    attach_ds = classified.map_batches(
        lambda b: pa.table(
            {
                "variant": pa.array(
                    b.loc[b["cls"] == "attach", "entity"], pa.string()
                ),
                "standard": pa.array(
                    b.loc[b["cls"] == "attach", "standard"], pa.string()
                ),
            }
        ),
        batch_format="pandas",
    )
    novel_counts = classified.map_batches(
        lambda b: pa.table(
            {
                "entity": pa.array(b.loc[b["cls"] == "novel", "entity"], pa.string()),
                "count": pa.array(
                    b.loc[b["cls"] == "novel", "count"].astype("int64"), pa.int64()
                ),
            }
        ),
        batch_format="pandas",
    )
    elected_ds = elect_canonical_distributed(novel_counts)
    existing_ds = ray.data.from_arrow(
        pa.table(
            {
                "variant": pa.array(sorted(existing_alias), pa.string()),
                "standard": pa.array(
                    [existing_alias[k] for k in sorted(existing_alias)], pa.string()
                ),
            }
        )
    )
    alias_ds = sanitize_for_join(
        existing_ds.union(attach_ds).union(elected_ds), alias_schema
    ).materialize()
    out = apply_alias_map_join(new_triples, alias_ds, drop_self_loops=True)
    return out, alias_ds
