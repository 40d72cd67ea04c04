"""Lexical-similarity relationship inference (J3).

Parity target: ``_infer_relationships_by_lexical_similarity``
(``/root/reference/src/knowledge_graph/entity_standardization.py:661-752``).
Reference semantics over all entity pairs (i < j in list order), for
pairs not already related in either direction:

- shared words present: let ``main_shared`` = longest shared word; if
  ``len(main_shared) >= 4`` emit one edge — direction by
  ``startswith(main_shared)`` (the non-prefix entity points at the
  prefix entity with ``"relates to"``; both-or-neither prefix ->
  ``entity1 "related to" entity2``). Pairs sharing only short words
  emit nothing (and crucially do NOT fall through to containment).
- no shared words: substring containment => ``contained-in`` entity is
  the *object* of ``"is type of"`` (the longer entity is the subject).

Distributed plan (SparkER-style token blocking, cf. PAPERS.md):

- The "relates to" family fires iff the pair shares a >=4-char word —
  exactly the token-blocking join condition. Explode entities to
  ``(token, entity)`` for tokens >=4 chars, emit pairs within each
  block (capped per block for scale), dedup pairs globally,
  verify/direction per pair.
- Containment pairs share NO word, so token blocks never find them;
  they are blocked on character 3-grams: an entity ``e1`` contained in
  ``e2`` must have its leading 3-gram among ``e2``'s 3-grams.
- Existing-pair exclusion is a symmetric anti-join against the
  distinct related-pair set.

Scale shape (mirrors ``stages/dedup.py``): every per-block reduce goes
through :func:`~.infer.bucketed_reduce` — ONE coarse-bucket shuffle
whose reducer sees many blocks at once and generates within-block
pairs VECTORIZED (:func:`~.dedup._pair_indices_by_size` templates for
the word blocks, a C-level ``pandas.merge`` cross product + elementwise
``np.char.find`` containment for the 3-gram blocks). Never
``groupby(key).map_groups`` (one Python task per distinct token/gram —
millions at corpus scale) and never Ray's native multi-key
``groupby().count()`` for pair dedup (measured ~30x slower than a
bucketed ``drop_duplicates`` — NOTES.md item 9).

``mode="exact"`` replicates the reference loop on the driver
(deterministic ``sorted(entities)`` order) — used for parity tests and
small graphs; ``mode="blocked"`` is the scale path; ``"auto"`` picks
by entity count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

EXACT_THRESHOLD = 1200

_NO_CAP = 1 << 62


def _pair_rules(e1: str, e2: str) -> tuple[str, str, str] | None:
    """Reference pair logic; returns (subject, predicate, object) or None.

    ``e1`` must come before ``e2`` in the canonical processing order
    (determines the subject of the symmetric "related to" edge).
    """
    if e1 == e2:
        return None
    l1, l2 = e1.lower(), e2.lower()
    w1, w2 = set(l1.split()), set(l2.split())
    shared = w1 & w2
    if shared:
        main = max(shared, key=lambda w: (len(w), w))
        if len(main) < 4:
            return None
        s1 = l1.startswith(main)
        s2 = l2.startswith(main)
        if s1 and not s2:
            return (e2, "relates to", e1)
        if s2 and not s1:
            return (e1, "relates to", e2)
        return (e1, "related to", e2)
    if l1 in l2:
        return (e2, "is type of", e1)
    if l2 in l1:
        return (e1, "is type of", e2)
    return None


def _exact_lexical(
    entities: list[str], existing_pairs: set[tuple[str, str]]
) -> list[tuple[str, str, str]]:
    out: list[tuple[str, str, str]] = []
    ents = sorted(entities)
    for i, e1 in enumerate(ents):
        for e2 in ents[i + 1 :]:
            if (e1, e2) in existing_pairs or (e2, e1) in existing_pairs:
                continue
            r = _pair_rules(e1, e2)
            if r is not None:
                out.append(r)
    return out


def _word_block_pairs(g: pd.DataFrame, cap: int | None) -> pd.DataFrame:
    """Within-block upper-triangle pairs for word-token blocks,
    vectorized over ALL blocks in the bucket: rows ``(key, entity)`` ->
    ``(key, e1, e2)`` with ``e1 < e2``. Pair indices come from
    :func:`~.dedup._pair_indices_by_size` size-template broadcasting —
    no per-key Python. ``cap`` bounds pairs per block (skew defense)."""
    from .dedup import _pair_indices_by_size

    empty = pd.DataFrame({"key": pd.Series(dtype=object),
                          "e1": pd.Series(dtype=object),
                          "e2": pd.Series(dtype=object)})
    if len(g) == 0:
        return empty
    g = g.drop_duplicates(["key", "entity"]).sort_values(
        ["key", "entity"], kind="stable"
    )
    codes = pd.factorize(g["key"].to_numpy())[0]  # monotonic: sorted input
    I, J = _pair_indices_by_size(codes, _NO_CAP if cap is None else cap)
    if len(I) == 0:
        return empty
    keys = g["key"].to_numpy()
    ents = g["entity"].to_numpy()
    return pd.DataFrame({"key": keys[I], "e1": ents[I], "e2": ents[J]})


def _gram_block_pairs(
    needles: pd.DataFrame, hays: pd.DataFrame, cap: int | None
) -> pd.DataFrame:
    """Containment candidates, vectorized over ALL 3-gram blocks in the
    bucket: a C-level per-key (needle x haystack) cross product via
    ``pandas.merge``, then an elementwise ``np.char.find`` substring
    check. Output ``(e1, e2)`` with ``e1 < e2``; a pair can only appear
    in its needle's leading-3-gram block, so no cross-block dups."""
    empty = pd.DataFrame({"e1": pd.Series(dtype=object),
                          "e2": pd.Series(dtype=object)})
    if len(needles) == 0 or len(hays) == 0:
        return empty
    m = needles.drop_duplicates(["key", "entity"]).merge(
        hays.drop_duplicates(["key", "entity"]), on="key", suffixes=("_n", "_h")
    )
    if cap is not None and len(m):
        m = m.groupby("key", sort=False).head(cap)
    if len(m) == 0:
        return empty
    nd = m["entity_n"].to_numpy()
    hy = m["entity_h"].to_numpy()
    neq = nd != hy
    nd, hy = nd[neq], hy[neq]
    if len(nd) == 0:
        return empty
    contained = np.char.find(
        np.char.lower(hy.astype("U")), np.char.lower(nd.astype("U"))
    ) >= 0
    nd, hy = nd[contained], hy[contained]
    if len(nd) == 0:
        return empty
    lo = nd < hy
    return pd.DataFrame({"e1": np.where(lo, nd, hy), "e2": np.where(lo, hy, nd)})


def _blocked_candidate_pairs(
    entities: ray.data.Dataset,
    *,
    max_pairs_per_block: int | None,
    num_partitions: int,
) -> ray.data.Dataset:
    """Candidate (e1, e2) pairs (e1 < e2) from word-token blocks and
    3-gram containment blocks, deduplicated. Each block family is ONE
    ``bucketed_reduce`` shuffle with vectorized within-block pair
    generation; the global pair dedup is a bucketed
    ``drop_duplicates`` (never native multi-key groupby — NOTES.md 9)."""
    from .infer import bucketed_reduce

    _empty = pa.table(
        {"key": pa.array([], pa.string()), "entity": pa.array([], pa.string())}
    )

    def _word_tokens(batch: pa.Table) -> pa.Table:
        # split + explode + per-entity dedup, all C-level (no row loop);
        # downstream _word_block_pairs sorts, so row order is free
        if len(batch) == 0:
            return _empty
        s = batch["entity"].to_pandas()
        df = pd.DataFrame(
            {"entity": s, "key": s.str.lower().str.split()}
        ).explode("key", ignore_index=True)
        df = df.dropna(subset=["key"])
        df = df[df["key"].str.len() >= 4].drop_duplicates(["entity", "key"])
        return pa.table(
            {
                "key": pa.array(df["key"].to_numpy(object), pa.string()),
                "entity": pa.array(df["entity"].to_numpy(object), pa.string()),
            }
        )

    def _gram_haystack(batch: pa.Table) -> pa.Table:
        # all 3-grams, vectorized over OFFSETS (<= max entity length
        # iterations, each a whole-column numpy char add) instead of rows
        if len(batch) == 0:
            return _empty
        s = batch["entity"].to_pandas()
        low = s.str.lower().to_numpy("U")
        width = low.dtype.itemsize // 4
        if width < 3:
            return _empty
        chars = low.view("U1").reshape(len(low), width)
        lens = np.char.str_len(low)
        ents = s.to_numpy(object)
        key_parts, ent_parts = [], []
        for i in range(width - 2):
            mask = lens >= i + 3
            if not mask.any():
                break
            gram = np.char.add(
                np.char.add(chars[mask, i], chars[mask, i + 1]), chars[mask, i + 2]
            )
            key_parts.append(gram.astype(object))
            ent_parts.append(ents[mask])
        if not key_parts:
            return _empty
        return pa.table(
            {
                "key": pa.array(np.concatenate(key_parts), pa.string()),
                "entity": pa.array(np.concatenate(ent_parts), pa.string()),
            }
        )

    def _gram_needle(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _empty
        s = batch["entity"].to_pandas()
        le = s.str.lower()
        mask = (le.str.len() >= 3).to_numpy()
        return pa.table(
            {
                "key": pa.array(le.str[:3].to_numpy(object)[mask], pa.string()),
                "entity": pa.array(s.to_numpy(object)[mask], pa.string()),
            }
        )

    pair_schema = pa.schema([("e1", pa.string()), ("e2", pa.string())])

    word_blocks = entities.map_batches(_word_tokens, batch_format="pyarrow")
    word_pairs = bucketed_reduce(
        word_blocks,
        ["key"],
        lambda g: _word_block_pairs(g, max_pairs_per_block)[["e1", "e2"]],
        pair_schema,
        num_buckets=num_partitions,
    )

    hay = entities.map_batches(_gram_haystack, batch_format="pyarrow").map_batches(
        lambda b: b.append_column("role", pa.array(["h"] * len(b), pa.string())),
        batch_format="pyarrow",
    )
    needle = entities.map_batches(_gram_needle, batch_format="pyarrow").map_batches(
        lambda b: b.append_column("role", pa.array(["n"] * len(b), pa.string())),
        batch_format="pyarrow",
    )
    contain_pairs = bucketed_reduce(
        hay.union(needle),
        ["key"],
        lambda g: _gram_block_pairs(
            g.loc[g["role"] == "n", ["key", "entity"]],
            g.loc[g["role"] == "h", ["key", "entity"]],
            max_pairs_per_block,
        ),
        pair_schema,
        num_buckets=num_partitions,
    )

    # Global pair dedup (a pair can be found by many blocks) — map-side
    # combiner + one bucketed shuffle.
    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["e1", "e2"])

    return bucketed_reduce(
        word_pairs.union(contain_pairs),
        ["e1", "e2"],
        _dd,
        pair_schema,
        combiner=_dd,
        num_buckets=num_partitions,
    )


def infer_lexical_fast(
    entities: list[str],
    existing_pairs: set[tuple[str, str]],
    *,
    max_pairs_per_block: int | None = 200,
    num_blocks: int = 16,
) -> ray.data.Dataset:
    """Single-shuffle blocked lexical inference over the entity residue.

    The entity list and existing-pair set are the small aggregated
    residues already on the driver (collected once for component
    labeling); only ONE distributed shuffle remains — the
    ``bucketed_reduce`` over token/3-gram block keys, whose reducer
    generates within-block candidate pairs VECTORIZED across all the
    blocks in its bucket (no per-key Python task). Global pair dedup
    needs no second shuffle: each pair is emitted only by its canonical
    block (word pairs: the lexicographically smallest shared >=4-char
    word; containment pairs: the contained entity's leading 3-gram —
    unique by construction), and the existing-pair exclusion is a
    broadcast filter. Caps per block bound degenerate blocks (skew
    defense).
    """
    from .infer import _ensure_lineage, bucketed_reduce

    ent_tbl = pa.table({"entity": pa.array(sorted(set(entities)), pa.string())})
    ds = ray.data.from_arrow(ent_tbl)
    if ds.num_blocks() < num_blocks:
        ds = ds.repartition(num_blocks)

    def _explode(batch: pa.Table) -> pa.Table:
        keys, ents, roles = [], [], []
        for e in batch["entity"].to_pylist():
            le = e.lower()
            for w in set(le.split()):
                if len(w) >= 4:
                    keys.append(w)
                    ents.append(e)
                    roles.append("w")
            if len(le) >= 3:
                keys.append("g:" + le[:3])
                ents.append(e)
                roles.append("n")
            seen = set()
            for i in range(max(0, len(le) - 2)):
                g = le[i : i + 3]
                if g not in seen:
                    seen.add(g)
                    keys.append("g:" + g)
                    ents.append(e)
                    roles.append("h")
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "entity": pa.array(ents, pa.string()),
                "role": pa.array(roles, pa.string()),
            }
        )

    def _canonical_word(e1: str, e2: str) -> str | None:
        shared = set(e1.lower().split()) & set(e2.lower().split())
        qual = sorted(w for w in shared if len(w) >= 4)
        return qual[0] if qual else None

    trip_schema = pa.schema(
        [("subject", pa.string()), ("predicate", pa.string()), ("object", pa.string())]
    )

    # Broadcast the existing-pair set through the object store; fetched
    # once per worker process via a module-level cache.
    import ray as _ray

    pairs_ref = _ray.put(existing_pairs)

    def _bucket_triples(g: pd.DataFrame) -> pd.DataFrame:
        """Per-bucket reducer: vectorized candidate generation over all
        word blocks and all 3-gram blocks in the bucket, then the
        per-candidate rule checks (bounded by the per-block caps)."""
        global _EXISTING
        if _EXISTING_REF[0] is not pairs_ref:
            _EXISTING = _ray.get(pairs_ref)
            _EXISTING_REF[0] = pairs_ref
        s_, p_, o_ = [], [], []

        def _push(rule: tuple[str, str, str] | None) -> None:
            if rule is not None:
                s_.append(rule[0])
                p_.append(rule[1])
                o_.append(rule[2])

        wp = _word_block_pairs(
            g.loc[g["role"] == "w", ["key", "entity"]], max_pairs_per_block
        )
        for key, e1, e2 in zip(wp["key"], wp["e1"], wp["e2"]):
            if _canonical_word(e1, e2) != key:
                continue  # another block owns this pair
            if (e1, e2) in _EXISTING or (e2, e1) in _EXISTING:
                continue
            _push(_pair_rules(e1, e2))

        grams = g[g["role"] != "w"]
        gp = _gram_block_pairs(
            grams.loc[grams["role"] == "n", ["key", "entity"]],
            grams.loc[grams["role"] == "h", ["key", "entity"]],
            max_pairs_per_block,
        )
        for e1, e2 in zip(gp["e1"], gp["e2"]):
            if (e1, e2) in _EXISTING or (e2, e1) in _EXISTING:
                continue
            # containment branch applies only with NO shared words
            if set(e1.lower().split()) & set(e2.lower().split()):
                continue
            _push(_pair_rules(e1, e2))

        return pd.DataFrame({"subject": s_, "predicate": p_, "object": o_})

    out = bucketed_reduce(
        ds.map_batches(_explode, batch_format="pyarrow"),
        ["key"],
        _bucket_triples,
        trip_schema,
        num_buckets=num_blocks,
    )
    return out.map_batches(
        lambda b: _ensure_lineage(
            b.append_column("inferred", pa.array([True] * len(b), pa.bool_())), "lexical"
        ),
        batch_format="pyarrow",
    )


_EXISTING: set = set()
_EXISTING_REF: list = [None]


def infer_lexical(
    triples: ray.data.Dataset,
    *,
    mode: str = "auto",
    max_pairs_per_block: int | None = 200,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Entities of ``triples`` -> inferred lexical-similarity triples
    ``(subject, predicate, object, inferred=True, stage='lexical')``."""
    from .infer import _ensure_lineage, bucketed_reduce, default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()

    # Distinct entities / distinct (subject, object) pairs via bucketed
    # drop_duplicates — never the native (multi-key) groupby (NOTES.md 9).
    def _dd_ent(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["entity"])

    def _dd_pair(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["subject", "object"])

    entities = bucketed_reduce(
        triples.select_columns(["subject"]).rename_columns({"subject": "entity"})
        .union(triples.select_columns(["object"]).rename_columns({"object": "entity"})),
        ["entity"],
        _dd_ent,
        pa.schema([("entity", pa.string())]),
        combiner=_dd_ent,
        num_buckets=num_partitions,
    )
    existing = bucketed_reduce(
        triples.select_columns(["subject", "object"]),
        ["subject", "object"],
        _dd_pair,
        pa.schema([("subject", pa.string()), ("object", pa.string())]),
        combiner=_dd_pair,
        num_buckets=num_partitions,
    )

    if mode == "auto":
        n = entities.count()
        mode = "exact" if n <= EXACT_THRESHOLD else "blocked"

    if mode == "exact":
        ents = [r["entity"] for r in entities.take_all()]
        pairs = {(r["subject"], r["object"]) for r in existing.take_all()}
        rows = _exact_lexical(ents, pairs)
        if not rows:
            tbl = pa.table(
                {
                    "subject": pa.array([], pa.string()),
                    "predicate": pa.array([], pa.string()),
                    "object": pa.array([], pa.string()),
                }
            )
        else:
            s, p, o = zip(*rows)
            tbl = pa.table(
                {
                    "subject": pa.array(list(s), pa.string()),
                    "predicate": pa.array(list(p), pa.string()),
                    "object": pa.array(list(o), pa.string()),
                }
            )
        out = ray.data.from_arrow(tbl)
    else:
        cand = _blocked_candidate_pairs(
            entities,
            max_pairs_per_block=max_pairs_per_block,
            num_partitions=num_partitions,
        ).materialize()  # small pair residue; also guards the empty case
        if cand.count() == 0:
            empty = pa.table(
                {
                    "subject": pa.array([], pa.string()),
                    "predicate": pa.array([], pa.string()),
                    "object": pa.array([], pa.string()),
                }
            )
            cand = None
            out = ray.data.from_arrow(empty)
            return out.map_batches(
                lambda b: _ensure_lineage(
                    b.append_column("inferred", pa.array([True] * len(b), pa.bool_())),
                    "lexical",
                ),
                batch_format="pyarrow",
            )
        # Symmetric anti-join against existing related pairs —
        # cogroup_join (Dataset.join breaks on empty hash partitions).
        from .infer import sanitize_for_join
        from .relational import cogroup_join

        pair_schema = pa.schema([("e1", pa.string()), ("e2", pa.string())])
        cand = sanitize_for_join(cand, pair_schema)
        fwd = sanitize_for_join(
            existing.rename_columns({"subject": "e1", "object": "e2"}), pair_schema
        )
        rev = sanitize_for_join(
            existing.rename_columns({"object": "e1", "subject": "e2"}), pair_schema
        )
        cand = cogroup_join(
            cand, fwd, on=["e1", "e2"], how="left_anti", num_buckets=num_partitions,
            left_schema=pair_schema, right_schema=pair_schema,
        )
        cand = cogroup_join(
            cand, rev, on=["e1", "e2"], how="left_anti", num_buckets=num_partitions,
            left_schema=pair_schema, right_schema=pair_schema,
        )

        def _verify(batch: pa.Table) -> pa.Table:
            s_, p_, o_ = [], [], []
            for e1, e2 in zip(batch["e1"].to_pylist(), batch["e2"].to_pylist()):
                r = _pair_rules(e1, e2)
                if r is not None:
                    s_.append(r[0])
                    p_.append(r[1])
                    o_.append(r[2])
            return pa.table(
                {
                    "subject": pa.array(s_, pa.string()),
                    "predicate": pa.array(p_, pa.string()),
                    "object": pa.array(o_, pa.string()),
                }
            )

        out = cand.map_batches(_verify, batch_format="pyarrow")

    return out.map_batches(
        lambda b: _ensure_lineage(
            b.append_column("inferred", pa.array([True] * len(b), pa.bool_())), "lexical"
        ),
        batch_format="pyarrow",
    )
