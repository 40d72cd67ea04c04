"""Fuzzy string self-join: all pairs within Levenshtein distance 1.

The reference's entity standardization matches variants by normalized
keys, word subsets, and 4-char stem prefixes
(`src/knowledge_graph/entity_standardization.py:86-151`); it has no
typo-tolerant matcher. A web-scale curation pipeline needs one — OCR
noise, near-identical boilerplate ids, entity-name typos — and the
naive form is an all-pairs O(n^2) edit-distance scan.

This module implements the classic FastSS / deletion-neighborhood
blocking scheme (Bocek et al., "Fast Similarity Search in Large
Dictionaries", 2007 — public): two strings with lev(a, b) <= 1 must
share a member of their depth-1 deletion neighborhoods (the string
itself plus every single-character deletion). So:

- explode each DISTINCT string into its <= len+1 deletion variants
  (vectorized per length group via fixed-width char matrices — no
  per-string Python loop),
- ONE bucketed shuffle keyed on the variant; within each bucket,
  candidate pairs come from the same sorted-run pair-template
  generator dedup.py uses (``cap`` bounds per-variant blowup — skew
  defense for heavy shared prefixes),
- dedup candidates across variants (map-side combiner + one bucketed
  exchange), then a map-only VECTORIZED lev<=1 verification
  (fixed-width char-matrix compare; no Python-level edit-distance
  loop) keeps exactly the true pairs.

Shared-variant blocking guarantees candidates have lev <= 2, so the
verifier only needs the lev<=1 decision procedure: equal lengths ->
at most one mismatching position; lengths off by one -> the longer
string minus one char equals the shorter (prefix/suffix match around
the first mismatch).

The result is exact — the DuckDB oracle is a literal
``levenshtein(a, b) <= 1`` cross self-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce, normalize_blocks

FUZZY_PAIR_SCHEMA = pa.schema([("name_a", pa.string()), ("name_b", pa.string())])

_VARIANT_SCHEMA = pa.schema([("variant", pa.string()), ("name", pa.string())])


def _char_matrix(strs: np.ndarray, length: int) -> np.ndarray:
    """(n, length) single-char matrix of equal-length strings."""
    return np.asarray(strs, dtype=f"U{length}").view("U1").reshape(len(strs), length)


def _deletion_variants(strs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """``(variant, original)`` arrays: each string itself plus every
    single-character deletion. Vectorized per length group; the only
    Python loop is over distinct lengths x positions."""
    strs = np.asarray(strs, dtype=object)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=len(strs))
    out_v = [strs]  # depth-0: the string itself
    out_o = [strs]
    for L in np.unique(lens):
        L = int(L)
        if L == 0:
            continue
        grp = strs[lens == L]
        if L == 1:
            out_v.append(np.full(len(grp), "", dtype=object))
            out_o.append(grp)
            continue
        chars = _char_matrix(grp, L)
        for i in range(L):
            var = (
                np.ascontiguousarray(np.hstack((chars[:, :i], chars[:, i + 1 :])))
                .view(f"U{L - 1}")
                .reshape(len(grp))
            )
            out_v.append(var.astype(object))
            out_o.append(grp)
    return np.concatenate(out_v), np.concatenate(out_o)


def _lev_le1_equal_len(a: np.ndarray, b: np.ndarray, L: int) -> np.ndarray:
    if L == 0:
        return np.ones(len(a), dtype=bool)
    A, B = _char_matrix(a, L), _char_matrix(b, L)
    return (A != B).sum(axis=1) <= 1


def _lev_le1_off_by_one(a: np.ndarray, b: np.ndarray, L: int) -> np.ndarray:
    """a has length L, b has length L+1: is b == a with one insert?"""
    if L == 0:
        return np.ones(len(a), dtype=bool)
    A = _char_matrix(a, L)
    B = _char_matrix(b, L + 1)
    eq1 = A == B[:, :L]
    # first position where a and b disagree (L when b = a + trailing char)
    p = np.where(eq1.all(axis=1), L, np.argmin(eq1, axis=1))
    eq2 = A == B[:, 1:]
    # suffix_all[:, j] == eq2[:, j:].all(); sentinel True column at L
    suffix_all = np.ones((len(a), L + 1), dtype=bool)
    suffix_all[:, :L] = np.logical_and.accumulate(eq2[:, ::-1], axis=1)[:, ::-1]
    return suffix_all[np.arange(len(a)), p]


def lev_le1_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized ``levenshtein(a, b) <= 1`` for string arrays —
    processed per (len(a), len(b)) group with fixed-width char
    matrices, no per-pair Python edit-distance."""
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    la = np.fromiter((len(s) for s in a), dtype=np.int64, count=len(a))
    lb = np.fromiter((len(s) for s in b), dtype=np.int64, count=len(b))
    # orient: s = shorter, t = longer
    swap = la > lb
    s, t = a.copy(), b.copy()
    s[swap], t[swap] = b[swap], a[swap]
    ls, lt = np.minimum(la, lb), np.maximum(la, lb)
    out = np.zeros(len(a), dtype=bool)
    eq = ls == lt
    for L in np.unique(ls[eq]):
        m = eq & (ls == L)
        out[m] = _lev_le1_equal_len(s[m], t[m], int(L))
    off1 = lt == ls + 1
    for L in np.unique(ls[off1]):
        m = off1 & (ls == L)
        out[m] = _lev_le1_off_by_one(s[m], t[m], int(L))
    return out


def fuzzy_pairs(
    ds: ray.data.Dataset,
    col: str,
    *,
    per_variant_cap: int = 1_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """All DISTINCT value pairs of ``ds[col]`` with Levenshtein
    distance <= 1, as ``(name_a, name_b)`` with ``name_a < name_b``.

    One bucketed exchange over deletion variants + one over candidate
    pairs; verification is map-only. ``per_variant_cap`` bounds pair
    generation under a hot shared variant (skew defense; capping can
    drop true pairs for variants shared by > ~sqrt(2*cap) strings —
    raise it if exactness under extreme skew matters more than memory).
    """
    distinct = bucketed_reduce(
        ds.select_columns([col]),
        [col],
        lambda g: g.drop_duplicates([col]),
        pa.schema([(col, pa.string())]),
        combiner=lambda b: b.drop_duplicates([col]),
        num_buckets=num_buckets,
    )

    def _variants(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"variant": pd.Series(dtype=object), "name": pd.Series(dtype=object)}
            )
        v, o = _deletion_variants(b[col].to_numpy(dtype=object))
        return pd.DataFrame({"variant": v, "name": o})

    variants = distinct.map_batches(_variants, batch_format="pandas", batch_size=None)

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["variant"].to_numpy(dtype=object)
        names = g["name"].to_numpy(dtype=object)
        order = np.lexsort((names, keys))
        keys, names = keys[order], names[order]
        dup = np.zeros(len(keys), dtype=bool)
        if len(keys):
            dup[1:] = (keys[1:] == keys[:-1]) & (names[1:] == names[:-1])
        keys, names = keys[~dup], names[~dup]
        from .dedup import _pair_indices_by_size

        codes = pd.factorize(keys)[0]
        I, J = _pair_indices_by_size(codes, cap=per_variant_cap)
        a, b = names[I], names[J]
        # candidates from a shared variant have |len diff| <= 2; only
        # <= 1 can verify — drop the rest before the pair-dedup exchange
        la = np.fromiter((len(x) for x in a), dtype=np.int64, count=len(a))
        lb = np.fromiter((len(x) for x in b), dtype=np.int64, count=len(b))
        keep = np.abs(la - lb) <= 1
        a, b = a[keep], b[keep]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pd.DataFrame({"name_a": lo, "name_b": hi}).drop_duplicates()

    cand = bucketed_reduce(
        variants, ["variant"], _bucket_pairs, FUZZY_PAIR_SCHEMA, num_buckets=num_buckets
    )

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["name_a", "name_b"])

    cand = bucketed_reduce(
        cand, ["name_a", "name_b"], _dd, FUZZY_PAIR_SCHEMA, combiner=_dd,
        num_buckets=num_buckets,
    )

    def _verify(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        ok = lev_le1_mask(
            b["name_a"].to_numpy(dtype=object), b["name_b"].to_numpy(dtype=object)
        )
        return b[ok]

    return normalize_blocks(
        cand.map_batches(_verify, batch_format="pandas", batch_size=None),
        FUZZY_PAIR_SCHEMA,
    )


def record_linkage(
    ds: ray.data.Dataset,
    name_col: str,
    attrs: list[tuple[str, int, int]],
    *,
    name_weight: int = 12,
    per_variant_cap: int = 1_000_000,
    entity_broadcast_max: int = 5_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Fellegi-Sunter-style record-linkage scoring: candidate pairs
    from the FastSS lev<=1 name block, then an integer agreement
    score over ``attrs`` — ``score = name_weight + Σ (agree ?
    w_agree : w_disagree)`` per ``(col, w_agree, w_disagree)``.
    Integer log-odds-shaped weights keep the score hash-exact.

    Output ``(name_a, name_b, score)`` with ``name_a < name_b``.
    Requires ``name_col`` to be unique in ``ds`` (a keyed entity
    table); the two attribute joins move only the candidate pairs
    and the entity table's key+attr columns, never a cross product.
    """
    from .relational import cogroup_join

    attr_cols = [c for c, _, _ in attrs]
    pairs = fuzzy_pairs(
        ds, name_col, per_variant_cap=per_variant_cap, num_buckets=num_buckets
    )

    ent_schema = pa.schema(
        [(name_col, pa.string())] + [(c, pa.string()) for c in attr_cols]
    )

    def _ent(side: str):
        def _f(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(index=b.index)
            out[f"name_{side}"] = (
                b[name_col].astype(str) if name_col in b.columns
                else pd.Series([], dtype="object")
            )
            for c in attr_cols:
                out[f"{side}_{c}"] = (
                    b[c].astype(str) if c in b.columns
                    else pd.Series([], dtype="object")
                )
            return out

        return _f

    def _side_schema(side: str) -> pa.Schema:
        return pa.schema(
            [(f"name_{side}", pa.string())]
            + [(f"{side}_{c}", pa.string()) for c in attr_cols]
        )

    base = ds.select_columns([name_col] + attr_cols)
    ent_a = base.map_batches(_ent("a"), batch_format="pandas")
    ent_b = base.map_batches(_ent("b"), batch_format="pandas")

    pair_schema = pa.schema([("name_a", pa.string()), ("name_b", pa.string())])
    j_schema = pa.schema(
        list(pair_schema) + [(f"a_{c}", pa.string()) for c in attr_cols]
    )
    # entity attributes are a keyed dimension table: broadcast under
    # the gate (zero shuffle), partitioned join above it — two sort
    # exchanges removed from the common case. broadcast_join counts
    # its right side itself; over-gate it refuses and we fall back.
    try:
        from .relational import broadcast_join

        j = broadcast_join(
            pairs, ent_a, ["name_a"], broadcast_max_rows=entity_broadcast_max
        )
        j = broadcast_join(
            j, ent_b, ["name_b"], broadcast_max_rows=entity_broadcast_max
        )
    except ValueError:
        # pair set arrives as many tiny reduce slivers — coalesce
        # before each exchange (block count IS the sort-shuffle cost)
        j = cogroup_join(
            pairs, ent_a, ["name_a"],
            left_schema=pair_schema, right_schema=_side_schema("a"),
            num_buckets=num_buckets, coalesce=16,
        )
        j = cogroup_join(
            j, ent_b, ["name_b"],
            left_schema=j_schema, right_schema=_side_schema("b"),
            num_buckets=num_buckets, coalesce=16,
        )

    out_schema = pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string()), ("score", pa.int64())]
    )

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "name_a" not in b.columns:
            return pd.DataFrame(
                {"name_a": pd.Series([], dtype="object"),
                 "name_b": pd.Series([], dtype="object"),
                 "score": pd.Series([], dtype="int64")}
            )
        score = np.full(len(b), name_weight, dtype=np.int64)
        for c, w_agree, w_dis in attrs:
            agree = (b[f"a_{c}"] == b[f"b_{c}"]).to_numpy()
            score += np.where(agree, w_agree, w_dis)
        return pd.DataFrame(
            {"name_a": b["name_a"], "name_b": b["name_b"], "score": score}
        )

    from .infer import normalize_blocks

    return normalize_blocks(
        j.map_batches(_score, batch_format="pandas", batch_size=None), out_schema
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (the other classic linkage blocker)
# ---------------------------------------------------------------------------

SNB_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("dist", pa.int64())]
)


def sorted_neighborhood_pairs(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str,
    *,
    window: int = 5,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Candidate pairs under sorted-neighborhood blocking: sort the
    table by ``(key_col, id_col)`` and emit every pair of rows whose
    positions differ by less than ``window`` — the classic complement
    to equality/FastSS blocking when near-duplicates share a PREFIX
    (typos near the end, numbering suffixes) rather than an exact
    block key. SQL-oracle-exact (row_number self-join).

    Scale shape: :func:`~.relational.row_positions` assigns global
    positions (one sort exchange, nothing collected); rows then land
    in position buckets of width ``window`` and EACH ROW IS ALSO SENT
    TO THE PREVIOUS BUCKET, so every in-window pair is generated
    exactly once, in its anchor's home bucket, from consecutive
    integer positions — pair generation is index arithmetic, no
    per-pair Python. Output pairs are ``O(n * window)`` by
    construction; window is the skew defense."""
    from .relational import row_positions

    if window < 2:
        raise ValueError("window must be >= 2")
    w = int(window)

    pos = row_positions(
        ds.select_columns([key_col, id_col]), [key_col, id_col], pos_col="pos"
    )

    def _emit(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "bucket": pd.Series(dtype="int64"),
                    "pos": pd.Series(dtype="int64"),
                    "rid": pd.Series(dtype="int64"),
                }
            )
        p = b["pos"].to_numpy().astype(np.int64)
        rid = b[id_col].to_numpy().astype(np.int64)
        home = p // w
        prev_mask = home > 0
        return pd.DataFrame(
            {
                "bucket": np.concatenate([home, home[prev_mask] - 1]),
                "pos": np.concatenate([p, p[prev_mask]]),
                "rid": np.concatenate([rid, rid[prev_mask]]),
            }
        )

    tagged = pos.map_batches(_emit, batch_format="pandas")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return SNB_SCHEMA.empty_table().to_pandas()
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for bkt, grp in g.groupby("bucket", sort=False):
            grp = grp.sort_values("pos", kind="stable")
            p = grp["pos"].to_numpy()
            rid = grp["rid"].to_numpy()
            base = int(bkt) * w
            # positions are consecutive ints: index i holds p0 + i
            anchors = np.flatnonzero(p // w == int(bkt))
            for d in range(1, w):
                a = anchors[anchors + d < len(p)]
                if len(a) == 0:
                    continue
                out_a.append(rid[a])
                out_b.append(rid[a + d])
                out_d.append(np.full(len(a), d, dtype=np.int64))
        if not out_a:
            return SNB_SCHEMA.empty_table().to_pandas()
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "dist": np.concatenate(out_d),
            }
        )

    from .infer import bucketed_reduce, normalize_blocks

    return normalize_blocks(
        bucketed_reduce(tagged, ["bucket"], _pairs, SNB_SCHEMA,
                        num_buckets=num_buckets),
        SNB_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Phonetic (Soundex) coding with Python/DuckDB dialect parity
# ---------------------------------------------------------------------------

# The variant implemented is "simplified Soundex": uppercase, strip
# non-letters, code ALL letters (vowels/H/W -> 0), collapse adjacent
# equal digits, drop the first digit (the first letter codes itself),
# remove zeros, first letter + first 3 digits zero-padded. The digit
# collapse uses per-digit '11+' -> '1' replaces because RE2 (DuckDB's
# engine) has no backreferences; pandas runs the IDENTICAL step list,
# so the two dialects cannot drift (the pii_redact discipline).
_SOUNDEX_DIGIT_STEPS: list[tuple[str, str]] = [
    ("[BFPV]", "1"),
    ("[CGJKQSXZ]", "2"),
    ("[DT]", "3"),
    ("L", "4"),
    ("[MN]", "5"),
    ("R", "6"),
    ("[AEIOUYHW]", "0"),
] + [(f"{d}{d}+", str(d)) for d in range(7)]


def soundex_series(s: pd.Series) -> pd.Series:
    """Vectorized simplified-Soundex codes ('' for letterless input)."""
    u = s.fillna("").astype(str).str.upper().str.replace("[^A-Z]", "", regex=True)
    d = u
    for pat, rep in _SOUNDEX_DIGIT_STEPS:
        d = d.str.replace(pat, rep, regex=True)
    tail = (
        d.str[1:]
        .str.replace("0", "", regex=False)
        .str[:3]
        .str.pad(3, "right", "0")
    )
    return (u.str[:1] + tail).where(u.str.len() > 0, "")


def soundex_sql_expr(col: str) -> str:
    """The same transform chain as :func:`soundex_series`, rendered as
    a DuckDB expression over ``col``."""
    u = f"regexp_replace(upper(coalesce({col}, '')), '[^A-Z]', '', 'g')"
    d = u
    for pat, rep in _SOUNDEX_DIGIT_STEPS:
        d = f"regexp_replace({d}, '{pat}', '{rep}', 'g')"
    tail = f"rpad(substr(replace(substr({d}, 2), '0', ''), 1, 3), 3, '0')"
    return (
        f"CASE WHEN length({u}) = 0 THEN '' "
        f"ELSE substr({u}, 1, 1) || {tail} END"
    )


def soundex_codes(
    ds: ray.data.Dataset,
    name_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """``(id, soundex)`` — map-only phonetic blocking keys, the third
    classic linkage blocker beside FastSS (typo-shaped) and
    sorted-neighborhood (prefix-shaped): phonetic equivalence catches
    spelling variants that keep the sound (SMYTH ~ SMITH)."""
    out_schema = pa.schema([(id_col, pa.int64()), ("soundex", pa.string())])

    def _code(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 "soundex": pd.Series(dtype="object")}
            )
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy().astype(np.int64),
                "soundex": soundex_series(b[name_col]),
            }
        )

    from .infer import normalize_blocks

    return normalize_blocks(
        ds.select_columns([id_col, name_col]).map_batches(
            _code, batch_format="pandas"
        ),
        out_schema,
    )
