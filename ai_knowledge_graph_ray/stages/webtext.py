"""Webtext corpus-hygiene operators for training-data pipelines:
CCNet-style cross-document line dedup, GPT-3-style n-gram test-set
decontamination, Gopher-style repetition signals, and PII redaction.

The reference repo (sixscripts-ai/ai-knowledge-graph) has no corpus-
hygiene layer; these extend the SURVEY §2 LLM-data-pipeline family
with the standard public webtext operators (CCNet line-level dedup,
GPT-3 appendix-C n-gram decontamination, Gopher repetition filters,
regex PII scrubbing), expressed Ray-Data-first:

- Per-document signals (:func:`repetition_stats`, :func:`pii_redact`)
  are stateless vectorized ``map_batches`` — zero shuffles.
- Corpus-level passes (:func:`line_dedup_stats`,
  :func:`decontaminate`) build their small side (common-line set /
  benchmark-gram set) with ONE bucketed shuffle whose residue is
  COUNTED before collection: under the gate the set is broadcast via
  ``ray.put`` and the second pass is shuffle-free; over the gate a
  fully-distributed bucketed-join path runs instead (equivalence
  pinned by forcing the gate to 0 in tests).

All integer/hash output columns are chosen to be exactly expressible
in ANSI SQL so the DuckDB oracle can verify them value-for-value.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .infer import bucketed_reduce, normalize_blocks, sanitize_for_join
from .relational import grouped_sums

# Same driver-collect budget as stages.dedup: a small-side set under
# this many entries ships to the driver and broadcasts; over it, the
# distributed join path runs.
DRIVER_MAX_SMALL_SIDE = 2_000_000


# ---------------------------------------------------------------------------
# Shared vectorized explode helpers
# ---------------------------------------------------------------------------

def _explode_lines(batch: pd.DataFrame, text_col: str, id_col: str) -> pd.DataFrame:
    """``(id, pos, line)`` — one row per '\\n'-split line, 1-based pos.

    Matches ``str.split('\\n')`` / DuckDB ``string_split(text,
    chr(10))`` exactly: an empty document yields ONE empty line.
    """
    t = batch[text_col].fillna("")
    lists = t.str.split("\n")
    n = lists.str.len().to_numpy()
    flat = np.concatenate([np.asarray(x, dtype=object) for x in lists]) if len(t) else np.empty(0, object)
    pos = np.concatenate([np.arange(1, c + 1) for c in n]) if len(t) else np.empty(0, np.int64)
    return pd.DataFrame(
        {
            id_col: np.repeat(batch[id_col].to_numpy(), n),
            "pos": pos.astype("int64"),
            "line": flat,
        }
    )


def _doc_distinct_gram_hashes(
    texts: pd.Series, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """``(row_idx, gram_hash)`` for every per-document DISTINCT word
    ``k``-gram (lowercased, whitespace-run tokenized).

    Grams are materialized as strings batch-wide (C-level ``str.cat``
    over shifted token columns) and hashed with
    ``pd.util.hash_array`` — deterministic across processes, 64-bit
    (cross-gram collisions ~ n²/2⁶⁴, negligible vs corpus sizes).
    """
    t = texts.fillna("").str.strip().str.lower()
    toks = t.str.split()
    n = toks.str.len().fillna(0).astype(int).to_numpy()
    if n.sum() == 0 or len(t) == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    rows = np.repeat(np.arange(len(t)), n)
    flat = pd.Series(
        np.concatenate([np.asarray(x, dtype=object) for x in toks if len(x)]),
    )
    if len(flat) < k:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    gram = flat.str.cat([flat.shift(-j) for j in range(1, k)], sep=" ")
    # a window is a real gram only when it doesn't cross a doc boundary
    valid = (rows[: len(rows) - k + 1] == rows[k - 1 :]) & gram.notna().to_numpy()[
        : len(rows) - k + 1
    ]
    g_rows = rows[: len(rows) - k + 1][valid]
    g_hash = pd.util.hash_array(gram.to_numpy(object)[: len(rows) - k + 1][valid])
    dd = pd.DataFrame({"row": g_rows, "gh": g_hash}).drop_duplicates()
    return dd["row"].to_numpy(np.int64), dd["gh"].to_numpy(np.uint64)


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (stateless, oracle-checked)
# ---------------------------------------------------------------------------

def repetition_stats(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """``(id, n_tokens, n_distinct_tokens, max_word_len,
    top_token_count, top_bigram_count)`` — integer repetition signals
    (Gopher-style duplicate-content filters decide on ratios of these;
    integers are emitted so the SQL oracle hash-matches).

    Tokens: ``lower(trim(text))`` split on whitespace runs. Documents
    with no tokens emit all-zero rows (they still appear).
    """

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        m = len(batch)
        t = batch[text_col].fillna("").str.strip().str.lower()
        toks = t.str.split()
        n_tok = toks.str.len().fillna(0).astype(int).to_numpy()
        out = {
            "n_tokens": n_tok.astype("int64"),
            "n_distinct_tokens": np.zeros(m, np.int64),
            "max_word_len": np.zeros(m, np.int64),
            "top_token_count": np.zeros(m, np.int64),
            "top_bigram_count": np.zeros(m, np.int64),
        }
        if n_tok.sum() > 0:
            rows = np.repeat(np.arange(m), n_tok)
            flat = pd.Series(
                np.concatenate([np.asarray(x, dtype=object) for x in toks if len(x)])
            )
            df = pd.DataFrame({"row": rows, "tok": flat.to_numpy(object)})
            per_tok = df.groupby(["row", "tok"], sort=False).size()
            by_row = per_tok.groupby(level=0)
            out["n_distinct_tokens"][by_row.size().index] = by_row.size().to_numpy()
            out["top_token_count"][by_row.max().index] = by_row.max().to_numpy()
            wl = df.assign(l=flat.str.len().to_numpy()).groupby("row")["l"].max()
            out["max_word_len"][wl.index] = wl.to_numpy()
            # adjacent bigrams within a document
            nxt = flat.shift(-1)
            same = rows[:-1] == rows[1:] if len(rows) > 1 else np.empty(0, bool)
            if same.any():
                bg = pd.DataFrame(
                    {
                        "row": rows[:-1][same],
                        "gram": flat.iloc[:-1].str.cat(nxt.iloc[:-1], sep=" ").to_numpy(
                            object
                        )[same],
                    }
                )
                top_bg = bg.groupby(["row", "gram"], sort=False).size().groupby(level=0).max()
                out["top_bigram_count"][top_bg.index] = top_bg.to_numpy()
        return pd.DataFrame({id_col: batch[id_col], **out})

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


# ---------------------------------------------------------------------------
# PII redaction (stateless, oracle-checked; RE2-compatible patterns)
# ---------------------------------------------------------------------------

# Patterns restricted to the RE2-compatible subset (no lookarounds /
# backrefs) so the DuckDB oracle applies the IDENTICAL regexes.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

_PII_RES = [
    (re.compile(PII_EMAIL), "<EMAIL>"),
    (re.compile(PII_PHONE), "<PHONE>"),
    (re.compile(PII_IPV4), "<IP>"),
]


def pii_redact(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    with_text: bool = False,
) -> ray.data.Dataset:
    """``(id, n_emails, n_phones, n_ipv4, redacted_md5[, redacted])``.

    Replacement ORDER is part of the contract (email → phone → ip:
    emails may contain digits; phone/ip never overlap). Counts are
    non-overlapping leftmost matches — identical semantics in Python
    ``re`` and RE2, pinned against DuckDB in tests.
    """

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        counts = {
            "n_emails": t.str.count(PII_EMAIL).astype("int64"),
            "n_phones": t.str.count(PII_PHONE).astype("int64"),
            "n_ipv4": t.str.count(PII_IPV4).astype("int64"),
        }
        red = t
        for rx, repl in _PII_RES:
            red = red.str.replace(rx, repl, regex=True)
        md5s = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in red]
        out = pd.DataFrame({id_col: batch[id_col], **counts, "redacted_md5": md5s})
        if with_text:
            out["redacted"] = red
        return out

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


# ---------------------------------------------------------------------------
# CCNet-style cross-document line dedup (gated two-pass)
# ---------------------------------------------------------------------------

_LINE_STATS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_lines", pa.int64()),
        ("n_removed", pa.int64()),
        ("clean_md5", pa.string()),
    ]
)


def _common_lines(
    ds: ray.data.Dataset, text_col: str, id_col: str, min_docs: int
) -> ray.data.Dataset:
    """Lines (non-whitespace-only) appearing in >= ``min_docs`` DISTINCT
    documents. One bucketed shuffle over per-batch-distinct
    ``(id, line)`` pairs."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = _explode_lines(batch, text_col, id_col)[[id_col, "line"]]
        df = df[df["line"].str.strip() != ""]
        return df.drop_duplicates()

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        _partial, batch_format="pandas", batch_size=None
    )

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates()

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.drop_duplicates().groupby("line", sort=False)[id_col].size()
        keep = cnt[cnt >= min_docs]
        return pd.DataFrame({"line": keep.index.to_numpy(object)})

    return bucketed_reduce(
        pairs, ["line"], _reduce, pa.schema([("line", pa.string())]), combiner=_dd
    )


class _LineFilter:
    """Broadcast common-line set; per-batch split → flag → reassemble
    (a document's lines never leave its batch — no shuffle)."""

    def __init__(self, common_ref, text_col: str, id_col: str):
        self._common = ray.get(common_ref)
        self._text_col, self._id_col = text_col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        df = _explode_lines(batch, self._text_col, self._id_col)
        removed = df["line"].isin(self._common).to_numpy()
        return _assemble_line_stats(df, removed, self._id_col)


def _assemble_line_stats(
    lines: pd.DataFrame, removed: np.ndarray, id_col: str
) -> pd.DataFrame:
    """Per-doc (n_lines, n_removed, md5 of kept lines re-joined)."""
    lines = lines.assign(__rm=removed)
    out_rows = []
    for did, g in lines.sort_values([id_col, "pos"], kind="stable").groupby(
        id_col, sort=False
    ):
        kept = g.loc[~g["__rm"], "line"]
        clean = "\n".join(kept)
        out_rows.append(
            (did, len(g), int(g["__rm"].sum()), hashlib.md5(clean.encode()).hexdigest())
        )
    return pd.DataFrame(
        out_rows, columns=[id_col, "n_lines", "n_removed", "clean_md5"]
    )


def line_dedup_stats(
    ds: ray.data.Dataset,
    *,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_max_common: int = DRIVER_MAX_SMALL_SIDE,
) -> ray.data.Dataset:
    """CCNet-style boilerplate-line removal report: ``(doc_id, n_lines,
    n_removed, clean_md5)`` where removed lines are those occurring in
    >= ``min_docs`` distinct documents (whitespace-only lines exempt)
    and ``clean_md5`` hashes the kept lines re-joined with '\\n'.

    Gated: the common-line residue is COUNTED; <= ``driver_max_common``
    collects once and broadcasts (second pass shuffle-free), else the
    distributed path flags lines via a bucketed join on the line value
    and reassembles documents with a doc-keyed bucketed reduce.
    """
    docs = ds.select_columns([id_col, text_col])
    common = _common_lines(docs, text_col, id_col, min_docs).materialize()

    if common.count() <= driver_max_common:
        common_set = frozenset(r["line"] for r in common.take_all())
        ref = ray.put(common_set)
        return docs.map_batches(
            _LineFilter,
            fn_constructor_kwargs={
                "common_ref": ref,
                "text_col": text_col,
                "id_col": id_col,
            },
            batch_format="pandas",
            concurrency=(1, 8),
        )

    # --- distributed path: line-keyed flag join, then doc-keyed reassembly
    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        df = _explode_lines(batch, text_col, id_col)
        df["__marker"] = False
        return df

    marker = common.map_batches(
        lambda b: pd.DataFrame(
            {
                id_col: np.full(len(b), -1, np.int64),
                "pos": np.zeros(len(b), np.int64),
                "line": b["line"].to_numpy(object),
                "__marker": np.ones(len(b), bool),
            }
        ),
        batch_format="pandas",
    )
    union = docs.map_batches(_explode, batch_format="pandas").union(marker)

    flagged_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("pos", pa.int64()),
            ("line", pa.string()),
            ("removed", pa.bool_()),
        ]
    )

    def _flag(g: pd.DataFrame) -> pd.DataFrame:
        commons = set(g.loc[g["__marker"], "line"])
        rows = g[~g["__marker"]]
        return pd.DataFrame(
            {
                id_col: rows[id_col].to_numpy(),
                "pos": rows["pos"].to_numpy(),
                "line": rows["line"].to_numpy(object),
                "removed": rows["line"].isin(commons).to_numpy(),
            }
        )

    flagged = bucketed_reduce(union, ["line"], _flag, flagged_schema)

    def _reassemble(g: pd.DataFrame) -> pd.DataFrame:
        return _assemble_line_stats(
            g[[id_col, "pos", "line"]], g["removed"].to_numpy(), id_col
        )

    return bucketed_reduce(flagged, [id_col], _reassemble, _LINE_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# N-gram test-set decontamination (gated two-pass)
# ---------------------------------------------------------------------------

_DECON_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_shared_grams", pa.int64()),
        ("contaminated", pa.int64()),
    ]
)


class _DeconScore:
    """Broadcast benchmark-gram hash array; per-batch searchsorted hit
    counting over each train doc's distinct grams."""

    def __init__(self, bench_ref, k: int, text_col: str, id_col: str):
        self._bench = ray.get(bench_ref)  # sorted uint64 array
        self._k, self._text_col, self._id_col = k, text_col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows, gh = _doc_distinct_gram_hashes(batch[self._text_col], self._k)
        if len(rows) == 0:
            return pd.DataFrame(
                {
                    self._id_col: pd.Series([], dtype="int64"),
                    "n_shared_grams": pd.Series([], dtype="int64"),
                    "contaminated": pd.Series([], dtype="int64"),
                }
            )
        idx = np.searchsorted(self._bench, gh)
        idx = np.clip(idx, 0, len(self._bench) - 1) if len(self._bench) else idx
        hit = (
            self._bench[idx] == gh if len(self._bench) else np.zeros(len(gh), bool)
        )
        n_shared = np.bincount(rows, weights=hit, minlength=len(batch)).astype(
            np.int64
        )
        present = np.zeros(len(batch), bool)
        present[rows] = True
        ids = batch[self._id_col].to_numpy()[present]
        shared = n_shared[present]
        return pd.DataFrame(
            {
                self._id_col: ids,
                "n_shared_grams": shared,
                "contaminated": (shared > 0).astype("int64"),
            }
        )


def decontaminate(
    train: ray.data.Dataset,
    bench: ray.data.Dataset,
    *,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_max_grams: int = DRIVER_MAX_SMALL_SIDE,
) -> ray.data.Dataset:
    """GPT-3-style n-gram decontamination report: for every train doc
    with at least one complete word ``k``-gram, ``(doc_id,
    n_shared_grams, contaminated)`` — the count of its DISTINCT grams
    that also occur anywhere in the benchmark set.

    The benchmark's distinct-gram residue is COUNTED: under
    ``driver_max_grams`` it collects once, sorts, and broadcasts (the
    train pass is then a shuffle-free searchsorted per batch); over the
    gate a fully-distributed two-shuffle path runs (gram-keyed flag
    join, then doc-keyed sum).
    """

    def _gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        rows, gh = _doc_distinct_gram_hashes(batch[text_col], k)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy()[rows]
                if len(rows)
                else pd.Series([], dtype="int64"),
                "gh": gh,
            }
        )

    def _dd_gh(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates("gh")[["gh"]] if "gh" in b.columns else b

    bench_grams = bucketed_reduce(
        bench.select_columns([id_col, text_col]).map_batches(
            _gram_rows, batch_format="pandas"
        ),
        ["gh"],
        lambda g: g.drop_duplicates("gh")[["gh"]],
        pa.schema([("gh", pa.uint64())]),
        combiner=_dd_gh,
    ).materialize()

    train_docs = train.select_columns([id_col, text_col])
    if bench_grams.count() <= driver_max_grams:
        arr = np.sort(
            np.fromiter(
                (r["gh"] for r in bench_grams.take_all()), dtype=np.uint64
            )
        )
        ref = ray.put(arr)
        return train_docs.map_batches(
            _DeconScore,
            fn_constructor_kwargs={
                "bench_ref": ref,
                "k": k,
                "text_col": text_col,
                "id_col": id_col,
            },
            batch_format="pandas",
            concurrency=(1, 8),
        )

    # --- distributed path: gram-keyed flag, then doc-keyed aggregation
    train_grams = train_docs.map_batches(_gram_rows, batch_format="pandas")
    marker = bench_grams.map_batches(
        lambda b: pd.DataFrame(
            {id_col: np.full(len(b), -1, np.int64), "gh": b["gh"].to_numpy()}
        ),
        batch_format="pandas",
    )
    hit_schema = pa.schema([(id_col, pa.int64()), ("hit", pa.int64())])

    def _flag(g: pd.DataFrame) -> pd.DataFrame:
        bench_gh = set(g.loc[g[id_col] == -1, "gh"])
        rows = g[g[id_col] != -1]
        return pd.DataFrame(
            {
                id_col: rows[id_col].to_numpy(),
                "hit": rows["gh"].isin(bench_gh).astype("int64").to_numpy(),
            }
        )

    flagged = bucketed_reduce(train_grams.union(marker), ["gh"], _flag, hit_schema)

    def _agg(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(id_col, sort=False)["hit"].sum()
        return pd.DataFrame(
            {
                id_col: s.index.to_numpy(np.int64),
                "n_shared_grams": s.to_numpy(np.int64),
                "contaminated": (s.to_numpy() > 0).astype("int64"),
            }
        )

    def _agg_combine(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby(id_col, sort=False, as_index=False)["hit"].sum()
        return s

    return bucketed_reduce(
        flagged, [id_col], _agg, _DECON_SCHEMA, combiner=_agg_combine
    )


# ---------------------------------------------------------------------------
# Domain-level corpus stats (stateless partials + one bucketed reduce)
# ---------------------------------------------------------------------------

DOMAIN_STATS_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n_docs", pa.int64()),
        ("total_chars", pa.int64()),
        ("total_tokens", pa.int64()),
        ("n_langs", pa.int64()),
    ]
)


def domain_stats(
    ds: ray.data.Dataset,
    *,
    domain_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> ray.data.Dataset:
    """``(source, n_docs, total_chars, total_tokens, n_langs)`` — the
    per-domain corpus profile every curation pipeline starts from
    (which domains dominate, which are boilerplate-heavy). Map-side
    partial aggregation per ``(domain, lang)`` collapses each block to
    at most |domains|x|langs| rows before ONE bucketed shuffle; the
    distinct-lang count is exact because all partials of a domain land
    in its one bucket. Token semantics match :func:`~.text_analysis.
    token_counts` (trimmed whitespace-run split, empty -> 0)."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        stripped = t.str.strip()
        n_tok = stripped.str.split().str.len().fillna(0)
        n_tok = n_tok.where(stripped.str.len() > 0, 0).astype("int64")
        df = pd.DataFrame(
            {
                domain_col: batch[domain_col],
                lang_col: batch[lang_col].fillna(""),
                "n_docs": np.ones(len(batch), np.int64),
                "total_chars": t.str.len().astype("int64"),
                "total_tokens": n_tok,
            }
        )
        return df.groupby([domain_col, lang_col], sort=False, as_index=False).sum()

    partials = ds.select_columns([domain_col, text_col, lang_col]).map_batches(
        _partial, batch_format="pandas", batch_size=None
    )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        byl = g.groupby([domain_col, lang_col], sort=False, as_index=False).sum()
        agg = byl.groupby(domain_col, sort=False).agg(
            n_docs=("n_docs", "sum"),
            total_chars=("total_chars", "sum"),
            total_tokens=("total_tokens", "sum"),
            n_langs=(lang_col, "nunique"),
        )
        return agg.reset_index().rename(columns={domain_col: "source"})

    return bucketed_reduce(
        partials, [domain_col], _reduce, DOMAIN_STATS_SCHEMA,
        combiner=lambda b: b.groupby(
            [domain_col, lang_col], sort=False, as_index=False
        ).sum(),
    )


# ---------------------------------------------------------------------------
# Gopher-style document quality gate (stateless, oracle-checked)
# ---------------------------------------------------------------------------

GOPHER_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("total_word_chars", pa.int64()),
        ("reason_mask", pa.int64()),
        ("keep", pa.int64()),
    ]
)

# Integerized Gopher-rule thresholds (Rae et al. 2021 §A1.1 shapes,
# fractions expressed as exact integer cross-multiplications so the
# SQL oracle hash-matches):
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_WORD_X = 2  # mean word length < 2  <=>  2*n_tok > chars
GOPHER_MAX_MEAN_WORD_X = 12  # mean word length > 12 <=>  chars > 12*n_tok
GOPHER_TOP_BIGRAM_DEN = 5  # top bigram > 1/5 of tokens
GOPHER_DISTINCT_DEN = 5  # distinct tokens < 1/5 of tokens


def gopher_filter(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """``(doc_id, n_tokens, total_word_chars, reason_mask, keep)`` —
    a Gopher-style repetition/shape quality gate as ONE stateless
    vectorized pass (zero shuffles). ``reason_mask`` bits:

    - 1: token count outside [{min}, {max}]
    - 2: mean word length outside [{lo}, {hi}] (integer cross-multiplied)
    - 4: most common bigram covers > 1/{bden} of tokens
    - 8: distinct tokens < 1/{dden} of tokens (heavy repetition)

    ``keep = 1`` iff no bit fires. Tokens are ``lower(trim(text))``
    split on whitespace runs (same contract as
    :func:`repetition_stats`, so the two reports line up row-for-row).
    """

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        m = len(batch)
        t = batch[text_col].fillna("").str.strip().str.lower()
        toks = t.str.split()
        n_tok = toks.str.len().fillna(0).astype(int).to_numpy()
        twc = np.zeros(m, np.int64)
        n_distinct = np.zeros(m, np.int64)
        top_bigram = np.zeros(m, np.int64)
        if n_tok.sum() > 0:
            rows = np.repeat(np.arange(m), n_tok)
            flat = pd.Series(
                np.concatenate([np.asarray(x, dtype=object) for x in toks if len(x)])
            )
            lens = flat.str.len().to_numpy(np.int64)
            np.add.at(twc, rows, lens)
            df = pd.DataFrame({"row": rows, "tok": flat.to_numpy(object)})
            nd = df.drop_duplicates().groupby("row", sort=False).size()
            n_distinct[nd.index] = nd.to_numpy()
            same = rows[:-1] == rows[1:] if len(rows) > 1 else np.empty(0, bool)
            if same.any():
                bg = pd.DataFrame(
                    {
                        "row": rows[:-1][same],
                        "gram": flat.iloc[:-1].str.cat(
                            flat.shift(-1).iloc[:-1], sep=" "
                        ).to_numpy(object)[same],
                    }
                )
                tb = bg.groupby(["row", "gram"], sort=False).size().groupby(level=0).max()
                top_bigram[tb.index] = tb.to_numpy()
        nt = n_tok.astype(np.int64)
        mask = np.where((nt < GOPHER_MIN_TOKENS) | (nt > GOPHER_MAX_TOKENS), 1, 0)
        mask += np.where(
            (GOPHER_MIN_MEAN_WORD_X * nt > twc) | (twc > GOPHER_MAX_MEAN_WORD_X * nt),
            2,
            0,
        )
        mask += np.where(GOPHER_TOP_BIGRAM_DEN * top_bigram > nt, 4, 0)
        mask += np.where(GOPHER_DISTINCT_DEN * n_distinct < nt, 8, 0)
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_tokens": nt,
                "total_word_chars": twc,
                "reason_mask": mask.astype("int64"),
                "keep": (mask == 0).astype("int64"),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


gopher_filter.__doc__ = gopher_filter.__doc__.format(
    min=GOPHER_MIN_TOKENS,
    max=GOPHER_MAX_TOKENS,
    lo=GOPHER_MIN_MEAN_WORD_X,
    hi=GOPHER_MAX_MEAN_WORD_X,
    bden=GOPHER_TOP_BIGRAM_DEN,
    dden=GOPHER_DISTINCT_DEN,
)


# ---------------------------------------------------------------------------
# Exact k-gram duplicate-span stats (gated two-pass)
# ---------------------------------------------------------------------------

DUP_SPAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_grams", pa.int64()),
        ("n_dup_grams", pa.int64()),
    ]
)


def _doc_gram_hash_counts(
    texts: pd.Series, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``(row_idx, gram_hash, count)`` — per-document word ``k``-gram
    occurrence counts (multiplicity kept, unlike
    :func:`_doc_distinct_gram_hashes`)."""
    t = texts.fillna("").str.strip().str.lower()
    toks = t.str.split()
    n = toks.str.len().fillna(0).astype(int).to_numpy()
    if n.sum() == 0 or len(t) == 0:
        return (np.empty(0, np.int64),) * 2 + (np.empty(0, np.int64),)
    rows = np.repeat(np.arange(len(t)), n)
    flat = pd.Series(
        np.concatenate([np.asarray(x, dtype=object) for x in toks if len(x)]),
    )
    if len(flat) < k:
        return (np.empty(0, np.int64),) * 2 + (np.empty(0, np.int64),)
    gram = flat.str.cat([flat.shift(-j) for j in range(1, k)], sep=" ")
    valid = (rows[: len(rows) - k + 1] == rows[k - 1 :]) & gram.notna().to_numpy()[
        : len(rows) - k + 1
    ]
    g_rows = rows[: len(rows) - k + 1][valid]
    g_hash = pd.util.hash_array(gram.to_numpy(object)[: len(rows) - k + 1][valid])
    cc = (
        pd.DataFrame({"row": g_rows, "gh": g_hash})
        .groupby(["row", "gh"], sort=False)
        .size()
    )
    return (
        cc.index.get_level_values(0).to_numpy(np.int64),
        cc.index.get_level_values(1).to_numpy(np.uint64),
        cc.to_numpy(np.int64),
    )


class _DupSpanScore:
    """Broadcast common-gram hash array; per-batch searchsorted scoring
    (total windows + windows whose gram repeats anywhere in the corpus)."""

    def __init__(self, common_ref, k: int, text_col: str, id_col: str):
        self._common = ray.get(common_ref)  # sorted uint64
        self._k, self._text_col, self._id_col = k, text_col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = len(batch)
        rows, gh, cnt = _doc_gram_hash_counts(batch[self._text_col], self._k)
        n_grams = np.zeros(m, np.int64)
        n_dup = np.zeros(m, np.int64)
        if len(rows):
            np.add.at(n_grams, rows, cnt)
            if len(self._common):
                idx = np.clip(np.searchsorted(self._common, gh), 0, len(self._common) - 1)
                hit = self._common[idx] == gh
                np.add.at(n_dup, rows[hit], cnt[hit])
        return pd.DataFrame(
            {
                self._id_col: batch[self._id_col],
                "n_grams": n_grams,
                "n_dup_grams": n_dup,
            }
        )


def dup_span_stats(
    ds: ray.data.Dataset,
    *,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_max_common: int = DRIVER_MAX_SMALL_SIDE,
) -> ray.data.Dataset:
    """Exact-substring duplication report at word-``k``-gram
    granularity (the scalable proxy for suffix-array substring dedup,
    Lee et al. 2022): ``(doc_id, n_grams, n_dup_grams)`` where
    ``n_grams`` counts the document's k-token windows and
    ``n_dup_grams`` those whose gram occurs >= 2 times ANYWHERE in the
    corpus (other docs or elsewhere in the same doc — multiplicity
    counts). Every doc appears; docs shorter than ``k`` tokens emit
    zeros.

    Gram identity is a 64-bit hash (cross-gram collision odds are
    ~n²/2⁶⁴ — negligible at real corpus sizes, same contract as
    :func:`decontaminate`). Gated like the other corpus passes: the
    repeated-gram residue is COUNTED, broadcast under
    ``driver_max_common``, else a fully-distributed gram-keyed flag
    join + doc-keyed sum runs.
    """
    docs = ds.select_columns([id_col, text_col])

    def _gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        rows, gh, cnt = _doc_gram_hash_counts(batch[text_col], k)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy()[rows]
                if len(rows)
                else pd.Series([], dtype="int64"),
                "gh": gh,
                "cnt": cnt,
            }
        )

    grams = docs.map_batches(_gram_rows, batch_format="pandas")

    def _psum(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("gh", sort=False, as_index=False)["cnt"].sum()

    def _keep_repeated(g: pd.DataFrame) -> pd.DataFrame:
        totals = g.groupby("gh", sort=False)["cnt"].sum()
        return pd.DataFrame({"gh": totals[totals >= 2].index.to_numpy(np.uint64)})

    common = bucketed_reduce(
        grams.map_batches(
            lambda b: b[["gh", "cnt"]], batch_format="pandas"
        ),
        ["gh"],
        _keep_repeated,
        pa.schema([("gh", pa.uint64())]),
        combiner=_psum,
    ).materialize()

    if common.count() <= driver_max_common:
        arr = np.sort(
            np.fromiter((r["gh"] for r in common.take_all()), dtype=np.uint64)
        )
        ref = ray.put(arr)
        return docs.map_batches(
            _DupSpanScore,
            fn_constructor_kwargs={
                "common_ref": ref,
                "k": k,
                "text_col": text_col,
                "id_col": id_col,
            },
            batch_format="pandas",
            concurrency=(1, 8),
        )

    # --- distributed path: gram-keyed flag join, then doc-keyed sums,
    # with per-doc window totals carried as base rows
    marker = common.map_batches(
        lambda b: pd.DataFrame(
            {
                id_col: np.full(len(b), -1, np.int64),
                "gh": b["gh"].to_numpy(np.uint64),
                "cnt": np.zeros(len(b), np.int64),
            }
        ),
        batch_format="pandas",
    )
    part_schema = pa.schema(
        [(id_col, pa.int64()), ("n_grams", pa.int64()), ("n_dup_grams", pa.int64())]
    )

    def _flag(g: pd.DataFrame) -> pd.DataFrame:
        common_gh = set(g.loc[g[id_col] == -1, "gh"])
        rows = g[g[id_col] != -1]
        hit = rows["gh"].isin(common_gh).to_numpy()
        return pd.DataFrame(
            {
                id_col: rows[id_col].to_numpy(),
                "n_grams": rows["cnt"].to_numpy(np.int64),
                "n_dup_grams": np.where(hit, rows["cnt"].to_numpy(np.int64), 0),
            }
        )

    flagged = bucketed_reduce(grams.union(marker), ["gh"], _flag, part_schema)
    base = docs.map_batches(
        lambda b: pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                "n_grams": np.zeros(len(b), np.int64),
                "n_dup_grams": np.zeros(len(b), np.int64),
            }
        ),
        batch_format="pandas",
    )

    def _agg(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(id_col, sort=False, as_index=False)[["n_grams", "n_dup_grams"]].sum()
        return s

    return bucketed_reduce(
        base.union(flagged), [id_col], _agg, DUP_SPAN_SCHEMA, combiner=_agg
    )


# ---------------------------------------------------------------------------
# Unigram-LM perplexity scoring (CCNet's quality signal, with the KenLM
# 5-gram model replaced by a corpus-fit unigram model — the sandbox-
# honest variant; the broadcast-model shape is identical for any
# n-gram order)
# ---------------------------------------------------------------------------

PPL_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("nll_milli", pa.int64())]
)

DRIVER_MAX_PPL_VOCAB = 5_000_000


def unigram_nll(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
    driver_max_vocab: int = DRIVER_MAX_PPL_VOCAB,
) -> ray.data.Dataset:
    """Per-document mean negative log-likelihood under a corpus-fit
    unigram model, in integer milli-nats: ``(doc_id, n_tokens,
    nll_milli)``. Low = fluent/common tokens (CCNet keeps the head of
    this score's distribution; compose with
    :func:`~.quantiles.quantile_buckets` for the full CCNet split).

    Two passes: ONE bucketed token-count shuffle fits the model (the
    vocabulary residue is count-gated like ``vocab_build`` — Heap's
    law keeps it driver-sized; it trips loudly otherwise) and
    broadcasts it as sorted arrays via ``ray.put``; scoring is
    map-side ``searchsorted`` — zero further shuffle. Unseen tokens
    (possible when ``min_count`` > 1) score as count ``0.5``
    (Laplace-half smoothing against the same total). Per-token log
    probabilities are quantized to integer MICRO-nats at model build
    (one ln + roundbankers per vocab entry), so the per-doc reduction
    is an integer sum — order-independent at any block layout AND
    hash-exact vs the SQL twin (same doctrine as the k-means
    fixed-point partials)."""
    from .vocab import term_counts

    counts = term_counts(ds, text_col).materialize()
    n_vocab = counts.count()
    if n_vocab > driver_max_vocab:
        raise ValueError(
            f"unigram_nll: vocabulary {n_vocab} exceeds the driver gate "
            f"({driver_max_vocab}); raise min_count"
        )
    vocab = counts.to_pandas()
    if len(vocab) == 0:
        return ray.data.from_arrow(PPL_SCHEMA.empty_table())
    vocab = vocab[vocab["n"] >= min_count].sort_values("token", kind="stable")
    total = float(vocab["n"].sum())
    model_ref = ray.put(
        {
            "tokens": vocab["token"].to_numpy(object),
            "logp_micro": np.round(
                np.log(vocab["n"].to_numpy(np.float64) / total) * 1000000.0
            ).astype(np.int64),
            "unk_micro": int(np.round(np.log(0.5 / total) * 1000000.0)),
        }
    )

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
        out_n = np.zeros(len(b), dtype=np.int64)
        out_milli = np.zeros(len(b), dtype=np.int64)
        for i, t in enumerate(toks.to_numpy()):
            if not len(t):
                continue
            arr = np.asarray(t, dtype=object)
            idx = np.searchsorted(m["tokens"], arr)
            idx = np.clip(idx, 0, len(m["tokens"]) - 1)
            hit = m["tokens"][idx] == arr
            lp = np.where(hit, m["logp_micro"][idx], m["unk_micro"])
            out_n[i] = len(arr)
            out_milli[i] = round(int(-lp.sum()) / (len(arr) * 1000.0))
        return pd.DataFrame(
            {
                "doc_id": b[id_col].to_numpy(np.int64),
                "n_tokens": out_n,
                "nll_milli": out_milli,
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Unicode NFC normalization (ingest hygiene: composed/decomposed forms
# of the same text must dedup and tokenize identically)
# ---------------------------------------------------------------------------

NFC_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("norm_md5", pa.string()), ("changed", pa.int64())]
)


def nfc_normalize_stats(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """``(doc_id, norm_md5, changed)`` — md5 of the NFC-normalized
    text plus a 0/1 flag for texts the normalization changed. Map-only
    (zero shuffle); Python ``unicodedata`` NFC and DuckDB
    ``nfc_normalize`` agree byte-for-byte (pinned by the oracle and a
    composed/decomposed fixture test), so the md5 column is hash-exact
    cross-engine. Compose with :func:`~.dedup.exact_dedup` on
    ``norm_md5`` for normalization-insensitive dedup."""
    import unicodedata

    def _norm(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].fillna("")
        md5s, changed = [], []
        for t in texts:
            n = unicodedata.normalize("NFC", t)
            md5s.append(hashlib.md5(n.encode("utf-8")).hexdigest())
            changed.append(1 if n != t else 0)
        return pd.DataFrame(
            {
                "doc_id": b[id_col].to_numpy(np.int64),
                "norm_md5": md5s,
                "changed": np.asarray(changed, dtype=np.int64),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _norm, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Duplicate-span REMOVAL (the acting counterpart of dup_span_stats —
# Lee et al. 2022 "Deduplicating Training Data Makes Language Models
# Better", proxied at word-k-gram granularity)
# ---------------------------------------------------------------------------

REDACT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("n_removed", pa.int64()),
        ("text_redacted", pa.string()),
    ]
)


def _doc_gram_occurrences(
    texts: pd.Series, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``(row_idx, pos, gram_hash)`` — every word ``k``-gram occurrence
    with its 0-based token position inside its document."""
    t = texts.fillna("").str.strip().str.lower()
    toks = t.str.split()
    n = toks.str.len().fillna(0).astype(int).to_numpy()
    if n.sum() == 0 or len(t) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.uint64))
    rows = np.repeat(np.arange(len(t)), n)
    flat = pd.Series(
        np.concatenate([np.asarray(x, dtype=object) for x in toks if len(x)])
    )
    if len(flat) < k:
        return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.uint64))
    gram = flat.str.cat([flat.shift(-j) for j in range(1, k)], sep=" ")
    valid = (rows[: len(rows) - k + 1] == rows[k - 1 :]) & gram.notna().to_numpy()[
        : len(rows) - k + 1
    ]
    g_rows = rows[: len(rows) - k + 1][valid]
    # position within the doc: global token index minus the doc's start
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    pos = np.arange(len(rows))[: len(rows) - k + 1][valid] - starts[g_rows]
    g_hash = pd.util.hash_array(gram.to_numpy(object)[: len(rows) - k + 1][valid])
    return g_rows.astype(np.int64), pos.astype(np.int64), g_hash.astype(np.uint64)


def _redact_tokens(tokens: list, remove_starts: np.ndarray, k: int) -> tuple[str, int]:
    """Drop every token covered by a window starting at ``remove_starts``
    (interval-diff marking); returns (joined text, n_removed)."""
    nt = len(tokens)
    if nt == 0 or len(remove_starts) == 0:
        return " ".join(tokens), 0
    diff = np.zeros(nt + 1, np.int64)
    np.add.at(diff, remove_starts, 1)
    np.add.at(diff, np.minimum(remove_starts + k, nt), -1)
    covered = np.cumsum(diff[:-1]) > 0
    kept = [tok for tok, c in zip(tokens, covered) if not c]
    return " ".join(kept), int(covered.sum())


def dup_span_redact(
    ds: ray.data.Dataset,
    *,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_max_common: int = DRIVER_MAX_SMALL_SIDE,
) -> ray.data.Dataset:
    """REMOVE duplicated spans: every occurrence of a corpus-repeated
    word-``k``-gram is dropped except its canonical one (the smallest
    doc_id containing the gram, first position within that doc) —
    deterministic all-but-one span dedup. Output ``(doc_id, n_tokens,
    n_removed, text_redacted)``; the redacted text is the surviving
    tokens space-joined (tokenized reconstruction — original
    whitespace is not preserved, same contract as the tokenizer the
    grams are defined over).

    One bucketed reduce builds ``gram -> (owner doc, owner position)``
    for repeated grams; that residue is COUNTED: under
    ``driver_max_common`` it broadcasts and redaction is one map pass;
    over the gate a gram-keyed flag join + doc-keyed cogroup join of
    removal positions back onto the documents runs instead (both
    paths share the redact kernel; forced-gate equivalence tested)."""
    docs = ds.select_columns([id_col, text_col]).materialize()

    def _occ_rows(b: pd.DataFrame) -> pd.DataFrame:
        rows, pos, gh = _doc_gram_occurrences(b[text_col], k)
        return pd.DataFrame(
            {
                "gh": gh,
                "doc": b[id_col].to_numpy(np.int64)[rows]
                if len(rows)
                else pd.Series([], dtype="int64"),
                "pos": pos,
            }
        )

    occ = docs.map_batches(_occ_rows, batch_format="pandas").materialize()

    def _owner_combine(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "gh" not in b.columns:
            return pd.DataFrame(
                {"gh": pd.Series([], dtype="uint64"),
                 "cnt": pd.Series([], dtype="int64"),
                 "doc": pd.Series([], dtype="int64"),
                 "pos": pd.Series([], dtype="int64")}
            )
        if "cnt" not in b.columns:
            b = b.assign(cnt=np.int64(1))
        # min (doc, pos) lexicographically + total count per gram
        b = b.sort_values(["gh", "doc", "pos"], kind="stable")
        agg = b.groupby("gh", sort=False).agg(
            cnt=("cnt", "sum"), doc=("doc", "first"), pos=("pos", "first")
        )
        return agg.reset_index()

    def _owner_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = _owner_combine(g)
        return out[out["cnt"] >= 2]

    owners = bucketed_reduce(
        occ,
        ["gh"],
        _owner_reduce,
        pa.schema(
            [("gh", pa.uint64()), ("cnt", pa.int64()),
             ("doc", pa.int64()), ("pos", pa.int64())]
        ),
        combiner=_owner_combine,
    ).materialize()

    def _redact_batch_with(table: dict):
        def _f(b: pd.DataFrame) -> pd.DataFrame:
            rows, pos, gh = _doc_gram_occurrences(b[text_col], k)
            toks = b[text_col].fillna("").str.strip().str.lower().str.split()
            docids = b[id_col].to_numpy(np.int64)
            out_text, out_rm, out_nt = [], [], []
            # removal starts per batch row
            remove_by_row: dict[int, list] = {}
            if len(rows) and len(table["gh"]):
                idx = np.searchsorted(table["gh"], gh)
                idx = np.clip(idx, 0, len(table["gh"]) - 1)
                hit = table["gh"][idx] == gh
                own_doc = np.where(hit, table["doc"][idx], -1)
                own_pos = np.where(hit, table["pos"][idx], -1)
                d = docids[rows]
                rm = hit & ~((d == own_doc) & (pos == own_pos))
                for r, p in zip(rows[rm], pos[rm]):
                    remove_by_row.setdefault(int(r), []).append(int(p))
            for i in range(len(b)):
                tk = toks.iloc[i] if isinstance(toks.iloc[i], list) else []
                text, n_rm = _redact_tokens(
                    tk, np.asarray(remove_by_row.get(i, []), np.int64), k
                )
                out_text.append(text)
                out_rm.append(n_rm)
                out_nt.append(len(tk))
            return pd.DataFrame(
                {
                    "doc_id": docids,
                    "n_tokens": np.asarray(out_nt, np.int64),
                    "n_removed": np.asarray(out_rm, np.int64),
                    "text_redacted": out_text,
                }
            )

        return _f

    n_common = owners.count()
    if n_common <= driver_max_common:
        df = owners.to_pandas().sort_values("gh", kind="stable")
        table = {
            "gh": df["gh"].to_numpy(np.uint64),
            "doc": df["doc"].to_numpy(np.int64),
            "pos": df["pos"].to_numpy(np.int64),
        }
        ref = ray.put(table)

        def _map(b: pd.DataFrame) -> pd.DataFrame:
            t = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            return _redact_batch_with(t)(b)

        return normalize_blocks(
            docs.map_batches(_map, batch_format="pandas"), REDACT_SCHEMA
        )

    # --- over the gate: gram-keyed flag join -> (doc, pos) removals,
    # doc-keyed cogroup join back onto the documents, shared kernel
    from .relational import cogroup_join

    occ_schema = pa.schema(
        [("gh", pa.uint64()), ("doc", pa.int64()), ("pos", pa.int64())]
    )
    own_schema = pa.schema(
        [("gh", pa.uint64()), ("odoc", pa.int64()), ("opos", pa.int64())]
    )
    owners_j = owners.map_batches(
        lambda b: pd.DataFrame(
            {
                "gh": b["gh"].to_numpy(np.uint64),
                "odoc": b["doc"].to_numpy(np.int64),
                "opos": b["pos"].to_numpy(np.int64),
            }
        ),
        batch_format="pandas",
    )
    flagged = cogroup_join(
        occ, owners_j, on=["gh"], how="inner",
        left_schema=occ_schema, right_schema=own_schema,
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc"].to_numpy(np.int64),
                "pos": b["pos"].to_numpy(np.int64),
            }
        )[
            ~(
                (b["doc"].to_numpy(np.int64) == b["odoc"].to_numpy(np.int64))
                & (b["pos"].to_numpy(np.int64) == b["opos"].to_numpy(np.int64))
            )
        ],
        batch_format="pandas",
    )
    rm_schema = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])
    doc_schema = pa.schema([("doc_id", pa.int64()), (text_col, pa.string())])
    docs_keyed = docs.map_batches(
        lambda b: pd.DataFrame(
            {"doc_id": b[id_col].to_numpy(np.int64), text_col: b[text_col]}
        ),
        batch_format="pandas",
    )
    joined = cogroup_join(
        docs_keyed, flagged, on=["doc_id"], how="left_outer",
        left_schema=doc_schema, right_schema=rm_schema,
    )

    def _redact_joined(b: pd.DataFrame) -> pd.DataFrame:
        out_id, out_nt, out_rm, out_text = [], [], [], []
        for did, g in b.groupby("doc_id", sort=False):
            tk = str(g[text_col].iloc[0] or "").strip().lower().split()
            starts = g["pos"].dropna().to_numpy()
            text, n_rm = _redact_tokens(tk, starts.astype(np.int64), k)
            out_id.append(did)
            out_nt.append(len(tk))
            out_rm.append(n_rm)
            out_text.append(text)
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_id, np.int64),
                "n_tokens": np.asarray(out_nt, np.int64),
                "n_removed": np.asarray(out_rm, np.int64),
                "text_redacted": out_text,
            }
        )

    return normalize_blocks(
        bucketed_reduce(
            joined, ["doc_id"], _redact_joined, REDACT_SCHEMA
        ),
        REDACT_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Bigram-LM perplexity (conditional extension of unigram_nll: the
# KenLM-shaped quality signal with a corpus-fit bigram model)
# ---------------------------------------------------------------------------

BIGRAM_PPL_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_transitions", pa.int64()), ("nll_milli", pa.int64())]
)


def _tok_lower(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.lower().str.findall(r"\w+")


def bigram_nll(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    driver_max_model: int = DRIVER_MAX_SMALL_SIDE,
) -> ray.data.Dataset:
    """Per-document mean negative log-likelihood of token TRANSITIONS
    under a corpus-fit bigram model, integer milli-nats: ``(doc_id,
    n_transitions, nll_milli)``. ``P(w|v) = c(v w)/c(v)``; transitions
    with an unseen bigram score ``0.5/(c(v)+1)`` (well-defined even for
    unseen ``v``). Docs with < 2 tokens emit zeros.

    Model identity is 64-bit hashes of the token / bigram strings
    (same collision contract as ``decontaminate``). ONE bucketed
    shuffle builds the two count tables; their combined residue is
    COUNTED: under ``driver_max_model`` both broadcast as sorted
    arrays and scoring is map-side; over the gate the transitions are
    scored by two gram-keyed flag joins + one doc-keyed sum (both
    paths bit-equal — forced-gate test). Per-transition nll is
    quantized to integer MICRO-nats (one ln + roundbankers each), so
    the per-doc reduction is an integer sum — order-independent and
    hash-exact vs the SQL twin."""
    from .infer import bucketed_reduce, normalize_blocks, sanitize_for_join

    cnt_schema = pa.schema([("gh", pa.uint64()), ("cnt", pa.int64())])

    def _gram_rows(b: pd.DataFrame) -> pd.DataFrame:
        toks = _tok_lower(b[text_col])
        uni, bi = [], []
        for t in toks.to_numpy():
            if not len(t):
                continue
            uni.append(np.asarray(t, dtype=object))
            if len(t) >= 2:
                arr = np.asarray(t, dtype=object)
                bi.append(
                    np.char.add(np.char.add(arr[:-1].astype(str), " "),
                                arr[1:].astype(str)).astype(object)
                )
        out = []
        if uni:
            u = pd.Series(np.concatenate(uni)).value_counts(sort=False)
            out.append(pd.DataFrame(
                {"gh": pd.util.hash_array(u.index.to_numpy(object)),
                 "cnt": u.to_numpy(np.int64)}))
        if bi:
            v = pd.Series(np.concatenate(bi)).value_counts(sort=False)
            out.append(pd.DataFrame(
                {"gh": pd.util.hash_array(v.index.to_numpy(object)),
                 "cnt": v.to_numpy(np.int64)}))
        if not out:
            return pd.DataFrame({"gh": pd.Series([], dtype="uint64"),
                                 "cnt": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    def _psum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "gh" not in g.columns:
            return pd.DataFrame({"gh": pd.Series([], dtype="uint64"),
                                 "cnt": pd.Series([], dtype="int64")})
        return g.groupby("gh", sort=False, as_index=False)["cnt"].sum()

    # unigram "v" and bigram "v w" strings never collide as strings, so
    # ONE hash-keyed count table serves both lookups
    model = bucketed_reduce(
        ds.select_columns([text_col]).map_batches(
            _gram_rows, batch_format="pandas", batch_size=None
        ),
        ["gh"],
        _psum,
        cnt_schema,
        combiner=_psum,
    ).materialize()

    docs = ds.select_columns([id_col, text_col])

    def _doc_transitions(b: pd.DataFrame) -> pd.DataFrame:
        toks = _tok_lower(b[text_col])
        ids = b[id_col].to_numpy(np.int64)
        out_id, out_prev, out_bi = [], [], []
        for did, t in zip(ids, toks.to_numpy()):
            if len(t) < 2:
                continue
            arr = np.asarray(t, dtype=object)
            prev_h = pd.util.hash_array(arr[:-1])
            bi = np.char.add(np.char.add(arr[:-1].astype(str), " "),
                             arr[1:].astype(str)).astype(object)
            bi_h = pd.util.hash_array(bi)
            out_id.append(np.full(len(bi), did, np.int64))
            out_prev.append(prev_h)
            out_bi.append(bi_h)
        if not out_id:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "ghp": pd.Series([], dtype="uint64"),
                                 "ghb": pd.Series([], dtype="uint64")})
        return pd.DataFrame(
            {"doc_id": np.concatenate(out_id),
             "ghp": np.concatenate(out_prev),
             "ghb": np.concatenate(out_bi)}
        )

    def _nll_micro(cp: np.ndarray, cb: np.ndarray) -> np.ndarray:
        """per-transition nll in integer MICRO-nats from prev-count
        and bigram-count arrays — quantized per transition so the
        per-doc reduction is an integer sum (order-independent and
        hash-exact vs the SQL twin)"""
        p = np.where(
            (cb > 0) & (cp > 0),
            cb / np.maximum(cp, 1),
            0.5 / (cp + 1.0),
        )
        return np.round(-np.log(p) * 1000000.0).astype(np.int64)

    def _zeros_for(b: pd.DataFrame) -> pd.DataFrame:
        toks = _tok_lower(b[text_col])
        short = toks.str.len().fillna(0) < 2
        return pd.DataFrame(
            {
                "doc_id": b[id_col].to_numpy(np.int64)[short.to_numpy()],
                "n_transitions": np.zeros(int(short.sum()), np.int64),
                "nll_milli": np.zeros(int(short.sum()), np.int64),
            }
        )

    n_model = model.count()
    if n_model <= driver_max_model:
        df = model.to_pandas().sort_values("gh", kind="stable")
        ref = ray.put(
            {"gh": df["gh"].to_numpy(np.uint64), "cnt": df["cnt"].to_numpy(np.int64)}
        )

        def _lookup(tbl, h):
            idx = np.searchsorted(tbl["gh"], h)
            idx = np.clip(idx, 0, max(len(tbl["gh"]) - 1, 0))
            hit = tbl["gh"][idx] == h if len(tbl["gh"]) else np.zeros(len(h), bool)
            return np.where(hit, tbl["cnt"][idx], 0)

        def _score(b: pd.DataFrame) -> pd.DataFrame:
            tbl = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            toks = _tok_lower(b[text_col])
            ids = b[id_col].to_numpy(np.int64)
            out_id, out_n, out_m = [], [], []
            for did, t in zip(ids, toks.to_numpy()):
                if len(t) < 2:
                    out_id.append(did); out_n.append(0); out_m.append(0)
                    continue
                arr = np.asarray(t, dtype=object)
                cp = _lookup(tbl, pd.util.hash_array(arr[:-1]))
                bi = np.char.add(np.char.add(arr[:-1].astype(str), " "),
                                 arr[1:].astype(str)).astype(object)
                cb = _lookup(tbl, pd.util.hash_array(bi))
                micro = _nll_micro(cp.astype(np.float64), cb.astype(np.float64))
                out_id.append(did)
                out_n.append(len(micro))
                out_m.append(round(int(micro.sum()) / (len(micro) * 1000.0)))
            return pd.DataFrame(
                {"doc_id": np.asarray(out_id, np.int64),
                 "n_transitions": np.asarray(out_n, np.int64),
                 "nll_milli": np.asarray(out_m, np.int64)}
            )

        return normalize_blocks(
            docs.map_batches(_score, batch_format="pandas"), BIGRAM_PPL_SCHEMA
        )

    # --- over the gate: ONE gram-keyed flag join + doc-keyed mean.
    # Transitions emit TWO rows each (kind 0 = prev-unigram hash, kind
    # 1 = bigram hash) so the 64-bit hash only ever travels in the
    # SHARED join-key column: cogroup_join's transport union gives a
    # column present on only one side NaNs, upcasting uint64 to
    # float64 and destroying the low bits (measured: every bigram
    # lookup missed) — carry columns must never hold 64-bit hashes.
    # Per-transition integer micro-nats are summed inside the
    # doc-keyed reduce, bit-equal to the broadcast path.
    from .relational import cogroup_join

    def _kind_rows(b: pd.DataFrame) -> pd.DataFrame:
        base = _doc_transitions(b)
        if len(base) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64"),
                                 "kind": pd.Series([], dtype="int64"),
                                 "gh": pd.Series([], dtype="uint64")})
        base = base.copy()
        base["pos"] = base.groupby("doc_id", sort=False).cumcount()
        return pd.concat(
            [
                pd.DataFrame({"doc_id": base["doc_id"], "pos": base["pos"],
                              "kind": np.int64(0), "gh": base["ghp"]}),
                pd.DataFrame({"doc_id": base["doc_id"], "pos": base["pos"],
                              "kind": np.int64(1), "gh": base["ghb"]}),
            ],
            ignore_index=True,
        )

    rows = docs.map_batches(_kind_rows, batch_format="pandas")
    r_schema = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64()),
                          ("kind", pa.int64()), ("gh", pa.uint64())])
    j = cogroup_join(
        rows, model, on=["gh"], how="left_outer",
        left_schema=r_schema, right_schema=cnt_schema,
    )

    def _doc_mean(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "pos", "kind"], kind="stable")
        cnt = g["cnt"].fillna(0).to_numpy(np.float64)
        k = g["kind"].to_numpy(np.int64)
        cp, cb = cnt[k == 0], cnt[k == 1]
        sub = pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(np.int64)[k == 0],
             "micro": _nll_micro(cp, cb)}
        )
        agg = sub.groupby("doc_id", sort=False).agg(
            n_transitions=("micro", "size"), s=("micro", "sum")
        )
        n = agg["n_transitions"].to_numpy(np.int64)
        return pd.DataFrame(
            {"doc_id": agg.index.to_numpy(np.int64),
             "n_transitions": n,
             "nll_milli": np.round(
                 agg["s"].to_numpy(np.float64) / (n * 1000.0)
             ).astype(np.int64)}
        )

    from .infer import bucketed_reduce as _br

    scored = _br(j, ["doc_id"], _doc_mean, BIGRAM_PPL_SCHEMA)
    zeros = normalize_blocks(
        docs.map_batches(_zeros_for, batch_format="pandas"), BIGRAM_PPL_SCHEMA
    )
    return scored.union(zeros)


# ---------------------------------------------------------------------------
# DSIR-shaped importance scoring (target-vs-raw token-ratio features)
# ---------------------------------------------------------------------------

DSIR_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("imp_per_token", pa.int64()),
    ]
)


def importance_scores(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
    scale: int = 10**6,
    driver_max_vocab: int = DRIVER_MAX_PPL_VOCAB,
) -> ray.data.Dataset:
    """Importance score of every document toward a TARGET subset —
    the DSIR selection shape (Xie et al., arXiv:2302.03169: estimate
    importance weights from hashed n-gram LMs, resample the raw pool
    toward the target). The float log-likelihood ratio is replaced by
    an integer count-ratio feature so the score is engine-portable and
    hash-exact:

        w(t)  = (scale * (ct(t) + 1)) // (cr(t) + 1)      <= scale
        score = sum of w over the doc's token OCCURRENCES
        imp_per_token = score // n_tokens                 (length-free)

    where ``ct`` counts token occurrences inside the target subset
    (rows with ``target_col == target_value``) and ``cr`` over the
    whole pool. High = the doc's tokens are relatively MORE frequent
    in the target distribution. One bucketed token-count shuffle fits
    both count tables at once (vocabulary residue count-gated, Heap's
    law); the weight table broadcasts via ``ray.put``; scoring is
    map-side searchsorted — zero further shuffle. Docs with zero
    tokens emit no row (mirrors the SQL twin's explode join)."""
    count_schema = pa.schema(
        [("token", pa.string()), ("cr", pa.int64()), ("ct", pa.int64())]
    )

    def _counts(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or text_col not in b.columns:
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype="object"),
                    "cr": pd.Series([], dtype="int64"),
                    "ct": pd.Series([], dtype="int64"),
                }
            )
        b = b.reset_index(drop=True)
        toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
        flat = toks.explode().dropna()
        if len(flat) == 0:
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype="object"),
                    "cr": pd.Series([], dtype="int64"),
                    "ct": pd.Series([], dtype="int64"),
                }
            )
        is_t = (b[target_col] == target_value).to_numpy()
        df = pd.DataFrame(
            {
                "token": flat.to_numpy(object),
                "cr": np.ones(len(flat), np.int64),
                "ct": is_t[flat.index.to_numpy()].astype(np.int64),
            }
        )
        return df.groupby("token", sort=False, as_index=False).sum()

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", sort=False, as_index=False)[["cr", "ct"]].sum()

    counts = bucketed_reduce(
        ds.select_columns([text_col, target_col]),
        ["token"],
        _sum,
        count_schema,
        combiner=_counts,
    ).materialize()
    n_vocab = counts.count()
    if n_vocab > driver_max_vocab:
        raise ValueError(
            f"importance_scores: vocabulary {n_vocab} exceeds the driver "
            f"gate ({driver_max_vocab}); hash-bucket tokens first"
        )
    vocab = counts.to_pandas()
    if len(vocab) == 0:
        return ray.data.from_arrow(DSIR_SCHEMA.empty_table())
    vocab = vocab.sort_values("token", kind="stable")
    w = (
        scale * (vocab["ct"].to_numpy(np.int64) + 1)
    ) // (vocab["cr"].to_numpy(np.int64) + 1)
    model_ref = ray.put(
        {"tokens": vocab["token"].to_numpy(object), "w": w.astype(np.int64)}
    )

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        b = b.reset_index(drop=True)
        toks = b[text_col].fillna("").str.lower().str.findall(r"\w+")
        flat = toks.explode().dropna()
        if len(flat) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "imp_per_token": pd.Series([], dtype="int64"),
                }
            )
        arr = flat.to_numpy(object)
        idx = np.searchsorted(m["tokens"], arr)
        idx = np.clip(idx, 0, len(m["tokens"]) - 1)
        hit = m["tokens"][idx] == arr
        # every token was counted in the fit pass; the `scale` fallback
        # (ct=cr=0 -> ratio 1) is unreachable but keeps the kernel total
        wt = np.where(hit, m["w"][idx], scale).astype(np.int64)
        per_doc = pd.DataFrame({"i": flat.index.to_numpy(), "w": wt}).groupby(
            "i", sort=False
        )["w"].agg(["sum", "count"])
        rows = per_doc.index.to_numpy()
        n = per_doc["count"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b[id_col].to_numpy(np.int64)[rows],
                "n_tokens": n,
                "imp_per_token": per_doc["sum"].to_numpy(np.int64) // n,
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pandas"
    )


def source_overlap_matrix(
    ds: ray.data.Dataset,
    *,
    k: int = 3,
    text_col: str = "text",
    source_col: str = "source",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Pairwise corpus-overlap matrix between sources: for every
    unordered source pair, the number of DISTINCT word ``k``-grams the
    two sources share — the cross-crawl contamination diagnostic run
    before mixing snapshots into one training corpus (how much of feed
    B is already in feed A?).

    Plan: one map pass emits per-block distinct ``(gram_hash,
    source)`` pairs (the combiner keeps the shuffle input at
    distinct-per-block, never raw occurrences); ONE gram-keyed
    bucketed reduce re-dedups and expands each gram's source set into
    sorted pairs (bounded by n_sources² per gram — the source domain
    is small by construction); a final tiny grouped sum folds the
    per-bucket pair partials. The full gram domain never lands
    anywhere — only pair counts leave the reduce.

    Gram identity is the shared 64-bit hash contract
    (:func:`_doc_distinct_gram_hashes`): cross-gram collisions
    ~ n²/2⁶⁴, negligible at real corpus sizes.
    """
    pair_schema = pa.schema(
        [
            ("source_a", pa.string()),
            ("source_b", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def _gram_source(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "gh": pd.Series([], dtype="int64"),
                "source": pd.Series([], dtype="object"),
            }
        )
        if len(b) == 0 or text_col not in b.columns:
            return empty
        rows, gh = _doc_distinct_gram_hashes(b[text_col], k)
        if len(rows) == 0:
            return empty
        return pd.DataFrame(
            {
                "gh": gh.view(np.int64),
                "source": b[source_col].to_numpy(object)[rows],
            }
        ).drop_duplicates()

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["gh", "source"])

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["gh", "source"])
        m = g.merge(g, on="gh")
        m = m[m["source_x"] < m["source_y"]]
        out = (
            m.groupby(["source_x", "source_y"], as_index=False)
            .size()
            .rename(
                columns={"source_x": "source_a", "source_y": "source_b", "size": "n"}
            )
        )
        out["n"] = out["n"].astype("int64")
        return out

    grams = ds.select_columns([source_col, text_col]).map_batches(
        _gram_source, batch_format="pandas"
    )
    partials = bucketed_reduce(
        grams, ["gh"], _pairs, pair_schema, combiner=_dd, num_buckets=num_buckets
    )
    return grouped_sums(partials, ["source_a", "source_b"], {"n_shared": "n"})


LINKS_SCHEMA = pa.schema([("dst_url", pa.string()), ("n_inlinks", pa.int64())])
LINK_EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])


def link_edges(
    pages: ray.data.Dataset,
    *,
    url_col: str = "url",
    html_col: str = "html",
) -> ray.data.Dataset:
    """Web-graph edge extraction over the raw ``html`` column:
    ``(src, dst)`` with anchor MULTIPLICITY preserved (repeated links
    weigh more, matching pagerank_int's multigraph semantics). Per
    page one compiled-regex href scan — the per-document parse class,
    like chunking."""
    from ..functions.html_extract import extract_links

    def _extract(b: pd.DataFrame) -> pd.DataFrame:
        srcs: list[str] = []
        dsts: list[str] = []
        for url, blob in zip(b[url_col], b[html_col]):
            links = extract_links(blob or b"")
            srcs.extend([url] * len(links))
            dsts.extend(links)
        return pd.DataFrame(
            {
                "src": pd.Series(srcs, dtype="object"),
                "dst": pd.Series(dsts, dtype="object"),
            }
        )

    return pages.select_columns([url_col, html_col]).map_batches(
        _extract, batch_format="pandas"
    )


def link_counts(
    pages: ray.data.Dataset,
    *,
    html_col: str = "html",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Inbound-link counts over the raw ``html`` column — the web-graph
    edge extraction every crawl pipeline runs (host ranking, seed
    discovery, spam fan-in). Per page one compiled-regex ``href``
    scan (the per-document parse class, like chunking); the per-block
    combiner collapses to (dst, partial count) so the shuffle carries
    the LINK-TARGET domain, never one row per anchor."""
    from ..functions.html_extract import extract_links
    from .infer import bucketed_reduce

    def _extract(b: pd.DataFrame) -> pd.DataFrame:
        dsts: list[str] = []
        for blob in b[html_col]:
            dsts.extend(extract_links(blob or b""))
        if not dsts:
            return pd.DataFrame(
                {
                    "dst_url": pd.Series([], dtype="object"),
                    "n_inlinks": pd.Series([], dtype="int64"),
                }
            )
        vc = pd.Series(dsts).value_counts(sort=False)
        return pd.DataFrame(
            {
                "dst_url": vc.index.to_numpy(object),
                "n_inlinks": vc.to_numpy(np.int64),
            }
        )

    def _comb(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "dst_url" not in b.columns:
            return pd.DataFrame(
                {
                    "dst_url": pd.Series([], dtype="object"),
                    "n_inlinks": pd.Series([], dtype="int64"),
                }
            )
        return b.groupby("dst_url", as_index=False)["n_inlinks"].sum()

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("dst_url", as_index=False)["n_inlinks"].sum()
        out["n_inlinks"] = out["n_inlinks"].astype("int64")
        return out

    edges = pages.select_columns([html_col]).map_batches(
        _extract, batch_format="pandas"
    )
    return bucketed_reduce(
        edges, ["dst_url"], _sum, LINKS_SCHEMA, combiner=_comb,
        num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# Max-min-fair source budget allocation (water-filling)
# ---------------------------------------------------------------------------

QUOTA_SCHEMA = pa.schema(
    [("source", pa.string()), ("n_docs", pa.int64()), ("quota", pa.int64())]
)


def waterfill_threshold(counts: np.ndarray, budget: int) -> int:
    """Largest integer cap T with ``sum(min(n_i, T)) <= budget``
    (max-min fairness without remainder distribution); T = max(n)
    when the budget covers everything. Closed form over the sorted
    counts + prefix sums — the same arithmetic the SQL twin runs."""
    n = np.sort(counts.astype(np.int64))
    k = len(n)
    if k == 0 or budget <= 0:
        return 0
    total = int(n.sum())
    if total <= budget:
        return int(n[-1])
    prefix = np.concatenate([[0], np.cumsum(n)[:-1]])
    # with cap T in [n_{j-1}, n_j): f(T) = prefix_j + (k - j) * T
    best = 0
    for j in range(k):
        t = (budget - int(prefix[j])) // (k - j)
        lo = int(n[j - 1]) if j > 0 else 0
        if t >= lo:
            best = max(best, min(t, int(n[j])))
    return best


def source_budget_quotas(
    docs: ray.data.Dataset,
    key_col: str,
    *,
    budget: int,
    driver_max_keys: int = 5_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """``(source, n_docs, quota)`` — allocate a global document budget
    across sources max-min fairly: every source keeps ``min(n, T)``
    docs where T is the largest uniform cap that fits the budget (the
    data-mixing step before :func:`~.relational.cap_per_group`
    enforces the quota). Deterministic integers; SQL-oracle-exact
    (window prefix-sum twin computes the identical T).

    COUNT-GATED on the number of distinct sources: under the gate the
    per-source counts collect and the closed form runs; over it, T is
    found by BINARY SEARCH on the cap — each probe is one MAP-ONLY
    clipped-sum pass over the (already aggregated, source-sized)
    counts dataset, <= 63 passes, no extra shuffle."""
    cnt_schema = pa.schema([("source", pa.string()), ("n_docs", pa.int64())])

    def _cnt(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"source": pd.Series(dtype="object"),
                 "n_docs": pd.Series(dtype="int64")}
            )
        if "n_docs" not in b.columns:  # raw rows (combiner re-entry safe)
            b = pd.DataFrame(
                {"source": b[key_col].astype(str).to_numpy(),
                 "n_docs": np.ones(len(b), dtype=np.int64)}
            )
        return b.groupby("source", as_index=False, sort=False)["n_docs"].sum()

    counts = sanitize_for_join(
        bucketed_reduce(
            docs.select_columns([key_col]), ["source"], _cnt, cnt_schema,
            combiner=_cnt, num_buckets=num_buckets,
        ),
        cnt_schema,
    ).materialize()

    n_keys = counts.count()
    if n_keys == 0:
        return ray.data.from_arrow(QUOTA_SCHEMA.empty_table())

    if n_keys <= driver_max_keys:
        df = counts.to_pandas()
        t = waterfill_threshold(df["n_docs"].to_numpy(), budget)
    else:
        def _clipped_sum(cap: int) -> int:
            parts = counts.map_batches(
                lambda b, _c=cap: pd.DataFrame(
                    {"s": [int(np.minimum(b["n_docs"].to_numpy(), _c).sum())]}
                )
                if len(b)
                else pd.DataFrame({"s": pd.Series(dtype="int64")}),
                batch_format="pandas",
            ).to_pandas()
            return int(parts["s"].sum()) if len(parts) else 0

        mx = counts.map_batches(
            lambda b: pd.DataFrame({"m": [int(b["n_docs"].max())]})
            if len(b)
            else pd.DataFrame({"m": pd.Series(dtype="int64")}),
            batch_format="pandas",
        ).to_pandas()
        hi = int(mx["m"].max()) if len(mx) else 0
        if _clipped_sum(hi) <= budget:
            t = hi
        else:
            lo = 0  # invariant: f(lo) <= budget < f(hi)
            while hi - lo > 1:
                mid = (lo + hi) // 2
                if _clipped_sum(mid) <= budget:
                    lo = mid
                else:
                    hi = mid
            t = lo

    def _quota(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return QUOTA_SCHEMA.empty_table().to_pandas()
        n = b["n_docs"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "source": b["source"].to_numpy(),
                "n_docs": n,
                "quota": np.minimum(n, t),
            }
        )

    return normalize_blocks(
        counts.map_batches(_quota, batch_format="pandas"), QUOTA_SCHEMA
    )
