"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality stats, token counting, document fingerprinting.

These operate on the ``documents``-shaped table (``doc_id, text, lang,
source, n_chars``) or any table with a text column. All are stateless
vectorized ``map_batches`` (pandas str kernels over Arrow blocks);
definitions are chosen to be exactly expressible in ANSI SQL so the
DuckDB oracle can verify them value-for-value.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# Language-marker stopwords (standalone words). Order = tie-break
# preference: en > de > fr > und.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pour", "que", "dans", "une", "des"],
}

PUNCT_PATTERN = r"[.!?,;:]"


def _marker_re(lang: str) -> str:
    return r"\b(?:" + "|".join(LANG_MARKERS[lang]) + r")\b"


def token_counts(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """``(id, n_tokens)`` — whitespace tokenization (str.split semantics:
    runs of whitespace, leading/trailing ignored, empty -> 0)."""

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        stripped = t.str.strip()
        n = stripped.str.split().str.len().fillna(0)
        n = n.where(stripped.str.len() > 0, 0)
        return pd.DataFrame({id_col: batch[id_col], "n_tokens": n.astype("int64")})

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


def doc_stats(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """``(id, n_chars, n_punct, n_tokens)`` — integer quality stats."""

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        stripped = t.str.strip()
        n_tok = stripped.str.split().str.len().fillna(0)
        n_tok = n_tok.where(stripped.str.len() > 0, 0)
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_chars": t.str.len().astype("int64"),
                "n_punct": t.str.count(PUNCT_PATTERN).astype("int64"),
                "n_tokens": n_tok.astype("int64"),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


def lang_id(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """``(id, lang_pred)`` — stopword-marker language heuristic over
    {en, de, fr}; 'und' when no marker hits. Ties prefer en > de > fr."""
    regexes = {lang: _marker_re(lang) for lang in LANG_MARKERS}

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        low = batch[text_col].fillna("").str.lower()
        counts = {lang: low.str.count(rx) for lang, rx in regexes.items()}
        en, de, fr = counts["en"], counts["de"], counts["fr"]
        pred = np.where(
            (en == 0) & (de == 0) & (fr == 0),
            "und",
            np.where((en >= de) & (en >= fr), "en", np.where(de >= fr, "de", "fr")),
        )
        return pd.DataFrame({id_col: batch[id_col], "lang_pred": pred})

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


def quality_score(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Heuristic quality scoring (length / punct ratio / stopword ratio /
    mean word length), 0..1. Float-valued AND hash-exact: the SQL twin
    mirrors the ratio/clip/weighted-sum chain in IEEE op order over
    the :func:`doc_stats`/lang-marker integer inputs."""
    en_re = _marker_re("en")

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        n_chars = t.str.len()
        toks = t.str.strip().str.split()
        n_tok = toks.str.len().fillna(0).astype("int64")
        n_punct = t.str.count(PUNCT_PATTERN)
        n_stop = t.str.lower().str.count(en_re)
        mean_wl = (n_chars - n_tok + 1).clip(lower=0) / n_tok.clip(lower=1)
        len_score = (n_tok.clip(upper=1000) / 1000.0).astype(float)
        punct_ratio = (n_punct / n_chars.clip(lower=1)).astype(float)
        stop_ratio = (n_stop / n_tok.clip(lower=1)).astype(float)
        wl_score = 1.0 - (mean_wl - 5.0).abs().clip(upper=5.0) / 5.0
        score = (
            0.3 * len_score
            + 0.3 * stop_ratio.clip(upper=0.5) * 2.0
            + 0.2 * (1.0 - punct_ratio.clip(upper=0.2) * 5.0)
            + 0.2 * wl_score
        )
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "quality": score.astype("float64"),
                "n_tokens": n_tok,
                "stop_ratio": stop_ratio,
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


def fingerprints(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """``(id, md5, simhash64)`` — exact content hash + 64-bit SimHash
    over word tokens (rolling document fingerprint)."""

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        md5s, sims = [], []
        for t in batch[text_col].fillna(""):
            md5s.append(hashlib.md5(t.encode("utf-8")).hexdigest())
            sims.append(simhash64(t))
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "md5": md5s,
                "simhash64": pd.array(sims, dtype="uint64"),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


_WORD_RE = re.compile(r"\w+")


def _token_hash(tok: str) -> int:
    return int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")


def simhash64(text: str) -> int:
    """64-bit SimHash over lowercased word tokens (deterministic,
    seed-free: md5-based token hashes). Vectorized bit counting via
    unpackbits over the stacked digest bytes."""
    toks = _WORD_RE.findall(text.lower())
    if not toks:
        return 0
    digests = np.frombuffer(
        b"".join(hashlib.md5(t.encode("utf-8")).digest()[:8] for t in toks),
        dtype=np.uint8,
    ).reshape(len(toks), 8)
    bits = np.unpackbits(digests, axis=1, bitorder="big")  # (n, 64)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out_bits = (acc > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(out_bits, bitorder="big").tobytes(), "big")


def compression_ratio(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-document zlib compression ratio — the CCNet/RefinedWeb-style
    "too repetitive / too random" hygiene signal: highly repetitive
    boilerplate compresses far below ~0.3x, random/binary junk sits
    near 1x, natural prose lands in between.

    ``ratio_milli = compressed_bytes * 1000 // max(1, raw_bytes)`` —
    integer fixed-point at zlib level 6 (deterministic: fixed level,
    single stream, no dictionary). The per-row loop body is C (zlib),
    same pattern as the md5 ``fingerprints`` kernel; no SQL oracle
    (DuckDB has no zlib), rows-only + pinned unit tests.
    """
    import zlib

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        raw = [s.encode("utf-8") for s in t.to_numpy(dtype=object)]
        n_bytes = np.fromiter((len(b) for b in raw), dtype=np.int64, count=len(raw))
        n_comp = np.fromiter(
            (len(zlib.compress(b, 6)) for b in raw), dtype=np.int64, count=len(raw)
        )
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_bytes": n_bytes,
                "n_compressed": n_comp,
                "ratio_milli": n_comp * 1000 // np.maximum(1, n_bytes),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


READABILITY_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_words", pa.int64()),
        ("n_sentences", pa.int64()),
        ("n_syllables", pa.int64()),
        ("flesch_x1000", pa.int64()),
    ]
)


def readability(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Integer-exact Flesch reading-ease per document — the grade-level
    quality signal CCNet/Gopher-style curation buckets on.

    Counts are regex-parity with the SQL oracle: words = ``\\w+``
    matches, sentences = ``[.!?]+`` runs, syllables = ``[aeiouy]+``
    vowel groups in the lowercased text (the classic heuristic).
    ``flesch_x1000 = 206835 - (1015 * w) // max(s,1) - (84600 * y) //
    max(w,1)`` — every operand positive, so Python floor division and
    DuckDB's truncating ``//`` agree and the score hash-matches; the
    float Flesch never could. Map-only, zero shuffles."""

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        w = t.str.count(r"\w+").astype("int64")
        s = t.str.count(r"[.!?]+").astype("int64")
        y = t.str.lower().str.count(r"[aeiouy]+").astype("int64")
        wg = w.clip(lower=1)
        sg = s.clip(lower=1)
        flesch = 206835 - (1015 * w) // sg - (84600 * y) // wg
        return pd.DataFrame(
            {
                id_col: batch[id_col].astype("int64"),
                "n_words": w,
                "n_sentences": s,
                "n_syllables": y,
                "flesch_x1000": flesch.astype("int64"),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


CHARSET_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_ascii_alpha", pa.int64()),
        ("n_digit", pa.int64()),
        ("n_space", pa.int64()),
        ("n_punct", pa.int64()),
        ("n_non_ascii", pa.int64()),
    ]
)

# explicit classes shared verbatim with the SQL oracle — Python's \s
# and RE2's \s disagree on unicode whitespace, so neither is used
_CS_ALPHA = r"[A-Za-z]"
_CS_DIGIT = r"[0-9]"
_CS_SPACE = r"[ \t\n\r]"
_CS_PUNCT = r"""[.,;:!?'"()\[\]-]"""
_CS_NON_ASCII = r"[^\x00-\x7F]"


def charset_profile(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-document character-class census (ASCII letters / digits /
    whitespace / punctuation / non-ASCII) — the encoding-health signal
    a crawl-hygiene pass filters mojibake and binary-spill documents
    on. Map-only vectorized regex counts; classes are explicit
    character sets shared byte-for-byte with the SQL twin (hash-exact
    — Python and RE2 ``\\s``/``\\w`` unicode semantics differ, the
    explicit classes sidestep the dialect gap)."""

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        return pd.DataFrame(
            {
                id_col: batch[id_col].astype("int64"),
                "n_ascii_alpha": t.str.count(_CS_ALPHA).astype("int64"),
                "n_digit": t.str.count(_CS_DIGIT).astype("int64"),
                "n_space": t.str.count(_CS_SPACE).astype("int64"),
                "n_punct": t.str.count(_CS_PUNCT).astype("int64"),
                "n_non_ascii": t.str.count(_CS_NON_ASCII).astype("int64"),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pandas")


CONFUSION_SCHEMA = pa.schema(
    [("lang_pred", pa.string()), ("lang_true", pa.string()), ("n", pa.int64())]
)
KAPPA_SCHEMA = pa.schema(
    [
        ("n_total", pa.int64()),
        ("n_agree", pa.int64()),
        ("kappa_num", pa.int64()),
        ("kappa_den", pa.int64()),
    ]
)


def lang_confusion(
    ds: ray.data.Dataset,
    *,
    truth_col: str = "lang",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Confusion matrix of the stopword-marker language heuristic
    against the stored labels — the evaluation loop every classifier
    stage needs. The prediction and the truth ride the SAME row, so
    this is map-side counting plus one tiny grouped sum (no join)."""
    from .infer import normalize_blocks
    from ..stages.relational import grouped_sums

    regexes = {lang: _marker_re(lang) for lang in LANG_MARKERS}

    def _cells(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "lang_pred": pd.Series(dtype="object"),
                    "lang_true": pd.Series(dtype="object"),
                    "one": pd.Series(dtype="int64"),
                }
            )
        low = batch["text"].fillna("").str.lower()
        counts = {lang: low.str.count(rx) for lang, rx in regexes.items()}
        en, de, fr = counts["en"], counts["de"], counts["fr"]
        pred = np.where(
            (en == 0) & (de == 0) & (fr == 0),
            "und",
            np.where((en >= de) & (en >= fr), "en", np.where(de >= fr, "de", "fr")),
        )
        return pd.DataFrame(
            {
                "lang_pred": pred,
                "lang_true": batch[truth_col].astype(str).to_numpy(),
                "one": np.ones(len(batch), dtype=np.int64),
            }
        )

    cells = ds.select_columns([id_col, "text", truth_col]).map_batches(
        _cells, batch_format="pandas"
    )
    return normalize_blocks(
        grouped_sums(cells, ["lang_pred", "lang_true"], {"n": "one"}),
        CONFUSION_SCHEMA,
    )


def kappa_from_confusion(conf: ray.data.Dataset) -> pd.DataFrame:
    """Cohen's kappa from a confusion matrix as EXACT INTEGERS —
    ``kappa = kappa_num / kappa_den`` with ``kappa_num = N*agree -
    Σ_k row_k*col_k`` and ``kappa_den = N² - Σ_k row_k*col_k`` (no
    division, so negative-kappa floor-vs-truncate dialect traps never
    arise). The matrix is labels² rows by construction — collecting it
    is the definition of small."""
    df = conf.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {
                "n_total": pd.Series([0], dtype="int64"),
                "n_agree": pd.Series([0], dtype="int64"),
                "kappa_num": pd.Series([0], dtype="int64"),
                "kappa_den": pd.Series([0], dtype="int64"),
            }
        )
    n = int(df["n"].sum())
    agree = int(df.loc[df["lang_pred"] == df["lang_true"], "n"].sum())
    rows = df.groupby("lang_pred")["n"].sum()
    cols = df.groupby("lang_true")["n"].sum()
    labels = set(rows.index) | set(cols.index)
    marg = sum(int(rows.get(l, 0)) * int(cols.get(l, 0)) for l in labels)
    return pd.DataFrame(
        {
            "n_total": pd.Series([n], dtype="int64"),
            "n_agree": pd.Series([agree], dtype="int64"),
            "kappa_num": pd.Series([n * agree - marg], dtype="int64"),
            "kappa_den": pd.Series([n * n - marg], dtype="int64"),
        }
    )


def calibration_bins(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Reliability-diagram bins for the english-stopword confidence
    score against the :func:`lang_id` label — the calibration audit a
    corpus-filter model gets before its threshold is trusted. Score
    ``score_pm = min(en_markers * 1000 // (n_tokens + 1), 999)`` is an
    integer per-mille confidence; bin = ``score_pm // 100`` (10 bins);
    per bin emits ``(bin, n_docs, n_pos, sum_score_pm)`` — all BIGINT
    so exact calibration gaps/ECE are derivable downstream and the row
    hash-matches the SQL twin (a float mean never would). Map-side
    per-block partials (<= 10 rows each), one tiny bucketed sum."""
    from .infer import bucketed_reduce

    en_re = _marker_re("en")
    regexes = {lang: _marker_re(lang) for lang in LANG_MARKERS}

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or text_col not in batch.columns:
            return pd.DataFrame(
                {
                    "bin": pd.Series(dtype="int64"),
                    "n_docs": pd.Series(dtype="int64"),
                    "n_pos": pd.Series(dtype="int64"),
                    "sum_score_pm": pd.Series(dtype="int64"),
                }
            )
        t = batch[text_col].fillna("")
        low = t.str.lower()
        stripped = t.str.strip()
        n_tok = stripped.str.split().str.len().fillna(0)
        n_tok = n_tok.where(stripped.str.len() > 0, 0).astype("int64")
        counts = {lang: low.str.count(rx) for lang, rx in regexes.items()}
        en, de, fr = counts["en"], counts["de"], counts["fr"]
        is_en = ~((en == 0) & (de == 0) & (fr == 0)) & (en >= de) & (en >= fr)
        score_pm = np.minimum(
            en.to_numpy(np.int64) * 1000 // (n_tok.to_numpy() + 1), 999
        )
        f = pd.DataFrame(
            {
                "bin": score_pm // 100,
                "n_docs": np.ones(len(batch), dtype=np.int64),
                "n_pos": is_en.astype("int64").to_numpy(),
                "sum_score_pm": score_pm,
            }
        )
        return f.groupby("bin", as_index=False).sum()

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby("bin", as_index=False)[
            ["n_docs", "n_pos", "sum_score_pm"]
        ].sum()

    out_schema = pa.schema(
        [
            pa.field("bin", pa.int64()),
            pa.field("n_docs", pa.int64()),
            pa.field("n_pos", pa.int64()),
            pa.field("sum_score_pm", pa.int64()),
        ]
    )
    return bucketed_reduce(
        ds.select_columns([id_col, text_col]).map_batches(
            _partial, batch_format="pandas", batch_size=None
        ),
        ["bin"],
        _sum,
        out_schema,
        combiner=_sum,
    )


OOV_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("n_tokens", pa.int64()),
        pa.field("n_oov", pa.int64()),
    ]
)


def oov_rate(
    ds: ray.data.Dataset,
    *,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document out-of-vocabulary counts against the corpus'
    top-``vocab_size`` ``\\w+`` tokens (count desc, token asc — the
    deterministic tokenizer-budget vocabulary): ``(doc_id, n_tokens,
    n_oov)``. Two-pass broadcast-dictionary shape: pass 1 is the
    existing distributed term count + local-top-k merge (the vocab is
    CAPPED, so the driver residue is bounded by construction); the
    sorted vocab broadcasts once via ``ray.put`` and pass 2 is
    map-only (np.isin against the sorted array)."""
    import ray as _ray

    from .relational import topk_dataset
    from .vocab import term_counts

    vocab_df = topk_dataset(
        term_counts(ds, text_col), ["n", "token"], vocab_size,
        descending=[True, False],
    ).to_pandas()
    vocab = np.sort(vocab_df["token"].to_numpy(object)) if len(vocab_df) else np.array([], object)
    vocab_ref = _ray.put(vocab)

    def _count(batch: pd.DataFrame) -> pd.DataFrame:
        v = _ray.get(vocab_ref) if isinstance(vocab_ref, _ray.ObjectRef) else vocab_ref
        toks = batch[text_col].fillna("").str.lower().str.findall(r"\w+")
        lens = toks.str.len().fillna(0).astype("int64").to_numpy()
        flat = (
            np.concatenate([t for t in toks.to_numpy() if t])
            if lens.sum()
            else np.array([], object)
        )
        in_vocab = (
            np.isin(flat, v) if len(flat) else np.array([], bool)
        )
        # per-doc slices of the flat token stream: prefix-sum the
        # in-vocab mask once, difference at the slice bounds (no
        # per-doc Python)
        ends = np.cumsum(lens)
        starts = ends - lens
        cs = np.concatenate([[0], np.cumsum(in_vocab.astype(np.int64))])
        oov = lens - (cs[ends] - cs[starts])
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_tokens": lens,
                "n_oov": oov,
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _count, batch_format="pandas"
    )


AUC_SCHEMA = pa.schema(
    [
        pa.field("auc_num2", pa.int64()),
        pa.field("auc_den2", pa.int64()),
        pa.field("n_pos", pa.int64()),
        pa.field("n_neg", pa.int64()),
    ]
)


def auc_sums(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Exact integer ROC-AUC (doubled Mann-Whitney U with the
    standard half-credit tie handling) of the english-stopword
    confidence score against the lang-ID label:
    ``AUC = auc_num2 / auc_den2`` with ``auc_num2 = sum_s
    n_pos(s) * (2 * n_neg_below(s) + n_neg(s))`` and ``auc_den2 =
    2 * P * N`` — all BIGINT, hash-exact vs a window SQL twin. The
    score domain is BOUNDED (integer per-mille, <= 1000 values), so
    the per-score histogram reduce is distributed and the cumulative
    pass runs on a <= 1000-row residue."""
    from .infer import bucketed_reduce

    en_re = _marker_re("en")
    regexes = {lang: _marker_re(lang) for lang in LANG_MARKERS}

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or text_col not in batch.columns:
            return pd.DataFrame(
                {
                    "score_pm": pd.Series(dtype="int64"),
                    "np_": pd.Series(dtype="int64"),
                    "nn_": pd.Series(dtype="int64"),
                }
            )
        t = batch[text_col].fillna("")
        low = t.str.lower()
        stripped = t.str.strip()
        n_tok = stripped.str.split().str.len().fillna(0)
        n_tok = n_tok.where(stripped.str.len() > 0, 0).astype("int64")
        counts = {lang: low.str.count(rx) for lang, rx in regexes.items()}
        en, de, fr = counts["en"], counts["de"], counts["fr"]
        is_en = (~((en == 0) & (de == 0) & (fr == 0)) & (en >= de) & (en >= fr)).to_numpy()
        score_pm = np.minimum(
            en.to_numpy(np.int64) * 1000 // (n_tok.to_numpy() + 1), 999
        )
        f = pd.DataFrame(
            {
                "score_pm": score_pm,
                "np_": is_en.astype(np.int64),
                "nn_": (~is_en).astype(np.int64),
            }
        )
        return f.groupby("score_pm", as_index=False).sum()

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        return g.groupby("score_pm", as_index=False)[["np_", "nn_"]].sum()

    hist_schema = pa.schema(
        [
            pa.field("score_pm", pa.int64()),
            pa.field("np_", pa.int64()),
            pa.field("nn_", pa.int64()),
        ]
    )
    hist = bucketed_reduce(
        ds.select_columns([id_col, text_col]).map_batches(
            _partial, batch_format="pandas", batch_size=None
        ),
        ["score_pm"],
        _sum,
        hist_schema,
        combiner=_sum,
    ).to_pandas()
    # residue bounded by the 1000-value score domain, not by rows
    hist = hist.sort_values("score_pm").reset_index(drop=True)
    below = hist["nn_"].cumsum().shift(1).fillna(0).astype("int64")
    num2 = int((hist["np_"] * (2 * below + hist["nn_"])).sum())
    p, n = int(hist["np_"].sum()), int(hist["nn_"].sum())
    return ray.data.from_arrow(
        pa.table(
            {
                "auc_num2": pa.array([num2], pa.int64()),
                "auc_den2": pa.array([2 * p * n], pa.int64()),
                "n_pos": pa.array([p], pa.int64()),
                "n_neg": pa.array([n], pa.int64()),
            }
        )
    )


RAKE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("phrase", pa.string()),
        pa.field("deg_sum", pa.int64()),
        pa.field("freq_sum", pa.int64()),
        pa.field("n_words", pa.int64()),
    ]
)


def rake_top_phrases(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """RAKE-style top keyphrase per document. Candidate phrases are
    maximal runs of non-stopword ``\\w+`` tokens (stoplist = the
    shared en markers); ``degree(w)`` sums the lengths of phrases
    containing each occurrence of ``w``, ``freq(w)`` counts
    occurrences; a phrase scores ``(deg_sum, freq_sum)`` over its word
    occurrences and the per-doc winner is ``(deg_sum desc, phrase
    asc)``. All statistics are per-document, so the operator is
    MAP-ONLY — the classic gaps-and-islands computation vectorized
    per batch; docs with no candidate phrase are absent (inner
    semantics, mirroring the SQL twin)."""
    stop = frozenset(LANG_MARKERS["en"])

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype="int64"),
                "phrase": pd.Series(dtype="object"),
                "deg_sum": pd.Series(dtype="int64"),
                "freq_sum": pd.Series(dtype="int64"),
                "n_words": pd.Series(dtype="int64"),
            }
        )
        if len(batch) == 0 or text_col not in batch.columns:
            return empty
        toks = batch[text_col].fillna("").str.lower().str.findall(r"\w+")
        lens = toks.str.len().fillna(0).astype(int).to_numpy()
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([t for t in toks.to_numpy() if t])
        doc = np.repeat(batch[id_col].to_numpy(), lens)
        pos = np.concatenate([np.arange(n, dtype=np.int64) for n in lens if n])
        df = pd.DataFrame({"d": doc, "tok": flat, "i": pos})
        df = df[~df["tok"].isin(stop)]
        if len(df) == 0:
            return empty
        df = df.sort_values(["d", "i"], kind="stable").reset_index(drop=True)
        rn = df.groupby("d", sort=False).cumcount().to_numpy()
        df["grp"] = df["i"].to_numpy() - rn
        ph = (
            df.groupby(["d", "grp"], sort=False)
            .agg(phrase=("tok", " ".join), plen=("tok", "size"))
            .reset_index()
        )
        df = df.merge(ph[["d", "grp", "plen"]], on=["d", "grp"])
        w = df.groupby(["d", "tok"], sort=False, as_index=False).agg(
            freq=("tok", "size"), degree=("plen", "sum")
        )
        df = df.merge(w, on=["d", "tok"])
        ps = df.groupby(["d", "grp"], sort=False, as_index=False).agg(
            deg_sum=("degree", "sum"), freq_sum=("freq", "sum")
        )
        full = ph.merge(ps, on=["d", "grp"])[
            ["d", "phrase", "deg_sum", "freq_sum", "plen"]
        ].drop_duplicates(["d", "phrase"])
        top = full.sort_values(
            ["d", "deg_sum", "phrase"], ascending=[True, False, True],
            kind="stable",
        ).drop_duplicates("d", keep="first")
        return pd.DataFrame(
            {
                id_col: top["d"].to_numpy(),
                "phrase": top["phrase"].to_numpy(object),
                "deg_sum": top["deg_sum"].astype("int64").to_numpy(),
                "freq_sum": top["freq_sum"].astype("int64").to_numpy(),
                "n_words": top["plen"].astype("int64").to_numpy(),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _f, batch_format="pandas"
    )
