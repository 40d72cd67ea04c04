"""Webtext corpus-hygiene operators: planted-fixture behavior,
driver-vs-distributed gate equivalence, and Python-vs-DuckDB regex
dialect parity."""

from __future__ import annotations

import duckdb
import hashlib
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ai_knowledge_graph_ray.stages.webtext import (
    decontaminate,
    line_dedup_stats,
    pii_redact,
    repetition_stats,
)

BOILER = "subscribe to our newsletter"
COOKIE = "this site uses cookies"


def _line_docs():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    f"unique opening one\n{BOILER}\nunique closing one",
                    f"{COOKIE}\nanother body line\n{BOILER}",
                    f"{COOKIE}\nsolo content here",
                    "",  # empty doc -> one empty line, never removed
                ],
            }
        )
    )


def _sorted(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values("doc_id", kind="stable").reset_index(drop=True)


class TestLineDedup:
    def test_removes_cross_doc_boilerplate(self):
        out = _sorted(line_dedup_stats(_line_docs(), min_docs=2))
        assert out["n_lines"].tolist() == [3, 3, 2, 1]
        # BOILER in docs 1+2, COOKIE in docs 2+3; doc 4's empty line exempt
        assert out["n_removed"].tolist() == [1, 2, 1, 0]
        exp1 = hashlib.md5(b"unique opening one\nunique closing one").hexdigest()
        exp2 = hashlib.md5(b"another body line").hexdigest()
        exp3 = hashlib.md5(b"solo content here").hexdigest()
        exp4 = hashlib.md5(b"").hexdigest()
        assert out["clean_md5"].tolist() == [exp1, exp2, exp3, exp4]

    def test_distributed_path_bit_equal(self):
        a = _sorted(line_dedup_stats(_line_docs(), min_docs=2))
        b = _sorted(line_dedup_stats(_line_docs(), min_docs=2, driver_max_common=0))
        pd.testing.assert_frame_equal(a, b)

    def test_matches_duckdb_on_fixture(self):
        fix = _line_docs().to_pandas()
        con = duckdb.connect()
        con.register("documents", fix)
        from ai_knowledge_graph_ray.pipelines.queries import ORACLE_SQL

        oracle = (
            con.sql(ORACLE_SQL["doc_line_dedup"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ours = _sorted(line_dedup_stats(_line_docs(), min_docs=2))
        pd.testing.assert_frame_equal(
            ours[sorted(ours.columns)].astype({"n_lines": "int64"}),
            oracle[sorted(oracle.columns)],
            check_dtype=False,
        )


def _decon_tables():
    bench = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100, 101], pa.int64()),
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "completely separate benchmark content here",
                ],
            }
        )
    )
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    "watch the quick brown fox run",  # shares 'the quick brown' + 'quick brown fox'
                    "no overlap with anything else at all",
                    "separate benchmark content appears again today",  # shares 1 gram
                    "xy",  # < k tokens: no complete gram -> absent from output
                ],
            }
        )
    )
    return train, bench


class TestDecontaminate:
    def test_planted_overlap_counts(self):
        train, bench = _decon_tables()
        out = _sorted(decontaminate(train, bench, k=3))
        assert out["doc_id"].tolist() == [1, 2, 3]  # doc 4 has no 3-gram
        assert out["n_shared_grams"].tolist() == [2, 0, 1]
        assert out["contaminated"].tolist() == [1, 0, 1]

    def test_distributed_path_bit_equal(self):
        train, bench = _decon_tables()
        a = _sorted(decontaminate(train, bench, k=3))
        b = _sorted(decontaminate(train, bench, k=3, driver_max_grams=0))
        pd.testing.assert_frame_equal(a, b)

    def test_duplicate_grams_counted_once(self):
        bench = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([9], pa.int64()), "text": ["a b c"]})
        )
        train = ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([1], pa.int64()), "text": ["a b c a b c a b c"]}
            )
        )
        out = decontaminate(train, bench, k=3).to_pandas()
        # 'a b c' occurs 3x in the train doc but is ONE distinct shared gram
        assert out["n_shared_grams"].tolist() == [1]


class TestRepetition:
    def test_hand_computed(self):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": ["spam spam spam eggs", "  ", "one two one two one"],
                }
            )
        )
        out = _sorted(repetition_stats(ds))
        assert out["n_tokens"].tolist() == [4, 0, 5]
        assert out["n_distinct_tokens"].tolist() == [2, 0, 2]
        assert out["max_word_len"].tolist() == [4, 0, 3]
        assert out["top_token_count"].tolist() == [3, 0, 3]
        # doc 1 bigrams: 'spam spam' x2, 'spam eggs'; doc 3: 'one two' x2,
        # 'two one' x2
        assert out["top_bigram_count"].tolist() == [2, 0, 2]

    def test_matches_duckdb_on_fixture(self, sf_dir):
        import os

        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{os.path.join(sf_dir, 'documents.parquet')}'"
        )
        from ai_knowledge_graph_ray.pipelines.queries import ORACLE_SQL, q_doc_repetition

        oracle = (
            con.sql(ORACLE_SQL["doc_repetition"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ours = _sorted(q_doc_repetition(sf_dir))
        pd.testing.assert_frame_equal(
            ours[sorted(ours.columns)], oracle[sorted(oracle.columns)], check_dtype=False
        )


PII_TEXT = (
    "reach a.b+c@ex-ample.org or admin@sub.domain.io, backup 10.0.0.1 "
    "(call 555-123-4567 or 020.555.1234 but not 12-34-56) end 1.2.3.4"
)


class TestPiiRedact:
    def test_counts_and_redaction(self):
        ds = ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([1, 2], pa.int64()), "text": [PII_TEXT, "clean"]}
            )
        )
        out = _sorted(pii_redact(ds, with_text=True))
        assert out["n_emails"].tolist() == [2, 0]
        assert out["n_ipv4"].tolist() == [2, 0]
        assert out["n_phones"].tolist() == [2, 0]
        red = out["redacted"].iloc[0]
        assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red
        assert "@" not in red and "10.0.0.1" not in red and "555-123-4567" not in red

    def test_dialect_parity_vs_duckdb(self):
        """Python re and DuckDB RE2 must agree byte-for-byte on the
        redacted text (same leftmost non-overlapping semantics)."""
        fix = pd.DataFrame({"doc_id": [1, 2], "text": [PII_TEXT, "clean"]})
        con = duckdb.connect()
        con.register("documents", fix)
        from ai_knowledge_graph_ray.pipelines.queries import ORACLE_SQL

        oracle = (
            con.sql(ORACLE_SQL["doc_pii_redact"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ours = _sorted(pii_redact(ray.data.from_pandas(fix)))
        pd.testing.assert_frame_equal(
            ours[sorted(ours.columns)], oracle[sorted(oracle.columns)], check_dtype=False
        )


# ---------------------------------------------------------------------------
# Round-3 additions: domain stats, Gopher filter, dup-span stats
# ---------------------------------------------------------------------------

from ai_knowledge_graph_ray.stages.webtext import (  # noqa: E402
    GOPHER_MIN_TOKENS,
    domain_stats,
    dup_span_stats,
    gopher_filter,
)


class TestDomainStats:
    def test_against_pandas_twin(self):
        df = pd.DataFrame(
            {
                "doc_id": range(6),
                "source": ["a.com", "a.com", "b.org", "b.org", "b.org", "c.net"],
                "lang": ["en", "de", "en", "en", "fr", "en"],
                "text": ["one two", "drei", "x y z", "", "  un  deux ", None],
            }
        )
        out = (
            domain_stats(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        assert out["source"].tolist() == ["a.com", "b.org", "c.net"]
        assert out["n_docs"].tolist() == [2, 3, 1]
        assert out["total_chars"].tolist() == [7 + 4, 5 + 0 + 11, 0]
        assert out["total_tokens"].tolist() == [3, 5, 0]
        assert out["n_langs"].tolist() == [2, 2, 1]


class TestGopherFilter:
    def _run(self, texts):
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        return gopher_filter(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)

    def test_reason_bits(self):
        ok = " ".join(f"word{i}" for i in range(30))  # 30 tokens, healthy
        short = "too few tokens"  # bit 1
        skinny = " ".join(["a"] * 40)  # mean word len 1 -> bit 2 (+8: 1 distinct)
        bigram = " ".join(["alpha", "beta"] * 20)  # top bigram 20/40 -> bit 4 (+8)
        repeat = " ".join(["same"] * 40)  # 1 distinct of 40 -> bit 8 (+2? len4 ok, +4)
        out = self._run([ok, short, skinny, bigram, repeat])
        assert out.loc[0, "reason_mask"] == 0 and out.loc[0, "keep"] == 1
        assert out.loc[1, "reason_mask"] & 1
        assert out.loc[2, "reason_mask"] & 2
        assert out.loc[3, "reason_mask"] & 4
        assert out.loc[4, "reason_mask"] & 8
        assert (out.loc[1:, "keep"] == 0).all()

    def test_empty_doc_only_bit1(self):
        out = self._run(["", None])
        assert out["reason_mask"].tolist() == [1, 1]
        assert out["n_tokens"].tolist() == [0, 0]

    def test_threshold_boundary(self):
        exactly_min = " ".join(f"tok{i:02d}" for i in range(GOPHER_MIN_TOKENS))
        out = self._run([exactly_min])
        assert out.loc[0, "reason_mask"] == 0


class TestDupSpanStats:
    DUP = "alpha bravo charlie delta echo"  # one 5-gram, planted twice

    def _docs(self):
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3, 4, 5],
                    "text": [
                        f"{self.DUP} unique tail one",
                        f"different head words {self.DUP}",
                        "totally fresh words never once repeated anywhere else",
                        "short doc",  # < k tokens -> zeros
                        f"{self.DUP} and again {self.DUP}",  # within-doc repeat
                    ],
                }
            )
        )

    def test_planted_spans(self):
        out = (
            dup_span_stats(self._docs(), k=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [1, 2, 3, 4, 5]
        # every doc appears; n_grams = n_tokens - 4 (0 when < 5 tokens)
        assert out["n_grams"].tolist() == [4, 4, 4, 0, 8]
        # the planted gram occurs 4x corpus-wide (docs 1, 2, 5x2)
        assert out.loc[0, "n_dup_grams"] == 1
        assert out.loc[1, "n_dup_grams"] == 1
        assert out.loc[2, "n_dup_grams"] == 0
        assert out.loc[3, "n_dup_grams"] == 0
        assert out.loc[4, "n_dup_grams"] == 2

    def test_gate_equivalence(self):
        base = (
            dup_span_stats(self._docs(), k=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        forced = (
            dup_span_stats(self._docs(), k=5, driver_max_common=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(base, forced)


class TestUnigramNll:
    def test_matches_pure_python_twin(self):
        import math

        import pandas as pd

        from ai_knowledge_graph_ray.stages.webtext import unigram_nll

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the cat sat on the mat",
                    "the the the",
                    "rare unicorn words",
                    "",
                ],
            }
        )
        ds = ray.data.from_pandas(docs).repartition(3)
        got = {
            r["doc_id"]: (r["n_tokens"], r["nll_milli"])
            for r in unigram_nll(ds).take_all()
        }

        # independent twin: collections.Counter + math.log, with the
        # same per-token integer micro-nat quantization as the stage
        from collections import Counter

        toks = {r.doc_id: r.text.lower().split() for r in docs.itertuples()}
        c = Counter(t for ts in toks.values() for t in ts)
        total = sum(c.values())
        lp_micro = {t: round(math.log(n / total) * 1000000.0) for t, n in c.items()}
        for did, ts in toks.items():
            if not ts:
                assert got[did] == (0, 0)
                continue
            s = -sum(lp_micro[t] for t in ts)
            assert got[did] == (len(ts), round(s / (len(ts) * 1000.0)))
        # the all-common-token doc scores more fluent (lower NLL)
        assert got[2][1] < got[3][1]

    def test_unseen_token_smoothing(self):
        import pandas as pd

        from ai_knowledge_graph_ray.stages.webtext import unigram_nll

        docs = pd.DataFrame(
            {"doc_id": [1, 2], "text": ["common common common common", "common hapax"]}
        )
        ds = ray.data.from_pandas(docs)
        out = {
            r["doc_id"]: r["nll_milli"]
            for r in unigram_nll(ds, min_count=2).take_all()
        }
        # hapax falls below min_count -> scored as unk (0.5/total), so
        # doc 2 is strictly less fluent
        assert out[2] > out[1]

    def test_layout_independent(self):
        import pandas as pd

        from ai_knowledge_graph_ray.stages.webtext import unigram_nll

        docs = pd.DataFrame(
            {"doc_id": range(50), "text": [f"tok{i % 7} tok{i % 3} filler" for i in range(50)]}
        )
        outs = []
        for blocks in (1, 8):
            ds = ray.data.from_pandas(docs).repartition(blocks)
            outs.append(
                unigram_nll(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
            )
        assert outs[0].equals(outs[1])


class TestNfcNormalize:
    def test_composed_decomposed_and_flags(self):
        import hashlib
        import unicodedata

        import pandas as pd

        from ai_knowledge_graph_ray.stages.webtext import nfc_normalize_stats

        composed = "café résumé"
        decomposed = "café résumé"
        docs = pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": [composed, decomposed, "plain ascii"]}
        )
        out = {
            r["doc_id"]: (r["norm_md5"], r["changed"])
            for r in nfc_normalize_stats(ray.data.from_pandas(docs)).take_all()
        }
        # both forms normalize to the SAME md5 -> dedup-able
        assert out[1][0] == out[2][0]
        assert out[1][1] == 0 and out[2][1] == 1 and out[3][1] == 0
        want = hashlib.md5(
            unicodedata.normalize("NFC", decomposed).encode()
        ).hexdigest()
        assert out[2][0] == want


class TestDupSpanRedact:
    SPAN = "the quick brown fox jumps over the lazy dog tonight"

    def _ds(self, blocks=2):
        import pandas as pd

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    f"alpha beta {self.SPAN} gamma delta epsilon zeta",
                    f"one two three {self.SPAN} four five six",
                    "totally unique text with no repeats anywhere at all ok",
                ],
            }
        )
        return ray.data.from_pandas(docs).repartition(blocks)

    def test_owner_keeps_duplicate_loses(self):
        from ai_knowledge_graph_ray.stages.webtext import dup_span_redact

        out = (
            dup_span_redact(self._ds(), k=5)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert self.SPAN in out.loc[1, "text_redacted"]  # canonical owner
        assert out.loc[1, "n_removed"] == 0
        assert out.loc[2, "text_redacted"] == "one two three four five six"
        assert out.loc[2, "n_removed"] == 10
        assert out.loc[3, "n_removed"] == 0

    def test_within_doc_repeat_keeps_first(self):
        import pandas as pd

        from ai_knowledge_graph_ray.stages.webtext import dup_span_redact

        docs = pd.DataFrame(
            {"doc_id": [7], "text": [f"{self.SPAN} middle words here {self.SPAN}"]}
        )
        out = dup_span_redact(ray.data.from_pandas(docs), k=5).to_pandas()
        t = out.loc[0, "text_redacted"]
        assert t.startswith(self.SPAN) and t.endswith("middle words here")
        assert out.loc[0, "n_removed"] == 10

    def test_forced_distributed_equivalence(self):
        from ai_knowledge_graph_ray.stages.webtext import dup_span_redact

        a = (
            dup_span_redact(self._ds(), k=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            dup_span_redact(self._ds(3), k=5, driver_max_common=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)


class TestBigramNll:
    def _docs(self):
        import pandas as pd

        return pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the cat sat on the mat",
                    "the cat the cat the cat",
                    "one totally novel pairing here",
                    "single",
                ],
            }
        )

    def test_matches_pure_python_twin(self):
        import math
        from collections import Counter

        from ai_knowledge_graph_ray.stages.webtext import bigram_nll

        docs = self._docs()
        ds = ray.data.from_pandas(docs).repartition(3)
        got = {
            r["doc_id"]: (r["n_transitions"], r["nll_milli"])
            for r in bigram_nll(ds).take_all()
        }

        toks = {r.doc_id: r.text.lower().split() for r in docs.itertuples()}
        uni = Counter(t for ts in toks.values() for t in ts)
        bi = Counter(
            f"{a} {b}" for ts in toks.values() for a, b in zip(ts, ts[1:])
        )
        for did, ts in toks.items():
            if len(ts) < 2:
                assert got[did] == (0, 0)
                continue
            micros = []
            for a, b in zip(ts, ts[1:]):
                cp, cb = uni[a], bi[f"{a} {b}"]
                p = cb / cp if cb > 0 and cp > 0 else 0.5 / (cp + 1)
                micros.append(round(-math.log(p) * 1000000.0))
            want = round(sum(micros) / (len(micros) * 1000.0))
            assert got[did] == (len(ts) - 1, want)
        # self-trained model: all-hapax transitions score p=1 -> nll 0;
        # the shared-prefix doc pays for the ambiguous 'the' continuation
        assert got[3][1] == 0 and got[2][1] > 0

    def test_forced_distributed_equivalence(self):
        from ai_knowledge_graph_ray.stages.webtext import bigram_nll

        ds = ray.data.from_pandas(self._docs()).repartition(3)
        a = bigram_nll(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = (
            bigram_nll(ds, driver_max_model=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)


class TestImportanceScores:
    def test_planted_ratio_math(self):
        from ai_knowledge_graph_ray.stages.webtext import importance_scores

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    "apple banana",
                    "apple banana",
                    "zebra xylophone",
                    "apple zebra",
                    "",  # zero tokens -> no row
                ],
                "lang": ["en", "en", "de", "de", "en"],
            }
        )
        out = (
            importance_scores(ray.data.from_pandas(docs).repartition(3))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # cr: apple 3, banana 2, zebra 2, xylophone 1; ct(en): apple 2, banana 2
        # w = 1e6*(ct+1)//(cr+1): apple 750000, banana 1000000,
        # zebra 333333, xylophone 500000
        assert list(out.index) == [1, 2, 3, 4]
        assert out.loc[1, "imp_per_token"] == (750000 + 1000000) // 2
        assert out.loc[3, "imp_per_token"] == (333333 + 500000) // 2
        assert out.loc[4, "imp_per_token"] == (750000 + 333333) // 2
        # target-aligned doc outranks the off-target one
        assert out.loc[1, "imp_per_token"] > out.loc[3, "imp_per_token"]

    def test_vocab_gate_trips(self):
        import pytest

        from ai_knowledge_graph_ray.stages.webtext import importance_scores

        docs = pd.DataFrame(
            {"doc_id": [1], "text": ["a b c d e f"], "lang": ["en"]}
        )
        with pytest.raises(ValueError, match="vocabulary"):
            importance_scores(
                ray.data.from_pandas(docs), driver_max_vocab=2
            ).take_all()


class TestSourceOverlapMatrix:
    @staticmethod
    def _brute(df, k=3):
        per_source = {}
        for s, grp in df.groupby("source"):
            grams = set()
            for t in grp["text"]:
                toks = (t or "").strip().lower().split()
                grams |= {
                    " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
                }
            per_source[s] = grams
        out = {}
        srcs = sorted(per_source)
        for i, a in enumerate(srcs):
            for b in srcs[i + 1 :]:
                n = len(per_source[a] & per_source[b])
                if n:
                    out[(a, b)] = n
        return out

    def test_matches_brute(self):
        from ai_knowledge_graph_ray.stages.webtext import source_overlap_matrix

        df = pd.DataFrame(
            {
                "source": ["s1", "s1", "s2", "s2", "s3"],
                "text": [
                    "the quick brown fox jumps",
                    "lazy dog sleeps all day",
                    "the quick brown fox runs",   # shares 2 grams with s1
                    "lazy dog sleeps all night",  # shares 2 grams with s1
                    "completely different words here now",
                ],
            }
        )
        got = {
            (r["source_a"], r["source_b"]): r["n_shared"]
            for r in source_overlap_matrix(
                ray.data.from_pandas(df).repartition(3), k=3
            ).take_all()
        }
        assert got == self._brute(df)

    def test_within_source_dups_not_double_counted(self):
        from ai_knowledge_graph_ray.stages.webtext import source_overlap_matrix

        # the shared gram appears twice in s1 — still ONE distinct gram
        df = pd.DataFrame(
            {
                "source": ["s1", "s1", "s2"],
                "text": ["a b c", "a b c", "a b c"],
            }
        )
        rows = source_overlap_matrix(ray.data.from_pandas(df), k=3).take_all()
        assert rows == [{"source_a": "s1", "source_b": "s2", "n_shared": 1}]

    def test_layout_independent(self):
        from ai_knowledge_graph_ray.stages.webtext import source_overlap_matrix

        rng = np.random.RandomState(3)
        vocab = list("abcdefgh")
        df = pd.DataFrame(
            {
                "source": [f"s{i % 4}" for i in range(60)],
                "text": [
                    " ".join(rng.choice(vocab, rng.randint(3, 12)))
                    for _ in range(60)
                ],
            }
        )
        want = self._brute(df)
        for parts, nb in ((1, None), (5, 3), (11, 4)):
            got = {
                (r["source_a"], r["source_b"]): r["n_shared"]
                for r in source_overlap_matrix(
                    ray.data.from_pandas(df).repartition(parts),
                    k=3, num_buckets=nb,
                ).take_all()
            }
            assert got == want
