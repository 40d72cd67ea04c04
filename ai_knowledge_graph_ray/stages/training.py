"""Training-data generation from the materialized graph.

Data-plane rebuild of the fork's ``training_generator.py`` (SURVEY.md
S10/K6/K7/G10): template Q&A over edges with per-relation seeded
sampling caps, chatml/alpaca/sharegpt JSONL export, seeded train/test
splits, and multi-source merge with normalized-question dedup. The
ICT-domain prose templates are generalized; the data movement —
grouping by relation, capped seeded sampling, dedup, split — is the
part that matters at scale and is preserved exactly in shape.

Determinism note: the reference drives one global ``random.Random(42)``
through a Python loop (``training_generator.py:71-74,398-414``), which
is order-dependent. Here each relation group gets its own
``Random(hash(seed, relation))`` so output is identical under any
partitioning/ordering — the distributed replacement for "seeded
sampling" (documented deviation; counts and cap behavior match).
"""

from __future__ import annotations

import hashlib
import json
import random
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import bucketed_reduce, normalize_blocks, pa_from_pandas

DEFAULT_SYSTEM_PROMPT = (
    "You are a knowledge-graph assistant. Answer questions about "
    "entities and their relationships accurately and concisely."
)

MAX_PER_REL = 30
MAX_PER_CATCHALL = 5
MIN_EDGES_CATCHALL = 3

QA_SCHEMA = pa.schema(
    [
        ("instruction", pa.string()),
        ("input", pa.string()),
        ("output", pa.string()),
        ("category", pa.string()),
    ]
)

_CLEAN_PRED_RE = re.compile(r"^[a-z0-9_ ]{3,}$")


def _title(entity: str) -> str:
    return entity.replace("_", " ").title()


def _rel_rng(seed: int, relation: str) -> random.Random:
    h = hashlib.md5(f"{seed}:{relation}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def generate_relationship_qa(
    edges: ray.data.Dataset,
    *,
    seed: int = 42,
    max_per_rel: int = MAX_PER_REL,
    max_per_catchall: int = MAX_PER_CATCHALL,
) -> ray.data.Dataset:
    """Edge-template Q&A: group edges by predicate, cap each relation
    with a seeded sample, emit one QA row per kept edge.

    Noise predicates (non ``[a-z0-9_ ]`` or <3 chars) are skipped like
    the reference's ``_is_clean_predicate`` filter; unknown-but-clean
    predicates fall into the catch-all template with the lower cap.
    """

    def _per_relation(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return QA_SCHEMA.empty_table()
        rel = str(g["predicate"].iloc[0])
        clean = bool(_CLEAN_PRED_RE.match(rel.replace(" ", "_").lower()))
        if not clean:
            return QA_SCHEMA.empty_table()
        rows = sorted(
            {(str(s), str(d)) for s, d in zip(g["src"], g["dst"])}
        )
        catchall = False
        cap = max_per_rel
        if len(rows) < MIN_EDGES_CATCHALL:
            catchall = True
            cap = max_per_catchall
        if len(rows) > cap:
            rows = sorted(_rel_rng(seed, rel).sample(rows, cap))
        ins, inp, out, cat = [], [], [], []
        pretty_rel = rel.replace("_", " ")
        for s, d in rows:
            ins.append(f"What is the relationship between {_title(s)} and {_title(d)}?")
            inp.append("")
            out.append(f"{_title(s)} {pretty_rel} {_title(d)}.")
            cat.append("relationship_qa" if not catchall else "relationship_qa_catchall")
        return pa.table(
            {
                "instruction": pa.array(ins, pa.string()),
                "input": pa.array(inp, pa.string()),
                "output": pa.array(out, pa.string()),
                "category": pa.array(cat, pa.string()),
            }
        )

    return normalize_blocks(
        edges.select_columns(["src", "dst", "predicate"])
        .groupby("predicate")
        .map_groups(_per_relation, batch_format="pandas"),
        QA_SCHEMA,
    )


def generate_neighborhood_qa(
    edges: ray.data.Dataset, *, max_neighbors: int = 8
) -> ray.data.Dataset:
    """Per-node neighborhood summaries (the reference's type-10
    generator): group out-edges by src, emit one summary QA listing up
    to ``max_neighbors`` deterministic (sorted) neighbors."""

    def _per_node(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return QA_SCHEMA.empty_table()
        src = str(g["src"].iloc[0])
        nbrs = sorted({(str(p), str(d)) for p, d in zip(g["predicate"], g["dst"])})[
            :max_neighbors
        ]
        if not nbrs:
            return QA_SCHEMA.empty_table()
        lines = "; ".join(f"{p.replace('_', ' ')} {_title(d)}" for p, d in nbrs)
        return pa.table(
            {
                "instruction": pa.array(
                    [f"Summarize what is known about {_title(src)}."], pa.string()
                ),
                "input": pa.array([""], pa.string()),
                "output": pa.array([f"{_title(src)}: {lines}."], pa.string()),
                "category": pa.array(["neighborhood_summary"], pa.string()),
            }
        )

    return normalize_blocks(
        edges.select_columns(["src", "dst", "predicate"])
        .groupby("src")
        .map_groups(_per_node, batch_format="pandas"),
        QA_SCHEMA,
    )


def merge_training_data(sources: list[ray.data.Dataset]) -> ray.data.Dataset:
    """Union sources and dedup on the normalized question (G10,
    ``merge_training_data.py:1-116``): lower-cased, whitespace-collapsed
    instruction; first occurrence wins by (source order, instruction)."""
    tagged = []
    for i, ds in enumerate(sources):
        tagged.append(
            ds.map_batches(
                lambda b, idx=i: b.append_column(
                    "__src", pa.array([idx] * len(b), pa.int64())
                ),
                batch_format="pyarrow",
            )
        )
    uni = tagged[0].union(*tagged[1:]) if len(tagged) > 1 else tagged[0]

    key_schema = pa.schema(list(QA_SCHEMA) + [pa.field("__src", pa.int64()), pa.field("__key", pa.string())])

    def _with_key(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch
        b = batch.copy()
        b["__key"] = (
            b["instruction"].str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
        )
        return b

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["__src", "instruction"], kind="stable").drop_duplicates(
            "__key", keep="first"
        )[list(key_schema.names)]

    out = bucketed_reduce(
        uni.map_batches(_with_key, batch_format="pandas"),
        ["__key"],
        _reduce,
        key_schema,
    )
    return out.drop_columns(["__key", "__src"])


def format_examples(
    qa: ray.data.Dataset,
    fmt: str = "chatml",
    system_prompt: str = DEFAULT_SYSTEM_PROMPT,
) -> ray.data.Dataset:
    """QA rows -> one JSON record string per row in the requested
    format (chatml/alpaca/sharegpt, ``training_generator.py:1060-1092``)."""
    assert fmt in ("chatml", "alpaca", "sharegpt")

    def _fmt(batch: pa.Table) -> pa.Table:
        recs = []
        for ins, inp, out in zip(
            batch["instruction"].to_pylist(),
            batch["input"].to_pylist(),
            batch["output"].to_pylist(),
        ):
            if fmt == "alpaca":
                rec = {"instruction": ins, "input": inp or "", "output": out}
            elif fmt == "chatml":
                user = ins + (f"\n\n{inp}" if inp else "")
                rec = {
                    "messages": [
                        {"role": "system", "content": system_prompt},
                        {"role": "user", "content": user},
                        {"role": "assistant", "content": out},
                    ]
                }
            else:
                user = ins + (f"\n\n{inp}" if inp else "")
                rec = {
                    "conversations": [
                        {"from": "system", "value": system_prompt},
                        {"from": "human", "value": user},
                        {"from": "gpt", "value": out},
                    ]
                }
            recs.append(json.dumps(rec, ensure_ascii=False))
        return pa.table({"record": pa.array(recs, pa.string())})

    return qa.map_batches(_fmt, batch_format="pyarrow")


def train_test_split(
    qa: ray.data.Dataset, test_ratio: float = 0.1, seed: int = 42
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Seeded shuffle + proportional split (K7,
    ``training_generator.py:1098-1127``)."""
    shuffled = qa.random_shuffle(seed=seed)
    train, test = shuffled.split_proportionately([1.0 - test_ratio])
    return train, test


def stratified_split(
    ds: ray.data.Dataset,
    strata_col: str,
    ratios: "dict[str, float]",
    *,
    seed: int = 42,
    key_cols: "list[str] | None" = None,
) -> ray.data.Dataset:
    """Per-stratum proportional split: adds a ``split`` column whose
    values follow ``ratios`` WITHIN every stratum (a global
    random-shuffle split under-represents small strata; per-class
    eval sets need the per-stratum guarantee).

    Deterministic and partitioning-independent: rows are ordered inside
    each stratum by a seeded stable hash of ``key_cols`` (default: all
    non-strata columns) and sliced at the cumulative ratio boundaries —
    same input, same seed => same assignment, regardless of block
    layout. One bucketed shuffle on the stratum key.
    """
    from .infer import bucketed_reduce

    names = list(ds.schema().names)
    keys = key_cols or [c for c in names if c != strata_col]
    out_schema = pa.schema(
        [(f.name, f.type) for f in ds.schema().base_schema]
        + [pa.field("split", pa.string())]
    )
    splits = list(ratios)
    cum = []
    acc = 0.0
    for s in splits:
        acc += ratios[s]
        cum.append(acc)
    if abs(acc - 1.0) > 1e-9:
        raise ValueError("ratios must sum to 1")

    def _label(g: pd.DataFrame) -> pd.DataFrame:
        def _per_stratum(sub: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_pandas_object(
                sub[keys].astype(str).agg("\x00".join, axis=1) + f"\x00{seed}",
                index=False,
            )
            sub = sub.assign(__h=h.to_numpy()).sort_values(
                ["__h"] + keys, kind="stable"
            )
            n = len(sub)
            bounds = [int(round(c * n)) for c in cum]
            bounds[-1] = n
            labels = np.empty(n, dtype=object)
            lo = 0
            for name, hi in zip(splits, bounds):
                labels[lo:hi] = name
                lo = max(lo, hi)
            return sub.assign(split=labels).drop(columns="__h")

        return (
            g.groupby(strata_col, sort=False, group_keys=False)
            .apply(_per_stratum)
            .reset_index(drop=True)
        )

    return bucketed_reduce(ds, [strata_col], _label, out_schema)


def export_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """JSONL sink (one record object per line via write_json)."""
    ds.write_json(out_dir)
