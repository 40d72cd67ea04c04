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
is order-dependent. Here every seeded draw is a per-ROW md5 rank
(:func:`_md5_rank`): a capped sample keeps the ``cap`` smallest ranks
and rotation starts are keyed on the edge, so output is identical
under any partitioning/ordering AND reproducible in SQL (DuckDB md5)
— the distributed replacement for "seeded sampling" (documented
deviation; counts and cap behavior match).
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


def _md5_rank(seed: int, tag: str, *parts: str) -> int:
    """Deterministic 64-bit rank for seeded sampling: the first 8 md5
    bytes of ``seed:tag:part1:part2...``. Engine-portable (DuckDB's
    ``md5`` reproduces it, unlike the Mersenne Twister) and
    order-independent — each row's rank depends only on the row, so a
    capped sample is THE ``cap`` smallest ranks under any partitioning
    or iteration order."""
    h = hashlib.md5(
        (f"{seed}:{tag}:" + ":".join(parts)).encode()
    ).digest()
    return int.from_bytes(h[:8], "big")


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
            # seeded sample = the cap smallest md5 ranks (SQL-portable;
            # see _md5_rank) instead of a Mersenne-Twister draw
            rows = sorted(
                sorted(rows, key=lambda sd: (_md5_rank(seed, "qa:" + rel, *sd), sd))[:cap]
            )
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
    passthrough_cols: tuple = (),
) -> ray.data.Dataset:
    """QA rows -> one JSON record string per row in the requested
    format (chatml/alpaca/sharegpt, ``training_generator.py:1060-1092``).
    ``passthrough_cols`` survive alongside ``record`` (e.g. a split
    label for per-split JSONL export)."""
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
        cols = {"record": pa.array(recs, pa.string())}
        for c in passthrough_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    return qa.map_batches(_fmt, batch_format="pyarrow")


def train_test_split(
    qa: ray.data.Dataset, test_ratio: float = 0.1, seed: int = 42
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Seeded shuffle + proportional split (K7,
    ``training_generator.py:1098-1127``)."""
    shuffled = qa.random_shuffle(seed=seed)
    train, test = shuffled.split_proportionately([1.0 - test_ratio])
    return train, test


def generate_concept_qa(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    *,
    max_facts: int = 5,
) -> ray.data.Dataset:
    """Concept-definition QA (reference ``training_generator.py:123-163``
    semantics, domain wording generalized): nodes with a definition
    (>= 10 chars, from the ``attrs`` JSON) get a definition QA; nodes
    without one but with >= 2 outgoing edges get a synthesized
    fact-list QA from their first ``max_facts`` out-edges; nodes with a
    non-generic type additionally get a classification QA.

    Distributed: out-edge fact lists are reduced per source entity via
    one bucketed shuffle (capped, deterministic order), then joined
    onto the node table."""
    from .infer import bucketed_reduce, sanitize_for_join
    from .relational import cogroup_join

    fact_schema = pa.schema([("entity", pa.string()), ("facts", pa.string()), ("n_out", pa.int64())])

    def _facts(g: pd.DataFrame) -> pd.DataFrame:
        def _per_src(sub: pd.DataFrame) -> pd.DataFrame:
            sub = sub.sort_values(["predicate", "dst"], kind="stable").head(max_facts)
            lines = "\n".join(
                f"- {str(p).replace('_', ' ')} {_title(str(d))}"
                for p, d in zip(sub["predicate"], sub["dst"])
            )
            return pd.DataFrame(
                {"entity": [sub["src"].iloc[0]], "facts": [lines], "n_out": [len(sub)]}
            )

        out = [
            _per_src(sub)
            for _, sub in g.drop_duplicates(["src", "predicate", "dst"]).groupby(
                "src", sort=False
            )
        ]
        if not out:
            return pd.DataFrame({"entity": [], "facts": [], "n_out": []})
        return pd.concat(out, ignore_index=True)

    facts = sanitize_for_join(
        bucketed_reduce(
            edges.select_columns(["src", "dst", "predicate"]), ["src"], _facts, fact_schema
        ),
        fact_schema,
    )

    node_schema = pa.schema(
        [("entity", pa.string()), ("type", pa.string()), ("attrs", pa.string())]
    )
    nodes_p = sanitize_for_join(
        nodes.select_columns(["entity", "type", "attrs"]), node_schema
    )
    joined = cogroup_join(
        nodes_p, facts, on=["entity"], left_schema=node_schema, right_schema=fact_schema
    )
    missing = cogroup_join(
        nodes_p, facts, on=["entity"], how="left_anti",
        left_schema=node_schema, right_schema=fact_schema,
    ).map_batches(
        lambda b: b.append_column("facts", pa.array([""] * len(b), pa.string()))
        .append_column("n_out", pa.array([0] * len(b), pa.int64())),
        batch_format="pyarrow",
    )
    full_schema = pa.schema(
        list(node_schema) + [pa.field("facts", pa.string()), pa.field("n_out", pa.int64())]
    )
    joined = normalize_blocks(joined, full_schema)
    missing = normalize_blocks(missing, full_schema)

    def _emit(b: pd.DataFrame) -> pd.DataFrame:
        ins, inp, out, cat = [], [], [], []
        for ent, typ, attrs, facts_txt, n_out in zip(
            b["entity"], b["type"], b["attrs"], b["facts"], b["n_out"]
        ):
            label = _title(str(ent))
            defn = ""
            try:
                defn = (json.loads(attrs or "{}") or {}).get("definition", "") or ""
            except Exception:
                pass
            if isinstance(defn, str) and len(defn) >= 10:
                ins.append(f"What is {label}?")
                out.append(f"{label} is defined as: {defn}")
                inp.append("")
                cat.append("concept_definition")
            elif n_out >= 2:
                ins.append(f"What is {label}?")
                out.append(
                    f"{label} is a concept with these key relationships:\n{facts_txt}"
                )
                inp.append("")
                cat.append("concept_from_graph")
            if typ and typ not in ("concept", "unknown"):
                ins.append(f"What category does {label} belong to?")
                out.append(f"{label} is classified as a {typ}.")
                inp.append("")
                cat.append("concept_classification")
        return pd.DataFrame(
            {"instruction": ins, "input": inp, "output": out, "category": cat}
        )

    return normalize_blocks(
        joined.union(missing).map_batches(_emit, batch_format="pandas"), QA_SCHEMA
    )


def generate_reasoning_chain_qa(
    edges: ray.data.Dataset,
    *,
    max_per_mid: int = 2,
    max_chains: int = 200,
) -> ray.data.Dataset:
    """Chain-of-reasoning QA from 2-hop graph paths a->b->c (reference
    ``generate_reasoning_chains`` reads its chains from schema YAML;
    the generic engine derives them from the edge list itself).

    Distributed: one capped cogroup self-join on the mid entity (the
    transitive-join shape), deterministic pair selection, global cap
    via local top-k."""
    from .infer import local_topk_rows, sanitize_for_join
    from .relational import cogroup_join

    left_schema = pa.schema([("mid", pa.string()), ("a", pa.string()), ("p1", pa.string())])
    right_schema = pa.schema([("mid", pa.string()), ("c", pa.string()), ("p2", pa.string())])
    lhs = sanitize_for_join(
        edges.select_columns(["src", "dst", "predicate"]).map_batches(
            lambda b: pa.table(
                {"mid": b["dst"], "a": b["src"], "p1": b["predicate"]}
            ),
            batch_format="pyarrow",
        ),
        left_schema,
    )
    rhs = sanitize_for_join(
        edges.select_columns(["src", "dst", "predicate"]).map_batches(
            lambda b: pa.table(
                {"mid": b["src"], "c": b["dst"], "p2": b["predicate"]}
            ),
            batch_format="pyarrow",
        ),
        right_schema,
    )

    def _cap(ds, cols, schema, ascending=True):
        from .infer import bucketed_reduce

        def _r(g: pd.DataFrame) -> pd.DataFrame:
            return (
                g.sort_values(cols, ascending=ascending, kind="stable")
                .groupby("mid", sort=False)
                .head(max_per_mid)
            )

        return sanitize_for_join(bucketed_reduce(ds, ["mid"], _r, schema), schema)

    # lhs takes the lexicographically SMALLEST in-neighbors, rhs the
    # LARGEST out-neighbors — de-correlated picks, otherwise a dense
    # graph selects the same entity on both sides of every mid and the
    # a != c filter kills every chain.
    chains = cogroup_join(
        _cap(lhs, ["a", "p1"], left_schema),
        _cap(rhs, ["c", "p2"], right_schema, ascending=False),
        on=["mid"],
        left_schema=left_schema,
        right_schema=right_schema,
    )

    def _emit(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["a"] != b["mid"]) & (b["mid"] != b["c"]) & (b["a"] != b["c"])]
        ins, inp, out, cat, key = [], [], [], [], []
        for a, p1, m, p2, c in zip(b["a"], b["p1"], b["mid"], b["p2"], b["c"]):
            ta, tm, tc = _title(str(a)), _title(str(m)), _title(str(c))
            ins.append(f"Explain the connection between {ta} and {tc} step by step.")
            inp.append("")
            out.append(
                f"Step 1: {ta} {str(p1).replace('_', ' ')} {tm}.\n"
                f"Step 2: {tm} {str(p2).replace('_', ' ')} {tc}.\n"
                f"Therefore {ta} is connected to {tc} through {tm}."
            )
            cat.append("reasoning_chain")
            # predicates in the key: two chains through the same
            # (a, m, c) via different predicates must rank uniquely or
            # the global-cap boundary is engine-order dependent
            key.append(f"{a}\x00{m}\x00{c}\x00{p1}\x00{p2}")
        return pd.DataFrame(
            {
                "instruction": ins,
                "input": inp,
                "output": out,
                "category": cat,
                "__key": key,
            }
        )

    rows = local_topk_rows(
        chains.map_batches(_emit, batch_format="pandas"), ["__key"], max_chains
    )
    tbl = pd.DataFrame(rows).drop(columns="__key") if rows else pd.DataFrame(
        columns=["instruction", "input", "output", "category"]
    )
    return normalize_blocks(
        ray.data.from_pandas(tbl.drop_duplicates()), QA_SCHEMA
    )


def generate_comparison_qa(
    edges: ray.data.Dataset,
    *,
    max_neighbors_per_node: int = 10,
    max_examples: int = 200,
) -> ray.data.Dataset:
    """Comparison QA between concepts sharing a common neighbor
    (reference ``generate_concept_comparisons``,
    ``training_generator.py:946-1000``). Pair generation reuses the
    vectorized size-class machinery from the dedup family: group the
    undirected edge list by the COMMON node (capped neighbors each),
    emit neighbor pairs, dedupe, cap globally with deterministic
    order."""
    from .dedup import _pair_indices_by_size  # vectorized within-group pairs
    from .infer import bucketed_reduce, local_topk_rows

    und = edges.select_columns(["src", "dst"]).map_batches(
        lambda b: pa.table(
            {
                "common": pa.concat_arrays(
                    [
                        b["src"].combine_chunks().cast(pa.string()),
                        b["dst"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "neighbor": pa.concat_arrays(
                    [
                        b["dst"].combine_chunks().cast(pa.string()),
                        b["src"].combine_chunks().cast(pa.string()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    pair_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("common", pa.string())]
    )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        def _per_common(sub: pd.DataFrame) -> pd.DataFrame:
            nbrs = np.sort(sub["neighbor"].unique())[:max_neighbors_per_node]
            codes = np.zeros(len(nbrs), dtype=np.int64)
            I, J = _pair_indices_by_size(codes, cap=1 << 62)
            return pd.DataFrame(
                {"a": nbrs[I], "b": nbrs[J], "common": sub["common"].iloc[0]}
            )

        out = [
            _per_common(sub)
            for _, sub in g.drop_duplicates(["common", "neighbor"]).groupby(
                "common", sort=False
            )
        ]
        if not out:
            return pd.DataFrame({"a": [], "b": [], "common": []})
        return pd.concat(out, ignore_index=True)

    pairs = bucketed_reduce(und, ["common"], _pairs, pair_schema)
    # dedupe (a, b) across commons, keep the smallest common for determinism
    dd = bucketed_reduce(
        pairs,
        ["a", "b"],
        lambda g: g.sort_values(["a", "b", "common"], kind="stable").drop_duplicates(
            ["a", "b"], keep="first"
        ),
        pair_schema,
        combiner=lambda b: b.sort_values(["a", "b", "common"], kind="stable").drop_duplicates(
            ["a", "b"], keep="first"
        ),
    )
    rows = local_topk_rows(dd, ["a", "b"], max_examples)
    ins, inp, out, cat = [], [], [], []
    for r in rows:
        ta, tb, tc = _title(str(r["a"])), _title(str(r["b"])), _title(str(r["common"]))
        ins.append(f"Compare and contrast {ta} and {tb}.")
        inp.append("")
        out.append(
            f"{ta} and {tb} are related concepts: both connect to {tc}. "
            f"They play distinct roles but share this common neighbor in the graph."
        )
        cat.append("concept_comparison")
    tbl = pa.table(
        {
            "instruction": pa.array(ins, pa.string()),
            "input": pa.array(inp, pa.string()),
            "output": pa.array(out, pa.string()),
            "category": pa.array(cat, pa.string()),
        }
    )
    return ray.data.from_arrow(tbl)


def generate_counterfactual_qa(
    edges: ray.data.Dataset,
    *,
    seed: int = 42,
    max_per_rel: int = MAX_PER_REL,
) -> ray.data.Dataset:
    """Edge-negation counterfactual QA (generalized reference Type 6,
    ``training_generator.py:665-721`` — there, "why did this trade
    fail?" from negative examples; here, the negatives are synthesized
    by NEGATIVE SAMPLING over the materialized graph): per predicate,
    for each kept edge ``(s, p, o)``, draw a wrong object ``o'`` from
    the same predicate's object pool such that ``(s, p, o')`` is NOT an
    edge, and ask whether the negated statement holds. The answer
    refutes it and states the recorded fact.

    Distributed like the other generators: one ``map_groups`` per
    predicate (bounded key domain), order-independent per-relation
    seeded RNG, seeded sampling caps.
    """

    def _per_relation(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return QA_SCHEMA.empty_table()
        rel = str(g["predicate"].iloc[0])
        clean = bool(_CLEAN_PRED_RE.match(rel.replace(" ", "_").lower()))
        if not clean:
            return QA_SCHEMA.empty_table()
        edge_set = {(str(s), str(d)) for s, d in zip(g["src"], g["dst"])}
        objects = sorted({d for _, d in edge_set})
        if len(objects) < 2:
            return QA_SCHEMA.empty_table()  # no wrong object exists
        rows = sorted(edge_set)
        if len(rows) > max_per_rel:
            # seeded sample = the cap smallest md5 ranks (SQL-portable)
            rows = sorted(
                sorted(
                    rows, key=lambda sd: (_md5_rank(seed, "cf:" + rel, *sd), sd)
                )[:max_per_rel]
            )
        pretty_rel = rel.replace("_", " ")
        ins, inp, out, cat = [], [], [], []
        for s, d in rows:
            # deterministic wrong-object draw: first non-edge object in
            # a seeded rotation of the pool, rotation start keyed on
            # the EDGE (order-independent, unlike a sequential RNG)
            start = _md5_rank(seed, "cfs:" + rel, s, d) % len(objects)
            wrong = None
            for k in range(len(objects)):
                c = objects[(start + k) % len(objects)]
                if c != d and (s, c) not in edge_set:
                    wrong = c
                    break
            if wrong is None:
                continue  # s relates to every object; no negative exists
            ins.append(f"Is it true that {_title(s)} {pretty_rel} {_title(wrong)}?")
            inp.append("")
            out.append(
                f"No. The graph does not record that {_title(s)} {pretty_rel} "
                f"{_title(wrong)}. The recorded relationship is: {_title(s)} "
                f"{pretty_rel} {_title(d)}."
            )
            cat.append("counterfactual_qa")
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


def generate_anti_pattern_qa(
    edges: ray.data.Dataset,
    *,
    seed: int = 42,
    max_per_rel: int = MAX_PER_REL,
) -> ray.data.Dataset:
    """Wrong-pairing anti-pattern QA (generalized reference Type 8,
    ``training_generator.py:796-826`` — there, curated anti-pattern
    node cards; here, the anti-pattern instances are synthesized from
    the graph itself): per predicate, CROSS-PAIR two distinct edges
    ``(s1, p, o1)`` and ``(s2, p, o2)`` into the corrupted statement
    ``(s1, p, o2)`` (verified NOT to be an edge) and ask what is wrong
    with it. The answer names the error class (mixed-up pairing) and
    both recorded facts. Same distributed shape as the other
    generators; per-relation seeded RNG keeps output independent of
    partitioning.
    """

    def _per_relation(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return QA_SCHEMA.empty_table()
        rel = str(g["predicate"].iloc[0])
        clean = bool(_CLEAN_PRED_RE.match(rel.replace(" ", "_").lower()))
        if not clean:
            return QA_SCHEMA.empty_table()
        edge_set = {(str(s), str(d)) for s, d in zip(g["src"], g["dst"])}
        rows = sorted(edge_set)
        if len(rows) < 2:
            return QA_SCHEMA.empty_table()
        picks = rows
        if len(picks) > max_per_rel:
            # seeded sample = the cap smallest md5 ranks (SQL-portable)
            picks = sorted(
                sorted(
                    picks, key=lambda sd: (_md5_rank(seed, "ap:" + rel, *sd), sd)
                )[:max_per_rel]
            )
        pretty_rel = rel.replace("_", " ")
        ins, inp, out, cat = [], [], [], []
        for s1, o1 in picks:
            # seeded rotation over the OTHER edges for the cross pair,
            # start keyed on the edge (order-independent)
            start = _md5_rank(seed, "aps:" + rel, s1, o1) % len(rows)
            partner = None
            for k in range(len(rows)):
                s2, o2 = rows[(start + k) % len(rows)]
                if s2 != s1 and o2 != o1 and (s1, o2) not in edge_set:
                    partner = (s2, o2)
                    break
            if partner is None:
                continue
            s2, o2 = partner
            ins.append(
                f"What is wrong with this statement: "
                f"\"{_title(s1)} {pretty_rel} {_title(o2)}\"?"
            )
            inp.append("")
            out.append(
                f"The statement mixes up two separate facts (a wrong-pairing "
                f"error). The graph records {_title(s1)} {pretty_rel} "
                f"{_title(o1)} and {_title(s2)} {pretty_rel} {_title(o2)}; "
                f"it does not connect {_title(s1)} to {_title(o2)} via "
                f"'{pretty_rel}'."
            )
            cat.append("anti_pattern_qa")
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


def generate_record_analysis(
    docs: ray.data.Dataset,
    edges: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_context_nodes: int = 200,
    max_rels_per_node: int = 3,
    max_objs_per_rel: int = 3,
    min_name_len: int = 4,
) -> ray.data.Dataset:
    """Record-annotation examples (generalized reference Type 5,
    ``training_generator.py:603-664`` — there, positive trade JSON
    records are annotated with 1-hop graph context for the ICT
    elements they mention; here, the records are the CORPUS documents
    and the elements are graph node names found in each record's
    text). The corpus-x-graph join is the part that matters at scale:
    the bounded node-context map (top ``max_context_nodes`` subjects
    by edge count, each with ``max_rels_per_node`` predicates x
    ``max_objs_per_rel`` objects — mirroring the reference's
    ``get_related_concepts`` caps) is broadcast ONCE via ``ray.put``
    and each batch scans it vectorized; documents never shuffle.
    Output category ``record_analysis``."""
    import ray as _ray

    ctx_pdf = (
        edges.select_columns(["src", "predicate", "dst"])
        .to_pandas()
        .astype(str)
    )
    if len(ctx_pdf) == 0:
        return ray.data.from_arrow(QA_SCHEMA.empty_table())
    # top-N subjects by degree, deterministic ties by name
    deg = ctx_pdf.groupby("src").size().sort_values(ascending=False)
    keep = set(
        sorted(deg.index[:max_context_nodes], key=lambda s: (-deg[s], s))[
            :max_context_nodes
        ]
    )
    ctx: dict[str, list[tuple[str, list[str]]]] = {}
    sub = ctx_pdf[ctx_pdf["src"].isin(keep)].sort_values(
        ["src", "predicate", "dst"]
    )
    for (s, p), g in sub.groupby(["src", "predicate"], sort=True):
        lst = ctx.setdefault(s, [])
        if len(lst) >= max_rels_per_node:
            continue
        lst.append((p, sorted(set(g["dst"]))[:max_objs_per_rel]))
    names = sorted(n for n in ctx if len(n) >= min_name_len)
    ctx_ref = _ray.put((names, ctx))

    def _annotate(b: pd.DataFrame) -> pa.Table:
        if len(b) == 0:
            return QA_SCHEMA.empty_table()
        nms, cmap = (
            _ray.get(ctx_ref) if isinstance(ctx_ref, _ray.ObjectRef) else ctx_ref
        )
        low = b[text_col].fillna("").str.lower()
        hits = [
            low.str.contains(re.escape(n), regex=True).to_numpy() for n in nms
        ]
        ins, inp, out, cat = [], [], [], []
        for i in range(len(b)):
            elems = [n for n, h in zip(nms, hits) if h[i]]
            if not elems:
                continue
            elems = elems[: max_rels_per_node * 2]
            annotations = []
            for e in elems:
                for rel, objs in cmap[e]:
                    annotations.append(
                        f"  - {_title(e)} {rel.replace('_', ' ')}: "
                        + ", ".join(_title(o) for o in objs)
                    )
            elements_text = ", ".join(_title(e) for e in elems)
            graph_text = (
                "\n".join(annotations)
                if annotations
                else "  (No additional graph context)"
            )
            rid = b[id_col].iloc[i]
            ins.append(
                "Analyze this record against the knowledge graph: which "
                "recorded concepts does it involve and what do they relate to?"
            )
            inp.append(f"Record {rid}.")
            out.append(
                f"Record Analysis ({rid}):\n\n"
                f"Concepts Present: {elements_text}\n\n"
                f"Graph-Derived Context:\n{graph_text}\n\n"
                f"The record involves {elements_text}; the graph context "
                f"above lists each concept's recorded relationships."
            )
            cat.append("record_analysis")
        return pa.table(
            {
                "instruction": pa.array(ins, pa.string()),
                "input": pa.array(inp, pa.string()),
                "output": pa.array(out, pa.string()),
                "category": pa.array(cat, pa.string()),
            }
        )

    return normalize_blocks(
        docs.select_columns([id_col, text_col]).map_batches(
            _annotate, batch_format="pandas"
        ),
        QA_SCHEMA,
    )


def generate_validation_qa(spec: dict) -> ray.data.Dataset:
    """Checklist-reasoning examples (generalized reference Type 7,
    ``training_generator.py:722-795`` — there, the ICT pre-trade
    checklist from the concept-relationships YAML; here, any
    acceptance-checklist spec with the same shape). ``spec`` keys:
    ``must_have_all``, ``must_have_one``, ``should_have``,
    ``red_flags`` (lists of snake_case condition names) and optional
    ``thresholds`` (``minimum``/``good``/``excellent`` floats for the
    scoring rubric). Emits the reference's three scenario families:
    all-conditions-met, one-red-flag-present (per flag, first 5), and
    the scoring-rubric explainer. Config-derived and tiny by nature —
    built driver-side, like the reference."""

    def _label(c: str) -> str:
        return str(c).replace("_", " ")

    must_all = [str(c) for c in spec.get("must_have_all", [])]
    must_one = [str(c) for c in spec.get("must_have_one", [])]
    should = [str(c) for c in spec.get("should_have", [])]
    flags = [str(c) for c in spec.get("red_flags", [])]
    thresholds = spec.get("thresholds", {}) or {}

    ins, inp, out, cat = [], [], [], []
    if must_all:
        conds = [_label(c) for c in must_all]
        ins.append(
            "Should this candidate pass the checklist? Confirmed: "
            + ", ".join(conds)
            + "."
        )
        inp.append("")
        out.append(
            "Yes, the candidate meets the minimum requirements.\n\n"
            f"Must-have conditions confirmed: {', '.join(conds)}\n\n"
            "However, also verify:\n"
            f"- At least one of: {', '.join(_label(c) for c in must_one)}\n"
            f"- Ideally also: {', '.join(_label(c) for c in should)}\n\n"
            f"Disqualifiers to check: "
            f"{', '.join(_label(c) for c in flags[:3])}"
        )
        cat.append("checklist_validation")
    for flag in flags[:5]:
        fl = _label(flag)
        ins.append(
            f"Should this candidate pass? It looks good but I notice {fl}."
        )
        inp.append("")
        out.append(
            f"No. {fl.title()} is a disqualifier.\n\n"
            "Disqualifiers are absolute — no matter how strong the rest of "
            "the candidate looks, the purpose of the checklist is to stop "
            "acceptance exactly when it is most tempting.\n\n"
            "Resolve the disqualifier, or move on to the next candidate."
        )
        cat.append("checklist_red_flag")
    if thresholds:
        mn = thresholds.get("minimum", 5.0)
        gd = thresholds.get("good", 7.0)
        ex = thresholds.get("excellent", 9.0)
        ins.append("How is a candidate's composite score interpreted?")
        inp.append("")
        out.append(
            "Scoring uses weighted factors summed into a composite.\n\n"
            "Thresholds:\n"
            f"  Minimum to accept: {mn}\n"
            f"  Good candidate: {gd}\n"
            f"  Excellent candidate: {ex}\n\n"
            f"Never accept below {mn}. Be selective."
        )
        cat.append("checklist_scoring")
    return ray.data.from_arrow(
        pa.table(
            {
                "instruction": pa.array(ins, pa.string()),
                "input": pa.array(inp, pa.string()),
                "output": pa.array(out, pa.string()),
                "category": pa.array(cat, pa.string()),
            }
        )
    )


def generate_model_selection_qa(
    rules: ray.data.Dataset,
    *,
    max_requirements_listed: int = 10,
) -> ray.data.Dataset:
    """Model-selection QA (generalized reference Type 4,
    ``training_generator.py:539-586`` — there, curated ICT model
    blueprints from YAML; here, the blueprint is DERIVED from the
    materialized graph via :func:`~.scenario.rules_from_edges`):
    per model, a "when does this apply?" card listing its requirements,
    and — when it has >= 2 requirements — an "I see these concepts,
    which model applies?" example from the first three requirements
    (reference takes ``required[:3]`` the same way).

    Distributed as one ``map_groups`` per model (blueprint-bounded key
    domain); requirement order is sorted, so output is deterministic
    and partition-independent.
    """

    def _per_model(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return QA_SCHEMA.empty_table()
        model = str(g["model"].iloc[0])
        label = _title(model)
        reqs = sorted(set(map(str, g["requirement"])))
        if not reqs:
            return QA_SCHEMA.empty_table()
        listed = reqs[:max_requirements_listed]
        req_text = "\n".join(f"  - {_title(r)}" for r in listed)
        more = (
            f"\n  (+{len(reqs) - len(listed)} more)" if len(reqs) > len(listed) else ""
        )
        ins, inp, out, cat = [], [], [], []
        ins.append(f"When does the {label} model apply?")
        inp.append("")
        out.append(
            f"The {label} model requires:\n\n{req_text}{more}\n\n"
            "All conditions must be met. If any requirement is missing, "
            "do not force the match."
        )
        cat.append("model_requirements")
        if len(reqs) >= 2:
            subset = ", ".join(_title(r) for r in reqs[:3])
            ins.append(
                f"These concepts are present: {subset}. Which model applies?"
            )
            inp.append("")
            out.append(
                f"Based on these concepts, the {label} model is the best "
                f"fit.\n\nThis model specifically requires:\n{req_text}{more}\n\n"
                "Confirm the remaining requirements before concluding."
            )
            cat.append("model_selection")
        return pa.table(
            {
                "instruction": pa.array(ins, pa.string()),
                "input": pa.array(inp, pa.string()),
                "output": pa.array(out, pa.string()),
                "category": pa.array(cat, pa.string()),
            }
        )

    return normalize_blocks(
        rules.groupby("model").map_groups(_per_model, batch_format="pandas"),
        QA_SCHEMA,
    )


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
            import hashlib

            # engine-portable in-stratum order: md5 of the
            # unit-separator-joined key columns + seed (the pandas
            # hash it replaces was engine-specific); counts per
            # stratum are unaffected, only WHICH rows land in which
            # split
            joined = sub[keys].astype(str).agg("\x1f".join, axis=1) + f"\x1f{seed}"
            h = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(x.encode()).digest()[:8], "big")
                    for x in joined
                ),
                dtype=np.uint64,
                count=len(sub),
            )
            sub = sub.assign(__h=h).sort_values(
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


LEAKAGE_SPLIT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("rep_id", pa.int64()), ("split", pa.string())]
)

# mapping entries under this count broadcast; over it, one cogroup join
DRIVER_MAX_MAPPING = 2_000_000


def leakage_safe_split(
    docs: ray.data.Dataset,
    mapping: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    train_permille: int = 900,
    seed: int = 42,
    driver_max_mapping: int = DRIVER_MAX_MAPPING,
) -> ray.data.Dataset:
    """Near-dup-cluster-safe train/valid assignment: ``(doc_id,
    rep_id, split)`` where every document of a near-dup CLUSTER lands
    in the same split (splitting by raw doc hash leaks paraphrases of
    training rows into the eval set — the contamination mode
    decontaminate() exists to catch, prevented here at split time).

    ``mapping`` is a ``(doc_id, dup_of)`` table as produced by the
    near-dup family (rows only for docs whose canonical differs).
    Split = splitmix64(rep_id XOR seed-mix) mod 1000 < train_permille
    — deterministic per cluster, order-independent, no shuffle of the
    corpus: the (small) mapping is COUNTED then broadcast under
    ``driver_max_mapping``, else applied with one cogroup join.
    """
    from .infer import normalize_blocks
    from ..stages.bloom import _mix

    def _assign(b: pd.DataFrame, rep: np.ndarray) -> pd.DataFrame:
        h = _mix(
            rep.astype(np.uint64) ^ np.uint64(seed * 0x9E3779B97F4A7C15 % (1 << 64)),
            0xBF58476D1CE4E5B9,
            0x94D049BB133111EB,
        )
        split = np.where((h % np.uint64(1000)).astype(np.int64) < train_permille,
                         "train", "valid")
        return pd.DataFrame(
            {"doc_id": b[id_col].to_numpy(np.int64), "rep_id": rep, "split": split}
        )

    mapping = mapping.materialize()
    n_map = mapping.count()
    if n_map <= driver_max_mapping:
        mdf = mapping.to_pandas() if n_map else pd.DataFrame(
            {id_col: pd.Series(dtype="int64"), "dup_of": pd.Series(dtype="int64")}
        )
        lookup_ref = ray.put(
            dict(zip(mdf[id_col].astype("int64"), mdf["dup_of"].astype("int64")))
        )

        def _broadcast(b: pd.DataFrame) -> pd.DataFrame:
            lk = ray.get(lookup_ref) if isinstance(lookup_ref, ray.ObjectRef) else lookup_ref
            ids = b[id_col].to_numpy(np.int64)
            rep = np.fromiter(
                (lk.get(int(i), int(i)) for i in ids), dtype=np.int64, count=len(ids)
            )
            return _assign(b, rep)

        out = docs.select_columns([id_col]).map_batches(
            _broadcast, batch_format="pandas", batch_size=None
        )
        return normalize_blocks(out, LEAKAGE_SPLIT_SCHEMA)

    # over the gate: one left cogroup join on doc_id
    from .relational import cogroup_join

    joined = cogroup_join(
        docs.select_columns([id_col]),
        mapping,
        [id_col],
        how="left_outer",
        left_schema=pa.schema([(id_col, pa.int64())]),
        right_schema=pa.schema([(id_col, pa.int64()), ("dup_of", pa.int64())]),
    )

    def _joined(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(np.int64)
        rep = b["dup_of"].fillna(pd.Series(ids, index=b.index)).astype("int64").to_numpy()
        return _assign(b, rep)

    return normalize_blocks(
        joined.map_batches(_joined, batch_format="pandas", batch_size=None),
        LEAKAGE_SPLIT_SCHEMA,
    )


SPAN_CORRUPTION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("input", pa.string()),
        ("target", pa.string()),
        ("n_tokens", pa.int64()),
        ("n_masked", pa.int64()),
    ]
)


def generate_span_corruption(
    docs: ray.data.Dataset,
    *,
    seed: int = 42,
    corruption_rate: float = 0.15,
    mean_span: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """T5-style span corruption (denoising pretraining pairs): mask
    ~``corruption_rate`` of each document's whitespace tokens in spans
    of mean length ``mean_span``; ``input`` carries ``<extra_id_k>``
    sentinels where spans were dropped, ``target`` carries the
    sentinels followed by the dropped tokens plus a terminal sentinel
    (the T5 objective, arXiv:1910.10683 §3.1.4).

    Fully deterministic and order-independent: span starts/lengths
    come from a splitmix64 stream keyed on ``(seed, doc_id, token
    position)`` — no RNG state crosses rows, so any partitioning
    yields byte-identical pairs. Map-only (embarrassingly parallel);
    the span-interval union is computed with a difference-array
    cumsum, not a per-token Python walk.
    """
    from .bloom import _mix

    p_start = corruption_rate / mean_span
    # deterministic threshold in integer space
    start_threshold = np.uint64(int(p_start * 2**64))
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))

    def _per_batch(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or text_col not in b.columns:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "input": pd.Series([], dtype="object"),
                    "target": pd.Series([], dtype="object"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "n_masked": pd.Series([], dtype="int64"),
                }
            )
        out_rows = []
        ids = b[id_col].to_numpy(np.int64)
        texts = b[text_col].astype(str).to_numpy(object)
        for doc_id, text in zip(ids, texts):
            toks = text.split()
            n = len(toks)
            if n == 0:
                out_rows.append((doc_id, "", "<extra_id_0>", 0, 0))
                continue
            pos = np.arange(n, dtype=np.uint64)
            h = _mix(
                (np.uint64(doc_id) ^ seed_mix) + pos * np.uint64(0x9E3779B97F4A7C15),
                0xBF58476D1CE4E5B9,
                0x94D049BB133111EB,
            )
            starts = h < start_threshold
            # span length in [1, 2*mean_span-1] (mean = mean_span)
            lens = 1 + (
                _mix(h, 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53)
                % np.uint64(2 * mean_span - 1)
            ).astype(np.int64)
            # interval union via difference array (spans clipped at n)
            diff = np.zeros(n + 1, dtype=np.int64)
            s_idx = np.nonzero(starts)[0]
            np.add.at(diff, s_idx, 1)
            np.add.at(diff, np.minimum(s_idx + lens[s_idx], n), -1)
            masked = np.cumsum(diff[:n]) > 0
            prev = np.empty(n, dtype=bool)
            prev[0] = False
            prev[1:] = masked[:-1]
            run_start = masked & ~prev
            tok_arr = np.array(toks, dtype=object)
            inp_parts, tgt_parts = [], []
            starts_idx = np.nonzero(run_start)[0]
            run_close = masked & ~np.append(masked[1:], False)
            ends_idx = np.nonzero(run_close)[0] + 1  # exclusive ends
            prev_end = 0
            for k, (st, end) in enumerate(zip(starts_idx, ends_idx)):
                inp_parts.extend(tok_arr[prev_end:st])
                inp_parts.append(f"<extra_id_{k}>")
                tgt_parts.append(f"<extra_id_{k}>")
                tgt_parts.extend(tok_arr[st:end])
                prev_end = end
            inp_parts.extend(tok_arr[prev_end:])
            tgt_parts.append(f"<extra_id_{len(starts_idx)}>")
            out_rows.append(
                (
                    doc_id,
                    " ".join(inp_parts),
                    " ".join(tgt_parts),
                    n,
                    int(masked.sum()),
                )
            )
        out = pd.DataFrame(
            out_rows, columns=["doc_id", "input", "target", "n_tokens", "n_masked"]
        )
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_tokens"] = out["n_tokens"].astype("int64")
        out["n_masked"] = out["n_masked"].astype("int64")
        return out

    return normalize_blocks(
        docs.select_columns([id_col, text_col]).map_batches(
            _per_batch, batch_format="pandas"
        ),
        SPAN_CORRUPTION_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Deterministic bipartite negative-edge sampling (two-tower negatives)
# ---------------------------------------------------------------------------

NEG_SAMPLE_SCHEMA = pa.schema(
    [("lkey", pa.int64()), ("rkey", pa.int64()), ("j", pa.int64())]
)

_NEG_A = 2654435761  # Knuth multiplicative constant
_NEG_C = 40503


def bipartite_negative_samples(
    edges: "ray.data.Dataset",
    *,
    l_col: str,
    r_col: str,
    r_max: int,
    per_left: int = 3,
    m_candidates: int = 8,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Negative (non-)edges for two-tower / link-prediction training:
    for every DISTINCT left key, up to ``per_left`` right keys that are
    NOT true edges, drawn from the dense right universe ``1..r_max``
    by the derandomized LCG ``1 + (A*l + C*j) % r_max`` (Knuth
    multiplicative hashing — the same auditable-noise discipline as
    ``dp_noisy_counts``: a SQL twin regenerates the identical
    candidates, so the sample is hash-checkable, re-runnable and
    layout-independent where an RNG stream never is). Collided
    candidates keep their smallest ``j``; survivors of the anti-join
    rank by ``j`` so negatives are a deterministic prefix.

    Shape: one distinct-left reduce, a map-only candidate fan-out
    (``m_candidates`` rows per left key), ONE bucketed anti-join
    against the true edge set, one left-keyed top-k reduce. Fires a
    loud error if ``A*r`` could overflow int64."""
    from .infer import bucketed_reduce
    from .relational import cogroup_join

    import ray
    import ray.data  # noqa: F401  (type reference)

    if _NEG_A * (r_max + m_candidates) >= (1 << 62):
        raise OverflowError("bipartite_negative_samples: universe too large")

    left_schema = pa.schema([("lkey", pa.int64())])

    def _dl(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"lkey": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"lkey": pd.unique(b[l_col].to_numpy(np.int64))}
        )

    lefts = bucketed_reduce(
        edges.select_columns([l_col]),
        ["lkey"],
        lambda g: g.drop_duplicates("lkey"),
        left_schema,
        combiner=_dl,
        num_buckets=num_buckets,
    )

    def _cands(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"lkey": pd.Series([], dtype="int64"),
                 "rkey": pd.Series([], dtype="int64"),
                 "j": pd.Series([], dtype="int64")}
            )
        ls = b["lkey"].to_numpy(np.int64)
        j = np.arange(1, m_candidates + 1, dtype=np.int64)
        lk = np.repeat(ls, m_candidates)
        jj = np.tile(j, len(ls))
        rk = 1 + (_NEG_A * lk + _NEG_C * jj) % np.int64(r_max)
        out = pd.DataFrame({"lkey": lk, "rkey": rk, "j": jj})
        # a colliding (l, r) keeps its smallest j
        return out.groupby(["lkey", "rkey"], sort=False, as_index=False)[
            "j"
        ].min()

    cands = lefts.map_batches(_cands, batch_format="pandas")

    true_schema = pa.schema([("lkey", pa.int64()), ("rkey", pa.int64())])

    def _true(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"lkey": pd.Series([], dtype="int64"),
                 "rkey": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"lkey": b[l_col].to_numpy(np.int64),
             "rkey": b[r_col].to_numpy(np.int64)}
        ).drop_duplicates()

    survivors = cogroup_join(
        cands,
        edges.map_batches(_true, batch_format="pandas"),
        ["lkey", "rkey"],
        how="left_anti",
        num_buckets=num_buckets,
        left_schema=NEG_SAMPLE_SCHEMA,
        right_schema=true_schema,
    )

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["lkey", "j"], kind="stable")
        keep = s.groupby("lkey", sort=False).cumcount() < per_left
        return s.loc[keep.to_numpy()]

    return bucketed_reduce(
        survivors, ["lkey"], _topk, NEG_SAMPLE_SCHEMA,
        num_buckets=num_buckets,
    )
