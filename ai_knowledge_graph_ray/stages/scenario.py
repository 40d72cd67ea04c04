"""Scenario evaluation over the materialized graph (§3.3 consumer).

Reference: ``graph_rag/logic_engine.py:165-224`` (``TradeReasoner``) —
a driver-side reasoner that maps detector signals to graph nodes,
checks red-flag disqualifiers, scores confluence, and picks the model
whose graph-derived prerequisites the signals best satisfy
(specificity-normalized, ``logic_engine.py:361-487``). The reference
evaluates ONE scenario per call against an in-memory networkx store.

This operator generalizes it to a BATCH contract over the engine's
materialized tables: scenarios are a ``ray.data.Dataset`` (billions of
rows at scale) streaming through a stateful actor pool; the rule
blueprint (model -> required concepts) is the SMALL side — count-gated,
collected once, broadcast via ``ray.put``, loaded per actor in
``__init__``. Per batch, evaluation is vectorized pandas/numpy:

- signal -> node mapping: explode + normalize + exact/substring match
  against the requirement inventory (cross product via ``merge`` on a
  constant key + ``np.char.find``; the requirement side is bounded by
  the curated blueprint, never the corpus),
- red flags: per-scenario membership intersection with the broadcast
  red-flag set (the "red-flag anti-join"),
- confluence: per-scenario sum of broadcast factor weights,
- model fit: per (scenario, model) satisfied-requirement counts and
  specificity sums via C-level groupby; reference scoring blend
  ``7*sat/total + 3*spec/max_spec + 1.5 perfect-fit bonus``
  (``logic_engine.py:436-447``), argmax per scenario with
  deterministic name tie-break.

No driver-side loop over scenarios; no shuffle at all — the only
exchange is the one-time broadcast of the blueprint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.textnorm import normalize_node_id

DECISION_SCHEMA = pa.schema(
    [
        ("scenario_id", pa.int64()),
        ("recommendation", pa.string()),
        ("model_score_milli", pa.int64()),
        ("confluence_milli", pa.int64()),
        ("n_satisfied", pa.int64()),
        ("n_missing", pa.int64()),
        ("n_red_flags", pa.int64()),
        ("go_no_go", pa.bool_()),
    ]
)

# Bound on the collected blueprint: the rule graph is a curated
# consumer contract (models x requirements), not corpus-sized. A rules
# dataset past this is a caller error, not a gate to a distributed
# path — evaluation semantics NEED the whole blueprint per actor.
MAX_RULES = 200_000


def _norm_signals(sig_lists: pd.Series) -> pd.DataFrame:
    """Explode list-of-signals rows to (row_pos, signal_norm)."""
    pos, sig = [], []
    for i, lst in enumerate(sig_lists):
        if lst is None:
            continue
        for s in lst:
            pos.append(i)
            sig.append(normalize_node_id(s))
    return pd.DataFrame({"pos": np.asarray(pos, dtype=np.int64), "signal": sig})


class ScenarioEvaluator:
    """Actor-pool stage: blueprint/red-flags/weights fetched from the
    object store ONCE per actor; per-batch work is vectorized."""

    def __init__(
        self,
        rules_ref,
        red_flags_ref,
        weights_ref,
        min_score_milli: int,
    ) -> None:
        rules: pd.DataFrame = ray.get(rules_ref)
        self.red_flags: frozenset[str] = frozenset(ray.get(red_flags_ref))
        weights: dict[str, float] = ray.get(weights_ref)
        self.min_score_milli = min_score_milli

        rules = rules.copy()
        rules["model"] = rules["model"].map(normalize_node_id)
        rules["req_lower"] = rules["requirement"].astype(str).str.lower()
        rules = rules.drop_duplicates(["model", "req_lower"])
        # specificity: a requirement shared by k models contributes 1/k
        # (logic_engine.py:377-383,428-431)
        sharing = rules.groupby("req_lower")["model"].transform("nunique")
        rules["specificity_milli"] = (1000.0 / sharing).round().astype(np.int64)
        self.rules = rules.reset_index(drop=True)
        per_model = rules.groupby("model").agg(
            total=("req_lower", "size"), max_spec_milli=("specificity_milli", "sum")
        )
        self.model_totals = per_model
        self.req_arr = rules["req_lower"].to_numpy(dtype="U")
        self.weights_milli = {
            normalize_node_id(k): int(round(v * 1000)) for k, v in weights.items()
        }

    def _match(self, signals: pd.DataFrame) -> pd.DataFrame:
        """(pos, signal) x requirement inventory -> matched
        (pos, model, req_lower, specificity_milli). Reference match
        rule (logic_engine.py:396-402): the detected node, or its
        label with underscores as spaces, appears in the requirement
        text."""
        uniq = signals.drop_duplicates(["signal"])
        if len(uniq) == 0 or len(self.rules) == 0:
            return pd.DataFrame(
                {
                    "pos": pd.Series(dtype=np.int64),
                    "model": pd.Series(dtype=object),
                    "req_lower": pd.Series(dtype=object),
                    "specificity_milli": pd.Series(dtype=np.int64),
                }
            )
        sig_arr = uniq["signal"].to_numpy(dtype="U")
        lbl_arr = np.char.replace(sig_arr, "_", " ")
        # (n_sig, n_req) containment masks — requirement side bounded
        hay = self.req_arr[None, :]
        hit = (np.char.find(hay, sig_arr[:, None]) >= 0) | (
            np.char.find(hay, lbl_arr[:, None]) >= 0
        )
        si, ri = np.nonzero(hit)
        if len(si) == 0:
            return self._match(signals.iloc[0:0])
        matched = pd.DataFrame(
            {
                "signal": sig_arr[si],
                "model": self.rules["model"].to_numpy()[ri],
                "req_lower": self.req_arr[ri],
                "specificity_milli": self.rules["specificity_milli"].to_numpy()[ri],
            }
        )
        out = signals.merge(matched, on="signal")
        # a requirement counts once per scenario/model no matter how
        # many signals matched it
        return out.drop_duplicates(["pos", "model", "req_lower"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return DECISION_SCHEMA.empty_table().to_pandas()
        sids = batch["scenario_id"].to_numpy()
        signals = _norm_signals(batch["signals"])

        red = np.zeros(n, dtype=np.int64)
        conf = np.zeros(n, dtype=np.int64)
        if len(signals):
            uniq = signals.drop_duplicates(["pos", "signal"])
            flags = uniq[uniq["signal"].isin(self.red_flags)]
            if len(flags):
                vc = flags.groupby("pos").size()
                red[vc.index.to_numpy()] = vc.to_numpy()
            w = uniq["signal"].map(self.weights_milli)
            wsum = uniq.assign(w=w.fillna(0).astype(np.int64)).groupby("pos")["w"].sum()
            conf[wsum.index.to_numpy()] = wsum.to_numpy()

        best_model = np.full(n, "", dtype=object)
        best_score = np.zeros(n, dtype=np.int64)
        best_sat = np.zeros(n, dtype=np.int64)
        best_miss = np.zeros(n, dtype=np.int64)
        matched = self._match(signals) if len(signals) else signals.iloc[0:0]
        if len(matched):
            per = (
                matched.groupby(["pos", "model"])
                .agg(sat=("req_lower", "size"), spec_milli=("specificity_milli", "sum"))
                .reset_index()
                .merge(self.model_totals, left_on="model", right_index=True)
            )
            # reference blend, integer milli-points: 7*sat/total
            # + 3*spec/max_spec + 1.5 when every requirement is met
            per["score_milli"] = (
                (7000 * per["sat"]) // per["total"]
                + (3000 * per["spec_milli"]) // per["max_spec_milli"].clip(lower=1)
                + np.where(per["sat"] == per["total"], 1500, 0)
            ).astype(np.int64)
            # argmax per scenario; ties broken by model name for
            # partition-independent determinism
            per = per.sort_values(
                ["pos", "score_milli", "model"],
                ascending=[True, False, True],
                kind="stable",
            ).drop_duplicates(["pos"])
            idx = per["pos"].to_numpy()
            best_model[idx] = per["model"].to_numpy()
            best_score[idx] = per["score_milli"].to_numpy()
            best_sat[idx] = per["sat"].to_numpy()
            best_miss[idx] = (per["total"] - per["sat"]).to_numpy()

        go = (
            (red == 0)
            & (best_model != "")
            & (conf + best_score >= self.min_score_milli)
        )
        return pd.DataFrame(
            {
                "scenario_id": sids.astype(np.int64),
                "recommendation": best_model,
                "model_score_milli": best_score,
                "confluence_milli": conf,
                "n_satisfied": best_sat,
                "n_missing": best_miss,
                "n_red_flags": red,
                "go_no_go": go,
            }
        )


def evaluate_scenarios(
    scenarios: ray.data.Dataset,
    rules: ray.data.Dataset,
    *,
    red_flags: list[str] | None = None,
    weights: dict[str, float] | None = None,
    min_score: float = 5.0,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Evaluate ``scenarios(scenario_id:int64, signals:list<string>)``
    against a rule blueprint ``rules(model, requirement)`` derived from
    the materialized graph; returns one decision row per scenario
    (:data:`DECISION_SCHEMA`, scores in integer milli-points).

    The blueprint is the broadcast small side: counted first (hard cap
    :data:`MAX_RULES` — the blueprint is a curated contract, so
    overflow is an error, not a spill-to-distributed gate), shipped
    once via ``ray.put``, fetched per actor. Scenario evaluation
    itself is shuffle-free and streams.
    """
    rules = rules.materialize()  # count + collect without re-execution
    n_rules = rules.count()
    if n_rules > MAX_RULES:
        raise ValueError(
            f"rule blueprint has {n_rules} rows (cap {MAX_RULES}); "
            "scenario evaluation broadcasts the whole blueprint — a "
            "corpus-sized rules input is a caller error"
        )
    rules_df = (
        rules.select_columns(["model", "requirement"]).to_pandas()
        if n_rules
        else pd.DataFrame({"model": [], "requirement": []})
    )
    rules_ref = ray.put(rules_df)
    red_ref = ray.put([normalize_node_id(f) for f in (red_flags or [])])
    weights_ref = ray.put(weights or {})

    from .infer import normalize_blocks

    return normalize_blocks(
        scenarios.map_batches(
            ScenarioEvaluator,
            fn_constructor_args=(
                rules_ref,
                red_ref,
                weights_ref,
                int(round(min_score * 1000)),
            ),
            batch_format="pandas",
            concurrency=concurrency,
        ),
        DECISION_SCHEMA,
    )


def scenarios_from_chunks(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Derive a deterministic scenario table from extracted triples:
    one scenario per chunk, signals = the chunk's distinct entities
    (sorted). Chunk ids are globally unique per (url, chunk_id); the
    scenario_id is their stable hash. One bucketed shuffle."""
    from .infer import bucketed_reduce

    def _explode(b: pa.Table) -> pa.Table:
        urls = b["url"].to_pylist()
        cids = b["chunk_id"].to_pylist()
        subs = b["subject"].to_pylist()
        objs = b["object"].to_pylist()
        key, ent = [], []
        for u, c, s, o in zip(urls, cids, subs, objs):
            k = f"{u}#{c}"
            key.append(k)
            ent.append(str(s))
            key.append(k)
            ent.append(str(o))
        return pa.table(
            {"key": pa.array(key, pa.string()), "entity": pa.array(ent, pa.string())}
        )

    out_schema = pa.schema(
        [("scenario_id", pa.int64()), ("signals", pa.list_(pa.string()))]
    )

    def _collect(g: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        g = g.drop_duplicates(["key", "entity"]).sort_values(
            ["key", "entity"], kind="stable"
        )
        grouped = g.groupby("key", sort=True)["entity"].agg(list)
        # engine-portable stable id: first 8 md5 bytes of the chunk
        # key, sign bit cleared (DuckDB md5 reproduces it; the pandas
        # hash it replaces was engine-specific)
        sid = np.fromiter(
            (
                int.from_bytes(hashlib.md5(k.encode()).digest()[:8], "big")
                & 0x7FFFFFFFFFFFFFFF
                for k in grouped.index
            ),
            dtype=np.int64,
            count=len(grouped),
        )
        return pd.DataFrame({"scenario_id": sid, "signals": grouped.to_numpy()})

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["key", "entity"])

    return bucketed_reduce(
        triples.select_columns(["url", "chunk_id", "subject", "object"]).map_batches(
            _explode, batch_format="pyarrow"
        ),
        ["key"],
        _collect,
        out_schema,
        combiner=_dd,
    )


def rules_from_edges(
    edges: ray.data.Dataset,
    *,
    n_models: int = 8,
    max_requirements: int = 20,
) -> ray.data.Dataset:
    """Derive a deterministic rule blueprint from the materialized
    edges table: models = the ``n_models`` highest-out-degree hub
    nodes (ties by name), requirements = each hub's first
    ``max_requirements`` distinct out-neighbors (sorted). Two small
    aggregations over the edges table; the result is blueprint-sized
    by construction."""

    def _partial(b: pa.Table) -> pa.Table:
        df = b.select(["src", "dst"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from .infer import bucketed_reduce

    pair_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])

    def _dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["src", "dst"])

    distinct = bucketed_reduce(
        edges.select_columns(["src", "dst"]), ["src", "dst"], _dd, pair_schema,
        combiner=_dd,
    ).materialize()

    # no rename_columns here: the count() output is pandas-backed and
    # rename_columns breaks on pandas blocks (NOTES.md item 10)
    deg = (
        distinct.groupby("src")
        .count()
        .sort(["count()", "src"], descending=[True, False])
        .limit(n_models)
        .to_pandas()
    )
    hubs = set(deg["src"])
    hubs_ref = ray.put(hubs)

    def _filter(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b["src"].isin(ray.get(hubs_ref))]
        return pd.DataFrame(
            {"model": keep["src"].to_numpy(), "requirement": keep["dst"].to_numpy()}
        )

    rules_schema = pa.schema([("model", pa.string()), ("requirement", pa.string())])

    def _cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["model", "requirement"], kind="stable")
        return g.groupby("model", sort=False).head(max_requirements)

    from .infer import normalize_blocks

    return bucketed_reduce(
        normalize_blocks(
            distinct.map_batches(_filter, batch_format="pandas"), rules_schema
        ),
        ["model"],
        _cap,
        rules_schema,
    )
