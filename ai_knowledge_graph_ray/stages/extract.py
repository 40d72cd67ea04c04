"""chunks -> triples_raw: model-backed SPO triple extraction.

The hot stage. The reference runs one blocking LLM call per chunk in a
single thread (``main.py:142-171``); here it is an **actor pool**:
``map_batches(TripleExtractor, concurrency=N, batch_size=B)`` where
the model/client is constructed once per actor in ``__init__`` and
each batch row costs one ``model.chat`` round trip (same call
granularity as the reference, ``main.py:150``, but N-wide).

Per-chunk post-processing mirrors ``process_with_llm``
(``main.py:19-88``): prompt assembly -> model call -> robust JSON
recovery (``functions/jsonx.py``) -> keep only records with
subject/predicate/object -> 3-word predicate limit. A failed parse
skips the chunk (reference behavior: warn & skip,
``main.py:159-160``) but is recorded in the ``rejects`` side output
rather than silently dropped.

Output carries provenance ``(url, chunk_id, seq)`` — ``seq`` is the
triple's position in the model response, the explicit stable ordering
key that replaces the reference's implicit list order (SURVEY.md
§2.9) so downstream dedup tie-breaks are deterministic under
parallelism.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions import prompts
from ..functions.jsonx import extract_json_from_text
from ..functions.model import ChatModel, make_model
from ..functions.textnorm import limit_predicate_length

TRIPLES_RAW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("chunk_id", pa.int32()),
        ("seq", pa.int32()),
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
    ]
)


_SEMANTIC_RETRY_SUFFIX = (
    "\n\nYour previous response could not be parsed as a JSON array of "
    "triples. Respond with ONLY a JSON array of objects, each with "
    '"subject", "predicate" and "object" string fields — no prose, no '
    "code fences."
)


def extract_chunk_triples(
    model: ChatModel,
    chunk_text: str,
    _prompts: tuple[str, str] | None = None,
    semantic_retries: int = 1,
) -> list[dict] | None:
    """One chunk through the model; parity with ``process_with_llm``.

    Returns validated triples or ``None`` when the response yields no
    parseable/valid triples (chunk routed to the rejects side-channel).
    A response that fails JSON recovery is re-prompted once (the
    SEMANTIC retry SURVEY §4.1 requires to be explicit — the reference
    silently skips the chunk, ``main.py:159-160``; transport retries
    live in the model client). ``_prompts`` lets the actor pass its
    per-actor cached (system, user-prefix) pair instead of hitting the
    registry per chunk.
    """
    if _prompts is None:
        _prompts = (prompts.get_prompt("main_system"), prompts.get_prompt("main_user"))
    system_prompt, user_prefix = _prompts
    user_prompt = user_prefix + f"```\n{chunk_text}```\n"
    result = None
    for attempt in range(semantic_retries + 1):
        prompt = user_prompt if attempt == 0 else user_prompt + _SEMANTIC_RETRY_SUFFIX
        response = model.chat(system_prompt, prompt)
        result = extract_json_from_text(response)
        if result and isinstance(result, list):
            break
    if not result or not isinstance(result, list):
        return None
    valid = []
    for item in result:
        if (
            isinstance(item, dict)
            and "subject" in item
            and "predicate" in item
            and "object" in item
        ):
            item = dict(item)
            item["predicate"] = limit_predicate_length(str(item["predicate"]))
            valid.append(item)
    return valid or None


class TripleExtractor:
    """Actor-pool callable: model built once per actor, one chat call
    per chunk row per batch."""

    def __init__(self, config: dict | None = None, emit_rejects: bool = False) -> None:
        self.model = make_model(config or {})
        self.emit_rejects = emit_rejects
        self.semantic_retries = (config or {}).get("llm", {}).get("semantic_retries", 1)
        # Prompt strings resolved once per actor, not once per chunk.
        self.prompts = (
            prompts.get_prompt("main_system"),
            prompts.get_prompt("main_user"),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        chunk_ids: list[int] = []
        seqs: list[int] = []
        subs: list[str] = []
        preds: list[str] = []
        objs: list[str] = []
        rejects: list[tuple[str, int]] = []
        for url, cid, ctext in zip(
            batch["url"].to_pylist(),
            batch["chunk_id"].to_pylist(),
            batch["chunk_text"].to_pylist(),
        ):
            triples = extract_chunk_triples(
                self.model, ctext, self.prompts, self.semantic_retries
            )
            if triples is None:
                rejects.append((url, cid))
                continue
            for seq, t in enumerate(triples):
                urls.append(url)
                chunk_ids.append(cid)
                seqs.append(seq)
                subs.append(str(t["subject"]))
                preds.append(str(t["predicate"]))
                objs.append(str(t["object"]))
        out = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "chunk_id": pa.array(chunk_ids, pa.int32()),
                "seq": pa.array(seqs, pa.int32()),
                "subject": pa.array(subs, pa.string()),
                "predicate": pa.array(preds, pa.string()),
                "object": pa.array(objs, pa.string()),
            }
        )
        if self.emit_rejects:
            status = ["ok"] * len(urls) + ["reject"] * len(rejects)
            out = pa.table(
                {
                    "url": pa.array(urls + [r[0] for r in rejects], pa.string()),
                    "chunk_id": pa.array(
                        chunk_ids + [r[1] for r in rejects], pa.int32()
                    ),
                    "seq": pa.array(seqs + [-1] * len(rejects), pa.int32()),
                    "subject": pa.array(subs + [""] * len(rejects), pa.string()),
                    "predicate": pa.array(preds + [""] * len(rejects), pa.string()),
                    "object": pa.array(objs + [""] * len(rejects), pa.string()),
                    "status": pa.array(status, pa.string()),
                }
            )
        return out


def extract_triples(
    chunks: ray.data.Dataset,
    config: dict | None = None,
    *,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int | None = 64,
    num_cpus: float = 1,
    emit_rejects: bool = False,
) -> ray.data.Dataset:
    """``chunks`` -> ``triples_raw(url, chunk_id, seq, subject,
    predicate, object)`` via the extraction actor pool.

    Size ``concurrency``/``num_cpus`` to the model: a local
    CPU-bound mock wants ``num_cpus=1``; an HTTP-backed model is
    I/O-bound and can oversubscribe (``num_cpus<1``, larger pool).
    """
    return chunks.map_batches(
        TripleExtractor,
        fn_constructor_kwargs={"config": config, "emit_rejects": emit_rejects},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
