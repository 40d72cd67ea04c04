"""Prompt registry (swappable, as in the reference's PromptFactory,
``/root/reference/src/knowledge_graph/prompts/__init__.py:29-75``).

The registry maps names to static strings or callables. Prompt WORDING
here is our own; it preserves the reference prompts' *contract* (the
parts that shape emitted triples, ``prompts/main_prompts.py:3-54``):
lower-case subject/predicate/object, predicates hard-capped at 3
words, output strictly a JSON array of {subject, predicate, object},
chunk delimited by triple backticks. The deterministic mock model
keys only on the fenced chunk, so tests are insensitive to wording;
real-LLM deployments can swap these strings via ``register``.
"""

from __future__ import annotations

from typing import Callable

MAIN_SYSTEM_PROMPT = """
You are a knowledge-extraction system that turns prose into a knowledge graph.
HARD CONSTRAINT: every predicate you output must be at most 3 words (1-2 preferred).
"""

MAIN_USER_PROMPT = """
Read the text delimited by triple backticks and list every Subject-Predicate-Object
relationship it states, as a single JSON array of objects.

Rules:
- Use one consistent, canonical name per entity across the whole text.
- Keep terms atomic (one concept per term); resolve pronouns to their referents.
- Predicates: 3 words maximum, concise.
- Write all subject/predicate/object text in lower-case, including proper names.
- Emit one object per relationship: {"subject": ..., "predicate": ..., "object": ...}.
- Output ONLY the JSON array, nothing else.

Text to analyze (between triple backticks):
"""

ENTITY_RESOLUTION_SYSTEM = """
You merge duplicate entity names in a knowledge graph. Respond with JSON only.
"""

def entity_resolution_user(entity_list: str) -> str:
    return (
        "Group the entity names below that refer to the same real-world entity.\n"
        "Return a JSON object mapping each canonical name to the list of its variants.\n"
        "Only include groups with 2+ variants. JSON only.\n\nEntities:\n" + entity_list
    )

RELATIONSHIP_INFERENCE_SYSTEM = """
You propose plausible missing relationships between knowledge-graph entities.
Predicates must be at most 3 words. Respond with a JSON array only.
"""

def relationship_inference_user(entities1: str, entities2: str, triples_text: str) -> str:
    return (
        "Given these two groups of entities from disconnected graph regions:\n"
        f"Group A: {entities1}\nGroup B: {entities2}\n\n"
        "and these existing relationships:\n" + triples_text + "\n\n"
        "Propose 2-3 new cross-group relationships as a JSON array of "
        '{"subject", "predicate", "object"} objects. JSON only.'
    )

WITHIN_COMMUNITY_SYSTEM = RELATIONSHIP_INFERENCE_SYSTEM

def within_community_user(pairs_text: str, triples_text: str) -> str:
    return (
        "These entity pairs look semantically related but are not connected:\n"
        + pairs_text
        + "\n\nExisting relationships:\n"
        + triples_text
        + '\n\nPropose relationships for the related pairs as a JSON array of '
        '{"subject", "predicate", "object"} objects. JSON only.'
    )


_REGISTRY: dict[str, str | Callable[..., str]] = {
    "main_system": MAIN_SYSTEM_PROMPT,
    "main_user": MAIN_USER_PROMPT,
    "entity_resolution_system": ENTITY_RESOLUTION_SYSTEM,
    "entity_resolution_user": entity_resolution_user,
    "relationship_inference_system": RELATIONSHIP_INFERENCE_SYSTEM,
    "relationship_inference_user": relationship_inference_user,
    "within_community_system": WITHIN_COMMUNITY_SYSTEM,
    "within_community_user": within_community_user,
}


def get_prompt(name: str, *args) -> str:
    """Fetch a prompt by name; callables are invoked with ``*args``."""
    entry = _REGISTRY[name]
    if callable(entry):
        return entry(*args)
    return entry


def register(name: str, prompt: str | Callable[..., str]) -> None:
    """User-extension surface: swap or add prompts (SURVEY.md §2.10)."""
    _REGISTRY[name] = prompt
