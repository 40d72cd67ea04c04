"""Scalar string normalization functions (reference-parity semantics).

Covers:
- ``limit_predicate_length`` — ``entity_standardization.py:7-31``.
- ``normalize_entity_key``   — ``entity_standardization.py:77-83``
  (the ``norm_key`` used to group entity variants).
- ``normalize_ws``           — ``scripts/clean_graph.py:73-79``
  (strip quotes, collapse whitespace).
- ``is_noise_entity``        — ``scripts/clean_graph.py:57-70``.
- ``PREDICATE_MERGES``       — ``scripts/clean_graph.py:34-55``.
- ``normalize_node_id``      — ``src/graph_rag/graph_store.py:52-59``.
"""

from __future__ import annotations

import re

# Trailing stop-words dropped from truncated predicates
# (entity_standardization.py:26).
PREDICATE_TRAILING_STOPWORDS = frozenset(
    {"a", "an", "the", "of", "with", "by", "to", "from", "in", "on", "for"}
)

# Stop-words removed when building the entity grouping key
# (entity_standardization.py:81).
ENTITY_KEY_STOPWORDS = frozenset(
    {"the", "a", "an", "of", "and", "or", "in", "on", "at", "to", "for", "with", "by", "as"}
)

_WORD_RE = re.compile(r"\b\w+\b")
_WS_RE = re.compile(r"\s+")

# Generic predicate synonym merges (clean_graph.py:34-55).
PREDICATE_MERGES: dict[str, str] = {
    "is": "is_a",
    "are": "is_a",
    "be": "is_a",
    "was": "is_a",
    "were": "is_a",
    "has": "has_component",
    "have": "has_component",
    "include": "includes",
    "includes": "includes",
    "value": "has_value",
    "set": "belongs_to_set",
    "exists": "exists_in",
    "use": "uses",
    "used": "uses",
    "do": "performs",
    "does": "performs",
    "make": "produces",
    "makes": "produces",
    "called": "is_named",
    "known": "is_known_as",
}

# Noise subject/object patterns (clean_graph.py:57-66).
_NOISE_RE = re.compile(
    "|".join(
        [
            r"^(i|we|they|it|he|she|you|this|that|these|those|there|here)$",
            r"^(the|a|an|of|in|on|at|to|for|with|and|or|but|not)$",
            r"^\d+$",
            r"^[.\-_/\\]+$",
            r"^(file|page|line|section|chapter|part|item|example|note)$",
        ]
    ),
    re.IGNORECASE,
)


def limit_predicate_length(predicate: str, max_words: int = 3) -> str:
    """Truncate a predicate to ``max_words`` words; drop a trailing
    stop-word from the truncated form (reference parity, including the
    quirk that the stop-word drop only happens on the truncated path).
    """
    words = predicate.split()
    if len(words) <= max_words:
        return predicate
    shortened = " ".join(words[:max_words])
    last = shortened.split()[-1].lower()
    if last in PREDICATE_TRAILING_STOPWORDS and len(words) > 1:
        shortened = " ".join(shortened.split()[:-1])
    return shortened


def normalize_entity_key(text: str) -> str:
    """Lowercase, tokenize ``\\b\\w+\\b``, drop stop-words, re-join.

    This is the grouping key for canonical-form election; an empty
    result means the entity is skipped by grouping (maps to itself).
    """
    text = text.lower()
    return " ".join(w for w in _WORD_RE.findall(text) if w not in ENTITY_KEY_STOPWORDS)


def normalize_ws(text: object) -> str:
    """Strip surrounding quotes and collapse internal whitespace."""
    if not isinstance(text, str):
        text = str(text)
    text = text.strip().strip('"').strip("'").strip()
    return _WS_RE.sub(" ", text)


def is_noise_entity(text: str) -> bool:
    """True when a subject/object is a pronoun/article/number/etc."""
    return bool(_NOISE_RE.match(text.strip()))


def normalize_node_id(name: object) -> str:
    """Graph-store node id normalization: join lists, strip, lower,
    spaces/hyphens -> underscores (graph_store.py:52-59)."""
    if isinstance(name, list):
        name = ", ".join(str(x) for x in name)
    return str(name).strip().lower().replace(" ", "_").replace("-", "_")
