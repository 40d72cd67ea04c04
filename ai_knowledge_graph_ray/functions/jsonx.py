"""Robust JSON recovery from model output.

Behavior-parity reimplementation of the reference's response parser
(``/root/reference/src/knowledge_graph/llm.py:63-163``). Recovery
ladder, in order:

1. If a triple-backtick code fence is present, use the first fenced
   body (optionally tagged ``json``).
2. Direct ``json.loads`` of the (possibly unfenced) text.
3. Locate the first ``[`` and bracket-count to its matching ``]``;
   parse that slice.
4. If the slice fails, repair: quote bare object keys, strip trailing
   commas before ``]``/``}``; retry.
5. If the array never closes (truncated output), salvage every
   complete ``{...}`` object after the ``[`` by brace counting,
   reassemble them into an array, parse (with the same repair retry).

Returns the parsed value (list or dict) or ``None`` — the reference
treats an unparseable response as a skipped chunk.
"""

from __future__ import annotations

import json
import re
from typing import Any

_FENCE_RE = re.compile(r"```(?:json)?\s*([\s\S]*?)```")
_BARE_KEY_RE = re.compile(r"(\s*)(\w+)(\s*):(\s*)")
_TRAILING_COMMA_RE = re.compile(r",(\s*[\]}])")


def _repair(candidate: str) -> Any | None:
    fixed = _BARE_KEY_RE.sub(r'\1"\2"\3:\4', candidate)
    fixed = _TRAILING_COMMA_RE.sub(r"\1", fixed)
    try:
        return json.loads(fixed)
    except Exception:
        return None


def extract_json_from_text(text: str) -> Any | None:
    """Extract a JSON value from model output; ``None`` on failure."""
    fence = _FENCE_RE.search(text)
    if fence:
        text = fence.group(1).strip()

    try:
        return json.loads(text)
    except json.JSONDecodeError:
        pass

    start = text.find("[")
    if start == -1:
        return None

    depth = 0
    json_str: str | None = None
    for i in range(start, len(text)):
        ch = text[i]
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                json_str = text[start : i + 1]
                break

    if json_str is not None:
        try:
            return json.loads(json_str)
        except json.JSONDecodeError:
            return _repair(json_str)

    # Truncated array: salvage complete {...} objects.
    objects: list[str] = []
    brace = 0
    obj_start = -1
    for i in range(start + 1, len(text)):
        ch = text[i]
        if ch == "{":
            if brace == 0:
                obj_start = i
            brace += 1
        elif ch == "}":
            brace -= 1
            if brace == 0:
                objects.append(text[obj_start : i + 1])
    if objects:
        rebuilt = "[\n" + ",\n".join(objects) + "\n]"
        try:
            return json.loads(rebuilt)
        except json.JSONDecodeError:
            return _repair(rebuilt)
    return None
