"""Injectable chat-model protocol: real OpenAI-compatible HTTP client
or the deterministic mock used for tests/benchmarks.

The reference hard-wires one HTTP call shape
(``/root/reference/src/knowledge_graph/llm.py:6-61``); here the model
is a constructor-injected dependency of the extraction actor so the
whole pipeline runs hermetically under test (SURVEY.md §2.10, §7.0).

``MockTripleModel`` is a pure function of the prompt text: given the
same chunk it always emits the same response, in one of several
response formats (clean JSON, code-fenced, unquoted keys, trailing
commas, truncated array, garbage) so every ``extract_json_from_text``
repair path is exercised — see FIXTURES.md F3. The same mock is
monkeypatched into the reference's ``call_llm`` by the parity tests,
so reference and rebuild see byte-identical model output.
"""

from __future__ import annotations

import hashlib
import json
import re
from typing import Protocol

_CHUNK_RE = re.compile(r"```\n([\s\S]*?)```")

# Predicate vocabulary; long entries deliberately exceed the 3-word
# limit (with/without a trailing stop-word) to exercise
# limit_predicate_length on both sides.
MOCK_PREDICATES = [
    "uses",
    "supports",
    "relates to",
    "depends on",
    "is part of",
    "enables",
    "controls",
    "produces",
    "derives from the original source",
    "connected together with by",
    "influences",
    "precedes",
]

_TOKEN_STOP = frozenset(
    {"the", "a", "an", "and", "or", "of", "to", "in", "on", "for", "with", "is", "are", "was"}
)
_ALPHA_RE = re.compile(r"[a-z]+")


def _stable_hash(text: str) -> int:
    return int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8], "big")


def mock_triples_for_chunk(chunk: str) -> list[dict]:
    """Rule-based deterministic SPO extraction from a chunk.

    Walks the chunk's significant tokens with a fixed stride, pairing
    token[i] -> token[i+2] under a hash-selected predicate. Injects
    (deterministically) self-loops and missing-key records so the
    validation filters downstream have work to do.
    """
    h = _stable_hash(chunk)
    toks: list[str] = []
    for w in chunk.lower().split():
        m = _ALPHA_RE.search(w)
        if m:
            t = m.group(0)
            if len(t) >= 3 and t not in _TOKEN_STOP:
                toks.append(t)
    out: list[dict] = []
    for i in range(0, max(0, len(toks) - 3), 4):
        s = toks[i]
        o = toks[i + 2]
        p = MOCK_PREDICATES[(h + i) % len(MOCK_PREDICATES)]
        if (h + i) % 17 == 0:
            o = s  # deliberate self-loop
        if (h + i) % 19 == 0:
            out.append({"subject": s, "predicate": p})  # missing object
            continue
        out.append({"subject": s, "predicate": p, "object": o})
    return out


def mock_response_for_chunk(chunk: str) -> str:
    """Render the mock triples in a hash-selected response format."""
    triples = mock_triples_for_chunk(chunk)
    body = json.dumps(triples, indent=1)
    variant = _stable_hash("fmt:" + chunk) % 20
    if variant <= 13:  # 70%: clean JSON array
        return body
    if variant <= 15:  # 10%: code-fenced
        return "Here are the triples:\n```json\n" + body + "\n```\nDone."
    if variant == 16:  # 5%: unquoted keys
        unq = re.sub(r'"(subject|predicate|object)":', r"\1:", body)
        return "Result: " + unq
    if variant == 17:  # 5%: trailing comma before the closing bracket
        return re.sub(r"}\n\]$", "},\n]", body)
    if variant == 18:  # 5%: truncated array (complete objects, no close)
        cut = body.rfind("}")
        return body[: cut + 1] + ',\n {"subject": "tru'
    return "I could not find any triples in this text."  # 5%: garbage


class ChatModel(Protocol):
    """One chat completion: ``(system, user) -> response text``."""

    def chat(self, system_prompt: str | None, user_prompt: str) -> str: ...


class MockTripleModel:
    """Deterministic stand-in for the LLM; pure function of the prompt."""

    def chat(self, system_prompt: str | None, user_prompt: str) -> str:
        matches = _CHUNK_RE.findall(user_prompt)
        if not matches:
            return "{}"  # non-extraction prompts (resolution/inference)
        return mock_response_for_chunk(matches[-1])


class OpenAIChatModel:
    """OpenAI-compatible HTTP chat client (any ``base_url``).

    Same request shape as the reference client (llm.py:6-61): bearer
    auth, optional system message, user content as a text part — PLUS
    the retry policy the reference lacks (it raises on the first
    non-200, ``llm.py:61``, and the caller merely warns and skips the
    chunk): transient transport failures (connection errors, timeouts,
    429, 5xx) are retried ``max_retries`` times with exponential
    backoff; non-retryable statuses (4xx) raise immediately. Semantic
    retries (re-prompt on unparseable output) live in the extraction
    caller, not here. Not reachable in the sandbox (no network) —
    covered by unit tests that fake the session.
    """

    RETRYABLE_STATUSES = frozenset({408, 429, 500, 502, 503, 504})

    def __init__(
        self,
        model: str,
        api_key: str,
        base_url: str,
        max_tokens: int = 1000,
        temperature: float = 0.2,
        timeout: float = 120.0,
        max_retries: int = 3,
        backoff_base: float = 0.5,
    ) -> None:
        import requests

        self.model = model
        self.api_key = api_key
        self.base_url = base_url
        self.max_tokens = max_tokens
        self.temperature = temperature
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.session = requests.Session()  # one session per actor

    def _post_once(self, messages: list[dict]):
        return self.session.post(
            self.base_url,
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
            json={
                "model": self.model,
                "messages": messages,
                "max_tokens": self.max_tokens,
                "temperature": self.temperature,
            },
            timeout=self.timeout,
        )

    def chat(self, system_prompt: str | None, user_prompt: str) -> str:
        import time

        messages = []
        if system_prompt:
            messages.append({"role": "system", "content": system_prompt})
        messages.append(
            {"role": "user", "content": [{"type": "text", "text": user_prompt}]}
        )
        last_err: Exception | None = None
        resp = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                time.sleep(self.backoff_base * (2 ** (attempt - 1)))
            try:
                resp = self._post_once(messages)
            except Exception as ex:  # connection error / timeout
                last_err, resp = ex, None
                continue
            if resp.status_code == 200:
                break
            if resp.status_code in self.RETRYABLE_STATUSES:
                last_err = RuntimeError(
                    f"model API transient failure {resp.status_code}: {resp.text}"
                )
                resp = None
                continue
            raise RuntimeError(f"model API request failed: {resp.text}")
        if resp is None:
            raise RuntimeError(
                f"model API request failed after {self.max_retries + 1} attempts"
            ) from last_err
        if resp.status_code != 200:
            raise RuntimeError(f"model API request failed: {resp.text}")
        return resp.json()["choices"][0]["message"]["content"]


def make_model(config: dict) -> ChatModel:
    """Model factory from the pipeline config (``llm`` section).

    ``provider: mock`` (default in this sandbox) or ``provider: openai``.
    """
    llm = config.get("llm", {})
    if llm.get("provider", "mock") == "mock":
        return MockTripleModel()
    return OpenAIChatModel(
        model=llm["model"],
        api_key=llm.get("api_key", ""),
        base_url=llm["base_url"],
        max_tokens=llm.get("max_tokens", 1000),
        temperature=llm.get("temperature", 0.2),
        max_retries=llm.get("max_retries", 3),
        backoff_base=llm.get("backoff_base", 0.5),
    )
