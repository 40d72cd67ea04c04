"""Word-window chunking with reference-exact semantics.

Reimplements the loop semantics of the reference chunker
(``/root/reference/src/knowledge_graph/text_utils.py:5-46``) from its
observable behavior:

- Whitespace word split (``str.split()``).
- If the document has ``<= chunk_size`` words, the ORIGINAL text is
  returned verbatim as a single chunk (byte-preserving: it is NOT
  re-joined, so original whitespace survives for short docs).
- Otherwise windows of ``chunk_size`` words are emitted stepping
  ``chunk_size - overlap`` words, each window re-joined with single
  spaces.
- Tail rule: after emitting a window ending at ``end``, the next start
  is ``end - overlap``; if ``start < n_words`` and
  ``start + chunk_size - overlap >= n_words`` the remaining words are
  emitted as one final chunk (which may be as small as ``overlap``
  words and fully contained in the previous chunk).

Chunk ids are 1-indexed, matching ``main.py:154-155``.
"""

from __future__ import annotations


def chunk_text(text: str, chunk_size: int = 500, overlap: int = 50) -> list[str]:
    """Split ``text`` into overlapping word windows (reference parity).

    Deliberate deviation: the reference (``text_utils.py:28-41``)
    INFINITE-LOOPS when ``chunk_size < 2 * overlap`` and the window
    reaches the tail (the tail-exit test ``start + chunk_size -
    overlap >= n`` can never fire, so ``start = end - overlap`` stops
    advancing — e.g. 4 words at size=3/overlap=2). We emit the same
    chunk sequence — the tail chunk included — and break the first
    time ``start`` fails to advance; on every terminating input the
    output is byte-identical (pinned by the property suite's
    hypothesis parity tests). ``overlap >= chunk_size`` (the window
    cannot advance AT ALL; the reference re-emits the first window
    forever) is rejected as a config error.
    """
    if overlap >= chunk_size:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_size ({chunk_size}); "
            "the window could never advance (the reference implementation "
            "hangs on this configuration)"
        )
    words = text.split()
    if len(words) <= chunk_size:
        return [text]

    chunks: list[str] = []
    start = 0
    n = len(words)
    while start < n:
        end = min(start + chunk_size, n)
        chunks.append(" ".join(words[start:end]))
        prev = start
        start = end - overlap
        if start < n and start + chunk_size - overlap >= n:
            chunks.append(" ".join(words[start:]))
            break
        if start <= prev:  # reference would loop forever here
            break
    return chunks


def chunk_rows(
    text: str, chunk_size: int = 500, overlap: int = 50
) -> list[tuple[int, str, int]]:
    """Chunk and attach 1-indexed ids + word counts.

    Returns ``[(chunk_id, chunk_text, n_words), ...]`` — the row layout
    of the ``chunks`` logical table (SURVEY.md §1.4).
    """
    return [
        (i + 1, c, len(c.split())) for i, c in enumerate(chunk_text(text, chunk_size, overlap))
    ]
