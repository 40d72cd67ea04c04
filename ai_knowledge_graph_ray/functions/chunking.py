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
    """Split ``text`` into overlapping word windows (reference parity)."""
    words = text.split()
    if len(words) <= chunk_size:
        return [text]

    chunks: list[str] = []
    start = 0
    n = len(words)
    while start < n:
        end = min(start + chunk_size, n)
        chunks.append(" ".join(words[start:end]))
        start = end - overlap
        if start < n and start + chunk_size - overlap >= n:
            chunks.append(" ".join(words[start:]))
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
