"""Byte-pair-encoding tokenizer: trainer + encoder (pure functions).

Classic word-level BPE (Sennrich et al. 2016, public): training
operates on the WORD-FREQUENCY table, not the raw corpus — which is
exactly what makes it cheap to distribute: the only corpus-scale work
is one token-count shuffle (Heap's-law-sized residue), and the merge
loop runs over that small table. Ties on pair frequency break to the
lexicographically smallest pair, so the merge list is deterministic.

The end-of-word marker is ``"</w>"`` appended to the last character
symbol (suffix merges stay distinct from mid-word merges).
"""

from __future__ import annotations


END = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    chars = list(word)
    if not chars:
        return ()
    chars[-1] = chars[-1] + END
    return tuple(chars)


def bpe_train_from_counts(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a ``{word: count}`` table.
    Stops early when no pair occurs twice."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        sym = _word_symbols(w)
        if sym:
            vocab[sym] = vocab.get(sym, 0) + int(c)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def bpe_encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Encode one word by applying merges in rank order (the standard
    greedy lowest-rank-first loop)."""
    sym = list(_word_symbols(word))
    while len(sym) > 1:
        best_i, best_rank = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym
