"""Byte-pair-encoding vocabulary training + encoding — scalar kernels.

Classic BPE (Sennrich, Haddow & Birch, ACL 2016 "Neural Machine
Translation of Rare Words with Subword Units" — public method): train
on a WORD-FREQUENCY table (not the raw corpus; identical words merge
identically), repeatedly merging the most frequent adjacent symbol
pair.  Determinism contract: ties break to the lexicographically
smallest (left, right) pair, so the merge list is a pure function of
the word-count table regardless of dict/corpus order.

The distributed half lives in pipelines/bpe.py: the corpus pass
produces the word-count table (one bucketed exchange, vocab-scale),
the merge loop below runs driver-side over that bounded table — the
same shape HuggingFace tokenizers use (count once, merge in memory).
"""

from __future__ import annotations

EOW = "▁"  # end-of-word sentinel appended to each word's symbols


def word_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence of a word: its characters + EOW."""
    return tuple(word) + (EOW,)


def pair_counts(vocab: dict[tuple[str, ...], int]) -> dict:
    """Adjacent-pair frequencies over the symbolized word-count table."""
    counts: dict = {}
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + n
    return counts


def merge_pair(syms: tuple[str, ...], pair: tuple[str, str]
               ) -> tuple[str, ...]:
    """One left-to-right merge pass of ``pair`` over a symbol tuple."""
    a, b = pair
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(word_counts: dict[str, int], n_merges: int
              ) -> list[tuple[str, str, int]]:
    """Merge list [(left, right, count)] from a word-count table.

    Deterministic: each step merges the (count DESC, left ASC,
    right ASC)-first pair; stops early when no pair repeats."""
    vocab = {word_symbols(w): n for w, n in word_counts.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts = pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((a, b, n))
        vocab = {merge_pair(s, (a, b)): c for s, c in vocab.items()}
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]
                ) -> tuple[str, ...]:
    """Encode one word with a trained merge table: repeatedly apply the
    lowest-rank applicable merge (the standard BPE encoder)."""
    syms = word_symbols(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = merge_pair(syms, best_pair)
    return syms
