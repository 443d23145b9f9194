"""Aho-Corasick multi-pattern matcher (SURVEY.md §2.2 M5 scale path).

Pure-Python automaton built once per actor (``__init__``) over the
normalized alias surfaces; matching is a single pass over the text.
For small dictionaries the regex-alternation matcher in
``twine_ray.stages.mentions`` is faster (C-speed scan); this automaton
is the path that stays O(text) when the dictionary has 10^5+ surfaces,
where a compiled alternation becomes impractical.

Deterministic contract (shared with the regex path, cross-checked in
tests): word-boundary-filtered, leftmost-longest, non-overlapping.
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    def __init__(self, patterns: list[str]) -> None:
        # goto: per-state char -> next-state; lengths: pattern lengths
        # that end exactly at this state (own outputs, not propagated).
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.lengths: list[tuple[int, ...]] = [()]
        for pat in patterns:
            self._insert(pat)
        self._build_links()

    def _insert(self, pat: str) -> None:
        if not pat:
            return
        state = 0
        for ch in pat:
            nxt = self.goto[state].get(ch)
            if nxt is None:
                nxt = len(self.goto)
                self.goto.append({})
                self.fail.append(0)
                self.lengths.append(())
                self.goto[state][ch] = nxt
            state = nxt
        if len(pat) not in self.lengths[state]:
            self.lengths[state] = tuple(
                sorted(self.lengths[state] + (len(pat),))
            )

    def _build_links(self) -> None:
        q: deque[int] = deque(self.goto[0].values())
        while q:
            state = q.popleft()
            for ch, nxt in self.goto[state].items():
                q.append(nxt)
                f = self.fail[state]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                fallback = self.goto[f].get(ch, 0)
                self.fail[nxt] = fallback if fallback != nxt else 0

    def find_all(self, text: str) -> list[tuple[int, int]]:
        """All raw (start, end) matches, including overlaps."""
        matches: list[tuple[int, int]] = []
        state = 0
        for i, ch in enumerate(text):
            while state and ch not in self.goto[state]:
                state = self.fail[state]
            state = self.goto[state].get(ch, 0)
            s = state
            while s:
                for ln in self.lengths[s]:
                    matches.append((i + 1 - ln, i + 1))
                s = self.fail[s]
        return matches


def _is_word(ch: str) -> bool:
    return ch.isalnum() or ch == "_"


def select_matches(
    raw: list[tuple[int, int]], text: str
) -> list[tuple[int, int]]:
    """Word-boundary filter + leftmost-longest non-overlapping selection
    (the shared contract of both matcher implementations)."""
    bounded = [
        (s, e)
        for s, e in raw
        if (s == 0 or not _is_word(text[s - 1]))
        and (e == len(text) or not _is_word(text[e]))
    ]
    bounded.sort(key=lambda se: (se[0], -(se[1] - se[0])))
    chosen: list[tuple[int, int]] = []
    last_end = -1
    for s, e in bounded:
        if s >= last_end:
            chosen.append((s, e))
            last_end = e
    return chosen
