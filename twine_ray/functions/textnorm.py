"""Text normalization for entity-linking keys (SURVEY.md §2.8).

Analog of Spindle's string canonicalization when matching coreference
URIs/labels (``spindle:common/rulebase.c`` string handling): alias keys
must hash identically on every node, so normalization is Unicode NFKC +
casefold + whitespace collapse — all deterministic stdlib operations.
"""

from __future__ import annotations

import re
import unicodedata

_WS_RE = re.compile(r"\s+")

_TOKEN_RE = re.compile(r"[\w]+(?:'[\w]+)?", re.UNICODE)

# ASCII twin of _TOKEN_RE: DuckDB/RE2's \w is ASCII-only while Python's
# is Unicode-aware, so oracle-checked token counts use this explicitly
# ASCII class on BOTH sides — parity no longer depends on the corpus
# happening to be ASCII (ADVICE.md round 1).
_TOKEN_RE_ASCII = re.compile(r"[\w]+(?:'[\w]+)?", re.ASCII)


def norm_alias(s: str) -> str:
    """Canonical alias key: NFKC, casefold, collapse whitespace, strip."""
    s = unicodedata.normalize("NFKC", s)
    s = s.casefold()
    return _WS_RE.sub(" ", s).strip()


def simple_tokens(s: str) -> list[str]:
    """Deterministic word tokenizer (BPE-ish regex: word chars with an
    optional internal apostrophe). Used by token counting and quality
    scoring."""
    return _TOKEN_RE.findall(s)


def simple_tokens_ascii(s: str) -> list[str]:
    """ASCII-\\w variant of ``simple_tokens`` matching DuckDB/RE2
    semantics exactly — the tokenizer for oracle-checked counts."""
    return _TOKEN_RE_ASCII.findall(s)
