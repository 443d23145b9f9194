"""Language identification — character n-gram heuristic (training-data
pipeline extra; SURVEY.md §2 addendum).

No model files exist in the sandbox, so this is a small built-in profile
table: per-language top character trigrams + distinctive stopwords,
scored by weighted overlap.  Deterministic pure function of the text.
The Ray stage wraps it in an actor pool so the profile dict is built
once per actor (see twine_ray/pipelines/text.py).
"""

from __future__ import annotations

import re
from collections import Counter

# Distinctive stopwords per language (weight 3 each hit).
_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it was for with as his on be at by this had".split()),
    "de": frozenset("der die und das den von ist mit dem nicht ein eine auf für sich des".split()),
    "fr": frozenset("le la les des et est une dans que pour par sur avec pas au du".split()),
    "es": frozenset("el la los las de que en un una por con para es del se no".split()),
    "it": frozenset("il la di che e un una per con del non sono della nel".split()),
    "pt": frozenset("o a os as de que em um uma para com não por mais dos".split()),
    "nl": frozenset("de het een van en in is dat op te met voor niet zijn".split()),
}

# Characteristic trigrams (weight 1 each occurrence).
_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", "ing", "and", "ion", "tio", "ent", "ati", "her"),
    "de": ("der", "ein", "ich", "sch", "die", "und", "den", "cht"),
    "fr": ("les", "ent", "des", "que", "ait", "our", "ais", "eur"),
    "es": ("que", "ión", "los", "ado", "con", "sta", "ent", "nte"),
    "it": ("che", "ione", "ent", "lla", "del", "are", "ato", "gli")[:8],
    "pt": ("que", "ção", "ado", "com", "ara", "ent", "os ", "do "),
    "nl": ("een", "het", "van", "der", "ijk", "sch", "aar", "oor"),
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def detect_lang(text: str, min_chars: int = 20) -> str:
    """Return an ISO 639-1 code guess or '' when undecidable.

    Scoring: 3 points per distinctive-stopword token + 1 point per
    characteristic-trigram occurrence, normalized by token count; the
    top language wins if its score clears a small threshold, ties broken
    by language-code order (deterministic).
    """
    if len(text) < min_chars:
        return ""
    sample = text[:4000].casefold()
    tokens = _WORD_RE.findall(sample)
    if not tokens:
        return ""
    tok_counts = Counter(tokens)
    scores: dict[str, float] = {}
    for lang in sorted(_STOPWORDS):
        sw = _STOPWORDS[lang]
        s = 3.0 * sum(c for t, c in tok_counts.items() if t in sw)
        for tri in _TRIGRAMS[lang]:
            s += sample.count(tri) * 0.5
        scores[lang] = s / max(1, len(tokens))
    best = max(sorted(scores), key=lambda k: scores[k])
    if scores[best] < 0.15:
        return ""
    return best


def langid_feature_counts(text: str) -> dict[str, tuple[int, int]]:
    """INTEGER langid feature counts per language — the SQL-expressible
    slice of the profile scoring (frozen scalar spec; the DuckDB oracle
    reconstructs it exactly).  Uses ASCII lower + ``[a-z]+`` tokens so
    both engines tokenize byte-identically (RE2 == Python on this
    class); ``detect_lang`` itself casefolds and uses the Unicode word
    class — the small divergence is documented, the COUNTS here are
    what the driver hash-checks.

    Returns {lang: (stopword_token_hits, trigram_occurrences)} with
    non-overlapping left-to-right trigram counting (str.count — what a
    replace()-based SQL count also yields)."""
    sample = (text or "")[:4000].lower()
    toks = re.findall(r"[a-z]+", sample)
    out: dict[str, tuple[int, int]] = {}
    for lang in sorted(_STOPWORDS):
        sw = sum(1 for t in toks if t in _STOPWORDS[lang])
        tri = sum(sample.count(t) for t in _TRIGRAMS[lang])
        out[lang] = (sw, tri)
    return out
