"""Document quality scoring (training-data pipeline extra).

Gopher/C4-style heuristic ratios over extracted text — all cheap,
deterministic, and expressible column-at-a-time so the Ray stage stays
vectorized where possible (twine_ray/pipelines/text.py).
"""

from __future__ import annotations

import re

from twine_ray.functions.textnorm import simple_tokens

_ALPHA_RE = re.compile(r"[^\W\d_]", re.UNICODE)
_PUNCT_RE = re.compile(r"[!\"#$%&'()*+,\-./:;<=>?@\[\]^_`{|}~]")
_STOP_EN = frozenset(
    "the be to of and a in that have i it for not on with he as you do at".split()
)


def quality_features(text: str) -> dict[str, float]:
    """Return the frozen feature dict for one document.

    Features: n_chars, n_tokens, mean_token_len, alpha_ratio,
    punct_ratio, stopword_ratio, max_line_frac (longest line / total).
    """
    n_chars = len(text)
    tokens = simple_tokens(text)
    n_tokens = len(tokens)
    mean_tok = (sum(len(t) for t in tokens) / n_tokens) if n_tokens else 0.0
    alpha = len(_ALPHA_RE.findall(text))
    punct = len(_PUNCT_RE.findall(text))
    stop = sum(1 for t in tokens if t.lower() in _STOP_EN)
    lines = text.split("\n") or [""]
    max_line = max(len(ln) for ln in lines)
    return {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tokens),
        "mean_token_len": mean_tok,
        "alpha_ratio": alpha / n_chars if n_chars else 0.0,
        "punct_ratio": punct / n_chars if n_chars else 0.0,
        "stopword_ratio": stop / n_tokens if n_tokens else 0.0,
        "max_line_frac": max_line / n_chars if n_chars else 0.0,
    }


def quality_score(feats: dict[str, float]) -> float:
    """Scalar quality score in [0, 1] from the frozen features.

    Simple product of clamped sub-scores; deterministic and monotone in
    the obvious directions.
    """
    def clamp(x: float) -> float:
        return max(0.0, min(1.0, x))

    length_ok = clamp(feats["n_tokens"] / 50.0)
    alpha_ok = clamp((feats["alpha_ratio"] - 0.3) / 0.4)
    punct_ok = clamp(1.0 - feats["punct_ratio"] * 4.0)
    toklen_ok = clamp(1.0 - abs(feats["mean_token_len"] - 5.0) / 5.0)
    return round(length_ok * alpha_ok * punct_ok * toklen_ok, 6)
