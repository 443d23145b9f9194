"""Pure scalar/batch functions (SURVEY.md §2.8) — deterministic, stdlib-only."""

from twine_ray.functions.html_text import html_to_text, sniff_charset
from twine_ray.functions.urls import normalize_url
from twine_ray.functions.textnorm import norm_alias, simple_tokens
from twine_ray.functions.ids import canon_uuid, stable_hash64, bucket_of

__all__ = [
    "html_to_text",
    "sniff_charset",
    "normalize_url",
    "norm_alias",
    "simple_tokens",
    "canon_uuid",
    "stable_hash64",
    "bucket_of",
]
