"""Stage M8: literal normalization — datatype coercion per property
rule (``spindle:generate/props.c``-style handling: expected datatype
per predicate, lexical canonicalization, language-tag lowercasing).

Vectorized where Arrow kernels exist; scalar Python only for the
datetime/decimal canonicalizers (regex-gated so untyped literals pass
through untouched — Twine keeps unknown lexical forms verbatim).
"""

from __future__ import annotations

import re

import pandas as pd

from twine_ray.state.rulebase import XSD_DATETIME

XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"
XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"

_INT_RE = re.compile(r"^[+-]?\d+$")
_DEC_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)$")
_DT_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[T ](\d{2}):(\d{2}):(\d{2})(\.\d+)?"
    r"(Z|[+-]\d{2}:\d{2})?$"
)


def canon_integer(lex: str) -> str:
    """'007' -> '7', '+5' -> '5', '-0' -> '0'; non-integers unchanged."""
    if not _INT_RE.match(lex):
        return lex
    return str(int(lex))


def canon_decimal(lex: str) -> str:
    """Strip leading '+', superfluous zeros; keep at least one integer
    and one fraction digit ('.5' -> '0.5', '1.50' -> '1.5', '3' -> '3.0')."""
    if not _DEC_RE.match(lex):
        return lex
    neg = lex.startswith("-")
    body = lex.lstrip("+-")
    if "." in body:
        ipart, fpart = body.split(".", 1)
    else:
        ipart, fpart = body, ""
    ipart = ipart.lstrip("0") or "0"
    fpart = fpart.rstrip("0") or "0"
    out = f"{ipart}.{fpart}"
    return f"-{out}" if neg and out != "0.0" else out


def canon_datetime(lex: str) -> str:
    """Canonical xsd:dateTime lexical form: 'T' separator, no
    sub-second zeros, 'Z' for +00:00; unparseable forms unchanged."""
    m = _DT_RE.match(lex.strip())
    if not m:
        return lex
    y, mo, d, h, mi, s, frac, tz = m.groups()
    out = f"{y}-{mo}-{d}T{h}:{mi}:{s}"
    if frac:
        frac = frac.rstrip("0")
        if len(frac) > 1:
            out += frac
    if tz and tz != "Z":
        if tz in ("+00:00", "-00:00"):
            out += "Z"
        else:
            out += tz
    elif tz == "Z":
        out += "Z"
    return out


_CANONICALIZERS = {
    XSD_INTEGER: canon_integer,
    XSD_DECIMAL: canon_decimal,
    XSD_DATETIME: canon_datetime,
}


def normalize_literals(triples_ds):
    """Canonicalize typed-literal lexical forms + lowercase language
    tags.  Only rows with a recognized datatype pay the scalar call;
    the common plain-literal case is untouched (vectorized masks)."""

    def _norm(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        df = df.copy()
        lang_mask = df["obj_lang"] != ""
        if lang_mask.any():
            df.loc[lang_mask, "obj_lang"] = (
                df.loc[lang_mask, "obj_lang"].str.lower()
            )
        for dt_uri, fn in _CANONICALIZERS.items():
            mask = df["obj_is_lit"] & (df["obj_dt"] == dt_uri)
            if mask.any():
                df.loc[mask, "obj"] = df.loc[mask, "obj"].map(fn)
        return df

    return triples_ds.map_batches(_norm, batch_format="pandas")
