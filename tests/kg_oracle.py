"""Test-side oracle: expected triples computed from generator ground
truth + a naive DSU — independent of every Ray stage (FIXTURES.md T4).
"""

from __future__ import annotations

from twine_ray.functions.ids import canon_uuid
from twine_ray.sources.world import PageTruth
from twine_ray.state.rulebase import (
    DC_LANGUAGE,
    DC_MODIFIED,
    DC_TITLE,
    OWL_SAMEAS,
    REL_ASSOCIATED,
    SCHEMA_MENTIONS,
    XSD_DATETIME,
    canon_uri,
)

Triple = tuple  # (graph, subj, pred, obj, obj_is_lit, obj_dt, obj_lang)


def naive_dsu(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {n: find(n) for n in parent}


def expected_triples(truths: list[PageTruth]) -> set[Triple]:
    """The golden output set for a generated corpus."""
    # graph-replace semantics: latest warc_ts wins per url
    by_url: dict[str, PageTruth] = {}
    for t in truths:
        cur = by_url.get(t.url)
        if cur is None or t.warc_ts > cur.warc_ts:
            by_url[t.url] = t
    kept = list(by_url.values())

    edges = [p for t in kept for p in t.sameas_pairs]
    roots = naive_dsu(edges)
    cmap = {n: canon_uri(canon_uuid(r)) for n, r in roots.items()}

    def canon(k: str) -> str:
        return cmap.get(k, k)

    out: set[Triple] = set()
    for t in kept:
        g = t.url
        if t.title:
            out.add((g, g, DC_TITLE, t.title, True, "", t.lang or ""))
        if t.lang:
            out.add((g, g, DC_LANGUAGE, t.lang, True, "", ""))
        out.add((g, g, DC_MODIFIED, t.warc_ts.isoformat(), True,
                 XSD_DATETIME, ""))
        for k in t.mention_keys:
            out.add((g, g, SCHEMA_MENTIONS, canon(k), False, "", ""))
        for a, b in t.assoc_pairs:
            if a != b:
                out.add((g, canon(a), REL_ASSOCIATED, canon(b), False, "", ""))

    # membership triples for classes with >= 2 members
    classes: dict[str, list[str]] = {}
    for n, r in roots.items():
        classes.setdefault(r, []).append(n)
    for r, members in classes.items():
        if len(members) < 2:
            continue
        cu = canon_uri(canon_uuid(r))
        for m in members:
            out.add((cu, cu, OWL_SAMEAS, m, False, "", ""))
    return out


def triples_df_to_set(df) -> set[Triple]:
    cols = ["graph", "subj", "pred", "obj", "obj_is_lit", "obj_dt", "obj_lang"]
    return {tuple(row) for row in df[cols].itertuples(index=False, name=None)}


def precision_recall(got: set, want: set) -> tuple[float, float]:
    if not got and not want:
        return 1.0, 1.0
    inter = len(got & want)
    p = inter / len(got) if got else 0.0
    r = inter / len(want) if want else 0.0
    return p, r
