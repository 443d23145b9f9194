"""Canonical forms for RDF graphs with blank nodes — deterministic
bnode labeling, isomorphism-invariant graph hashes, graph equality.

Public algorithm family: iterative color refinement with
individualization on ties, per Hogan, "Canonical Forms for Isomorphic
and Equivalent RDF Graphs" (TWEB 2017) and the URDNA2015/RDFC-1.0
canonicalization spec — reimplemented from the published method, not
from any implementation.  The reference engine gets this from librdf
model equality (`twine:libtwine/rdf.c::twine_rdf_model_parse` feeds
librdf, whose model compare handles bnode graphs); here it also powers
cross-serializer round-trip testing, since Turtle/RDF-XML/JSON-LD
parsers mint fresh bnode labels.

Semantics: two graphs (lists of triple rows in TRIPLES_SCHEMA shape)
get the same ``graph_hash`` iff they are RDF-isomorphic (equal up to
bnode relabeling).  Ground terms compare exactly, literals as the
(lex, datatype, lang) triple.

Algorithm:

1. color(b) <- hash of b's incident-edge signature using only ground
   neighbors; iterate color(b) <- H(color(b), sorted multiset of
   (dir, pred, neighbor color)) until the partition stabilizes
   (<= |B| rounds — each round can only split classes).
2. If classes remain non-singleton (automorphisms or symmetric
   structure), INDIVIDUALIZE: for each member of the first tied
   class, tentatively distinguish it, re-refine, and keep the branch
   whose canonical serialization is lexicographically smallest.
   Deterministic and exact; worst case exponential in the size of the
   largest symmetric class, so ``max_branch`` bounds it (document
   graphs have few bnodes; pathological inputs raise rather than
   silently mislabel).
3. Canonical labels ``_:c0.._:cN`` by final color rank; canonical
   N-Quads-style lines sorted; hash = sha256.

Scale shape: canonicalization is per-graph (graphs are document-sized
by the data model); over a Dataset use ``dataset_graph_hashes`` — one
bucketed exchange keyed on the graph column delivers every COMPLETE
graph to exactly one reducer, each graph canonicalized independently.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

BNODE_PREFIX = "_:"


def _is_bnode(term: str) -> bool:
    return isinstance(term, str) and term.startswith(BNODE_PREFIX)


def _h(*parts: str) -> str:
    m = hashlib.sha256()
    for p in parts:
        m.update(p.encode("utf-8", "surrogatepass"))
        m.update(b"\x00")
    return m.hexdigest()


def _ground_obj(row: dict) -> str:
    """Stable encoding of a ground object term."""
    if row.get("obj_is_lit"):
        return _h("L", str(row.get("obj", "")),
                  str(row.get("obj_dt", "") or ""),
                  str(row.get("obj_lang", "") or ""))
    return _h("I", str(row.get("obj", "")))


def _refine(edges, colors):
    """Iterate color refinement to a fixpoint; returns final colors."""
    bnodes = list(colors)
    for _ in range(max(1, len(bnodes))):
        nxt = {}
        for b in bnodes:
            sig = sorted(
                (d, p, colors.get(n, n) if bn else n)
                for d, p, n, bn in edges[b]
            )
            nxt[b] = _h(colors[b], *(f"{d}|{p}|{n}" for d, p, n in sig))
        if len(set(nxt.values())) == len(set(colors.values())) \
                and all(
                    (colors[a] == colors[b]) == (nxt[a] == nxt[b])
                    for a in bnodes for b in bnodes
                ):
            return nxt
        colors = nxt
    return colors


def _build_edges(rows):
    """Per-bnode incident edges: (direction, pred, other, other_is_b).

    Ground neighbors enter as term hashes; bnode neighbors by label
    (resolved to colors during refinement)."""
    edges: dict = defaultdict(list)
    for r in rows:
        s, p = str(r["subj"]), str(r["pred"])
        sb = _is_bnode(s)
        o = str(r.get("obj", ""))
        ob = (not r.get("obj_is_lit")) and _is_bnode(o)
        if sb:
            edges[s].append(
                ("out", p, o if ob else _ground_obj(r), ob)
            )
        if ob:
            edges[o].append(("in", p, s if sb else _h("I", s), sb))
    return edges


def _serialize(rows, labels) -> list[str]:
    """Canonical lines with bnodes renamed through ``labels``."""
    out = []
    for r in rows:
        s = str(r["subj"])
        s = labels.get(s, s)
        o = str(r.get("obj", ""))
        if not r.get("obj_is_lit") and o in labels:
            o = labels[o]
        kind = "L" if r.get("obj_is_lit") else "I"
        out.append("\t".join((
            s, str(r["pred"]), kind, o,
            str(r.get("obj_dt", "") or ""),
            str(r.get("obj_lang", "") or ""),
        )))
    return sorted(out)


def _canon_labels(rows, max_branch: int = 64) -> dict:
    """Canonical bnode label map for one graph's rows."""
    edges = _build_edges(rows)
    if not edges:
        return {}
    colors = {b: _h("init") for b in edges}
    colors = _refine(edges, colors)

    def _finish(colors):
        classes = defaultdict(list)
        for b, c in colors.items():
            classes[c].append(b)
        tied = [cls for cls in classes.values() if len(cls) > 1]
        if not tied:
            ranked = sorted(edges, key=lambda b: colors[b])
            return {b: f"{BNODE_PREFIX}c{i}"
                    for i, b in enumerate(ranked)}
        # individualize the first tied class (by color) exactly:
        # branch on each member, keep the lexicographically smallest
        # canonical serialization
        cls = classes[min(c for c, v in classes.items() if len(v) > 1)]
        if len(cls) > max_branch:
            raise ValueError(
                f"graph too symmetric to canonicalize: tied class of "
                f"{len(cls)} bnodes exceeds max_branch={max_branch}"
            )
        best = None
        for b in cls:
            branch = dict(colors)
            branch[b] = _h("pick", branch[b])
            branch = _refine(edges, branch)
            labels = _finish(branch)
            ser = _serialize(rows, labels)
            if best is None or ser < best[0]:
                best = (ser, labels)
        return best[1]

    return _finish(colors)


def canonical_rows(rows, max_branch: int = 64) -> list[dict]:
    """Rows with bnodes renamed to canonical ``_:cN`` labels."""
    labels = _canon_labels(rows, max_branch)
    out = []
    for r in rows:
        r = dict(r)
        s = str(r["subj"])
        if s in labels:
            r["subj"] = labels[s]
        o = str(r.get("obj", ""))
        if not r.get("obj_is_lit") and o in labels:
            r["obj"] = labels[o]
        out.append(r)
    return out


def graph_hash(rows, max_branch: int = 64) -> str:
    """Isomorphism-invariant hash of one graph's triple rows."""
    labels = _canon_labels(rows, max_branch)
    return _h(*_serialize(rows, labels))


def isomorphic(rows_a, rows_b, max_branch: int = 64) -> bool:
    """RDF graph isomorphism (equality up to bnode relabeling)."""
    return graph_hash(rows_a, max_branch) == \
        graph_hash(rows_b, max_branch)


def dataset_graph_hashes(triples_ds, num_buckets: int = 64):
    """(graph, graph_hash) per named graph of a TRIPLES_SCHEMA Dataset.

    One bucketed exchange keyed on ``graph`` delivers each COMPLETE
    graph to one reducer (the bucketed_group_reduce contract); each
    graph canonicalizes independently — document-sized, per the data
    model."""
    import pandas as pd

    from twine_ray.stages.grouped import bucketed_group_reduce

    def _hash_groups(df: pd.DataFrame) -> pd.DataFrame:
        out = {"graph": [], "graph_hash": []}
        for g, grp in df.groupby("graph", sort=False):
            out["graph"].append(g)
            out["graph_hash"].append(
                graph_hash(grp.to_dict("records"))
            )
        return pd.DataFrame(out)

    return bucketed_group_reduce(
        triples_ds, ["graph"], _hash_groups,
        num_buckets=num_buckets, partial=False,
    )
