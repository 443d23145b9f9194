"""RDF graph canonicalization (functions/graphhash.py): hashes are
invariant under bnode relabeling (isomorphism), distinguish
non-isomorphic graphs, survive cross-serializer round-trips that mint
fresh bnode labels, and the Dataset-level reducer equals the local
function."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from twine_ray.functions.graphhash import (
    canonical_rows,
    dataset_graph_hashes,
    graph_hash,
    isomorphic,
)


def _t(s, p, o, lit=False, dt="", lang="", g="g"):
    return {"graph": g, "subj": s, "pred": p, "obj": o,
            "obj_is_lit": lit, "obj_dt": dt, "obj_lang": lang,
            "score": 0}


def _relabel(rows, mapping):
    out = []
    for r in rows:
        r = dict(r)
        r["subj"] = mapping.get(r["subj"], r["subj"])
        if not r["obj_is_lit"]:
            r["obj"] = mapping.get(r["obj"], r["obj"])
        out.append(r)
    return out


@st.composite
def _bnode_graphs(draw):
    n_b = draw(st.integers(1, 5))
    bnodes = [f"_:b{i}" for i in range(n_b)]
    grounds = ["http://e/1", "http://e/2"]
    preds = ["p", "q"]
    n_e = draw(st.integers(1, 8))
    rows = []
    for _ in range(n_e):
        s = draw(st.sampled_from(bnodes + grounds))
        p = draw(st.sampled_from(preds))
        if draw(st.booleans()):
            rows.append(_t(s, p, draw(st.sampled_from(["v1", "v2"])),
                           lit=True))
        else:
            rows.append(_t(s, p, draw(st.sampled_from(
                bnodes + grounds
            ))))
    return rows, bnodes


@settings(max_examples=60, deadline=None)
@given(_bnode_graphs(), st.randoms(use_true_random=False))
def test_hash_invariant_under_relabeling(gb, rnd):
    rows, bnodes = gb
    perm = list(bnodes)
    rnd.shuffle(perm)
    mapping = {b: f"_:z{perm.index(b)}" for b in bnodes}
    shuffled = _relabel(rows, mapping)
    rnd.shuffle(shuffled)
    assert graph_hash(rows) == graph_hash(shuffled)


def test_non_isomorphic_graphs_differ():
    a = [_t("_:x", "p", "_:y"), _t("_:y", "p", "http://e/1")]
    b = [_t("_:x", "p", "_:y"), _t("_:y", "q", "http://e/1")]
    c = [_t("_:x", "p", "_:y"), _t("_:x", "p", "http://e/1")]
    assert not isomorphic(a, b)
    assert not isomorphic(a, c)
    assert not isomorphic(b, c)


def test_literal_vs_iri_object_distinguished():
    a = [_t("_:x", "p", "v", lit=True)]
    b = [_t("_:x", "p", "v", lit=False)]
    c = [_t("_:x", "p", "v", lit=True, lang="en")]
    assert graph_hash(a) != graph_hash(b)
    assert graph_hash(a) != graph_hash(c)


def test_automorphic_cycles_canonicalize():
    """Fully symmetric structures need the individualization branch."""
    c3a = [_t("_:a", "p", "_:b"), _t("_:b", "p", "_:c"),
           _t("_:c", "p", "_:a")]
    c3b = [_t("_:z", "p", "_:x"), _t("_:x", "p", "_:y"),
           _t("_:y", "p", "_:z")]
    c4 = [_t("_:a", "p", "_:b"), _t("_:b", "p", "_:c"),
          _t("_:c", "p", "_:d"), _t("_:d", "p", "_:a")]
    assert isomorphic(c3a, c3b)
    assert not isomorphic(c3a, c4)
    labels = {r["subj"] for r in canonical_rows(c3a)}
    assert labels == {"_:c0", "_:c1", "_:c2"}


def test_symmetry_bound_raises():
    rows = [_t(f"_:b{i}", "p", "x", lit=True) for i in range(5)]
    with pytest.raises(ValueError, match="too symmetric"):
        graph_hash(rows, max_branch=3)
    # same graph canonicalizes fine within the bound
    assert graph_hash(rows, max_branch=5)


def test_cross_serializer_roundtrip_same_hash():
    """Turtle -> N-Quads -> parse mints fresh bnode labels; the
    canonical hash bridges them."""
    from twine_ray.sources.nquads import parse_nquads_text
    from twine_ray.sources.turtle import parse_turtle

    ttl = """
    @prefix ex: <http://e/> .
    ex:s ex:p [ ex:q "v" ; ex:r [ ex:q "w" ] ] .
    _:top ex:p ex:s .
    """
    rows1 = parse_turtle(ttl, default_graph="g")
    # round-trip through N-Quads with RENAMED bnodes
    ren = {}

    def _nq_term(t, r=None, obj=False):
        if t.startswith("_:"):
            ren.setdefault(t, f"_:fresh{len(ren)}")
            return ren[t]
        return t

    lines = []
    for r in rows1:
        s = _nq_term(r["subj"])
        s_out = s if s.startswith("_:") else f"<{s}>"
        if r["obj_is_lit"]:
            o_out = '"' + r["obj"].replace("\\", "\\\\") \
                .replace('"', '\\"') + '"'
            if r["obj_lang"]:
                o_out += f"@{r['obj_lang']}"
            elif r["obj_dt"]:
                o_out += f"^^<{r['obj_dt']}>"
        else:
            o = _nq_term(r["obj"])
            o_out = o if o.startswith("_:") else f"<{o}>"
        lines.append(f"{s_out} <{r['pred']}> {o_out} <g> .")
    rows2 = parse_nquads_text("\n".join(lines))
    random.Random(3).shuffle(rows2)
    assert graph_hash(rows1) == graph_hash(rows2)


def test_dataset_graph_hashes_equal_local(ray_session):
    import pandas as pd
    import ray.data as rd

    rows = []
    for g in ("g1", "g2", "g3"):
        rows += [
            _t("_:a", "p", "_:b", g=g),
            _t("_:b", "p", "http://shared/x", g=g),
            _t("http://shared", "q", "lit", lit=True, g=g),
        ]
    # g3 gets an extra edge so one hash differs
    rows.append(_t("_:b", "r", "_:a", g="g3"))
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(4)
    got = dataset_graph_hashes(ds).to_pandas() \
        .sort_values("graph").reset_index(drop=True)
    want = {
        g: graph_hash(df[df["graph"] == g].to_dict("records"))
        for g in ("g1", "g2", "g3")
    }
    assert dict(zip(got["graph"], got["graph_hash"])) == want
    assert want["g1"] == want["g2"] != want["g3"]
