"""Turtle/TriG parser (SURVEY.md §2.2 M1 — the round-1 gap).

Reference behavior: ``twine:plug-ins/rdf.c`` feeds text/turtle through
``twine_rdf_model_parse``; fixtures here are hand-computed triples for
documents exercising the grammar subset.
"""

from __future__ import annotations

import pytest

from twine_ray.sources.turtle import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD,
    TurtleParseError,
    parse_turtle,
)


def _spo(rows):
    return {(r["subj"], r["pred"], r["obj"]) for r in rows}


def test_prefixes_a_and_lists():
    doc = """
    @prefix ex: <http://ex.org/> .
    ex:alice a ex:Person ;
        ex:name "Alice" ;
        ex:knows ex:bob, ex:carol .
    """
    rows = parse_turtle(doc, "http://g")
    assert _spo(rows) == {
        ("http://ex.org/alice", RDF_TYPE, "http://ex.org/Person"),
        ("http://ex.org/alice", "http://ex.org/name", "Alice"),
        ("http://ex.org/alice", "http://ex.org/knows", "http://ex.org/bob"),
        ("http://ex.org/alice", "http://ex.org/knows", "http://ex.org/carol"),
    }
    assert all(r["graph"] == "http://g" for r in rows)
    name = next(r for r in rows if r["pred"].endswith("name"))
    assert name["obj_is_lit"] and name["obj_dt"] == "" and name["obj_lang"] == ""


def test_literals_typed_lang_numeric_boolean():
    doc = """
    @prefix ex: <http://ex.org/> .
    ex:s ex:label "hi"@en-GB ;
         ex:note "n"^^ex:Note ;
         ex:age 42 ;
         ex:height 1.75 ;
         ex:score 1.0e3 ;
         ex:neg -7 ;
         ex:frac .5 ;
         ex:ok true .
    """
    by_pred = {r["pred"].rsplit("/", 1)[1]: r for r in parse_turtle(doc)}
    assert by_pred["label"]["obj_lang"] == "en-gb"
    assert by_pred["note"]["obj_dt"] == "http://ex.org/Note"
    assert by_pred["age"]["obj_dt"] == XSD + "integer"
    assert by_pred["height"]["obj_dt"] == XSD + "decimal"
    assert by_pred["score"]["obj_dt"] == XSD + "double"
    assert by_pred["neg"]["obj"] == "-7"
    assert by_pred["frac"]["obj"] == ".5"
    assert by_pred["ok"]["obj_dt"] == XSD + "boolean"


def test_base_resolution_and_sparql_directives():
    doc = """
    PREFIX ex: <http://ex.org/>
    BASE <http://base.org/dir/>
    ex:s ex:rel <child>, </abs>, <http://full.org/x> .
    """
    objs = {r["obj"] for r in parse_turtle(doc)}
    assert objs == {
        "http://base.org/dir/child",
        "http://base.org/abs",
        "http://full.org/x",
    }


def test_escapes_and_long_strings():
    doc = r'''
    @prefix ex: <http://ex.org/> .
    ex:s ex:p "tab\there é" ;
         ex:q """multi
line "quoted" body""" .
    '''
    by_pred = {r["pred"][-1]: r["obj"] for r in parse_turtle(doc)}
    assert by_pred["p"] == "tab\there é"
    assert by_pred["q"] == 'multi\nline "quoted" body'


def test_bnode_property_lists_and_collections():
    doc = """
    @prefix ex: <http://ex.org/> .
    [ ex:p1 "v1" ; ex:p2 [ ex:q "nested" ] ] ex:tag "outer" .
    ex:list ex:items ( 1 "two" ) .
    ex:empty ex:items () .
    """
    rows = parse_turtle(doc)
    spo = _spo(rows)
    outer = next(s for s, p, o in spo if o == "outer")
    nested = next(o for s, p, o in spo if p.endswith("p2") and s == outer)
    assert (outer, "http://ex.org/p1", "v1") in spo
    assert (nested, "http://ex.org/q", "nested") in spo
    head = next(o for s, p, o in spo if s == "http://ex.org/list")
    assert (head, RDF_FIRST, "1") in spo
    tail = next(o for s, p, o in spo if s == head and p == RDF_REST)
    assert (tail, RDF_FIRST, "two") in spo
    assert (tail, RDF_REST, RDF_NIL) in spo
    assert ("http://ex.org/empty", "http://ex.org/items", RDF_NIL) in spo


def test_trig_graph_blocks():
    doc = """
    @prefix ex: <http://ex.org/> .
    ex:g1 { ex:s ex:p "in-g1" . ex:s2 ex:p 5 }
    GRAPH <http://g2> { ex:s ex:p "in-g2" }
    { ex:s ex:p "default" . }
    """
    rows = parse_turtle(doc, "http://dg")
    graphs = {r["obj"]: r["graph"] for r in rows}
    assert graphs["in-g1"] == "http://ex.org/g1"
    assert graphs["5"] == "http://ex.org/g1"
    assert graphs["in-g2"] == "http://g2"
    assert graphs["default"] == "http://dg"


def test_number_then_statement_dot():
    rows = parse_turtle("<s> <p> 1.\n<s> <q> 2 .")
    assert {r["obj"] for r in rows} == {"1", "2"}


@pytest.mark.parametrize(
    "bad",
    [
        "ex:x ex:y ex:z .",         # undefined prefix
        "<a> <b> .",                 # missing object
        "<a> <b> 'unterminated",     # lexer error
        "<a> <b> <c>",               # missing final dot
        "@prefix ex <http://x> .",   # malformed prefix decl
    ],
)
def test_malformed_raises(bad):
    with pytest.raises(TurtleParseError):
        parse_turtle(bad)


def test_read_turtle_dataset(ray_session, tmp_path):
    (tmp_path / "a.ttl").write_text(
        "@prefix ex: <http://ex.org/> .\n"
        'ex:s1 ex:p "one" .\n'
    )
    (tmp_path / "b.ttl").write_text(
        "@prefix ex: <http://other.org/> .\n"
        'ex:s2 ex:p "two"@fr .\n'
    )
    from twine_ray.sources.turtle import read_turtle

    df = read_turtle(
        [str(tmp_path / "a.ttl"), str(tmp_path / "b.ttl")],
        default_graph="http://bulk",
    ).to_pandas()
    assert set(df["obj"]) == {"one", "two"}
    assert set(df["graph"]) == {"http://bulk"}
    assert df.loc[df["obj"] == "two", "obj_lang"].iloc[0] == "fr"
    # prefix scoping is per document: s2 expands with b.ttl's prefix
    assert "http://other.org/s2" in set(df["subj"])


def test_nquads_roundtrip_through_turtle_parser():
    """A serialized triple row reparses identically (N-Triples is a
    subset of Turtle)."""
    from twine_ray.sources.nquads import triple_row_to_nquad

    row = {
        "graph": "", "subj": "http://s", "pred": "http://p",
        "obj": 'line1\nline2 "q"', "obj_is_lit": True,
        "obj_dt": "", "obj_lang": "", "score": 0,
    }
    line = triple_row_to_nquad(row)
    back = parse_turtle(line, "g")[0]
    assert back["subj"] == row["subj"] and back["obj"] == row["obj"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_parser_total_no_foreign_exceptions(s):
    """Fuzz: arbitrary text either parses or raises TurtleParseError —
    never IndexError/KeyError/RecursionError etc. (the log-and-skip
    dispatch contract catches exactly TurtleParseError)."""
    try:
        parse_turtle(s)
    except TurtleParseError:
        pass


_IRI_ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"


def _iri(prefix):
    return st.text(_IRI_ALPHA, min_size=1, max_size=8).map(
        lambda s: f"http://{prefix}/{s}"
    )


_row_strategy = st.fixed_dictionaries({
    "graph": st.one_of(st.just(""), _iri("g")),
    "subj": st.one_of(_iri("s"), st.text(
        "abcdefgh", min_size=1, max_size=6).map(lambda s: f"_:b{s}")),
    "pred": _iri("p"),
    "obj": st.text(max_size=40),
    "obj_is_lit": st.just(True),
    "obj_dt": st.one_of(st.just(""), _iri("dt")),
    "obj_lang": st.just(""),
    "score": st.just(0),
}) | st.fixed_dictionaries({
    "graph": st.one_of(st.just(""), _iri("g")),
    "subj": _iri("s"),
    "pred": _iri("p"),
    "obj": _iri("o"),
    "obj_is_lit": st.just(False),
    "obj_dt": st.just(""),
    "obj_lang": st.just(""),
    "score": st.just(0),
})


def _key(r):
    return (r.get("graph") or "", r["subj"], r["pred"], r["obj"],
            r["obj_is_lit"], r["obj_dt"], r["obj_lang"])


@settings(max_examples=100, deadline=None)
@given(st.lists(_row_strategy, min_size=0, max_size=12))
def test_turtle_serializer_roundtrip(rows):
    """serialize -> parse recovers the exact triple multiset (TriG mode
    so graph context survives)."""
    from twine_ray.sources.turtle import triples_to_turtle

    # dedup: serialization of identical rows collapses on parse order
    uniq = list({_key(r): r for r in rows}.values())
    text = triples_to_turtle(uniq, trig=True)
    back = parse_turtle(text, "")
    assert sorted(map(_key, back)) == sorted(map(_key, uniq))


def test_turtle_serializer_lang_and_groups():
    from twine_ray.sources.turtle import triples_to_turtle

    rows = [
        {"graph": "", "subj": "http://s", "pred": "http://p",
         "obj": 'he said "hi"\n', "obj_is_lit": True, "obj_dt": "",
         "obj_lang": "EN-GB", "score": 0},
        {"graph": "", "subj": "http://s", "pred": "http://q",
         "obj": "http://o", "obj_is_lit": False, "obj_dt": "",
         "obj_lang": "", "score": 0},
    ]
    text = triples_to_turtle(rows)
    assert text.count("<http://s>") == 1  # ';'-grouped subject block
    back = parse_turtle(text, "")
    lit = next(r for r in back if r["obj_is_lit"])
    assert lit["obj"] == 'he said "hi"\n' and lit["obj_lang"] == "en-gb"


def test_write_nquads_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.sources.nquads import read_nquads, write_nquads
    from twine_ray.stages.triples import TRIPLES_SCHEMA

    rows = [
        {"graph": "http://g", "subj": "http://s", "pred": "http://p",
         "obj": "v1\t\"x\"", "obj_is_lit": True, "obj_dt": "",
         "obj_lang": "fr", "score": 0},
        {"graph": "http://g2", "subj": "http://s2", "pred": "http://p",
         "obj": "http://o", "obj_is_lit": False, "obj_dt": "",
         "obj_lang": "", "score": 0},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA))
    out = str(tmp_path / "nq")
    res = write_nquads(ds, out)
    assert res["rows"] == 2 and res["files"] >= 1
    import glob

    back = read_nquads(sorted(glob.glob(f"{out}/part-*.nq"))).to_pandas()
    got = sorted(map(_key, back.to_dict("records")))
    assert got == sorted(map(_key, rows))


def test_standalone_bnode_property_list_statement():
    """W3C grammar: `[ :p :o ] .` is a complete statement — the
    predicateObjectList after a blankNodePropertyList subject is
    optional (ADVICE r2)."""
    rows = parse_turtle('@prefix : <http://e/> . [ :p :o ] .')
    assert len(rows) == 1
    assert rows[0]["pred"] == "http://e/p" and rows[0]["obj"] == "http://e/o"
    assert rows[0]["subj"].startswith("_:")
    # inside a TriG block too (dot optional before })
    rows = parse_turtle('@prefix : <http://e/> . <http://g> { [ :p :o ] }')
    assert len(rows) == 1 and rows[0]["graph"] == "http://g"
    # ... but a bare bnode LABEL subject still requires predicates
    import pytest

    with pytest.raises(TurtleParseError):
        parse_turtle('_:b .')


def test_double_with_empty_fraction():
    """`1.e0` is a valid Turtle DOUBLE (empty fraction before the
    exponent) — must lex as one number, not `1` `.` `e0` (ADVICE r2)."""
    rows = parse_turtle('<http://s> <http://p> 1.e0 .')
    assert rows[0]["obj"] == "1.e0"
    assert rows[0]["obj_dt"].endswith("#double")
    rows = parse_turtle('<http://s> <http://p> -2.5E-3 .')
    assert rows[0]["obj_dt"].endswith("#double")
    # `1.` still lexes as integer 1 followed by the statement dot
    rows = parse_turtle('<http://s> <http://p> 1. ')
    assert rows[0]["obj"] == "1" and rows[0]["obj_dt"].endswith("#integer")


def test_iriref_uchar_escapes():
    """IRIREF may contain \\uXXXX / \\UXXXXXXXX escapes (UCHAR) —
    previously failed to lex at all (ADVICE r2)."""
    rows = parse_turtle('<http://s/\\u00e9> <http://p> <http://o/\\U0001F600> .')
    assert rows[0]["subj"] == "http://s/é"
    assert rows[0]["obj"] == "http://o/\U0001F600"
