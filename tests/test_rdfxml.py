"""RDF/XML parser (SURVEY.md §2.2 M1, the last serialization of the
reference's accepted set: ``twine:plug-ins/rdf.c`` MIME table).
Hand-computed fixtures like tests/test_turtle.py.
"""

from __future__ import annotations

import pytest

from twine_ray.sources.rdfxml import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    RdfXmlParseError,
    parse_rdfxml,
)

EX = "http://ex.org/"


def _spo(rows):
    return {(r["subj"], r["pred"], r["obj"]) for r in rows}


def test_typed_node_literals_and_resources():
    doc = b"""<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://ex.org/">
      <ex:Person rdf:about="http://e/alice" ex:nick="Al">
        <ex:name>Alice</ex:name>
        <ex:label xml:lang="en-GB">Hi</ex:label>
        <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</ex:age>
        <ex:knows rdf:resource="http://e/bob"/>
      </ex:Person>
    </rdf:RDF>"""
    rows = parse_rdfxml(doc, "http://g")
    assert all(r["graph"] == "http://g" for r in rows)
    spo = _spo(rows)
    assert ("http://e/alice", RDF_TYPE, EX + "Person") in spo
    assert ("http://e/alice", EX + "nick", "Al") in spo
    assert ("http://e/alice", EX + "name", "Alice") in spo
    assert ("http://e/alice", EX + "knows", "http://e/bob") in spo
    lab = next(r for r in rows if r["pred"] == EX + "label")
    assert lab["obj_lang"] == "en-gb" and lab["obj_is_lit"]
    age = next(r for r in rows if r["pred"] == EX + "age")
    assert age["obj_dt"].endswith("#integer") and age["obj"] == "42"
    knows = next(r for r in rows if r["pred"] == EX + "knows")
    assert not knows["obj_is_lit"]


def test_xml_base_id_and_nodeid():
    doc = b"""<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://ex.org/" xml:base="http://base.org/dir/">
      <rdf:Description rdf:about="rel"><ex:p>a</ex:p></rdf:Description>
      <rdf:Description rdf:ID="frag"><ex:p>b</ex:p></rdf:Description>
      <rdf:Description rdf:nodeID="n1"><ex:p>c</ex:p></rdf:Description>
    </rdf:RDF>"""
    subj = {r["obj"]: r["subj"] for r in parse_rdfxml(doc)}
    assert subj["a"] == "http://base.org/dir/rel"
    assert subj["b"] == "http://base.org/dir/#frag"
    assert subj["c"] == "_:n1"


def test_nested_nodes_parsetype_resource_collection():
    doc = b"""<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://ex.org/">
      <rdf:Description rdf:about="http://e/s">
        <ex:pet><ex:Dog rdf:about="http://e/rex"><ex:name>Rex</ex:name></ex:Dog></ex:pet>
        <ex:addr rdf:parseType="Resource"><ex:city>Springfield</ex:city></ex:addr>
        <ex:items rdf:parseType="Collection">
          <rdf:Description rdf:about="http://e/i1"/>
          <rdf:Description rdf:about="http://e/i2"/>
        </ex:items>
      </rdf:Description>
    </rdf:RDF>"""
    rows = parse_rdfxml(doc)
    spo = _spo(rows)
    assert ("http://e/s", EX + "pet", "http://e/rex") in spo
    assert ("http://e/rex", RDF_TYPE, EX + "Dog") in spo
    addr = next(o for s, p, o in spo if p == EX + "addr")
    assert (addr, EX + "city", "Springfield") in spo
    head = next(o for s, p, o in spo if p == EX + "items")
    assert (head, RDF_FIRST, "http://e/i1") in spo
    tail = next(o for s, p, o in spo if s == head and p == RDF_REST)
    assert (tail, RDF_FIRST, "http://e/i2") in spo
    assert (tail, RDF_REST, RDF_NIL) in spo


@pytest.mark.parametrize(
    "bad",
    [
        b"<broken",
        b'<x xmlns:r="u:"><noNS/></x>',
        b"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://ex.org/">
             <rdf:Description rdf:about="a" rdf:nodeID="b"/></rdf:RDF>""",
    ],
)
def test_malformed_raises(bad):
    with pytest.raises(RdfXmlParseError):
        parse_rdfxml(bad)


def test_dispatch_rdfxml(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.pipelines.dispatch import (
        MESSAGES_SCHEMA,
        dispatch_messages,
    )

    msgs = [
        {
            "uri": "http://m/1",
            "content_type": "application/rdf+xml",
            "payload": b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/'
                       b'22-rdf-syntax-ns#" xmlns:ex="http://ex.org/">'
                       b'<rdf:Description rdf:about="http://e/s">'
                       b"<ex:p>val</ex:p></rdf:Description></rdf:RDF>",
        },
        {
            "uri": "http://m/bad",
            "content_type": "application/rdf+xml",
            "payload": b"<not-xml",
        },
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(msgs, schema=MESSAGES_SCHEMA))
    triples, counts = dispatch_messages(ds, {})
    df = triples.to_pandas()
    assert counts["application/rdf+xml"] == 1
    assert list(df["obj"]) == ["val"]
    assert list(df["graph"]) == ["http://m/1"]


def test_parsetype_literal():
    doc = (b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/'
           b'22-rdf-syntax-ns#" xmlns:ex="http://ex.org/">'
           b'<rdf:Description rdf:about="http://e/s">'
           b'<ex:html rdf:parseType="Literal">pre <b>bold</b> post'
           b"</ex:html></rdf:Description></rdf:RDF>")
    r = parse_rdfxml(doc)[0]
    assert r["obj"] == "pre <b>bold</b> post"
    assert r["obj_dt"].endswith("#XMLLiteral") and r["obj_is_lit"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=200))
def test_rdfxml_total_no_foreign_exceptions(s):
    """Fuzz: arbitrary input raises RdfXmlParseError or parses."""
    try:
        parse_rdfxml(s)
    except RdfXmlParseError:
        pass


def test_rdf_type_property_attribute():
    """An rdf:type property ATTRIBUTE takes a resource value and must
    emit a type triple (previously silently dropped — ADVICE r2)."""
    doc = (b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/'
           b'22-rdf-syntax-ns#" xmlns:ex="http://ex.org/">'
           b'<rdf:Description rdf:about="http://e/s"'
           b' rdf:type="http://ex.org/Thing" ex:name="n"/></rdf:RDF>')
    rows = parse_rdfxml(doc)
    types = [r for r in rows if r["pred"].endswith("#type")]
    assert len(types) == 1
    assert types[0]["obj"] == "http://ex.org/Thing"
    assert not types[0]["obj_is_lit"]
    # other rdf-namespace property attributes now raise, not skip
    import pytest

    bad = (b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/'
           b'22-rdf-syntax-ns#">'
           b'<rdf:Description rdf:about="http://e/s" rdf:value="v"/>'
           b'</rdf:RDF>')
    with pytest.raises(RdfXmlParseError):
        parse_rdfxml(bad)


def test_rdf_li_containers():
    """rdf:li numbers itself rdf:_1.. per node element (Seq/Bag/Alt)."""
    doc = (b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/'
           b'22-rdf-syntax-ns#">'
           b'<rdf:Seq rdf:about="http://e/s">'
           b'<rdf:li>one</rdf:li><rdf:li>two</rdf:li>'
           b'<rdf:li rdf:resource="http://e/three"/>'
           b'</rdf:Seq></rdf:RDF>')
    rows = parse_rdfxml(doc)
    preds = [r["pred"] for r in rows if not r["pred"].endswith("#type")]
    assert preds == [
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#_1",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#_2",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#_3",
    ]
    assert rows[0]["obj"].endswith("Seq")  # typed node
    objs = [r["obj"] for r in rows if not r["pred"].endswith("#type")]
    assert objs == ["one", "two", "http://e/three"]


def test_property_reification_sugar():
    """rdf:ID on a property element emits the base triple + the four
    rdf:Statement triples about <base>#id."""
    doc = (b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/'
           b'22-rdf-syntax-ns#" xmlns:ex="http://ex.org/" '
           b'xml:base="http://b.example/doc">'
           b'<rdf:Description rdf:about="http://e/s">'
           b'<ex:p rdf:ID="st1">hello</ex:p>'
           b'</rdf:Description></rdf:RDF>')
    rows = parse_rdfxml(doc)
    base = [r for r in rows if r["subj"] == "http://e/s"]
    assert len(base) == 1 and base[0]["obj"] == "hello"
    st = "http://b.example/doc#st1"
    reif = {r["pred"].rsplit("#", 1)[1]: r for r in rows
            if r["subj"] == st}
    assert set(reif) == {"type", "subject", "predicate", "object"}
    assert reif["type"]["obj"].endswith("#Statement")
    assert reif["subject"]["obj"] == "http://e/s"
    assert reif["predicate"]["obj"] == "http://ex.org/p"
    assert reif["object"]["obj"] == "hello" and reif["object"]["obj_is_lit"]
