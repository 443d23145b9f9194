"""JSON-LD subset (sources/jsonld.py): hand fixtures for the supported
constructs, raise-don't-drop on the unsupported ones, round-trip with
the other serializers, dispatch routing, bulk reader."""

from __future__ import annotations

import json

import pytest

from twine_ray.sources.jsonld import (
    JsonLdParseError,
    parse_jsonld,
    read_jsonld,
    triples_to_jsonld,
)
from twine_ray.sources.turtle import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD


def _keys(rows):
    return {
        (r["graph"], r["subj"], r["pred"], r["obj"], bool(r["obj_is_lit"]),
         r["obj_dt"], r["obj_lang"])
        for r in rows
    }


def test_context_prefixes_vocab_and_typed_terms():
    doc = {
        "@context": {
            "ex": "http://e.org/",
            "name": "http://e.org/name",
            "knows": {"@id": "http://e.org/knows", "@type": "@id"},
            "age": {"@id": "http://e.org/age",
                    "@type": "http://www.w3.org/2001/XMLSchema#integer"},
            "@vocab": "http://v.org/",
            "@base": "http://b.org/",
        },
        "@id": "alice",
        "@type": "ex:Person",
        "name": "Alice",
        "knows": "bob",
        "age": "30",
        "plain": "x",
    }
    rows = parse_jsonld(json.dumps(doc))
    assert _keys(rows) == {
        ("", "http://b.org/alice", RDF_TYPE, "http://e.org/Person",
         False, "", ""),
        ("", "http://b.org/alice", "http://e.org/name", "Alice",
         True, "", ""),
        ("", "http://b.org/alice", "http://e.org/knows",
         "http://b.org/bob", False, "", ""),
        ("", "http://b.org/alice", "http://e.org/age", "30", True,
         XSD + "integer", ""),
        ("", "http://b.org/alice", "http://v.org/plain", "x",
         True, "", ""),
    }


def test_value_objects_numbers_language_and_null():
    doc = {
        "@context": {"p": "http://p.org/ns#", "@language": "en"},
        "@id": "http://e.org/s",
        "p:a": [{"@value": "chat", "@language": "FR"},
                {"@value": 7}, 2.5, True, None],
        "p:b": {"@value": "raw", "@type": "p:dt"},
    }
    rows = parse_jsonld(json.dumps(doc))
    assert _keys(rows) == {
        ("", "http://e.org/s", "http://p.org/ns#a", "chat", True, "", "fr"),
        ("", "http://e.org/s", "http://p.org/ns#a", "7", True,
         XSD + "integer", ""),
        ("", "http://e.org/s", "http://p.org/ns#a", "2.5", True,
         XSD + "double", ""),
        ("", "http://e.org/s", "http://p.org/ns#a", "true", True,
         XSD + "boolean", ""),
        ("", "http://e.org/s", "http://p.org/ns#b", "raw", True,
         "http://p.org/ns#dt", ""),
    }


def test_nested_nodes_lists_and_sets():
    doc = {
        "@context": {"p": "http://p.org/ns#"},
        "@id": "http://e.org/s",
        "p:child": {"p:name": "inner"},
        "p:list": {"@list": ["a", "b"]},
        "p:set": {"@set": ["x", "y"]},
        "p:empty": {"@list": []},
    }
    rows = parse_jsonld(json.dumps(doc))
    k = _keys(rows)
    # nested bnode node carries its own property
    child = [r["obj"] for r in rows
             if r["pred"] == "http://p.org/ns#child"][0]
    assert child.startswith("_:")
    assert ("", child, "http://p.org/ns#name", "inner", True, "", "") in k
    # list chain: head --first--> 'a', --rest--> cell --first--> 'b'
    head = [r["obj"] for r in rows if r["pred"] == "http://p.org/ns#list"][0]
    firsts = {r["subj"]: r["obj"] for r in rows if r["pred"] == RDF_FIRST}
    rests = {r["subj"]: r["obj"] for r in rows if r["pred"] == RDF_REST}
    assert firsts[head] == "a" and firsts[rests[head]] == "b"
    assert rests[rests[head]] == RDF_NIL
    # empty list is rdf:nil directly
    assert ("", "http://e.org/s", "http://p.org/ns#empty", RDF_NIL,
            False, "", "") in k
    # @set flattens
    assert ("", "http://e.org/s", "http://p.org/ns#set", "x",
            True, "", "") in k


def test_named_graphs_and_top_level_forms():
    doc = [
        {"@id": "http://e.org/g1",
         "@graph": [{"@id": "http://e.org/s",
                     "http://p.org/ns#a": "v"}]},
        {"@id": "http://e.org/t", "http://p.org/ns#b": "w"},
    ]
    rows = parse_jsonld(json.dumps(doc), default_graph="http://d.org/")
    assert _keys(rows) == {
        ("http://e.org/g1", "http://e.org/s", "http://p.org/ns#a", "v",
         True, "", ""),
        ("http://d.org/", "http://e.org/t", "http://p.org/ns#b", "w",
         True, "", ""),
    }
    # bare wrapper form: @context + @graph only -> default graph
    doc2 = {"@context": {"p": "http://p.org/ns#"},
            "@graph": [{"@id": "http://e.org/u", "p:c": "z"}]}
    rows2 = parse_jsonld(json.dumps(doc2))
    assert _keys(rows2) == {
        ("", "http://e.org/u", "http://p.org/ns#c", "z", True, "", ""),
    }


def test_unsupported_constructs_raise():
    with pytest.raises(JsonLdParseError, match="unsupported keywords"):
        parse_jsonld(json.dumps(
            {"@id": "http://e.org/s",
             "@reverse": {"http://p.org/ns#a": {"@id": "http://e.org/o"}}}
        ))
    with pytest.raises(JsonLdParseError, match="remote context"):
        parse_jsonld(json.dumps(
            {"@context": "http://schema.org/", "@id": "http://e.org/s"}
        ))
    with pytest.raises(JsonLdParseError, match="not valid JSON"):
        parse_jsonld(b"{nope")
    with pytest.raises(JsonLdParseError, match="no term definition"):
        parse_jsonld(json.dumps({"@id": "http://e.org/s", "bare": "v"}))
    with pytest.raises(JsonLdParseError, match="exclusive"):
        parse_jsonld(json.dumps(
            {"@id": "http://e.org/s",
             "http://p.org/ns#a": {"@value": "x", "@type": "http://d",
                                   "@language": "en"}}
        ))


def test_serializer_roundtrip_with_named_graphs():
    rows = [
        {"graph": "", "subj": "http://e.org/s", "pred": RDF_TYPE,
         "obj": "http://e.org/T", "obj_is_lit": False, "obj_dt": "",
         "obj_lang": "", "score": 0},
        {"graph": "", "subj": "_:b1", "pred": "http://p.org/ns#a",
         "obj": "lit", "obj_is_lit": True, "obj_dt": "",
         "obj_lang": "en", "score": 0},
        {"graph": "http://e.org/g", "subj": "http://e.org/s",
         "pred": "http://p.org/ns#b", "obj": "7", "obj_is_lit": True,
         "obj_dt": XSD + "integer", "obj_lang": "", "score": 0},
    ]
    text = triples_to_jsonld(rows)
    assert _keys(parse_jsonld(text)) == _keys(rows)


def test_dispatch_routes_jsonld(ray_session):
    import pandas as pd
    import ray.data as rd

    from twine_ray.pipelines.dispatch import dispatch_messages

    payload = json.dumps(
        {"@id": "http://e.org/s", "http://p.org/ns#a": "v"}
    ).encode()
    msgs = rd.from_pandas(pd.DataFrame(
        {
            "uri": ["http://m.org/1", "http://m.org/2"],
            "content_type": ["application/ld+json"] * 2,
            "payload": [payload, b"{broken"],
        }
    ))
    triples, counts = dispatch_messages(msgs)
    out = triples.to_pandas()
    # the malformed message is skipped, the good one lands with
    # graph = message uri
    assert len(out) == 1
    assert out.iloc[0]["graph"] == "http://m.org/1"
    assert out.iloc[0]["obj"] == "v"


def test_read_jsonld_bulk(ray_session, tmp_path):
    for i in range(3):
        (tmp_path / f"doc{i}.jsonld").write_text(json.dumps(
            {"@id": f"http://e.org/s{i}", "http://p.org/ns#a": str(i)}
        ))
    ds = read_jsonld([str(tmp_path / f"doc{i}.jsonld") for i in range(3)],
                     default_graph="http://g.org/")
    df = ds.to_pandas().sort_values("subj").reset_index(drop=True)
    assert list(df["subj"]) == [f"http://e.org/s{i}" for i in range(3)]
    assert set(df["graph"]) == {"http://g.org/"}


# --- totality fuzz: parse never raises anything but JsonLdParseError ----

from hypothesis import given, settings
from hypothesis import strategies as st

_json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-10**6, 10**6),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=12),
)
_json_vals = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.one_of(
                st.sampled_from(
                    ["@id", "@type", "@value", "@language", "@graph",
                     "@context", "@list", "@set", "@vocab", "@base",
                     "p", "ex:q", "http://p.org/ns#r"]
                ),
                st.text(max_size=8),
            ),
            children, max_size=4,
        ),
    ),
    max_leaves=12,
)


@settings(max_examples=250, deadline=None)
@given(_json_vals)
def test_parse_total_over_arbitrary_json(v):
    """Any JSON value either parses to rows or raises exactly
    JsonLdParseError (the dispatch log-and-skip contract catches only
    that type)."""
    try:
        rows = parse_jsonld(json.dumps(v))
    except JsonLdParseError:
        return
    for r in rows:
        assert set(r) == {"graph", "subj", "pred", "obj", "obj_is_lit",
                          "obj_dt", "obj_lang", "score"}
        assert isinstance(r["obj"], str)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=80))
def test_parse_total_over_text(s):
    try:
        parse_jsonld(s)
    except JsonLdParseError:
        pass


def test_non_string_context_values_raise():
    """Type confusion in @context must surface as JsonLdParseError,
    not AttributeError/TypeError (fuzz-hardening regression cases)."""
    for doc in [
        {"@context": {"@language": 5}, "@id": "http://e/s",
         "http://p/a": "x"},
        {"@context": {"@vocab": 7}, "@id": "http://e/s", "plain": "y"},
        {"@context": {"@base": 3}, "@id": "rel", "http://p/a": "x"},
        {"@context": {"p": {"@id": 5}}, "@id": "http://e/s", "p:a": "x"},
        {"@list": ["a node object cannot be a list object"]},
    ]:
        with pytest.raises(JsonLdParseError):
            parse_jsonld(json.dumps(doc))
