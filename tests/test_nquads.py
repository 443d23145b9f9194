"""M1/S8: N-Triples/N-Quads parser — unit + round-trip property tests."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from twine_ray.sources.nquads import (
    parse_nquads_line,
    parse_nquads_text,
    triple_row_to_nquad,
)


def test_simple_triple():
    r = parse_nquads_line(
        "<http://a> <http://p> <http://b> .", default_graph="g"
    )
    assert r == {
        "graph": "g", "subj": "http://a", "pred": "http://p",
        "obj": "http://b", "obj_is_lit": False, "obj_dt": "",
        "obj_lang": "", "score": 0,
    }


def test_quad_graph():
    r = parse_nquads_line("<http://a> <http://p> <http://b> <http://g> .")
    assert r["graph"] == "http://g"


def test_plain_literal():
    r = parse_nquads_line('<http://a> <http://p> "hello world" .')
    assert r["obj"] == "hello world"
    assert r["obj_is_lit"] is True and r["obj_dt"] == "" and r["obj_lang"] == ""


def test_lang_literal():
    r = parse_nquads_line('<http://a> <http://p> "bonjour"@fr .')
    assert r["obj_lang"] == "fr"


def test_typed_literal():
    r = parse_nquads_line(
        '<http://a> <http://p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .'
    )
    assert r["obj"] == "42"
    assert r["obj_dt"].endswith("#int")


def test_escapes():
    r = parse_nquads_line(
        '<http://a> <http://p> "line1\\nline2 \\"q\\" \\u00e9" .'
    )
    assert r["obj"] == 'line1\nline2 "q" \xe9'


def test_bnodes():
    r = parse_nquads_line("_:b1 <http://p> _:b2 .")
    assert r["subj"] == "_:b1" and r["obj"] == "_:b2"


def test_comments_blank_malformed_skipped():
    text = """
# a comment
<http://a> <http://p> <http://b> .

this is not a triple
<http://a> <http://p> "ok" .
"""
    rows = parse_nquads_text(text, default_graph="g")
    assert len(rows) == 2


_SAFE_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(["http://ex.org/s", "_:bn1"]),
    _SAFE_TEXT,
    # parser canonicalizes language tags to lowercase (RFC 5646 tags are
    # case-insensitive) — round-trip holds for canonical-form rows
    st.sampled_from(["", "en", "de-at"]),
    st.sampled_from(["", "http://www.w3.org/2001/XMLSchema#string"]),
)
def test_literal_round_trip(subj, lit, lang, dt):
    if lang and dt:
        dt = ""  # lang and dt are mutually exclusive in N-Quads
    row = {
        "graph": "http://g", "subj": subj, "pred": "http://p",
        "obj": lit, "obj_is_lit": True, "obj_dt": dt,
        "obj_lang": lang, "score": 0,
    }
    line = triple_row_to_nquad(row)
    back = parse_nquads_line(line)
    assert back is not None, line
    for k in ("graph", "subj", "pred", "obj", "obj_is_lit", "obj_dt",
              "obj_lang"):
        assert back[k] == row[k], (k, line)


def test_uri_round_trip():
    row = {
        "graph": "http://g", "subj": "http://s", "pred": "http://p",
        "obj": "http://o", "obj_is_lit": False, "obj_dt": "",
        "obj_lang": "", "score": 0,
    }
    assert parse_nquads_line(triple_row_to_nquad(row)) == row


def test_read_nquads_dataset(ray_session, tmp_path):
    p = tmp_path / "dump.nq"
    p.write_text(
        '<http://a> <http://p> "x" <http://g1> .\n'
        "<http://b> <http://p> <http://c> <http://g2> .\n"
        "# comment\n"
    )
    from twine_ray.sources.nquads import read_nquads

    df = read_nquads(str(p)).to_pandas()
    assert len(df) == 2
    assert set(df["graph"]) == {"http://g1", "http://g2"}


def test_read_url_doc_dump(ray_session, tmp_path):
    p = tmp_path / "dump.txt"
    p.write_text(
        "http://ex.org/1\n<doc one/>\nhttp://ex.org/2\n<doc two/>\n"
    )
    from twine_ray.sources.nquads import read_url_doc_dump

    df = read_url_doc_dump(str(p)).to_pandas()
    assert list(df["url"]) == ["http://ex.org/1", "http://ex.org/2"]
    assert list(df["doc"]) == ["<doc one/>", "<doc two/>"]


def test_write_nquads_identical_blocks_no_collision(ray_session, tmp_path):
    """Two DISTINCT blocks with byte-identical payload must produce two
    shard files (content-only naming silently lost rows — ADVICE r2);
    the driver-committed _MANIFEST.json lists exactly the live shards."""
    import glob
    import json

    import pyarrow as pa
    import ray.data as rd

    from twine_ray.sources.nquads import read_nquads, write_nquads
    from twine_ray.stages.triples import TRIPLES_SCHEMA

    row = {"graph": "http://g", "subj": "http://s", "pred": "http://p",
           "obj": "http://o", "obj_is_lit": False, "obj_dt": "",
           "obj_lang": "", "score": 0}
    ds = rd.from_arrow(
        pa.Table.from_pylist([row] * 4, schema=TRIPLES_SCHEMA)
    ).repartition(2)
    out = str(tmp_path / "nq")
    res = write_nquads(ds, out)
    assert res["rows"] == 4
    files = sorted(glob.glob(f"{out}/part-*.nq"))
    assert len(files) == res["files"] >= 2
    back = read_nquads(files).to_pandas()
    assert len(back) == 4
    man = json.load(open(res["manifest"]))
    assert man["rows"] == 4
    assert sorted(man["files"]) == [f.split("/")[-1] for f in files]


def test_geonames_dispatch(ray_session):
    """text/x-geonames-dump routes through dispatch: url/doc record
    pairs, graph = <url>/about.rdf, RDF/XML docs with N-Triples
    fallback, malformed records skipped."""
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.pipelines.dispatch import (
        MESSAGES_SCHEMA,
        dispatch_messages,
    )

    rdfxml_doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/'
        '22-rdf-syntax-ns#" xmlns:gn="http://www.geonames.org/ontology#">'
        '<rdf:Description rdf:about="http://sws.geonames.org/1/">'
        '<gn:name>Earth</gn:name></rdf:Description></rdf:RDF>'
    )
    nt_doc = ('<http://sws.geonames.org/2/> '
              '<http://www.geonames.org/ontology#name> "Mars" .')
    dump = (
        "http://sws.geonames.org/1/\n" + rdfxml_doc + "\n"
        "http://sws.geonames.org/2/\n" + nt_doc + "\n"
        "http://sws.geonames.org/3/\n" + "<<not rdf at all\n"
    ).encode()
    msgs = rd.from_arrow(
        pa.Table.from_pylist(
            [{"uri": "http://dump/1", "content_type":
              "text/x-geonames-dump", "payload": dump}],
            schema=MESSAGES_SCHEMA,
        )
    )
    triples, counts = dispatch_messages(msgs, {})
    df = triples.to_pandas()
    assert counts["text/x-geonames-dump"] == 1
    assert set(df["graph"]) == {
        "http://sws.geonames.org/1/about.rdf",
        "http://sws.geonames.org/2/about.rdf",
    }
    assert set(df["obj"]) == {"Earth", "Mars"}
