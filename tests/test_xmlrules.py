"""Declarative per-MIME XML extraction rules (pipelines/xmlrules.py —
the twine:plug-ins/xslt.c config analog, VERDICT r2 'missing' #1).

The acceptance bar: register a NEW XML type end-to-end (TOML config ->
dispatch -> triples) WITHOUT writing a new Python stage.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from twine_ray.pipelines.dispatch import MESSAGES_SCHEMA, PROCESSORS
from twine_ray.pipelines.xmlrules import (
    XmlRulesError,
    compile_rules,
    extract_xml_triples,
    register_xml_type,
    rules_from_toml,
)

RSS_TOML = """
[subject]
path = "channel/link"

[[fields]]
path = "channel/title"
pred = "http://purl.org/dc/terms/title"
lang_attr = "{http://www.w3.org/XML/1998/namespace}lang"
lang = "en"

[[fields]]
path = ".//item/link"
pred = "http://schema.org/mentions"
kind = "resource"

[[fields]]
path = ".//item"
object = "attr"
attr = "id"
pred = "http://purl.org/dc/terms/identifier"
"""

RSS_DOC = b"""<rss xml:lang="fr">
  <channel>
    <title xml:lang="de">Feed Title</title>
    <link>http://feed.example/home</link>
    <item id="a1"><link>http://feed.example/1</link></item>
    <item id="a2"><link>http://feed.example/2</link></item>
    <item><link></link></item>
  </channel>
</rss>"""


def test_extract_xml_triples_scalar():
    rules = rules_from_toml(RSS_TOML)
    rows = extract_xml_triples(RSS_DOC, "http://msg/1", rules)
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r["pred"], []).append(r)
    title = by_pred["http://purl.org/dc/terms/title"][0]
    # subject derived from channel/link, graph stays the message uri
    assert title["subj"] == "http://feed.example/home"
    assert title["graph"] == "http://msg/1"
    assert title["obj"] == "Feed Title" and title["obj_is_lit"]
    assert title["obj_lang"] == "de"  # xml:lang beats the fixed lang
    assert title["score"] == 30  # shared rulebase score for dc:title
    links = by_pred["http://schema.org/mentions"]
    assert [r["obj"] for r in links] == [
        "http://feed.example/1", "http://feed.example/2"
    ]
    assert not links[0]["obj_is_lit"]
    ids = by_pred["http://purl.org/dc/terms/identifier"]
    assert sorted(r["obj"] for r in ids) == ["a1", "a2"]


def test_register_new_type_end_to_end(ray_session):
    """The M2 extension gap: a new XML MIME type lands via CONFIG only
    — TOML rules + register call, no new Python stage."""
    import ray.data as rd

    from twine_ray.pipelines.dispatch import dispatch_messages

    mime = "application/rss+xml"
    assert mime not in PROCESSORS
    try:
        register_xml_type(mime, RSS_TOML)
        msgs = rd.from_arrow(
            pa.Table.from_pylist(
                [
                    {"uri": "http://m/1", "content_type": mime,
                     "payload": RSS_DOC},
                    {"uri": "http://m/2", "content_type": mime,
                     "payload": b"<broken <<"},
                ],
                schema=MESSAGES_SCHEMA,
            )
        )
        triples, counts = dispatch_messages(msgs, {})
        df = triples.to_pandas()
        assert counts[mime] == 1
        # malformed message skipped; good message fully extracted
        assert set(df["graph"]) == {"http://m/1"}
        assert len(df) == 5
        assert (df[df["pred"].str.endswith("title")]["subj"]
                == "http://feed.example/home").all()
    finally:
        PROCESSORS.pop(mime, None)


def test_rules_validation_fails_at_registration():
    with pytest.raises(XmlRulesError, match="fields"):
        compile_rules({})
    with pytest.raises(XmlRulesError, match="path"):
        compile_rules({"fields": [{"pred": "http://p"}]})
    with pytest.raises(XmlRulesError, match="pred"):
        compile_rules({"fields": [{"path": "a"}]})
    with pytest.raises(XmlRulesError, match="attr"):
        compile_rules(
            {"fields": [{"path": "a", "pred": "p", "object": "attr"}]}
        )
    with pytest.raises(XmlRulesError, match="kind"):
        compile_rules(
            {"fields": [{"path": "a", "pred": "p", "kind": "nope"}]}
        )
    with pytest.raises(XmlRulesError, match="TOML"):
        rules_from_toml("not [ valid")


def test_datatype_literal_and_uri_fallback_subject():
    rules = compile_rules(
        {
            "fields": [
                {"path": "n", "pred": "http://p/val",
                 "datatype": "http://www.w3.org/2001/XMLSchema#integer"},
            ]
        }
    )
    rows = extract_xml_triples(b"<r><n>42</n></r>", "http://msg/x", rules)
    assert rows[0]["subj"] == "http://msg/x"  # no subject rule -> uri
    assert rows[0]["obj"] == "42"
    assert rows[0]["obj_dt"].endswith("#integer")
    assert rows[0]["obj_lang"] == ""  # datatype suppresses lang


def test_cli_message_with_xml_rules(ray_session, tmp_path, capsys):
    """`twine -t <mime>` analog with config-registered XML rules."""
    from twine_ray.cli import main

    rules = tmp_path / "rules.toml"
    rules.write_text(
        '[[fields]]\npath = "channel/title"\n'
        'pred = "http://purl.org/dc/terms/title"\n'
    )
    doc = tmp_path / "feed.xml"
    doc.write_text("<rss><channel><title>Hi</title></channel></rss>")
    mime = "application/x-test-rss"
    try:
        rc = main([
            "message", str(doc), "-t", mime, "--uri", "http://m/9",
            "--xml-rules", f"{mime}={rules}",
        ])
    finally:
        PROCESSORS.pop(mime, None)
    assert rc == 0
    out = capsys.readouterr().out
    assert '"Hi"' in out and "dc/terms/title" in out


def test_workflow_config_registers_xml_types(tmp_path):
    """The twine.conf `[xslt:<mime>]` analog: workflow TOML registers
    XML types both inline and via a referenced rules file."""
    from twine_ray.pipelines.workflow import load_workflow_config

    (tmp_path / "rss_rules.toml").write_text(
        '[[fields]]\npath = "channel/title"\n'
        'pred = "http://purl.org/dc/terms/title"\n'
    )
    cfg = tmp_path / "twine.toml"
    cfg.write_text(
        '[twine_ray]\nworkflow = ["extract", "triples"]\n\n'
        '[xslt."application/x-rss-test"]\nrules = "rss_rules.toml"\n\n'
        '[[xslt."application/x-atom-test".fields]]\n'
        'path = ".//entry/title"\n'
        'pred = "http://purl.org/dc/terms/title"\n'
    )
    try:
        stages, opts = load_workflow_config(str(cfg))
        assert stages == ["extract", "triples"]
        assert "application/x-rss-test" in PROCESSORS
        assert "application/x-atom-test" in PROCESSORS
    finally:
        PROCESSORS.pop("application/x-rss-test", None)
        PROCESSORS.pop("application/x-atom-test", None)
