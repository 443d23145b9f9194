"""Declarative per-MIME XML extraction rules (SURVEY.md §2.2 M2 — the
``twine:plug-ins/xslt.c`` config analog; VERDICT r2 'What's missing' #1).

Twine maps MIME types to XSLT stylesheets in its config
(``[xslt:<mime>] xslt=<stylesheet>``): adding a new XML ingest type is
a CONFIG change, not C code.  This module restores that extension
surface for the Ray engine: a small declarative rule format (plain
dict, or TOML — the config-file analog) interpreted by ONE generic
XML extractor, registered through the existing MIME dispatch registry.
A user adds a new XML type end-to-end without writing a Python stage
(tested in tests/test_xmlrules.py).

Rule format::

    {
      "subject": {"path": "channel/link"}        # optional; element
                                                 # text (or "attr") of
                                                 # the FIRST match —
                                                 # default: message uri
      "fields": [
        {"path": "channel/title",                # ElementPath expr
         "pred": "http://purl.org/dc/terms/title",
         "object": "text",                       # "text" | "attr"
         "kind": "literal",                      # "literal"|"resource"
         "lang_attr": "{http://www.w3.org/XML/1998/namespace}lang",
         "lang": "en",                           # fixed fallback
         "datatype": ""},
        {"path": ".//item/link", "pred": "...", "object": "text",
         "kind": "resource"},
        {"path": ".//item", "object": "attr", "attr": "id",
         "pred": "...", "kind": "literal"},
      ],
    }

Each field rule emits one triple per matching element (graph = the
message uri, score from the shared rulebase).  Paths are
``xml.etree`` ElementPath expressions with ``{ns}tag`` qualification.
The processor is a stateless ``map_batches`` task stage like the other
RDF parsers; malformed XML follows the dispatch log-and-skip contract.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

from twine_ray.state.rulebase import DEFAULT_RULEBASE

XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


class XmlRulesError(ValueError):
    """Invalid rule config (raised at REGISTRATION, not per message)."""


def compile_rules(rules: dict) -> dict:
    """Validate + normalize a rule config; raises XmlRulesError."""
    if not isinstance(rules, dict):
        raise XmlRulesError("rules must be a mapping")
    fields = rules.get("fields")
    if not isinstance(fields, list) or not fields:
        raise XmlRulesError("rules.fields must be a non-empty list")
    out_fields = []
    for i, f in enumerate(fields):
        if not isinstance(f, dict):
            raise XmlRulesError(f"fields[{i}] must be a mapping")
        if not f.get("path"):
            raise XmlRulesError(f"fields[{i}].path is required")
        if not f.get("pred"):
            raise XmlRulesError(f"fields[{i}].pred is required")
        obj_src = f.get("object", "text")
        if obj_src not in ("text", "attr"):
            raise XmlRulesError(
                f"fields[{i}].object must be 'text' or 'attr'"
            )
        if obj_src == "attr" and not f.get("attr"):
            raise XmlRulesError(f"fields[{i}].attr is required for attr")
        kind = f.get("kind", "literal")
        if kind not in ("literal", "resource"):
            raise XmlRulesError(
                f"fields[{i}].kind must be 'literal' or 'resource'"
            )
        out_fields.append(
            {
                "path": f["path"],
                "pred": f["pred"],
                "object": obj_src,
                "attr": f.get("attr", ""),
                "kind": kind,
                "lang_attr": f.get("lang_attr", ""),
                "lang": f.get("lang", ""),
                "datatype": f.get("datatype", ""),
            }
        )
    subj = rules.get("subject")
    if subj is not None:
        if not isinstance(subj, dict) or not subj.get("path"):
            raise XmlRulesError("rules.subject needs a 'path'")
        subj = {"path": subj["path"], "attr": subj.get("attr", "")}
    return {"subject": subj, "fields": out_fields}


def rules_from_toml(text: str) -> dict:
    """Parse a TOML rule config (the config-FILE analog of Twine's
    ``[xslt:<mime>]`` sections)::

        [subject]
        path = "channel/link"

        [[fields]]
        path = "channel/title"
        pred = "http://purl.org/dc/terms/title"
    """
    import tomllib

    try:
        return compile_rules(tomllib.loads(text))
    except tomllib.TOMLDecodeError as ex:
        raise XmlRulesError(f"bad TOML: {ex}") from ex


def _value_of(el: ET.Element, f: dict) -> str | None:
    if f["object"] == "attr":
        return el.get(f["attr"])
    # concatenated text content (itertext covers nested inline markup)
    return "".join(el.itertext()).strip()


def extract_xml_triples(payload: bytes | str, uri: str,
                        rules: dict) -> list[dict]:
    """Apply compiled rules to one XML document -> triple-schema rows.

    Raises ``ET.ParseError`` on malformed XML — the processor catches
    it per message (dispatch log-and-skip contract)."""
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    root = ET.fromstring(payload)

    subj = uri
    s = rules["subject"]
    if s is not None:
        el = root.find(s["path"])
        if el is not None:
            v = el.get(s["attr"]) if s["attr"] else \
                "".join(el.itertext()).strip()
            if v:
                subj = v

    rows = []
    for f in rules["fields"]:
        for el in root.findall(f["path"]):
            v = _value_of(el, f)
            if v is None or v == "":
                continue
            is_lit = f["kind"] == "literal"
            lang = ""
            if is_lit and not f["datatype"]:
                lang = (el.get(f["lang_attr"]) if f["lang_attr"] else "") \
                    or f["lang"]
            rows.append(
                {
                    "graph": uri,
                    "subj": subj,
                    "pred": f["pred"],
                    "obj": v,
                    "obj_is_lit": is_lit,
                    "obj_dt": f["datatype"] if is_lit else "",
                    "obj_lang": lang.lower(),
                    "score": DEFAULT_RULEBASE.score(f["pred"]),
                }
            )
    return rows


def make_xml_processor(rules: dict):
    """Compiled rules -> a dispatch processor (stateless task stage)."""
    rules = compile_rules(rules)

    def _processor(messages_ds, ctx):
        from twine_ray.stages.triples import TRIPLES_SCHEMA

        def _parse(batch: pa.Table) -> pa.Table:
            rows = []
            for uri, payload in zip(
                batch["uri"].to_pylist(), batch["payload"].to_pylist()
            ):
                try:
                    rows.extend(
                        extract_xml_triples(payload or b"", uri, rules)
                    )
                except ET.ParseError:
                    continue
            return pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA)

        return messages_ds.map_batches(_parse, batch_format="pyarrow")

    return _processor


def register_xml_type(mime: str, rules: dict | str) -> None:
    """Register a NEW XML MIME type from a declarative rule config
    (dict, or TOML text) — the ``[xslt:<mime>]`` config line analog.
    Invalid configs fail here, at registration."""
    from twine_ray.pipelines.dispatch import register_processor

    if isinstance(rules, str):
        rules = rules_from_toml(rules)
    register_processor(mime, make_xml_processor(rules))
