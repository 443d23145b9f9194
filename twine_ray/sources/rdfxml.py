"""RDF/XML parsing (SURVEY.md §2.2 M1 — final serialization gap).

The reference accepts ``application/rdf+xml`` through librdf
(``twine:plug-ins/rdf.c`` -> ``twine_rdf_model_parse``).  This is a
from-scratch stdlib ``xml.etree`` implementation of the practical
RDF/XML subset:

- ``rdf:RDF`` root (or a single node element as the root)
- node elements: ``rdf:Description`` and typed nodes (tag => rdf:type)
- ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID`` subjects, fresh bnodes
- property elements: ``rdf:resource``, ``rdf:nodeID``, nested node
  elements, text literals with ``rdf:datatype`` / inherited ``xml:lang``
- ``rdf:parseType="Resource"`` (anonymous property grouping)
- property ATTRIBUTES on node elements (the common abbreviation)
- ``xml:base`` resolution for relative IRIs (about/resource/ID)

- ``rdf:parseType``: "Resource", "Collection" (expands like Turtle's
  ``(...)``), and "Literal" (inner XML serialized verbatim as an
  rdf:XMLLiteral-typed literal)
- containers: ``rdf:li`` property elements number themselves
  ``rdf:_1, rdf:_2, ...`` per node element (Seq/Bag/Alt)
- reification sugar: ``rdf:ID="x"`` on a PROPERTY element emits the
  base triple plus the four ``rdf:Statement`` triples about
  ``<base>#x``

Output rows use the engine triple schema; malformed XML raises
``RdfXmlParseError``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from twine_ray.functions.urls import resolve_iri

from twine_ray.stages.triples import TRIPLES_SCHEMA  # noqa: F401  (re-export)

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

_RDF = lambda local: f"{{{RDF_NS}}}{local}"  # noqa: E731
_SYNTAX_ATTRS = {
    _RDF("about"), _RDF("ID"), _RDF("nodeID"), _RDF("resource"),
    _RDF("datatype"), _RDF("parseType"),
    f"{{{XML_NS}}}lang", f"{{{XML_NS}}}base",
}


class RdfXmlParseError(ValueError):
    pass


def _expand_tag(tag: str) -> str:
    """'{ns}local' -> ns+local IRI."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    raise RdfXmlParseError(f"unnamespaced element <{tag}>")


class _Parser:
    def __init__(self, default_graph: str) -> None:
        self.graph = default_graph
        self.rows: list[dict] = []
        self._bn = 0

    def fresh_bnode(self) -> str:
        self._bn += 1
        return f"_:xb{self._bn}"

    def emit(self, subj: str, pred: str, obj: str, is_lit: bool,
             dt: str = "", lang: str = "") -> None:
        self.rows.append(
            {
                "graph": self.graph, "subj": subj, "pred": pred,
                "obj": obj, "obj_is_lit": is_lit, "obj_dt": dt,
                "obj_lang": lang, "score": 0,
            }
        )

    def parse(self, root: ET.Element, base: str, lang: str) -> None:
        base = root.get(f"{{{XML_NS}}}base", base)
        lang = root.get(f"{{{XML_NS}}}lang", lang)
        if _expand_tag(root.tag) == RDF_NS + "RDF":
            for child in root:
                self.node_element(child, base, lang)
        else:
            self.node_element(root, base, lang)

    def _subject_of(self, el: ET.Element, base: str) -> str:
        about = el.get(_RDF("about"))
        rid = el.get(_RDF("ID"))
        nid = el.get(_RDF("nodeID"))
        if sum(x is not None for x in (about, rid, nid)) > 1:
            raise RdfXmlParseError(
                "at most one of rdf:about/rdf:ID/rdf:nodeID allowed"
            )
        if about is not None:
            return resolve_iri(base, about) if base else about
        if rid is not None:
            return resolve_iri(base, f"#{rid}") if base else f"#{rid}"
        if nid is not None:
            return f"_:{nid}"
        return self.fresh_bnode()

    def node_element(self, el: ET.Element, base: str, lang: str) -> str:
        base = el.get(f"{{{XML_NS}}}base", base)
        lang = el.get(f"{{{XML_NS}}}lang", lang)
        subj = self._subject_of(el, base)
        tag_iri = _expand_tag(el.tag)
        if tag_iri != RDF_NS + "Description":
            self.emit(subj, RDF_TYPE, tag_iri, False)
        # property attributes (abbreviated literal properties)
        for attr, val in el.attrib.items():
            if attr in _SYNTAX_ATTRS or not attr.startswith("{"):
                continue
            pred = _expand_tag(attr)
            if pred == RDF_TYPE:
                # W3C: an rdf:type property ATTRIBUTE takes a resource
                # value — emit a type triple, not a literal
                obj = resolve_iri(base, val) if base else val
                self.emit(subj, RDF_TYPE, obj, False)
                continue
            if pred.startswith(RDF_NS):
                raise RdfXmlParseError(
                    f"unsupported rdf-namespace property attribute {pred!r}"
                )
            self.emit(subj, pred, val, True, "", lang)
        li_n = 0
        for prop in el:
            if prop.tag == _RDF("li"):
                li_n += 1
                self.property_element(subj, prop, base, lang,
                                      pred_override=f"{RDF_NS}_{li_n}")
            else:
                self.property_element(subj, prop, base, lang)
        return subj

    def _reify(self, rid: str, base: str, subj: str, pred: str,
               obj: str, is_lit: bool, dt: str, lang: str) -> None:
        """rdf:ID reification sugar: four triples about <base>#rid."""
        st = resolve_iri(base, f"#{rid}") if base else f"#{rid}"
        self.emit(st, RDF_TYPE, RDF_NS + "Statement", False)
        self.emit(st, RDF_NS + "subject", subj, False)
        self.emit(st, RDF_NS + "predicate", pred, False)
        self.emit(st, RDF_NS + "object", obj, is_lit, dt, lang)

    def property_element(self, subj: str, el: ET.Element, base: str,
                         lang: str, pred_override: str | None = None) -> None:
        base = el.get(f"{{{XML_NS}}}base", base)
        lang = el.get(f"{{{XML_NS}}}lang", lang)
        pred = pred_override or _expand_tag(el.tag)
        reify_id = el.get(_RDF("ID"))
        parse_type = el.get(_RDF("parseType"))
        resource = el.get(_RDF("resource"))
        nid = el.get(_RDF("nodeID"))
        dt = el.get(_RDF("datatype"))
        children = list(el)

        def emit_prop(obj, is_lit, odt="", olang=""):
            self.emit(subj, pred, obj, is_lit, odt, olang)
            if reify_id is not None:
                self._reify(reify_id, base, subj, pred, obj, is_lit,
                            odt, olang)

        if parse_type == "Resource":
            node = self.fresh_bnode()
            emit_prop(node, False)
            for sub in children:
                self.property_element(node, sub, base, lang)
            return
        if parse_type == "Collection":
            items = [self.node_element(c, base, lang) for c in children]
            if not items:
                emit_prop(RDF_NIL, False)
                return
            head = self.fresh_bnode()
            emit_prop(head, False)
            node = head
            for i, item in enumerate(items):
                self.emit(node, RDF_FIRST, item, False)
                if i + 1 < len(items):
                    nxt = self.fresh_bnode()
                    self.emit(node, RDF_REST, nxt, False)
                    node = nxt
                else:
                    self.emit(node, RDF_REST, RDF_NIL, False)
            return
        if parse_type == "Literal":
            # XML literal: serialize the element's inner XML verbatim
            # as an rdf:XMLLiteral-typed literal
            inner = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in children
            )
            emit_prop(inner, True, RDF_NS + "XMLLiteral", "")
            return
        if parse_type is not None:
            raise RdfXmlParseError(f"unsupported parseType {parse_type!r}")
        if resource is not None:
            obj = resolve_iri(base, resource) if base else resource
            emit_prop(obj, False)
            return
        if nid is not None:
            emit_prop(f"_:{nid}", False)
            return
        if children:
            if len(children) != 1:
                raise RdfXmlParseError(
                    f"property <{pred}> must contain one node element"
                )
            obj = self.node_element(children[0], base, lang)
            emit_prop(obj, False)
            return
        text = el.text or ""
        emit_prop(text, True, dt or "", "" if dt else lang.lower())


def parse_rdfxml(payload: bytes | str, default_graph: str = "") -> list[dict]:
    """Parse an RDF/XML document into triple-schema rows."""
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as ex:
        raise RdfXmlParseError(f"not well-formed XML: {ex}") from ex
    p = _Parser(default_graph)
    try:
        p.parse(root, base="", lang="")
    except RecursionError as ex:
        raise RdfXmlParseError("nesting too deep") from ex
    return p.rows


class RdfXmlSerializeError(ValueError):
    pass


_NCNAME_SUFFIX = None  # compiled lazily


def _split_pred(iri: str) -> tuple[str, str]:
    """Split a predicate IRI into (namespace, NCName local) for QName
    serialization — the longest valid NCName suffix becomes the local
    part.  Raises when no non-empty split exists (XML cannot name the
    property; librdf raises the same way)."""
    import re

    global _NCNAME_SUFFIX
    if _NCNAME_SUFFIX is None:
        _NCNAME_SUFFIX = re.compile(r"[A-Za-z_][A-Za-z0-9_.-]*$")
    m = _NCNAME_SUFFIX.search(iri)
    if not m or m.start() == 0:
        raise RdfXmlSerializeError(
            f"predicate {iri!r} has no serializable QName local part"
        )
    return iri[: m.start()], iri[m.start():]


def triples_to_rdfxml(rows: list[dict]) -> str:
    """Serialize triple-schema rows to RDF/XML (graph column ignored —
    RDF/XML has no named-graph syntax; quads export uses N-Quads/TriG).

    Deterministic: rows sorted, namespaces assigned in first-use order;
    bnodes via ``rdf:nodeID``; literals as element text with
    ``rdf:datatype`` / ``xml:lang`` (lang lowercased to match the
    parser normalization).  Round-trips through ``parse_rdfxml``
    (property-tested against the Turtle and N-Quads serializers)."""
    from xml.sax.saxutils import escape, quoteattr

    def _xml_text(s: str) -> str:
        # \r and U+0085 (NEL) are line-end-normalized to \n by XML
        # parsers when literal — character references survive intact
        return (
            escape(s).replace("\r", "&#xD;").replace("\x85", "&#x85;")
        )

    ordered = sorted(
        rows, key=lambda r: (r["subj"], r["pred"], str(r["obj"])),
    )
    ns_prefix: dict[str, str] = {RDF_NS: "rdf"}

    def prefix_of(ns: str) -> str:
        if ns not in ns_prefix:
            ns_prefix[ns] = f"ns{len(ns_prefix)}"
        return ns_prefix[ns]

    body: list[str] = []
    i = 0
    while i < len(ordered):
        j = i
        while j < len(ordered) and ordered[j]["subj"] == ordered[i]["subj"]:
            j += 1
        subj = ordered[i]["subj"]
        if subj.startswith("_:"):
            subj_attr = f"rdf:nodeID={quoteattr(subj[2:])}"
        else:
            subj_attr = f"rdf:about={quoteattr(subj)}"
        props: list[str] = []
        for r in ordered[i:j]:
            ns, local = _split_pred(r["pred"])
            qn = f"{prefix_of(ns)}:{local}"
            if r["obj_is_lit"]:
                attrs = ""
                if r.get("obj_dt"):
                    attrs = f" rdf:datatype={quoteattr(r['obj_dt'])}"
                elif r.get("obj_lang"):
                    attrs = f" xml:lang={quoteattr(r['obj_lang'].lower())}"
                props.append(
                    f"    <{qn}{attrs}>{_xml_text(r['obj'])}</{qn}>"
                )
            elif str(r["obj"]).startswith("_:"):
                props.append(
                    f"    <{qn} rdf:nodeID={quoteattr(str(r['obj'])[2:])}/>"
                )
            else:
                props.append(
                    f"    <{qn} rdf:resource={quoteattr(str(r['obj']))}/>"
                )
        body.append(
            f"  <rdf:Description {subj_attr}>\n"
            + "\n".join(props)
            + "\n  </rdf:Description>"
        )
        i = j
    ns_decls = " ".join(
        f"xmlns:{p}={quoteattr(ns)}" for ns, p in ns_prefix.items()
    )
    return (
        f"<rdf:RDF {ns_decls}>\n" + "\n".join(body) + "\n</rdf:RDF>\n"
    )


def read_rdfxml(paths, default_graph: str = ""):
    """Bulk RDF/XML load: one document per file (like read_turtle)."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for path, payload in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            rows.extend(parse_rdfxml(payload or b"", default_graph or path))
        return pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA)

    return ds.map_batches(_parse, batch_format="pyarrow")
