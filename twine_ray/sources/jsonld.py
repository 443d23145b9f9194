"""JSON-LD parsing / serialization (SURVEY.md §2.2 M1 family).

The reference parses RDF through librdf/raptor, whose syntax set
includes JSON-LD (``twine:libtwine/rdf.c::twine_rdf_model_parse``
accepts any raptor syntax name, and JSON-LD is the common payload for
HTTP APIs feeding Twine queues).  No JSON-LD library exists in this
environment, so this is a from-scratch implementation of the practical
flat JSON-LD 1.0 subset:

- ``@context``: term -> IRI map (string values), term definitions
  ``{"@id": iri, "@type": "@id" | datatype-iri}``, ``@vocab``,
  ``@base``, ``@language``; array-of-contexts merges left to right
- node objects: ``@id`` (IRI / compact IRI / bnode; absent -> fresh
  bnode), ``@type`` (string or array), property values: strings
  (literal — or IRI when the term is typed ``@id``), numbers
  (xsd:integer / xsd:double), booleans, ``{"@id": ...}``,
  ``{"@value": ..., "@type"/"@language": ...}``, ``{"@list": [...]}``
  (expanded to rdf:first/rest/nil), ``{"@set": [...]}``, nested node
  objects, arrays of any of these, ``null`` (dropped, per spec)
- top level: node object, array of node objects, or ``{"@graph":
  [...]}``; a node with BOTH ``@id`` and ``@graph`` names a graph
  (TriG-style)

NOT supported — raises ``JsonLdParseError``, never a silent drop
(mirrors the Turtle/RDF-XML parsers' contract): ``@reverse``,
``@index``, ``@container``, ``@nest``, ``@version``, keyword
aliasing, scoped or remote contexts.

Output rows use the engine triple schema (graph, subj, pred, obj,
obj_is_lit, obj_dt, obj_lang, score=0) matching ``sources/nquads.py``.
"""

from __future__ import annotations

import json
from urllib.parse import urljoin

from twine_ray.sources.turtle import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD,
)


class JsonLdParseError(ValueError):
    pass


_UNSUPPORTED = {"@reverse", "@index", "@container", "@nest", "@version"}


class _Ctx:
    __slots__ = ("terms", "vocab", "base", "language")

    def __init__(self) -> None:
        self.terms: dict[str, dict] = {}
        self.vocab: str | None = None
        self.base: str | None = None
        self.language: str = ""

    def child(self) -> "_Ctx":
        c = _Ctx()
        c.terms = dict(self.terms)
        c.vocab, c.base, c.language = self.vocab, self.base, self.language
        return c


def _apply_context(ctx: _Ctx, cx) -> _Ctx:
    if isinstance(cx, list):
        for one in cx:
            ctx = _apply_context(ctx, one)
        return ctx
    if cx is None:  # null context = reset (spec)
        return _Ctx()
    if isinstance(cx, str):
        raise JsonLdParseError(f"remote context not supported: {cx!r}")
    if not isinstance(cx, dict):
        raise JsonLdParseError(f"bad @context: {cx!r}")
    ctx = ctx.child()

    def _str(v, what):
        if not (v is None or isinstance(v, str)):
            raise JsonLdParseError(f"{what} must be a string: {v!r}")
        return v

    for k, v in cx.items():
        if k == "@vocab":
            ctx.vocab = _str(v, "@vocab")
        elif k == "@base":
            ctx.base = _str(v, "@base")
        elif k == "@language":
            ctx.language = (_str(v, "@language") or "").lower()
        elif k.startswith("@"):
            raise JsonLdParseError(f"unsupported context keyword {k!r}")
        elif isinstance(v, str):
            ctx.terms[k] = {"id": v, "type": None}
        elif isinstance(v, dict):
            bad = set(v) - {"@id", "@type"}
            if bad:
                raise JsonLdParseError(
                    f"unsupported term-definition keys {sorted(bad)}"
                )
            if not isinstance(v.get("@id"), str):
                raise JsonLdParseError(
                    f"term {k!r} definition needs a string @id"
                )
            ctx.terms[k] = {"id": v["@id"], "type": v.get("@type")}
        elif v is None:
            ctx.terms.pop(k, None)
        else:
            raise JsonLdParseError(f"bad term definition for {k!r}")
    return ctx


def _expand_iri(ctx: _Ctx, value: str, vocab: bool) -> str:
    """Term / compact-IRI / relative-IRI expansion.  ``vocab`` selects
    the predicate/@type rules (term map then @vocab) over the @id
    rules (term map then @base)."""
    if not isinstance(value, str):
        raise JsonLdParseError(f"IRI expected, got {value!r}")
    if value.startswith("_:"):
        return value
    if value in ctx.terms:
        return ctx.terms[value]["id"]
    if ":" in value:
        pfx, local = value.split(":", 1)
        if not local.startswith("//") and pfx in ctx.terms:
            return ctx.terms[pfx]["id"] + local
        return value
    if vocab:
        if ctx.vocab:
            return ctx.vocab + value
        raise JsonLdParseError(
            f"cannot expand {value!r}: no term definition or @vocab"
        )
    if ctx.base:
        return urljoin(ctx.base, value)
    return value


def _canon_number(v) -> tuple[str, str]:
    if isinstance(v, bool):
        return ("true" if v else "false"), XSD + "boolean"
    if isinstance(v, int):
        return str(v), XSD + "integer"
    if isinstance(v, float):
        # repr() round-trips the double exactly; a fixed %.15E form
        # would lose the shortest-representation property
        return repr(v), XSD + "double"
    raise JsonLdParseError(f"bad literal value {v!r}")


class _Parser:
    def __init__(self, default_graph: str) -> None:
        self.rows: list[dict] = []
        self.default_graph = default_graph
        self._bn = 0

    def fresh_bnode(self) -> str:
        self._bn += 1
        return f"_:jb{self._bn}"

    def _row(self, graph, subj, pred, obj, is_lit, dt="", lang=""):
        self.rows.append(
            {
                "graph": graph, "subj": subj, "pred": pred, "obj": obj,
                "obj_is_lit": is_lit, "obj_dt": dt, "obj_lang": lang,
                "score": 0,
            }
        )

    def node(self, obj, ctx: _Ctx, graph: str) -> str:
        """Emit one node object's triples; returns its subject term."""
        if not isinstance(obj, dict):
            raise JsonLdParseError(f"node object expected, got {obj!r}")
        if "@context" in obj:
            ctx = _apply_context(ctx, obj["@context"])
        if "@value" in obj or "@list" in obj or "@set" in obj:
            raise JsonLdParseError("value object where a node is required")
        bad = set(obj) & _UNSUPPORTED
        if bad:
            raise JsonLdParseError(f"unsupported keywords {sorted(bad)}")
        subj = (
            _expand_iri(ctx, obj["@id"], vocab=False)
            if "@id" in obj else self.fresh_bnode()
        )
        for t in _as_list(obj.get("@type", [])):
            self._row(graph, subj, RDF_TYPE,
                      _expand_iri(ctx, t, vocab=True), False)
        if "@graph" in obj:
            inner = subj if "@id" in obj else graph
            for n in _as_list(obj["@graph"]):
                self.node(n, ctx, inner)
        for key, vals in obj.items():
            if key.startswith("@"):
                continue
            pred = _expand_iri(ctx, key, vocab=True)
            term_def = ctx.terms.get(key)
            for v in _as_list(vals):
                if v is None:
                    continue
                self.value(subj, pred, v, ctx, graph, term_def)
        return subj

    def value(self, subj, pred, v, ctx, graph, term_def) -> None:
        if isinstance(v, dict):
            if "@list" in v:
                head = self._list(
                    [x for x in _as_list(v["@list"]) if x is not None],
                    ctx, graph, term_def,
                )
                self._row(graph, subj, pred, head, False)
            elif "@set" in v:
                for x in _as_list(v["@set"]):
                    if x is not None:
                        self.value(subj, pred, x, ctx, graph, term_def)
            elif "@value" in v:
                self._value_object(subj, pred, v, ctx, graph)
            elif set(v) <= {"@id", "@context"} and "@id" in v:
                if "@context" in v:
                    ctx = _apply_context(ctx, v["@context"])
                self._row(graph, subj, pred,
                          _expand_iri(ctx, v["@id"], vocab=False), False)
            else:
                child = self.node(v, ctx, graph)
                self._row(graph, subj, pred, child, False)
        elif isinstance(v, str):
            if term_def and term_def["type"] == "@id":
                self._row(graph, subj, pred,
                          _expand_iri(ctx, v, vocab=False), False)
            elif term_def and term_def["type"]:
                dt = _expand_iri(ctx, term_def["type"], vocab=True)
                self._row(graph, subj, pred, v, True, dt=dt)
            else:
                self._row(graph, subj, pred, v, True, lang=ctx.language)
        else:
            lex, dt = _canon_number(v)
            self._row(graph, subj, pred, lex, True, dt=dt)

    def _value_object(self, subj, pred, v, ctx, graph) -> None:
        bad = set(v) - {"@value", "@type", "@language"}
        if bad:
            raise JsonLdParseError(
                f"unsupported value-object keys {sorted(bad)}"
            )
        if "@type" in v and "@language" in v:
            raise JsonLdParseError("@type and @language are exclusive")
        val = v["@value"]
        if isinstance(val, str):
            lex, dt0 = val, ""
        else:
            lex, dt0 = _canon_number(val)
        dt = (_expand_iri(ctx, v["@type"], vocab=True)
              if "@type" in v else dt0)
        lang = (v.get("@language") or "").lower() if not dt else ""
        self._row(graph, subj, pred, lex, True, dt=dt, lang=lang)

    def _list(self, items, ctx, graph, term_def) -> str:
        if not items:
            return RDF_NIL
        head = self.fresh_bnode()
        cur = head
        for i, item in enumerate(items):
            self.value(cur, RDF_FIRST, item, ctx, graph, term_def)
            nxt = self.fresh_bnode() if i + 1 < len(items) else RDF_NIL
            self._row(graph, cur, RDF_REST, nxt, False)
            cur = nxt
        return head


def _as_list(v) -> list:
    return v if isinstance(v, list) else [v]


def parse_jsonld(payload: bytes | str, default_graph: str = "") -> list[dict]:
    """Parse a JSON-LD document into triple-schema rows."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", errors="strict")
    try:
        data = json.loads(payload)
    except (ValueError, UnicodeDecodeError) as ex:
        raise JsonLdParseError(f"not valid JSON: {ex}") from ex
    p = _Parser(default_graph)
    ctx = _Ctx()
    top = data
    if isinstance(top, dict) and set(top) <= {"@context", "@graph"}:
        # bare wrapper: context + default-graph nodes
        if "@context" in top:
            ctx = _apply_context(ctx, top["@context"])
        top = top.get("@graph", [])
    for obj in _as_list(top):
        p.node(obj, ctx, default_graph)
    return p.rows


def triples_to_jsonld(rows: list[dict]) -> str:
    """Serialize triple-schema rows to deterministic flat JSON-LD:
    full IRIs (no context — always valid), one node object per
    (graph, subj), named graphs as ``{"@id": g, "@graph": [...]}``
    wrappers, sorted graphs/subjects/predicates/objects.  Round-trips
    through ``parse_jsonld`` (property-tested); rdf:first/rest chains
    are serialized as raw triples, which reparse identically."""
    def term_ref(v: str) -> dict:
        return {"@id": v}

    def obj_json(r: dict):
        if not r["obj_is_lit"]:
            return term_ref(r["obj"])
        out = {"@value": r["obj"]}
        if r["obj_dt"]:
            out["@type"] = r["obj_dt"]
        elif r["obj_lang"]:
            out["@language"] = r["obj_lang"]
        return out

    by_graph: dict[str, dict[str, list[dict]]] = {}
    for r in rows:
        by_graph.setdefault(r["graph"], {}) \
            .setdefault(r["subj"], []).append(r)

    def nodes_for(subjects: dict[str, list[dict]]) -> list[dict]:
        nodes = []
        for subj in sorted(subjects):
            node: dict = {"@id": subj}
            preds: dict[str, list] = {}
            types: list[str] = []
            for r in sorted(
                subjects[subj],
                key=lambda r: (r["pred"], r["obj"], r["obj_dt"],
                               r["obj_lang"]),
            ):
                if r["pred"] == RDF_TYPE and not r["obj_is_lit"]:
                    types.append(r["obj"])
                else:
                    preds.setdefault(r["pred"], []).append(obj_json(r))
            if types:
                node["@type"] = types
            node.update({p: preds[p] for p in sorted(preds)})
            nodes.append(node)
        return nodes

    out: list[dict] = []
    for g in sorted(by_graph):
        if g == "":
            out.extend(nodes_for(by_graph[g]))
        else:
            out.append({"@id": g, "@graph": nodes_for(by_graph[g])})
    return json.dumps(out, ensure_ascii=False, indent=1)


def read_jsonld(paths, default_graph: str = ""):
    """Bulk JSON-LD load: one document per file (a JSON value is not
    line-splittable), parallelism from the shard list like
    ``read_turtle``."""
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.stages.triples import TRIPLES_SCHEMA

    ds = rd.read_binary_files(paths, include_paths=True)

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for path, payload in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            rows.extend(parse_jsonld(payload, default_graph=default_graph
                                     or f"file://{path}"))
        return pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA)

    return ds.map_batches(_parse, batch_format="pyarrow")
