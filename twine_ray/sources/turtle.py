"""Turtle / TriG parsing (SURVEY.md §2.2 M1 — the round-1 gap).

The reference accepts ``text/turtle`` / ``application/trig`` (and more)
through librdf (``twine:plug-ins/rdf.c`` dispatching into
``twine:libtwine/rdf.c::twine_rdf_model_parse``); Turtle is its most
common ingest serialization.  No rdflib exists in this environment, so
this is a from-scratch tokenizer + recursive-descent parser for the
practical Turtle subset (which, plus graph blocks, is TriG):

- ``@prefix`` / ``@base`` and SPARQL-style ``PREFIX`` / ``BASE``
- prefixed names, relative-IRI resolution against the base
- ``a`` keyword, ``;`` predicate lists, ``,`` object lists
- literals: short/long, single/double quoted, ``@lang``, ``^^dt``,
  numeric (integer/decimal/double) and boolean shorthand
- blank nodes: labels, ``[]``, ``[ pred obj ; ... ]`` property lists
- collections ``( ... )`` (expanded to rdf:first/rest/nil)
- TriG graph blocks: ``<g> { ... }`` / ``GRAPH <g> { ... }``

Output rows use the engine triple schema (graph, subj, pred, obj,
obj_is_lit, obj_dt, obj_lang, score=0), matching
``sources/nquads.py``.  Malformed input raises ``TurtleParseError`` —
callers that want Twine's log-and-skip contract catch it per message.
"""

from __future__ import annotations

import re
from twine_ray.functions.urls import resolve_iri

from twine_ray.stages.triples import TRIPLES_SCHEMA  # noqa: F401  (re-export)

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"


class TurtleParseError(ValueError):
    pass


# Ordering matters: @prefix/@base must beat the langtag pattern; pname
# must beat the bare keywords so `a:x` stays a pname while bare `a` is
# rdf:type.  Locals/labels must not swallow a trailing '.' (it is the
# statement terminator: Turtle's PN_LOCAL cannot end with a dot), and
# a decimal requires digits AFTER the dot so `1.` lexes as `1` `.`.
_PN_LOCAL = r"(?:[A-Za-z0-9._:%-]*[A-Za-z0-9_:%-])?"
_TOKEN_RE = re.compile(
    rf"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iriref><(?:[^<>"{{}}|^`\\\x00-\x20]|\\u[0-9a-fA-F]{{4}}|\\U[0-9a-fA-F]{{8}})*>)
  | (?P<long_dq>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
  | (?P<long_sq>'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<string_dq>"(?:[^"\\\n\r]|\\.)*")
  | (?P<string_sq>'(?:[^'\\\n\r]|\\.)*')
  | (?P<atkw>@prefix\b|@base\b)
  | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<dtype>\^\^)
  | (?P<bnode>_:[A-Za-z0-9](?:[A-Za-z0-9._-]*[A-Za-z0-9_-])?)
  | (?P<pname>[A-Za-z][A-Za-z0-9._-]*?:{_PN_LOCAL}|:{_PN_LOCAL})
  | (?P<number>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\d*\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?))
  | (?P<keyword>a\b|(?i:PREFIX|BASE|GRAPH)\b|true\b|false\b)
  | (?P<word>[A-Za-z][A-Za-z0-9._-]*)
  | (?P<punct>[.;,\[\]()\{{\}}])
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}
_UNESC_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|[tbnrf\"'\\\\])")


def _unescape(s: str) -> str:
    def _one(m: re.Match) -> str:
        e = m.group(1)
        if e[0] in "uU":
            return chr(int(e[1:], 16))
        return _ESCAPES[e]

    return _UNESC_RE.sub(_one, s)


def _tokenize(text: str):
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise TurtleParseError(
                f"unexpected character {text[pos]!r} at offset {pos}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        yield kind, m.group()
    yield "eof", ""


# Terms are tagged tuples:
#   ("iri", value) | ("bnode", label) | ("lit", text, dt, lang)


class _Parser:
    def __init__(self, text: str, default_graph: str = "") -> None:
        self.tokens = list(_tokenize(text))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.default_graph = default_graph
        self.rows: list[dict] = []
        self._bn = 0

    # --- token plumbing ---------------------------------------------------
    def peek(self):
        return self.tokens[self.i]

    def next(self):
        t = self.tokens[self.i]
        self.i += 1
        return t

    def expect_punct(self, ch: str) -> None:
        kind, val = self.next()
        if kind != "punct" or val != ch:
            raise TurtleParseError(f"expected {ch!r}, got {val!r}")

    def fresh_bnode(self) -> str:
        self._bn += 1
        return f"_:tb{self._bn}"

    # --- term helpers -----------------------------------------------------
    def _resolve_iri(self, raw: str) -> str:
        iri = _unescape(raw[1:-1])
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return resolve_iri(self.base, iri)
        return iri

    def _expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise TurtleParseError(f"undefined prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def _number_literal(self, raw: str):
        if re.fullmatch(r"[+-]?\d+", raw):
            return ("lit", raw, XSD + "integer", "")
        if "e" in raw.lower():
            return ("lit", raw, XSD + "double", "")
        return ("lit", raw, XSD + "decimal", "")

    # --- grammar ----------------------------------------------------------
    def parse(self) -> list[dict]:
        while True:
            kind, val = self.peek()
            if kind == "eof":
                break
            if kind == "atkw" or (
                kind == "keyword" and val.upper() in ("PREFIX", "BASE")
            ):
                self._directive()
                continue
            if kind == "keyword" and val.upper() == "GRAPH":
                self.next()
                self._graph_block()
                continue
            # TriG: <g> { ... }  — lookahead for '{' after a single term
            if kind in ("iriref", "pname", "bnode") and self._is_graph_open():
                self._graph_block()
                continue
            if kind == "punct" and val == "{":
                # default-graph block (TriG)
                self.next()
                self._triples_until("}", self.default_graph)
                self.expect_punct("}")
                continue
            self._triples_stmt(self.default_graph)
        return self.rows

    def _is_graph_open(self) -> bool:
        nk, nv = self.tokens[self.i + 1]
        return nk == "punct" and nv == "{"

    def _graph_block(self) -> None:
        kind, val = self.next()
        if kind == "iriref":
            graph = self._resolve_iri(val)
        elif kind == "pname":
            graph = self._expand_pname(val)
        elif kind == "bnode":
            graph = val
        else:
            raise TurtleParseError(f"bad graph label {val!r}")
        self.expect_punct("{")
        self._triples_until("}", graph)
        self.expect_punct("}")

    def _triples_until(self, close: str, graph: str) -> None:
        while True:
            kind, val = self.peek()
            if kind == "eof":
                raise TurtleParseError(f"unterminated block, missing {close}")
            if kind == "punct" and val == close:
                return
            self._triples_stmt(graph, in_block=True)

    def _directive(self) -> None:
        kind, val = self.next()
        sparql_form = not val.startswith("@")
        if val.lstrip("@").upper() == "PREFIX":
            k, pname = self.next()
            if k != "pname" or not pname.endswith(":"):
                raise TurtleParseError(f"bad prefix declaration {pname!r}")
            k, iri = self.next()
            if k != "iriref":
                raise TurtleParseError("prefix declaration needs an IRI")
            self.prefixes[pname[:-1]] = self._resolve_iri(iri)
        else:  # @base / BASE
            k, iri = self.next()
            if k != "iriref":
                raise TurtleParseError("base declaration needs an IRI")
            self.base = self._resolve_iri(iri)
        if not sparql_form:
            self.expect_punct(".")

    def _triples_stmt(self, graph: str, in_block: bool = False) -> None:
        kind, val = self.peek()
        from_bnpl = kind == "punct" and val == "["
        subj = self._subject(graph)
        kind, val = self.peek()
        if from_bnpl and kind == "punct" and val in (".", "}"):
            # W3C grammar: the predicateObjectList after a
            # blankNodePropertyList subject is OPTIONAL —
            # `[ :p :o ] .` is a complete statement.
            if val == ".":
                self.next()
            elif not in_block:
                raise TurtleParseError(f"expected '.', got {val!r}")
            return
        self._predicate_object_list(subj, graph)
        kind, val = self.peek()
        if kind == "punct" and val == ".":
            self.next()
        elif in_block and kind == "punct" and val == "}":
            pass  # final statement in a block may omit the dot
        else:
            raise TurtleParseError(f"expected '.', got {val!r}")

    def _subject(self, graph: str):
        kind, val = self.next()
        if kind == "iriref":
            return ("iri", self._resolve_iri(val))
        if kind == "pname":
            return ("iri", self._expand_pname(val))
        if kind == "bnode":
            return ("bnode", val)
        if kind == "punct" and val == "[":
            return self._bnode_property_list(graph)
        if kind == "punct" and val == "(":
            return self._collection(graph)
        raise TurtleParseError(f"bad subject {val!r}")

    def _predicate(self):
        kind, val = self.next()
        if kind == "keyword" and val in ("a", "A"):
            return RDF_TYPE
        if kind == "iriref":
            return self._resolve_iri(val)
        if kind == "pname":
            return self._expand_pname(val)
        raise TurtleParseError(f"bad predicate {val!r}")

    def _predicate_object_list(self, subj, graph: str) -> None:
        while True:
            pred = self._predicate()
            while True:
                obj = self._object(graph)
                self._emit(subj, pred, obj, graph)
                kind, val = self.peek()
                if kind == "punct" and val == ",":
                    self.next()
                    continue
                break
            kind, val = self.peek()
            if kind == "punct" and val == ";":
                self.next()
                # tolerate trailing ';' before '.' / ']' / '}'
                k2, v2 = self.peek()
                if k2 == "punct" and v2 in (".", "]", "}"):
                    return
                continue
            return

    def _object(self, graph: str):
        kind, val = self.next()
        if kind == "iriref":
            return ("iri", self._resolve_iri(val))
        if kind == "pname":
            return ("iri", self._expand_pname(val))
        if kind == "bnode":
            return ("bnode", val)
        if kind in ("string_dq", "string_sq", "long_dq", "long_sq"):
            body = val[3:-3] if kind.startswith("long") else val[1:-1]
            text = _unescape(body)
            dt, lang = "", ""
            k2, v2 = self.peek()
            if k2 == "langtag":
                lang = self.next()[1][1:].lower()
            elif k2 == "dtype":
                self.next()
                k3, v3 = self.next()
                if k3 == "iriref":
                    dt = self._resolve_iri(v3)
                elif k3 == "pname":
                    dt = self._expand_pname(v3)
                else:
                    raise TurtleParseError("bad datatype")
            return ("lit", text, dt, lang)
        if kind == "number":
            return self._number_literal(val)
        if kind == "keyword" and val in ("true", "false"):
            return ("lit", val, XSD + "boolean", "")
        if kind == "punct" and val == "[":
            return self._bnode_property_list(graph)
        if kind == "punct" and val == "(":
            return self._collection(graph)
        raise TurtleParseError(f"bad object {val!r}")

    def _bnode_property_list(self, graph: str):
        node = ("bnode", self.fresh_bnode())
        kind, val = self.peek()
        if kind == "punct" and val == "]":
            self.next()
            return node  # []
        self._predicate_object_list(node, graph)
        self.expect_punct("]")
        return node

    def _collection(self, graph: str):
        items = []
        while True:
            kind, val = self.peek()
            if kind == "punct" and val == ")":
                self.next()
                break
            items.append(self._object(graph))
        if not items:
            return ("iri", RDF_NIL)
        head = ("bnode", self.fresh_bnode())
        node = head
        for i, item in enumerate(items):
            self._emit(node, RDF_FIRST, item, graph)
            if i + 1 < len(items):
                nxt = ("bnode", self.fresh_bnode())
                self._emit(node, RDF_REST, nxt, graph)
                node = nxt
            else:
                self._emit(node, RDF_REST, ("iri", RDF_NIL), graph)
        return head

    def _emit(self, subj, pred: str, obj, graph: str) -> None:
        s = subj[1]
        if obj[0] == "lit":
            o, is_lit, dt, lang = obj[1], True, obj[2], obj[3]
        else:
            o, is_lit, dt, lang = obj[1], False, "", ""
        self.rows.append(
            {
                "graph": graph,
                "subj": s,
                "pred": pred,
                "obj": o,
                "obj_is_lit": is_lit,
                "obj_dt": dt,
                "obj_lang": lang,
                "score": 0,
            }
        )


def parse_turtle(text: str, default_graph: str = "") -> list[dict]:
    """Parse a Turtle (or TriG) document into triple-schema rows."""
    try:
        return _Parser(text, default_graph).parse()
    except RecursionError as ex:
        # pathological nesting depth ([[[[...]]]]): surface it under
        # the parser's own error type so dispatch's log-and-skip
        # contract (catch TurtleParseError only) stays total
        raise TurtleParseError("nesting too deep") from ex


def triples_to_turtle(rows: list[dict], trig: bool = False) -> str:
    """Serialize triple-schema rows to Turtle (or TriG with
    ``trig=True``): full IRIs (no prefix table — always valid), one
    subject block with ``;``-grouped predicates, deterministic order
    (rows sorted by graph/subj/pred/obj).  Round-trips through
    ``parse_turtle`` (property-tested); langs are emitted lowercase to
    match the parser's normalization."""
    from twine_ray.sources.nquads import _escape

    def term(v: str) -> str:
        return v if v.startswith("_:") else f"<{v}>"

    def obj_term(r: dict) -> str:
        if r["obj_is_lit"]:
            s = f'"{_escape(r["obj"])}"'
            if r.get("obj_dt"):
                s += f"^^<{r['obj_dt']}>"
            elif r.get("obj_lang"):
                s += f"@{r['obj_lang'].lower()}"
            return s
        return term(r["obj"])

    ordered = sorted(
        rows, key=lambda r: (r.get("graph") or "", r["subj"], r["pred"],
                             str(r["obj"])),
    )
    out: list[str] = []

    def emit_graph(graph_rows: list[dict], indent: str) -> None:
        i = 0
        while i < len(graph_rows):
            j = i
            while (j < len(graph_rows)
                   and graph_rows[j]["subj"] == graph_rows[i]["subj"]):
                j += 1
            subj = term(graph_rows[i]["subj"])
            preds = [
                f"{term(r['pred'])} {obj_term(r)}"
                for r in graph_rows[i:j]
            ]
            body = f" ;\n{indent}    ".join(preds)
            out.append(f"{indent}{subj} {body} .")
            i = j

    if not trig:
        emit_graph(ordered, "")
        return "\n".join(out) + ("\n" if out else "")

    i = 0
    while i < len(ordered):
        g = ordered[i].get("graph") or ""
        j = i
        while j < len(ordered) and (ordered[j].get("graph") or "") == g:
            j += 1
        if g:
            out.append(f"{term(g)} {{")
            emit_graph(ordered[i:j], "  ")
            out.append("}")
        else:
            emit_graph(ordered[i:j], "")
        i = j
    return "\n".join(out) + ("\n" if out else "")


def read_turtle(paths, default_graph: str = ""):
    """Bulk Turtle/TriG load: one document per file (Turtle is not
    line-splittable — prefixes scope the whole document), parallelism
    from the shard list like ``read_url_doc_dump``."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for path, payload in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            text = (payload or b"").decode("utf-8", errors="replace")
            rows.extend(parse_turtle(text, default_graph or path))
        return pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA)

    return ds.map_batches(_parse, batch_format="pyarrow")
