"""SPARQL *text* front-end over the BGP algebra (stages/query.py).

Twine's consumers speak SPARQL strings (reference:
twine:libtwine/sparql.c — the engine's SPARQL client helpers — and
Spindle's lookup endpoints, which answer SELECT/ASK/CONSTRUCT/DESCRIBE
over the store this engine materializes; SURVEY §1.1).  This module
parses the documented subset and maps it 1:1 onto the existing
distributed algebra: parsing is driver-side (query strings are tiny),
execution stays entirely in Ray Data.

Supported subset (anything else raises ``SparqlSyntaxError``):

- ``PREFIX`` / ``BASE`` declarations (BASE resolves relative IRIs via
  functions/urls RFC 3986 merge)
- ``SELECT [DISTINCT] ?v ... | * | (AGG(expr) AS ?v)`` with
  ``GROUP BY`` — aggregates ``COUNT(*)``, ``COUNT(?v)``, ``MIN(?v)``,
  ``MAX(?v)``
- ``ASK``, ``CONSTRUCT { quad template } WHERE``, ``DESCRIBE <iri>``
- ``WHERE { ... }`` group: triple blocks (``;`` predicate and ``,``
  object lists), ``GRAPH ?g|<iri> { ... }`` quad scoping,
  ``OPTIONAL { ... }``, ``FILTER(...)``, ``VALUES``,
  ``MINUS { ... }`` (one group), ``{ A } UNION { B } [UNION ...]``
- ``ORDER BY [ASC(?v)|DESC(?v)|?v]...``, ``LIMIT n``, ``OFFSET n``
- predicate sugar: ``a`` = rdf:type; ``^p`` inverse; ``p1/p2``
  sequence (rewritten into fresh intermediate variables — pure BGP
  rewriting, no new operator)
- path quantifiers ``p+`` and ``p{m,n}`` (bounded closure via
  stages/bfs.path_pairs) when the quantified triple is the SOLE
  pattern of the group with variable endpoints; ``p+`` is
  DEPTH-BOUNDED at ``PLUS_MAX_DEPTH`` (3) like the programmatic
  algebra — an unbounded ``+`` over a web-scale store is an
  all-pairs explosion, the documented partitioning assumption.
  ``p{m,n}`` with ``m >= 2`` filters by MIN-SHORTEST-PATH depth
  (a pair whose shortest path is shorter than ``m`` is excluded,
  even if a longer path also exists) — this intentionally differs
  from the ``p/p`` sequence sugar, which counts ANY path of that
  exact length; the window semantics match the kg_path closure and
  its recursive-CTE oracle
- path alternation ``p1|p2`` (optionally parenthesized, usable
  inside a sequence as ``(p1|p2)/p3``): alternatives are single
  constant predicates with UNIFORM inversion — executed as ONE
  pred-IN-SET scan, no union explosion
- ``BIND(const-or-?var AS ?new)``: constant / variable-copy
  projection (general expressions are not in the subset)
- ``FILTER EXISTS { ... }`` / ``FILTER NOT EXISTS { ... }`` over a
  plain pattern group: distributed semi/anti join on the shared
  variables (a null shared binding fails EXISTS and survives NOT
  EXISTS — hash-join semantics, documented in bgp_match)
- FILTER subset: ``=  !=  <  <=  >  >=`` on ``?var`` vs a string /
  number / IRI / other ``?var`` (lexicographic over term strings, the
  algebra's documented semantics), ``regex(?v, "re")``,
  ``contains(?v, "s")``, ``bound(?v)``, ``!bound(?v)``,
  ``lang(?v) = "en"`` / ``datatype(?v) = <iri>`` (and ``!=`` — read
  the store's obj_lang/obj_dt term-metadata columns at the scans
  binding ``?v`` in object position; untyped rows carry ``""``),
  combined with ``&&``, ``||`` and parentheses (lang()/datatype()
  cannot sit inside a ``||`` — scan-level vs row-level evaluation)

NOT supported (documented, explicit errors): nested OPTIONAL groups,
subqueries, SERVICE, general BIND expressions, property paths beyond
``^`` ``/`` ``|`` and the bounded quantifiers (no ``*``, no unbounded
``+`` — use the programmatic path algebra, stages/bfs), language-tagged
/ datatype-suffixed literal TERMS (the store matches on lexical forms;
constrain obj_lang/obj_dt with the lang()/datatype() FILTER accessors
instead), blank nodes in query position.

CONSTRUCT templates are QUAD templates: every template triple must sit
inside a ``GRAPH`` block (the store is named-graph shaped; this is the
TriG/SPARQL-Update quads syntax).  A quoted-literal template object
emits a literal triple; a variable object defaults to IRI-kind
(bindings carry no term kind — same contract as bgp_construct).
"""

from __future__ import annotations

import re

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
# p+ depth bound (SPARQL's + is unbounded; a bounded closure is the
# scale-safe subset this engine documents — same bound style as
# stages/bfs.path_pairs and the kg_path oracle)
PLUS_MAX_DEPTH = 3


class SparqlSyntaxError(ValueError):
    """Query text outside the documented SPARQL subset."""


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRI><[^<>"{}|^`\\\s]*>)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z_0-9]*)
  | (?P<STRING>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<PNAME>[A-Za-z_][A-Za-z_0-9.-]*?:[A-Za-z_0-9.%-]*|:[A-Za-z_0-9.%-]*)
  | (?P<NAME>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<OP><=|>=|!=|&&|\|\||\^\^|[{}().;,*=<>!|/^+])
    """,
    re.VERBOSE,
)

_STR_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(body: str) -> str:
    out = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        if i + 1 >= len(body):
            raise SparqlSyntaxError("dangling backslash in literal")
        nxt = body[i + 1]
        if nxt in _STR_ESCAPES:
            out.append(_STR_ESCAPES[nxt])
            i += 2
        elif nxt in ("u", "U"):
            width = 4 if nxt == "u" else 8
            hexs = body[i + 2:i + 2 + width]
            if len(hexs) != width or any(
                c not in "0123456789abcdefABCDEF" for c in hexs
            ):
                raise SparqlSyntaxError(
                    f"\\{nxt} escape needs {width} hex digits"
                )
            out.append(chr(int(hexs, 16)))
            i += 2 + width
        else:
            raise SparqlSyntaxError(f"unknown escape \\{nxt}")
    return "".join(out)


def _int(val: str, what: str) -> int:
    try:
        return int(val)
    except ValueError:
        raise SparqlSyntaxError(f"{what} needs an integer, got {val!r}")


def tokenize(text: str) -> list[tuple[str, str]]:
    tokens = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise SparqlSyntaxError(
                f"unexpected character {text[pos]!r} at offset {pos}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        tokens.append((kind, m.group()))
    tokens.append(("EOF", ""))
    return tokens


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_KEYWORDS = {
    "prefix", "base", "select", "ask", "construct", "describe", "where",
    "distinct", "optional", "filter", "values", "minus", "union",
    "graph", "order", "by", "asc", "desc", "limit", "offset", "group",
    "count", "min", "max", "as", "undef", "regex", "contains", "bound",
    "a", "true", "false", "bind", "exists", "not", "lang", "datatype",
}

_UNSUPPORTED = {
    "service": "SERVICE",
    "reduced": "REDUCED", "from": "FROM", "having": "HAVING",
    "insert": "SPARQL Update", "delete": "SPARQL Update",
}

_SCAN_OPS = ("lang==", "lang!=", "dt==", "dt!=")


class _Var(str):
    """Marker: a term that is a variable (holds the bare name)."""


class _Lit(str):
    """Marker: a term that is a quoted literal (holds the value)."""


class _Parser:
    def __init__(self, text: str) -> None:
        self.toks = tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self._fresh = 0

    # -- token helpers ----------------------------------------------------

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, word: str) -> bool:
        kind, val = self.peek()
        return kind == "NAME" and val.lower() == word

    def eat_kw(self, word: str) -> bool:
        if self.at_kw(word):
            self.next()
            return True
        return False

    def expect_kw(self, word: str) -> None:
        if not self.eat_kw(word):
            raise SparqlSyntaxError(
                f"expected {word.upper()}, got {self.peek()[1]!r}"
            )

    def at_op(self, op: str) -> bool:
        kind, val = self.peek()
        return kind == "OP" and val == op

    def eat_op(self, op: str) -> bool:
        if self.at_op(op):
            self.next()
            return True
        return False

    def expect_op(self, op: str) -> None:
        if not self.eat_op(op):
            raise SparqlSyntaxError(
                f"expected {op!r}, got {self.peek()[1]!r}"
            )

    def _reject_unsupported(self) -> None:
        kind, val = self.peek()
        if kind == "NAME" and val.lower() in _UNSUPPORTED:
            raise SparqlSyntaxError(
                f"{_UNSUPPORTED[val.lower()]} is outside the supported "
                f"SPARQL subset (see stages/sparql.py docstring)"
            )

    def fresh_var(self) -> str:
        self._fresh += 1
        return f"__seq{self._fresh}"

    # -- terms ------------------------------------------------------------

    def _resolve_iri(self, body: str) -> str:
        if self.base is not None and "://" not in body:
            from twine_ray.functions.urls import resolve_iri

            return resolve_iri(self.base, body)
        return body

    def _expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(f"undeclared prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def parse_term(self, *, allow_var=True):
        """IRI / prefixed name / 'a' / variable / literal / number."""
        kind, val = self.peek()
        if kind == "IRI":
            self.next()
            return self._resolve_iri(val[1:-1])
        if kind == "PNAME":
            self.next()
            return self._expand_pname(val)
        if kind == "VAR":
            if not allow_var:
                raise SparqlSyntaxError(f"variable {val} not allowed here")
            self.next()
            return _Var(val[1:])
        if kind == "STRING":
            self.next()
            lit = _unescape(val[1:-1])
            nk, nv = self.peek()
            if nk == "LANGTAG" or (nk == "OP" and nv == "^^"):
                raise SparqlSyntaxError(
                    "language-tagged / datatyped literal terms are not "
                    "in the subset (the store matches lexical forms; "
                    "constrain obj_lang/obj_dt with FILTER(lang(?v) = "
                    "\"en\") / FILTER(datatype(?v) = <iri>) instead)"
                )
            return _Lit(lit)
        if kind == "NUMBER":
            self.next()
            return _Lit(val)
        if kind == "NAME":
            low = val.lower()
            if low == "a":
                self.next()
                return RDF_TYPE
            if low in ("true", "false"):
                self.next()
                return _Lit(low)
            if low == "undef":
                self.next()
                return None
        raise SparqlSyntaxError(f"expected a term, got {val!r}")

    def _path_member(self):
        """One alternation member: ['^'] constant predicate."""
        inverted = self.eat_op("^")
        term = self.parse_term()
        if isinstance(term, _Var):
            raise SparqlSyntaxError(
                "path alternation needs constant predicates"
            )
        if isinstance(term, _Lit):
            raise SparqlSyntaxError("literal predicates are invalid")
        return str(term), inverted

    def _collapse_alt(self, preds):
        """Alternation members -> ONE pred-IN-SET step (uniform
        inversion required — mixed directions cannot share a scan)."""
        if len({inv for _, inv in preds}) > 1:
            raise SparqlSyntaxError(
                "path alternation members must share inversion "
                "(all ^-inverted or none) in the subset"
            )
        inverted = preds[0][1]
        if len(preds) == 1:
            return preds[0][0], inverted
        return tuple(sorted({p for p, _ in preds})), inverted

    def parse_predicate_path(self):
        """Predicate position: iri | 'a' | ?var | ^elt | elt/elt... |
        alternation ``p1|p2`` / ``(p1|p2)`` — alternatives are single
        constant predicates with uniform inversion, collapsed into ONE
        pred-IN-SET step (one scan, no union explosion; usable inside
        a sequence as ``(p1|p2)/p3``) — with an optional trailing
        quantifier ``+`` / ``{m,n}`` on a single plain step.  Returns
        (steps, quant): steps = [(pred_or_tuple_or_var, inverted)...];
        quant = None or (min_hops, max_hops)."""
        steps = []
        quant = None
        while True:
            if self.at_op("("):
                self.next()
                preds = [self._path_member()]
                while self.eat_op("|"):
                    preds.append(self._path_member())
                self.expect_op(")")
                steps.append(self._collapse_alt(preds))
                if self.at_op("+") or self.at_op("{"):
                    raise SparqlSyntaxError(
                        "a quantifier on a parenthesized path is not "
                        "in the subset"
                    )
            else:
                inverted = self.eat_op("^")
                kind, val = self.peek()
                if inverted and kind == "OP" and val == "(":
                    raise SparqlSyntaxError(
                        "invert alternation members individually: "
                        "(^a|^b), not ^(a|b)"
                    )
                if kind == "OP" and val in ("*", "?"):
                    raise SparqlSyntaxError(
                        f"property-path operator {val!r} is not in the "
                        "text subset (use the programmatic path "
                        "algebra, stages/bfs)"
                    )
                term = self.parse_term()
                if self.at_op("|"):
                    # bare alternation — lowest-precedence in SPARQL,
                    # so it must own the whole path here (sequence
                    # alternatives need parentheses in the subset)
                    if steps:
                        raise SparqlSyntaxError(
                            "alternation of path sequences needs "
                            "parentheses: (a|b)/c"
                        )
                    if isinstance(term, _Var):
                        raise SparqlSyntaxError(
                            "path alternation needs constant predicates"
                        )
                    if isinstance(term, _Lit):
                        raise SparqlSyntaxError(
                            "literal predicates are invalid"
                        )
                    preds = [(str(term), inverted)]
                    while self.eat_op("|"):
                        preds.append(self._path_member())
                    if self.at_op("/"):
                        raise SparqlSyntaxError(
                            "alternation of path sequences needs "
                            "parentheses: a|b/c is not in the subset; "
                            "(a|b)/c is"
                        )
                    steps.append(self._collapse_alt(preds))
                    if self.at_op("+") or self.at_op("{"):
                        raise SparqlSyntaxError(
                            "a quantifier on an alternation is not in "
                            "the subset"
                        )
                    break
                steps.append((term, inverted))
                if self.eat_op("+"):
                    quant = (1, PLUS_MAX_DEPTH)
                elif self.at_op("{"):
                    self.next()
                    kind, val = self.next()
                    if kind != "NUMBER":
                        raise SparqlSyntaxError(
                            "path {m,n} needs integers"
                        )
                    m = _int(val, "path {m,n}")
                    n = m
                    if self.eat_op(","):
                        kind, val = self.next()
                        if kind != "NUMBER":
                            raise SparqlSyntaxError(
                                "path {m,n} needs integers"
                            )
                        n = _int(val, "path {m,n}")
                    self.expect_op("}")
                    if m < 1 or n < m:
                        raise SparqlSyntaxError(
                            "path {m,n} needs 1 <= m <= n (zero-length "
                            "paths are not in the subset)"
                        )
                    quant = (m, n)
                if quant is not None:
                    if len(steps) > 1 or self.at_op("/"):
                        raise SparqlSyntaxError(
                            "a path quantifier applies to a single "
                            "step only (no sequence mixing in the "
                            "subset)"
                        )
                    break
            if not self.eat_op("/"):
                break
        return steps, quant

    # -- prologue ---------------------------------------------------------

    def parse_prologue(self) -> None:
        while True:
            if self.at_kw("prefix"):
                self.next()
                kind, val = self.next()
                if kind != "PNAME" or not val.endswith(":"):
                    raise SparqlSyntaxError(
                        f"PREFIX needs 'name:', got {val!r}"
                    )
                ikind, ival = self.next()
                if ikind != "IRI":
                    raise SparqlSyntaxError(
                        f"PREFIX needs an <iri>, got {ival!r}"
                    )
                self.prefixes[val[:-1]] = ival[1:-1]
            elif self.at_kw("base"):
                self.next()
                ikind, ival = self.next()
                if ikind != "IRI":
                    raise SparqlSyntaxError("BASE needs an <iri>")
                self.base = ival[1:-1]
            else:
                return

    # -- group graph pattern ----------------------------------------------

    def parse_group(self, *, allow_compound=True,
                    opt_depth=2) -> dict:
        """{ ... } -> dict(patterns, optional, filters, values, minus,
        union_groups).  ``allow_compound=False`` (inner groups) refuses
        nested MINUS/UNION/VALUES/BIND — the documented subset.
        ``opt_depth`` bounds OPTIONAL nesting: 2 at the top level, so
        ``OPTIONAL { A OPTIONAL { B } }`` parses (one level — the
        leftjoin(outer, leftjoin(A, B)) shape the algebra executes)
        but deeper nesting is refused."""
        self.expect_op("{")
        out = {"patterns": [], "optional": [], "filters": [],
               "values": None, "minus": None, "union_groups": None,
               "path_quants": [], "binds": [], "exists": [],
               "not_exists": []}

        # { A } UNION { B } form: group starts with a nested brace
        if self.at_op("{") and allow_compound:
            groups = [self.parse_group(allow_compound=False)]
            while self.at_kw("union"):
                self.next()
                groups.append(self.parse_group(allow_compound=False))
            self.expect_op("}")
            for g in groups:
                if g["path_quants"]:
                    raise SparqlSyntaxError(
                        "quantified paths combine only with a plain "
                        "top-level group in the subset"
                    )
            if len(groups) == 1:
                # plain nested group — flatten
                inner = groups[0]
                out["patterns"] = inner["patterns"]
                out["filters"] = inner["filters"]
                return out
            out["union_groups"] = [
                {"patterns": g["patterns"], "filters": g["filters"]}
                for g in groups
            ]
            return out

        while not self.at_op("}"):
            self._reject_unsupported()
            if self.at_kw("optional"):
                if opt_depth <= 0:
                    raise SparqlSyntaxError(
                        "OPTIONAL nests at most one level in the "
                        "subset (OPTIONAL { A OPTIONAL { B } })"
                    )
                self.next()
                inner = self.parse_group(allow_compound=False,
                                         opt_depth=opt_depth - 1)
                if inner["path_quants"]:
                    raise SparqlSyntaxError(
                        "quantified paths inside OPTIONAL are not in "
                        "the subset"
                    )
                if any(self._spec_has_scan_op(f)
                       for f in inner["filters"]):
                    raise SparqlSyntaxError(
                        "lang()/datatype() inside OPTIONAL is not "
                        "in the subset"
                    )
                if not inner["patterns"]:
                    raise SparqlSyntaxError(
                        "an OPTIONAL group needs at least one pattern"
                    )
                if inner["optional"]:
                    # nested OPTIONAL (one level): the inner group is
                    # its own leftjoin — forwarded whole
                    out["optional"].append({
                        "patterns": inner["patterns"],
                        "filters": inner["filters"],
                        "optional": inner["optional"],
                    })
                elif len(inner["patterns"]) > 1:
                    # grouped OPTIONAL: the inner patterns join FIRST,
                    # then one left join (SPARQL OPTIONAL { a . b }
                    # semantics — stages/query.py 'group' entries)
                    out["optional"].append({
                        "patterns": inner["patterns"],
                        "filters": inner["filters"],
                    })
                elif inner["filters"]:
                    # single pattern with an OPTIONAL-scoped FILTER:
                    # the filter reads only the pattern's own
                    # variables (there leftjoin(A, filter(F, B)) ==
                    # leftjoin(A, B, F) exactly; the algebra
                    # pre-filters the optional binding set)
                    out["optional"].append({
                        "pattern": inner["patterns"][0],
                        "filters": inner["filters"],
                    })
                else:
                    out["optional"].extend(inner["patterns"])
            elif self.at_kw("minus"):
                if not allow_compound:
                    raise SparqlSyntaxError(
                        "nested MINUS groups are not in the subset"
                    )
                if out["minus"] is not None:
                    raise SparqlSyntaxError(
                        "at most one MINUS group is supported"
                    )
                self.next()
                inner = self.parse_group(allow_compound=False)
                if inner["path_quants"]:
                    raise SparqlSyntaxError(
                        "quantified paths inside MINUS are not in the "
                        "subset"
                    )
                out["minus"] = inner["patterns"]
            elif self.at_kw("filter"):
                self.next()
                if self.at_kw("exists") or self.at_kw("not"):
                    neg = self.eat_kw("not")
                    self.expect_kw("exists")
                    if not allow_compound:
                        raise SparqlSyntaxError(
                            "FILTER (NOT) EXISTS inside a nested group "
                            "is not in the subset"
                        )
                    inner = self.parse_group(allow_compound=False)
                    if inner["path_quants"]:
                        raise SparqlSyntaxError(
                            "quantified paths inside EXISTS are not "
                            "in the subset"
                        )
                    if any(self._spec_has_scan_op(f)
                           for f in inner["filters"]):
                        raise SparqlSyntaxError(
                            "lang()/datatype() inside EXISTS is not "
                            "in the subset"
                        )
                    key = "not_exists" if neg else "exists"
                    # filters read the INNER group's own variables
                    # (non-correlated — checked at execution)
                    out[key].append({
                        "patterns": inner["patterns"],
                        "filters": inner["filters"],
                    })
                else:
                    out["filters"].extend(self.parse_filter())
            elif self.at_kw("bind"):
                if not allow_compound:
                    raise SparqlSyntaxError(
                        "BIND inside a nested group is not in the "
                        "subset"
                    )
                self.next()
                self.expect_op("(")
                term = self.parse_term()
                self.expect_kw("as")
                var = self._expect_var()
                self.expect_op(")")
                if term is None:
                    raise SparqlSyntaxError(
                        "BIND needs a constant or ?variable expression"
                    )
                src = f"?{term}" if isinstance(term, _Var) else str(term)
                out["binds"].append((var, src))
            elif self.at_kw("values"):
                if not allow_compound:
                    raise SparqlSyntaxError(
                        "VALUES inside a nested group is not in the "
                        "subset"
                    )
                self.next()
                rows = self.parse_values()
                if out["values"] is not None:
                    raise SparqlSyntaxError("one VALUES block only")
                out["values"] = rows
            elif self.at_kw("graph"):
                self.next()
                gterm = self.parse_term()
                inner = self.parse_group(allow_compound=False)
                if inner["filters"]:
                    raise SparqlSyntaxError(
                        "FILTER inside GRAPH is not in the subset"
                    )
                if inner["path_quants"]:
                    raise SparqlSyntaxError(
                        "quantified paths inside GRAPH blocks are not "
                        "in the subset (quads scope the whole closure)"
                    )
                for p in inner["patterns"]:
                    if len(p) != 3:
                        raise SparqlSyntaxError(
                            "nested GRAPH blocks are not in the subset"
                        )
                    out["patterns"].append((gterm,) + p)
            else:
                pats, quants = self.parse_triples_block()
                out["patterns"].extend(pats)
                out["path_quants"].extend(quants)
            self.eat_op(".")
        self.expect_op("}")
        return out

    def parse_triples_block(self):
        """subject (predicate objectList (';' predicate objectList)*)
        with '/' and '^' path sugar rewritten to fresh variables.
        Returns (patterns, quant_paths): quantified-path triples are
        returned separately as (subj, pred, obj, inverted, m, n)."""
        subj = self.parse_term()
        if isinstance(subj, _Lit):
            raise SparqlSyntaxError("literal subjects are invalid")
        patterns = []
        quants = []
        while True:
            steps, quant = self.parse_predicate_path()
            objects = [self.parse_term()]
            while self.eat_op(","):
                objects.append(self.parse_term())
            for obj in objects:
                if quant is not None:
                    pred, inverted = steps[0]
                    if isinstance(pred, _Var):
                        raise SparqlSyntaxError(
                            "quantified paths need a constant predicate"
                        )
                    quants.append(
                        (subj, pred, obj, inverted) + quant
                    )
                else:
                    patterns.extend(self._expand_path(subj, steps, obj))
            if not self.eat_op(";"):
                break
            if self.at_op(".") or self.at_op("}"):  # trailing ';'
                break
        return patterns, quants

    def _expand_path(self, subj, steps, obj) -> list[tuple]:
        """(subj, [step...], obj) -> triple patterns; sequences thread
        fresh variables, ^ swaps the endpoints of its step."""
        pats = []
        cur = subj
        for n, (pred, inverted) in enumerate(steps):
            if isinstance(pred, _Lit):
                raise SparqlSyntaxError("literal predicates are invalid")
            last = n == len(steps) - 1
            nxt = obj if last else _Var(self.fresh_var())
            s, o = (nxt, cur) if inverted else (cur, nxt)
            pats.append((s, pred, o))
            cur = nxt
        return pats

    # -- FILTER -----------------------------------------------------------

    def parse_filter(self) -> list[tuple]:
        """FILTER body -> list of algebra filter specs: ``&&`` becomes
        multiple ``(var, op, value)`` specs, ``||`` becomes ONE
        ``("or", [conjunction, ...])`` spec (the _compile_filters
        disjunction form); parentheses group freely."""
        if self.at_op("("):
            self.next()
            specs = self._filter_or()
            self.expect_op(")")
            return specs
        return [self._filter_atom()]

    def _filter_or(self) -> list[tuple]:
        """conj ('||' conj)* -> conjunction spec list (single-conj
        case) or one ("or", [conj...]) spec."""
        conjs = [self._filter_and()]
        while self.eat_op("||"):
            conjs.append(self._filter_and())
        if len(conjs) == 1:
            return conjs[0]
        for conj in conjs:
            for atom in conj:
                if self._spec_has_scan_op(atom):
                    raise SparqlSyntaxError(
                        "lang()/datatype() accessors cannot appear "
                        "inside a || disjunction (they evaluate at "
                        "the pattern scans, not on the bindings)"
                    )
        return [("or", conjs)]

    def _filter_and(self) -> list[tuple]:
        specs = [self._filter_atom()]
        while self.eat_op("&&"):
            specs.append(self._filter_atom())
        return specs

    @staticmethod
    def _spec_has_scan_op(spec) -> bool:
        if spec[0] == "or":
            return any(
                _Parser._spec_has_scan_op(a)
                for conj in spec[1] for a in conj
            )
        return spec[1] in _SCAN_OPS

    def _filter_atom(self) -> tuple:
        if self.eat_op("("):
            specs = self._filter_or()
            self.expect_op(")")
            if len(specs) == 1:
                return specs[0]
            # a parenthesized conjunction as one atom: an OR of a
            # single conjunction is exactly AND
            return ("or", [specs])
        if self.eat_op("!"):
            self.expect_kw("bound")
            self.expect_op("(")
            var = self._expect_var()
            self.expect_op(")")
            return (var, "!bound")
        if self.at_kw("bound"):
            self.next()
            self.expect_op("(")
            var = self._expect_var()
            self.expect_op(")")
            return (var, "bound")
        if self.at_kw("regex") or self.at_kw("contains"):
            fn = self.next()[1].lower()
            self.expect_op("(")
            var = self._expect_var()
            self.expect_op(",")
            kind, val = self.next()
            if kind != "STRING":
                raise SparqlSyntaxError(f"{fn} needs a string argument")
            self.expect_op(")")
            return (var, fn, _unescape(val[1:-1]))
        if self.at_kw("lang") or self.at_kw("datatype"):
            fn = self.next()[1].lower()
            self.expect_op("(")
            var = self._expect_var()
            self.expect_op(")")
            kind, opval = self.next()
            if kind != "OP" or opval not in ("=", "!="):
                raise SparqlSyntaxError(
                    f"{fn}() supports = and != comparisons only"
                )
            kind, val = self.peek()
            if fn == "lang":
                if kind != "STRING":
                    raise SparqlSyntaxError(
                        'lang() compares to a string ("en"; "" matches '
                        "untyped / IRI rows)"
                    )
                self.next()
                value = _unescape(val[1:-1])
            else:
                if kind == "IRI":
                    self.next()
                    value = self._resolve_iri(val[1:-1])
                elif kind == "PNAME":
                    self.next()
                    value = self._expand_pname(val)
                elif kind == "STRING":
                    self.next()
                    value = _unescape(val[1:-1])
                else:
                    raise SparqlSyntaxError(
                        "datatype() compares to an IRI or a string"
                    )
            op = ("lang" if fn == "lang" else "dt") + \
                ("==" if opval == "=" else "!=")
            return (var, op, value)
        var = self._expect_var()
        kind, opval = self.next()
        ops = {"=": "==", "!=": "!=", "<": "<", "<=": "<=",
               ">": ">", ">=": ">="}
        if kind != "OP" or opval not in ops:
            raise SparqlSyntaxError(
                f"unsupported FILTER operator {opval!r}"
            )
        rhs = self.parse_term()
        if isinstance(rhs, _Var):
            rhs = f"?{rhs}"
        else:
            rhs = str(rhs)
        return (var, ops[opval], rhs)

    def _expect_var(self) -> str:
        kind, val = self.next()
        if kind != "VAR":
            raise SparqlSyntaxError(f"expected a ?variable, got {val!r}")
        return val[1:]

    # -- VALUES -----------------------------------------------------------

    def parse_values(self) -> list[dict]:
        kind, val = self.peek()
        if kind == "VAR":  # single-var short form
            var = self._expect_var()
            self.expect_op("{")
            rows = []
            while not self.at_op("}"):
                term = self.parse_term(allow_var=False)
                rows.append({var: None if term is None else str(term)})
            self.expect_op("}")
            return rows
        self.expect_op("(")
        names = []
        while not self.at_op(")"):
            names.append(self._expect_var())
        self.next()
        self.expect_op("{")
        rows = []
        while not self.at_op("}"):
            self.expect_op("(")
            row = {}
            for name in names:
                term = self.parse_term(allow_var=False)
                row[name] = None if term is None else str(term)
            self.expect_op(")")
            rows.append(row)
        self.expect_op("}")
        return rows

    # -- solution modifiers -------------------------------------------------

    def parse_modifiers(self) -> dict:
        out = {"order_by": None, "limit": None, "offset": 0,
               "group_by": None}
        while True:
            if self.at_kw("group"):
                self.next()
                self.expect_kw("by")
                gvars = []
                while self.peek()[0] == "VAR":
                    gvars.append(self._expect_var())
                if not gvars:
                    raise SparqlSyntaxError("GROUP BY needs variables")
                out["group_by"] = gvars
            elif self.at_kw("order"):
                self.next()
                self.expect_kw("by")
                keys = []
                while True:
                    if self.at_kw("desc") or self.at_kw("asc"):
                        d = self.next()[1].lower()
                        self.expect_op("(")
                        keys.append((self._expect_var(), d))
                        self.expect_op(")")
                    elif self.peek()[0] == "VAR":
                        keys.append((self._expect_var(), "asc"))
                    else:
                        break
                if not keys:
                    raise SparqlSyntaxError("ORDER BY needs keys")
                out["order_by"] = keys
            elif self.at_kw("limit"):
                self.next()
                kind, val = self.next()
                if kind != "NUMBER":
                    raise SparqlSyntaxError("LIMIT needs an integer")
                out["limit"] = _int(val, "LIMIT")
            elif self.at_kw("offset"):
                self.next()
                kind, val = self.next()
                if kind != "NUMBER":
                    raise SparqlSyntaxError("OFFSET needs an integer")
                out["offset"] = _int(val, "OFFSET")
            else:
                self._reject_unsupported()
                if self.peek()[0] != "EOF":
                    raise SparqlSyntaxError(
                        f"unexpected trailing input: {self.peek()[1]!r}"
                    )
                return out

    # -- query forms --------------------------------------------------------

    def parse_query(self) -> dict:
        self.parse_prologue()
        if self.at_kw("select"):
            return self._parse_select()
        if self.at_kw("ask"):
            self.next()
            self.eat_kw("where")
            group = self.parse_group()
            if group["minus"] or group["path_quants"]:
                raise SparqlSyntaxError(
                    "ASK over MINUS/quantified paths is not in the "
                    "subset"
                )
            if self.peek()[0] != "EOF":
                raise SparqlSyntaxError("trailing input after ASK group")
            return {"form": "ask", "group": group}
        if self.at_kw("construct"):
            self.next()
            template = self._parse_construct_template()
            self.expect_kw("where")
            group = self.parse_group()
            if group["union_groups"] or group["minus"] or \
                    group["values"] or group["path_quants"]:
                raise SparqlSyntaxError(
                    "CONSTRUCT over UNION/MINUS/VALUES/quantified "
                    "paths is not in the subset"
                )
            if self.peek()[0] != "EOF":
                raise SparqlSyntaxError("trailing input after CONSTRUCT")
            return {"form": "construct", "group": group,
                    "template": template}
        if self.at_kw("describe"):
            self.next()
            iris = []
            while self.peek()[0] != "EOF":
                term = self.parse_term(allow_var=False)
                if not isinstance(term, str) or isinstance(term, _Lit):
                    raise SparqlSyntaxError("DESCRIBE needs IRIs")
                iris.append(str(term))
            if not iris:
                raise SparqlSyntaxError(
                    "DESCRIBE needs at least one IRI"
                )
            return {"form": "describe", "iris": iris}
        self._reject_unsupported()
        raise SparqlSyntaxError(
            f"expected SELECT/ASK/CONSTRUCT/DESCRIBE, got "
            f"{self.peek()[1]!r}"
        )

    def _parse_select(self) -> dict:
        self.expect_kw("select")
        distinct = self.eat_kw("distinct")
        select: list | None = []
        aggs: dict = {}
        if self.eat_op("*"):
            select = None
        else:
            while True:
                if self.peek()[0] == "VAR":
                    select.append(self._expect_var())
                elif self.at_op("("):
                    self.next()
                    name, spec = self._parse_agg()
                    self.expect_op(")")
                    aggs[name] = spec
                    select.append(name)
                else:
                    break
            if not select:
                raise SparqlSyntaxError("SELECT needs variables or *")
        self.eat_kw("where")
        group = self.parse_group()
        mods = self.parse_modifiers()
        if aggs and not mods["group_by"]:
            raise SparqlSyntaxError(
                "aggregates need GROUP BY in the subset"
            )
        if mods["group_by"] and not aggs:
            raise SparqlSyntaxError("GROUP BY needs aggregate selects")
        return {"form": "select", "group": group, "select": select,
                "distinct": distinct, "aggs": aggs, **mods}

    def _parse_agg(self) -> tuple[str, tuple]:
        kind, val = self.next()
        fn = val.lower() if kind == "NAME" else None
        if fn not in ("count", "min", "max"):
            raise SparqlSyntaxError(
                f"unsupported aggregate {val!r} (COUNT/MIN/MAX)"
            )
        self.expect_op("(")
        if fn == "count" and self.eat_op("*"):
            spec = ("count",)
        else:
            var = self._expect_var()
            spec = ("count_var", var) if fn == "count" else (fn, var)
        self.expect_op(")")
        self.expect_kw("as")
        name = self._expect_var()
        return name, spec

    def _parse_construct_template(self) -> list[tuple]:
        """Quad template: GRAPH blocks of triples.  Returns 5-tuples
        (graph, subj, pred, obj, obj_is_lit) for bgp_construct."""
        self.expect_op("{")
        entries: list[tuple] = []
        while not self.at_op("}"):
            if not self.eat_kw("graph"):
                raise SparqlSyntaxError(
                    "CONSTRUCT templates are quad templates here: wrap "
                    "triples in GRAPH <g>/?g { ... } (the store is "
                    "named-graph shaped)"
                )
            gterm = self.parse_term()
            self.expect_op("{")
            while not self.at_op("}"):
                pats, quants = self.parse_triples_block()
                if quants:
                    raise SparqlSyntaxError(
                        "quantified paths are not allowed in CONSTRUCT "
                        "templates"
                    )
                for s, p, o in pats:
                    if isinstance(p, tuple):
                        raise SparqlSyntaxError(
                            "path alternation is not allowed in "
                            "CONSTRUCT templates (a template names "
                            "ONE predicate)"
                        )
                    entries.append((gterm, s, p, o, isinstance(o, _Lit)))
                self.eat_op(".")
            self.expect_op("}")
            self.eat_op(".")
        self.expect_op("}")
        if not entries:
            raise SparqlSyntaxError("empty CONSTRUCT template")
        return entries


# ---------------------------------------------------------------------------
# Algebra mapping + execution
# ---------------------------------------------------------------------------


def _term_str(term):
    """Parser term -> bgp_* pattern term ('?name' for variables; a
    tuple is a pred-IN-SET alternation term, passed through)."""
    if term is None:
        return None
    if isinstance(term, _Var):
        return f"?{term}"
    if isinstance(term, tuple):
        return term
    return str(term)


def _pattern_tuples(patterns) -> list[tuple]:
    return [tuple(_term_str(t) for t in p) for p in patterns]


def _optional_entries(entries) -> list:
    """Optional-group entries -> bgp_match form: plain pattern tuples,
    or {"pattern": ..., "filters": [...]} for OPTIONAL-scoped
    filters."""
    out = []
    for e in entries:
        if isinstance(e, dict):
            if "patterns" in e:
                entry = {
                    "patterns": _pattern_tuples(e["patterns"]),
                    "filters": e["filters"],
                }
                if e.get("optional"):
                    entry["optional"] = _optional_entries(e["optional"])
                out.append(entry)
            else:
                out.append({
                    "pattern": tuple(
                        _term_str(t) for t in e["pattern"]
                    ),
                    "filters": e["filters"],
                })
        else:
            out.append(tuple(_term_str(t) for t in e))
    return out


def parse_sparql(text: str) -> dict:
    """Parse a query string into an algebra plan dict (driver-side)."""
    return _Parser(text).parse_query()


def _exec_path_quant(source, plan):
    """One quantified-path triple as the whole group: extract the
    predicate's edge set (bound-term-pruned over a store dir), run the
    bounded closure, filter to the [m, n] hop window, project.

    Two execution shapes (both from stages/bfs — the kg_path /
    sameAs-chain machinery):
    - ?x p+ ?y (both variables): all-pairs ``path_pairs``
    - <iri> p+ ?y / ?x p+ <iri> (one constant): SEEDED
      ``bfs_reachable`` — the entity-lookup shape; the constant end
      seeds the frontier (reversed edges when the object is bound)."""
    import pyarrow as pa

    from twine_ray.stages.bfs import bfs_reachable, path_pairs
    from twine_ray.stages.query import _apply_modifiers, match_triples

    group = plan["group"]
    if group["patterns"] or group["optional"] or group["filters"] or \
            group["values"] is not None or group["minus"] is not None \
            or group["binds"] or group["exists"] or \
            group["not_exists"] or len(group["path_quants"]) != 1 \
            or plan["aggs"]:
        raise SparqlSyntaxError(
            "a quantified path must be the SOLE pattern of the group "
            "(the subset — closures do not join with other patterns)"
        )
    subj, pred, obj, inverted, m, n = group["path_quants"][0]
    if isinstance(subj, _Lit) or isinstance(obj, _Lit):
        raise SparqlSyntaxError(
            "quantified-path endpoints must be ?variables or IRIs"
        )
    s_var, o_var = isinstance(subj, _Var), isinstance(obj, _Var)
    if not s_var and not o_var:
        raise SparqlSyntaxError(
            "at least one quantified-path endpoint must be a "
            "?variable in the subset"
        )
    if s_var and o_var and str(subj) == str(obj):
        raise SparqlSyntaxError(
            "quantified paths need distinct endpoint variables"
        )
    pred = str(pred)

    if isinstance(source, str):
        scan = match_triples(source, pred=pred)
    else:
        scan = source

    def _edges_fn(flip: bool):
        def _edges(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.equal(t["pred"], pred))
            u, v = ("obj", "subj") if flip else ("subj", "obj")
            return pa.table({"u": t[u], "v": t[v]})

        return _edges

    if s_var and o_var:
        svar, ovar = str(subj), str(obj)
        pairs = path_pairs(
            scan.map_batches(_edges_fn(inverted),
                             batch_format="pyarrow"),
            max_depth=n,
        )

        def _window(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.greater_equal(t["min_depth"], m))
            return pa.table({svar: t["start"], ovar: t["node"]})

        res = pairs.map_batches(_window, batch_format="pyarrow")
        bound_vars = [svar, ovar]
    else:
        # seeded closure: the constant end seeds the frontier; when
        # the OBJECT is the constant, walk the edges backwards
        if s_var:
            seed, var, flip = str(obj), str(subj), not inverted
        else:
            seed, var, flip = str(subj), str(obj), inverted
        reach = bfs_reachable(
            scan.map_batches(_edges_fn(flip), batch_format="pyarrow"),
            [seed], max_depth=n,
        )

        def _window1(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.greater_equal(t["min_depth"], m))
            return pa.table({var: t["node"]})

        res = reach.map_batches(_window1, batch_format="pyarrow")
        bound_vars = [var]

    out_vars = plan["select"] or bound_vars
    unknown = [v for v in out_vars if v not in bound_vars]
    if unknown:
        raise SparqlSyntaxError(
            f"select names unbound variables: {unknown}"
        )
    if plan["select"] is not None and plan["select"] != bound_vars:
        res = res.map_batches(
            lambda t, ov=tuple(out_vars): pa.table(
                {v: t[v] for v in ov}
            ),
            batch_format="pyarrow",
        )
    return _apply_modifiers(
        res, out_vars, distinct=plan["distinct"],
        order_by=plan["order_by"], limit=plan["limit"],
        offset=plan["offset"],
    )


def sparql_query(source, text: str):
    """Execute a SPARQL string of the documented subset over ``source``
    (a store directory or a triples Dataset).  Returns the Dataset the
    corresponding bgp_* algebra call returns — distributed execution,
    driver-side parsing only."""
    from twine_ray.stages.query import (
        bgp_aggregate,
        bgp_ask,
        bgp_construct,
        bgp_match,
        bgp_minus,
        bgp_union,
        describe_resource,
    )

    plan = parse_sparql(text)
    form = plan["form"]
    if form == "describe":
        # multiple resources: union of each one's concise bounded
        # description (block concatenation, no shuffle)
        res = describe_resource(source, plan["iris"][0])
        for iri in plan["iris"][1:]:
            res = res.union(describe_resource(source, iri))
        return res
    group = plan["group"]
    if group.get("path_quants"):
        if form != "select":
            raise SparqlSyntaxError(
                "quantified paths are SELECT-only in the subset"
            )
        return _exec_path_quant(source, plan)
    if form == "ask" and group["union_groups"] is not None:
        # ASK over UNION: any branch having a solution answers true —
        # limit(1) over the lazy union stream
        import pyarrow as pa
        import ray.data as rd

        res = bgp_union(source, [
            {"patterns": _pattern_tuples(g["patterns"]),
             "filters": g["filters"]}
            for g in group["union_groups"]
        ])
        n = res.limit(1).count()
        return rd.from_arrow(pa.table({"ask": pa.array([n > 0])}))
    patterns = _pattern_tuples(group["patterns"])
    optional = _optional_entries(group["optional"])
    binds = group["binds"]

    def _exists_entries(groups):
        out = []
        for g in groups:
            if isinstance(g, dict):
                out.append({
                    "patterns": _pattern_tuples(g["patterns"]),
                    "filters": g["filters"],
                })
            else:
                out.append(_pattern_tuples(g))
        return out

    exists = _exists_entries(group["exists"])
    not_exists = _exists_entries(group["not_exists"])
    if form == "ask":
        return bgp_ask(source, patterns, optional=optional,
                       filters=group["filters"], values=group["values"],
                       binds=binds, exists=exists,
                       not_exists=not_exists)
    if form == "construct":
        template = [
            tuple(_term_str(t) for t in e[:4]) + (e[4],)
            for e in plan["template"]
        ]
        return bgp_construct(source, patterns, template,
                             optional=optional, filters=group["filters"],
                             binds=binds, exists=exists,
                             not_exists=not_exists)
    # SELECT
    if group["union_groups"] is not None:
        if plan["aggs"] or group["optional"] or group["minus"] or \
                group["values"] or binds or exists or not_exists:
            raise SparqlSyntaxError(
                "UNION combines only with plain pattern groups in the "
                "subset"
            )
        from twine_ray.stages.query import _apply_modifiers

        res = bgp_union(
            source,
            [{"patterns": _pattern_tuples(g["patterns"]),
              "filters": g["filters"]} for g in group["union_groups"]],
            select=plan["select"],
        )
        out_vars = plan["select"] or list(res.schema().names)
        return _apply_modifiers(
            res, out_vars, distinct=plan["distinct"],
            order_by=plan["order_by"], limit=plan["limit"],
            offset=plan["offset"],
        )
    if plan["aggs"]:
        if group["minus"] is not None or group["values"] is not None:
            raise SparqlSyntaxError(
                "GROUP BY combines only with pattern/OPTIONAL/FILTER "
                "groups in the subset"
            )
        extra = [v for v in plan["select"]
                 if v not in plan["aggs"] and v not in plan["group_by"]]
        if extra:
            raise SparqlSyntaxError(
                f"non-grouped, non-aggregate selects: {extra}"
            )
        res = bgp_aggregate(
            source, patterns, plan["group_by"], plan["aggs"],
            optional=optional, filters=group["filters"],
            binds=binds, exists=exists, not_exists=not_exists,
        )
        if plan["distinct"] or plan["order_by"] or \
                plan["limit"] is not None:
            from twine_ray.stages.query import _apply_modifiers

            out_vars = list(res.schema().names)
            res = _apply_modifiers(
                res, out_vars, distinct=plan["distinct"],
                order_by=plan["order_by"], limit=plan["limit"],
                offset=plan["offset"],
            )
        return res
    if group["minus"] is not None:
        if group["values"] is not None or plan["distinct"] or \
                plan["order_by"] or plan["limit"] is not None:
            raise SparqlSyntaxError(
                "MINUS combines only with pattern/OPTIONAL/FILTER "
                "groups in the subset"
            )
        return bgp_minus(
            source, patterns, _pattern_tuples(group["minus"]),
            optional=optional, filters=group["filters"],
            binds=binds, exists=exists, not_exists=not_exists,
            select=plan["select"],
        )
    return bgp_match(
        source, patterns, select=plan["select"], optional=optional,
        filters=group["filters"], values=group["values"],
        binds=binds, exists=exists, not_exists=not_exists,
        distinct=plan["distinct"], order_by=plan["order_by"],
        limit=plan["limit"], offset=plan["offset"],
    )
