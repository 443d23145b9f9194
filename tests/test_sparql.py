"""SPARQL text front-end (stages/sparql.py): parser unit tests plus
execution parity against the programmatic BGP algebra it maps onto."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from twine_ray.stages.sparql import (
    SparqlSyntaxError,
    parse_sparql,
    sparql_query,
)

DC = "http://purl.org/dc/terms/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


# ---------------------------------------------------------------------------
# Parser (driver-side, no Ray)
# ---------------------------------------------------------------------------


def _pats(plan):
    return [tuple(str(t) for t in p) for p in plan["group"]["patterns"]]


def test_parse_prefixes_and_terms():
    plan = parse_sparql(
        f'PREFIX dc: <{DC}> SELECT ?s WHERE {{ ?s dc:title "T" }}'
    )
    assert plan["form"] == "select"
    assert _pats(plan) == [("s", f"{DC}title", "T")]
    assert plan["select"] == ["s"]


def test_parse_a_keyword_and_graph_block():
    plan = parse_sparql(
        "SELECT ?g ?s WHERE { GRAPH ?g { ?s a <http://x/T> } }"
    )
    assert _pats(plan) == [("g", "s", RDF_TYPE, "http://x/T")]


def test_parse_base_resolution():
    plan = parse_sparql(
        "BASE <http://a/b/c/> SELECT ?s WHERE { ?s <../p> <g> }"
    )
    assert _pats(plan) == [("s", "http://a/b/p", "http://a/b/c/g")]


def test_parse_predicate_object_lists():
    plan = parse_sparql(
        'SELECT * WHERE { ?s <http://p> "a", "b" ; <http://q> "c" . }'
    )
    assert _pats(plan) == [
        ("s", "http://p", "a"),
        ("s", "http://p", "b"),
        ("s", "http://q", "c"),
    ]


def test_parse_path_sugar():
    plan = parse_sparql(
        "SELECT ?x ?y WHERE { ?x <http://p>/<http://q> ?y . "
        "?u ^<http://r> ?v }"
    )
    pats = _pats(plan)
    mid = pats[0][2]
    assert pats[0] == ("x", "http://p", mid)
    assert pats[1] == (mid, "http://q", "y")
    assert pats[2] == ("v", "http://r", "u")  # ^ swaps endpoints


def test_parse_string_escapes():
    plan = parse_sparql(
        r'SELECT ?s WHERE { ?s <http://p> "a\tbA" }'
    )
    assert _pats(plan)[0][2] == "a\tbA"


def test_parse_filters():
    plan = parse_sparql(
        'SELECT ?s WHERE { ?s <http://p> ?v . '
        'FILTER(?v != "x" && bound(?v)) FILTER regex(?v, "^a") }'
    )
    assert plan["group"]["filters"] == [
        ("v", "!=", "x"), ("v", "bound"), ("v", "regex", "^a"),
    ]


def test_parse_values_forms():
    one = parse_sparql(
        'SELECT ?s WHERE { ?s <http://p> ?v . VALUES ?v { "a" "b" } }'
    )
    assert one["group"]["values"] == [{"v": "a"}, {"v": "b"}]
    multi = parse_sparql(
        "SELECT ?a ?b WHERE { ?a <http://p> ?b . "
        'VALUES (?a ?b) { (<http://s> "x") (UNDEF "y") } }'
    )
    assert multi["group"]["values"] == [
        {"a": "http://s", "b": "x"}, {"a": None, "b": "y"},
    ]


def test_parse_modifiers_and_aggregates():
    plan = parse_sparql(
        "SELECT DISTINCT ?v WHERE { ?s <http://p> ?v } "
        "ORDER BY DESC(?v) ?s LIMIT 7 OFFSET 2"
    )
    assert plan["distinct"] and plan["limit"] == 7
    assert plan["offset"] == 2
    assert plan["order_by"] == [("v", "desc"), ("s", "asc")]
    agg = parse_sparql(
        "SELECT ?k (COUNT(*) AS ?n) (COUNT(?v) AS ?m) (MIN(?v) AS ?lo) "
        "WHERE { ?s <http://k> ?k . ?s <http://p> ?v } GROUP BY ?k"
    )
    assert agg["aggs"] == {
        "n": ("count",), "m": ("count_var", "v"), "lo": ("min", "v"),
    }
    assert agg["group_by"] == ["k"]


@pytest.mark.parametrize("bad", [
    "SELECT ?x WHERE { ?x ?p ?o . BIND(concat(?x) AS ?y) }",  # expr
    "SELECT ?x WHERE { OPTIONAL { ?x ?p ?o BIND(1 AS ?y) } }",
    "SELECT ?x WHERE { OPTIONAL { ?x ?p ?o "
    "FILTER EXISTS { ?x ?p ?o } } }",
    "SELECT ?x WHERE { ?x ?p ?o FILTER EXISTS { ?x <q> ?w "
    'FILTER(lang(?w) = "en") } }',
    'SELECT ?x WHERE { ?x ?p ?o . '
    'FILTER(lang(?o) = "en" || ?x = "b") }',
    'SELECT ?x WHERE { ?x ?p ?o . FILTER(lang(?o) < "en") }',
    "SELECT ?x WHERE { OPTIONAL { OPTIONAL { ?x ?p ?o } } }",
    'SELECT ?x WHERE { ?x <http://p> "lit"^^<http://dt> }',
    'SELECT ?x WHERE { ?x <http://p> "lit"@en }',
    "SELECT ?x WHERE { ?x <http://p>|?q ?y }",  # var alternative
    "SELECT ?x WHERE { ?x (<http://p>|^<http://q>) ?y }",  # mixed ^
    "SELECT ?x WHERE { ?x ^(<http://p>|<http://q>) ?y }",
    "SELECT ?x WHERE { ?x (<http://p>|<http://q>)+ ?y }",
    "SELECT ?x WHERE { ?x <http://p>|<http://q>/<http://r> ?y }",
    "SELECT ?x WHERE { ?x <http://p>* ?y }",
    "SELECT (COUNT(*) AS ?n) WHERE { ?x ?p ?o }",  # agg, no GROUP BY
    "SELECT ?x WHERE { ?x ?p ?o } HAVING (?x > 1)",
    'CONSTRUCT { ?s <http://p> ?o } WHERE { ?s <http://p> ?o }',  # no GRAPH
    'CONSTRUCT { GRAPH <g> { ?s <http://p>|<http://q> ?o } } '
    'WHERE { ?s <http://p> ?o }',
    "ASK { { ?a ?p ?o } MINUS { ?b ?p ?o } }",
    "DESCRIBE ?x",
])
def test_parse_rejects_outside_subset(bad):
    with pytest.raises(SparqlSyntaxError):
        parse_sparql(bad)


def test_parse_filter_disjunction_and_groups():
    plan = parse_sparql(
        'SELECT ?x WHERE { ?x <http://p> ?o '
        'FILTER(?o = "a" && ?o != "b" || ?x > "c") }'
    )
    assert plan["group"]["filters"] == [
        ("or", [[("o", "==", "a"), ("o", "!=", "b")],
                [("x", ">", "c")]]),
    ]
    # parenthesized conjunction as one atom inside a disjunction
    plan = parse_sparql(
        'SELECT ?x WHERE { ?x <http://p> ?o '
        'FILTER((?o = "a" && ?o != "b") || bound(?x)) }'
    )
    assert plan["group"]["filters"] == [
        ("or", [[("or", [[("o", "==", "a"), ("o", "!=", "b")]])],
                [("x", "bound")]]),
    ]
    # pure conjunction stays a flat spec list
    plan = parse_sparql(
        'SELECT ?x WHERE { ?x <http://p> ?o '
        'FILTER(?o = "a" && (?o != "b")) }'
    )
    assert plan["group"]["filters"] == [
        ("o", "==", "a"), ("o", "!=", "b"),
    ]


def test_parse_lang_datatype_accessors():
    plan = parse_sparql(
        'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> '
        'SELECT ?o WHERE { ?s <http://p> ?o '
        'FILTER(lang(?o) = "en" && datatype(?o) != xsd:integer) }'
    )
    assert plan["group"]["filters"] == [
        ("o", "lang==", "en"),
        ("o", "dt!=", "http://www.w3.org/2001/XMLSchema#integer"),
    ]


def test_parse_bind_and_exists():
    plan = parse_sparql(
        'SELECT ?x ?y WHERE { ?x <http://p> ?o '
        'BIND("c" AS ?y) BIND(?x AS ?z) '
        'FILTER EXISTS { ?x <http://q> ?w } '
        'FILTER NOT EXISTS { ?x <http://r> ?w2 } }'
    )
    g = plan["group"]
    assert g["binds"] == [("y", "c"), ("z", "?x")]
    # inner-group patterns hold raw parser terms (variables compare
    # equal to their bare names)
    assert g["exists"] == [
        {"patterns": [("x", "http://q", "w")], "filters": []},
    ]
    assert g["not_exists"] == [
        {"patterns": [("x", "http://r", "w2")], "filters": []},
    ]
    # FILTER inside EXISTS (non-correlated)
    plan = parse_sparql(
        'SELECT ?x WHERE { ?x <http://p> ?o '
        'FILTER EXISTS { ?x <http://q> ?w FILTER(?w > "3") } }'
    )
    assert plan["group"]["exists"] == [
        {"patterns": [("x", "http://q", "w")],
         "filters": [("w", ">", "3")]},
    ]


def test_parse_path_alternation():
    plan = parse_sparql(
        "SELECT ?s ?o WHERE { ?s <http://p>|<http://q> ?o }"
    )
    assert plan["group"]["patterns"] == [
        ("s", ("http://p", "http://q"), "o"),
    ]
    # parenthesized, inside a sequence, and inverted members
    plan = parse_sparql(
        "SELECT ?s ?o WHERE { ?s (<http://p>|<http://q>)/<http://r> ?o }"
    )
    pats = plan["group"]["patterns"]
    assert pats[0][1] == ("http://p", "http://q")
    assert pats[1][1] == "http://r"
    assert str(pats[0][2]) == str(pats[1][0])  # threaded fresh var
    plan = parse_sparql(
        "SELECT ?s ?o WHERE { ?s (^<http://p>|^<http://q>) ?o }"
    )
    # uniform inversion swaps the endpoints
    assert plan["group"]["patterns"] == [
        ("o", ("http://p", "http://q"), "s"),
    ]


# ---------------------------------------------------------------------------
# Execution parity vs the programmatic algebra
# ---------------------------------------------------------------------------


def _triples_ds(rows):
    import ray.data as rd

    n = len(rows["graph"])
    rows.setdefault("obj_is_lit", [True] * n)
    rows.setdefault("obj_dt", [""] * n)
    rows.setdefault("obj_lang", [""] * n)
    rows.setdefault("score", [1] * n)
    return rd.from_pandas(pd.DataFrame(rows))


def _canon(res):
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture()
def langs_ds(ray_session):
    return _triples_ds({
        "graph": ["g1", "g1", "g2", "g2", "g3"],
        "subj":  ["s1", "s1", "s2", "s2", "s3"],
        "pred":  ["lang", "title", "lang", "title", "lang"],
        "obj":   ["en", "T1", "fr", "T2", "en"],
    })


def test_select_join_matches_bgp_match(langs_ds):
    from twine_ray.stages.query import bgp_match

    text = sparql_query(langs_ds, '''SELECT ?g ?t WHERE {
        GRAPH ?g { ?s <lang> "en" . ?s <title> ?t } }''')
    prog = bgp_match(langs_ds, [
        ("?g", "?s", "lang", "en"), ("?g", "?s", "title", "?t"),
    ], select=["g", "t"])
    pd.testing.assert_frame_equal(_canon(text), _canon(prog))


def test_optional_filter_values_roundtrip(langs_ds):
    got = _canon(sparql_query(langs_ds, '''SELECT ?g ?lang ?t WHERE {
        GRAPH ?g { ?s <lang> ?lang }
        OPTIONAL { GRAPH ?g { ?s <title> ?t } }
        FILTER(bound(?t))
        VALUES ?lang { "en" "fr" } }'''))
    assert list(got["g"]) == ["g1", "g2"]
    assert list(got["t"]) == ["T1", "T2"]


def test_optional_unmatched_keeps_null(langs_ds):
    got = _canon(sparql_query(langs_ds, '''SELECT ?g ?t WHERE {
        GRAPH ?g { ?s <lang> "en" }
        OPTIONAL { GRAPH ?g { ?s <title> ?t } } }'''))
    assert len(got) == 2
    assert got["t"].isna().sum() == 1  # g3 has no title


def test_modifiers(langs_ds):
    got = sparql_query(langs_ds, '''SELECT DISTINCT ?lang WHERE {
        GRAPH ?g { ?s <lang> ?lang } } ORDER BY DESC(?lang) LIMIT 1''')
    assert _canon(got)["lang"].tolist() == ["fr"]
    off = sparql_query(langs_ds, '''SELECT DISTINCT ?lang WHERE {
        GRAPH ?g { ?s <lang> ?lang } }
        ORDER BY ?lang LIMIT 5 OFFSET 1''')
    assert _canon(off)["lang"].tolist() == ["fr"]


def test_union_and_minus(langs_ds):
    u = _canon(sparql_query(langs_ds, '''SELECT ?g ?v WHERE {
        { GRAPH ?g { ?s <title> ?v } } UNION
        { GRAPH ?g { ?s <lang> ?v } } }'''))
    assert len(u) == 5
    m = _canon(sparql_query(langs_ds, '''SELECT ?g ?t WHERE {
        GRAPH ?g { ?s <title> ?t }
        MINUS { GRAPH ?g { ?s2 <lang> "en" } } }'''))
    assert list(m["g"]) == ["g2"]  # g1 is English


def test_ask(langs_ds):
    yes = sparql_query(langs_ds, 'ASK { GRAPH ?g { ?s <lang> "en" } }')
    no = sparql_query(langs_ds, 'ASK { GRAPH ?g { ?s <lang> "zz" } }')
    assert yes.take_all()[0]["ask"] is True
    assert no.take_all()[0]["ask"] is False


def test_aggregate(langs_ds):
    got = _canon(sparql_query(langs_ds, '''
        SELECT ?lang (COUNT(*) AS ?n) (COUNT(?t) AS ?titled)
        WHERE { GRAPH ?g { ?s <lang> ?lang }
                OPTIONAL { GRAPH ?g { ?s <title> ?t } } }
        GROUP BY ?lang'''))
    en = got[got["lang"] == "en"].iloc[0]
    assert en["n"] == 2 and en["titled"] == 1


def test_construct(langs_ds):
    out = sparql_query(langs_ds, '''CONSTRUCT {
        GRAPH ?g { ?s <hasLang> ?lang } }
        WHERE { GRAPH ?g { ?s <lang> ?lang } }''').to_pandas()
    assert len(out) == 3
    assert set(out["pred"]) == {"hasLang"}
    assert not out["obj_is_lit"].any()  # var obj -> IRI kind
    lit = sparql_query(langs_ds, '''CONSTRUCT {
        GRAPH ?g { ?s <mark> "yes" } }
        WHERE { GRAPH ?g { ?s <lang> "en" } }''').to_pandas()
    assert lit["obj_is_lit"].all()


def test_describe_dataset_source(langs_ds):
    out = sparql_query(langs_ds, "DESCRIBE <s1>").to_pandas()
    assert set(out["pred"]) == {"lang", "title"}


# ---------------------------------------------------------------------------
# CLI over a real store
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_store(tmp_path_factory, ray_session):
    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import synth_pages_dataset

    out = str(tmp_path_factory.mktemp("sparql_store") / "kg")
    run_kg_pipeline(synth_pages_dataset(12, concurrency=2), out,
                    default_alias_rows(), num_buckets=4, concurrency=2,
                    resume=False)
    return os.path.join(out, "store")


def test_cli_sparql_select(small_store, ray_session, capsys):
    from twine_ray.cli import main

    rc = main([
        "sparql", small_store,
        f'PREFIX dc: <{DC}> SELECT ?g ?t WHERE '
        '{ GRAPH ?g { ?s dc:title ?t } } ORDER BY ?g LIMIT 3',
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0].split("\t") == ["g", "t"]
    assert len(lines) == 4


def test_cli_sparql_ask_and_errors(small_store, ray_session, capsys):
    from twine_ray.cli import main

    rc = main([
        "sparql", small_store,
        f'PREFIX dc: <{DC}> ASK {{ GRAPH ?g {{ ?s dc:title ?t }} }}',
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "true"
    rc = main([
        "sparql", small_store,
        'ASK { GRAPH ?g { ?s <http://no.example/p> "never" } }',
    ])
    assert rc == 1
    assert capsys.readouterr().out.strip() == "false"
    rc = main(["sparql", small_store, "SELECT BOGUS"])
    assert rc == 2


# ---------------------------------------------------------------------------
# Quantified paths (p+ / p{m,n} -> stages/bfs.path_pairs)
# ---------------------------------------------------------------------------


def test_parse_path_quantifiers():
    plan = parse_sparql("SELECT ?x ?y WHERE { ?x <http://e>+ ?y }")
    assert plan["group"]["path_quants"] == [
        ("x", "http://e", "y", False, 1, 3)
    ]
    plan = parse_sparql("SELECT ?x ?y WHERE { ?x <http://e>{2,3} ?y }")
    assert plan["group"]["path_quants"][0][4:] == (2, 3)
    plan = parse_sparql("SELECT ?x ?y WHERE { ?x ^<http://e>{1,1} ?y }")
    assert plan["group"]["path_quants"][0][3] is True


@pytest.mark.parametrize("bad", [
    "SELECT ?x WHERE { ?x <http://e>* ?y }",
    "SELECT ?x WHERE { ?x <http://e>+/<http://f> ?y }",
    "SELECT ?x WHERE { ?x <http://e>{0,2} ?y }",
    "SELECT ?x WHERE { ?x <http://e>{3,2} ?y }",
    "SELECT ?x WHERE { OPTIONAL { ?x <http://e>+ ?y } }",
    "ASK { ?x <http://e>+ ?y }",
    "SELECT ?x WHERE { ?x ?p+ ?y }",
])
def test_parse_path_quantifier_rejects(bad):
    with pytest.raises(SparqlSyntaxError):
        parse_sparql(bad)


def test_path_quant_execution_matches_manual_closure(ray_session):
    # chain a -> b -> c -> d -> e plus a shortcut a -> c
    ds = _triples_ds({
        "graph": ["g"] * 5,
        "subj":  ["a", "b", "c", "d", "a"],
        "pred":  ["e"] * 5,
        "obj":   ["b", "c", "d", "e", "c"],
        "obj_is_lit": [False] * 5,
    })
    two = _canon(sparql_query(
        ds, "SELECT ?x ?y WHERE { ?x <e>{1,2} ?y }"
    ))
    got = set(zip(two["x"], two["y"]))
    assert got == {
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c"),
        ("a", "d"), ("b", "d"), ("c", "e"),
    }
    # exactly-two-hops window (min_depth >= 2): shortcut a->c is 1 hop
    ex2 = _canon(sparql_query(
        ds, "SELECT ?x ?y WHERE { ?x <e>{2,2} ?y }"
    ))
    assert set(zip(ex2["x"], ex2["y"])) == {
        ("a", "d"), ("b", "d"), ("c", "e"),
    }
    # inverse closure swaps every pair
    inv = _canon(sparql_query(
        ds, "SELECT ?x ?y WHERE { ?x ^<e>{1,2} ?y }"
    ))
    assert set(zip(inv["y"], inv["x"])) == got
    # p+ is depth-bounded at 3 (documented)
    plus = _canon(sparql_query(
        ds, "SELECT ?x ?y WHERE { ?x <e>+ ?y }"
    ))
    assert ("a", "e") in set(zip(plus["x"], plus["y"]))  # 3 hops via a->c
    # modifiers compose
    lim = sparql_query(
        ds, "SELECT DISTINCT ?y WHERE { ?x <e>{1,2} ?y } "
            "ORDER BY ?y LIMIT 2"
    )
    assert _canon(lim)["y"].tolist() == ["b", "c"]


def test_path_quant_seeded_closure(ray_session):
    """Constant-endpoint quantified paths run the SEEDED closure
    (bfs_reachable): <iri> p+ ?y walks forward, ?x p+ <iri> walks the
    reversed edges; inverse composes."""
    ds = _triples_ds({
        "graph": ["g"] * 5,
        "subj":  ["a", "b", "c", "d", "a"],
        "pred":  ["e"] * 5,
        "obj":   ["b", "c", "d", "e", "c"],
        "obj_is_lit": [False] * 5,
    })
    fwd = _canon(sparql_query(ds, "SELECT ?y WHERE { <a> <e>+ ?y }"))
    assert set(fwd["y"]) == {"b", "c", "d", "e"}  # depth <= 3
    w2 = _canon(sparql_query(ds, "SELECT ?y WHERE { <a> <e>{2,2} ?y }"))
    assert set(w2["y"]) == {"d"}  # c is 1 hop via the shortcut
    back = _canon(sparql_query(ds, "SELECT ?x WHERE { ?x <e>{1,2} <d> }"))
    assert set(back["x"]) == {"c", "b", "a"}  # a via the a->c shortcut
    inv = _canon(sparql_query(ds, "SELECT ?y WHERE { <d> ^<e>{1,2} ?y }"))
    assert set(inv["y"]) == set(back["x"])
    both_const = "SELECT ?x WHERE { <a> <e>+ <d> }"
    with pytest.raises(SparqlSyntaxError):
        parse_sparql(both_const) and sparql_query(ds, both_const)


def test_aggregate_with_modifiers(langs_ds):
    """ORDER BY / LIMIT / OFFSET compose over GROUP BY; aggregate int
    columns survive the bounded offset slice with their types."""
    got = _canon(sparql_query(langs_ds, '''
        SELECT ?lang (COUNT(*) AS ?n)
        WHERE { GRAPH ?g { ?s <lang> ?lang } }
        GROUP BY ?lang ORDER BY DESC(?n) ?lang LIMIT 1'''))
    assert got["lang"].tolist() == ["en"] and got["n"].tolist() == [2]
    off = sparql_query(langs_ds, '''
        SELECT ?lang (COUNT(*) AS ?n)
        WHERE { GRAPH ?g { ?s <lang> ?lang } }
        GROUP BY ?lang ORDER BY ?lang LIMIT 5 OFFSET 1''').to_pandas()
    assert off["lang"].tolist() == ["fr"]
    assert off["n"].dtype.kind == "i"  # int64 preserved through offset


def test_cli_sparql_explain(small_store, ray_session, capsys):
    import json as _json

    from twine_ray.cli import main

    rc = main([
        "sparql", small_store,
        "SELECT ?x ?y WHERE { ?x <http://e>+ ?y }", "--explain",
    ])
    assert rc == 0
    plan = _json.loads(capsys.readouterr().out)
    assert plan["form"] == "select"
    assert plan["group"]["path_quants"][0][:3] == ["x", "http://e", "y"]


def test_cli_stats(small_store, ray_session, capsys):
    import json as _json

    from twine_ray.cli import main

    rc = main(["stats", small_store])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["manifest"]["num_buckets"] == 4
    assert out["rows"] > 0 and out["buckets"] > 0
    assert main(["stats", "/tmp/definitely-not-a-store"]) == 2


# ---------------------------------------------------------------------------
# Parser totality: any input either parses or raises SparqlSyntaxError
# ---------------------------------------------------------------------------


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_FUZZ_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " ?<>{}()\".;,+*^/|!=&@#:_-\\\n\t'"
)


@settings(max_examples=400, deadline=None)
@given(st.text(alphabet=_FUZZ_ALPHABET, max_size=80))
def test_parser_total(s):
    """The parser never raises anything but SparqlSyntaxError — no
    bare ValueError/IndexError escapes on malformed input."""
    try:
        parse_sparql(s)
    except SparqlSyntaxError:
        pass


@pytest.mark.parametrize("bad", [
    "SELECT ?x WHERE { ?x <p> ?y } LIMIT 1.5",
    "SELECT ?x WHERE { ?x <p> ?y } OFFSET 2e1",
    "SELECT ?x WHERE { ?x <p>{1.5,2} ?y }",
    r'SELECT ?x WHERE { ?x <p> "a\u12" }',  # short \u escape
])
def test_parser_numeric_and_escape_rejects(bad):
    with pytest.raises(SparqlSyntaxError):
        parse_sparql(bad)


# ---------------------------------------------------------------------------
# Round-5 constructs: || / lang()/datatype() / BIND / EXISTS / alternation
# ---------------------------------------------------------------------------


@pytest.fixture()
def meta_ds(ray_session):
    """Triples with term metadata: names carry language tags, ages a
    datatype; p1/p2/p3 link IRIs."""
    return _triples_ds({
        "graph": ["g"] * 8,
        "subj":  ["s1", "s2", "s3", "s1", "s2", "s1", "s2", "s3"],
        "pred":  ["name", "name", "name", "age", "age",
                  "p1", "p2", "p3"],
        "obj":   ["Anna", "Berta", "Cora", "30", "40",
                  "o1", "o2", "o1"],
        "obj_is_lit": [True] * 5 + [False] * 3,
        "obj_lang": ["en", "de", "", "", "", "", "", ""],
        "obj_dt": ["", "", "",
                   "http://www.w3.org/2001/XMLSchema#integer",
                   "http://www.w3.org/2001/XMLSchema#integer",
                   "", "", ""],
    })


def test_filter_disjunction_execution(meta_ds):
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?n WHERE {
        ?s <name> ?n FILTER(?n = "Anna" || ?n >= "C") }'''))
    assert list(got["n"]) == ["Anna", "Cora"]
    # || with && conjuncts on both sides
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?n WHERE {
        ?s <name> ?n
        FILTER(?n = "Anna" && ?s = "s1" || ?n = "Berta" && ?s = "s2")
        }'''))
    assert list(got["n"]) == ["Anna", "Berta"]
    # disjunction over two different variables (not pushable to one
    # pattern) still filters the joined solutions
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?n ?a WHERE {
        ?s <name> ?n . ?s <age> ?a
        FILTER(?n = "Berta" || ?a = "30") }'''))
    assert sorted(zip(got["n"], got["a"])) == [
        ("Anna", "30"), ("Berta", "40"),
    ]


def test_lang_datatype_accessor_execution(meta_ds):
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?n WHERE {
        ?s <name> ?n FILTER(lang(?n) = "en") }'''))
    assert list(got["n"]) == ["Anna"]
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?n WHERE {
        ?s <name> ?n FILTER(lang(?n) != "") }'''))
    assert list(got["n"]) == ["Anna", "Berta"]
    got = _canon(sparql_query(meta_ds, '''
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?s ?a WHERE {
            ?s <age> ?a FILTER(datatype(?a) = xsd:integer) }'''))
    assert list(got["a"]) == ["30", "40"]
    # metadata constrains only the pattern binding the var in object
    # position; joins keep working
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?n ?a WHERE {
        ?s <name> ?n . ?s <age> ?a
        FILTER(lang(?n) = "de") }'''))
    assert list(got["n"]) == ["Berta"]


def test_lang_accessor_needs_object_position(meta_ds):
    with pytest.raises(ValueError, match="object position"):
        sparql_query(meta_ds, '''SELECT ?s WHERE {
            ?s <name> ?n FILTER(lang(?s) = "en") }''').to_pandas()


def test_bind_execution(meta_ds):
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?k WHERE {
        ?s <name> ?n BIND("const" AS ?k) }'''))
    assert set(got["k"]) == {"const"}
    assert len(got) == 3
    # variable copy + filter on the bound variable
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?copy WHERE {
        ?s <name> ?n BIND(?n AS ?copy) FILTER(?copy = "Cora") }'''))
    assert list(got["copy"]) == ["Cora"]
    assert list(got["s"]) == ["s3"]


def test_exists_not_exists_execution(meta_ds):
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?n WHERE {
        ?s <name> ?n FILTER EXISTS { ?s <age> ?a } }'''))
    assert list(got["n"]) == ["Anna", "Berta"]
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?n WHERE {
        ?s <name> ?n FILTER NOT EXISTS { ?s <age> ?a } }'''))
    assert list(got["n"]) == ["Cora"]
    # no shared variables: the inner group is an ASK guard
    got = _canon(sparql_query(meta_ds, '''SELECT ?s WHERE {
        ?s <name> ?n FILTER EXISTS { ?x <p1> ?y } }'''))
    assert len(got) == 3
    got = _canon(sparql_query(meta_ds, '''SELECT ?s WHERE {
        ?s <name> ?n FILTER NOT EXISTS { ?x <zzz> ?y } }'''))
    assert len(got) == 3
    got = _canon(sparql_query(meta_ds, '''SELECT ?s WHERE {
        ?s <name> ?n FILTER NOT EXISTS { ?x <p1> ?y } }'''))
    assert len(got) == 0


def test_not_exists_null_shared_binding_survives(meta_ds):
    """An unmatched-OPTIONAL null never matches an inner solution:
    hash-join semantics (documented in bgp_match)."""
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?a WHERE {
        ?s <name> ?n OPTIONAL { ?s <age> ?a }
        FILTER NOT EXISTS { ?x <p2> ?a } }'''))
    # s2's age "40"? inner binds ?a to p2-objects {o2}; ages never
    # match; null (s3) survives too
    assert len(got) == 3


def test_path_alternation_execution(meta_ds):
    from twine_ray.stages.query import bgp_match

    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?o WHERE {
        ?s <p1>|<p3> ?o }'''))
    want = _canon(bgp_match(
        meta_ds, [(None, "?s", ("p1", "p3"), "?o")],
        select=["s", "o"],
    ))
    pd.testing.assert_frame_equal(got, want)
    assert sorted(zip(got["s"], got["o"])) == [
        ("s1", "o1"), ("s3", "o1"),
    ]
    # equals the UNION of the single-predicate scans
    u = _canon(sparql_query(meta_ds, '''SELECT ?s ?o WHERE {
        { ?s <p1> ?o } UNION { ?s <p3> ?o } }'''))
    pd.testing.assert_frame_equal(got, u)
    # inverted alternation swaps endpoints; sequence threading works
    inv = _canon(sparql_query(meta_ds, '''SELECT ?o ?s WHERE {
        ?o (^<p1>|^<p3>) ?s }'''))
    assert sorted(zip(inv["s"], inv["o"])) == [
        ("s1", "o1"), ("s3", "o1"),
    ]


def test_optional_scoped_filter(meta_ds):
    """FILTER inside OPTIONAL pre-filters the optional side: a
    solution whose optional match fails the filter keeps its row with
    a NULL binding (leftjoin(A, filter(F, B)) semantics)."""
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?n ?a WHERE {
        ?s <name> ?n
        OPTIONAL { ?s <age> ?a FILTER(?a > "35") } }'''))
    rows = {s: a for s, a in zip(got["s"], got["a"])}
    assert len(got) == 3
    assert rows["s2"] == "40"
    assert pd.isna(rows["s1"])  # age 30 fails the filter -> null
    assert pd.isna(rows["s3"])  # no age at all -> null
    # filter referencing an outer-only variable is refused
    with pytest.raises(ValueError, match="own variables"):
        sparql_query(meta_ds, '''SELECT ?s WHERE {
            ?s <name> ?n
            OPTIONAL { ?s <age> ?a FILTER(?n = "Anna") } }''').to_pandas()


def test_grouped_optional(meta_ds):
    """OPTIONAL { a . b }: the inner patterns join FIRST, then ONE
    left join — a solution binds the group's variables all-or-nothing
    (SPARQL semantics; a flattened per-pattern form would bind ?a for
    s2 even though s2 has no <p1>)."""
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?a ?o WHERE {
        ?s <name> ?n
        OPTIONAL { ?s <age> ?a . ?s <p1> ?o } }'''))
    rows = {s: (a, o) for s, a, o in zip(got["s"], got["a"], got["o"])}
    assert len(got) == 3
    assert rows["s1"] == ("30", "o1")  # both inner patterns match
    assert pd.isna(rows["s2"][0]) and pd.isna(rows["s2"][1])  # no p1
    assert pd.isna(rows["s3"][0]) and pd.isna(rows["s3"][1])
    # grouped OPTIONAL with a scoped filter
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?a ?o WHERE {
        ?s <name> ?n
        OPTIONAL { ?s <age> ?a . ?s <p1> ?o FILTER(?a > "20") } }'''))
    rows = {s: (a, o) for s, a, o in zip(got["s"], got["a"], got["o"])}
    assert rows["s1"] == ("30", "o1")
    assert pd.isna(rows["s2"][0])


def test_exists_with_inner_filter(meta_ds):
    """FILTER inside EXISTS constrains the inner group (non-correlated
    — the filter reads the inner group's own variables)."""
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?n WHERE {
        ?s <name> ?n
        FILTER EXISTS { ?s <age> ?a FILTER(?a > "35") } }'''))
    assert list(got["n"]) == ["Berta"]  # only s2's age 40 passes
    got = _canon(sparql_query(meta_ds, '''SELECT ?s ?n WHERE {
        ?s <name> ?n
        FILTER NOT EXISTS { ?s <age> ?a FILTER(?a > "35") } }'''))
    assert list(got["n"]) == ["Anna", "Cora"]


def test_ask_over_union(meta_ds):
    yes = sparql_query(meta_ds, """ASK {
        { ?s <zzz> ?o } UNION { ?s <p1> ?o } }""")
    no = sparql_query(meta_ds, """ASK {
        { ?s <zzz> ?o } UNION { ?s <yyy> ?o } }""")
    assert yes.take_all()[0]["ask"] is True
    assert no.take_all()[0]["ask"] is False


def test_describe_multiple_iris(meta_ds):
    one = _canon(sparql_query(meta_ds, "DESCRIBE <s1>"))
    two = _canon(sparql_query(meta_ds, "DESCRIBE <s1> <s2>"))
    assert len(two) > len(one)
    assert set(two["subj"]) >= {"s1", "s2"}
    plan = parse_sparql("DESCRIBE <s1> <s2>")
    assert plan["iris"] == ["s1", "s2"]


def test_nested_optional_one_level(ray_session):
    """OPTIONAL { A OPTIONAL { B } } = leftjoin(outer, leftjoin(A, B)):
    the inner group computes its own left join first."""
    ds = _triples_ds({
        "graph": ["g"] * 6,
        "subj":  ["r1", "r2", "r3", "r1", "r2", "l1"],
        "pred":  ["name", "name", "name", "link", "link", "sub"],
        "obj":   ["A", "B", "C", "l1", "l2", "x1"],
        "obj_is_lit": [True, True, True, False, False, True],
    })
    got = _canon(sparql_query(ds, '''SELECT ?r ?l ?x WHERE {
        ?r <name> ?n
        OPTIONAL { ?r <link> ?l OPTIONAL { ?l <sub> ?x } } }'''))
    rows = {r: (l, x) for r, l, x in zip(got["r"], got["l"], got["x"])}
    assert len(got) == 3
    assert rows["r1"] == ("l1", "x1")
    assert rows["r2"][0] == "l2" and pd.isna(rows["r2"][1])
    assert pd.isna(rows["r3"][0]) and pd.isna(rows["r3"][1])
    # deeper nesting is refused
    with pytest.raises(SparqlSyntaxError, match="one level"):
        parse_sparql('''SELECT ?r WHERE { ?r <name> ?n
            OPTIONAL { ?r <a> ?b OPTIONAL { ?b <c> ?d
            OPTIONAL { ?d <e> ?f } } } }''')
