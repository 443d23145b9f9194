"""Triple-pattern read surface (stages/query.py — the SPARQL GET /
lookup analog over the partitioned store)."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import synth_pages_dataset

    out = str(tmp_path_factory.mktemp("qstore") / "kg")
    run_kg_pipeline(synth_pages_dataset(30, concurrency=2), out,
                    default_alias_rows(), num_buckets=8, concurrency=2,
                    resume=False)
    return os.path.join(out, "store")


def _full(store_dir):
    from twine_ray.stages.materialize import read_triple_store

    return read_triple_store(store_dir).drop_columns(
        ["graph_bucket"]
    ).to_pandas()


def _canon(df):
    return (
        df.sort_values(list(df.columns))
        .reset_index(drop=True)
    )


def test_read_graph_equals_full_filter(store, ray_session):
    import pandas as pd

    from twine_ray.stages.query import read_graph

    full = _full(store)
    graphs = sorted(set(full["graph"]))[:5]
    for g in graphs:
        got = _canon(read_graph(store, g).to_pandas())
        want = _canon(full[full["graph"] == g])
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)]
        )
        assert len(got) > 0


def test_read_graph_prunes_to_one_partition(store):
    from twine_ray.functions.ids import bucket_of
    from twine_ray.stages.query import (
        _partition_files,
        _store_num_buckets,
    )

    n = _store_num_buckets(store)
    assert n == 8
    g = "http://site0.example/page/0"
    files = _partition_files(store, bucket_of(g, n))
    all_files = _partition_files(store, None)
    assert files and len(files) < len(all_files)
    part = f"graph_bucket={bucket_of(g, n)}"
    assert all(part in f for f in files)


def test_match_triples_patterns(store, ray_session):
    import pandas as pd

    from twine_ray.stages.query import match_triples
    from twine_ray.state.rulebase import DC_TITLE, SCHEMA_MENTIONS

    full = _full(store)

    got = _canon(match_triples(store, pred=DC_TITLE).to_pandas())
    want = _canon(full[full["pred"] == DC_TITLE])
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )

    # bound (graph, pred) pair
    g = want["graph"].iloc[0]
    got2 = _canon(match_triples(store, graph=g, pred=DC_TITLE).to_pandas())
    want2 = _canon(full[(full["graph"] == g) & (full["pred"] == DC_TITLE)])
    pd.testing.assert_frame_equal(
        got2[sorted(got2.columns)], want2[sorted(want2.columns)]
    )

    # bound object (entity lookup direction) + column projection
    ment = full[full["pred"] == SCHEMA_MENTIONS]
    assert len(ment) > 0
    o = ment["obj"].iloc[0]
    got3 = match_triples(store, pred=SCHEMA_MENTIONS, obj=o,
                         columns=["graph", "subj", "pred", "obj"]).to_pandas()
    assert set(got3.columns) == {"graph", "subj", "pred", "obj"}
    assert (got3["obj"] == o).all()
    assert len(got3) == (ment["obj"] == o).sum()


def test_match_triples_unbound_is_full_store(store, ray_session):
    from twine_ray.stages.query import match_triples

    assert match_triples(store).count() == len(_full(store))


def test_missing_manifest_raises(tmp_path):
    from twine_ray.stages.query import match_triples

    with pytest.raises(ValueError, match="manifest"):
        match_triples(str(tmp_path), graph="http://x")


def test_cli_get(store, ray_session, capsys):
    from twine_ray.cli import main
    from twine_ray.state.rulebase import DC_TITLE

    full = _full(store)
    g = sorted(set(full["graph"]))[0]
    assert main(["get", store, "--graph", g, "--pred", DC_TITLE]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    want = full[(full["graph"] == g) & (full["pred"] == DC_TITLE)]
    assert len(out) == len(want)
    assert all(f"<{g}>" in ln for ln in out)


def test_bgp_two_patterns_shared_vars(store, ray_session):
    """BGP over the store: graphs with BOTH a language and a title
    triple on the same subject — pandas merge is the expected value."""
    import pandas as pd

    from twine_ray.stages.query import bgp_match
    from twine_ray.state.rulebase import DC_LANGUAGE, DC_TITLE

    full = _full(store)
    got = _canon(bgp_match(store, [
        ("?g", "?s", DC_LANGUAGE, "?lang"),
        ("?g", "?s", DC_TITLE, "?title"),
    ], select=["g", "title", "lang"]).to_pandas())

    lg = full[full["pred"] == DC_LANGUAGE][["graph", "subj", "obj"]] \
        .rename(columns={"graph": "g", "subj": "s", "obj": "lang"})
    ti = full[full["pred"] == DC_TITLE][["graph", "subj", "obj"]] \
        .rename(columns={"graph": "g", "subj": "s", "obj": "title"})
    want = _canon(lg.merge(ti, on=["g", "s"])[["g", "title", "lang"]])
    pd.testing.assert_frame_equal(got, want)


def test_bgp_bound_object_and_dataset_source(store, ray_session):
    """Store-dir and Dataset sources agree; bound object filters."""
    from twine_ray.stages.materialize import read_triple_store
    from twine_ray.stages.query import bgp_match
    from twine_ray.state.rulebase import DC_LANGUAGE, DC_TITLE

    full = _full(store)
    lang = full[full["pred"] == DC_LANGUAGE]["obj"].iloc[0]
    pats = [
        ("?g", "?s", DC_LANGUAGE, lang),
        ("?g", "?s", DC_TITLE, "?title"),
    ]
    a = _canon(bgp_match(store, pats, select=["g", "title"]).to_pandas())
    ds = read_triple_store(store).drop_columns(["graph_bucket"])
    b = _canon(bgp_match(ds, pats, select=["g", "title"]).to_pandas())
    assert a.equals(b)
    assert len(a) > 0


def test_bgp_repeated_var_in_one_pattern(ray_session):
    """?x in two positions of ONE pattern binds only rows where the
    columns are equal (page graphs: graph == subj)."""
    import pandas as pd
    import ray.data as rd

    rows = pd.DataFrame(
        {
            "graph": ["g1", "g1", "g2"],
            "subj": ["g1", "e9", "g2"],
            "pred": ["p", "p", "p"],
            "obj": ["a", "b", "c"],
            "obj_is_lit": [True] * 3,
            "obj_dt": [""] * 3,
            "obj_lang": [""] * 3,
            "score": [1, 1, 1],
        }
    )
    from twine_ray.stages.query import bgp_match

    got = bgp_match(rd.from_pandas(rows), [("?x", "?x", "p", "?o")])
    df = got.to_pandas().sort_values("x").reset_index(drop=True)
    assert list(df["x"]) == ["g1", "g2"]
    assert list(df["o"]) == ["a", "c"]


def test_bgp_cartesian_and_empty(ray_session):
    import pandas as pd
    import ray.data as rd

    from twine_ray.stages.query import bgp_match

    rows = pd.DataFrame(
        {
            "graph": ["g1", "g2"],
            "subj": ["s1", "s2"],
            "pred": ["p", "q"],
            "obj": ["a", "b"],
            "obj_is_lit": [True] * 2,
            "obj_dt": [""] * 2,
            "obj_lang": [""] * 2,
            "score": [1, 1],
        }
    )
    ds = rd.from_pandas(rows)
    # no shared variable -> cartesian product (1 x 1)
    got = bgp_match(ds, [
        (None, "?a", "p", None), (None, "?b", "q", None),
    ]).to_pandas()
    assert len(got) == 1 and set(got.columns) == {"a", "b"}
    # unsatisfiable pattern -> empty with the right schema (Ray's
    # to_pandas drops columns on zero-row datasets, so check schema())
    got2 = bgp_match(ds, [
        (None, "?a", "nope", None), (None, "?b", "q", None),
    ])
    assert got2.count() == 0 and set(got2.schema().names) == {"a", "b"}


def _triples_ds(rows):
    import pandas as pd
    import ray.data as rd

    n = len(rows["graph"])
    rows.setdefault("obj_is_lit", [True] * n)
    rows.setdefault("obj_dt", [""] * n)
    rows.setdefault("obj_lang", [""] * n)
    rows.setdefault("score", [1] * n)
    return rd.from_pandas(pd.DataFrame(rows))


def test_bgp_optional_left_join(ray_session):
    """OPTIONAL semantics on a hand-built graph: matched solutions
    carry the optional bindings, unmatched keep ONE row with nulls,
    and m optional matches multiply the solution m times."""
    ds = _triples_ds({
        "graph": ["g"] * 6,
        "subj":  ["s1", "s2", "s3", "s1", "s3", "s3"],
        "pred":  ["lang", "lang", "lang", "title", "title", "title"],
        "obj":   ["en", "fr", "en", "T1", "T3a", "T3b"],
    })
    from twine_ray.stages.query import bgp_match

    got = bgp_match(
        ds, [(None, "?s", "lang", "?lang")],
        optional=[(None, "?s", "title", "?title")],
    ).to_pandas().sort_values(["s", "title"]).reset_index(drop=True)
    assert list(got["s"]) == ["s1", "s2", "s3", "s3"]
    assert list(got["lang"]) == ["en", "fr", "en", "en"]
    assert got["title"].iloc[0] == "T1"
    assert got["title"].isna().iloc[1]  # s2: no title -> null, row kept
    assert sorted(got["title"].iloc[2:4]) == ["T3a", "T3b"]


def test_bgp_optional_no_match_anywhere(ray_session):
    """An optional pattern matching NOTHING still appends its new
    variables as all-null string columns."""
    ds = _triples_ds({
        "graph": ["g"], "subj": ["s1"], "pred": ["lang"], "obj": ["en"],
    })
    from twine_ray.stages.query import bgp_match

    got = bgp_match(
        ds, [(None, "?s", "lang", "?lang")],
        optional=[(None, "?s", "nope", "?x")],
    )
    assert set(got.schema().names) == {"s", "lang", "x"}
    df = got.to_pandas()
    assert len(df) == 1 and df["x"].isna().all()


def test_bgp_optional_equals_pandas_left_merge(store, ray_session):
    """Store-backed parity: required lang pattern + optional title
    pattern equals a pandas left merge over the raw store."""
    import pandas as pd

    from twine_ray.stages.query import bgp_match
    from twine_ray.state.rulebase import DC_LANGUAGE, DC_TITLE

    full = _full(store)
    got = _canon(bgp_match(store, [
        ("?g", "?s", DC_LANGUAGE, "?lang"),
    ], optional=[
        ("?g", "?s", DC_TITLE, "?title"),
    ], select=["g", "lang", "title"]).to_pandas())

    lg = full[full["pred"] == DC_LANGUAGE][["graph", "subj", "obj"]] \
        .rename(columns={"graph": "g", "subj": "s", "obj": "lang"})
    ti = full[full["pred"] == DC_TITLE][["graph", "subj", "obj"]] \
        .rename(columns={"graph": "g", "subj": "s", "obj": "title"})
    want = _canon(
        lg.merge(ti, on=["g", "s"], how="left")[["g", "lang", "title"]]
    )
    pd.testing.assert_frame_equal(got, want)
    # the ASK no-op: adding a var-free optional guard changes nothing
    got2 = _canon(bgp_match(store, [
        ("?g", "?s", DC_LANGUAGE, "?lang"),
    ], optional=[
        ("?g", "?s", DC_TITLE, "?title"),
        (None, None, "nonexistent-pred", None),
    ], select=["g", "lang", "title"]).to_pandas())
    pd.testing.assert_frame_equal(got2, want)


def test_bgp_ask_guard(ray_session):
    """A MATCHING variable-free pattern is a satisfied ASK guard and
    must NOT empty the result (regression: the zero-column projection
    counted 0 rows even on a match); a failing guard empties it."""
    ds = _triples_ds({
        "graph": ["g", "g"],
        "subj": ["s1", "s2"],
        "pred": ["lang", "lang"],
        "obj": ["en", "fr"],
    })
    from twine_ray.stages.query import bgp_match

    got = bgp_match(ds, [
        (None, "s1", "lang", "en"),  # satisfied guard
        (None, "?s", "lang", "?l"),
    ]).to_pandas()
    assert sorted(got["s"]) == ["s1", "s2"]
    got2 = bgp_match(ds, [
        (None, "s1", "lang", "de"),  # failing guard
        (None, "?s", "lang", "?l"),
    ])
    assert got2.count() == 0
    # all patterns ASK guards, all satisfied -> single ask=True row
    got3 = bgp_match(ds, [(None, "s1", "lang", "en")]).to_pandas()
    assert list(got3.columns) == ["ask"] and bool(got3["ask"].iloc[0])


def test_bgp_optional_errors(ray_session):
    ds = _triples_ds({
        "graph": ["g"], "subj": ["s1"], "pred": ["lang"], "obj": ["en"],
    })
    from twine_ray.stages.query import bgp_match

    with pytest.raises(ValueError, match="shares no variable"):
        bgp_match(ds, [(None, "?s", "lang", None)],
                  optional=[(None, "?other", "title", "?t")])
    with pytest.raises(ValueError, match="non-ASK"):
        bgp_match(ds, [(None, "s1", "lang", "en")],
                  optional=[(None, "?s", "title", "?t")])


def test_bgp_filters(ray_session):
    """FILTER subset: comparison, regex/contains, var-var, and
    bound/!bound interplay with OPTIONAL nulls."""
    ds = _triples_ds({
        "graph": ["g"] * 5,
        "subj":  ["s1", "s2", "s3", "s1", "s2"],
        "pred":  ["lang", "lang", "lang", "title", "title"],
        "obj":   ["en", "fr", "s3", "T1", "T2"],
    })
    from twine_ray.stages.query import bgp_match

    req = [(None, "?s", "lang", "?lang")]

    def run(**kw):
        df = bgp_match(ds, req, **kw).to_pandas()
        return sorted(df["s"])

    assert run(filters=[("lang", "!=", "en")]) == ["s2", "s3"]
    assert run(filters=[("?lang", "<", "fr")]) == ["s1"]
    assert run(filters=[("lang", "regex", "^(en|fr)$")]) == ["s1", "s2"]
    assert run(filters=[("lang", "contains", "r")]) == ["s2"]
    # var-var: ?lang == ?s only for s3 (obj 's3' == subj 's3')
    assert run(filters=[("lang", "==", "?s")]) == ["s3"]
    # bound/!bound over an optional null
    opt = [(None, "?s", "title", "?title")]
    assert run(optional=opt, filters=[("title", "bound")]) == ["s1", "s2"]
    assert run(optional=opt, filters=[("title", "!bound")]) == ["s3"]
    # a comparison on a null binding drops the row (error semantics)
    assert run(optional=opt, filters=[("title", ">=", "T")]) \
        == ["s1", "s2"]
    with pytest.raises(ValueError, match="unbound"):
        run(filters=[("nope", "==", "x")])
    with pytest.raises(ValueError, match="unknown filter op"):
        run(filters=[("lang", "~", "x")])


def test_bgp_union(ray_session):
    """UNION: bag union of group solutions; a group that does not bind
    a variable contributes nulls for it."""
    ds = _triples_ds({
        "graph": ["g"] * 4,
        "subj":  ["s1", "s2", "s1", "s1"],
        "pred":  ["lang", "lang", "title", "title"],
        "obj":   ["en", "en", "T1", "T1"],
    })
    from twine_ray.stages.query import bgp_union

    got = bgp_union(ds, [
        {"patterns": [(None, "?s", "lang", "?v")]},
        {"patterns": [(None, "?s", "title", "?v")]},
    ]).to_pandas().sort_values(["s", "v"]).reset_index(drop=True)
    # bag semantics: s1's duplicate title triples are... deduplicated
    # nowhere — two identical (s1, T1) rows survive
    assert list(got["s"]) == ["s1", "s1", "s1", "s2"]
    assert list(got["v"]) == ["T1", "T1", "en", "en"]

    # differing variables: second group binds ?t, first leaves it null
    got2 = bgp_union(ds, [
        {"patterns": [(None, "?s", "lang", "?v")]},
        {"patterns": [(None, "?s", "title", "?t")],
         "filters": [("t", "==", "T1")]},
    ]).to_pandas()
    assert set(got2.columns) == {"s", "v", "t"}
    assert got2["t"].isna().sum() == 2 and got2["v"].isna().sum() == 2


def test_bgp_construct(ray_session):
    """CONSTRUCT: one instantiated template triple per solution per
    template pattern; null (optional) bindings drop only their own
    pattern's triple; literal-ness comes from the template flag."""
    ds = _triples_ds({
        "graph": ["g"] * 3,
        "subj":  ["s1", "s2", "s1"],
        "pred":  ["lang", "lang", "title"],
        "obj":   ["en", "fr", "T1"],
    })
    from twine_ray.stages.query import bgp_construct

    out = bgp_construct(ds, [
        (None, "?s", "lang", "?lang"),
    ], template=[
        ("http://out/", "?s", "http://p/lang", "?lang", True),
        ("http://out/", "?s", "http://p/title", "?title"),
    ], optional=[
        (None, "?s", "title", "?title"),
    ]).to_pandas().sort_values(["pred", "subj"]).reset_index(drop=True)
    # 2 lang triples + 1 title triple (s2's null title dropped)
    assert list(out["pred"]) == [
        "http://p/lang", "http://p/lang", "http://p/title"
    ]
    assert list(out["subj"]) == ["s1", "s2", "s1"]
    assert list(out["obj"]) == ["en", "fr", "T1"]
    assert list(out["obj_is_lit"]) == [True, True, False]
    assert (out["graph"] == "http://out/").all()

    with pytest.raises(ValueError, match="unbound"):
        bgp_construct(ds, [(None, "?s", "lang", "?lang")],
                      template=[("g", "?s", "p", "?nope")])
    with pytest.raises(ValueError, match="non-empty"):
        bgp_construct(ds, [(None, "?s", "lang", "?lang")], template=[])


def test_bgp_aggregate(ray_session):
    """GROUP BY + COUNT/COUNT(var)/MIN over solutions, incl. the
    SPARQL rule that COUNT(?v) skips unbound OPTIONAL bindings."""
    ds = _triples_ds({
        "graph": ["g"] * 6,
        "subj":  ["s1", "s2", "s3", "s4", "s1", "s3"],
        "pred":  ["lang", "lang", "lang", "lang", "title", "title"],
        "obj":   ["en", "en", "fr", "fr", "T1", "T9"],
    })
    from twine_ray.stages.query import bgp_aggregate

    got = bgp_aggregate(ds, [
        (None, "?s", "lang", "?lang"),
    ], group_vars=["lang"], aggs={
        "n": ("count",),
        "n_titled": ("count_var", "title"),
        "min_s": ("min", "s"),
        "max_title": ("max", "title"),
    }, optional=[
        (None, "?s", "title", "?title"),
    ]).to_pandas().sort_values("lang").reset_index(drop=True)
    assert list(got["lang"]) == ["en", "fr"]
    assert list(got["n"]) == [2, 2]
    assert list(got["n_titled"]) == [1, 1]
    assert list(got["min_s"]) == ["s1", "s3"]
    assert list(got["max_title"]) == ["T1", "T9"]

    with pytest.raises(ValueError, match="unbound"):
        bgp_aggregate(ds, [(None, "?s", "lang", "?lang")],
                      group_vars=["lang"], aggs={"m": ("min", "nope")})
    with pytest.raises(ValueError, match="unknown agg op"):
        bgp_aggregate(ds, [(None, "?s", "lang", "?lang")],
                      group_vars=["lang"], aggs={"m": ("avg", "s")})


def test_bgp_optional_property_random_graphs(ray_session):
    """Property: on random tiny graphs, bgp_match with one required and
    one optional pattern equals the pandas inner-then-left merge —
    including multiplicity (bag semantics) and null padding."""
    import pandas as pd
    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from twine_ray.stages.query import bgp_match

    node = st.sampled_from(["n0", "n1", "n2", "n3"])
    pred = st.sampled_from(["p", "q"])
    edges = st.lists(st.tuples(node, pred, node), min_size=1,
                     max_size=12)

    @settings(max_examples=12, deadline=None)
    @given(edges)
    def run(es):
        df = pd.DataFrame(es, columns=["subj", "pred", "obj"])
        df["graph"] = "g"
        df["obj_is_lit"] = True
        df["obj_dt"] = ""
        df["obj_lang"] = ""
        df["score"] = 1
        ds = rd.from_pandas(df)
        got = bgp_match(
            ds, [(None, "?s", "p", "?a")],
            optional=[(None, "?s", "q", "?b")],
        ).to_pandas()
        req = df[df["pred"] == "p"][["subj", "obj"]] \
            .rename(columns={"subj": "s", "obj": "a"})
        opt = df[df["pred"] == "q"][["subj", "obj"]] \
            .rename(columns={"subj": "s", "obj": "b"})
        want = req.merge(opt, on="s", how="left")
        key = lambda d: sorted(  # noqa: E731
            (r.s, r.a, r.b if isinstance(r.b, str) else None)
            for r in d.itertuples(index=False)
        )
        if req.empty:
            assert len(got) == 0
        else:
            assert key(got) == key(want)

    run()


def test_cli_bgp(store, ray_session, capsys):
    from twine_ray.cli import main
    from twine_ray.state.rulebase import DC_LANGUAGE, DC_TITLE

    full = _full(store)
    rc = main([
        "bgp", store,
        "--pattern", f"?g ?s {DC_LANGUAGE} ?lang",
        "--pattern", f"?g ?s {DC_TITLE} ?title",
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0].split("\t") == ["g", "s", "lang", "title"]
    lg = full[full["pred"] == DC_LANGUAGE]
    ti = full[full["pred"] == DC_TITLE]
    want = lg.merge(ti, on=["graph", "subj"])
    assert len(lines) - 1 == len(want)


def test_bgp_solution_modifiers(ray_session):
    """DISTINCT -> ORDER BY -> OFFSET/LIMIT in SPARQL algebra order."""
    import pandas as pd

    from twine_ray.stages.query import bgp_match

    ds = _triples_ds({
        "graph": ["g"] * 6,
        "subj": ["s1", "s2", "s3", "s4", "s5", "s6"],
        "pred": ["p"] * 6,
        "obj": ["b", "a", "c", "b", "a", "d"],
    })
    got = bgp_match(ds, [("?s", "p", "?o")], select=["o"],
                    distinct=True, order_by=["o"]).to_pandas()
    assert list(got["o"]) == ["a", "b", "c", "d"]
    got = bgp_match(ds, [("?s", "p", "?o")], select=["o"],
                    distinct=True, order_by=[("o", "desc")],
                    limit=2, offset=1).to_pandas()
    assert sorted(got["o"]) == ["b", "c"]
    # bag semantics without distinct: duplicates survive
    got = bgp_match(ds, [("?s", "p", "?o")], select=["o"],
                    order_by=["o"], limit=3).to_pandas()
    assert list(got["o"]) == ["a", "a", "b"]
    with pytest.raises(ValueError, match="offset requires limit"):
        bgp_match(ds, [("?s", "p", "?o")], select=["o"], offset=2)
    with pytest.raises(ValueError, match="unselected"):
        bgp_match(ds, [("?s", "p", "?o")], select=["o"],
                  order_by=["s"]).to_pandas()
    del pd


def test_bgp_values(ray_session):
    """VALUES inline data: OR of rows, AND within a row, None=UNDEF."""
    from twine_ray.stages.query import bgp_match

    ds = _triples_ds({
        "graph": ["g"] * 4,
        "subj": ["s1", "s2", "s3", "s4"],
        "pred": ["p"] * 4,
        "obj": ["a", "b", "c", "a"],
    })
    got = bgp_match(ds, [("?s", "p", "?o")], values=[
        {"s": "s1", "o": "a"},     # matches s1 only
        {"s": "s3", "o": "zzz"},   # matches nothing (AND fails)
        {"o": "b"},                # matches s2
    ]).to_pandas()
    assert sorted(got["s"]) == ["s1", "s2"]
    # UNDEF row matches everything
    got = bgp_match(ds, [("?s", "p", "?o")],
                    values=[{"s": None}]).to_pandas()
    assert len(got) == 4
    with pytest.raises(ValueError, match="unbound"):
        bgp_match(ds, [("?s", "p", "?o")], values=[{"x": "v"}])


def test_bgp_ask(ray_session):
    from twine_ray.stages.query import bgp_ask

    ds = _triples_ds({
        "graph": ["g"] * 2,
        "subj": ["s1", "s2"],
        "pred": ["p", "q"],
        "obj": ["a", "b"],
    })
    assert bgp_ask(ds, [("?s", "p", "?o")]).to_pandas()["ask"][0]
    assert not bgp_ask(ds, [("?s", "nope", "?o")]).to_pandas()["ask"][0]
    # filters participate in the probe
    assert not bgp_ask(ds, [("?s", "p", "?o")],
                       filters=[("o", "==", "zzz")]) \
        .to_pandas()["ask"][0]


def test_bgp_minus(ray_session):
    """MINUS removes solutions compatible on SHARED vars; disjoint
    domains remove nothing (SPARQL semantics); empty minus side is a
    no-op."""
    from twine_ray.stages.query import bgp_minus

    ds = _triples_ds({
        "graph": ["g"] * 5,
        "subj": ["s1", "s2", "s3", "s1", "s3"],
        "pred": ["p", "p", "p", "flag", "flag"],
        "obj": ["a", "b", "c", "x", "y"],
    })
    got = bgp_minus(ds, [("?s", "p", "?o")],
                    minus=[("?s", "flag", "?f")]).to_pandas()
    assert sorted(got["s"]) == ["s2"]
    # disjoint domains: nothing removed
    got = bgp_minus(ds, [("?s", "p", "?o")],
                    minus=[("?z", "flag", "?f")],
                    select=["s"]).to_pandas()
    assert sorted(got["s"]) == ["s1", "s2", "s3"]
    # empty minus side: nothing removed
    got = bgp_minus(ds, [("?s", "p", "?o")],
                    minus=[("?s", "nope", "?f")]).to_pandas()
    assert sorted(got["s"]) == ["s1", "s2", "s3"]


def test_bgp_minus_null_shared_binding_survives(ray_session):
    """A solution whose shared var is null (unmatched OPTIONAL) is
    incompatible with every minus row and survives."""
    from twine_ray.stages.query import bgp_minus

    ds = _triples_ds({
        "graph": ["g"] * 4,
        "subj": ["s1", "s2", "s1", "t1"],
        "pred": ["p", "p", "link", "flag"],
        "obj": ["a", "b", "t1", "x"],
    })
    got = bgp_minus(
        ds,
        [("?s", "p", "?o")],
        optional=[("?s", "link", "?t")],
        minus=[("?t", "flag", "?f")],
    ).to_pandas()
    # s1's ?t = t1 is flagged -> removed; s2's ?t is null -> survives
    assert sorted(got["s"]) == ["s2"]


def test_describe_resource(store, ray_session):
    """DESCRIBE over the store dir (bucket-pruned scans) equals the
    in-memory filter path, covers both positions, and the predicate
    profile restricts it."""
    import pandas as pd

    from twine_ray.stages.materialize import read_triple_store
    from twine_ray.stages.query import describe_resource
    from twine_ray.state.rulebase import DC_TITLE

    full = _full(store)
    # a subject that carries a title triple (so the scoped profile is
    # non-empty and keeps its schema through to_pandas)
    iri = full.loc[full["pred"] == DC_TITLE, "subj"].iloc[0]
    got_store = _canon(describe_resource(store, iri).to_pandas())
    ds = read_triple_store(store).drop_columns(["graph_bucket"])
    got_ds = _canon(describe_resource(ds, iri).to_pandas())
    pd.testing.assert_frame_equal(
        got_store[sorted(got_store.columns)],
        got_ds[sorted(got_ds.columns)],
    )
    want = full[
        (full["subj"] == iri)
        | ((full["obj"] == iri) & ~full["obj_is_lit"])
    ]
    assert len(got_store) == len(want)
    scoped = describe_resource(store, iri, preds={DC_TITLE}).to_pandas()
    assert set(scoped["pred"]) <= {DC_TITLE}
    assert len(scoped) == (want["pred"] == DC_TITLE).sum()


def test_cli_ask_describe_and_modifiers(store, ray_session, capsys):
    from twine_ray.cli import main
    from twine_ray.state.rulebase import DC_TITLE

    full = _full(store)
    # ask: true -> exit 0, false -> exit 1
    rc = main(["ask", store, "--pattern", f"?g ?s {DC_TITLE} ?t"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "true"
    rc = main(["ask", store, "--pattern", "?g ?s http://no.such/p ?t"])
    assert rc == 1
    assert capsys.readouterr().out.strip() == "false"
    # describe prints the resource's triples as N-Quads
    iri = full.loc[full["pred"] == DC_TITLE, "subj"].iloc[0]
    rc = main(["describe", store, iri])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    want = full[
        (full["subj"] == iri)
        | ((full["obj"] == iri) & ~full["obj_is_lit"])
    ]
    assert len(lines) == len(want)
    assert all(iri in ln for ln in lines)
    # bgp modifiers: distinct + ordered + limited
    rc = main([
        "bgp", store,
        "--pattern", f"?g ?s {DC_TITLE} ?title",
        "--distinct", "--order-by", "?title desc", "--limit", "3",
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    titles = [ln.split("\t")[-1] for ln in lines[1:]]
    want_titles = sorted(set(full.loc[full["pred"] == DC_TITLE, "obj"]),
                         reverse=True)[:3]
    assert titles == want_titles


def test_bgp_join_order_invariance(store, ray_session):
    """The greedy planner makes results independent of the written
    pattern order (inner bag joins commute) — every permutation of a
    3-pattern BGP returns the same bag."""
    import itertools

    import pandas as pd

    from twine_ray.stages.query import bgp_match
    from twine_ray.state.rulebase import (
        DC_LANGUAGE,
        DC_MODIFIED,
        DC_TITLE,
    )

    pats = [
        ("?g", "?s", DC_LANGUAGE, "?lang"),
        ("?g", "?s", DC_TITLE, "?title"),
        ("?g", "?s", DC_MODIFIED, "?ts"),
    ]
    ref = None
    for perm in itertools.permutations(pats):
        got = _canon(bgp_match(
            store, list(perm), select=["g", "title", "lang", "ts"]
        ).to_pandas())
        if ref is None:
            ref = got
        else:
            pd.testing.assert_frame_equal(got, ref)
    assert len(ref) > 0


def test_filter_pushdown_equals_post_filter(ray_session):
    """FILTER pushdown (pre-join pattern pre-filter) is invisible:
    results equal the unpushed semantics, including filters that mix a
    pushable spec (single-pattern var) with an unpushable one (optional
    var bound-ness) and a two-pattern var comparison."""
    import pandas as pd

    ds = _triples_ds({
        "graph": ["g"] * 8,
        "subj":  ["s1", "s2", "s3", "s4", "s1", "s2", "s3", "s1"],
        "pred":  ["lang"] * 4 + ["title"] * 3 + ["note"],
        "obj":   ["en", "fr", "de", "en", "T1", "T2", "T3", "N1"],
    })
    from twine_ray.stages.query import bgp_match

    got = bgp_match(
        ds,
        [(None, "?s", "lang", "?lang")],
        optional=[(None, "?s", "title", "?title")],
        filters=[("lang", "!=", "en"), ("title", "bound")],
    ).to_pandas().sort_values(["s"]).reset_index(drop=True)
    # expected: fr/de rows that have titles -> s2, s3
    assert list(got["s"]) == ["s2", "s3"]
    assert list(got["lang"]) == ["fr", "de"]

    # two-pattern var comparison is NOT pushable (spans patterns):
    # still correct through the final group filter
    got2 = bgp_match(
        ds,
        [(None, "?s", "lang", "?lang"), (None, "?s", "title", "?title")],
        filters=[("lang", ">", "?title")],
    ).to_pandas()
    # lowercase langs sort after uppercase titles in byte order, so
    # every joined row passes the cross-pattern comparison
    assert {tuple(r) for r in got2[["s", "lang", "title"]].to_numpy()} \
        == {("s1", "en", "T1"), ("s2", "fr", "T2"), ("s3", "de", "T3")}


def test_match_triples_in_set_and_metadata(store, ray_session):
    """IN-SET terms scan once and equal the union of equality scans;
    obj_lang/obj_dt kwargs push into the parquet filter."""
    import pandas as pd

    from twine_ray.stages.query import match_triples

    full = _full(store)
    preds = sorted(set(full["pred"]))[:2]
    got = _canon(
        match_triples(store, pred=tuple(preds)).to_pandas()
    )
    want = _canon(
        pd.concat([
            match_triples(store, pred=p).to_pandas() for p in preds
        ])
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )
    assert len(got) > 0
    # metadata kwargs: "" matches the store's untyped rows exactly
    lang0 = match_triples(store, obj_lang="").to_pandas()
    assert len(lang0) == int((full["obj_lang"] == "").sum())


def test_bgp_filter_or_pushdown_equivalence(ray_session):
    """An ("or", ...) disjunction whose atoms all touch one pattern's
    variables is pushed to that pattern's scan; result equals the
    unpushed evaluation (idempotent final filter)."""
    ds = _triples_ds({
        "graph": ["g"] * 6,
        "subj":  ["s1", "s2", "s3", "s1", "s2", "s3"],
        "pred":  ["v", "v", "v", "w", "w", "w"],
        "obj":   ["a", "b", "c", "x", "y", "z"],
    })
    from twine_ray.stages.query import bgp_match

    spec = ("or", [[("val", "==", "a")], [("val", "==", "c")]])
    got = bgp_match(
        ds, [(None, "?s", "v", "?val"), (None, "?s", "w", "?o")],
        filters=[spec],
    ).to_pandas().sort_values("s").reset_index(drop=True)
    assert list(got["s"]) == ["s1", "s3"]
    assert list(got["val"]) == ["a", "c"]


def test_bgp_bind_errors(ray_session):
    ds = _triples_ds({
        "graph": ["g"], "subj": ["s"], "pred": ["p"], "obj": ["o"],
    })
    from twine_ray.stages.query import bgp_match

    with pytest.raises(ValueError, match="already bound"):
        bgp_match(ds, [(None, "?s", "p", "?o")],
                  binds=[("s", "x")])
    with pytest.raises(ValueError, match="unbound"):
        bgp_match(ds, [(None, "?s", "p", "?o")],
                  binds=[("n", "?zz")])


def test_scan_filter_validation(ray_session):
    ds = _triples_ds({
        "graph": ["g"], "subj": ["s"], "pred": ["p"], "obj": ["o"],
    })
    from twine_ray.stages.query import bgp_match

    # scan op inside a disjunction is rejected
    with pytest.raises(ValueError, match="disjunction"):
        bgp_match(ds, [(None, "?s", "p", "?o")],
                  filters=[("or", [[("o", "lang==", "en")],
                                   [("o", "==", "x")]])])
    # non-constant value rejected
    with pytest.raises(ValueError, match="constant"):
        bgp_match(ds, [(None, "?s", "p", "?o")],
                  filters=[("o", "lang==", "?s")])


def test_describe_bnode_closure(ray_session):
    """DESCRIBE walks blank-node-valued objects transitively (concise
    bounded description): a Turtle property list puts _: subjects in
    the store; their properties belong to the resource's description.
    Cycles terminate via the visited set; unrelated bnodes stay out."""
    ds = _triples_ds({
        "graph": ["g"] * 8,
        "subj":  ["r", "r", "_:b1", "_:b1", "_:b2", "x", "_:z", "o"],
        "pred":  ["name", "addr", "street", "next", "street",
                  "link", "street", "back"],
        "obj":   ["R", "_:b1", "S1", "_:b2", "S2", "r", "ZZ", "r"],
        "obj_is_lit": [True, False, True, False, True,
                       False, True, False],
    })
    from twine_ray.stages.query import describe_resource

    got = describe_resource(ds, "r").to_pandas()
    pairs = sorted(zip(got["subj"], got["pred"]))
    assert pairs == [
        ("_:b1", "next"), ("_:b1", "street"), ("_:b2", "street"),
        ("o", "back"), ("r", "addr"), ("r", "name"), ("x", "link"),
    ]
    # predicate scoping prunes the walk: only addr kept -> closure
    # still follows ITS bnode, but name disappears
    scoped = describe_resource(ds, "r", preds={"addr"}).to_pandas()
    assert sorted(scoped["pred"]) == ["addr", "next", "street",
                                      "street"]
    # depth cap bounds the walk
    capped = describe_resource(ds, "r", bnode_depth=1).to_pandas()
    assert "_:b2" not in set(capped["subj"])


def test_describe_bnode_cycle_terminates(ray_session):
    ds = _triples_ds({
        "graph": ["g"] * 3,
        "subj":  ["r", "_:a", "_:b"],
        "pred":  ["p", "q", "q2"],
        "obj":   ["_:a", "_:b", "_:a"],
        "obj_is_lit": [False] * 3,
    })
    from twine_ray.stages.query import describe_resource

    got = describe_resource(ds, "r").to_pandas()
    assert sorted(got["subj"]) == ["_:a", "_:b", "r"]
