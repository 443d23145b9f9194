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
