"""DROP GRAPH analog (stages/materialize.drop_graphs): removes only
the named graphs, rewrites only their hash buckets, refreshes lineage
signatures so incremental mode sees the post-drop state."""

from __future__ import annotations

import os

import pandas as pd
import pytest


@pytest.fixture()
def built_store(ray_session, tmp_path):
    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import synth_pages_dataset

    out = str(tmp_path / "kg")
    run_kg_pipeline(synth_pages_dataset(40, concurrency=2), out,
                    default_alias_rows(), num_buckets=4, concurrency=2,
                    resume=False)
    return os.path.join(out, "store")


def _rows(store_dir):
    from twine_ray.stages.materialize import read_triple_store

    df = read_triple_store(store_dir).drop_columns(
        ["graph_bucket"]
    ).to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_drop_graphs(built_store, ray_session):
    from twine_ray.stages.materialize import (
        drop_graphs,
        read_lineage,
        signature_scan,
    )
    from twine_ray.stages.query import read_graph

    before = _rows(built_store)
    graphs = sorted(set(before["graph"]))
    victims = [graphs[0], graphs[3]]
    n_victim_rows = int(before["graph"].isin(victims).sum())
    assert n_victim_rows > 0

    res = drop_graphs(built_store, victims)
    assert res["dropped_rows"] == n_victim_rows
    assert res["buckets"]

    # dropped graphs read back empty; everything else is untouched
    for g in victims:
        assert read_graph(built_store, g).count() == 0
    after = _rows(built_store)
    want = before[~before["graph"].isin(victims)] \
        .sort_values(list(before.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(after, want)

    # lineage signatures match a fresh content scan (incremental mode
    # reads these instead of re-scanning)
    recs = {r["bucket"]: r for r in read_lineage(built_store)}
    for b, (s1, s2, n) in signature_scan(built_store).items():
        assert recs[b]["sig1"] == s1
        assert recs[b]["sig2"] == s2
        assert recs[b]["rows"] == n

    # idempotent: dropping again removes nothing
    res2 = drop_graphs(built_store, victims)
    assert res2 == {"dropped_rows": 0, "buckets": []}
    assert _rows(built_store).equals(after)


def test_drop_graphs_errors_and_cli(built_store, ray_session, tmp_path,
                                    capsys):
    from twine_ray.cli import main
    from twine_ray.stages.materialize import drop_graphs

    with pytest.raises(ValueError, match="manifest"):
        drop_graphs(str(tmp_path / "nothere"), ["http://x"])
    assert drop_graphs(built_store, []) == \
        {"dropped_rows": 0, "buckets": []}

    before = _rows(built_store)
    g = sorted(set(before["graph"]))[1]
    rc = main(["drop", built_store, "--graph", g])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"dropped_rows"' in out
    after = _rows(built_store)
    assert len(after) == len(before) - (before["graph"] == g).sum()
    assert g not in set(after["graph"])
