"""J3 incremental diff + per-partition lineage (north_rule)."""

from __future__ import annotations

import pandas as pd


def test_dataset_except_basic(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.stages.diff import dataset_except

    new = rd.from_arrow(pa.Table.from_pydict(
        {"k": ["a", "b", "c", "c"], "v": [1, 2, 3, 3]}
    ))
    old = rd.from_arrow(pa.Table.from_pydict(
        {"k": ["b", "x"], "v": [2, 9]}
    ))
    out = dataset_except(new, old, ["k", "v"]).to_pandas()
    got = sorted(map(tuple, out[["k", "v"]].itertuples(index=False,
                                                       name=None)))
    assert got == [("a", 1), ("c", 3), ("c", 3)]  # multiplicity kept

    out_d = dataset_except(new, old, ["k", "v"], distinct=True).to_pandas()
    got_d = sorted(map(tuple, out_d[["k", "v"]].itertuples(index=False,
                                                           name=None)))
    assert got_d == [("a", 1), ("c", 3)]


def test_triples_diff_incremental(ray_session, tmp_path):
    import ray.data as rd

    from twine_ray.pipelines.kg import (
        default_alias_rows,
        kg_triples_dataset,
        run_kg_pipeline,
    )
    from twine_ray.sources.pages import alias_dict_table, pages_table
    from twine_ray.sources.world import synth_pages
    from twine_ray.stages.diff import triples_diff

    alias_rows = alias_dict_table(n_entities=24).to_pylist()
    rows, _ = synth_pages(30, seed=42, n_entities=24)
    out_dir = str(tmp_path / "kg")
    run_kg_pipeline(rd.from_arrow(pages_table(rows)), out_dir, alias_rows,
                    num_buckets=8, concurrency=2)

    # same corpus recomputed in memory -> diff must be empty
    same = kg_triples_dataset(
        rd.from_arrow(pages_table(rows)), alias_rows, concurrency=2
    )
    assert triples_diff(same, f"{out_dir}/store").count() == 0

    # extended corpus -> diff contains only new graphs' triples
    rows2, _ = synth_pages(34, seed=42, n_entities=24)
    bigger = kg_triples_dataset(
        rd.from_arrow(pages_table(rows2)), alias_rows, concurrency=2
    )
    delta = triples_diff(bigger, f"{out_dir}/store").to_pandas()
    assert len(delta) > 0


def test_lineage_written(ray_session, tmp_path):
    import ray.data as rd

    from twine_ray.pipelines.kg import run_kg_pipeline
    from twine_ray.sources.pages import alias_dict_table, pages_table
    from twine_ray.sources.world import synth_pages
    from twine_ray.stages.materialize import read_lineage

    rows, _ = synth_pages(20, seed=42, n_entities=24)
    out_dir = str(tmp_path / "kg")
    res = run_kg_pipeline(
        rd.from_arrow(pages_table(rows)), out_dir,
        alias_dict_table(n_entities=24).to_pylist(),
        num_buckets=4, concurrency=2,
    )
    lin = read_lineage(res["store_dir"])
    assert lin, "store lineage missing"
    assert sum(r["rows"] for r in lin) == res["store"]["rows"]
    assert {r["bucket"] for r in lin} == set(res["store"]["buckets"])
    for r in lin:
        assert r["files"] >= 1 and r["bytes"] > 0
    m = res["metrics"]
    assert m["store_triples"] == res["store"]["rows"]
    assert m["coref_classes"] <= m["coref_members"]
