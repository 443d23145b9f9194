"""Skew valve: salted store reduce (resolve_for_store(salt=N)) must
produce the identical resolved store, with each bucket's rows spread
over multiple reducer outputs (docs/SCALE.md hot-bucket design, wired
round 2).  Note: each REDUCER's run is sorted; Ray's writer may pack
several runs into one file, so per-file global order is not asserted."""

from __future__ import annotations

import os


def _store_rows(store_dir: str):
    from twine_ray.stages.materialize import read_triple_store

    df = read_triple_store(store_dir).to_pandas()
    df["graph_bucket"] = df["graph_bucket"].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_salted_store_equals_unsalted(ray_session, tmp_path):
    import pandas as pd

    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import synth_pages_dataset

    aliases = default_alias_rows()
    out1 = str(tmp_path / "plain")
    out2 = str(tmp_path / "salted")
    r1 = run_kg_pipeline(synth_pages_dataset(60, concurrency=2), out1,
                         aliases, num_buckets=4, concurrency=2,
                         resume=False)
    r2 = run_kg_pipeline(synth_pages_dataset(60, concurrency=2), out2,
                         aliases, num_buckets=4, concurrency=2,
                         resume=False, store_salt=4)
    assert r1["store"]["rows"] == r2["store"]["rows"]
    pd.testing.assert_frame_equal(
        _store_rows(os.path.join(out1, "store")),
        _store_rows(os.path.join(out2, "store")),
    )
    # the salted store spreads buckets over multiple sorted files
    dd = os.path.join(out2, "store", "data")
    per_bucket = [
        len([f for f in os.listdir(os.path.join(dd, d))
             if f.endswith(".parquet")])
        for d in os.listdir(dd) if d.startswith("graph_bucket=")
    ]
    assert max(per_bucket) > 1


def test_auto_salt_engages_on_hot_bucket(ray_session, tmp_path):
    """VERDICT r2 #9: store_salt='auto' (the default) reads raw-lineage
    bucket counts (parquet footers, no data read) and salts when one
    bucket dominates; output equals the unsalted plan."""
    import pandas as pd
    import ray.data as rd

    from twine_ray.functions.ids import bucket_of
    from twine_ray.pipelines.kg import (
        auto_store_salt,
        default_alias_rows,
        run_kg_pipeline,
    )
    from twine_ray.sources.pages import pages_table
    from twine_ray.sources.world import synth_pages

    rows, _ = synth_pages(40, seed=11, n_entities=40)
    # skew: move 3/4 of the pages onto urls that all hash to bucket 0
    hot = [u for u in (f"http://hot.example/p{i}" for i in range(4000))
           if bucket_of(u, 4) == 0]
    k = 0
    for i, r in enumerate(rows):
        if i % 4 != 0:
            r["url"] = hot[k]
            k += 1

    aliases = default_alias_rows(n_entities=40)
    out_auto = str(tmp_path / "auto")
    out_one = str(tmp_path / "one")
    r_auto = run_kg_pipeline(
        rd.from_arrow(pages_table(rows)), out_auto, aliases,
        num_buckets=4, concurrency=2, resume=False,  # store_salt="auto"
    )
    assert r_auto["metrics"]["store_salt"] > 1
    assert auto_store_salt(os.path.join(out_auto, "raw")) \
        == r_auto["metrics"]["store_salt"]
    r_one = run_kg_pipeline(
        rd.from_arrow(pages_table(rows)), out_one, aliases,
        num_buckets=4, concurrency=2, resume=False, store_salt=1,
    )
    assert r_one["metrics"]["store_salt"] == 1
    pd.testing.assert_frame_equal(
        _store_rows(os.path.join(out_auto, "store")),
        _store_rows(os.path.join(out_one, "store")),
    )


def test_auto_salt_stays_one_on_uniform_corpus(ray_session, tmp_path):
    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import synth_pages_dataset

    res = run_kg_pipeline(
        synth_pages_dataset(60, concurrency=2), str(tmp_path / "u"),
        default_alias_rows(), num_buckets=4, concurrency=2, resume=False,
    )
    assert res["metrics"]["store_salt"] == 1
