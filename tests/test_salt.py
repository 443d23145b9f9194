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
