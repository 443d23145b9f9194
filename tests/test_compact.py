"""Store compaction (stages/materialize.compact_store): restores the
one-sorted-file-per-bucket layout after salted writes / incremental
swaps, byte-content preserved, crash-interruption self-healing."""

from __future__ import annotations

import os
import shutil

import pandas as pd


def _store_rows(store_dir: str):
    from twine_ray.stages.materialize import read_triple_store

    df = read_triple_store(store_dir).to_pandas()
    df["graph_bucket"] = df["graph_bucket"].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _files_per_bucket(store_dir: str) -> dict[int, list[str]]:
    dd = os.path.join(store_dir, "data")
    out = {}
    for name in os.listdir(dd):
        if name.startswith("graph_bucket="):
            b = int(name.split("=", 1)[1])
            out[b] = sorted(
                f for f in os.listdir(os.path.join(dd, name))
                if f.endswith(".parquet")
            )
    return out


def test_compact_salted_store(ray_session, tmp_path):
    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import synth_pages_dataset
    from twine_ray.stages.materialize import (
        compact_store,
        read_lineage,
        signature_scan,
    )
    from twine_ray.stages.query import read_graph

    out = str(tmp_path / "kg")
    run_kg_pipeline(synth_pages_dataset(60, concurrency=2), out,
                    default_alias_rows(), num_buckets=4, concurrency=2,
                    resume=False, store_salt=4)
    store = os.path.join(out, "store")
    before_rows = _store_rows(store)
    before_sigs = signature_scan(store)
    fpb = _files_per_bucket(store)
    assert max(len(v) for v in fpb.values()) > 1  # salt made runs

    res = compact_store(store)
    assert res["compacted"]
    fpb2 = _files_per_bucket(store)
    assert all(v == ["compact.parquet"] for b, v in fpb2.items()
               if b in res["compacted"])
    assert all(len(v) == 1 for v in fpb2.values())

    pd.testing.assert_frame_equal(_store_rows(store), before_rows)
    assert signature_scan(store) == before_sigs
    # lineage sig fields survived; file counts refreshed
    recs = {r["bucket"]: r for r in read_lineage(store)}
    for b in res["compacted"]:
        assert recs[b]["files"] == 1 and "sig1" in recs[b]
    # the query surface still prunes/reads correctly
    g = before_rows["graph"].iloc[0]
    assert read_graph(store, g).count() == (before_rows["graph"] == g).sum()

    # idempotent: second run skips everything
    res2 = compact_store(store)
    assert res2["compacted"] == []


def test_compact_heals_interrupted_run(ray_session, tmp_path):
    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import synth_pages_dataset
    from twine_ray.stages.materialize import compact_store

    out = str(tmp_path / "kg")
    run_kg_pipeline(synth_pages_dataset(30, concurrency=2), out,
                    default_alias_rows(), num_buckets=4, concurrency=2,
                    resume=False)
    store = os.path.join(out, "store")
    before = _store_rows(store)
    fpb = _files_per_bucket(store)
    b, files = next(iter(sorted(fpb.items())))
    part = os.path.join(store, "data", f"graph_bucket={b}")
    # simulate a crash between the atomic compact write and the unlink
    # of the replaced runs: compact.parquet holds the full content, the
    # old run file is still present
    shutil.copy(os.path.join(part, files[0]),
                os.path.join(part, "compact.parquet"))
    res = compact_store(store, buckets=[b])
    assert b in res["skipped"]  # healed, not recompacted
    assert _files_per_bucket(store)[b] == ["compact.parquet"]
    pd.testing.assert_frame_equal(_store_rows(store), before)
