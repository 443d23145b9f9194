"""Continuous-ingest loop (pipelines/watch.py — the twine-writerd
analog): two waves of shards through watch_once must converge to the
same store a one-shot build over the union produces, with the ack
record tracking exactly the processed shards."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest


def _store_df(store_dir: str):
    from twine_ray.stages.materialize import read_triple_store

    df = read_triple_store(store_dir).to_pandas()
    df["graph_bucket"] = df["graph_bucket"].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def watch_env(tmp_path_factory, ray_session):
    """60 synthetic pages split into two shard waves + a one-shot
    reference build over the union."""
    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import synth_pages_dataset

    root = tmp_path_factory.mktemp("watch")
    watch_dir = root / "incoming"
    watch_dir.mkdir()
    full = str(root / "full.parquet")
    synth_pages_dataset(60, concurrency=2).write_parquet(full)
    files = sorted(
        os.path.join(full, f) for f in os.listdir(full)
        if f.endswith(".parquet")
    )
    import pyarrow as pa

    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    pq.write_table(tbl.slice(0, 40), str(watch_dir / "wave1.parquet"))
    wave2 = tbl.slice(40)

    aliases = default_alias_rows()
    ref = str(root / "ref")
    import ray.data as rd

    run_kg_pipeline(rd.read_parquet(full), ref, aliases,
                    num_buckets=8, concurrency=2, resume=False)
    return {
        "watch_dir": str(watch_dir),
        "out": str(root / "out"),
        "wave2": wave2,
        "aliases": aliases,
        "ref": ref,
    }


def test_two_wave_watch_equals_one_shot(watch_env, ray_session):
    import pandas as pd

    from twine_ray.pipelines.watch import load_ack, watch_once
    from twine_ray.stages.materialize import bucket_signatures_cached

    env = watch_env
    kw = {"num_buckets": 8, "concurrency": 2}

    r1 = watch_once(env["watch_dir"], env["out"], env["aliases"], **kw)
    assert r1["mode"] == "bootstrap" and r1["wave"] == 1
    assert r1["new_shards"] == ["wave1.parquet"]

    # idle poll: nothing new, nothing touched
    assert watch_once(env["watch_dir"], env["out"], env["aliases"],
                      **kw) is None

    pq.write_table(env["wave2"],
                   os.path.join(env["watch_dir"], "wave2.parquet"))
    r2 = watch_once(env["watch_dir"], env["out"], env["aliases"], **kw)
    assert r2["mode"] == "incremental" and r2["wave"] == 2
    assert r2["new_shards"] == ["wave2.parquet"]
    assert r2["metrics"]["changed_store_buckets"] > 0

    # final store == the one-shot build over the union: frame equality
    # AND per-bucket content signatures (byte-level content equality)
    store = os.path.join(env["out"], "store")
    ref_store = os.path.join(env["ref"], "store")
    pd.testing.assert_frame_equal(_store_df(store), _store_df(ref_store))
    assert bucket_signatures_cached(store) == \
        bucket_signatures_cached(ref_store)

    ack = load_ack(env["out"])
    assert ack["waves"] == 2
    assert ack["shards"] == {
        "wave1.parquet": {"wave": 1}, "wave2.parquet": {"wave": 2},
    }


def test_watch_reprocess_is_idempotent(watch_env, ray_session):
    """Crash-between-swap-and-ack analog: deleting the ack record and
    re-polling reprocesses every shard but swaps NOTHING (signatures
    unchanged) — the at-least-once redelivery contract."""
    from twine_ray.pipelines.watch import _ack_path, watch_once

    env = watch_env
    os.remove(_ack_path(env["out"]))
    r = watch_once(env["watch_dir"], env["out"], env["aliases"],
                   num_buckets=8, concurrency=2)
    assert r["mode"] == "incremental"
    assert sorted(r["new_shards"]) == ["wave1.parquet", "wave2.parquet"]
    assert r["metrics"]["changed_store_buckets"] == 0
    assert r["metrics"]["reput_triples"] == 0


def test_watch_manifest_overrides_bucket_count(watch_env, ray_session):
    """A store bootstrapped with num_buckets=8 must keep working when a
    later poll passes a DIFFERENT (or default) bucket count: the store
    manifest is authoritative after bootstrap (ADVICE r4 — previously
    every later poll failed on the manifest mismatch with no way to
    correct it from the watch CLI)."""
    from twine_ray.pipelines.watch import _ack_path, watch_once

    env = watch_env
    os.remove(_ack_path(env["out"]))
    r = watch_once(env["watch_dir"], env["out"], env["aliases"],
                   num_buckets=32, concurrency=2)
    assert r["mode"] == "incremental"
    assert r["metrics"]["changed_store_buckets"] == 0


def test_watch_loop_idle_exit(tmp_path, ray_session):
    from twine_ray.pipelines.kg import default_alias_rows
    from twine_ray.pipelines.watch import watch_loop

    empty = tmp_path / "empty"
    empty.mkdir()
    waves = watch_loop(str(empty), str(tmp_path / "out"),
                       default_alias_rows(), poll_sec=0.01, idle_exit=2)
    assert waves == []
