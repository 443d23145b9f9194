"""Continuous-ingest loop — the ``twine-writerd`` daemon analog
(SURVEY.md §3.1: Twine's writer daemon consumes an AMQP queue of
incoming documents and feeds them through the processor graph,
acknowledging each message after its graph is PUT).

Ray-native shape: the "queue" is a DIRECTORY of Parquet page shards —
the natural cluster ingest surface (crawl deliveries land as files,
not AMQP messages); the ack record is ``_WATCH_ACK.json`` in the
output dir, written atomically AFTER the store swap completes, so a
crash between processing and ack simply reprocesses the wave (same
at-least-once semantics as an unacked AMQP redelivery — idempotent
here because the incremental path is deterministic and
signature-guarded: an identical re-run swaps nothing).

Each poll:

1. list ``*.parquet`` shards under the watch dir; new = not yet acked
2. first wave bootstraps the store with the full pipeline; later
   waves read ONLY the new shards' url column (pruned driver-side
   read) as the changed set and run ``run_kg_incremental`` over the
   full corpus — raw-bucket pruning means only buckets touched by new
   urls re-extract, and only store buckets whose signatures changed
   are swapped
3. ack the shards

Scale notes: the corpus read is every shard path (Ray prunes at file
granularity downstream); the per-wave driver state is just the shard
name list and the new urls (bounded by the wave size, not the corpus).
"""

from __future__ import annotations

import json
import os
import time

ACK_NAME = "_WATCH_ACK.json"


def _ack_path(out_dir: str) -> str:
    return os.path.join(out_dir, ACK_NAME)


def load_ack(out_dir: str) -> dict:
    p = _ack_path(out_dir)
    if not os.path.exists(p):
        return {"waves": 0, "shards": {}}
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def _write_ack(out_dir: str, ack: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = _ack_path(out_dir) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(ack, f, indent=1, sort_keys=True)
    os.replace(tmp, _ack_path(out_dir))


def scan_shards(watch_dir: str) -> list[str]:
    """Sorted relative paths of every Parquet shard under watch_dir."""
    out = []
    for root, _dirs, files in os.walk(watch_dir):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(root, f),
                                           watch_dir))
    return sorted(out)


def _shard_urls(paths: list[str]) -> list[str]:
    """urls of the new shards only — a pruned single-column read; the
    driver holds one wave's urls, never the corpus."""
    import pyarrow.parquet as pq

    urls: list[str] = []
    for p in paths:
        urls.extend(
            pq.read_table(p, columns=["url"])["url"].to_pylist()
        )
    return urls


def watch_once(watch_dir: str, out_dir: str, alias_rows, *,
               num_buckets: int | None = None,
               concurrency=4) -> dict | None:
    """One poll of the ingest loop.  Returns the wave's metrics dict,
    or None when no unacked shard exists (idle poll).

    ``num_buckets``: used for the bootstrap wave only (default 32).
    Once a store manifest exists, ITS bucket count is authoritative —
    every later poll re-reads it, so a store bootstrapped with a
    non-default count keeps working regardless of what the caller or
    CLI passes (ADVICE r4: a mismatch here made every later poll fail
    on run_kg_incremental's manifest check with no way to correct it).
    """
    import ray.data as rd

    from twine_ray.pipelines.kg import (
        run_kg_incremental,
        run_kg_pipeline,
    )
    from twine_ray.state import checkpoint as ckpt

    shards = scan_shards(watch_dir)
    ack = load_ack(out_dir)
    new = [s for s in shards if s not in ack["shards"]]
    if not new:
        return None
    all_paths = [os.path.join(watch_dir, s) for s in shards]
    new_paths = [os.path.join(watch_dir, s) for s in new]
    pages = rd.read_parquet(all_paths)

    store_dir = os.path.join(out_dir, "store")
    manifest = ckpt.read_manifest(store_dir)
    bootstrapped = manifest is not None
    if bootstrapped:
        num_buckets = manifest["num_buckets"]
    elif num_buckets is None:
        num_buckets = 32
    if not bootstrapped:
        res = run_kg_pipeline(
            pages, out_dir, alias_rows, num_buckets=num_buckets,
            concurrency=concurrency, resume=False,
        )
        mode = "bootstrap"
    else:
        res = run_kg_incremental(
            pages, out_dir, alias_rows, _shard_urls(new_paths),
            num_buckets=num_buckets, concurrency=concurrency,
        )
        mode = "incremental"

    wave = ack["waves"] + 1
    for s in new:
        ack["shards"][s] = {"wave": wave}
    ack["waves"] = wave
    _write_ack(out_dir, ack)  # ack strictly AFTER the store swap
    return {
        "mode": mode,
        "wave": wave,
        "new_shards": new,
        "metrics": res["metrics"],
    }


def watch_loop(watch_dir: str, out_dir: str, alias_rows, *,
               poll_sec: float = 5.0, max_waves: int | None = None,
               idle_exit: int | None = None,
               num_buckets: int | None = None, concurrency=4,
               on_wave=None) -> list[dict]:
    """Poll until ``max_waves`` waves processed or ``idle_exit``
    consecutive idle polls (None = run forever — the daemon shape).
    ``num_buckets``/``concurrency`` forward to :func:`watch_once`
    (bucket count applies to the bootstrap wave; an existing store's
    manifest overrides it on every later poll)."""
    waves: list[dict] = []
    idle = 0
    while True:
        res = watch_once(watch_dir, out_dir, alias_rows,
                         num_buckets=num_buckets,
                         concurrency=concurrency)
        if res is None:
            idle += 1
            if idle_exit is not None and idle >= idle_exit:
                return waves
            time.sleep(poll_sec)
            continue
        idle = 0
        waves.append(res)
        if on_wave is not None:
            on_wave(res)
        if max_waves is not None and len(waves) >= max_waves:
            return waves
