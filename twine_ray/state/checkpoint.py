"""Checkpoint markers for resumable output (SURVEY.md §4 checkpoint row).

The reference's checkpoint is the AMQP queue itself: unacked messages
replay after a crash, and the idempotent whole-graph SPARQL PUT makes
redelivery safe (``twine:libtwine/sparql.c``).  For a batch pipeline the
same contract becomes: partitioned output + per-partition ``_DONE``
markers; a restart (a) removes partition dirs that have data but no
marker (the partial work of the crashed run) and (b) filters
already-marked partitions out of the input before recomputing.

Layout:  <out_dir>/data/<bucket_col>=<k>/*.parquet
         <out_dir>/_DONE/<k>
"""

from __future__ import annotations

import json
import os
import shutil


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_MANIFEST.json")


def ensure_manifest(out_dir: str, params: dict, reset: bool = False) -> None:
    """Pin the bucketing config markers were written under.

    ``_DONE`` markers store bare bucket ids; re-running with a different
    ``num_buckets`` (or bucketing scheme) would reinterpret old ids
    under the new hash partitioning and silently drop pages whose new
    bucket collides with a stale marker (ADVICE.md round 1, medium).

    - no manifest yet: write ``params`` (atomic rename).
    - manifest matches ``params``: no-op.
    - mismatch + ``reset``: wipe markers/data/lineage and start fresh
      (the resume=False path — a fresh run under new bucketing).
    - mismatch, no reset: raise — resuming would corrupt the output.
    """
    os.makedirs(out_dir, exist_ok=True)
    mp = _manifest_path(out_dir)
    if os.path.exists(mp):
        with open(mp) as f:
            existing = json.load(f)
        if existing == params:
            return
        if not reset:
            raise ValueError(
                f"checkpoint manifest mismatch in {out_dir}: markers were "
                f"written under {existing}, current run uses {params}; "
                "resuming would mis-skip buckets. Clear the output dir "
                "or rerun with resume=False."
            )
        for sub in ("_DONE", "_LINEAGE", "data"):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(params, f, sort_keys=True)
    os.replace(tmp, mp)


def read_manifest(out_dir: str) -> dict | None:
    mp = _manifest_path(out_dir)
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        return json.load(f)


def data_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def _marker_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_DONE")


def done_buckets(out_dir: str) -> set[int]:
    d = _marker_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    return {int(name) for name in os.listdir(d) if name.isdigit()}


def mark_done(out_dir: str, buckets) -> None:
    d = _marker_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    for b in buckets:
        # atomic create: write tmp then rename
        tmp = os.path.join(d, f".{int(b)}.tmp")
        with open(tmp, "w") as f:
            f.write("done\n")
        os.replace(tmp, os.path.join(d, str(int(b))))


def invalidate_buckets(out_dir: str, buckets, bucket_col: str) -> None:
    """Targeted invalidation (``twine -u`` analog): drop the _DONE
    marker, data partition dir and lineage record of each bucket so the
    next resumed run recomputes exactly those buckets."""
    for b in buckets:
        b = int(b)
        for path in (
            os.path.join(_marker_dir(out_dir), str(b)),
            os.path.join(out_dir, "_LINEAGE", f"{b}.json"),
        ):
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
        shutil.rmtree(
            os.path.join(data_dir(out_dir), f"{bucket_col}={b}"),
            ignore_errors=True,
        )


def clean_unmarked(out_dir: str, bucket_col: str) -> list[int]:
    """Remove partition dirs left by a crashed run (data, no marker).

    Returns the bucket ids that were cleaned.
    """
    done = done_buckets(out_dir)
    dd = data_dir(out_dir)
    cleaned = []
    if not os.path.isdir(dd):
        return cleaned
    prefix = f"{bucket_col}="
    for name in os.listdir(dd):
        if not name.startswith(prefix):
            continue
        try:
            b = int(name[len(prefix):])
        except ValueError:
            continue
        if b not in done:
            shutil.rmtree(os.path.join(dd, name), ignore_errors=True)
            cleaned.append(b)
    return cleaned
