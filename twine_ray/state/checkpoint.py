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

import os
import shutil


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
