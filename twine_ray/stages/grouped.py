"""Bucketed group-reduce — the scale-safe replacement for per-key
map_groups.

``ds.groupby(keys).map_groups(fn)`` invokes the Python UDF ONCE PER
GROUP; with millions of tiny groups (one per (graph, subj, pred)) the
interpreter overhead dominates the pipeline.  The fix: hash the key
columns into B buckets, run ONE groupby on the bucket column, and apply
a VECTORIZED whole-DataFrame reduction per bucket (pandas C kernels
over thousands of key groups at once).

Correctness contract for ``reduce_fn``: it must be correct when applied
to any union of COMPLETE key groups (associative per key, vectorized
over keys) — which hash-bucketing by the full key guarantees.

Bucket hashing uses ``pd.util.hash_pandas_object`` (SipHash with a
fixed key) — deterministic across processes and machines, unlike
builtin ``hash``.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

BUCKET_COL = "__kb"


def default_num_partitions(lo: int = 2, hi: int = 256,
                           rows: int | None = None,
                           rows_per_partition: int = 100_000) -> int:
    """Shuffle/join partition count derived from the cluster (and the
    data when the caller knows its size), clamped to [lo, hi].

    NEVER exceeds the CPU count: Ray 2.49's hash join spawns one
    HashShuffleAggregator actor per partition, and requesting more
    aggregators than CPUs deadlocks the pipeline (observed:
    num_partitions=64 on a 32-CPU node hangs forever while 32
    completes — the extra actors can never schedule and the join never
    finalizes).

    With ``rows`` (an estimate of the LARGER join side), the count also
    scales DOWN for small inputs — every partition is a long-lived
    aggregator actor whose startup is pure overhead when it will only
    ever see a few thousand rows (measured: the same sf0.1 join takes
    4.0 s at 8 partitions vs 6.5 s at 32 on a 32-CPU node).  Falls back
    to 8 CPUs when Ray is not initialised (pure-driver unit tests)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) or 8
    except Exception:
        cpus = 8
    cap = max(lo, min(hi, cpus))
    if rows is None:
        return cap
    return max(lo, min(cap, -(-int(rows) // rows_per_partition)))


def add_key_bucket(df: pd.DataFrame, key_cols: list[str],
                   num_buckets: int) -> pd.DataFrame:
    import numpy as np

    h = np.zeros(len(df), dtype=np.uint64)
    for c in key_cols:
        # categorize=False: the categorize fast path runs through
        # pd.factorize, whose hashtable NUL-truncates C strings — a
        # string key containing '\\x00' would collide with its prefix
        # and hash first-seen-order-dependently (hypothesis-caught)
        hc = pd.util.hash_pandas_object(
            df[c], index=False, categorize=False
        ).to_numpy()
        # deterministic per-column mix (uint64 wraparound is defined)
        h = h * np.uint64(1099511628211) + hc
    return df.assign(**{BUCKET_COL: (h % num_buckets).astype("int32")})


def bucketed_group_reduce(
    ds,
    key_cols: list[str],
    reduce_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 64,
    partial: bool = True,
    final_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
):
    """partial per-batch reduce -> bucket keys -> ONE shuffle -> final
    vectorized reduce per bucket.

    ``final_fn`` (default: ``reduce_fn``) runs on the complete bucket
    instead — for reductions whose last step adds columns the partial
    must not (e.g. a rank over the final per-key top-k)."""
    if partial:
        ds = ds.map_batches(reduce_fn, batch_format="pandas")

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        return add_key_bucket(df, key_cols, num_buckets)

    ds = ds.map_batches(_bucket, batch_format="pandas")
    last = final_fn if final_fn is not None else reduce_fn

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return last(df.drop(columns=[BUCKET_COL]))

    return ds.groupby(BUCKET_COL).map_groups(_final, batch_format="pandas")
