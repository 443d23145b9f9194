"""Data-determined Parquet reads.

Ray's planner imposes a static floor of ``read_op_min_num_blocks``
(200) output blocks per read, independent of input size.  On a small
table that means hundreds of near-empty blocks whose per-block exchange
orchestration (~0.05-0.1 s each) dominates every downstream pass — the
round-2 scaling investigation measured exactly this (BENCH/BASELINE.md
"128-block plan").  The fix is the same one a real cluster needs: size
the block plan from the DATA (bytes on disk / a target block size),
never from the CPU count, so the plan is identical at every parallelism
level and a 100 TB input still splits into ~128 MB blocks.

``sized_read_parquet`` is a drop-in for ``ray.data.read_parquet`` that
passes ``override_num_blocks = clamp(bytes / target, 1, n_files*max)``.
"""

from __future__ import annotations

import os

# On-disk target per block. Parquet is compressed (~3-5x), so 32 MiB
# on disk decodes to ~Ray's own 128 MiB block target; vectorized batch
# kernels over such blocks are compute-bound, not orchestration-bound.
TARGET_BLOCK_BYTES = 32 << 20
# Per-file split ceiling: row-group granularity bounds how finely one
# file can split; 64 splits/file keeps the plan sane for huge files.
MAX_SPLITS_PER_FILE = 64


def _total_bytes(paths: list[str]) -> tuple[int, int]:
    total = 0
    n_files = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in files:
                    if f.endswith(".parquet"):
                        total += os.path.getsize(os.path.join(root, f))
                        n_files += 1
        elif os.path.exists(p):
            total += os.path.getsize(p)
            n_files += 1
    return total, n_files


def plan_num_blocks(paths: list[str] | str,
                    target_bytes: int = TARGET_BLOCK_BYTES) -> int:
    """Block count from bytes on disk — identical at every parallelism
    level (the scaling-gate invariant)."""
    if isinstance(paths, str):
        paths = [paths]
    total, n_files = _total_bytes(paths)
    if total <= 0:
        return 1
    want = max(1, -(-total // target_bytes))  # ceil
    return min(want, max(1, n_files) * MAX_SPLITS_PER_FILE)


def sized_read_parquet(paths, columns=None, **kwargs):
    """``ray.data.read_parquet`` with a data-determined block plan."""
    import ray.data as rd

    if "override_num_blocks" not in kwargs:
        kwargs["override_num_blocks"] = plan_num_blocks(paths)
    return rd.read_parquet(paths, columns=columns, **kwargs)


def _total_rows(paths: list[str]) -> int:
    import pyarrow.parquet as pq

    total = 0
    for p in paths:
        files = []
        if os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                files += [os.path.join(root, f) for f in names
                          if f.endswith(".parquet")]
        elif os.path.exists(p):
            files = [p]
        for f in files:
            total += pq.ParquetFile(f).metadata.num_rows
    return total


def rows_read_parquet(paths, columns=None, rows_per_block: int = 512,
                      **kwargs):
    """``read_parquet`` with a ROWS-based block plan, for reads feeding
    compute-heavy per-row stages (page synthesis, extraction): bytes on
    disk say nothing about downstream cost there, and a single block
    would starve the actor pool.  Row counts come from Parquet footer
    metadata (no data read).  Still data-determined — identical at
    every parallelism level."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    if "override_num_blocks" not in kwargs:
        rows = _total_rows(paths)
        # cap: callers with truly huge inputs split by bytes instead
        # (sized_read_parquet); 4096 blocks bounds plan overhead
        kwargs["override_num_blocks"] = (
            max(1, min(4096, -(-rows // rows_per_block)))
        )
    return rd.read_parquet(paths, columns=columns, **kwargs)
