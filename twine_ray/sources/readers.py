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

Non-local URIs (s3://, gs://, hdfs://): sizes are resolved through
``pyarrow.fs`` so remote inputs still get a data-determined plan; if a
filesystem can't be resolved or lists nothing, we fall back to Ray's
OWN planner (omit ``override_num_blocks``) rather than forcing one
giant block (ADVICE r3).
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


def _is_local(p: str) -> bool:
    return "://" not in p or p.startswith("file://")


def _remote_files(p: str):
    """(FileSystem, [FileInfo]) for a non-local URI via pyarrow.fs;
    (None, []) when the scheme can't be resolved (no credentials, no
    such filesystem) — callers fall back to Ray's planner."""
    try:
        from pyarrow import fs as pafs

        filesystem, path = pafs.FileSystem.from_uri(p)
        info = filesystem.get_file_info(path)
        if info.type == pafs.FileType.Directory:
            sel = pafs.FileSelector(path, recursive=True)
            return filesystem, [
                fi for fi in filesystem.get_file_info(sel)
                if fi.is_file and fi.path.endswith(".parquet")
            ]
        if info.type == pafs.FileType.File:
            return filesystem, [info]
    except Exception:
        pass
    return None, []


def _total_bytes(paths: list[str]) -> tuple[int, int]:
    total = 0
    n_files = 0
    for p in paths:
        if not _is_local(p):
            _, infos = _remote_files(p)
            for fi in infos:
                total += fi.size or 0
                n_files += 1
            continue
        p = p.removeprefix("file://")
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
                    target_bytes: int = TARGET_BLOCK_BYTES) -> int | None:
    """Block count from bytes on disk — identical at every parallelism
    level (the scaling-gate invariant).  ``None`` means "no measurable
    bytes" (unresolvable remote URI, missing path): let Ray plan."""
    if isinstance(paths, str):
        paths = [paths]
    total, n_files = _total_bytes(paths)
    if total <= 0:
        return None
    want = max(1, -(-total // target_bytes))  # ceil
    return min(want, max(1, n_files) * MAX_SPLITS_PER_FILE)


def sized_read_parquet(paths, columns=None, **kwargs):
    """``ray.data.read_parquet`` with a data-determined block plan."""
    import ray.data as rd

    if "override_num_blocks" not in kwargs:
        n = plan_num_blocks(paths)
        if n is not None:
            kwargs["override_num_blocks"] = n
    return rd.read_parquet(paths, columns=columns, **kwargs)


def _total_rows(paths: list[str]) -> int | None:
    """Total rows from Parquet footers; ``None`` when nothing could be
    measured (remote URI with no resolvable filesystem, missing path)."""
    import pyarrow.parquet as pq

    total = 0
    found = False
    for p in paths:
        if not _is_local(p):
            filesystem, infos = _remote_files(p)
            for fi in infos:
                with filesystem.open_input_file(fi.path) as f:
                    total += pq.ParquetFile(f).metadata.num_rows
                found = True
            continue
        p = p.removeprefix("file://")
        files = []
        if os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                files += [os.path.join(root, f) for f in names
                          if f.endswith(".parquet")]
        elif os.path.exists(p):
            files = [p]
        for f in files:
            total += pq.ParquetFile(f).metadata.num_rows
            found = True
    return total if found else None


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
        if rows is not None:
            # cap: callers with truly huge inputs split by bytes
            # instead (sized_read_parquet); 4096 blocks bounds plan
            # overhead
            kwargs["override_num_blocks"] = (
                max(1, min(4096, -(-rows // rows_per_block)))
            )
    return rd.read_parquet(paths, columns=columns, **kwargs)
