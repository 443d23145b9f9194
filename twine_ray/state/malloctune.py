"""glibc malloc tuning for expensive first-touch page faults.

This sandbox runs in a microVM where every newly-mapped page faults
through the VMM (~0.2 ms per 4 KiB fault ≈ 22 MB/s first-touch).
glibc mmap's every allocation above M_MMAP_THRESHOLD (≤32 MB) and
munmaps it on free, so EVERY large numpy/pandas temporary — a join
frame, a gather output, a signature matrix — pays the full fault cost
again.  Raising the mmap/trim thresholds keeps big allocations on the
brk heap, which is retained across frees and THP-backed: measured
11.8 s → 1.7 s cold / 1.4 → 0.8 s warm for the triangle wedge kernel,
6.2 s → 1.4 s for a 267 MB fancy-index gather.

glibc reads the ``MALLOC_*_`` environment variables ONCE at process
start, so they cannot be applied from inside a running interpreter:

- driver processes (bench.py, tools/) call :func:`reexec_tuned` as
  their first statement — a no-op when the vars are already set;
- Ray worker processes get them through
  ``ray.init(runtime_env={"env_vars": MALLOC_ENV})``.

Pure environment/allocator tuning — no effect on results, only on
page-fault volume; harmless (slightly higher RSS per worker) on
ordinary kernels.
"""

from __future__ import annotations

import os
import sys

MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
    "MALLOC_TOP_PAD_": str(1 << 28),
}


def reexec_tuned() -> None:
    """Re-exec the current process with MALLOC_ENV set (no-op if
    already set).  Call before heavy imports; argv is preserved."""
    if os.environ.get("MALLOC_MMAP_THRESHOLD_"):
        return
    if os.environ.get("MALLOC_TUNE") == "0":  # A/B escape hatch
        return
    env = dict(os.environ, **MALLOC_ENV)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
