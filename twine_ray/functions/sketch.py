"""HyperLogLog distinct-count sketch (Flajolet–Fusy–Gandouet–Meunier
2007, the public algorithm) — the mergeable-sketch slot of the task
brief's custom-operator list.

Design for the Ray engine:
- registers are a fixed 2^P byte array per group, built VECTORIZED per
  batch (one pandas SipHash pass + numpy bit arithmetic — no Python
  loop over rows);
- the merge is elementwise ``np.maximum`` — associative and
  commutative, so partial sketches combine under any partitioning
  (bucketed_group_reduce's contract) and, on a cluster, only
  ``2^P``-byte rows ever shuffle, never the raw values;
- hashing is ``pd.util.hash_pandas_object`` (SipHash, fixed key):
  deterministic across processes/machines, so the sketch — not just
  the estimate — is reproducible bit-for-bit (tested under
  repartitioning).

Rank uses the 32 bits below the P index bits (cap 33): exact in
float64, so the vectorized log2 path has no boundary error.  The
estimator applies the standard small-range linear-counting correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

P = 12
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def hll_registers(values) -> np.ndarray:
    """uint8[M] register array for a sequence of hashable values."""
    regs = np.zeros(M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = pd.util.hash_pandas_object(
        pd.Series(list(values), dtype=object), index=False,
        categorize=False,
    ).to_numpy().astype(np.uint64)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest32 = ((h >> np.uint64(64 - P - 32)) & np.uint64(0xFFFFFFFF)) \
        .astype(np.int64)
    # rank = (#leading zeros of the 32-bit window) + 1; zero window -> 33
    nonzero = rest32 > 0
    rank = np.full(len(h), 33, dtype=np.uint8)
    rank[nonzero] = (
        32 - np.floor(np.log2(rest32[nonzero])).astype(np.int64)
    ).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with the standard small-range correction."""
    regs = regs.astype(np.float64)
    e = _ALPHA * M * M / np.sum(np.power(2.0, -regs))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * M and zeros > 0:
        return float(M * np.log(M / zeros))
    return float(e)
