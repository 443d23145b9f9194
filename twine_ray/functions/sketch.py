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


# ---------------------------------------------------------------------------
# Bloom filter over int64 keys (Bloom 1970) — the join-prefilter sketch.
#
# Same distribution contract as the HLL above: per-batch partial bitmaps
# built vectorized, merged with elementwise OR (associative+commutative,
# so partials combine under any partitioning and only fixed-size bitmap
# rows shuffle).  Hashing is splitmix64 finalization (public constant
# mixer, Steele/Lea/Flatt 2014) — pure uint64 numpy arithmetic, so the
# bitmap is bit-identical across processes with no Python-hash seed
# dependence.  k hash probes are derived by double hashing
# (Kirsch–Mitzenmacher 2006): h_i = h1 + i*h2 mod m.
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 17  # 16 KiB packed; ~1% FPR at ~11k keys with k=4
BLOOM_K = 4


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) \
        .astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) \
        .astype(np.uint64)
    return (x ^ (x >> np.uint64(31))).astype(np.uint64)


def _bloom_probes(values, m: int, k: int):
    """(k, n) int64 array of bit indices for each value."""
    v = np.asarray(values, dtype=np.int64).astype(np.uint64)
    h1 = _splitmix64(v)
    h2 = _splitmix64(v ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    # scalar loop over the k probes: numpy's uint64 2-D broadcast path
    # is ~50x slower than its contiguous scalar loops (same fix as the
    # MinHash permutation kernel); output is bit-identical
    out = np.empty((k, len(v)), dtype=np.uint64)
    mm = np.uint64(m)
    for j in range(k):
        np.mod(h1 + np.uint64(j) * h2, mm, out=out[j])
    return out.astype(np.int64)


def bloom_bits(values, m: int = BLOOM_BITS, k: int = BLOOM_K) -> np.ndarray:
    """Packed uint8[m/8] bitmap with every value's k probe bits set."""
    bits = np.zeros(m, dtype=bool)
    if len(values):
        bits[_bloom_probes(values, m, k).ravel()] = True
    return np.packbits(bits)


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


def bloom_might_contain(packed: np.ndarray, values,
                        m: int = BLOOM_BITS, k: int = BLOOM_K) -> np.ndarray:
    """bool[n] — False is definite; True may be a false positive."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    bits = np.unpackbits(packed)
    return bits[_bloom_probes(values, m, k)].all(axis=0).astype(bool)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, the public algorithm)
# ---------------------------------------------------------------------------

CMS_D = 4          # rows (independent hash functions)
CMS_W = 8192       # columns per row


def cms_counts(values, weights=None, d: int = CMS_D,
               w: int = CMS_W) -> np.ndarray:
    """int64[d, w] Count-Min table for a sequence of values.

    Row hashes derive from ONE SipHash pass + splitmix64 row salts
    (deterministic across processes); the update is one
    ``np.add.at`` per row — no Python loop over values."""
    t = np.zeros((d, w), dtype=np.int64)
    if len(values) == 0:
        return t
    h = pd.util.hash_pandas_object(
        pd.Series(list(values), dtype=object), index=False,
        categorize=False,
    ).to_numpy().astype(np.uint64)
    wts = (np.asarray(weights, dtype=np.int64)
           if weights is not None else np.ones(len(h), dtype=np.int64))
    for r in range(d):
        hr = _splitmix64(h + np.uint64((0x9E3779B97F4A7C15 * (r + 1)) & 0xFFFFFFFFFFFFFFFF))
        np.add.at(t[r], (hr % np.uint64(w)).astype(np.int64), wts)
    return t


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise sum — associative/commutative, any partitioning."""
    return a + b


def cms_query(t: np.ndarray, values) -> np.ndarray:
    """Point estimates (min over rows) — never underestimates."""
    d, w = t.shape
    h = pd.util.hash_pandas_object(
        pd.Series(list(values), dtype=object), index=False,
        categorize=False,
    ).to_numpy().astype(np.uint64)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(d):
        hr = _splitmix64(h + np.uint64((0x9E3779B97F4A7C15 * (r + 1)) & 0xFFFFFFFFFFFFFFFF))
        est = np.minimum(est, t[r][(hr % np.uint64(w)).astype(np.int64)])
    return est
