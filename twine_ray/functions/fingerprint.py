"""Document fingerprints and sketches for dedup (training-data extras).

- shingles + MinHash (for MinHash-LSH near-dup)
- SimHash (64-bit)
- rolling-hash document fingerprint (Rabin-Karp style)
- n-gram sets for exact Jaccard verification

All deterministic: fixed hash (blake2b-derived permutation seeds), no
process salt.  The heavy per-batch use is via numpy in the Ray stages;
these scalar versions are the spec + test oracle.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WORD_RE = re.compile(r"[\w]+", re.UNICODE)
_WORD_RE_ASCII = re.compile(r"[\w]+", re.ASCII)

# Mersenne prime 2^31-1: keeps every product in (a * x + b) below 2^62,
# safely inside uint64 — no silent numpy overflow.
_MERSENNE31 = (1 << 31) - 1
_MERSENNE = (1 << 61) - 1  # used only by the scalar rolling hash
_MAXH = (1 << 32) - 1


def word_shingles(text: str, k: int = 3) -> set[str]:
    """Set of k-word shingles of the casefolded token stream."""
    toks = _WORD_RE.findall(text.casefold())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def word_shingles_ascii(text: str, k: int = 3) -> set[str]:
    """ASCII-\\w twin of ``word_shingles`` (lower() + ASCII word class),
    matching DuckDB/RE2 semantics exactly — used by the ORACLE-CHECKED
    ``dedup_jaccard`` so parity does not depend on the corpus being
    ASCII ('café' → Python-\\w ['café'] vs DuckDB ['caf']; ADVICE r2)."""
    toks = _WORD_RE_ASCII.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def passage_windows(text: str, w: int) -> list[str]:
    """Non-overlapping w-token passages of the ASCII-lowered token
    stream (the fixed-granularity analog of paragraph splitting for
    passage-level exact dedup); a trailing partial window is dropped.
    ASCII tokens keep DuckDB-RE2 oracle parity like
    ``word_shingles_ascii``."""
    toks = _WORD_RE_ASCII.findall(text.lower())
    return [
        " ".join(toks[i * w : (i + 1) * w])
        for i in range(len(toks) // w)
    ]


def shingle_hashes(shingles) -> np.ndarray:
    """Vectorized stable 31-bit hashes for a sequence of shingles
    (pandas SipHash with its fixed default key, categorize disabled —
    see twine_ray.stages.grouped for why).  The spec for both the
    scalar and the batched MinHash paths."""
    import pandas as pd

    if len(shingles) == 0:
        return np.empty(0, dtype=np.uint64)
    h = pd.util.hash_pandas_object(
        pd.Series(list(shingles), dtype=object), index=False,
        categorize=False,
    ).to_numpy()
    return h % np.uint64(_MERSENNE31)


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficients for num_perm universal hashes.

    a, b < 2^31 so (a * x + b) stays < 2^62 for x < 2^31 (no overflow).
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE31, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE31, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(
    shingles: set[str], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature (uint64 vector, len == num_perm)."""
    if not shingles:
        return np.full(len(a), _MERSENNE31, dtype=np.uint64)
    base = shingle_hashes(sorted(shingles))
    # (a * x + b) mod p; min over shingles. All intermediates < 2^62.
    vals = (np.outer(base, a) + b) % np.uint64(_MERSENNE31)
    return vals.min(axis=0)


def lsh_band_keys(sig: np.ndarray, bands: int) -> list[str]:
    """Band keys 'band_idx:hexdigest' for LSH bucketing."""
    rows = len(sig) // bands
    keys = []
    for i in range(bands):
        chunk = sig[i * rows : (i + 1) * rows].tobytes()
        h = hashlib.blake2b(chunk, digest_size=8).hexdigest()
        keys.append(f"{i}:{h}")
    return keys


def _h32(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=4).digest(), "big"
    )


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def simhash64(text: str) -> int:
    """64-bit SimHash over casefolded word tokens."""
    toks = _WORD_RE.findall(text.casefold())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
        )
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)
        ).astype(np.int64)
        acc += bits * 2 - 1
    out = np.packbits((acc > 0).astype(np.uint8))
    return int.from_bytes(out.tobytes(), "big")


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, window: int = 8, keep_mod: int = 16) -> list[int]:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hash over
    characters, keep hashes where h % keep_mod == 0 (sorted unique)."""
    s = text.casefold()
    if len(s) < window:
        return [_h32(s)] if s else []
    base, mod = 257, _MERSENNE
    h = 0
    pw = pow(base, window - 1, mod)
    kept: set[int] = set()
    for i, ch in enumerate(s):
        h = (h * base + ord(ch)) % mod
        if i >= window:
            h = (h - ord(s[i - window]) * pw * base) % mod
        if i >= window - 1 and h % keep_mod == 0:
            kept.add(h)
    return sorted(kept)
