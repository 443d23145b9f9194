"""Stable identifiers, hashes and bucketing (SURVEY.md §2.8).

- ``canon_uuid``: Spindle generates a proxy UUID per coreference class
  (``spindle:common``/``spindle:generate`` proxy creation).  We replace
  the Postgres-allocated UUID with a *deterministic* uuid5 of the
  lexicographic-min member key, so canonicalization is a pure function
  of the edge set (retry == replay; SURVEY.md §2.5 A1).
- ``stable_hash64`` / ``bucket_of``: partitioning keys.  Python's
  builtin ``hash`` is salted per process — never use it for
  partitioning.  We use blake2b (keyed, stdlib, C speed).
"""

from __future__ import annotations

import hashlib
import uuid

# Fixed namespace for canonical entity ids (uuid5 of the URL namespace +
# engine name; any fixed value works — it just must never change).
CANON_NAMESPACE = uuid.uuid5(uuid.NAMESPACE_URL, "twine-ray/canon")


def canon_uuid(min_member_key: str) -> str:
    """Deterministic canonical id for a coreference class."""
    return str(uuid.uuid5(CANON_NAMESPACE, min_member_key))


def stable_hash64(s: str) -> int:
    """Process-stable unsigned 64-bit hash of a string."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
    )


def bucket_of(s: str, num_buckets: int) -> int:
    """Deterministic bucket for partitioned output / sharded joins."""
    return stable_hash64(s) % num_buckets


def content_md5(data: bytes) -> str:
    """Content hash for exact dedup (hex). md5 is fine for dedup keys."""
    return hashlib.md5(data).hexdigest()
