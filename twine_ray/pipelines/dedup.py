"""Deduplication family over the ``documents`` table (training-data
pipeline extras; task brief lists these as first-class components).

- exact: content-hash groupby, keep min doc_id (SQL-oracled);
- MinHash + LSH: shingle -> signature -> band explode -> bucket
  groupby -> candidate pairs -> Jaccard verify -> connected components;
- SimHash: 64-bit signature, banded by 4x16-bit chunks, Hamming verify;
- n-gram Jaccard: exact pairwise verify within cheap candidate buckets;
- embedding cosine near-dup: see twine_ray.pipelines.similarity.

All stages follow the sketch pattern (SURVEY.md §2.5 / ray guide):
signatures computed per batch in an actor pool (hash params built once
per actor), exploded to (bucket, doc) rows, ONE groupby per level, and
a pair-verify stage that never materializes the corpus on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from twine_ray.functions.fingerprint import (
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_params,
    minhash_signature,
    simhash64,
    word_shingles,
)
from twine_ray.stages.canon import union_find_local

NUM_PERM = 128
BANDS = 32  # 32 bands x 4 rows: catches J >= ~0.5 reliably
JACCARD_THRESHOLD = 0.8
SIMHASH_MAX_HAMMING = 3


def _noop_pandas(df: pd.DataFrame) -> pd.DataFrame:
    return df


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# exact dedup (A5 on documents)
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    """One surviving doc_id (the min) per distinct text: partial
    per-batch reduce, then hash-bucketed vectorized merge on the
    content hash (associative: min of mins, sum of counts)."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        if "text_md5" not in df.columns:
            df = df.assign(
                text_md5=df["text"].map(
                    lambda t: hashlib.md5((t or "").encode()).hexdigest()
                ),
                n_copies=1,
            ).drop(columns=["text"])
        out = df.groupby("text_md5", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n_copies", "sum")
        )
        return out

    return bucketed_group_reduce(ds, ["text_md5"], _reduce)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


class _MinHashStage:
    """Signature + band keys per doc; hash coefficients once per actor.

    Signatures for the WHOLE batch are computed in one vectorized pass:
    all shingles hashed at once (vectorized SipHash), the (a*x+b) mod p
    permutation matrix built once, and per-doc minima taken with
    ``np.minimum.reduceat`` over the flat shingle array — no per-doc
    numpy dispatch, identical output to the scalar spec
    (``functions.fingerprint.minhash_signature``, cross-checked in
    tests)."""

    def __init__(self, num_perm: int = NUM_PERM, bands: int = BANDS) -> None:
        self.a, self.b = minhash_params(num_perm)
        self.bands = bands

    def signatures(self, texts) -> np.ndarray:
        from twine_ray.functions.fingerprint import (
            _MERSENNE31,
            shingle_hashes,
        )

        shingle_lists = [sorted(word_shingles(t or "")) for t in texts]
        counts = np.array([len(s) for s in shingle_lists], dtype=np.int64)
        flat = [s for lst in shingle_lists for s in lst]
        sigs = np.full((len(texts), len(self.a)), _MERSENNE31,
                       dtype=np.uint64)
        if flat:
            base = shingle_hashes(flat)  # (n_shingles,)
            vals = (base[:, None] * self.a[None, :] + self.b[None, :]) \
                % np.uint64(_MERSENNE31)
            nonempty = counts > 0
            starts = np.zeros(len(texts), dtype=np.int64)
            starts[1:] = np.cumsum(counts)[:-1]
            mins = np.minimum.reduceat(vals, starts[nonempty], axis=0)
            sigs[nonempty] = mins
        return sigs

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = self.signatures(df["text"].tolist())
        rows = {"doc_id": [], "band_key": []}
        for doc_id, sig in zip(df["doc_id"], sigs):
            for key in lsh_band_keys(sig, self.bands):
                rows["doc_id"].append(int(doc_id))
                rows["band_key"].append(key)
        return pd.DataFrame(rows)


def _candidate_pairs(band_rows_ds):
    """(band_key, doc_id) rows -> distinct candidate (a, b) pairs.

    Pair generation is a vectorized self-merge per bucket of band keys
    (pandas C join), not a Python loop per band; the standard LSH
    contract is quadratic within a band — buckets are tiny by
    construction (log if one explodes is left to callers)."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="band_key", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return pd.DataFrame(
            {"a": m["doc_id_a"].values, "b": m["doc_id_b"].values}
        ).drop_duplicates()

    pairs = bucketed_group_reduce(
        band_rows_ds.map_batches(_noop_pandas, batch_format="pandas"),
        ["band_key"],
        _pairs,
        partial=False,
    )

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return bucketed_group_reduce(pairs, ["a", "b"], _dedup)


def q_dedup_minhash(sf_dir: str, threshold: float = JACCARD_THRESHOLD):
    """Near-dup clusters via MinHash-LSH; returns (doc_id, cluster_rep,
    n_cluster) for docs in clusters of size >= 2.

    Stages: batched signatures -> band explode -> bucket groupby ->
    candidate pairs (vectorized self-merge per bucket).  Verification
    then touches ONLY candidate documents: their texts are fetched with
    a pushdown filter and the exact Jaccard check runs on that small
    set — the corpus itself is never collected (LSH contract: the
    candidate set is orders of magnitude smaller than the corpus).
    """
    ds = _docs(sf_dir, ["doc_id", "text"])
    band_rows = ds.map_batches(
        _MinHashStage, batch_format="pandas", batch_size=512,
        concurrency=(1, 2),
    )
    pairs = _candidate_pairs(band_rows).to_pandas()
    if pairs.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "cluster_rep": pd.Series(dtype="int64"),
             "n_cluster": pd.Series(dtype="int64")}
        )

    cand_ids = sorted(set(pairs["a"]).union(pairs["b"]))

    import pyarrow as pa
    import pyarrow.compute as pc

    id_set = pa.array(cand_ids, type=pa.int64())

    def _only_cands(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=id_set))

    cand_rows = ds.map_batches(_only_cands,
                               batch_format="pyarrow").take_all()
    shingles = {
        int(r["doc_id"]): word_shingles(r["text"] or "") for r in cand_rows
    }

    sims = np.array([
        jaccard(shingles.get(a, set()), shingles.get(b, set()))
        for a, b in zip(pairs["a"], pairs["b"])
    ])
    verified = pairs[sims >= threshold]

    roots = union_find_local(
        [(f"{int(a):012d}", f"{int(b):012d}")
         for a, b in zip(verified["a"], verified["b"])]
    )
    sizes: dict[str, int] = {}
    for root in roots.values():
        sizes[root] = sizes.get(root, 0) + 1
    out = pd.DataFrame(
        {
            "doc_id": [int(m) for m in roots],
            "cluster_rep": [int(roots[m]) for m in roots],
            "n_cluster": [sizes[roots[m]] for m in roots],
        }
    ).sort_values("doc_id").reset_index(drop=True)
    return out


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def q_dedup_simhash(sf_dir: str, max_hamming: int = SIMHASH_MAX_HAMMING):
    """Near-dup pairs via SimHash: band on 4x16-bit chunks (any pair
    within Hamming distance <= 3 shares at least one exact chunk),
    verify Hamming on candidates.  Returns (a, b, hamming)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _sig(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "band_key": [], "sig": []}
        for doc_id, text in zip(df["doc_id"], df["text"]):
            h = simhash64(text or "")
            # two's-complement int64 so the column dtype is stable
            # across batches (raw uint64 values can exceed int64)
            h_i64 = h - (1 << 64) if h >= (1 << 63) else h
            for band in range(4):
                chunk = (h >> (band * 16)) & 0xFFFF
                rows["doc_id"].append(int(doc_id))
                rows["band_key"].append(f"{band}:{chunk:04x}")
                rows["sig"].append(h_i64)
        return pd.DataFrame(rows)

    band_rows = ds.map_batches(_sig, batch_format="pandas", batch_size=512)

    from twine_ray.stages.grouped import bucketed_group_reduce

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="band_key", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if m.empty:
            return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(
                {"a": "int64", "b": "int64", "hamming": "int64"}
            )
        sa = m["sig_a"].to_numpy(dtype=np.int64)
        sb = m["sig_b"].to_numpy(dtype=np.int64)
        x = sa ^ sb
        # vectorized popcount via byte-view + unpackbits
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                            axis=1).sum(axis=1)
        m = m.assign(hamming=ham.astype("int64"))
        m = m[m["hamming"] <= max_hamming]
        return pd.DataFrame(
            {"a": m["doc_id_a"].values, "b": m["doc_id_b"].values,
             "hamming": m["hamming"].values}
        ).drop_duplicates()

    pairs = bucketed_group_reduce(
        band_rows.map_batches(_noop_pandas, batch_format="pandas"),
        ["band_key"],
        _pairs,
        partial=False,
    )

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return bucketed_group_reduce(pairs, ["a", "b"], _dedup)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, bucketed)
# ---------------------------------------------------------------------------


def q_dedup_jaccard(sf_dir: str, threshold: float = 0.5):
    """Exact n-gram-Jaccard pairs >= threshold among same-source docs
    (source = cheap blocking key).  Returns (a, b, jaccard)."""
    ds = _docs(sf_dir, ["doc_id", "text", "source"])

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(
            zip(df["doc_id"].tolist(), df["text"].tolist())
        )
        sh = {i: word_shingles(t or "") for i, t in recs}
        out = {"a": [], "b": [], "jaccard": []}
        ids = [i for i, _ in recs]
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                j = jaccard(sh[ids[x]], sh[ids[y]])
                if j >= threshold:
                    out["a"].append(ids[x])
                    out["b"].append(ids[y])
                    out["jaccard"].append(round(j, 4))
        return pd.DataFrame(out)

    return ds.groupby("source").map_groups(_pairs, batch_format="pandas")
