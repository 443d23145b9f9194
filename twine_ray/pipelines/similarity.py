"""Similarity search over the ``embeddings`` table (training-data
pipeline extras): brute-force cosine top-k as the exact baseline, and an
LSH-bucketed variant as the scale path.

Pattern: the (small) query matrix is broadcast once via ``ray.put``;
each batch does one numpy matmul against it — vectorized, no Python
row loop, no shuffle.  The top-k merge is a single tiny reduction.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

ROUND = 6
DEFAULT_K = 5
N_QUERIES = 5  # vec_id < N_QUERIES are the query set


def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class _CosineTopK:
    """Per-batch exact cosine scores against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int) -> None:
        from twine_ray.state.broadcast import resolve

        q = resolve(queries_ref)
        self.qids = q["vec_id"]
        self.qmat = _normalize(np.asarray(q["mat"], dtype=np.float64))
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        cand_ids = df["vec_id"].to_numpy()
        mask = ~np.isin(cand_ids, self.qids)
        if not mask.any():
            return pd.DataFrame(
                {"query_id": [], "vec_id": [], "cosine": []}
            )
        cand_ids = cand_ids[mask]
        mat = _normalize(
            np.stack(df["embedding"].to_numpy()[mask]).astype(np.float64)
        )
        sims = self.qmat @ mat.T  # (n_queries, n_cands)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            if len(row) > self.k:
                idx = np.argpartition(-row, self.k)[: self.k]
            else:
                idx = np.arange(len(row))
            for j in idx:
                out["query_id"].append(int(qid))
                out["vec_id"].append(int(cand_ids[j]))
                out["cosine"].append(float(row[j]))
        return pd.DataFrame(out)


def _merge_topk(parts: pd.DataFrame, k: int) -> pd.DataFrame:
    """Driver-side merge of per-batch top-k candidates (tiny)."""
    rows = []
    for qid, g in parts.groupby("query_id"):
        top = heapq.nlargest(
            k, g.itertuples(index=False), key=lambda r: (r.cosine, -r.vec_id)
        )
        for rank, r in enumerate(top, 1):
            rows.append(
                {
                    "query_id": int(qid),
                    "rank": rank,
                    "vec_id": int(r.vec_id),
                    "cosine": round(float(r.cosine), ROUND),
                }
            )
    return pd.DataFrame(rows).sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def q_ann_topk_ids(sf_dir: str, k: int = DEFAULT_K):
    """Oracle-friendly projection of q_ann_topk: (query_id, rank,
    vec_id) only — no float column, so the DuckDB comparison is exact
    (cosine VALUES differ from DuckDB's float32 kernel at ~1e-8)."""
    return q_ann_topk(sf_dir, k)[["query_id", "rank", "vec_id"]]


def q_embed_neardup_ids(sf_dir: str, threshold: float = 0.4,
                        max_id: int = 300):
    """Oracle-friendly projection of q_embed_neardup: (a, b) only."""
    return q_embed_neardup(sf_dir, threshold, max_id)[["a", "b"]]


def q_ann_topk(sf_dir: str, k: int = DEFAULT_K):
    """Exact cosine top-k for query vectors (vec_id < N_QUERIES) over
    all other vectors. Returns (query_id, rank, vec_id, cosine)."""
    from twine_ray.state.broadcast import broadcast

    ds = _emb(sf_dir)
    qdf = (
        ds.filter(expr=f"vec_id < {N_QUERIES}")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries_ref = broadcast(
        {
            "vec_id": qdf["vec_id"].to_numpy(),
            "mat": np.stack(qdf["embedding"].to_numpy()),
        }
    )
    parts = ds.map_batches(
        _CosineTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pandas",
        batch_size=1024,
        concurrency=(1, 2),
    ).to_pandas()
    return _merge_topk(parts, k)


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# ---------------------------------------------------------------------------


class _SrpBucket:
    """Signed-random-projection bucket key per vector (deterministic
    hyperplanes, built once per actor)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 7) -> None:
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        bits = (mat @ self.planes.T) > 0
        keys = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"],
                "bucket": keys.astype(np.int64),
                "embedding": df["embedding"],
            }
        )


def q_ann_lsh(sf_dir: str, k: int = DEFAULT_K, n_planes: int = 6):
    """Approximate top-k: query and candidates must share an SRP
    bucket.  Same output schema as q_ann_topk (approximate contents —
    compared to the exact baseline by recall in tests, not equality)."""
    from twine_ray.state.broadcast import broadcast

    ds = _emb(sf_dir)
    first = ds.take(1)[0]
    dim = len(first["embedding"])

    bucketed = ds.map_batches(
        _SrpBucket,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 2),
    )

    qdf = bucketed.filter(expr=f"vec_id < {N_QUERIES}").to_pandas()
    qbuckets = sorted(set(qdf["bucket"].tolist()))

    def _in_buckets(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["bucket"].isin(qbuckets)]

    cand = bucketed.map_batches(_in_buckets, batch_format="pandas")

    queries_ref = broadcast(
        {
            "vec_id": qdf["vec_id"].to_numpy(),
            "mat": np.stack(qdf["embedding"].to_numpy()),
        }
    )
    parts = cand.map_batches(
        _CosineTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 2),
    ).to_pandas()
    return _merge_topk(parts, k)


def q_embed_neardup(sf_dir: str, threshold: float = 0.4,
                    max_id: int = 300):
    """Embedding-cosine near-dup pairs (cosine >= threshold) among
    vec_id < max_id (bounded so the SQL oracle's pairwise join stays
    small). Returns (a, b, cosine)."""
    ds = _emb(sf_dir).filter(expr=f"vec_id < {max_id}")
    df = ds.to_pandas().sort_values("vec_id")
    ids = df["vec_id"].to_numpy()
    mat = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
    sims = mat @ mat.T
    n = len(ids)
    iu, ju = np.triu_indices(n, k=1)
    hit = sims[iu, ju] >= threshold
    return pd.DataFrame(
        {
            "a": ids[iu[hit]].astype("int64"),
            "b": ids[ju[hit]].astype("int64"),
            "cosine": np.round(sims[iu[hit], ju[hit]], ROUND),
        }
    )
