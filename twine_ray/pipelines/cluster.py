"""Embedding clustering + semantic dedup over the ``embeddings`` table.

The scale path for embedding-based curation (task brief "embedding-
cosine near-dup"; reference analog: Spindle's per-proxy scoring is the
closest twine-side aggregation — `spindle:generate/` — but clustering
itself is our training-data extra):

- ``kmeans_assign``: distributed Lloyd's iterations.  Centroids are
  BROADCAST once per iteration (``ray.put`` via state.broadcast, read
  in every actor's ``__init__``); each pass over the corpus is one
  ``map_batches`` that emits per-batch PARTIAL per-cluster sums (k
  rows per batch, dim int64 columns), merged by one k-row bucketed
  exchange.  Nothing corpus-scale touches the driver: only the k
  (cluster, count, sum_0..sum_{d-1}) rows do.
- ``semdedup``: SemDeDup-style semantic dedup (Abbas et al. 2023,
  arXiv:2303.09540 — public method): assign every vector to its
  nearest centroid, then WITHIN each cluster drop any vector whose
  cosine similarity to a lower-id cluster member is >= the threshold.
  The all-pairs step is confined to one cluster (the whole point of
  the method); the cluster exchange is one bucketed groupby.

Determinism contract (what makes the DuckDB oracle hash-match): all
arithmetic is int64 micro-units — component = floor(x * 1e6), exact in
float64 because float32 mantissa (24 bits) x 1e6 (20 bits) fits 53
bits.  Distances / dots / sums are exact integers, associative under
any partitioning; centroid update is floor(sum / count); argmin ties
break to the smallest centroid id.  The cosine test is the exact
integer predicate  dot > 0  AND  dot^2 * DEN >= NUM * |a|^2 * |b|^2
(t^2 = NUM/DEN), evaluated in unbounded ints (DuckDB side: HUGEINT).

Scale notes (100 TB): the corpus streams once per Lloyd iteration plus
once for the final assignment; per-iteration exchange volume is
k x num_blocks partial rows (k x dim int64 each), NOT the corpus.
semdedup's cluster exchange moves each embedding exactly once; cluster
sizes are bounded by choosing k ~ n / target_cluster_size (the
SemDeDup paper's operating point), and the within-cluster matmul is
O(|cluster|^2 * dim) numpy — the documented partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MICRO = 1_000_000
DEFAULT_K = 8
DEFAULT_ITERS = 2
# semantic-dup threshold t = 0.4 as the exact rational t^2 = NUM/DEN
SEM_NUM, SEM_DEN = 4, 25
# removed-id sets up to this size broadcast (ray.put once, filtered in
# map_batches — zero shuffle); above it the distributed anti-join
# fallback runs, so a dup-dense corpus never materializes on the
# driver (the CANON_BROADCAST_LIMIT valve pattern)
SEMDEDUP_BROADCAST_LIMIT = 2_000_000


def _list_matrix(col, dtype) -> np.ndarray:
    """Arrow list column -> 2-D numpy, zero Python-object hops: flatten
    the child values and reshape (embeddings are fixed-dim; asserted)."""
    import pyarrow as pa

    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if lens.min() != lens.max():
        # ragged (shouldn't happen for embeddings) — slow exact path;
        # a divisible-total ragged column must NOT silently reshape
        return np.asarray(col.to_pylist(), dtype=dtype)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(flat.reshape(n, -1)).astype(
        dtype, copy=False
    )


def _emb_micro(sf_dir: str):
    """Lazy Dataset of (vec_id, v: list<int64> micro components)."""
    import pyarrow as pa

    from twine_ray.sources.readers import sized_read_parquet

    # data-determined block plan: Ray's static 200-block floor makes
    # hundreds of near-empty blocks of this small table, and EVERY
    # Lloyd pass then pays 200 tasks of pure orchestration
    ds = sized_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def _to_micro(t: pa.Table) -> pa.Table:
        X = np.floor(
            _list_matrix(t["embedding"], np.float64) * MICRO
        ).astype(np.int64)
        n, dim = X.shape if X.ndim == 2 else (0, 0)
        offsets = pa.array(
            np.arange(0, (n + 1) * dim, max(dim, 1), dtype=np.int32)[
                : n + 1
            ]
        )
        v = pa.ListArray.from_arrays(
            offsets, pa.array(X.ravel(), type=pa.int64())
        )
        return pa.table({"vec_id": t["vec_id"], "v": v})

    return ds.map_batches(_to_micro, batch_format="pyarrow")


# Materialized micro corpus per (ray job, sf_dir): iterative algorithms
# (Lloyd's, semdedup's assign+filter) stream the SAME converted corpus
# several times — materialize the conversion once and share it, the
# standard Ray trade for iterative ML (the object store spills at
# scale; nothing lands on the driver).
_EMB_CACHE: dict = {}


def emb_micro_cached(sf_dir: str):
    import ray

    key = (ray.get_runtime_context().get_job_id(), sf_dir)
    ds = _EMB_CACHE.get(key)
    if ds is None:
        ds = _emb_micro(sf_dir).materialize()
        _EMB_CACHE[key] = ds
    return ds


def _batch_matrix(t) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    X = _list_matrix(t["v"], np.int64)
    return ids, X


def _nearest(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact int64 argmin of squared L2 distance; ties -> smallest
    centroid index (np.argmin returns the first minimum)."""
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; all terms exact int64
    dots = X @ C.T
    nc = (C * C).sum(axis=1)
    d = nc[None, :] - 2 * dots  # ||x||^2 is constant per row
    return np.argmin(d, axis=1)


def init_centroids(sf_dir: str, k: int = DEFAULT_K) -> np.ndarray:
    """Deterministic seed: the k smallest vec_ids' vectors (tiny,
    filter-pruned read)."""
    rows = (
        emb_micro_cached(sf_dir)
        .filter(expr=f"vec_id < {k}")
        .take_all()
    )
    rows.sort(key=lambda r: r["vec_id"])
    if len(rows) != k:
        raise ValueError(f"need vec_ids 0..{k-1} for seeding, got "
                         f"{len(rows)} rows")
    return np.asarray([r["v"] for r in rows], dtype=np.int64)


class _AssignPartials:
    """Per-batch assignment + partial per-cluster sums (k rows out)."""

    def __init__(self, cent_ref) -> None:
        from twine_ray.state.broadcast import resolve

        self.C = np.asarray(resolve(cent_ref), dtype=np.int64)

    def __call__(self, t) -> pd.DataFrame:
        _, X = _batch_matrix(t)
        k, dim = self.C.shape
        cols: dict = {"cluster": np.arange(k, dtype=np.int64)}
        if len(X) == 0:
            # Ray Data can deliver empty blocks (post-filter, sparse
            # repartition); emit an all-zero k-row partial — _list_matrix
            # yields shape (0, 0) and X @ C.T would raise on dim mismatch
            cols["cnt"] = np.zeros(k, dtype=np.int64)
            for j in range(dim):
                cols[f"s{j}"] = np.zeros(k, dtype=np.int64)
            return pd.DataFrame(cols)
        a = _nearest(X, self.C)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        cols["cnt"] = cnt
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, a, X)
        for j in range(dim):
            cols[f"s{j}"] = sums[:, j]
        return pd.DataFrame(cols)


def _update_centroids(emb, C: np.ndarray):
    """One Lloyd step: stream the corpus, merge k partial rows, floor
    the integer means; empty clusters keep their previous centroid."""
    from twine_ray.stages.grouped import bucketed_group_reduce
    from twine_ray.state.broadcast import broadcast, pool

    k, dim = C.shape
    partials = emb.map_batches(
        _AssignPartials,
        fn_constructor_kwargs={"cent_ref": broadcast(C)},
        batch_format="pyarrow",
        concurrency=pool(8),
    )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cluster", sort=False).sum().reset_index()

    rows = bucketed_group_reduce(
        partials, ["cluster"], _merge, num_buckets=max(2, min(16, k)),
        partial=False,  # _AssignPartials already emits k rows per batch
    ).take_all()  # exactly k rows
    newC = C.copy()
    for r in rows:
        c, cnt = int(r["cluster"]), int(r["cnt"])
        if cnt > 0:
            newC[c] = np.asarray(
                [int(r[f"s{j}"]) // cnt for j in range(dim)],
                dtype=np.int64,
            )
    return newC


def kmeans_centroids(sf_dir: str, k: int = DEFAULT_K,
                     iters: int = DEFAULT_ITERS) -> np.ndarray:
    """Centroids entering the FINAL assignment of ``iters`` Lloyd
    iterations (iters-1 update steps: the last iteration assigns
    only, matching the unrolled SQL oracle)."""
    emb = emb_micro_cached(sf_dir)
    C = init_centroids(sf_dir, k)
    for _ in range(iters - 1):
        C = _update_centroids(emb, C)
    return C


class _AssignOnly:
    def __init__(self, cent_ref) -> None:
        from twine_ray.state.broadcast import resolve

        self.C = np.asarray(resolve(cent_ref), dtype=np.int64)

    def __call__(self, t):
        import pyarrow as pa

        ids, X = _batch_matrix(t)
        if len(X) == 0:  # empty block: schema-stable empty output
            return pa.table({
                "vec_id": pa.array([], type=pa.int64()),
                "cluster": pa.array([], type=pa.int64()),
            })
        a = _nearest(X, self.C)
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "cluster": pa.array(a.astype(np.int64), type=pa.int64()),
        })


def kmeans_assign(sf_dir: str, k: int = DEFAULT_K,
                  iters: int = DEFAULT_ITERS):
    """Dataset of (vec_id, cluster) after ``iters`` Lloyd iterations."""
    from twine_ray.state.broadcast import broadcast, pool

    C = kmeans_centroids(sf_dir, k, iters)
    return emb_micro_cached(sf_dir).map_batches(
        _AssignOnly,
        fn_constructor_kwargs={"cent_ref": broadcast(C)},
        batch_format="pyarrow",
        concurrency=pool(8),
    )


def kmeans_spec(X: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Driver-side scalar reference (tests): assignment after ``iters``
    iterations over micro-int vectors ordered by row index; row i of X
    is vec_id i, seeds are rows 0..k-1."""
    C = X[:k].copy()
    for it in range(iters):
        a = _nearest(X, C)
        if it == iters - 1:
            return a
        newC = C.copy()
        for c in range(k):
            m = a == c
            if m.any():
                s = X[m].sum(axis=0)
                newC[c] = np.asarray(
                    [int(v) // int(m.sum()) for v in s], dtype=np.int64
                )
        C = newC
    return _nearest(X, C)


def q_embed_kmeans(sf_dir: str, k: int = DEFAULT_K,
                   iters: int = DEFAULT_ITERS):
    """Integer k-means assignment (vec_id, cluster) — SQL-oracled: the
    DuckDB oracle unrolls the same iterations with list lambdas, exact
    because every operation is integer."""
    return kmeans_assign(sf_dir, k, iters)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup
# ---------------------------------------------------------------------------


def _cluster_removed(ids: np.ndarray, M: np.ndarray) -> set[int]:
    """Removed vec_ids of ONE cluster: b is removed iff some a < b in
    the cluster has cos(a, b) >= t.

    Two-tier exact test: a vectorized float64 pre-filter keeps only
    pairs at/near the threshold (margin 1e-9 relative), then each
    candidate is decided by the EXACT unbounded-int predicate — the
    hot path stays numpy, exactness is preserved at the boundary."""
    removed: set[int] = set()
    if len(ids) < 2:
        return removed
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    dots = M @ M.T  # exact int64
    nrm = (M * M).sum(axis=1)  # exact int64
    lhs = dots.astype(np.float64) ** 2 * SEM_DEN
    rhs = SEM_NUM * np.outer(nrm, nrm).astype(np.float64)
    cand = (dots > 0) & (lhs >= rhs * (1.0 - 1e-9))
    cand &= np.triu(np.ones_like(cand, dtype=bool), k=1)
    for i, j in zip(*np.nonzero(cand)):
        d = int(dots[i, j])
        if d > 0 and d * d * SEM_DEN >= SEM_NUM * int(nrm[i]) * int(nrm[j]):
            removed.add(int(ids[j]))
    return removed


def _semdedup_group(df: pd.DataFrame) -> pd.DataFrame:
    """Removed vec_ids of a bucket — a union of COMPLETE clusters (the
    bucketed_group_reduce contract); the pair test runs per cluster."""
    removed: set[int] = set()
    for _, g in df.groupby("cluster", sort=False):
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        M = np.asarray(g["v"].to_numpy().tolist(), dtype=np.int64)
        removed |= _cluster_removed(ids, M)
    return pd.DataFrame({
        "vec_id": pd.Series(sorted(removed), dtype="int64")
    })


def semdedup(sf_dir: str, k: int = DEFAULT_K):
    """Kept vec_ids after within-cluster cosine dedup (assignment to
    the deterministic seed centroids — one corpus pass, one cluster
    exchange, per-cluster numpy pair scan)."""
    import pyarrow as pa

    from twine_ray.stages.grouped import bucketed_group_reduce
    from twine_ray.state.broadcast import broadcast, pool

    C = init_centroids(sf_dir, k)
    emb = emb_micro_cached(sf_dir)

    class _AssignKeepVec:
        def __init__(self, cent_ref) -> None:
            from twine_ray.state.broadcast import resolve

            self.C = np.asarray(resolve(cent_ref), dtype=np.int64)

        def __call__(self, t):
            ids, X = _batch_matrix(t)
            if len(X) == 0:  # empty block: schema-stable empty output
                return pa.table({
                    "vec_id": pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.list_(pa.int64())),
                })
            a = _nearest(X, self.C)
            return pa.table({
                "vec_id": pa.array(ids, type=pa.int64()),
                "cluster": pa.array(a.astype(np.int64)),
                "v": t["v"],
            })

    assigned = emb.map_batches(
        _AssignKeepVec,
        fn_constructor_kwargs={"cent_ref": broadcast(C)},
        batch_format="pyarrow",
        concurrency=pool(8),
    )
    removed = bucketed_group_reduce(
        assigned, ["cluster"], _semdedup_group,
        num_buckets=max(2, min(16, k)),
        partial=False,  # pair test needs COMPLETE clusters
    ).materialize()
    n_removed = removed.count()
    if n_removed <= SEMDEDUP_BROADCAST_LIMIT:
        # clean-corpus fast path: broadcast the removed-id set, zero
        # further shuffle
        from twine_ray.state.broadcast import broadcast as _bc

        removed_ids = {int(r["vec_id"]) for r in removed.take_all()}
        rref = _bc(np.asarray(sorted(removed_ids), dtype=np.int64))

        class _KeepFilter:
            def __init__(self, ref) -> None:
                from twine_ray.state.broadcast import resolve

                self.removed = resolve(ref)

            def __call__(self, t):
                import pyarrow.compute as pc

                mask = pc.invert(pc.is_in(
                    t["vec_id"],
                    value_set=pa.array(self.removed, type=pa.int64()),
                ))
                return t.select(["vec_id"]).filter(mask)

        return emb_micro_cached(sf_dir).map_batches(
            _KeepFilter,
            fn_constructor_kwargs={"ref": rref},
            batch_format="pyarrow",
            concurrency=pool(4),
        )

    # dup-dense fallback: the removed set is corpus-scale (e.g. a 50%-
    # duplicate crawl), so it must never land on the driver — anti-join
    # ids against it distributed (left-outer + null-marker filter, the
    # bgp_minus shape)
    from twine_ray.stages.grouped import default_num_partitions

    ids_only = emb_micro_cached(sf_dir).map_batches(
        lambda t: t.select(["vec_id"]), batch_format="pyarrow",
    ).materialize()
    n_parts = max(2, default_num_partitions(
        hi=32, rows=max(ids_only.count(), n_removed),
        rows_per_partition=500_000,
    ))
    marked = removed.map_batches(
        lambda df: df.rename(columns={"vec_id": "rid"}).assign(__m=1),
        batch_format="pandas",
    ).repartition(n_parts).materialize()
    joined = ids_only.repartition(n_parts).materialize().join(
        marked, join_type="left_outer", num_partitions=n_parts,
        on=("vec_id",), right_on=("rid",),
    )

    def _keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_null(t["__m"])).select(["vec_id"])

    return joined.map_batches(_keep, batch_format="pyarrow")


def semdedup_spec(ids: np.ndarray, X: np.ndarray, k: int) -> list[int]:
    """Driver-side scalar reference (tests): kept vec_ids; X rows
    ordered by vec_id, seeds = rows with vec_id < k."""
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    C = X[ids < k]
    a = _nearest(X, C)
    removed: set[int] = set()
    for c in range(len(C)):
        m = a == c
        mi, M = ids[m], X[m]
        dots = M @ M.T
        nrm = (M * M).sum(axis=1)
        for i in range(len(mi)):
            for j in range(i + 1, len(mi)):
                d = int(dots[i, j])
                if d > 0 and d * d * SEM_DEN >= \
                        SEM_NUM * int(nrm[i]) * int(nrm[j]):
                    removed.add(int(mi[j]))
    return sorted(int(i) for i in ids if int(i) not in removed)


def q_embed_semdedup(sf_dir: str, k: int = DEFAULT_K):
    """SemDeDup kept-ids — SQL-oracled (DuckDB reconstructs the
    assignment with list lambdas and the exact HUGEINT cosine test)."""
    return semdedup(sf_dir, k)
