"""Integer k-means + SemDeDup (pipelines/cluster.py): distributed
pipelines equal the driver-side scalar specs bit-for-bit, and the
removal rule's exact-integer cosine predicate holds."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def micro(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    X = np.floor(
        np.asarray(t["embedding"].to_pylist(), dtype=np.float64) * 1_000_000
    ).astype(np.int64)
    order = np.argsort(ids)
    return ids[order], X[order]


def test_kmeans_distributed_equals_spec(ray_session, micro):
    from twine_ray.pipelines.cluster import kmeans_spec, q_embed_kmeans

    ids, X = micro
    got = (
        q_embed_kmeans(SF)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (got["vec_id"].to_numpy() == ids).all()
    assert (got["cluster"].to_numpy() == kmeans_spec(X, 8, 2)).all()


def test_kmeans_more_iters_converges(ray_session, micro):
    """More iterations still bit-match the spec (exercises >1 centroid
    update, incl. the empty-cluster keep-previous rule)."""
    from twine_ray.pipelines.cluster import kmeans_assign, kmeans_spec

    ids, X = micro
    got = (
        kmeans_assign(SF, k=8, iters=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (got["cluster"].to_numpy() == kmeans_spec(X, 8, 4)).all()


def test_semdedup_distributed_equals_spec(ray_session, micro):
    from twine_ray.pipelines.cluster import q_embed_semdedup, semdedup_spec

    ids, X = micro
    kept = sorted(
        q_embed_semdedup(SF).to_pandas()["vec_id"].tolist()
    )
    assert kept == semdedup_spec(ids, X, 8)


def test_semdedup_removal_is_witnessed(ray_session, micro):
    """Exactly the removal rule, re-derived independently: an id is
    removed iff SOME lower-id vector in its cluster passes the exact
    integer cosine predicate — and the smallest id of every cluster is
    always kept."""
    from twine_ray.pipelines.cluster import (
        SEM_DEN,
        SEM_NUM,
        _nearest,
        init_centroids,
        semdedup_spec,
    )

    ids, X = micro
    kept = set(semdedup_spec(ids, X, 8))
    removed = {int(i) for i in ids if int(i) not in kept}
    assert removed, "corpus should contain planted near-dups"
    C = init_centroids(SF, 8)
    assign = _nearest(X, C)
    by_id = {int(i): (int(assign[n]), X[n]) for n, i in enumerate(ids)}
    for c in range(len(C)):
        members = sorted(i for i, (ci, _) in by_id.items() if ci == c)
        if members:
            assert members[0] in kept
    for b in sorted(by_id):
        cb, vb = by_id[b]
        nb = int((vb.astype(object) * vb.astype(object)).sum())
        witnessed = False
        for a in sorted(by_id):
            if a >= b:
                break
            ca, va = by_id[a]
            if ca != cb:
                continue
            d = int((va.astype(object) * vb.astype(object)).sum())
            na = int((va.astype(object) * va.astype(object)).sum())
            if d > 0 and d * d * SEM_DEN >= SEM_NUM * na * nb:
                witnessed = True
                break
        assert witnessed == (b in removed), b


def test_semdedup_broadcast_equals_antijoin_fallback(
    ray_session, micro, monkeypatch
):
    """Force the dup-dense anti-join path (monkeypatched broadcast
    valve) and assert it equals the broadcast path — the removed set
    must never need the driver."""
    from twine_ray.pipelines import cluster

    broadcast_kept = sorted(
        cluster.q_embed_semdedup(SF).to_pandas()["vec_id"].tolist()
    )
    monkeypatch.setattr(cluster, "SEMDEDUP_BROADCAST_LIMIT", 0)
    fallback_kept = sorted(
        cluster.q_embed_semdedup(SF).to_pandas()["vec_id"].tolist()
    )
    assert fallback_kept == broadcast_kept
    ids, X = micro
    assert fallback_kept == cluster.semdedup_spec(ids, X, 8)
