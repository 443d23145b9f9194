"""Integer PageRank (stages/pagerank.py): distributed == scalar spec,
partitioning-invariant, and structurally sensible."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from twine_ray.stages.pagerank import BASE, R0, pagerank, pagerank_spec


def _edges_ds(edges, parts=None):
    df = pd.DataFrame(edges, columns=["u", "v"])
    ds = rd.from_pandas(df)
    return ds.repartition(parts) if parts else ds


def test_pagerank_equals_spec_small_graph(ray_session):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("e", "c"), ("f", "c"),
    ]
    want = pagerank_spec(edges, iters=3)
    got = pagerank(_edges_ds(edges), iters=3).to_pandas()
    assert dict(zip(got["node"], got["pr"])) == want
    # the hub 'c' dominates; the pure-source nodes sit at the floor
    assert want["c"] == max(want.values())
    floor = BASE + (85 * 0) // 100
    assert want["d"] == want["e"] == want["f"] == floor


def test_pagerank_partitioning_invariant(ray_session):
    edges = [(f"u{i % 17}", f"v{(i * 7) % 13}") for i in range(200)]
    edges = sorted(set(edges))
    a = pagerank(_edges_ds(edges), iters=3).to_pandas()
    b = pagerank(_edges_ds(edges, parts=11), iters=3).to_pandas()
    da = dict(zip(a["node"], a["pr"]))
    db = dict(zip(b["node"], b["pr"]))
    assert da == db == pagerank_spec(edges, iters=3)


def test_pagerank_local_equals_distributed(ray_session):
    # local_limit=0 forces the multi-exchange distributed path; the
    # default routes this entity-scale graph through the driver-local
    # numpy kernel — both must match the scalar spec bit-for-bit,
    # including duplicate-edge out-degree multiplicity
    edges = [(f"n{i % 23}", f"n{(i * 5 + 1) % 19}") for i in range(300)]
    want = pagerank_spec(edges, iters=3)
    local = pagerank(_edges_ds(edges), iters=3).to_pandas()
    dist = pagerank(_edges_ds(edges), iters=3, local_limit=0).to_pandas()
    assert dict(zip(local["node"], local["pr"])) == want
    assert dict(zip(dist["node"], dist["pr"])) == want


def test_pagerank_zero_iters_is_r0(ray_session):
    got = pagerank(_edges_ds([("x", "y")]), iters=0).to_pandas()
    assert set(got["pr"]) == {R0} and set(got["node"]) == {"x", "y"}
