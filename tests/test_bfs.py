"""BFS reachability (stages/bfs.py): distributed == local == scalar
spec, depth bounding, and frontier-exhaustion early stop."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from twine_ray.stages.bfs import bfs_reachable, bfs_spec


def _edges_ds(edges, parts=None):
    df = pd.DataFrame(edges, columns=["u", "v"])
    ds = rd.from_pandas(df)
    return ds.repartition(parts) if parts else ds


def _as_dict(ds):
    df = ds.to_pandas()
    return dict(zip(df["node"], df["min_depth"]))


def test_bfs_min_depth_and_bound(ray_session):
    # diamond + chain: d reachable at 2 via two paths, f cut by bound
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    want = bfs_spec(edges, [0], 3)
    assert want == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}
    assert _as_dict(bfs_reachable(_edges_ds(edges), [0], 3)) == want


def test_bfs_local_equals_distributed(ray_session):
    edges = sorted(
        {(i % 37, (i * 11 + 3) % 37) for i in range(400)}
    )
    want = bfs_spec(edges, [0, 5], 3)
    local = _as_dict(bfs_reachable(_edges_ds(edges), [0, 5], 3))
    dist = _as_dict(
        bfs_reachable(_edges_ds(edges, parts=7), [0, 5], 3,
                      local_limit=0)
    )
    assert local == want
    assert dist == want


def test_bfs_cycle_terminates_with_min_depth(ray_session):
    edges = [(0, 1), (1, 2), (2, 0)]
    want = {0: 0, 1: 1, 2: 2}
    assert bfs_spec(edges, [0], 5) == want
    assert _as_dict(bfs_reachable(_edges_ds(edges), [0], 5)) == want
    assert _as_dict(
        bfs_reachable(_edges_ds(edges), [0], 5, local_limit=0)
    ) == want


def test_bfs_unreachable_component_excluded(ray_session):
    edges = [(0, 1), (7, 8)]
    got = _as_dict(bfs_reachable(_edges_ds(edges), [0], 3))
    assert got == {0: 0, 1: 1}


def _pairs_spec(edges, max_depth):
    """Naive all-pairs bounded closure with min hop count.  The start
    node is NOT pre-marked visited: a cycle returning to it records a
    (s, s) pair — `?s p+ ?s` matches on cycles."""
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    out: dict = {}
    for s in adj:
        best: dict = {}
        frontier = {s}
        for d in range(1, max_depth + 1):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in best:
                        best[v] = d
                        nxt.add(v)
            frontier = nxt
        for n, d in best.items():
            out[(s, n)] = d
    return out


def _pairs_dict(ds):
    return {
        (r["start"], r["node"]): r["min_depth"] for r in ds.take_all()
    }


def test_path_pairs_local_equals_distributed_and_spec(ray_session):
    import random

    from twine_ray.stages.bfs import path_pairs

    rng = random.Random(7)
    edges = list({
        (rng.randrange(30), rng.randrange(30)) for _ in range(120)
    })
    want = _pairs_spec(edges, 3)
    local = _pairs_dict(path_pairs(_edges_ds(edges), 3))
    dist = _pairs_dict(path_pairs(_edges_ds(edges, parts=4), 3,
                                  local_limit=0))
    assert local == want
    assert dist == want


def test_path_pairs_min_depth_on_shortcut(ray_session):
    """A node reachable at depths 1 AND 2 reports 1; cycles stay
    bounded."""
    from twine_ray.stages.bfs import path_pairs

    edges = [(0, 1), (1, 2), (0, 2), (2, 0)]
    got = _pairs_dict(path_pairs(_edges_ds(edges), 2))
    assert got[(0, 1)] == 1 and got[(0, 2)] == 1
    assert got[(1, 2)] == 1 and got[(1, 0)] == 2
    assert got[(2, 0)] == 1 and got[(2, 1)] == 2
    assert (0, 0) in got and got[(0, 0)] == 2  # 0->2->0


def test_path_algebra_combinators(ray_session):
    """^p, p|q, p/q on a hand graph: ^(1->2) = 2->1;
    (1->2 | 2->3) / (2->3 | 3->4) = {1->3, 2->4}."""
    import ray.data as rd

    from twine_ray.stages.bfs import (
        edges_inverse,
        edges_seq,
        edges_union,
    )

    p = rd.from_items([{"u": 1, "v": 2}])
    q = rd.from_items([{"u": 2, "v": 3}, {"u": 3, "v": 4}])
    inv = sorted(
        (r["u"], r["v"]) for r in edges_inverse(p).take_all()
    )
    assert inv == [(2, 1)]
    seq = sorted(
        (r["u"], r["v"])
        for r in edges_seq(edges_union(p, q), q).take_all()
    )
    assert seq == [(1, 3), (2, 4)]
