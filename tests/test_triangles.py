"""Triangle counting (stages/triangles.py): distributed == brute-force
spec, partitioning-invariant, orientation-proof on known graphs."""

from __future__ import annotations

import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from twine_ray.stages.triangles import triangle_count, triangle_count_spec


def _ds(edges, parts=None):
    df = pd.DataFrame(edges, columns=["u", "v"]).astype("int64")
    ds = rd.from_pandas(df)
    return ds.repartition(parts) if parts else ds


def test_known_graphs(ray_session):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert triangle_count(_ds(k4)) == 4 == triangle_count_spec(k4)
    path = [(0, 1), (1, 2), (2, 3)]
    assert triangle_count(_ds(path)) == 0
    tri_plus_noise = [(0, 1), (1, 2), (2, 0), (2, 2), (1, 0), (3, 4)]
    # self-loop, duplicate and reversed edges must not change the count
    assert triangle_count(_ds(tri_plus_noise)) == 1


def test_local_equals_distributed(ray_session):
    # local_limit=0 forces the join-based distributed path; default
    # routes through the driver-local degree-oriented kernel
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(i, (i + 1) % 12) for i in range(12)]
    want = triangle_count_spec(edges)
    assert want > 0
    assert triangle_count(_ds(edges)) == want
    assert triangle_count(_ds(edges), local_limit=0) == want


def test_partitioning_invariant_with_hub(ray_session):
    # star hub 0 + a ring among leaves: hub degree >> leaf degree, so
    # degree orientation points leaf->hub and wedge volume stays small
    edges = [(0, i) for i in range(1, 30)]
    edges += [(i, i % 29 + 1) for i in range(1, 30)]
    want = triangle_count_spec(edges)
    assert want > 0
    assert triangle_count(_ds(edges)) == want
    assert triangle_count(_ds(edges, parts=7)) == want


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0, max_size=60,
    )
)
def test_matches_spec_random(ray_session, edges):
    real = [e for e in edges if e[0] != e[1]]
    if not real:
        assert triangle_count(_ds(edges or [(0, 0)])) == 0
        return
    assert triangle_count(_ds(edges)) == triangle_count_spec(edges)
