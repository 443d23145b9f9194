"""Distributed triangle counting over an edge Dataset — the graph-
analytics slot alongside union-find (stages/canon.py) and PageRank
(stages/pagerank.py).

Scale shape is the standard degree-orientation algorithm (Chiba &
Nishizeki; the MapReduce form is Suri & Vassilvitskii, WWW'11
"Counting Triangles and the Curse of the Last Reducer"): orient every
canonical edge from its lower-(degree, id) endpoint to the higher one,
generate wedges only from each node's OUT-neighbors (out-degree is
O(sqrt(E)) under this orientation, so wedge volume is O(E^1.5) instead
of sum-of-squares over raw degrees — the hub node that would otherwise
produce deg^2 pairs points its edges outward and produces none), then
count wedges whose closing edge exists via one hash join.  The count
is orientation-invariant, which is what makes the simple a<b<c SQL
self-join a valid oracle for the degree-oriented plan.

Execution:

    edges -> canonicalize (a<b, drop loops) -> distinct (bucketed)
          -> degree count (bucketed sum over exploded endpoints)
          -> two hash joins to attach (deg_a, deg_b)
          -> orient by (deg, id)
          -> wedge generation: ONE shuffle on src, vectorized
             self-merge per bucket (pairs of out-neighbors)
          -> hash join wedges against oriented edges -> count

Everything corpus-scale streams through map_batches / joins; the only
driver-side value is the final count.
"""

from __future__ import annotations

import pandas as pd

# Below this raw-edge count the count is computed driver-side with the
# same degree-oriented pandas kernels (no Ray exchanges) — the
# entity-scale valve pattern of stages/canon.py / stages/pagerank.py.
# Wedge volume stays O(E^1.5) either way; the two paths are tested
# equal in tests/test_triangles.py.
TRIANGLE_LOCAL_LIMIT = 2_000_000


def _wedge_pairs(src, dst, dd):
    """All ordered out-neighbor pairs per src, numpy run-length
    enumeration: after lexsort by (src, dd, dst), taking index pairs
    i<j WITHIN each src run yields exactly the (dd, dst)-ordered wedge
    set — the ordering filter disappears and no O(sum deg^2)
    DataFrame is ever allocated (only the two final index arrays)."""
    import numpy as np

    order = np.lexsort((dst, dd, src))
    s, d = src[order], dst[order]
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    run_len = np.diff(np.r_[starts, len(s)])
    # element at position p (0-based) in its run pairs with the p
    # elements before it
    pos = np.arange(len(s)) - np.repeat(starts, run_len)
    j_idx = np.repeat(np.arange(len(s)), pos)
    run_start = np.repeat(starts, run_len)
    csum = np.cumsum(pos) - pos
    i_idx = (
        np.arange(int(pos.sum())) - np.repeat(csum, pos)
        + np.repeat(run_start, pos)
    )
    return d[i_idx], d[j_idx]


def _triangle_count_local(edf: pd.DataFrame) -> int:
    """Single-process degree-oriented count over one DataFrame —
    identical canon/orient/wedge/close steps, numpy pair enumeration
    + one pandas hash join in place of the distributed joins."""
    u, v = edf["u"], edf["v"]
    df = pd.DataFrame({"a": u.where(u <= v, v), "b": v.where(u <= v, u)})
    df = df[df["a"] != df["b"]].drop_duplicates()
    if df.empty:
        return 0
    vc = pd.concat([df["a"], df["b"]], ignore_index=True).value_counts()
    oriented = _orient(df.assign(
        deg_a=df["a"].map(vc).astype("int64"),
        deg_b=df["b"].map(vc).astype("int64"),
    ))
    wx, wy = _wedge_pairs(
        oriented["src"].to_numpy(),
        oriented["dst"].to_numpy(),
        oriented["dd"].to_numpy(),
    )
    closed = pd.DataFrame({"wx": wx, "wy": wy}).merge(
        oriented[["src", "dst"]],
        left_on=["wx", "wy"], right_on=["src", "dst"],
    )
    return len(closed)


def _canonical_edges(edges_ds, num_buckets: int = 32):
    """a = min(u,v), b = max(u,v); drop self-loops; distinct."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        u, v = df["u"], df["v"]
        out = pd.DataFrame({"a": u.where(u <= v, v), "b": v.where(u <= v, u)})
        return out[out["a"] != out["b"]].drop_duplicates()

    return bucketed_group_reduce(
        edges_ds.map_batches(_canon, batch_format="pandas"),
        ["a", "b"],
        lambda df: df.drop_duplicates(),
        num_buckets=num_buckets,
    )


def triangle_count(edges_ds, local_limit: int | None = None) -> int:
    """Number of triangles in the undirected graph given by an
    (u, v) edge Dataset (direction/duplicates/self-loops ignored).

    ``local_limit`` overrides TRIANGLE_LOCAL_LIMIT (0 forces the
    distributed path — used by the equality tests)."""
    from twine_ray.stages.grouped import (
        bucketed_group_reduce,
        default_num_partitions,
    )

    raw = edges_ds.materialize()
    limit = TRIANGLE_LOCAL_LIMIT if local_limit is None else local_limit
    if raw.count() <= limit:
        return _triangle_count_local(raw.to_pandas(limit=None))

    edges = _canonical_edges(raw).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return 0
    n_parts = max(2, default_num_partitions(
        hi=64, rows=n_edges, rows_per_partition=200_000
    ))
    # edges comes out of map_groups: repartition once so no empty-
    # schema block reaches a hash join (Ray 2.49 quirk, canon.py)
    edges = edges.repartition(n_parts).materialize()
    # bucket count sized to the data (sort exchange costs per bucket)
    n_buckets = max(8, min(64, n_edges // 25_000))

    # degree per node: explode endpoints, bucketed partial sums
    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([df["a"], df["b"]], ignore_index=True)
        vc = nodes.value_counts()
        return pd.DataFrame(
            {"node": vc.index, "deg": vc.to_numpy("int64")}
        )

    def _sum_deg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False).agg(deg=("deg", "sum"))

    deg = bucketed_group_reduce(
        edges.map_batches(_explode, batch_format="pandas"),
        ["node"],
        _sum_deg,
        partial=False,
        num_buckets=n_buckets,
    ).materialize()

    # attach both endpoint degrees (degree is static -> join once each)
    def _ren(cols):
        def f(t):
            return t.rename_columns(cols)
        return f

    # deg comes out of map_groups: repartition+materialize guards the
    # empty-schema-block join quirk (stages/canon.py)
    deg = deg.repartition(n_parts).materialize()
    with_da = edges.join(
        deg.map_batches(_ren(["na", "deg_a"]), batch_format="pyarrow"),
        join_type="inner", num_partitions=n_parts,
        on=("a",), right_on=("na",),
    )
    # join output partitions can be empty-schema blocks too: reblock
    # before feeding the next join (Ray 2.49 quirk, canon.py)
    with_da = with_da.repartition(n_parts).materialize()
    oriented = with_da.join(
        deg.map_batches(_ren(["nb", "deg_b"]), batch_format="pyarrow"),
        join_type="inner", num_partitions=n_parts,
        on=("b",), right_on=("nb",),
    ).map_batches(_orient, batch_format="pandas")

    # wedges: all ordered pairs of out-neighbors per src (one shuffle;
    # vectorized self-merge inside each bucket)
    def _wedges(df: pd.DataFrame) -> pd.DataFrame:
        wx, wy = _wedge_pairs(
            df["src"].to_numpy(),
            df["dst"].to_numpy(),
            df["dd"].to_numpy(),
        )
        return pd.DataFrame({"wx": wx, "wy": wy})

    # repartition+materialize before joining: map_groups output can
    # contain empty-schema blocks that break Ray 2.49's hash join
    # (same quirk documented in stages/canon.py)
    wedges = bucketed_group_reduce(
        oriented, ["src"], _wedges, partial=False,
        num_buckets=n_buckets,
    ).repartition(n_parts).materialize()
    if wedges.count() == 0:
        return 0

    # closing edge: wedge (wx, wy) is a triangle iff oriented edge
    # (src=wx, dst=wy) exists — orientation order is total, so the
    # closing edge can only be oriented this way
    closed = wedges.join(
        oriented.map_batches(
            lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
        ),
        join_type="inner", num_partitions=n_parts,
        on=("wx", "wy"), right_on=("src", "dst"),
    )
    return closed.count()


def _orient(df: pd.DataFrame) -> pd.DataFrame:
    """Point each edge at its higher-(degree, id) endpoint; keep the
    destination's (degree, id) for the wedge-pair ordering."""
    a_first = (df["deg_a"] < df["deg_b"]) | (
        (df["deg_a"] == df["deg_b"]) & (df["a"] < df["b"])
    )
    return pd.DataFrame(
        {
            "src": df["a"].where(a_first, df["b"]),
            "dst": df["b"].where(a_first, df["a"]),
            "dd": df["deg_b"].where(a_first, df["deg_a"]).astype("int64"),
        }
    )


def triangle_count_spec(edges: list[tuple, ]) -> int:
    """Driver-side brute-force spec for tests."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = 0
    for a, b in es:
        n += len(adj[a] & adj[b])
    return n // 3
