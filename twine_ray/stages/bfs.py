"""Bounded-depth BFS reachability over an edge Dataset — the
property-path / transitive-closure slot of the custom-operator list
(the SPARQL ``p{,n}`` / ``p+`` analog next to stages/query.py's BGP
join; twine:SURVEY §2 names no native closure, Spindle resolves
``owl:sameAs`` chains via the coreference pass — this generalizes that
frontier expansion to any relation).

Semantics: given directed edges (u, v) and a seed set, return every
node reachable in at most ``max_depth`` hops with its MINIMUM depth
(seeds at depth 0).  Depth-bounded, so each unrolled level is
SQL-expressible and the whole operator has a recursive-CTE DuckDB
oracle.

Execution (the iterative-frontier shape):

    frontier_0 = seeds
    level k:  frontier_k ⋈ edges on u  ->  neighbor nodes
              per-level bucketed dedup  ->  frontier_{k+1}
    finish:   min-depth reduce over all (node, depth) levels

Partitioning assumptions, stated per the brief:
- per-level dedup bounds every frontier at |V|, so each hop moves at
  most |E| join rows — no visited-set anti-join is needed for the
  shallow closures this serves (path queries, sameAs chains).  A
  deep/unbounded BFS would add a visited anti-join per level to stop
  re-expanding old nodes; at max_depth <= ~4 the re-expansion cost is
  below the extra exchange it saves.
- the node space is entity-scale (≪ corpus, like the coreference
  graph), so graphs under BFS_LOCAL_LIMIT edges route through one
  driver-side numpy kernel — the same valve as stages/pagerank.py /
  canon.py, with the distributed path tested bit-equal via
  ``local_limit=0``.
"""

from __future__ import annotations

import pandas as pd

BFS_LOCAL_LIMIT = 2_000_000


def bfs_spec(edges, seeds, max_depth: int) -> dict:
    """Scalar reference: dict node -> min depth (<= max_depth)."""
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    depth = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, max_depth + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in depth:
                    depth[v] = d
                    nxt.add(v)
        frontier = nxt
    return depth


def _bfs_local(edf: pd.DataFrame, seeds, max_depth: int) -> pd.DataFrame:
    """Vectorized driver kernel: factorized ids, per-level numpy
    membership joins."""
    import numpy as np

    both = pd.concat(
        [edf["u"], edf["v"], pd.Series(list(seeds))], ignore_index=True
    )
    codes, uniques = pd.factorize(both)
    m = len(edf)
    ui = codes[:m]
    vi = codes[m : 2 * m]
    si = np.unique(codes[2 * m :])
    depth = np.full(len(uniques), -1, dtype=np.int64)
    depth[si] = 0
    frontier = si
    for d in range(1, max_depth + 1):
        hit = np.isin(ui, frontier)
        nxt = np.unique(vi[hit])
        nxt = nxt[depth[nxt] < 0]
        depth[nxt] = d
        frontier = nxt
        if frontier.size == 0:
            break
    keep = depth >= 0
    return pd.DataFrame(
        {"node": np.asarray(uniques)[keep], "min_depth": depth[keep]}
    )


def bfs_reachable(edges_ds, seeds, max_depth: int = 3,
                  local_limit: int | None = None):
    """(u, v) edge Dataset + seed list -> (node, min_depth) Dataset.

    ``local_limit`` overrides BFS_LOCAL_LIMIT (0 forces the
    distributed path — used by the equality tests)."""
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.stages.grouped import (
        bucketed_group_reduce,
        default_num_partitions,
    )

    edges = edges_ds.materialize()
    n_rows = edges.count()
    limit = BFS_LOCAL_LIMIT if local_limit is None else local_limit
    if n_rows <= limit:
        return rd.from_pandas(
            _bfs_local(edges.to_pandas(limit=None), seeds, max_depth)
        )

    n_parts = max(2, default_num_partitions(
        hi=64, rows=n_rows, rows_per_partition=100_000
    ))
    n_buckets = max(8, min(64, n_rows // 25_000))
    sch = edges.schema()
    node_type = sch.types[sch.names.index("u")]

    levels = []
    frontier = rd.from_arrow(
        pa.table({"node": pa.array(list(seeds), type=node_type)})
    ).materialize()
    levels.append(frontier.map_batches(
        lambda t: t.append_column(
            "min_depth", pa.array([0] * t.num_rows, type=pa.int64())
        ),
        batch_format="pyarrow",
    ))
    for d in range(1, max_depth + 1):
        hop = edges.join(
            frontier.map_batches(
                lambda t: t.rename_columns(["fu"]),
                batch_format="pyarrow",
            ).repartition(n_parts).materialize(),
            join_type="inner", num_partitions=n_parts,
            on=("u",), right_on=("fu",),
        )
        frontier = bucketed_group_reduce(
            hop.map_batches(
                lambda t: pa.Table.from_pydict({"node": t["v"]}),
                batch_format="pyarrow",
            ),
            ["node"],
            lambda df: df.drop_duplicates(),
            num_buckets=n_buckets,
        ).repartition(n_parts).materialize()
        if frontier.count() == 0:
            break
        levels.append(frontier.map_batches(
            lambda t, _d=d: t.append_column(
                "min_depth", pa.array([_d] * t.num_rows, type=pa.int64())
            ),
            batch_format="pyarrow",
        ))

    allv = levels[0]
    for lv in levels[1:]:
        allv = allv.union(lv)

    def _min(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False).agg(
            min_depth=("min_depth", "min")
        )
        out["min_depth"] = out["min_depth"].astype("int64")
        return out

    return bucketed_group_reduce(allv, ["node"], _min,
                                 num_buckets=n_buckets)


def _path_local(edf: pd.DataFrame, max_depth: int) -> pd.DataFrame:
    """Vectorized driver kernel for the all-pairs bounded closure."""
    e = edf[["u", "v"]].drop_duplicates()
    frontier = e.rename(columns={"u": "start", "v": "node"})
    levels = [frontier.assign(min_depth=1)]
    for d in range(2, max_depth + 1):
        nxt = (
            frontier.merge(e, left_on="node", right_on="u")
            [["start", "v"]]
            .rename(columns={"v": "node"})
            .drop_duplicates()
        )
        if nxt.empty:
            break
        levels.append(nxt.assign(min_depth=d))
        frontier = nxt
    allp = pd.concat(levels, ignore_index=True)
    out = allp.groupby(["start", "node"], as_index=False).agg(
        min_depth=("min_depth", "min")
    )
    out["min_depth"] = out["min_depth"].astype("int64")
    return out


def path_pairs(edges_ds, max_depth: int = 2,
               local_limit: int | None = None):
    """All-pairs bounded transitive closure — the SPARQL property-path
    ``p{1,n}`` analog with a free start: every (start, node) pair
    connected by 1..max_depth hops, with the MINIMUM hop count.
    (``bfs_reachable`` is the seeded special case; this one seeds every
    edge tail simultaneously, the shape of `?s p+ ?o` over the store.)

    Partitioning assumptions, stated per the brief: each level's join
    output is bounded by sum-of-out-degrees over the frontier — at
    depth d the pair set approaches |V| * avg-reach(d), so max_depth
    must stay small (<= ~3) for web-scale graphs; per-level bucketed
    dedup keyed (start, node) caps every frontier before the next
    join.  Entity-scale edge sets (the canon.py valve pattern) route
    through one driver-local pandas kernel; the distributed path is
    tested equal via ``local_limit=0``."""
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.stages.grouped import (
        bucketed_group_reduce,
        default_num_partitions,
    )

    edges = edges_ds.materialize()
    n_rows = edges.count()
    limit = BFS_LOCAL_LIMIT if local_limit is None else local_limit
    if n_rows <= limit:
        return rd.from_pandas(
            _path_local(edges.to_pandas(limit=None), max_depth)
        )

    n_parts = max(2, default_num_partitions(
        hi=64, rows=n_rows, rows_per_partition=100_000
    ))
    n_buckets = max(8, min(64, n_rows // 25_000))

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    frontier = bucketed_group_reduce(
        edges.map_batches(
            lambda t: pa.table({"start": t["u"], "node": t["v"]}),
            batch_format="pyarrow",
        ),
        ["start", "node"], _dedup, num_buckets=n_buckets,
    ).repartition(n_parts).materialize()
    levels = [frontier.map_batches(
        lambda t: t.append_column(
            "min_depth", pa.array([1] * t.num_rows, type=pa.int64())
        ),
        batch_format="pyarrow",
    )]
    for d in range(2, max_depth + 1):
        hop = edges.repartition(n_parts).materialize().join(
            frontier, join_type="inner", num_partitions=n_parts,
            on=("u",), right_on=("node",),
        )
        frontier = bucketed_group_reduce(
            hop.map_batches(
                lambda t: pa.table({"start": t["start"],
                                    "node": t["v"]}),
                batch_format="pyarrow",
            ),
            ["start", "node"], _dedup, num_buckets=n_buckets,
        ).repartition(n_parts).materialize()
        if frontier.count() == 0:
            break
        levels.append(frontier.map_batches(
            lambda t, _d=d: t.append_column(
                "min_depth",
                pa.array([_d] * t.num_rows, type=pa.int64()),
            ),
            batch_format="pyarrow",
        ))

    allp = levels[0]
    for lv in levels[1:]:
        allp = allp.union(lv)

    def _min(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["start", "node"], as_index=False).agg(
            min_depth=("min_depth", "min")
        )
        out["min_depth"] = out["min_depth"].astype("int64")
        return out

    return bucketed_group_reduce(allp, ["start", "node"], _min,
                                 num_buckets=n_buckets)


# ---------------------------------------------------------------------------
# Property-path algebra over edge Datasets (SPARQL ^p, p|q, p/q)
# ---------------------------------------------------------------------------


def edges_inverse(edges_ds):
    """``^p``: swap direction."""
    import pyarrow as pa

    return edges_ds.map_batches(
        lambda t: pa.table({"u": t["v"], "v": t["u"]}),
        batch_format="pyarrow",
    )


def edges_union(a_ds, b_ds):
    """``p|q``: bag union of edge sets (closures dedup per level, so
    duplicate edges cost nothing downstream)."""
    return a_ds.union(b_ds)


def edges_seq(a_ds, b_ds, num_partitions: int | None = None):
    """``p/q``: one hash join a.v = b.u -> (a.u, b.v), deduped by a
    bucketed exchange (join fan-out can repeat pairs)."""
    import pandas as pd

    from twine_ray.stages.grouped import (
        bucketed_group_reduce,
        default_num_partitions,
    )

    a = a_ds.materialize()
    b = b_ds.materialize()
    n_parts = num_partitions or max(2, default_num_partitions(
        hi=32, rows=max(a.count(), b.count()),
        rows_per_partition=200_000,
    ))
    joined = a.repartition(n_parts).materialize().join(
        b.map_batches(
            lambda t: t.rename_columns(["bu", "bv"]),
            batch_format="pyarrow",
        ).repartition(n_parts).materialize(),
        join_type="inner", num_partitions=n_parts,
        on=("v",), right_on=("bu",),
    )

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "u": df["u"], "v": df["bv"],
        }).drop_duplicates()

    return bucketed_group_reduce(
        joined.map_batches(_pairs, batch_format="pandas"),
        ["u", "v"], lambda df: df.drop_duplicates(),
    )


def edges_optional(edges_ds):
    """``p?`` (zero-or-one): p plus the identity pairs over p's node
    domain (SPARQL evaluates zero-length paths over the terms of the
    graph; we scope the domain to p's endpoints — the useful and
    SQL-reconstructible reading for a single relation)."""
    import pandas as pd

    from twine_ray.stages.grouped import bucketed_group_reduce

    def _nodes(df: pd.DataFrame) -> pd.DataFrame:
        n = pd.concat([df["u"], df["v"]], ignore_index=True)
        n = n.drop_duplicates()
        return pd.DataFrame({"u": n, "v": n})

    ident = bucketed_group_reduce(
        edges_ds.map_batches(_nodes, batch_format="pandas"),
        ["u"], lambda df: df.drop_duplicates(),
    )
    return edges_union(edges_ds, ident)
