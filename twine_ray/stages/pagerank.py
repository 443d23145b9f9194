"""Distributed PageRank over an edge Dataset — the iterative-algorithm
slot of the task brief's custom-operator list (alongside union-find).

Classic damped PageRank, but in INTEGER micro-unit arithmetic so the
fixpoint is bit-deterministic under ANY partitioning (integer sums are
order-independent, float sums are not) and each unrolled iteration is
SQL-expressible — giving an iterative operator a DuckDB hash oracle:

    r0(v)   = 1_000_000
    contrib = r_k(u) // outdeg(u)        per edge (u, v)
    r_k+1(v)= 150_000 + (85 * sum_in(v)) // 100

Execution per iteration (all entity-scale by contract — the node
space is orders of magnitude below the corpus, like the coreference
graph):

    edges ⋈ ranks on u   (hash join, partition count sized to data)
      -> (v, contrib)    groupby-sum with per-batch combiner
      -> nodes left-join sums -> next ranks

Dangling nodes (no outgoing edges) simply contribute nothing; nodes
with no incoming edges settle at the base 150_000.
"""

from __future__ import annotations

import pandas as pd

BASE = 150_000
R0 = 1_000_000
DAMP_NUM, DAMP_DEN = 85, 100

# Below this edge count the whole graph is computed driver-side with
# one vectorized numpy kernel — the same entity-scale valve as the DSU
# bound in stages/canon.py (connected_components).  The distributed
# path costs ~7 Ray exchanges per run regardless of size; on an
# entity-scale graph (the contract: nodes ≪ corpus) that is pure
# orchestration.  Integer arithmetic makes the two paths bit-identical
# (tested equal in tests/test_pagerank.py).
PAGERANK_LOCAL_LIMIT = 2_000_000


def _pagerank_local(edf: pd.DataFrame, iters: int) -> pd.DataFrame:
    """Vectorized single-process kernel: factorize node ids, bincount
    out-degrees, np.add.at for the exact int64 contribution sums."""
    import numpy as np

    both = pd.concat([edf["u"], edf["v"]], ignore_index=True)
    codes, uniques = pd.factorize(both)
    n, m = len(uniques), len(edf)
    ui = codes[:m].astype(np.int64)
    vi = codes[m:].astype(np.int64)
    outdeg = np.bincount(ui, minlength=n).astype(np.int64)
    r = np.full(n, R0, dtype=np.int64)
    for _ in range(iters):
        s = np.zeros(n, dtype=np.int64)
        if m:
            np.add.at(s, vi, r[ui] // outdeg[ui])
        r = BASE + (DAMP_NUM * s) // DAMP_DEN
    return pd.DataFrame({"node": np.asarray(uniques), "pr": r})


def pagerank(edges_ds, iters: int = 3, local_limit: int | None = None):
    """(u, v) edge Dataset -> (node, pr) Dataset after ``iters``
    integer-PageRank iterations.  Edge multiplicity counts toward
    out-degree (callers wanting simple-graph semantics dedupe first).

    ``local_limit`` overrides PAGERANK_LOCAL_LIMIT (0 forces the
    distributed path — used by the equality tests)."""
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.stages.grouped import (
        bucketed_group_reduce,
        default_num_partitions,
    )

    edges = edges_ds.materialize()
    n_rows = edges.count()
    limit = PAGERANK_LOCAL_LIMIT if local_limit is None else local_limit
    if n_rows <= limit:
        return rd.from_pandas(
            _pagerank_local(edges.to_pandas(limit=None), iters)
        )
    n_parts = max(2, default_num_partitions(
        hi=64, rows=n_rows, rows_per_partition=100_000
    ))
    # bucket count sized to the data: the map_groups sort exchange
    # costs ~fixed time PER BUCKET, so 64 buckets on a 100k-edge graph
    # is pure overhead (same sizing rationale as the LSH band exchange)
    n_buckets = max(8, min(64, n_rows // 25_000))

    # distinct node set (u ∪ v) and out-degrees — one pass each
    def _nodes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([df["u"], df["v"]]).unique()}
        )

    nodes = bucketed_group_reduce(
        edges, ["node"],
        lambda df: (_nodes(df) if "node" not in df.columns
                    else df.drop_duplicates()),
        num_buckets=n_buckets,
    ).materialize()

    def _deg(df: pd.DataFrame) -> pd.DataFrame:
        if "outdeg" not in df.columns:
            df = df.assign(outdeg=1)[["u", "outdeg"]]
        return df.groupby("u", as_index=False).agg(
            outdeg=("outdeg", "sum")
        )

    outdeg = bucketed_group_reduce(
        edges, ["u"], _deg, num_buckets=n_buckets
    ).materialize()

    # edges ⋈ outdeg once (degree is iteration-invariant)
    edeg = edges.join(
        outdeg.map_batches(
            lambda t: t.rename_columns(["du", "outdeg"]),
            batch_format="pyarrow",
        ),
        join_type="inner", num_partitions=n_parts,
        on=("u",), right_on=("du",),
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"u": t["u"], "v": t["v"], "outdeg": t["outdeg"]}
        ),
        batch_format="pyarrow",
    ).materialize()

    ranks = nodes.map_batches(
        lambda df: df.assign(pr=R0), batch_format="pandas"
    ).materialize()

    for _ in range(iters):
        contrib = edeg.join(
            ranks.map_batches(
                lambda t: t.rename_columns(["rn", "pr"]),
                batch_format="pyarrow",
            ),
            join_type="inner", num_partitions=n_parts,
            on=("u",), right_on=("rn",),
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "v": df["v"],
                    "c": (df["pr"].astype("int64")
                          // df["outdeg"].astype("int64")),
                }
            ),
            batch_format="pandas",
        )

        def _sum(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("v", as_index=False).agg(c=("c", "sum"))

        sums = bucketed_group_reduce(
            contrib, ["v"], _sum, num_buckets=n_buckets
        )

        # sums comes out of map_groups: repartition+materialize guards
        # the empty-schema-block join quirk (stages/canon.py)
        ranks = nodes.join(
            sums.map_batches(
                lambda t: t.rename_columns(["sv", "c"]),
                batch_format="pyarrow",
            ).repartition(n_parts).materialize(),
            join_type="left_outer", num_partitions=n_parts,
            on=("node",), right_on=("sv",),
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"],
                    "pr": (
                        BASE
                        + (DAMP_NUM
                           * df["c"].fillna(0).astype("int64"))
                        // DAMP_DEN
                    ).astype("int64"),
                }
            ),
            batch_format="pandas",
        ).materialize()

    return ranks


def pagerank_spec(edges: list[tuple[str, str]], iters: int = 3) -> dict:
    """Driver-side scalar spec (tests): same integer recurrence."""
    nodes = sorted({x for e in edges for x in e})
    outdeg: dict[str, int] = {}
    for u, _v in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {n: R0 for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {n: BASE + (DAMP_NUM * s[n]) // DAMP_DEN for n in nodes}
    return r
