"""Stage A1: coreference closure — union-find over sameAs edges.

The reference resolves coreference incrementally: Spindle's correlate
stage merges proxies in Postgres under row locks whenever a new
``owl:sameAs``/``skos:exactMatch`` edge joins two equivalence classes
(``spindle:correlate/``, schema in ``spindle:migrate/``) — global
mutable state and the engine's serialization bottleneck.

Here canonicalization is a DETERMINISTIC BATCH COMPUTATION over the
edge set: connected components with the lexicographic-min member key as
the class representative, ``canon_id = uuid5(min_key)`` (retry ==
replay; no shared mutable store anywhere).

Two execution paths, same result (tested equal):
- driver DSU for small edge sets (the normal case — the entity graph is
  orders of magnitude smaller than the page corpus; collecting it is
  the broadcast-small-side pattern, not a hot-path materialization);
- distributed hash-min label propagation (groupby-min fixpoint over
  symmetrized edges) when the edge set exceeds the driver threshold —
  O(diameter) rounds of small shuffles, per the SparkER-style pattern
  referenced in SURVEY.md §2.5.
"""

from __future__ import annotations

import pyarrow as pa

from twine_ray.functions.ids import canon_uuid
from twine_ray.state.rulebase import canon_uri

CANON_SCHEMA = pa.schema(
    [
        ("member_key", pa.string()),
        ("canon_id", pa.string()),
        ("canon", pa.string()),  # Spindle-style proxy URI
        ("n_members", pa.int32()),
    ]
)

DRIVER_EDGE_LIMIT = 2_000_000


def union_find_local(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Naive DSU with path compression; root = lexicographic-min member.

    The spec + oracle for both execution paths.
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo
    return {node: find(node) for node in parent}


def canon_table_from_roots(roots: dict[str, str]) -> pa.Table:
    """member->root mapping -> canon_map Arrow table (FIXTURES.md T4)."""
    sizes: dict[str, int] = {}
    for r in roots.values():
        sizes[r] = sizes.get(r, 0) + 1
    members = sorted(roots)
    cids = {r: canon_uuid(r) for r in sizes}
    return pa.Table.from_pydict(
        {
            "member_key": members,
            "canon_id": [cids[roots[m]] for m in members],
            "canon": [canon_uri(cids[roots[m]]) for m in members],
            "n_members": [sizes[roots[m]] for m in members],
        },
        schema=CANON_SCHEMA,
    )


def _label_propagation(edges_ds, max_rounds: int = 50):
    """Distributed hash-min label propagation to fixpoint.

    edges_ds: Dataset with string columns (u, v).  Returns Dataset
    (node, label) at fixpoint.  Every round: each node's label becomes
    min(own, labels of neighbors) via a symmetrized edge join + groupby
    min.  The label table is |V|-sized — small relative to the corpus.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    def _sym(batch: pa.Table) -> pa.Table:
        u, v = batch["u"], batch["v"]
        return pa.Table.from_pydict(
            {
                "node": pa.concat_arrays(
                    [u.combine_chunks(), v.combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [v.combine_chunks(), u.combine_chunks()]
                ),
            }
        )

    sym = edges_ds.map_batches(_sym, batch_format="pyarrow").materialize()
    labels = (
        sym.groupby("node")
        .aggregate(Min("nbr", alias_name="label"))
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "node": t["node"],
                    "label": pa.compute.min_element_wise(
                        t["node"].combine_chunks(), t["label"].combine_chunks()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    n_parts = max(2, min(32, sym.num_blocks()))
    for _ in range(max_rounds):
        # neighbor labels: join edge (node, nbr) with labels on nbr
        nbr_lab = sym.join(
            labels,
            join_type="inner",
            num_partitions=n_parts,
            on=("nbr",),
            right_on=("node",),
            right_suffix="_r",
        ).map_batches(
            lambda t: pa.Table.from_pydict(
                {"node": t["node"], "label": t["label"]}
            ),
            batch_format="pyarrow",
        )
        new_labels = (
            labels.union(nbr_lab)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # converged? compare hash-sum of (node,label) pairs
        def _sig(ds):
            from twine_ray.functions.ids import stable_hash64

            def _h(t: pa.Table) -> pa.Table:
                vals = [
                    stable_hash64(f"{n}\x00{l}") % (1 << 61)
                    for n, l in zip(
                        t["node"].to_pylist(), t["label"].to_pylist()
                    )
                ]
                return pa.Table.from_pydict(
                    {"h": pa.array(vals, type=pa.int64())}
                )

            return ds.map_batches(_h, batch_format="pyarrow").sum("h")

        if _sig(new_labels) == _sig(labels):
            labels = new_labels
            break
        labels = new_labels
    return labels


def connected_components(edges_ds, driver_limit: int = DRIVER_EDGE_LIMIT,
                         force_distributed: bool = False):
    """edges Dataset (u, v) -> canon_map Dataset (CANON_SCHEMA)."""
    import ray.data as rd

    n_edges = edges_ds.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.Table.from_pydict(
                {"member_key": [], "canon_id": [], "canon": [],
                 "n_members": []},
                schema=CANON_SCHEMA,
            )
        )
    if not force_distributed and n_edges <= driver_limit:
        rows = edges_ds.take_all()
        roots = union_find_local([(r["u"], r["v"]) for r in rows])
        return rd.from_arrow(canon_table_from_roots(roots))

    labels = _label_propagation(edges_ds)

    # labels (node, label) -> canon table rows
    import pandas as pd

    def _sizes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"label": [df["label"].iloc[0]], "n_members": [len(df)]}
        )

    sizes = labels.groupby("label").map_groups(_sizes, batch_format="pandas")
    n_parts = max(2, min(32, labels.num_blocks()))
    joined = labels.join(
        sizes, join_type="inner", num_partitions=n_parts, on=("label",)
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        cids = df["label"].map(canon_uuid)
        return pd.DataFrame(
            {
                "member_key": df["node"],
                "canon_id": cids,
                "canon": cids.map(canon_uri),
                "n_members": df["n_members"].astype("int32"),
            }
        )

    return joined.map_batches(_finish, batch_format="pandas")
