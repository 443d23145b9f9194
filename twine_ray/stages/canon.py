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
        ("root", pa.string()),  # lexicographic-min member of the class
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
            "root": [roots[m] for m in members],
            "canon_id": [cids[roots[m]] for m in members],
            "canon": [canon_uri(cids[roots[m]]) for m in members],
            "n_members": [sizes[roots[m]] for m in members],
        },
        schema=CANON_SCHEMA,
    )


def _label_sig(labels_ds) -> tuple:
    """Order-independent signature of a (node, label) table: sums of
    TWO independently-salted per-row stable hashes in one pass — a
    single sum could theoretically collide across rounds and exit the
    fixpoint loop early with wrong labels (ADVICE.md round 1)."""
    from twine_ray.functions.ids import stable_hash64

    def _h(t: pa.Table) -> pa.Table:
        # mod 2^31 so the global int64 sums can never overflow
        keys = [
            f"{n}\x00{l}"
            for n, l in zip(t["node"].to_pylist(), t["label"].to_pylist())
        ]
        return pa.Table.from_pydict(
            {
                "h1": pa.array(
                    [stable_hash64(k) % (1 << 31) for k in keys],
                    type=pa.int64(),
                ),
                "h2": pa.array(
                    [stable_hash64("s2\x01" + k) % (1 << 31) for k in keys],
                    type=pa.int64(),
                ),
            }
        )

    hs = labels_ds.map_batches(_h, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    row = hs.aggregate(Sum("h1"), Sum("h2"))
    return (row["sum(h1)"], row["sum(h2)"])


def _label_propagation(edges_ds, max_rounds: int = 30):
    """Distributed hash-min label propagation WITH pointer jumping.

    edges_ds: Dataset with string columns (u, v).  Returns Dataset
    (node, label) at fixpoint.  Per round: (1) each node takes the min
    of its own and its neighbors' labels (edge join + groupby-min);
    (2) pointer jump — each node replaces its label with its label's
    label (label join), which shortcuts chains so convergence takes
    O(log diameter) rounds instead of O(diameter).  The label table is
    |V|-sized — small relative to the corpus.
    """
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
    prev_sig = _label_sig(labels)
    converged = False
    for _ in range(max_rounds):
        # (1) neighbor min: join edge (node, nbr) with labels on nbr
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
        stepped = (
            labels.union(nbr_lab)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        )
        # (2) pointer jump: label <- label(label).  Left join keeps
        # nodes whose label has no own entry (already a root).  The
        # right side is renamed first — Ray's join can't self-join two
        # identically-named schemas.
        # repartition: group/aggregate outputs can contain empty-schema
        # blocks that break Ray's hash join (observed in 2.49)
        stepped = stepped.repartition(n_parts).materialize()
        as_parent = stepped.map_batches(
            lambda t: pa.Table.from_pydict(
                {"jnode": t["node"], "jlabel": t["label"]}
            ),
            batch_format="pyarrow",
        )
        jumped = stepped.join(
            as_parent,
            join_type="left_outer",
            num_partitions=n_parts,
            on=("label",),
            right_on=("jnode",),
        ).map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "node": t["node"],
                    "label": pa.compute.coalesce(
                        pa.compute.min_element_wise(
                            t["label"].combine_chunks(),
                            t["jlabel"].combine_chunks(),
                        ),
                        t["label"].combine_chunks(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        labels = jumped.materialize()
        sig = _label_sig(labels)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # Never return possibly-unconverged labels silently: wrong
        # connected components would propagate into every canon id.
        # Pointer jumping converges in O(log diameter) rounds, so
        # max_rounds=30 covers any graph below ~2^30 diameter — hitting
        # this means a bug or a pathological input worth surfacing.
        raise RuntimeError(
            f"label propagation did not reach a fixpoint within "
            f"{max_rounds} rounds; raise max_rounds for this graph"
        )
    return labels


def connected_components(edges_ds, driver_limit: int = DRIVER_EDGE_LIMIT,
                         force_distributed: bool = False):
    """edges Dataset (u, v) -> canon_map Dataset (CANON_SCHEMA)."""
    import ray.data as rd

    # pin the (tiny) edge projection so the count and the collect/LP
    # below do not re-execute the whole upstream pipeline twice
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.Table.from_pydict(
                {"member_key": [], "root": [], "canon_id": [],
                 "canon": [], "n_members": []},
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
        # vectorized per-bucket: one value_counts over thousands of
        # labels at once (never one Python call per component).
        # right-side key gets its own name: Ray's hash join mishandles
        # identically-named keys on both sides (observed in 2.49).
        vc = df["label"].value_counts()
        return pd.DataFrame(
            {"slabel": vc.index, "n_members": vc.to_numpy()}
        )

    from twine_ray.stages.grouped import bucketed_group_reduce

    n_parts = max(2, min(32, labels.num_blocks()))
    sizes = bucketed_group_reduce(
        labels.select_columns(["label"]), ["label"], _sizes, partial=False
    ).repartition(n_parts)
    joined = labels.join(
        sizes, join_type="inner", num_partitions=n_parts,
        on=("label",), right_on=("slabel",),
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        cids = df["label"].map(canon_uuid)
        return pd.DataFrame(
            {
                "member_key": df["node"],
                "root": df["label"],
                "canon_id": cids,
                "canon": cids.map(canon_uri),
                "n_members": df["n_members"].astype("int32"),
            }
        )

    return joined.map_batches(_finish, batch_format="pandas")
