"""Stages J2 + A2 + A5: canonical rewrite, property resolution, dedup.

- ``rewrite_canon`` (J2): Spindle rewrites source URIs to proxy UUIDs
  during generate (``spindle:generate/``).  Here the canon_map is
  broadcast once (``ray.put``) and applied inside ``map_batches`` — a
  broadcast hash join, no shuffle; unmatched URIs pass through verbatim
  (Twine keeps unknown URIs as-is).  Raw ``owl:sameAs`` statements are
  consumed here and replaced by per-class membership triples
  (proxy -> member), mirroring Spindle's generated proxy graphs.

- ``resolve_and_dedup`` (A2+A5): Spindle's per-proxy property
  resolution (winning value per property by source priority,
  ``spindle:generate/props.c``-style) + exact quad dedup (librdf models
  are sets — duplicate statements collapse).  Implemented as a
  partial-then-final aggregation: the per-(graph,subj,pred) reduction is
  associative, so each batch pre-reduces locally before ONE global
  groupby — the combiner halves shuffle volume and defuses skew
  (SURVEY.md §4 skew row).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from twine_ray.stages.triples import TRIPLES_SCHEMA
from twine_ray.state.rulebase import DEFAULT_RULEBASE, OWL_SAMEAS


class CanonRewriter:
    """Broadcast canon rewrite: entity URIs -> proxy URIs per batch.

    Zero-copy Arrow throughout: the member->proxy lookup is
    ``pc.index_in`` + ``pc.take`` against arrays built once per actor
    (no pandas round-trip in the hot path — VERDICT.md round-1 note)."""

    def __init__(self, canon_ref) -> None:
        from twine_ray.state.broadcast import resolve

        rows = resolve(canon_ref)
        self.keys = pa.array([r["member_key"] for r in rows],
                             type=pa.string())
        self.vals = pa.array([r["canon"] for r in rows], type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # drop raw sameAs statements — replaced by membership triples
        t = batch.filter(pc.not_equal(batch["pred"], OWL_SAMEAS))
        subj = t["subj"].combine_chunks()
        obj = t["obj"].combine_chunks()
        subj_idx = pc.index_in(subj, value_set=self.keys)
        subj_out = pc.coalesce(pc.take(self.vals, subj_idx), subj)
        obj_idx = pc.index_in(obj, value_set=self.keys)
        # literals are never rewritten even on a textual key match
        hit = pc.and_(
            pc.is_valid(obj_idx),
            pc.invert(t["obj_is_lit"].combine_chunks()),
        )
        obj_out = pc.if_else(hit, pc.take(self.vals, obj_idx), obj)
        return pa.Table.from_arrays(
            [
                t["graph"].combine_chunks(), subj_out,
                t["pred"].combine_chunks(), obj_out,
                t["obj_is_lit"].combine_chunks(),
                t["obj_dt"].combine_chunks(),
                t["obj_lang"].combine_chunks(),
                t["score"].combine_chunks(),
            ],
            schema=TRIPLES_SCHEMA,
        )


def membership_triples(canon_rows: list[dict], rulebase=DEFAULT_RULEBASE):
    """Per-class proxy graphs: (canon, owl:sameAs, member) for every
    class with >= 2 members (Spindle proxy generation analog)."""
    score = rulebase.score(OWL_SAMEAS)
    out = {k: [] for k in (
        "graph", "subj", "pred", "obj", "obj_is_lit", "obj_dt",
        "obj_lang", "score",
    )}
    for r in canon_rows:
        if r["n_members"] < 2:
            continue
        out["graph"].append(r["canon"])
        out["subj"].append(r["canon"])
        out["pred"].append(OWL_SAMEAS)
        out["obj"].append(r["member_key"])
        out["obj_is_lit"].append(False)
        out["obj_dt"].append("")
        out["obj_lang"].append("")
        out["score"].append(score)
    return pa.Table.from_pydict(out, schema=TRIPLES_SCHEMA)


def rewrite_canon(triples_ds, canon_rows: list[dict]):
    """triples_raw Dataset + canon rows -> rewritten triples Dataset
    (+ membership triples unioned in)."""
    import ray.data as rd

    from twine_ray.state.broadcast import broadcast

    canon_ref = broadcast(canon_rows)
    rewritten = triples_ds.map_batches(
        CanonRewriter,
        fn_constructor_kwargs={"canon_ref": canon_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    members = membership_triples(canon_rows)
    if members.num_rows:
        rewritten = rewritten.union(rd.from_arrow(members))
    return rewritten


# Entity-scale canon maps above this stop being broadcastable (the
# member->proxy dict would not fit a worker heap); mirror of
# canon.DRIVER_EDGE_LIMIT and mentions.link_mentions_shuffle (ST2).
CANON_BROADCAST_LIMIT = 2_000_000


def rewrite_canon_shuffle(triples_ds, canon_ds, num_partitions=None):
    """Shuffle-join canon rewrite (J2 fallback for entity-scale maps,
    VERDICT.md round-1 missing #5): instead of broadcasting the
    member->proxy dict, hash-join triples to the canon_map Dataset on
    subj, then on obj — two wide exchanges, but nothing driver-side.

    Matches ``rewrite_canon`` exactly (tested equal): raw sameAs rows
    dropped, unmatched URIs pass through, literals never rewritten,
    membership triples for classes >= 2 unioned in (computed
    distributed from the canon Dataset, never collected).
    """
    import pyarrow.compute as pc

    from twine_ray.stages.grouped import default_num_partitions
    from twine_ray.state.rulebase import DEFAULT_RULEBASE

    n_parts = num_partitions or default_num_partitions(hi=64)

    def _drop_sameas(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch["pred"], OWL_SAMEAS))

    ds = triples_ds.map_batches(
        _drop_sameas, batch_format="pyarrow"
    ).repartition(n_parts)

    # right sides need their own key names (Ray's hash join mishandles
    # identically-named keys) and a repartition (empty-schema blocks)
    subj_map = canon_ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"smk": t["member_key"], "scanon": t["canon"]}
        ),
        batch_format="pyarrow",
    ).repartition(n_parts)
    obj_map = canon_ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"omk": t["member_key"], "ocanon": t["canon"]}
        ),
        batch_format="pyarrow",
    ).repartition(n_parts)

    j1 = ds.join(
        subj_map, join_type="left_outer", num_partitions=n_parts,
        on=("subj",), right_on=("smk",),
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "graph": t["graph"],
                "subj": pc.coalesce(
                    t["scanon"].combine_chunks(),
                    t["subj"].combine_chunks(),
                ),
                "pred": t["pred"],
                "obj": t["obj"],
                "obj_is_lit": t["obj_is_lit"],
                "obj_dt": t["obj_dt"],
                "obj_lang": t["obj_lang"],
                "score": t["score"],
            }
        ),
        batch_format="pyarrow",
    ).repartition(n_parts)

    def _apply_obj(t: pa.Table) -> pa.Table:
        is_uri = pc.invert(t["obj_is_lit"].combine_chunks())
        hit = pc.and_(is_uri, pc.is_valid(t["ocanon"].combine_chunks()))
        obj = pc.if_else(
            hit, t["ocanon"].combine_chunks(), t["obj"].combine_chunks()
        )
        return pa.Table.from_pydict(
            {
                "graph": t["graph"], "subj": t["subj"], "pred": t["pred"],
                "obj": obj, "obj_is_lit": t["obj_is_lit"],
                "obj_dt": t["obj_dt"], "obj_lang": t["obj_lang"],
                "score": t["score"],
            },
            schema=TRIPLES_SCHEMA,
        )

    rewritten = j1.join(
        obj_map, join_type="left_outer", num_partitions=n_parts,
        on=("obj",), right_on=("omk",),
    ).map_batches(_apply_obj, batch_format="pyarrow")

    score = DEFAULT_RULEBASE.score(OWL_SAMEAS)

    def _members(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.greater_equal(t["n_members"], 2))
        n = sel.num_rows
        return pa.Table.from_pydict(
            {
                "graph": sel["canon"],
                "subj": sel["canon"],
                "pred": pa.array([OWL_SAMEAS] * n, type=pa.string()),
                "obj": sel["member_key"],
                "obj_is_lit": pa.array([False] * n, type=pa.bool_()),
                "obj_dt": pa.array([""] * n, type=pa.string()),
                "obj_lang": pa.array([""] * n, type=pa.string()),
                "score": pa.array([score] * n, type=pa.int32()),
            },
            schema=TRIPLES_SCHEMA,
        )

    members = canon_ds.map_batches(_members, batch_format="pyarrow")
    return rewritten.union(members)


def rewrite_canon_auto(triples_ds, canon_ds,
                       driver_limit: int = CANON_BROADCAST_LIMIT,
                       force_shuffle: bool = False):
    """Pick the J2 execution path by canon-map size: broadcast when the
    member->proxy map fits a worker heap (the normal case — the entity
    graph is orders of magnitude smaller than the corpus), hash-join
    otherwise.  Returns (rewritten_ds, canon_rows_or_None) — rows are
    only collected on the broadcast path."""
    canon_ds = canon_ds.materialize()
    n = canon_ds.count()
    if not force_shuffle and n <= driver_limit:
        canon_rows = canon_ds.take_all()
        return rewrite_canon(triples_ds, canon_rows), canon_rows
    return rewrite_canon_shuffle(triples_ds, canon_ds), None


# ---------------------------------------------------------------------------
# A2 + A5
# ---------------------------------------------------------------------------


def _reduce_group(df: pd.DataFrame, single_valued: frozenset[str]) -> pd.DataFrame:
    """The associative per-(graph,subj,pred) reduction — VECTORIZED
    (no Python loop over key groups; pandas C kernels only).

    single-valued pred: keep the single best row (score desc, then
    lexicographic obj/dt/lang — deterministic under any partitioning);
    multi-valued: distinct (obj, dt, lang) keeping the max score each.
    """
    if df.empty:
        return df
    df = df.sort_values(
        ["graph", "subj", "pred", "score", "obj", "obj_dt", "obj_lang"],
        ascending=[True, True, True, False, True, True, True],
        kind="mergesort",
    )
    is_single = df["pred"].isin(single_valued)
    single_part = df[is_single].drop_duplicates(
        subset=["graph", "subj", "pred"], keep="first"
    )
    multi_part = df[~is_single].drop_duplicates(
        subset=["graph", "subj", "pred", "obj", "obj_dt", "obj_lang"],
        keep="first",
    )
    return pd.concat([single_part, multi_part])


def resolve_and_dedup(triples_ds, rulebase=DEFAULT_RULEBASE,
                      num_buckets: int = 64):
    """Property resolution + exact dedup (ONE wide shuffle).

    Partial reduce per batch (combiner), then hash-bucketed final
    reduce (twine_ray.stages.grouped) — the per-key map_groups
    alternative costs one Python call per (graph,subj,pred) group,
    which is millions of calls at corpus scale.
    """
    from twine_ray.stages.grouped import bucketed_group_reduce

    single = frozenset(
        p for p, r in rulebase.predicates.items() if r.single_valued
    )

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        return _reduce_group(df, single)

    return bucketed_group_reduce(
        triples_ds, ["graph", "subj", "pred"], _reduce,
        num_buckets=num_buckets,
    )


def strip_predicates(triples_ds, rulebase=DEFAULT_RULEBASE):
    """Stage M7: rulebase predicate whitelist filter (Spindle's strip
    step, ``spindle:generate/`` rulebase property rules). Vectorized
    Arrow mask inside map_batches."""
    import pyarrow.compute as pc

    allowed = pa.array(sorted(rulebase.whitelist()), type=pa.string())

    def _f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["pred"], value_set=allowed))

    return triples_ds.map_batches(_f, batch_format="pyarrow")


def resolve_for_store(triples_ds, rulebase=DEFAULT_RULEBASE,
                      num_buckets: int = 32, salt: int = 1):
    """Fused production path: property resolution + dedup + store sort
    + partition bucketing in ONE shuffle.

    The resolution key is (graph, subj, pred); grouping by
    graph_bucket = hash(graph) co-locates every row of each resolution
    key too, so the resolve reduction, the within-bucket (subj, pred,
    obj) sort, and the write partitioning all ride a single exchange —
    two wide steps fewer than resolve_and_dedup + materialize.
    Output carries the bucket column; write with
    materialize_triples(..., prepared=True).

    ``salt > 1`` splits each bucket's reduce across ``salt`` subgroups
    keyed by a SECOND independent graph hash (same graph -> same salt,
    so every (graph, subj, pred) key still reduces whole): a hot
    bucket's work spreads over ``salt`` reducers and its partition dir
    holds ``salt`` sorted runs instead of one (the writer may pack
    several runs per file; readers treat each run as a sorted row
    group).  The skew valve designed in docs/SCALE.md — default 1
    keeps the one-sorted-file-per-bucket layout.
    """
    import pandas as pd

    from twine_ray.stages.materialize import BUCKET_COL, add_graph_bucket

    single = frozenset(
        p for p, r in rulebase.predicates.items() if r.single_valued
    )

    # combiner: pre-reduce per batch before the exchange
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return _reduce_group(df, single)

    ds = triples_ds.map_batches(_partial, batch_format="pandas")
    ds = add_graph_bucket(ds, num_buckets)

    SALT_COL = "__salt"
    group_cols = [BUCKET_COL]
    if salt > 1:
        def _add_salt(df: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_pandas_object(
                df["graph"], index=False, categorize=False
            ).to_numpy()
            # independent of bucket_of's hash: different mix constant
            return df.assign(
                **{SALT_COL: ((h * 0x9E3779B97F4A7C15) % salt)
                   .astype("int32")}
            )

        ds = ds.map_batches(_add_salt, batch_format="pandas")
        group_cols = [BUCKET_COL, SALT_COL]

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        bucket = df[BUCKET_COL].iloc[0] if len(df) else None
        out = _reduce_group(
            df.drop(columns=group_cols, errors="ignore"), single
        )
        out = out.sort_values(["subj", "pred", "obj"], kind="mergesort")
        out[BUCKET_COL] = bucket
        return out

    return ds.groupby(group_cols).map_groups(_final, batch_format="pandas")
