"""Flagship KG-construction pipeline (SURVEY.md §3.4).

The single production entry point — the Ray-native equivalent of a
``twine-writerd`` fleet consuming a queue through the configured
workflow chain (``[twine] workflow=sparql-get,...,sparql-put``;
``twine:libtwine/workflow.c``):

    pages -> extract_text -> sparse latest-wins dedup -> triple extraction
          -> [checkpoint: raw triples, resumable per graph bucket]
          -> sameAs edges -> union-find -> canon rewrite
          -> property resolution + dedup -> sorted partitioned store

Only ONE full-corpus wide exchange exists on the page-scale path: the
fused resolve + store-sort + partitioning exchange
(``resolve_for_store``).  The latest-wins dedup shuffles only the
duplicated-url slice (``extract_with_graph_replace``), and the
union-find operates on the entity-scale (tiny) edge set.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from twine_ray.sources import world as W
from twine_ray.sources.pages import alias_dict_table, pages_from_documents
from twine_ray.stages.canon import connected_components
from twine_ray.stages.extract import (
    extract_text,
    extract_with_graph_replace,
    latest_page_wins,
)
from twine_ray.stages.materialize import materialize_triples, read_triple_store
from twine_ray.stages.resolve import (
    resolve_and_dedup,
    resolve_for_store,
    rewrite_canon,
)
from twine_ray.stages.triples import extract_triples
from twine_ray.state.rulebase import DEFAULT_RULEBASE, OWL_SAMEAS


def sameas_edges(triples_raw_ds):
    """Project the coreference edge list (u, v) out of raw triples."""
    def _edges(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch["pred"], OWL_SAMEAS)
        sel = batch.filter(mask)
        return pa.Table.from_pydict(
            {"u": sel["subj"], "v": sel["obj"]},
            schema=pa.schema([("u", pa.string()), ("v", pa.string())]),
        )

    return triples_raw_ds.map_batches(_edges, batch_format="pyarrow")


def kg_triples_dataset(pages_ds, alias_rows, *, concurrency=4,
                       rulebase=DEFAULT_RULEBASE):
    """pages Dataset -> final resolved triples Dataset (in-memory path;
    tests and oracle queries — the production path checkpoints raw
    triples to Parquet instead, see run_kg_pipeline).

    The raw-triples Dataset is consumed twice (edge projection + canon
    rewrite), so it is pinned via materialize() — at this entry point
    inputs are small by contract.
    """
    deduped = extract_with_graph_replace(pages_ds)
    triples_raw = extract_triples(
        deduped, alias_rows, concurrency=concurrency
    ).materialize()

    canon_rows = connected_components(sameas_edges(triples_raw)).take_all()
    rewritten = rewrite_canon(triples_raw, canon_rows)
    return resolve_and_dedup(rewritten, rulebase)


from contextlib import contextmanager


@contextmanager
def _shuffle_strategy(name: str | None):
    """Scope a Ray Data shuffle strategy to one execution region.

    The sort-based default degenerates when the groupby key has only
    num_buckets distinct values (range boundaries land inside keys →
    unbalanced reducers); HASH_SHUFFLE keeps the phase-2 fused exchange
    balanced.  Scoped so page-scale phase-1 exchanges keep the default.
    """
    if name is None:
        yield
        return
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    old = ctx.shuffle_strategy
    ctx.shuffle_strategy = getattr(ShuffleStrategy, name)
    try:
        yield
    finally:
        ctx.shuffle_strategy = old


def run_kg_pipeline(
    pages_ds,
    out_dir: str,
    alias_rows,
    *,
    num_buckets: int = 32,
    concurrency=4,
    resume: bool = True,
    rulebase=DEFAULT_RULEBASE,
    phase2_shuffle: str | None = "HASH_SHUFFLE",
) -> dict:
    """Production path: two-phase, resumable (SURVEY.md §4).

    Phase 1 (expensive, page-scale, resumable per graph bucket): pages
    -> extracted -> deduped -> raw triples -> ``<out>/raw`` partitioned
    Parquet + markers.  A rerun skips pages whose graph bucket is
    already marked — the idempotent-PUT analog.

    Phase 2 (entity-scale + one wide pass): read raw back -> union-find
    -> rewrite -> resolve/dedup -> ``<out>/store`` sorted partitioned
    Parquet.  Phase 2 is recomputed wholesale on resume (its inputs are
    the phase-1 checkpoint, so nothing upstream re-runs).
    """
    import os

    from twine_ray.functions.ids import bucket_of
    from twine_ray.functions.urls import normalize_url
    from twine_ray.state import checkpoint as ckpt

    raw_dir = os.path.join(out_dir, "raw")
    store_dir = os.path.join(out_dir, "store")

    # refuse to resume under a different bucketing than the markers
    # were written with (stale ids would silently drop pages)
    bucketing = {"num_buckets": num_buckets, "scheme": "graph-bucket-v1"}
    ckpt.ensure_manifest(raw_dir, bucketing, reset=not resume)
    ckpt.ensure_manifest(store_dir, bucketing, reset=not resume)

    done = ckpt.done_buckets(raw_dir) if resume else set()
    if done:
        done_arr = pa.array(sorted(done), type=pa.int32())

        def _skip_done(batch: pa.Table) -> pa.Table:
            # bucket on the NORMALIZED url — graphs (and hence markers)
            # use the normalized form
            buckets = pa.array(
                [bucket_of(normalize_url(u), num_buckets)
                 for u in batch["url"].to_pylist()],
                type=pa.int32(),
            )
            return batch.filter(
                pc.invert(pc.is_in(buckets, value_set=done_arr))
            )

        pages_ds = pages_ds.map_batches(_skip_done, batch_format="pyarrow")

    import time

    t0 = time.perf_counter()
    deduped = extract_with_graph_replace(pages_ds)
    triples_raw = extract_triples(deduped, alias_rows,
                                  concurrency=concurrency)
    phase1 = materialize_triples(
        triples_raw, raw_dir, num_buckets=num_buckets, sort_within=False
    )
    t1 = time.perf_counter()

    # ---- phase 2: global canonicalization over the checkpointed raw ----
    # the raw read feeds BOTH the edge projection and the canon rewrite;
    # two lazy Parquet scans beat pinning 100%% of raw in the object
    # store (the edge scan prunes to the sameAs rows immediately)
    raw_ds = read_triple_store(raw_dir).drop_columns(["graph_bucket"])
    canon_rows = connected_components(sameas_edges(raw_ds)).take_all()
    t2 = time.perf_counter()
    rewritten = rewrite_canon(raw_ds, canon_rows)
    resolved = resolve_for_store(rewritten, rulebase,
                                 num_buckets=num_buckets)

    # store is rebuilt each run: clear stale markers so buckets replace
    ckpt_dir_reset(store_dir)
    with _shuffle_strategy(phase2_shuffle):
        phase2 = materialize_triples(
            resolved, store_dir, num_buckets=num_buckets, prepared=True
        )
    t3 = time.perf_counter()
    from twine_ray.stages.materialize import read_lineage

    n_classes = len({r["canon_id"] for r in canon_rows})
    return {
        "raw": phase1,
        "store": phase2,
        "n_canon_members": len(canon_rows),
        "raw_dir": raw_dir,
        "store_dir": store_dir,
        # A4 metrics + per-partition lineage (north_rule)
        "metrics": {
            "phase1_sec": round(t1 - t0, 3),
            "canon_sec": round(t2 - t1, 3),
            "phase2_sec": round(t3 - t2, 3),
            "raw_triples": phase1["rows"],
            "store_triples": phase2["rows"],
            "coref_members": len(canon_rows),
            "coref_classes": n_classes,
            "raw_buckets": len(phase1["buckets"]),
            "store_buckets": len(phase2["buckets"]),
        },
        "lineage": {
            "raw": read_lineage(raw_dir),
            "store": read_lineage(store_dir),
        },
    }


def ckpt_dir_reset(out_dir: str) -> None:
    """Remove an output dir entirely (markers + data) — used for the
    always-recomputed phase-2 store."""
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)


def default_alias_rows(seed: int = W.WORLD_SEED, n_entities: int = 200):
    return alias_dict_table(seed=seed, n_entities=n_entities).to_pylist()


def flagship_entry(sf_dir: str = "/root/testdata/sf0.001"):
    """The driver's ``entry()``: documents-derived pages corpus ->
    resolved triples Dataset."""
    pages = pages_from_documents(sf_dir)
    return kg_triples_dataset(pages, default_alias_rows())
