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
    rewrite_canon_auto,
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


def kg_triples_dataset(pages_ds, alias_rows, *, concurrency=8,
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


def _phase1(pages_ds, raw_dir: str, alias_rows, num_buckets: int,
            concurrency, resume: bool) -> dict:
    """Page-scale phase: extract -> dedup -> raw triples -> bucketed
    checkpoint.  With resume, pages whose graph bucket carries a _DONE
    marker are filtered out BEFORE extraction (the idempotent-PUT
    analog).

    ``pages_ds`` may be a CALLABLE (``partitioned_pages_source``): it
    is invoked with the done-bucket set and returns the pruned Dataset
    — file-level pruning, unchanged shards never leave disk (VERDICT
    r2 #6) instead of the read-all + post-scan filter."""
    from twine_ray.functions.ids import bucket_of
    from twine_ray.functions.urls import normalize_url
    from twine_ray.state import checkpoint as ckpt

    done = ckpt.done_buckets(raw_dir) if resume else set()
    if callable(pages_ds):
        src_buckets = getattr(pages_ds, "num_buckets", num_buckets)
        if src_buckets != num_buckets:
            raise ValueError(
                f"pages layout bucketing ({src_buckets}) != pipeline "
                f"num_buckets ({num_buckets}); partition pruning would "
                "skip the wrong pages"
            )
        pages_ds = pages_ds(sorted(done))
    elif done:
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

    deduped = extract_with_graph_replace(pages_ds)
    triples_raw = extract_triples(deduped, alias_rows,
                                  concurrency=concurrency)
    return materialize_triples(
        triples_raw, raw_dir, num_buckets=num_buckets, sort_within=False
    )


def _phase2_resolved(raw_dir: str, rulebase, num_buckets: int,
                     salt: int = 1):
    """Entity-scale phase: read raw back -> union-find -> canon rewrite
    -> fused resolve+sort+bucket.  Returns (resolved_ds, coref stats).

    The raw read feeds BOTH the edge projection and the canon rewrite;
    two lazy Parquet scans beat pinning 100% of raw in the object store
    (the edge scan prunes to the sameAs rows immediately)."""
    raw_ds = read_triple_store(raw_dir).drop_columns(["graph_bucket"])
    canon_ds = connected_components(sameas_edges(raw_ds))
    # J2 path choice: broadcast the member->proxy map when it fits a
    # worker heap, hash-join at entity scale (rows stay distributed)
    rewritten, canon_rows = rewrite_canon_auto(raw_ds, canon_ds)
    if canon_rows is not None:
        n_members = len(canon_rows)
        n_classes = len({r["canon_id"] for r in canon_rows})
    else:
        n_members = canon_ds.count()
        n_classes = canon_ds.groupby("canon_id").count().count()
    resolved = resolve_for_store(rewritten, rulebase,
                                 num_buckets=num_buckets, salt=salt)
    return resolved, {"members": n_members, "classes": n_classes}


def auto_store_salt(raw_dir: str, threshold: float = 4.0,
                    cap: int = 16) -> int:
    """Heavy-hitter salt from the raw checkpoint's LINEAGE row counts
    (parquet-footer metadata — zero data read; SURVEY.md §4's cheap
    bucket-count pass, VERDICT r2 #9).  Raw buckets use the same graph
    bucketing as the store, so a raw bucket holding ``threshold``x the
    median rows predicts a hot store reducer: salt spreads it over
    ``ceil(max/median)`` reducers (capped).  Uniform corpora return 1
    — the single-sorted-file-per-bucket layout is kept."""
    import math
    import statistics

    from twine_ray.stages.materialize import read_lineage

    rows = [r["rows"] for r in read_lineage(raw_dir) if r.get("rows")]
    if len(rows) < 2:
        return 1
    med = statistics.median(rows)
    mx = max(rows)
    if med <= 0 or mx <= threshold * med:
        return 1
    return max(2, min(cap, math.ceil(mx / med)))


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
    store_salt: int | str = "auto",
    write_index: bool = False,
) -> dict:
    """Production path: two-phase, resumable (SURVEY.md §4).

    ``write_index=True`` additionally materializes the spindle-style
    per-proxy index (stages/index.py) to ``<out>/index`` — one extra
    combiner-backed aggregation pass over the just-written store.

    ``store_salt > 1`` spreads each store bucket's resolve reduction
    over that many reducers (skew valve for hot buckets; see
    resolve_for_store).

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

    from twine_ray.state import checkpoint as ckpt

    raw_dir = os.path.join(out_dir, "raw")
    store_dir = os.path.join(out_dir, "store")

    # refuse to resume under a different bucketing than the markers
    # were written with (stale ids would silently drop pages)
    bucketing = {"num_buckets": num_buckets, "scheme": "graph-bucket-v1"}
    ckpt.ensure_manifest(raw_dir, bucketing, reset=not resume)

    import time

    t0 = time.perf_counter()
    phase1 = _phase1(pages_ds, raw_dir, alias_rows, num_buckets,
                     concurrency, resume)
    t1 = time.perf_counter()

    if store_salt == "auto":
        store_salt = auto_store_salt(raw_dir)
    resolved, coref = _phase2_resolved(raw_dir, rulebase, num_buckets,
                                       salt=store_salt)
    n_members, n_classes = coref["members"], coref["classes"]
    t2 = time.perf_counter()

    # store is rebuilt each run: clear stale markers so buckets replace
    ckpt_dir_reset(store_dir)
    ckpt.ensure_manifest(store_dir, bucketing)
    with _shuffle_strategy(phase2_shuffle):
        phase2 = materialize_triples(
            resolved, store_dir, num_buckets=num_buckets, prepared=True,
            signatures=True,
        )
    t3 = time.perf_counter()
    from twine_ray.stages.materialize import read_lineage

    index_rows = None
    if write_index:
        import shutil as _sh

        from twine_ray.stages.index import proxy_index
        from twine_ray.stages.materialize import read_triple_store

        index_dir = os.path.join(out_dir, "index")
        _sh.rmtree(index_dir, ignore_errors=True)
        idx = proxy_index(
            read_triple_store(store_dir).drop_columns(["graph_bucket"])
        )
        idx.write_parquet(index_dir)
        import pyarrow.parquet as _pq

        index_rows = sum(
            _pq.read_metadata(os.path.join(index_dir, f)).num_rows
            for f in os.listdir(index_dir) if f.endswith(".parquet")
        )

    return {
        "raw": phase1,
        "store": phase2,
        "n_canon_members": n_members,
        "raw_dir": raw_dir,
        "store_dir": store_dir,
        # A4 metrics + per-partition lineage (north_rule)
        "metrics": {
            "phase1_sec": round(t1 - t0, 3),
            "canon_sec": round(t2 - t1, 3),
            "phase2_sec": round(t3 - t2, 3),
            "raw_triples": phase1["rows"],
            "store_triples": phase2["rows"],
            "coref_members": n_members,
            "coref_classes": n_classes,
            "raw_buckets": len(phase1["buckets"]),
            "store_buckets": len(phase2["buckets"]),
            "store_salt": store_salt,
            **({"index_rows": index_rows} if index_rows is not None
               else {}),
        },
        "lineage": {
            "raw": read_lineage(raw_dir),
            "store": read_lineage(store_dir),
        },
    }


# Signature machinery lives next to the writer now (VERDICT r2 #4):
# materialize_triples(signatures=True) folds per-bucket signatures into
# _LINEAGE at write time; bucket_signatures_cached reads them back free.
from twine_ray.stages.materialize import (  # noqa: E402
    bucket_signatures_cached as _bucket_signatures,
)


def run_kg_incremental(
    pages_ds,
    out_dir: str,
    alias_rows,
    changed_urls,
    *,
    num_buckets: int = 32,
    concurrency=4,
    rulebase=DEFAULT_RULEBASE,
    phase2_shuffle: str | None = "HASH_SHUFFLE",
    store_salt: int | str = "auto",
) -> dict:
    """Incremental mode (SURVEY.md §2.4 J3/S5; the ``twine -u`` update
    analog): reprocess only what a set of changed pages touches.

    1. Raw buckets containing a changed url are invalidated; phase 1
       reruns with resume=True, so ONLY those buckets' pages re-extract.
    2. Phase 2 recomputes into ``store.tmp`` (canonicalization is
       global — a changed sameAs edge can rewrite any graph).
    3. Old-vs-new per-bucket signatures (streaming scans) pick out the
       store buckets whose content actually changed; only those have
       their data/lineage/markers replaced — unchanged buckets keep
       byte-identical files and lineage, so downstream consumers can
       skip them.  The re-PUT row set (J3 ``triples_diff`` over the
       changed buckets only) is reported in the metrics.

    ``pages_ds`` must be the FULL current corpus (a bucket is the unit
    of recomputation and contains unchanged pages too).
    """
    import os
    import shutil
    import time

    from twine_ray.functions.ids import bucket_of
    from twine_ray.functions.urls import normalize_url
    from twine_ray.stages.diff import dataset_except
    from twine_ray.stages.materialize import BUCKET_COL, read_lineage
    from twine_ray.state import checkpoint as ckpt

    raw_dir = os.path.join(out_dir, "raw")
    store_dir = os.path.join(out_dir, "store")
    tmp_store = store_dir + ".tmp"

    bucketing = {"num_buckets": num_buckets, "scheme": "graph-bucket-v1"}
    ckpt.ensure_manifest(raw_dir, bucketing)   # raises on mismatch
    ckpt.ensure_manifest(store_dir, bucketing)

    t0 = time.perf_counter()
    invalidated = sorted(
        {bucket_of(normalize_url(u), num_buckets) for u in changed_urls}
    )
    ckpt.invalidate_buckets(raw_dir, invalidated, BUCKET_COL)
    phase1 = _phase1(pages_ds, raw_dir, alias_rows, num_buckets,
                     concurrency, resume=True)
    t1 = time.perf_counter()

    if store_salt == "auto":
        store_salt = auto_store_salt(raw_dir)
    resolved, coref = _phase2_resolved(raw_dir, rulebase, num_buckets,
                                       salt=store_salt)
    ckpt_dir_reset(tmp_store)
    ckpt.ensure_manifest(tmp_store, bucketing)
    with _shuffle_strategy(phase2_shuffle):
        materialize_triples(
            resolved, tmp_store, num_buckets=num_buckets, prepared=True,
            signatures=True,
        )
    t2 = time.perf_counter()

    # old side: lineage-cached (free after the store was written with
    # signatures=True; legacy stores pay ONE healing scan); new side:
    # just written with signatures — lineage only, no second scan
    old_sigs = _bucket_signatures(store_dir)
    new_sigs = _bucket_signatures(tmp_store)
    changed = sorted(
        b for b in set(old_sigs) | set(new_sigs)
        if old_sigs.get(b) != new_sigs.get(b)
    )

    # J3 consumption: the incremental re-PUT set, computed only over
    # the changed buckets (both sides pruned before the diff shuffle)
    n_reput = 0
    if changed:
        changed_arr = pa.array(changed, type=pa.int32())

        def _only_changed(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(
                    pc.cast(batch[BUCKET_COL], pa.int32()),
                    value_set=changed_arr,
                )
            )

        key = ["graph", "subj", "pred", "obj", "obj_is_lit", "obj_dt",
               "obj_lang"]
        new_changed = read_triple_store(tmp_store).map_batches(
            _only_changed, batch_format="pyarrow"
        )
        old_changed = read_triple_store(store_dir).map_batches(
            _only_changed, batch_format="pyarrow"
        )
        n_reput = dataset_except(new_changed, old_changed, key).count()

        # swap ONLY the changed buckets into the live store
        for b in changed:
            part = f"{BUCKET_COL}={b}"
            ckpt.invalidate_buckets(store_dir, [b], BUCKET_COL)
            src = os.path.join(ckpt.data_dir(tmp_store), part)
            if os.path.isdir(src):  # absent = bucket deleted entirely
                os.makedirs(ckpt.data_dir(store_dir), exist_ok=True)
                os.replace(src, os.path.join(ckpt.data_dir(store_dir), part))
                lin = os.path.join(tmp_store, "_LINEAGE", f"{b}.json")
                if os.path.exists(lin):
                    os.makedirs(os.path.join(store_dir, "_LINEAGE"),
                                exist_ok=True)
                    os.replace(lin,
                               os.path.join(store_dir, "_LINEAGE",
                                            f"{b}.json"))
                ckpt.mark_done(store_dir, [b])
    shutil.rmtree(tmp_store, ignore_errors=True)
    t3 = time.perf_counter()

    store_rows = sum(s[2] for s in new_sigs.values())
    return {
        "raw": phase1,
        "raw_dir": raw_dir,
        "store_dir": store_dir,
        "metrics": {
            "phase1_sec": round(t1 - t0, 3),
            "phase2_sec": round(t2 - t1, 3),
            "swap_sec": round(t3 - t2, 3),
            "invalidated_raw_buckets": len(invalidated),
            "changed_store_buckets": len(changed),
            "reput_triples": n_reput,
            "store_triples": store_rows,
            "coref_members": coref["members"],
            "coref_classes": coref["classes"],
        },
        "changed_buckets": changed,
        "lineage": {"store": read_lineage(store_dir)},
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
