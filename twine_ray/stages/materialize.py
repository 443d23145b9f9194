"""Stage S6: partitioned, sorted, resumable Parquet triple store.

Analog of Twine's only sink — the SPARQL 1.1 Graph Store PUT
(``twine:libtwine/sparql.c::twine_sparql_put``): an idempotent
whole-graph replace.  Here "graph" maps to a deterministic bucket of
the graph URI, and idempotent replace becomes: write the bucket
partition, then atomically create its ``_DONE`` marker; a rerun removes
unmarked partials and skips marked buckets (state/checkpoint.py).

Triples are sorted by (subj, pred, obj) WITHIN each bucket partition —
the sort rides the same shuffle as the partitioning (one wide exchange,
not two), making the store range-queryable per bucket.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from twine_ray.functions.ids import bucket_of
from twine_ray.state import checkpoint as ckpt

BUCKET_COL = "graph_bucket"


def add_graph_bucket(triples_ds, num_buckets: int):
    def _add(batch: pa.Table) -> pa.Table:
        buckets = pa.array(
            [bucket_of(g, num_buckets) for g in batch["graph"].to_pylist()],
            type=pa.int32(),
        )
        return batch.append_column(BUCKET_COL, buckets)

    return triples_ds.map_batches(_add, batch_format="pyarrow")


def materialize_triples(
    triples_ds,
    out_dir: str,
    num_buckets: int = 32,
    sort_within: bool = True,
    prepared: bool = False,
    signatures: bool = False,
) -> dict:
    """Write the triple store; returns {'rows': n, 'buckets': [...]}.

    The groupby(bucket) shuffle co-locates each bucket (ALWAYS — it
    also aligns output blocks to partition dirs, one file per bucket
    instead of blocks x buckets tiny files), the group fn sorts it when
    requested, and write_parquet(partition_cols=[bucket]) lays it out
    one directory per bucket.  Markers are written only after the write
    completes, so a crash leaves removable unmarked partials.

    ``prepared=True``: the input already carries BUCKET_COL and is
    grouped/sorted (e.g. by resolve_for_store, which fuses the resolve
    reduction into this same shuffle) — write directly.

    Sizing note: pick ``num_buckets`` so one bucket's triples fit a
    worker's heap (scale it with the corpus; it is also the resume
    granularity).
    """
    ckpt.clean_unmarked(out_dir, BUCKET_COL)
    already = ckpt.done_buckets(out_dir)

    ds = triples_ds if prepared else add_graph_bucket(triples_ds, num_buckets)
    if already:
        import pyarrow.compute as pc

        done_arr = pa.array(sorted(already), type=pa.int32())

        def _skip(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(pc.is_in(batch[BUCKET_COL], value_set=done_arr))
            )

        ds = ds.map_batches(_skip, batch_format="pyarrow")

    if not prepared:
        if sort_within:
            def _sort(df: pd.DataFrame) -> pd.DataFrame:
                return df.sort_values(["subj", "pred", "obj"],
                                      kind="mergesort")

            ds = ds.groupby(BUCKET_COL).map_groups(
                _sort, batch_format="pandas"
            )
        else:
            # unsorted (raw checkpoint) path: co-locate each bucket with
            # a groupby so partition_cols writes ONE file per bucket
            # instead of blocks x buckets tiny files.  This replaced
            # ``repartition(n)``: Ray 2.49's non-shuffle repartition has
            # a SINGLE-TASK reduce step (ds.stats(): RepartitionReduce
            # "1 tasks executed") that funnels the whole raw stream
            # through one worker — ~20 s of serial time on every leg and
            # the dominant non-scaling residual in the 8-vs-32-CPU gate.
            # The groupby's sample-sort exchange is imperfect on a
            # 32-distinct-key column but fully parallel.
            def _ident(df: pd.DataFrame) -> pd.DataFrame:
                return df

            ds = ds.groupby(BUCKET_COL).map_groups(
                _ident, batch_format="pandas"
            )

    # Streaming write — no driver-side materialization of the store.
    ds.write_parquet(ckpt.data_dir(out_dir), partition_cols=[BUCKET_COL])

    # Discover which buckets landed on disk; mark them done and count
    # rows from Parquet footers (metadata only, no data read).
    import os

    import pyarrow.parquet as pq

    dd = ckpt.data_dir(out_dir)
    buckets: list[int] = []
    n_rows = 0
    lineage: dict[int, dict] = {}
    if os.path.isdir(dd):
        for name in os.listdir(dd):
            if not name.startswith(f"{BUCKET_COL}="):
                continue
            b = int(name.split("=", 1)[1])
            part_dir = os.path.join(dd, name)
            part_rows = 0
            part_bytes = 0
            part_files = 0
            for f in os.listdir(part_dir):
                if f.endswith(".parquet"):
                    fp = os.path.join(part_dir, f)
                    part_rows += pq.read_metadata(fp).num_rows
                    part_bytes += os.path.getsize(fp)
                    part_files += 1
            n_rows += part_rows
            buckets.append(b)
            lineage[b] = {
                "bucket": b,
                "rows": part_rows,
                "files": part_files,
                "bytes": part_bytes,
            }
    new_buckets = [b for b in buckets if b not in already]
    if signatures:
        # write-time content signatures (VERDICT r2 #4): one
        # distributed scan of the just-written (hot) store folds the
        # two-salt per-bucket signature into lineage, so incremental
        # runs read old-store signatures from _LINEAGE for free instead
        # of re-scanning the store
        sigs = signature_scan(out_dir)
        for b, (s1, s2, _n) in sigs.items():
            if b in lineage:
                lineage[b]["sig1"] = int(s1)
                lineage[b]["sig2"] = int(s2)
        # already-done buckets from a resumed write get healed too
        write_lineage(out_dir, [lineage[b] for b in buckets])
    else:
        write_lineage(out_dir, [lineage[b] for b in new_buckets])
    ckpt.mark_done(out_dir, new_buckets)
    return {"rows": n_rows, "buckets": sorted(buckets)}


_SIG_COLS = ["graph", "subj", "pred", "obj", "obj_is_lit", "obj_dt",
             "obj_lang", "score"]


def _sig_of_frame(df: pd.DataFrame) -> tuple[int, int, int]:
    """Order-independent content signature of one bucket's rows: two
    independently-mixed row-hash sums + row count."""
    import numpy as np

    h = np.zeros(len(df), dtype=np.uint64)
    for c in _SIG_COLS:
        hc = pd.util.hash_pandas_object(
            df[c], index=False, categorize=False
        ).to_numpy().astype(np.uint64)
        h = h * np.uint64(1099511628211) + hc
    s1 = int((h % (1 << 31)).sum())
    s2 = int(((h * np.uint64(0x9E3779B97F4A7C15)) % (1 << 31)).sum())
    return s1, s2, len(df)


def signature_scan(store_dir: str) -> dict[int, tuple]:
    """Per-bucket content signatures, one PARALLEL TASK per bucket
    partition (local read of that bucket's files + vectorized hash —
    no shuffle, no aggregate exchange; the result is num_buckets rows).
    Replaced a Dataset groupby-aggregate formulation whose exchange
    machinery cost ~3-5 s at the 100k bench for a 32-row answer."""
    import os

    import ray.data as rd

    dd = ckpt.data_dir(store_dir)
    items = []
    if os.path.isdir(dd):
        for name in sorted(os.listdir(dd)):
            if name.startswith(f"{BUCKET_COL}="):
                items.append(
                    {"b": int(name.split("=", 1)[1]),
                     "dir": os.path.join(dd, name)}
                )
    if not items:
        return {}

    def _one(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        out = {"b": [], "s1": [], "s2": [], "n": []}
        for b, d in zip(batch["b"], batch["dir"]):
            df = pq.read_table(d, columns=_SIG_COLS).to_pandas()
            s1, s2, n = _sig_of_frame(df)
            out["b"].append(int(b))
            out["s1"].append(s1)
            out["s2"].append(s2)
            out["n"].append(n)
        return pd.DataFrame(out)

    rows = (
        rd.from_items(items, override_num_blocks=len(items))
        .map_batches(_one, batch_format="pandas", batch_size=1)
        .take_all()
    )
    return {int(r["b"]): (r["s1"], r["s2"], r["n"]) for r in rows}


def bucket_signatures_cached(store_dir: str) -> dict[int, tuple]:
    """Per-bucket signatures from ``_LINEAGE`` when present (free —
    written at materialize time with ``signatures=True``); stores
    written before that carry no sigs, so ONE healing scan computes and
    persists them — every later call is lineage-only."""
    recs = {r["bucket"]: r for r in read_lineage(store_dir)}
    done = ckpt.done_buckets(store_dir)
    if done and all("sig1" in recs.get(b, {}) for b in done):
        return {
            b: (recs[b]["sig1"], recs[b]["sig2"], recs[b]["rows"])
            for b in done
        }
    sigs = signature_scan(store_dir)
    healed = []
    for b, (s1, s2, n) in sigs.items():
        rec = recs.get(b, {"bucket": b, "rows": int(n)})
        rec["sig1"] = int(s1)
        rec["sig2"] = int(s2)
        healed.append(rec)
    write_lineage(store_dir, healed)
    return sigs


def write_lineage(out_dir: str, records: list[dict]) -> None:
    """Per-partition lineage (north_rule requirement): one JSON file per
    bucket under ``<out>/_LINEAGE/``, written before the bucket's
    ``_DONE`` marker so lineage can never describe an unfinished
    partition.  Markers — not lineage — remain the resume source of
    truth (SURVEY.md §7 hard part d)."""
    import json
    import os

    ld = os.path.join(out_dir, "_LINEAGE")
    os.makedirs(ld, exist_ok=True)
    for rec in records:
        tmp = os.path.join(ld, f".{rec['bucket']}.tmp")
        with open(tmp, "w") as f:
            json.dump(rec, f, sort_keys=True)
        os.replace(tmp, os.path.join(ld, f"{rec['bucket']}.json"))


def read_lineage(out_dir: str) -> list[dict]:
    import json
    import os

    ld = os.path.join(out_dir, "_LINEAGE")
    if not os.path.isdir(ld):
        return []
    out = []
    for name in sorted(os.listdir(ld)):
        if name.endswith(".json"):
            with open(os.path.join(ld, name)) as f:
                out.append(json.load(f))
    return out


COMPACT_NAME = "compact.parquet"


def compact_store(store_dir: str, buckets=None) -> dict:
    """Store maintenance: rewrite each bucket partition to ONE sorted
    parquet file.  Incremental swaps and salted writes leave several
    sorted runs per bucket; compaction restores the
    one-sorted-file-per-bucket layout without touching content.

    One PARALLEL TASK per bucket (read its files, sort by
    (subj, pred, obj), write) — no shuffle.  Crash-safe protocol per
    bucket: the compacted file lands atomically as ``compact.parquet``
    FIRST, then the old run files are unlinked; ``compact.parquet``
    coexisting with other files therefore always means an interrupted
    step-2 (every writer that adds new runs replaces the whole bucket
    dir), so a re-run simply finishes the deletion.  Lineage file/byte
    counts refresh; content signatures are unchanged by construction
    (order-independent sums) and are preserved.  Offline maintenance:
    concurrent readers during the window between write and unlink
    would double-count — run it like the reference runs VACUUM.
    """
    import os

    import ray.data as rd

    dd = ckpt.data_dir(store_dir)
    items = []
    if os.path.isdir(dd):
        for name in sorted(os.listdir(dd)):
            if not name.startswith(f"{BUCKET_COL}="):
                continue
            b = int(name.split("=", 1)[1])
            if buckets is not None and b not in set(buckets):
                continue
            items.append({"b": b, "dir": os.path.join(dd, name)})
    if not items:
        return {"compacted": [], "skipped": []}

    def _one(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        out = {"b": [], "action": [], "files_before": [], "rows": []}
        for b, d in zip(df["b"], df["dir"]):
            names = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )
            if COMPACT_NAME in names and len(names) > 1:
                # interrupted prior compaction: the compacted file is
                # complete (atomic rename); finish deleting the runs
                for f in names:
                    if f != COMPACT_NAME:
                        os.remove(os.path.join(d, f))
                out["b"].append(int(b))
                out["action"].append("healed")
                out["files_before"].append(len(names))
                out["rows"].append(
                    pq.read_metadata(
                        os.path.join(d, COMPACT_NAME)
                    ).num_rows
                )
                continue
            if len(names) <= 1:
                out["b"].append(int(b))
                out["action"].append("skipped")
                out["files_before"].append(len(names))
                out["rows"].append(
                    pq.read_metadata(os.path.join(d, names[0])).num_rows
                    if names else 0
                )
                continue
            t = pq.read_table(d)
            import pyarrow.compute as pc_

            idx = pc_.sort_indices(
                t, sort_keys=[("subj", "ascending"),
                              ("pred", "ascending"),
                              ("obj", "ascending")]
            )
            t = t.take(idx)
            tmp = os.path.join(d, f".{COMPACT_NAME}.tmp")
            pq.write_table(t, tmp)
            os.replace(tmp, os.path.join(d, COMPACT_NAME))
            for f in names:
                os.remove(os.path.join(d, f))
            out["b"].append(int(b))
            out["action"].append("compacted")
            out["files_before"].append(len(names))
            out["rows"].append(t.num_rows)
        return pd.DataFrame(out)

    res = (
        rd.from_items(items, override_num_blocks=len(items))
        .map_batches(_one, batch_format="pandas", batch_size=1)
        .take_all()
    )
    # refresh lineage file/byte counts (rows + signatures unchanged)
    recs = {r["bucket"]: r for r in read_lineage(store_dir)}
    updated = []
    for r in res:
        b = int(r["b"])
        if b in recs and r["action"] in ("compacted", "healed"):
            part = os.path.join(dd, f"{BUCKET_COL}={b}")
            sizes = [
                os.path.getsize(os.path.join(part, f))
                for f in os.listdir(part) if f.endswith(".parquet")
            ]
            recs[b]["files"] = len(sizes)
            recs[b]["bytes"] = sum(sizes)
            updated.append(recs[b])
    if updated:
        write_lineage(store_dir, updated)
    return {
        "compacted": sorted(int(r["b"]) for r in res
                            if r["action"] == "compacted"),
        "skipped": sorted(int(r["b"]) for r in res
                          if r["action"] != "compacted"),
    }


def drop_graphs(store_dir: str, graph_uris) -> dict:
    """SPARQL ``DROP GRAPH`` analog (twine unpublishes a resource by
    replacing its graph with nothing; ``twine:libtwine/sparql.c::
    twine_sparql_put`` with an empty model): remove every triple of the
    named graphs from the store.

    Cost is bounded by the AFFECTED buckets, not store size: each graph
    hashes to one bucket via the pinned manifest, so only those
    partitions are read and rewritten — one parallel task per touched
    bucket, no shuffle.  Crash-safe with the compact_store protocol:
    the filtered file lands atomically as ``compact.parquet`` FIRST,
    then the old run files are unlinked (an interrupted step-2 heals on
    the next compaction or drop).  Lineage rows/files/bytes AND the
    two-salt content signatures refresh for touched buckets, so
    incremental mode sees the post-drop store state.
    """
    import os

    import ray.data as rd

    uris = sorted(set(graph_uris))
    if not uris:
        return {"dropped_rows": 0, "buckets": []}
    m = ckpt.read_manifest(store_dir)
    if not m or "num_buckets" not in m:
        raise ValueError(
            f"{store_dir} has no bucketing manifest — not a triple "
            "store written by materialize_triples"
        )
    num_buckets = int(m["num_buckets"])
    by_bucket: dict[int, list[str]] = {}
    for g in uris:
        by_bucket.setdefault(bucket_of(g, num_buckets), []).append(g)

    dd = ckpt.data_dir(store_dir)
    items = []
    for b, gs in sorted(by_bucket.items()):
        d = os.path.join(dd, f"{BUCKET_COL}={b}")
        if os.path.isdir(d):
            items.append({"b": b, "dir": d, "graphs": ",".join(gs)})
    if not items:
        return {"dropped_rows": 0, "buckets": []}

    def _one(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc_
        import pyarrow.parquet as pq

        out = {"b": [], "removed": [], "rows": [], "s1": [], "s2": []}
        for b, d, gs in zip(batch["b"], batch["dir"], batch["graphs"]):
            names = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )
            t = pq.read_table(d)
            keep = pc_.invert(
                pc_.is_in(t["graph"],
                          value_set=pa.array(gs.split(","),
                                             type=pa.string()))
            )
            kept = t.filter(keep)
            removed = t.num_rows - kept.num_rows
            if removed:
                # row order within runs is preserved by filter; the
                # single-file result is re-sorted like compaction so
                # the one-sorted-file invariant holds
                idx = pc_.sort_indices(
                    kept, sort_keys=[("subj", "ascending"),
                                     ("pred", "ascending"),
                                     ("obj", "ascending")]
                )
                kept = kept.take(idx)
                tmp = os.path.join(d, f".{COMPACT_NAME}.tmp")
                pq.write_table(kept, tmp)
                os.replace(tmp, os.path.join(d, COMPACT_NAME))
                for f in names:
                    if f != COMPACT_NAME:
                        os.remove(os.path.join(d, f))
            s1, s2, n = _sig_of_frame(
                kept.select(_SIG_COLS).to_pandas()
            )
            out["b"].append(int(b))
            out["removed"].append(int(removed))
            out["rows"].append(int(n))
            out["s1"].append(int(s1))
            out["s2"].append(int(s2))
        return pd.DataFrame(out)

    res = (
        rd.from_items(items, override_num_blocks=len(items))
        .map_batches(_one, batch_format="pandas", batch_size=1)
        .take_all()
    )
    recs = {r["bucket"]: r for r in read_lineage(store_dir)}
    updated = []
    for r in res:
        if not r["removed"]:
            continue
        b = int(r["b"])
        part = os.path.join(dd, f"{BUCKET_COL}={b}")
        sizes = [
            os.path.getsize(os.path.join(part, f))
            for f in os.listdir(part) if f.endswith(".parquet")
        ]
        rec = recs.get(b, {"bucket": b})
        rec.update(
            rows=int(r["rows"]), files=len(sizes), bytes=sum(sizes),
            sig1=int(r["s1"]), sig2=int(r["s2"]),
        )
        updated.append(rec)
    if updated:
        write_lineage(store_dir, updated)
    return {
        "dropped_rows": int(sum(r["removed"] for r in res)),
        "buckets": sorted(int(r["b"]) for r in res if r["removed"]),
    }


def read_triple_store(out_dir: str):
    """Read the store back (all marked buckets)."""
    import ray.data as rd

    return rd.read_parquet(ckpt.data_dir(out_dir))
