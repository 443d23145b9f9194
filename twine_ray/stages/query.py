"""Triple-pattern read surface over the partitioned store.

The reference's read path is SPARQL against the store: Twine fetches a
graph's prior state before replacing it
(``twine:libtwine/sparql.c::twine_sparql_get``) and Spindle's lookup
endpoints resolve entities.  The Parquet-store analogs:

- ``read_graph(store_dir, graph_uri)``: ONE named graph.  The graph's
  bucket is computed from the store's pinned manifest
  (``bucket_of(graph, num_buckets)``), so only THAT partition
  directory's files are read — cost is one bucket, not the store —
  then an Arrow equality filter selects the graph's rows.
- ``match_triples(store_dir, graph/subj/pred/obj)``: general pattern
  scan.  A bound ``graph`` prunes to its bucket partition at the FILE
  LIST; every bound term is also pushed into ``read_parquet``'s Arrow
  dataset filter, so Parquet row-group statistics skip
  non-matching row groups before any byte decodes (the store is sorted
  by (subj, pred, obj) within each bucket, which makes subj ranges
  tight).

Both return lazy Datasets — consumers stream.
"""

from __future__ import annotations

import os

from twine_ray.functions.ids import bucket_of
from twine_ray.state import checkpoint as ckpt

BUCKET_COL = "graph_bucket"


def _store_num_buckets(store_dir: str) -> int:
    m = ckpt.read_manifest(store_dir)
    if not m or "num_buckets" not in m:
        raise ValueError(
            f"{store_dir} has no bucketing manifest — not a triple store "
            "written by materialize_triples"
        )
    return int(m["num_buckets"])


def _partition_files(store_dir: str, bucket: int | None) -> list[str]:
    dd = ckpt.data_dir(store_dir)
    files: list[str] = []
    if not os.path.isdir(dd):
        return files
    for name in sorted(os.listdir(dd)):
        if not name.startswith(f"{BUCKET_COL}="):
            continue
        b = int(name.split("=", 1)[1])
        if bucket is not None and b != bucket:
            continue
        part = os.path.join(dd, name)
        files.extend(
            os.path.join(part, f)
            for f in sorted(os.listdir(part))
            if f.endswith(".parquet")
        )
    return files


def match_triples(store_dir: str, *, graph: str | None = None,
                  subj: str | None = None, pred: str | None = None,
                  obj: str | None = None, columns: list[str] | None = None):
    """Lazy Dataset of store triples matching the bound terms."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from twine_ray.stages.triples import TRIPLES_SCHEMA

    bucket = None
    if graph is not None:
        bucket = bucket_of(graph, _store_num_buckets(store_dir))
    files = _partition_files(store_dir, bucket)
    if not files:
        return rd.from_arrow(pa.Table.from_pylist([], schema=TRIPLES_SCHEMA))

    bound = [
        (c, v)
        for c, v in (("graph", graph), ("subj", subj), ("pred", pred),
                     ("obj", obj))
        if v is not None
    ]
    expr = None
    for c, v in bound:
        e = pc.field(c) == v
        expr = e if expr is None else expr & e

    def _strip(t: pa.Table) -> pa.Table:
        # hive partitioning is inferred from the file PATHS even for an
        # explicit file list — drop the bucket column it re-adds
        if BUCKET_COL in t.schema.names:
            t = t.drop_columns([BUCKET_COL])
        return t

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    if expr is not None:
        kwargs["filter"] = expr
    try:
        return rd.read_parquet(files, **kwargs).map_batches(
            _strip, batch_format="pyarrow"
        )
    except TypeError:
        # older read_parquet without filter pushdown: residual filter
        ds = rd.read_parquet(files, columns=columns)

        def _flt(t: pa.Table) -> pa.Table:
            t = _strip(t)
            mask = None
            for c, v in bound:
                m = pc.equal(t[c], v)
                mask = m if mask is None else pc.and_(mask, m)
            return t if mask is None else t.filter(mask)

        return ds.map_batches(_flt, batch_format="pyarrow")


def read_graph(store_dir: str, graph_uri: str):
    """SPARQL-GET analog: one named graph, file-pruned to its bucket."""
    return match_triples(store_dir, graph=graph_uri)
