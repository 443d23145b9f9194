"""Pages-table sources (SURVEY.md §2.1 S1–S4).

The reference ingests via an AMQP queue (``twine:libmq`` + the
``twine:writer`` daemon loop) fed by an S3 crawl cache
(``twine:plug-ins/s3.c``).  Here the queue *is* the Parquet shard list:
``ray.data.read_parquet`` over the pages layout, with Ray's streaming
executor providing the backpressure the broker provided.

Two corpus builders exist for the sandbox (no network, no crawl):

- ``synth_pages_dataset``: fully synthetic corpus, generated
  DISTRIBUTED — ``ray.data.range(n).map_batches(PageGen)`` so a bench
  corpus never materializes on the driver.
- ``pages_from_documents``: derives a pages corpus from the driver's
  ``documents.parquet`` (doc text wrapped in deterministic HTML with
  injected entity sentences) — used by ``entry()`` and the oracle
  queries so testdata remains the input of record.

Both are pure functions of (seed, id): any partitioning produces
byte-identical rows.
"""

from __future__ import annotations

import datetime as dt
import random

import pyarrow as pa

from twine_ray.functions.html_text import html_to_text
from twine_ray.sources import world as W
from twine_ray.state.broadcast import pool

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def pages_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


class PageGen:
    """Actor-pool batch generator for the synthetic corpus.

    World construction (entities, aliases, edge assignment) happens once
    per actor in ``__init__`` (SURVEY.md §2.3 pattern); each batch maps
    page ids -> page rows.
    """

    def __init__(self, n_pages: int, seed: int = W.WORLD_SEED,
                 n_entities: int = 200) -> None:
        self.world = W.make_world(n_entities=n_entities, seed=seed)
        self.edges_by_page = W.edges_by_page(self.world, n_pages)
        self.n_pages = n_pages

    def __call__(self, batch: dict) -> pa.Table:
        rows = []
        for pid in batch["id"].tolist():
            row, _ = W.build_page(
                self.world, int(pid), self.n_pages,
                self.edges_by_page.get(int(pid), []),
            )
            rows.append(row)
        return pages_table(rows)


def synth_pages_dataset(n_pages: int, seed: int = W.WORLD_SEED,
                        n_entities: int = 200, concurrency: int | None = None):
    """Distributed deterministic corpus: Dataset of ``n_pages`` rows."""
    import ray.data as rd

    ds = rd.range(n_pages)
    return ds.map_batches(
        PageGen,
        fn_constructor_kwargs={
            "n_pages": n_pages, "seed": seed, "n_entities": n_entities,
        },
        batch_size=512,
        batch_format="numpy",
        concurrency=pool(concurrency or 4),
    )


# ---------------------------------------------------------------------------
# documents.parquet -> pages corpus
# ---------------------------------------------------------------------------

_DOC_EPOCH = dt.datetime(2024, 6, 1)


def build_doc_page(world: W.World, doc_id: int, text: str, lang: str,
                   source: str) -> tuple[dict, W.PageTruth]:
    """One pages row derived from a documents row. Pure fn of
    (world.seed, doc_id, text, lang, source)."""
    rng = random.Random(f"{world.seed}:doc:{int(doc_id)}")
    url = f"http://{source or 'docs'}.example/doc/{int(doc_id)}"
    title = f"Document {int(doc_id)} ({source})"
    warc_ts = _DOC_EPOCH + dt.timedelta(seconds=(int(doc_id) * 271) % 10_000_000)

    truth = W.PageTruth(
        url=url, title=title, lang=lang or "", warc_ts=warc_ts,
        mention_keys=[], assoc_pairs=[], sameas_pairs=[],
    )

    def note(e: W.Entity, surface: str) -> None:
        linked = W.resolve_alias(world.alias_map, surface)
        if linked:
            truth.mention_keys.append(linked[0])

    sentences: list[str] = []
    # entity sentences injected deterministically
    e1 = world.entities[rng.randrange(len(world.entities))]
    s1 = e1.aliases[rng.randrange(len(e1.aliases))]
    sentences.append(f"{s1} announced a new initiative this quarter.")
    note(e1, s1)
    if doc_id % 3 == 0:
        e2 = world.entities[rng.randrange(len(world.entities))]
        if e2.key == e1.key:
            e2 = world.entities[(e1.idx + 1) % len(world.entities)]
        s2 = e2.aliases[0]
        sentences.append(f"{s1} was seen with {s2} at the summit.")
        l1 = W.resolve_alias(world.alias_map, s1)
        l2 = W.resolve_alias(world.alias_map, s2)
        note(e2, s2)
        if l1 and l2:
            truth.assoc_pairs.append((l1[0], l2[0]))
    if doc_id % 11 == 0 and world.coref_edges:
        a_key, b_key = world.coref_edges[doc_id % len(world.coref_edges)]
        ent_a = world.entities[int(a_key.rsplit("e", 1)[1])]
        ent_b = world.entities[int(b_key.rsplit("e", 1)[1])]
        sentences.append(
            f"{ent_a.aliases[0]} is also known as {ent_b.aliases[0]}."
        )
        note(ent_a, ent_a.aliases[0])
        note(ent_b, ent_b.aliases[0])
        truth.sameas_pairs.append((ent_a.key, ent_b.key))

    # document body: first ~400 chars of the source text as paragraphs
    body = (text or "")[:400]
    sentences.extend(p.strip() for p in body.split("\n") if p.strip())

    html_bytes = W.render_html(int(doc_id), title, lang or "en", sentences)
    row = {
        "url": url,
        "warc_ts": warc_ts,
        "html": html_bytes,
        "text": html_to_text(html_bytes),
        "lang": lang or "",
    }
    return row, truth


class DocPageGen:
    """Batch transform: documents rows -> pages rows (actor pool)."""

    def __init__(self, seed: int = W.WORLD_SEED, n_entities: int = 200) -> None:
        self.world = W.make_world(n_entities=n_entities, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        sources = batch["source"].to_pylist()
        for doc_id, text, lang, source in zip(doc_ids, texts, langs, sources):
            row, _ = build_doc_page(self.world, doc_id, text, lang, source)
            rows.append(row)
        return pages_table(rows)


def pages_from_documents(sf_dir: str, seed: int = W.WORLD_SEED,
                         n_entities: int = 200, concurrency: int | None = None):
    """Dataset of pages derived from ``{sf_dir}/documents.parquet``."""
    from twine_ray.sources.readers import rows_read_parquet

    # rows-based plan: page synthesis + extraction are compute-heavy
    # per row, so the block count must track rows (feeding the actor
    # pool), not Ray's static 200-block floor over a tiny file
    ds = rows_read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    return ds.map_batches(
        DocPageGen,
        fn_constructor_kwargs={"seed": seed, "n_entities": n_entities},
        batch_size=256,
        batch_format="pyarrow",
        concurrency=pool(concurrency or 4),
    )


# ---------------------------------------------------------------------------
# Co-partitioned pages layout (VERDICT r2 #6 — file-level pruning)
# ---------------------------------------------------------------------------

PAGE_BUCKET_COL = "page_bucket"


def write_pages_partitioned(pages_ds, out_dir: str,
                            num_buckets: int = 32) -> None:
    """Write a pages corpus partitioned by the SAME graph-bucket key
    the triple store uses (``bucket_of(normalize_url(url))``), one
    directory per bucket.  An incremental run over this layout skips
    unchanged buckets at the parquet READ — their bytes never leave
    disk (previously the whole corpus was scanned and filtered
    post-read; docs/SCALE.md noted the gap)."""
    from twine_ray.functions.ids import bucket_of
    from twine_ray.functions.urls import normalize_url

    def _add(batch: pa.Table) -> pa.Table:
        b = pa.array(
            [bucket_of(normalize_url(u), num_buckets)
             for u in batch["url"].to_pylist()],
            type=pa.int32(),
        )
        return batch.append_column(PAGE_BUCKET_COL, b)

    pages_ds.map_batches(_add, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=[PAGE_BUCKET_COL]
    )
    import json
    import os

    with open(os.path.join(out_dir, "_PAGES_META.json"), "w") as f:
        json.dump({"num_buckets": num_buckets,
                   "scheme": "graph-bucket-v1"}, f)


def read_pages_partitioned(out_dir: str, skip_buckets=()):
    """Pruned read of a ``write_pages_partitioned`` layout: only
    partition directories NOT in ``skip_buckets`` are handed to
    ``read_parquet``."""
    import os

    import ray.data as rd

    skip = {int(b) for b in skip_buckets}
    paths = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith(f"{PAGE_BUCKET_COL}="):
            b = int(name.split("=", 1)[1])
            if b not in skip:
                part_dir = os.path.join(out_dir, name)
                # expand to files: Ray's read_parquet takes a single
                # directory OR a list of FILES, not a list of dirs
                paths.extend(
                    os.path.join(part_dir, f)
                    for f in sorted(os.listdir(part_dir))
                    if f.endswith(".parquet")
                )
    if not paths:
        return rd.from_arrow(pa.Table.from_pylist([], schema=PAGES_SCHEMA))
    ds = rd.read_parquet(paths)

    def _strip(t: pa.Table) -> pa.Table:
        if PAGE_BUCKET_COL in t.schema.names:
            t = t.drop_columns([PAGE_BUCKET_COL])
        return t.select(PAGES_SCHEMA.names).cast(PAGES_SCHEMA)

    return ds.map_batches(_strip, batch_format="pyarrow")


def partitioned_pages_source(out_dir: str):
    """Factory form consumed by the KG pipeline's phase 1: called with
    the set of already-done graph buckets, returns the pruned Dataset.
    Valid because the layout's partition key IS the pipeline's graph
    bucket (same normalize + hash), so pruning a partition is exactly
    the resume filter.  Carries ``num_buckets`` from the layout meta so
    the pipeline can refuse a bucketing mismatch (stale partition keys
    would silently skip the wrong pages)."""
    import json
    import os

    def _src(done_buckets):
        return read_pages_partitioned(out_dir, skip_buckets=done_buckets)

    meta_path = os.path.join(out_dir, "_PAGES_META.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            _src.num_buckets = int(json.load(f)["num_buckets"])
    return _src


def alias_dict_table(seed: int = W.WORLD_SEED, n_entities: int = 200) -> pa.Table:
    """FIXTURES.md T2 alias dictionary as an Arrow table."""
    world = W.make_world(n_entities=n_entities, seed=seed)
    return pa.Table.from_pylist(
        W.alias_dict_rows(world),
        schema=pa.schema(
            [
                ("alias_norm", pa.string()),
                ("entity_key", pa.string()),
                ("prior", pa.float64()),
                ("shard", pa.int32()),
            ]
        ),
    )
