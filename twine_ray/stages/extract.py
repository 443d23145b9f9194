"""Stage M2/M3: HTML -> text extraction + graph-URI normalization.

Ray-native analog of Twine's XSLT processor plugin
(``twine:plug-ins/xslt.c``) plus liburi graph-URI normalization.
Stateless ``map_batches`` over zero-copy Arrow batches; the per-row
``html_to_text`` call is the frozen pure function of docs/EXTRACTION.md,
so output is byte-identical per url at any parallelism.

The ``html`` column is DROPPED here — nothing downstream needs raw
bytes, and shuffles must never move them (SURVEY.md §4 memory row).
"""

from __future__ import annotations

import pyarrow as pa

from twine_ray.functions.html_text import extract_title, html_to_text
from twine_ray.functions.urls import normalize_url

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
        ("title", pa.string()),
        ("lang", pa.string()),
    ]
)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> extracted batch (url normalized, html dropped)."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    out_urls = [normalize_url(u) for u in urls]
    texts = [html_to_text(h or b"") for h in htmls]
    titles = [extract_title(h or b"") for h in htmls]
    return pa.Table.from_arrays(
        [
            pa.array(out_urls, type=pa.string()),
            batch["warc_ts"].combine_chunks()
            if isinstance(batch["warc_ts"], pa.ChunkedArray)
            else batch["warc_ts"],
            pa.array(texts, type=pa.string()),
            pa.array(titles, type=pa.string()),
            batch["lang"].combine_chunks()
            if isinstance(batch["lang"], pa.ChunkedArray)
            else batch["lang"],
        ],
        schema=EXTRACTED_SCHEMA,
    )


def extract_text(pages_ds, batch_size: int = 256):
    """pages Dataset -> extracted Dataset (stateless task stage)."""
    return pages_ds.map_batches(
        extract_text_batch, batch_format="pyarrow", batch_size=batch_size
    )


def latest_page_wins(extracted_ds):
    """Graph-replace semantics (FIXTURES.md F7a) over the EXTRACTED
    table: when the same url was crawled twice, the row with the max
    ``warc_ts`` wins — the analog of Twine's idempotent whole-graph
    SPARQL PUT (``twine:libtwine/sparql.c::twine_sparql_put``): a later
    message for the same graph URI replaces the earlier state.

    Runs after ``extract_text`` on purpose: extraction is deterministic
    and cheap per duplicate, and this way the groupby shuffle moves the
    extracted text, never the raw ``html`` bytes (SURVEY.md §4).

    Partial per-batch reduce first (co-resident dups collapse early),
    then a hash-bucketed final reduce on the normalized url (ONE
    shuffle, vectorized within buckets — never one Python call per
    url).  Ties on (url, warc_ts) break on the lexicographically
    greatest text hash — deterministic under any partitioning.
    """
    import hashlib

    import pandas as pd

    from twine_ray.stages.grouped import bucketed_group_reduce

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.drop(columns=["_tie"], errors="ignore")
        if "_tie" not in df.columns:
            df = df.assign(
                _tie=df["text"].map(
                    lambda t: hashlib.md5((t or "").encode()).hexdigest()
                )
            )
        df = df.sort_values(["url", "warc_ts", "_tie"], kind="mergesort")
        return df.drop_duplicates(subset=["url"], keep="last")

    deduped = bucketed_group_reduce(extracted_ds, ["url"], _reduce)

    def _drop_tie(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=["_tie"], errors="ignore")

    return deduped.map_batches(_drop_tie, batch_format="pandas")


# Above this many duplicated urls, the dup-hash set is NOT collected /
# broadcast (a recrawl-heavy corpus can have a corpus-scale duplicated
# set: 10^11 urls x 8 bytes would be driver-fatal) — the pipeline
# auto-routes to the full-shuffle latest-wins path instead.  Same
# valve pattern as CANON_BROADCAST_LIMIT (VERDICT r2 'What's wrong' #1).
DUP_BROADCAST_LIMIT = 2_000_000


def duplicate_url_hashes(pages_ds, batch_size: int = 4096,
                         limit: int | None = None) -> set[int] | None:
    """Stable hashes of normalized urls that appear on MORE than one
    page row — computed on a url-only projection (column-pruned read,
    16-byte shuffle rows), so finding the duplicate slice costs almost
    nothing next to the corpus.

    Returns ``None`` when the duplicated set exceeds ``limit`` (default
    ``DUP_BROADCAST_LIMIT``): the count is taken DISTRIBUTED before any
    driver collect, so a dup-dense corpus never lands on the driver."""
    import pandas as pd

    from twine_ray.functions.ids import stable_hash64

    if limit is None:
        limit = DUP_BROADCAST_LIMIT

    def _partial(batch: pa.Table) -> pa.Table:
        h = pd.Series(
            [stable_hash64(normalize_url(u)) % (1 << 62)
             for u in batch["url"].to_pylist()],
            dtype="int64",
        )
        vc = h.value_counts()
        return pa.Table.from_pydict(
            {"h": pa.array(vc.index.to_numpy(), type=pa.int64()),
             "n": pa.array(vc.to_numpy(), type=pa.int64())}
        )

    from ray.data.aggregate import Sum

    counts = (
        pages_ds.select_columns(["url"])
        .map_batches(_partial, batch_format="pyarrow",
                     batch_size=batch_size)
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
    )
    # materialize the (small on sane crawls) dup slice in the OBJECT
    # STORE first; count() is then free and gates the driver collect
    dups = counts.filter(expr="n > 1").materialize()
    if dups.count() > limit:
        return None
    return {r["h"] for r in dups.take_all()}


def extract_with_graph_replace(pages_ds, batch_size: int = 256):
    """extract_text + graph-replace dedup, shuffling ONLY duplicates.

    In a crawl corpus almost every url is unique, so the full
    latest-wins groupby would shuffle the entire extracted text for
    nothing.  Instead: (1) find duplicated urls on a url-only
    projection (``duplicate_url_hashes`` — near-free), (2) split the
    PAGES stream on that broadcast set (urls are known before
    extraction), (3) the clean side streams straight through
    extraction, only the duplicate slice pays the latest-wins
    reduction.  Output set is identical to
    ``latest_page_wins(extract_text(pages))`` (tested).

    When the duplicated-url set exceeds ``DUP_BROADCAST_LIMIT``
    (recrawl-heavy corpus — every url crawled twice), the broadcast
    would be driver-scale, so the pipeline AUTO-ROUTES to the tested
    full-shuffle ``latest_page_wins`` path instead (equality under a
    forced tiny limit is pinned in tests/test_extract.py)."""
    import numpy as np
    import pandas as pd

    from twine_ray.functions.ids import stable_hash64

    dup_hashes = duplicate_url_hashes(pages_ds)
    if dup_hashes is None:
        return latest_page_wins(extract_text(pages_ds,
                                             batch_size=batch_size))
    if not dup_hashes:
        return extract_text(pages_ds, batch_size=batch_size)

    dup_arr = np.array(sorted(dup_hashes), dtype=np.int64)

    def _split(dupside: bool):
        def _f(df: pd.DataFrame) -> pd.DataFrame:
            h = np.array(
                [stable_hash64(normalize_url(u)) % (1 << 62)
                 for u in df["url"]],
                dtype=np.int64,
            )
            mask = np.isin(h, dup_arr)
            return df[mask] if dupside else df[~mask]

        return _f

    clean = pages_ds.map_batches(_split(False), batch_format="pandas")
    dups = pages_ds.map_batches(_split(True), batch_format="pandas")
    deduped = latest_page_wins(
        extract_text(dups, batch_size=batch_size)
    ).map_batches(
        # coerce back to Arrow blocks: the union's two branches must not
        # mix pandas (map_groups output) with Arrow blocks — downstream
        # batching asserts a single block type (Ray 2.49)
        lambda t: t, batch_format="pyarrow",
    )
    return extract_text(clean, batch_size=batch_size).union(deduped)
