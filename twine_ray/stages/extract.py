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
