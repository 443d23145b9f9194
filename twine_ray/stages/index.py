"""Per-proxy index generation (SURVEY.md §1.1 proxy row — the
``spindle:generate/`` relational index).

Spindle materializes, next to the proxy graphs, a relational index of
every proxy: classes, score, per-language title/description, member
count, media links — the query surface a consumer of the store hits
first (VERDICT r2 'What's missing' #2).  The Ray-native analog is ONE
aggregation pass over the RESOLVED triple store:

    resolved triples -> per-batch partial index rows (vectorized
    pandas groupby — both subj-keyed and, for incoming mentions,
    obj-keyed rows) -> bucketed_group_reduce on the proxy key ->
    finalize (kind/member-count normalization)

Every merge is associative (sums for counts, max for strings, and the
winning label rides a (score, label) sort-first that is stable under
any partial/final split), so the combiner halves shuffle volume the
same way property resolution does.

Index columns:
- ``subj``: proxy URI (page graph URI or canonical entity URI)
- ``kind``: 'page' (has dc:* metadata) | 'entity'
- ``label`` / ``label_lang``: winning dc:title value + language
  (highest score, then lexicographically greatest value)
- ``lang``: dc:language value (resolved single value)
- ``modified``: dc:modified ISO value
- ``n_members``: coreference-class size (membership triples; entity
  singletons report 1, pages 0)
- ``n_mentions_out``: schema:mentions triples with this subj (pages)
- ``n_mentioned_by``: schema:mentions triples with this obj (entities)
- ``n_assoc``: rel:associatedWith degree (subj side + obj side)
- ``n_triples``: outgoing triple count
- ``score_max``: max rulebase score over outgoing triples
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from twine_ray.state.rulebase import (
    DC_LANGUAGE,
    DC_MODIFIED,
    DC_TITLE,
    OWL_SAMEAS,
    REL_ASSOCIATED,
    SCHEMA_MENTIONS,
)

_PARTIAL_COLS = [
    "key", "is_page", "label_score", "label", "label_lang", "lang",
    "modified", "n_members", "n_mentions_out", "n_mentioned_by",
    "n_assoc", "n_triples", "score_max",
]

INDEX_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("kind", pa.string()),
        ("label", pa.string()),
        ("label_lang", pa.string()),
        ("lang", pa.string()),
        ("modified", pa.string()),
        ("n_members", pa.int64()),
        ("n_mentions_out", pa.int64()),
        ("n_mentioned_by", pa.int64()),
        ("n_assoc", pa.int64()),
        ("n_triples", pa.int64()),
        ("score_max", pa.int64()),
    ]
)


def _partial_rows(df: pd.DataFrame) -> pd.DataFrame:
    """One batch of resolved triples -> partial index rows (vectorized:
    pandas C groupby kernels, no Python loop over keys)."""
    if df.empty:
        return pd.DataFrame({c: [] for c in _PARTIAL_COLS})

    meta = {DC_TITLE, DC_LANGUAGE, DC_MODIFIED}
    is_title = df["pred"] == DC_TITLE
    is_lang = df["pred"] == DC_LANGUAGE
    is_mod = df["pred"] == DC_MODIFIED
    is_mention = df["pred"] == SCHEMA_MENTIONS
    is_assoc = df["pred"] == REL_ASSOCIATED
    is_member = df["pred"] == OWL_SAMEAS

    subj_side = pd.DataFrame(
        {
            "key": df["subj"],
            "is_page": df["pred"].isin(meta).astype("int64"),
            "label_score": np.where(is_title, df["score"], -1).astype(
                "int64"
            ),
            "label": np.where(is_title, df["obj"], ""),
            "label_lang": np.where(is_title, df["obj_lang"], ""),
            "lang": np.where(is_lang, df["obj"], ""),
            "modified": np.where(is_mod, df["obj"], ""),
            "n_members": is_member.astype("int64"),
            "n_mentions_out": is_mention.astype("int64"),
            "n_mentioned_by": np.zeros(len(df), dtype="int64"),
            "n_assoc": is_assoc.astype("int64"),
            "n_triples": np.ones(len(df), dtype="int64"),
            "score_max": df["score"].astype("int64"),
        }
    )
    # obj-keyed rows: incoming mentions + assoc degree for the object
    obj_df = df[(is_mention | is_assoc) & ~df["obj_is_lit"]]
    obj_side = pd.DataFrame(
        {
            "key": obj_df["obj"],
            "is_page": np.zeros(len(obj_df), dtype="int64"),
            "label_score": np.full(len(obj_df), -1, dtype="int64"),
            "label": [""] * len(obj_df),
            "label_lang": [""] * len(obj_df),
            "lang": [""] * len(obj_df),
            "modified": [""] * len(obj_df),
            "n_members": np.zeros(len(obj_df), dtype="int64"),
            "n_mentions_out": np.zeros(len(obj_df), dtype="int64"),
            "n_mentioned_by": (obj_df["pred"] == SCHEMA_MENTIONS)
            .astype("int64").to_numpy(),
            "n_assoc": (obj_df["pred"] == REL_ASSOCIATED)
            .astype("int64").to_numpy(),
            "n_triples": np.zeros(len(obj_df), dtype="int64"),
            "score_max": np.zeros(len(obj_df), dtype="int64"),
        }
    )
    return _merge_partials(pd.concat([subj_side, obj_side]))


def _merge_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Associative merge of partial index rows per key."""
    if df.empty:
        return df
    df = df.sort_values(
        ["key", "label_score", "label"],
        ascending=[True, False, False],
        kind="mergesort",
    )
    return df.groupby("key", as_index=False).agg(
        is_page=("is_page", "max"),
        label_score=("label_score", "max"),
        label=("label", "first"),
        label_lang=("label_lang", "first"),
        lang=("lang", "max"),
        modified=("modified", "max"),
        n_members=("n_members", "sum"),
        n_mentions_out=("n_mentions_out", "sum"),
        n_mentioned_by=("n_mentioned_by", "sum"),
        n_assoc=("n_assoc", "sum"),
        n_triples=("n_triples", "sum"),
        score_max=("score_max", "max"),
    )


def _finalize(df: pd.DataFrame) -> pd.DataFrame:
    """Complete per-key rows -> public index schema."""
    if df.empty:
        return pd.DataFrame(
            {f.name: pd.Series([], dtype="object" if f.type == pa.string()
                               else "int64")
             for f in INDEX_SCHEMA}
        )
    kind = np.where(df["is_page"] > 0, "page", "entity")
    n_members = np.where(
        (df["is_page"] == 0) & (df["n_members"] == 0), 1, df["n_members"]
    ).astype("int64")
    return pd.DataFrame(
        {
            "subj": df["key"],
            "kind": kind,
            "label": df["label"],
            "label_lang": df["label_lang"],
            "lang": df["lang"],
            "modified": df["modified"],
            "n_members": n_members,
            "n_mentions_out": df["n_mentions_out"].astype("int64"),
            "n_mentioned_by": df["n_mentioned_by"].astype("int64"),
            "n_assoc": df["n_assoc"].astype("int64"),
            "n_triples": df["n_triples"].astype("int64"),
            "score_max": df["score_max"].astype("int64"),
        }
    )


def proxy_index(resolved_ds, num_buckets: int = 64):
    """Resolved triples Dataset -> per-proxy index Dataset.

    ONE wide exchange (bucketed by proxy key); partial rows are merged
    per batch first, so only (key, aggregates) rows shuffle — never
    triples."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    partials = resolved_ds.map_batches(
        _partial_rows, batch_format="pandas"
    )
    merged = bucketed_group_reduce(
        partials, ["key"], _merge_partials, num_buckets=num_buckets
    )
    return merged.map_batches(_finalize, batch_format="pandas")


def proxy_index_spec(resolved_df: pd.DataFrame) -> pd.DataFrame:
    """Driver-side spec of ``proxy_index`` for tests: same partials,
    one merge, finalize — pure pandas, no Ray."""
    return (
        _finalize(_merge_partials(_partial_rows(resolved_df)))
        .sort_values("subj")
        .reset_index(drop=True)
    )
