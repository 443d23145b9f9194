"""Stage J3: old-vs-new graph diff (incremental mode).

The reference's ``sparql-get`` pseudo-processor fetches the current
named graph into ``graph->old`` so processors can diff old against new
before the PUT (``twine:libtwine/workflow.c`` +
``twine:libtwine/graph.c``).  Batch analog: an exact distributed
set-difference (anti-join on the row tuple) between a freshly computed
triples Dataset and the previously materialized store — the changed
rows are exactly what an incremental run must re-PUT.

Implementation: project both sides to the key columns, tag the side,
union, hash-bucket on the key (ONE shuffle), and take the vectorized
per-bucket set difference with a pandas merge indicator (exact tuple
comparison, no hash-collision risk).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_SIDE_COL = "__side"


def dataset_except(new_ds, old_ds, key_cols: list[str],
                   num_buckets: int = 64, distinct: bool = False):
    """Rows of ``new_ds`` (projected to ``key_cols``) whose tuple does
    not appear in ``old_ds``.  Default keeps the multiplicity of
    unmatched new rows; ``distinct=True`` gives SQL ``EXCEPT``
    (set) semantics."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    def _tag(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            return batch.select(key_cols).append_column(
                _SIDE_COL,
                pa.array([side] * batch.num_rows, type=pa.int8()),
            )

        return _t

    new_t = new_ds.map_batches(_tag(1), batch_format="pyarrow")
    old_t = old_ds.map_batches(_tag(0), batch_format="pyarrow")

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        # Applied twice (per batch, then per complete key bucket).
        # Invariant: keep every side-1 row not matched by a side-0 key
        # in the same frame, plus the deduped side-0 keys themselves —
        # associative, so the partial pass only shrinks data.
        new_rows = df[df[_SIDE_COL] == 1]
        if distinct:
            new_rows = new_rows.drop_duplicates(subset=key_cols)
        old_keys = df.loc[df[_SIDE_COL] == 0, key_cols].drop_duplicates()
        if old_keys.empty:
            return new_rows
        merged = new_rows[key_cols].merge(
            old_keys, on=key_cols, how="left", indicator=True
        )
        survivors = new_rows[
            (merged["_merge"] == "left_only").to_numpy()
        ]
        old_tagged = old_keys.assign(**{_SIDE_COL: pd.array(
            [0] * len(old_keys), dtype="int8")})
        return pd.concat([survivors, old_tagged], ignore_index=True)

    reduced = bucketed_group_reduce(
        new_t.union(old_t), key_cols, _reduce, num_buckets=num_buckets
    )

    def _strip(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[_SIDE_COL] == 1].drop(columns=[_SIDE_COL])

    return reduced.map_batches(_strip, batch_format="pandas")


def triples_diff(new_triples_ds, old_store_dir: str):
    """Triples present in the new computation but not in the old store
    (the incremental re-PUT set).  Key = the full quad identity
    (score excluded: it is rulebase metadata, not graph content)."""
    from twine_ray.stages.materialize import read_triple_store

    old = read_triple_store(old_store_dir)
    key = ["graph", "subj", "pred", "obj", "obj_is_lit", "obj_dt",
           "obj_lang"]
    return dataset_except(new_triples_ds, old, key)
