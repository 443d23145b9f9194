"""Distributed BPE vocabulary training + subword token counts.

The scale shape (HuggingFace-tokenizers-style, public knowledge): BPE
trains on the WORD-FREQUENCY table, not the raw corpus — identical
words merge identically — so the corpus contributes exactly ONE
bucketed counting exchange (same shape as text.q_top_tokens) and the
merge loop runs driver-side over the bounded table.

Scale valves, stated per the brief:
- the driver-side table is capped at WORD_CAP words by (count DESC,
  word ASC): each count bucket emits its own top-WORD_CAP (a superset
  of the global top-k members within the bucket), and the driver keeps
  the global top WORD_CAP — the standard practice of training subword
  vocabularies on the head of the word distribution (tail words are
  encoded by composition at inference).
- encoding streams: merge ranks are broadcast once (ray.put), each
  actor keeps a word -> length cache (Zipf makes the hit rate high).

No SQL oracle: the merge loop is iterative (not SQL-expressible);
tests/test_bpe.py pins the pipeline to the scalar spec
(functions/bpe.py) via a DuckDB-computed word-count table, plus
hand-checked fixtures and repartition-invariance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

WORD_CAP = 100_000
DEFAULT_MERGES = 50


def _docs(sf_dir: str, columns):
    from twine_ray.sources.readers import sized_read_parquet

    return sized_read_parquet(f"{sf_dir}/documents.parquet",
                              columns=columns)


def word_count_table(sf_dir: str, cap: int = WORD_CAP):
    """(word, n) Dataset: lowercased ASCII-\\w tokens, counted; each
    bucket keeps only its top ``cap`` rows so the driver collect is
    bounded whatever the corpus vocabulary."""
    from twine_ray.functions.textnorm import simple_tokens_ascii
    from twine_ray.stages.grouped import bucketed_group_reduce

    ds = _docs(sf_dir, ["text"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        counts: dict = {}
        for t in df["text"]:
            for w in simple_tokens_ascii((t or "").lower()):
                counts[w] = counts.get(w, 0) + 1
        return pd.DataFrame({
            "word": list(counts.keys()),
            "n": pd.Series(list(counts.values()), dtype="int64"),
        })

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("word", as_index=False).agg(n=("n", "sum"))
        out = out.sort_values(["n", "word"], kind="mergesort",
                              ascending=[False, True])
        return out.head(cap)

    # partial=False: _partial is already the per-batch combiner, and
    # _reduce's head(cap) is only correct over COMPLETE word groups (a
    # per-batch cap would drop partial counts before the global sum)
    return bucketed_group_reduce(
        ds.map_batches(_partial, batch_format="pandas"),
        ["word"], _reduce, partial=False,
    )


def train_merges(sf_dir: str, n_merges: int = DEFAULT_MERGES,
                 cap: int = WORD_CAP) -> list[tuple[str, str, int]]:
    """Driver-side merge list from the distributed word-count table."""
    from twine_ray.functions.bpe import train_bpe

    rows = word_count_table(sf_dir, cap).take_all()
    rows.sort(key=lambda r: (-int(r["n"]), r["word"]))
    counts = {r["word"]: int(r["n"]) for r in rows[:cap]}
    return train_bpe(counts, n_merges)


def q_bpe_merges(sf_dir: str, n_merges: int = DEFAULT_MERGES):
    """Trained merge table (rank, left, right, n) — the vocabulary a
    tokenizer ships; deterministic under any partitioning."""
    merges = train_merges(sf_dir, n_merges)
    return pd.DataFrame({
        "rank": pd.Series(range(len(merges)), dtype="int64"),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges],
        "n": pd.Series([m[2] for m in merges], dtype="int64"),
    })


class _BpeCounter:
    """Actor-pool subword counter: merge ranks resolved once per actor
    (broadcast), per-word length cache across batches."""

    def __init__(self, ranks_ref) -> None:
        from twine_ray.state.broadcast import resolve

        self.ranks = resolve(ranks_ref)
        self.cache: dict[str, int] = {}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from twine_ray.functions.bpe import encode_word
        from twine_ray.functions.textnorm import simple_tokens_ascii

        out = np.zeros(len(df), dtype=np.int64)
        for i, t in enumerate(df["text"]):
            total = 0
            for w in simple_tokens_ascii((t or "").lower()):
                ln = self.cache.get(w)
                if ln is None:
                    ln = len(encode_word(w, self.ranks))
                    if len(self.cache) < 1_000_000:
                        self.cache[w] = ln
                total += ln
            out[i] = total
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_bpe_tokens": out,
        })


def q_bpe_token_counts(sf_dir: str, n_merges: int = DEFAULT_MERGES):
    """Subword token count per doc under the corpus-trained vocabulary
    — the length accounting a training pipeline needs for packing."""
    from twine_ray.state.broadcast import broadcast, pool

    merges = train_merges(sf_dir, n_merges)
    ranks = {(a, b): i for i, (a, b, _n) in enumerate(merges)}
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        _BpeCounter,
        fn_constructor_kwargs={"ranks_ref": broadcast(ranks)},
        batch_format="pandas",
        concurrency=pool(8),
    )
