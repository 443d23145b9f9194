"""BPE vocabulary training + encoding gates (no SQL oracle — the merge
loop is iterative; these tests ARE the correctness surface, per
__ray_entry__.py's no_oracle contract)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from twine_ray.functions.bpe import (
    EOW,
    encode_word,
    train_bpe,
    word_symbols,
)
from twine_ray.pipelines import bpe

SF = "/root/testdata/sf0.001"


def test_train_bpe_classic_fixture():
    # the Sennrich paper's canonical example shape: 'es' dominates
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(counts, 4)
    assert merges[0] == ("e", "s", 9)          # newest+widest
    assert merges[1] == ("es", "t", 9)
    assert merges[2] == ("est", EOW, 9)
    assert merges[3] == ("l", "o", 7)          # low+lower


def test_train_bpe_tie_breaks_lexicographic():
    # 'ab' and 'ba' both occur twice in 'abab' x1 ('ab','ba','ab');
    # plus 'ab' once more in 'ab' -> counts differ; craft a real tie:
    counts = {"ab": 2, "cd": 2}
    merges = train_bpe(counts, 1)
    assert merges[0] == ("a", "b", 2)          # lexicographically first


def test_encode_word_reproduces_training_merges():
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(counts, 10)
    ranks = {(a, b): i for i, (a, b, _n) in enumerate(merges)}
    # applying the encoder to a training word must yield the same
    # symbols the training loop ended with
    from twine_ray.functions.bpe import merge_pair

    vocab = {word_symbols(w): n for w, n in counts.items()}
    for (a, b, _n) in merges:
        vocab = {merge_pair(s, (a, b)): c for s, c in vocab.items()}
    for w in counts:
        assert encode_word(w, ranks) in vocab


def test_encode_unseen_word_composes():
    counts = {"low": 5, "newest": 6}
    merges = train_bpe(counts, 10)
    ranks = {(a, b): i for i, (a, b, _n) in enumerate(merges)}
    syms = encode_word("lowest", ranks)
    assert "".join(syms) == "lowest" + EOW     # lossless composition


@pytest.fixture(scope="module")
def duck_word_counts():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    df = con.execute("""
        SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(regexp_extract_all(
                  lower(text), '[\\w]+(''[\\w]+)?')) AS tok
              FROM documents)
        GROUP BY tok
    """).df()
    return dict(zip(df["word"], df["n"].astype(int)))


def test_pipeline_merges_equal_scalar_spec(ray_session, duck_word_counts):
    """The distributed word count + driver merge loop equals train_bpe
    over a DuckDB-computed word table — the oracle-by-construction."""
    got = bpe.q_bpe_merges(SF, n_merges=30)
    want = train_bpe(duck_word_counts, 30)
    assert list(zip(got["left"], got["right"], got["n"])) == want


def test_pipeline_token_counts_equal_scalar(ray_session, duck_word_counts):
    from twine_ray.functions.textnorm import simple_tokens_ascii

    merges = train_bpe(duck_word_counts, 30)
    ranks = {(a, b): i for i, (a, b, _n) in enumerate(merges)}
    got = (
        bpe.q_bpe_token_counts(SF, n_merges=30)
        .to_pandas()
        .set_index("doc_id")["n_bpe_tokens"]
    )
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    for _i, row in docs.head(50).iterrows():
        want = sum(
            len(encode_word(w, ranks))
            for w in simple_tokens_ascii((row["text"] or "").lower())
        )
        assert got[row["doc_id"]] == want


def test_word_count_table_repartition_invariant(ray_session):
    a = bpe.word_count_table(SF).to_pandas()
    a = a.sort_values(["word"]).reset_index(drop=True)
    ds = bpe._docs(SF, ["text"]).repartition(7)
    from twine_ray.functions.textnorm import simple_tokens_ascii
    from twine_ray.stages.grouped import bucketed_group_reduce

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
        return out.head(bpe.WORD_CAP)

    b = bucketed_group_reduce(
        ds.map_batches(_partial, batch_format="pandas"),
        ["word"], _reduce, partial=False,
    ).to_pandas().sort_values(["word"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
