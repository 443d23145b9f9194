"""Near-dup dedup family: distributed verify correctness.

Round-2 rewrites (VERDICT.md 'Next round' #1/#2): the MinHash verify
stage and the n-gram-Jaccard pair stage run fully distributed — these
tests pin them to driver-side brute-force references (the old
algorithm's semantics) and exercise a 50%-duplicate corpus that the
old take_all() path would have materialized wholesale.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from twine_ray.functions.fingerprint import (
    jaccard,
    lsh_band_keys,
    minhash_params,
    minhash_signature,
    word_shingles,
    word_shingles_ascii,
)
from twine_ray.pipelines.dedup import (
    BANDS,
    JACCARD_THRESHOLD,
    NUM_PERM,
    _round4,
    q_dedup_jaccard,
    q_dedup_minhash,
)
from twine_ray.stages.canon import union_find_local


def _brute_minhash_clusters(docs: pd.DataFrame,
                            threshold: float = JACCARD_THRESHOLD):
    """Driver-side spec of the MinHash-LSH pipeline: signatures ->
    band buckets -> candidate pairs -> exact Jaccard -> union-find."""
    a, b = minhash_params(NUM_PERM)
    sh = {int(r.doc_id): word_shingles(r.text or "")
          for r in docs.itertuples()}
    buckets: dict[str, list[int]] = {}
    for did in sorted(sh):
        sig = minhash_signature(sh[did], a, b)
        for key in lsh_band_keys(sig, BANDS):
            buckets.setdefault(key, []).append(did)
    cands = set()
    for ids in buckets.values():
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                cands.add((ids[i], ids[k]))
    verified = [(x, y) for x, y in sorted(cands)
                if jaccard(sh[x], sh[y]) >= threshold]
    roots = union_find_local(
        [(f"{x:012d}", f"{y:012d}") for x, y in verified]
    )
    sizes: dict[str, int] = {}
    for r in roots.values():
        sizes[r] = sizes.get(r, 0) + 1
    return pd.DataFrame(
        {
            "doc_id": [int(m) for m in sorted(roots)],
            "cluster_rep": [int(roots[m]) for m in sorted(roots)],
            "n_cluster": [sizes[roots[m]] for m in sorted(roots)],
        }
    ).reset_index(drop=True)


def _brute_jaccard_pairs(docs: pd.DataFrame, threshold: float = 0.5):
    # ASCII shingles: the oracled pipeline's spec (DuckDB-\w parity)
    out = {"a": [], "b": [], "jaccard": []}
    for _, g in docs.groupby("source"):
        recs = sorted(zip(g["doc_id"].tolist(), g["text"].tolist()))
        sh = {i: word_shingles_ascii(t or "") for i, t in recs}
        ids = [i for i, _ in recs]
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                j = jaccard(sh[ids[x]], sh[ids[y]])
                if j >= threshold:
                    out["a"].append(ids[x])
                    out["b"].append(ids[y])
                    out["jaccard"].append(_round4(j))
    return (
        pd.DataFrame(out)
        .astype({"a": "int64", "b": "int64", "jaccard": "float64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def test_minhash_distributed_equals_driver_spec(ray_session, sf_dir):
    got = (
        q_dedup_minhash(sf_dir).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want = _brute_minhash_clusters(docs)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_jaccard_prefix_filter_equals_brute_force(ray_session, sf_dir):
    got = (
        q_dedup_jaccard(sf_dir)
        .to_pandas()[["a", "b", "jaccard"]]
        .astype({"a": "int64", "b": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).to_pandas()
    want = _brute_jaccard_pairs(docs)
    pd.testing.assert_frame_equal(got, want)


@pytest.fixture(scope="module")
def dup_dense_dir(tmp_path_factory):
    """50%-duplicate corpus: 400 docs in 200 near-identical pairs plus
    clusters of exact copies — the dup-dense shape whose candidate set
    is corpus-scale (the old driver-side verify's failure mode)."""
    root = tmp_path_factory.mktemp("dupdense")
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    rows = {"doc_id": [], "text": [], "source": []}
    did = 0
    for i in range(100):
        base = " ".join(words[(i + k) % 10] for k in range(30)) + f" tag{i}"
        for copy in range(4):  # 4 exact copies -> clusters of 4
            rows["doc_id"].append(did)
            rows["text"].append(base)
            rows["source"].append(f"s{i % 5}")
            did += 1
    pq.write_table(pa.Table.from_pydict(rows), str(root / "documents.parquet"))
    return str(root)


def test_minhash_dup_dense_corpus(ray_session, dup_dense_dir):
    got = (
        q_dedup_minhash(dup_dense_dir).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    # every doc is in a cluster of exactly its 4 exact copies
    assert len(got) == 400
    assert (got["n_cluster"] >= 4).all()
    # exact copies share a representative
    reps = got.set_index("doc_id")["cluster_rep"]
    for base in range(0, 400, 4):
        assert len({reps[base + k] for k in range(4)}) == 1
    docs = pq.read_table(
        f"{dup_dense_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want = _brute_minhash_clusters(docs)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), want.astype("int64")
    )


def test_jaccard_empty_and_short_docs(ray_session, tmp_path):
    """Empty docs pair with J=1.0 (sentinel token path); short docs
    (< k tokens) use the whole-token shingle; cross pairs score 0."""
    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["", "", "one two", "one two", "totally different words"],
        "source": ["s", "s", "s", "s", "s"],
    }
    pq.write_table(pa.Table.from_pydict(rows),
                   str(tmp_path / "documents.parquet"))
    got = (
        q_dedup_jaccard(str(tmp_path))
        .to_pandas()[["a", "b", "jaccard"]]
        .astype({"a": "int64", "b": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = _brute_jaccard_pairs(pd.DataFrame(rows))
    pd.testing.assert_frame_equal(got, want)
    assert {(1, 2), (3, 4)} == set(zip(want["a"], want["b"]))


def test_jaccard_non_ascii_corpus(ray_session, tmp_path):
    """'café' tokenizes as 'caf' on BOTH the pipeline and the brute
    spec (ASCII-\\w, matching DuckDB RE2) — the ADVICE r2 parity
    hazard: a non-ASCII corpus must not diverge from the oracle."""
    t1 = "café straße naïve café straße encore café and more words here"
    t2 = "café straße naïve café straße encore café and more words there"
    rows = {
        "doc_id": [1, 2, 3],
        "text": [t1, t2, "unrelated words entirely different content now"],
        "source": ["s", "s", "s"],
    }
    pq.write_table(pa.Table.from_pydict(rows),
                   str(tmp_path / "documents.parquet"))
    got = (
        q_dedup_jaccard(str(tmp_path))
        .to_pandas()[["a", "b", "jaccard"]]
        .astype({"a": "int64", "b": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = _brute_jaccard_pairs(pd.DataFrame(rows))
    pd.testing.assert_frame_equal(got, want)
    assert set(zip(want["a"], want["b"])) == {(1, 2)}
    # and the ASCII spec really differs from the Unicode tokenizer here
    assert word_shingles_ascii(t1) != word_shingles(t1)


def test_simhash_stage_matches_scalar_spec():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from twine_ray.functions.fingerprint import simhash64
    from twine_ray.pipelines.dedup import _SimHashStage

    stage = _SimHashStage()

    @settings(max_examples=80, deadline=None)
    @given(st.text(max_size=120))
    def check(text):
        assert stage.signature(text) == simhash64(text)

    check()


def test_decontaminate_broadcast_equals_join_fallback(
    ray_session, sf_dir, monkeypatch
):
    """The broadcast membership path and the distributed semi-join
    fallback must produce identical (doc_id, n_shared) sets; the valve
    is forced the same way as DUP_BROADCAST_LIMIT's test."""
    from twine_ray.pipelines import dedup as dd

    a = (
        dd.q_decontaminate(sf_dir).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    monkeypatch.setattr(dd, "DECONTAM_BROADCAST_LIMIT", 0)
    b = (
        dd.q_decontaminate(sf_dir).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert a.to_dict("records") == b.to_dict("records")
    assert (a["n_shared"] > 0).all()


def _passage_spec(texts: dict[int, str], w: int = 4) -> pd.DataFrame:
    """Scalar reference for q_dedup_passage."""
    from collections import Counter

    from twine_ray.functions.fingerprint import passage_windows

    per_doc = {d: passage_windows(t, w) for d, t in texts.items()}
    counts = Counter(p for ps in per_doc.values() for p in ps)
    rows = [
        {
            "doc_id": d,
            "n_passages": len(ps),
            "dup_passages": sum(1 for p in ps if counts[p] > 1),
        }
        for d, ps in per_doc.items()
        if ps
    ]
    return (
        pd.DataFrame(rows)
        .astype("int64")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_passage_dedup_matches_spec(ray_session, sf_dir):
    from twine_ray.pipelines.dedup import q_dedup_passage

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    got = (
        q_dedup_passage(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _passage_spec(texts))
    assert got["dup_passages"].sum() > 0, "corpus should have dups"


def test_passage_dedup_planted(ray_session, tmp_path):
    """A passage repeated across docs (and twice inside one doc) is
    flagged in every occurrence; unique passages are not."""
    shared = "alpha beta gamma delta"
    rows = {
        "doc_id": [1, 2, 3],
        "text": [
            f"{shared} unique one two three",
            f"{shared} other words go here",
            f"{shared} {shared} completely fresh tail words",
        ],
    }
    pq.write_table(pa.Table.from_pydict(rows),
                   str(tmp_path / "documents.parquet"))
    from twine_ray.pipelines.dedup import q_dedup_passage

    got = (
        q_dedup_passage(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _passage_spec(dict(zip(rows["doc_id"], rows["text"])))
    pd.testing.assert_frame_equal(got, want)
    assert got.set_index("doc_id")["dup_passages"].to_dict() == {
        1: 1, 2: 1, 3: 2,
    }
