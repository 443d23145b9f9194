"""bucketed_group_reduce hash determinism + text-pipeline behaviors."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from twine_ray.stages.grouped import BUCKET_COL, add_key_bucket


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(max_size=8), st.integers(0, 5)),
        min_size=1, max_size=30,
    )
)
def test_key_bucket_deterministic_and_row_order_free(rows):
    df = pd.DataFrame(rows, columns=["k", "v"])
    b1 = add_key_bucket(df, ["k", "v"], 16)
    b2 = add_key_bucket(df.iloc[::-1].reset_index(drop=True), ["k", "v"], 16)
    m1 = dict(zip(zip(b1["k"], b1["v"]), b1[BUCKET_COL]))
    m2 = dict(zip(zip(b2["k"], b2["v"]), b2[BUCKET_COL]))
    assert m1 == m2
    assert ((b1[BUCKET_COL] >= 0) & (b1[BUCKET_COL] < 16)).all()


def test_same_key_same_bucket_across_frames():
    a = add_key_bucket(pd.DataFrame({"k": ["x", "y"]}), ["k"], 32)
    b = add_key_bucket(pd.DataFrame({"k": ["y", "x", "z"]}), ["k"], 32)
    ma = dict(zip(a["k"], a[BUCKET_COL]))
    mb = dict(zip(b["k"], b[BUCKET_COL]))
    assert ma["x"] == mb["x"] and ma["y"] == mb["y"]


def test_doc_quality_matches_scalar_functions(ray_session):
    import pyarrow.parquet as pq

    from twine_ray.functions.quality import quality_features, quality_score
    from twine_ray.pipelines.text import q_doc_quality

    sf = "/root/testdata/sf0.001"
    out = q_doc_quality(sf).to_pandas().set_index("doc_id")
    texts = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    for doc_id, text in list(zip(texts["doc_id"], texts["text"]))[:25]:
        feats = quality_features(text or "")
        assert out.loc[doc_id, "n_chars"] == round(feats["n_chars"], 4)
        assert out.loc[doc_id, "quality"] == round(
            quality_score(feats), 4
        )


def test_doc_langid_runs_on_documents(ray_session):
    """Structural check only: the driver's documents.lang labels are
    random (unrelated to the English word-salad text), so agreement
    with them is meaningless — accuracy is asserted on the synthetic
    pages corpus below, where content language is real."""
    from twine_ray.pipelines.text import q_doc_langid

    df = q_doc_langid("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert set(df.columns) == {"doc_id", "lang_stored", "lang_detected"}


def test_langid_accuracy_on_synth_pages(ray_session):
    """German vs English filler sentences in the synthetic corpus are
    real language content — detection must track the page lang."""
    import ray.data as rd

    from twine_ray.functions.langid import detect_lang
    from twine_ray.sources.pages import pages_table
    from twine_ray.sources.world import synth_pages
    from twine_ray.stages.extract import extract_text

    rows, _ = synth_pages(60, seed=42, n_entities=24)
    ext = extract_text(rd.from_arrow(pages_table(rows))).to_pandas()
    # German pages are mostly German filler; entity sentences are
    # English — only assert the clear cases
    de = ext[ext["lang"] == "de"]
    got = de["text"].map(detect_lang)
    assert (got.isin(["de", "en"])).all()
    en = ext[ext["lang"] == "en"]
    got_en = en["text"].map(detect_lang)
    assert (got_en == "en").mean() >= 0.9


def test_doc_fingerprints_deterministic(ray_session):
    from twine_ray.pipelines.text import q_doc_fingerprints

    a = q_doc_fingerprints("/root/testdata/sf0.001").to_pandas()
    b = q_doc_fingerprints("/root/testdata/sf0.001").to_pandas()
    key = a.sort_values("doc_id").reset_index(drop=True)
    assert key.equals(b.sort_values("doc_id").reset_index(drop=True))


def test_sample_stratified_exact_and_partition_free(ray_session):
    """Per-stratum sample size is min(k, |stratum|); the chosen ids are
    identical under different block layouts and row orders (the hash is
    the draw, not the partitioning)."""
    import ray.data as rd

    from twine_ray.pipelines.text import sample_stratified

    df = pd.DataFrame({
        "doc_id": range(100),
        "source": ["a"] * 50 + ["b"] * 47 + ["c"] * 3,
    })

    def run(frame, blocks):
        out = sample_stratified(
            rd.from_pandas(frame).repartition(blocks), ["source"], 5
        ).to_pandas()
        return out.sort_values(["source", "doc_id"]).reset_index(drop=True)

    one = run(df, 1)
    many = run(df.iloc[::-1].reset_index(drop=True), 7)
    pd.testing.assert_frame_equal(one, many)
    sizes = one.groupby("source").size()
    assert sizes["a"] == 5 and sizes["b"] == 5 and sizes["c"] == 3


def test_langid_counts_match_scalar_spec(ray_session):
    """q_doc_langid_counts (vectorized regex counts) equals the frozen
    scalar spec functions/langid.langid_feature_counts per (doc, lang),
    including edge shapes (empty text, punctuation-only, >4000 chars)."""
    import pyarrow.parquet as pq

    from twine_ray.functions.langid import langid_feature_counts
    from twine_ray.pipelines.text import q_doc_langid_counts

    SF = "/root/testdata/sf0.001"
    got = (
        q_doc_langid_counts(SF)
        .to_pandas()
        .set_index(["doc_id", "lang"])
        .sort_index()
    )
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    for doc_id, text in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
        for lang, (sw, tri) in langid_feature_counts(text or "").items():
            row = got.loc[(doc_id, lang)]
            assert int(row["sw_hits"]) == sw, (doc_id, lang)
            assert int(row["tri_hits"]) == tri, (doc_id, lang)


def test_langid_counts_non_ascii_stopwords(ray_session, tmp_path):
    """Non-ASCII stopwords ('für', 'não') are NOT in the vectorized
    alternation: the frozen spec tokenizes with ASCII [a-z]+ (which
    splits 'für' into 'f'/'r'), so counting them would diverge from the
    spec and its generated DuckDB oracle on real German/Portuguese text
    (ADVICE r4 medium). Also pins the boundary case where a non-ASCII
    letter delimits an ASCII stopword ('füder' → tokens 'f','der')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from twine_ray.functions.langid import langid_feature_counts
    from twine_ray.pipelines.text import q_doc_langid_counts

    texts = [
        "für die Leser ist das nicht genug für heute",
        "não por mais que o tempo passe não esqueço",
        "das füder der und füder",
        "",
    ]
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))),
            "text": texts,
        }),
        str(tmp_path / "documents.parquet"),
    )
    got = (
        q_doc_langid_counts(str(tmp_path))
        .to_pandas()
        .set_index(["doc_id", "lang"])
        .sort_index()
    )
    for doc_id, text in enumerate(texts):
        for lang, (sw, tri) in langid_feature_counts(text).items():
            row = got.loc[(doc_id, lang)]
            assert int(row["sw_hits"]) == sw, (doc_id, lang, text)
            assert int(row["tri_hits"]) == tri, (doc_id, lang, text)


def test_langid_feature_counts_edges():
    from twine_ray.functions.langid import langid_feature_counts

    assert all(v == (0, 0)
               for v in langid_feature_counts("").values())
    # 'the' as token and inside a longer token: sw counts tokens only,
    # tri counts every occurrence
    c = langid_feature_counts("the theory of the")
    assert c["en"][0] == 3  # 'the' x2 + 'of'
    assert c["en"][1] >= 3  # trigram 'the' occurs 3x ('the', 'theory')


def test_langid_best_matches_scalar_recompute(ray_session, sf_dir):
    """q_doc_langid_best == per-row recompute from the frozen scalar
    spec (langid_feature_counts) + the same integer threshold — pins
    the vectorized argmax/tie-break/threshold to the spec."""
    import re

    from twine_ray.functions.langid import langid_feature_counts
    from twine_ray.pipelines.text import q_doc_langid_best

    got = (
        q_doc_langid_best(sf_dir)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    for _, row in docs.head(100).iterrows():
        text = row["text"] or ""
        sample = text[:4000].lower()
        n_tokens = len(re.findall(r"[a-z]+", sample))
        counts = langid_feature_counts(text)
        scores = {
            lang: 6 * sw + tri for lang, (sw, tri) in counts.items()
        }
        best = min(
            scores, key=lambda k: (-scores[k], k)
        )
        win = n_tokens > 0 and 10 * scores[best] >= 3 * n_tokens
        g = got.loc[row["doc_id"]]
        assert int(g["n_tokens"]) == n_tokens, row["doc_id"]
        assert int(g["score2"]) == scores[best], row["doc_id"]
        assert g["lang"] == (best if win else ""), row["doc_id"]
