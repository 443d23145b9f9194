"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline extras (task brief): language-ID, quality
scoring, token counting, fingerprinting.  Each is a vectorized or
actor-pool ``map_batches`` stage; SQL-expressible ones carry DuckDB
oracles in ``__ray_entry__``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from twine_ray.functions.fingerprint import rolling_fingerprint, simhash64
from twine_ray.functions.langid import detect_lang
from twine_ray.functions.quality import quality_features, quality_score
from twine_ray.functions.textnorm import simple_tokens


from twine_ray.state.broadcast import pool
ROUND = 4


def _docs(sf_dir: str, columns):
    from twine_ray.sources.readers import sized_read_parquet

    return sized_read_parquet(f"{sf_dir}/documents.parquet",
                              columns=columns)


def q_doc_lang_counts(sf_dir: str):
    """Documents per stored language tag (groupby count with partial)."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["lang"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(n=1)
        return df.groupby("lang", as_index=False).agg(n_docs=("n", "sum"))

    final = (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    def _fix(df: pd.DataFrame) -> pd.DataFrame:
        df["n_docs"] = df["n_docs"].astype("int64")
        return df

    return final.map_batches(_fix, batch_format="pandas")


def q_doc_nchars(sf_dir: str):
    """Recompute n_chars = len(text) per doc (vectorized Arrow kernel)."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _f(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "n_chars_calc": pc.cast(
                    pc.utf8_length(t["text"]), pa.int64()
                ),
            }
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def q_doc_token_counts(sf_dir: str):
    """Token count per doc with the ASCII-\\w tokenizer — matches the
    DuckDB/RE2 oracle regex byte-for-byte regardless of corpus content
    (Python's Unicode \\w would diverge on e.g. 'naïve')."""
    from twine_ray.functions.textnorm import simple_tokens_ascii

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": df["text"].map(
                    lambda t: len(simple_tokens_ascii(t or ""))
                ).astype("int64"),
            }
        )

    return ds.map_batches(_f, batch_format="pandas")


class _LangIdStage:
    """Actor-pool language-ID: profiles built once per actor."""

    def __init__(self) -> None:
        # force profile-table build/caching at init (module import cost)
        detect_lang("warm up the profiles once per actor process")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "lang_stored": df["lang"],
                "lang_detected": df["text"].map(
                    lambda t: detect_lang(t or "")
                ),
            }
        )


def q_doc_langid(sf_dir: str):
    """Detected vs stored language per doc (heuristic; rows-only check)."""
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    return ds.map_batches(
        _LangIdStage, batch_format="pandas", batch_size=512,
        concurrency=pool(8),
    )


def q_doc_langid_counts(sf_dir: str):
    """INTEGER langid feature counts per (doc, language) — the
    SQL-oracled twin of ``q_doc_langid`` (whose final language pick is
    a heuristic): per language, the count of tokens in its distinctive
    stopword set and the non-overlapping occurrence count of its
    characteristic trigrams, over ``lower(text[:4000])`` with ASCII
    ``[a-z]+`` tokens (functions/langid.langid_feature_counts is the
    frozen scalar spec; tests pin this vectorized version to it).

    Vectorization: one alternation regex per language for the stopword
    hits (lookarounds pin full-token matches, so the count equals
    token-set membership) and one compiled substring count per trigram
    — all pandas C kernels, no per-row Python.

    The alternation is built ONLY from stopwords fully matched by
    ``[a-z]+``: the frozen spec tokenizes with that ASCII class, so a
    non-ASCII stopword ('für', 'não') can never be a spec hit — leaving
    it in the alternation would over-count vs the spec and the
    generated DuckDB oracle on real German/Portuguese text."""
    import re as _re

    from twine_ray.functions.langid import _STOPWORDS, _TRIGRAMS

    ds = _docs(sf_dir, ["doc_id", "text"])
    langs = sorted(_STOPWORDS)
    sw_pats = {
        lang: r"(?<![a-z])(?:" + "|".join(
            sorted(w for w in _STOPWORDS[lang]
                   if _re.fullmatch(r"[a-z]+", w))
        ) + r")(?![a-z])"
        for lang in langs
    }

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        sample = df["text"].fillna("").str.slice(0, 4000).str.lower()
        parts = []
        for lang in langs:
            tri = None
            for t in _TRIGRAMS[lang]:
                c = sample.str.count(_re.escape(t))
                tri = c if tri is None else tri + c
            parts.append(pd.DataFrame({
                "doc_id": df["doc_id"],
                "lang": lang,
                "sw_hits": sample.str.count(sw_pats[lang])
                .astype("int64"),
                "tri_hits": tri.astype("int64"),
            }))
        return pd.concat(parts, ignore_index=True)

    return ds.map_batches(_f, batch_format="pandas")


def q_doc_langid_best(sf_dir: str):
    """Per-doc BEST language by the INTEGER score twin of the langid
    heuristic — closes the oracle gap on the score ARITHMETIC
    (doc_langid_counts already oracles the feature counts; VERDICT r4
    'Next' #8): over the same ASCII spec (lower(text[:4000]),
    ``[a-z]+`` tokens), per language score2 = 6*sw_hits + tri_hits
    (the heuristic's 3 / 0.5 weights scaled by 2 to stay integral),
    winner = max score2 with lexicographic tie-break, kept only when
    10*score2 >= 3*n_tokens AND n_tokens > 0 (the 0.15 threshold in
    exact integer cross-multiplication) else ''.  All-integer columns
    -> the DuckDB oracle (generated from the SAME constant tables)
    hash-matches exactly."""
    import re as _re

    from twine_ray.functions.langid import _STOPWORDS, _TRIGRAMS

    ds = _docs(sf_dir, ["doc_id", "text"])
    langs = sorted(_STOPWORDS)
    sw_pats = {
        lang: r"(?<![a-z])(?:" + "|".join(
            sorted(w for w in _STOPWORDS[lang]
                   if _re.fullmatch(r"[a-z]+", w))
        ) + r")(?![a-z])"
        for lang in langs
    }

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        sample = df["text"].fillna("").str.slice(0, 4000).str.lower()
        n_tokens = sample.str.count(r"[a-z]+").astype("int64")
        scores = {}
        for lang in langs:
            tri = None
            for t in _TRIGRAMS[lang]:
                c = sample.str.count(_re.escape(t))
                tri = c if tri is None else tri + c
            sw = sample.str.count(sw_pats[lang])
            scores[lang] = (6 * sw + tri).astype("int64")
        smat = pd.DataFrame(scores)
        best = smat.idxmax(axis=1)  # first max -> lang-asc tie-break
        best_score = smat.max(axis=1).astype("int64")
        win = (10 * best_score >= 3 * n_tokens) & (n_tokens > 0)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "lang": best.where(win.to_numpy(), "").astype(object),
            "score2": best_score,
            "n_tokens": n_tokens,
        })

    return ds.map_batches(_f, batch_format="pandas")


def q_doc_quality(sf_dir: str):
    """Quality features + scalar score per doc (rows-only check)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        feats = [quality_features(t or "") for t in df["text"]]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", df["doc_id"].values)
        out["quality"] = [quality_score(f) for f in feats]
        for c in out.columns:
            if out[c].dtype == float:
                out[c] = out[c].round(ROUND)
        return out

    return ds.map_batches(_f, batch_format="pandas")


def q_doc_quality_counts(sf_dir: str):
    """INTEGER quality-feature counts per doc — the SQL-oracled twin of
    ``q_doc_quality`` (whose float ratios are parity-hazardous):
    n_chars, ASCII token count, alpha count, punct count, stopword
    count, longest-line length.  Both sides use ASCII classes (the
    punct class written as the range form ``[!-/:-@[-`{{-~]`` so the
    regex is byte-identical under RE2 and Python)."""
    from twine_ray.functions.quality import _STOP_EN
    from twine_ray.functions.textnorm import simple_tokens_ascii

    ds = _docs(sf_dir, ["doc_id", "text"])
    punct_pat = r"[!-/:-@\[-`{-~]"
    alpha_pat = r"[A-Za-z]"

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        toks = texts.map(simple_tokens_ascii)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": texts.str.len().astype("int64"),
                "n_tokens": toks.map(len).astype("int64"),
                "n_alpha": texts.str.count(alpha_pat).astype("int64"),
                "n_punct": texts.str.count(punct_pat).astype("int64"),
                "n_stopwords": toks.map(
                    lambda ts: sum(1 for t in ts if t.lower() in _STOP_EN)
                ).astype("int64"),
                "max_line_len": texts.map(
                    lambda t: max(len(ln) for ln in t.split("\n"))
                ).astype("int64"),
            }
        )

    return ds.map_batches(_f, batch_format="pandas")


def q_top_tokens(sf_dir: str, k: int = 50):
    """Corpus-wide token frequency top-k (the classic wordcount, done
    scale-shaped): per-batch vectorized value_counts — only (token, n)
    partials leave the map stage — one vocabulary-scale groupby sum,
    then sort+limit (never a driver-side vocabulary collect).
    Deterministic ties: n desc, token asc."""
    from ray.data.aggregate import Sum

    from twine_ray.functions.textnorm import simple_tokens_ascii

    ds = _docs(sf_dir, ["text"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = [
            t
            for text in df["text"]
            for t in simple_tokens_ascii((text or "").lower())
        ]
        vc = pd.Series(toks, dtype=object).value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype(str), "n": vc.to_numpy("int64")}
        )

    counts = (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    def _fix(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype("int64")
        return df

    return (
        counts.map_batches(_fix, batch_format="pandas")
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


def q_quality_filter(sf_dir: str):
    """C4/Gopher-style document filter in PURE INTEGER arithmetic so
    DuckDB can hash-check the surviving set exactly (float ratios
    would be parity-hazardous): keep docs with >= 15 ASCII tokens,
    punctuation <= 1/4 of chars (4*n_punct <= n_chars) and alphabetic
    >= 3/10 of chars (10*n_alpha >= 3*n_chars)."""
    import pyarrow.compute as pc

    ds = q_doc_quality_counts(sf_dir)

    def _f(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t["n_tokens"], 15),
                pc.less_equal(pc.multiply(t["n_punct"], 4), t["n_chars"]),
            ),
            pc.greater_equal(
                pc.multiply(t["n_alpha"], 10),
                pc.multiply(t["n_chars"], 3),
            ),
        )
        return t.filter(keep).select(["doc_id", "n_tokens", "n_chars"])

    return ds.map_batches(_f, batch_format="pyarrow")


def q_doc_split(sf_dir: str):
    """Deterministic content-hash train/val/test split — the held-out
    split assignment a training-data pipeline needs: md5 of the doc id
    (not row order!) buckets each doc 80/10/10, so the split is stable
    under any partitioning, re-run, or corpus growth.  First md5 byte:
    0x00-0xCB train, 0xCC-0xE5 val, 0xE6-0xFF test."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id"])

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        def split_of(i) -> str:
            b = hashlib.md5(str(int(i)).encode()).digest()[0]
            return "train" if b < 0xCC else ("val" if b < 0xE6 else "test")

        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "split": df["doc_id"].map(split_of),
            }
        )

    return ds.map_batches(_f, batch_format="pandas")


def sample_stratified(ds, strata_cols: list[str], k: int,
                      id_col: str = "doc_id"):
    """Deterministic stratified sample: the ``k`` rows with the
    SMALLEST md5 digest of their id per stratum.  The hash plays the
    role of a seeded uniform draw, so the sample is exact-size per
    stratum and independent of row order, partitioning and corpus
    growth outside the stratum — the held-out-subset primitive a
    training-data pipeline needs next to ``q_doc_split``'s rate split.

    Scale shape: per-batch partial top-k (associative) combines before
    the ONE bucketed exchange on the stratum key, so only ~k rows per
    stratum per block shuffle."""
    import hashlib

    from twine_ray.stages.grouped import bucketed_group_reduce

    def _hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = df[id_col].map(
            lambda i: hashlib.md5(str(int(i)).encode()).hexdigest()
        )
        return df

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            strata_cols + ["_h", id_col], kind="mergesort"
        )
        return df.groupby(strata_cols, sort=False, dropna=False).head(k)

    out = bucketed_group_reduce(
        ds.map_batches(_hash, batch_format="pandas"),
        strata_cols, _reduce,
    )
    return out.map_batches(
        lambda df: df.drop(columns=["_h"]), batch_format="pandas"
    )


def q_sample_stratified(sf_dir: str):
    """20 docs per source stratum, chosen by smallest md5(doc_id) —
    SQL-oracled (row_number over PARTITION BY source ORDER BY md5)."""
    ds = _docs(sf_dir, ["doc_id", "source"])

    def _norm(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "source": df["source"].fillna(""),
        })

    return sample_stratified(
        ds.map_batches(_norm, batch_format="pandas"), ["source"], 20
    )


def q_doc_fingerprints(sf_dir: str):
    """SimHash + winnowing fingerprint count per doc (rows-only)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": texts.map(
                    lambda t: format(simhash64(t), "016x")
                ),
                "n_fingerprints": texts.map(
                    lambda t: len(rolling_fingerprint(t))
                ).astype("int64"),
            }
        )

    return ds.map_batches(_f, batch_format="pandas")


def q_doc_avg_len_by_source(sf_dir: str):
    """Mean text length per source (partial sums -> exact mean)."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["source", "text"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(length=df["text"].str.len(), n=1)
        return df.groupby("source", as_index=False).agg(
            sum_len=("length", "sum"), n_docs=("n", "sum")
        )

    final = (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("sum_len", alias_name="sum_len"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        # integer sums -> one float division, same op on the SQL side
        return pd.DataFrame(
            {
                "source": df["source"],
                "n_docs": df["n_docs"].astype("int64"),
                "avg_len": df["sum_len"].astype("float64") / df["n_docs"],
            }
        )

    return final.map_batches(_finish, batch_format="pandas")


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition features, INTEGER-only so DuckDB can
    hash-check them exactly (the float "fraction of duplicate tokens"
    is derived trivially downstream): per doc the ASCII token count,
    distinct-token count and the count of the single most frequent
    token.  Gopher's repetition filters (Rae et al. 2021 §A1.1) drop
    docs whose duplicate fraction or top-token share exceeds a bound —
    both are pure functions of these three integers.  One vectorized
    map_batches; per-doc Counter kernels (inherently per-string, like
    doc_quality_counts)."""
    from collections import Counter

    from twine_ray.functions.textnorm import simple_tokens_ascii

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        def stats(text):
            toks = simple_tokens_ascii((text or "").lower())
            if not toks:
                return (0, 0, 0)
            vc = Counter(toks)
            return (len(toks), len(vc), max(vc.values()))

        trip = df["text"].map(stats)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": trip.map(lambda t: t[0]).astype("int64"),
                "n_distinct": trip.map(lambda t: t[1]).astype("int64"),
                "max_tok_n": trip.map(lambda t: t[2]).astype("int64"),
            }
        )

    return ds.map_batches(_f, batch_format="pandas")


def q_repetition_filter(sf_dir: str):
    """The filter built on q_doc_repetition, integer arithmetic only:
    keep docs where the most frequent token is <= 1/5 of all tokens
    (5*max_tok_n <= n_tokens) and distinct tokens are >= 1/3 of all
    tokens (3*n_distinct >= n_tokens) — the Gopher top-token-share and
    duplicate-fraction rules with exact rational thresholds."""
    import pyarrow.compute as pc

    ds = q_doc_repetition(sf_dir)

    def _f(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.less_equal(
                    pc.multiply(t["max_tok_n"], 5), t["n_tokens"]
                ),
                pc.greater_equal(
                    pc.multiply(t["n_distinct"], 3), t["n_tokens"]
                ),
            ),
            # empty docs are dropped (and are absent from the SQL
            # oracle's token aggregation by construction)
            pc.greater(t["n_tokens"], 0),
        )
        return t.filter(keep)

    return ds.map_batches(_f, batch_format="pyarrow")


def q_top_bigrams(sf_dir: str, k: int = 50):
    """Corpus-wide bigram frequency top-k — same scale shape as
    q_top_tokens: per-batch Counter partials so only (bigram, n) rows
    leave the map stage, one vocabulary-scale groupby sum, then
    sort+limit with a total ordering (n desc, bigram asc) for
    deterministic ties."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from twine_ray.functions.textnorm import simple_tokens_ascii

    ds = _docs(sf_dir, ["text"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for text in df["text"]:
            toks = simple_tokens_ascii((text or "").lower())
            cnt.update(map(" ".join, zip(toks, toks[1:])))
        return pd.DataFrame(
            {
                "bigram": list(cnt.keys()),
                "n": pd.Series(list(cnt.values()), dtype="int64"),
            }
        )

    counts = (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def _fix(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype("int64")
        return df

    return (
        counts.map_batches(_fix, batch_format="pandas")
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k)
    )


def q_doc_frequency(sf_dir: str, k: int = 50):
    """Document frequency top-k — the inverted-index / IDF building
    block: for each token, the number of DISTINCT documents containing
    it.  Per-batch: per-doc token SETS (a doc's text lives wholly in
    one batch, so per-batch distinct-doc counts are exact partials) ->
    (token, n_docs) rows; one vocabulary-scale groupby sum; sort+limit.
    Deterministic ties: n_docs desc, token asc."""
    from ray.data.aggregate import Sum

    from twine_ray.functions.textnorm import simple_tokens_ascii

    ds = _docs(sf_dir, ["text"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for text in df["text"]:
            toks.extend(set(simple_tokens_ascii((text or "").lower())))
        vc = pd.Series(toks, dtype=object).value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype(str), "n_docs": vc.to_numpy("int64")}
        )

    counts = (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    def _fix(df: pd.DataFrame) -> pd.DataFrame:
        df["n_docs"] = df["n_docs"].astype("int64")
        return df

    return (
        counts.map_batches(_fix, batch_format="pandas")
        .sort(["n_docs", "token"], descending=[True, False])
        .limit(k)
    )


def q_keyword_search(sf_dir: str, terms=("data", "join"), k: int = 20):
    """Boolean-AND retrieval ranked by total term frequency: documents
    containing ALL query terms, ranked n_hits desc / doc_id asc, top-k
    — the inverted-index query shape run as one streaming scan (the
    index build itself is q_doc_frequency).  Integer counts, ASCII
    tokenizer: bit-parity with the DuckDB FILTER-count oracle."""
    from collections import Counter

    import numpy as np

    from twine_ray.functions.textnorm import simple_tokens_ascii

    ds = _docs(sf_dir, ["doc_id", "text"])
    term_list = list(terms)

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros((len(df), len(term_list)), dtype="int64")
        for i, text in enumerate(df["text"]):
            c = Counter(simple_tokens_ascii((text or "").lower()))
            for j, t in enumerate(term_list):
                counts[i, j] = c.get(t, 0)
        mask = (counts > 0).all(axis=1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[mask],
                "n_hits": counts.sum(axis=1)[mask],
            }
        )

    return (
        ds.map_batches(_f, batch_format="pandas")
        .sort(["n_hits", "doc_id"], descending=[True, False])
        .limit(k)
    )


def q_tfidf_top(sf_dir: str, k: int = 50):
    """Integer-scaled TF-IDF ranking: score = tf * N // df per
    (doc, token) — the log-free fixed-point variant (log-based idf is
    a float-parity hazard; monotone in the same direction for fixed
    tf).  ONE token-keyed exchange computes df AND the scores: each
    (doc, token) pair exists exactly once globally (a doc's text lives
    wholly in one batch), so within a complete token group df is just
    the group size — no separate df join or vocabulary broadcast.
    Deterministic top-k: score desc, doc_id asc, token asc."""
    import numpy as np

    from twine_ray.functions.textnorm import simple_tokens_ascii
    from twine_ray.stages.grouped import bucketed_group_reduce

    ds = _docs(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()

    def _tf(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, toks, tfs = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            vc = pd.Series(
                simple_tokens_ascii((text or "").lower()), dtype=object
            ).value_counts()
            doc_ids.extend([doc_id] * len(vc))
            toks.extend(vc.index)
            tfs.extend(vc.to_numpy("int64"))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "token": pd.Series(toks, dtype=object).astype(str),
                "tf": pd.Series(tfs, dtype="int64"),
            }
        )

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        # complete token groups: df(token) = group size
        dfreq = df.groupby("token", sort=False)["doc_id"] \
            .transform("size").to_numpy("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy("int64"),
                "token": df["token"],
                "score": (df["tf"].to_numpy("int64") * np.int64(n_docs)
                          // dfreq),
            }
        )

    scored = bucketed_group_reduce(
        ds.map_batches(_tf, batch_format="pandas"),
        ["token"], _score, partial=False,
    )
    return scored.sort(["score", "doc_id", "token"],
                       descending=[True, False, False]).limit(k)


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data hygiene pass)
# ---------------------------------------------------------------------------

# ASCII-only patterns chosen for bit-parity between Python re and
# DuckDB's RE2: plain character classes, \d and \b behave identically
# on ASCII input.  Kept in sync with the literals in
# __ray_entry__.oracle_sql()["pii_redact"].
PII_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def q_pii_redact(sf_dir: str):
    """PII scrub: count and redact emails then IPv4 literals per
    document.  The corpus is synthetic word soup with no PII, so both
    sides first inject deterministic PII derived from doc_id (emails
    into every 3rd doc, IPs into every 2nd) — the redaction kernel
    then runs on identical inputs and the cleaned TEXT itself is
    hash-checked, not just the counts.  Redaction order (emails
    before IPs) is part of the spec: IP counting sees the
    email-redacted string on both sides.  Vectorized pandas str
    kernels; compiled patterns shipped once via the closure."""
    import numpy as np

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _scrub(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        email = np.where(
            ids % 3 == 0,
            " contact user" + ids.astype(str) + "@example.com",
            "",
        )
        ip = np.where(
            ids % 2 == 0,
            " from 10." + (ids % 223).astype(str) + ".0."
            + (ids % 251).astype(str),
            "",
        )
        aug = df["text"].astype(str) + email + ip
        n_emails = aug.str.count(PII_EMAIL_PAT).astype("int64")
        t1 = aug.str.replace(PII_EMAIL_PAT, "<EMAIL>", regex=True)
        n_ips = t1.str.count(PII_IP_PAT).astype("int64")
        clean = t1.str.replace(PII_IP_PAT, "<IP>", regex=True)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_emails": n_emails,
                "n_ips": n_ips,
                "clean_text": clean,
            }
        )

    return ds.map_batches(_scrub, batch_format="pandas")


# ---------------------------------------------------------------------------
# RAG-style chunking + training-shard export assignment
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 50
CHUNK_STRIDE = 40
N_TRAIN_SHARDS = 8


def q_doc_chunks(sf_dir: str, window: int = CHUNK_TOKENS,
                 stride: int = CHUNK_STRIDE):
    """Fixed-size token chunking with overlap — the retrieval /
    context-window prep primitive of a training-data pipeline: each
    document becomes ceil(n_tokens/stride) windows of up to ``window``
    tokens starting every ``stride`` tokens.  Tokens are the ASCII-\\w
    tokenizer (DuckDB/RE2 parity, like doc_token_counts), and the
    chunk TEXT itself is oracle-checked: DuckDB rebuilds each window
    with regexp_extract_all + list_slice + array_to_string.  flat_map
    shape (1 doc -> k chunk rows); embarrassingly parallel, zero
    shuffle."""
    from twine_ray.functions.textnorm import simple_tokens_ascii

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        ids, cid, cst, ntk, txt = [], [], [], [], []
        for i, t in zip(df["doc_id"], df["text"]):
            toks = simple_tokens_ascii(t or "")
            for j, start in enumerate(range(0, len(toks), stride)):
                piece = toks[start:start + window]
                ids.append(int(i))
                cid.append(j)
                cst.append(start)
                ntk.append(len(piece))
                txt.append(" ".join(piece))
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "chunk_id": pd.Series(cid, dtype="int64"),
            "chunk_start": pd.Series(cst, dtype="int64"),
            "n_chunk_tokens": pd.Series(ntk, dtype="int64"),
            "chunk_text": pd.Series(txt, dtype=object),
        })

    return ds.map_batches(_f, batch_format="pandas")


def train_shards(ds, id_col: str = "doc_id",
                 n_shards: int = N_TRAIN_SHARDS):
    """Deterministic training-shard export assignment: each row gets a
    shard (first md5 hex nibble of its id, mod n_shards) and a dense
    0-based position within the shard ordered by (md5 hex, id) — the
    content-hash global shuffle a training exporter needs (stable
    under partitioning, re-runs and corpus growth within a shard).

    Scale shape: ONE bucketed exchange keyed on shard moves only
    (id, 32-byte hex) rows — never payloads; the position assignment
    needs the COMPLETE shard per reducer (partial=False), which is the
    inherent cost of a dense per-shard ordering."""
    import hashlib

    from twine_ray.stages.grouped import bucketed_group_reduce

    def _hash(df: pd.DataFrame) -> pd.DataFrame:
        h = df[id_col].map(
            lambda i: hashlib.md5(str(int(i)).encode()).hexdigest()
        )
        return pd.DataFrame({
            id_col: df[id_col].astype("int64"),
            "shard": h.map(
                lambda x: int(x[0], 16) % n_shards
            ).astype("int64"),
            "_h": h,
        })

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["shard", "_h", id_col], kind="mergesort")
        return df.assign(
            pos=df.groupby("shard", sort=False).cumcount().astype("int64")
        )

    out = bucketed_group_reduce(
        ds.map_batches(_hash, batch_format="pandas"),
        ["shard"], _reduce, num_buckets=n_shards, partial=False,
    )
    return out.map_batches(
        lambda df: df.drop(columns=["_h"]), batch_format="pandas"
    )


def q_train_shards(sf_dir: str):
    """Shard + in-shard position for every document (SQL-oracled:
    row_number over PARTITION BY shard ORDER BY md5 hex)."""
    return train_shards(_docs(sf_dir, ["doc_id"]))


PACK_BUDGET = 2048


def q_train_packing(sf_dir: str, budget: int = PACK_BUDGET):
    """Sequence-packing assignment: within each export shard (same
    order as ``train_shards``: md5 hex, then id), documents fill
    contiguous token-budget bins — bin = floor(exclusive-cumsum /
    budget) over ASCII-\\w token counts.  Contiguous packing with
    straddling allowed (a doc may open the next bin), the deterministic
    batch-packing primitive next to train_shards; SQL-oracled via a
    window cumsum.

    Scale shape: token counts stream per batch; the ONE shard-keyed
    exchange moves (id, hash, n_tokens) rows and each reducer owns a
    complete shard (the dense-ordering cost train_shards already
    pays)."""
    import hashlib

    from twine_ray.functions.textnorm import simple_tokens_ascii
    from twine_ray.stages.grouped import bucketed_group_reduce

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(
            lambda i: hashlib.md5(str(int(i)).encode()).hexdigest()
        )
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "shard": h.map(
                lambda x: int(x[0], 16) % N_TRAIN_SHARDS
            ).astype("int64"),
            "_h": h,
            "n_tokens": df["text"].map(
                lambda t: len(simple_tokens_ascii(t or ""))
            ).astype("int64"),
        })

    def _pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["shard", "_h", "doc_id"], kind="mergesort")
        csum = df.groupby("shard", sort=False)["n_tokens"].cumsum()
        excl = (csum - df["n_tokens"]).astype("int64")
        return df.assign(
            pos=df.groupby("shard", sort=False)
                  .cumcount().astype("int64"),
            bin=(excl // budget).astype("int64"),
        )

    out = bucketed_group_reduce(
        ds.map_batches(_prep, batch_format="pandas"),
        ["shard"], _pack, num_buckets=N_TRAIN_SHARDS, partial=False,
    )
    return out.map_batches(
        lambda df: df.drop(columns=["_h"]), batch_format="pandas"
    )


def q_curate_corpus(sf_dir: str):
    """The composed curation flagship a training-data pipeline runs
    end-to-end: quality filter (C4-style integer thresholds) AND
    repetition filter (Gopher rules) AND exact dedup (min doc_id per
    distinct text among the KEPT docs) AND train/val/test split — all
    SQL-oracled because each piece is integer/hash-exact.

    Scale shape: ONE fused pass computes every feature + the content
    hash (corpus text read once), the filters are vectorized masks,
    and the only exchange is the hash-keyed dedup moving (hash, id,
    n_tokens) survivors — filtered-out docs never shuffle."""
    import hashlib
    from collections import Counter

    from twine_ray.functions.textnorm import simple_tokens_ascii
    from twine_ray.stages.grouped import bucketed_group_reduce

    ds = _docs(sf_dir, ["doc_id", "text"])
    punct_pat = r"[!-/:-@\[-`{-~]"

    def _fused(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        toks_q = texts.map(simple_tokens_ascii)
        n_tokens = toks_q.map(len).astype("int64")
        n_chars = texts.str.len().astype("int64")
        n_alpha = texts.str.count(r"[A-Za-z]").astype("int64")
        n_punct = texts.str.count(punct_pat).astype("int64")

        def rep(text):
            toks = simple_tokens_ascii(text.lower())
            if not toks:
                return (0, 0, 0)
            vc = Counter(toks)
            return (len(toks), len(vc), max(vc.values()))

        trip = texts.map(rep)
        n_tok_l = trip.map(lambda t: t[0]).astype("int64")
        n_distinct = trip.map(lambda t: t[1]).astype("int64")
        max_tok_n = trip.map(lambda t: t[2]).astype("int64")
        keep = (
            (n_tokens >= 15)
            & (4 * n_punct <= n_chars)
            & (10 * n_alpha >= 3 * n_chars)
            & (5 * max_tok_n <= n_tok_l)
            & (3 * n_distinct >= n_tok_l)
            & (n_tok_l > 0)
        )
        out = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": n_tokens,
            "text_md5": texts.map(
                lambda t: hashlib.md5(t.encode()).hexdigest()
            ),
        })
        return out[keep.to_numpy()]

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        # min doc_id per distinct text; n_tokens is constant per text
        df = df.sort_values(["text_md5", "doc_id"], kind="mergesort")
        return df.groupby("text_md5", as_index=False).first()

    survivors = bucketed_group_reduce(
        ds.map_batches(_fused, batch_format="pandas"),
        ["text_md5"], _dedup,
    )

    def _split(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib as _h

        def split_of(i) -> str:
            b = _h.md5(str(int(i)).encode()).digest()[0]
            return "train" if b < 0xCC else ("val" if b < 0xE6 else "test")

        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": df["n_tokens"].astype("int64"),
            "split": df["doc_id"].map(split_of),
        })

    return survivors.map_batches(_split, batch_format="pandas")


def q_cms_top_tokens(sf_dir: str, k: int = 50):
    """Heavy-hitter tokens WITHOUT the vocabulary exchange — the
    Count-Min route (functions/sketch.py): each input block emits one
    256 KiB sketch row plus its local top candidates, sketches sum
    through a combiner (elementwise add is associative under any
    partitioning), candidates dedup through one tiny exchange, and the
    driver touches only the single merged sketch + the bounded
    candidate list.  The exact q_top_tokens shuffles every distinct
    token; this shuffles O(blocks) sketch rows — the trade that wins
    when the vocabulary is corpus-scale.  Rows-only (probabilistic);
    tests/test_cms.py gates the overestimate property, top-k recall vs
    the exact oracle and repartition determinism."""
    from collections import Counter

    import numpy as np

    from twine_ray.functions.sketch import CMS_D, CMS_W, cms_counts, cms_query
    from twine_ray.functions.textnorm import simple_tokens_ascii
    from twine_ray.stages.grouped import bucketed_group_reduce

    ds = _docs(sf_dir, ["text"])
    cand_per_block = 4 * k

    def _block(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df["text"]:
            c.update(simple_tokens_ascii((t or "").lower()))
        sketch = cms_counts(list(c.keys()), list(c.values()))
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        top = top[:cand_per_block]
        return pd.DataFrame({
            "token": [None] + [t for t, _n in top],
            "n_local": pd.Series(
                [0] + [n for _t, n in top], dtype="int64"
            ),
            "sketch": [sketch.ravel().tolist()] + [None] * len(top),
        })

    rows = ds.map_batches(
        _block, batch_format="pandas", batch_size=None,
    ).materialize()

    def _sum_sketch(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        df = df[df["sketch"].notna()]
        if df.empty:
            return pd.DataFrame({"gid": pd.Series([], dtype="int64"),
                                 "sketch": pd.Series([], dtype=object)})
        total = np.sum(
            [np.asarray(s, dtype=np.int64) for s in df["sketch"]], axis=0
        )
        return pd.DataFrame({"gid": pd.Series([0], dtype="int64"),
                             "sketch": [total.tolist()]})

    merged = bucketed_group_reduce(
        rows.map_batches(
            lambda df: df[["sketch"]].assign(gid=0), batch_format="pandas"
        ),
        ["gid"], _sum_sketch, num_buckets=2,
    ).take_all()
    table = np.asarray(
        merged[0]["sketch"], dtype=np.int64
    ).reshape(CMS_D, CMS_W)

    def _cands(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["token"].notna()]
        out = df.groupby("token", as_index=False).agg(
            n_local=("n_local", "max")
        )
        out = out.sort_values(["n_local", "token"], kind="mergesort",
                              ascending=[False, True])
        return out.head(40 * k)  # bounded driver list

    cands = bucketed_group_reduce(
        rows.map_batches(
            lambda df: df[["token", "n_local"]], batch_format="pandas"
        ),
        ["token"], _cands, partial=False,
    ).to_pandas()
    cands = cands.sort_values(
        ["n_local", "token"], kind="mergesort", ascending=[False, True]
    ).head(40 * k)
    toks = cands["token"].tolist()
    est = cms_query(table, toks)
    out = pd.DataFrame({"token": toks, "n": est}).sort_values(
        ["n", "token"], kind="mergesort", ascending=[False, True]
    ).head(k).reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out


NEG_K = 3


def q_contrastive_negatives(sf_dir: str, k: int = NEG_K):
    """Deterministic negative sampling for contrastive training: within
    each md5 bucket (same bucketing as train_shards), every doc takes
    the next ``min(k, m-1)`` docs in (md5 hex, id) order — cyclically —
    as its negatives.  Hash order is the seeded uniform draw, so the
    pairing is stable under partitioning and needs NO corpus-wide id
    broadcast: one bucket-keyed exchange of (id, hash) rows, complete
    groups, vectorized np.roll per offset.  SQL-oracled via row_number
    + modular self-join."""
    import hashlib

    import numpy as np

    from twine_ray.stages.grouped import bucketed_group_reduce

    ds = _docs(sf_dir, ["doc_id"])

    def _hash(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].map(
            lambda i: hashlib.md5(str(int(i)).encode()).hexdigest()
        )
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "shard": h.map(
                lambda x: int(x[0], 16) % N_TRAIN_SHARDS
            ).astype("int64"),
            "_h": h,
        })

    def _negs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _s, g in df.groupby("shard", sort=False):
            g = g.sort_values(["_h", "doc_id"], kind="mergesort")
            ids = g["doc_id"].to_numpy()
            m = len(ids)
            for j in range(1, min(k, m - 1) + 1):
                outs.append(pd.DataFrame({
                    "doc_id": ids,
                    "neg_rank": np.full(m, j, dtype=np.int64),
                    "neg_doc_id": np.roll(ids, -j),
                }))
        if not outs:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "neg_rank": pd.Series([], dtype="int64"),
                "neg_doc_id": pd.Series([], dtype="int64"),
            })
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_reduce(
        ds.map_batches(_hash, batch_format="pandas"),
        ["shard"], _negs, num_buckets=N_TRAIN_SHARDS, partial=False,
    )
