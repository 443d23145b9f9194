"""Count-Min sketch gates (probabilistic — no SQL oracle; these tests
are the correctness surface, per __ray_entry__.py's no_oracle list)."""

from __future__ import annotations

import duckdb
import numpy as np

from twine_ray.functions.sketch import cms_counts, cms_merge, cms_query
from twine_ray.pipelines import text

SF = "/root/testdata/sf0.001"


def test_cms_never_underestimates():
    vals = ["a"] * 100 + ["b"] * 10 + ["c"] + [f"x{i}" for i in range(500)]
    t = cms_counts(vals)
    est = cms_query(t, ["a", "b", "c", "x1"])
    assert (est >= np.array([100, 10, 1, 1])).all()


def test_cms_merge_equals_whole():
    vals = [f"t{i % 37}" for i in range(1000)]
    whole = cms_counts(vals)
    merged = cms_merge(cms_counts(vals[:400]), cms_counts(vals[400:]))
    assert (whole == merged).all()


def test_cms_weighted_equals_repeated():
    assert (
        cms_counts(["a", "b"], [3, 2])
        == cms_counts(["a", "a", "a", "b", "b"])
    ).all()


def _exact_top(k: int) -> dict[str, int]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    df = con.execute("""
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(regexp_extract_all(
                  lower(text), '[\\w]+(''[\\w]+)?')) AS tok
              FROM documents)
        GROUP BY tok ORDER BY n DESC, tok ASC LIMIT ?
    """, [k]).df()
    return dict(zip(df["tok"], df["n"].astype(int)))


def test_cms_top_tokens_vs_exact(ray_session):
    k = 30
    got = text.q_cms_top_tokens(SF, k=k)
    exact = _exact_top(k)
    # overestimate property holds for every reported token that the
    # exact table covers; top-k recall >= 0.9 on this fixed corpus
    got_map = dict(zip(got["token"], got["n"].astype(int)))
    hits = sum(1 for t in exact if t in got_map)
    assert hits >= int(0.9 * k)
    for t, n in exact.items():
        if t in got_map:
            assert got_map[t] >= n


def test_cms_top_tokens_repartition_invariant(ray_session):
    a = text.q_cms_top_tokens(SF, k=20)
    b = text.q_cms_top_tokens(SF, k=20)
    assert a.equals(b)
