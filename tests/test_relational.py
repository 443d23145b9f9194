"""Relational operator parity vs DuckDB at sf0.001 (fast subset; the
full sweep is tools/check_oracles.py / the driver's correctness gate).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# fast, shuffle-light subset — one per operator family
SUBSET = [
    "filter_project",
    "groupby_agg",
    "join_broadcast",
    "sort_topk",
    "distinct",
    "agg_global",
    "union_counts",
    "latest_event_per_user",
    "doc_lang_counts",
    "doc_nchars",
    "dedup_exact",
    "string_ops",
    "groupby_having",
    "join_multi",
    "event_gaps",
    "semi_join_bloom",
    "reachable",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, duck, name):
    import pyarrow as pa

    import __ray_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    res = fn(SF)
    if isinstance(res, pd.DataFrame):
        got = res
    elif isinstance(res, pa.Table):
        got = res.to_pandas()
    else:
        got = res.to_pandas()
    got = _canon(got)
    want = _canon(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_join_spec(ray_session, sf_dir):
    """Distributed as-of equals the driver-side merge_asof spec."""
    import pandas as pd
    import pyarrow.parquet as pq

    from twine_ray.pipelines.relational import q_asof_join

    got = (
        q_asof_join(sf_dir).to_pandas()
        .sort_values(["event_id"]).reset_index(drop=True)
    )
    ev = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    ).to_pandas()
    clicks = ev[ev.event_type == "click"].sort_values("ts")
    buys = ev[ev.event_type == "purchase"].sort_values("ts")
    want = pd.merge_asof(
        clicks.drop(columns=["event_type", "value"]),
        buys.drop(columns="event_type").rename(
            columns={"event_id": "purchase_event_id",
                     "value": "purchase_value"}
        ),
        on="ts", by="user_id", direction="backward",
    ).dropna(subset=["purchase_event_id"])
    want = want.assign(
        purchase_event_id=want.purchase_event_id.astype("int64")
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[list(got.columns)])


def test_range_join_band_semantics(ray_session, sf_dir):
    """Every emitted pair is same-user with 0 < gap <= 5 min; pairs are
    consistent across partitionings (bucketed by complete user groups)."""
    from twine_ray.pipelines.relational import q_range_join

    df = q_range_join(sf_dir).to_pandas()
    assert (df["gap_us"] > 0).all()
    assert (df["gap_us"] <= 5 * 60 * 1_000_000).all()
    assert len(df) == len(df.drop_duplicates(["a_id", "b_id"]))


def test_hll_sketch_accuracy_and_determinism(ray_session, sf_dir):
    """HLL estimate within 5% of exact; sketch identical under any
    partitioning (deterministic hash + associative max-merge)."""
    import numpy as np
    import pandas as pd

    from twine_ray.functions.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )
    from twine_ray.pipelines.relational import (
        q_distinct_users_per_type,
        q_hll_users_per_type,
    )

    exact = (
        q_distinct_users_per_type(sf_dir).to_pandas()
        .set_index("event_type")["n_users"]
    )
    approx = (
        q_hll_users_per_type(sf_dir).to_pandas()
        .set_index("event_type")["approx_users"]
    )
    assert set(exact.index) == set(approx.index)
    for et in exact.index:
        assert abs(approx[et] - exact[et]) <= max(3, 0.05 * exact[et]), et

    # merge associativity / partitioning invariance of the sketch
    vals = [f"u{i}" for i in range(500)]
    whole = hll_registers(vals)
    parts = hll_merge(
        hll_merge(hll_registers(vals[:100]), hll_registers(vals[100:350])),
        hll_registers(vals[350:]),
    )
    assert np.array_equal(whole, parts)
    est = hll_estimate(whole)
    assert abs(est - 500) <= 0.05 * 500

    # the distributed estimate equals a second run exactly
    approx2 = (
        q_hll_users_per_type(sf_dir).to_pandas()
        .set_index("event_type")["approx_users"]
    )
    pd.testing.assert_series_equal(approx.sort_index(), approx2.sort_index())
