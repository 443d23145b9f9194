"""Mimic the driver's correctness gate: run every queries() entry at a
given sf and compare with oracle_sql() via DuckDB (row count + schema +
order-insensitive value comparison).

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import warnings

sys.path.insert(0, "/root/repo")
from twine_ray.state.malloctune import MALLOC_ENV, reexec_tuned  # noqa: E402

reexec_tuned()

warnings.filterwarnings("ignore")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon_df(df):
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return df


def main() -> int:
    import duckdb
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
        runtime_env={"env_vars": MALLOC_ENV},
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            got = canon_df(to_pandas(fn(SF)))
        except Exception as e:
            failures.append((name, f"RAY ERROR: {e!r}"))
            print(f"[FAIL-ray] {name}: {e!r}")
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(got)} rows, "
                  f"cols={list(got.columns)}")
            continue
        try:
            want = canon_df(con.execute(sql).df())
        except Exception as e:
            failures.append((name, f"SQL ERROR: {e!r}"))
            print(f"[FAIL-sql] {name}: {e!r}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"cols {list(got.columns)} != "
                                   f"{list(want.columns)}"))
            print(f"[FAIL-cols] {name}: {list(got.columns)} vs "
                  f"{list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            print(f"[FAIL-rows] {name}: {len(got)} vs {len(want)}")
            continue
        if not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad_cols = [c for c in got.columns if neq[c].any()]
            detail = {}
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                detail[c] = (got[c].iloc[i], want[c].iloc[i])
            failures.append((name, f"values differ in {bad_cols}: {detail}"))
            print(f"[FAIL-vals] {name}: {bad_cols} {detail}")
            continue
        print(f"[OK] {name}: {len(got)} rows")

    ray.shutdown()
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
