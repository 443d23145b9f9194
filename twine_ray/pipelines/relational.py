"""Generic relational operators over the TPC-H-ish testdata tables
(SURVEY.md §2 rows M7/J1/J2/A2/A5/§2.6/§2.7 exercised generically, per
FIXTURES.md T5).  Every function takes ``sf_dir`` and returns a Dataset
or DataFrame whose column NAMES and VALUES match the oracle SQL in
``__ray_entry__.oracle_sql`` exactly.

Scale discipline demonstrated by each query:
- reads prune columns (``read_parquet(columns=[...])``);
- aggregates pre-reduce inside ``map_batches`` before the groupby
  shuffle (partial+final combiner pattern);
- small join sides broadcast via ``ray.put``; only large-large joins
  use the hash-shuffle ``Dataset.join``;
- float aggregates use integer micro-units (see MICRO below) so Ray's
  order-insensitive partial sums hash identically to DuckDB's.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Float aggregates are computed in integer MICRO-UNITS on both sides
# (round(expr * 1e6) summed as int64, divided back at the end): integer
# sums are order-independent, so Ray's partial+final aggregation hashes
# identically to DuckDB's single-pass SUM regardless of reduction order.

from twine_ray.state.broadcast import pool
MICRO = 1_000_000


def _read(sf_dir: str, name: str, columns=None):
    # data-determined block plan (sources/readers.py): Ray's static
    # 200-block floor makes near-empty blocks of small tables and every
    # pass pays per-block orchestration
    from twine_ray.sources.readers import sized_read_parquet

    return sized_read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# filter + project (M7 analog)
# ---------------------------------------------------------------------------


def q_filter_project(sf_dir: str):
    """lineitem rows with l_quantity > 45: key columns only."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"])

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["l_quantity"], 45.0))

    return ds.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# groupby aggregate with partial pre-aggregation (A2 pattern, TPC-H Q1)
# ---------------------------------------------------------------------------


def q_groupby_agg(sf_dir: str):
    """Q1-style pricing summary; partial combine per batch, tiny final
    groupby — the A2 partial+final pattern on a generic table."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount"],
    )

    import numpy as np

    def _micro(s):
        return np.round(s.to_numpy() * MICRO).astype("int64")

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            qty_u=_micro(df["l_quantity"]),
            price_u=_micro(df["l_extendedprice"]),
            rev_u=_micro(
                pd.Series(
                    df["l_extendedprice"].to_numpy()
                    * (1.0 - df["l_discount"].to_numpy())
                )
            ),
            disc_u=_micro(df["l_discount"]),
            n=1,
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty_u", "sum"),
            sum_price=("price_u", "sum"),
            sum_revenue=("rev_u", "sum"),
            sum_disc=("disc_u", "sum"),
            count_order=("n", "sum"),
        )
        return g

    partials = ds.map_batches(_partial, batch_format="pandas")
    final = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price", alias_name="sum_price"),
        Sum("sum_revenue", alias_name="sum_revenue"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("count_order", alias_name="count_order"),
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "sum_qty": df["sum_qty"] / MICRO,
                "sum_price": df["sum_price"] / MICRO,
                "sum_revenue": df["sum_revenue"] / MICRO,
                "avg_disc": (df["sum_disc"] / MICRO) / df["count_order"],
                "count_order": df["count_order"].astype("int64"),
            }
        )
        return out

    return final.map_batches(_finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# broadcast hash join (J1 pattern: small side via ray.put)
# ---------------------------------------------------------------------------


class _BroadcastJoiner:
    """Small-side lookup merged per batch — built once per actor."""

    def __init__(self, small_ref, small_key: str, batch_key: str,
                 cols: dict[str, str]) -> None:
        from twine_ray.state.broadcast import resolve

        small = resolve(small_ref)
        self.small = small.set_index(small_key)[list(cols)].rename(
            columns=cols
        )
        self.batch_key = batch_key

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return df.join(self.small, on=self.batch_key, how="inner")


def q_join_broadcast(sf_dir: str):
    """orders ⋈ customer (broadcast) -> per-mktsegment order stats."""
    from ray.data.aggregate import Sum

    from twine_ray.state.broadcast import broadcast

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    small_ref = broadcast(cust)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    joined = orders.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs={
            "small_ref": small_ref,
            "small_key": "c_custkey",
            "batch_key": "o_custkey",
            "cols": {"c_mktsegment": "c_mktsegment"},
        },
        batch_format="pandas",
        concurrency=pool(8),
    )

    import numpy as np

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            n=1,
            total_u=np.round(
                df["o_totalprice"].to_numpy() * MICRO
            ).astype("int64"),
        )
        return df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("n", "sum"), total=("total_u", "sum")
        )

    partials = joined.map_batches(_partial, batch_format="pandas")
    final = partials.groupby("c_mktsegment").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("total", alias_name="total"),
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_mktsegment": df["c_mktsegment"],
                "n_orders": df["n_orders"].astype("int64"),
                "total_price": df["total"] / MICRO,
            }
        )

    return final.map_batches(_finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# large-large shuffle hash join (J2 pattern: Dataset.join)
# ---------------------------------------------------------------------------


def q_join_shuffle(sf_dir: str):
    """lineitem ⋈ orders on orderkey -> revenue per o_orderpriority."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    from twine_ray.stages.grouped import default_num_partitions

    joined = li.join(
        orders,
        join_type="inner",
        # size the exchange to the larger side (parquet metadata count)
        num_partitions=default_num_partitions(hi=32, rows=li.count()),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    import numpy as np

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"].to_numpy() * (
            1.0 - df["l_discount"].to_numpy()
        )
        df = df.assign(
            revenue=np.round(rev * MICRO).astype("int64"), n=1
        )
        return df.groupby("o_orderpriority", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("n", "sum")
        )

    partials = joined.map_batches(_partial, batch_format="pandas")
    final = partials.groupby("o_orderpriority").aggregate(
        Sum("revenue", alias_name="revenue"),
        Sum("n_items", alias_name="n_items"),
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"],
                "revenue": df["revenue"] / MICRO,
                "n_items": df["n_items"].astype("int64"),
            }
        )

    return final.map_batches(_finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# sort / top-k (§2.6)
# ---------------------------------------------------------------------------


def q_sort_topk(sf_dir: str):
    """Top 10 orders by totalprice desc (orderkey asc tiebreak)."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    return orders.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(10)


def q_topk_per_group(sf_dir: str):
    """Top 2 orders per customer by totalprice — windowed top-k as a
    bucketed vectorized reduction (sort + groupby().head(2), both C
    kernels; associative per customer)."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        return df.groupby("o_custkey", sort=False).head(2)

    return bucketed_group_reduce(orders, ["o_custkey"], _reduce)


# ---------------------------------------------------------------------------
# distinct / dedup (A5 generic)
# ---------------------------------------------------------------------------


def q_distinct(sf_dir: str):
    """Distinct (l_returnflag, l_linestatus) pairs — partial per-batch
    dedup then hash-bucketed vectorized dedup (exact-dedup pattern,
    no per-key Python calls)."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return bucketed_group_reduce(
        ds, ["l_returnflag", "l_linestatus"], _reduce, num_buckets=16
    )


# ---------------------------------------------------------------------------
# global aggregate (no grouping)
# ---------------------------------------------------------------------------


def q_agg_global(sf_dir: str):
    """Global lineitem stats in one partial+final pass.

    Scale shape: the one-row-per-batch partials merge through a
    constant-key ``bucketed_group_reduce`` (the CMS-merge pattern), so
    a WORKER — not the driver — folds the blocks-proportional partial
    rows; the driver reads exactly one merged row."""
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    import numpy as np

    from twine_ray.stages.grouped import bucketed_group_reduce

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "__k": [0],
                "n_rows": [len(df)],
                "sum_qty_u": [
                    int(np.round(
                        df["l_quantity"].to_numpy() * MICRO
                    ).astype("int64").sum())
                ],
                "min_price": [df["l_extendedprice"].min()],
                "max_price": [df["l_extendedprice"].max()],
            }
        )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "__k": [0],
                "n_rows": [int(df["n_rows"].sum())],
                "sum_qty_u": [int(df["sum_qty_u"].sum())],
                "min_price": [df["min_price"].min()],
                "max_price": [df["max_price"].max()],
            }
        )

    merged = bucketed_group_reduce(
        ds.map_batches(_partial, batch_format="pandas"),
        ["__k"], _merge,
    ).to_pandas()  # exactly one row
    return pd.DataFrame(
        {
            "n_rows": [int(merged["n_rows"].iloc[0])],
            "sum_qty": [float(merged["sum_qty_u"].iloc[0]) / MICRO],
            "min_price": [float(merged["min_price"].iloc[0])],
            "max_price": [float(merged["max_price"].iloc[0])],
        }
    )


# ---------------------------------------------------------------------------
# semi join via broadcast key set (§2.4 semi/anti)
# ---------------------------------------------------------------------------


def q_semi_join(sf_dir: str):
    """Parts that appear in at least one lineitem (semi join): the
    lineitem key set is aggregated small, broadcast, and applied as a
    vectorized filter on part."""
    from twine_ray.state.broadcast import broadcast

    li_keys = (
        _read(sf_dir, "lineitem", ["l_partkey"])
        .unique("l_partkey")
    )
    key_ref = broadcast(set(li_keys))
    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])

    class _SemiFilter:
        def __init__(self, ref) -> None:
            from twine_ray.state.broadcast import resolve

            self.keys = pa.array(sorted(resolve(ref)), type=pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["p_partkey"], value_set=self.keys))

    filtered = part.map_batches(
        _SemiFilter,
        fn_constructor_kwargs={"ref": key_ref},
        batch_format="pyarrow",
        concurrency=pool(8),
    )

    return filtered


# ---------------------------------------------------------------------------
# union (§2.7)
# ---------------------------------------------------------------------------


def q_union(sf_dir: str):
    """union of two disjoint filters = one combined dataset (count per
    status to keep the result stable/small)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    def _pick(status):
        def _f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["o_orderstatus"], status))

        return _f

    a = orders.map_batches(_pick("F"), batch_format="pyarrow")
    b = orders.map_batches(_pick("O"), batch_format="pyarrow")
    u = a.union(b)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(n=1)
        return df.groupby("o_orderstatus", as_index=False).agg(
            n_orders=("n", "sum")
        )

    parts = u.map_batches(_partial, batch_format="pandas")
    final = parts.groupby("o_orderstatus").aggregate(
        Sum("n_orders", alias_name="n_orders")
    )

    def _fix(df: pd.DataFrame) -> pd.DataFrame:
        df["n_orders"] = df["n_orders"].astype("int64")
        return df

    return final.map_batches(_fix, batch_format="pandas")


# ---------------------------------------------------------------------------
# events: grouped aggregate + tumbling window (§2.9 analog on testdata)
# ---------------------------------------------------------------------------


def _merge_window_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Combiner for the per-batch window partials: integer sums are
    associative, so partial/combiner re-application is safe."""
    return df.groupby(["event_type", "window_start"],
                      as_index=False).agg(
        n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
    )


def q_events_window(sf_dir: str):
    """Tumbling 1-hour window counts per event_type (event-log shaped
    groupby; the batch analog of a streaming window)."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    import numpy as np

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            window_start=df["ts"].dt.floor("h"),
            n=1,
            value_u=np.round(df["value"].to_numpy() * MICRO).astype("int64"),
        )
        return df.groupby(["event_type", "window_start"],
                          as_index=False).agg(
            n_events=("n", "sum"), sum_value=("value_u", "sum")
        )

    parts = ev.map_batches(_partial, batch_format="pandas")
    # bucketed merge: the Dataset groupby-aggregate costs seconds of
    # exchange machinery for this window×type-sized result
    final = bucketed_group_reduce(
        parts, ["event_type", "window_start"], _merge_window_partials,
        num_buckets=8,
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                # us precision: matches the parquet/DuckDB timestamp unit
                "window_start": df["window_start"].astype("datetime64[us]"),
                "n_events": df["n_events"].astype("int64"),
                "sum_value": df["sum_value"] / MICRO,
            }
        )

    return final.map_batches(_finish, batch_format="pandas")


def q_hopping_windows(sf_dir: str, window_min: int = 60,
                      hop_min: int = 15):
    """HOPPING (overlapping) window counts/sums per event_type: 60-min
    windows advancing every 15 min, so each event lands in exactly
    ``window/hop`` windows.  The batch analog of a sliding streaming
    window — each event is exploded to its windows inside map_batches
    (vectorized tile/repeat), partially reduced per batch, then ONE
    groupby merges partials.  Window starts computed in integer
    MICROSECONDS on both sides (the DuckDB oracle uses epoch_us +
    make_timestamp) so timestamps match bit-for-bit."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    import numpy as np

    k = window_min // hop_min
    hop_us = hop_min * 60 * 1_000_000

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        slot = (ts_us // hop_us) * hop_us
        starts = np.concatenate([slot - i * hop_us for i in range(k)])
        out = pd.DataFrame(
            {
                "event_type": np.tile(df["event_type"].to_numpy(), k),
                "window_start": starts,
                "n": np.ones(n * k, dtype="int64"),
                "value_u": np.tile(
                    np.round(df["value"].to_numpy() * MICRO).astype("int64"),
                    k,
                ),
            }
        )
        return out.groupby(["event_type", "window_start"],
                           as_index=False).agg(
            n_events=("n", "sum"), sum_value=("value_u", "sum")
        )

    parts = ev.map_batches(_partial, batch_format="pandas")
    final = bucketed_group_reduce(
        parts, ["event_type", "window_start"], _merge_window_partials,
        num_buckets=8,
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "window_start": pd.to_datetime(
                    df["window_start"], unit="us"
                ).astype("datetime64[us]"),
                "n_events": df["n_events"].astype("int64"),
                "sum_value": df["sum_value"] / MICRO,
            }
        )

    return final.map_batches(_finish, batch_format="pandas")


def q_latest_event_per_user(sf_dir: str):
    """Latest event per user (max ts, tie max event_id) — the generic
    latest-wins / graph-replace reduction, bucketed + vectorized."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        return df.drop_duplicates(subset=["user_id"], keep="last")

    return bucketed_group_reduce(ev, ["user_id"], _reduce)


# ---------------------------------------------------------------------------
# union-find on a SQL-derivable edge set (A1 with a recursive-CTE oracle)
# ---------------------------------------------------------------------------


def q_union_find_orders(sf_dir: str):
    """Connected components over the bipartite graph
    customer c<custkey> — bucket b<orderkey % 97> from orders.

    Oracled by a DuckDB recursive CTE; returns (member_key, root)."""
    from twine_ray.stages.canon import connected_components

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _edges(t: pa.Table) -> pa.Table:
        cust = [f"c{k}" for k in t["o_custkey"].to_pylist()]
        buck = [f"b{int(k) % 97}" for k in t["o_orderkey"].to_pylist()]
        return pa.Table.from_pydict(
            {"u": pa.array(cust, type=pa.string()),
             "v": pa.array(buck, type=pa.string())}
        )

    edges = orders.map_batches(_edges, batch_format="pyarrow")
    canon = connected_components(edges)
    return canon.select_columns(["member_key", "root"])


# ---------------------------------------------------------------------------
# set difference (J3 generic: EXCEPT via bucketed anti-join)
# ---------------------------------------------------------------------------


def q_except(sf_dir: str):
    """Line items with quantity > 30 EXCEPT those with discount <= 0.05
    — the incremental-diff anti-join (twine_ray.stages.diff) on a
    neutral table, with SQL EXCEPT (set) semantics."""
    from twine_ray.stages.diff import dataset_except

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"])

    def _left(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["l_quantity"], 30.0))

    def _right(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t["l_discount"], 0.05))

    left = ds.map_batches(_left, batch_format="pyarrow")
    right = ds.map_batches(_right, batch_format="pyarrow")
    return dataset_except(
        left, right, ["l_orderkey", "l_linenumber"], distinct=True
    )


# ---------------------------------------------------------------------------
# additional relational coverage: having, windows, anti join, string ops,
# conditional aggregation, multi-way join
# ---------------------------------------------------------------------------


def q_groupby_having(sf_dir: str):
    """Customers with >= 15 orders (HAVING over a grouped count)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(n=1)
        return df.groupby("o_custkey", as_index=False).agg(
            n_orders=("n", "sum")
        )

    final = (
        orders.map_batches(_partial, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )

    def _having(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_orders"] >= 15]
        df["n_orders"] = df["n_orders"].astype("int64")
        return df

    return final.map_batches(_having, batch_format="pandas")


def q_running_sum(sf_dir: str):
    """Per-user running sum of event values over time (window function
    analog): bucketed per-user cumulative sum, vectorized groupby
    cumsum inside each bucket."""
    import numpy as np

    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        # NOT associative run-to-run — must see complete user groups, so
        # partial=False is required at the call site.
        df = df.assign(
            value_u=np.round(df["value"].to_numpy() * MICRO).astype("int64")
        )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        running = df.groupby("user_id", sort=False)["value_u"].cumsum()
        out = df.assign(running_value=running / MICRO)
        return out[["event_id", "user_id", "running_value"]]

    return bucketed_group_reduce(ev, ["user_id"], _reduce, partial=False)


def q_anti_join(sf_dir: str):
    """Parts never shipped in a near-full-quantity lineitem (anti join
    via broadcast key set; the filter keeps the anti set non-empty)."""
    from twine_ray.state.broadcast import broadcast

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def _hot(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["l_quantity"], 49.0)).select(
            ["l_partkey"]
        )

    li_keys = li.map_batches(_hot, batch_format="pyarrow").unique("l_partkey")
    key_ref = broadcast(set(li_keys))
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])

    class _AntiFilter:
        def __init__(self, ref) -> None:
            from twine_ray.state.broadcast import resolve

            self.keys = pa.array(sorted(resolve(ref)), type=pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.filter(
                pc.invert(pc.is_in(t["p_partkey"], value_set=self.keys))
            )

    return part.map_batches(
        _AntiFilter,
        fn_constructor_kwargs={"ref": key_ref},
        batch_format="pyarrow",
        concurrency=pool(8),
    )


def q_string_ops(sf_dir: str):
    """Vectorized string kernels over part names (scalar-function
    coverage, SURVEY.md §2.8): upper, length, prefix extraction."""
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def _f(t: pa.Table) -> pa.Table:
        name = t["p_name"]
        return pa.Table.from_pydict(
            {
                "p_partkey": t["p_partkey"],
                "name_upper": pc.utf8_upper(name),
                "name_len": pc.cast(pc.utf8_length(name), pa.int64()),
                "name_prefix": pc.utf8_slice_codeunits(name, 0, 5),
            }
        )

    return part.map_batches(_f, batch_format="pyarrow")


def q_conditional_agg(sf_dir: str):
    """SUM(CASE WHEN ...) per returnflag: urgent-vs-rest revenue split
    requires a join + conditional aggregation."""
    import numpy as np

    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    from twine_ray.stages.grouped import default_num_partitions

    joined = li.join(
        orders, join_type="inner",
        num_partitions=default_num_partitions(hi=32, rows=li.count()),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"].to_numpy() * (
            1.0 - df["l_discount"].to_numpy()
        )
        rev_u = np.round(rev * MICRO).astype("int64")
        urgent = (df["o_orderpriority"] == "1-URGENT").to_numpy()
        return pd.DataFrame(
            {
                "__k": [0],
                "urgent_rev": [int(rev_u[urgent].sum())],
                "other_rev": [int(rev_u[~urgent].sum())],
                "n_urgent": [int(urgent.sum())],
            }
        )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "__k": [0],
                "urgent_rev": [int(df["urgent_rev"].sum())],
                "other_rev": [int(df["other_rev"].sum())],
                "n_urgent": [int(df["n_urgent"].sum())],
            }
        )

    # constant-key worker-side merge of the one-row partials (the
    # CMS-merge pattern) — the driver reads exactly one row
    from twine_ray.stages.grouped import bucketed_group_reduce

    merged = bucketed_group_reduce(
        joined.map_batches(_partial, batch_format="pandas"),
        ["__k"], _merge,
    ).to_pandas()
    return pd.DataFrame(
        {
            "urgent_rev": [float(merged["urgent_rev"].iloc[0]) / MICRO],
            "other_rev": [float(merged["other_rev"].iloc[0]) / MICRO],
            "n_urgent": [int(merged["n_urgent"].iloc[0])],
        }
    )


def q_join_multi(sf_dir: str):
    """3-way broadcast join region ⋈ nation ⋈ customer -> customers per
    region (dimension chain collapsed into one composed lookup)."""
    from ray.data.aggregate import Sum

    from twine_ray.state.broadcast import broadcast

    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_regionkey"]).to_pandas()
    n2r = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )[["n_nationkey", "r_name"]]
    ref = broadcast(n2r)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    joined = cust.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs={
            "small_ref": ref,
            "small_key": "n_nationkey",
            "batch_key": "c_nationkey",
            "cols": {"r_name": "r_name"},
        },
        batch_format="pandas",
        concurrency=pool(8),
    )

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(n=1)
        return df.groupby("r_name", as_index=False).agg(
            n_customers=("n", "sum")
        )

    final = (
        joined.map_batches(_partial, batch_format="pandas")
        .groupby("r_name")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )

    def _fix(df: pd.DataFrame) -> pd.DataFrame:
        df["n_customers"] = df["n_customers"].astype("int64")
        return df

    return final.map_batches(_fix, batch_format="pandas")


def q_session_windows(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user: a new session starts after a gap of
    more than ``gap_minutes`` between consecutive events (the classic
    streaming sessionization, expressed as a bucketed vectorized
    reduction over complete user groups; SURVEY.md §2.9).

    Returns (user_id, session_id, session_start, n_events) with
    sessions numbered 1..k per user in time order."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        # needs complete user groups -> partial=False at the call site
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap_break = df["ts"].diff() > gap
        sid = (new_user | gap_break).cumsum()
        g = df.assign(_sid=sid).groupby("_sid", as_index=False).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            n_events=("event_id", "size"),
        )
        g = g.sort_values(["user_id", "session_start"], kind="mergesort")
        g["session_id"] = g.groupby("user_id", sort=False).cumcount() + 1
        g["n_events"] = g["n_events"].astype("int64")
        g["session_id"] = g["session_id"].astype("int64")
        g["session_start"] = g["session_start"].astype("datetime64[us]")
        return g[["user_id", "session_id", "session_start", "n_events"]]

    return bucketed_group_reduce(ev, ["user_id"], _reduce, partial=False)


def asof_join(left_ds, right_ds, by: str, ts_col: str,
              right_cols: dict, num_buckets: int = 64):
    """Generic AS-OF join — an operator Ray Data lacks natively (task
    brief §custom operators): for each left row, attach the LATEST
    right row with ``right.ts <= left.ts`` sharing the ``by`` key.

    Execution: both sides are tagged and bucketed by the key in ONE
    shuffle (complete key groups co-locate); within each bucket the
    match is a vectorized ``pd.merge_asof`` (C sort-merge), never a
    Python loop.  Partitioning assumption: one key's history fits a
    reducer — the same contract as every grouped operator here; salt
    the key upstream if a single entity's history is reducer-scale.

    ``right_cols`` maps right-side column -> output name.  Inner
    semantics: left rows with no prior right row are dropped."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    tag_l = left_ds.map_batches(
        lambda df: df.assign(__side=0), batch_format="pandas"
    )
    tag_r = right_ds.map_batches(
        lambda df: df.assign(__side=1), batch_format="pandas"
    )
    both = tag_l.union(tag_r)
    out_names = list(right_cols.values())

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["__side"] == 0].drop(columns="__side")
        right = df[df["__side"] == 1].drop(columns="__side")
        left = left.sort_values([ts_col, by], kind="mergesort")
        right = right.sort_values([ts_col, by], kind="mergesort")
        right = right[[by, ts_col, *right_cols]].rename(
            columns=dict(right_cols)
        )
        m = pd.merge_asof(
            left, right, on=ts_col, by=by, direction="backward",
            suffixes=("", "__r"),
        )
        return m.dropna(subset=[out_names[0]])

    return bucketed_group_reduce(
        both, [by], _reduce, num_buckets=num_buckets, partial=False
    )


def q_asof_join(sf_dir: str):
    """Each 'click' event joined to the user's most recent
    'purchase' at-or-before it (DuckDB ASOF JOIN oracle)."""
    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def _only(kind):
        def _f(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["event_type"] == kind].drop(
                columns="event_type"
            )

        return _f

    clicks = ev.map_batches(_only("click"), batch_format="pandas")
    purchases = ev.map_batches(_only("purchase"), batch_format="pandas")
    joined = asof_join(
        clicks.map_batches(
            lambda df: df.drop(columns="value"), batch_format="pandas"
        ),
        purchases,
        by="user_id", ts_col="ts",
        right_cols={"event_id": "purchase_event_id",
                    "value": "purchase_value"},
    )

    def _out(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "ts": df["ts"].astype("datetime64[us]"),
                "user_id": df["user_id"].astype("int64"),
                "purchase_event_id":
                    df["purchase_event_id"].astype("int64"),
                "purchase_value": df["purchase_value"].astype("float64"),
            }
        )

    return joined.map_batches(_out, batch_format="pandas")


def q_range_join(sf_dir: str, band_minutes: int = 5):
    """Band/range join — pairs of same-user events where the second
    falls within (0, band] after the first; the interval-join shape
    Ray Data has no native operator for.  ONE shuffle (bucket by
    user), vectorized self-merge + band filter per bucket; per-key
    pair counts bound the quadratic term (a reducer-scale hot key
    would need time-bucket pre-blocking — documented assumption).
    Returns (a_id, b_id, gap_us) with the gap in exact integer
    microseconds (bit-parity with DuckDB epoch_us arithmetic)."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    band = pd.Timedelta(minutes=band_minutes)

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="user_id", suffixes=("_a", "_b"))
        m = m[(m["ts_b"] > m["ts_a"]) & (m["ts_b"] <= m["ts_a"] + band)]
        return pd.DataFrame(
            {
                "a_id": m["event_id_a"].astype("int64").values,
                "b_id": m["event_id_b"].astype("int64").values,
                "gap_us": (m["ts_b"] - m["ts_a"])
                .astype("timedelta64[us]").astype("int64").values,
            }
        )

    return bucketed_group_reduce(
        ev, ["user_id"], _reduce, partial=False
    )


def q_distinct_users_per_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type: per-batch
    (type, user) dedup first — only distinct pairs shuffle — then one
    bucketed final dedup + count."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["event_type", "user_id"])

    pairs = bucketed_group_reduce(
        ev, ["event_type", "user_id"], _pairs
    )

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["event_type", "user_id"])
        g = df.groupby("event_type", as_index=False).agg(
            n_users=("user_id", "size")
        )
        g["n_users"] = g["n_users"].astype("int64")
        return g

    return bucketed_group_reduce(pairs, ["event_type"], _count,
                                 partial=False)


def q_hll_users_per_type(sf_dir: str, exact_check: bool = False):
    """APPROXIMATE distinct users per event_type via a HyperLogLog
    sketch (functions/sketch.py): per-batch vectorized register
    arrays, elementwise-max merge — at cluster scale only 4 KiB
    sketch rows shuffle, never user ids.  Deterministic hash, so the
    sketch is bit-identical under any partitioning (tested); accuracy
    gated vs the exact count in tests (no SQL oracle — approximate by
    nature)."""
    from twine_ray.functions.sketch import (
        hll_estimate,
        hll_registers,
    )
    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        out = {"event_type": [], "regs": []}
        if "regs" in df.columns:
            for et, g in df.groupby("event_type", sort=True):
                merged = np.zeros(0, dtype=np.uint8)
                for blob in g["regs"]:
                    arr = np.frombuffer(blob, dtype=np.uint8)
                    merged = arr.copy() if merged.size == 0 else \
                        np.maximum(merged, arr)
                out["event_type"].append(et)
                out["regs"].append(merged.tobytes())
        else:
            for et, g in df.groupby("event_type", sort=True):
                out["event_type"].append(et)
                out["regs"].append(
                    hll_registers(g["user_id"].tolist()).tobytes()
                )
        return pd.DataFrame(out)

    merged = bucketed_group_reduce(ev, ["event_type"], _reduce)

    def _est(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "approx_users": [
                    hll_estimate(np.frombuffer(b, dtype=np.uint8))
                    for b in df["regs"]
                ],
            }
        )

    return merged.map_batches(_est, batch_format="pandas")


def q_median_by_group(sf_dir: str):
    """Exact per-group median of l_quantity (micro-integer domain so
    the even-count midpoint (a+b)/2 is bit-identical to DuckDB's
    median over the same BIGINTs).  Complete key groups co-locate via
    ONE bucket shuffle; medians are numpy C kernels per group."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        micro = np.rint(df["l_quantity"].to_numpy() * 1e6).astype("int64")
        g = df.assign(_m=micro).groupby("l_returnflag", as_index=False)
        out = g.agg(median_qty_micro=("_m", "median"),
                    n_rows=("_m", "size"))
        out["median_qty"] = out["median_qty_micro"] / 1e6
        out["n_rows"] = out["n_rows"].astype("int64")
        return out[["l_returnflag", "median_qty", "n_rows"]]

    return bucketed_group_reduce(li, ["l_returnflag"], _reduce,
                                 partial=False)


def q_moving_sum(sf_dir: str, window: int = 5):
    """Per-user moving 5-row window over value (ordered by ts,
    event_id): exact micro-integer rolling sum + window row count —
    the ROWS BETWEEN 4 PRECEDING AND CURRENT ROW shape, division-free
    for bit parity."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "value"])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        micro = np.rint(df["value"].to_numpy() * 1e6).astype("int64")
        g = df.assign(_m=micro).groupby("user_id", sort=False)
        roll = g["_m"].rolling(window, min_periods=1)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64").values,
                "user_id": df["user_id"].astype("int64").values,
                "moving_sum": (roll.sum().to_numpy() / 1e6),
                "n_window": roll.count().to_numpy().astype("int64"),
            }
        )

    return bucketed_group_reduce(ev, ["user_id"], _reduce, partial=False)


def q_pagerank_orders(sf_dir: str, iters: int = 3):
    """Integer-arithmetic PageRank (stages/pagerank.py) over the
    bipartite customer->order-bucket digraph (same graph the
    union-find query uses, directed).  Deterministic under any
    partitioning; the DuckDB oracle unrolls the three iterations."""
    from twine_ray.stages.grouped import bucketed_group_reduce
    from twine_ray.stages.pagerank import pagerank

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _edges(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "u": "c" + df["o_custkey"].astype(str),
                "v": "b" + (df["o_orderkey"] % 97).astype(str),
            }
        )
        return out.drop_duplicates()

    edges = bucketed_group_reduce(
        orders.map_batches(_edges, batch_format="pandas"),
        ["u", "v"],
        lambda df: df.drop_duplicates(),
    )
    return pagerank(edges, iters=iters)


def q_triangle_count(sf_dir: str):
    """Triangle count (stages/triangles.py, degree-oriented wedge
    join) over a deterministic hash-derived undirected graph on the
    orders table; the DuckDB oracle is the a<b<c three-way self-join,
    valid because the count is orientation-invariant."""
    from twine_ray.stages.triangles import triangle_count

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": (df["o_orderkey"] % 5000).astype("int64"),
                "v": ((df["o_orderkey"] * 7 + df["o_custkey"]) % 5000)
                .astype("int64"),
            }
        )

    n = triangle_count(orders.map_batches(_edges, batch_format="pandas"))
    return pd.DataFrame({"n_triangles": pd.Series([n], dtype="int64")})


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_event_pivot(sf_dir: str):
    """Pivot reshape: one row per user, one count column per event
    type plus the row total (GROUP BY + FILTER wide form).  Count
    partials are associative, so the same reduce runs per batch
    (crosstab over raw events) and per bucket (sum of partials); the
    fixed type domain keeps the wide schema stable."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        if "event_type" in df.columns:
            ct = pd.crosstab(df["user_id"], df["event_type"])
            ct = ct.reindex(columns=EVENT_TYPES, fill_value=0)
            out = pd.DataFrame({"user_id": ct.index.to_numpy("int64")})
            for t, c in zip(EVENT_TYPES, cols):
                out[c] = ct[t].to_numpy("int64")
            return out
        g = df.groupby("user_id", as_index=False)[cols].sum()
        for c in cols:
            g[c] = g[c].astype("int64")
        return g

    out = bucketed_group_reduce(ev, ["user_id"], _reduce, num_buckets=8)

    def _total(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_total"] = sum(df[c] for c in cols)
        return df

    return out.map_batches(_total, batch_format="pandas")


def q_rollup(sf_dir: str):
    """Two-level ROLLUP (region -> nation -> grand total) over customer
    balances: tiny dims (nation x region, 25 rows) closure-shipped per
    task, micro-int partial sums per batch, ONE bucketed merge of the
    25 fine groups, then the coarser levels derived from the FINE
    result (entity-scale by contract — never a second corpus scan).
    'ALL' sentinel instead of SQL NULL for hash parity."""
    import numpy as np

    from twine_ray.stages.grouped import bucketed_group_reduce

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "n_name", "r_name"]
    ]

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.merge(dim, left_on="c_nationkey", right_on="n_nationkey")
        df = df.assign(
            bal_u=np.round(df["c_acctbal"].to_numpy() * MICRO)
            .astype("int64"),
            n=1,
        )
        return df.groupby(["r_name", "n_name"], as_index=False).agg(
            sum_u=("bal_u", "sum"), n_custs=("n", "sum")
        )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["r_name", "n_name"], as_index=False).agg(
            sum_u=("sum_u", "sum"), n_custs=("n_custs", "sum")
        )

    fine = bucketed_group_reduce(
        cust.map_batches(_partial, batch_format="pandas"),
        ["r_name", "n_name"], _merge, partial=False, num_buckets=4,
    )

    def _levels(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["r_name", "n_name", "sum_u", "n_custs"]
        fine_ = df[cols]
        sub = fine_.groupby("r_name", as_index=False).agg(
            sum_u=("sum_u", "sum"), n_custs=("n_custs", "sum")
        ).assign(n_name="ALL")[cols]
        grand = pd.DataFrame(
            {
                "r_name": ["ALL"], "n_name": ["ALL"],
                "sum_u": [fine_["sum_u"].sum()],
                "n_custs": [fine_["n_custs"].sum()],
            }
        )
        out = pd.concat([fine_, sub, grand], ignore_index=True)
        return pd.DataFrame(
            {
                "r_name": out["r_name"],
                "n_name": out["n_name"],
                "sum_bal": out["sum_u"] / MICRO,
                "n_custs": out["n_custs"].astype("int64"),
            }
        )

    return fine.repartition(1).map_batches(
        _levels, batch_format="pandas", batch_size=None
    )


def q_percentiles_by_group(sf_dir: str):
    """Exact per-group discrete quantiles (p25/p50/p75/p90) of
    l_quantity in the micro-integer domain, using the quantile_disc
    index rule sorted[ceil(q*n)-1] so values are bit-identical to
    DuckDB.  Complete key groups co-locate via ONE bucket shuffle."""
    import math

    import numpy as np

    from twine_ray.stages.grouped import bucketed_group_reduce

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    qs = [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p90", 0.9)]

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        micro = np.rint(df["l_quantity"].to_numpy() * MICRO).astype("int64")
        out = {"l_returnflag": [], "n_rows": []}
        for name, _ in qs:
            out[name] = []
        for flag, g in df.assign(_m=micro).groupby("l_returnflag",
                                                   sort=True):
            arr = np.sort(g["_m"].to_numpy())
            out["l_returnflag"].append(flag)
            out["n_rows"].append(len(arr))
            for name, q in qs:
                out[name].append(arr[math.ceil(q * len(arr)) - 1] / MICRO)
        out["n_rows"] = pd.Series(out["n_rows"], dtype="int64")
        cols = ["l_returnflag"] + [n for n, _ in qs] + ["n_rows"]
        return pd.DataFrame(out)[cols]

    return bucketed_group_reduce(li, ["l_returnflag"], _reduce,
                                 partial=False)


def q_string_agg_nations(sf_dir: str):
    """collect_list/string_agg analog: per region, the comma-joined
    alphabetical list of its nation names plus the count — ordered
    aggregation semantics (ORDER BY inside the aggregate), entity-scale
    dims, one bucket shuffle."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    nat = _read(sf_dir, "nation", ["n_name", "n_regionkey"])
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rmap = dict(zip(reg["r_regionkey"], reg["r_name"]))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "r_name": df["n_regionkey"].map(rmap),
                "n_name": df["n_name"],
            }
        )

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values("n_name").groupby("r_name", as_index=False)
        out = g.agg(nations=("n_name", ",".join),
                    n_nations=("n_name", "size"))
        out["n_nations"] = out["n_nations"].astype("int64")
        return out

    return bucketed_group_reduce(
        nat.map_batches(_partial, batch_format="pandas"),
        ["r_name"], _reduce, partial=False, num_buckets=4,
    )


def q_order_share(sf_dir: str):
    """Ratio-to-group-total window function (SUM OVER PARTITION BY):
    each order's per-mille share of its customer's total spend, in
    INTEGER arithmetic (share_pm = o_price_u * 1000 // cust_total_u)
    so partial sums and the division are bit-deterministic.  Complete
    customer groups co-locate via ONE bucket shuffle; top-1000 rows by
    (share_pm desc, o_orderkey) keep the result bounded."""
    import numpy as np

    from twine_ray.stages.grouped import bucketed_group_reduce

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        # NOT associative — needs complete customer groups
        # (partial=False at the call site).
        price_u = np.round(df["o_totalprice"].to_numpy() * MICRO) \
            .astype("int64")
        df = df.assign(price_u=price_u)
        tot = df.groupby("o_custkey", sort=False)["price_u"] \
            .transform("sum")
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "o_custkey": df["o_custkey"].astype("int64"),
                "share_pm": (df["price_u"] * 1000 // tot).astype("int64"),
            }
        )

    shares = bucketed_group_reduce(orders, ["o_custkey"], _reduce,
                                   partial=False)
    return shares.sort(["share_pm", "o_orderkey"],
                       descending=[True, False]).limit(1000)


def q_event_gaps(sf_dir: str):
    """LAG window analog: per-user microsecond gap since the previous
    event (ordered by ts, event_id); -1 sentinel for each user's first
    event (SQL NULL is a hash-parity hazard).  Complete user groups
    co-locate via ONE bucket shuffle, then the lag is a vectorized
    int64 diff — the same exchange shape as running_sum/moving_sum."""
    import numpy as np

    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        # NOT associative — needs complete user groups (partial=False).
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        uid = df["user_id"].to_numpy()
        gap = np.empty(len(df), dtype="int64")
        if len(df):
            gap[0] = -1
            d = np.diff(us)
            same = uid[1:] == uid[:-1]
            gap[1:] = np.where(same, d, -1)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64").values,
                "user_id": df["user_id"].astype("int64").values,
                "gap_us": gap,
            }
        )

    return bucketed_group_reduce(ev, ["user_id"], _reduce, partial=False)


def q_rank_dense(sf_dir: str):
    """RANK() with tie semantics (vs topk_per_group's row_number):
    customers ranked within their nation by account balance desc, ties
    sharing a rank, kept through rank <= 5 — so tie groups straddling
    the cutoff survive whole.  Balances compare in micro-ints for bit
    parity; complete nation groups co-locate via ONE bucket shuffle."""
    import numpy as np

    from twine_ray.stages.grouped import bucketed_group_reduce

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        bal_u = np.round(df["c_acctbal"].to_numpy() * MICRO) \
            .astype("int64")
        df = df.assign(bal_u=bal_u)
        rank = df.groupby("c_nationkey", sort=False)["bal_u"] \
            .rank(method="min", ascending=False).astype("int64")
        out = pd.DataFrame(
            {
                "c_custkey": df["c_custkey"].astype("int64"),
                "c_nationkey": df["c_nationkey"].astype("int64"),
                "bal_rank": rank,
            }
        )
        return out[out["bal_rank"] <= 5]

    return bucketed_group_reduce(cust, ["c_nationkey"], _reduce,
                                 partial=False)


def q_cube_agg(sf_dir: str):
    """CUBE(l_returnflag, l_linestatus) — all four grouping sets with
    'ALL' sentinels, completing the grouping-sets family next to
    ROLLUP.  Micro-int partial sums per batch, ONE bucketed merge of
    the ~6 fine groups, and every coarser level derived from the FINE
    result (entity-scale by contract; the corpus is scanned once)."""
    import numpy as np

    from twine_ray.stages.grouped import bucketed_group_reduce

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            qty_u=np.round(df["l_quantity"].to_numpy() * MICRO)
            .astype("int64"),
            n=1,
        )
        return df.groupby(["l_returnflag", "l_linestatus"],
                          as_index=False).agg(
            qty_u=("qty_u", "sum"), n_items=("n", "sum")
        )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["l_returnflag", "l_linestatus"],
                          as_index=False).agg(
            qty_u=("qty_u", "sum"), n_items=("n_items", "sum")
        )

    fine = bucketed_group_reduce(
        li.map_batches(_partial, batch_format="pandas"),
        ["l_returnflag", "l_linestatus"], _merge, partial=False,
        num_buckets=4,
    )

    def _levels(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["l_returnflag", "l_linestatus", "qty_u", "n_items"]
        fine_ = df[cols]
        by_flag = fine_.groupby("l_returnflag", as_index=False).agg(
            qty_u=("qty_u", "sum"), n_items=("n_items", "sum")
        ).assign(l_linestatus="ALL")[cols]
        by_status = fine_.groupby("l_linestatus", as_index=False).agg(
            qty_u=("qty_u", "sum"), n_items=("n_items", "sum")
        ).assign(l_returnflag="ALL")[cols]
        grand = pd.DataFrame(
            {
                "l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
                "qty_u": [fine_["qty_u"].sum()],
                "n_items": [fine_["n_items"].sum()],
            }
        )
        out = pd.concat([fine_, by_flag, by_status, grand],
                        ignore_index=True)
        return pd.DataFrame(
            {
                "l_returnflag": out["l_returnflag"],
                "l_linestatus": out["l_linestatus"],
                "sum_qty": out["qty_u"] / MICRO,
                "n_items": out["n_items"].astype("int64"),
            }
        )

    return fine.repartition(1).map_batches(
        _levels, batch_format="pandas", batch_size=None
    )


def q_semi_join_bloom(sf_dir: str):
    """Bloom-prefiltered semi join (the 100-TB shuffle-reduction
    pattern): customers with at least one order above 480k.  The build
    side's custkeys fold into per-batch Bloom bitmaps (functions/
    sketch.py, splitmix64 double hashing) OR-merged through ONE
    single-group reduce — only 16 KiB bitmap rows ever move.  The
    probe side drops definite non-members BEFORE the exact hash join
    verifies survivors, so at scale the expensive exchange sees only
    matches + the ~1% false-positive trickle.  Result is EXACT (Bloom
    false positives are eliminated by the join), hence SQL-oracled."""
    import numpy as np
    import ray.data as rd

    from twine_ray.functions.sketch import (
        bloom_bits,
        bloom_merge,
        bloom_might_contain,
    )
    from twine_ray.stages.grouped import (
        bucketed_group_reduce,
        default_num_partitions,
    )
    from twine_ray.state.broadcast import broadcast, resolve

    keys = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(
            lambda t: t.filter(
                pc.greater(t["o_totalprice"], 480_000.0)
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        )

    def _bloom(df: pd.DataFrame) -> pd.DataFrame:
        if "bits" in df.columns:
            acc = None
            for blob in df["bits"]:
                arr = np.frombuffer(blob, dtype=np.uint8)
                acc = arr.copy() if acc is None else bloom_merge(acc, arr)
            return pd.DataFrame({"g": [0], "bits": [acc.tobytes()]})
        return pd.DataFrame(
            {"g": [0],
             "bits": [bloom_bits(df["o_custkey"].to_numpy()).tobytes()]}
        )

    bitmap_row = bucketed_group_reduce(
        keys, ["g"], _bloom, num_buckets=1
    ).take_all()  # exactly one 16 KiB row by construction
    bloom_ref = broadcast(
        np.frombuffer(bitmap_row[0]["bits"], dtype=np.uint8)
    )

    class _BloomFilter:
        def __init__(self, ref) -> None:
            self.bits = resolve(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keep = bloom_might_contain(
                self.bits, t["c_custkey"].to_numpy()
            )
            return t.filter(pa.array(keep))

    survivors = _read(
        sf_dir, "customer", ["c_custkey", "c_acctbal"]
    ).map_batches(
        _BloomFilter, fn_constructor_kwargs={"ref": bloom_ref},
        batch_format="pyarrow", concurrency=pool(8),
    )

    dedup_keys = bucketed_group_reduce(
        keys, ["o_custkey"], lambda df: df.drop_duplicates(),
        num_buckets=8,
    )
    n_parts = default_num_partitions(hi=16, rows=10_000)
    joined = survivors.repartition(n_parts).materialize().join(
        dedup_keys.repartition(n_parts).materialize(),
        join_type="inner",
        num_partitions=n_parts,
        on=("c_custkey",), right_on=("o_custkey",),
    )
    return joined.select_columns(["c_custkey", "c_acctbal"])


def q_reachable(sf_dir: str):
    """Bounded property-path closure (stages/bfs.py, the SPARQL
    ``p{,3}`` analog): every node within 3 hops of node 0 in the
    deterministic orders digraph, with its minimum depth.  The DuckDB
    oracle is the depth-bounded recursive CTE — valid because the
    operator's per-level dedup + final min-depth reduce computes
    exactly the CTE's MIN(d) GROUP BY node."""
    from twine_ray.stages.bfs import bfs_reachable
    from twine_ray.stages.grouped import bucketed_group_reduce

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": (df["o_orderkey"] % 1000).astype("int64"),
                "v": ((df["o_orderkey"] * 7 + df["o_custkey"]) % 1000)
                .astype("int64"),
            }
        ).drop_duplicates()

    edges = bucketed_group_reduce(
        orders.map_batches(_edges, batch_format="pandas"),
        ["u", "v"], lambda df: df.drop_duplicates(),
    )
    return bfs_reachable(edges, [0], max_depth=3)


def q_event_funnel(sf_dir: str):
    """Strictly-ordered funnel (view -> click -> purchase by FIRST
    occurrence per user) — the product-analytics primitive over the
    event stream.  One user-keyed exchange: per-batch partial min-ts
    per (user, type) is associative, the complete-group reduce pivots
    the three first-times and compares.  Integer-microsecond
    timestamps on both sides keep the DuckDB oracle hash-exact."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["view", "click", "purchase"])]
        out = df.assign(
            ts_us=df["ts"].astype("int64")
        ).groupby(["user_id", "event_type"], as_index=False).agg(
            ts_us=("ts_us", "min")
        )
        return out[["user_id", "event_type", "ts_us"]]

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        # complete (user, type) groups per bucket: min of partial mins
        m = df.groupby(["user_id", "event_type"], as_index=False).agg(
            ts_us=("ts_us", "min")
        )
        p = m.pivot(index="user_id", columns="event_type",
                    values="ts_us")
        for c in ("view", "click", "purchase"):
            if c not in p.columns:
                p[c] = pd.NA
        viewed = p["view"].notna()
        clicked = viewed & p["click"].notna() & (p["view"] < p["click"])
        bought = clicked & p["purchase"].notna() & (
            p["click"] < p["purchase"]
        )
        return pd.DataFrame({
            "n_view": [int(viewed.sum())],
            "n_view_click": [int(clicked.sum())],
            "n_view_click_purchase": [int(bought.sum())],
        })

    parts = bucketed_group_reduce(
        ev.map_batches(_partial, batch_format="pandas"),
        ["user_id"], _reduce, partial=False,
    ).to_pandas()
    # bucket partials are disjoint user sets -> plain sums
    return pd.DataFrame({
        "n_view": pd.Series([int(parts["n_view"].sum())], dtype="int64"),
        "n_view_click": pd.Series(
            [int(parts["n_view_click"].sum())], dtype="int64"
        ),
        "n_view_click_purchase": pd.Series(
            [int(parts["n_view_click_purchase"].sum())], dtype="int64"
        ),
    })


def q_cohort_retention(sf_dir: str):
    """Cohort retention over orders: cohort = month index (y*12+m) of
    the customer's FIRST order; for every later order month, count
    DISTINCT customers at each months-since offset.  Two exchanges:
    first-order month per customer (associative min), then distinct
    (cohort, offset, customer) -> counts — the canonical cohort shape,
    all integer month arithmetic."""
    from twine_ray.stages.grouped import bucketed_group_reduce

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def _mi(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.to_datetime(df["o_orderdate"])
        return pd.DataFrame({
            "cust": df["o_custkey"].astype("int64"),
            "mi": (d.dt.year * 12 + (d.dt.month - 1)).astype("int64"),
        })

    months = orders.map_batches(_mi, batch_format="pandas")

    first = bucketed_group_reduce(months.map_batches(
        lambda df: df.groupby("cust", as_index=False).agg(
            first_mi=("mi", "min")
        ),
        batch_format="pandas",
    ), ["cust"], lambda df: df.groupby("cust", as_index=False).agg(
        first_mi=("first_mi", "min")
    ), partial=False)

    from twine_ray.stages.grouped import default_num_partitions

    n_parts = default_num_partitions(hi=16, rows=15_000,
                                     rows_per_partition=100_000)
    joined = months.repartition(n_parts).materialize().join(
        first.repartition(n_parts).materialize(),
        join_type="inner", num_partitions=n_parts, on=("cust",),
    )

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cohort_mi": df["first_mi"].astype("int64"),
            "months_since": (df["mi"] - df["first_mi"]).astype("int64"),
            "cust": df["cust"].astype("int64"),
        }).drop_duplicates()

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        out = df.groupby(["cohort_mi", "months_since"],
                         as_index=False).agg(n_custs=("cust", "count"))
        out["n_custs"] = out["n_custs"].astype("int64")
        return out

    return bucketed_group_reduce(
        joined.map_batches(_pairs, batch_format="pandas"),
        ["cohort_mi", "months_since"], _count, partial=False,
    )


def q_path_algebra(sf_dir: str):
    """SPARQL property-path ALGEBRA composition — ``(^p) / (p | q)``
    over two deterministic hash-derived relations on the orders graph:
    inverse, alternation and sequence are the three path operators the
    bounded closure (kg_path) doesn't exercise.  stages/bfs.py edge
    combinators; the sequence join is the only exchange.  The DuckDB
    oracle composes the same relational algebra directly."""
    from twine_ray.stages.bfs import edges_inverse, edges_seq, edges_union

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _p(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "u": (df["o_orderkey"] % 5000).astype("int64"),
            "v": ((df["o_orderkey"] * 7 + df["o_custkey"]) % 5000)
            .astype("int64"),
        }).drop_duplicates()

    def _q(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "u": ((df["o_orderkey"] * 3 + 1) % 5000).astype("int64"),
            "v": ((df["o_custkey"] * 11 + 2) % 5000).astype("int64"),
        }).drop_duplicates()

    p = orders.map_batches(_p, batch_format="pandas")
    q = orders.map_batches(_q, batch_format="pandas")
    return edges_seq(edges_inverse(p), edges_union(p, q))


def q_path_optional(sf_dir: str):
    """``p? / q`` — the zero-or-one path operator composed with a
    sequence: q itself (zero-length hop) unioned with p/q, deduped.
    stages/bfs.edges_optional scopes the identity to p's node domain,
    which the DuckDB oracle reconstructs the same way."""
    from twine_ray.stages.bfs import edges_optional, edges_seq

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _p(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "u": (df["o_orderkey"] % 5000).astype("int64"),
            "v": ((df["o_orderkey"] * 7 + df["o_custkey"]) % 5000)
            .astype("int64"),
        }).drop_duplicates()

    def _q(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "u": ((df["o_orderkey"] * 3 + 1) % 5000).astype("int64"),
            "v": ((df["o_custkey"] * 11 + 2) % 5000).astype("int64"),
        }).drop_duplicates()

    p = orders.map_batches(_p, batch_format="pandas")
    q = orders.map_batches(_q, batch_format="pandas")
    return edges_seq(edges_optional(p), q)
