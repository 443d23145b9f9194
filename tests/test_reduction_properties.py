"""Associativity / partition-invariance properties of the vectorized
reduction kernels — the contract that makes partial+final aggregation
correct under ANY Ray batch partitioning (pure pandas, no Ray)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from twine_ray.stages.resolve import _reduce_group
from twine_ray.state.rulebase import DEFAULT_RULEBASE

SINGLE = frozenset(
    p for p, r in DEFAULT_RULEBASE.predicates.items() if r.single_valued
)
PREDS = sorted(DEFAULT_RULEBASE.predicates)


def _triple_rows():
    return st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.sampled_from(["s1", "s2", "s3"]),
            st.sampled_from(PREDS),
            st.sampled_from(["a", "b", "c", "d"]),
            st.sampled_from([0, 10, 30, 50]),
        ),
        min_size=1,
        max_size=40,
    )


def _df(rows):
    return pd.DataFrame(
        [
            {
                "graph": g, "subj": s, "pred": p, "obj": o,
                "obj_is_lit": True, "obj_dt": "", "obj_lang": "",
                "score": sc,
            }
            for g, s, p, o, sc in rows
        ]
    )


def _as_set(df):
    cols = ["graph", "subj", "pred", "obj", "obj_dt", "obj_lang", "score"]
    return set(map(tuple, df[cols].itertuples(index=False, name=None)))


@settings(max_examples=300, deadline=None)
@given(_triple_rows(), st.data())
def test_resolve_reduction_partition_invariant(rows, data):
    df = _df(rows)
    direct = _reduce_group(df, SINGLE)

    # random partition into up to 4 batches; partial per batch, then
    # final over the concatenated partials — must equal direct
    assignment = data.draw(
        st.lists(
            st.integers(0, 3), min_size=len(df), max_size=len(df)
        )
    )
    parts = [
        df[[a == k for a in assignment]] for k in range(4)
    ]
    partials = [
        _reduce_group(p, SINGLE) for p in parts if len(p)
    ]
    combined = _reduce_group(
        pd.concat(partials, ignore_index=True), SINGLE
    )
    assert _as_set(direct) == _as_set(combined)


@settings(max_examples=300, deadline=None)
@given(_triple_rows())
def test_resolve_reduction_idempotent(rows):
    df = _df(rows)
    once = _reduce_group(df, SINGLE)
    twice = _reduce_group(once.reset_index(drop=True), SINGLE)
    assert _as_set(once) == _as_set(twice)


@settings(max_examples=200, deadline=None)
@given(_triple_rows(), st.randoms(use_true_random=False))
def test_resolve_reduction_row_order_invariant(rows, rnd):
    df = _df(rows)
    shuffled = df.sample(frac=1.0, random_state=rnd.randrange(10**6))
    a = _reduce_group(df, SINGLE)
    b = _reduce_group(shuffled.reset_index(drop=True), SINGLE)
    assert _as_set(a) == _as_set(b)


def test_single_valued_keeps_exactly_one():
    from twine_ray.state.rulebase import DC_TITLE

    df = _df([
        ("g1", "s1", DC_TITLE, "low", 10),
        ("g1", "s1", DC_TITLE, "high", 30),
        ("g1", "s1", DC_TITLE, "also-high", 30),
    ])
    out = _reduce_group(df, SINGLE)
    assert len(out) == 1
    # max score, tie -> lexicographic min obj
    assert out.iloc[0]["obj"] == "also-high"
