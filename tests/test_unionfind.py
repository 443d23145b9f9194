"""A1 union-find: DSU spec tests + hypothesis oracle + distributed
label-propagation equivalence (SURVEY.md §2.5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.kg_oracle import naive_dsu
from twine_ray.stages.canon import (
    canon_table_from_roots,
    connected_components,
    union_find_local,
)


def test_chain_merge():
    roots = union_find_local([("b", "c"), ("a", "b"), ("c", "d")])
    assert set(roots.values()) == {"a"}


def test_star_and_late_merge():
    edges = [("hub", "x1"), ("hub", "x2"), ("p", "q"), ("x2", "q")]
    roots = union_find_local(edges)
    assert len(set(roots.values())) == 1
    assert set(roots.values()) == {"hub"}


def test_two_components():
    roots = union_find_local([("a", "b"), ("y", "z")])
    assert roots["a"] == roots["b"] == "a"
    assert roots["y"] == roots["z"] == "y"


def test_root_is_lexicographic_min():
    roots = union_find_local([("zeta", "mu"), ("mu", "alpha")])
    assert set(roots.values()) == {"alpha"}


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        max_size=60,
    )
)
def test_union_find_matches_naive_oracle(int_edges):
    edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in int_edges]
    assert union_find_local(edges) == naive_dsu(edges)


@settings(max_examples=100, deadline=None)
@given(
    st.permutations(
        [("a", "b"), ("c", "d"), ("b", "c"), ("e", "f"), ("d", "e")]
    )
)
def test_order_insensitive(perm):
    base = union_find_local([("a", "b"), ("c", "d"), ("b", "c"),
                             ("e", "f"), ("d", "e")])
    assert union_find_local(list(perm)) == base


def test_canon_table(ray_session):
    roots = union_find_local([("b", "a"), ("c", "b"), ("x", "y")])
    tbl = canon_table_from_roots(roots)
    df = tbl.to_pandas().set_index("member_key")
    assert df.loc["a", "n_members"] == 3
    assert df.loc["a", "canon_id"] == df.loc["c", "canon_id"]
    assert df.loc["x", "canon_id"] != df.loc["a", "canon_id"]
    assert df.loc["x", "canon"].startswith("http://canon.twine-ray/")


def _edges_ds(edges):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.Table.from_pydict(
            {"u": [a for a, _ in edges], "v": [b for _, b in edges]},
            schema=pa.schema([("u", pa.string()), ("v", pa.string())]),
        )
    )


def test_distributed_equals_driver_path(ray_session):
    # chains, stars, two components merged by one late edge, singleton-free
    edges = (
        [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(12)]
        + [("hub", f"s{i}") for i in range(6)]
        + [("hub", "c00")]
        + [("p1", "p2"), ("p3", "p4"), ("p2", "p3")]
    )
    driver = connected_components(_edges_ds(edges)).to_pandas()
    dist = connected_components(
        _edges_ds(edges), force_distributed=True
    ).to_pandas()
    cols = ["member_key", "canon_id", "canon", "n_members"]
    a = driver[cols].sort_values("member_key").reset_index(drop=True)
    b = dist[cols].sort_values("member_key").reset_index(drop=True)
    assert a.equals(b), (a.compare(b) if len(a) == len(b) else (len(a), len(b)))


def test_empty_edges(ray_session):
    assert connected_components(_edges_ds([])).count() == 0


def test_rewrite_canon_shuffle_equals_broadcast(ray_session):
    """J2 fallback: the hash-join rewrite path must equal the broadcast
    path row-for-row (forced via force_shuffle on a small map)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.stages.canon import connected_components
    from twine_ray.stages.resolve import rewrite_canon, rewrite_canon_auto
    from twine_ray.stages.triples import TRIPLES_SCHEMA
    from twine_ray.state.rulebase import OWL_SAMEAS

    def t(subj, pred, obj, is_lit=False):
        return {
            "graph": "http://g/" + subj[-1], "subj": subj, "pred": pred,
            "obj": obj, "obj_is_lit": is_lit, "obj_dt": "",
            "obj_lang": "", "score": 1,
        }

    rows = [
        t("http://e/a", OWL_SAMEAS, "http://e/b"),   # dropped + edge
        t("http://e/a", "http://p/name", "Alpha", is_lit=True),
        t("http://e/b", "http://p/knows", "http://e/c"),
        t("http://e/z", "http://p/knows", "http://e/a"),
        # literal that textually equals a member key: must NOT rewrite
        t("http://e/z", "http://p/note", "http://e/a", is_lit=True),
    ]
    triples = rd.from_arrow(pa.Table.from_pylist(rows, schema=TRIPLES_SCHEMA))
    edges = rd.from_arrow(
        pa.table({"u": ["http://e/a"], "v": ["http://e/b"]})
    )
    canon = connected_components(edges)

    def norm(ds):
        df = ds.to_pandas()
        return (
            df.sort_values(list(df.columns))
            .reset_index(drop=True)
        )

    bc_ds, canon_rows = rewrite_canon_auto(triples, canon)
    assert canon_rows is not None
    sh_ds, none_rows = rewrite_canon_auto(triples, canon, force_shuffle=True)
    assert none_rows is None
    bc, sh = norm(bc_ds), norm(sh_ds)
    pd.testing.assert_frame_equal(bc, sh)
    # sanity on semantics: sameAs dropped, subj/obj rewritten, literal kept
    assert not ((bc["pred"] == OWL_SAMEAS) & (bc["graph"].str.startswith("http://g"))).any()
    proxy = canon_rows[0]["canon"]
    assert (bc["subj"] == proxy).sum() >= 2
    lit = bc[(bc["pred"] == "http://p/note")]
    assert list(lit["obj"]) == ["http://e/a"]
