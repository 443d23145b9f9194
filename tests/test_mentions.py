"""M5/J1: matcher contract (regex == Aho-Corasick), word boundaries,
longest match, linking rule, broadcast == shuffle join."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from twine_ray.functions.ahocorasick import AhoCorasick, select_matches
from twine_ray.stages.mentions import GazetteerMatcher


def _rows(aliases):
    return [
        {"alias_norm": a, "entity_key": f"http://e/{i}", "prior": 0.9}
        for i, a in enumerate(aliases)
    ]


def test_word_boundaries():
    m = GazetteerMatcher(_rows(["acme"]))
    assert m.find("acme was here") == [(0, 4)]
    assert m.find("pacmea") == []
    assert m.find("acme, acme.") == [(0, 4), (6, 10)]


def test_longest_match_wins():
    m = GazetteerMatcher(_rows(["new harbor", "new harbor city"]))
    assert m.find("in new harbor city today") == [(3, 18)]
    assert m.find("in new harbor today") == [(3, 13)]


def test_non_overlapping_left_to_right():
    m = GazetteerMatcher(_rows(["a b", "b c"]))
    assert m.find("a b c") == [(0, 3)]


def test_ac_equals_regex_on_crafted():
    aliases = ["alpha", "alpha beta", "beta", "beta gamma", "gamma", "x"]
    texts = [
        "alpha beta gamma",
        "x alpha x beta gamma x",
        "alphabeta beta-gamma",
        "",
        "beta beta beta",
    ]
    rx = GazetteerMatcher(_rows(aliases), force_ac=False)
    ac = GazetteerMatcher(_rows(aliases), force_ac=True)
    for t in texts:
        assert rx.find(t) == ac.find(t), t


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=6).map(str.strip).filter(bool),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    st.text(alphabet="ab c", max_size=40),
)
def test_ac_equals_regex_property(aliases, text):
    rx = GazetteerMatcher(_rows(aliases), force_ac=False)
    ac = GazetteerMatcher(_rows(aliases), force_ac=True)
    assert rx.find(text) == ac.find(text)


def test_linking_rule_prior_then_key():
    rows = [
        {"alias_norm": "orion", "entity_key": "http://e/b", "prior": 0.8},
        {"alias_norm": "orion", "entity_key": "http://e/a", "prior": 0.4},
        {"alias_norm": "tied", "entity_key": "http://e/z", "prior": 0.5},
        {"alias_norm": "tied", "entity_key": "http://e/m", "prior": 0.5},
    ]
    m = GazetteerMatcher(rows)
    assert m.link["orion"] == ("http://e/b", 0.8)  # higher prior wins
    assert m.link["tied"] == ("http://e/m", 0.5)  # tie → min key


def test_detector_stage_and_shuffle_join_agree(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from twine_ray.sources.pages import alias_dict_table, pages_table
    from twine_ray.sources.world import synth_pages
    from twine_ray.stages.extract import extract_text
    from twine_ray.stages.mentions import (
        detect_mentions,
        link_mentions_shuffle,
    )

    rows, _ = synth_pages(24, seed=42, n_entities=24)
    alias_tbl = alias_dict_table(n_entities=24)
    pages = rd.from_arrow(pages_table(rows))
    extracted = extract_text(pages)

    broadcast = detect_mentions(
        extracted, alias_tbl.to_pylist(), concurrency=2
    ).to_pandas()
    assert len(broadcast) > 0
    linked = broadcast[broadcast["entity_key"] != ""]
    assert len(linked) > 0

    # strip links, relink via the shuffle join — must agree
    stripped = broadcast.assign(entity_key="", prior=0.0)
    mentions_ds = rd.from_arrow(pa.Table.from_pandas(stripped,
                                                     preserve_index=False))
    alias_ds = rd.from_arrow(alias_tbl)
    relinked = link_mentions_shuffle(mentions_ds, alias_ds).to_pandas()

    # (url, mention_id) alone is not unique: F7a re-crawls one url, so
    # two page versions share it — include span/norm in the sort key
    key = ["url", "mention_id", "start", "norm"]
    a = broadcast.sort_values(key).reset_index(drop=True)
    b = relinked.sort_values(key).reset_index(drop=True)[a.columns]
    assert a["entity_key"].tolist() == b["entity_key"].tolist()
    assert a["prior"].tolist() == b["prior"].tolist()
