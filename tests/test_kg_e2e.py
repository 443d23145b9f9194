"""End-to-end conformance: byte-identical text invariant + triple P/R
gate (BASELINE.json lines 2/6/15; FIXTURES.md families F1–F7)."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.kg_oracle import (
    expected_triples,
    precision_recall,
    triples_df_to_set,
)
from twine_ray.pipelines.kg import kg_triples_dataset, run_kg_pipeline
from twine_ray.sources.pages import alias_dict_table, pages_table
from twine_ray.sources.world import synth_pages
from twine_ray.stages.extract import extract_text

N_PAGES = 80
N_ENT = 40


@pytest.fixture(scope="module")
def corpus():
    rows, truths = synth_pages(N_PAGES, seed=42, n_entities=N_ENT)
    return rows, truths


@pytest.fixture(scope="module")
def alias_rows():
    return alias_dict_table(n_entities=N_ENT).to_pylist()


def test_text_invariant_byte_identical(ray_session, corpus):
    """Pipeline-extracted text == golden text column, per url, at two
    different parallelism levels (input_hint invariant)."""
    import ray.data as rd

    rows, _ = corpus
    golden = {}
    from twine_ray.functions.urls import normalize_url

    for r in rows:
        golden.setdefault(normalize_url(r["url"]), set()).add(r["text"])

    for nblocks in (1, 7):
        ds = rd.from_arrow(pages_table(rows)).repartition(nblocks)
        out = extract_text(ds).to_pandas()
        assert len(out) == len(rows)
        for url, text in zip(out["url"], out["text"]):
            assert text in golden[url], f"text mismatch for {url}"


def test_kg_pipeline_precision_recall(ray_session, corpus, alias_rows):
    import ray.data as rd

    rows, truths = corpus
    pages = rd.from_arrow(pages_table(rows))
    got_df = kg_triples_dataset(pages, alias_rows, concurrency=2).to_pandas()
    got = triples_df_to_set(got_df)
    want = expected_triples(truths)
    p, r = precision_recall(got, want)
    assert p >= 0.95, f"precision {p}: extra={list(got - want)[:5]}"
    assert r >= 0.95, f"recall {r}: missing={list(want - got)[:5]}"
    # scores attached per rulebase
    assert (got_df["score"] > 0).all()


def test_kg_pipeline_deterministic_across_partitioning(
    ray_session, corpus, alias_rows
):
    import ray.data as rd

    rows, _ = corpus
    sets = []
    for nblocks in (2, 11):
        pages = rd.from_arrow(pages_table(rows)).repartition(nblocks)
        df = kg_triples_dataset(pages, alias_rows, concurrency=2).to_pandas()
        sets.append(triples_df_to_set(df))
    assert sets[0] == sets[1]


def test_run_kg_pipeline_resumable(ray_session, corpus, alias_rows, tmp_path):
    import shutil

    import ray.data as rd

    from twine_ray.stages.materialize import read_triple_store
    from twine_ray.state import checkpoint as ckpt

    rows, truths = corpus
    out_dir = str(tmp_path / "kg_out")
    pages = rd.from_arrow(pages_table(rows))
    res1 = run_kg_pipeline(pages, out_dir, alias_rows, num_buckets=8,
                           concurrency=2)
    store1 = read_triple_store(res1["store_dir"]).to_pandas()
    want = expected_triples(truths)
    p, r = precision_recall(triples_df_to_set(store1), want)
    assert p >= 0.95 and r >= 0.95

    # simulate a crash: remove markers+data for one raw bucket, leave a
    # partial (unmarked) dir for another
    raw_dir = res1["raw_dir"]
    done = sorted(ckpt.done_buckets(raw_dir))
    assert done, "expected raw buckets"
    victim = done[0]
    shutil.rmtree(f"{raw_dir}/data/graph_bucket={victim}", ignore_errors=True)
    import os

    os.remove(f"{raw_dir}/_DONE/{victim}")

    res2 = run_kg_pipeline(pages, out_dir, alias_rows, num_buckets=8,
                           concurrency=2)
    store2 = read_triple_store(res2["store_dir"]).to_pandas()
    assert triples_df_to_set(store2) == triples_df_to_set(store1)

    # resumed run must have recomputed ONLY the victim bucket in raw
    assert set(ckpt.done_buckets(raw_dir)) == set(done)


def test_latest_warc_ts_wins(ray_session, corpus, alias_rows):
    """F7a: the duplicated url contributes exactly one dc:modified value
    — the one from the max warc_ts row."""
    import ray.data as rd

    from twine_ray.state.rulebase import DC_MODIFIED

    rows, truths = corpus
    pages = rd.from_arrow(pages_table(rows))
    df = kg_triples_dataset(pages, alias_rows, concurrency=2).to_pandas()
    dup_url = truths[0].url  # page 0's url was re-crawled (F7a)
    mods = df[(df["graph"] == dup_url) & (df["pred"] == DC_MODIFIED)]
    assert len(mods) == 1
    newest = max(t.warc_ts for t in truths if t.url == dup_url)
    assert mods.iloc[0]["obj"] == newest.isoformat()


def test_sparse_dedup_equals_full_shuffle(ray_session, alias_rows):
    """extract_with_graph_replace must equal latest_page_wins∘extract
    on a corpus dense with duplicates (many urls crawled 2-3 times)."""
    import ray.data as rd

    from twine_ray.stages.extract import (
        extract_text,
        extract_with_graph_replace,
        latest_page_wins,
    )

    rows, _ = synth_pages(30, seed=42, n_entities=N_ENT)
    # duplicate every third url with newer timestamps + changed content
    import datetime as dt

    extra = []
    for i, r in enumerate(rows[:30:3]):
        clone = dict(rows[(i * 7 + 1) % 30])
        clone["url"] = r["url"]
        clone["warc_ts"] = r["warc_ts"] + dt.timedelta(days=10 + i)
        extra.append(clone)
    corpus = rows + extra

    full = latest_page_wins(
        extract_text(rd.from_arrow(pages_table(corpus)))
    ).to_pandas()
    sparse = extract_with_graph_replace(
        rd.from_arrow(pages_table(corpus))
    ).to_pandas()

    cols = ["url", "warc_ts", "text", "title", "lang"]
    a = set(map(tuple, full[cols].itertuples(index=False, name=None)))
    b = set(map(tuple, sparse[cols].itertuples(index=False, name=None)))
    assert a == b


def test_dup_broadcast_valve_forces_full_shuffle(ray_session, monkeypatch):
    """VERDICT r2 #1: when the duplicated-url set exceeds
    DUP_BROADCAST_LIMIT, extract_with_graph_replace must auto-route to
    the full-shuffle latest-wins path (no driver collect) and produce
    the SAME output as the broadcast path."""
    import datetime as dt

    import ray.data as rd

    from twine_ray.stages import extract as ex

    rows, _ = synth_pages(24, seed=7, n_entities=N_ENT)
    extra = []
    for i, r in enumerate(rows[:24:2]):
        clone = dict(rows[(i * 5 + 1) % 24])
        clone["url"] = r["url"]
        clone["warc_ts"] = r["warc_ts"] + dt.timedelta(days=3 + i)
        extra.append(clone)
    corpus = rows + extra

    broadcast = ex.extract_with_graph_replace(
        rd.from_arrow(pages_table(corpus))
    ).to_pandas()

    # force the valve: any dup set now exceeds the "broadcast bound"
    monkeypatch.setattr(ex, "DUP_BROADCAST_LIMIT", 0)
    assert ex.duplicate_url_hashes(
        rd.from_arrow(pages_table(corpus))
    ) is None
    routed = ex.extract_with_graph_replace(
        rd.from_arrow(pages_table(corpus))
    ).to_pandas()

    cols = ["url", "warc_ts", "text", "title", "lang"]
    a = set(map(tuple, broadcast[cols].itertuples(index=False, name=None)))
    b = set(map(tuple, routed[cols].itertuples(index=False, name=None)))
    assert a == b and len(routed) == len(broadcast)


def test_kg_pr_larger_world(ray_session):
    """P/R gate at 5x the module corpus (400 pages / 200 entities —
    the generator's full alias-ambiguity surface): the 0.95 bar must
    hold as the world grows, not just on the small fixture."""
    import ray.data as rd

    rows, truths = synth_pages(400, seed=1234, n_entities=200)
    alias = alias_dict_table(seed=1234, n_entities=200).to_pylist()
    pages = rd.from_arrow(pages_table(rows))
    got = triples_df_to_set(
        kg_triples_dataset(pages, alias, concurrency=2).to_pandas()
    )
    want = expected_triples(truths)
    p, r = precision_recall(got, want)
    assert p >= 0.95, f"precision {p} on larger world"
    assert r >= 0.95, f"recall {r} on larger world"
