"""Spindle-style per-proxy index (stages/index.py — VERDICT r2 #2).

The distributed index must equal the driver-side spec aggregation of
the same resolved triples, and its entity rows must reflect the
deterministic world (coreference member counts, mention degrees).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from twine_ray.pipelines.kg import default_alias_rows, kg_triples_dataset
from twine_ray.sources.pages import pages_table
from twine_ray.sources.world import synth_pages
from twine_ray.stages.index import proxy_index, proxy_index_spec
from twine_ray.state.rulebase import CANON_ROOT

N_ENT = 40


def _resolved_df_and_index(ray_session, n_pages=40):
    rows, truths = synth_pages(n_pages, seed=42, n_entities=N_ENT)
    pages = rd.from_arrow(pages_table(rows))
    resolved = kg_triples_dataset(
        pages, default_alias_rows(n_entities=N_ENT), concurrency=2
    ).materialize()
    got = (
        proxy_index(resolved)
        .to_pandas()
        .sort_values("subj")
        .reset_index(drop=True)
    )
    return resolved.to_pandas(), got, truths


def test_proxy_index_equals_spec(ray_session):
    resolved_df, got, truths = _resolved_df_and_index(ray_session)
    want = proxy_index_spec(resolved_df)
    pd.testing.assert_frame_equal(got, want)

    # structural checks against the world
    pages = got[got["kind"] == "page"]
    ents = got[got["kind"] == "entity"]
    urls = {t.url for t in truths}
    assert set(pages["subj"]) == urls
    # every page carries its winning title and modified timestamp
    by_subj = pages.set_index("subj")
    latest = {}
    for t in truths:
        if t.url not in latest or t.warc_ts > latest[t.url].warc_ts:
            latest[t.url] = t
    labelled = 0
    for url, t in latest.items():
        # variant page_id%4==3 renders no <title>; its label is ''
        lbl = by_subj.loc[url, "label"]
        assert lbl in (t.title, "")
        labelled += lbl == t.title
        assert by_subj.loc[url, "modified"] == t.warc_ts.isoformat()
        assert by_subj.loc[url, "n_members"] == 0
    assert labelled >= 0.7 * len(latest)  # ~3/4 of variants have titles
    # entity proxies: classes >= 2 use canon URIs and report their
    # member count; mentions point at them
    multi = ents[ents["subj"].str.startswith(CANON_ROOT)]
    assert (multi["n_members"] >= 2).all()
    assert (ents["n_members"] >= 1).all()
    total_mentions = int(ents["n_mentioned_by"].sum())
    assert total_mentions == int(pages["n_mentions_out"].sum()) > 0


def test_proxy_index_parallelism_invariant(ray_session):
    """Index content is identical under different partitionings and
    bucket counts (associative merge)."""
    rows, _ = synth_pages(24, seed=7, n_entities=N_ENT)
    pages = rd.from_arrow(pages_table(rows))
    resolved = kg_triples_dataset(
        pages, default_alias_rows(n_entities=N_ENT), concurrency=2
    ).materialize()
    a = (
        proxy_index(resolved, num_buckets=64)
        .to_pandas().sort_values("subj").reset_index(drop=True)
    )
    b = (
        proxy_index(resolved.repartition(13), num_buckets=5)
        .to_pandas().sort_values("subj").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_pipeline_write_index(ray_session, tmp_path):
    """run_kg_pipeline(write_index=True) writes the per-proxy index
    next to the store, equal to proxy_index over the store content."""
    import ray.data as rd

    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import synth_pages_dataset
    from twine_ray.stages.materialize import read_triple_store

    out = str(tmp_path / "kg")
    res = run_kg_pipeline(
        synth_pages_dataset(24, concurrency=2), out,
        default_alias_rows(), num_buckets=4, concurrency=2,
        resume=False, write_index=True,
    )
    import os

    idx = rd.read_parquet(os.path.join(out, "index")).to_pandas() \
        .sort_values("subj").reset_index(drop=True)
    assert res["metrics"]["index_rows"] == len(idx)
    want = proxy_index_spec(
        read_triple_store(os.path.join(out, "store"))
        .drop_columns(["graph_bucket"]).to_pandas()
    )
    pd.testing.assert_frame_equal(idx[want.columns.tolist()], want)
