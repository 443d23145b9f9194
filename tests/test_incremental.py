"""Incremental mode (SURVEY.md §2.4 J3/S5; VERDICT.md round-1 #6/#8):
mutate 2 pages, rerun incrementally, and verify only the affected
buckets were recomputed/replaced while the store equals a full
recompute.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mutate_titles(pages_tbl: pa.Table, n: int = 2):
    """Replace the <title>/<h1> text of the first n titled pages;
    returns (mutated table, changed urls)."""
    rows = pages_tbl.to_pylist()
    changed = []
    for r in rows:
        if len(changed) >= n:
            break
        if b"<title>" in r["html"]:
            r["html"] = r["html"].replace(b"<title>", b"<title>CHANGED ", 1)
            changed.append(r["url"])
    assert len(changed) == n
    return pa.Table.from_pylist(rows, schema=pages_tbl.schema), changed


@pytest.fixture(scope="module")
def incr_env(tmp_path_factory, ray_session):
    import ray.data as rd

    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import synth_pages_dataset

    root = tmp_path_factory.mktemp("incr")
    v1 = str(root / "pages_v1.parquet")
    v2 = str(root / "pages_v2.parquet")
    out = str(root / "out")
    ref = str(root / "ref")

    synth_pages_dataset(80, concurrency=2).write_parquet(v1)
    tbl = pq.read_table(v1)
    mutated, changed_urls = _mutate_titles(tbl, 2)
    pq.write_table(mutated, os.path.join(os.path.dirname(v2), "pages_v2.parquet"))

    aliases = default_alias_rows()
    run_kg_pipeline(rd.read_parquet(v1), out, aliases,
                    num_buckets=8, concurrency=2, resume=False)
    # reference: full recompute over the mutated corpus
    run_kg_pipeline(rd.read_parquet(v2), ref, aliases,
                    num_buckets=8, concurrency=2, resume=False)
    return {"v2": v2, "out": out, "ref": ref,
            "changed_urls": changed_urls, "aliases": aliases}


def _store_df(store_dir: str):
    from twine_ray.stages.materialize import read_triple_store

    df = read_triple_store(store_dir).to_pandas()
    df["graph_bucket"] = df["graph_bucket"].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _lineage_mtimes(store_dir: str) -> dict[str, float]:
    ld = os.path.join(store_dir, "_LINEAGE")
    return {
        n: os.stat(os.path.join(ld, n)).st_mtime_ns
        for n in os.listdir(ld) if n.endswith(".json")
    }


def test_incremental_equals_full_recompute(incr_env, ray_session):
    import pandas as pd
    import ray.data as rd

    from twine_ray.functions.ids import bucket_of
    from twine_ray.functions.urls import normalize_url
    from twine_ray.pipelines.kg import run_kg_incremental

    out = incr_env["out"]
    store = os.path.join(out, "store")
    raw = os.path.join(out, "raw")
    before_lineage = _lineage_mtimes(store)
    before_raw_lineage = _lineage_mtimes(raw)

    res = run_kg_incremental(
        rd.read_parquet(incr_env["v2"]), out, incr_env["aliases"],
        changed_urls=incr_env["changed_urls"],
        num_buckets=8, concurrency=2,
    )

    url_buckets = {
        bucket_of(normalize_url(u), 8) for u in incr_env["changed_urls"]
    }
    assert res["metrics"]["invalidated_raw_buckets"] == len(url_buckets)
    # something actually changed, but not everything
    assert 0 < len(res["changed_buckets"]) <= len(url_buckets)
    assert res["metrics"]["reput_triples"] > 0

    # store content equals the full recompute over the mutated corpus
    got = _store_df(store)
    want = _store_df(os.path.join(incr_env["ref"], "store"))
    pd.testing.assert_frame_equal(got, want)

    # ONLY the changed buckets' lineage was replaced (store + raw)
    after_lineage = _lineage_mtimes(store)
    changed_files = {f"{b}.json" for b in res["changed_buckets"]}
    for name, mtime in after_lineage.items():
        if name in changed_files:
            assert mtime != before_lineage.get(name)
        else:
            assert mtime == before_lineage[name]
    after_raw_lineage = _lineage_mtimes(raw)
    raw_changed = {f"{b}.json" for b in url_buckets}
    for name, mtime in after_raw_lineage.items():
        if name in raw_changed:
            assert mtime != before_raw_lineage.get(name)
        else:
            assert mtime == before_raw_lineage[name]


def test_incremental_noop_changes_nothing(incr_env, ray_session):
    """Re-running incrementally with the SAME corpus and a changed-url
    hint must rewrite the hinted raw bucket but swap zero store
    buckets (content signatures equal)."""
    import ray.data as rd

    from twine_ray.pipelines.kg import run_kg_incremental

    out = incr_env["out"]
    store = os.path.join(out, "store")
    before = _lineage_mtimes(store)
    res = run_kg_incremental(
        rd.read_parquet(incr_env["v2"]), out, incr_env["aliases"],
        changed_urls=incr_env["changed_urls"][:1],
        num_buckets=8, concurrency=2,
    )
    assert res["changed_buckets"] == []
    assert res["metrics"]["reput_triples"] == 0
    assert _lineage_mtimes(store) == before


def test_incremental_refuses_bucketing_mismatch(incr_env, ray_session):
    import ray.data as rd

    from twine_ray.pipelines.kg import run_kg_incremental

    with pytest.raises(ValueError, match="manifest mismatch"):
        run_kg_incremental(
            rd.read_parquet(incr_env["v2"]), incr_env["out"],
            incr_env["aliases"], changed_urls=[],
            num_buckets=16, concurrency=2,
        )


def test_store_lineage_carries_signatures(incr_env, ray_session):
    """VERDICT r2 #4: materialize(signatures=True) folds per-bucket
    content signatures into _LINEAGE; the cached reader returns them
    WITHOUT touching lineage files (no healing rewrite) and they equal
    a fresh scan."""
    from twine_ray.stages.materialize import (
        bucket_signatures_cached,
        read_lineage,
        signature_scan,
    )

    store = os.path.join(incr_env["out"], "store")
    recs = read_lineage(store)
    assert recs and all("sig1" in r and "sig2" in r for r in recs)
    before = _lineage_mtimes(store)
    cached = bucket_signatures_cached(store)
    assert _lineage_mtimes(store) == before  # lineage-only, no rewrite
    assert cached == signature_scan(store)


def test_partitioned_pages_source_prunes_and_matches(ray_session, tmp_path):
    """VERDICT r2 #6: the co-partitioned pages layout yields an
    identical store through the factory path, and a resumed/incremental
    phase 1 READS only the non-done partitions (pruned at the file
    list, not post-scan)."""
    import pandas as pd
    import ray.data as rd

    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import (
        partitioned_pages_source,
        read_pages_partitioned,
        synth_pages_dataset,
    )

    layout = str(tmp_path / "pages_parts")
    out_a = str(tmp_path / "out_plain")
    out_b = str(tmp_path / "out_pruned")
    pages = synth_pages_dataset(60, concurrency=2)
    from twine_ray.sources.pages import write_pages_partitioned

    write_pages_partitioned(pages, layout, num_buckets=8)

    all_rows = read_pages_partitioned(layout).count()
    assert all_rows == 60
    pruned = read_pages_partitioned(layout, skip_buckets=[0, 1]).count()
    assert pruned < all_rows

    aliases = default_alias_rows()
    run_kg_pipeline(synth_pages_dataset(60, concurrency=2), out_a, aliases,
                    num_buckets=8, concurrency=2, resume=False)
    src = partitioned_pages_source(layout)
    assert src.num_buckets == 8
    run_kg_pipeline(src, out_b, aliases,
                    num_buckets=8, concurrency=2, resume=False)
    a = _store_df(os.path.join(out_a, "store"))
    b = _store_df(os.path.join(out_b, "store"))
    pd.testing.assert_frame_equal(a, b)

    # bucketing mismatch refuses up front
    with pytest.raises(ValueError, match="bucketing"):
        run_kg_pipeline(src, str(tmp_path / "out_bad"), aliases,
                        num_buckets=16, concurrency=2, resume=False)
