"""CLI surface for the update handler (``twine -u`` analog,
VERDICT.md round-1 #8): one-bucket recompute through
``python -m twine_ray.cli update``.
"""

from __future__ import annotations

import json
import os


def test_cli_update_single_bucket(ray_session, tmp_path, capsys):
    from twine_ray import cli
    from twine_ray.state import checkpoint as ckpt

    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "kg")

    import ray.data as rd  # noqa: F401

    from twine_ray.sources.pages import synth_pages_dataset

    synth_pages_dataset(50, concurrency=2).write_parquet(pages_dir)

    rc = cli.main(["pages", pages_dir, "--out", out, "--buckets", "4"])
    assert rc == 0
    capsys.readouterr()
    raw = os.path.join(out, "raw")
    assert ckpt.done_buckets(raw) == {0, 1, 2, 3}
    lineage_before = {
        n: os.stat(os.path.join(raw, "_LINEAGE", n)).st_mtime_ns
        for n in os.listdir(os.path.join(raw, "_LINEAGE"))
    }

    rc = cli.main(["update", pages_dir, "--out", out, "--buckets", "4",
                   "-b", "2"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # same corpus: the bucket recomputes but the store is unchanged
    assert res["changed_buckets"] == []
    assert res["reput_triples"] == 0
    # exactly bucket 2's raw lineage was rewritten
    lineage_after = {
        n: os.stat(os.path.join(raw, "_LINEAGE", n)).st_mtime_ns
        for n in os.listdir(os.path.join(raw, "_LINEAGE"))
    }
    assert lineage_after["2.json"] != lineage_before["2.json"]
    for n in ("0.json", "1.json", "3.json"):
        assert lineage_after[n] == lineage_before[n]
    assert ckpt.done_buckets(raw) == {0, 1, 2, 3}


def test_cli_export_roundtrip(ray_session, tmp_path, capsys):
    """`export` dumps a store to each serialization; parsing the dumps
    back recovers the exact (s,p,o,lit,dt,lang) set."""
    import json

    import ray.data as rd

    from twine_ray.cli import main
    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.nquads import read_nquads
    from twine_ray.sources.pages import synth_pages_dataset
    from twine_ray.sources.rdfxml import parse_rdfxml
    from twine_ray.sources.turtle import parse_turtle
    from twine_ray.stages.materialize import read_triple_store

    out = str(tmp_path / "kg")
    run_kg_pipeline(synth_pages_dataset(20, concurrency=2), out,
                    default_alias_rows(), num_buckets=4, concurrency=2,
                    resume=False)
    store = f"{out}/store"
    want_df = read_triple_store(store).to_pandas()

    def key_set(rows):
        return {
            (r["subj"], r["pred"], str(r["obj"]), bool(r["obj_is_lit"]),
             r["obj_dt"], r["obj_lang"])
            for r in rows
        }

    want = key_set(want_df.to_dict("records"))

    nq_dir = str(tmp_path / "nq")
    assert main(["export", store, "--out", nq_dir]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == len(want_df)
    import glob

    back = read_nquads(sorted(glob.glob(f"{nq_dir}/part-*.nq"))).to_pandas()
    assert key_set(back.to_dict("records")) == want

    ttl = str(tmp_path / "dump.ttl")
    assert main(["export", store, "--format", "turtle", "--out", ttl]) == 0
    capsys.readouterr()
    assert key_set(parse_turtle(open(ttl).read())) == want

    xml = str(tmp_path / "dump.rdf")
    assert main(["export", store, "--format", "rdfxml", "--out", xml]) == 0
    capsys.readouterr()
    assert key_set(parse_rdfxml(open(xml).read())) == want
