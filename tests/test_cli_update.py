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
