"""Checkpoint bucketing manifest (ADVICE.md round 1, medium): resume
must refuse to reinterpret _DONE markers under a different bucketing.
"""

from __future__ import annotations

import json
import os

import pytest

from twine_ray.state import checkpoint as ckpt


def test_manifest_written_and_matching_noop(tmp_path):
    out = str(tmp_path / "raw")
    params = {"num_buckets": 32, "scheme": "graph-bucket-v1"}
    ckpt.ensure_manifest(out, params)
    assert json.load(open(os.path.join(out, "_MANIFEST.json"))) == params
    ckpt.ensure_manifest(out, params)  # matching: no-op


def test_manifest_mismatch_refuses_resume(tmp_path):
    out = str(tmp_path / "raw")
    ckpt.ensure_manifest(out, {"num_buckets": 32, "scheme": "graph-bucket-v1"})
    ckpt.mark_done(out, [0, 1])
    with pytest.raises(ValueError, match="manifest mismatch"):
        ckpt.ensure_manifest(
            out, {"num_buckets": 16, "scheme": "graph-bucket-v1"}
        )
    # markers untouched by the refusal
    assert ckpt.done_buckets(out) == {0, 1}


def test_manifest_mismatch_reset_wipes_markers(tmp_path):
    out = str(tmp_path / "raw")
    ckpt.ensure_manifest(out, {"num_buckets": 32, "scheme": "graph-bucket-v1"})
    ckpt.mark_done(out, [0, 1])
    os.makedirs(os.path.join(out, "data", "__gb=0"))
    new = {"num_buckets": 16, "scheme": "graph-bucket-v1"}
    ckpt.ensure_manifest(out, new, reset=True)
    assert ckpt.done_buckets(out) == set()
    assert not os.path.isdir(os.path.join(out, "data"))
    assert json.load(open(os.path.join(out, "_MANIFEST.json"))) == new


def test_run_kg_pipeline_manifest_guard(ray_session, tmp_path):
    """End-to-end: rerunning with a different num_buckets under
    resume=True raises; resume=False resets and succeeds."""
    from twine_ray.pipelines.kg import default_alias_rows, run_kg_pipeline
    from twine_ray.sources.pages import synth_pages_dataset

    out = str(tmp_path / "kg")
    pages = synth_pages_dataset(60, concurrency=2)
    res1 = run_kg_pipeline(pages, out, default_alias_rows(),
                           num_buckets=8, concurrency=2, resume=False)
    assert res1["store"]["rows"] > 0

    with pytest.raises(ValueError, match="manifest mismatch"):
        run_kg_pipeline(
            synth_pages_dataset(60, concurrency=2), out,
            default_alias_rows(), num_buckets=16, concurrency=2,
            resume=True,
        )

    res2 = run_kg_pipeline(
        synth_pages_dataset(60, concurrency=2), out,
        default_alias_rows(), num_buckets=16, concurrency=2,
        resume=False,
    )
    assert res2["store"]["rows"] == res1["store"]["rows"]
