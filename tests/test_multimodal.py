"""Multimodal plumbing: schema, decode stub, resize, frame sampling."""

from __future__ import annotations

import pytest

from twine_ray.pipelines.multimodal import (
    FakeCodec,
    MediaResize,
    PillowCodec,
    encode_fake_media,
    synth_media_dataset,
)


def test_fake_codec_round_trip():
    payload = encode_fake_media(7, "image", 128, 96, 0)
    d = FakeCodec().decode(payload)
    assert (d["width"], d["height"], d["duration_ms"]) == (128, 96, 0)
    assert len(d["pixels"]) > 0
    # deterministic
    assert payload == encode_fake_media(7, "image", 128, 96, 0)


def test_pillow_codec_is_clearly_stubbed():
    with pytest.raises(NotImplementedError, match="Pillow"):
        PillowCodec()


def test_media_dataset_and_features(ray_session):
    from twine_ray.pipelines.multimodal import q_media_features

    df = q_media_features("unused", n_media=60).to_pandas()
    assert len(df) == 60
    assert "payload" not in df.columns  # dropped after decode
    imgs = df[df["kind"] == "image"]
    assert (imgs["aspect"] > 0).all()
    auds = df[df["kind"] == "audio"]
    assert (auds["aspect"] == 0).all()


def test_media_resize(ray_session):
    ds = synth_media_dataset(30)
    out = ds.map_batches(
        MediaResize,
        fn_constructor_kwargs={"width": 32, "height": 32},
        batch_format="pyarrow", batch_size=16, concurrency=(1, 2),
    ).to_pandas()
    assert (out["width"] == 32).all() and (out["height"] == 32).all()
    d = FakeCodec().decode(out["payload"].iloc[0])
    assert d["width"] == 32


def test_frame_sampling(ray_session):
    from twine_ray.pipelines.multimodal import q_media_frames

    df = q_media_frames("unused", n_media=30).to_pandas()
    n_videos = sum(1 for i in range(30) if i % 3 == 2)
    assert len(df) == n_videos * 4
    assert set(df["frame_idx"]) == {0, 1, 2, 3}
    g = df.groupby("media_id")["offset_ms"].apply(
        lambda s: s.is_monotonic_increasing
    )
    assert g.all()
