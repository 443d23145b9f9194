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


# --- REAL codecs (BMP / WAV — no external libs needed) ---


def test_bmp_roundtrip_random_images():
    """Encode/decode round-trips exactly, including odd widths whose
    rows need 4-byte padding."""
    import numpy as np

    from twine_ray.pipelines.multimodal import BmpCodec

    rng = np.random.default_rng(11)
    for w, h in ((1, 1), (2, 3), (5, 4), (7, 7), (33, 17)):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = BmpCodec.decode(BmpCodec.encode(img))
        assert back.shape == (h, w, 3)
        assert (back == img).all()


def test_bmp_spec_layout():
    """The encoded bytes are a spec-conformant 24-bit BMP: magic,
    54-byte data offset, bottom-up BGR rows with padding."""
    import numpy as np
    import struct

    from twine_ray.pipelines.multimodal import BmpCodec

    img = np.zeros((2, 3, 3), dtype=np.uint8)
    img[0, 0] = (1, 2, 3)    # top-left RGB
    img[1, 2] = (9, 8, 7)    # bottom-right
    b = BmpCodec.encode(img)
    assert b[:2] == b"BM"
    (_m, size, _r1, _r2, off) = struct.unpack_from("<2sIHHI", b, 0)
    assert off == 54 and size == len(b)
    row = (3 * 3 + 3) & ~3  # 12 bytes, padded from 9
    # bottom row first: bottom-right pixel at row offset 2*3 bytes, BGR
    assert tuple(b[54 + 6:54 + 9]) == (7, 8, 9)
    # top row second
    assert tuple(b[54 + row:54 + row + 3]) == (3, 2, 1)


def test_nn_resize_matches_reference():
    import numpy as np

    from twine_ray.pipelines.multimodal import BmpCodec

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    got = BmpCodec.resize_nn(img, 5, 4)
    want = np.empty((4, 5, 3), dtype=np.uint8)
    for y2 in range(4):
        for x2 in range(5):
            want[y2, x2] = img[(y2 * 10) // 4, (x2 * 14) // 5]
    assert (got == want).all()


def test_wav_roundtrip():
    import numpy as np

    from twine_ray.pipelines.multimodal import WavCodec

    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    back, rate = WavCodec.decode(WavCodec.encode(s))
    assert rate == WavCodec.RATE
    assert (back == s).all()


def test_image_stats_stage_equals_numpy(ray_session):
    import numpy as np

    from twine_ray.pipelines.multimodal import (
        make_image,
        q_media_image_stats,
        q_media_resize_stats,
        BmpCodec,
    )

    df = q_media_image_stats("unused", n_media=20).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert list(df["media_id"]) == [i for i in range(20) if i % 2 == 0]
    for _, r in df.iterrows():
        img = make_image(int(r["media_id"]))
        s = img.astype(np.int64).sum(axis=(0, 1))
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(s)
        assert (r["height"], r["width"]) == img.shape[:2]
    rf = q_media_resize_stats("unused", n_media=20).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for _, r in rf.iterrows():
        img = BmpCodec.resize_nn(make_image(int(r["media_id"])), 32, 24)
        s = img.astype(np.int64).sum(axis=(0, 1))
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(s)


def test_audio_stats_stage_equals_numpy(ray_session):
    import numpy as np

    from twine_ray.pipelines.multimodal import (
        make_audio,
        q_media_audio_stats,
    )

    df = q_media_audio_stats("unused", n_media=20).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert list(df["media_id"]) == [i for i in range(20) if i % 2 == 1]
    for _, r in df.iterrows():
        s = np.abs(make_audio(int(r["media_id"])).astype(np.int64))
        assert int(r["n_samples"]) == len(s)
        assert int(r["sum_abs"]) == int(s.sum())
        assert int(r["peak"]) == int(s.max())
