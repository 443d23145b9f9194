"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (task-brief extra).

Media payloads are opaque ``binary`` columns with a typed header;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.  Two codec tiers:

- **REAL codecs** (bottom of this module): 24-bit BMP images decoded/
  encoded/nearest-neighbor-resized in pure numpy (``BmpCodec``) and
  PCM16 WAV audio via the stdlib ``wave`` module (``WavCodec``) — the
  payload bytes are spec-conformant files, the kernels are actual
  format parsers, and the extracted statistics are SQL-oracled exact
  (media_image_stats / media_resize_stats / media_audio_stats).
- Compressed formats (JPEG/MP4) need libraries the sandbox does not
  ship: ``PillowCodec`` raises a clearly-marked ``NotImplementedError``
  unless PIL is importable, and the default ``FakeCodec`` is a
  deterministic stand-in (seeded bytes behind a real header format) —
  for those, the Ray-side plumbing (schema, batch sizing, actor
  signatures, output layout) is real and tested.

Memory note (SURVEY.md §4): media rows are orders of magnitude wider
than text rows — these stages use SMALL ``batch_size`` (64) so
batch x concurrency stays inside a worker heap, and the payload column
is dropped as soon as features are extracted.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa


from twine_ray.state.broadcast import pool
MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),  # 0 when n/a
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),  # 0 for still images
    ]
)

_MAGIC = b"TRM0"
_HDR = struct.Struct(">4sHHI")  # magic, width, height, duration_ms


def encode_fake_media(media_id: int, kind: str, width: int, height: int,
                      duration_ms: int, seed: int = 42) -> bytes:
    """Deterministic fake payload: real header + seeded body bytes."""
    body_len = min(4096, max(64, width * height // 64))
    key = f"{seed}:{media_id}:{kind}".encode()
    body = hashlib.blake2b(key, digest_size=32).digest()
    body = (body * (body_len // 32 + 1))[:body_len]
    return _HDR.pack(_MAGIC, width, height, duration_ms) + body


class FakeCodec:
    """Deterministic stand-in decoder for the sandbox (no PIL/ffmpeg).

    'Pixels' are the seeded body bytes; features derived from them are
    pure functions of the payload, so every stage stays replay-safe.
    """

    def decode(self, payload: bytes) -> dict:
        magic, width, height, duration = _HDR.unpack_from(payload, 0)
        if magic != _MAGIC:
            raise ValueError("bad media header")
        body = np.frombuffer(payload[_HDR.size:], dtype=np.uint8)
        return {
            "width": width, "height": height, "duration_ms": duration,
            "pixels": body,
        }

    def resize_payload(self, payload: bytes, width: int, height: int) -> bytes:
        d = self.decode(payload)
        n = min(4096, max(64, width * height // 64))
        body = d["pixels"].tobytes()
        body = (body * (n // max(1, len(body)) + 1))[:n]
        return _HDR.pack(_MAGIC, width, height, d["duration_ms"]) + body


class PillowCodec:
    """Real image decode path — requires PIL, which this container does
    not ship.  STUB: raises NotImplementedError with guidance."""

    def __init__(self) -> None:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "PillowCodec needs the 'Pillow' package (not available "
                "in this sandbox) — use FakeCodec, or install Pillow in "
                "production and pass codec='pillow'."
            ) from e

    def decode(self, payload: bytes) -> dict:  # pragma: no cover
        raise NotImplementedError("real decode not available in sandbox")


def _codec(name: str):
    return PillowCodec() if name == "pillow" else FakeCodec()


def synth_media_dataset(n_media: int, seed: int = 42):
    """Distributed deterministic media table (MEDIA_SCHEMA)."""
    import ray.data as rd

    def _gen(batch: dict) -> pa.Table:
        rows = []
        kinds = ("image", "audio", "video")
        for i in batch["id"].tolist():
            i = int(i)
            kind = kinds[i % 3]
            width = 0 if kind == "audio" else 64 + (i % 8) * 32
            height = 0 if kind == "audio" else 64 + (i % 5) * 48
            duration = 0 if kind == "image" else 1000 + (i % 60) * 500
            rows.append(
                {
                    "media_id": i,
                    "kind": kind,
                    "payload": encode_fake_media(
                        i, kind, width, height, duration, seed
                    ),
                    "width": width,
                    "height": height,
                    "duration_ms": duration,
                }
            )
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return rd.range(n_media).map_batches(
        _gen, batch_format="numpy", batch_size=256
    )


class MediaFeatures:
    """Actor-pool stage: payload -> feature row (payload dropped)."""

    def __init__(self, codec: str = "fake") -> None:
        self.codec = _codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "media_id": [], "kind": [], "n_bytes": [], "mean_val": [],
            "std_val": [], "aspect": [],
        }
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            d = self.codec.decode(payload)
            px = d["pixels"].astype(np.float64)
            out["media_id"].append(mid)
            out["kind"].append(kind)
            out["n_bytes"].append(len(payload))
            out["mean_val"].append(round(float(px.mean()), 6))
            out["std_val"].append(round(float(px.std()), 6))
            out["aspect"].append(
                round(d["width"] / d["height"], 6) if d["height"] else 0.0
            )
        return pa.Table.from_pydict(out)


class MediaResize:
    """Actor-pool stage: re-encode payloads at a target size."""

    def __init__(self, width: int, height: int, codec: str = "fake") -> None:
        self.codec = _codec(codec)
        self.width, self.height = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [
            self.codec.resize_payload(p, self.width, self.height)
            for p in batch["payload"].to_pylist()
        ]
        i = batch.schema.get_field_index("payload")
        batch = batch.set_column(i, "payload",
                                 pa.array(payloads, type=pa.binary()))
        w = batch.schema.get_field_index("width")
        batch = batch.set_column(
            w, "width",
            pa.array([self.width] * batch.num_rows, type=pa.int32()),
        )
        h = batch.schema.get_field_index("height")
        return batch.set_column(
            h, "height",
            pa.array([self.height] * batch.num_rows, type=pa.int32()),
        )


class FrameSampler:
    """Actor-pool stage: sample k deterministic frame offsets per video
    (flat_map shape: one video row -> k frame rows)."""

    def __init__(self, k: int = 4, codec: str = "fake") -> None:
        self.codec = _codec(codec)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "offset_ms": [],
               "frame_hash": []}
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            d = self.codec.decode(payload)
            dur = d["duration_ms"]
            for j in range(self.k):
                off = (dur * j) // self.k
                fh = hashlib.blake2b(
                    payload + off.to_bytes(4, "big"), digest_size=8
                ).hexdigest()
                out["media_id"].append(mid)
                out["frame_idx"].append(j)
                out["offset_ms"].append(off)
                out["frame_hash"].append(fh)
        return pa.Table.from_pydict(out)


def q_media_features(sf_dir: str, n_media: int = 300):
    """Feature extraction over the synthetic media table (rows-only:
    the media table is engine-generated, not a DuckDB view)."""
    ds = synth_media_dataset(n_media)
    return ds.map_batches(
        MediaFeatures, batch_format="pyarrow", batch_size=64,
        concurrency=pool(8),
    )


def q_media_frames(sf_dir: str, n_media: int = 300):
    """Frame sampling over videos (rows-only)."""
    ds = synth_media_dataset(n_media)
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=64,
        concurrency=pool(8),
    )


def q_media_meta(sf_dir: str, n_media: int = 300):
    """SQL-ORACLED metadata slice of the media plumbing: the typed
    header fields plus the REAL payload byte length, decoded from the
    binary column by the actor-pool feature stage — DuckDB reconstructs
    them from ``generate_series`` (the media table is a pure function
    of media_id), so this green row pins the binary encode/decode
    plumbing, not just row counts."""
    import pyarrow.compute as pc

    ds = synth_media_dataset(n_media)

    def _meta(batch: pa.Table) -> pa.Table:
        lens = pc.cast(pc.binary_length(batch["payload"]), pa.int64())
        return pa.Table.from_pydict(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "width": pc.cast(batch["width"], pa.int64()),
                "height": pc.cast(batch["height"], pa.int64()),
                "duration_ms": pc.cast(batch["duration_ms"], pa.int64()),
                "n_bytes": lens,
            }
        )

    return ds.map_batches(_meta, batch_format="pyarrow", batch_size=64)


def q_media_frame_offsets(sf_dir: str, n_media: int = 300, k: int = 4):
    """SQL-ORACLED frame-offset slice of the sampler: (media_id,
    frame_idx, offset_ms) per video — offsets are integer arithmetic
    on the decoded duration (the hash column stays rows-only)."""
    ds = q_media_frames(sf_dir, n_media)

    def _proj(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_pydict(
            {
                "media_id": pc.cast(batch["media_id"], pa.int64()),
                "frame_idx": pc.cast(batch["frame_idx"], pa.int64()),
                "offset_ms": pc.cast(batch["offset_ms"], pa.int64()),
            }
        )

    return ds.map_batches(_proj, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# REAL codecs — formats decodable with numpy/stdlib only (no PIL/ffmpeg)
#
# The generic media pipeline above uses FakeCodec because JPEG/MP4
# need libraries this sandbox does not ship.  BMP (24-bit,
# uncompressed) and WAV (PCM16) need NOTHING beyond struct/numpy and
# the stdlib ``wave`` module — so for these formats the decode,
# feature-extract and resize kernels below are REAL: the payload bytes
# are spec-conformant files any external tool can open, and the
# synthetic pixel/sample generators are closed-form integer functions
# of media_id, which makes the extracted statistics SQL-oracle-able
# bit-for-bit (media_image_stats / media_resize_stats /
# media_audio_stats).
# ---------------------------------------------------------------------------


class BmpCodec:
    """24-bit uncompressed BMP encode/decode in pure numpy.

    Layout per the BITMAPINFOHEADER spec: 14-byte file header,
    40-byte info header, pixel rows bottom-up in BGR order, each row
    padded to a 4-byte boundary."""

    @staticmethod
    def encode(img: np.ndarray) -> bytes:
        h, w, c = img.shape
        if c != 3 or img.dtype != np.uint8:
            raise ValueError("need (H, W, 3) uint8")
        row_size = (w * 3 + 3) & ~3
        data_size = row_size * h
        rows = np.zeros((h, row_size), dtype=np.uint8)
        # bottom-up, BGR
        rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
        file_header = struct.pack("<2sIHHI", b"BM", 54 + data_size,
                                  0, 0, 54)
        info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                                  data_size, 2835, 2835, 0, 0)
        return file_header + info_header + rows.tobytes()

    @staticmethod
    def decode(payload: bytes) -> np.ndarray:
        magic, _size, _r1, _r2, off = struct.unpack_from("<2sIHHI",
                                                         payload, 0)
        if magic != b"BM":
            raise ValueError("not a BMP payload")
        (hdr_sz, w, h, _planes, bpp, comp, _dsz, _xp, _yp, _cu,
         _ci) = struct.unpack_from("<IiiHHIIiiII", payload, 14)
        if hdr_sz != 40 or bpp != 24 or comp != 0:
            raise ValueError("unsupported BMP variant")
        row_size = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_size * h, offset=off
        ).reshape(h, row_size)
        img = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
        return np.ascontiguousarray(img)

    @staticmethod
    def resize_nn(img: np.ndarray, w2: int, h2: int) -> np.ndarray:
        """Nearest-neighbor resize: src index = (dst * src_dim) //
        dst_dim — pure integer index math (matches the SQL oracle)."""
        h, w, _ = img.shape
        ys = (np.arange(h2, dtype=np.int64) * h) // h2
        xs = (np.arange(w2, dtype=np.int64) * w) // w2
        return img[ys][:, xs]


class WavCodec:
    """PCM16 mono WAV encode/decode via the stdlib ``wave`` module."""

    RATE = 8000

    @classmethod
    def encode(cls, samples: np.ndarray) -> bytes:
        import io
        import wave

        if samples.dtype != np.int16:
            raise ValueError("need int16 samples")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(cls.RATE)
            wv.writeframes(samples.tobytes())
        return buf.getvalue()

    @staticmethod
    def decode(payload: bytes) -> tuple[np.ndarray, int]:
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as wv:
            rate = wv.getframerate()
            n = wv.getnframes()
            raw = wv.readframes(n)
        return np.frombuffer(raw, dtype=np.int16), rate


# deterministic closed-form generators (integer, SQL-reconstructible)

def _image_params(media_id: int) -> tuple[int, int, int, int, tuple]:
    """(width, height, a, b, (c_r, c_g, c_b)); channel value at (x, y)
    = a*x + b*y + c_ch, all < 256 by construction."""
    i = int(media_id)
    w = 16 + (i % 8) * 8        # <= 72
    h = 16 + ((i // 2) % 5) * 12  # <= 64
    a = i % 3                   # <= 2
    b = (i // 3) % 2            # <= 1
    cs = tuple((i + 83 * ch) % 50 for ch in range(3))
    # max value: 2*71 + 1*63 + 49 = 254 < 256 (no modulo wrap)
    return w, h, a, b, cs


def make_image(media_id: int) -> np.ndarray:
    w, h, a, b, cs = _image_params(media_id)
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    base = a * x[None, :] + b * y[:, None]  # (h, w)
    img = np.stack([base + c for c in cs], axis=2)
    return img.astype(np.uint8)


def _audio_params(media_id: int) -> int:
    return 1000 + (int(media_id) % 7) * 500  # n_samples <= 4000


def make_audio(media_id: int) -> np.ndarray:
    i = int(media_id)
    n = _audio_params(i)
    t = np.arange(n, dtype=np.int64)
    return (((i * 31 + t * 17) % 199) - 99).astype(np.int16)


def synth_real_media_dataset(n_media: int):
    """Media table whose payloads are REAL files: BMP for even ids,
    WAV for odd ids."""
    import ray.data as rd

    def _gen(batch: dict) -> pa.Table:
        rows = []
        for i in batch["id"].tolist():
            i = int(i)
            if i % 2 == 0:
                img = make_image(i)
                rows.append({
                    "media_id": i, "kind": "image",
                    "payload": BmpCodec.encode(img),
                    "width": img.shape[1], "height": img.shape[0],
                    "duration_ms": 0,
                })
            else:
                s = make_audio(i)
                rows.append({
                    "media_id": i, "kind": "audio",
                    "payload": WavCodec.encode(s),
                    "width": 0, "height": 0,
                    "duration_ms": len(s) * 1000 // WavCodec.RATE,
                })
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return rd.range(n_media).map_batches(
        _gen, batch_format="numpy", batch_size=128
    )


class ImageStats:
    """Actor-pool stage: REAL BMP decode -> per-channel pixel sums
    (exact int64; payload dropped)."""

    def __init__(self, resize_to: tuple | None = None) -> None:
        self.codec = BmpCodec()
        self.resize_to = resize_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "width": [], "height": [],
               "sum_r": [], "sum_g": [], "sum_b": []}
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "image":
                continue
            img = self.codec.decode(payload)
            if self.resize_to is not None:
                img = self.codec.resize_nn(img, *self.resize_to)
            s = img.astype(np.int64).sum(axis=(0, 1))
            out["media_id"].append(int(mid))
            out["height"].append(int(img.shape[0]))
            out["width"].append(int(img.shape[1]))
            out["sum_r"].append(int(s[0]))
            out["sum_g"].append(int(s[1]))
            out["sum_b"].append(int(s[2]))
        return pa.Table.from_pydict(
            out,
            schema=pa.schema([
                ("media_id", pa.int64()), ("width", pa.int64()),
                ("height", pa.int64()), ("sum_r", pa.int64()),
                ("sum_g", pa.int64()), ("sum_b", pa.int64()),
            ]),
        )


class AudioStats:
    """Actor-pool stage: REAL WAV decode -> sample count + exact
    integer amplitude sums."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "n_samples": [], "sum_abs": [],
               "peak": []}
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "audio":
                continue
            samples, _rate = WavCodec.decode(payload)
            a = np.abs(samples.astype(np.int64))
            out["media_id"].append(int(mid))
            out["n_samples"].append(int(len(samples)))
            out["sum_abs"].append(int(a.sum()))
            out["peak"].append(int(a.max()) if len(a) else 0)
        return pa.Table.from_pydict(
            out,
            schema=pa.schema([
                ("media_id", pa.int64()), ("n_samples", pa.int64()),
                ("sum_abs", pa.int64()), ("peak", pa.int64()),
            ]),
        )


RESIZE_W, RESIZE_H = 32, 24


def q_media_image_stats(sf_dir: str, n_media: int = 300):
    """SQL-ORACLED real-image kernel: BMP bytes decoded by BmpCodec,
    per-channel pixel sums — closed-form integers DuckDB reconstructs
    from the gradient parameters."""
    ds = synth_real_media_dataset(n_media)
    return ds.map_batches(
        ImageStats, batch_format="pyarrow", batch_size=64,
        concurrency=pool(8),
    )


def q_media_resize_stats(sf_dir: str, n_media: int = 300):
    """SQL-ORACLED real nearest-neighbor resize: decode -> resize to
    32x24 (src = (dst*src_dim)//dst_dim) -> per-channel sums; the
    oracle evaluates the same separable integer index sums."""
    ds = synth_real_media_dataset(n_media)
    return ds.map_batches(
        ImageStats, fn_constructor_kwargs={
            "resize_to": (RESIZE_W, RESIZE_H)
        },
        batch_format="pyarrow", batch_size=64, concurrency=pool(8),
    )


def q_media_audio_stats(sf_dir: str, n_media: int = 300):
    """SQL-ORACLED real WAV kernel: PCM16 samples decoded by the
    stdlib wave reader, exact integer amplitude sums."""
    ds = synth_real_media_dataset(n_media)
    return ds.map_batches(
        AudioStats, batch_format="pyarrow", batch_size=64,
        concurrency=pool(8),
    )
