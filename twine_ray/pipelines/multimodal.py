"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (task-brief extra).

Media payloads are opaque ``binary`` columns with a typed header;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.  The sandbox has no image/audio libraries, so
the DECODE KERNEL is stubbed: ``PillowCodec`` raises a clearly-marked
``NotImplementedError`` unless PIL is importable, and the default
``FakeCodec`` is a deterministic stand-in (seeded bytes behind a real
header format) — the Ray-side plumbing (schema, batch sizing, actor
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
