"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode libraries (Pillow, ffmpeg, torchaudio) are NOT in this container,
so the decode kernels are stubbed: ``decode="strict"`` raises
``NotImplementedError`` at the decode call site, while the default
``decode="fake"`` substitutes a deterministic fake decoder (shape + checksum
derived from the bytes) so the Ray-side plumbing — schema, batch sizing,
actor-pool signature, output layout — is real and testable end-to-end.

Scale notes baked into the API:
  * binary payloads make rows wide -> default ``batch_size`` is SMALL (64)
    so batch x concurrency fits worker heaps;
  * decode stages are actor pools (model/codec init happens once per actor);
  * outputs carry (media_id, modality, meta struct, feature vector) and DROP
    the raw bytes, so everything downstream is narrow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("modality", pa.string()),  # "image" | "audio" | "video"
        pa.field("payload", pa.binary()),
        pa.field("meta", pa.string()),  # JSON metadata
    ]
)


def _fake_decode(payload: bytes, modality: str) -> dict:
    """Deterministic stand-in for a real decoder: derives a stable pseudo
    shape and feature vector from the payload bytes."""
    h = hashlib.blake2b(payload or b"", digest_size=16).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    if modality == "image":
        shape = (32 + h[4] % 64, 32 + h[5] % 64, 3)
    elif modality == "audio":
        shape = (8000 + int.from_bytes(h[4:6], "big") % 8000,)
    else:
        shape = (4 + h[4] % 12, 32, 32, 3)
    feat = rng.randn(16).astype(np.float32)
    return {"shape": list(shape), "checksum": h.hex(), "feature": feat}


class MediaDecoder:
    """Actor-pool stage: decode -> feature-extract.

    ``__init__`` is where a real build would load the codec / model once per
    actor.  ``decode='strict'`` marks the unimplemented real path clearly.
    """

    def __init__(self, *, decode: str = "fake", feature_dim: int = 16):
        if decode not in ("fake", "strict"):
            raise ValueError(decode)
        self.decode = decode
        self.feature_dim = feature_dim

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.decode == "strict":
            raise NotImplementedError(
                "real image/audio decode requires Pillow/ffmpeg, which are not "
                "available in this environment; use decode='fake' for plumbing"
            )
        ids, mods, shapes, checks, feats = [], [], [], [], []
        for i in range(t.num_rows):
            payload = t["payload"][i].as_py()
            modality = t["modality"][i].as_py()
            d = _fake_decode(payload, modality)
            ids.append(t["media_id"][i].as_py())
            mods.append(modality)
            shapes.append(d["shape"])
            checks.append(d["checksum"])
            feats.append([float(x) for x in d["feature"]])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "modality": pa.array(mods, pa.string()),
                "shape": pa.array(shapes, pa.list_(pa.int32())),
                "payload_checksum": pa.array(checks, pa.string()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def decode_media(
    ds: "ray.data.Dataset",
    *,
    decode: str = "fake",
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Binary-payload decode stage: small batches (wide rows), actor pool."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def make_fake_media_table(n: int, *, seed: int = 5) -> pa.Table:
    """Deterministic binary-column fixture for the plumbing tests."""
    rng = np.random.RandomState(seed)
    mods = ["image", "audio", "video"]
    ids, modality, payload, meta = [], [], [], []
    for i in range(n):
        m = mods[i % 3]
        ids.append(f"media_{i:05d}")
        modality.append(m)
        payload.append(rng.bytes(64 + int(rng.randint(0, 256))))
        meta.append('{"source":"synthetic"}')
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "modality": pa.array(modality, pa.string()),
            "payload": pa.array(payload, pa.binary()),
            "meta": pa.array(meta, pa.string()),
        }
    )
