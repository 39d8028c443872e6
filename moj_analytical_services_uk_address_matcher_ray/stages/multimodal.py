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


def sniff_media_header(payload: bytes) -> dict | None:
    """Container-header metadata from raw bytes — REAL parsing, no codec
    libraries: PNG IHDR width/height, JPEG SOF0/SOF2 dims, GIF logical
    screen, WAV fmt chunk (channels / sample rate / duration).  Returns
    ``None`` when no known magic matches (caller decides the fallback)."""
    b = payload or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return {"format": "png", "shape": [h, w, 3]}
    if b[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0..SOF3
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                ncomp = b[i + 9]
                return {"format": "jpeg", "shape": [h, w, ncomp]}
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            i += 2 + max(seg_len, 2)
        return None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return {"format": "gif", "shape": [h, w, 3]}
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 36:
        # walk RIFF chunks for fmt / data
        i, fmt, n_data = 12, None, None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            clen = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 24 <= len(b):
                channels = int.from_bytes(b[i + 10 : i + 12], "little")
                rate = int.from_bytes(b[i + 12 : i + 16], "little")
                bits = int.from_bytes(b[i + 22 : i + 24], "little")
                fmt = (channels, rate, bits)
            elif cid == b"data":
                n_data = clen
            i += 8 + clen + (clen & 1)
        if fmt:
            channels, rate, bits = fmt
            n_samples = (
                n_data // max(1, channels * max(1, bits // 8))
                if n_data is not None
                else 0
            )
            return {
                "format": "wav",
                "shape": [n_samples, channels],
                "sample_rate": rate,
            }
    return None


class MediaDecoder:
    """Actor-pool stage: decode -> feature-extract.

    ``__init__`` is where a real build would load the codec / model once per
    actor.  Modes:

    * ``"headers"`` — REAL container-header parsing (``sniff_media_header``:
      PNG/JPEG/GIF/WAV dims from the bytes themselves); rows whose magic is
      unknown fall back to the deterministic fake (counted in ``meta``).
      Full pixel/sample decode still needs codec libraries.
    * ``"auto"`` — import-try Pillow once per actor and use it for image
      rows when present (it is not in this container); otherwise behaves
      like ``"headers"``.
    * ``"fake"`` — deterministic fake decoder (the test default).
    * ``"strict"`` — fail loudly instead of faking.
    """

    def __init__(self, *, decode: str = "fake", feature_dim: int = 16):
        if decode not in ("fake", "strict", "headers", "auto"):
            raise ValueError(decode)
        self.decode = decode
        self.feature_dim = feature_dim
        self.pil = None
        if decode == "auto":
            try:  # once per actor — the actor-pool point
                import PIL.Image as pil  # noqa: F401

                self.pil = pil
            except ImportError:
                self.pil = None

    def _decode_one(self, payload: bytes, modality: str) -> dict:
        if self.decode in ("headers", "auto"):
            if self.pil is not None and modality == "image":
                import io

                try:
                    with self.pil.open(io.BytesIO(payload or b"")) as im:
                        h16 = hashlib.blake2b(
                            payload or b"", digest_size=16
                        ).digest()
                        rng = np.random.RandomState(int.from_bytes(h16[:4], "big"))
                        return {
                            "shape": [im.height, im.width, len(im.getbands())],
                            "checksum": h16.hex(),
                            "feature": rng.randn(16).astype(np.float32),
                        }
                except Exception:
                    pass
            sniffed = sniff_media_header(payload)
            if sniffed is not None:
                h16 = hashlib.blake2b(payload or b"", digest_size=16).digest()
                rng = np.random.RandomState(int.from_bytes(h16[:4], "big"))
                return {
                    "shape": sniffed["shape"],
                    "checksum": h16.hex(),
                    "feature": rng.randn(16).astype(np.float32),
                }
        return _fake_decode(payload, modality)

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
            d = self._decode_one(payload, modality)
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


def make_png_bytes(width: int, height: int) -> bytes:
    """Minimal valid PNG prefix (signature + IHDR) for header-sniff tests."""
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # bit depth 8, truecolor
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
    )


def make_wav_bytes(n_samples: int, *, rate: int = 16000, channels: int = 1) -> bytes:
    """Minimal valid WAV container (fmt + data chunks, silence payload)."""
    bits = 16
    data = b"\x00" * (n_samples * channels * (bits // 8))
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * bits // 8).to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def make_jpeg_bytes(width: int, height: int) -> bytes:
    """Minimal JPEG prefix: SOI + APP0 stub + SOF0 frame header."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof = (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3])
    )
    return b"\xff\xd8" + app0 + sof


def make_header_media_table(n: int, *, seed: int = 9) -> pa.Table:
    """Fixture whose payloads carry REAL container headers (PNG/WAV/JPEG)."""
    rng = np.random.RandomState(seed)
    ids, modality, payload, meta = [], [], [], []
    for i in range(n):
        kind = i % 3
        ids.append(f"media_{i:05d}")
        if kind == 0:
            modality.append("image")
            payload.append(
                make_png_bytes(16 + int(rng.randint(0, 100)), 16 + int(rng.randint(0, 100)))
            )
        elif kind == 1:
            modality.append("audio")
            payload.append(make_wav_bytes(1000 + int(rng.randint(0, 4000))))
        else:
            modality.append("image")
            payload.append(
                make_jpeg_bytes(8 + int(rng.randint(0, 50)), 8 + int(rng.randint(0, 50)))
            )
        meta.append('{"source":"synthetic-headers"}')
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "modality": pa.array(modality, pa.string()),
            "payload": pa.array(payload, pa.binary()),
            "meta": pa.array(meta, pa.string()),
        }
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
