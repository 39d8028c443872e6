"""Stdlib-only GIF codec (GIF87a/89a) — the video-adjacent modality.

A training corpus's "video" rows in this container can't be decoded (no
codec libraries), but animated GIF — frames, per-frame delays, palette
compositing — IS fully decodable from public spec with numpy + bit
twiddling, which makes the FRAME-SAMPLING pipeline shape real end-to-end:
binary column -> per-frame pixels -> per-frame features/checksums.

Scope:
  decode_gif : logical screen + global/local colour tables, interlaced
      images, graphic-control extensions (delay, transparency, disposal
      methods 0/1 keep, 2 restore-background, 3 restore-previous), full
      variable-width LZW.  Returns ``(frames (n, h, w, 3) uint8, delays
      list[int] in 10ms units)``.
  encode_gif : minimal GIF89a writer for fixtures (global palette built
      from the frames' distinct colours, <=256; LZW-encoded with periodic
      clear codes).  GIF is LOSSLESS indexed colour, so fixtures
      round-trip EXACTLY whenever they use <=256 distinct colours.

The LZW code loop is per-symbol Python (inherently sequential);
palette application and compositing are numpy.  Like JPEG, per-payload
decode parallelises flat across actors at corpus scale.
"""
from __future__ import annotations

import numpy as np


class _BitStream:
    """LSB-first bit reader (GIF packs LZW codes little-endian)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                return -1  # truncated stream: caller stops
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF LZW -> index array of length <= n_pixels."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bs = _BitStream(data)
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    def reset():
        return (
            {i: (i,) for i in range(clear)},
            clear + 2,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: tuple | None = None
    while n_out < n_pixels:
        code = bs.read(width)
        if code < 0 or code == eoi:
            break
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = entry[:take]
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_out]


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4),
         np.arange(1, h, 2)]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out.reshape(-1)


def decode_gif(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """Decode every frame: ``(frames (n, H, W, 3) uint8, delays)``."""
    b = payload or b""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    W = int.from_bytes(b[6:8], "little")
    H = int.from_bytes(b[8:10], "little")
    flags = b[10]
    bg_index = b[11]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[i : i + 3 * n], np.uint8).reshape(n, 3)
        i += 3 * n
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
    background = canvas.copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    delay = 0
    disposal = 0
    while i < len(b):
        block = b[i]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[i + 1]
            i += 2
            if label == 0xF9:  # graphic control
                sz = b[i]
                packed = b[i + 1]
                delay = int.from_bytes(b[i + 2 : i + 4], "little")
                transparent = b[i + 4] if packed & 1 else None
                disposal = (packed >> 2) & 0x7
                i += sz + 1
            while b[i] != 0:  # skip (remaining) sub-blocks
                i += b[i] + 1
            i += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x} at {i}")
        left = int.from_bytes(b[i + 1 : i + 3], "little")
        top = int.from_bytes(b[i + 3 : i + 5], "little")
        w = int.from_bytes(b[i + 5 : i + 7], "little")
        h = int.from_bytes(b[i + 7 : i + 9], "little")
        iflags = b[i + 9]
        i += 10
        table = gct
        if iflags & 0x80:  # local colour table
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(b[i : i + 3 * n], np.uint8).reshape(n, 3)
            i += 3 * n
        if table is None:
            raise ValueError("GIF image with no colour table")
        min_code = b[i]
        i += 1
        data = bytearray()
        while b[i] != 0:
            n = b[i]
            data += b[i + 1 : i + 1 + n]
            i += 1 + n
        i += 1
        idx = _lzw_decode(min_code, bytes(data), w * h)
        if len(idx) < w * h:  # pad truncated streams with the bg index
            idx = np.pad(idx, (0, w * h - len(idx)))
        if iflags & 0x40:
            idx = _deinterlace(idx, h, w)
        region = idx.reshape(h, w)
        prev_canvas = canvas.copy() if disposal == 3 else None
        rgb = table[np.minimum(region, len(table) - 1)]
        target = canvas[top : top + h, left : left + w]
        if transparent is not None:
            mask = region != transparent
            target[mask] = rgb[mask]
        else:
            target[:, :] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore background in the frame's region
            canvas[top : top + h, left : left + w] = background[
                top : top + h, left : left + w
            ]
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        transparent = None
        delay = 0
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames), delays


def encode_gif(
    frames: "np.ndarray | list[np.ndarray]", *, delays: list[int] | None = None
) -> bytes:
    """Minimal GIF89a writer: one GLOBAL palette over all frames' distinct
    colours (<= 256 required — raises otherwise), full frames, LZW with a
    clear code before every pixel-code-width overflow.  Lossless for any
    input within the palette budget."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim == 3:
        fr = fr[None]
    n, h, w, ch = fr.shape
    if ch != 3:
        raise ValueError("encode_gif expects RGB frames")
    flat = fr.reshape(-1, 3)
    colours, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colours) > 256:
        raise ValueError(f"encode_gif: {len(colours)} distinct colours > 256")
    # palette size = power of two >= max(2, n_colours)
    bits = max(1, int(np.ceil(np.log2(max(2, len(colours))))))
    psize = 1 << bits
    palette = np.zeros((psize, 3), np.uint8)
    palette[: len(colours)] = colours
    idx_frames = inverse.astype(np.uint16).reshape(n, h * w)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag+size, bg 0, no aspect
    out += palette.tobytes()
    min_code = max(2, bits)
    clear = 1 << min_code
    eoi = clear + 1
    delays = delays or [10] * n
    for f in range(n):
        out += bytes([0x21, 0xF9, 4, 0])  # GCE: no disposal/transparency
        out += int(delays[f]).to_bytes(2, "little") + bytes([0, 0])
        out += bytes([0x2C]) + (0).to_bytes(2, "little") * 2
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([0])
        out += bytes([min_code])
        # LZW encode (simple dict form)
        acc = 0
        nbits = 0
        body = bytearray()

        def put(code: int, width: int):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                body.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        table: dict[tuple, int] = {(c,): c for c in range(clear)}
        next_code = clear + 2
        width_bits = min_code + 1
        put(clear, width_bits)
        seq: tuple = ()
        for px in idx_frames[f]:
            cand = seq + (int(px),)
            if cand in table:
                seq = cand
                continue
            put(table[seq], width_bits)
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
                # the encoder's table is ONE entry ahead of the decoder's
                # (the decoder adds each entry only when it reads the NEXT
                # code), so the width bump fires at next_code - 1 — the
                # decoder's next_code at the moment it reads our next code
                if next_code - 1 == (1 << width_bits) and width_bits < 12:
                    width_bits += 1
            else:  # table full: clear and restart
                put(clear, width_bits)
                table = {(c,): c for c in range(clear)}
                next_code = clear + 2
                width_bits = min_code + 1
            seq = (int(px),)
        if seq:
            put(table[seq], width_bits)
        put(eoi, width_bits)
        if nbits:
            body.append(acc & 0xFF)
        for off in range(0, len(body), 255):
            chunk = body[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)
