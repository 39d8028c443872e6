"""Stdlib-only baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Pure numpy + bit twiddling — no Pillow/libjpeg in this container (SURVEY
§6 environment), and a training corpus is mostly JPEG, so the multimodal
envelope needs a real entropy decode.  Scope (the spec's *baseline
sequential DCT* process, 8-bit samples):

  decode_jpeg : SOI/APPn/DQT/DHT/SOF0/DRI/SOS/EOI markers; 1- or
      3-component frames; 4:4:4 / 4:2:2 / 4:2:0 subsampling; restart
      intervals; byte unstuffing.  Returns ``(h, w, ncomp)`` uint8 (RGB
      for 3 components via the JFIF YCbCr transform).  Progressive
      (SOF2), arithmetic coding, 12-bit and hierarchical modes raise
      ``ValueError`` naming the gap.
  encode_jpeg : baseline encoder (4:4:4, Annex K quantisation tables
      scaled by libjpeg's quality curve, Annex K Huffman tables) for
      grayscale / RGB uint8 arrays — gives tests and fixtures payloads
      that genuinely round-trip through the decoder (lossy: assert
      tolerance, not equality; solid blocks reconstruct exactly).

The Huffman bit loop is per-symbol Python (entropy decode is inherently
sequential); everything after it — dequantisation, the 2-D IDCT (one
``einsum`` over all blocks against the 8x8 DCT-II basis), plane assembly,
chroma upsampling, colour transform — is batched numpy.  Throughput is
measured and recorded in BASELINE.md; at 100-TB scale each actor decodes
independent payloads, so the per-image constant parallelises flat.
"""
from __future__ import annotations

import numpy as np

# --- constants (ITU-T T.81 Annex K) ----------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
Q_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis: C[k, n] = alpha(k) cos((2n+1) k pi / 16)
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(0.125) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """Batched 2-D inverse DCT: (n, 8, 8) frequency -> spatial."""
    return np.einsum("ki,nkl,lj->nij", _C, coef, _C, optimize=True)


def _fdct_blocks(spatial: np.ndarray) -> np.ndarray:
    return np.einsum("ik,nkl,jl->nij", _C, spatial, _C, optimize=True)


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: {(length, code) -> symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    return {
        sym: (length, code)
        for (length, code), sym in _build_decode_table(bits, vals).items()
    }


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to signed coefficient."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitReader:
    """MSB-first reader over the UNSTUFFED entropy bytes."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode(self, table: dict) -> int:
        self._fill(16)
        code = 0
        acc, nbits = self.acc, self.nbits
        for length in range(1, 17):
            code = (code << 1) | ((acc >> (nbits - length)) & 1)
            sym = table.get((length, code))
            if sym is not None:
                self.nbits -= length
                self.acc &= (1 << self.nbits) - 1
                return sym
        raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-JPEG pixel decode -> (h, w, ncomp) uint8 (RGB or gray)."""
    b = payload or b""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"bad marker alignment at {i}")
        marker = b[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(b[i : i + 2], "big")
        seg = b[i + 2 : i + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if prec:
                    tbl = np.frombuffer(
                        seg[j : j + 128], dtype=">u2"
                    ).astype(np.int64)
                    j += 128
                else:
                    tbl = np.frombuffer(
                        seg[j : j + 64], dtype=np.uint8
                    ).astype(np.int64)
                    j += 64
                q = np.empty(64, np.int64)
                q[ZIGZAG] = tbl  # stored in zigzag order
                qt[tid] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                (huff_ac if cls else huff_dc)[tid] = _build_decode_table(
                    bits, vals
                )
                j += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], int.from_bytes(seg[1:3], "big"), int.from_bytes(seg[3:5], "big"), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG sample precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = {0xC2: "progressive (SOF2)"}.get(
                marker, f"SOF{marker - 0xC0}"
            )
            raise ValueError(
                f"unsupported JPEG process {kind}: this decoder implements "
                f"baseline sequential DCT only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            scan = sel
            i += seg_len
            break  # entropy-coded data follows
        i += seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    # unstuff entropy bytes up to EOI, dropping RST markers (we decode
    # restart intervals by resetting predictions at RST boundaries)
    data = bytearray()
    rst_positions = []  # symbol-stream byte offsets where RSTn occurred
    j = i
    while j < len(b) - 1:
        byte = b[j]
        if byte == 0xFF:
            nxt = b[j + 1]
            if nxt == 0x00:
                data.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                rst_positions.append(len(data))
                j += 2
                continue
            break  # EOI or next marker
        data.append(byte)
        j += 1

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        by_id[s["id"]]["dc_t"] = s["dc"]
        by_id[s["id"]]["ac_t"] = s["ac"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient stores
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.int64)
        c["pred"] = 0

    r = _BitReader(bytes(data))
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            # RST boundary: byte-align and reset DC predictions
            r.nbits -= r.nbits % 8
            r.acc &= (1 << r.nbits) - 1
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            dct, act = huff_dc[c["dc_t"]], huff_ac[c["ac_t"]]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = r.decode(dct)
                    diff = _extend(r.read(t), t) if t else 0
                    c["pred"] += diff
                    zz[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = r.decode(act)
                        rlen, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if rlen == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += rlen
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(r.read(size), size)
                        k += 1
                    bi = (my * c["v"] + v) * c["bw"] + (mx * c["h"] + hh)
                    c["coef"][bi][
                        np.unravel_index(ZIGZAG, (8, 8))
                    ] = zz  # de-zigzag

    planes = []
    for c in comps:
        q = qt[c["tq"]]
        spatial = _idct_blocks(c["coef"] * q) + 128.0
        blocks = spatial.reshape(c["bh"], c["bw"], 8, 8)
        plane = blocks.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample to full resolution grid
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder ---------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality -> scaling curve (public IJG convention)."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    zz: np.ndarray, pred: int, bw: _BitWriter, dc_tab: dict, ac_tab: dict
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    ln, code = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg(
    arr: np.ndarray,
    *,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder for (h, w) / (h, w, 1) grayscale or (h, w, 3)
    RGB uint8 arrays.  ``subsample``: "444" or "420" (chroma 2x2-mean
    downsampled); ``restart_interval`` emits DRI + RSTn markers every that
    many MCUs — both exist chiefly so the DECODER's subsampling/restart
    paths have honest fixtures."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc not in (1, 3):
        raise ValueError(f"encode_jpeg supports 1 or 3 channels, got {nc}")
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be 444 or 420, got {subsample!r}")
    if nc == 1:
        subsample = "444"
    qlum = _quality_scale(Q_LUM, quality).reshape(8, 8)
    qchr = _quality_scale(Q_CHROM, quality).reshape(8, 8)
    if nc == 3:
        rf = a[:, :, 0].astype(np.float64)
        gf = a[:, :, 1].astype(np.float64)
        bf = a[:, :, 2].astype(np.float64)
        planes = [
            0.299 * rf + 0.587 * gf + 0.114 * bf,
            128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf,
            128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf,
        ]
        if subsample == "420":
            # pad to even dims, then 2x2 mean the chroma planes
            for ci in (1, 2):
                p = planes[ci]
                p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                planes[ci] = 0.25 * (
                    p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
                )
        qtabs = [qlum, qchr, qchr]
        dc_tabs = [
            _build_encode_table(*HUFF_DC_LUM),
            _build_encode_table(*HUFF_DC_CHROM),
            _build_encode_table(*HUFF_DC_CHROM),
        ]
        ac_tabs = [
            _build_encode_table(*HUFF_AC_LUM),
            _build_encode_table(*HUFF_AC_CHROM),
            _build_encode_table(*HUFF_AC_CHROM),
        ]
        hv = [(2, 2), (1, 1), (1, 1)] if subsample == "420" else [(1, 1)] * 3
    else:
        planes = [a[:, :, 0].astype(np.float64)]
        qtabs = [qlum]
        dc_tabs = [_build_encode_table(*HUFF_DC_LUM)]
        ac_tabs = [_build_encode_table(*HUFF_AC_LUM)]
        hv = [(1, 1)]

    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    zz_rows, zz_cols = np.unravel_index(ZIGZAG, (8, 8))
    comp_blocks = []
    comp_bw = []
    for p, q, (ch, cv) in zip(planes, qtabs, hv):
        cbw, cbh = mcux * ch, mcuy * cv
        ph, pw = p.shape
        pad = np.pad(p, ((0, cbh * 8 - ph), (0, cbw * 8 - pw)), mode="edge")
        blocks = (
            pad.reshape(cbh, 8, cbw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coef = _fdct_blocks(blocks - 128.0)
        qz = np.round(coef / q).astype(np.int64)
        comp_blocks.append(qz[:, zz_rows, zz_cols])  # zigzag per block
        comp_bw.append(cbw)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0]) + bytes(qlum.reshape(-1)[ZIGZAG].astype(np.uint8))
    if nc == 3:
        dqt += bytes([1]) + bytes(qchr.reshape(-1)[ZIGZAG].astype(np.uint8))
    out += seg(0xDB, dqt)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, (hv[c][0] << 4) | hv[c][1], 0 if c == 0 else 1])
    out += seg(0xC0, sof)
    dht = b""
    specs = [(0x00, HUFF_DC_LUM), (0x10, HUFF_AC_LUM)]
    if nc == 3:
        specs += [(0x01, HUFF_DC_CHROM), (0x11, HUFF_AC_CHROM)]
    for tc, (bits, vals) in specs:
        dht += bytes([tc]) + bytes(bits) + bytes(vals)
    out += seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            out += bw.flush()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * nc
        my, mx = divmod(m, mcux)
        for c in range(nc):
            ch, cv = hv[c]
            for v in range(cv):
                for hh in range(ch):
                    bi = (my * cv + v) * comp_bw[c] + (mx * ch + hh)
                    preds[c] = _encode_block(
                        comp_blocks[c][bi], preds[c], bw, dc_tabs[c], ac_tabs[c]
                    )
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
