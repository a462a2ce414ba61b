"""Baseline sequential JPEG codec — stdlib ``struct`` + numpy only.

Reference analog: the image preprocess path decodes user JPEG uploads
(smse_backend/tasks.py:58-67, services/thumbnail.py:100-150) via PIL; this
environment has no PIL/libjpeg, so the engine carries its own spec-level
baseline codec. A production deployment swaps ``decode_jpeg`` for a libjpeg
binding without touching the actor-pool stages (same signature as
decode_ppm/decode_png).

Decoder scope (ITU-T T.81 baseline sequential DCT, 8-bit):
  - SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/EOI segment walk
  - multi-table DQT/DHT, canonical Huffman decode (T.81 Annex C)
  - grayscale (1 component) and YCbCr (3 components) with sampling factors
    up to 2x2 — covers 4:4:4, 4:2:2 and 4:2:0
  - restart intervals (DRI + RSTn), 0xFF00 byte unstuffing
  - dequant -> inverse zigzag -> separable float IDCT -> level shift ->
    nearest-neighbor chroma upsample -> BT.601 YCbCr->RGB

Encoder scope (exists so tests can round-trip the decoder; also used by the
synth media corpus): 4:4:4 / grayscale, Annex K example quant tables scaled
by the usual libjpeg quality curve, Annex K typical Huffman tables.

Per-MCU entropy decode is a Python loop (inherent to Huffman's serial bit
stream); everything after the coefficient stage is vectorized numpy. For
the metadata/feature batches this engine runs it is plenty; at 100 TB the
decode stage is the actor-pool ``map_batches`` slot where a C codec drops
in.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: position k in the scan -> flat index row*8+col
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_basis() -> np.ndarray:
    """A[u, x] = alpha(u)/2 * cos((2x+1) u pi / 16); then
    spatial = A.T @ coeff @ A and coeff = A @ spatial @ A.T."""
    u = np.arange(8, dtype=np.float64)
    a = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16)
    a[0, :] *= 1 / np.sqrt(2)
    return a * 0.5


_A = _dct_basis()

# ---------------------------------------------------------------------------
# Annex K example tables (T.81 K.1/K.2 quant, K.3 typical Huffman)
# ---------------------------------------------------------------------------

QUANT_LUM = np.array(
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
).reshape(8, 8)

QUANT_CHROM = np.array(
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
).reshape(8, 8)

# Huffman spec: (bits[1..16], values)
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _build_decode_table(bits: list[int], values: list[int]) -> dict:
    """Canonical Huffman (T.81 C.2): {(length, code): value}."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return out


def _build_encode_table(bits: list[int], values: list[int]) -> dict:
    """{value: (code, length)} for the encoder."""
    dec = _build_decode_table(bits, values)
    return {v: (code, ln) for (ln, code), v in dec.items()}


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy-coded segment."""

    __slots__ = ("data", "i", "buf", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if not self.n:
            if self.i >= len(self.data):
                return 0  # T.81 pads the tail with 1-bits; 0 is also safe here
            self.buf = self.data[self.i]
            self.i += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            v = table.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded stream from ``start``: returns the list of
    restart segments (split at RSTn markers, stuffed 0xFF00 -> 0xFF) and the
    offset of the terminating marker."""
    segs, cur, i = [], bytearray(), start
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """JPEG -> (width, height, uint8 pixels: (h, w) gray or (h, w, 3) RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        m = data[i + 1]
        if m == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", data[i + 2 : i + 4])
        body = data[i + 4 : i + 2 + ln]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                tbl = np.frombuffer(body, dtype=np.uint8, count=64, offset=j + 1)
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = tbl  # stored in zigzag order
                qt[tq] = q.reshape(8, 8)
                j += 65
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                values = list(body[j + 17 : j + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, values
                )
                j += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF{m - 0xC0}); "
                "only baseline sequential (SOF0) is implemented"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:  # SOS
            ns = body[0]
            scan = {}
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan[cs] = (tt >> 4, tt & 0xF)
            segs, _end = _split_entropy(data, i + 2 + ln)
            return _decode_scan(
                w, h, comps, scan, qt, huff_dc, huff_ac, segs, restart_interval
            )
        i += 2 + ln
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(w, h, comps, scan, qt, huff_dc, huff_ac, segs, restart_interval):
    if not comps or w == 0 or h == 0:
        raise ValueError("JPEG missing SOF0 header")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    pred = [0] * len(comps)
    seg_idx = 0
    rd = _BitReader(segs[0])
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            rd = _BitReader(segs[seg_idx])
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            td, ta = scan[c["id"]]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = rd.decode(huff_dc[td])
                    diff = _extend(rd.bits(t), t) if t else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = rd.decode(huff_ac[ta])
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        zz[k] = _extend(rd.bits(s), s)
                        k += 1
                    coeff = np.zeros(64, dtype=np.float64)
                    coeff[ZIGZAG] = zz
                    block = _A.T @ (coeff.reshape(8, 8) * q) @ _A
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # level shift, upsample, crop, color transform
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return w, h, np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (4:4:4 / grayscale; round-trip fixture for the decoder + synth)
# ---------------------------------------------------------------------------

def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int):
        for k in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0


def _mag_cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _block(plane: np.ndarray, ys: int, xs: int) -> np.ndarray:
    """8x8 block at (ys, xs) with edge-replicate padding past the plane."""
    blk = np.zeros((8, 8), dtype=np.float64)
    src = plane[ys : ys + 8, xs : xs + 8]
    if src.shape == (8, 8):
        return src
    blk[: src.shape[0], : src.shape[1]] = src
    if src.shape[0] < 8 and src.shape[0]:
        blk[src.shape[0] :, : src.shape[1]] = src[-1:, :]
    if src.shape[1] < 8 and src.shape[1]:
        blk[:, src.shape[1] :] = blk[:, src.shape[1] - 1 : src.shape[1]]
    return blk


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 -> baseline JPEG.

    ``subsample=True`` writes 4:2:0 (2x2 chroma, block-mean downsample);
    ``restart_interval=N`` emits DRI + RSTn every N MCUs — both exist so the
    decoder's subsampled-MCU and restart paths are round-trip-testable."""
    assert px.dtype == np.uint8
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        subsample = False
        planes = [px.astype(np.float64) - 128.0]
        quants = [_scaled_quant(QUANT_LUM, quality)]
        tqs, samps = [0], [(1, 1)]
    else:
        f = px.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        quants = [_scaled_quant(QUANT_LUM, quality),
                  _scaled_quant(QUANT_CHROM, quality)]
        tqs = [0, 1, 1]
        if subsample:
            # pad to even dims (edge replicate), then 2x2 block mean
            def down(p):
                pe = np.pad(p, ((0, p.shape[0] & 1), (0, p.shape[1] & 1)), "edge")
                return pe.reshape(pe.shape[0] // 2, 2, pe.shape[1] // 2, 2).mean(
                    axis=(1, 3)
                )

            planes = [planes[0], down(planes[1]), down(planes[2])]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
    enc_dc = [_build_encode_table(*HUFF_DC_LUM), _build_encode_table(*HUFF_DC_CHROM)]
    enc_ac = [_build_encode_table(*HUFF_AC_LUM), _build_encode_table(*HUFF_AC_CHROM)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    bw = _BitWriter()
    out_entropy = bytearray()
    pred = [0] * len(planes)
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out_entropy += bw.out
            out_entropy += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bw = _BitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        for ci, plane in enumerate(planes):
            sh, sv = samps[ci]
            tt = 0 if ci == 0 else 1
            for by in range(sv):
                for bx in range(sh):
                    blk = _block(plane, (my * sv + by) * 8, (mx * sh + bx) * 8)
                    coeff = _A @ blk @ _A.T
                    zz = (
                        np.round(coeff / quants[tqs[ci]])
                        .astype(np.int64)
                        .reshape(64)[ZIGZAG]
                    )
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    t = _mag_cat(diff)
                    code, ln = enc_dc[tt][t]
                    bw.write(code, ln)
                    if t:
                        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
                    nz = np.flatnonzero(zz[1:]) + 1
                    k = 1
                    for pos in nz:
                        run = int(pos) - k
                        while run > 15:
                            code, ln = enc_ac[tt][0xF0]  # ZRL
                            bw.write(code, ln)
                            run -= 16
                        v = int(zz[pos])
                        s = _mag_cat(v)
                        code, ln = enc_ac[tt][(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(v if v > 0 else v + (1 << s) - 1, s)
                        k = int(pos) + 1
                    if k < 64:
                        code, ln = enc_ac[tt][0x00]  # EOB
                        bw.write(code, ln)
    bw.flush()
    out_entropy += bw.out

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for ti, q in enumerate(quants):
        out += seg(0xDB, bytes([ti]) + bytes(q.reshape(64)[ZIGZAG].astype(np.uint8)))
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, samps[ci][0] << 4 | samps[ci][1], tqs[ci]])
    out += seg(0xC0, sof)
    for tc, (spec_l, spec_c) in ((0, (HUFF_DC_LUM, HUFF_DC_CHROM)),
                                 (1, (HUFF_AC_LUM, HUFF_AC_CHROM))):
        tables = [spec_l] if gray else [spec_l, spec_c]
        for th, (bits, values) in enumerate(tables):
            out += seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(values))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        tt = 0 if ci == 0 else 1
        sos += bytes([ci + 1, tt << 4 | tt])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += out_entropy
    out += b"\xff\xd9"
    return bytes(out)
