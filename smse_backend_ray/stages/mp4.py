"""ISO BMFF (MP4) box prober — container metadata WITHOUT codec decode.

Reference analog: video uploads preprocessed before embedding
(smse_backend/tasks.py:86-95). H.264/AAC decode is out of reach in this
environment (no codec library), so sample decode stays an explicit
NotImplementedError (stages/multimodal.py). What a curation pipeline needs
FIRST is container metadata — duration, track count, video dimensions — to
bucket/filter/cost files before any expensive decode. The ISO base-media
box layout is public bit-twiddling, implemented here for real:

  mp4_probe(payload) -> dict(brand, duration_s, timescale, n_tracks,
                             width, height)

Walks top-level boxes (32-bit and 64-bit largesize forms), reads
moov>mvhd (version 0 and 1) for timescale/duration and moov>trak>tkhd
for per-track 16.16 fixed-point dimensions (first track with nonzero
width/height wins — the video track).
"""

from __future__ import annotations

import struct


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for boxes in data[start:end]."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            return  # malformed/truncated: stop cleanly
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def mp4_probe(payload: bytes) -> dict:
    """Parse ftyp + moov>mvhd (+ first video trak>tkhd) -> container
    metadata. Raises ValueError when the payload is not ISO BMFF or lacks a
    movie header."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO base-media file (no ftyp box)")
    brand = payload[8:12].decode("latin1")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("no moov box (streaming-fragmented or truncated)")
    mvhd = _find(payload, moov[0], moov[1], b"mvhd")
    if mvhd is None:
        raise ValueError("no mvhd box inside moov")
    b, e = mvhd
    version = payload[b]
    if version == 1:
        timescale = int.from_bytes(payload[b + 20 : b + 24], "big")
        duration = int.from_bytes(payload[b + 24 : b + 32], "big")
    else:
        timescale = int.from_bytes(payload[b + 12 : b + 16], "big")
        duration = int.from_bytes(payload[b + 16 : b + 20], "big")
    if timescale == 0:
        raise ValueError("mvhd timescale is 0")
    n_tracks = 0
    width = height = 0
    pos = moov[0]
    for t, tb, te in _boxes(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        n_tracks += 1
        tkhd = _find(payload, tb, te, b"tkhd")
        if tkhd is None or width:
            continue
        hb, he = tkhd
        tver = payload[hb]
        # tkhd: ver/flags(4) times(8 or 16) track_id(4) rsvd(4) duration(4
        # or 8) rsvd(8) layer(2) alt(2) volume(2) rsvd(2) matrix(36) w(4) h(4)
        off = hb + 4 + (16 if tver == 1 else 8) + 4 + 4 + (8 if tver == 1 else 4)
        off += 8 + 2 + 2 + 2 + 2 + 36
        if off + 8 <= he:
            w_fp = int.from_bytes(payload[off : off + 4], "big")
            h_fp = int.from_bytes(payload[off + 4 : off + 8], "big")
            if w_fp and h_fp:
                width, height = w_fp >> 16, h_fp >> 16
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_s": round(duration / timescale, 4),
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


def _full_box(btype: bytes, version: int, body: bytes) -> bytes:
    payload = bytes([version, 0, 0, 0]) + body
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def make_mp4(
    duration_s: float = 2.5, timescale: int = 1000,
    width: int = 0, height: int = 0, n_tracks: int = 1, version: int = 0,
) -> bytes:
    """A structurally valid minimal MP4 (ftyp + moov>mvhd(+trak>tkhd)) —
    test-vector generator for the prober; carries no media samples."""
    dur = int(round(duration_s * timescale))
    if version == 1:
        mvhd = _full_box(
            b"mvhd", 1,
            struct.pack(">QQIQ", 0, 0, timescale, dur) + b"\x00" * 80,
        )
    else:
        mvhd = _full_box(
            b"mvhd", 0,
            struct.pack(">IIII", 0, 0, timescale, dur) + b"\x00" * 80,
        )
    traks = b""
    for i in range(n_tracks):
        w_fp = (width << 16) if (i == 0 and width) else 0
        h_fp = (height << 16) if (i == 0 and height) else 0
        tkhd_body = (
            struct.pack(">III", 0, 0, i + 1)     # ctime mtime track_id
            + b"\x00" * 4                          # reserved
            + struct.pack(">I", dur)               # duration
            + b"\x00" * 8                          # reserved
            + b"\x00" * 8                          # layer alt volume rsvd
            + b"\x00" * 36                         # matrix
            + struct.pack(">II", w_fp, h_fp)
        )
        traks += _box(b"trak", _full_box(b"tkhd", 0, tkhd_body))
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov
