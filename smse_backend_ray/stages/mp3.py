"""MPEG audio (MP3) frame prober — header-level metadata WITHOUT decode.

Reference analog: audio uploads preprocessed before embedding
(smse_backend/tasks.py:70-85). Full MPEG-1 Layer III waveform decode needs
the ISO 11172-3 Huffman code tables and a synthesis filterbank — not
reproducible from scratch in this environment (no DSP library), so PCM
decode stays an explicit NotImplementedError (stages/multimodal.py).

What a 100 TB curation pipeline needs from compressed audio FIRST, though,
is header metadata — duration, sample rate, channel layout, bitrate — to
bucket/filter/cost files before any expensive decode. That part is pure
bit-twiddling over public header tables and is implemented here for real:

  mp3_probe(payload) -> dict(version, layer, sample_rate, channels,
                             n_frames, duration_s, bitrate_kbps, vbr)

Walks every frame header (ID3v2 skipped via its syncsafe length; ID3v1
trailer ignored by sync scanning), sums per-frame durations so VBR files
report correctly, and validates each header's reserved/bad combinations.
"""

from __future__ import annotations

# bitrate tables, kbps, index 1..14 (0 = free-format, 15 = invalid) —
# ISO 11172-3 / 13818-3 public header layout
_BITRATES = {
    # (mpeg1?, layer): [kbps per index]
    (True, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (True, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (True, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (False, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (False, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (False, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}


def _id3v2_len(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):  # syncsafe bytes must be 7-bit
        return 0
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    footer = 10 if (data[5] & 0x10) else 0
    return 10 + size + footer


def _parse_header(h: int):
    """32-bit frame header -> (version, layer, samples_per_frame,
    sample_rate, channels, bitrate_kbps, frame_len) or None if invalid."""
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 0x3
    if ver_bits == 1:
        return None  # reserved
    version = {0: "2.5", 2: "2", 3: "1"}[ver_bits]
    layer_bits = (h >> 17) & 0x3
    if layer_bits == 0:
        return None  # reserved
    layer = {3: 1, 2: 2, 1: 3}[layer_bits]
    bi = (h >> 12) & 0xF
    if bi in (0, 15):
        return None  # free-format / invalid: length not derivable
    ri = (h >> 10) & 0x3
    if ri == 3:
        return None
    mpeg1 = version == "1"
    kbps = _BITRATES[(mpeg1, layer)][bi]
    rate = _RATES[version][ri]
    padding = (h >> 9) & 0x1
    channels = 1 if ((h >> 6) & 0x3) == 3 else 2
    if layer == 1:
        spf = 384
        frame_len = (12 * kbps * 1000 // rate + padding) * 4
    elif layer == 2:
        spf = 1152
        frame_len = 144 * kbps * 1000 // rate + padding
    else:
        spf = 1152 if mpeg1 else 576
        frame_len = (144 if mpeg1 else 72) * kbps * 1000 // rate + padding
    return version, layer, spf, rate, channels, kbps, frame_len


def mp3_probe(payload: bytes) -> dict:
    """Walk all MPEG audio frames -> stream metadata. Raises ValueError when
    no valid frame exists. Duration sums PER-FRAME samples/rate, so VBR
    streams (frames at differing bitrates) report exactly."""
    pos = _id3v2_len(payload)
    n = len(payload)
    n_frames = 0
    duration = 0.0
    kbps_sum = 0
    kbps_seen: set[int] = set()
    first = None
    while pos + 4 <= n:
        hdr = int.from_bytes(payload[pos : pos + 4], "big")
        p = _parse_header(hdr)
        if p is None:
            if n_frames == 0:
                pos += 1  # scan for first sync (junk/tag prefix tolerated)
                continue
            break  # trailing garbage / ID3v1 after a valid stream: stop
        version, layer, spf, rate, channels, kbps, frame_len = p
        if pos + frame_len > n:
            break  # truncated final frame: don't count partial audio
        if first is None:
            first = (version, layer, rate, channels)
        elif (version, layer, rate, channels) != first:
            break  # stream parameter change = not one coherent stream
        n_frames += 1
        duration += spf / rate
        kbps_sum += kbps
        kbps_seen.add(kbps)
        pos += frame_len
    if n_frames == 0:
        raise ValueError("no valid MPEG audio frame found")
    version, layer, rate, channels = first
    return {
        "version": version,
        "layer": layer,
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_s": round(duration, 4),
        # frame-weighted mean: a 99x128k + 1x320k VBR stream reports ~130,
        # not the midpoint of the distinct rates
        "bitrate_kbps": round(kbps_sum / n_frames),
        "vbr": len(kbps_seen) > 1,
    }


def make_mp3_frame(
    kbps: int = 128, rate: int = 44100, mono: bool = False, pad: bool = False
) -> bytes:
    """A structurally valid MPEG-1 Layer III frame (zeroed payload) — test
    vector generator for the prober; the payload is NOT decodable audio."""
    bi = _BITRATES[(True, 3)].index(kbps)
    ri = _RATES["1"].index(rate)
    h = (
        (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)  # sync, MPEG1, LIII, no CRC
        | (bi << 12) | (ri << 10) | ((1 if pad else 0) << 9)
        | ((3 if mono else 0) << 6)
    )
    frame_len = 144 * kbps * 1000 // rate + (1 if pad else 0)
    return h.to_bytes(4, "big") + b"\x00" * (frame_len - 4)
