"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

Reference analog: the image/audio preprocessing + encode path
(smse_backend/tasks.py:58-85 preprocessing, :195-234 process_file) and the
modality dispatch (smse_backend/utils/file_extensions.py:33-46).

Decode kernels are REAL for the formats this dependency-free environment can
produce and parse:

  image  binary PPM (P6) — header + raw RGB, decoded with numpy
         PNG — stdlib zlib inflate + per-scanline unfilter (all 5 filter
         types; 8-bit gray/RGB/RGBA; CRC-checked chunk walk)
         JPEG — baseline sequential decoder in stages/jpeg.py (Huffman +
         dequant + IDCT; gray/4:4:4/4:2:2/4:2:0; restart intervals)
  audio  RIFF/WAVE PCM16 mono — chunk walk + int16 sample decode
  video  "SMV1" frame container (magic, fps, n_frames, length-prefixed PPM
         frames) — a stand-in for an ffmpeg demuxer with the same stage
         signature

MP3 payloads get REAL header-level metadata (duration/frames/rate via
stages/mp3.py frame walking) but no waveform decode; MP4 payloads (magic
detected) raise NotImplementedError naming the missing library (ffmpeg);
a real deployment drops those decoders into the same ``DecodeMedia`` /
``ExtractFeatures`` actor-pool stages without touching the Ray plumbing.
``deterministic_fake=True`` keeps the round-1 hash-derived metadata path for
tests that want pure-plumbing behavior.

Media table schema:
  media_id: int64, kind: string (image|audio|video), payload: binary,
  meta: string (JSON)
"""

from __future__ import annotations

import hashlib
import json
import struct

import numpy as np
import pyarrow as pa

import ray.data

from smse_backend_ray.functions.collect import collect_table

MEDIA_KINDS = ("image", "audio", "video")
FEATURE_DIM = 8
WAV_RATE = 8000
SMV_MAGIC = b"SMV1"


# ---------------------------------------------------------------------------
# codecs (pure numpy/struct — no external media libraries)
# ---------------------------------------------------------------------------

def encode_ppm(width: int, height: int, rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    assert rgb.shape == (height, width, 3) and rgb.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (width, height) + rgb.tobytes()


def decode_ppm(data: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6) -> (width, height, (h, w, 3) uint8)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace separated, then one
    # whitespace byte before the raster
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment line
            i = data.index(b"\n", i) + 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(data[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, px.reshape(h, w, 3)


PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> channel count (8-bit depth, no palette, no interlace)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4) over int16 arrays."""
    p = a + b - c
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))


def encode_png(
    width: int, height: int, px: np.ndarray, color_type: int = 2
) -> bytes:
    """(h, w, channels) uint8 -> PNG (stdlib zlib, 8-bit, no interlace).

    Filter types cycle 0..4 per scanline so a decoder exercising this
    encoder's output covers every unfilter path (all five are legal and
    common in the wild; libpng pickers emit mixes like this)."""
    import zlib

    ch = _PNG_CHANNELS[color_type]
    if px.ndim == 2:
        px = px[:, :, None]
    assert px.shape == (height, width, ch) and px.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    x = px.reshape(height, width * ch).astype(np.int16)
    left = np.zeros_like(x)
    left[:, ch:] = x[:, :-ch]
    up = np.zeros_like(x)
    up[1:] = x[:-1]
    upleft = np.zeros_like(x)
    upleft[1:, ch:] = x[:-1, :-ch]
    raw = bytearray()
    for r in range(height):
        ft = r % 5
        if ft == 0:
            row = x[r]
        elif ft == 1:  # Sub
            row = x[r] - left[r]
        elif ft == 2:  # Up
            row = x[r] - up[r]
        elif ft == 3:  # Average
            row = x[r] - ((left[r] + up[r]) >> 1)
        else:  # Paeth
            row = x[r] - _paeth_vec(left[r], up[r], upleft[r])
        raw.append(ft)
        raw += (row & 0xFF).astype(np.uint8).tobytes()
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """PNG -> (width, height, (h, w, channels) uint8).

    Stdlib-only (zlib inflate + per-scanline unfilter): 8-bit depth, color
    types 0/2/6 (gray, RGB, RGBA), no interlace, CRC-checked chunk walk,
    multi-IDAT streams concatenated per spec. Sub rows unfilter as a cumsum
    (the recurrence IS a prefix sum mod 256) and Up rows as one vector add;
    Average/Paeth rows walk pixels with vectorized per-channel math."""
    import zlib

    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    i, w = len(PNG_SIG), None
    idat = bytearray()
    while i + 8 <= len(data):
        (clen,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + clen]
        (crc,) = struct.unpack(">I", data[i + 8 + clen : i + 12 + clen])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color_type={color_type}); "
                    "supported: 8-bit gray/RGB/RGBA"
                )
            if comp or filt or interlace:
                raise ValueError("unsupported PNG compression/filter/interlace")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ft, row = raw[r, 0], raw[r, 1:]
        if ft == 0:
            out[r] = row
        elif ft == 1:  # Sub: x[i] = raw[i] + x[i-ch] == per-channel cumsum
            out[r] = np.cumsum(row.reshape(w, ch).astype(np.int64), axis=0).reshape(
                stride
            ) & 0xFF
        elif ft == 2:  # Up
            prev = out[r - 1] if r else np.zeros(stride, dtype=np.uint8)
            out[r] = row + prev  # uint8 wraparound is the mod-256 add
        elif ft in (3, 4):  # Average / Paeth: sequential along x
            prev = (out[r - 1] if r else np.zeros(stride, dtype=np.uint8)).astype(
                np.int16
            )
            cur = np.zeros(stride, dtype=np.int16)
            rr = row.astype(np.int16)
            for px_i in range(w):
                s = slice(px_i * ch, (px_i + 1) * ch)
                left = cur[px_i * ch - ch : px_i * ch] if px_i else np.zeros(ch, np.int16)
                if ft == 3:
                    cur[s] = (rr[s] + ((left + prev[s]) >> 1)) & 0xFF
                else:
                    ul = prev[px_i * ch - ch : px_i * ch] if px_i else np.zeros(ch, np.int16)
                    cur[s] = (rr[s] + _paeth_vec(left, prev[s], ul)) & 0xFF
            out[r] = cur.astype(np.uint8)
        else:
            raise ValueError(f"PNG filter type {ft} unsupported")
    px = out.reshape(h, w, ch)
    return w, h, px[:, :, 0] if ch == 1 else px


def decode_image_any(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Dispatch PPM/PNG/JPEG by magic -> (w, h, (h, w, 3) uint8 RGB):
    grayscale replicates to 3 channels, RGBA drops alpha (feature math
    wants RGB)."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    px = None
    if payload.startswith(PNG_SIG):
        w, h, px = decode_png(payload)
    elif payload.startswith(b"\xff\xd8"):
        from smse_backend_ray.stages.jpeg import decode_jpeg

        w, h, px = decode_jpeg(payload)
    if px is not None:
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        elif px.shape[2] == 4:
            px = px[:, :, :3]
        return w, h, np.ascontiguousarray(px)
    raise ValueError("unknown image payload (supported: PPM P6, PNG, JPEG)")


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """int16 mono samples -> RIFF/WAVE (PCM16)."""
    assert samples.dtype == np.int16
    raw = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE -> (rate, int16 mono samples). Chunk-walking parser."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, samples = 12, None, None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        (clen,) = struct.unpack("<I", data[i + 4 : i + 8])
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", data[i + 8 : i + 16])
            if audio_fmt != 1 or channels != 1:
                raise ValueError("only PCM mono supported")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype=np.int16, count=clen // 2, offset=i + 8)
        i += 8 + clen + (clen & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def encode_smv(frames: list[bytes], fps: int = 24) -> bytes:
    """Length-prefixed PPM frames -> SMV1 container."""
    out = [SMV_MAGIC, struct.pack("<II", fps, len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_smv(data: bytes) -> tuple[int, list[bytes]]:
    """SMV1 container -> (fps, frame payloads)."""
    if data[:4] != SMV_MAGIC:
        raise ValueError("not an SMV1 payload")
    fps, n = struct.unpack("<II", data[4:12])
    frames, i = [], 12
    for _ in range(n):
        (ln,) = struct.unpack("<I", data[i : i + 4])
        frames.append(data[i + 4 : i + 4 + ln])
        i += 4 + ln
    return fps, frames


def _rng_bytes(seed: str, n: int) -> np.ndarray:
    """Deterministic byte stream from a seed (sha256 counter mode)."""
    out = bytearray()
    c = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{c}".encode()).digest()
        c += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8)


def synth_media_table(n: int) -> pa.Table:
    """Deterministic REAL-format media corpus: every payload round-trips
    through the codecs above (P6 images, PCM16 WAV clips, SMV1 videos)."""
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        kind = MEDIA_KINDS[i % len(MEDIA_KINDS)]
        if kind == "image":
            w, h = 16 + i % 8, 12 + i % 5
            fmt = (i // 3) % 3  # images cycle PPM / PNG / JPEG
            if fmt == 1:
                # PNG cycles gray/RGB/RGBA color types so the gate corpus
                # exercises every decode path
                ct = (0, 2, 6)[(i // 9) % 3]
                nch = {0: 1, 2: 3, 6: 4}[ct]
                px = _rng_bytes(f"img{i}", w * h * nch).reshape(h, w, nch)
                payload = encode_png(w, h, px[:, :, 0] if ct == 0 else px, ct)
            elif fmt == 2:
                from smse_backend_ray.stages.jpeg import encode_jpeg

                px = _rng_bytes(f"img{i}", w * h * 3).reshape(h, w, 3)
                payload = encode_jpeg(
                    px, 90,
                    subsample=bool((i // 9) % 2),
                    restart_interval=(i // 18) % 3,
                )
            else:
                px = _rng_bytes(f"img{i}", w * h * 3).reshape(h, w, 3)
                payload = encode_ppm(w, h, px)
        elif kind == "audio":
            ns = 800 + 160 * (i % 5)
            samples = (
                _rng_bytes(f"aud{i}", ns * 2).view(np.int16).astype(np.int16)
            )
            payload = encode_wav(samples, WAV_RATE)
        else:
            nf = 2 + i % 4
            w, h = 8 + i % 4, 6 + i % 3
            frames = [
                encode_ppm(w, h, _rng_bytes(f"vid{i}f{f}", w * h * 3).reshape(h, w, 3))
                for f in range(nf)
            ]
            payload = encode_smv(frames, fps=24)
        ids.append(i)
        kinds.append(kind)
        payloads.append(payload)
        metas.append(json.dumps({"source": f"synth/{i}", "kind": kind}, sort_keys=True))
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta": pa.array(metas, type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# actor-pool stages
# ---------------------------------------------------------------------------

def _looks_like_mp3(payload: bytes) -> bool:
    return payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    )


def _looks_like_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


class DecodeMedia:
    """Actor-pool stage: decode payload -> typed metadata. Codec dispatch
    happens once per actor in __init__ (ST1 pattern,
    smse_backend/tasks.py:35-103); real decode for PPM/PNG/JPEG/WAV/SMV1,
    real header/container probes for MP3/MP4 (stages/mp3.py, mp4.py);
    waveform/sample decode of the compressed formats raises an explicit
    NotImplementedError in the feature stage."""

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake
        # decoder dispatch table = the per-actor state a PIL/ffmpeg-backed
        # implementation would build here
        self._decoders = {
            "image": self._decode_image,
            "audio": self._decode_audio,
            "video": self._decode_video,
        }

    @staticmethod
    def _decode_image(payload: bytes) -> dict:
        w, h, _px = decode_image_any(payload)
        return {"width": w, "height": h, "duration_s": 0.0, "frames": 1}

    @staticmethod
    def _decode_audio(payload: bytes) -> dict:
        if _looks_like_mp3(payload):
            # header-level probe (stages/mp3.py): duration/frames are real;
            # PCM decode of MP3 remains NotImplemented (ExtractFeatures)
            from smse_backend_ray.stages.mp3 import mp3_probe

            meta = mp3_probe(payload)
            return {
                "width": 0, "height": 0,
                "duration_s": meta["duration_s"], "frames": meta["n_frames"],
            }
        rate, samples = decode_wav(payload)
        return {
            "width": 0, "height": 0,
            "duration_s": round(len(samples) / rate, 4), "frames": 0,
        }

    @staticmethod
    def _decode_video(payload: bytes) -> dict:
        if _looks_like_mp4(payload):
            # container-level probe (stages/mp4.py): duration/dims are real;
            # sample decode of MP4 remains NotImplemented (ExtractFeatures)
            from smse_backend_ray.stages.mp4 import mp4_probe

            meta = mp4_probe(payload)
            return {
                "width": meta["width"], "height": meta["height"],
                "duration_s": meta["duration_s"], "frames": 0,
            }
        fps, frames = decode_smv(payload)
        w, h, _ = decode_ppm(frames[0]) if frames else (0, 0, None)
        return {
            "width": w, "height": h,
            "duration_s": round(len(frames) / fps, 4), "frames": len(frames),
        }

    def _decode_one(self, kind: str, payload: bytes) -> dict:
        if self.fake:
            h = hashlib.sha256(payload).digest()
            a, b = struct.unpack("<II", h[:8])
            if kind == "image":
                return {"width": 64 + a % 1920, "height": 64 + b % 1080, "duration_s": 0.0, "frames": 1}
            if kind == "audio":
                return {"width": 0, "height": 0, "duration_s": round(0.5 + (a % 3000) / 100, 2), "frames": 0}
            return {
                "width": 64 + a % 1920, "height": 64 + b % 1080,
                "duration_s": round(1.0 + (b % 6000) / 100, 2), "frames": 24 * (1 + a % 120),
            }
        # no foreign-magic guard here: MP3/MP4 get real header/container
        # probes inside the per-kind decoders; unknown bytes fail in the
        # codecs with a ValueError naming the expected magic
        return self._decoders[kind](payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        decoded = [self._decode_one(k, p) for k, p in zip(kinds, payloads)]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
                "width": pa.array([d["width"] for d in decoded], type=pa.int32()),
                "height": pa.array([d["height"] for d in decoded], type=pa.int32()),
                "duration_s": pa.array([d["duration_s"] for d in decoded], type=pa.float64()),
                "frames": pa.array([d["frames"] for d in decoded], type=pa.int32()),
            }
        )


class ExtractFeatures:
    """Actor-pool stage: payload -> FEATURE_DIM float32 vector (the
    model-encode analog, smse_backend/tasks.py:227). Real mode computes
    content statistics of the DECODED media (pixel moments / sample energy),
    so the vector is a true function of the media content; fake mode keeps
    the round-1 hash-derived embedding."""

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake

    @staticmethod
    def _image_vec(px: np.ndarray, w: int, h: int) -> np.ndarray:
        f = px.astype(np.float64) / 255.0
        mean = f.mean(axis=(0, 1))          # R, G, B means
        std = f.std(axis=(0, 1))            # R, G, B stds
        luma = (0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]).mean()
        return np.array([*mean, *std, w / h, luma])

    def _features_one(self, kind: str, payload: bytes) -> np.ndarray:
        if self.fake:
            h = hashlib.sha256(b"feat" + payload).digest()
            v = np.frombuffer(h[: FEATURE_DIM * 4], dtype=np.uint32).astype(np.float64)
            return v / 2**32
        if kind == "image":
            w, h, px = decode_image_any(payload)
            return self._image_vec(px, w, h)
        if kind == "audio":
            if _looks_like_mp3(payload):
                raise NotImplementedError(
                    "MP3 waveform decode is not available in this environment "
                    "(no DSP library for the Layer III filterbank); header "
                    "metadata is available via stages.mp3.mp3_probe"
                )
            rate, s = decode_wav(payload)
            f = s.astype(np.float64) / 32768.0
            rms = float(np.sqrt((f * f).mean())) if f.size else 0.0
            zcr = float((np.diff(np.signbit(f)) != 0).mean()) if f.size > 1 else 0.0
            # 4 coarse band energies via strided fold (cheap spectral proxy);
            # empty slices (clips < 4 samples) yield 0.0, not NaN —
            # `np.mean(empty) or 0.0` would pass NaN through (NaN is truthy)
            k = max(1, f.size // 4)
            segs = [f[i * k : (i + 1) * k] for i in range(4)]
            bands = [float(np.abs(sg).mean()) if sg.size else 0.0 for sg in segs]
            return np.array([rms, zcr, float(np.abs(f).max(initial=0.0)), len(f) / rate, *bands])
        if _looks_like_mp4(payload):
            raise NotImplementedError(
                "MP4 sample decode is not available in this environment "
                "(needs ffmpeg); container metadata is available via "
                "stages.mp4.mp4_probe"
            )
        fps, frames = decode_smv(payload)
        if not frames:
            return np.zeros(FEATURE_DIM)
        w, h, px = decode_ppm(frames[0])
        return self._image_vec(px, w, h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._features_one(k, p).astype(np.float32)
            for k, p in zip(batch["kind"].to_pylist(), batch["payload"].to_pylist())
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "embedding": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


def sample_frames_batch(batch: pa.Table, every_n: int = 1) -> pa.Table:
    """flat_map-style stage: one row per sampled frame of video payloads
    (every ``every_n``-th container frame; frame_key = md5 of the actual
    frame bytes). Non-video rows pass through with frame_no=0."""
    out = {"media_id": [], "kind": [], "frame_no": [], "frame_key": []}
    for mid, kind, payload in zip(
        batch["media_id"].to_pylist(),
        batch["kind"].to_pylist(),
        batch["payload"].to_pylist(),
    ):
        if kind != "video":
            out["media_id"].append(mid)
            out["kind"].append(kind)
            out["frame_no"].append(0)
            out["frame_key"].append(hashlib.md5(payload).hexdigest())
            continue
        _fps, frames = decode_smv(payload)
        for f in range(0, len(frames), every_n):
            out["media_id"].append(mid)
            out["kind"].append(kind)
            out["frame_no"].append(f)
            out["frame_key"].append(hashlib.md5(frames[f]).hexdigest())
    return pa.table(
        {
            "media_id": pa.array(out["media_id"], type=pa.int64()),
            "kind": pa.array(out["kind"], type=pa.string()),
            "frame_no": pa.array(out["frame_no"], type=pa.int32()),
            "frame_key": pa.array(out["frame_key"], type=pa.string()),
        }
    )


def media_pipeline(n: int = 300, fake: bool = False) -> pa.Table:
    """End-to-end media pipeline: synth media -> decode (actor pool) ->
    features (actor pool) -> zip on media_id. Binary columns stay in Arrow
    throughout (never pandas); payload batches are small because rows are
    wide (the multimodal batch-size rule)."""
    ds = ray.data.from_arrow(synth_media_table(n)).repartition(8)
    decoded = ds.map_batches(
        DecodeMedia,
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64,          # small batches: payload rows are wide
        concurrency=2,          # actor pool
        fn_constructor_kwargs={"deterministic_fake": fake},
    )
    feats = ds.map_batches(
        ExtractFeatures,
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64,
        concurrency=2,
        fn_constructor_kwargs={"deterministic_fake": fake},
    )
    t = collect_table(decoded)
    t = t.take(pa.compute.sort_indices(t["media_id"]))
    ft = collect_table(feats)
    ft = ft.take(pa.compute.sort_indices(ft["media_id"]))
    assert t["media_id"].to_pylist() == ft["media_id"].to_pylist()
    return t.append_column("embedding", ft["embedding"])


def media_pipeline_checked(n: int = 300) -> pa.Table:
    """Self-validating media_pipeline (the gate entry): after the real
    decode+feature pass, recompute the SYNTHESIZER's ground-truth geometry
    per media_id (synth_media_table's size formulas) and assert the decoded
    metadata reproduced it exactly through the PPM/PNG/JPEG/WAV/SMV codecs.
    The driver's rows-only gate therefore rides on a checked output — a
    codec regression raises instead of returning silently-wrong rows."""
    t = media_pipeline(n)
    rows = t.to_pylist()
    # explicit raises, not bare asserts: python -O must not strip the gate's
    # validation (same as dedup.embedding_dup_pairs_ivf_checked)
    if len(rows) != n:
        raise AssertionError(f"expected {n} rows, got {len(rows)}")
    for r in rows:
        i = r["media_id"]
        kind = MEDIA_KINDS[i % len(MEDIA_KINDS)]
        if r["kind"] != kind:
            raise AssertionError(f"media {i}: kind {r['kind']} != synth {kind}")
        if kind == "image":
            want = (16 + i % 8, 12 + i % 5, 1, 0.0)
        elif kind == "audio":
            ns = 800 + 160 * (i % 5)
            want = (0, 0, 0, round(ns / WAV_RATE, 4))
        else:
            nf = 2 + i % 4
            want = (8 + i % 4, 6 + i % 3, nf, round(nf / 24, 4))
        got = (r["width"], r["height"], r["frames"], r["duration_s"])
        if got != want:
            raise AssertionError(
                f"media {i} ({kind}): decoded {got} != synth {want}"
            )
        emb = r["embedding"]
        if len(emb) != FEATURE_DIM or not all(np.isfinite(v) for v in emb):
            raise AssertionError(f"media {i}: bad embedding {emb}")
    return t


# ---------------------------------------------------------------------------
# audio preprocessing kernels + actor-pool stage (reference tasks.py:69-85
# audio path: load -> mono -> resample -> trim before encoding)
# ---------------------------------------------------------------------------

AUDIO_TARGET_RATE = 16000
SILENCE_THRESHOLD = 512  # |int16| below this is silence


def resample_linear(samples: np.ndarray, rate: int, new_rate: int) -> np.ndarray:
    """Deterministic linear-interpolation resample of int16 mono samples.
    Output length = round(n * new/old); endpoints clamp (no extrapolation).
    Not a windowed-sinc resampler — this is the cheap preprocessing grade
    the reference's pipeline used; swap in a polyphase kernel in the same
    stage slot when fidelity matters."""
    assert samples.dtype == np.int16
    if rate == new_rate or samples.size == 0:
        return samples.copy()
    n_out = int(round(samples.size * new_rate / rate))
    if n_out == 0:
        return np.zeros(0, dtype=np.int16)
    # sample positions in input index space
    pos = np.arange(n_out, dtype=np.float64) * (samples.size / n_out)
    i0 = np.minimum(pos.astype(np.int64), samples.size - 1)
    i1 = np.minimum(i0 + 1, samples.size - 1)
    frac = pos - i0
    out = (1.0 - frac) * samples[i0] + frac * samples[i1]
    return np.clip(np.round(out), -32768, 32767).astype(np.int16)


def trim_silence(samples: np.ndarray, threshold: int = SILENCE_THRESHOLD) -> np.ndarray:
    """Strip leading/trailing samples with |value| < threshold (exact
    integer comparison; an all-silent clip trims to empty)."""
    loud = np.flatnonzero(np.abs(samples.astype(np.int32)) >= threshold)
    if not loud.size:
        return samples[:0]
    return samples[loud[0] : loud[-1] + 1]


class PreprocessAudio:
    """Actor-pool stage: WAV payload -> trimmed + resampled WAV payload with
    accounting columns. Same __init__-holds-state shape as DecodeMedia; a
    torchaudio-backed implementation drops into this slot unchanged."""

    def __init__(self, target_rate: int = AUDIO_TARGET_RATE,
                 threshold: int = SILENCE_THRESHOLD):
        self.target_rate = target_rate
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload, n_in, n_out, rate_in = [], [], [], []
        for kind, payload in zip(
            batch["kind"].to_pylist(), batch["payload"].to_pylist()
        ):
            if kind != "audio":
                raise ValueError("PreprocessAudio fed a non-audio row")
            rate, s = decode_wav(payload)
            t = trim_silence(s, self.threshold)
            r = resample_linear(t, rate, self.target_rate)
            out_payload.append(encode_wav(r, self.target_rate))
            n_in.append(len(s))
            n_out.append(len(r))
            rate_in.append(rate)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out_payload, type=pa.binary()),
                "rate_in": pa.array(rate_in, type=pa.int32()),
                "n_samples_in": pa.array(n_in, type=pa.int64()),
                "n_samples_out": pa.array(n_out, type=pa.int64()),
            }
        )


def audio_pipeline(n: int = 300) -> pa.Table:
    """Audio preprocessing over the synth corpus' audio rows: filter ->
    actor-pool trim+resample -> accounting table (sorted by media_id)."""
    ds = (
        ray.data.from_arrow(synth_media_table(n))
        .filter(expr="kind == 'audio'")
        .repartition(8)
        .map_batches(
            PreprocessAudio,
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=64, concurrency=2,
        )
    )
    t = collect_table(ds)
    return t.take(pa.compute.sort_indices(t["media_id"]))


# ---------------------------------------------------------------------------
# image preprocessing kernels + actor-pool stage (reference tasks.py:58-67
# image path: resize -> center-crop -> mean/std normalize before encoding)
# ---------------------------------------------------------------------------

IMAGE_SIZE = 224  # reference TextPipeline/ImagePipeline target (tasks.py:58-67)
# CLIP/ImageBind published normalization constants (public)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float64)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float64)


def resize_bilinear(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic vectorized bilinear resize of an HxWx3 uint8 image
    (align_corners=False / half-pixel centers — the torchvision default).
    Identity when the size already matches."""
    h, w = px.shape[:2]
    if (h, w) == (out_h, out_w):
        return px.copy()
    f = px.astype(np.float64)

    def axis_coords(n_out: int, n_in: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        pos = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
        pos = np.clip(pos, 0.0, n_in - 1.0)
        i0 = np.floor(pos).astype(np.int64)
        i1 = np.minimum(i0 + 1, n_in - 1)
        return i0, i1, pos - i0

    y0, y1, fy = axis_coords(out_h, h)
    x0, x1, fx = axis_coords(out_w, w)
    fy = fy[:, None, None]
    fx = fx[None, :, None]
    top = f[y0][:, x0] * (1 - fx) + f[y0][:, x1] * fx
    bot = f[y1][:, x0] * (1 - fx) + f[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def center_crop(px: np.ndarray, size: int) -> np.ndarray:
    """Center-crop to size x size (caller guarantees both dims >= size)."""
    h, w = px.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return px[top : top + size, left : left + size]


def preprocess_image(px: np.ndarray, size: int = IMAGE_SIZE) -> np.ndarray:
    """Reference image preprocessing (tasks.py:58-67): resize SHORTEST side
    to ``size`` preserving aspect (bilinear), center-crop size x size, scale
    to [0,1], normalize per channel with the published mean/std. Returns
    float32 HxWx3."""
    h, w = px.shape[:2]
    if h <= w:
        nh, nw = size, max(size, int(round(w * size / h)))
    else:
        nh, nw = max(size, int(round(h * size / w))), size
    px = center_crop(resize_bilinear(px, nh, nw), size)
    f = px.astype(np.float64) / 255.0
    return ((f - IMAGE_MEAN) / IMAGE_STD).astype(np.float32)


class PreprocessImage:
    """Actor-pool stage: image payload -> model-ready normalized tensor
    (stored as a float32 binary column + shape) with accounting columns.
    Same __init__-holds-state shape as DecodeMedia; a PIL/torchvision
    implementation drops into this slot unchanged."""

    def __init__(self, size: int = IMAGE_SIZE):
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        tensors, h_in, w_in, means = [], [], [], []
        for kind, payload in zip(
            batch["kind"].to_pylist(), batch["payload"].to_pylist()
        ):
            if kind != "image":
                raise ValueError("PreprocessImage fed a non-image row")
            w, h, px = decode_image_any(payload)
            t = preprocess_image(px, self.size)
            tensors.append(t.tobytes())
            h_in.append(h)
            w_in.append(w)
            means.append(float(t.mean()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "tensor": pa.array(tensors, type=pa.binary()),
                "tensor_h": pa.array([self.size] * len(tensors), type=pa.int32()),
                "tensor_w": pa.array([self.size] * len(tensors), type=pa.int32()),
                "height_in": pa.array(h_in, type=pa.int32()),
                "width_in": pa.array(w_in, type=pa.int32()),
                "tensor_mean": pa.array(means, type=pa.float64()),
            }
        )


def image_pipeline(n: int = 300) -> pa.Table:
    """Image preprocessing over the synth corpus' image rows: filter ->
    actor-pool resize/crop/normalize -> tensor table (sorted by media_id).
    Small batches: each output row carries a size^2 x 3 float32 tensor."""
    ds = (
        ray.data.from_arrow(synth_media_table(n))
        .filter(expr="kind == 'image'")
        .repartition(8)
        .map_batches(
            PreprocessImage,
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=16, concurrency=2,
        )
    )
    t = collect_table(ds)
    return t.take(pa.compute.sort_indices(t["media_id"]))
