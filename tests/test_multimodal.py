"""Multimodal stage tests: REAL decode kernels for the dependency-free
formats (PPM/WAV/SMV1) plus the actor-pool Ray plumbing — schemas, batch
flow, binary-column handling."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from smse_backend_ray.stages.multimodal import (
    FEATURE_DIM,
    WAV_RATE,
    DecodeMedia,
    ExtractFeatures,
    decode_image_any,
    decode_png,
    decode_ppm,
    decode_smv,
    decode_wav,
    encode_png,
    encode_ppm,
    encode_smv,
    encode_wav,
    media_pipeline,
    sample_frames_batch,
    synth_media_table,
)


def test_synth_media_deterministic():
    a, b = synth_media_table(50), synth_media_table(50)
    assert a.equals(b)
    assert a.schema.field("payload").type == pa.binary()


def test_codec_roundtrips():
    px = (np.arange(5 * 4 * 3) % 256).astype(np.uint8).reshape(4, 5, 3)
    w, h, out = decode_ppm(encode_ppm(5, 4, px))
    assert (w, h) == (5, 4) and (out == px).all()
    s = (np.arange(-500, 500, 7)).astype(np.int16)
    rate, out_s = decode_wav(encode_wav(s, WAV_RATE))
    assert rate == WAV_RATE and (out_s == s).all()
    frames = [encode_ppm(5, 4, px), encode_ppm(5, 4, px[::-1].copy())]
    fps, out_f = decode_smv(encode_smv(frames, fps=24))
    assert fps == 24 and out_f == frames


def test_decode_real_metadata():
    dec = DecodeMedia()
    t = synth_media_table(30)
    out = dec(t)
    assert out.num_rows == 30
    for r in out.to_pylist():
        if r["kind"] == "image":
            assert r["width"] >= 16 and r["height"] >= 12 and r["frames"] == 1
        elif r["kind"] == "audio":
            # synth clips are 800..1440 samples at 8 kHz
            assert 0.09 <= r["duration_s"] <= 0.19 and r["width"] == 0
        else:
            assert r["frames"] >= 2 and r["duration_s"] > 0 and r["width"] >= 8
    # deterministic
    assert out.equals(dec(t))


def test_decode_foreign_format_raises():
    dec = DecodeMedia()
    # MP3/MP4 payloads go through real header/container probers; payloads
    # with the magic but no parsable structure are data errors, not missing
    # capability
    t = pa.table(
        {
            "media_id": pa.array([0], type=pa.int64()),
            "kind": pa.array(["video"]),
            "payload": pa.array(
                [b"\x00\x00\x00\x18ftypisom more bytes now"], type=pa.binary()
            ),
            "meta": pa.array(["{}"]),
        }
    )
    with pytest.raises(ValueError, match="moov"):
        dec(t)
    t2 = pa.table(
        {
            "media_id": pa.array([0], type=pa.int64()),
            "kind": pa.array(["audio"]),
            "payload": pa.array([b"ID3\x03\x00 mp3 bytes"], type=pa.binary()),
            "meta": pa.array(["{}"]),
        }
    )
    with pytest.raises(ValueError, match="no valid MPEG"):
        dec(t2)
    # sample decode of the compressed formats stays an honest boundary
    from smse_backend_ray.stages.mp4 import make_mp4

    with pytest.raises(NotImplementedError, match="ffmpeg"):
        ExtractFeatures()._features_one("video", make_mp4())


def test_decode_fake_deterministic():
    dec = DecodeMedia(deterministic_fake=True)
    t = synth_media_table(30)
    out1, out2 = dec(t), dec(t)
    assert out1.equals(out2)
    assert set(out1.column_names) == {
        "media_id", "kind", "n_bytes", "width", "height", "duration_s", "frames",
    }


def test_features_real():
    fx = ExtractFeatures()
    out = fx(synth_media_table(12))
    assert out["embedding"].type == pa.list_(pa.float32())
    for kind, v in zip(out["kind"].to_pylist(), out["embedding"].to_pylist()):
        assert len(v) == FEATURE_DIM
        assert all(np.isfinite(v))
        if kind == "image":
            assert all(0.0 <= x <= 2.0 for x in v)  # moments + aspect + luma


def test_frame_sampling_real_frames():
    out = sample_frames_batch(synth_media_table(12))
    by_kind = {}
    for r in out.to_pylist():
        by_kind.setdefault(r["kind"], []).append(r)
    assert all(r["frame_no"] == 0 for r in by_kind["image"])
    assert any(r["frame_no"] > 0 for r in by_kind["video"])
    # video frame keys hash the actual frame bytes -> distinct per frame
    vkeys = [r["frame_key"] for r in by_kind["video"]]
    assert len(vkeys) == len(set(vkeys))


def test_media_pipeline_actor_pool(ray_session):
    t = media_pipeline(90)
    assert t.num_rows == 90
    assert t["media_id"].to_pylist() == list(range(90))
    assert t.schema.field("embedding").type == pa.list_(pa.float32())


# -- property-based codec fuzz -------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_ppm_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    w2, h2, out = decode_ppm(encode_ppm(w, h, px))
    assert (w2, h2) == (w, h) and (out == px).all()


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=4000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_wav_roundtrip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-(2**15), 2**15, size=n).astype(np.int16)
    r2, out = decode_wav(encode_wav(s, rate))
    assert r2 == rate and (out == s).all()


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    ct=st.sampled_from([0, 2, 6]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_png_roundtrip_property(w, h, ct, seed):
    """All 3 color types; encoder cycles filter types 0-4 per row, so any
    h >= 5 case exercises every unfilter path."""
    nch = {0: 1, 2: 3, 6: 4}[ct]
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, nch), dtype=np.uint8)
    if ct == 0:
        px = px[:, :, 0]
    w2, h2, out = decode_png(encode_png(w, h, px, ct))
    assert (w2, h2) == (w, h) and (out == px).all()


def test_png_decode_independent_of_encoder():
    """Hand-built PNG (filter 0 + filter 2 rows, independent of encode_png)
    decodes to the exact pixels — the decoder is spec-true, not merely the
    encoder's inverse."""
    import struct as st_
    import zlib

    px = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[15, 25, 35], [45, 55, 65]]], dtype=np.uint8
    )
    ihdr = st_.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    # row 0: filter None; row 1: filter Up (raw = x - prev, mod 256)
    raw = b"\x00" + px[0].tobytes() + b"\x02" + ((px[1].astype(np.int16) - px[0]) & 0xFF).astype(np.uint8).tobytes()

    def chunk(ctype, body):
        return st_.pack(">I", len(body)) + ctype + body + st_.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, out = decode_png(data)
    assert (w, h) == (2, 2) and (out == px).all()


def test_png_corrupt_crc_raises():
    data = bytearray(encode_png(3, 3, np.zeros((3, 3, 3), dtype=np.uint8)))
    data[20] ^= 0xFF  # flip a byte inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_decode_image_any_normalizes_to_rgb():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    w, h, rgb = decode_image_any(encode_png(4, 3, g, 0))
    assert rgb.shape == (3, 4, 3) and (rgb[:, :, 0] == g).all() and (rgb[:, :, 2] == g).all()
    rgba = np.arange(48, dtype=np.uint8).reshape(3, 4, 4)
    w, h, rgb = decode_image_any(encode_png(4, 3, rgba, 6))
    assert rgb.shape == (3, 4, 3) and (rgb == rgba[:, :, :3]).all()


@settings(max_examples=30, deadline=None)
@given(
    n_frames=st.integers(min_value=0, max_value=6),
    fps=st.integers(min_value=1, max_value=60),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_smv_roundtrip_property(n_frames, fps, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.bytes(rng.integers(0, 200)) for _ in range(n_frames)]
    fps2, out = decode_smv(encode_smv(frames, fps))
    assert fps2 == fps and out == frames


def test_resample_linear_properties():
    from smse_backend_ray.stages.multimodal import resample_linear

    s = (np.sin(np.linspace(0, 40 * np.pi, 8000)) * 20000).astype(np.int16)
    assert (resample_linear(s, 8000, 8000) == s).all()          # identity
    up = resample_linear(s, 8000, 16000)
    assert len(up) == 16000
    # upsample keeps the envelope: no new extremes beyond the source
    assert up.max() <= s.max() and up.min() >= s.min()
    down = resample_linear(s, 8000, 4000)
    assert len(down) == 4000
    assert (resample_linear(np.zeros(0, np.int16), 8000, 16000)).size == 0


def test_trim_silence_exact():
    from smse_backend_ray.stages.multimodal import trim_silence

    s = np.array([0, 3, -5, 9000, -12000, 700, 2, 0], dtype=np.int16)
    t = trim_silence(s, threshold=512)
    assert (t == np.array([9000, -12000, 700], dtype=np.int16)).all()
    assert trim_silence(np.array([1, -2, 3], dtype=np.int16), 512).size == 0


def test_audio_pipeline_actor_pool(ray_session):
    from smse_backend_ray.stages.multimodal import AUDIO_TARGET_RATE, audio_pipeline, decode_wav

    t = audio_pipeline(60)
    assert t.num_rows == 20  # a third of the synth corpus is audio
    assert t.column_names == [
        "media_id", "payload", "rate_in", "n_samples_in", "n_samples_out"
    ]
    rate, s = decode_wav(t["payload"][0].as_py())
    assert rate == AUDIO_TARGET_RATE and len(s) == t["n_samples_out"][0].as_py()
    # trim+resample accounting holds: out = round(trimmed * target/in_rate)
    assert all(n >= 0 for n in t["n_samples_out"].to_pylist())


# ---------------------------------------------------------------------------
# MP3 frame prober (stages/mp3.py)
# ---------------------------------------------------------------------------


def test_mp3_probe_synthetic_cbr():
    from smse_backend_ray.stages.mp3 import make_mp3_frame, mp3_probe

    stream = make_mp3_frame(kbps=128, rate=44100) * 10
    m = mp3_probe(stream)
    assert m["n_frames"] == 10
    assert m["sample_rate"] == 44100
    assert m["bitrate_kbps"] == 128
    assert m["channels"] == 2
    assert not m["vbr"]
    assert abs(m["duration_s"] - 10 * 1152 / 44100) < 1e-3


def test_mp3_probe_vbr_padding_mono_id3():
    from smse_backend_ray.stages.mp3 import make_mp3_frame, mp3_probe

    frames = (
        make_mp3_frame(kbps=128, rate=48000, mono=True)
        + make_mp3_frame(kbps=192, rate=48000, mono=True, pad=True)
        + make_mp3_frame(kbps=320, rate=48000, mono=True)
    )
    # ID3v2 header: 'ID3' + v2.3 + flags 0 + syncsafe size 100
    id3 = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100
    m = mp3_probe(id3 + frames)
    assert m["n_frames"] == 3
    assert m["vbr"] and m["channels"] == 1 and m["sample_rate"] == 48000
    assert abs(m["duration_s"] - 3 * 1152 / 48000) < 1e-3


def test_mp3_probe_rejects_garbage():
    import pytest as _pytest

    from smse_backend_ray.stages.mp3 import mp3_probe

    with _pytest.raises(ValueError):
        mp3_probe(b"\x00" * 4096)


def test_mp3_probe_real_file():
    """Real-world MP3 shipped as public test data in the container image
    (gsutil's test fixtures); skipped when the image layout changes."""
    import os

    import pytest as _pytest

    path = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"
    if not os.path.exists(path):
        _pytest.skip("container test mp3 not present")
    from smse_backend_ray.stages.mp3 import mp3_probe

    with open(path, "rb") as f:
        m = mp3_probe(f.read())
    assert m["n_frames"] >= 1
    assert m["duration_s"] > 0
    assert m["sample_rate"] in (8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000)
    assert m["layer"] in (1, 2, 3)


def test_decode_media_probes_mp3_and_features_stay_honest():
    import pytest as _pytest

    from smse_backend_ray.stages.mp3 import make_mp3_frame
    from smse_backend_ray.stages.multimodal import DecodeMedia, ExtractFeatures

    payload = make_mp3_frame() * 5
    meta = DecodeMedia()._decode_one("audio", payload)
    assert meta["frames"] == 5 and meta["duration_s"] > 0
    with _pytest.raises(NotImplementedError):
        ExtractFeatures()._features_one("audio", payload)


def test_media_pipeline_checked(ray_session):
    from smse_backend_ray.stages.multimodal import media_pipeline_checked

    t = media_pipeline_checked(60)
    assert t.num_rows == 60


def test_mp3_probe_truncated_and_vbr_weighting():
    from smse_backend_ray.stages.mp3 import make_mp3_frame, mp3_probe

    # truncated final frame is NOT counted
    full = make_mp3_frame() * 5
    trunc = full[: len(full) - len(make_mp3_frame()) + 4]
    assert mp3_probe(trunc)["n_frames"] == 4
    # VBR bitrate is frame-weighted, not a mean of distinct rates
    stream = make_mp3_frame(kbps=128) * 99 + make_mp3_frame(kbps=320)
    m = mp3_probe(stream)
    assert m["vbr"] and m["bitrate_kbps"] == round((99 * 128 + 320) / 100)


# ---------------------------------------------------------------------------
# image preprocessing (resize / center-crop / normalize)
# ---------------------------------------------------------------------------


def test_resize_bilinear_identity_and_known_values():
    from smse_backend_ray.stages.multimodal import resize_bilinear

    px = (np.arange(4 * 6 * 3) % 256).astype(np.uint8).reshape(4, 6, 3)
    assert (resize_bilinear(px, 4, 6) == px).all()
    # constant image stays constant at any size
    c = np.full((3, 5, 3), 77, dtype=np.uint8)
    assert (resize_bilinear(c, 9, 2) == 77).all()
    # 2x upsample of a 2x2 gradient: half-pixel centers -> corner rows keep
    # the original corner values
    g = np.array([[[0] * 3, [100] * 3], [[200] * 3, [255] * 3]], dtype=np.uint8)
    up = resize_bilinear(g, 4, 4)
    assert up[0, 0, 0] == 0 and up[0, 3, 0] == 100
    assert up[3, 0, 0] == 200 and up[3, 3, 0] == 255
    # interior is monotone along each axis
    assert np.all(np.diff(up[:, :, 0].astype(int), axis=0) >= 0)
    assert np.all(np.diff(up[:, :, 0].astype(int), axis=1) >= 0)


def test_preprocess_image_shape_and_normalization():
    from smse_backend_ray.stages.multimodal import (
        IMAGE_MEAN,
        IMAGE_SIZE,
        IMAGE_STD,
        preprocess_image,
    )

    rng = np.random.default_rng(7)
    for h, w in [(30, 50), (64, 20), (224, 224), (300, 300)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        t = preprocess_image(px)
        assert t.shape == (IMAGE_SIZE, IMAGE_SIZE, 3) and t.dtype == np.float32
    # a mean-valued constant image normalizes to ~0
    const = np.round(IMAGE_MEAN * 255).astype(np.uint8)
    px = np.tile(const, (40, 40, 1))
    t = preprocess_image(px)
    assert np.abs(t).max() < 0.02
    # deterministic
    px2 = rng.integers(0, 256, size=(33, 77, 3), dtype=np.uint8)
    assert (preprocess_image(px2) == preprocess_image(px2)).all()


def test_image_pipeline_actor_pool(ray_session):
    from smse_backend_ray.stages.multimodal import IMAGE_SIZE, image_pipeline

    t = image_pipeline(60)
    assert t.num_rows == 20  # every 3rd synth row is an image
    for r in t.to_pylist():
        assert r["tensor_h"] == r["tensor_w"] == IMAGE_SIZE
        v = np.frombuffer(r["tensor"], dtype=np.float32)
        assert v.size == IMAGE_SIZE * IMAGE_SIZE * 3
        assert np.isfinite(v).all()
        assert abs(v.mean() - r["tensor_mean"]) < 1e-6


# ---------------------------------------------------------------------------
# MP4 box prober (stages/mp4.py)
# ---------------------------------------------------------------------------


def test_mp4_probe_synthetic():
    from smse_backend_ray.stages.mp4 import make_mp4, mp4_probe

    m = mp4_probe(make_mp4(duration_s=2.5, timescale=1000,
                           width=640, height=360, n_tracks=2))
    assert m["brand"] == "isom"
    assert m["duration_s"] == 2.5 and m["timescale"] == 1000
    assert m["n_tracks"] == 2
    assert (m["width"], m["height"]) == (640, 360)
    # 64-bit mvhd (version 1) parses too
    m1 = mp4_probe(make_mp4(duration_s=7.25, timescale=600, version=1))
    assert m1["duration_s"] == 7.25 and m1["timescale"] == 600


def test_mp4_probe_rejects_garbage_and_truncation():
    from smse_backend_ray.stages.mp4 import make_mp4, mp4_probe

    with pytest.raises(ValueError, match="ftyp"):
        mp4_probe(b"\x00" * 64)
    good = make_mp4()
    with pytest.raises(ValueError, match="moov"):
        mp4_probe(good[:20])  # ftyp only


def test_decode_media_probes_mp4():
    from smse_backend_ray.stages.mp4 import make_mp4

    meta = DecodeMedia()._decode_one(
        "video", make_mp4(duration_s=3.0, width=1280, height=720)
    )
    assert meta == {"width": 1280, "height": 720, "duration_s": 3.0, "frames": 0}
