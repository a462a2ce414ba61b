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
    decode_ppm,
    decode_smv,
    decode_wav,
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
    t = pa.table(
        {
            "media_id": pa.array([0], type=pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([b"\xff\xd8\xff\xe0 jpeg bytes"], type=pa.binary()),
            "meta": pa.array(["{}"]),
        }
    )
    with pytest.raises(NotImplementedError, match="PIL"):
        dec(t)


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
