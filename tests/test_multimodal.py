"""Multimodal stage tests: the decode kernels are stubs (no PIL/ffmpeg in
this container) but the Ray plumbing — schemas, actor-pool batch flow,
binary-column handling — is real and must work."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray
import ray.data

from smse_backend_ray.stages.multimodal import (
    FEATURE_DIM,
    DecodeMedia,
    ExtractFeatures,
    media_pipeline,
    sample_frames_batch,
    synth_media_table,
)


def test_synth_media_deterministic():
    a, b = synth_media_table(50), synth_media_table(50)
    assert a.equals(b)
    assert a.schema.field("payload").type == pa.binary()


def test_decode_stub_raises_without_fake():
    dec = DecodeMedia()
    with pytest.raises(NotImplementedError):
        dec(synth_media_table(3))


def test_decode_fake_deterministic():
    dec = DecodeMedia(deterministic_fake=True)
    t = synth_media_table(30)
    out1, out2 = dec(t), dec(t)
    assert out1.equals(out2)
    assert out1.num_rows == 30
    assert set(out1.column_names) == {
        "media_id", "kind", "n_bytes", "width", "height", "duration_s", "frames",
    }
    rows = out1.to_pylist()
    for r in rows:
        if r["kind"] == "image":
            assert r["width"] >= 64 and r["frames"] == 1
        elif r["kind"] == "audio":
            assert r["duration_s"] > 0 and r["width"] == 0
        else:
            assert r["frames"] > 0


def test_feature_stub():
    fx = ExtractFeatures(deterministic_fake=True)
    out = fx(synth_media_table(10))
    assert out["embedding"].type == pa.list_(pa.float32())
    v = out["embedding"][0].as_py()
    assert len(v) == FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in v)
    with pytest.raises(NotImplementedError):
        ExtractFeatures()(synth_media_table(1))


def test_frame_sampling():
    out = sample_frames_batch(synth_media_table(12))
    by_kind = {}
    for r in out.to_pylist():
        by_kind.setdefault(r["kind"], []).append(r)
    assert all(r["frame_no"] == 0 for r in by_kind["image"])
    assert any(r["frame_no"] > 0 for r in by_kind["video"])


def test_media_pipeline_actor_pool(ray_session):
    t = media_pipeline(90, fake=True)
    assert t.num_rows == 90
    assert t["media_id"].to_pylist() == list(range(90))
