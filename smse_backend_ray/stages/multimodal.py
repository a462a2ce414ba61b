"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

Reference analog: the image/audio preprocessing + encode path
(smse_backend/tasks.py:58-85 preprocessing, :195-234 process_file) and the
modality dispatch (smse_backend/utils/file_extensions.py:33-46). The decode
libraries (PIL, torchaudio, ffmpeg) are NOT in this container, so the decode
kernels are STUBS: ``DecodeMedia`` raises NotImplementedError unless
``deterministic_fake=True``, in which case it derives metadata/features
deterministically from the payload bytes. The Ray-side plumbing — schema,
actor-pool signature, batch flow, output layout — is real and tested.

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


def synth_media_table(n: int) -> pa.Table:
    """Deterministic fake media corpus: payload bytes derive from media_id."""
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        h = hashlib.sha256(f"media{i}".encode()).digest()
        kind = MEDIA_KINDS[i % len(MEDIA_KINDS)]
        ids.append(i)
        kinds.append(kind)
        payloads.append(h * (8 + i % 5))  # variable-size opaque payload
        metas.append(json.dumps({"source": f"synth/{i}", "kind": kind}, sort_keys=True))
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta": pa.array(metas, type=pa.string()),
        }
    )


class DecodeMedia:
    """Actor-pool stage: decode payload -> typed metadata.

    Real decode (PIL / torchaudio / ffmpeg) is unavailable in this
    environment; pass ``deterministic_fake=True`` to derive width/height/
    duration/frames from the payload hash instead. State (the would-be
    decoder handles) initializes ONCE per actor (ST1 pattern,
    smse_backend/tasks.py:35-103).
    """

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake
        if not deterministic_fake:
            # this is where PIL/torchaudio handles would be constructed
            pass

    def _decode_one(self, kind: str, payload: bytes) -> dict:
        if not self.fake:
            raise NotImplementedError(
                "media decoding requires PIL/torchaudio/ffmpeg, not present "
                "in this environment; construct DecodeMedia(deterministic_fake=True)"
            )
        h = hashlib.sha256(payload).digest()
        a, b = struct.unpack("<II", h[:8])
        if kind == "image":
            return {"width": 64 + a % 1920, "height": 64 + b % 1080, "duration_s": 0.0, "frames": 1}
        if kind == "audio":
            return {"width": 0, "height": 0, "duration_s": round(0.5 + (a % 3000) / 100, 2), "frames": 0}
        return {
            "width": 64 + a % 1920,
            "height": 64 + b % 1080,
            "duration_s": round(1.0 + (b % 6000) / 100, 2),
            "frames": 24 * (1 + a % 120),
        }

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
    model-encode analog, smse_backend/tasks.py:227). Deterministic fake:
    bytes of sha256 -> scaled floats; a real model would load in __init__."""

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "feature extraction requires a model runtime; construct "
                "ExtractFeatures(deterministic_fake=True)"
            )
        feats = []
        for p in batch["payload"].to_pylist():
            h = hashlib.sha256(b"feat" + p).digest()
            v = np.frombuffer(h[:FEATURE_DIM * 4], dtype=np.uint32).astype(np.float64)
            feats.append((v / 2**32).astype(np.float32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "embedding": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


def sample_frames_batch(batch: pa.Table, every_n: int = 24) -> pa.Table:
    """flat_map-style stage: one row per sampled frame of video payloads
    (frame payload = deterministic slice marker; a real impl would emit
    decoded frame tensors). Non-video rows pass through with frame_no=0."""
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
        n_frames = 1 + len(payload) % 5
        for f in range(n_frames):
            out["media_id"].append(mid)
            out["kind"].append(kind)
            out["frame_no"].append(f * every_n)
            out["frame_key"].append(
                hashlib.md5(payload + struct.pack("<I", f)).hexdigest()
            )
    return pa.table(
        {
            "media_id": pa.array(out["media_id"], type=pa.int64()),
            "kind": pa.array(out["kind"], type=pa.string()),
            "frame_no": pa.array(out["frame_no"], type=pa.int32()),
            "frame_key": pa.array(out["frame_key"], type=pa.string()),
        }
    )


def media_pipeline(n: int = 300, fake: bool = True) -> pa.Table:
    """End-to-end media pipeline: synth media -> decode (actor pool) ->
    features (actor pool); returns decoded metadata joined with feature
    dims. Binary columns stay in Arrow throughout (never pandas)."""
    ds = ray.data.from_arrow(synth_media_table(n)).repartition(8)
    decoded = ds.map_batches(
        DecodeMedia,
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64,          # small batches: payload rows are wide
        concurrency=2,          # actor pool
        fn_constructor_kwargs={"deterministic_fake": fake},
    )
    t = collect_table(decoded)
    return t.take(pa.compute.sort_indices(t["media_id"]))
