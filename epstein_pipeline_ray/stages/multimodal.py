"""Multimodal (binary-column) stage plumbing.

Images/audio/video ride the pipeline as opaque ``binary`` columns with
typed metadata. The actual codecs are NOT in this container (and the
reference's OCR/whisper model stacks aren't either — SURVEY.md §2.1 S3/S4),
so the decode kernel is stubbed behind ``decode_fn``: the default
deterministic fake derives "features" from the payload bytes, and a real
deployment swaps in PIL/ffmpeg in the actor's ``__init__``. Everything
Ray-side — schema, actor-pool signature, batch sizing for large payloads,
output layout — is real and tested.

Mirrors the reference's stateful-backend pattern: model built once per
worker, fallback on low confidence
(reference: src/epstein_pipeline/processors/ocr.py:756-860).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a real decoder: 8 float32 'features'
    seeded from the payload digest + simple validity stats."""
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    feats = np.frombuffer(digest, dtype=np.uint8)[:8].astype(np.float32) / 255.0
    return {"ok": len(payload) > 0, "n_bytes": len(payload), "features": feats}


class MediaFeatureActor:
    """Actor-pool decode/feature stage. One 'model load' per actor.

    For real codecs, swap ``self.decode``: e.g.
    ``from PIL import Image; self.decode = lambda b, k: ...`` — the
    surrounding plumbing (small batch_size for fat binary rows, Arrow list
    output) is unchanged.
    """

    def __init__(self, decode_fn=None):
        self.decode = decode_fn or fake_decode  # "model load" happens here

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        oks, n_bytes, feats = [], [], []
        for k, p in zip(kinds, payloads):
            r = self.decode(p or b"", k)
            oks.append(bool(r["ok"]))
            n_bytes.append(int(r["n_bytes"]))
            feats.append(np.asarray(r["features"], dtype=np.float32))
        flat = np.concatenate(feats) if feats else np.array([], dtype=np.float32)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "ok": pa.array(oks, pa.bool_()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "features": pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float32()), 8),
            }
        )


def media_features(media: Dataset, concurrency=None, batch_size: int = 16) -> Dataset:
    """Decode/feature-extract binary media via an actor pool.

    ``batch_size`` stays small: batch bytes ≈ batch_size × payload size
    must fit the worker heap next to the decoded frames (ray_guide:
    memory-aware batching for fat binary rows).
    """
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, ncpu // 2))
    return media.map_batches(
        MediaFeatureActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": [f"m-{i:05d}" for i in range(n)],
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.bytes(int(rng.integers(10, 5000))) for _ in range(n)],
        "width": [int(rng.integers(16, 4096)) for _ in range(n)],
        "height": [int(rng.integers(16, 4096)) for _ in range(n)],
        "duration_ms": [int(rng.integers(0, 600_000)) for _ in range(n)],
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


class MediaResizeActor:
    """Actor-pool resize stage (image path). The real kernel would be
    ``PIL.Image.open(io.BytesIO(b)).resize(...)`` built in ``__init__``;
    the deterministic fake re-digests the payload and emits the target
    dimensions so the schema/metadata plumbing is fully exercised."""

    def __init__(self, target_w: int = 224, target_h: int = 224, resize_fn=None):
        self.target_w = target_w
        self.target_h = target_h
        # "codec load" happens here, once per actor; None → deterministic fake
        self.resize = resize_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out_payloads = []
        for p in payloads:
            p = p or b""
            if self.resize is None:
                # deterministic fake: digest-stretched bytes sized to the
                # target raster (3 bytes/px, capped so tests stay light)
                size = min(self.target_w * self.target_h * 3, 4096)
                seed = hashlib.blake2b(p, digest_size=32).digest()
                reps = size // len(seed) + 1
                out_payloads.append((seed * reps)[:size])
            else:
                out_payloads.append(self.resize(p))
        t = batch.drop_columns(["payload", "width", "height"])
        return (
            t.append_column("payload", pa.array(out_payloads, pa.large_binary()))
            .append_column("width", pa.array([self.target_w] * batch.num_rows, pa.int32()))
            .append_column("height", pa.array([self.target_h] * batch.num_rows, pa.int32()))
        )


def media_resize(media: Dataset, target_w: int = 224, target_h: int = 224,
                 concurrency=None, batch_size: int = 16) -> Dataset:
    """Resize images to a fixed raster via an actor pool (schema-preserving)."""
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, ncpu // 2))
    return media.map_batches(
        MediaResizeActor,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(media: Dataset, every_ms: int = 1000, max_frames: int = 16,
                 batch_size: int = 8) -> Dataset:
    """Video frame sampling: 1 video row → N frame rows (flat_map shape).

    Frame timestamps are real (derived from duration_ms); the frame
    payload is the deterministic fake (a real deployment decodes with
    ffmpeg inside an actor's ``__init__``). Small batch_size: output
    bytes ≈ batch_size × max_frames × frame size.
    """

    def expand(batch: pa.Table) -> pa.Table:
        ids, kinds, ts_ms, frames = [], [], [], []
        for mid, kind, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if kind != "video":
                continue
            n = min(max_frames, max(1, (dur or 0) // every_ms + 1))
            digest = hashlib.blake2b(payload or b"", digest_size=32).digest()
            for f in range(n):
                ids.append(mid)
                kinds.append(kind)
                ts_ms.append(f * every_ms)
                frames.append(hashlib.blake2b(digest + f.to_bytes(4, "little"),
                                              digest_size=32).digest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_ts_ms": pa.array(ts_ms, pa.int32()),
                "frame": pa.array(frames, pa.large_binary()),
            }
        )

    return media.map_batches(expand, batch_format="pyarrow", batch_size=batch_size,
                             zero_copy_batch=True)
