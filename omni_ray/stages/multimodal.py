"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
environment): ``decode=fake`` produces deterministic fake features derived
from the payload bytes, so the Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested; ``decode=real`` raises
NotImplementedError at the clearly-marked seam where a codec library would
slot in.

Batch-size guidance baked into the stage defaults: binary payloads are wide
(MBs/row), so batches are small (32) and the stage is an actor pool whose
``__init__`` would own the codec context (model weights, ffmpeg handles).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes) for tests."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(256 + (i % 512)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(640 if kind != "audio" else 0)
        rows["height"].append(480 if kind != "audio" else 0)
        rows["duration_ms"].append(0 if kind == "image" else 1000 + i)
    return pa.table(
        {f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA}
    )


class ImageDecodeStage:
    """Actor-pool stage: payload → decoded features.

    ``mode='fake'``: deterministic 16-dim feature from payload bytes (real
    plumbing, fake kernel). ``mode='real'``: the seam for PIL/torchvision —
    NotImplementedError in this environment.
    """

    BATCH_SIZE = 32  # wide binary rows: keep batches small

    def __init__(self, mode: str = "fake", feature_dim: int = 16):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.dim = feature_dim
        # real mode would load the decoder/model HERE, once per actor

    def _decode_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "image decode requires PIL/torchvision — not available in this "
            "environment; swap this method for the real kernel on a cluster"
        )

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * ((self.dim * 4) // len(h) + 1))[: self.dim * 4], dtype=np.uint32)
        return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        fn = self._decode_fake if self.mode == "fake" else self._decode_real
        feats = [fn(p or b"") for p in payloads]
        sizes = [len(p or b"") for p in payloads]
        # integer payload checksum (uint32 LE of sha256[:4]): the lineage /
        # integrity column that survives into downstream tables and is
        # exactly reproducible by any engine (see media_pipeline_stats'
        # DuckDB twin) — unlike the float32 feature vector
        crcs = [
            int.from_bytes(hashlib.sha256(p or b"").digest()[:4], "little")
            for p in payloads
        ]
        return (
            batch.drop_columns(["payload"])  # drop wide bytes immediately
            .append_column("payload_bytes", pa.array(sizes, pa.int64()))
            .append_column("feat_crc", pa.array(crcs, pa.int64()))
            .append_column(
                "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
            )
        )


class FrameSampleStage:
    """Video frame sampling: emits one row per sampled frame index (the
    explode pattern for frame-level pipelines). Decode itself stubbed."""

    BATCH_SIZE = 16

    def __init__(self, every_ms: int = 500, mode: str = "fake"):
        self.every_ms = every_ms
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, durs = (
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        )
        out_id, out_frame, out_ts = [], [], []
        for mid, kind, dur in zip(ids, kinds, durs):
            if kind != "video":
                continue
            for fi, ts in enumerate(range(0, int(dur or 0), self.every_ms)):
                out_id.append(mid)
                out_frame.append(fi)
                out_ts.append(ts)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_index": pa.array(out_frame, pa.int32()),
                "frame_ts_ms": pa.array(out_ts, pa.int32()),
            }
        )


class AudioChunkStage:
    """Audio transcript chunking: emits one row per fixed-width character
    window of the decoded payload — the explode pattern a speech pipeline
    uses to cut long audio into model-sized windows. The PCM-frame slicer
    is the stubbed seam (this environment has no audio codec); the window
    arithmetic, per-chunk integrity checksum, batch sizing and actor
    signature are real. Each chunk carries a uint32-LE sha256 checksum of
    its character slice, reproducible by any engine (DuckDB ``substring``
    and Python ``str`` slicing are both character-based, so parity holds
    for non-ASCII payloads too)."""

    BATCH_SIZE = 32

    def __init__(self, chunk_chars: int = 100, mode: str = "fake"):
        if chunk_chars <= 0:
            raise ValueError(chunk_chars)
        self.chunk_chars = chunk_chars
        self.mode = mode
        # real mode would open the codec / VAD model HERE, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_start, out_len, out_crc = [], [], [], [], []
        w = self.chunk_chars
        for mid, kind, payload in zip(ids, kinds, payloads):
            if kind != "audio":
                continue
            text = (payload or b"").decode("utf-8", errors="replace")
            for ci in range(0, (len(text) + w - 1) // w):
                piece = text[ci * w:(ci + 1) * w]
                out_id.append(mid)
                out_idx.append(ci)
                out_start.append(ci * w)
                out_len.append(len(piece))
                out_crc.append(int.from_bytes(
                    hashlib.sha256(piece.encode()).digest()[:4], "little"))
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "chunk_index": pa.array(out_idx, pa.int64()),
            "start_pos": pa.array(out_start, pa.int64()),
            "chunk_len": pa.array(out_len, pa.int64()),
            "chunk_crc": pa.array(out_crc, pa.int64()),
        })


class ResizePlanStage:
    """Aspect-fit resize planning: integer-exact output geometry for a
    target box (default 224×224). This is the metadata half of an image
    resize stage — the real kernel (PIL/torchvision) would consume
    (out_w, out_h) per row at the clearly-marked seam; here the plan
    itself is the verifiable output. Pure vectorized integer arithmetic:
    out_dim = max(1, dim * target // max(w, h)), est_bytes = out_w*out_h*3
    (RGB8)."""

    BATCH_SIZE = 1024  # metadata-only rows: large batches are fine

    def __init__(self, target: int = 224):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = np.asarray(batch.column("kind").to_pylist())
        mask = kinds == "image"
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)[mask]
        w = batch.column("width").to_numpy(zero_copy_only=False)[mask].astype(np.int64)
        h = batch.column("height").to_numpy(zero_copy_only=False)[mask].astype(np.int64)
        m = np.maximum(np.maximum(w, h), 1)
        out_w = np.maximum(1, (w * self.target) // m)
        out_h = np.maximum(1, (h * self.target) // m)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(w, pa.int64()),
            "height": pa.array(h, pa.int64()),
            "out_w": pa.array(out_w, pa.int64()),
            "out_h": pa.array(out_h, pa.int64()),
            "est_bytes": pa.array(out_w * out_h * 3, pa.int64()),
        })


def media_feature_pipeline(media: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    """media table → per-item features (actor pool, small batches)."""
    return media.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"mode": "fake"},
        batch_format="pyarrow",
        batch_size=ImageDecodeStage.BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )
