"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

The HEAVY decode kernels (JPEG/MP4) are stubbed (no PIL/ffmpeg in this
environment): ``decode=fake`` produces deterministic fake features derived
from the payload bytes, so the Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested; ``decode=real`` raises
NotImplementedError at the clearly-marked seam where a codec library would
slot in. Two formats need no external codec, so their paths are REAL
end-to-end: binary PPM (P6) images (``encode_ppm``/``decode_ppm``/
``PpmDecodeStage``) and PCM16 WAV audio through the stdlib ``wave`` module
(``encode_wav``/``decode_wav``/``WavDecodeStage``) — real bytes, real
parsers, oracle-verified statistics (mediaops.image_channel_stats /
wav_audio_stats).

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


# -- REAL codecs (no external deps) -------------------------------------------
#
# The heavy codecs (JPEG/MP4) stay behind the NotImplementedError seam above,
# but two standard formats need nothing beyond the stdlib, so their decode
# paths are REAL end-to-end: binary PPM (P6) images parsed byte-for-byte, and
# PCM16 WAV audio through the stdlib ``wave`` reader. Real bytes go in, a
# real parser runs in the actor pool, and real pixel/sample statistics come
# out — oracle-verified in mediaops.image_channel_stats / wav_audio_stats.


def encode_ppm(media_id: int, width: int, height: int) -> bytes:
    """Deterministic binary-PPM (P6) image: pixel value for channel c at
    (x, y) is (media_id*7 + x*3 + y*5 + c*11) % 256 — closed form, so a SQL
    engine can compute any statistic of the DECODED image directly."""
    y, x, c = np.meshgrid(
        np.arange(height, dtype=np.int64),
        np.arange(width, dtype=np.int64),
        np.arange(3, dtype=np.int64),
        indexing="ij",
    )
    px = ((media_id * 7 + x * 3 + y * 5 + c * 11) % 256).astype(np.uint8)
    return f"P6\n{width} {height}\n255\n".encode() + px.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL binary-PPM parser: header tokens (with `#` comment support), one
    whitespace byte after maxval, then the raw RGB plane. Returns
    (height, width, 3) uint8; raises ValueError on malformed input."""
    tokens, i, n = [], 0, len(payload)
    while len(tokens) < 4 and i < n:
        ch = payload[i:i + 1]
        if ch.isspace():
            i += 1
        elif ch == b"#":
            while i < n and payload[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 4 or tokens[0] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    width, height, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    i += 1  # exactly one whitespace byte separates maxval from raster data
    raster = payload[i:i + width * height * 3]
    if len(raster) != width * height * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, np.uint8).reshape(height, width, 3)


def encode_wav(media_id: int, n_samples: int, rate: int = 8000) -> bytes:
    """Deterministic PCM16 mono WAV through the stdlib ``wave`` ENCODER:
    sample i = ((media_id*13 + i*31) % 4096) - 2048."""
    import io
    import wave

    s = (((media_id * 13 + np.arange(n_samples, dtype=np.int64) * 31) % 4096)
         - 2048).astype(np.int16)
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(s.tobytes())
    w.close()
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL WAV decode via the stdlib reader: (int16 samples, frame rate)."""
    import io
    import wave

    r = wave.open(io.BytesIO(payload), "rb")
    if r.getsampwidth() != 2 or r.getnchannels() != 1:
        raise ValueError("only PCM16 mono supported")
    samples = np.frombuffer(r.readframes(r.getnframes()), np.int16)
    return samples, r.getframerate()


class PpmDecodeStage:
    """Actor-pool stage with a REAL image kernel: parses each row's binary
    PPM payload and emits exact integer channel statistics
    (mean_{r,g,b}_q = channel sum * 1000 // pixel count). Small batches —
    payloads are the wide column — and the payload is dropped inside the
    stage, the same discipline as ImageDecodeStage."""

    BATCH_SIZE = 32

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        out = {"media_id": [], "width": [], "height": [],
               "mean_r_q": [], "mean_g_q": [], "mean_b_q": []}
        for mid, payload in zip(ids, batch.column("payload").to_pylist()):
            img = decode_ppm(payload)
            h, w, _ = img.shape
            sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            out["media_id"].append(mid)
            out["width"].append(w)
            out["height"].append(h)
            out["mean_r_q"].append(int(sums[0]) * 1000 // (w * h))
            out["mean_g_q"].append(int(sums[1]) * 1000 // (w * h))
            out["mean_b_q"].append(int(sums[2]) * 1000 // (w * h))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


class WavDecodeStage:
    """Actor-pool stage with a REAL audio kernel: stdlib ``wave`` parse of
    each PCM16 payload → sample count, duration and quantized RMS
    (floor(sqrt(ssq / n)) — integer-stable IEEE on any engine)."""

    BATCH_SIZE = 32

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        out = {"media_id": [], "n_samples": [], "duration_ms": [], "rms_q": []}
        for mid, payload in zip(ids, batch.column("payload").to_pylist()):
            samples, rate = decode_wav(payload)
            n = len(samples)
            ssq = int((samples.astype(np.int64) ** 2).sum())
            out["media_id"].append(mid)
            out["n_samples"].append(n)
            out["duration_ms"].append(n * 1000 // rate)
            out["rms_q"].append(int(np.floor(np.sqrt(ssq / n))) if n else 0)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


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


# -- BMP (24bpp) and PNG (RGB8) codecs ----------------------------------------
#
# Two more REAL image formats beside PPM, both stdlib-only. BMP carries the
# format's actual quirks — bottom-up row order and 4-byte row padding — so a
# parser that ignores either produces wrong pixels, not an error. PNG goes
# through real chunk framing: CRC32-validated chunks and a zlib-compressed
# IDAT stream with per-row filter bytes (encoder emits filter 0; the
# decoder validates and rejects others loudly).


def encode_bmp(media_id: int, width: int, height: int) -> bytes:
    """Deterministic 24bpp BMP (BITMAPINFOHEADER, bottom-up, padded rows):
    pixel channel value is the SAME closed form as encode_ppm, so one SQL
    expectation covers every image codec."""
    import struct

    y, x, c = np.meshgrid(
        np.arange(height, dtype=np.int64),
        np.arange(width, dtype=np.int64),
        np.arange(3, dtype=np.int64),
        indexing="ij",
    )
    px = ((media_id * 7 + x * 3 + y * 5 + c * 11) % 256).astype(np.uint8)
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    raster = bytearray()
    for yy in range(height - 1, -1, -1):       # bottom-up storage
        row = px[yy]                           # (width, 3) as R,G,B
        bgr = row[:, ::-1]                     # BMP stores B,G,R
        raster += bgr.tobytes() + b"\x00" * pad
    img_size = len(raster)
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       img_size, 2835, 2835, 0, 0)
    return header + info + bytes(raster)


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL BMP parser (24bpp uncompressed, bottom-up or top-down): reads
    both headers, honors the pixel-array offset, strips row padding,
    reorders B,G,R → R,G,B. Returns (height, width, 3) uint8."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = struct.unpack("<2sIHHI", payload[:14])
    (hsize, width, height, planes, bpp, comp) = struct.unpack(
        "<IiiHHI", payload[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    need = offset + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP raster")
    out = np.empty((height, width, 3), np.uint8)
    for i in range(height):
        start = offset + i * stride
        row = np.frombuffer(payload[start:start + row_bytes], np.uint8)
        yy = height - 1 - i if bottom_up else i
        out[yy] = row.reshape(width, 3)[:, ::-1]
    return out


def encode_png(media_id: int, width: int, height: int) -> bytes:
    """Deterministic RGB8 PNG via stdlib zlib + struct: real chunk framing
    (IHDR/IDAT/IEND with CRC32), filter byte 0 per scanline, same pixel
    closed form as encode_ppm."""
    import struct
    import zlib

    y, x, c = np.meshgrid(
        np.arange(height, dtype=np.int64),
        np.arange(width, dtype=np.int64),
        np.arange(3, dtype=np.int64),
        indexing="ij",
    )
    px = ((media_id * 7 + x * 3 + y * 5 + c * 11) % 256).astype(np.uint8)
    raw = b"".join(b"\x00" + px[yy].tobytes() for yy in range(height))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG parser for the RGB8/filter-0 profile: validates the
    signature and every chunk CRC, inflates the concatenated IDAT stream,
    checks each scanline's filter byte. Raises ValueError on any CRC or
    structural corruption."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    i, n = 8, len(payload)
    width = height = None
    idat = bytearray()
    while i + 8 <= n:
        (ln,) = struct.unpack(">I", payload[i:i + 4])
        tag = payload[i + 4:i + 8]
        body = payload[i + 8:i + 8 + ln]
        (crc,) = struct.unpack(">I", payload[i + 8 + ln:i + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("unsupported PNG profile")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + ln
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = 1 + width * 3
    if len(raw) != stride * height:
        raise ValueError("bad PNG raster size")
    out = np.empty((height, width, 3), np.uint8)
    for yy in range(height):
        row = raw[yy * stride:(yy + 1) * stride]
        if row[0] != 0:
            raise ValueError(f"unsupported PNG filter {row[0]}")
        out[yy] = np.frombuffer(row[1:], np.uint8).reshape(width, 3)
    return out


class ImageStatsStage:
    """Actor-pool stage over mixed-format image payloads: dispatches on
    magic bytes to the matching REAL parser (PPM/BMP/PNG) and emits exact
    integer channel means, or a quarantine status for payloads that fail
    to parse (dead-letter discipline: a corrupt byte never kills a wave).
    status: ok | bad_magic | corrupt."""

    BATCH_SIZE = 32

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        out = {"media_id": [], "status": [], "width": [], "height": [],
               "mean_r_q": [], "mean_g_q": [], "mean_b_q": []}
        for mid, payload in zip(ids, batch.column("payload").to_pylist()):
            status, img = "ok", None
            try:
                if payload[:2] == b"P6":
                    img = decode_ppm(payload)
                elif payload[:2] == b"BM":
                    img = decode_bmp(payload)
                elif payload[:8] == b"\x89PNG\r\n\x1a\n":
                    img = decode_png(payload)
                else:
                    status = "bad_magic"
            except Exception:
                # dead-letter discipline: ANY parse failure (ValueError,
                # struct.error, zlib.error) quarantines the row, never
                # kills the wave
                status = "corrupt"
            out["media_id"].append(mid)
            out["status"].append(status)
            if img is None:
                for k in ("width", "height", "mean_r_q", "mean_g_q",
                          "mean_b_q"):
                    out[k].append(-1)
            else:
                h, w, _ = img.shape
                sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r_q"].append(int(sums[0]) * 1000 // (w * h))
                out["mean_g_q"].append(int(sums[1]) * 1000 // (w * h))
                out["mean_b_q"].append(int(sums[2]) * 1000 // (w * h))
        cols = {"media_id": pa.array(out["media_id"], pa.int64()),
                "status": pa.array(out["status"], pa.string())}
        for k in ("width", "height", "mean_r_q", "mean_g_q", "mean_b_q"):
            cols[k] = pa.array(out[k], pa.int64())
        return pa.table(cols)
