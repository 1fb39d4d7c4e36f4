"""Multimodal row-level operators, oracle-backed.

``media_pipeline_stats`` (mlqueries.py) verifies the multimodal plumbing at
the AGGREGATE level; this module promotes the individual stages to row-level
driver-verified queries: every sampled frame, every audio chunk and every
resize plan row is value-hashed against a DuckDB twin. The media table is
synthesized deterministically from ``documents`` with the same kind rule as
media_pipeline_stats (kind = doc_id % 3 over image/audio/video, video/audio
duration = 1000 + n_chars ms, payload = UTF-8 text bytes) plus synthetic
image geometry (width = 320 + 7*doc_id % 1280, height = 240 + 13*doc_id
% 720) so the three stages all have realistic inputs.

Reference parity: omni-crawler processes media URLs as opaque downloads with
typed metadata (media_extractor.py's image/audio handling); these stages are
the Ray-Data-native shape of that work — actor-pool map_batches with small
batches for wide binary rows, explode patterns for frame/window-level rows,
and the wide payload column dropped inside the stage.

Scale shape: all three queries are pure map-side explodes over one read —
zero shuffle, no driver materialization until the (row-sized) result table.
At 100 TB the explode fan-out is bounded per row (frames = duration/500ms,
chunks = chars/100), so block sizes stay predictable; the binary payload
never crosses a stage boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .queries import _read

from ..stages.multimodal import AudioChunkStage, FrameSampleStage, ResizePlanStage
from .mlqueries import _hex_u32_le

_KINDS = ["image", "audio", "video"]


def _media(sf_dir: str) -> ray.data.Dataset:
    """documents → deterministic media table (see module docstring)."""
    ds = _read(
        sf_dir, "documents", columns=["doc_id", "text", "n_chars"]
    )

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        texts = [(x or "") for x in t["text"].to_pylist()]
        n_chars = t["n_chars"].to_numpy().astype(np.int64)
        kind = [_KINDS[int(i) % 3] for i in ids]
        dur = np.where(ids % 3 == 0, 0, 1000 + n_chars).astype(np.int32)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind, pa.string()),
            "payload": pa.array([s.encode() for s in texts], pa.binary()),
            "duration_ms": pa.array(dur, pa.int32()),
            "width": pa.array(320 + (ids * 7) % 1280, pa.int32()),
            "height": pa.array(240 + (ids * 13) % 720, pa.int32()),
        })

    return ds.map_batches(to_media, batch_format="pyarrow")


def _collect_i64(ds: ray.data.Dataset, str_cols: tuple[str, ...] = ()) -> pa.Table:
    """Materialize a row-sized result with every non-string column as int64
    (the repo's driver-compare rule: integer values, identical dtypes)."""
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False).replace_schema_metadata(None)
    cols = {
        name: (t[name] if name in str_cols else pc.cast(t[name], pa.int64()))
        for name in t.column_names
    }
    return pa.table(cols)


def frame_sample_index(sf_dir: str):
    """Row-level frame sampling through the REAL FrameSampleStage (one row
    per sampled 500 ms frame of every video): the driver verifies the
    explode arithmetic per frame, not just the aggregate frame count that
    media_pipeline_stats checks."""
    frames = _media(sf_dir).map_batches(
        FrameSampleStage(every_ms=500),
        batch_format="pyarrow", batch_size=FrameSampleStage.BATCH_SIZE,
    )
    return _collect_i64(frames)


SQL_FRAME_SAMPLE_INDEX = r"""
WITH v AS (
  SELECT doc_id AS media_id, 1000 + n_chars AS dur
  FROM documents WHERE doc_id % 3 = 2
)
SELECT v.media_id,
       CAST(u.i AS BIGINT) AS frame_index,
       CAST(u.i * 500 AS BIGINT) AS frame_ts_ms
FROM v, UNNEST(range(0, (v.dur + 499) // 500)) AS u(i)
"""


def audio_chunks(sf_dir: str):
    """Fixed-width transcript chunking through the REAL AudioChunkStage
    (one row per 100-char window of every audio payload), each chunk
    carrying a uint32-LE sha256 checksum of its character slice — the
    integrity column the DuckDB twin reproduces bit-for-bit."""
    chunks = _media(sf_dir).map_batches(
        AudioChunkStage(chunk_chars=100),
        batch_format="pyarrow", batch_size=AudioChunkStage.BATCH_SIZE,
    )
    return _collect_i64(chunks)


SQL_AUDIO_CHUNKS = f"""
WITH a AS (
  SELECT doc_id AS media_id, coalesce(text, '') AS text
  FROM documents WHERE doc_id % 3 = 1
), c AS (
  SELECT media_id, u.i AS ci,
         substring(text, u.i * 100 + 1, 100) AS piece
  FROM a, UNNEST(range(0, (len(text) + 99) // 100)) AS u(i)
), h AS (
  SELECT media_id, ci, len(piece) AS piece_len, sha256(piece) AS hx FROM c
)
SELECT media_id,
       CAST(ci AS BIGINT) AS chunk_index,
       CAST(ci * 100 AS BIGINT) AS start_pos,
       CAST(piece_len AS BIGINT) AS chunk_len,
       CAST({_hex_u32_le('hx')} AS BIGINT) AS chunk_crc
FROM h
"""


def resize_plan(sf_dir: str):
    """Integer-exact aspect-fit resize planning through the REAL
    ResizePlanStage: output geometry for a 224×224 target box per image,
    the metadata a real resize kernel consumes per row."""
    plans = _media(sf_dir).map_batches(
        ResizePlanStage(target=224),
        batch_format="pyarrow", batch_size=ResizePlanStage.BATCH_SIZE,
    )
    return _collect_i64(plans)


SQL_RESIZE_PLAN = r"""
WITH i AS (
  SELECT doc_id AS media_id,
         320 + (doc_id * 7) % 1280 AS width,
         240 + (doc_id * 13) % 720 AS height
  FROM documents WHERE doc_id % 3 = 0
), p AS (
  SELECT media_id, width, height,
         greatest(1, (width * 224) // greatest(width, height, 1)) AS out_w,
         greatest(1, (height * 224) // greatest(width, height, 1)) AS out_h
  FROM i
)
SELECT media_id, CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       CAST(out_w AS BIGINT) AS out_w, CAST(out_h AS BIGINT) AS out_h,
       CAST(out_w * out_h * 3 AS BIGINT) AS est_bytes
FROM p
"""


# -- REAL-codec queries --------------------------------------------------------
#
# These two close the realism gap between the stubbed JPEG/MP4 seam and the
# plumbing-only checks: real encoded bytes are synthesized per document,
# decoded by a REAL parser inside the actor-pool stage (byte-level PPM
# tokenizer / stdlib ``wave`` reader), and the DECODED statistics are
# verified against a DuckDB twin that computes the closed-form expectation
# directly — if the parser mis-reads a single byte, the hash mismatches.


def image_channel_stats(sf_dir: str):
    """Images (doc_id % 3 == 0) are encoded as REAL binary-PPM payloads
    (variable geometry w=32+(id%8)*4, h=24+(id%6)*4), then decoded by
    PpmDecodeStage (an actual P6 parser, not a checksum of opaque bytes);
    output is each image's exact integer channel means.

    Scale shape: encode and decode are both map-side in one fused pass;
    payload bytes never cross a stage boundary; zero shuffle."""
    from ..stages.multimodal import PpmDecodeStage, encode_ppm

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_ppm(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        ids = ids[ids % 3 == 0]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(
                [encode_ppm(int(i), 32 + int(i) % 8 * 4, 24 + int(i) % 6 * 4)
                 for i in ids], pa.binary()),
        })

    out = (
        ds.map_batches(to_ppm, batch_format="pyarrow")
        .map_batches(PpmDecodeStage, batch_format="pyarrow",
                     batch_size=PpmDecodeStage.BATCH_SIZE, concurrency=2)
    )
    return _collect_i64(out)


SQL_IMAGE_CHANNEL_STATS = """
WITH imgs AS (
  SELECT doc_id AS media_id,
         32 + (doc_id % 8) * 4 AS w, 24 + (doc_id % 6) * 4 AS h
  FROM documents WHERE doc_id % 3 = 0
), rows_y AS (
  SELECT media_id, w, h, unnest(range(h)) AS y FROM imgs
), px AS (
  SELECT media_id, w, h, y, unnest(range(w)) AS x FROM rows_y
), sums AS (
  SELECT media_id, w, h,
         sum((media_id * 7 + x * 3 + y * 5) % 256) AS sr,
         sum((media_id * 7 + x * 3 + y * 5 + 11) % 256) AS sg,
         sum((media_id * 7 + x * 3 + y * 5 + 22) % 256) AS sb
  FROM px GROUP BY 1, 2, 3
)
SELECT media_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(sr * 1000 // (w * h) AS BIGINT) AS mean_r_q,
       CAST(sg * 1000 // (w * h) AS BIGINT) AS mean_g_q,
       CAST(sb * 1000 // (w * h) AS BIGINT) AS mean_b_q
FROM sums
"""


def wav_audio_stats(sf_dir: str):
    """Audio docs (doc_id % 3 == 1) are encoded as REAL PCM16 WAV bytes via
    the stdlib ``wave`` encoder (n = 4000 + (id%7)*500 samples @ 8 kHz),
    decoded back by WavDecodeStage through the stdlib reader, and reduced
    to (n_samples, duration_ms, quantized RMS). The RIFF header, frame
    count and sample bytes all round-trip for real."""
    from ..stages.multimodal import WavDecodeStage, encode_wav

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_wav(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        ids = ids[ids % 3 == 1]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(
                [encode_wav(int(i), 4000 + int(i) % 7 * 500) for i in ids],
                pa.binary()),
        })

    out = (
        ds.map_batches(to_wav, batch_format="pyarrow")
        .map_batches(WavDecodeStage, batch_format="pyarrow",
                     batch_size=WavDecodeStage.BATCH_SIZE, concurrency=2)
    )
    return _collect_i64(out)


SQL_WAV_AUDIO_STATS = """
WITH auds AS (
  SELECT doc_id AS media_id, 4000 + (doc_id % 7) * 500 AS n
  FROM documents WHERE doc_id % 3 = 1
), samp AS (
  SELECT media_id, n, unnest(range(n)) AS i FROM auds
), s AS (
  SELECT media_id, n,
         sum(((media_id * 13 + i * 31) % 4096 - 2048)
             * ((media_id * 13 + i * 31) % 4096 - 2048)) AS ssq
  FROM samp GROUP BY 1, 2
)
SELECT media_id, CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
       CAST(floor(sqrt(ssq::DOUBLE / n)) AS BIGINT) AS rms_q
FROM s
"""


def mixed_codec_image_stats(sf_dir: str):
    """Every doc becomes a REAL encoded image in a per-id rotating format
    (PPM / BMP / PNG by doc_id % 3 — three genuine codecs incl. BMP's
    bottom-up padded rows and PNG's CRC-framed zlib IDAT), decoded by
    ImageStatsStage's magic-byte dispatch; the channel means share the PPM
    closed form, so ONE SQL expectation covers all three parsers. A wrong
    pad/filter/CRC path shows up as a hash mismatch, not a crash.

    Scale shape: encode + decode fused map-side, payloads never cross a
    stage boundary, zero shuffle."""
    from ..stages.multimodal import (ImageStatsStage, encode_bmp,
                                     encode_png, encode_ppm)

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    encoders = [encode_ppm, encode_bmp, encode_png]

    def to_img(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(
                [encoders[int(i) % 3](int(i), 16 + int(i) % 5 * 4,
                                      12 + int(i) % 4 * 4)
                 for i in ids], pa.binary()),
        })

    out = (
        ds.map_batches(to_img, batch_format="pyarrow")
        .map_batches(ImageStatsStage, batch_format="pyarrow",
                     batch_size=ImageStatsStage.BATCH_SIZE, concurrency=2)
        .drop_columns(["status"])  # all-ok here; the census op audits it
    )
    return _collect_i64(out)


SQL_MIXED_CODEC_STATS = """
WITH imgs AS (
  SELECT doc_id AS media_id,
         16 + (doc_id % 5) * 4 AS w, 12 + (doc_id % 4) * 4 AS h
  FROM documents
), rows_y AS (
  SELECT media_id, w, h, unnest(range(h)) AS y FROM imgs
), px AS (
  SELECT media_id, w, h, y, unnest(range(w)) AS x FROM rows_y
), sums AS (
  SELECT media_id, w, h,
         sum((media_id * 7 + x * 3 + y * 5) % 256) AS sr,
         sum((media_id * 7 + x * 3 + y * 5 + 11) % 256) AS sg,
         sum((media_id * 7 + x * 3 + y * 5 + 22) % 256) AS sb
  FROM px GROUP BY 1, 2, 3
)
SELECT media_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(sr * 1000 // (w * h) AS BIGINT) AS mean_r_q,
       CAST(sg * 1000 // (w * h) AS BIGINT) AS mean_g_q,
       CAST(sb * 1000 // (w * h) AS BIGINT) AS mean_b_q
FROM sums
"""


def media_quarantine_census(sf_dir: str):
    """Corruption quarantine: known ids are deliberately damaged (doc_id %
    11 == 0 → payload truncated to half; else doc_id % 13 == 0 → magic
    bytes stomped) before the SAME decode stage; the (status, fmt) census
    proves the dead-letter routing — parse failures quarantine the row,
    never kill the wave, and nothing healthy is miscounted."""
    from ..stages.multimodal import (ImageStatsStage, encode_bmp,
                                     encode_png, encode_ppm)

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    encoders = [encode_ppm, encode_bmp, encode_png]

    def to_img(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        payloads = []
        for i in ids:
            p = encoders[int(i) % 3](int(i), 16 + int(i) % 5 * 4,
                                     12 + int(i) % 4 * 4)
            if int(i) % 11 == 0:
                p = p[: len(p) // 2]
            elif int(i) % 13 == 0:
                p = b"XX" + p[2:]
            payloads.append(p)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })

    decoded = (
        ds.map_batches(to_img, batch_format="pyarrow")
        .map_batches(ImageStatsStage, batch_format="pyarrow",
                     batch_size=ImageStatsStage.BATCH_SIZE, concurrency=2)
    )

    def fmt_col(t: pa.Table) -> pa.Table:
        fmts = ["ppm", "bmp", "png"]
        f = [fmts[int(i) % 3] for i in t["media_id"].to_pylist()]
        return pa.table({"status": t["status"],
                         "fmt": pa.array(f, pa.string())})

    from ray.data.aggregate import Count

    out = (
        decoded.map_batches(fmt_col, batch_format="pyarrow")
        .groupby(["status", "fmt"]).aggregate(Count(alias_name="n_items"))
        .to_pandas().sort_values(["status", "fmt"]).reset_index(drop=True)
    )
    out["n_items"] = out["n_items"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_MEDIA_QUARANTINE = """
WITH lab AS (
  SELECT CASE WHEN doc_id % 11 = 0 THEN 'corrupt'
              WHEN doc_id % 13 = 0 THEN 'bad_magic'
              ELSE 'ok' END AS status,
         CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
              ELSE 'png' END AS fmt
  FROM documents
)
SELECT status, fmt, CAST(count(*) AS BIGINT) AS n_items
FROM lab GROUP BY 1, 2
"""


MEDIAOPS_REGISTRY = {
    "frame_sample_index": (frame_sample_index, SQL_FRAME_SAMPLE_INDEX),
    "audio_chunks": (audio_chunks, SQL_AUDIO_CHUNKS),
    "resize_plan": (resize_plan, SQL_RESIZE_PLAN),
    "image_channel_stats": (image_channel_stats, SQL_IMAGE_CHANNEL_STATS),
    "wav_audio_stats": (wav_audio_stats, SQL_WAV_AUDIO_STATS),
    "mixed_codec_image_stats": (mixed_codec_image_stats, SQL_MIXED_CODEC_STATS),
    "media_quarantine_census": (media_quarantine_census, SQL_MEDIA_QUARANTINE),
}
