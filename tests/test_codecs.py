"""Batch-75 codec invariants: BMP and PNG round-trips are pixel-identical
to the PPM closed form (incl. BMP's padded non-multiple-of-4 widths and
top-down negative-height variant), PNG CRC corruption is DETECTED (not
silently decoded), and the quarantine stage routes every damage class."""

import struct

import numpy as np
import pytest

from omni_ray.stages.multimodal import (
    ImageStatsStage,
    decode_bmp,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
)


def test_bmp_png_match_ppm_pixels():
    for w, h in ((33, 24), (31, 17), (5, 3), (4, 4)):
        ref = decode_ppm(encode_ppm(9, w, h))
        assert (decode_bmp(encode_bmp(9, w, h)) == ref).all(), (w, h)
        assert (decode_png(encode_png(9, w, h)) == ref).all(), (w, h)


def test_bmp_top_down_variant():
    p = bytearray(encode_bmp(5, 7, 4))
    ref = decode_bmp(bytes(p))
    # flip to top-down: negative height + re-ordered raster
    (h,) = struct.unpack("<i", bytes(p[22:26]))
    p[22:26] = struct.pack("<i", -h)
    stride = (7 * 3 + 3) // 4 * 4
    rows = [bytes(p[54 + i * stride:54 + (i + 1) * stride])
            for i in range(h)]
    p[54:] = b"".join(reversed(rows))
    assert (decode_bmp(bytes(p)) == ref).all()


def test_png_crc_detected():
    p = bytearray(encode_png(3, 9, 6))
    # stomp one byte inside the IDAT body: CRC must catch it
    idat = bytes(p).find(b"IDAT")
    p[idat + 7] ^= 0xFF
    with pytest.raises(ValueError, match="bad CRC"):
        decode_png(bytes(p))
    # and a wrong filter byte is rejected, not misrendered
    import zlib
    raw = bytearray(b"")
    for yy in range(2):
        raw += bytes([1]) + bytes(9 * 3)  # filter 1: unsupported profile
    body = zlib.compress(bytes(raw))

    def chunk(tag, b):
        return (struct.pack(">I", len(b)) + tag + b
                + struct.pack(">I", zlib.crc32(tag + b) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 9, 2, 8, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", body) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="filter"):
        decode_png(bad)


def test_quarantine_stage_direct():
    import pyarrow as pa

    good = encode_png(1, 8, 8)
    batch = pa.table({
        "media_id": pa.array([1, 2, 3, 4], pa.int64()),
        "payload": pa.array([
            good,
            good[: len(good) // 2],        # truncated -> corrupt
            b"XX" + good[2:],              # stomped magic -> bad_magic
            encode_bmp(4, 6, 6)[:20],      # truncated BMP -> corrupt
        ], pa.binary()),
    })
    out = ImageStatsStage()(batch).to_pandas().set_index("media_id")
    assert out.loc[1, "status"] == "ok" and out.loc[1, "width"] == 8
    assert out.loc[2, "status"] == "corrupt"
    assert out.loc[3, "status"] == "bad_magic"
    assert out.loc[4, "status"] == "corrupt"
    assert (out.loc[[2, 3, 4], "width"] == -1).all()
