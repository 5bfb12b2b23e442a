"""Round-6 tests: the stdlib-zlib PNG codec (VERDICT r5 #7) and the
windowed star-pair emission (ADVICE r5).

PNG reference behavior: PNG spec (RFC 2083) critical chunks, filter
types 0-4; cross-checked against hand-computed rasters, no external
imaging library involved.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mapreducecore_spark.llm.multimodal import (
    _png_raster,
    decode_png,
    decode_payload,
    encode_png,
)


def _gradient_rgb(w: int, h: int, d: int = 0) -> np.ndarray:
    r = np.arange(h).reshape(-1, 1, 1)
    c = np.arange(w).reshape(1, -1, 1)
    ch = np.arange(3).reshape(1, 1, -1)
    return ((r * 7 + c * 13 + ch * 29 + d) % 256).astype(np.uint8)


def test_png_roundtrip_gradient_exact_raster():
    """encode_png rotates filters None/Sub/Up per scanline; the decoder
    must reproduce every byte of a non-constant raster (a constant
    image would hide wrong defilter index math)."""
    for w, h, d in [(4, 3, 0), (16, 9, 5), (1, 1, 7), (13, 2, 11)]:
        px = _gradient_rgb(w, h, d)
        payload = encode_png(w, h, px.tobytes())
        got_w, got_h, got = _png_raster(payload)
        assert (got_w, got_h) == (w, h)
        assert np.array_equal(got, px)


def test_png_decode_metadata_and_dispatch():
    px = _gradient_rgb(5, 4)
    payload = encode_png(5, 4, px.tobytes())
    m = decode_png(payload)
    assert m["kind"] == "image/png"
    assert (m["width"], m["height"]) == (5, 4)
    assert m["mean_pixel"] == pytest.approx(float(px.mean()))
    # decode_payload dispatches on the 8-byte magic
    assert decode_payload(payload)["kind"] == "image/png"


def _encode_png_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """Hand-encoder covering ALL filter types (incl. Average=3 and
    Paeth=4, which encode_png never emits) so the decoder's full
    defilter matrix is exercised."""
    h, w, _ = px.shape
    raster = px.reshape(h, w * 3).astype(np.int32)
    bpp = 3
    lines = []
    for r in range(h):
        row = raster[r]
        prev = raster[r - 1] if r else np.zeros(w * 3, np.int32)
        ft = filters[r % len(filters)]
        enc = np.zeros(w * 3, np.int32)
        for j in range(w * 3):
            a = row[j - bpp] if j >= bpp else 0
            b = prev[j]
            c = prev[j - bpp] if j >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[j] = (row[j] - pred) % 256
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_handles_average_and_paeth_filters():
    px = _gradient_rgb(7, 6, 3)
    payload = _encode_png_with_filters(px, [3, 4, 1, 2, 0])
    _, _, got = _png_raster(payload)
    assert np.array_equal(got, px)


def test_png_crc_corruption_is_detected():
    payload = bytearray(encode_png(4, 3, _gradient_rgb(4, 3).tobytes()))
    # flip one bit inside the IDAT body (after the 8-byte magic + the
    # 25-byte IHDR chunk + 8-byte IDAT header)
    payload[8 + 25 + 8] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_png_unsupported_shapes_raise_not_implemented():
    """Grayscale / 16-bit / interlaced PNGs hit a loud seam, never a
    silent wrong answer."""
    px = _gradient_rgb(4, 3)
    payload = bytearray(encode_png(4, 3, px.tobytes()))
    # IHDR body starts at offset 16: width(4) height(4) depth(1) color(1)
    payload[16 + 9] = 0  # color type 0 = grayscale
    # re-stamp the IHDR CRC so we reach the shape check, not the CRC check
    body = bytes(payload[16 : 16 + 13])
    payload[16 + 13 : 16 + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError):
        decode_png(bytes(payload))


def test_synthesize_payloads_plants_png_for_mod4_ids(spark):
    from mapreducecore_spark.llm.multimodal import synthesize_payloads

    ids = spark.range(0, 8).selectExpr("id AS doc_id")
    rows = {
        r["doc_id"]: bytes(r["payload"])
        for r in synthesize_payloads(ids).collect()
    }
    assert rows[0][:8] == b"\x89PNG\r\n\x1a\n"
    assert rows[4][:8] == b"\x89PNG\r\n\x1a\n"
    assert rows[2][:2] == b"P6"
    assert rows[6][:2] == b"P6"
    assert rows[1][:4] == b"RIFF"
    # PNG round-trip inside the fixture: constant color v = doc_id % 251
    m = decode_payload(rows[4])
    assert m["mean_pixel"] == pytest.approx(4 % 251)
    assert (m["width"], m["height"]) == (4 + 4 % 13, 3 + 4 % 7)
