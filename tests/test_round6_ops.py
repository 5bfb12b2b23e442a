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


def test_synthesize_payloads_container_dispatch(spark):
    """doc_id % 8 == 0 -> JPEG, other % 4 == 0 -> PNG, other evens ->
    PPM, odds -> WAV; every image round-trips to its exact constant
    color through its own real codec."""
    from mapreducecore_spark.llm.multimodal import synthesize_payloads

    ids = spark.range(0, 16).selectExpr("id AS doc_id")
    rows = {
        r["doc_id"]: bytes(r["payload"])
        for r in synthesize_payloads(ids).collect()
    }
    assert rows[0][:2] == b"\xff\xd8"
    assert rows[8][:2] == b"\xff\xd8"
    assert rows[4][:8] == b"\x89PNG\r\n\x1a\n"
    assert rows[12][:8] == b"\x89PNG\r\n\x1a\n"
    assert rows[2][:2] == b"P6"
    assert rows[6][:2] == b"P6"
    assert rows[1][:4] == b"RIFF"
    # Round-trip inside the fixture: constant color v = doc_id % 251,
    # exact for all three image codecs (JPEG is DC-only under the
    # all-ones quant tables, so even the lossy codec is exact here).
    for d, kind in ((8, "image/jpeg"), (4, "image/png"), (2, "image/ppm")):
        m = decode_payload(rows[d])
        assert m["kind"] == kind
        assert m["mean_pixel"] == pytest.approx(d % 251)
        assert (m["width"], m["height"]) == (4 + d % 13, 3 + d % 7)


# ------------------------------------------------- baseline JPEG codec
# Reference behavior: ITU T.81 (baseline sequential DCT, Annex K
# interchange Huffman tables) + JFIF YCbCr conversion. All assertions
# are against independently-computed values (naive textbook DCT sums,
# hand-derived DC-only blocks) — no external imaging library involved.


def _jpeg_imports():
    from mapreducecore_spark.llm import multimodal as mm

    return mm


def test_jpeg_constant_color_roundtrip_exact():
    """A constant image is DC-only; with all-ones quant the coefficient
    survives round() unchanged, so decode must reproduce the color
    EXACTLY — the property the fixture oracle relies on."""
    mm = _jpeg_imports()
    for v in (0, 7, 93, 128, 250, 255):
        for w, h in ((4, 3), (16, 9), (8, 8), (5, 11)):
            payload = mm.encode_jpeg(w, h, bytes([v]) * (3 * w * h))
            m = mm.decode_jpeg(payload)
            assert (m["width"], m["height"]) == (w, h)
            assert m["kind"] == "image/jpeg"
            assert m["mean_pixel"] == float(v)


def test_jpeg_gradient_roundtrip_bounded_error():
    """Non-constant rasters exercise the AC run-length path end to end
    (ZRL, EOB, every coefficient category). With all-ones quant the
    only loss is coefficient rounding (|dF| <= 0.5 each), so pixels
    must come back within a small bound — and NOT exactly, which would
    indicate the AC path was silently skipped."""
    mm = _jpeg_imports()
    rng = np.random.default_rng(42)
    saw_diff = False
    for _ in range(4):
        w, h = int(rng.integers(3, 24)), int(rng.integers(3, 24))
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        payload = mm.encode_jpeg(w, h, px.tobytes())
        _, _, got = mm._jpeg_raster(payload)
        err = np.abs(got.astype(int) - px.astype(int))
        assert err.max() <= 3
        saw_diff |= bool(err.any())
    assert saw_diff  # lossy codec on noise: bit-exactness would be a bug


def test_jpeg_dct_matrix_matches_textbook_definition():
    """The encoder/decoder share _DCT_C; verify it against the naive
    O(n^4) DCT-II double sum from the spec so a shared-matrix bug
    cannot cancel out between encode and decode."""
    mm = _jpeg_imports()
    rng = np.random.default_rng(7)
    x = rng.uniform(-128, 127, (8, 8))
    fast = mm._DCT_C @ x @ mm._DCT_C.T
    naive = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = sum(
                x[i, j]
                * np.cos((2 * i + 1) * u * np.pi / 16)
                * np.cos((2 * j + 1) * v * np.pi / 16)
                for i in range(8)
                for j in range(8)
            )
            naive[u, v] = 0.25 * cu * cv * s
    np.testing.assert_allclose(fast, naive, atol=1e-9)


def test_jpeg_zigzag_order_is_the_spec_sequence():
    mm = _jpeg_imports()
    # First and last entries of the canonical zigzag, per T.81 fig. 5.
    expected_head = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4]
    assert list(mm._ZZ_FLAT[:15]) == expected_head
    assert list(mm._ZZ_FLAT[-3:]) == [55, 62, 63]
    assert sorted(mm._ZZ_FLAT) == list(range(64))


def test_jpeg_huffman_tables_are_canonical_and_prefix_free():
    mm = _jpeg_imports()
    for bits, vals, n in (
        (mm._DC_LUMA_BITS, mm._DC_LUMA_VALS, 12),
        (mm._DC_CHROMA_BITS, mm._DC_CHROMA_VALS, 12),
        (mm._AC_LUMA_BITS, mm._AC_LUMA_VALS, 162),
        (mm._AC_CHROMA_BITS, mm._AC_CHROMA_VALS, 162),
    ):
        assert sum(bits) == len(vals) == n
        codes = mm._huffman_codes(bits, vals)
        # Prefix-free: no code is a prefix of a longer one.
        as_strings = sorted(
            format(c, f"0{ln}b") for c, ln in codes.values()
        )
        for a, b in zip(as_strings, as_strings[1:]):
            assert not b.startswith(a)


def test_jpeg_restart_markers_roundtrip():
    """DRI + RSTn: predictors reset and the bit reader re-aligns at
    every interval — wrong handling corrupts every block after the
    first marker."""
    mm = _jpeg_imports()
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (20, 25, 3)).astype(np.uint8)
    for interval in (1, 2, 5):
        payload = mm.encode_jpeg(25, 20, px.tobytes(), restart_interval=interval)
        _, _, got = mm._jpeg_raster(payload)
        assert np.abs(got.astype(int) - px.astype(int)).max() <= 3


def test_jpeg_grayscale_single_component_scan():
    mm = _jpeg_imports()
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (11, 13)).astype(np.uint8)
    px = np.repeat(g[:, :, None], 3, axis=2)
    payload = mm.encode_jpeg(13, 11, px.tobytes(), grayscale=True)
    w, h, got = mm._jpeg_raster(payload)
    assert (w, h) == (13, 11)
    # Grayscale skips the chroma transform: only DCT rounding remains.
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 1


def test_jpeg_nondefault_quant_tables_are_applied():
    """Encode with a coarse quant table: the decoder must read the DQT
    segment and multiply it back (ignoring it would shrink every pixel
    toward 128)."""
    mm = _jpeg_imports()
    q = np.full((8, 8), 16, dtype=np.int64)
    v = 200
    payload = mm.encode_jpeg(8, 8, bytes([v]) * 192, quant_luma=q, quant_chroma=q)
    m = mm.decode_jpeg(payload)
    # DC = round(8*(200-128)/16) = 36; dequant 36*16 = 576; IDCT -> 72 + 128.
    assert m["mean_pixel"] == pytest.approx(200.0)


def test_jpeg_unsupported_shapes_raise_not_implemented():
    """Progressive (SOF2) and subsampled chroma hit a loud seam, never
    a silently-wrong raster."""
    mm = _jpeg_imports()
    payload = bytearray(mm.encode_jpeg(8, 8, bytes(192)))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        mm._jpeg_raster(bytes(payload))
    payload = bytearray(mm.encode_jpeg(8, 8, bytes(192)))
    i = payload.index(b"\xff\xc0")
    payload[i + 11] = 0x22  # luma sampling 2x2 => 4:2:0
    with pytest.raises(NotImplementedError):
        mm._jpeg_raster(bytes(payload))


def test_jpeg_byte_stuffing_survives_0xff_entropy_bytes():
    """Sweep enough distinct constant images that some entropy stream
    contains a 0xFF byte needing a stuffed 0x00; every one must still
    round-trip exactly."""
    mm = _jpeg_imports()
    stuffed = 0
    for v in range(0, 256, 3):
        payload = mm.encode_jpeg(9, 9, bytes([v]) * 243)
        sos = payload.index(b"\xff\xda")
        stuffed += payload.count(b"\xff\x00", sos)
        assert mm.decode_jpeg(payload)["mean_pixel"] == float(v)
    assert stuffed > 0
