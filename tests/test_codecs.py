"""Codec-free multimodal decoders (gdal_spark.codecs + decode_real).

The decoders are the product surface; the encoders exist to synthesize
fixtures. Round-trips alone could hide a bug shared by both sides, so
the PNG filter math is also checked against hand-filtered byte vectors
built directly from RFC 2083 §6 definitions, and BMP/WAV against
hand-packed headers.
"""

import struct
import zlib

import numpy as np
import pytest

from gdal_spark import codecs as C
from gdal_spark.multimodal import decode_real


def test_bmp_round_trip_shapes():
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (2, 3), (5, 4), (9, 16), (7, 1), (1, 13)]:
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(C.decode_bmp(C.encode_bmp(a)), a), (h, w)


def test_bmp_hand_packed_header_and_padding():
    """2×2 RGB: bottom-up BGR rows padded to 4 bytes, offset 54."""
    a = np.array([[[255, 0, 0], [0, 255, 0]],
                  [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    b = C.encode_bmp(a)
    assert b[:2] == b"BM" and struct.unpack_from("<I", b, 10)[0] == 54
    row_bytes = 8  # 2 px * 3 B = 6, padded to 8
    # first stored row is the BOTTOM image row, BGR
    assert b[54:54 + 6] == bytes([255, 0, 0, 30, 20, 10])
    assert b[54 + 6:54 + row_bytes] == b"\x00\x00"
    assert np.array_equal(C.decode_bmp(b), a)


def test_png_round_trip_exercises_all_filters():
    """≥5 rows cycles filter types 0..4 on encode (by construction);
    decode must reconstruct exactly."""
    rng = np.random.default_rng(13)
    a = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    raw = zlib.decompress(_idat(C.encode_png(a)))
    stride = 7 * 3
    fts = [raw[y * (stride + 1)] for y in range(11)]
    assert fts[:5] == [0, 1, 2, 3, 4]
    assert np.array_equal(C.decode_png(C.encode_png(a)), a)


def _idat(png: bytes) -> bytes:
    pos, out = 8, bytearray()
    while pos + 8 <= len(png):
        size, ctype = struct.unpack_from(">I4s", png, pos)
        if ctype == b"IDAT":
            out += png[pos + 8: pos + 8 + size]
        pos += 12 + size
    return bytes(out)


def _png_from_scanlines(w: int, h: int, scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (C.PNG_SIG + C._chunk(b"IHDR", ihdr)
            + C._chunk(b"IDAT", zlib.compress(scanlines))
            + C._chunk(b"IEND", b""))


def test_png_decode_hand_filtered_vectors():
    """Decode a PNG whose scanlines were filtered BY HAND from the
    RFC 2083 definitions (not by encode_png), one row per filter type.
    2 px/row, bpp=3. Raw rows chosen so every predictor is non-trivial."""
    rows = np.array([
        [10, 20, 30, 40, 50, 60],      # ft 0 (None): stored raw
        [5, 250, 7, 9, 251, 13],       # ft 1 (Sub): x - left
        [100, 1, 2, 200, 3, 4],        # ft 2 (Up): x - prior
        [90, 200, 50, 30, 8, 250],     # ft 3 (Average)
        [1, 2, 3, 254, 255, 0],        # ft 4 (Paeth)
    ], dtype=np.int64)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    lines = bytearray()
    lines += bytes([0]) + bytes((rows[0] % 256).astype(np.uint8))
    r, up = rows[1], rows[0]
    lines += bytes([1]) + bytes(
        [(int(r[i]) - (int(r[i - 3]) if i >= 3 else 0)) % 256
         for i in range(6)])
    r, up = rows[2], rows[1]
    lines += bytes([2]) + bytes(
        [(int(r[i]) - int(up[i])) % 256 for i in range(6)])
    r, up = rows[3], rows[2]
    lines += bytes([3]) + bytes(
        [(int(r[i]) - ((int(r[i - 3]) if i >= 3 else 0)
                       + int(up[i])) // 2) % 256 for i in range(6)])
    r, up, upl = rows[4], rows[3], rows[3]
    lines += bytes([4]) + bytes(
        [(int(r[i]) - paeth(int(r[i - 3]) if i >= 3 else 0, int(up[i]),
                            int(upl[i - 3]) if i >= 3 else 0)) % 256
         for i in range(6)])
    out = C.decode_png(_png_from_scanlines(2, 5, bytes(lines)))
    assert np.array_equal(out, rows.astype(np.uint8).reshape(5, 2, 3))


def test_wav_round_trip_and_extra_chunk():
    """Decoder walks the RIFF chunk list — a LIST chunk between fmt
    and data (as real encoders emit) must be skipped, including the
    odd-size word-alignment pad."""
    s = (np.arange(-300, 300, 7)).astype(np.int16)
    b = C.encode_wav(s, 22050)
    rate, out = C.decode_wav(b)
    assert rate == 22050 and np.array_equal(out, s)
    # splice an odd-sized LIST chunk after fmt (offset 12+8+16=36)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = b[:36] + extra + b[36:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate2, out2 = C.decode_wav(spliced)
    assert rate2 == 22050 and np.array_equal(out2, s)


def test_decode_real_dispatch_and_unknown_format():
    a = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    d = decode_real(C.encode_bmp(a))
    assert d["format"] == "image/bmp" and d["width"] == 4
    assert d["values"].sum() == a.sum()
    d = decode_real(C.encode_png(a))
    assert d["format"] == "image/png" and d["height"] == 2
    d = decode_real(C.encode_wav(np.array([1, -2, 3], np.int16), 8000))
    assert d["format"] == "audio/wav" and d["rate"] == 8000
    assert list(d["values"]) == [1, -2, 3]
    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8\xff\xe0 jpeg soi")  # codec-bound format


def test_decode_rejects_malformed():
    with pytest.raises(ValueError):
        C.decode_bmp(b"BMxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"
                     b"\x00" * 20)
    with pytest.raises(ValueError):
        C.decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data
