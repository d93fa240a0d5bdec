"""codec/bmp.py: real Windows-BMP parsing, golden-gated.

No independent BMP writer exists in this environment (no PIL, no
stdlib module), so the goldens are HAND-ASSEMBLED bytes built in the
tests directly from the public format layout (BITMAPFILEHEADER +
BITMAPINFOHEADER, little-endian, BGR pixel order, 4-byte row padding,
bottom-up rows) — the same independence strategy as the 24-bit WAV
test, which gates the parser against bytes build_bmp never touched.
"""

import struct

import numpy as np
import pytest

from go_triton_spark.codec.bmp import (build_bmp, parse_bmp,
                                       resize_nearest)


def _hand_bmp_24(rows_bgr: list[bytes], width: int,
                 height: int, compression: int = 0,
                 bit_depth: int = 24) -> bytes:
    """Assemble a BMP by hand from raw padded BGR rows, bottom row
    FIRST (the file's storage order) — independent of build_bmp."""
    body = b"".join(rows_bgr)
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, width, height, 1, bit_depth,
                       compression, len(body), 0, 0, 0, 0)
    return hdr + body


def test_hand_assembled_golden_2x2():
    """2x2 24-bit image: red/green top row, blue/white bottom row.
    Storage is bottom-up BGR with rows padded 6 -> 8 bytes; the parser
    must return top-first RGB."""
    bottom = b"\xff\x00\x00" + b"\xff\xff\xff" + b"\x00\x00"  # blue, white
    top = b"\x00\x00\xff" + b"\x00\xff\x00" + b"\x00\x00"     # red, green
    m = parse_bmp(_hand_bmp_24([bottom, top], 2, 2))
    assert (m["width"], m["height"], m["bit_depth"], m["n_pixels"],
            m["top_down"]) == (2, 2, 24, 4, False)
    assert m["pixels"].tolist() == [
        [[255, 0, 0], [0, 255, 0]],      # top row: red, green
        [[0, 0, 255], [255, 255, 255]],  # bottom row: blue, white
    ]


def test_top_down_negative_height():
    rows = [b"\x01\x02\x03" + b"\x00" * 1, b"\x04\x05\x06" + b"\x00"]
    data = bytearray(_hand_bmp_24(rows, 1, 2))
    struct.pack_into("<i", data, 14 + 8, -2)  # biHeight = -2: top-down
    m = parse_bmp(bytes(data))
    assert m["top_down"] is True
    # storage order IS display order now: first stored row is the top
    assert m["pixels"].tolist() == [[[3, 2, 1]], [[6, 5, 4]]]


def test_8bit_palette_expansion():
    """8-bit pixels index a BGRX color table; parser expands to RGB."""
    pal = struct.pack("<BBBB", 10, 20, 30, 0)       # index 0 -> RGB(30,20,10)
    pal += struct.pack("<BBBB", 200, 100, 50, 0)    # index 1 -> RGB(50,100,200)
    row = bytes([1, 0, 1]) + b"\x00"                # width 3, padded to 4
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(row), 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, 3, 1, 1, 8, 0, len(row), 0, 0, 2, 0)
    m = parse_bmp(hdr + pal + row)
    assert m["bit_depth"] == 8
    assert m["pixels"].tolist() == [[[50, 100, 200], [30, 20, 10],
                                     [50, 100, 200]]]


def test_8bit_palette_index_out_of_range_rejected():
    pal = struct.pack("<BBBB", 1, 2, 3, 0)
    row = bytes([5]) + b"\x00\x00\x00"
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(row), 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, len(row), 0, 0, 1, 0)
    with pytest.raises(ValueError, match="palette index"):
        parse_bmp(hdr + pal + row)


def test_32bit_bgrx_alpha_dropped():
    row = struct.pack("<BBBB", 9, 8, 7, 255)  # B=9 G=8 R=7, alpha ignored
    m = parse_bmp(_hand_bmp_24([row], 1, 1, bit_depth=32))
    assert m["bit_depth"] == 32
    assert m["pixels"].tolist() == [[[7, 8, 9]]]


def test_row_padding_width_3():
    """Width 3 at 24-bit = 9 data bytes padded to 12 per row; pad bytes
    must not leak into pixels."""
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    m = parse_bmp(build_bmp(px))
    assert np.array_equal(m["pixels"], px)


@pytest.mark.parametrize("mutant", [
    b"",
    b"BM" + b"\x00" * 20,                     # truncated header
    b"XX" + b"\x00" * 60,                     # bad magic
])
def test_corrupt_rejected(mutant):
    with pytest.raises(ValueError):
        parse_bmp(mutant)


def test_truncated_pixels_and_compression_rejected():
    good = build_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        parse_bmp(good[:60])
    rle = bytearray(good)
    struct.pack_into("<I", rle, 14 + 16, 1)   # biCompression = BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        parse_bmp(bytes(rle))
    mono = bytearray(good)
    struct.pack_into("<H", mono, 14 + 14, 1)  # biBitCount = 1
    with pytest.raises(ValueError, match="bit depth"):
        parse_bmp(bytes(mono))


def test_resize_nearest_exact_index_math():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(10, 16, 3), dtype=np.uint8)
    out = resize_nearest(px, 8, 6)
    assert out.shape == (6, 8, 3)
    for oy in range(6):
        for ox in range(8):
            assert np.array_equal(out[oy, ox],
                                  px[(oy * 10) // 6, (ox * 16) // 8])
    # identity resize is exact
    assert np.array_equal(resize_nearest(px, 16, 10), px)


# ---- property tests ---------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 24), st.integers(1, 16), st.integers(0, 2**32 - 1),
       st.booleans())
def test_bmp_roundtrip_property(w, h, seed, top_down):
    """build_bmp -> parse_bmp returns the exact pixel array for any
    size (odd widths exercise row padding) and either row order."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    m = parse_bmp(build_bmp(px, top_down=top_down))
    assert (m["width"], m["height"]) == (w, h)
    assert np.array_equal(m["pixels"], px)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=4096))
def test_bmp_fuzz_rejects_or_parses(payload):
    """parse_bmp on arbitrary bytes either raises ValueError (the
    corrupt-skip contract) or returns a well-formed dict — never any
    other exception type."""
    try:
        m = parse_bmp(payload)
    except ValueError:
        return
    assert set(m) == {"width", "height", "bit_depth", "n_pixels",
                      "top_down", "pixels"}
    assert m["pixels"].shape == (m["height"], m["width"], 3)


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 511), st.integers(0, 255))
def test_bmp_mutation_fuzz(flip_at, flip_to):
    """Mutate a VALID bmp at one byte: parse either still succeeds or
    raises ValueError — the skip-corrupt-record contract."""
    base = bytearray(build_bmp(
        np.arange(60, dtype=np.uint8).reshape(4, 5, 3)))
    base[flip_at % len(base)] = flip_to
    try:
        m = parse_bmp(bytes(base))
        assert m["bit_depth"] in (8, 24, 32)
    except ValueError:
        pass
