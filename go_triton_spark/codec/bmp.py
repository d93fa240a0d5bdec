"""Real-bytes BMP (Windows DIB) parsing + nearest-neighbor resize — the
IMAGE half of the real-decoder story (VERDICT r5 ask #2; audio landed
in codec/wav.py, same structure). No native media library needed: BMP's
uncompressed BI_RGB layout is fully specified by the public format
(BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian, 4-byte-padded
rows, bottom-up unless height is negative), so the parser is production
code, not a swap point. Compressed formats (PNG/JPEG) keep their
documented PIL swap points in operators/multimodal.py.

Scope: 40-byte BITMAPINFOHEADER, BI_RGB (compression 0), 8-bit
(grayscale palette), 24-bit and 32-bit pixels, bottom-up and top-down
row order. Fails loudly (ValueError) on truncated/garbage input so
callers can apply the engine's corrupt-skip semantics — the exact
contract of parse_wav and the msgpack decode path
(tritond/server.go's unmarshal-skip analog).
"""

from __future__ import annotations

import struct

import numpy as np

BI_RGB = 0
_FILE_HDR = 14      # BITMAPFILEHEADER
_INFO_HDR = 40      # BITMAPINFOHEADER


def parse_bmp(data: bytes) -> dict:
    """Parse one complete BMP file; return pixels + metadata.

    Returns dict with: width, height, bit_depth, n_pixels, top_down,
    and ``pixels`` — an ``np.uint8`` array of shape (height, width, 3)
    in RGB order (8-bit palettes are expanded through their color
    table, BGRX alpha is dropped) with row 0 = TOP image row regardless
    of the file's storage order, so downstream math is orientation-free.
    """
    if len(data) < _FILE_HDR + _INFO_HDR:
        raise ValueError("truncated BMP header")
    if data[:2] != b"BM":
        raise ValueError("not a BMP file (bad magic)")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    (hdr_size, width, height, planes, bit_depth, compression) = \
        struct.unpack_from("<IiiHHI", data, _FILE_HDR)
    if hdr_size < _INFO_HDR:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if planes != 1:
        raise ValueError(f"bad plane count {planes}")
    if compression != BI_RGB:
        raise ValueError(f"unsupported compression {compression} "
                         "(only uncompressed BI_RGB)")
    if bit_depth not in (8, 24, 32):
        raise ValueError(f"unsupported bit depth {bit_depth}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")

    # rows are padded to 4-byte boundaries (format spec)
    stride = (width * bit_depth // 8 + 3) & ~3
    if pixel_offset + stride * height > len(data):
        raise ValueError("truncated pixel data")

    if bit_depth == 8:
        # color table sits between the headers and the pixel array:
        # 4 bytes (B,G,R,0) per entry
        pal_start = _FILE_HDR + hdr_size
        n_entries = (pixel_offset - pal_start) // 4
        if n_entries < 1:
            raise ValueError("8-bit BMP missing color table")
        pal = np.frombuffer(data, dtype=np.uint8,
                            count=n_entries * 4, offset=pal_start)
        pal = pal.reshape(-1, 4)[:, [2, 1, 0]]  # BGRX -> RGB

    raw = np.frombuffer(data, dtype=np.uint8,
                        count=stride * height, offset=pixel_offset)
    rows = raw.reshape(height, stride)
    if bit_depth == 8:
        idx = rows[:, :width]
        if int(idx.max()) >= len(pal):
            raise ValueError("palette index out of range")
        px = pal[idx]
        if not top_down:
            px = px[::-1]
    else:
        px = decode_dib_rows(raw.tobytes(), width, height, bit_depth,
                             top_down=top_down)
    return {
        "width": int(width),
        "height": int(height),
        "bit_depth": int(bit_depth),
        "n_pixels": int(width * height),
        "top_down": bool(top_down),
        "pixels": np.ascontiguousarray(px),
    }


def decode_dib_rows(raw: bytes, width: int, height: int,
                    bit_depth: int = 24, top_down: bool = False) -> np.ndarray:
    """Decode a raw DIB pixel array (BGR(X), 4-byte-padded rows,
    bottom-up unless top_down) to (height, width, 3) RGB — the row
    codec shared by BMP files and AVI 'DIB ' video frames (codec/
    avi.py), which store frames in exactly this layout."""
    stride = (width * bit_depth // 8 + 3) & ~3
    if len(raw) < stride * height:
        raise ValueError("truncated DIB pixel rows")
    rows = np.frombuffer(raw, dtype=np.uint8,
                         count=stride * height).reshape(height, stride)
    if bit_depth == 24:
        px = rows[:, :width * 3].reshape(height, width, 3)[:, :, ::-1]
    elif bit_depth == 32:  # BGRX, alpha byte dropped
        px = rows[:, :width * 4].reshape(height, width, 4)[:, :, [2, 1, 0]]
    else:
        raise ValueError(f"unsupported DIB bit depth {bit_depth}")
    if not top_down:
        px = px[::-1]  # bottom-up storage -> row 0 = top
    return px


def encode_dib_rows(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """Inverse of :func:`decode_dib_rows` for 24-bit RGB input."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    bgr = arr[:, :, ::-1]
    if not top_down:
        bgr = bgr[::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def build_bmp(pixels, top_down: bool = False) -> bytes:
    """Assemble a canonical 24-bit BI_RGB BMP from an RGB pixel array
    of shape (height, width, 3) (row 0 = top). Deterministic byte
    output — synthesizes real in-flight image payloads for the
    mm_image_* operators' gate corpus and test fixtures, exactly like
    codec/wav.py's build_wav."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("build_bmp expects (h, w, 3) RGB")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = encode_dib_rows(arr, top_down=top_down)
    pixel_offset = _FILE_HDR + _INFO_HDR
    size = pixel_offset + stride * h
    out = b"BM" + struct.pack("<IHHI", size, 0, 0, pixel_offset)
    out += struct.pack("<IiihHIIiiII", _INFO_HDR, w, -h if top_down else h,
                       1, 24, BI_RGB, stride * h, 2835, 2835, 0, 0)
    return out + body


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, c) array to (out_h,
    out_w, c): output pixel (ox, oy) takes source pixel
    (ox*w // out_w, oy*h // out_h) — pure integer index math, so the
    DuckDB oracle can reproduce every output pixel analytically."""
    h, w = pixels.shape[:2]
    if out_w < 1 or out_h < 1:
        raise ValueError(f"bad target {out_w}x{out_h}")
    sx = (np.arange(out_w) * w) // out_w
    sy = (np.arange(out_h) * h) // out_h
    return pixels[sy][:, sx]
