"""EXIF metadata in JPEG APP1 — the orientation trap of image
pipelines.

A JPEG's pixels are stored UNROTATED; the camera records how to
display them in the EXIF Orientation tag (274). An image pipeline
that ignores it trains on sideways photos — the classic web-corpus
bug — so metadata extraction is a first-class decode step, not an
afterthought. EXIF is just a TIFF structure (byte-order mark + IFD
chain) embedded in an APP1 segment after the JPEG SOI, so this module
reuses codec/tiff.py's IFD walker verbatim.

``parse_exif_jpeg`` walks the JPEG marker stream to APP1/"Exif\\0\\0",
then reads IFD0 (Make 271, Model 272, Orientation 274) and the EXIF
sub-IFD (pointer tag 0x8769: PixelXDimension 0xA002, PixelYDimension
0xA003). ``build_exif_jpeg`` inserts a well-formed little-endian APP1
into an existing JPEG. Corrupt structures (bad byte-order mark,
truncated IFD, out-of-bounds value offsets) raise ValueError — the
corrupt-skip contract; a JPEG simply WITHOUT EXIF returns None so
callers can distinguish "absent" from "broken".
"""

from __future__ import annotations

import struct

from go_triton_spark.codec.tiff import _read_entries

_ORIENT = 274
_MAKE = 271
_MODEL = 272
_EXIF_PTR = 0x8769
_PIX_X = 0xA002
_PIX_Y = 0xA003


def parse_exif_jpeg(data: bytes) -> dict | None:
    """Extract EXIF from a JPEG. Returns {orientation, make, model,
    pixel_x, pixel_y} (absent fields None; orientation defaults to 1
    per spec) or None when the file carries no EXIF APP1 at all."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    tiff = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynchronized")
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:      # start of scan: no APP1 will follow
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ValueError("truncated JPEG segment")
        if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
            tiff = data[pos + 10:pos + 2 + seglen]
            break
        pos += 2 + seglen
    if tiff is None:
        return None

    if len(tiff) < 8:
        raise ValueError("EXIF TIFF block too short")
    if tiff[:4] == b"II*\x00":
        bo = "<"
    elif tiff[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("EXIF byte-order mark corrupt")
    (ifd0_off,) = struct.unpack_from(bo + "I", tiff, 4)
    ifd0 = _read_entries(tiff, ifd0_off, bo)

    def ascii_of(tag):
        v = ifd0.get(tag)
        if v is None:
            return None
        return bytes(v).split(b"\x00", 1)[0].decode("ascii", "replace")

    out = {
        "orientation": int(ifd0.get(_ORIENT, (1,))[0]),
        "make": ascii_of(_MAKE),
        "model": ascii_of(_MODEL),
        "pixel_x": None,
        "pixel_y": None,
    }
    if not 1 <= out["orientation"] <= 8:
        raise ValueError(f"EXIF orientation {out['orientation']} "
                         "out of range")
    if _EXIF_PTR in ifd0:
        sub = _read_entries(tiff, ifd0[_EXIF_PTR][0], bo)
        if _PIX_X in sub:
            out["pixel_x"] = int(sub[_PIX_X][0])
        if _PIX_Y in sub:
            out["pixel_y"] = int(sub[_PIX_Y][0])
    return out


def display_size(width: int, height: int, orientation: int) -> tuple:
    """(display_w, display_h) after applying the orientation: values
    5..8 transpose (the 90-degree family)."""
    if orientation >= 5:
        return height, width
    return width, height


def _entry(bo, tag, typ, cnt, value_or_off) -> bytes:
    return struct.pack(bo + "HHI", tag, typ, cnt) + value_or_off


def build_exif_jpeg(jpeg: bytes, orientation: int = 1,
                    make: str | None = None,
                    pixel_x: int | None = None,
                    pixel_y: int | None = None) -> bytes:
    """Insert a little-endian EXIF APP1 right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    bo = "<"
    ifd0_entries = []
    tail = b""        # values that overflow the 4-byte inline slot
    # layout: header(8) | IFD0 | [exif sub-IFD] | tail values
    n0 = 1 + (make is not None) + (
        pixel_x is not None or pixel_y is not None)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    sub_off = ifd0_off + ifd0_size
    n1 = (pixel_x is not None) + (pixel_y is not None)
    sub_size = (2 + 12 * n1 + 4) if n1 else 0
    tail_off = sub_off + sub_size

    if make is not None:
        mb = make.encode("ascii") + b"\x00"
        if len(mb) <= 4:
            ifd0_entries.append(_entry(bo, _MAKE, 2, len(mb),
                                       mb.ljust(4, b"\x00")))
        else:
            ifd0_entries.append(_entry(bo, _MAKE, 2, len(mb),
                                       struct.pack(bo + "I", tail_off)))
            tail += mb
    ifd0_entries.append(_entry(bo, _ORIENT, 3, 1,
                               struct.pack(bo + "HH", orientation, 0)))
    if n1:
        ifd0_entries.append(_entry(bo, _EXIF_PTR, 4, 1,
                                   struct.pack(bo + "I", sub_off)))
    ifd0_entries.sort(key=lambda e: struct.unpack_from(bo + "H", e)[0])
    block = struct.pack(bo + "H", len(ifd0_entries))
    block += b"".join(ifd0_entries) + struct.pack(bo + "I", 0)

    if n1:
        sub_entries = []
        if pixel_x is not None:
            sub_entries.append(_entry(bo, _PIX_X, 4, 1,
                                      struct.pack(bo + "I", pixel_x)))
        if pixel_y is not None:
            sub_entries.append(_entry(bo, _PIX_Y, 4, 1,
                                      struct.pack(bo + "I", pixel_y)))
        block += struct.pack(bo + "H", len(sub_entries))
        block += b"".join(sub_entries) + struct.pack(bo + "I", 0)

    tiff = b"II*\x00" + struct.pack(bo + "I", ifd0_off) + block + tail
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    return jpeg[:2] + app1 + jpeg[2:]
