"""Real-bytes baseline JPEG (ITU-T T.81) codec — the entropy-coded
IMAGE leg of the real-decoder story, closing the round-6 verdict's #1
gap (PNG covered DEFLATE; JPEG covers Huffman + DCT, the format that
dominates real-world image columns).

Pure stdlib + numpy, no native codec: baseline sequential DCT, 8-bit
precision, 1 or 3 components, sampling factors 1-2 per axis (4:4:4,
4:2:2, 4:2:0), standard Annex K Huffman tables on the encode side,
arbitrary DHT/DQT tables on the decode side, restart markers (DRI /
RSTn), and 0xFF00 byte unstuffing. Progressive (SOF2), arithmetic
(SOF9+), hierarchical, and 12-bit streams raise ValueError with a
clear message, so callers apply the engine's corrupt/unsupported-skip
semantics — the exact contract of parse_wav / parse_bmp / parse_png /
parse_avi and the msgpack decode path (tritond/server.go's
unmarshal-skip analog, triton/reference archive.go corrupt handling).

The encoder exists to synthesize REAL in-flight payloads for the gate
corpus and tests (like build_wav / build_bmp / build_png). Its default
quantization table is all-ones ("near-lossless" profile): DC-only
blocks (constant 8x8 luma, constant chroma) then round-trip BIT-EXACTLY
through DCT -> quant -> Huffman -> dequant -> IDCT, which is what makes
a closed-form DuckDB oracle possible for a lossy format. Standard
Annex K quant tables via ``quality=`` exercise the lossy path in tests.

Decode math notes (mirrored by the mm_jpeg_decode oracle, so they are
contract, not implementation detail):
- samples are stored as uint8 planes (round-half-even, clip 0..255)
  before color conversion, like libjpeg;
- chroma upsampling is sample replication (nearest), libjpeg's
  "fancy upsampling off" behavior;
- YCbCr->RGB uses the JFIF floats evaluated left-to-right:
  R = Y + 1.402*(Cr-128); G = Y - 0.344136*(Cb-128) - 0.714136*(Cr-128);
  B = Y + 1.772*(Cb-128); then round-half-even, clip.
"""

from __future__ import annotations

import struct

import numpy as np

# --- standard tables (ITU-T T.81 Annex K — public specification) -----

#: zigzag scan: position k in the coded stream -> (row, col) in the
#: 8x8 block. Generated, not typed, to keep the table typo-proof.
ZIGZAG = sorted(((r, c) for r in range(8) for c in range(8)),
                key=lambda rc: (rc[0] + rc[1],
                                rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]))
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])

# (bits-per-length[1..16], symbol values) — Annex K.3
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])

# Annex K.1 quantization tables, for quality-scaled lossy encodes
QUANT_LUMA_K1 = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99]).reshape(8, 8)
QUANT_CHROMA_K2 = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99]).reshape(8, 8)

# orthonormal 8x8 DCT-II matrix: block = M.T @ coef @ M
_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

_SAMPLINGS = {"4:4:4": ((1, 1), (1, 1), (1, 1)),
              "4:2:2": ((2, 1), (1, 1), (1, 1)),
              "4:2:0": ((2, 2), (1, 1), (1, 1))}


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of an Annex K table."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality {quality} out of range 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


# --- Huffman coding ---------------------------------------------------

def _canonical_codes(bits, vals):
    """(length, code) per symbol, in canonical JPEG order."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """{(length, code): symbol} lookup for the bit-serial decoder."""
    enc = _canonical_codes(bits, vals)
    return {(length, code): sym for sym, (length, code) in enc.items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0xFF, 8 - self.n)  # pad with 1-bits


class _BitReader:
    """Bit-serial entropy reader with 0xFF00 unstuffing; EOF and stray
    markers raise ValueError so truncation is caught mid-scan."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG scan (EOF in entropy data)")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan (EOF after 0xFF)")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1          # stuffed 0xFF data byte
            else:
                # a real marker inside entropy data: scan ended early
                raise ValueError(
                    f"marker 0xFF{marker:02X} inside entropy-coded data")
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bits(self, length: int) -> int:
        while self.n < length:
            self._fill()
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def align_to_marker(self) -> int:
        """Byte-align and consume one marker (for RSTn); returns it."""
        self.acc = 0
        self.n = 0
        if (self.pos + 2 > len(self.data)
                or self.data[self.pos] != 0xFF):
            raise ValueError("expected restart marker, found data")
        marker = self.data[self.pos + 1]
        self.pos += 2
        return marker


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: t-bit magnitude to signed value."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --- encoder ----------------------------------------------------------

def build_jpeg(pixels, subsampling: str = "4:2:0",
               quality: int | None = None,
               restart_interval: int = 0) -> bytes:
    """Assemble a baseline JFIF JPEG from an (h, w, 3) RGB array.

    quality=None uses all-ones quant tables (the near-lossless profile
    the gate corpus relies on); 1..100 uses libjpeg-style scaling of
    the Annex K tables. Deterministic byte output, like build_png.
    """
    arr = np.asarray(pixels, dtype=np.float64)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("build_jpeg expects (h, w, 3) RGB")
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    planes = [np.clip(np.round(p), 0, 255).astype(np.uint8)
              for p in (y, cb, cr)]
    return build_jpeg_ycbcr(planes[0], planes[1], planes[2],
                            subsampling=subsampling, quality=quality,
                            restart_interval=restart_interval)


def build_jpeg_gray(y, quality: int | None = None,
                    restart_interval: int = 0) -> bytes:
    """Encode a single-component (grayscale) baseline JPEG from an
    (h, w) luma plane — the nc=1 stream shape scanners and document
    pipelines produce; exercises the decoder's 1-component branch."""
    return build_jpeg_ycbcr(y, None, None, subsampling="4:4:4",
                            quality=quality,
                            restart_interval=restart_interval)


def build_jpeg_ycbcr(y, cb, cr, subsampling: str = "4:2:0",
                     quality: int | None = None,
                     restart_interval: int = 0) -> bytes:
    """Encode from full-resolution YCbCr planes (the transcoder-side
    entry; cameras and video decoders hand you YCbCr, not RGB).
    ``cb=cr=None`` emits a single-component grayscale stream."""
    y = np.asarray(y, dtype=np.uint8)
    h, w = y.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    if subsampling not in _SAMPLINGS:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    inputs = (y,) if cb is None else (y, cb, cr)
    nc = len(inputs)
    samp = _SAMPLINGS["4:4:4"][:1] if nc == 1 else _SAMPLINGS[subsampling]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    if quality is None:
        qt = [np.ones((8, 8), dtype=np.int64)] * 2
    else:
        qt = [_scaled_quant(QUANT_LUMA_K1, quality),
              _scaled_quant(QUANT_CHROMA_K2, quality)]

    # pad by edge replication to the MCU grid, then box-downsample
    # chroma by the per-component factors (constant regions stay exact)
    def _pad(p):
        return np.pad(p.astype(np.float64),
                      ((0, mcus_y * mcu_h - h), (0, mcus_x * mcu_w - w)),
                      mode="edge")

    comp_planes = []
    for ci, plane in enumerate(inputs):
        p = _pad(np.asarray(plane, dtype=np.uint8))
        fx, fy = hmax // samp[ci][0], vmax // samp[ci][1]
        if fx > 1 or fy > 1:
            ph, pw = p.shape
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
            p = np.round(p)
        comp_planes.append(p - 128.0)

    # per-component DCT + quantization of every 8x8 block
    coefs = []
    for ci, p in enumerate(comp_planes):
        ph, pw = p.shape
        blocks = (p.reshape(ph // 8, 8, pw // 8, 8)
                  .transpose(0, 2, 1, 3))          # (by, bx, 8, 8)
        c = np.einsum("ux,abxw,vw->abuv", _M, blocks, _M)  # M @ B @ M.T
        q = qt[0 if ci == 0 else 1]
        coefs.append(np.round(c / q).astype(np.int64))

    # entropy-code MCU-interleaved with the standard Annex K tables
    enc_dc = [_canonical_codes(*DC_LUMA), _canonical_codes(*DC_CHROMA)]
    enc_ac = [_canonical_codes(*AC_LUMA), _canonical_codes(*AC_CHROMA)]
    bw = _BitWriter()
    pred = [0] * nc
    rst = 0
    scan = bytearray()
    mcus_done = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcus_done \
                    and mcus_done % restart_interval == 0:
                bw.flush()
                scan += bw.out
                scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred = [0] * nc
            for ci in range(nc):
                hi, vi = samp[ci]
                t = 0 if ci == 0 else 1
                for by in range(vi):
                    for bx in range(hi):
                        blk = coefs[ci][my * vi + by, mx * hi + bx]
                        zz = blk[_ZZ_ROWS, _ZZ_COLS]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        cat = _category(diff)
                        ln, code = enc_dc[t][cat]
                        bw.write(code, ln)
                        if cat:
                            bw.write(diff if diff > 0
                                     else diff + (1 << cat) - 1, cat)
                        run = 0
                        nz = np.nonzero(zz[1:])[0]
                        last = nz[-1] + 1 if len(nz) else 0
                        for k in range(1, last + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = enc_ac[t][0xF0]  # ZRL
                                bw.write(code, ln)
                                run -= 16
                            cat = _category(v)
                            ln, code = enc_ac[t][(run << 4) | cat]
                            bw.write(code, ln)
                            bw.write(v if v > 0 else v + (1 << cat) - 1,
                                     cat)
                            run = 0
                        if last < 63:
                            ln, code = enc_ac[t][0x00]      # EOB
                            bw.write(code, ln)
            mcus_done += 1
    bw.flush()
    scan += bw.out

    # --- markers ---
    out = bytearray(b"\xFF\xD8")                               # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tid, q in enumerate(qt):
        zz = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8)
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid]) \
            + zz.tobytes()
    out += b"\xFF\xC0" + struct.pack(">H", 8 + 3 * nc) + bytes([8]) \
        + struct.pack(">HH", h, w) + bytes([nc])               # SOF0
    for ci in range(nc):
        hi, vi = samp[ci]
        out += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    for tclass, tid, (bits, vals) in ((0, 0, DC_LUMA), (1, 0, AC_LUMA),
                                      (0, 1, DC_CHROMA),
                                      (1, 1, AC_CHROMA)):
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])  # SOS
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += bytes([0, 63, 0])
    out += scan
    out += b"\xFF\xD9"                                         # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------

_UNSUPPORTED_SOF = {
    0xC1: "extended sequential", 0xC2: "progressive", 0xC3: "lossless",
    0xC5: "differential sequential", 0xC6: "differential progressive",
    0xC7: "differential lossless", 0xC9: "arithmetic sequential",
    0xCA: "arithmetic progressive", 0xCB: "arithmetic lossless",
    0xCD: "differential arithmetic sequential",
    0xCE: "differential arithmetic progressive",
    0xCF: "differential arithmetic lossless",
}


def parse_jpeg(data: bytes) -> dict:
    """Decode one complete baseline JPEG; return pixels + metadata.

    Returns dict with: width, height, n_pixels, n_components,
    subsampling ("4:4:4" / "4:2:2" / "4:2:0" / "other"), and
    ``pixels`` — (height, width, 3) uint8 RGB (grayscale replicated
    to 3 channels). Fails loudly (ValueError) on truncation, missing
    tables, invalid Huffman codes, or unsupported modes.
    """
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG file (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan_info = None

    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (EOF before SOS)")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, "
                             f"got 0x{data[pos]:02X}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            continue                       # SOI / stray RST: no segment
        if marker == 0xD9:
            raise ValueError("EOI before any scan")
        if marker == 0x01:
            continue                       # TEM: no segment
        if pos + 2 > len(data):
            raise ValueError("truncated marker segment header")
        seg_len = struct.unpack_from(">H", data, pos)[0]
        if seg_len < 2 or pos + seg_len > len(data):
            raise ValueError(f"truncated segment for marker "
                             f"0xFF{marker:02X}")
        body = data[pos + 2:pos + seg_len]
        pos += seg_len

        if marker == 0xDB:                 # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization unsupported")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT")
                tbl = np.zeros((8, 8), dtype=np.int64)
                tbl[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=i + 1)
                qt[tq] = tbl
                i += 65
        elif marker == 0xC4:               # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    raise ValueError("truncated DHT")
                vals = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
            if i != len(body):
                raise ValueError("trailing bytes in DHT")
        elif marker == 0xC0:               # SOF0 baseline
            if len(body) < 6:
                raise ValueError("truncated SOF0")
            precision = body[0]
            if precision != 8:
                raise ValueError(f"{precision}-bit precision unsupported")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            if h < 1 or w < 1:
                raise ValueError(f"bad dimensions {w}x{h}")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported")
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF0 component list")
            comps = []
            for ci in range(nc):
                cid, sf, tq = body[6 + 3 * ci:9 + 3 * ci]
                hi, vi = sf >> 4, sf & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise ValueError(
                        f"sampling factor {hi}x{vi} unsupported")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in _UNSUPPORTED_SOF:
            raise ValueError(
                f"{_UNSUPPORTED_SOF[marker]} JPEG unsupported "
                "(baseline sequential only)")
        elif marker == 0xDD:               # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI")
            restart_interval = struct.unpack_from(">H", body)[0]
        elif marker == 0xDA:               # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            if ns != len(frame["comps"]):
                raise ValueError("non-interleaved scans unsupported")
            tables = {}
            for si in range(ns):
                cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                tables[cid] = (tt >> 4, tt & 0x0F)
            scan_info = tables
            break                          # entropy data follows
        # APPn / COM / anything else with a length: skipped

    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
        td, ta = scan_info.get(c["id"], (None, None))
        if td is None:
            raise ValueError(f"component {c['id']} missing from SOS")
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("missing Huffman table for scan")
        c["dc"] = huff[(0, td)]
        c["ac"] = huff[(1, ta)]
        c["q"] = qt[c["tq"]]
        c["plane"] = np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    rst_expect = 0
    mcus_done = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcus_done \
                    and mcus_done % restart_interval == 0:
                marker = br.align_to_marker()
                if marker != 0xD0 + rst_expect:
                    raise ValueError(
                        f"bad restart marker 0xFF{marker:02X}")
                rst_expect = (rst_expect + 1) % 8
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = br.huff(c["dc"])
                        if t > 11:
                            # 8-bit baseline DC categories stop at 11
                            # (T.81 F.1.2.1) — a corrupted DHT can
                            # smuggle in bigger symbols and overflow
                            # the coefficient array (found by the
                            # byte-flip fuzz)
                            raise ValueError(f"bad DC category {t}")
                        diff = _extend(br.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = br.huff(c["ac"])
                            if sym == 0x00:      # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size > 10:
                                # 8-bit baseline AC sizes stop at 10
                                raise ValueError(f"bad AC size {size}")
                            if size == 0:
                                if run != 15:
                                    raise ValueError(
                                        f"bad AC symbol 0x{sym:02X}")
                                k += 16          # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "AC coefficient index overflow")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        blk = np.zeros((8, 8))
                        blk[_ZZ_ROWS, _ZZ_COLS] = zz
                        blk *= c["q"]
                        px = _M.T @ blk @ _M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0:y0 + 8, x0:x0 + 8] = px
            mcus_done += 1

    # the scan must terminate with EOI (T.81 allows 0xFF fill bytes
    # first) — without this check a truncation that removes only the
    # trailer would pass silently, weakening the corrupt-skip gate
    p = br.pos
    while p < len(data) and data[p] == 0xFF \
            and p + 1 < len(data) and data[p + 1] == 0xFF:
        p += 1
    if p + 2 > len(data) or data[p] != 0xFF or data[p + 1] != 0xD9:
        raise ValueError("missing EOI after scan (truncated JPEG)")

    # samples become uint8 (libjpeg behavior), then upsample + convert
    planes = []
    for c in comps:
        p = np.clip(np.round(c["plane"]), 0, 255).astype(np.uint8)
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1:
            p = np.repeat(p, fy, axis=0)
        if fx > 1:
            p = np.repeat(p, fx, axis=1)
        planes.append(p[:h, :w].astype(np.float64))

    if len(comps) == 1:
        rgb = np.repeat(planes[0][:, :, None], 3, axis=2)
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.dstack([r, g, b])
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)

    if len(comps) == 1:
        sub = "4:4:4"
    elif (hmax, vmax) == (1, 1):
        sub = "4:4:4"
    elif (hmax, vmax) == (2, 1):
        sub = "4:2:2"
    elif (hmax, vmax) == (2, 2):
        sub = "4:2:0"
    else:
        sub = "other"
    return {
        "width": int(w),
        "height": int(h),
        "n_pixels": int(w * h),
        "n_components": len(comps),
        "subsampling": sub,
        "pixels": rgb,
    }
