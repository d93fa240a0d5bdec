"""Lossy VP8 key-frame decoder — closes the LAST named swap point
(COVERAGE.md / codec/vp8l.py: "lossy VP8 stays a documented swap
point").  Clean-room from the PUBLIC bitstream specification, RFC 6386
("VP8 Data Format and Decoding Guide", Bankoski et al., 2011): the
boolean arithmetic decoder (§7), key-frame headers (§9), intra
prediction mode trees (§8/§11), DCT/WHT coefficient token decoding
with band/context probabilities (§13), dequantization (§14.1), the
exact integer inverse DCT/WHT (§14.3-14.4), intra prediction
(§12, including the spec's above-right quirk for right-column
subblocks), and the normal + simple in-loop deblocking filters (§15).

WebP lossy files are single VP8 key frames, so key-frame-only decode
IS full WebP-lossy coverage; interframe tools (motion vectors,
golden/altref buffers) do not occur in WebP and are not implemented.

Normative constant tables (quantizer lookups, default coefficient
probabilities, coefficient-update probabilities, key-frame B-mode
probabilities) live in vp8_tables.py, recovered byte-exact from the
public spec via the system libwebp .rodata (tools/extract_vp8_tables.py)
and validated by the bit-exact differential decode suite in
tests/test_vp8_codec.py (our YUV output == libwebp's WebPDecodeYUV on
libwebp-encoded streams across sizes, qualities, and content).

Decoder fails loudly (VP8Error, a ValueError) on truncation, bad
magic, or oversized partitions — the engine's corrupt-skip contract.
Note VP8 carries no payload checksum, so arbitrary bit flips can decode
to different pixels without error; truncation is always detected.

Also ships a deliberately-minimal deterministic key-frame WRITER
(build_vp8_flat) for the driver gate corpus: flat frames coded purely
through the Y2/WHT DC path with a closed-form decode, so the DuckDB
oracle can recompute the expected pixels analytically while the real
decoder exercises headers, mode trees, token decode, dequant, WHT/DCT
reconstruction, DC prediction, skip handling, and multi-macroblock
context propagation on every driver run.

Reference parity note: the Go reference (archive.go, triton.go) has no
image path at all; this codec exists for the multimodal pipeline
surface (SURVEY.md §2 "beyond-reference" families).
"""

from __future__ import annotations

import struct

import numpy as np

from go_triton_spark.codec.vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
    KF_UV_MODE_PROBS,
    KF_YMODE_PROBS,
)


class VP8Error(ValueError):
    """Malformed / truncated VP8 stream (corrupt-skip contract)."""


# --- normative small tables (RFC 6386 §13.3-13.5) -----------------------

# coefficient band per scan position (17th entry backs the n+1 lookup)
_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7, 0)

_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# DCT value categories 3-6: base values and extra-bit probabilities
# (categories 1-2 inline their probs 159 / 165,145 in _get_coeffs)
_CAT3456_BASE = (11, 19, 35, 67)
_CAT3456_PROBS = (
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)

# mode enums (16x16): DC, V, H, TM, B_PRED — and 4x4 B modes.
# B-mode NUMBERING follows the same convention as the extracted
# KF_BMODE_PROBS table rows (RD/VR at 4-5, LD/VL at 6-7 — the
# libwebp/spec-table order, NOT libvpx's source-enum order which puts
# LD at 4): the context row index and the tree leaf values must share
# one numbering or rows 4-7 permute and B_PRED misdecodes.
_DC, _V, _H, _TM, _B = 0, 1, 2, 3, 4
(_B_DC, _B_TM, _B_VE, _B_HE, _B_RD,
 _B_VR, _B_LD, _B_VL, _B_HD, _B_HU) = range(10)

# trees: pairs of children per node; leaf stored as -(value + 1)
_KF_YMODE_TREE = (-(_B + 1), 2, 4, 6,
                  -(_DC + 1), -(_V + 1), -(_H + 1), -(_TM + 1))
_UV_MODE_TREE = (-(_DC + 1), 2, -(_V + 1), 4, -(_H + 1), -(_TM + 1))
_BMODE_TREE = (-(_B_DC + 1), 2, -(_B_TM + 1), 4, -(_B_VE + 1), 6,
               8, 12, -(_B_HE + 1), 10, -(_B_RD + 1), -(_B_VR + 1),
               -(_B_LD + 1), 14, -(_B_VL + 1), 16,
               -(_B_HD + 1), -(_B_HU + 1))
_SEGMENT_TREE = (2, 4, -1, -2, -3, -4)

# context bmode for a non-B_PRED neighbor macroblock (§11.3)
_MODE_TO_BMODE = {_DC: _B_DC, _V: _B_VE, _H: _B_HE, _TM: _B_TM}

# pre-nest the coefficient probabilities: [plane][band][ctx] -> 11-tuple
def _nest(flat):
    it = iter(flat)
    return tuple(tuple(tuple(tuple(next(it) for _ in range(11))
                             for _ in range(3))
                       for _ in range(8))
                 for _ in range(4))


_DEFAULT_COEFF_PROBS = _nest(COEFF_PROBS)
_UPDATE_PROBS = _nest(COEFF_UPDATE_PROBS)
_KF_BMODE = tuple(
    tuple(tuple(KF_BMODE_PROBS[(a * 10 + l) * 9:(a * 10 + l) * 9 + 9])
          for l in range(10))
    for a in range(10))


# --- boolean arithmetic decoder (RFC 6386 §7.3) --------------------------

class _Bool:
    """Bit-exact RFC 6386 boolean decoder.  Reads past the partition
    end yield zero bytes (legitimate ≤2-byte lookahead); more than 8
    virtual bytes means the partition was truncated → VP8Error."""

    __slots__ = ("buf", "pos", "end", "value", "range", "bits", "overrun")

    def __init__(self, buf, start, end):
        self.buf = buf
        self.range = 255
        self.bits = 0
        self.overrun = 0
        v = 0
        pos = start
        for _ in range(2):
            if pos < end:
                v = (v << 8) | buf[pos]
                pos += 1
            else:
                v <<= 8
                self.overrun += 1
        self.value = v
        self.pos = pos
        self.end = end

    def bit(self, prob):
        rng = self.range
        split = 1 + (((rng - 1) * prob) >> 8)
        big = split << 8
        v = self.value
        if v >= big:
            ret = 1
            rng -= split
            v -= big
        else:
            ret = 0
            rng = split
        bits = self.bits
        while rng < 128:
            v <<= 1
            rng <<= 1
            bits += 1
            if bits == 8:
                bits = 0
                if self.pos < self.end:
                    v |= self.buf[self.pos]
                    self.pos += 1
                else:
                    self.overrun += 1
                    if self.overrun > 8:
                        raise VP8Error("truncated VP8 partition")
        self.bits = bits
        self.value = v
        self.range = rng
        return ret

    def literal(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed(self, n):
        v = self.literal(n)
        return -v if self.bit(128) else v

    def flag_signed(self, n):
        """The header's maybe-present signed value: 0 when absent."""
        return self.signed(n) if self.bit(128) else 0

    def tree(self, tree, probs, start=0):
        i = start
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i < 0:
                return -i - 1


def _clamp_q(q):
    return 0 if q < 0 else (127 if q > 127 else q)


# --- coefficient token decoding (RFC 6386 §13.3, layout per libwebp
#     GetCoeffs which is the spec tree unrolled) --------------------------

def _get_coeffs(bd, plane_probs, ctx, first, dqdc, dqac, out):
    """Decode one 4x4 block's tokens into out[16] (dequantized, raster
    order via zigzag).  Returns the scan position where EOB hit (the
    spec's per-block "nz" used for context/skip bookkeeping)."""
    n = first
    p = plane_probs[_BANDS[n]][ctx]
    bit = bd.bit
    while n < 16:
        if not bit(p[0]):
            return n                         # end of block
        while not bit(p[1]):                 # run of zero coefficients
            n += 1
            if n == 16:
                return 16
            p = plane_probs[_BANDS[n]][0]
        if not bit(p[2]):
            v = 1
            nctx = 1
        else:
            nctx = 2
            if not bit(p[3]):
                if not bit(p[4]):
                    v = 2
                else:
                    v = 3 + bit(p[5])
            elif not bit(p[6]):
                if not bit(p[7]):
                    v = 5 + bit(159)
                else:
                    v = 7 + 2 * bit(165) + bit(145)
            else:
                b1 = bit(p[8])
                b0 = bit(p[10] if b1 else p[9])
                cat = 2 * b1 + b0
                v = 0
                for cp in _CAT3456_PROBS[cat]:
                    v = (v << 1) | bit(cp)
                v += _CAT3456_BASE[cat]
        if bit(128):
            v = -v
        out[_ZIGZAG[n]] = v * (dqdc if n == 0 else dqac)
        n += 1
        if n == 16:
            return 16
        p = plane_probs[_BANDS[n]][nctx]
    return 16


# --- exact integer inverse transforms (RFC 6386 §14.3-14.4) --------------

def _idct4x4(b):
    """In-place-style 4x4 inverse DCT on a 16-int list; returns the
    (residual + 4) >> 3 output as a 4x4 numpy int32 array."""
    t = [0] * 16
    for i in range(4):
        a1 = b[i] + b[8 + i]
        b1 = b[i] - b[8 + i]
        t1 = (b[4 + i] * 35468) >> 16
        t2 = b[12 + i] + ((b[12 + i] * 20091) >> 16)
        c1 = t1 - t2
        t1 = b[4 + i] + ((b[4 + i] * 20091) >> 16)
        t2 = (b[12 + i] * 35468) >> 16
        d1 = t1 + t2
        t[i] = a1 + d1
        t[12 + i] = a1 - d1
        t[4 + i] = b1 + c1
        t[8 + i] = b1 - c1
    out = np.empty((4, 4), dtype=np.int32)
    for i in range(4):
        r = t[4 * i:4 * i + 4]
        a1 = r[0] + r[2]
        b1 = r[0] - r[2]
        t1 = (r[1] * 35468) >> 16
        t2 = r[3] + ((r[3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = r[1] + ((r[1] * 20091) >> 16)
        t2 = (r[3] * 35468) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


def _iwht4x4(b):
    """Inverse Walsh-Hadamard on the Y2 block; returns the 16 DC values
    in Y-subblock raster order."""
    t = [0] * 16
    for i in range(4):
        a1 = b[i] + b[12 + i]
        b1 = b[4 + i] + b[8 + i]
        c1 = b[4 + i] - b[8 + i]
        d1 = b[i] - b[12 + i]
        t[i] = a1 + b1
        t[4 + i] = c1 + d1
        t[8 + i] = a1 - b1
        t[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = t[4 * i:4 * i + 4]
        a1 = r[0] + r[3]
        b1 = r[1] + r[2]
        c1 = r[1] - r[2]
        d1 = r[0] - r[3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


# --- intra prediction (RFC 6386 §12) --------------------------------------

def _pred_dc_block(plane, y0, x0, size, have_above, have_left):
    if have_above and have_left:
        s = int(plane[y0, x0 + 1:x0 + 1 + size].sum()) + \
            int(plane[y0 + 1:y0 + 1 + size, x0].sum())
        return (s + size) >> (4 if size == 8 else 5)
    if have_above:
        s = int(plane[y0, x0 + 1:x0 + 1 + size].sum())
    elif have_left:
        s = int(plane[y0 + 1:y0 + 1 + size, x0].sum())
    else:
        return 128
    return (s + (size >> 1)) >> (3 if size == 8 else 4)


def _pred_full(plane, y0, x0, size, mode, have_above, have_left):
    """16x16 / 8x8 whole-block prediction, written into the plane.
    plane is border-padded (top row 127, left col 129), so V/H/TM read
    the spec edge values at frame boundaries; DC uses availability."""
    dst = plane[y0 + 1:y0 + 1 + size, x0 + 1:x0 + 1 + size]
    if mode == _DC:
        dst[:] = _pred_dc_block(plane, y0, x0, size, have_above, have_left)
    elif mode == _V:
        dst[:] = plane[y0, x0 + 1:x0 + 1 + size][None, :]
    elif mode == _H:
        dst[:] = plane[y0 + 1:y0 + 1 + size, x0][:, None]
    else:  # TM
        above = plane[y0, x0 + 1:x0 + 1 + size].astype(np.int32)
        left = plane[y0 + 1:y0 + 1 + size, x0].astype(np.int32)
        tl = int(plane[y0, x0])
        dst[:] = np.clip(left[:, None] + above[None, :] - tl, 0, 255)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred_b(mode, a, l, p):
    """4x4 subblock prediction (RFC 6386 §12.3).  a: 8 above pixels
    (incl. above-right), l: 4 left, p: top-left.  Returns flat 16."""
    if mode == _B_DC:
        dc = (sum(a[:4]) + sum(l) + 4) >> 3
        return [dc] * 16
    if mode == _B_TM:
        o = []
        for r in range(4):
            base = l[r] - p
            for c in range(4):
                v = base + a[c]
                o.append(0 if v < 0 else (255 if v > 255 else v))
        return o
    if mode == _B_VE:
        e = [_avg3(p, a[0], a[1]), _avg3(a[0], a[1], a[2]),
             _avg3(a[1], a[2], a[3]), _avg3(a[2], a[3], a[4])]
        return e * 4
    if mode == _B_HE:
        rows = [_avg3(p, l[0], l[1]), _avg3(l[0], l[1], l[2]),
                _avg3(l[1], l[2], l[3]), _avg3(l[2], l[3], l[3])]
        return [rows[r] for r in range(4) for _ in range(4)]
    if mode == _B_LD:
        e = [_avg3(a[i], a[i + 1], a[i + 2]) for i in range(6)]
        e.append(_avg3(a[6], a[7], a[7]))
        return [e[r + c] for r in range(4) for c in range(4)]
    if mode == _B_RD:
        e = [_avg3(l[3], l[2], l[1]), _avg3(l[2], l[1], l[0]),
             _avg3(l[1], l[0], p), _avg3(l[0], p, a[0]),
             _avg3(p, a[0], a[1]), _avg3(a[0], a[1], a[2]),
             _avg3(a[1], a[2], a[3])]
        return [e[3 - r + c] for r in range(4) for c in range(4)]
    if mode == _B_VR:
        o = [0] * 16
        o[0] = _avg2(p, a[0]); o[1] = _avg2(a[0], a[1])
        o[2] = _avg2(a[1], a[2]); o[3] = _avg2(a[2], a[3])
        o[4] = _avg3(l[0], p, a[0]); o[5] = _avg3(p, a[0], a[1])
        o[6] = _avg3(a[0], a[1], a[2]); o[7] = _avg3(a[1], a[2], a[3])
        o[8] = _avg3(p, l[0], l[1]); o[9:12] = o[0:3]
        o[12] = _avg3(l[0], l[1], l[2]); o[13:16] = o[4:7]
        return o
    if mode == _B_VL:
        o = [0] * 16
        o[0] = _avg2(a[0], a[1]); o[1] = _avg2(a[1], a[2])
        o[2] = _avg2(a[2], a[3]); o[3] = _avg2(a[3], a[4])
        o[4] = _avg3(a[0], a[1], a[2]); o[5] = _avg3(a[1], a[2], a[3])
        o[6] = _avg3(a[2], a[3], a[4]); o[7] = _avg3(a[3], a[4], a[5])
        o[8:11] = o[1:4]; o[11] = _avg3(a[4], a[5], a[6])
        o[12:15] = o[5:8]; o[15] = _avg3(a[5], a[6], a[7])
        return o
    if mode == _B_HD:
        o = [0] * 16
        o[0] = _avg2(l[0], p); o[1] = _avg3(a[0], p, l[0])
        o[2] = _avg3(a[1], a[0], p); o[3] = _avg3(a[2], a[1], a[0])
        o[4] = _avg2(l[1], l[0]); o[5] = _avg3(p, l[0], l[1])
        o[6:8] = o[0:2]
        o[8] = _avg2(l[2], l[1]); o[9] = _avg3(l[0], l[1], l[2])
        o[10:12] = o[4:6]
        o[12] = _avg2(l[3], l[2]); o[13] = _avg3(l[1], l[2], l[3])
        o[14:16] = o[8:10]
        return o
    # B_HU
    o = [0] * 16
    o[0] = _avg2(l[0], l[1]); o[1] = _avg3(l[0], l[1], l[2])
    o[2] = _avg2(l[1], l[2]); o[3] = _avg3(l[1], l[2], l[3])
    o[4:6] = o[2:4]
    o[6] = _avg2(l[2], l[3]); o[7] = _avg3(l[2], l[3], l[3])
    o[8:10] = o[6:8]
    o[10] = o[11] = o[12] = o[13] = o[14] = o[15] = l[3]
    return o


# --- header / frame state -------------------------------------------------

class _Frame:
    pass


def _parse_headers(data):
    """Uncompressed header + first-partition headers.  Returns the
    frame state and the first-partition bool decoder positioned at the
    start of the per-macroblock mode records."""
    if len(data) < 10:
        raise VP8Error("VP8 payload shorter than frame header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise VP8Error("not a key frame (WebP requires key frames)")
    f = _Frame()
    f.show = (tag >> 4) & 1
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise VP8Error("bad VP8 key-frame start code")
    w16, h16 = struct.unpack_from("<HH", data, 6)
    f.width = w16 & 0x3FFF
    f.height = h16 & 0x3FFF
    if f.width == 0 or f.height == 0:
        raise VP8Error("zero VP8 frame dimension")
    if 10 + part0_size > len(data):
        raise VP8Error("first partition overruns VP8 payload")
    bd = _Bool(data, 10, 10 + part0_size)

    if bd.literal(1):                  # color space: RFC 6386 §9.2 says
        # the bit MUST be 0; a set reserved value marks a stream this
        # (or any conforming) decoder cannot interpret — fail loud
        raise VP8Error("reserved VP8 color-space bit set")
    bd.literal(1)                      # clamping type
    # segmentation (§9.3)
    f.seg_enabled = bd.bit(128)
    f.update_map = 0
    f.seg_abs = 0
    f.seg_quant = [0, 0, 0, 0]
    f.seg_lf = [0, 0, 0, 0]
    f.seg_tree_probs = (255, 255, 255)
    if f.seg_enabled:
        f.update_map = bd.bit(128)
        update_data = bd.bit(128)
        if update_data:
            f.seg_abs = bd.bit(128)
            f.seg_quant = [bd.flag_signed(7) for _ in range(4)]
            f.seg_lf = [bd.flag_signed(6) for _ in range(4)]
        if f.update_map:
            f.seg_tree_probs = tuple(
                bd.literal(8) if bd.bit(128) else 255 for _ in range(3))
    # loop filter (§9.4)
    f.filter_simple = bd.bit(128)
    f.filter_level = bd.literal(6)
    f.sharpness = bd.literal(3)
    f.lf_delta_enabled = bd.bit(128)
    f.ref_lf_delta = [0, 0, 0, 0]
    f.mode_lf_delta = [0, 0, 0, 0]
    if f.lf_delta_enabled and bd.bit(128):
        for i in range(4):
            if bd.bit(128):
                f.ref_lf_delta[i] = bd.signed(6)
        for i in range(4):
            if bd.bit(128):
                f.mode_lf_delta[i] = bd.signed(6)
    # token partitions (§9.5)
    f.n_parts = 1 << bd.literal(2)
    # quantizer (§9.6)
    f.y_ac_qi = bd.literal(7)
    f.y_dc_delta = bd.flag_signed(4)
    f.y2_dc_delta = bd.flag_signed(4)
    f.y2_ac_delta = bd.flag_signed(4)
    f.uv_dc_delta = bd.flag_signed(4)
    f.uv_ac_delta = bd.flag_signed(4)
    bd.bit(128)                        # refresh entropy probs (key frame)
    # coefficient probability updates (§13.4)
    probs = [[[list(_DEFAULT_COEFF_PROBS[i][j][k]) for k in range(3)]
              for j in range(8)] for i in range(4)]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                up = _UPDATE_PROBS[i][j][k]
                row = probs[i][j][k]
                for t in range(11):
                    if bd.bit(up[t]):
                        row[t] = bd.literal(8)
    f.coeff_probs = tuple(
        tuple(tuple(tuple(probs[i][j][k]) for k in range(3))
              for j in range(8)) for i in range(4))
    # skip probability (§9.11)
    f.use_skip = bd.bit(128)
    f.skip_prob = bd.literal(8) if f.use_skip else 0
    return f, bd, 10 + part0_size


def _dequant_factors(f):
    """Per-segment (y1dc, y1ac, y2dc, y2ac, uvdc, uvac) — RFC §14.1."""
    out = []
    for seg in range(4):
        if f.seg_enabled:
            q = f.seg_quant[seg] if f.seg_abs \
                else f.y_ac_qi + f.seg_quant[seg]
        else:
            q = f.y_ac_qi
        q = _clamp_q(q)
        y1dc = DC_QLOOKUP[_clamp_q(q + f.y_dc_delta)]
        y1ac = AC_QLOOKUP[q]
        y2dc = DC_QLOOKUP[_clamp_q(q + f.y2_dc_delta)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(q + f.y2_ac_delta)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_q(q + f.uv_dc_delta)]
        if uvdc > 132:
            uvdc = 132
        uvac = AC_QLOOKUP[_clamp_q(q + f.uv_ac_delta)]
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


# --- main decode ----------------------------------------------------------

def decode_vp8(data):
    """Decode a VP8 key-frame chunk (the payload of a RIFF 'VP8 '
    chunk) to Y/U/V planes.  Returns dict with width/height and the
    cropped uint8 planes (chroma at half resolution, ceil-divided)."""
    f, bd, pos = _parse_headers(data)
    mb_cols = (f.width + 15) >> 4
    mb_rows = (f.height + 15) >> 4

    # token partitions: (n-1) 3-byte sizes then the partitions
    sizes_at = pos
    need = 3 * (f.n_parts - 1)
    if sizes_at + need > len(data):
        raise VP8Error("truncated token-partition size table")
    offs = []
    p = sizes_at + need
    for i in range(f.n_parts - 1):
        o = sizes_at + 3 * i
        sz = data[o] | (data[o + 1] << 8) | (data[o + 2] << 16)
        if p + sz > len(data):
            raise VP8Error("token partition overruns VP8 payload")
        offs.append((p, p + sz))
        p += sz
    offs.append((p, len(data)))
    if offs[-1][0] > len(data):
        raise VP8Error("token partition overruns VP8 payload")
    token_bds = [_Bool(data, a, b) for a, b in offs]

    dq = _dequant_factors(f)

    # --- pass 1: mode records for every MB (first partition) ---
    seg_ids = np.zeros((mb_rows, mb_cols), dtype=np.int8)
    skip_flags = np.zeros((mb_rows, mb_cols), dtype=bool)
    ymodes = np.zeros((mb_rows, mb_cols), dtype=np.int8)
    uvmodes = np.zeros((mb_rows, mb_cols), dtype=np.int8)
    bmodes = np.zeros((mb_rows, mb_cols, 16), dtype=np.int8)
    above_ctx = np.zeros((mb_cols, 4), dtype=np.int8)  # B_DC outside
    for my in range(mb_rows):
        left_ctx = [ _B_DC ] * 4
        for mx in range(mb_cols):
            if f.update_map:
                seg_ids[my, mx] = bd.tree(_SEGMENT_TREE, f.seg_tree_probs)
            if f.use_skip:
                skip_flags[my, mx] = bd.bit(f.skip_prob)
            ym = bd.tree(_KF_YMODE_TREE, KF_YMODE_PROBS)
            ymodes[my, mx] = ym
            if ym == _B:
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    a = above_ctx[mx][c] if r == 0 else bmodes[my, mx, sb - 4]
                    l = left_ctx[r] if c == 0 else bmodes[my, mx, sb - 1]
                    bm = bd.tree(_BMODE_TREE, _KF_BMODE[a][l])
                    bmodes[my, mx, sb] = bm
                above_ctx[mx] = bmodes[my, mx, 12:16]
                for r in range(4):
                    left_ctx[r] = bmodes[my, mx, 4 * r + 3]
            else:
                bm = _MODE_TO_BMODE[ym]
                bmodes[my, mx, :] = bm
                above_ctx[mx] = (bm, bm, bm, bm)
                left_ctx = [bm] * 4
            uvmodes[my, mx] = bd.tree(_UV_MODE_TREE, KF_UV_MODE_PROBS)

    # --- pass 2: tokens + reconstruction ---
    w16, h16 = mb_cols * 16, mb_rows * 16
    w8, h8 = mb_cols * 8, mb_rows * 8
    # planes padded: +1 top/left border, +8 right for Y above-right
    Y = np.empty((h16 + 1, w16 + 8 + 1), dtype=np.uint8)
    U = np.empty((h8 + 1, w8 + 1), dtype=np.uint8)
    V = np.empty((h8 + 1, w8 + 1), dtype=np.uint8)
    for pl in (Y, U, V):
        pl[0, :] = 127
        pl[1:, 0] = 129

    # per-plane nonzero contexts (eob-based, per libwebp semantics)
    above_nz = np.zeros((mb_cols, 9), dtype=np.int8)  # 4Y 2U 2V 1Y2
    has_content = np.zeros((mb_rows, mb_cols), dtype=bool)

    coeffs = [0] * 16
    for my in range(mb_rows):
        tb = token_bds[my % f.n_parts]
        left_nz = [0] * 9
        for mx in range(mb_cols):
            ym = int(ymodes[my, mx])
            has_y2 = ym != _B
            seg = int(seg_ids[my, mx])
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq[seg]
            probs = f.coeff_probs
            anz = above_nz[mx]
            mb_coeffs = None
            dc_from_wht = None
            content = False

            if skip_flags[my, mx]:
                anz[0:8] = 0
                left_nz[0:8] = [0] * 8
                if has_y2:
                    anz[8] = 0
                    left_nz[8] = 0
            else:
                mb_coeffs = []
                if has_y2:
                    for i in range(16):
                        coeffs[i] = 0
                    ctx = int(anz[8]) + left_nz[8]
                    nz = _get_coeffs(tb, probs[1], ctx, 0,
                                     y2dc, y2ac, coeffs)
                    anz[8] = left_nz[8] = 1 if nz > 0 else 0
                    dc_from_wht = _iwht4x4(coeffs)
                    first, plane = 1, probs[0]
                else:
                    first, plane = 0, probs[3]
                tnz = [int(anz[i]) for i in range(4)]
                for r in range(4):
                    l = left_nz[r]
                    for c in range(4):
                        blk = [0] * 16
                        nz = _get_coeffs(tb, plane, l + tnz[c], first,
                                         y1dc, y1ac, blk)
                        l = 1 if nz > first else 0
                        tnz[c] = l
                        if dc_from_wht is not None:
                            blk[0] = dc_from_wht[4 * r + c]
                        if nz > 1 or blk[0] != 0:
                            content = True
                        mb_coeffs.append(blk)
                    left_nz[r] = l
                anz[0:4] = tnz
                # chroma: 2x2 blocks per plane
                uv_blocks = []
                for ch in range(2):
                    base = 4 + 2 * ch
                    tnz2 = [int(anz[base]), int(anz[base + 1])]
                    for r in range(2):
                        l = left_nz[base + r]
                        for c in range(2):
                            blk = [0] * 16
                            nz = _get_coeffs(tb, probs[2], l + tnz2[c],
                                             0, uvdc, uvac, blk)
                            l = 1 if nz > 0 else 0
                            tnz2[c] = l
                            if nz > 1 or blk[0] != 0:
                                content = True
                            uv_blocks.append(blk)
                        left_nz[base + r] = l
                    anz[base:base + 2] = tnz2
            has_content[my, mx] = content

            # --- reconstruction ---
            y0, x0 = my * 16, mx * 16
            have_above, have_left = my > 0, mx > 0
            if ym != _B:
                _pred_full(Y, y0, x0, 16, ym, have_above, have_left)
                if mb_coeffs is not None:
                    for sb in range(16):
                        blk = mb_coeffs[sb]
                        if any(blk):
                            r, c = sb >> 2, sb & 3
                            sl = Y[y0 + 1 + 4 * r:y0 + 5 + 4 * r,
                                   x0 + 1 + 4 * c:x0 + 5 + 4 * c]
                            res = _idct4x4(blk)
                            sl[:] = np.clip(sl.astype(np.int32) + res,
                                            0, 255)
            else:
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    py, px = y0 + 4 * r, x0 + 4 * c
                    arow = Y[py, px + 1:px + 5]
                    if c == 3 and r > 0:
                        # spec quirk: right-column subblocks reuse the
                        # above-MB row's above-right pixels
                        ar = Y[y0, x0 + 17:x0 + 21]
                    else:
                        ar = Y[py, px + 5:px + 9]
                    a = [int(v) for v in arow] + [int(v) for v in ar]
                    l = [int(Y[py + 1 + i, px]) for i in range(4)]
                    p = int(Y[py, px])
                    pred = _pred_b(int(bmodes[my, mx, sb]), a, l, p)
                    sl = Y[py + 1:py + 5, px + 1:px + 5]
                    if mb_coeffs is not None and any(mb_coeffs[sb]):
                        res = _idct4x4(mb_coeffs[sb])
                        arr = np.array(pred, dtype=np.int32).reshape(4, 4)
                        sl[:] = np.clip(arr + res, 0, 255)
                    else:
                        sl[:] = np.array(pred, dtype=np.uint8).reshape(4, 4)
            # chroma
            uy0, ux0 = my * 8, mx * 8
            uvm = int(uvmodes[my, mx])
            for pi, pl in ((0, U), (1, V)):
                _pred_full(pl, uy0, ux0, 8, uvm, have_above, have_left)
                if mb_coeffs is not None:
                    for bi in range(4):
                        blk = uv_blocks[4 * pi + bi]
                        if any(blk):
                            r, c = bi >> 1, bi & 1
                            sl = pl[uy0 + 1 + 4 * r:uy0 + 5 + 4 * r,
                                    ux0 + 1 + 4 * c:ux0 + 5 + 4 * c]
                            res = _idct4x4(blk)
                            sl[:] = np.clip(sl.astype(np.int32) + res,
                                            0, 255)
        # extend this MB row's right edge for next row's above-right
        Y[1 + my * 16:1 + my * 16 + 16, 1 + w16:] = \
            Y[1 + my * 16:1 + my * 16 + 16, w16:w16 + 1]

    # Sanity bound on virtual (past-end) bytes consumed. Valid streams
    # legitimately run past the partition end: the bool decoder
    # preloads 2 bytes, and an encoder may trim trailing zero bytes of
    # the final partition (measured: libwebp streams with their zero
    # tail stripped reach overrun 3 and still decode bit-exactly —
    # pinned by test_system_lib_differential.py). 8 is the full
    # lookahead window the _Bool docstring promises; it still catches
    # runaway reads on badly truncated partitions, while any tighter
    # bound falsely rejected real trimmed streams (r9 advice).
    if bd.overrun > 8 or any(t.overrun > 8 for t in token_bds):
        raise VP8Error("truncated VP8 stream (decoder ran past end)")

    _loop_filter(f, Y, U, V, mb_rows, mb_cols,
                 seg_ids, ymodes, skip_flags, has_content)

    cw, ch = f.width, f.height
    uvw, uvh = (cw + 1) >> 1, (ch + 1) >> 1
    return {
        "width": cw,
        "height": ch,
        "n_pixels": cw * ch,
        "y": Y[1:1 + ch, 1:1 + cw].copy(),
        "u": U[1:1 + uvh, 1:1 + uvw].copy(),
        "v": V[1:1 + uvh, 1:1 + uvw].copy(),
    }


# --- loop filter (RFC 6386 §15) -------------------------------------------

def _sclip(x):
    # two direct ufunc calls beat np.clip's python-side dispatch on the
    # tiny per-edge arrays this filter works with (~1.4x measured)
    return np.minimum(np.maximum(x, -128), 127)


def _lf_normal(seg, elim, ilim, hevt, mbedge):
    """seg: int32 array (8, n) of p3..q3 pixel lines; filtered in place
    per the RFC's mbfilter / subblock filter reference code.  The six
    interior-smoothness terms and the two hev terms come from ONE
    fused adjacent-difference pass; lines failing the filter mask are
    handled by masking (and a whole-edge early-out)."""
    d = np.abs(np.diff(seg, axis=0))   # |p3-p2| .. |q2-q3| (7, n)
    mask = (d[3] * 2 + (np.abs(seg[2] - seg[5]) >> 1)) <= elim
    mask &= np.maximum.reduce(
        (d[0], d[1], d[2], d[4], d[5], d[6])) <= ilim
    if not mask.any():
        return
    p3, p2, p1, p0, q0, q1, q2, q3 = (seg[i] for i in range(8))
    hev = np.maximum(d[2], d[4]) > hevt
    ps1, ps0 = p1 - 128, p0 - 128
    qs0, qs1 = q0 - 128, q1 - 128
    if mbedge:
        ps2, qs2 = p2 - 128, q2 - 128
        fl = _sclip(_sclip(ps1 - qs1) + 3 * (qs0 - ps0))
        fl = np.where(mask, fl, 0)
        f2 = np.where(hev, fl, 0)
        F1 = _sclip(f2 + 4) >> 3
        F2 = _sclip(f2 + 3) >> 3
        qs0 = _sclip(qs0 - F1)
        ps0 = _sclip(ps0 + F2)
        w = np.where(hev, 0, fl)
        u = _sclip((27 * w + 63) >> 7)
        qs0 = _sclip(qs0 - u); ps0 = _sclip(ps0 + u)
        u = _sclip((18 * w + 63) >> 7)
        qs1 = _sclip(qs1 - u); ps1 = _sclip(ps1 + u)
        u = _sclip((9 * w + 63) >> 7)
        qs2 = _sclip(qs2 - u); ps2 = _sclip(ps2 + u)
        out = (p3, ps2 + 128, ps1 + 128, ps0 + 128,
               qs0 + 128, qs1 + 128, qs2 + 128, q3)
    else:
        fl = np.where(hev, _sclip(ps1 - qs1), 0)
        fl = _sclip(fl + 3 * (qs0 - ps0))
        fl = np.where(mask, fl, 0)
        F1 = _sclip(fl + 4) >> 3
        F2 = _sclip(fl + 3) >> 3
        qs0 = _sclip(qs0 - F1)
        ps0 = _sclip(ps0 + F2)
        a = (F1 + 1) >> 1
        a = np.where(hev, 0, a)
        qs1 = _sclip(qs1 - a)
        ps1 = _sclip(ps1 + a)
        out = (p3, p2, ps1 + 128, ps0 + 128,
               qs0 + 128, qs1 + 128, q2, q3)
    for i in range(8):
        seg[i] = out[i]


def _lf_simple(seg, elim):
    p1, p0, q0, q1 = (seg[i] for i in range(4))
    mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= elim
    ps1, ps0 = p1 - 128, p0 - 128
    qs0, qs1 = q0 - 128, q1 - 128
    fl = _sclip(_sclip(ps1 - qs1) + 3 * (qs0 - ps0))
    fl = np.where(mask, fl, 0)
    F1 = _sclip(fl + 4) >> 3
    F2 = _sclip(fl + 3) >> 3
    seg[1] = _sclip(ps0 + F2) + 128
    seg[2] = _sclip(qs0 - F1) + 128


def _lf_edge(plane, y0, x0, n, off, vertical, simple, mbedge,
             elim, ilim, hevt):
    """Filter one edge: n pixel lines crossing the edge at offset
    `off` (column for vertical, row for horizontal)."""
    half = 2 if simple else 4
    if vertical:
        win = plane[y0:y0 + n, off - half:off + half]
        seg = win.astype(np.int32).T.copy()
    else:
        win = plane[off - half:off + half, x0:x0 + n]
        seg = win.astype(np.int32).copy()
    if simple:
        _lf_simple(seg, elim)
    else:
        _lf_normal(seg, elim, ilim, hevt, mbedge)
    out = seg.T if vertical else seg
    win[:] = out.astype(np.uint8)


def _lf_edge_uv(U, V, y0, x0, n, off, vertical, mbedge,
                elim, ilim, hevt):
    """The same edge position on BOTH chroma planes, filtered as one
    stacked 2n-line segment (the planes are independent; stacking
    halves the per-edge numpy dispatch cost)."""
    if vertical:
        wu = U[y0:y0 + n, off - 4:off + 4]
        wv = V[y0:y0 + n, off - 4:off + 4]
        seg = np.concatenate((wu, wv), axis=0).astype(np.int32).T.copy()
    else:
        wu = U[off - 4:off + 4, x0:x0 + n]
        wv = V[off - 4:off + 4, x0:x0 + n]
        seg = np.concatenate((wu, wv), axis=1).astype(np.int32).copy()
    _lf_normal(seg, elim, ilim, hevt, mbedge)
    out = seg.T if vertical else seg
    wu[:] = out[:n].astype(np.uint8) if vertical \
        else out[:, :n].astype(np.uint8)
    wv[:] = out[n:].astype(np.uint8) if vertical \
        else out[:, n:].astype(np.uint8)


def _loop_filter(f, Y, U, V, mb_rows, mb_cols,
                 seg_ids, ymodes, skip_flags, has_content):
    if f.filter_level == 0:
        return
    # per-segment base levels
    levels = []
    for seg in range(4):
        if f.seg_enabled:
            lv = f.seg_lf[seg] if f.seg_abs \
                else f.filter_level + f.seg_lf[seg]
        else:
            lv = f.filter_level
        levels.append(lv)
    sharp = f.sharpness
    for my in range(mb_rows):
        for mx in range(mb_cols):
            lv = levels[int(seg_ids[my, mx])]
            if f.lf_delta_enabled:
                lv += f.ref_lf_delta[0]          # intra frame
                if ymodes[my, mx] == _B:
                    lv += f.mode_lf_delta[0]     # B_PRED
            lv = 0 if lv < 0 else (63 if lv > 63 else lv)
            if lv == 0:
                continue
            ilim = lv
            if sharp:
                ilim >>= 2 if sharp > 4 else 1
                if ilim > 9 - sharp:
                    ilim = 9 - sharp
            if ilim < 1:
                ilim = 1
            hevt = 2 if lv >= 40 else (1 if lv >= 15 else 0)
            mb_elim = 2 * (lv + 2) + ilim
            sb_elim = 2 * lv + ilim
            inner = bool(has_content[my, mx]) or ymodes[my, mx] == _B
            y0, x0 = 1 + my * 16, 1 + mx * 16
            uy0, ux0 = 1 + my * 8, 1 + mx * 8
            simple = bool(f.filter_simple)
            # vertical edges (left MB edge, then interior)
            if mx > 0:
                _lf_edge(Y, y0, 0, 16, x0, True, simple, True,
                         mb_elim, ilim, hevt)
                if not simple:
                    _lf_edge_uv(U, V, uy0, 0, 8, ux0, True, True,
                                mb_elim, ilim, hevt)
            if inner:
                for dx in (4, 8, 12):
                    _lf_edge(Y, y0, 0, 16, x0 + dx, True, simple, False,
                             sb_elim, ilim, hevt)
                if not simple:
                    _lf_edge_uv(U, V, uy0, 0, 8, ux0 + 4, True, False,
                                sb_elim, ilim, hevt)
            # horizontal edges (top MB edge, then interior)
            if my > 0:
                _lf_edge(Y, 0, x0, 16, y0, False, simple, True,
                         mb_elim, ilim, hevt)
                if not simple:
                    _lf_edge_uv(U, V, 0, ux0, 8, uy0, False, True,
                                mb_elim, ilim, hevt)
            if inner:
                for dy in (4, 8, 12):
                    _lf_edge(Y, 0, x0, 16, y0 + dy, False, simple, False,
                             sb_elim, ilim, hevt)
                if not simple:
                    _lf_edge_uv(U, V, 0, ux0, 8, uy0 + 4, False, False,
                                sb_elim, ilim, hevt)


# --- boolean arithmetic ENCODER (RFC 6386 §7.2) ---------------------------
#
# Exact-arithmetic formulation: `low` is kept as an unbounded integer
# (Python int) that doubles with every renormalization shift, so carry
# propagation is implicit.  After all symbols, any integer in
# [low, low + range) written MSB-first in (16 + shifts) bits is a valid
# codeword for the RFC decoder (which initializes its 16-bit window
# from the first two bytes and pulls one byte per 8 renorm shifts).

class _BoolEnc:
    def __init__(self):
        self.low = 0
        self.range = 255
        self.shifts = 0

    def put(self, prob, bit):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.low <<= 1
            self.range <<= 1
            self.shifts += 1
        return bit

    def literal(self, n, v):
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def tree_encode(self, tree, probs, leaf):
        """Encode `leaf` (the -(value+1) convention) down the tree."""
        path = []

        def walk(i, bits):
            t0, t1 = tree[i], tree[i + 1]
            for b, t in ((0, t0), (1, t1)):
                nb = bits + [(i >> 1, b)]
                if t < 0:
                    if -t - 1 == leaf:
                        path.extend(nb)
                        return True
                elif walk(t, nb):
                    return True
            return False

        if not walk(0, []):
            raise ValueError("leaf not in tree")
        for pi, b in path:
            self.put(probs[pi], b)

    def flush(self):
        # the interval [low, low+range) lives at 8 + shifts fractional
        # bits (initial range spans one byte); emit its lower bound,
        # then zero bytes to cover the decoder's 16-bit init window
        # and renormalization lookahead
        nbits = 8 + self.shifts
        nbytes = (nbits + 7) >> 3
        pad = 8 * nbytes - nbits
        data = (self.low << pad).to_bytes(nbytes, "big")
        return data + b"\x00\x00"


# --- deterministic gate writer (flat frames, closed-form decode) ----------

_QIS = (0, 15, 31, 47, 63, 79, 95, 127)


def _flat_factors(qi):
    y2dcf = DC_QLOOKUP[qi] * 2
    uvdcf = min(DC_QLOOKUP[qi], 132)
    return y2dcf, uvdcf


def vp8_flat_expected(qi, lvl_y, lvl_u, lvl_v):
    """Closed-form decoded (Y, U, V) of a build_vp8_flat frame — the
    exact integer chain the decoder performs: Y2 DC -> IWHT -> IDCT
    DC add over a 128 DC prediction (levels are non-negative so the
    arithmetic shifts are plain integer division, SQL-replicable)."""
    y2dcf, uvdcf = _flat_factors(qi)
    y_dc = (lvl_y * y2dcf + 3) >> 3
    L = min(255, 128 + ((y_dc + 4) >> 3))
    U = min(255, 128 + ((lvl_u * uvdcf + 4) >> 3))
    V = min(255, 128 + ((lvl_v * uvdcf + 4) >> 3))
    return L, U, V


def _encode_dc_block(enc, plane, ctx, lvl, first):
    """Encode one block carrying a single DC coefficient `lvl` in 0..4
    (0 = empty block).  Returns the block's nz flag (eob > first)."""
    n = first
    p = plane[_BANDS[n]][ctx]
    if lvl == 0:
        enc.put(p[0], 0)                      # immediate EOB
        return 0
    enc.put(p[0], 1)                          # not EOB
    enc.put(p[1], 1)                          # not zero
    if lvl == 1:
        enc.put(p[2], 0)
        nctx = 1
    else:
        enc.put(p[2], 1)
        enc.put(p[3], 0)                      # {2,3,4} branch
        nctx = 2
        if lvl == 2:
            enc.put(p[4], 0)
        else:
            enc.put(p[4], 1)
            enc.put(p[5], lvl - 3)
    enc.put(128, 0)                           # sign: positive
    p = plane[_BANDS[n + 1]][nctx]
    enc.put(p[0], 0)                          # EOB
    return 1


def build_vp8_flat(width, height, qi, lvl_y, lvl_u=0, lvl_v=0):
    """Deterministic single-row VP8 key frame (1-2 macroblock columns,
    width<=32, height<=16): flat luma through the Y2/WHT DC path, flat
    chroma through per-block DC coefficients, second macroblock (if
    any) coded as SKIP so DC prediction propagates the flat value.
    Loop filter level 0.  Decode is vp8_flat_expected() everywhere —
    the mm_webp_decode gate's lossy corpus (tests cross-check the
    stream in libwebp itself)."""
    if not (4 <= width <= 32 and 4 <= height <= 16):
        raise ValueError("flat writer supports 4..32 x 4..16")
    if not (1 <= lvl_y <= 4 and 0 <= lvl_u <= 4 and 0 <= lvl_v <= 4):
        raise ValueError("levels out of the DC-token range")
    mb_cols = (width + 15) >> 4
    probs = _DEFAULT_COEFF_PROBS

    hdr = _BoolEnc()
    hdr.put(128, 0)                            # color space
    hdr.put(128, 0)                            # clamping
    hdr.put(128, 0)                            # segmentation off
    hdr.put(128, 0)                            # filter type normal
    hdr.literal(6, 0)                          # filter level 0
    hdr.literal(3, 0)                          # sharpness
    hdr.put(128, 0)                            # no lf deltas
    hdr.literal(2, 0)                          # one token partition
    hdr.literal(7, qi)                         # y_ac_qi
    for _ in range(5):                         # no quant deltas
        hdr.put(128, 0)
    hdr.put(128, 1)                            # refresh entropy
    for i in range(4):                         # no coeff prob updates
        for j in range(8):
            for k in range(3):
                for t in range(11):
                    hdr.put(_UPDATE_PROBS[i][j][k][t], 0)
    hdr.put(128, 1)                            # use skip flags
    hdr.literal(8, 128)                        # skip prob
    for mx in range(mb_cols):                  # mode records
        hdr.put(128, 1 if mx > 0 else 0)       # skip: only MB0 has tokens
        hdr.put(KF_YMODE_PROBS[0], 1)          # not B_PRED
        hdr.put(KF_YMODE_PROBS[1], 0)
        hdr.put(KF_YMODE_PROBS[2], 0)          # -> DC_PRED
        hdr.put(KF_UV_MODE_PROBS[0], 0)        # uv DC_PRED
    part0 = hdr.flush()

    tok = _BoolEnc()
    _encode_dc_block(tok, probs[1], 0, lvl_y, 0)       # Y2
    for _ in range(16):                                # Y: all empty
        tok.put(probs[0][_BANDS[1]][0][0], 0)
    for lvl in (lvl_u, lvl_v):                         # U then V
        tnz2 = [0, 0]
        lnz2 = [0, 0]
        for r in range(2):
            l = lnz2[r]
            for c in range(2):
                l = _encode_dc_block(tok, probs[2], l + tnz2[c], lvl, 0)
                tnz2[c] = l
            lnz2[r] = l
    part1 = tok.flush()

    tag = (0 << 0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    chunk = (tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
             + struct.pack("<HH", width, height) + part0 + part1)
    payload = b"VP8 " + len(chunk).to_bytes(4, "little") + chunk
    if len(chunk) & 1:
        payload += b"\x00"
    return (b"RIFF" + (4 + len(payload)).to_bytes(4, "little")
            + b"WEBP" + payload)


# --- YUV -> RGB (documented conversion; see parse docstring) --------------

def yuv_to_rgb(y, u, v):
    """ITU-R BT.601 studio-swing integer conversion with nearest
    (pixel-replication) chroma upsampling:
        r = clip((298*(y-16) + 409*(v-128) + 128) >> 8)
        g = clip((298*(y-16) - 100*(u-128) - 208*(v-128) + 128) >> 8)
        b = clip((298*(y-16) + 516*(u-128) + 128) >> 8)
    This is the codec's own documented conversion (the VP8 bitstream
    defines YUV decode only; RGB conversion is a display choice), kept
    integer-exact so gate oracles can replicate it in SQL."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    yy = y.astype(np.int32) - 16
    uu = uu.astype(np.int32) - 128
    vv = vv.astype(np.int32) - 128
    r = (298 * yy + 409 * vv + 128) >> 8
    g = (298 * yy - 100 * uu - 208 * vv + 128) >> 8
    b = (298 * yy + 516 * uu + 128) >> 8
    return np.dstack([np.clip(r, 0, 255).astype(np.uint8),
                      np.clip(g, 0, 255).astype(np.uint8),
                      np.clip(b, 0, 255).astype(np.uint8)])


def parse_vp8(data):
    """Decode a VP8 chunk to the engine's standard image dict (same
    shape as parse_vp8l / parse_png)."""
    m = decode_vp8(data)
    rgb = yuv_to_rgb(m["y"], m["u"], m["v"])
    return {
        "width": m["width"],
        "height": m["height"],
        "n_pixels": m["n_pixels"],
        "pixels": rgb,
        "alpha": np.full((m["height"], m["width"]), 255, dtype=np.uint8),
        "has_alpha": False,
        "y_plane": m["y"],
        "u_plane": m["u"],
        "v_plane": m["v"],
    }
